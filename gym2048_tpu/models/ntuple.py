"""N-tuple network value function for 2048 (TPU-native).

A second model family beyond the reference's residual CNN (the reference,
rgal/gym-2048, has only the CNN policy — model.py:28-103). N-tuple networks
are the classical state of the art for 2048 value learning (Szubert &
Jaskowski 2014): the value of a board is a sum of lookup-table entries, one
per tuple of cells, with all 8 board symmetries sharing the same tables.

TPU-first realisation: the 17 four-cell tuples (4 rows + 4 columns + 9 2x2
squares) over 17 exponent values give 17 x 17^4 = 1.42M f32 weights (5.7 MB
— VMEM-resident); a value lookup is one gather of 8 syms x 17 tuples = 136
indices per board, and a TD update is one scatter-add of the same indices —
both batched over thousands of boards in a single XLA op, no host loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

N_VALS = 17  # exponents 0..16 (the engine's full domain: tile 2^16 = 65536,
# the score-assert bound in the reference, game2048_env.py:87)
TUPLE_LEN = 4
TABLE_SIZE = N_VALS**TUPLE_LEN  # 83521


def _build_tuples() -> np.ndarray:
    """17 four-cell tuples: 4 rows, 4 columns, 9 2x2 squares."""
    tuples = []
    for i in range(4):
        tuples.append([4 * i + j for j in range(4)])  # row i
    for j in range(4):
        tuples.append([4 * i + j for i in range(4)])  # col j
    for i in range(3):
        for j in range(3):
            tuples.append(
                [4 * i + j, 4 * i + j + 1, 4 * (i + 1) + j,
                 4 * (i + 1) + j + 1]
            )
    return np.asarray(tuples, np.int32)  # (17, 4)


def _build_symmetries() -> np.ndarray:
    """The 8 symmetries of the 4x4 board as flat-position permutations.

    ``SYMS[s, p]`` = source position that lands at ``p`` under symmetry
    ``s``, so ``flat[SYMS[s]]`` is the transformed board (same group the
    reference exploits for data augmentation, training_data.py:257-299).
    """
    base = np.arange(16).reshape(4, 4)
    syms = []
    m = base
    for _ in range(4):
        syms.append(m.reshape(-1))
        syms.append(np.fliplr(m).reshape(-1))
        m = np.rot90(m)
    return np.asarray(syms, np.int32)  # (8, 16)


TUPLES = _build_tuples()
SYMS = _build_symmetries()
N_TUPLES = len(TUPLES)  # 17
# CELLS[s, m, k]: board cell feeding slot k of tuple m under symmetry s
# (kept as NUMPY constants: jnp indexing accepts them inside jit, and
# module import must not touch a JAX backend — on this stack creating a
# device array at import time would claim the remote TPU for every process
# that merely imports the package)
CELLS = SYMS[:, TUPLES]  # (8, 17, 4)
_POW = np.asarray(N_VALS ** np.arange(TUPLE_LEN), np.int32)  # (4,)
# flat-table offset of each tuple's sub-table
_OFFSET = np.asarray(
    (np.arange(N_TUPLES) * TABLE_SIZE)[None, :], np.int32
)  # (1, 17)

N_FEATURES = 8 * N_TUPLES  # gathers per board

# Multi-stage tables (Jaskowski 2016, arXiv:1604.05085 "multi-stage weight
# promotion"): the value function is a SEPARATE table per game stage, where
# the stage of a board is how many of the static ``thresholds`` (max-tile
# exponents) it has reached — e.g. thresholds (11, 12) give three stages:
# before the first 2048 tile, between 2048 and 4096, and from 4096 on. The
# max tile never decreases within an episode, so the stage is a pure
# function of the board and lookups/updates stay stateless. Stage tables
# are stage-major in the flat array: ``table[stage * STAGE_STRIDE + ...]``.
STAGE_STRIDE = N_TUPLES * TABLE_SIZE


def init_table(value: float = 0.0, n_stages: int = 1) -> jax.Array:
    """Flat weight table ``(n_stages * 17 * 83521,)`` f32.

    A small optimistic initial value encourages early exploration
    (Szubert & Jaskowski initialise optimistically); 0.0 is neutral.
    """
    return jnp.full((n_stages * STAGE_STRIDE,), value, jnp.float32)


def n_stages_of(table: jax.Array) -> int:
    """Number of stages a flat table holds (its size / one stage's size)."""
    n, rem = divmod(table.shape[-1] if table.ndim else table.size,
                    STAGE_STRIDE)
    assert rem == 0 and n >= 1, f"not a stage-multiple table: {table.shape}"
    return n


def promote_table(table: jax.Array, n_stages: int) -> jax.Array:
    """Weight promotion (arXiv:1604.05085 §weight promotion): seed every
    stage of a fresh ``n_stages``-stage table with an already-trained
    single-stage table, so later stages start from the shared value
    function and specialise from there instead of learning late-game play
    from zero on the rare data that reaches them."""
    assert n_stages_of(table) == 1, "promote from a single-stage table"
    return jnp.tile(table, n_stages)


def stage_of_batch(
    boards: jax.Array, thresholds: tuple[int, ...]
) -> jax.Array:
    """Stage index ``(B,)`` int32 of each board: the number of static
    max-tile-exponent ``thresholds`` the board's highest tile has reached
    (0 when ``thresholds`` is empty — the single-stage case)."""
    m = boards.reshape(boards.shape[0], 16).max(-1).astype(jnp.int32)
    s = jnp.zeros_like(m)
    for t in thresholds:
        s = s + (m >= t).astype(jnp.int32)
    return s


def local_indices(board: jax.Array) -> jax.Array:
    """Per-tuple local table indices ``(8, 17)`` in ``[0, TABLE_SIZE)`` for
    one ``(4, 4)`` exponent board (row s = symmetry, column m = tuple)."""
    flat = board.reshape(16).astype(jnp.int32)
    exps = jnp.clip(flat, 0, N_VALS - 1)
    vals = exps[CELLS]  # (8, 17, 4)
    return (vals * _POW).sum(-1)  # (8, 17)


def feature_indices(board: jax.Array) -> jax.Array:
    """Flat table indices ``(136,)`` for one ``(4, 4)`` exponent board."""
    return (local_indices(board) + _OFFSET).reshape(-1)  # (136,)


def value(
    table: jax.Array,
    board: jax.Array,
    thresholds: tuple[int, ...] = (),
) -> jax.Array:
    """Value of one board: mean over the 8 symmetries of the tuple sums.

    With ``thresholds`` the lookup goes to the board's stage table (see
    :data:`STAGE_STRIDE`)."""
    idx = feature_indices(board)
    if thresholds:
        idx = idx + stage_of_batch(board[None], thresholds)[0] * STAGE_STRIDE
    return table[idx].sum() / 8.0


def value_batch(
    table: jax.Array,
    boards: jax.Array,
    thresholds: tuple[int, ...] = (),
) -> jax.Array:
    """Values of ``(B, 4, 4)`` boards — one batched gather."""
    return jax.vmap(lambda b: value(table, b, thresholds))(boards)


def split_table(table: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split the f32 table into a bf16 (hi, lo) pair shaped for the MXU.

    ``hi + lo == table`` to ~2^-16 relative (lo holds the next 8 mantissa
    bits), laid out ``(17, S*_HI, 128)`` — for an ``S``-stage table, each
    tuple's rows hold its ``S`` stage sub-tables back to back, so a staged
    lookup is the same one-hot contraction with the row index offset by
    ``stage * _HI`` — with the 63-entry tail of each sub-table zero-padded.
    Recomputing the split is two elementwise passes over ``S`` x 5.7 MB —
    negligible per training step.
    """
    s = n_stages_of(table)
    t = table.reshape(s * N_TUPLES, TABLE_SIZE)
    pad = _HI * _LANES - TABLE_SIZE
    t = (
        jnp.pad(t, ((0, 0), (0, pad)))
        .reshape(s, N_TUPLES, _HI, _LANES)
        .transpose(1, 0, 2, 3)
        .reshape(N_TUPLES, s * _HI, _LANES)
    )
    dt = _mxu_dtype()
    # The rounding must be reduce_precision, NOT astype(bf16).astype(f32):
    # inside a jit XLA folds the f32->bf16->f32 convert pair away
    # (xla_allow_excess_precision), which silently turns lo into
    # bf16(t - t) == 0 — the split degrades to a plain bf16 lookup while
    # still paying for the correction matmul. reduce_precision performs
    # the same bf16 rounding in f32 and cannot be simplified away.
    # (Found empirically: bit-identical training between the split and
    # bf16-only modes, docs/PERF.md precision note.)
    hi_f32 = jax.lax.reduce_precision(t, exponent_bits=8, mantissa_bits=7)
    hi = hi_f32.astype(dt)
    lo = (t - hi_f32).astype(dt)
    return hi, lo


def value_batch_mxu(
    t_hi: jax.Array,
    t_lo: jax.Array | None,
    boards: jax.Array,
    chunk: int = 4096,
    thresholds: tuple[int, ...] = (),
) -> jax.Array:
    """:func:`value_batch` computed on the MXU instead of XLA gather.

    XLA:TPU gather sustains only ~135M random indices/s, which left TD
    training gather-bound (docs/PERF.md). Like :func:`td_update_mxu`, the
    lookup ``v = T_t[hi, lo]`` becomes dense algebra: with one-hot factors
    ``oh_hi (C, 653)`` / ``oh_lo (C, 128)``,

        v = ((oh_hi @ T_t) * oh_lo).sum(lanes)     (batched over t)

    run twice against the split-bf16 table halves from :func:`split_table`
    and summed in f32, so results match the f32 gather to ~2^-16 relative
    — exact enough that selection, TD targets and evaluation all share it.
    Pass ``t_lo=None`` to skip the correction pass (plain bf16 lookup,
    ~0.4% relative value noise, half the FLOPs — the ``mxu_bf16`` value
    mode; training quality measured equal, docs/PERF.md).

    For an ``S``-stage table pass the same static ``thresholds`` the table
    was trained with: the board's stage offsets the one-hot row index by
    ``stage * _HI`` into the :func:`split_table` layout (the contraction
    width grows ``S``-fold — the only cost of staging the lookup).
    """
    n_hi = t_hi.shape[1]
    assert n_hi == (len(thresholds) + 1) * _HI, (
        f"table has {n_hi // _HI} stages but thresholds={thresholds!r}"
    )
    n = boards.shape[0]
    cb = max(1, min(chunk // 8, n))  # boards per chunk (8 lookups each)
    pad = (-n) % cb
    flat = boards.reshape(n, 16)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, 16), flat.dtype)])
    flat_c = flat.reshape(-1, cb, 16)

    def body(_, bc):
        bc = bc.reshape(cb, 4, 4)
        ic = local_indices_batch(bc)  # (cb, 8, 17)
        ic = ic.reshape(cb * 8, N_TUPLES)
        hi = ic // _LANES
        lo = ic % _LANES
        if thresholds:
            st = stage_of_batch(bc, thresholds)  # (cb,)
            st = jnp.broadcast_to(st[:, None], (cb, 8)).reshape(-1)
            hi = hi + st[:, None] * _HI
        oh_hi = jax.nn.one_hot(hi, n_hi, dtype=_mxu_dtype())  # (C, 17, S*_HI)
        oh_lo = jax.nn.one_hot(lo, _LANES, dtype=jnp.float32)
        rows = jnp.einsum(
            "cth,thl->ctl", oh_hi, t_hi,
            preferred_element_type=jnp.float32,
        )
        if t_lo is not None:  # second pass for the f32-exact split
            rows = rows + jnp.einsum(
                "cth,thl->ctl", oh_hi, t_lo,
                preferred_element_type=jnp.float32,
            )
        v = (rows * oh_lo).sum(-1).sum(-1)  # (C,)
        return None, v.reshape(cb, 8).sum(-1) / 8.0

    _, vals = jax.lax.scan(body, None, flat_c)
    return vals.reshape(-1)[:n]


def td_update(
    table: jax.Array,
    boards: jax.Array,
    deltas: jax.Array,
    alpha: float,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Count-normalised scatter of TD errors for a batch of afterstates.

    Each entry receives the MEAN of the per-occurrence updates
    ``alpha * delta * 8 / 136`` that hit it, not their sum. This makes one
    single-board update move ``value(board)`` by exactly ``alpha * delta``
    even when features repeat (a board's 8 symmetries often map several
    slots of one tuple to the same sub-table entry), and it keeps batched
    training stable at any batch size: a plain sum lets the thousands of
    freshly-reset boards in a batch pile onto the same common entries,
    which multiplies the effective step far past 1 and diverges to NaN
    (observed — the greedy policy then degenerates to "first legal move").
    Two scatter-adds (update sums + occurrence counts), no host loop.

    ``valid`` (``(B,)`` bool, optional) excludes masked boards from BOTH
    the sums and the counts: a just-reset env carries no learning signal,
    and counting its features would dilute colliding entries' mean update
    toward 0. Masked rows are redirected to an out-of-bounds sentinel
    index, which scatter's default "drop" mode discards.
    """
    n = deltas.shape[0]
    idx = jax.vmap(feature_indices)(boards).reshape(-1)  # (B * 136,)
    upd = jnp.broadcast_to(
        (alpha * 8.0 / N_FEATURES) * deltas[:, None],
        (n, N_FEATURES),
    ).reshape(-1)
    if valid is not None:
        keep = jnp.broadcast_to(valid[:, None], (n, N_FEATURES)).reshape(-1)
        idx = jnp.where(keep, idx, table.shape[0])  # dropped by scatter
    sums = jnp.zeros_like(table).at[idx].add(
        upd.astype(table.dtype), mode="drop"
    )
    counts = jnp.zeros_like(table).at[idx].add(1.0, mode="drop")
    return table + sums / jnp.maximum(counts, 1.0)


# MXU scatter geometry: each tuple's 83,521-entry sub-table viewed as a
# (_HI, 128) tile; an index becomes (row = idx // 128, lane = idx % 128).
_LANES = 128
_HI = -(-TABLE_SIZE // _LANES)  # 653 rows (last one 65/128 used)


def _mxu_dtype():
    """Matmul operand dtype for the *_mxu paths: bf16 on the TPU MXU (2x
    rate; exact 0/1 one-hots, f32 accumulation), f32 elsewhere — CPU XLA
    lacks bf16xbf16=f32 dot support for some shapes, and the CI suite runs
    the same dataflow on CPU."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


# Gather-free feature extraction: vals[s, m, k] = flat_board[CELLS[s, m, k]]
# as one constant (544, 16) 0/1 selection matmul. The natural exps[CELLS]
# gather is what CRASHES the remote TPU worker at scale (a vmap over ~100k+
# boards emits a 100M+-element gather op — CLAUDE.md gotcha); a dense
# matmul with 16-wide contraction is also simply faster.
_SEL = np.zeros((8 * N_TUPLES * TUPLE_LEN, 16), np.float32)
_SEL[np.arange(_SEL.shape[0]), CELLS.reshape(-1)] = 1.0


def local_indices_batch(boards: jax.Array) -> jax.Array:
    """Per-tuple local indices ``(B, 8, 17)`` for a batch of boards,
    computed without any gather (see ``_SEL``). Exact: cell exponents
    (<= 16) and indices (< 83,521 < 2^24) are integers representable in
    f32."""
    n = boards.shape[0]
    flat = jnp.clip(
        boards.reshape(n, 16).astype(jnp.float32), 0, N_VALS - 1
    )
    vals = flat @ _SEL.T  # (B, 544)
    vals = vals.reshape(n, 8, N_TUPLES, TUPLE_LEN)
    idx = (vals * _POW.astype(np.float32)).sum(-1)  # exact in f32
    return idx.astype(jnp.int32)


def td_update_mxu(
    table: jax.Array,
    boards: jax.Array,
    deltas: jax.Array,
    alpha: float,
    valid: jax.Array | None = None,
    chunk: int = 4096,
) -> jax.Array:
    """:func:`td_update` computed on the MXU instead of XLA scatter.

    XLA:TPU lowers a random scatter to a serial update loop (~16M
    updates/s — docs/PERF.md), which made TD training scatter-bound and no
    faster than a host CPU. This version reformulates the count-normalised
    scatter as dense matmuls: for each of the 17 tuples, the sub-table is a
    ``(653, 128)`` tile and an index splits into (row, lane); a chunk of C
    updates becomes two one-hot factors ``oh_hi (C, 653)`` / ``oh_lo
    (C, 128)`` and the whole chunk's scatter is the single contraction

        sums[t] += oh_hi^T @ (w * oh_lo)        (batched over t on the MXU)

    with an identical contraction (weights 1/0) producing exact occurrence
    counts. One-hot factors are bf16 (exact 0/1; ``w`` rounds to bf16,
    ~0.4% relative noise on the update — irrelevant to stochastic TD) and
    the MXU accumulates in f32, so counts are exact and semantics match
    :func:`td_update` to bf16 rounding of the per-update weight. Chunks
    stream through a ``lax.scan`` accumulating the 5.7 MB f32 result.
    """
    n = deltas.shape[0]
    w1 = (alpha * 8.0 / N_FEATURES) * deltas  # (B,) per-board weight
    if valid is not None:
        c1 = valid.astype(jnp.float32)
        w1 = w1 * c1
    else:
        c1 = jnp.ones_like(w1)

    # chunk BOARDS (not flattened lookups): indices, one-hots and every
    # other large intermediate only ever exist at chunk scale
    cb = max(1, min(chunk // 8, n))
    pad = (-n) % cb
    flat = boards.reshape(n, 16)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, 16), flat.dtype)])
        w1 = jnp.concatenate([w1, jnp.zeros(pad, w1.dtype)])
        c1 = jnp.concatenate([c1, jnp.zeros(pad, c1.dtype)])
    flat_c = flat.reshape(-1, cb, 16)
    w_c = w1.reshape(-1, cb)
    c_c = c1.reshape(-1, cb)

    def body(acc, args):
        bc, wc, cc = args
        ic = local_indices_batch(bc.reshape(cb, 4, 4))  # (cb, 8, 17)
        ic = ic.reshape(cb * 8, N_TUPLES)
        wl_w = jnp.broadcast_to(wc[:, None], (cb, 8)).reshape(-1)
        cl_w = jnp.broadcast_to(cc[:, None], (cb, 8)).reshape(-1)
        hi = ic // _LANES  # (C, 17)
        lo = ic % _LANES
        dt = _mxu_dtype()
        oh_hi = jax.nn.one_hot(hi, _HI, dtype=dt)  # (C, 17, _HI)
        oh_lo = jax.nn.one_hot(lo, _LANES, dtype=dt)
        wl = oh_lo * wl_w[:, None, None].astype(dt)
        cl = oh_lo * cl_w[:, None, None].astype(dt)
        sums = jnp.einsum(
            "cth,ctl->thl", oh_hi, wl, preferred_element_type=jnp.float32
        )
        cnts = jnp.einsum(
            "cth,ctl->thl", oh_hi, cl, preferred_element_type=jnp.float32
        )
        return (acc[0] + sums, acc[1] + cnts), None

    zero = jnp.zeros((N_TUPLES, _HI, _LANES), jnp.float32)
    (sums, cnts), _ = jax.lax.scan(body, (zero, zero), (flat_c, w_c, c_c))
    upd = sums / jnp.maximum(cnts, 1.0)
    upd_flat = upd.reshape(N_TUPLES, _HI * _LANES)[:, :TABLE_SIZE].reshape(-1)
    return table + upd_flat


def _unpad(acc: jax.Array) -> jax.Array:
    """(17, _HI, _LANES) padded accumulator -> flat (17 * 83521,)."""
    return acc.reshape(N_TUPLES, _HI * _LANES)[:, :TABLE_SIZE].reshape(-1)


def _tc_combine(table, tc_e, tc_a, sums, absums, cnts, alpha):
    """Shared TC update math (flat arrays): accumulate the signed and
    absolute TD-error masses per entry, derive the coherence rate
    ``|E| / A`` (1.0 for an untouched entry, -> 0 where errors oscillate),
    and apply the count-normalised mean update scaled by it."""
    d = sums / jnp.maximum(cnts, 1.0)
    e2 = tc_e + sums
    a2 = tc_a + absums
    rate = jnp.where(a2 > 0.0, jnp.abs(e2) / jnp.maximum(a2, 1e-30), 1.0)
    return table + alpha * rate * d, e2, a2


def td_update_tc(
    table: jax.Array,
    tc_e: jax.Array,
    tc_a: jax.Array,
    boards: jax.Array,
    deltas: jax.Array,
    alpha: float,
    valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Temporal-coherence TD update (Beal & Smith 1999), scatter backend.

    Each table entry ``i`` keeps two accumulators: ``tc_e[i]`` (sum of the
    signed per-occurrence updates that hit it) and ``tc_a[i]`` (sum of
    their magnitudes). The per-entry learning rate is ``|tc_e| / tc_a`` —
    1.0 while errors agree in sign (keep learning fast), decaying toward 0
    once they oscillate (the entry has converged; stop chasing noise).
    This removes the global alpha anneal: pass ``alpha`` as the meta-rate
    (1.0 in the literature). Returns ``(table, tc_e, tc_a)``.
    """
    n = deltas.shape[0]
    w0 = (8.0 / N_FEATURES) * deltas  # per-occurrence signed update
    idx = jax.vmap(feature_indices)(boards).reshape(-1)
    w = jnp.broadcast_to(w0[:, None], (n, N_FEATURES)).reshape(-1)
    if valid is not None:
        keep = jnp.broadcast_to(valid[:, None], (n, N_FEATURES)).reshape(-1)
        idx = jnp.where(keep, idx, table.shape[0])  # dropped by scatter
    sums = jnp.zeros_like(table).at[idx].add(w, mode="drop")
    absums = jnp.zeros_like(table).at[idx].add(jnp.abs(w), mode="drop")
    cnts = jnp.zeros_like(table).at[idx].add(1.0, mode="drop")
    return _tc_combine(table, tc_e, tc_a, sums, absums, cnts, alpha)


def td_update_tc_mxu(
    table: jax.Array,
    tc_e: jax.Array,
    tc_a: jax.Array,
    boards: jax.Array,
    deltas: jax.Array,
    alpha: float,
    valid: jax.Array | None = None,
    chunk: int = 4096,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`td_update_tc` on the MXU — :func:`td_update_mxu`'s one-hot
    contraction run a third time with ``|w|`` weights for the absolute
    accumulator (+~50% update cost, negligible against the value path)."""
    n = deltas.shape[0]
    w1 = (8.0 / N_FEATURES) * deltas
    if valid is not None:
        c1 = valid.astype(jnp.float32)
        w1 = w1 * c1
    else:
        c1 = jnp.ones_like(w1)

    cb = max(1, min(chunk // 8, n))
    pad = (-n) % cb
    flat = boards.reshape(n, 16)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, 16), flat.dtype)])
        w1 = jnp.concatenate([w1, jnp.zeros(pad, w1.dtype)])
        c1 = jnp.concatenate([c1, jnp.zeros(pad, c1.dtype)])
    flat_c = flat.reshape(-1, cb, 16)
    w_c = w1.reshape(-1, cb)
    c_c = c1.reshape(-1, cb)

    def body(acc, args):
        bc, wc, cc = args
        ic = local_indices_batch(bc.reshape(cb, 4, 4)).reshape(
            cb * 8, N_TUPLES
        )
        wl_w = jnp.broadcast_to(wc[:, None], (cb, 8)).reshape(-1)
        cl_w = jnp.broadcast_to(cc[:, None], (cb, 8)).reshape(-1)
        hi = ic // _LANES
        lo = ic % _LANES
        dt = _mxu_dtype()
        oh_hi = jax.nn.one_hot(hi, _HI, dtype=dt)
        oh_lo = jax.nn.one_hot(lo, _LANES, dtype=dt)
        wl = oh_lo * wl_w[:, None, None].astype(dt)
        al = oh_lo * jnp.abs(wl_w)[:, None, None].astype(dt)
        cl = oh_lo * cl_w[:, None, None].astype(dt)
        kw = dict(preferred_element_type=jnp.float32)
        sums = jnp.einsum("cth,ctl->thl", oh_hi, wl, **kw)
        absums = jnp.einsum("cth,ctl->thl", oh_hi, al, **kw)
        cnts = jnp.einsum("cth,ctl->thl", oh_hi, cl, **kw)
        return (acc[0] + sums, acc[1] + absums, acc[2] + cnts), None

    zero = jnp.zeros((N_TUPLES, _HI, _LANES), jnp.float32)
    (sums, absums, cnts), _ = jax.lax.scan(
        body, (zero, zero, zero), (flat_c, w_c, c_c)
    )
    return _tc_combine(
        table, tc_e, tc_a, _unpad(sums), _unpad(absums), _unpad(cnts), alpha
    )
