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


def init_table(value: float = 0.0) -> jax.Array:
    """Flat weight table ``(17 * 83521,)`` f32.

    A small optimistic initial value encourages early exploration
    (Szubert & Jaskowski initialise optimistically); 0.0 is neutral.
    """
    return jnp.full((N_TUPLES * TABLE_SIZE,), value, jnp.float32)


def feature_indices(board: jax.Array) -> jax.Array:
    """Flat table indices ``(136,)`` for one ``(4, 4)`` exponent board."""
    flat = board.reshape(16).astype(jnp.int32)
    exps = jnp.clip(flat, 0, N_VALS - 1)
    vals = exps[CELLS]  # (8, 17, 4)
    idx = (vals * _POW).sum(-1)  # (8, 17)
    return (idx + _OFFSET).reshape(-1)  # (136,)


def value(table: jax.Array, board: jax.Array) -> jax.Array:
    """Value of one board: mean over the 8 symmetries of the tuple sums."""
    return table[feature_indices(board)].sum() / 8.0


def value_batch(table: jax.Array, boards: jax.Array) -> jax.Array:
    """Values of ``(B, 4, 4)`` boards — one batched gather."""
    return jax.vmap(lambda b: value(table, b))(boards)


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
