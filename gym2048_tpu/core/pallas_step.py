"""Pallas TPU kernels: fully-fused env stepping.

The XLA-composed env step (gym2048_tpu.env.batched) round-trips board
tensors through HBM between fused kernels each step. The rollout kernel
here instead keeps a block of boards **resident in VMEM for the whole
T-step rollout**: per grid program, BLOCK boards are loaded once, stepped
T times with the in-kernel TPU PRNG (no threefry traffic), and written
back once — the speed-of-light shape for the 2048 transition on TPU.

Layout: boards are cell-major ``[16 cells, B]`` int32 — each of the 16
board cells is a lane-dimension vector over boards, so every rule op is a
full-width VPU op; the direction decomposition becomes static row
shuffles of a ``[16, BLOCK]`` tile (no gathers).

Two kernels share the move dataflow (kept bit-identical to
``rules.move_all`` and differentially tested against it):

* :func:`fused_move` — one move with given actions, no RNG: the exact
  differential-test surface against the XLA path;
* :func:`fused_rollout` — T steps of random-legal self-play with
  auto-reset (dead or won boards are reset with two spawns and counted as
  episodes), used by the throughput benchmark and bulk self-play.

The PPO path keeps the XLA step because its policy network must
interleave with the env anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cell(direction: int, line: int, k: int) -> int:
    """Cell index of (direction, line, position-in-line); positions ordered
    so every move is a leftward shift (matches core.rules._orient)."""
    if direction == 0:  # up: columns top->bottom
        return 4 * k + line
    if direction == 1:  # right: rows right->left
        return 4 * line + (3 - k)
    if direction == 2:  # down: columns bottom->top
        return 4 * (3 - k) + line
    return 4 * line + k  # left: rows left->right


def _random_uniform_rows(shape: tuple[int, int]) -> jax.Array:
    """Generate ``shape`` float32 uniforms in [0, 1) from the TPU PRNG.

    ``prng_random_bits`` can return *signed* int32; the bitcast to uint32
    (2D — Mosaic has no 1D bitcast) makes the shift logical. A signed
    shift would sign-extend and yield negative "uniforms" — a bias that
    masquerades as a corner strategy in rollouts.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # After >>8 the top 24 bits fit a non-negative int32, and Mosaic can
    # only cast signed ints to float — bitcast back before the cast.
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24))


def _select4(values: jax.Array, table: list[jax.Array]) -> jax.Array:
    """Per-lane select from 4 candidate vectors by ``values`` in 0..3."""
    return jnp.where(values == 0, table[0],
           jnp.where(values == 1, table[1],
           jnp.where(values == 2, table[2], table[3])))


def _compute_moves(board: jax.Array):
    """All-directions compact+merge on a cell-major board.

    Args:
        board: ``[16, B]`` int32.

    Returns:
        outs: list of 4 ``[16(dir*4+line), B]`` post-shift line positions.
        legal_dir: list of 4 ``[B]`` bool — direction changes the board.
        score_dir: list of 4 ``[B]`` int32 merge scores.
    """
    a = [
        jnp.stack([
            board[_cell(d, l, k)] for d in range(4) for l in range(4)
        ])
        for k in range(4)
    ]

    nz = [(x != 0).astype(jnp.int32) for x in a]
    pos = [jnp.zeros_like(nz[0]), nz[0], nz[0] + nz[1],
           nz[0] + nz[1] + nz[2]]
    c = []
    for k in range(4):
        slot = jnp.zeros_like(a[0])
        for j in range(k, 4):
            slot = jnp.where((nz[j] == 1) & (pos[j] == k), a[j], slot)
        c.append(slot)
    c0, c1, c2, c3 = c

    m01 = (c0 != 0) & (c0 == c1)
    m12 = (c1 != 0) & (c1 == c2) & ~m01
    m23 = (c2 != 0) & (c2 == c3) & ~m12
    i01 = m01.astype(jnp.int32)
    i12 = m12.astype(jnp.int32)
    i23 = m23.astype(jnp.int32)

    out0 = c0 + i01
    out1 = jnp.where(m01, c2 + i23, c1 + i12)
    out2 = jnp.where(m01, jnp.where(m23, 0, c3),
                     jnp.where(m12, c3, c2 + i23))
    out3 = jnp.where(m01 | m12 | m23, 0, c3)
    row_score = (
        i01 * (jnp.int32(1) << (c0 + 1))
        + i12 * (jnp.int32(1) << (c1 + 1))
        + i23 * (jnp.int32(1) << (c2 + 1))
    )
    outs = [out0, out1, out2, out3]

    changed_rows = (
        (out0 != a[0]) | (out1 != a[1]) | (out2 != a[2]) | (out3 != a[3])
    )
    legal_dir = [
        (changed_rows[4 * d] | changed_rows[4 * d + 1]
         | changed_rows[4 * d + 2] | changed_rows[4 * d + 3])
        for d in range(4)
    ]
    score_dir = [
        row_score[4 * d] + row_score[4 * d + 1]
        + row_score[4 * d + 2] + row_score[4 * d + 3]
        for d in range(4)
    ]
    return outs, legal_dir, score_dir


def _apply_action(outs: list[jax.Array], action: jax.Array) -> jax.Array:
    """Rebuild the moved cell-major board for the chosen direction.

    First materialise each direction's moved board as a static row
    permutation of the shift outputs, then pick between the four with 3
    whole-tile selects — full sublane utilisation instead of per-cell
    row selects.
    """
    moved_dir = []
    for d in range(4):
        rows = [None] * 16
        for line in range(4):
            for k in range(4):
                rows[_cell(d, line, k)] = outs[k][4 * d + line]
        moved_dir.append(jnp.stack(rows))
    return _select4(action[None, :], moved_dir)


def _spawn_cm(bd: jax.Array, u_p: jax.Array, u_v: jax.Array) -> jax.Array:
    """Spawn exp 1 (p=0.9) / exp 2 uniformly over empty cells; no-op when
    full. ``bd``: [16, B]; ``u_p``/``u_v``: [B] uniforms.

    The prefix count over cells is unrolled row-by-row (Mosaic has no
    cumsum primitive, and 16 static rows unroll to plain vector adds).
    """
    empty_f = (bd == 0).astype(jnp.float32)  # [16, B]
    # inclusive prefix count over cells as ONE small MXU matmul with a
    # lower-triangular ones matrix (values <= 16, exact in f32)
    tri = jnp.tril(jnp.ones((16, 16), jnp.float32))
    csum = jnp.dot(tri, empty_f, preferred_element_type=jnp.float32)
    n_empty = csum[15]
    k = jnp.floor(u_p * n_empty)
    k = jnp.minimum(k, jnp.maximum(n_empty - 1.0, 0.0))
    target = (empty_f == 1.0) & (csum == (k + 1.0)[None, :])
    val = jnp.where(u_v < 0.9, 1, 2)
    return bd + target.astype(jnp.int32) * val[None, :]


def _step_cm(board, score, episodes, total_score, u, max_tile_exp: int):
    """One random-legal self-play step with auto-reset on ``[16, B]``
    boards, uniforms ``u [>=5, B]`` supplied by the caller.

    The shared dataflow of :func:`fused_rollout` (in-kernel PRNG) and
    :func:`fused_step_uniform` (host-supplied uniforms — the CI-testable
    surface: interpret-mode PRNG returns constants, so everything
    downstream of the uniforms is validated on CPU and only
    ``_random_uniform_rows`` itself needs the real chip,
    scripts/tpu_pallas_stats.py).

    Uniform rows: 0 = action choice, 1/2 = spawn position/value,
    3/4 = reset second-tile position/value.
    """
    u_act, u_pos, u_val, u_pos2, u_val2 = u[0], u[1], u[2], u[3], u[4]

    outs, legal_dir, score_dir = _compute_moves(board)
    legal_i = [x.astype(jnp.int32) for x in legal_dir]
    n_legal = legal_i[0] + legal_i[1] + legal_i[2] + legal_i[3]
    dead = n_legal == 0

    # r-th legal direction: exactly one d satisfies legal & (cum == r)
    r = (u_act * n_legal.astype(jnp.float32)).astype(jnp.int32)
    r = jnp.minimum(r, jnp.maximum(n_legal - 1, 0))
    cum = jnp.zeros_like(n_legal)
    action = jnp.zeros_like(n_legal)
    for d in range(4):
        hit = legal_dir[d] & (cum == r)
        action = jnp.where(hit, jnp.int32(d), action)
        cum = cum + legal_i[d]
    move_score = _select4(action, score_dir)

    moved = _apply_action(outs, action)
    stepped = _spawn_cm(moved, u_pos, u_val)

    if max_tile_exp > 0:
        won = (stepped == max_tile_exp).any(axis=0)
    else:
        won = jnp.zeros_like(dead)

    fresh = _spawn_cm(
        _spawn_cm(jnp.zeros_like(board), u_pos, u_val), u_pos2, u_val2
    )
    finish = dead | won
    # dead boards took no move (stepped == board, move_score == 0,
    # since every line is unchanged), so one where() covers all cases
    new_board = jnp.where(finish[None, :], fresh, stepped)
    gained = move_score.astype(jnp.float32)
    new_score = jnp.where(finish, 0.0, score + gained)
    new_total = total_score + gained
    new_episodes = episodes + finish.astype(jnp.int32)
    return new_board, new_score, new_episodes, new_total, action


# --------------------------------------------------------------- kernels
def _move_kernel(board_ref, action_ref, out_ref, score_ref, legal_ref):
    """One deterministic move with given actions (test surface)."""
    board = board_ref[:, :].astype(jnp.int32)
    action = action_ref[0, :]
    outs, legal_dir, score_dir = _compute_moves(board)
    moved = _apply_action(outs, action)
    legal = _select4(action, [x.astype(jnp.int32) for x in legal_dir])
    out_ref[:, :] = jnp.where(legal[None, :] == 1, moved, board)
    score_ref[:, :] = _select4(action, score_dir)[None, :] * legal[None, :]
    legal_ref[:, :] = legal[None, :]


def _rollout_kernel(
    seed_ref, board_ref, out_board_ref, score_ref, episodes_ref,
    total_score_ref, steps: int, max_tile_exp: int,
):
    """One grid program: step a [16, BLOCK] board block `steps` times."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    def step_fn(_, carry):
        board, score, episodes, total_score = carry
        blk = board.shape[1]
        u = _random_uniform_rows((8, blk))
        board, score, episodes, total_score, _ = _step_cm(
            board, score, episodes, total_score, u, max_tile_exp
        )
        return board, score, episodes, total_score

    board = board_ref[:, :].astype(jnp.int32)
    zero_f = jnp.zeros(board.shape[1], jnp.float32)
    zero_i = jnp.zeros(board.shape[1], jnp.int32)
    board, score, episodes, total = jax.lax.fori_loop(
        0, steps, step_fn, (board, zero_f, zero_i, zero_f)
    )
    out_board_ref[:, :] = board
    score_ref[:, :] = score[None, :]
    episodes_ref[:, :] = episodes[None, :]
    total_score_ref[:, :] = total[None, :]


def _step_uniform_kernel(
    board_ref, u_ref, out_board_ref, score_ref, episodes_ref, action_ref,
    max_tile_exp: int,
):
    """One rollout step with caller-supplied uniforms (no PRNG)."""
    board = board_ref[:, :].astype(jnp.int32)
    zero_f = jnp.zeros(board.shape[1], jnp.float32)
    zero_i = jnp.zeros(board.shape[1], jnp.int32)
    new_board, score, episodes, _, action = _step_cm(
        board, zero_f, zero_i, zero_f, u_ref[:, :], max_tile_exp
    )
    out_board_ref[:, :] = new_board
    score_ref[:, :] = score[None, :]
    episodes_ref[:, :] = episodes[None, :]
    action_ref[:, :] = action[None, :]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def fused_step_uniform(
    boards_cm: jax.Array,
    u: jax.Array,
    block: int = 2048,
    max_tile_exp: int = 0,
    interpret=False,
):
    """One random-legal rollout step with uniforms supplied by the caller.

    The deterministic test surface for the rollout kernel: identical
    dataflow to one :func:`fused_rollout` iteration (action selection,
    spawn, win/dead detection, auto-reset) but the ``u [8, B]`` uniforms
    come in as an operand instead of the in-kernel PRNG, so interpret mode
    on CPU exercises everything the statistics-only TPU job cannot
    (tests/test_pallas.py; scripts/tpu_pallas_stats.py covers the PRNG).

    Returns ``(new_board [16, B], step_score [B] f32 (0 after a reset),
    finished [B] i32, action [B] i32)``.
    """
    n = boards_cm.shape[1]
    block = min(block, n)
    assert n % block == 0
    kernel = functools.partial(_step_uniform_kernel,
                               max_tile_exp=max_tile_exp)
    out, score, eps, action = pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((16, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(boards_cm, u.astype(jnp.float32))
    return out, score[0], eps[0], action[0]


# ------------------------------------------------------------ public API
@functools.partial(jax.jit, static_argnums=(2, 3))
def fused_move(
    boards_cm: jax.Array,
    actions: jax.Array,
    block: int = 2048,
    interpret=False,
):
    """One move on ``[16, B]`` cell-major boards with given actions.

    Returns ``(moved_cm [16, B], scores [B] i32, legal [B] i32)``;
    illegal moves leave boards unchanged with score 0.
    """
    n = boards_cm.shape[1]
    block = min(block, n)
    assert n % block == 0
    out, score, legal = pl.pallas_call(
        _move_kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((16, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(boards_cm, actions.astype(jnp.int32).reshape(1, n))
    return out, score[0], legal[0]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def fused_rollout(
    boards_cm: jax.Array,
    seed: jax.Array,
    steps: int,
    block: int = 2048,
    max_tile_exp: int = 0,
    interpret=False,
):
    """Run ``steps`` env steps of random-legal self-play with auto-reset.

    Args:
        boards_cm: ``[16, B]`` int32 cell-major boards (see
            :func:`to_cell_major`); B must be a multiple of ``block``
            and ``block`` a multiple of 128.
        seed: int32 scalar PRNG seed.
        steps: number of env steps (static).
        block: boards per grid program (VMEM-resident tile width).

    Returns:
        ``(boards_cm [16, B], scores [B] f32, episodes [B] i32,
        total_scores [B] f32)`` — final boards, current-episode scores,
        episodes completed, and total merge score accumulated per slot.
    """
    n = boards_cm.shape[1]
    assert n % block == 0 and block % 128 == 0

    kernel = functools.partial(
        _rollout_kernel, steps=steps, max_tile_exp=max_tile_exp
    )
    out_board, out_score, out_eps, out_total = pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), boards_cm)
    return out_board, out_score[0], out_eps[0], out_total[0]


def to_cell_major(boards: jax.Array) -> jax.Array:
    """``(B, 4, 4)`` exponent boards -> ``[16, B]`` int32 cell-major."""
    return boards.reshape(boards.shape[0], 16).astype(jnp.int32).T


def from_cell_major(boards_cm: jax.Array) -> jax.Array:
    """``[16, B]`` cell-major -> ``(B, 4, 4)`` int8 boards."""
    return boards_cm.T.reshape(-1, 4, 4).astype(jnp.int8)
