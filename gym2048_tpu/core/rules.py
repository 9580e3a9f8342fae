"""Pure, branch-free 2048 game rules as jittable JAX functions.

This is the TPU-native re-design of the reference rules engine
(``/root/reference/env/envs/game2048_env.py:165-288``). The reference shifts
one Python list at a time with data-dependent control flow; here every
operation is a fixed dataflow graph of elementwise selects so that the whole
transition vectorises over arbitrarily many boards under ``vmap``/``jit`` and
maps onto the TPU VPU with no gathers, no scatters and no dynamic shapes.

Board representation
--------------------
Boards are ``(4, 4)`` integer arrays of **log2 exponents**: ``0`` is an empty
cell and ``k`` (1..16) is the tile ``2**k``. Storage dtype is int8 (16 bytes
per board); arithmetic is done in int32 inside the kernels.

Semantics reproduced exactly (see tests/test_rules.py golden vectors, which
mirror the reference unit tests at env/envs/test_game2048_env.py:10-151):

* single-pass compact+merge, leftmost-first, a merged tile cannot merge again
  in the same move (``[2,2,2,8] -> [4,2,8]``, ``[4,4,4,4] -> [8,8]``)
  — reference ``shift`` (game2048_env.py:243-260);
* direction decomposition 0=up 1=right 2=down 3=left with per-line reversal
  — reference ``move`` (game2048_env.py:194-241);
* a move is legal iff it changes the board — reference raises ``IllegalMove``;
* merge score is the sum of the values of tiles created by merges;
* terminal iff no direction is legal, which for a 4x4 board is equivalent to
  "no empty cell and no equal adjacent pair" — reference ``isend``
  (game2048_env.py:262-280) discovers the same predicate by trial moves;
* tile spawn places 2 (p=0.9) or 4 (p=0.1) uniformly over empty cells —
  reference ``add_tile`` (game2048_env.py:166-176) shuffles all 16 positions
  and takes the first empty one, which is exactly uniform over empties.

All functions take a single board and are written so that ``jax.vmap``
produces purely elementwise batched code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Direction encoding (matches the reference action space, game2048_env.py:49)
UP, RIGHT, DOWN, LEFT = 0, 1, 2, 3

BOARD_DTYPE = jnp.int8


def _compact_merge_rows(rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Shift rows of exponents leftward: compact zeros out, merge equal pairs.

    Args:
        rows: ``(..., 4)`` int32 exponent rows.

    Returns:
        ``(new_rows (..., 4) int32, scores (...,) int32)`` where ``scores`` is
        the sum of merged tile *values* per row.
    """
    a = [rows[..., i] for i in range(4)]

    # Stable compaction: each nonzero cell moves to slot (#nonzero before it).
    nz = [(x != 0).astype(jnp.int32) for x in a]
    pos = [jnp.zeros_like(nz[0]), nz[0], nz[0] + nz[1], nz[0] + nz[1] + nz[2]]
    c = []
    for k in range(4):
        slot = jnp.zeros_like(a[0])
        for j in range(k, 4):  # cell j can only land at slot <= j
            slot = jnp.where((nz[j] == 1) & (pos[j] == k), a[j], slot)
        c.append(slot)
    c0, c1, c2, c3 = c

    # Single-pass merge on the compacted row. m01 consumes c1, so c1 can no
    # longer merge with c2; m12 consumes c2, blocking m23; m01 and m23 may
    # both fire ([4,4,4,4] -> [8,8]).
    m01 = (c0 != 0) & (c0 == c1)
    m12 = (c1 != 0) & (c1 == c2) & ~m01
    m23 = (c2 != 0) & (c2 == c3) & ~m12
    i01, i12, i23 = (m.astype(jnp.int32) for m in (m01, m12, m23))

    out0 = c0 + i01
    out1 = jnp.where(m01, c2 + i23, c1 + i12)
    out2 = jnp.where(m01, jnp.where(m23, 0, c3), jnp.where(m12, c3, c2 + i23))
    out3 = jnp.where(m01 | m12 | m23, 0, c3)

    score = (
        i01 * (jnp.int32(1) << (c0 + 1))
        + i12 * (jnp.int32(1) << (c1 + 1))
        + i23 * (jnp.int32(1) << (c2 + 1))
    )
    return jnp.stack([out0, out1, out2, out3], axis=-1), score


def _orient(board: jax.Array) -> jax.Array:
    """Stack the 4 direction views so each move becomes 'shift rows left'.

    Matches the reference's decomposition (game2048_env.py:210-237): up/down
    act on columns, right/down traverse lines in reverse.
    """
    t = jnp.swapaxes(board, -1, -2)
    return jnp.stack(
        [t, board[..., ::-1], t[..., ::-1], board],  # up, right, down, left
        axis=-3,
    )


def _unorient(oriented: jax.Array) -> jax.Array:
    """Inverse of :func:`_orient` per direction: ``(..., 4dir, 4, 4)`` boards."""
    up = jnp.swapaxes(oriented[..., 0, :, :], -1, -2)
    right = oriented[..., 1, :, ::-1]
    down = jnp.swapaxes(oriented[..., 2, :, ::-1], -1, -2)
    left = oriented[..., 3, :, :]
    return jnp.stack([up, right, down, left], axis=-3)


def move_all(board: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Apply all 4 moves to a ``(4, 4)`` exponent board at once.

    Computing every direction is the vectorised replacement for both the
    reference's per-action ``move`` and its trial-move loop in ``isend``: it
    yields the moved board, merge score and legality for each direction in one
    fixed-shape pass.

    Returns:
        moved:   ``(4, 4, 4)`` — board after each move (dir, row, col).
        scores:  ``(4,)`` int32 merge score per direction.
        changed: ``(4,)`` bool — whether the move altered the board (legality).
    """
    oriented = _orient(board.astype(jnp.int32))  # (4, 4, 4)
    new_rows, row_scores = _compact_merge_rows(oriented)
    moved = _unorient(new_rows).astype(board.dtype)
    scores = row_scores.sum(axis=-1)
    changed = jnp.any(new_rows != oriented, axis=(-1, -2))
    return moved, scores, changed


def apply_action(
    board: jax.Array, action: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Apply one action; returns ``(new_board, merge_score, legal)``.

    Illegal moves leave the board unchanged (the caller decides reward and
    termination, mirroring the ``IllegalMove`` handling in the reference
    ``step``, game2048_env.py:91-95).
    """
    moved, scores, changed = move_all(board)
    sel = (jnp.arange(4) == action).astype(board.dtype)
    new_board = (moved * sel[:, None, None]).sum(axis=0).astype(board.dtype)
    score = (scores * sel.astype(jnp.int32)).sum()
    legal = (changed & (jnp.arange(4) == action)).any()
    return jnp.where(legal, new_board, board), jnp.where(legal, score, 0), legal


def is_dead(board: jax.Array) -> jax.Array:
    """True iff no direction is legal (closed-form, no trial moves).

    A move is legal iff it changes the board; on a 4x4 grid that holds iff
    there is an empty cell or an equal adjacent pair. The reference computes
    the same predicate by trying all 4 moves (game2048_env.py:262-280).
    """
    has_empty = jnp.any(board == 0)
    h = jnp.any(board[..., :, :-1] == board[..., :, 1:])
    v = jnp.any(board[..., :-1, :] == board[..., 1:, :])
    return ~(has_empty | h | v)


def highest(board: jax.Array) -> jax.Array:
    """Highest tile *value* on the board (0 for an empty board)."""
    e = jnp.max(board).astype(jnp.int32)
    return jnp.where(e > 0, jnp.int32(1) << e, 0)


def count_empty(board: jax.Array) -> jax.Array:
    return jnp.sum((board == 0).astype(jnp.int32))


def spawn(board: jax.Array, u_val: jax.Array, u_pos: jax.Array) -> jax.Array:
    """Spawn a tile: exponent 1 (p=0.9) or 2 (p=0.1), uniform over empties.

    ``u_val``/``u_pos`` are uniforms in [0, 1). Choosing the ``k``-th empty
    cell with ``k = floor(u_pos * n_empty)`` is distribution-identical to the
    reference's shuffle-then-first-empty (game2048_env.py:166-175). If the
    board is full this is a no-op.
    """
    flat = board.reshape(board.shape[:-2] + (16,))
    empty = flat == 0
    n_empty = empty.sum(axis=-1).astype(jnp.int32)
    k = jnp.minimum((u_pos * n_empty).astype(jnp.int32), n_empty - 1)
    # inclusive prefix count of empties as a dense (16, 16) triangular
    # matmul — exact in f32 (sums <= 16). jnp.cumsum lowers to a
    # quadratic reduce_window on CPU, which constant-folds for tens of
    # seconds at large batch inside the multichip dryrun (VERDICT r4
    # weak #5); the matmul form also rides the MXU on TPU.
    tri = jnp.triu(jnp.ones((16, 16), jnp.float32))  # tri[i, j] = i <= j
    csum = (empty.astype(jnp.float32) @ tri).astype(jnp.int32)
    target = empty & (csum == (k + 1)[..., None])
    val = jnp.where(u_val < 0.9, 1, 2).astype(board.dtype)
    return (flat + target.astype(board.dtype) * val[..., None]).reshape(
        board.shape
    )


def spawn_ranked(
    board: jax.Array, val_exp: jax.Array, rank: jax.Array
) -> jax.Array:
    """Parity-mode spawn: place ``val_exp`` at the empty cell of minimum rank.

    ``rank`` is a ``(16,)`` permutation of 0..15 — the order in which the
    reference's shuffled position list visits flat cells (game2048_env.py:
    169-175). Used to replay a host-side NumPy PCG64 stream bit-exactly
    inside jitted code.
    """
    flat = board.reshape(16)
    empty = flat == 0
    masked = jnp.where(empty, rank.astype(jnp.int32), jnp.int32(100))
    pos = jnp.argmin(masked)
    add = jnp.where(empty.any(), val_exp, 0).astype(board.dtype)
    return (flat + (jnp.arange(16) == pos).astype(board.dtype) * add).reshape(4, 4)


def exp_to_value(board: jax.Array) -> jax.Array:
    """Exponent board -> tile-value board (int32), 0 stays 0."""
    e = board.astype(jnp.int32)
    return jnp.where(e > 0, jnp.int32(1) << e, 0)


def value_to_exp(values: jax.Array) -> jax.Array:
    """Tile-value board (powers of two, 0 = empty) -> exponent board (int8)."""
    v = jnp.maximum(values.astype(jnp.float32), 1.0)
    return jnp.round(jnp.log2(v)).astype(BOARD_DTYPE)
