"""Batched, jittable 2048 environment with auto-reset.

This is the centrepiece of the TPU build: where the reference steps one
Python env at a time behind Gymnasium (game2048_env.py:76-111) — or eight of
them sequentially in SB3's DummyVecEnv — here ``step`` advances B boards in
lockstep as one fixed-shape XLA program. B ranges from 4k (one chip) to 1M+
(multi-host; the batch dimension is the sharding axis, see
gym2048_tpu.parallel).

Semantics per board exactly mirror the reference ``step``:

* move -> (on success) spawn -> terminal check;
* an illegal move leaves the board unchanged, spawns nothing, terminates the
  episode and yields ``illegal_move_reward`` (game2048_env.py:91-95);
* reward is the merge score of the move; ``score`` accumulates it;
* ``info['highest']`` is the highest tile after the step (pre-reset);
* optional ``max_tile``: reaching exactly that tile ends the episode
  (game2048_env.py:69-73, 267-268);
* ``reset`` zeroes the board and spawns two tiles (game2048_env.py:102-111).

Auto-reset (the vectorised replacement for VecEnv auto-reset): when a board
terminates, the returned state already holds a freshly reset board, and the
returned ``TimeStep.board`` is that post-reset board — the SB3 convention the
reference trains against.

RNG: one key lives in the state; each step consumes a fixed block of
uniforms, so the program has static shapes regardless of which boards spawn
or reset. For bit-exact replay of the reference's NumPy PCG64 stream use the
single-env adapter (gym2048_tpu.env.adapter) or ``rules.spawn_ranked``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from gym2048_tpu.core import rules


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (hashable; safe as a jit static arg).

    Attributes:
        illegal_move_reward: reward for an illegal move (reference default 0,
            evaluation uses -1; game2048_env.py:61-67).
        max_tile: tile value that ends the game when reached exactly
            (0 = no limit; reference ``set_max_tile``).
        auto_reset: replace terminated boards with freshly reset ones.
    """

    illegal_move_reward: float = 0.0
    max_tile: int = 0
    auto_reset: bool = True

    @property
    def max_tile_exp(self) -> int:
        if self.max_tile <= 0:
            return 0
        exp = self.max_tile.bit_length() - 1
        assert 1 << exp == self.max_tile, "max_tile must be a power of two"
        return exp


@struct.dataclass
class EnvState:
    """Device-resident state of B environments.

    Attributes:
        board: ``(B, 4, 4)`` int8 log2-exponent boards.
        score: ``(B,)`` float32 accumulated game score.
        done: ``(B,)`` bool — the held board is terminal (only observable when
            ``auto_reset=False``; with auto-reset it is always False).
        step_count: ``(B,)`` int32 steps taken in the current episode.
        key: PRNG key driving all spawn randomness.
    """

    board: jax.Array
    score: jax.Array
    done: jax.Array
    step_count: jax.Array
    key: jax.Array


@struct.dataclass
class TimeStep:
    """Result of one batched step (the VecEnv 5-tuple, as arrays).

    ``board`` is the post-auto-reset observation board; ``final_board`` is
    the true post-transition board *before* any auto-reset (SB3 exposes
    the same thing as ``terminal_observation`` in info); ``terminated``,
    ``reward``, ``illegal``, ``highest`` and ``score`` describe the
    transition itself (pre-reset).
    """

    board: jax.Array        # (B, 4, 4) int8 — post-auto-reset
    final_board: jax.Array  # (B, 4, 4) int8 — pre-reset transition result
    reward: jax.Array       # (B,) float32
    terminated: jax.Array   # (B,) bool
    truncated: jax.Array    # (B,) bool — always False, as in the reference
    illegal: jax.Array      # (B,) bool — info['illegal_move']
    highest: jax.Array      # (B,) int32 — info['highest'], tile value
    score: jax.Array        # (B,) float32 — game score including this step
    steps: jax.Array        # (B,) int32 — episode length incl. this step
    #                         (pre-reset) — SB3's ep_info 'l' equivalent


def _fresh_boards(u: jax.Array) -> jax.Array:
    """Empty boards + two spawned tiles. ``u``: ``(B, 4)`` uniforms."""
    board = jnp.zeros(u.shape[:-1] + (4, 4), rules.BOARD_DTYPE)
    board = rules.spawn(board, u[..., 0], u[..., 1])
    return rules.spawn(board, u[..., 2], u[..., 3])


@partial(jax.jit, static_argnums=(1,))
def reset(key: jax.Array, batch_size: int) -> EnvState:
    """Create B freshly reset environments."""
    key, k_u = jax.random.split(key)
    u = jax.random.uniform(k_u, (batch_size, 4))
    board = _fresh_boards(u)
    zeros_i = jnp.zeros(batch_size, jnp.int32)
    return EnvState(
        board=board,
        score=jnp.zeros(batch_size, jnp.float32),
        done=jnp.zeros(batch_size, bool),
        step_count=zeros_i,
        key=key,
    )


def move_products(state: EnvState):
    """All-directions move results for the current boards:
    ``(moved (B,4,4,4), scores (B,4), changed (B,4))``. Compute once and
    pass to :func:`step_with_products` when the caller also needs the
    legality mask (e.g. masked policies) — avoids a second ``move_all``.
    """
    return jax.vmap(rules.move_all)(state.board)


@partial(jax.jit, static_argnums=(2,))
def step(
    state: EnvState, action: jax.Array, config: EnvConfig = EnvConfig()
) -> tuple[EnvState, TimeStep]:
    """Advance all B environments by one action each.

    Args:
        state: current :class:`EnvState`.
        action: ``(B,)`` int array, 0=up 1=right 2=down 3=left.
        config: static :class:`EnvConfig`.

    Returns:
        ``(new_state, timestep)``.
    """
    return step_with_products(state, action, move_products(state), config)


@partial(jax.jit, static_argnums=(3,))
def step_with_products(
    state: EnvState,
    action: jax.Array,
    products,
    config: EnvConfig = EnvConfig(),
) -> tuple[EnvState, TimeStep]:
    """Like :func:`step`, with the :func:`move_products` precomputed."""
    batch = state.board.shape[0]
    key, k_u = jax.random.split(state.key)
    u = jax.random.uniform(k_u, (batch, 6))

    moved, scores, changed = products
    sel = (jnp.arange(4)[None, :] == action[:, None])
    board_after = jnp.where(
        sel[:, :, None, None], moved, 0
    ).sum(axis=1).astype(state.board.dtype)
    move_score = jnp.where(sel, scores, 0).sum(axis=1)
    legal = (changed & sel).any(axis=1)

    spawned = rules.spawn(board_after, u[:, 0], u[:, 1])
    new_board = jnp.where(legal[:, None, None], spawned, state.board)

    dead = jax.vmap(rules.is_dead)(new_board)
    max_exp = jnp.max(new_board.astype(jnp.int32), axis=(1, 2))
    win = (
        (max_exp == config.max_tile_exp)
        if config.max_tile_exp > 0
        else jnp.zeros(batch, bool)
    )
    terminated = ~legal | dead | win

    reward = jnp.where(
        legal, move_score.astype(jnp.float32), config.illegal_move_reward
    )
    new_score = state.score + jnp.where(legal, move_score, 0).astype(jnp.float32)
    highest_val = jnp.where(max_exp > 0, jnp.int32(1) << max_exp, 0)
    new_steps = state.step_count + 1

    if config.auto_reset:
        fresh = _fresh_boards(u[:, 2:6])
        out_board = jnp.where(terminated[:, None, None], fresh, new_board)
        out_score = jnp.where(terminated, 0.0, new_score)
        out_steps = jnp.where(terminated, 0, new_steps)
        out_done = jnp.zeros(batch, bool)
    else:
        out_board, out_score, out_steps = new_board, new_score, new_steps
        out_done = terminated

    new_state = EnvState(
        board=out_board,
        score=out_score,
        done=out_done,
        step_count=out_steps,
        key=key,
    )
    ts = TimeStep(
        board=out_board,
        final_board=new_board,
        reward=reward,
        terminated=terminated,
        truncated=jnp.zeros(batch, bool),
        illegal=~legal,
        highest=highest_val,
        score=new_score,
        steps=new_steps,
    )
    return new_state, ts


@jax.jit
def reset_parity(spawn_vals: jax.Array, spawn_ranks: jax.Array) -> EnvState:
    """Parity-mode reset: build B boards from host-precomputed spawn draws.

    The reference ``reset`` spawns two tiles (game2048_env.py:102-111), each
    consuming one value draw and one 16-position shuffle; here those
    decisions arrive as arrays — ``spawn_vals (B, 2)`` int exponents and
    ``spawn_ranks (B, 2, 16)`` shuffle orders (see
    :class:`gym2048_tpu.env.parity.ReferenceSpawnStream`) — and are applied
    by ``rules.spawn_ranked`` inside jit, so the reference's NumPy PCG64
    stream replays bit-exactly through the batched device env.
    """
    batch = spawn_vals.shape[0]
    board = jnp.zeros((batch, 4, 4), rules.BOARD_DTYPE)
    for i in range(2):
        board = jax.vmap(rules.spawn_ranked)(
            board, spawn_vals[:, i], spawn_ranks[:, i]
        )
    return EnvState(
        board=board,
        score=jnp.zeros(batch, jnp.float32),
        done=jnp.zeros(batch, bool),
        step_count=jnp.zeros(batch, jnp.int32),
        key=jax.random.PRNGKey(0),  # unused: parity stepping consumes no RNG
    )


@partial(jax.jit, static_argnums=(4,))
def step_parity(
    state: EnvState,
    action: jax.Array,
    spawn_val: jax.Array,
    spawn_rank: jax.Array,
    config: EnvConfig = EnvConfig(auto_reset=False),
) -> tuple[EnvState, TimeStep]:
    """Parity-mode step: spawns come from host-precomputed reference draws.

    Bit-exact batched replay of the reference transition
    (game2048_env.py:76-100): the spawn decision for each board arrives as
    ``spawn_val (B,)`` (tile exponent, 1 or 2) and ``spawn_rank (B, 16)``
    (the order the reference's shuffled position list visits flat cells,
    game2048_env.py:169-175) and is applied with ``rules.spawn_ranked``.
    An illegal move consumes no draw — exactly as the reference consumes no
    RNG on ``IllegalMove`` — because the spawn is simply not applied.

    No auto-reset (``config.auto_reset`` is ignored): the reference stream
    contains no mid-trajectory reset decisions, so replay always runs with
    explicit resets via :func:`reset_parity`.
    """
    batch = state.board.shape[0]
    moved, scores, changed = move_products(state)
    sel = (jnp.arange(4)[None, :] == action[:, None])
    board_after = jnp.where(
        sel[:, :, None, None], moved, 0
    ).sum(axis=1).astype(state.board.dtype)
    move_score = jnp.where(sel, scores, 0).sum(axis=1)
    legal = (changed & sel).any(axis=1)

    spawned = jax.vmap(rules.spawn_ranked)(board_after, spawn_val, spawn_rank)
    new_board = jnp.where(legal[:, None, None], spawned, state.board)

    dead = jax.vmap(rules.is_dead)(new_board)
    max_exp = jnp.max(new_board.astype(jnp.int32), axis=(1, 2))
    win = (
        (max_exp == config.max_tile_exp)
        if config.max_tile_exp > 0
        else jnp.zeros(batch, bool)
    )
    terminated = ~legal | dead | win

    reward = jnp.where(
        legal, move_score.astype(jnp.float32), config.illegal_move_reward
    )
    new_score = state.score + jnp.where(legal, move_score, 0).astype(
        jnp.float32
    )
    highest_val = jnp.where(max_exp > 0, jnp.int32(1) << max_exp, 0)
    new_steps = state.step_count + 1

    new_state = EnvState(
        board=new_board,
        score=new_score,
        done=terminated,
        step_count=new_steps,
        key=state.key,
    )
    ts = TimeStep(
        board=new_board,
        final_board=new_board,
        reward=reward,
        terminated=terminated,
        truncated=jnp.zeros(batch, bool),
        illegal=~legal,
        highest=highest_val,
        score=new_score,
        steps=new_steps,
    )
    return new_state, ts


def legal_actions(state: EnvState) -> jax.Array:
    """``(B, 4)`` bool mask of actions that would change each board.

    Strictly more informative than the reference's trial-move ``isend``;
    useful for masked policies and random-legal rollouts.
    """
    _, _, changed = jax.vmap(rules.move_all)(state.board)
    return changed
