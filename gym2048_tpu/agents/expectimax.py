"""Batched on-device expectimax search for 2048.

A beyond-reference capability (the reference, rgal/gym-2048, has no search
agent — its only action selection is a policy argmax, train.py:85-119).
Classical expectimax is the strongest known non-learned 2048 player; here
the whole tree — move enumeration via ``rules.move_all``, spawn expectation
over all 16 cells x {2, 4}, heuristic leaf evaluation — is fixed-shape
XLA, vmapped over a batch of boards, so hundreds of games are searched in
lockstep on one chip.

Depth convention: ``depth`` = number of (move, spawn) plies expanded before
the heuristic leaf. Each ply multiplies the tree width by 4 moves x 32
spawn outcomes, so depth 2 evaluates 16,384 leaves per board and depth 3
~2.1M (use small batches at depth 3).

The leaf heuristic is the classic empty/monotonicity/smoothness/corner
blend; ``leaf_value`` can be swapped for a learned value function (e.g. the
PPO critic) to get policy-improvement-by-search on top of training.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gym2048_tpu.core import rules
from gym2048_tpu.env import EnvConfig, batched

# Heuristic weights (exponent units). Hand-tuned on greedy depth-1/2 play;
# the usual shape from the 2048-AI literature: keep cells empty, keep rows/
# columns monotone, keep the max tile in a corner, avoid rough surfaces.
W_EMPTY = 2.7
W_MONO = 1.4
W_SMOOTH = 0.2
W_MAX = 1.0
W_CORNER = 2.0
# Exchange rate between merge score earned along a branch (RAW merged-tile
# values from rules.move_all — merging two 1024s adds 2048, not ~11) and the
# heuristic's exponent-unit terms. Hand-tuned jointly with the weights
# above; at high tiles the score term dominates and the heuristic acts as
# the tiebreaker. For leaves already in score units use gain_weight=1.0.
W_GAIN = 0.35
DEATH = 200.0
_NEG = -1e9


def heuristic_dead_value(board: jax.Array) -> jax.Array:
    """Dead-state value for the *heuristic* leaf: leaf minus a penalty.

    DEATH is tuned for the heuristic's exponent units; it keeps an ordering
    among dead boards (dying with a better position is less bad) while
    making every death worse than any live continuation at this scale.
    """
    return heuristic_value(board) - DEATH


def bellman_dead_value(board: jax.Array) -> jax.Array:
    """Dead-state value for *score-unit* leaves: the Bellman terminal 0.

    A leaf in raw score units (an n-tuple table or a critic trained on
    unscaled rewards, values ~1e4-1e5) must NOT keep its leaf value at a
    terminal board — no future reward is collectable there — and a fixed
    penalty tuned for exponent units (DEATH=200) would barely register.
    """
    del board
    return jnp.float32(0.0)


def heuristic_value(board: jax.Array) -> jax.Array:
    """Heuristic value of a single ``(4, 4)`` exponent board (f32 scalar)."""
    e = board.astype(jnp.float32)
    empty = (board == 0).sum().astype(jnp.float32)

    dr = e[:, 1:] - e[:, :-1]
    dc = e[1:, :] - e[:-1, :]
    # monotonicity violation: per line, the smaller of the "should be
    # increasing" / "should be decreasing" breakage, summed over lines
    mono = (
        jnp.minimum(
            jnp.maximum(dr, 0.0).sum(-1), jnp.maximum(-dr, 0.0).sum(-1)
        ).sum()
        + jnp.minimum(
            jnp.maximum(dc, 0.0).sum(0), jnp.maximum(-dc, 0.0).sum(0)
        ).sum()
    )
    smooth = jnp.abs(dr).sum() + jnp.abs(dc).sum()

    m = e.max()
    corners = jnp.stack([e[0, 0], e[0, 3], e[3, 0], e[3, 3]])
    corner_bonus = jnp.where((corners == m).any(), m, 0.0)

    return (
        W_EMPTY * empty
        + W_MAX * m
        + W_CORNER * corner_bonus
        - W_MONO * mono
        - W_SMOOTH * smooth
    )


def spawn_children(board: jax.Array) -> tuple[jax.Array, jax.Array]:
    """All 32 spawn outcomes of an afterstate and their probabilities.

    Returns ``(children (32, 4, 4), probs (32,))``. Occupied cells get
    probability 0 (their bogus child boards never contribute). Spawn law
    matches the reference: value 2 w.p. 0.9 / 4 w.p. 0.1, uniform over
    empty cells (game2048_env.py:166-175).
    """
    flat = board.reshape(16)
    empty = flat == 0
    n_empty = empty.sum()
    p_cell = jnp.where(empty, 1.0 / jnp.maximum(n_empty, 1), 0.0)
    eye = jnp.eye(16, dtype=board.dtype)
    b2 = (flat[None, :] + eye).reshape(16, 4, 4)
    b4 = (flat[None, :] + 2 * eye).reshape(16, 4, 4)
    children = jnp.concatenate([b2, b4], axis=0)
    probs = jnp.concatenate([0.9 * p_cell, 0.1 * p_cell], axis=0)
    return children, probs.astype(jnp.float32)


def action_values(
    board: jax.Array,
    depth: int,
    leaf_value: Callable[[jax.Array], jax.Array] = heuristic_value,
    gain_weight: float = W_GAIN,
    dead_value: Callable[[jax.Array], jax.Array] | None = None,
) -> jax.Array:
    """Expectimax Q-values ``(4,)`` for one ``(4, 4)`` exponent board.

    Illegal actions get a large negative value; legal actions get
    ``W_GAIN * merge_score + E_spawn[state_value(child, depth - 1)]``.
    ``depth`` is static (Python recursion unrolled at trace time).
    ``leaf_value`` maps a single board to a scalar value at the horizon —
    the heuristic by default, or a learned critic (see
    :func:`value_leaf_from_critic`). ``dead_value`` maps a terminal board
    to its value; defaults to :func:`heuristic_dead_value` — pass
    :func:`bellman_dead_value` with score-unit leaves.
    """
    moved, scores, legal = rules.move_all(board)

    def afterstate_value(after: jax.Array) -> jax.Array:
        children, probs = spawn_children(after)
        child_value = lambda b: state_value(
            b, depth - 1, leaf_value, gain_weight, dead_value
        )
        if depth >= 3:
            # deep subtrees (>=65k leaves per child): evaluate the 32 spawn
            # children sequentially so the tree never materialises whole —
            # batch-level parallelism still saturates the chip
            vals = jax.lax.map(child_value, children)
        else:
            vals = jax.vmap(child_value)(children)
        return (vals * probs).sum()

    child_vals = jax.vmap(afterstate_value)(moved)
    q = gain_weight * scores.astype(jnp.float32) + child_vals
    return jnp.where(legal, q, _NEG)


def state_value(
    board: jax.Array,
    depth: int,
    leaf_value: Callable[[jax.Array], jax.Array] = heuristic_value,
    gain_weight: float = W_GAIN,
    dead_value: Callable[[jax.Array], jax.Array] | None = None,
) -> jax.Array:
    """Expectimax value of a state; dead boards get ``dead_value(board)``
    (default :func:`heuristic_dead_value`)."""
    if dead_value is None:
        dead_value = heuristic_dead_value
    if depth == 0:
        return leaf_value(board)
    q = action_values(board, depth, leaf_value, gain_weight, dead_value)
    dead = (q <= _NEG / 2).all()
    return jnp.where(dead, dead_value(board), q.max())


def value_leaf_from_critic(model, variables) -> Callable[[jax.Array], jax.Array]:
    """Adapt a trained ActorCritic's value head into a ``leaf_value``.

    Search-on-top-of-learning: expectimax backs up the critic's state value
    instead of the hand-tuned heuristic, turning a trained PPO agent into a
    stronger planning agent with no extra training.
    """
    from gym2048_tpu.models import boards_to_model_input

    def leaf(board: jax.Array) -> jax.Array:
        obs = boards_to_model_input(board[None])
        _, value = model.apply(variables, obs, train=False)
        return value[0]

    return leaf


def make_policy(
    depth: int,
    leaf_value: Callable[[jax.Array], jax.Array] = heuristic_value,
    gain_weight: float = W_GAIN,
    dead_value: Callable[[jax.Array], jax.Array] | None = None,
) -> Callable[[jax.Array], jax.Array]:
    """Batched greedy expectimax policy: boards ``(B, 4, 4)`` -> actions
    ``(B,)`` int32.

    For a *learned* leaf in raw score units (an n-tuple table or a critic
    trained on unscaled rewards) use ``gain_weight=1.0`` — the Bellman
    backup ``r + V`` — instead of the heuristic's hand-tuned exchange
    rate, and ``dead_value=bellman_dead_value`` so terminal boards are
    worth 0 rather than nearly their full leaf value (with values ~1e4-1e5
    the heuristic's fixed DEATH=200 penalty barely registers and the
    search would hardly avoid dying).
    """

    def policy(boards: jax.Array) -> jax.Array:
        q = jax.vmap(
            lambda b: action_values(
                b, depth, leaf_value, gain_weight, dead_value
            )
        )(boards)
        return q.argmax(-1).astype(jnp.int32)

    return policy


def play_batched(
    episodes: int,
    depth: int = 2,
    key: jax.Array | None = None,
    move_cap: int = 20000,
    leaf_value: Callable[[jax.Array], jax.Array] = heuristic_value,
    gain_weight: float = W_GAIN,
    dead_value: Callable[[jax.Array], jax.Array] | None = None,
) -> dict:
    """Play ``episodes`` full games in lockstep with greedy expectimax.

    One jitted ``while_loop``; each iteration searches every live board to
    ``depth`` and steps the batched env once. Returns the evaluation dict
    shape of :func:`gym2048_tpu.train.eval.evaluate_batched`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    cfg = EnvConfig(auto_reset=False)
    select = make_policy(depth, leaf_value, gain_weight, dead_value)

    @jax.jit
    def run(key):
        state = batched.reset(key, episodes)
        total = jnp.zeros(episodes, jnp.float32)
        moves = jnp.zeros(episodes, jnp.int32)
        high = jnp.zeros(episodes, jnp.int32)
        active = jnp.ones(episodes, bool)

        def cond(c):
            _, _, _, _, active, t = c
            return active.any() & (t < move_cap)

        def body(c):
            state, total, moves, high, active, t = c
            action = select(state.board)
            state, ts = batched.step(state, action, cfg)
            total += jnp.where(active, ts.reward, 0.0)
            moves += active.astype(jnp.int32)
            high = jnp.where(active, ts.highest, high)
            active = active & ~ts.terminated
            return (state, total, moves, high, active, t + 1)

        state, total, moves, high, active, t = jax.lax.while_loop(
            cond, body, (state, total, moves, high, active, jnp.int32(0))
        )
        return total, moves, high

    import numpy as np

    total, moves, high = map(np.asarray, run(key))
    return {
        "Average score": float(total.mean()),
        "Max score": float(total.max()),
        "Highest tile": int(high.max()),
        "Episodes": [
            {
                "total_reward": float(total[i]),
                "highest": int(high[i]),
                "moves": int(moves[i]),
            }
            for i in range(episodes)
        ],
    }


def main(argv: list[str] | None = None) -> None:
    import argparse
    import collections
    import json

    p = argparse.ArgumentParser(
        description="Play 2048 with batched on-device expectimax search."
    )
    p.add_argument("--episodes", type=int, default=64)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--move-cap", type=int, default=20000)
    args = p.parse_args(argv)

    result = play_batched(
        args.episodes, args.depth, jax.random.PRNGKey(args.seed),
        args.move_cap,
    )
    dist = collections.Counter(
        e["highest"] for e in result["Episodes"]
    )
    print(
        json.dumps(
            {
                "episodes": args.episodes,
                "depth": args.depth,
                "Average score": result["Average score"],
                "Max score": result["Max score"],
                "Highest tile": result["Highest tile"],
                "tile_distribution": dict(sorted(dist.items())),
            }
        )
    )


if __name__ == "__main__":
    main()
