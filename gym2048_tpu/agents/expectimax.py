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


def _afterstate_search(
    value_fn, boards: jax.Array, plies: int, beam: bool = False,
    map_spawn: bool = True,
) -> jax.Array:
    """Afterstate-expectimax Q-values ``(B, 4)`` at ``plies`` move levels.

    ``plies`` counts moves along a branch before ``V`` is read at the last
    afterstate: 1 = ``r + V(after)`` (greedy TD), each further ply inserts
    a spawn expectation and a max over next moves. Dead spawn children take
    the Bellman terminal value 0 (score-unit leaves).

    Tree widths per board: 4 afterstates (plies 1), 512 (2), 65,536 (3).
    At plies >= 3 the first spawn expansion is evaluated with ``lax.map``
    over its 32 outcomes, so one XLA program only ever materialises a
    ``B*2048``-board value batch — bounding both memory and the gather
    sizes that crash the remote TPU worker (CLAUDE.md gotcha), while each
    map step still feeds the value path a large contraction.
    ``map_spawn=False`` disables that bounding and vmaps the whole level
    in one batch — 32x fewer (and 32x larger) value calls, the right
    trade when the DEEP batch is small and sequential tiny kernels
    dominate latency (the adaptive policy's compacted k_deep <= 128
    boards: max value batch = k*16384 boards beam-pruned, ~34M gather
    indices at k=64 — still well under the worker's ~100M ceiling).

    ``beam`` enables greedy forward pruning at the pre-leaf max level: at
    ``plies == 2`` only the move that wins the SHALLOW backup
    ``r + V(after)`` is expanded through its spawn expectation; the other
    moves keep their shallow values in the max. Chance nodes stay
    full-width, so the expectation itself is never approximated — only
    which interior max-branch gets deepened. This cuts depth-3 from 65,536
    to ~17k leaf evals per board (4 + 32x(4 + 4 + 32x4)), the difference
    between full-game depth-3 evaluation finishing in minutes vs hours
    (docs/PERF.md), at a quality cost bounded by how often the deepened
    value re-orders against a shallow sibling.
    """
    b = boards.shape[0]
    moved, scores, legal = jax.vmap(rules.move_all)(boards)
    scores = scores.astype(jnp.float32)
    if plies == 1:
        v = value_fn(moved.reshape(b * 4, 4, 4)).reshape(b, 4)
        return jnp.where(legal, scores + v, _NEG)

    def child_state_values(ch: jax.Array) -> jax.Array:
        q = _afterstate_search(value_fn, ch, plies - 1, beam, map_spawn)
        return jnp.where((q > _NEG / 2).any(-1), q.max(-1), 0.0)

    if beam and plies == 2:
        v1 = value_fn(moved.reshape(b * 4, 4, 4)).reshape(b, 4)
        q_shallow = jnp.where(legal, scores + v1, _NEG)
        a = q_shallow.argmax(-1)                      # (b,)
        rows = jnp.arange(b)
        best_after = moved[rows, a]                   # (b, 4, 4)
        children, probs = jax.vmap(spawn_children)(best_after)
        sv = child_state_values(
            children.reshape(b * 32, 4, 4)
        ).reshape(b, 32)
        q_deep = scores[rows, a] + (sv * probs).sum(-1)
        return q_shallow.at[rows, a].set(
            jnp.where(legal[rows, a], q_deep, _NEG)
        )

    after = moved.reshape(b * 4, 4, 4)
    children, probs = jax.vmap(spawn_children)(after)  # (b*4,32,..), (b*4,32)
    if plies >= 3 and map_spawn:
        sv = jax.lax.map(
            child_state_values, children.transpose(1, 0, 2, 3)
        ).T  # (b*4, 32)
    else:
        sv = child_state_values(
            children.reshape(b * 4 * 32, 4, 4)
        ).reshape(b * 4, 32)
    ev = (sv * probs).sum(-1).reshape(b, 4)
    return jnp.where(legal, scores + ev, _NEG)


def make_afterstate_policy(
    value_fn: Callable[..., jax.Array],
    depth: int = 2,
    parametrised: bool = False,
    beam: bool = False,
) -> Callable[..., jax.Array]:
    """Expectimax over an *afterstate* value function (Szubert & Jaskowski
    2014's search formulation) — the right amplifier for the TD n-tuple
    table, whose values are trained on afterstates.

    ``value_fn`` maps ``(N, 4, 4)`` boards to ``(N,)`` values in score
    units, evaluated at AFTERSTATES (post-move, pre-spawn) — e.g. the
    batched n-tuple lookup (``ntuple.value_batch``/``value_batch_mxu``).
    This fixes the state/afterstate mismatch that made depth-1 search over
    the TD table WORSE than greedy play (docs/PERF.md: leaf evaluated
    post-spawn states the table never saw), and it shrinks the tree 32x:
    the last ply needs no spawn expansion because V is defined on the
    afterstate itself.

    depth=1: ``argmax_a [r + V(after(s, a))]`` — exactly the greedy TD
    policy. depth=2: ``argmax_a [r1 + E_spawn[max_a' (r2 + V(after2))]]``
    with Bellman terminal value 0 for dead spawn children; depth=3 adds one
    more spawn/max level (see :func:`_afterstate_search` for how its 65k
    leaves per board stay within bounded sub-programs). Leaf evals per
    board per move — 4 / 512 / 65,536 — are batched into at most 32
    ``value_fn`` calls, so the lookup path always sees large contractions.

    ``parametrised=True`` changes the signatures to
    ``value_fn(params, boards)`` / ``policy(params, boards)``: REQUIRED for
    HBM-scale tables (models/ntuple_big), which must enter the jitted game
    loop as device-buffer ARGUMENTS — a value function that closes over a
    multi-hundred-MB table embeds it as an HLO constant, and the remote
    TPU compile request then fails with HTTP 413 (observed with the 268 MB
    4x6 table). Pair with ``play_policy(..., params=table)``.

    ``beam=True`` (depth 3 only) prunes the pre-leaf max level to the
    shallow-best move — ~4x fewer leaf evals, chance nodes stay exact;
    see :func:`_afterstate_search`.
    """
    assert depth in (1, 2, 3), "afterstate search supports depth 1, 2 or 3"

    if parametrised:
        def policy(params, boards: jax.Array) -> jax.Array:
            q = _afterstate_search(
                lambda bs: value_fn(params, bs), boards, depth, beam
            )
            return q.argmax(-1).astype(jnp.int32)
    else:
        def policy(boards: jax.Array) -> jax.Array:
            return _afterstate_search(
                value_fn, boards, depth, beam
            ).argmax(-1).astype(jnp.int32)

    return policy


def make_adaptive_policy(
    value_fn: Callable[..., jax.Array],
    k_deep: int,
    deep_empty_max: int = 8,
    beam: bool = True,
    map_spawn: bool = False,
) -> Callable[..., jax.Array]:
    """Adaptive-depth afterstate expectimax: depth 2 everywhere, depth 3
    only where it can matter.

    The depth-3 tree (~17k leaf evals per board with ``beam``) costs ~33x
    depth 2 (512), but its extra ply only changes decisions when the
    board is *constrained* — on an open board the spawn expectation
    averages over many safe continuations and the deep backup almost
    always agrees with the shallow one (the standard adaptive-depth
    observation of the 2048 search literature). So each lockstep move:

    1. depth-2 Q-values for ALL boards (cheap, exact);
    2. rank boards by danger (fewest empty cells), restricted to boards
       that are still ACTIVE and at most ``deep_empty_max`` empties;
    3. re-search the top ``k_deep`` boards at depth 3 (beam pruned) in a
       compacted batch and overwrite their Q rows.

    Per-move cost: ``B*512 + k_deep*17k`` leaf evals instead of
    ``B*17k`` — with ``k_deep = B/8`` that is ~6x cheaper, ~10x+ once
    finished games stop qualifying for the deep set (dead boards are
    full and would otherwise hog it). This is what makes a 512-game
    depth-3 eval of the staged flagship feasible on one chip
    (VERDICT round 4, item 1).

    Returned policy signature: ``policy(params, boards, active)`` with
    ``active`` the (B,) live-game mask — pass
    ``play_policy(..., needs_active=True)``. ``value_fn(params, boards)``
    as in the ``parametrised`` mode of :func:`make_afterstate_policy`.
    """

    def policy(params, boards: jax.Array, active: jax.Array) -> jax.Array:
        b = boards.shape[0]
        vf = lambda bs: value_fn(params, bs)
        q2 = _afterstate_search(vf, boards, 2)
        empties = (boards.reshape(b, 16) == 0).sum(-1)
        eligible = active & (empties <= deep_empty_max)
        danger = jnp.where(eligible, -empties, -(10 ** 6))
        _, top = jax.lax.top_k(danger, min(k_deep, b))
        # the deep batch is k_deep-bounded, so the whole depth-3 level
        # vmaps in one batch by default (map_spawn=False): 32 sequential
        # small value calls become 1 large one — the compacted batch is
        # latency-bound otherwise
        q3 = _afterstate_search(vf, boards[top], 3, beam, map_spawn)
        take = eligible[top][:, None]
        q = q2.at[top].set(jnp.where(take, q3, q2[top]))
        return q.argmax(-1).astype(jnp.int32)

    return policy


def play_policy(
    policy: Callable[..., jax.Array],
    episodes: int,
    key: jax.Array | None = None,
    move_cap: int = 20000,
    chunk_moves: int = 128,
    params=None,
    needs_active: bool = False,
) -> dict:
    """Play ``episodes`` full games in lockstep with an arbitrary batched
    policy ``(B, 4, 4) boards -> (B,) actions``.

    ``needs_active=True`` passes the live-game mask as a trailing
    argument (``policy(boards, active)`` / ``policy(params, boards,
    active)``) — adaptive policies use it to spend deep search only on
    games still running (:func:`make_adaptive_policy`).

    The game loop runs as HOST-CHUNKED jitted scans of ``chunk_moves``
    steps each, not one device-resident ``while_loop`` over the whole
    game: on the remote TPU stack a single XLA program that executes for
    minutes reproducibly crashes the worker (the round-1 depth-3 /
    table-leaf failure mode — CLAUDE.md gotcha), while bounded chunks with
    one scalar host fetch between them are stable and cost only ~20 ms of
    dispatch per chunk. Returns the evaluation dict shape of
    :func:`gym2048_tpu.train.eval.evaluate_batched`.

    ``params``: optional pytree passed through to ``policy(params,
    boards)`` as a traced ARGUMENT of the jitted chunk. Any large array the
    policy reads (an n-tuple table, model weights) must come in this way —
    closed-over arrays are embedded into the program as constants, which
    the remote-compile transport rejects above ~200 MB (HTTP 413).
    """
    import numpy as np

    if key is None:
        key = jax.random.PRNGKey(0)
    cfg = EnvConfig(auto_reset=False)

    @jax.jit
    def init(key):
        state = batched.reset(key, episodes)
        zeros_f = jnp.zeros(episodes, jnp.float32)
        zeros_i = jnp.zeros(episodes, jnp.int32)
        return (state, zeros_f, zeros_i, zeros_i,
                jnp.ones(episodes, bool))

    @jax.jit
    def run_chunk(carry, params):
        def body(c, _):
            state, total, moves, high, active = c
            pol_args = (state.board, active) if needs_active else (
                state.board,
            )
            action = (
                policy(*pol_args) if params is None
                else policy(params, *pol_args)
            )
            state, ts = batched.step(state, action, cfg)
            total += jnp.where(active, ts.reward, 0.0)
            moves += active.astype(jnp.int32)
            high = jnp.where(active, ts.highest, high)
            active = active & ~ts.terminated
            return (state, total, moves, high, active), ()

        carry, _ = jax.lax.scan(body, carry, None, length=chunk_moves)
        return carry

    carry = init(key)
    t = 0
    while t < move_cap:
        carry = run_chunk(carry, params)
        t += chunk_moves
        if not bool(np.asarray(carry[4]).any()):  # host sync per chunk
            break
    _, total, moves, high, _ = carry
    total, moves, high = map(np.asarray, (total, moves, high))
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


def play_batched(
    episodes: int,
    depth: int = 2,
    key: jax.Array | None = None,
    move_cap: int = 20000,
    leaf_value: Callable[[jax.Array], jax.Array] = heuristic_value,
    gain_weight: float = W_GAIN,
    dead_value: Callable[[jax.Array], jax.Array] | None = None,
) -> dict:
    """Play full games with greedy state-leaf expectimax (see
    :func:`make_policy`); :func:`play_policy` does the driving."""
    return play_policy(
        make_policy(depth, leaf_value, gain_weight, dead_value),
        episodes, key, move_cap,
    )


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
    p.add_argument(
        "--table", default=None,
        help="trained n-tuple table .pkl: search over AFTERSTATE values "
        "(make_afterstate_policy) instead of the heuristic leaf",
    )
    p.add_argument(
        "--value-impl", choices=("auto", "gather", "mxu", "mxu_bf16"),
        default="auto",
    )
    p.add_argument(
        "--beam", action="store_true",
        help="depth-3 greedy forward pruning at the pre-leaf max level "
        "(~4x fewer leaf evals; chance nodes stay exact)",
    )
    p.add_argument(
        "--adaptive", type=int, default=0, metavar="K",
        help="adaptive depth (table mode): depth 2 for all boards plus "
        "depth-3 beam re-search of the K most constrained live boards "
        "per move (make_adaptive_policy; --depth is ignored)",
    )
    p.add_argument(
        "--deep-empty-max", type=int, default=8,
        help="adaptive mode: only boards with at most this many empty "
        "cells qualify for the deep re-search",
    )
    p.add_argument(
        "--chunk-moves", type=int, default=128,
        help="jitted moves per host chunk (lower for deep searches so no "
        "single device program runs for minutes)",
    )
    args = p.parse_args(argv)

    if args.table:
        import numpy as np

        from gym2048_tpu.models import ntuple
        from gym2048_tpu.utils.checkpoint import load_model

        variables, meta = load_model(args.table)
        table = jnp.asarray(np.asarray(variables["table"]))
        arch = (meta.get("config") or {}).get("arch", "small")
        if arch != "small":
            from gym2048_tpu.models import ntuple_big

            net = ntuple_big.make_network(
                arch,
                (meta.get("config") or {}).get("n_vals", 16),
                tuple((meta.get("config") or {}).get("thresholds", ())),
            )
            params = table
            value_fn = net.value_batch  # (table, boards) -> values
        else:
            vimpl = args.value_impl
            if vimpl == "auto":
                vimpl = "mxu" if jax.default_backend() == "tpu" else "gather"
            if vimpl.startswith("mxu"):
                t_hi, t_lo = ntuple.split_table(table)
                if vimpl == "mxu_bf16":
                    t_lo = None
                params = (t_hi, t_lo)
                value_fn = lambda p, bs: ntuple.value_batch_mxu(
                    p[0], p[1], bs
                )
            else:
                params = table
                value_fn = lambda t, bs: ntuple.value_batch(t, bs)
        if args.adaptive:
            pol = make_adaptive_policy(
                value_fn, args.adaptive, args.deep_empty_max,
            )
        else:
            pol = make_afterstate_policy(
                value_fn, args.depth, parametrised=True, beam=args.beam
            )
        result = play_policy(
            pol,
            args.episodes, jax.random.PRNGKey(args.seed), args.move_cap,
            chunk_moves=args.chunk_moves, params=params,
            needs_active=bool(args.adaptive),
        )
    else:
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
