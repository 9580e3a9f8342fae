"""Evaluation harness — the reference protocol, plus a batched TPU variant.

Protocol (reference train.py:122-229): N episodes on a fresh env with
illegal-move reward -1, epsilon-greedy over the policy argmax, env seed
``456+i`` / agent seed ``123+i``, 2000-move cap; reports average/max total
reward and highest tile, and writes ``scores_<label>.csv``.

Two implementations:

* :func:`evaluate_model` — host loop over the Gymnasium adapter using
  Python's ``random`` module exactly as the reference does (same seeding,
  same call order), so evaluation trajectories are bit-comparable;
* :func:`evaluate_batched` — all episodes in parallel on device (one
  ``lax.while_loop``), statistically equivalent and orders of magnitude
  faster; use for large-N evaluation during training.
"""

from __future__ import annotations

import csv
import random
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gym2048_tpu.env import EnvConfig, adapter, batched
from gym2048_tpu.models import boards_to_model_input
from gym2048_tpu.ops import obs as obs_ops

MOVE_CAP = 2000  # reference train.py:159


def make_predict_fn(model, variables) -> Callable[[np.ndarray], np.ndarray]:
    """Single-observation probability function (reference train.py:85-98).

    Takes the (16, 4, 4) env observation, returns probabilities (4,).
    """

    @jax.jit
    def _probs(board_exp):
        obs = boards_to_model_input(board_exp[None])
        out = model.apply(variables, obs, train=False)
        if isinstance(out, tuple):  # ActorCritic -> (logits, value)
            return jax.nn.softmax(out[0][0])
        return out[0]

    def predict(observation: np.ndarray) -> np.ndarray:
        board_exp = np.asarray(obs_ops.unstack_env(jnp.asarray(observation)))
        return np.asarray(_probs(jnp.asarray(board_exp, jnp.int8)))

    return predict


def choose_action(
    predict_fn, observation: np.ndarray, epsilon: float = 0.0
) -> int:
    """Epsilon-greedy action (reference train.py:101-119; uses Python
    ``random`` in the same call order for protocol parity)."""
    predictions = predict_fn(observation)
    if random.uniform(0, 1) > epsilon:
        return int(np.argmax(predictions))
    return random.randint(0, 3)


def evaluate_episode(
    predict_fn,
    env: adapter.Game2048Env,
    epsilon: float,
    seed: Optional[int] = None,
    agent_seed: Optional[int] = None,
) -> tuple[float, int, int, int]:
    """One evaluation episode (reference train.py:122-165).

    Returns ``(total_reward, moves_taken, total_illegals, highest_tile)``.
    """
    if agent_seed is not None:
        random.seed(agent_seed)
    else:
        random.seed()

    total_reward = 0.0
    total_illegals = 0
    moves_taken = 0

    state, _ = env.reset(seed=seed)
    info = {"highest": env.highest()}
    while True:
        action = choose_action(predict_fn, state, epsilon)
        next_state, reward, terminated, truncated, info = env.step(action)
        done = terminated or truncated
        total_reward += reward
        if info["illegal_move"]:
            total_illegals += 1
        moves_taken += 1
        if moves_taken > MOVE_CAP:
            break
        state = next_state
        if done:
            break

    return total_reward, moves_taken, total_illegals, int(info["highest"])


def evaluate_model(
    predict_fn, episodes: int, epsilon: float, verbose: bool = True
) -> dict:
    """N-episode evaluation (reference train.py:168-214)."""
    env = adapter.Game2048Env()
    env.set_illegal_move_reward(-1.0)

    scores = []
    for i in range(episodes):
        total_reward, moves, illegals, highest = evaluate_episode(
            predict_fn, env, epsilon, seed=456 + i, agent_seed=123 + i
        )
        if verbose:
            print(
                f"Episode {i}, epsilon {epsilon}, highest {highest}, "
                f"reward {total_reward:.1f}, moves {moves}, "
                f"illegals {illegals}"
            )
        scores.append(
            {
                "total_reward": total_reward,
                "highest": highest,
                "moves": moves,
                "illegal_moves": illegals,
            }
        )

    average_score = sum(s["total_reward"] for s in scores) / episodes
    max_score = max(s["total_reward"] for s in scores)
    highest_tile = max(s["highest"] for s in scores)
    if verbose:
        print(
            f"Highest tile: {highest_tile}, Average score: "
            f"{average_score:.1f}, Max score: {max_score:.1f}"
        )
    return {
        "Average score": average_score,
        "Max score": max_score,
        "Highest tile": highest_tile,
        "Episodes": scores,
    }


def report_evaluation_results(results: dict, label: str = "eval") -> None:
    """Write ``scores_<label>.csv`` (reference train.py:217-229)."""
    with open(f"scores_{label}.csv", "w") as f:
        fieldnames = ["total_reward", "highest", "moves", "illegal_moves"]
        writer = csv.DictWriter(f, fieldnames=fieldnames, lineterminator="\n")
        writer.writeheader()
        for s in results["Episodes"]:
            writer.writerow(s)


def evaluate_batched(
    model,
    variables,
    episodes: int,
    epsilon: float,
    key: jax.Array | None = None,
    move_cap: int = MOVE_CAP,
    mask_illegal: bool = False,
) -> dict:
    """All episodes in parallel on device; same protocol semantics
    (illegal reward -1, epsilon-greedy argmax, move cap), device RNG.

    RNG semantics vs :func:`evaluate_model` (the parity claim boundary):
    the host evaluator reproduces the reference protocol BIT-exactly —
    NumPy PCG64 streams seeded 456+i / 123+i, the reference's exact
    ``random()`` call order (train.py:122-214). This batched evaluator is
    the same protocol under ``jax.random`` keys: identical distributions
    (spawn law, epsilon law) but a different stream, so per-episode
    results differ sample-by-sample while the summary statistics agree to
    sampling error — for the same checkpoint expect the two Average
    scores to differ by up to ~2 SEM (per-episode score std / sqrt(N);
    ~15-30%% of the mean at the reference's N=10, a few %% at N=512).
    Parity claims (PARITY.md C14) attach to the host evaluator; this one
    exists for training-time eval at batch scale.

    ``mask_illegal`` restricts both the greedy argmax and the epsilon
    exploration to legal moves — required when evaluating a policy trained
    with ``PPOConfig.mask_illegal`` (such a policy never learned to rank
    illegal actions low).

    Returns the same result dict shape as :func:`evaluate_model`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    cfg = EnvConfig(illegal_move_reward=-1.0, auto_reset=False)

    @jax.jit
    def run(key):
        key, k_reset = jax.random.split(key)
        state = batched.reset(k_reset, episodes)
        total_reward = jnp.zeros(episodes, jnp.float32)
        illegals = jnp.zeros(episodes, jnp.int32)
        moves = jnp.zeros(episodes, jnp.int32)
        highest = jnp.zeros(episodes, jnp.int32)
        active = jnp.ones(episodes, bool)

        def cond(carry):
            _, _, _, _, _, active, _, t = carry
            return active.any() & (t < move_cap + 1)

        def body(carry):
            state, total_reward, illegals, moves, highest, active, key, t = carry
            key, k_eps, k_rand, k_step = jax.random.split(key, 4)
            out = model.apply(
                variables, boards_to_model_input(state.board), train=False
            )
            logits = out[0] if isinstance(out, tuple) else jnp.log(
                jnp.maximum(out, 1e-30)
            )
            products = None
            if mask_illegal:
                products = batched.move_products(state)
                logits = jnp.where(products[2], logits, -1e9)
            greedy = logits.argmax(-1).astype(jnp.int32)
            explore = jax.random.uniform(k_eps, (episodes,)) <= epsilon
            if mask_illegal:
                rand_act = jax.random.categorical(
                    k_rand, jnp.where(products[2], 0.0, -1e9), axis=-1
                ).astype(jnp.int32)
            else:
                rand_act = jax.random.randint(k_rand, (episodes,), 0, 4)
            action = jnp.where(explore, rand_act, greedy)
            if products is None:
                state, ts = batched.step(state, action, cfg)
            else:
                state, ts = batched.step_with_products(
                    state, action, products, cfg
                )
            total_reward += jnp.where(active, ts.reward, 0.0)
            illegals += (active & ts.illegal).astype(jnp.int32)
            moves += active.astype(jnp.int32)
            highest = jnp.where(active, ts.highest, highest)
            active = active & ~ts.terminated
            return (state, total_reward, illegals, moves, highest, active,
                    key, t + 1)

        carry = (state, total_reward, illegals, moves, highest, active, key,
                 jnp.int32(0))
        carry = jax.lax.while_loop(cond, body, carry)
        return carry[1], carry[2], carry[3], carry[4]

    total_reward, illegals, moves, highest = map(np.asarray, run(key))
    scores = [
        {
            "total_reward": float(total_reward[i]),
            "highest": int(highest[i]),
            "moves": int(moves[i]),
            "illegal_moves": int(illegals[i]),
        }
        for i in range(episodes)
    ]
    return {
        "Average score": float(total_reward.mean()),
        "Max score": float(total_reward.max()),
        "Highest tile": int(highest.max()),
        "Episodes": scores,
    }
