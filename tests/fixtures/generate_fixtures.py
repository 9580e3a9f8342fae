"""Generate golden parity fixtures by recording the REFERENCE env.

Run once in an environment where the reference (rgal/gym-2048) is importable
(e.g. mounted at /root/reference); the resulting JSON is committed so the
test suite never needs the reference itself. Only recorded *data* is stored
— no reference code.

Each trajectory records, per step: action taken, board after the step,
reward, terminated and highest — under a fixed reset seed and a fixed
action sequence, exercising legal moves, illegal moves (which terminate) and
tile spawns.

Usage: python tests/fixtures/generate_fixtures.py /root/reference
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def record_trajectory(env, seed: int, actions, max_steps: int = 400):
    obs, _ = env.reset(seed=seed)
    steps = []
    board0 = env.get_board().copy()
    rng = np.random.default_rng(seed + 1000)
    for i in range(max_steps):
        if actions == "random":
            action = int(rng.integers(0, 4))
        else:
            action = int(actions[i % len(actions)])
        obs, reward, terminated, truncated, info = env.step(action)
        steps.append(
            {
                "action": action,
                "board": env.get_board().astype(int).tolist(),
                "reward": float(reward),
                "terminated": bool(terminated),
                "illegal": bool(info["illegal_move"]),
                "highest": int(info["highest"]),
                "score": float(env.score),
            }
        )
        if terminated:
            break
    return {"seed": seed, "board0": board0.astype(int).tolist(), "steps": steps}


def main(reference_path: str) -> None:
    sys.path.insert(0, reference_path)
    import gymnasium as gym
    import env  # noqa: F401 — registers 2048-v0 from the reference

    out = {"trajectories": []}
    e = gym.make("2048-v0").unwrapped
    # Default illegal reward (0), random actions — includes illegal endings.
    for seed in range(8):
        out["trajectories"].append(record_trajectory(e, seed, "random"))
    # Eval-style config: illegal reward -1 (train.py:184).
    e2 = gym.make("2048-v0").unwrapped
    e2.set_illegal_move_reward(-1.0)
    for seed in (456, 457, 458):
        t = record_trajectory(e2, seed, "random")
        t["illegal_move_reward"] = -1.0
        out["trajectories"].append(t)
    # Cyclic action sequence (deterministic policy shape).
    for seed in (42, 123):
        out["trajectories"].append(record_trajectory(e, seed, [0, 1, 2, 3]))

    path = Path(__file__).parent / "reference_trajectories.json"
    path.write_text(json.dumps(out))
    n = sum(len(t["steps"]) for t in out["trajectories"])
    print(f"wrote {len(out['trajectories'])} trajectories, {n} steps -> {path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
