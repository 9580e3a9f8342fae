#!/usr/bin/env python
"""Headline benchmark: batched env throughput on one chip.

Measures end-to-end environment steps/second of the jitted, auto-resetting
batched env driven by a random-legal policy (BASELINE.json config 3: 64k
boards, merge-sum reward, auto-reset, on-device loop). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "env_steps/s", "vs_baseline": N}

vs_baseline is measured against the north-star target of 1e8 steps/s per
chip (BASELINE.md; the reference publishes no numbers of its own — its
DummyVecEnv loop measures ~1e4-1e5 steps/s on CPU).

Timing methodology: the whole T-step loop is one device program (a Python
step loop would measure the host tunnel, not the chip). We time several
repetitions with block_until_ready and additionally check that doubling T
doubles the time (guards against async-dispatch artifacts); the reported
number uses the large-T run.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 65536
T_SMALL = 128
T_LARGE = 1024
TARGET = 1.0e8


def build_rollout(batch: int, length: int):
    from gym2048_tpu.env import EnvConfig, batched

    cfg = EnvConfig(auto_reset=True)

    @jax.jit
    def rollout(state):
        def body(state, _):
            key = jax.random.fold_in(state.key, 1)
            mask = batched.legal_actions(state)
            act = jax.random.categorical(
                key, jnp.where(mask, 0.0, -1e9), axis=-1
            )
            state, ts = batched.step(state, act, cfg)
            return state, ()

        state, _ = jax.lax.scan(body, state, None, length=length)
        # A scalar checksum of the final state: fetching it to host forces
        # true completion (block_until_ready alone can be a no-op on remote
        # PJRT backends where buffers are futures).
        checksum = state.score.sum() + state.board.astype(jnp.int32).sum()
        return state, checksum

    return rollout


def time_rollout(rollout, state, repeats: int) -> tuple[float, object]:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, checksum = rollout(state)
        float(checksum)  # device-to-host sync
        best = min(best, time.perf_counter() - t0)
    return best, state


def main() -> None:
    from gym2048_tpu.env import batched

    state = batched.reset(jax.random.PRNGKey(0), BATCH)

    small = build_rollout(BATCH, T_SMALL)
    large = build_rollout(BATCH, T_LARGE)
    # warmup/compile
    state, c = small(state)
    float(c)
    state, c = large(state)
    float(c)

    t_small, state = time_rollout(small, state, repeats=3)
    t_large, state = time_rollout(large, state, repeats=3)

    # Scaling sanity: per-step time for T_LARGE should not be much smaller
    # than for T_SMALL (if it is, timing is dominated by dispatch artifacts).
    per_step_large = t_large / T_LARGE
    per_step_small = t_small / T_SMALL
    ratio = per_step_small / max(per_step_large, 1e-12)

    steps_per_s = BATCH * T_LARGE / t_large
    print(
        json.dumps(
            {
                "metric": "batched_env_steps_per_s_1chip_b65536",
                "value": round(steps_per_s),
                "unit": "env_steps/s",
                "vs_baseline": round(steps_per_s / TARGET, 3),
                "detail": {
                    "batch": BATCH,
                    "scan_len": T_LARGE,
                    "wall_s": round(t_large, 6),
                    "scaling_check_ratio": round(ratio, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
