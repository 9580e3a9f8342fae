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
# Scaling-linearity guard: per-step time at T=128 vs T=1024. Genuine on-
# device execution gives a ratio slightly >1 (fixed dispatch overhead is
# amortised over more steps at large T; measured 1.2-1.4 on v5e over the
# tunnel). If the backend returned futures without executing, or timing
# captured only dispatch, the ratio collapses toward T_LARGE/T_SMALL (=8)
# or below 1 — either way the numbers are bogus, so the bench FAILS
# (nonzero exit) outside these bounds instead of recording garbage.
RATIO_MIN = 0.8
RATIO_MAX = 3.0


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


def time_rollout(rollout, state, repeats: int) -> tuple[list, object]:
    """Time ``repeats`` runs; returns (sorted per-run seconds, state)."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, checksum = rollout(state)
        float(checksum)  # device-to-host sync
        times.append(time.perf_counter() - t0)
    return sorted(times), state


PALLAS_BATCH = 1048576
PALLAS_BLOCK = 8192


SAMPLES = 5  # per-headline timing samples; report median + [min, max]


def bench_xla() -> tuple[float, list, float]:
    """XLA-composed env path: (median steps/s, [lo, hi] spread, ratio).

    Round-4 lesson (VERDICT r5 item 5): a single best-of sample hid a
    12% round-to-round drift in the headline, so both headline benches
    now take ``SAMPLES`` timed runs and report the median with the
    min..max spread — any future drift is attributable to chip/run
    variance (inside the spread) vs a code regression (outside it).
    """
    from gym2048_tpu.env import batched

    state = batched.reset(jax.random.PRNGKey(0), BATCH)
    small = build_rollout(BATCH, T_SMALL)
    large = build_rollout(BATCH, T_LARGE)
    state, c = small(state)
    float(c)
    state, c = large(state)
    float(c)
    ts_small, state = time_rollout(small, state, repeats=3)
    ts_large, state = time_rollout(large, state, repeats=SAMPLES)
    t_small, t_large = ts_small[0], ts_large[0]
    ratio = (t_small / T_SMALL) / max(t_large / T_LARGE, 1e-12)
    med = ts_large[len(ts_large) // 2]
    spread = [
        BATCH * T_LARGE / ts_large[-1], BATCH * T_LARGE / ts_large[0]
    ]
    return BATCH * T_LARGE / med, spread, ratio


def bench_pallas() -> tuple[float, list]:
    """Fused Pallas rollout kernel (VMEM-resident boards):
    (median steps/s, [lo, hi] spread over ``SAMPLES`` runs)."""
    import jax.numpy as jnp

    from gym2048_tpu.core import pallas_step

    cm = pallas_step.to_cell_major(
        jnp.zeros((PALLAS_BATCH, 4, 4), jnp.int8)
    )

    def run():
        out = pallas_step.fused_rollout(cm, 5, T_LARGE, PALLAS_BLOCK)
        import numpy as np

        return float(np.asarray(out[1]).sum())  # host sync

    run()  # compile+warm
    times = []
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    spread = [
        PALLAS_BATCH * T_LARGE / times[-1],
        PALLAS_BATCH * T_LARGE / times[0],
    ]
    return PALLAS_BATCH * T_LARGE / med, spread


def bench_td() -> float:
    """Full-MXU TD n-tuple training throughput (env-steps/s, incl. the
    greedy search, table update, spawns and resets)."""
    import numpy as np

    from gym2048_tpu.train import td

    b, steps = 8192, 64
    cfg = td.TDConfig(
        total_steps=b * steps, n_envs=b, chunk_steps=steps,
        update_impl="mxu", value_impl="mxu",  # the quality-default config
    )
    tr = td.TDTrainer(cfg)
    state = tr.init_state()
    state, m = tr.train_chunk(state, jnp.float32(0.1))
    float(np.asarray(m["episodes"]))  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = tr.train_chunk(state, jnp.float32(0.1))
        float(np.asarray(m["episodes"]))
        best = min(best, time.perf_counter() - t0)
    return b * steps / best


def bench_td_big() -> float:
    """HBM-scale 4x6 TC-TD training throughput (the flagship quality
    learner: 67M weights, gather/scatter paths — docs/curves/td_4x6_*)."""
    import numpy as np

    from gym2048_tpu.train import td

    b, steps = 8192, 16
    cfg = td.TDConfig(
        total_steps=b * steps, n_envs=b, chunk_steps=steps,
        arch="4x6", tc=True, alpha=1.0, alpha_final=1.0, init_value=0.0,
    )
    tr = td.TDTrainer(cfg)
    state = tr.init_state()
    state, m = tr.train_chunk(state, jnp.float32(1.0))
    float(np.asarray(m["episodes"]))  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = tr.train_chunk(state, jnp.float32(1.0))
        float(np.asarray(m["episodes"]))
        best = min(best, time.perf_counter() - t0)
    return b * steps / best


def bench_ppo(reference_shape: bool) -> float:
    """PPO env-steps/s through one full train_iteration (rollout + update).

    ``reference_shape`` times the exact reference/SB3 config (8 envs x 2048
    steps, batch 256, 4 epochs, f32 — ppo_train.py:195-233 defaults);
    otherwise the TPU production shape (4096 envs x 128 steps, batch 16k,
    bf16 compute — docs/PERF.md's 60%-MFU configuration).
    """
    import numpy as np

    from gym2048_tpu.train import PPO, PPOConfig

    if reference_shape:
        cfg = PPOConfig(total_timesteps=10**9)
    else:
        cfg = PPOConfig(
            total_timesteps=10**9, n_envs=4096, n_steps=128,
            batch_size=16384, compute_dtype=jnp.bfloat16,
            shuffle_mode="sharded",
        )
    ppo = PPO(cfg)
    state = ppo.init_state(jax.random.PRNGKey(0))
    state, metrics = ppo.train_iteration(state)  # compile + warm
    float(np.asarray(metrics["loss"]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        state, metrics = ppo.train_iteration(state)
        float(np.asarray(metrics["loss"]))  # host sync
        best = min(best, time.perf_counter() - t0)
    return cfg.rollout_size / best


# Sanity floors for the PPO bench on real TPU hardware (round-2 measured
# 385k-561k steps/s at the production shape; the reference shape is
# dominated by its tiny 8-env rollout). A regression below these means the
# flagship training loop broke, so the bench FAILS.
PPO_PROD_FLOOR = 100_000
PPO_REF_FLOOR = 2_000
# TD floors: small net measured 622k (exact values) / 966k (bf16) on v5e;
# the 4x6 TC big net measured 309k after the round-4 channel-split
# scatter (was 170k). Floors sit well below measurement noise but far
# above any formulation regression (e.g. the stacked-payload scatter).
TD_FLOOR = 400_000
TD_BIG_FLOOR = 230_000


def main() -> int:
    on_tpu = jax.devices()[0].platform != "cpu"
    xla_rate, xla_spread, ratio = bench_xla()
    pallas_rate, pallas_spread = (
        bench_pallas() if on_tpu else (None, None)
    )
    td_rate = bench_td() if on_tpu else None
    td_big_rate = bench_td_big() if on_tpu else None
    ppo_prod_rate = bench_ppo(reference_shape=False) if on_tpu else None
    ppo_ref_rate = bench_ppo(reference_shape=True) if on_tpu else None
    headline = pallas_rate if pallas_rate else xla_rate
    ratio_ok = RATIO_MIN <= ratio <= RATIO_MAX
    print(
        json.dumps(
            {
                "metric": "batched_env_steps_per_s_1chip",
                "value": round(headline),
                "unit": "env_steps/s",
                "vs_baseline": round(headline / TARGET, 3),
                "detail": {
                    "pallas_fused_steps_per_s": (
                        round(pallas_rate) if pallas_rate else None
                    ),
                    "pallas_spread_steps_per_s": (
                        [round(v) for v in pallas_spread]
                        if pallas_spread else None
                    ),
                    "pallas_batch": PALLAS_BATCH,
                    "xla_steps_per_s": round(xla_rate),
                    "xla_spread_steps_per_s": [
                        round(v) for v in xla_spread
                    ],
                    "xla_batch": BATCH,
                    "timing_samples": SAMPLES,
                    "scan_len": T_LARGE,
                    "td_train_steps_per_s": (
                        round(td_rate) if td_rate else None
                    ),
                    "td_big_4x6_tc_steps_per_s": (
                        round(td_big_rate) if td_big_rate else None
                    ),
                    "ppo_steps_per_s": (
                        round(ppo_prod_rate) if ppo_prod_rate else None
                    ),
                    "ppo_steps_per_s_reference_config": (
                        round(ppo_ref_rate) if ppo_ref_rate else None
                    ),
                    "xla_scaling_check_ratio": round(ratio, 3),
                    "scaling_check_ok": ratio_ok,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )
    if not ratio_ok:
        print(
            f"FAIL: scaling ratio {ratio:.3f} outside "
            f"[{RATIO_MIN}, {RATIO_MAX}] — timing is not measuring real "
            f"device execution",
            file=sys.stderr,
        )
        return 1
    if ppo_prod_rate is not None and ppo_prod_rate < PPO_PROD_FLOOR:
        print(
            f"FAIL: ppo_steps_per_s {ppo_prod_rate:.0f} below sanity "
            f"floor {PPO_PROD_FLOOR} — flagship PPO loop regressed",
            file=sys.stderr,
        )
        return 1
    if ppo_ref_rate is not None and ppo_ref_rate < PPO_REF_FLOOR:
        print(
            f"FAIL: ppo_steps_per_s_reference_config {ppo_ref_rate:.0f} "
            f"below sanity floor {PPO_REF_FLOOR}",
            file=sys.stderr,
        )
        return 1
    if td_rate is not None and td_rate < TD_FLOOR:
        print(
            f"FAIL: td_train_steps_per_s {td_rate:.0f} below sanity "
            f"floor {TD_FLOOR}",
            file=sys.stderr,
        )
        return 1
    if td_big_rate is not None and td_big_rate < TD_BIG_FLOOR:
        print(
            f"FAIL: td_big_4x6_tc_steps_per_s {td_big_rate:.0f} below "
            f"sanity floor {TD_BIG_FLOOR} — big-net TD regressed",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
