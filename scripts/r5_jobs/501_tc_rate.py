"""Delayed-TC rate study (round-5 VERDICT items 3/weak-4): staged
4-stage 4x6 training steps/s at tc_every in {1, 8, 16}, plus the
carousel-shaping overhead — verifies the stage-combine fix restores
staged training to ~single-stage rates before the threshold sweep and
flagship run spend chip time. Records docs/curves/tc_every_rate.json."""
import gc
import json
import sys
import time

for _mod in list(sys.modules):
    if _mod.startswith("gym2048_tpu"):
        del sys.modules[_mod]

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from gym2048_tpu.train import td

assert jax.default_backend() == "tpu"

B, STEPS = 8192, 64
out = {"n_envs": B, "chunk_steps": STEPS, "rows": {}}


def rate(cfg_kwargs, tag):
    cfg = td.TDConfig(
        total_steps=B * STEPS, n_envs=B, chunk_steps=STEPS,
        arch="4x6", tc=True, alpha=1.0, alpha_final=1.0, init_value=0.0,
        **cfg_kwargs,
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
    r = B * STEPS / best
    out["rows"][tag] = round(r)
    print(f"{tag}: {r:,.0f} steps/s", flush=True)
    del state, tr
    gc.collect()
    return r


S4 = dict(thresholds=(11, 12, 13))
rate({}, "single_stage_tc1")
rate(dict(tc_every=8), "single_stage_tc8")
rate(S4, "staged4_tc1")
rate(dict(tc_every=8, **S4), "staged4_tc8")
rate(dict(tc_every=16, **S4), "staged4_tc16")
rate(dict(tc_every=8, carousel=0.5, **S4), "staged4_tc8_carousel")

with open("/root/repo/docs/curves/tc_every_rate.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote docs/curves/tc_every_rate.json", flush=True)
