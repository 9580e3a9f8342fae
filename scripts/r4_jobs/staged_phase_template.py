
"""Big-net TC-TD phase 1/5: +100000000 steps (td_4x6_tc_r4_staged)."""
import dataclasses
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

CFG = td.TDConfig(
    total_steps=500000000, n_envs=8192, chunk_steps=64, arch="4x6",
    tc=True, alpha=1.0, alpha_final=1.0, init_value=0.0, seed=7,
    thresholds=(11, 12, 13),
)
CKPT = "/root/repo/artifacts/td_4x6_tc_r4_staged_state.pkl"
LOG = "/root/repo/docs/curves/td_4x6_tc_r4_staged_run.jsonl"
PER_CHUNK = CFG.n_envs * CFG.chunk_steps

tr = td.TDTrainer(CFG)
import os
if os.path.exists(CKPT):
    state, meta = td.load_train_state(CKPT)
    start = meta["chunks_done"]
    print(f"resumed at chunk {start} ({start * PER_CHUNK} steps)")
else:
    state = tr.init_state()
    start = 0
    print("fresh start")

t0 = time.time()


def log_fn(msg):
    print(msg, flush=True)


history_steps = start * PER_CHUNK
state, history = tr.learn(
    state, log_every=50, log_fn=log_fn, ckpt_path=CKPT, ckpt_every=50,
    start_chunk=start, max_chunks=191,
)
with open(LOG, "a") as f:
    for e in history:
        f.write(json.dumps(dataclasses.asdict(e)) + chr(10))
steps_done = history[-1].steps if history else history_steps
rate = (steps_done - history_steps) / max(time.time() - t0, 1e-9)
print(f"phase done: {steps_done} total, {rate / 1e3:.0f}k steps/s")

