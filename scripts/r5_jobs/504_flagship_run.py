"""Flagship round-5 training run (VERDICT item 2): extend the
threshold-sweep winner to a 1B-step staged continuation under the
delayed-TC + carousel regime, persist the result as the committed
bf16 stage-delta artifact docs/curves/ntuple_4x6_tc_r5.*, and run the
512-game greedy eval against the artifact (the reproducible-from-clean-
clone standard). Records docs/curves/td_4x6_tc_r5_greedy_eval.json and
appends the training curve to docs/curves/td_4x6_tc_r5_run.jsonl."""
import collections
import dataclasses
import gc
import json
import sys
import time

for _mod in list(sys.modules):
    if _mod.startswith("gym2048_tpu"):
        del sys.modules[_mod]

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from gym2048_tpu.agents import expectimax
from gym2048_tpu.train import td
from gym2048_tpu.utils.checkpoint import load_array_bf16, save_array_bf16

assert jax.default_backend() == "tpu"

sweep = json.load(open("/root/repo/docs/curves/threshold_sweep.json"))
best_tag = max(
    sweep["rows"], key=lambda k: sweep["rows"][k]["Average score"]
)
row = sweep["rows"][best_tag]
print(f"extending sweep winner {best_tag}: {row['Average score']:.0f} "
      f"avg at 300M", flush=True)

state, meta = td.load_train_state(row["ckpt"])
start_chunk = meta["chunks_done"]
cfg = td.TDConfig(**{
    **meta["config"],
    "total_steps": 1_000_000_000,
    "thresholds": tuple(meta["config"]["thresholds"]),
})
tr = td.TDTrainer(cfg)

LOG = "/root/repo/docs/curves/td_4x6_tc_r5_run.jsonl"


def log_fn(msg):
    print(msg, flush=True)


t0 = time.time()
state, history = tr.learn(
    state, log_every=100, log_fn=log_fn, start_chunk=start_chunk,
    ckpt_path="/root/repo/artifacts/td_4x6_tc_r5_state.pkl",
    ckpt_every=400,
)
train_wall = time.time() - t0
with open(LOG, "a") as f:
    for h in history:
        f.write(json.dumps(dataclasses.asdict(h)) + "\n")
steps = history[-1].steps if history else start_chunk * 8192 * 64
print(f"continuation done at {steps} steps ({train_wall:.0f}s)",
      flush=True)

paths = save_array_bf16(
    "/root/repo/docs/curves/ntuple_4x6_tc_r5",
    np.asarray(state["table"]),
    meta={
        "arch": "4x6", "n_vals": 16,
        "thresholds": list(cfg.thresholds),
        "staged_steps": int(steps),
        "base_steps": 1_000_341_504,
        "regime": "tc_every=8 delayed TC + carousel 0.5 "
                  "(arXiv:1604.05085), promoted from "
                  "docs/curves/ntuple_4x6_tc_r4",
        "config": dataclasses.asdict(cfg),
        "recipe": "scripts/r5_jobs/503_threshold_sweep.py winner + "
                  "504_flagship_run.py",
    },
    delta_stages=len(cfg.thresholds) + 1,
)
print("artifact:", [str(p) for p in paths], flush=True)
del state
gc.collect()

table_bf16, _ = load_array_bf16("/root/repo/docs/curves/ntuple_4x6_tc_r5")
table = jax.numpy.asarray(table_bf16)
net = tr._net
pol = expectimax.make_afterstate_policy(
    lambda t, bs: net.value_batch(t, bs), depth=1, parametrised=True,
)
t0 = time.time()
res = expectimax.play_policy(
    pol, 512, jax.random.PRNGKey(99), move_cap=30000, chunk_moves=512,
    params=table,
)
wall = time.time() - t0
dist = collections.Counter(e["highest"] for e in res["Episodes"])
out = {
    "agent": f"greedy afterstate over the committed bf16 4x6 staged "
             f"table (round 5: thresholds {list(cfg.thresholds)}, 1B "
             f"base + {steps} continuation, delayed TC + carousel)",
    "artifact": "docs/curves/ntuple_4x6_tc_r5.*",
    "episodes": 512, "seed": 99, "steps": int(steps),
    "eval_wall_s": round(wall, 1),
    "Average score": res["Average score"],
    "Max score": res["Max score"],
    "Highest tile": res["Highest tile"],
    "tile_distribution": dict(sorted(dist.items())),
}
with open("/root/repo/docs/curves/td_4x6_tc_r5_greedy_eval.json",
          "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
del table, table_bf16, res
gc.collect()
