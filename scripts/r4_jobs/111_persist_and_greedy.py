"""Persist the 1B-step 4x6 TC table as a committed bf16 artifact, then
run the 512-game greedy eval (round-3 VERDICT item 1). The eval runs on
the bf16-ROUNDED table — the numbers must describe the artifact a user
can actually load. Records docs/curves/td_4x6_tc_r4_greedy_eval.json."""
import collections
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

state, meta = td.load_train_state("/root/repo/artifacts/td_4x6_tc_r4_state.pkl")
steps = meta["chunks_done"] * 8192 * 64
print(f"loaded table at {steps} steps")

paths = save_array_bf16(
    "/root/repo/docs/curves/ntuple_4x6_tc_r4",
    np.asarray(state["table"]),
    meta={
        "arch": "4x6", "n_vals": 16, "thresholds": [], "steps": steps,
        "config": meta["config"],
        "recipe": "scripts/tpu_bigtd_phases.py 10 (seed 7, 8192 envs, "
                  "chunk 64, TC meta-rate 1.0, init 0)",
    },
)
print("artifact:", [str(p) for p in paths])

table_bf16, _ = load_array_bf16("/root/repo/docs/curves/ntuple_4x6_tc_r4")
table = jax.numpy.asarray(table_bf16)

cfg = td.TDConfig(arch="4x6", tc=True)
net = td.TDTrainer(cfg)._net
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
    "agent": "greedy afterstate over the committed bf16 4x6 TC table "
             "(round 4, 1B steps)",
    "artifact": "docs/curves/ntuple_4x6_tc_r4.*",
    "episodes": 512, "seed": 99, "steps": steps,
    "eval_wall_s": round(wall, 1),
    "Average score": res["Average score"],
    "Max score": res["Max score"],
    "Highest tile": res["Highest tile"],
    "tile_distribution": dict(sorted(dist.items())),
}
with open("/root/repo/docs/curves/td_4x6_tc_r4_greedy_eval.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
