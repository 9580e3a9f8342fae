"""Staged-table persist + 512-game greedy eval, LEAN: the 3.2 GB train
state stays on the HOST (pickle -> numpy); only the 1.07 GB table goes
to the device, once, as the eval's parametrised argument."""
import collections
import json
import pickle
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
from gym2048_tpu.utils.checkpoint import save_array_bf16

assert jax.default_backend() == "tpu"

with open("/root/repo/artifacts/td_4x6_tc_r4_staged_state.pkl", "rb") as f:
    blob = pickle.load(f)
meta = blob["meta"]
table_np = np.asarray(blob["variables"]["table"])
del blob
steps = meta["chunks_done"] * 8192 * 64
print(f"staged table at +{steps} staged steps (host-side)", flush=True)

paths = save_array_bf16(
    "/root/repo/docs/curves/ntuple_4x6_tc_r4_staged",
    table_np,
    meta={
        "arch": "4x6", "n_vals": 16, "thresholds": [11, 12, 13],
        "staged_steps": steps, "base_steps": 1000341504,
        "config": meta["config"],
        "recipe": "scripts/r4_jobs/200_staged_init.py + staged warm "
                  "phases (tpu_bigtd_phases.py 5 <queue> 11,12,13)",
    },
    delta_stages=4,
)
print("artifact:", [str(p) for p in paths], flush=True)

# eval the bf16-rounded table (what the artifact actually holds)
import ml_dtypes
table = jax.numpy.asarray(
    table_np.astype(ml_dtypes.bfloat16).astype(np.float32)
)
del table_np

cfg = td.TDConfig(arch="4x6", tc=True, thresholds=(11, 12, 13))
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
    "agent": "greedy afterstate over the committed STAGED 4x6 TC table "
             "(4 stages, thresholds 11/12/13, weight-promoted from the "
             "1B single-stage table + 500M staged TC steps)",
    "artifact": "docs/curves/ntuple_4x6_tc_r4_staged.*",
    "episodes": 512, "seed": 99, "staged_steps": steps,
    "base_steps": 1000341504,
    "eval_wall_s": round(wall, 1),
    "Average score": res["Average score"],
    "Max score": res["Max score"],
    "Highest tile": res["Highest tile"],
    "tile_distribution": dict(sorted(dist.items())),
}
with open(
    "/root/repo/docs/curves/td_4x6_tc_r4_staged_greedy_eval.json", "w"
) as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
