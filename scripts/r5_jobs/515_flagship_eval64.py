"""THE flagship eval (round-5 VERDICT item 1): adaptive depth-3 search
over the committed round-5 staged table, 64-game run (the 512-game run wedged the
remote tunnel after 2.7 h — see CHANGELOG round-5) — the
strongest agent configuration in the tree, never measurable before the
adaptive-depth search fix. K_DEEP/EMPTY_MAX are set from the probe
(docs/curves/adaptive_probe32.json). Records
docs/curves/td_4x6_tc_r5_adaptive_d3_eval.json."""
import collections
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
from gym2048_tpu.utils.checkpoint import load_array_bf16

assert jax.default_backend() == "tpu"

# per-move deep-search budget at B=512: tuned on the 32-game probe
K_DEEP = 8
EMPTY_MAX = 8

table_bf16, ameta = load_array_bf16(
    "/root/repo/docs/curves/ntuple_4x6_tc_r5")
table = jax.numpy.asarray(table_bf16)
thresholds = tuple(ameta["thresholds"])
net = td.TDTrainer(
    td.TDConfig(arch="4x6", tc=True, thresholds=thresholds))._net

pol = expectimax.make_adaptive_policy(
    lambda t, bs: net.value_batch(t, bs), K_DEEP,
    deep_empty_max=EMPTY_MAX, map_spawn=True,
)
t0 = time.time()
res = expectimax.play_policy(
    pol, 64, jax.random.PRNGKey(99), move_cap=30000, chunk_moves=32,
    params=table, needs_active=True,
)
wall = time.time() - t0
moves = sum(e["moves"] for e in res["Episodes"])
dist = collections.Counter(e["highest"] for e in res["Episodes"])
out = {
    "agent": f"adaptive depth-3 afterstate expectimax (k_deep={K_DEEP}, "
             f"deep_empty_max={EMPTY_MAX}) over the committed round-5 "
             f"staged table (thresholds {list(thresholds)})",
    "artifact": "docs/curves/ntuple_4x6_tc_r5.*",
    "episodes": 64, "seed": 99,
    "steps": ameta.get("staged_steps"),
    "eval_wall_s": round(wall, 1),
    "searched_moves_per_s": round(moves / wall, 1),
    "Average score": res["Average score"],
    "Max score": res["Max score"],
    "Highest tile": res["Highest tile"],
    "tile_distribution": dict(sorted(dist.items())),
}
with open("/root/repo/docs/curves/td_4x6_tc_r5_adaptive_d3_eval.json",
          "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
del table, table_bf16, res, pol
gc.collect()
