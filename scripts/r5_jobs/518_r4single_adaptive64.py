"""Adaptive depth-3 eval over the round-4 SINGLE-STAGE artifact, 512
games (round-5 VERDICT item 8b: bring the 32-game depth-3 beam row to
the repo's 512-game standard; compare depth-2 214,789 and 32-game
depth-3 beam 244,507). Records
docs/curves/td_4x6_tc_r4_adaptive_d3_eval.json."""
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

K_DEEP = 8
EMPTY_MAX = 8

table_bf16, ameta = load_array_bf16(
    "/root/repo/docs/curves/ntuple_4x6_tc_r4")
table = jax.numpy.asarray(table_bf16)
net = td.TDTrainer(
    td.TDConfig(arch="4x6", tc=True, thresholds=()))._net

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
             f"deep_empty_max={EMPTY_MAX}) over the committed round-4 "
             "SINGLE-STAGE table (1B steps)",
    "artifact": "docs/curves/ntuple_4x6_tc_r4.*",
    "episodes": 64, "seed": 99, "steps": ameta.get("steps"),
    "eval_wall_s": round(wall, 1),
    "searched_moves_per_s": round(moves / wall, 1),
    "Average score": res["Average score"],
    "Max score": res["Max score"],
    "Highest tile": res["Highest tile"],
    "tile_distribution": dict(sorted(dist.items())),
}
with open(
    "/root/repo/docs/curves/td_4x6_tc_r4_adaptive_d3_eval.json",
    "w",
) as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
del table, table_bf16, res, pol
gc.collect()
