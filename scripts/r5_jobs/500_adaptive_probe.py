"""Adaptive-depth search probe (round-5 VERDICT item 1): 32 games over
the committed STAGED table with make_adaptive_policy — measures the
searched-moves/s speedup vs the round-4 depth-3 beam baseline (77.8
moves/s, td_4x6_tc_r4_d3_beam_eval.json) and sanity-checks quality at
the same seed before committing to the 512-game flagship eval.
Records docs/curves/adaptive_probe32.json."""
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

table_bf16, ameta = load_array_bf16(
    "/root/repo/docs/curves/ntuple_4x6_tc_r4_staged")
table = jax.numpy.asarray(table_bf16)
net = td.TDTrainer(
    td.TDConfig(arch="4x6", tc=True, thresholds=(11, 12, 13)))._net

out = {"episodes": 32, "seed": 99,
       "artifact": "docs/curves/ntuple_4x6_tc_r4_staged.*",
       "baseline_searched_moves_per_s": 77.8, "configs": {}}
for k_deep, empty_max in ((4, 8), (8, 10)):
    pol = expectimax.make_adaptive_policy(
        lambda t, bs: net.value_batch(t, bs), k_deep,
        deep_empty_max=empty_max,
    )
    t0 = time.time()
    res = expectimax.play_policy(
        pol, 32, jax.random.PRNGKey(99), move_cap=30000, chunk_moves=64,
        params=table, needs_active=True,
    )
    wall = time.time() - t0
    moves = sum(e["moves"] for e in res["Episodes"])
    dist = collections.Counter(e["highest"] for e in res["Episodes"])
    row = {
        "k_deep": k_deep, "deep_empty_max": empty_max,
        "eval_wall_s": round(wall, 1),
        "searched_moves_per_s": round(moves / wall, 1),
        "Average score": res["Average score"],
        "Max score": res["Max score"],
        "Highest tile": res["Highest tile"],
        "tile_distribution": dict(sorted(dist.items())),
    }
    out["configs"][f"k{k_deep}_e{empty_max}"] = row
    print(json.dumps(row), flush=True)
    with open("/root/repo/docs/curves/adaptive_probe32.json", "w") as f:
        json.dump(out, f, indent=1)
print("wrote docs/curves/adaptive_probe32.json", flush=True)
del table, table_bf16, net, pol, res
gc.collect()
