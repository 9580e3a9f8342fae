"""512-game depth-2 afterstate-search eval of the committed bf16 4x6
table (round-3 VERDICT items 1+weak#2: the repo's full 512-game standard,
not the 128-game sample). Records docs/curves/td_4x6_tc_r4_staged_d2_eval.json."""
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
from gym2048_tpu.utils.checkpoint import load_array_bf16

assert jax.default_backend() == "tpu"

table_bf16, ameta = load_array_bf16(
    "/root/repo/docs/curves/ntuple_4x6_tc_r4_staged")
table = jax.numpy.asarray(table_bf16)
net = td.TDTrainer(
    td.TDConfig(arch="4x6", tc=True, thresholds=(11, 12, 13)))._net
pol = expectimax.make_afterstate_policy(
    lambda t, bs: net.value_batch(t, bs), depth=2, parametrised=True,
)
t0 = time.time()
res = expectimax.play_policy(
    pol, 512, jax.random.PRNGKey(99), move_cap=30000, chunk_moves=64,
    params=table,
)
wall = time.time() - t0
moves = sum(e["moves"] for e in res["Episodes"])
dist = collections.Counter(e["highest"] for e in res["Episodes"])
out = {
    "agent": "depth-2 afterstate expectimax over the committed STAGED "
             "4x6 TC table (4 stages, 1B base + 500M staged steps)",
    "artifact": "docs/curves/ntuple_4x6_tc_r4_staged.*",
    "episodes": 512, "seed": 99, "steps": ameta.get("staged_steps"),
    "eval_wall_s": round(wall, 1),
    "searched_moves_per_s": round(moves / wall, 1),
    "Average score": res["Average score"],
    "Max score": res["Max score"],
    "Highest tile": res["Highest tile"],
    "tile_distribution": dict(sorted(dist.items())),
}
with open("/root/repo/docs/curves/td_4x6_tc_r4_staged_d2_eval.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
