"""Depth-3 FULL-WIDTH vs BEAM head-to-head on the small 1B-TC table
(VERDICT round-3 item 6b): same 16 games, same seed, bf16 MXU leaf —
quantifies the beam's quality cost against expectimax.py:249's
bounded-cost claim. Writes docs/curves/afterstate_d3_full_vs_beam.json."""
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
from gym2048_tpu.models import ntuple
from gym2048_tpu.utils.checkpoint import load_model

assert jax.default_backend() == "tpu"

variables, _ = load_model("/root/repo/docs/curves/ntuple_table_tc1b.pkl")
table = jax.numpy.asarray(variables["table"])
t_hi, _t_lo = ntuple.split_table(table)  # bf16 leaf: hi only

EPISODES, SEED = 16, 0
out = {"table": "docs/curves/ntuple_table_tc1b.pkl", "episodes": EPISODES,
       "seed": SEED, "leaf": "bf16 MXU"}
for beam in (True, False):
    pol = expectimax.make_afterstate_policy(
        lambda p, bs: ntuple.value_batch_mxu(p, None, bs),
        depth=3, parametrised=True, beam=beam,
    )
    t0 = time.time()
    res = expectimax.play_policy(
        pol, EPISODES, jax.random.PRNGKey(SEED), move_cap=30000,
        chunk_moves=32, params=t_hi,
    )
    wall = time.time() - t0
    moves = sum(e["moves"] for e in res["Episodes"])
    key = "beam" if beam else "full_width"
    out[key] = {
        "Average score": res["Average score"],
        "Max score": res["Max score"],
        "Highest tile": res["Highest tile"],
        "moves": moves,
        "wall_s": round(wall, 1),
        "searched_moves_per_s": round(moves / wall, 1),
    }
    print(json.dumps({key: out[key]}), flush=True)

with open("/root/repo/docs/curves/afterstate_d3_full_vs_beam.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote docs/curves/afterstate_d3_full_vs_beam.json")
