"""Architecture sweep (round-5 VERDICT item 6; prepared in round 4): 150M fresh TC
steps per big-net layout at fixed seed, then 128-game greedy eval each —
justifies (or retires) keeping three layouts. ~12 min per arch at the
round-4 rate. Writes docs/curves/arch_sweep_150m.json."""
import collections
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
from gym2048_tpu.agents import expectimax
from gym2048_tpu.train import td

assert jax.default_backend() == "tpu"

out = {"steps": 150_000_000, "train_envs": 8192, "seed": 7, "tc_every": 8,
       "eval": "128-game greedy, seed 99", "archs": {}}
for arch in ("4x6", "5x6", "4x6_4x4"):
    cfg = td.TDConfig(
        total_steps=150_000_000, n_envs=8192, chunk_steps=64, arch=arch,
        tc=True, alpha=1.0, alpha_final=1.0, init_value=0.0, seed=7,
        tc_every=8,  # delayed TC — the round-5 training regime
    )
    tr = td.TDTrainer(cfg)
    t0 = time.time()
    state, history = tr.learn(log_every=100, log_fn=None)
    train_wall = time.time() - t0
    pol = expectimax.make_afterstate_policy(
        lambda t, bs, _net=tr._net: _net.value_batch(t, bs),
        depth=1, parametrised=True,
    )
    res = expectimax.play_policy(
        pol, 128, jax.random.PRNGKey(99), move_cap=30000, chunk_moves=512,
        params=state["table"],
    )
    dist = collections.Counter(e["highest"] for e in res["Episodes"])
    row = {
        "weights": int(tr._net.table_size),
        "train_wall_s": round(train_wall, 1),
        "steps_per_s": round(history[-1].steps / train_wall),
        "Average score": res["Average score"],
        "Max score": res["Max score"],
        "Highest tile": res["Highest tile"],
        "tile_distribution": dict(sorted(dist.items())),
    }
    out["archs"][arch] = row
    print(json.dumps({arch: row}), flush=True)
    # record incrementally — partial results survive a crash
    with open("/root/repo/docs/curves/arch_sweep_150m.json", "w") as f:
        json.dump(out, f, indent=1)
print("wrote docs/curves/arch_sweep_150m.json")
