"""Staging-threshold ablation (round-5 VERDICT item 3): promote the
COMMITTED 1B-step single-stage 4x6 table (docs/curves/ntuple_4x6_tc_r4)
to three threshold sets, continue each 250M steps under the round-5
regime (delayed TC tc_every=8 + carousel shaping 0.5), greedy-eval 128
games, and keep each run's full train state in artifacts/ so the winner
can be extended into the flagship run without retraining.
Records docs/curves/threshold_sweep.json."""
import collections
import gc
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
from gym2048_tpu.utils.checkpoint import load_array_bf16

assert jax.default_backend() == "tpu"

base_np, base_meta = load_array_bf16(
    "/root/repo/docs/curves/ntuple_4x6_tc_r4")
BASE_STEPS = base_meta.get("steps", 1_000_341_504)
print(f"base table: {base_np.shape} trained {BASE_STEPS} steps",
      flush=True)

SETS = {
    "t12_13": (12, 13),
    "t11_12_13": (11, 12, 13),
    "t11_12_13_14": (11, 12, 13, 14),
}
out = {
    "base": "docs/curves/ntuple_4x6_tc_r4.* (1B single-stage)",
    "continuation_steps": 250_000_000,
    "regime": "tc_every=8, carousel=0.5 (arXiv:1604.05085 delayed TC + "
              "carousel shaping)",
    "eval": "128-game greedy, seed 99", "rows": {},
}
for tag, thresh in SETS.items():
    cfg = td.TDConfig(
        total_steps=250_000_000, n_envs=8192, chunk_steps=64, arch="4x6",
        tc=True, alpha=1.0, alpha_final=1.0, init_value=0.0, seed=7,
        thresholds=thresh, tc_every=8, carousel=0.5,
    )
    tr = td.TDTrainer(cfg)
    state = tr.init_state()
    n_stages = len(thresh) + 1
    state["table"] = jnp.asarray(np.tile(base_np, n_stages))
    assert state["table"].shape == (tr._net.table_size,)
    state["tc_e"] = jnp.zeros_like(state["table"])
    state["tc_a"] = jnp.zeros_like(state["table"])
    t0 = time.time()
    state, history = tr.learn(state, log_every=200, log_fn=None)
    train_wall = time.time() - t0
    ckpt = f"/root/repo/artifacts/thr_{tag}_state.pkl"
    td.save_train_state(
        ckpt, state, cfg,
        chunks_done=history[-1].steps // (8192 * 64),
    )
    ev = td.play_greedy(
        state["table"], 128, jax.random.PRNGKey(99), net=tr._net,
    )
    dist = collections.Counter(e["highest"] for e in ev["Episodes"])
    row = {
        "thresholds": list(thresh), "stages": n_stages,
        "train_wall_s": round(train_wall, 1),
        "steps_per_s": round(history[-1].steps / train_wall),
        "Average score": ev["Average score"],
        "Max score": ev["Max score"],
        "Highest tile": ev["Highest tile"],
        "tile_distribution": dict(sorted(dist.items())),
        "ckpt": ckpt,
    }
    out["rows"][tag] = row
    print(json.dumps({tag: row}), flush=True)
    with open("/root/repo/docs/curves/threshold_sweep.json", "w") as f:
        json.dump(out, f, indent=1)
    del state, tr, ev
    gc.collect()
print("wrote docs/curves/threshold_sweep.json", flush=True)
del base_np
gc.collect()
