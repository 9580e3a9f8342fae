"""Initialise the STAGED continuation (round-3 VERDICT item 3): promote
the 1B-step single-stage 4x6 TC table to a 4-stage table (thresholds
11,12,13 — arXiv:1604.05085 weight promotion: every stage starts from
the trained shared value function) and save it as the staged run's
train-state checkpoint. Fresh TC accumulators (per-entry rates restart
at 1 so stages can specialise fast); fresh env batch."""
import dataclasses
import sys

for _mod in list(sys.modules):
    if _mod.startswith("gym2048_tpu"):
        del sys.modules[_mod]

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from gym2048_tpu.train import td

assert jax.default_backend() == "tpu"

base, meta = td.load_train_state("/root/repo/artifacts/td_4x6_tc_r4_state.pkl")
base_steps = meta["chunks_done"] * 8192 * 64
print(f"promoting table trained {base_steps} steps")

THRESH = (11, 12, 13)
cfg = td.TDConfig(
    total_steps=500_000_000, n_envs=8192, chunk_steps=64, arch="4x6",
    tc=True, alpha=1.0, alpha_final=1.0, init_value=0.0, seed=7,
    thresholds=THRESH,
)
tr = td.TDTrainer(cfg)
state = tr.init_state()
n_stages = len(THRESH) + 1
base_table = np.asarray(base["table"])
state["table"] = jnp.asarray(np.tile(base_table, n_stages))
assert state["table"].shape == (tr._net.table_size,)
state["tc_e"] = jnp.zeros_like(state["table"])
state["tc_a"] = jnp.zeros_like(state["table"])

td.save_train_state(
    "/root/repo/artifacts/td_4x6_tc_r4_staged_state.pkl", state, cfg,
    chunks_done=0,
)
print(f"staged checkpoint written ({n_stages} stages, "
      f"{state['table'].size} entries); base_steps={base_steps}")
