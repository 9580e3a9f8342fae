"""TPU validation job for the MXU n-tuple paths (drop into tpu_runner).

Validates on the real chip what CI can only check in f32 on CPU
(ntuple._mxu_dtype): the split-bf16 MXU value lookup matches the f32
gather to ~1e-3 relative, the MXU scatter matches XLA scatter, and the
full MXU train_chunk beats the scatter/gather baseline.

Usage:
    python scripts/tpu_runner.py /tmp/tpujobs &            # once
    cp scripts/tpu_td_stats.py /tmp/tpujobs/010_td_stats.py
    cat /tmp/tpujobs/010_td_stats.py.out                   # when done
"""

import sys
import time

import numpy as np

for _mod in list(sys.modules):
    if _mod.startswith("gym2048_tpu"):
        del sys.modules[_mod]  # tpu_runner caches modules across jobs

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gym2048_tpu.models import ntuple  # noqa: E402
from gym2048_tpu.train import td  # noqa: E402

assert jax.default_backend() == "tpu", jax.devices()

rng = np.random.default_rng(1)
boards = jnp.asarray(rng.integers(0, 13, size=(4096, 4, 4)), jnp.int8)
table = jnp.asarray(
    (rng.normal(size=17 * ntuple.TABLE_SIZE) * 1000).astype(np.float32)
)

# 1. split-bf16 value lookup vs f32 gather
v_ref = np.asarray(jax.jit(ntuple.value_batch)(table, boards))
t_hi, t_lo = ntuple.split_table(table)
v_mxu = np.asarray(jax.jit(ntuple.value_batch_mxu)(t_hi, t_lo, boards))
rel = np.abs(v_ref - v_mxu).max() / np.abs(v_ref).max()
print(f"value_batch_mxu vs gather rel err: {rel:.2e}", flush=True)
assert rel < 1e-3, rel

# 2. MXU scatter vs XLA scatter
deltas = jnp.asarray(rng.normal(size=4096) * 100, jnp.float32)
valid = jnp.asarray(rng.random(4096) > 0.1)
a = np.asarray(ntuple.td_update(table, boards, deltas, 0.1, valid))
b = np.asarray(ntuple.td_update_mxu(table, boards, deltas, 0.1, valid))
da, db = a - np.asarray(table), b - np.asarray(table)
rel = np.abs(da - db).max() / max(np.abs(da).max(), 1e-9)
print(f"td_update_mxu vs scatter rel err: {rel:.2e}", flush=True)
assert rel < 1e-2, rel

# 3. throughput: full MXU chunk vs scatter/gather baseline
B = 8192
rates = {}
for impl in (("scatter", "gather"), ("mxu", "mxu")):
    cfg = td.TDConfig(
        total_steps=B * 128, n_envs=B, chunk_steps=64,
        update_impl=impl[0], value_impl=impl[1],
    )
    tr = td.TDTrainer(cfg)
    st = tr.init_state()
    st, m = tr.train_chunk(st, jnp.float32(0.1))
    float(np.asarray(m["episodes"]))  # sync
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        st, m = tr.train_chunk(st, jnp.float32(0.1))
        float(np.asarray(m["episodes"]))
        best = min(best, time.perf_counter() - t0)
    rates[impl] = B * 64 / best
    print(f"train_chunk[{impl[0]}/{impl[1]}]: {rates[impl]/1e3:.0f}k steps/s",
          flush=True)
speedup = rates[("mxu", "mxu")] / rates[("scatter", "gather")]
print(f"MXU speedup: {speedup:.2f}x", flush=True)
assert rates[("mxu", "mxu")] > 350_000, rates
print("TD_STATS_OK", flush=True)
