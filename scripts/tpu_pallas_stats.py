"""TPU validation job for the Pallas rollout kernel's PRNG (tpu_runner).

CI covers the rollout step's full dataflow in interpret mode with
host-supplied uniforms (tests/test_pallas.py::TestStepUniformKernel); the
one thing it cannot cover is the in-kernel PRNG (`_random_uniform_rows` —
interpret-mode prng_random_bits returns constants). This job runs the real
kernel on the chip and checks rollout statistics against the XLA env's
known values, plus uniformity of the raw PRNG output.

Usage:
    python scripts/tpu_runner.py /tmp/tpujobs &            # once
    cp scripts/tpu_pallas_stats.py /tmp/tpujobs/011_pallas_stats.py
    cat /tmp/tpujobs/011_pallas_stats.py.out               # when done
"""

import sys

import numpy as np

for _mod in list(sys.modules):
    if _mod.startswith("gym2048_tpu"):
        del sys.modules[_mod]  # tpu_runner caches modules across jobs

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gym2048_tpu.core import pallas_step  # noqa: E402

assert jax.default_backend() == "tpu", jax.devices()

# 1. raw PRNG uniformity via a tiny pallas kernel around the helper
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _uniform_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    out_ref[:, :] = pallas_step._random_uniform_rows(out_ref.shape)


u = pl.pallas_call(
    _uniform_kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((64, 4096), jnp.float32),
)(jnp.asarray([123], jnp.int32))
u = np.asarray(u).reshape(-1)
print(f"uniforms: mean {u.mean():.4f} min {u.min():.2e} max {u.max():.6f}",
      flush=True)
assert 0.495 < u.mean() < 0.505, u.mean()
assert 0.0 <= u.min() and u.max() < 1.0
hist, _ = np.histogram(u, bins=16, range=(0.0, 1.0))
dev = np.abs(hist / len(u) - 1 / 16).max()
print(f"histogram max |p - 1/16|: {dev:.4f}", flush=True)
assert dev < 0.005, hist  # 16k+ per bin: binomial noise ~0.2%

# 2. full rollout statistics vs the XLA env's known random-play values
B, T = 4096, 1500
cm = pallas_step.to_cell_major(jnp.zeros((B, 4, 4), jnp.int8))
out_cm, scores, eps, totals = pallas_step.fused_rollout(cm, 11, T, 1024)
eps, totals = np.asarray(eps), np.asarray(totals)
ep_len = T * B / max(eps.sum(), 1)
score_rate = totals.mean() / T
print(f"rollout: ep_len {ep_len:.1f} score/step {score_rate:.2f}", flush=True)
assert 100 < ep_len < 150, ep_len          # random play dies at ~123 moves
assert 8.0 < score_rate < 10.5, score_rate  # ~9.1 score per step
boards = np.asarray(pallas_step.from_cell_major(out_cm))
distinct = len(np.unique(boards.reshape(B, 16), axis=0))
assert distinct > 0.9 * B, distinct
print("PALLAS_STATS_OK", flush=True)
