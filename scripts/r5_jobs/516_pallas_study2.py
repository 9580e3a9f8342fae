"""Pallas table-op study on chip (round-5 VERDICT item 4): the DMA-ring
gather kernel (models/pallas_table.py) vs XLA's scalar gather and the
128-lane row-gather form, at the real workload sizes (262k update /
1.05M value indices into the 67M-entry 4x6 table). Either the kernel
beats the ~10 ns/idx XLA floor (then it graduates into the value path)
or the floor is confirmed as chip behaviour — number or negative into
docs/PERF.md. Records docs/curves/pallas_table_study.json."""
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
from gym2048_tpu.models import pallas_table

assert jax.default_backend() == "tpu"

S = 67_108_864  # one 4x6 stage: 4 x 16^6
rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=S).astype(np.float32))
out = {"table_entries": S, "rows": {}}


def timeit(fn, *args):
    r = fn(*args)
    float(jnp.asarray(r).sum())  # sync
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.asarray(r).sum())
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def xla_gather(t, i):
    return t[i]


@jax.jit
def rows_gather(t, i):
    rows = jnp.take(t.reshape(-1, 128), i // 128, axis=0)
    oh = jax.nn.one_hot(i % 128, 128, dtype=jnp.float32)
    return (rows * oh).sum(-1)


for n in (262_144, 1_048_576):
    idx = jnp.asarray(rng.integers(0, S, size=n).astype(np.int32))
    row = {}
    row["xla_gather_ms"] = round(timeit(xla_gather, table, idx) * 1e3, 3)
    row["rows_gather_ms"] = round(
        timeit(rows_gather, table, idx) * 1e3, 3
    )
    for chunk, n_sem in ((1024, 32), (2048, 16), (1024, 8)):
        try:
            t = timeit(
                lambda t_, i_, c=chunk, s=n_sem:
                pallas_table.gather_values(t_, i_, chunk=c, n_sem=s),
                table, idx,
            )
            row[f"pallas_c{chunk}_s{n_sem}_ms"] = round(t * 1e3, 3)
        except Exception as e:  # noqa: BLE001 — record, keep measuring
            row[f"pallas_c{chunk}_s{n_sem}_ms"] = f"ERROR: {e}"[:200]
        print(json.dumps({n: row}), flush=True)
    # exactness on chip for one config
    got = pallas_table.gather_values(table, idx[:4096], chunk=1024)
    want = table[idx[:4096]]
    row["exact_on_chip"] = bool(jnp.array_equal(got, want))
    row["ns_per_idx"] = {
        k: round(v * 1e6 / n, 2)
        for k, v in row.items() if isinstance(v, float)
    }
    out["rows"][str(n)] = row
    print(json.dumps({n: row}), flush=True)
    with open("/root/repo/docs/curves/pallas_table_study.json", "w") as f:
        json.dump(out, f, indent=1)
print("wrote docs/curves/pallas_table_study.json", flush=True)
del table, idx
gc.collect()
