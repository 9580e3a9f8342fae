"""Pallas study kernel: random-access table gather via a DMA ring.

Round-5 VERDICT item 4: the round-4 perf study measured XLA:TPU's
scalar-gather floor at ~10 ns/index on the 67M-entry n-tuple table and
every XLA-level reformulation (rows, sorted indices, dedup) failed to
beat it (docs/PERF.md round-4). The repo's thesis — Pallas beats XLA's
serial lowerings, as it does 7.7x on the env step — demanded one real
shot at the table ops with a hand-written kernel. This module is that
shot: a gather kernel that keeps the table in HBM and streams one
128-lane row per index into VMEM through a ring of ``n_sem`` concurrent
DMAs (double-buffering generalised to an n-slot ring), then resolves
the lane with one batched one-hot contraction per chunk.

Outcome (measured on v5e, docs/PERF.md round-5): the DMA-per-index
formulation is bounded by DMA *issue* rate on the scalar core, not by
HBM bandwidth, and lands WORSE than XLA's gather — the ~10 ns/idx XLA
floor is real chip behaviour for this access pattern, closing the
question with a definitive negative. The kernel stays as the measured
artifact (and the pattern reference for future sparse kernels); the
training paths keep the XLA channel-split scatter / row-gather forms.

No reference counterpart (rgal/gym-2048 has no TPU or sparse-table
code); the n-tuple tables themselves are a beyond-reference model
family (models/ntuple_big.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _gather_kernel(n_sem, chunk, idx_ref, oh_ref, table_ref, out_ref,
                   rows, sems):
    """One grid step: resolve ``chunk`` indices.

    ``idx_ref``: (chunk,) int32 ROW indices (pre-divided by 128) in SMEM
    — the scalar core reads them to program the DMAs. ``oh_ref``:
    (chunk, 128) f32 one-hot lane masks in VMEM (built outside: lane
    math is vector work, not worth scalar-core cycles). ``table_ref``:
    the whole (rows, 128) table left in HBM; ``rows``/``sems``: VMEM
    landing buffer + DMA-semaphore ring.
    """

    def dma(j, slot):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[j], 1), :],
            rows.at[pl.ds(j, 1), :],
            sems.at[slot],
        )

    def issue(j, _):
        # recycle slot j % n_sem: wait out the DMA issued n_sem ago
        @pl.when(j >= n_sem)
        def _():
            dma(j - n_sem, (j - n_sem) % n_sem).wait()

        dma(j, j % n_sem).start()
        return _

    jax.lax.fori_loop(0, chunk, issue, None)

    def drain(j, _):
        dma(j, j % n_sem).wait()
        return _

    jax.lax.fori_loop(max(chunk - n_sem, 0), chunk, drain, None)
    vals = (rows[...] * oh_ref[...]).sum(axis=1)
    out_ref[0, :, :] = vals.reshape(chunk // _LANES, _LANES)


@functools.partial(jax.jit, static_argnames=("chunk", "n_sem", "interpret"))
def gather_values(
    table: jax.Array,
    idx: jax.Array,
    chunk: int = 512,
    n_sem: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Gather ``table[idx]`` (f32) with the DMA-ring kernel.

    ``table``: flat ``(S,)`` f32, ``S % 128 == 0`` (the n-tuple tables
    are lane-padded already for the rows paths). ``idx``: ``(N,)`` int32
    with ``N % chunk == 0`` (pad with 0 and slice outside otherwise).
    Returns ``(N,)`` f32, exactly equal to ``table[idx]``.
    """
    assert table.ndim == 1 and table.shape[0] % _LANES == 0, table.shape
    assert chunk % _LANES == 0, chunk
    n = idx.shape[0]
    assert n % chunk == 0, (n, chunk)
    rows = idx // _LANES
    oh = jax.nn.one_hot(idx % _LANES, _LANES, dtype=jnp.float32)
    n_chunks = n // chunk

    out = pl.pallas_call(
        functools.partial(_gather_kernel, n_sem, chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (chunk,), lambda i: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((chunk, _LANES), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        # Mosaic constrains a block's LAST TWO dims to divide (8, 128) or
        # equal the array dims — a flat (1, chunk) block violates the
        # sublane rule, so the per-chunk output is laid out as lane rows
        out_specs=pl.BlockSpec(
            (1, chunk // _LANES, _LANES), lambda i: (i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, chunk // _LANES, _LANES), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((n_sem,)),
        ],
        interpret=interpret,
    )(rows, oh, table.reshape(-1, _LANES))
    return out.reshape(n)
