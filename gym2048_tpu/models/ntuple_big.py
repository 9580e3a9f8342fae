"""Large n-tuple networks with HBM-resident tables (TPU-native).

The small network in :mod:`gym2048_tpu.models.ntuple` (17 four-cell tuples,
1.42M weights) is VMEM-sized, which is what makes its dense one-hot-matmul
scatter/gather reformulation profitable: a lookup costs O(sub-table) MACs
and a 653x128 sub-table is cheap. The literature's headline 2048 results
(Szubert & Jaskowski 2014; Jaskowski 2016, arXiv:1604.05085; Yeh et al.
2016) come from SIX-cell tuples whose sub-tables have 16^6 ~= 16.8M entries
— dense selection against those would cost 16.8M MACs per lookup, so the
MXU trick no longer applies. This module is the HBM-scale sibling:

* configurable tuple shapes (any cell count; the standard ``4x6`` layout —
  four 6-tuples x 8 symmetries covering the board — is the default, plus
  ``5x6`` and a mixed ``4x6_4x4``);
* value lookups as bounded-size XLA gathers and TD updates as ONE
  scatter-add per step with a (sums, |sums|, counts) payload — gathers and
  scatters are serial on XLA:TPU (~135M idx/s / ~16M row-updates/s,
  docs/PERF.md), so the design minimises INDEX count: the three TC
  accumulations share one index vector, and per-op sizes stay far below
  the ~100M-element ceiling that crashes the remote worker (CLAUDE.md);
* feature extraction without any gather: cell selection is a constant
  one-hot matmul (exact — copied values <= 15) and the positional-base
  combination is exact in f32 because every index < 16^6 = 2^24.

The reference framework (rgal/gym-2048) has no counterpart — its only
models are the CNN policy (model.py:28-103); this is a beyond-reference
model family, same as the small net.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gym2048_tpu.models.ntuple import SYMS  # the 8 board symmetries

_LANES = 128  # TPU lane width: the unit of the "rows" gather/scatter paths

# Standard tuple layouts (flat row-major cell indices on the 4x4 board).
# "4x6": the classical four 6-tuples (two 2x3 rectangles + two L/rows
# shapes) — with the 8 symmetries they tile the board densely; this is the
# layout behind the published 100k+ average greedy scores.
LAYOUTS: dict[str, tuple[tuple[int, ...], ...]] = {
    "4x6": (
        (0, 1, 2, 3, 4, 5),
        (4, 5, 6, 7, 8, 9),
        (0, 1, 2, 4, 5, 6),
        (4, 5, 6, 8, 9, 10),
    ),
    "5x6": (
        (0, 1, 2, 3, 4, 5),
        (4, 5, 6, 7, 8, 9),
        (8, 9, 10, 11, 12, 13),
        (0, 1, 2, 4, 5, 6),
        (4, 5, 6, 8, 9, 10),
    ),
    # the 4x6 layout plus the 4-cell rows/cols/squares family of the small
    # net — cheap extra features that speed up early learning
    "4x6_4x4": (
        (0, 1, 2, 3, 4, 5),
        (4, 5, 6, 7, 8, 9),
        (0, 1, 2, 4, 5, 6),
        (4, 5, 6, 8, 9, 10),
        (0, 1, 2, 3),
        (0, 4, 8, 12),
        (0, 1, 4, 5),
        (5, 6, 9, 10),
    ),
}


class NTupleNetwork:
    """An n-tuple value network over HBM tables.

    ``tuples`` is a sequence of cell-index tuples (lengths may differ);
    ``n_vals`` is the exponent domain per cell (board exponents clip to
    ``n_vals - 1``; 16 covers tiles up to 2^15 = 32768, beyond any
    practically reachable game). The flat weight table concatenates one
    sub-table of ``n_vals ** len(t)`` entries per tuple; with
    ``thresholds`` (max-tile stage boundaries, arXiv:1604.05085) the table
    holds one full copy per stage, indexed by ``stage * stage_stride``.

    Instances hash by identity (each trainer builds one and passes it as a
    static jit argument); all members are host numpy constants so importing
    or constructing never touches a JAX backend.
    """

    def __init__(
        self,
        tuples,
        n_vals: int = 16,
        thresholds: tuple[int, ...] = (),
        value_impl: str = "gather",
        update_impl: str = "scatter",
    ):
        tuples = tuple(tuple(int(c) for c in t) for t in tuples)
        assert tuples and all(0 <= c < 16 for t in tuples for c in t)
        self.tuples = tuples
        self.n_vals = int(n_vals)
        self.thresholds = tuple(int(t) for t in thresholds)
        self.n_tuples = len(tuples)
        self.n_features = 8 * self.n_tuples  # lookups per board
        self.max_len = max(len(t) for t in tuples)
        # exactness bound for the f32 index arithmetic in indices_batch
        assert self.n_vals ** self.max_len <= 2 ** 24, (
            "index domain exceeds exact-f32 range; reduce n_vals or tuple "
            "length"
        )

        sizes = [self.n_vals ** len(t) for t in tuples]
        self.sub_sizes = np.asarray(sizes, np.int64)
        self.stage_stride = int(sum(sizes))
        self.n_stages = len(self.thresholds) + 1
        self.table_size = self.stage_stride * self.n_stages
        # implementation selection (see value_batch / td_update_tc):
        # "gather"/"scatter" are the scalar XLA ops; "rows" reformulates
        # both as 128-lane ROW operations — XLA:TPU's serial per-INDEX
        # cost dominates scalar gather/scatter (~135M idx/s, ~16M
        # updates/s), whereas row ops move whole lane-aligned tiles.
        assert value_impl in ("gather", "rows"), value_impl
        assert update_impl in ("scatter", "rows"), update_impl
        if self.table_size % _LANES:
            value_impl, update_impl = "gather", "scatter"  # rows need %128
        self.value_impl = value_impl
        self.update_impl = update_impl
        # offset of each tuple's sub-table within one stage
        self._offsets = np.concatenate(
            [[0], np.cumsum(sizes)[:-1]]
        ).astype(np.int32)  # (T,)

        # Padded geometry: every tuple padded to max_len with (cell 0,
        # positional base 0) so the index combine is one rectangular
        # contraction; a padded slot contributes value * 0 = 0.
        L = self.max_len
        cells = np.zeros((self.n_tuples, L), np.int32)
        pows = np.zeros((self.n_tuples, L), np.float32)
        for m, t in enumerate(tuples):
            cells[m, : len(t)] = t
            pows[m, : len(t)] = self.n_vals ** np.arange(len(t))
        # cell feeding (sym s, tuple m, slot k): SYMS[s, cells[m, k]]
        sym_cells = SYMS[:, cells]  # (8, T, L)
        # constant one-hot cell-selection matrix (see ntuple._SEL): a dense
        # (B, 16) @ (16, 8*T*L) matmul replaces the exps[CELLS] gather that
        # crashes the remote TPU worker at scale (CLAUDE.md gotcha)
        sel = np.zeros((8 * self.n_tuples * L, 16), np.float32)
        sel[np.arange(sel.shape[0]), sym_cells.reshape(-1)] = 1.0
        self._sel_t = sel.T  # (16, 8*T*L)
        self._pows = pows  # (T, L)

    # ------------------------------------------------------------ features
    def indices_batch(self, boards: jax.Array) -> jax.Array:
        """Flat table indices ``(B, 8 * T)`` int32 for ``(B, 4, 4)`` boards
        (stage offset included when the network is staged)."""
        n = boards.shape[0]
        flat = jnp.clip(
            boards.reshape(n, 16).astype(jnp.float32), 0, self.n_vals - 1
        )
        vals = flat @ self._sel_t  # (B, 8*T*L), exact copies
        vals = vals.reshape(n, 8, self.n_tuples, self.max_len)
        # every partial sum < n_vals^max_len <= 2^24: exact in f32
        local = (vals * self._pows).sum(-1)  # (B, 8, T)
        idx = local.astype(jnp.int32) + self._offsets  # (B, 8, T)
        if self.thresholds:
            from gym2048_tpu.models.ntuple import stage_of_batch

            st = stage_of_batch(boards, self.thresholds)  # (B,)
            idx = idx + (st * self.stage_stride)[:, None, None]
        return idx.reshape(n, self.n_features)

    # -------------------------------------------------------------- params
    def init_table(self, init_value: float = 0.0) -> jax.Array:
        """Flat ``(table_size,)`` f32 table; ``init_value`` is the desired
        initial ``value()`` of a board whose features are all distinct
        (spread uniformly over the ``n_tuples`` summands)."""
        return jnp.full(
            (self.table_size,),
            init_value / self.n_tuples,
            jnp.float32,
        )

    # --------------------------------------------------------------- value
    def value_batch(self, table: jax.Array, boards: jax.Array) -> jax.Array:
        """Values ``(B,)`` of ``(B, 4, 4)`` boards, mean over the 8
        symmetries of the tuple sums.

        ``value_impl="gather"``: one batched gather of ``B * 8T`` scalars.
        ``value_impl="rows"``: gather whole 128-lane ROWS (``idx // 128``)
        and select the lane with a one-hot multiply-reduce — numerically
        identical (f32 copy + exact 0/1 select), but on XLA:TPU the
        scalar gather is serial per index while the row form moves
        lane-aligned tiles.
        """
        idx = self.indices_batch(boards)
        if self.value_impl == "rows":
            flat = idx.reshape(-1)
            rows = jnp.take(
                table.reshape(-1, _LANES), flat // _LANES, axis=0
            )  # (B*8T, 128)
            oh = jax.nn.one_hot(flat % _LANES, _LANES, dtype=jnp.float32)
            return (rows * oh).sum(-1).reshape(idx.shape).sum(-1) / 8.0
        return table[idx].sum(-1) / 8.0

    def make_value_fn(self, table: jax.Array):
        """Bind ``table`` into a ``(N, 4, 4) -> (N,)`` value function (the
        shape :func:`gym2048_tpu.agents.expectimax.make_afterstate_policy`
        and the TD trainer consume)."""
        return lambda boards: self.value_batch(table, boards)

    # -------------------------------------------------------------- update
    def td_update(
        self,
        table: jax.Array,
        boards: jax.Array,
        deltas: jax.Array,
        alpha,
        valid: jax.Array | None = None,
    ) -> jax.Array:
        """Count-normalised TD scatter (same semantics as the small net's
        :func:`gym2048_tpu.models.ntuple.td_update`): each touched entry
        receives the MEAN of the per-occurrence updates that hit it, so one
        single-board update moves ``value(board)`` by exactly
        ``alpha * delta`` even when symmetries collide on an entry."""
        sums, cnts = self._scatter2(
            boards, (alpha * 8.0 / self.n_features) * deltas, valid
        )
        return table + sums / jnp.maximum(cnts, 1.0)

    def td_update_tc(
        self,
        table: jax.Array,
        tc_e: jax.Array,
        tc_a: jax.Array,
        boards: jax.Array,
        deltas: jax.Array,
        alpha,
        valid: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Temporal-coherence TD update (Beal & Smith 1999; the small net's
        :func:`gym2048_tpu.models.ntuple.td_update_tc` semantics): per-entry
        adaptive rate ``|sum of deltas| / sum of |deltas|``. One scatter-add
        with a 3-wide payload — the serial-scatter cost on XLA:TPU is per
        INDEX, so sharing one index vector across the three accumulations
        is ~3x cheaper than three scatters."""
        from gym2048_tpu.models.ntuple import _tc_combine

        w0 = (8.0 / self.n_features) * deltas
        sums, absums, cnts = self._scatter3(boards, w0, valid)
        return _tc_combine(table, tc_e, tc_a, sums, absums, cnts, alpha)

    def tc_accumulate(
        self,
        pending: tuple[jax.Array, jax.Array, jax.Array],
        boards: jax.Array,
        deltas: jax.Array,
        valid: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Scatter-add one step's TC statistics into carried ``pending``
        ``(sums, absums, counts)`` buffers WITHOUT touching the table —
        the accumulation half of *delayed* temporal-coherence learning
        (arXiv:1604.05085: apply the combine every k steps instead of
        every step). The dense table-sized combine is the staged-table
        rate killer (it scales with ``n_stages`` x table; docs/PERF.md
        round-4 tail), while this per-step cost stays proportional to
        the INDEX count only. Combine later with
        :func:`gym2048_tpu.models.ntuple._tc_combine` on the accumulated
        buffers — exactly equivalent to a single TC update of the
        concatenated steps (additivity is tested in
        tests/test_ntuple_big.py)."""
        w0 = (8.0 / self.n_features) * deltas
        idx, w, keep = self._flat_updates(boards, w0, valid)
        payloads = (w, jnp.abs(w), jnp.ones_like(w))
        if keep is not None:
            payloads = tuple(jnp.where(keep, p, 0.0) for p in payloads)
        return tuple(
            acc.at[idx].add(p, mode="promise_in_bounds")
            for acc, p in zip(pending, payloads)
        )

    def _flat_updates(self, boards, w_board, valid):
        """Common scatter prep: flat indices + per-occurrence weights,
        plus the valid mask broadcast to occurrences (``None`` when no
        mask). Masking happens on the CHANNEL VALUES, not by index
        redirection: every channel of a masked occurrence is zeroed and
        its index clamped to 0, so scatters can promise in-bounds
        indices (measured ~5% faster than the OOB-drop sentinel) while
        entry 0 only ever receives exact zeros — including a zero COUNT,
        which keeps the count-normalised mean unaffected."""
        n = boards.shape[0]
        idx = self.indices_batch(boards).reshape(-1)
        w = jnp.broadcast_to(
            w_board[:, None], (n, self.n_features)
        ).reshape(-1)
        keep = None
        if valid is not None:
            keep = jnp.broadcast_to(
                valid[:, None], (n, self.n_features)
            ).reshape(-1)
            idx = jnp.where(keep, idx, 0)
        return idx, w, keep

    def _scatter2(self, boards, w_board, valid):
        idx, w, keep = self._flat_updates(boards, w_board, valid)
        payloads = (w, jnp.ones_like(w))
        return self._scatter_add(idx, payloads, keep)

    def _scatter3(self, boards, w_board, valid):
        idx, w, keep = self._flat_updates(boards, w_board, valid)
        payloads = (w, jnp.abs(w), jnp.ones_like(w))
        return self._scatter_add(idx, payloads, keep)

    def _scatter_add(self, idx, payloads, keep=None):
        """Scatter-add ``len(payloads)`` scalar channels at the shared
        flat ``idx`` (masked occurrences arrive as index 0 + ``keep``
        False; their channels zero out below).

        ``update_impl="scatter"``: one SEPARATE in-bounds (N,) scatter
        per channel. Measured on v5e (262k indices): a single stacked
        (N,3)-payload scatter costs 26.3 ms while 3 one-channel scatters
        cost 11.3 ms total — XLA:TPU lowers multi-element update windows
        ~4x worse than scalar ones, so channel-splitting is the fast
        formulation (docs/PERF.md round-4 study).
        ``update_impl="rows"``: each update becomes a 128-lane one-hot
        ROW (``w * onehot(idx % 128)``) scatter-added at row
        ``idx // 128`` — measured NEUTRAL vs the stacked scatter (the
        per-index serial cost dominates); kept for study.
        """
        k = len(payloads)
        if keep is not None:
            payloads = tuple(
                jnp.where(keep, p, 0.0) for p in payloads
            )
        if self.update_impl == "rows":
            hi, lo = idx // _LANES, idx % _LANES
            oh = jax.nn.one_hot(lo, _LANES, dtype=jnp.float32)  # (N, 128)
            payload = jnp.stack([w[:, None] * oh for w in payloads], 1)
            acc = jnp.zeros(
                (self.table_size // _LANES, k, _LANES), jnp.float32
            ).at[hi].add(payload)
            return tuple(
                acc[:, c, :].reshape(self.table_size) for c in range(k)
            )
        return tuple(
            jnp.zeros((self.table_size,), jnp.float32).at[idx].add(
                p, mode="promise_in_bounds"
            )
            for p in payloads
        )


def make_network(
    arch: str,
    n_vals: int = 16,
    thresholds: tuple[int, ...] = (),
    value_impl: str = "gather",
    update_impl: str = "scatter",
) -> NTupleNetwork:
    """Build a named layout (see :data:`LAYOUTS`)."""
    if arch not in LAYOUTS:
        raise ValueError(
            f"unknown n-tuple layout {arch!r}; choose from "
            f"{sorted(LAYOUTS)}"
        )
    return NTupleNetwork(
        LAYOUTS[arch], n_vals, thresholds,
        value_impl=value_impl, update_impl=update_impl,
    )
