"""Tests for the HBM-scale n-tuple networks (models/ntuple_big.py).

Exact-value tests in the spirit of the reference's golden-value style
(test_training_data.py): index math against an independent numpy oracle,
update semantics against hand-computed expectations. Big layouts use a
reduced exponent domain (n_vals=8) so tables stay MB-sized on the CI CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym2048_tpu.models import ntuple_big
from gym2048_tpu.models.ntuple import SYMS


def oracle_indices(net, board):
    """Independent numpy re-derivation of the flat feature indices."""
    flat = np.clip(np.asarray(board).reshape(16).astype(np.int64),
                   0, net.n_vals - 1)
    out = []
    for s in range(8):
        for m, t in enumerate(net.tuples):
            v = 0
            for k, c in enumerate(t):
                v += flat[SYMS[s][c]] * net.n_vals ** k
            out.append(v + net._offsets[m])
    return np.asarray(out)


@pytest.fixture(scope="module")
def net():
    return ntuple_big.make_network("4x6", n_vals=8)


class TestIndices:
    def test_matches_numpy_oracle(self, net):
        rng = np.random.default_rng(0)
        boards = rng.integers(0, 16, size=(32, 4, 4)).astype(np.int8)
        idx = np.asarray(jax.jit(net.indices_batch)(jnp.asarray(boards)))
        ref = np.stack([oracle_indices(net, b) for b in boards])
        np.testing.assert_array_equal(idx, ref)

    def test_in_bounds(self, net):
        rng = np.random.default_rng(1)
        boards = rng.integers(0, 17, size=(64, 4, 4)).astype(np.int8)
        idx = np.asarray(net.indices_batch(jnp.asarray(boards)))
        assert idx.min() >= 0 and idx.max() < net.table_size

    def test_full_domain_exact_at_n_vals_16(self):
        # the f32 index arithmetic must stay exact at the REAL domain;
        # probe the extreme board (all cells at the clip value)
        net16 = ntuple_big.make_network("4x6", n_vals=16)
        board = jnp.full((1, 4, 4), 15, jnp.int8)
        idx = np.asarray(net16.indices_batch(board))
        ref = oracle_indices(net16, np.asarray(board[0]))
        np.testing.assert_array_equal(idx[0], ref)
        assert idx.max() == net16.table_size - 1

    def test_rejects_inexact_domain(self):
        with pytest.raises(AssertionError):
            ntuple_big.NTupleNetwork([(0, 1, 2, 3, 4, 5)], n_vals=17)

    def test_mixed_lengths(self):
        net = ntuple_big.make_network("4x6_4x4", n_vals=8)
        rng = np.random.default_rng(2)
        boards = rng.integers(0, 8, size=(16, 4, 4)).astype(np.int8)
        idx = np.asarray(net.indices_batch(jnp.asarray(boards)))
        ref = np.stack([oracle_indices(net, b) for b in boards])
        np.testing.assert_array_equal(idx, ref)
        assert net.table_size == 4 * 8**6 + 4 * 8**4


class TestValue:
    def test_symmetry_invariance(self, net):
        rng = np.random.default_rng(3)
        boards = rng.integers(0, 8, size=(16, 4, 4)).astype(np.int8)
        table = jnp.asarray(
            rng.normal(size=net.table_size).astype(np.float32)
        )
        v0 = np.asarray(net.value_batch(table, jnp.asarray(boards)))
        for k in (1, 2, 3):
            vr = np.asarray(
                net.value_batch(
                    table, jnp.asarray(np.rot90(boards, k, (1, 2)).copy())
                )
            )
            np.testing.assert_allclose(vr, v0, rtol=1e-5, atol=1e-5)
        vf = np.asarray(
            net.value_batch(table, jnp.asarray(boards[:, :, ::-1].copy()))
        )
        np.testing.assert_allclose(vf, v0, rtol=1e-5, atol=1e-5)

    def test_hand_value(self):
        # single 2-cell tuple, n_vals 4: value is mean over 8 syms of one
        # entry each — hand-check on a board whose syms are enumerable
        net = ntuple_big.NTupleNetwork([(0, 1)], n_vals=4)
        table = jnp.arange(net.table_size, dtype=jnp.float32)
        board = np.zeros((4, 4), np.int8)
        board[0, 0] = 1  # exponent 1 at corner
        idx = [oracle_indices(net, board)]
        expect = np.asarray(table)[idx[0]].sum() / 8.0
        got = float(net.value_batch(table, jnp.asarray(board[None]))[0])
        assert got == pytest.approx(expect)


class TestUpdate:
    def test_single_board_moves_value_by_alpha_delta(self, net):
        rng = np.random.default_rng(4)
        table = jnp.asarray(
            rng.normal(size=net.table_size).astype(np.float32)
        )
        b = jnp.asarray(rng.integers(0, 8, size=(1, 4, 4)).astype(np.int8))
        t2 = net.td_update(table, b, jnp.asarray([3.0], jnp.float32), 0.5)
        dv = float(net.value_batch(t2, b)[0] - net.value_batch(table, b)[0])
        assert dv == pytest.approx(1.5, rel=1e-4)

    def test_tc_first_update_rate_is_one(self, net):
        rng = np.random.default_rng(5)
        table = jnp.asarray(
            rng.normal(size=net.table_size).astype(np.float32)
        )
        z = jnp.zeros_like(table)
        b = jnp.asarray(rng.integers(0, 8, size=(1, 4, 4)).astype(np.int8))
        t2, e2, a2 = net.td_update_tc(
            table, z, z, b, jnp.asarray([3.0], jnp.float32), 1.0
        )
        dv = float(net.value_batch(t2, b)[0] - net.value_batch(table, b)[0])
        assert dv == pytest.approx(3.0, rel=1e-4)
        # accumulators recorded the per-occurrence mass
        assert float(jnp.abs(e2).sum()) > 0
        np.testing.assert_allclose(
            np.asarray(jnp.abs(e2)), np.asarray(a2), rtol=1e-6
        )

    def test_tc_rate_decays_on_oscillation(self, net):
        rng = np.random.default_rng(6)
        table = jnp.zeros(net.table_size, jnp.float32)
        z = jnp.zeros_like(table)
        b = jnp.asarray(rng.integers(0, 8, size=(1, 4, 4)).astype(np.int8))
        d = jnp.asarray([4.0], jnp.float32)
        t1, e1, a1 = net.td_update_tc(table, z, z, b, d, 1.0)
        # opposite-sign delta: |e| / a = |4-4| / (4+4) = 0 -> no movement
        t2, e2, a2 = net.td_update_tc(t1, e1, a1, b, -d, 1.0)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1))

    def test_valid_mask_drops_all(self, net):
        rng = np.random.default_rng(7)
        table = jnp.asarray(
            rng.normal(size=net.table_size).astype(np.float32)
        )
        b = jnp.asarray(rng.integers(0, 8, size=(2, 4, 4)).astype(np.int8))
        t2 = net.td_update(
            table, b, jnp.asarray([3.0, 3.0], jnp.float32), 0.5,
            valid=jnp.asarray([False, False]),
        )
        np.testing.assert_array_equal(np.asarray(t2), np.asarray(table))

    def test_matches_small_net_semantics(self):
        """The big-net scatter and the small net's reference td_update
        implement the same count-normalised mean — check on the SAME
        geometry by building the small net's 17x4-cell layout here."""
        from gym2048_tpu.models import ntuple

        net = ntuple_big.NTupleNetwork(
            [tuple(t) for t in ntuple.TUPLES.tolist()], n_vals=17
        )
        rng = np.random.default_rng(8)
        boards = jnp.asarray(
            rng.integers(0, 12, size=(16, 4, 4)).astype(np.int8)
        )
        deltas = jnp.asarray(rng.normal(size=16).astype(np.float32))
        valid = jnp.asarray(rng.random(16) > 0.3)
        table = jnp.asarray(
            rng.normal(size=net.table_size).astype(np.float32)
        )
        got = np.asarray(
            net.td_update(table, boards, deltas, 0.2, valid=valid)
        )
        ref = np.asarray(
            ntuple.td_update(table, boards, deltas, 0.2, valid=valid)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestRowPaths:
    """The 128-lane row reformulation of the gather/scatter paths must be
    numerically equivalent to the scalar ops (value: exact — f32 row copy
    + 0/1 one-hot select; update: same summands, fp order may differ)."""

    def _nets(self, **kw):
        a = ntuple_big.make_network("4x6", n_vals=16, **kw)
        b = ntuple_big.make_network(
            "4x6", n_vals=16, value_impl="rows", update_impl="rows", **kw
        )
        return a, b

    def test_value_rows_exact(self):
        a, b = self._nets()
        key = jax.random.PRNGKey(0)
        table = jax.random.normal(key, (a.table_size,))
        boards = jax.random.randint(key, (64, 4, 4), 0, 12, jnp.int8)
        np.testing.assert_array_equal(
            np.asarray(a.value_batch(table, boards)),
            np.asarray(b.value_batch(table, boards)),
        )

    def test_value_rows_exact_staged(self):
        a, b = self._nets(thresholds=(4, 6))
        key = jax.random.PRNGKey(1)
        table = jax.random.normal(key, (a.table_size,))
        boards = jax.random.randint(key, (64, 4, 4), 0, 12, jnp.int8)
        np.testing.assert_array_equal(
            np.asarray(a.value_batch(table, boards)),
            np.asarray(b.value_batch(table, boards)),
        )

    def test_tc_update_rows_matches_scatter(self):
        a, b = self._nets()
        key = jax.random.PRNGKey(2)
        boards = jax.random.randint(key, (32, 4, 4), 0, 12, jnp.int8)
        deltas = jax.random.normal(key, (32,)) * 10.0
        valid = jax.random.bernoulli(key, 0.8, (32,))
        table = jnp.zeros((a.table_size,))
        z = jnp.zeros_like(table)
        ta, ea, aa = a.td_update_tc(table, z, z, boards, deltas, 1.0, valid)
        tb, eb, ab = b.td_update_tc(table, z, z, boards, deltas, 1.0, valid)
        for x, y in ((ta, tb), (ea, eb), (aa, ab)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7
            )

    def test_td_update_rows_matches_scatter(self):
        a, b = self._nets()
        key = jax.random.PRNGKey(3)
        boards = jax.random.randint(key, (32, 4, 4), 0, 12, jnp.int8)
        deltas = jax.random.normal(key, (32,)) * 10.0
        table = jnp.zeros((a.table_size,))
        ta = a.td_update(table, boards, deltas, 0.3)
        tb = b.td_update(table, boards, deltas, 0.3)
        np.testing.assert_allclose(
            np.asarray(ta), np.asarray(tb), rtol=1e-5, atol=1e-7
        )

    def test_trainer_row_chunk_trains(self):
        # end-to-end smoke of the row paths inside a jitted training
        # chunk. (Whole-chunk TRAJECTORY parity vs the scalar paths is
        # not assertable: update summation order differs in fp, and
        # greedy argmax near-ties then flip — the same reason sharded
        # chunks aren't bit-comparable, tests/test_td.py. Numerical
        # equivalence is pinned per-op above.)
        from gym2048_tpu.train import td

        cfg = td.TDConfig(
            total_steps=0, n_envs=32, chunk_steps=16, arch="4x6",
            tc=True, alpha=1.0, alpha_final=1.0, init_value=0.0,
            value_impl="rows", update_impl="rows",
        )
        tr = td.TDTrainer(cfg)
        assert tr._net.value_impl == "rows"
        assert tr._net.update_impl == "rows"
        state = tr.init_state(jax.random.PRNGKey(5))
        state, metrics = tr.train_chunk(state, jnp.float32(1.0))
        table = np.asarray(state["table"])
        assert np.isfinite(table).all() and np.abs(table).sum() > 0
        assert float(metrics["ep_score_mean"]) >= 0.0


class TestStages:
    def test_stage_offsets(self):
        net = ntuple_big.make_network("4x6", n_vals=8, thresholds=(4, 6))
        assert net.table_size == 3 * net.stage_stride
        lo = np.zeros((4, 4), np.int8)
        lo[0, 0] = 3  # below first threshold -> stage 0
        mid = lo.copy()
        mid[0, 0] = 5  # stage 1
        hi = lo.copy()
        hi[0, 0] = 7  # stage 2
        boards = jnp.asarray(np.stack([lo, mid, hi]))
        idx = np.asarray(net.indices_batch(boards))
        assert idx[0].max() < net.stage_stride
        assert net.stage_stride <= idx[1].min()
        assert idx[1].max() < 2 * net.stage_stride
        assert 2 * net.stage_stride <= idx[2].min()

    def test_staged_value_uses_own_table(self):
        net = ntuple_big.make_network("4x6", n_vals=8, thresholds=(5,))
        table = jnp.concatenate(
            [
                jnp.zeros(net.stage_stride, jnp.float32),
                jnp.ones(net.stage_stride, jnp.float32),
            ]
        )
        lo = jnp.zeros((1, 4, 4), jnp.int8)
        hi = lo.at[0, 0, 0].set(6)
        assert float(net.value_batch(table, lo)[0]) == 0.0
        # stage-1 board: 32 entries of 1.0, mean over 8 syms = 4 tuples
        assert float(net.value_batch(table, hi)[0]) == pytest.approx(4.0)


class TestTrainerIntegration:
    def test_td_trainer_big_arch_learns_shape(self):
        from gym2048_tpu.train import td

        cfg = td.TDConfig(
            total_steps=1024, n_envs=32, chunk_steps=16, arch="4x6",
            n_vals=8, tc=True, alpha=1.0, alpha_final=1.0, init_value=0.0,
        )
        tr = td.TDTrainer(cfg)
        state = tr.init_state()
        assert state["table"].shape == (4 * 8**6,)
        state, hist = tr.learn(state, log_fn=None)
        t = np.asarray(state["table"])
        assert np.isfinite(t).all()
        assert (t != 0).sum() > 0  # learning actually wrote the table
        ev = td.play_greedy(state["table"], 4, net=tr._net, move_cap=200)
        assert ev["Average score"] >= 0

    def test_td_trainer_big_arch_plain_td(self):
        from gym2048_tpu.train import td

        cfg = td.TDConfig(
            total_steps=512, n_envs=32, chunk_steps=16, arch="4x6",
            n_vals=8, tc=False, alpha=0.1, alpha_final=0.1,
        )
        tr = td.TDTrainer(cfg)
        state, _ = tr.learn(tr.init_state(), log_fn=None)
        assert np.isfinite(np.asarray(state["table"])).all()

    def test_shard_td_state_big(self):
        from gym2048_tpu.parallel import make_mesh
        from gym2048_tpu.train import td

        cfg = td.TDConfig(
            total_steps=512, n_envs=64, chunk_steps=8, arch="4x6",
            n_vals=8, tc=True, alpha=1.0, alpha_final=1.0,
        )
        tr = td.TDTrainer(cfg)
        state = td.shard_td_state(tr.init_state(), make_mesh())
        state, m = tr.train_chunk(state, jnp.float32(1.0))
        assert np.isfinite(float(m["ep_score_mean"]))


class TestTCAccumulate:
    """tc_accumulate: the scatter half of delayed TC learning
    (arXiv:1604.05085) — accumulation must be exactly additive and its
    deferred combine equivalent to one TC update of the concatenated
    steps."""

    def test_additivity_matches_single_scatter(self):
        net = ntuple_big.make_network("4x6", n_vals=4)
        rng = np.random.default_rng(3)
        b1 = jnp.asarray(rng.integers(0, 4, (8, 4, 4)), jnp.int8)
        b2 = jnp.asarray(rng.integers(0, 4, (8, 4, 4)), jnp.int8)
        d1 = jnp.asarray(rng.normal(size=8).astype(np.float32))
        d2 = jnp.asarray(rng.normal(size=8).astype(np.float32))
        zeros = tuple(
            jnp.zeros(net.table_size, jnp.float32) for _ in range(3)
        )
        p = net.tc_accumulate(zeros, b1, d1)
        p = net.tc_accumulate(p, b2, d2)
        w_all = (8.0 / net.n_features) * jnp.concatenate([d1, d2])
        oracle = net._scatter3(jnp.concatenate([b1, b2]), w_all, None)
        for got, want in zip(p, oracle):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
            )

    def test_deferred_combine_equals_concatenated_update(self):
        from gym2048_tpu.models.ntuple import _tc_combine

        net = ntuple_big.make_network("4x6", n_vals=4)
        rng = np.random.default_rng(4)
        b1 = jnp.asarray(rng.integers(0, 4, (6, 4, 4)), jnp.int8)
        b2 = jnp.asarray(rng.integers(0, 4, (6, 4, 4)), jnp.int8)
        d1 = jnp.asarray(rng.normal(size=6).astype(np.float32))
        d2 = jnp.asarray(rng.normal(size=6).astype(np.float32))
        v1 = jnp.asarray(rng.integers(0, 2, 6).astype(bool))
        v2 = jnp.asarray(rng.integers(0, 2, 6).astype(bool))
        table = jnp.asarray(
            rng.normal(size=net.table_size).astype(np.float32)
        )
        e0 = jnp.zeros_like(table)
        a0 = jnp.zeros_like(table)

        zeros = tuple(jnp.zeros_like(table) for _ in range(3))
        p = net.tc_accumulate(zeros, b1, d1, valid=v1)
        p = net.tc_accumulate(p, b2, d2, valid=v2)
        got = _tc_combine(table, e0, a0, *p, 0.5)
        want = net.td_update_tc(
            table, e0, a0, jnp.concatenate([b1, b2]),
            jnp.concatenate([d1, d2]), 0.5,
            valid=jnp.concatenate([v1, v2]),
        )
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6
            )
