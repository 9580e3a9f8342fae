"""Expectimax search agent tests (beyond-reference component).

The reference has no search agent; these tests validate the expectimax
machinery against the rules engine and check it actually plays well.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym2048_tpu.agents import expectimax
from gym2048_tpu.core import rules


class TestSpawnChildren:
    def test_probabilities_sum_to_one(self):
        board = jnp.array(
            [[1, 0, 0, 2], [0, 0, 0, 0], [0, 0, 3, 0], [0, 0, 0, 0]],
            jnp.int8,
        )
        children, probs = expectimax.spawn_children(board)
        assert children.shape == (32, 4, 4)
        np.testing.assert_allclose(float(probs.sum()), 1.0, rtol=1e-6)
        # occupied cells carry zero probability
        flat = np.asarray(board).reshape(16)
        p = np.asarray(probs)
        for i in range(16):
            if flat[i] != 0:
                assert p[i] == 0.0 and p[16 + i] == 0.0

    def test_children_match_spawn_law(self):
        board = jnp.zeros((4, 4), jnp.int8).at[0, 0].set(5)
        children, probs = expectimax.spawn_children(board)
        p = np.asarray(probs)
        # 15 empty cells: 2-spawns at 0.9/15, 4-spawns at 0.1/15
        np.testing.assert_allclose(p[1:16], 0.9 / 15, rtol=1e-5)
        np.testing.assert_allclose(p[17:32], 0.1 / 15, rtol=1e-5)
        c = np.asarray(children)
        assert c[1, 0, 1] == 1  # tile 2 == exponent 1
        assert c[17, 0, 1] == 2  # tile 4 == exponent 2


class TestActionValues:
    def test_illegal_actions_rank_last(self):
        # A board where only some moves are legal.
        board = jnp.array(
            [[1, 2, 3, 4], [2, 3, 4, 5], [3, 4, 5, 6], [4, 5, 6, 7]],
            jnp.int8,
        )
        _, _, legal = rules.move_all(board)
        q = expectimax.action_values(board, depth=1)
        q, legal = np.asarray(q), np.asarray(legal)
        assert (q[~legal] < -1e8).all()
        if legal.any():
            assert (q[legal] > -1e8).all()

    def test_prefers_winning_merge(self):
        # Merging the two 1024 tiles (exponent 10) dominates any heuristic
        # wobble: a horizontal merge (left or right — symmetric here) must
        # beat up/down at any depth.
        board = jnp.array(
            [[10, 10, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 1, 1, 0]],
            jnp.int8,
        )
        for depth in (1, 2):
            q = expectimax.action_values(board, depth)
            assert int(np.asarray(q).argmax()) in (1, 3)  # right or left

    def test_depth_is_static_and_jittable(self):
        board = jnp.zeros((4, 4), jnp.int8).at[0, 0].set(1).at[1, 1].set(1)
        fn = jax.jit(lambda b: expectimax.action_values(b, 2))
        q = fn(board)
        assert q.shape == (4,)
        assert bool(jnp.isfinite(q).any())


class TestAfterstateSearch:
    """make_afterstate_policy: expectimax over afterstate values — the
    consistent amplifier for the TD n-tuple table (docs/PERF.md: the
    state-leaf depth-1 search was WORSE than greedy because the table is
    trained on afterstates)."""

    def _table_value_fn(self, seed=0, scale=100.0):
        import numpy as np

        from gym2048_tpu.models import ntuple

        rng = np.random.default_rng(seed)
        table = jnp.asarray(
            (rng.normal(size=17 * ntuple.TABLE_SIZE) * scale).astype(
                np.float32
            )
        )
        return table, lambda bs: ntuple.value_batch(table, bs)

    def test_depth1_equals_greedy_td_policy(self):
        import numpy as np

        from gym2048_tpu.train import td

        table, value_fn = self._table_value_fn()
        rng = np.random.default_rng(4)
        boards = jnp.asarray(rng.integers(0, 6, size=(64, 4, 4)), jnp.int8)
        policy = expectimax.make_afterstate_policy(value_fn, depth=1)
        a_search = np.asarray(policy(boards))
        a_greedy = np.asarray(td._greedy_batch(value_fn, boards)[0])
        live = np.asarray(
            jax.vmap(lambda b: rules.move_all(b)[2])(boards)
        ).any(-1)
        np.testing.assert_array_equal(a_search[live], a_greedy[live])

    def test_depth2_actions_legal(self):
        import numpy as np

        _, value_fn = self._table_value_fn(1)
        rng = np.random.default_rng(5)
        boards = jnp.asarray(rng.integers(0, 7, size=(32, 4, 4)), jnp.int8)
        policy = jax.jit(expectimax.make_afterstate_policy(value_fn, depth=2))
        a = np.asarray(policy(boards))
        legal = np.asarray(jax.vmap(lambda b: rules.move_all(b)[2])(boards))
        for i in range(32):
            if legal[i].any():
                assert legal[i, a[i]], i

    def test_depth2_backs_up_spawn_expectation(self):
        # hand-checkable 2-ply backup: value table that rewards a specific
        # afterstate reachable only at ply 2 must steer the ply-1 choice
        import numpy as np

        from gym2048_tpu.models import ntuple

        boards = jnp.asarray(
            np.array([[[1, 1, 2, 3], [0, 0, 0, 0], [0, 0, 0, 0],
                       [0, 0, 0, 0]]]), jnp.int8
        )
        # with a zero table the backup is pure reward: both depths must
        # pick a merging move (LEFT or RIGHT merge the two 2-tiles, +4;
        # DOWN earns 0, UP is illegal)
        zero_fn = lambda bs: jnp.zeros(bs.shape[0], jnp.float32)
        p1 = expectimax.make_afterstate_policy(zero_fn, depth=1)
        p2 = expectimax.make_afterstate_policy(zero_fn, depth=2)
        a1, a2 = int(p1(boards)[0]), int(p2(boards)[0])
        assert a1 in (rules.LEFT, rules.RIGHT)
        assert a2 in (rules.LEFT, rules.RIGHT)

    def test_cli_table_mode(self, tmp_path, capsys):
        import json

        import numpy as np

        from gym2048_tpu.models import ntuple
        from gym2048_tpu.utils.checkpoint import save_model

        rng = np.random.default_rng(0)
        path = str(tmp_path / "table.pkl")
        save_model(path, {
            "table": (rng.normal(size=17 * ntuple.TABLE_SIZE) * 100).astype(
                np.float32
            )
        })
        expectimax.main([
            "--episodes", "2", "--depth", "1", "--move-cap", "60",
            "--table", path,
        ])
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["episodes"] == 2
        assert res["Average score"] >= 0.0

    def test_play_policy_with_afterstate_search(self):
        _, value_fn = self._table_value_fn(2)
        res = expectimax.play_policy(
            expectimax.make_afterstate_policy(value_fn, depth=2),
            episodes=4, key=jax.random.PRNGKey(0), move_cap=300,
        )
        assert res["Average score"] >= 0.0
        assert len(res["Episodes"]) == 4


class TestPlay:
    def test_beats_random_play(self):
        # 8 episodes, shallow search, capped length — still must decisively
        # beat a random policy under the same cap.
        res = expectimax.play_batched(
            episodes=8, depth=1, key=jax.random.PRNGKey(0), move_cap=300
        )
        from gym2048_tpu.env import EnvConfig, batched

        cfg = EnvConfig(auto_reset=False)

        @jax.jit
        def random_run(key):
            state = batched.reset(key, 8)
            total = jnp.zeros(8, jnp.float32)
            active = jnp.ones(8, bool)

            def body(c, _):
                state, total, active, key = c
                key, k = jax.random.split(key)
                mask = batched.legal_actions(state)
                act = jax.random.categorical(
                    k, jnp.where(mask, 0.0, -1e9), axis=-1
                )
                state, ts = batched.step(state, act, cfg)
                total += jnp.where(active, ts.reward, 0.0)
                active = active & ~ts.terminated
                return (state, total, active, key), None

            (state, total, active, key), _ = jax.lax.scan(
                body, (state, total, active, jax.random.PRNGKey(1)), None,
                length=300,
            )
            return total

        rand_total = np.asarray(random_run(jax.random.PRNGKey(0)))
        assert res["Average score"] > 2.0 * rand_total.mean()
        assert res["Highest tile"] >= 128

    def test_critic_leaf_composes(self):
        # Search over a learned value leaf: the policy must still only pick
        # legal actions, whatever the (untrained) critic says.
        from gym2048_tpu.models import ActorCritic

        model = ActorCritic(filters=8, residual_blocks=1)
        boards = jnp.array(
            [
                [[1, 2, 1, 2], [2, 1, 2, 1], [1, 2, 1, 2], [2, 1, 2, 0]],
                [[1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 2]],
            ],
            jnp.int8,
        )
        variables = model.init(
            jax.random.PRNGKey(0),
            jax.nn.one_hot(boards.astype(jnp.int32), 16), train=False,
        )
        leaf = expectimax.value_leaf_from_critic(model, variables)
        policy = expectimax.make_policy(depth=1, leaf_value=leaf)
        actions = np.asarray(policy(boards))
        legal = np.asarray(
            jax.vmap(lambda b: rules.move_all(b)[2])(boards)
        )
        for i in range(2):
            assert legal[i, actions[i]]

    def test_cli_smoke(self, capsys):
        expectimax.main(
            ["--episodes", "4", "--depth", "1", "--move-cap", "60"]
        )
        import json

        out = json.loads(capsys.readouterr().out)
        assert out["episodes"] == 4 and "Average score" in out


class TestDepth3AndParams:
    """Depth-3 afterstate search + the parametrised-policy plumbing that
    keeps HBM-scale tables out of the compiled program (HTTP 413 fix)."""

    def _table(self, seed=0, scale=100.0):
        import numpy as np

        from gym2048_tpu.models import ntuple

        rng = np.random.default_rng(seed)
        return jnp.asarray(
            (rng.normal(size=17 * ntuple.TABLE_SIZE) * scale).astype(
                np.float32
            )
        )

    def test_parametrised_matches_closure_policy(self):
        import numpy as np

        from gym2048_tpu.models import ntuple

        table = self._table(3)
        rng = np.random.default_rng(6)
        boards = jnp.asarray(rng.integers(0, 7, size=(16, 4, 4)), jnp.int8)
        for depth in (1, 2):
            closure = expectimax.make_afterstate_policy(
                lambda bs: ntuple.value_batch(table, bs), depth
            )
            param = expectimax.make_afterstate_policy(
                lambda t, bs: ntuple.value_batch(t, bs), depth,
                parametrised=True,
            )
            np.testing.assert_array_equal(
                np.asarray(closure(boards)),
                np.asarray(jax.jit(param)(table, boards)),
            )

    def test_depth3_actions_legal(self):
        import numpy as np

        from gym2048_tpu.models import ntuple

        table = self._table(1)
        policy = jax.jit(
            expectimax.make_afterstate_policy(
                lambda t, bs: ntuple.value_batch(t, bs), depth=3,
                parametrised=True,
            )
        )
        rng = np.random.default_rng(7)
        boards = jnp.asarray(rng.integers(0, 7, size=(4, 4, 4)), jnp.int8)
        a = np.asarray(policy(table, boards))
        legal = np.asarray(jax.vmap(lambda b: rules.move_all(b)[2])(boards))
        for i in range(4):
            if legal[i].any():
                assert legal[i, a[i]], i

    def test_depth3_zero_table_picks_merge(self):
        # pure-reward backup at 3 plies still picks an immediately merging
        # move on the 2-ply fixture of TestAfterstateSearch
        import numpy as np

        boards = jnp.asarray(
            np.array([[[1, 1, 2, 3], [0, 0, 0, 0], [0, 0, 0, 0],
                       [0, 0, 0, 0]]]), jnp.int8
        )
        zero_fn = lambda _t, bs: jnp.zeros(bs.shape[0], jnp.float32)
        p3 = expectimax.make_afterstate_policy(
            zero_fn, depth=3, parametrised=True
        )
        assert int(p3(jnp.zeros(4), boards)[0]) in (rules.LEFT, rules.RIGHT)

    def test_play_policy_params_kwarg(self):
        from gym2048_tpu.models import ntuple

        table = self._table(2)
        res = expectimax.play_policy(
            expectimax.make_afterstate_policy(
                lambda t, bs: ntuple.value_batch(t, bs), depth=2,
                parametrised=True,
            ),
            episodes=4, key=jax.random.PRNGKey(0), move_cap=200,
            params=table,
        )
        assert res["Average score"] >= 0.0
        assert len(res["Episodes"]) == 4

    def test_bignet_depth2_policy(self):
        # HBM-layout table through the parametrised search (the 4x6 table
        # at n_vals=4 stays CPU-test-sized)
        import numpy as np

        from gym2048_tpu.models import ntuple_big

        net = ntuple_big.NTupleNetwork(
            ntuple_big.LAYOUTS["4x6"], n_vals=4
        )
        rng = np.random.default_rng(8)
        table = jnp.asarray(
            rng.normal(size=net.table_size).astype(np.float32) * 50
        )
        policy = jax.jit(
            expectimax.make_afterstate_policy(
                net.value_batch, depth=2, parametrised=True
            )
        )
        boards = jnp.asarray(rng.integers(0, 4, size=(8, 4, 4)), jnp.int8)
        a = np.asarray(policy(table, boards))
        legal = np.asarray(jax.vmap(lambda b: rules.move_all(b)[2])(boards))
        for i in range(8):
            if legal[i].any():
                assert legal[i, a[i]], i

    def test_depth3_beam_legal_and_merge(self):
        import numpy as np

        from gym2048_tpu.models import ntuple

        table = self._table(9)
        policy = jax.jit(
            expectimax.make_afterstate_policy(
                lambda t, bs: ntuple.value_batch(t, bs), depth=3,
                parametrised=True, beam=True,
            )
        )
        rng = np.random.default_rng(10)
        boards = jnp.asarray(rng.integers(0, 7, size=(4, 4, 4)), jnp.int8)
        a = np.asarray(policy(table, boards))
        legal = np.asarray(jax.vmap(lambda b: rules.move_all(b)[2])(boards))
        for i in range(4):
            if legal[i].any():
                assert legal[i, a[i]], i
        # pure-reward backup with beam still picks an immediate merge
        fixture = jnp.asarray(
            np.array([[[1, 1, 2, 3], [0, 0, 0, 0], [0, 0, 0, 0],
                       [0, 0, 0, 0]]]), jnp.int8
        )
        zero_fn = lambda _t, bs: jnp.zeros(bs.shape[0], jnp.float32)
        p3 = expectimax.make_afterstate_policy(
            zero_fn, depth=3, parametrised=True, beam=True
        )
        assert int(p3(jnp.zeros(4), fixture)[0]) in (rules.LEFT, rules.RIGHT)


class TestAdaptivePolicy:
    """make_adaptive_policy: depth 2 everywhere + depth-3 beam on the
    k most constrained live boards (the round-5 search-throughput fix)."""

    def _vf(self):
        from gym2048_tpu.models import ntuple

        rng = np.random.default_rng(11)
        table = jnp.asarray(
            (rng.normal(size=17 * ntuple.TABLE_SIZE) * 100).astype(
                np.float32
            )
        )
        return table, lambda t, bs: ntuple.value_batch(t, bs)

    def test_everyone_deep_matches_depth3_beam(self):
        # k_deep = B and no empties restriction: every live board takes
        # the depth-3 beam path, so actions must equal the plain
        # depth-3 beam policy's
        table, vf = self._vf()
        rng = np.random.default_rng(12)
        boards = jnp.asarray(rng.integers(0, 7, size=(6, 4, 4)), jnp.int8)
        active = jnp.ones(6, bool)
        adaptive = jax.jit(
            expectimax.make_adaptive_policy(vf, 6, deep_empty_max=16)
        )
        plain = jax.jit(
            expectimax.make_afterstate_policy(
                vf, depth=3, parametrised=True, beam=True
            )
        )
        np.testing.assert_array_equal(
            np.asarray(adaptive(table, boards, active)),
            np.asarray(plain(table, boards)),
        )

    def test_no_eligible_matches_depth2(self):
        # deep_empty_max = -1 disqualifies every board: pure depth 2
        table, vf = self._vf()
        rng = np.random.default_rng(13)
        boards = jnp.asarray(rng.integers(0, 7, size=(6, 4, 4)), jnp.int8)
        active = jnp.ones(6, bool)
        adaptive = jax.jit(
            expectimax.make_adaptive_policy(vf, 3, deep_empty_max=-1)
        )
        d2 = jax.jit(
            expectimax.make_afterstate_policy(vf, depth=2, parametrised=True)
        )
        np.testing.assert_array_equal(
            np.asarray(adaptive(table, boards, active)),
            np.asarray(d2(table, boards)),
        )

    def test_deep_set_prefers_fullest_live_boards(self):
        # one nearly-full live board and one open board, k_deep=1: only
        # the full board's row may differ from depth-2; the open board's
        # action must match depth-2 exactly
        table, vf = self._vf()
        full = np.array(
            [[1, 2, 3, 4], [5, 6, 7, 8], [9, 10, 1, 2], [3, 4, 5, 0]]
        )
        open_b = np.zeros((4, 4))
        open_b[0, 0], open_b[0, 1] = 1, 1
        boards = jnp.asarray(np.stack([open_b, full]), jnp.int8)
        active = jnp.ones(2, bool)
        adaptive = expectimax.make_adaptive_policy(vf, 1, deep_empty_max=16)
        d2 = expectimax.make_afterstate_policy(vf, depth=2, parametrised=True)
        a_ad = np.asarray(adaptive(table, boards, active))
        a_d2 = np.asarray(d2(table, boards))
        assert a_ad[0] == a_d2[0]
        # dead boards never take a deep slot: with the full board marked
        # inactive and an empties threshold the open board fails, nothing
        # qualifies and the adaptive policy must match depth-2 everywhere
        tight = expectimax.make_adaptive_policy(vf, 1, deep_empty_max=5)
        active = jnp.asarray([True, False])
        np.testing.assert_array_equal(
            np.asarray(tight(table, boards, active)), a_d2
        )

    def test_play_policy_needs_active(self):
        table, vf = self._vf()
        res = expectimax.play_policy(
            expectimax.make_adaptive_policy(vf, 2, deep_empty_max=10),
            episodes=4, key=jax.random.PRNGKey(0), move_cap=200,
            params=table, needs_active=True,
        )
        assert res["Average score"] >= 0.0
        assert len(res["Episodes"]) == 4

    def test_cli_adaptive(self, tmp_path, capsys):
        import json

        from gym2048_tpu.models import ntuple
        from gym2048_tpu.utils.checkpoint import save_model

        rng = np.random.default_rng(0)
        path = str(tmp_path / "table.pkl")
        save_model(path, {
            "table": (rng.normal(size=17 * ntuple.TABLE_SIZE) * 100).astype(
                np.float32
            )
        })
        expectimax.main([
            "--episodes", "2", "--adaptive", "1", "--move-cap", "40",
            "--table", path, "--chunk-moves", "20",
        ])
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["episodes"] == 2
        assert res["Average score"] >= 0.0

    def test_map_spawn_equivalence(self):
        # the vmapped spawn level (map_spawn=False) must be numerically
        # identical to the lax.map-bounded form — same tree, same math
        table, vf = self._vf()
        rng = np.random.default_rng(14)
        boards = jnp.asarray(rng.integers(0, 7, size=(5, 4, 4)), jnp.int8)
        active = jnp.ones(5, bool)
        a_map = expectimax.make_adaptive_policy(
            vf, 3, deep_empty_max=16, map_spawn=True
        )
        a_vmap = expectimax.make_adaptive_policy(
            vf, 3, deep_empty_max=16, map_spawn=False
        )
        np.testing.assert_array_equal(
            np.asarray(a_map(table, boards, active)),
            np.asarray(a_vmap(table, boards, active)),
        )
        # and against the plain depth-3 beam policy when everyone is deep
        plain = expectimax.make_afterstate_policy(
            vf, depth=3, parametrised=True, beam=True
        )
        full = expectimax.make_adaptive_policy(
            vf, 5, deep_empty_max=16, map_spawn=False
        )
        np.testing.assert_array_equal(
            np.asarray(full(table, boards, active)),
            np.asarray(plain(table, boards)),
        )
