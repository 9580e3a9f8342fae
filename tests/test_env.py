"""Batched env + Gymnasium adapter tests, including bit-exact parity.

Parity fixtures in tests/fixtures/reference_trajectories.json were recorded
from the actual reference env (see generate_fixtures.py); the adapter must
reproduce every board, reward, termination flag and spawn bit-exactly under
the same seeds.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gymnasium as gym

import gym2048_tpu.env  # noqa: F401 — registers the gym ids
from gym2048_tpu.core import rules
from gym2048_tpu.env import EnvConfig, adapter, batched, parity
from gym2048_tpu.ops import obs as obs_ops

FIXTURES = json.loads(
    (Path(__file__).parent / "fixtures" / "reference_trajectories.json").read_text()
)


class TestAdapterParity:
    @pytest.mark.parametrize("idx", range(len(FIXTURES["trajectories"])))
    def test_trajectory_bit_exact(self, idx):
        traj = FIXTURES["trajectories"][idx]
        env = adapter.Game2048Env()
        if "illegal_move_reward" in traj:
            env.set_illegal_move_reward(traj["illegal_move_reward"])
        env.reset(seed=traj["seed"])
        np.testing.assert_array_equal(env.get_board(), np.asarray(traj["board0"]))
        for i, step in enumerate(traj["steps"]):
            obs, reward, terminated, truncated, info = env.step(step["action"])
            assert reward == step["reward"], (idx, i)
            assert terminated == step["terminated"], (idx, i)
            assert info["illegal_move"] == step["illegal"], (idx, i)
            assert int(info["highest"]) == step["highest"], (idx, i)
            assert float(env.score) == step["score"], (idx, i)
            np.testing.assert_array_equal(
                env.get_board(), np.asarray(step["board"]), err_msg=f"{idx},{i}"
            )


def _values_to_exp(values) -> np.ndarray:
    v = np.asarray(values, np.float64)
    out = np.zeros_like(v, np.int8)
    nz = v > 0
    out[nz] = np.round(np.log2(v[nz])).astype(np.int8)
    return out


class TestBatchedParityReplay:
    """The 13 recorded reference trajectories replayed through the JITTED
    BATCHED env (not the host adapter): spawn decisions come from the
    reference's own PCG64 stream via env.parity + rules.spawn_ranked, all
    boards advance in one lax.scan, every field is bit-exact per step.
    (game2048_env.py:76-111, 166-176; SURVEY §7 step 2 parity RNG mode.)"""

    @pytest.mark.parametrize(
        "imr", sorted({t.get("illegal_move_reward", 0.0) or 0.0
                       for t in FIXTURES["trajectories"]})
    )
    def test_trajectories_bit_exact_batched(self, imr):
        trajs = [
            t for t in FIXTURES["trajectories"]
            if (t.get("illegal_move_reward", 0.0) or 0.0) == imr
        ]
        assert trajs
        B = len(trajs)
        T = max(len(t["steps"]) for t in trajs)
        streams = [parity.ReferenceSpawnStream(t["seed"]) for t in trajs]

        vals0, ranks0 = parity.reset_draws(streams)
        state = batched.reset_parity(jnp.asarray(vals0), jnp.asarray(ranks0))
        for b, t in enumerate(trajs):
            np.testing.assert_array_equal(
                np.asarray(state.board[b]), _values_to_exp(t["board0"]),
                err_msg=f"reset {b}",
            )

        # host-precomputed decision arrays; an ILLEGAL step consumes no
        # draw (the reference raises IllegalMove before add_tile), and
        # padding past a trajectory's end gets dummy draws (never asserted)
        actions = np.zeros((T, B), np.int32)
        vals = np.ones((T, B), np.int8)
        ranks = np.tile(np.arange(16, dtype=np.int32), (T, B, 1))
        for b, t in enumerate(trajs):
            for i, st in enumerate(t["steps"]):
                actions[i, b] = st["action"]
                if not st["illegal"]:
                    vals[i, b], ranks[i, b] = streams[b].draw()

        cfg = EnvConfig(illegal_move_reward=imr, auto_reset=False)

        @jax.jit
        def replay(state, actions, vals, ranks):
            def body(state, x):
                a, v, rk = x
                state, ts = batched.step_parity(state, a, v, rk, cfg)
                return state, (
                    ts.board, ts.reward, ts.terminated, ts.illegal,
                    ts.highest, ts.score,
                )

            return jax.lax.scan(body, state, (actions, vals, ranks))

        _, (boards, rewards, terms, illegals, highs, scores) = jax.tree.map(
            np.asarray,
            replay(
                state, jnp.asarray(actions), jnp.asarray(vals),
                jnp.asarray(ranks),
            ),
        )

        for b, t in enumerate(trajs):
            for i, st in enumerate(t["steps"]):
                where = f"traj seed {t['seed']} step {i}"
                np.testing.assert_array_equal(
                    boards[i, b], _values_to_exp(st["board"]), err_msg=where
                )
                assert rewards[i, b] == st["reward"], where
                assert bool(terms[i, b]) == st["terminated"], where
                assert bool(illegals[i, b]) == st["illegal"], where
                assert int(highs[i, b]) == st["highest"], where
                assert float(scores[i, b]) == st["score"], where


class TestAdapterGymContract:
    def test_make_and_spaces(self):
        env = gym.make("Tpu2048-v0").unwrapped
        assert env.action_space.n == 4
        assert env.observation_space.shape == (16, 4, 4)
        env2 = gym.make("2048-v0").unwrapped
        assert isinstance(env2, adapter.Game2048Env)

    def test_step_returns_correct_shapes(self):
        env = adapter.Game2048Env()
        env.reset(seed=0)
        obs, reward, terminated, truncated, info = env.step(0)
        assert obs.shape == (16, 4, 4)
        assert isinstance(reward, float)
        assert isinstance(terminated, bool)
        assert truncated is False
        assert "illegal_move" in info and "highest" in info

    def test_observation_one_hot(self):
        env = adapter.Game2048Env()
        env.reset(seed=0)
        env.set_board(np.array(
            [[2, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 4, 0]]))
        obs, *_ = env.step(1)
        assert obs.sum(axis=0).max() <= 1
        assert set(np.unique(obs).tolist()) <= {0, 1}

    def test_illegal_move_reward_and_termination(self):
        env = adapter.Game2048Env()
        env.set_illegal_move_reward(-1.0)
        env.reset(seed=0)
        dead_board = np.array(
            [[2, 4, 8, 16], [4, 8, 16, 2], [8, 16, 2, 4], [16, 2, 4, 8]])
        env.set_board(dead_board)
        obs, reward, terminated, truncated, info = env.step(0)
        assert reward == -1.0 and terminated and info["illegal_move"]
        np.testing.assert_array_equal(env.get_board(), dead_board)  # no spawn

    def test_max_tile_win(self):
        env = adapter.Game2048Env()
        env.set_max_tile(2048)
        env.set_board(np.zeros((4, 4), int))
        env.set(0, 0, 2048)
        assert env.isend()
        env.set(0, 0, 1024)
        assert not env.isend()

    def test_score_accumulates(self):
        env = adapter.Game2048Env()
        env.reset(seed=0)
        env.set_board(np.array(
            [[0, 0, 0, 0], [0, 0, 0, 0], [2, 0, 0, 0], [2, 0, 0, 0]]))
        env.step(0)
        env.set_board(np.array(
            [[0, 0, 0, 0], [0, 0, 0, 0], [4, 0, 0, 0], [4, 0, 0, 0]]))
        env.step(0)
        assert env.score == 12.0

    def test_render_ansi_and_rgb(self):
        env = adapter.Game2048Env()
        env.reset(seed=0)
        out = env.render(mode="ansi")
        assert "Score:" in out.getvalue()
        frame = env.render(mode="rgb_array")
        assert frame.shape == (280, 280, 3) and frame.dtype == np.uint8
        # Large tiles must not crash (reference KeyErrors above 4096)
        env.set_board(np.full((4, 4), 8192))
        assert env.render(mode="rgb_array").shape == (280, 280, 3)


class TestBatchedEnv:
    def test_reset_spawns_two_tiles(self):
        state = batched.reset(jax.random.PRNGKey(0), 64)
        nonzero = np.count_nonzero(np.asarray(state.board).reshape(64, 16), axis=1)
        assert (nonzero == 2).all()
        assert np.asarray(state.score).sum() == 0

    def test_step_semantics_match_adapter_oracle(self):
        """Batched step == adapter step on the same boards/actions (modulo
        spawn position, which is random): merge result, reward, legality."""
        rng = np.random.default_rng(3)
        B = 256
        exps = rng.integers(0, 8, size=(B, 4, 4))
        exps = np.where(rng.random((B, 4, 4)) < 0.4, 0, exps).astype(np.int8)
        state = batched.reset(jax.random.PRNGKey(0), B)
        state = state.replace(board=jnp.asarray(exps))
        actions = jnp.asarray(rng.integers(0, 4, size=B), jnp.int32)
        cfg = EnvConfig(illegal_move_reward=-1.0, auto_reset=False)
        new_state, ts = batched.step(state, actions, cfg)

        env = adapter.Game2048Env()
        env.set_illegal_move_reward(-1.0)
        env.reset(seed=0)
        values = np.where(exps > 0, 1 << exps.astype(np.int64), 0)
        for i in range(B):
            env.set_board(values[i].copy())
            env.score = 0.0
            _, reward, terminated, _, info = env.step(int(actions[i]))
            assert float(ts.reward[i]) == reward, i
            assert bool(ts.illegal[i]) == info["illegal_move"], i
            if info["illegal_move"]:
                # no spawn: boards must match exactly
                np.testing.assert_array_equal(
                    np.asarray(rules.exp_to_value(new_state.board[i])), env.get_board()
                )
                assert bool(ts.terminated[i])
            else:
                # boards differ only in the spawned tile (position random):
                # removing the spawn from ours must equal the adapter's
                # pre-spawn board... compare merged boards cell-multiset.
                ours = np.asarray(rules.exp_to_value(new_state.board[i]))
                theirs = env.get_board()
                diff = (ours != theirs)
                # both contain exactly one spawned 2/4 on top of the same
                # merged board: multisets of cells agree except <=2 cells
                assert diff.sum() <= 2, i

    def test_illegal_terminates_and_no_spawn(self):
        dead = np.array([[1, 2, 3, 4], [2, 3, 4, 5], [3, 4, 5, 6], [4, 5, 6, 7]])
        state = batched.reset(jax.random.PRNGKey(0), 4)
        state = state.replace(board=jnp.asarray(np.stack([dead] * 4), jnp.int8))
        cfg = EnvConfig(illegal_move_reward=-2.5, auto_reset=False)
        new_state, ts = batched.step(state, jnp.arange(4, dtype=jnp.int32), cfg)
        assert np.asarray(ts.terminated).all()
        assert np.asarray(ts.illegal).all()
        assert (np.asarray(ts.reward) == -2.5).all()
        np.testing.assert_array_equal(
            np.asarray(new_state.board), np.asarray(state.board)
        )

    def test_auto_reset_replaces_terminated(self):
        dead = np.array([[1, 2, 3, 4], [2, 3, 4, 5], [3, 4, 5, 6], [4, 5, 6, 7]])
        state = batched.reset(jax.random.PRNGKey(0), 8)
        state = state.replace(
            board=jnp.asarray(np.stack([dead] * 8), jnp.int8),
            score=jnp.full(8, 100.0, jnp.float32),
        )
        new_state, ts = batched.step(
            state, jnp.zeros(8, jnp.int32), EnvConfig(auto_reset=True)
        )
        assert np.asarray(ts.terminated).all()
        boards = np.asarray(new_state.board).reshape(8, 16)
        assert (np.count_nonzero(boards, axis=1) == 2).all()  # fresh boards
        assert (np.asarray(new_state.score) == 0).all()
        assert (np.asarray(new_state.step_count) == 0).all()

    def test_win_on_max_tile(self):
        board = np.zeros((1, 4, 4), np.int8)
        board[0, 0, 0] = 10  # 1024
        board[0, 0, 1] = 10  # 1024 -> merge to 2048 = win
        state = batched.reset(jax.random.PRNGKey(0), 1)
        state = state.replace(board=jnp.asarray(board))
        cfg = EnvConfig(max_tile=2048, auto_reset=False)
        new_state, ts = batched.step(state, jnp.asarray([3], jnp.int32), cfg)
        assert bool(ts.terminated[0]) and not bool(ts.illegal[0])
        assert int(ts.highest[0]) == 2048
        assert float(ts.reward[0]) == 2048.0

    def test_highest_and_score_reported(self):
        state = batched.reset(jax.random.PRNGKey(1), 32)
        _, _, changed = jax.vmap(rules.move_all)(state.board)
        acts = jnp.argmax(changed, axis=1).astype(jnp.int32)
        new_state, ts = batched.step(state, acts)
        assert (np.asarray(ts.highest) >= 2).all()
        # score equals reward on the first step
        np.testing.assert_allclose(np.asarray(ts.score), np.asarray(ts.reward))

    def test_rollout_distribution_sane(self):
        """Long auto-reset rollout: episodes end, scores stay plausible."""
        B = 512
        state = batched.reset(jax.random.PRNGKey(2), B)
        cfg = EnvConfig(auto_reset=True)

        def body(state, _):
            key = jax.random.fold_in(state.key, 17)
            mask = batched.legal_actions(state)
            logits = jnp.where(mask, 0.0, -1e9)
            act = jax.random.categorical(key, logits, axis=-1)
            state, ts = batched.step(state, act, cfg)
            return state, (ts.terminated, ts.reward)

        state, (dones, rewards) = jax.lax.scan(body, state, None, length=500)
        done_frac = np.asarray(dones).mean()
        assert 0.001 < done_frac < 0.05  # episodes last ~100-300 steps
        assert np.asarray(rewards).mean() > 0


class TestObsEncoders:
    def test_env_stack_matches_adapter(self):
        rng = np.random.default_rng(0)
        exps = rng.integers(0, 12, size=(50, 4, 4)).astype(np.int8)
        exps = np.where(rng.random((50, 4, 4)) < 0.4, 0, exps).astype(np.int8)
        values = np.where(exps > 0, 1 << exps.astype(np.int64), 0)
        ours = np.asarray(obs_ops.env_stack(jnp.asarray(exps)))
        for i in range(50):
            np.testing.assert_array_equal(ours[i], adapter.stack_np(values[i]))

    def test_dataset_stack_channels(self):
        # dataset stack: channels 2^1..2^16, no empty channel
        exps = jnp.asarray([[[0, 1, 2, 16]] + [[0] * 4] * 3], jnp.int8)
        s = np.asarray(obs_ops.dataset_stack(exps))
        assert s.shape == (1, 4, 4, 16)
        assert s[0, 0, 0].sum() == 0          # empty -> all zero
        assert s[0, 0, 1, 0] == 1             # tile 2 -> channel 0
        assert s[0, 0, 2, 1] == 1             # tile 4 -> channel 1
        assert s[0, 0, 3, 15] == 1            # tile 65536 -> channel 15

    def test_unstack_roundtrip(self):
        rng = np.random.default_rng(1)
        exps = rng.integers(0, 16, size=(20, 4, 4)).astype(np.int8)
        stacked = obs_ops.env_stack(jnp.asarray(exps))
        back = np.asarray(obs_ops.unstack_env(stacked))
        np.testing.assert_array_equal(back, exps)

    def test_dataset_to_env(self):
        exps = jnp.asarray(np.random.default_rng(2).integers(0, 15, (8, 4, 4)),
                           jnp.int8)
        ds = obs_ops.dataset_stack(exps)
        env_view = np.asarray(obs_ops.dataset_to_env(ds))
        np.testing.assert_array_equal(
            env_view, np.asarray(obs_ops.env_stack(exps))
        )
