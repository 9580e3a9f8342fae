"""Gymnasium VectorEnv facade tests."""

import numpy as np
import pytest

import gymnasium as gym

from gym2048_tpu.env import EnvConfig
from gym2048_tpu.env.vector import BatchedVectorEnv


class TestVectorEnv:
    def test_gym_vector_contract(self):
        env = BatchedVectorEnv(num_envs=8)
        assert isinstance(env, gym.vector.VectorEnv)
        obs, info = env.reset(seed=3)
        assert obs.shape == (8, 16, 4, 4)
        assert env.action_space.shape == (8,)
        obs, r, term, trunc, infos = env.step(np.zeros(8, dtype=np.int64))
        assert obs.shape == (8, 16, 4, 4)
        assert r.shape == (8,) and term.shape == (8,)
        assert not trunc.any()
        assert {"illegal_move", "highest", "score"} <= set(infos)
        env.close()

    def test_auto_reset_keeps_rolling(self):
        env = BatchedVectorEnv(
            num_envs=32, config=EnvConfig(illegal_move_reward=-1.0)
        )
        obs, _ = env.reset(seed=0)
        terms = 0
        rng = np.random.default_rng(0)
        for i in range(200):
            obs, r, term, trunc, infos = env.step(rng.integers(0, 4, 32))
            terms += term.sum()
        assert terms > 0  # random play triggers illegal-move terminations
        # boards remain valid one-hot observations throughout
        assert obs.max() == 1 and obs.min() == 0
        assert (obs.sum(axis=1) <= 1).all()

    def test_render(self):
        env = BatchedVectorEnv(num_envs=2)
        env.reset(seed=1)
        assert env.render().shape == (280, 280, 3)
