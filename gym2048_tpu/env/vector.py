"""Gymnasium VectorEnv facade over the batched TPU env.

The reference gets its (sequential) vectorisation from SB3's
``make_vec_env`` (ppo_train.py:123); users of the Gymnasium ecosystem
expect a ``gymnasium.vector.VectorEnv``. This wrapper exposes the jitted
lockstep env through that API: ``reset``/``step`` with auto-reset
semantics, numpy in/out, observation space ``(num_envs, 16, 4, 4)``.

Note the TPU-native training paths (PPO/BC) do NOT go through this class —
they keep everything on device (gym2048_tpu.train.ppo). This facade exists
for interop with host-side tooling and third-party algorithms.
"""

from __future__ import annotations

import jax
import numpy as np

import gymnasium as gym
from gymnasium import spaces

from gym2048_tpu.env import batched
from gym2048_tpu.env.batched import EnvConfig
from gym2048_tpu.ops import obs as obs_ops


class BatchedVectorEnv(gym.vector.VectorEnv):
    """``num_envs`` lockstep 2048 envs on the default JAX device."""

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(
        self,
        num_envs: int = 8,
        config: EnvConfig = EnvConfig(),
        seed: int = 0,
    ):
        self.num_envs = num_envs
        self.config = config
        self.single_observation_space = spaces.Box(
            0, 1, (16, 4, 4), dtype=np.int64
        )
        self.single_action_space = spaces.Discrete(4)
        self.observation_space = gym.vector.utils.batch_space(
            self.single_observation_space, num_envs
        )
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, num_envs
        )
        self._seed = seed
        self._state: batched.EnvState | None = None
        # int32 on device, cast to the declared int64 Box dtype on host
        self._obs = jax.jit(lambda b: obs_ops.env_stack(b, dtype=np.int32))
        self._step = jax.jit(
            lambda s, a: batched.step(s, a, config)
        )

    # ------------------------------------------------------------- gym API
    def reset(self, *, seed: int | None = None, options=None):
        if seed is not None:
            self._seed = seed
        self._state = batched.reset(
            jax.random.PRNGKey(self._seed), self.num_envs
        )
        obs = np.asarray(self._obs(self._state.board), dtype=np.int64)
        return obs, {}

    def step(self, actions):
        assert self._state is not None, "call reset() first"
        actions = jax.numpy.asarray(np.asarray(actions), jax.numpy.int32)
        self._state, ts = self._step(self._state, actions)
        # post-auto-reset boards, in the declared observation dtype
        obs = np.asarray(self._obs(ts.board), dtype=np.int64)
        rewards = np.asarray(ts.reward)
        terminated = np.asarray(ts.terminated)
        truncated = np.asarray(ts.truncated)
        infos = {
            "illegal_move": np.asarray(ts.illegal),
            "highest": np.asarray(ts.highest),
            "score": np.asarray(ts.score),
        }
        return obs, rewards, terminated, truncated, infos

    def render(self):
        from gym2048_tpu.core import rules
        from gym2048_tpu.utils.render import render_rgb

        values = np.asarray(rules.exp_to_value(self._state.board[0]))
        return render_rgb(values)

    def close(self, **kwargs):
        self._state = None
