"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym2048_tpu.env import batched
from gym2048_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_env_state,
    shard_train_state,
)
from gym2048_tpu.train import PPO, PPOConfig


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(jax.devices()[:8])


class TestMesh:
    def test_mesh_shape(self, mesh):
        assert mesh.shape == {"data": 8, "model": 1}

    def test_env_state_sharded_step(self, mesh):
        state = batched.reset(jax.random.PRNGKey(0), 64)
        state = shard_env_state(state, mesh)
        shardings = state.board.sharding
        assert shardings.spec == jax.sharding.PartitionSpec("data")
        actions = jax.device_put(
            jnp.zeros(64, jnp.int32), shard_batch(mesh)
        )
        new_state, ts = batched.step(state, actions)
        assert new_state.board.shape == (64, 4, 4)
        # stepping a sharded state keeps the batch sharded
        assert len(new_state.board.sharding.device_set) == 8

    def test_sharded_rollout_matches_single_device(self, mesh):
        """The batched env must produce identical trajectories whether the
        batch lives on 1 device or is sharded over 8."""
        state1 = batched.reset(jax.random.PRNGKey(3), 32)
        state8 = shard_env_state(
            batched.reset(jax.random.PRNGKey(3), 32), mesh
        )
        acts = jnp.asarray(
            np.random.default_rng(0).integers(0, 4, size=(20, 32)), jnp.int32
        )

        def run(state, acts):
            def body(s, a):
                s, ts = batched.step(s, a)
                return s, (ts.reward, ts.terminated)
            return jax.lax.scan(body, state, acts)

        s1, (r1, d1) = run(state1, acts)
        s8, (r8, d8) = run(state8, jax.device_put(acts))
        np.testing.assert_array_equal(np.asarray(s1.board), np.asarray(s8.board))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r8))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d8))


class TestShardedPPO:
    def test_train_iteration_dp8(self, mesh):
        cfg = PPOConfig(
            total_timesteps=1024,
            n_envs=64,
            n_steps=8,
            batch_size=64,
            n_epochs=1,
            filters=8,
            residual_blocks=1,
        )
        ppo = PPO(cfg)
        state = shard_train_state(ppo.init_state(jax.random.PRNGKey(0)), mesh)
        state, metrics = ppo.train_iteration(state)
        assert int(state.update_idx) == 1
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated across all 8 devices
        leaf = jax.tree.leaves(state.params)[0]
        assert len(leaf.sharding.device_set) == 8
        assert leaf.sharding.is_fully_replicated

    def test_train_iteration_dp8_sharded_shuffle(self, mesh):
        cfg = PPOConfig(
            total_timesteps=1024,
            n_envs=64,
            n_steps=8,
            batch_size=128,
            n_epochs=2,
            filters=8,
            residual_blocks=1,
            shuffle_mode="sharded",
        )
        ppo = PPO(cfg)
        state = shard_train_state(ppo.init_state(jax.random.PRNGKey(0)), mesh)
        state, metrics = ppo.train_iteration(state)
        assert np.isfinite(float(metrics["loss"]))
        # learning also works single-device with the sharded shuffle
        ppo2 = PPO(cfg)
        s2 = ppo2.init_state(jax.random.PRNGKey(1))
        s2, m2 = ppo2.train_iteration(s2)
        assert np.isfinite(float(m2["loss"]))

    def test_sharded_shuffle_collective_audit(self, mesh):
        """Enforce docs/MULTIHOST.md's communication claim in compiled HLO:
        with shuffle_mode='sharded' the whole train_iteration contains ONLY
        all-reduce collectives (gradient/metric psums over ICI) — no
        all-gather, no all-to-all, no collective-permute, i.e. no tensor
        data ever crosses devices. Guards against regressions like a
        time-major minibatch flatten, which silently makes XLA all-gather
        every minibatch and compute the SGD step fully replicated."""
        import re

        cfg = PPOConfig(
            total_timesteps=1024,
            n_envs=64,
            n_steps=8,
            batch_size=128,
            n_epochs=1,
            filters=8,
            residual_blocks=1,
            shuffle_mode="sharded",
        )
        ppo = PPO(cfg)
        state = shard_train_state(ppo.init_state(jax.random.PRNGKey(0)), mesh)
        txt = PPO.train_iteration.lower(ppo, state).compile().as_text()
        counts = {
            name: len(re.findall(r"\b" + name, txt))
            for name in (
                "all-reduce", "all-gather", "all-to-all",
                "collective-permute", "reduce-scatter",
            )
        }
        assert counts["all-reduce"] > 0, counts  # the gradient psum exists
        assert counts["all-gather"] == 0, counts
        assert counts["all-to-all"] == 0, counts
        assert counts["collective-permute"] == 0, counts

    def test_graft_dryrun(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
