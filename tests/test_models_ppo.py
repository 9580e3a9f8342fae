"""Model forward + PPO trainer tests (CPU, tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from gym2048_tpu.models import ActorCritic, Game2048Model, boards_to_model_input
from gym2048_tpu.train import PPO, PPOConfig

TINY = PPOConfig(
    total_timesteps=512,
    n_envs=16,
    n_steps=8,
    batch_size=32,
    n_epochs=2,
    filters=8,
    residual_blocks=1,
)


class TestModels:
    def test_policy_model_shapes_and_softmax(self):
        model = Game2048Model(filters=8, residual_blocks=1)
        boards = jnp.zeros((4, 4, 4), jnp.int8)
        x = boards_to_model_input(boards)
        assert x.shape == (4, 4, 4, 16)
        variables = model.init(jax.random.PRNGKey(0), x)
        probs = model.apply(variables, x)
        assert probs.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
        logits = model.apply(variables, x, method=model.logits)
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(logits)), np.asarray(probs), rtol=1e-5
        )

    def test_actor_critic_shapes(self):
        model = ActorCritic(filters=8, residual_blocks=1)
        x = boards_to_model_input(jnp.zeros((4, 4, 4), jnp.int8))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits, value = model.apply(variables, x)
        assert logits.shape == (4, 4) and value.shape == (4,)

    def test_batchnorm_train_mutates_stats(self):
        model = ActorCritic(filters=8, residual_blocks=1)
        x = boards_to_model_input(
            jax.random.randint(jax.random.PRNGKey(1), (8, 4, 4), 0, 5)
        )
        variables = model.init(jax.random.PRNGKey(0), x)
        (_, _), mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(b), np.asarray(a))
            for b, a in zip(before, after)
        )


class TestPPOLearningGate:
    """Learning-curve regression gate (BASELINE.md: 'PPO curve matches the
    reference within seed variance'). A reduced-scale reference-semantics
    config (same lr/gamma/clip/adv-norm, smaller model and rollout) must
    reproduce the early learning of docs/curves/ppo_reference_config.jsonl:
    ep-return climbs from ~44 to ~78 by 65k steps (the reference-config
    anchor reaches ~78 at the same step count, ppo_train.py:122-188
    workload). A silent optimizer regression — wrong loss sign, dead
    gradients, broken GAE/advantages — stays flat near the random policy's
    ~45 and fails this gate. Fixed seed; CPU XLA is deterministic."""

    def test_reduced_scale_curve_improves(self):
        cfg = PPOConfig(
            total_timesteps=8 * 128 * 64,  # 8 updates, 65,536 steps
            n_envs=128,
            n_steps=64,
            batch_size=512,
            n_epochs=4,
            filters=16,
            residual_blocks=1,
            seed=7,
        )
        ppo = PPO(cfg)
        state = ppo.init_state()
        rets = []
        for _ in range(cfg.n_updates):
            state, metrics = ppo.train_iteration(state)
            rets.append(float(np.asarray(metrics["ep_return_mean"])))
        first2 = (rets[0] + rets[1]) / 2.0   # calibrated: ~50
        last2 = (rets[-2] + rets[-1]) / 2.0  # calibrated: ~75
        assert first2 < 60.0, rets  # untrained policy sanity anchor
        assert last2 >= 65.0, rets  # absolute floor (anchor ~78 at 65k)
        assert last2 >= 1.25 * first2, rets  # monotone-improvement margin


class TestPPO:
    def test_train_iteration_runs_and_metrics_finite(self):
        ppo = PPO(TINY)
        state = ppo.init_state(jax.random.PRNGKey(0))
        state, metrics = ppo.train_iteration(state)
        assert int(state.update_idx) == 1
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), k
        assert float(metrics["clip_frac"]) <= 1.0
        # a second iteration from the evolved state also works
        state, metrics2 = ppo.train_iteration(state)
        assert int(state.update_idx) == 2

    def test_params_change_and_deterministic(self):
        ppo = PPO(TINY)
        s0 = ppo.init_state(jax.random.PRNGKey(0))
        p_before = jax.tree.map(lambda x: np.asarray(x).copy(), s0.params)
        s1, m1 = ppo.train_iteration(s0)
        changed = any(
            not np.allclose(a, np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(p_before), jax.tree.leaves(s1.params)
            )
        )
        assert changed
        # same seed -> identical metrics
        ppo2 = PPO(TINY)
        s0b = ppo2.init_state(jax.random.PRNGKey(0))
        s1b, m1b = ppo2.train_iteration(s0b)
        for k in m1:
            np.testing.assert_allclose(
                np.asarray(m1[k]), np.asarray(m1b[k]), rtol=1e-6, err_msg=k
            )

    def test_learn_short_run(self):
        logs = []
        ppo = PPO(TINY)
        state = ppo.learn(callback=lambda u, m: logs.append((u, m)),
                          log_interval=1)
        assert int(state.update_idx) == TINY.n_updates
        assert len(logs) == TINY.n_updates
        assert logs[-1][1]["timesteps"] == TINY.n_updates * TINY.rollout_size

    def test_mask_illegal(self):
        cfg = PPOConfig(
            total_timesteps=512, n_envs=32, n_steps=8, batch_size=64,
            n_epochs=1, filters=8, residual_blocks=1, mask_illegal=True,
        )
        ppo = PPO(cfg)
        state = ppo.init_state(jax.random.PRNGKey(0))
        state, metrics = ppo.train_iteration(state)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["entropy"]))
        # with masking, a fresh batch never takes an illegal action, so no
        # terminations occur in the first short rollout (episodes last
        # ~120 steps) — illegal-move endings would show up immediately
        state2, metrics2 = ppo.train_iteration(state)
        assert float(metrics2["n_episodes"]) == 0.0

    def test_bf16_compute(self):
        cfg = PPOConfig(
            total_timesteps=256, n_envs=16, n_steps=4, batch_size=16,
            n_epochs=1, filters=8, residual_blocks=1,
            compute_dtype=jnp.bfloat16,
        )
        ppo = PPO(cfg)
        state = ppo.init_state(jax.random.PRNGKey(0))
        # params stay f32; compute in bf16
        assert jax.tree.leaves(state.params)[0].dtype == jnp.float32
        state, metrics = ppo.train_iteration(state)
        assert np.isfinite(float(metrics["loss"]))

    def test_anneal_lr_compiles(self):
        cfg = PPOConfig(
            total_timesteps=256, n_envs=16, n_steps=4, batch_size=16,
            n_epochs=1, filters=8, residual_blocks=1, anneal_lr=True,
        )
        ppo = PPO(cfg)
        state = ppo.init_state(jax.random.PRNGKey(0))
        state, metrics = ppo.train_iteration(state)
        assert np.isfinite(float(metrics["loss"]))
