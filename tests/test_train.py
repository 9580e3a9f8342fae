"""BC trainer, eval harness, checkpoint and metrics tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gym2048_tpu.models import ActorCritic, Game2048Model
from gym2048_tpu.train import (
    BCConfig,
    BCTrainer,
    evaluate_batched,
    evaluate_model,
    make_predict_fn,
    report_evaluation_results,
)
from gym2048_tpu.utils.checkpoint import (
    Checkpointer,
    load_model,
    save_model,
)
from gym2048_tpu.utils.metrics import MetricsLogger


def synthetic_dataset(n=512, seed=0):
    """Boards labelled by a simple deterministic rule (fully learnable)."""
    rng = np.random.default_rng(seed)
    boards = rng.integers(0, 8, size=(n, 4, 4)).astype(np.int8)
    labels = boards.reshape(n, 16).argmax(axis=1) % 4
    return boards, labels


class TestBCTrainer:
    def test_learns_synthetic_rule(self):
        boards, labels = synthetic_dataset(512)
        trainer = BCTrainer(
            Game2048Model(filters=16, residual_blocks=1),
            BCConfig(epochs=6, batch_size=64, lr=3e-3),
        )
        variables = trainer.init_variables(jax.random.PRNGKey(0))
        variables, history = trainer.fit(
            variables, boards, labels, verbose=False
        )
        assert history[-1]["accuracy"] > 0.6  # way above 0.25 chance
        assert history[-1]["loss"] < history[0]["loss"]
        val = trainer.evaluate(variables, boards, labels)
        assert val["accuracy"] > 0.6

    def test_partial_last_batch_handled(self):
        boards, labels = synthetic_dataset(130)  # 130 % 64 != 0
        trainer = BCTrainer(
            Game2048Model(filters=8, residual_blocks=1),
            BCConfig(epochs=1, batch_size=64),
        )
        variables = trainer.init_variables(jax.random.PRNGKey(0))
        _, history = trainer.fit(variables, boards, labels, verbose=False)
        assert np.isfinite(history[0]["loss"])

    def test_bc_on_actor_critic(self):
        boards, labels = synthetic_dataset(256)
        trainer = BCTrainer(
            ActorCritic(filters=8, residual_blocks=1),
            BCConfig(epochs=3, batch_size=64, lr=3e-3),
        )
        variables = trainer.init_variables(jax.random.PRNGKey(0))
        variables, history = trainer.fit(
            variables, boards, labels, verbose=False
        )
        assert history[-1]["accuracy"] > history[0]["accuracy"] - 0.05
        val = trainer.evaluate(variables, boards, labels)
        assert 0 <= val["accuracy"] <= 1


class TestEval:
    def _tiny_model(self):
        model = Game2048Model(filters=8, residual_blocks=1)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, 4, 16), jnp.float32),
        )
        return model, variables

    def test_evaluate_model_protocol(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        model, variables = self._tiny_model()
        predict = make_predict_fn(model, variables)
        results = evaluate_model(predict, episodes=2, epsilon=0.1,
                                 verbose=False)
        assert set(results) == {
            "Average score", "Max score", "Highest tile", "Episodes"}
        assert len(results["Episodes"]) == 2
        # deterministic under the fixed protocol seeds
        results2 = evaluate_model(predict, episodes=2, epsilon=0.1,
                                  verbose=False)
        assert results == results2
        report_evaluation_results(results, "test")
        lines = open("scores_test.csv").read().splitlines()
        assert lines[0] == "total_reward,highest,moves,illegal_moves"
        assert len(lines) == 3

    def test_evaluate_batched(self):
        model, variables = self._tiny_model()
        results = evaluate_batched(
            model, variables, episodes=16, epsilon=0.1,
            key=jax.random.PRNGKey(1), move_cap=50,
        )
        assert len(results["Episodes"]) == 16
        assert results["Highest tile"] >= 4
        assert all(e["moves"] <= 51 for e in results["Episodes"])

    def test_evaluators_agree_statistically(self):
        """The documented host/batched evaluator relationship
        (train/eval.py): same protocol, different RNG streams — summary
        statistics agree to sampling error on the same checkpoint. Uses an
        untrained policy (episodes are short, so the host path is cheap)
        and generous batched N to pin the population mean."""
        model, variables = self._tiny_model()
        predict = make_predict_fn(model, variables)
        host = evaluate_model(predict, episodes=24, epsilon=0.1,
                              verbose=False)
        batched = evaluate_batched(
            model, variables, episodes=512, epsilon=0.1,
            key=jax.random.PRNGKey(3),
        )
        h = np.array([e["total_reward"] for e in host["Episodes"]])
        b = np.array([e["total_reward"] for e in batched["Episodes"]])
        sem = (h.std(ddof=1) / np.sqrt(len(h))
               + b.std(ddof=1) / np.sqrt(len(b)))
        assert abs(h.mean() - b.mean()) < 4.0 * sem, (
            h.mean(), b.mean(), sem
        )


class TestCheckpoint:
    def test_roundtrip_and_resume(self, tmp_path):
        from gym2048_tpu.train import PPO, PPOConfig

        cfg = PPOConfig(
            total_timesteps=256, n_envs=16, n_steps=8, batch_size=32,
            n_epochs=1, filters=8, residual_blocks=1,
        )
        ppo = PPO(cfg)
        state = ppo.init_state(jax.random.PRNGKey(0))
        state, _ = ppo.train_iteration(state)

        ckpt = Checkpointer(tmp_path / "ckpts", keep=2)
        ckpt.save(int(state.update_idx), state)
        assert ckpt.latest_step() == 1

        fresh = ppo.init_state(jax.random.PRNGKey(0))
        restored = ckpt.restore(like=fresh)
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resumed state trains
        restored = jax.tree.map(jnp.asarray, restored)
        restored, metrics = ppo.train_iteration(restored)
        assert int(restored.update_idx) == 2

    def test_prune(self, tmp_path):
        ckpt = Checkpointer(tmp_path / "c", keep=2)
        for step in (1, 2, 3, 4):
            ckpt.save(step, {"x": np.ones(3)})
        assert ckpt.all_steps() == [3, 4]

    def test_save_load_model(self, tmp_path):
        variables = {"params": {"w": np.arange(4.0)}}
        save_model(tmp_path / "m.pkl", variables, {"filters": 8})
        loaded, meta = load_model(tmp_path / "m.pkl")
        np.testing.assert_array_equal(loaded["params"]["w"], np.arange(4.0))
        assert meta == {"filters": 8}

    def test_bf16_artifact_roundtrip_and_split(self, tmp_path):
        # the durable big-table artifact format: values round-trip to
        # exactly their bf16 rounding, and large arrays split into parts
        import ml_dtypes

        from gym2048_tpu.utils.checkpoint import (
            load_array_bf16,
            save_array_bf16,
        )

        rng = np.random.default_rng(0)
        arr = rng.normal(size=(1 << 16,)).astype(np.float32) * 1e4
        paths = save_array_bf16(
            tmp_path / "tbl", arr, meta={"steps": 7}, part_bytes=1 << 15
        )
        assert len(paths) > 2  # header + >=2 parts at this part size
        back, meta = load_array_bf16(tmp_path / "tbl")
        assert meta == {"steps": 7}
        expect = arr.astype(ml_dtypes.bfloat16).astype(np.float32)
        np.testing.assert_array_equal(back, expect)
        rel = np.abs(back - arr) / np.maximum(np.abs(arr), 1e-9)
        assert rel.max() < 0.004  # bf16 has ~2^-8 relative precision

    def test_bf16_artifact_stage_delta(self, tmp_path):
        # staged tables: stage-delta XOR coding must round-trip exactly
        # and compress near-identical stages far better than plain bf16
        import ml_dtypes

        from gym2048_tpu.utils.checkpoint import (
            load_array_bf16,
            save_array_bf16,
        )

        rng = np.random.default_rng(1)
        stage0 = rng.normal(size=(1 << 15,)).astype(np.float32) * 1e3
        stages = np.tile(stage0, 4)
        stages[1 << 15: (1 << 15) + 100] += 5.0  # small stage-1 divergence
        save_array_bf16(tmp_path / "plain", stages)
        save_array_bf16(tmp_path / "delta", stages, delta_stages=4)
        back, _ = load_array_bf16(tmp_path / "delta")
        expect = stages.astype(ml_dtypes.bfloat16).astype(np.float32)
        np.testing.assert_array_equal(back, expect)
        plain = sum(
            p.stat().st_size for p in tmp_path.glob("plain.p*")
        )
        delta = sum(
            p.stat().st_size for p in tmp_path.glob("delta.p*")
        )
        assert delta < plain / 2  # tiled stages compress away


class TestMetrics:
    def test_jsonl_logging(self, tmp_path):
        with MetricsLogger(tmp_path, "r1", tensorboard=False) as logger:
            logger.log(1, {"loss": 0.5})
            logger.log(2, {"loss": 0.25, "acc": 0.9})
        lines = [
            json.loads(line)
            for line in open(tmp_path / "r1.jsonl").read().splitlines()
        ]
        assert lines[0]["loss"] == 0.5 and lines[1]["acc"] == 0.9

    def test_tensorboard_optional(self, tmp_path):
        logger = MetricsLogger(tmp_path, "r2", tensorboard=True)
        logger.log(1, {"x": 1.0})
        logger.close()
        assert (tmp_path / "r2.jsonl").exists()
