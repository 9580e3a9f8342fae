"""Supervised / behavioural-cloning trainer.

Re-owns the reference's two SL paths in one jitted implementation:

* ``train()`` on the pure policy model (reference train.py:45-82 — Adam +
  cross-entropy over stacked boards, per-epoch loss/accuracy);
* BC pre-training of the PPO policy head (reference pretrain_bc.py:45-87,
  which drives SB3 policy internals with cross-entropy) — here the same
  trainer applied to :class:`ActorCritic` logits, so the result warm-starts
  PPO exactly like ``ppo_train.py --pretrained``.

The whole epoch (shuffle + minibatch SGD) is one jitted scan; data lives on
device as int8 exponent boards and is one-hot encoded per minibatch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gym2048_tpu.models import ActorCritic, Game2048Model, boards_to_model_input


@dataclasses.dataclass(frozen=True)
class BCConfig:
    """Defaults mirror the reference ``train()`` (train.py:45-52)."""

    epochs: int = 3
    batch_size: int = 128
    lr: float = 1e-3
    seed: int = 0


class BCTrainer:
    """Cross-entropy trainer over (board, action) pairs.

    Args:
        model: a :class:`Game2048Model` or :class:`ActorCritic`.
        config: :class:`BCConfig`.
    """

    def __init__(self, model, config: BCConfig = BCConfig()):
        self.model = model
        self.cfg = config
        self.tx = optax.adam(config.lr)
        if isinstance(model, ActorCritic):
            def logits_fn(variables, obs, train):
                (logits, _value), mutated = model.apply(
                    variables, obs, train=train, mutable=["batch_stats"]
                )
                return logits, mutated["batch_stats"]
        else:
            def logits_fn(variables, obs, train):
                logits, mutated = model.apply(
                    variables, obs, train=train,
                    mutable=["batch_stats"], method=model.logits,
                )
                return logits, mutated["batch_stats"]
        self._logits_fn: Callable = logits_fn

    # ------------------------------------------------------------------ init
    def init_variables(self, key: jax.Array) -> dict:
        dummy = boards_to_model_input(jnp.zeros((1, 4, 4), jnp.int8))
        return self.model.init(key, dummy, train=False)

    # ------------------------------------------------------------------ loss
    def _loss(self, params, batch_stats, boards, labels, mask):
        obs = boards_to_model_input(boards)
        logits, new_stats = self._logits_fn(
            {"params": params, "batch_stats": batch_stats}, obs, True
        )
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        denom = jnp.maximum(mask.sum(), 1.0)
        loss = (nll * mask).sum() / denom
        correct = ((logits.argmax(-1) == labels) * mask).sum()
        return loss, (new_stats, correct)

    # ----------------------------------------------------------------- epoch
    @partial(jax.jit, static_argnums=0)
    def _epoch(self, params, batch_stats, opt_state, boards, labels, key):
        """One epoch: shuffle, scan minibatches (last batch padded+masked).

        Returns (params, batch_stats, opt_state, mean_loss, accuracy).
        """
        n = boards.shape[0]
        bs = self.cfg.batch_size
        n_batches = -(-n // bs)
        pad = n_batches * bs - n

        perm = jax.random.permutation(key, n)
        perm = jnp.concatenate([perm, perm[:pad]]) if pad else perm
        mask_flat = jnp.concatenate(
            [jnp.ones(n, jnp.float32), jnp.zeros(pad, jnp.float32)]
        )

        def mb(carry, idx):
            params, batch_stats, opt_state = carry
            take = jax.lax.dynamic_slice_in_dim(perm, idx * bs, bs)
            m = jax.lax.dynamic_slice_in_dim(mask_flat, idx * bs, bs)
            (loss, (new_stats, correct)), grads = jax.value_and_grad(
                self._loss, has_aux=True
            )(params, batch_stats, boards[take], labels[take], m)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), (loss * m.sum(), correct)

        (params, batch_stats, opt_state), (losses, corrects) = jax.lax.scan(
            mb, (params, batch_stats, opt_state), jnp.arange(n_batches)
        )
        return (
            params, batch_stats, opt_state,
            losses.sum() / n, corrects.sum() / n,
        )

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        variables: dict,
        boards_exp: Any,
        labels: Any,
        key: jax.Array | None = None,
        epochs: int | None = None,
        verbose: bool = True,
    ) -> tuple[dict, list[dict]]:
        """Train; returns (updated variables, per-epoch history).

        Args:
            boards_exp: ``(N, 4, 4)`` int8 exponent boards (host or device).
            labels: ``(N,)`` int action labels.
        """
        epochs = self.cfg.epochs if epochs is None else epochs
        key = jax.random.PRNGKey(self.cfg.seed) if key is None else key
        boards = jnp.asarray(np.asarray(boards_exp), jnp.int8)
        labels = jnp.asarray(np.asarray(labels).reshape(-1), jnp.int32)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        history = []
        for epoch in range(epochs):
            key, k = jax.random.split(key)
            params, batch_stats, opt_state, loss, acc = self._epoch(
                params, batch_stats, opt_state, boards, labels, k
            )
            rec = {"epoch": epoch + 1, "loss": float(loss),
                   "accuracy": float(acc)}
            history.append(rec)
            if verbose:
                print(
                    f"Epoch {epoch + 1}/{epochs} — loss: {rec['loss']:.4f} "
                    f"— accuracy: {rec['accuracy']:.4f}"
                )
        return {"params": params, "batch_stats": batch_stats}, history

    # ------------------------------------------------------------- validation
    @partial(jax.jit, static_argnums=0)
    def _eval_batch(self, params, batch_stats, boards, labels):
        obs = boards_to_model_input(boards)
        if isinstance(self.model, ActorCritic):
            logits, _ = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, obs,
                train=False,
            )
        else:
            logits = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, obs,
                train=False, method=self.model.logits,
            )
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return nll.sum(), (logits.argmax(-1) == labels).sum()

    def evaluate(self, variables, boards_exp, labels) -> dict:
        """Validation loss/accuracy (reference train.py:275-287)."""
        boards = jnp.asarray(np.asarray(boards_exp), jnp.int8)
        labels = jnp.asarray(np.asarray(labels).reshape(-1), jnp.int32)
        nll, correct = self._eval_batch(
            variables["params"], variables.get("batch_stats", {}),
            boards, labels,
        )
        n = labels.shape[0]
        return {"loss": float(nll) / n, "accuracy": float(correct) / n}


def build_bc_trainer_for_ppo(
    filters: int = 64, residual_blocks: int = 4,
    config: BCConfig = BCConfig(epochs=10, batch_size=256),
) -> BCTrainer:
    """BC trainer on the PPO actor-critic (reference pretrain_bc.py:107-121:
    same architecture as ppo_train, trained with cross-entropy)."""
    return BCTrainer(
        ActorCritic(filters=filters, residual_blocks=residual_blocks), config
    )
