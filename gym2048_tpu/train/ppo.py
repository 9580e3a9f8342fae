"""On-device PPO actor-learner.

Re-owns what the reference delegates to Stable-Baselines3 (ppo_train.py:
122-188): rollout collection, GAE, and the clipped-surrogate update — fused
into ONE jitted ``train_iteration`` per rollout. Where the reference
ping-pongs host<->device every env step (8 Python envs feeding a torch
policy), here the environment batch, the policy and the optimiser all live
on device; a rollout is a ``lax.scan`` over time and an update is a scan
over shuffled minibatches. The env batch dimension is the sharding axis for
multi-chip scale-out (see gym2048_tpu.parallel).

Hyperparameter-for-hyperparameter faithful to the reference defaults
(ppo_train.py:195-233) and SB3 semantics: advantage normalisation per
minibatch, Adam(eps=1e-5), value MSE scaled by vf_coef, entropy bonus,
global grad-norm clipping, optional linear LR anneal, and rollout-time
BatchNorm in eval mode / update-time in train mode (SB3
``set_training_mode``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from gym2048_tpu.env import EnvConfig, batched
from gym2048_tpu.models import ActorCritic, boards_to_model_input
from gym2048_tpu.ops import returns as returns_ops


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """PPO hyperparameters; defaults mirror the reference CLI defaults
    (ppo_train.py:195-233)."""

    total_timesteps: int = 5_000_000
    n_envs: int = 8
    seed: int = 42
    n_steps: int = 2048
    batch_size: int = 256
    n_epochs: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_coef: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    max_grad_norm: float = 0.5
    lr: float = 3e-4
    anneal_lr: bool = False
    filters: int = 64
    residual_blocks: int = 4
    illegal_move_reward: float = 0.0
    compute_dtype: Any = jnp.float32
    # TPU extras (default off => exact reference/SB3 semantics):
    # log2-compress merge rewards before GAE — keeps the value target in a
    # small range (the reference applies the same transform to SL data,
    # training_data.py:97-102, but not in PPO).
    log2_rewards: bool = False
    reward_scale: float = 1.0
    # Minibatch shuffling:
    #   "global"  — SB3-style uniform shuffle of the flat (T*B) buffer.
    #     Statistically exact, but with the env batch sharded over a mesh
    #     the index gather becomes a cross-device all-to-all every step.
    #   "sharded" — independent per-env permutation of the time axis, then
    #     minibatches are contiguous time-slices x all envs. Every sample
    #     is still used exactly once per epoch and each minibatch is an
    #     unbiased sample; all data movement stays device-local (the only
    #     collective left in the update is the gradient psum over ICI).
    #     Requires batch_size % n_envs == 0.
    shuffle_mode: str = "global"
    # Mask illegal actions in the policy (rollout AND update — the mask is
    # recomputed from the stored boards, so the two stay consistent). The
    # reference/SB3 cannot do this (no legality oracle); with masking an
    # episode only ends when the board is truly dead.
    mask_illegal: bool = False

    @property
    def rollout_size(self) -> int:
        return self.n_envs * self.n_steps

    @property
    def n_minibatches(self) -> int:
        assert self.rollout_size % self.batch_size == 0, (
            f"rollout {self.rollout_size} not divisible by batch "
            f"{self.batch_size}"
        )
        return self.rollout_size // self.batch_size

    @property
    def n_updates(self) -> int:
        # ceil, like SB3's learn(): train until >= total_timesteps (a floor
        # would silently train 4,997,120 of the default 5M steps).
        return max(1, -(-self.total_timesteps // self.rollout_size))


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    env_state: batched.EnvState
    key: jax.Array
    update_idx: jax.Array  # int32, completed train_iterations


@struct.dataclass
class Transition:
    board: jax.Array    # (B, 4, 4) int8 — observation the policy acted on
    action: jax.Array   # (B,) int32
    logprob: jax.Array  # (B,) f32
    value: jax.Array    # (B,) f32
    reward: jax.Array   # (B,) f32
    done: jax.Array     # (B,) bool
    score: jax.Array    # (B,) f32 — game score incl. this step (pre-reset)
    highest: jax.Array  # (B,) int32
    ep_len: jax.Array   # (B,) int32 — episode length incl. this step


def ppo_loss_terms(
    logits: jax.Array,
    value: jax.Array,
    action: jax.Array,
    old_logprob: jax.Array,
    adv: jax.Array,
    ret: jax.Array,
    clip_coef: float,
):
    """Pure PPO loss math on raw policy outputs (SB3 semantics as mirrored
    from the reference's delegation, ppo_train.py:138-156): per-minibatch
    advantage normalisation, clipped surrogate, value MSE, and the entropy
    of the (possibly masked) categorical distribution.

    Separated from the model application so golden-value tests can pin
    every constant and scan direction against hand-computed fixtures
    (tests/test_ppo_golden.py). Returns ``(policy_loss, value_loss,
    entropy, approx_kl, clip_frac)``.
    """
    log_probs = jax.nn.log_softmax(logits)
    logprob = jnp.take_along_axis(log_probs, action[:, None], axis=-1)[:, 0]
    ratio = jnp.exp(logprob - old_logprob)

    adv = (adv - adv.mean()) / (adv.std() + 1e-8)

    pg1 = ratio * adv
    pg2 = jnp.clip(ratio, 1 - clip_coef, 1 + clip_coef) * adv
    policy_loss = -jnp.minimum(pg1, pg2).mean()

    value_loss = jnp.mean((value - ret) ** 2)
    # entropy over the (possibly masked) distribution; guard the
    # p * log p = 0 * -1e9 products of masked actions
    probs = jnp.exp(log_probs)
    plogp = jnp.where(probs > 1e-12, probs * log_probs, 0.0)
    entropy = -plogp.sum(-1).mean()

    approx_kl = ((ratio - 1.0) - jnp.log(ratio)).mean()
    clip_frac = (jnp.abs(ratio - 1.0) > clip_coef).mean()
    return policy_loss, value_loss, entropy, approx_kl, clip_frac


class PPO:
    """PPO trainer. Construct, then ``state = init_state(key)`` and loop
    ``state, metrics = train_iteration(state)`` (jitted), or call
    :meth:`learn` for the full driver loop."""

    def __init__(self, config: PPOConfig):
        self.cfg = config
        self.model = ActorCritic(
            filters=config.filters,
            residual_blocks=config.residual_blocks,
            dtype=config.compute_dtype,
        )
        self.env_cfg = EnvConfig(
            illegal_move_reward=config.illegal_move_reward, auto_reset=True
        )
        total_opt_steps = (
            config.n_updates * config.n_epochs * config.n_minibatches
        )
        if config.anneal_lr:
            # SB3 passes progress_remaining (1 -> 0) to the lr lambda.
            schedule = optax.linear_schedule(
                init_value=config.lr, end_value=0.0,
                transition_steps=total_opt_steps,
            )
        else:
            schedule = config.lr
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(learning_rate=schedule, eps=1e-5),
        )

    # ------------------------------------------------------------------ init
    def init_state(self, key: jax.Array | None = None) -> TrainState:
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        key, k_env, k_model = jax.random.split(key, 3)
        env_state = batched.reset(k_env, cfg.n_envs)
        dummy = boards_to_model_input(env_state.board)
        variables = self.model.init(k_model, dummy, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            env_state=env_state,
            key=key,
            update_idx=jnp.int32(0),
        )

    # --------------------------------------------------------------- rollout
    def _policy(self, params, batch_stats, board, train: bool = False):
        obs = boards_to_model_input(board, dtype=self.cfg.compute_dtype)
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats}, obs, train=train
        )

    def _collect_rollout(self, state: TrainState):
        """Scan n_steps; returns (new env state, key, Transition (T, B, ...),
        last_value (B,))."""

        params, batch_stats = state.params, state.batch_stats

        def step_fn(carry, _):
            env_state, key = carry
            key, k_act = jax.random.split(key)
            logits, value = self._policy(params, batch_stats, env_state.board)
            products = None
            if self.cfg.mask_illegal:
                # one move_all serves both the policy mask and the env step
                products = batched.move_products(env_state)
                logits = jnp.where(products[2], logits, -1e9)
            action = jax.random.categorical(k_act, logits, axis=-1)
            logprob = jnp.take_along_axis(
                jax.nn.log_softmax(logits), action[:, None], axis=-1
            )[:, 0]
            board_before = env_state.board
            if products is None:
                env_state, ts = batched.step(env_state, action, self.env_cfg)
            else:
                env_state, ts = batched.step_with_products(
                    env_state, action, products, self.env_cfg
                )
            tr = Transition(
                board=board_before,
                action=action.astype(jnp.int32),
                logprob=logprob,
                value=value,
                reward=ts.reward,
                done=ts.terminated,
                score=ts.score,
                highest=ts.highest,
                ep_len=ts.steps,
            )
            return (env_state, key), tr

        (env_state, key), traj = jax.lax.scan(
            step_fn, (state.env_state, state.key), None,
            length=self.cfg.n_steps,
        )
        _, last_value = self._policy(params, batch_stats, env_state.board)
        return env_state, key, traj, last_value

    # ---------------------------------------------------------------- update
    def _loss_fn(self, params, batch_stats, mb, key):
        cfg = self.cfg
        obs = boards_to_model_input(mb.board, dtype=cfg.compute_dtype)
        (logits, value), mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            obs, train=True, mutable=["batch_stats"],
        )
        if cfg.mask_illegal:
            from gym2048_tpu.core import rules

            _, _, legal = jax.vmap(rules.move_all)(mb.board)
            logits = jnp.where(legal, logits, -1e9)
        policy_loss, value_loss, entropy, approx_kl, clip_frac = (
            ppo_loss_terms(
                logits, value, mb.action, mb.logprob, mb.adv, mb.ret,
                cfg.clip_coef,
            )
        )

        loss = (
            policy_loss
            - cfg.ent_coef * entropy
            + cfg.vf_coef * value_loss
        )
        aux = {
            "batch_stats": mutated["batch_stats"],
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy,
            "approx_kl": approx_kl,
            "clip_frac": clip_frac,
        }
        return loss, aux

    def _sgd_scan(self, state_tuple, minibatch_fn, n_minibatches):
        """Scan ``n_minibatches`` SGD steps; ``minibatch_fn(i) -> batch``."""

        def mb_fn(carry, mb_idx):
            params, batch_stats, opt_state = carry
            mb = minibatch_fn(mb_idx)
            (loss, aux), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(params, batch_stats, mb, None)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            batch_stats = aux.pop("batch_stats")
            aux["loss"] = loss
            return (params, batch_stats, opt_state), aux

        return jax.lax.scan(
            mb_fn, state_tuple, jnp.arange(n_minibatches)
        )

    def _update_epochs(self, state: TrainState, data, key):
        """n_epochs of shuffled minibatch SGD over the (T, B) buffer.

        ``data`` is time-major: every leaf has shape (n_steps, n_envs, ...).
        See PPOConfig.shuffle_mode for the two shuffling strategies.
        """
        cfg = self.cfg

        if cfg.shuffle_mode == "sharded":
            assert cfg.batch_size % cfg.n_envs == 0, (
                "shuffle_mode='sharded' needs batch_size % n_envs == 0"
            )
            rows = cfg.batch_size // cfg.n_envs
            assert cfg.n_steps % rows == 0

            def epoch_fn(carry, k_epoch):
                # independent time permutation per env column (local to
                # each shard of the env axis)
                u = jax.random.uniform(k_epoch, (cfg.n_steps, cfg.n_envs))
                idx = jnp.argsort(u, axis=0)

                def permute(x):
                    ix = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
                    return jnp.take_along_axis(x, ix, axis=0)

                shuffled = jax.tree.map(permute, data)

                def minibatch(mb_idx):
                    def slice_rows(x):
                        sl = jax.lax.dynamic_slice_in_dim(
                            x, mb_idx * rows, rows, axis=0
                        )
                        # flatten ENV-major: flat index = env * rows + t.
                        # env is the sharded axis; env-major keeps each
                        # device's slice a contiguous block of the flat
                        # minibatch, so the SPMD partitioner keeps the SGD
                        # step sharded. A time-major reshape interleaves
                        # the shards and forces XLA to ALL-GATHER the whole
                        # minibatch to every device (then each computes the
                        # full-batch loss redundantly) — measured as the
                        # PPO anti-scaling in docs/SCALING.md, enforced
                        # against by tests/test_parallel.py's HLO audit.
                        sl = jnp.swapaxes(sl, 0, 1)
                        return sl.reshape((rows * cfg.n_envs,) + x.shape[2:])

                    return jax.tree.map(slice_rows, shuffled)

                return self._sgd_scan(carry, minibatch, cfg.n_minibatches)

        else:
            flat_data = jax.tree.map(
                lambda x: x.reshape((cfg.rollout_size,) + x.shape[2:]), data
            )

            def epoch_fn(carry, k_epoch):
                perm = jax.random.permutation(k_epoch, cfg.rollout_size)

                def minibatch(mb_idx):
                    idx = jax.lax.dynamic_slice_in_dim(
                        perm, mb_idx * cfg.batch_size, cfg.batch_size
                    )
                    return jax.tree.map(lambda x: x[idx], flat_data)

                return self._sgd_scan(carry, minibatch, cfg.n_minibatches)

        keys = jax.random.split(key, cfg.n_epochs)
        (params, batch_stats, opt_state), auxs = jax.lax.scan(
            epoch_fn, (state.params, state.batch_stats, state.opt_state), keys
        )
        metrics = jax.tree.map(lambda x: x.mean(), auxs)
        return params, batch_stats, opt_state, metrics

    # ------------------------------------------------------------- iteration
    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_iteration(self, state: TrainState):
        """One full PPO iteration: rollout + GAE + epochs of minibatch SGD.

        Returns ``(new_state, metrics dict of scalars)``.
        """
        cfg = self.cfg
        env_state, key, traj, last_value = self._collect_rollout(state)

        train_reward = traj.reward
        if cfg.log2_rewards:
            train_reward = jnp.sign(train_reward) * jnp.log2(
                1.0 + jnp.abs(train_reward)
            )
        train_reward = train_reward * cfg.reward_scale

        adv, ret = returns_ops.gae(
            train_reward, traj.value, traj.done, last_value,
            gamma=cfg.gamma, lam=cfg.gae_lambda,
        )

        # time-major (T, B) update buffer; shuffling happens per epoch
        data = _UpdateBatch(
            board=traj.board, action=traj.action, logprob=traj.logprob,
            adv=adv, ret=ret,
        )

        key, k_update = jax.random.split(key)
        params, batch_stats, opt_state, metrics = self._update_epochs(
            state.replace(key=key), data, k_update
        )

        # Episode statistics from rollout (SB3's ep_info buffer equivalent).
        done_f = traj.done.astype(jnp.float32)
        n_episodes = done_f.sum()
        safe = jnp.maximum(n_episodes, 1.0)
        metrics.update(
            n_episodes=n_episodes,
            ep_return_mean=(traj.score * done_f).sum() / safe,
            # true per-episode lengths at done time (SB3's ep_info 'l'),
            # not rollout_size/n_episodes — that proxy is biased whenever
            # episodes span rollout boundaries
            ep_len_mean=(
                traj.ep_len.astype(jnp.float32) * done_f
            ).sum() / safe,
            highest_tile_mean=(
                traj.highest.astype(jnp.float32) * done_f
            ).sum() / safe,
            highest_tile_max=traj.highest.max().astype(jnp.float32),
            reward_per_step=traj.reward.mean(),
        )

        new_state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            env_state=env_state,
            key=key,
            update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    # ----------------------------------------------------------------- learn
    def learn(
        self,
        state: TrainState | None = None,
        callback: Callable[..., None] | None = None,
        log_interval: int = 10,
    ) -> TrainState:
        """Full training loop (host driver around the jitted iteration).

        ``callback`` is invoked as ``callback(update, metrics)`` or, if it
        accepts a third parameter, ``callback(update, metrics, state)``
        (for checkpointing/video hooks).
        """
        import inspect

        cfg = self.cfg
        if state is None:
            state = self.init_state()
        wants_state = callback is not None and len(
            inspect.signature(callback).parameters
        ) >= 3
        start = int(state.update_idx)
        # rolling episode stats (SB3's ep_info_buffer equivalent): per-rollout
        # means can be empty (0 episodes) for long-episode configs, so keep a
        # completion-weighted running view on the host.
        rolling = {"ep_return": 0.0, "highest": 0.0, "weight": 0.0}
        for update in range(start, cfg.n_updates):
            state, metrics = self.train_iteration(state)
            if callback is not None or (update + 1) % log_interval == 0:
                host = {k: float(np.asarray(v)) for k, v in metrics.items()}
                host["timesteps"] = (update + 1) * cfg.rollout_size
                n_eps = host.get("n_episodes", 0.0)
                if n_eps > 0:
                    w = rolling["weight"] * 0.5 + n_eps
                    rolling["ep_return"] = (
                        rolling["ep_return"] * rolling["weight"] * 0.5
                        + host["ep_return_mean"] * n_eps
                    ) / w
                    rolling["highest"] = (
                        rolling["highest"] * rolling["weight"] * 0.5
                        + host["highest_tile_mean"] * n_eps
                    ) / w
                    rolling["weight"] = w
                host["ep_return_rolling"] = rolling["ep_return"]
                host["highest_tile_rolling"] = rolling["highest"]
                if callback is not None:
                    if wants_state:
                        callback(update + 1, host, state)
                    else:
                        callback(update + 1, host)
                else:
                    print(
                        f"update {update + 1}/{cfg.n_updates} "
                        f"steps {host['timesteps']} "
                        f"ep_rew {host['ep_return_mean']:.1f} "
                        f"highest {host['highest_tile_mean']:.0f} "
                        f"kl {host['approx_kl']:.4f}"
                    )
        return state


@struct.dataclass
class _UpdateBatch:
    board: jax.Array
    action: jax.Array
    logprob: jax.Array
    adv: jax.Array
    ret: jax.Array
