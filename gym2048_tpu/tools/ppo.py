"""PPO training CLI.

Mirrors the reference ``ppo_train.py`` flag surface (ppo_train.py:195-233)
and training flow (:122-188): optional BC warm start, highest-tile metric,
periodic checkpoints, periodic greedy-episode videos, TensorBoard logging,
final model save. TPU extras: any env batch size (the reference is pinned
to 8 sequential envs), JSONL metrics, true checkpoint/resume.
"""

from __future__ import annotations

import argparse
import time


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="PPO training for 2048 on TPU"
    )
    p.add_argument("--total-timesteps", type=int, default=5_000_000)
    p.add_argument("--n-envs", type=int, default=8,
                   help="Number of parallel environments (TPU: use 1024+)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n-steps", type=int, default=2048,
                   help="Steps collected per rollout")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--n-epochs", type=int, default=4)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--gae-lambda", type=float, default=0.95)
    p.add_argument("--clip-coef", type=float, default=0.2)
    p.add_argument("--vf-coef", type=float, default=0.5)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--max-grad-norm", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--anneal-lr", action="store_true",
                   help="Linearly decay LR to 0 over training")
    p.add_argument("--filters", type=int, default=64)
    p.add_argument("--residual-blocks", type=int, default=4)
    p.add_argument("--pretrained", default=None,
                   help="Path to BC pre-trained model from pretrain_bc")
    p.add_argument("--video-freq", type=int, default=1_000_000,
                   help="Record a video every N timesteps (0 = disable)")
    p.add_argument("--log-interval", type=int, default=10,
                   help="Log every N rollouts")
    p.add_argument("--save-interval", type=int, default=100,
                   help="Checkpoint every N rollouts (0 = disable)")
    p.add_argument("--illegal-move-reward", type=float, default=0.0)
    p.add_argument("--log2-rewards", action="store_true",
                   help="log2-compress rewards before GAE (TPU extra; "
                        "default off = exact SB3 semantics)")
    p.add_argument("--reward-scale", type=float, default=1.0)
    p.add_argument("--mask-illegal", action="store_true",
                   help="Mask illegal actions in the policy (TPU extra; "
                        "the reference/SB3 has no legality oracle)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (f32 params/updates) — the MXU's"
                        " native dtype")
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel training over all visible devices "
                        "via the (data, model) mesh: params replicate, "
                        "the env batch shards, gradients all-reduce over "
                        "ICI (docs/MULTIHOST.md front door; also switches "
                        "to the device-local minibatch shuffle)")
    p.add_argument("--log-dir", default="./logs")
    p.add_argument("--ckpt-dir", default="./checkpoints")
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest checkpoint in --ckpt-dir")
    p.add_argument("--run-name", default=None)
    return p.parse_args(argv)


def main(argv=None) -> None:
    import jax

    from gym2048_tpu.train import PPO, PPOConfig
    from gym2048_tpu.utils.checkpoint import (
        Checkpointer,
        load_model,
        save_model,
    )
    from gym2048_tpu.utils.metrics import MetricsLogger

    args = parse_args(argv)
    run_name = args.run_name or f"ppo_{int(time.time())}"
    print(f"JAX devices: {jax.devices()}")

    cfg = PPOConfig(
        total_timesteps=args.total_timesteps,
        n_envs=args.n_envs,
        seed=args.seed,
        n_steps=args.n_steps,
        batch_size=args.batch_size,
        n_epochs=args.n_epochs,
        gamma=args.gamma,
        gae_lambda=args.gae_lambda,
        clip_coef=args.clip_coef,
        vf_coef=args.vf_coef,
        ent_coef=args.ent_coef,
        max_grad_norm=args.max_grad_norm,
        lr=args.lr,
        anneal_lr=args.anneal_lr,
        filters=args.filters,
        residual_blocks=args.residual_blocks,
        illegal_move_reward=args.illegal_move_reward,
        log2_rewards=args.log2_rewards,
        reward_scale=args.reward_scale,
        mask_illegal=args.mask_illegal,
        compute_dtype=(jax.numpy.bfloat16 if args.bf16
                       else jax.numpy.float32),
        # the multi-chip mode needs the device-local shuffle (the global
        # minibatch permutation would gather the whole rollout to every
        # device — docs/MULTIHOST.md, tests/test_parallel.py HLO audit)
        **({"shuffle_mode": "sharded"} if args.mesh else {}),
    )
    ppo = PPO(cfg)
    state = ppo.init_state()

    ckpt = Checkpointer(args.ckpt_dir) if args.save_interval > 0 else None
    if args.resume and ckpt is not None and ckpt.latest_step() is not None:
        state = jax.tree.map(jax.numpy.asarray, ckpt.restore(like=state))
        print(f"Resumed from checkpoint step {int(state.update_idx)}")
    elif args.pretrained:
        variables, meta = load_model(args.pretrained)
        assert meta.get("model") == "ActorCritic", meta
        state = state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
        )
        print(f"Loaded pre-trained policy weights from {args.pretrained}")

    if args.mesh:
        from gym2048_tpu.parallel import make_mesh, shard_train_state

        mesh = make_mesh()
        state = shard_train_state(state, mesh)
        print(f"sharded training over mesh {dict(mesh.shape)}")

    logger = MetricsLogger(args.log_dir, run_name)
    last_video = {"t": 0}

    def callback(update: int, metrics: dict, state) -> None:
        timesteps = metrics["timesteps"]
        if update % args.log_interval == 0:
            logger.log(timesteps, {
                "rollout/ep_rew_mean": metrics["ep_return_rolling"],
                "rollout/ep_len_mean": metrics["ep_len_mean"],
                "rollout/highest_tile": metrics["highest_tile_rolling"],
                "train/loss": metrics["loss"],
                "train/policy_loss": metrics["policy_loss"],
                "train/value_loss": metrics["value_loss"],
                "train/entropy": metrics["entropy"],
                "train/approx_kl": metrics["approx_kl"],
                "train/clip_frac": metrics["clip_frac"],
            })
            print(
                f"update {update}/{cfg.n_updates} steps {timesteps} "
                f"ep_rew {metrics['ep_return_rolling']:.1f} "
                f"highest {metrics['highest_tile_rolling']:.0f} "
                f"kl {metrics['approx_kl']:.4f}"
            )
        if ckpt is not None and update % args.save_interval == 0:
            ckpt.save(update, state)
        if args.video_freq > 0 and (
            timesteps - last_video["t"] >= args.video_freq
        ):
            last_video["t"] = timesteps
            _record_video(ppo, state, run_name, timesteps)

    state = ppo.learn(state, callback=callback, log_interval=1)

    final_path = f"ppo_model_final_{int(time.time())}.pkl"
    save_model(
        final_path,
        {"params": state.params, "batch_stats": state.batch_stats},
        {"filters": args.filters, "residual_blocks": args.residual_blocks,
         "model": "ActorCritic"},
    )
    print(f"\nTraining complete. Model saved to {final_path}")
    logger.close()


def _record_video(ppo, state, run_name: str, timesteps: int) -> None:
    import jax
    import numpy as np

    from gym2048_tpu.models import boards_to_model_input
    from gym2048_tpu.ops import obs as obs_ops
    from gym2048_tpu.utils.video import record_episode_gif

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def greedy(board_exp):
        logits, _ = ppo.model.apply(
            variables, boards_to_model_input(board_exp[None]), train=False
        )
        return logits[0].argmax()

    def choose(observation):
        board = obs_ops.unstack_env(jax.numpy.asarray(observation))
        return int(greedy(board))

    stats = record_episode_gif(
        choose, f"./videos/{run_name}_{timesteps}.gif"
    )
    print(f"  video: {stats['path']} ({stats['steps']} steps, "
          f"highest {stats['highest']})")


if __name__ == "__main__":
    main()
