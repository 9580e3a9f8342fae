from gym2048_tpu.train.ppo import PPO, PPOConfig  # noqa: F401
