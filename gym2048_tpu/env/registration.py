"""Gymnasium registration.

The reference registers its env as ``2048-v0`` (env/__init__.py:3-6). We
register the adapter under both ``Tpu2048-v0`` (canonical) and ``2048-v0``
(drop-in compatibility), guarding against double registration.
"""

from __future__ import annotations


def register_gym() -> None:
    import gymnasium as gym
    from gymnasium.envs.registration import register

    for env_id in ("Tpu2048-v0", "2048-v0"):
        if env_id not in gym.registry:
            register(
                id=env_id,
                entry_point="gym2048_tpu.env.adapter:Game2048Env",
            )


register_gym()
