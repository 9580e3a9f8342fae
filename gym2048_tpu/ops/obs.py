"""Observation encoders — jittable, exponent-board native.

The reference has **two divergent** one-hot encodings (SURVEY.md C4) and both
are reproduced here exactly:

* :func:`env_stack` — the env observation (game2048_env.py:17-32):
  ``(16, 4, 4)`` channels-first; channel 0 marks empty cells, channels 1..15
  mark tiles ``2^1 .. 2^15``. A 65536 tile encodes to all-zero channels,
  as in the reference.
* :func:`dataset_stack` — the training-data stacking (training_data.py:8-20):
  ``(..., 4, 4, 16)`` channels-last; channels mark ``2^1 .. 2^16`` and there
  is **no** empty channel.

On exponent boards both are a single integer comparison against an iota —
no powers of two are ever materialised.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def env_stack(board: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Exponent board ``(..., 4, 4)`` -> ``(..., 16, 4, 4)`` env observation.

    Channel c is 1 where the exponent equals c (c=0 is exactly the empty
    indicator, c=1..15 the tiles 2^1..2^15; exponent 16 encodes to nothing).
    """
    e = board.astype(jnp.int32)[..., None, :, :]
    channels = jnp.arange(16, dtype=jnp.int32)[:, None, None]
    return (e == channels).astype(dtype)


def dataset_stack(board: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Exponent board ``(..., 4, 4)`` -> ``(..., 4, 4, 16)`` dataset stacking.

    Channel j is 1 where the exponent equals j+1 (tiles 2^1..2^16); empty
    cells encode to all-zero.
    """
    e = board.astype(jnp.int32)[..., None]
    channels = jnp.arange(1, 17, dtype=jnp.int32)
    return (e == channels).astype(dtype)


def unstack_env(obs: jax.Array) -> jax.Array:
    """Inverse of :func:`env_stack`: ``(..., 16, 4, 4)`` -> exponent board.

    Mirrors the reference ``unstack`` (gather_training_data.py:71-75), which
    skips the empty channel and sums value layers; on one-hot input that is
    just the argmax channel.
    """
    channels = jnp.arange(16, dtype=jnp.int32)[:, None, None]
    return jnp.sum(
        obs.astype(jnp.int32) * channels, axis=-3
    ).astype(jnp.int8)


def dataset_to_env(stacked: jax.Array) -> jax.Array:
    """Dataset stacking ``(..., 4, 4, 16)`` -> env layout ``(..., 16, 4, 4)``.

    The reference does this transpose in ``stacked_to_tensor``
    (model.py:119-130) — note the two encodings also differ in channel
    meaning, so this conversion goes through the exponent board.
    """
    channels = jnp.arange(1, 17, dtype=jnp.int32)
    exps = jnp.sum(stacked.astype(jnp.int32) * channels, axis=-1)
    return env_stack(exps, dtype=stacked.dtype)
