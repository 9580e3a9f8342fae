"""Residual CNN policy models (flax.linen).

Re-implements the reference model family TPU-first:

* :class:`Game2048Model` — the supervised/BC policy (reference model.py:
  28-103): initial conv-BN-ReLU, N residual blocks, then a policy head
  (1x1 conv to 2 channels, BN, FC to 4 softmax probabilities).
* :class:`ActorCritic` — the PPO network (reference ppo_train.py:36-62 +
  SB3's linear heads with ``net_arch=[]``): the same residual trunk
  flattened to ``filters*16`` features, with linear policy-logit and value
  heads on top.

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), an
optional bfloat16 compute dtype with float32 parameters, and a one-hot
encoder that maps int8 exponent boards straight to model input on device —
the host never materialises observations (contrast the reference's
host-side numpy stack + torch transpose, model.py:106-130).

BatchNorm uses running statistics at rollout/inference time and batch
statistics during training, matching torch/SB3 train/eval semantics.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def boards_to_model_input(board: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Exponent boards ``(..., 4, 4)`` -> one-hot ``(..., 4, 4, 16)`` NHWC.

    Channel c marks exponent c (c=0 empty, c=1..15 tiles 2^1..2^15) — the
    same information as the reference env observation, laid out
    channels-last for the TPU conv path.
    """
    return jax.nn.one_hot(board.astype(jnp.int32), 16, dtype=dtype)


class ResidualBlock(nn.Module):
    """conv3x3-BN-ReLU x2 with skip connection (reference model.py:10-25)."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        x = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x + residual)


class _Trunk(nn.Module):
    """Initial conv-BN-ReLU + N residual blocks, shared by both models."""

    filters: int = 64
    residual_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        for _ in range(self.residual_blocks):
            x = ResidualBlock(self.filters, dtype=self.dtype)(x, train)
        return x


class Game2048Model(nn.Module):
    """Residual CNN policy: board -> action probabilities (4,).

    Args mirror the reference ``build_model`` (model.py:84-103).
    Input: ``(B, 4, 4, 16)`` one-hot NHWC (see boards_to_model_input).
    """

    board_size: int = 4
    board_layers: int = 16
    outputs: int = 4
    filters: int = 64
    residual_blocks: int = 4
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.trunk = _Trunk(self.filters, self.residual_blocks, self.dtype)
        self.policy_conv = nn.Conv(2, (1, 1), use_bias=False,
                                   dtype=self.dtype)
        self.policy_bn = nn.BatchNorm(dtype=self.dtype)
        self.policy_fc = nn.Dense(self.outputs, dtype=self.dtype)

    def logits(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Pre-softmax logits, for numerically-stable cross-entropy."""
        x = self.trunk(x, train)
        x = self.policy_conv(x)
        x = self.policy_bn(x, use_running_average=not train)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return self.policy_fc(x).astype(jnp.float32)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.softmax(self.logits(x, train), axis=-1)


class ActorCritic(nn.Module):
    """PPO network: residual trunk + linear policy/value heads.

    Equivalent to the reference's ResNetExtractor (ppo_train.py:36-62)
    under SB3's CnnPolicy with ``net_arch=[]``: features are the flattened
    ``filters*4*4`` trunk output, heads are single Dense layers.
    """

    filters: int = 64
    residual_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        """Returns ``(policy_logits (B, 4), value (B,))``."""
        x = _Trunk(self.filters, self.residual_blocks, self.dtype)(x, train)
        features = x.reshape(x.shape[0], -1)
        logits = nn.Dense(4, name="policy_head", dtype=self.dtype)(features)
        value = nn.Dense(1, name="value_head", dtype=self.dtype)(features)
        return logits.astype(jnp.float32), value.astype(jnp.float32)[..., 0]


def build_model(
    board_size: int = 4,
    board_layers: int = 16,
    outputs: int = 4,
    filters: int = 64,
    residual_blocks: int = 4,
    dtype: Any = jnp.float32,
) -> Game2048Model:
    """Factory mirroring the reference ``build_model`` signature."""
    return Game2048Model(
        board_size=board_size,
        board_layers=board_layers,
        outputs=outputs,
        filters=filters,
        residual_blocks=residual_blocks,
        dtype=dtype,
    )
