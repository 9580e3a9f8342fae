"""Jittable 8x symmetry augmentation of (board, action, next_board) batches.

TPU-native equivalent of the reference's ``training_data`` transforms
(training_data.py:257-299): a horizontal flip swaps actions right<->left,
a k*90-degree rotation shifts actions by k (mod 4), and ``augment8``
concatenates [original, hflip] x 4 rotations for an 8x dataset — same
ordering as the reference ``augment()`` so golden tests carry over.

All functions operate on batches of exponent boards ``(N, 4, 4)`` (they work
on value boards too — they only permute cells) and int action arrays of any
shape, entirely on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hflip_boards(boards: jax.Array) -> jax.Array:
    """Flip boards left-right (reference flips axis 2)."""
    return boards[..., :, ::-1]


def hflip_actions(actions: jax.Array) -> jax.Array:
    """Swap actions 1 (right) and 3 (left); 0/2 unchanged."""
    return jnp.where(
        actions == 1, 3, jnp.where(actions == 3, 1, actions)
    )


def rotate_boards(boards: jax.Array, k: int) -> jax.Array:
    """Rotate each board by k*90 degrees, matching ``np.rot90(axes=(2,1))``."""
    return jnp.rot90(boards, k=k, axes=(-1, -2))


def rotate_actions(actions: jax.Array, k: int) -> jax.Array:
    """Action remap for a k*90-degree rotation: (a + k) mod 4."""
    return jnp.mod(actions + k, 4)


def augment8(
    boards: jax.Array,
    actions: jax.Array,
    next_boards: jax.Array | None = None,
) -> tuple[jax.Array, ...]:
    """Produce the full 8x dihedral augmentation in reference order.

    Order matches ``training_data.augment()``: the identity+hflip pair, then
    that pair rotated by 1, 2, 3 quarter turns.

    Returns ``(boards_8N, actions_8N[, next_boards_8N])``.
    """
    pair_b = jnp.concatenate([boards, hflip_boards(boards)])
    pair_a = jnp.concatenate([actions, hflip_actions(actions)])
    out_b = [rotate_boards(pair_b, k) for k in range(4)]
    out_a = [rotate_actions(pair_a, k) for k in range(4)]
    result = [jnp.concatenate(out_b), jnp.concatenate(out_a)]
    if next_boards is not None:
        pair_n = jnp.concatenate([next_boards, hflip_boards(next_boards)])
        result.append(jnp.concatenate([rotate_boards(pair_n, k) for k in range(4)]))
    return tuple(result)
