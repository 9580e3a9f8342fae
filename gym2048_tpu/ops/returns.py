"""Reward math as jittable ops — log2 rewards, discounted returns, GAE.

Re-owns the reference's reward utilities (training_data.py:97-146) as
``lax``-friendly scans plus the GAE computation the reference delegated to
Stable-Baselines3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log2_rewards(rewards: jax.Array) -> jax.Array:
    """log2 of positive rewards, 0 elsewhere.

    The reference uses a masked log (training_data.py:97-102) whose fill
    behaves as 0 for non-positive rewards (see its golden test).
    """
    r = rewards.astype(jnp.float32)
    return jnp.where(r > 0, jnp.log2(jnp.maximum(r, 1e-30)), 0.0)


def discounted_returns(
    rewards: jax.Array, dones: jax.Array, gamma: float = 0.9
) -> jax.Array:
    """Reverse-scan discounted return with reset at episode ends.

    Matches the reference semantics (training_data.py:104-124): iterating
    from the end, ``done[t]`` zeroes the bootstrap *for step t itself* —
    i.e. ``G[t] = r[t] + (0 if done[t] else gamma * G[t+1])``.

    Args:
        rewards: ``(T,)`` float rewards in game order.
        dones:   ``(T,)`` bool episode-end flags.
        gamma:   discount factor.
    """

    def step(next_return, rd):
        r, d = rd
        g = r + jnp.where(d, 0.0, gamma * next_return)
        return g, g

    _, out = jax.lax.scan(
        step,
        jnp.float32(0.0),
        (rewards.astype(jnp.float32), dones),
        reverse=True,
    )
    return out


def gae(
    rewards: jax.Array,
    values: jax.Array,
    dones: jax.Array,
    last_value: jax.Array,
    gamma: float = 0.99,
    lam: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """Generalised advantage estimation over a time-major rollout.

    The reference outsources this to SB3's RolloutBuffer; here it is a
    single reverse ``lax.scan``. ``dones[t]`` marks that the transition at
    step t *ended* the episode, so no bootstrapping across it.

    Args:
        rewards:    ``(T, ...)`` rewards.
        values:     ``(T, ...)`` value estimates V(s_t).
        dones:      ``(T, ...)`` episode-termination flags for step t.
        last_value: ``(...,)`` V(s_{T}) used to bootstrap the final step.

    Returns:
        ``(advantages (T, ...), returns (T, ...))`` with
        ``returns = advantages + values``.
    """
    rewards = rewards.astype(jnp.float32)
    values = values.astype(jnp.float32)
    not_done = 1.0 - dones.astype(jnp.float32)

    def step(carry, inp):
        next_adv, next_value = carry
        r, v, nd = inp
        delta = r + gamma * next_value * nd - v
        adv = delta + gamma * lam * nd * next_adv
        return (adv, v), adv

    (_, _), advantages = jax.lax.scan(
        step,
        (jnp.zeros_like(last_value, jnp.float32), last_value.astype(jnp.float32)),
        (rewards, values, not_done),
        reverse=True,
    )
    return advantages, advantages + values


def normalize(x: jax.Array, mean=None, sd=None) -> jax.Array:
    """(x - mean) / sd with moments computed over the whole array by default.

    Matches ``normalize_rewards``/``normalize_boards``
    (training_data.py:126-146).
    """
    x = x.astype(jnp.float32)
    if mean is None:
        mean = jnp.mean(x)
    if sd is None:
        sd = jnp.std(x)
    return (x - mean) / sd
