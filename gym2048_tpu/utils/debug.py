"""Determinism and numerical-safety utilities.

The TPU analogue of the reference's (absent) sanitizer story (SURVEY.md
§5): single-threaded Python has nothing to race, but a jitted fleet can
silently produce NaNs or desync. Provided here:

* :func:`validate_boards` — checkify-style invariant assertions on env
  state (exponent range, tile-count sanity), usable inside jit;
* :func:`assert_finite_tree` — NaN/Inf guard over a pytree (host-side,
  for use at iteration boundaries in trainers);
* :func:`trajectory_fingerprint` — order-independent digest of a rollout
  for cross-run / cross-topology determinism checks (the same seed on 1
  device vs an 8-device mesh must produce identical fingerprints — see
  tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def validate_boards(board: jax.Array, *, enabled: bool = True) -> jax.Array:
    """Return a per-board validity mask; with ``enabled`` under
    ``jax.experimental.checkify`` the checks become hard errors."""
    e = board.astype(jnp.int32)
    in_range = ((e >= 0) & (e <= 16)).all(axis=(-1, -2))
    n_tiles = (e > 0).sum(axis=(-1, -2))
    plausible = (n_tiles >= 1) & (n_tiles <= 16)
    ok = in_range & plausible
    if enabled:
        from jax.experimental import checkify

        checkify.check(ok.all(), "invalid board state detected")
    return ok


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Raise if any leaf contains NaN/Inf (host-side)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name}{key}"
            )


def trajectory_fingerprint(boards, rewards, dones) -> int:
    """Deterministic digest of a rollout (device-order independent)."""
    b = np.asarray(boards, dtype=np.int64)
    r = np.asarray(rewards, dtype=np.float64)
    d = np.asarray(dones, dtype=np.int64)
    return int(
        (b.sum() * 1000003 + np.round(r.sum() * 16).astype(np.int64)
         + d.sum() * 7919) % (1 << 62)
    )
