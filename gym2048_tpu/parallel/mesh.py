"""Device mesh + sharding layout for multi-chip / multi-host scale-out.

The reference has no distributed machinery at all (SURVEY.md §2: its only
"parallelism" is a sequential DummyVecEnv loop). This module is the new
first-class component: a 2D ``(data, model)`` mesh where

* the **env batch** and every rollout/minibatch tensor shard over ``data``
  (thousands-to-millions of boards split across chips; collectives ride ICI);
* **parameters, optimiser state and batch stats replicate** over ``data``
  (pure data parallelism — this policy CNN is ~1M params, so tensor/pipeline
  sharding would be all overhead; the ``model`` axis exists so the layout
  generalises, and stays size 1 here).

Everything goes through ``jax.jit`` with NamedSharding-annotated inputs; XLA
inserts the psum for gradient averaging and any reshard for the minibatch
permutation. Multi-host: call :func:`init_distributed` first, then the same
mesh spans hosts (DCN between hosts, ICI within a slice).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(**kwargs) -> None:
    """Initialise the JAX multi-host runtime.

    Thin wrapper over ``jax.distributed.initialize``; coordinator address
    etc. come from env vars or kwargs. Must run before any other JAX call
    (touching a backend first would pin single-process mode). Failures are
    only swallowed when no coordinator is configured anywhere (a genuine
    single-process run); with a coordinator configured they re-raise, so a
    pod job can never silently degrade to independent per-host training.
    """
    import os
    import warnings

    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:  # older jax without is_initialized
        pass
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        coordinator = (
            kwargs.get("coordinator_address")
            or os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")
        )
        if coordinator:
            raise
        warnings.warn(
            f"init_distributed: no coordinator configured, continuing "
            f"single-process ({e})"
        )


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    model_parallelism: int = 1,
) -> Mesh:
    """Create the ``(data, model)`` mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallelism == 0
    import numpy as np

    grid = np.asarray(devices).reshape(n // model_parallelism,
                                       model_parallelism)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Sharding for a tensor whose leading axis is the env/batch axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def shard_env_state(env_state: Any, mesh: Mesh) -> Any:
    """Place an EnvState on the mesh: batch-led arrays sharded, key replicated."""
    batch = env_state.board.shape[0]
    data = shard_batch(mesh)
    rep = replicate(mesh)

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == batch:
            return jax.device_put(x, data)
        return jax.device_put(x, rep)

    return jax.tree.map(place, env_state)


def shard_train_state(train_state: Any, mesh: Mesh) -> Any:
    """Place a PPO TrainState: env sharded over data, everything else
    replicated (dp). XLA then partitions the rollout along the env batch and
    all-reduces gradients."""
    rep = replicate(mesh)
    placed = jax.tree.map(lambda x: jax.device_put(x, rep), train_state)
    return placed.replace(
        env_state=shard_env_state(train_state.env_state, mesh)
    )
