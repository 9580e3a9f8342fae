from gym2048_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    replicate,
    shard_batch,
    shard_env_state,
    shard_train_state,
)
