from gym2048_tpu.env.batched import (  # noqa: F401
    EnvConfig,
    EnvState,
    TimeStep,
    reset,
    step,
)
from gym2048_tpu.env.registration import register_gym  # noqa: F401
