from gym2048_tpu.ops import augment, obs, returns  # noqa: F401
