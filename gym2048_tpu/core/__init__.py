from gym2048_tpu.core import rules, rules_np  # noqa: F401
