"""gym2048_tpu — a TPU-native 2048 environment engine + RL training framework.

A from-scratch JAX/XLA re-design of the capabilities of the reference
``rgal/gym-2048`` (a Python/Gymnasium/PyTorch stack; see SURVEY.md):

* ``core``     — pure, branch-free game rules on int8 log2-exponent boards
                 (reference: env/envs/game2048_env.py:165-288).
* ``env``      — vmapped batched env with auto-reset plus a Gymnasium-compatible
                 single-env adapter with bit-exact RNG parity
                 (reference: env/envs/game2048_env.py:34-163).
* ``ops``      — jittable observation encoders, 8x symmetry augmentation,
                 discounted returns (reference: training_data.py transforms).
* ``data``     — host-side training-data container + 35/36-column CSV interop
                 (reference: training_data.py:22-322).
* ``models``   — flax residual CNN policy / actor-critic
                 (reference: model.py, ppo_train.py:36-62).
* ``train``    — BC trainer, on-device PPO actor-learner, eval harness
                 (reference: train.py, ppo_train.py, pretrain_bc.py).
* ``parallel`` — mesh/sharding for multi-chip and multi-host scale-out
                 (new; the reference has no distributed machinery).
* ``utils``    — config, checkpointing (orbax), metrics, rendering, profiling.
"""

__version__ = "0.1.0"

from gym2048_tpu.core import rules  # noqa: F401
