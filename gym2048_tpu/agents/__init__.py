"""Search-based agents (beyond-reference additions).

The reference framework only ever selects actions with a learned policy's
argmax (train.py:85-119). The batched, branch-free rules kernel makes
classical search practical *on device*: :mod:`expectimax` runs a full
expectimax tree over afterstates for thousands of boards in lockstep.
"""

from gym2048_tpu.agents import expectimax  # noqa: F401
