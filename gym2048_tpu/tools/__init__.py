"""CLI tools — argparse mains mirroring every reference script surface:

* ``train``          — supervised pipeline (reference train.py:232-293)
* ``pretrain_bc``    — BC warm-start for PPO (reference pretrain_bc.py)
* ``ppo``            — PPO training (reference ppo_train.py)
* ``merge_data``     — merge CSVs w/ min-high-tile filter (merge_training_data.py)
* ``augment_data``   — 8x augmentation (augment_training_data.py)
* ``hflip_data``     — 2x horizontal flip (hflip_training_data.py)
* ``distribute_data``— orientation-balancing split (distribute_training_data.py)
* ``add_rewards``    — recompute rewards by replay (add_rewards_to_training_data.py)
* ``gather``         — interactive human-play collector (gather_training_data.py)

Run as ``python -m gym2048_tpu.tools.<name> ...``.
"""
