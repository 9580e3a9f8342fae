"""Record weight-interop parity fixtures (tests/fixtures/interop_*.npz).

Runs the REFERENCE torch models once (offline; the reference checkout and
torch must be present) and records (state_dict arrays, input boards,
expected outputs). The tests then verify tools/convert_model.py's
torch->flax mapping against these recordings with pure numpy — no
reference code ships in the repo, only recorded data (the fixtures
convention, CLAUDE.md).

Fixture 1 — Game2048Model (reference model.py:28-103, the torch.save
artifact of train.py:289): tiny config (filters=8, 1 block), randomised
params AND BatchNorm running stats, eval-mode forward probs.

Fixture 2 — the SB3 policy layout (ppo_train.py:34-62 ResNetExtractor in
an nn.Sequential + the net_arch=[] action/value heads saved inside SB3
zips, ppo_train.py:185-186): same trunk shape, expected logits/values.

Usage: python scripts/gen_interop_fixture.py [reference_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import torch

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
OUT = Path(__file__).parent.parent / "tests" / "fixtures"
FILTERS, BLOCKS, BATCH = 8, 1, 5


def randomise(module: torch.nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.5
    module.load_state_dict(sd)


def rand_input(seed: int) -> tuple[np.ndarray, torch.Tensor]:
    rng = np.random.default_rng(seed)
    boards = rng.integers(0, 12, (BATCH, 4, 4)).astype(np.int8)
    onehot = np.eye(16, dtype=np.float32)[boards]        # (B,4,4,16) NHWC
    nchw = torch.from_numpy(onehot.transpose(0, 3, 1, 2))  # (B,16,4,4)
    return boards, nchw


def main() -> None:
    sys.path.insert(0, str(REF))
    import model as ref_model  # the reference's model.py

    torch.manual_seed(0)
    m = ref_model.build_model(filters=FILTERS, residual_blocks=BLOCKS)
    randomise(m, seed=1)
    m.eval()
    boards, nchw = rand_input(2)
    with torch.no_grad():
        probs = m(nchw).numpy()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    np.savez(
        OUT / "interop_game2048.npz",
        boards=boards, expected_probs=probs,
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print("game2048:", probs.shape, "first row", probs[0])

    # --- SB3 policy layout: Sequential trunk + linear heads ------------
    import torch.nn as nn

    trunk = nn.Sequential(
        nn.Conv2d(16, FILTERS, 3, padding=1, bias=False),
        nn.BatchNorm2d(FILTERS),
        nn.ReLU(),
        *[ref_model.ResidualBlock(FILTERS) for _ in range(BLOCKS)],
        nn.Flatten(),
    )
    policy = nn.ModuleDict(
        {
            "features_extractor": nn.ModuleDict({"trunk": trunk}),
            "action_net": nn.Linear(FILTERS * 16, 4),
            "value_net": nn.Linear(FILTERS * 16, 1),
        }
    )
    randomise(policy, seed=3)
    policy.eval()
    boards2, nchw2 = rand_input(4)
    with torch.no_grad():
        feats = trunk(nchw2)
        logits = policy["action_net"](feats).numpy()
        values = policy["value_net"](feats).numpy()[:, 0]
    # SB3 state_dict key style: dots, not ModuleDict nesting artifacts
    sd2 = {
        k.replace("features_extractor.trunk", "features_extractor.trunk"):
            v.numpy()
        for k, v in policy.state_dict().items()
    }
    np.savez(
        OUT / "interop_sb3_policy.npz",
        boards=boards2, expected_logits=logits, expected_values=values,
        **{f"sd::{k}": v for k, v in sd2.items()},
    )
    print("sb3:", logits.shape, "first logits", logits[0], "v", values[0])


if __name__ == "__main__":
    main()
