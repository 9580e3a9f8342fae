"""Weight-interop tests (tools/convert_model.py).

Parity is checked against RECORDED reference-model outputs
(tests/fixtures/interop_*.npz, generator scripts/gen_interop_fixture.py):
a reference torch ``Game2048Model`` state_dict (model.py:28-103, the
train.py:289 artifact) and an SB3 ResNetExtractor policy state_dict
(ppo_train.py:34-62, the .zip payload of ppo_train.py:185-186). The
conversion math is pure numpy, so these run without torch; only the
torch-file CLI paths are torch-gated.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from gym2048_tpu.models import ActorCritic, Game2048Model
from gym2048_tpu.models.resnet import boards_to_model_input
from gym2048_tpu.tools import convert_model as cm

FIX = Path(__file__).parent / "fixtures"


def _load_fixture(name):
    with np.load(FIX / name) as z:
        sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
        rest = {k: z[k] for k in z.files if not k.startswith("sd::")}
    return sd, rest


class TestGame2048Parity:
    def test_torch_to_flax_forward_parity(self):
        sd, rest = _load_fixture("interop_game2048.npz")
        variables, meta = cm.torch_to_flax_game2048(sd)
        assert meta == {
            "model": "Game2048Model", "filters": 8, "residual_blocks": 1
        }
        model = Game2048Model(filters=8, residual_blocks=1)
        probs = model.apply(
            variables, boards_to_model_input(rest["boards"]), train=False
        )
        np.testing.assert_allclose(
            np.asarray(probs), rest["expected_probs"], rtol=1e-5, atol=1e-6
        )

    def test_flax_to_torch_round_trip_identity(self):
        sd, _ = _load_fixture("interop_game2048.npz")
        variables, _ = cm.torch_to_flax_game2048(sd)
        back = cm.flax_to_torch_game2048(variables)
        for k, v in sd.items():
            if k.endswith("num_batches_tracked"):
                continue
            np.testing.assert_array_equal(v, back[k], err_msg=k)


class TestSB3Parity:
    def test_sb3_to_flax_forward_parity(self):
        sd, rest = _load_fixture("interop_sb3_policy.npz")
        variables, meta = cm.sb3_to_flax_actor_critic(sd)
        assert meta["model"] == "ActorCritic"
        model = ActorCritic(filters=8, residual_blocks=1)
        logits, value = model.apply(
            variables, boards_to_model_input(rest["boards"]), train=False
        )
        np.testing.assert_allclose(
            np.asarray(logits), rest["expected_logits"],
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(value), rest["expected_values"],
            rtol=1e-5, atol=1e-5,
        )

    def test_rejects_non_extractor_state_dict(self):
        with pytest.raises(KeyError):
            cm.sb3_to_flax_actor_critic({"foo.weight": np.zeros(3)})


class TestNpzRoundTrip:
    def test_npz_round_trip_bitexact(self, tmp_path):
        model = ActorCritic(filters=8, residual_blocks=1)
        variables = model.init(
            jax.random.PRNGKey(0),
            boards_to_model_input(np.zeros((2, 4, 4), np.int8)),
            train=False,
        )
        path = tmp_path / "m.npz"
        cm.save_npz(path, variables, {"model": "ActorCritic", "filters": 8})
        loaded, meta = cm.load_npz(path)
        assert meta == {"model": "ActorCritic", "filters": 8}
        flat_a = cm.flatten_variables(variables)
        flat_b = cm.flatten_variables(loaded)
        assert flat_a.keys() == flat_b.keys()
        for k in flat_a:
            np.testing.assert_array_equal(
                np.asarray(flat_a[k]), flat_b[k], err_msg=k
            )

    def test_cli_npz_to_pkl(self, tmp_path, capsys):
        from gym2048_tpu.utils.checkpoint import load_model

        sd, rest = _load_fixture("interop_game2048.npz")
        variables, meta = cm.torch_to_flax_game2048(sd)
        src = tmp_path / "m.npz"
        cm.save_npz(src, variables, meta)
        dst = tmp_path / "m.pkl"
        cm.main([str(src), str(dst)])
        assert "wrote" in capsys.readouterr().out
        loaded, meta2 = load_model(dst)
        assert meta2["model"] == "Game2048Model"
        model = Game2048Model(filters=8, residual_blocks=1)
        probs = model.apply(
            loaded, boards_to_model_input(rest["boards"]), train=False
        )
        np.testing.assert_allclose(
            np.asarray(probs), rest["expected_probs"], rtol=1e-5, atol=1e-6
        )


class TestTorchFiles:
    """File-format paths that need torch itself (present in this image;
    skipped cleanly where it isn't)."""

    @pytest.fixture(autouse=True)
    def torch(self):
        return pytest.importorskip("torch")

    def test_cli_pth_to_npz_and_back(self, tmp_path, torch):
        sd, rest = _load_fixture("interop_game2048.npz")
        pth = tmp_path / "ref.pth"
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)
        npz = tmp_path / "m.npz"
        cm.main([str(pth), str(npz)])
        variables, meta = cm.load_npz(npz)
        assert meta["filters"] == 8
        model = Game2048Model(filters=8, residual_blocks=1)
        probs = model.apply(
            variables, boards_to_model_input(rest["boards"]), train=False
        )
        np.testing.assert_allclose(
            np.asarray(probs), rest["expected_probs"], rtol=1e-5, atol=1e-6
        )
        # export back to a torch state_dict file and compare tensors
        pth2 = tmp_path / "back.pth"
        cm.main([str(npz), str(pth2)])
        back = torch.load(pth2, weights_only=True)
        for k, v in sd.items():
            if k.endswith("num_batches_tracked"):
                continue
            np.testing.assert_array_equal(v, back[k].numpy(), err_msg=k)

    def test_sb3_zip_import(self, tmp_path, torch):
        import io
        import zipfile

        sd, rest = _load_fixture("interop_sb3_policy.npz")
        buf = io.BytesIO()
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, buf)
        zpath = tmp_path / "ppo_model.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("policy.pth", buf.getvalue())
            z.writestr("data", "{}")
        loaded = cm.load_sb3_zip(zpath)
        variables, meta = cm.sb3_to_flax_actor_critic(loaded)
        model = ActorCritic(filters=8, residual_blocks=1)
        logits, value = model.apply(
            variables, boards_to_model_input(rest["boards"]), train=False
        )
        np.testing.assert_allclose(
            np.asarray(logits), rest["expected_logits"],
            rtol=1e-5, atol=1e-5,
        )
