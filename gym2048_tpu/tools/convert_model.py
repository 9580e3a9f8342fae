"""Model-weight interop: flax ``.pkl``/``.npz`` <-> reference torch / SB3.

Closes PARITY.md deviation 2 (cross-framework model files). The reference
persists weights two ways:

* ``torch.save(model, path)`` — the whole pickled ``Game2048Model``
  (reference train.py:289);
* SB3 ``model.save(path)`` — a ``.zip`` whose ``policy.pth`` holds the
  policy state_dict (reference ppo_train.py:185-186, extractor layout
  ppo_train.py:34-62).

This tool maps those to this framework's flax variables and back. All the
tensor math is pure numpy on plain arrays, so the ``.npz`` path works
without torch; torch is imported only to *read/write torch files* and the
import is deferred (the CLI degrades with a clear error when torch is
absent).

Layout mapping (documented here because it IS the interop contract):

========================  =======================================
torch (reference)          flax (this framework)
========================  =======================================
Conv2d.weight (O,I,kH,kW)  Conv.kernel (kH,kW,I,O)
BatchNorm2d.weight/.bias   BatchNorm.scale/.bias   (collection params)
 .running_mean/_var         BatchNorm.mean/.var    (collection batch_stats)
Linear.weight (out,in)     Dense.kernel (in,out)
========================  =======================================

plus ONE semantic difference: torch flattens NCHW activations
channel-major (feature index ``c*16 + h*4 + w``) while this framework
flattens NHWC channel-minor (``(h*4 + w)*C + c``), so every Linear that
consumes flattened conv features has its input dimension permuted during
conversion (see ``_permute_fc_in``). Outputs of converted models match the
torch originals to float32 roundoff (recorded-fixture test:
tests/test_interop.py, fixture generator scripts/gen_interop_fixture.py).

flax module paths (collections ``params`` / ``batch_stats``):

* ``Game2048Model``: ``trunk/Conv_0``, ``trunk/BatchNorm_0``,
  ``trunk/ResidualBlock_{i}/{Conv_0,BatchNorm_0,Conv_1,BatchNorm_1}``,
  ``policy_conv``, ``policy_bn``, ``policy_fc``.
* ``ActorCritic``: ``_Trunk_0/...`` (same trunk layout), ``policy_head``,
  ``value_head``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

# ------------------------------------------------------------------ flat io

_META_KEY = "__meta__"


def flatten_variables(variables) -> dict[str, np.ndarray]:
    """Nested flax variables -> flat ``{'params/trunk/Conv_0/kernel': arr}``."""
    out: dict[str, np.ndarray] = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            out[prefix] = np.asarray(node)

    walk("", variables)
    return out


def unflatten_variables(flat: dict[str, np.ndarray]):
    """Inverse of :func:`flatten_variables`."""
    root: dict = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(arr)
    return root


def save_npz(path, variables, meta: dict | None = None) -> None:
    """Write flax variables (+ JSON meta) to a flat ``.npz`` archive."""
    flat = flatten_variables(variables)
    flat[_META_KEY] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez(path, **flat)


def load_npz(path):
    """Read a :func:`save_npz` archive -> ``(variables, meta)``."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files if k != _META_KEY}
        meta = (
            json.loads(bytes(z[_META_KEY]).decode())
            if _META_KEY in z.files else {}
        )
    return unflatten_variables(flat), meta


# --------------------------------------------------------- tensor permutes

def _conv_w(t: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O,I,kH,kW) -> flax Conv kernel (kH,kW,I,O)."""
    return np.ascontiguousarray(np.transpose(t, (2, 3, 1, 0)))


def _conv_w_inv(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))


def _permute_fc_in(w: np.ndarray, channels: int, pixels: int) -> np.ndarray:
    """torch Linear weight (out, C*P) over channel-major flattened NCHW
    features -> flax Dense kernel (P*C, out) over channel-minor NHWC."""
    out = w.shape[0]
    w = w.reshape(out, channels, pixels)          # (out, c, p)
    w = np.transpose(w, (2, 1, 0))                # (p, c, out)
    return np.ascontiguousarray(w.reshape(pixels * channels, out))


def _permute_fc_in_inv(k: np.ndarray, channels: int, pixels: int
                       ) -> np.ndarray:
    out = k.shape[1]
    k = k.reshape(pixels, channels, out)
    k = np.transpose(k, (2, 1, 0))                # (out, c, p)
    return np.ascontiguousarray(k.reshape(out, channels * pixels))


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def _bn_inv(params, stats, out, prefix):
    out[f"{prefix}.weight"] = np.asarray(params["scale"])
    out[f"{prefix}.bias"] = np.asarray(params["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(stats["mean"])
    out[f"{prefix}.running_var"] = np.asarray(stats["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _trunk_from_torch(sd, conv0, bn0, block):
    """Map a reference residual trunk to flax dicts.

    ``conv0``/``bn0`` name the initial layers; ``block(i)`` returns the
    torch prefix of residual block ``i`` (naming differs between
    model.py:55-61 and the SB3 Sequential, ppo_train.py:51-58).
    """
    params = {"Conv_0": {"kernel": _conv_w(sd[f"{conv0}.weight"])}}
    bnp, bns = _bn(sd, bn0)
    params["BatchNorm_0"] = bnp
    stats = {"BatchNorm_0": bns}
    i = 0
    while f"{block(i)}.conv1.weight" in sd:
        bp: dict = {}
        bs: dict = {}
        for j, (cv, bn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
            bp[f"Conv_{j}"] = {
                "kernel": _conv_w(sd[f"{block(i)}.{cv}.weight"])
            }
            p, s = _bn(sd, f"{block(i)}.{bn}")
            bp[f"BatchNorm_{j}"] = p
            bs[f"BatchNorm_{j}"] = s
        params[f"ResidualBlock_{i}"] = bp
        stats[f"ResidualBlock_{i}"] = bs
        i += 1
    return params, stats, i


def _trunk_to_torch(params, stats, out, conv0, bn0, block):
    out[f"{conv0}.weight"] = _conv_w_inv(params["Conv_0"]["kernel"])
    _bn_inv(params["BatchNorm_0"], stats["BatchNorm_0"], out, bn0)
    i = 0
    while f"ResidualBlock_{i}" in params:
        bp, bs = params[f"ResidualBlock_{i}"], stats[f"ResidualBlock_{i}"]
        for j, (cv, bn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
            out[f"{block(i)}.{cv}.weight"] = _conv_w_inv(
                bp[f"Conv_{j}"]["kernel"]
            )
            _bn_inv(bp[f"BatchNorm_{j}"], bs[f"BatchNorm_{j}"], out,
                    f"{block(i)}.{bn}")
        i += 1


# ------------------------------------------------- Game2048Model <-> torch

def torch_to_flax_game2048(sd: dict[str, np.ndarray]):
    """Reference ``Game2048Model.state_dict()`` (as numpy arrays) -> flax
    variables ``{'params': ..., 'batch_stats': ...}`` + inferred config."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    trunk_p, trunk_s, blocks = _trunk_from_torch(
        sd, "initial_conv", "initial_bn", lambda i: f"res_blocks.{i}"
    )
    pc = sd["policy_conv.weight"]                 # (2, F, 1, 1)
    pbn_p, pbn_s = _bn(sd, "policy_bn")
    head_ch, pixels = pc.shape[0], 16
    params = {
        "trunk": trunk_p,
        "policy_conv": {"kernel": _conv_w(pc)},
        "policy_bn": pbn_p,
        "policy_fc": {
            "kernel": _permute_fc_in(
                sd["policy_fc.weight"], head_ch, pixels
            ),
            "bias": np.asarray(sd["policy_fc.bias"]),
        },
    }
    stats = {"trunk": trunk_s, "policy_bn": pbn_s}
    meta = {
        "model": "Game2048Model",
        "filters": int(pc.shape[1]),
        "residual_blocks": blocks,
    }
    return {"params": params, "batch_stats": stats}, meta


def flax_to_torch_game2048(variables) -> dict[str, np.ndarray]:
    """Inverse: flax Game2048Model variables -> reference state_dict arrays
    (wrap in ``torch.from_numpy`` to load into the torch model)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out: dict[str, np.ndarray] = {}
    _trunk_to_torch(params["trunk"], stats["trunk"], out,
                    "initial_conv", "initial_bn",
                    lambda i: f"res_blocks.{i}")
    out["policy_conv.weight"] = _conv_w_inv(params["policy_conv"]["kernel"])
    _bn_inv(params["policy_bn"], stats["policy_bn"], out, "policy_bn")
    head_ch = out["policy_conv.weight"].shape[0]
    out["policy_fc.weight"] = _permute_fc_in_inv(
        params["policy_fc"]["kernel"], head_ch, 16
    )
    out["policy_fc.bias"] = np.asarray(params["policy_fc"]["bias"])
    return out


# --------------------------------------------------- ActorCritic <-> SB3

def sb3_to_flax_actor_critic(sd: dict[str, np.ndarray]):
    """SB3 policy state_dict arrays (CnnPolicy + ResNetExtractor,
    ppo_train.py:34-62 with ``net_arch=[]``) -> flax ActorCritic variables.

    The Sequential indices: 0 conv, 1 bn, 2 relu, 3..3+R-1 residual
    blocks; ``features_extractor`` is preferred, ``pi_features_extractor``
    accepted (SB3 saves per-head aliases when the extractor is shared).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    for fe in ("features_extractor", "pi_features_extractor"):
        if f"{fe}.trunk.0.weight" in sd:
            break
    else:
        raise KeyError(
            "no features_extractor.trunk.0.weight in state_dict — not an "
            "SB3 ResNetExtractor policy"
        )
    trunk_p, trunk_s, blocks = _trunk_from_torch(
        sd, f"{fe}.trunk.0", f"{fe}.trunk.1",
        lambda i: f"{fe}.trunk.{3 + i}",
    )
    filters = trunk_p["Conv_0"]["kernel"].shape[-1]
    params = {
        "_Trunk_0": trunk_p,
        "policy_head": {
            "kernel": _permute_fc_in(sd["action_net.weight"], filters, 16),
            "bias": np.asarray(sd["action_net.bias"]),
        },
        "value_head": {
            "kernel": _permute_fc_in(sd["value_net.weight"], filters, 16),
            "bias": np.asarray(sd["value_net.bias"]),
        },
    }
    meta = {
        "model": "ActorCritic",
        "filters": int(filters),
        "residual_blocks": blocks,
    }
    return {"params": params, "batch_stats": {"_Trunk_0": trunk_s}}, meta


# ----------------------------------------------------------- file loaders

def _require_torch():
    try:
        import torch  # noqa: F401

        return torch
    except ImportError as e:  # pragma: no cover - torch present in CI image
        raise SystemExit(
            "reading/writing torch files requires torch, which is not "
            "installed; .pkl/.npz conversions work without it"
        ) from e


def load_torch_file(path) -> dict[str, np.ndarray]:
    """``torch.load`` a ``.pth``/``.pt`` file -> numpy state_dict.

    Accepts a plain state_dict or a whole pickled module (the reference's
    train.py:289 saves the module — unpickling that form additionally
    needs the original model class importable, e.g. the reference repo on
    PYTHONPATH)."""
    torch = _require_torch()
    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        blob = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in blob.items()}


def load_sb3_zip(path) -> dict[str, np.ndarray]:
    """Extract the policy state_dict from an SB3 ``.zip`` save."""
    import io
    import zipfile

    torch = _require_torch()
    with zipfile.ZipFile(path) as z:
        name = next(
            (n for n in z.namelist() if n.endswith("policy.pth")), None
        )
        if name is None:
            raise SystemExit(
                f"{path}: no policy.pth inside — not an SB3 model zip "
                f"(contains {z.namelist()})"
            )
        with z.open(name) as f:
            buf = io.BytesIO(f.read())
    try:
        sd = torch.load(buf, map_location="cpu", weights_only=True)
    except Exception:
        buf.seek(0)
        sd = torch.load(buf, map_location="cpu", weights_only=False)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def save_torch_file(path, variables, meta) -> None:
    """Export flax Game2048Model variables as a torch state_dict file the
    reference's ``model.load_state_dict`` accepts."""
    torch = _require_torch()
    if meta.get("model") == "ActorCritic":
        raise SystemExit(
            "torch export implemented for Game2048Model (the reference's "
            "only torch-file model); export ActorCritic to .npz instead"
        )
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in flax_to_torch_game2048(variables).items()
    }
    torch.save(sd, path)


# ------------------------------------------------------------------- CLI

def main(argv=None) -> None:
    import argparse

    from gym2048_tpu.utils.checkpoint import load_model, save_model

    p = argparse.ArgumentParser(
        description="Convert model weights between this framework "
        "(.pkl/.npz) and the reference's torch (.pth/.pt) / SB3 (.zip) "
        "formats; direction and format follow the file extensions."
    )
    p.add_argument("input", help=".pkl | .npz | .pth/.pt | .zip")
    p.add_argument("output", help=".pkl | .npz | .pth/.pt")
    args = p.parse_args(argv)

    src, dst = Path(args.input), Path(args.output)
    s_ext, d_ext = src.suffix.lower(), dst.suffix.lower()

    if s_ext == ".pkl":
        variables, meta = load_model(src)
    elif s_ext == ".npz":
        variables, meta = load_npz(src)
    elif s_ext in (".pth", ".pt"):
        variables, meta = torch_to_flax_game2048(load_torch_file(src))
    elif s_ext == ".zip":
        variables, meta = sb3_to_flax_actor_critic(load_sb3_zip(src))
    else:
        raise SystemExit(f"unsupported input format: {src}")

    if d_ext == ".pkl":
        save_model(dst, variables, meta=meta)
    elif d_ext == ".npz":
        save_npz(dst, variables, meta)
    elif d_ext in (".pth", ".pt"):
        save_torch_file(dst, variables, meta)
    else:
        raise SystemExit(f"unsupported output format: {dst}")
    print(f"wrote {dst} (meta: {json.dumps(meta)})")


if __name__ == "__main__":
    main()
