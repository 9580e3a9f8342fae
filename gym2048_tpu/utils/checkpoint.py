"""Checkpoint / resume via Orbax.

The reference only ever *saves* (torch.save whole-model, SB3 .zip, periodic
CheckpointCallback — SURVEY.md §5) and never restores a training step. Here
checkpointing is full-fidelity: params, batch stats, optimiser state, env
RNG key and the update counter are saved together, so training resumes
in-place (same trajectory modulo device nondeterminism).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


class Checkpointer:
    """Thin wrapper over orbax-checkpoint with a step-indexed directory.

    Layout: ``<root>/<step>/`` per checkpoint; ``latest_step()`` finds the
    resume point. ``keep`` bounds retained checkpoints (oldest pruned).
    """

    def __init__(self, root: str | Path, keep: int = 5):
        self.root = Path(root).absolute()
        self.root.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, step: int, tree: Any) -> Path:
        path = self.root / str(step)
        self._ckpt.save(path, _to_host(tree), force=True)
        self._ckpt.wait_until_finished()
        self._prune()
        return path

    def restore(self, step: int | None = None, like: Any = None) -> Any:
        """Restore a checkpoint; ``like`` provides the pytree structure
        (required for typed restore; pass the freshly-initialised state)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.root}")
        path = self.root / str(step)
        if like is not None:
            return self._ckpt.restore(path, _to_host(like))
        return self._ckpt.restore(path)

    def latest_step(self) -> int | None:
        steps = [
            int(p.name) for p in self.root.iterdir()
            if p.is_dir() and p.name.isdigit()
        ]
        return max(steps) if steps else None

    def all_steps(self) -> list[int]:
        return sorted(
            int(p.name) for p in self.root.iterdir()
            if p.is_dir() and p.name.isdigit()
        )

    def _prune(self) -> None:
        import shutil

        steps = self.all_steps()
        for step in steps[: max(0, len(steps) - self.keep)]:
            shutil.rmtree(self.root / str(step), ignore_errors=True)


def save_model(path: str | Path, variables: Any, meta: dict | None = None):
    """One-shot model save (the torch.save-equivalent for inference use)."""
    import pickle

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"variables": _to_host(variables), "meta": meta or {}}, f)


def load_model(path: str | Path) -> tuple[Any, dict]:
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f)
    return blob["variables"], blob.get("meta", {})


def save_array_bf16(
    prefix: str | Path,
    arr,
    meta: dict | None = None,
    part_bytes: int = 90_000_000,
    delta_stages: int = 1,
) -> list[Path]:
    """Persist a large f32 array as commit-sized artifact files.

    The round-3 flagship table (268 MB f32, gitignored ``artifacts/``)
    was lost when its session ended; this is the durable alternative: the
    array is cast to bfloat16 (halving bytes; ~0.4% relative rounding —
    measured quality-neutral for value SELECTION, docs/PERF.md),
    zlib-compressed, and split into parts below ``part_bytes`` so each
    file stays well under git-hosting size limits. Writes
    ``<prefix>.meta.json`` + ``<prefix>.p00``, ``.p01``, ... and returns
    the paths.
    """
    import json
    import zlib

    import ml_dtypes

    prefix = Path(prefix)
    prefix.parent.mkdir(parents=True, exist_ok=True)
    a = np.asarray(arr)
    bf = a.astype(ml_dtypes.bfloat16)
    if delta_stages > 1:
        # multi-stage tables (arXiv:1604.05085) start as tiled copies of
        # one stage and only diverge where later stages are visited —
        # XORing stages k>0 against stage 0 bitwise (in bf16 space)
        # zeroes every untouched entry, which zlib then crushes
        u = bf.reshape(delta_stages, -1).view(np.uint16)
        u = np.concatenate([u[:1], u[1:] ^ u[:1]])
        raw = u.tobytes()
    else:
        raw = bf.tobytes()
    comp = zlib.compress(raw, level=6)
    parts = [
        comp[i: i + part_bytes] for i in range(0, len(comp), part_bytes)
    ] or [b""]
    paths = []
    for i, blob in enumerate(parts):
        p = prefix.with_name(prefix.name + f".p{i:02d}")
        p.write_bytes(blob)
        paths.append(p)
    header = {
        "format": "bf16_zlib_v1",
        "shape": list(a.shape),
        "source_dtype": str(a.dtype),
        "n_parts": len(parts),
        "raw_bytes": len(raw),
        "delta_stages": delta_stages,
        "meta": meta or {},
    }
    hp = prefix.with_name(prefix.name + ".meta.json")
    hp.write_text(json.dumps(header, indent=1))
    return [hp] + paths


def load_array_bf16(prefix: str | Path) -> tuple[Any, dict]:
    """Load a :func:`save_array_bf16` artifact -> ``(f32 ndarray, meta)``
    (values carry the bf16 rounding of the save)."""
    import json
    import zlib

    import ml_dtypes

    prefix = Path(prefix)
    header = json.loads(
        prefix.with_name(prefix.name + ".meta.json").read_text()
    )
    assert header["format"] == "bf16_zlib_v1", header
    comp = b"".join(
        prefix.with_name(prefix.name + f".p{i:02d}").read_bytes()
        for i in range(header["n_parts"])
    )
    raw = zlib.decompress(comp)
    assert len(raw) == header["raw_bytes"]
    n_stages = header.get("delta_stages", 1)
    if n_stages > 1:
        u = np.frombuffer(raw, dtype=np.uint16).reshape(n_stages, -1)
        u = np.concatenate([u[:1], u[1:] ^ u[:1]])  # XOR is its own inverse
        a = u.view(ml_dtypes.bfloat16).reshape(header["shape"])
    else:
        a = np.frombuffer(raw, dtype=ml_dtypes.bfloat16).reshape(
            header["shape"]
        )
    return a.astype(np.float32), header["meta"]
