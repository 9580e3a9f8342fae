"""Real multi-process jax.distributed tests.

The rest of the suite validates sharding on a single-process 8-virtual-
device CPU runtime; these tests spawn SEPARATE python processes that each
call ``jax.distributed.initialize`` (via ``parallel.init_distributed``) and
form one process-spanning mesh with cross-process Gloo collectives — the
actual multi-host runtime path (SURVEY.md §4; BASELINE.md's N>=2-hosts
measurement point). Asserts: every worker finishes, losses are finite, and
the replicated parameters/tables are BIT-IDENTICAL across processes after
one sharded update (data parallelism must keep replicas in lockstep).

No reference counterpart exists (the reference is single-process
everywhere, SURVEY.md §2) — this is the new framework's own first-class
component, tested at its own tier.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multiproc_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, tmp_path, ppo: bool, timeout: int = 600):
    port = _free_port()
    env = dict(os.environ)
    env["MP_WORKER_PPO"] = "1" if ppo else "0"
    # the workers configure their own platform/flags; scrub the parent
    # conftest's so they start clean
    env.pop("XLA_FLAGS", None)
    # `python worker.py` puts tests/ (not the repo root) on sys.path
    env["PYTHONPATH"] = ":".join(
        [str(WORKER.parent.parent)]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(nproc), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            if "distributed" in out and (
                "not supported" in out or "Unimplemented" in out
            ):
                pytest.skip(f"jax build lacks distributed support: {out}")
            pytest.fail(f"worker {i} failed (rc={p.returncode}):\n{out}")
    results = []
    for i in range(nproc):
        with open(tmp_path / f"out_{i}.json") as f:
            results.append(json.load(f))
    return results


class TestMultiProcess:
    def test_two_process_ppo_and_td(self, tmp_path):
        """2 processes x 2 devices: PPO iteration + TD chunk on a 4-device
        process-spanning mesh; replicas bit-identical."""
        results = _run_workers(2, tmp_path, ppo=True)
        assert len(results) == 2
        for r in results:
            assert r["n_devices"] == 4
            assert r["ppo_loss"] == r["ppo_loss"], "PPO loss is NaN"
            assert r["td_ep_score"] == r["td_ep_score"], "TD score is NaN"
        # the data-parallel layout must keep every replica bit-identical
        assert results[0]["ppo_params_md5"] == results[1]["ppo_params_md5"]
        assert results[0]["td_table_md5"] == results[1]["td_table_md5"]

    def test_four_process_td(self, tmp_path):
        """4 processes x 2 devices: TD chunk on an 8-device mesh (PPO
        skipped to bound compile time at 4-way CPU contention)."""
        results = _run_workers(4, tmp_path, ppo=False)
        assert len(results) == 4
        md5s = {r["td_table_md5"] for r in results}
        assert len(md5s) == 1, f"replicas diverged: {md5s}"
        for r in results:
            assert r["n_devices"] == 8
            assert r["td_ep_score"] == r["td_ep_score"]
