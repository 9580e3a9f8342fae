"""Generate phased big-net TC-TD training jobs for scripts/tpu_runner.py.

The 4x6-layout TC run (67M weights) trains ~100M env-steps per ~10-minute
phase; phasing keeps every runner job short (other chip jobs can interleave
between phases) while the trainer state — including the TC accumulators
that a CLI --resume would lose — persists in the runner's shared namespace.

Usage:
    python scripts/tpu_bigtd_phases.py [n_phases] [queue_dir]
then watch <queue>/1??_bigtd_*.py.out and docs/curves/td_4x6_tc_run.jsonl.
"""

from __future__ import annotations

import sys
from pathlib import Path

N_PHASES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
QUEUE = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/tpujobs")

INIT = '''
"""Big-net TC-TD: build trainer + state (phase driver)."""
import json
import sys
import time

for _mod in list(sys.modules):
    if _mod.startswith("gym2048_tpu"):
        del sys.modules[_mod]

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from gym2048_tpu.train import td
from gym2048_tpu.agents import expectimax

assert jax.default_backend() == "tpu"

BIG_CFG = td.TDConfig(
    total_steps=0, n_envs=8192, chunk_steps=64, arch="4x6",
    tc=True, alpha=1.0, alpha_final=1.0, init_value=0.0, seed=7,
)
big_tr = td.TDTrainer(BIG_CFG)
big_state = big_tr.init_state()
big_steps = 0
big_t0 = time.time()
BIG_LOG = "/root/repo/docs/curves/td_4x6_tc_run.jsonl"
BIG_CKPT = "/root/repo/artifacts/ntuple_4x6_tc.pkl"


def big_phase(n_steps: int):
    """Train n_steps more; append a log line; save the checkpoint."""
    global big_state, big_steps
    per = BIG_CFG.n_envs * BIG_CFG.chunk_steps
    n_chunks = -(-n_steps // per)
    t0 = time.time()
    for c in range(n_chunks):
        big_state, metrics = big_tr.train_chunk(big_state, jnp.float32(1.0))
        if (c + 1) % 50 == 0 or c + 1 == n_chunks:
            m = {k: float(np.asarray(v)) for k, v in metrics.items()}
            big_steps_now = big_steps + (c + 1) * per
            line = {
                "steps": big_steps_now,
                "episodes": m["episodes"],
                "ep_score_mean": m["ep_score_mean"],
                "highest_tile_max": int(2 ** m["highest_exp"]),
                "alpha": 1.0,
                "wall": time.time() - big_t0,
            }
            with open(BIG_LOG, "a") as f:
                f.write(json.dumps(line) + chr(10))
            print(
                f"steps {line['steps']} ep_score "
                f"{line['ep_score_mean']:.0f} highest "
                f"{line['highest_tile_max']}"
            )
    big_steps += n_chunks * per
    rate = n_chunks * per / (time.time() - t0)
    print(f"phase done: {big_steps} total, {rate/1e3:.0f}k steps/s")
    from gym2048_tpu.utils.checkpoint import save_model
    import dataclasses
    save_model(
        BIG_CKPT, {"table": np.asarray(big_state["table"])},
        meta={"config": dataclasses.asdict(BIG_CFG), "steps": big_steps},
    )


def big_eval(episodes: int = 128, seed: int = 99, depth: int = 1):
    """Afterstate-search eval via the crash-safe chunked driver. The table
    travels as a jit ARGUMENT (parametrised policy) — closing over it
    embeds 268 MB of constants and the remote compile dies with HTTP 413."""
    pol = expectimax.make_afterstate_policy(
        big_tr._net.value_batch, depth=depth, parametrised=True,
    )
    res = expectimax.play_policy(
        pol, episodes, jax.random.PRNGKey(seed), move_cap=30000,
        chunk_moves=512 if depth == 1 else 64,
        params=big_state["table"],
    )
    import collections
    dist = collections.Counter(e["highest"] for e in res["Episodes"])
    print(json.dumps({
        "steps": big_steps,
        "Average score": res["Average score"],
        "Max score": res["Max score"],
        "Highest tile": res["Highest tile"],
        "tile_distribution": dict(sorted(dist.items())),
    }))
    return res
'''

PHASE = '''
"""Big-net TC-TD phase: +100M steps{eval_note}."""
big_phase(100_000_000)
{eval_call}
'''

QUEUE.mkdir(parents=True, exist_ok=True)
(QUEUE / "100_bigtd_init.py").write_text(INIT)
for i in range(1, N_PHASES + 1):
    do_eval = i % 3 == 0 or i == N_PHASES
    (QUEUE / f"{100 + i}_bigtd_phase{i:02d}.py").write_text(
        PHASE.format(
            eval_note=" + 128-game greedy eval" if do_eval else "",
            eval_call="big_eval(128)" if do_eval else "",
        )
    )
print(f"queued init + {N_PHASES} phases in {QUEUE}")
