"""Generate phased big-net TC-TD training jobs for scripts/tpu_runner.py.

The 4x6-layout TC run (67M weights) trains ~100M env-steps per phase;
phasing keeps every runner job short (other chip jobs can interleave
between phases). Durability (round-3 lesson: the flagship table died with
the session): every phase ends with a FULL train-state checkpoint
(td.save_train_state — table, TC accumulators, env batch, RNG key, chunk
counter) and each phase RESUMES FROM THE CHECKPOINT FILE, never from the
runner's shared namespace, so a worker crash or runner restart loses at
most one phase.

Durability limitation: the train-state checkpoints live in gitignored
``artifacts/`` (multi-GB with TC accumulators — too big to commit), so a
full SESSION wipe mid-run still loses the in-progress run; only finished
tables persisted to docs/curves/ via ``checkpoint.save_array_bf16``
survive. Persist (and commit) a bf16 table snapshot between phases if a
run must survive a session boundary.

Usage:
    python scripts/tpu_bigtd_phases.py [n_phases] [queue_dir] [thresholds]
then watch <queue>/1??_bigtd_*.py.out and docs/curves/td_4x6_tc_run.jsonl.
``thresholds`` (comma-separated max-tile exponents, e.g. ``11,12``) builds
the multi-stage variant (arXiv:1604.05085) with its own log/ckpt names.
"""

from __future__ import annotations

import sys
from pathlib import Path

N_PHASES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
QUEUE = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/tpujobs")
THRESHOLDS = tuple(
    int(t) for t in sys.argv[3].split(",") if t
) if len(sys.argv) > 3 else ()
# r4: distinct tag per generation — the round-3 curve file is a committed
# artifact and must never be appended to by a new run
TAG = "td_4x6_tc_r4" + ("_staged" if THRESHOLDS else "")

PHASE = '''
"""Big-net TC-TD phase {i}/{n}: +{steps} steps{eval_note} ({tag})."""
import dataclasses
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

assert jax.default_backend() == "tpu"

CFG = td.TDConfig(
    total_steps={total_steps}, n_envs=8192, chunk_steps=64, arch="4x6",
    tc=True, alpha=1.0, alpha_final=1.0, init_value=0.0, seed=7,
    thresholds={thresholds},
)
CKPT = "/root/repo/artifacts/{tag}_state.pkl"
LOG = "/root/repo/docs/curves/{tag}_run.jsonl"
PER_CHUNK = CFG.n_envs * CFG.chunk_steps

tr = td.TDTrainer(CFG)
import os
if os.path.exists(CKPT):
    state, meta = td.load_train_state(CKPT)
    start = meta["chunks_done"]
    print(f"resumed at chunk {{start}} ({{start * PER_CHUNK}} steps)")
else:
    state = tr.init_state()
    start = 0
    print("fresh start")

t0 = time.time()


def log_fn(msg):
    print(msg, flush=True)


history_steps = start * PER_CHUNK
state, history = tr.learn(
    state, log_every=50, log_fn=log_fn, ckpt_path=CKPT, ckpt_every=50,
    start_chunk=start, max_chunks={phase_chunks},
)
with open(LOG, "a") as f:
    for e in history:
        f.write(json.dumps(dataclasses.asdict(e)) + chr(10))
steps_done = history[-1].steps if history else history_steps
rate = (steps_done - history_steps) / max(time.time() - t0, 1e-9)
print(f"phase done: {{steps_done}} total, {{rate / 1e3:.0f}}k steps/s")
{eval_code}
'''

EVAL = '''
from gym2048_tpu.agents import expectimax

pol = expectimax.make_afterstate_policy(
    lambda t, bs: tr._net.value_batch(t, bs), depth=1, parametrised=True,
)
res = expectimax.play_policy(
    pol, 128, jax.random.PRNGKey(99), move_cap=30000, chunk_moves=512,
    params=state["table"],
)
import collections
dist = collections.Counter(e["highest"] for e in res["Episodes"])
print(json.dumps({
    "steps": steps_done,
    "Average score": res["Average score"],
    "Max score": res["Max score"],
    "Highest tile": res["Highest tile"],
    "tile_distribution": dict(sorted(dist.items())),
}))
'''

QUEUE.mkdir(parents=True, exist_ok=True)
Path("/root/repo/artifacts").mkdir(exist_ok=True)
PHASE_STEPS = 100_000_000
PHASE_CHUNKS = -(-PHASE_STEPS // (8192 * 64))
for i in range(1, N_PHASES + 1):
    do_eval = i % 3 == 0 or i == N_PHASES
    (QUEUE / f"{100 + i}_bigtd_phase{i:02d}.py").write_text(
        PHASE.format(
            i=i, n=N_PHASES, steps=PHASE_STEPS, tag=TAG,
            total_steps=PHASE_STEPS * N_PHASES,
            thresholds=repr(THRESHOLDS),
            phase_chunks=PHASE_CHUNKS,
            eval_note=" + 128-game greedy eval" if do_eval else "",
            eval_code=EVAL if do_eval else "",
        )
    )
print(f"queued {N_PHASES} phases ({TAG}) in {QUEUE}")
