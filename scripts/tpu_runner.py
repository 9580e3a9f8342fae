"""Long-lived TPU job runner (development tool).

The remote TPU attach/claim can take minutes per process, so during
development we keep ONE python process attached and feed it work: drop
``NNN_name.py`` files into the queue dir and the runner execs them in a
shared globals namespace (so jax, compiled functions and arrays persist
between jobs), writing ``NNN_name.py.out`` next to them.

Usage:  python scripts/tpu_runner.py [queue_dir]
Stop:   touch <queue_dir>/STOP
"""

from __future__ import annotations

import contextlib
import io
import sys
import time
import traceback
from pathlib import Path

QUEUE = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpujobs")
QUEUE.mkdir(parents=True, exist_ok=True)


def main() -> None:
    import jax  # claim once

    shared: dict = {"jax": jax}
    print(f"[runner] ready, devices={jax.devices()}", flush=True)
    (QUEUE / "READY").write_text(str(time.time()))
    done: set[str] = set()
    while True:
        if (QUEUE / "STOP").exists():
            print("[runner] STOP", flush=True)
            return
        jobs = sorted(
            p for p in QUEUE.glob("*.py")
            if p.name not in done and not (QUEUE / (p.name + ".out")).exists()
        )
        for job in jobs:
            out_path = QUEUE / (job.name + ".out")
            buf = io.StringIO()
            t0 = time.time()
            status = "OK"
            try:
                code = compile(job.read_text(), str(job), "exec")
                with contextlib.redirect_stdout(buf), \
                        contextlib.redirect_stderr(buf):
                    exec(code, shared)
            except BaseException:
                status = "ERROR"
                buf.write(traceback.format_exc())
            dt = time.time() - t0
            out_path.write_text(
                f"# status={status} wall={dt:.2f}s\n" + buf.getvalue()
            )
            done.add(job.name)
            print(f"[runner] {job.name}: {status} ({dt:.1f}s)", flush=True)
        time.sleep(0.3)


if __name__ == "__main__":
    main()
