#!/usr/bin/env python
"""Persistent TPU job server for interactive development.

The axon TPU tunnel costs ~7 minutes of device init per process, which
makes one-shot scripts unusable for iteration. This server imports jax
once, then polls a queue directory for *.py job files, execs each in a
shared namespace (so state persists between jobs), and writes
stdout+traceback to <job>.out with a trailing status line.

Usage:  python tools/tpu_server.py /tmp/tpuq &
Submit: write code to /tmp/tpuq/NNN_name.py  (atomic rename into place)
Result: /tmp/tpuq/NNN_name.out appears when done ("=== OK ===" or
        "=== ERROR ===" last line).
"""

import io
import contextlib
import pathlib
import sys
import time
import traceback


def main():
    qdir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuq")
    qdir.mkdir(exist_ok=True)
    (qdir / "server.pid").write_text(str(__import__("os").getpid()))

    t0 = time.time()
    import jax  # device init happens here, once

    # Share the package's persistent compile cache (heif_tpu/__init__.py)
    # so server jobs and standalone runs reuse each other's kernels.
    import heif_tpu  # noqa: F401  (configures jax_compilation_cache_dir)

    devs = jax.devices()
    (qdir / "server.ready").write_text(
        f"init {time.time() - t0:.1f}s devices={devs}\n"
    )
    ns = {"jax": jax}
    seen = set()
    while True:
        stop = qdir / "server.stop"
        if stop.exists():
            stop.unlink()
            break
        jobs = sorted(p for p in qdir.glob("*.py") if p.name not in seen)
        for job in jobs:
            seen.add(job.name)
            out = io.StringIO()
            status = "OK"
            t0 = time.time()
            try:
                code = compile(job.read_text(), str(job), "exec")
                with contextlib.redirect_stdout(out), contextlib.redirect_stderr(out):
                    exec(code, ns)
            except BaseException:
                out.write(traceback.format_exc())
                status = "ERROR"
            out.write(f"\n=== {status} ({time.time() - t0:.1f}s) ===\n")
            job.with_suffix(".out").write_text(out.getvalue())
        time.sleep(0.5)


if __name__ == "__main__":
    main()
