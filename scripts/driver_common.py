"""Shared helpers for the benchmark driver scripts.

Replaces the reference's `os.system` + GPUtil GPU-polling dispatcher
(scripts/nerf_eval.py:44-86) with a plain process pool: scenes are
embarrassingly parallel jobs; GAUSSMART_PARALLEL_JOBS controls concurrency
(defaults to 1 — one TPU chip).
"""
from __future__ import annotations

import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor


def sh(cmd: str) -> int:
    print(cmd, flush=True)
    return subprocess.call(cmd, shell=True)


def run_jobs(cmds, max_workers: int | None = None):
    max_workers = max_workers or int(os.environ.get("GAUSSMART_PARALLEL_JOBS", 1))
    if max_workers <= 1:
        for c in cmds:
            rc = sh(c)
            if rc != 0:
                print(f"[driver] job failed (rc={rc}): {c}", file=sys.stderr)
        return
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        for c, rc in zip(cmds, ex.map(sh, cmds)):
            if rc != 0:
                print(f"[driver] job failed (rc={rc}): {c}", file=sys.stderr)
