"""Observability: TensorBoard scalars/images, profiling, timestamped stdout.

Capability parity with the reference's aux subsystems (SURVEY.md §5):
TensorBoard loss/points/iter-time scalars + eval image panels
(train.py:168-172, 269-319), per-iteration timing, `safe_state`-style
timestamped stdout, plus a TPU-native addition: `jax.profiler` trace
capture around a training window (`--profile_dir`).
"""
from __future__ import annotations

import sys
import time
from contextlib import contextmanager
from datetime import datetime
from typing import Optional


class TensorBoardLogger:
    """Thin optional wrapper over torch.utils.tensorboard."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(logdir)
        except Exception as e:  # tensorboard not installed
            print(f"Tensorboard not available: not logging progress ({e})")
            self.writer = None

    def scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)

    def image(self, tag: str, img, step: int):
        """img: [C,H,W] float in [0,1] (numpy)."""
        if self.writer is not None:
            import numpy as np
            self.writer.add_image(tag, np.clip(np.asarray(img), 0, 1), step)

    def close(self):
        if self.writer is not None:
            self.writer.close()


@contextmanager
def profile_trace(logdir: Optional[str]):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class IterTimer:
    """EMA iteration timer (the TPU analog of the CUDA-event iter_time)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._t = None

    def tic(self):
        self._t = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t
        self.ema = dt if self.ema is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema)
        return dt


def timestamp_stdout(silent: bool = False):
    """safe_state-style stdout wrapper (general_utils.py:112-128)."""
    old = sys.stdout

    class F:
        def write(self, x):
            if silent:
                return
            if x.endswith("\n"):
                old.write(x.replace(
                    "\n", f" [{datetime.now().strftime('%d/%m %H:%M:%S')}]\n"))
            else:
                old.write(x)

        def flush(self):
            old.flush()

    sys.stdout = F()
    return old
