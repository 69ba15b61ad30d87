"""Per-stage timing + device tracing.

TPU-native equivalent of the reference's ``TimeRecorder``
(reference: include/tools/time_recorder.h:14-25, src/tools/time_recorder.cpp:
10-33 — named clock checkpoints with a per-stage ms printout): a host-side
stage recorder that blocks on device results between stages, plus a thin
wrapper over ``jax.profiler`` for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax
import numpy as np

logger = logging.getLogger("tpu_pathopt")


class TimeRecorder:
    """Named wall-clock checkpoints (host side). Call ``record(name)`` before
    each stage and ``print_time()`` at the end, mirroring the reference API."""

    def __init__(self, title: str):
        self.title = title
        self._names: list[str] = []
        self._times: list[float] = []

    def record(self, name: str, block_on=None):
        """Start a named stage; optionally block on a device value first so
        the previous stage's async dispatch is actually finished.

        The barrier fetches one output leaf to the host (np.asarray) rather
        than relying on ``block_until_ready`` alone: on remote/tunneled
        backends the ready-event can resolve before the computation actually
        retires, which silently turns per-stage times into dispatch times."""
        if block_on is not None:
            jax.block_until_ready(block_on)
            leaves = jax.tree_util.tree_leaves(block_on)
            if leaves:
                np.asarray(leaves[0])
        self._names.append(name)
        self._times.append(time.perf_counter())

    def print_time(self):
        if len(self._times) < 2:
            return
        total = (self._times[-1] - self._times[0]) * 1e3
        lines = [f"[{self.title}] total {total:.2f} ms"]
        for i in range(len(self._times) - 1):
            dt = (self._times[i + 1] - self._times[i]) * 1e3
            lines.append(f"  {self._names[i]}: {dt:.2f} ms")
        msg = "\n".join(lines)
        logger.info(msg)
        return msg


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/tpu_pathopt_trace"):
    """XLA-level profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def stage(recorder: TimeRecorder | None, name: str):
    if recorder is not None:
        recorder.record(name)
    yield
