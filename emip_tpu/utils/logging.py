"""Observability: file logging + TensorBoard-compatible scalars + step timing.

Improves on the reference's logging (train.py:366-371 + tensorboardX
scalars) by adding first-class per-step timing — the reference had zero
profiling hooks (SURVEY.md §5). ``jax.profiler`` traces can be toggled with
``ScalarLogger.trace`` for TPU timeline capture.
"""

from __future__ import annotations

import json
import logging
import os
import time
from contextlib import contextmanager

__all__ = ["setup_logging", "ScalarLogger"]


def _process_index() -> int:
    """jax.process_index(), or 0 before/without a jax backend."""
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def setup_logging(save_path: str, filename: str = "train_log.log"):
    """Attach a file handler to the project logger.

    Note: ``logging.basicConfig`` would be a no-op here — importing jax
    installs absl handlers on the root logger first — so the handler is
    attached explicitly.
    """
    os.makedirs(save_path, exist_ok=True)
    logger = logging.getLogger("emip_tpu")
    logger.setLevel(logging.INFO)
    rank = _process_index()
    if rank:
        # one file per process: concurrent appends from several hosts to a
        # shared-filesystem file interleave mid-line
        base, ext = os.path.splitext(filename)
        filename = f"{base}.rank{rank}{ext}"
    target = os.path.abspath(os.path.join(save_path, filename))
    already = any(
        isinstance(h, logging.FileHandler)
        and getattr(h, "baseFilename", None) == target
        for h in logger.handlers
    )
    if not already:
        handler = logging.FileHandler(target, mode="a")
        handler.setFormatter(logging.Formatter(
            "[%(asctime)s-%(filename)s-%(levelname)s:%(message)s]",
            datefmt="%Y-%m-%d %I:%M:%S %p",
        ))
        logger.addHandler(handler)
    return logger


class ScalarLogger:
    """Scalar sink: TensorBoard events (when available) + JSONL fallback."""

    def __init__(self, save_path: str):
        os.makedirs(save_path, exist_ok=True)
        # process 0 only: every process computes identical metrics (eval
        # inputs are replicated), and concurrent writers on a shared
        # filesystem would interleave the JSONL / double-count TB events
        self._primary = _process_index() == 0
        self._jsonl = (
            open(os.path.join(save_path, "scalars.jsonl"), "a")
            if self._primary else None
        )
        self._tb = None
        if self._primary:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(save_path, "summary"))
            except ImportError:
                pass
        self._timers: dict[str, float] = {}

    def scalar(self, tag: str, value, step: int):
        if not self._primary:
            return
        value = float(value)
        self._jsonl.write(
            json.dumps(dict(tag=tag, value=value, step=int(step),
                            time=time.time()))
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def scalars(self, tag_values: dict, step: int):
        for tag, value in tag_values.items():
            self.scalar(tag, value, step)

    @contextmanager
    def timed(self, tag: str, step: int):
        """Wall-clock a block and record it as a scalar (seconds)."""
        t0 = time.perf_counter()
        yield
        self.scalar(tag, time.perf_counter() - t0, step)

    @contextmanager
    def trace(self, logdir: str):
        """Capture a jax.profiler trace around a block (TPU timeline)."""
        import jax

        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
