"""Observability: profiler traces, NaN debugging, phase timers, metric logs.

The reference has none of this (SURVEY.md §5: tqdm prints only, plus a
globally-enabled torch anomaly detector that silently slows training,
reference: models/networks.py:2). Here everything is opt-in:

 - enable_nan_debug(): jax_debug_nans behind a flag (the reference's
   set_detect_anomaly analogue, without the always-on cost);
 - trace(path): jax.profiler trace context for TensorBoard/xprof;
 - PhaseTimer: wall-clock per phase (detection / ranking / fit / eval);
 - MetricLogger: JSONL metric stream per run.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


def enable_nan_debug(enable: bool = True) -> None:
    import jax
    jax.config.update('jax_debug_nans', enable)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with tensorboard/xprof."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


class PhaseTimer:
    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.time() - t0

    def summary(self) -> str:
        total = sum(self.phases.values())
        parts = [f'{k}={v:.1f}s' for k, v in self.phases.items()]
        return f'phases: {" ".join(parts)} total={total:.1f}s'


class MetricLogger:
    """Append-only JSONL metric stream (one object per event)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
            self._f = open(path, 'a')
        else:
            self._f = None

    def log(self, **event):
        event.setdefault('t', time.time())
        if self._f:
            self._f.write(json.dumps(event) + '\n')
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()
