"""TPU backend availability probe.

The shared-TPU pool can refuse or stall backend setup for many minutes
(observed: jax.devices() hanging >5 min, then UNAVAILABLE after ~30 min).
A failed in-process init is NOT retryable — jax caches the dead backend —
so probe in a fresh SUBPROCESS with a bounded timeout and retry with
backoff before the real process touches jax. The probe claims no pool
grant (trivial client init only). Call wait_for_backend() at the top of
any TPU entry point (bench.py, run_suite, the A/B and eval scripts do);
no reference equivalent (single-tenant GPU there).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time


def wait_for_backend(max_attempts: int = 8, probe_timeout: int = 300,
                     backoff_s: int = 30, log=None) -> bool:
    """Block until `jax.devices()` succeeds in a probe subprocess.

    Returns True once a probe succeeds; after max_attempts failures it
    returns False and lets the caller proceed (the real init then fails
    loudly rather than silently hanging forever). Skips probing entirely
    on CPU-only runs (JAX_PLATFORMS=cpu) — the host backend can't stall.
    """
    if os.environ.get('JAX_PLATFORMS', '').strip().lower() == 'cpu':
        return True
    log = log or (lambda m: print(m, file=sys.stderr, flush=True))
    for i in range(max_attempts):
        t0 = time.time()
        log(f'[backend] probe {i + 1}/{max_attempts} '
            f'(timeout {probe_timeout}s)')
        try:
            r = subprocess.run(
                [sys.executable, '-c', 'import jax; jax.devices()'],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                log(f'[backend] ready ({time.time() - t0:.1f}s)')
                return True
            err = r.stderr.decode(errors='replace').strip().splitlines()
            err = err[-1] if err else f'exit {r.returncode}'
        except subprocess.TimeoutExpired:
            err = f'probe timed out after {probe_timeout}s'
        log(f'[backend] unavailable: {err}')
        if i + 1 < max_attempts:
            time.sleep(backoff_s)
    log('[backend] giving up after max_attempts — proceeding; the real '
        'init will fail loudly if the pool is still down')
    return False
