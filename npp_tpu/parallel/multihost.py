"""Multi-host initialisation for pod-scale sweeps.

Per-image fits are independent, so multi-host scaling is pure data
parallelism over DCN: each host process joins via jax.distributed, builds the
global 'images' mesh, and `fit_images` shards its bucket batches across every
chip in the slice. No custom transport is needed — the only cross-device
traffic is metric reduction (SURVEY.md §2.3/§5).
"""
from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). No-op when
    single-process (num_processes in (None, 1) and no coordinator)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        'COORDINATOR_ADDRESS')
    if num_processes is None:
        num_processes = int(os.environ.get('NUM_PROCESSES', '1'))
    if process_id is None:
        process_id = int(os.environ.get('PROCESS_ID', '0'))
    if coordinator_address is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_examples(examples, process_id: Optional[int] = None,
                   num_processes: Optional[int] = None):
    """Static round-robin assignment of examples to host processes (for
    per-host preprocessing before the global-mesh fit)."""
    import jax
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [e for i, e in enumerate(examples) if i % n == pid]
