"""Checkpoint / resume for per-image fits.

The reference threads `start`/`global_step` through its factories as if
resume existed but never saves anything (SURVEY.md §5; reference:
models/helpers.py:166-175) — the only durable artefact is the odgt proposal
record. Here the full FitState (params incl. adaptive-loss latents, optimiser
state, step counter) round-trips through orbax, so an interrupted fit resumes
exactly; the odgt record remains the inter-stage checkpoint for proposals.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_fit_state(path: str, state) -> None:
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.tree.map(np.asarray, state), force=True)


def restore_fit_state(path: str, like) -> Any:
    """Restore into the structure of `like` (an abstract or concrete
    FitState pytree)."""
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path, item=jax.tree.map(np.asarray, like))
    return jax.tree.map(lambda r, l: jax.numpy.asarray(r, l.dtype)
                        if hasattr(l, 'dtype') else r, restored, like)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.startswith('step_')]
    if not steps:
        return None
    best = max(steps, key=lambda d: int(d.split('_')[1]))
    return os.path.join(ckpt_dir, best)
