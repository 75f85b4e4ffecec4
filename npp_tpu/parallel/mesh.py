"""Device mesh helpers.

The reference has no distributed execution at all (SURVEY.md §2.3: a vestigial
single-process nn.DataParallel branch, models/helpers.py:135-137). The
TPU-native scale-out axes for this workload are:

 - 'images': independent per-image fits, data-parallel across chips over ICI
   (replaces the run_*.sh sequential bash loop, reference: run_completion.sh);
 - 'pixels': the coordinate axis within one image for rendering/eval — the
   honest "sequence parallelism" of an INR (SURVEY.md §5).

All cross-device traffic is XLA collectives (metric psum, render all-gather);
there is no peer-to-peer state exchange because the fits are independent.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ('images',),
              shape: Optional[Tuple[int, ...]] = None,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def image_sharding(mesh: Mesh, axis: str = 'images') -> NamedSharding:
    """Leading-axis sharding for per-image stacked pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(tree, mesh: Mesh, axis: str = 'images'):
    """Place every leaf's leading axis across `axis` of the mesh."""
    sh = image_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
