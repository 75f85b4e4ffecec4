"""Multi-image batched fits: one compiled program advancing B independent
per-image optimisations, sharded over the 'images' mesh axis.

This replaces the reference's outer bash loop over examples
(reference: run_completion.sh:1-14, one sequential process per image) with a
single SPMD program: parameters, optimiser state and per-image constants are
stacked on a leading batch axis, the per-image loss (models/trainer.py
build_loss_fn) is vmapped, and the batch axis is sharded across chips with
shard_map — each chip advances its shard of images; the only cross-chip
traffic is the mean-metric psum.

Images must share a shape bucket: same (H, W) after padding, same patch size,
same pool padding — `pad_to_bucket` handles that. Rendering shards the pixel
axis instead ('pixels'), the honest sequence-parallel axis of an INR.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.trainer import FitConsts, FitState, TaskSpec, build_loss_fn
from ..nn.embedder import TableEmbedder, TaskEmbedder, make_embedding_table


def stack_embedders(embedders: Sequence[TaskEmbedder]) -> TaskEmbedder:
    """Stack per-image proposal geometry on a leading batch axis. Static
    fields must agree across the batch; `res` (the coordinate-
    normalisation dims — each image's TIGHT loader canvas, NOT the shared
    bucket canvas, so a small image's embedding never depends on the
    bucket's largest image) becomes a dynamic (B, 2) array."""
    e0 = embedders[0]
    return e0._replace(
        angles=jnp.stack([e.angles for e in embedders]),
        periods=jnp.stack([e.periods for e in embedders]),
        res=jnp.stack([jnp.asarray(e.res, jnp.float32) for e in embedders]))


def stack_consts(consts: Sequence[FitConsts]) -> FitConsts:
    """Stack per-image FitConsts pytrees (shapes must already agree)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *consts)


def _embedder_batch_axes(embedder_b=None):
    """vmap in_axes spec: batch over angles/periods/res, broadcast the
    rest. A TableEmbedder batches only its (B, H*W, D) table."""
    if isinstance(embedder_b, TableEmbedder):
        return TableEmbedder(table=0, res=None, out_dim=None, top1_dim=None)
    return TaskEmbedder(freq_bands=None, angles=0, periods=0, res=0,
                        freq_scales=None, freq_offsets=None, angle_offsets=None,
                        out_dim=None, top1_dim=None)


def make_batched_table(embedder_b: TaskEmbedder, grid_hw: Tuple[int, int],
                       dtype=jnp.float32, chunk: int = 1 << 15
                       ) -> TableEmbedder:
    """Per-image embedding tables over the shared bucket canvas, stacked on
    the images axis: table (B, grid_h*grid_w, D). Each image's values keep
    ITS tight-canvas normalisation (embedder_b.res is the stacked (B, 2)
    tight dims); only the index space is the bucket (pool coordinates are
    integer bucket-canvas pixels after pad_to_canvas). Meant to be built
    INSIDE the jitted block."""
    def one(angles, periods, res):
        e = embedder_b._replace(angles=angles, periods=periods, res=res)
        return make_embedding_table(e, dtype, chunk=chunk,
                                    grid_hw=grid_hw).table

    tables = jax.vmap(one)(embedder_b.angles, embedder_b.periods,
                           embedder_b.res)
    return TableEmbedder(table=tables, res=(int(grid_hw[0]), int(grid_hw[1])),
                         out_dim=embedder_b.out_dim,
                         top1_dim=embedder_b.top1_dim)


def make_batched_fit_step(cfg, task: TaskSpec, model, percep, contextual,
                          style, tx, patch_num: int, patch_size: int,
                          mesh: Optional[Mesh] = None,
                          images_axis: str = 'images'):
    """Returns step(state, embedder_b, consts_b, rng) advancing all images.

    state leaves carry a leading batch axis B (divisible by the mesh axis
    size when a mesh is given).
    """
    from ..config import replace as _replace, resolve_robust_layout
    cfg = _replace(cfg, robust_layout=resolve_robust_layout(cfg, True))
    loss_fn = build_loss_fn(cfg, task, model, percep, contextual, style,
                            patch_num, patch_size)

    def single(params, opt_state, embedder, consts, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, embedder, consts, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics['loss'] = loss
        return params, opt_state, metrics

    def batched(state: FitState, embedder_b: TaskEmbedder,
                consts_b: FitConsts, rng):
        vstep = jax.vmap(single,
                         in_axes=(0, 0, _embedder_batch_axes(embedder_b),
                                  0, 0))
        n = jax.tree.leaves(state.params)[0].shape[0]
        # every image sees the SAME step key — exactly what the sequential
        # path does (each fit_image consumes the same PRNGKey(seed) chain);
        # per-image batches still differ because the pools differ. This
        # makes a batched fit match its sequential counterpart up to block
        # granularity instead of running a different rng stream.
        rngs = jnp.broadcast_to(rng, (n,) + rng.shape)
        params, opt_state, metrics = vstep(state.params, state.opt_state,
                                           embedder_b, consts_b, rngs)
        mean_metrics = {k: jnp.mean(v) for k, v in metrics.items()}
        return FitState(params, opt_state, state.step + 1), mean_metrics

    if mesh is None:
        return jax.jit(batched)

    # jit with explicit shardings: for a purely data-parallel step XLA
    # partitions the vmapped program along the constrained leading axis; the
    # metric means become cross-chip reductions over ICI.
    @jax.jit
    def run(state, embedder_b, consts_b, rng):
        spec_b = NamedSharding(mesh, P(images_axis))
        state = jax.lax.with_sharding_constraint(
            state, jax.tree.map(lambda _: spec_b, state))
        consts_b = jax.lax.with_sharding_constraint(
            consts_b, jax.tree.map(lambda _: spec_b, consts_b))
        return batched(state, embedder_b, consts_b, rng)

    return run


def make_batched_fit_block(cfg, task: TaskSpec, model, percep, contextual,
                           style, tx, patch_num: int, patch_size: int,
                           block: int, mesh: Optional[Mesh] = None,
                           images_axis: str = 'images',
                           grid_hw: Optional[Tuple[int, int]] = None):
    """`block` batched steps per device call via lax.scan — the multi-image
    analogue of trainer.make_fit_block. Essential behind a relay tunnel:
    per-call dispatch latency (~1s) otherwise dominates throughput.

    grid_hw: the bucket canvas dims; enables cfg.embed_table here (the
    per-image tables are built once per block inside the jit and gathered
    per step — same gating as trainer.make_fit_block: off under the warp
    field / tiny blocks)."""
    inner = make_batched_fit_step(cfg, task, model, percep, contextual, style,
                                  tx, patch_num, patch_size, mesh=None,
                                  images_axis=images_axis)

    from ..nn.warp import make_warp
    table_dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}.get(
        getattr(cfg, 'embed_table', ''))
    use_table = (table_dtype is not None and grid_hw is not None and
                 block >= 8 and make_warp(cfg) is None)

    def scan_block(state, embedder_b, consts_b, rng):
        if use_table:
            embedder_b = make_batched_table(embedder_b, grid_hw, table_dtype)
            if mesh is not None:
                # each chip materialises only its images' tables
                embedder_b = embedder_b._replace(
                    table=jax.lax.with_sharding_constraint(
                        embedder_b.table,
                        NamedSharding(mesh, P(images_axis))))
        keys = jax.random.split(rng, block)

        def body(st, k):
            st, metrics = inner(st, embedder_b, consts_b, k)
            return st, metrics

        state, metrics_seq = jax.lax.scan(body, state, keys)
        return state, jax.tree.map(lambda x: x[-1], metrics_seq)

    if mesh is None:
        return jax.jit(scan_block)

    @jax.jit
    def run(state, embedder_b, consts_b, rng):
        spec_b = NamedSharding(mesh, P(images_axis))
        state = jax.lax.with_sharding_constraint(
            state, jax.tree.map(lambda _: spec_b, state))
        consts_b = jax.lax.with_sharding_constraint(
            consts_b, jax.tree.map(lambda _: spec_b, consts_b))
        return scan_block(state, embedder_b, consts_b, rng)

    return run


def init_batched_state(cfg, task: TaskSpec, model, embedders, rng, percep,
                       style) -> Tuple[FitState, Any]:
    """Per-image init stacked on the batch axis. Every image gets the SAME
    init key — matching the sequential path, where every fit_image
    initialises from the same PRNGKey(cfg.seed) chain (models/pipeline.py).
    """
    from ..models.trainer import init_fit_state
    states = []
    tx = None
    for e in embedders:
        st, tx = init_fit_state(cfg, task, model, e, rng, percep, style)
        states.append(st)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return stacked, tx


def make_sharded_render(cfg, model, mesh: Mesh, pixels_axis: str = 'pixels',
                        chunk: int = 1 << 13):
    """Full-frame render with the coordinate axis sharded across devices —
    each chip renders its slice of pixels; the output gather is XLA's."""
    from ..models.trainer import apply_model
    from ..nn.mlp import render_activation
    from ..nn.warp import make_warp

    n_dev = mesh.shape[pixels_axis]
    warp = make_warp(cfg)

    @partial(jax.jit, static_argnames=('h', 'w'))
    def render_image(params, embedder, h: int, w: int):
        coords = jnp.stack(jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                                        indexing='ij'), -1).reshape(-1, 2)
        n = coords.shape[0]
        pad = (-n) % (n_dev * chunk)
        coords = jnp.pad(coords, ((0, pad), (0, 0))).astype(jnp.float32)
        coords = jax.lax.with_sharding_constraint(
            coords, NamedSharding(mesh, P(pixels_axis, None)))

        def body(c):
            raw = apply_model(model, params, embedder, c, warp=warp)
            return render_activation(raw, cfg.normalize_type)

        out = jax.lax.map(body, coords.reshape(-1, chunk, 2))
        return out.reshape(-1, 3)[:n].reshape(h, w, 3)

    return render_image
