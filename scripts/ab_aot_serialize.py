"""A/B: can the relay-backed TPU serialize/deserialize compiled executables
(jax.experimental.serialize_executable), and does loading one beat a cold
compile? (VERDICT round-2 next #6: a fresh session pays 2-7 min per program;
the persistent jax compile cache is unusable on the relay — CLAUDE.md.)

Modes (each a separate process so 'load' is a true cold session):
  tiny  — 512x512 matmul: compile, serialize, deserialize in-process, verify.
          Cheap probe for relay support before risking the big program.
  save  — build the flagship fit-block (bench.py shapes), lower+compile
          (timed), serialize to --path (timed; payload size reported).
  load  — fresh process: read --path, deserialize_and_load (timed), run one
          block (timed). Time-to-first-block = deserialize + first run.
  cold  — control: fresh process, normal jit compile, time-to-first-block.

Every measurement prints to stderr immediately (relay rule: no
silent-looking long jobs). Run each mode under `timeout`: the known failure
mode of big payloads through the tunnel is a wedge, not an error.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(**kv):
    print(json.dumps(kv), file=sys.stderr, flush=True)


def mode_tiny():
    import jax
    import jax.numpy as jnp
    from jax.experimental import serialize_executable as se

    x = jnp.ones((512, 512), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a + 1.0)
    t0 = time.time()
    compiled = f.lower(x).compile()
    log(stage='tiny_compile_s', t=round(time.time() - t0, 2))
    t0 = time.time()
    payload, in_tree, out_tree = se.serialize(compiled)
    log(stage='tiny_serialize', t=round(time.time() - t0, 2),
        bytes=len(payload))
    t0 = time.time()
    loaded = se.deserialize_and_load(payload, in_tree, out_tree)
    log(stage='tiny_deserialize_s', t=round(time.time() - t0, 2))
    import numpy as np
    ref = np.asarray(compiled(x))
    got = np.asarray(loaded(x))
    assert np.allclose(ref, got), 'deserialized executable output mismatch'
    log(stage='tiny_ok', match=True)


def _build_block():
    """Flagship fit-block + example args, exactly bench.py's configuration."""
    import bench  # repo-root bench.py
    import jax
    from npp_tpu.config import CompletionConfig
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.pipeline import build_components, make_fit_consts
    from npp_tpu.models.trainer import init_fit_state, make_fit_block

    cfg = CompletionConfig()
    data = bench._synthetic_data(cfg)
    comps = build_components(cfg, data, COMPLETION_TASK)
    state, tx = init_fit_state(cfg, COMPLETION_TASK, comps.model,
                               comps.embedder, jax.random.PRNGKey(0),
                               comps.percep, comps.style)
    consts = make_fit_consts(cfg, COMPLETION_TASK, data, bench.PATCH_SIZE)
    run_block = make_fit_block(cfg, COMPLETION_TASK, comps.model,
                               comps.embedder, consts, comps.percep,
                               comps.contextual, comps.style, tx,
                               bench.PATCH_NUM, bench.PATCH_SIZE, bench.BLOCK)
    return run_block, state, jax.random.PRNGKey(1)


def mode_save(path: str):
    import jax
    from jax.experimental import serialize_executable as se

    run_block, state, rng = _build_block()
    t0 = time.time()
    lowered = run_block.lower(state, rng)
    log(stage='lower_s', t=round(time.time() - t0, 2))
    t0 = time.time()
    compiled = lowered.compile()
    log(stage='compile_s', t=round(time.time() - t0, 2))
    t0 = time.time()
    payload, in_tree, out_tree = se.serialize(compiled)
    log(stage='serialize_s', t=round(time.time() - t0, 2),
        bytes=len(payload))
    with open(path, 'wb') as f:
        pickle.dump((payload, in_tree, out_tree), f)
    # sanity: the compiled object still runs
    t0 = time.time()
    state2, _ = compiled(state, rng)
    jax.block_until_ready(state2.params)
    log(stage='compiled_first_block_s', t=round(time.time() - t0, 2))


def mode_load(path: str):
    import jax
    from jax.experimental import serialize_executable as se

    t_all = time.time()
    run_block, state, rng = _build_block()
    log(stage='host_build_s', t=round(time.time() - t_all, 2))
    with open(path, 'rb') as f:
        payload, in_tree, out_tree = pickle.load(f)
    t0 = time.time()
    loaded = se.deserialize_and_load(payload, in_tree, out_tree)
    log(stage='deserialize_s', t=round(time.time() - t0, 2))
    t0 = time.time()
    state2, metrics = loaded(state, rng)
    jax.block_until_ready(state2.params)
    log(stage='first_block_s', t=round(time.time() - t0, 2))
    log(stage='time_to_first_block_s', t=round(time.time() - t_all, 2),
        loss=float(metrics['loss']) if 'loss' in metrics else None)


def mode_cold():
    import jax

    t_all = time.time()
    run_block, state, rng = _build_block()
    log(stage='host_build_s', t=round(time.time() - t_all, 2))
    t0 = time.time()
    state2, metrics = run_block(state, rng)
    jax.block_until_ready(state2.params)
    log(stage='compile_plus_first_block_s', t=round(time.time() - t0, 2))
    log(stage='time_to_first_block_s', t=round(time.time() - t_all, 2),
        loss=float(metrics['loss']) if 'loss' in metrics else None)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', required=True,
                    choices=['tiny', 'save', 'load', 'cold'])
    ap.add_argument('--path', default='/tmp/aot_fit_block.pkl')
    a = ap.parse_args()
    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()   # the shared pool can stall backend init for minutes
    {'tiny': mode_tiny, 'save': lambda: mode_save(a.path),
     'load': lambda: mode_load(a.path), 'cold': mode_cold}[a.mode]()
