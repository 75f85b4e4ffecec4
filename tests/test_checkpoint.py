"""Checkpoint/resume round-trip and observability utilities."""
import os

import jax
import numpy as np
import pytest


def test_fit_state_roundtrip(tmp_path):
    from npp_tpu.utils.checkpoint import (latest_checkpoint, restore_fit_state,
                                          save_fit_state)
    from tests.test_trainer import run_steps, tiny_cfg, tiny_data
    from npp_tpu.models.completion import COMPLETION_TASK

    cfg = tiny_cfg()
    state, _, _ = run_steps(cfg, COMPLETION_TASK, tiny_data(), n=3)
    path = str(tmp_path / 'ckpt' / 'step_3')
    save_fit_state(path, state)
    assert latest_checkpoint(str(tmp_path / 'ckpt')).endswith('step_3')

    # restore into a freshly-initialised state of the same structure
    state2, _, _ = run_steps(cfg, COMPLETION_TASK, tiny_data(), n=0)
    restored = restore_fit_state(path, state2)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert int(restored.step) == 3


def test_fit_image_resume(tmp_path):
    from npp_tpu.models.pipeline import fit_image
    from npp_tpu.models.completion import COMPLETION_TASK
    from tests.test_trainer import tiny_cfg, tiny_data
    from npp_tpu.config import replace

    cfg = replace(tiny_cfg(), N_iters=7, i_testset=3)
    ckpt = str(tmp_path / 'ck')
    r1 = fit_image(cfg, COMPLETION_TASK, tiny_data(), checkpoint_dir=ckpt)
    assert int(r1.state.step) == 6
    # resume: should fast-forward past the last checkpoint (step 6)
    r2 = fit_image(cfg, COMPLETION_TASK, tiny_data(), checkpoint_dir=ckpt)
    assert int(r2.state.step) == 6  # nothing left to do


def test_metric_logger(tmp_path):
    import json
    from npp_tpu.utils.debug import MetricLogger
    p = str(tmp_path / 'm.jsonl')
    lg = MetricLogger(p)
    lg.log(kind='train', loss=1.0)
    lg.log(kind='eval', psnr=30.0)
    lg.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]['loss'] == 1.0 and lines[1]['psnr'] == 30.0


def test_phase_timer():
    from npp_tpu.utils.debug import PhaseTimer
    t = PhaseTimer()
    with t.phase('a'):
        pass
    assert 'a' in t.phases and 'a=' in t.summary()
