"""Batched end-to-end: 3 bundled completion examples fit CONCURRENTLY in one
bucket (shared canvas + patch size) on one chip; per-image PSNR + wall."""
import dataclasses, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
from npp_tpu.config import CompletionConfig, replace
from npp_tpu.models.completion import COMPLETION_TASK
from npp_tpu.models.loaders import load_completion
from npp_tpu.parallel.mesh import make_mesh
from npp_tpu.parallel.runner import fit_images
from npp_tpu.models.pipeline import build_components
from npp_tpu.models.trainer import make_render
from npp_tpu.losses.pixel import mse2psnr

names = ['20150911134319-c366317e', '20150911134723-104840a8',
         '20150911134910-5dcfbc24']
cfg = CompletionConfig()
datas = []
for n in names:
    d = load_completion(replace(cfg, datadir=f'/tmp/npp_suite_r3/completion/detected/{n}'))
    d = dataclasses.replace(d, patch_size=96)  # common bucket
    datas.append(d)

mesh = make_mesh(('images',), (1,), devices=jax.devices()[:1])
t0 = time.time()
states = fit_images(cfg, COMPLETION_TASK, datas, n_iters=2000, mesh=mesh,
                    canvas_multiple=384)
wall = time.time() - t0
print(f'batched 3-image fit wall: {wall:.1f}s '
      f'({3*2000/wall:.1f} image-iters/s aggregate)')

for n, d, st in zip(names, datas, states):
    comps = build_components(cfg, d, COMPLETION_TASK)
    render = make_render(cfg, comps.model, comps.embedder)
    h, w = d.img.shape[:2]
    pred = render(st.params['mlp'], h, w)
    vc = d.i_val
    gv = jnp.asarray(d.img, jnp.float32)[vc[:, 0], vc[:, 1]]
    pv = pred[vc[:, 0], vc[:, 1]]
    print(f'{n}: hole PSNR {float(mse2psnr(jnp.mean((pv-gv)**2))):.2f}')
