"""A/B: analytic vs random fallback towers on perceptual discrimination.
Task: 8 near-periodic textures x 4 lattice-shifted+noisy views each;
nearest-neighbor texture ID by LPIPS distance + same/other margin."""
import sys, os
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp

def texture(h, w, px, py, seed):
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    rng = np.random.RandomState(seed)
    ph = rng.uniform(0, 2*np.pi, 6)
    a = rng.uniform(0.1, 0.3, 6)
    img = np.stack([
        0.5 + a[0]*np.sin(2*np.pi*xx/px+ph[0]) + a[1]*np.sin(2*np.pi*yy/py+ph[1]),
        0.5 + a[2]*np.cos(2*np.pi*xx/px+ph[2]) + a[3]*np.cos(2*np.pi*yy/py+ph[3]),
        0.5 + a[4]*np.sin(2*np.pi*(xx/px+yy/py)+ph[4])], -1)
    return np.clip(img, 0, 1).astype(np.float32)

from npp_tpu.losses.lpips import LPIPS
from npp_tpu.nn.pretrained import weight_reports
lp = LPIPS(net='vgg')
print('tower source:', weight_reports()['vgg16'].source, file=sys.stderr)

rng = np.random.RandomState(0)
H = W = 64
textures = [texture(H, W, px, py, s) for s, (px, py) in enumerate(
    [(16,8),(12,12),(9,15),(20,10),(8,8),(14,7),(11,22),(18,14)])]
views = []  # (tex_id, img)
for t, img in enumerate(textures):
    px = [16,12,9,20,8,14,11,18][t]
    for v in range(4):
        sh = (v+1)*px
        im = np.roll(img, sh % W, axis=1)
        im = np.clip(im + rng.randn(H,W,3).astype(np.float32)*0.03, 0, 1)
        views.append((t, im))

# pairwise distances anchor=original textures, query=views
anchors = jnp.asarray(np.stack(textures))
D = np.zeros((len(views), len(textures)))
for i, (t, im) in enumerate(views):
    d = lp(jnp.asarray(np.repeat(im[None], len(textures), 0)), anchors, normalize=True)
    D[i] = np.asarray(d)[:, 0, 0, 0]
pred = D.argmin(1)
truth = np.array([t for t, _ in views])
acc = float((pred == truth).mean())
# margin: other/same distance ratio (higher = more discriminative)
same = D[np.arange(len(views)), truth]
other = np.where(np.arange(len(textures))[None] == truth[:, None], np.inf, D).min(1)
margin = float(np.median(other / np.maximum(same, 1e-9)))
print(f'{{"fallback": "{os.environ.get("NPP_TPU_FALLBACK","analytic")}", "nn_texture_id_acc": {acc:.3f}, "median_other_over_same": {margin:.3f}}}')
