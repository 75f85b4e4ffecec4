#!/usr/bin/env python
"""Generate PIPELINE-level goldens by running the reference implementation
end-to-end on CPU torch (VERDICT round-1 "Next #4").

Two fixtures, consumed by tests/test_pipeline_parity.py:

 - pipeline_search.npz: the reference's shipped-default periodicity search
   (gray_only=True + edge_searching=True, the store_false defaults of
   options/arg_config.py:122-126) run end-to-end on two bundled examples via
   the reference's own act2edge/feature_search/compute_loss code
   (NPP_proposal/feature_searching.py:54-338). Only im2act's gray branch is
   re-derived here (its AlexNet/.cuda() lines are unreachable on CPU;
   feature_searching.py:14-51) — the math it produces is identical.
   The ranking stage (search.py:85-207) is excluded: it needs pretrained
   LPIPS/VGG towers that cannot be materialised in this environment.

 - pipeline_fit.npz: a 100-iteration pixel-loss-only completion fit
   (NPP_completion/train.py:133-264 with patch losses off) at fixed init on
   a crop of a bundled example: reference Embedder_periodic + Embedder
   (gaussian bands recorded), NPP_Net top-3, adaptive robust pixel loss
   (module-global AdaptiveLossFunction, models/helpers.py:8-9), Adam +
   exponential LR decay (train.py:256-264). Records the init state dict,
   frequency bands, per-iteration pixel index sequence and loss trajectory,
   and the final prediction on held-out coords.

Run from the repo root with the reference mounted read-only at
/root/reference.
"""
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = '/root/reference'
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'tests', 'goldens')

import numpy as np


def _stub_modules():
    # the reference targets numpy<1.20 (utils/miscs.py:29 uses np.float);
    # restore the alias for the duration of golden generation
    if not hasattr(np, 'float'):
        np.float = float
    tv = types.ModuleType('torchvision')
    tv.models = types.ModuleType('torchvision.models')
    tv.transforms = types.ModuleType('torchvision.transforms')
    tv.transforms.functional = types.ModuleType(
        'torchvision.transforms.functional')
    sys.modules.setdefault('torchvision', tv)
    sys.modules.setdefault('torchvision.models', tv.models)
    sys.modules.setdefault('torchvision.transforms', tv.transforms)
    sys.modules.setdefault('torchvision.transforms.functional',
                           tv.transforms.functional)
    sys.modules.setdefault('torch_dct', types.ModuleType('torch_dct'))
    sk = types.ModuleType('skimage')
    sk.feature = types.ModuleType('skimage.feature')
    sk.feature.peak_local_max = None  # unused on the exercised path
    sys.modules.setdefault('skimage', sk)
    sys.modules.setdefault('skimage.feature', sk.feature)
    pr = types.ModuleType('pkg_resources')
    pr.resource_stream = lambda pkg, path: open(
        f'{REF}/externel_lib/robust_loss_pytorch/{path}', 'rb')
    sys.modules.setdefault('pkg_resources', pr)


SEARCH_EXAMPLES = ('20150911134910-5dcfbc24', '20150911134724-de45790e')


def _load_example(name):
    import cv2
    d = f'{REF}/data/completion/input/{name}'
    masked_img = cv2.imread(f'{d}/masked_img.png')[..., ::-1] / 255.0
    mask = cv2.imread(f'{d}/unknown_mask.png', 0)[..., None] / 255
    valid_mask = cv2.imread(f'{d}/valid_mask.png', 0)[..., None] / 255
    return masked_img, mask, valid_mask


def search_goldens():
    """Reference search (loaders/loaders.py:28-32 inputs) on 2 examples."""
    sys.path.insert(0, REF)
    import cv2
    import torch
    from NPP_proposal import feature_searching as fs

    def im2act_gray_cpu(im, mask):
        # the gray_only branch of feature_searching.py:14-51, CPU
        image_shape = np.array(im.shape[:2])
        new_shape = image_shape // 4
        m = torch.tensor(cv2.resize(mask, (new_shape[1], new_shape[0]),
                                    interpolation=cv2.INTER_NEAREST),
                         dtype=torch.float32)[None]
        g = cv2.cvtColor(im, cv2.COLOR_RGB2GRAY)
        g = cv2.resize(g, (new_shape[1] * 2, new_shape[0] * 2))
        g = cv2.resize(g, (new_shape[1], new_shape[0]))
        act = torch.cat([torch.Tensor(g[None]), m], dim=0)
        return act * m, m

    out = {}
    for name in SEARCH_EXAMPLES:
        masked_img, mask, valid_mask = _load_example(name)
        img_u8 = np.uint8(masked_img * 255)
        mask_u8 = np.uint8(valid_mask * mask)[..., 0]

        # search_periodicity_by_feat body (feature_searching.py:158-204),
        # defaults repeat_range=(1,10,1), edge+gray (arg_config.py:122-136)
        activation, m = im2act_gray_cpu(img_u8, mask_u8)
        activation_edge = fs.act2edge(activation[:-1], m)
        activation = activation * activation_edge[[0]]
        angles, periods, shifts = fs.feature_search(
            activation, m[0], repeat_range=(1, 10, 1), edge_searching=True)
        ratio = np.round(img_u8.shape[0] / activation.shape[1])
        for i in range(len(periods)):
            periods[i] = [float(periods[i][j]) * ratio
                          for j in range(len(periods[i]))]
            shifts[i] = [(shifts[i][j] * ratio).numpy()
                         for j in range(len(shifts[i]))]
        out[f'{name}_angles'] = np.array(
            [[float(a) for a in g] for g in angles])
        out[f'{name}_periods'] = np.array(periods)
        out[f'{name}_shifts'] = np.array(shifts)
    np.savez(f'{OUT}/pipeline_search.npz',
             examples=np.array(SEARCH_EXAMPLES), **out)
    for name in SEARCH_EXAMPLES:
        print(name, 'groups:', len(out[f'{name}_angles']))
        print('  periods:', np.round(out[f'{name}_periods'], 2).tolist())


FIT_EXAMPLE = '20150911134910-5dcfbc24'
FIT_ITERS = 100
FIT_N_RAND = 1024
FIT_D, FIT_W = 8, 128
FIT_ANGLES = [[90.0, 180.0], [93.0, 177.0], [45.0, 135.0]]
FIT_PERIODS = [[31.38, 36.0], [23.51, 28.0], [97.75, 94.73]]
LRATE, LRATE_DECAY = 5e-4, 500  # arg_config.py:10-13


def fit_goldens():
    sys.path.insert(0, REF)
    sys.path.insert(0, f'{REF}/externel_lib')
    import torch
    torch.manual_seed(0)
    np.random.seed(0)
    from models.embedder import get_embedder
    from models.networks import NPP_Net
    from models.mse_calculator import img2mse
    from robust_loss_pytorch.adaptive import AdaptiveLossFunction

    masked_img, mask, valid_mask = _load_example(FIT_EXAMPLE)
    # deterministic crop chosen so train (known) and val (hole) pixels are
    # both well-populated: coarse-scan window origins, pick known-fraction
    # closest to 0.5
    H, W = 160, 192
    known = (mask * valid_mask)[..., 0]
    best, y0, x0 = 1e9, 0, 0
    for yy in range(0, masked_img.shape[0] - H + 1, 16):
        for xx in range(0, masked_img.shape[1] - W + 1, 16):
            frac = known[yy:yy + H, xx:xx + W].mean()
            if abs(frac - 0.5) < best:
                best, y0, x0 = abs(frac - 0.5), yy, xx
    img = masked_img[y0:y0 + H, x0:x0 + W]
    m = (mask * valid_mask)[y0:y0 + H, x0:x0 + W]
    i_train = np.stack(np.nonzero(m[..., 0]), 1)
    i_val = np.stack(np.nonzero(1 - m[..., 0]), 1)
    res = (H, W)

    # embedders exactly as create_npp_net does (models/helpers.py:107-118):
    # one shared gaussian NeRF re-encoder + one periodic encoder per proposal
    angles = torch.Tensor(FIT_ANGLES)
    periods = torch.Tensor(FIT_PERIODS)
    embp, pdims = [], []
    for i in range(3):
        e, d = get_embedder(10, 0, res, selected_angles=angles[i],
                            selected_periods=periods[i], freq_scales=[1],
                            freq_offsets=[0, -1, 1, 0.5, -0.5],
                            angle_offsets=[0])
        embp.append(e)
        pdims.append(d)
    emb_nerf, _ = get_embedder(10, 0, res)  # input_dims=1, gaussian bands
    # the Embedder closes over each sampled band as a lambda default arg
    # (embedder.py:41-44: include_input identity fn first, then sin/cos pairs)
    freq_bands = np.array([float(fn.__defaults__[1])
                           for fn in emb_nerf.embed_fns[1::2]],
                          dtype=np.float32)
    assert freq_bands.shape == (10,)

    model = NPP_Net(input_ch_periodic=pdims[0], input_ch_periodic_aux=sum(pdims[1:]),
                    freq_scales=[1], freq_offsets=[0, -1, 1, 0.5, -0.5],
                    angle_offsets=[0], D=FIT_D, W=FIT_W, freq_nerf=21,
                    output_ch=3, skips=[4], activation='snake')
    adaptive = AdaptiveLossFunction(num_dims=3, float_dtype=np.float32,
                                    device='cpu')
    sd0 = {f'sd_{k}': v.detach().numpy().copy()
           for k, v in model.state_dict().items()}
    lat0 = {f'lat_{k}': v.detach().numpy().copy()
            for k, v in adaptive.named_parameters()}

    def embed_all(coords):
        t = torch.Tensor(coords)
        outs = [emb_nerf.embed(embp[i].embed(t.clone())) for i in range(3)]
        return torch.cat(outs, 1)

    train_emb = embed_all(i_train)
    gt = torch.Tensor(img[i_train[:, 0], i_train[:, 1]])

    opt = torch.optim.Adam(
        params=list(model.parameters()) + list(adaptive.parameters()),
        lr=LRATE, betas=(0.9, 0.999))

    rs = np.random.RandomState(7)
    idx_seq = np.stack([rs.choice(len(i_train), size=FIT_N_RAND, replace=False)
                        for _ in range(FIT_ITERS)])
    losses = []
    global_step = 0
    for it in range(FIT_ITERS):
        sel = idx_seq[it]
        # render() applies sigmoid for normalize_type=1 (helpers.py:55-56)
        pred = torch.sigmoid(model(None, train_emb[sel]))
        gt_mask = torch.ones_like(pred[:, :1])
        loss = img2mse(pred, gt[sel], 'robust_loss_adaptive', adaptive,
                       gt_mask)
        opt.zero_grad()
        loss.backward()
        opt.step()
        # exponential LR decay, train.py:256-264
        new_lrate = LRATE * (0.1 ** (global_step / (LRATE_DECAY * 100)))
        for pg in opt.param_groups:
            pg['lr'] = new_lrate
        global_step += 1
        losses.append(float(loss))

    val_sub = i_val[:512]
    with torch.no_grad():
        final_val = torch.sigmoid(model(None, embed_all(val_sub))).numpy()
        final_train = torch.sigmoid(model(None, train_emb[:512])).numpy()

    np.savez(f'{OUT}/pipeline_fit.npz',
             img=img.astype(np.float32), mask=m.astype(np.float32),
             crop_origin=np.array([y0, x0]), res=np.array(res),
             angles=np.array(FIT_ANGLES), periods=np.array(FIT_PERIODS),
             freq_bands=freq_bands, idx_seq=idx_seq,
             i_train=i_train, i_val=i_val,
             losses=np.array(losses), final_val=final_val,
             final_train=final_train, **sd0, **lat0)
    print(f'fit golden: loss {losses[0]:.4f} -> {losses[-1]:.4f}')


if __name__ == '__main__':
    os.makedirs(OUT, exist_ok=True)
    _stub_modules()
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('all', 'search'):
        search_goldens()
    if which in ('all', 'fit'):
        fit_goldens()
    print(f'wrote pipeline goldens to {OUT}')
