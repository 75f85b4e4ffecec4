#!/usr/bin/env python
"""Regenerate tests/goldens/*.npz from the reference PyTorch implementation.

Run from the repo root with the reference mounted at /root/reference (reads
its code and binary assets; writes nothing there). The goldens pin:
 - robust_loss.npz: general lossfun / NLL / log-partition values
 - embedder.npz:    Fourier + periodic-warp outputs incl. channel order
 - nppnet*.npz:     MLP state dicts + forward outputs (weight-transplant parity)
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
    # the reference imports torchvision/torch_dct/pkg_resources on paths we
    # don't exercise; stub them so the needed modules load
    tv = types.ModuleType('torchvision')
    tv.models = types.ModuleType('torchvision.models')
    sys.modules.setdefault('torchvision', tv)
    sys.modules.setdefault('torchvision.models', tv.models)
    sys.modules.setdefault('torch_dct', types.ModuleType('torch_dct'))
    pr = types.ModuleType('pkg_resources')
    pr.resource_stream = lambda pkg, path: open(
        f'{REF}/externel_lib/robust_loss_pytorch/{path}', 'rb')
    sys.modules.setdefault('pkg_resources', pr)


def robust_loss_goldens():
    sys.path.insert(0, f'{REF}/externel_lib')
    import torch
    import robust_loss_pytorch.general as general
    from robust_loss_pytorch import distribution

    rng = np.random.RandomState(0)
    x = (rng.randn(64) * 2).astype(np.float32)
    alpha = np.concatenate([[0.0, 2.0, 1.0, 0.5, 1.999, 0.001],
                            rng.uniform(0.01, 1.99, 58)]).astype(np.float32)
    scale = np.concatenate([[0.1, 1.0, 0.5],
                            rng.uniform(0.01, 2.0, 61)]).astype(np.float32)
    g = general.lossfun(torch.tensor(x), alpha=torch.tensor(alpha),
                        scale=torch.tensor(scale)).numpy()
    d = distribution.Distribution()
    nll = d.nllfun(torch.tensor(x), torch.tensor(alpha),
                   torch.tensor(scale)).numpy()
    logz = d.log_base_partition_function(torch.tensor(alpha)).numpy()
    np.savez(f'{OUT}/robust_loss.npz', x=x, alpha=alpha, scale=scale,
             general=g, nll=nll, log_partition=logz)


def embedder_goldens():
    sys.path.insert(0, REF)
    import torch
    from models.embedder import Embedder, Embedder_periodic

    res = (120, 180)
    kwargs = dict(include_input=True, input_dims=1, max_freq_log2=9,
                  num_freqs=10, sampling='log',
                  periodic_fns=[torch.sin, torch.cos], is_search=False)
    emb = Embedder(res, **kwargs)
    coords = torch.tensor(np.random.RandomState(1)
                          .uniform(-1, 1, (32, 22)).astype(np.float32))
    fourier_out = emb.embed(coords.clone()).numpy()

    emb2 = Embedder(res, **dict(kwargs, input_dims=2, is_search=True))
    coords_yx = torch.tensor(np.random.RandomState(2)
                             .uniform(0, 119, (32, 2)).astype(np.float32))
    fourier_search_out = emb2.embed(coords_yx.clone()).numpy()

    angles = torch.tensor([100.0, 170.0])
    periods = torch.tensor([37.0, 43.0])
    coords_yx2 = torch.tensor(np.random.RandomState(3)
                              .uniform(0, 119, (32, 2)).astype(np.float32))
    embp = Embedder_periodic(res, angles, periods, [1], [0, -1, 1, 0.5, -0.5],
                             [0], **kwargs)
    periodic_out = embp.embed(coords_yx2).numpy()
    embp2 = Embedder_periodic(res, angles, periods, [1],
                              [0, -1, 1, 0.5, -0.5], [0],
                              **dict(kwargs, include_input=False))
    periodic_search_out = embp2.embed(coords_yx2).numpy()
    np.savez(f'{OUT}/embedder.npz', res=np.array(res), coords=coords.numpy(),
             fourier_out=fourier_out, coords_yx=coords_yx.numpy(),
             fourier_search_out=fourier_search_out,
             coords_yx2=coords_yx2.numpy(), angles=angles.numpy(),
             periods=periods.numpy(), periodic_out=periodic_out,
             periodic_search_out=periodic_search_out)


def mlp_goldens():
    sys.path.insert(0, REF)
    import torch
    torch.manual_seed(0)
    from models.networks import NPP_Net, NPP_Net_light, NPP_Net_top1

    def export(model):
        return {f'sd_{k}': v.detach().numpy()
                for k, v in model.state_dict().items()}

    m = NPP_Net(input_ch_periodic=22, input_ch_periodic_aux=44,
                freq_scales=[1], freq_offsets=[0, -1, 1, 0.5, -0.5],
                angle_offsets=[0], D=8, W=64, freq_nerf=21, output_ch=3,
                skips=[4], activation='snake')
    x = torch.tensor(np.random.RandomState(0)
                     .randn(9, (22 + 44) * 21).astype(np.float32))
    np.savez(f'{OUT}/nppnet.npz', x=x.numpy(),
             y=m(None, x).detach().numpy(), **export(m))

    m1 = NPP_Net_top1(input_ch_periodic=22, freq_scales=[1],
                      freq_offsets=[0, -1, 1, 0.5, -0.5], angle_offsets=[0],
                      D=8, W=64, freq_nerf=21, output_ch=3, skips=[4],
                      activation='snake')
    x1 = torch.tensor(np.random.RandomState(1)
                      .randn(9, 22 * 21).astype(np.float32))
    np.savez(f'{OUT}/nppnet_top1.npz', x=x1.numpy(),
             y=m1(None, x1).detach().numpy(), **export(m1))

    ml = NPP_Net_light(input_ch_periodic=20, freq_scales=[1],
                       freq_offsets=[0, -1, 1, 0.5, -0.5], angle_offsets=[0],
                       D=4, W=32, input_ch=42, output_ch=3, skips=[4],
                       activation='snake')
    xp = torch.tensor(np.random.RandomState(2).randn(9, 42).astype(np.float32))
    xpe = torch.tensor(np.random.RandomState(3).randn(9, 20).astype(np.float32))
    np.savez(f'{OUT}/nppnet_light.npz', x_pos=xp.numpy(), x_peri=xpe.numpy(),
             y=ml(xp, xpe).detach().numpy(), **export(ml))


if __name__ == '__main__':
    os.makedirs(OUT, exist_ok=True)
    _stub_modules()
    robust_loss_goldens()
    embedder_goldens()
    mlp_goldens()
    print(f'wrote goldens to {OUT}')
