"""Typed configuration for the NPP-TPU framework.

Mirrors the reference's four configargparse parser builders
(reference: options/arg_config.py:4-300) as frozen dataclasses with identical
defaults, including the per-task differences (loss toggles, weights, iteration
budgets). A thin CLI layer in `npp_tpu.cli` maps flags onto these dataclasses.

Design note (TPU-first): everything that affects compiled shapes (N_rand,
patch_num, patch sizes, netdepth/width, top-K) lives here as static Python
values so that a fit step compiles once per (image bucket, patch-size stage).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class BaseConfig:
    """Shared options (reference: options/arg_config.py:4-38)."""

    lrate: float = 5e-4
    lrate_decay: int = 500           # exponential decay horizon, in 1000s of steps
    chunk: int = 1024 * 32           # eval-time pixel chunk (kept for API parity; the
                                     # TPU path renders whole images in one jit call)
    netchunk: int = 1024 * 4096      # reference network chunking; unused under XLA
    freq_scales: Tuple[float, ...] = (1,)
    freq_offsets: Tuple[float, ...] = (0, -1, 1, 0.5, -0.5)
    angle_offsets: Tuple[float, ...] = (0,)
    i_embed: int = 0                 # 0: positional encoding, -1: identity
    multires: int = 10               # number of Fourier frequency bands
    activation: str = "snake"        # 'snake' | 'relu'
    normalize_type: int = 1          # 1: sigmoid -> [0,1]; 2: tanh -> [-1,1]
    loss_type: str = "robust_loss_adaptive"  # | 'l2' | 'robust_loss'
    adaptive_scale_lo: float = 1e-5     # lower bound of the adaptive robust
                                        # pixel loss's scale c (reference
                                        # default, adaptive.py:164). The NLL
                                        # rewards shrinking c as the fit
                                        # tightens (the measured pixel-loss
                                        # value declines linearly forever);
                                        # past the reference's 2001-iter
                                        # budget c can ride under the
                                        # achievable residual floor and blow
                                        # up the fit (measured: de45790e at
                                        # 3x budget, train PSNR 47 -> 6 in
                                        # the last 500 iters,
                                        # results_round4.json). Extended
                                        # schedules should raise this to
                                        # ~0.01 (half an 8-bit LSB is noise
                                        # anyway); run_suite's quality
                                        # preset does.
    seed: int = 0
    # TPU-specific knobs (no reference equivalent)
    matmul_precision: str = "bfloat16"  # 'default' | 'float32' | 'bfloat16';
                                        # bf16 feeds the MXU natively: measured
                                        # 1.85x step speedup at identical fit
                                        # quality (BASELINE.md); params/sums
                                        # stay f32
    feature_dtype: str = "float32"      # activation dtype of the pretrained
                                        # conv towers inside the FIT losses
                                        # (LPIPS/CX/style built by
                                        # models/pipeline.py):
                                        # 'float32' (reference-faithful) |
                                        # 'bfloat16' (halves the loss
                                        # towers' activation HBM traffic —
                                        # the dominant non-MXU phase in the
                                        # round-4 MFU roofline; changes
                                        # loss values beyond float
                                        # reassociation, so default off)
    canvas_multiple: int = 64           # pad images to this multiple so
                                        # compiled executables are shared
                                        # across image sizes (0 = off)
    canvas_override: Tuple[int, int] = ()  # pad ALL images to this exact
                                        # canvas (suite-wide executable
                                        # reuse; () = use canvas_multiple)
    compile_ahead: bool = True          # overlap the NEXT patch-decay
                                        # stage's 2-7 min relay compile with
                                        # the current stage's fit (a daemon
                                        # thread warms the jitted block; the
                                        # persistent compile cache cannot be
                                        # used through the relay)
    embed_table: str = "float32"        # '' | 'float32' | 'bfloat16':
                                        # inside each scan-block, precompute
                                        # the full-canvas embedding table
                                        # ONCE and gather rows per step
                                        # instead of recomputing the trig
                                        # chain (all fit coords are integer
                                        # canvas pixels) — trades ~50x of
                                        # the per-block VPU transcendental
                                        # work for one HBM gather per step.
                                        # DEFAULT ON after the round-4
                                        # hardware A/B: +15.7% step
                                        # throughput at the flagship config
                                        # (21.60 -> 24.99 it/s), f32 and
                                        # bf16 tables identical speed, so
                                        # the exact f32 gather is default
                                        # (BASELINE.md). Ignored when
                                        # warp_field is on (warped coords
                                        # are non-integer).
    embed_table_max_mb: int = 2048      # skip the table (fall back to
                                        # on-the-fly trig) when it would
                                        # exceed this many MB of HBM —
                                        # batched runs build B per-image
                                        # tables over the bucket canvas,
                                        # which at suite canvases would
                                        # otherwise reach many GB. The
                                        # round-4 B-sweep grounds the cap:
                                        # bf16 tables at B=8 on the 384x512
                                        # bucket exceeded HBM at compile
                                        # (results_round4.json).
    embed_table_degrade: bool = False   # when the f32 table would bust
                                        # embed_table_max_mb but a bf16 one
                                        # fits, build the table in bf16
                                        # instead of falling back to the
                                        # trig chain. OFF by default: bf16
                                        # table values quantize the
                                        # embedding (beyond float
                                        # reassociation), so the batched
                                        # path's sequential-equivalence and
                                        # the reference-faithful f32 chain
                                        # only bend when asked. Motivation:
                                        # the round-4 B-sweep's bf16-table
                                        # arms led the no-table arms at
                                        # B=3/5 (cross-process, pool-slice
                                        # confounded — adopt as default
                                        # only after a same-session A/B).
    aot_cache_dir: str = ""             # serialize compiled fit/ranking
                                        # executables here and reload them in
                                        # later sessions (utils/aot.py;
                                        # measured 180 s -> 24 s program
                                        # acquisition through the relay).
                                        # "" = off; env NPP_TPU_AOT_CACHE
                                        # supplies a default when set
    robust_layout: str = "auto"         # TPU-repo addition, value-identical
                                        # layout of the adaptive-robust
                                        # reductions (losses/pixel.py,
                                        # losses/lpips.py): 'nc' = the
                                        # reference's (rows, channels)
                                        # residuals (minor dim 3/64 is
                                        # lane-padded on TPU); 'cn' =
                                        # transposed (channels, rows) with
                                        # the LPIPS lin channel-sum fused in
                                        # that layout. 'auto' (default) =
                                        # the measured round-5 winner per
                                        # path (resolve_robust_layout):
                                        # 'cn' for single-image fit blocks
                                        # (+9.9% same-session at flagship,
                                        # 43.91 -> 39.95 ms/step), 'nc'
                                        # for the batched runner (paired
                                        # B=3 arms: cn -1.7%). Records:
                                        # results_round5.json
                                        # `robust_layout_ab`.
    # NOTE: a Pallas fused embed+matmul path existed through round 2 and was
    # REMOVED after hardware A/B: XLA's producer fusion of the on-the-fly
    # embedding is already optimal at these sizes (fwd+bwd 6.0 ms vs 16.5 ms
    # fused fwd alone at N=59392, d_emb=1386; round-1: fused dW 7x slower).
    # See ROADMAP.md "fused kernel" for the full record.


@dataclass(frozen=True)
class FitConfig(BaseConfig):
    """Shared per-image fit options (completion defaults;
    reference: options/arg_config.py:43-103)."""

    expname: str = "completion"
    basedir: str = "./results"
    datadir: str = ""

    netdepth: int = 8
    netwidth: int = 512
    N_rand: int = 32 * 32 * 8
    patch_num: int = 2
    num_real_patch_per_sample: int = 3
    patch_size_decay: int = 2000
    invalid_as_unknown: bool = False
    p_topk: int = 3
    invalid_ratio: float = 0.3
    aux_gate_ratio: float = 0.0         # TPU-repo addition (no reference
                                        # equivalent): when > 0, drop aux
                                        # (top-2..K) proposals whose ranking
                                        # distance exceeds ratio x top-1
                                        # distance — wrong lower-ranked
                                        # lattices feed noise channels
                                        # (ROADMAP round-1 ablation). 0 = off
                                        # (reference behaviour).

    # TPU-repo addition (no reference equivalent; default off): learnable
    # smooth coordinate warp applied before the periodic embedding — models
    # perspective/lens drift of the lattice so texture phase extrapolates
    # into large holes (nn/warp.py).
    warp_field: bool = False
    warp_width: int = 32
    warp_depth: int = 2
    warp_max_px: float = 12.0

    # TPU-repo addition (default 'none' = reference compositing,
    # NPP_completion/train.py:270-331). 'residual': seam-aware composite —
    # the known-region render error (masked_img - pred) is diffused into
    # the hole (Navier-Stokes inpainting of the residual field) and added
    # to the prediction, so the composite meets the known content
    # continuously at the hole boundary and low-frequency tint/phase offset
    # inside the hole is removed. Exactly the property that makes TELEA
    # PSNR-strong on featureless fills, grafted onto the lattice-aware INR.
    comp_seam: str = "none"
    # TPU-repo addition (default 0/'last' = reference behaviour). Held-out
    # synthetic validation holes + best-snapshot selection
    # (models/heldout.py): comp_heldout lattice-aligned blocks of KNOWN
    # content are carved out of training and treated exactly like the real
    # hole; comp_snapshot='best' keeps, over eval milestones, the snapshot
    # with the best held-out PSNR. Makes extended schedules per-image safe
    # without consulting hole GT — the round-4 measured fix for the 3x
    # schedule regressing 2/5 bundled examples (BASELINE.md).
    comp_heldout: int = 0
    comp_heldout_size: int = 0          # 0 = auto (real-hole bbox, <=160/side)
    comp_snapshot: str = "last"         # 'last' | 'best'
    use_adaptive_perceptual_loss: bool = True
    no_pix_loss: bool = False
    no_reg_sampling: bool = False
    use_contextual_loss: bool = True
    use_perceptual_loss: bool = True
    use_comp: bool = True
    use_patch_weight: bool = False

    contextual_weight: float = 0.001
    perceptual_weight: float = 0.001

    N_iters: int = 2001
    i_print: int = 500
    i_testset: int = 500

    # filled by the loader from detected periodicity
    # (reference: loaders/loaders.py:130-134)
    patch_size: int = 160


@dataclass(frozen=True)
class CompletionConfig(FitConfig):
    """reference: options/arg_config.py:43-103."""


@dataclass(frozen=True)
class SearchConfig(BaseConfig):
    """Periodicity proposal + ranking (reference: options/arg_config.py:105-146)."""

    datadir: str = ""
    outdir: str = "data/completion/detected"
    netdepth: int = 4
    netwidth: int = 256
    N_rand: int = 32 * 32 * 2
    # NOTE: the reference's --gray_only / --edge_searching are store_false
    # flags, so their DEFAULTS are True: the shipped pipeline detects on
    # grayscale + canny-edge correlation with no conv tower
    # (reference: options/arg_config.py:122-126, run_completion.sh passes no
    # flags). gray_only=False enables the AlexNet-conv1 feature path.
    gray_only: bool = True
    edge_searching: bool = True
    topk_detection: int = 10
    search_range: Tuple[int, int, int] = (1, 10, 1)
    contextual_weight: float = 1.0
    perceptual_weight: float = 30.0
    N_iters: int = 300
    # TPU-repo additions (no reference equivalent): static-shape padding so
    # the ranking fit/eval executables are reused across images. Candidate
    # lists are padded to rank_pad_candidates by repeating candidate 0
    # (padded distances are discarded); the eval crop is rounded up to a
    # multiple of crop_bucket px (extra area is zero in both pred and gt
    # canvases, identical for all candidates). 0 disables either.
    rank_pad_candidates: int = 9
    crop_bucket: int = 64
    # TPU-repo addition: ranking proxy objective (no reference equivalent —
    # the reference always scores 30*LPIPS+1*CX on the zero-canvas bbox
    # crop, NPP_proposal/search.py:150-205). All proxies are combined
    # host-side from one device program's score components
    # (proposal/ranking.py::combine_scores):
    #   'reference' | 'window' | 'mse' | 'heldout_mse'
    rank_proxy: str = "reference"
    rank_pix_weight: float = 1.0   # log10(MSE) weight in 'heldout_mse'
    # TPU-repo addition (default off = reference behaviour): exclude feature
    # positions outside the held-out region from the bbox CX match, so the
    # crop_bucket zero expansion cannot rescale near-tie candidate distances
    # through the CX normalisation (losses/contextual.py spatial_mask).
    cx_mask_pad: bool = False


@dataclass(frozen=True)
class SegmentationConfig(FitConfig):
    """reference: options/arg_config.py:151-225."""

    expname: str = "segmentation"
    use_perceptual_loss: bool = False     # store_true in reference (:190)
    contextual_weight: float = 0.005
    perceptual_weight: float = 0.001
    N_iters: int = 601
    i_testset: int = 600

    nb_classes: int = 3
    sp_size: int = 20
    sp_regul: float = 0.1

    l1_thresh: float = 0.15
    lpips_thresh: float = 0.3
    lpips_layers: int = 1
    # TPU-repo addition (default off = reference behaviour): compute the L1
    # refinement criterion on per-channel RGB differences (max over
    # channels) instead of grayscale. The reference's grayscale criterion
    # (NPP_segmentation/train.py:340-344) is blind to isoluminant anomalies
    # — a green blob with |gray delta| < l1_thresh is reclassified as
    # periodic (measured round 2, BASELINE.md segmentation findings).
    seg_color_criterion: bool = False
    # TPU-repo addition (default off = reference behaviour): restore init
    # non-periodic components that retain ANY refined evidence
    # (component-level geodesic reconstruction before small-object
    # removal). Counters the reference refinement's measured shrink bias
    # at blob boundaries where the INR partially reconstructs edges —
    # components the fit fully explains are still removed whole
    # (models/segmentation.py::refine_segmentation).
    seg_refine_protect: bool = False
    # TPU-repo addition: spatial-LPIPS autocalibration mode. 'auto'
    # (default) rescales the per-layer maps per image ONLY when the alex
    # tower runs on non-pretrained (analytic) weights — the reference's
    # lpips_thresh=0.3 is calibrated for the pretrained tower. 'off' =
    # reference-exact thresholds regardless (calibrated towers, parity
    # fixtures); 'on' = always rescale.
    seg_autocal: str = "auto"
    # TPU-repo addition (1.0 = reference behaviour): hysteresis factor for
    # RECLASSIFYING init non-periodic pixels as periodic — removal demands
    # l1/lpips below thresh*factor (<1 = stricter), while additions keep
    # the reference thresholds. Separates boundary erosion (error just
    # under thresh) from init-overshoot removal (error far under).
    seg_refine_hysteresis: float = 1.0
    # TPU-repo addition (default off = reference behaviour): texture-
    # energy cue for smooth non-periodic regions. The render-error
    # criteria cannot see a SMOOTH anomaly (the INR renders flat content
    # trivially well — measured on the bundled 9f80de08 patch-plate,
    # refined IoU vs GT 0.10-0.15 across every error-criterion variant,
    # BASELINE round-5 segmentation subsection). The cue marks valid
    # pixels whose local grayscale std (window seg_texture_window) falls
    # below seg_texture_beta x the 25th percentile of the PERIODIC
    # region's local std as non-periodic — additive only, it never
    # removes evidence (models/segmentation.py::refine_segmentation).
    seg_texture_criterion: bool = False
    seg_texture_beta: float = 0.5
    seg_texture_window: int = 9


@dataclass(frozen=True)
class RemappingConfig(FitConfig):
    """reference: options/arg_config.py:231-300."""

    # TPU-repo addition (default on; healthy runs bit-identical): if the
    # FINAL eval's train_psnr sits more than remap_guard_db below the
    # best milestone's, return the best-milestone snapshot instead — the
    # adaptive-robust scale can nondeterministically collapse the fit
    # late in the schedule (measured round 5: healthy 30.8 dB at iter
    # 2000 -> degenerate 5.4 dB at 2400 on a trajectory that fit cleanly
    # in another session; the alternative adaptive_scale_lo=0.01 floor
    # prevents it but costs ~1 dB on healthy fits —
    # results_round5.json `remapping_stability`).
    remap_guard: bool = True
    remap_guard_db: float = 10.0

    expname: str = "remapping"
    use_perceptual_loss: bool = False     # store_true in reference (:274)
    use_style_loss: bool = True
    use_adaptive_style_loss: bool = True
    contextual_weight: float = 0.01
    perceptual_weight: float = 0.001
    style_weight: float = 1.0
    N_iters: int = 2801
    i_testset: int = 400

    blur_thresh: float = 50.0


def replace(cfg, **kwargs):
    """Functional update helper (dataclasses.replace re-export)."""
    return dataclasses.replace(cfg, **kwargs)


def resolve_robust_layout(cfg, batched: bool) -> str:
    """Resolve robust_layout='auto' to the measured per-path winner
    (round-5 same-session A/Bs, results_round5.json `robust_layout_ab`):
    'cn' for the single-image fit block (+9.9% at flagship), 'nc' for the
    batched runner (cn measured -1.7% at paired B=3 — the transposition's
    lane-padding win does not survive the extra images axis)."""
    layout = getattr(cfg, 'robust_layout', 'nc')
    if layout == 'auto':
        return 'nc' if batched else 'cn'
    return layout


def nerf_embed_dim(cfg: BaseConfig, input_dims: int, include_input: bool = True) -> int:
    """Output dim of the Fourier encoder per `input_dims` input channels."""
    if cfg.i_embed == -1:
        return input_dims
    d = input_dims if include_input else 0
    return d + input_dims * cfg.multires * 2


def periodic_embed_dim(cfg: BaseConfig, include_input: bool) -> int:
    """Output dim of one proposal's periodicity warp
    (reference: models/embedder.py:102-138: 2 orientations x scales x offsets
    x angle_offsets x {sin, cos} [+ 2 raw coords])."""
    base = 2 if include_input else 0
    per = len(cfg.freq_scales) * len(cfg.freq_offsets) * len(cfg.angle_offsets) * 2 * 2
    return base + per
