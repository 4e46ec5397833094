"""On-device batched augmentation — TPU-native rebuild of the imgaug
TRAIN_AUGS policy (reference utils/datasets.py:19-125).

The reference runs ~17 imgaug augmenters per sample on CPU worker processes —
the training hot loop's bottleneck (SURVEY.md §3.1). Here the whole policy is
ONE jitted function over the uint8 batch:

  * All geometric ops (Fliplr/Flipud, CropAndPad, Affine
    scale/translate/rotate/shear, PerspectiveTransform, ElasticTransformation,
    PiecewiseAffine) compose into a single per-sample homography + dense
    displacement field, applied with ONE packed-uint32 gather pass for
    image+mask — image and mask are warped with identical parameters (the
    reference's to_deterministic() contract, utils/datasets.py:186-189), and
    masks always use nearest + 0 fill. The homography factors compose in a
    per-sample random order (the reference Sequential's random_order=True,
    utils/datasets.py:123-125), and the warp interpolation order is sampled
    from {nearest, bilinear} per image (Affine order=[0,1],
    utils/datasets.py:47-50).
  * The SomeOf(0..5) pool has all 16 reference members
    (utils/datasets.py:59-124): 13 photometric ops applied post-warp in a
    per-batch random order (SomeOf random_order=True), plus
    elastic/piecewise/perspective, whose selection gates feed the fused
    warp — so the 0..5 budget covers them exactly as in the reference.

Per-sample randomness comes from folding the sample index into the batch key
— no Python-side RNG in the hot path.

Remaining approximations vs imgaug (hardware/compiler-forced; same spirit):
  - MedianBlur -> Gaussian of matched width (true rank filters are hostile
    to vector units); Superpixels -> fixed-grid block mosaic (SLIC
    clustering is sequential; n_segments must be static under jit).
  - Affine order=1 (bilinear) is realized by default as single-tap
    stochastic bilinear (tap drawn with its bilinear weight; per-pixel
    expectation exact) — TPU gathers cost per element, so the exact 4-tap
    warp costs ~3x the rest of the pipeline combined; force it with
    image_warp_order=1.
  - Simplex/frequency "blobby" blend masks -> bilinearly-upsampled uniform
    noise (static shapes; same band-limited character).
  - Photometric pool ops always apply AFTER the fused geometric warp
    regardless of the SomeOf slot's sampled position among the top-level
    Sequential members (pointwise ops commute with warps exactly; the
    spatially-correlated ones commute up to the warp's geometry), and the
    pool-internal order is sampled per BATCH, not per sample (per-sample
    op sequencing of vectorized ops would multiply compute 13x under vmap).
  - Elastic/piecewise displacement composes in warp source space (one
    fused resampling pass instead of imgaug's one pass per augmenter).
  - CoarseDropout cell size fixed at ~1/24 of the image (reference
    size_percent=(0.02, 0.05) — dynamic cell grids are not expressible
    with static shapes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear

__all__ = ["AugmentConfig", "make_augment_fn"]

# SomeOf pool layout (reference utils/datasets.py:59-124, in order):
# 0 superpixels, 1 blur-OneOf, 2 sharpen, 3 emboss, 4 edge-blend,
# 5 additive noise, 6 dropout-OneOf, 7 invert, 8 add, 9 hue/sat,
# 10 multiply-OneOf, 11 contrast, 12 grayscale,
# 13 elastic, 14 piecewise-affine, 15 perspective
_N_POOL = 16
_N_PHOTO = 13


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    # fast_geometric=True replaces the general gather-based warp (TPUs have
    # no vector gather: profiled at ~110 ms per tap per 32x513^2 batch) with
    # an MXU path: continuous rotation snaps to {0,90,180,270}deg
    # (transposes/flips — free) and scale/translate/crop-pad/shift run as
    # per-sample interpolation-matrix matmuls. Shear/perspective/elastic/
    # piecewise are disabled in this mode. ~10x faster; distribution differs
    # from imgaug only in rotation granularity + the dropped warps.
    fast_geometric: bool = False
    # interpolation order of the general image warp. None (default) samples
    # from {0: nearest, 1: bilinear} per image — the reference's Affine
    # order=[0, 1] (utils/datasets.py:47-50) — with order=1 realized as
    # SINGLE-TAP STOCHASTIC bilinear: the sampling coordinate is dithered by
    # U(-.5,.5) before rounding, so each tap is drawn with its bilinear
    # weight and the per-pixel EXPECTATION equals exact bilinear, at
    # one-gather cost (TPU gathers cost per element: the exact 4-tap warp
    # measures ~3x the whole remaining pipeline). 1 forces the exact 4-tap
    # bilinear warp; 0 forces pure nearest. Masks always warp nearest
    # (sharing the image's tap, the to_deterministic contract).
    image_warp_order: int | None = None
    # banded_warp=True realizes the general warp as the two-pass
    # (Catmull-Smith) decomposition sampled by the GATHER-FREE
    # banded-matmul Pallas kernel (ops/pallas/banded_resample.py):
    # interpolation matrices are built on the fly in VMEM and applied on
    # the MXU, so order=1 becomes DETERMINISTIC exact per-pass bilinear at
    # ~15 ms/pass vs ~64 ms for the packed single-tap gather warp
    # (tools/bench_banded.py). Same geometry fields as separable_warp
    # (square images only — the 90-deg transpose factoring); the pass-1
    # intermediate stays bf16 (no u8 requantization).
    banded_warp: bool = True
    # separable_warp=True realizes the general warp as the two-pass
    # (Catmull-Smith) LANE-gather sampler (_sample_two_pass): order=1
    # becomes DETERMINISTIC separable bilinear (no stochastic tap).
    # Geometry parity-tested (tests/test_twopass_warp.py); currently
    # OPT-IN: the isolated lane gather measures 1.5 ns/elem
    # (tools/bench_gather.py) but the composed two-pass program measured
    # 4.5x the legacy warp on TPU (tools/bench_augment.py ab —
    # decomposition in tools/bench_twopass.py; see PERF.md round 3).
    # Square images only (the 90-deg transpose factoring needs square
    # frames); legacy samplers otherwise.
    separable_warp: bool = False
    # photo_carry selects the photometric pool's scan-state dtype. The pool
    # is bandwidth-bound (13 sequential full-batch [B,H,W,3] iterations —
    # profiled rounds 4/5), so carry width is its cost knob:
    #   "u8"   (default): round+clip every op output to integer 0..255 and
    #          carry uint8 — EXACTLY the reference's quantization (imgaug
    #          requantizes every augmenter's output to uint8, Affine
    #          included; utils/datasets.py:59-124) at 1 byte/elem, half the
    #          bf16 pool bandwidth.
    #   "bf16": round-4 default; <=1 intensity-step rounding, no per-op
    #          integer requantization (a *finer* class than the reference).
    #   "f32": full precision (the round-3 behavior).
    # Op-internal math is f32 in all modes.
    photo_carry: str = "u8"
    # pool_compute selects the internal dtype of the BANDWIDTH-HEAVY pool
    # ops (blur/sharpen/emboss/edge/hue-sat/noise/dropout fields — the
    # ~17 ms of op compute in the 51.6 ms policy, tools/bench_pool.py):
    # "bf16" halves their read traffic. Every op output feeds the u8
    # requantization (photo_carry default), and the reference pool runs on
    # uint8 tables (cv2 u8 HSV hue granularity is 2 deg ~= bf16 ULP at
    # 360), so bf16 internals stay a finer quantization class than the
    # distribution being rebuilt. Scalar parameter math stays f32.
    pool_compute: str = "bf16"
    # legacy_ops=True reconstructs the ROUND-4 program shapes (depthwise
    # conv blur, VPU shift-add 3x3s, scan-of-switch pool, f32 kernel
    # output, f32 jitter draws) for tools/bench_regress.py's drift-proof
    # cross-round legs. Not a production mode.
    legacy_ops: bool = False
    # per_sample_photo_order=True draws the photometric pool order per
    # SAMPLE (the reference SomeOf random_order=True semantics) instead of
    # per batch; costs 13x the pool's op applications under vmap —
    # measurement-gated, see _photometric_batch
    per_sample_photo_order: bool = False
    # rng_impl='rbg' draws the augmentation randomness with the
    # counter-based RBG generator instead of threefry — cheaper per word
    # on TPU for the big per-pixel fields (dither/elastic/noise);
    # statistically fine for augmentation noise. Measured null in round 3
    # (1.016x when the f32 pool dominated) but a repeatable 1.4 ms/batch
    # (45.6 -> 44.2) on the round-5 slimmed policy, so it is now the
    # DEFAULT. None keeps the key's own implementation (threefry).
    rng_impl: str | None = "rbg"
    # geometric (reference utils/datasets.py:29-57)
    p_fliplr: float = 0.5
    p_flipud: float = 0.2
    p_crop_pad: float = 0.5
    crop_pad_percent: tuple = (-0.05, 0.1)
    p_affine: float = 0.5
    scale_range: tuple = (0.8, 1.2)
    translate_range: tuple = (-0.2, 0.2)
    rotate_range: tuple = (-90.0, 90.0)
    shear_range: tuple = (-16.0, 16.0)
    # photometric SomeOf(0..5) pool (reference utils/datasets.py:59-124)
    someof_max: int = 5
    p_sometimes: float = 0.5  # inner Sometimes() wrappers
    elastic_alpha: tuple = (0.5, 3.5)
    piecewise_scale: tuple = (0.01, 0.05)
    perspective_scale: tuple = (0.01, 0.1)
    blur_sigma: tuple = (0.0, 3.0)
    noise_scale: tuple = (0.0, 0.05 * 255)
    dropout_p: tuple = (0.01, 0.1)
    coarse_dropout_p: tuple = (0.03, 0.15)
    add_range: tuple = (-10.0, 10.0)
    hue_sat_range: tuple = (-20.0, 20.0)
    multiply_range: tuple = (0.5, 1.5)
    contrast_range: tuple = (0.5, 2.0)
    invert_p: float = 0.05


# ---------------------------------------------------------------------------
# SomeOf(0..5) selection over the 16-member pool
# ---------------------------------------------------------------------------

def _someof_gates(key, cfg: AugmentConfig):
    """[_N_POOL] bool — k ~ U{0..someof_max} members chosen uniformly
    (reference iaa.SomeOf((0, 5), [...16 members...]))."""
    k1, k2 = jax.random.split(key)
    k_count = jax.random.randint(k1, (), 0, cfg.someof_max + 1)
    scores = jax.random.uniform(k2, (_N_POOL,))
    desc = -jnp.sort(-scores)
    thresh = desc[jnp.clip(k_count - 1, 0, _N_POOL - 1)]
    return jnp.where(k_count > 0, scores >= thresh, False)


# ---------------------------------------------------------------------------
# geometric machinery
# ---------------------------------------------------------------------------

def _component_matrices(key, cfg: AugmentConfig, h: int, w: int, persp_gate):
    """Stack [5, 3, 3] of per-sample forward homographies for the top-level
    Sequential members: fliplr, flipud, crop-and-pad, affine, perspective
    (perspective lives in the SomeOf pool; its gate arrives precomputed)."""
    ks = jax.random.split(key, 16)
    eye = jnp.eye(3)

    # flips about the image center (two separate Sequential members)
    flip_lr = jax.random.bernoulli(ks[0], cfg.p_fliplr)
    flip_ud = jax.random.bernoulli(ks[1], cfg.p_flipud)
    fx = jnp.where(flip_lr, -1.0, 1.0)
    fy = jnp.where(flip_ud, -1.0, 1.0)
    m_fliplr = jnp.eye(3).at[0, 0].set(fx).at[0, 2].set(
        jnp.where(flip_lr, w - 1.0, 0.0))
    m_flipud = jnp.eye(3).at[1, 1].set(fy).at[1, 2].set(
        jnp.where(flip_ud, h - 1.0, 0.0))

    # CropAndPad: per-side percent in crop_pad_percent, keep_size=True
    do_cap = jax.random.bernoulli(ks[2], cfg.p_crop_pad)
    lo, hi = cfg.crop_pad_percent
    sides = jax.random.uniform(ks[3], (4,), minval=lo, maxval=hi)
    l, r = sides[0] * w, sides[1] * w
    t, b = sides[2] * h, sides[3] * h
    sx = w / jnp.maximum(w - l - r, 1.0)
    sy = h / jnp.maximum(h - t - b, 1.0)
    cap = jnp.eye(3).at[0, 0].set(sx).at[0, 2].set(-l * sx)
    cap = cap.at[1, 1].set(sy).at[1, 2].set(-t * sy)
    cap = jnp.where(do_cap, cap, eye)

    # Affine about the center: scale per-axis, rotate, shear, translate
    do_aff = jax.random.bernoulli(ks[4], cfg.p_affine)
    sxa = jax.random.uniform(ks[5], (), minval=cfg.scale_range[0],
                             maxval=cfg.scale_range[1])
    sya = jax.random.uniform(ks[6], (), minval=cfg.scale_range[0],
                             maxval=cfg.scale_range[1])
    tx = jax.random.uniform(ks[7], (), minval=cfg.translate_range[0],
                            maxval=cfg.translate_range[1]) * w
    ty = jax.random.uniform(ks[8], (), minval=cfg.translate_range[0],
                            maxval=cfg.translate_range[1]) * h
    theta = jnp.deg2rad(jax.random.uniform(
        ks[9], (), minval=cfg.rotate_range[0], maxval=cfg.rotate_range[1]))
    shear = jnp.deg2rad(jax.random.uniform(
        ks[10], (), minval=cfg.shear_range[0], maxval=cfg.shear_range[1]))
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.eye(3)
    rot = rot.at[0, 0].set(cos * sxa).at[0, 1].set(
        -sin * sya + cos * sxa * jnp.tan(shear))
    rot = rot.at[1, 0].set(sin * sxa).at[1, 1].set(
        cos * sya + sin * sxa * jnp.tan(shear))
    center = jnp.array([[1.0, 0.0, -cx], [0.0, 1.0, -cy], [0.0, 0.0, 1.0]])
    uncenter = jnp.array([[1.0, 0.0, cx + tx], [0.0, 1.0, cy + ty],
                          [0.0, 0.0, 1.0]])
    aff = uncenter @ rot @ center
    aff = jnp.where(do_aff, aff, eye)

    # PerspectiveTransform: jitter the 4 corners, fit a homography
    pscale = jax.random.uniform(ks[11], (), minval=cfg.perspective_scale[0],
                                maxval=cfg.perspective_scale[1])
    jitter = jax.random.normal(ks[12], (4, 2)) * pscale * jnp.array([w, h])
    src = jnp.array([[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0],
                     [0.0, h - 1.0]])
    persp = _fit_homography(src, src + jitter)
    persp = jnp.where(persp_gate, persp, eye)

    return jnp.stack([m_fliplr, m_flipud, cap, aff, persp])


def _compose_permuted(key, mats):
    """Compose the [5, 3, 3] member homographies in a per-sample random
    order (reference Sequential(random_order=True)). Member applied first
    multiplies rightmost."""
    perm = jax.random.permutation(key, mats.shape[0])
    m = jnp.eye(3)
    for pos in range(mats.shape[0]):
        m = mats[perm[pos]] @ m
    return m


def _fit_homography(src, dst):
    """Solve for H (3x3, h22=1) s.t. dst ~ H @ src for 4 point pairs."""
    rows = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        u, v = dst[i, 0], dst[i, 1]
        rows.append(jnp.stack([x, y, 1.0, 0.0, 0.0, 0.0, -u * x, -u * y]))
        rows.append(jnp.stack([0.0, 0.0, 0.0, x, y, 1.0, -v * x, -v * y]))
    a = jnp.stack(rows)
    b = dst.reshape(-1)
    sol = jnp.linalg.solve(a + 1e-8 * jnp.eye(8), b)
    return jnp.concatenate([sol, jnp.ones(1)]).reshape(3, 3)


def _displacement_field(key, cfg: AugmentConfig, h: int, w: int,
                        elastic_gate, piecewise_gate):
    """Elastic + piecewise-affine as an additive sampling-coordinate field.
    Gates come from the SomeOf pool selection (budgeted members 13/14)."""
    ks = jax.random.split(key, 4)
    # ElasticTransformation(alpha 0.5-3.5, sigma .25): near-per-pixel jitter
    alpha = jax.random.uniform(ks[0], (), minval=cfg.elastic_alpha[0],
                               maxval=cfg.elastic_alpha[1])
    el = jax.random.uniform(ks[1], (h, w, 2), minval=-1.0, maxval=1.0) * alpha
    el = jnp.where(elastic_gate, el, 0.0)
    # PiecewiseAffine(scale 0.01-0.05): coarse 5x5 grid displacement,
    # bilinearly upsampled
    pscale = jax.random.uniform(ks[2], (), minval=cfg.piecewise_scale[0],
                                maxval=cfg.piecewise_scale[1])
    grid = jax.random.normal(ks[3], (5, 5, 2)) * pscale * jnp.array([w, h])
    pw = resize_bilinear(grid, (h, w), align_corners=True)
    pw = jnp.where(piecewise_gate, pw, 0.0)
    return el + pw


def _warp_coords(hmat, disp, h: int, w: int):
    """Sampling coords (sy, sx) [H, W] for the inverse warp."""
    hinv = jnp.linalg.inv(hmat)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    px = hinv[0, 0] * xs + hinv[0, 1] * ys + hinv[0, 2]
    py = hinv[1, 0] * xs + hinv[1, 1] * ys + hinv[1, 2]
    pz = hinv[2, 0] * xs + hinv[2, 1] * ys + hinv[2, 2]
    sx = px / pz + disp[..., 0]
    sy = py / pz + disp[..., 1]
    return sy, sx


def _boundary(coord, n, mode):
    """Transform out-of-range coords per boundary mode id
    (0=constant->clamp+mask, 1=edge, 2=reflect, 3=wrap)."""
    clamped = jnp.clip(coord, 0.0, n - 1.0)
    period = jnp.maximum(2.0 * (n - 1.0), 1.0)
    m = jnp.mod(coord, period)
    reflected = jnp.minimum(m, period - m)
    wrapped = jnp.mod(coord, jnp.maximum(n * 1.0, 1.0))
    c = jnp.where(mode == 2, reflected, jnp.where(mode == 3, wrapped, clamped))
    return jnp.clip(c, 0.0, n - 1.0)


def _pack_u32(img_u8, seg_u8):
    """3 uint8 channels + uint8 mask -> one uint32 word per pixel. TPUs have
    no vector gather, so gather count dominates warp cost (PERF.md)."""
    return (img_u8[..., 0].astype(jnp.uint32)
            | (img_u8[..., 1].astype(jnp.uint32) << 8)
            | (img_u8[..., 2].astype(jnp.uint32) << 16)
            | (seg_u8.astype(jnp.uint32) << 24))


def _unpack_rgb(g):
    return jnp.stack([(g & 0xFF).astype(jnp.float32),
                      ((g >> 8) & 0xFF).astype(jnp.float32),
                      ((g >> 16) & 0xFF).astype(jnp.float32)], axis=-1)


def _gather_packed(packed, yi, xi):
    """[B,H,W] u32 gathered at per-element integer coords with ONE
    batch-global flat gather.

    PRECONDITION (promise_in_bounds is undefined behavior otherwise): every
    caller must pass yi in [0, H-1] and xi in [0, W-1] already. The two
    samplers guarantee this — _sample_nearest_packed clips explicitly, and
    _sample_packed floors a _boundary()-clipped coordinate (range [0, n-1])
    so floor/floor+1-with-min stay in range. Any new coordinate path MUST
    clip before calling; promise_in_bounds skips the per-element
    clamp/select, and the flat global form is the fastest XLA
    arbitrary-gather on this TPU (tools/bench_gather.py: 7.3 vs 12.2
    ns/elem for the vmapped 2-D form)."""
    b, h, w = packed.shape
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
    lin = base + yi * w + xi
    return packed.reshape(-1).at[lin].get(mode="promise_in_bounds")


def _sample_nearest_packed(imgs_u8, segs_u8, sy, sx, mode, cval,
                           dither_y=None, dither_x=None):
    """Batched nearest warp of images+masks with ONE gather of the packed
    word. imgs [B,H,W,3] u8, segs [B,H,W] u8, coords [B,H,W] f32, mode/cval
    [B]. `dither_*` (U(-.5,.5) fields or None) select the tap
    stochastically with bilinear weights (expectation == exact bilinear) —
    applied after boundary handling so range masks stay those of the true
    coordinates."""
    h, w = segs_u8.shape[1], segs_u8.shape[2]
    packed = _pack_u32(imgs_u8, segs_u8)
    m = mode[:, None, None]
    img_in = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    seg_in = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
    bx = _boundary(sx, w, m)
    by = _boundary(sy, h, m)
    if dither_x is not None:
        bx = bx + dither_x
        by = by + dither_y
    xi = jnp.clip(jnp.round(bx), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(by), 0, h - 1).astype(jnp.int32)
    g = _gather_packed(packed, yi, xi)
    out_img = jnp.where((m == 0)[..., None] & ~img_in[..., None],
                        cval[:, None, None, None], _unpack_rgb(g))
    out_seg = jnp.where(seg_in, (g >> 24).astype(jnp.int32), 0)
    return out_img, out_seg


def _sample_packed(imgs_u8, segs_u8, sy, sx, mode, cval, use_bilinear):
    """Batched warp from FOUR gathers of the packed uint32 word: the
    bilinear image interpolates the 4 unpacked taps; the nearest image and
    the mask select the nearest tap from the same 4 fetches (no 5th gather).
    `use_bilinear` [B] picks the image interpolation per sample — the
    reference Affine's order=[0,1] (utils/datasets.py:47-50)."""
    h, w = segs_u8.shape[1], segs_u8.shape[2]
    packed = _pack_u32(imgs_u8, segs_u8)
    m = mode[:, None, None]
    img_in = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    seg_in = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
    bx = _boundary(sx, w, m)
    by = _boundary(sy, h, m)
    x0 = jnp.floor(bx)
    y0 = jnp.floor(by)
    wx = (bx - x0)[..., None]
    wy = (by - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    g00 = _gather_packed(packed, y0i, x0i)
    g01 = _gather_packed(packed, y0i, x1i)
    g10 = _gather_packed(packed, y1i, x0i)
    g11 = _gather_packed(packed, y1i, x1i)
    bil = (_unpack_rgb(g00) * (1 - wy) * (1 - wx)
           + _unpack_rgb(g01) * (1 - wy) * wx
           + _unpack_rgb(g10) * wy * (1 - wx)
           + _unpack_rgb(g11) * wy * wx)
    # nearest tap = round(): always floor or floor+1 -> one of the 4 fetches
    right = (bx - x0) >= 0.5
    down = (by - y0) >= 0.5
    g_near = jnp.where(down, jnp.where(right, g11, g10),
                       jnp.where(right, g01, g00))
    out_img = jnp.where(use_bilinear[:, None, None, None], bil,
                        _unpack_rgb(g_near))
    out_img = jnp.where((m == 0)[..., None] & ~img_in[..., None],
                        cval[:, None, None, None], out_img)
    out_seg = jnp.where(seg_in, (g_near >> 24).astype(jnp.int32), 0)
    return out_img, out_seg


# ---------------------------------------------------------------------------
# separable two-pass warp (lane gathers; VERDICT r3 item #5)
# ---------------------------------------------------------------------------

def _twopass_fields(hinv, grid, h: int, w: int):
    """Deterministic coordinate fields of the separable (Catmull-Smith)
    two-pass warp for ONE sample.

    hinv: [3,3] inverse homography (output pixel -> source coords);
    grid: [5,5,2] piecewise-affine displacement control grid (zeros when
    ungated). Returns (tf, sx, sy_msk, vt):
      tf     — gather from the TRANSPOSED source (factoring out the 90° part
               when |d|>|a|, i.e. rotation beyond 45°, where the row map
               j -> x is ill-conditioned)
      sx     — [h,w] total source column per output pixel (pass-2 coords)
      sy_msk — [h,w] source row per output pixel (boundary masks only)
      vt     — [w,h] pass-1 field on the (source-col x, out-row i) grid:
               the source ROW feeding intermediate column x at output row i,
               from the closed-form inverse of the homography's row map
               j*(i,x) plus the transported piecewise field.
    The construction: pass1 t[i,x] = src[vt[x,i], x] resamples each source
    column vertically; pass2 out[i,j] = t[i, sx[i,j]] resamples
    horizontally; composite = src[vt(sx), sx] with vt(i, sx(i,j)) == sy(i,j)
    by the inversion. Exact for homographies; first-order for the smooth
    piecewise grid (evaluated at j* instead of j — error O(field slope))."""
    tf = jnp.abs(hinv[1, 0]) > jnp.abs(hinv[0, 0])
    hinv = jnp.where(tf, hinv[jnp.array([1, 0, 2])], hinv)
    grid = jnp.where(tf, grid[..., ::-1], grid)
    a, b, c = hinv[0, 0], hinv[0, 1], hinv[0, 2]
    d, e, f = hinv[1, 0], hinv[1, 1], hinv[1, 2]
    g, h2, w2 = hinv[2, 0], hinv[2, 1], hinv[2, 2]

    def safe(x, eps):
        return jnp.where(jnp.abs(x) < eps,
                         jnp.where(x < 0, -eps, eps), x)

    # output-grid source coords (pass-2 coordinate + boundary masks)
    ig = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    jg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    pz = safe(g * jg + h2 * ig + w2, 1e-6)
    hx = (a * jg + b * ig + c) / pz
    hy = (d * jg + e * ig + f) / pz
    pw = resize_bilinear(grid, (h, w), align_corners=True)
    sx = hx + pw[..., 0]
    sy_msk = hy + pw[..., 1]

    # pass-1 field on the transposed (x, i) grid: invert the row map
    # x = (a j + b i + c)/(g j + h2 i + w2) for j, then evaluate the y map
    xg = jax.lax.broadcasted_iota(jnp.float32, (w, h), 0)
    ig2 = jax.lax.broadcasted_iota(jnp.float32, (w, h), 1)
    den = safe(xg * g - a, 1e-4)
    jstar = (b * ig2 + c - xg * (h2 * ig2 + w2)) / den
    # columns no output pixel maps to can have wild j* (e.g. behind the
    # perspective horizon); bound it so downstream math stays finite
    jstar = jnp.clip(jstar, -1.0 * w, 2.0 * w)
    pzs = safe(g * jstar + h2 * ig2 + w2, 1e-6)
    vh = (d * jstar + e * ig2 + f) / pzs
    # piecewise-y transported to (x, i): separable closed-form eval of the
    # bilinear 5x5 grid at (row = i exact, col = j*)
    rowg = resize_bilinear(grid[..., 1:2], (h, 5),
                           align_corners=True)[..., 0]          # [h, 5]
    u = jnp.clip(jstar / jnp.maximum(w - 1.0, 1.0) * 4.0, 0.0, 4.0)
    c0 = jnp.clip(jnp.floor(u), 0.0, 3.0)
    t = u - c0
    pwy = jnp.zeros_like(u)
    for k in range(4):
        seg_val = rowg[:, k][None, :] * (1 - t) + rowg[:, k + 1][None, :] * t
        pwy = jnp.where(c0 == k, seg_val, pwy)
    return tf, sx, sy_msk, vh + pwy


def _twopass_coords(key, h, w, gates, cfg: AugmentConfig):
    """Per-sample random draws + separable-warp fields (vmapped). The key
    structure mirrors _geometric_coords, so both warp realizations draw
    identical geometric parameters from the same key."""
    (k_mats, k_perm, k_disp, k_mode, k_cval, k_order,
     k_g) = jax.random.split(key, 7)
    kg = jax.random.split(k_g, 3)
    elastic = gates[13] & jax.random.bernoulli(kg[0], cfg.p_sometimes)
    piecewise = gates[14] & jax.random.bernoulli(kg[1], cfg.p_sometimes)
    persp = gates[15] & jax.random.bernoulli(kg[2], cfg.p_sometimes)

    mats = _component_matrices(k_mats, cfg, h, w, persp)
    hmat = _compose_permuted(k_perm, mats)
    hinv = jnp.linalg.inv(hmat)

    ks = jax.random.split(k_disp, 6)
    alpha = jax.random.uniform(ks[0], (), minval=cfg.elastic_alpha[0],
                               maxval=cfg.elastic_alpha[1])
    alpha = jnp.where(elastic, alpha, 0.0)
    pscale = jax.random.uniform(ks[2], (), minval=cfg.piecewise_scale[0],
                                maxval=cfg.piecewise_scale[1])
    grid = jax.random.normal(ks[3], (5, 5, 2)) * pscale * jnp.array(
        [w, h], jnp.float32)
    grid = jnp.where(piecewise, grid, 0.0)

    tf, sx, sy_msk, vt = _twopass_fields(hinv, grid, h, w)
    # iid elastic jitter, one fresh field per pass: the reference's field
    # (sigma 0.25) is near-iid per-pixel noise, so drawing it on either
    # pass grid realizes the same distribution (module docstring)
    # bf16 jitter draws: amplitude <= 3.5 px of iid noise — the draw's
    # quantization (2^-8 of the amplitude) is far below the elastic
    # distribution's own scale; halves the two full-grid field writes
    jdt = jnp.float32 if cfg.legacy_ops else jnp.bfloat16
    sx = sx + ((jax.random.uniform(ks[4], (h, w), dtype=jdt)
                * 2.0 - 1.0) * alpha.astype(jdt)).astype(jnp.float32)
    vt = vt + ((jax.random.uniform(ks[5], (w, h), dtype=jdt)
                * 2.0 - 1.0) * alpha.astype(jdt)).astype(jnp.float32)

    mode = jax.random.randint(k_mode, (), 0, 4)
    cval = jax.random.uniform(k_cval, (), maxval=255.0)
    if cfg.image_warp_order == 1:
        use_bil = jnp.bool_(True)
    elif cfg.image_warp_order == 0:
        use_bil = jnp.bool_(False)
    else:
        # per-image interpolation order from {0, 1} (reference Affine
        # order=[0,1]); bilinear here is the DETERMINISTIC separable
        # resampling, not the stochastic tap draw of the legacy sampler
        use_bil = jax.random.bernoulli(jax.random.split(k_order, 3)[0], 0.5)
    return vt, sx, sy_msk, mode, cval, use_bil, tf


def _lane_taps2(arr, coord, use_bil):
    """2-tap lane gather along the LAST axis of packed u32 [B,R,C] at
    boundary-handled f32 coords [B,R,C] (PRECONDITION: in [0, C-1] — see
    _gather_packed). Returns (img rgb f32 — bilinear or nearest per
    use_bil[b] —, nearest packed word)."""
    cdim = arr.shape[-1]
    i0f = jnp.floor(coord)
    frac = coord - i0f
    i0 = jnp.clip(i0f, 0, cdim - 1).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, cdim - 1)
    g0 = jnp.take_along_axis(arr, i0, axis=2, mode="promise_in_bounds")
    g1 = jnp.take_along_axis(arr, i1, axis=2, mode="promise_in_bounds")
    near = jnp.where(frac >= 0.5, g1, g0)
    wimg = jnp.where(use_bil[:, None, None], frac,
                     (frac >= 0.5).astype(jnp.float32))[..., None]
    rgb = _unpack_rgb(g0) * (1 - wimg) + _unpack_rgb(g1) * wimg
    return rgb, near


def _sample_two_pass(imgs_u8, segs_u8, vt, sx, sy_msk, mode, cval, use_bil,
                     tf):
    """Separable two-pass warp of the packed batch: vertical resample in
    transposed layout -> repack -> horizontal resample. 4 LANE gathers
    (~1.5 ns/elem, tools/bench_gather.py) instead of the flat global
    gathers (7.3 ns/elem; 4 of them for the exact 4-tap warp) — exact
    deterministic bilinear cheaper than the legacy 1-gather stochastic tap.
    Masks always take the per-pass nearest tap (0 fill). The pass-1
    intermediate is re-quantized to u8 (<=0.5 intensity noise, bilinear
    samples only). Square images only (the caller falls back otherwise)."""
    n = segs_u8.shape[1]
    packed = _pack_u32(imgs_u8, segs_u8)
    packed_t = jnp.swapaxes(packed, 1, 2)
    # pass-1 input = (effective source)^T: src^T normally; src itself when
    # the sample gathers from the transposed source (tf: |rot| > 45 deg)
    pt = jnp.where(tf[:, None, None], packed, packed_t)
    m = mode[:, None, None]
    rgb1, near1 = _lane_taps2(pt, _boundary(vt, n, m), use_bil)
    rgb1_u = jnp.clip(rgb1 + 0.5, 0, 255).astype(jnp.uint32)
    tmid = (rgb1_u[..., 0] | (rgb1_u[..., 1] << 8) | (rgb1_u[..., 2] << 16)
            | (near1 & jnp.uint32(0xFF000000)))
    tmid = jnp.swapaxes(tmid, 1, 2)        # [B, out-row i, source-col x]
    rgb2, near2 = _lane_taps2(tmid, _boundary(sx, n, m), use_bil)
    # constant-mode fill from the TOTAL source coords (legacy semantics;
    # sy_msk omits the elastic jitter — border effect <= alpha px)
    img_in = (sx >= 0) & (sx <= n - 1) & (sy_msk >= 0) & (sy_msk <= n - 1)
    seg_in = ((sx >= -0.5) & (sx <= n - 0.5)
              & (sy_msk >= -0.5) & (sy_msk <= n - 0.5))
    out_img = jnp.where((m == 0)[..., None] & ~img_in[..., None],
                        cval[:, None, None, None], rgb2)
    out_seg = jnp.where(seg_in, (near2 >> 24).astype(jnp.int32), 0)
    return out_img, out_seg


def _sample_two_pass_banded(imgs_u8, segs_u8, vt, sx, sy_msk, mode, cval,
                            use_bil, tf, out_dtype=jnp.bfloat16):
    """Two-pass warp via the banded-matmul resampler — identical geometry
    fields to _sample_two_pass, but each pass is the gather-free Pallas
    kernel (ops/pallas/banded_resample.py): exact deterministic bilinear
    (or nearest, per the sample's order draw) with seg always nearest.
    Unlike the lane-gather sampler the pass-1 intermediate is NOT
    re-quantized to u8 (bf16 carries it at +-0.5 intensity)."""
    from ..ops.pallas.banded_resample import banded_resample_rows

    n = segs_u8.shape[1]
    planes = jnp.concatenate(
        [jnp.moveaxis(imgs_u8, -1, 1).astype(jnp.bfloat16),
         segs_u8[:, None].astype(jnp.bfloat16)], 1)      # [B, 4, H, W]
    # pass-1 input = (effective source)^T: src^T normally; src itself when
    # the sample gathers from the transposed source (tf: |rot| > 45 deg)
    pt = jnp.where(tf[:, None, None, None], planes,
                   jnp.swapaxes(planes, 2, 3))
    m = mode[:, None, None]
    # bf16 kernel output: halves each pass's HBM write + readback (the
    # f32 [B,4,528,640] out was ~108 MB); accumulation stays f32 in-kernel
    mid = banded_resample_rows(pt, _boundary(vt, n, m), use_bil,
                               out_dtype=out_dtype)
    mid = jnp.swapaxes(mid, 2, 3).astype(jnp.bfloat16)   # [B,4,out-row,x]
    out2 = banded_resample_rows(mid, _boundary(sx, n, m), use_bil,
                                out_dtype=out_dtype)
    rgb2 = jnp.moveaxis(out2[:, :3], 1, -1).astype(jnp.float32)
    seg2 = jnp.round(out2[:, 3].astype(jnp.float32)).astype(jnp.int32)
    # constant-mode fill from the TOTAL source coords (legacy semantics;
    # sy_msk omits the elastic jitter — border effect <= alpha px)
    img_in = (sx >= 0) & (sx <= n - 1) & (sy_msk >= 0) & (sy_msk <= n - 1)
    seg_in = ((sx >= -0.5) & (sx <= n - 0.5)
              & (sy_msk >= -0.5) & (sy_msk <= n - 0.5))
    out_img = jnp.where((m == 0)[..., None] & ~img_in[..., None],
                        cval[:, None, None, None], rgb2)
    out_seg = jnp.where(seg_in, seg2, 0)
    return out_img, out_seg


def _geometric_coords(key, h, w, gates, cfg: AugmentConfig):
    """Per-sample warp coordinates + sampling params (vmapped); the actual
    gather runs once at BATCH level (_sample_*_packed) where the global
    flat gather is 1.7x the vmapped per-image form. Pool members 13/14/15
    gate the elastic/piecewise displacement and the perspective
    homography."""
    (k_mats, k_perm, k_disp, k_mode, k_cval, k_order,
     k_g) = jax.random.split(key, 7)
    kg = jax.random.split(k_g, 3)
    # each budgeted warp member still carries its inner Sometimes(0.5)
    elastic = gates[13] & jax.random.bernoulli(kg[0], cfg.p_sometimes)
    piecewise = gates[14] & jax.random.bernoulli(kg[1], cfg.p_sometimes)
    persp = gates[15] & jax.random.bernoulli(kg[2], cfg.p_sometimes)

    mats = _component_matrices(k_mats, cfg, h, w, persp)
    hmat = _compose_permuted(k_perm, mats)
    disp = _displacement_field(k_disp, cfg, h, w, elastic, piecewise)
    sy, sx = _warp_coords(hmat, disp, h, w)
    # pad_mode=ia.ALL / mode=ia.ALL: random boundary handling
    mode = jax.random.randint(k_mode, (), 0, 4)
    cval = jax.random.uniform(k_cval, (), maxval=255.0)
    if cfg.image_warp_order == 1:
        return sy, sx, mode, cval, jnp.bool_(True), None, None
    if cfg.image_warp_order == 0:
        return sy, sx, mode, cval, jnp.bool_(False), None, None
    # default: per-image order from {nearest, stochastic bilinear} — the
    # dither realizes bilinear weights as tap probabilities (unbiased)
    ko1, ko2, ko3 = jax.random.split(k_order, 3)
    use_bilinear = jax.random.bernoulli(ko1, 0.5)
    scale = jnp.where(use_bilinear, 1.0, 0.0)
    dy = scale * (jax.random.uniform(ko2, (h, w)) - 0.5)
    dx = scale * (jax.random.uniform(ko3, (h, w)) - 0.5)
    return sy, sx, mode, cval, use_bilinear, dy, dx


def _geometric_batch(keys, imgs_u8, segs_u8, gates, cfg: AugmentConfig):
    """Full-fidelity geometric warp for the batch: per-sample coords under
    vmap, then one batch-level sampling stage — the separable two-pass
    lane-gather warp (default, square images), or the legacy packed global
    gather (1 for nearest/stochastic, 4 for exact order=1)."""
    h, w = segs_u8.shape[1], segs_u8.shape[2]

    if (cfg.banded_warp or cfg.separable_warp) and h == w:
        def coords2(k, g):
            return _twopass_coords(jax.random.fold_in(k, 2), h, w, g, cfg)
        vt, sx, sy_msk, mode, cval, use_bil, tf = jax.vmap(coords2)(keys,
                                                                    gates)
        if cfg.banded_warp:
            return _sample_two_pass_banded(
                imgs_u8, segs_u8, vt, sx, sy_msk, mode, cval, use_bil, tf,
                out_dtype=jnp.float32 if cfg.legacy_ops else jnp.bfloat16)
        return _sample_two_pass(imgs_u8, segs_u8, vt, sx, sy_msk, mode,
                                cval, use_bil, tf)

    def coords(k, g):
        return _geometric_coords(jax.random.fold_in(k, 2), h, w, g, cfg)

    sy, sx, mode, cval, use_bil, dy, dx = jax.vmap(coords)(keys, gates)
    if cfg.image_warp_order == 1:
        return _sample_packed(imgs_u8, segs_u8, sy, sx, mode, cval, use_bil)
    return _sample_nearest_packed(imgs_u8, segs_u8, sy, sx, mode, cval,
                                  dither_y=dy, dither_x=dx)


# ---------------------------------------------------------------------------
# photometric pool ops (per-sample fns; f32, 0..255 domain, [H, W, 3])
# ---------------------------------------------------------------------------

def _sep_blur(img, kernel, kernel_w=None):
    """Separable filter on [H, W, C]: 1-D kernel along H then W (kernel_w
    if given, else the same), edge padding. Lowered as two depthwise convs
    (VPU-friendly). Rect-shape fallback of _sep_filter_mxu."""
    k = kernel.shape[0]
    p = k // 2
    c = img.shape[-1]
    kw1 = kernel if kernel_w is None else kernel_w
    dn = ("NHWC", "HWIO", "NHWC")
    kh = jnp.tile(kernel.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(kw1.reshape(1, k, 1, 1), (1, 1, 1, c))
    x = jnp.pad(img, ((p, p), (0, 0), (0, 0)), mode="edge")[None]
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    x = jnp.pad(x[0], ((0, 0), (p, p), (0, 0)), mode="edge")[None]
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return x[0]


def _sep_blur_mxu(img, kernel):
    """Separable blur on [H, W, C] (square H == W) as two MXU matmuls
    against a banded blur matrix (same trick as the banded warp kernel:
    TPUs do dense matmuls ~for free, so a 13-banded [N, N] matrix applied
    on the MXU beats the depthwise-conv lowering, which measured 3.4
    ms/application at 32x513^2 vs ~1.3 for this form — tools/bench_pool).
    Boundary = edge replication: out-of-range taps accumulate onto the
    clamped edge column, exactly _sep_blur's pad(mode='edge') semantics.
    The tap masks are sample-independent (hoisted out of vmap); only the
    13-weight combination is per-sample."""
    return _sep_filter_mxu(img, kernel, kernel)


def _band_matrix(kernel, n, dtype):
    """[n, n] banded filter matrix: K[i, j] = sum_t kernel[t] *
    1{j == clip(i + t - half)} (edge-replicate boundary), built as one
    [k] x [k, n*n] MXU dot so the per-sample work is tiny."""
    k = kernel.shape[0]
    half = k // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eyes = jnp.stack([
        (cols == jnp.clip(rows + (t - half), 0, n - 1)).astype(dtype)
        for t in range(k)])
    return jnp.tensordot(kernel.astype(dtype), eyes, axes=1)


def _sep_filter_mxu(img, kh, kw):
    """Separable filter on square [N, N, C]: 1-D kernel kh along H, kw
    along W, as two banded-matrix MXU matmuls (edge boundary)."""
    n = img.shape[0]
    if img.shape[1] != n:
        return _sep_blur(img, kh, kw)  # rect fallback (non-default sizes)
    kmh = _band_matrix(kh, n, img.dtype)
    tmp = jnp.tensordot(kmh, img, axes=((1,), (0,)))    # [H, W, C]
    kmw = kmh if kw is kh else _band_matrix(kw, n, img.dtype)
    out = jnp.einsum("hwc,vw->hvc", tmp, kmw)
    return out


def _gaussian_kernel(sigma, size: int = 13):
    half = size // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (xs / sig) ** 2)
    # sigma ~ 0 => identity kernel
    ident = (xs == 0).astype(jnp.float32)
    k = jnp.where(sigma < 0.05, ident, k)
    return k / jnp.sum(k)


def _box_kernel(ksize, size: int = 13):
    half = size // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    active = (jnp.abs(xs) <= (ksize - 1) / 2.0).astype(jnp.float32)
    return active / jnp.sum(active)


def _conv3x3(img, kernel3):
    """3x3 conv on [H, W, C] with edge padding (for sharpen/emboss/edges)."""
    x = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            out = out + kernel3[dy, dx] * x[dy:dy + img.shape[0],
                                            dx:dx + img.shape[1]]
    return out


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-9), 0.0)
    safe = jnp.maximum(delta, 1e-9)
    rh = jnp.mod((g - b) / safe, 6.0)
    gh = (b - r) / safe + 2.0
    bh = (r - g) / safe + 4.0
    hh = jnp.where(maxc == r, rh, jnp.where(maxc == g, gh, bh))
    hh = jnp.where(delta < 1e-9, 0.0, hh) * 60.0
    return jnp.stack([hh, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = jnp.mod(h, 360.0) / 60.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def _smooth_noise(key, h, w, cells: int = 8):
    """Band-limited [H, W, 1] noise in [0, 1] (blobby blend masks — stands
    in for imgaug's simplex noise, which needs dynamic lattices)."""
    small = jax.random.uniform(key, (h // cells + 1, w // cells + 1, 1))
    return resize_bilinear(small, (h, w))


def _op_superpixels(key, x, cfg):
    """Sometimes(0.5, Superpixels(p_replace 0-1)): fixed 8x cell mosaic."""
    h, w = x.shape[0], x.shape[1]
    r = jax.random.split(key, 4)
    gh, gw = max(h // 8, 1), max(w // 8, 1)
    mosaic = resize_bilinear(resize_bilinear(x, (gh, gw)), (h, w))
    p_replace = jax.random.uniform(r[0], ())
    rep = jax.random.bernoulli(r[1], p_replace, (gh, gw, 1))
    rep = resize_bilinear(rep.astype(jnp.float32), (h, w)) > 0.5
    sp = jnp.where(rep, mosaic, x)
    inner = jax.random.bernoulli(r[2], cfg.p_sometimes)
    return jnp.where(inner, sp, x)


def _op_blur(key, x, cfg):
    """OneOf {Gaussian(0-3), Average(k 2-7), Median(k 3-11)} — the kernel is
    selected FIRST, then ONE separable blur runs (not three; the OneOf picks
    the kernel, not the outputs). Median -> Gaussian of matched width."""
    r = jax.random.split(key, 4)
    which = jax.random.randint(r[0], (), 0, 3)
    gk = _gaussian_kernel(jax.random.uniform(
        r[1], (), minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1]))
    bk = _box_kernel(jax.random.randint(r[2], (), 2, 8).astype(jnp.float32))
    mk = _gaussian_kernel(
        0.25 * jax.random.randint(r[3], (), 1, 6).astype(jnp.float32) * 2 + 0.25)
    kernel = jnp.where(which == 0, gk, jnp.where(which == 1, bk, mk))
    dt = _pool_dt(cfg)
    blur = _sep_blur if cfg.legacy_ops else _sep_blur_mxu
    return blur(x.astype(dt), kernel.astype(dt)).astype(jnp.float32)


def _pool_dt(cfg):
    return jnp.bfloat16 if cfg.pool_compute == "bf16" else jnp.float32


def _op_sharpen(key, x, cfg):
    # the imgaug sharpen kernel (all -1, center 8+lightness) decomposes as
    # (9+lightness)*x - box3x3sum(x); the separable box sum rides the MXU
    # (same banded-matmul trick as blur) instead of 9 VPU shift-reads
    r = jax.random.split(key, 2)
    dt = _pool_dt(cfg)
    alpha = jax.random.uniform(r[0], ())
    lightness = jax.random.uniform(r[1], (), minval=0.75, maxval=1.5)
    if cfg.legacy_ops:
        k3 = jnp.full((3, 3), -1.0).at[1, 1].set(8.0 + lightness).astype(dt)
        base = _conv3x3(x.astype(dt), k3).astype(jnp.float32)
    else:
        s3 = _sep_blur_mxu(x.astype(dt), jnp.ones((3,), dt))
        base = (9.0 + lightness) * x - s3.astype(jnp.float32)
    return (1 - alpha) * x + alpha * base


def _op_emboss(key, x, cfg):
    r = jax.random.split(key, 2)
    dt = _pool_dt(cfg)
    strength = jax.random.uniform(r[0], (), maxval=2.0)
    ek = jnp.array([[-1.0 - strength, -strength, 0.0],
                    [-strength, 1.0, strength],
                    [0.0, strength, 1.0 + strength]]).astype(dt)
    alpha = jax.random.uniform(r[1], ())
    return (1 - alpha) * x + alpha * _conv3x3(x.astype(dt),
                                              ek).astype(jnp.float32)


def _op_edge_blend(key, x, cfg):
    """BlendAlphaSimplexNoise(OneOf(EdgeDetect, DirectedEdgeDetect)) —
    reference utils/datasets.py:82-88. The directed variant rectifies the
    gradient along a random direction."""
    h, w = x.shape[0], x.shape[1]
    r = jax.random.split(key, 4)
    dt = _pool_dt(cfg)
    # sobel is separable ([1,2,1] smooth x [-1,0,1] diff): two MXU banded
    # matmuls per gradient (same trick as _sep_filter_mxu for blur/sharpen)
    xc = x.astype(dt)
    if cfg.legacy_ops:
        sob = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0],
                         [-1.0, 0.0, 1.0]]).astype(dt)
        gx = _conv3x3(xc, sob).astype(jnp.float32)
        gy = _conv3x3(xc, sob.T).astype(jnp.float32)
    else:
        smooth = jnp.asarray([1.0, 2.0, 1.0], dt)
        diff = jnp.asarray([-1.0, 0.0, 1.0], dt)
        gx = _sep_filter_mxu(xc, smooth, diff).astype(jnp.float32)
        gy = _sep_filter_mxu(xc, diff, smooth).astype(jnp.float32)
    mag = jnp.clip(jnp.sqrt(gx ** 2 + gy ** 2), 0, 255)
    direction = jax.random.uniform(r[0], ()) * 2.0 * jnp.pi
    directed = jnp.clip(jax.nn.relu(gx * jnp.cos(direction)
                                    + gy * jnp.sin(direction)) * 2.0, 0, 255)
    which = jax.random.bernoulli(r[1], 0.5)
    edges = jnp.where(which, mag, directed)
    nmask = _smooth_noise(r[2], h, w)
    ea = jax.random.uniform(r[3], (), minval=0.5, maxval=1.0)
    return x * (1 - nmask * ea) + edges * (nmask * ea)


def _op_noise(key, x, cfg):
    h, w = x.shape[0], x.shape[1]
    r = jax.random.split(key, 3)
    nscale = jax.random.uniform(r[0], (), minval=cfg.noise_scale[0],
                                maxval=cfg.noise_scale[1])
    per_ch = jax.random.bernoulli(r[1], 0.5)
    dt = _pool_dt(cfg)
    n = jax.random.normal(r[2], (h, w, 3), dtype=dt) * nscale.astype(dt)
    return x + jnp.where(per_ch, n,
                         jnp.broadcast_to(n[..., :1], (h, w, 3)))


def _op_dropout(key, x, cfg):
    """OneOf {Dropout(per_channel .5), CoarseDropout(per_channel .2)} — the
    per-channel masks reuse the single-channel uniform fields (only one
    branch is consumed per sample)."""
    h, w = x.shape[0], x.shape[1]
    r = jax.random.split(key, 6)
    dp = jax.random.uniform(r[0], (), minval=cfg.dropout_p[0],
                            maxval=cfg.dropout_p[1])
    dt = _pool_dt(cfg)
    u = jax.random.uniform(r[1], (h, w, 3), dtype=dt)
    dp = dp.astype(dt)
    keep = jnp.where(jax.random.bernoulli(r[2], 0.5),
                     u >= dp, jnp.broadcast_to(u[..., :1] >= dp, (h, w, 3)))
    cdp = jax.random.uniform(r[3], (), minval=cfg.coarse_dropout_p[0],
                             maxval=cfg.coarse_dropout_p[1])
    ch, cw = max(h // 24, 1), max(w // 24, 1)
    uc = jax.random.uniform(r[4], (ch, cw, 3))
    ucf = resize_bilinear(uc, (h, w))
    ckeep = jnp.where(jax.random.bernoulli(r[5], 0.2),
                      ucf >= cdp,
                      jnp.broadcast_to(ucf[..., :1] >= cdp, (h, w, 3)))
    which = jax.random.bernoulli(jax.random.fold_in(key, 9), 0.5)
    return x * jnp.where(which, keep, ckeep)


def _op_invert(key, x, cfg):
    inv = jax.random.bernoulli(key, cfg.invert_p, (1, 1, 3))
    return jnp.where(inv, 255.0 - x, x)


def _op_add(key, x, cfg):
    r = jax.random.split(key, 3)
    per_ch = jax.random.bernoulli(r[0], 0.5)
    a3 = jax.random.uniform(r[1], (1, 1, 3), minval=cfg.add_range[0],
                            maxval=cfg.add_range[1])
    a1 = jax.random.uniform(r[2], (1, 1, 1), minval=cfg.add_range[0],
                            maxval=cfg.add_range[1])
    return x + jnp.where(per_ch, a3, a1)


def _op_hue_sat(key, x, cfg):
    # bf16 HSV roundtrip: hue ULP at 360 deg ~= 2 deg == cv2's u8 HSV
    # granularity (H in 0..179), the space the reference op runs in
    r = jax.random.split(key, 2)
    dt = _pool_dt(cfg)
    hsv = _rgb_to_hsv(jnp.clip(x.astype(dt), 0, 255) / dt(255.0))
    dh = jax.random.uniform(r[0], (), minval=cfg.hue_sat_range[0],
                            maxval=cfg.hue_sat_range[1]) * 2.0  # 0..179 -> deg
    dsat = jax.random.uniform(r[1], (), minval=cfg.hue_sat_range[0],
                              maxval=cfg.hue_sat_range[1]) / 255.0
    hsv = hsv.at[..., 0].add(dh.astype(dt))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] + dsat.astype(dt),
                                      0.0, 1.0))
    return (_hsv_to_rgb(hsv) * 255.0).astype(jnp.float32)


def _op_multiply(key, x, cfg):
    """OneOf {Multiply(per_channel .5), BlendAlphaFrequencyNoise(
    fg=Multiply per-channel, bg=LinearContrast)} — reference
    utils/datasets.py:105-110. The frequency mask mixes band-limited and
    white noise by the sampled exponent."""
    h, w = x.shape[0], x.shape[1]
    r = jax.random.split(key, 9)
    lo, hi = cfg.multiply_range
    per_ch = jax.random.bernoulli(r[0], 0.5)
    m3 = jax.random.uniform(r[1], (1, 1, 3), minval=lo, maxval=hi)
    m1 = jax.random.uniform(r[2], (1, 1, 1), minval=lo, maxval=hi)
    whole = x * jnp.where(per_ch, m3, m1)
    # frequency-noise branch: exponent -4 (blobs) .. 0 (white)
    e = jax.random.uniform(r[3], (), minval=-4.0, maxval=0.0)
    t = 2.0 ** e
    mask = ((1 - t) * _smooth_noise(r[4], h, w, cells=16)
            + t * jax.random.uniform(r[5], (h, w, 1)))
    fg = x * jax.random.uniform(r[6], (1, 1, 3), minval=lo, maxval=hi)
    cb = jax.random.uniform(r[7], (), minval=cfg.contrast_range[0],
                            maxval=cfg.contrast_range[1])
    bg = 127.0 + cb * (x - 127.0)
    freq = mask * fg + (1 - mask) * bg
    return jnp.where(jax.random.bernoulli(r[8], 0.5), whole, freq)


def _op_contrast(key, x, cfg):
    r = jax.random.split(key, 3)
    per_ch = jax.random.bernoulli(r[0], 0.5)
    c3 = jax.random.uniform(r[1], (1, 1, 3), minval=cfg.contrast_range[0],
                            maxval=cfg.contrast_range[1])
    c1 = jax.random.uniform(r[2], (1, 1, 1), minval=cfg.contrast_range[0],
                            maxval=cfg.contrast_range[1])
    return 127.0 + jnp.where(per_ch, c3, c1) * (x - 127.0)


def _op_grayscale(key, x, cfg):
    ga = jax.random.uniform(key, ())
    gray = (0.299 * x[..., 0] + 0.587 * x[..., 1]
            + 0.114 * x[..., 2])[..., None]
    return (1 - ga) * x + ga * gray


_PHOTO_OPS = [_op_superpixels, _op_blur, _op_sharpen, _op_emboss,
              _op_edge_blend, _op_noise, _op_dropout, _op_invert, _op_add,
              _op_hue_sat, _op_multiply, _op_contrast, _op_grayscale]
assert len(_PHOTO_OPS) == _N_PHOTO


def _photometric_batch(key_order, keys, x, gates, cfg: AugmentConfig):
    """Apply the 13 photometric pool members to the batch in a random order
    (SomeOf random_order=True). Default: ONE order per batch (documented
    approximation — the reference draws the order per sample). Selection
    gates stay per-sample. cfg.per_sample_photo_order=True restores exact
    per-sample ordering via vmapped switch — under vmap every branch
    executes at every scan position (13x13 op applications vs 13), so this
    is measurement-gated (tools/bench_augment.py ab; PERF.md)."""
    carry_dt = {"u8": jnp.uint8, "bf16": jnp.bfloat16,
                "f32": jnp.float32}[cfg.photo_carry]
    u8 = cfg.photo_carry == "u8"

    def _quant(v):
        # u8 carry: requantize like imgaug does after EVERY augmenter
        return jnp.clip(jnp.round(v), 0.0, 255.0) if u8 else v

    if cfg.per_sample_photo_order:
        def one_sample(k, img, g):
            branches = [
                (lambda im, i=i, op=op: jnp.where(
                    g[i],
                    _quant(op(jax.random.fold_in(k, 100 + i),
                              im.astype(jnp.float32), cfg)),
                    im.astype(jnp.float32)).astype(carry_dt))
                for i, op in enumerate(_PHOTO_OPS)]

            def body(im, idx):
                return jax.lax.switch(idx, branches, im), None

            perm = jax.random.permutation(jax.random.fold_in(k, 977),
                                          _N_PHOTO)
            im, _ = jax.lax.scan(body, _quant(img).astype(carry_dt), perm)
            return im

        x = jax.vmap(one_sample)(keys, x, gates)
        return jnp.clip(x.astype(jnp.float32), 0.0, 255.0)

    branches = []
    for i, op in enumerate(_PHOTO_OPS):
        def branch(xb, i=i, op=op):
            def one(k, img, g):
                img = img.astype(jnp.float32)
                out = _quant(op(jax.random.fold_in(k, 100 + i), img, cfg))
                return jnp.where(g, out, img).astype(carry_dt)
            return jax.vmap(one)(keys, xb, gates[:, i])
        branches.append(branch)

    perm = jax.random.permutation(key_order, _N_PHOTO)

    # unrolled runtime-permuted switches: a lax.scan-of-switch pays while
    # loop carry/condition overhead per iteration (~0.3 ms/iter at
    # 32x513^2 over the pure branch cost — tools/bench_pool.py round 5);
    # 13 unrolled switches keep the identical per-batch order semantics
    x = _quant(x).astype(carry_dt)
    if cfg.legacy_ops:
        def body(xb, idx):
            return jax.lax.switch(idx, branches, xb), None
        x, _ = jax.lax.scan(body, x, perm)
    else:
        for s in range(_N_PHOTO):
            x = jax.lax.switch(perm[s], branches, x)
    return jnp.clip(x.astype(jnp.float32), 0.0, 255.0)


# ---------------------------------------------------------------------------
# fast separable geometric path (MXU matmuls, no gathers)
# ---------------------------------------------------------------------------

def _axis_interp_matrix(src, n, nearest: bool):
    """[n_out, n] interpolation matrix for per-sample 1-D source coords
    `src` [n_out] (built on device from iota math; 2 nnz per row)."""
    cols = jax.lax.broadcasted_iota(jnp.float32, (src.shape[0], n), 1)
    d = jnp.abs(src[:, None] - cols)
    if nearest:
        # 1 at the nearest integer column (ties -> lower index like floor+.5)
        near = jnp.round(src)[:, None]
        m = (cols == jnp.clip(near, 0, n - 1)).astype(jnp.float32)
    else:
        m = jnp.maximum(0.0, 1.0 - d)
    in_range = ((src >= -0.5) & (src <= n - 0.5))[:, None]
    return m * in_range.astype(jnp.float32)


def _separable_coords(key, cfg: AugmentConfig, n: int, w_axis: bool):
    """Per-axis source coordinates for scale/translate/crop-pad around the
    center. Returns src [n]."""
    ks = jax.random.split(key, 4)
    do_cap = jax.random.bernoulli(ks[0], cfg.p_crop_pad)
    lo, hi = cfg.crop_pad_percent
    side = jax.random.uniform(ks[1], (2,), minval=lo, maxval=hi) * n
    do_aff = jax.random.bernoulli(ks[2], cfg.p_affine)
    k3 = jax.random.split(ks[3], 2)
    scale = jnp.where(do_aff, jax.random.uniform(
        k3[0], (), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]), 1.0)
    trans = jnp.where(do_aff, jax.random.uniform(
        k3[1], (), minval=cfg.translate_range[0],
        maxval=cfg.translate_range[1]) * n, 0.0)
    out = jax.lax.broadcasted_iota(jnp.float32, (n, 1), 0)[:, 0]
    c = (n - 1) / 2.0
    # inverse affine: dst -> src (scale about center, then translate)
    src = (out - c - trans) / scale + c
    # crop-and-pad: dst in [0,n) maps to src in [l, n-r)
    l, r = side[0], side[1]
    cap_scale = jnp.maximum(n - l - r, 1.0) / n
    src_cap = src * cap_scale + l
    return jnp.where(do_cap, src_cap, src)


def _fast_geometric_one(key, img, seg, cfg: AugmentConfig):
    """img [H,W,3] f32, seg [H,W] i32 -> same shapes; MXU-only warp."""
    h, w = img.shape[0], img.shape[1]
    ks = jax.random.split(key, 5)

    # flips + 90-deg rotation family (square images only for rot90)
    flip_lr = jax.random.bernoulli(ks[0], cfg.p_fliplr)
    flip_ud = jax.random.bernoulli(ks[1], cfg.p_flipud)
    img = jnp.where(flip_lr, img[:, ::-1], img)
    seg = jnp.where(flip_lr, seg[:, ::-1], seg)
    img = jnp.where(flip_ud, img[::-1], img)
    seg = jnp.where(flip_ud, seg[::-1], seg)
    if h == w:
        do_rot = jax.random.bernoulli(ks[2], cfg.p_affine)
        quarter = jax.random.randint(ks[3], (), 0, 4)
        k = jnp.where(do_rot, quarter, 0)
        imgs = jnp.stack([img, jnp.rot90(img), jnp.rot90(img, 2),
                          jnp.rot90(img, 3)])
        segs = jnp.stack([seg, jnp.rot90(seg), jnp.rot90(seg, 2),
                          jnp.rot90(seg, 3)])
        img = imgs[k]
        seg = segs[k]

    # separable scale/translate/crop-pad as two matmuls
    ky, kx = jax.random.split(ks[4], 2)
    sy = _separable_coords(ky, cfg, h, False)
    sx = _separable_coords(kx, cfg, w, True)
    mv = _axis_interp_matrix(sy, h, nearest=False)        # [H, H]
    mh = _axis_interp_matrix(sx, w, nearest=False)        # [W, W]
    img = jnp.einsum("ij,jwc->iwc", mv, img,
                     precision=jax.lax.Precision.HIGHEST)
    img = jnp.einsum("xw,hwc->hxc", mh, img,
                     precision=jax.lax.Precision.HIGHEST)
    mvn = _axis_interp_matrix(sy, h, nearest=True)
    mhn = _axis_interp_matrix(sx, w, nearest=True)
    segf = seg.astype(jnp.float32)
    segf = jnp.einsum("ij,jw->iw", mvn, segf,
                      precision=jax.lax.Precision.HIGHEST)
    segf = jnp.einsum("xw,hw->hx", mhn, segf,
                      precision=jax.lax.Precision.HIGHEST)
    return img, jnp.round(segf).astype(jnp.int32)


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def make_augment_fn(config: AugmentConfig | None = None):
    """Returns jittable fn(rng, images u8 [B,H,W,3], segs u8 [B,H,W]) ->
    (images f32 0..255, segs int32). One fused program per batch shape."""
    cfg = config or AugmentConfig()

    def augment_batch(rng, images, segs):
        b = images.shape[0]
        if cfg.rng_impl is not None:
            # deterministically re-key into the requested implementation
            raw = (jax.random.key_data(rng)
                   if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                   else rng).reshape(-1)
            data = jnp.tile(raw, 4)[:4].astype(jnp.uint32)
            rng = jax.random.wrap_key_data(data, impl=cfg.rng_impl)
        rng, k_order = jax.random.split(rng)
        keys = jax.random.split(rng, b)
        gates = jax.vmap(
            lambda k: _someof_gates(jax.random.fold_in(k, 1), cfg))(keys)

        if cfg.fast_geometric:
            def geo(k, img_u8, seg_u8):
                return _fast_geometric_one(
                    jax.random.fold_in(k, 2), img_u8.astype(jnp.float32),
                    seg_u8.astype(jnp.int32), cfg)
            imgs, out_segs = jax.vmap(geo)(keys, images, segs)
        else:
            imgs, out_segs = _geometric_batch(keys, images, segs, gates,
                                              cfg)

        imgs = _photometric_batch(k_order, keys, imgs, gates, cfg)
        return imgs, out_segs

    return augment_batch
