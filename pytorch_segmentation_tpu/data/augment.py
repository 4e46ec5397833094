"""On-device batched augmentation — TPU-native rebuild of the imgaug
TRAIN_AUGS policy (reference utils/datasets.py:19-125).

The reference runs ~17 imgaug augmenters per sample on CPU worker processes —
the training hot loop's bottleneck (SURVEY.md §3.1). Here the whole policy is
ONE jitted, vmapped function over the uint8 batch:

  * All geometric ops (fliplr/flipud, CropAndPad, Affine
    scale/translate/rotate/shear, PerspectiveTransform, ElasticTransformation,
    PiecewiseAffine) compose into a single per-sample homography + dense
    displacement field, applied with ONE bilinear gather for the image and
    ONE nearest gather for the mask — image and mask are warped with
    identical parameters (the reference's to_deterministic() contract,
    utils/datasets.py:186-189), and masks always use nearest + 0 fill.
  * Photometric ops (blur family, sharpen, emboss, edge-blend, noise,
    dropout/coarse-dropout, invert, add, hue/saturation, multiply,
    contrast, grayscale, superpixel-mosaic) are vectorized elementwise/conv
    ops gated per sample, with SomeOf(0..5) subset selection done via
    per-sample top-k masking.

Per-sample randomness comes from folding the sample index into the batch key
— no Python-side RNG in the hot path.

Documented approximations vs imgaug (same spirit, cheaper on TPU):
  - MedianBlur is approximated by a second Gaussian blur (true rank filters
    are hostile to vector units); Superpixels by block-mosaic averaging
    (SLIC clustering is sequential); BlendAlphaSimplexNoise masks use
    bilinearly-upsampled uniform noise instead of simplex noise.
  - ops apply in fixed order (imgaug shuffles order per sample).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear

__all__ = ["AugmentConfig", "make_augment_fn"]


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
    # interpolation order of the general image warp: 0 = nearest (ONE
    # packed u32 gather for image+mask — 5x fewer gathers; within the
    # reference's own distribution, imgaug Affine samples order from [0, 1]
    # per image, utils/datasets.py:47-50), 1 = bilinear (4-tap, smoother,
    # ~5x slower on TPU). Masks always warp nearest.
    image_warp_order: int = 0
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
# geometric machinery
# ---------------------------------------------------------------------------

def _affine_matrix(key, cfg: AugmentConfig, h: int, w: int):
    """Per-sample forward 3x3 homography (dst <- src pixel coords)."""
    ks = jax.random.split(key, 16)
    eye = jnp.eye(3)

    # flips about the image center
    flip_lr = jax.random.bernoulli(ks[0], cfg.p_fliplr)
    flip_ud = jax.random.bernoulli(ks[1], cfg.p_flipud)
    fx = jnp.where(flip_lr, -1.0, 1.0)
    fy = jnp.where(flip_ud, -1.0, 1.0)
    flip = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    flip = flip.at[0, 0].set(fx).at[0, 2].set(jnp.where(flip_lr, w - 1.0, 0.0))
    flip = flip.at[1, 1].set(fy).at[1, 2].set(jnp.where(flip_ud, h - 1.0, 0.0))

    # CropAndPad: per-side percent in crop_pad_percent, keep_size=True
    do_cap = jax.random.bernoulli(ks[2], cfg.p_crop_pad)
    lo, hi = cfg.crop_pad_percent
    sides = jax.random.uniform(ks[3], (4,), minval=lo, maxval=hi)
    l, r = sides[0] * w, sides[1] * w
    t, b = sides[2] * h, sides[3] * h
    sx = w / jnp.maximum(w - l - r, 1.0)
    sy = h / jnp.maximum(h - t - b, 1.0)
    cap = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    cap = cap.at[0, 0].set(sx).at[0, 2].set(-l * sx)
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
    rot = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
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
    do_persp = jax.random.bernoulli(ks[11], cfg.p_sometimes * 0.3)
    pscale = jax.random.uniform(ks[12], (), minval=cfg.perspective_scale[0],
                                maxval=cfg.perspective_scale[1])
    jitter = jax.random.normal(ks[13], (4, 2)) * pscale * jnp.array([w, h])
    src = jnp.array([[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0],
                     [0.0, h - 1.0]])
    dst = src + jitter
    persp = _fit_homography(src, dst)
    persp = jnp.where(do_persp, persp, eye)

    return persp @ aff @ cap @ flip


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


def _displacement_field(key, cfg: AugmentConfig, h: int, w: int):
    """Elastic + piecewise-affine as an additive sampling-coordinate field."""
    ks = jax.random.split(key, 6)
    # ElasticTransformation(alpha 0.5-3.5, sigma .25): near-per-pixel jitter
    do_el = jax.random.bernoulli(ks[0], cfg.p_sometimes * 0.3)
    alpha = jax.random.uniform(ks[1], (), minval=cfg.elastic_alpha[0],
                               maxval=cfg.elastic_alpha[1])
    el = jax.random.uniform(ks[2], (h, w, 2), minval=-1.0, maxval=1.0) * alpha
    el = jnp.where(do_el, el, 0.0)
    # PiecewiseAffine(scale 0.01-0.05): coarse 5x5 grid displacement,
    # bilinearly upsampled
    do_pw = jax.random.bernoulli(ks[3], cfg.p_sometimes * 0.3)
    pscale = jax.random.uniform(ks[4], (), minval=cfg.piecewise_scale[0],
                                maxval=cfg.piecewise_scale[1])
    grid = jax.random.normal(ks[5], (5, 5, 2)) * pscale * jnp.array([w, h])
    pw = resize_bilinear(grid, (h, w), align_corners=True)
    pw = jnp.where(do_pw, pw, 0.0)
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


def _sample_bilinear(img, sy, sx, mode, cval):
    """img [H, W, C] f32; returns warped [H, W, C]."""
    h, w = img.shape[0], img.shape[1]
    in_range = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    sx = _boundary(sx, w, mode)
    sy = _boundary(sy, h, mode)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
           + v10 * wy * (1 - wx) + v11 * wy * wx)
    constant = (mode == 0) & ~in_range
    return jnp.where(constant[..., None], cval, out)


def _sample_nearest(seg, sy, sx):
    """seg [H, W] int; nearest warp with 0 fill outside (mask semantics)."""
    h, w = seg.shape
    in_range = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
    xi = jnp.clip(jnp.round(sx), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(sy), 0, h - 1).astype(jnp.int32)
    out = seg[yi, xi]
    return jnp.where(in_range, out, 0)


def _sample_nearest_packed(img, seg, sy, sx, mode, cval):
    """Nearest warp of image+mask with ONE gather: the 3 uint8 channels and
    the uint8 mask pack into a single uint32 per pixel. TPUs have no vector
    gather, so gather count dominates augmentation cost (PERF.md)."""
    h, w = seg.shape
    packed = (img[..., 0].astype(jnp.uint32)
              | (img[..., 1].astype(jnp.uint32) << 8)
              | (img[..., 2].astype(jnp.uint32) << 16)
              | (seg.astype(jnp.uint32) << 24))
    img_in = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    seg_in = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
    # image boundary mode (mask always 0 outside, checked separately)
    bx = _boundary(sx, w, mode)
    by = _boundary(sy, h, mode)
    xi = jnp.clip(jnp.round(bx), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(by), 0, h - 1).astype(jnp.int32)
    g = packed[yi, xi]
    out_img = jnp.stack([
        (g & 0xFF).astype(jnp.float32),
        ((g >> 8) & 0xFF).astype(jnp.float32),
        ((g >> 16) & 0xFF).astype(jnp.float32),
    ], axis=-1)
    constant = (mode == 0) & ~img_in
    out_img = jnp.where(constant[..., None], cval, out_img)
    out_seg = jnp.where(seg_in, (g >> 24).astype(jnp.int32), 0)
    return out_img, out_seg


# ---------------------------------------------------------------------------
# photometric ops (f32, 0..255 domain, [H, W, 3])
# ---------------------------------------------------------------------------

def _sep_blur(img, kernel):
    """Separable blur on [H, W, C]: 1-D kernel along H then W, edge padding.
    Lowered as two depthwise convs (VPU-friendly)."""
    k = kernel.shape[0]
    p = k // 2
    c = img.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    kh = jnp.tile(kernel.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(kernel.reshape(1, k, 1, 1), (1, 1, 1, c))
    x = jnp.pad(img, ((p, p), (0, 0), (0, 0)), mode="edge")[None]
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    x = jnp.pad(x[0], ((0, 0), (p, p), (0, 0)), mode="edge")[None]
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return x[0]


def _gaussian_kernel(sigma, size: int = 13):
    half = size // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (xs / sig) ** 2)
    # sigma ~ 0 => identity kernel
    ident = (xs == 0).astype(jnp.float32)
    k = jnp.where(sigma < 0.05, ident, k)
    return k / jnp.sum(k)


def _box_kernel(ksize, size: int = 7):
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


def _photometric(key, img, cfg: AugmentConfig):
    """Apply the SomeOf(0..5) photometric pool to one image [H, W, 3] f32."""
    n_ops = 13
    ks = jax.random.split(key, n_ops + 40)
    h, w = img.shape[0], img.shape[1]

    # SomeOf(0..5): pick k uniformly, then a random subset of size k
    k_count = jax.random.randint(ks[0], (), 0, cfg.someof_max + 1)
    scores = jax.random.uniform(ks[1], (n_ops,))
    desc = -jnp.sort(-scores)
    thresh = desc[jnp.clip(k_count - 1, 0, n_ops - 1)]
    gates = jnp.where(k_count > 0, scores >= thresh, False)

    def gate(i, new, old):
        return jnp.where(gates[i], new, old)

    r = ks[2:]
    x = img

    # 0: superpixel mosaic (Sometimes 0.5 inside the pool); fixed 8x cell
    # grid — shapes must be static under jit, so n_segments can't vary
    gh = max(h // 8, 1)
    gw = max(w // 8, 1)
    mosaic = resize_bilinear(resize_bilinear(x, (gh, gw)), (h, w))
    p_replace = jax.random.uniform(r[1], ())
    rep_mask = jax.random.bernoulli(r[2], p_replace, (gh, gw, 1))
    rep_mask = resize_bilinear(rep_mask.astype(jnp.float32), (h, w)) > 0.5
    sp = jnp.where(rep_mask, mosaic, x)
    inner = jax.random.bernoulli(r[3], cfg.p_sometimes)
    x = gate(0, jnp.where(inner, sp, x), x)

    # 1: blur OneOf {gaussian, average, gaussian-as-median}
    which = jax.random.randint(r[4], (), 0, 3)
    sigma = jax.random.uniform(r[5], (), minval=cfg.blur_sigma[0],
                               maxval=cfg.blur_sigma[1])
    gk = _gaussian_kernel(sigma)
    bk_size = jax.random.randint(r[6], (), 2, 8).astype(jnp.float32)
    bk = _box_kernel(bk_size, size=7)
    gb = _sep_blur(x, gk)
    ab = _sep_blur(x, bk)
    mk = _gaussian_kernel(jax.random.uniform(r[7], (), minval=0.8, maxval=2.5))
    mb = _sep_blur(x, mk)
    blurred = jnp.where(which == 0, gb, jnp.where(which == 1, ab, mb))
    x = gate(1, blurred, x)

    # 2: sharpen (alpha 0-1, lightness 0.75-1.5)
    alpha = jax.random.uniform(r[8], ())
    lightness = jax.random.uniform(r[9], (), minval=0.75, maxval=1.5)
    base = _conv3x3(x, jnp.full((3, 3), -1.0).at[1, 1].set(8.0 + lightness))
    x = gate(2, (1 - alpha) * x + alpha * base, x)

    # 3: emboss (alpha 0-1, strength 0-2)
    strength = jax.random.uniform(r[10], (), maxval=2.0)
    ek = jnp.array([[-1.0 - strength, -strength, 0.0],
                    [-strength, 1.0, strength],
                    [0.0, strength, 1.0 + strength]])
    alpha_e = jax.random.uniform(r[11], ())
    x = gate(3, (1 - alpha_e) * x + alpha_e * _conv3x3(x, ek), x)

    # 4: edge-detect blended by a smooth noise mask
    sobel_x = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    sobel_y = sobel_x.T
    edges = jnp.sqrt(_conv3x3(x, sobel_x) ** 2 + _conv3x3(x, sobel_y) ** 2)
    edges = jnp.clip(edges, 0, 255)
    noise_small = jax.random.uniform(r[12], (h // 8 + 1, w // 8 + 1, 1))
    nmask = resize_bilinear(noise_small, (h, w))
    ea = jax.random.uniform(r[13], (), minval=0.5, maxval=1.0)
    x = gate(4, x * (1 - nmask * ea) + edges * (nmask * ea), x)

    # 5: additive gaussian noise (per_channel 0.5)
    nscale = jax.random.uniform(r[14], (), minval=cfg.noise_scale[0],
                                maxval=cfg.noise_scale[1])
    per_ch = jax.random.bernoulli(r[15], 0.5)
    n3 = jax.random.normal(r[16], (h, w, 3)) * nscale
    n1 = jax.random.normal(r[17], (h, w, 1)) * nscale
    x = gate(5, x + jnp.where(per_ch, n3, jnp.broadcast_to(n1, (h, w, 3))), x)

    # 6: dropout OneOf {pixel, coarse}
    dp = jax.random.uniform(r[18], (), minval=cfg.dropout_p[0],
                            maxval=cfg.dropout_p[1])
    keep = ~jax.random.bernoulli(r[19], dp, (h, w, 1))
    cdp = jax.random.uniform(r[20], (), minval=cfg.coarse_dropout_p[0],
                             maxval=cfg.coarse_dropout_p[1])
    ch, cw = max(h // 24, 1), max(w // 24, 1)
    ckeep = ~jax.random.bernoulli(r[21], cdp, (ch, cw, 1))
    ckeep = resize_bilinear(ckeep.astype(jnp.float32), (h, w)) > 0.5
    which_d = jax.random.bernoulli(r[22], 0.5)
    mask = jnp.where(which_d, keep, ckeep)
    x = gate(6, x * mask, x)

    # 7: invert (p=0.05 per channel)
    inv = jax.random.bernoulli(r[23], cfg.invert_p, (1, 1, 3))
    x = gate(7, jnp.where(inv, 255.0 - x, x), x)

    # 8: add brightness ±10 (per_channel 0.5)
    per_ch_a = jax.random.bernoulli(r[24], 0.5)
    a3 = jax.random.uniform(r[25], (1, 1, 3), minval=cfg.add_range[0],
                            maxval=cfg.add_range[1])
    a1 = jax.random.uniform(r[26], (1, 1, 1), minval=cfg.add_range[0],
                            maxval=cfg.add_range[1])
    x = gate(8, x + jnp.where(per_ch_a, a3, a1), x)

    # 9: hue / saturation shift ±20 (cv2 uint8-HSV units)
    hsv = _rgb_to_hsv(jnp.clip(x, 0, 255) / 255.0)
    dh = jax.random.uniform(r[27], (), minval=cfg.hue_sat_range[0],
                            maxval=cfg.hue_sat_range[1]) * 2.0  # H: 0..179 -> deg
    dsat = jax.random.uniform(r[28], (), minval=cfg.hue_sat_range[0],
                              maxval=cfg.hue_sat_range[1]) / 255.0
    hsv = hsv.at[..., 0].add(dh)
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] + dsat, 0.0, 1.0))
    x = gate(9, _hsv_to_rgb(hsv) * 255.0, x)

    # 10: multiply OneOf {whole-image multiply, freq-noise multiply approx}
    per_ch_m = jax.random.bernoulli(r[29], 0.5)
    m3 = jax.random.uniform(r[30], (1, 1, 3), minval=cfg.multiply_range[0],
                            maxval=cfg.multiply_range[1])
    m1 = jax.random.uniform(r[31], (1, 1, 1), minval=cfg.multiply_range[0],
                            maxval=cfg.multiply_range[1])
    x = gate(10, x * jnp.where(per_ch_m, m3, m1), x)

    # 11: linear contrast 0.5-2.0 (per_channel 0.5)
    per_ch_c = jax.random.bernoulli(r[32], 0.5)
    c3 = jax.random.uniform(r[33], (1, 1, 3), minval=cfg.contrast_range[0],
                            maxval=cfg.contrast_range[1])
    c1 = jax.random.uniform(r[34], (1, 1, 1), minval=cfg.contrast_range[0],
                            maxval=cfg.contrast_range[1])
    cf = jnp.where(per_ch_c, c3, c1)
    x = gate(11, 127.0 + cf * (x - 127.0), x)

    # 12: grayscale (alpha 0-1)
    ga = jax.random.uniform(r[35], ())
    gray = (0.299 * x[..., 0] + 0.587 * x[..., 1]
            + 0.114 * x[..., 2])[..., None]
    x = gate(12, (1 - ga) * x + ga * gray, x)

    return jnp.clip(x, 0.0, 255.0)


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

    def augment_one(key, img_u8, seg_u8):
        h, w = img_u8.shape[0], img_u8.shape[1]
        k_geo, k_disp, k_photo, k_mode, k_cval = jax.random.split(key, 5)
        img = img_u8.astype(jnp.float32)
        seg = seg_u8.astype(jnp.int32)

        if cfg.fast_geometric:
            img, seg = _fast_geometric_one(k_geo, img, seg, cfg)
        else:
            hmat = _affine_matrix(k_geo, cfg, h, w)
            disp = _displacement_field(k_disp, cfg, h, w)
            sy, sx = _warp_coords(hmat, disp, h, w)
            # pad_mode=ia.ALL / mode=ia.ALL: random boundary handling
            mode = jax.random.randint(k_mode, (), 0, 4)
            cval = jax.random.uniform(k_cval, (), maxval=255.0)
            if cfg.image_warp_order == 0:
                img, seg = _sample_nearest_packed(img_u8, seg_u8, sy, sx,
                                                  mode, cval)
            else:
                img = _sample_bilinear(img, sy, sx, mode, cval)
                seg = _sample_nearest(seg, sy, sx)

        img = _photometric(k_photo, img, cfg)
        return img, seg

    def augment_batch(rng, images, segs):
        b = images.shape[0]
        keys = jax.random.split(rng, b)
        return jax.vmap(augment_one)(keys, images, segs)

    return augment_batch
