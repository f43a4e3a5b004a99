"""Device-side augmentation: the ImageNet train transform as one jittable
batched JAX program over uint8 inputs.

TPU-native replacement for per-image host PIL work (the reference feeds 10
DataLoader worker processes, train.py:294-311; this repo's host path is
data/transforms.py). The host only memcpys pre-decoded uint8 squares
(data/cache.py) into batches; RandomResizedCrop, hflip, RandAugment
(rand-m9-mstd0.5-inc1), normalize, and RandomErasing all run on-chip,
fused into the training step ahead of mixup — so a 1-core host that tops
out at ~150 img/s of PIL augmentation can feed a chip consuming >4k img/s.

Semantics mirror data/transforms.py (itself timm's policy) with these
documented deviations:
- geometric resampling is bilinear (not bicubic), PIL pixel-center
  convention, same mean-gray fill;
- RandomResizedCrop draws its 10 candidate boxes vectorized and picks the
  first valid one (same acceptance rule);
- color/enhance ops run in continuous [0,255] space (PIL quantizes to
  uint8 between ops); the histogram ops (equalize/autocontrast/posterize/
  solarize) first round to integer bins and then apply PIL's exact
  integer LUT math.

The always-executed crop+resize is expressed as two separable per-image
interpolation matmuls (MXU work, no gathers); the rarely-selected
geometric RandAugment ops (5 of 15 branches) use a masked bilinear
gather. All randomness is derived from one PRNG key per image.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
_MAX_LEVEL = 10.0
# matches transforms.py _FILL: round(255 * mean) per channel
_FILL = jnp.asarray([124.0, 116.0, 104.0], jnp.float32)


@dataclasses.dataclass(frozen=True)
class DeviceAugConfig:
    input_size: int = 224
    recipe: str = "imagenet"  # "imagenet": RRC+hflip+RA+erase;
    # "asl" (COCO/NUS-WIDE multilabel): square resize + CutoutPIL + RA
    aa: str = "rand-m9-mstd0.5-inc1"  # "" disables (NABirds)
    color_jitter: float = 0.0  # applied only when aa is disabled, like
    # the host recipe (pipeline.py train_fn / timm
    # transforms_imagenet_train): brightness/contrast/saturation in
    # random order, factors U[max(0,1-f), 1+f]
    ra_group_size: int = 16  # images sharing one RA op draw (see
    # _rand_augment_batch; 1 = exact per-image op choice; 16 measured
    # best on v5e b256: 8.7ms vs 11.4 at 8 -- the lax.map round-trips
    # dominate below that)
    hflip: float = 0.5
    reprob: float = 0.25
    recount: int = 1
    scale: tuple = (0.08, 1.0)
    ratio: tuple = (3 / 4, 4 / 3)
    crop_pct: float = 0.875  # eval only


# --------------------------------------------------------------------------
# separable bilinear resize as two matmuls
# --------------------------------------------------------------------------
def _interp_matrix(out_size: int, in_size: int, start, length):
    """[out_size, in_size] PIL-bilinear row-interp matrix for resampling
    the source interval [start, start+length) to out_size pixels.

    PIL's resize scales the triangle filter's support by the downscale
    ratio (area-adaptive antialiasing) and renormalizes windows clipped
    at the image edge; expressed densely that is simply a row-normalized
    triangle((col_center - out_center)/filterscale) matrix."""
    scale = length / out_size
    fscale = jnp.maximum(scale, 1.0)
    xo = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    center = start + xo * scale
    cols = jnp.arange(in_size, dtype=jnp.float32) + 0.5
    d = (cols[None, :] - center[:, None]) / fscale
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)


def _crop_resize(img, top, left, h, w, out_size: int):
    """img [S,S,3] float -> [out,out,3]: resize the (top,left,h,w) box."""
    S = img.shape[0]
    ry = _interp_matrix(out_size, S, top, h)     # [out, S]
    rx = _interp_matrix(out_size, S, left, w)    # [out, S]
    t = jnp.einsum("os,swc->owc", ry, img)       # rows: [out, S, 3]
    return jnp.einsum("pw,owc->opc", rx, t)      # cols: [out, out, 3]


# --------------------------------------------------------------------------
# RandomResizedCrop box sampling (torchvision semantics, vectorized tries)
# --------------------------------------------------------------------------
def _rrc_box(key, in_size: int, scale, ratio):
    H = W = in_size
    area = float(H * W)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ta = area * jax.random.uniform(
        k1, (10,), minval=scale[0], maxval=scale[1])
    log_r = (math.log(ratio[0]), math.log(ratio[1]))
    aspect = jnp.exp(jax.random.uniform(
        k2, (10,), minval=log_r[0], maxval=log_r[1]))
    w = jnp.round(jnp.sqrt(ta * aspect))
    h = jnp.round(jnp.sqrt(ta / aspect))
    valid = (w > 0) & (w <= W) & (h > 0) & (h <= H)
    # first valid try, else fallback = whole (square) image
    idx = jnp.argmax(valid)
    any_valid = valid.any()
    w = jnp.where(any_valid, w[idx], float(W))
    h = jnp.where(any_valid, h[idx], float(H))
    u_i = jax.random.uniform(k3, ())
    u_j = jax.random.uniform(k4, ())
    top = jnp.floor(u_i * (H - h + 1.0))
    left = jnp.floor(u_j * (W - w + 1.0))
    top = jnp.where(any_valid, top, jnp.floor((H - h) / 2))
    left = jnp.where(any_valid, left, jnp.floor((W - w) / 2))
    return top, left, h, w


# --------------------------------------------------------------------------
# geometric warps as interpolation matmuls (no gathers: XLA's general
# gather is ~750ms per b256 on v5e; these einsums run in <1ms)
# --------------------------------------------------------------------------
def _shift_matrix(n: int, offset):
    """[..., n_out, n_in] 2-tap bilinear sampling matrix for the mapping
    xin_center = xout_center + offset (PIL AFFINE pixel-center
    convention). `offset` may be scalar or [...]-shaped (per-row shear).
    Out-of-canvas taps get zero weight; callers add fill * (1 - rowsum)."""
    xo = jnp.arange(n, dtype=jnp.float32)
    cols = jnp.arange(n, dtype=jnp.float32)
    off = jnp.asarray(offset, jnp.float32)
    d = (cols[None, :] - xo[:, None])[
        (None,) * off.ndim] - off[..., None, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _apply_x(img, m):
    """Resample along x. m: [W,W] (translate) or [H,W,W] (per-row shear);
    img [H,W,C]."""
    if m.ndim == 2:
        out = jnp.einsum("xu,yuc->yxc", m, img)
        cov = m.sum(-1)[None, :, None]
    else:
        out = jnp.einsum("yxu,yuc->yxc", m, img)
        cov = m.sum(-1)[..., None]
    return out + (1.0 - cov) * _FILL


def _apply_y(img, m):
    """Resample along y. m: [H,H] or [W,H,H] (per-column shear)."""
    if m.ndim == 2:
        out = jnp.einsum("yv,vxc->yxc", m, img)
        cov = m.sum(-1)[:, None, None]
    else:
        out = jnp.einsum("xyv,vxc->yxc", m, img)
        cov = m.sum(-1).T[..., None]
    return out + (1.0 - cov) * _FILL


def _rand_sign(key, v):
    return jnp.where(jax.random.uniform(key, ()) < 0.5, -v, v)


# --------------------------------------------------------------------------
# RandAugment ops. All take (img float [H,W,3] in 0..255, mag, key).
# --------------------------------------------------------------------------
def _to_bins(img):
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32)


def _autocontrast(img, mag, key):
    # PIL ImageOps.autocontrast cutoff=0: per-channel min/max stretch with
    # the integer-truncated LUT
    x = _to_bins(img)
    lo = x.min(axis=(0, 1))
    hi = x.max(axis=(0, 1))
    # PIL truncates (ix - lo) * 255 / (hi - lo) computed in double; the
    # rational fits int32 exactly, so integer floor-div reproduces it
    num = (x - lo) * 255
    out = jnp.clip(num // jnp.maximum(hi - lo, 1), 0, 255)
    return jnp.where(hi <= lo, img, out.astype(jnp.float32))


def _equalize(img, mag, key):
    # PIL ImageOps.equalize integer LUT:
    #   step = (n_pixels - count(max_value)) // 255
    #   lut[i] = (step//2 + sum_{j<i} hist[j]) // step
    x = _to_bins(img)
    H, W, _ = x.shape
    total = H * W
    bins = jnp.arange(256, dtype=jnp.int32)
    bins16 = jnp.arange(16, dtype=jnp.int32)

    def chan(ch):
        # 16x16 one-hot decomposition (value = 16*hi + lo): the 256-bin
        # histogram becomes ONE [P,16]x[P,16] MXU matmul and the LUT
        # application a bilinear form (Ohi @ L) . Olo -- 16x less VPU
        # compare work than a 256-bin compare-reduce (35 -> ~3 ms/b256);
        # TPU scatter-add (hist) / table gather (lut[ch]) would cost
        # ~700ms. All values are small integers, exact in bf16/f32.
        flat = ch.reshape(-1)
        oh_hi = (flat[:, None] // 16 == bins16).astype(jnp.bfloat16)
        oh_lo = (flat[:, None] % 16 == bins16).astype(jnp.bfloat16)
        hist = jax.lax.dot_general(
            oh_hi, oh_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [16,16], row=hi col=lo
        hist = hist.reshape(256).astype(jnp.int32)
        nz = hist > 0
        maxval = 255 - jnp.argmax(nz[::-1])
        step = (total - hist[maxval]) // 255
        csum = jnp.cumsum(hist) - hist  # exclusive
        lut = jnp.clip((step // 2 + csum) // jnp.maximum(step, 1), 0, 255)
        use_ident = (nz.sum() <= 1) | (step == 0)
        lut = jnp.where(use_ident, bins, lut).astype(jnp.bfloat16)
        hi_l = jax.lax.dot_general(
            oh_hi, lut.reshape(16, 16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [P,16]
        out = (hi_l * oh_lo.astype(jnp.float32)).sum(-1)
        return out.reshape(H, W)

    return jnp.stack([chan(x[..., c]) for c in range(3)], axis=-1)


def _invert(img, mag, key):
    return 255.0 - img


def _rotate(img, mag, key):
    """PIL-mapping rotation about the center (a = -radians(angle)),
    decomposed into three shear passes (Paeth): the rotation matrix
    [[cos,sin],[-sin,cos]] = Sx(tan(a/2)) . Sy(-sin a) . Sx(tan(a/2)),
    each pass a separable interpolation matmul. Exact coordinate mapping;
    the resampling filter is applied three times instead of once (PIL
    interpolates in a single pass), a documented quality deviation."""
    deg = _rand_sign(key, mag / _MAX_LEVEL * 30.0)
    a = -deg * (math.pi / 180.0)
    H, W, _ = img.shape
    cx, cy = W / 2.0, H / 2.0
    alpha = jnp.tan(a / 2.0)
    beta = -jnp.sin(a)
    offx = alpha * (jnp.arange(H, dtype=jnp.float32) + 0.5 - cy)
    offy = beta * (jnp.arange(W, dtype=jnp.float32) + 0.5 - cx)
    img = _apply_x(img, _shift_matrix(W, offx))
    img = _apply_y(img, _shift_matrix(H, offy))
    return _apply_x(img, _shift_matrix(W, offx))


def _shear(axis):
    def op(img, mag, key):
        v = _rand_sign(key, mag / _MAX_LEVEL * 0.3)
        H, W, _ = img.shape
        if axis == "x":  # xin = xc + v*yc (PIL matrix (1, v, 0, ...))
            off = v * (jnp.arange(H, dtype=jnp.float32) + 0.5)
            return _apply_x(img, _shift_matrix(W, off))
        off = v * (jnp.arange(W, dtype=jnp.float32) + 0.5)
        return _apply_y(img, _shift_matrix(H, off))

    return op


def _translate(axis, frac=0.45):
    def op(img, mag, key):
        size = img.shape[1] if axis == "x" else img.shape[0]
        v = _rand_sign(key, mag / _MAX_LEVEL * int(size * frac))
        if axis == "x":
            return _apply_x(img, _shift_matrix(img.shape[1], v))
        return _apply_y(img, _shift_matrix(img.shape[0], v))

    return op


def _posterize_from_bits(img, bits):
    # PIL posterize keeps the top `bits` bits; bits=0 (timm's map at
    # magnitude 10) blacks the image, as PIL's does
    shift = jnp.clip(8 - bits, 0, 8)
    q = jnp.exp2(shift.astype(jnp.float32))
    x = _to_bins(img).astype(jnp.float32)
    return jnp.floor(x / q) * q


def _posterize(img, mag, key):
    # timm 'PosterizeIncreasing' (transforms.py::_posterize_increasing):
    # bits 4..0, severity increases with magnitude
    bits = 4 - jnp.floor(mag / _MAX_LEVEL * 4).astype(jnp.int32)
    return _posterize_from_bits(img, bits)


def _posterize_plain(img, mag, key):
    # timm 'Posterize' (transforms.py::_posterize_plain): bits 0..4,
    # severity decreases with magnitude (the non-inc RandAugment set)
    bits = jnp.floor(mag / _MAX_LEVEL * 4).astype(jnp.int32)
    return _posterize_from_bits(img, bits)


def _solarize(img, mag, key):
    # timm 'SolarizeIncreasing': threshold 256..0 (256 = identity; PIL
    # inverts pixels >= threshold). Truncate the LEVEL before
    # subtracting, as timm's int() does -- floor(256 - v) is off by one
    # at fractional magnitudes (mstd noise)
    thresh = jnp.clip(
        256.0 - jnp.floor(mag / _MAX_LEVEL * 256.0), 0, 256)
    x = _to_bins(img).astype(jnp.float32)
    return jnp.where(x < thresh, x, 255.0 - x)


def _solarize_plain(img, mag, key):
    # timm 'Solarize': threshold 0..256, severity decreases with
    # magnitude (mag 10 = identity)
    thresh = jnp.clip(jnp.floor(mag / _MAX_LEVEL * 256.0), 0, 256)
    x = _to_bins(img).astype(jnp.float32)
    return jnp.where(x < thresh, x, 255.0 - x)


def _solarize_add(img, mag, key):
    add = jnp.floor(mag / _MAX_LEVEL * 110.0)
    x = _to_bins(img).astype(jnp.float32)
    return jnp.where(x < 128.0, jnp.clip(x + add, 0, 255), x)


def _gray(img):
    # PIL "L": ITU-R 601-2
    return (img[..., 0] * 299.0 + img[..., 1] * 587.0
            + img[..., 2] * 114.0) / 1000.0


def _blend(degenerate, img, factor):
    return jnp.clip(degenerate + factor * (img - degenerate), 0.0, 255.0)


def _enhance_factor(key, mag):
    # timm increasing variant; the 0.1 floor is unreachable (mag <= 10)
    return 1.0 + _rand_sign(key, mag / _MAX_LEVEL * 0.9)


def _enhance_factor_plain(mag):
    # timm plain variant (non-inc op set): [0.1, 1.9], never negated
    return mag / _MAX_LEVEL * 1.8 + 0.1


def _color_f(img, factor):
    """PIL ImageEnhance.Color with an explicit factor (shared by the RA
    op and the color-jitter path so the PIL emulation cannot diverge)."""
    return _blend(_gray(img)[..., None], img, factor)


def _contrast_f(img, factor):
    # PIL: degenerate = solid gray at int(mean(L) + 0.5)
    mean = jnp.floor(_gray(_to_bins(img).astype(jnp.float32)).mean() + 0.5)
    return _blend(mean, img, factor)


def _brightness_f(img, factor):
    return _blend(0.0, img, factor)


def _color(img, mag, key):
    return _color_f(img, _enhance_factor(key, mag))


def _contrast(img, mag, key):
    return _contrast_f(img, _enhance_factor(key, mag))


def _brightness(img, mag, key):
    return _brightness_f(img, _enhance_factor(key, mag))


def _sharpness_degenerate(img):
    # PIL SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13; the 1-px border is
    # left untouched by ImageFilter (it only filters the interior)
    p = img
    s = (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
         + p[1:-1, :-2] + p[1:-1, 1:-1] * 5.0 + p[1:-1, 2:]
         + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]) / 13.0
    return p.at[1:-1, 1:-1].set(jnp.clip(s, 0.0, 255.0))


def _sharpness(img, mag, key):
    return _blend(_sharpness_degenerate(img), img,
                  _enhance_factor(key, mag))


def _plain(factor_op):
    """Wrap a (img, factor)->img enhance with the non-inc level map."""

    def f(img, mag, key):
        return factor_op(img, _enhance_factor_plain(mag))

    return f


def _sharpness_f(img, factor):
    return _blend(_sharpness_degenerate(img), img, factor)


def _ra_op_table(inc: bool):
    """Op tuple by position-parity with transforms.py::rand_augment_ops
    (inc selects timm's increasing vs plain level maps; the geometric
    group overrides in _RA_GROUP_OPS sit at the same indices in both)."""
    if inc:
        return (
            _autocontrast, _equalize, _invert, _rotate, _posterize,
            _solarize, _solarize_add, _color, _contrast, _brightness,
            _sharpness,
            _shear("x"), _shear("y"), _translate("x"), _translate("y"),
        )
    return (
        _autocontrast, _equalize, _invert, _rotate, _posterize_plain,
        _solarize_plain, _solarize_add,
        _plain(_color_f), _plain(_contrast_f), _plain(_brightness_f),
        _plain(_sharpness_f),
        _shear("x"), _shear("y"), _translate("x"), _translate("y"),
    )


# ---- group-level overrides for the warp ops --------------------------------
# A per-image [H,W,W] warp tensor materializes gs x 45MB to HBM per draw
# (measured 6ms/shear, 19ms/rotate per b256); shared across the op group
# it is built once (~10x cheaper). Deviation: images in one RA group
# share the warp sign/magnitude for that draw (the op index already is
# group-shared); sign/magnitude stay per-image for all other ops.
def _shear_group(axis):
    def op(imgs, mags, keys):
        v = _rand_sign(keys[0], mags[0] / _MAX_LEVEL * 0.3)
        H, W = imgs.shape[1], imgs.shape[2]
        if axis == "x":
            off = v * (jnp.arange(H, dtype=jnp.float32) + 0.5)
            m = _shift_matrix(W, off)
            out = jnp.einsum("yxu,byuc->byxc", m, imgs)
            cov = m.sum(-1)[None, :, :, None]
        else:
            off = v * (jnp.arange(W, dtype=jnp.float32) + 0.5)
            m = _shift_matrix(H, off)
            out = jnp.einsum("xyv,bvxc->byxc", m, imgs)
            cov = m.sum(-1).T[None, :, :, None]
        return out + (1.0 - cov) * _FILL

    return op


def _rotate_group(imgs, mags, keys):
    deg = _rand_sign(keys[0], mags[0] / _MAX_LEVEL * 30.0)
    a = -deg * (math.pi / 180.0)
    H, W = imgs.shape[1], imgs.shape[2]
    cx, cy = W / 2.0, H / 2.0
    alpha = jnp.tan(a / 2.0)
    beta = -jnp.sin(a)
    offx = alpha * (jnp.arange(H, dtype=jnp.float32) + 0.5 - cy)
    offy = beta * (jnp.arange(W, dtype=jnp.float32) + 0.5 - cx)
    mx = _shift_matrix(W, offx)
    my = _shift_matrix(H, offy)
    covx = mx.sum(-1)[None, :, :, None]
    covy = my.sum(-1).T[None, :, :, None]
    imgs = jnp.einsum("yxu,byuc->byxc", mx, imgs) + (1 - covx) * _FILL
    imgs = jnp.einsum("xyv,bvxc->byxc", my, imgs) + (1 - covy) * _FILL
    return jnp.einsum("yxu,byuc->byxc", mx, imgs) + (1 - covx) * _FILL


_RA_GROUP_OPS = {3: _rotate_group, 11: _shear_group("x"),
                 12: _shear_group("y")}


def _rand_augment_batch(imgs, key, num_ops: int, magnitude: float,
                        mstd: float, group_size: int,
                        inc: bool = True, prob: float = 0.5):
    """RandAugment over a batch [B,H,W,3].

    The op INDEX is drawn once per group of `group_size` images (sign and
    magnitude stay per-image). A per-image index would put `lax.switch`
    under vmap, which executes ALL 15 branches for the whole batch and
    selects -- 15x the compute and ~15 full batch copies of intermediate
    memory (enough to OOM a v5e at b256). With a scalar per-group index
    inside `lax.map`, exactly one branch runs per group. Each image still
    sees ops uniformly at random across steps; only the within-batch
    draw is group-correlated (group_size=1 recovers exact per-image
    semantics at the cost of serializing the batch).

    Per-op semantics follow timm AugmentOp: each drawn op is applied
    with probability `prob` (timm rand_augment_ops default 0.5,
    per-image gate), and mstd=inf samples the magnitude uniformly in
    [0, magnitude] ('mstd>100' grammar)."""
    B = imgs.shape[0]
    gs = max(1, min(group_size, B))
    while B % gs:
        gs -= 1
    G = B // gs
    grouped = imgs.reshape((G, gs) + imgs.shape[1:])
    gkeys = jax.random.split(key, G)
    ra_ops = _ra_op_table(inc)

    branches = [
        _RA_GROUP_OPS.get(
            i,
            (lambda op: lambda ims, mags, kks:
             jax.vmap(op)(ims, mags, kks))(m))
        for i, m in enumerate(ra_ops)
    ]

    def per_group(args):
        g_imgs, k = args
        for _ in range(num_ops):
            k, k_op, k_mag, k_in, k_ap = jax.random.split(k, 5)
            opidx = jax.random.randint(k_op, (), 0, len(ra_ops))
            if math.isinf(mstd):
                mags = magnitude * jax.random.uniform(k_mag, (gs,))
            else:
                mags = jnp.full((gs,), magnitude, jnp.float32)
                if mstd > 0:
                    mags = mags + mstd * jax.random.normal(k_mag, (gs,))
            mags = jnp.clip(mags, 0.0, _MAX_LEVEL)
            in_keys = jax.random.split(k_in, gs)
            out = jax.lax.switch(opidx, branches, g_imgs, mags, in_keys)
            if prob < 1.0:
                apply = jax.random.bernoulli(k_ap, prob, (gs,))
                out = jnp.where(apply[:, None, None, None], out, g_imgs)
            g_imgs = out
        return g_imgs

    out = jax.lax.map(per_group, (grouped, gkeys))
    return out.reshape(imgs.shape)


# --------------------------------------------------------------------------
# RandomErasing (timm pixel mode) on the normalized array
# --------------------------------------------------------------------------
def _random_erasing(arr, key, prob: float, count: int,
                    area=(0.02, 1 / 3), ratio: float = 0.3):
    if prob <= 0:
        return arr
    H, W, C = arr.shape
    key, k_gate = jax.random.split(key)
    gate = jax.random.uniform(k_gate, ()) < prob

    for _ in range(count):
        key, k_a, k_r, k_t, k_l, k_n = jax.random.split(key, 6)
        a = jax.random.uniform(
            k_a, (10,), minval=area[0], maxval=area[1]) * H * W / count
        log_r = (math.log(ratio), math.log(1 / ratio))
        r = jnp.exp(jax.random.uniform(
            k_r, (10,), minval=log_r[0], maxval=log_r[1]))
        h = jnp.round(jnp.sqrt(a * r))
        w = jnp.round(jnp.sqrt(a / r))
        valid = (h < H) & (w < W)
        idx = jnp.argmax(valid)
        ok = valid.any() & gate
        h = h[idx]
        w = w[idx]
        top = jnp.floor(jax.random.uniform(k_t, ()) * (H - h + 1.0))
        left = jnp.floor(jax.random.uniform(k_l, ()) * (W - w + 1.0))
        ys = jnp.arange(H, dtype=jnp.float32)[:, None]
        xs = jnp.arange(W, dtype=jnp.float32)[None, :]
        box = ((ys >= top) & (ys < top + h)
               & (xs >= left) & (xs < left + w) & ok)
        noise = jax.random.normal(k_n, (H, W, C), arr.dtype)
        arr = jnp.where(box[..., None], noise, arr)
    return arr


# --------------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------------
def _cutout(img, key, factor: float = 0.5):
    """ASL CutoutPIL (transforms.py:279): one random-color box with side
    ~ factor * image side, centered at a uniform pixel, clipped."""
    H, W, _ = img.shape
    h, w = int(factor * H + 0.5), int(factor * W + 0.5)
    ky, kx, kc = jax.random.split(key, 3)
    y = jax.random.randint(ky, (), 0, H)
    x = jax.random.randint(kx, (), 0, W)
    color = jax.random.randint(kc, (3,), 0, 256).astype(img.dtype)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    box = ((ys >= y - h // 2) & (ys < y + h // 2)
           & (xs >= x - w // 2) & (xs < x + w // 2))
    return jnp.where(box[..., None], color, img)


def parse_ra(config: str):
    """'rand-m9-mstd0.5-inc1' -> (num_ops, magnitude, mstd, inc, prob);
    delegates to the host parser (transforms.py::parse_rand_augment) so a
    policy-grammar change cannot desynchronize host and device recipes;
    adds the no-op guard for disabled auto-augment. Non-rand --aa
    grammars (AutoAugment policies, augmix) only exist on the host path:
    raise rather than silently train without augmentation."""
    if not config:
        return 0, 0.0, 0.0, False, 0.5
    if not config.startswith("rand"):
        raise ValueError(
            f"device-side augmentation supports the 'rand-*' --aa grammar "
            f"only (got {config!r}); drop --device_aug to run AutoAugment/"
            "augmix policies on the host pipeline")
    from tokenreduction_tpu.data.transforms import parse_rand_augment

    return parse_rand_augment(config)


def normalize_01(img_255):
    return ((img_255 / 255.0) - IMAGENET_MEAN) / IMAGENET_STD


def _color_jitter_one(img, key, factor: float):
    """transforms.py::color_jitter semantics on the continuous 0-255
    image: brightness/contrast/saturation enhance in random order, each
    by a factor drawn U[max(0,1-f), 1+f]. The three branches are cheap
    elementwise blends, so all are computed and selected per step (no
    lax.switch under vmap)."""
    kp, kf = jax.random.split(key)
    order = jax.random.permutation(kp, 3)
    fs = jax.random.uniform(kf, (3,), minval=max(0.0, 1.0 - factor),
                            maxval=1.0 + factor)
    for i in range(3):
        idx, f = order[i], fs[i]
        img = jnp.where(idx == 0, _brightness_f(img, f),
                        jnp.where(idx == 1, _contrast_f(img, f),
                                  _color_f(img, f)))
    return img


def make_device_augment(cfg: DeviceAugConfig):
    """Returns aug(key, uint8 [B,S,S,3]) -> normalized float32
    [B,size,size,3]; jit/vmap/shard-transparent (pure function of key)."""
    num_ops, magnitude, mstd, inc, ra_prob = parse_ra(cfg.aa)
    size = cfg.input_size

    asl = cfg.recipe == "asl"

    def crop_one(key, img_u8):
        img = img_u8.astype(jnp.float32)
        S = img.shape[0]
        if asl:  # fixed square resize + CutoutPIL (reference
            # datasets.py:40-71 via aug_factory.py)
            img = _crop_resize(img, 0.0, 0.0, float(S), float(S), size)
            return _cutout(img, key)
        k_box, k_flip = jax.random.split(key)
        top, left, h, w = _rrc_box(k_box, S, cfg.scale, cfg.ratio)
        img = _crop_resize(img, top, left, h, w, size)
        if cfg.hflip > 0:
            flip = jax.random.uniform(k_flip, ()) < cfg.hflip
            img = jnp.where(flip, img[:, ::-1], img)
        return img

    def finish_one(key, img):
        arr = normalize_01(img)
        if asl:
            return arr  # no RandomErasing in the ASL recipe
        return _random_erasing(arr, key, cfg.reprob, cfg.recount)

    def aug(key, batch_u8):
        B = batch_u8.shape[0]
        k_crop, k_ra, k_er = jax.random.split(key, 3)
        imgs = jax.vmap(crop_one)(jax.random.split(k_crop, B), batch_u8)
        if num_ops > 0:
            imgs = _rand_augment_batch(imgs, k_ra, num_ops, magnitude,
                                       mstd, cfg.ra_group_size,
                                       inc=inc, prob=ra_prob)
        elif not asl and cfg.color_jitter > 0:
            # host recipe substitutes color-jitter when auto-augment is
            # disabled (NABirds, pipeline.py train_fn)
            imgs = jax.vmap(
                lambda k, im: _color_jitter_one(im, k, cfg.color_jitter)
            )(jax.random.split(k_ra, B), imgs)
        return jax.vmap(finish_one)(jax.random.split(k_er, B), imgs)

    return aug


def make_device_eval_transform(cfg: DeviceAugConfig):
    """Eval path from cached squares: resize shorter side to
    size/crop_pct + center crop (transforms.py::resize_center_crop) +
    normalize; ASL recipe = plain square resize. Deterministic; no
    key."""
    size = cfg.input_size
    scale_size = (size if cfg.recipe == "asl"
                  else int(math.floor(size / cfg.crop_pct)))

    def tf_one(img_u8):
        img = img_u8.astype(jnp.float32)
        S = img.shape[0]
        # square input: resize to scale_size, center crop to size
        img = _crop_resize(img, 0.0, 0.0, float(S), float(S), scale_size)
        off = (scale_size - size) // 2
        if off:
            img = jax.lax.dynamic_slice(img, (off, off, 0),
                                        (size, size, 3))
        return normalize_01(img)

    def tf(batch_u8):
        return jax.vmap(tf_one)(batch_u8)

    return tf
