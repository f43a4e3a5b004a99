"""Host-side image transforms (numpy + PIL), replacing the torchvision/timm
transform stack (reference datasets.py:40-143, aug_factory.py:5-24).

Every transform takes (PIL.Image | np.ndarray, np.random.Generator) so the
pipeline is explicitly seeded -- no hidden global RNG.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

IMAGENET_DEFAULT_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_DEFAULT_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

_INTERP = {
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "nearest": Image.NEAREST,
    "lanczos": Image.LANCZOS,
}


def interp(name: str):
    return _INTERP.get(name, Image.BICUBIC)


def to_float_array(img: Image.Image) -> np.ndarray:
    """PIL -> float32 HWC in [0, 1]."""
    return np.asarray(img, dtype=np.float32) / 255.0


def normalize(arr: np.ndarray) -> np.ndarray:
    return (arr - IMAGENET_DEFAULT_MEAN) / IMAGENET_DEFAULT_STD


# --------------------------------------------------------------------------
# geometric
# --------------------------------------------------------------------------
def random_resized_crop(
    img: Image.Image,
    rng: np.random.Generator,
    size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
    interpolation: str = "bicubic",
) -> Image.Image:
    """torchvision RandomResizedCrop semantics."""
    W, H = img.size
    area = H * W
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= W and 0 < h <= H:
            i = int(rng.integers(0, H - h + 1))
            j = int(rng.integers(0, W - w + 1))
            return img.resize((size, size), interp(interpolation),
                              box=(j, i, j + w, i + h))
    # fallback: center crop
    in_ratio = W / H
    if in_ratio < ratio[0]:
        w, h = W, int(round(W / ratio[0]))
    elif in_ratio > ratio[1]:
        h, w = H, int(round(H * ratio[1]))
    else:
        w, h = W, H
    i, j = (H - h) // 2, (W - w) // 2
    return img.resize((size, size), interp(interpolation),
                      box=(j, i, j + w, i + h))


def resize_center_crop(img: Image.Image, size: int, crop_pct: float = 0.875,
                       interpolation: str = "bicubic") -> Image.Image:
    """timm eval transform: resize shorter side to size/crop_pct, center
    crop to size."""
    scale_size = int(math.floor(size / crop_pct))
    W, H = img.size
    if W <= H:
        nw, nh = scale_size, int(round(scale_size * H / W))
    else:
        nh, nw = scale_size, int(round(scale_size * W / H))
    img = img.resize((nw, nh), interp(interpolation))
    left = (nw - size) // 2
    top = (nh - size) // 2
    return img.crop((left, top, left + size, top + size))


def resize_square(img: Image.Image, size: int,
                  interpolation: str = "bicubic") -> Image.Image:
    """ASL-style fixed Resize((size, size)) (reference datasets.py:64,75)."""
    return img.resize((size, size), interp(interpolation))


def maybe_hflip(img: Image.Image, rng, prob: float = 0.5) -> Image.Image:
    if rng.random() < prob:
        return img.transpose(Image.FLIP_LEFT_RIGHT)
    return img


# --------------------------------------------------------------------------
# color jitter
# --------------------------------------------------------------------------
def color_jitter(img: Image.Image, rng, factor: float) -> Image.Image:
    """brightness/contrast/saturation jitter by +-factor, random order."""
    if factor <= 0:
        return img
    ops = [ImageEnhance.Brightness, ImageEnhance.Contrast,
           ImageEnhance.Color]
    order = rng.permutation(len(ops))
    for k in order:
        f = float(rng.uniform(max(0.0, 1 - factor), 1 + factor))
        img = ops[k](img).enhance(f)
    return img


# --------------------------------------------------------------------------
# RandAugment (timm `rand-m9-mstd0.5-inc1` policy, reference train.py:100)
# --------------------------------------------------------------------------
_MAX_LEVEL = 10.0
_FILL = tuple(int(min(255, round(255 * m))) for m in IMAGENET_DEFAULT_MEAN)


def _rotate(img, mag, rng):
    deg = mag / _MAX_LEVEL * 30.0
    if rng.random() < 0.5:
        deg = -deg
    return img.rotate(deg, resample=Image.BICUBIC, fillcolor=_FILL)


def _shear(img, mag, rng, axis):
    v = mag / _MAX_LEVEL * 0.3
    if rng.random() < 0.5:
        v = -v
    mat = (1, v, 0, 0, 1, 0) if axis == "x" else (1, 0, 0, v, 1, 0)
    return img.transform(img.size, Image.AFFINE, mat,
                         resample=Image.BICUBIC, fillcolor=_FILL)


def _translate(img, mag, rng, axis, const):
    v = mag / _MAX_LEVEL * const
    if rng.random() < 0.5:
        v = -v
    mat = (1, 0, v, 0, 1, 0) if axis == "x" else (1, 0, 0, 0, 1, v)
    return img.transform(img.size, Image.AFFINE, mat,
                         resample=Image.BICUBIC, fillcolor=_FILL)


def _enhance_inc(cls):
    """'inc1' variants: strength grows away from identity in both signs."""

    def f(img, mag, rng):
        v = mag / _MAX_LEVEL * 0.9
        if rng.random() < 0.5:
            v = -v
        return cls(img).enhance(1.0 + v)

    return f


def _posterize(img, mag, rng):
    # increasing: more magnitude -> fewer bits (4 .. 0) + base 4
    bits = int(4 - mag / _MAX_LEVEL * 4) + 4
    return ImageOps.posterize(img, max(1, min(8, bits)))


def _solarize(img, mag, rng):
    thresh = int(256 - mag / _MAX_LEVEL * 256)
    return ImageOps.solarize(img, max(0, min(255, thresh)))


def _solarize_add(img, mag, rng):
    add = int(mag / _MAX_LEVEL * 110)
    arr = np.asarray(img).astype(np.int32)
    arr = np.where(arr < 128, np.clip(arr + add, 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


def _autocontrast(img, mag, rng):
    return ImageOps.autocontrast(img)


def _equalize(img, mag, rng):
    return ImageOps.equalize(img)


def _invert(img, mag, rng):
    return ImageOps.invert(img)


def rand_augment_ops(translate_const: int):
    return [
        ("AutoContrast", _autocontrast),
        ("Equalize", _equalize),
        ("Invert", _invert),
        ("Rotate", _rotate),
        ("Posterize", _posterize),
        ("Solarize", _solarize),
        ("SolarizeAdd", _solarize_add),
        ("Color", _enhance_inc(ImageEnhance.Color)),
        ("Contrast", _enhance_inc(ImageEnhance.Contrast)),
        ("Brightness", _enhance_inc(ImageEnhance.Brightness)),
        ("Sharpness", _enhance_inc(ImageEnhance.Sharpness)),
        ("ShearX", lambda i, m, r: _shear(i, m, r, "x")),
        ("ShearY", lambda i, m, r: _shear(i, m, r, "y")),
        ("TranslateX",
         lambda i, m, r: _translate(i, m, r, "x", translate_const)),
        ("TranslateY",
         lambda i, m, r: _translate(i, m, r, "y", translate_const)),
    ]


def parse_rand_augment(config: str):
    """Parse 'rand-m9-mstd0.5-inc1' -> (num_ops, magnitude, mstd)."""
    num_ops, magnitude, mstd = 2, 9.0, 0.0
    for part in config.split("-")[1:]:
        if part.startswith("mstd"):
            mstd = float(part[4:])
        elif part.startswith("m"):
            magnitude = float(part[1:])
        elif part.startswith("n"):
            num_ops = int(part[1:])
        # 'inc1' increasing-severity variants are the default here
    return num_ops, magnitude, mstd


def rand_augment(img: Image.Image, rng, config: str,
                 img_size: int) -> Image.Image:
    if not config or not config.startswith("rand"):
        return img
    num_ops, magnitude, mstd = parse_rand_augment(config)
    ops = rand_augment_ops(translate_const=int(img_size * 0.45))
    for _ in range(num_ops):
        name, fn = ops[int(rng.integers(0, len(ops)))]
        mag = magnitude
        if mstd > 0:
            mag = float(rng.normal(magnitude, mstd))
        mag = max(0.0, min(_MAX_LEVEL, mag))
        img = fn(img, mag, rng)
    return img


# --------------------------------------------------------------------------
# erasing / cutout
# --------------------------------------------------------------------------
def random_erasing(arr: np.ndarray, rng, prob: float = 0.25,
                   mode: str = "pixel", count: int = 1,
                   area: Tuple[float, float] = (0.02, 1 / 3),
                   ratio: float = 0.3) -> np.ndarray:
    """timm RandomErasing on the normalized HWC array."""
    if prob <= 0 or rng.random() >= prob:
        return arr
    H, W, C = arr.shape
    arr = arr.copy()
    for _ in range(count):
        for _ in range(10):
            a = rng.uniform(area[0], area[1]) * H * W / count
            log_r = (math.log(ratio), math.log(1 / ratio))
            r = math.exp(rng.uniform(*log_r))
            h = int(round(math.sqrt(a * r)))
            w = int(round(math.sqrt(a / r)))
            if h < H and w < W:
                top = int(rng.integers(0, H - h + 1))
                left = int(rng.integers(0, W - w + 1))
                if mode == "pixel":
                    arr[top:top + h, left:left + w] = rng.normal(
                        size=(h, w, C)).astype(np.float32)
                else:
                    arr[top:top + h, left:left + w] = 0.0
                break
    return arr


def cutout_pil(img: Image.Image, rng, cutout_factor: float = 0.5) -> Image.Image:
    """ASL CutoutPIL (reference aug_factory.py:5-24): one random-color box
    with side ~ factor * image side."""
    from PIL import ImageDraw

    draw = ImageDraw.Draw(img)
    W, H = img.size
    h = int(cutout_factor * H + 0.5)
    w = int(cutout_factor * W + 0.5)
    y = int(rng.integers(0, H))
    x = int(rng.integers(0, W))
    y0, y1 = max(0, y - h // 2), min(H, y + h // 2)
    x0, x1 = max(0, x - w // 2), min(W, x + w // 2)
    color = tuple(int(v) for v in rng.integers(0, 256, 3))
    draw.rectangle((x0, y0, x1, y1), fill=color)
    return img


def three_augment(img: Image.Image, rng) -> Image.Image:
    """DeiT-III ThreeAugment (reference --ThreeAugment flag): one of
    grayscale / solarize / gaussian blur per image."""
    from PIL import ImageFilter

    choice = int(rng.integers(0, 3))
    if choice == 0:
        return img.convert("L").convert("RGB")
    if choice == 1:
        return ImageOps.solarize(img, 128)
    return img.filter(ImageFilter.GaussianBlur(
        radius=float(rng.uniform(0.1, 2.0))))
