"""Image-corruption suite: 15 types x 5 severities.

The reference's robustness protocol evaluates on pre-corrupted image folders
(test_dsec.py:119-134 lists the types; generation is external, ImageNet-C-style).
This module generates the corruptions on the fly with numpy/cv2/scipy so the sweep
is self-contained — severity parameter tables follow the public ImageNet-C recipe
(Hendrycks & Dietterich, 2019).

Formula faithfulness vs the public recipe (pinned in
tests/test_corruption_golden.py):
  * closed-form-identical: gaussian_noise, shot_noise, contrast, brightness
    (HSV value add), pixelate, fog mixing arithmetic, jpeg_compression,
    zoom_blur, defocus_blur, glass_blur (same tables/structure; RNG stream
    differs by construction — deterministic per image+severity here);
  * procedural approximations (public recipe needs assets/plugins we don't
    bundle): frost (public composites 6 frost PHOTOGRAPHS; ours synthesizes
    crystalline noise), motion_blur + snow's streak kernel (public uses
    wand/ImageMagick motion blur), elastic_transform (public composes an
    affine pre-warp), impulse_noise (public flips per-ELEMENT via skimage,
    ours per-pixel; amount tables identical). On-the-fly numbers for these
    are NOT comparable to tables produced from the reference's pre-generated
    folders — pass --corruption_root to evaluate those (protocol-faithful).

All functions take/return float32 RGB images in [0, 1], HWC.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from scipy.ndimage import gaussian_filter, map_coordinates, zoom as nd_zoom

CORRUPTION_GROUPS: List[List[str]] = [
    ["gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur", "glass_blur"],
    ["motion_blur", "zoom_blur", "fog", "snow", "frost"],
    ["brightness", "contrast", "elastic_transform", "pixelate", "jpeg_compression"],
]
ALL_CORRUPTIONS: List[str] = [c for g in CORRUPTION_GROUPS for c in g]
SEVERITIES = (1, 2, 3, 4, 5)


def _rng(img: np.ndarray, severity: int) -> np.random.Generator:
    # deterministic per image content + severity so sweeps are reproducible
    seed = (int(abs(float(img[:8, :8].sum())) * 1000) + severity) % (2 ** 31)
    return np.random.default_rng(seed)


def gaussian_noise(img, severity):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    return np.clip(img + _rng(img, severity).normal(size=img.shape) * c, 0, 1).astype(np.float32)


def shot_noise(img, severity):
    c = [60, 25, 12, 5, 3][severity - 1]
    return np.clip(_rng(img, severity).poisson(img * c) / c, 0, 1).astype(np.float32)


def impulse_noise(img, severity):
    amount = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    rng = _rng(img, severity)
    out = img.copy()
    mask = rng.random(img.shape[:2]) < amount
    salt = rng.random(img.shape[:2]) < 0.5
    out[mask & salt] = 1.0
    out[mask & ~salt] = 0.0
    return out.astype(np.float32)


def _disk_kernel(radius: int, alias_blur: float = 0.1) -> np.ndarray:
    size = 2 * radius + 1
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    disk = ((xx ** 2 + yy ** 2) <= radius ** 2).astype(np.float32)
    disk = gaussian_filter(disk, sigma=alias_blur * radius + 0.5)
    return disk / disk.sum()


def defocus_blur(img, severity):
    radius, alias = [(3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5), (10, 0.5)][severity - 1]
    k = _disk_kernel(radius, alias)
    return np.clip(cv2.filter2D(img, -1, k), 0, 1).astype(np.float32)


def glass_blur(img, severity):
    sigma, max_delta, iters = [(0.7, 1, 2), (0.9, 2, 1), (1, 2, 3), (1.1, 3, 2), (1.5, 4, 2)][
        severity - 1
    ]
    rng = _rng(img, severity)
    out = gaussian_filter(img, sigma=(sigma, sigma, 0))
    h, w = out.shape[:2]
    for _ in range(iters):
        dx = rng.integers(-max_delta, max_delta + 1, (h, w))
        dy = rng.integers(-max_delta, max_delta + 1, (h, w))
        ys = np.clip(np.arange(h)[:, None] + dy, 0, h - 1)
        xs = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
        out = out[ys, xs]
    return np.clip(gaussian_filter(out, sigma=(sigma, sigma, 0)), 0, 1).astype(np.float32)


def motion_blur(img, severity):
    size, angle_range = [(9, 45), (11, 45), (13, 45), (15, 45), (19, 45)][severity - 1]
    rng = _rng(img, severity)
    angle = rng.uniform(-angle_range, angle_range)
    k = np.zeros((size, size), np.float32)
    k[size // 2, :] = 1.0
    m = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5), angle, 1.0)
    k = cv2.warpAffine(k, m, (size, size))
    k /= k.sum()
    return np.clip(cv2.filter2D(img, -1, k), 0, 1).astype(np.float32)


def zoom_blur(img, severity):
    max_zoom = [1.11, 1.16, 1.21, 1.26, 1.31][severity - 1]
    zooms = np.arange(1.0, max_zoom, 0.02)
    h, w = img.shape[:2]
    out = np.zeros_like(img, dtype=np.float64)
    for z in zooms:
        zh, zw = int(np.ceil(h / z)), int(np.ceil(w / z))
        top, left = (h - zh) // 2, (w - zw) // 2
        crop = img[top : top + zh, left : left + zw]
        out += cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR)
    out = (img + out) / (len(zooms) + 1)
    return np.clip(out, 0, 1).astype(np.float32)


def _plasma(shape, rng, wibbledecay=2.0):
    """Multi-octave value-noise heightmap in [0,1] (fractal haze field for fog).

    Octave amplitudes decay by `wibbledecay` per halving, approximating the
    diamond-square plasma fractal of the ImageNet-C fog recipe.
    """
    h, w = shape
    arr = np.zeros((h, w), np.float64)
    amp, cells = 1.0, 4
    while cells <= max(h, w):
        small = rng.random((min(cells, h) + 1, min(cells, w) + 1))
        arr += amp * cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        amp /= wibbledecay
        cells *= 2
    arr -= arr.min()
    return (arr / max(arr.max(), 1e-8)).astype(np.float32)


def fog(img, severity):
    intensity, decay = [(1.5, 2.0), (2.0, 2.0), (2.5, 1.7), (2.5, 1.5), (3.0, 1.4)][severity - 1]
    rng = _rng(img, severity)
    haze = _plasma(img.shape[:2], rng, wibbledecay=decay)[:, :, None]
    maxval = img.max()
    out = img + intensity * haze
    return np.clip(out * maxval / (maxval + intensity), 0, 1).astype(np.float32)


def snow(img, severity):
    mean, std, zoom_f, thresh, blur_sz, layer_w = [
        (0.1, 0.3, 3.0, 0.5, 10, 0.7),
        (0.2, 0.3, 2.0, 0.5, 12, 0.7),
        (0.55, 0.3, 4.0, 0.9, 12, 0.6),
        (0.55, 0.3, 4.5, 0.85, 12, 0.6),
        (0.55, 0.3, 2.5, 0.85, 12, 0.55),
    ][severity - 1]
    rng = _rng(img, severity)
    h, w = img.shape[:2]
    layer = rng.normal(mean, std, (h // 2, w // 2)).astype(np.float32)
    layer = cv2.resize(layer, (w, h), interpolation=cv2.INTER_LINEAR)
    layer[layer < thresh] = 0
    k = np.zeros((blur_sz, blur_sz), np.float32)
    k[blur_sz // 2, :] = 1.0 / blur_sz
    m = cv2.getRotationMatrix2D((blur_sz / 2 - 0.5, blur_sz / 2 - 0.5), rng.uniform(-135, -45), 1.0)
    k = cv2.warpAffine(k, m, (blur_sz, blur_sz))
    layer = cv2.filter2D(layer, -1, k)[:, :, None]
    gray = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0
    darkened = layer_w * img + (1 - layer_w) * np.maximum(img, gray[:, :, None] * 1.5 + 0.5)
    out = darkened + layer + np.rot90(layer, 2)
    return np.clip(out, 0, 1).astype(np.float32)


def frost(img, severity):
    mix_img, mix_frost = [(1.0, 0.4), (0.8, 0.6), (0.7, 0.7), (0.65, 0.7), (0.6, 0.75)][
        severity - 1
    ]
    rng = _rng(img, severity)
    h, w = img.shape[:2]
    # procedural frost: thresholded multi-octave noise with crystalline streaks
    noise = np.zeros((h, w), np.float32)
    for octave in (4, 8, 16):
        small = rng.random((h // octave + 1, w // octave + 1)).astype(np.float32)
        noise += cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC) / (16 / octave)
    noise = (noise - noise.min()) / max(float(np.ptp(noise)), 1e-8)
    crystals = (noise > 0.6).astype(np.float32) * noise
    crystals = cv2.GaussianBlur(crystals, (0, 0), 1.0)
    frost_layer = np.stack([crystals * 0.95, crystals, crystals * 1.05], axis=-1)
    return np.clip(mix_img * img + mix_frost * frost_layer, 0, 1).astype(np.float32)


def brightness(img, severity):
    # public ImageNet-C adds c to the HSV VALUE channel (rgb2hsv -> v+c ->
    # hsv2rgb), not to RGB: V = max(R,G,B), and scaling V scales RGB
    # proportionally while preserving hue/saturation, so the closed form is
    # rgb * clip(v+c,0,1)/v (gray clip(c) where v == 0). Bit-checked against a
    # literal rgb2hsv/hsv2rgb replica in tests/test_corruption_golden.py.
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    v = img.max(axis=2, keepdims=True)
    v_new = np.clip(v + c, 0, 1)
    out = np.where(v > 0, img * (v_new / np.maximum(v, 1e-12)), v_new)
    return np.clip(out, 0, 1).astype(np.float32)


def contrast(img, severity):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    mean = img.mean(axis=(0, 1), keepdims=True)
    return np.clip((img - mean) * c + mean, 0, 1).astype(np.float32)


def elastic_transform(img, severity):
    h, w = img.shape[:2]
    shorter = min(h, w)
    alpha, sigma = [
        (shorter * 2.0, shorter * 0.7),
        (shorter * 2.0, shorter * 0.08),
        (shorter * 0.05, shorter * 0.01),
        (shorter * 0.07, shorter * 0.01),
        (shorter * 0.12, shorter * 0.01),
    ][severity - 1]
    rng = _rng(img, severity)
    dx = gaussian_filter(rng.uniform(-1, 1, (h, w)), sigma) * alpha
    dy = gaussian_filter(rng.uniform(-1, 1, (h, w)), sigma) * alpha
    ys, xs = np.mgrid[0:h, 0:w]
    coords = np.stack([np.clip(ys + dy, 0, h - 1), np.clip(xs + dx, 0, w - 1)])
    out = np.stack(
        [map_coordinates(img[:, :, c], coords, order=1, mode="reflect") for c in range(img.shape[2])],
        axis=-1,
    )
    return np.clip(out, 0, 1).astype(np.float32)


def pixelate(img, severity):
    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(int(w * c), 1), max(int(h * c), 1)), interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST).astype(np.float32)


def jpeg_compression(img, severity):
    quality = [25, 18, 15, 10, 7][severity - 1]
    u8 = (img * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", u8, [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    return (dec.astype(np.float32) / 255.0)


CORRUPTIONS: Dict[str, Callable] = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "defocus_blur": defocus_blur,
    "glass_blur": glass_blur,
    "motion_blur": motion_blur,
    "zoom_blur": zoom_blur,
    "fog": fog,
    "snow": snow,
    "frost": frost,
    "brightness": brightness,
    "contrast": contrast,
    "elastic_transform": elastic_transform,
    "pixelate": pixelate,
    "jpeg_compression": jpeg_compression,
}


def corrupt(img: np.ndarray, corruption: str, severity: int) -> np.ndarray:
    """Apply a named corruption at severity 1..5 to a float32 [0,1] HWC image."""
    if corruption not in CORRUPTIONS:
        raise ValueError(f"Unknown corruption {corruption!r}; one of {ALL_CORRUPTIONS}")
    if not 1 <= severity <= 5:
        raise ValueError("severity must be in 1..5")
    return CORRUPTIONS[corruption](img.astype(np.float32), severity)
