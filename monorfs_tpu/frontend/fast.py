"""FAST keypoint detection as dense batched jax ops.

TPU-native re-design of the reference keypoint extractor's detection stage
(reference: kpextractor/kpextractor.cpp:42-137 uses OpenCV FAST with
threshold 45 and nonmax suppression, called at external/latch.cpp:516).
Instead of pointer-chasing per-pixel early-exit tests, the whole image is
processed as 16 shifted planes with vectorized contiguous-arc reduction --
every pixel tested in parallel, NMS as a 3x3 max comparison, keypoints
extracted by one top-k. Data-parallel per pixel: ideal TPU fit.
"""

import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 (the standard FAST-16 ring)
RING = np.array(
    [
        (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2),
        (-1, 3),
    ]
)


def _shifted_ring(img):
    """[16, H, W] ring-neighbor intensities (edges padded by clamping)."""
    planes = []
    for dx, dy in RING:
        planes.append(jnp.roll(img, shift=(-dy, -dx), axis=(0, 1)))
    return jnp.stack(planes)


def fast_score(img, threshold=45.0, arc=9):
    """FAST-N corner response: for each pixel, is there an arc of `arc`
    contiguous ring pixels all brighter than p + t (or darker than p - t)?
    Returns a [H, W] score map (0 for non-corners); score = sum of absolute
    threshold exceedances over the ring (the usual NMS score)."""
    img = img.astype(jnp.float32)
    ring = _shifted_ring(img)  # [16, H, W]
    bright = ring > img[None] + threshold
    dark = ring < img[None] - threshold

    def has_arc(mask):
        out = mask
        for k in range(1, arc):
            out = out & jnp.roll(mask, -k, axis=0)
        return jnp.any(out, axis=0)

    corner = has_arc(bright) | has_arc(dark)
    excess = jnp.maximum(jnp.abs(ring - img[None]) - threshold, 0.0)
    score = jnp.sum(excess, axis=0)
    return jnp.where(corner, score, 0.0)


def nonmax_suppress(score):
    """3x3 non-maximum suppression."""
    neighborhood = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neighborhood = jnp.maximum(
                neighborhood, jnp.roll(score, (dy, dx), axis=(0, 1))
            )
    return jnp.where(score >= neighborhood, score, 0.0)


def detect(img, threshold=45.0, max_keypoints=512, border=24):
    """Detect up to `max_keypoints` FAST corners.

    Returns (xy [K, 2] float32 (x, y), score [K], valid [K]); invalid slots
    padded. The `border` margin keeps descriptor windows in-bounds
    (latch.cpp:535 filters border keypoints the same way)."""
    h, w = img.shape
    score = nonmax_suppress(fast_score(img, threshold))
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    score = jnp.where(inb, score, 0.0)
    flat = score.reshape(-1)
    top, idx = jnp.sort(flat)[::-1][:max_keypoints], jnp.argsort(-flat)[:max_keypoints]
    yx = jnp.stack([idx // w, idx % w], axis=-1)
    xy = jnp.stack([yx[:, 1], yx[:, 0]], axis=-1).astype(jnp.float32)
    valid = top > 0
    return xy, top, valid
