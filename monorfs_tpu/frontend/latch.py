"""Binary patch-triplet descriptors (LATCH), batched over keypoints.

TPU-native re-design of the reference descriptor stage
(reference: kpextractor/external/latch.cpp:96-320 computes 32-byte LATCH
descriptors from learned patch triplets after a 3x3 sigma=2 Gaussian blur,
latch.cpp:527-528). Bit j compares the SSD of two companion patches against
a shared anchor patch B: bit = SSD(A, B) < SSD(C, B) (CalculateSums), over
7x7 patches (half_ssd_size = 3) at learned offsets within a +-24 px window.

The sampling table is the reference's learned LATCH table
(latch_table.py, extracted from latch.cpp setSamplingPoints); the 32-byte
mode consumes its first 256 triplets, packed MSB-first per byte exactly as
pixelTests32 does. The reference runs nominally rotation-invariant, but
FAST keypoints carry no orientation (angle = -1 deg), which truncates to
the identity rotation for every in-window offset -- so the upright path
here matches its effective behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .latch_table import SAMPLING_POINTS

DESCRIPTOR_BITS = 256
HALF_SSD = 3  # half_ssd_size (7x7 patches), latch.cpp:59

# [256, 3, 2] (x, y) offsets per bit, ordered (A, B=anchor, C)
TRIPLETS = jnp.asarray(
    np.asarray(SAMPLING_POINTS[:DESCRIPTOR_BITS], np.int32).reshape(
        DESCRIPTOR_BITS, 3, 2
    )
)

# 7x7 patch offsets
_PATCH = jnp.asarray(
    [
        (dy, dx)
        for dy in range(-HALF_SSD, HALF_SSD + 1)
        for dx in range(-HALF_SSD, HALF_SSD + 1)
    ]
)  # [49, 2]


def blur3(img, sigma=2.0):
    """3x3 Gaussian pre-blur (latch.cpp:527-528)."""
    ax = np.array([-1.0, 0.0, 1.0])
    k1 = np.exp(-(ax**2) / (2 * sigma * sigma))
    k1 /= k1.sum()
    img = img.astype(jnp.float32)
    img = (
        jnp.roll(img, 1, axis=0) * k1[0]
        + img * k1[1]
        + jnp.roll(img, -1, axis=0) * k1[2]
    )
    img = (
        jnp.roll(img, 1, axis=1) * k1[0]
        + img * k1[1]
        + jnp.roll(img, -1, axis=1) * k1[2]
    )
    return img


def describe(img, xy, valid):
    """Compute [K, 32] uint8 descriptors at keypoint locations xy [K, 2]
    (x, y). Border-safe via clamping (the detector already filters borders;
    the reference filters keypoints within 36 px of the edge,
    latch.cpp:535)."""
    img = blur3(img)
    h, w = img.shape
    kx = xy[:, 0].astype(jnp.int32)
    ky = xy[:, 1].astype(jnp.int32)

    # sample positions: [K, 256, 3, 49]
    centers = TRIPLETS[None, :, :, :]  # [1, 256, 3, 2] (x, y)
    pos_y = ky[:, None, None, None] + centers[..., 1][..., None] + _PATCH[:, 0]
    pos_x = kx[:, None, None, None] + centers[..., 0][..., None] + _PATCH[:, 1]
    pos_y = jnp.clip(pos_y, 0, h - 1)
    pos_x = jnp.clip(pos_x, 0, w - 1)
    patches = img[pos_y, pos_x]  # [K, 256, 3, 49]

    pa = patches[:, :, 0, :]
    anchor = patches[:, :, 1, :]  # B is the anchor (CalculateSums)
    pc = patches[:, :, 2, :]
    ssd_a = jnp.sum((pa - anchor) ** 2, axis=-1)
    ssd_c = jnp.sum((pc - anchor) ** 2, axis=-1)
    bits = (ssd_a < ssd_c).astype(jnp.uint8)  # [K, 256]

    # MSB-first within each byte (pixelTests32: bit j of a byte is the
    # (7 - j)-th triplet of its group)
    weights = (2 ** jnp.arange(7, -1, -1, dtype=jnp.uint32)).astype(
        jnp.uint32
    )
    grouped = bits.reshape(bits.shape[0], 32, 8).astype(jnp.uint32)
    bytes_ = jnp.sum(grouped * weights[None, None, :], axis=-1)
    desc = bytes_.astype(jnp.uint8)
    return jnp.where(valid[:, None], desc, 0)
