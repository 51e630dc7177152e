"""Binary patch-triplet descriptors (LATCH-style), batched over keypoints.

TPU-native re-design of the reference descriptor stage
(reference: kpextractor/external/latch.cpp:96-320 computes 32-byte LATCH
descriptors from 256 learned patch triplets after a 3x3 sigma=2 Gaussian
blur, latch.cpp:527-528). Bit i compares the SSD of an anchor 3x3 patch
against two companion patches: bit = SSD(anchor, a) < SSD(anchor, b).

The triplet sampling table here is generated from a fixed seed rather than
the reference's learned table (descriptors are only matched against other
descriptors from this extractor, so self-consistency is what matters); the
window/patch geometry matches (48x48 window, 3x3 patches).
"""

import jax
import jax.numpy as jnp
import numpy as np

DESCRIPTOR_BITS = 256
WINDOW = 48  # sampling window (latch.cpp uses a 48x48 region)
HALF = WINDOW // 2 - 2


def _triplet_table(seed=1234):
    """[256, 3, 2] (dy, dx) patch-center offsets: anchor, a, b."""
    rng = np.random.default_rng(seed)
    return rng.integers(-HALF, HALF + 1, size=(DESCRIPTOR_BITS, 3, 2))


TRIPLETS = jnp.asarray(_triplet_table())

# 3x3 patch offsets
_PATCH = jnp.asarray(
    [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
)  # [9, 2]


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
    (x, y). Border-safe via clamping (detector already filters borders)."""
    img = blur3(img)
    h, w = img.shape
    kx = xy[:, 0].astype(jnp.int32)
    ky = xy[:, 1].astype(jnp.int32)

    # sample positions: [K, 256, 3, 9, 2]
    centers = TRIPLETS[None, :, :, :]  # [1, 256, 3, 2]
    pos_y = ky[:, None, None, None] + centers[..., 0][..., None] + _PATCH[:, 0]
    pos_x = kx[:, None, None, None] + centers[..., 1][..., None] + _PATCH[:, 1]
    pos_y = jnp.clip(pos_y, 0, h - 1)
    pos_x = jnp.clip(pos_x, 0, w - 1)
    patches = img[pos_y, pos_x]  # [K, 256, 3, 9]

    anchor = patches[:, :, 0, :]
    pa = patches[:, :, 1, :]
    pb = patches[:, :, 2, :]
    ssd_a = jnp.sum((anchor - pa) ** 2, axis=-1)
    ssd_b = jnp.sum((anchor - pb) ** 2, axis=-1)
    bits = (ssd_a < ssd_b).astype(jnp.uint8)  # [K, 256]

    weights = (2 ** jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint32)
    grouped = bits.reshape(bits.shape[0], 32, 8).astype(jnp.uint32)
    bytes_ = jnp.sum(grouped * weights[None, None, :], axis=-1)
    desc = bytes_.astype(jnp.uint8)
    return jnp.where(valid[:, None], desc, 0)
