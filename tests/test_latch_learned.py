"""Learned LATCH table: structure sanity + matching quality on a known
image shift (reference: kpextractor/external/latch.cpp setSamplingPoints +
CalculateSums semantics)."""

import numpy as np
import jax.numpy as jnp

from monorfs_tpu.frontend import fast, latch, matching
from monorfs_tpu.frontend.latch_table import SAMPLING_POINTS


def test_table_structure():
    arr = np.asarray(SAMPLING_POINTS)
    assert arr.shape == (512, 6)
    assert arr.min() >= -24 and arr.max() <= 24
    # the jitted table is the first 256 triplets in (A, B, C) x (x, y) order
    trip = np.asarray(latch.TRIPLETS)
    assert trip.shape == (256, 3, 2)
    np.testing.assert_array_equal(trip.reshape(256, 6), arr[:256])
    # a known spot check against latch.cpp:568 first row (13,-6, 19,19, 23,-4)
    np.testing.assert_array_equal(arr[0], [13, -6, 19, 19, 23, -4])


def _textured_wall(h=160, w=420, seed=7):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 40, np.float64)
    for _ in range(120):
        y = rng.integers(30, h - 50)
        x = rng.integers(30, w - 50)
        s = rng.integers(10, 22)
        img[y : y + s, x : x + s] = rng.integers(100, 255)
    return img


def test_learned_table_matches_under_shift():
    """Descriptors from the learned table re-identify the same corners after
    a pure image shift: >=70% of kNN matches land on the true displacement."""
    img = _textured_wall()
    shift = 6
    a = img[:, :360]
    b = img[:, shift : 360 + shift]  # camera panned right by `shift` px

    xy_a, _, val_a = fast.detect(jnp.asarray(a), threshold=40.0,
                                 max_keypoints=128, border=30)
    xy_b, _, val_b = fast.detect(jnp.asarray(b), threshold=40.0,
                                 max_keypoints=128, border=30)
    desc_a = latch.describe(jnp.asarray(a), xy_a, val_a)
    desc_b = latch.describe(jnp.asarray(b), xy_b, val_b)

    idx, ok = matching.knn_match(desc_b, val_b, desc_a, val_a)
    idx, ok = np.asarray(idx), np.asarray(ok)
    xa, xb = np.asarray(xy_a), np.asarray(xy_b)

    matched = np.flatnonzero(ok & np.asarray(val_b))
    assert len(matched) >= 20, len(matched)
    disp = xa[idx[matched]] - xb[matched]  # expect (+shift, 0)
    good = (np.abs(disp[:, 0] - shift) <= 1) & (np.abs(disp[:, 1]) <= 1)
    rate = good.mean()
    assert rate >= 0.7, (rate, len(matched))
