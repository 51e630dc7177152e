"""Descriptor matching + temporal consistency filtering.

TPU-native re-design of the reference temporal keypoint filter
(reference: mono-rfs-lib/SLAM/Vehicles/KinectVehicle.cs:503-576): kNN
Hamming matching (k=3, normalized distance threshold 0.37) against the
previous frame followed by a RANSAC homography inlier filter. Hamming
distances are one XOR + popcount-LUT matmul-shaped reduction; RANSAC runs a
fixed fan of hypotheses in parallel (vmapped 4-point DLT solves) instead of
sequential early-exit iterations.
"""

import jax
import jax.numpy as jnp
import numpy as np

_POPCOUNT = jnp.asarray(
    np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1),
    jnp.int32,
)


def hamming_matrix(desc_a, desc_b):
    """[KA, KB] Hamming distances between uint8 descriptor sets."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(_POPCOUNT[x.astype(jnp.int32)], axis=-1)


def knn_match(desc_a, valid_a, desc_b, valid_b, max_norm_distance=0.37):
    """Best-match (within threshold) of each descriptor in A against B
    (KinectVehicle.cs:510-527 uses k=3 + threshold; the extra neighbors only
    feed the threshold check, so the thresholded best match is equivalent).

    Returns (match_idx [KA], matched [KA])."""
    nbits = desc_a.shape[1] * 8
    d = hamming_matrix(desc_a, desc_b)
    d = jnp.where(valid_b[None, :], d, nbits + 1)
    best = jnp.argmin(d, axis=1)
    bestd = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    matched = valid_a & (bestd <= max_norm_distance * nbits)
    return best, matched


def _homography_dlt(src, dst):
    """4-point homography by DLT. src/dst: [4, 2]. Returns [3, 3]."""
    def rows(s, d):
        x, y = s
        u, v = d
        r1 = jnp.array([-x, -y, -1.0, 0.0, 0.0, 0.0, u * x, u * y, u])
        r2 = jnp.array([0.0, 0.0, 0.0, -x, -y, -1.0, v * x, v * y, v])
        return jnp.stack([r1, r2])

    a = jnp.concatenate([rows(src[i], dst[i]) for i in range(4)], axis=0)
    # h = null vector of A: smallest right singular vector
    _, _, vt = jnp.linalg.svd(a)
    h = vt[-1]
    return h.reshape(3, 3)


def _project(hmat, pts):
    homo = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=1)
    out = homo @ hmat.T
    return out[:, :2] / jnp.where(jnp.abs(out[:, 2:3]) > 1e-9, out[:, 2:3], 1e-9)


def ransac_homography(src, dst, mask, key, iterations=64, tolerance=3.0):
    """Parallel-hypothesis RANSAC homography inlier filter
    (KinectVehicle.cs:529-553 semantics). src/dst: [K, 2] matched point
    pairs with validity mask. Returns the inlier mask of the best
    hypothesis."""
    k = src.shape[0]
    n_valid = jnp.maximum(jnp.sum(mask), 1)

    # sample 4 indices per hypothesis, biased to valid entries
    logits = jnp.where(mask, 0.0, -1e9)
    keys = jax.random.split(key, iterations)

    def hypothesis(subkey):
        idx = jax.random.categorical(subkey, logits, shape=(4,))
        hmat = _homography_dlt(src[idx], dst[idx])
        proj = _project(hmat, src)
        err = jnp.linalg.norm(proj - dst, axis=1)
        inliers = mask & (err < tolerance)
        return jnp.sum(inliers), inliers

    counts, inlier_sets = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(counts)
    ok = counts[best] >= jnp.minimum(4, n_valid)
    return jnp.where(ok, inlier_sets[best], mask)


def temporal_filter(xy, desc, valid, prev_xy, prev_desc, prev_valid, key,
                    max_norm_distance=0.37, tolerance=3.0):
    """Full temporal keypoint filter: keep current keypoints that match the
    previous frame and survive the homography consistency check. On the
    first frame (no previous keypoints) everything passes
    (KinectVehicle.cs:505-508)."""
    match, matched = knn_match(desc, valid, prev_desc, prev_valid,
                               max_norm_distance)
    inliers = ransac_homography(
        xy, prev_xy[match], matched, key, tolerance=tolerance
    )
    has_prev = jnp.any(prev_valid)
    return jnp.where(has_prev, valid & inliers, valid)
