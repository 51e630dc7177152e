"""Batched weighted-Gaussian primitives for fixed small dimensions.

TPU-native re-design of the reference Gaussian component math
(reference: mono-rfs-lib/BaseStructures/Gaussian.cs:40-490). Components live
in dense arrays (mean [..., D], cov [..., D, D], log-weight [...]) instead of
objects; dead mixture slots carry log-weight = -inf. Inverses and
determinants use closed forms for D in {1, 2, 3} so everything vectorizes
with no data-dependent control flow.
"""

import math

import jax.numpy as jnp

LOG2PI = math.log(2.0 * math.pi)


def det(cov):
    """Determinant for [..., D, D] with D in {1, 2, 3}."""
    d = cov.shape[-1]
    if d == 1:
        return cov[..., 0, 0]
    if d == 2:
        return cov[..., 0, 0] * cov[..., 1, 1] - cov[..., 0, 1] * cov[..., 1, 0]
    if d == 3:
        a, b, c = cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2]
        dd, e, f = cov[..., 1, 0], cov[..., 1, 1], cov[..., 1, 2]
        g, h, i = cov[..., 2, 0], cov[..., 2, 1], cov[..., 2, 2]
        return a * (e * i - f * h) - b * (dd * i - f * g) + c * (dd * h - e * g)
    return jnp.linalg.det(cov)


def inv(cov):
    """Inverse for [..., D, D] with D in {1, 2, 3} via adjugate (stable for
    well-conditioned small covariances; avoids batched LU)."""
    d = cov.shape[-1]
    if d == 1:
        return 1.0 / cov
    dt = det(cov)[..., None, None]
    if d == 2:
        a, b = cov[..., 0, 0], cov[..., 0, 1]
        c, e = cov[..., 1, 0], cov[..., 1, 1]
        adj = jnp.stack(
            [jnp.stack([e, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
        )
        return adj / dt
    if d == 3:
        a, b, c = cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2]
        dd, e, f = cov[..., 1, 0], cov[..., 1, 1], cov[..., 1, 2]
        g, h, i = cov[..., 2, 0], cov[..., 2, 1], cov[..., 2, 2]
        adj = jnp.stack(
            [
                jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
                jnp.stack([f * g - dd * i, a * i - c * g, c * dd - a * f], axis=-1),
                jnp.stack([dd * h - e * g, b * g - a * h, a * e - b * dd], axis=-1),
            ],
            axis=-2,
        )
        return adj / dt
    return jnp.linalg.inv(cov)


def mahalanobis2(x, mean, cov_inv):
    """Squared Mahalanobis distance (Gaussian.cs:365-369).

    x, mean: [..., D]; cov_inv: [..., D, D]."""
    diff = x - mean
    return jnp.einsum("...i,...ij,...j->...", diff, cov_inv, diff)


def log_multiplier(cov):
    """log of the normalization constant (2 pi)^(-D/2) det^(-1/2)
    (Gaussian.cs:155)."""
    d = cov.shape[-1]
    return -0.5 * (d * LOG2PI + jnp.log(det(cov)))


def logpdf(x, mean, cov):
    """Unweighted log density (Gaussian.cs:211-215)."""
    return log_multiplier(cov) - 0.5 * mahalanobis2(x, mean, inv(cov))


def logpdf_with_inv(x, mean, cov_inv, logmult):
    return logmult - 0.5 * mahalanobis2(x, mean, cov_inv)


def merge_moments(logw, mean, cov, mask, axis=-1):
    """Moment-matched merge of masked components along `axis`
    (Gaussian.cs:297-347):
      w = sum wi,  m = sum wi mi / w,
      P = sum wi (Pi + mi mi^T) / w - m m^T.

    Returns (w, mean, cov) with the component axis reduced. Weights are
    linear-domain outputs (callers re-log as needed).
    """
    axis = axis % logw.ndim  # positive index of the component axis
    w = jnp.where(mask, jnp.exp(logw), 0.0)
    wsum = jnp.sum(w, axis=axis)
    safe = jnp.maximum(wsum, 1e-300 if w.dtype == jnp.float64 else 1e-30)
    wm = w[..., None]
    m = jnp.sum(wm * mean, axis=axis) / safe[..., None]
    second = cov + mean[..., :, None] * mean[..., None, :]
    p = jnp.sum(wm[..., None] * second, axis=axis) / safe[..., None, None]
    p = p - m[..., :, None] * m[..., None, :]
    return wsum, m, p


def fuse_canonical(vec_a, mat_a, vec_b, mat_b):
    """Information-form product of two Gaussians (Gaussian.cs:253-260):
    canonical vectors/matrices add."""
    return vec_a + vec_b, mat_a + mat_b


def canonical_of(mean, cov):
    """(canonical vector, canonical matrix) of a moments-form Gaussian."""
    ci = inv(cov)
    return jnp.einsum("...ij,...j->...i", ci, mean), ci


def moments_of(vec, mat):
    """(mean, cov) of a canonical-form Gaussian."""
    cov = inv(mat)
    return jnp.einsum("...ij,...j->...i", cov, vec), cov


def canonical_bias(mean, cov):
    """log Multiplier - 0.5 m^T P^-1 m (Gaussian.cs:117-123)."""
    return log_multiplier(cov) - 0.5 * mahalanobis2(jnp.zeros_like(mean), mean, inv(cov))
