"""Batched quaternion algebra on (w, x, y, z) arrays.

TPU-native re-design of the reference quaternion math
(reference: mono-rfs-lib/BaseStructures/Quaternion.cs:38-411). Every function
is a pure jax op over arrays shaped [..., 4] (quaternions) or [..., 3]
(Lie-algebra / vectors), broadcastable and vmap/jit friendly.

Conventions (matching the reference semantics):
  - `exp(v)` is the quaternion exponential of the pure-imaginary quaternion
    with vector part v: [cos|v|, sin|v| * v/|v|]  (Quaternion.cs:185-196).
  - `log(q)` returns phi * unit(vec) with phi = acos(w) in [0, pi]
    (Quaternion.cs:203-217); implemented with atan2 for stability.
  - `add(q, v)` = q * exp(v/2); `sub(a, b)` = 2 log(b* a)
    (Quaternion.cs:165-178).
  - `sqrt(q)` is the positive half-rotation (Quaternion.cs:225-235).
"""

import jax.numpy as jnp

_EPS = 1e-12


def _safe_norm(v, axis=-1, eps=_EPS):
    """Norm with NaN-free gradient at zero."""
    sq = jnp.sum(v * v, axis=axis)
    safe = jnp.sqrt(jnp.where(sq > eps * eps, sq, eps * eps))
    return jnp.where(sq > eps * eps, safe, jnp.sqrt(sq + eps * eps) * 0 + jnp.sqrt(sq))


def identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def mul(a, b):
    """Hamilton product a*b. [..., 4] x [..., 4] -> [..., 4]."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by + ay * bw + az * bx - ax * bz,
            aw * bz + az * bw + ax * by - ay * bx,
        ],
        axis=-1,
    )


def conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize(q):
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.maximum(n2, _EPS)), 1.0)


def exp(v):
    """Quaternion exponential of vector v [..., 3] -> [..., 4]."""
    phi2 = jnp.sum(v * v, axis=-1, keepdims=True)
    phi = jnp.sqrt(jnp.maximum(phi2, _EPS * _EPS))
    small = phi2 < _EPS * _EPS
    # sin(phi)/phi -> 1 as phi -> 0; use series for small angles
    sinc = jnp.where(small, 1.0 - phi2 / 6.0, jnp.sin(phi) / phi)
    w = jnp.where(small, 1.0 - phi2 / 2.0, jnp.cos(phi))
    return jnp.concatenate([w, sinc * v], axis=-1)


def log(q):
    """Quaternion logarithm [..., 4] -> [..., 3] (phi * unit axis)."""
    q = normalize(q)
    w = q[..., 0:1]
    vec = q[..., 1:4]
    mag2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
    mag = jnp.sqrt(jnp.maximum(mag2, _EPS * _EPS))
    phi = jnp.arctan2(mag, w)  # == acos(w) for normalized q, but stable
    small = mag2 < _EPS * _EPS
    scale = jnp.where(small, 0.0, phi / mag)
    return scale * vec


def sqrt(q):
    """Positive square root of a rotation quaternion (Quaternion.cs:225-235)."""
    w = q[..., 0:1]
    near_pi = jnp.abs(w + 1.0) < 1e-8
    rw = jnp.sqrt(jnp.maximum(0.5 * (1.0 + w), 1e-16))
    alpha = jnp.where(near_pi, 0.0, 1.0 / (2.0 * rw))
    root = jnp.concatenate([jnp.where(near_pi, 1.0, rw), alpha * q[..., 1:4]], axis=-1)
    return root


def add(q, v):
    """Lie ⊕: q * exp(v/2) (Quaternion.cs:165-168)."""
    return mul(q, exp(0.5 * v))


def sub(a, b):
    """Lie ⊖: 2 log(b* a) (Quaternion.cs:175-178)."""
    return 2.0 * log(mul(conj(b), a))


def rotate(q, v):
    """Rotate vector v by q: vec part of q * (0, v) * q*.

    Uses the expanded cross-product form (no intermediate quaternion).
    """
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def to_matrix(q):
    """Rotation matrix [..., 3, 3] of quaternion (Quaternion.cs:327-342)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    xw, yw, zw = x * w, y * w, z * w
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - zw), 2 * (xz + yw)], axis=-1)
    row1 = jnp.stack([2 * (xy + zw), 1 - 2 * (xx + zz), 2 * (yz - xw)], axis=-1)
    row2 = jnp.stack([2 * (xz - yw), 2 * (yz + xw), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_yaw_pitch_roll(yaw, pitch, roll):
    """Quaternion from yaw-pitch-roll (Quaternion.cs:254-273)."""
    y2, p2, r2 = 0.5 * yaw, 0.5 * pitch, 0.5 * roll
    sy, cy = jnp.sin(y2), jnp.cos(y2)
    sp, cp = jnp.sin(p2), jnp.cos(p2)
    sr, cr = jnp.sin(r2), jnp.cos(r2)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
            cy * cp * sr - sy * sp * cr,
        ],
        axis=-1,
    )


def vector_rotator(src, dst):
    """Quaternion rotating unit vector src into unit vector dst
    (Quaternion.cs:281-284)."""
    w = 1.0 + jnp.sum(src * dst, axis=-1, keepdims=True)
    v = jnp.cross(src, dst)
    return normalize(jnp.concatenate([w, v], axis=-1))
