"""Batched SE(3)-like pose algebra on 7-state arrays (x, y, z, qw, qx, qy, qz).

TPU-native re-design of the reference pose math
(reference: mono-rfs-lib/BaseStructures/Poses/Pose3D.cs:38-528). All functions
are pure jax ops over [..., 7] state arrays and [..., 6] odometry/tangent
arrays (dx, dy, dz, dpitch-ish Lie rotation triplet), broadcastable and
vmap/jit friendly.

The semi-Lie conventions follow the reference exactly:
  - add(state, d): body-frame translation by current orientation, rotation by
    exp of the Lie triplet (Pose3D.cs:282-291).
  - subtract: inverse of add (Pose3D.cs:297-308).
  - add_odometry: midpoint-rotation composition -- translation expressed in
    the frame halfway through the rotation delta (Pose3D.cs:314-333).
  - diff_odometry: its inverse (Pose3D.cs:339-359).
"""

import jax.numpy as jnp

from . import quaternion as quat

STATE_DIM = 7
ODO_DIM = 6


def identity(dtype=jnp.float32):
    return jnp.array([0, 0, 0, 1, 0, 0, 0], dtype=dtype)


def location(state):
    return state[..., 0:3]


def orientation(state):
    return state[..., 3:7]


def make(loc, q):
    return jnp.concatenate([loc, q], axis=-1)


def normalize(state):
    """Renormalize the quaternion part."""
    return make(location(state), quat.normalize(orientation(state)))


def add(state, delta):
    """Semi-Lie ⊕ of a 6-tangent onto the pose (Pose3D.cs:282-291)."""
    q = orientation(state)
    newq = quat.normalize(quat.add(q, delta[..., 3:6]))
    dloc = quat.rotate(q, delta[..., 0:3])
    return make(location(state) + dloc, newq)


def subtract(state, origin):
    """Semi-Lie ⊖: tangent transforming `origin` into `state`
    (Pose3D.cs:297-308)."""
    qo = orientation(origin)
    dxg = location(state) - location(origin)
    dx = quat.rotate(quat.conj(qo), dxg)
    lie = quat.sub(orientation(state), qo)  # = 2 log(qo* q)
    return jnp.concatenate([dx, lie], axis=-1)


def add_global(state, delta):
    """Global-coordinates ⊕: translation added in the world frame, rotation
    right-multiplied (Pose3D.cs:257-263). This is the tangent convention the
    reference Jacobians linearize in."""
    q = orientation(state)
    newq = quat.normalize(quat.add(q, delta[..., 3:6]))
    return make(location(state) + delta[..., 0:3], newq)


def subtract_global(state, origin):
    """Global-coordinates ⊖: world-frame translation difference, Lie rotation
    difference (Pose3D.cs:270-276)."""
    dq = quat.sub(orientation(state), orientation(origin))
    dx = location(state) - location(origin)
    return jnp.concatenate([dx, dq], axis=-1)


def add_odometry(state, delta):
    """Move the pose by a body-frame odometry delta with midpoint rotation
    (Pose3D.cs:314-333)."""
    q = orientation(state)
    dq = quat.exp(0.5 * delta[..., 3:6])  # FromLinear of the Lie triplet
    newq = quat.normalize(quat.mul(q, dq))
    mid = quat.mul(q, quat.sqrt(dq))
    dloc = quat.rotate(mid, delta[..., 0:3])
    return make(location(state) + dloc, newq)


def diff_odometry(state, origin):
    """Odometry delta transforming `origin` into `state` (Pose3D.cs:339-359)."""
    qo = orientation(origin)
    dq = quat.mul(quat.conj(qo), orientation(state))
    mid = quat.mul(qo, quat.sqrt(dq))
    dxg = location(state) - location(origin)
    dx = quat.rotate(quat.conj(mid), dxg)
    lie = 2.0 * quat.log(dq)
    return jnp.concatenate([dx, lie], axis=-1)


def _eye3(like):
    return jnp.broadcast_to(jnp.eye(3, dtype=like.dtype), like.shape[:-1] + (3, 3))


def _zeros3(like):
    return jnp.zeros(like.shape[:-1] + (3, 3), dtype=like.dtype)


def _block(a, b, c, d):
    top = jnp.concatenate([a, b], axis=-1)
    bot = jnp.concatenate([c, d], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def add_jacobian(state, delta):
    """d add(state, d)/dd around delta: [[C_rot, 0], [0, I]]
    (Pose3D.cs:366-377)."""
    crot = quat.to_matrix(orientation(state))
    return _block(crot, _zeros3(state), _zeros3(state), _eye3(state))


def subtract_jacobian(state, origin):
    """d subtract(state, origin)/dstate: [[C_o^T, 0], [0, I]]
    (Pose3D.cs:384-395)."""
    crot = quat.to_matrix(orientation(origin))
    crot_t = jnp.swapaxes(crot, -1, -2)
    return _block(crot_t, _zeros3(state), _zeros3(state), _eye3(state))


def cross_matrix(v):
    """[v]_x cross-product matrix, [..., 3] -> [..., 3, 3]
    (reference: Util.cs:107-118)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def add_odometry_jacobian(state, delta):
    """Linearization F of add_odometry around this pose (Pose3D.cs:404-423)."""
    dq = quat.add(quat.identity(state.dtype), delta[..., 3:6])
    sq = quat.sqrt(dq)
    cmid = quat.to_matrix(quat.mul(orientation(state), sq))
    cdelta = quat.to_matrix(dq)
    csqrt = quat.to_matrix(sq)
    crossdx = cross_matrix(delta[..., 0:3])
    dxdq = -jnp.einsum("...ij,...jk,...lk->...il", cmid, crossdx, csqrt)
    return _block(
        _eye3(state), dxdq, _zeros3(state), jnp.swapaxes(cdelta, -1, -2)
    )
