"""Trivial Euclidean pose spaces (Linear1D / Linear2D).

Re-design of the reference linear pose families
(reference: mono-rfs-lib/BaseStructures/Poses/LinearPose2D.cs:38-,
LinearPose1D.cs:38-): state == odometry == Lie tangent, all group ops are
vector addition and every Jacobian is the identity.
"""

import jax.numpy as jnp


def identity(dim, dtype=jnp.float32):
    return jnp.zeros((dim,), dtype=dtype)


def add(state, delta):
    return state + delta


def subtract(state, origin):
    return state - origin


def add_odometry(state, delta):
    return state + delta


def diff_odometry(state, origin):
    return state - origin


def _eye(state):
    n = state.shape[-1]
    return jnp.broadcast_to(jnp.eye(n, dtype=state.dtype), state.shape[:-1] + (n, n))


def add_jacobian(state, delta):
    return _eye(state)


def subtract_jacobian(state, origin):
    return _eye(state)


def add_odometry_jacobian(state, delta):
    return _eye(state)
