"""Quaternion algebra tests (mirrors mono-rfs-lib/Test/QuaternionTest.cs)."""

import numpy as np
import jax.numpy as jnp

from monorfs_tpu.geometry import quaternion as quat

RNG = np.random.default_rng(17)


def random_quat(n=None):
    shape = (4,) if n is None else (n, 4)
    q = RNG.normal(size=shape)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def test_mul_identity():
    q = random_quat(8)
    ident = jnp.broadcast_to(quat.identity(q.dtype), q.shape)
    np.testing.assert_allclose(quat.mul(q, ident), q, atol=1e-12)
    np.testing.assert_allclose(quat.mul(ident, q), q, atol=1e-12)


def test_conj_inverse():
    q = random_quat(8)
    prod = quat.mul(q, quat.conj(q))
    expected = np.zeros((8, 4))
    expected[:, 0] = 1
    np.testing.assert_allclose(prod, expected, atol=1e-12)


def test_exp_log_roundtrip():
    v = jnp.asarray(RNG.normal(size=(16, 3)) * 0.8)
    np.testing.assert_allclose(quat.log(quat.exp(v)), v, atol=1e-9)


def test_log_exp_roundtrip():
    q = random_quat(16)
    # log range is a half-sphere: compare rotations, not raw quats
    back = quat.exp(quat.log(q))
    rot_a = quat.to_matrix(q)
    rot_b = quat.to_matrix(back)
    np.testing.assert_allclose(rot_a, rot_b, atol=1e-9)


def test_add_sub_roundtrip():
    q = random_quat(16)
    v = jnp.asarray(RNG.normal(size=(16, 3)) * 0.5)
    np.testing.assert_allclose(quat.sub(quat.add(q, v), q), v, atol=1e-9)


def test_sub_add_roundtrip():
    a = random_quat(16)
    b = random_quat(16)
    d = quat.sub(a, b)
    back = quat.add(b, d)
    np.testing.assert_allclose(quat.to_matrix(back), quat.to_matrix(a), atol=1e-9)


def test_sqrt():
    q = random_quat(16)
    # force positive hemisphere (sqrt of a rotation is the half rotation)
    q = jnp.where(q[:, 0:1] < 0, -q, q)
    s = quat.sqrt(q)
    np.testing.assert_allclose(quat.mul(s, s), q, atol=1e-9)


def test_rotate_matches_matrix():
    q = random_quat(16)
    v = jnp.asarray(RNG.normal(size=(16, 3)))
    rotated = quat.rotate(q, v)
    by_matrix = jnp.einsum("nij,nj->ni", quat.to_matrix(q), v)
    np.testing.assert_allclose(rotated, by_matrix, atol=1e-9)


def test_vector_rotator():
    for _ in range(10):
        a = RNG.normal(size=3)
        b = RNG.normal(size=3)
        a /= np.linalg.norm(a)
        b /= np.linalg.norm(b)
        r = quat.vector_rotator(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(quat.rotate(r, jnp.asarray(a)), b, atol=1e-9)


def test_from_yaw_pitch_roll_unit():
    q = quat.from_yaw_pitch_roll(jnp.asarray(0.3), jnp.asarray(-0.2), jnp.asarray(1.1))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q)), 1.0, atol=1e-12)
