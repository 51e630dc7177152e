"""Pose3D algebra tests (mirrors mono-rfs-lib/Test/Pose3DTest.cs)."""

import numpy as np
import jax.numpy as jnp

from monorfs_tpu.geometry import pose3d, quaternion as quat

RNG = np.random.default_rng(23)


def random_pose(n=None):
    shape = (7,) if n is None else (n, 7)
    s = RNG.normal(size=shape)
    s = np.asarray(s)
    q = s[..., 3:7]
    s[..., 3:7] = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(s)


def poses_equal(a, b, atol=1e-8):
    np.testing.assert_allclose(a[..., :3], b[..., :3], atol=atol)
    np.testing.assert_allclose(
        quat.to_matrix(a[..., 3:7]), quat.to_matrix(b[..., 3:7]), atol=atol
    )


def test_add_subtract_roundtrip():
    p = random_pose(16)
    d = jnp.asarray(RNG.normal(size=(16, 6)) * 0.5)
    np.testing.assert_allclose(pose3d.subtract(pose3d.add(p, d), p), d, atol=1e-8)


def test_subtract_add_roundtrip():
    a = random_pose(16)
    b = random_pose(16)
    poses_equal(pose3d.add(b, pose3d.subtract(a, b)), a)


def test_odometry_roundtrip():
    p = random_pose(16)
    d = jnp.asarray(RNG.normal(size=(16, 6)) * 0.5)
    np.testing.assert_allclose(
        pose3d.diff_odometry(pose3d.add_odometry(p, d), p), d, atol=1e-8
    )
    a = random_pose(16)
    b = random_pose(16)
    poses_equal(pose3d.add_odometry(b, pose3d.diff_odometry(a, b)), a)


def test_identity_ops():
    p = random_pose()
    zero = jnp.zeros(6, dtype=p.dtype)
    poses_equal(pose3d.add_odometry(p, zero), p)
    poses_equal(pose3d.add(p, zero), p)
    np.testing.assert_allclose(pose3d.subtract(p, p), zero, atol=1e-10)


def _fd_jacobian(f, x, eps=1e-7):
    """Finite-difference jacobian of f: R^n -> R^m at x."""
    x = np.asarray(x, dtype=np.float64)
    y0 = np.asarray(f(jnp.asarray(x)))
    jac = np.zeros((y0.shape[-1], x.shape[-1]))
    for i in range(x.shape[-1]):
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        jac[:, i] = (np.asarray(f(jnp.asarray(xp))) - np.asarray(f(jnp.asarray(xm)))) / (
            2 * eps
        )
    return jac


def test_global_roundtrip():
    p = random_pose(8)
    d = jnp.asarray(RNG.normal(size=(8, 6)) * 0.5)
    np.testing.assert_allclose(
        pose3d.subtract_global(pose3d.add_global(p, d), p), d, atol=1e-8
    )


def test_add_jacobian_fd():
    """AddJacobian linearizes Add in the AddGlobal/SubtractGlobal tangent
    convention (Pose3D.cs:366-377): translation through C_rot, rotation
    through identity (checked at zero rotation delta)."""
    p = random_pose()
    d0 = jnp.zeros(6, dtype=p.dtype)
    base = pose3d.add(p, d0)

    def f(h):
        return pose3d.subtract_global(pose3d.add(p, d0 + h), base)

    fd = _fd_jacobian(f, np.zeros(6))
    analytic = np.asarray(pose3d.add_jacobian(p, d0))
    np.testing.assert_allclose(fd, analytic, atol=1e-5)


def test_add_odometry_jacobian_fd():
    """F = d [f(x ⊕g h, u) ⊖g f(x, u)] / dh at h=0 with the global tangent
    convention (Pose3D.cs:398-423)."""
    p = random_pose()
    d = jnp.asarray(RNG.normal(size=6) * 0.4)
    base = pose3d.add_odometry(p, d)

    def f(h):
        return pose3d.subtract_global(
            pose3d.add_odometry(pose3d.add_global(p, h), d), base
        )

    fd = _fd_jacobian(f, np.zeros(6))
    analytic = np.asarray(pose3d.add_odometry_jacobian(p, d))
    np.testing.assert_allclose(fd, analytic, atol=1e-5)


def test_subtract_jacobian_fd():
    """SubtractJacobian = [[C_origin^T, 0], [0, I]] (Pose3D.cs:384-395);
    exact when the two poses share an orientation."""
    b = random_pose()
    a = pose3d.add_global(b, jnp.asarray(np.r_[RNG.normal(size=3), np.zeros(3)]))
    base = pose3d.subtract(a, b)

    def f(h):
        return pose3d.subtract(pose3d.add_global(a, h), b) - base

    fd = _fd_jacobian(f, np.zeros(6))
    analytic = np.asarray(pose3d.subtract_jacobian(a, b))
    np.testing.assert_allclose(fd, analytic, atol=1e-5)


def test_add_odometry_inverse_is_negation():
    """The midpoint-rotation composition's exact inverse reading is the
    NEGATED delta: if q = p (+) u then p = q (+) (-u). The rotation
    inverts as exp(-w/2) = conj(exp(w/2)) and the translation rides the
    same midpoint frame q * conj(sqrt(dq)). This identity is what lets
    the smoother's backward sequential-refit pass reuse the forward scan
    with flipped nodes and negated readings (loopy.reverse_refit_inputs)."""
    for _ in range(10):
        p = random_pose()
        u = jnp.asarray(RNG.normal(size=6) * 0.7)
        back = pose3d.add_odometry(pose3d.add_odometry(p, u), -u)
        b = np.asarray(back)
        a = np.asarray(p)
        np.testing.assert_allclose(b[:3], a[:3], atol=1e-6)
        # quaternion double cover: q and -q are the same rotation
        qerr = min(np.linalg.norm(b[3:] - a[3:]), np.linalg.norm(b[3:] + a[3:]))
        assert qerr < 1e-6, qerr
