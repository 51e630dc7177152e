"""Measurement model tests: FD Jacobians, back-projection and fit roundtrips
(mirrors the oracle style of LoopyPHDNavigatorTest.FitMeasurement*)."""

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu import models
from monorfs_tpu.geometry import pose3d

RNG = np.random.default_rng(31)


def random_pose():
    s = RNG.normal(size=7)
    s[3:] /= np.linalg.norm(s[3:])
    return jnp.asarray(s)


def visible_landmark(m, pose):
    """A landmark safely inside the frustum."""
    p = m.params
    px = RNG.uniform(p.film_left * 0.5, p.film_right * 0.5)
    py = RNG.uniform(p.film_top * 0.5, p.film_bottom * 0.5)
    rng = RNG.uniform(p.range_min * 2, p.range_max * 0.8)
    z = jnp.asarray([px, py, rng])
    return m.to_map(p, pose, z), z


def test_prm3d_roundtrip():
    m = models.PRM3D
    for _ in range(10):
        pose = random_pose()
        lm, _ = visible_landmark(m, pose)
        z = m.measure(m.params, pose, lm)
        lm2 = m.to_map(m.params, pose, z)
        np.testing.assert_allclose(lm2, lm, atol=1e-9)


def test_prm3d_jac_landmark_fd():
    m = models.PRM3D
    pose = random_pose()
    lm, _ = visible_landmark(m, pose)
    analytic = np.asarray(m.jac_landmark(m.params, pose, lm))
    fd = np.asarray(
        jax.jacfwd(lambda x: m.measure(m.params, pose, x))(lm)
    )
    np.testing.assert_allclose(analytic, fd, rtol=1e-6, atol=1e-8)


def test_prm3d_jac_pose_fd():
    """dh/dpose in the semi-Lie `add` tangent convention (see
    prm3d.jac_pose docstring)."""
    m = models.PRM3D
    pose = random_pose()
    lm, _ = visible_landmark(m, pose)
    analytic = np.asarray(m.jac_pose(m.params, pose, lm))

    def f(h):
        return m.measure(m.params, pose3d.add(pose, h), lm)

    fd = np.asarray(jax.jacfwd(f)(jnp.zeros(6)))
    np.testing.assert_allclose(analytic, fd, rtol=1e-5, atol=1e-7)


def test_prm3d_fit_to_measurement():
    """FitToMeasurement produces a pose from which the landmark measures
    exactly z (LoopyPHDNavigatorTest.cs:194-279)."""
    m = models.PRM3D
    for _ in range(10):
        pose0 = random_pose()
        lm, z = visible_landmark(m, pose0)
        # perturb z, then fit a pose reproducing it
        z2 = z + jnp.asarray(RNG.normal(size=3) * np.array([20.0, 20.0, 0.05]))
        fitted = m.fit_to_measurement(m.params, pose0, z2, lm)
        z_check = m.measure(m.params, fitted, lm)
        np.testing.assert_allclose(z_check, z2, atol=1e-6)


def test_prm3d_visibility():
    m = models.PRM3D
    p = m.params
    assert bool(m.visible(p, jnp.asarray([0.0, 0.0, 1.0])))
    assert not bool(m.visible(p, jnp.asarray([1000.0, 0.0, 1.0])))
    assert not bool(m.visible(p, jnp.asarray([0.0, 0.0, 5.0])))
    ramp = jnp.asarray([10.0, 10.0, 0.1])
    assert float(m.fuzzy_visible(p, jnp.asarray([0.0, 0.0, 1.0]), ramp)) == 1.0
    assert float(m.fuzzy_visible(p, jnp.asarray([1000.0, 0.0, 1.0]), ramp)) == 0.0
    edge = float(m.fuzzy_visible(p, jnp.asarray([p.film_left + 5.0, 0.0, 1.0]), ramp))
    assert 0.0 < edge < 1.0


def test_linear2d_basics():
    m = models.MODEL_2D
    pose = jnp.asarray([1.0, 2.0])
    lm = jnp.asarray([1.5, 2.5, 0.0])
    z = m.measure(m.params, pose, lm)
    np.testing.assert_allclose(z, [0.5, 0.5])
    np.testing.assert_allclose(m.to_map(m.params, pose, z), lm)
    np.testing.assert_allclose(
        m.fit_to_measurement(m.params, pose, z, lm), pose
    )
    np.testing.assert_allclose(
        m.jac_landmark(m.params, pose, lm), [[1, 0, 0], [0, 1, 0]]
    )
    np.testing.assert_allclose(m.jac_pose(m.params, pose, lm), [[-1, 0], [0, -1]])
    assert float(m.volume(m.params)) == 16.0


def test_linear1d_basics():
    m = models.MODEL_1D
    pose = jnp.asarray([1.0])
    lm = jnp.asarray([1.5, 0.0, 0.0])
    z = m.measure(m.params, pose, lm)
    np.testing.assert_allclose(z, [0.5])
    np.testing.assert_allclose(m.to_map(m.params, pose, z), lm)
    assert float(m.volume(m.params)) == 4.0


def test_registry():
    assert models.get("PRM3D").name == "PRM3D"
    assert models.get("Linear2D").meas_dim == 2
    assert models.get("Linear1D").meas_dim == 1


def _soa_parity_case(m):
    pose = random_pose()
    lms = jnp.stack([visible_landmark(m, pose)[0] for _ in range(6)])
    ml = [lms[:, i] for i in range(3)]
    return pose, lms, ml


def test_soa_measure_jac_tomap_parity():
    """SoA (K-last) model functions match the AoS reference forms."""
    for m in (models.PRM3D, models.get("Linear2D"), models.get("Linear1D"),
              models.get("Kinect")):
        pose = random_pose()[: m.pose.state_dim]
        if m.pose.state_dim != 7:
            pose = jnp.asarray(RNG.normal(size=m.pose.state_dim))
            lms = jnp.asarray(RNG.normal(size=(6, 3)))
        else:
            lms = jnp.stack([visible_landmark(m, pose)[0] for _ in range(6)])
        ml = [lms[:, i] for i in range(3)]

        z_aos = np.asarray(m.measure(m.params, pose[None, :], lms))
        z_soa = np.stack(
            [np.asarray(v) for v in m.measure_soa_fn()(m.params, pose, ml)],
            axis=-1,
        )
        np.testing.assert_allclose(z_soa, z_aos, rtol=1e-10, atol=1e-12)

        j_aos = np.broadcast_to(
            np.asarray(m.jac_landmark(m.params, pose[None, :], lms)),
            (6, m.meas_dim, 3),
        )
        j_soa_l = m.jac_landmark_soa_fn()(m.params, pose, ml)
        j_soa = np.stack(
            [
                np.stack(
                    [np.broadcast_to(np.asarray(e), (6,)) for e in row], -1
                )
                for row in j_soa_l
            ],
            axis=-2,
        )
        np.testing.assert_allclose(j_soa, j_aos, rtol=1e-10, atol=1e-12)

        zs = [jnp.asarray(z_aos[:, i]) for i in range(m.meas_dim)]
        lm_aos = np.asarray(
            m.to_map(m.params, pose[None, :], jnp.asarray(z_aos))
        )
        lm_soa = np.stack(
            [np.asarray(v) for v in m.to_map_soa_fn()(m.params, pose, zs)],
            axis=-1,
        )
        np.testing.assert_allclose(lm_soa, lm_aos, rtol=1e-9, atol=1e-10)

        ramp = jnp.asarray([10.0, 10.0, 0.2][: m.meas_dim])
        if m.uses_depth:
            depth = jnp.full((12, 16), 1e3)
            f_aos = np.asarray(
                m.fuzzy_visible(m.params, jnp.asarray(z_aos), ramp, depth)
            )
            f_soa = np.asarray(
                m.fuzzy_visible_soa_fn(depth)(m.params, zs, ramp)
            )
        else:
            f_aos = np.asarray(m.fuzzy_visible(m.params, jnp.asarray(z_aos), ramp))
            f_soa = np.asarray(m.fuzzy_visible_soa_fn(None)(m.params, zs, ramp))
        np.testing.assert_allclose(f_soa, f_aos, rtol=1e-12, atol=1e-12)
