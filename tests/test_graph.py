"""Graph-SLAM backend tests: GN solver correctness on synthetic problems
(coverage the reference lacks for ISAM2Navigator, per SURVEY §4 gaps)."""

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu import models
from monorfs_tpu.config import Config
from monorfs_tpu.geometry import pose3d
from monorfs_tpu.slam import graph
from monorfs_tpu.slam.isam2nav import ISAM2Navigator


def linear2d_cfg():
    cfg = Config()
    cfg.set_linear2d_defaults()
    cfg.motion_covariance = np.diag([0.05, 0.05])
    cfg.measurement_covariance = np.diag([5e-4, 5e-4])
    return cfg


def test_gn_linear2d_recovers_truth():
    """Hand-built 2D graph: 3 poses, 2 landmarks, exact measurements.
    GN must recover the exact configuration (linear problem)."""
    model = models.get("Linear2D")
    cfg = graph.GraphConfig(max_poses=4, max_landmarks=4, max_factors=16)
    true_poses = np.array([[0.0, 0], [1.0, 0.2], [2.0, 0.1]])
    true_lms = np.array([[1.0, 1.5, 0.0], [2.5, -0.5, 0.0]])

    st = graph.empty_state(model, cfg, true_poses[0], jnp.float64)
    # noisy initial guesses, exact factors
    poses0 = st.poses
    for t in range(1, 3):
        poses0 = poses0.at[t].set(jnp.asarray(true_poses[t] + 0.3))
    lms0 = st.landmarks
    for j in range(2):
        # perturb only observable dims (z is unobservable in Linear2D and
        # stays at its to_map initialization of 0, Linear2DMeasurer.cs:200-203)
        lms0 = lms0.at[j].set(
            jnp.asarray(true_lms[j] + np.array([0.2, 0.2, 0.0]))
        )
    lm_mask = st.lm_mask.at[0].set(True).at[1].set(True)

    between = st.between
    bmask = st.between_mask
    for t in range(1, 3):
        between = between.at[t].set(jnp.asarray(true_poses[t] - true_poses[t - 1]))
        bmask = bmask.at[t].set(True)

    f_pose, f_lm, f_z, f_mask = st.f_pose, st.f_lm, st.f_z, st.f_mask
    fi = 0
    for t in range(3):
        for j in range(2):
            z = true_lms[j][:2] - true_poses[t]
            f_pose = f_pose.at[fi].set(t)
            f_lm = f_lm.at[fi].set(j)
            f_z = f_z.at[fi].set(jnp.asarray(z))
            f_mask = f_mask.at[fi].set(True)
            fi += 1

    st = graph.GraphState(
        poses=poses0, n_poses=jnp.int32(3), landmarks=lms0, lm_mask=lm_mask,
        between=between, between_mask=bmask, pose_fixed=st.pose_fixed,
        f_pose=f_pose, f_lm=f_lm, f_z=f_z, f_mask=f_mask,
    )
    c = Config()
    c.set_linear2d_defaults()
    minfo = jnp.eye(2) / 0.05
    sinfo = jnp.eye(2) / 5e-4
    out = graph.gauss_newton(model, cfg, st, minfo, sinfo)
    np.testing.assert_allclose(np.asarray(out.poses[:3]), true_poses, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.landmarks[:2]), true_lms, atol=1e-8)


def test_gn_prm3d_converges():
    """3D pixel-range graph with noisy initialization converges to a
    configuration consistent with the measurements."""
    model = models.get("PRM3D")
    cfg = graph.GraphConfig(max_poses=4, max_landmarks=4, max_factors=24,
                            gn_iters=10)
    rng = np.random.default_rng(0)

    true_poses = [np.array([0, 0, 0, 1, 0, 0, 0.0])]
    deltas = [np.array([0.05, 0.01, 0.02, 0.0, 0.02, 0.0]),
              np.array([0.03, -0.02, 0.01, 0.01, 0.0, 0.0])]
    for d in deltas:
        true_poses.append(
            np.asarray(pose3d.add_odometry(jnp.asarray(true_poses[-1]), jnp.asarray(d)))
        )
    true_lms = np.array(
        [[0.1, 0.05, 1.0], [-0.2, 0.1, 1.2], [0.3, -0.1, 0.8]]
    )

    st = graph.empty_state(model, cfg, true_poses[0], jnp.float64)
    poses0 = st.poses
    for t in range(1, 3):
        poses0 = poses0.at[t].set(
            pose3d.add(jnp.asarray(true_poses[t]),
                       jnp.asarray(rng.normal(size=6) * 0.01))
        )
    lms0 = st.landmarks
    lm_mask = st.lm_mask
    for j in range(3):
        lms0 = lms0.at[j].set(jnp.asarray(true_lms[j] + rng.normal(size=3) * 0.02))
        lm_mask = lm_mask.at[j].set(True)

    between = st.between
    bmask = st.between_mask
    for t, d in enumerate(deltas, start=1):
        between = between.at[t].set(jnp.asarray(d))
        bmask = bmask.at[t].set(True)

    f_pose, f_lm, f_z, f_mask = st.f_pose, st.f_lm, st.f_z, st.f_mask
    fi = 0
    for t in range(3):
        for j in range(3):
            z = model.measure(model.params, jnp.asarray(true_poses[t]),
                              jnp.asarray(true_lms[j]))
            f_pose = f_pose.at[fi].set(t)
            f_lm = f_lm.at[fi].set(j)
            f_z = f_z.at[fi].set(z)
            f_mask = f_mask.at[fi].set(True)
            fi += 1

    st = graph.GraphState(
        poses=poses0, n_poses=jnp.int32(3), landmarks=lms0, lm_mask=lm_mask,
        between=between, between_mask=bmask, pose_fixed=st.pose_fixed,
        f_pose=f_pose, f_lm=f_lm, f_z=f_z, f_mask=f_mask,
    )
    minfo = jnp.asarray(np.diag(1.0 / (np.array([5e-3] * 3 + [2e-4] * 3))))
    sinfo = jnp.asarray(np.diag(1.0 / np.array([2.0, 2.0, 1e-3])))
    out = graph.gauss_newton(model, cfg, st, minfo, sinfo)

    # residuals should be ~zero at the solution
    for t in range(3):
        for j in range(3):
            z_true = model.measure(model.params, jnp.asarray(true_poses[t]),
                                   jnp.asarray(true_lms[j]))
            z_est = model.measure(model.params, out.poses[t], out.landmarks[j])
            np.testing.assert_allclose(np.asarray(z_est), np.asarray(z_true),
                                       atol=1e-4)


def test_isam2_navigator_end_to_end():
    """Full ISAM2-style run in the 2D world with Mahalanobis association:
    landmarks promoted after 3 sightings, trajectory tracks the truth."""
    model = models.get("Linear2D")
    cfg = linear2d_cfg()
    nav = ISAM2Navigator(model, cfg, np.zeros(2), max_poses=40,
                         max_landmarks=16, meas_per_frame=8)

    rng = np.random.default_rng(5)
    true_lms = np.array([[1.0, 1.2, 0], [2.2, -0.8, 0], [3.0, 1.0, 0]])
    pose = np.zeros(2)
    meas_std = np.sqrt(np.diag(cfg.measurement_covariance))

    for t in range(25):
        odo = np.array([0.15, 0.02])
        pose = pose + odo
        noisy_odo = odo + rng.normal(size=2) * 0.01
        nav.predict(noisy_odo)
        zs = []
        for lm in true_lms:
            z = lm[:2] - pose + rng.normal(size=2) * meas_std
            if np.all(np.abs(z) < 2.0):
                zs.append(z)
        nav.slam_update(zs)

    est_lms, covs = nav.map_estimate
    assert len(est_lms) == 3, len(est_lms)
    for lm in true_lms:
        d = np.min(np.linalg.norm(est_lms - lm, axis=1))
        assert d < 0.05, (lm, est_lms)
    # final pose close to truth
    np.testing.assert_allclose(nav.pose, pose, atol=0.05)
    # candidate bookkeeping: no stale candidates for tracked landmarks
    assert nav.next_label == 3


def test_isam2_marginals_shapes():
    model = models.get("Linear2D")
    cfg = linear2d_cfg()
    nav = ISAM2Navigator(model, cfg, np.zeros(2), max_poses=10,
                         max_landmarks=8, meas_per_frame=4)
    nav.predict(np.array([0.1, 0.0]))
    nav.slam_update([np.array([0.5, 0.5])] * 1)
    nav.predict(np.array([0.1, 0.0]))
    nav.slam_update([np.array([0.4, 0.5])] * 1)
    nav.predict(np.array([0.1, 0.0]))
    labels = nav.slam_update([np.array([0.3, 0.5])] * 1)
    assert labels[0] >= 0  # promoted on the third sighting
    assert nav.pl_cov.shape == (8, 2, 2)
    # projected covariance must be SPD and at least the measurement noise
    w = np.linalg.eigvalsh(nav.pl_cov[0])
    assert np.all(w >= 5e-4 * 0.99)
