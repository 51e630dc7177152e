"""Loopy-PHD smoother on the 3D pixel-range model (BASELINE configs[2]:
3D sim + smoother pass). The 2D tests validate the message algebra; this
checks the full pipeline generalizes to Pose3D tangent spaces: quaternion
manifold transport in relinearize, FitToMeasurement seeding, autodiff
Hessian covariances (LoopyPHDNavigator.cs semantics on the PRM3D family)."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end runs; deselect with -m "not slow"

import numpy as np
import jax

from monorfs_tpu import models
from monorfs_tpu.config import Config
from monorfs_tpu.slam import loopy
from monorfs_tpu.slam.loopynav import LoopyPHDNavigator


def make_problem3d(frames=24, seed=11):
    """Camera translating along +x past a wall of landmarks, small noisy
    odometry; dead-reckoned init."""
    model = models.get("PRM3D")
    cfg = Config()  # PRM3D defaults
    cfg.motion_covariance = np.diag([4e-4] * 3 + [1e-4] * 3) / \
        cfg.measure_elapsed ** 2  # per-link std 2 cm / 1 deg-ish
    rng = np.random.default_rng(seed)

    # landmarks in front of the camera path (camera looks along +z)
    lms = np.column_stack([
        rng.uniform(-0.5, 2.0, 14),
        rng.uniform(-0.6, 0.6, 14),
        rng.uniform(0.8, 1.6, 14),
    ])

    dt_step = np.array([0.06, 0, 0, 0, 0, 0.0])
    link_std = np.concatenate([np.full(3, 0.02), np.full(3, 0.01)])

    identity = np.array([0, 0, 0, 1, 0, 0, 0.0])
    truth = [identity]
    readings = [np.zeros(6)]
    add_odo = model.pose.add_odometry
    for t in range(1, frames):
        truth.append(np.asarray(add_odo(truth[-1], dt_step)))
        readings.append(dt_step + rng.normal(size=6) * link_std)

    meas_std = 1.0
    measurements = []
    measure = model.measure
    visible = model.visible
    for t in range(frames):
        zs = []
        for lm in lms:
            z = np.asarray(measure(model.params, truth[t], lm))
            if bool(visible(model.params, z)) and rng.random() < 0.95:
                zn = z + rng.normal(size=3) * [meas_std, meas_std, 0.01]
                zs.append(zn)
        measurements.append(zs)

    # init: truth + per-node white tangent noise. The smoother's information
    # source is frame-to-frame map consistency, so it corrects uncorrelated
    # (high-frequency) pose error; a smooth dead-reckoning drift is absorbed
    # into the map it builds (adjacent frames share the drift) and is
    # near-unidentifiable offline -- the same regime split as the reference
    # (LoopyPHDNavigator inits come from a PHD run, not raw dead reckoning).
    add = jax.jit(jax.vmap(model.pose.add))
    jitter = np.column_stack([
        rng.normal(size=(frames, 3)) * 0.08,
        rng.normal(size=(frames, 3)) * 0.02,
    ])
    jitter[0] = 0.0  # t=0 is Dirac-anchored
    est = np.asarray(add(np.array(truth), jitter))
    return model, cfg, np.array(truth), readings, measurements, est


def test_smoother_improves_3d_jittered_init():
    model, cfg, truth, readings, measurements, est = make_problem3d()
    cfg.measurement_covariance = np.diag([1.0, 1.0, 1e-4])
    cfg.visibility_ramp = np.array([8.0, 8.0, 0.1])
    nav = LoopyPHDNavigator(
        model, cfg, est, readings, measurements, max_meas=16,
        dtype=np.float64,
        loopy_cfg=loopy.LoopyConfig(
            max_nodes=len(est), max_meas=16, mix_cap=4, blocks=4,
            ga_iters=6, jmap_cap=16, beam_width=16,
        ),
        link_cov=np.diag(
            np.concatenate([np.full(3, 0.02**2), np.full(3, 0.01**2)])
        ),
    )

    def ate(traj):
        d = traj[:, :3] - truth[:, :3]
        return np.sqrt(np.mean(np.sum(d * d, axis=1)))

    err0 = ate(est)
    for _ in range(6):
        nav.sweep()
    smoothed = nav.trajectory
    err = ate(smoothed)
    assert np.isfinite(smoothed).all()
    # quaternions stay normalized through the manifold transport
    qn = np.linalg.norm(smoothed[:, 3:7], axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-6)
    assert err < err0 * 0.8, (err, err0)
