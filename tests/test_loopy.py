"""Loopy-PHD smoother tests (mirrors LoopyPHDNavigatorTest oracle style plus
an end-to-end improvement check in the Linear2D world)."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end runs; deselect with -m "not slow"

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu import models
from monorfs_tpu.config import Config
from monorfs_tpu.slam import loopy
from monorfs_tpu.slam.loopynav import LoopyPHDNavigator


def linear2d_cfg():
    cfg = Config()
    cfg.set_linear2d_defaults()
    # per-link odometry noise consistent with the readings in make_problem
    cfg.motion_covariance = np.diag([0.05**2, 0.05**2])
    cfg.measurement_covariance = np.diag([5e-4, 5e-4])
    cfg.visibility_ramp = 3 * np.sqrt(np.diag(cfg.measurement_covariance))
    # chap5 2D experiments run with MergeThreshold 3 (default2d.cfg), not the
    # PRM3D default 0.3 -- without it, PHD duplicate components never merge
    cfg.merge_threshold = 3.0
    cfg.min_weight = 0.01
    return cfg


def test_fuse_unfuse_roundtrip():
    rng = np.random.default_rng(2)
    a_m = jnp.asarray(rng.normal(size=2))
    a_c = jnp.asarray(np.diag([0.5, 0.8]))
    b_m = jnp.asarray(rng.normal(size=2))
    b_c = jnp.asarray(np.diag([1.5, 0.7]))
    f_m, f_c = loopy._fuse(a_m, a_c, b_m, b_c)
    u_m, u_c = loopy._unfuse(f_m, f_c, b_m, b_c)
    np.testing.assert_allclose(np.asarray(u_m), np.asarray(a_m), atol=1e-9)
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(a_c), atol=1e-9)


def test_fuse_with_mixture_matches_product():
    """Fusing with a single-component mixture == the gaussian product."""
    g_m = jnp.asarray([0.5, -0.2])
    g_c = jnp.asarray(np.diag([0.3, 0.3]))
    c_m = jnp.asarray([[0.8, 0.1]])
    c_c = jnp.asarray(np.diag([0.2, 0.4]))[None]
    c_w = jnp.asarray([0.0])  # log weight 0 => weight 1
    fm, fc = loopy.fuse_with_mixture(
        g_m, g_c, jnp.asarray(loopy.DEAD), c_m, c_c, c_w
    )
    pm, pc = loopy._fuse(g_m, g_c, c_m[0], c_c[0])
    np.testing.assert_allclose(np.asarray(fm), np.asarray(pm), atol=1e-9)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(pc), atol=1e-9)


def make_problem(frames=50, seed=4):
    """Ground-truth square-ish path with noisy odometry initial estimate."""
    model = models.get("Linear2D")
    cfg = linear2d_cfg()
    rng = np.random.default_rng(seed)
    lms = rng.uniform(-1.0, 4.0, size=(12, 2))
    truth = [np.zeros(2)]
    readings = [np.zeros(2)]
    for t in range(1, frames):
        step = np.array([0.12, 0.0]) if t < frames // 2 else np.array([0.0, 0.12])
        truth.append(truth[-1] + step)
        readings.append(step + rng.normal(size=2) * 0.05)
    meas_std = np.sqrt(np.diag(cfg.measurement_covariance))
    measurements = []
    for t in range(frames):
        zs = []
        for lm in lms:
            z = lm - truth[t]
            if np.all(np.abs(z) < 2.0) and rng.random() < 0.9:
                zs.append(z + rng.normal(size=2) * meas_std)
        measurements.append(zs)
    # dead-reckoned initial estimate
    est = [np.zeros(2)]
    for t in range(1, frames):
        est.append(est[-1] + readings[t])
    return model, cfg, np.array(truth), readings, measurements, np.array(est)


def test_smoother_improves_dead_reckoning():
    model, cfg, truth, readings, measurements, est = make_problem()
    nav = LoopyPHDNavigator(
        model, cfg, est, readings, measurements, max_meas=16,
        # DEFAULT trust-region/gauge settings: per-sweep relinearization
        # re-anchors the trust region each sweep, so a dead-reckoned init
        # is walked toward the posterior mode without special-casing
        loopy_cfg=loopy.LoopyConfig(
            max_nodes=len(est), max_meas=16, mix_cap=4, blocks=4,
            ga_iters=6, jmap_cap=16, beam_width=16,
        ),
        link_cov=np.diag([0.05**2, 0.05**2]),  # the test's readings noise
    )
    err0 = np.sqrt(np.mean(np.sum((est - truth) ** 2, axis=1)))
    for _ in range(8):
        nav.sweep()
    smoothed = nav.trajectory
    err = np.sqrt(np.mean(np.sum((smoothed - truth) ** 2, axis=1)))
    assert np.isfinite(smoothed).all()
    assert err < err0 * 0.75, (err, err0)

    # the final map should land near the true landmarks (same rng as
    # make_problem)
    truth_lms = np.array(
        [[x, y, 0.0]
         for x, y in np.random.default_rng(4).uniform(-1.0, 4.0, size=(12, 2))]
    )
    comps = nav.map_model()
    means = np.array([m for w, m, c in comps if w > 0.5]).reshape(-1, 3)
    assert len(means) >= 5
    hits = sum(
        1 for m in means
        if np.min(np.linalg.norm(truth_lms - m, axis=1)) < 0.2
    )
    assert hits >= len(means) * 0.7, (hits, len(means))


def test_smoother_preserves_good_init():
    """A filter-quality initial estimate must not be substantially degraded
    (regression: early builds slid coherently away from good inits in the
    posterior's shear gauge mode, to 2-3x the init error).

    The init here is truth + WHITE jitter, which is dynamically
    inconsistent: the model objective rightly prefers the sequential
    refit's chain-consistent trajectory, whose ATE vs truth is ~1.33x the
    jittered init's (measured 0.095 vs 0.071 -- smoothing white noise
    toward dynamic consistency trades a little ATE). The guard is against
    the SLIDE regime, not against that trade: bar at 1.5x + an absolute
    cap well under the old failure's 0.2+."""
    model, cfg, truth, readings, measurements, est = make_problem()
    rng = np.random.default_rng(9)
    good = truth + rng.normal(size=truth.shape) * 0.05
    nav = LoopyPHDNavigator(
        model, cfg, good, readings, measurements, max_meas=16,
        loopy_cfg=loopy.LoopyConfig(
            max_nodes=len(good), max_meas=16, mix_cap=4, blocks=4,
            ga_iters=6, jmap_cap=16, beam_width=16,
        ),
        link_cov=np.diag([0.05**2, 0.05**2]),
    )
    err0 = np.sqrt(np.mean(np.sum((good - truth) ** 2, axis=1)))
    for _ in range(5):
        nav.sweep()
    smoothed = nav.trajectory
    err = np.sqrt(np.mean(np.sum((smoothed - truth) ** 2, axis=1)))
    assert np.isfinite(smoothed).all()
    assert err < err0 * 1.5, (err, err0)
    assert err < 0.15, err
