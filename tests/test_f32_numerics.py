"""Float32 numerics regressions for the PHD hot path.

Round-3 shipped a TPU-float32 accuracy gap (chap3-s1 at 800 particles:
OSPA 0.328 vs 0.121 for the float64-semantics runs, all of it spatial).
Two float32 defects in the step were responsible; these tests pin both:

1. WeightAlpha's map log-likelihood floored a *linear-space* density at
   1e-300 -- which is exactly 0.0 in float32 -- so any MAP-estimate point
   >~13 sigma from every mixture component produced log(0) = -inf, and
   `rest = (plog - n_pred) - (clog - n_corr)` went NaN, tripping the NaN
   guard in make_slam_step and silently skipping the WHOLE frame's weight
   update for every particle (reference semantics: PHDNavigator.cs:373-393
   computes these in C# doubles, where 1e-300 is representable).

2. The prune-merge moment match recovered covariances from raw second
   moments (cov = E[x x^T] - mean mean^T): an O(|mean|^2) cancellation
   recovering an O(sigma^2) quantity, executed for EVERY live component
   EVERY frame (each merge leader pools itself). In float32 that injects
   |mean|^2 * eps absolute noise into the covariances each frame
   (reference: Gaussian.Merge, Gaussian.cs:297-347, again C# doubles).
"""

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu import models
from monorfs_tpu.config import Config
from monorfs_tpu.gm import mixture
from monorfs_tpu.gm.mixture import DEAD
from monorfs_tpu.slam import phd

MODEL = models.get("Linear2D").with_params(
    models.get("Linear2D").params.__class__(range=6.5)
)


def _sgm_of(means, covs, ws, cap=8, dtype=jnp.float64):
    k = len(ws)
    mean = np.zeros((cap, 3))
    cov = np.tile(np.eye(3), (cap, 1, 1))
    logw = np.full(cap, DEAD)
    mean[:k] = means
    cov[:k] = covs
    logw[:k] = np.log(ws)
    gm = mixture.GM(
        jnp.asarray(mean, dtype), jnp.asarray(cov, dtype),
        jnp.asarray(logw, dtype),
    )
    return mixture.soa_of(gm)


def test_log_evaluate_matches_linear_space_f64():
    sgm = _sgm_of(
        [[0.0, 0, 0], [2.0, 1, 0]],
        [np.eye(3) * 0.3, np.eye(3) * 0.5],
        [0.8, 1.4],
    )
    pts = [jnp.asarray([0.5, 1.7, -2.0]), jnp.asarray([0.1, 0.4, 3.0]),
           jnp.asarray([0.0, 1.0, 0.2])]
    lin = mixture.evaluate_many_soa(sgm, pts)
    lg = mixture.log_evaluate_many_soa(sgm, pts)
    np.testing.assert_allclose(np.asarray(lg), np.log(np.asarray(lin)),
                               rtol=1e-12)


def test_log_evaluate_far_point_finite_in_f32():
    """A point ~40 sigma away: linear-space density underflows to 0 in
    float32; the log-space path must stay finite and match float64."""
    for dtype in (jnp.float32, jnp.float64):
        sgm = _sgm_of([[0.0, 0, 0]], [np.eye(3) * 0.01], [1.0], dtype=dtype)
        pts = [jnp.asarray([4.0], dtype), jnp.asarray([0.0], dtype),
               jnp.asarray([0.0], dtype)]
        lg = np.asarray(mixture.log_evaluate_many_soa(sgm, pts))
        # log N([4,0,0]; 0, 0.01 I) = logmult - 0.5 * 1600
        assert np.isfinite(lg).all()
        if dtype == jnp.float64:
            want = lg
    np.testing.assert_allclose(lg, want, rtol=1e-4)
    # and the linear-space twin really does underflow in f32 (the trap)
    sgm32 = _sgm_of([[0.0, 0, 0]], [np.eye(3) * 0.01], [1.0],
                    dtype=jnp.float32)
    pts32 = [jnp.asarray([4.0], jnp.float32), jnp.asarray([0.0], jnp.float32),
             jnp.asarray([0.0], jnp.float32)]
    assert float(mixture.evaluate_many_soa(sgm32, pts32)[0]) == 0.0


def _run_correct_prune(dtype, offset):
    """Two mergeable tight components far from the origin, no measurements:
    the surviving (misdetection-only) merged covariance exposes the
    second-moment cancellation."""
    cfgc = Config()
    cfgc.set_linear2d_defaults()
    params = cfgc.phd_params(np.float64)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    cfg = phd.PHDConfig(num_particles=1, max_components=8,
                        max_measurements=4, estimate_cap=8)
    sig2 = 1e-4
    sgm = _sgm_of(
        [[offset, offset, 0.0], [offset + 0.005, offset, 0.0]],
        [np.eye(3) * sig2, np.eye(3) * sig2],
        [0.9, 0.6],
        dtype=dtype,
    )
    pose = jnp.asarray([0.0, 0.0], dtype)
    z = jnp.zeros((4, 2), dtype)
    zmask = jnp.zeros((4,), bool)
    zl = [z[:, i] for i in range(2)]
    to_map_s = MODEL.to_map_soa_fn()
    fns = (
        MODEL.measure_soa_fn(),
        MODEL.jac_landmark_soa_fn(),
        to_map_s,
        MODEL.fuzzy_visible_soa_fn(params.depth_map),
    )
    out = phd._correct_prune_soa(MODEL, cfg, params, fns, pose, sgm, zl,
                                 zmask)
    alive = np.asarray(out.logw) > mixture.ALIVE_THRESHOLD
    gm = mixture.aos_of(out)
    return np.asarray(gm.cov)[alive], np.asarray(gm.mean)[alive]


def test_merge_covariance_no_f32_cancellation():
    cov64, mean64 = _run_correct_prune(jnp.float64, offset=200.0)
    cov32, mean32 = _run_correct_prune(jnp.float32, offset=200.0)
    assert cov64.shape == cov32.shape and len(cov64) >= 1
    # order by mean to align survivors
    o64 = np.argsort(mean64[:, 0])
    o32 = np.argsort(mean32[:, 0])
    np.testing.assert_allclose(mean32[o32], mean64[o64], rtol=1e-5)
    # pre-fix: |mean|^2 * eps_f32 ~ 4.8e-3 absolute noise on 1e-4
    # covariances (a ~5000% relative error); post-fix both dtypes agree
    np.testing.assert_allclose(cov32[o32], cov64[o64], rtol=5e-3)


def test_slam_step_f32_matches_f64_short_run():
    """A short 3D-sim SLAM run must produce comparable particle-weight
    streams in float32 and float64 (no NaN-guard frame skips)."""
    from monorfs_tpu.io import World, parse_commands
    from monorfs_tpu.sim import Simulation

    root = __import__("pathlib").Path(__file__).parent.parent
    world = World.from_file(str(root / "assets" / "sim3d.world"))
    cmds = parse_commands(open(root / "assets" / "mov3d.in").read())[:25]
    cfgc = Config.from_file(
        str(root / "experiments" / "configs" / "chap3-default.cfg")
    )
    ates = {}
    for dtype in (np.float32, np.float64):
        sim = Simulation(cfgc, world, cmds, algorithm="phd", particles=30,
                         dtype=dtype, seed=3)
        sim.run()
        est = np.asarray(
            [p for _, p in sim.estimate_history()[-1][1]], np.float64
        )
        true = np.asarray([p for _, p in sim.waypoints], np.float64)
        ates[np.dtype(dtype).name] = float(
            np.sqrt(np.mean(np.sum((est[:, :3] - true[:, :3]) ** 2, -1)))
        )
    assert ates["float32"] < 3.0 * ates["float64"] + 0.02, ates
