"""Fully-jitted iSAM2-equivalent replay: the graph backend as one lax.scan.

TPU-native counterpart of the reference's gtsam bridge driven headlessly
(isam2.cpp:199-246 — per frame: add a BetweenFactor for the odometry delta
plus one PixelRangeFactor per labeled measurement, `isam.update`,
`calculateEstimate`). Data association is known-label (the reference's
chap4 known-DA configuration, mono-rfs/plots/scripts/chap4/known.cfg and
ISAM2Navigator DataAssociationAlgorithm.Perfect), which removes the one
host-interactive stage (the Hungarian gate) so the whole
vehicle-simulation + graph-SLAM loop compiles into a single device program
with zero host round-trips — the same design as the PHD scan runner
(bench_core.py). The Mahalanobis-gated interactive frontend remains in
slam/isam2nav.py.

Per frame the step appends the new pose (dead-reckoned init, the bridge's
`predict`), writes the frame's measurement factors at a fixed stride
(frame t owns factor slots [(t-1)*M, t*M)), back-projects first sightings
into landmark inits (isam2.cpp:182-189), and re-runs `gn_iters`
warm-started Gauss-Newton iterations over the full fixed-capacity graph
(slam/graph.py: Schur complement on the landmark block, Jacobi-
preconditioned float32 Cholesky). The warm start makes one iteration per
frame sufficient in the steady state — the batch-GN analogue of the
Bayes-tree's incremental relinearization.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..sim import vehicle as vehicle_mod
from ..sim.simulation import model_for_config
from . import graph


class ISAM2ScanCarry(NamedTuple):
    vstate: vehicle_mod.VehicleState
    gstate: graph.GraphState
    est_pose: jax.Array  # current pose estimate (dead-reckoning carrier)
    key: jax.Array


def build_isam2_scan_runner(cfg, world, frames, gn_iters=1, dtype=jnp.float32,
                            max_clutter=8):
    """Return (runner, init_carry, model). runner(carry, commands) scans the
    vehicle + graph-SLAM frame pipeline; outputs per frame
    (true_pose, estimated_pose)."""
    model = model_for_config(cfg, world)
    lmax = max(len(world.landmarks), 1)
    from .isam2_scan_da import _check_clutter_capacity

    _check_clutter_capacity(cfg, model, max_clutter)
    m = lmax + max_clutter
    t_cap = frames + 1
    gcfg = graph.GraphConfig(
        max_poses=t_cap, max_landmarks=lmax, max_factors=frames * m,
        gn_iters=gn_iters,
    )

    vparams = vehicle_mod.VehicleParams(
        motion_cov=jnp.asarray(cfg.motion_covariance, dtype),
        meas_cov=jnp.asarray(cfg.measurement_covariance, dtype),
        pd=jnp.asarray(cfg.detection_probability, dtype),
        clutter_count=jnp.asarray(
            cfg.clutter_density * float(model.volume(model.params)), dtype
        ),
        visibility_ramp=jnp.asarray(cfg.visibility_ramp, dtype),
        dt=jnp.asarray(cfg.measure_elapsed, dtype),
        perfect_still=jnp.asarray(cfg.perfect_still, bool),
    )
    # diagonal noise like the reference bridge (ISAM2Navigator.cs:140-150)
    dt_s = cfg.measure_elapsed
    motion_sigma = dt_s * np.sqrt(np.diag(cfg.motion_covariance))
    motion_info = jnp.asarray(np.diag(1.0 / motion_sigma**2), dtype)
    meas_info = jnp.asarray(
        np.diag(1.0 / np.diag(cfg.measurement_covariance)), dtype
    )

    lm = np.zeros((lmax, 3), dtype)
    lm[: len(world.landmarks)] = world.landmarks
    lmask = np.arange(lmax) < len(world.landmarks)
    vstate = vehicle_mod.VehicleState(
        pose=jnp.asarray(world.pose, dtype),
        landmarks=jnp.asarray(lm),
        landmark_mask=jnp.asarray(lmask),
    )
    gstate = graph.empty_state(model, gcfg, world.pose, dtype)

    def frame(carry: ISAM2ScanCarry, command):
        key, kupd, kmeas = jax.random.split(carry.key, 3)
        vstate, noisy = vehicle_mod.update(
            model, vparams, carry.vstate, command, kupd
        )
        z, mask, labels, _, _ = vehicle_mod.measure(
            model, vparams, vstate, kmeas, max_clutter
        )

        st = carry.gstate
        t = st.n_poses  # index of the pose this frame appends
        pred = model.pose.add_odometry(carry.est_pose, noisy)

        # landmark first-sighting inits: back-project z through the
        # dead-reckoned pose (isam2.cpp:182-189). Known labels are unique
        # per frame, so a masked scatter-add is exact.
        upd = mask & (labels >= 0)
        safe = jnp.clip(labels, 0, lmax - 1)
        backproj = model.to_map(model.params, pred[None, :], z)  # [M, 3]
        is_new = upd & ~st.lm_mask[safe]
        landmarks = st.landmarks.at[safe].add(
            jnp.where(is_new[:, None], backproj - st.landmarks[safe], 0.0)
        )
        lm_mask = st.lm_mask.at[safe].max(upd)

        base = (t - 1) * m
        dus = jax.lax.dynamic_update_slice
        st = st._replace(
            poses=st.poses.at[t].set(pred),
            n_poses=t + 1,
            landmarks=landmarks,
            lm_mask=lm_mask,
            between=st.between.at[t].set(noisy),
            between_mask=st.between_mask.at[t].set(True),
            f_pose=dus(st.f_pose, jnp.full((m,), t, jnp.int32), (base,)),
            f_lm=dus(st.f_lm, safe.astype(jnp.int32), (base,)),
            f_z=dus(st.f_z, z.astype(st.f_z.dtype),
                    (base, jnp.zeros((), base.dtype))),
            f_mask=dus(st.f_mask, upd, (base,)),
        )
        st = graph.gauss_newton(model, gcfg, st, motion_info, meas_info)
        est = st.poses[t]
        return ISAM2ScanCarry(vstate, st, est, key), (vstate.pose, est)

    @jax.jit
    def runner(carry, commands):
        return jax.lax.scan(frame, carry, commands)

    init = ISAM2ScanCarry(
        vstate, gstate, jnp.asarray(world.pose, dtype), jax.random.PRNGKey(0)
    )
    return runner, init, model
