"""Fully-jitted Mahalanobis-DA graph SLAM: frontend + backend in one scan.

The reference's actual iSAM2 workload is per-frame data association plus an
incremental solve, host-interactive (isam2.cpp:199-246 and
ISAM2Navigator.FindLabels, ISAM2Navigator.cs:256-441). The round-3 jitted
scan (isam2_scan.py) covered only the known-label configuration; this
module compiles the WHOLE Mahalanobis pipeline -- gated log-profit matrix
in the projected J Sigma J^T + R metric, linear assignment, candidate
lifecycle with promotion/culling and the penumbra cover discipline, factor
writes, warm-started Gauss-Newton, and amortized marginal refresh -- into
one `lax.scan` over frames with zero host round-trips.

Design deltas vs the host navigator (slam/isam2nav.py), semantics kept:

  * the Hungarian becomes the epsilon-scaled auction (slam/assignment.py),
    profit-optimal to S*eps (the reference resolves ties arbitrarily too);
  * the candidate list becomes fixed-capacity masked arrays (count 0 =
    dead slot) with cumsum-ranked slot allocation for seeds/promotions;
  * the bucketed host re-solve becomes a fixed-capacity warm-started GN
    iteration per frame, +1 extra iteration on new-landmark frames
    (lax.cond), exactly like the known-DA scan;
  * marginals (the Mahalanobis gate covariances, isam2.cpp:258-312)
    refresh under lax.cond every `marginals_every` frames and on every
    new-landmark frame -- the same amortization schedule as the host
    navigator, but branch-free for the compiler and latency-free for the
    chip.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..sim import vehicle as vehicle_mod
from ..sim.simulation import model_for_config
from . import assignment, graph

CLUTTER = -9999


class DAState(NamedTuple):
    pl_cov: jax.Array  # [L_cap, D, D] gate covariances (J Sigma J^T + R)
    cand_mean: jax.Array  # [C, 3]
    cand_count: jax.Array  # [C] int32, 0 = dead slot
    next_label: jax.Array  # int32


class ScanDACarry(NamedTuple):
    vstate: vehicle_mod.VehicleState
    gstate: graph.GraphState
    da: DAState
    est_pose: jax.Array
    frame: jax.Array  # int32 frame counter (marginals cadence)
    key: jax.Array


def build_mahalanobis_scan(cfg, world, frames, dtype=jnp.float32,
                           max_clutter=8, max_landmarks=None, cand_cap=16,
                           marginals_every=4, eps=0.05, seed=0,
                           map_cover_radius=0.0):
    # eps=0.05 (re-measured after the round-5 auction-livelock fix; the
    # earlier eps=0.2 tuning was measured AGAINST the livelocked auction,
    # whose price wars distorted real assignments). Post-fix, eps no
    # longer moves fps (~60-62 at every eps; phases converge in tens of
    # iterations) and 0.05 is the accuracy edge: default-config OSPA
    # 0.046/0.014 over seeds 0/1 vs 0.084/0.039 at eps=0.2 and
    # 0.084/0.063 at eps=0.01; the noisy config is assignment-noise
    # limited and statistically ties (means 0.167 vs 0.151).
    # marginals_every=4 stays (OSPA doubles on the clean config without
    # it).
    """Return (runner, init_carry, model). runner(carry, commands) scans the
    vehicle + Mahalanobis-DA graph-SLAM pipeline; per-frame outputs
    (true_pose, estimated_pose, n_landmarks)."""
    model = model_for_config(cfg, world)
    lmax = max(len(world.landmarks), 1)
    _check_clutter_capacity(cfg, model, max_clutter)
    m = lmax + max_clutter
    l_cap = max_landmarks or _next_mult(2 * lmax, 8)
    t_cap = frames + 1
    gcfg = graph.GraphConfig(
        max_poses=t_cap, max_landmarks=l_cap, max_factors=frames * m,
        gn_iters=1,
    )
    d = model.meas_dim

    thr2 = float(cfg.match_threshold) ** 2
    cover_thr2 = float(3.5 * cfg.match_threshold) ** 2
    log_pd = float(np.log(cfg.detection_probability))
    log_clutter = float(np.log(max(cfg.navigator_clutter_density, 1e-30)))
    promote_at = int(cfg.new_landmark_threshold)

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
    dt_s = cfg.measure_elapsed
    motion_sigma = dt_s * np.sqrt(np.diag(cfg.motion_covariance))
    motion_info = jnp.asarray(np.diag(1.0 / motion_sigma**2), dtype)
    meas_info = jnp.asarray(
        np.diag(1.0 / np.diag(cfg.measurement_covariance)), dtype
    )
    meas_cov = jnp.asarray(cfg.measurement_covariance, dtype)

    lm = np.zeros((lmax, 3), dtype)
    lm[: len(world.landmarks)] = world.landmarks
    lmask = np.arange(lmax) < len(world.landmarks)
    vstate = vehicle_mod.VehicleState(
        pose=jnp.asarray(world.pose, dtype),
        landmarks=jnp.asarray(lm),
        landmark_mask=jnp.asarray(lmask),
    )
    gstate = graph.empty_state(model, gcfg, world.pose, dtype)
    visible = model.visible_fn()
    NEG = assignment.NEG

    def profit_rows(mu, covs, z, z_mask):
        """Gated log-profit of N projected sources vs M measurements in the
        given [N, D, D] covariances (ISAM2Navigator.cs:293-365)."""
        ci = jnp.linalg.inv(covs)
        sign, logdet = jnp.linalg.slogdet(covs)
        logmult = -0.5 * (d * np.log(2 * np.pi) + logdet)
        diff = z[None, :, :] - mu[:, None, :]  # [N, M, D]
        d2 = jnp.einsum("nmd,nde,nme->nm", diff, ci, diff)
        prof = log_pd + logmult[:, None] - 0.5 * d2
        return jnp.where((d2 < thr2) & z_mask[None, :], prof, NEG), d2

    def associate(da: DAState, gstate, pred, z, z_mask):
        """FindLabels (ISAM2Navigator.cs:256-441) as fixed-shape tensor ops.
        Returns (labels [M], updated DAState minus pl_cov, new_any)."""
        lms = gstate.landmarks
        lm_mask = gstate.lm_mask
        cand_alive = da.cand_count > 0
        c = da.cand_mean.shape[0]
        pred_b = pred[None, :]

        mu_l = model.measure(model.params, pred_b, lms)  # [L, D]
        vis = visible(model.params, mu_l) & lm_mask
        backproj = model.to_map(model.params, pred_b, z)  # [M, 3]
        mu_c = model.measure(model.params, pred_b, da.cand_mean)

        prof_l, d2_l = profit_rows(mu_l, da.pl_cov, z, z_mask)
        prof_l = jnp.where(vis[:, None], prof_l, NEG)
        r_b = jnp.broadcast_to(meas_cov, (c,) + meas_cov.shape)
        prof_c, _ = profit_rows(mu_c, r_b, z, z_mask)
        prof_c = jnp.where(cand_alive[:, None], prof_c, NEG)
        d2_l = jnp.where(lm_mask[:, None] & z_mask[None, :], d2_l, jnp.inf)

        # square profit matrix: rows = L sources + C candidates + M clutter,
        # cols = M measurements + (L + C) miss slots. Dead/invisible source
        # rows keep their miss column (log_pd vs NEG elsewhere), forcing the
        # same optimum trade-offs as the reference's visible-compacted
        # matrix (ISAM2Navigator.cs:293-365).
        n = l_cap + c
        s = n + m
        profit = jnp.full((s, s), NEG, dtype)
        profit = profit.at[:l_cap, :m].set(prof_l)
        profit = profit.at[l_cap:n, :m].set(prof_c)
        rows_n = jnp.arange(n)
        profit = profit.at[rows_n, m + rows_n].set(log_pd)
        rows_m = jnp.arange(m)
        # An INVALID measurement slot's clutter row gets its own column at
        # +1 (strictly above the 0 miss block) instead of NEG: that column
        # has no other finite row, so the pair is forced in any optimal
        # matching anyway, and without it the row has no acceptable seat --
        # it then fights the miss block across the ~1e4 NEG gap in
        # eps-sized bid increments, and EVERY auction phase burns the full
        # max_iters cap (measured: 4 x 400 iterations/frame ~= 8 ms, 55%
        # of the scan-da frame; with the seat, phases converge in tens of
        # iterations). The constant on a forced edge does not change the
        # optimum over the real (landmark/candidate/clutter) trade-offs.
        profit = profit.at[n + rows_m, rows_m].set(
            jnp.where(z_mask, log_clutter, 1.0)
        )
        profit = profit.at[n:, m:].set(0.0)

        col = assignment.auction_assign(profit, eps=eps)

        # invert: owner row of each measurement column (-1 = none)
        owner = jnp.full((s,), -1, jnp.int32)
        owner = owner.at[jnp.where(col >= 0, col, s)].set(
            jnp.arange(s, dtype=jnp.int32), mode="drop"
        )
        z_owner = owner[:m]  # [M]
        own_valid = (z_owner >= 0) & z_mask
        # profit sanity: an assignment into a NEG cell is a miss in disguise
        own_prof = profit[jnp.clip(z_owner, 0, s - 1), rows_m]
        own_valid &= own_prof > NEG / 2

        lm_label = jnp.where(
            own_valid & (z_owner < l_cap), z_owner, -1
        )  # [M] >= 0 where a proven landmark matched
        cand_of_z = jnp.where(
            own_valid & (z_owner >= l_cap) & (z_owner < n),
            z_owner - l_cap, -1,
        )  # [M] candidate index or -1

        matched_lm = jnp.zeros((l_cap,), bool).at[
            jnp.where(lm_label >= 0, lm_label, l_cap)
        ].set(True, mode="drop")

        # penumbra cover (see slam/isam2nav.py find_labels): a measurement
        # gated (cover radius) by a proven landmark that went UNMATCHED this
        # frame is a shadow of that landmark, not a birth. The map-space
        # radius complements the projected metric (isam2nav
        # map_cover_radius note): a mis-estimated landmark misses its own
        # detection far beyond any usable d2 gate while the detection
        # back-projects within ~0.3 m of it.
        cover_rows = lm_mask & ~matched_lm  # [L]
        dmap2 = sum(
            (backproj[None, :, i] - lms[:, None, i]) ** 2 for i in range(3)
        )  # [L, M]
        gate = (
            (d2_l < cover_thr2) | (dmap2 < map_cover_radius**2)
        ) & cover_rows[:, None]  # [L, M]
        has_cover = jnp.any(gate, axis=0)  # [M]

        # candidate lifecycle
        z_of_cand = jnp.full((c,), -1, jnp.int32).at[
            jnp.where(cand_of_z >= 0, cand_of_z, c)
        ].set(rows_m.astype(jnp.int32), mode="drop")
        cand_matched = z_of_cand >= 0
        zc = jnp.clip(z_of_cand, 0, m - 1)
        w = da.cand_count.astype(dtype)
        upd_mean = (
            da.cand_mean * w[:, None] + backproj[zc]
        ) / (w + 1.0)[:, None]
        new_count = da.cand_count + 1
        promote = cand_matched & (new_count >= promote_at)
        blocked = promote & has_cover[zc]
        promote_ok = promote & ~blocked

        # allocate labels for promotions in slot order
        rank = jnp.cumsum(promote_ok.astype(jnp.int32)) - 1
        new_label = da.next_label + rank
        can_fit = promote_ok & (new_label < l_cap)
        n_new = jnp.sum(promote_ok, dtype=jnp.int32)

        # measurement labels: landmark match, promotion label, else CLUTTER
        labels = jnp.where(lm_label >= 0, lm_label, CLUTTER)
        labels = labels.at[jnp.where(can_fit, zc, m)].set(
            jnp.where(can_fit, new_label, CLUTTER), mode="drop"
        )

        # surviving candidates: matched, below threshold (promoted and
        # cover-blocked ones are culled; unmatched are culled)
        keep = cand_matched & ~promote
        cand_mean = jnp.where(keep[:, None], upd_mean, 0.0)
        cand_count = jnp.where(keep, new_count, 0)

        # seed new candidates from unmatched, uncovered measurements
        seed_z = (labels == CLUTTER) & z_mask & ~has_cover
        free = cand_count == 0
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # [C]
        seed_rank = jnp.cumsum(seed_z.astype(jnp.int32)) - 1  # [M]
        # slot index for each seeding measurement: the (seed_rank)-th free
        # slot; one-hot matmul keeps it O(C*M) and gather-free
        slot_of_rank = jnp.full((c,), c, jnp.int32).at[
            jnp.where(free, free_rank, c)
        ].set(jnp.arange(c, dtype=jnp.int32), mode="drop")  # [rank] -> slot
        n_free = jnp.sum(free, dtype=jnp.int32)
        seat = seed_z & (seed_rank < n_free)
        slot = slot_of_rank[jnp.clip(seed_rank, 0, c - 1)]  # [M]
        tgt = jnp.where(seat, slot, c)
        cand_mean = cand_mean.at[tgt].set(backproj, mode="drop")
        cand_count = cand_count.at[tgt].set(1, mode="drop")

        da = DAState(
            pl_cov=da.pl_cov,
            cand_mean=cand_mean,
            cand_count=cand_count,
            next_label=da.next_label + n_new,
        )
        return labels, da, n_new > 0

    def frame(carry: ScanDACarry, command):
        key, kupd, kmeas = jax.random.split(carry.key, 3)
        vstate, noisy = vehicle_mod.update(
            model, vparams, carry.vstate, command, kupd
        )
        z, z_mask, _, _, _ = vehicle_mod.measure(
            model, vparams, vstate, kmeas, max_clutter
        )

        st = carry.gstate
        t = st.n_poses
        pred = model.pose.add_odometry(carry.est_pose, noisy)

        labels, da, new_any = associate(carry.da, st, pred, z, z_mask)

        # landmark first-sighting inits (isam2.cpp:182-189)
        upd = z_mask & (labels >= 0) & (labels < l_cap)
        safe = jnp.clip(labels, 0, l_cap - 1)
        backproj = model.to_map(model.params, pred[None, :], z)
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
        # new-landmark frames relinearize once more (the host navigator's
        # full re-solve, isam2nav.slam_update)
        st = jax.lax.cond(
            new_any,
            lambda s: graph.gauss_newton(
                model, gcfg, s, motion_info, meas_info
            ),
            lambda s: s,
            st,
        )

        # amortized gate-covariance refresh (isam2.cpp:258-312;
        # marginals_every cadence + every new-landmark frame)
        refresh = new_any | (carry.frame % marginals_every == 0)
        da = jax.lax.cond(
            refresh,
            lambda s: da._replace(
                pl_cov=graph.marginals(
                    model, gcfg, s, motion_info, meas_info, meas_cov
                )[1]
            ),
            lambda s: da,
            st,
        )

        est = st.poses[t]
        out = (vstate.pose, est, jnp.sum(st.lm_mask, dtype=jnp.int32))
        return (
            ScanDACarry(vstate, st, da, est, carry.frame + 1, key),
            out,
        )

    @jax.jit
    def runner(carry, commands):
        return jax.lax.scan(frame, carry, commands)

    da0 = DAState(
        pl_cov=jnp.tile(meas_cov[None], (l_cap, 1, 1)),
        cand_mean=jnp.zeros((cand_cap, 3), dtype),
        cand_count=jnp.zeros((cand_cap,), jnp.int32),
        next_label=jnp.int32(0),
    )
    init = ScanDACarry(
        vstate, gstate, da0, jnp.asarray(world.pose, dtype),
        jnp.int32(0), jax.random.PRNGKey(seed),
    )
    return runner, init, model


def _next_mult(n, k):
    return ((n + k - 1) // k) * k


def _check_clutter_capacity(cfg, model, max_clutter):
    """A mis-sized replay must fail loudly, not truncate silently: the
    vehicle caps Poisson clutter at floor(10 * lambda)
    (SimulatedVehicle.cs:269-285); a scan whose static clutter slots are
    below that cap would quietly under-sample the cluttery configs."""
    lam = float(cfg.clutter_density) * float(model.volume(model.params))
    need = int(np.floor(10.0 * lam))
    if need > max_clutter:
        raise ValueError(
            f"max_clutter={max_clutter} cannot replay this config "
            f"faithfully: clutter rate lambda={lam:.3f} caps at "
            f"floor(10*lambda)={need} per frame; raise max_clutter"
        )
