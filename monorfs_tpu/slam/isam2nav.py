"""Graph-SLAM navigator: Mahalanobis data association + batch GN backend.

TPU-native re-design of the reference's ISAM2Navigator
(reference: mono-rfs-lib/SLAM/Navigators/ISAM2Navigator.cs:47-632). The
association frontend reproduces FindLabels (:256-441): visible landmarks and
candidates build a gated log-profit matrix (Mahalanobis distances measured
in the JSJ^T + R projected covariance for proven landmarks, R for
candidates), solved by Hungarian assignment; candidates promote to real
landmarks after NewLandmarkThreshold consecutive sightings and are culled
when unseen. The backend is the batched Gauss-Newton Schur solver in
graph.py instead of the gtsam Bayes tree.

Performance layout (replacing the round-1 per-landmark host loop):

  * the association quantities (visibility, gated log-profit rows for all
    landmarks and candidates, measurement back-projections) are ONE jitted
    device computation per frame; only the tiny Hungarian assignment and the
    candidate lifecycle run on host (exactly the reference's CPU split);
  * the factor arrays live in host numpy mirrors (one bulk device transfer
    per frame instead of one per factor);
  * solves are shape-bucketed: the dense normal equations are sized to the
    next power of two of the ACTIVE pose/factor/landmark counts, so early
    frames don't pay the full-capacity O((T_cap O)^3) Cholesky
    (a handful of jit specializations over a run);
  * steady-state frames run 1 warm-started GN iteration (the previous
    estimate is the linearization point — the iSAM2 analogue of reusing the
    Bayes tree, isam2.cpp:245); every `full_solve_every` frames (and
    whenever a bucket grows) a full gn_iters re-solve relinearizes
    everything. Marginal covariances are refreshed on full solves and (for
    the Mahalanobis gate, isam2.cpp:258-312) every `marginals_every`
    frames -- the gate covariances drift slowly between landmark-set
    changes, and any new landmark forces a full solve first.
"""

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..metrics.errors import hungarian
from . import graph

CLUTTER = -9999
NEG = -1e20


def _pow2_at_least(n, lo, hi):
    c = lo
    while c < n:
        c *= 2
    return min(c, hi)


class ISAM2Navigator:
    def __init__(self, model, cfg, init_pose, max_poses=512,
                 max_landmarks=256, meas_per_frame=24, onlymapping=False,
                 dtype=np.float64, da_algorithm=None, full_solve_every=8,
                 cand_cap=128, marginals_every=4, merge_threshold=0.0,
                 cover_threshold=None, solve_dtype=np.float64,
                 dup_merge_radius=0.0, dup_min_obs=6, dup_coobs_frac=0.15,
                 map_cover_radius=0.0):
        self.model = model
        self.cfg = cfg
        # The ENTIRE host-interactive navigator (association math, graph
        # solve, marginals) runs in float64 regardless of the simulation
        # dtype, with the solve pinned to the host CPU backend: the
        # reference's FindLabels + gtsam run in C#/C++ doubles too
        # (ISAM2Navigator.cs, isam2.cpp:245), and float32 was measured to
        # corrupt this path twice over in round 4 -- an f32 batch solve of
        # the ~1800-dim reduced pose system degraded landmark estimates
        # enough to re-trigger the duplicate-promotion cascade
        # (chap4-cluttery grid row: 150 landmarks in f32 vs 43 in f64),
        # and even with an f64 solve, f32 association state kept
        # over-birthing (73 landmarks by frame 200 vs 36 all-f64). The
        # incoming `dtype` is accepted for API compatibility; the
        # TPU-native float32 path is the jitted scan (isam2_scan*.py),
        # which pins matmul precision instead.
        self.dtype = solve_dtype
        self.solve_dtype = solve_dtype
        if (
            np.dtype(solve_dtype) == np.float64
            and not jax.config.jax_enable_x64
        ):
            # without x64, jnp.asarray(..., float64) silently truncates to
            # f32 and the entire f64 discipline above evaporates (observed:
            # the chap4 grid's isam2 rows re-grew duplicate maps through
            # exactly this silent truncation). Enabling it here only
            # affects traces made after this point; already-compiled f32
            # steps (e.g. the PHD driver) keep their explicit dtypes.
            import warnings

            warnings.warn(
                "isam2nav: enabling jax x64 process-wide for the float64 "
                "graph solve; enable jax_enable_x64 at process start to "
                "avoid mid-run retraces of default-dtype code",
                RuntimeWarning, stacklevel=2)
            jax.config.update("jax_enable_x64", True)
        try:
            self._solve_device = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            self._solve_device = None
        self.onlymapping = onlymapping
        self.da_algorithm = da_algorithm or cfg.da_algorithm
        self.match_threshold = cfg.match_threshold
        self.cover_threshold = cover_threshold or 3.5 * cfg.match_threshold
        self.merge_threshold = merge_threshold
        self.new_landmark_threshold = cfg.new_landmark_threshold
        self.pd = cfg.detection_probability
        self.clutter_density = max(cfg.navigator_clutter_density, 1e-30)
        self.full_solve_every = full_solve_every
        self.marginals_every = marginals_every

        self.max_poses = max_poses
        self.max_landmarks = max_landmarks
        self.max_factors = max_poses * meas_per_frame
        self.meas_per_frame = meas_per_frame
        self.cand_cap = cand_cap

        s = model.pose.state_dim
        o = model.pose.odo_dim
        d = model.meas_dim
        self.meas_dim = d

        # host mirrors of the graph (bulk-uploaded per frame)
        dtype = self.dtype  # internal float64 (see above)
        self.poses_np = np.tile(np.asarray(init_pose, dtype), (max_poses, 1))
        self.n_poses = 1
        self.landmarks_np = np.zeros((max_landmarks, 3), dtype)
        self.lm_mask_np = np.zeros(max_landmarks, bool)
        self.between_np = np.zeros((max_poses, o), dtype)
        self.between_mask_np = np.zeros(max_poses, bool)
        self.pose_fixed_np = np.zeros(max_poses, bool)
        self.pose_fixed_np[0] = True
        self.f_pose_np = np.zeros(self.max_factors, np.int32)
        self.f_lm_np = np.zeros(self.max_factors, np.int32)
        self.f_z_np = np.zeros((self.max_factors, d), dtype)
        self.f_mask_np = np.zeros(self.max_factors, bool)
        self.n_factors = 0

        # diagonal noise like the reference bridge (ISAM2Navigator.cs:140-150)
        dt = cfg.measure_elapsed
        motion_sigma = dt * np.sqrt(np.diag(cfg.motion_covariance))
        meas_sigma = np.sqrt(np.diag(cfg.measurement_covariance))
        sd = self.solve_dtype
        self.motion_info = jnp.asarray(np.diag(1.0 / motion_sigma**2), sd)
        self.meas_info = jnp.asarray(np.diag(1.0 / meas_sigma**2), sd)
        self.meas_cov = jnp.asarray(np.diag(meas_sigma**2), sd)

        # co-observation duplicate merge: OFF by default. The idea (duplicate
        # labels of one physical landmark are never matched in the same
        # frame, true close pairs are co-detected at PD^2) is sound only
        # under reliable association -- measured on chap4-noisy, label
        # flipping between true neighbors suppresses their recorded
        # co-occurrence and the merge then fuses TRUE pairs, blowing the
        # graph up (ATE 0.12 -> 0.94). Duplication is suppressed at the
        # source instead (map_cover_radius below).
        self.dup_merge_radius = dup_merge_radius
        # map-space cover: OFF by default. A measurement whose
        # back-projection is within map_cover_radius of an UNMATCHED proven
        # landmark cannot seed or promote a candidate -- the map-space twin
        # of the projected-metric penumbra, aimed at degraded-config
        # duplicates that land 0.04-0.37 m from their source landmark at
        # d2 130-2400 (beyond any usable gate radius). Measured on the
        # chap4 grids (tools/isam2_lab.py, round 4): at radius 0.3 it
        # suppresses TRUE landmarks in this 0.17 m-median-spacing world
        # faster than duplicates (default config 43 -> 29 mapped landmarks,
        # OSPA 0.101 -> 0.299; noisy ATE 0.12 -> 0.26) -- the float64
        # pinning above is what actually fixes the degraded configs
        # (cluttery 150 -> 43 landmarks). Kept as an opt-in for sparse
        # worlds (spacing >> radius), where its assumptions hold.
        self.map_cover_radius = map_cover_radius
        self.dup_min_obs = dup_min_obs
        self.dup_coobs_frac = dup_coobs_frac
        self.obs_count = np.zeros(max_landmarks, np.int64)
        self.coobs = np.zeros((max_landmarks, max_landmarks), np.int32)

        self._solvers = {}
        self._marginal_fns = {}
        self._assoc_fn = None
        self._last_full_solve = -1
        self._last_marginals = -10**9

        self.pose = np.asarray(init_pose, dtype)
        self.lm_cov = np.zeros((max_landmarks, 3, 3))
        self.pl_cov = np.tile(np.asarray(self.meas_cov), (max_landmarks, 1, 1))
        self.next_label = 0
        # candidates: fixed-capacity arrays for the jitted association
        self.cand_mean: List[np.ndarray] = []
        self.cand_count: List[int] = []

    # ------------------------------------------------------------------

    def predict(self, odometry, true_pose=None):
        """Odometry dead-reckoning of the current estimate
        (ISAM2Navigator.cs:174-183)."""
        if self.onlymapping and true_pose is not None:
            self.pose = np.asarray(true_pose, self.dtype)
        else:
            with self._on_solve_device():
                self.pose = np.asarray(
                    self.model.pose.add_odometry(
                        jnp.asarray(self.pose),
                        jnp.asarray(odometry, self.dtype),
                    )
                )

    # ------------------------------------------------------------------

    def _build_assoc(self):
        """One jitted computation of every per-frame association quantity
        (replaces the round-1 per-landmark host loop): landmark visibility,
        gated log-profit rows vs all measurements for landmarks and
        candidates, and measurement back-projections."""
        model = self.model
        mahalanobis = self.da_algorithm == "Mahalanobis"
        log_pd = np.log(self.pd)
        thr2 = float(self.match_threshold) ** 2
        d = self.meas_dim

        def profit_rows(means, covs, targets, t_mask):
            """Gated log-profit of N (mean, cov) sources vs M targets.
            Also returns the raw squared Mahalanobis distances (ungated)."""
            ci = jnp.linalg.inv(covs)
            sign, logdet = jnp.linalg.slogdet(covs)
            logmult = -0.5 * (d * np.log(2 * np.pi) + logdet)  # [N]
            diff = targets[None, :, :] - means[:, None, :]  # [N, M, D]
            d2 = jnp.einsum("nmd,nde,nme->nm", diff, ci, diff)
            prof = log_pd + logmult[:, None] - 0.5 * d2
            return jnp.where((d2 < thr2) & t_mask[None, :], prof, NEG), d2

        visible = model.visible_fn()  # frustum visibility (depth-occlusion
        # models gate association without the live depth map; the map factor
        # update itself still uses the occlusion-aware fuzzy visibility)

        def assoc(pose, lms, lm_mask, pl_cov, cand, cand_mask, z, z_mask):
            pose_b = pose[None, :]
            mu_l = model.measure(model.params, pose_b, lms)  # [L, D]
            vis = jax.vmap(
                lambda m: visible(model.params, m)
            )(mu_l) & lm_mask
            backproj = model.to_map(model.params, pose_b, z)  # [M, 3]
            mu_c = model.measure(model.params, pose_b, cand)  # [C, D]
            r = self.meas_cov
            if mahalanobis:
                prof_l, d2_l = profit_rows(mu_l, pl_cov, z, z_mask)
                prof_c, _ = profit_rows(
                    mu_c, jnp.broadcast_to(r, (cand.shape[0],) + r.shape),
                    z, z_mask,
                )
            else:  # NN: distances in map space, tiny fixed covariance
                nn_cov = 0.001 * jnp.eye(3, dtype=lms.dtype)
                prof_l, d2_l = profit_rows(
                    lms, jnp.broadcast_to(nn_cov, (lms.shape[0], 3, 3)),
                    backproj, z_mask,
                )
                prof_c, _ = profit_rows(
                    cand, jnp.broadcast_to(nn_cov, (cand.shape[0], 3, 3)),
                    backproj, z_mask,
                )
            prof_l = jnp.where(vis[:, None], prof_l, NEG)
            prof_c = jnp.where(cand_mask[:, None], prof_c, NEG)
            live = lm_mask[:, None] & z_mask[None, :]
            d2_l = jnp.where(live, d2_l, jnp.inf)
            return vis, prof_l, prof_c, backproj, d2_l

        return jax.jit(assoc)

    def find_labels(self, measurements, true_labels=None):
        """FindLabels (ISAM2Navigator.cs:256-441). Returns one label per
        measurement: >=0 real landmark, <0 candidate, CLUTTER unmatched."""
        if self.da_algorithm == "Perfect":
            if true_labels is None:
                raise RuntimeError(
                    "Tried to use perfect data association when none exists."
                )
            return [lab if lab >= 0 else CLUTTER for lab in true_labels]

        if self._assoc_fn is None:
            self._assoc_fn = self._build_assoc()

        m = len(measurements)
        d = self.meas_dim
        z = np.zeros((self.meas_per_frame, d), self.dtype)
        z_mask = np.zeros(self.meas_per_frame, bool)
        for k, zi in enumerate(measurements[: self.meas_per_frame]):
            z[k] = np.asarray(zi)[:d]
            z_mask[k] = True

        nc = len(self.cand_mean)
        cand = np.zeros((self.cand_cap, 3), self.dtype)
        cand_mask = np.zeros(self.cand_cap, bool)
        for k, c in enumerate(self.cand_mean[: self.cand_cap]):
            cand[k] = c
            cand_mask[k] = True

        with self._on_solve_device():
            vis, prof_l, prof_c, backproj, d2_l = self._assoc_fn(
                jnp.asarray(self.pose), jnp.asarray(self.landmarks_np),
                jnp.asarray(self.lm_mask_np),
                jnp.asarray(self.pl_cov, self.dtype),
                jnp.asarray(cand), jnp.asarray(cand_mask), jnp.asarray(z),
                jnp.asarray(z_mask),
            )
        vis = np.asarray(vis)
        prof_l = np.asarray(prof_l)
        prof_c = np.asarray(prof_c)
        d2_l = np.asarray(d2_l)
        self._backproj = np.asarray(backproj)

        visible_idx = np.flatnonzero(vis)
        nv = len(visible_idx)
        n = nv + nc
        log_pd = np.log(self.pd)
        log_clutter = np.log(self.clutter_density)

        size = n + m
        profit = np.full((size, size), NEG)
        if nv:
            profit[:nv, :m] = prof_l[visible_idx][:, :m]
        if nc:
            profit[nv:n, :m] = prof_c[:nc, :m]
        profit[np.arange(n), m + np.arange(n)] = log_pd
        profit[n + np.arange(m), np.arange(m)] = log_clutter
        profit[n:, m:] = 0.0  # misdetection x clutter quadrant

        assignment = hungarian(-profit)

        labels = [CLUTTER] * m
        keep = [False] * nc
        # measurements within the gate of SOME visible proven landmark: these
        # already had their chance in the assignment; when they lose it (the
        # landmark matched another measurement, or a candidate out-bid it
        # because its R-metric profit peaks higher than the landmark's wider
        # J Sigma J^T + R metric), seeding or promoting a candidate from them
        # mints a near-exact duplicate of the proven landmark. Measured on
        # chap4-default: 67 of 70 promotions landed within 0.5 (most within
        # 0.05) of an existing landmark before this discipline (the reference
        # avoids runaway duplication only statistically,
        # ISAM2Navigator.cs:384-436).
        # the cover test: a measurement is "covered" (treated as the shadow
        # of a proven landmark, not a birth) when some visible landmark is
        # gated for it (pl_cov metric) AND that landmark went UNMATCHED in
        # this frame's assignment. This is the exact signature of the steal
        # cycle (a tight-R candidate out-bids the landmark's wider
        # J Sigma J^T + R profit, leaving the landmark missed while its own
        # measurement feeds a duplicate candidate). Requiring "unmatched"
        # keeps legitimate births alive while the pose is uncertain: in the
        # kinect bootstrap every z is inside every landmark's inflated gate,
        # but those landmarks match their own measurements, so new corners
        # still seed candidates.
        # the cover gate is WIDER than the match gate: measured on
        # chap4-default, genuine new landmarks promote at d2 > 200 in the
        # J Sigma J^T + R metric while duplicate births cluster at d2 10-60
        # -- just outside the match gate (thr^2 = 9), where the amortized
        # marginals' staleness underestimates the innovation covariance.
        # A measurement in this penumbra is treated as the shadow of the
        # existing landmark (no birth), but is NOT force-matched (a d2 ~ 50
        # association would corrupt the graph with a miscalibrated factor).
        thr2_f = float(self.cover_threshold) ** 2
        matched_lms = {
            int(visible_idx[i]) for i in range(nv) if assignment[i] < m
        }
        # cover rows: proven landmarks that could explain a measurement but
        # did not claim one in this frame's assignment. Two cases:
        #   * visible + unmatched: the steal cycle (a tight-R candidate
        #     out-bid the landmark's wider J Sigma J^T + R profit);
        #   * INVISIBLE under the frustum test on the estimated geometry:
        #     a landmark at the frustum edge flickers out of the visible set
        #     while its physical detection (generated under the TRUE
        #     geometry + fuzzy ramp) is still in Z -- without cover each
        #     flicker births a near-exact duplicate ~0.02 away (measured:
        #     the dominant source, 112 of 115 duplicate promotions).
        # Visible landmarks matched to ANOTHER measurement do NOT cover:
        # two nearby true landmarks must both stay mappable.
        cover_rows = [
            j for j in np.flatnonzero(self.lm_mask_np[: d2_l.shape[0]])
            if j not in matched_lms
        ]
        if cover_rows:
            gate_rows = d2_l[cover_rows][:, :m] < thr2_f
            # map-space cover: back-projection near an unmatched proven
            # landmark (see __init__ map_cover_radius note)
            dmap = np.linalg.norm(
                self._backproj[None, :m, :]
                - self.landmarks_np[cover_rows][:, None, :],
                axis=-1,
            )
            has_cover = (gate_rows | (dmap < self.map_cover_radius)).any(axis=0)
        else:
            has_cover = np.zeros(m, bool)
        for i in range(nv):
            if assignment[i] < m:
                labels[assignment[i]] = int(visible_idx[i])
        for i in range(nv, n):
            if assignment[i] < m:
                k = i - nv
                zi = assignment[i]
                labels[zi] = -k - 1
                w = self.cand_count[k]
                self.cand_mean[k] = (
                    self.cand_mean[k] * w + self._backproj[zi]
                ) / (w + 1)
                self.cand_count[k] = w + 1
                if self.cand_count[k] >= self.new_landmark_threshold:
                    if has_cover[zi]:
                        # promotion would duplicate a proven landmark: cull
                        # the candidate without promoting (the measurement
                        # stream re-associates with the landmark once the
                        # thief candidate is gone)
                        labels[zi] = CLUTTER
                    else:
                        self._debug_promotion(zi, d2_l, vis, matched_lms)
                        labels[zi] = self.next_label
                        self.next_label += 1
                else:
                    keep[k] = True
        for i in range(m):
            if labels[i] == CLUTTER:
                if has_cover[i]:
                    continue  # shadowed by a proven landmark: not a birth
                if self.new_landmark_threshold <= 1:
                    labels[i] = self.next_label
                    self.next_label += 1
                elif len(self.cand_mean) < self.cand_cap:
                    self.cand_mean.append(self._backproj[i].copy())
                    self.cand_count.append(1)
                    keep.append(True)
        self.cand_mean = [c for c, k in zip(self.cand_mean, keep) if k]
        self.cand_count = [c for c, k in zip(self.cand_count, keep) if k]
        return labels

    def _debug_promotion(self, zi, d2_l, vis, matched_lms):
        """Record a promotion event for diagnosis (tools/isam2_lab.py).
        Enabled by setting `self.debug_promotions = []`."""
        events = getattr(self, "debug_promotions", None)
        if events is None:
            return
        live = np.flatnonzero(self.lm_mask_np)
        info = {"z": int(zi), "label": int(self.next_label)}
        if len(live):
            dists = np.linalg.norm(
                self.landmarks_np[live] - self._backproj[zi], axis=1
            )
            jn = int(live[np.argmin(dists)])
            info.update(
                nearest=jn, dist=float(dists.min()),
                nearest_visible=bool(vis[jn]),
                nearest_matched=jn in matched_lms,
                nearest_d2=float(d2_l[jn, zi]),
            )
        events.append(info)

    # ------------------------------------------------------------------

    def _bucket_state(self):
        """Slice the host mirrors to power-of-two active capacities and
        build the solve-device GraphState (solve_dtype, CPU backend by
        default -- see __init__) + its bucket GraphConfig."""
        t_cap = _pow2_at_least(self.n_poses + 1, 8, self.max_poses)
        f_cap = _pow2_at_least(self.n_factors + 1, 32, self.max_factors)
        l_cap = _pow2_at_least(max(self.next_label, 1), 8, self.max_landmarks)
        cfg = graph.GraphConfig(
            max_poses=t_cap, max_landmarks=l_cap, max_factors=f_cap,
        )
        sd = self.solve_dtype
        with self._on_solve_device():
            st = graph.GraphState(
                poses=jnp.asarray(self.poses_np[:t_cap], sd),
                n_poses=jnp.int32(self.n_poses),
                landmarks=jnp.asarray(self.landmarks_np[:l_cap], sd),
                lm_mask=jnp.asarray(self.lm_mask_np[:l_cap]),
                between=jnp.asarray(self.between_np[:t_cap], sd),
                between_mask=jnp.asarray(self.between_mask_np[:t_cap]),
                pose_fixed=jnp.asarray(self.pose_fixed_np[:t_cap]),
                f_pose=jnp.asarray(self.f_pose_np[:f_cap]),
                f_lm=jnp.asarray(self.f_lm_np[:f_cap]),
                f_z=jnp.asarray(self.f_z_np[:f_cap], sd),
                f_mask=jnp.asarray(self.f_mask_np[:f_cap]),
            )
        return cfg, st, (t_cap, f_cap, l_cap)

    def _on_solve_device(self):
        import contextlib

        if self._solve_device is None:
            return contextlib.nullcontext()
        return jax.default_device(self._solve_device)

    def _solver_for(self, cfg, key, iters):
        k = key + (iters,)
        if k not in self._solvers:
            bcfg = dataclasses.replace(cfg, gn_iters=iters)
            self._solvers[k] = jax.jit(
                lambda st: graph.gauss_newton(
                    self.model, bcfg, st, self.motion_info, self.meas_info
                )
            )
        return self._solvers[k]

    def _marginals_for(self, cfg, key):
        if key not in self._marginal_fns:
            self._marginal_fns[key] = jax.jit(
                lambda st: graph.marginals(
                    self.model, cfg, st, self.motion_info, self.meas_info,
                    self.meas_cov,
                )
            )
        return self._marginal_fns[key]

    def slam_update(self, measurements, true_labels=None):
        """Add the frame's factors and re-solve (ISAM2Navigator.cs:192-248).

        For perfect association the true labels must map to internal ids;
        clutter (negative true labels) is dropped."""
        if self.da_algorithm == "Perfect":
            raw = self.find_labels(measurements, true_labels)
            labels = []
            if not hasattr(self, "_perfect_map"):
                self._perfect_map = {}
            for lab in raw:
                if lab == CLUTTER:
                    labels.append(CLUTTER)
                    continue
                if lab not in self._perfect_map:
                    self._perfect_map[lab] = self.next_label
                    self.next_label += 1
                labels.append(self._perfect_map[lab])
        else:
            labels = self.find_labels(measurements)

        t = self.n_poses
        if t >= self.max_poses:
            raise RuntimeError("graph pose capacity exceeded")

        prev = self.poses_np[t - 1]
        delta = np.asarray(
            self.model.pose.diff_odometry(
                jnp.asarray(self.pose), jnp.asarray(prev)
            )
        )
        self.poses_np[t] = self.pose
        self.between_np[t] = delta
        self.between_mask_np[t] = True
        if self.onlymapping:
            self.pose_fixed_np[t] = True

        new_landmark = False
        for z, lab in zip(measurements, labels):
            if lab < 0:
                continue
            if lab >= self.max_landmarks:
                # capacity reached: drop the factor (the reference would
                # abort on gtsam failure; a bounded map is the TPU-native
                # contract -- size max_landmarks to the scene)
                continue
            if not self.lm_mask_np[lab]:
                self.landmarks_np[lab] = np.asarray(
                    self.model.to_map(
                        self.model.params, jnp.asarray(self.pose),
                        jnp.asarray(np.asarray(z)[: self.meas_dim],
                                    self.dtype),
                    )
                )
                self.lm_mask_np[lab] = True
                new_landmark = True
            fi = self.n_factors
            if fi >= self.max_factors:
                continue  # factor budget exhausted; drop extra observations
            self.f_pose_np[fi] = t
            self.f_lm_np[fi] = lab
            self.f_z_np[fi] = np.asarray(z)[: self.meas_dim]
            self.f_mask_np[fi] = True
            self.n_factors += 1

        self.n_poses = t + 1
        cfg, st, key = self._bucket_state()

        full = (
            new_landmark
            or t - self._last_full_solve >= self.full_solve_every
            or getattr(self, "_last_bucket", None) != key
        )
        self._last_bucket = key
        iters = cfg.gn_iters if full else 1
        if full:
            self._last_full_solve = t
        with self._on_solve_device():
            st = self._solver_for(cfg, key, iters)(st)

        t_cap, f_cap, l_cap = key
        self.poses_np[:t_cap] = np.asarray(st.poses)
        self.landmarks_np[:l_cap] = np.asarray(st.landmarks)
        self.pose = self.poses_np[t].copy()

        # marginals: refreshed on relinearization frames and (for the
        # Mahalanobis gate) every `marginals_every` frames. The gate
        # covariances J Sigma J^T + R evolve slowly between landmark-set
        # changes -- and any new landmark forces full=True above, so a
        # just-promoted landmark never sees a stale (garbage) row. The
        # marginals pass is the steady-state cost driver (a [T*O, L*3]
        # multi-RHS solve per call, graph.py:289-341); amortizing it is the
        # batch-GN stand-in for gtsam's incremental Bayes-tree marginals.
        # observation statistics for the co-observation duplicate merge
        seen = sorted({
            lab for lab in labels
            if 0 <= lab < self.max_landmarks
        })
        if seen:
            self.obs_count[seen] += 1
            ix = np.asarray(seen)
            self.coobs[np.ix_(ix, ix)] += 1

        if full or (
            self.da_algorithm == "Mahalanobis"
            and t - self._last_marginals >= self.marginals_every
        ):
            with self._on_solve_device():
                lm_cov, pl_cov = self._marginals_for(cfg, key)(st)
            self.lm_cov[:l_cap] = np.asarray(lm_cov)
            self.pl_cov[:l_cap] = np.asarray(pl_cov)
            self._last_marginals = t
            if self._merge_duplicates():
                # relabeled factors: re-solve and refresh the gate state
                cfg, st, key = self._bucket_state()
                with self._on_solve_device():
                    st = self._solver_for(cfg, key, cfg.gn_iters)(st)
                t_cap, f_cap, l_cap = key
                self.poses_np[:t_cap] = np.asarray(st.poses)
                self.landmarks_np[:l_cap] = np.asarray(st.landmarks)
                self.pose = self.poses_np[t].copy()
                with self._on_solve_device():
                    lm_cov, pl_cov = self._marginals_for(cfg, key)(st)
                self.lm_cov[:l_cap] = np.asarray(lm_cov)
                self.pl_cov[:l_cap] = np.asarray(pl_cov)
        return labels

    def _merge_duplicates(self):
        """Merge duplicate proven landmarks (two labels, one physical
        point): the later label's factors are relabeled to the earlier one
        and its observation statistics are folded in.

        The find_labels cover discipline suppresses duplication at the
        source under the clean configs, but the degraded chap4 configs
        (noise x4, clutter x10) still mint duplicates: a mis-estimated
        landmark misses its own detection at d2 far beyond any usable
        cover radius (measured 130-2400 in the J Sigma J^T + R metric)
        while the detection feeds a candidate 0.05-0.37 m away. The
        co-observation criterion below catches exactly these without
        touching genuinely close pairs (sim3d's median nearest-neighbor
        spacing is 0.17 m, so distance alone cannot discriminate). The
        reference has no equivalent cleanup -- its candidate culling
        (ISAM2Navigator.cs:425-436) is the only discipline, and its maps
        duplicate in exactly this way."""
        merged = False
        idx = np.flatnonzero(self.lm_mask_np)
        if len(idx) < 2:
            return False

        # (1) co-observation criterion (gated on dup_merge_radius > 0,
        # OFF by default): two labels
        # of the SAME physical landmark split its one detection per frame
        # between them, so they are (almost) never matched in the same
        # frame; two genuinely close landmarks are co-detected in most
        # co-visible frames (PD^2). A close pair that has been seen often
        # but (almost) never together is a duplicate -- merge the later
        # label into the earlier. Robust where covariance-based criteria
        # fail: under degraded configs (chap4 noisy/cluttery) the
        # mis-association bias exceeds what the marginals model, but the
        # co-observation signature is unaffected.
        if self.dup_merge_radius > 0:
            for a in range(len(idx)):
                ia = idx[a]
                if not self.lm_mask_np[ia]:
                    continue
                for b in range(a + 1, len(idx)):
                    ib = idx[b]
                    if not self.lm_mask_np[ib]:
                        continue
                    dist = float(np.linalg.norm(
                        self.landmarks_np[ia] - self.landmarks_np[ib]
                    ))
                    if dist >= self.dup_merge_radius:
                        continue
                    o = min(self.obs_count[ia], self.obs_count[ib])
                    if o < self.dup_min_obs:
                        continue
                    if self.coobs[ia, ib] > self.dup_coobs_frac * o:
                        continue
                    self._merge_pair(ia, ib)
                    merged = True

        # (2) legacy Mahalanobis criterion in the summed GLOBAL-frame
        # marginals (OFF by default, merge_threshold=0): under a weak
        # motion prior the accumulated pose uncertainty dominates these
        # covariances and physically distinct landmarks merge
        # catastrophically (measured: the kinect flat-wall map collapsed
        # from 140 labels to 1); kept for explicitly-configured use.
        if self.merge_threshold > 0:
            thr2 = float(self.merge_threshold) ** 2
            for a in range(len(idx)):
                ia = idx[a]
                if not self.lm_mask_np[ia]:
                    continue
                for b in range(a + 1, len(idx)):
                    ib = idx[b]
                    if not self.lm_mask_np[ib]:
                        continue
                    diff = self.landmarks_np[ia] - self.landmarks_np[ib]
                    c = self.lm_cov[ia] + self.lm_cov[ib]
                    try:
                        m2 = float(diff @ np.linalg.solve(c, diff))
                    except np.linalg.LinAlgError:
                        continue
                    if 0 <= m2 < thr2:
                        self._merge_pair(ia, ib)
                        merged = True
        return merged

    def _merge_pair(self, ia, ib):
        """Relabel ib's factors to ia and fold its observation statistics."""
        sel = self.f_mask_np & (self.f_lm_np == ib)
        self.f_lm_np[sel] = ia
        self.lm_mask_np[ib] = False
        self.obs_count[ia] += self.obs_count[ib]
        self.obs_count[ib] = 0
        self.coobs[ia, :] += self.coobs[ib, :]
        self.coobs[:, ia] += self.coobs[:, ib]
        self.coobs[ib, :] = 0
        self.coobs[:, ib] = 0

    # ------------------------------------------------------------------

    @property
    def state(self):
        """Full-capacity GraphState view (compat for direct inspection)."""
        return graph.GraphState(
            poses=jnp.asarray(self.poses_np),
            n_poses=jnp.int32(self.n_poses),
            landmarks=jnp.asarray(self.landmarks_np),
            lm_mask=jnp.asarray(self.lm_mask_np),
            between=jnp.asarray(self.between_np),
            between_mask=jnp.asarray(self.between_mask_np),
            pose_fixed=jnp.asarray(self.pose_fixed_np),
            f_pose=jnp.asarray(self.f_pose_np),
            f_lm=jnp.asarray(self.f_lm_np),
            f_z=jnp.asarray(self.f_z_np),
            f_mask=jnp.asarray(self.f_mask_np),
        )

    @property
    def trajectory(self):
        return self.poses_np[: self.n_poses].copy()

    @property
    def map_estimate(self):
        mask = self.lm_mask_np
        return self.landmarks_np[mask].copy(), self.lm_cov[mask]
