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

Association runs on host (tiny problem, one Hungarian per frame, exactly as
the reference does on CPU); the solve + marginal covariances are one jitted
device computation.
"""

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..metrics.errors import hungarian
from . import graph

CLUTTER = -9999


class ISAM2Navigator:
    def __init__(self, model, cfg, init_pose, max_poses=512,
                 max_landmarks=256, meas_per_frame=24, onlymapping=False,
                 dtype=np.float64, da_algorithm=None):
        self.model = model
        self.cfg = cfg
        self.dtype = dtype
        self.onlymapping = onlymapping
        self.da_algorithm = da_algorithm or cfg.da_algorithm
        self.match_threshold = cfg.match_threshold
        self.new_landmark_threshold = cfg.new_landmark_threshold
        self.pd = cfg.detection_probability
        self.clutter_density = max(cfg.navigator_clutter_density, 1e-30)

        self.gcfg = graph.GraphConfig(
            max_poses=max_poses,
            max_landmarks=max_landmarks,
            max_factors=max_poses * meas_per_frame,
        )
        self.state = graph.empty_state(model, self.gcfg, init_pose, dtype)
        self.n_factors = 0

        # diagonal noise like the reference bridge (ISAM2Navigator.cs:140-150)
        dt = cfg.measure_elapsed
        motion_sigma = dt * np.sqrt(np.diag(cfg.motion_covariance))
        meas_sigma = np.sqrt(np.diag(cfg.measurement_covariance))
        self.motion_info = jnp.asarray(np.diag(1.0 / motion_sigma**2), dtype)
        self.meas_info = jnp.asarray(np.diag(1.0 / meas_sigma**2), dtype)
        self.meas_cov = jnp.asarray(np.diag(meas_sigma**2), dtype)

        self._solve = jax.jit(
            lambda st: graph.gauss_newton(
                model, self.gcfg, st, self.motion_info, self.meas_info
            )
        )
        self._marginals = jax.jit(
            lambda st: graph.marginals(
                model, self.gcfg, st, self.motion_info, self.meas_info,
                self.meas_cov,
            )
        )

        self.pose = np.asarray(init_pose, dtype)
        self.dead_reckon = np.asarray(init_pose, dtype)
        self.lm_cov = np.zeros((max_landmarks, 3, 3))
        self.pl_cov = np.tile(np.asarray(self.meas_cov), (max_landmarks, 1, 1))
        self.next_label = 0
        # candidates: [mean(3), count]
        self.cand_mean: List[np.ndarray] = []
        self.cand_count: List[int] = []

    # ------------------------------------------------------------------

    def predict(self, odometry, true_pose=None):
        """Odometry dead-reckoning of the current estimate
        (ISAM2Navigator.cs:174-183)."""
        if self.onlymapping and true_pose is not None:
            self.pose = np.asarray(true_pose, self.dtype)
        else:
            self.pose = np.asarray(
                self.model.pose.add_odometry(
                    jnp.asarray(self.pose), jnp.asarray(odometry, self.dtype)
                )
            )

    # ------------------------------------------------------------------

    def _measure_np(self, pose, lm):
        return np.asarray(
            self.model.measure(
                self.model.params, jnp.asarray(pose), jnp.asarray(lm)
            )
        )

    def _to_map_np(self, pose, z):
        return np.asarray(
            self.model.to_map(
                self.model.params, jnp.asarray(pose), jnp.asarray(z)
            )
        )

    def find_labels(self, measurements, true_labels=None):
        """FindLabels (ISAM2Navigator.cs:256-441). Returns one label per
        measurement: >=0 real landmark, <0 candidate, CLUTTER unmatched."""
        if self.da_algorithm == "Perfect":
            if true_labels is None:
                raise RuntimeError(
                    "Tried to use perfect data association when none exists."
                )
            labels = []
            for lab in true_labels:
                labels.append(lab if lab >= 0 else CLUTTER)
            return labels

        st = self.state
        lm_mask = np.asarray(st.lm_mask)
        lms = np.asarray(st.landmarks)
        m = len(measurements)

        visible_idx = [
            i
            for i in range(len(lms))
            if lm_mask[i]
            and bool(
                self.model.visible(
                    self.model.params,
                    jnp.asarray(self._measure_np(self.pose, lms[i])),
                )
            )
        ]
        nv = len(visible_idx)
        nc = len(self.cand_mean)
        n = nv + nc

        log_pd = np.log(self.pd)
        log_clutter = np.log(self.clutter_density)
        mahalanobis = self.da_algorithm == "Mahalanobis"

        means = []
        covs = []
        for i in visible_idx:
            if mahalanobis:
                means.append(self._measure_np(self.pose, lms[i]))
                covs.append(self.pl_cov[i])
            else:
                means.append(lms[i])
                covs.append(0.001 * np.eye(3))
        r = np.asarray(self.meas_cov)
        for c in self.cand_mean:
            if mahalanobis:
                means.append(self._measure_np(self.pose, c))
                covs.append(r)
            else:
                means.append(c)
                covs.append(0.001 * np.eye(3))

        size = n + m
        neg = -1e20
        profit = np.full((size, size), neg)
        thr2 = self.match_threshold**2
        for i in range(n):
            ci = np.linalg.inv(covs[i])
            logmult = -0.5 * (
                len(means[i]) * np.log(2 * np.pi)
                + np.linalg.slogdet(covs[i])[1]
            )
            for k in range(m):
                if mahalanobis:
                    diff = np.asarray(measurements[k]) - means[i]
                else:
                    diff = self._to_map_np(self.pose, measurements[k]) - means[i]
                d2 = diff @ ci @ diff
                if d2 < thr2:
                    profit[i, k] = log_pd + logmult - 0.5 * d2
        for i in range(n):
            profit[i, m + i] = log_pd
        for i in range(m):
            profit[n + i, i] = log_clutter
        profit[n:, m:] = 0.0  # misdetection x clutter quadrant

        assignment = hungarian(-profit)

        labels = [CLUTTER] * m
        keep = [False] * nc
        for i in range(nv):
            if assignment[i] < m:
                labels[assignment[i]] = visible_idx[i]
        for i in range(nv, n):
            if assignment[i] < m:
                k = i - nv
                zi = assignment[i]
                labels[zi] = -k - 1
                w = self.cand_count[k]
                self.cand_mean[k] = (
                    self.cand_mean[k] * w
                    + self._to_map_np(self.pose, measurements[zi])
                ) / (w + 1)
                self.cand_count[k] = w + 1
                if self.cand_count[k] >= self.new_landmark_threshold:
                    labels[zi] = self.next_label
                    self.next_label += 1
                else:
                    keep[k] = True
        for i in range(m):
            if labels[i] == CLUTTER:
                if self.new_landmark_threshold <= 1:
                    labels[i] = self.next_label
                    self.next_label += 1
                else:
                    self.cand_mean.append(
                        self._to_map_np(self.pose, measurements[i])
                    )
                    self.cand_count.append(1)
                    keep.append(True)
        self.cand_mean = [c for c, k in zip(self.cand_mean, keep) if k]
        self.cand_count = [c for c, k in zip(self.cand_count, keep) if k]
        return labels

    # ------------------------------------------------------------------

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

        st = self.state
        t = int(st.n_poses)
        if t >= self.gcfg.max_poses:
            raise RuntimeError("graph pose capacity exceeded")

        prev = np.asarray(st.poses[t - 1])
        delta = np.asarray(
            self.model.pose.diff_odometry(
                jnp.asarray(self.pose), jnp.asarray(prev)
            )
        )
        poses = st.poses.at[t].set(jnp.asarray(self.pose, self.dtype))
        between = st.between.at[t].set(jnp.asarray(delta, self.dtype))
        between_mask = st.between_mask.at[t].set(True)
        pose_fixed = st.pose_fixed
        if self.onlymapping:
            pose_fixed = pose_fixed.at[t].set(True)

        landmarks = st.landmarks
        lm_mask = st.lm_mask
        f_pose, f_lm, f_z, f_mask = st.f_pose, st.f_lm, st.f_z, st.f_mask
        for z, lab in zip(measurements, labels):
            if lab < 0:
                continue
            if lab >= self.gcfg.max_landmarks:
                # capacity reached: drop the factor (the reference would
                # abort on gtsam failure; a bounded map is the TPU-native
                # contract -- size max_landmarks to the scene)
                continue
            if not bool(lm_mask[lab]):
                landmarks = landmarks.at[lab].set(
                    jnp.asarray(self._to_map_np(self.pose, z), self.dtype)
                )
                lm_mask = lm_mask.at[lab].set(True)
            fi = self.n_factors
            if fi >= self.gcfg.max_factors:
                continue  # factor budget exhausted; drop extra observations
            f_pose = f_pose.at[fi].set(t)
            f_lm = f_lm.at[fi].set(lab)
            f_z = f_z.at[fi].set(jnp.asarray(z, self.dtype))
            f_mask = f_mask.at[fi].set(True)
            self.n_factors += 1

        self.state = graph.GraphState(
            poses=poses,
            n_poses=jnp.int32(t + 1),
            landmarks=landmarks,
            lm_mask=lm_mask,
            between=between,
            between_mask=between_mask,
            pose_fixed=pose_fixed,
            f_pose=f_pose,
            f_lm=f_lm,
            f_z=f_z,
            f_mask=f_mask,
        )

        self.state = self._solve(self.state)
        lm_cov, pl_cov = self._marginals(self.state)
        self.lm_cov = np.asarray(lm_cov)
        self.pl_cov = np.asarray(pl_cov)
        self.pose = np.asarray(self.state.poses[t])
        return labels

    # ------------------------------------------------------------------

    @property
    def trajectory(self):
        n = int(self.state.n_poses)
        return np.asarray(self.state.poses[:n])

    @property
    def map_estimate(self):
        mask = np.asarray(self.state.lm_mask)
        return np.asarray(self.state.landmarks)[mask], self.lm_cov[mask]
