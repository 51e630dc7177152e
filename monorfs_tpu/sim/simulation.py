"""Headless simulation driver: couples a vehicle source with a navigator.

TPU-native re-design of the reference frame loop
(reference: mono-rfs-lib/UI/Simulation.cs:498-723 headless semantics): per
command, the vehicle advances by the exact odometry, the navigator consumes
the noise-corrupted reading, and a measurement + SLAM update runs every
frame (headless dt == MeasureElapsed). In-band SLAM/mapping switches
(command element after the odometry) collapse the particle set exactly like
StartSlam/StartMapping (PHDNavigator.cs:214-236). The per-frame ancestry of
the particle cloud is recorded so the best particle's full trajectory
(reference WayPoints cloning) can be reconstructed for estimate.out.
"""

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..gm import mixture
from ..io.recording import Recording
from ..io.world import World
from ..models import get as get_model
from ..slam import phd
from . import vehicle as vehicle_mod

DIRAC_COV = 0.001 * np.eye(3)


def model_for_config(cfg: Config, world: World):
    name = cfg.model
    if (
        name == "PRM3D"
        and world.measurer_params is not None
        and len(world.measurer_params) == 10
    ):
        name = "Kinect"  # 10-value descriptor = KinectMeasurer (cs:94-106)
    model = get_model(name)
    if world.measurer_params is not None:
        model = model.with_params(
            model.params.from_linear(world.measurer_params)
        )
    return model


class Simulation:
    """Headless vehicle + navigator run."""

    def __init__(
        self,
        cfg: Config,
        world: World,
        commands: List[np.ndarray],
        algorithm: str = "phd",
        particles: int = 200,
        onlymapping: bool = False,
        dtype=np.float64,
        phd_config: Optional[phd.PHDConfig] = None,
        seed: int = 0,
        collect_history: bool = True,
        replay=None,
        kinect_source=None,
    ):
        """With `replay` (a Recording), the vehicle becomes a RecordVehicle
        (reference: SLAM/Vehicles/RecordVehicle.cs:64-349): the true
        trajectory, noisy odometry, and measurement sets come from the
        recording instead of being re-simulated, so different algorithms can
        be solved against identical data (chap4 S8 'sandwich' style)."""
        self.cfg = cfg
        self.world = world
        self.replay = replay
        self.kinect = kinect_source
        if replay is not None and not commands:
            commands = [r for _, r in replay.odometry]
        if kinect_source is not None and not commands:
            odo = {"PRM3D": 6, "Linear2D": 2, "Linear1D": 1}[cfg.model]
            commands = [np.zeros(odo)] * len(kinect_source.dataset)
        self.commands = commands
        self.algorithm = algorithm
        self.dtype = dtype
        self.collect_history = collect_history
        self.model = model_for_config(cfg, world)
        self.onlymapping = onlymapping

        odo = self.model.pose.odo_dim
        lmax = max(len(world.landmarks), 1)
        max_clutter = 8
        self.max_meas = lmax + max_clutter
        if kinect_source is not None:
            self.max_meas = 64  # vision keypoint budget per frame
        self.max_clutter = max_clutter

        self.phd_cfg = phd_config or phd.PHDConfig(
            num_particles=particles,
            max_components=cfg.max_quantity,
            max_measurements=self.max_meas,
        )
        self.particles = particles

        self.vparams = vehicle_mod.VehicleParams(
            motion_cov=jnp.asarray(cfg.motion_covariance, dtype),
            meas_cov=jnp.asarray(cfg.measurement_covariance, dtype),
            pd=jnp.asarray(cfg.detection_probability, dtype),
            clutter_count=jnp.asarray(
                cfg.clutter_density * float(self.model.volume(self.model.params)),
                dtype,
            ),
            visibility_ramp=jnp.asarray(cfg.visibility_ramp, dtype),
            dt=jnp.asarray(cfg.measure_elapsed, dtype),
            perfect_still=jnp.asarray(cfg.perfect_still, bool),
        )
        self.nparams = cfg.phd_params(dtype)

        lm = np.zeros((lmax, 3), dtype)
        lm[: len(world.landmarks)] = world.landmarks
        lmask = np.arange(lmax) < len(world.landmarks)
        self.vstate = vehicle_mod.VehicleState(
            pose=jnp.asarray(world.pose, dtype),
            landmarks=jnp.asarray(lm),
            landmark_mask=jnp.asarray(lmask),
        )

        self.key = jax.random.PRNGKey(seed)
        self._build_navigator()

        # histories (host side)
        self.waypoints = []  # (t, true pose)
        self.way_odometry = []  # (t, noisy odometry)
        self.way_measurements = []  # (t, [z])
        self.way_sightings = []  # (t, [true label per z])
        self.way_maps = []  # (t, [(w, mean, cov)])
        self.way_vismaps = []  # (t, [(w, mean, cov)])
        self.frames = []  # per-frame dict: poses [P,S], parents [P], best
        self.sidebar_frames = []  # sensor-view JPEG payloads (kinect runs);
        # encoded at capture so a long recording holds ~KB per frame of
        # compressed bytes instead of a full uint8 RGB array each
        self.tags = []
        self.time = 0.0
        self.frame_index = 0

    # ------------------------------------------------------------------

    def _build_navigator(self):
        model, cfg = self.model, self.cfg
        if self.algorithm == "phd":
            self._step_slam = jax.jit(
                phd.make_slam_step(model, self.phd_cfg, slam=True)
            )
            self._step_mapping = jax.jit(
                phd.make_slam_step(model, self.phd_cfg, slam=False)
            )
            self.nstate = phd.init_state(
                model,
                dataclasses.replace(self.phd_cfg, num_particles=self.particles),
                np.asarray(self.world.pose, self.dtype),
                self.dtype,
            )
            self.mode_mapping = self.onlymapping
        elif self.algorithm == "odometry":
            self.nav_pose = jnp.asarray(self.world.pose, self.dtype)
            self.mode_mapping = self.onlymapping
        elif self.algorithm == "isam2":
            from ..slam.isam2nav import ISAM2Navigator

            self.isam2 = ISAM2Navigator(
                model,
                cfg,
                np.asarray(self.world.pose, self.dtype),
                max_poses=len(self.commands) + 2,
                max_landmarks=(
                    256 if self.kinect is not None
                    else max(4 * len(self.world.landmarks), 64)
                ),
                meas_per_frame=self.max_meas,
                onlymapping=self.onlymapping,
                dtype=self.dtype,
            )
            self.mode_mapping = self.onlymapping
        elif self.algorithm == "loopy":
            # offline smoother: an inner online pass provides the initial
            # estimate (LoopyPHDNavigator ctor semantics,
            # LoopyPHDNavigator.cs:223-246); sweeps run in run().
            # sequential-refit pass + (loopy_sweeps - 1) Jacobi sweeps;
            # see Config.loopy_sweeps for the measured budget rationale.
            # Overridable via the LoopySweeps config key.
            self.loopy_sweeps = cfg.loopy_sweeps
            self.mode_mapping = False
        else:
            raise ValueError(f"unknown algorithm {self.algorithm}")

    def _vehicle_frame(self):
        """Advance the vehicle and sample (or replay) a measurement set."""
        if self.kinect is not None:
            return self._kinect_frame()
        if self.replay is not None:
            return self._replay_frame()
        self.key, kupd, kmeas = jax.random.split(self.key, 3)
        reading = jnp.asarray(
            self.current_command[: self.model.pose.odo_dim], self.dtype
        )
        self.vstate, noisy = vehicle_mod.update(
            self.model, self.vparams, self.vstate, reading, kupd
        )
        z, mask, labels, visible, detected = vehicle_mod.measure(
            self.model, self.vparams, self.vstate, kmeas, self.max_clutter
        )
        if not self.cfg.use_odometry:
            noisy = jnp.zeros_like(noisy)
        return noisy, z, mask, labels, visible, detected

    def _kinect_frame(self):
        """RGB-D frontend frame (KinectVehicle.Measure semantics,
        KinectVehicle.cs:301-344): measurements from the vision pipeline,
        no groundtruth pose, odometry from the command stream."""
        i = self.frame_index
        zs, depth = self.kinect.measure(i)
        self._sidebar_frame(depth, zs)
        if self.model.uses_depth:
            # re-bind the live depth map for occlusion-aware visibility
            self.nparams = self.nparams._replace(
                depth_map=jnp.asarray(depth, self.dtype)
            )
        d = self.model.meas_dim
        z = np.zeros((self.max_meas, d), self.dtype)
        n = min(len(zs), self.max_meas)
        z[:n] = zs[:n, :d]
        mask = np.arange(self.max_meas) < n
        noisy = jnp.asarray(
            self.current_command[: self.model.pose.odo_dim], self.dtype
        )
        lmax = self.vstate.landmarks.shape[0]
        return (
            noisy,
            jnp.asarray(z),
            jnp.asarray(mask),
            None,
            jnp.zeros(lmax, bool),
            jnp.zeros(lmax, bool),
        )

    def _sidebar_frame(self, depth, zs):
        """Collect one sensor-view sidebar frame: normalized depth with the
        accepted keypoints marked (the reference draws the same depth +
        keypoint overlay, KinectVehicle.cs:789-858; the frames become the
        recording's sidebar.avi)."""
        d = np.asarray(depth, np.float32)
        lo, hi = float(d.min()), float(d.max())
        img = ((d - lo) / (hi - lo + 1e-12) * 255).astype(np.uint8)
        rgb = np.stack([img, img, img], axis=-1)
        h, w = img.shape
        for px, py, _ in np.asarray(zs).reshape(-1, 3):
            x, y = int(px + w / 2), int(py + h / 2)
            if 1 <= x < w - 1 and 1 <= y < h - 1:
                rgb[y - 1:y + 2, x - 1:x + 2] = (255, 64, 64)
        from ..io import avi

        self.sidebar_frames.append(
            avi.jpeg_encode(rgb, quality=self.cfg.sidebar_jpeg_quality)[0]
        )

    def _replay_frame(self):
        """RecordVehicle playback (RecordVehicle.cs:150-240): pose from the
        recorded groundtruth, odometry and measurements as recorded."""
        i = self.frame_index
        rec = self.replay
        noisy = jnp.asarray(rec.odometry[i][1], self.dtype)
        self.vstate = self.vstate._replace(
            pose=jnp.asarray(rec.trajectory[i][1], self.dtype)
        )
        zs = rec.measurements[i][1] if i < len(rec.measurements) else []
        d = self.model.meas_dim
        z = np.zeros((self.max_meas, d), self.dtype)
        for k, zi in enumerate(zs[: self.max_meas]):
            z[k] = zi[:d]
        mask = np.arange(self.max_meas) < len(zs)
        # true association labels recorded with the run (sightings.out) make
        # known-DA (DAAlgorithm Perfect) work through record replay
        labels = None
        if i < len(rec.sightings):
            ls = rec.sightings[i][1]
            labels = np.full(self.max_meas, vehicle_mod.CLUTTER_LABEL,
                             np.int32)
            labels[: len(ls)] = ls[: self.max_meas]
            labels = jnp.asarray(labels)
        lmax = self.vstate.landmarks.shape[0]
        visible = np.zeros(lmax, bool)
        detected = np.zeros(lmax, bool)
        if not self.cfg.use_odometry:
            noisy = jnp.zeros_like(noisy)
        return (
            noisy,
            jnp.asarray(z),
            jnp.asarray(mask),
            labels,
            jnp.asarray(visible),
            jnp.asarray(detected),
        )

    def _collapse(self, n):
        """StartSlam/StartMapping particle collapse
        (PHDNavigator.cs:214-236): every particle resets to the reference
        pose and the best particle's map."""
        best = int(self.nstate.best)
        maps = self.nstate.maps
        best_map = jax.tree.map(
            lambda a: jnp.broadcast_to(a[best], a.shape), maps
        )
        p = self.particles
        self.nstate = phd.PHDState(
            pose=jnp.broadcast_to(self.vstate.pose, (p,) + self.vstate.pose.shape),
            logweight=jnp.full((p,), -np.log(p), self.nstate.logweight.dtype),
            maps=best_map,
            best=jnp.int32(0),
            ancestor=jnp.full((p,), best, jnp.int32),
        )

    def step(self, command: np.ndarray):
        """One frame."""
        odo_dim = self.model.pose.odo_dim
        self.current_command = command
        self.time += self.cfg.measure_elapsed
        t = self.time

        # in-band mode switches (Simulation.cs:575-634)
        if len(command) > odo_dim and self.algorithm == "phd":
            flag = command[odo_dim]
            if flag > 0 and self.mode_mapping:
                self.tags.append((t, "SLAM mode on"))
                self._collapse(self.particles)
                self.mode_mapping = False
            elif flag < 0 and not self.mode_mapping:
                self.tags.append((t, "Mapping mode on"))
                self._collapse(self.particles)
                self.mode_mapping = True

        noisy, z, mask, labels, visible, detected = self._vehicle_frame()

        if self.algorithm == "phd":
            self.key, knav = jax.random.split(self.key)
            step = self._step_mapping if self.mode_mapping else self._step_slam
            self.nstate = step(
                self.nparams,
                self.nstate,
                noisy,
                z[:, : self.model.meas_dim],
                mask,
                knav,
                true_pose=self.vstate.pose,
            )
        elif self.algorithm == "odometry":
            if self.mode_mapping:
                self.nav_pose = self.vstate.pose
            else:
                self.nav_pose = self.model.pose.add_odometry(self.nav_pose, noisy)
        elif self.algorithm == "isam2":
            self.isam2.predict(np.asarray(noisy), np.asarray(self.vstate.pose))
            zs = np.asarray(z)[np.asarray(mask)][:, : self.model.meas_dim]
            true_labels = (
                np.asarray(labels)[np.asarray(mask)]
                if labels is not None
                else None
            )
            self.isam2.slam_update(list(zs), true_labels)

        if self.collect_history:
            self._record(t, noisy, z, mask, labels, visible, detected)
        self.frame_index += 1

    def _record(self, t, noisy, z, mask, labels, visible, detected):
        vpose = np.asarray(self.vstate.pose)
        self.waypoints.append((t, vpose.copy()))
        self.way_odometry.append((t, np.asarray(noisy).copy()))
        zs = np.asarray(z)[np.asarray(mask)]
        self.way_measurements.append(
            (t, [zi[: self.model.meas_dim] for zi in zs])
        )
        if labels is not None:
            ls = np.asarray(labels)[np.asarray(mask)]
            self.way_sightings.append((t, [int(l) for l in ls]))

        if self.replay is not None:
            # carry the recorded groundtruth visibility through
            i = self.frame_index
            self.way_vismaps.append(
                self.replay.vismaps[i]
                if i < len(self.replay.vismaps)
                else (t, [])
            )
        else:
            lms = np.asarray(self.vstate.landmarks)
            vis = np.asarray(visible)
            det = np.asarray(detected)
            self.way_vismaps.append(
                (
                    t,
                    [
                        (1.0 if det[i] else 0.0, lms[i], DIRAC_COV)
                        for i in range(len(lms))
                        if vis[i]
                    ],
                )
            )

        if self.algorithm == "phd":
            best = int(self.nstate.best)
            maps = self.nstate.maps
            logw = np.asarray(maps.logw[best])
            alive = logw > mixture.ALIVE_THRESHOLD
            mean_b = np.asarray(maps.mean[best])
            cov_b = np.asarray(maps.cov[best])
            comps = [
                (float(np.exp(logw[i])), mean_b[i], cov_b[i])
                for i in np.nonzero(alive)[0]
            ]
            self.way_maps.append((t, comps))
            self.frames.append(
                {
                    "poses": np.asarray(self.nstate.pose).copy(),
                    "best": best,
                    "parents": np.asarray(self.nstate.ancestor).copy(),
                }
            )
        elif self.algorithm == "isam2":
            means, covs = self.isam2.map_estimate
            self.way_maps.append(
                (t, [(1.0, means[i], covs[i]) for i in range(len(means))])
            )
            self.frames.append(
                {"poses": self.isam2.pose[None, :].copy(), "best": 0}
            )
        else:
            self.way_maps.append((t, []))
            self.frames.append(
                {
                    "poses": np.asarray(self.nav_pose)[None, :].copy(),
                    "best": 0,
                }
            )

    def run(self, progress=False, checkpoint_file=None, abort_flag=None):
        """Run all frames. With `checkpoint_file`, the full recording is
        rewritten every CheckpointCycleTime seconds
        (Simulation.cs:500-510); `abort_flag` (a mutable [bool]) stops
        gracefully mid-run (the SIGINT path, Program.cs:65-87)."""
        if self.algorithm == "loopy":
            return self._run_loopy(progress)
        import time as _time

        last_checkpoint = _time.time()
        for i, cmd in enumerate(self.commands):
            if abort_flag is not None and abort_flag[0]:
                print("aborted; saving progress", flush=True)
                break
            self.step(cmd)
            if progress and (i + 1) % 50 == 0:
                print(f"{i + 1}/{len(self.commands)}", flush=True)
            if (
                checkpoint_file
                and _time.time() - last_checkpoint
                > self.cfg.checkpoint_cycle_time
            ):
                self.save(checkpoint_file)
                last_checkpoint = _time.time()
        return self

    def _run_loopy(self, progress=False):
        """Offline smoother driver: the initial estimate comes from the
        replayed record's own estimate when one exists (the reference reads
        "Loopy PHD initialization data from file", Simulation.cs:317-321 +
        :360-366), else from an inner PHD pass; then annealed
        message-passing sweeps."""
        from ..slam.loopynav import LoopyPHDNavigator

        use_recorded = self.replay is not None and bool(self.replay.estimate)
        inner = Simulation(
            self.cfg,
            self.world,
            self.commands,
            algorithm="phd" if not use_recorded else "odometry",
            particles=self.particles,
            onlymapping=self.onlymapping,
            dtype=self.dtype,
            phd_config=self.phd_cfg,
            replay=self.replay,
        )
        inner.run(progress=progress)
        if use_recorded:
            # final snapshot of the recorded estimate history
            est_traj = [v for _, v in self.replay.estimate[-1][1]]
        else:
            est_traj = [f["poses"][f["best"]] for f in inner.frames]
        odometry = [o for _, o in inner.way_odometry]
        meas = [zs for _, zs in inner.way_measurements]

        self.loopy = LoopyPHDNavigator(
            self.model,
            self.cfg,
            np.array(est_traj),
            odometry,
            meas,
            max_meas=self.max_meas,
            dtype=self.dtype,
        )
        for s in range(self.loopy_sweeps):
            self.loopy.sweep()
            if progress:
                print(f"sweep {s + 1}/{self.loopy_sweeps}", flush=True)

        # histories: groundtruth streams from the inner run; estimate and map
        # from the smoother
        self.waypoints = inner.waypoints
        self.way_odometry = inner.way_odometry
        self.way_measurements = inner.way_measurements
        self.way_vismaps = inner.way_vismaps
        self.tags = inner.tags
        traj = self.loopy.trajectory
        self.frames = [
            {"poses": traj[i][None, :], "best": 0} for i in range(len(traj))
        ]
        # per-frame map history over the final fused trajectory: the
        # recording's OSPA series is meaningful at every frame (round-2 bug:
        # all frames but the last carried an empty map)
        hist = self.loopy.map_history()
        self.way_maps = [
            (t, hist[i] if i < len(hist) else (hist[-1] if hist else []))
            for i, (t, _) in enumerate(inner.way_maps)
        ]
        return self

    # ------------------------------------------------------------------

    def estimate_history(self):
        """Reconstruct (time, best-particle trajectory) per frame — the
        EXACT clone-on-resample genealogy.

        The reference clones each particle's WayPoints on resample
        (Vehicle.cs:117-127 via TrackClone; ResampleParticles,
        PHDNavigator.cs:724-760), so frame t's estimate is the best
        particle's full inherited pose history. The per-frame ancestor
        indices recorded by the filter reproduce it: walk parents backward
        from the best particle of each frame.

        NOTE: a particle's pose at the moment of resampling is COPIED to its
        children, so the backward walk uses the pose stored at each earlier
        frame under the ancestor chain."""
        times = [w[0] for w in self.waypoints]
        out = []
        for i, frame in enumerate(self.frames):
            idx = frame["best"]
            traj = [None] * (i + 1)
            for s in range(i, -1, -1):
                fs = self.frames[s]
                traj[s] = (times[s], fs["poses"][idx])
                idx = fs.get("parents", np.arange(len(fs["poses"])))[idx]
            out.append((times[i], traj))
        return out

    def to_recording(self) -> Recording:
        return Recording(
            world=World(
                pose=np.asarray(self.world.pose),
                landmarks=np.asarray(self.world.landmarks),
                measurer_params=np.asarray(self.model.params.to_linear()),
            ),
            trajectory=self.waypoints,
            odometry=self.way_odometry,
            estimate=self.estimate_history(),
            maps=self.way_maps,
            vismaps=self.way_vismaps,
            measurements=self.way_measurements,
            tags=self.tags,
            config_text=self.cfg.to_descriptor(),
            sightings=self.way_sightings,
            sidebar=self._sidebar_avi(),
        )

    def _sidebar_avi(self):
        if not self.sidebar_frames:
            return b""
        import io as _io

        from ..io import avi

        buf = _io.BytesIO()
        fps = max(int(round(1.0 / max(self.cfg.measure_elapsed, 1e-3))), 1)
        avi.write_mjpeg(buf, self.sidebar_frames, fps=fps)
        return buf.getvalue()

    def save(self, filename):
        self.to_recording().save(filename)
