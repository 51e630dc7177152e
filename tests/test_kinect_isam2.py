"""Kinect -> iSAM2 end-to-end: the RGB-D keypoint pipeline feeding the
graph-SLAM backend recovers a known camera translation.

The synthetic stream is a flat wall at constant depth, which makes the image
pan geometrically exact for a laterally translating pinhole camera
(camera dx = pixel shift * depth / focal), so the trajectory has an analytic
ground truth — coverage the reference lacks entirely (SURVEY §4 gaps:
no ISAM2Navigator or KinectVehicle tests). Reference pipeline being
validated: KinectVehicle.cs:503-576 -> ISAM2Navigator.cs:192-248."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end runs; deselect with -m "not slow"

import numpy as np

from monorfs_tpu.config import Config
from monorfs_tpu.frontend.dataset import RGBDDataset, synthesize_rgbd
from monorfs_tpu.frontend.kinect import KinectSource
from monorfs_tpu.io import World
from monorfs_tpu.models.kinect_model import Params as KinectParams
from monorfs_tpu.sim import Simulation


def test_kinect_isam2_recovers_translation(tmp_path):
    h, w, frames, depth, focal = 120, 160, 16, 1.5, 200.0
    # pan ~2 px/frame: well under the texture's 8-22 px square spacing, so
    # gated association is unambiguous (faster pans alias the repetitive
    # corners onto the zero-odometry prediction)
    path, offsets = synthesize_rgbd(
        tmp_path / "flat.npz", frames=frames, h=h, w=w, seed=3,
        flat_depth=depth, pan_rate=0.2,
    )
    true_dx = offsets * depth / focal  # camera x-translation per frame

    cam = KinectParams(
        focal=focal, film_left=-w / 2, film_top=-h / 2, film_width=w,
        film_height=h, range_min=0.1, range_max=5.0, res_x=w, res_y=h,
        border=1,
    )
    src = KinectSource(RGBDDataset(path), camera=cam, delta=1,
                       max_keypoints=128, threshold=40.0)
    world = World(
        pose=np.array([0, 0, 0, 1, 0, 0, 0.0]),
        landmarks=np.zeros((0, 3)),
        measurer_params=np.asarray(cam.to_linear()),
    )
    cfg = Config()  # PRM3D defaults
    # weak odometry prior: the command stream reads zero motion, the panning
    # must be recovered from the measurements alone
    cfg.motion_covariance = np.diag([10.0, 10, 10, 0.1, 0.1, 0.1])
    sim = Simulation(cfg, world, [], algorithm="isam2", particles=1,
                     kinect_source=src, dtype=np.float64)
    sim.run()

    traj = sim.isam2.trajectory  # [T, 7]; slot 0 is the init pose
    est_dx = traj[1:, 0] - traj[1, 0]
    want = true_dx - true_dx[0]
    # the camera pans a total of ~0.2 m; the estimate must track it
    assert want[-1] > 0.15
    err = np.abs(est_dx - want)
    assert err[-1] < 0.3 * want[-1], (est_dx[-1], want[-1])
    assert np.max(err) < 0.12, np.max(err)
    # off-axis drift stays small
    assert np.max(np.abs(traj[1:, 1] - traj[1, 1])) < 0.1
    assert np.max(np.abs(traj[1:, 2] - traj[1, 2])) < 0.1


def test_kinect_run_embeds_sidebar(tmp_path):
    """Kinect runs record the sensor view as sidebar.avi
    (Simulation.cs:391-488 recording member)."""
    h, w, frames, depth, focal = 60, 80, 4, 1.5, 100.0
    path, _ = synthesize_rgbd(
        tmp_path / "flat.npz", frames=frames, h=h, w=w, seed=3,
        flat_depth=depth, pan_rate=0.2,
    )
    cam = KinectParams(
        focal=focal, film_left=-w / 2, film_top=-h / 2, film_width=w,
        film_height=h, range_min=0.1, range_max=5.0, res_x=w, res_y=h,
        border=1,
    )
    src = KinectSource(RGBDDataset(path), camera=cam, delta=1,
                       max_keypoints=32, threshold=40.0)
    world = World(
        pose=np.array([0, 0, 0, 1, 0, 0, 0.0]),
        landmarks=np.zeros((0, 3)),
        measurer_params=np.asarray(cam.to_linear()),
    )
    cfg = Config()
    sim = Simulation(cfg, world, [], algorithm="odometry", particles=1,
                     kinect_source=src, dtype=np.float64)
    sim.run()
    f = tmp_path / "rec.zip"
    sim.save(str(f))
    from monorfs_tpu.io import avi
    from monorfs_tpu.io.recording import Recording

    rec = Recording.load(f)
    assert rec.sidebar, "kinect run should embed sidebar.avi"
    jpegs = avi.read_mjpeg(__import__("io").BytesIO(rec.sidebar))
    assert len(jpegs) == frames


def test_kinect_isam2_parallax_scene(tmp_path):
    """True-3D parallax render (synthesize_rgbd_parallax): patches at
    different depths shift at different pixel rates, so recovering the
    camera translation requires using the per-keypoint DEPTH correctly --
    a flat-wall pan cannot catch a wrong focal/depth coupling. Analytic
    ground truth: the camera x-position series."""
    from monorfs_tpu.frontend.dataset import synthesize_rgbd_parallax

    h, w, frames, focal = 120, 160, 16, 200.0
    path, true_x = synthesize_rgbd_parallax(
        tmp_path / "parallax.npz", frames=frames, h=h, w=w, focal=focal,
        seed=5, travel=0.15,
    )
    cam = KinectParams(
        focal=focal, film_left=-w / 2, film_top=-h / 2, film_width=w,
        film_height=h, range_min=0.1, range_max=5.0, res_x=w, res_y=h,
        border=1,
    )
    src = KinectSource(RGBDDataset(path), camera=cam, delta=1,
                       max_keypoints=128, threshold=40.0)
    world = World(
        pose=np.array([0, 0, 0, 1, 0, 0, 0.0]),
        landmarks=np.zeros((0, 3)),
        measurer_params=np.asarray(cam.to_linear()),
    )
    cfg = Config()
    cfg.motion_covariance = np.diag([10.0, 10, 10, 0.1, 0.1, 0.1])
    sim = Simulation(cfg, world, [], algorithm="isam2", particles=1,
                     kinect_source=src, dtype=np.float64)
    sim.run()

    traj = sim.isam2.trajectory
    est_x = traj[1:, 0] - traj[1, 0]
    want = true_x - true_x[0]
    assert want[-1] > 0.1
    err = np.abs(est_x - want)
    ate = float(np.sqrt(np.mean(err ** 2)))
    assert err[-1] < 0.35 * want[-1], (est_x[-1], want[-1])
    assert ate < 0.05, ate
    assert np.max(np.abs(traj[1:, 1] - traj[1, 1])) < 0.1
    assert np.max(np.abs(traj[1:, 2] - traj[1, 2])) < 0.1
