"""3D viewer rendering (viewer3d.py): smoke + geometry checks."""

import io

import numpy as np

from monorfs_tpu.io.recording import Recording
from monorfs_tpu.io.world import World
from monorfs_tpu import viewer3d


def _rec():
    world = World(
        pose=np.array([0, 0, 0, 1, 0, 0, 0.0]),
        landmarks=np.array([[0.1, 0.2, 1.0], [-0.2, 0.1, 1.2]]),
        measurer_params=np.array([200.0, 0.1, 2.0, -80, -60, 160, 120]),
    )
    traj = [(i / 30.0, np.array([0.01 * i, 0, 0, 1, 0, 0, 0.0]))
            for i in range(5)]
    maps = [
        (t, [(1.0, np.array([0.1, 0.2, 1.0]), np.eye(3) * 1e-4)])
        for t, _ in traj
    ]
    est = [(t, [(tt, s) for tt, s in traj[: i + 1]])
           for i, (t, _) in enumerate(traj)]
    meas = [(t, [np.array([5.0, -3.0, 1.0])]) for t, _ in traj]
    return Recording(
        world=world, trajectory=traj, odometry=[], estimate=est, maps=maps,
        vismaps=[], measurements=meas, tags=[(0.1, "screenshot test")],
        config_text="",
    )


def test_render_3d_png():
    buf = io.BytesIO()
    viewer3d.render_3d(_rec(), buf)
    assert buf.getbuffer().nbytes > 10_000  # a real PNG came out


def test_tag_shots(tmp_path):
    outs = viewer3d.render_tagged_3d(_rec(), str(tmp_path))
    assert len(outs) == 1 and "screenshot_test" in outs[0]


def test_frustum_geometry():
    # frustum corners at identity pose: film corner (left, top) at range_max
    # back-projects to (left/f, top/f, 1) * rmax
    lines = viewer3d._frustum_lines(
        np.array([0, 0, 0, 1, 0, 0, 0.0]),
        np.array([200.0, 0.1, 2.0, -80, -60, 160, 120]),
    )
    assert len(lines) == 12  # 2 rectangles (4 edges each) + 4 connectors
    pts = np.concatenate([l.T for l in lines], axis=0)
    assert np.isclose(pts[:, 2].max(), 2.0)
    assert np.isclose(pts[:, 2].min(), 0.1)
    far = pts[np.isclose(pts[:, 2], 2.0)]
    assert np.isclose(np.abs(far[:, 0]).max(), 80 / 200 * 2.0)


def test_ellipsoid_rings_scale():
    rings = viewer3d._ellipsoid_wires([0, 0, 0], np.eye(3) * 0.01, nsigma=5)
    pts = np.concatenate(rings, axis=1)
    # 5 sigma of std 0.1 = 0.5 max radius
    assert np.isclose(np.linalg.norm(pts, axis=0).max(), 0.5, atol=1e-6)
