"""Viewer rendering smoke tests (the reference has no Viewer tests)."""

import numpy as np

from monorfs_tpu.io.recording import Recording
from monorfs_tpu.io.world import World
from monorfs_tpu import viewer


def tiny_recording():
    world = World(
        pose=np.zeros(2),
        landmarks=np.array([[1.0, 1.0, 0.0], [2.0, -0.5, 0.0]]),
        measurer_params=np.array([2.0]),
    )
    traj = [(0.03 * t, np.array([0.1 * t, 0.0])) for t in range(5)]
    est = [(t, [(tt, p) for tt, p in traj[: i + 1]])
           for i, (t, _) in enumerate(traj)]
    maps = [
        (t, [(1.0, np.array([1.0, 1.0, 0.0]), 0.01 * np.eye(3))])
        for t, _ in traj
    ]
    meas = [(t, [np.array([0.5, 0.5])]) for t, _ in traj]
    return Recording(
        world=world, trajectory=traj, odometry=traj, estimate=est, maps=maps,
        vismaps=[(t, []) for t, _ in traj], measurements=meas,
        tags=[(0.0, "start")], config_text="Model: Linear2D",
    )


def test_render_overview(tmp_path):
    rec = tiny_recording()
    out = viewer.render_overview(rec, str(tmp_path / "v.png"))
    assert (tmp_path / "v.png").stat().st_size > 1000


def test_render_frames(tmp_path):
    rec = tiny_recording()
    outs = viewer.render_frames(rec, str(tmp_path / "frames"), stride=2)
    assert len(outs) == 3


def test_tag_roundtrip(tmp_path):
    rec = tiny_recording()
    viewer.add_tag(rec, 0.06, "loop closure")
    f = tmp_path / "rec.zip"
    rec.save(f)
    back = Recording.load(f)
    assert any(msg == "loop closure" for _, msg in back.tags)


def test_viewer_cli(tmp_path):
    rec = tiny_recording()
    f = tmp_path / "rec.zip"
    rec.save(f)
    viewer.main(["-f", str(f), "-o", str(tmp_path / "out.png")])
    assert (tmp_path / "out.png").exists()


def test_avi_roundtrip(tmp_path):
    """MJPEG AVI writer/reader roundtrip (io/avi.py; the reference's
    sidebar.avi capability, Util.cs:297-378)."""
    from monorfs_tpu.io import avi

    frames = [
        np.full((32, 48, 3), 40 * i, np.uint8) for i in range(4)
    ]
    f = tmp_path / "test.avi"
    n = avi.write_mjpeg(str(f), frames, fps=15)
    jpegs = avi.read_mjpeg(str(f))
    dec = avi.decode_frames(jpegs)
    assert n == 4 and len(jpegs) == 4
    assert dec[0].shape == (32, 48, 3)
    # MJPEG payloads are plain JPEGs
    assert all(j[:2] == b"\xff\xd8" for j in jpegs)
    # grayscale levels survive the lossy roundtrip approximately
    assert abs(int(dec[2].mean()) - 80) < 8


def test_export_avi_and_sidebar(tmp_path):
    rec = tiny_recording()
    out = tmp_path / "replay.avi"
    viewer.export_avi(rec, str(out), stride=2, fps=5)
    from monorfs_tpu.io import avi

    assert len(avi.read_mjpeg(str(out))) == 3

    # recording with an embedded sidebar video roundtrips through the zip
    import io as _io

    buf = _io.BytesIO()
    avi.write_mjpeg(buf, [np.zeros((8, 8), np.uint8)], fps=1)
    rec.sidebar = buf.getvalue()
    f = tmp_path / "rec.zip"
    rec.save(f)
    back = Recording.load(f)
    assert back.sidebar == rec.sidebar
    sout = tmp_path / "side.avi"
    viewer.main(["-f", str(f), "--sidebar", str(sout)])
    assert len(avi.read_mjpeg(str(sout))) == 1
