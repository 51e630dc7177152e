"""3D recording viewer: the Manipulator-layer scene rendering, headless.

The reference renders recordings as live 3D scenes: orbit/zoom camera
(Manipulator.cs:488-543), map ellipsoids from the covariance
eigendecomposition (Navigator.cs:313-390), the camera FOV frustum
(PRM3DMeasurer.cs:400-485), trajectories and measurement rays
(DrawUtils.cs:45-71, Vehicle.cs:377-492). This module reproduces that scene
with matplotlib's 3D axes: `render_3d` draws one frame to PNG,
`interactive_3d` adds a timeline slider on top of matplotlib's built-in
orbit/zoom mouse camera, and the screenshot-tag batch mode renders every
tagged frame (Viewer.cs:214).

2D worlds keep the top-down viewer (viewer.py); `monorfs_tpu.viewer` routes
3D recordings here automatically.
"""

import numpy as np

from .io.recording import Recording


def _ellipsoid_wires(mean, cov, nsigma=5.0, points=24):
    """Three principal 5-sigma ellipse rings of a 3D covariance
    (the wireframe equivalent of Navigator.cs:313-390's shaded ellipsoid)."""
    c = np.asarray(cov, float)
    if c.shape[0] < 3:
        c3 = np.eye(3) * 1e-12
        c3[: c.shape[0], : c.shape[1]] = c
        c = c3
    m = np.zeros(3)
    m[: len(mean)] = np.asarray(mean, float)[:3]
    w, v = np.linalg.eigh((c + c.T) / 2)
    w = np.sqrt(np.maximum(w, 0.0)) * nsigma
    t = np.linspace(0, 2 * np.pi, points)
    cs, sn = np.cos(t), np.sin(t)
    rings = []
    for a, b in ((0, 1), (0, 2), (1, 2)):
        pts = (
            m[:, None]
            + v[:, a : a + 1] * (w[a] * cs)[None, :]
            + v[:, b : b + 1] * (w[b] * sn)[None, :]
        )
        rings.append(pts)
    return rings


def _quat_matrix(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _frustum_lines(pose, mparams):
    """Camera FOV frustum edges at `pose` (PRM3DMeasurer.cs:400-485):
    near/far rectangles through the film corners plus connecting edges.

    mparams: the world's linear measurer descriptor
    [focal, range_min, range_max, film_left, film_top, film_w, film_h]
    (PRM3DMeasurer.cs:92-96)."""
    if mparams is None or len(mparams) < 7:
        return []
    f, rmin, rmax, left, top, fw, fh = [float(v) for v in mparams[:7]]
    right, bottom = left + fw, top + fh
    loc = np.asarray(pose[:3], float)
    rot = _quat_matrix(np.asarray(pose[3:7], float))
    corners = [(left, top), (right, top), (right, bottom), (left, bottom)]
    lines = []
    rects = []
    for depth in (rmin, rmax):
        ring = []
        for px, py in corners:
            d = np.array([px / f, py / f, 1.0]) * depth
            ring.append(loc + rot @ d)
        rects.append(ring)
        ring_c = ring + [ring[0]]
        lines.extend(
            np.stack([a, b], axis=1) for a, b in zip(ring_c, ring_c[1:])
        )
    for a, b in zip(rects[0], rects[1]):
        lines.append(np.stack([a, b], axis=1))
    return lines


def _scene_3d(ax, rec: Recording, fi, show_measurements=True,
              frustum=True):
    truth = np.array([s[:3] for _, s in rec.trajectory])
    ax.plot(truth[:, 0], truth[:, 1], truth[:, 2], "k-", lw=1.2,
            label="groundtruth")

    if rec.estimate:
        j = min(fi, len(rec.estimate) - 1)
        snap = rec.estimate[j][1]
        est = np.array([v[:3] for _, v in snap])
        if est.size:
            ax.plot(est[:, 0], est[:, 1], est[:, 2], "b-", lw=1.0,
                    label="estimate")

    lm = rec.world.landmarks
    if lm.size:
        ax.scatter(lm[:, 0], lm[:, 1], lm[:, 2], marker="*", s=40,
                   c="k", label="landmarks")

    if rec.maps and 0 <= fi < len(rec.maps):
        for w, mean, cov in rec.maps[fi][1]:
            if w < 0.5:
                continue
            for ring in _ellipsoid_wires(mean, cov):
                ax.plot(ring[0], ring[1], ring[2], "g-", lw=0.5, alpha=0.7)

    pose = None
    if rec.trajectory:
        pose = rec.trajectory[min(fi, len(rec.trajectory) - 1)][1]
    if pose is not None and len(pose) >= 7:
        if frustum:
            for seg in _frustum_lines(pose, rec.world.measurer_params):
                ax.plot(seg[0], seg[1], seg[2], "-", color="orange",
                        lw=0.6, alpha=0.8)
        if show_measurements and rec.measurements and fi < len(
            rec.measurements
        ):
            mp = rec.world.measurer_params
            if mp is not None and len(mp) >= 7:
                f = float(mp[0])
                loc = np.asarray(pose[:3], float)
                rot = _quat_matrix(np.asarray(pose[3:7], float))
                for z in rec.measurements[fi][1]:
                    if len(z) < 3:
                        continue
                    px, py, rng = float(z[0]), float(z[1]), float(z[2])
                    d = np.array([px / f, py / f, 1.0])
                    d = d / np.linalg.norm(d) * abs(rng)
                    tip = loc + rot @ d
                    ax.plot([loc[0], tip[0]], [loc[1], tip[1]],
                            [loc[2], tip[2]], "r-", lw=0.4, alpha=0.5)

    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    # equal aspect: bound the scene cube
    pts = [truth]
    if lm.size:
        pts.append(lm)
    allp = np.concatenate(pts, axis=0)
    ctr = (allp.max(axis=0) + allp.min(axis=0)) / 2
    rad = max(float((allp.max(axis=0) - allp.min(axis=0)).max()) / 2, 1e-3)
    ax.set_xlim(ctr[0] - rad, ctr[0] + rad)
    ax.set_ylim(ctr[1] - rad, ctr[1] + rad)
    ax.set_zlim(ctr[2] - rad, ctr[2] + rad)


def render_3d(rec: Recording, output, frame=None, elev=25.0, azim=-60.0,
              show_measurements=True):
    """Render one 3D scene frame to `output` (png path or file-like)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fi = len(rec.maps) - 1 if frame is None else frame
    fig = plt.figure(figsize=(8, 7))
    ax = fig.add_subplot(projection="3d")
    ax.view_init(elev=elev, azim=azim)
    _scene_3d(ax, rec, fi, show_measurements=show_measurements)
    ax.legend(loc="upper left", fontsize=8)
    ax.set_title(f"frame {fi}")
    fig.savefig(output, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return output


def render_frames_3d(rec: Recording, outdir, stride=10):
    """Screenshot batch mode (Viewer.cs:214): every stride-th frame."""
    import os

    os.makedirs(outdir, exist_ok=True)
    outs = []
    for i in range(0, max(len(rec.maps), 1), stride):
        out = f"{outdir}/frame_{i:05d}.png"
        render_3d(rec, out, frame=i)
        outs.append(out)
    return outs


def render_tagged_3d(rec: Recording, outdir):
    """Screenshot-TAG mode: one render per tag, at the tag's frame
    (the reference's scripted `screenshot` command tags,
    Simulation.cs:575-617 + Viewer.cs:214)."""
    import os
    import re

    os.makedirs(outdir, exist_ok=True)
    times = [t for t, _ in rec.maps]
    outs = []
    for t, msg in rec.tags:
        fi = int(np.searchsorted(times, t)) if times else 0
        fi = min(fi, max(len(times) - 1, 0))
        slug = re.sub(r"[^A-Za-z0-9_-]+", "_", msg)[:40] or "tag"
        out = f"{outdir}/tag_{t:08.3f}_{slug}.png"
        render_3d(rec, out, frame=fi)
        outs.append(out)
    return outs


def interactive_3d(rec: Recording):
    """Timeline-scrub 3D viewer: matplotlib's built-in mouse orbit/zoom is
    the Manipulator's camera (drag = orbit, scroll = zoom,
    Manipulator.cs:488-543); the slider + arrow keys scrub frames."""
    import matplotlib

    try:
        matplotlib.use("TkAgg")
    except Exception:
        pass
    import matplotlib.pyplot as plt
    from matplotlib.widgets import Slider

    n = max(len(rec.maps), 1)
    fig = plt.figure(figsize=(9, 8))
    ax = fig.add_subplot(projection="3d")
    sax = fig.add_axes([0.12, 0.03, 0.76, 0.03])
    slider = Slider(sax, "frame", 0, n - 1, valinit=n - 1, valstep=1)

    def draw(val):
        fi = int(val)
        elev, azim = ax.elev, ax.azim  # keep the user's camera
        ax.clear()
        ax.view_init(elev=elev, azim=azim)
        _scene_3d(ax, rec, fi)
        ax.set_title(f"frame {fi} / {n - 1}")
        fig.canvas.draw_idle()

    slider.on_changed(draw)

    def on_key(event):
        v = int(slider.val)
        if event.key == "right":
            slider.set_val(min(v + 1, n - 1))
        elif event.key == "left":
            slider.set_val(max(v - 1, 0))
        elif event.key == " ":
            slider.set_val(n - 1)

    fig.canvas.mpl_connect("key_press_event", on_key)
    draw(n - 1)
    plt.show()
