"""Recording viewer: replay + rendering of recording zips.

Headless re-design of the reference Viewer
(reference: mono-rfs-lib/UI/Viewer.cs:58-649 + Manipulator draw pipeline):
replays a recording frame by frame, rendering the groundtruth trajectory,
the estimate, the measurement rays, and the map's 5-sigma covariance
ellipses (Navigator.cs:313-390 eigendecomposition rendering) to PNG frames
or a single overview figure. Tag editing round-trips through the recording
format (Viewer tag workflow, Program.cs:249-268).
"""

import argparse
import sys

import numpy as np

from .io.recording import Recording


def _ellipse(mean, cov, nsigma=5.0, points=32):
    """5-sigma ellipse polyline of a 2D (or top-2x2 of 3D) covariance
    (Navigator.cs:313-390)."""
    c = np.asarray(cov)[:2, :2]
    w, v = np.linalg.eigh(c)
    w = np.maximum(w, 0)
    t = np.linspace(0, 2 * np.pi, points)
    circle = np.stack([np.cos(t), np.sin(t)])
    pts = v @ (np.sqrt(w)[:, None] * circle) * nsigma
    return mean[0] + pts[0], mean[1] + pts[1]


def render_overview(rec: Recording, output, frame=None, show_measurements=True):
    """Render one overview figure: groundtruth + estimate trajectories,
    landmarks, map ellipses (and the selected frame's measurements)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))

    truth = np.array([s[:2] if len(s) < 7 else s[:2] for _, s in rec.trajectory])
    ax.plot(truth[:, 0], truth[:, 1], "k-", lw=1.2, label="groundtruth")

    if rec.estimate:
        est = np.array(
            [traj[-1][1][:2] for _, traj in rec.estimate if traj]
        )
        ax.plot(est[:, 0], est[:, 1], "b-", lw=1.0, label="estimate")

    if rec.world.landmarks.size:
        lm = rec.world.landmarks
        ax.plot(lm[:, 0], lm[:, 1], "k*", ms=8, label="landmarks")

    fi = len(rec.maps) - 1 if frame is None else frame
    if rec.maps and 0 <= fi < len(rec.maps):
        for w, mean, cov in rec.maps[fi][1]:
            if w < 0.5:
                continue
            ex, ey = _ellipse(mean, cov)
            ax.plot(ex, ey, "g-", lw=0.7, alpha=0.8)
            ax.plot(mean[0], mean[1], "g+", ms=6)

    if show_measurements and rec.measurements and 0 <= fi < len(rec.measurements):
        t, zs = rec.measurements[fi]
        pose = truth[min(fi, len(truth) - 1)]
        for z in zs:
            if len(z) >= 2:
                ax.plot(
                    [pose[0], pose[0] + z[0]],
                    [pose[1], pose[1] + z[1]],
                    "r-", lw=0.4, alpha=0.5,
                )

    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    ax.set_title(f"frame {fi}")
    fig.savefig(output, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return output


def render_frames(rec: Recording, outdir, stride=10):
    """Screenshot mode: render every `stride`-th frame
    (Viewer.cs screenshot-tag batch mode, :214-)."""
    import os

    os.makedirs(outdir, exist_ok=True)
    outputs = []
    for i in range(0, len(rec.maps), stride):
        out = f"{outdir}/frame_{i:05d}.png"
        render_overview(rec, out, frame=i)
        outputs.append(out)
    return outputs


def add_tag(rec: Recording, time, message):
    """Insert a tag (Viewer tag editing)."""
    rec.tags.append((float(time), message))
    rec.tags.sort(key=lambda x: x[0])


def _frame_image(rec: Recording, frame):
    """Render one overview frame to an RGB uint8 array (offscreen)."""
    import io as _io

    import matplotlib

    matplotlib.use("Agg")
    from PIL import Image

    buf = _io.BytesIO()
    render_overview(rec, buf, frame=frame)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB"))


def export_avi(rec: Recording, output, stride=5, fps=10):
    """Render the replay to an MJPEG AVI (the video the reference Viewer
    plays interactively; Util.SaveAsAvi, Util.cs:340-378)."""
    from .io import avi

    frames = [
        _frame_image(rec, i) for i in range(0, len(rec.maps), stride)
    ]
    if not frames:
        raise ValueError("recording has no map frames to render")
    # pad to uniform size (bbox_inches='tight' can vary by a pixel)
    h = min(f.shape[0] for f in frames)
    w = min(f.shape[1] for f in frames)
    avi.write_mjpeg(output, [f[:h, :w] for f in frames], fps=fps)
    return output


def export_sidebar(rec: Recording, output):
    """Extract the embedded sensor-view video (sidebar.avi) to a file."""
    if not rec.sidebar:
        raise ValueError("recording has no sidebar video")
    with open(output, "wb") as f:
        f.write(rec.sidebar)
    return output


def interactive(rec: Recording):
    """Timeline-scrub viewer (the reference Viewer's interactive mode,
    Viewer.cs:58-649): a matplotlib window with a frame slider;
    left/right arrows step, space jumps to the end. Requires a display."""
    import matplotlib

    try:
        matplotlib.use("TkAgg")
    except Exception:
        pass
    import matplotlib.pyplot as plt
    from matplotlib.widgets import Slider

    n = max(len(rec.maps), 1)
    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_axes([0.08, 0.15, 0.88, 0.8])
    sax = fig.add_axes([0.08, 0.04, 0.8, 0.04])
    slider = Slider(sax, "frame", 0, n - 1, valinit=n - 1, valstep=1)

    truth = np.array([s[:2] for _, s in rec.trajectory])
    lm = rec.world.landmarks

    def draw(fi):
        fi = int(fi)
        ax.clear()
        ax.plot(truth[:, 0], truth[:, 1], "k-", lw=1.2, label="groundtruth")
        if rec.estimate and fi < len(rec.estimate):
            snap = rec.estimate[fi][1]
            est = np.array([v[:2] for _, v in snap])
            if est.size:
                ax.plot(est[:, 0], est[:, 1], "b-", lw=1.0, label="estimate")
        if lm.size:
            ax.plot(lm[:, 0], lm[:, 1], "k*", ms=8)
        if rec.maps and fi < len(rec.maps):
            for w, mean, cov in rec.maps[fi][1]:
                if w < 0.5:
                    continue
                ex, ey = _ellipse(mean, cov)
                ax.plot(ex, ey, "g-", lw=0.7, alpha=0.8)
        if rec.measurements and fi < len(rec.measurements):
            pose = truth[min(fi, len(truth) - 1)]
            for z in rec.measurements[fi][1]:
                if len(z) >= 2:
                    ax.plot([pose[0], pose[0] + z[0]],
                            [pose[1], pose[1] + z[1]],
                            "r-", lw=0.4, alpha=0.5)
        ax.set_aspect("equal")
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


def main(argv=None):
    ap = argparse.ArgumentParser(prog="monorfs-tpu-viewer")
    ap.add_argument("-f", "--file", required=True, help="recording zip")
    ap.add_argument("-o", "--output", default=None, help="output png")
    ap.add_argument("--frames", default=None, help="render frame dir")
    ap.add_argument("--stride", type=int, default=10)
    ap.add_argument("--frame", type=int, default=None)
    ap.add_argument("--tag", default=None, help="'time:message' tag to add")
    ap.add_argument("--avi", default=None, help="export replay to MJPEG AVI")
    ap.add_argument("--sidebar", default=None,
                    help="extract embedded sensor video (sidebar.avi)")
    ap.add_argument("--interactive", action="store_true",
                    help="timeline-scrub window (requires a display)")
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--three-d", dest="three_d", action="store_true",
                    default=None, help="force the 3D scene renderer "
                    "(viewer3d); default: auto for 3D worlds")
    ap.add_argument("--flat", dest="three_d", action="store_false",
                    help="force the 2D top-down renderer")
    ap.add_argument("--tag-shots", default=None,
                    help="screenshot-tag batch mode: render one frame per "
                    "tag into this directory (Viewer.cs:214)")
    args = ap.parse_args(argv)

    rec = Recording.load(args.file)
    is3d = args.three_d
    if is3d is None:
        is3d = rec.trajectory and len(rec.trajectory[0][1]) >= 7
    if is3d:
        from . import viewer3d

        if args.tag_shots:
            outs = viewer3d.render_tagged_3d(rec, args.tag_shots)
            print(f"{len(outs)} tag screenshots in {args.tag_shots}")
            return 0
        if args.interactive:
            viewer3d.interactive_3d(rec)
            return 0
        if args.frames:
            outs = viewer3d.render_frames_3d(rec, args.frames, args.stride)
            print(f"{len(outs)} 3D frames rendered to {args.frames}")
            return 0
        if not (args.tag or args.sidebar or args.avi):
            out = args.output or (args.file + ".3d.png")
            viewer3d.render_3d(rec, out, frame=args.frame)
            print(f"3D overview rendered to {out}")
            return 0
    if args.tag_shots:
        import os

        os.makedirs(args.tag_shots, exist_ok=True)
        times = [t for t, _ in rec.maps]
        import numpy as _np

        outs = []
        for t, msg in rec.tags:
            fi = int(_np.searchsorted(times, t)) if times else 0
            fi = min(fi, max(len(times) - 1, 0))
            out = f"{args.tag_shots}/tag_{t:08.3f}.png"
            render_overview(rec, out, frame=fi)
            outs.append(out)
        print(f"{len(outs)} tag screenshots in {args.tag_shots}")
        return 0
    if args.tag:
        t, msg = args.tag.split(":", 1)
        add_tag(rec, float(t), msg)
        rec.save(args.file)
        print(f"tag added at {t}: {msg}")
    if args.sidebar:
        export_sidebar(rec, args.sidebar)
        print(f"sidebar video written to {args.sidebar}")
        return 0
    if args.avi:
        export_avi(rec, args.avi, stride=args.stride, fps=args.fps)
        print(f"replay video written to {args.avi}")
        return 0
    if args.interactive:
        interactive(rec)
        return 0
    if args.frames:
        outs = render_frames(rec, args.frames, args.stride)
        print(f"{len(outs)} frames rendered to {args.frames}")
    else:
        out = args.output or (args.file + ".png")
        render_overview(rec, out, frame=args.frame)
        print(f"overview rendered to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
