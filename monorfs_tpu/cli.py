"""monorfs-tpu command-line interface.

Mirrors the reference CLI flags (reference: mono-rfs/Program.cs:114-131):
  -f/--file scene or recording input, -c/--command command file,
  -r/--record output recording, -a/--algorithm phd|odometry|isam2|loopy,
  -p/--particles N, -y/--onlymapping, -g/--config cfg file,
  -i/--input simulation|record, -x/--headless (always true here),
  plus --seed and --dtype extensions.
"""

import argparse
import sys
import time

import numpy as np


def build_parser():
    ap = argparse.ArgumentParser(
        prog="monorfs-tpu", description="TPU-native RFS-SLAM runner"
    )
    ap.add_argument("-f", "--file", required=True, help="scene world file or recording zip")
    ap.add_argument("-c", "--command", default=None, help="command (.in) file")
    ap.add_argument("-r", "--record", default=None, help="output recording zip")
    ap.add_argument("-a", "--algorithm", default="phd",
                    choices=["phd", "odometry", "isam2", "loopy"])
    ap.add_argument("-p", "--particles", type=int, default=1)
    ap.add_argument("-y", "--onlymapping", action="store_true")
    ap.add_argument("-g", "--config", default=None, help="cfg file")
    ap.add_argument("-i", "--input", default="simulation",
                    choices=["simulation", "record", "kinect"])
    ap.add_argument("-x", "--headless", action="store_true", default=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", default="float32", choices=["float32", "float64"])
    ap.add_argument("--progress", action="store_true")
    ap.add_argument("--checkpoint", default=None,
                    help="periodic checkpoint recording file")
    ap.add_argument("--frames", type=int, default=None,
                    help="cap the number of frames to run")
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.dtype == "float64":
        import jax

        jax.config.update("jax_enable_x64", True)

    from .config import Config
    from .io import Recording, World, parse_commands
    from .sim import Simulation

    cfg = Config()
    rec = None
    kinect_source = None
    # config precedence (Program.cs:158-177): explicit -g > recording-embedded
    # > defaults -- resolved BEFORE any consumer is constructed, so a -g
    # KinectDelta/KeypointFilter reaches the KinectSource (round-2 bug: the
    # source was built from the defaults before -g was loaded)
    if args.input == "record":
        rec = Recording.load(args.file)
        cfg.apply_descriptor(rec.config_text.splitlines())
    if args.config:
        cfg = Config.from_file(args.config)

    if args.input == "kinect":
        from .frontend.dataset import RGBDDataset
        from .frontend.kinect import KinectSource
        from .models.kinect_model import Params as KinectParams

        kinect_source = KinectSource(
            RGBDDataset(args.file), delta=cfg.kinect_delta
        )
        # camera intrinsics + sensor geometry in the subsampled image frame
        d = cfg.kinect_delta
        cam = KinectParams()
        sub = KinectParams(
            focal=cam.focal / d,
            film_left=cam.film_left / d,
            film_top=cam.film_top / d,
            film_width=cam.film_width / d,
            film_height=cam.film_height / d,
            range_min=cam.range_min,
            range_max=cam.range_max,
            res_x=cam.res_x / d,
            res_y=cam.res_y / d,
            border=max(1, cam.border // d),
        )
        world = World(
            pose=np.array([0, 0, 0, 1, 0, 0, 0.0]),
            landmarks=np.zeros((0, 3)),
            measurer_params=np.array(sub.to_linear()),
        )
        commands = (
            parse_commands(open(args.command).read()) if args.command else []
        )
    elif args.input == "record":
        world = rec.world
        commands = []
    else:
        world = World.from_file(args.file)
        commands = (
            parse_commands(open(args.command).read()) if args.command else []
        )

    if not args.config and args.input != "record":
        # no explicit config: infer the model family from the world's pose
        # dimension (the reference requires `Model:` in the cfg; inferring
        # keeps bare runs working for every family)
        dim_model = {1: "Linear1D", 2: "Linear2D", 7: "PRM3D"}
        inferred = dim_model.get(len(world.pose))
        if inferred and inferred != cfg.model:
            cfg.set_model_defaults(inferred)

    dtype = np.float64 if args.dtype == "float64" else np.float32
    if args.frames is not None:
        commands = commands[: args.frames]
        if rec is not None:
            rec.odometry = rec.odometry[: args.frames]
            rec.trajectory = rec.trajectory[: args.frames]
            rec.measurements = rec.measurements[: args.frames]
            # estimate history must shrink with the cap too: the loopy
            # navigator sizes its pose chain from the final estimate
            # snapshot and indexes odometry[node + 1] across it
            rec.estimate = [
                (t, traj[: args.frames])
                for t, traj in rec.estimate[: args.frames]
            ]

    t0 = time.time()
    sim = Simulation(
        cfg,
        world,
        commands,
        algorithm=args.algorithm,
        particles=args.particles,
        onlymapping=args.onlymapping,
        seed=args.seed,
        dtype=dtype,
        replay=rec,
        kinect_source=kinect_source,
    )

    # SIGINT -> graceful abort + save (Program.cs:65-87 dedicated thread)
    import signal

    abort = [False]
    prev_handler = signal.getsignal(signal.SIGINT)

    def _on_sigint(signum, frame):
        abort[0] = True

    try:
        signal.signal(signal.SIGINT, _on_sigint)
    except ValueError:
        pass  # non-main thread
    try:
        sim.run(progress=args.progress, checkpoint_file=args.checkpoint,
                abort_flag=abort)
    finally:
        try:
            signal.signal(signal.SIGINT, prev_handler)
        except ValueError:
            pass
    elapsed = time.time() - t0
    print(f"finished running ({elapsed:.4f} s)")

    if args.record:
        sim.save(args.record)
        print(f"recording written to {args.record}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
