#!/usr/bin/env python
"""iSAM2-equivalent benchmark: frames/s of the graph-SLAM navigator
(Mahalanobis association + bucketed warm-started Gauss-Newton) on the 3D
pixel-range sim world — the BASELINE configs[3]-shaped backend load.

Prints ONE JSON line (same schema as bench.py)."""

import json
import pathlib
import sys
import time

HERE = pathlib.Path(__file__).parent
sys.path.insert(0, str(HERE))


def main_scan():
    """--scan: the fully-jitted known-DA graph backend on the default device
    (the TPU when the tunnel is up) in float32 — one lax.scan over frames,
    no host round-trips (slam/isam2_scan.py; reference known-DA config
    chap4/known.cfg, isam2.cpp:199-246)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(HERE / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from monorfs_tpu.config import Config
    from monorfs_tpu.io import World, parse_commands
    from monorfs_tpu.slam.isam2_scan import build_isam2_scan_runner

    frames = int(sys.argv[sys.argv.index("--frames") + 1]) \
        if "--frames" in sys.argv else 300
    cfg = Config()
    world = World.from_file(HERE / "assets" / "sim3d.world")
    cmds = np.stack([
        c[:6] for c in parse_commands((HERE / "assets" / "mov3d.in").read_text())
    ])
    reps = int(np.ceil(frames / len(cmds)))
    cmds = jnp.asarray(np.tile(cmds, (reps, 1))[:frames], jnp.float32)

    runner, carry, model = build_isam2_scan_runner(
        cfg, world, frames=frames, gn_iters=1, dtype=jnp.float32
    )
    t0 = time.perf_counter()
    _, (tp, ep) = runner(carry, cmds)
    np.asarray(ep)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, (tp, ep) = runner(carry, cmds)
    tp, ep = np.asarray(tp), np.asarray(ep)
    elapsed = time.perf_counter() - t0
    fps = frames / elapsed
    ate = float(np.sqrt(np.mean(np.sum((tp[:, :3] - ep[:, :3]) ** 2, -1))))
    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "frames/sec isam2-equivalent 3D sim (jitted scan, known DA)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))
    print(json.dumps({"detail": {
        "frames": frames, "elapsed_s": round(elapsed, 4),
        "compile_s": round(compile_s, 2), "ate_rmse_loc": round(ate, 4),
        "backend": dev.platform, "device": str(dev.device_kind),
        "dtype": "float32", "gn_iters_per_frame": 1,
    }}), file=sys.stderr)


def main_scan_da():
    """--scan-da: the fully-jitted MAHALANOBIS-DA graph backend — gated
    J Sigma J^T + R log-profit matrix, epsilon-scaled auction assignment,
    candidate lifecycle, warm-started GN, amortized marginals — compiled
    into one lax.scan (slam/isam2_scan_da.py; the reference's DEFAULT
    chap4 configuration, ISAM2Navigator.cs:256-441 + isam2.cpp:199-312,
    which the host-interactive path below runs at ~2 fps)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(HERE / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from monorfs_tpu.config import Config
    from monorfs_tpu.io import World, parse_commands
    from monorfs_tpu.metrics.errors import ospa
    from monorfs_tpu.slam.isam2_scan_da import build_mahalanobis_scan

    frames = int(sys.argv[sys.argv.index("--frames") + 1]) \
        if "--frames" in sys.argv else 300
    variant = sys.argv[sys.argv.index("--variant") + 1] \
        if "--variant" in sys.argv else "default"
    cfg = Config.from_file(
        HERE / "experiments" / "configs" / f"chap4-{variant}.cfg"
    )
    world = World.from_file(HERE / "assets" / "sim3d.world")
    cmds = np.stack([
        c[:6] for c in parse_commands((HERE / "assets" / "mov3d.in").read_text())
    ])
    reps = int(np.ceil(frames / len(cmds)))
    cmds = jnp.asarray(np.tile(cmds, (reps, 1))[:frames], jnp.float32)

    # size the static clutter slots to the config's Poisson cap
    # (floor(10 * lambda); the builder asserts otherwise)
    import math

    from monorfs_tpu.sim.simulation import model_for_config

    model_pre = model_for_config(cfg, world)
    lam = float(cfg.clutter_density) * float(
        model_pre.volume(model_pre.params)
    )
    max_clutter = max(8, int(math.floor(10 * lam)) + 1)
    runner, carry, model = build_mahalanobis_scan(
        cfg, world, frames=frames, dtype=jnp.float32,
        max_clutter=max_clutter,
    )
    t0 = time.perf_counter()
    _, (tp, ep, nlm) = runner(carry, cmds)
    np.asarray(ep)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_carry, (tp, ep, nlm) = runner(carry, cmds)
    tp, ep = np.asarray(tp), np.asarray(ep)
    elapsed = time.perf_counter() - t0
    fps = frames / elapsed
    ate = float(np.sqrt(np.mean(np.sum((tp[:, :3] - ep[:, :3]) ** 2, -1))))
    lm_mask = np.asarray(out_carry.gstate.lm_mask)
    lms = np.asarray(out_carry.gstate.landmarks)[lm_mask]
    o = float(ospa(lms, np.asarray(world.landmarks), c=1.0)[0])
    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "frames/sec isam2-equivalent 3D sim "
                  f"(jitted scan, Mahalanobis DA, {variant})",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))
    print(json.dumps({"detail": {
        "frames": frames, "elapsed_s": round(elapsed, 4),
        "compile_s": round(compile_s, 2), "ate_rmse_loc": round(ate, 4),
        "final_landmarks": int(lm_mask.sum()),
        "true_landmarks": len(world.landmarks),
        "final_ospa": round(o, 4),
        "backend": dev.platform, "device": str(dev.device_kind),
        "dtype": "float32", "gn_iters_per_frame": 1,
    }}), file=sys.stderr)


def main():
    import jax

    # the graph solver is a host-interactive path (per-frame association +
    # warm-started GN in float64), exactly like the reference's CPU gtsam
    # backend -- through the remote-TPU tunnel every small call pays the
    # wire latency and f32 loses the normal equations' conditioning, so
    # this bench pins CPU/f64 (the PHD bench, bench.py, owns the TPU path)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", str(HERE / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from monorfs_tpu.config import Config
    from monorfs_tpu.io import World, parse_commands
    from monorfs_tpu.metrics import ate_location, rmse
    from monorfs_tpu.sim import Simulation

    frames = int(sys.argv[sys.argv.index("--frames") + 1]) \
        if "--frames" in sys.argv else 200

    cfg = Config()  # PRM3D defaults
    world = World.from_file(HERE / "assets" / "sim3d.world")
    commands = parse_commands(
        (HERE / "assets" / "mov3d.in").read_text()
    )[:frames]
    sim = Simulation(cfg, world, commands, algorithm="isam2", particles=1,
                     dtype=np.float64)

    # warm-up: first frames trigger the bucket compilations
    for cmd in commands[:10]:
        sim.step(cmd)
    t0 = time.perf_counter()
    for cmd in commands[10:]:
        sim.step(cmd)
    elapsed = time.perf_counter() - t0
    fps = (len(commands) - 10) / elapsed

    est = [(t, f["poses"][f["best"]]) for t, f in
           zip([w[0] for w in sim.waypoints], sim.frames)]
    ate = rmse(ate_location(est, sim.waypoints))
    realtime_fps = 30.0
    print(json.dumps({
        "metric": "frames/sec isam2-equivalent 3D sim",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / realtime_fps, 3),
    }))
    print(json.dumps({"detail": {"frames": len(commands),
                                 "ate_rmse_loc": round(float(ate), 4)}}),
          file=sys.stderr)


if __name__ == "__main__":
    if "--scan-da" in sys.argv:
        main_scan_da()
    elif "--scan" in sys.argv:
        main_scan()
    else:
        main()
