#!/usr/bin/env python
"""BASELINE configs[4] flagship demo: 100k particles + 10k landmarks with
the distributed Schur BA, on whatever mesh is available.

Measures:
  1. sharded PHD SLAM step throughput at --particles (default 100k) on an
     N-device `particles` mesh (N = all available devices);
  2. distributed Schur-complement BA over --landmarks (default 10k) on an
     N-device `landmarks` mesh, per-GN-iteration time;
  3. scaling efficiency: time(1 device) / (N * time(N devices)) for both,
     on the same global problem (strong scaling).

On the single-TPU bench host run with N=1 (throughput only); for the
multi-device numbers run under the virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_flagship.py --particles 8192 --landmarks 10240

Prints one JSON line per measurement.
"""

import argparse
import json
import pathlib
import sys
import time

HERE = pathlib.Path(__file__).parent
sys.path.insert(0, str(HERE))


def big_world(n_landmarks, seed=0):
    """10k-landmark synthetic world: landmarks uniform in a slab the 3D
    camera sweeps through (the scene scale of BASELINE configs[4])."""
    import numpy as np

    rng = np.random.default_rng(seed)
    lms = np.column_stack([
        rng.uniform(-50.0, 50.0, n_landmarks),
        rng.uniform(-50.0, 50.0, n_landmarks),
        rng.uniform(-50.0, 50.0, n_landmarks),
    ])
    return lms


def bench_phd(particles, n_devices, steps=20):
    """Sharded full SLAM step at scale; returns per-step seconds."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monorfs_tpu.config import Config
    from monorfs_tpu.models import get as get_model
    from monorfs_tpu.parallel import make_mesh, make_sharded_step, shard_state
    from monorfs_tpu.slam import phd

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices=devices)
    cfg = Config()
    model = get_model("PRM3D")
    pcfg = phd.PHDConfig(
        num_particles=particles,
        max_components=128,
        max_measurements=48,
        gate_top=8,
        estimate_cap=48,
        beam_width=32,
        beam_meas_cap=24,
        beam_candidates=6,
        merge_rounds=4,
    )
    params = cfg.phd_params(np.float32)
    state = phd.init_state(model, pcfg, np.array([0, 0, 0, 1, 0, 0, 0]),
                           jnp.float32)
    state = shard_state(state, mesh)
    step = make_sharded_step(model, pcfg, mesh, slam=True)

    rng = np.random.default_rng(1)
    z = np.zeros((48, 3), np.float32)
    z[:12] = np.column_stack([
        rng.uniform(-200, 200, 12), rng.uniform(-150, 150, 12),
        rng.uniform(0.3, 1.8, 12),
    ])
    z_mask = np.arange(48) < 12
    odo = np.zeros(6, np.float32)
    key = jax.random.PRNGKey(0)

    state = step(params, state, odo, z, z_mask, key)  # compile
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state = step(params, state, odo, z, z_mask, sub)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / steps


def bench_ba(n_landmarks, n_devices, n_poses=128, iters=3, factors_per_pose=64):
    """Distributed Schur BA at scale; returns per-GN-iteration seconds."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monorfs_tpu.models import get as get_model
    from monorfs_tpu.parallel import dist_ba

    model = get_model("PRM3D")
    devices = jax.devices()[:n_devices]
    mesh = dist_ba.make_landmark_mesh(n_devices, devices=devices)

    lms = big_world(n_landmarks).astype(np.float32)
    rng = np.random.default_rng(2)
    n_factors = n_poses * factors_per_pose
    f_cap = ((n_factors * 2 + n_devices - 1) // n_devices) * n_devices
    dcfg = dist_ba.DistBAConfig(
        max_poses=n_poses, max_landmarks=n_landmarks, max_factors=f_cap,
        gn_iters=iters,
    )

    poses = np.tile(np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
                    (n_poses, 1))
    poses[:, 0] = np.linspace(0, 10, n_poses)
    f_pose = rng.integers(0, n_poses, n_factors).astype(np.int32)
    f_lm = rng.integers(0, n_landmarks, n_factors).astype(np.int32)
    # exact synthetic measurements at the true geometry
    f_z = np.asarray(jax.vmap(
        lambda p, j: model.measure(model.params, jnp.asarray(poses)[p],
                                   jnp.asarray(lms)[j])
    )(jnp.asarray(f_pose), jnp.asarray(f_lm))).astype(np.float32)
    f_mask = np.ones(n_factors, bool)

    fp, fl, fz, fm = dist_ba.partition_factors(
        dcfg, n_devices, f_pose, f_lm, f_z, f_mask
    )
    slms, slmask, fp, fl, fz, fm = dist_ba.shard_ba_inputs(
        mesh, "landmarks", jnp.asarray(lms), np.ones(n_landmarks, bool),
        fp, fl, jnp.asarray(fz), fm,
    )
    solve = dist_ba.make_dist_gauss_newton(model, dcfg, mesh)
    minfo = jnp.asarray(np.eye(6, dtype=np.float32) * 1e2)
    sinfo = jnp.asarray(np.diag([1 / 3.0, 1 / 3.0, 1 / 2e-4]).astype(np.float32))
    between = np.zeros((n_poses, 6), np.float32)
    between[1:, 0] = 10.0 / (n_poses - 1)
    bmask = np.ones(n_poses, bool)
    bmask[0] = False
    args = (
        jnp.asarray(poses), jnp.int32(n_poses),
        np.zeros(n_poses, bool) | (np.arange(n_poses) == 0),
        jnp.asarray(between), bmask,
        slms, slmask, fp, fl, fz, fm, minfo, sinfo,
    )
    out = solve(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = solve(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--landmarks", type=int, default=10_240)
    ap.add_argument("--poses", type=int, default=128)
    ap.add_argument("--scaling", action="store_true",
                    help="also measure 1-device times for efficiency")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force an N-device virtual CPU mesh (the axon "
                         "sitecustomize ignores JAX_PLATFORMS/XLA_FLAGS; "
                         "only jax.config works)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)
    jax.config.update("jax_compilation_cache_dir", str(HERE / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n = len(jax.devices())

    # BASELINE configs[4] is a multi-host config: 100k particles need
    # ~54 GB of HBM and a single v5e chip has 15.75 -- on small meshes,
    # halve until the step fits and report the achieved per-mesh capacity
    # (the particle axis is embarrassingly shardable, so the 100k config
    # is the reported capacity x the mesh size it doesn't fit on).
    particles = args.particles
    t_phd = None
    while particles >= 1024:
        try:
            t_phd = bench_phd(particles, n)
            break
        except Exception as e:  # noqa: BLE001 - XLA OOM surfaces as RuntimeError
            if "memory" not in str(e).lower() and "hbm" not in str(e).lower():
                raise
            particles //= 2
    if t_phd is None:
        raise RuntimeError(
            f"sharded PHD step OOMed at every particle count down to 1024 "
            f"on {n} device(s); nothing to report"
        )
    print(json.dumps({
        "metric": "sharded PHD step", "particles": particles,
        "requested_particles": args.particles,
        "devices": n, "step_ms": round(t_phd * 1e3, 2),
        "fps": round(1.0 / t_phd, 2),
        "particle_updates_per_s": round(particles / t_phd),
    }), flush=True)

    t_ba = bench_ba(args.landmarks, n, n_poses=args.poses)
    print(json.dumps({
        "metric": "distributed Schur BA", "landmarks": args.landmarks,
        "poses": args.poses, "devices": n,
        "gn_iter_ms": round(t_ba * 1e3, 2),
    }), flush=True)

    if args.scaling and n > 1:
        t_phd1 = bench_phd(args.particles, 1)
        t_ba1 = bench_ba(args.landmarks, 1, n_poses=args.poses)
        print(json.dumps({
            "metric": "strong-scaling efficiency",
            "devices": n,
            "phd_efficiency": round(t_phd1 / (n * t_phd), 3),
            "ba_efficiency": round(t_ba1 / (n * t_ba), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
