#!/usr/bin/env python
"""Reference-scale experiment grid through the TPU float32 hot path.

The CPU grid (run_experiments.py) validates semantics at reduced scale in
float64; this grid runs the reference's actual operating points -- 800
particles for chap3/chap4 and the 20/100/800/2000 particle sweep
(reference: mono-rfs/plots/scripts/chap3/S1-phd-odometry.sh:13,
chap3/S4-particles.sh:14, chap4/S1-baseline.sh:13) -- in float32 on the
real chip, the deployment configuration.

Two kinds of numbers, measured separately on purpose:
  * accuracy artifacts (recording zips + postanalysis .data files) come
    from the Simulation driver (the same code path as the CPU grid, so the
    rows are directly comparable);
  * throughput comes from the fully-jitted scan runner (bench_core) at the
    same shapes -- the driver's host loop pays tunnel dispatch latency per
    frame that the compiled scan does not, so driver wall-clock would
    under-report the chip.

Usage:
  python experiments/run_tpu_grid.py chap3-s1 [--outdir out-tpu]
  python experiments/run_tpu_grid.py chap3-s4     # 20/100/800/2000 sweep
  python experiments/run_tpu_grid.py chap4-default
  python experiments/run_tpu_grid.py throughput   # scan-runner fps sweep
  python experiments/run_tpu_grid.py all
"""

import argparse
import json
import pathlib
import sys
import time

HERE = pathlib.Path(__file__).parent
ROOT = HERE.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(HERE))

import run_experiments as G  # noqa: E402  (shared runners; no _setup here)


def check_backend():
    import jax

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"WARNING: running the 'TPU grid' on backend={backend}",
              file=sys.stderr)
    return backend


def chap3_s1_tpu(outdir):
    return G.chap3_s1(outdir, particles=800)


def chap3_s4_tpu(outdir):
    return G.chap3_s4(outdir, sweep=(20, 100, 800, 2000))


def chap4_default_tpu(outdir, variant="default"):
    return G.chap4_s1(outdir, variant=variant, particles=800)


def chap4_noisy_tpu(outdir):
    return G.chap4_s1(outdir, variant="noisy", particles=800)


def chap4_cluttery_tpu(outdir):
    return G.chap4_s1(outdir, variant="cluttery", particles=800)


def chap5_s1_tpu(outdir):
    return G.chap5_s1(outdir)


def chap5_s2_tpu(outdir):
    return G.chap5_s2(outdir)


def chap5_k3_tpu(outdir):
    return G.chap5_k3(outdir)


def chap5_k4_tpu(outdir):
    return G.chap5_k4(outdir)


def throughput(outdir):
    """Scan-runner frames/s at the sweep particle counts (the wall-clock
    column for the accuracy rows above; one fused lax.scan per chunk, no
    per-frame host round trips)."""
    import jax.numpy as jnp

    from monorfs_tpu.bench_core import run_benchmark
    from monorfs_tpu.config import Config
    from monorfs_tpu.slam.phd import PHDConfig

    cfg = Config.from_file(HERE / "configs" / "chap3-default.cfg")
    stats = {}
    for p in (20, 100, 200, 800, 2000):
        pcfg = PHDConfig(
            num_particles=p,
            max_components=128,
            max_measurements=48,
            gate_top=8,
            estimate_cap=48,
            beam_width=32,
            beam_meas_cap=24,
            beam_candidates=6,
            merge_rounds=4,
            meas_compact=40,  # live-first compaction at the world's
            # visibility bound (40 landmarks; 24 truncated crowded frames
            # and cost ATE 0.020 -> 0.035 at 200 particles)
        )
        # the grid enables x64 process-wide for the isam2 host solver,
        # which would auto-disable both Pallas kernels; the throughput
        # rows must measure the DEPLOYMENT path, so force them on
        import jax as _jax
        # x64 (needed by the isam2 host solver in mixed grids) breaks
        # Pallas lowering; kernels engage only in the pure-f32 process
        on_tpu = (_jax.default_backend() == "tpu"
                  and not _jax.config.jax_enable_x64)
        r = run_benchmark(
            ROOT / "assets" / "sim3d.world",
            ROOT / "assets" / "mov3d.in",
            particles=p,
            frames=300,
            dtype=jnp.float32,
            pallas_correct=on_tpu or None,
            pallas_beam=on_tpu or None,
            cfg=cfg,
            phd_cfg=pcfg,
        )
        stats[p] = {
            "fps": round(r["fps"], 1),
            "step_ms": round(1e3 / r["fps"], 3),
            "ate_rmse_loc": round(r["ate_rmse_loc"], 4),
            "compile_s": round(r["compile_s"], 1),
            "device": r["device"],
        }
        print(f"  {p} particles: {stats[p]}", flush=True)
    return stats


EXPERIMENTS = {
    "chap3-s1": chap3_s1_tpu,
    "chap3-s4": chap3_s4_tpu,
    "chap4-default": chap4_default_tpu,
    "chap4-noisy": chap4_noisy_tpu,
    "chap4-cluttery": chap4_cluttery_tpu,
    "chap5-s1": chap5_s1_tpu,
    "chap5-s2": chap5_s2_tpu,
    "chap5-k3": chap5_k3_tpu,
    "chap5-k4": chap5_k4_tpu,
    "throughput": throughput,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment", choices=list(EXPERIMENTS) + ["all"])
    ap.add_argument("--outdir", default=str(HERE / "out-tpu"))
    ap.add_argument("--seeds", default="0")
    ap.add_argument("--variant", default="default")
    args = ap.parse_args()

    import jax

    # float64 must be AVAILABLE process-wide: the isam2 navigator solves in
    # f64 on the host CPU regardless of simulation dtype (isam2nav.py);
    # without x64, jnp silently truncates those arrays to f32 (observed:
    # the whole round-3 chap4 f32 duplication cascade). The phd driver
    # stays f32 -- every array it builds carries an explicit dtype.
    if args.experiment != "throughput":
        # throughput measures the DEPLOYMENT (pure-f32 + Pallas) path;
        # x64 is only needed by the isam2 host solver in the other rows
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    backend = check_backend()

    pathlib.Path(args.outdir).mkdir(parents=True, exist_ok=True)
    G.run_grid(args, EXPERIMENTS,
               post=lambda stats: stats.update(_backend=backend))


if __name__ == "__main__":
    main()
