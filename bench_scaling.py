#!/usr/bin/env python
"""Particle-count scaling benchmark on one chip (toward the BASELINE.json
100k-particle configuration; multi-chip scaling uses the same step through
parallel/make_sharded_step on a pod slice).

Prints one JSON line per particle count with frames/s and particle-updates/s.
"""

import json
import pathlib
import sys

HERE = pathlib.Path(__file__).parent
sys.path.insert(0, str(HERE))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(HERE / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from monorfs_tpu.bench_core import run_benchmark
    from monorfs_tpu.slam.phd import PHDConfig

    counts = [200, 1000, 5000, 10000]
    if "--large" in sys.argv:
        # the SoA (K-last) state removed the padded-layout HBM blowup that
        # used to OOM past ~20k particles on one chip; 100k+ remains the
        # multi-chip regime (shard the particle axis via
        # parallel.make_sharded_step)
        counts += [20000, 50000]
    for p in counts:
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
        )
        r = run_benchmark(
            HERE / "assets" / "sim3d.world",
            HERE / "assets" / "mov3d.in",
            particles=p,
            frames=50,
            dtype=jnp.float32,
            phd_cfg=pcfg,
        )
        print(
            json.dumps(
                {
                    "particles": p,
                    "fps": round(r["fps"], 2),
                    "particle_updates_per_s": round(r["fps"] * p),
                    "ate_rmse_loc": round(r["ate_rmse_loc"], 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
