#!/usr/bin/env python
"""Ablate the Mahalanobis-DA scan's cost drivers on the real TPU.

VERDICT r4: scan-da runs 39.6 fps vs 90.9 for the known-DA scan; is the
auction assignment or the marginal refresh the gap? This sweeps
marginals_every (4 = default amortization, 10^9 = new-landmark frames
only) and the auction epsilon (bid increment; rounds scale ~1/eps), timing
the full jitted scan each way.

Usage: python tools/scanda_profile.py [--frames 300] [--variant default]
"""

import argparse
import json
import math
import pathlib
import sys
import time

HERE = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(HERE))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--variant", default="default")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", str(HERE / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from monorfs_tpu.config import Config
    from monorfs_tpu.io import World, parse_commands
    from monorfs_tpu.metrics.errors import ospa
    from monorfs_tpu.sim.simulation import model_for_config
    from monorfs_tpu.slam.isam2_scan_da import build_mahalanobis_scan

    cfg = Config.from_file(
        HERE / "experiments" / "configs" / f"chap4-{args.variant}.cfg"
    )
    world = World.from_file(HERE / "assets" / "sim3d.world")
    cmds = np.stack([
        c[:6]
        for c in parse_commands((HERE / "assets" / "mov3d.in").read_text())
    ])
    reps = int(np.ceil(args.frames / len(cmds)))
    cmds = jnp.asarray(np.tile(cmds, (reps, 1))[: args.frames], jnp.float32)

    model_pre = model_for_config(cfg, world)
    lam = float(cfg.clutter_density) * float(
        model_pre.volume(model_pre.params)
    )
    max_clutter = max(8, int(math.floor(10 * lam)) + 1)

    for tag, kw in [
        ("baseline (marg=4, builder-default eps)", {}),
        ("marg=never", {"marginals_every": 10**9}),
        ("marg=16", {"marginals_every": 16}),
        ("eps=.05", {"eps": 0.05}),
        ("eps=.2", {"eps": 0.2}),
        ("marg=16+eps=.05", {"marginals_every": 16, "eps": 0.05}),
    ]:
        runner, carry, model = build_mahalanobis_scan(
            cfg, world, frames=args.frames, dtype=jnp.float32,
            max_clutter=max_clutter, seed=args.seed, **kw,
        )
        t0 = time.perf_counter()
        out_carry, (tp, ep, nlm) = runner(carry, cmds)
        np.asarray(ep)
        compile_s = time.perf_counter() - t0
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            out_carry, (tp, ep, nlm) = runner(carry, cmds)
            tp_h, ep_h = np.asarray(tp), np.asarray(ep)
            best = min(best, time.perf_counter() - t0)
        fps = args.frames / best
        ate = float(np.sqrt(np.mean(
            np.sum((tp_h[:, :3] - ep_h[:, :3]) ** 2, -1)
        )))
        lm_mask = np.asarray(out_carry.gstate.lm_mask)
        lms = np.asarray(out_carry.gstate.landmarks)[lm_mask]
        o = float(ospa(lms, np.asarray(world.landmarks), c=1.0)[0])
        print(json.dumps({
            "config": tag, "fps": round(fps, 1),
            "ate": round(ate, 4), "ospa": round(o, 4),
            "landmarks": int(lm_mask.sum()),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
