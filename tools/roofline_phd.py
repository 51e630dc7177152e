#!/usr/bin/env python
"""Per-stage roofline of the PHD slam step on the real TPU.

For each stage of the SoA step (births, correct+prune, weight/beam) and the
full step, at 200/800/2000 particles:

  * measured ms/step -- timed as an on-device lax.scan of `reps` iterations
    with a forced data dependence between iterations (the axon tunnel adds
    0.1-0.3 s of host dispatch latency per call, so per-dispatch timing lies;
    only scan-amortized numbers reflect the chip);
  * XLA cost model flops + HBM bytes (compiled.cost_analysis());
  * speed-of-light = max(bytes / measured_HBM_BW, flops / measured_peak)
    against ceilings measured on THIS chip (big f32 matmul, big elementwise
    stream) rather than datasheet numbers;
  * efficiency = sol / measured.

The reference has no per-stage profiling at all (its only timing is the
headless wall-clock print, Program.cs:286-294); this tool is the evidence
behind BENCH.md's roofline table.

Usage: python tools/roofline_phd.py [--particles 200,800,2000] [--json out]
"""

import argparse
import json
import pathlib
import sys
import time

HERE = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(HERE))

import numpy as np


def measure_ceilings(jnp, jax):
    """Achieved f32 matmul TFLOP/s and HBM stream GB/s on this chip.

    Scalar results only and 100+ chained iterations: the axon tunnel's
    per-dispatch latency (~25-300 ms) and any bulk result fetch would
    otherwise dominate (the round-5 first cut measured 2.1 TFLOP/s and
    269 GB/s -- tunnel artifacts, not the chip)."""
    n = 4096
    reps = 100
    a = jnp.ones((n, n), jnp.float32)
    b = jnp.ones((n, n), jnp.float32)

    @jax.jit
    def mm(a, b):
        def body(c, _):
            c = jnp.dot(c, b, precision=jax.lax.Precision.DEFAULT)
            c = c * (1.0 / n)  # keep values bounded; negligible cost
            return c, ()
        c, _ = jax.lax.scan(body, a, length=reps)
        return jnp.sum(c)  # scalar fetch

    np.asarray(mm(a, b))  # compile + warm
    dt = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(mm(a, b))
        dt = min(dt, time.perf_counter() - t0)
    tflops = reps * 2 * n**3 / dt / 1e12

    m = 64 * 1024 * 1024  # 256 MB in f32: far beyond VMEM, forces HBM
    x = jnp.ones((m,), jnp.float32)

    @jax.jit
    def stream(x):
        def body(c, _):
            return c + 1.0, ()
        c, _ = jax.lax.scan(body, x, length=reps)
        return jnp.sum(c[:8])  # scalar fetch

    np.asarray(stream(x))
    dt = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(stream(x))
        dt = min(dt, time.perf_counter() - t0)
    gbs = reps * 2 * 4 * m / dt / 1e9  # read + write per iteration
    return tflops, gbs


def scan_time(jax, jnp, fn, args, state_leaf, reps=30):
    """Time `fn(*args)` as reps iterations of an on-device scan.

    state_leaf names the pytree leaf of args fed back with a tiny
    data-dependent perturbation so XLA cannot hoist the loop body."""

    def body(carry, _):
        s, a = carry
        a2 = jax.tree.map(lambda x: x, a)
        leaves = jax.tree.leaves(a2)
        # perturb the designated float leaf by s * 1e-38 (non-foldable)
        a2 = jax.tree.map(
            lambda x: x + s.astype(x.dtype) * 1e-38
            if (hasattr(x, "dtype") and x.dtype in (jnp.float32, jnp.float64)
                and x is leaves[state_leaf])
            else x,
            a2,
        )
        out = fn(*a2)
        red = sum(
            jnp.sum(l) for l in jax.tree.leaves(out)
            if hasattr(l, "dtype") and l.dtype in (jnp.float32, jnp.float64)
        )
        red = jnp.where(jnp.isfinite(red), red, 0.0)
        return (red * 1e-30, a), ()

    @jax.jit
    def run(args):
        (s, _), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), args), length=reps
        )
        return s

    np.asarray(run(args))  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(args))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3  # ms


def cost_of(jax, fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", default="200,800,2000")
    ap.add_argument("--json", default=None)
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", str(HERE / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from monorfs_tpu.bench_core import build_scan_runner
    from monorfs_tpu.config import Config
    from monorfs_tpu.io.world import World, parse_commands
    from monorfs_tpu.slam import fused_pallas, phd
    from monorfs_tpu.gm import mixture

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    tflops, gbs = measure_ceilings(jnp, jax)
    print(f"measured ceilings: {tflops:.1f} f32 TFLOP/s, {gbs:.0f} GB/s HBM",
          flush=True)

    cfg = Config()
    world = World.from_file(HERE / "assets" / "sim3d.world")
    commands = parse_commands(open(HERE / "assets" / "mov3d.in").read())
    dtype = jnp.float32
    results = {"device": str(dev), "tflops": tflops, "hbm_gbs": gbs,
               "rows": []}

    for p in [int(x) for x in args.particles.split(",")]:
        pcfg = phd.PHDConfig(
            num_particles=p, max_components=128, max_measurements=48,
            gate_top=8, estimate_cap=48, beam_width=32, beam_meas_cap=24,
            beam_candidates=6, merge_rounds=4, meas_compact=24,
        )
        runner, carry, model = build_scan_runner(
            cfg, world, p, phd_cfg=pcfg, dtype=dtype
        )
        cmds = jnp.asarray(
            np.stack([c[:6] for c in commands])[:100], dtype
        )
        carry, _ = runner(carry, cmds)  # warm state after 100 frames
        jax.block_until_ready(carry)

        params = cfg.phd_params(dtype)
        state = carry.nstate
        key = jax.random.PRNGKey(7)
        mcap = pcfg.meas_compact or pcfg.max_measurements
        z = jax.random.uniform(
            key, (pcfg.max_measurements, 3), dtype
        ) * jnp.asarray([100.0, 100.0, 1.5], dtype) - jnp.asarray(
            [50.0, 50.0, -0.2], dtype
        )
        z_mask = jnp.arange(pcfg.max_measurements) < 12
        zc = z[:mcap]
        zc_mask = z_mask[:mcap]
        zl = [zc[:, i] for i in range(3)]

        pose, maps = state.pose, state.maps
        alive = float(jnp.mean(mixture.count(maps).astype(jnp.float32)))

        measure_s = model.measure_soa_fn()
        jac_s = model.jac_landmark_soa_fn()
        to_map_s = model.to_map_soa_fn()

        def fns(params):
            return (measure_s, jac_s, to_map_s,
                    model.fuzzy_visible_soa_fn(params.depth_map))

        births_fn = jax.vmap(
            lambda po, m: phd._births_soa(
                model, to_map_s, params, po, m, zl, zc_mask
            )
        )
        concat_fn = jax.vmap(mixture.concat_soa)
        predicted = jax.jit(
            lambda m, b: concat_fn(m, b)
        )(maps, births_fn(pose, maps))
        jax.block_until_ready(predicted)

        correct_fn = jax.vmap(
            lambda po, pr: phd._correct_prune_soa(
                model, pcfg, params, fns(params), po, pr, zl, zc_mask
            )
        )
        corrected = jax.jit(correct_fn)(pose, predicted)
        jax.block_until_ready(corrected)

        weight_fn = jax.vmap(
            lambda po, pr, c: phd._weight_alpha_soa(
                model, pcfg, params, fns(params), po, pr, c, zl, zc_mask
            )
        )
        step = phd.make_slam_step(model, pcfg, slam=True)
        odo = jnp.zeros((6,), dtype)

        def fused_fn(po, mp_):
            return fused_pallas.fused_stage(
                model, pcfg, params, po, mp_, zc, zc_mask
            )

        stages = [
            ("births", births_fn, (pose, maps), 1),
            ("correct+prune", correct_fn, (pose, predicted), 1),
            ("fused kernel", fused_fn, (pose, maps), 0),
            ("weight(beam)", weight_fn, (pose, predicted, corrected), 1),
            ("full step", lambda pa, s, o, zz, zm, k: step(pa, s, o, zz, zm, k),
             (params, state, odo, z, z_mask, key), None),
        ]
        print(f"\n=== P={p} (alive comps/particle: {alive:.0f}) ===",
              flush=True)
        hdr = (f"{'stage':>14} {'ms':>8} {'MFLOP':>8} {'MB':>8} "
               f"{'sol_us':>8} {'eff%':>6} {'bound':>6}")
        print(hdr, flush=True)
        for name, fn, a, leaf in stages:
            if leaf is None:
                # full step: carry the navigator state itself through the scan
                def sfn(params, st, odo, zz, zm, k):
                    return step(params, st, odo, zz, zm, k)

                def body(carry, _):
                    st, k = carry
                    k, sub = jax.random.split(k)
                    return (sfn(params, st, odo, z, z_mask, sub), k), ()

                @jax.jit
                def run(st):
                    (st, _), _ = jax.lax.scan(
                        body, (st, key), length=args.reps
                    )
                    return st.logweight

                np.asarray(run(state))
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(run(state))
                    best = min(best, time.perf_counter() - t0)
                ms = best / args.reps * 1e3
                flops, bts = cost_of(jax, sfn, *a)
            else:
                ms = scan_time(jax, jnp, fn, a, leaf, reps=args.reps)
                flops, bts = cost_of(jax, fn, *a)
            t_flop = flops / (tflops * 1e12)
            t_mem = bts / (gbs * 1e9)
            sol = max(t_flop, t_mem)
            bound = "flops" if t_flop > t_mem else "mem"
            eff = sol / (ms * 1e-3) * 100
            print(f"{name:>14} {ms:8.3f} {flops / 1e6:8.1f} {bts / 1e6:8.2f} "
                  f"{sol * 1e6:8.1f} {eff:6.1f} {bound:>6}", flush=True)
            results["rows"].append(dict(
                particles=p, stage=name, ms=ms, mflop=flops / 1e6,
                mb=bts / 1e6, sol_us=sol * 1e6, eff_pct=eff, bound=bound,
            ))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"\nwrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
