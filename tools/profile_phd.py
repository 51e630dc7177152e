#!/usr/bin/env python
"""Per-stage timing of the PHD slam step at the headline bench shapes.

Times each SoA stage (births, correct+prune, weight) as a standalone
jitted+vmapped computation over a warmed-up representative state, plus the
full step, on whatever backend jax picks (TPU under axon).
"""

import pathlib
import sys
import time

HERE = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(HERE))

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu.bench_core import build_scan_runner
from monorfs_tpu.config import Config
from monorfs_tpu.io.world import World, parse_commands
from monorfs_tpu.slam import phd
from monorfs_tpu.gm import mixture


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    cfg = Config()
    world = World.from_file(HERE / "assets" / "sim3d.world")
    commands = parse_commands(open(HERE / "assets" / "mov3d.in").read())
    pcfg = phd.PHDConfig(
        num_particles=200, max_components=128, max_measurements=48,
        gate_top=8, estimate_cap=64, beam_width=64, beam_meas_cap=24,
        merge_rounds=4,
    )
    dtype = jnp.float32
    runner, carry, model = build_scan_runner(
        cfg, world, 200, phd_cfg=pcfg, dtype=dtype
    )
    cmds = jnp.asarray(np.stack([c[:6] for c in commands])[:100], dtype)
    carry, _ = runner(carry, cmds)  # warm state after 100 frames
    jax.block_until_ready(carry)

    params = cfg.phd_params(dtype)
    state = carry.nstate
    key = jax.random.PRNGKey(7)
    z = jax.random.uniform(key, (pcfg.max_measurements, 3), dtype) * jnp.asarray(
        [100.0, 100.0, 1.5], dtype
    ) - jnp.asarray([50.0, 50.0, -0.2], dtype)
    z_mask = jnp.arange(pcfg.max_measurements) < 40
    zl = [z[:, i] for i in range(3)]

    pose = state.pose
    maps = state.maps
    print("alive components (mean over particles):",
          float(jnp.mean(mixture.count(maps).astype(jnp.float32))))

    measure_s = model.measure_soa_fn()
    jac_s = model.jac_landmark_soa_fn()
    to_map_s = model.to_map_soa_fn()

    def fns(params):
        return (measure_s, jac_s, to_map_s,
                model.fuzzy_visible_soa_fn(params.depth_map))

    births_fn = jax.jit(jax.vmap(
        lambda p, m: phd._births_soa(model, to_map_s, params, p, m, zl, z_mask)
    ))
    births = births_fn(pose, maps)
    predicted = jax.jit(jax.vmap(mixture.concat_soa))(maps, births)

    correct_fn = jax.jit(jax.vmap(
        lambda p, pr: phd._correct_prune_soa(
            model, pcfg, params, fns(params), p, pr, zl, z_mask
        )
    ))
    corrected = correct_fn(pose, predicted)

    weight_fn = jax.jit(jax.vmap(
        lambda p, pr, c: phd._weight_alpha_soa(
            model, pcfg, params, fns(params), p, pr, c, zl, z_mask
        )
    ))

    step = jax.jit(phd.make_slam_step(model, pcfg, slam=True))
    odo = jnp.zeros((6,), dtype)

    print(f"births : {timeit(births_fn, pose, maps):8.3f} ms")
    print(f"correct: {timeit(correct_fn, pose, predicted):8.3f} ms")
    print(f"weight : {timeit(weight_fn, pose, predicted, corrected):8.3f} ms")
    print(f"full   : {timeit(step, params, state, odo, z, z_mask, key):8.3f} ms")


if __name__ == "__main__":
    main()
