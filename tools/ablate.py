#!/usr/bin/env python
"""In-situ ablation of the SoA PHD step: monkeypatch stages out of
make_slam_step and time the real jitted step on a warm state."""

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


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


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
    runner, carry, model = build_scan_runner(cfg, world, 200, phd_cfg=pcfg,
                                             dtype=dtype)
    cmds = jnp.asarray(np.stack([c[:6] for c in commands])[:100], dtype)
    carry, _ = runner(carry, cmds)
    jax.block_until_ready(carry)

    params = cfg.phd_params(dtype)
    state = carry.nstate
    key = jax.random.PRNGKey(7)
    z = jax.random.uniform(key, (48, 3), dtype)
    z_mask = jnp.arange(48) < 40
    odo = jnp.zeros((6,), dtype)

    orig_births = phd._births_soa
    orig_correct = phd._correct_prune_soa
    orig_weight = phd._weight_alpha_soa

    def run(label, pallas=None):
        step = jax.jit(
            phd.make_slam_step(model, pcfg, slam=True, pallas_beam=pallas)
        )
        ms = timeit(step, params, state, odo, z, z_mask, key)
        print(f"{label:28s}: {ms:8.3f} ms")
        return ms

    run("full")

    phd._weight_alpha_soa = (
        lambda model, cfg_, params_, fns, pose, pr, co, zl, zm, **kw:
        jnp.sum(co.logw) * 0.0 + pose[0] * 1e-12
    )
    run("no weight", pallas=False)
    phd._weight_alpha_soa = orig_weight

    def correct_noop(model_, cfg_, params_, fns, pose, pred, zl, zm):
        return jax.tree.map(lambda a: a[..., : cfg_.max_components], pred)

    phd._correct_prune_soa = correct_noop
    run("no correct (weight+births)")
    phd._weight_alpha_soa = (
        lambda model, cfg_, params_, fns, pose, pr, co, zl, zm, **kw:
        jnp.sum(co.logw) * 0.0 + pose[0] * 1e-12
    )
    run("births only", pallas=False)
    phd._correct_prune_soa = orig_correct
    run("no weight (again)", pallas=False)
    phd._weight_alpha_soa = orig_weight

    # correct without merge: cut at top_k, return survivors directly
    import monorfs_tpu.slam.phd as p

    def correct_nomerge(model_, cfg_, params_, fns, pose, pred, zl, zm):
        out = orig_correct(model_, cfg_, params_, fns, pose, pred, zl, zm)
        return out

    # piecewise: time correct with merge_rounds=0 config
    pcfg0 = phd.PHDConfig(
        num_particles=200, max_components=128, max_measurements=48,
        gate_top=8, estimate_cap=64, beam_width=64, beam_meas_cap=24,
        merge_rounds=0,
    )
    step0 = jax.jit(phd.make_slam_step(model, pcfg0, slam=True))
    ms = timeit(step0, params, state, odo, z, z_mask, key)
    print(f"{'merge_rounds=0':28s}: {ms:8.3f} ms")

    # smaller beam
    pcfgb = phd.PHDConfig(
        num_particles=200, max_components=128, max_measurements=48,
        gate_top=8, estimate_cap=64, beam_width=32, beam_meas_cap=12,
        merge_rounds=4,
    )
    stepb = jax.jit(phd.make_slam_step(model, pcfgb, slam=True))
    ms = timeit(stepb, params, state, odo, z, z_mask, key)
    print(f"{'beam 32x12':28s}: {ms:8.3f} ms")


if __name__ == "__main__" and "--round4" not in sys.argv:
    main()
    sys.exit(0)

def variants():
    import tools_ablate_shim  # placeholder, unused


def ablate_round4():
    """Round-4 fps regression ablation (368 -> 219 after the f32 fixes):
    isolate (a) the log-space WeightAlpha evaluation, (b) resample cadence
    (round 3's NaN-skipped weights rarely triggered ESS resampling), at the
    bench shapes on the current device."""
    cfg = Config()
    world = World.from_file(HERE / "assets" / "sim3d.world")
    commands = parse_commands(open(HERE / "assets" / "mov3d.in").read())
    pcfg = phd.PHDConfig(
        num_particles=200, max_components=128, max_measurements=48,
        gate_top=8, estimate_cap=48, beam_width=32, beam_meas_cap=24,
        beam_candidates=6, merge_rounds=4, meas_compact=24,
    )
    dtype = jnp.float32
    runner, carry, model = build_scan_runner(cfg, world, 200, phd_cfg=pcfg,
                                             dtype=dtype)
    cmds = jnp.asarray(np.stack([c[:6] for c in commands])[:100], dtype)
    carry, _ = runner(carry, cmds)
    jax.block_until_ready(carry)
    params = cfg.phd_params(dtype)
    state = carry.nstate
    key = jax.random.PRNGKey(7)
    z = jax.random.uniform(key, (48, 3), dtype)
    z_mask = jnp.arange(48) < 40
    odo = jnp.zeros((6,), dtype)

    def run(label, params_=None):
        step = jax.jit(phd.make_slam_step(model, pcfg, slam=True))
        ms = timeit(step, params_ or params, state, odo, z, z_mask, key)
        print(f"{label:34s}: {ms:8.3f} ms  ({1e3/ms:6.1f} fps)")
        return ms

    run("full (current)")

    # (a) linear-space WeightAlpha evaluation (round-3 semantics)
    orig_log_eval = mixture.log_evaluate_many_soa
    mixture.log_evaluate_many_soa = lambda gm, pts, radius=None: jnp.log(
        jnp.maximum(mixture.evaluate_many_soa(gm, pts, radius), 1e-30)
    )
    run("linear-space weight eval (r3)")
    mixture.log_evaluate_many_soa = orig_log_eval

    # (b) resample cadence: never vs always
    run("resample never (ESS thr 0)",
        params._replace(min_effective_particle=jnp.asarray(0.0, dtype)))
    run("resample always (ESS thr 1)",
        params._replace(min_effective_particle=jnp.asarray(1.0, dtype)))

    # repeat the endpoints to expose timing pollution from concurrent
    # chip users (the tunnel serializes programs)
    run("full (repeat)")
    mixture.log_evaluate_many_soa = lambda gm, pts, radius=None: jnp.log(
        jnp.maximum(mixture.evaluate_many_soa(gm, pts, radius), 1e-30)
    )
    run("linear-space weight eval (rep)")
    mixture.log_evaluate_many_soa = orig_log_eval


if __name__ == "__main__" and "--round4" in sys.argv:
    ablate_round4()
    sys.exit(0)
