"""Benchmark core: fully-jitted scan over simulation frames.

The whole vehicle-plus-navigator frame loop compiles into one lax.scan so a
T-frame benchmark is a single device computation with no host round-trips --
the TPU-native counterpart of the reference's headless stopwatch run
(reference: mono-rfs/Program.cs:286-294, Simulation.cs:706-723).
"""

import time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config
from .io.world import World, parse_commands
from .models import get as get_model
from .sim import vehicle as vehicle_mod
from .sim.simulation import model_for_config
from .slam import phd


class ScanCarry(NamedTuple):
    vstate: vehicle_mod.VehicleState
    nstate: phd.PHDState
    key: jax.Array


def build_scan_runner(cfg: Config, world: World, particles: int,
                      phd_cfg=None, dtype=jnp.float32, slam=True,
                      max_clutter=8, seed=0, pallas_correct=None,
                      pallas_beam=None):
    """Return (runner, init_carry, commands_array). runner(carry, commands)
    scans the full frame pipeline and returns (carry, per-frame outputs)."""
    model = model_for_config(cfg, world)
    lmax = max(len(world.landmarks), 1)
    max_meas = lmax + max_clutter
    pcfg = phd_cfg or phd.PHDConfig(
        num_particles=particles,
        max_components=cfg.max_quantity,
        max_measurements=max_meas,
    )

    vparams = vehicle_mod.VehicleParams(
        motion_cov=jnp.asarray(cfg.motion_covariance, dtype),
        meas_cov=jnp.asarray(cfg.measurement_covariance, dtype),
        pd=jnp.asarray(cfg.detection_probability, dtype),
        clutter_count=jnp.asarray(
            cfg.clutter_density * float(model.volume(model.params)), dtype
        ),
        visibility_ramp=jnp.asarray(cfg.visibility_ramp, dtype),
        dt=jnp.asarray(cfg.measure_elapsed, dtype),
        perfect_still=jnp.asarray(cfg.perfect_still, bool),
    )
    nparams = cfg.phd_params(dtype)
    step = phd.make_slam_step(model, pcfg, slam=slam,
                              pallas_correct=pallas_correct,
                              pallas_beam=pallas_beam)

    lm = np.zeros((lmax, 3), dtype)
    lm[: len(world.landmarks)] = world.landmarks
    lmask = np.arange(lmax) < len(world.landmarks)
    vstate = vehicle_mod.VehicleState(
        pose=jnp.asarray(world.pose, dtype),
        landmarks=jnp.asarray(lm),
        landmark_mask=jnp.asarray(lmask),
    )
    nstate = phd.init_state(model, pcfg, np.asarray(world.pose, dtype), dtype)

    def frame(carry: ScanCarry, command):
        key, kupd, kmeas, knav = jax.random.split(carry.key, 4)
        vstate, noisy = vehicle_mod.update(
            model, vparams, carry.vstate, command, kupd
        )
        z, mask, labels, visible, detected = vehicle_mod.measure(
            model, vparams, vstate, kmeas, max_clutter
        )
        nstate = step(
            nparams, carry.nstate, noisy, z, mask, knav, **(
                {} if slam else {"true_pose": vstate.pose}
            )
        )
        out = (
            vstate.pose,
            nstate.pose[nstate.best],
            nstate.logweight[nstate.best],
        )
        return ScanCarry(vstate, nstate, key), out

    @jax.jit
    def runner(carry, commands):
        return jax.lax.scan(frame, carry, commands)

    init = ScanCarry(vstate, nstate, jax.random.PRNGKey(seed))
    return runner, init, model


def run_benchmark(world_file, command_file, particles=200, frames=None,
                  dtype=jnp.float32, cfg=None, phd_cfg=None, seed=0,
                  pallas_correct=None, pallas_beam=None):
    """Compile, warm up, and time the scan; returns a dict of results.

    The warmup runs the full-length scan once (same shape as the timed run)
    so the timed region is pure execution; outputs are fetched to host to
    defeat async-dispatch timing artifacts."""
    if cfg is None:
        cfg = Config()  # PRM3D defaults
    world = World.from_file(world_file)
    commands = parse_commands(open(command_file).read())
    odo = 6 if len(world.pose) == 7 else len(world.pose)
    cmds = np.stack([c[:odo] for c in commands])
    if frames is not None:
        reps = int(np.ceil(frames / len(cmds)))
        cmds = np.tile(cmds, (reps, 1))[:frames]
    cmds = jnp.asarray(cmds, dtype)

    runner, carry, model = build_scan_runner(
        cfg, world, particles, phd_cfg=phd_cfg, dtype=dtype, seed=seed,
        pallas_correct=pallas_correct, pallas_beam=pallas_beam,
    )

    # chunk the scan so the compiled program length is fixed (one compile,
    # many dispatches; dispatch overhead is negligible vs 50-frame chunks)
    chunk = min(50, cmds.shape[0])
    n_chunks = cmds.shape[0] // chunk
    cmds = cmds[: n_chunks * chunk]

    def run_all(carry0):
        outs = []
        c = carry0
        for i in range(n_chunks):
            c, out = runner(c, cmds[i * chunk : (i + 1) * chunk])
            outs.append(out)
        # fetch to host at the end: forces completion without breaking the
        # async dispatch pipeline between chunks
        return c, [
            np.concatenate([np.asarray(o[j]) for o in outs]) for j in range(3)
        ]

    t0 = time.time()
    warm_carry, _ = run_all(carry)
    compile_s = time.time() - t0

    t0 = time.time()
    out_carry, outputs = run_all(carry)
    elapsed = time.time() - t0

    n = cmds.shape[0]
    true_pose, est_pose, best_logw = outputs
    d = min(3, true_pose.shape[1])
    ate = float(
        np.sqrt(np.mean(np.sum((true_pose[:, :d] - est_pose[:, :d]) ** 2, -1)))
    )
    return {
        "frames": int(n),
        "particles": particles,
        "elapsed_s": elapsed,
        "fps": n / elapsed,
        "compile_s": compile_s,
        "ate_rmse_loc": ate,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }
