#!/usr/bin/env python
"""Per-step collective communication volume of every sharded path.

Compiles (a) the particle-sharded PHD SLAM step at bench shapes, (b) one
chain-sharded smoother sweep, and (c) one landmark-sharded Schur-BA
iteration on an 8-device virtual CPU mesh, then reads the COMPILER's own
collectives out of the optimized HLO: every all-reduce / all-gather /
reduce-scatter / collective-permute op with its tensor bytes. This is the
measured counterpart of the analytic table in BENCH.md (SURVEY §2
parallelism rows); the reference has no distribution at all to compare
against (its only parallelism is Parallel.For threads,
PHDNavigator.cs:326-339).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/comm_volume.py
"""

import os
import pathlib
import re
import sys

HERE = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(HERE))

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import numpy as np


_DTYPE_BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1,
                "bf16": 2, "s8": 1, "u8": 1}


def collectives_of(compiled):
    """Parse collective ops + payload bytes from optimized HLO text."""
    txt = compiled.as_text()
    out = {}
    pat = re.compile(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)(?:-start)?[^=]*=\s*((?:\([^)]*\)|\S+))"
    )
    for m in re.finditer(
        r"^\s*\S+\s*=\s*((?:\([^)]*\))|(?:\S+))\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)(?:-start|-done)?\(",
        txt, re.M,
    ):
        shapes, kind = m.group(1), m.group(2)
        if "-done" in m.group(0):
            continue
        total = 0
        for sm in re.finditer(r"(f32|f64|bf16|s32|u32|u8|s8|pred)\[([\d,]*)\]",
                              shapes):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES[dt]
        key = kind
        cnt, byt = out.get(key, (0, 0))
        out[key] = (cnt + 1, byt + total)
    return out


def report(name, compiled):
    cols = collectives_of(compiled)
    total = sum(b for _, b in cols.values())
    print(f"\n== {name} ==")
    if not cols:
        print("  (no collectives)")
    for kind, (cnt, byt) in sorted(cols.items()):
        print(f"  {kind:20s} x{cnt:3d}  {byt / 1024:10.1f} KiB")
    print(f"  {'TOTAL':20s}       {total / 1024:10.1f} KiB / step")
    return total


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from monorfs_tpu.config import Config
    from monorfs_tpu.models import get as get_model
    from monorfs_tpu.parallel import (
        chain, dist_ba, make_mesh, make_sharded_step, shard_state,
    )
    from monorfs_tpu.slam import loopy, phd

    n = 8
    devices = jax.devices()[:n]
    print(f"{n}-device virtual mesh ({devices[0].platform})")

    # ---- particle-sharded PHD step at BENCH shapes -----------------------
    mesh = make_mesh(devices=devices)
    cfg = Config()
    model = get_model("PRM3D")
    pcfg = phd.PHDConfig(
        num_particles=200, max_components=128, max_measurements=24,
        gate_top=8, estimate_cap=48, beam_width=32, beam_meas_cap=24,
        beam_candidates=6, merge_rounds=4,
    )
    params = cfg.phd_params(np.float32)
    state = phd.init_state(
        model, pcfg, np.array([0, 0, 0, 1, 0, 0, 0.0]), jnp.float32
    )
    state = shard_state(state, mesh)
    step = make_sharded_step(model, pcfg, mesh, slam=True)
    z = jnp.zeros((24, 3), jnp.float32)
    zm = jnp.arange(24) < 12
    comp = step.lower(
        params, state, jnp.zeros(6, jnp.float32), z, zm,
        jax.random.PRNGKey(0),
    ).compile()
    report("PHD step, 200 particles / 8 shards (bench shapes)", comp)

    # ---- chain-sharded smoother sweep ------------------------------------
    cfg2d = Config()
    cfg2d.set_linear2d_defaults()
    model2d = get_model("Linear2D")
    t = 64
    lcfg = loopy.LoopyConfig(
        max_nodes=t, max_meas=8, mix_cap=4, blocks=n,
        ga_iters=4, ga_steps=2, jmap_cap=16, beam_width=16,
    )
    cmesh = chain.make_chain_mesh(n, devices=devices)
    traj = np.cumsum(np.full((t, 2), 0.1), axis=0)
    lstate = loopy.init_state(model2d, lcfg, traj, t, jnp.float32)
    odometry = jnp.full((t, 2), 0.1, jnp.float32)
    z2 = jnp.zeros((t, 8, 2), jnp.float32).at[:, 0].set(0.5)
    zm2 = jnp.zeros((t, 8), bool).at[:, 0].set(True)
    lparams = cfg2d.phd_params(np.float32)
    lstate, odometry, z2, zm2 = chain.shard_loopy_inputs(
        cmesh, lstate, odometry, z2, zm2
    )
    sweep = chain.make_sharded_sweep(model2d, lcfg, cmesh)
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    comp = sweep.lower(
        lparams, lstate, odometry, z2, zm2, f32(5.0), f32(1.0), f32(0.1),
        jnp.asarray(np.eye(2) * 1e-3, jnp.float32),
    ).compile()
    report(f"Loopy sweep, {t}-node chain / 8 blocks", comp)

    # ---- landmark-sharded Schur BA ---------------------------------------
    l_cap, p_cap, f_cap = 10240, 64, 40960
    dcfg = dist_ba.DistBAConfig(
        max_poses=p_cap, max_landmarks=l_cap, max_factors=f_cap, gn_iters=1,
    )
    lmesh = dist_ba.make_landmark_mesh(n, devices=devices)
    rng = np.random.default_rng(0)
    poses = np.tile(np.array([0, 0, 0, 1, 0, 0, 0], np.float32), (p_cap, 1))
    lms = rng.uniform(-1, 1, (l_cap, 3)).astype(np.float32)
    lms[:, 2] = rng.uniform(0.5, 1.8, l_cap)
    fl = np.arange(f_cap, dtype=np.int32) % l_cap
    fp = (fl + (np.arange(f_cap, dtype=np.int32) // l_cap) * 17) % p_cap
    fz = np.zeros((f_cap, 3), np.float32)
    fm = np.ones(f_cap, bool)
    fp, fl, fz, fm = dist_ba.partition_factors(
        dcfg, n, fp, fl, jnp.asarray(fz), fm
    )
    slms, slmask, fp, fl, fz, fm = dist_ba.shard_ba_inputs(
        lmesh, "landmarks", jnp.asarray(lms), np.ones(l_cap, bool),
        fp, fl, fz, fm,
    )
    solve = dist_ba.make_dist_gauss_newton(model, dcfg, lmesh)
    minfo = jnp.asarray(np.eye(6, dtype=np.float32) * 1e2)
    sinfo = jnp.asarray(np.diag([0.5, 0.5, 1e3]).astype(np.float32))
    comp = solve.lower(
        jnp.asarray(poses), jnp.int32(p_cap - 1),
        np.arange(p_cap) == 0, jnp.zeros((p_cap, 6), jnp.float32),
        np.concatenate([[False], np.ones(p_cap - 1, bool)]),
        slms, slmask, fp, fl, fz, fm, minfo, sinfo,
    ).compile()
    report(
        f"Schur BA, {l_cap} landmarks x {p_cap} poses / 8 shards "
        f"(1 GN iter)", comp,
    )


if __name__ == "__main__":
    main()
