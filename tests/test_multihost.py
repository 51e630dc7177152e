"""Multi-process (multi-host) distribution: 2 local processes x 4 virtual
CPU devices each, brought up through monorfs_tpu.parallel.multihost
(jax.distributed), must reproduce the single-process 8-device posterior.

This is the no-cluster validation of the BASELINE multi-host configuration
(SURVEY §2 parallelism table: "multi-host via jax.distributed")."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end runs; deselect with -m "not slow"

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu import models
from monorfs_tpu.config import Config
from monorfs_tpu.parallel import make_mesh, make_sharded_step, multihost
from monorfs_tpu.slam import phd

HERE = pathlib.Path(__file__).resolve().parent


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same 3-step run on this process's own 8-device mesh (identical
    8-shard partitioning, so the multi-process run must match it)."""
    model = models.get("Linear2D")
    cfg = Config()
    cfg.set_linear2d_defaults()
    pcfg = phd.PHDConfig(
        num_particles=16, max_components=16, max_measurements=4, gate_top=4,
        estimate_cap=8, beam_width=16,
    )
    params = cfg.phd_params(np.float64)
    state = phd.init_state(model, pcfg, np.zeros(2), jnp.float64)
    z = np.asarray([[0.5, 0.5], [1.0, -0.5], [0, 0], [0, 0]], np.float64)
    zmask = np.asarray([True, True, False, False])
    mesh = make_mesh()
    sstate = multihost.shard_state_global(state, mesh)
    step = make_sharded_step(model, pcfg, mesh, slam=True)
    key = jax.random.PRNGKey(7)
    for i in range(3):
        key, sub = jax.random.split(key)
        odo = np.asarray([0.1, 0.0]) * (i + 1)
        sstate = step(params, sstate, odo, z, zmask, np.asarray(sub))
    return (
        float(jnp.sum(sstate.pose)),
        float(jnp.sum(sstate.logweight)),
        float(jnp.sum(jnp.where(sstate.maps.logw > -1e29,
                                jnp.exp(sstate.maps.logw), 0.0))),
    )


def _run_two_process(case):
    port = _free_port()
    n_proc, local_devices = 2, 4
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    procs = []
    for pid in range(n_proc):
        procs.append(subprocess.Popen(
            [sys.executable, str(HERE / "multihost_runner.py"),
             str(pid), str(n_proc), f"localhost:{port}",
             str(local_devices), case],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env_base, cwd=str(HERE.parent),
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (out, err[-3000:])
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert all(o["n_devices"] == n_proc * local_devices for o in outs), outs
    # both processes computed the same replicated checksums
    for key in ("pose_sum", "logw_sum", "map_mass"):
        np.testing.assert_allclose(outs[0][key], outs[1][key], rtol=1e-12,
                                   err_msg=key)
    return outs


def test_two_process_run_matches_single_process():
    outs = _run_two_process("linear2d")
    ref = _single_process_reference()
    np.testing.assert_allclose(outs[0]["pose_sum"], ref[0], rtol=1e-9)
    np.testing.assert_allclose(outs[0]["logw_sum"], ref[1], rtol=1e-9)
    np.testing.assert_allclose(outs[0]["map_mass"], ref[2], rtol=1e-9)


def test_two_process_prm3d_bench_shapes():
    """The DEPLOYMENT configuration (3D pixel-range, 200 particles, K=128,
    float32) under jax.distributed: 2 processes x 4 devices, 3 full SLAM
    steps, finite replicated checksums agreeing across processes."""
    outs = _run_two_process("prm3d")
    assert outs[0]["case"] == "prm3d"
    for key in ("pose_sum", "logw_sum", "map_mass"):
        assert np.isfinite(outs[0][key]), outs[0]
    # 200 particles with quaternion w ~= 1 each: pose_sum is O(200)
    assert 50.0 < outs[0]["pose_sum"] < 1000.0, outs[0]
    assert outs[0]["map_mass"] > 0.5, outs[0]
