"""Worker process for the multi-host (multi-process) distribution test.

Launched by tests/test_multihost.py: each process brings up
jax.distributed with a virtual CPU device count, builds the GLOBAL particle
mesh, runs 3 sharded PHD SLAM steps, and prints replicated checksums. The
parent asserts both processes agree and match the single-process run (the
same global shard partitioning, so the math is identical).

Cases:
  linear2d -- the 16-particle Linear2D toy (fast smoke);
  prm3d    -- the BENCH-SHAPE 3D pixel-range step: 200 particles, K=128
              components, M=24 measurement slots, float32 -- the
              deployment configuration under jax.distributed
              (VERDICT r4 #7: "the full 3D PHD step at bench shapes is
              never run under jax.distributed").
"""

import json
import pathlib
import sys

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

process_id = int(sys.argv[1])
num_processes = int(sys.argv[2])
coordinator = sys.argv[3]
local_devices = int(sys.argv[4])
case = sys.argv[5] if len(sys.argv) > 5 else "linear2d"

from monorfs_tpu.parallel import multihost  # noqa: E402

jax = multihost.initialize(
    coordinator, num_processes, process_id, local_device_count=local_devices
)
if case == "linear2d":
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from monorfs_tpu import models  # noqa: E402
from monorfs_tpu.config import Config  # noqa: E402
from monorfs_tpu.parallel import make_mesh, make_sharded_step  # noqa: E402
from monorfs_tpu.slam import phd  # noqa: E402

assert len(jax.devices()) == num_processes * local_devices, (
    jax.devices(), jax.process_count()
)


def build_case(case):
    if case == "linear2d":
        model = models.get("Linear2D")
        cfg = Config()
        cfg.set_linear2d_defaults()
        pcfg = phd.PHDConfig(
            num_particles=16, max_components=16, max_measurements=4,
            gate_top=4, estimate_cap=8, beam_width=16,
        )
        dtype = jnp.float64
        params = cfg.phd_params(np.float64)
        state = phd.init_state(model, pcfg, np.zeros(2), dtype)
        z = np.asarray(
            [[0.5, 0.5], [1.0, -0.5], [0, 0], [0, 0]], np.float64
        )
        zmask = np.asarray([True, True, False, False])
        odo0 = np.asarray([0.1, 0.0])
    else:  # prm3d bench shapes
        model = models.get("PRM3D")
        cfg = Config()
        pcfg = phd.PHDConfig(
            num_particles=200, max_components=128, max_measurements=24,
            gate_top=8, estimate_cap=48, beam_width=32, beam_meas_cap=24,
            beam_candidates=6, merge_rounds=4,
        )
        dtype = jnp.float32
        params = cfg.phd_params(np.float32)
        state = phd.init_state(
            model, pcfg, np.array([0, 0, 0, 1, 0, 0, 0.0]), dtype
        )
        rng = np.random.default_rng(3)
        z = np.zeros((24, 3), np.float32)
        z[:12] = rng.uniform(-1, 1, (12, 3)) * [80, 60, 0.6] + [0, 0, 1.0]
        zmask = np.arange(24) < 12
        odo0 = np.asarray([0.02, 0, 0, 0, 0, 0.01], np.float32)
    return model, cfg, pcfg, params, state, z, zmask, odo0


model, cfg, pcfg, params, state, z, zmask, odo0 = build_case(case)

mesh = make_mesh()  # all global devices on the particles axis
sstate = multihost.shard_state_global(state, mesh)
step = make_sharded_step(model, pcfg, mesh, slam=True)

key = jax.random.PRNGKey(7)
for i in range(3):
    key, sub = jax.random.split(key)
    odo = odo0 * (i + 1)
    sstate = step(params, sstate, odo, z, zmask, np.asarray(sub))

checks = jax.jit(
    lambda s: (
        jnp.sum(s.pose),
        jnp.sum(s.logweight),
        jnp.sum(jnp.where(s.maps.logw > -1e29, jnp.exp(s.maps.logw), 0.0)),
    ),
    out_shardings=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
)(sstate)
pose_sum, logw_sum, mass = [
    float(np.asarray(c.addressable_data(0))) for c in checks
]
print(json.dumps({
    "process": process_id,
    "case": case,
    "n_devices": len(jax.devices()),
    "pose_sum": pose_sum,
    "logw_sum": logw_sum,
    "map_mass": mass,
}), flush=True)
