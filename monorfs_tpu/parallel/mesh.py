"""Device-mesh sharding for the PHD filter.

The reference's only parallel axis is a Parallel.For over particles
(reference: PHDNavigator.cs:326-339, Config.NParallel=8 threads). Here the
particle axis is a first-class mesh axis: every per-particle array in
PHDState shards over it, and XLA inserts the psum for the weight
normalization and the all-gather for systematic resampling automatically
from the sharding annotations. A `components` mesh axis is reserved for
sharding very large per-particle maps (100k particles x 10k landmarks
configs use a 2D layout).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_particle_shards=None, n_component_shards=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_particle_shards is None:
        n_particle_shards = len(devices) // n_component_shards
    mesh_devices = np.asarray(
        devices[: n_particle_shards * n_component_shards]
    ).reshape(n_particle_shards, n_component_shards)
    return Mesh(mesh_devices, ("particles", "components"))


def state_sharding(mesh):
    """Pytree-prefix sharding for PHDState: per-particle arrays split over
    the `particles` mesh axis, the best-particle scalar replicates."""
    from ..slam.phd import PHDState

    particle = NamedSharding(mesh, P("particles"))
    replicated = NamedSharding(mesh, P())
    return PHDState(
        pose=particle, logweight=particle, maps=particle, best=replicated,
        ancestor=particle,
    )


def shard_state(state, mesh):
    from ..slam.phd import PHDState

    sh = state_sharding(mesh)
    return PHDState(
        pose=jax.device_put(state.pose, sh.pose),
        logweight=jax.device_put(state.logweight, sh.logweight),
        maps=jax.tree.map(lambda x: jax.device_put(x, sh.maps), state.maps),
        best=jax.device_put(state.best, sh.best),
        ancestor=jax.device_put(state.ancestor, sh.ancestor),
    )


def make_sharded_step(model, cfg, mesh, slam=True):
    """jit the full PHD SLAM step with particle-axis shardings. The
    per-particle map update is embarrassingly parallel; the weight
    normalization / argmax / ESS reduce over the particle axis (psum /
    all-reduce over ICI) and the conditional systematic resampling gathers
    particle payloads across shards (all-gather) -- all inserted by XLA from
    the annotations below."""
    from ..slam import phd

    # pallas_beam off: a pallas_call is opaque to the SPMD partitioner, so
    # the XLA beam path keeps the particle axis cleanly sharded (a sharded
    # pallas beam would need shard_map; the beam is lane-local per particle
    # so this is a straightforward follow-up)
    step = phd.make_slam_step(model, cfg, slam=slam, pallas_beam=False)
    sh = state_sharding(mesh)
    rep = NamedSharding(mesh, P())

    if slam:
        fn = lambda params, state, odometry, z, z_mask, key: step(
            params, state, odometry, z, z_mask, key
        )
        in_sh = (rep, sh, rep, rep, rep, rep)
    else:
        fn = lambda params, state, odometry, z, z_mask, key, true_pose: step(
            params, state, odometry, z, z_mask, key, true_pose=true_pose
        )
        in_sh = (rep, sh, rep, rep, rep, rep, rep)

    return jax.jit(fn, in_shardings=in_sh, out_shardings=sh)
