"""Multi-host (multi-process) distribution entry point.

The reference framework is strictly single-process (SURVEY §2: its only
parallelism is Parallel.For threads, PHDNavigator.cs:326-339); the rebuild's
BASELINE north star demands >=0.8 scaling efficiency at N>=2 hosts. This
module is the `jax.distributed` bring-up: call `initialize()` ONCE per
process before any other jax call, after which `jax.devices()` spans the
whole pod and the existing mesh builders (parallel.make_mesh,
chain.make_chain_mesh, dist_ba.make_landmark_mesh) transparently produce
multi-host meshes. The collectives the sharded kernels already emit (weight
normalization psum, resampling all-gather, pose-chain ppermute halos, Schur
psum) then ride ICI within a slice and DCN across hosts — no kernel changes.

Without TPU pod hardware this is validated by N local CPU processes:
tests/test_multihost.py spawns a coordinator + workers on localhost, each
with a virtual CPU device count, and checks the 2-process x 4-device run
reproduces the single-process 8-device posterior.
"""

import os


def initialize(coordinator_address, num_processes, process_id,
               local_device_count=None):
    """Bring up the jax distributed runtime for one process of a multi-host
    run.

    coordinator_address: "host:port" of process 0.
    local_device_count: if given, force this many virtual CPU devices per
    process (the no-hardware simulation mode; must be set BEFORE jax's
    backends initialize, so call this before importing anything that touches
    jax devices). On real TPU pods leave it None — each host contributes its
    physical chips.
    """
    if local_device_count is not None:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count="
                f"{local_device_count}"
            ).strip()
    import jax

    if local_device_count is not None:
        # a site customization may pin jax_platforms (e.g. to a TPU tunnel);
        # the simulation mode must win or every process grabs the real chip
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax


def distribute(host_value, mesh, pspec):
    """Assemble a global sharded array from a host-replicated value.

    Every process must hold the same full `host_value` (the usual case for
    states built deterministically from a config); each process donates the
    shards it addresses. Works on single-process meshes too."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding

    arr = np.asarray(host_value)
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def shard_state_global(state, mesh):
    """PHDState -> globally sharded PHDState over the `particles` mesh axis
    (the multi-process analogue of mesh.shard_state)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..slam.phd import PHDState

    part = P("particles")
    rep = P()
    return PHDState(
        pose=distribute(state.pose, mesh, part),
        logweight=distribute(state.logweight, mesh, part),
        maps=jax.tree.map(
            lambda x: distribute(x, mesh, part), state.maps
        ),
        best=distribute(state.best, mesh, rep),
        ancestor=distribute(state.ancestor, mesh, part),
    )


def replicated(value, mesh):
    """Host-replicated value -> globally replicated jax array."""
    from jax.sharding import PartitionSpec as P

    return distribute(value, mesh, P())
