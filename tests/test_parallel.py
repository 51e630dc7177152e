"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY §4: step-level oracles under a mesh as the multi-node-without-a-
cluster mechanism)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monorfs_tpu import models
from monorfs_tpu.config import Config
from monorfs_tpu.parallel import make_mesh, make_sharded_step, shard_state
from monorfs_tpu.slam import phd


@pytest.fixture(scope="module")
def setup():
    model = models.get("Linear2D")
    cfg = Config()
    cfg.set_linear2d_defaults()
    pcfg = phd.PHDConfig(
        num_particles=16,
        max_components=16,
        max_measurements=4,
        gate_top=4,
        estimate_cap=8,
        beam_width=16,
    )
    params = cfg.phd_params(np.float64)
    state = phd.init_state(model, pcfg, np.zeros(2), jnp.float64)
    z = jnp.asarray([[0.5, 0.5], [1.0, -0.5], [0, 0], [0, 0]])
    zmask = jnp.asarray([True, True, False, False])
    key = jax.random.PRNGKey(7)
    return model, pcfg, params, state, z, zmask, key


def test_mesh_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    assert mesh.shape["particles"] == 8


def test_sharded_step_matches_single_device(setup):
    """The particle-sharded step computes exactly the same posterior as the
    unsharded step (weight normalization psum, resampling gather included)."""
    model, pcfg, params, state, z, zmask, key = setup
    odo = jnp.asarray([0.1, 0.05])

    step = jax.jit(phd.make_slam_step(model, pcfg, slam=True))
    ref = step(params, state, odo, z, zmask, key)

    mesh = make_mesh()
    sstate = shard_state(state, mesh)
    sharded = make_sharded_step(model, pcfg, mesh, slam=True)
    out = sharded(params, sstate, odo, z, zmask, key)

    np.testing.assert_allclose(np.asarray(out.pose), np.asarray(ref.pose),
                               rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out.logweight), np.asarray(ref.logweight), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out.maps.logw), np.asarray(ref.maps.logw), rtol=1e-10
    )
    assert int(out.best) == int(ref.best)
    # outputs keep the particle sharding
    assert "particles" in str(out.pose.sharding)


def test_sharded_multi_step_stays_consistent(setup):
    model, pcfg, params, state, z, zmask, key = setup
    mesh = make_mesh()
    sharded = make_sharded_step(model, pcfg, mesh, slam=True)
    step = jax.jit(phd.make_slam_step(model, pcfg, slam=True))

    sstate = shard_state(state, mesh)
    rstate = state
    for i in range(3):
        key, sub = jax.random.split(key)
        odo = jnp.asarray([0.1, 0.0]) * (i + 1)
        sstate = sharded(params, sstate, odo, z, zmask, sub)
        rstate = step(params, rstate, odo, z, zmask, sub)
    np.testing.assert_allclose(
        np.asarray(sstate.pose), np.asarray(rstate.pose), rtol=1e-9
    )
