"""Chain-sharded Loopy-PHD smoother (parallel/chain.py): N=1 parity with the
sequential Jacobi sweep, and end-to-end convergence on a multi-device mesh.

The sequence-parallel axis of SURVEY §5 (pose chain block-sharded over the
mesh, ppermute halos); reference schedule being parallelized:
LoopyPHDNavigator.cs:369-377."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end runs; deselect with -m "not slow"

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu.parallel import chain
from monorfs_tpu.slam import loopy
from monorfs_tpu.slam.loopynav import LoopyPHDNavigator

from test_loopy import make_problem


def _navigator(frames, blocks, max_nodes=None, **loopy_kwargs):
    model, cfg, truth, readings, measurements, est = make_problem(
        frames=frames
    )
    nav = LoopyPHDNavigator(
        model, cfg, est, readings, measurements, max_meas=16,
        loopy_cfg=loopy.LoopyConfig(
            max_nodes=max_nodes or frames, max_meas=16, mix_cap=4,
            blocks=blocks, ga_iters=6, jmap_cap=16, beam_width=16,
            **loopy_kwargs,
        ),
        link_cov=np.diag([0.05 ** 2, 0.05 ** 2]),
    )
    return model, nav, truth, est


def _run_sharded(model, nav, mesh, n_sweeps):
    """Mirror LoopyPHDNavigator.sweep's schedule through the sharded sweep.

    The sequential-refit first pass (loopy.make_sequential_refit) is a
    single growing-map scan -- inherently serial, so the sharded schedule
    runs it once unsharded (via nav.sweep()) and block-shards the Jacobi
    smoothing sweeps that follow, exactly like the navigator."""
    s0 = 0
    if nav._refit is not None and nav.lcfg.refit_passes > 0:
        nav.sweep()
        s0 = nav.sweeps
    sweep_causal = chain.make_sharded_sweep(model, nav.lcfg, mesh, causal=True)
    sweep_cavity = chain.make_sharded_sweep(model, nav.lcfg, mesh)
    st, odo, z, zm = chain.shard_loopy_inputs(
        mesh, nav.state, nav.odometry, nav.z, nav.z_mask
    )
    for s in range(s0, n_sweeps):
        temperature = jnp.asarray(5.0 / (s + 1), nav.dtype)
        use_causal = s == 0 and nav._refit is None
        fn = sweep_causal if use_causal else sweep_cavity
        st = fn(nav.params, st, odo, z, zm, temperature, nav.grad_clip,
                nav.grad_rate, nav.motion_cov)
    return st


def test_sharded_sweep_n1_matches_sequential():
    """With one block the halo is the scan carry itself: the sharded sweep
    must be numerically identical to loopy.make_sweep (float64). refit=False
    isolates the Jacobi sweep machinery under comparison (the refit pass is
    shared verbatim between the two schedules, so parity there is trivial)."""
    model, nav, truth, est = _navigator(frames=24, blocks=4, refit=False,
                                        gauge_fix=False, anchor_sigma=2.0)
    mesh = chain.make_chain_mesh(1)
    st_sh = _run_sharded(model, nav, mesh, n_sweeps=2)

    for s in range(2):
        nav.sweep()
    st_seq = nav.state

    for name in ("fused_mean", "fused_cov", "past_mean", "past_cov",
                 "future_mean", "future_cov", "map_mean", "map_logw"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_sh, name)),
            np.asarray(getattr(st_seq, name)),
            rtol=1e-9, atol=1e-9, err_msg=name,
        )


def test_sharded_sweep_multidevice_improves_dead_reckoning():
    """4-block sharded sweeps on the virtual mesh converge: same problem and
    improvement bar as the sequential smoother test
    (test_loopy.test_smoother_improves_dead_reckoning), plus agreement with
    the sequential trajectory (block-Jacobi staleness only at 3 boundaries).
    max_nodes pads past the trajectory length so the masked-tail handling of
    the sharded sweep is exercised too."""
    frames = 50
    # DEFAULT LoopyConfig quality knobs (gauge_fix/anchor/refit): the
    # sharded path must deliver the navigator's default-quality results
    model, nav, truth, est = _navigator(frames=frames, blocks=4,
                                        max_nodes=52)
    assert len(jax.devices()) >= 4
    mesh = chain.make_chain_mesh(4)
    # block-Jacobi staleness propagates information one block per sweep, so
    # the sharded schedule needs a couple more sweeps than the sequential
    # Gauss-Seidel-within-block one to cross all 3 boundaries
    st_sh = _run_sharded(model, nav, mesh, n_sweeps=7)

    for _ in range(7):
        nav.sweep()

    traj_sh = np.asarray(loopy.fused_trajectory(model, st_sh))[:frames]
    traj_seq = nav.trajectory[:frames]
    err0 = np.sqrt(np.mean(np.sum((est - truth) ** 2, axis=1)))
    err_sh = np.sqrt(np.mean(np.sum((traj_sh - truth) ** 2, axis=1)))
    err_seq = np.sqrt(np.mean(np.sum((traj_seq - truth) ** 2, axis=1)))

    assert np.isfinite(traj_sh).all()
    assert err_sh < err0 * 0.75, (err_sh, err0)
    # the sharded fixed point is the sequential one; after equal sweep
    # budgets the result lands in the same error regime (boundary staleness
    # costs a constant factor, not divergence)
    assert err_sh < err_seq * 1.5 + 0.01, (err_sh, err_seq)
