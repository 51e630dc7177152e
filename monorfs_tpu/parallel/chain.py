"""Block-sharded Loopy-PHD smoother: the pose chain as a mesh axis.

The reference smoother holds all T poses in one process and sweeps them
round-robin with stale neighbor messages (LoopyPHDNavigator.cs:369-377);
its FilterMissing is O(T) per node, O(T^2) per sweep (:729-763) — the
scalability cliff called out in SURVEY §5. Here the trajectory is the
sequence-parallel axis:

  * every [T, ...] message array shards into T/N contiguous blocks over the
    `chain` mesh axis;
  * the forward/backward sweeps run the sequential scan INSIDE each block
    (Gauss-Seidel locally — same per-node math as slam/loopy.py, the step
    functions are shared) while cross-block boundaries use the neighbor's
    pre-sweep fused belief, exchanged with ONE `ppermute` per direction (a
    halo exchange, structurally the ring-attention pattern). Across sweeps
    this is block-Jacobi message passing: information travels one full
    block per sweep, and the reference's own schedule is equally stale —
    it updates one node per tick against old neighbors;
  * the B leave-block-out cavity maps (the O(B·T) FilterMissing
    replacement) are distributed B/N per device and all-gathered — the
    heaviest stage of the sweep becomes N-way parallel;
  * per-node map-message fits (the gradient-ascent GuidedFitMixture
    equivalent) are node-local and run on the owner shard;
  * the per-sweep shear gauge fix reduces with `psum`.

With N=1 the halo is the scan carry itself and the sweep is numerically
identical to the sequential one; with N>1 the fixed point is unchanged and
the sweeps converge to the same error regime with a couple of extra sweeps
for boundary staleness. Both claims are tested in tests/test_chain.py
(N=1 parity to 1e-9; 4-device convergence on the virtual CPU mesh), and the
dry run in __graft_entry__.dryrun_multichip exercises an 8-way sweep.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gm import gaussian
from ..slam import loopy
from ..slam.loopy import LoopyState

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def make_chain_mesh(n_blocks=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = n_blocks if n_blocks is not None else len(devices)
    return Mesh(np.asarray(devices[:n]), ("chain",))


def shard_loopy_inputs(mesh, state: LoopyState, odometry, z, z_mask,
                       axis_name="chain"):
    """device_put the smoother state + per-frame data with the chain
    sharding (axis 0 = trajectory nodes)."""
    sh = NamedSharding(mesh, P(axis_name))
    put = lambda x: jax.device_put(x, sh)
    return (
        jax.tree.map(put, state),
        put(odometry),
        put(z),
        put(z_mask),
    )


def _halo_from_prev(x, axis_name, n):
    """Last element of the previous block (wraps at block 0; callers mask)."""
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(x[-1:], axis_name, perm)[0]


def _halo_from_next(x, axis_name, n):
    """First element of the next block (wraps at the last block)."""
    perm = [(i, (i - 1) % n) for i in range(n)]
    return jax.lax.ppermute(x[:1], axis_name, perm)[0]


def _shift_down(local, halo):
    """Local view of roll(global, 1): [halo, local[0], ..., local[-2]]."""
    return jnp.concatenate([halo[None], local[:-1]], axis=0)


def _shift_up(local, halo):
    """Local view of roll(global, -1): [local[1], ..., local[-1], halo]."""
    return jnp.concatenate([local[1:], halo[None]], axis=0)


def _forward_block(model, state: LoopyState, odometry, motion_cov,
                   axis_name, n):
    step = loopy.make_forward_step(model, motion_cov)
    tb = state.lp.shape[0]
    offset = jax.lax.axis_index(axis_name) * tb
    gidx = offset + jnp.arange(tb)

    lp_prev = _shift_down(state.lp, _halo_from_prev(state.lp, axis_name, n))
    fut_prev_mean = _shift_down(
        state.future_mean, _halo_from_prev(state.future_mean, axis_name, n)
    )
    fut_prev_cov = _shift_down(
        state.future_cov, _halo_from_prev(state.future_cov, axis_name, n)
    )
    odo_prev = _shift_down(odometry, _halo_from_prev(odometry, axis_name, n))
    active = (gidx >= 1)[:, None] & state.node_mask[:, None]

    inputs = (
        lp_prev, state.lp, fut_prev_mean, fut_prev_cov, odo_prev,
        state.past_mean, state.past_cov, state.future_mean, state.future_cov,
        state.map_const, state.map_mean, state.map_cov, state.map_logw,
        active,
    )
    # cross-block carry: the neighbor's PRE-sweep fused belief (block-Jacobi
    # staleness — one stale value per boundary per sweep). Block 0's wrapped
    # halo is never read: node 0 is inactive and its fused is restored below.
    carry0 = (
        _halo_from_prev(state.fused_mean, axis_name, n),
        _halo_from_prev(state.fused_cov, axis_name, n),
    )
    _, (past_mean, past_cov, fused_mean, fused_cov) = jax.lax.scan(
        step, carry0, inputs
    )
    # node 0 (global) keeps its Dirac past message and re-fuses in place
    is0 = offset == 0
    past_mean = past_mean.at[0].set(
        jnp.where(is0, state.past_mean[0], past_mean[0])
    )
    past_cov = past_cov.at[0].set(
        jnp.where(is0, state.past_cov[0], past_cov[0])
    )
    f0_mean, f0_cov = loopy._fuse3_single(
        model,
        state._replace(past_mean=past_mean, past_cov=past_cov),
        0,
    )
    fused_mean = fused_mean.at[0].set(
        jnp.where(is0, f0_mean, fused_mean[0])
    )
    fused_cov = fused_cov.at[0].set(jnp.where(is0, f0_cov, fused_cov[0]))
    return state._replace(
        past_mean=past_mean, past_cov=past_cov,
        fused_mean=fused_mean, fused_cov=fused_cov,
    )


def _backward_block(model, state: LoopyState, odometry, motion_cov,
                    axis_name, n):
    step = loopy.make_backward_step(model, motion_cov)
    tb = state.lp.shape[0]
    offset = jax.lax.axis_index(axis_name) * tb
    gidx = offset + jnp.arange(tb)
    n_nodes = jax.lax.psum(jnp.sum(state.node_mask), axis_name)

    lp_next = _shift_up(state.lp, _halo_from_next(state.lp, axis_name, n))
    past_next_mean = _shift_up(
        state.past_mean, _halo_from_next(state.past_mean, axis_name, n)
    )
    past_next_cov = _shift_up(
        state.past_cov, _halo_from_next(state.past_cov, axis_name, n)
    )
    active = ((gidx < n_nodes - 1) & state.node_mask)[:, None]

    inputs = (
        state.lp, lp_next, past_next_mean, past_next_cov, odometry,
        state.future_mean, state.future_cov, state.past_mean, state.past_cov,
        state.map_const, state.map_mean, state.map_cov, state.map_logw,
        active,
    )
    rev = lambda x: jnp.flip(x, axis=0)
    inputs_rev = jax.tree.map(rev, inputs)
    carry0 = (
        _halo_from_next(state.fused_mean, axis_name, n),
        _halo_from_next(state.fused_cov, axis_name, n),
    )
    _, outs = jax.lax.scan(step, carry0, inputs_rev)
    fut_mean, fut_cov, fused_mean, fused_cov = jax.tree.map(rev, outs)
    return state._replace(
        future_mean=fut_mean, future_cov=fut_cov,
        fused_mean=fused_mean, fused_cov=fused_cov,
    )


def _map_block(model, cfg, params, state: LoopyState, z, z_mask, temperature,
               grad_clip, grad_rate, axis_name, n, causal):
    """Sharded map-message stage: cavity maps distributed over the mesh
    (B/N leave-block-out passes per device, all-gathered), per-node fits
    local to the owner shard."""
    tb = state.lp.shape[0]
    offset = jax.lax.axis_index(axis_name) * tb
    gidx = offset + jnp.arange(tb)

    pf_mean, pf_cov = loopy._fuse(
        state.past_mean, state.past_cov, state.future_mean, state.future_cov
    )
    # global per-frame data for the trajectory-wide map filters
    gather = lambda x: jax.lax.all_gather(x, axis_name, tiled=True)
    lp_g = gather(state.lp)
    fused_g = gather(state.fused_mean)
    z_g = gather(z)
    zm_g = gather(z_mask)
    nm_g = gather(state.node_mask)
    map_poses = model.pose.add(lp_g, fused_g)

    if causal:
        # inherently sequential over T: replicated compute, local slice
        jmaps, jcovs, jvalids = loopy.causal_maps(
            model, cfg, params, map_poses, z_g, zm_g, nm_g
        )
        jm_l = jax.lax.dynamic_slice_in_dim(jmaps, offset, tb)
        jc_l = jax.lax.dynamic_slice_in_dim(jcovs, offset, tb)
        jv_l = jax.lax.dynamic_slice_in_dim(jvalids, offset, tb)

        def node_maps(i):
            return jm_l[i], jc_l[i], jv_l[i]
    else:
        if cfg.blocks % n:
            raise ValueError("cfg.blocks must divide the chain axis size")
        bl = cfg.blocks // n
        my_blocks = jax.lax.axis_index(axis_name) * bl + jnp.arange(bl)
        jm, jc, jv = jax.vmap(
            lambda b: loopy.cavity_map_block(
                model, cfg, params, map_poses, z_g, zm_g, b, nm_g
            )
        )(my_blocks)
        jmaps = gather(jm)  # [B, J, 3]
        jcovs = gather(jc)
        jvalids = gather(jv)

        def node_maps(i):
            b = (offset + i) % cfg.blocks
            return jmaps[b], jcovs[b], jvalids[b]

    def node(i):
        jmap, jcov, jvalid = node_maps(i)
        has_meas = jnp.any(z_mask[i])
        const, mm, mc, mw = loopy.fit_map_message(
            model, cfg, params, state.lp[i], pf_mean[i], pf_cov[i], jmap,
            jcov, jvalid, z[i], z_mask[i], temperature, grad_clip, grad_rate,
        )
        no_meas_w = jnp.full((mw.shape[0],), loopy.DEAD, mw.dtype).at[-1].set(0.0)
        mw = jnp.where(has_meas, mw, no_meas_w)
        return const, mm, mc, mw

    m_const, m_mean, m_cov, m_logw = jax.vmap(node)(jnp.arange(tb))
    state = state._replace(
        map_const=m_const, map_mean=m_mean, map_cov=m_cov, map_logw=m_logw
    )
    fused_mean, fused_cov = loopy._fuse3(state)
    return state._replace(fused_mean=fused_mean, fused_cov=fused_cov)


def _gauge_fix_block(state: LoopyState, axis_name, n):
    """Distributed shear gauge fix (loopy.gauge_fix_shear with psum'd
    moments)."""
    tb = state.lp.shape[0]
    offset = jax.lax.axis_index(axis_name) * tb
    ts = jnp.where(
        state.node_mask,
        (offset + jnp.arange(tb)).astype(state.fused_mean.dtype),
        0.0,
    )
    num = jax.lax.psum(
        jnp.sum(ts[:, None] * state.fused_mean, axis=0), axis_name
    )
    den = jnp.maximum(jax.lax.psum(jnp.sum(ts * ts), axis_name), 1.0)
    b = num / den
    fixed = state.fused_mean - ts[:, None] * b[None, :]
    return state._replace(
        fused_mean=jnp.where(state.node_mask[:, None], fixed,
                             state.fused_mean)
    )


def make_sharded_sweep(model, cfg, mesh, axis_name="chain", causal=False,
                       damping=0.6):
    """jit-compiled block-parallel Jacobi sweep over the chain mesh axis.

    Same signature as loopy.make_sweep's sweep: (params, state, odometry, z,
    z_mask, temperature, grad_clip, grad_rate, motion_cov) -> state, with
    the [T, ...] axes of state/odometry/z/z_mask sharded over `axis_name`
    (use shard_loopy_inputs)."""
    n = mesh.shape[axis_name]
    if cfg.max_nodes % n:
        raise ValueError("cfg.max_nodes must divide the chain axis size")

    def local_sweep(params, state, odometry, z, z_mask, temperature,
                    grad_clip, grad_rate, motion_cov):
        old_mean, old_cov = state.fused_mean, state.fused_cov
        state = _forward_block(model, state, odometry, motion_cov,
                               axis_name, n)
        state = _backward_block(model, state, odometry, motion_cov,
                                axis_name, n)
        state = _map_block(model, cfg, params, state, z, z_mask, temperature,
                           grad_clip, grad_rate, axis_name, n, causal)
        if damping < 1.0:
            a = jnp.asarray(damping, state.fused_mean.dtype)
            inew = gaussian.inv(state.fused_cov)
            iold = gaussian.inv(old_cov)
            info = a * inew + (1 - a) * iold
            vec = a * jnp.einsum("...ij,...j->...i", inew, state.fused_mean) \
                + (1 - a) * jnp.einsum("...ij,...j->...i", iold, old_mean)
            cov = gaussian.inv(info)
            mean = jnp.einsum("...ij,...j->...i", cov, vec)
            state = state._replace(fused_mean=mean, fused_cov=cov)
        if cfg.gauge_fix:
            state = _gauge_fix_block(state, axis_name, n)
        if cfg.relinearize:
            # per-node tangent transport: no halo dependencies, so the
            # sequential loopy.relinearize applies to each block verbatim
            state = loopy.relinearize(model, state)
        return state

    sh = P(axis_name)
    rep = P()
    state_spec = LoopyState(
        lp=sh, past_mean=sh, past_cov=sh, future_mean=sh, future_cov=sh,
        map_const=sh, map_mean=sh, map_cov=sh, map_logw=sh,
        fused_mean=sh, fused_cov=sh, node_mask=sh,
    )
    kwargs = dict(
        mesh=mesh,
        in_specs=(rep, state_spec, sh, sh, sh, rep, rep, rep, rep),
        out_specs=state_spec,
    )
    try:
        fn = shard_map(local_sweep, check_vma=False, **kwargs)
    except TypeError:  # older jax
        fn = shard_map(local_sweep, check_rep=False, **kwargs)
    return jax.jit(fn)
