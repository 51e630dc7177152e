"""Distributed Schur-complement bundle adjustment over a device mesh.

The single-device backend (`slam/graph.py`) is a dense batch Gauss-Newton
with a landmark-block Schur complement — the TPU-native replacement for the
reference's gtsam/iSAM2 bridge (reference: isam2/isam2.cpp:46-365). This
module scales the same math to the BASELINE north-star configuration
(10k landmarks, multi-host distributed Schur BA) by sharding the LANDMARK
axis over a mesh:

  * landmarks [L, 3], their masks, and the measurement factors that touch
    them live shard-local (each factor is assigned to the shard that owns
    its landmark — the caller partitions with `partition_factors`);
  * every shard assembles its local Hll (3x3 block-diagonal), Hpl, bl and
    its local contribution to the reduced pose system
        Hred_local = Hpp_meas_local - Hpl Hll^-1 Hpl^T
        bred_local = bp_meas_local - Hpl Hll^-1 bl
  * ONE `psum` over the landmark axis reduces (Hred, bred) — this is the
    only cross-device communication and it rides ICI;
  * the odometry chain + gauge terms are pose-only, added after the psum
    (identically on every shard — replicated compute, no comm);
  * the reduced [T*O, T*O] solve is replicated (Jacobi-preconditioned
    Cholesky, same float32 hygiene as graph._schur_solve);
  * landmark back-substitution dxl = Hll^-1 (bl - Hpl^T dxp) is local.

Per GN iteration the communication volume is exactly one all-reduce of
(T*O)^2 + T*O floats, independent of L — the textbook distributed-Schur
layout (keyframe system replicated, landmark blocks sharded).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..gm import gaussian
from ..slam import graph as _graph


@dataclasses.dataclass(frozen=True)
class DistBAConfig:
    max_poses: int
    max_landmarks: int  # global capacity; must divide by the mesh axis size
    max_factors: int  # global capacity; must divide by the mesh axis size
    gn_iters: int = 5
    damping: float = 1e-6


def make_landmark_mesh(n_shards=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = n_shards if n_shards is not None else len(devices)
    return Mesh(np.asarray(devices[:n]), ("landmarks",))


def partition_factors(cfg: DistBAConfig, n_shards, f_pose, f_lm, f_z, f_mask):
    """Host-side: route each measurement factor to the shard that owns its
    landmark and reindex f_lm to shard-local ids.

    Landmark j lives on shard j // (L // n_shards). Returns factor arrays of
    shape [n_shards * Fl, ...] laid out so a `landmarks`-axis sharding makes
    every factor local to its landmark's shard. Raises if any shard's
    factors overflow its local capacity."""
    l_local = cfg.max_landmarks // n_shards
    f_local = cfg.max_factors // n_shards
    f_pose = np.asarray(f_pose)
    f_lm = np.asarray(f_lm)
    f_z = np.asarray(f_z)
    f_mask = np.asarray(f_mask)

    out_pose = np.zeros((n_shards, f_local), np.int32)
    out_lm = np.zeros((n_shards, f_local), np.int32)
    out_z = np.zeros((n_shards, f_local, f_z.shape[-1]), f_z.dtype)
    out_mask = np.zeros((n_shards, f_local), bool)
    fill = np.zeros(n_shards, np.int64)
    owner = f_lm // l_local
    for i in np.flatnonzero(f_mask):
        s = owner[i]
        k = fill[s]
        if k >= f_local:
            raise ValueError(
                f"shard {s} overflows local factor capacity {f_local}"
            )
        out_pose[s, k] = f_pose[i]
        out_lm[s, k] = f_lm[i] - s * l_local
        out_z[s, k] = f_z[i]
        out_mask[s, k] = True
        fill[s] += 1
    return (
        out_pose.reshape(-1),
        out_lm.reshape(-1),
        out_z.reshape(-1, f_z.shape[-1]),
        out_mask.reshape(-1),
    )


def _meas_normal_contrib(model, cfg, o, poses, landmarks_l, lm_mask_l,
                         f_pose, f_lm, f_z, f_mask, meas_info):
    """Shard-local measurement-factor blocks of the normal equations.

    Same linearization as graph._linearize_measurements
    (PixelRangeFactor.cpp:76-110 residual/jacobian form) but indexed into
    the LOCAL landmark slab."""
    t = cfg.max_poses
    l_local = landmarks_l.shape[0]
    dtype = poses.dtype

    pose = poses[f_pose]  # [Fl, S]
    lm = _graph._safe_landmark(
        model, pose, landmarks_l[f_lm], f_mask
    )
    r = model.measure(model.params, pose, lm) - f_z
    jp = model.jac_pose(model.params, pose, lm)  # [Fl, D, O]
    jl = model.jac_landmark(model.params, pose, lm)  # [Fl, D, 3]

    wm = f_mask.astype(dtype)
    jp_w = jnp.einsum("de,feb->fdb", meas_info, jp) * wm[:, None, None]
    jl_w = jnp.einsum("de,feb->fdb", meas_info, jl) * wm[:, None, None]

    hpp = jnp.zeros((t * o, t * o), dtype)
    hpl = jnp.zeros((t * o, l_local * 3), dtype)
    hll = jnp.zeros((l_local, 3, 3), dtype)
    bp = jnp.zeros((t * o,), dtype)
    bl = jnp.zeros((l_local, 3), dtype)

    hpp = _graph._scatter_block(
        hpp, jnp.einsum("fba,fbc->fac", jp, jp_w), f_pose, f_pose, o, o
    )
    hpl = _graph._scatter_block(
        hpl, jnp.einsum("fba,fbc->fac", jp, jl_w), f_pose, f_lm, o, 3
    )
    hll = hll.at[f_lm].add(jnp.einsum("fba,fbc->fac", jl, jl_w))
    bp = bp.at[
        (f_pose[:, None] * o + jnp.arange(o)[None, :]).reshape(-1)
    ].add(-jnp.einsum("fba,fb->fa", jp_w, r).reshape(-1))
    bl = bl.at[f_lm].add(-jnp.einsum("fba,fb->fa", jl_w, r))
    return hpp, hpl, hll, bp, bl


def _chain_normal_contrib(model, cfg, o, poses, between, between_mask,
                          motion_info):
    """Pose-only odometry-chain blocks (replicated on every shard;
    graph.build_normal_equations odometry section)."""
    t = cfg.max_poses
    dtype = poses.dtype
    st = _FakeState(poses, between)
    r, jprev, jcur = _graph._linearize_between(model, st)
    w = between_mask.astype(dtype)
    idx = jnp.arange(t)
    prev_idx = jnp.maximum(idx - 1, 0)
    jprev_w = jnp.einsum("de,teb->tdb", motion_info, jprev) * w[:, None, None]
    jcur_w = jnp.einsum("de,teb->tdb", motion_info, jcur) * w[:, None, None]
    hpp = jnp.zeros((t * o, t * o), dtype)
    bp = jnp.zeros((t * o,), dtype)
    hpp = _graph._scatter_block(
        hpp, jnp.einsum("tba,tbc->tac", jprev, jprev_w), prev_idx, prev_idx,
        o, o,
    )
    hpp = _graph._scatter_block(
        hpp, jnp.einsum("tba,tbc->tac", jprev, jcur_w), prev_idx, idx, o, o
    )
    hpp = _graph._scatter_block(
        hpp, jnp.einsum("tba,tbc->tac", jcur, jprev_w), idx, prev_idx, o, o
    )
    hpp = _graph._scatter_block(
        hpp, jnp.einsum("tba,tbc->tac", jcur, jcur_w), idx, idx, o, o
    )
    bp = bp.at[
        (prev_idx[:, None] * o + jnp.arange(o)[None, :]).reshape(-1)
    ].add(-jnp.einsum("tba,tb->ta", jprev_w, r).reshape(-1))
    bp = bp.at[
        (idx[:, None] * o + jnp.arange(o)[None, :]).reshape(-1)
    ].add(-jnp.einsum("tba,tb->ta", jcur_w, r).reshape(-1))
    return hpp, bp


class _FakeState:
    """Duck-typed view with just the fields graph._linearize_between reads."""

    def __init__(self, poses, between):
        self.poses = poses
        self.between = between


def make_dist_gauss_newton(model, cfg: DistBAConfig, mesh,
                           axis_name="landmarks"):
    """jit-compiled distributed GN solve.

    Inputs (global shapes; L/F axes sharded over `axis_name`):
      poses [T, S] (replicated), n_poses, pose_fixed [T], between [T, O],
      between_mask [T], landmarks [L, 3], lm_mask [L],
      f_pose [F], f_lm [F] (SHARD-LOCAL landmark ids from
      `partition_factors`), f_z [F, D], f_mask [F],
      motion_info [O, O], meas_info [D, D].
    Returns (poses [T, S] replicated, landmarks [L, 3] sharded).
    """
    o = model.pose.odo_dim
    n_shards = mesh.shape[axis_name]
    if cfg.max_landmarks % n_shards or cfg.max_factors % n_shards:
        raise ValueError("landmark/factor capacity must divide the mesh axis")

    def local_solve(poses, n_poses, pose_fixed, between, between_mask,
                    landmarks_l, lm_mask_l, f_pose, f_lm, f_z, f_mask,
                    motion_info, meas_info):
        dtype = poses.dtype
        t = cfg.max_poses
        eye3 = jnp.eye(3, dtype=dtype)

        def iteration(_, carry):
            poses, landmarks_l = carry
            hpp_m, hpl, hll, bp_m, bl = _meas_normal_contrib(
                model, cfg, o, poses, landmarks_l, lm_mask_l,
                f_pose, f_lm, f_z, f_mask, meas_info,
            )
            hll_active = jnp.where(
                lm_mask_l[:, None, None], hll + cfg.damping * eye3, eye3
            )
            hll_inv = gaussian.inv(hll_active)
            hpl_b = hpl.reshape(t * o, -1, 3)
            hpl_hllinv = jnp.einsum("nlb,lbc->nlc", hpl_b, hll_inv)
            hred_local = hpp_m - jnp.einsum("nlc,mlc->nm", hpl_hllinv, hpl_b)
            bred_local = bp_m - jnp.einsum("nlc,lc->n", hpl_hllinv, bl)

            # the ONLY collective: reduce the pose system over landmark shards
            hred = jax.lax.psum(hred_local, axis_name)
            bred = jax.lax.psum(bred_local, axis_name)

            # replicated pose-only terms: odometry chain + gauge pinning
            hpp_c, bp_c = _chain_normal_contrib(
                model, cfg, o, poses, between, between_mask, motion_info
            )
            hred = hred + hpp_c
            bred = bred + bp_c
            active = (jnp.arange(t) < n_poses) & ~pose_fixed
            free = jnp.repeat(active, o)
            hred = jnp.where(free[:, None] & free[None, :], hred, 0.0)
            hred = hred + jnp.diag(jnp.where(free, 0.0, 1.0))
            bred = jnp.where(free, bred, 0.0)

            eps = jnp.finfo(dtype).eps
            lam = cfg.damping + 100.0 * eps * jnp.max(jnp.diagonal(hred))
            hred = hred + lam * jnp.eye(t * o, dtype=dtype)
            dscale = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(hred), 1e-12))
            hred_s = hred * dscale[:, None] * dscale[None, :]
            chol = jax.scipy.linalg.cho_factor(hred_s)
            dxp = dscale * jax.scipy.linalg.cho_solve(chol, dscale * bred)

            # local landmark back-substitution
            resid = bl - jnp.einsum("nlb,n->lb", hpl_b, dxp)
            dxl = jnp.einsum("lbc,lc->lb", hll_inv, resid)
            dxl = jnp.where(lm_mask_l[:, None], dxl, 0.0)

            new_poses = model.pose.add(poses, dxp.reshape(t, o))
            act = (jnp.arange(t) < n_poses)[:, None]
            new_poses = jnp.where(act, new_poses, poses)
            return new_poses, landmarks_l + dxl

        return jax.lax.fori_loop(
            0, cfg.gn_iters, iteration, (poses, landmarks_l)
        )

    rep = P()
    lsh = P(axis_name)
    try:
        fn = shard_map(
            local_solve,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, lsh, lsh, lsh, lsh, lsh, lsh,
                      rep, rep),
            out_specs=(rep, lsh),
            check_vma=False,
        )
    except TypeError:  # older jax: check_rep instead of check_vma
        fn = shard_map(
            local_solve,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, lsh, lsh, lsh, lsh, lsh, lsh,
                      rep, rep),
            out_specs=(rep, lsh),
            check_rep=False,
        )
    return jax.jit(fn)


def shard_ba_inputs(mesh, axis_name, landmarks, lm_mask, f_pose, f_lm, f_z,
                    f_mask):
    """device_put the landmark/factor arrays with the landmark-axis sharding
    (factor arrays must already be partitioned via `partition_factors`)."""
    sh = NamedSharding(mesh, P(axis_name))
    put = lambda x: jax.device_put(x, sh)
    return put(landmarks), put(lm_mask), put(f_pose), put(f_lm), put(f_z), \
        put(f_mask)
