"""Batch factor-graph solver: Gauss-Newton with landmark Schur complement.

TPU-native replacement for the reference's gtsam/iSAM2 bridge
(reference: isam2/isam2.cpp:46-365 + PixelRangeFactor.cpp:41-110). Instead
of an incremental Bayes-tree (inherently sequential, pointer-chasing), the
whole graph lives in fixed-capacity dense factor arrays and every update
re-solves by batched Gauss-Newton:

  * between (odometry) factors chain consecutive poses
    (isam2.cpp:234-238);
  * pixel-range measurement factors couple poses and landmarks
    (isam2.cpp:216-232, residual/jacobian form PixelRangeFactor.cpp:76-110,
    here taken from the model registry);
  * pose 0 is pinned (gauge prior, isam2.cpp:167); in mapping mode every
    pose is pinned (the reference's hard prior, isam2.cpp:240-242).

The normal equations are reduced by the Schur complement on the landmark
block: Hll is 3x3-block-diagonal and closed-form invertible, the reduced
pose system is one dense Cholesky solve -- MXU-friendly, and the same
structure scales to multi-device distributed BA by sharding keyframe blocks.
Marginal pose/landmark covariances (for Mahalanobis gating, JSJ^T + R as in
isam2.cpp:258-312) come from the same factorization.
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..gm import gaussian


@dataclasses.dataclass(frozen=True)
class GraphConfig:
    max_poses: int
    max_landmarks: int
    max_factors: int
    gn_iters: int = 5
    damping: float = 1e-6


class GraphState(NamedTuple):
    """Factor arrays + current estimates (all fixed capacity, masked)."""

    poses: jax.Array  # [T, S] estimates
    n_poses: jax.Array  # int32, number of active poses
    landmarks: jax.Array  # [L, 3]
    lm_mask: jax.Array  # [L]
    between: jax.Array  # [T, O]: delta linking pose t-1 -> t
    between_mask: jax.Array  # [T]
    pose_fixed: jax.Array  # [T] poses pinned (mapping mode / gauge)
    f_pose: jax.Array  # [F] int32 pose index per measurement factor
    f_lm: jax.Array  # [F] int32 landmark index
    f_z: jax.Array  # [F, D]
    f_mask: jax.Array  # [F]


def empty_state(model, cfg: GraphConfig, init_pose, dtype=jnp.float32):
    t, l, f = cfg.max_poses, cfg.max_landmarks, cfg.max_factors
    s, o, d = model.pose.state_dim, model.pose.odo_dim, model.meas_dim
    poses = jnp.zeros((t, s), dtype)
    ident = jnp.asarray(init_pose, dtype)
    poses = poses.at[:].set(ident)
    return GraphState(
        poses=poses,
        n_poses=jnp.int32(1),
        landmarks=jnp.zeros((l, 3), dtype),
        lm_mask=jnp.zeros((l,), bool),
        between=jnp.zeros((t, o), dtype),
        between_mask=jnp.zeros((t,), bool),
        pose_fixed=jnp.zeros((t,), bool).at[0].set(True),
        f_pose=jnp.zeros((f,), jnp.int32),
        f_lm=jnp.zeros((f,), jnp.int32),
        f_z=jnp.zeros((f, d), dtype),
        f_mask=jnp.zeros((f,), bool),
    )


def _between_residual(model, prev, cur, delta):
    """e = diff_odometry(cur, prev) - delta in the odometry tangent."""
    return model.pose.diff_odometry(cur, prev) - delta


def _linearize_between(model, state: GraphState):
    """Residuals + Jacobians of the odometry chain wrt the `add` tangent of
    both endpoint poses. [T] factors: factor t links t-1 -> t."""
    prev = jnp.roll(state.poses, 1, axis=0)
    cur = state.poses
    delta = state.between
    o = model.pose.odo_dim

    def res(dprev, dcur, prev1, cur1, delta1):
        return _between_residual(
            model,
            model.pose.add(prev1, dprev),
            model.pose.add(cur1, dcur),
            delta1,
        )

    zero = jnp.zeros((cur.shape[0], o), cur.dtype)
    r = jax.vmap(res)(zero, zero, prev, cur, delta)
    jprev = jax.vmap(jax.jacfwd(res, argnums=0))(zero, zero, prev, cur, delta)
    jcur = jax.vmap(jax.jacfwd(res, argnums=1))(zero, zero, prev, cur, delta)
    return r, jprev, jcur


def _safe_landmark(model, pose, lm, mask):
    """Replace masked-out landmarks with a point safely in front of the
    camera so inactive factors can't generate NaNs (z_local = 0 divisions)."""
    d = model.meas_dim
    safe_z = jnp.zeros(pose.shape[:-1] + (d,), pose.dtype)
    if d == 3:  # pixel-range: range 1 straight ahead
        safe_z = safe_z.at[..., 2].set(1.0)
    safe = model.to_map(model.params, pose, safe_z)
    return jnp.where(mask[..., None], lm, safe)


def _linearize_measurements(model, state: GraphState):
    """Residuals + Jacobians of pixel-range factors
    (PixelRangeFactor.cpp:76-110 equivalents from the model registry)."""
    pose = state.poses[state.f_pose]  # [F, S]
    lm = _safe_landmark(
        model, pose, state.landmarks[state.f_lm], state.f_mask
    )  # [F, 3]
    r = model.measure(model.params, pose, lm) - state.f_z
    jp = model.jac_pose(model.params, pose, lm)  # [F, D, O]
    jl = model.jac_landmark(model.params, pose, lm)  # [F, D, 3]
    return r, jp, jl


def _scatter_block(h, blocks, rows, cols, bs_r, bs_c):
    """Scatter-add [N, br, bc] blocks into dense H at block coords."""
    n, br, bc = blocks.shape
    ri = rows[:, None, None] * bs_r + jnp.arange(br)[None, :, None]
    ci = cols[:, None, None] * bs_c + jnp.arange(bc)[None, None, :]
    ri = jnp.broadcast_to(ri, (n, br, bc)).reshape(-1)
    ci = jnp.broadcast_to(ci, (n, br, bc)).reshape(-1)
    return h.at[ri, ci].add(blocks.reshape(-1))


def build_normal_equations(model, cfg, state: GraphState, motion_info,
                           meas_info):
    """Assemble H dx = b in tangent space.

    motion_info: [O, O] information of the between factors (inv noise cov);
    meas_info: [D, D] information of the measurement factors."""
    t, l = cfg.max_poses, cfg.max_landmarks
    o = model.pose.odo_dim
    dtype = state.poses.dtype

    hpp = jnp.zeros((t * o, t * o), dtype)
    hpl = jnp.zeros((t * o, l * 3), dtype)
    hll = jnp.zeros((l, 3, 3), dtype)
    bp = jnp.zeros((t * o,), dtype)
    bl = jnp.zeros((l, 3), dtype)

    # odometry chain
    r, jprev, jcur = _linearize_between(model, state)
    w = state.between_mask.astype(dtype)
    idx = jnp.arange(t)
    prev_idx = jnp.maximum(idx - 1, 0)
    jprev_w = jnp.einsum("de,teb->tdb", motion_info, jprev) * w[:, None, None]
    jcur_w = jnp.einsum("de,teb->tdb", motion_info, jcur) * w[:, None, None]
    hpp = _scatter_block(
        hpp, jnp.einsum("tba,tbc->tac", jprev, jprev_w), prev_idx, prev_idx, o, o
    )
    hpp = _scatter_block(
        hpp, jnp.einsum("tba,tbc->tac", jprev, jcur_w), prev_idx, idx, o, o
    )
    hpp = _scatter_block(
        hpp, jnp.einsum("tba,tbc->tac", jcur, jprev_w), idx, prev_idx, o, o
    )
    hpp = _scatter_block(
        hpp, jnp.einsum("tba,tbc->tac", jcur, jcur_w), idx, idx, o, o
    )
    bp = bp.at[
        (prev_idx[:, None] * o + jnp.arange(o)[None, :]).reshape(-1)
    ].add(-jnp.einsum("tba,tb->ta", jprev_w, r).reshape(-1))
    bp = bp.at[
        (idx[:, None] * o + jnp.arange(o)[None, :]).reshape(-1)
    ].add(-jnp.einsum("tba,tb->ta", jcur_w, r).reshape(-1))

    # measurement factors
    rm, jp, jl = _linearize_measurements(model, state)
    wm = state.f_mask.astype(dtype)
    jp_w = jnp.einsum("de,feb->fdb", meas_info, jp) * wm[:, None, None]
    jl_w = jnp.einsum("de,feb->fdb", meas_info, jl) * wm[:, None, None]
    hpp = _scatter_block(
        hpp, jnp.einsum("fba,fbc->fac", jp, jp_w), state.f_pose, state.f_pose,
        o, o,
    )
    hpl = _scatter_block(
        hpl, jnp.einsum("fba,fbc->fac", jp, jl_w), state.f_pose, state.f_lm,
        o, 3,
    )
    hll = hll.at[state.f_lm].add(
        jnp.einsum("fba,fbc->fac", jl, jl_w)
    )
    bp = bp.at[
        (state.f_pose[:, None] * o + jnp.arange(o)[None, :]).reshape(-1)
    ].add(-jnp.einsum("fba,fb->fa", jp_w, rm).reshape(-1))
    bl = bl.at[state.f_lm].add(-jnp.einsum("fba,fb->fa", jl_w, rm))

    return hpp, hpl, hll, bp, bl


def _apply_gauges(cfg, state, o, hpp, hpl, bp):
    """Pin fixed poses and deactivate unused pose slots: identity diagonal,
    zero couplings and rhs."""
    t = cfg.max_poses
    active = (jnp.arange(t) < state.n_poses) & ~state.pose_fixed
    free = jnp.repeat(active, o)  # [T*O]
    hpp = jnp.where(free[:, None] & free[None, :], hpp, 0.0)
    hpp = hpp + jnp.diag(jnp.where(free, 0.0, 1.0))
    hpl = jnp.where(free[:, None], hpl, 0.0)
    bp = jnp.where(free, bp, 0.0)
    return hpp, hpl, bp


def _schur_solve(cfg, state, o, hpp, hpl, hll, bp, bl, damping):
    """Schur-complement reduction on the landmark block + dense Cholesky."""
    l = cfg.max_landmarks
    dtype = hpp.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    hll_active = jnp.where(
        state.lm_mask[:, None, None],
        hll + damping * eye3,
        eye3,
    )
    hll_inv = gaussian.inv(hll_active)

    hpl_b = hpl.reshape(-1, l, 3)  # [TO, L, 3]
    hpl_hllinv = jnp.einsum("nlb,lbc->nlc", hpl_b, hll_inv)
    hred = hpp - jnp.einsum("nlc,mlc->nm", hpl_hllinv, hpl_b)
    bred = bp - jnp.einsum("nlc,lc->n", hpl_hllinv, bl)

    # dtype-aware Levenberg damping: the Schur complement cancels exactly for
    # single-factor landmarks, so float32 roundoff can leave hred slightly
    # indefinite; damping relative to the diagonal scale absorbs it
    eps = jnp.finfo(dtype).eps
    lam = damping + 100.0 * eps * jnp.max(jnp.diagonal(hred))
    hred = hred + lam * jnp.eye(hred.shape[0], dtype=dtype)
    # Jacobi preconditioning keeps the reduced solve well-conditioned in
    # float32 (the TPU-native dtype): Hs = D^-1/2 H D^-1/2
    dscale = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(hred), 1e-12))
    hred_s = hred * dscale[:, None] * dscale[None, :]
    chol = jax.scipy.linalg.cho_factor(hred_s)
    dxp = dscale * jax.scipy.linalg.cho_solve(chol, dscale * bred)

    resid = bl - jnp.einsum("nlb,n->lb", hpl_b, dxp)
    dxl = jnp.einsum("lbc,lc->lb", hll_inv, resid)
    dxl = jnp.where(state.lm_mask[:, None], dxl, 0.0)

    def solve(rhs):
        """Hred^-1 @ rhs through the preconditioned factorization."""
        scaled = rhs * dscale[:, None] if rhs.ndim == 2 else rhs * dscale
        out = jax.scipy.linalg.cho_solve(chol, scaled)
        return out * dscale[:, None] if rhs.ndim == 2 else out * dscale

    return dxp, dxl, (solve, hll_inv, hpl_hllinv, hpl_b)


def gauss_newton(model, cfg: GraphConfig, state: GraphState, motion_info,
                 meas_info):
    """Run cfg.gn_iters Gauss-Newton iterations; returns the updated state
    and the final factorization (for marginal covariances)."""
    o = model.pose.odo_dim

    def iteration(i, st):
        hpp, hpl, hll, bp, bl = build_normal_equations(
            model, cfg, st, motion_info, meas_info
        )
        hpp, hpl, bp = _apply_gauges(cfg, st, o, hpp, hpl, bp)
        dxp, dxl, _ = _schur_solve(
            cfg, st, o, hpp, hpl, hll, bp, bl, cfg.damping
        )
        new_poses = model.pose.add(st.poses, dxp.reshape(cfg.max_poses, o))
        active = (jnp.arange(cfg.max_poses) < st.n_poses)[:, None]
        new_poses = jnp.where(active, new_poses, st.poses)
        return st._replace(
            poses=new_poses, landmarks=st.landmarks + dxl
        )

    # pin matmuls to true float32: the TPU default (bfloat16 MXU passes) is
    # fine for the PHD likelihood stages but destroys the normal equations'
    # conditioning -- measured NaN at T~300 poses on-chip, clean on CPU f32
    with jax.default_matmul_precision("highest"):
        state = jax.lax.fori_loop(0, cfg.gn_iters, iteration, state)
    return state


def marginals(model, cfg: GraphConfig, state: GraphState, motion_info,
              meas_info, meas_cov):
    """Marginal covariances from the final linearization:
      - lm_cov [L, 3, 3]: landmark marginal covariance (visualization);
      - pl_cov [L, D, D]: joint (last pose, landmark) covariance projected to
        measurement space, J Sigma J^T + R (isam2.cpp:287-307), used for
        Mahalanobis association gating.
    """
    o = model.pose.odo_dim
    t, l = cfg.max_poses, cfg.max_landmarks

    # float32 matmuls end-to-end (see gauss_newton): marginal covariances
    # inherit the same conditioning sensitivity as the solve itself
    with jax.default_matmul_precision("highest"):
        return _marginals_impl(
            model, cfg, state, motion_info, meas_info, meas_cov, o, t, l
        )


def _marginals_impl(model, cfg, state, motion_info, meas_info, meas_cov,
                    o, t, l):
    hpp, hpl, hll, bp, bl = build_normal_equations(
        model, cfg, state, motion_info, meas_info
    )
    hpp, hpl, bp = _apply_gauges(cfg, state, o, hpp, hpl, bp)
    _, _, (solve, hll_inv, hpl_hllinv, hpl_b) = _schur_solve(
        cfg, state, o, hpp, hpl, hll, bp, bl, cfg.damping
    )

    # B_j = Hpl[:, j] Hll_inv_j: [TO, L, 3]; solve for X = Hred^-1 B
    rhs = hpl_hllinv.reshape(t * o, l * 3)
    x = solve(rhs)  # [TO, L*3]
    x_b = x.reshape(t * o, l, 3)

    # landmark marginal: Hll^-1 + B^T Hred^-1 B (per-landmark diagonal block)
    corr = jnp.einsum("nlb,nlc->lbc", hpl_hllinv, x_b)
    lm_cov = hll_inv + corr

    # last-pose block of Hred^-1 and pose-landmark cross covariance
    last = (state.n_poses - 1).astype(jnp.int32)
    cols = jax.lax.dynamic_slice(
        jnp.eye(t * o, dtype=hpp.dtype), (jnp.int32(0), last * o), (t * o, o)
    )
    pose_cols = solve(cols)  # [TO, O]
    pose_cov = jax.lax.dynamic_slice(pose_cols, (last * o, jnp.int32(0)), (o, o))
    # Sigma_pl(last, j) = -(Hred^-1)[last, :] @ B_j  -> [L, O, 3]
    cross = -jnp.einsum("nc,nlb->lcb", pose_cols, hpl_hllinv)

    # project to measurement space at the last pose
    last_pose = state.poses[last]
    lms = _safe_landmark(
        model,
        jnp.broadcast_to(last_pose, (l, last_pose.shape[-1])),
        state.landmarks,
        state.lm_mask,
    )
    jp = model.jac_pose(model.params, last_pose[None, :], lms)
    jl = model.jac_landmark(model.params, last_pose[None, :], lms)
    jp = jnp.broadcast_to(jp, (l,) + jp.shape[-2:])
    jl = jnp.broadcast_to(jl, (l,) + jl.shape[-2:])
    pl_cov = (
        jnp.einsum("lda,ab,leb->lde", jp, pose_cov, jp)
        + jnp.einsum("lda,lab,leb->lde", jp, cross, jl)
        + jnp.einsum("lda,lba,leb->lde", jl, cross, jp)
        + jnp.einsum("lda,lab,leb->lde", jl, lm_cov, jl)
        + meas_cov
    )
    return lm_cov, pl_cov
