"""Rao-Blackwellized PHD filter as dense batched jax kernels.

TPU-native re-design of the reference's core SLAM solver
(reference: mono-rfs-lib/SLAM/Navigators/PHDNavigator.cs:48-983). The whole
filter state is fixed-shape tensor data -- particles [P, S], log-weights [P],
per-particle Gaussian-mixture maps with dead-slot masking -- and one jitted
`slam_step` implements predict / correct / prune / weight / resample.
Semantic deltas preserved from the reference:

  * birth components at unexplored measurement back-projections, checked
    against the pre-birth map (PredictConditional, :793-819);
  * misdetection reweight (1 - PD) before the measurement update
    (CorrectConditional, :837-839);
  * clutter density in the update denominator (:899);
  * prune: weight-sorted cut at MaxQuantity/MinWeight then greedy
    Mahalanobis merge (PruneModel, :913-948);
  * single-cluster particle weight via the association set likelihood
    (WeightAlpha, :373-393);
  * ESS-triggered systematic resampling (:724-777).

Layout: the per-frame hot path runs entirely on structure-of-arrays state
(mixture.SGM -- K-last [P, K] leaves, unrolled small-matrix algebra from
gm/smallmat.py). The AoS [P, K, 3, 3] layout XLA-pads each (3, 3) tile to
(8, 128), a ~100x HBM blowup that dominated the first implementation
(BENCH.md); the SoA step also replaces the earlier per-measurement top-G
gating truncation with a dense scalar likelihood over every gated
(measurement, component) pair followed by a single global top-K cut --
closer to the reference's exact Near-query semantics AND faster, because
the expensive matrix updates run only on the K surviving components.

KD-tree `Near` queries become dense masked distance tests; the Murty /
lexicographic association enumeration becomes the beam search in
`association.py`. Parallel.For over particles becomes vmap (shardable over a
`particles` mesh axis).

The AoS helpers `_births` / `_correct` are kept as the executable
specification (oracle tests in tests/test_phd.py exercise them directly;
a parity test checks the SoA step against them).
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..gm import gaussian, mixture, smallmat
from ..gm.mixture import ALIVE_THRESHOLD, DEAD, GM, SGM
from . import association, beam_pallas, fused_pallas


# log(1e-300): the reference evaluates map densities in C# doubles and its
# smallest representable floor is ~1e-300 (PHDNavigator.cs:373-393 operates
# on Map.Evaluate values); pinning the same *log-space* floor keeps float32
# runs on the float64 semantics instead of saturating at log(float32 tiny).
LOG_EVAL_FLOOR = -690.77552789821368


def _exact_dot(a, b):
    """One-hot gathers as matmuls must run at full f32 precision: the TPU
    default may execute f32 dots as bf16 MXU passes, truncating the gathered
    means/measurements to ~3 significant digits."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


@dataclasses.dataclass(frozen=True)
class PHDConfig:
    """Static shape/algorithm configuration (jit-specializing)."""

    num_particles: int = 200
    max_components: int = 600  # MaxQuantity (Config.cs:83)
    max_measurements: int = 32
    gate_top: int = 16  # per-measurement survivor cap: AoS spec path gate
    # truncation AND the fused Pallas kernel's per-row extraction bound
    # (fused_pallas.py; the dense XLA SoA path needs no cap)
    estimate_cap: int = 128  # cap on the MAP map estimate size
    beam_width: int = 200  # association hypotheses (PHDNavigator.cs:469)
    beam_meas_cap: int = 0  # beam scan length; 0 = max_measurements.
    beam_candidates: int = 8  # gated landmarks enumerated per measurement
    merge_rounds: int = 8  # prune-merge leader fixed-point iterations
    # Valid measurements are compacted to the front before the weight-update
    # beam, so a cap below max_measurements only drops measurements in
    # crowded frames (mirrors the reference's own hypothesis truncation).
    meas_compact: int = 0  # compact the measurement axis for the WHOLE step
    # (births + correct + weight) to this many slots, gathered live-first,
    # once per frame before the per-particle vmap. The static measurement
    # capacity is usually sized for the worst case (every landmark visible +
    # clutter) while a typical frame fills ~1/4 of it; all [M, K] pair work
    # scales with the static M, so compaction cuts the correct stage nearly
    # proportionally. 0 = off; a cap below the live count in a crowded
    # frame drops the trailing measurements (like beam_meas_cap).


class PHDParams(NamedTuple):
    """Dynamic model/navigator parameters (traced; no recompiles on change).

    Mirrors the Config fields consumed by PHDNavigator (Config.cs:63-103)."""

    motion_cov: jax.Array  # [T, T] navigator motion covariance (multiplied)
    meas_cov: jax.Array  # [D, D] navigator measurement covariance
    pd: jax.Array  # NavigatorPD
    clutter_density: jax.Array  # NavigatorClutterDensity
    birth_weight: jax.Array
    birth_cov: jax.Array  # [3, 3]
    min_weight: jax.Array
    merge_threshold: jax.Array
    exploration_threshold: jax.Array
    density_radius: jax.Array  # DensityDistanceThreshold
    min_effective_particle: jax.Array
    visibility_ramp: jax.Array  # [D]
    dt: jax.Array  # frame time (scales motion noise)
    depth_map: jax.Array  # [H, W] live depth for Kinect visibility (dummy
    # [1, 1] +inf map for models without depth occlusion)


class PHDState(NamedTuple):
    pose: jax.Array  # [P, S]
    logweight: jax.Array  # [P]
    maps: SGM  # SoA mixture, leaves [P, K]
    best: jax.Array  # scalar int32
    ancestor: jax.Array  # [P] int32: source slot of each particle at the
    # LAST step (identity when no resample fired). The reference clones each
    # particle's WayPoints on resample (Vehicle.cs:117-127 + TrackClone);
    # recording the ancestry instead lets the driver reconstruct the exact
    # cloned trajectory genealogy for estimate.out.


def init_state(model, cfg: PHDConfig, init_pose, dtype=jnp.float32):
    p = cfg.num_particles
    pose = jnp.broadcast_to(jnp.asarray(init_pose, dtype), (p,) + (len(init_pose),))
    return PHDState(
        pose=pose,
        logweight=jnp.full((p,), -jnp.log(float(p)), dtype),
        maps=mixture.empty_soa(cfg.max_components, dtype, batch=(p,)),
        best=jnp.int32(0),
        ancestor=jnp.arange(p, dtype=jnp.int32),
    )


def _sample_mvn(key, cov, shape, dtype):
    """Gaussian sampling through the symmetric matrix square root
    (reference uses Cholesky, Util.cs:173-202; the eigen square root also
    handles singular covariances, e.g. the zero-noise trivial configs)."""
    lam, vec = jnp.linalg.eigh(cov.astype(dtype))
    sqrt = vec * jnp.sqrt(jnp.maximum(lam, 0.0))[None, :]
    normals = jax.random.normal(key, shape + (cov.shape[-1],), dtype)
    return jnp.einsum("ij,...j->...i", sqrt, normals,
                      precision=jax.lax.Precision.HIGHEST)


def predict_poses(model, params: PHDParams, state: PHDState, odometry, key,
                  slam: bool, true_pose=None):
    """Motion update (PHDNavigator.cs:295-314 + TrackVehicle.cs:89-103):
    every particle moves by the odometry reading plus sampled motion noise;
    in mapping-only mode the single particle snaps to the reference pose."""
    if not slam:
        pose = jnp.broadcast_to(true_pose, state.pose.shape)
        return state._replace(pose=pose)
    p = state.pose.shape[0]
    moved = model.pose.add_odometry(state.pose, odometry[None, :])
    noise = params.dt * _sample_mvn(key, params.motion_cov, (p,), state.pose.dtype)
    return state._replace(pose=model.pose.add_odometry(moved, noise))


# =============================================================================
# SoA fast path (the jitted per-frame step)
# =============================================================================

def _births_soa(model, to_map_s, params, pose, maps: SGM, zl, z_mask):
    """Birth components at unexplored back-projections
    (PredictConditional, PHDNavigator.cs:793-819 + Explored :956-959).

    zl: D-list of [M] measurement component arrays."""
    cand = to_map_s(model.params, pose, zl)  # 3-list of [M]
    density = mixture.evaluate_many_soa(
        maps, cand, radius=3.0 * params.density_radius
    )
    unexplored = z_mask & (density < params.exploration_threshold)
    logw = jnp.where(unexplored, jnp.log(params.birth_weight), DEAD)
    logw = logw.astype(maps.logw.dtype)
    bc = smallmat.from_tensor(params.birth_cov)
    return mixture.sgm_make(cand, bc, logw)


def _correct_prune_soa(model, cfg, params, fns, pose, pred: SGM, zl, z_mask):
    """Fused measurement update + prune + merge on SoA state
    (CorrectConditional + PruneModel, PHDNavigator.cs:829-948).

    1. per-component EKF precompute (h, S, gain, (I-KH)P) -- unrolled;
    2. dense scalar association scores over all gated (z, component) pairs
       with the exact per-measurement normalizer (clutter + sum of gated
       weights, :884-899);
    3. one global top-K_out cut over {misdetections} u {pair updates}
       (= the reference's weight-sorted MaxQuantity cut, :921-929);
    4. EKF mean/cov update materialized for survivors only;
    5. greedy weight-ordered Mahalanobis merge (:930-948).
    """
    measure_s, jac_s, to_map_s, fuzzy_s = fns
    kp = pred.capacity
    d = model.meas_dim
    k_out = cfg.max_components
    m = zl[0].shape[0]
    dtype = pred.logw.dtype
    alive = pred.logw > ALIVE_THRESHOLD

    mean = pred.mean_list()  # 3-list [K']
    cov = pred.cov_mat()  # 3x3 smallmat of [K']

    # --- per-component EKF precompute (PHDNavigator.cs:857-870) -------------
    h = measure_s(model.params, pose, mean)  # D-list [K']
    pd_k = jnp.where(
        alive, fuzzy_s(model.params, h, params.visibility_ramp) * params.pd, 0.0
    )
    pd_k = jnp.clip(pd_k, 0.0, 1.0 - 1e-7)
    miss_logw = jnp.where(alive, pred.logw + jnp.log1p(-pd_k), DEAD)

    hj = jac_s(model.params, pose, mean)  # D x 3 of [K']
    hj = [[jnp.broadcast_to(e, (kp,)).astype(dtype) for e in row] for row in hj]
    pht = smallmat.matmul(cov, smallmat.transpose(hj))  # 3 x D
    r = smallmat.from_tensor(params.meas_cov)
    s = smallmat.add(smallmat.matmul(hj, pht), r)  # D x D
    det_s = smallmat.det(s)
    s_inv = smallmat.inv(s, det_s)
    s_logmult = smallmat.log_multiplier(s, det_s)
    gain = smallmat.matmul(pht, s_inv)  # 3 x D
    ikh = smallmat.sub(
        smallmat.identity_like(3, pred.logw), smallmat.matmul(gain, hj)
    )
    cov_upd = smallmat.mat_to_sym(
        smallmat.symmetrize(smallmat.matmul(ikh, cov))
    )  # 6-tuple [K']
    cov_orig = smallmat.mat_to_sym(cov)

    # --- dense pair scores [M, K'] (:881-903) --------------------------------
    backproj = to_map_s(model.params, pose, zl)  # 3-list [M]
    dist2 = sum(
        (b[:, None] - mi[None, :]) ** 2 for b, mi in zip(backproj, mean)
    )
    r2 = params.density_radius * params.density_radius
    in_gate = (dist2 <= r2) & alive[None, :] & z_mask[:, None]

    innov = [zi[:, None] - hi[None, :] for zi, hi in zip(zl, h)]  # [M, K']
    s_inv_b = [[e[None, :] for e in row] for row in s_inv]
    q_log = s_logmult[None, :] - 0.5 * smallmat.quadform(innov, s_inv_b)
    # degenerate components (e.g. landmark crossing the camera plane) can
    # produce non-finite scores; treat them as gated out
    q_log = jnp.where(jnp.isfinite(q_log), q_log, DEAD)
    log_pd_k = jnp.log(jnp.maximum(pd_k, 1e-30))
    log_num = jnp.where(
        in_gate, log_pd_k[None, :] + pred.logw[None, :] + q_log, DEAD
    )  # [M, K']
    wsum = jnp.sum(jnp.where(in_gate, jnp.exp(log_num), 0.0), axis=1)  # [M]
    upd_logw = log_num - jnp.log(params.clutter_density + wsum)[:, None]
    upd_logw = jnp.where(in_gate, upd_logw, DEAD)

    # --- global weight-sorted cut (PruneModel :921-929) ----------------------
    all_logw = jnp.concatenate([miss_logw, upd_logw.reshape(m * kp)])
    top_logw, top_idx = jax.lax.top_k(all_logw, k_out)
    is_miss = top_idx < kp
    comp = jnp.where(is_miss, top_idx, (top_idx - kp) % kp)
    midx = jnp.where(is_miss, 0, (top_idx - kp) // kp)

    # --- survivor channel gather ---------------------------------------------
    # One one-hot matmul instead of ~24 lane-axis gathers (take_along_axis
    # along the minor dim is ~5x slower on TPU). Channels are sanitized to 0
    # where non-finite or dead -- 0 * inf = NaN would otherwise poison every
    # survivor through the matmul.
    chans = (
        list(h)
        + [e for row in gain for e in row]
        + list(mean)
        + list(cov_orig)
        + list(cov_upd)
    )
    nd = len(h)
    feat = jnp.stack(
        [jnp.broadcast_to(c, (kp,)) for c in chans], axis=-1
    )  # [K', C]
    feat = jnp.where(jnp.isfinite(feat) & alive[:, None], feat, 0.0)
    onehot = (
        comp[:, None] == jnp.arange(kp, dtype=jnp.int32)[None, :]
    ).astype(dtype)  # [K_out, K']
    gathered = _exact_dot(onehot, feat)  # [K_out, C]
    cols = [gathered[..., i] for i in range(feat.shape[-1])]
    h_s = cols[:nd]
    gain_s = [
        [cols[nd + i_ * nd + j_] for j_ in range(nd)] for i_ in range(3)
    ]
    base = nd + 3 * nd
    mean_g = cols[base : base + 3]
    cov_g = tuple(cols[base + 3 : base + 9])
    covu_g = tuple(cols[base + 9 : base + 15])

    # measurement gather for survivors (same one-hot trick over M slots)
    onehot_m = (
        midx[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
    ).astype(dtype)  # [K_out, M]
    zfeat = jnp.stack(zl, axis=-1)  # [M, D]
    z_s = _exact_dot(onehot_m, zfeat)  # [K_out, D]

    # --- survivor mean/cov update (:893-898) ---------------------------------
    innov_s = [z_s[..., i] - h_s[i] for i in range(nd)]
    delta = smallmat.matvec(gain_s, innov_s)  # 3-list [K_out]
    mean_s = [
        mg + jnp.where(is_miss, 0.0, di) for mg, di in zip(mean_g, delta)
    ]
    cov_s = tuple(
        jnp.where(is_miss, co, cu) for co, cu in zip(cov_g, covu_g)
    )

    live = (top_logw > ALIVE_THRESHOLD) & (
        top_logw >= jnp.log(params.min_weight)
    )

    # --- greedy weight-ordered merge (:930-948) ------------------------------
    # Survivors arrive weight-sorted (top_k). Merge later components into the
    # heaviest earlier component within merge_threshold Mahalanobis distance,
    # measured in the leader's metric; fixed-round synchronous fixed point of
    # the sequential greedy (converges within the longest close-chain depth).
    covm = smallmat.sym_to_mat(cov_s)
    det_c = smallmat.det(covm)
    inv_c = smallmat.inv(covm, det_c)  # leader metric, entries [K_out]
    diff = [mi[None, :] - mi[:, None] for mi in mean_s]  # [i leader, k cand]
    inv_b = [[e[:, None] for e in row] for row in inv_c]
    m2 = smallmat.quadform(diff, inv_b)  # [K_out, K_out]
    close = m2 < params.merge_threshold * params.merge_threshold

    idx = jnp.arange(k_out)
    lower = (idx[:, None] < idx[None, :]) & close & live[None, :] & live[:, None]

    def round_(t, is_leader):
        conflict = jnp.any(lower & is_leader[:, None], axis=0)
        return live & ~conflict

    is_leader = jax.lax.fori_loop(0, cfg.merge_rounds, round_, live)
    eligible = lower & is_leader[:, None]
    has = jnp.any(eligible, axis=0)
    leader = jnp.where(has, jnp.argmax(eligible, axis=0), idx)

    assign = (leader[None, :] == idx[:, None]) & live[None, :]
    w = jnp.where(live, jnp.exp(top_logw), 0.0)

    # Moment-matching merge (Gaussian.Merge, Gaussian.cs:297-347) centered
    # at each member's LEADER mean. The naive raw-second-moment form
    # (cov = E[x x^T] - mean mean^T) cancels O(|mean|^2) terms to recover
    # O(sigma^2) covariances -- in float32 that injects |mean|^2 * eps
    # absolute noise into EVERY live covariance EVERY frame (each leader
    # pools itself through its second moment even when nothing merges).
    # Centered per member at its own leader, every pooled quantity is
    # O(merge_threshold * sigma): the only cancellation left is the LINEAR
    # mean-minus-leadermean difference (error eps * |mean|, harmless).
    # Each member has exactly one leader, so the pooling is a segment sum
    # = ONE one-hot matmul over 16 channels (the [K, K] elementwise form
    # measured 368 -> 224 fps on the bench; matmuls ride the MXU).
    assign_f = assign.astype(dtype)  # [K_out leader, K_out member]
    mean_feat = jnp.stack(list(mean_s), axis=-1)  # [K_out, 3]
    leader_mean = _exact_dot(assign_f.T, mean_feat)  # member k -> its
    # leader's mean (zero for unassigned/dead members; their w is 0 below)
    dvec = mean_feat - leader_mean  # [K_out member, 3], O(threshold*sigma)
    dv = [dvec[:, a] for a in range(3)]
    pairs = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    chans = (
        [w]
        + [w * dv[a] for a in range(3)]
        + [w * dv[a] * dv[b] for a, b in pairs]
        + [w * cov_s[i] for i in range(6)]
    )
    pooled = _exact_dot(assign_f, jnp.stack(chans, axis=-1))  # [K_out, 16]
    wsum_l = pooled[..., 0]
    safe = jnp.maximum(wsum_l, 1e-30)
    delta_m = [pooled[..., 1 + a] / safe for a in range(3)]
    mean_m = [mi + dm for mi, dm in zip(mean_s, delta_m)]
    spread = tuple(
        pooled[..., 4 + i] / safe - delta_m[a] * delta_m[b]
        for i, (a, b) in enumerate(pairs)
    )
    cov_m = tuple(pooled[..., 10 + i] / safe + spread[i] for i in range(6))

    out_alive = is_leader & (wsum_l > 0)
    out_logw = jnp.where(out_alive, jnp.log(safe), DEAD)
    zero = jnp.zeros_like(out_logw)
    one = jnp.ones_like(out_logw)
    mean_o = [jnp.where(out_alive, mi, zero) for mi in mean_m]
    eye6 = (one, zero, zero, one, zero, one)
    cov_o = tuple(
        jnp.where(out_alive, ci, ei) for ci, ei in zip(cov_m, eye6)
    )
    return SGM(*mean_o, *cov_o, out_logw)


def _weight_alpha_soa(model, cfg, params, fns, pose, predicted: SGM,
                      corrected: SGM, zl, z_mask,
                      return_beam_inputs=False):
    """Particle log-weight increment (WeightAlpha, PHDNavigator.cs:373-393):
    log alpha = setLL + (plog - n_pred) - (clog - n_corr) evaluated on the
    MAP map estimate of the corrected mixture.

    With return_beam_inputs=True the association beam is NOT run here;
    instead the prepared per-measurement option tensors are returned so the
    caller can run the beam over all particles at once (the fused Pallas
    kernel in beam_pallas.py -- see make_slam_step)."""
    measure_s, _, _, fuzzy_s = fns
    dtype = corrected.logw.dtype
    jidx, jvalid = mixture.best_map_indices(corrected.logw, cfg.estimate_cap)
    # one-hot matmul gather (take_along_axis on the lane axis is ~5x slower
    # on TPU; see _correct_prune_soa)
    k = corrected.logw.shape[-1]
    onehot_j = (
        jidx[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]
    ).astype(dtype)  # [E, K]
    mfeat = jnp.stack(corrected.mean_list(), axis=-1)  # [K, 3]
    mfeat = jnp.where(jnp.isfinite(mfeat), mfeat, 0.0)
    jm = _exact_dot(onehot_j, mfeat)
    jmeans = [jm[:, i] for i in range(3)]  # 3-list [E]

    def mixture_loglike(gm):
        # Fully log-space evaluation: the linear-space density underflows
        # to 0 in float32 for any point ~>13 sigma from every component,
        # and the 1e-300 floor is itself 0 in float32 -> log(0) = -inf ->
        # `rest` = inf - inf = NaN -> the NaN guard in make_slam_step
        # dropped the WHOLE frame's weight update (root cause of the
        # round-3 TPU-f32 accuracy gap). LOG_EVAL_FLOOR = log(1e-300)
        # keeps float32 and float64 runs on identical semantics.
        lv = mixture.log_evaluate_many_soa(gm, jmeans)
        return jnp.sum(
            jnp.where(jvalid, jnp.maximum(lv, LOG_EVAL_FLOOR), 0.0)
        )

    plog = mixture_loglike(predicted)
    clog = mixture_loglike(corrected)
    n_pred = mixture.expected_size(predicted)
    n_corr = mixture.expected_size(corrected)

    # compact valid measurements to the front and cap the beam length
    m_cap = cfg.beam_meas_cap or zl[0].shape[0]
    order = jnp.argsort(~z_mask)[:m_cap]
    onehot_o = (
        order[:, None] == jnp.arange(zl[0].shape[0], dtype=jnp.int32)[None, :]
    ).astype(dtype)  # [m_cap, M]
    zfeat = jnp.stack(zl, axis=-1)
    zfeat = jnp.where(jnp.isfinite(zfeat), zfeat, 0.0)
    zcm = _exact_dot(onehot_o, zfeat)  # [m_cap, D]
    zc = [zcm[:, i] for i in range(len(zl))]
    zc_mask = z_mask[order]

    # gated association log-likelihood matrix [E, m_cap]
    # (SetLogLikeMatrix, PHDNavigator.cs:415-453)
    mu = measure_s(model.params, pose, jmeans)  # D-list [E]
    pdv = fuzzy_s(model.params, mu, params.visibility_ramp) * params.pd
    pdv = jnp.clip(pdv, 1e-30, 1.0 - 1e-7)
    log_pd = jnp.log(pdv)
    log_miss = jnp.log1p(-pdv)
    r = smallmat.from_tensor(params.meas_cov)
    det_r = smallmat.det(r)
    r_inv = smallmat.inv(r, det_r)
    logmult = smallmat.log_multiplier(r, det_r)
    diffz = [zi[None, :] - mi[:, None] for zi, mi in zip(zc, mu)]  # [E, M]
    d2 = smallmat.quadform(diffz, r_inv)
    ll = log_pd[:, None] + logmult - 0.5 * d2
    ll = jnp.where(d2 < 25.0, ll, association.NEG)  # Mahalanobis gate 5
    ll = jnp.where(zc_mask[None, :], ll, association.NEG)

    rest = (plog - n_pred) - (clog - n_corr)
    if return_beam_inputs:
        base, od, wk, bk, _ = association.prepare_options(
            ll, log_miss, jnp.log(params.clutter_density), jvalid, zc_mask,
            cfg.beam_candidates,
        )
        return rest, base, od, wk, bk
    setll = association.set_log_likelihood(
        ll, log_miss, jnp.log(params.clutter_density), jvalid, zc_mask,
        cfg.beam_width, max_candidates=cfg.beam_candidates,
    )
    return setll + rest


def resample(state: PHDState, key):
    """Systematic (wheel) resampling (ResampleParticles,
    PHDNavigator.cs:724-760)."""
    p = state.logweight.shape[0]
    w = jnp.exp(state.logweight - jax.scipy.special.logsumexp(state.logweight))
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), state.logweight.dtype) / p
    positions = u0 + jnp.arange(p, dtype=state.logweight.dtype) / p
    src = jnp.searchsorted(cum, positions, side="left")
    src = jnp.clip(src, 0, p - 1).astype(jnp.int32)
    # BestParticle = the last drawn slot whose source holds the max weight
    # among selected sources (PHDNavigator.cs:745-748)
    sel_w = w[src]
    best = (p - 1 - jnp.argmax(sel_w[::-1])).astype(jnp.int32)
    return PHDState(
        pose=state.pose[src],
        logweight=jnp.full((p,), -jnp.log(float(p)), state.logweight.dtype),
        maps=jax.tree.map(lambda a: a[src], state.maps),
        best=best,
        ancestor=src,
    )


def make_slam_step(model, cfg: PHDConfig, slam: bool = True,
                   pallas_beam=None, pallas_correct=None):
    """Build the jittable full SLAM step:
    (params, state, odometry, z, z_mask, key[, true_pose]) -> state.

    With slam=False the filter runs mapping-only: poses snap to `true_pose`
    and particle weights stay fixed (PHDNavigator.cs:192-208, :297-300,
    :334-336).

    pallas_beam: run the association beam of the weight stage as one fused
    Pallas TPU kernel over all particles (beam_pallas.py) instead of the
    per-particle XLA scan. None = auto (on for the TPU backend, float32).

    pallas_correct: run births + correct + prune as ONE fused Pallas kernel
    over all particles (fused_pallas.py) -- the roofline audit showed the
    XLA stage memory-bound on ~346 MB/frame of intermediate HBM traffic
    (BENCH.md). None = auto (TPU backend, float32, non-depth model)."""
    measure_s = model.measure_soa_fn()
    jac_s = model.jac_landmark_soa_fn()
    to_map_s = model.to_map_soa_fn()
    d = model.meas_dim
    if pallas_beam is None:
        pallas_beam = (
            jax.default_backend() == "tpu"
            and not jax.config.jax_enable_x64
            and beam_pallas.recommended(cfg.beam_width)
        )
    use_beam_kernel = slam and pallas_beam
    if pallas_correct is None:
        pallas_correct = (
            jax.default_backend() == "tpu"
            and not jax.config.jax_enable_x64
            and fused_pallas.supported(model, cfg, jnp.float32)
        )
    use_fused_correct = pallas_correct

    def weight_particle(params, pose, predicted, corrected, zl, z_mask):
        fuzzy_s = model.fuzzy_visible_soa_fn(params.depth_map)
        fns = (measure_s, jac_s, to_map_s, fuzzy_s)
        if use_beam_kernel:
            return _weight_alpha_soa(
                model, cfg, params, fns, pose, predicted, corrected, zl,
                z_mask, return_beam_inputs=True,
            )
        if slam:
            return _weight_alpha_soa(
                model, cfg, params, fns, pose, predicted, corrected, zl,
                z_mask,
            )
        return jnp.zeros((), pose.dtype)

    def per_particle(params, pose, maps, zl, z_mask):
        fuzzy_s = model.fuzzy_visible_soa_fn(params.depth_map)
        fns = (measure_s, jac_s, to_map_s, fuzzy_s)
        births = _births_soa(model, to_map_s, params, pose, maps, zl, z_mask)
        predicted = mixture.concat_soa(maps, births)
        corrected = _correct_prune_soa(
            model, cfg, params, fns, pose, predicted, zl, z_mask
        )
        if use_beam_kernel:
            out = _weight_alpha_soa(
                model, cfg, params, fns, pose, predicted, corrected, zl,
                z_mask, return_beam_inputs=True,
            )
            return corrected, out
        if slam:
            dlog = _weight_alpha_soa(
                model, cfg, params, fns, pose, predicted, corrected, zl,
                z_mask,
            )
        else:
            dlog = jnp.zeros((), pose.dtype)
        return corrected, dlog

    def step(params, state, odometry, z, z_mask, key, true_pose=None):
        kmotion, kresample = jax.random.split(key)
        state = predict_poses(
            model, params, state, odometry, kmotion, slam, true_pose
        )
        if cfg.meas_compact and cfg.meas_compact < cfg.max_measurements:
            # live-first stable compaction, shared by all particles
            order = jnp.argsort(~z_mask, stable=True)[: cfg.meas_compact]
            z = z[order]
            z_mask = z_mask[order]
        zl = [z[:, i] for i in range(d)]
        if use_fused_correct:
            predicted, corrected = fused_pallas.fused_stage(
                model, cfg, params, state.pose, state.maps, z, z_mask
            )
            dlog = jax.vmap(
                lambda pose, pr, c: weight_particle(
                    params, pose, pr, c, zl, z_mask
                )
            )(state.pose, predicted, corrected)
        else:
            corrected, dlog = jax.vmap(
                lambda pose, maps: per_particle(
                    params, pose, maps, zl, z_mask
                )
            )(state.pose, state.maps)
        if use_beam_kernel:
            rest, base, od, wk, bk = dlog
            n_words = (cfg.estimate_cap + 31) // 32
            scores = beam_pallas.beam_scan_batch(
                base, od, wk, bk, cfg.beam_width, n_words
            )
            setll = jax.scipy.special.logsumexp(
                jnp.where(scores > association.NEG / 2, scores, -jnp.inf),
                axis=-1,
            )
            dlog = setll + rest

        logweight = state.logweight + dlog
        if slam:
            norm = jax.scipy.special.logsumexp(logweight)
            logweight = jnp.where(
                jnp.isfinite(norm), logweight - norm, state.logweight
            )
            best = jnp.argmax(logweight).astype(jnp.int32)
            p = logweight.shape[0]
            state = PHDState(state.pose, logweight, corrected, best,
                             jnp.arange(p, dtype=jnp.int32))
            # ESS check (ParticleDepleted, :768-777)
            w = jnp.exp(logweight)
            ess = 1.0 / jnp.maximum(jnp.sum(w * w), 1e-30)
            p = logweight.shape[0]
            state = jax.lax.cond(
                ess < params.min_effective_particle * p,
                lambda s: resample(s, kresample),
                lambda s: s,
                state,
            )
        else:
            state = PHDState(state.pose, logweight, corrected, jnp.int32(0),
                             jnp.arange(logweight.shape[0], dtype=jnp.int32))
        return state

    return step


# =============================================================================
# AoS specification path (oracle tests; not used by the jitted step)
# =============================================================================

def _births(model, params, pose, maps: GM, z, z_mask):
    """Birth components at unexplored back-projections
    (PredictConditional, PHDNavigator.cs:793-819 + Explored :956-959)."""
    cand = model.to_map(model.params, pose[None, :], z)  # [M, 3]
    density = mixture.evaluate_many(
        maps, cand, radius=3.0 * params.density_radius
    )
    unexplored = z_mask & (density < params.exploration_threshold)
    logw = jnp.where(unexplored, jnp.log(params.birth_weight), DEAD)
    m = z.shape[0]
    cov = jnp.broadcast_to(params.birth_cov, (m, 3, 3))
    return GM(cand, cov, logw.astype(maps.logw.dtype))


def _correct(model, cfg, params, pose, predicted: GM, z, z_mask):
    """PHD measurement update (CorrectConditional, PHDNavigator.cs:829-906).

    Dense per-component EKF precompute + per-measurement top-G gated update.
    Returns the un-pruned corrected candidate mixture
    [K' misdetections + M*G updates]."""
    kp = predicted.capacity
    d = model.meas_dim
    alive = mixture.alive(predicted)

    h = model.measure(model.params, pose[None, :], predicted.mean)  # [K', D]
    fuzzy = model.fuzzy_visible_fn(params.depth_map)
    pd_k = jnp.where(
        alive,
        fuzzy(model.params, h, params.visibility_ramp) * params.pd,
        0.0,
    )
    pd_k = jnp.clip(pd_k, 0.0, 1.0 - 1e-7)

    # misdetection branch: w *= (1 - PD)
    miss_logw = jnp.where(alive, predicted.logw + jnp.log1p(-pd_k), DEAD)
    miss = GM(predicted.mean, predicted.cov, miss_logw)

    # EKF precompute (PHDNavigator.cs:857-870)
    hjac = jnp.broadcast_to(
        model.jac_landmark(model.params, pose[None, :], predicted.mean),
        (kp, d, 3),
    )  # [K', D, 3]
    ph = jnp.einsum("kab,kcb->kac", predicted.cov, hjac)  # P H^T [K', 3, D]
    s = jnp.einsum("kab,kbc->kac", hjac, ph) + params.meas_cov  # [K', D, D]
    s_inv = gaussian.inv(s)
    s_logmult = gaussian.log_multiplier(s)
    gain = jnp.einsum("kad,kde->kae", ph, s_inv)  # [K', 3, D]
    i_kh = jnp.eye(3, dtype=pose.dtype) - jnp.einsum("kad,kdb->kab", gain, hjac)
    cov_upd = jnp.einsum("kab,kbc->kac", i_kh, predicted.cov)  # [K', 3, 3]

    # gating: components near each measurement's back-projection
    # (dense stand-in for model.Near(MeasureToMap(z), radius), :881-882)
    backproj = model.to_map(model.params, pose[None, :], z)  # [M, 3]
    dist2 = jnp.sum(
        (backproj[:, None, :] - predicted.mean[None, :, :]) ** 2, axis=-1
    )  # [M, K']
    r2 = params.density_radius * params.density_radius
    in_gate = (dist2 <= r2) & alive[None, :] & z_mask[:, None]
    gate_score = jnp.where(in_gate, -dist2, -jnp.inf)
    _, gidx = jax.lax.top_k(gate_score, cfg.gate_top)  # [M, G]
    gvalid = jnp.take_along_axis(in_gate, gidx, axis=1)  # [M, G]

    # per-(measurement, gated component) update terms
    zg = z[:, None, :]  # [M, 1, D]
    h_g = h[gidx]  # [M, G, D]
    q_log = (
        s_logmult[gidx]
        - 0.5
        * jnp.einsum(
            "mgd,mgde,mge->mg", zg - h_g, s_inv[gidx], zg - h_g
        )
    )  # log N(z; h, S)
    logw_g = predicted.logw[gidx]
    log_pd_g = jnp.log(jnp.maximum(pd_k[gidx], 1e-30))
    log_num = jnp.where(gvalid, log_pd_g + logw_g + q_log, DEAD)  # [M, G]
    # weightsum over the gated set per measurement (:884-890)
    wsum = jnp.sum(jnp.where(gvalid, jnp.exp(log_num), 0.0), axis=1)  # [M]
    denom = params.clutter_density + wsum
    upd_logw = log_num - jnp.log(denom)[:, None]  # [M, G]

    mean_g = predicted.mean[gidx] + jnp.einsum(
        "mgad,mgd->mga", gain[gidx], zg - h_g
    )  # [M, G, 3]
    cov_g = cov_upd[gidx]  # [M, G, 3, 3]

    mg = z.shape[0] * cfg.gate_top
    updates = GM(
        mean_g.reshape(mg, 3),
        cov_g.reshape(mg, 3, 3),
        jnp.where(gvalid, upd_logw, DEAD).reshape(mg),
    )
    return mixture.concat(miss, updates)
