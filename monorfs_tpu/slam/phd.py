"""Rao-Blackwellized PHD filter as dense batched jax kernels.

TPU-native re-design of the reference's core SLAM solver
(reference: mono-rfs-lib/SLAM/Navigators/PHDNavigator.cs:48-983). The whole
filter state is fixed-shape tensor data -- particles [P, S], log-weights [P],
per-particle Gaussian-mixture maps [P, K, ...] with dead-slot masking -- and
one jitted `slam_step` implements predict / correct / prune / weight /
resample. Semantic deltas preserved from the reference:

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

KD-tree `Near` queries become dense masked top-G selections; the Murty /
lexicographic association enumeration becomes the beam search in
`association.py`. Parallel.For over particles becomes vmap (shardable over a
`particles` mesh axis).
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..gm import gaussian, mixture
from ..gm.mixture import DEAD, GM
from . import association


@dataclasses.dataclass(frozen=True)
class PHDConfig:
    """Static shape/algorithm configuration (jit-specializing)."""

    num_particles: int = 200
    max_components: int = 600  # MaxQuantity (Config.cs:83)
    max_measurements: int = 32
    gate_top: int = 16  # dense stand-in for KD-tree Near per measurement
    estimate_cap: int = 128  # cap on the MAP map estimate size
    beam_width: int = 200  # association hypotheses (PHDNavigator.cs:469)
    beam_meas_cap: int = 0  # beam scan length; 0 = max_measurements.
    merge_rounds: int = 8  # prune-merge leader fixed-point iterations
    # Valid measurements are compacted to the front before the weight-update
    # beam, so a cap below max_measurements only drops measurements in
    # crowded frames (mirrors the reference's own hypothesis truncation).


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
    maps: GM  # mean [P, K, 3], cov [P, K, 3, 3], logw [P, K]
    best: jax.Array  # scalar int32


def init_state(model, cfg: PHDConfig, init_pose, dtype=jnp.float32):
    p = cfg.num_particles
    pose = jnp.broadcast_to(jnp.asarray(init_pose, dtype), (p,) + (len(init_pose),))
    return PHDState(
        pose=pose,
        logweight=jnp.full((p,), -jnp.log(float(p)), dtype),
        maps=mixture.empty(cfg.max_components, 3, dtype, batch=(p,)),
        best=jnp.int32(0),
    )


def _sample_mvn(key, cov, shape, dtype):
    """Gaussian sampling through the symmetric matrix square root
    (reference uses Cholesky, Util.cs:173-202; the eigen square root also
    handles singular covariances, e.g. the zero-noise trivial configs)."""
    lam, vec = jnp.linalg.eigh(cov.astype(dtype))
    sqrt = vec * jnp.sqrt(jnp.maximum(lam, 0.0))[None, :]
    normals = jax.random.normal(key, shape + (cov.shape[-1],), dtype)
    return jnp.einsum("ij,...j->...i", sqrt, normals)


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


def _weight_alpha(model, cfg, params, pose, predicted: GM, corrected: GM,
                  z, z_mask):
    """Particle log-weight increment (WeightAlpha, PHDNavigator.cs:373-393):
    log alpha = setLL + (plog - n_pred) - (clog - n_corr) evaluated on the
    MAP map estimate of the corrected mixture."""
    jidx, jvalid = mixture.best_map_indices(corrected.logw, cfg.estimate_cap)
    jmeans = corrected.mean[jidx]  # [E, 3]

    def mixture_loglike(gm):
        vals = mixture.evaluate_many(gm, jmeans)
        return jnp.sum(jnp.where(jvalid, jnp.log(jnp.maximum(vals, 1e-300)), 0.0))

    plog = mixture_loglike(predicted)
    clog = mixture_loglike(corrected)
    n_pred = mixture.expected_size(predicted)
    n_corr = mixture.expected_size(corrected)

    # compact valid measurements to the front and cap the beam length
    m_cap = cfg.beam_meas_cap or z.shape[0]
    order = jnp.argsort(~z_mask)[:m_cap]
    zc = z[order]
    zc_mask = z_mask[order]

    mu, log_pd, log_miss, r_inv, logmult = association.association_matrices(
        model, pose, jmeans, jvalid, params.meas_cov, params.pd,
        params.visibility_ramp, 5.0, True, depth_map=params.depth_map,
    )
    ll = association.likelihood_matrix(mu, log_pd, logmult, r_inv, zc, 5.0)
    ll = jnp.where(zc_mask[None, :], ll, association.NEG)
    setll = association.set_log_likelihood(
        ll, log_miss, jnp.log(params.clutter_density), jvalid, zc_mask,
        cfg.beam_width,
    )
    return setll + (plog - n_pred) - (clog - n_corr)


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
        maps=GM(state.maps.mean[src], state.maps.cov[src], state.maps.logw[src]),
        best=best,
    )


def make_slam_step(model, cfg: PHDConfig, slam: bool = True):
    """Build the jittable full SLAM step:
    (params, state, odometry, z, z_mask, key[, true_pose]) -> state.

    With slam=False the filter runs mapping-only: poses snap to `true_pose`
    and particle weights stay fixed (PHDNavigator.cs:192-208, :297-300,
    :334-336)."""

    def per_particle(params, pose, maps, z, z_mask):
        births = _births(model, params, pose, maps, z, z_mask)
        predicted = mixture.concat(maps, births)
        candidates = _correct(model, cfg, params, pose, predicted, z, z_mask)
        corrected = mixture.prune_merge(
            candidates,
            cfg.max_components,
            params.min_weight,
            params.merge_threshold,
            rounds=cfg.merge_rounds,
        )
        if slam:
            dlog = _weight_alpha(
                model, cfg, params, pose, predicted, corrected, z, z_mask
            )
        else:
            dlog = jnp.zeros((), pose.dtype)
        return corrected, dlog

    def step(params, state, odometry, z, z_mask, key, true_pose=None):
        kmotion, kresample = jax.random.split(key)
        state = predict_poses(
            model, params, state, odometry, kmotion, slam, true_pose
        )
        corrected, dlog = jax.vmap(
            lambda pose, maps: per_particle(params, pose, maps, z, z_mask)
        )(state.pose, state.maps)

        logweight = state.logweight + dlog
        if slam:
            norm = jax.scipy.special.logsumexp(logweight)
            logweight = jnp.where(
                jnp.isfinite(norm), logweight - norm, state.logweight
            )
            best = jnp.argmax(logweight).astype(jnp.int32)
            state = PHDState(state.pose, logweight, corrected, best)
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
            state = PHDState(state.pose, logweight, corrected, jnp.int32(0))
        return state

    return step
