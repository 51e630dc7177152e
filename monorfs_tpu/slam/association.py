"""Set log-likelihood P(Z | X, M) via vmappable beam enumeration.

TPU-native replacement for the reference's data-association machinery
(reference: PHDNavigator.cs:415-713 + Maths/GraphCombinatorics.cs:42-792).
The reference builds a sparse gated log-likelihood matrix, partitions it into
connected components, and enumerates assignments per component
(lexicographically for <=5 rows, Murty's k-best otherwise, capped at 200
hypotheses), LogSumExp-ing the terms.

Here the same truncated sum is computed by a fixed-shape beam search over
measurements: each beam element is a distinct partial association (landmark
choices are injective via a used-mask), so summing beam scores sums distinct
assignment likelihoods. With beam width B >= the number of reachable partial
assignments the result is exact -- which covers the reference's exhaustive
regime -- and otherwise keeps the top-B scoring assignments like Murty's
truncation. The whole computation is differentiable, so jax.grad reproduces
the reference's analytic TemperedAverage pose gradient
(PHDNavigator.cs:677-708) for free.
"""

import jax
import jax.numpy as jnp

from ..gm import gaussian

NEG = -1.0e30


def association_matrices(model, pose, map_means, map_mask, meas_cov, pd, ramp,
                         gate, fuzzy_pd, depth_map=None):
    """Build the gated association log-likelihood pieces
    (SetLogLikeMatrix, PHDNavigator.cs:415-453 / quasi variant :567-635).

    map_means: [N, 3] (+ mask), measurements compared against
    N(h(pose, m_i), R) with detection probability PD_i.

    fuzzy_pd=True uses the fuzzy-visibility-scaled PD (real variant);
    False uses the constant PD (quasi variant, gate 12 instead of 5).

    Returns (mu [N, D], log_pd [N], log_miss [N], r_inv [D, D], logmult).
    """
    mu = model.measure(model.params, pose, map_means)  # [N, D]
    if fuzzy_pd:
        fuzzy = (
            model.fuzzy_visible_fn(depth_map)
            if getattr(model, "uses_depth", False)
            else model.fuzzy_visible
        )
        pdv = fuzzy(model.params, mu, ramp) * pd
    else:
        pdv = jnp.full(mu.shape[:-1], pd, mu.dtype)
    pdv = jnp.clip(pdv, 1e-30, 1.0 - 1e-7)
    log_pd = jnp.log(pdv)
    log_miss = jnp.log1p(-pdv)
    r_inv = gaussian.inv(meas_cov)
    logmult = gaussian.log_multiplier(meas_cov)
    return mu, log_pd, log_miss, r_inv, logmult


def likelihood_matrix(mu, log_pd, logmult, r_inv, z, gate):
    """ll[i, k] = log PD_i + log mult - 0.5 d^2 where Mahalanobis d < gate,
    else NEG (PHDNavigator.cs:433-442)."""
    diff = z[None, :, :] - mu[:, None, :]  # [N, M, D]
    d2 = jnp.einsum("nmd,de,nme->nm", diff, r_inv, diff)
    ll = log_pd[:, None] + logmult - 0.5 * d2
    return jnp.where(d2 < gate * gate, ll, NEG)


def set_log_likelihood(ll, log_miss, log_clutter, n_mask, m_mask, beam_width,
                       max_candidates=8, pair_steps=False):
    """Truncated sum over data associations.

    ll: [N, M] gated landmark-measurement log-likelihoods (NEG when gated
        out), log_miss: [N] misdetection terms, log_clutter: scalar clutter
        term per measurement. Masked-out rows/columns are ignored.

    Every assignment maps each measurement to either clutter or a distinct
    landmark; unassigned landmarks contribute log_miss. Assignment score =
    sum(log_miss) + sum_k [choice_k], with choice_k in
    {log_clutter} u {ll[i,k] - log_miss[i]}.

    Per measurement only its `max_candidates` best gated landmarks are
    enumerated (selected once outside the sequential beam scan) -- exact
    whenever a measurement gates against at most that many landmarks, which
    the Mahalanobis gate guarantees in practice, and it keeps the in-scan
    top_k small (sequential-step latency dominates on TPU).

    With `pair_steps` the scan consumes TWO measurements per step, halving
    the sequential depth (the TPU cost is latency-bound, not compute-bound):
    each step enumerates the (C+1)^2 joint choices with the injectivity
    constraint applied within the pair. Identical result whenever the beam
    does not truncate; under truncation it keeps the jointly best pairs
    (at least as good a cover as two greedy single steps).

    Returns logsumexp over the top-`beam_width` assignments.
    """
    n, m = ll.shape
    c = min(max_candidates, n)
    dtype = ll.dtype
    base = jnp.sum(jnp.where(n_mask, log_miss, 0.0))
    delta = jnp.where(
        (ll > NEG / 2) & n_mask[:, None], ll - log_miss[:, None], NEG
    )  # [N, M]

    # per-measurement candidate pre-selection: [M, C] scores + indices
    cand_delta, cand_idx = jax.lax.top_k(delta.T, c)

    # option vectors [M, C+1]: slot 0 = clutter (delta log_clutter), slot
    # 1+j = candidate j. Inactive measurements contribute exactly 0 via a
    # forced slot-0 pick with zero delta (no outer `where` needed).
    opt_delta = jnp.concatenate(
        [jnp.full((m, 1), log_clutter, dtype), cand_delta], axis=1
    )
    inactive_row = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.full((c,), NEG, dtype)]
    )
    opt_delta = jnp.where(m_mask[:, None], opt_delta, inactive_row[None, :])

    scores0 = jnp.full((beam_width,), NEG, dtype).at[0].set(base)
    used0 = jnp.zeros((beam_width, n), bool)
    iota_n = jnp.arange(n)

    def pick_mask(idx_k, choice):
        """[B, N] one-hot of the landmark picked by `choice` (0 = none)."""
        lm = jnp.where(choice > 0, idx_k[jnp.maximum(choice - 1, 0)], n)
        return iota_n[None, :] == lm[:, None]

    if not pair_steps:
        def step(carry, inputs):
            scores, used = carry
            dk, idx_k = inputs  # [C+1], [C]
            used_k = used[:, idx_k]  # [B, C]
            land = scores[:, None] + jnp.where(used_k, NEG, dk[1:][None, :])
            cand = jnp.concatenate([scores[:, None] + dk[0], land], axis=1)
            top, flat = jax.lax.top_k(cand.reshape(-1), beam_width)
            src = flat // (c + 1)
            choice = flat % (c + 1)
            used = used[src] | pick_mask(idx_k, choice)
            return (top, used), None

        (scores, _), _ = jax.lax.scan(
            step, (scores0, used0), (opt_delta, cand_idx)
        )
    else:
        m2 = (m + 1) // 2 * 2
        pad = m2 - m
        opt_delta = jnp.concatenate(
            [opt_delta, jnp.tile(inactive_row[None, :], (pad, 1))]
        ).reshape(m2 // 2, 2, c + 1)
        cand_idx = jnp.concatenate(
            [cand_idx, jnp.zeros((pad, c), cand_idx.dtype)]
        ).reshape(m2 // 2, 2, c)

        def step(carry, inputs):
            scores, used = carry
            dk, idx_k = inputs  # [2, C+1], [2, C]
            used_a = used[:, idx_k[0]]  # [B, C]
            used_b = used[:, idx_k[1]]
            da = jnp.concatenate(
                [
                    jnp.broadcast_to(dk[0, 0], (used.shape[0], 1)),
                    jnp.where(used_a, NEG, dk[0, 1:][None, :]),
                ],
                axis=1,
            )  # [B, C+1]
            db = jnp.concatenate(
                [
                    jnp.broadcast_to(dk[1, 0], (used.shape[0], 1)),
                    jnp.where(used_b, NEG, dk[1, 1:][None, :]),
                ],
                axis=1,
            )
            # within-pair injectivity: forbid (a=j, b=l) with same landmark
            same = idx_k[0][:, None] == idx_k[1][None, :]  # [C, C]
            dup = jnp.pad(same, ((1, 0), (1, 0)))  # [C+1, C+1], clutter free
            cand = (
                scores[:, None, None]
                + da[:, :, None]
                + jnp.where(dup[None, :, :], NEG, db[:, None, :])
            )  # [B, C+1, C+1]
            top, flat = jax.lax.top_k(cand.reshape(-1), beam_width)
            cc = c + 1
            src = flat // (cc * cc)
            rest = flat % (cc * cc)
            ca = rest // cc
            cb = rest % cc
            used = (
                used[src]
                | pick_mask(idx_k[0], ca)
                | pick_mask(idx_k[1], cb)
            )
            return (top, used), None

        (scores, _), _ = jax.lax.scan(
            step, (scores0, used0), (opt_delta, cand_idx)
        )
    return jax.scipy.special.logsumexp(jnp.where(scores > NEG / 2, scores, -jnp.inf))


def quasi_set_log_likelihood(model, meas_cov, pd, log_clutter, pose,
                             map_means, map_mask, z, z_mask, beam_width=200,
                             lm_cov=None):
    """QuasiSetLogLikelihood (PHDNavigator.cs:526-713): constant PD, gate 12,
    visibility ignored. Differentiable in `pose` -- jax.grad reproduces the
    reference's analytic gradient path.

    With `lm_cov` ([N, 3, 3] landmark covariances), the per-landmark
    innovation covariance S_i = J_i P_i J_i^T + R replaces the bare R: the
    likelihood then accounts for the map's own uncertainty, which keeps the
    smoother's map messages correctly calibrated (the reference uses R only,
    overclaiming precision against its estimated map)."""
    mu, log_pd, log_miss, r_inv, logmult = association_matrices(
        model, pose, map_means, map_mask, meas_cov, pd, None, 12.0, False
    )
    if lm_cov is not None:
        jl = model.jac_landmark(model.params, pose, map_means)  # [N, D, 3]
        jl = jnp.broadcast_to(jl, (map_means.shape[0],) + jl.shape[-2:])
        s = jnp.einsum("nda,nab,neb->nde", jl, lm_cov, jl) + meas_cov
        s_inv = gaussian.inv(s)  # [N, D, D]
        logmult_n = gaussian.log_multiplier(s)  # [N]
        diff = z[None, :, :] - mu[:, None, :]
        d2 = jnp.einsum("nmd,nde,nme->nm", diff, s_inv, diff)
        ll = log_pd[:, None] + logmult_n[:, None] - 0.5 * d2
        ll = jnp.where(d2 < 144.0, ll, NEG)
    else:
        ll = likelihood_matrix(mu, log_pd, logmult, r_inv, z, 12.0)
    ll = jnp.where(z_mask[None, :], ll, NEG)
    return set_log_likelihood(ll, log_miss, log_clutter, map_mask, z_mask,
                              beam_width)
