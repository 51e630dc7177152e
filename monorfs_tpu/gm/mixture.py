"""Masked fixed-capacity Gaussian-mixture maps.

TPU-native replacement for the reference's KD-tree mixture container
(reference: mono-rfs-lib/BaseStructures/Maps/Map.cs:41-327): components live
in dense arrays with a fixed capacity K; dead slots carry log-weight DEAD.
KD-tree radius queries become masked dense distance tests; prune/merge
becomes top-k + a vectorized greedy clustering that reproduces the
reference's weight-ordered merge (PHDNavigator.cs:913-948).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import gaussian, smallmat

# Finite stand-in for log(0): keeps arithmetic NaN-free.
DEAD = -1.0e30
ALIVE_THRESHOLD = -0.5e30


class GM(NamedTuple):
    """A batched Gaussian mixture. Leading dims broadcast; K is the component
    axis; D the state dim (always 3 for maps, matching Map(3) usage)."""

    mean: jax.Array  # [..., K, D]
    cov: jax.Array  # [..., K, D, D]
    logw: jax.Array  # [..., K]

    @property
    def capacity(self):
        return self.logw.shape[-1]

    @property
    def dim(self):
        return self.mean.shape[-1]


def empty(k, dim=3, dtype=jnp.float32, batch=()):
    return GM(
        mean=jnp.zeros(batch + (k, dim), dtype),
        cov=jnp.broadcast_to(jnp.eye(dim, dtype=dtype), batch + (k, dim, dim)),
        logw=jnp.full(batch + (k,), DEAD, dtype),
    )


def alive(gm: GM):
    return gm.logw > ALIVE_THRESHOLD


def weights(gm: GM):
    return jnp.where(alive(gm), jnp.exp(gm.logw), 0.0)


def expected_size(gm: GM):
    """Sum of weights (Map.cs:61-71)."""
    return jnp.sum(weights(gm), axis=-1)


def count(gm: GM):
    return jnp.sum(alive(gm), axis=-1)


def concat(a: GM, b: GM) -> GM:
    return GM(
        mean=jnp.concatenate([a.mean, b.mean], axis=-2),
        cov=jnp.concatenate([a.cov, b.cov], axis=-3),
        logw=jnp.concatenate([a.logw, b.logw], axis=-1),
    )


def evaluate(gm: GM, x, radius=None):
    """Mixture density at point x [..., D] (Map.cs:192-220). With `radius`,
    only components whose mean lies within the Euclidean ball contribute
    (dense replacement for the KD-tree range query)."""
    logp = gaussian.logpdf(x[..., None, :], gm.mean, gm.cov)
    mask = alive(gm)
    if radius is not None:
        dist2 = jnp.sum((gm.mean - x[..., None, :]) ** 2, axis=-1)
        mask = mask & (dist2 <= radius * radius)
    vals = jnp.where(mask, jnp.exp(gm.logw + logp), 0.0)
    return jnp.sum(vals, axis=-1)


def evaluate_many(gm: GM, points, radius=None):
    """Mixture density at many points [E, D] -> [E]: component inverses and
    normalizers computed once, not per point (the hot path for Explored
    checks and WeightAlpha evaluations)."""
    inv = gaussian.inv(gm.cov)  # [K, D, D]
    logmult = gaussian.log_multiplier(gm.cov)  # [K]
    diff = points[:, None, :] - gm.mean[None, :, :]  # [E, K, D]
    m2 = jnp.einsum("ekd,kdc,ekc->ek", diff, inv, diff)
    logp = logmult[None, :] - 0.5 * m2
    mask = alive(gm)[None, :]
    if radius is not None:
        dist2 = jnp.sum(diff * diff, axis=-1)
        mask = mask & (dist2 <= radius * radius)
    vals = jnp.where(mask, jnp.exp(gm.logw[None, :] + logp), 0.0)
    return jnp.sum(vals, axis=-1)


class SGM(NamedTuple):
    """Structure-of-arrays Gaussian mixture: the TPU-layout twin of GM.

    Every leaf is a plain [..., K] array, so XLA tiles them as (8, 128) with
    no small-trailing-dim padding -- the [..., K, 3, 3] covariance tensor of
    the AoS layout pads its (3, 3) tile to (8, 128), a ~100x HBM blowup that
    dominated the PHD hot loop (BENCH.md). Covariances are symmetric and
    stored as their 6 unique entries.
    """

    mx: jax.Array  # mean components [..., K]
    my: jax.Array
    mz: jax.Array
    cxx: jax.Array  # symmetric covariance entries [..., K]
    cxy: jax.Array
    cxz: jax.Array
    cyy: jax.Array
    cyz: jax.Array
    czz: jax.Array
    logw: jax.Array  # [..., K]

    @property
    def capacity(self):
        return self.logw.shape[-1]

    @property
    def dim(self):
        return 3

    def mean_list(self):
        return [self.mx, self.my, self.mz]

    def cov_mat(self):
        """Symmetric covariance as a smallmat list-of-lists (aliases)."""
        return smallmat.sym_to_mat(
            (self.cxx, self.cxy, self.cxz, self.cyy, self.cyz, self.czz)
        )

    # AoS materialization for off-hot-path consumers (estimates, recording,
    # smoother seeds); not used inside the per-frame step.
    @property
    def mean(self):
        return jnp.stack(self.mean_list(), axis=-1)

    @property
    def cov(self):
        return smallmat.to_tensor(self.cov_mat())


def soa_of(gm: GM) -> SGM:
    m = gm.mean
    c = gm.cov
    return SGM(
        m[..., 0], m[..., 1], m[..., 2],
        c[..., 0, 0], c[..., 0, 1], c[..., 0, 2],
        c[..., 1, 1], c[..., 1, 2], c[..., 2, 2],
        gm.logw,
    )


def aos_of(sgm: SGM) -> GM:
    return GM(sgm.mean, sgm.cov, sgm.logw)


def sgm_make(mean_list, cov_mat, logw) -> SGM:
    """Build an SGM from a smallmat mean list + (symmetric) matrix, with all
    leaves broadcast to logw's shape."""
    c6 = smallmat.mat_to_sym(cov_mat)
    bc = lambda a: jnp.broadcast_to(a, logw.shape).astype(logw.dtype)
    return SGM(*[bc(m) for m in mean_list], *[bc(c) for c in c6], logw)


def empty_soa(k, dtype=jnp.float32, batch=()):
    zero = jnp.zeros(batch + (k,), dtype)
    one = jnp.ones(batch + (k,), dtype)
    return SGM(
        zero, zero, zero,
        one, zero, zero, one, zero, one,
        jnp.full(batch + (k,), DEAD, dtype),
    )


def concat_soa(a: SGM, b: SGM) -> SGM:
    return jax.tree.map(
        lambda x, y: jnp.concatenate([x, y], axis=-1), a, b
    )


def take_soa(sgm: SGM, idx, axis=0) -> SGM:
    """Gather components/particles along `axis` of every leaf."""
    return jax.tree.map(lambda x: jnp.take(x, idx, axis=axis), sgm)


def evaluate_many_soa(sgm: SGM, points, radius=None):
    """Mixture density at many points (SoA twin of evaluate_many).

    points: 3-list of [..., E] arrays batched like sgm's leading dims.
    Returns [..., E]."""
    cov = sgm.cov_mat()
    dt = smallmat.det(cov)
    inv = smallmat.inv(cov, dt)  # entries [..., K]
    logmult = smallmat.log_multiplier(cov, dt)
    diff = [
        p[..., :, None] - m[..., None, :]
        for p, m in zip(points, sgm.mean_list())
    ]  # [..., E, K]
    inv_e = [[entry[..., None, :] for entry in row] for row in inv]
    m2 = smallmat.quadform(diff, inv_e)
    logp = logmult[..., None, :] - 0.5 * m2
    mask = (sgm.logw > ALIVE_THRESHOLD)[..., None, :]
    if radius is not None:
        dist2 = sum(d * d for d in diff)
        mask = mask & (dist2 <= radius * radius)
    vals = jnp.where(mask, jnp.exp(sgm.logw[..., None, :] + logp), 0.0)
    return jnp.sum(vals, axis=-1)


def log_evaluate_many_soa(sgm: SGM, points, radius=None):
    """Log mixture density at many points, computed fully in log space.

    The linear-space twin (evaluate_many_soa) underflows to exactly 0 in
    float32 whenever every component contribution has log-density below
    ~-87 (float32 min normal 1.2e-38); `log(0) = -inf` then poisons the
    particle-weight increment (WeightAlpha, PHDNavigator.cs:373-393) and
    the NaN guard in make_slam_step silently skips the whole frame's
    weight update -- the round-3 TPU-f32 accuracy regression. Log space
    keeps the value exact down to DEAD regardless of dtype.

    Returns [..., E] log densities (DEAD-order negative where no component
    is alive/in radius)."""
    cov = sgm.cov_mat()
    dt = smallmat.det(cov)
    inv = smallmat.inv(cov, dt)
    logmult = smallmat.log_multiplier(cov, dt)
    diff = [
        p[..., :, None] - m[..., None, :]
        for p, m in zip(points, sgm.mean_list())
    ]  # [..., E, K]
    inv_e = [[entry[..., None, :] for entry in row] for row in inv]
    m2 = smallmat.quadform(diff, inv_e)
    logp = logmult[..., None, :] - 0.5 * m2
    logp = jnp.where(jnp.isfinite(logp), logp, DEAD)
    mask = (sgm.logw > ALIVE_THRESHOLD)[..., None, :]
    if radius is not None:
        dist2 = sum(d * d for d in diff)
        mask = mask & (dist2 <= radius * radius)
    scores = jnp.where(mask, sgm.logw[..., None, :] + logp, DEAD)
    peak = jnp.max(scores, axis=-1)
    out = peak + jnp.log(
        jnp.sum(jnp.exp(scores - peak[..., None]), axis=-1)
    )
    return jnp.maximum(out, DEAD)


def best_map_indices(logw, cap=None, max_multiplicity=4):
    """Marginal multi-object (MAP) estimate selection (Map.cs:119-142):
    pick floor(sum w) components greedily by weight, decrementing the chosen
    weight by 1 each round (so weight-2 components appear twice).

    Vectorized closed form: the c-th pick of component i carries value
    w_i - c, so the greedy multiset equals the top-n of the flattened value
    matrix {w_i - c : c < max_multiplicity} -- one top_k, no sequential loop.

    Returns (indices [cap], valid [cap])."""
    k = logw.shape[-1]
    cap = k if cap is None else cap
    w0 = jnp.where(logw > ALIVE_THRESHOLD, jnp.exp(logw), 0.0)
    n = jnp.floor(jnp.sum(w0, axis=-1)).astype(jnp.int32)

    copies = jnp.arange(max_multiplicity, dtype=w0.dtype)
    vals = w0[..., :, None] - copies  # [..., K, C]
    flat = vals.reshape(vals.shape[:-2] + (k * max_multiplicity,))
    _, fidx = jax.lax.top_k(flat, cap)
    idx = (fidx // max_multiplicity).astype(jnp.int32)
    valid = jnp.arange(cap) < jnp.minimum(n, cap)[..., None]
    return idx, valid


def prune_merge(gm: GM, max_quantity, min_weight, merge_threshold,
                rounds=8):
    """Prune + merge (PHDNavigator.cs:913-948): sort by weight descending,
    cut at `max_quantity` / first weight below `min_weight`, then greedily
    merge later components into the heaviest earlier component within
    `merge_threshold` Mahalanobis distance (measured in the leader's metric).

    Unbatched over particles: vmap externally. Returns a GM with capacity
    `max_quantity`.
    """
    k_out = max_quantity
    logw, order = jax.lax.top_k(gm.logw, k_out)
    mean = jnp.take_along_axis(gm.mean, order[..., None], axis=-2)
    cov = jnp.take_along_axis(gm.cov, order[..., None, None], axis=-3)

    live = (logw > ALIVE_THRESHOLD) & (logw >= jnp.log(min_weight))

    cov_inv = gaussian.inv(cov)  # [K, D, D] in the *leader* metric
    diff = mean[None, :, :] - mean[:, None, :]  # [i leader, k candidate, D]
    m2 = jnp.einsum("ikd,ide,ike->ik", diff, cov_inv, diff)
    close = m2 < merge_threshold * merge_threshold

    idx = jnp.arange(k_out)

    # Greedy weight-ordered leader selection as a fixed-round synchronous
    # fixed-point iteration (converges within the longest close-chain depth;
    # the sequential reference greedy is the unique fixed point):
    #   is_leader[k] = live[k] and no earlier leader i<k with close(i, k)
    lower = (idx[:, None] < idx[None, :]) & close & live[None, :] & live[:, None]

    def round_(t, is_leader):
        conflict = jnp.any(lower & is_leader[:, None], axis=0)
        return live & ~conflict

    is_leader = jax.lax.fori_loop(0, rounds, round_, live)
    eligible = lower & is_leader[:, None]  # [i leader, k candidate]
    has = jnp.any(eligible, axis=0)
    leader = jnp.where(has, jnp.argmax(eligible, axis=0), idx)

    # segment-merge by leader: assign[i, k] = 1 if component k belongs to i
    assign = (leader[None, :] == idx[:, None]) & live[None, :]
    w = jnp.where(live, jnp.exp(logw), 0.0)
    cw = assign * w[None, :]
    wsum = jnp.sum(cw, axis=1)
    safe = jnp.maximum(wsum, 1e-30)
    m = jnp.einsum("ik,kd->id", cw, mean) / safe[:, None]
    second = cov + mean[:, :, None] * mean[:, None, :]
    p = jnp.einsum("ik,kde->ide", cw, second) / safe[:, None, None]
    p = p - m[:, :, None] * m[:, None, :]

    out_alive = is_leader & (wsum > 0)
    out_logw = jnp.where(out_alive, jnp.log(jnp.maximum(wsum, 1e-30)), DEAD)
    out_mean = jnp.where(out_alive[:, None], m, 0.0)
    out_cov = jnp.where(
        out_alive[:, None, None], p, jnp.eye(gm.dim, dtype=p.dtype)
    )
    return GM(out_mean, out_cov, out_logw)
