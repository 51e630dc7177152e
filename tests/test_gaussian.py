"""Gaussian / mixture container tests (oracles mirror Gaussian.cs / Map.cs)."""

import numpy as np
import jax.numpy as jnp
from scipy_free_oracles import mvn_logpdf

from monorfs_tpu.gm import gaussian, mixture

RNG = np.random.default_rng(5)


def random_spd(d, scale=1.0):
    a = RNG.normal(size=(d, d))
    return scale * (a @ a.T + d * np.eye(d))


def test_det_inv():
    for d in (1, 2, 3):
        cov = jnp.asarray(random_spd(d))
        np.testing.assert_allclose(gaussian.det(cov), np.linalg.det(cov), rtol=1e-10)
        np.testing.assert_allclose(gaussian.inv(cov), np.linalg.inv(cov), rtol=1e-9)


def test_logpdf():
    for d in (1, 2, 3):
        cov = random_spd(d)
        mean = RNG.normal(size=d)
        x = RNG.normal(size=d)
        got = gaussian.logpdf(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(cov))
        np.testing.assert_allclose(got, mvn_logpdf(x, mean, cov), rtol=1e-9)


def test_merge_moments_oracle():
    """Merge rule w = sum wi, m = sum wi mi / w, P = sum wi (Pi + mi mi') / w
    - m m' (Gaussian.cs:297-347)."""
    k, d = 5, 3
    w = RNG.uniform(0.1, 2.0, size=k)
    means = RNG.normal(size=(k, d))
    covs = np.stack([random_spd(d) for _ in range(k)])
    wm, mm, pm = gaussian.merge_moments(
        jnp.log(jnp.asarray(w)), jnp.asarray(means), jnp.asarray(covs),
        jnp.ones(k, bool), axis=0,
    )
    wsum = w.sum()
    m = (w[:, None] * means).sum(0) / wsum
    p = sum(w[i] * (covs[i] + np.outer(means[i], means[i])) for i in range(k)) / wsum
    p -= np.outer(m, m)
    np.testing.assert_allclose(wm, wsum, rtol=1e-12)
    np.testing.assert_allclose(mm, m, rtol=1e-10)
    np.testing.assert_allclose(pm, p, rtol=1e-9)


def _gm(means, covs, ws):
    return mixture.GM(
        jnp.asarray(means), jnp.asarray(covs), jnp.log(jnp.asarray(ws))
    )


def test_evaluate_radius():
    means = np.array([[0.0, 0, 0], [5.0, 0, 0]])
    covs = np.stack([np.eye(3)] * 2)
    gm = _gm(means, covs, [1.0, 2.0])
    x = jnp.zeros(3)
    full = mixture.evaluate(gm, x)
    near = mixture.evaluate(gm, x, radius=2.0)
    expect_full = np.exp(mvn_logpdf(np.zeros(3), means[0], covs[0])) + 2 * np.exp(
        mvn_logpdf(np.zeros(3), means[1], covs[1])
    )
    expect_near = np.exp(mvn_logpdf(np.zeros(3), means[0], covs[0]))
    np.testing.assert_allclose(full, expect_full, rtol=1e-9)
    np.testing.assert_allclose(near, expect_near, rtol=1e-9)


def test_best_map_indices_multiplicity():
    """A weight-2.2 component appears twice in the MAP estimate
    (Map.cs:119-142)."""
    logw = jnp.log(jnp.asarray([2.2, 0.9, 0.4]))
    idx, valid = mixture.best_map_indices(logw, cap=5)
    n = int(np.floor(2.2 + 0.9 + 0.4))  # 3
    assert valid.sum() == n
    chosen = np.asarray(idx)[np.asarray(valid)]
    # greedy: 2.2 -> 1.2 -> 0.9 tie... order: idx0 (2.2), idx0 (1.2), idx1 (0.9)
    np.testing.assert_array_equal(chosen, [0, 0, 1])


def test_prune_merge_reference_oracle():
    """Mirror of PHDNavigatorTest.Prune semantics: big components kept,
    sub-MinWeight dropped, close pairs merged with moment matching."""
    d = 3
    base_cov = 0.01 * np.eye(d)
    means = np.array(
        [
            [0.0, 0, 0],  # heavy leader
            [0.001, 0, 0],  # close to leader -> merged
            [3.0, 0, 0],  # separate survivor
            [6.0, 0, 0],  # tiny weight -> pruned
        ]
    )
    ws = np.array([1.0, 0.5, 0.7, 1e-6])
    covs = np.stack([base_cov] * 4)
    gm = _gm(means, covs, ws)
    out = mixture.prune_merge(gm, max_quantity=4, min_weight=1e-3, merge_threshold=0.3)
    alive = np.asarray(mixture.alive(out))
    w = np.asarray(mixture.weights(out))
    assert alive.sum() == 2
    # merged component: weight 1.5 at weighted mean
    np.testing.assert_allclose(sorted(w[alive], reverse=True), [1.5, 0.7], rtol=1e-6)
    mmean = np.asarray(out.mean)[alive]
    merged = mmean[np.argmax(w[alive])]
    np.testing.assert_allclose(merged, (1.0 * means[0] + 0.5 * means[1]) / 1.5, atol=1e-9)


def test_prune_merge_chain_exact_greedy():
    """Greedy weight-ordered merging: B merges into A; C is close to B but
    not to A, so C stays separate (B cannot lead once absorbed) --
    PHDNavigator.cs:930-945."""
    d = 3
    sigma = 1.0
    covs = np.stack([sigma * np.eye(d)] * 3)
    # thr = 1.0 -> close iff |dx| < 1
    means = np.array([[0.0, 0, 0], [0.9, 0, 0], [1.8, 0, 0]])
    ws = np.array([1.0, 0.9, 0.8])
    gm = _gm(means, covs, ws)
    out = mixture.prune_merge(gm, max_quantity=3, min_weight=1e-3, merge_threshold=1.0)
    w = np.asarray(mixture.weights(out))
    alive = np.asarray(mixture.alive(out))
    assert alive.sum() == 2
    np.testing.assert_allclose(sorted(w[alive], reverse=True), [1.9, 0.8], rtol=1e-9)
