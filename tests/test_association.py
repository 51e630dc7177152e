"""Set log-likelihood tests vs brute-force enumeration oracles
(mirrors GraphCombinatoricsTest coverage goals + LoopyPHDNavigatorTest.LogLike)."""

import itertools
import math

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu import models
from monorfs_tpu.slam import association


def brute_force_setll(ll, log_miss, log_clutter):
    """Enumerate every association: each measurement -> clutter or a distinct
    landmark; unassigned landmarks misdetect."""
    n, m = ll.shape
    scores = []
    for choices in itertools.product(range(n + 1), repeat=m):
        lands = [c - 1 for c in choices if c > 0]
        if len(lands) != len(set(lands)):
            continue
        s = 0.0
        assigned = set()
        for k, c in enumerate(choices):
            if c == 0:
                s += log_clutter
            else:
                i = c - 1
                if ll[i, k] < -1e29:
                    s = -np.inf
                    break
                s += ll[i, k]
                assigned.add(i)
        if s == -np.inf:
            continue
        for i in range(n):
            if i not in assigned:
                s += log_miss[i]
        scores.append(s)
    mx = max(scores)
    return mx + math.log(sum(math.exp(s - mx) for s in scores))


def run_beam(ll, log_miss, log_clutter, beam=512):
    n, m = ll.shape
    return float(
        association.set_log_likelihood(
            jnp.asarray(ll),
            jnp.asarray(log_miss),
            jnp.asarray(log_clutter),
            jnp.ones(n, bool),
            jnp.ones(m, bool),
            beam,
        )
    )


def test_exact_small():
    rng = np.random.default_rng(3)
    for trial in range(8):
        n = rng.integers(1, 4)
        m = rng.integers(1, 4)
        ll = rng.normal(size=(n, m)) - 1.0
        # randomly gate out some pairs
        gated = rng.random((n, m)) < 0.3
        ll[gated] = association.NEG
        log_miss = np.log(rng.uniform(0.05, 0.5, size=n))
        log_clutter = np.log(1e-3)
        got = run_beam(ll, log_miss, log_clutter)
        expect = brute_force_setll(ll, log_miss, log_clutter)
        np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_all_clutter():
    """No landmarks: every measurement is clutter."""
    m = 3
    ll = np.full((1, m), association.NEG)
    log_miss = np.array([np.log(0.1)])
    got = run_beam(ll, log_miss, np.log(1e-2))
    expect = np.log(0.1) + m * np.log(1e-2)
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_masked_entries_ignored():
    ll = np.array([[1.0, association.NEG], [0.5, 0.2]])
    log_miss = np.log(np.array([0.3, 0.4]))
    full = association.set_log_likelihood(
        jnp.asarray(ll), jnp.asarray(log_miss), jnp.asarray(np.log(1e-2)),
        jnp.asarray([True, False]), jnp.asarray([True, False]), 64,
    )
    only = brute_force_setll(ll[:1, :1], log_miss[:1], np.log(1e-2))
    np.testing.assert_allclose(float(full), only, rtol=1e-9)


def test_quasi_gradient_matches_fd():
    """jax.grad through the beam = the reference's TemperedAverage analytic
    gradient; verify against central differences."""
    from monorfs_tpu.geometry import pose3d

    m = models.MODEL_2D
    meas_cov = jnp.eye(2) * 0.01
    map_means = jnp.asarray([[1.0, 0.5, 0.0], [-0.7, 0.2, 0.0]])
    mask = jnp.ones(2, bool)
    z = jnp.asarray([[1.05, 0.45], [-0.75, 0.3]])
    z_mask = jnp.ones(2, bool)

    def f(pose):
        return association.quasi_set_log_likelihood(
            m, meas_cov, 0.9, jnp.log(3e-7), pose, map_means, mask, z, z_mask
        )

    pose0 = jnp.asarray([0.02, -0.01])
    g = jax.grad(f)(pose0)
    eps = 1e-6
    for i in range(2):
        dp = jnp.zeros(2).at[i].set(eps)
        fd = (f(pose0 + dp) - f(pose0 - dp)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-5)


def test_quasi_peak_at_true_pose():
    """Log-likelihood is maximized near the pose that generated the
    measurements (LoopyPHDNavigatorTest.LogLike sanity)."""
    m = models.MODEL_2D
    meas_cov = jnp.eye(2) * 0.01
    true_pose = jnp.asarray([0.3, -0.2])
    lms = jnp.asarray([[1.0, 0.5, 0.0], [-0.7, 0.2, 0.0], [0.1, -1.0, 0.0]])
    z = m.measure(m.params, true_pose, lms)
    mask = jnp.ones(3, bool)

    def f(pose):
        return association.quasi_set_log_likelihood(
            m, meas_cov, 0.9, jnp.log(3e-7), pose, lms, mask, z, mask
        )

    at_true = float(f(true_pose))
    assert at_true > float(f(true_pose + 0.3))
    assert at_true > float(f(true_pose - 0.25))
    # gradient vanishes at the optimum
    g = jax.grad(f)(true_pose)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-5)


def test_pallas_beam_parity():
    """The fused Pallas beam kernel (interpret mode) is bit-identical to the
    vmapped XLA beam scan on random gated instances."""
    from monorfs_tpu.slam import beam_pallas

    rng = np.random.default_rng(3)
    p_, n, m_, c, b = 9, 48, 17, 6, 32
    ll = rng.normal(0, 3, (p_, n, m_)).astype(np.float32)
    ll = np.where(rng.random((p_, n, m_)) < 0.7, association.NEG, ll)
    log_miss = rng.normal(-1, 0.5, (p_, n)).astype(np.float32)
    n_mask = rng.random((p_, n)) < 0.8
    m_mask = rng.random((p_, m_)) < 0.8
    log_clutter = np.float32(-2.5)

    prep = jax.vmap(
        lambda l, lm, nm, mm: association.prepare_options(
            l, lm, log_clutter, nm, mm, c
        )
    )
    base, od, wk, bk, _ = prep(
        jnp.asarray(ll), jnp.asarray(log_miss), jnp.asarray(n_mask),
        jnp.asarray(m_mask),
    )
    n_words = (n + 31) // 32
    ref = jax.vmap(
        lambda b_, o, w, k: association.beam_scan(b_, o, w, k, b, n_words)
    )(base, od, wk, bk)
    out = beam_pallas.beam_scan_batch(
        base, od, wk, bk, b, n_words, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
