"""On-device auction assignment vs the host Hungarian oracle."""

import numpy as np
import jax.numpy as jnp

from monorfs_tpu.metrics.errors import hungarian
from monorfs_tpu.slam.assignment import auction_assign, NEG


def _total(profit, col):
    return sum(profit[i, c] for i, c in enumerate(col) if c >= 0)


def _check(profit, eps=1e-4):
    s = profit.shape[0]
    col = np.asarray(auction_assign(jnp.asarray(profit), eps=eps))
    assert (col >= 0).all(), "auction left rows unassigned"
    assert len(set(col.tolist())) == s, "assignment is not a permutation"
    ref = hungarian(-profit)
    got, want = _total(profit, col), _total(profit, ref)
    assert got >= want - s * eps - 1e-9, (got, want)


def test_small_exact():
    profit = np.array([[3.0, 1.0], [1.0, 2.0]])
    col = np.asarray(auction_assign(jnp.asarray(profit)))
    assert col.tolist() == [0, 1]


def test_random_dense():
    rng = np.random.default_rng(0)
    for s in (3, 7, 16):
        for _ in range(5):
            _check(rng.normal(size=(s, s)))


def test_association_shaped():
    """Matrices shaped like FindLabels profit blocks: a few gated entries,
    miss diagonal, clutter diagonal, NEG elsewhere
    (ISAM2Navigator.cs:293-365)."""
    rng = np.random.default_rng(1)
    for trial in range(8):
        n, m = rng.integers(2, 10), rng.integers(1, 8)
        s = n + m
        profit = np.full((s, s), NEG)
        for i in range(n):
            for j in range(m):
                if rng.random() < 0.3:
                    profit[i, j] = rng.normal() * 3
            profit[i, m + i] = np.log(0.9)
        for j in range(m):
            profit[n + j, j] = np.log(1e-5)
        profit[n:, m:] = 0.0
        _check(profit)


def test_masked_clutter_rows_converge():
    """The scan-da livelock shape (round 5): clutter rows of MASKED-OFF
    measurement slots must have an acceptable seat (their own column), or
    they fight the zero miss block across the ~1e4 NEG gap in eps-sized
    increments and every phase burns max_iters (measured 4 x 400
    iterations/frame on the TPU scan before the fix). This builds the
    exact isam2_scan_da profit structure (invalid clutter diagonal = +1)
    at bench-like sizes and asserts full convergence + Hungarian parity."""
    rng = np.random.default_rng(3)
    l_cap, c, m = 40, 8, 24
    n = l_cap + c
    s = n + m
    n_valid = 7
    profit = np.full((s, s), NEG)
    for i in range(6):  # a few visible landmarks gating measurements
        profit[i, i] = 3.0 + rng.normal() * 0.1
        profit[i, (i + 1) % n_valid] = -5.0
    profit[np.arange(n), m + np.arange(n)] = np.log(0.9)
    zmask = np.arange(m) < n_valid
    profit[n + np.arange(m), np.arange(m)] = np.where(
        zmask, np.log(2e-4), 1.0
    )
    profit[n:, m:] = 0.0
    _check(profit, eps=0.2)
    # the forced seats must actually be taken by their own rows
    col = np.asarray(auction_assign(jnp.asarray(profit), eps=0.2))
    for j in range(n_valid, m):
        assert col[n + j] == j


def test_contested_column():
    """Two rows fighting for one good column with NEG alternatives must
    resolve in few iterations (large bid increments), not price-war."""
    profit = np.array([
        [5.0, NEG, np.log(0.9), NEG],
        [4.9, NEG, NEG, np.log(0.9)],
        [np.log(1e-5), NEG, 0.0, 0.0],
        [NEG, np.log(1e-5), 0.0, 0.0],
    ])
    _check(profit)
