"""Combinatorics tests (mirrors mono-rfs-lib/Test/GraphCombinatoricsTest.cs:
component partition correctness, Hungarian on hand-built matrices,
enumeration completeness/no-duplicates, Murty vs brute force)."""

import itertools

import numpy as np
import jax.numpy as jnp

from monorfs_tpu.metrics.errors import hungarian
from monorfs_tpu.utils import combinatorics as gc


def test_connected_components_partition():
    profit = np.full((5, 5), gc.NEG)
    profit[0, 0] = 1.0
    profit[0, 1] = 2.0
    profit[1, 1] = 1.5
    profit[2, 3] = 0.5
    profit[3, 3] = 0.2
    comps = gc.connected_components(profit)
    assert len(comps) == 2
    sizes = sorted((len(r), len(c)) for r, c in comps)
    assert sizes == [(2, 1), (2, 2)]


def test_connected_components_jax_labels():
    adj = jnp.asarray(
        np.array(
            [
                [0, 1, 0, 0],
                [1, 0, 0, 0],
                [0, 0, 0, 1],
                [0, 0, 1, 0],
            ],
            bool,
        )
    )
    labels = np.asarray(gc.connected_components_jax(adj))
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_hungarian_known_solution():
    cost = np.array([[4.0, 1, 3], [2, 0, 5], [3, 2, 2]])
    assign = hungarian(cost)
    total = cost[np.arange(3), assign].sum()
    best = min(
        sum(cost[i, p[i]] for i in range(3))
        for p in itertools.permutations(range(3))
    )
    assert total == best


def test_murty_matches_brute_force():
    rng = np.random.default_rng(3)
    profit = rng.normal(size=(4, 4))
    brute = sorted(
        (
            sum(profit[i, p[i]] for i in range(4)),
            p,
        )
        for p in itertools.permutations(range(4))
    )[::-1]
    got = list(gc.murty(profit, k=10))
    assert len(got) == 10
    for (assign, val), (bval, bp) in zip(got, brute[:10]):
        np.testing.assert_allclose(val, bval, rtol=1e-12)
    # descending order, no duplicates
    vals = [v for _, v in got]
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(len(vals) - 1))
    assigns = {tuple(a) for a, _ in got}
    assert len(assigns) == 10


def test_lexicographical_completeness():
    rng = np.random.default_rng(5)
    profit = rng.normal(size=(3, 3))
    got = list(gc.lexicographical_pairing(profit, 3))
    assert len(got) == 6  # 3! permutations, none gated out
    seen = {tuple(a) for a, _ in got}
    assert len(seen) == 6
    for assign, val in got:
        np.testing.assert_allclose(
            val, sum(profit[i, assign[i]] for i in range(3)), rtol=1e-12
        )
