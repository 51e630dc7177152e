"""Parity of the fused Pallas births+correct+prune kernel vs the XLA path.

The kernel (slam/fused_pallas.py) must reproduce the SoA reference path
(_births_soa + concat_soa + _correct_prune_soa) component-for-component on
realistic states; runs in Pallas interpret mode on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monorfs_tpu.config import Config
from monorfs_tpu.gm import mixture
from monorfs_tpu.models import get as get_model
from monorfs_tpu.slam import fused_pallas, phd


def _reference_stage(model, cfg, params, pose, maps, z, z_mask):
    """The XLA SoA path as used by make_slam_step (per-particle vmap)."""
    d = model.meas_dim
    zl = [z[:, i] for i in range(d)]
    measure_s = model.measure_soa_fn()
    jac_s = model.jac_landmark_soa_fn()
    to_map_s = model.to_map_soa_fn()
    fuzzy_s = model.fuzzy_visible_soa_fn(params.depth_map)
    fns = (measure_s, jac_s, to_map_s, fuzzy_s)

    def per_particle(pose_i, maps_i):
        births = phd._births_soa(
            model, to_map_s, params, pose_i, maps_i, zl, z_mask
        )
        predicted = mixture.concat_soa(maps_i, births)
        corrected = phd._correct_prune_soa(
            model, cfg, params, fns, pose_i, predicted, zl, z_mask
        )
        return predicted, corrected

    return jax.vmap(per_particle)(pose, maps)


def _component_sets(sgm, p):
    """Per-particle sorted (by logw desc) alive component arrays."""
    logw = np.asarray(sgm.logw)
    mean = np.stack([np.asarray(sgm.mx), np.asarray(sgm.my),
                     np.asarray(sgm.mz)], axis=-1)
    cov6 = np.stack([np.asarray(getattr(sgm, n)) for n in
                     ("cxx", "cxy", "cxz", "cyy", "cyz", "czz")], axis=-1)
    out = []
    for i in range(p):
        al = logw[i] > mixture.ALIVE_THRESHOLD / 2
        order = np.argsort(-logw[i][al], kind="stable")
        out.append((logw[i][al][order], mean[i][al][order],
                    cov6[i][al][order]))
    return out


def _random_state(model, cfg, seed, p, n_lm=12, dtype=jnp.float32):
    """A 'warm' random filter state: landmark-like components + noise."""
    rng = np.random.default_rng(seed)
    k0 = cfg.max_components
    lm = rng.uniform(-0.8, 0.8, (n_lm, 3))
    lm[:, 2] = rng.uniform(0.4, 1.6, n_lm)
    mean = np.zeros((p, k0, 3))
    logw = np.full((p, k0), mixture.DEAD)
    cov = np.tile(np.eye(3) * 0.02, (p, k0, 1, 1))
    for i in range(p):
        idx = rng.permutation(k0)[:n_lm]
        mean[i, idx] = lm + rng.normal(0, 0.03, lm.shape)
        logw[i, idx] = rng.uniform(-1.2, 0.4, n_lm)
    gm = mixture.GM(jnp.asarray(mean, dtype), jnp.asarray(cov, dtype),
                    jnp.asarray(logw, dtype))
    maps = mixture.soa_of(gm)

    pose = np.tile(np.array([0, 0, 0, 1, 0, 0, 0.0]), (p, 1))
    pose[:, :3] += rng.normal(0, 0.02, (p, 3))
    pose = jnp.asarray(pose, dtype)

    m = cfg.max_measurements
    z = np.zeros((m, 3))
    n_live = min(n_lm, m - 2)
    zs = np.asarray(
        model.measure(model.params, pose[0][None, :], jnp.asarray(lm))
    )
    z[:n_live] = zs[:n_live] + rng.normal(0, 1.0, (n_live, 3)) * np.array(
        [2.0, 2.0, 0.01]
    )
    z[n_live] = [5.0, -10.0, 1.2]  # clutter
    z_mask = np.arange(m) < n_live + 1
    return pose, maps, jnp.asarray(z, dtype), jnp.asarray(z_mask)


def _params(cfg3, dtype=jnp.float32):
    return cfg3.phd_params(dtype)


@pytest.mark.parametrize("seed", [0, 3])
def test_fused_matches_xla(seed):
    model = get_model("PRM3D")
    cfg = phd.PHDConfig(
        num_particles=5, max_components=48, max_measurements=10,
        gate_top=8, merge_rounds=4,
    )
    params = _params(Config())
    p = 5
    pose, maps, z, z_mask = _random_state(model, cfg, seed, p)

    pred_ref, cor_ref = _reference_stage(
        model, cfg, params, pose, maps, z, z_mask
    )
    pred_k, cor_k = fused_pallas.fused_stage(
        model, cfg, params, pose, maps, z, z_mask, interpret=True, bp=4
    )

    # predicted mixture: same math, near-exact
    for a, b in zip(pred_ref, pred_k):
        aa, bb = np.asarray(a), np.asarray(b)
        live = aa > mixture.ALIVE_THRESHOLD / 2 if a is pred_ref.logw else \
            np.ones_like(aa, bool)
        np.testing.assert_allclose(aa[live], bb[live], rtol=2e-5, atol=2e-5)

    ref_sets = _component_sets(cor_ref, p)
    k_sets = _component_sets(cor_k, p)
    for i in range(p):
        lw_r, mu_r, c6_r = ref_sets[i]
        lw_k, mu_k, c6_k = k_sets[i]
        assert len(lw_r) == len(lw_k), (i, len(lw_r), len(lw_k))
        np.testing.assert_allclose(lw_k, lw_r, rtol=1e-4, atol=1e-4)
        # sort can pair equal-weight components differently; match greedily
        # by mean distance
        used = np.zeros(len(lw_r), bool)
        for j in range(len(lw_k)):
            dist = np.linalg.norm(mu_r - mu_k[j], axis=-1) + np.where(
                used, 1e9, 0.0
            )
            jj = int(np.argmin(dist))
            used[jj] = True
            np.testing.assert_allclose(
                mu_k[j], mu_r[jj], rtol=1e-4, atol=1e-4
            )
            np.testing.assert_allclose(
                c6_k[j], c6_r[jj], rtol=1e-3, atol=1e-5
            )


def test_fused_cap_binds():
    """When MaxQuantity binds, the kernel keeps at most K_out components and
    they are (a subset of) the reference's heaviest."""
    model = get_model("PRM3D")
    cfg = phd.PHDConfig(
        num_particles=3, max_components=16, max_measurements=10,
        gate_top=4, merge_rounds=4,
    )
    params = _params(Config())
    pose, maps, z, z_mask = _random_state(model, cfg, 7, 3, n_lm=14)

    _, cor_ref = _reference_stage(model, cfg, params, pose, maps, z, z_mask)
    _, cor_k = fused_pallas.fused_stage(
        model, cfg, params, pose, maps, z, z_mask, interpret=True, bp=4
    )
    n_ref = np.asarray(mixture.count(mixture.aos_of(cor_ref)))
    n_k = np.asarray(mixture.count(mixture.aos_of(cor_k)))
    assert (n_k <= cfg.max_components).all()
    # expected map mass should agree within the tie/cap tolerance
    e_ref = np.asarray(mixture.expected_size(mixture.aos_of(cor_ref)))
    e_k = np.asarray(mixture.expected_size(mixture.aos_of(cor_k)))
    np.testing.assert_allclose(e_k, e_ref, rtol=0.05, atol=0.05)
