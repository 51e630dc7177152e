"""PHD filter step tests with analytic oracles
(mirrors mono-rfs-lib/Test/PHDNavigatorTest.cs in the Linear2D world)."""

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu import models
from monorfs_tpu.config import Config
from monorfs_tpu.gm import mixture
from monorfs_tpu.gm.mixture import GM, DEAD
from monorfs_tpu.slam import phd
from scipy_free_oracles import mvn_logpdf

MODEL = models.get("Linear2D").with_params(
    models.get("Linear2D").params.__class__(range=6.5)
)
POSE = jnp.asarray([1.0, 2.0])


def make_cfg(**kw):
    defaults = dict(
        num_particles=1,
        max_components=16,
        max_measurements=4,
        gate_top=8,
        estimate_cap=8,
        beam_width=64,
    )
    defaults.update(kw)
    return phd.PHDConfig(**defaults)


def make_params(**kw):
    cfg = Config()
    cfg.set_linear2d_defaults()
    p = cfg.phd_params(np.float64)
    if kw:
        p = p._replace(**{k: jnp.asarray(v, jnp.float64) for k, v in kw.items()})
    return p


def gm_of(means, covs, ws, cap=16):
    k = len(ws)
    mean = np.zeros((cap, 3))
    cov = np.tile(np.eye(3), (cap, 1, 1))
    logw = np.full(cap, DEAD)
    mean[:k] = means
    cov[:k] = covs
    logw[:k] = np.log(ws)
    return GM(jnp.asarray(mean), jnp.asarray(cov), jnp.asarray(logw))


def pad_meas(z, m=4):
    out = np.zeros((m, 2))
    out[: len(z)] = z
    mask = np.arange(m) < len(z)
    return jnp.asarray(out), jnp.asarray(mask)


def live_components(gm):
    alive = np.asarray(mixture.alive(gm))
    return (
        np.asarray(gm.mean)[alive],
        np.asarray(gm.cov)[alive],
        np.asarray(mixture.weights(gm))[alive],
    )


def test_predict_initial():
    """Birth at the unexplored back-projection (PHDNavigatorTest:86-104)."""
    params = make_params()
    empty = mixture.empty(16, 3, jnp.float64)
    z, zmask = pad_meas([[2.0, 3.0]])
    births = phd._births(MODEL, params, POSE, empty, z, zmask)
    alive = np.asarray(births.logw) > -1e29
    assert alive.sum() == 1
    np.testing.assert_allclose(np.asarray(births.mean)[alive][0], [3, 5, 0], atol=1e-9)
    np.testing.assert_allclose(
        np.exp(np.asarray(births.logw)[alive][0]), 0.05, rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(births.cov)[alive][0], 0.01 * np.eye(3), atol=1e-12
    )


def test_predict_known():
    """No birth where the map already has density (PHDNavigatorTest:106-126)."""
    params = make_params()
    gm = gm_of([[3, 5, 0]], [np.eye(3)], [1.0])
    z, zmask = pad_meas([[2.0, 3.0]])
    births = phd._births(MODEL, params, POSE, gm, z, zmask)
    assert (np.asarray(births.logw) > -1e29).sum() == 0


def _multiply_oracle(gz_mean, gz_cov2, w_z, comp_mean, comp_cov, w_c):
    """Gaussian.Multiply in the 2D measurement subspace (the z-dim carries no
    information in the Linear2D embedding; PHDNavigatorTest:145-174)."""
    s = gz_cov2 + comp_cov[:2, :2]
    scale = np.exp(mvn_logpdf(gz_mean[:2], comp_mean[:2], s))
    si = np.linalg.inv(s)
    gain = comp_cov[:3, :2] @ si
    mean = comp_mean + gain @ (gz_mean[:2] - comp_mean[:2])
    h = np.zeros((2, 3))
    h[:, :2] = np.eye(2)
    cov = (np.eye(3) - gain @ h) @ comp_cov
    return scale * w_z * w_c, mean, cov


def test_correct_analytic():
    """Full analytic posterior check (PHDNavigatorTest.Correct:129-193)."""
    params = make_params(density_radius=100.0)  # un-gated, as the test expects
    cfg = make_cfg()
    pd = 0.9
    clutter = float(params.clutter_density)
    r2 = np.asarray(params.meas_cov)

    comps = [
        ([3.0, 5, 0], np.eye(3), 0.8),
        ([7.0, 5, 0], 4.0 * np.eye(3), 1.4),
    ]
    gm = gm_of([c[0] for c in comps], [c[1] for c in comps], [c[2] for c in comps])
    zs = [[2.0, 3.0], [5.0, 3.0]]
    z, zmask = pad_meas(zs)

    # ramp large enough that everything is fully visible (PD = 0.9 flat)
    params = params._replace(visibility_ramp=jnp.asarray([1e-6, 1e-6]))

    corrected = phd._correct(MODEL, cfg, params, POSE, gm, z, zmask)
    means, covs, ws = live_components(corrected)
    assert len(ws) == 6

    # oracle: misdetections + per-measurement normalized products
    expected = [
        (0.8 * (1 - pd), comps[0][0], comps[0][1]),
        (1.4 * (1 - pd), comps[1][0], comps[1][1]),
    ]
    for zi in zs:
        gz = np.array([1 + zi[0], 2 + zi[1], 0.0])
        prods = [
            _multiply_oracle(gz, r2, 1.0, np.asarray(c[0]), c[1], c[2])
            for c in comps
        ]
        sumw = sum(p[0] for p in prods)
        for w, mean, cov in prods:
            expected.append((w * pd / (clutter + pd * sumw), mean, cov))

    for w_e, m_e, c_e in expected:
        found = False
        for i in range(len(ws)):
            if (
                np.allclose(means[i], m_e, atol=1e-5)
                and np.allclose(ws[i], w_e, rtol=1e-5)
                and np.allclose(covs[i], c_e, atol=1e-5)
            ):
                found = True
                break
        assert found, f"component not found: w={w_e}, mean={m_e}"


def test_prune_reference_scenario():
    """PHDNavigatorTest.Prune:196-265: big components survive, irrelevant
    pruned, two mergeable clusters moment-merged."""
    mergedist = 0.3
    minweight = 1e-3
    eye = np.eye(3)

    bigones = [
        ([-12.0, -24, -54], eye, 23.0),
        ([-80.0, -22, -12], 4 * eye, 1.0),
        ([-63.0, -11, -95], 0.1 * eye, 6.0),
    ]
    irrelevant = [
        ([12.0, 24, 54], eye, 0.3 * minweight),
        ([80.0, 22, 12], 4 * eye, 0.8 * minweight),
        ([63.0, 11, 95], 0.1 * eye, 0.99 * minweight),
        ([23.0, 19, 73], eye, 1e-12),
    ]
    mergeable1 = [
        ([0.0, 0, 0], eye, 1.0),
        ([0.0, mergedist, 0], eye, 0.6),
        ([0.0, mergedist / 2, 0], eye, 1.2),
    ]
    mergeable2 = [
        ([99 - mergedist / 6, 99.0, 99], eye, 0.9),
        ([99.0, 99 - mergedist / 6, 99], eye, 0.5),
        ([99.0, 99, 99 - mergedist / 6], eye, 1.1),
    ]
    allc = bigones + irrelevant + mergeable1 + mergeable2
    gm = gm_of(
        [c[0] for c in allc], [c[1] for c in allc], [c[2] for c in allc], cap=16
    )
    out = mixture.prune_merge(
        gm, max_quantity=16, min_weight=minweight, merge_threshold=mergedist
    )
    means, covs, ws = live_components(out)
    assert len(ws) == 5

    def moment_merge(cluster):
        w = sum(c[2] for c in cluster)
        m = sum(c[2] * np.asarray(c[0]) for c in cluster) / w
        p = (
            sum(
                c[2] * (c[1] + np.outer(np.asarray(c[0]), np.asarray(c[0])))
                for c in cluster
            )
            / w
        )
        p -= np.outer(m, m)
        return (m, p, w)

    expected = [(np.asarray(m), c, w) for m, c, w in bigones]
    expected.append(moment_merge(mergeable1))
    expected.append(moment_merge(mergeable2))

    for m_e, c_e, w_e in expected:
        found = any(
            np.allclose(means[i], m_e, atol=1e-5)
            and np.allclose(ws[i], w_e, rtol=1e-5)
            and np.allclose(covs[i], c_e, atol=1e-5)
            for i in range(len(ws))
        )
        assert found, f"missing merged component at {m_e}"


def test_mapping_converges_to_landmarks():
    """1-particle mapping run in the Linear2D fixture world: after a few
    frames of repeated measurements the expected map size approaches the
    number of visible landmarks (statistical smoke, SimulationTest style)."""
    landmarks = np.array([[2.0, 2, 0], [3.0, 4, 0], [3.0, 3.5, 0]])
    params = make_params()
    cfg = make_cfg(num_particles=1, max_components=32)
    step = phd.make_slam_step(MODEL, cfg, slam=False)
    step = jax.jit(step)

    state = phd.init_state(MODEL, cfg, np.asarray(POSE), jnp.float64)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(42)
    meas_std = np.sqrt(np.diag(np.asarray(params.meas_cov)))

    for t in range(30):
        z_true = landmarks[:, :2] - np.asarray(POSE)[None, :]
        z_noisy = z_true + rng.normal(size=z_true.shape) * meas_std
        z, zmask = pad_meas(z_noisy.tolist())
        key, sub = jax.random.split(key)
        state = step(
            params, state, jnp.zeros(2), z, zmask, sub, true_pose=POSE
        )

    gm = GM(state.maps.mean[0], state.maps.cov[0], state.maps.logw[0])
    n_expected = float(mixture.expected_size(gm))
    assert abs(n_expected - 3) < 0.5, n_expected

    idx, valid = mixture.best_map_indices(gm.logw, cap=8)
    est = np.asarray(gm.mean[idx])[np.asarray(valid)]
    assert est.shape[0] == 3
    for lm in landmarks:
        d = np.min(np.linalg.norm(est - lm, axis=1))
        assert d < 0.15, (lm, est)


def test_slam_step_runs_and_normalizes():
    """Full SLAM step smoke: weights stay normalized and finite."""
    params = make_params()
    cfg = make_cfg(num_particles=8, max_components=16)
    step = jax.jit(phd.make_slam_step(MODEL, cfg, slam=True))
    state = phd.init_state(MODEL, cfg, np.asarray(POSE), jnp.float64)
    z, zmask = pad_meas([[1.0, 0.0], [0.5, 1.5]])
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, sub = jax.random.split(key)
        state = step(params, state, jnp.asarray([0.1, 0.05]), z, zmask, sub)
    assert np.isfinite(np.asarray(state.logweight)).all()
    np.testing.assert_allclose(
        np.exp(np.asarray(state.logweight)).sum(), 1.0, rtol=1e-6
    )
    assert 0 <= int(state.best) < 8


def test_soa_correct_prune_matches_aos_spec():
    """The fused SoA correct+prune equals the AoS spec pipeline
    (_births + _correct + prune_merge) whenever the AoS top-G gate does not
    truncate (gate_top = full capacity)."""
    params = make_params()
    cap = 8
    cfg = make_cfg(max_components=cap, gate_top=cap + 4)
    gm = gm_of(
        [[3, 5, 0], [-1, 1, 0], [2.5, 4.5, 0]],
        [np.eye(3) * 0.04, np.eye(3) * 0.09, np.eye(3) * 0.04],
        [0.9, 0.7, 0.4],
        cap=cap,
    )
    z, zmask = pad_meas([[2.0, 3.0], [1.4, 2.4]])

    # AoS spec pipeline
    births = phd._births(MODEL, params, POSE, gm, z, zmask)
    predicted = mixture.concat(gm, births)
    cand = phd._correct(MODEL, cfg, params, POSE, predicted, z, zmask)
    ref = mixture.prune_merge(
        cand, cfg.max_components, params.min_weight, params.merge_threshold,
        rounds=cfg.merge_rounds,
    )

    # SoA fused path
    to_map_s = MODEL.to_map_soa_fn()
    fns = (
        MODEL.measure_soa_fn(),
        MODEL.jac_landmark_soa_fn(),
        to_map_s,
        MODEL.fuzzy_visible_soa_fn(params.depth_map),
    )
    zl = [z[:, i] for i in range(MODEL.meas_dim)]
    sgm = mixture.soa_of(gm)
    births_s = phd._births_soa(MODEL, to_map_s, params, POSE, sgm, zl, zmask)
    predicted_s = mixture.concat_soa(sgm, births_s)
    out = phd._correct_prune_soa(
        MODEL, cfg, params, fns, POSE, predicted_s, zl, zmask
    )

    m_ref, c_ref, w_ref = live_components(ref)
    m_out, c_out, w_out = live_components(mixture.aos_of(out))
    assert len(w_ref) == len(w_out)
    o_ref = np.argsort(-w_ref)
    o_out = np.argsort(-w_out)
    np.testing.assert_allclose(w_out[o_out], w_ref[o_ref], rtol=1e-8)
    np.testing.assert_allclose(m_out[o_out], m_ref[o_ref], atol=1e-8)
    np.testing.assert_allclose(c_out[o_out], c_ref[o_ref], atol=1e-8)
