"""Distributed Schur BA: parity with the dense single-device Gauss-Newton
solver on a virtual 8-device mesh (the multi-host layout of the BASELINE
10k-landmark configuration, validated shape-reduced)."""

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu import models
from monorfs_tpu.geometry import pose3d
from monorfs_tpu.parallel import dist_ba
from monorfs_tpu.slam import graph


def _build_prm3d_problem(rng, n_poses=6, n_lms=16, t_cap=8, l_cap=16,
                         f_cap=128):
    """Random 3D pixel-range graph: chained poses, landmarks in front of the
    camera, exact measurements, noisy initialization."""
    model = models.get("PRM3D")
    cfg = graph.GraphConfig(max_poses=t_cap, max_landmarks=l_cap,
                            max_factors=f_cap, gn_iters=6)

    true_poses = [np.array([0, 0, 0, 1, 0, 0, 0.0])]
    deltas = []
    for _ in range(n_poses - 1):
        d = np.concatenate([rng.normal(size=3) * 0.03,
                            rng.normal(size=3) * 0.01])
        deltas.append(d)
        true_poses.append(np.asarray(
            pose3d.add_odometry(jnp.asarray(true_poses[-1]), jnp.asarray(d))
        ))
    true_lms = np.column_stack([
        rng.uniform(-0.3, 0.3, n_lms),
        rng.uniform(-0.3, 0.3, n_lms),
        rng.uniform(0.8, 1.5, n_lms),
    ])

    st = graph.empty_state(model, cfg, true_poses[0], jnp.float64)
    poses0 = st.poses
    for t in range(1, n_poses):
        poses0 = poses0.at[t].set(pose3d.add(
            jnp.asarray(true_poses[t]), jnp.asarray(rng.normal(size=6) * 0.01)
        ))
    lms0, lm_mask = st.landmarks, st.lm_mask
    for j in range(n_lms):
        lms0 = lms0.at[j].set(
            jnp.asarray(true_lms[j] + rng.normal(size=3) * 0.02)
        )
        lm_mask = lm_mask.at[j].set(True)
    between, bmask = st.between, st.between_mask
    for t, d in enumerate(deltas, start=1):
        between = between.at[t].set(jnp.asarray(d))
        bmask = bmask.at[t].set(True)

    f_pose, f_lm, f_z, f_mask = st.f_pose, st.f_lm, st.f_z, st.f_mask
    fi = 0
    for t in range(n_poses):
        for j in range(n_lms):
            if rng.uniform() < 0.6:
                z = model.measure(model.params, jnp.asarray(true_poses[t]),
                                  jnp.asarray(true_lms[j]))
                f_pose = f_pose.at[fi].set(t)
                f_lm = f_lm.at[fi].set(j)
                f_z = f_z.at[fi].set(z)
                f_mask = f_mask.at[fi].set(True)
                fi += 1

    st = graph.GraphState(
        poses=poses0, n_poses=jnp.int32(n_poses), landmarks=lms0,
        lm_mask=lm_mask, between=between, between_mask=bmask,
        pose_fixed=st.pose_fixed, f_pose=f_pose, f_lm=f_lm, f_z=f_z,
        f_mask=f_mask,
    )
    minfo = jnp.asarray(np.diag(1.0 / (np.array([5e-3] * 3 + [2e-4] * 3))))
    sinfo = jnp.asarray(np.diag(1.0 / np.array([2.0, 2.0, 1e-3])))
    return model, cfg, st, minfo, sinfo


def test_dist_ba_matches_dense():
    """8-way landmark-sharded GN returns the same poses/landmarks as the
    dense solver (identical math, psum-reduced pose system)."""
    rng = np.random.default_rng(3)
    model, gcfg, st, minfo, sinfo = _build_prm3d_problem(rng)

    dense = graph.gauss_newton(model, gcfg, st, minfo, sinfo)

    mesh = dist_ba.make_landmark_mesh()
    n = mesh.shape["landmarks"]
    assert n == 8
    dcfg = dist_ba.DistBAConfig(
        max_poses=gcfg.max_poses, max_landmarks=gcfg.max_landmarks,
        max_factors=gcfg.max_factors, gn_iters=gcfg.gn_iters,
        damping=gcfg.damping,
    )
    fp, fl, fz, fm = dist_ba.partition_factors(
        dcfg, n, st.f_pose, st.f_lm, st.f_z, st.f_mask
    )
    lms, lmask, fp, fl, fz, fm = dist_ba.shard_ba_inputs(
        mesh, "landmarks", st.landmarks, st.lm_mask,
        fp, fl, jnp.asarray(fz), fm,
    )
    solve = dist_ba.make_dist_gauss_newton(model, dcfg, mesh)
    poses, landmarks = solve(
        st.poses, st.n_poses, st.pose_fixed, st.between, st.between_mask,
        lms, lmask, fp, fl, fz, fm, minfo, sinfo,
    )

    np.testing.assert_allclose(np.asarray(poses), np.asarray(dense.poses),
                               atol=1e-9)
    np.testing.assert_allclose(
        np.sort(np.asarray(landmarks), axis=0),
        np.sort(np.asarray(dense.landmarks), axis=0), atol=1e-9,
    )


def test_dist_ba_converges_on_bigger_graph():
    """Larger sharded problem (48 landmarks over 8 shards): the distributed
    solve reaches near-zero measurement residuals."""
    rng = np.random.default_rng(11)
    model, gcfg, st, minfo, sinfo = _build_prm3d_problem(
        rng, n_poses=8, n_lms=48, t_cap=8, l_cap=48, f_cap=512
    )
    mesh = dist_ba.make_landmark_mesh()
    dcfg = dist_ba.DistBAConfig(
        max_poses=gcfg.max_poses, max_landmarks=gcfg.max_landmarks,
        max_factors=gcfg.max_factors, gn_iters=8,
    )
    fp, fl, fz, fm = dist_ba.partition_factors(
        dcfg, 8, st.f_pose, st.f_lm, st.f_z, st.f_mask
    )
    lms, lmask, fp, fl, fz, fm = dist_ba.shard_ba_inputs(
        mesh, "landmarks", st.landmarks, st.lm_mask,
        fp, fl, jnp.asarray(fz), fm,
    )
    solve = dist_ba.make_dist_gauss_newton(model, dcfg, mesh)
    poses, landmarks = solve(
        st.poses, st.n_poses, st.pose_fixed, st.between, st.between_mask,
        lms, lmask, fp, fl, fz, fm, minfo, sinfo,
    )

    # check residuals via the local-landmark routing
    fp_h = np.asarray(fp)
    fl_h = np.asarray(fl)
    fm_h = np.asarray(fm)
    fz_h = np.asarray(fz)
    lms_h = np.asarray(landmarks)
    l_local = dcfg.max_landmarks // 8
    f_local = dcfg.max_factors // 8
    for i in np.flatnonzero(fm_h):
        shard = i // f_local
        lm_global = shard * l_local + fl_h[i]
        z = model.measure(model.params, jnp.asarray(np.asarray(poses)[fp_h[i]]),
                          jnp.asarray(lms_h[lm_global]))
        np.testing.assert_allclose(np.asarray(z), fz_h[i], atol=1e-5)


def test_partition_factors_routing():
    dcfg = dist_ba.DistBAConfig(max_poses=4, max_landmarks=8, max_factors=16)
    f_pose = np.array([0, 1, 2, 0], np.int32)
    f_lm = np.array([0, 3, 7, 4], np.int32)
    f_z = np.ones((4, 3))
    f_mask = np.array([True, True, True, True])
    fp, fl, fz, fm = dist_ba.partition_factors(
        dcfg, 4, f_pose, f_lm, f_z, f_mask
    )
    # shard owns 2 landmarks, 4 factor slots: lm 0,3 -> shards 0,1; 7 -> 3; 4 -> 2
    assert fm.reshape(4, 4).sum(1).tolist() == [1, 1, 1, 1]
    assert fl.reshape(4, 4)[1, 0] == 1  # lm 3 local id = 3 - 2
    assert fl.reshape(4, 4)[3, 0] == 1  # lm 7 local id = 7 - 6
    assert fl.reshape(4, 4)[2, 0] == 0  # lm 4 local id = 0
