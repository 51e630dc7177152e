"""Fused Pallas TPU kernel for the PHD births + correct + prune stage.

The roofline audit (tools/roofline_phd.py, BENCH.md) shows the XLA step is
memory-bound on INTERMEDIATE traffic: at 200 particles the correct+prune
stage moves ~346 MB/frame through HBM (XLA cost model) against a ~2 MB
mixture state -- every dense [P, M, K] pair tensor, one-hot gather and
[P, K, K] merge matrix is materialized off-chip. This kernel runs the whole
stage -- birth proposals, EKF precompute, dense pair scoring, the
MaxQuantity weight cut, survivor compaction and the greedy Mahalanobis
merge -- in one pallas_call with every intermediate resident in VMEM, so
HBM traffic collapses to the state itself (read maps, write predicted +
corrected).

Reference semantics being fused (the PHD hot loop,
mono-rfs-lib/SLAM/Navigators/PHDNavigator.cs):
  birth at unexplored back-projections  :793-819
  misdetection reweight + EKF update    :829-906
  MaxQuantity / MinWeight weight cut    :913-929
  greedy weight-ordered merge           :930-948

Kernel-specific reformulations (parity-tested against the XLA SoA path in
tests/test_fused_pallas.py):

  * lax.top_k over the {misdetections} u {pair updates} candidates becomes
    a per-particle BISECTION for the K-th largest log-weight (the cut
    threshold tau) followed by rank compaction -- no sort anywhere. Ties at
    exactly tau are dropped (the reference's cut among equal weights is
    arbitrary too); candidates below max(log(MinWeight), -80) - 1 never
    survive the live filter, so the search window is the live weight range
    and 30 bisection steps resolve tau to ~1e-5.
  * pair survivors are capped at `gate_top` per measurement (extracted by
    an unrolled argmax loop that also reads out their channels via hit-mask
    reductions). After the global cut a measurement keeps >gate_top
    components only in pathological frames; the reference's own hypothesis
    truncation (PHDNavigator.cs:469) is the same kind of bound.
  * survivor compaction is one-hot matmuls (MXU) -- ranks come from
    triangular-matrix prefix sums, not cumsum primitives.
  * the merge's weight-ordered greedy leader rule uses explicit
    (weight, index) comparisons instead of relying on weight-sorted slot
    order (the XLA path's survivors arrive sorted from top_k; here they
    arrive in flat slot order).

The kernel is generic over the model registry's SoA function bundle
(measure/jac/to_map/fuzzy_visible are pure jnp elementwise math, traced
straight into the kernel body); depth-occlusion models (KinectMeasurer)
need dynamic depth-map gathers and keep the XLA path -- see `supported`.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gm import mixture, smallmat
from ..gm.mixture import ALIVE_THRESHOLD, DEAD, SGM

_BP = 8  # particles per program (f32 sublane tile)
_BISECT = 30


def supported(model, cfg, dtype):
    """Whether the fused kernel can run this configuration."""
    return (
        not getattr(model, "uses_depth", False)
        and dtype == jnp.float32
        and model.meas_dim in (1, 2, 3)
    )


def pack_params(model, params):
    """PHDParams -> flat traced [NP] f32 vector (layout must match
    _unpack_params)."""
    d = model.meas_dim
    parts = [
        jnp.reshape(params.pd, (1,)),
        jnp.reshape(params.clutter_density, (1,)),
        jnp.reshape(params.birth_weight, (1,)),
        jnp.reshape(params.min_weight, (1,)),
        jnp.reshape(params.merge_threshold, (1,)),
        jnp.reshape(params.exploration_threshold, (1,)),
        jnp.reshape(params.density_radius, (1,)),
        jnp.reshape(params.visibility_ramp, (d,)),
        jnp.reshape(params.meas_cov, (d * d,)),
        jnp.reshape(params.birth_cov, (9,)),
    ]
    return jnp.concatenate([p.astype(jnp.float32) for p in parts])


def _unpack_params(ref, d):
    """SMEM ref -> dict of scalars / scalar-lists (trace-time unrolled)."""
    p = {
        "pd": ref[0], "clutter": ref[1], "birth_w": ref[2],
        "min_w": ref[3], "merge_thr": ref[4], "explore_thr": ref[5],
        "radius": ref[6],
    }
    o = 7
    p["ramp"] = [ref[o + i] for i in range(d)]
    o += d
    p["meas_cov"] = [[ref[o + i * d + j] for j in range(d)] for i in range(d)]
    o += d * d
    p["birth_cov"] = [[ref[o + i * 3 + j] for j in range(3)] for i in range(3)]
    return p


def _tri_lower_strict(n, dtype):
    """[n, n] strictly-lower-triangular ones: x @ T = exclusive prefix sum
    over the lane axis."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (i < j).astype(dtype)


def _pdot(a, b):
    """Per-particle 2D matmuls over the leading bp axis (unrolled; Mosaic
    prefers plain 2D dots).

    Precision.HIGHEST is load-bearing: these dots are one-hot gathers and
    pooled moment sums, and the default f32 matmul may run as bf16 MXU
    passes -- the ~3e-3 relative truncation of gathered means flipped
    merge decisions and tripled the bench ATE (same guard as the XLA
    path's _exact_dot, slam/phd.py)."""
    outs = [
        jax.lax.dot(
            a[i], b[i], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for i in range(a.shape[0])
    ]
    return jnp.stack(outs, axis=0)


def _first_true_idx(mask, axis, size):
    """Index of the first True along `axis` (size where none)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, mask.shape, axis)
    return jnp.min(jnp.where(mask, iota, size), axis=axis)


def _make_kernel(model, k0, m, k_out, d, gate_top, merge_rounds,
                 stop_after=None):
    """stop_after: debug knob for vmem bisection -- truncate the kernel
    after a named phase ('scores' | 'cut' | 'compact'), writing zeros to
    the remaining outputs."""
    kp = k0 + m
    measure_s = model.measure_soa
    jac_s = model.jac_landmark_soa
    to_map_s = model.to_map_soa
    fuzzy_s = model.fuzzy_visible_soa
    mp = model.params

    def kernel(params_ref, pose_ref, *refs):
        maps_refs = refs[:10]
        zt_ref, zmask_ref = refs[10], refs[11]
        pred_refs = refs[12:22]
        cor_refs = refs[22:32]

        prm = _unpack_params(params_ref, d)
        n_bp = pose_ref.shape[0]
        f32 = jnp.float32

        zl = [zt_ref[i : i + 1, :] for i in range(d)]  # d x [1, M]
        z_livef = zmask_ref[:]  # [1, M] f32 (Mosaic cannot insert a minor
        # dim on i1 vectors, so bool masks stay f32 until after reshapes)
        z_live = z_livef > 0.5

        ip = 0
        pose = pose_ref[:]
        mean0 = [maps_refs[i][:] for i in range(3)]
        cov0 = tuple(maps_refs[3 + i][:] for i in range(6))
        logw0 = maps_refs[9][:]
        _particle_body(
            ip, pose, n_bp, mean0, cov0, logw0, zl, z_live, z_livef,
            prm, pred_refs, cor_refs, f32,
        )

    def _particle_body(ip, pose, bp, mean0, cov0, logw0, zl, z_live,
                       z_livef, prm, pred_refs, cor_refs, f32):

        # ---- births (PredictConditional, :793-819) -------------------------
        # back-projections double as the gating anchors of the pair stage
        cand = to_map_s(mp, pose, zl)  # 3 x [bp, M]
        cov0m = smallmat.sym_to_mat(cov0)
        det0 = smallmat.det(cov0m)
        inv0 = smallmat.inv(cov0m, det0)
        logmult0 = smallmat.log_multiplier(cov0m, det0)
        diff0 = [
            c[:, :, None] - mm[:, None, :] for c, mm in zip(cand, mean0)
        ]  # [bp, M, K0]
        inv0_b = [[e[:, None, :] for e in row] for row in inv0]
        m2_0 = smallmat.quadform(diff0, inv0_b)
        logp0 = logmult0[:, None, :] - 0.5 * m2_0
        dist2_0 = sum(dd * dd for dd in diff0)
        r3 = 3.0 * prm["radius"]
        bmask = (
            (logw0 > ALIVE_THRESHOLD)[:, None, :]
            & (dist2_0 <= r3 * r3)
        )
        density = jnp.sum(
            jnp.where(bmask, jnp.exp(logw0[:, None, :] + logp0), 0.0),
            axis=-1,
        )  # [bp, M]
        unexplored = z_live & (density < prm["explore_thr"])
        birth_logw = jnp.where(unexplored, jnp.log(prm["birth_w"]), DEAD)

        # predicted mixture channels [bp, KP]
        mean = [
            jnp.concatenate([mm, c], axis=-1) for mm, c in zip(mean0, cand)
        ]
        bcov = prm["birth_cov"]
        bc6 = smallmat.mat_to_sym(bcov)
        cov6 = tuple(
            jnp.concatenate(
                [c0, jnp.broadcast_to(b6, (bp, m)).astype(f32)], axis=-1
            )
            for c0, b6 in zip(cov0, bc6)
        )
        logw = jnp.concatenate([logw0, birth_logw.astype(f32)], axis=-1)

        for i in range(3):
            pred_refs[i][pl.ds(ip, bp), :] = mean[i]
        for i in range(6):
            pred_refs[3 + i][pl.ds(ip, bp), :] = cov6[i]
        pred_refs[9][pl.ds(ip, bp), :] = logw

        # ---- EKF precompute (CorrectConditional, :857-870) -----------------
        alive = logw > ALIVE_THRESHOLD
        cov = smallmat.sym_to_mat(cov6)
        h = measure_s(mp, pose, mean)  # d x [bp, KP]
        pd_k = jnp.where(
            alive, fuzzy_s(mp, h, prm["ramp"]) * prm["pd"], 0.0
        )
        pd_k = jnp.clip(pd_k, 0.0, 1.0 - 1e-7)
        miss_logw = jnp.where(alive, logw + jnp.log1p(-pd_k), DEAD)

        hj = jac_s(mp, pose, mean)  # d x 3 of [bp, KP] (or broadcastable)
        hj = [
            [jnp.broadcast_to(e, (bp, kp)).astype(f32) for e in row]
            for row in hj
        ]
        pht = smallmat.matmul(cov, smallmat.transpose(hj))
        r = prm["meas_cov"]
        s = smallmat.add(smallmat.matmul(hj, pht), r)
        det_s = smallmat.det(s)
        s_inv = smallmat.inv(s, det_s)
        s_logmult = smallmat.log_multiplier(s, det_s)
        gain = smallmat.matmul(pht, s_inv)  # 3 x d of [bp, KP]
        ikh = smallmat.sub(
            smallmat.identity_like(3, logw), smallmat.matmul(gain, hj)
        )
        cov_upd = smallmat.mat_to_sym(
            smallmat.symmetrize(smallmat.matmul(ikh, cov))
        )  # 6 x [bp, KP]

        # ---- dense pair scores [bp, M, KP] (:881-903) ----------------------
        backp = cand  # to_map of z (already computed for births)
        diffp = [
            b[:, :, None] - mm[:, None, :] for b, mm in zip(backp, mean)
        ]
        dist2 = sum(dd * dd for dd in diffp)
        r2 = prm["radius"] * prm["radius"]
        in_gate = (
            (dist2 <= r2)
            & alive[:, None, :]
            & (z_livef[:, :, None] > 0.5)
        )

        innov = [
            zi[:, :, None] - hi[:, None, :] for zi, hi in zip(zl, h)
        ]  # d x [bp, M, KP]
        s_inv_b = [[e[:, None, :] for e in row] for row in s_inv]
        q_log = s_logmult[:, None, :] - 0.5 * smallmat.quadform(
            innov, s_inv_b
        )
        q_log = jnp.where(jnp.isfinite(q_log), q_log, DEAD)
        log_pd_k = jnp.log(jnp.maximum(pd_k, 1e-30))
        log_num = jnp.where(
            in_gate,
            log_pd_k[:, None, :] + logw[:, None, :] + q_log,
            DEAD,
        )
        wsum = jnp.sum(
            jnp.where(in_gate, jnp.exp(log_num), 0.0), axis=-1
        )  # [bp, M]
        upd_logw = log_num - jnp.log(prm["clutter"] + wsum)[:, :, None]
        upd_logw = jnp.where(in_gate, upd_logw, DEAD)

        # pair update means (dense; cov_upd is per-component). Sanitized
        # here: non-finite values at NON-hit entries would still poison the
        # hit-mask reductions below through 0 * inf = NaN (the XLA path
        # sanitizes its gather features the same way).
        gdot = smallmat.matvec(
            [[e[:, None, :] for e in row] for row in gain], innov
        )  # 3 x [bp, M, KP]
        mean_upd = [
            mm[:, None, :] + gd for mm, gd in zip(mean, gdot)
        ]
        mean_upd = [jnp.where(jnp.isfinite(c), c, 0.0) for c in mean_upd]
        cov_upd = tuple(
            jnp.where(jnp.isfinite(c), c, 0.0) for c in cov_upd
        )


        if stop_after == "scores":
            zz = jnp.zeros_like(logw0) * 0.0 + (jnp.sum(jnp.sum(jnp.where(jnp.isfinite(upd_logw), upd_logw, 0.0), axis=2), axis=1, keepdims=True) + jnp.sum(miss_logw * 0.0, axis=-1, keepdims=True))
            for _i in range(10):
                cor_refs[_i][pl.ds(ip, bp), :] = zz
            return 0
        # ---- MaxQuantity cut: bisect the K-th largest weight (:921-929) ----
        # per-particle scalars stay [bp, 1]: Mosaic cannot reshape 1D
        # vectors into higher rank
        lminw = jnp.maximum(jnp.log(prm["min_w"]), -80.0)
        cand_miss = jnp.where(miss_logw >= lminw, miss_logw, DEAD)
        cand_pair = jnp.where(upd_logw >= lminw, upd_logw, DEAD)
        hi = jnp.maximum(
            jnp.max(cand_miss, axis=-1, keepdims=True),
            jnp.max(
                jnp.max(cand_pair, axis=-1), axis=-1, keepdims=True
            ),
        )  # [bp, 1]
        lo = jnp.full((bp, 1), 0.0, f32) + lminw - 1.0
        hi = jnp.maximum(hi, lo + 1e-3)

        def count_above(t):  # t [bp, 1] -> [bp, 1]
            cm = jnp.sum(
                (cand_miss > t).astype(f32), axis=-1, keepdims=True
            )
            cu = jnp.sum(
                jnp.sum((cand_pair > t[:, :, None]).astype(f32), axis=-1),
                axis=-1, keepdims=True,
            )
            return cm + cu

        # keep-all when the cap does not bind (count(> lo) <= K_out)
        all_fit = count_above(lo) <= float(k_out)

        # fori_loop keeps each iteration's intermediates off the Mosaic
        # scoped-vmem stack (30 unrolled iterations measured 40 MB of stack
        # at TINY shapes); the tiny f32 [bp, 1] carry legalizes fine --
        # it was the merge loop's [bp, K, K] bool carry that did not
        def bis(_, lohi):
            lo_b, hi_b = lohi
            mid = 0.5 * (lo_b + hi_b)
            over = count_above(mid) > float(k_out)
            return (
                jnp.where(over, mid, lo_b),
                jnp.where(over, hi_b, mid),
            )

        _, hi_b = jax.lax.fori_loop(0, _BISECT, bis, (lo, hi))
        tau = jnp.where(all_fit, lo, hi_b)  # [bp, 1]

        keep_miss = cand_miss > tau  # [bp, KP]
        keep_pair = cand_pair > tau[:, :, None]  # [bp, M, KP]


        if stop_after == "cut":
            zz = jnp.zeros_like(logw0) * 0.0 + (jnp.sum(tau) + jnp.sum(jnp.sum(keep_pair.astype(f32), axis=2), axis=1, keepdims=True))
            for _i in range(10):
                cor_refs[_i][pl.ds(ip, bp), :] = zz
            return 0
        # ---- compaction ----------------------------------------------------
        t_kp = _tri_lower_strict(kp, f32)
        rank_miss = jax.lax.dot(
            keep_miss.astype(f32), t_kp, preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )  # exclusive prefix count over the lane axis
        n_miss = jnp.sum(keep_miss.astype(f32), axis=-1, keepdims=True)  # [bp, 1]

        cnt_row = jnp.sum(keep_pair.astype(f32), axis=-1)  # [bp, M]
        rowcount = jnp.minimum(cnt_row, float(gate_top))
        t_m = _tri_lower_strict(m, f32)
        row_off = jax.lax.dot(
            rowcount, t_m, preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [bp, M]

        # Everything below is CHANNEL-MAJOR: features stack on the sublane
        # axis ([bp, C, .]) and one-hots are built directly in the
        # orientation each matmul needs. Lane-axis channel stacks/slices
        # ([., C] minor) each force a Mosaic relayout; the lane-minor form
        # of this section measured ~150 MB of compile-time vmem at half
        # the bench shape.
        slot_iota_t = jax.lax.broadcasted_iota(jnp.int32, (bp, kp, k_out), 2)
        oh_miss_t = (
            (keep_miss.astype(f32)[:, :, None] > 0.5)
            & (rank_miss[:, :, None].astype(jnp.int32) == slot_iota_t)
        ).astype(f32)  # [bp, KP, K_out]

        # miss features: mean (3), cov (6), logw
        miss_ch = list(mean) + list(cov6) + [miss_logw]
        miss_ch = [
            jnp.where(keep_miss & jnp.isfinite(c), c, 0.0) for c in miss_ch
        ]
        miss_feat_t = jnp.stack(miss_ch, axis=1)  # [bp, 10, KP]
        cor_t = _pdot(miss_feat_t, oh_miss_t)  # [bp, 10, K_out]

        # pair survivors: per-row argmax extraction (up to gate_top rows)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (bp, m, kp), 2)
        work = jnp.where(keep_pair, cand_pair, -jnp.inf)
        pair_cov_b = [c[:, None, :] for c in cov_upd]  # [bp, 1, KP]
        oh_blocks = []
        feat_blocks = []
        s_iota_m = jax.lax.broadcasted_iota(jnp.int32, (bp, m, k_out), 2)
        for g in range(gate_top):
            mx = jnp.max(work, axis=-1)  # [bp, M]
            idx = _first_true_idx(work == mx[:, :, None], 2, kp)
            fin_mx = jnp.isfinite(mx).astype(f32)
            hit = (k_iota == idx[:, :, None]) & (fin_mx[:, :, None] > 0.5)
            hitf = hit.astype(f32)

            def rd(ch):  # [bp, M, KP] (or broadcastable) -> [bp, M]
                return jnp.sum(hitf * ch, axis=-1)

            chs = (
                [rd(mu) for mu in mean_upd]
                + [rd(c) for c in pair_cov_b]
                + [jnp.where(jnp.isfinite(mx), mx, 0.0)]
            )
            feat_blocks.append(jnp.stack(chs, axis=1))  # [bp, 10, M]

            validf = (
                ((float(g) < rowcount) & jnp.isfinite(mx))
            ).astype(f32)  # [bp, M]
            slot = n_miss + row_off + float(g)  # [bp, M]
            oh_blocks.append(
                (
                    (validf[:, :, None] > 0.5)
                    & (slot[:, :, None].astype(jnp.int32) == s_iota_m)
                ).astype(f32)
            )  # [bp, M, K_out]
            work = jnp.where(hit, -jnp.inf, work)

        oh_pair_t = jnp.concatenate(oh_blocks, axis=1)  # [bp, G*M, K_out]
        pair_feat_t = jnp.concatenate(feat_blocks, axis=-1)  # [bp, 10, G*M]
        cor_t = cor_t + _pdot(pair_feat_t, oh_pair_t)

        filled = (
            jnp.sum(oh_miss_t, axis=1) + jnp.sum(oh_pair_t, axis=1)
        ) > 0.5  # [bp, K_out]
        mean_s = [cor_t[:, i, :] for i in range(3)]
        cov_s = tuple(cor_t[:, 3 + i, :] for i in range(6))
        top_logw = jnp.where(filled, cor_t[:, 9, :], DEAD)
        live = filled


        if stop_after == "compact":
            zz = jnp.zeros_like(logw0) * 0.0 + (jnp.sum(jnp.sum(cor_t, axis=2), axis=1, keepdims=True) + jnp.zeros_like(logw0))
            for _i in range(10):
                cor_refs[_i][pl.ds(ip, bp), :] = zz
            return 0
        # ---- greedy weight-ordered merge (:930-948) ------------------------
        covm = smallmat.sym_to_mat(cov_s)
        det_c = smallmat.det(covm)
        inv_c = smallmat.inv(covm, det_c)  # leader metric, [bp, K_out]
        diff = [
            mi[:, None, :] - mi[:, :, None] for mi in mean_s
        ]  # [bp, i leader, k member]
        inv_b = [[e[:, :, None] for e in row] for row in inv_c]
        m2 = smallmat.quadform(diff, inv_b)
        close = m2 < prm["merge_thr"] * prm["merge_thr"]


        if stop_after == "m2":
            zz = jnp.zeros_like(logw0) * 0.0 + (jnp.sum(jnp.sum(jnp.where(jnp.isfinite(m2), m2, 0.0), axis=2), axis=1, keepdims=True) + jnp.zeros_like(logw0))
            for _i in range(10):
                cor_refs[_i][pl.ds(ip, bp), :] = zz
            return 0
        w = jnp.where(live, jnp.exp(top_logw), 0.0)
        i_iota = jax.lax.broadcasted_iota(jnp.int32, (bp, k_out, k_out), 1)
        k_iota2 = jax.lax.broadcasted_iota(jnp.int32, (bp, k_out, k_out), 2)
        heavier = (w[:, :, None] > w[:, None, :]) | (
            (w[:, :, None] == w[:, None, :]) & (i_iota < k_iota2)
        )
        live_f = live.astype(f32)
        lower = (
            heavier & close & live[:, None, :] & (live_f[:, :, None] > 0.5)
        )

        # unrolled (see bisection note)
        is_leader = live
        for _ in range(merge_rounds):
            lead_f = is_leader.astype(f32)
            conflict = jnp.any(lower & (lead_f[:, :, None] > 0.5), axis=1)
            is_leader = live & ~conflict
        eligible = lower & (is_leader.astype(f32)[:, :, None] > 0.5)
        has = jnp.any(eligible, axis=1)  # [bp, K_out] per member
        lead_w = jnp.where(eligible, w[:, :, None], -1.0)
        mw = jnp.max(lead_w, axis=1)  # [bp, K_out]
        lead_idx = _first_true_idx(
            eligible & (lead_w == mw[:, None, :]), 1, k_out
        )
        member_iota = jax.lax.broadcasted_iota(
            jnp.int32, (bp, k_out), 1
        )
        leader = jnp.where(has, lead_idx, member_iota)


        if stop_after == "leader":
            zz = jnp.zeros_like(logw0) * 0.0 + (jnp.sum(leader.astype(f32), axis=-1, keepdims=True) + jnp.zeros_like(logw0))
            for _i in range(10):
                cor_refs[_i][pl.ds(ip, bp), :] = zz
            return 0
        # both orientations built directly from comparisons (no transpose
        # op): assign [bp, leader i, member k], assign_t [bp, k, i]
        assign = (
            (leader[:, None, :] == i_iota) & live[:, None, :]
        ).astype(f32)
        assign_t = (
            (leader[:, :, None] == k_iota2) & (live_f[:, :, None] > 0.5)
        ).astype(f32)

        mean_feat_t = jnp.stack(mean_s, axis=1)  # [bp, 3, K_out(member)]
        # member k's leader mean: sum_i mean[c, i] * assign[i, k]
        leader_mean_t = _pdot(mean_feat_t, assign)  # [bp, 3, K_out]
        dv = [
            mean_feat_t[:, a, :] - leader_mean_t[:, a, :] for a in range(3)
        ]
        pairs = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
        chans = (
            [w]
            + [w * dv[a] for a in range(3)]
            + [w * dv[a] * dv[b] for a, b in pairs]
            + [w * cov_s[i] for i in range(6)]
        )
        # pooled[c, leader i] = sum_k chan[c, k] * assign_t[k, i]
        pooled_t = _pdot(
            jnp.stack(chans, axis=1), assign_t
        )  # [bp, 16, K_out]

        if stop_after == "pool":
            zz = jnp.zeros_like(logw0) * 0.0 + (jnp.sum(jnp.sum(pooled_t, axis=2), axis=1, keepdims=True) + jnp.zeros_like(logw0))
            for _i in range(10):
                cor_refs[_i][pl.ds(ip, bp), :] = zz
            return 0
        wsum_l = pooled_t[:, 0, :]
        safe = jnp.maximum(wsum_l, 1e-30)
        delta_m = [pooled_t[:, 1 + a, :] / safe for a in range(3)]
        mean_m = [mi + dm for mi, dm in zip(mean_s, delta_m)]
        spread = tuple(
            pooled_t[:, 4 + i, :] / safe - delta_m[a] * delta_m[b]
            for i, (a, b) in enumerate(pairs)
        )
        cov_m = tuple(
            pooled_t[:, 10 + i, :] / safe + spread[i] for i in range(6)
        )

        out_alive = is_leader & (wsum_l > 0)
        out_logw = jnp.where(out_alive, jnp.log(safe), DEAD)
        zero = jnp.zeros_like(out_logw)
        one = jnp.ones_like(out_logw)
        eye6 = (one, zero, zero, one, zero, one)
        for i in range(3):
            cor_refs[i][pl.ds(ip, bp), :] = jnp.where(
                out_alive, mean_m[i], zero
            )
        for i in range(6):
            cor_refs[3 + i][pl.ds(ip, bp), :] = jnp.where(
                out_alive, cov_m[i], eye6[i]
            )
        cor_refs[9][pl.ds(ip, bp), :] = out_logw
        return 0

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("model", "cfg", "interpret", "bp", "stop_after"),
)
def fused_stage(model, cfg, params, pose, maps: SGM, z, z_mask,
                interpret=None, bp=_BP, stop_after=None):
    """Births + correct + prune for ALL particles in one pallas_call.

    pose [P, S]; maps leaves [P, K0]; z [M, D]; z_mask [M].
    Returns (predicted SGM [P, K0+M], corrected SGM [P, K0]).

    interpret=None auto-selects the Pallas interpreter off-TPU so the same
    code path is testable on the CPU mesh."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p, s_dim = pose.shape
    k0 = maps.logw.shape[-1]
    m, d = z.shape
    k_out = cfg.max_components
    assert k0 == k_out, (k0, k_out)
    kp = k0 + m
    f32 = jnp.float32

    pp = (p + bp - 1) // bp * bp
    pad = pp - p

    def padp(x, fill=0.0):
        return jnp.pad(
            x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), constant_values=fill
        )

    pose_p = padp(pose.astype(f32))
    # padded particles carry DEAD identity-covariance maps so their (sliced
    # off) lanes stay NaN-free through the kernel
    fills = [0, 0, 0, 1, 0, 0, 1, 0, 1, DEAD]
    leaves = [
        padp(l.astype(f32), fi) for l, fi in zip(maps, fills)
    ]
    pvec = pack_params(model, params)
    zt = z.T.astype(f32)  # [D, M]
    zm = z_mask.astype(f32)[None, :]  # [1, M]

    kernel = _make_kernel(
        model, k0, m, k_out, d, cfg.gate_top, cfg.merge_rounds,
        stop_after=stop_after,
    )
    grid = (pp // bp,)
    bspec = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    shared = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec((bp, s_dim)),
            *[bspec((bp, k0)) for _ in range(10)],
            shared((d, m)),
            shared((1, m)),
        ],
        out_specs=tuple(
            [bspec((bp, kp)) for _ in range(10)]
            + [bspec((bp, k_out)) for _ in range(10)]
        ),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((pp, kp), f32) for _ in range(10)]
            + [jax.ShapeDtypeStruct((pp, k_out), f32) for _ in range(10)]
        ),
        compiler_params=pltpu.CompilerParams(
            # v5e cores carry far more VMEM than the 16 MB default scoped
            # limit; the straight-line kernel body's stack peaks above it
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pvec, pose_p, *leaves, zt, zm)

    predicted = SGM(*[o[:p] for o in out[:10]])
    corrected = SGM(*[o[:p] for o in out[10:]])
    return predicted, corrected
