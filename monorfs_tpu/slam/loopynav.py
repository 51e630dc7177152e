"""Host-side driver for the Loopy-PHD smoother.

Mirrors the reference navigator lifecycle (LoopyPHDNavigator.cs:223-311):
built from an initial trajectory estimate (an inner PHD/odometry run or a
recorded estimate) plus the odometry and measurement logs, then iterated in
annealed sweeps (temperature 5 / sweep, :369-377). One `sweep()` here equals
one full pass over all nodes (the reference spreads a pass over T SlamUpdate
ticks)."""

import numpy as np
import jax
import jax.numpy as jnp

from ..gm import mixture
from . import loopy


class LoopyPHDNavigator:
    def __init__(self, model, cfg, trajectory, odometry, measurements,
                 max_meas=16, dtype=np.float64, loopy_cfg=None,
                 link_cov=None, anneal_t0=None):
        """trajectory: [T, S] initial estimate; odometry: list of readings
        (odometry[t] produced pose t from pose t-1); measurements: list of
        per-frame measurement lists."""
        self.model = model
        self.cfg = cfg
        self.dtype = dtype
        t = len(trajectory)
        self.n_nodes = t
        self.lcfg = loopy_cfg or loopy.LoopyConfig(max_nodes=t,
                                                   max_meas=max_meas)
        d = model.meas_dim

        # node-to-node odometry: link j -> j+1 is the reading that produced
        # frame j+1 (reference Odometry[i-1] semantics, :440)
        odo = np.zeros((self.lcfg.max_nodes, model.pose.odo_dim))
        for j in range(t - 1):
            odo[j] = odometry[j + 1]
        self.odometry = jnp.asarray(odo, dtype)

        z = np.zeros((self.lcfg.max_nodes, max_meas, d))
        zm = np.zeros((self.lcfg.max_nodes, max_meas), bool)
        for i, zs in enumerate(measurements[:t]):
            for k, zi in enumerate(list(zs)[:max_meas]):
                z[i, k] = np.asarray(zi)[:d]
                zm[i, k] = True
        self.z = jnp.asarray(z, dtype)
        self.z_mask = jnp.asarray(zm)

        traj = np.zeros((self.lcfg.max_nodes, model.pose.state_dim))
        traj[:t] = np.asarray(trajectory)
        traj[t:] = np.asarray(trajectory)[-1]
        self.state = loopy.init_state(model, self.lcfg, traj, t, dtype)

        self.params = cfg.phd_params(dtype)
        # chain-link noise: the vehicle generates odometry noise as
        # dt * N(0, Q) (Vehicle.cs:330-333), so the message-passing chain
        # must use dt^2 Q. (The reference smoother adds the raw Q per link,
        # LoopyPHDNavigator.cs:447 -- dimensionally inconsistent with its
        # own vehicle; with the raw Q the chain is believed ~900x weaker
        # than reality and map messages destroy the odometry information.)
        dt = cfg.measure_elapsed
        if link_cov is None:
            link_cov = dt * dt * cfg.motion_covariance
        self.motion_cov = jnp.asarray(link_cov, dtype)
        self.grad_clip = jnp.asarray(cfg.gradient_clip, dtype)
        self.grad_rate = jnp.asarray(cfg.gradient_ascent_rate, dtype)
        self._sweep = jax.jit(loopy.make_sweep(model, self.lcfg))
        self._sweep_causal = jax.jit(
            loopy.make_sweep(model, self.lcfg, causal=True)
        )
        self._sweep_frozen = jax.jit(
            loopy.make_sweep(model, self.lcfg, freeze_map=True)
        )
        self._refit = (
            jax.jit(loopy.make_sequential_refit(model, self.lcfg))
            if self.lcfg.refit else None
        )
        if self._refit is not None and self.lcfg.refit_backward:
            _fwd = loopy.make_sequential_refit(model, self.lcfg)

            def _back(params, lp, node_mask, odometry, z, z_mask,
                      motion_cov, grad_clip, grad_rate):
                lp_r, odo_r, z_r, zm_r = loopy.reverse_refit_inputs(
                    lp, odometry, z, z_mask
                )
                traj_r = _fwd(params, lp_r, node_mask, odo_r, z_r, zm_r,
                              motion_cov, grad_clip, grad_rate)
                return jnp.flip(traj_r, axis=0)

            self._refit_back = jax.jit(_back)
        else:
            self._refit_back = None
        self._relinearize = jax.jit(lambda st: loopy.relinearize(model, st))
        self._objective = jax.jit(
            lambda st: loopy.trajectory_objective(
                model, self.lcfg, self.params, st, self.odometry, self.z,
                self.z_mask, self.motion_cov,
            )
        )
        self.sweeps = 0
        # Annealing start temperature for the BP sweeps. The reference
        # anneals at 5/(sweep+1) (LoopyPHDNavigator.cs:369-370) because its
        # init comes from an inner PHD run it wants to re-melt; after the
        # sequential refit the estimate is already in the right basin and
        # reheating measurably destroys the map (chap5-s2 lab: sweep-2 OSPA
        # 0.387 -> 0.530 at T=2.5). With refit on, the sweeps therefore
        # run cold (t0=0: map-message covariance keeps its 1x pf_cov base
        # but no annealing inflation); without refit the reference schedule
        # is kept.
        if anneal_t0 is None:
            anneal_t0 = 0.0 if self.lcfg.refit else 5.0
        self.anneal_t0 = float(anneal_t0)
        self.best_state = None
        self.best_objective = -np.inf
        # Round-4 selection study (tools/smoother_lab.py --ospa-each): the
        # sequential-refit state maps best on every chap5 record (OSPA
        # 0.387/0.403/0.802 on s2/k3/k4 vs 0.404-0.519/0.817 for the
        # joint-objective-selected sweep states), but NO internal score
        # tracks that: selecting the map state by the cross-validated
        # measurement term alone was tried and measured WORSE on the grid
        # (k3 OSPA 0.519 -> 0.597) -- the CV term also prefers late-sweep
        # states. Both estimates therefore stay on the single
        # joint-objective selector (the reference has no selection at all;
        # it reports the last Gauss-Seidel state). best_map_state is kept
        # as a diagnostic of the measurement-term argmax.
        self.best_map_state = None
        self.best_map_objective = -np.inf

    def _n_refit_passes(self):
        """Total sequential-refit passes: forward passes + the single
        backward pass (see LoopyConfig.refit_backward)."""
        if self._refit is None:
            return 0
        return self.lcfg.refit_passes + (
            1 if self._refit_back is not None else 0
        )

    def sweep(self):
        """The first pass is the sequential refit -- the reference's
        Gauss-Seidel growing-tofilter schedule (see make_sequential_refit):
        each node is re-localized against the map built from the
        already-corrected prefix, which is both the drift-correction and the
        loop-closure mechanism. Later passes are Jacobi BP sweeps over
        leave-block-out cavity maps (smoothing: backward information flow).
        The joint trajectory objective is tracked every sweep and the best
        state kept (loopy BP on this model is not monotone)."""
        if self.best_state is None:
            # score the initial estimate so a run that only degrades it
            # falls back to it
            self.best_state = self.state
            self.best_objective = self._score()
        n_refit = self._n_refit_passes()
        if self.sweeps < n_refit:
            backward = (
                self._refit_back is not None and self.sweeps == n_refit - 1
            )
            fn = self._refit_back if backward else self._refit
            traj = fn(
                self.params, self.state.lp, self.state.node_mask,
                self.odometry, self.z, self.z_mask, self.motion_cov,
                self.grad_clip, self.grad_rate,
            )
            self.state = loopy.init_state(
                self.model, self.lcfg, traj, self.n_nodes, self.dtype
            )
            self.sweeps += 1
            obj = self._score()
            if np.isfinite(obj) and obj > self.best_objective:
                self.best_objective = obj
                self.best_state = self.state
            return self
        refit_done = n_refit
        bp_sweeps = max(self.sweeps - refit_done, 0)
        temperature = jnp.asarray(
            self.anneal_t0 / (bp_sweeps + 1), self.dtype
        )
        use_causal = self.sweeps == 0 and self._refit is None
        frozen = (
            self.lcfg.freeze_map_after
            and self.sweeps >= self.lcfg.freeze_map_after
        )
        fn = (
            self._sweep_causal if use_causal
            else self._sweep_frozen if frozen
            else self._sweep
        )
        self.state = fn(
            self.params, self.state, self.odometry, self.z, self.z_mask,
            temperature, self.grad_clip, self.grad_rate, self.motion_cov,
        )
        self.sweeps += 1
        obj = self._score()
        if not np.isfinite(obj):
            # numerical blowup (rare, long-chain f64 conditioning): revert to
            # the best state so later sweeps don't iterate on garbage
            self.state = self.best_state
        elif obj > self.best_objective:
            self.best_objective = obj
            self.best_state = self.state
        if self.lcfg.relinearize:
            # re-anchor the trust region to the current estimate: the anchor
            # then bounds per-sweep steps instead of tethering to the init
            self.state = self._relinearize(self.state)
        return self

    # With the trust-region anchor + per-sweep shear gauge fix (loopy.py)
    # the annealed message passing converges: no-closure records no longer
    # slide (the joint likelihood is ~flat along the shear mode, so the
    # fixed gauge costs nothing), and loop-closure records keep their
    # revisit corrections. 12 sweeps reaches the converged plateau on the
    # chap5 grids; trajectory_objective remains available as a diagnostic.
    DEFAULT_SWEEPS = 12

    def objective(self):
        chain, meas = self._objective(self.state)
        return float(chain) + float(meas)

    def _score(self):
        """Score self.state: updates the map-state selector, returns the
        joint objective (trajectory selector)."""
        chain, meas = self._objective(self.state)
        chain, meas = float(chain), float(meas)
        if np.isfinite(meas) and meas > self.best_map_objective:
            self.best_map_objective = meas
            self.best_map_state = self.state
        return chain + meas

    @property
    def result_state(self):
        return self.best_state if self.best_state is not None else self.state

    @property
    def result_map_state(self):
        # see the selection-study note in __init__: maps follow the joint
        # selector; best_map_state remains a diagnostic only
        return self.result_state

    @property
    def trajectory(self):
        traj = np.asarray(
            loopy.fused_trajectory(self.model, self.result_state)
        )
        return traj[: self.n_nodes]

    def map_model(self):
        gm = loopy.final_map(self.model, self.lcfg, self.params,
                             self.result_map_state, self.z, self.z_mask)
        return self._gm_components(gm)

    def map_history(self):
        """Per-frame map snapshots over the final fused trajectory (the
        maps.out series; see loopy.final_map history semantics). Returns a
        list of component lists, one per node."""
        _, hist = loopy.final_map(
            self.model, self.lcfg, self.params, self.result_map_state,
            self.z, self.z_mask, history=True,
        )
        hist = jax.tree.map(np.asarray, hist)
        return [
            self._gm_components(
                mixture.GM(hist.mean[i], hist.cov[i], hist.logw[i])
            )
            for i in range(self.n_nodes)
        ]

    @staticmethod
    def _gm_components(gm):
        alive = np.asarray(mixture.alive(gm))
        w = np.asarray(mixture.weights(gm))
        return [
            (float(w[i]), np.asarray(gm.mean[i]), np.asarray(gm.cov[i]))
            for i in np.nonzero(alive)[0]
        ]
