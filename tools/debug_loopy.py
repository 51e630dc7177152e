#!/usr/bin/env python
"""Diagnose smoother divergence on a recorded chap5 run: per-sweep ATE +
trajectory objective against the record's groundtruth."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from monorfs_tpu.config import Config
from monorfs_tpu.io.recording import Recording
from monorfs_tpu import models
from monorfs_tpu.slam import loopy
from monorfs_tpu.slam.loopynav import LoopyPHDNavigator


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("recfile")
    ap.add_argument("sweeps", type=int, nargs="?", default=12)
    ap.add_argument("--anchor", type=float, default=None)
    ap.add_argument("--no-gauge", action="store_true")
    ap.add_argument("--config", default=None,
                    help="cfg file overriding the recorded config")
    args = ap.parse_args()
    recfile = args.recfile
    sweeps = args.sweeps
    rec = Recording.load(recfile)
    cfg = Config()
    cfg_text = rec.config_text
    if args.config:
        cfg_text = open(args.config).read()
    if cfg_text:
        cfg.apply_descriptor(cfg_text.splitlines())
        cfg.set_model_defaults(cfg.model)
        cfg.apply_descriptor(cfg_text.splitlines())
    model = models.get(cfg.model)

    truth = np.array([p for _, p in rec.trajectory])
    # final estimate trajectory = last history snapshot
    est = np.array([v for _, v in rec.estimate[-1][1]])
    odometry = [o for _, o in rec.odometry]
    meas = [zs for _, zs in rec.measurements]
    t = len(truth)
    print(f"frames={t} meas/frame={np.mean([len(m) for m in meas]):.1f}")

    def ate(traj):
        d = traj[: len(truth), : truth.shape[1]] - truth[: len(traj)]
        return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))

    print(f"init (record estimate) ATE: {ate(est):.4f}")
    lcfg = None
    if args.anchor is not None or args.no_gauge:
        kw = {}
        if args.anchor is not None:
            kw["anchor_sigma"] = args.anchor
        if args.no_gauge:
            kw["gauge_fix"] = False
        lcfg = loopy.LoopyConfig(max_nodes=t, max_meas=16, **kw)
    nav = LoopyPHDNavigator(model, cfg, est, odometry, meas, max_meas=16,
                            loopy_cfg=lcfg)
    print(f"objective(init): {nav.objective():.2f}")
    import jax.numpy as jnp

    for s in range(sweeps):
        nav.sweep()
        cur = np.asarray(loopy.fused_trajectory(nav.model, nav.state))
        best = nav.trajectory
        print(f"sweep {s+1}: ATE(cur)={ate(cur):.4f} "
              f"ATE(best)={ate(best):.4f} obj={nav.objective():.2f} "
              f"bestobj={nav.best_objective:.2f}", flush=True)


if __name__ == "__main__":
    main()
