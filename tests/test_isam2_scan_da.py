"""Fully-jitted Mahalanobis-DA graph SLAM scan (slam/isam2_scan_da.py)."""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monorfs_tpu.config import Config
from monorfs_tpu.io import World, parse_commands
from monorfs_tpu.slam.isam2_scan_da import build_mahalanobis_scan

ROOT = pathlib.Path(__file__).parent.parent


def _run(frames=60, dtype=jnp.float64, **kw):
    world = World.from_file(str(ROOT / "assets" / "sim3d.world"))
    cmds = parse_commands((ROOT / "assets" / "mov3d.in").read_text())[:frames]
    cfg = Config.from_file(
        str(ROOT / "experiments" / "configs" / "chap4-default.cfg")
    )
    runner, init, model = build_mahalanobis_scan(
        cfg, world, len(cmds), dtype=dtype, **kw
    )
    commands = jnp.asarray(np.array([c[:6] for c in cmds]), dtype)
    carry, (true_pose, est, nlm) = runner(init, commands)
    return world, carry, np.asarray(true_pose), np.asarray(est), np.asarray(nlm)


@pytest.mark.slow
def test_scan_da_tracks_and_maps():
    world, carry, tp, ep, nlm = _run(frames=60)
    err = np.linalg.norm(tp[:, :3] - ep[:, :3], axis=1)
    ate = float(np.sqrt(np.mean(err**2)))
    assert ate < 0.08, ate
    # the map grows toward the true landmark count without duplicates
    # exploding past it (60 frames see most but not all of the world)
    assert 15 <= nlm[-1] <= len(world.landmarks) + 6, nlm[-1]
    assert (np.diff(nlm.astype(int)) >= 0).all()  # labels only accumulate
    # mapped landmarks lie near true ones
    lm_mask = np.asarray(carry.gstate.lm_mask)
    lms = np.asarray(carry.gstate.landmarks)[lm_mask]
    d = np.linalg.norm(
        lms[:, None, :] - np.asarray(world.landmarks)[None], axis=-1
    ).min(axis=1)
    assert np.median(d) < 0.05, np.median(d)


def test_clutter_capacity_assert():
    world = World.from_file(str(ROOT / "assets" / "sim3d.world"))
    cfg = Config.from_file(
        str(ROOT / "experiments" / "configs" / "chap4-cluttery.cfg")
    )
    # cluttery: lambda ~ 1.75 -> floor(10 lambda) = 17 > 8 default slots
    with pytest.raises(ValueError, match="max_clutter"):
        build_mahalanobis_scan(cfg, world, 10, max_clutter=8)
    # and the known-DA scan shares the guard
    from monorfs_tpu.slam.isam2_scan import build_isam2_scan_runner

    with pytest.raises(ValueError, match="max_clutter"):
        build_isam2_scan_runner(cfg, world, 10, max_clutter=8)
