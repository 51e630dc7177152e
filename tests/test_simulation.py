"""End-to-end simulation tests (mirrors SimulationTest.cs's statistical
style): mapping accuracy, SLAM vs odometry, recording roundtrip."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end runs; deselect with -m "not slow"

import pathlib

import numpy as np
import jax.numpy as jnp

from monorfs_tpu.config import Config
from monorfs_tpu.io import Recording, World, parse_commands
from monorfs_tpu.metrics import ate_location, ospa, rmse
from monorfs_tpu.sim import Simulation
from monorfs_tpu.slam import phd

ASSETS = pathlib.Path(__file__).parent.parent / "assets"


def linear2d_config():
    cfg = Config()
    cfg.set_linear2d_defaults()
    cfg.detection_probability = 0.9
    cfg.navigator_pd = 0.9
    cfg.perfect_still = True
    # modest motion noise so SLAM has something to correct
    cfg.motion_covariance = np.diag([0.05, 0.05])
    return cfg


def run_sim(algorithm, particles, onlymapping, frames=80, seed=1,
            phd_cfg=None):
    cfg = linear2d_config()
    world = World.from_file(ASSETS / "linear2d.world")
    commands = parse_commands((ASSETS / "mov2d.in").read_text())[:frames]
    sim = Simulation(
        cfg,
        world,
        commands,
        algorithm=algorithm,
        particles=particles,
        onlymapping=onlymapping,
        seed=seed,
        phd_config=phd_cfg,
        dtype=np.float64,
    )
    sim.run()
    return sim


def nav_trajectory(sim):
    return [(t, f["poses"][f["best"]]) for t, f in
            zip([w[0] for w in sim.waypoints], sim.frames)]


def test_mapping_ospa_small():
    """Mapping-only (known poses): the map converges to the visited
    landmarks with small OSPA error."""
    cfg2 = phd.PHDConfig(num_particles=1, max_components=64,
                         max_measurements=33, gate_top=8, estimate_cap=32,
                         beam_width=64)
    sim = run_sim("phd", 1, True, frames=270, phd_cfg=cfg2)
    # MAP estimate: top floor(sum w) components (Map.BestMapEstimate)
    comps = sim.way_maps[-1][1]
    ws = np.array([w for w, _, _ in comps])
    n = int(np.floor(ws.sum()))
    order = np.argsort(-ws)[:n]
    est = np.array([comps[i][1] for i in order]).reshape(-1, 3)

    # visited groundtruth: landmarks seen at least once
    seen = set()
    for _, comps in sim.way_vismaps:
        for wi, m, _ in comps:
            if wi > 0:
                seen.add(tuple(np.round(m, 6)))
    truth = np.array(sorted(seen)).reshape(-1, 3)
    assert len(truth) >= 5  # the run must have actually explored
    total, spatial, card = ospa(est, truth, c=1.0, p=1.0)
    assert total < 0.25, (total, spatial, card, len(est), len(truth))


def test_slam_beats_odometry():
    """Full SLAM localizes better than dead reckoning (chap3 S1 style)."""
    cfg2 = phd.PHDConfig(num_particles=50, max_components=64,
                         max_measurements=33, gate_top=8, estimate_cap=32,
                         beam_width=64)
    slam = run_sim("phd", 50, False, frames=100, seed=3, phd_cfg=cfg2)
    odo = run_sim("odometry", 1, False, frames=100, seed=3)

    truth = slam.waypoints
    slam_ate = rmse(ate_location(nav_trajectory(slam), truth))
    odo_ate = rmse(ate_location(nav_trajectory(odo), odo.waypoints))
    # the odometry run accumulates noise drift; SLAM should stay well below
    assert slam_ate < odo_ate, (slam_ate, odo_ate)
    assert slam_ate < 0.6, slam_ate


def test_recording_roundtrip(tmp_path):
    cfg2 = phd.PHDConfig(num_particles=4, max_components=32,
                         max_measurements=33, gate_top=8, estimate_cap=16,
                         beam_width=32)
    sim = run_sim("phd", 4, False, frames=12, phd_cfg=cfg2)
    f = tmp_path / "rec.zip"
    sim.save(f)
    rec = Recording.load(f)

    assert len(rec.trajectory) == 12
    assert len(rec.odometry) == 12
    assert len(rec.measurements) == 12
    assert len(rec.maps) == 12
    np.testing.assert_allclose(
        rec.trajectory[-1][1], sim.waypoints[-1][1], rtol=1e-4, atol=1e-5
    )
    # config text parses back
    cfg = Config()
    cfg.apply_descriptor(rec.config_text.splitlines())
    assert cfg.model == "Linear2D"
    np.testing.assert_allclose(
        cfg.motion_covariance, np.diag([0.05, 0.05]), rtol=1e-6
    )
    # world roundtrip
    np.testing.assert_allclose(rec.world.pose, [0, 0], atol=1e-9)
    assert rec.world.landmarks.shape == (25, 3)
