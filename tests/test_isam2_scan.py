"""Fully-jitted iSAM2-equivalent scan (slam/isam2_scan.py): the graph
backend compiled into one lax.scan with known-label association
(reference: isam2.cpp:199-246 per-frame update under
DataAssociationAlgorithm.Perfect, chap4/known.cfg)."""

import numpy as np
import jax.numpy as jnp
import pytest

from monorfs_tpu.config import Config
from monorfs_tpu.io import World, parse_commands
from monorfs_tpu.slam.isam2_scan import build_isam2_scan_runner

ASSETS = __import__("pathlib").Path(__file__).parent.parent / "assets"


@pytest.fixture(scope="module")
def run_3d():
    cfg = Config()
    world = World.from_file(ASSETS / "sim3d.world")
    cmds = np.stack(
        [c[:6] for c in parse_commands((ASSETS / "mov3d.in").read_text())]
    )[:50]
    runner, carry, model = build_isam2_scan_runner(
        cfg, world, frames=len(cmds), gn_iters=1, dtype=jnp.float32
    )
    carry, (true_p, est_p) = runner(carry, jnp.asarray(cmds, jnp.float32))
    return world, carry, np.asarray(true_p), np.asarray(est_p)


def test_scan_tracks_truth(run_3d):
    """Warm-started 1-iteration-per-frame GN stays locked to the truth
    (the bridge's `isam.update + calculateEstimate` steady state)."""
    _, _, true_p, est_p = run_3d
    err = np.sqrt(np.mean(np.sum((true_p[:, :3] - est_p[:, :3]) ** 2, -1)))
    assert not np.isnan(est_p).any()
    assert err < 0.05, f"scan isam2 ATE {err}"


def test_scan_builds_map(run_3d):
    """First sightings back-project into landmark inits and GN refines
    them onto the true map (isam2.cpp:182-189)."""
    world, carry, _, _ = run_3d
    st = carry.gstate
    lms = np.asarray(st.landmarks)
    mask = np.asarray(st.lm_mask)
    true_lms = np.asarray(world.landmarks)
    seen = mask[: len(true_lms)]
    assert seen.sum() >= 10, "should have initialized most visible landmarks"
    d = np.linalg.norm(lms[: len(true_lms)][seen] - true_lms[seen], axis=1)
    assert np.median(d) < 0.1, f"median landmark error {np.median(d)}"


def test_scan_factor_layout(run_3d):
    """Frame t owns factor slots [(t-1)*M, t*M): masked slots carry the
    frame's pose index so the normal-equation scatter never aliases."""
    world, carry, _, _ = run_3d
    st = carry.gstate
    f_pose = np.asarray(st.f_pose)
    f_mask = np.asarray(st.f_mask)
    m = len(world.landmarks) + 8
    for t in (1, 25, 50):
        blk = slice((t - 1) * m, t * m)
        assert (f_pose[blk][f_mask[blk]] == t).all()
    assert f_mask.sum() > 50 * 5, "measurement factors should accumulate"
