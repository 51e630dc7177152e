"""Round-2 history fidelity tests: sightings persistence (known-DA through
record replay), exact clone-on-resample estimate genealogy, and the
postanalysis filter/smooth/timed history modes.

Reference anchors: ISAM2Navigator.cs:256-441 (Perfect DA),
Vehicle.cs:117-127 + PHDNavigator.cs:724-760 (WayPoints cloning on
resample), postanalysis/Plot.cs:325-369 (history modes)."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end runs; deselect with -m "not slow"

import numpy as np

from monorfs_tpu.io import Recording
from monorfs_tpu.postanalysis import analyze, estimate_series, timed_series
from monorfs_tpu.sim import Simulation
from monorfs_tpu.slam import phd

from test_simulation import linear2d_config, run_sim, ASSETS
from monorfs_tpu.io import World, parse_commands


def _small_cfg(particles):
    return phd.PHDConfig(num_particles=particles, max_components=32,
                         max_measurements=33, gate_top=8, estimate_cap=16,
                         beam_width=32)


def test_sightings_roundtrip_and_perfect_replay(tmp_path):
    """True association labels persist through the recording zip and enable
    DAAlgorithm Perfect over `-i record` replays (chap4 S6/S8)."""
    sim = run_sim("phd", 4, False, frames=25, phd_cfg=_small_cfg(4))
    recfile = tmp_path / "rec.zip"
    sim.save(recfile)

    rec = Recording.load(recfile)
    assert len(rec.sightings) == len(rec.measurements)
    for (_, zs), (_, ls) in zip(rec.measurements, rec.sightings):
        assert len(zs) == len(ls)

    # replay with perfect data association: must not raise and must
    # produce landmarks for every repeated true label
    cfg = linear2d_config()
    cfg.da_algorithm = "Perfect"
    world = World.from_file(ASSETS / "linear2d.world")
    replay = Simulation(cfg, world, [], algorithm="isam2", particles=1,
                        replay=rec, dtype=np.float64)
    replay.run()
    est_lms, _ = replay.isam2.map_estimate
    assert len(est_lms) >= 1
    # every landmark the isam2 run created came from a persisted true label
    all_labels = {l for _, ls in rec.sightings for l in ls if l >= 0}
    assert replay.isam2.next_label <= len(all_labels)

    # the re-recorded replay keeps the sightings (sandwich chaining)
    out2 = tmp_path / "rec2.zip"
    replay.save(out2)
    rec2 = Recording.load(out2)
    assert [ls for _, ls in rec2.sightings] == [
        ls for _, ls in rec.sightings
    ]


def test_estimate_genealogy_exact(tmp_path):
    """estimate.out holds the clone-on-resample genealogy: after a resample,
    earlier poses of the best particle's trajectory are its ANCESTOR's poses
    (not its own slot's history)."""
    # tiny particle count + aggressive resampling to force ancestry changes
    cfg = linear2d_config()
    cfg.min_effective_particle = 0.95
    world = World.from_file(ASSETS / "linear2d.world")
    commands = parse_commands((ASSETS / "mov2d.in").read_text())[:30]
    sim = Simulation(cfg, world, commands, algorithm="phd", particles=8,
                     seed=2, phd_config=_small_cfg(8), dtype=np.float64)
    sim.run()

    parents = np.array([f["parents"] for f in sim.frames])
    resampled = [i for i in range(len(parents))
                 if not np.all(parents[i] == np.arange(8))]
    assert resampled, "no resample fired; raise min_effective_particle"

    hist = sim.estimate_history()
    # per-frame trajectory lengths are t+1
    for i, (t, traj) in enumerate(hist):
        assert len(traj) == i + 1
    # walk the genealogy by hand for the last frame and compare
    i = len(sim.frames) - 1
    idx = sim.frames[i]["best"]
    for s in range(i, -1, -1):
        expect = sim.frames[s]["poses"][idx]
        np.testing.assert_array_equal(hist[i][1][s][1], expect)
        idx = sim.frames[s]["parents"][idx]


def test_postanalysis_history_modes(tmp_path):
    """-H filter|smooth|timed produce distinct, well-formed ATE series."""
    cfg = linear2d_config()
    cfg.min_effective_particle = 0.95
    world = World.from_file(ASSETS / "linear2d.world")
    commands = parse_commands((ASSETS / "mov2d.in").read_text())[:30]
    sim = Simulation(cfg, world, commands, algorithm="phd", particles=8,
                     seed=2, phd_config=_small_cfg(8), dtype=np.float64)
    sim.run()
    recfile = tmp_path / "rec.zip"
    sim.save(recfile)
    rec = Recording.load(recfile)

    filt = estimate_series(rec, "filter")
    smooth = estimate_series(rec, "smooth")
    assert len(filt) == len(smooth) == len(rec.estimate)
    # the smooth series rewrites history after resamples: it must differ
    # from the filter series somewhere before the final frame
    diffs = [
        not np.allclose(a[1], b[1]) for a, b in zip(filt[:-1], smooth[:-1])
    ]
    assert any(diffs)
    # final pose agrees by construction
    np.testing.assert_allclose(filt[-1][1], smooth[-1][1])

    res_f = analyze(rec, mode="filter")
    res_s = analyze(rec, mode="smooth")
    res_t = analyze(rec, mode="timed")
    for r in (res_f, res_s, res_t):
        assert len(r["loc"]) > 0
        assert all(np.isfinite(v) for _, v in r["loc"])
    # timed aggregates full-trajectory means: different series from filter
    vals_f = [v for _, v in res_f["loc"]]
    vals_t = [v for _, v in res_t["loc"]]
    assert not np.allclose(vals_f, vals_t)


def test_loopy_recording_map_history(tmp_path):
    """Smoother recordings carry a real per-frame map series (round-2 bug:
    every frame but the last had an empty map, making the OSPA series
    meaningless except at its endpoint)."""
    cfg = linear2d_config()
    world = World.from_file(ASSETS / "linear2d.world")
    commands = parse_commands((ASSETS / "mov2d.in").read_text())[:30]
    base = Simulation(cfg, world, commands, algorithm="odometry",
                      seed=3, dtype=np.float64)
    base.run()
    odofile = tmp_path / "odo.zip"
    base.save(odofile)

    sim = Simulation(cfg, world, [], algorithm="loopy", particles=1,
                     seed=3, dtype=np.float64,
                     replay=Recording.load(odofile))
    sim.loopy_sweeps = 2
    sim.run()
    recfile = tmp_path / "loopy.zip"
    sim.save(recfile)
    rec = Recording.load(recfile)

    sizes = [len(m) for _, m in rec.maps]
    assert len(sizes) >= 25
    # growing-map filter over the fused trajectory: nonempty well before
    # the endpoint and nondecreasing in the large
    assert sizes[len(sizes) // 2] > 0
    assert sizes[-1] > 0
