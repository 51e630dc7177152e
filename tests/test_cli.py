"""CLI surface tests: end-to-end runs through the real entry points."""

import pathlib

import numpy as np
import pytest

from monorfs_tpu import cli, postanalysis
from monorfs_tpu.io import Recording

ASSETS = pathlib.Path(__file__).parent.parent / "assets"


def test_cli_1d_mapping(tmp_path, capsys):
    rec = tmp_path / "m1d.zip"
    cli.main([
        "-f", str(ASSETS / "linear1d.world"),
        "-c", str(ASSETS / "mov1d.in"),
        "-a", "phd", "-p", "2", "-y", "-r", str(rec),
        "--dtype", "float64", "--frames", "60",
    ])
    out = capsys.readouterr().out
    assert "finished running" in out
    r = Recording.load(rec)
    assert len(r.trajectory) == 60
    # mapping mode: estimate == groundtruth
    est = np.array([t[-1][1] for _, t in r.estimate])
    tru = np.array([s for _, s in r.trajectory])
    np.testing.assert_allclose(est[:, 0], tru[:, 0], atol=1e-6)


def test_cli_record_replay_roundtrip(tmp_path):
    rec = tmp_path / "r2d.zip"
    cli.main([
        "-f", str(ASSETS / "linear2d.world"),
        "-c", str(ASSETS / "mov2d.in"),
        "-a", "phd", "-p", "2", "-r", str(rec), "--dtype", "float64",
        "--frames", "40",
    ])
    out2 = tmp_path / "odo.zip"
    cli.main([
        "-f", str(rec), "-i", "record", "-a", "odometry", "-r", str(out2),
        "--dtype", "float64",
    ])
    a = Recording.load(rec)
    b = Recording.load(out2)
    # identical groundtruth and measurements (replayed, not re-simulated)
    np.testing.assert_allclose(
        a.trajectory[5][1], b.trajectory[5][1], rtol=1e-4
    )
    assert len(a.measurements[5][1]) == len(b.measurements[5][1])


def test_postanalysis_cli(tmp_path, capsys):
    rec = tmp_path / "p.zip"
    cli.main([
        "-f", str(ASSETS / "linear2d.world"),
        "-c", str(ASSETS / "mov2d.in"),
        "-a", "phd", "-p", "2", "-r", str(rec), "--dtype", "float64",
        "--frames", "40",
    ])
    capsys.readouterr()
    postanalysis.main(["-f", str(rec)])
    out = capsys.readouterr().out
    assert "ATE loc RMSE" in out
    assert (tmp_path / "p.zip.loc.data").exists()
    assert (tmp_path / "p.zip.map.data").exists()


def test_cli_model_inference():
    """Without -g, the model family is inferred from the world pose dim."""
    parser = cli.build_parser()
    args = parser.parse_args(["-f", "x"])
    assert args.algorithm == "phd"
