#!/usr/bin/env python
"""Collect experiments/out/*.stats.json into one markdown summary table
(the committed evidence for the reference's chap3/4/5 grids)."""

import json
import pathlib
import sys

HERE = pathlib.Path(__file__).parent
NOTES_FILE = HERE / "NOTES.md"


def main(outdir=None):
    outdir = pathlib.Path(outdir or HERE / "out")
    rows = []
    for f in sorted(outdir.glob("*.stats.json")):
        stats = json.load(open(f))
        exp = f.name.replace(".stats.json", "")
        for alg, s in stats.items():
            if not isinstance(s, dict):
                continue
            rows.append((
                exp, alg,
                s.get("ate_loc_rmse"), s.get("ate_rot_rmse"),
                s.get("final_ospa", s.get("ospa_vs_refmap")), s.get("elapsed_s"),
                s.get("frames"), s.get("mean_measurements"),
                s.get("fps"), s.get("step_ms"), s.get("ate_rmse_loc"),
            ))

    def fmt(v, nd=4):
        if v is None:
            return "—"
        if isinstance(v, str):
            return v
        return f"{float(v):.{nd}g}"

    lines = [
        "# Experiment grid results",
        "",
        "Reference grids: mono-rfs/plots/scripts/chap{3,4,5}/*.sh "
        "(see experiments/run_experiments.py).",
        "",
        "| experiment | algorithm | ATE loc RMSE | ATE rot RMSE | "
        "final OSPA | elapsed s |",
        "|---|---|---|---|---|---|",
    ]
    for exp, alg, loc, rot, ospa, el, frames, mm, fps, step_ms, s_ate in rows:
        if fps is not None:
            lines.append(
                f"| {exp} | {alg} | fps={fmt(fps, 4)} "
                f"step={fmt(step_ms, 4)} ms | {fmt(s_ate)} | — | — |"
            )
            continue
        if loc is None and frames is not None:
            lines.append(
                f"| {exp} | {alg} | frames={frames} "
                f"mean_meas={fmt(mm, 3)} | — | — | — |"
            )
        else:
            lines.append(
                f"| {exp} | {alg} | {fmt(loc)} | {fmt(rot)} | {fmt(ospa)} "
                f"| {fmt(el, 4)} |"
            )
    tpu_dir = outdir.parent / "out-tpu"
    if tpu_dir.is_dir() and list(tpu_dir.glob("*.stats.json")):
        lines += [
            "",
            "## TPU float32 grid (experiments/out-tpu, run_tpu_grid.py)",
            "",
            "Reference-scale particle counts through the jitted float32 hot "
            "path on the real chip (chap3/S1-phd-odometry.sh:13 uses 800; "
            "chap3/S4-particles.sh:14 sweeps 20/100/800/2000).",
            "",
            "| experiment | algorithm/particles | ATE loc RMSE | "
            "ATE rot RMSE | final OSPA | elapsed s |",
            "|---|---|---|---|---|---|",
        ]
        for f in sorted(tpu_dir.glob("*.stats.json")):
            stats = json.load(open(f))
            exp = f.name.replace(".stats.json", "")
            for alg, s in stats.items():
                if not isinstance(s, dict):
                    continue
                if s.get("fps") is not None:
                    # throughput sweep rows (compile-free scan fps)
                    lines.append(
                        f"| {exp} | {alg} | fps={fmt(s.get('fps'), 4)} "
                        f"step={fmt(s.get('step_ms'), 4)} ms "
                        f"| {fmt(s.get('ate_rmse_loc'))} | — | — |"
                    )
                    continue
                lines.append(
                    f"| {exp} | {alg} | {fmt(s.get('ate_loc_rmse'))} "
                    f"| {fmt(s.get('ate_rot_rmse'))} "
                    f"| {fmt(s.get('final_ospa', s.get('ospa_vs_refmap')))} "
                    f"| {fmt(s.get('elapsed_s'), 4)} |"
                )

    notes = NOTES_FILE
    if notes.is_file():
        lines += ["", notes.read_text().rstrip()]

    out = outdir / "SUMMARY.md"
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwritten to {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
