"""Generate simulation worlds + command files in the reference formats.

The reference repo does not ship its .world/.in assets (they lived in an
external asset dir, see plots/scripts/*.sh `assetdir`); these generated
worlds match the format (Vehicle.ToString, Vehicle.cs:503-522) and the
experiment scale: a 3D pixel-range room, a 2D linear world with a loop, and
a 1D calibration world.
"""

import pathlib

import numpy as np

HERE = pathlib.Path(__file__).parent


def fmt(v):
    return f"{float(v):.6g}"


def write_world(name, pose, params, landmarks):
    out = "pose\n\t" + " ".join(fmt(v) for v in pose) + "\n"
    out += "params\n\t" + " ".join(fmt(v) for v in params) + "\n"
    out += "landmarks\n" + "".join(
        "\t" + " ".join(fmt(v) for v in lm) + "\n" for lm in landmarks
    )
    (HERE / name).write_text(out)


def write_commands(name, commands):
    (HERE / name).write_text(
        "\n".join(" ".join(fmt(v) for v in c) for c in commands) + "\n"
    )


def gen_linear1d():
    rng = np.random.default_rng(11)
    landmarks = [[x, 0.0, 0.0] for x in np.sort(rng.uniform(-8, 8, 12))]
    write_world("linear1d.world", [0.0], [2.0], landmarks)
    # slow sweep right then back
    T = 200
    cmds = [[0.08] for _ in range(T // 2)] + [[-0.08] for _ in range(T // 2)]
    write_commands("mov1d.in", cmds)


def gen_linear2d():
    rng = np.random.default_rng(7)
    landmarks = [
        [x, y, 0.0]
        for x, y in rng.uniform(-1.5, 5.0, size=(25, 2))
    ]
    write_world("linear2d.world", [0.0, 0.0], [2.0], landmarks)
    # square loop with a revisit (loop closure for chap5-style runs)
    cmds = []
    steps = 60
    v = 0.06
    for leg in [(v, 0), (0, v), (-v, 0), (0, -v)]:
        cmds += [list(leg) for _ in range(steps)]
    cmds += [[v, 0] for _ in range(steps // 2)]
    write_commands("mov2d.in", cmds)


def gen_linear2dloop():
    """Loop-closure world for the chap5 K3/K4 smoother experiments
    (reference: plots/scripts/chap5/K3-loop.sh): a long rectangular circuit,
    landmarks scattered along the route, two laps so the smoother gets a
    strong revisit constraint."""
    rng = np.random.default_rng(13)
    w, h = 8.0, 5.0
    landmarks = []
    for _ in range(36):
        side = rng.integers(4)
        u = rng.uniform(0, 1)
        jx, jy = rng.uniform(-0.8, 0.8, 2)
        x, y = [
            (u * w, 0.0), (w, u * h), (u * w, h), (0.0, u * h)
        ][side]
        landmarks.append([x + jx, y + jy, 0.0])
    write_world("linear2dloop.world", [0.0, 0.0], [2.0], landmarks)

    cmds = []
    sx, sy = 50, 32
    vx, vy = w / sx, h / sy
    for _ in range(2):  # two laps
        cmds += [[vx, 0.0] for _ in range(sx)]
        cmds += [[0.0, vy] for _ in range(sy)]
        cmds += [[-vx, 0.0] for _ in range(sx)]
        cmds += [[0.0, -vy] for _ in range(sy)]
    write_commands("mov2dloop.in", cmds)


def gen_sim3d():
    rng = np.random.default_rng(3)
    # camera looks along +z; keep landmarks in a shell 0.3-1.8m ahead
    landmarks = []
    for _ in range(40):
        z = rng.uniform(0.5, 1.8)
        x = rng.uniform(-0.45, 0.45) * z
        y = rng.uniform(-0.35, 0.35) * z
        landmarks.append([x, y, z])
    pose = [0, 0, 0, 1, 0, 0, 0]
    params = [575.8156, 0.1, 2.0, -320, -240, 640, 480]
    write_world("sim3d.world", pose, params, landmarks)

    # gentle sway: strafe sideways, yaw back and forth, never losing the wall
    cmds = []
    T = 300
    for t in range(T):
        phase = 2 * np.pi * t / T
        dx = 0.004 * np.cos(phase)
        dy = 0.002 * np.sin(2 * phase)
        dz = 0.001 * np.sin(phase)
        dyaw = 0.002 * np.cos(phase)
        cmds.append([dx, dy, dz, 0.0, dyaw, 0.0])
    write_commands("mov3d.in", cmds)


if __name__ == "__main__":
    gen_linear1d()
    gen_linear2d()
    gen_linear2dloop()
    gen_sim3d()
    print("assets written to", HERE)
