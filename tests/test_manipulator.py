"""Keyboard-driven simulation loop (manipulator.py): headless tests of the
key->odometry mapping and the frame stepper (the reference Manipulator's
input loop, Simulation.cs:498-575 + Pose3D.AddKeyboardInput)."""

import numpy as np

from monorfs_tpu.config import Config
from monorfs_tpu.io.world import World
from monorfs_tpu.manipulator import ManipulatorLoop, keyboard_command
from monorfs_tpu.sim.simulation import Simulation


def test_keyboard_command_6dof():
    # I = forward: dlocz + 0.02 (Pose3D.cs:432-440 scaling)
    np.testing.assert_allclose(
        keyboard_command({"i"}, 6), [0, 0, 0.02, 0, 0, 0]
    )
    # J = yaw left: keyboard yaw -1, scaled by -0.1 -> +0.1
    np.testing.assert_allclose(
        keyboard_command({"j"}, 6), [0, 0, 0, 0, 0.1, 0]
    )
    # W = pitch up: +1 scaled by -0.1
    np.testing.assert_allclose(
        keyboard_command({"w"}, 6), [0, 0, 0, -0.1, 0, 0]
    )
    # shift doubles
    np.testing.assert_allclose(
        keyboard_command({"i", "shift"}, 6, multiplier=2.0),
        [0, 0, 0.04, 0, 0, 0],
    )


def test_keyboard_command_linear2d():
    # LinearPose2D.cs:291-294: x <- 0.01 * yaw keys, y <- 0.01 * z keys
    np.testing.assert_allclose(keyboard_command({"i"}, 2), [0, 0.01])
    np.testing.assert_allclose(keyboard_command({"j"}, 2), [0.01, 0])


def _sim():
    world = World(
        pose=np.array([0.0, 0.0]),
        landmarks=np.array(
            [[0.5, 0.5, 0.0], [1.0, -0.5, 0.0], [-0.8, 0.3, 0.0]]
        ),
        measurer_params=None,
    )
    cfg = Config()
    cfg.set_linear2d_defaults()
    return Simulation(cfg, world, [], algorithm="phd", particles=4)


def test_loop_drives_vehicle():
    loop = ManipulatorLoop(_sim())
    loop.on_press("i")
    for _ in range(10):
        assert loop.tick()
    loop.on_release("i")
    assert loop.frame == 10
    # the true pose moved in +y (Linear2D forward)
    pose = np.asarray(loop.sim.vstate.pose)
    assert pose[1] > 0.05, pose
    # releasing all keys with no script ends the run
    assert not loop.tick()
    assert loop.finished


def test_pause_and_exit():
    loop = ManipulatorLoop(_sim())
    loop.on_press("escape")
    assert loop.paused and loop.tick()  # paused tick advances nothing
    assert loop.frame == 0
    loop.on_press("escape")
    assert not loop.paused
    loop.on_press("delete")
    assert loop.finished
