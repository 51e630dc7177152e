from . import linear, pose3d, quaternion  # noqa: F401
