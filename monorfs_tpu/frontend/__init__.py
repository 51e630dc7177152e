from . import dataset, fast, kinect, latch, matching  # noqa: F401
