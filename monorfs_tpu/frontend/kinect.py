"""RGB-D sensor vehicle: keypoint pipeline over recorded depth/gray streams.

TPU-native re-design of the reference Kinect frontend
(reference: mono-rfs-lib/SLAM/Vehicles/KinectVehicle.cs:52-941): per frame,
depth/color are delta-subsampled by box averaging (:396-484), keypoints are
extracted (FAST + binary descriptors, via libkpextractor in the reference,
frontend/fast.py + latch.py here), temporally filtered by descriptor
matching + RANSAC homography (:503-576), and keypoints with valid depth
become pixel-range measurements (px - cx, py - cy, range) with
range = depth * |(px/f, py/f, 1)| (GetRange, :730-742).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.prm3d import Params as CameraParams
from . import fast, latch, matching


class FrameFeatures(NamedTuple):
    xy: jax.Array  # [K, 2] pixel coordinates in the subsampled image
    desc: jax.Array  # [K, 32]
    valid: jax.Array  # [K]


def make_extractor(threshold=45.0, max_keypoints=256, border=24):
    """Jitted single-frame extraction: gray [H, W] -> FrameFeatures."""

    @jax.jit
    def extract(gray):
        xy, score, valid = fast.detect(
            gray, threshold=threshold, max_keypoints=max_keypoints,
            border=border,
        )
        desc = latch.describe(gray, xy, valid)
        return FrameFeatures(xy=xy, desc=desc, valid=valid)

    return extract


def subsample(img, delta):
    """Delta x delta box average (KinectVehicle.cs:396-484)."""
    h, w = img.shape
    h2, w2 = h // delta, w // delta
    return (
        img[: h2 * delta, : w2 * delta]
        .reshape(h2, delta, w2, delta)
        .mean(axis=(1, 3))
    )


class KinectSource:
    """Measurement source over a converted RGB-D dataset; drop-in vehicle
    frontend for the simulation driver (replay-style: the true pose is
    unknown, odometry is zero, measurements come from vision)."""

    def __init__(self, dataset, camera: CameraParams = None, delta=4,
                 max_keypoints=256, keypoint_filter=True, threshold=45.0,
                 seed=0):
        self.dataset = dataset
        self.delta = delta
        self.camera = camera or CameraParams()
        self.keypoint_filter = keypoint_filter
        self.extract = make_extractor(
            threshold=threshold, max_keypoints=max_keypoints
        )
        self.prev: FrameFeatures = None
        self.key = jax.random.PRNGKey(seed)
        # scaled intrinsics for the subsampled image
        self.focal = self.camera.focal / delta

    def measure(self, i):
        """Measurements for frame i: [M, 3] (px, py, range) +
        subsampled depth for occlusion modeling."""
        _, depth, gray = self.dataset.frame(i)
        gray_s = subsample(gray.astype(np.float32), self.delta)
        depth_s = subsample(depth, self.delta)

        feats = self.extract(jnp.asarray(gray_s))
        valid = feats.valid
        if self.keypoint_filter and self.prev is not None:
            self.key, sub = jax.random.split(self.key)
            valid = matching.temporal_filter(
                feats.xy, feats.desc, feats.valid,
                self.prev.xy, self.prev.desc, self.prev.valid, sub,
            )
        self.prev = FrameFeatures(feats.xy, feats.desc, feats.valid)

        xy = np.asarray(feats.xy)
        val = np.asarray(valid)
        h, w = gray_s.shape
        out = []
        for k in np.nonzero(val)[0]:
            x, y = int(xy[k, 0]), int(xy[k, 1])
            z = float(depth_s[y, x])
            if z <= 0:
                continue  # keypoints need valid depth (KinectVehicle.cs:555-575)
            px = x - w / 2.0
            py = y - h / 2.0
            rng = z * float(
                np.sqrt(px * px + py * py + self.focal**2) / self.focal
            )
            out.append((px, py, rng))
        return np.asarray(out, np.float64).reshape(-1, 3), depth_s
