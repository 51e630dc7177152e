"""Depth-occlusion-aware pixel-range camera (KinectMeasurer equivalent).

TPU-native re-design of the reference Kinect measurer
(reference: mono-rfs-lib/BaseStructures/Measurers/KinectMeasurer.cs:43-176):
identical pixel-range geometry to PRM3D, but visibility additionally
requires the landmark to be in front of the live depth map
(range <= depth[x, y], with a fuzzy ramp against the depth, :123-175).

The depth map is a dynamic per-frame argument (PHDParams.depth_map) rather
than the reference's closure over the sensor (GetDepth, :63): the jitted
filter step re-binds it every frame with no recompilation.
"""

import dataclasses

import jax.numpy as jnp

from . import prm3d
from .base import Model


@dataclasses.dataclass(frozen=True)
class Params(prm3d.Params):
    """PRM3D intrinsics + real-sensor resolution and keypoint border
    (KinectMeasurer.cs:44-63). The film area is shrunk by `border` on
    construction sites that model the keypoint-extractor border
    (KinectTrackVehicle.cs:61-76)."""

    res_x: float = 640.0
    res_y: float = 480.0
    border: int = 24

    def to_linear(self):
        return super().to_linear() + [self.res_x, self.res_y, self.border]

    @staticmethod
    def from_linear(vals):
        base = prm3d.Params.from_linear(vals[:7])
        if len(vals) >= 10:
            return Params(
                **dataclasses.asdict(base),
                res_x=float(vals[7]),
                res_y=float(vals[8]),
                border=int(vals[9]),
            )
        return Params(**dataclasses.asdict(base))


def _depth_at(p: Params, z, depth):
    """Sample the depth map at the landmark's pixel (KinectMeasurer.cs:126,
    reference indexes its [x][y] array; ours is row-major [y, x])."""
    h, w = depth.shape
    x = jnp.clip((z[..., 0] + p.res_x / 2).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((z[..., 1] + p.res_y / 2).astype(jnp.int32), 0, h - 1)
    return depth[y, x]


def visible(p: Params, z, depth):
    """In the frustum AND in front of the depth map
    (KinectMeasurer.cs:123-145)."""
    d = _depth_at(p, z, depth)
    return prm3d.visible(p, z) & (z[..., 2] <= d)


def fuzzy_visible(p: Params, z, ramp, depth):
    """Fuzzy base visibility further ramped against the depth map
    (KinectMeasurer.cs:151-175)."""
    base = prm3d.fuzzy_visible(p, z, ramp)
    d = _depth_at(p, z, depth)
    rng = z[..., 2]
    v = jnp.minimum(base, (rng - p.range_min) / ramp[2])
    v = jnp.minimum(v, (d - rng) / ramp[2])
    v = jnp.where(jnp.isnan(d), 0.0, v)
    return jnp.where(base <= 0, 0.0, jnp.clip(v, 0.0, 1.0))


def _depth_at_soa(p: Params, z, depth):
    h, w = depth.shape
    x = jnp.clip((z[0] + p.res_x / 2).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((z[1] + p.res_y / 2).astype(jnp.int32), 0, h - 1)
    return depth[y, x]


def fuzzy_visible_soa(p: Params, z, ramp, depth):
    """SoA twin of fuzzy_visible (z is a 3-list of [..., K] arrays)."""
    base = prm3d.fuzzy_visible_soa(p, z, ramp)
    d = _depth_at_soa(p, z, depth)
    rng = z[2]
    v = jnp.minimum(base, (rng - p.range_min) / ramp[2])
    v = jnp.minimum(v, (d - rng) / ramp[2])
    v = jnp.where(jnp.isnan(d), 0.0, v)
    return jnp.where(base <= 0, 0.0, jnp.clip(v, 0.0, 1.0))


MODEL = Model(
    name="Kinect",
    pose=prm3d.POSE_OPS,
    meas_dim=3,
    params=Params(),
    measure=prm3d.measure,
    jac_landmark=prm3d.jac_landmark,
    jac_pose=prm3d.jac_pose,
    to_map=prm3d.to_map,
    fit_to_measurement=prm3d.fit_to_measurement,
    visible=visible,
    fuzzy_visible=fuzzy_visible,
    random_measure=prm3d.random_measure,
    volume=prm3d.volume,
    uses_depth=True,
    measure_soa=prm3d.measure_soa,
    jac_landmark_soa=prm3d.jac_landmark_soa,
    to_map_soa=prm3d.to_map_soa,
    fuzzy_visible_soa=fuzzy_visible_soa,
)
