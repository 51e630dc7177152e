"""Linear 1D/2D world models.

TPU-native re-design of the reference linear measurers
(reference: mono-rfs-lib/BaseStructures/Measurers/Linear2DMeasurer.cs:43-,
Linear1DMeasurer.cs). Pose state == Euclidean position; the sensor reports
landmark offsets within a box of half-width `range` (uniform norm). Landmark
means stay 3-vectors (padded with zeros) to keep the map representation
uniform across model families.
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..geometry import linear
from .base import Model, PoseOps


@dataclasses.dataclass(frozen=True)
class Params:
    range: float = 2.0

    def to_linear(self):
        return [self.range]

    @staticmethod
    def from_linear(vals):
        return Params(float(vals[0]))


def _pose_ops(dim):
    return PoseOps(
        state_dim=dim,
        odo_dim=dim,
        identity=lambda dtype=jnp.float32: linear.identity(dim, dtype),
        add=linear.add,
        subtract=linear.subtract,
        add_global=linear.add,
        subtract_global=linear.subtract,
        add_odometry=linear.add_odometry,
        diff_odometry=linear.diff_odometry,
        add_jacobian=linear.add_jacobian,
        subtract_jacobian=linear.subtract_jacobian,
        add_odometry_jacobian=linear.add_odometry_jacobian,
    )


def _make(dim, name):
    def measure(p, pose, landmark):
        """z = landmark - pose, first `dim` coords
        (Linear2DMeasurer.cs:110-113)."""
        return landmark[..., :dim] - pose

    def jac_landmark(p, pose, landmark):
        """[dim x 3] selector (Linear2DMeasurer.cs:121-125)."""
        j = jnp.zeros(pose.shape[:-1] + (dim, 3), pose.dtype)
        return j + jnp.eye(dim, 3, dtype=pose.dtype)

    def jac_pose(p, pose, landmark):
        j = jnp.zeros(pose.shape[:-1] + (dim, dim), pose.dtype)
        return j - jnp.eye(dim, dtype=pose.dtype)

    def to_map(p, pose, z):
        """Embed into 3D with zero padding (Linear2DMeasurer.cs:200-203)."""
        lm = pose + z
        pad = jnp.zeros(lm.shape[:-1] + (3 - dim,), lm.dtype)
        return jnp.concatenate([lm, pad], axis=-1)

    def fit_to_measurement(p, pose0, z, landmark):
        """pose = landmark - z (Linear2DMeasurer.cs:146-149)."""
        return landmark[..., :dim] - z

    def visible(p, z):
        return jnp.all((-p.range < z) & (z < p.range), axis=-1)

    def fuzzy_visible(p, z, ramp):
        d = jnp.min(
            jnp.minimum((z + p.range) / ramp[:dim], (p.range - z) / ramp[:dim]),
            axis=-1,
        )
        return jnp.clip(d, 0.0, 1.0)

    def random_measure(p, key, shape=()):
        return jax.random.uniform(
            key, shape + (dim,), minval=-p.range, maxval=p.range
        )

    def volume(p):
        return (2.0 * p.range) ** dim

    # SoA (K-last) hot-path variants (see gm/smallmat.py layout note)
    def measure_soa(p, pose, m):
        return [m[i] - pose[..., i : i + 1] for i in range(dim)]

    def jac_landmark_soa(p, pose, m):
        one, zero = jnp.ones_like(m[0]), jnp.zeros_like(m[0])
        return [
            [one if i == k else zero for k in range(3)] for i in range(dim)
        ]

    def to_map_soa(p, pose, z):
        lm = [pose[..., i : i + 1] + z[i] for i in range(dim)]
        lm = [jnp.broadcast_to(v, z[0].shape) for v in lm]
        return lm + [jnp.zeros_like(lm[0])] * (3 - dim)

    def fuzzy_visible_soa(p, z, ramp):
        d = jnp.minimum((z[0] + p.range) / ramp[0], (p.range - z[0]) / ramp[0])
        for i in range(1, dim):
            d = jnp.minimum(d, (z[i] + p.range) / ramp[i])
            d = jnp.minimum(d, (p.range - z[i]) / ramp[i])
        return jnp.clip(d, 0.0, 1.0)

    return Model(
        name=name,
        pose=_pose_ops(dim),
        meas_dim=dim,
        params=Params(),
        measure=measure,
        jac_landmark=jac_landmark,
        jac_pose=jac_pose,
        to_map=to_map,
        fit_to_measurement=fit_to_measurement,
        visible=visible,
        fuzzy_visible=fuzzy_visible,
        random_measure=random_measure,
        volume=volume,
        measure_soa=measure_soa,
        jac_landmark_soa=jac_landmark_soa,
        to_map_soa=to_map_soa,
        fuzzy_visible_soa=fuzzy_visible_soa,
    )


MODEL_2D = _make(2, "Linear2D")
MODEL_1D = _make(1, "Linear1D")
