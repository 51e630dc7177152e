"""Pixel-range 3D camera model (PRM3D).

TPU-native re-design of the reference pinhole pixel-range measurer
(reference: mono-rfs-lib/BaseStructures/Measurers/PRM3DMeasurer.cs:43-511).
Measurement z = (px, py, range) with
  px = f x_L / z_L,  py = f y_L / z_L,  range = sign(z_L) |m - p|
where (.)_L is the camera-local frame. All functions broadcast over leading
batch dims and are jit/vmap/grad friendly.
"""

import dataclasses

import jax.numpy as jnp

from ..geometry import pose3d, quaternion as quat
from ..gm import smallmat
from .base import Model, PoseOps


@dataclasses.dataclass(frozen=True)
class Params:
    """Camera intrinsics (PRM3DMeasurer.cs:70-73 defaults)."""

    focal: float = 575.8156
    film_left: float = -320.0
    film_top: float = -240.0
    film_width: float = 640.0
    film_height: float = 480.0
    range_min: float = 0.1
    range_max: float = 2.0

    @property
    def film_right(self):
        return self.film_left + self.film_width

    @property
    def film_bottom(self):
        return self.film_top + self.film_height

    def to_linear(self):
        """Descriptor layout (PRM3DMeasurer.cs:92-96)."""
        return [
            self.focal,
            self.range_min,
            self.range_max,
            self.film_left,
            self.film_top,
            self.film_width,
            self.film_height,
        ]

    @staticmethod
    def from_linear(vals):
        f, rmin, rmax, x, y, w, h = [float(v) for v in vals]
        return Params(f, x, y, w, h, rmin, rmax)


def _local(pose, landmark):
    """Landmark in camera-local coordinates."""
    diff = landmark - pose3d.location(pose)
    return quat.rotate(quat.conj(pose3d.orientation(pose)), diff), diff


def measure(p: Params, pose, landmark):
    """h(pose, m) (PRM3DMeasurer.cs:138-149)."""
    local, diff = _local(pose, landmark)
    lz = local[..., 2]
    rng = jnp.sign(lz) * jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    px = p.focal * local[..., 0] / lz
    py = p.focal * local[..., 1] / lz
    return jnp.stack([px, py, rng], axis=-1)


def _projection_jacobian(p: Params, local):
    """d(px, py, range)/d(local) (PRM3DMeasurer.cs:163-170)."""
    lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
    sign = jnp.where(lz > 0, 1.0, -1.0)
    mag = sign * jnp.sqrt(lx * lx + ly * ly + lz * lz)
    f = p.focal
    row0 = jnp.stack([f / lz, jnp.zeros_like(lz), -f * lx / (lz * lz)], axis=-1)
    row1 = jnp.stack([jnp.zeros_like(lz), f / lz, -f * ly / (lz * lz)], axis=-1)
    row2 = jnp.stack([lx / mag, ly / mag, lz / mag], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def jac_landmark(p: Params, pose, landmark):
    """dh/dm = J_proj C(q)^T (PRM3DMeasurer.cs:157-177)."""
    local, _ = _local(pose, landmark)
    jproj = _projection_jacobian(p, local)
    crot = quat.to_matrix(quat.conj(pose3d.orientation(pose)))
    return jnp.einsum("...ij,...jk->...ik", jproj, crot)


def jac_pose(p: Params, pose, landmark):
    """dh/dpose in the semi-Lie `pose3d.add` tangent (body-frame translation,
    right-multiplied rotation): J = J_proj @ [-I | [local]_x].

    The reference's MeasurementJacobianP (PRM3DMeasurer.cs:185-209) mixes a
    global-translation tangent with a negated world-frame rotation tangent,
    which is inconsistent with how its gradients are applied (through
    IPose.Add, LoopyPHDNavigator.cs:945-947). We use the self-consistent
    body-frame convention throughout; FD-verified against pose3d.add.
    """
    local, _ = _local(pose, landmark)
    jproj = _projection_jacobian(p, local)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=local.dtype), jproj.shape[:-2] + (3, 3))
    jlocal = jnp.concatenate([-eye, pose3d.cross_matrix(local)], axis=-1)
    return jnp.einsum("...ij,...jk->...ik", jproj, jlocal)


def to_map(p: Params, pose, z):
    """Back-projection into 3D space (PRM3DMeasurer.cs:299-312)."""
    px, py, rng = z[..., 0], z[..., 1], z[..., 2]
    alpha = rng / jnp.sqrt(p.focal * p.focal + px * px + py * py)
    diff = jnp.stack([alpha * px, alpha * py, alpha * p.focal], axis=-1)
    rotated = quat.rotate(pose3d.orientation(pose), diff)
    return pose3d.location(pose) + rotated


def fit_to_measurement(p: Params, pose0, z, landmark):
    """Closed-form pose best relating z to the landmark
    (PRM3DMeasurer.cs:221-243)."""
    diff = landmark - pose3d.location(pose0)
    q0 = pose3d.orientation(pose0)
    lm_local = quat.rotate(quat.conj(q0), diff)
    invf = 1.0 / p.focal
    px, py, rng = z[..., 0], z[..., 1], z[..., 2]
    mz = rng / jnp.sqrt(1.0 + (px * px + py * py) * invf * invf)
    m_local = jnp.stack([px * mz * invf, py * mz * invf, mz], axis=-1)

    def _unit(v):
        return v / jnp.maximum(
            jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)), 1e-12
        )

    align = quat.vector_rotator(_unit(lm_local), _unit(m_local))
    rot = quat.mul(quat.conj(align), q0)
    loc = landmark - quat.rotate(rot, m_local)
    return pose3d.make(loc, rot)


# -- structure-of-arrays (K-last) variants ------------------------------------
# Same math as above, but landmarks/measurements are 3-lists of [..., K]
# arrays and matrices are smallmat lists: no [..., 3]/[..., 3, 3] trailing
# dims anywhere, so XLA tiles everything as clean (8, 128) blocks. These are
# the hot-path forms used by the PHD step; FD/parity-tested against the AoS
# forms in tests/test_models.py.

def _pose_lists(pose):
    """(location 3-list, quaternion 4-list) of [..., 1] arrays (keepdims so
    they broadcast against [..., K] operands)."""
    loc = [pose[..., i : i + 1] for i in range(3)]
    q = [pose[..., 3 + i : 4 + i] for i in range(4)]
    return loc, q


def _quat_mat(q):
    """Rotation matrix R(q) as a smallmat 3x3 list (quat.to_matrix twin)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    xw, yw, zw = x * w, y * w, z * w
    return [
        [1 - 2 * (yy + zz), 2 * (xy - zw), 2 * (xz + yw)],
        [2 * (xy + zw), 1 - 2 * (xx + zz), 2 * (yz - xw)],
        [2 * (xz - yw), 2 * (yz + xw), 1 - 2 * (xx + yy)],
    ]


def _local_soa(pose, m):
    loc, q = _pose_lists(pose)
    d = [mi - li for mi, li in zip(m, loc)]
    r = _quat_mat(q)
    local = smallmat.matvec(smallmat.transpose(r), d)  # R(q)^T d = R(q*) d
    return local, d, r


def measure_soa(p: Params, pose, m):
    local, d, _ = _local_soa(pose, m)
    lx, ly, lz = local
    rng = jnp.sign(lz) * jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    return [p.focal * lx / lz, p.focal * ly / lz, rng]


def jac_landmark_soa(p: Params, pose, m):
    local, _, r = _local_soa(pose, m)
    lx, ly, lz = local
    sign = jnp.where(lz > 0, 1.0, -1.0)
    mag = sign * jnp.sqrt(lx * lx + ly * ly + lz * lz)
    f = p.focal
    zero = jnp.zeros_like(lz)
    jproj = [
        [f / lz, zero, -f * lx / (lz * lz)],
        [zero, f / lz, -f * ly / (lz * lz)],
        [lx / mag, ly / mag, lz / mag],
    ]
    return smallmat.matmul(jproj, smallmat.transpose(r))


def to_map_soa(p: Params, pose, z):
    px, py, rng = z
    alpha = rng / jnp.sqrt(p.focal * p.focal + px * px + py * py)
    diff = [alpha * px, alpha * py, alpha * p.focal]
    loc, q = _pose_lists(pose)
    rotated = smallmat.matvec(_quat_mat(q), diff)
    return [li + vi for li, vi in zip(loc, rotated)]


def fuzzy_visible_soa(p: Params, z, ramp):
    px, py, rng = z
    d = jnp.minimum((px - p.film_left) / ramp[0], (p.film_right - px) / ramp[0])
    d = jnp.minimum(d, (py - p.film_top) / ramp[1])
    d = jnp.minimum(d, (p.film_bottom - py) / ramp[1])
    d = jnp.minimum(d, (rng - p.range_min) / ramp[2])
    d = jnp.minimum(d, (p.range_max - rng) / ramp[2])
    return jnp.clip(d, 0.0, 1.0)


def visible(p: Params, z):
    """Frustum visibility (PRM3DMeasurer.cs:264-269)."""
    px, py, rng = z[..., 0], z[..., 1], z[..., 2]
    return (
        (p.film_left < px)
        & (px < p.film_right)
        & (p.film_top < py)
        & (py < p.film_bottom)
        & (p.range_min < rng)
        & (rng < p.range_max)
    )


def fuzzy_visible(p: Params, z, ramp):
    """Linear visibility ramp near the frustum border
    (PRM3DMeasurer.cs:277-291)."""
    px, py, rng = z[..., 0], z[..., 1], z[..., 2]
    d = jnp.minimum((px - p.film_left) / ramp[0], (p.film_right - px) / ramp[0])
    d = jnp.minimum(d, (py - p.film_top) / ramp[1])
    d = jnp.minimum(d, (p.film_bottom - py) / ramp[1])
    d = jnp.minimum(d, (rng - p.range_min) / ramp[2])
    d = jnp.minimum(d, (p.range_max - rng) / ramp[2])
    return jnp.clip(d, 0.0, 1.0)


def random_measure(p: Params, key, shape=()):
    """Uniform clutter in the visible frustum (PRM3DMeasurer.cs:249-256)."""
    import jax

    u = jax.random.uniform(key, shape + (3,))
    lo = jnp.array([p.film_left, p.film_top, p.range_min])
    span = jnp.array([p.film_width, p.film_height, p.range_max - p.range_min])
    return lo + u * span


def volume(p: Params):
    """Measurement-space volume (PRM3DMeasurer.cs:119-122)."""
    return p.film_width * p.film_height * (p.range_max - p.range_min)


POSE_OPS = PoseOps(
    state_dim=7,
    odo_dim=6,
    identity=pose3d.identity,
    add=pose3d.add,
    subtract=pose3d.subtract,
    add_global=pose3d.add_global,
    subtract_global=pose3d.subtract_global,
    add_odometry=pose3d.add_odometry,
    diff_odometry=pose3d.diff_odometry,
    add_jacobian=pose3d.add_jacobian,
    subtract_jacobian=pose3d.subtract_jacobian,
    add_odometry_jacobian=pose3d.add_odometry_jacobian,
)

MODEL = Model(
    name="PRM3D",
    pose=POSE_OPS,
    meas_dim=3,
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
