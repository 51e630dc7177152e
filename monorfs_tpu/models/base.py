"""Model registry: pure-function bundles replacing the reference's
<MeasurerT, PoseT, MeasurementT> generics (reference: Navigator.cs:47-50,
IMeasurer.cs:38-148, IPose.cs:36-179).

A `Model` packages the pose-manifold operations and the measurement model as
plain jax-traceable functions over arrays. Landmarks are always 3-vectors
(the reference always builds `Map(3)`); measurement dim varies per model.
Measurer parameters are static Python floats carried on the (hashable,
frozen) dataclass so jit specializes on them.
"""

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PoseOps:
    state_dim: int
    odo_dim: int
    identity: Callable  # (dtype) -> [S]
    add: Callable  # ([S], [T]) -> [S]
    subtract: Callable  # ([S], [S]) -> [T]
    add_global: Callable
    subtract_global: Callable
    add_odometry: Callable  # ([S], [T]) -> [S]
    diff_odometry: Callable  # ([S], [S]) -> [T]
    add_jacobian: Callable
    subtract_jacobian: Callable
    add_odometry_jacobian: Callable


@dataclasses.dataclass(frozen=True)
class Model:
    name: str
    pose: PoseOps
    meas_dim: int
    params: Any  # frozen dataclass of floats (static under jit)

    # measurement model: all functions take (params, ...) and broadcast
    measure: Callable  # (params, pose [S], lm [3]) -> z [D]
    jac_landmark: Callable  # -> [D, 3]
    jac_pose: Callable  # -> [D, T]
    to_map: Callable  # (params, pose, z) -> lm [3]
    fit_to_measurement: Callable  # (params, pose0, z, lm) -> pose [S]
    visible: Callable  # (params, z) -> bool
    fuzzy_visible: Callable  # (params, z, ramp [D]) -> [0, 1]
    random_measure: Callable  # (params, key, shape) -> z [*shape, D]
    volume: Callable  # (params) -> float
    # depth-occlusion models take the live depth map as an extra trailing
    # argument to visible/fuzzy_visible (KinectMeasurer equivalent)
    uses_depth: bool = False

    # structure-of-arrays (K-last) hot-path variants: landmarks and
    # measurements are lists of [..., K] component arrays, matrices are
    # smallmat lists (see gm/smallmat.py). Models without hand-written SoA
    # forms fall back to stack/unstack adapters over the AoS functions
    # (correct, but reintroduces padded [..., K, D] intermediates).
    measure_soa: Optional[Callable] = None  # (params, pose, m 3-list) -> D-list
    jac_landmark_soa: Optional[Callable] = None  # -> D x 3 smallmat list
    to_map_soa: Optional[Callable] = None  # (params, pose, z D-list) -> 3-list
    fuzzy_visible_soa: Optional[Callable] = None  # (params, z D-list, ramp)

    def with_params(self, params):
        return dataclasses.replace(self, params=params)

    def fuzzy_visible_fn(self, depth_map):
        """fuzzy_visible closed over the (possibly unused) depth map."""
        if self.uses_depth:
            return lambda params, z, ramp: self.fuzzy_visible(
                params, z, ramp, depth_map
            )
        return self.fuzzy_visible

    def visible_fn(self, depth_map=None):
        """visible closed over the (possibly unused) depth map; with None,
        depth-occlusion models fall back to pure frustum visibility (a
        [1, 1] +inf map -- everything in the frustum counts as visible)."""
        if self.uses_depth:
            import jax.numpy as jnp

            dm = (
                jnp.full((1, 1), jnp.inf) if depth_map is None else depth_map
            )
            return lambda params, z: self.visible(params, z, dm)
        return self.visible

    # -- SoA accessors with generic fallbacks ---------------------------------

    def measure_soa_fn(self):
        if self.measure_soa is not None:
            return self.measure_soa

        def fallback(params, pose, m):
            z = self.measure(params, pose[..., None, :], jnp.stack(m, axis=-1))
            return [z[..., i] for i in range(self.meas_dim)]

        return fallback

    def jac_landmark_soa_fn(self):
        if self.jac_landmark_soa is not None:
            return self.jac_landmark_soa

        def fallback(params, pose, m):
            j = self.jac_landmark(
                params, pose[..., None, :], jnp.stack(m, axis=-1)
            )
            j = jnp.broadcast_to(
                j, m[0].shape + (self.meas_dim, 3)
            )
            return [
                [j[..., i, k] for k in range(3)] for i in range(self.meas_dim)
            ]

        return fallback

    def to_map_soa_fn(self):
        if self.to_map_soa is not None:
            return self.to_map_soa

        def fallback(params, pose, z):
            lm = self.to_map(params, pose[..., None, :], jnp.stack(z, axis=-1))
            return [lm[..., i] for i in range(3)]

        return fallback

    def fuzzy_visible_soa_fn(self, depth_map):
        if self.fuzzy_visible_soa is not None:
            if self.uses_depth:
                return lambda params, z, ramp: self.fuzzy_visible_soa(
                    params, z, ramp, depth_map
                )
            return self.fuzzy_visible_soa

        base = self.fuzzy_visible_fn(depth_map)

        def fallback(params, z, ramp):
            return base(params, jnp.stack(z, axis=-1), ramp)

        return fallback


_REGISTRY = {}


def register(model: Model):
    _REGISTRY[model.name] = model
    return model


def get(name: str) -> Model:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]
