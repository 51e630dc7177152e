"""Simulated ground-truth vehicle as pure sampling functions.

TPU-native re-design of the reference simulator vehicle
(reference: mono-rfs-lib/SLAM/Vehicles/SimulatedVehicle.cs:47-387 +
Vehicle.cs:313-352): per-landmark Bernoulli detection with fuzzy-visibility
scaled PD, Gaussian measurement noise, Poisson clutter (capped at 10 lambda),
and reset-on-read noisy odometry. Everything runs under jax.random with
fixed-shape outputs (measurement slots + mask), so the whole
vehicle-plus-navigator frame fits in one jit/scan.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

CLUTTER_LABEL = -2
NO_MEASUREMENT = -9999


class VehicleParams(NamedTuple):
    motion_cov: jax.Array  # [T, T] true motion covariance
    meas_cov: jax.Array  # [D, D] true measurement covariance
    pd: jax.Array  # DetectionProbability
    clutter_count: jax.Array  # ClutterDensity * measurer volume
    visibility_ramp: jax.Array  # [D]
    dt: jax.Array
    perfect_still: jax.Array  # bool


class VehicleState(NamedTuple):
    pose: jax.Array  # [S] true pose
    landmarks: jax.Array  # [L, 3]
    landmark_mask: jax.Array  # [L]


def _sqrt_cov(cov):
    lam, vec = jnp.linalg.eigh(cov)
    return vec * jnp.sqrt(jnp.maximum(lam, 0.0))[None, :]


def update(model, params: VehicleParams, state: VehicleState, reading, key):
    """Advance the true pose by the exact reading and produce the noisy
    odometry output (Vehicle.cs:325-352: noise = dt * N(0, Q), reset-on-read
    so noise does not accumulate across frames). With PerfectStill and a zero
    reading, no noise is added (SimulatedVehicle.cs:190-202)."""
    new_pose = model.pose.add_odometry(state.pose, reading)
    noise = params.dt * jnp.einsum(
        "ij,j->i",
        _sqrt_cov(params.motion_cov),
        jax.random.normal(key, reading.shape, reading.dtype),
    )
    still = params.perfect_still & jnp.all(reading == 0)
    noise = jnp.where(still, jnp.zeros_like(noise), noise)
    odometry_pose = model.pose.add_odometry(new_pose, noise)
    noisy_reading = model.pose.diff_odometry(odometry_pose, state.pose)
    return state._replace(pose=new_pose), noisy_reading


def measure(model, params: VehicleParams, state: VehicleState, key,
            max_clutter: int):
    """Sample one measurement set (SimulatedVehicle.Measure, :243-295).

    Returns (z [L + C, D], mask [L + C], labels [L + C]) where labels hold
    the landmark index for detections and CLUTTER_LABEL for clutter; the
    first L slots follow landmark order, clutter fills the tail."""
    kdetect, knoise, kcount, kclutter = jax.random.split(key, 4)
    lm = state.landmarks
    l = lm.shape[0]
    d = model.meas_dim

    perfect = model.measure(model.params, state.pose[None, :], lm)  # [L, D]
    pd = (
        model.fuzzy_visible(model.params, perfect, params.visibility_ramp)
        * params.pd
    )
    detected = (
        state.landmark_mask
        & (pd > 0)
        & (jax.random.uniform(key=kdetect, shape=(l,)) < pd)
    )
    noise = jnp.einsum(
        "ij,lj->li",
        _sqrt_cov(params.meas_cov),
        jax.random.normal(knoise, (l, d), perfect.dtype),
    )
    z_land = perfect + noise

    # Poisson clutter, capped at 10 lambda (SimulatedVehicle.cs:269-285)
    n_clutter = jnp.minimum(
        jax.random.poisson(kcount, params.clutter_count),
        jnp.floor(params.clutter_count * 10).astype(jnp.int32),
    )
    n_clutter = jnp.minimum(n_clutter, max_clutter)
    z_clutter = model.random_measure(model.params, kclutter, (max_clutter,))
    clutter_mask = jnp.arange(max_clutter) < n_clutter

    z = jnp.concatenate([z_land, z_clutter.astype(z_land.dtype)], axis=0)
    mask = jnp.concatenate([detected, clutter_mask])
    labels = jnp.concatenate(
        [
            jnp.where(detected, jnp.arange(l), NO_MEASUREMENT),
            jnp.full((max_clutter,), CLUTTER_LABEL),
        ]
    )
    # visible-but-not-detected bookkeeping (weight-0 entries in vismaps)
    visible = state.landmark_mask & (pd > 0)
    return z, mask, labels, visible, detected
