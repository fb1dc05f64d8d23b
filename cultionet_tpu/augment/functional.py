"""Jit-able augmentation ops on (B, T, H, W, C) chips.

TPU-native re-implementations of the reference augmenter zoo
(augment/augmenters.py:51-375, augment/augmenter_utils.py). Spatial/noise
transforms are pure JAX (device-runnable inside jit); the parcel-wise
temporal transforms also exist here as whole-chip ops that the host-side
``Augmenters`` masks per field parcel.

Conventions: 90-degree rotations are exact (``jnp.rot90``), matching the
reference's bilinear rotation at multiples of 90 degrees; label images use
nearest (i.e. the same exact pixel permutation).
"""

import typing as T


import jax
import jax.numpy as jnp

Array = jax.Array

# x: (B, T, H, W, C); y/bdist: (B, H, W)
_H_AXIS_X, _W_AXIS_X = 2, 3
_H_AXIS_Y, _W_AXIS_Y = 1, 2


def rotate(x: Array, y: Array, bdist: Array, k: int):
    """Rotate by k*90 degrees counterclockwise (reference rot90/180/270)."""
    x = jnp.rot90(x, k=k, axes=(_H_AXIS_X, _W_AXIS_X))
    y = jnp.rot90(y, k=k, axes=(_H_AXIS_Y, _W_AXIS_Y))
    bdist = jnp.rot90(bdist, k=k, axes=(_H_AXIS_Y, _W_AXIS_Y))
    return x, y, bdist


def fliplr(x: Array, y: Array, bdist: Array):
    return (
        jnp.flip(x, axis=_W_AXIS_X),
        jnp.flip(y, axis=_W_AXIS_Y),
        jnp.flip(bdist, axis=_W_AXIS_Y),
    )


def flipud(x: Array, y: Array, bdist: Array):
    return (
        jnp.flip(x, axis=_H_AXIS_X),
        jnp.flip(y, axis=_H_AXIS_Y),
        jnp.flip(bdist, axis=_H_AXIS_Y),
    )


def gaussian_blur(x: Array, sigma: Array) -> Array:
    """3x3 gaussian blur over (H, W), per torchvision GaussianBlur(kernel=3)."""
    offsets = jnp.asarray([-1.0, 0.0, 1.0])
    kernel1d = jnp.exp(-(offsets**2) / (2.0 * sigma**2))
    kernel1d = kernel1d / jnp.sum(kernel1d)

    # Separable blur via two 1-D convolutions along H then W.
    def conv_axis(z: Array, axis: int) -> Array:
        pad = [(0, 0)] * z.ndim
        pad[axis] = (1, 1)
        padded = jnp.pad(z, pad, mode="edge")

        def take(offset):
            index = [slice(None)] * z.ndim
            index[axis] = slice(offset, offset + z.shape[axis])
            return padded[tuple(index)]

        return (
            kernel1d[0] * take(0) + kernel1d[1] * take(1) + kernel1d[2] * take(2)
        )

    return conv_axis(conv_axis(x, _H_AXIS_X), _W_AXIS_X)


def gaussian_noise(x: Array, key: Array, sigma: float = 0.01) -> Array:
    """'Salt & pepper' of the reference = additive gaussian noise
    (augmenters.py:324-330)."""
    return x + sigma * jax.random.normal(key, x.shape, dtype=x.dtype)


def roll_time(x: Array, shift: Array) -> Array:
    """Circular shift along the time axis (whole chip); the host applies the
    parcel mask (reference augmenter_utils.py:168-193)."""
    # shift is a traced scalar; jnp.roll supports traced shifts.
    return jnp.roll(x, shift, axis=1)


def _interp_time(x: Array, src_positions: Array) -> Array:
    """Linearly resample (B, T, H, W, C) at fractional time positions
    (T',) -> (B, T', H, W, C)."""
    num_time = x.shape[1]
    pos = jnp.clip(src_positions, 0.0, num_time - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, num_time - 2)
    frac = pos - lo
    x_lo = jnp.take(x, lo, axis=1)
    x_hi = jnp.take(x, lo + 1, axis=1)
    frac = frac.reshape((1, -1) + (1,) * (x.ndim - 2))
    return x_lo * (1.0 - frac) + x_hi * frac


def time_warp(
    x: Array,
    key: Array,
    n_speed_change: int = 3,
    max_speed_ratio: float = 1.5,
) -> Array:
    """Random smooth monotone time warp (tsaug.TimeWarp semantics:
    n_speed_change random anchors, speed ratio bounded)."""
    num_time = x.shape[1]
    # Random positive speeds at n_speed_change+1 segments, ratio-bounded.
    log_ratio = jnp.log(max_speed_ratio)
    speeds = jnp.exp(
        jax.random.uniform(
            key, (n_speed_change + 1,), minval=-log_ratio, maxval=log_ratio
        )
    )
    # Piecewise-constant speed -> cumulative source time, normalized to [0, T-1].
    seg_len = (num_time - 1) / (n_speed_change + 1)
    cum = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(speeds * seg_len)])
    anchors_dst = jnp.linspace(0.0, num_time - 1.0, n_speed_change + 2)
    cum = cum / cum[-1] * (num_time - 1.0)
    dst = jnp.linspace(0.0, num_time - 1.0, num_time)
    src = jnp.interp(dst, anchors_dst, cum)
    return _interp_time(x, src)


def time_drift(
    x: Array,
    key: Array,
    max_drift: float = 0.1,
    n_drift_points: int = 3,
) -> Array:
    """Additive smooth random drift over time (tsaug.Drift semantics)."""
    num_time = x.shape[1]
    walk = jnp.cumsum(
        jax.random.normal(key, (n_drift_points + 1,)), axis=0
    )
    walk = walk - walk[0]
    denom = jnp.maximum(jnp.max(jnp.abs(walk)), 1e-6)
    walk = walk / denom * max_drift
    anchor_pos = jnp.linspace(0.0, num_time - 1.0, n_drift_points + 1)
    drift = jnp.interp(
        jnp.linspace(0.0, num_time - 1.0, num_time), anchor_pos, walk
    )
    return x + drift.reshape((1, -1) + (1,) * (x.ndim - 2)).astype(x.dtype)


def time_peaks(x: Array, key: Array) -> Array:
    """tspeaks: squeeze two half-rate copies of the series back-to-back,
    then warp (reference augmenter_utils.py:132-147)."""
    num_time = x.shape[1]
    half_a = num_time // 2
    half_b = num_time - half_a
    pos_a = jnp.linspace(0.0, num_time - 1.0, half_a)
    pos_b = jnp.linspace(0.0, num_time - 1.0, half_b)
    squeezed = jnp.concatenate(
        [_interp_time(x, pos_a), _interp_time(x, pos_b)], axis=1
    )
    return time_warp(squeezed, key)


def add_time_noise(x: Array, key: Array, scale: float = 0.03) -> Array:
    """tsaug.AddNoise: i.i.d. gaussian over every element."""
    return x + scale * jax.random.normal(key, x.shape, dtype=x.dtype)


def crop_resize(
    x: Array,
    y: Array,
    bdist: Array,
    key: Array,
    div: int,
):
    """Random crop to (H//div, W//div) then resize back
    (reference augmenters.py:241-293): bilinear for x/bdist, nearest for y."""
    _, _, height, width, _ = x.shape
    crop_h, crop_w = height // div, width // div
    key_r, key_c = jax.random.split(key)
    row0 = jax.random.randint(key_r, (), 0, height - crop_h + 1)
    col0 = jax.random.randint(key_c, (), 0, width - crop_w + 1)

    x_crop = jax.lax.dynamic_slice(
        x,
        (0, 0, row0, col0, 0),
        (x.shape[0], x.shape[1], crop_h, crop_w, x.shape[4]),
    )
    y_crop = jax.lax.dynamic_slice(
        y, (0, row0, col0), (y.shape[0], crop_h, crop_w)
    )
    b_crop = jax.lax.dynamic_slice(
        bdist, (0, row0, col0), (bdist.shape[0], crop_h, crop_w)
    )

    x_out = jax.image.resize(
        x_crop,
        (x.shape[0], x.shape[1], height, width, x.shape[4]),
        method="bilinear",
    )
    b_out = jax.image.resize(
        b_crop, (bdist.shape[0], height, width), method="bilinear"
    )
    y_out = jax.image.resize(
        y_crop.astype(jnp.float32),
        (y.shape[0], height, width),
        method="nearest",
    ).astype(y.dtype)
    return x_out, y_out, b_out


def _perlin_interpolant(t: Array) -> Array:
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin_noise_3d(
    key: Array,
    shape: T.Tuple[int, int, int],
    res: T.Tuple[int, int, int],
    out_range: T.Tuple[float, float] = (-0.03, 0.03),
) -> Array:
    """3-D Perlin noise over (T, H, W); shape must be a multiple of res
    (reference augmenter_utils.py:211-360; original: github.com/pvigier/
    perlin-numpy, MIT)."""
    for s, r in zip(shape, res):
        if s % r != 0:
            raise ValueError(f"shape {shape} not a multiple of res {res}")

    d = tuple(s // r for s, r in zip(shape, res))
    # Fractional lattice coordinates per voxel.
    grids = [
        (jnp.arange(s, dtype=jnp.float32) * (r / s)) % 1.0
        for s, r in zip(shape, res)
    ]
    gt = grids[0][:, None, None]
    gh = grids[1][None, :, None]
    gw = grids[2][None, None, :]

    key_theta, key_phi = jax.random.split(key)
    lattice = (res[0] + 1, res[1] + 1, res[2] + 1)
    theta = 2 * jnp.pi * jax.random.uniform(key_theta, lattice)
    phi = 2 * jnp.pi * jax.random.uniform(key_phi, lattice)
    gradients = jnp.stack(
        [
            jnp.sin(phi) * jnp.cos(theta),
            jnp.sin(phi) * jnp.sin(theta),
            jnp.cos(phi),
        ],
        axis=-1,
    )
    gradients = jnp.repeat(gradients, d[0], axis=0)
    gradients = jnp.repeat(gradients, d[1], axis=1)
    gradients = jnp.repeat(gradients, d[2], axis=2)

    def corner(i, j, k):
        g = gradients[
            slice(d[0], None) if i else slice(None, -d[0]),
            slice(d[1], None) if j else slice(None, -d[1]),
            slice(d[2], None) if k else slice(None, -d[2]),
        ]
        offset = jnp.stack(
            jnp.broadcast_arrays(gt - i, gh - j, gw - k), axis=-1
        )
        return jnp.sum(offset * g, axis=-1)

    t = _perlin_interpolant(
        jnp.stack(jnp.broadcast_arrays(gt, gh, gw), axis=-1)
    )
    n00 = corner(0, 0, 0) * (1 - t[..., 0]) + t[..., 0] * corner(1, 0, 0)
    n10 = corner(0, 1, 0) * (1 - t[..., 0]) + t[..., 0] * corner(1, 1, 0)
    n01 = corner(0, 0, 1) * (1 - t[..., 0]) + t[..., 0] * corner(1, 0, 1)
    n11 = corner(0, 1, 1) * (1 - t[..., 0]) + t[..., 0] * corner(1, 1, 1)
    n0 = (1 - t[..., 1]) * n00 + t[..., 1] * n10
    n1 = (1 - t[..., 1]) * n01 + t[..., 1] * n11
    noise = (1 - t[..., 2]) * n0 + t[..., 2] * n1

    lo, hi = out_range
    return ((hi - lo) * (noise + 0.5)) + lo
