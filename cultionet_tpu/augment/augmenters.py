"""Host-side augmentation orchestration: pick-one-per-sample, parcel-aware.

Mirrors the reference's Augmenters framework (augment/augmenters.py:19-445):
15 named augmenters, each clones the batch, transforms, and re-clips x to
[1e-9, 1]. Temporal augmenters (roll / tswarp / tsnoise / tsdrift / tspeaks)
are applied per field parcel — connected components of ``y == 1`` — masked to
the parcel's pixels (the reference's bbox slicing is a special case of this).

The tensor math itself is this package's jit-able functional ops
(augment/functional.py), pinned to the host CPU device so the training
accelerator never sees augmentation traffic.
"""

import typing as T

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batch import Batch
from . import functional as AF


AUGMENTATION_NAMES = (
    "tswarp",
    "tsnoise",
    "tsdrift",
    "tspeaks",
    "rot90",
    "rot180",
    "rot270",
    "roll",
    "fliplr",
    "flipud",
    "gaussian",
    "saltpepper",
    "cropresize",
    "perlin",
    "none",
)

SPATIAL_NAMES = ("rot90", "rot180", "rot270", "fliplr", "flipud", "cropresize")
TEMPORAL_NAMES = ("tswarp", "tsnoise", "tsdrift", "tspeaks", "roll")


from ..utils.host import cpu_device as _cpu_device


def label_segments(y: np.ndarray, crop_value: int = 1) -> np.ndarray:
    """Connected components of the crop mask (4-connectivity), replacing the
    reference's scipy ``nd_label`` call (datasets.py:462-465)."""
    from scipy import ndimage

    segments, _ = ndimage.label(y == crop_value)
    return segments.astype(np.int32)


def _finalize(batch: Batch) -> Batch:
    """Post-augmentation clips (reference AugmenterModule.__call__:25-35)."""
    out = batch.replace(x=jnp.clip(batch.x, 1e-9, 1.0))
    if batch.bdist is not None:
        out = out.replace(bdist=jnp.clip(batch.bdist, 0.0, 1.0))
    return out


class Augmenters:
    """Apply a sequence of named augmentations to a Batch."""

    def __init__(
        self,
        augmentations: T.Sequence[str],
        rng: T.Optional[np.random.Generator] = None,
        random_seed: T.Optional[int] = None,
        crop_value: int = 1,
    ):
        unknown = set(augmentations) - set(AUGMENTATION_NAMES)
        if unknown:
            raise ValueError(f"Unknown augmentations: {sorted(unknown)}")
        self.augmentations = list(augmentations)
        self.rng = rng if rng is not None else np.random.default_rng(random_seed)
        self.crop_value = crop_value

    def __call__(self, batch: Batch) -> Batch:
        with jax.default_device(_cpu_device()):
            # Host batches carry numpy leaves; jnp-ify once (on the CPU
            # backend) so .at[] updates etc. work uniformly.
            batch = batch.replace(
                x=jnp.asarray(batch.x),
                y=None if batch.y is None else jnp.asarray(batch.y),
                bdist=(
                    None if batch.bdist is None else jnp.asarray(batch.bdist)
                ),
            )
            for name in self.augmentations:
                batch = self._apply_one(name, batch)
        return batch

    # ------------------------------------------------------------------

    def _key(self) -> jax.Array:
        return jax.random.PRNGKey(int(self.rng.integers(0, 2**31 - 1)))

    def _apply_one(self, name: str, batch: Batch) -> Batch:
        if name == "none":
            return batch

        if name in ("rot90", "rot180", "rot270"):
            k = {"rot90": 1, "rot180": 2, "rot270": 3}[name]
            x, y, bdist = AF.rotate(batch.x, batch.y, batch.bdist, k=k)
            return _finalize(batch.replace(x=x, y=y, bdist=bdist))

        if name in ("fliplr", "flipud"):
            fn = AF.fliplr if name == "fliplr" else AF.flipud
            x, y, bdist = fn(batch.x, batch.y, batch.bdist)
            return _finalize(batch.replace(x=x, y=y, bdist=bdist))

        if name == "gaussian":
            sigma = jnp.asarray(self.rng.uniform(0.2, 0.5), dtype=batch.x.dtype)
            return _finalize(batch.replace(x=AF.gaussian_blur(batch.x, sigma)))

        if name == "saltpepper":
            return _finalize(
                batch.replace(
                    x=AF.gaussian_noise(batch.x, self._key(), sigma=0.01)
                )
            )

        if name == "cropresize":
            div = int(self.rng.choice([2, 4]))
            x, y, bdist = AF.crop_resize(
                batch.x, batch.y, batch.bdist, self._key(), div=div
            )
            return _finalize(batch.replace(x=x, y=y, bdist=bdist))

        if name == "perlin":
            res = int(self.rng.choice([2, 5, 10]))
            _, num_time, height, width, _ = batch.x.shape
            noise = AF.perlin_noise_3d(
                self._key(),
                shape=(num_time, height, width),
                res=(1, res, res),
                out_range=(-0.03, 0.03),
            )
            x = batch.x + noise[None, :, :, :, None].astype(batch.x.dtype)
            return _finalize(batch.replace(x=x))

        if name in TEMPORAL_NAMES:
            return _finalize(self._apply_temporal(name, batch))

        raise ValueError(f"Unhandled augmentation: {name}")

    def _apply_temporal(self, name: str, batch: Batch) -> Batch:
        """Apply a temporal transform independently per field parcel."""
        y_np = np.asarray(batch.y)
        x = batch.x
        num_time = x.shape[1]

        for b in range(y_np.shape[0]):
            segments = label_segments(y_np[b], crop_value=self.crop_value)
            num_segments = int(segments.max())
            if num_segments == 0:
                continue
            seg_mask_all = jnp.asarray(segments)

            for label in range(1, num_segments + 1):
                x_b = x[b : b + 1]

                if name == "roll":
                    limit = int(num_time * 0.25)
                    shift = int(self.rng.choice(range(-limit, limit + 1)))
                    transformed = AF.roll_time(x_b, shift)
                elif name == "tswarp":
                    transformed = AF.time_warp(
                        x_b,
                        self._key(),
                        n_speed_change=int(self.rng.integers(1, 3)),
                        max_speed_ratio=float(self.rng.uniform(1.1, 1.5)),
                    )
                    transformed = AF.add_time_noise(
                        transformed,
                        self._key(),
                        scale=float(self.rng.uniform(0.01, 0.05)),
                    )
                elif name == "tspeaks":
                    transformed = AF.time_peaks(x_b, self._key())
                    transformed = AF.add_time_noise(
                        transformed,
                        self._key(),
                        scale=float(self.rng.uniform(0.01, 0.05)),
                    )
                elif name == "tsnoise":
                    transformed = AF.add_time_noise(
                        x_b,
                        self._key(),
                        scale=float(self.rng.uniform(0.01, 0.05)),
                    )
                elif name == "tsdrift":
                    transformed = AF.time_drift(
                        x_b,
                        self._key(),
                        max_drift=float(self.rng.uniform(0.05, 0.1)),
                        n_drift_points=int(self.rng.integers(1, 6)),
                    )
                    transformed = AF.add_time_noise(
                        transformed,
                        self._key(),
                        scale=float(self.rng.uniform(0.01, 0.05)),
                    )
                else:
                    raise ValueError(name)

                mask = (seg_mask_all == label)[None, None, :, :, None]
                x_b = jnp.where(mask, jnp.clip(transformed, 0.0, 1.0), x_b)
                x = x.at[b : b + 1].set(x_b)

        return batch.replace(x=x)
