"""The batch container: a JAX pytree of device tensors + host metadata.

TPU-native counterpart of the reference ``Data`` object
(data/data.py:51-318). Tensor layout differences from the reference:

- ``x`` is channel-LAST time series: ``(B, T, H, W, C)`` (reference uses
  ``(B, C, T, H, W)``).
- geo-bounds and lat/lon are plain ``(B,)`` float arrays.

Host-side metadata (``batch_id`` file names, window offsets for prediction
stitching) ride along as static aux data, invisible to jit.
"""

import typing as T
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array

_SHIM_INSTALLED = False


def _install_torch_geometric_shim() -> None:
    """Register a permissive import shim so v1-era reference chips (pickled
    torch_geometric Data objects) can be unpickled without the dependency."""
    global _SHIM_INSTALLED
    if _SHIM_INSTALLED:
        return
    try:
        import torch_geometric  # noqa: F401

        _SHIM_INSTALLED = True
        return
    except ImportError:
        pass

    import importlib.abc
    import importlib.machinery
    import sys
    import types

    class _ShimLoader(importlib.abc.Loader):
        def create_module(self, spec):
            mod = types.ModuleType(spec.name)
            mod.__path__ = []

            def getattr_(name, _mod=mod):
                if name.startswith("__"):
                    raise AttributeError(name)
                cls = type(
                    name,
                    (),
                    {
                        "__init__": lambda self, *a, **k: self.__dict__.update(
                            k
                        ),
                        "__setstate__": lambda self, st: self.__dict__.update(
                            st if isinstance(st, dict) else {"_state": st}
                        ),
                    },
                )
                setattr(_mod, name, cls)
                return cls

            mod.__getattr__ = getattr_
            return mod

        def exec_module(self, module):
            pass

    class _ShimFinder(importlib.abc.MetaPathFinder):
        def find_spec(self, fullname, path=None, target=None):
            if fullname.split(".")[0] == "torch_geometric":
                return importlib.machinery.ModuleSpec(
                    fullname, _ShimLoader(), is_package=True
                )
            return None

    sys.meta_path.insert(0, _ShimFinder())
    _SHIM_INSTALLED = True


def _extract_pyg_store(obj) -> T.Optional[dict]:
    """Pull the tensor mapping out of an unpickled torch_geometric Data."""
    store = getattr(obj, "_store", None)
    if store is None:
        return None
    for value in store.__dict__.values():
        if isinstance(value, dict) and "x" in value:
            return value
    return None


@struct.dataclass
class Batch:
    """One (mini)batch of chips."""

    x: Array  # (B, T, H, W, C) float
    y: T.Optional[Array] = None  # (B, H, W) int, -1 = unlabeled (weak mask)
    bdist: T.Optional[Array] = None  # (B, H, W) float in [0, 1]
    lat: T.Optional[Array] = None  # (B,) chip-centroid latitude (degrees)
    lon: T.Optional[Array] = None  # (B,) chip-centroid longitude (degrees)
    left: T.Optional[Array] = None  # (B,) geo bounds
    bottom: T.Optional[Array] = None
    right: T.Optional[Array] = None
    top: T.Optional[Array] = None
    # Prediction-window bookkeeping (reference data/store.py:68-144)
    window_row_off: T.Optional[Array] = None  # (B,) int
    window_col_off: T.Optional[Array] = None
    window_height: T.Optional[Array] = None
    window_width: T.Optional[Array] = None
    window_pad_bottom: T.Optional[Array] = None
    window_pad_right: T.Optional[Array] = None
    # Host metadata (static; excluded from jit tracing)
    batch_id: T.Optional[T.Tuple[str, ...]] = struct.field(
        pytree_node=False, default=None
    )

    @property
    def num_samples(self) -> int:
        return self.x.shape[0]

    @property
    def num_time(self) -> int:
        return self.x.shape[1]

    @property
    def num_channels(self) -> int:
        return self.x.shape[-1]

    @property
    def height(self) -> int:
        return self.x.shape[2]

    @property
    def width(self) -> int:
        return self.x.shape[3]

    def with_centroids(self) -> "Batch":
        """Fill lat/lon from geo bounds centroids (reference
        datasets.py:490-498)."""
        if self.left is None:
            return self
        lon = (self.left + self.right) / 2.0
        lat = (self.bottom + self.top) / 2.0
        return self.replace(lat=lat, lon=lon)

    @property
    def is_packed(self) -> bool:
        """True when x carries int16 x 10000 records (chipstore v2 /
        reference int16 chips) awaiting on-device dequantization."""
        return jnp.issubdtype(jnp.asarray(self.x).dtype, jnp.integer)

    def dequantize(self, dtype=jnp.float32) -> "Batch":
        """Unpack int16 x 10000 records to float on the current device.

        jit-safe (dtype checks are trace-time static): transfer chips as
        int16 — half the host->HBM bytes of float32 — and pay the cheap
        elementwise dequant on the accelerator. No-op for float batches.
        """
        from .constant import SCALE_FACTOR

        out = self
        if jnp.issubdtype(jnp.asarray(out.x).dtype, jnp.integer):
            out = out.replace(
                x=out.x.astype(dtype) * jnp.asarray(1.0 / SCALE_FACTOR, dtype)
            )
        if out.bdist is not None and jnp.issubdtype(
            jnp.asarray(out.bdist).dtype, jnp.integer
        ):
            out = out.replace(
                bdist=out.bdist.astype(dtype)
                * jnp.asarray(1.0 / SCALE_FACTOR, dtype)
            )
        if out.y is not None:
            y = jnp.asarray(out.y)
            if y.dtype != jnp.int32:
                out = out.replace(y=y.astype(jnp.int32))
        return out

    # ------------------------------------------------------------------
    # xarray export (reference data/data.py:278-318 to_dataset)
    # ------------------------------------------------------------------

    def _dataset_payload(self, sample: int = 0) -> dict:
        """The data_vars/coords/attrs dict behind ``to_dataset`` with the
        reference's field names (bands/labels/distances over
        channel/time/y/x) — split out so the export contract is testable
        without xarray installed."""
        b = self.dequantize()
        x = np.asarray(b.x[sample])  # (T, H, W, C) float in [0, 1]
        bands = np.transpose(x, (3, 0, 1, 2))  # reference channel-first
        height, width = self.height, self.width
        if b.left is not None:
            left = float(np.asarray(b.left[sample]))
            bottom = float(np.asarray(b.bottom[sample]))
            right = float(np.asarray(b.right[sample]))
            top = float(np.asarray(b.top[sample]))
        else:
            left, bottom, right, top = 0.0, 0.0, float(width), float(height)
        res_y = (top - bottom) / height
        res_x = (right - left) / width
        data_vars = {"bands": (["channel", "time", "y", "x"], bands)}
        if b.y is not None:
            data_vars["labels"] = (["y", "x"], np.asarray(b.y[sample]))
        if b.bdist is not None:
            data_vars["distances"] = (
                ["y", "x"],
                np.asarray(b.bdist[sample]),
            )
        return dict(
            data_vars=data_vars,
            coords={
                "channel": list(range(1, self.num_channels + 1)),
                "time": list(range(1, self.num_time + 1)),
                "y": np.linspace(top, bottom, height),
                "x": np.linspace(left, right, width),
            },
            attrs={
                "name": (
                    self.batch_id[sample] if self.batch_id else "batch"
                ),
                "res": (abs(res_x), abs(res_y)),
                "_FillValue": -1,
            },
        )

    def to_dataset(self, sample: int = 0):
        """Export one sample as an ``xarray.Dataset`` with the reference's
        variable/coordinate names (data/data.py:278-318) for
        napari/xarray consumers. Requires xarray (not bundled — gated)."""
        try:
            import xarray as xr
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "Batch.to_dataset requires xarray (pip install xarray)"
            ) from exc
        return xr.Dataset(**self._dataset_payload(sample))

    # ------------------------------------------------------------------
    # Serialization: .npz native format + reference-compatible .pt reader
    # ------------------------------------------------------------------

    def to_file(
        self, path: T.Union[str, Path], compression: str = "zlib"
    ) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        payload = {}
        for name, value in self.__dict__.items():
            if value is None or name == "batch_id":
                continue
            payload[name] = np.asarray(value)
        if self.batch_id is not None:
            payload["batch_id"] = np.asarray(list(self.batch_id))
        # compression='none' trades disk for write speed (reference
        # args.yml compression knob; its joblib default is zlib too)
        save = np.savez if compression == "none" else np.savez_compressed
        save(path, **payload)

    @classmethod
    def from_file(cls, path: T.Union[str, Path]) -> "Batch":
        path = Path(path)
        if path.suffix == ".pt":
            return cls.from_reference_file(path)
        with np.load(path, allow_pickle=False) as data:
            kwargs = {}
            for name in data.files:
                if name == "batch_id":
                    kwargs["batch_id"] = tuple(str(s) for s in data[name])
                else:
                    # Keep leaves as host numpy arrays: the loading pipeline
                    # must not touch the accelerator (one device_put per
                    # collated batch, not one transfer per chip field).
                    kwargs[name] = data[name]
        return cls(**kwargs)

    _META_KEYS = (
        "left",
        "bottom",
        "right",
        "top",
        "window_row_off",
        "window_col_off",
        "window_height",
        "window_width",
        "window_pad_bottom",
        "window_pad_right",
    )

    @classmethod
    def read_meta(cls, path: T.Union[str, Path]) -> "Batch":
        """Metadata-only read: geo bounds + window geometry, never the
        (large, compressed) x/y/bdist arrays. npz member access is lazy, so
        this decompresses only the tiny scalar entries — the cheap path for
        centroid scans and scene-geometry scans over thousands of chips.
        Falls back to a full read for reference ``.pt`` chips (joblib blobs
        are monolithic)."""
        path = Path(path)
        if path.suffix == ".pt":
            full = cls.from_reference_file(path)
            return cls(
                x=np.zeros((full.num_samples, 0)),
                **{k: getattr(full, k) for k in cls._META_KEYS},
                batch_id=full.batch_id,
            )
        with np.load(path, allow_pickle=False) as data:
            kwargs = {
                name: data[name]
                for name in data.files
                if name in cls._META_KEYS
            }
            n = 1
            for key in cls._META_KEYS:
                if key in kwargs:
                    n = int(np.atleast_1d(kwargs[key]).shape[0])
                    break
            batch_id = None
            if "batch_id" in data.files:
                batch_id = tuple(str(s) for s in data["batch_id"])
        return cls(x=np.zeros((n, 0)), batch_id=batch_id, **kwargs)

    @classmethod
    def from_reference_file(cls, path: T.Union[str, Path]) -> "Batch":
        """Read a reference-framework joblib ``.pt`` chip (data/data.py:281-307)
        and convert to this framework's layout. Handles both the v2 dict
        format and v1-era torch_geometric graph chips (node-flattened
        (H*W, C*T) features) via an import shim — no torch_geometric needed."""
        import joblib

        _install_torch_geometric_shim()
        stored = joblib.load(path)
        if not isinstance(stored, (dict, T.Mapping)):
            stored = _extract_pyg_store(stored)
            if stored is None:
                raise ValueError(f"Unrecognized reference chip format: {path}")
            return cls.from_reference_pyg(stored, batch_id=(Path(path).name,))
        return cls.from_reference_dict(stored, batch_id=(Path(path).name,))

    @classmethod
    def from_reference_pyg(
        cls, store: T.Mapping, batch_id: T.Optional[T.Tuple[str, ...]] = None
    ) -> "Batch":
        """Convert a v1 node-format chip: x (H*W, C*T) band-major columns,
        y/bdist (H*W,) -> this framework's (1, T, H, W, C) layout."""
        height = int(store["height"])
        width = int(store["width"])
        ntime = int(store["ntime"])
        nbands = int(store["nbands"])

        x = np.asarray(store["x"], dtype="float32")
        assert x.shape == (height * width, ntime * nbands), (
            f"Unexpected node-feature shape {x.shape}"
        )
        # columns are (band, time) blocks: (hw, c*t) -> (t, h, w, c)
        x = x.reshape(height, width, nbands, ntime)
        x = np.transpose(x, (3, 0, 1, 2))[None]

        def img(key):
            if key not in store or store[key] is None:
                return None
            arr = np.asarray(store[key])
            return jnp.asarray(arr.reshape(1, height, width))

        scalar = lambda key: (
            jnp.asarray([np.float32(store[key])]) if key in store else None
        )

        return cls(
            x=jnp.asarray(x),
            y=img("y"),
            bdist=img("bdist"),
            left=scalar("left"),
            bottom=scalar("bottom"),
            right=scalar("right"),
            top=scalar("top"),
            batch_id=batch_id,
        )

    @classmethod
    def from_reference_dict(
        cls, stored: T.Mapping, batch_id: T.Optional[T.Tuple[str, ...]] = None
    ) -> "Batch":
        def grab(key):
            value = stored.get(key)
            if value is None:
                return None
            value = np.asarray(value)
            return value

        x = grab("x")  # (B, C, T, H, W)
        if x is None:
            raise ValueError("Reference chip has no 'x' tensor")
        x = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # -> (B, T, H, W, C)

        def arr(key):
            value = grab(key)
            return None if value is None else jnp.asarray(value)

        def scalar(key):
            value = grab(key)
            if value is None:
                return None
            return jnp.asarray(np.atleast_1d(np.asarray(value, dtype=np.float32)))

        stored_id = stored.get("batch_id")
        if batch_id is None and stored_id is not None:
            batch_id = tuple(str(s) for s in stored_id)

        return cls(
            x=x,
            y=arr("y"),
            bdist=arr("bdist"),
            left=scalar("left"),
            bottom=scalar("bottom"),
            right=scalar("right"),
            top=scalar("top"),
            window_row_off=arr("window_row_off"),
            window_col_off=arr("window_col_off"),
            window_height=arr("window_height"),
            window_width=arr("window_width"),
            window_pad_bottom=arr("window_pad_bottom"),
            window_pad_right=arr("window_pad_right"),
            batch_id=batch_id,
        )


def plot_batch(
    batch: Batch,
    sample: int = 0,
    out_path: T.Optional[T.Union[str, Path]] = None,
):
    """Quick-look figure: temporal-mean composite, labels, boundary
    distances (reference Data.plot, data/data.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(batch.x[sample])  # (T, H, W, C)
    composite = x.mean(axis=0)
    composite = composite[..., : min(3, composite.shape[-1])]
    composite = (composite - composite.min()) / max(
        float(composite.max() - composite.min()), 1e-9
    )

    num_panels = 1 + (batch.y is not None) + (batch.bdist is not None)
    fig, axes = plt.subplots(1, num_panels, figsize=(4 * num_panels, 4))
    axes = np.atleast_1d(axes)
    axes[0].imshow(composite.squeeze(), interpolation="nearest")
    axes[0].set_title("temporal mean")
    panel = 1
    if batch.y is not None:
        axes[panel].imshow(
            np.asarray(batch.y[sample]), interpolation="nearest", cmap="viridis"
        )
        axes[panel].set_title("labels")
        panel += 1
    if batch.bdist is not None:
        axes[panel].imshow(
            np.asarray(batch.bdist[sample]),
            interpolation="nearest",
            cmap="magma",
        )
        axes[panel].set_title("boundary distance")
    for ax in axes:
        ax.set_axis_off()
    fig.tight_layout()
    if out_path is not None:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return Path(out_path)
    return fig


def collate(batches: T.Sequence[Batch]) -> Batch:
    """Concatenate per-field along the batch axis (reference
    data/utils.py:20-68)."""
    fields = {}
    first = batches[0]
    for name, value in first.__dict__.items():
        if name == "batch_id":
            ids = [b.batch_id for b in batches if b.batch_id is not None]
            fields[name] = tuple(s for group in ids for s in group) or None
        elif value is None:
            fields[name] = None
        else:
            fields[name] = jnp.concatenate(
                [getattr(b, name) for b in batches], axis=0
            )
    return Batch(**fields)
