"""Large-scene sliding-window inference with on-device blending.

The reference writes each window's interior with the padding cropped off
(callbacks.py:135-227 — hard seams at window borders). Here overlapping
windows are BLENDED: each window carries a taper weight map (1.0 in the
interior, cosine ramp over the overlap), windows are accumulated into
scene-level weighted sums with jitted dynamic-slice updates on device, and
the final raster is the weight-normalized sum — seam-free and fully
accelerator-resident until the single final host transfer.

Output raster parity: 3 bands (distance, edge, crop) x 10000 as uint16
GeoTIFF with CRS + affine transform (reference callbacks.py:85-107, 220) —
via rasterio when importable, else the pure-python codec
(data/tiny_tiff.py) plus an npz sidecar.
"""

import typing as T
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


from .data.constant import SCALE_FACTOR
from .data.datasets import ChipDataset
from .data.loader import ChipLoader
from .enums import InferenceNames
from .train.step import TrainState, make_predict_step

Array = jax.Array

BAND_NAMES = (
    InferenceNames.DISTANCE,
    InferenceNames.EDGE,
    InferenceNames.CROP,
)


def taper_weights(
    window_size: int, padding: int, dtype=jnp.float32
) -> Array:
    """(S, S) blending weights, S = window_size + 2*padding: 1 in the
    interior, raised-cosine ramp to ~0 across the padded overlap."""
    size = window_size + 2 * padding
    if padding == 0:
        return jnp.ones((size, size), dtype=dtype)
    ramp = 0.5 - 0.5 * jnp.cos(
        jnp.pi * (jnp.arange(1, padding + 1) / (padding + 1))
    )
    profile = jnp.concatenate(
        [ramp, jnp.ones(window_size), ramp[::-1]]
    )
    weights = jnp.outer(profile, profile).astype(dtype)
    return jnp.maximum(weights, 1e-4)


def _accumulate_windows_impl(
    scene_sum: Array,  # (H, W, 3)
    scene_weight: Array,  # (H, W, 1)
    window_preds: Array,  # (B, S, S, 3)
    weights: Array,  # (S, S)
    row0s: Array,  # (B,) int32
    col0s: Array,  # (B,) int32
    valid: Array,  # (B,) float32 — 0 masks padded duplicate windows
):
    """Blend a whole batch of windows (sequential fori_loop: overlapping
    windows within a batch accumulate correctly). Plain function so the
    fused whole-scene program can inline it; the per-batch dispatch path
    uses the donating jitted wrapper below."""
    size = weights.shape[0]
    bands = scene_sum.shape[-1]

    def body(i, carry):
        ssum, sweight = carry
        w = weights * valid[i]
        weighted = window_preds[i] * w[..., None]
        start = (row0s[i], col0s[i], 0)
        tile_sum = jax.lax.dynamic_slice(ssum, start, (size, size, bands))
        ssum = jax.lax.dynamic_update_slice(ssum, tile_sum + weighted, start)
        tile_w = jax.lax.dynamic_slice(sweight, start, (size, size, 1))
        sweight = jax.lax.dynamic_update_slice(
            sweight, tile_w + w[..., None], start
        )
        return ssum, sweight

    return jax.lax.fori_loop(
        0, window_preds.shape[0], body, (scene_sum, scene_weight)
    )


_accumulate_windows = partial(jax.jit, donate_argnums=(0, 1))(
    _accumulate_windows_impl
)


class ScenePredictor:
    """Predict a full scene from overlapping window chips."""

    def __init__(
        self,
        state: TrainState,
        batch_size: int = 8,
        precision: str = "bf16",
        pallas_attention: T.Optional[bool] = None,
        devices: int = 1,
    ):
        on_tpu = jax.devices()[0].platform == "tpu"
        if not on_tpu:
            precision = "fp32"
        if pallas_attention is None:
            # 2.2x end-to-end predict throughput on TPU (measured; see
            # BASELINE.md) at ~15s extra compile — on by default there.
            pallas_attention = on_tpu
        if pallas_attention:
            from .ops.flags import set_pallas_natten

            set_pallas_natten(True)
        self.state = state
        self.devices = devices
        if devices > 1:
            # Windows shard over the data mesh; partial batches are padded
            # by repeating the last window (duplicates blend harmlessly —
            # identical predictions at identical offsets renormalize out).
            from .parallel import (
                create_mesh,
                make_sharded_predict_step,
                replicate_state,
                shard_batch,
            )

            if batch_size % devices:
                # Both sharded paths split the batch axis over the mesh;
                # round up so every device gets an equal slice (the extra
                # slots ride as repeated/invalid windows and renormalize
                # out of the blend).
                batch_size += devices - batch_size % devices
            mesh = create_mesh(num_devices=devices)
            self.state = replicate_state(state, mesh)
            self._mesh = mesh
            self._shard = lambda b: shard_batch(b, mesh)
            self.predict_step = make_sharded_predict_step(
                mesh, precision=precision
            )
        else:
            self._mesh = None
            self._shard = None
            self.predict_step = make_predict_step(precision=precision)
        self.batch_size = batch_size
        from .train.precision import resolve_dtype

        self._compute_dtype = resolve_dtype(precision)
        self._fused_cache: T.Dict[tuple, T.Callable] = {}

    def predict_windows(
        self, dataset: ChipDataset
    ) -> T.Tuple[np.ndarray, T.Tuple[int, int]]:
        """Run all window chips and blend on device; returns the stitched
        (H, W, 3) float raster in [0, 1]."""
        # Scene extent + window geometry from chip metadata. Header-only
        # reads (Batch.read_meta): the geometry scan never decompresses the
        # x arrays, so it is O(bytes of metadata), not O(bytes of scene).
        from .data.batch import Batch

        scene_h = scene_w = 0
        window_size = 0
        self._scene_bounds = None
        for path in dataset.files:
            b = Batch.read_meta(path)
            window_size = max(window_size, int(b.window_height[0]))
            scene_h = max(
                scene_h, int(b.window_row_off[0]) + int(b.window_height[0])
            )
            scene_w = max(
                scene_w, int(b.window_col_off[0]) + int(b.window_width[0])
            )
            if self._scene_bounds is None and b.left is not None:
                self._scene_bounds = (
                    float(b.left[0]),
                    float(b.bottom[0]),
                    float(b.right[0]),
                    float(b.top[0]),
                )
        chip_size = dataset.load_file(dataset.files[0]).x.shape[2]
        padding = (chip_size - window_size) // 2

        loader = ChipLoader(dataset, batch_size=self.batch_size)
        return self._blend_windows(
            loader, scene_h, scene_w, window_size, padding
        )

    def predict_scene(
        self,
        image_time_series: np.ndarray,  # (T, H, W, C)
        window_size: int = 100,
        padding: int = 20,
        gain: float = 1e-4,
        offset: float = 0.0,
        bounds: T.Optional[T.Tuple[float, float, float, float]] = None,
        fused: T.Optional[bool] = None,
    ) -> T.Tuple[np.ndarray, T.Tuple[int, int]]:
        """In-memory large-scene inference: windows are sliced from the
        scene on the fly, collapsing the reference's create-predict ->
        per-window .pt -> DataLoader -> predict flow (create.py:114-246 +
        callbacks.py:148-227) into one pass with no chip files. An int16
        x 10000 scene rides to the device packed (half the host->HBM
        bytes) and dequantizes inside the compiled step.

        ``fused`` (default): the whole scene is uploaded to HBM ONCE and
        the entire windowed predict — window gather (vmapped
        dynamic_slice), dequantize, forward, taper-blend accumulation,
        weight normalization — runs as ONE compiled ``lax.scan`` over
        window batches. Host traffic per scene is one scene upload + one
        raster readback; no per-window host slicing, no per-batch
        dispatches. On a multi-device mesh (``devices > 1``) the scene is
        replicated and each device runs its 1/n slice of every window
        batch under ``shard_map``, blending into a device-local buffer;
        a single ``psum`` over the data axis (one ICI collective per
        scene) merges the partial blends. ``fused=False`` falls back to
        per-batch host window slicing (sharded over the mesh when
        ``devices > 1``)."""
        from .data.create import (
            _slice_window,
            iter_window_jobs,
            prepare_image_time_series,
        )
        from .data.batch import Batch

        x = np.asarray(image_time_series)
        packed = (
            np.issubdtype(x.dtype, np.integer)
            and gain == 1e-4
            and offset == 0.0
        )
        if packed:
            x = x.astype(np.int16, copy=False)
        else:
            x = prepare_image_time_series(
                x, gain=gain, offset=offset, fill_zeros=False
            )
            # ChipDataset._scale parity: the file path clips loaded chips
            # to [1e-9, 1] before the forward pass (datasets.py _scale)
            x = np.clip(x, 1e-9, 1.0)
        _, scene_h, scene_w, _ = x.shape
        size = window_size + 2 * padding
        jobs = list(iter_window_jobs(scene_h, scene_w, window_size, padding))
        # The file path stamps the scene bounds on every window and derives
        # lat/lon centroids from them (BatchStore.write_window +
        # Batch.with_centroids); GeoEmbeddings consume those, so match it.
        left, bottom, right, top = (
            bounds if bounds is not None else (0.0, 0.0, 1.0, 1.0)
        )

        if fused is None:
            fused = True
        if fused:
            self._scene_bounds = bounds
            return self._predict_scene_fused(
                x,
                scene_h,
                scene_w,
                window_size,
                padding,
                jobs,
                (left, bottom, right, top),
            )

        def batches():
            for i in range(0, len(jobs), self.batch_size):
                chunk = jobs[i : i + self.batch_size]
                windows = []
                for job in chunk:
                    w = _slice_window(x, job)
                    pad_b = size - w.shape[1]
                    pad_r = size - w.shape[2]
                    if pad_b > 0 or pad_r > 0:
                        w = np.pad(
                            w, ((0, 0), (0, pad_b), (0, pad_r), (0, 0))
                        )
                    windows.append(w)
                n = len(chunk)
                yield Batch(
                    x=np.stack(windows),
                    left=np.full(n, left, dtype="float32"),
                    bottom=np.full(n, bottom, dtype="float32"),
                    right=np.full(n, right, dtype="float32"),
                    top=np.full(n, top, dtype="float32"),
                    window_row_off=np.asarray(
                        [j["row_off"] for j in chunk], dtype="int32"
                    ),
                    window_col_off=np.asarray(
                        [j["col_off"] for j in chunk], dtype="int32"
                    ),
                    window_height=np.asarray(
                        [j["window_height"] for j in chunk], dtype="int32"
                    ),
                    window_width=np.asarray(
                        [j["window_width"] for j in chunk], dtype="int32"
                    ),
                ).with_centroids()

        self._scene_bounds = bounds
        return self._blend_windows(
            batches(), scene_h, scene_w, window_size, padding
        )

    def _predict_scene_fused(
        self,
        x: np.ndarray,  # (T, H, W, C) int16-packed or prepared float32
        scene_h: int,
        scene_w: int,
        window_size: int,
        padding: int,
        jobs: T.List[dict],
        bounds: T.Tuple[float, float, float, float],
    ) -> T.Tuple[np.ndarray, T.Tuple[int, int]]:
        """Whole-scene predict as one compiled program (see predict_scene).

        The TPU-native inversion of the reference's chip-file pipeline
        (create.py:114-246 + callbacks.py:148-227): instead of streaming
        window chips host->device, the scene lives in HBM and windows are
        gathered in-step, so the per-window host slicing, the ~2x overlap
        retransmission, and every intermediate dispatch disappear.
        """
        batch = self.batch_size
        n_batches = -(-len(jobs) // batch)
        total = n_batches * batch
        row0 = np.zeros(total, np.int32)
        col0 = np.zeros(total, np.int32)
        valid = np.zeros(total, np.float32)
        for i, job in enumerate(jobs):
            row0[i] = job["row_off"]
            col0[i] = job["col_off"]
            valid[i] = 1.0
        left, bottom, right, top = bounds
        # Scene-wide centroid for every window (Batch.with_centroids on the
        # scene bounds — the non-fused in-memory path stamps the same).
        lat = np.float32((bottom + top) / 2.0)
        lon = np.float32((left + right) / 2.0)

        key = (
            x.shape,
            np.dtype(x.dtype).str,
            window_size,
            padding,
            batch,
            self.devices,
        )
        fn = self._fused_cache.get(key)
        if fn is None:
            fn = self._build_fused_scene_fn(
                scene_h, scene_w, window_size, padding, batch
            )
            self._fused_cache[key] = fn
        raster = fn(
            self.state,
            x,
            row0.reshape(n_batches, batch),
            col0.reshape(n_batches, batch),
            valid.reshape(n_batches, batch),
            jnp.asarray(lat),
            jnp.asarray(lon),
        )
        return np.asarray(raster), (scene_h, scene_w)

    def _build_fused_scene_fn(
        self,
        scene_h: int,
        scene_w: int,
        window_size: int,
        padding: int,
        batch_size: int,
    ) -> T.Callable:
        from .data.batch import Batch
        from .train.step import _inference_apply

        pad = padding
        size = window_size + 2 * pad
        compute_dtype = self._compute_dtype
        # Padded-scene coords: scene pixel (r, c) -> (r + pad, c + pad);
        # the window at scene offset row_off starts its padded read at
        # row_off - pad, i.e. padded coord row_off. Extent covers the
        # largest edge-window read plus its bottom/right zero fill.
        buf_h = scene_h + 2 * pad + size
        buf_w = scene_w + 2 * pad + size
        mesh = self._mesh
        # Single program: the whole window batch. Under shard_map: each
        # device's 1/n slice of every batch.
        local_b = batch_size if mesh is None else batch_size // self.devices

        def run(state, scene, row0s, col0s, valids, lat, lon):
            scene_p = jnp.pad(
                scene,
                (
                    (0, 0),
                    (pad, buf_h - pad - scene_h),
                    (pad, buf_w - pad - scene_w),
                    (0, 0),
                ),
            )
            weights = taper_weights(window_size, pad)
            scene_sum = jnp.zeros((buf_h, buf_w, 3))
            scene_weight = jnp.zeros((buf_h, buf_w, 1))
            if mesh is not None:
                # Under shard_map the blend buffers become device-varying
                # (each device accumulates its own window slice); mark the
                # initial zeros varying so the scan carry types line up.
                scene_sum = jax.lax.pcast(
                    scene_sum, mesh.axis_names[0], to="varying"
                )
                scene_weight = jax.lax.pcast(
                    scene_weight, mesh.axis_names[0], to="varying"
                )
            lat_b = jnp.full((local_b,), lat, jnp.float32)
            lon_b = jnp.full((local_b,), lon, jnp.float32)
            t_dim, c_dim = scene_p.shape[0], scene_p.shape[3]

            def gather(r, c):
                return jax.lax.dynamic_slice(
                    scene_p, (0, r, c, 0), (t_dim, size, size, c_dim)
                )

            def body(carry, job):
                ssum, sweight = carry
                r0, c0, valid = job
                xw = jax.vmap(gather)(r0, c0)  # (B, T, S, S, C)
                outputs = _inference_apply(
                    state, Batch(x=xw, lat=lat_b, lon=lon_b), compute_dtype
                )
                preds = jnp.concatenate(
                    [outputs[name] for name in BAND_NAMES], axis=-1
                )
                ssum, sweight = _accumulate_windows_impl(
                    ssum, sweight, preds, weights, r0, c0, valid
                )
                return (ssum, sweight), None

            (scene_sum, scene_weight), _ = jax.lax.scan(
                body, (scene_sum, scene_weight), (row0s, col0s, valids)
            )
            if mesh is not None:
                # One collective per scene: merge the device-local partial
                # blends over ICI (scene and state are replicated; only the
                # window slices differ per device).
                scene_sum = jax.lax.psum(scene_sum, mesh.axis_names[0])
                scene_weight = jax.lax.psum(
                    scene_weight, mesh.axis_names[0]
                )
            blended = scene_sum / (scene_weight + 1e-8)
            return blended[pad : pad + scene_h, pad : pad + scene_w]

        if mesh is None:
            return jax.jit(run)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        sharded_run = shard_map(
            run,
            mesh=mesh,
            in_specs=(
                P(),  # state (replicated pytree)
                P(),  # scene (replicated in HBM on every device)
                P(None, axis),  # row0s: batch dim split over devices
                P(None, axis),  # col0s
                P(None, axis),  # valids
                P(),  # lat
                P(),  # lon
            ),
            out_specs=P(),
        )
        return jax.jit(sharded_run)

    def _blend_windows(
        self,
        batches: T.Iterable,
        scene_h: int,
        scene_w: int,
        window_size: int,
        padding: int,
    ) -> T.Tuple[np.ndarray, T.Tuple[int, int]]:
        pad = padding
        size = window_size + 2 * pad
        weights = taper_weights(window_size, pad)

        # Buffer coords = scene coords + pad, so the padded window starting
        # at scene row (row_off - pad) lands at buffer row row_off >= 0.
        buf_h = scene_h + 2 * pad + size
        buf_w = scene_w + 2 * pad + size
        scene_sum = jnp.zeros((buf_h, buf_w, 3))
        scene_weight = jnp.full((buf_h, buf_w, 1), 1e-8)

        for batch in batches:
            real_count = batch.num_samples
            if self._shard is not None:
                remainder = batch.num_samples % self.devices
                if remainder:
                    # Pad to a shardable size by repeating the last window;
                    # padded entries are masked out of accumulation below
                    # (their duplicate taper weight would skew the blend
                    # wherever windows overlap).
                    pad_count = self.devices - remainder
                    batch = jax.tree_util.tree_map(
                        lambda leaf: jnp.concatenate(
                            [leaf] + [leaf[-1:]] * pad_count, axis=0
                        ),
                        batch,
                    )
                batch = self._shard(batch)
            outputs = self.predict_step(self.state, batch)
            preds = jnp.concatenate(
                [outputs[name] for name in BAND_NAMES], axis=-1
            )  # (B, S, S, 3)
            # One accumulation dispatch per batch (padded duplicates get
            # zero valid-weight); window top-left in padded scene coords.
            valid = (
                jnp.arange(preds.shape[0]) < real_count
            ).astype(jnp.float32)
            scene_sum, scene_weight = _accumulate_windows(
                scene_sum,
                scene_weight,
                preds,
                weights,
                jnp.asarray(batch.window_row_off, dtype=jnp.int32),
                jnp.asarray(batch.window_col_off, dtype=jnp.int32),
                valid,
            )

        blended = scene_sum / scene_weight
        # Scene pixel (r, c) lives at buffer (r + pad, c + pad).
        result = np.asarray(
            blended[pad : pad + scene_h, pad : pad + scene_w]
        )
        return result, (scene_h, scene_w)

    def predict_to_raster(
        self,
        dataset: ChipDataset,
        out_path: T.Union[str, Path],
        reference_profile: T.Optional[dict] = None,
        crs: T.Optional[str] = None,
        reference_image: T.Optional[T.Union[str, Path]] = None,
    ) -> Path:
        """Stitch and write the 3-band uint16 x 10000 raster.

        Georeferencing (reference callbacks.py:85-107): the affine transform
        is derived from the scene bounds the window chips carry, ``crs``
        (e.g. "EPSG:32633") comes from the scene manifest or the caller;
        both land in the GeoTIFF profile — or in the ``.npz`` fallback as
        ``bounds`` / ``transform`` / ``crs`` entries.

        ``reference_image``: derive the output profile (bounds + CRS) from
        a source GeoTIFF instead — the reference's ``reference_image`` ->
        ``LightningGTiffWriter`` flow (callbacks.py:85-107), read via
        rasterio or the pure-python GeoKey parser.
        """
        ref_bounds = None
        if reference_image is not None:
            from .data.geotiff import read_tiff_band

            _, ref_bounds, _, ref_crs = read_tiff_band(reference_image)
            if crs is None:
                crs = ref_crs

        raster, (scene_h, scene_w) = self.predict_windows(dataset)
        packed = np.clip(raster * SCALE_FACTOR, 0, 65535).astype("uint16")
        packed = np.moveaxis(packed, -1, 0)  # (3, H, W)

        bounds = getattr(self, "_scene_bounds", None)
        if ref_bounds is not None:
            bounds = ref_bounds
        transform_gdal = None
        if bounds is not None:
            left, bottom, right, top = bounds
            res_x = (right - left) / scene_w
            res_y = (top - bottom) / scene_h
            # GDAL-order affine: (c, a, b, f, d, e) as rasterio Affine args
            transform_gdal = (res_x, 0.0, left, 0.0, -res_y, top)

        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)

        from .utils.locks import file_lock

        with file_lock(out_path):
            try:
                import rasterio

                profile = dict(
                    driver="GTiff",
                    height=scene_h,
                    width=scene_w,
                    count=3,
                    dtype="uint16",
                    compress="lzw",
                )
                if transform_gdal is not None:
                    profile["transform"] = rasterio.Affine(*transform_gdal)
                if crs is not None:
                    profile["crs"] = rasterio.crs.CRS.from_string(str(crs))
                if reference_profile:
                    profile.update(reference_profile)
                with rasterio.open(out_path, "w", **profile) as dst:
                    dst.write(packed)
            except ImportError:
                # No rasterio: write a REAL 3-band GeoTIFF with the
                # pure-python codec, plus an npz sidecar (compact container
                # with band names + geo metadata for numpy consumers).
                from .data.tiny_tiff import write_tiff

                write_tiff(out_path, packed, bounds=bounds, crs=crs)
                extras = {}
                if bounds is not None:
                    extras["bounds"] = np.asarray(bounds, dtype="float64")
                    extras["transform"] = np.asarray(
                        transform_gdal, dtype="float64"
                    )
                if crs is not None:
                    extras["crs"] = np.asarray(str(crs))
                np.savez_compressed(
                    out_path.with_suffix(".npz"),
                    raster=packed,
                    band_names=np.asarray([str(b) for b in BAND_NAMES]),
                    **extras,
                )
        return out_path
