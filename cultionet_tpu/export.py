"""Ahead-of-time model export for serving (StableHLO via ``jax.export``).

The reference has no deployment path: serving a trained model means
installing the full training stack (torch + Lightning + natten) on the
serving host and rebuilding the LightningModule from a ``.ckpt``
(reference model.py:331-404, callbacks.py:148-227). Here the complete
predict program — int16 dequantize -> z-score normalization -> CultioNet
forward -> sigmoid/softmax heads — is exported ONCE as a versioned,
self-contained StableHLO artifact:

* model parameters, batch stats, and normalization statistics are baked
  into the program as constants — the serving host needs the artifact
  file and ``jax``, nothing else (no model code, no checkpoint store,
  no norm sidecar);
* the input contract is the wire format (int16 x 10000 chips, half the
  bytes of float32) plus the (B,) chip-centroid lat/lon vectors;
* the program is compiled for an explicit target platform list, with
  kernel dispatch (Pallas vs XLA) following the *target* platform, not
  the exporting host's backend: a pure-TPU target bakes the fast Mosaic
  kernels, any other target list bakes portable XLA-only programs.

``export_predictor`` / ``load_predictor`` are the file-level API; the
CLI exposes them as ``cultionet-tpu export``.
"""

import datetime
import json
import typing as T
import zipfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .data.batch import Batch
from .enums import InferenceNames
from .ops.flags import force_kernel_platform
from .train.precision import cast_floating, resolve_dtype
from .utils.logging import set_color_logger

logger = set_color_logger(__name__)

# Bump when the serve-fn calling convention (inputs/outputs) changes.
SERVE_ABI_VERSION = 1

# The serve program must sanitize wire inputs exactly like the training /
# predict pipeline (ChipDataset._scale, data/datasets.py:102-112,142):
# negative nodata sentinels and >10000 int16 values are clipped, not fed
# to the model.
CLIP_MIN = 1e-9
CLIP_MAX = 1.0

_PROGRAM_NAME = "program.bin"
_META_NAME = "meta.json"

OUTPUT_NAMES = (
    str(InferenceNames.DISTANCE),
    str(InferenceNames.EDGE),
    str(InferenceNames.CROP),
)


def build_serve_fn(
    state,
    norm_mean: T.Optional[np.ndarray] = None,
    norm_std: T.Optional[np.ndarray] = None,
    precision: str = "bf16",
    log_transform: bool = False,
) -> T.Callable:
    """Close the full predict program over a trained state.

    ``serve_fn(x, lat, lon)`` takes int16 (B, T, H, W, C) chips scaled by
    10,000 (the on-disk / wire format) and returns float32
    ``(distance, edge, crop)`` rasters. Params and norm stats are
    captured as closure constants so ``jax.export`` serializes them into
    the program. Input sanitization mirrors the dataset pipeline exactly
    (data/datasets.py:139-162): dequantize -> clip -> optional Dynamic
    World log transform -> z-score normalization.
    """
    compute_dtype = resolve_dtype(precision)
    run_params = cast_floating(state.params, compute_dtype)
    run_stats = cast_floating(state.batch_stats, compute_dtype)
    apply_fn = state.apply_fn
    mean = None if norm_mean is None else np.asarray(norm_mean, np.float32)
    std = None if norm_std is None else np.asarray(norm_std, np.float32)

    def serve_fn(x, lat, lon):
        batch = Batch(x=x, lat=lat, lon=lon).dequantize()
        vals = jnp.clip(batch.x, CLIP_MIN, CLIP_MAX)
        if log_transform:
            vals = jnp.maximum(jnp.log(vals * 50.0 + 1.0), CLIP_MIN)
        if mean is not None:
            m = jnp.asarray(mean, vals.dtype)
            s = jnp.asarray(std, vals.dtype)
            vals = (vals - m) / s
        batch = batch.replace(x=vals.astype(compute_dtype))
        outputs = apply_fn(
            {"params": run_params, "batch_stats": run_stats},
            batch,
            training=False,
        )
        return tuple(
            outputs[name].astype(jnp.float32) for name in OUTPUT_NAMES
        )

    return serve_fn


def export_state(
    state,
    out_file: T.Union[str, Path],
    *,
    in_time: int,
    in_channels: int,
    batch_size: int = 8,
    chip_size: int = 100,
    precision: str = "bf16",
    norm_mean: T.Optional[np.ndarray] = None,
    norm_std: T.Optional[np.ndarray] = None,
    log_transform: bool = False,
    platforms: T.Optional[T.Sequence[str]] = None,
    extra_meta: T.Optional[dict] = None,
) -> Path:
    """Export a trained state as a serving artifact (zip archive).

    The archive holds the serialized StableHLO program plus a JSON
    manifest of the calling convention. Shapes are static (the TPU
    compilation model): one artifact per (batch, chip) geometry; export
    several if the serving tier mixes geometries.
    """
    if platforms is None:
        platforms = [jax.default_backend()]
    serve_fn = build_serve_fn(
        state,
        norm_mean=norm_mean,
        norm_std=norm_std,
        precision=precision,
        log_transform=log_transform,
    )
    x_spec = jax.ShapeDtypeStruct(
        (batch_size, in_time, chip_size, chip_size, in_channels), jnp.int16
    )
    coord_spec = jax.ShapeDtypeStruct((batch_size,), jnp.float32)
    # Kernel dispatch must follow the *target* platform list, not the
    # exporting host's backend: Mosaic custom calls only run on TPU, and
    # a multi-platform artifact has to stay XLA-only.
    kernel_target = "tpu" if list(platforms) == ["tpu"] else "cpu"

    def _export_with(target: str):
        with force_kernel_platform(target):
            return jax.export.export(
                jax.jit(serve_fn), platforms=list(platforms)
            )(x_spec, coord_spec, coord_spec)

    try:
        exported = _export_with(kernel_target)
    except Exception as exc:
        if kernel_target != "tpu":
            raise
        # Mosaic custom calls may be rejected by jax.export's stability
        # checks depending on the jax version; the XLA-only program is
        # portable and always exportable.
        logger.warning(
            f"Pallas kernels not exportable ({type(exc).__name__}: {exc}); "
            "falling back to an XLA-only program"
        )
        kernel_target = "cpu"
        exported = _export_with(kernel_target)

    meta = {
        "abi_version": SERVE_ABI_VERSION,
        "platforms": list(platforms),
        "kernels": "pallas" if kernel_target == "tpu" else "xla",
        "precision": precision,
        "inputs": {
            "x": {"shape": list(x_spec.shape), "dtype": "int16",
                  "scale": 10000, "clip": [CLIP_MIN, CLIP_MAX]},
            "lat": {"shape": [batch_size], "dtype": "float32"},
            "lon": {"shape": [batch_size], "dtype": "float32"},
        },
        "coords": (
            "required: the model embeds chip-centroid lat/lon on the unit "
            "sphere (GeoEmbeddings); (0, 0) is a real location, not a null"
        ),
        "outputs": list(OUTPUT_NAMES),
        "normalized": norm_mean is not None,
        "log_transform": bool(log_transform),
        "created": datetime.datetime.now().isoformat(timespec="seconds"),
    }
    if extra_meta:
        meta.update(extra_meta)

    out_path = Path(out_file)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_PROGRAM_NAME, bytes(exported.serialize()))
        zf.writestr(_META_NAME, json.dumps(meta, indent=2))
    return out_path


def export_predictor(
    ckpt_dir: T.Union[str, Path],
    out_file: T.Union[str, Path],
    *,
    batch_size: int = 8,
    chip_size: int = 100,
    precision: str = "bf16",
    which: str = "best",
    norm_file: T.Optional[T.Union[str, Path]] = None,
    log_transform: T.Optional[bool] = None,
    allow_unnormalized: bool = False,
    platforms: T.Optional[T.Sequence[str]] = None,
) -> Path:
    """Load a checkpoint store + norm sidecar and export it for serving.

    The exported program must reproduce the training-time input pipeline
    exactly, so the two data-pipeline flags are resolved defensively:

    * ``log_transform``: taken from the checkpoint's recorded hyperparams
      (fit.py persists it); ``None`` with a checkpoint that predates the
      record is an error — serving a log-trained model without the
      transform produces silent garbage.
    * missing norm stats: an error unless the checkpoint records that the
      model was trained unnormalized, or ``allow_unnormalized=True``
      explicitly accepts exporting a z-score-less program.
    """
    from .model import _load_state
    from .utils.normalize import NormValues

    state, _, meta = _load_state(Path(ckpt_dir), which=which)
    hp = dict(meta.get("hyperparams", {}))

    if log_transform is None:
        if "log_transform" in hp:
            log_transform = bool(hp["log_transform"])
        else:
            raise ValueError(
                "This checkpoint predates log_transform tracking, so the "
                "training-time input pipeline is unknown. Re-export with an "
                "explicit choice: --log-transform yes|no "
                "(log_transform=True/False)."
            )
    elif "log_transform" in hp and bool(hp["log_transform"]) != bool(
        log_transform
    ):
        # An explicit choice that contradicts the recorded training
        # pipeline would serve garbage with no diagnostic — exactly the
        # failure class the auto mode exists to prevent.
        raise ValueError(
            f"Explicit log_transform={bool(log_transform)} contradicts the "
            f"checkpoint's recorded training pipeline "
            f"(log_transform={bool(hp['log_transform'])}). Drop the flag "
            "(auto uses the recorded value) or re-train with the pipeline "
            "you want to serve."
        )

    norm_mean = norm_std = None
    if norm_file is not None and Path(norm_file).is_file():
        norm = NormValues.from_file(norm_file)
        norm_mean, norm_std = norm.dataset_mean, norm.dataset_std
    if norm_mean is not None and hp.get("normalized_input") is False:
        # The checkpoint is authoritative: this model trained on RAW
        # inputs, so a (stale) norm sidecar from an earlier run in the
        # same project must not be baked in.
        logger.warning(
            f"Ignoring norm sidecar {norm_file}: the checkpoint records "
            "unnormalized training input (normalized_input=False) — "
            "baking z-score normalization would diverge from the "
            "training pipeline. Exporting unnormalized."
        )
        norm_mean = norm_std = None
    if norm_mean is None and hp.get("normalized_input") is not False:
        # Either the model was norm-trained (normalized_input=True) or the
        # checkpoint predates the record — silently baking no normalization
        # would serve garbage for a norm-trained model.
        msg = (
            f"No normalization sidecar found (norm_file={norm_file}); the "
            "checkpoint "
            + (
                "records normalized training input"
                if hp.get("normalized_input")
                else "does not record whether training input was normalized"
            )
            + ". Exporting without z-score normalization diverges from the "
            "training pipeline."
        )
        if not allow_unnormalized:
            raise ValueError(
                msg + " Pass --allow-unnormalized (allow_unnormalized=True) "
                "to export anyway."
            )
        logger.warning(msg + " Proceeding because allow_unnormalized=True.")
    return export_state(
        state,
        out_file,
        in_time=int(hp.get("in_time", 12)),
        in_channels=int(hp.get("in_channels", 3)),
        batch_size=batch_size,
        chip_size=chip_size,
        precision=precision,
        norm_mean=norm_mean,
        norm_std=norm_std,
        log_transform=log_transform,
        platforms=platforms,
        extra_meta={"hyperparams": {
            k: v for k, v in hp.items()
            if isinstance(v, (int, float, str, bool, list, type(None)))
        }},
    )


class ExportedPredictor:
    """A loaded serving artifact: ``pred(x, lat, lon) -> dict`` of float32
    numpy rasters. Needs only jax — no cultionet_tpu model code runs."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self.batch_size = int(meta["inputs"]["x"]["shape"][0])

    def __call__(
        self,
        x: np.ndarray,
        lat: T.Optional[np.ndarray] = None,
        lon: T.Optional[np.ndarray] = None,
        *,
        fill_coords: bool = False,
    ) -> T.Dict[str, np.ndarray]:
        b = x.shape[0]
        if (lat is None or lon is None) and not fill_coords:
            raise ValueError(
                "lat/lon chip centroids are required: the model embeds "
                "coordinates on the unit sphere (GeoEmbeddings, "
                "models/unet_parts.py) and (0, 0) is a real location — "
                "zero-filling silently skews predictions for models with "
                "learned geographic priors. Pass fill_coords=True to "
                "explicitly serve with zero coordinates."
            )
        if lat is None:
            lat = np.zeros((b,), np.float32)
        if lon is None:
            lon = np.zeros((b,), np.float32)
        outs = self._exported.call(
            np.asarray(x, np.int16),
            np.asarray(lat, np.float32),
            np.asarray(lon, np.float32),
        )
        return {
            name: np.asarray(val)
            for name, val in zip(self.meta["outputs"], outs)
        }

    def call_on_device(self, x, lat, lon):
        """Run the program on already-device-resident arrays and return the
        raw device output tuple (no host conversion, no zero-fill) — the
        serving hot path, and the public surface benchmarks time."""
        return self._exported.call(x, lat, lon)


def load_predictor(path: T.Union[str, Path]) -> ExportedPredictor:
    with zipfile.ZipFile(Path(path)) as zf:
        meta = json.loads(zf.read(_META_NAME).decode())
        if meta.get("abi_version") != SERVE_ABI_VERSION:
            raise ValueError(
                f"Artifact ABI {meta.get('abi_version')} != "
                f"supported {SERVE_ABI_VERSION}"
            )
        exported = jax.export.deserialize(bytearray(zf.read(_PROGRAM_NAME)))
    return ExportedPredictor(exported, meta)
