"""The cultionet-tpu command line interface.

Capability parity with the reference CLI (scripts/cultionet.py:793-984 +
args.yml): subcommands create / create-predict / train / train-transfer /
predict / predict-transfer / skfoldcv / version; the argument tree is built
from a declarative YAML spec (scripts/args.yml); every invocation is archived
as JSON under ``<project>/commands/``; class metadata persists to
``data/classes.info``.

Scene inputs are geo-free by default: each region directory under
``<project>/time_series_vars/<region>/`` holds ``scene.npz`` (arrays ``x``
(T, H, W, C), ``bounds`` (4,), ``cell_res`` ()) and optionally
``polygons.json`` ([[ring coords], class_value] pairs). A rasterio-gated
GeoTIFF reader can populate the same structure when geo libraries exist.
"""

import argparse
import datetime
import json
import sys
import typing as T
from pathlib import Path

import numpy as np
import yaml

from .. import __version__
from ..config import CultionetParams
from ..data.create import (
    _fork_available,
    create_predict_dataset,
    create_train_batch,
)
from ..data.datasets import ChipDataset
from ..data.loader import ChipLoader
from ..enums import CLISteps, Destinations, ModelNames
from ..utils.logging import set_color_logger
from ..utils.normalize import NormValues
from ..utils.project_paths import ProjectPaths, setup_paths

logger = set_color_logger("cultionet_tpu")

ARGS_SPEC = Path(__file__).parent / "args.yml"

SUBCOMMAND_GROUPS = {
    CLISteps.CREATE: ["shared_project", "shared_dates", "shared_create"],
    CLISteps.CREATE_PREDICT: [
        "shared_project",
        "shared_dates",
        "shared_create",
        "create_predict",
    ],
    CLISteps.TRAIN: ["shared_project", "shared_model", "train"],
    CLISteps.TRAIN_TRANSFER: [
        "shared_project",
        "shared_model",
        "train",
        "transfer",
    ],
    CLISteps.PREDICT: ["shared_project", "shared_dates", "predict"],
    CLISteps.PREDICT_TRANSFER: ["shared_project", "shared_dates", "predict"],
    CLISteps.SKFOLDCV: ["shared_project", "shared_model", "train", "skfoldcv"],
    CLISteps.IMPORT_TORCH: ["shared_project", "shared_model", "import_torch"],
    CLISteps.EXPORT: ["shared_project", "export"],
    CLISteps.VERSION: [],
}


def build_parser() -> argparse.ArgumentParser:
    spec = yaml.safe_load(ARGS_SPEC.read_text())
    parser = argparse.ArgumentParser(
        prog="cultionet-tpu",
        description=(
            "TPU-native crop-field boundary segmentation from satellite "
            "image time series"
        ),
    )
    subparsers = parser.add_subparsers(dest="command", required=True)
    for command, groups in SUBCOMMAND_GROUPS.items():
        sub = subparsers.add_parser(str(command))
        for group in groups:
            for name, arg in spec[group].items():
                kwargs = dict(arg.get("kwargs", {}))
                if "type" in kwargs and isinstance(kwargs["type"], str):
                    kwargs["type"] = {"int": int, "float": float}[
                        kwargs["type"]
                    ]
                sub.add_argument(*arg["flags"], dest=name, **kwargs)
    return parser


def log_command(ppaths: ProjectPaths, args: argparse.Namespace) -> None:
    """Archive the invocation (reference scripts/cultionet.py:951-962)."""
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S-%f")
    payload = {
        "command": " ".join(sys.argv),
        "args": {
            k: (str(v) if isinstance(v, Path) else v)
            for k, v in vars(args).items()
        },
        "version": __version__,
    }
    (ppaths.commands_path / f"{args.command}_{stamp}.json").write_text(
        json.dumps(payload, indent=2)
    )


def read_project_config(ppaths: ProjectPaths) -> dict:
    """Optional <project>/config.yml: image_vis, region lists, seasonal
    window (reference scripts/config.yml + open_config, cultionet.py:43)."""
    cfg_file = Path(ppaths.project_path) / "config.yml"
    if not cfg_file.is_file():
        return {}
    loaded = yaml.safe_load(cfg_file.read_text()) or {}
    return loaded if isinstance(loaded, dict) else {}


def load_scene(
    region_path: Path,
    window: T.Optional[dict] = None,
    ref_res: T.Optional[float] = None,
    resampling: str = "nearest",
    date_format: T.Optional[str] = None,
    class_column: T.Optional[str] = None,
    replace_dict: T.Optional[T.Dict[int, int]] = None,
    feature_pattern: T.Optional[str] = None,
    image_vis: T.Optional[T.Sequence[str]] = None,
    skip_index: int = 0,
) -> T.Tuple[np.ndarray, tuple, float, T.Optional[str], T.Optional[list]]:
    """Load a region scene: scene.npz (+ polygons.json). Falls back to the
    GeoTIFF time-series reader (data/geotiff.py — rasterio or pure-python).
    ``crs`` (e.g. "EPSG:32633") propagates to the output raster profile at
    predict time; ``window`` carries the seasonal tif window
    (end_year/start_mmdd/end_mmdd/num_months) when reading from tifs;
    ``ref_res``/``resampling`` resample mixed-resolution bands onto one
    grid (reference create.py:568-570)."""
    scene_file = region_path / "scene.npz"
    crs = None
    if scene_file.is_file():
        with np.load(scene_file, allow_pickle=False) as data:
            x = data["x"]
            bounds = tuple(float(v) for v in data["bounds"])
            cell_res = float(data["cell_res"])
            if "crs" in data.files:
                crs = str(data["crs"])
    else:
        from ..data.geotiff import read_time_series

        var_dirs = None
        if feature_pattern:
            # Reference feature_pattern ('{region}/brdf_ts/ms/{image_vi}',
            # args.yml feature_pattern): variable dirs resolved per
            # vegetation index relative to the imagery root.
            root = region_path.parent
            var_dirs = [
                root
                / feature_pattern.format(
                    region=region_path.name, image_vi=vi
                )
                for vi in (image_vis or [])
            ]
            if not var_dirs:
                raise ValueError(
                    "--feature-pattern requires image_vis in config.yml"
                )
        x, bounds, cell_res, crs = read_time_series(
            region_path,
            ref_res=ref_res,
            resampling=resampling,
            date_format=date_format,
            var_dirs=var_dirs,
            skip_index=skip_index,
            **(window or {}),
        )

    from ..data.vector import read_region_polygons

    polygons = read_region_polygons(
        region_path,
        bounds=bounds,
        project_path=region_path.parent.parent,
        class_column=class_column,
        replace_dict=replace_dict,
    )
    return x, bounds, cell_res, crs, polygons


def scene_crs(ppaths: ProjectPaths, region: T.Optional[str]) -> T.Optional[str]:
    """The region's CRS from its scene manifest, if recorded."""
    if not region:
        return None
    scene_file = ppaths.image_path / region / "scene.npz"
    if not scene_file.is_file():
        return None
    with np.load(scene_file, allow_pickle=False) as data:
        if "crs" in data.files:
            return str(data["crs"])
    return None


def iter_regions(
    ppaths: ProjectPaths, regions, base: T.Optional[Path] = None
) -> T.List[Path]:
    base = base if base is not None else ppaths.image_path
    if regions:
        return [base / r for r in regions]
    if not base.is_dir():
        return []
    # With --append-ts n the imagery root IS the project root; skip the
    # project's own bookkeeping dirs when auto-discovering regions.
    aux = {str(d) for d in Destinations} | {"commands"}
    return sorted(
        p for p in base.iterdir() if p.is_dir() and p.name not in aux
    )


def write_classes_info(ppaths: ProjectPaths, max_crop_class: int) -> None:
    ppaths.classes_info_path.parent.mkdir(parents=True, exist_ok=True)
    ppaths.classes_info_path.write_text(
        json.dumps(
            {
                "max_crop_class": max_crop_class,
                "edge_class": max_crop_class + 1,
            }
        )
    )


def read_classes_info(ppaths: ProjectPaths) -> dict:
    if ppaths.classes_info_path.is_file():
        return json.loads(ppaths.classes_info_path.read_text())
    return {"max_crop_class": 1, "edge_class": 2}


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def _parse_replace_dict(
    tokens: T.Optional[T.Sequence[str]],
) -> T.Optional[T.Dict[int, int]]:
    """'61:0 141:1' -> {61: 0, 141: 1} (reference replace_dict parsing,
    scripts/cultionet.py)."""
    if not tokens:
        return None
    mapping: T.Dict[int, int] = {}
    for token in tokens:
        src, dst = str(token).split(":")
        mapping[int(src)] = int(dst)
    return mapping


def _parse_bbox_offsets(
    tokens: T.Optional[T.Sequence[str]],
) -> T.List[T.Tuple[float, float]]:
    """'0,100 -100,0' -> [(0, 100), (-100, 0)] map-unit (x, y) shifts
    (reference bbox_offsets, scripts/cultionet.py:205-260)."""
    out: T.List[T.Tuple[float, float]] = []
    for token in tokens or []:
        sx, sy = str(token).split(",")
        out.append((float(sx), float(sy)))
    return out


def _shift_scene(
    x: np.ndarray,
    bounds: T.Tuple[float, float, float, float],
    cell_res: float,
    offset_xy: T.Tuple[float, float],
) -> T.Tuple[np.ndarray, T.Tuple[float, float, float, float]]:
    """Crop the same-size window shifted by (x, y) map units out of the
    scene, zero-filling where the shift leaves the scene extent. The
    reference re-reads imagery at the shifted grid bbox
    (scripts/cultionet.py:250-263); with a preloaded scene cube the
    equivalent is a pixel-shifted crop."""
    dx = int(round(offset_xy[0] / cell_res))
    dy = int(round(offset_xy[1] / cell_res))
    _, h, w, _ = x.shape
    shifted = np.zeros_like(x)
    # Row 0 is the TOP of the raster: shifted[r, c] = x[r - dy, c + dx].
    dst_r0, dst_r1 = max(0, dy), min(h, h + dy)
    dst_c0, dst_c1 = max(0, -dx), min(w, w - dx)
    if dst_r1 <= dst_r0 or dst_c1 <= dst_c0:
        raise ValueError(
            f"bbox offset {offset_xy} shifts the window fully outside "
            f"the scene"
        )
    shifted[:, dst_r0:dst_r1, dst_c0:dst_c1] = x[
        :, dst_r0 - dy : dst_r1 - dy, dst_c0 + dx : dst_c1 + dx
    ]
    left, bottom, right, top = bounds
    new_bounds = (
        left + offset_xy[0],
        bottom + offset_xy[1],
        right + offset_xy[0],
        top + offset_xy[1],
    )
    return shifted, new_bounds


def _create_region_job(spec: T.Dict[str, T.Any]) -> T.List[str]:
    """Create the train chip(s) for one region — the per-grid unit of work
    the reference fans out over a joblib loky pool
    (scripts/cultionet.py:512-529). Module-level and driven by one
    picklable spec dict so it runs identically inline or in a
    ProcessPoolExecutor worker; returns log lines for the parent."""
    region_path = Path(spec["region_path"])
    x, bounds, cell_res, _, polygons = load_scene(
        region_path, **spec["scene_kwargs"]
    )
    msgs: T.List[str] = []
    # (0, 0) plus any user offsets; each offset writes an extra chip
    # under a distinct region id (reference bbox_offsets loop,
    # scripts/cultionet.py:233-263).
    for off in spec["offsets"]:
        if off == (0.0, 0.0):
            region_id, off_x, off_bounds = region_path.name, x, bounds
        else:
            off_x, off_bounds = _shift_scene(x, bounds, cell_res, off)
            region_id = f"{region_path.name}-off{off[0]:g}x{off[1]:g}"
        out = create_train_batch(
            image_time_series=off_x,
            polygons=polygons,
            bounds=off_bounds,
            cell_res=cell_res,
            region=region_id,
            **spec["batch_kwargs"],
        )
        if out is None:
            msgs.append(f"{region_id}: already processed")
        else:
            msgs.append(f"{region_id}: wrote {out.name}")
    return msgs


def create_dataset(args: argparse.Namespace) -> None:
    ppaths = setup_paths(
        args.project_path,
        append_ts=getattr(args, "append_ts", "y") == "y",
    )
    log_command(ppaths, args)
    write_classes_info(ppaths, args.max_crop_class)

    config = read_project_config(ppaths)
    window = _season_window(args, config)
    if getattr(args, "delete_dataset", False):
        import shutil

        shutil.rmtree(ppaths.process_path, ignore_errors=True)
    replace_dict = _parse_replace_dict(getattr(args, "replace_dict", None))
    grid_size = getattr(args, "grid_size", None)
    regions = args.regions or config.get("regions")
    if getattr(args, "grid_id", None):
        regions = [args.grid_id]
    image_root = getattr(args, "time_series_path", None)

    scene_kwargs = dict(
        window=window,
        ref_res=getattr(args, "ref_res", None),
        resampling=getattr(args, "resampling", "nearest"),
        date_format=getattr(args, "date_format", None),
        class_column=getattr(args, "crop_column", None),
        replace_dict=replace_dict,
        feature_pattern=getattr(args, "feature_pattern", None),
        image_vis=config.get("image_vis"),
        skip_index=getattr(args, "skip_index", 0),
    )
    batch_kwargs = dict(
        process_path=ppaths.process_path,
        start_date=args.start_date,
        end_date=args.end_date,
        gain=getattr(args, "gain", 1e-4),
        offset=getattr(args, "offset", 0.0),
        max_crop_class=args.max_crop_class,
        keep_crop_classes=args.keep_crop_classes,
        nonag_is_unknown=args.nonag_is_unknown,
        overwrite=args.overwrite,
        all_touched=getattr(args, "all_touched", False),
        zero_padding=getattr(args, "zero_padding", 0),
        grid_size=tuple(grid_size) if grid_size is not None else None,
        compression=getattr(args, "compression", "zlib"),
    )
    offsets = [(0.0, 0.0)] + _parse_bbox_offsets(
        getattr(args, "bbox_offsets", None)
    )
    specs = [
        dict(
            region_path=str(region_path),
            scene_kwargs=scene_kwargs,
            batch_kwargs=batch_kwargs,
            offsets=offsets,
        )
        for region_path in iter_regions(
            ppaths,
            regions,
            base=Path(image_root) if image_root else None,
        )
    ]

    num_workers = int(getattr(args, "num_workers", 1) or 1)
    if num_workers > 1 and len(specs) > 1 and _fork_available():
        # Per-grid process pool (reference joblib loky,
        # scripts/cultionet.py:512-529): the pure-python TIFF decode and
        # npz serialization are GIL-bound, so threads cannot scale this.
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor

        ctx = multiprocessing.get_context("fork")
        with ProcessPoolExecutor(
            max_workers=num_workers, mp_context=ctx
        ) as pool:
            for msgs in pool.map(_create_region_job, specs):
                for msg in msgs:
                    logger.info(msg)
    else:
        for spec in specs:
            for msg in _create_region_job(spec):
                logger.info(msg)


def _season_window(args: argparse.Namespace, config: dict) -> T.Optional[dict]:
    """Seasonal tif window from CLI flags, else project config.yml."""
    end_year = getattr(args, "end_year", None)
    start_mmdd = getattr(args, "start_mmdd", None) or config.get("start_mmdd")
    end_mmdd = getattr(args, "end_mmdd", None) or config.get("end_mmdd")
    num_months = getattr(args, "num_months", None) or config.get("num_months")
    if end_year is None and str(getattr(args, "end_date", "")).count("-") == 2:
        end_year = int(str(args.end_date)[:4])
    if end_year is None or not (start_mmdd and end_mmdd):
        return None
    # add_year: grid year column + N = seasonal end year (reference
    # scripts/cultionet.py:310-311).
    end_year = int(end_year) + int(getattr(args, "add_year", 0) or 0)
    return dict(
        end_year=int(end_year),
        start_mmdd=str(start_mmdd),
        end_mmdd=str(end_mmdd),
        num_months=None if num_months is None else int(num_months),
    )


def create_predict(args: argparse.Namespace) -> None:
    ppaths = setup_paths(
        args.project_path,
        append_ts=getattr(args, "append_ts", "y") == "y",
    )
    log_command(ppaths, args)

    config = read_project_config(ppaths)
    window = _season_window(args, config)
    for region_path in iter_regions(ppaths, args.regions or config.get("regions")):
        x, bounds, _, _, _ = load_scene(
            region_path,
            window=window,
            ref_res=getattr(args, "ref_res", None),
            resampling=getattr(args, "resampling", "nearest"),
            date_format=getattr(args, "date_format", None),
            feature_pattern=getattr(args, "feature_pattern", None),
            image_vis=config.get("image_vis"),
            skip_index=getattr(args, "skip_index", 0),
        )
        paths = create_predict_dataset(
            image_time_series=x,
            region=region_path.name,
            process_path=ppaths.predict_process_path,
            start_date=args.start_date,
            end_date=args.end_date,
            window_size=args.window_size,
            padding=args.padding,
            bounds=bounds,
            num_workers=args.num_workers,
            compression=getattr(args, "compression", "zlib"),
        )
        logger.info(f"{region_path.name}: wrote {len(paths)} windows")


def _build_params(
    args: argparse.Namespace, ppaths: ProjectPaths, dataset: ChipDataset
) -> CultionetParams:
    class_info = read_classes_info(ppaths)
    attention = (
        None if args.attention_weights == "none" else args.attention_weights
    )
    return CultionetParams(
        ckpt_file=ppaths.ckpt_file,
        dataset=dataset,
        val_frac=args.val_frac,
        spatial_partitions=args.spatial_partitions,
        partition_name=getattr(args, "partition_name", None),
        partition_column=getattr(args, "partition_column", "name"),
        batch_size=args.batch_size,
        load_batch_workers=getattr(args, "load_batch_workers", 2),
        edge_class=(
            getattr(args, "edge_class", None) or class_info["edge_class"]
        ),
        hidden_channels=args.hidden_channels,
        activation_type=args.activation_type,
        dropout=args.dropout,
        dilations=args.dilations,
        res_block_type=args.res_block_type,
        attention_weights=attention,
        pool_by_max=args.pool_by_max,
        batchnorm_first=args.batchnorm_first,
        use_latlon=args.use_latlon,
        temporal_encoder=args.temporal_encoder,
        optimizer=args.optimizer,
        loss_name=args.loss_name,
        learning_rate=args.learning_rate,
        lr_scheduler=args.lr_scheduler,
        weight_decay=args.weight_decay,
        epochs=args.epochs,
        accumulate_grad_batches=args.accumulate_grad_batches,
        gradient_clip_val=args.gradient_clip_val,
        gradient_clip_algorithm=getattr(
            args, "gradient_clip_algorithm", "norm"
        ),
        steplr_step_size=getattr(args, "steplr_step_size", 5),
        precision=args.precision,
        devices=args.devices,
        augment_prob=args.augment_prob,
        device_augment=args.device_augment,
        device_augment_noise=args.device_augment_noise,
        use_chipstore=getattr(args, "use_chipstore", False),
        random_seed=args.random_seed,
        reset_model=args.reset_model,
        skip_train=args.skip_train,
        stochastic_weight_averaging=args.stochastic_weight_averaging,
        stochastic_weight_averaging_lr=getattr(
            args, "stochastic_weight_averaging_lr", 0.05
        ),
        stochastic_weight_averaging_start=getattr(
            args, "stochastic_weight_averaging_start", 0.8
        ),
        model_type=getattr(args, "model_type", "TowerUNet"),
        model_pruning=getattr(args, "model_pruning", False),
        save_batch_val_metrics=getattr(
            args, "save_batch_val_metrics", False
        ),
        auto_lr_find=getattr(args, "auto_lr_find", False),
        scale_pos_weight=getattr(args, "scale_pos_weight", False),
        fsdp=getattr(args, "fsdp", False),
        finetune=getattr(args, "finetune", None),
        profiler=args.profiler,
    )


def _norm_values(
    ppaths: ProjectPaths,
    dataset: ChipDataset,
    batch_size: int,
    recalc: bool = False,
) -> NormValues:
    norm_path = Path(str(ppaths.norm_file) + ".npz")
    if norm_path.is_file():
        if recalc:
            norm_path.unlink()
        else:
            return NormValues.from_file(norm_path)
    class_info = read_classes_info(ppaths)
    loader = ChipLoader(dataset, batch_size=batch_size)
    norm = NormValues.from_dataset(loader, class_info=class_info)
    norm.to_file(norm_path)
    return norm


def train_model(args: argparse.Namespace, transfer: bool = False) -> None:
    from .. import model as api

    ckpt_name = (
        ModelNames.CKPT_TRANSFER_NAME if transfer else ModelNames.CKPT_NAME
    )
    ppaths = setup_paths(args.project_path, ckpt_name=ckpt_name)
    log_command(ppaths, args)

    dataset = ChipDataset(
        ppaths.train_path,
        pattern=getattr(args, "data_pattern", "data*") or "data*",
        preload=bool(getattr(args, "preload_data", False)),
    )
    if not len(dataset):
        raise FileNotFoundError(
            f"No training chips under {ppaths.process_path}"
        )
    if (
        getattr(args, "expected_time", None) is not None
        or getattr(args, "expected_height", None) is not None
        or getattr(args, "expected_width", None) is not None
        or getattr(args, "delete_mismatches", False)
    ):
        bad = dataset.check_dims(
            expected_time=getattr(args, "expected_time", None),
            expected_height=getattr(args, "expected_height", None),
            expected_width=getattr(args, "expected_width", None),
            delete_mismatches=getattr(args, "delete_mismatches", False),
        )
        if bad:
            logger.warning(f"Removed {len(bad)} mismatched chips")
    if getattr(args, "log_transform", False):
        dataset.log_transform = True
    norm = _norm_values(
        ppaths,
        dataset,
        args.batch_size,
        recalc=getattr(args, "recalc_zscores", False),
    )
    dataset.norm_values = norm

    params = _build_params(args, ppaths, dataset)

    if args.profiler:
        from ..utils.profiling import profile_trace

        with profile_trace(args.profiler):
            result = (
                api.fit_transfer(params) if transfer else api.fit(params)
            )
    else:
        result = api.fit_transfer(params) if transfer else api.fit(params)
    logger.info(
        f"Training finished: best val_score={result.best_score:.4f} "
        f"over {len(result.history)} epochs"
    )


def predict_image(args: argparse.Namespace, transfer: bool = False) -> None:
    from ..model import load_model
    from ..predict import ScenePredictor

    ckpt_name = (
        ModelNames.CKPT_TRANSFER_NAME if transfer else ModelNames.CKPT_NAME
    )
    ppaths = setup_paths(args.project_path, ckpt_name=ckpt_name)
    log_command(ppaths, args)

    norm_path = Path(str(ppaths.norm_file) + ".npz")
    norm = NormValues.from_file(norm_path) if norm_path.is_file() else None

    pattern = f"data_{args.region}*" if args.region else "data*"
    # --data-path: predict directly on an existing processed-window dir
    # (reference data_path, args.yml predict group).
    data_path = getattr(args, "data_path", None)
    chip_root = Path(data_path) if data_path else ppaths.predict_path
    dataset = ChipDataset(chip_root, pattern=pattern, norm_values=norm)
    if not len(dataset):
        raise FileNotFoundError(f"No predict chips under {chip_root}")

    stem = Path(ppaths.ckpt_file).stem
    state, _ = load_model(
        Path(ppaths.ckpt_file).parent / f"{stem}_store", which=args.which_ckpt
    )
    predictor = ScenePredictor(
        state,
        batch_size=args.predict_batch_size,
        devices=args.predict_devices,
    )
    out_path = args.out_path or (
        ppaths.predict_path
        / f"{args.region or 'scene'}_{args.start_date}_{args.end_date}.tif"
    )
    written = predictor.predict_to_raster(
        dataset,
        out_path,
        crs=scene_crs(ppaths, args.region),
        reference_image=getattr(args, "reference_image", None),
    )
    logger.info(f"Wrote {written}")


def export_model(args: argparse.Namespace) -> None:
    """Export the trained model as a self-contained StableHLO serving
    artifact (params + norm stats baked in; see cultionet_tpu/export.py).
    The reference has no counterpart — serving it requires the full
    torch/Lightning stack (reference model.py:331-404)."""
    from ..export import export_predictor

    ppaths = setup_paths(args.project_path)
    log_command(ppaths, args)

    stem = Path(ppaths.ckpt_file).stem
    ckpt_dir = Path(ppaths.ckpt_file).parent / f"{stem}_store"
    out_path = Path(
        args.out_path
        or Path(ppaths.ckpt_file).parent / f"serve_{args.which_ckpt}.cnx"
    )
    log_transform = {"auto": None, "yes": True, "no": False}[
        getattr(args, "log_transform_mode", "auto")
    ]
    written = export_predictor(
        ckpt_dir,
        out_path,
        batch_size=args.export_batch_size,
        chip_size=args.chip_size,
        precision=args.precision,
        which=args.which_ckpt,
        norm_file=Path(str(ppaths.norm_file) + ".npz"),
        log_transform=log_transform,
        allow_unnormalized=getattr(args, "allow_unnormalized", False),
        platforms=args.platform,
    )
    logger.info(f"Wrote {written}")


def import_torch(args: argparse.Namespace) -> None:
    """Convert a reference PyTorch (Lightning) checkpoint into this
    framework's orbax checkpoint store, ready for `predict` /
    `train-transfer` (reference load path: model.py:331-404). Model
    hyperparameters come from the checkpoint's ``hyper_parameters`` when
    present (Lightning save_hyperparameters, lightning.py:853), else from
    the CLI model flags."""
    import numpy as np

    import torch

    from ..data.synthetic import create_batch
    from ..train.checkpoint import Checkpointer
    from ..train.optim import build_optimizer
    from ..train.step import create_train_state
    from ..utils.torch_params import import_torch_state_dict
    from .. import models as _models

    ppaths = setup_paths(args.project_path)
    log_command(ppaths, args)

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    hp = dict(ckpt.get("hyper_parameters", {}))

    def pick(name, cli_value, default=None):
        return hp.get(name, cli_value if cli_value is not None else default)

    attention = (
        None if args.attention_weights == "none" else args.attention_weights
    )
    model_kwargs = dict(
        in_time=int(pick("in_time", getattr(args, "in_time", None), 12)),
        hidden_channels=int(
            pick("hidden_channels", args.hidden_channels, 32)
        ),
        dropout=float(pick("dropout", args.dropout, 0.1)),
        activation_type=str(
            pick("activation_type", args.activation_type, "SiLU")
        ),
        dilations=list(pick("dilations", args.dilations, [1, 2]) or [1, 2]),
        res_block_type=str(
            pick("res_block_type", args.res_block_type, "resa")
        ),
        attention_weights=pick("attention_weights", attention, "natten"),
        pool_by_max=bool(pick("pool_by_max", args.pool_by_max, False)),
        batchnorm_first=bool(
            pick("batchnorm_first", args.batchnorm_first, False)
        ),
    )
    in_channels = int(
        pick("in_channels", getattr(args, "in_channels", None), 3)
    )

    model = _models.CultioNet(**model_kwargs)
    init_batch = create_batch(
        num_channels=in_channels,
        num_time=model_kwargs["in_time"],
        height=32,
        width=32,
        rng=np.random.default_rng(0),
    )
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), init_batch, seed=0
    )

    prefix = (
        "cultionet_model."
        if any(k.startswith("cultionet_model.") for k in state_dict)
        else ""
    )
    new_vars = import_torch_state_dict(
        state_dict,
        {"params": state.params, "batch_stats": state.batch_stats},
        prefix=prefix,
    )
    state = state.replace(
        params=new_vars["params"],
        batch_stats=new_vars.get("batch_stats", state.batch_stats),
    )

    ckpt_file = Path(ppaths.ckpt_file)
    store = Checkpointer(ckpt_file.parent / f"{ckpt_file.stem}_store")
    hyperparams = {
        **{
            k: (list(v) if isinstance(v, (list, tuple)) else v)
            for k, v in model_kwargs.items()
        },
        "in_channels": in_channels,
    }
    store.save_best(state, epoch=0, metrics={}, hyperparams=hyperparams)
    store.save_last(state, epoch=0, metrics={}, hyperparams=hyperparams)
    logger.info(
        f"Imported {len(state_dict)} torch entries into "
        f"{ckpt_file.parent / (ckpt_file.stem + '_store')}"
    )


def spatial_kfoldcv(args: argparse.Namespace) -> None:
    from .. import model as api

    ppaths = setup_paths(args.project_path)
    log_command(ppaths, args)

    dataset = ChipDataset(ppaths.train_path)
    norm = _norm_values(ppaths, dataset, args.batch_size)
    dataset.norm_values = norm

    partition_file = getattr(args, "spatial_partitions", None)
    if partition_file and partition_file != "spatial":
        # one fold per named user partition polygon
        fold_iter = dataset.partition_kfoldcv_iter(
            partition_file,
            partition_column=getattr(args, "partition_column", "name"),
        )
    elif getattr(args, "splits", 0) > 0:
        # quadtree cells at the requested split depth become the folds
        # (reference splits knob subdivides partitions via pygrts)
        fold_iter = dataset.spatial_kfoldcv_iter(4 ** int(args.splits))
    else:
        fold_iter = dataset.spatial_kfoldcv_iter(args.k_folds)

    results = {}
    for fold_name, train_ds, val_ds in fold_iter:
        params = _build_params(args, ppaths, train_ds)
        params.ckpt_file = ppaths.ckpt_path / f"{fold_name}.ckpt"
        params.test_dataset = val_ds
        result = api.fit(params)
        results[fold_name] = result.best_score
        logger.info(f"{fold_name}: best val_score={result.best_score:.4f}")

    (ppaths.ckpt_path / "skfoldcv.json").write_text(
        json.dumps(results, indent=2)
    )


def main() -> None:
    parser = build_parser()
    args = parser.parse_args()

    if args.command == CLISteps.VERSION:
        print(__version__)
        return
    if args.command == CLISteps.CREATE:
        create_dataset(args)
    elif args.command == CLISteps.CREATE_PREDICT:
        create_predict(args)
    elif args.command == CLISteps.IMPORT_TORCH:
        import_torch(args)
    elif args.command == CLISteps.EXPORT:
        export_model(args)
    elif args.command == CLISteps.TRAIN:
        train_model(args)
    elif args.command == CLISteps.TRAIN_TRANSFER:
        train_model(args, transfer=True)
    elif args.command == CLISteps.PREDICT:
        predict_image(args)
    elif args.command == CLISteps.PREDICT_TRANSFER:
        predict_image(args, transfer=True)
    elif args.command == CLISteps.SKFOLDCV:
        spatial_kfoldcv(args)
    else:
        raise SystemExit(f"Unknown command {args.command}")


if __name__ == "__main__":
    main()
