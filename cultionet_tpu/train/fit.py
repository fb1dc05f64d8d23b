"""The training loop: fit / evaluate / transfer learning.

The TPU-native replacement for the reference's Lightning orchestration
(model.py:222-330, lightning.py:686-818): explicit epoch loop driving jitted
train/eval steps, composite-val_score best checkpointing, auto-resume,
optional stochastic weight averaging, and freeze/replace transfer learning —
all with the multi-device mesh path when ``devices > 1``.
"""

import dataclasses
import json
import typing as T
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

from ..config import CultionetParams
from ..data.loader import ChipLoader
from ..models import CultioNet
from ..utils.logging import set_color_logger
from .checkpoint import Checkpointer
from .optim import build_optimizer, build_schedule
from .precision import cast_floating
from .step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)

logger = set_color_logger(__name__)


@dataclasses.dataclass
class FitResult:
    state: TrainState
    model: CultioNet
    history: T.List[T.Dict[str, float]]
    best_score: float
    norm_values: T.Any = None


def _append_csv(path: Path, row: T.Dict[str, T.Any]) -> None:
    """Append one row to a CSV event file (header written on create) —
    the plottable epoch/batch event stream standing in for the reference's
    TensorBoard logger (Lightning default, model.py:181)."""
    import csv

    path.parent.mkdir(parents=True, exist_ok=True)
    new = not path.exists()
    with open(path, "a", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(row))
        if new:
            writer.writeheader()
        writer.writerow(row)


def _append_batch_metrics(
    ckpt_dir: Path, rows: T.List[T.Dict[str, T.Any]]
) -> None:
    """Append per-val-batch rows to ``batch_metrics.parquet`` (reference
    lightning.py:512-534) or ``batch_metrics.csv``. Called once per epoch
    with the epoch's buffered rows — one read-concat-write per epoch
    instead of the reference's per-batch rewrite (O(n^2) IO)."""
    if not rows:
        return
    try:
        import pandas as pd

        path = ckpt_dir / "batch_metrics.parquet"
        frame = pd.DataFrame(rows)
        if path.exists():
            frame = pd.concat([pd.read_parquet(path), frame])
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        frame.to_parquet(path)
    except (ImportError, OSError):
        for row in rows:
            _append_csv(ckpt_dir / "batch_metrics.csv", row)


def _mean_metrics(
    rows: T.List[T.Tuple[int, T.Dict[str, jnp.ndarray]]]
) -> T.Dict[str, float]:
    """Batch-size weighted mean of metric dicts."""
    total = sum(n for n, _ in rows)
    out: T.Dict[str, float] = {}
    for key in rows[0][1]:
        out[key] = float(
            sum(n * float(m[key]) for n, m in rows) / max(total, 1)
        )
    return out


def _trainable_mask(params, finetune: T.Optional[str]):
    """Param-path mask for transfer learning (reference lightning.py:746-801):
    'all' -> everything trainable; 'fc' or None -> only the final heads."""
    final_names = ("final_a", "final_b", "final_c", "final_combine")

    def label(path: T.Tuple, _) -> bool:
        if finetune == "all":
            return True
        return any(
            getattr(p, "key", None) in final_names for p in path
        )

    return jax.tree_util.tree_map_with_path(label, params)


def build_model(params: CultionetParams) -> CultioNet:
    return CultioNet(**params.get_model_kwargs())


def _resolve_class_weights(params: CultionetParams):
    """(bg, fg) loss weights when ``scale_pos_weight`` is on: explicit
    ``class_counts`` first, else the NormValues pixel counts gathered from
    the train split (the counts the reference computes at
    normalize.py:119-213 and passes as ``class_counts``, model.py:162)."""
    if not params.scale_pos_weight:
        return None
    from .step import class_weights_from_counts

    crop = edge = None
    counts = params.class_counts
    if isinstance(counts, dict):
        crop, edge = counts.get("crop"), counts.get("edge")
    elif counts is not None:
        crop, edge = counts
    if crop is None or edge is None:
        nv = getattr(params.dataset, "norm_values", None)
        if nv is not None:
            crop = nv.dataset_crop_counts if crop is None else crop
            edge = nv.dataset_edge_counts if edge is None else edge
    if crop is None or edge is None:
        logger.warning(
            "scale_pos_weight=True but no class counts available "
            "(set class_counts or attach NormValues); proceeding unweighted"
        )
        return None
    return class_weights_from_counts(crop, edge)


def _make_steps(
    params: CultionetParams,
    mesh=None,
    frozen_mask=None,
    state_shardings=None,
    norm_stats=None,
):
    precision = params.compute_precision
    class_weights = _resolve_class_weights(params)
    if mesh is not None:
        from ..parallel import make_sharded_eval_step, make_sharded_train_step

        return (
            make_sharded_train_step(
                mesh,
                loss_name=params.loss_name,
                edge_class=params.edge_class,
                precision=precision,
                device_augment=params.device_augment,
                device_augment_noise=params.device_augment_noise,
                class_weights=class_weights,
                state_shardings=state_shardings,
                norm_stats=norm_stats,
            ),
            make_sharded_eval_step(
                mesh,
                loss_name=params.loss_name,
                edge_class=params.edge_class,
                precision=precision,
                class_weights=class_weights,
                state_shardings=state_shardings,
            ),
        )
    return (
        make_train_step(
            loss_name=params.loss_name,
            edge_class=params.edge_class,
            precision=precision,
            donate=False,
            device_augment=params.device_augment,
            device_augment_noise=params.device_augment_noise,
            class_weights=class_weights,
            norm_stats=norm_stats,
        ),
        make_eval_step(
            loss_name=params.loss_name,
            edge_class=params.edge_class,
            precision=precision,
            class_weights=class_weights,
        ),
    )


def _build_tx(
    params: CultionetParams, steps_per_epoch: int, frozen_mask=None
) -> optax.GradientTransformation:
    schedule = build_schedule(
        params.lr_scheduler,
        learning_rate=params.learning_rate,
        epochs=params.epochs,
        steps_per_epoch=max(
            1, steps_per_epoch // max(1, params.accumulate_grad_batches)
        ),
        steplr_step_size=params.steplr_step_size,
    )
    from .optim import build_momentum_schedule

    tx = build_optimizer(
        optimizer=params.optimizer,
        learning_rate=schedule,
        weight_decay=params.weight_decay,
        eps=params.eps,
        gradient_clip_val=params.gradient_clip_val,
        gradient_clip_algorithm=params.gradient_clip_algorithm,
        accumulate_grad_batches=params.accumulate_grad_batches,
        # torch OneCycleLR cycles beta1 opposite the LR (cycle_momentum)
        b1_schedule=build_momentum_schedule(
            params.lr_scheduler,
            params.epochs,
            max(1, steps_per_epoch // max(1, params.accumulate_grad_batches)),
        )
        if params.optimizer == "AdamW"
        else None,
    )
    if frozen_mask is not None:
        # Zero updates for frozen params (reference freeze semantics).
        tx = optax.chain(
            tx,
            optax.masked(
                optax.set_to_zero(),
                jax.tree_util.tree_map(lambda t: not t, frozen_mask),
            ),
        )
    return tx


def _reestimate_batch_stats(
    state: TrainState, loader, precision: str, norm_stats=None
) -> TrainState:
    """Recompute BatchNorm running statistics under the current (e.g. SWA
    averaged) parameters: one forward pass over the train loader with
    ``mutable=['batch_stats']``, predictions discarded — the torch
    ``update_bn`` step Lightning runs after weight averaging, which the
    reference inherits via its SWA callback (callbacks.py:261-269)."""
    if not state.batch_stats:
        return state

    from .precision import resolve_dtype

    compute_dtype = resolve_dtype(precision)

    @jax.jit
    def bn_step(params, stats, batch):
        batch = batch.dequantize()
        if norm_stats is not None:
            # same clip-then-normalize order as the compiled train step
            batch = batch.replace(
                x=(jnp.clip(batch.x, 1e-9, 1.0)
                   - jnp.asarray(norm_stats[0], jnp.float32))
                / jnp.asarray(norm_stats[1], jnp.float32)
            )
        _, mutated = state.apply_fn(
            {
                "params": cast_floating(params, compute_dtype),
                "batch_stats": cast_floating(stats, compute_dtype),
            },
            batch.replace(x=batch.x.astype(compute_dtype)),
            training=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return cast_floating(mutated["batch_stats"], jnp.float32)

    from .step import strip_static

    stats = state.batch_stats
    for batch in loader:
        stats = bn_step(state.params, stats, strip_static(batch))
    return state.replace(batch_stats=stats)


def fit(
    params: CultionetParams,
    pretrained_state: T.Optional[TrainState] = None,
) -> FitResult:
    """Train CultioNet from a CultionetParams config.

    When ``pretrained_state`` is given (transfer learning), its params /
    batch stats seed the new state and ``params.finetune`` controls which
    parameters receive updates.
    """
    params.check_checkpoint()

    dataset = params.dataset
    if params.in_channels is None:
        params.update_channels(dataset)

    if params.auto_lr_find:
        # LR sweep instead of training (reference model.py:301-305).
        from .lr_finder import lr_find

        sweep = lr_find(params)
        return FitResult(
            state=None,
            model=build_model(params),
            history=[
                {"lr": lr, "loss": loss}
                for lr, loss in zip(sweep.lrs, sweep.losses)
            ],
            best_score=(
                sweep.suggestion if sweep.suggestion is not None else -1.0
            ),
        )

    partition_file = params.spatial_partitions
    if (
        partition_file
        and partition_file != "spatial"
        and params.partition_name
        and Path(partition_file).exists()
    ):
        # User partition polygons: validate on the named partition
        # (reference get_spatial_partitions/query_partition_by_name,
        # datasets.py:177-259).
        train_ds, val_ds = dataset.split_by_partition(
            partition_file,
            params.partition_name,
            partition_column=params.partition_column,
        )
    else:
        train_ds, val_ds = dataset.split_train_val(
            val_frac=params.val_frac,
            spatial_balance=params.spatial_partitions is not None,
        )
    train_ds.augment_prob = params.augment_prob

    train_sharding = None
    loader_batch_size = params.batch_size
    if params.devices > 1:
        from ..parallel import batch_sharding, create_mesh

        # Device placement happens inside the loader's prefetch thread so
        # host->HBM transfers overlap the previous step's compute.
        train_sharding = batch_sharding(create_mesh(params.devices))

    if jax.process_count() > 1:
        # Multi-host: each process loads a disjoint stripe of the train
        # files and contributes batch_size/process_count samples per global
        # batch (assembled in the loader via make_array_from_process_local_
        # data). steps_per_epoch must agree across hosts — enforced below.
        from ..data.loader import process_local_selection
        from ..parallel.distributed import assert_same_across_hosts

        pc, pi = jax.process_count(), jax.process_index()
        assert params.batch_size % pc == 0, (
            f"global batch_size {params.batch_size} must divide over "
            f"{pc} processes"
        )
        loader_batch_size = params.batch_size // pc
        train_ds = train_ds.index_select(
            process_local_selection(len(train_ds), pi, pc)
        )
        assert_same_across_hosts(
            len(train_ds) // max(1, loader_batch_size), "steps_per_epoch"
        )

    norm_stats = None
    hbm_cache = None
    if params.use_chipstore:
        # Fast path: raw int16 chips; scaling, augmentation (device
        # dihedral), and normalization all run inside the compiled step.
        # Host augmenters don't apply here. Mode selection
        # (config.py use_chipstore): True/'stream' = C++ chipstore
        # streaming; 'hbm' = device-resident dataset (data/device_cache.py,
        # per-step host traffic is a (B,) index vector); 'auto' = 'hbm'
        # when the split fits the HBM budget, else streaming.
        from ..data.chipstore import ChipstoreLoader
        from ..data.device_cache import DeviceChipCache

        assert not train_ds.log_transform, (
            "use_chipstore does not support log_transform"
        )
        if params.augment_prob > 0 and not params.device_augment:
            logger.warning(
                "use_chipstore skips host augmenters; set "
                "device_augment=True for in-step augmentation"
            )
        if train_ds.norm_values is not None:
            nv = train_ds.norm_values
            norm_stats = (nv.dataset_mean, nv.dataset_std)

        mode = params.use_chipstore
        want_hbm = mode in ("hbm", "auto")
        if want_hbm and jax.process_count() > 1:
            logger.warning(
                "use_chipstore='hbm' is single-host only (each process "
                "holds a file stripe); falling back to streaming"
            )
            want_hbm = False
        if want_hbm and (
            mode == "hbm" or DeviceChipCache.fits(train_ds)
        ):
            mesh_early = None
            if params.devices > 1:
                from ..parallel import create_mesh as _create_mesh

                mesh_early = _create_mesh(params.devices)
            hbm_cache = DeviceChipCache(
                train_ds,
                batch_size=loader_batch_size,
                seed=params.random_seed,
                mesh=mesh_early,
            )
            logger.info(
                f"device-resident dataset: {hbm_cache.num_chips} chips, "
                f"{hbm_cache.resident_bytes / 1e6:.0f} MB in HBM"
            )
            train_loader = hbm_cache
        else:
            cache_dir = (
                Path(params.ckpt_file).parent
                if params.ckpt_file is not None
                else Path(train_ds.root) / "cache"
            )
            train_loader = ChipstoreLoader(
                train_ds,
                batch_size=loader_batch_size,
                cache_path=cache_dir / "train.cts",
                seed=params.random_seed,
                num_threads=max(2, params.load_batch_workers),
                sharding=train_sharding,
            )
    else:
        train_loader = ChipLoader(
            train_ds,
            batch_size=loader_batch_size,
            shuffle=True,
            drop_last=True,
            num_workers=params.load_batch_workers,
            sharding=train_sharding,
        )
    val_loader = ChipLoader(
        val_ds, batch_size=params.batch_size, shuffle=False
    )
    steps_per_epoch = max(1, len(train_loader))

    model = build_model(params)

    # A throwaway optimizer initializes the state; the real one (with the
    # schedule and any transfer-freeze mask) is swapped in below once the
    # parameter tree exists.
    tx = build_optimizer(
        optimizer=params.optimizer, learning_rate=params.learning_rate
    )

    init_batch = next(iter(val_loader))
    state = create_train_state(model, tx, init_batch, seed=params.random_seed)

    trainable_mask = None
    if pretrained_state is not None:
        restored_params = pretrained_state.params
        if params.finetune is None:
            # Replace final heads with fresh inits; train only those.
            fresh = state.params
            final_names = ("final_a", "final_b", "final_c", "final_combine")

            def merge(path, old, new):
                in_final = any(
                    getattr(p, "key", None) in final_names for p in path
                )
                return new if in_final else old

            restored_params = jax.tree_util.tree_map_with_path(
                merge, restored_params, fresh
            )
        state = state.replace(
            params=restored_params,
            batch_stats=pretrained_state.batch_stats,
        )
        trainable_mask = _trainable_mask(state.params, params.finetune)

    tx = _build_tx(params, steps_per_epoch, frozen_mask=trainable_mask)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))

    # LR monitor (reference LearningRateMonitor callback, callbacks.py:252).
    lr_schedule = build_schedule(
        params.lr_scheduler,
        learning_rate=params.learning_rate,
        epochs=params.epochs,
        steps_per_epoch=max(
            1, steps_per_epoch // max(1, params.accumulate_grad_batches)
        ),
        steplr_step_size=params.steplr_step_size,
    )

    ckpt = None
    start_epoch = 0
    hyperparams = {
        **{
            k: (list(v) if isinstance(v, (list, tuple)) else v)
            for k, v in params.get_model_kwargs().items()
        },
        "in_channels": params.in_channels,
        "edge_class": params.edge_class,
        "loss_name": str(params.loss_name),
        # Data-pipeline flags the serving export must reproduce exactly
        # (export.py resolves both from here; ADVICE r4): a log-trained
        # model served without the transform, or a norm-trained model
        # served unnormalized, is silent garbage.
        "log_transform": bool(train_ds.log_transform),
        "normalized_input": train_ds.norm_values is not None,
    }
    if params.ckpt_file is not None:
        # Store directory derives from the checkpoint name so transfer runs
        # (last_transfer.ckpt, reference ModelNames.CKPT_TRANSFER_NAME) get
        # their own store and never collide with the pretrained one.
        ckpt_file = Path(params.ckpt_file)
        ckpt = Checkpointer(ckpt_file.parent / f"{ckpt_file.stem}_store")
        if ckpt.has_last():
            meta = ckpt.load_meta("last")
            state = ckpt.restore(state, "last")
            start_epoch = meta["epoch"] + 1
            logger.info(f"Resumed from epoch {meta['epoch']}")

    mesh = None
    shard_batch = None
    state_shardings = None
    if params.devices > 1:
        assert params.batch_size % params.devices == 0, (
            f"batch_size {params.batch_size} must divide evenly over "
            f"{params.devices} devices"
        )
        from ..parallel import create_mesh, replicate_state
        from ..parallel import shard_batch as _shard_batch

        shard_batch = _shard_batch
        mesh = create_mesh(num_devices=params.devices)
        if params.fsdp:
            # ZeRO-3-style parameter + optimizer-state sharding over the
            # data axis (reference Lightning strategy='fsdp', args.yml:274).
            from ..parallel import shard_state_fsdp

            state, state_shardings = shard_state_fsdp(
                state, mesh, min_size=params.fsdp_min_size
            )
        else:
            state = replicate_state(state, mesh)

    train_step, eval_step = _make_steps(
        params,
        mesh=mesh,
        state_shardings=state_shardings,
        norm_stats=norm_stats,
    )
    if hbm_cache is not None:
        # Device-resident path: the loader yields (B,) index batches; the
        # compiled step gathers chip rows from the resident arrays.
        from .step import make_hbm_train_step

        _hbm_step = make_hbm_train_step(
            mesh=mesh,
            state_shardings=state_shardings,
            loss_name=params.loss_name,
            edge_class=params.edge_class,
            precision=params.compute_precision,
            device_augment=params.device_augment,
            device_augment_noise=params.device_augment_noise,
            class_weights=_resolve_class_weights(params),
            norm_stats=norm_stats,
        )

        def train_step(state, batch, rng):  # noqa: F811
            return _hbm_step(state, hbm_cache.arrays, batch.indices, rng)
    # Partial validation batches can't shard evenly over the mesh; they run
    # through an unsharded eval step (replicated state works as-is).
    eval_step_fallback = (
        _make_steps(params, mesh=None)[1] if mesh is not None else eval_step
    )

    key = jax.random.PRNGKey(params.random_seed)
    history: T.List[T.Dict[str, float]] = []
    best_score = float("inf")
    if ckpt is not None and ckpt.has_best():
        best_score = ckpt.load_meta("best")["metrics"].get(
            "val_score", float("inf")
        )

    swa_params = None
    swa_count = 0
    swa_start_epoch = int(
        params.epochs * params.stochastic_weight_averaging_start
    )

    if params.skip_train:
        return FitResult(
            state=state, model=model, history=history, best_score=best_score
        )

    for epoch in range(start_epoch, params.epochs):
        train_rows = []
        for batch in train_loader:
            # (already mesh-sharded by the loader when devices > 1)
            key, subkey = jax.random.split(key)
            state, logs = train_step(state, batch, subkey)
            train_rows.append((batch.num_samples, logs))

        val_rows = []
        batch_metric_rows = []
        for batch_idx, batch in enumerate(val_loader):
            if mesh is not None and batch.num_samples % params.devices == 0:
                batch = shard_batch(batch, mesh)
                val_rows.append((batch.num_samples, eval_step(state, batch)))
            else:
                val_rows.append(
                    (batch.num_samples, eval_step_fallback(state, batch))
                )
            if params.save_batch_val_metrics and params.ckpt_file is not None:
                # Per-VAL-BATCH rows, the reference's
                # ``batch_metrics.parquet`` (lightning.py:512-534); CSV
                # fallback when no parquet engine is installed. Buffered
                # for the epoch — one file write per epoch.
                batch_metric_rows.append(
                    {
                        "epoch": epoch,
                        "batch": batch_idx,
                        "num_samples": batch.num_samples,
                        **{
                            k: float(v)
                            for k, v in val_rows[-1][1].items()
                        },
                    }
                )
        if batch_metric_rows:
            _append_batch_metrics(
                Path(params.ckpt_file).parent, batch_metric_rows
            )

        train_metrics = _mean_metrics(train_rows)
        val_metrics = _mean_metrics(val_rows)
        row = {
            "epoch": epoch,
            "loss": train_metrics["loss"],
            "val_loss": val_metrics["loss"],
            "val_score": val_metrics["score"],
            "vef1": val_metrics["edge_f1"],
            "vcf1": val_metrics["crop_f1"],
            "vmae": val_metrics["dist_mae"],
            "lr_sch": float(
                lr_schedule(
                    (epoch + 1)
                    * steps_per_epoch
                    // max(1, params.accumulate_grad_batches)
                )
            ),
        }
        history.append(row)
        if params.ckpt_file is not None:
            # Epoch-curve event stream (loss/val curves, LR) for plotting.
            _append_csv(Path(params.ckpt_file).parent / "history.csv", row)
        logger.info(
            f"epoch {epoch}: loss={row['loss']:.4f} "
            f"val_loss={row['val_loss']:.4f} val_score={row['val_score']:.4f}"
        )

        if params.stochastic_weight_averaging and epoch >= swa_start_epoch:
            params_f32 = cast_floating(state.params, jnp.float32)
            if swa_params is None:
                swa_params = params_f32
                swa_count = 1
            else:
                swa_count += 1
                swa_params = jax.tree_util.tree_map(
                    lambda avg, new: avg + (new - avg) / swa_count,
                    swa_params,
                    params_f32,
                )

        if ckpt is not None:
            ckpt.save_last(
                state, epoch, metrics=row, hyperparams=hyperparams
            )
            if row["val_score"] < best_score:
                best_score = row["val_score"]
                ckpt.save_best(
                    state, epoch, metrics=row, hyperparams=hyperparams
                )

    if params.model_pruning:
        from .prune import l1_unstructured_prune

        state = state.replace(
            params=l1_unstructured_prune(
                cast_floating(state.params, jnp.float32)
            )
        )

    if swa_params is not None:
        state = state.replace(params=swa_params)
        bn_loader = train_loader
        if hbm_cache is not None:
            # BN refit over the resident arrays: eager device gathers
            # yield real batches from the index iterator.
            from ..data.device_cache import gather_batch

            class _HbmBatches:
                def __iter__(self_inner):
                    for ib in hbm_cache:
                        yield gather_batch(
                            hbm_cache.arrays, jnp.asarray(ib.indices)
                        )

            bn_loader = _HbmBatches()
        state = _reestimate_batch_stats(
            state,
            bn_loader,
            params.compute_precision,
            norm_stats=norm_stats,
        )
        if ckpt is not None:
            ckpt.save_last(
                state,
                params.epochs - 1,
                metrics={"swa": 1.0},
                hyperparams=hyperparams,
            )

    # Optional test pass -> metrics JSON (reference model.py:322-328)
    if params.test_dataset is not None and params.ckpt_file is not None:
        test_loader = ChipLoader(
            params.test_dataset, batch_size=params.batch_size
        )
        # Same sharding rule as the val loop: mesh-shard only batches
        # divisible by the device count; route the indivisible remainder
        # through the unsharded fallback step instead of raising at
        # dispatch.
        test_rows = []
        for b in test_loader:
            if mesh is not None and b.num_samples % params.devices == 0:
                test_rows.append(
                    (b.num_samples, eval_step(state, shard_batch(b, mesh)))
                )
            else:
                test_rows.append(
                    (b.num_samples, eval_step_fallback(state, b))
                )
        test_metrics = _mean_metrics(test_rows)
        out_path = Path(params.ckpt_file).parent / "test.metrics"
        out_path.write_text(json.dumps(test_metrics, indent=2))

    return FitResult(
        state=state, model=model, history=history, best_score=best_score
    )
