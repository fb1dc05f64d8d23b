"""Public orchestration API: fit / fit_transfer / load_model / predict.

Mirrors the reference's model.py:222-467 surface on top of the TPU-native
training loop.
"""

import typing as T
from pathlib import Path

import jax
import numpy as np

from .config import CultionetParams
from .data.batch import Batch
from .data.loader import ChipLoader
from .data.synthetic import create_batch
from .enums import InferenceNames
from .models import CultioNet
from .train.checkpoint import Checkpointer
from .train.fit import FitResult, fit as _fit
from .train.optim import build_optimizer
from .train.step import (
    TrainState,
    create_train_state,
    make_predict_step,
)
from .utils.logging import set_color_logger

logger = set_color_logger(__name__)


def fit(params: CultionetParams) -> FitResult:
    """Train a model (reference model.py:273-330)."""
    return _fit(params)


def fit_transfer(params: CultionetParams) -> FitResult:
    """Transfer learning from a pretrained checkpoint
    (reference model.py:222-272; lightning.py:686-818).

    ``params.ckpt_file`` points at the NEW checkpoint location; the
    pretrained state is loaded from ``params.pretrained_ckpt`` if present
    or the default ckpt store next to ``ckpt_file``.
    """
    pretrained_dir = getattr(params, "pretrained_ckpt", None)
    if pretrained_dir is None:
        pretrained_dir = Path(params.ckpt_file).parent / "last_store"
    state, _, _ = _load_state(Path(pretrained_dir), which="last")
    return _fit(params, pretrained_state=state)


def _load_state(
    ckpt_dir: Path, which: str = "best"
) -> T.Tuple[TrainState, CultioNet, dict]:
    ckpt = Checkpointer(ckpt_dir)
    if not (ckpt.has_best() or ckpt.has_last()):
        raise FileNotFoundError(f"No checkpoint under {ckpt_dir}")
    if which == "best" and not ckpt.has_best():
        which = "last"
    meta = ckpt.load_meta(which)
    hp = dict(meta["hyperparams"])

    in_channels = hp.pop("in_channels", 3)
    # The hyperparams record also carries non-model keys (loss/pipeline
    # flags like log_transform, normalized_input — consumed by export.py);
    # construct the model only from its actual dataclass fields.
    import dataclasses

    model_fields = {
        f.name for f in dataclasses.fields(CultioNet) if f.name != "parent"
    }
    model = CultioNet(**{k: v for k, v in hp.items() if k in model_fields})

    init_batch = create_batch(
        num_channels=in_channels,
        num_time=hp.get("in_time", 12),
        height=32,
        width=32,
        rng=np.random.default_rng(0),
    )
    template = create_train_state(
        model, build_optimizer("AdamW", 1e-3), init_batch, seed=0
    )
    state = ckpt.restore(template, which, with_opt_state=False)
    return state, model, meta


def load_model(
    ckpt_dir: T.Union[str, Path], which: str = "best"
) -> T.Tuple[TrainState, CultioNet]:
    """Reconstruct the model from checkpoint-embedded hyperparameters and
    restore its state (reference model.py:331-404)."""
    state, model, _ = _load_state(Path(ckpt_dir), which=which)
    return state, model


def predict(
    state: TrainState,
    dataset,
    batch_size: int = 4,
    precision: str = "bf16",
    writer: T.Optional[T.Callable[[Batch, dict], None]] = None,
) -> T.List[T.Dict[str, np.ndarray]]:
    """Run inference over a (predict) dataset.

    ``writer(batch, outputs)`` is invoked per batch (the GeoTIFF raster
    writer hook — reference callbacks.py:148-227); outputs are also
    returned as host numpy arrays when no writer consumes them.
    """
    if jax.devices()[0].platform == "cpu":
        precision = "fp32"
    predict_step = make_predict_step(precision=precision)
    loader = ChipLoader(dataset, batch_size=batch_size, shuffle=False)

    results = []
    for batch in loader:
        outputs = predict_step(state, batch)
        host = {
            name: np.asarray(outputs[name])
            for name in (
                InferenceNames.DISTANCE,
                InferenceNames.EDGE,
                InferenceNames.CROP,
            )
        }
        if writer is not None:
            writer(batch, host)
        else:
            results.append(host)
    return results


# Reference-API alias (model.py:405-467).
predict_lightning = predict
