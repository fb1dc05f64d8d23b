"""Learning-rate range finder (Smith 2015; Lightning Tuner.lr_find).

The reference exposes ``auto_lr_find`` (model.py:90,301-305): run an
exponential LR sweep instead of training and log the suggested rate. Here
the sweep drives the real jitted train step with the configured optimizer
under an exponential schedule, tracks EMA-smoothed loss, stops early on
divergence, and suggests the LR at the steepest descent of the smoothed
curve — the same rule Lightning's ``lr_finder.suggestion()`` applies.
"""

import dataclasses
import typing as T

import jax
import numpy as np

from ..config import CultionetParams
from ..data.loader import ChipLoader
from ..utils.logging import set_color_logger
from .optim import build_optimizer
from .step import create_train_state, make_train_step

logger = set_color_logger(__name__)


@dataclasses.dataclass
class LRFindResult:
    lrs: T.List[float]
    losses: T.List[float]  # EMA-smoothed
    raw_losses: T.List[float]
    suggestion: T.Optional[float]


def suggest_lr(
    lrs: T.Sequence[float], smoothed: T.Sequence[float], skip: int = 5
) -> T.Optional[float]:
    """LR at the steepest negative slope of the smoothed loss-vs-log(lr)
    curve, ignoring the first ``skip`` warm-in points."""
    if len(lrs) <= skip + 2:
        return None
    losses = np.asarray(smoothed[skip:])
    gradients = np.gradient(losses)
    return float(np.asarray(lrs[skip:])[int(np.argmin(gradients))])


def lr_find(
    params: CultionetParams,
    num_steps: int = 100,
    min_lr: float = 1e-7,
    max_lr: float = 1.0,
    beta: float = 0.9,
    diverge_factor: float = 4.0,
) -> LRFindResult:
    """Exponential LR sweep on the configured model/optimizer/loss."""
    from .fit import build_model

    dataset = params.dataset
    if params.in_channels is None:
        params.update_channels(dataset)

    loader = ChipLoader(
        dataset, batch_size=params.batch_size, shuffle=True
    )

    def schedule(step):
        frac = jax.numpy.minimum(step / max(num_steps - 1, 1), 1.0)
        return min_lr * (max_lr / min_lr) ** frac

    model = build_model(params)
    tx = build_optimizer(
        optimizer=params.optimizer,
        learning_rate=schedule,
        weight_decay=params.weight_decay,
        eps=params.eps,
        gradient_clip_val=params.gradient_clip_val,
    )
    init_batch = next(iter(loader))
    state = create_train_state(model, tx, init_batch, seed=params.random_seed)
    train_step = make_train_step(
        loss_name=params.loss_name,
        edge_class=params.edge_class,
        precision=params.compute_precision,
        donate=False,
    )

    key = jax.random.PRNGKey(params.random_seed)
    lrs: T.List[float] = []
    raw: T.List[float] = []
    smoothed: T.List[float] = []
    ema = 0.0
    best = float("inf")
    step_idx = 0

    while step_idx < num_steps:
        for batch in loader:
            if step_idx >= num_steps:
                break
            key, sub = jax.random.split(key)
            state, logs = train_step(state, batch, sub)
            loss = float(np.asarray(jax.device_get(logs["loss"])))
            lr = float(
                min_lr * (max_lr / min_lr) ** (step_idx / max(num_steps - 1, 1))
            )
            ema = beta * ema + (1.0 - beta) * loss
            corrected = ema / (1.0 - beta ** (step_idx + 1))
            lrs.append(lr)
            raw.append(loss)
            smoothed.append(corrected)
            best = min(best, corrected)
            step_idx += 1
            if not np.isfinite(loss) or corrected > diverge_factor * best:
                step_idx = num_steps  # diverged: stop the sweep
                break

    suggestion = suggest_lr(lrs, smoothed)
    if suggestion is not None:
        logger.info(f"The suggested learning rate is {suggestion:.3e}")
    else:
        logger.warning("LR sweep too short for a suggestion")
    return LRFindResult(
        lrs=lrs, losses=smoothed, raw_losses=raw, suggestion=suggestion
    )
