from .checkpoint import Checkpointer
from .fit import FitResult, fit
from .labels import get_true_labels
from .loss_registry import LOSS_DICT
from .metrics import (
    dice_score,
    fbeta_score,
    jaccard_score,
    mae,
    matthews_corrcoef,
    mse,
    probas_to_labels,
)
from .optim import build_optimizer, build_schedule
from .precision import cast_floating, resolve_dtype
from .prune import l1_unstructured_prune, sparsity
from .step import (
    TrainState,
    calc_loss,
    create_train_state,
    evaluate_predictions,
    make_eval_step,
    make_predict_step,
    make_train_step,
)

__all__ = [
    "Checkpointer",
    "FitResult",
    "LOSS_DICT",
    "TrainState",
    "build_optimizer",
    "build_schedule",
    "calc_loss",
    "cast_floating",
    "create_train_state",
    "dice_score",
    "evaluate_predictions",
    "fbeta_score",
    "fit",
    "get_true_labels",
    "jaccard_score",
    "l1_unstructured_prune",
    "mae",
    "make_eval_step",
    "make_predict_step",
    "make_train_step",
    "matthews_corrcoef",
    "mse",
    "probas_to_labels",
    "resolve_dtype",
    "sparsity",
]
