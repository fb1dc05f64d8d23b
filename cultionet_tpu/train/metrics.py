"""Evaluation metrics in pure JAX (no torchmetrics).

Replaces the reference's torchmetrics scorers (lightning.py:562-577): MAE,
MSE, macro F-beta (beta=2, 2 classes), Matthews correlation coefficient.
All metrics support an optional validity mask (the reference applies
``masked_select`` before scoring — lightning.py:392-449; here invalid pixels
get zero weight, which is numerically identical).
"""

import typing as T

import jax
import jax.numpy as jnp

Array = jax.Array


def _weights(
    values: Array, mask: T.Optional[Array]
) -> Array:
    if mask is None:
        return jnp.ones(values.shape, dtype=jnp.float32)
    return mask.astype(jnp.float32)


def mae(preds: Array, targets: Array, mask: T.Optional[Array] = None) -> Array:
    w = _weights(preds, mask)
    return jnp.sum(jnp.abs(preds - targets) * w) / jnp.maximum(jnp.sum(w), 1.0)


def mse(preds: Array, targets: Array, mask: T.Optional[Array] = None) -> Array:
    w = _weights(preds, mask)
    return jnp.sum((preds - targets) ** 2 * w) / jnp.maximum(jnp.sum(w), 1.0)


def confusion_counts(
    preds: Array,
    targets: Array,
    num_classes: int = 2,
    mask: T.Optional[Array] = None,
) -> Array:
    """(num_classes, num_classes) confusion matrix; rows = true class."""
    w = _weights(preds, mask).reshape(-1)
    preds = preds.reshape(-1).astype(jnp.int32)
    targets = targets.reshape(-1).astype(jnp.int32)
    index = targets * num_classes + preds
    counts = jnp.zeros((num_classes * num_classes,), dtype=jnp.float32)
    counts = counts.at[index].add(w)
    return counts.reshape(num_classes, num_classes)


def fbeta_score(
    preds: Array,
    targets: Array,
    beta: float = 2.0,
    num_classes: int = 2,
    mask: T.Optional[Array] = None,
) -> Array:
    """Macro-averaged multiclass F-beta (torchmetrics MulticlassFBetaScore
    semantics: classes absent from both preds and targets are skipped from
    the macro mean)."""
    cm = confusion_counts(preds, targets, num_classes=num_classes, mask=mask)
    tp = jnp.diagonal(cm)
    fn = jnp.sum(cm, axis=1) - tp
    fp = jnp.sum(cm, axis=0) - tp

    beta2 = beta**2
    denom = (1.0 + beta2) * tp + beta2 * fn + fp
    score = jnp.where(denom > 0, (1.0 + beta2) * tp / jnp.maximum(denom, 1.0), 0.0)

    # Macro mean over classes that appear in targets or predictions.
    support = jnp.sum(cm, axis=1) + jnp.sum(cm, axis=0)
    present = (support > 0).astype(jnp.float32)
    return jnp.sum(score * present) / jnp.maximum(jnp.sum(present), 1.0)


def matthews_corrcoef(
    preds: Array,
    targets: Array,
    num_classes: int = 2,
    mask: T.Optional[Array] = None,
) -> Array:
    """Multiclass MCC (R_k statistic) from the confusion matrix."""
    cm = confusion_counts(preds, targets, num_classes=num_classes, mask=mask)
    t_sum = jnp.sum(cm, axis=1)  # per true class
    p_sum = jnp.sum(cm, axis=0)  # per predicted class
    n = jnp.sum(cm)
    correct = jnp.sum(jnp.diagonal(cm))

    cov_ytyp = correct * n - jnp.dot(t_sum, p_sum)
    cov_ypyp = n**2 - jnp.dot(p_sum, p_sum)
    cov_ytyt = n**2 - jnp.dot(t_sum, t_sum)

    denom = jnp.sqrt(jnp.maximum(cov_ypyp * cov_ytyt, 0.0))
    return jnp.where(denom > 0, cov_ytyp / jnp.maximum(denom, 1e-12), 0.0)


def probas_to_labels(x: Array, thresh: float = 0.5) -> Array:
    """Channel-last probabilities -> integer labels
    (reference lightning.py:126-136)."""
    if x.shape[-1] == 1:
        return (x[..., 0] > thresh).astype(jnp.int32)
    return jnp.argmax(x, axis=-1).astype(jnp.int32)


def dice_score(
    preds: Array,
    targets: Array,
    mask: T.Optional[Array] = None,
    smooth: float = 1e-8,
) -> Array:
    """Binary Dice over labels (used by the reference's test step)."""
    w = _weights(preds, mask)
    p = preds.astype(jnp.float32) * w
    t = targets.astype(jnp.float32) * w
    inter = jnp.sum(p * t)
    return (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def jaccard_score(
    preds: Array,
    targets: Array,
    mask: T.Optional[Array] = None,
    smooth: float = 1e-8,
) -> Array:
    """Binary IoU over labels."""
    w = _weights(preds, mask)
    p = preds.astype(jnp.float32) * w
    t = targets.astype(jnp.float32) * w
    inter = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t) - inter
    return (inter + smooth) / (union + smooth)
