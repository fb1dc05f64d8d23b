"""Multi-task segmentation losses in pure JAX (channel-last layout).

Behavioral parity with the reference loss zoo
(/root/reference/src/cultionet/losses/losses.py) is anchored by the golden
values in the reference test suite (tests/test_loss.py:109-145: Tanimoto
0.611/0.431, Complement 0.824/0.692, Combined 0.717/0.561, regression
0.417/0.704) — see tests/test_losses.py in this repo.

Layout: predictions are channel-LAST ``(B, H, W, C)`` (the native TPU conv
layout), targets are ``(B, H, W)`` integer labels (classification) or floats
(regression), masks are ``(B, H, W)`` 1=keep / 0=ignore.

Everything here is jit-able: no data-dependent Python control flow, no boolean
indexing (masked reductions replace the reference's ``tensor[mask]`` selects).
"""

import typing as T
from functools import partial

import jax
import jax.numpy as jnp


Array = jax.Array


def _ensure_channels_last(x: Array) -> Array:
    """(B, H, W) -> (B, H, W, 1); (B, H, W, C) unchanged."""
    if x.ndim == 3:
        return x[..., None]
    return x


def preprocess(
    inputs: Array,
    targets: Array,
    mask: T.Optional[Array] = None,
    transform_logits: bool = False,
    one_hot_targets: bool = True,
) -> T.Tuple[Array, Array]:
    """Shared loss preprocessing.

    Mirrors the semantics of the reference ``LossPreprocessing``
    (losses/losses.py:9-59): sigmoid for single-channel logits, softmax for
    multi-channel; one-hot targets when the prediction is multi-channel; the
    mask zeroes both inputs and targets.
    """
    inputs = _ensure_channels_last(inputs)
    num_classes = inputs.shape[-1]

    if transform_logits:
        if num_classes == 1:
            inputs = jax.nn.sigmoid(inputs)
        else:
            inputs = jax.nn.softmax(inputs, axis=-1)
        inputs = jnp.clip(inputs, 0.0, 1.0)

    if one_hot_targets and num_classes > 1:
        targets = jax.nn.one_hot(
            targets.astype(jnp.int32), num_classes, dtype=inputs.dtype
        )
    else:
        targets = _ensure_channels_last(targets).astype(inputs.dtype)

    if mask is not None:
        mask = _ensure_channels_last(mask).astype(inputs.dtype)
        inputs = inputs * mask
        targets = targets * mask

    return inputs, targets


def _tanimoto_distance(
    ypred: Array, ytrue: Array, smooth: float = 1e-5
) -> Array:
    """Per-sample Tanimoto distance, reduced over (H, W, C).

    Reference: losses/losses.py:221-246 (``tanimoto_dist``).
    """
    ytrue = ytrue.astype(ypred.dtype)
    reduce_dims = tuple(range(1, ypred.ndim))

    tpl = jnp.sum(ypred * ytrue, axis=reduce_dims)
    sq_sum = jnp.sum(ypred**2 + ytrue**2, axis=reduce_dims)

    numerator = tpl + smooth
    denominator = (sq_sum - tpl) + smooth
    return 1.0 - numerator / denominator


def _tanimoto_complement_distance(
    ytrue: Array, ypred: Array, smooth: float = 1e-5, depth: int = 5
) -> Array:
    """FracTAL depth-scaled Tanimoto distance, per sample.

    Reference: losses/losses.py:152-186 (``TanimotoComplementLoss``).
    """
    scale = 1.0 / depth
    reduce_dims = tuple(range(1, ypred.ndim))

    tpl = jnp.sum(ytrue * ypred, axis=reduce_dims)
    sq_sum = jnp.sum(ytrue**2 + ypred**2, axis=reduce_dims)

    denominator = jnp.zeros_like(tpl)
    for d in range(depth):
        a = 2.0**d
        b = -(2.0 * a - 1.0)
        denominator = denominator + 1.0 / ((a * sq_sum) + (b * tpl) + smooth)

    numerator = tpl + smooth
    return 1.0 - (numerator * denominator) * scale


def tanimoto_dist_loss(
    inputs: Array,
    targets: Array,
    mask: T.Optional[Array] = None,
    smooth: float = 1e-5,
    transform_logits: bool = False,
    one_hot_targets: bool = True,
) -> Array:
    """Symmetric (with-complement) Tanimoto distance loss."""
    inputs, targets = preprocess(
        inputs,
        targets,
        mask=mask,
        transform_logits=transform_logits,
        one_hot_targets=one_hot_targets,
    )
    loss1 = _tanimoto_distance(inputs, targets, smooth=smooth)
    loss2 = _tanimoto_distance(1.0 - inputs, 1.0 - targets, smooth=smooth)
    return jnp.mean((loss1 + loss2) * 0.5)


def tanimoto_complement_loss(
    inputs: Array,
    targets: Array,
    mask: T.Optional[Array] = None,
    smooth: float = 1e-5,
    depth: int = 5,
    transform_logits: bool = False,
    one_hot_targets: bool = True,
) -> Array:
    """Symmetric depth-scaled (FracTAL) Tanimoto loss."""
    inputs, targets = preprocess(
        inputs,
        targets,
        mask=mask,
        transform_logits=transform_logits,
        one_hot_targets=one_hot_targets,
    )
    loss1 = _tanimoto_complement_distance(
        targets, inputs, smooth=smooth, depth=depth
    )
    loss2 = _tanimoto_complement_distance(
        1.0 - targets, 1.0 - inputs, smooth=smooth, depth=depth
    )
    return jnp.mean((loss1 + loss2) * 0.5)


def log_cosh_loss(
    inputs: Array, targets: Array, mask: T.Optional[Array] = None
) -> Array:
    """log(cosh(pred - target)); masked mean when a mask is given.

    Reference: losses/losses.py:343-388. Uses the numerically stable identity
    log(cosh(x)) = x + softplus(-2x) - log(2).
    """
    inputs = _ensure_channels_last(inputs)
    targets = _ensure_channels_last(targets).astype(inputs.dtype)

    diff = inputs - targets
    loss = diff + jax.nn.softplus(-2.0 * diff) - jnp.log(2.0)

    if mask is not None:
        mask = _ensure_channels_last(mask).astype(inputs.dtype)
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(loss)


def class_balanced_mse_loss(
    inputs: Array, targets: Array, mask: T.Optional[Array] = None
) -> Array:
    """Class-balanced MSE (ACB-MSE) with log-cosh smoothing.

    Reference: losses/losses.py:391-485. The reference's boolean-index
    sub-means are re-expressed as masked sums / counts (identical values,
    jit-compatible). Empty classes contribute 0, matching the reference's
    NaN->0 replacement.
    """
    if inputs.ndim == 4:
        inputs = inputs[..., 0]
    if targets.ndim == 4:
        targets = targets[..., 0]
    targets = targets.astype(inputs.dtype)

    if mask is not None:
        if mask.ndim == 4:
            mask = mask[..., 0]
        valid = mask != 0
        neg_mask = (targets <= 0.5) & valid
        pos_mask = (targets > 0.5) & valid
        target_count = jnp.sum(mask.astype(inputs.dtype))
    else:
        neg_mask = targets <= 0.5
        pos_mask = ~neg_mask
        target_count = jnp.asarray(targets.size, dtype=inputs.dtype)

    sq = (inputs - targets) ** 2
    # log(cosh(x)) stable form
    logcosh = sq + jax.nn.softplus(-2.0 * sq) - jnp.log(2.0)

    def masked_mean(values: Array, m: Array) -> Array:
        count = jnp.sum(m.astype(values.dtype))
        total = jnp.sum(values * m.astype(values.dtype))
        return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)

    neg_loss = masked_mean(logcosh, neg_mask)
    pos_loss = masked_mean(logcosh, pos_mask)

    beta = jnp.sum(pos_mask.astype(inputs.dtype)) / jnp.maximum(
        target_count, 1.0
    )
    return beta * neg_loss + (1.0 - beta) * pos_loss


def boundary_loss(
    inputs: Array, targets: Array, mask: T.Optional[Array] = None
) -> Array:
    """Kervadec boundary loss: 1 - mean(pred * distance_map).

    Reference: losses/losses.py:488-552.
    """
    inputs = _ensure_channels_last(inputs)
    targets = _ensure_channels_last(targets).astype(inputs.dtype)

    if mask is not None:
        mask = _ensure_channels_last(mask).astype(inputs.dtype)
        inputs = inputs * mask
        targets = targets * mask
        hadamard_mean = jnp.sum(inputs * targets) / jnp.maximum(
            jnp.sum(mask), 1.0
        )
    else:
        hadamard_mean = jnp.mean(inputs * targets)

    return 1.0 - hadamard_mean


def _max_pool_2d(x: Array, window: T.Tuple[int, int]) -> Array:
    """Same-size max pool over (H, W) of an NHWC tensor."""
    wh, ww = window
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, wh, ww, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (wh // 2, wh // 2), (ww // 2, ww // 2), (0, 0)),
    )


def soft_skeleton(x: Array, num_iter: int = 10) -> Array:
    """Morphological soft skeleton (clDice), NHWC.

    Reference: losses/losses.py:555-645 (``SoftSkeleton``). soft_erode is the
    min of two 1-D erosions; soft_dilate a 3x3 max pool.
    """

    def soft_erode(img: Array) -> Array:
        p1 = -_max_pool_2d(-img, (3, 1))
        p2 = -_max_pool_2d(-img, (1, 3))
        return jnp.minimum(p1, p2)

    def soft_dilate(img: Array) -> Array:
        return _max_pool_2d(img, (3, 3))

    def soft_open(img: Array) -> Array:
        return soft_dilate(soft_erode(img))

    skeleton = jax.nn.relu(x - soft_open(x))

    def body(_, carry):
        img, skel = carry
        img = soft_erode(img)
        delta = jax.nn.relu(img - soft_open(img))
        skel = skel + jax.nn.relu(delta - skel * delta)
        return img, skel

    _, skeleton = jax.lax.fori_loop(0, num_iter, body, (x, skeleton))
    return skeleton


def cl_dice_loss(
    inputs: Array,
    targets: Array,
    mask: T.Optional[Array] = None,
    smooth: float = 1.0,
    num_iter: int = 10,
    transform_logits: bool = True,
) -> Array:
    """Centerline Dice loss. Reference: losses/losses.py:648-735."""
    inputs = _ensure_channels_last(inputs)
    targets = _ensure_channels_last(targets).astype(inputs.dtype)

    if transform_logits:
        inputs = jax.nn.softmax(inputs, axis=-1)[..., 1:2]

    y_pred = (inputs > 0.5).astype(inputs.dtype)
    y_pred = jnp.concatenate([1.0 - y_pred, y_pred], axis=-1)
    y_true = jnp.concatenate([1.0 - targets, targets], axis=-1)

    if mask is not None:
        mask = _ensure_channels_last(mask).astype(inputs.dtype)
        y_true = y_true * mask
        y_pred = y_pred * mask

    pred_skeleton = soft_skeleton(y_pred, num_iter=num_iter)
    true_skeleton = soft_skeleton(y_true, num_iter=num_iter)

    def precision_recall(skel: Array, m: Array) -> Array:
        return (jnp.sum(skel * m) + smooth) / (jnp.sum(skel) + smooth)

    topo_precision = precision_recall(pred_skeleton, y_true)
    topo_recall = precision_recall(true_skeleton, y_pred)

    return 1.0 - 2.0 * (topo_precision * topo_recall) / (
        topo_precision + topo_recall
    )


def tversky_loss(
    inputs: Array,
    targets: Array,
    mask: T.Optional[Array] = None,
    alpha: float = 0.4,
    beta: float = 0.6,
    smooth: float = 1.0,
    transform_logits: bool = False,
    one_hot_targets: bool = True,
) -> Array:
    """Tversky loss. Reference: losses/losses.py:738-808."""
    inputs, targets = preprocess(
        inputs,
        targets,
        mask=mask,
        transform_logits=transform_logits,
        one_hot_targets=one_hot_targets,
    )
    reduce_dims = tuple(range(1, inputs.ndim))

    tp = jnp.sum(inputs * targets, axis=reduce_dims)
    fp = jnp.sum((1.0 - targets) * inputs, axis=reduce_dims)
    fn = jnp.sum(targets * (1.0 - inputs), axis=reduce_dims)

    tversky = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return jnp.mean(1.0 - tversky)


def focal_tversky_loss(
    inputs: Array,
    targets: Array,
    mask: T.Optional[Array] = None,
    alpha: float = 0.2,
    beta: float = 0.8,
    gamma: float = 2.0,
    smooth: float = 1.0,
) -> Array:
    """Focal Tversky loss. Reference: losses/losses.py:811-863."""
    loss = tversky_loss(
        inputs, targets, mask=mask, alpha=alpha, beta=beta, smooth=smooth
    )
    return loss**gamma


class CombinedLoss:
    """Mean of several losses. Reference: losses/losses.py:62-100."""

    def __init__(self, losses: T.Sequence[T.Callable]):
        self.losses = tuple(losses)

    def __call__(
        self, inputs: Array, targets: Array, mask: T.Optional[Array] = None
    ) -> Array:
        total = 0.0
        for fn in self.losses:
            total = total + fn(inputs, targets, mask=mask)
        return total / len(self.losses)


class TanimotoDistLoss:
    def __init__(
        self,
        smooth: float = 1e-5,
        transform_logits: bool = False,
        one_hot_targets: bool = True,
    ):
        self._fn = partial(
            tanimoto_dist_loss,
            smooth=smooth,
            transform_logits=transform_logits,
            one_hot_targets=one_hot_targets,
        )

    def __call__(self, inputs, targets, mask=None):
        return self._fn(inputs, targets, mask=mask)


class TanimotoComplementLoss:
    def __init__(
        self,
        smooth: float = 1e-5,
        depth: int = 5,
        transform_logits: bool = False,
        one_hot_targets: bool = True,
    ):
        self._fn = partial(
            tanimoto_complement_loss,
            smooth=smooth,
            depth=depth,
            transform_logits=transform_logits,
            one_hot_targets=one_hot_targets,
        )

    def __call__(self, inputs, targets, mask=None):
        return self._fn(inputs, targets, mask=mask)


class LogCoshLoss:
    def __call__(self, inputs, targets, mask=None):
        return log_cosh_loss(inputs, targets, mask=mask)


class ClassBalancedMSELoss:
    def __call__(self, inputs, targets, mask=None):
        return class_balanced_mse_loss(inputs, targets, mask=mask)


class BoundaryLoss:
    def __call__(self, inputs, targets, mask=None):
        return boundary_loss(inputs, targets, mask=mask)


class CLDiceLoss:
    def __init__(self, smooth: float = 1.0, num_iter: int = 10):
        self.smooth = smooth
        self.num_iter = num_iter

    def __call__(self, inputs, targets, mask=None, transform_logits=True):
        return cl_dice_loss(
            inputs,
            targets,
            mask=mask,
            smooth=self.smooth,
            num_iter=self.num_iter,
            transform_logits=transform_logits,
        )


class TverskyLoss:
    def __init__(
        self,
        alpha: float = 0.4,
        beta: float = 0.6,
        smooth: float = 1.0,
        transform_logits: bool = False,
        one_hot_targets: bool = True,
    ):
        self._fn = partial(
            tversky_loss,
            alpha=alpha,
            beta=beta,
            smooth=smooth,
            transform_logits=transform_logits,
            one_hot_targets=one_hot_targets,
        )

    def __call__(self, inputs, targets, mask=None):
        return self._fn(inputs, targets, mask=mask)


class FocalTverskyLoss:
    def __init__(
        self,
        alpha: float = 0.2,
        beta: float = 0.8,
        gamma: float = 2.0,
        smooth: float = 1.0,
    ):
        self._fn = partial(
            focal_tversky_loss,
            alpha=alpha,
            beta=beta,
            gamma=gamma,
            smooth=smooth,
        )

    def __call__(self, inputs, targets, mask=None):
        return self._fn(inputs, targets, mask=mask)
