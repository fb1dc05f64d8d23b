"""Optimizer + LR-schedule registry (optax).

Mirrors the reference's optimizer zoo and schedulers
(lightning.py:611-683): Adam / AdamW(0.9, 0.98) / RAdam / SGD(momentum 0.9),
CosineAnnealingLR(T_max=20 epochs, eta_min=1e-5) / ExponentialLR(gamma 0.5
per epoch) / OneCycleLR (per step) / StepLR(gamma 0.5). Torch's epoch-based
schedulers become per-step schedules using ``steps_per_epoch``.
"""

import typing as T

import jax.numpy as jnp
import optax

from ..enums import LearningRateSchedulers


def build_schedule(
    name: str,
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    steplr_step_size: int = 5,
) -> optax.Schedule:
    total_steps = max(1, epochs * steps_per_epoch)

    if name == LearningRateSchedulers.ONE_CYCLE_LR:
        # torch OneCycleLR defaults: pct_start 0.3, div_factor 25,
        # final_div_factor 1e4, cosine annealing. optax's schedule NaNs
        # when the warmup/anneal boundaries collapse onto each other, so
        # keep a minimum horizon for tiny runs.
        return optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 10),
            peak_value=learning_rate,
            pct_start=0.3,
            div_factor=25.0,
            final_div_factor=1e4,
        )

    if name == LearningRateSchedulers.COSINE_ANNEALING_LR:
        t_max, eta_min = 20.0, 1e-5

        def schedule(step):
            epoch = jnp.minimum(step // steps_per_epoch, t_max)
            return eta_min + 0.5 * (learning_rate - eta_min) * (
                1.0 + jnp.cos(jnp.pi * epoch / t_max)
            )

        return schedule

    if name == LearningRateSchedulers.EXPONENTIAL_LR:
        return optax.exponential_decay(
            init_value=learning_rate,
            transition_steps=steps_per_epoch,
            decay_rate=0.5,
            staircase=True,
        )

    if name == LearningRateSchedulers.STEP_LR:
        return optax.exponential_decay(
            init_value=learning_rate,
            transition_steps=steps_per_epoch * steplr_step_size,
            decay_rate=0.5,
            staircase=True,
        )

    raise ValueError(f"Unknown LR scheduler: {name}")


def build_momentum_schedule(
    name: str, epochs: int, steps_per_epoch: int
) -> T.Optional[optax.Schedule]:
    """torch OneCycleLR cycles the optimizer momentum opposite the LR
    (cycle_momentum=True default: max 0.95 -> base 0.85 over the 30%
    warmup, back to 0.95 over the anneal). For AdamW that momentum is
    beta1 — a real training-dynamics difference vs a fixed 0.9, matched
    here for recipe parity with the reference (lightning.py:658-663)."""
    if name != LearningRateSchedulers.ONE_CYCLE_LR:
        return None
    total = max(epochs * steps_per_epoch, 10)
    warm = int(total * 0.3)

    def schedule(step):
        step = jnp.minimum(step, total)
        up = 0.95 + (0.85 - 0.95) * (step / max(warm, 1))
        frac = (step - warm) / max(total - warm, 1)
        down = 0.85 + (0.95 - 0.85) * 0.5 * (1 - jnp.cos(jnp.pi * frac))
        return jnp.where(step < warm, up, down)

    return schedule


def build_optimizer(
    optimizer: str = "AdamW",
    learning_rate: T.Union[float, optax.Schedule] = 1e-2,
    weight_decay: float = 1e-4,
    eps: float = 1e-4,
    gradient_clip_val: T.Optional[float] = None,
    gradient_clip_algorithm: str = "norm",
    accumulate_grad_batches: int = 1,
    b1_schedule: T.Optional[optax.Schedule] = None,
) -> optax.GradientTransformation:
    if optimizer == "Adam":
        tx = optax.adam(learning_rate, eps=eps)
    elif optimizer == "AdamW":
        if b1_schedule is not None:
            tx = optax.inject_hyperparams(optax.adamw)(
                learning_rate=learning_rate,
                b1=b1_schedule,
                b2=0.98,
                eps=eps,
                weight_decay=weight_decay,
            )
        else:
            tx = optax.adamw(
                learning_rate,
                b1=0.9,
                b2=0.98,
                eps=eps,
                weight_decay=weight_decay,
            )
    elif optimizer == "RAdam":
        # decoupled weight decay like torch RAdam(decoupled_weight_decay=True)
        tx = optax.chain(
            optax.scale_by_radam(b1=0.9, b2=0.99, eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(learning_rate),
        )
    elif optimizer == "SGD":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate, momentum=0.9),
        )
    else:
        raise NameError("Choose 'Adam', 'AdamW', 'RAdam', or 'SGD'.")

    if gradient_clip_val is not None:
        # 'norm' = global-norm clip (Lightning default); 'value' = per-
        # element clamp (reference gradient_clip_algorithm, args.yml).
        clip = (
            optax.clip(gradient_clip_val)
            if gradient_clip_algorithm == "value"
            else optax.clip_by_global_norm(gradient_clip_val)
        )
        tx = optax.chain(clip, tx)

    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)

    return tx
