"""Sharded (multi-chip) train / eval steps via jit + sharding annotations.

GSPMD turns the sharding annotations into ICI collectives: gradients and
BatchNorm batch statistics become global automatically (the psum that
replaces the reference's DDP all-reduce, SURVEY.md §2.3).
"""


import jax
from jax.sharding import Mesh

from ..enums import LossTypes
from .mesh import batch_sharding, replicated
from ..train.step import (
    make_eval_step,
    make_predict_step,
    make_train_step,
    strip_static,
)


def make_sharded_train_step(
    mesh: Mesh,
    loss_name: str = LossTypes.TANIMOTO_COMBINED,
    edge_class: int = 2,
    precision: str = "bf16",
    axis_name: str = "data",
    device_augment: bool = False,
    device_augment_noise: float = 0.0,
    class_weights=None,
    state_shardings=None,
    norm_stats=None,
):
    """Jitted data-parallel train step: state replicated (or FSDP-sharded
    when ``state_shardings`` is given), batch sharded."""
    inner = make_train_step(
        loss_name=loss_name,
        edge_class=edge_class,
        precision=precision,
        jit=False,
        device_augment=device_augment,
        device_augment_noise=device_augment_noise,
        class_weights=class_weights,
        norm_stats=norm_stats,
    )
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)
    s_state = state_shardings if state_shardings is not None else repl
    jitted = jax.jit(
        inner,
        in_shardings=(s_state, data, repl),
        out_shardings=(s_state, repl),
        donate_argnums=(0,),
    )

    def wrapped(state, batch, rng):
        return jitted(state, strip_static(batch), rng)

    return wrapped


def make_sharded_eval_step(
    mesh: Mesh,
    loss_name: str = LossTypes.TANIMOTO_COMBINED,
    edge_class: int = 2,
    precision: str = "bf16",
    axis_name: str = "data",
    class_weights=None,
    state_shardings=None,
):
    inner = make_eval_step(
        loss_name=loss_name,
        edge_class=edge_class,
        precision=precision,
        jit=False,
        class_weights=class_weights,
    )
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)
    s_state = state_shardings if state_shardings is not None else repl
    jitted = jax.jit(inner, in_shardings=(s_state, data), out_shardings=repl)

    def wrapped(state, batch):
        return jitted(state, strip_static(batch))

    return wrapped


def make_sharded_predict_step(
    mesh: Mesh, precision: str = "bf16", axis_name: str = "data"
):
    inner = make_predict_step(precision=precision, jit=False)
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)
    jitted = jax.jit(inner, in_shardings=(repl, data), out_shardings=data)

    def wrapped(state, batch):
        return jitted(state, strip_static(batch))

    return wrapped
