"""Runtime feature flags for kernel dispatch."""

import contextlib
import os
import typing as T

_USE_PALLAS_NATTEN: T.Optional[bool] = None


def set_pallas_natten(enabled: T.Optional[bool]) -> None:
    """Force the Pallas neighborhood-attention kernel on/off
    (None = auto: env CULTIONET_TPU_PALLAS_NATTEN, else TPU-platform default)."""
    global _USE_PALLAS_NATTEN
    _USE_PALLAS_NATTEN = enabled


def pallas_natten_enabled() -> bool:
    if _USE_PALLAS_NATTEN is not None:
        return _USE_PALLAS_NATTEN
    env = os.environ.get("CULTIONET_TPU_PALLAS_NATTEN")
    if env is not None:
        return env not in ("0", "false", "False")
    # Default: on for TPU (the banded Mosaic kernels beat XLA 2-10x on both
    # the forward and backward passes across every model NA config measured
    # in BASELINE.md); off elsewhere (CPU fallback is the XLA path — Mosaic
    # kernels don't run on the host outside interpret mode).
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


_USE_PALLAS_TEMPORAL: T.Optional[bool] = None


def set_pallas_temporal(enabled: T.Optional[bool]) -> None:
    """Force the Pallas temporal-attention kernel on/off (None = auto:
    env CULTIONET_TPU_PALLAS_TEMPORAL, else TPU-platform default)."""
    global _USE_PALLAS_TEMPORAL
    _USE_PALLAS_TEMPORAL = enabled


def pallas_temporal_enabled() -> bool:
    if _USE_PALLAS_TEMPORAL is not None:
        return _USE_PALLAS_TEMPORAL
    env = os.environ.get("CULTIONET_TPU_PALLAS_TEMPORAL")
    if env is not None:
        return env not in ("0", "false", "False")
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


_IDENTITY_BN: bool = False


def set_identity_bn(enabled: bool) -> None:
    """Replace every BatchNorm with identity (params not created).

    Measurement-only knob: bounds the possible gain of folding BN into
    conv weights on the inference path (experiments/bn_fold_bench.py).
    Never enable for real training/predict — outputs are wrong.
    """
    global _IDENTITY_BN
    _IDENTITY_BN = bool(enabled)


def identity_bn_enabled() -> bool:
    return _IDENTITY_BN


@contextlib.contextmanager
def force_kernel_platform(platform: str):
    """Pin Pallas-vs-XLA kernel dispatch to a *target* platform for the
    duration of the block.

    Used by serving export (export.py): ``jax.export`` traces on the local
    backend, but the artifact runs on the platform list the caller named —
    a TPU host exporting for CPU must not bake Mosaic custom calls, and a
    CPU host exporting for TPU should bake the fast Pallas kernels, so
    dispatch has to follow the target, not ``jax.devices()``.
    """
    global _USE_PALLAS_NATTEN, _USE_PALLAS_TEMPORAL
    prev = (_USE_PALLAS_NATTEN, _USE_PALLAS_TEMPORAL)
    _USE_PALLAS_NATTEN = platform == "tpu"
    _USE_PALLAS_TEMPORAL = platform == "tpu"
    try:
        yield
    finally:
        _USE_PALLAS_NATTEN, _USE_PALLAS_TEMPORAL = prev


_USE_PACKED_RESA: T.Optional[bool] = None


def set_packed_resa(enabled: T.Optional[bool]) -> None:
    """Force the lane-packed ResidualAConv branches on/off (None = auto:
    env CULTIONET_TPU_PACKED_RESA, else on)."""
    global _USE_PACKED_RESA
    _USE_PACKED_RESA = enabled


def packed_resa_enabled() -> bool:
    if _USE_PACKED_RESA is not None:
        return _USE_PACKED_RESA
    env = os.environ.get("CULTIONET_TPU_PACKED_RESA")
    if env is not None:
        return env not in ("0", "false", "False")
    # Default: on everywhere. Like the packed head, the packed ResUNet-a
    # branches are plain XLA with unchanged per-channel contractions
    # (concatenated first conv, grouped second conv), so values match the
    # unpacked path to fp round-off; on TPU the branch convs run at 2x the
    # lane fill with half the op count (BASELINE.md MFU ablation).
    return True


_USE_PACKED_HEAD: T.Optional[bool] = None


def set_packed_head(enabled: T.Optional[bool]) -> None:
    """Force the lane-packed TowerUNetFinal head on/off (None = auto:
    env CULTIONET_TPU_PACKED_HEAD, else on)."""
    global _USE_PACKED_HEAD
    _USE_PACKED_HEAD = enabled


def packed_head_enabled() -> bool:
    if _USE_PACKED_HEAD is not None:
        return _USE_PACKED_HEAD
    env = os.environ.get("CULTIONET_TPU_PACKED_HEAD")
    if env is not None:
        return env not in ("0", "false", "False")
    # Default: on everywhere. The packed head is plain XLA (no Pallas) and
    # per-output-channel contractions are unchanged, so values match the
    # unpacked path to fp round-off on any backend; on TPU it converts the
    # 2-3%-MFU stream convs (BASELINE.md MFU ablation) into 3x-wider
    # single passes.
    return True
