"""Mosaic fast-transcendental precision guard at production shapes.

BASELINE.md records ~5e-3 absolute f32 deviation of the on-TPU Pallas NA
kernels vs the XLA oracle (Mosaic's fast exp in the softmax), far below
bf16 training noise. This guard pins that bound at the hidden=64 model
configs (the largest head_dim the README recipe uses) so a kernel or
compiler change that degrades the transcendental path fails loudly.

TPU-only: Mosaic kernels don't execute on CPU outside interpret mode, and
interpret mode is exact (covered by tests/test_natten_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cultionet_tpu.ops.natten import neighborhood_attention_2d
from cultionet_tpu.ops.natten_pallas import na2d_pallas

ON_TPU = jax.devices()[0].platform == "tpu"

pytestmark = pytest.mark.skipif(
    not ON_TPU, reason="Mosaic kernels need a TPU (interpret mode is exact)"
)

# hidden=64 TowerUNet NA configs (models/unet_parts.py NATTEN_PARAMS with
# up_channels=4*64=256): stage-a 4 heads on 64 ch, towers 8 heads on 256 ch.
CONFIGS = [
    dict(h=100, w=100, heads=4, dim=16, kernel=3, dilation=2),
    dict(h=50, w=50, heads=8, dim=32, kernel=3, dilation=1),
    dict(h=100, w=100, heads=8, dim=32, kernel=3, dilation=1),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_f32_abs_error_vs_xla_oracle(cfg):
    rng = np.random.default_rng(42)
    shape = (2, cfg["h"], cfg["w"], cfg["heads"], cfg["dim"])
    q, k, v = (
        jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
        for _ in range(3)
    )
    got = np.asarray(
        jax.device_get(
            na2d_pallas(q, k, v, cfg["kernel"], cfg["dilation"])
        )
    )
    want = np.asarray(
        jax.device_get(
            neighborhood_attention_2d(
                q, k, v, cfg["kernel"], cfg["dilation"]
            )
        )
    )
    err = np.abs(got - want).max()
    # BASELINE.md: ~5e-3 observed; 2e-2 is the failure threshold (an order
    # of magnitude under bf16 resolution at these magnitudes would be
    # ~4e-3, so 2e-2 only trips on a genuine transcendental regression).
    assert err < 2e-2, f"max abs err {err:.4f} at {cfg}"
    assert np.isfinite(got).all()
