"""Serving export: StableHLO artifact roundtrip (cultionet_tpu/export.py).

The reference has no serving/export path (deployment = full Lightning
stack, reference model.py:331-404); this is a TPU-native addition, so
the tests pin the artifact contract itself: baked-in params + norm
stats, int16 wire input, float32 raster outputs, and exact agreement
with the in-process predict path.
"""

import json
import zipfile

import jax
import numpy as np
import pytest

from cultionet_tpu.data.synthetic import create_batch
from cultionet_tpu.enums import AttentionTypes
from cultionet_tpu.export import (
    SERVE_ABI_VERSION,
    build_serve_fn,
    export_state,
    load_predictor,
)
from cultionet_tpu.models import CultioNet
from cultionet_tpu.train.optim import build_optimizer
from cultionet_tpu.train.step import create_train_state


NORM_MEAN = np.array([0.1, 0.2, 0.3], np.float32)
NORM_STD = np.array([1.1, 0.9, 1.2], np.float32)


@pytest.fixture(scope="module")
def tiny_state():
    rng = np.random.default_rng(0)
    batch = create_batch(
        num_channels=3, num_time=4, height=16, width=16, batch_size=2,
        rng=rng,
    )
    model = CultioNet(
        in_time=4,
        hidden_channels=4,
        attention_weights=AttentionTypes.NATTEN,
        dilations=[1, 2],
    )
    return create_train_state(
        model, build_optimizer("AdamW", 1e-3), batch, seed=0
    )


@pytest.fixture(scope="module")
def artifact(tiny_state, tmp_path_factory):
    out = tmp_path_factory.mktemp("serve") / "model.cnx"
    return export_state(
        tiny_state,
        out,
        in_time=4,
        in_channels=3,
        batch_size=2,
        chip_size=16,
        precision="fp32",
        norm_mean=NORM_MEAN,
        norm_std=NORM_STD,
        platforms=["cpu"],
        extra_meta={"hyperparams": {"hidden_channels": 4}},
    )


def test_artifact_structure(artifact):
    with zipfile.ZipFile(artifact) as zf:
        names = set(zf.namelist())
        assert {"program.bin", "meta.json"} <= names
        meta = json.loads(zf.read("meta.json").decode())
    assert meta["abi_version"] == SERVE_ABI_VERSION
    assert meta["inputs"]["x"]["shape"] == [2, 4, 16, 16, 3]
    assert meta["inputs"]["x"]["dtype"] == "int16"
    assert meta["outputs"] == ["distance", "edge", "crop"]
    assert meta["normalized"] is True
    assert meta["platforms"] == ["cpu"]
    assert meta["hyperparams"]["hidden_channels"] == 4


def test_roundtrip_matches_direct_path(tiny_state, artifact):
    rng = np.random.default_rng(1)
    x = rng.integers(0, 10000, size=(2, 4, 16, 16, 3), dtype=np.int16)
    lat = np.array([45.0, 46.0], np.float32)
    lon = np.array([-120.0, -119.0], np.float32)

    pred = load_predictor(artifact)
    out = pred(x, lat, lon)
    assert set(out) == {"distance", "edge", "crop"}
    for name, val in out.items():
        assert val.dtype == np.float32
        assert val.shape[0] == 2 and val.shape[1:3] == (16, 16)
        assert np.isfinite(val).all()

    direct = jax.jit(
        build_serve_fn(tiny_state, NORM_MEAN, NORM_STD, precision="fp32")
    )(x, lat, lon)
    for name, d in zip(("distance", "edge", "crop"), direct):
        np.testing.assert_allclose(out[name], np.asarray(d), atol=1e-5)


def test_default_latlon(artifact):
    rng = np.random.default_rng(2)
    x = rng.integers(0, 10000, size=(2, 4, 16, 16, 3), dtype=np.int16)
    pred = load_predictor(artifact)
    out = pred(x)  # lat/lon default to zeros
    assert np.isfinite(out["crop"]).all()


def test_abi_version_gate(artifact, tmp_path):
    bad = tmp_path / "bad.cnx"
    with zipfile.ZipFile(artifact) as src, zipfile.ZipFile(bad, "w") as dst:
        meta = json.loads(src.read("meta.json").decode())
        meta["abi_version"] = SERVE_ABI_VERSION + 1
        dst.writestr("program.bin", src.read("program.bin"))
        dst.writestr("meta.json", json.dumps(meta))
    with pytest.raises(ValueError, match="ABI"):
        load_predictor(bad)
