"""Serving export: StableHLO artifact roundtrip (cultionet_tpu/export.py).

The reference has no serving/export path (deployment = full Lightning
stack, reference model.py:331-404); this is a TPU-native addition, so
the tests pin the artifact contract itself: baked-in params + norm
stats, int16 wire input sanitized exactly like the dataset pipeline
(clip + optional log transform, data/datasets.py:139-162), float32
raster outputs, required lat/lon coords, and exact agreement with the
in-process predict path.

NOTE: in_time must be >= 5 — the conv temporal front end's kT=5 branch
asserts it (models/temporal.py:70, mirroring reference nunet.py:18-105).
"""

import json
import zipfile

import jax
import numpy as np
import pytest

from cultionet_tpu.data.synthetic import create_batch
from cultionet_tpu.enums import AttentionTypes
from cultionet_tpu.export import (
    CLIP_MAX,
    CLIP_MIN,
    SERVE_ABI_VERSION,
    build_serve_fn,
    export_predictor,
    export_state,
    load_predictor,
)
from cultionet_tpu.models import CultioNet
from cultionet_tpu.train.checkpoint import Checkpointer
from cultionet_tpu.train.optim import build_optimizer
from cultionet_tpu.train.step import create_train_state


NORM_MEAN = np.array([0.1, 0.2, 0.3], np.float32)
NORM_STD = np.array([1.1, 0.9, 1.2], np.float32)

IN_TIME = 5
X_SHAPE = (2, IN_TIME, 16, 16, 3)

LAT = np.array([45.0, 46.0], np.float32)
LON = np.array([-120.0, -119.0], np.float32)

MODEL_HP = {
    "in_time": IN_TIME,
    "hidden_channels": 4,
    "attention_weights": str(AttentionTypes.NATTEN),
    "dilations": [1, 2],
}


@pytest.fixture(scope="module")
def tiny_state():
    rng = np.random.default_rng(0)
    batch = create_batch(
        num_channels=3, num_time=IN_TIME, height=16, width=16, batch_size=2,
        rng=rng,
    )
    model = CultioNet(
        in_time=IN_TIME,
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
        in_time=IN_TIME,
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
    assert meta["inputs"]["x"]["shape"] == list(X_SHAPE)
    assert meta["inputs"]["x"]["dtype"] == "int16"
    # The wire-input sanitization contract is recorded in the manifest.
    assert meta["inputs"]["x"]["clip"] == [CLIP_MIN, CLIP_MAX]
    assert meta["outputs"] == ["distance", "edge", "crop"]
    assert meta["normalized"] is True
    assert meta["log_transform"] is False
    assert meta["platforms"] == ["cpu"]
    assert meta["kernels"] == "xla"  # non-TPU target: no Mosaic calls
    assert "required" in meta["coords"]
    assert meta["hyperparams"]["hidden_channels"] == 4


def test_roundtrip_matches_direct_path(tiny_state, artifact):
    rng = np.random.default_rng(1)
    x = rng.integers(0, 10000, size=X_SHAPE, dtype=np.int16)

    pred = load_predictor(artifact)
    out = pred(x, LAT, LON)
    assert set(out) == {"distance", "edge", "crop"}
    for name, val in out.items():
        assert val.dtype == np.float32
        assert val.shape[0] == 2 and val.shape[1:3] == (16, 16)
        assert np.isfinite(val).all()

    direct = jax.jit(
        build_serve_fn(tiny_state, NORM_MEAN, NORM_STD, precision="fp32")
    )(x, LAT, LON)
    for name, d in zip(("distance", "edge", "crop"), direct):
        np.testing.assert_allclose(out[name], np.asarray(d), atol=1e-5)


def test_clip_sanitizes_wire_input(artifact):
    """Out-of-range wire values (negative nodata sentinels, >10000) must be
    clipped exactly like ChipDataset._scale (data/datasets.py:102-112) — the
    served program may not diverge from the CLI predict path on them."""
    rng = np.random.default_rng(3)
    x = rng.integers(0, 10000, size=X_SHAPE, dtype=np.int16)
    x_bad = x.copy()
    x_bad[0, 0, :4, :4, 0] = -5000    # nodata sentinel -> clip to CLIP_MIN
    x_bad[1, 1, :4, :4, 1] = 20000    # overrange -> clip to CLIP_MAX
    x_ref = x.copy()
    x_ref[0, 0, :4, :4, 0] = 0        # dequantizes to 0.0 -> clip to CLIP_MIN
    x_ref[1, 1, :4, :4, 1] = 10000    # dequantizes to 1.0 == CLIP_MAX

    pred = load_predictor(artifact)
    out_bad = pred(x_bad, LAT, LON)
    out_ref = pred(x_ref, LAT, LON)
    for name in out_bad:
        np.testing.assert_allclose(out_bad[name], out_ref[name], atol=1e-6)


def test_log_transform_baked(tiny_state, tmp_path):
    """A log-trained model's artifact must apply log(x*50 + 1) before
    normalization (data/datasets.py:153-157) — and record the flag."""
    out = tmp_path / "log.cnx"
    artifact = export_state(
        tiny_state,
        out,
        in_time=IN_TIME,
        in_channels=3,
        batch_size=2,
        chip_size=16,
        precision="fp32",
        norm_mean=NORM_MEAN,
        norm_std=NORM_STD,
        log_transform=True,
        platforms=["cpu"],
    )
    with zipfile.ZipFile(artifact) as zf:
        meta = json.loads(zf.read("meta.json").decode())
    assert meta["log_transform"] is True

    rng = np.random.default_rng(4)
    x = rng.integers(0, 10000, size=X_SHAPE, dtype=np.int16)
    served = load_predictor(artifact)(x, LAT, LON)
    direct = jax.jit(
        build_serve_fn(
            tiny_state, NORM_MEAN, NORM_STD, precision="fp32",
            log_transform=True,
        )
    )(x, LAT, LON)
    for name, d in zip(("distance", "edge", "crop"), direct):
        np.testing.assert_allclose(served[name], np.asarray(d), atol=1e-5)

    # And it actually changes the program vs. the plain pipeline.
    plain = jax.jit(
        build_serve_fn(tiny_state, NORM_MEAN, NORM_STD, precision="fp32")
    )(x, LAT, LON)
    assert not np.allclose(np.asarray(direct[2]), np.asarray(plain[2]))


def test_coords_required(artifact):
    """(0, 0) is a real location: zero-filling coords must be an explicit
    opt-in, never a silent default (GeoEmbeddings, models/unet_parts.py)."""
    rng = np.random.default_rng(2)
    x = rng.integers(0, 10000, size=X_SHAPE, dtype=np.int16)
    pred = load_predictor(artifact)
    with pytest.raises(ValueError, match="lat/lon"):
        pred(x)
    out = pred(x, fill_coords=True)
    assert np.isfinite(out["crop"]).all()


# ----------------------------------------------------------------------
# export_predictor: checkpoint-store flow and pipeline-flag gating


@pytest.fixture(scope="module")
def ckpt_store(tiny_state, tmp_path_factory):
    """A real checkpoint store with pipeline flags recorded (as fit.py
    writes them, train/fit.py hyperparams block)."""
    store = tmp_path_factory.mktemp("ckpt") / "store"
    ckpt = Checkpointer(store)
    ckpt.save_last(
        tiny_state,
        epoch=0,
        hyperparams={
            **MODEL_HP,
            "in_channels": 3,
            "log_transform": False,
            "normalized_input": True,
        },
    )
    return store


@pytest.fixture(scope="module")
def norm_npz(tmp_path_factory):
    path = tmp_path_factory.mktemp("norm") / "norm.npz"
    np.savez(
        path,
        dataset_mean=NORM_MEAN,
        dataset_std=NORM_STD,
        dataset_crop_counts=np.array([10, 10]),
        dataset_edge_counts=np.array([10, 10]),
        num_channels=3,
    )
    return path


@pytest.mark.slow
def test_export_predictor_roundtrip(ckpt_store, norm_npz, tmp_path):
    out = export_predictor(
        ckpt_store,
        tmp_path / "serve.cnx",
        batch_size=2,
        chip_size=16,
        precision="fp32",
        which="last",
        norm_file=norm_npz,
        platforms=["cpu"],
    )
    pred = load_predictor(out)
    assert pred.meta["normalized"] is True
    assert pred.meta["log_transform"] is False
    x = np.random.default_rng(5).integers(
        0, 10000, size=X_SHAPE, dtype=np.int16
    )
    res = pred(x, LAT, LON)
    assert np.isfinite(res["crop"]).all()


@pytest.mark.slow
def test_export_predictor_missing_norm_raises(ckpt_store, tmp_path):
    """A norm-trained model with no sidecar must refuse to export
    (ADVICE r4: silent unnormalized export serves garbage)."""
    with pytest.raises(ValueError, match="normaliz"):
        export_predictor(
            ckpt_store,
            tmp_path / "serve.cnx",
            batch_size=2,
            chip_size=16,
            precision="fp32",
            which="last",
            norm_file=tmp_path / "does_not_exist.npz",
            platforms=["cpu"],
        )


@pytest.mark.slow
def test_export_predictor_allow_unnormalized(ckpt_store, tmp_path):
    out = export_predictor(
        ckpt_store,
        tmp_path / "serve.cnx",
        batch_size=2,
        chip_size=16,
        precision="fp32",
        which="last",
        norm_file=None,
        allow_unnormalized=True,
        platforms=["cpu"],
    )
    assert load_predictor(out).meta["normalized"] is False


@pytest.mark.slow
def test_export_predictor_unknown_log_transform_raises(
    tiny_state, tmp_path
):
    """Checkpoints predating log_transform tracking cannot be exported
    without an explicit choice (ADVICE r4: a log-trained model served
    without the transform is silent garbage)."""
    store = tmp_path / "old_store"
    Checkpointer(store).save_last(
        tiny_state,
        epoch=0,
        hyperparams={**MODEL_HP, "in_channels": 3},  # no pipeline flags
    )
    with pytest.raises(ValueError, match="log_transform"):
        export_predictor(
            store,
            tmp_path / "serve.cnx",
            batch_size=2,
            chip_size=16,
            precision="fp32",
            which="last",
            allow_unnormalized=True,
            platforms=["cpu"],
        )
    # Explicit choice + explicit unnormalized opt-in exports fine.
    out = export_predictor(
        store,
        tmp_path / "serve2.cnx",
        batch_size=2,
        chip_size=16,
        precision="fp32",
        which="last",
        log_transform=False,
        allow_unnormalized=True,
        platforms=["cpu"],
    )
    assert load_predictor(out).meta["log_transform"] is False


@pytest.mark.slow
def test_export_predictor_contradictory_log_transform_raises(
    ckpt_store, tmp_path
):
    """An explicit --log-transform that contradicts the recorded training
    pipeline must be an error, not a silent mis-export."""
    with pytest.raises(ValueError, match="contradicts"):
        export_predictor(
            ckpt_store,  # records log_transform=False
            tmp_path / "serve.cnx",
            batch_size=2,
            chip_size=16,
            precision="fp32",
            which="last",
            log_transform=True,
            allow_unnormalized=True,
            platforms=["cpu"],
        )


@pytest.mark.slow
def test_export_predictor_ignores_stale_norm_for_raw_trained_model(
    tiny_state, norm_npz, tmp_path
):
    """A checkpoint recording normalized_input=False must NOT bake a
    (stale) norm sidecar left behind by an earlier run in the same
    project — the checkpoint's record is authoritative."""
    store = tmp_path / "raw_store"
    Checkpointer(store).save_last(
        tiny_state,
        epoch=0,
        hyperparams={
            **MODEL_HP,
            "in_channels": 3,
            "log_transform": False,
            "normalized_input": False,
        },
    )
    out = export_predictor(
        store,
        tmp_path / "serve.cnx",
        batch_size=2,
        chip_size=16,
        precision="fp32",
        which="last",
        norm_file=norm_npz,  # stale sidecar present on disk
        platforms=["cpu"],
    )
    assert load_predictor(out).meta["normalized"] is False


def test_kernel_dispatch_follows_target_platform():
    """ADVICE r4: Pallas-vs-XLA dispatch must follow the export *target*,
    not the local backend (ops/flags.force_kernel_platform)."""
    from cultionet_tpu.ops.flags import (
        force_kernel_platform,
        pallas_natten_enabled,
        pallas_temporal_enabled,
    )

    before = (pallas_natten_enabled(), pallas_temporal_enabled())
    with force_kernel_platform("tpu"):
        assert pallas_natten_enabled() and pallas_temporal_enabled()
    with force_kernel_platform("cpu"):
        assert not pallas_natten_enabled()
        assert not pallas_temporal_enabled()
    assert (pallas_natten_enabled(), pallas_temporal_enabled()) == before


def test_abi_version_gate(artifact, tmp_path):
    bad = tmp_path / "bad.cnx"
    with zipfile.ZipFile(artifact) as src, zipfile.ZipFile(bad, "w") as dst:
        meta = json.loads(src.read("meta.json").decode())
        meta["abi_version"] = SERVE_ABI_VERSION + 1
        dst.writestr("program.bin", src.read("program.bin"))
        dst.writestr("meta.json", json.dumps(meta))
    with pytest.raises(ValueError, match="ABI"):
        load_predictor(bad)
