"""Multimodal operator tests: Spark plumbing (schemas, Arrow batches,
explode shapes) is real; the codec is the deterministic fake."""

import hashlib

import pytest

from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.multimodal import (
    FEATURE_DIM, assets_from_documents, decode_assets, fake_decode,
    resize_images, sample_frames,
)
from mr_mpi_blast_spark.schemas import ASSET_FEATURES
from mr_mpi_blast_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assets(spark):
    return assets_from_documents(load_table(spark, SF_DIR, "documents"))


def test_assets_schema(assets):
    assert [f.name for f in assets.schema.fields] == [
        "asset_id", "modality", "payload", "meta"]
    assert dict(assets.dtypes)["payload"] == "binary"
    mods = {r.modality for r in assets.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_matches_local_fake(assets):
    feats = decode_assets(assets)
    assert feats.schema == ASSET_FEATURES
    rows = {r.asset_id: r for r in feats.collect()}
    src = {r.asset_id: (bytes(r.payload), r.modality)
           for r in assets.collect()}
    assert set(rows) == set(src)
    for aid, (payload, modality) in src.items():
        want = fake_decode(payload, modality)
        got = rows[aid]
        assert got.width == want["width"] and got.height == want["height"]
        assert got.n_frames == want["n_frames"]
        if want["duration_s"] is None:
            assert got.duration_s is None
        else:
            assert abs(got.duration_s - want["duration_s"]) < 1e-9
        assert len(got.feature) == FEATURE_DIM
        for a, b in zip(got.feature, want["feature"]):
            assert abs(a - b) < 1e-6
    # modality-conditional nulls: audio has no dims, image/audio no frames>1
    audio = [r for r in rows.values() if r.modality == "audio"]
    assert audio and all(r.width is None and r.n_frames is None for r in audio)


def test_real_decoder_is_gated(assets):
    # the worker-side NotImplementedError surfaces as a PythonException
    with pytest.raises(Exception, match="not installed"):
        decode_assets(assets, decoder="real").collect()


def test_resize_meta(assets):
    out = resize_images(assets, 224, 224)
    rows = out.collect()
    assert rows and all(r.modality == "image" for r in rows)
    assert all(r.meta["resized_w"] == "224" and r.meta["resized_h"] == "224"
               for r in rows)
    # payload passthrough with the fake codec
    orig = {r.asset_id: bytes(r.payload)
            for r in assets.filter(F.col("modality") == "image").collect()}
    assert all(bytes(r.payload) == orig[r.asset_id] for r in rows)


def test_sample_frames(assets):
    frames = sample_frames(assets, every_n=4)
    rows = frames.collect()
    assert rows
    payloads = {r.asset_id: bytes(r.payload)
                for r in assets.filter(F.col("modality") == "video").collect()}
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    for aid, rs in by_asset.items():
        n_frames = fake_decode(payloads[aid], "video")["n_frames"]
        want_nos = list(range(0, n_frames, 4))
        assert sorted(r.frame_no for r in rs) == want_nos
        for r in rs:
            assert bytes(r.frame_payload) == hashlib.md5(
                payloads[aid] + b":%d" % r.frame_no).digest()
