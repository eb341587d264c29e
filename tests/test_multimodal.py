"""Multimodal operator tests: Spark plumbing (schemas, Arrow batches,
explode shapes) is real; the codec is the deterministic fake."""

import hashlib
import os

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


def test_real_decoder_rejects_non_container_bytes(assets):
    # the assets fixture's payloads are raw text bytes, not BMP/WAV:
    # the real decoder must fail loudly on them (worker-side
    # ValueError surfaces as a PythonException), never fabricate dims
    with pytest.raises(Exception, match="magic"):
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


class TestRealCodecs:
    """decoder="real": pure-Python BMP/WAV floor on actual bytes."""

    def test_bmp_roundtrip(self):
        import numpy as np
        from mr_mpi_blast_spark.operators.multimodal import (_decode_bmp,
                                                             encode_bmp)
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
        got = _decode_bmp(encode_bmp(px))
        assert (got["width"], got["height"], got["n_frames"]) == (7, 5, 1)
        f = got["feature"]
        assert f[0] == 7 and f[1] == 5 and f[2] == 24
        assert abs(f[3] - px.reshape(5, -1).mean()) < 1e-4  # real pixels
        assert f[5] == px.min() and f[6] == px.max()

    def test_wav_roundtrip(self):
        import numpy as np
        from mr_mpi_blast_spark.operators.multimodal import (_decode_wav,
                                                             encode_wav)
        t = np.arange(16000, dtype=np.float64)
        samples = (3000 * np.sin(2 * np.pi * 440 * t / 16000)).astype("int16")
        got = _decode_wav(encode_wav(samples, rate=16000))
        assert got["duration_s"] == 1.0
        f = got["feature"]
        assert f[0] == 1 and f[1] == 16.0 and f[2] == 16
        assert abs(f[5] - 3000 / 2 ** 0.5) < 25      # sine RMS = A/sqrt(2)

    def test_real_decode_through_spark_plumbing(self, spark):
        """decode_assets(decoder='real') over a DataFrame of genuine
        BMP/WAV payloads: the mapInPandas batch path carries real bytes
        end-to-end and returns real dims/durations."""
        import numpy as np
        from mr_mpi_blast_spark.operators.multimodal import (decode_assets,
                                                             encode_bmp,
                                                             encode_wav)
        rng = np.random.default_rng(5)
        rows = []
        for i in range(6):
            if i % 2 == 0:
                w, h = 4 + i, 3 + i
                px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                rows.append((i, "image", bytearray(encode_bmp(px)), {}))
            else:
                n = 8000 * (i % 3 + 1)
                s = rng.integers(-2000, 2000, size=n).astype("int16")
                rows.append((i, "audio", bytearray(encode_wav(s)), {}))
        assets = spark.createDataFrame(
            rows, "asset_id long, modality string, payload binary, "
                  "meta map<string,string>")
        got = {r["asset_id"]: r
               for r in decode_assets(assets, decoder="real").collect()}
        assert got[0]["width"] == 4 and got[0]["height"] == 3
        assert got[4]["width"] == 8 and got[4]["height"] == 7
        assert got[1]["duration_s"] == 1.0       # 16000 samples @ 16 kHz
        assert got[3]["duration_s"] == 0.5       # 8000 samples
        assert all(len(r["feature"]) == 8 for r in got.values())

    def test_unsupported_modality_raises(self):
        import pytest as _pytest
        from mr_mpi_blast_spark.operators.multimodal import real_decode
        with _pytest.raises(NotImplementedError, match="video"):
            real_decode(b"\x00\x01", "video")

    def test_bad_magic_raises(self):
        import pytest as _pytest
        from mr_mpi_blast_spark.operators.multimodal import real_decode
        with _pytest.raises(ValueError, match="BMP"):
            real_decode(b"not a bitmap at all.....", "image")


class TestGoldenFixtures:
    """Committed binary fixtures decoded by the real codecs: the bytes
    on DISK (not a same-process re-encode) must yield the pinned
    values, so a codec regression cannot hide behind a matching
    encoder bug."""

    FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

    def test_golden_bmp(self):
        from mr_mpi_blast_spark.operators.multimodal import _decode_bmp
        payload = open(os.path.join(self.FIXTURES, "golden_7x5.bmp"),
                       "rb").read()
        got = _decode_bmp(payload)
        assert (got["width"], got["height"], got["n_frames"]) == (5, 7, 1)
        f = got["feature"]
        assert f[:3] == [5.0, 7.0, 24.0]         # w, h, bpp
        assert abs(f[3] - 124.685714) < 1e-4     # pixel mean (real data)
        assert (f[5], f[6], f[7]) == (0.0, 255.0, 35.0)

    def test_golden_wav(self):
        from mr_mpi_blast_spark.operators.multimodal import (
            _decode_wav, decode_wav_samples)
        payload = open(os.path.join(self.FIXTURES, "golden_48.wav"),
                       "rb").read()
        rate, channels, samples = decode_wav_samples(payload)
        assert (rate, channels, len(samples)) == (8000, 1, 48)
        # the exact ramp the generator wrote: ((i*2797) % 4001) - 2000
        want = [((i * 2797) % 4001) - 2000 for i in range(48)]
        assert samples.tolist() == want
        meta = _decode_wav(payload)
        assert meta["duration_s"] == 0.006
        assert meta["feature"][:3] == [1.0, 8.0, 16.0]

    def test_wav_roundtrip_stats_spark(self, spark):
        """The registered query's operator over a small doc frame:
        stats equal the synthesis formula computed in python."""
        from mr_mpi_blast_spark.operators.multimodal import (
            WAV_A, WAV_B, WAV_M, WAV_N_BASE, WAV_N_MOD,
            wav_roundtrip_stats)
        docs = spark.createDataFrame([(i,) for i in range(12)],
                                     "doc_id long")
        got = {r.doc_id: r for r in wav_roundtrip_stats(docs).collect()}
        for did in range(12):
            n = WAV_N_BASE + did % WAV_N_MOD
            vals = [((did * WAV_A + i * WAV_B) % WAV_M) - 2000
                    for i in range(n)]
            r = got[did]
            assert (r.n_samples, r.sample_sum, r.sample_min,
                    r.sample_max, r.rate, r.n_bytes) == \
                (n, sum(vals), min(vals), max(vals), 8000, 44 + 2 * n)


class TestPngCodec:
    """r12: the PNG half of the real-image-codec floor — encode ->
    decode identity across every scanline filter, loud failures on
    corruption and unsupported shapes, golden bytes from disk."""

    FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

    def test_roundtrip_all_filters_rgb_rgba(self):
        import numpy as np
        from mr_mpi_blast_spark.operators.multimodal import (
            decode_png_pixels, encode_png)
        for ch in (3, 4):
            i = np.arange(13 * 11 * ch, dtype=np.int64)
            px = ((i * 89 + 7) % 256).astype(np.uint8) \
                .reshape(11, 13, ch)
            for ft in range(5):
                back = decode_png_pixels(encode_png(px, filter_type=ft))
                assert np.array_equal(back, px), (ch, ft)

    def test_golden_png(self):
        import numpy as np
        from mr_mpi_blast_spark.operators.multimodal import (
            _decode_png, decode_png_pixels)
        payload = open(os.path.join(self.FIXTURES, "golden_9x7.png"),
                       "rb").read()
        px = decode_png_pixels(payload)
        assert px.shape == (7, 9, 3)
        # the exact formula the generator wrote: (i*53 + 11) % 251
        import numpy as np
        i = np.arange(9 * 7 * 3, dtype=np.int64)
        want = ((i * 53 + 11) % 251).astype(np.uint8).reshape(7, 9, 3)
        assert np.array_equal(px, want)
        meta = _decode_png(payload)
        assert (meta["width"], meta["height"], meta["n_frames"]) \
            == (9, 7, 1)
        assert meta["feature"][:3] == [9.0, 7.0, 24.0]

    def test_real_decode_dispatches_png_by_magic(self):
        import numpy as np
        from mr_mpi_blast_spark.operators.multimodal import (
            encode_png, real_decode)
        px = np.zeros((2, 3, 3), dtype=np.uint8) + 17
        got = real_decode(encode_png(px), "image")
        assert (got["width"], got["height"]) == (3, 2)

    def test_corruption_and_unsupported_fail_loudly(self):
        import numpy as np
        import pytest as _pytest
        from mr_mpi_blast_spark.operators.multimodal import (
            decode_png_pixels, encode_png)
        px = np.zeros((3, 3, 3), dtype=np.uint8) + 5
        payload = bytearray(encode_png(px))
        payload[40] ^= 0xFF                 # flip a byte inside IDAT
        with _pytest.raises(ValueError, match="CRC"):
            decode_png_pixels(bytes(payload))
        with _pytest.raises(ValueError, match="signature"):
            decode_png_pixels(b"GIF89a not a png")
        # 16-bit / palette / interlaced headers are refused, not
        # mis-decoded: rewrite IHDR depth to 16 with a fixed CRC
        import struct
        import zlib
        good = encode_png(px)
        ihdr = bytearray(good[16:29])
        ihdr[8] = 16                        # bit depth field
        body = bytes(ihdr)
        chunk = (struct.pack(">I", 13) + b"IHDR" + body
                 + struct.pack(">I", zlib.crc32(b"IHDR" + body)
                               & 0xFFFFFFFF))
        bad = good[:8] + chunk + good[8 + 25:]
        with _pytest.raises(ValueError, match="unsupported PNG"):
            decode_png_pixels(bad)

    def test_png_roundtrip_stats_spark(self, spark):
        """The registered query's operator over a small doc frame:
        stats equal the synthesis formula computed in python."""
        from mr_mpi_blast_spark.operators.multimodal import (
            PNG_A, PNG_B, PNG_H_BASE, PNG_H_MOD, PNG_M, PNG_W_BASE,
            PNG_W_MOD, png_roundtrip_stats)
        docs = spark.createDataFrame([(i,) for i in range(15)],
                                     "doc_id long")
        got = {r.doc_id: r for r in png_roundtrip_stats(docs).collect()}
        for did in range(15):
            w = PNG_W_BASE + did % PNG_W_MOD
            h = PNG_H_BASE + did % PNG_H_MOD
            vals = [(did * PNG_A + i * PNG_B) % PNG_M
                    for i in range(w * h * 3)]
            r = got[did]
            assert (r.width, r.height, r.filter_type, r.pix_sum,
                    r.pix_min, r.pix_max) == \
                (w, h, did % 5, sum(vals), min(vals), max(vals))


def test_png_truncation_and_missing_idat_are_valueerrors():
    """r12 review: truncated payloads (cut mid-chunk) and IDAT-less
    chunk streams must land in the same ValueError contract as every
    other decode failure, not escape as struct.error/zlib.error."""
    import numpy as np
    import pytest as _pytest
    from mr_mpi_blast_spark.operators.multimodal import (
        PNG_SIG, _png_chunk, decode_png_pixels, encode_png)
    px = np.zeros((3, 3, 3), dtype=np.uint8) + 9
    good = encode_png(px)
    # cut mid-IDAT (IHDR is signature+25 bytes; IDAT starts at 33) —
    # clipping only IEND's tail is tolerated, a torn IDAT is not
    with _pytest.raises(ValueError, match="truncated"):
        decode_png_pixels(good[:41])
    import struct
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    no_idat = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="IDAT"):
        decode_png_pixels(no_idat)
