"""Multimodal asset operators (beyond-reference training-data surface).

Images/audio/video ride DataFrames as opaque ``binary`` payload columns
with typed metadata (schemas.ASSETS). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, mapInPandas signatures — is real and
tested; the codec layer is pluggable:

- ``decoder="fake"`` (default): a deterministic arithmetic decode from
  the payload bytes (md5-seeded), so tests and DuckDB oracles can
  replay it exactly without image/audio libraries.
- ``decoder="real"``: pure-Python BMP (image) and PCM WAV (audio)
  codecs — struct header walk + numpy pixel/sample statistics, no
  PIL/ffmpeg needed. Other containers (video, JPEG, MP3, ...) raise
  NotImplementedError; swap in a real codec by passing a callable.
  ``encode_bmp`` / ``encode_wav`` build valid payloads for tests.

Scale notes (100 TB): payloads stay in executor memory one Arrow batch
at a time (spark.sql.execution.arrow.maxRecordsPerBatch bounds rows;
for multi-MB payloads set it low). No driver collection anywhere; all
operators are narrow (per-partition) transforms except where noted.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_mpi_blast_spark.schemas import ASSET_FEATURES

FEATURE_DIM = 8


def _seed(payload: bytes) -> int:
    # first 8 md5 hex chars as int — replayable in DuckDB as
    # CAST(('0x' || substring(md5(...),1,8)) AS BIGINT)
    return int(hashlib.md5(payload).hexdigest()[:8], 16)


def fake_decode(payload: bytes, modality: str) -> dict:
    """Deterministic stand-in for the codec: metadata and an
    ``FEATURE_DIM``-dim feature vector derived arithmetically from the
    payload bytes. Replace with a real decoder in production."""
    if payload is None:
        return {"width": None, "height": None, "n_frames": None,
                "duration_s": None, "feature": None}
    s = _seed(payload)
    n = len(payload)
    width = 16 + (n % 64) if modality in ("image", "video") else None
    height = 16 + (s % 64) if modality in ("image", "video") else None
    n_frames = 1 + (s % 24) if modality == "video" else (
        1 if modality == "image" else None)
    duration_s = (round(n / 1000.0, 4) if modality in ("audio", "video")
                  else None)
    rng = np.arange(1, FEATURE_DIM + 1, dtype=np.float64)
    feature = np.round((s % 997) / (rng * 997.0), 6).astype(np.float32)
    return {"width": width, "height": height, "n_frames": n_frames,
            "duration_s": duration_s, "feature": feature.tolist()}


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal BMP writer (BITMAPINFOHEADER, 24 bpp, bottom-up):
    pixels is (H, W, 3) uint8 BGR. The test-fixture counterpart of
    _decode_bmp — round-trips exactly."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = pixels.reshape(h, w * 3)
    body = rows.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return header + body


def encode_wav(samples: np.ndarray, rate: int = 16000,
               channels: int = 1) -> bytes:
    """Minimal PCM WAV writer (16-bit): samples is int16 (interleaved
    if multi-channel). Round-trips through _decode_wav."""
    data = samples.astype("<i2").tobytes()
    block = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                      block, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def _decode_bmp(payload: bytes) -> dict:
    """Pure-Python BMP decode (BITMAPINFOHEADER, uncompressed 8/24/32
    bpp — the format's common core). Returns real dimensions and an
    8-dim feature vector from the actual pixel data (per-image mean /
    std / extrema), no imaging library required."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32):
        raise ValueError(
            f"unsupported BMP (compression={compression}, bpp={bpp})")
    height_abs = abs(height)           # negative height = top-down rows
    stride = ((width * bpp // 8) + 3) // 4 * 4
    px = np.frombuffer(payload, dtype=np.uint8,
                       count=stride * height_abs, offset=data_off)
    px = px.reshape(height_abs, stride)[:, :width * bpp // 8]
    vals = px.astype(np.float64)
    feature = np.array([
        width, height_abs, bpp,
        round(float(vals.mean()), 6), round(float(vals.std()), 6),
        float(vals.min()), float(vals.max()),
        width * height_abs,
    ], dtype=np.float32)
    return {"width": width, "height": height_abs, "n_frames": 1,
            "duration_s": None, "feature": feature.tolist()}


def _wav_chunks(payload: bytes) -> tuple[tuple, bytes]:
    """RIFF chunk walk shared by every WAV reader: returns the parsed
    fmt tuple (audio_fmt, channels, rate, byte_rate, block, bits) and
    the raw data chunk bytes; raises on missing magic or chunks."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        csz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + csz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)     # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt / data chunk")
    return fmt, data


def decode_wav_samples(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(rate, channels, int16 sample array) from a 16-bit PCM WAV —
    the exact-integer decode surface: no float statistics, so callers
    (and DuckDB oracles) can compare sample-level values bit-exactly."""
    fmt, data = _wav_chunks(bytes(payload))
    _audio_fmt, channels, rate, _byte_rate, _block, bits = fmt
    if bits != 16:
        raise ValueError(f"decode_wav_samples: 16-bit PCM only, "
                         f"got {bits}-bit")
    samples = np.frombuffer(
        data[:len(data) - (len(data) % 2)], dtype="<i2")
    return rate, channels, samples


def _decode_wav(payload: bytes) -> dict:
    """Pure-Python WAV decode (RIFF/WAVE, PCM fmt chunk): real channel
    count, sample rate, and duration from the chunk walk; feature
    vector from the actual PCM samples (16-bit) or raw data bytes."""
    fmt, data = _wav_chunks(payload)
    _audio_fmt, channels, rate, byte_rate, _block, bits = fmt
    duration_s = round(len(data) / byte_rate, 4) if byte_rate else None
    if bits == 16:
        samples = np.frombuffer(
            data[:len(data) - (len(data) % 2)], dtype="<i2").astype(np.float64)
    else:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    if not len(samples):
        samples = np.zeros(1)
    feature = np.array([
        channels, rate / 1000.0, bits,
        duration_s or 0.0,
        round(float(samples.mean()), 6),
        round(float(np.sqrt((samples ** 2).mean())), 6),
        float(samples.min()), float(samples.max()),
    ], dtype=np.float32)
    return {"width": None, "height": None, "n_frames": None,
            "duration_s": duration_s, "feature": feature.tolist()}


def real_decode(payload: bytes, modality: str) -> dict:
    """In-container real-codec floor: BMP for images and PCM WAV for
    audio decode in pure Python + numpy (struct header walk, pixel /
    sample statistics) — so decoder="real" is exercisable without
    PIL/ffmpeg. Video (and non-BMP/WAV containers) still needs a real
    library: pass decoder=<callable> to supply one."""
    if payload is None:
        return {"width": None, "height": None, "n_frames": None,
                "duration_s": None, "feature": None}
    if modality == "image":
        b = bytes(payload)
        if b[:8] == PNG_SIG:
            return _decode_png(b)
        return _decode_bmp(b)
    if modality == "audio":
        return _decode_wav(bytes(payload))
    raise NotImplementedError(
        f"no in-container codec for modality {modality!r} (BMP images "
        f"and PCM WAV audio decode natively; ffmpeg-class containers "
        f"need decoder=<callable>)")


def _resolve(decoder) -> Callable[[bytes, str], dict]:
    if decoder in (None, "fake"):
        return fake_decode
    if decoder == "real":
        return real_decode
    return decoder


def decode_assets(assets: DataFrame, decoder="fake") -> DataFrame:
    """ASSETS -> ASSET_FEATURES via Arrow-batched mapInPandas.
    Narrow transform: no shuffle, payloads never leave the executor."""
    fn = _resolve(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [fn(bytes(p) if p is not None else None, m)
                    for p, m in zip(pdf["payload"], pdf["modality"])]
            out = pd.DataFrame(rows)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            out.insert(1, "modality", pdf["modality"].values)
            yield out

    return (assets.select("asset_id", "modality", "payload")
            .mapInPandas(run, schema=ASSET_FEATURES))


def resize_images(assets: DataFrame, width: int, height: int,
                  decoder="fake") -> DataFrame:
    """Resize stub: returns the ASSETS shape with target dims recorded
    in meta. With the fake codec the payload is passed through; a real
    codec would re-encode. Plumbing (schema, meta map update, batch
    iteration) is the real contract."""
    _resolve(decoder)  # validates decoder choice, raises for "real"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                {**(m if isinstance(m, dict) else {}),
                 "resized_w": str(width), "resized_h": str(height)}
                for m in pdf["meta"]
            ]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"], "modality": pdf["modality"],
                "payload": pdf["payload"], "meta": meta})

    return (assets.filter(F.col("modality") == "image")
            .mapInPandas(run, schema=assets.schema))


def sample_frames(assets: DataFrame, every_n: int = 4,
                  decoder="fake") -> DataFrame:
    """Frame sampling for video assets: one output row per sampled
    frame (frame_no 0, every_n, 2*every_n, ... < n_frames). The frame
    payload is stubbed as a deterministic md5 digest of
    (payload, frame_no). Output explodes rows — at scale follow with
    repartition if the downstream op needs balanced partitions."""
    fn = _resolve(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_no": [], "frame_payload": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                meta = fn(raw, "video")
                for f_no in range(0, meta["n_frames"] or 0, every_n):
                    out["asset_id"].append(aid)
                    out["frame_no"].append(f_no)
                    out["frame_payload"].append(
                        hashlib.md5(raw + b":%d" % f_no).digest())
            yield pd.DataFrame(out)

    return (assets.filter(F.col("modality") == "video")
            .select("asset_id", "payload")
            .mapInPandas(
                run,
                schema="asset_id long, frame_no int, frame_payload binary"))


#: wav_roundtrip_stats sample-synthesis constants — shared verbatim by
#: the DuckDB oracle (entry_queries.multimodal_wav_roundtrip), which
#: replays the formula arithmetically instead of parsing bytes: the
#: comparison therefore proves encode_wav -> decode_wav_samples is the
#: identity on real RIFF bytes, not that two decoders agree.
WAV_RATE = 8000
WAV_N_BASE, WAV_N_MOD = 40, 17           # n = 40 + doc_id % 17
WAV_A, WAV_B, WAV_M = 7349, 2797, 4001   # s_i = (id*A + i*B) % M - 2000


def wav_roundtrip_stats(docs: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Exercise the REAL (pure-Python PCM) audio codec end-to-end
    through the Arrow-batched executor path: per document, synthesize
    a deterministic int16 sample ramp, ENCODE it to genuine RIFF/WAVE
    bytes (encode_wav), DECODE those bytes back through the real
    codec (decode_wav_samples — header walk + frombuffer, the same
    code path a production WAV scan uses), and emit exact-integer
    statistics of the decoded samples. Every emitted value is an
    int64 derived from the synthesis formula, so a DuckDB oracle can
    recompute it without touching bytes — any header-arithmetic,
    endianness, or chunk-walk defect in either codec half breaks the
    match. Narrow transform: payloads are created, decoded, and
    discarded inside one mapInPandas batch; nothing binary shuffles.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"_id": [], "n_samples": [], "sample_sum": [],
                   "sample_min": [], "sample_max": [], "rate": [],
                   "n_bytes": []}
            for did in pdf[id_col]:
                did = int(did)
                n = WAV_N_BASE + did % WAV_N_MOD
                i = np.arange(n, dtype=np.int64)
                samples = ((did * WAV_A + i * WAV_B) % WAV_M
                           - 2000).astype(np.int16)
                payload = encode_wav(samples, rate=WAV_RATE)
                rate, channels, got = decode_wav_samples(payload)
                if channels != 1:
                    raise ValueError(f"roundtrip channels={channels}")
                out["_id"].append(did)
                out["n_samples"].append(len(got))
                out["sample_sum"].append(int(got.astype(np.int64).sum()))
                out["sample_min"].append(int(got.min()))
                out["sample_max"].append(int(got.max()))
                out["rate"].append(rate)
                out["n_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    return (docs.select(id_col)
            .mapInPandas(run, schema="_id long, n_samples long, "
                                     "sample_sum long, sample_min long, "
                                     "sample_max long, rate long, "
                                     "n_bytes long")
            .withColumnRenamed("_id", id_col))


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize an ASSETS table from the documents table (the test
    corpus has no binary fixtures): payload = utf-8 text bytes,
    modality round-robin by doc_id. Deterministic, so oracles can
    derive the same values from the text column."""
    modality = (F.when(F.col("doc_id") % 3 == 0, "image")
                .when(F.col("doc_id") % 3 == 1, "audio")
                .otherwise("video"))
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source").cast("string")).alias("meta"))


# ---------------------------------------------------------------------------
# PNG (r12): the second real in-container image codec — stdlib zlib
# makes 8-bit RGB/RGBA non-interlaced PNG implementable with the
# BMP/WAV discipline (golden fixtures, encode->decode identity,
# formula-replay oracle), shrinking real_decode's NotImplementedError
# gate to genuinely-external codecs (JPEG/video containers).
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec 9.4), vectorized: a=left, b=up,
    c=upper-left; ties break left, then up — the spec's order."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a,
                    np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer (8-bit, color type 2 RGB / 6 RGBA,
    non-interlaced): signature + IHDR + one zlib IDAT + IEND, CRCs
    included. ``filter_type`` applies the SAME scanline filter (0..4)
    to every row — the decoder must invert all five, so tests and the
    registered roundtrip sweep them. Pixel filtering is per-row numpy
    (shift-and-subtract); rows are independent given the prior row."""
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise ValueError("pixels must be (H, W, 3|4) uint8")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    h, w, ch = pixels.shape
    raw = pixels.astype(np.int64)
    prior = np.zeros((w, ch), dtype=np.int64)
    out = bytearray()
    for y in range(h):
        row = raw[y]
        left = np.zeros((w, ch), dtype=np.int64)
        left[1:] = row[:-1]
        ul = np.zeros((w, ch), dtype=np.int64)
        ul[1:] = prior[:-1]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prior
        elif filter_type == 3:
            filt = row - (left + prior) // 2
        else:
            filt = row - _paeth(left, prior, ul)
        out.append(filter_type)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 6,
                       0, 0, 0)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def decode_png_pixels(payload: bytes) -> np.ndarray:
    """(H, W, channels) uint8 from an 8-bit RGB/RGBA non-interlaced
    PNG: signature check, chunk walk with CRC verification, zlib
    inflate, inversion of all five scanline filters. Filters 1/3/4
    have a spec-mandated left-pixel dependency, so unfiltering those
    rows is a per-pixel scan along the row (rows stay numpy; filter
    0/2 rows are whole-row vector ops — encoders emit long runs of
    them in practice). Unsupported shapes (palette, 16-bit,
    interlaced) fail loudly — the honest gate, not a wrong decode."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + ln > len(payload):
            # truncation is the most common real corruption — it must
            # land in the same ValueError contract as every other
            # failure, not escape as struct.error (r12 review)
            raise ValueError("truncated PNG chunk")
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or comp or filt \
            or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}; 8-bit RGB/RGBA non-interlaced only)")
    ch = 3 if color_type == 2 else 4
    if not idat:
        raise ValueError("PNG missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, w, ch), dtype=np.int64)
    prior = np.zeros((w, ch), dtype=np.int64)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=y * (1 + stride) + 1) \
            .astype(np.int64).reshape(w, ch)
        if ft == 0:
            cur = row
        elif ft == 2:
            cur = (row + prior) % 256
        elif ft in (1, 3, 4):
            cur = np.zeros((w, ch), dtype=np.int64)
            for x in range(w):
                left = cur[x - 1] if x else np.zeros(ch, dtype=np.int64)
                up = prior[x]
                ul = prior[x - 1] if x else np.zeros(ch, dtype=np.int64)
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                cur[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur
        prior = cur
    return out.astype(np.uint8)


def _decode_png(payload: bytes) -> dict:
    """ASSET_FEATURES row from a PNG — the same real-statistics shape
    as _decode_bmp (real_decode dispatches image payloads by magic)."""
    px = decode_png_pixels(payload)
    h, w, ch = px.shape
    vals = px.astype(np.float64)
    feature = np.array([
        w, h, ch * 8,
        round(float(vals.mean()), 6), round(float(vals.std()), 6),
        float(vals.min()), float(vals.max()),
        w * h,
    ], dtype=np.float32)
    return {"width": w, "height": h, "n_frames": 1,
            "duration_s": None, "feature": feature.tolist()}


#: png_roundtrip_stats pixel-synthesis constants — shared verbatim by
#: the DuckDB oracle, which replays the formula arithmetically: the
#: comparison proves encode_png -> decode_png_pixels is the identity
#: on real PNG bytes (deflate + filters + CRCs), not that two
#: decoders agree. 251 is prime so i*PNG_B walks all residues.
PNG_W_BASE, PNG_W_MOD = 4, 5     # w = 4 + doc_id % 5
PNG_H_BASE, PNG_H_MOD = 3, 4     # h = 3 + doc_id % 4
PNG_A, PNG_B, PNG_M = 97, 31, 251


def png_roundtrip_stats(docs: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Exercise the REAL PNG codec end-to-end through the
    Arrow-batched executor path: per document, synthesize a
    deterministic RGB image, ENCODE it to genuine PNG bytes with the
    scanline filter doc_id % 5 (all five filter types exercised
    across the corpus), DECODE those bytes back (signature + CRC walk
    + inflate + unfilter), and emit exact-integer statistics of the
    DECODED pixels. Every emitted value derives from the synthesis
    formula, so a DuckDB oracle recomputes it without touching bytes
    — any defect in filtering, inflation, chunk arithmetic, or CRC
    handling in either codec half breaks the match. Narrow transform:
    payloads are created, decoded, and discarded inside one
    mapInPandas batch; nothing binary shuffles."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"_id": [], "width": [], "height": [],
                   "filter_type": [], "pix_sum": [], "pix_min": [],
                   "pix_max": []}
            for did in pdf[id_col]:
                did = int(did)
                w = PNG_W_BASE + did % PNG_W_MOD
                h = PNG_H_BASE + did % PNG_H_MOD
                i = np.arange(w * h * 3, dtype=np.int64)
                px = ((did * PNG_A + i * PNG_B) % PNG_M) \
                    .astype(np.uint8).reshape(h, w, 3)
                payload = encode_png(px, filter_type=did % 5)
                got = decode_png_pixels(payload)
                if got.shape != (h, w, 3):
                    raise ValueError(f"roundtrip shape {got.shape}")
                g = got.astype(np.int64)
                out["_id"].append(did)
                out["width"].append(got.shape[1])
                out["height"].append(got.shape[0])
                out["filter_type"].append(did % 5)
                out["pix_sum"].append(int(g.sum()))
                out["pix_min"].append(int(g.min()))
                out["pix_max"].append(int(g.max()))
            yield pd.DataFrame(out)

    # spread before the codec stage: the per-doc zlib encode+decode is
    # pure Python compute and a single-row-group parquet scans as ONE
    # task — unspread, the whole corpus round-trips on one core
    # (guide §2.5; traced 1.4 s -> sub-0.3 s at sf0.1 on local[32])
    from mr_mpi_blast_spark.session import spread_for_compute
    return (spread_for_compute(docs.select(id_col), id_col)
            .mapInPandas(run, schema="_id long, width long, "
                                     "height long, filter_type long, "
                                     "pix_sum long, pix_min long, "
                                     "pix_max long")
            .withColumnRenamed("_id", id_col))
