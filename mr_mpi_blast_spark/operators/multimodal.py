"""Multimodal asset operators (beyond-reference training-data surface).

Images/audio/video ride DataFrames as opaque ``binary`` payload columns
with typed metadata (schemas.ASSETS). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, mapInPandas signatures — is real and
tested; the codec layer is pluggable:

- ``decoder="fake"`` (default): a deterministic arithmetic decode from
  the payload bytes (md5-seeded), so tests and DuckDB oracles can
  replay it exactly without image/audio libraries.
- ``decoder="real"``: raises NotImplementedError — this container has
  no PIL/ffmpeg/torchaudio; swap in a real codec by passing a callable.

Scale notes (100 TB): payloads stay in executor memory one Arrow batch
at a time (spark.sql.execution.arrow.maxRecordsPerBatch bounds rows;
for multi-MB payloads set it low). No driver collection anywhere; all
operators are narrow (per-partition) transforms except where noted.
"""

from __future__ import annotations

import hashlib
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


def real_decode(payload: bytes, modality: str) -> dict:
    raise NotImplementedError(
        "real codecs (PIL/ffmpeg/torchaudio) are not installed in this "
        "environment; pass decoder=<callable> to supply one")


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
