"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize / frame-sampling
run as ``mapInPandas`` Arrow-batch kernels. The actual codec step is STUBBED
(this container ships no image/audio libraries): when PIL/soundfile are
importable the real decode would slot into ``_decode_real``; otherwise a
clearly-marked deterministic fake (byte-histogram features) exercises the
exact same Spark plumbing — schema, batch shape, UDF signature, partitioning
— which is the part that matters at 100 TB (binary columns dominate scan
bytes; select only ``meta`` when features aren't needed so parquet column
pruning skips the payload entirely).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, data binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_DIM = 16

try:  # pragma: no cover - not installed in this image
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except Exception:
    _HAS_CODECS = False


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake assets: payload bytes are a seeded function of the
    asset id — an md5 COUNTER stream (md5('asset{i}:{j}') for j = 0, 1, ...),
    chosen over a chained hash so the byte stream is reproducible in plain
    SQL (md5 is bit-identical in Spark and DuckDB), which is what gives
    ``extract_features`` a real cross-engine oracle. Metadata plausible per
    kind."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                size = 256 + (i * 37) % 512
                chunks = []
                j = 0
                while 16 * len(chunks) < size:
                    chunks.append(hashlib.md5(f"asset{i}:{j}".encode()).digest())
                    j += 1
                data = b"".join(chunks)[:size]
                meta = {
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 64 + i % 128 if kind != "audio" else None,
                    "height": 48 + i % 96 if kind != "audio" else None,
                    "duration_ms": 1000 + i * 13 if kind != "image" else None,
                }
                rows.append((i, kind, data, meta))
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "data", "meta"])

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


def _fake_features(data: bytes) -> np.ndarray:
    """STUB feature extractor: 16-bin byte histogram, L1-normalized.
    Deterministic stand-in for a real image/audio embedding."""
    arr = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype("float64")
    total = hist.sum() or 1.0
    return hist / total


def extract_features(assets: DataFrame) -> DataFrame:
    """(asset_id, kind, data, meta) -> (asset_id, kind, features array<double>).

    Real Arrow plumbing; stubbed codec (see module docstring)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAS_CODECS:  # pragma: no cover
                raise NotImplementedError(
                    "real codecs detected but decode path intentionally stubbed"
                )
            feats = [
                _fake_features(bytes(d)).tolist() for d in pdf["data"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "kind": pdf["kind"], "features": feats}
            )

    return assets.mapInPandas(fn, schema="asset_id long, kind string, features array<double>")


def sample_frames(assets: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame sampling STUB: emits (asset_id, frame_idx, offset_ms) rows
    from metadata only — column-pruned scan never touches the binary payload."""
    vids = assets.filter(F.col("kind") == "video").select(
        "asset_id", F.col("meta.duration_ms").alias("dur")
    )
    return vids.select(
        "asset_id",
        F.posexplode(
            F.sequence(F.lit(0), (F.col("dur") / every_ms).cast("int"))
        ).alias("frame_idx", "tick"),
    ).select("asset_id", "frame_idx", (F.col("tick") * every_ms).alias("offset_ms"))


def resize_meta(assets: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize STUB: computes target dimensions (aspect-preserving) as column
    math; a real implementation would decode+resample in the same mapInPandas
    shape as extract_features."""
    imgs = assets.filter(F.col("kind") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_dim) / w, F.lit(max_dim) / h, F.lit(1.0))
    return imgs.select(
        "asset_id",
        w.alias("width"),
        h.alias("height"),
        F.floor(w * scale).cast("int").alias("target_width"),
        F.floor(h * scale).cast("int").alias("target_height"),
    )
