"""Multimodal column support: opaque ``binary`` payloads + typed
metadata, with decode / feature-extraction as Arrow-batched Pandas
stages over ``mapInPandas``.

The container has no image/audio codecs (no PIL/ffmpeg), so the decode
step is STUBBED: ``decode_features`` computes deterministic features
from the raw bytes (real plumbing — schema, batching, partitioning —
with a fake decoder), and ``decode_image``/``sample_frames`` raise
``NotImplementedError`` unless their codec import succeeds. The
Spark-side shape is exactly what a real decoder plugs into.

Scale posture: binary payloads ride parquet column chunks; metadata
lives in a sibling struct so filters (mime, byte size) prune row
groups WITHOUT touching payload bytes. ``mapInPandas`` streams Arrow
batches — bound batch memory with
``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, n_channels int, "
    "mean_byte double, byte_entropy double"
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct.
    (Here the payload is the utf-8 encoded text — in production it
    would be image/audio bytes from the source system.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.octet_length(payload).alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def decode_features(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """STUB decoder (see module docstring): deterministic per-payload
    features via Arrow-batched ``mapInPandas``. A real implementation
    replaces ``_fake_decode`` with PIL/libvips calls — the Spark
    contract (schema, batch iterator, partition preservation) is
    unchanged."""
    import numpy as np

    def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                # byte walking vectorized in numpy (a pure-Python
                # per-byte loop was ~50× slower per batch); the 256-term
                # entropy sum stays a Python left fold so the result is
                # bit-identical to a naive sum() reference
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = int(arr.size)
                if n:
                    counts = np.bincount(arr, minlength=256)
                    p = counts[counts > 0] / n
                    ent = -sum((p * np.log2(p)).tolist())
                    mean = round(int(arr.sum(dtype=np.int64)) / n, 6)
                else:
                    ent, mean = 0.0, 0.0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": n,
                        # fake geometry derived from content, stable
                        "width": 1 + n % 64,
                        "height": 1 + (n // 64) % 64,
                        "n_channels": 3,
                        "mean_byte": mean,
                        "byte_entropy": round(ent, 6),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_fake_decode, FEATURE_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode — requires an imaging library the sandbox
    lacks; kept as the documented integration point."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "decode_image needs an imaging library (PIL/pillow) on the "
            "executors; use decode_features (stub) in this environment"
        ) from e
    raise NotImplementedError("PIL present but decoder not wired yet")


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  every_n: int = 30) -> DataFrame:
    """Video frame sampling — requires ffmpeg/pyav; integration point only."""
    raise NotImplementedError(
        "sample_frames needs a video codec (pyav/ffmpeg) on the executors"
    )
