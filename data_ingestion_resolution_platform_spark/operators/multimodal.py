"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns; decode and
feature extraction run as Arrow-batched ``mapInPandas`` (one Python
process per partition, whole columnar batches — never per-row Python).
The actual media decode is STUBBED (`_decode_stub`) because no codec
libraries ship in this container; the Spark-side contract — schema,
partitioning, batch iteration, output types — is real and tested, so
swapping in PIL/ffmpeg later touches only the stub body.

Scale notes: binary payloads dominate partition size, so callers should
set ``spark.sql.files.maxPartitionBytes`` low enough that a batch of
payloads fits executor memory, and keep metadata-only projections
(everything except the blob) for downstream joins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("header_hex", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
        T.StructField("channel_mean", T.DoubleType(), True),
    ]
)


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode standing in for PIL/libav.

    Real implementation would decode the container and return pixel /
    sample arrays; here we derive stable pseudo-dimensions from the
    byte content so tests have exact expectations.
    """
    n = len(payload)
    header = payload[:4].hex() if n else None
    fake_w = 16 + (n % 64)
    fake_h = 16 + ((n // 64) % 64)
    mean = (sum(payload[:256]) / min(n, 256)) if n else None
    return {
        "n_bytes": n,
        "header_hex": header,
        "fake_width": fake_w,
        "fake_height": fake_h,
        "channel_mean": mean,
    }


def multimodal_features(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Extract per-blob features via Arrow-batched ``mapInPandas``.

    The UDF sees pandas batches (zero-copy Arrow transfer for binary);
    output schema is fixed (`FEATURE_SCHEMA`) so downstream plans are
    fully typed.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda b: _decode_stub(bytes(b)))
            out = pd.DataFrame(list(feats))
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["n_bytes"] = out["n_bytes"].astype("int32")
            out["fake_width"] = out["fake_width"].astype("int32")
            out["fake_height"] = out["fake_height"].astype("int32")
            yield out

    return src.mapInPandas(extract, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, payload_col: str, id_col: str, width: int, height: int) -> DataFrame:
    """Resize plumbing: same mapInPandas shape, stubbed transform.

    Raises ``NotImplementedError`` inside the stub only if a real
    decode is requested (``strict=True`` reserved for when codecs are
    installed); default returns a deterministic truncated payload so
    the pipeline shape is exercisable end-to-end.
    """
    target = width * height // 8 + 1
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(lambda b: bytes(b)[:target]),
                    "width": width,
                    "height": height,
                }
            )

    return src.mapInPandas(resize, out_schema)
