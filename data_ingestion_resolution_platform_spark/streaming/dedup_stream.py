"""Streaming near-duplicate detection at ingest: readStream over a
document change feed → per-micro-batch incremental MinHash-LSH.

The batch operator (``operators/dedup_incremental.py``) makes one CDF
epoch cost O(|Δ|); this wrapper gives it the same streaming triad as the
CDC pipeline (``streaming/pipeline.py``):

- **at-least-once delivery** from the file-stream checkpoint;
- **exactly-once effects** from the lake ledgers — the index MERGE is
  keyed by the batch id, the pairs append by ``p{batch}``;
- **crash-anywhere convergence**: the emitted pairs are identical
  whether computed against the pre- or post-merge index (changed docs'
  index entries are excluded from the "unchanged" side either way, and
  Δ bands are recomputed deterministically), so a retry after a crash
  between the index commit and the pairs append re-appends the same
  rows under the still-uncommitted pairs ledger id.

Output: an append-only ``pairs`` table (id_a, id_b, n_shared_bands,
epoch) — the running log of every candidate near-dup pair the corpus
has ever surfaced, queryable per epoch or overall — plus the maintained
``index`` table that makes the next epoch cheap.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_resolution_platform_spark.operators.dedup_incremental import (
    incremental_minhash_epoch,
)
from data_ingestion_resolution_platform_spark.sources.lake import LakeTable

#: change feed over documents: the id/text payload + CDF marker
DOC_FEED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("change_type", T.StringType()),
    ]
)


@dataclass
class DedupStream:
    spark: SparkSession
    feed_dir: str
    warehouse: str
    text_col: str = "text"
    id_col: str = "doc_id"
    minhash: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.index = LakeTable(self.spark, os.path.join(self.warehouse, "index"))
        self.pairs = LakeTable(
            self.spark, os.path.join(self.warehouse, "pairs"), append_only=True
        )
        self.checkpoint = os.path.join(self.warehouse, "_checkpoint")

    def process_batch(self, batch: DataFrame, epoch: int) -> None:
        """One micro-batch: surface new pairs, advance the index."""
        if self.index.epoch_committed(epoch) and self.pairs.ledger.committed(
            f"p{epoch}"
        ):
            return
        out = incremental_minhash_epoch(
            self.index,
            batch,
            self.text_col,
            self.id_col,
            epoch_id=epoch,
            **self.minhash,
        )
        self.pairs.append(
            out.withColumn("epoch", F.lit(epoch).cast("long")), f"p{epoch}"
        )

    def run_stream(self, available_now: bool = True, max_files: int = 4):
        stream = (
            self.spark.readStream.schema(DOC_FEED_SCHEMA)
            .option("maxFilesPerTrigger", max_files)
            .parquet(self.feed_dir)
        )

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)

        writer = stream.writeStream.foreachBatch(sink).option(
            "checkpointLocation", self.checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
