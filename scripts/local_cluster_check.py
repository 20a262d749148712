#!/usr/bin/env python3
"""Multi-executor deployment check (north-rule shape).

Run the CDC replay under a genuine multi-JVM standalone cluster —
separate worker/executor processes that fetch the packaged engine via
``--py-files`` — and assert the final table state equals a one-shot
apply over the same feed (per-row content sha256 equality).

    zip -qr /tmp/dirp.zip data_ingestion_resolution_platform_spark
    spark-submit --master 'local-cluster[4,6,4096]' \
        --py-files /tmp/dirp.zip scripts/local_cluster_check.py

This is a correctness/deployment-shape check, not a benchmark: executor
heaps default small and inter-JVM shuffle on one VM is slow — use
``bench.py --scaling`` for the performance evidence.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    spark = (
        SparkSession.builder.appName("lc_cdc_check")
        .config("spark.sql.shuffle.partitions", "24")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    print("MASTER", spark.sparkContext.master, "PAR", spark.sparkContext.defaultParallelism)

    from data_ingestion_resolution_platform_spark.operators.cdc import apply_changes
    from data_ingestion_resolution_platform_spark.sources.feed import synth_change_feed
    from data_ingestion_resolution_platform_spark.streaming.pipeline import CDCPipeline

    base = os.environ.get("LC_CHECK_DIR", "/tmp/lc_cdc_check")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    n_events = int(os.environ.get("LC_CHECK_EVENTS", "200000"))

    feed = synth_change_feed(spark, n_events=n_events, n_repos=200, seed=11, partitions=24)
    feed_dir = f"{base}/feed"
    feed.write.mode("overwrite").parquet(feed_dir)
    feed_df = spark.read.parquet(feed_dir)

    pipe = CDCPipeline(spark, feed_dir="unused", warehouse=f"{base}/wh")
    t0 = time.time()
    pipe.replay_bounded(feed_df, epochs=2)
    elapsed = time.time() - t0

    sha = lambda df: df.withColumn("content_sha", F.sha2(F.col("content"), 256)).select(  # noqa: E731
        "repo", "path", "content_sha"
    )
    final = sha(pipe.target.read())
    oneshot = sha(apply_changes(feed_df, ["repo", "path"], "lsn"))
    a = final.exceptAll(oneshot).count()
    b = oneshot.exceptAll(final).count()
    print("LC_ROWS", final.count(), "DIFFS", a, b, "SECS", round(elapsed, 1),
          "EVS", round(n_events / elapsed))
    print("LC_OK" if (a == 0 and b == 0) else "LC_BAD")
    spark.stop()
    return 0 if (a == 0 and b == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
