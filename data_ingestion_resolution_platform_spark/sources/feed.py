"""Change-feed sources: deterministic synthesis + file/CSV readers.

The bench/test change feed is the BASELINE.json input_hint shape —
``(repo, path, commit, lang, content)`` plus CDC envelope columns
``(lsn, op, ts)`` — synthesized *distributedly* with ``spark.range``
and pure column expressions (xxhash64-seeded): no driver-side loops, no
Python randomness, fully reproducible at any scale. At 10^10 events the
same generator runs unchanged across 1000 executors.

Also provides the reference's CSV contact source (S1/S2/P7,
`/root/reference/backend/worker.py:257-301`): BOM-tolerant header CSV
with permissive corrupt-row routing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGE_FEED_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

_LANGS = ["py", "rs", "go", "ts", "java", "c"]
_WORDS = (
    "fn let mut pub use mod struct impl trait match return if else for while "
    "def class import from self none true false async await yield lambda "
    "func var const type interface map chan go defer select package"
).split()


def _det_u(col, seed: int):
    """Deterministic uniform in [0,1) from a column + seed (xxhash64)."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(1 << 30))).cast("double") / float(1 << 30)


def synth_change_feed(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 50,
    skew: float = 2.0,
    seed: int = 42,
    delete_frac: float = 0.05,
    partitions: int | None = None,
    content_words: int = 30,
) -> DataFrame:
    """Deterministic WAL-style change feed over source-code rows.

    - ``lsn`` = the range id (monotone, the binlog position).
    - repo choice is zipf-ish via ``u^skew`` → hot repos exist by
      construction, exercising the salting/AQE path.
    - ``op``: I/U by hash, ``delete_frac`` deletes.
    - ``content`` is pseudo-code assembled from a fixed vocabulary by
      seeded hashes — unique per (key, version) so sha256 invariants
      are meaningful.
    """
    base = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    lsn = F.col("id")
    u_repo = _det_u(lsn, seed)
    repo_idx = F.floor(F.pow(u_repo, F.lit(skew)) * n_repos).cast("int")
    path_idx = F.pmod(F.xxhash64(lsn, F.lit(seed + 1)), F.lit(paths_per_repo))
    lang_idx = F.pmod(path_idx, F.lit(len(_LANGS)))
    lang = F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (lang_idx + 1).cast("int"))
    u_op = _det_u(lsn, seed + 2)
    op = (
        F.when(u_op < delete_frac, F.lit("D"))
        .when(u_op < delete_frac + 0.35, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    # content: ``content_words`` vocabulary words picked by seeded
    # hashes + a unique tail (~6.3 bytes/word; 150 words ~ 1 KB — the
    # realistic source-file scale for compute-bound benchmarks)
    words = F.array(*[F.lit(w) for w in _WORDS])
    picks = F.transform(
        F.sequence(F.lit(1), F.lit(content_words)),
        lambda i: F.element_at(
            words, (F.pmod(F.xxhash64(lsn, i, F.lit(seed + 3)), F.lit(len(_WORDS))) + 1).cast("int")
        ),
    )
    content = F.concat_ws(" ", F.concat_ws(" ", picks), F.concat(F.lit("v"), lsn.cast("string")))
    return base.select(
        lsn.alias("lsn"),
        op.alias("op"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=lsn.cast("double"))).alias("ts"),
        F.concat(F.lit("repo_"), F.lpad(repo_idx.cast("string"), 4, "0")).alias("repo"),
        F.concat(
            F.lit("src/file_"), path_idx.cast("string"), F.lit("."), lang
        ).alias("path"),
        F.substring(F.sha2(F.concat(lsn.cast("string"), F.lit(seed)), 256), 1, 12).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def events_as_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver-provided ``events`` table to a CDC envelope.

    Deterministic op mapping (signup ⇒ insert, error ⇒ delete, rest ⇒
    update); ``event_id`` is the LSN, ``user_id`` the natural key. Used
    by the driver-facing queries so the DuckDB oracle can replicate it
    in pure SQL.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    op = (
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return ev.select(
        F.col("event_id").alias("lsn"),
        op.alias("op"),
        F.col("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )


def read_contacts_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2/P7: BOM-tolerant header CSV of contacts with corrupt-row
    routing (reference `worker.py:257-301`).

    - UTF-8 BOM handled by Spark's ``encoding=UTF-8`` + header parse.
    - ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` routes
      malformed rows to the audit path instead of failing the batch
      (the reference's MALFORMED_ROW tagging).
    - required-column check (S2): missing ``email`` header raises.
    - ``_row_number`` reproduces 1-based data line numbers starting at
      2 (header = line 1) — the reference's ordinal LSN. Correct for
      ANY partition count of a single input file: per-partition row
      counts (a bounded ≤P-row collect) become cumulative offsets, and
      rows are numbered partition-locally under them. Spark packs a
      single file's splits into partitions in file-offset order, so
      partition id order IS physical line order; for multi-file globs
      the numbering is per Spark's file packing, not concatenation
      order (the reference ingests exactly one file per job,
      `worker.py:257`).
    """
    # Read the physical header first: an explicit schema + header=True
    # binds POSITIONALLY in Spark CSV, but the reference projects by
    # column NAME (`worker.py:305-319` — extras dropped, missing ⇒
    # None), so the file's own columns define the read schema and the
    # canonical projection happens by name afterwards.
    raw_cols = (
        spark.read.option("header", True).option("inferSchema", False).csv(path).columns
    )
    clean = [c.lstrip("﻿") for c in raw_cols]
    by_lower = {c.lower(): raw for c, raw in zip(clean, raw_cols)}
    if "email" not in by_lower:
        raise ValueError("CSV file must have an 'email' column")
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in raw_cols]
        + [T.StructField("_corrupt", T.StringType(), True)]
    )
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("encoding", "UTF-8")
        .schema(schema)
        .csv(path)
    )
    wanted = ["email", "first_name", "last_name", "company"]
    cols = [
        F.col(f"`{by_lower[w]}`").alias(w)
        if w in by_lower
        else F.lit(None).cast("string").alias(w)
        for w in wanted
    ]
    base = (
        df.select(*cols, F.col("_corrupt"))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__ord", F.monotonically_increasing_id())
    )
    # two-phase numbering (same pattern as operators/packing.py): phase 1
    # collects per-partition counts (≤P rows, bounded at any file size),
    # phase 2 numbers rows partition-locally beneath cumulative offsets.
    sizes = {r["__pid"]: r["count"] for r in base.groupBy("__pid").count().collect()}
    if len(sizes) <= 1:
        # single partition: monotonically_increasing_id is already the
        # 0-based input ordinal — no window needed
        return base.withColumn("_row_number", F.col("__ord") + 2).drop(
            "__pid", "__ord"
        )
    from pyspark.sql.window import Window

    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )[F.col("__pid")]
    w = Window.partitionBy("__pid").orderBy("__ord")
    return base.withColumn(
        "_row_number", off + F.row_number().over(w) + 1
    ).drop("__pid", "__ord")
