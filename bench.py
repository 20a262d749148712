#!/usr/bin/env python3
"""Benchmark harness.

Default mode: runs the headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line::

    {"metric": "cdc_merge_apply_events_per_sec", "value": N,
     "unit": "events/sec", "queries": {...per-query seconds...},
     "sf": "...", "cdc": {...}}

The headline metric is the BASELINE.json target: sustained
change-events/sec of MERGE-apply over the source-code change feed
(synthesized deterministically at a size proportional to the rest of
the benchmark's scale).

``--scaling`` mode: re-runs the CDC replay at two parallelism levels
(N and 4N cores) in fresh subprocesses (a JVM fixes its core count at
startup) and reports throughput at both + scaling efficiency — the
sandbox evidence for the north rule's two-cluster-size criterion
(see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)


def _feed_events() -> int:
    # ~10x lineitem rows at the given sf: 600k rows at sf0.1 → 6M events
    override = os.environ.get("SPARK_GRAFT_FEED_EVENTS")
    if override:
        return int(override)
    sf = _sf_dir().rstrip("/").rsplit("sf", 1)[-1]
    try:
        return max(100_000, int(float(sf) * 60_000_000))
    except ValueError:
        return 1_000_000


def run_cdc_replay(
    parallelism: int, n_events: int, epochs: int | None = None, reps: int | None = None
) -> dict:
    """The target metric: events/sec of feed→resolve→MERGE apply.

    Measurement protocol (round-1 lesson: a cold single run undershoots
    the steady state by up to 1.7x and the headline must be what a cold
    ``python bench.py`` reproduces):
    - feed materialized to parquet first (synthesis excluded),
    - one small warmup replay on a throwaway warehouse (JVM/codegen/
      shuffle-service warmup excluded from the timed window),
    - ``reps`` timed replays on fresh warehouses with an os.sync between
      them (async writeback of a prior rep otherwise poisons the next),
    - report the MEDIAN rep.
    """
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.feed import synth_change_feed
    from data_ingestion_resolution_platform_spark.streaming.pipeline import CDCPipeline

    if epochs is None:
        epochs = int(os.environ.get("SPARK_GRAFT_EPOCHS", "4"))
    if reps is None:
        reps = int(os.environ.get("SPARK_GRAFT_CDC_REPS", "3"))
    spark = get_spark("bench_cdc", parallelism=parallelism)
    # SPARK_GRAFT_BENCH_DIR=/dev/shm puts the bench warehouse on tmpfs:
    # on a real cluster every node contributes disks/object-store
    # bandwidth, so a single shared VM disk understates scaling; tmpfs
    # models per-node storage whose bandwidth scales with cores.
    base = tempfile.mkdtemp(
        prefix="bench_wh_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    try:
        feed = synth_change_feed(
            spark, n_events, n_repos=max(100, n_events // 10_000), skew=2.0, seed=42,
            partitions=parallelism * 2,
            content_words=int(os.environ.get("SPARK_GRAFT_CONTENT_WORDS", "30")),
        )
        # materialize the feed first so we measure MERGE-apply, not synthesis
        feed_dir = os.path.join(base, "feed")
        feed.write.mode("overwrite").parquet(feed_dir)
        feed_df = spark.read.parquet(feed_dir)
        # target_mode=mor is the 10^10-event ingest configuration
        # (O(batch) delta appends; COW rewrites touched buckets) — the
        # scaling probe measures both so the storage-bound share of the
        # epoch is visible as the cow/mor gap.
        target_mode = os.environ.get("SPARK_GRAFT_TARGET_MODE", "cow")
        warm = CDCPipeline(
            spark, feed_dir="unused", warehouse=os.path.join(base, "warm"),
            target_mode=target_mode,
        )
        warm.replay_bounded(feed_df.limit(100_000), epochs=1)
        runs = []
        for rep in range(reps):
            wh = os.path.join(base, f"wh{rep}")
            pipe = CDCPipeline(
                spark, feed_dir="unused", warehouse=wh, target_mode=target_mode
            )
            os.sync()  # drain dirty pages so timing is apply-only
            t0 = time.time()
            epoch_stats = pipe.replay_bounded(feed_df, epochs=epochs)
            elapsed = time.time() - t0
            n_final = pipe.target.read().count()
            phases: dict[str, float] = {}
            for st in epoch_stats:
                for k, v in st.get("phase_seconds", {}).items():
                    phases[k] = round(phases.get(k, 0.0) + v, 3)
            runs.append((elapsed, n_final, phases))
            shutil.rmtree(wh, ignore_errors=True)
        runs.sort(key=lambda r: r[0])
        elapsed, n_final, phases = runs[len(runs) // 2]
        return {
            "parallelism": parallelism,
            "events": n_events,
            "epochs": epochs,
            "reps": reps,
            "seconds": round(elapsed, 3),
            "seconds_all_reps": [round(r[0], 3) for r in runs],
            "phase_seconds": phases,
            "events_per_sec": round(n_events / elapsed, 1),
            "final_rows": n_final,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_resolve_core(parallelism: int, n_events: int) -> dict:
    """Disk-free scaling probe: the fused resolve+detect aggregation
    (the engine's compute core) over an in-memory synthesized feed.

    The end-to-end replay on this sandbox shares ONE local disk across
    both parallelism levels, so its wall time is latency/IO-bound and
    cannot exhibit executor scaling; on a real cluster each node brings
    its own disks + object-store bandwidth. This probe isolates the
    part whose cost DOES scale with executor count.
    """
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.functions.hashing import content_sha256
    from data_ingestion_resolution_platform_spark.operators.cdc import resolve_and_detect
    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.feed import synth_change_feed

    spark = get_spark("bench_core", parallelism=parallelism)
    feed = synth_change_feed(
        spark, n_events, n_repos=max(100, n_events // 10_000), skew=2.0, seed=42,
        partitions=parallelism * 2,
        content_words=int(os.environ.get("SPARK_GRAFT_CONTENT_WORDS", "150")),
    )
    sig = F.struct(F.col("lang"), content_sha256(F.col("content")).alias("sha"))

    def run(df):
        r = resolve_and_detect(
            df, ["repo", "path"], sig, "lsn",
            candidate_cols=["commit", "lang"], max_candidates=10,
            wide_cols=["content"],
        )
        n = r.winners.count()
        r.unpersist()
        return n

    run(feed.limit(10_000))  # codegen/JIT warmup outside the timed window
    t0 = time.time()
    n_win = run(feed)
    elapsed = time.time() - t0
    return {
        "parallelism": parallelism,
        "events": n_events,
        "seconds": round(elapsed, 3),
        "events_per_sec": round(n_events / elapsed, 1),
        "winners": n_win,
    }


def run_growth_sweep(parallelism: int, adaptive: bool) -> dict:
    """Target-growth sweep: does per-epoch MERGE cost track the TOUCHED
    set or the TOTAL target size?

    Phase 1 grows the target with insert epochs (fresh repos each).
    Phase 2 times single-repo update epochs against the grown target —
    the canonical CDC shape (a micro-batch touches few repos out of
    many). ``adaptive=True`` = linear-hashing splits at a small
    max_bucket_bytes; ``adaptive=False`` = fixed initial bucket count
    (the round-1 design). At 100 TB the fixed layout rewrites
    O(target/n_buckets) per touched bucket; adaptive keeps bucket size
    ~constant so updates rewrite O(batch + a few bucket-sized files).
    """
    import tempfile

    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.lake import PartitionedLakeTable

    spark = get_spark("bench_growth", parallelism=parallelism)
    wh = tempfile.mkdtemp(
        prefix="bench_growth_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    rows_per_epoch = int(os.environ.get("SPARK_GRAFT_GROWTH_ROWS", "400000"))
    repos_per_epoch = 16
    grow_epochs = int(os.environ.get("SPARK_GRAFT_GROWTH_EPOCHS", "14"))
    update_epochs = 4

    # incompressible ~192 B contents (sha256 hex x3): parquet/snappy
    # cannot shrink them, so staged-byte measurements track real data
    def batch(epoch: int, repo_lo: int, n_repos: int, n_rows: int, update: bool):
        sha = F.sha2((F.col("id") + epoch * 10_000_000).cast("string"), 256)
        return spark.range(n_rows).select(
            (F.col("id") + epoch * 10_000_000).alias("lsn"),
            F.lit("U" if update else "I").alias("op"),
            F.concat(
                F.lit("repo_"), (repo_lo + F.pmod(F.col("id"), F.lit(n_repos))).cast("string")
            ).alias("repo"),
            F.concat(F.lit("src/f"), F.pmod(F.col("id"), F.lit(n_rows)).cast("string"), F.lit(".py")).alias("path"),
            F.concat(sha, sha, sha).alias("content"),
        )

    tbl = PartitionedLakeTable(
        spark, os.path.join(wh, "t"), bucket_keys=["repo"], n_buckets=32,
        max_bucket_bytes=(4 << 20) if adaptive else (1 << 60),
    )
    grow_secs, upd_secs, buckets = [], [], []
    try:
        for e in range(grow_epochs):
            t0 = time.time()
            tbl.merge(batch(e, repo_lo=e * repos_per_epoch, n_repos=repos_per_epoch,
                            n_rows=rows_per_epoch, update=False),
                      ["repo", "path"], epoch_id=e)
            grow_secs.append(round(time.time() - t0, 3))
            buckets.append(tbl.n_live_buckets())
        total_rows = tbl.read().count()
        # single-repo micro-batches against the grown target: the
        # canonical CDC update shape. Cost should track ONE bucket's
        # bytes, not the target's.
        for e in range(update_epochs):
            t0 = time.time()
            tbl.merge(batch(100 + e, repo_lo=e * repos_per_epoch, n_repos=1,
                            n_rows=5000, update=True),
                      ["repo", "path"], epoch_id=100 + e)
            upd_secs.append(round(time.time() - t0, 3))
        return {
            "adaptive": adaptive,
            "rows_per_epoch": rows_per_epoch,
            "final_rows": total_rows,
            "final_buckets": tbl.n_live_buckets(),
            "grow_epoch_secs": grow_secs,
            "single_repo_update_secs": upd_secs,
            "buckets_per_epoch": buckets,
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def run_ivf_growth(parallelism: int) -> dict:
    """Maintained-IVF growth sweep: does a FIXED change epoch's index
    maintenance cost track the touched cells or the whole corpus?

    Configuration mirrors how the index is operated at scale: n_cells
    grows with the corpus so rows-per-cell stays bounded (the codebook
    is a deterministic k-means-shaped cents dict, which routes cell
    assignment through the Arrow/numpy backend at every size). The
    epoch is held constant — 32 deletes + 32 inserts whose vectors are
    copies of same-cell members, so it touches exactly ONE cell at
    every corpus size. CellPartitionedIvf.maintain must therefore cost
    ~the same at every size (reads + rewrites one bounded cell), while
    the full rebuild arm grows with N — the measured gap IS the reason
    the 100 TB deployment maintains instead of rebuilding."""
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.operators.similarity import (
        CellPartitionedIvf,
        ivf_kmeans_index,
    )
    from data_ingestion_resolution_platform_spark.session import get_spark

    spark = get_spark("bench_ivf_growth", parallelism=parallelism)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base_n = base.count()
    dim = len(base.select("embedding").first()[0])
    reps = [int(x) for x in os.environ.get("SPARK_GRAFT_IVF_REPLICAS", "16,64,256").split(",")]
    rows_per_cell = int(os.environ.get("SPARK_GRAFT_IVF_ROWS_PER_CELL", "2000"))
    n_maintain = int(os.environ.get("SPARK_GRAFT_IVF_MAINTAIN_REPS", "3"))

    def cents_for(n_cells: int) -> dict[int, list[int]]:
        # deterministic quantized codebook (no training pass needed for
        # a cost sweep; cell balance is rough but the epoch's target
        # cell is measured, not assumed)
        return {
            j: [((j * 2654435761 + d * 40503) % 1201) - 600 for d in range(dim)]
            for j in range(n_cells)
        }

    wh = tempfile.mkdtemp(
        prefix="bench_ivfg_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    out: dict = {
        "metric": "ivf_epoch_cost_vs_corpus_growth",
        "base_rows": base_n,
        "dim": dim,
        "rows_per_cell_target": rows_per_cell,
        "parallelism": parallelism,
        "sizes": [],
    }
    try:
        for k_rep in reps:
            n = base_n * k_rep
            n_cells = max(4, n // rows_per_cell)
            cents = cents_for(n_cells)
            corpus = base.withColumn(
                "r", F.explode(F.sequence(F.lit(0), F.lit(k_rep - 1)))
            ).select(
                (F.col("vec_id") + F.col("r") * base_n).alias("vec_id"), "embedding"
            )
            # fixed epoch: the most-populated cell of the replica-0 slice
            a0 = ivf_kmeans_index(base, cents, "embedding", "vec_id", n_cells)
            target = (
                a0.groupBy("cell").count().orderBy(F.col("count").desc(), "cell").first()
            )
            members = [
                r.neighbor_id
                for r in a0.filter(F.col("cell") == target.cell)
                .orderBy("neighbor_id")
                .limit(64)
                .collect()
            ]
            dels, srcs = members[:32], members[32:64] or members[:32]
            del_rows = base.filter(F.col("vec_id").isin(dels)).withColumn(
                "change_type", F.lit("delete")
            )
            ins_rows = (
                base.filter(F.col("vec_id").isin(srcs))
                .withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000))
                .withColumn("change_type", F.lit("insert"))
            )
            changes = del_rows.unionByName(ins_rows).select(
                "change_type", "vec_id", "embedding"
            )
            root = os.path.join(wh, f"ivf_{k_rep}")
            idx = CellPartitionedIvf(spark, root, n_cells=n_cells, cents=cents)
            t0 = time.time()
            idx.build(corpus, "embedding", "vec_id", epoch_id="b")
            rebuild_s = round(time.time() - t0, 3)
            touched_rows = idx.read([target.cell]).count()
            # untimed warmup apply: the first maintain of a session pays
            # the Arrow worker-pool fork + codegen warmup (~10 s) that a
            # live pipeline pays once, not per epoch
            idx.maintain(changes, "embedding", "vec_id", epoch_id=None)
            secs = []
            for _ in range(n_maintain):
                # epoch_id=None: the rewrite is idempotent, so re-applying
                # measures the identical touched-cell read+rewrite cost
                t0 = time.time()
                idx.maintain(changes, "embedding", "vec_id", epoch_id=None)
                secs.append(round(time.time() - t0, 3))
            out["sizes"].append(
                {
                    "replicas": k_rep,
                    "rows": n,
                    "n_cells": n_cells,
                    "target_cell": int(target.cell),
                    "touched_rows": touched_rows,
                    "rebuild_s": rebuild_s,
                    "maintain_secs": secs,
                    "maintain_median_s": sorted(secs)[len(secs) // 2],
                }
            )
        s0, s1 = out["sizes"][0], out["sizes"][-1]
        out["rebuild_growth"] = round(s1["rebuild_s"] / max(s0["rebuild_s"], 1e-9), 2)
        out["maintain_growth"] = round(
            s1["maintain_median_s"] / max(s0["maintain_median_s"], 1e-9), 2
        )
        out["corpus_growth"] = round(s1["rows"] / s0["rows"], 2)
        return out
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def run_cms_growth(parallelism: int) -> dict:
    """Maintained-sketch growth sweep: does a FIXED change epoch's
    count-min maintenance cost track the epoch or the corpus?

    The sketch state is depth×width cells at every corpus size, so the
    comparison isolates the two plan shapes: REBUILD scans the whole
    corpus (O(N) — explode ×depth, map-side combine down to the grid),
    while MAINTAIN aggregates only the epoch's signed delta and
    MERGEs the touched cells (O(Δ + grid)). The epoch is held constant
    (1k update pre/post pairs with net-zero cell effect, so repeated
    applies measure the identical touched-cell read+rewrite cost); the
    measured gap is the reason the 100 TB deployment maintains the
    sketch per CDF epoch instead of recounting."""
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.operators.sketch import (
        cms_cells,
        maintain_cms,
    )
    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.lake import LakeTable

    spark = get_spark("bench_cms_growth", parallelism=parallelism)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    base_n = base.count()
    item = "concat(event_type, '/', cast(pmod(user_id, 100) as string))"
    depth, width = 4, 256
    reps = [int(x) for x in os.environ.get("SPARK_GRAFT_CMS_REPLICAS", "1,4,16").split(",")]
    n_maintain = int(os.environ.get("SPARK_GRAFT_CMS_MAINTAIN_REPS", "3"))
    epoch_rows = base.orderBy("event_id").limit(1000)
    changes = (
        epoch_rows.withColumn("change_type", F.lit("update_preimage"))
        .unionByName(epoch_rows.withColumn("change_type", F.lit("update_postimage")))
        .persist()
    )
    changes.count()
    wh = tempfile.mkdtemp(
        prefix="bench_cmsg_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    out: dict = {
        "metric": "cms_epoch_cost_vs_corpus_growth",
        "base_rows": base_n,
        "depth": depth,
        "width": width,
        "epoch_rows": 1000,
        "parallelism": parallelism,
        "sizes": [],
    }
    try:
        for k_rep in reps:
            corpus = base.withColumn(
                "r", F.explode(F.sequence(F.lit(0), F.lit(k_rep - 1)))
            ).drop("r")
            t = LakeTable(spark, os.path.join(wh, f"cms_{k_rep}"))
            t0 = time.time()
            t.merge(
                cms_cells(corpus, F.expr(item), depth, width),
                ["d", "bucket"],
                epoch_id="seed",
            )
            rebuild_s = round(time.time() - t0, 3)
            # untimed warmup apply (codegen + worker warmup, paid once)
            maintain_cms(t, changes, item, depth, width, epoch_id=None)
            secs = []
            for _ in range(n_maintain):
                # net-zero epoch: state-invariant, so each apply measures
                # the identical delta-agg + touched-cell MERGE cost
                t0 = time.time()
                maintain_cms(t, changes, item, depth, width, epoch_id=None)
                secs.append(round(time.time() - t0, 3))
            out["sizes"].append(
                {
                    "replicas": k_rep,
                    "rows": base_n * k_rep,
                    "cells": t.read().count(),
                    "rebuild_s": rebuild_s,
                    "maintain_secs": secs,
                    "maintain_median_s": sorted(secs)[len(secs) // 2],
                }
            )
        s0, s1 = out["sizes"][0], out["sizes"][-1]
        out["rebuild_growth"] = round(s1["rebuild_s"] / max(s0["rebuild_s"], 1e-9), 2)
        out["maintain_growth"] = round(
            s1["maintain_median_s"] / max(s0["maintain_median_s"], 1e-9), 2
        )
        out["corpus_growth"] = round(s1["rows"] / s0["rows"], 2)
        return out
    finally:
        changes.unpersist()
        shutil.rmtree(wh, ignore_errors=True)


def run_search_growth(parallelism: int) -> dict:
    """Maintained-inverted-index growth sweep: does a FIXED change
    epoch's index maintenance cost track the epoch or the corpus — and
    how much does the postings TABLE BACKEND matter?

    Three plan shapes over the same logical index advance:
    - REBUILD: seed_search_index from scratch — O(corpus) tokenize +
      full shuffle + full write; grows linearly.
    - MAINTAIN/COW: maintain_search_index with postings+doclen in plain
      ``LakeTable`` — the delta aggregation is O(Δ) but every epoch's
      MERGE rewrites the whole postings file set (COW), so write cost
      grows with the index.
    - MAINTAIN/MoR: same maintenance with postings+doclen in
      ``MorLakeTable`` (ratio-triggered compaction) — each epoch
      appends one O(Δ) delta; the full-index rewrite cost moves to
      amortized compaction. This is the 100 TB configuration.

    The epoch is a constant 500-doc net-zero pre/post pair set (state-
    invariant, so repeated applies measure identical work). termstats /
    stats stay COW everywhere (vocabulary-sized / 1 row)."""
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.operators.search import (
        maintain_search_index,
        seed_search_index,
    )
    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.lake import (
        LakeTable,
        MorLakeTable,
    )

    spark = get_spark("bench_search_growth", parallelism=parallelism)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    base_n = base.count()
    reps = [int(x) for x in os.environ.get("SPARK_GRAFT_SEARCH_REPLICAS", "1,16,64").split(",")]
    n_maintain = int(os.environ.get("SPARK_GRAFT_SEARCH_MAINTAIN_REPS", "3"))
    epoch_docs = base.orderBy("doc_id").limit(500)
    changes = (
        epoch_docs.withColumn("change_type", F.lit("update_preimage"))
        .unionByName(epoch_docs.withColumn("change_type", F.lit("update_postimage")))
        .persist()
    )
    changes.count()
    wh = tempfile.mkdtemp(
        prefix="bench_searchg_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    out: dict = {
        "metric": "search_index_epoch_cost_vs_corpus_growth",
        "base_rows": base_n,
        "epoch_docs": 500,
        "parallelism": parallelism,
        "sizes": [],
    }

    def cow_tables(root):
        return tuple(
            LakeTable(spark, os.path.join(root, n))
            for n in ("postings", "termstats", "doclen", "stats")
        )

    def mor_tables(root):
        return (
            MorLakeTable(
                spark, os.path.join(root, "postings"), ["term", "doc_id"],
                "_mult", compact_ratio=0.3,
            ),
            LakeTable(spark, os.path.join(root, "termstats")),
            MorLakeTable(
                spark, os.path.join(root, "doclen"), ["doc_id"], "dl",
                compact_ratio=0.3,
            ),
            LakeTable(spark, os.path.join(root, "stats")),
        )

    try:
        # untimed JVM/codegen warmup: a throwaway seed+maintain on a tiny
        # corpus so the first timed size doesn't absorb startup cost
        warm = cow_tables(os.path.join(wh, "warmup"))
        seed_search_index(*warm, base.limit(50), epoch_id="seed")
        maintain_search_index(*warm, changes, epoch_id=None)
        for k_rep in reps:
            corpus = (
                base.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(k_rep - 1))))
                .select(
                    (
                        F.col("doc_id")
                        + F.col("r").cast("long") * F.lit(100_000_000).cast("long")
                    ).alias("doc_id"),
                    "text",
                )
            )
            row: dict = {"replicas": k_rep, "docs": base_n * k_rep}
            for flavor, mk in (("cow", cow_tables), ("mor", mor_tables)):
                tables = mk(os.path.join(wh, f"{flavor}_{k_rep}"))
                t0 = time.time()
                seed_search_index(*tables, corpus, epoch_id="seed")
                if flavor == "cow":
                    row["rebuild_s"] = round(time.time() - t0, 3)
                    row["postings_rows"] = tables[0].read().count()
                # untimed warmup apply (codegen + worker warmup)
                maintain_search_index(*tables, changes, epoch_id=None)
                secs = []
                for _ in range(n_maintain):
                    t0 = time.time()
                    maintain_search_index(*tables, changes, epoch_id=None)
                    secs.append(round(time.time() - t0, 3))
                row[f"maintain_{flavor}_secs"] = secs
                row[f"maintain_{flavor}_median_s"] = sorted(secs)[len(secs) // 2]
            out["sizes"].append(row)
        s0, s1 = out["sizes"][0], out["sizes"][-1]
        out["corpus_growth"] = round(s1["docs"] / s0["docs"], 2)
        out["rebuild_growth"] = round(s1["rebuild_s"] / max(s0["rebuild_s"], 1e-9), 2)
        for flavor in ("cow", "mor"):
            out[f"maintain_{flavor}_growth"] = round(
                s1[f"maintain_{flavor}_median_s"]
                / max(s0[f"maintain_{flavor}_median_s"], 1e-9),
                2,
            )
        return out
    finally:
        changes.unpersist()
        shutil.rmtree(wh, ignore_errors=True)


def run_qsample_growth(parallelism: int) -> dict:
    """Quantile-sketch growth sweep (r4 verdict Next-round #2): does a
    FIXED insert epoch's maintenance cost track the epoch or the corpus?

    State is ≤ k structs per group at every corpus size, so the sweep
    isolates the plan shapes: REBUILD is the salted bottom-k over the
    whole corpus (O(N)); MAINTAIN unions the epoch's delta with the
    touched groups' stored sketches and re-truncates (O(Δ + touched·k)).
    The epoch is held constant (1k inserts with ids disjoint from the
    corpus); re-applying the identical epoch is state-invariant because
    the merge dedupes on the full (h, id, v) struct, so each timed rep
    measures the same touched-group read + re-truncate + MERGE cost."""
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.operators.sketch import (
        maintain_qsample,
        qsample_sketch,
    )
    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.lake import LakeTable

    spark = get_spark("bench_qsample_growth", parallelism=parallelism)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    base_n = base.count()
    k = 256
    reps = [int(x) for x in os.environ.get("SPARK_GRAFT_QS_REPLICAS", "1,4,16").split(",")]
    n_maintain = int(os.environ.get("SPARK_GRAFT_QS_MAINTAIN_REPS", "3"))
    changes = (
        base.orderBy("event_id")
        .limit(1000)
        .select(
            F.pmod(F.col("user_id"), F.lit(40)).cast("string").alias("g"),
            # ids disjoint from every replicated corpus id
            (F.col("event_id") + F.lit(1 << 40)).alias("id"),
            F.floor(F.col("value") * 100).cast("long").alias("val"),
        )
        .withColumn("change_type", F.lit("insert"))
        .persist()
    )
    changes.count()
    wh = tempfile.mkdtemp(
        prefix="bench_qsg_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    out: dict = {
        "metric": "qsample_epoch_cost_vs_corpus_growth",
        "base_rows": base_n,
        "k": k,
        "groups": 40,
        "epoch_rows": 1000,
        "parallelism": parallelism,
        "sizes": [],
    }
    try:
        # global untimed warmup: JIT + codegen + parquet reader init
        # otherwise land entirely on the FIRST size's rebuild, making the
        # growth ratios read backwards (r5: 18.2 s cold vs 4-5 s warm)
        warm = LakeTable(spark, os.path.join(wh, "qs_warm"))
        warm.merge(
            qsample_sketch(
                base.limit(5000).select(
                    F.pmod(F.col("user_id"), F.lit(40)).cast("string").alias("g"),
                    F.col("event_id").alias("id"),
                    F.floor(F.col("value") * 100).cast("long").alias("val"),
                ),
                ["g"], "val", "id", k=k,
            ),
            ["g"], epoch_id="warm",
        )
        maintain_qsample(warm, changes, ["g"], "val", "id", k=k, epoch_id=None)
        for k_rep in reps:
            corpus = base.withColumn(
                "r", F.explode(F.sequence(F.lit(0), F.lit(k_rep - 1)))
            ).select(
                F.pmod(F.col("user_id"), F.lit(40)).cast("string").alias("g"),
                # replica-unique id keeps the sampling key a true row id
                (F.col("event_id") * F.lit(k_rep) + F.col("r")).alias("id"),
                F.floor(F.col("value") * 100).cast("long").alias("val"),
            )
            t = LakeTable(spark, os.path.join(wh, f"qs_{k_rep}"))
            t0 = time.time()
            t.merge(qsample_sketch(corpus, ["g"], "val", "id", k=k), ["g"], epoch_id="seed")
            rebuild_s = round(time.time() - t0, 3)
            # untimed warmup apply (codegen + worker warmup, paid once)
            maintain_qsample(t, changes, ["g"], "val", "id", k=k, epoch_id=None)
            secs = []
            for _ in range(n_maintain):
                t0 = time.time()
                maintain_qsample(t, changes, ["g"], "val", "id", k=k, epoch_id=None)
                secs.append(round(time.time() - t0, 3))
            out["sizes"].append(
                {
                    "replicas": k_rep,
                    "rows": base_n * k_rep,
                    "sketch_rows": t.read().count(),
                    "rebuild_s": rebuild_s,
                    "maintain_secs": secs,
                    "maintain_median_s": sorted(secs)[len(secs) // 2],
                }
            )
        s0, s1 = out["sizes"][0], out["sizes"][-1]
        out["rebuild_growth"] = round(s1["rebuild_s"] / max(s0["rebuild_s"], 1e-9), 2)
        out["maintain_growth"] = round(
            s1["maintain_median_s"] / max(s0["maintain_median_s"], 1e-9), 2
        )
        out["corpus_growth"] = round(s1["rows"] / s0["rows"], 2)
        return out
    finally:
        changes.unpersist()
        shutil.rmtree(wh, ignore_errors=True)


def run_cc_growth(parallelism: int) -> dict:
    """Maintained-dup-cluster growth sweep: does a FIXED change epoch's
    cluster maintenance cost track the affected components or the
    corpus?

    The graph is synthesized directly (chains of 5 — many small
    components, the dup-cluster shape) because the operator under
    measurement is `graph_incremental.maintain_clusters`, not pair
    generation. Each epoch is held constant: 128 new docs each bridging
    two existing components + 128 deletes that split their chains —
    O(hundreds) affected components at every corpus size. REBUILD is
    the full `connected_components` run batch mode would pay per
    delivery (grows with N). MAINTAIN is measured on both store
    backends: plain COW (epoch compute is Δ-sized but the labels
    rewrite is O(N) — the honest reason the 100 TB deployment buckets)
    and PartitionedLakeTable (touched-bucket rewrites — the scale
    configuration). A final exceptAll parity check against the full
    recompute guards the sweep's correctness."""
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.operators.graph import (
        connected_components,
    )
    from data_ingestion_resolution_platform_spark.operators.graph_incremental import (
        build_cluster_state,
        maintain_clusters,
    )
    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.lake import (
        LakeTable,
        PartitionedLakeTable,
    )

    spark = get_spark("bench_cc_growth", parallelism=parallelism)
    n0 = int(os.environ.get("SPARK_GRAFT_CC_NODES", "100000"))
    reps = [int(x) for x in os.environ.get("SPARK_GRAFT_CC_REPLICAS", "1,4,16").split(",")]
    backends = os.environ.get("SPARK_GRAFT_CC_BACKENDS", "cow,bucketed").split(",")
    n_epochs = int(os.environ.get("SPARK_GRAFT_CC_EPOCHS", "3"))
    n_delta = 128

    def chain_edges(n: int):
        return (
            spark.range(n)
            .filter(F.col("id") % 5 != 4)
            .filter(F.col("id") + 1 < n)
            .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        )

    def nodes_df(n: int):
        return spark.range(n).select(F.col("id").alias("doc_id"))

    wh = tempfile.mkdtemp(
        prefix="bench_ccg_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    out: dict = {
        "metric": "cc_epoch_cost_vs_corpus_growth",
        "base_nodes": n0,
        "delta_per_epoch": {"bridges": n_delta, "deletes": n_delta},
        "epochs": n_epochs,
        "parallelism": parallelism,
        "sizes": [],
    }
    try:
        for k_rep in reps:
            n = n0 * k_rep
            stride = n // n_delta
            entry: dict = {"replicas": k_rep, "nodes": n}
            for backend in backends:
                root = os.path.join(wh, f"{backend}_{k_rep}")
                if backend == "bucketed":
                    labels = PartitionedLakeTable(
                        spark, root + "/labels", ["id"], n_buckets=32
                    )
                    edges = PartitionedLakeTable(
                        spark, root + "/edges", ["id_a", "id_b"], n_buckets=32
                    )
                else:
                    labels = LakeTable(spark, root + "/labels")
                    edges = LakeTable(spark, root + "/edges")
                build_cluster_state(
                    labels, edges, chain_edges(n), nodes_df(n), epoch_id="seed"
                )
                secs = []
                for j in range(1, n_epochs + 1):
                    # removals ≡ j (mod stride) split their chains; bridge
                    # endpoints ≡ 0 and 7 (mod stride) stay disjoint from
                    # every rep's removals
                    rm = spark.range(n_delta).select(
                        (F.col("id") * stride + j).alias("doc_id")
                    )
                    new_ids = spark.range(n_delta).select(
                        (F.lit(n) + (j - 1) * n_delta + F.col("id")).alias("doc_id")
                    )
                    a = spark.range(n_delta).select(
                        (F.lit(n) + (j - 1) * n_delta + F.col("id")).alias("id_a"),
                        (F.col("id") * stride).alias("id_b"),
                    )
                    b = spark.range(n_delta).select(
                        (F.lit(n) + (j - 1) * n_delta + F.col("id")).alias("id_a"),
                        (F.col("id") * stride + 7).alias("id_b"),
                    )
                    delta = a.unionByName(b)
                    t0 = time.monotonic()
                    maintain_clusters(
                        labels, edges, delta, new_ids, rm, epoch_id=f"e{j}"
                    )
                    secs.append(round(time.monotonic() - t0, 3))
                entry[f"maintain_{backend}_secs"] = secs
                entry[f"maintain_{backend}_median_s"] = sorted(secs)[len(secs) // 2]
                if backend == backends[0]:
                    # rebuild arm + parity, measured once per size
                    live_edges = edges.read().select("id_a", "id_b")
                    live_nodes = labels.read().select(F.col("id").alias("doc_id"))
                    t0 = time.monotonic()
                    cc = connected_components(
                        live_edges, "id_a", "id_b", id_out="id"
                    )
                    full = (
                        live_nodes.select(F.col("doc_id").alias("id"))
                        .join(cc, on="id", how="left")
                        .select(
                            "id",
                            F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
                        )
                    ).localCheckpoint(eager=True)
                    entry["rebuild_s"] = round(time.monotonic() - t0, 3)
                    got = labels.read().select("id", "cluster_id")
                    entry["parity_ok"] = (
                        got.exceptAll(full).count() == 0
                        and full.exceptAll(got).count() == 0
                    )
                    entry["edges_rows"] = live_edges.count()
            out["sizes"].append(entry)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    s0, s1 = out["sizes"][0], out["sizes"][-1]
    out["corpus_growth"] = round(s1["nodes"] / s0["nodes"], 2)
    out["rebuild_growth"] = round(s1["rebuild_s"] / s0["rebuild_s"], 2)
    for backend in backends:
        k = f"maintain_{backend}_median_s"
        if k in s0 and k in s1:
            out[f"maintain_{backend}_growth"] = round(s1[k] / s0[k], 2)
    return out


def run_tri_growth(parallelism: int) -> dict:
    """Maintained-triangle-count growth sweep: does a FIXED edge-delta
    epoch's maintenance cost track the delta or the corpus?

    Graph = disjoint 5-cliques (triangle-rich, the dup-cluster shape:
    10 edges / 10 triangles per clique). Epoch held constant: 128
    intra-clique edge removals (3 triangles destroyed each) + 128
    cross-clique bridge additions (wedge probes that close nothing) —
    O(hundreds) touched edges at every corpus size. REBUILD = the batch
    degree-oriented wedge join over the full store (O(m^1.5), grows
    with N); MAINTAIN probes only around the delta. The maintained
    count is asserted equal to the batch recount at every size."""
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.operators.graph import (
        triangle_count,
    )
    from data_ingestion_resolution_platform_spark.operators.graph_incremental import (
        build_triangle_state,
        maintain_triangle_count,
    )
    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.lake import LakeTable

    spark = get_spark("bench_tri_growth", parallelism=parallelism)
    n0 = int(os.environ.get("SPARK_GRAFT_TRI_NODES", "100000"))
    reps = [int(x) for x in os.environ.get("SPARK_GRAFT_TRI_REPLICAS", "1,4,16").split(",")]
    n_epochs = int(os.environ.get("SPARK_GRAFT_TRI_EPOCHS", "3"))
    n_delta = 128

    def clique_edges(n: int):
        # nodes 5k..5k+4 fully connected: pairs (5k+i, 5k+j), i<j<5
        node = spark.range(n // 5).select((F.col("id") * 5).alias("base"))
        pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
        pieces = [
            node.select(
                (F.col("base") + i).alias("id_a"), (F.col("base") + j).alias("id_b")
            )
            for i, j in pairs
        ]
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    wh = tempfile.mkdtemp(
        prefix="bench_trig_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    out: dict = {
        "metric": "triangle_epoch_cost_vs_corpus_growth",
        "base_nodes": n0,
        "delta_per_epoch": {"removals": n_delta, "bridges": n_delta},
        "epochs": n_epochs,
        "parallelism": parallelism,
        "sizes": [],
    }
    try:
        for k_rep in reps:
            n = n0 * k_rep
            n_cliques = n // 5
            stride = n_cliques // n_delta
            root = os.path.join(wh, f"s{k_rep}")
            edges = LakeTable(spark, root + "/edges")
            stats = LakeTable(spark, root + "/stats")
            build_cluster_seed = clique_edges(n)
            build_triangle_state(edges, stats, build_cluster_seed, epoch_id="seed")
            secs = []
            for j in range(1, n_epochs + 1):
                # remove edge (5k, 5k+j) in every stride-th clique
                # (j ∈ 1..3 → distinct edges per rep), bridge 5k+4 to the
                # next clique's 5k+2 (closes nothing)
                sel = spark.range(n_delta).select(
                    (F.col("id") * stride * 5).alias("base")
                )
                removals = sel.select(
                    F.col("base").alias("id_a"), (F.col("base") + j).alias("id_b")
                )
                adds = sel.select(
                    (F.col("base") + 4).alias("id_a"),
                    (F.col("base") + 5 + j).alias("id_b"),
                )
                t0 = time.monotonic()
                maintain_triangle_count(
                    edges, stats, adds, removals, epoch_id=f"e{j}"
                )
                secs.append(round(time.monotonic() - t0, 3))
            entry: dict = {
                "replicas": k_rep,
                "nodes": n,
                "maintain_secs": secs,
                "maintain_median_s": sorted(secs)[len(secs) // 2],
            }
            live = edges.read().select("id_a", "id_b")
            t0 = time.monotonic()
            full = triangle_count(live, "id_a", "id_b").collect()[0]
            entry["rebuild_s"] = round(time.monotonic() - t0, 3)
            row = stats.read().collect()[0]
            entry["parity_ok"] = (
                row["n_triangles"] == full["n_triangles"]
                and row["n_edges"] == full["n_edges"]
            )
            entry["n_triangles"] = int(row["n_triangles"])
            out["sizes"].append(entry)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    s0, s1 = out["sizes"][0], out["sizes"][-1]
    out["corpus_growth"] = round(s1["nodes"] / s0["nodes"], 2)
    out["rebuild_growth"] = round(s1["rebuild_s"] / s0["rebuild_s"], 2)
    out["maintain_growth"] = round(
        s1["maintain_median_s"] / s0["maintain_median_s"], 2
    )
    return out


def run_rescan_growth(parallelism: int) -> dict:
    """Group-rescan growth sweep (funnel read model): does a FIXED
    touched-user epoch's rescan cost track the touched groups or the
    events lake?

    Base = synthetic per-user event histories (8 events/user, the
    view→click→purchase shape). Epoch held constant: 256 users get one
    event deleted + one backdated view inserted — the worst case that
    invalidates all three funnel stages. MAINTAIN = rescan exactly
    those users (broadcast-pruned lake probe + group-sized MERGE);
    REBUILD = the full-lake funnel recompute batch mode would pay. The
    maintained store is asserted equal to the rebuild at every size."""
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.operators.rescan import (
        maintain_group_rescan,
    )
    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.lake import LakeTable

    spark = get_spark("bench_rescan_growth", parallelism=parallelism)
    n0 = int(os.environ.get("SPARK_GRAFT_RESCAN_USERS", "50000"))
    reps = [int(x) for x in os.environ.get("SPARK_GRAFT_RESCAN_REPLICAS", "1,4,16").split(",")]
    n_epochs = int(os.environ.get("SPARK_GRAFT_RESCAN_EPOCHS", "3"))
    n_delta = 256
    ev_per_user = 8
    types = ["view", "click", "purchase", "view", "click", "other", "view", "purchase"]

    def events_for(n_users: int):
        ev = spark.range(n_users * ev_per_user).select(
            F.col("id").alias("event_id"),
            (F.col("id") % n_users).alias("user_id"),
            (F.col("id") / n_users).cast("long").alias("seq"),
        )
        type_expr = F.element_at(
            F.array(*[F.lit(t) for t in types]), (F.col("seq") + 1).cast("int")
        )
        # per-user jitter so stage minima differ across users
        return ev.select(
            "event_id",
            "user_id",
            type_expr.alias("event_type"),
            F.timestamp_seconds(
                F.lit(1704067200) + F.col("seq") * 3600 + F.col("user_id") % 97
            ).alias("ts"),
        )

    def funnel_rows(ev):
        from data_ingestion_resolution_platform_spark.plans.queries import (
            _funnel_per_user,
        )

        return _funnel_per_user(ev.select("user_id", "event_type", "ts"))

    wh = tempfile.mkdtemp(
        prefix="bench_rescang_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    out: dict = {
        "metric": "rescan_epoch_cost_vs_base_growth",
        "base_users": n0,
        "events_per_user": ev_per_user,
        "delta_users_per_epoch": n_delta,
        "epochs": n_epochs,
        "parallelism": parallelism,
        "sizes": [],
    }
    try:
        for k_rep in reps:
            n_users = n0 * k_rep
            stride = n_users // n_delta
            root = os.path.join(wh, f"s{k_rep}")
            lake = LakeTable(spark, root + "/events")
            store = LakeTable(spark, root + "/funnel")
            lake.merge(events_for(n_users), ["event_id"], epoch_id="seed")
            store.merge(funnel_rows(lake.read()), ["user_id"], epoch_id="seed")

            def recompute(aff):
                return funnel_rows(lake.read().join(F.broadcast(aff), on="user_id"))

            secs = []
            for j in range(1, n_epochs + 1):
                users = spark.range(n_delta).select(
                    (F.col("id") * stride + j).alias("user_id")
                )
                # delete the user's first view (event seq 0) and insert a
                # backdated view — both flip all three stages
                dels = users.select(
                    F.col("user_id").alias("event_id"), "user_id"
                ).withColumn("_del", F.lit(True))
                ins = users.select(
                    (F.col("user_id") + 100_000_000 * j).alias("event_id"),
                    "user_id",
                ).withColumn("_del", F.lit(False))
                batch = ins.unionByName(dels).withColumn(
                    "event_type", F.lit("view")
                ).withColumn(
                    "ts", F.to_timestamp(F.lit("2020-01-01 00:00:00"))
                )
                # the lake advance is the TARGET-table write (bucketed /
                # MoR at scale — benched by the other sweeps); the timed
                # window here is the read-model rescan alone
                lake.merge(
                    batch, ["event_id"], epoch_id=f"l{j}",
                    delete_condition=F.col("_del"), drop_cols=["_del"],
                )
                t0 = time.monotonic()
                maintain_group_rescan(
                    store, ["user_id"], users, recompute, epoch_id=f"e{j}"
                )
                secs.append(round(time.monotonic() - t0, 3))
            entry: dict = {
                "replicas": k_rep,
                "users": n_users,
                "maintain_secs": secs,
                "maintain_median_s": sorted(secs)[len(secs) // 2],
            }
            t0 = time.monotonic()
            full = funnel_rows(lake.read()).localCheckpoint(eager=True)
            entry["rebuild_s"] = round(time.monotonic() - t0, 3)
            got = store.read().select("user_id", "v", "c", "p")
            entry["parity_ok"] = (
                got.exceptAll(full).count() == 0
                and full.exceptAll(got).count() == 0
            )
            out["sizes"].append(entry)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    s0, s1 = out["sizes"][0], out["sizes"][-1]
    out["corpus_growth"] = round(s1["users"] / s0["users"], 2)
    out["rebuild_growth"] = round(s1["rebuild_s"] / s0["rebuild_s"], 2)
    out["maintain_growth"] = round(
        s1["maintain_median_s"] / s0["maintain_median_s"], 2
    )
    return out


def run_ann_recall(parallelism: int) -> dict:
    """ANN recall/cost frontier (r4 verdict Next-round #5): recall@10
    vs scan fraction across n_probe x n_cells for BOTH codebooks
    (trained k-means vs seeded hyperplanes), against the brute-force
    exact top-10 as ground truth.

    Note on residual re-ranking: ivf_probe already scores candidates
    with the EXACT quantized cosine inside the probed cells, so every
    point on this frontier is re-ranked by construction — recall loss
    comes solely from true neighbors living in unprobed cells. The
    lever is therefore (n_cells, n_probe) i.e. scan fraction, not
    score refinement."""
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.operators.kmeans import kmeans_fit
    from data_ingestion_resolution_platform_spark.operators.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_kmeans_index,
        ivf_probe,
        kmeans_probe_cells,
        query_probe_cells,
    )
    from data_ingestion_resolution_platform_spark.session import get_spark

    spark = get_spark("bench_ann_recall", parallelism=parallelism)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k = 10
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )
    n_corpus = emb.count()
    queries = emb.filter(F.pmod("vec_id", F.lit(31)) == 1).limit(64).persist()
    nq = queries.count()
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, "embedding", "vec_id", k=k).collect()
    }
    rows: list[dict] = []
    for n_cells in (16, 64):
        cents = kmeans_fit(emb, "embedding", "vec_id", k=n_cells, iters=2)
        variants = {
            "kmeans": ivf_kmeans_index(emb, cents, "embedding", "vec_id", n_cells),
            "hyperplane": ivf_index(emb, "embedding", "vec_id", n_cells=n_cells),
        }
        for name, idx in variants.items():
            idx = idx.persist()
            sizes = {r["cell"]: r["n"] for r in idx.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
            for n_probe in (1, 2, 4, 8, 16):
                if n_probe > n_cells:
                    continue
                if name == "kmeans":
                    probes = kmeans_probe_cells(queries, cents, "embedding", "vec_id", n_cells, n_probe)
                else:
                    probes = query_probe_cells(queries, "embedding", "vec_id", n_cells, n_probe)
                probes = probes.persist()
                probe_rows = probes.select("query_id", "cell").collect()
                t0 = time.time()
                res = ivf_probe(idx, probes, k=k).collect()
                probe_s = round(time.time() - t0, 3)
                probes.unpersist()
                hits = sum((r["query_id"], r["neighbor_id"]) in truth for r in res)
                scanned = sum(sizes.get(r["cell"], 0) for r in probe_rows)
                rows.append({
                    "codebook": name,
                    "n_cells": n_cells,
                    "n_probe": n_probe,
                    "recall_at_10": round(hits / max(len(truth), 1), 4),
                    "scan_fraction": round(scanned / max(nq * n_corpus, 1), 4),
                    "probe_s": probe_s,
                })
            idx.unpersist()
    emb.unpersist()
    queries.unpersist()
    return {
        "metric": "ann_recall_frontier",
        "corpus_rows": n_corpus,
        "queries": nq,
        "k": k,
        "parallelism": parallelism,
        "in_cell_scoring": "exact quantized cosine (re-ranked by construction)",
        "rows": rows,
    }


def run_scd2_growth(parallelism: int) -> dict:
    """SCD2-history growth sweep (r3 verdict #7): does per-epoch
    historization cost track the OPEN set or the ACCUMULATED history?

    Per-epoch fixed overhead (job launch + the delta window agg, ~4 s at
    any size) hides an O(|history|) term until the history is GB-sized,
    so growing it epoch-by-epoch shows nothing. Instead: bulk-seed the
    history (untimed) at a SMALL and a LARGE version count — same key
    count and open set, only the closed-version depth differs — then
    time identical update epochs against each. The plain-LakeTable arm
    pays O(|history|) per epoch twice (the ``is_current == 1`` scan and
    the COW rewrite), so its epoch cost must grow toward the large
    seed; the Scd2HistoryStore arm reads and rewrites only the open
    snapshot, so ``large_over_small`` ≈ 1 is the flat-cost claim."""
    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.operators.scd import (
        Scd2HistoryStore,
        historize_epoch,
    )
    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.lake import LakeTable

    spark = get_spark("bench_scd2_growth", parallelism=parallelism)
    keys_n = int(os.environ.get("SPARK_GRAFT_SCD2_KEYS", "100000"))
    small_v = int(os.environ.get("SPARK_GRAFT_SCD2_SMALL_VERSIONS", "4"))
    large_v = int(os.environ.get("SPARK_GRAFT_SCD2_LARGE_VERSIONS", "40"))
    upd_keys = int(os.environ.get("SPARK_GRAFT_SCD2_UPD_KEYS", "20000"))
    upd_epochs = int(os.environ.get("SPARK_GRAFT_SCD2_UPD_EPOCHS", "3"))
    wh = tempfile.mkdtemp(
        prefix="bench_scd2_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )

    # incompressible ~192 B payload (sha256 hex ×3) so history bytes are
    # real data the rewrite cannot compress away
    def _sha(col):
        s = F.sha2(col.cast("string"), 256)
        return F.concat(s, s, s)

    def seed_feed(versions: int):
        # every event changes attr ⇒ every event is a version boundary:
        # |keys| open versions + |keys|·(versions-1) closed ones
        n = keys_n * versions
        return spark.range(n).select(
            F.concat(F.lit("k"), F.pmod(F.col("id"), F.lit(keys_n)).cast("string"))
            .alias("key"),
            F.col("id").cast("long").alias("lsn"),
            F.lit("I").alias("op"),
            _sha(F.col("id")).alias("attr"),
        )

    def upd_delta(e: int, base_lsn: int):
        return spark.range(upd_keys).select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
            (F.lit(base_lsn) + e * upd_keys + F.col("id")).cast("long").alias("lsn"),
            F.lit("U").alias("op"),
            _sha(F.col("id") + (e + 7) * 10_000_000).alias("attr"),
        )

    out: dict = {
        "metric": "scd2_epoch_cost_vs_history_growth",
        "keys": keys_n,
        "small_versions": small_v,
        "large_versions": large_v,
        "update_keys_per_epoch": upd_keys,
        "parallelism": parallelism,
    }
    try:
        # untimed JVM/codegen warmup so the first timed arm isn't penalized
        warm = LakeTable(spark, os.path.join(wh, "warm"))
        historize_epoch(warm, seed_feed(1).limit(2000), ["key"], "lsn", ["attr"], 0)
        historize_epoch(warm, upd_delta(0, 10**9).limit(2000), ["key"], "lsn", ["attr"], 1)
        for arm in ("plain_laketable", "split_store"):
            res: dict = {}
            for size, versions in (("small", small_v), ("large", large_v)):
                root = os.path.join(wh, f"{arm}_{size}")
                hist = (
                    LakeTable(spark, root)
                    if arm == "plain_laketable"
                    else Scd2HistoryStore(spark, root, ["key"])
                )
                historize_epoch(  # untimed bulk seed
                    hist, seed_feed(versions), ["key"], "lsn", ["attr"], "seed"
                )
                base = keys_n * versions + 1
                secs = []
                for e in range(upd_epochs):
                    t0 = time.time()
                    historize_epoch(
                        hist, upd_delta(e, base), ["key"], "lsn", ["attr"], e
                    )
                    secs.append(round(time.time() - t0, 3))
                res[size] = {
                    "epoch_secs": secs,
                    "median_s": sorted(secs)[len(secs) // 2],
                    "history_rows": hist.read().count(),
                }
                shutil.rmtree(root, ignore_errors=True)
            res["large_over_small"] = round(
                res["large"]["median_s"] / res["small"]["median_s"], 2
            )
            out[arm] = res
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return out


def run_growth_sweep_mor(parallelism: int) -> dict:
    """Merge-on-read arm of the growth sweep: the same insert-growth +
    single-repo-update schedule as :func:`run_growth_sweep`, but the
    target is a ``MorLakeTable`` — each epoch is an O(batch) delta
    append regardless of target size, with ONE timed compaction at the
    end of the growth phase. Reports the read-back time too, because
    MoR's bargain is cheap ingest for a reconcile-at-read cost."""
    import tempfile

    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.lake import MorLakeTable

    spark = get_spark("bench_growth_mor", parallelism=parallelism)
    wh = tempfile.mkdtemp(
        prefix="bench_growth_mor_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    rows_per_epoch = int(os.environ.get("SPARK_GRAFT_GROWTH_ROWS", "400000"))
    repos_per_epoch = 16
    grow_epochs = int(os.environ.get("SPARK_GRAFT_GROWTH_EPOCHS", "14"))
    update_epochs = 4

    def batch(epoch: int, repo_lo: int, n_repos: int, n_rows: int, update: bool):
        sha = F.sha2((F.col("id") + epoch * 10_000_000).cast("string"), 256)
        return spark.range(n_rows).select(
            (F.col("id") + epoch * 10_000_000).alias("lsn"),
            F.lit("U" if update else "I").alias("op"),
            F.concat(
                F.lit("repo_"), (repo_lo + F.pmod(F.col("id"), F.lit(n_repos))).cast("string")
            ).alias("repo"),
            F.concat(F.lit("src/f"), F.pmod(F.col("id"), F.lit(n_rows)).cast("string"), F.lit(".py")).alias("path"),
            F.concat(sha, sha, sha).alias("content"),
        )

    tbl = MorLakeTable(spark, os.path.join(wh, "t"), keys=["repo", "path"], lsn_col="lsn")
    grow_secs, upd_secs = [], []
    try:
        for e in range(grow_epochs):
            t0 = time.time()
            tbl.merge(batch(e, repo_lo=e * repos_per_epoch, n_repos=repos_per_epoch,
                            n_rows=rows_per_epoch, update=False), epoch_id=e)
            grow_secs.append(round(time.time() - t0, 3))
        t0 = time.time()
        tbl.compact()
        compact_sec = round(time.time() - t0, 3)
        total_rows = tbl.read().count()
        for e in range(update_epochs):
            t0 = time.time()
            tbl.merge(batch(100 + e, repo_lo=e * repos_per_epoch, n_repos=1,
                            n_rows=5000, update=True), epoch_id=100 + e)
            upd_secs.append(round(time.time() - t0, 3))
        t0 = time.time()
        tbl.read().count()
        read_with_deltas_sec = round(time.time() - t0, 3)
        return {
            "rows_per_epoch": rows_per_epoch,
            "final_rows": total_rows,
            "grow_epoch_secs": grow_secs,
            "compact_sec": compact_sec,
            "single_repo_update_secs": upd_secs,
            "read_with_4_deltas_sec": read_with_deltas_sec,
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def run_compaction_policy(parallelism: int) -> dict:
    """Measured-compaction trade curve (r4 verdict #7). MoR arm: sweep
    the delta/base byte-ratio trigger and record BOTH amplifications —
    write amp (bytes written to storage / delta bytes ingested, >1 when
    compactions rewrite the base) and read amp (bytes a read must open /
    live snapshot bytes) — plus the timed read at the final state. A low
    ratio compacts often (write amp up, read amp pinned near 1); a high
    ratio defers (cheap ingest, reads degrade); ``none`` never compacts.
    Append arm: the small-file auto-policy on an append-only table
    (Scd2HistoryStore's closed side) — file count and timed full-history
    read, armed vs plain, same appended content."""
    import tempfile

    from pyspark.sql import functions as F

    from data_ingestion_resolution_platform_spark.session import get_spark
    from data_ingestion_resolution_platform_spark.sources.lake import LakeTable, MorLakeTable

    spark = get_spark("bench_compact", parallelism=parallelism)
    wh = tempfile.mkdtemp(
        prefix="bench_compact_", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
    )
    base_rows = int(os.environ.get("SPARK_GRAFT_COMPACT_BASE", "1000000"))
    epoch_rows = int(os.environ.get("SPARK_GRAFT_COMPACT_EPOCH_ROWS", "100000"))
    epochs = int(os.environ.get("SPARK_GRAFT_COMPACT_EPOCHS", "12"))

    # incompressible ~192 B payload so byte ratios measure real data
    def batch(lo: int, n: int, salt: int):
        sha = F.sha2((F.col("id") + salt).cast("string"), 256)
        return spark.range(lo, lo + n).select(
            F.col("id").alias("k"),
            (F.col("id") + salt).alias("lsn"),
            F.concat(sha, sha, sha).alias("content"),
        )

    out: dict = {
        "metric": "compaction_policy_trade_curve",
        "base_rows": base_rows,
        "epoch_rows": epoch_rows,
        "epochs": epochs,
        "parallelism": parallelism,
        "mor_ratio_sweep": {},
    }
    try:
        # each update epoch lands ~0.1× the base's bytes, so these
        # thresholds fold every ~2nd / 5th / 10th epoch respectively
        for ratio in (0.2, 0.5, 1.0, None):
            t = MorLakeTable(
                spark, os.path.join(wh, f"mor_{ratio}"), keys=["k"], lsn_col="lsn",
                compact_ratio=ratio,
            )
            # untimed bootstrap: seeded base, compacted once so every
            # config starts from the same (base, zero deltas) state
            t.merge(batch(0, base_rows, salt=0), epoch_id="seed")
            t.compact()
            ingested = written = 0
            compactions = 0
            merge_secs = []
            for e in range(epochs):
                t0 = time.time()
                s = t.merge(batch((e * epoch_rows) % base_rows, epoch_rows, salt=10**9 + e), epoch_id=e)
                merge_secs.append(round(time.time() - t0, 3))
                ingested += s["delta_bytes"]
                written += s["delta_bytes"]
                if s.get("compacted"):
                    compactions += 1
                    written += s["compact_stats"]["base_bytes"]
            ss = t.scan_stats()
            t0 = time.time()
            t.read().count()
            read_s = round(time.time() - t0, 3)
            t.compact()  # measure the true live snapshot size
            live = t.scan_stats()["base_bytes"]
            out["mor_ratio_sweep"]["none" if ratio is None else str(ratio)] = {
                "compactions": compactions,
                "merge_secs": merge_secs,
                "merge_median_s": sorted(merge_secs)[len(merge_secs) // 2],
                "final_n_deltas": ss["n_deltas"],
                "final_scan_bytes": ss["scan_bytes"],
                "live_bytes": live,
                "read_amplification": round(ss["scan_bytes"] / live, 3),
                "write_amplification": round(written / max(ingested, 1), 3),
                "read_s_final": read_s,
            }

        # -- append-only small-file policy arm ----------------------------
        app_epochs = int(os.environ.get("SPARK_GRAFT_COMPACT_APP_EPOCHS", "24"))
        app_rows = int(os.environ.get("SPARK_GRAFT_COMPACT_APP_ROWS", "40000"))
        arm_out = {}
        for arm, small in (("plain", None), ("armed", 64 << 20)):
            t = LakeTable(
                spark, os.path.join(wh, f"app_{arm}"), append_only=True,
                compact_small_file_bytes=small, compact_min_dirs=8,
            )
            t0 = time.time()
            for e in range(app_epochs):
                t.append(batch(e * app_rows, app_rows, salt=e), epoch_id=e)
            ingest_s = round(time.time() - t0, 3)
            s = t.append_stats()
            t0 = time.time()
            n = t.read().count()
            arm_out[arm] = {
                "ingest_s": ingest_s,
                "n_files": s["n_files"],
                "n_epoch_dirs": s["n_epoch_dirs"],
                "compacted_gen": s["compacted_gen"],
                "rows": n,
                "read_s": round(time.time() - t0, 3),
            }
        out["append_small_file_policy"] = arm_out
        return out
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def hw_scaling_probe(n: int, n4: int, seconds: float = 10.0) -> dict:
    """Framework-free CPU-scaling ceiling of THIS host: parallel sha256
    loops via multiprocessing (no JVM, no shuffle, no allocation churn).

    On oversubscribed/overcommitted VMs 4x the processes deliver less
    than 4x the hashes; whatever ratio this probe reports is the ceiling
    ANY engine can reach here, so the engine's scaling efficiency should
    be read relative to it. A real cluster's nodes do not share a CPU
    budget this way.
    """
    from multiprocessing import Pool

    all_cpus = set(range(os.cpu_count() or 1))

    def rate(k: int) -> float:
        # pin to k CPUs (children inherit at fork) — same affinity model
        # as the engine probes
        os.sched_setaffinity(0, set(range(k)))
        try:
            with Pool(k) as p:
                t0 = time.time()
                counts = p.map(_hash_worker, [seconds] * k)
                el = time.time() - t0
        finally:
            os.sched_setaffinity(0, all_cpus)
        return sum(counts) / el

    r_n = rate(n)
    r_4n = rate(n4)
    return {
        "hw_rate_n": round(r_n, 0),
        "hw_rate_4n": round(r_4n, 0),
        "hw_efficiency": round((r_4n / r_n) / (n4 / n), 3),
    }


def storage_bw_probe(n: int, n4: int, mb_per_proc: int = 512) -> dict:
    """Aggregate write bandwidth of the bench storage target at two
    writer counts — best of 2 reps per level. A single rep right after
    the heavy e2e subprocesses can measure memory-reclaim transients
    instead of steady bandwidth (round-2's "flat 6.6 GB/s" artifact —
    a clean host shows this tmpfs scaling ~0.75-0.9 from 6 to 24
    writers; see scripts/storage_probe.py). The reading still bounds
    any write-inclusive scaling number on ONE shared VM; a real cluster
    adds disks/object-store bandwidth with every node."""
    import tempfile

    target = os.environ.get("SPARK_GRAFT_BENCH_DIR") or tempfile.gettempdir()

    def one_rate(k: int) -> float:
        procs = []
        paths = []
        t0 = time.time()
        for i in range(k):
            p = os.path.join(target, f"_bwprobe_{os.getpid()}_{i}")
            paths.append(p)
            procs.append(
                subprocess.Popen(
                    ["dd", f"if=/dev/zero", f"of={p}", "bs=4M",
                     f"count={mb_per_proc // 4}", "conv=fsync"],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                )
            )
        for p in procs:
            p.wait()
        el = time.time() - t0
        for p in paths:
            try:
                os.unlink(p)
            except OSError:
                pass
        return k * mb_per_proc / el

    def rate(k: int) -> float:
        best = 0.0
        for _ in range(2):
            subprocess.run(["sync"], check=False)
            best = max(best, one_rate(k))
        return best

    r_n = rate(n)
    r_4n = rate(n4)
    return {
        "storage_mb_s_n": round(r_n, 0),
        "storage_mb_s_4n": round(r_4n, 0),
        "storage_bw_efficiency": round((r_4n / r_n) / (n4 / n), 3),
        "storage_target": target,
    }


def _hash_worker(seconds: float) -> int:
    import hashlib

    h = b"seed"
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        for _ in range(1000):
            h = hashlib.sha256(h * 8).digest()
        n += 1000
    return n


HEADLINE = [
    "cdc_apply_changes",
    "cdc_conflicts",
    "cdc_lineage_stats",
    "pricing_summary",
    "shipping_priority",
    "latest_order_per_customer",
    "dedup_exact",
    "dedup_minhash",
    "text_quality",
    "lang_id",
    "ann_topk",
    "order_percentiles",
    "events_value_bands",
    "bm25_search",
    "repetition_stats",
    "pagerank",
    "spend_deciles",
    "local_supplier_volume",
    "events_scd2",
    "fuzzy_part_match",
    "topk_orders_per_cust",
    # round 4 additions
    "kmeans_embeddings",
    "ann_ivf_kmeans",
    "scd2_incremental",
    "ivm_incremental_join",
    # late round 4: non-additive IVM family
    "ivm_topk_view",
    "ann_ivf_incremental",
    # final round-4 session: mergeable sketches
    "sketch_distinct_kmv",
    # round 5: quantile-sketch triad completer + maintained pipeline sample
    "sketch_quantiles",
    "pipeline_maintained_quantiles",
    # dedup_clusters_incremental is deliberately NOT here: its sf0.1 run is
    # fixture-dominated (~30 s full-corpus seed before the epoch) and its
    # performance evidence is the dedicated --cc-growth sweep
    # (BENCH_CC_GROWTH.json), not a per-query wall time.
]


def _queries_single_pass(parallelism: int, sf_dir: str, seed: int) -> dict[str, float]:
    """One fresh-JVM pass over HEADLINE in seed-shuffled order.

    Runs as a subprocess worker (``--queries-only``) so every rep gets
    a cold JVM: back-to-back in-process timings degrade monotonically
    (measured 54s → 85s → 122s for identical work — page-cache
    pressure + JVM aging), and a FIXED order additionally biases each
    query by its position. Shuffling per rep decorrelates position
    from identity; the median across reps is then per-query meaningful.
    """
    import random

    from data_ingestion_resolution_platform_spark.plans.queries import QUERIES
    from data_ingestion_resolution_platform_spark.session import get_spark

    from data_ingestion_resolution_platform_spark.plans import queries as Q

    spark = get_spark("bench_queries", parallelism=parallelism)
    # warm the JVM outside any timed window: JIT + codegen + parquet
    # reader init otherwise land entirely on the first timed query
    spark.range(2_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    order = list(HEADLINE)
    random.Random(seed).shuffle(order)
    out: dict[str, dict] = {}
    for name in order:
        # fixture/operator split (r4 verdict #4): versioned-fixture
        # queries mark their lake-building sections with fixture_phase();
        # operator_s = total - fixture is the regression-meaningful number
        Q.reset_fixture_time()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        total = round(time.time() - t0, 3)
        out[name] = {"t": total, "f": round(Q.fixture_time(), 3)}
    spark.stop()
    return out


def run_queries(parallelism: int, sf_dir: str, reps: int = 3) -> dict[str, float]:
    """Per-query MEDIAN over ``reps`` fresh-JVM passes, each pass in a
    different randomized order — the same per-rep process isolation the
    CDC headline uses, extended to the per-query numbers so a
    regression can be told from JVM-aging / position noise."""
    reps = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", str(reps)))
    samples: dict[str, list[dict]] = {name: [] for name in HEADLINE}
    for seed in range(reps):
        subprocess.run(["sync"], check=False)
        time.sleep(2)
        proc = subprocess.run(
            [sys.executable, __file__, "--queries-only", str(parallelism), str(seed)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        one = json.loads(proc.stdout.strip().splitlines()[-1])
        for name, t in one.items():
            samples[name].append(t if isinstance(t, dict) else {"t": t, "f": 0.0})
    out: dict[str, dict] = {}
    for name, ts in samples.items():
        ts.sort(key=lambda s: s["t"])
        med = ts[len(ts) // 2]
        out[name] = {
            "total_s": med["t"],
            "fixture_s": med["f"],
            "operator_s": round(med["t"] - med["f"], 3),
        }
    return out


def _cdc_median_of_reps(parallelism: int, n_events: int, reps: int = 3) -> dict:
    """Median of ``reps`` FRESH-JVM replays (one subprocess each,
    sync+settle between). In-process back-to-back reps degrade
    monotonically (measured 54s → 85s → 122s for identical work: page
    cache pressure + JVM aging poison every rep after the first), so
    per-rep process isolation is what makes the median meaningful —
    and matches how the driver actually invokes a cold bench."""
    runs = []
    env = dict(os.environ, SPARK_GRAFT_CDC_REPS="1",
               SPARK_GRAFT_FEED_EVENTS_SCALED=str(n_events))
    for _ in range(reps):
        subprocess.run(["sync"], check=False)
        time.sleep(3)
        proc = subprocess.run(
            [sys.executable, __file__, "--cdc-only", str(parallelism)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        runs.append(json.loads(proc.stdout.strip().splitlines()[-1]))
    runs.sort(key=lambda r: r["events_per_sec"])
    med = dict(runs[len(runs) // 2])
    med["reps"] = reps
    med["events_per_sec_all_reps"] = [r["events_per_sec"] for r in runs]
    return med


def main() -> None:
    sf_dir = _sf_dir()
    cpus = _cpus()
    if "--queries-only" in sys.argv:
        # subprocess worker for run_queries: one fresh-JVM shuffled pass
        i = sys.argv.index("--queries-only")
        par, seed = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        print(json.dumps(_queries_single_pass(par, sf_dir, seed)))
        return

    if "--cdc-only" in sys.argv:
        # subprocess worker for --scaling
        par = int(sys.argv[sys.argv.index("--cdc-only") + 1])
        n_events = int(os.environ.get("SPARK_GRAFT_FEED_EVENTS_SCALED", str(_feed_events())))
        print(json.dumps(run_cdc_replay(par, n_events)))
        return

    if "--core-only" in sys.argv:
        # subprocess worker for --scaling (compute-core probe)
        par = int(sys.argv[sys.argv.index("--core-only") + 1])
        n_events = int(os.environ.get("SPARK_GRAFT_CORE_EVENTS", "10000000"))
        print(json.dumps(run_resolve_core(par, n_events)))
        return

    if "--scaling-core" in sys.argv:
        # Focused core-probe rerun with WINDOW QUALIFICATION (r4 verdict
        # Next-round #3): this VM's host throughput oscillates ±40% on
        # multi-minute timescales, and rounds 3-4 spent their verdicts
        # re-litigating which reps landed in degraded windows. The fix is
        # structural: immediately before AND after EACH paired rep, run
        # the framework-free sha256 ceiling probe (no JVM, no shuffle —
        # the N→4N scaling ANY engine could reach in that window); the
        # rep's window ceiling is the WORSE of the two, so a window that
        # collapses mid-rep (a rep takes ~5 min; the pre-probe alone
        # cannot see that far ahead — round-5 rep 7 qualified at 0.974
        # pre yet the 4N side ran in a throttled window) disqualifies
        # itself. A rep whose window ceiling < 0.8 is recorded but marked
        # unqualified and excluded from the headline median — the
        # protocol qualifies windows up front instead of explaining them
        # post-hoc. The loop keeps running (up to a bounded attempt cap)
        # until it has the requested number of QUALIFIED reps.
        n = max(2, int(cpus * 0.75) // 4)
        n4 = n * 4
        want = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "5"))
        max_attempts = int(os.environ.get("SPARK_GRAFT_SCALING_MAX_ATTEMPTS", str(want * 2)))
        qual_thresh = float(os.environ.get("SPARK_GRAFT_CEILING_QUALIFY", "0.8"))
        probe_s = float(os.environ.get("SPARK_GRAFT_CEILING_PROBE_S", "6"))
        env = dict(
            os.environ,
            SPARK_GRAFT_CONTENT_WORDS=os.environ.get("SPARK_GRAFT_CONTENT_WORDS", "150"),
        )
        env.setdefault("SPARK_DRIVER_MEMORY", "48g")
        rep_rows: list[dict] = []
        best: dict[int, dict] = {}
        attempt = 0
        while attempt < max_attempts and sum(r["qualified"] for r in rep_rows) < want:
            attempt += 1
            hw_pre = hw_scaling_probe(n, n4, seconds=probe_s)
            pair: dict[int, dict] = {}
            for par in (n4, n):
                subprocess.run(["sync"], check=False)
                time.sleep(5)
                proc = subprocess.run(
                    ["taskset", "-c", f"0-{par - 1}",
                     sys.executable, __file__, "--core-only", str(par)],
                    capture_output=True, text=True, env=env,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                r = json.loads(proc.stdout.strip().splitlines()[-1])
                pair[par] = r
                if par not in best or r["events_per_sec"] > best[par]["events_per_sec"]:
                    best[par] = r
            hw_post = hw_scaling_probe(n, n4, seconds=probe_s)
            ceiling = min(hw_pre["hw_efficiency"], hw_post["hw_efficiency"])
            ratio = (pair[n4]["events_per_sec"] / pair[n]["events_per_sec"]) / (n4 / n)
            row = {
                "rep": attempt,
                "ceiling": ceiling,
                "ceiling_pre": hw_pre["hw_efficiency"],
                "ceiling_post": hw_post["hw_efficiency"],
                "qualified": ceiling >= qual_thresh,
                "ratio": round(ratio, 3),
                "events_per_sec_n": pair[n]["events_per_sec"],
                "events_per_sec_4n": pair[n4]["events_per_sec"],
            }
            rep_rows.append(row)
            print(json.dumps(row), file=sys.stderr)

        def _median(xs: list[float]) -> float | None:
            if not xs:
                return None
            s = sorted(xs)
            m = len(s)
            return s[m // 2] if m % 2 else (s[m // 2 - 1] + s[m // 2]) / 2

        qual = [r["ratio"] for r in rep_rows if r["qualified"]]
        allr = [r["ratio"] for r in rep_rows]
        med = _median(qual) if qual else _median(allr)
        print(json.dumps({
            "metric": "cdc_core_scaling_efficiency",
            "value": round(med, 3),
            "unit": "ratio",
            "n": n, "4n": n4,
            "qualify_threshold": qual_thresh,
            "qualified_reps": len(qual),
            "attempts": attempt,
            "no_qualified_windows": not qual,
            "all_rep_median": round(_median(allr), 3),
            "rep_rows": rep_rows,
            "core_events_per_sec_n": best[n]["events_per_sec"],
            "core_events_per_sec_4n": best[n4]["events_per_sec"],
            "core_events": best[n]["events"],
        }))
        return

    if "--growth" in sys.argv:
        out = {
            "metric": "merge_cost_vs_target_growth",
            "adaptive": run_growth_sweep(cpus, adaptive=True),
            "fixed": run_growth_sweep(cpus, adaptive=False),
            "mor": run_growth_sweep_mor(cpus),
        }
        print(json.dumps(out))
        return

    if "--scd2-growth" in sys.argv:
        print(json.dumps(run_scd2_growth(cpus)))
        return

    if "--ivf-growth" in sys.argv:
        print(json.dumps(run_ivf_growth(cpus)))
        return

    if "--cms-growth" in sys.argv:
        print(json.dumps(run_cms_growth(cpus)))
        return

    if "--compact-policy" in sys.argv:
        print(json.dumps(run_compaction_policy(cpus)))
        return

    if "--qsample-growth" in sys.argv:
        print(json.dumps(run_qsample_growth(cpus)))
        return

    if "--search-growth" in sys.argv:
        print(json.dumps(run_search_growth(cpus)))
        return

    if "--cc-growth" in sys.argv:
        print(json.dumps(run_cc_growth(cpus)))
        return

    if "--tri-growth" in sys.argv:
        print(json.dumps(run_tri_growth(cpus)))
        return

    if "--rescan-growth" in sys.argv:
        print(json.dumps(run_rescan_growth(cpus)))
        return

    if "--ann-recall" in sys.argv:
        print(json.dumps(run_ann_recall(cpus)))
        return

    if "--scaling" in sys.argv:
        # N and 4N with headroom: at 4N == all vCPUs the JVM's GC/shuffle
        # threads + the Python driver compete with executor threads and
        # depress the 4N level only; leaving ~25% headroom measures the
        # engine rather than the host's oversubscription behavior.
        n = max(2, int(cpus * 0.75) // 4)
        n4 = n * 4
        # scaling evidence needs compute-dominated epochs: the metric
        # targets a 10^10-event replay where per-epoch orchestration is
        # noise, so measure with 2x events in 2 epochs (4x rows/epoch)
        # rather than the headline's 4 micro-epochs.
        n_events = 2 * _feed_events()
        # single-VM timings vary ±30-40% (hypervisor neighbors,
        # writeback); efficiency = median of time-paired ratios (below)
        reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
        env = dict(
            os.environ,
            SPARK_GRAFT_FEED_EVENTS_SCALED=str(n_events),
            SPARK_GRAFT_EPOCHS=os.environ.get("SPARK_GRAFT_EPOCHS", "2"),
            # the scaling loop does its own best-of-reps across fresh
            # JVMs; one inner rep per subprocess
            SPARK_GRAFT_CDC_REPS="1",
            # 1 KB contents (realistic source files) for both probes
            SPARK_GRAFT_CONTENT_WORDS=os.environ.get("SPARK_GRAFT_CONTENT_WORDS", "150"),
        )
        # tmpfs warehouse for the e2e probe: per-node storage bandwidth
        # scales with a real cluster; this VM's one disk does not
        if os.path.isdir("/dev/shm") and "SPARK_GRAFT_BENCH_DIR" not in env:
            env["SPARK_GRAFT_BENCH_DIR"] = "/dev/shm"
        # large heap: allocation-rate GC contention at 4N threads is the
        # main JVM-side scaling tax; a roomy young gen removes most of it
        env.setdefault("SPARK_DRIVER_MEMORY", "48g")
        results: dict[str, dict[int, dict]] = {"core": {}, "e2e": {}, "e2e_mor": {}}
        ratios: dict[str, list[float]] = {"core": [], "e2e": [], "e2e_mor": []}
        # Host throughput on this VM drifts ±40% on multi-MINUTE
        # timescales (measured: the same pinned 24-core core probe hit
        # 348k and 499k ev/s an hour apart). A best-of-per-level ratio
        # therefore mixes host states — N's best from a fast window
        # against 4N's best from a slow one yields a meaningless
        # efficiency. The robust statistic is the MEDIAN OF TIME-PAIRED
        # RATIOS: each rep runs 4N then N back-to-back (same host
        # state), computes its own efficiency, and the median across
        # reps discards the drifted pairs. Per-level bests are still
        # reported for throughput context.
        # Three probes per pair:
        #   core    — disk-free fused resolve+detect (executor scaling; on
        #             a cluster this is what added nodes buy)
        #   e2e     — full replay incl. COW lake writes (bounded here by
        #             the ONE local disk both levels share — context)
        #   e2e_mor — full replay with the merge-on-read target, the
        #             10^10-event ingest configuration (O(batch) delta
        #             appends instead of bucket rewrites): measured cow
        #             0.35 vs mor 0.42-0.58 at 8M events/2 epochs — the
        #             gap is the storage-bound COW rewrite share
        for rep in range(reps):
            for mode, flag, extra in (
                ("core", "--core-only", {}),
                ("e2e", "--cdc-only", {}),
                ("e2e_mor", "--cdc-only", {"SPARK_GRAFT_TARGET_MODE": "mor"}),
            ):
                pair: dict[int, dict] = {}
                for par in (n4, n):
                    subprocess.run(["sync"], check=False)
                    time.sleep(5)
                    # pin the subprocess to exactly `par` CPUs: at
                    # local[N] on a bigger box the JVM's GC/JIT/shuffle
                    # helper threads otherwise run on the idle cores,
                    # inflating the small-N level — a real N-core node
                    # has no free cores to donate
                    proc = subprocess.run(
                        ["taskset", "-c", f"0-{par - 1}",
                         sys.executable, __file__, flag, str(par)],
                        capture_output=True, text=True, env={**env, **extra},
                        cwd=os.path.dirname(os.path.abspath(__file__)),
                    )
                    line = proc.stdout.strip().splitlines()[-1]
                    r = json.loads(line)
                    pair[par] = r
                    best = results[mode]
                    if par not in best or r["events_per_sec"] > best[par]["events_per_sec"]:
                        best[par] = r
                ratios[mode].append(
                    (pair[n4]["events_per_sec"] / pair[n]["events_per_sec"]) / (n4 / n)
                )

        def eff(mode: str) -> float:
            rs = sorted(ratios[mode])
            return round(rs[len(rs) // 2], 3)

        hw = hw_scaling_probe(n, n4)
        # probe the same storage target the e2e warehouses used
        if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
            os.environ["SPARK_GRAFT_BENCH_DIR"] = "/dev/shm"
        bw = storage_bw_probe(n, n4)
        print(json.dumps({
            "metric": "cdc_scaling_efficiency",
            "value": eff("core"),
            "normalized_vs_host_ceiling": round(eff("core") / hw["hw_efficiency"], 3),
            **hw,
            **bw,
            "unit": "ratio",
            "n": n, "4n": n4,
            "core_events_per_sec_n": results["core"][n]["events_per_sec"],
            "core_events_per_sec_4n": results["core"][n4]["events_per_sec"],
            "core_events": results["core"][n]["events"],
            "core_ratio_reps": [round(x, 3) for x in ratios["core"]],
            "e2e_ratio_reps": [round(x, 3) for x in ratios["e2e"]],
            "e2e_efficiency": eff("e2e"),
            "e2e_events_per_sec_n": results["e2e"][n]["events_per_sec"],
            "e2e_events_per_sec_4n": results["e2e"][n4]["events_per_sec"],
            "e2e_mor_ratio_reps": [round(x, 3) for x in ratios["e2e_mor"]],
            "e2e_mor_efficiency": eff("e2e_mor"),
            "e2e_mor_events_per_sec_n": results["e2e_mor"][n]["events_per_sec"],
            "e2e_mor_events_per_sec_4n": results["e2e_mor"][n4]["events_per_sec"],
            "e2e_phase_seconds_n": results["e2e"][n].get("phase_seconds"),
            "e2e_phase_seconds_4n": results["e2e"][n4].get("phase_seconds"),
            "e2e_events": n_events,
            "reps": reps,
            "sf": sf_dir,
        }))
        return

    split = run_queries(cpus, sf_dir)
    cdc = _cdc_median_of_reps(cpus, _feed_events())
    print(json.dumps({
        "metric": "cdc_merge_apply_events_per_sec",
        "value": cdc["events_per_sec"],
        "unit": "events/sec",
        # per-query totals (round-comparable with BENCH_r01-r04)
        "queries": {n: s["total_s"] for n, s in split.items()},
        # r4 verdict #4: fixture vs operator decomposition — regressions
        # should be judged on operator_s (fixture = versioned-lake build)
        "queries_split": split,
        "sf": sf_dir,
        "cdc": cdc,
    }))


if __name__ == "__main__":
    main()
