"""The streaming CDC pipeline: readStream → foreachBatch → MERGE.

Re-expresses the reference worker loop
(`/root/reference/backend/worker.py:418-463` + `process_job`
`:231-415`) as Structured Streaming:

- queue long-poll (S5)        → file-stream source over the feed dir
- idempotency guard (M5)      → epoch ledger check on ``batchId``
- row pipeline + conflicts    → declarative plans (operators/cdc.py)
- finalize (A4/A5 + M1-M6)    → LWW resolve + LakeTable MERGE
- stats/status (A6/A7, M7)    → lineage rows per partition + status
- ack-on-success (S7)         → streaming checkpoint commit (offsets
                                 advance only after foreachBatch returns)

Exactly-once: the checkpoint gives at-least-once delivery of each
micro-batch; the epoch ledger inside ``LakeTable`` makes re-delivery a
no-op; MERGE keyed by natural key makes *partial replay* idempotent.
That is the same triad the reference hand-rolls with COMPLETED-status
checks + clear-and-rebuild + unique-key upserts (SURVEY.md §2.9).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.functions.hashing import content_sha256
from data_ingestion_resolution_platform_spark.operators.cdc import resolve_and_detect
from data_ingestion_resolution_platform_spark.sources.feed import CHANGE_FEED_SCHEMA
from data_ingestion_resolution_platform_spark.sources.lake import (
    LakeTable,
    MorLakeTable,
    PartitionedLakeTable,
)
from data_ingestion_resolution_platform_spark.streaming.lineage import epoch_summary, lineage_rows
from data_ingestion_resolution_platform_spark.util import empty_df
from data_ingestion_resolution_platform_spark.streaming.schema_evolution import reconcile_exprs


@dataclass
class CDCPipeline:
    """Config + orchestration for the source-code-table CDC engine.

    Natural key ``(repo, path)``; identity signature
    ``(lang, sha256(content))``; winner = last writer by LSN
    (BASELINE.json north rule, SURVEY.md §1.4).
    """

    spark: SparkSession
    feed_dir: str
    warehouse: str
    keys: tuple[str, ...] = ("repo", "path")
    lsn_col: str = "lsn"
    renames: dict = field(default_factory=dict)
    n_buckets: int = 32
    max_bucket_bytes: int = 256 << 20
    # "cow": bucket-pruned copy-on-write rewrite (read-optimized).
    # "mor": merge-on-read delta appends + periodic compaction
    # (ingest-optimized — O(batch) epoch cost even when every epoch
    # touches every bucket).
    target_mode: str = "cow"
    compact_every: int | None = 8
    # measured small-file auto-compaction for the append-only audit
    # streams (conflicts/lineage): at one dir per epoch forever, 10^4
    # epochs mean 10^4s of tiny files on every audit read — fold when
    # ≥ audit_compact_min_dirs dirs are live AND mean file size sits
    # below the threshold (sources/lake.LakeTable small-file policy).
    # min_dirs=16 keeps the short test pipelines fold-free.
    audit_small_file_bytes: int | None = 64 << 20
    audit_compact_min_dirs: int = 16
    # opt-in incrementally-maintained metrics table (operators/ivm.py):
    # per-stats_key row counts + content bytes kept in lock-step with
    # the target WITHOUT ever rescanning it — the epoch's pre-images
    # (current target rows for the batch keys, a broadcast semi-join)
    # and post-images (the winners) form an invertible mini-CDF whose
    # signed delta advances the aggregate.
    maintain_stats: bool = False
    stats_keys: tuple[str, ...] = ("repo",)
    # opt-in SCD2 history table (operators/scd.py): every attribute
    # change of (commit, lang, content) becomes a validity interval,
    # advanced per epoch at O(delta) by historize_epoch's exactly-once
    # MERGE — the warehouse-facing audit twin of the LWW target.
    maintain_history: bool = False
    history_attrs: tuple[str, ...] = ("commit", "lang", "content")
    # opt-in incrementally-maintained denormalized JOIN view
    # (operators/ivm.py maintain_join): ``target ⋈ dim`` kept in
    # lock-step with the target WITHOUT recomputing the join — the
    # reference's read models (contacts→issues→resolutions joined per
    # list request) as a continuously-fresh table. Feed epochs advance
    # the R side (same synthesized pre/post mini-CDF as the stats);
    # dim changes arrive via :meth:`apply_dim_changes`. The dim must be
    # seeded once via :meth:`seed_dim` before the first epoch.
    maintain_view: bool = False
    view_join_key: str = "repo"
    view_attrs: tuple[str, ...] = ("lang", "commit")
    # opt-in incrementally-maintained per-group top-k read model
    # (operators/ivm.py maintain_topk): the reference's paginated
    # ORDER BY … LIMIT list endpoints as a continuously-fresh table.
    # Group keys must be a prefix-subset of ``keys``; the ordering
    # measure is precomputed into the view as ``lb_val`` so the stored
    # buffer, the mini-CDF, and the back-fill all rank identically.
    maintain_leaderboard: bool = False
    leaderboard_keys: tuple[str, ...] = ("repo",)
    leaderboard_order: str = "length(content)"
    leaderboard_k: int = 3
    # opt-in incrementally-maintained count-min frequency sketch
    # (operators/sketch.py maintain_cms): bounded-state "how often does
    # X occur in the current table" point queries without ever scanning
    # the target — the sketch is depth×width counters regardless of
    # table size, and the counters advance from the same invertible
    # mini-CDF as the stats (CM counters are additive, so the
    # maintained cells EXACTLY equal a rebuild over the post-epoch
    # state, deletes and updates included).
    # ``freq_item`` is a SQL expression over the key + payload attribute
    # columns (repo, path, commit, lang, content) — the mini-CDF
    # projects exactly those.
    maintain_freq: bool = False
    freq_item: str = "lang"
    freq_depth: int = 4
    freq_width: int = 128
    # opt-in incrementally-maintained per-group uniform row sample — the
    # quantile read model that LIFTS sketch.maintain_qsample's
    # insert-only contract: ``maintain_topk`` ordered ASCENDING on the
    # portable hash of the full natural key.  "The k smallest key
    # hashes of the live rows" IS a deterministic uniform bottom-k
    # sample of the CURRENT table state (Cohen & Kaplan bottom-k
    # sampling with the hash as the randomness), and because it rides
    # maintain_topk's clean/dirty split it stays EXACT under updates
    # and deletes too: a deleted sampled key's replacement — the
    # unstored (k+1)-st smallest hash — back-fills from the logical
    # post-epoch state pruned to the dirtied groups.  Quantiles of
    # ``quantile_value`` read off the sample with rank error
    # O(1/sqrt(k)); state is k rows per group regardless of table size.
    maintain_quantiles: bool = False
    quantile_keys: tuple[str, ...] = ("repo",)
    quantile_value: str = "length(content)"
    quantile_k: int = 64

    def __post_init__(self) -> None:
        # the CURRENT canonical feed schema — starts at the v1 contract
        # and is advanced by evolve_schema() when the producer evolves
        # (Iceberg ADD COLUMN / RENAME at the ingest edge)
        self.canonical = CHANGE_FEED_SCHEMA
        if self.target_mode == "cow":
            # target: hash-bucketed on the leading natural key → MERGE
            # only rewrites touched buckets (Iceberg bucket(N, repo)
            # analogue); buckets that outgrow max_bucket_bytes split
            # linear-hashing style so the bucket count tracks target
            # size as it grows 100x
            self.target = PartitionedLakeTable(
                self.spark,
                os.path.join(self.warehouse, "target"),
                bucket_keys=[self.keys[0]],
                n_buckets=self.n_buckets,
                max_bucket_bytes=self.max_bucket_bytes,
            )
        elif self.target_mode == "mor":
            self.target = MorLakeTable(
                self.spark,
                os.path.join(self.warehouse, "target"),
                keys=list(self.keys),
                lsn_col=self.lsn_col,
                compact_every=self.compact_every,
            )
        else:
            raise ValueError(f"unknown target_mode {self.target_mode!r} (cow|mor)")
        # conflicts/lineage are audit streams → append-only layout,
        # O(batch) writes, no rewrite of history
        self.conflicts = LakeTable(
            self.spark,
            os.path.join(self.warehouse, "conflicts"),
            append_only=True,
            compact_small_file_bytes=self.audit_small_file_bytes,
            compact_min_dirs=self.audit_compact_min_dirs,
        )
        self.lineage = LakeTable(
            self.spark,
            os.path.join(self.warehouse, "lineage"),
            append_only=True,
            compact_small_file_bytes=self.audit_small_file_bytes,
            compact_min_dirs=self.audit_compact_min_dirs,
        )
        self.stats = (
            LakeTable(self.spark, os.path.join(self.warehouse, "stats"))
            if self.maintain_stats
            else None
        )
        if self.maintain_history:
            # closed-versions append + open-versions snapshot: epoch
            # cost tracks the live key count, not accumulated history
            # (operators/scd.Scd2HistoryStore)
            from data_ingestion_resolution_platform_spark.operators.scd import (
                Scd2HistoryStore,
            )

            self.history = Scd2HistoryStore(
                self.spark, os.path.join(self.warehouse, "history"), list(self.keys)
            )
        else:
            self.history = None
        if self.maintain_view:
            self.view = LakeTable(self.spark, os.path.join(self.warehouse, "view"))
            self.dim = LakeTable(self.spark, os.path.join(self.warehouse, "dim"))
        else:
            self.view = None
            self.dim = None
        self.leaderboard = (
            LakeTable(self.spark, os.path.join(self.warehouse, "leaderboard"))
            if self.maintain_leaderboard
            else None
        )
        self.freq = (
            LakeTable(self.spark, os.path.join(self.warehouse, "freq"))
            if self.maintain_freq
            else None
        )
        self.qsample = (
            LakeTable(self.spark, os.path.join(self.warehouse, "qsample"))
            if self.maintain_quantiles
            else None
        )
        self.checkpoint = os.path.join(self.warehouse, "_checkpoint")

    # -- batch core (shared by streaming + bounded replay) ---------------
    def signature(self):
        return F.struct(F.col("lang"), content_sha256(F.col("content")).alias("sha"))

    def evolve_schema(self, add_fields=(), renames: dict | None = None) -> None:
        """Advance the canonical feed contract mid-stream (the north
        rule's schema-evolution clause; reference analogue: varying CSV
        headers projected onto one logical schema,
        `/root/reference/backend/worker.py:268,305-319`).

        ``add_fields`` is a sequence of ``(name, pyspark.sql.types
        .DataType)`` for columns the producer now sends (Iceberg ADD
        COLUMN: earlier target rows stay NULL — the MERGE's add-column
        path evolves the stored schema on the next epoch).  ``renames``
        maps feed-column → canonical-column for columns the producer
        renamed (Iceberg RENAME handled at the ingest edge so the
        stored name never changes).  Batches from BEFORE the evolution
        replay fine: reconcile_exprs NULL-backfills what they don't
        send, so resume-from-checkpoint across an evolution boundary is
        deterministic.
        """
        from pyspark.sql import types as T

        fields = list(self.canonical.fields)
        have = {f.name for f in fields}
        for name, dtype in add_fields:
            if name not in have:
                fields.append(T.StructField(name, dtype, True))
        self.canonical = T.StructType(fields)
        if renames:
            self.renames = {**self.renames, **renames}

    def process_batch(self, batch: DataFrame, epoch: int) -> dict:
        """One micro-batch = one reference ``process_job`` epoch.

        Heavy work is ONE fused aggregation over the batch
        (``resolve_and_detect``: winners + conflicts share the shuffle);
        lineage is a map-side partition scan; everything downstream
        reads the small persisted per-key aggregate.
        """
        if self.target.epoch_committed(epoch):
            return {"skipped": True, "epoch": epoch}
        import time as _time

        phases: dict[str, float] = {}
        _t0 = _time.time()
        batch = reconcile_exprs(batch, self.canonical, self.renames)
        # deliberately NOT persisted: each consumer (fused agg, winner
        # semi-join, lineage) reads a column-pruned scan of the source;
        # caching full rows costs more than the re-scans save (measured)
        resolved = resolve_and_detect(
            batch,
            list(self.keys),
            self.signature(),
            self.lsn_col,
            candidate_cols=["commit", "lang"],
            max_candidates=10,
            wide_cols=["content"],
        )
        try:
            # resolve_and_detect returns lazily; the persisted per-key
            # aggregate materializes inside the first consumer below, so
            # "audit" wall time includes the fused resolve shuffle.
            conflicts = resolved.conflicts.withColumn(
                "epoch", F.lit(epoch).cast("long")
            )
            lin = lineage_rows(batch, epoch, self.lsn_col)
            # write order: audit data first, target + its ledger marker
            # last (a crash in between leaves an uncommitted epoch that
            # replays idempotently; audit appends are ledger-guarded too).
            # The two audit writes are independent Spark jobs — submit
            # them from threads so they overlap (lineage is a map-side
            # scan of the source; conflicts materializes the fused agg).
            with ThreadPoolExecutor(max_workers=2) as pool:
                fc = pool.submit(self.conflicts.append, conflicts, f"c{epoch}")
                fl = pool.submit(self.lineage.append, lin, f"l{epoch}", 1)
                fc.result()
                fl.result()
            phases["resolve_audit"] = _time.time() - _t0
            _t0 = _time.time()
            # maintained metrics BEFORE the target merge: the pre-images
            # must be read from the pre-merge target, and this ordering
            # keeps the retry story convergent — if the stats MERGE
            # commits but the target MERGE then fails, redelivery skips
            # the stats epoch (its own ledger) and re-runs the target
            # merge from the same deterministic winners. The reverse
            # order would strand the stats forever behind the target's
            # committed-epoch early return.
            if self.stats is not None:
                self._maintain_stats(resolved.winners, epoch)
            if self.view is not None:
                # same pre-merge / own-ledger / convergent-retry
                # contract as the stats (comment above)
                self._maintain_view(resolved.winners, epoch)
            if self.leaderboard is not None:
                # same contract again (pre-merge, own ledger)
                self._maintain_leaderboard(resolved.winners, epoch)
            if self.freq is not None:
                # same contract again (pre-merge, own ledger)
                self._maintain_freq(resolved.winners, epoch)
            if self.qsample is not None:
                # same contract again (pre-merge, own ledger)
                self._maintain_quantiles(resolved.winners, epoch)
            if self.history is not None:
                # SCD2 history from the RAW batch (every event is a
                # potential version boundary, not just winners) —
                # O(delta) epoch apply, own ledger ⇒ convergent retries
                from data_ingestion_resolution_platform_spark.operators.scd import (
                    historize_epoch,
                )

                historize_epoch(
                    self.history,
                    batch,
                    list(self.keys),
                    self.lsn_col,
                    list(self.history_attrs),
                    f"h{epoch}",
                )
            stats = self.target.merge(
                resolved.winners,
                list(self.keys),
                epoch_id=epoch,
                delete_condition=F.col("op") == "D",
            )
            phases["merge"] = _time.time() - _t0
            _t0 = _time.time()
            # A7/M7 status decision (reference `worker.py:404-411`):
            # conflicts ⇒ NEEDS_REVIEW, else COMPLETED. Counted from the
            # persisted per-key aggregate — counting the conflicts frame
            # itself would re-run the candidate semi-join + aggregation.
            n_conf = resolved.conflict_key_count()
            status = "NEEDS_REVIEW" if n_conf else "COMPLETED"
            self.lineage.append(
                epoch_summary(self.spark, epoch, status, n_conf), f"s{epoch}", 1
            )
            phases["status"] = _time.time() - _t0
            stats["status"] = status
            stats["conflicts"] = n_conf
            stats["phase_seconds"] = {k: round(v, 3) for k, v in phases.items()}
        except Exception:
            # poison-pill guard (`worker.py:413-415,445-457`): record a
            # FAILED epoch row best-effort, then surface the error so
            # the checkpoint does NOT advance (at-least-once redelivery).
            # Written UNledgered (epoch_id=None → attempt-unique subdir):
            # a ledgered s{epoch} id here would make the later successful
            # retry's COMPLETED/NEEDS_REVIEW summary a silent no-op and
            # freeze the status history at FAILED. Consumers read status
            # via lineage.status_history (terminal state wins per epoch).
            try:
                self.lineage.append(
                    epoch_summary(self.spark, epoch, "FAILED", 0), None, 1
                )
            except Exception:
                pass
            raise
        finally:
            resolved.unpersist()
        return stats

    def _maintain_stats(self, winners: DataFrame, epoch: int) -> None:
        """Advance the maintained per-``stats_keys`` aggregate (row
        count + content bytes) by this epoch's delta.

        The epoch's CDF is synthesized from what the MERGE is about to
        do: current target rows for the batch keys are the pre-images
        (every one is replaced or deleted → sign -1), surviving winners
        are the post-images (sign +1). Unchanged re-deliveries cancel
        exactly (-x + x = 0). The target is only touched by ONE
        broadcast semi-join on the (small) batch key set — never a full
        rescan, never a shuffle of the target."""
        from data_ingestion_resolution_platform_spark.operators.ivm import (
            maintain_aggregate,
        )

        key_list = list(self.keys)
        cols = [*key_list, "lang", "content"]
        post = (
            winners.filter(F.col("op") != "D")
            .select(*cols, F.lit("update_postimage").alias("change_type"))
        )
        if self.target.exists():
            pre = (
                self.target.read()
                .join(F.broadcast(winners.select(*key_list)), on=key_list, how="left_semi")
                .select(*cols, F.lit("update_preimage").alias("change_type"))
            )
            cdf = pre.unionByName(post)
        else:
            cdf = post
        maintain_aggregate(
            self.stats,
            cdf,
            list(self.stats_keys),
            {"total_bytes": "length(content)"},
            epoch_id=f"m{epoch}",
            count_alias="n_paths",
        )

    def _maintain_freq(self, winners: DataFrame, epoch: int) -> None:
        """Advance the maintained count-min cells by this epoch's delta
        (``operators/sketch.py maintain_cms``).

        Same invertible mini-CDF as ``_maintain_stats`` (pre-images =
        current target rows for the batch keys via ONE broadcast
        semi-join, post-images = surviving winners; unchanged
        re-deliveries cancel exactly), same pre-merge / own-ledger /
        convergent-retry contract. Only the epoch's delta ever shuffles
        — ≤ depth·|batch| exploded rows combining to ≤ depth·width
        cells."""
        from data_ingestion_resolution_platform_spark.operators.sketch import (
            maintain_cms,
        )

        key_list = list(self.keys)
        cols = [*key_list, "commit", "lang", "content"]
        post = winners.filter(F.col("op") != "D").select(
            *cols, F.lit("update_postimage").alias("change_type")
        )
        if self.target.exists():
            pre = (
                self.target.read()
                .join(F.broadcast(winners.select(*key_list)), on=key_list, how="left_semi")
                .select(*cols, F.lit("update_preimage").alias("change_type"))
            )
            cdf = pre.unionByName(post)
        else:
            cdf = post
        maintain_cms(
            self.freq,
            cdf,
            self.freq_item,
            depth=self.freq_depth,
            width=self.freq_width,
            epoch_id=f"f{epoch}",
        )

    def seed_dim(self, dim: DataFrame, epoch_id: str = "dim_seed") -> dict:
        """Install the initial dimension snapshot (PK
        ``view_join_key``). Must run before the first maintained-view
        epoch; its own ledger makes re-seeding a no-op."""
        if self.dim is None:
            raise ValueError("seed_dim requires maintain_view=True")
        return self.dim.merge(dim, [self.view_join_key], epoch_id=epoch_id)

    def _maintain_view(self, winners: DataFrame, epoch: int) -> None:
        """Advance the maintained ``target ⋈ dim`` view by this feed
        epoch's R-side delta (ΔS is empty here; dim changes arrive via
        :meth:`apply_dim_changes`).

        Same invertible mini-CDF as ``_maintain_stats``: pre-images are
        the current target rows for the batch keys (ONE broadcast
        semi-join, never a target shuffle or rescan), post-images are
        the surviving winners. ``maintain_join`` broadcasts the delta
        against the dim, so epoch cost is O(|batch|)."""
        from data_ingestion_resolution_platform_spark.operators.ivm import maintain_join

        if not self.dim.exists():
            raise ValueError(
                "maintain_view=True but the dim table is unseeded — call seed_dim() first"
            )
        key_list = list(self.keys)
        cols = [*key_list, *self.view_attrs]
        post = winners.filter(F.col("op") != "D").select(
            *cols, F.lit("update_postimage").alias("change_type")
        )
        if self.target.exists():
            pre = (
                self.target.read()
                .join(F.broadcast(winners.select(*key_list)), on=key_list, how="left_semi")
                .select(*cols, F.lit("update_preimage").alias("change_type"))
            )
            r_changes = pre.unionByName(post)
            r_before = self.target.read().select(*cols)
        else:
            r_changes = post
            r_before = post.drop("change_type").limit(0)
        s_before = self.dim.read()
        s_changes = s_before.limit(0).withColumn("change_type", F.lit("insert"))
        maintain_join(
            self.view,
            r_changes,
            s_changes,
            r_before=r_before,
            s_before=s_before,
            join_keys=[self.view_join_key],
            out_keys=key_list,
            epoch_id=f"v{epoch}",
        )

    def _leaderboard_proj(self):
        gk = list(self.leaderboard_keys)
        rk = [k for k in self.keys if k not in set(gk)]
        lb_val = F.expr(self.leaderboard_order).cast("long").alias("lb_val")
        return gk, rk, [*gk, *rk, lb_val]

    def _maintain_leaderboard(self, winners: DataFrame, epoch: int) -> None:
        """Advance the maintained per-``leaderboard_keys`` top-k view by
        this epoch's delta (``operators/ivm.py maintain_topk``).

        Same invertible mini-CDF as ``_maintain_stats``; runs pre-merge
        on its own ledger for the same convergent-retry argument. The
        back-fill base must be the POST-epoch state, but the physical
        target merge happens after — so it is constructed LOGICALLY
        (target minus batch keys, plus surviving winners), lazily: the
        back-fill only evaluates it for groups a retraction dirtied,
        semi-pruned inside maintain_topk."""
        from data_ingestion_resolution_platform_spark.operators.ivm import maintain_topk

        key_list = list(self.keys)
        gk, rk, proj = self._leaderboard_proj()
        post = winners.filter(F.col("op") != "D").select(
            *proj, F.lit("update_postimage").alias("change_type")
        )
        if self.target.exists():
            pre = (
                self.target.read()
                .join(F.broadcast(winners.select(*key_list)), on=key_list, how="left_semi")
                .select(*proj, F.lit("update_preimage").alias("change_type"))
            )
            changes = pre.unionByName(post)
            base_after = (
                self.target.read()
                .join(F.broadcast(winners.select(*key_list)), on=key_list, how="left_anti")
                .select(*proj)
                .unionByName(winners.filter(F.col("op") != "D").select(*proj))
            )
        else:
            changes = post
            base_after = winners.filter(F.col("op") != "D").select(*proj)
        maintain_topk(
            self.leaderboard,
            changes,
            base_after,
            gk,
            rk,
            "lb_val",
            k=self.leaderboard_k,
            epoch_id=f"t{epoch}",
        )

    def _quantiles_proj(self):
        """Projection for the maintained sample view: group keys, rest
        keys, the ascending-order sampling hash ``qs_h`` (portable mixed
        hash of the FULL natural key, unit-separator joined so the
        composite is unambiguous), and the quantile measure ``qs_val``.
        Both extra columns are pure expressions over the key + payload
        columns, so pre-images from the target and post-images from the
        winners project identically."""
        from data_ingestion_resolution_platform_spark.operators.sketch import kmv_hash

        gk = list(self.quantile_keys)
        rk = [k for k in self.keys if k not in set(gk)]
        qs_h = kmv_hash(F.concat_ws("\x1f", *[F.col(k) for k in self.keys])).alias(
            "qs_h"
        )
        qs_val = F.expr(self.quantile_value).cast("long").alias("qs_val")
        return gk, rk, [*gk, *rk, qs_h, qs_val]

    def _maintain_quantiles(self, winners: DataFrame, epoch: int) -> None:
        """Advance the maintained per-``quantile_keys`` uniform sample by
        this epoch's delta — ``operators/ivm.py maintain_topk`` with
        ``descending=False`` over the key hash, so the view invariant is
        "the k live rows with the smallest sampling hashes" (an exact
        bottom-k sample of the post-epoch table; reference analogue: the
        per-job summary counters its status endpoints recompute from
        full table state, `/root/reference/backend/main.py:103-107` —
        here as a distribution, not a count, and never rescanned).

        Same invertible pre/post mini-CDF and pre-merge / own-ledger /
        convergent-retry contract as ``_maintain_leaderboard``: the
        back-fill base is the LOGICAL post-epoch state (target minus
        batch keys, plus surviving winners), evaluated lazily and only
        for groups a retraction dirtied."""
        from data_ingestion_resolution_platform_spark.operators.ivm import maintain_topk

        key_list = list(self.keys)
        gk, rk, proj = self._quantiles_proj()
        post = winners.filter(F.col("op") != "D").select(
            *proj, F.lit("update_postimage").alias("change_type")
        )
        if self.target.exists():
            pre = (
                self.target.read()
                .join(F.broadcast(winners.select(*key_list)), on=key_list, how="left_semi")
                .select(*proj, F.lit("update_preimage").alias("change_type"))
            )
            changes = pre.unionByName(post)
            base_after = (
                self.target.read()
                .join(F.broadcast(winners.select(*key_list)), on=key_list, how="left_anti")
                .select(*proj)
                .unionByName(winners.filter(F.col("op") != "D").select(*proj))
            )
        else:
            changes = post
            base_after = winners.filter(F.col("op") != "D").select(*proj)
        maintain_topk(
            self.qsample,
            changes,
            base_after,
            gk,
            rk,
            "qs_h",
            k=self.quantile_k,
            epoch_id=f"q{epoch}",
            descending=False,
        )

    def apply_dim_changes(self, s_changes: DataFrame, epoch_id: str | int) -> dict:
        """Advance the maintained view by a DIMENSION change epoch (an
        invertible :func:`sources.lake.snapshot_diff` feed over the dim:
        inserts backfill existing target rows into the view, deletes
        cascade every joined row out, attribute updates rewrite them),
        then upsert the changes into the stored dim.

        Order matters for crash-retry convergence: the view MERGE (its
        own ledger) commits first; if the subsequent dim MERGE fails,
        redelivery skips the view epoch and re-applies only the dim.
        The R₀ ⋈ ΔS term broadcasts ΔS against a target scan — with
        the target hash-bucketed on ``view_join_key``'s leading column
        the broadcast doubles as a runtime filter, so touched buckets
        only."""
        if self.view is None:
            raise ValueError("apply_dim_changes requires maintain_view=True")
        from data_ingestion_resolution_platform_spark.operators.ivm import maintain_join
        from data_ingestion_resolution_platform_spark.sources.lake import apply_changelog

        key_list = list(self.keys)
        cols = [*key_list, *self.view_attrs]
        if self.target.exists():
            r_before = self.target.read().select(*cols)
        else:
            r_before = (
                empty_df(self.spark, self.view.read().select(*cols).schema)
                if self.view.exists()
                else None
            )
            if r_before is None:
                raise ValueError("apply_dim_changes before any target state exists")
        r_changes = r_before.limit(0).withColumn("change_type", F.lit("insert"))
        out = maintain_join(
            self.view,
            r_changes,
            s_changes,
            r_before=r_before,
            s_before=self.dim.read(),
            join_keys=[self.view_join_key],
            out_keys=key_list,
            epoch_id=f"d{epoch_id}",
        )
        # the view delta needs the invertible (preimage-bearing) feed,
        # but the stored dim upsert must be key-unique — preimage rows
        # would land as duplicate keys in the MERGE batch
        apply_changelog(
            self.dim,
            s_changes.filter(F.col("change_type") != "update_preimage"),
            [self.view_join_key],
            epoch_id=f"dim_{epoch_id}",
        )
        return out

    def bootstrap(self, snapshot: DataFrame, watermark_lsn: int, epoch_id: str = "bootstrap") -> dict:
        """Snapshot → streaming handoff (the Debezium initial-load
        pattern; extends M4/M5 to a non-empty starting state).

        Seed the target from a consistent source snapshot taken at
        ``watermark_lsn``, then tail the feed STRICTLY AFTER the
        watermark (``feed.filter(lsn > watermark)`` — the caller's
        replay contract): no prefix event is ever double-applied, no
        post-watermark event is missed. Snapshot rows enter as
        synthetic inserts stamped with the watermark LSN; the bootstrap
        is its own ledgered epoch, so a crashed or redelivered
        bootstrap is a no-op. ``snapshot`` must be key-unique (it is a
        table snapshot) and carry the feed's payload columns minus
        (op, lsn).

        At 10^10 events this is the only sane cold-start: replaying
        the full history through the resolver costs O(history), the
        snapshot MERGE costs O(|table|) once.

        Maintained side tables are seeded too — a snapshot-seeded
        target with an empty stats table would make the next epoch's
        ``_maintain_stats`` subtract pre-images that were never added
        (silently wrong aggregate), and an unseeded history would miss
        the snapshot keys' current versions. Both seeds ride their own
        epoch ledgers and run BEFORE the target merge (same crash-retry
        ordering argument as ``process_batch``: the target ledger's
        early return must imply the side tables committed).
        """
        if self.target.epoch_committed(epoch_id):
            return {"skipped": True, "epoch": epoch_id}
        batch = snapshot.withColumn("op", F.lit("I")).withColumn(
            self.lsn_col, F.lit(watermark_lsn).cast("long")
        )
        if self.stats is not None:
            from data_ingestion_resolution_platform_spark.operators.ivm import (
                maintain_aggregate,
            )

            cdf = snapshot.select(
                *self.keys, "lang", "content", F.lit("insert").alias("change_type")
            )
            maintain_aggregate(
                self.stats,
                cdf,
                list(self.stats_keys),
                {"total_bytes": "length(content)"},
                epoch_id=f"m_{epoch_id}",
                count_alias="n_paths",
            )
        if self.history is not None:
            # snapshot keys enter the SCD2 history as open versions
            # valid from the watermark LSN — point-in-time reads before
            # the watermark stay empty by contract (the snapshot holds
            # no pre-watermark change history to reconstruct)
            from data_ingestion_resolution_platform_spark.operators.scd import (
                historize_epoch,
            )

            historize_epoch(
                self.history,
                batch,
                list(self.keys),
                self.lsn_col,
                list(self.history_attrs),
                f"h_{epoch_id}",
            )
        if self.leaderboard is not None:
            # same argument as the stats seed: the next epoch's
            # pre-images would dirty groups whose stored buffer the
            # leaderboard never held
            from pyspark.sql import Window

            gk, rk, proj = self._leaderboard_proj()
            w = Window.partitionBy(*gk).orderBy(
                F.col("lb_val").desc(), *[F.col(c) for c in rk]
            )
            seed_lb = (
                snapshot.select(*proj)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= self.leaderboard_k)
                .drop("_rn")
            )
            self.leaderboard.merge(seed_lb, [*gk, *rk], epoch_id=f"t_{epoch_id}")
        if self.qsample is not None:
            # same argument as the stats seed: an unseeded sample over a
            # snapshot-seeded target would treat the next epoch's
            # pre-images as retractions of rows it never sampled
            from pyspark.sql import Window

            gk, rk, proj = self._quantiles_proj()
            w = Window.partitionBy(*gk).orderBy(
                F.col("qs_h").asc(), *[F.col(c) for c in rk]
            )
            seed_qs = (
                snapshot.select(*proj)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= self.quantile_k)
                .drop("_rn")
            )
            self.qsample.merge(seed_qs, [*gk, *rk], epoch_id=f"q_{epoch_id}")
        if self.freq is not None:
            # same argument as the stats seed: the next epoch's
            # pre-images would decrement cells the sketch never counted
            from data_ingestion_resolution_platform_spark.operators.sketch import (
                maintain_cms,
            )

            maintain_cms(
                self.freq,
                snapshot.withColumn("change_type", F.lit("insert")),
                self.freq_item,
                depth=self.freq_depth,
                width=self.freq_width,
                epoch_id=f"f_{epoch_id}",
            )
        if self.view is not None:
            # same argument as the stats seed: a snapshot-seeded target
            # with an empty view would make the next epoch's pre-images
            # subtract rows the view never held
            if not self.dim.exists():
                raise ValueError(
                    "bootstrap with maintain_view=True requires seed_dim() first"
                )
            seed_view = snapshot.select(*self.keys, *self.view_attrs).join(
                self.dim.read(), on=self.view_join_key, how="inner"
            )
            self.view.merge(seed_view, list(self.keys), epoch_id=f"v_{epoch_id}")
        return self.target.merge(batch, list(self.keys), epoch_id=epoch_id)

    # -- streaming entry --------------------------------------------------
    def run_stream(self, available_now: bool = True, trigger_seconds: float | None = None):
        """Tail the feed directory as a parquet file stream.

        ``available_now=True`` processes the backlog then stops —
        bounded replay with full checkpoint semantics (resume picks up
        exactly where the last committed offset left off).
        """
        stream = (
            self.spark.readStream.schema(CHANGE_FEED_SCHEMA)
            .option("maxFilesPerTrigger", 8)
            .parquet(self.feed_dir)
        )

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)

        writer = stream.writeStream.foreachBatch(sink).option(
            "checkpointLocation", self.checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()

    def replay_bounded(self, feed: DataFrame, epochs: int, epoch_offset: int = 0) -> list[dict]:
        """Batch-mode replay: split a bounded feed into ``epochs``
        LSN-ranged micro-batches and run the same batch core. Used by
        bench (throughput) and tests (replay equivalence)."""
        bounds = feed.agg(F.min(self.lsn_col), F.max(self.lsn_col)).first()
        lo, hi = bounds[0], bounds[1]
        span = (hi - lo + 1) // epochs or 1
        out = []
        for i in range(epochs):
            a = lo + i * span
            b = hi + 1 if i == epochs - 1 else lo + (i + 1) * span
            chunk = feed.filter((F.col(self.lsn_col) >= a) & (F.col(self.lsn_col) < b))
            out.append(self.process_batch(chunk, epoch_offset + i))
        return out
