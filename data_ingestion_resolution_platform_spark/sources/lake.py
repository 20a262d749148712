"""Parquet-backed lake tables with MERGE semantics + epoch ledger.

On a production cluster this module is a thin wrapper over Iceberg
(``MERGE INTO target USING batch ON keys``, table ``PARTITIONED BY
(bucket(N, key))``, snapshot isolation from the catalog). This sandbox
has no Iceberg runtime (no network for jars), so the identical
semantics are implemented over plain parquet:

- **copy-on-write MERGE**: ``target LEFT ANTI JOIN batch-keys``
  (survivors, with the small batch-key side broadcast) ``UNION ALL``
  batch upserts — exactly the rewrite Iceberg's COW MERGE performs.
- **bucketed COW** (``PartitionedLakeTable``): the target is hash-
  bucketed on the natural key; a MERGE reads and rewrites *only the
  buckets the batch touches* — Iceberg's ``bucket(N, repo)`` partition
  pruning. Per-bucket version pointers keep crash-replay convergent.
- **atomic versioned commits**: writes land in ``v=<n>/`` and a
  ``_LATEST`` pointer file is atomically renamed.
- **exactly-once epoch ledger**: ``_epochs/<id>.json`` markers make
  re-delivered epochs no-ops — the reference's COMPLETED-status guard
  (`/root/reference/backend/worker.py:236-238`) as a commit ledger.

MERGE idempotency under partial failure: re-running a crashed epoch
recomputes each touched bucket from (surviving old version, same
deterministic batch) — per-bucket pointers only advance on completed
writes, so replay converges to the same state (SURVEY.md §7.4).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class _EpochLedger:
    def __init__(self, root: str):
        self.dir = os.path.join(root, "_epochs")
        os.makedirs(self.dir, exist_ok=True)

    def committed(self, epoch_id: str | int) -> bool:
        return os.path.exists(os.path.join(self.dir, f"{epoch_id}.json"))

    def record(self, epoch_id: str | int, stats: dict) -> None:
        path = os.path.join(self.dir, f"{epoch_id}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": str(epoch_id), "ts": time.time(), **stats}, f)
        os.replace(tmp, path)

    def all(self) -> list[str]:
        return sorted(
            os.path.splitext(p)[0] for p in os.listdir(self.dir) if p.endswith(".json")
        )


class _Versioned:
    """A directory of ``v=N`` snapshots with an atomic ``_LATEST`` pointer."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _latest(self) -> str:
        return os.path.join(self.root, "_LATEST")

    def current(self) -> int:
        try:
            with open(self._latest) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def dir_for(self, v: int) -> str:
        return os.path.join(self.root, f"v={v}")

    def commit(self, v: int) -> None:
        tmp = self._latest + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._latest)

    def vacuum(self, keep: int = 2) -> None:
        cur = self.current()
        for name in os.listdir(self.root):
            if name.startswith("v="):
                v = int(name.split("=", 1)[1])
                if v <= cur - keep:
                    shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)


class LakeTable:
    """Single-snapshot table: overwrite / append / merge, exactly-once.

    ``append_only=True`` switches to a cheap append layout (one subdir
    per epoch under ``data/``; no rewrite of prior data) — for lineage/
    conflict/audit tables that never update rows.
    """

    def __init__(self, spark: SparkSession, root: str, append_only: bool = False):
        self.spark = spark
        self.root = root
        self.append_only = append_only
        os.makedirs(root, exist_ok=True)
        self.ledger = _EpochLedger(root)
        self.versions = _Versioned(root)

    # -- reads -----------------------------------------------------------
    @property
    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    def exists(self) -> bool:
        if self.append_only:
            return os.path.isdir(self._data_dir) and any(
                not n.startswith("_") for n in os.listdir(self._data_dir)
            )
        return self.versions.current() > 0

    def read(self) -> DataFrame:
        if self.append_only:
            if not self.exists():
                raise FileNotFoundError(f"lake table {self.root} has no data")
            return self.spark.read.option("basePath", self._data_dir).parquet(
                f"{self._data_dir}/*"
            )
        v = self.versions.current()
        if v == 0:
            raise FileNotFoundError(f"lake table {self.root} has no committed version")
        return self.spark.read.parquet(self.versions.dir_for(v))

    def epoch_committed(self, epoch_id: str | int) -> bool:
        return self.ledger.committed(epoch_id)

    def committed_epochs(self) -> list[str]:
        return self.ledger.all()

    # -- writes ----------------------------------------------------------
    def overwrite(self, df: DataFrame, epoch_id: str | int | None = None) -> None:
        """Full-refresh rebuild (S10/M4: the reference's delete-then-
        reinsert finalize, `main.py:158-159`) — but atomic."""
        if epoch_id is not None and self.ledger.committed(epoch_id):
            return
        v = self.versions.current() + 1
        df.write.mode("overwrite").parquet(self.versions.dir_for(v))
        self.versions.commit(v)
        if epoch_id is not None:
            self.ledger.record(epoch_id, {"mode": "overwrite"})
        self.versions.vacuum()

    def append(
        self,
        df: DataFrame,
        epoch_id: str | int | None = None,
        max_files: int | None = 4,
    ) -> None:
        """S9: append (bronze/audit). ``append_only`` tables write one
        epoch subdir — no rewrite of prior data, true O(batch) cost.

        ``max_files`` coalesces the write: audit outputs are small
        relative to their input (per-key conflicts, per-partition
        lineage), and a 32-task write of a 30k-row frame costs more in
        task launch + commit protocol than the write itself. Pass
        ``None`` to keep the natural partitioning for large appends.
        """
        if epoch_id is not None and self.ledger.committed(epoch_id):
            return
        if self.append_only:
            sub = f"e={epoch_id if epoch_id is not None else int(time.time() * 1000)}"
            out = df.coalesce(max_files) if max_files else df
            out.write.mode("overwrite").parquet(os.path.join(self._data_dir, sub))
        else:
            v = self.versions.current()
            combined = (
                self.read().unionByName(df, allowMissingColumns=True) if v > 0 else df
            )
            combined.write.mode("overwrite").parquet(self.versions.dir_for(v + 1))
            self.versions.commit(v + 1)
        if epoch_id is not None:
            self.ledger.record(epoch_id, {"mode": "append"})
        if not self.append_only:
            self.versions.vacuum()

    def merge(
        self,
        batch: DataFrame,
        keys: Sequence[str],
        epoch_id: str | int | None = None,
        delete_condition: F.Column | None = None,
        collect_stats: bool = False,
    ) -> dict:
        """MERGE INTO this USING batch ON keys (COW rewrite).

        - matched + ``delete_condition``  ⇒ DELETE
        - matched                         ⇒ UPDATE (row replaced)
        - not matched (and not delete)    ⇒ INSERT

        ``batch`` must be key-unique (resolve upstream). The batch-key
        side of the survivor anti-join is explicitly broadcast: a
        micro-batch's key set is small relative to the target, so the
        big side never shuffles.

        Iceberg equivalent::

            MERGE INTO t USING b ON <keys>
            WHEN MATCHED AND b.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED AND b.op <> 'D' THEN INSERT *
        """
        if epoch_id is not None and self.ledger.committed(epoch_id):
            return {"skipped": True, "epoch": str(epoch_id)}
        key_list = list(keys)
        # batch feeds both the broadcast key side and the upsert union —
        # persist so the upstream resolve plan executes once; unpersist
        # in finally so a failed write/commit (normal under the
        # streaming retry design) doesn't leak executor storage
        batch = batch.persist()
        try:
            upserts = (
                batch.filter(~delete_condition) if delete_condition is not None else batch
            )
            if self.exists():
                current = self.read()
                survivors = current.join(
                    F.broadcast(batch.select(*key_list)), on=key_list, how="left_anti"
                )
                merged = survivors.unionByName(upserts.select(*current.columns))
            else:
                merged = upserts
            v = self.versions.current() + 1
            merged.write.mode("overwrite").parquet(self.versions.dir_for(v))
            self.versions.commit(v)
            stats: dict = {"mode": "merge"}
            if collect_stats:
                stats["upserts"] = upserts.count()
                if delete_condition is not None:
                    stats["deletes"] = batch.filter(delete_condition).count()
            if epoch_id is not None:
                self.ledger.record(epoch_id, stats)
            self.versions.vacuum()
        finally:
            batch.unpersist()
        return stats


class PartitionedLakeTable:
    """Hash-bucketed target table: MERGE touches only dirty buckets.

    Layout::

        root/
          _epochs/...
          b=7/ _LATEST, v=1/, v=2/ ...   # one versioned store per bucket

    The bucket column is ``pmod(xxhash64(*bucket_keys), n_buckets)`` —
    the parquet twin of Iceberg ``PARTITIONED BY (bucket(N, repo))``.
    A merge reads only touched buckets (partition pruning by
    construction), rewrites them, and advances per-bucket pointers;
    untouched buckets cost nothing. This is what keeps per-epoch MERGE
    cost O(batch + touched fraction of target) instead of O(target) —
    the property that matters at 10^10 events.
    """

    BUCKET_COL = "__bucket"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        bucket_keys: Sequence[str],
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.root = root
        self.bucket_keys = list(bucket_keys)
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)
        self.ledger = _EpochLedger(root)

    def _bucket_expr(self) -> F.Column:
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.bucket_keys]), F.lit(self.n_buckets)
        ).cast("int")

    def _store(self, b: int) -> _Versioned:
        return _Versioned(os.path.join(self.root, f"b={b}"))

    def _live_buckets(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            if name.startswith("b="):
                b = int(name.split("=", 1)[1])
                if self._store(b).current() > 0:
                    out.append(b)
        return sorted(out)

    def exists(self) -> bool:
        return bool(self._live_buckets())

    def epoch_committed(self, epoch_id: str | int) -> bool:
        return self.ledger.committed(epoch_id)

    def committed_epochs(self) -> list[str]:
        return self.ledger.all()

    def read(self, buckets: Sequence[int] | None = None) -> DataFrame:
        live = self._live_buckets() if buckets is None else [
            b for b in buckets if self._store(b).current() > 0
        ]
        paths = []
        for b in live:
            d = self._store(b).dir_for(self._store(b).current())
            if not os.path.exists(os.path.join(d, "_EMPTY")):
                paths.append(d)
        if not paths:
            raise FileNotFoundError(f"partitioned lake table {self.root} has no data")
        return self.spark.read.parquet(*paths)

    def merge(
        self,
        batch: DataFrame,
        keys: Sequence[str],
        epoch_id: str | int | None = None,
        delete_condition: F.Column | None = None,
    ) -> dict:
        """Bucket-pruned COW MERGE; same WHEN-clause semantics as
        ``LakeTable.merge``. ``batch`` must be key-unique."""
        if epoch_id is not None and self.ledger.committed(epoch_id):
            return {"skipped": True, "epoch": str(epoch_id)}
        key_list = list(keys)
        bcol = self.BUCKET_COL
        # staged is consumed three times (touched-bucket probe, survivor
        # anti-join build side, staging write) — persist so the upstream
        # resolve plan runs once, not three times
        staged = batch.withColumn(bcol, self._bucket_expr()).persist()
        try:
            touched = [r[0] for r in staged.select(bcol).distinct().collect()]
            upserts = (
                staged.filter(~delete_condition) if delete_condition is not None else staged
            )
            touched_live = [b for b in touched if self._store(b).current() > 0]
            if touched_live:
                current = self.read(touched_live).withColumn(bcol, self._bucket_expr())
                survivors = current.join(
                    F.broadcast(staged.select(*key_list)), on=key_list, how="left_anti"
                )
                merged = survivors.unionByName(upserts.select(*current.columns))
            else:
                merged = upserts
            # one staging write partitioned by bucket, then per-bucket
            # pointer swaps (the "commit" of each touched bucket).
            # repartition on the bucket column first: every task then owns
            # whole buckets, so the staging dir holds ~1 file per bucket
            # instead of (tasks x buckets) fragments — file-count hygiene
            # that compounds across epochs (survivor scans stay cheap).
            staging = os.path.join(self.root, f"_staging_{epoch_id if epoch_id is not None else 'adhoc'}")
            shutil.rmtree(staging, ignore_errors=True)
            merged.repartition(self.n_buckets, F.col(bcol)).write.mode(
                "overwrite"
            ).partitionBy(bcol).parquet(staging)
        finally:
            staged.unpersist()
        n_written = 0
        for b in touched:
            src = os.path.join(staging, f"{bcol}={b}")
            store = self._store(b)
            had_data = store.current() > 0
            if not os.path.isdir(src) and not had_data:
                continue  # delete-only batch for a bucket that never existed
            v = store.current() + 1
            dst = store.dir_for(v)
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):
                shutil.move(src, dst)
            else:
                # every row of this live bucket was deleted: commit an
                # explicit empty version so old rows don't resurrect
                os.makedirs(dst, exist_ok=True)
                open(os.path.join(dst, "_EMPTY"), "w").close()
            store.commit(v)
            store.vacuum()
            n_written += 1
        shutil.rmtree(staging, ignore_errors=True)
        stats = {"mode": "merge", "touched_buckets": len(touched), "written_buckets": n_written}
        if epoch_id is not None:
            self.ledger.record(epoch_id, stats)
        return stats
