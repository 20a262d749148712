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


def _dir_stats(path: str) -> tuple[int, int]:
    """(bytes, data_files) under ``path`` — one local stat pass at WRITE
    time, the parquet twin of Iceberg's snapshot summary
    (``total-files-size`` / ``total-data-files``). Compaction policies
    read these numbers off the manifest; they never re-walk storage on
    the read path."""
    total = files = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.startswith(("_", ".")):
                continue
            try:
                total += os.path.getsize(os.path.join(root, n))
                files += 1
            except OSError:
                pass
    return total, files


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_preimages: bool = False,
) -> DataFrame:
    """Key-level change feed between two table snapshots (the Iceberg/
    Delta CDF shape): one row per changed key with ``change_type`` in
    ``insert`` / ``update_postimage`` / ``delete``, carrying the after-
    image for inserts/updates and the before-image for deletes.

    Plan shape: ONE full-outer shuffle join on the natural key, then
    null-safe column comparison (``<=>``) — no window, no sort, no
    driver-side state, so it scales with the snapshot size like any
    equi-join (AQE handles skewed keys). ``compare_cols`` defaults to
    every non-key column present in both snapshots; columns added by
    schema evolution between the snapshots surface as updates only for
    keys whose compared columns changed (pass them explicitly to treat
    backfill as change).

    ``include_preimages=True`` additionally emits an ``update_preimage``
    row (the before-image) for every updated key — the Delta CDF shape
    that makes the feed *invertible*, which downstream incremental
    aggregate maintenance needs to subtract a key's old contribution
    (see ``operators.ivm``). Still one shuffle: both images ride the
    same full-outer join row and fan out via a 2-element explode.
    """
    key_list = list(keys)
    shared = [c for c in after.columns if c in set(before.columns)]
    compare = (
        list(compare_cols)
        if compare_cols is not None
        else [c for c in shared if c not in key_list]
    )
    a = before.select(
        *key_list,
        F.lit(True).alias("_in_a"),
        *[F.col(c).alias(f"_a_{c}") for c in compare],
    )
    b = after.select(
        *key_list,
        F.lit(True).alias("_in_b"),
        *[F.col(c).alias(f"_b_{c}") for c in compare],
    )
    j = a.join(b, on=key_list, how="full_outer")
    changed = F.lit(False)
    for c in compare:
        changed = changed | ~(F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}")))
    change_type = (
        F.when(F.col("_in_a").isNull(), F.lit("insert"))
        .when(F.col("_in_b").isNull(), F.lit("delete"))
        .when(changed, F.lit("update_postimage"))
    )
    if include_preimages:
        def img(change: str, side: str) -> F.Column:
            return F.struct(
                F.lit(change).alias("change_type"),
                *[F.col(f"_{side}_{c}").alias(c) for c in compare],
            )

        rows = (
            F.when(F.col("_in_a").isNull(), F.array(img("insert", "b")))
            .when(F.col("_in_b").isNull(), F.array(img("delete", "a")))
            .when(changed, F.array(img("update_preimage", "a"), img("update_postimage", "b")))
        )
        # explode skips NULL arrays (unchanged keys) — no extra filter
        ex = j.select(*key_list, F.explode(rows).alias("_chg"))
        return ex.select(
            *key_list,
            F.col("_chg.change_type").alias("change_type"),
            *[F.col(f"_chg.{c}").alias(c) for c in compare],
        )
    out_vals = [
        F.when(F.col("_in_b").isNull(), F.col(f"_a_{c}"))
        .otherwise(F.col(f"_b_{c}"))
        .alias(c)
        for c in compare
    ]
    return (
        j.select(*key_list, change_type.alias("change_type"), *out_vals)
        .filter(F.col("change_type").isNotNull())
    )


def apply_changelog(
    table: "LakeTable",
    changes: DataFrame,
    keys: Sequence[str],
    epoch_id: str | int | None = None,
) -> dict:
    """Consume a :func:`snapshot_diff` changelog on a downstream
    replica: inserts/updates upsert the after-image, deletes remove the
    key, and the ``change_type`` marker never enters the replica's
    schema. Applying the changelog of (v_from → v_to) to a replica at
    v_from converges it to v_to exactly — incremental downstream
    replication instead of full-snapshot copies, with the same
    exactly-once epoch ledger as every other MERGE."""
    return table.merge(
        changes,
        keys,
        epoch_id=epoch_id,
        delete_condition=F.col("change_type") == "delete",
        drop_cols=("change_type",),
    )


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


class CommitConflict(RuntimeError):
    """Another writer claimed this version first. The caller's snapshot
    is stale: re-read the table, recompute the batch against the new
    state, and retry the write (Iceberg's optimistic-concurrency retry
    loop)."""


class _Versioned:
    """A directory of ``v=N`` snapshots with an atomic ``_LATEST`` pointer.

    Concurrent writers are serialized optimistically: each writer must
    :meth:`claim` its target version (atomic ``O_EXCL`` create — the
    CAS; maps to a conditional PUT / catalog compare-and-swap on a real
    object store) BEFORE writing data. Exactly one racer wins a given
    version; losers get :class:`CommitConflict` and must recompute from
    the newly-visible snapshot. A claim is only grantable when its base
    version is already committed, so a loser can never overwrite a
    concurrent winner's rows with a merge computed against the stale
    base."""

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

    def _claim_path(self, v: int) -> str:
        return os.path.join(self.root, f"_CLAIM_v{v}")

    #: a live writer must commit or release within this window; a claim
    #: older than this whose owner can't be verified alive is stealable
    CLAIM_TTL_SECONDS = 600.0

    def _claim_is_stale(self, path: str) -> bool:
        """True if the claim's owner is provably dead (pid gone on this
        host — the versioned layout is single-host by construction; an
        object-store port replaces this with conditional-PUT leases) or
        the claim exceeded :attr:`CLAIM_TTL_SECONDS`."""
        try:
            with open(path) as f:
                meta = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            # vanished (owner released — not stale) or unreadable/partial
            # (crashed mid-write — age it out by mtime)
            try:
                return time.time() - os.path.getmtime(path) > self.CLAIM_TTL_SECONDS
            except OSError:
                return False
        pid = meta.get("pid")
        if isinstance(pid, int):
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                return True  # owner process is gone
            except PermissionError:
                pass  # alive, owned by another user
        return time.time() - float(meta.get("ts", 0.0)) > self.CLAIM_TTL_SECONDS

    def claim(self, v: int) -> None:
        """Atomically claim the right to write version ``v``.

        Raises :class:`CommitConflict` if another writer holds it, or if
        ``v``'s base is not yet the committed current version (the racer
        that claimed the intermediate version hasn't finished — the
        caller's snapshot is stale either way). Release on write
        failure via :meth:`release`; the commit pointer swap consumes
        the claim on success.

        A claim left behind by a writer that died between claim and
        commit no longer wedges the table: if the recorded owner pid is
        dead or the claim is older than :attr:`CLAIM_TTL_SECONDS`, the
        next claimant steals it (remove + one retry of the O_EXCL
        create — at most one racer wins the recreate)."""
        if self.current() != v - 1:
            raise CommitConflict(
                f"{self.root}: version {v} has base {v - 1} but current is "
                f"{self.current()} — stale snapshot, re-read and retry"
            )
        path = self._claim_path(v)
        for attempt in (0, 1):
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if attempt == 0 and self._claim_is_stale(path):
                    try:  # steal: remove is race-safe, O_EXCL re-decides
                        os.remove(path)
                    except FileNotFoundError:
                        pass
                    continue
                raise CommitConflict(
                    f"{self.root}: version {v} already claimed by a live "
                    "concurrent writer — re-read and retry"
                ) from None
        with os.fdopen(fd, "w") as f:
            json.dump({"pid": os.getpid(), "ts": time.time()}, f)

    def release(self, v: int) -> None:
        """Abandon a claim after a failed write so the table isn't
        wedged. A writer that dies without releasing leaves the claim
        behind; :meth:`claim` steals it once the owner pid is dead or
        the claim ages past :attr:`CLAIM_TTL_SECONDS` (see
        :meth:`_claim_is_stale`), and this method doubles as the
        operator's force-release for anything earlier."""
        try:
            os.remove(self._claim_path(v))
        except FileNotFoundError:
            pass

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
            elif name.startswith("_CLAIM_v"):
                # consumed claims (version committed) are dead metadata
                v = int(name[len("_CLAIM_v"):])
                if v <= cur:
                    self.release(v)


class LakeTable:
    """Single-snapshot table: overwrite / append / merge, exactly-once.

    ``append_only=True`` switches to a cheap append layout (one subdir
    per epoch under ``data/``; no rewrite of prior data) — for lineage/
    conflict/audit tables that never update rows. Epoch appends are
    small relative to the table, so after 10^4 epochs a full read opens
    10^4s of tiny files: :meth:`compact_appends` folds the accumulated
    dirs into a size-targeted file set (Iceberg ``rewrite_data_files``
    binpack), and ``compact_small_file_bytes`` arms a measured
    auto-policy — compact when ≥ ``compact_min_dirs`` epoch dirs are
    live AND the mean data-file size has fallen below the threshold
    (the small-file read-amplification signal, not a blind cadence).

    Compaction commit protocol (crash-safe, same shape as the MoR
    manifest flip): consolidated files land under an invisible
    ``_compacted/_tmp_g<n>`` staging dir, rename to ``_compacted/g<n>``
    (still invisible — readers resolve the live generation through the
    atomic ``_APPENDS`` manifest, never by listing), then ONE
    ``os.replace`` of the manifest makes the new generation + folded-dir
    set visible together; folded epoch dirs and the prior generation are
    deleted best-effort after the flip (a crash between leaves them
    orphaned but invisible, cleaned by the next compaction). The epoch
    LEDGER is untouched — folding never changes which epochs are
    committed, so at-least-once redelivery stays exactly-once.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        append_only: bool = False,
        compact_small_file_bytes: int | None = None,
        compact_min_dirs: int = 8,
        compact_target_file_bytes: int = 128 << 20,
    ):
        self.spark = spark
        self.root = root
        self.append_only = append_only
        self.compact_small_file_bytes = compact_small_file_bytes
        self.compact_min_dirs = compact_min_dirs
        self.compact_target_file_bytes = compact_target_file_bytes
        os.makedirs(root, exist_ok=True)
        self.ledger = _EpochLedger(root)
        self.versions = _Versioned(root)

    # -- reads -----------------------------------------------------------
    @property
    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    def exists(self) -> bool:
        if self.append_only:
            dirs, comp = self._live_append_dirs()
            return bool(dirs) or comp is not None
        return self.versions.current() > 0

    # -- append-only layout resolution ------------------------------------
    @property
    def _appends_manifest_path(self) -> str:
        return os.path.join(self.root, "_APPENDS")

    def _appends_manifest(self) -> dict:
        try:
            with open(self._appends_manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"gen": 0, "folded": []}

    def _compact_gen_dir(self, gen: int) -> str:
        return os.path.join(self.root, "_compacted", f"g{gen}")

    def _live_append_dirs(self) -> tuple[list[str], str | None]:
        """(live epoch-append dirs, live compacted-generation dir) —
        visibility is decided by the ``_APPENDS`` manifest alone: a dir
        listed as folded is dead even if its delete never ran, and a
        compacted generation is dead until the manifest points at it."""
        m = self._appends_manifest()
        folded = set(m["folded"])
        subs = (
            sorted(
                n
                for n in os.listdir(self._data_dir)
                if not n.startswith(("_", ".")) and n not in folded
            )
            if os.path.isdir(self._data_dir)
            else []
        )
        comp = self._compact_gen_dir(m["gen"]) if m["gen"] else None
        return [os.path.join(self._data_dir, n) for n in subs], comp

    def read(self, version: int | None = None) -> DataFrame:
        """Current snapshot, or time-travel to an older ``version`` if
        it is still within the vacuum retention window (Iceberg
        ``VERSION AS OF``)."""
        if self.append_only:
            if version is not None:
                raise ValueError("append-only tables are not versioned")
            dirs, comp = self._live_append_dirs()
            if not dirs and comp is None:
                raise FileNotFoundError(f"lake table {self.root} has no data")
            parts = []
            if dirs:
                # basePath surfaces the e=<epoch> dirname as a column
                parts.append(
                    self.spark.read.option("basePath", self._data_dir).parquet(*dirs)
                )
            if comp is not None:
                # compacted files carry e as a regular column — same
                # read schema either way
                parts.append(self.spark.read.parquet(comp))
            if len(parts) == 1:
                return parts[0]
            a, b = parts
            if dict(a.dtypes).get("e") != dict(b.dtypes).get("e"):
                b = b.withColumn("e", F.col("e").cast(dict(a.dtypes)["e"]))
            return a.unionByName(b, allowMissingColumns=True)
        v = self.versions.current() if version is None else version
        if v == 0:
            raise FileNotFoundError(f"lake table {self.root} has no committed version")
        d = self.versions.dir_for(v)
        if not os.path.isdir(d):
            raise FileNotFoundError(
                f"version {v} of {self.root} is missing (vacuumed or never written)"
            )
        return self.spark.read.parquet(d)

    def current_version(self) -> int:
        return self.versions.current()

    def scan(self, predicates: Sequence[tuple]) -> DataFrame:
        """Stats-pruned predicate scan (Iceberg manifest skipping, see
        ``sources/skipping.py``): files whose footer min/max bounds
        cannot satisfy the conjunction are never opened; survivors get
        the full predicate as a residual filter, so results are always
        identical to ``read().filter(...)``. The planning report of the
        most recent scan is kept on ``self.last_scan_report``."""
        from data_ingestion_resolution_platform_spark.sources.skipping import pruned_scan

        if self.append_only:
            live, comp = self._live_append_dirs()
            dirs = live + ([comp] if comp else [])
        else:
            v = self.versions.current()
            if v == 0:
                raise FileNotFoundError(f"lake table {self.root} has no committed version")
            dirs = [self.versions.dir_for(v)]
        schema = None
        if self.append_only:
            # file-level scans never surface the e=<epoch> dirname (no
            # basePath), and compacted files carry e as a data column —
            # pin the scan schema to data columns so both file kinds
            # project identically
            from pyspark.sql.types import StructType

            schema = StructType([f for f in self.read().schema.fields if f.name != "e"])
        df, self.last_scan_report = pruned_scan(
            self.spark, self.root, dirs, predicates, schema=schema
        )
        return df

    def changelog(
        self,
        v_from: int,
        v_to: int,
        keys: Sequence[str],
        compare_cols: Sequence[str] | None = None,
        include_preimages: bool = False,
    ) -> DataFrame:
        """Row-level diff between two retained snapshots — the engine's
        change-data-feed: what a MERGE epoch (or several) did to the
        table, recoverable after the fact. See :func:`snapshot_diff`;
        ``include_preimages=True`` yields the invertible Delta-CDF shape
        that :mod:`operators.ivm` consumes."""
        return snapshot_diff(
            self.read(version=v_from),
            self.read(version=v_to),
            keys,
            compare_cols,
            include_preimages=include_preimages,
        )

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
        self.versions.claim(v)  # CommitConflict → caller re-reads + retries
        try:
            df.write.mode("overwrite").parquet(self.versions.dir_for(v))
            self.versions.commit(v)
        except Exception:
            self.versions.release(v)
            raise
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
            self.versions.claim(v + 1)
            try:
                combined = (
                    self.read().unionByName(df, allowMissingColumns=True) if v > 0 else df
                )
                combined.write.mode("overwrite").parquet(self.versions.dir_for(v + 1))
                self.versions.commit(v + 1)
            except Exception:
                self.versions.release(v + 1)
                raise
        if epoch_id is not None:
            self.ledger.record(epoch_id, {"mode": "append"})
        if not self.append_only:
            self.versions.vacuum()
        else:
            self.maybe_compact_appends()

    # -- append-only compaction -------------------------------------------
    def append_stats(self) -> dict:
        """Live storage shape of the append layout: epoch-dir count,
        data-file count/bytes and mean file size — the small-file
        signal the auto-policy reads. One local stat walk; on a real
        lakehouse these are manifest columns (Iceberg
        ``total-data-files`` / ``total-files-size``)."""
        dirs, comp = self._live_append_dirs()
        b = nf = 0
        for d in dirs + ([comp] if comp else []):
            db, df_ = _dir_stats(d)
            b += db
            nf += df_
        return {
            "n_epoch_dirs": len(dirs),
            "compacted_gen": self._appends_manifest()["gen"],
            "n_files": nf,
            "bytes": b,
            "avg_file_bytes": b / nf if nf else 0.0,
        }

    def maybe_compact_appends(self) -> dict | None:
        """Measured auto-compaction: fold when ≥ ``compact_min_dirs``
        epoch dirs are live AND mean file size < the configured
        small-file threshold. Armed by ``compact_small_file_bytes``;
        disarmed tables never pay the stat walk."""
        if not (self.append_only and self.compact_small_file_bytes):
            return None
        s = self.append_stats()
        if (
            s["n_epoch_dirs"] >= self.compact_min_dirs
            and s["avg_file_bytes"] < self.compact_small_file_bytes
        ):
            return self.compact_appends()
        return None

    def compact_appends(self, target_files: int | None = None) -> dict:
        """Fold live epoch dirs (and the prior compacted generation)
        into one size-targeted file set — Iceberg
        ``rewrite_data_files`` binpack for the append layout. Content-
        idempotent; see the class docstring for the crash protocol."""
        if not self.append_only:
            raise ValueError("compact_appends applies to append-only tables")
        m = self._appends_manifest()
        dirs, comp = self._live_append_dirs()
        if not dirs:
            return {"mode": "compact_appends", "noop": True}
        before = self.append_stats()
        if target_files is None:
            target_files = max(
                1, -(-before["bytes"] // self.compact_target_file_bytes)
            )
        snapshot = self.read()  # e=<epoch> materialized as a data column
        gen = m["gen"] + 1
        dest = self._compact_gen_dir(gen)
        tmp = os.path.join(self.root, "_compacted", f"_tmp_g{gen}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(dest, ignore_errors=True)  # crashed pre-flip orphan
        snapshot.coalesce(target_files).write.mode("overwrite").parquet(tmp)
        os.rename(tmp, dest)
        folded = sorted(set(m["folded"]) | {os.path.basename(d) for d in dirs})
        tmp_m = self._appends_manifest_path + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump({"gen": gen, "folded": folded}, f)
        os.replace(tmp_m, self._appends_manifest_path)
        # visible flip done — everything below is best-effort cleanup
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
        comp_root = os.path.join(self.root, "_compacted")
        for n in os.listdir(comp_root):
            if n != f"g{gen}":
                shutil.rmtree(os.path.join(comp_root, n), ignore_errors=True)
        return {
            "mode": "compact_appends",
            "gen": gen,
            "folded_dirs": len(dirs),
            "files_before": before["n_files"],
            "files_after": self.append_stats()["n_files"],
            "bytes_before": before["bytes"],
            "bytes_after": self.append_stats()["bytes"],
        }

    def merge(
        self,
        batch: DataFrame,
        keys: Sequence[str],
        epoch_id: str | int | None = None,
        delete_condition: F.Column | None = None,
        collect_stats: bool = False,
        drop_cols: Sequence[str] = (),
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
        # claim the target version BEFORE reading the base snapshot: the
        # claim (CAS) guarantees the snapshot we merge against IS the
        # claimed version's base, so a concurrent winner's rows can never
        # be overwritten by a merge computed from a stale read
        v = self.versions.current() + 1
        try:
            self.versions.claim(v)
        except CommitConflict:
            batch.unpersist()
            raise
        try:
            upserts = (
                batch.filter(~delete_condition) if delete_condition is not None else batch
            )
            if drop_cols:
                # marker columns (e.g. a changelog's change_type) steer the
                # WHEN clauses but must not evolve into the target schema
                upserts = upserts.drop(*drop_cols)
            if self.exists():
                current = self.read()
                survivors = current.join(
                    F.broadcast(batch.select(*key_list)), on=key_list, how="left_anti"
                )
                # schema evolution (add-column): target schema becomes the
                # union of current and batch columns; survivors carry NULL
                # for newly-added columns, batch rows NULL for columns the
                # evolved feed no longer sends — Iceberg's add-column MERGE
                # semantics without a rewrite of untouched history
                all_cols = current.columns + [
                    c for c in upserts.columns if c not in current.columns
                ]
                merged = survivors.unionByName(
                    upserts, allowMissingColumns=True
                ).select(*all_cols)
            else:
                merged = upserts
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
        except Exception:
            self.versions.release(v)
            raise
        finally:
            batch.unpersist()
        return stats


class MorLakeTable:
    """Merge-on-READ target table: each MERGE epoch appends one delta
    file set — an **O(batch) write with zero target reads** — and the
    read path reconciles base ∪ deltas. The third point in the COW
    cost space next to ``LakeTable`` (full rewrite) and
    ``PartitionedLakeTable`` (bucket-pruned rewrite): when epochs touch
    most buckets (hot wide feeds), even pruned COW degenerates to
    near-full rewrites, while MoR keeps ingest cost flat and shifts the
    merge to reads + periodic compaction — Iceberg v2 equality-delete /
    Delta deletion-vector semantics over plain parquet.

    Read plan (scale-shaped): the base is NEVER shuffled — delta keys
    (micro-batches, small between compactions) are broadcast; base rows
    split into untouched (left-anti) and overlapping (left-semi); only
    the overlap ∪ deltas goes through the LWW aggregation; winners union
    back with the untouched base. Read cost grows with delta count, so
    accumulated deltas fold into a new base version under one of two
    triggers (amortized, tunable against write amplification):

    - ``compact_every``: fixed cadence — every K epochs (the round-1
      design, kept for callers that want deterministic schedules);
    - ``compact_ratio``: MEASURED policy — compact when live delta
      bytes / base bytes ≥ the ratio (and ≥ ``min_compact_deltas``
      deltas are live). Byte stats ride the manifest (written once at
      merge/compact time, Iceberg snapshot-summary style), so the
      policy decision is metadata-only — no storage walk on reads. A
      ratio policy self-adapts where a cadence can't: tiny
      micro-batches against a huge base accumulate for a long time
      (reads barely degrade), while a burst of heavy epochs triggers
      promptly. ``scan_stats()`` exposes the live read-amplification
      estimate; BENCH_COMPACT_POLICY.json records the measured trade
      curve.

    Layout::

        root/
          _epochs/...         # exactly-once epoch ledger
          _MANIFEST           # atomic JSON: base version + live deltas
          base/v=<n>/*.parquet
          delta/d=<seq>/*.parquet   # carries _mor_seq + _mor_del cols

    Crash safety: delta files land before the manifest flips; an orphan
    delta dir (crash between write and manifest) is invisible and gets
    overwritten deterministically on replay. Compaction writes the new
    base fully before one atomic manifest replace retires the deltas.
    """

    SEQ = "_mor_seq"
    DEL = "_mor_del"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keys: Sequence[str],
        lsn_col: str,
        compact_every: int | None = None,
        compact_ratio: float | None = None,
        min_compact_deltas: int = 2,
        cluster_by: Sequence[str] | None = None,
        cluster_files: int = 16,
    ):
        self.spark = spark
        self.root = root
        self.keys = list(keys)
        self.lsn_col = lsn_col
        self.compact_every = compact_every
        self.compact_ratio = compact_ratio
        self.min_compact_deltas = min_compact_deltas
        # z-order the base at compaction time (Iceberg OPTIMIZE ZORDER):
        # deltas stay fast appends; every compaction re-tightens per-file
        # bounds on all clustered dims for the footer-stats pruner
        self.cluster_by = list(cluster_by) if cluster_by else None
        self.cluster_files = cluster_files
        os.makedirs(root, exist_ok=True)
        self.ledger = _EpochLedger(root)

    # -- manifest --------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_MANIFEST")

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"base_v": 0, "deltas": [], "next_seq": 1}

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)

    def _base_dir(self, v: int) -> str:
        return os.path.join(self.root, "base", f"v={v}")

    def _delta_dir(self, seq: int) -> str:
        return os.path.join(self.root, "delta", f"d={seq}")

    def exists(self) -> bool:
        m = self._read_manifest()
        return m["base_v"] > 0 or bool(m["deltas"])

    def epoch_committed(self, epoch_id: str | int) -> bool:
        return self.ledger.committed(epoch_id)

    def committed_epochs(self) -> list[str]:
        return self.ledger.all()

    def n_deltas(self) -> int:
        return len(self._read_manifest()["deltas"])

    # -- writes ----------------------------------------------------------
    def merge(
        self,
        batch: DataFrame,
        keys: Sequence[str] | None = None,
        epoch_id: str | int | None = None,
        delete_condition: F.Column | None = None,
    ) -> dict:
        """MERGE semantics deferred to read time: the key-unique batch
        (tombstones flagged, not dropped) is appended as one delta.

        ``keys`` is accepted for call-shape parity with the COW tables
        (the pipeline swaps targets without branching) but must match
        the table's configured key."""
        if keys is not None and list(keys) != self.keys:
            raise ValueError(f"merge keys {list(keys)} != table keys {self.keys}")
        if epoch_id is not None and self.ledger.committed(epoch_id):
            return {"skipped": True, "epoch": str(epoch_id)}
        m = self._read_manifest()
        seq = m["next_seq"]
        flag = delete_condition if delete_condition is not None else F.lit(False)
        out = batch.withColumn(self.SEQ, F.lit(seq)).withColumn(
            self.DEL, F.coalesce(flag.cast("boolean"), F.lit(False))
        )
        out.write.mode("overwrite").parquet(self._delta_dir(seq))
        m["deltas"] = sorted(set(m["deltas"]) | {seq})
        m["next_seq"] = seq + 1
        dbytes, _ = _dir_stats(self._delta_dir(seq))
        m.setdefault("delta_bytes", {})[str(seq)] = dbytes
        self._write_manifest(m)
        stats = {"mode": "mor_merge", "delta_seq": seq, "n_deltas": len(m["deltas"])}
        if epoch_id is not None:
            self.ledger.record(epoch_id, stats)
        stats["delta_bytes"] = dbytes
        trigger = self._compact_trigger(m)
        if trigger:
            stats["compacted"] = True
            stats["compact_trigger"] = trigger
            stats["compact_stats"] = self.compact()
        return stats

    def _compact_trigger(self, m: dict) -> str | None:
        """Which configured trigger (if any) fires on this manifest —
        manifest-only arithmetic, no storage access."""
        n = len(m["deltas"])
        if self.compact_every and n >= self.compact_every:
            return "every"
        if self.compact_ratio is not None and n >= self.min_compact_deltas:
            s = self.scan_stats(m)
            if s["base_bytes"] == 0 or s["delta_ratio"] >= self.compact_ratio:
                return "ratio"
        return None

    def scan_stats(self, m: dict | None = None) -> dict:
        """Live storage shape of a read, off the manifest: what a
        ``read()`` must open right now (base ∪ deltas) and the delta/
        base byte ratio the ``compact_ratio`` policy acts on.
        ``read_amplification`` is scan bytes over live-snapshot bytes,
        estimating the latter as ``base_bytes`` for an updating feed
        (deltas mostly replace base rows); the compaction bench measures
        the true value by compacting and comparing."""
        m = m or self._read_manifest()
        db = m.get("delta_bytes", {})
        missing = [s for s in m["deltas"] if str(s) not in db]
        for s in missing:  # pre-stats manifests: backfill once
            db[str(s)] = _dir_stats(self._delta_dir(s))[0]
        if m.get("base_bytes") is None and m["base_v"] > 0:
            m["base_bytes"] = _dir_stats(self._base_dir(m["base_v"]))[0]
        base = m.get("base_bytes") or 0
        delta = sum(db[str(s)] for s in m["deltas"])
        return {
            "base_bytes": base,
            "delta_bytes": delta,
            "n_deltas": len(m["deltas"]),
            "scan_bytes": base + delta,
            "delta_ratio": delta / base if base else float("inf") if delta else 0.0,
            "read_amplification": (base + delta) / base if base else float("inf") if delta else 1.0,
        }

    # -- reads -----------------------------------------------------------
    def _deltas_df(self, m: dict) -> DataFrame | None:
        paths = [self._delta_dir(s) for s in m["deltas"]]
        if not paths:
            return None
        # deltas may carry evolved schemas — union them at read
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def read(self) -> DataFrame:
        m = self._read_manifest()
        if not self.exists():
            raise FileNotFoundError(f"mor lake table {self.root} has no data")
        deltas = self._deltas_df(m)
        if m["base_v"] == 0:
            base = None
        else:
            base = (
                self.spark.read.parquet(self._base_dir(m["base_v"]))
                .withColumn(self.SEQ, F.lit(0))
                .withColumn(self.DEL, F.lit(False))
            )
        if deltas is None:
            return base.drop(self.SEQ, self.DEL)
        if base is None:
            combined = deltas
            untouched = None
        else:
            dkeys = deltas.select(*self.keys).distinct()
            untouched = base.join(F.broadcast(dkeys), on=self.keys, how="left_anti")
            overlap = base.join(F.broadcast(dkeys), on=self.keys, how="left_semi")
            combined = overlap.unionByName(deltas, allowMissingColumns=True)
        from data_ingestion_resolution_platform_spark.operators.cdc import resolve_latest

        winners = resolve_latest(
            combined, self.keys, self.SEQ, tie_breakers=(self.lsn_col,)
        ).filter(~F.col(self.DEL))
        if untouched is not None:
            winners = untouched.unionByName(winners, allowMissingColumns=True)
        # pin survivor-first column order (evolution appends new cols)
        cols = [c for c in winners.columns if c not in (self.SEQ, self.DEL)]
        return winners.select(*cols)

    # -- maintenance -----------------------------------------------------
    def compact(self, epoch_id: str | int | None = None) -> dict:
        """Fold live deltas into a new base version; one atomic manifest
        replace retires them. Content-idempotent (replaying a crashed
        compaction converges), optionally ledgered."""
        if epoch_id is not None and self.ledger.committed(epoch_id):
            return {"skipped": True, "epoch": str(epoch_id)}
        m = self._read_manifest()
        if not m["deltas"]:
            return {"mode": "compact", "noop": True}
        snapshot = self.read()
        v = m["base_v"] + 1
        if self.cluster_by:
            from data_ingestion_resolution_platform_spark.sources.clustering import (
                write_clustered,
            )

            write_clustered(
                snapshot, self._base_dir(v), self.cluster_by, n_files=self.cluster_files
            )
        else:
            snapshot.write.mode("overwrite").parquet(self._base_dir(v))
        retired = m["deltas"]
        new_m = {
            "base_v": v,
            "deltas": [],
            "next_seq": m["next_seq"],
            "base_bytes": _dir_stats(self._base_dir(v))[0],
            "delta_bytes": {},
        }
        self._write_manifest(new_m)
        for s in retired:
            shutil.rmtree(self._delta_dir(s), ignore_errors=True)
        if m["base_v"] > 0:
            shutil.rmtree(self._base_dir(m["base_v"]), ignore_errors=True)
        stats = {
            "mode": "compact",
            "base_v": v,
            "retired_deltas": len(retired),
            "base_bytes": new_m["base_bytes"],
        }
        if epoch_id is not None:
            self.ledger.record(epoch_id, stats)
        return stats


class PartitionedLakeTable:
    """Hash-bucketed target table with LINEAR-HASHING growth: MERGE
    touches only dirty buckets, and buckets that outgrow
    ``max_bucket_bytes`` split in two *during the rewrite they were
    already paying for* — so per-epoch MERGE cost stays O(batch +
    touched bytes) no matter how much the target grows. The parquet twin
    of Iceberg ``PARTITIONED BY (bucket(N, key))`` where N is
    size-derived instead of fixed (VERDICT round-1 scale hazard #2).

    Layout::

        root/
          _epochs/...                      # exactly-once epoch ledger
          _DIR                             # atomic directory JSON
          b=<id>.<level>/v=<n>/*.parquet   # one store per live bucket

    A bucket ``(b, L)`` owns every row whose
    ``pmod(xxhash64(*bucket_keys), 2^L) == b``; the directory always
    holds a prefix-free covering of the hash space (classic linear
    hashing), so buckets may sit at different levels — hot buckets
    split deeper, cold ones stay coarse. When a touched bucket's
    post-merge bytes exceed the threshold, its staged files (written at
    ``max_level + 1`` granularity) are committed as the two child
    buckets instead of one — a split costs zero extra data movement.

    Commit protocol: stage → move files into per-bucket version dirs →
    ONE atomic ``_DIR`` replace (all touched buckets flip together) →
    ledger record. A crash anywhere before the ledger record leaves the
    previous directory visible and the epoch uncommitted; replay
    recomputes the same deterministic versions and converges
    (SURVEY.md §7.4).
    """

    BUCKET_COL = "__rb"  # staging residue column (max_level+1 granularity)

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        bucket_keys: Sequence[str],
        n_buckets: int = 32,
        max_bucket_bytes: int = 256 << 20,
        sort_within: Sequence[str] | None = None,
    ):
        self.spark = spark
        self.root = root
        self.bucket_keys = list(bucket_keys)
        # cluster rows inside each staged bucket file (Iceberg write
        # sort order): tight per-file min/max on these columns makes
        # scan() pruning effective on range predicates
        self.sort_within = list(sort_within) if sort_within else []
        # initial level: smallest power of two covering n_buckets
        self.initial_level = max(0, (int(n_buckets) - 1).bit_length())
        self.n_buckets = 1 << self.initial_level
        self.max_bucket_bytes = max_bucket_bytes
        os.makedirs(root, exist_ok=True)
        self.ledger = _EpochLedger(root)

    # -- directory -------------------------------------------------------
    @property
    def _dir_path(self) -> str:
        return os.path.join(self.root, "_DIR")

    @property
    def _schema_path(self) -> str:
        return os.path.join(self.root, "_SCHEMA")

    def _read_schema(self):
        try:
            with open(self._schema_path) as f:
                from pyspark.sql import types as T

                return T.StructType.fromJson(json.load(f))
        except FileNotFoundError:
            return None

    def _write_schema(self, schema) -> None:
        # union with the saved schema: an epoch touching only fresh
        # buckets must not narrow the table schema for untouched ones
        saved = self._read_schema()
        if saved is not None:
            from pyspark.sql import types as T

            names = {f.name for f in schema.fields}
            schema = T.StructType(
                list(schema.fields) + [f for f in saved.fields if f.name not in names]
            )
        tmp = self._schema_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(schema.jsonValue(), f)
        os.replace(tmp, self._schema_path)

    def _read_dir(self) -> dict[tuple[int, int], int]:
        """{(bucket, level): version}; version 0 = live but empty."""
        try:
            with open(self._dir_path) as f:
                raw = json.load(f)
            return {(b, lv): v for b, lv, v in raw["buckets"]}
        except FileNotFoundError:
            lv = self.initial_level
            return {(b, lv): 0 for b in range(1 << lv)}

    def _write_dir(self, d: dict[tuple[int, int], int]) -> None:
        tmp = self._dir_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"buckets": sorted([b, lv, v] for (b, lv), v in d.items())}, f)
        os.replace(tmp, self._dir_path)

    def _bucket_dir(self, b: int, level: int, v: int) -> str:
        return os.path.join(self.root, f"b={b}.{level}", f"v={v}")

    def _residue_expr(self, level: int) -> F.Column:
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.bucket_keys]), F.lit(1 << level)
        ).cast("int")

    @staticmethod
    def _owner(residue: int, d: dict[tuple[int, int], int], lstage: int) -> tuple[int, int]:
        """The unique live bucket owning a stage-level residue."""
        for lv in range(lstage, -1, -1):
            cand = (residue % (1 << lv), lv)
            if cand in d:
                return cand
        raise KeyError(f"directory does not cover residue {residue}")

    def exists(self) -> bool:
        return any(v > 0 for v in self._read_dir().values())

    def epoch_committed(self, epoch_id: str | int) -> bool:
        return self.ledger.committed(epoch_id)

    def committed_epochs(self) -> list[str]:
        return self.ledger.all()

    def n_live_buckets(self) -> int:
        return len(self._read_dir())

    def read(self, buckets: Sequence[tuple[int, int]] | None = None) -> DataFrame:
        d = self._read_dir()
        live = [bk for bk in (buckets if buckets is not None else d) if d.get(bk, 0) > 0]
        paths = [self._bucket_dir(b, lv, d[(b, lv)]) for b, lv in live]
        if not paths:
            raise FileNotFoundError(f"partitioned lake table {self.root} has no data")
        # buckets evolve independently: a bucket untouched since before a
        # schema-evolving epoch still holds old-schema files. Iceberg
        # resolves this in the METADATA layer; our stand-in is a saved
        # unified schema (updated at every merge commit) passed to the
        # reader explicitly — parquet clips each file against it and
        # NULL-fills absent columns, with no per-read footer merging
        # (``mergeSchema`` re-reads every live footer per read and was
        # measured 3-5x slower per epoch on a 135-bucket target).
        saved = self._read_schema()
        if saved is not None:
            return self.spark.read.schema(saved).parquet(*paths)
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def scan(self, predicates: Sequence[tuple]) -> DataFrame:
        """Stats-pruned predicate scan over the live buckets (see
        ``LakeTable.scan``). Composes with the hash-bucket layout:
        bucket dirs whose files' footer bounds exclude the predicate
        are planned away driver-side — with ``sort_within`` clustering
        a time/LSN column, a time-ranged scan over a grown target opens
        only the files that can contain the range. Results always equal
        ``read().filter(...)``; report on ``self.last_scan_report``."""
        from data_ingestion_resolution_platform_spark.sources.skipping import pruned_scan

        d = self._read_dir()
        dirs = [self._bucket_dir(b, lv, v) for (b, lv), v in d.items() if v > 0]
        if not dirs:
            raise FileNotFoundError(f"partitioned lake table {self.root} has no data")
        df, self.last_scan_report = pruned_scan(
            self.spark, self.root, dirs, predicates, schema=self._read_schema()
        )
        return df

    def merge(
        self,
        batch: DataFrame,
        keys: Sequence[str],
        epoch_id: str | int | None = None,
        delete_condition: F.Column | None = None,
    ) -> dict:
        """Bucket-pruned COW MERGE with size-triggered bucket splits;
        same WHEN-clause semantics as ``LakeTable.merge``. ``batch``
        must be key-unique."""
        if epoch_id is not None and self.ledger.committed(epoch_id):
            return {"skipped": True, "epoch": str(epoch_id)}
        key_list = list(keys)
        d = self._read_dir()
        lmax = max(lv for _, lv in d)
        # stage one level finer than the deepest bucket: every touched
        # bucket can split once per epoch with zero re-reads
        lstage = lmax + 1
        rcol = self.BUCKET_COL
        # staged is consumed three times (touched probe, anti-join build
        # side, staging write) — persist so the upstream plan runs once
        staged = batch.withColumn(rcol, self._residue_expr(lstage)).persist()
        try:
            # driver-side planning on residues: ≤ min(2^lstage, distinct
            # batch keys) small ints — the Iceberg-manifest-sized
            # metadata op, never data
            touched_res = sorted(r[0] for r in staged.select(rcol).distinct().collect())
            touched = sorted({self._owner(r, d, lstage) for r in touched_res})
            upserts = (
                staged.filter(~delete_condition) if delete_condition is not None else staged
            )
            touched_live = [bk for bk in touched if d[bk] > 0]
            if touched_live:
                current = self.read(touched_live).withColumn(
                    rcol, self._residue_expr(lstage)
                )
                survivors = current.join(
                    F.broadcast(staged.select(*key_list)), on=key_list, how="left_anti"
                )
                # add-column schema evolution, as in LakeTable.merge
                merged = survivors.unionByName(upserts, allowMissingColumns=True)
                out_cols = [c for c in batch.columns if c != rcol] + [
                    c for c in current.columns if c not in batch.columns and c != rcol
                ]
            else:
                merged = upserts
                out_cols = [c for c in batch.columns if c != rcol]
            # join(on=keys) reorders columns key-first; pin a stable
            # column order so every bucket file shares one schema layout
            merged = merged.select(*out_cols, rcol)
            out_schema = merged.drop(rcol).schema
            # one staging write partitioned by residue; repartition on
            # the residue first so each residue is written by exactly one
            # task (~1 file per residue — file-count hygiene that keeps
            # survivor scans cheap across epochs)
            staging = os.path.join(
                self.root, f"_staging_{epoch_id if epoch_id is not None else 'adhoc'}"
            )
            shutil.rmtree(staging, ignore_errors=True)
            n_tasks = max(1, min(len(touched_res), self.spark.sparkContext.defaultParallelism))
            staged_out = merged.repartition(n_tasks, F.col(rcol))
            if self.sort_within:
                staged_out = staged_out.sortWithinPartitions(rcol, *self.sort_within)
            staged_out.write.mode("overwrite").partitionBy(rcol).parquet(staging)
        finally:
            staged.unpersist()

        def res_dir(r: int) -> str:
            return os.path.join(staging, f"{rcol}={r}")

        def res_bytes(r: int) -> int:
            p = res_dir(r)
            if not os.path.isdir(p):
                return 0
            return sum(
                e.stat().st_size for e in os.scandir(p) if e.name.endswith(".parquet")
            )

        def commit_version(b: int, lv: int, residues: list[int], dirmap) -> int:
            """Move staged residue files into a fresh version dir for
            (b, lv); returns the new version (0 if the bucket is empty)."""
            present = [r for r in residues if os.path.isdir(res_dir(r))]
            prev = dirmap.get((b, lv), 0)
            if not present:
                dirmap[(b, lv)] = 0
                return 0
            v = prev + 1
            dst = self._bucket_dir(b, lv, v)
            shutil.rmtree(dst, ignore_errors=True)
            os.makedirs(dst)
            for r in present:
                for name in os.listdir(res_dir(r)):
                    if name.endswith(".parquet"):
                        shutil.move(
                            os.path.join(res_dir(r), name),
                            os.path.join(dst, f"r{r}_{name}"),
                        )
            dirmap[(b, lv)] = v
            return v

        new_dir = dict(d)
        n_written = n_splits = 0
        for b, lv in touched:
            # all stage-level residues owned by this bucket
            residues = list(range(b, 1 << lstage, 1 << lv))
            size = sum(res_bytes(r) for r in residues)
            if size == 0 and d[(b, lv)] == 0:
                continue  # delete-only batch for a bucket that never had data
            if size > self.max_bucket_bytes and lv < lstage:
                # split during the rewrite we already paid for: commit
                # the staged files as the two children
                del new_dir[(b, lv)]
                for child in (b, b + (1 << lv)):
                    child_res = [r for r in residues if r % (1 << (lv + 1)) == child]
                    if commit_version(child, lv + 1, child_res, new_dir):
                        n_written += 1
                n_splits += 1
            else:
                if commit_version(b, lv, residues, new_dir):
                    n_written += 1
        # persist the (possibly evolved) unified schema, then one atomic
        # flip of every touched bucket. A crash in between leaves a
        # schema that is a superset of the files — reads NULL-fill.
        self._write_schema(out_schema)
        self._write_dir(new_dir)
        # vacuum: drop superseded version dirs and retired parents
        for (b, lv), v in list(d.items()):
            if (b, lv) not in new_dir and v > 0:
                shutil.rmtree(os.path.join(self.root, f"b={b}.{lv}"), ignore_errors=True)
        for (b, lv), v in new_dir.items():
            base = os.path.join(self.root, f"b={b}.{lv}")
            if not os.path.isdir(base):
                continue
            for name in os.listdir(base):
                if name.startswith("v=") and int(name.split("=", 1)[1]) != v:
                    shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)
        stats = {
            "mode": "merge",
            "touched_buckets": len(touched),
            "written_buckets": n_written,
            "splits": n_splits,
            "n_buckets": len(new_dir),
        }
        if epoch_id is not None:
            self.ledger.record(epoch_id, stats)
        return stats
