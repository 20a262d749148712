"""Parquet-backed lake table with MERGE-INTO semantics + epoch ledger.

On a production cluster this module is a thin wrapper over Iceberg
(``MERGE INTO target USING batch ON keys``, table ``PARTITIONED BY
(bucket(N, key))``, snapshot isolation from the Iceberg catalog). This
sandbox has no Iceberg runtime (no network to fetch jars), so we
implement the identical semantics over plain parquet:

- **copy-on-write MERGE**: ``target LEFT ANTI JOIN batch`` (survivors)
  ``UNION ALL`` batch upserts — exactly what Iceberg's COW MERGE
  rewrites, expressed declaratively so Catalyst broadcast-joins small
  batches against the big target.
- **atomic versioned commits**: each write lands in ``v=<n>/`` and a
  ``_LATEST`` pointer file is atomically renamed — readers never see a
  partial write (Iceberg's snapshot pointer, miniaturized).
- **exactly-once epoch ledger**: ``_epochs/<epoch_id>`` marker files;
  ``merge(..., epoch_id=...)`` is a no-op for an already-committed
  epoch — the reference's COMPLETED-status idempotency guard
  (`/root/reference/backend/worker.py:236-238`) re-expressed as a
  commit ledger (SURVEY.md §2.7 M5).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LakeTable:
    """A versioned parquet table with append / overwrite / merge / delete.

    Layout::

        root/
          _LATEST            # text file: current version number
          v=1/ part-*.parquet
          v=2/ ...
          _epochs/<id>.json  # committed-epoch ledger (exactly-once)
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        os.makedirs(self._epoch_dir, exist_ok=True)

    # -- version plumbing ------------------------------------------------
    @property
    def _latest_path(self) -> str:
        return os.path.join(self.root, "_LATEST")

    @property
    def _epoch_dir(self) -> str:
        return os.path.join(self.root, "_epochs")

    def current_version(self) -> int:
        try:
            with open(self._latest_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.root, f"v={v}")

    def _commit_version(self, v: int) -> None:
        tmp = self._latest_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._latest_path)  # atomic pointer swap

    def exists(self) -> bool:
        return self.current_version() > 0

    # -- reads -----------------------------------------------------------
    def read(self) -> DataFrame:
        v = self.current_version()
        if v == 0:
            raise FileNotFoundError(f"lake table {self.root} has no committed version")
        return self.spark.read.parquet(self._version_dir(v))

    # -- epoch ledger (exactly-once) --------------------------------------
    def epoch_committed(self, epoch_id: str | int) -> bool:
        return os.path.exists(os.path.join(self._epoch_dir, f"{epoch_id}.json"))

    def _record_epoch(self, epoch_id: str | int, stats: dict) -> None:
        path = os.path.join(self._epoch_dir, f"{epoch_id}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": str(epoch_id), "ts": time.time(), **stats}, f)
        os.replace(tmp, path)

    def committed_epochs(self) -> list[str]:
        return sorted(
            os.path.splitext(p)[0]
            for p in os.listdir(self._epoch_dir)
            if p.endswith(".json")
        )

    # -- writes ----------------------------------------------------------
    def overwrite(self, df: DataFrame, epoch_id: str | int | None = None) -> None:
        """Full-refresh rebuild (S10 / M4: the reference's delete-then-
        reinsert finalize, `main.py:158-159`) — but atomic."""
        if epoch_id is not None and self.epoch_committed(epoch_id):
            return
        v = self.current_version() + 1
        df.write.mode("overwrite").parquet(self._version_dir(v))
        self._commit_version(v)
        if epoch_id is not None:
            self._record_epoch(epoch_id, {"mode": "overwrite"})
        self._vacuum(keep=3)

    def append(self, df: DataFrame, epoch_id: str | int | None = None) -> None:
        """S9: append-only write (bronze/audit tables)."""
        if epoch_id is not None and self.epoch_committed(epoch_id):
            return
        v = self.current_version()
        new_v = v + 1
        if v > 0:
            combined = self.read().unionByName(df, allowMissingColumns=True)
        else:
            combined = df
        combined.write.mode("overwrite").parquet(self._version_dir(new_v))
        self._commit_version(new_v)
        if epoch_id is not None:
            self._record_epoch(epoch_id, {"mode": "append"})
        self._vacuum(keep=3)

    def merge(
        self,
        batch: DataFrame,
        keys: Sequence[str],
        epoch_id: str | int | None = None,
        delete_condition: F.Column | None = None,
    ) -> dict:
        """MERGE INTO this USING batch ON keys.

        - matched + ``delete_condition`` ⇒ DELETE (tombstone, M6)
        - matched ⇒ UPDATE (replace row with batch row, M1-M3)
        - not matched ⇒ INSERT
        - batch rows with ``delete_condition`` and no match ⇒ no-op

        ``batch`` must be key-unique (resolve upstream). Idempotent per
        ``epoch_id``. Returns stats for the lineage table.

        Iceberg equivalent::

            MERGE INTO t USING b ON <keys>
            WHEN MATCHED AND b.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED AND b.op <> 'D' THEN INSERT *
        """
        if epoch_id is not None and self.epoch_committed(epoch_id):
            return {"skipped": True, "epoch": str(epoch_id)}
        key_list = list(keys)
        deletes = batch.filter(delete_condition) if delete_condition is not None else None
        upserts = (
            batch.filter(~delete_condition) if delete_condition is not None else batch
        )
        if self.exists():
            current = self.read()
            # survivors: target keys untouched by this batch (anti join —
            # broadcast when the batch is small; AQE decides).
            survivors = current.join(batch.select(*key_list), on=key_list, how="left_anti")
            merged = survivors.unionByName(
                upserts.select(*current.columns), allowMissingColumns=False
            )
        else:
            merged = upserts
        v = self.current_version() + 1
        merged.write.mode("overwrite").parquet(self._version_dir(v))
        self._commit_version(v)
        stats = {
            "mode": "merge",
            "upserts": upserts.count(),
            "deletes": deletes.count() if deletes is not None else 0,
        }
        if epoch_id is not None:
            self._record_epoch(epoch_id, stats)
        self._vacuum(keep=3)
        return stats

    def _vacuum(self, keep: int = 3) -> None:
        """Drop versions older than the newest ``keep`` (Iceberg's
        snapshot expiry)."""
        current = self.current_version()
        for name in os.listdir(self.root):
            if name.startswith("v="):
                v = int(name.split("=", 1)[1])
                if v <= current - keep:
                    shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
