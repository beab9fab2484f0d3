"""Storage layer: table catalog, MERGE-style upsert, checkpoint manifest (M4).

Logical contract = Iceberg (`MERGE INTO`, snapshot-based resume); physical
implementation here = plain parquet directories, because no Iceberg runtime
jar can be fetched in the sandbox (SURVEY §7.0). This module is the single
swap point: on a real cluster, replace ``Catalog`` internals with
``df.writeTo(...).using("iceberg")`` + SQL ``MERGE INTO`` and the manifest
with Iceberg snapshot metadata — every operator and pipeline above this layer
is unchanged.

Capabilities mirrored from the reference:

* UPSERT idempotency (re-import updates the row) —
  /root/reference/src/markdown_importer.py:202-210,
  src/embed_importer.py:276-289 → :meth:`Catalog.merge_upsert`.
* Stage skipping / resume from any stage — /root/reference/run_pipeline.sh:52-64
  → per-partition manifest + :func:`run_stage` pending-partition filtering.
* Per-item error isolation with success/failure counters —
  /root/reference/src/markdown_importer.py:216-219,234-272 → error-split
  writes + rows_in/rows_out/errors metrics per partition (north_rule).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.schema import MANIFEST_SCHEMA

MANIFEST_TABLE = "__manifest__"


class Catalog:
    """A directory of parquet tables with atomic overwrite + merge upsert."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        """Resolve a table name under the catalog root. Names may contain
        ``/`` (internal nested layouts like ``__snapshots__/<table>/<snap>``)
        but can never escape the root: absolute paths, backslashes, and
        empty / ``.`` / ``..`` components are rejected. Validating HERE
        covers every entry point (read/write/drop/merge/snapshot/restore)
        — the r2 advisor fix only guarded snapshot_name, leaving the table
        name on the same f-string line as a traversal vector."""
        if (
            not name
            or name.startswith("/")
            or "\\" in name
            or any(part in ("", ".", "..") for part in name.split("/"))
        ):
            raise ValueError(
                f"invalid table name {name!r}: must be a relative path with "
                "no empty, '.' or '..' components"
            )
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" or os.path.isdir(os.path.join(p, f))
            for f in os.listdir(p)
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def drop(self, name: str) -> None:
        shutil.rmtree(self.path(name), ignore_errors=True)

    def merge_upsert(self, updates: DataFrame, name: str, key_cols: list[str]) -> None:
        """MERGE INTO emulation keyed on ``key_cols``: new rows win over
        existing rows with the same key (WHEN MATCHED UPDATE semantics).

        Within ``updates`` itself, duplicate keys are resolved deterministically
        (arbitrary-but-stable first row per key) before the merge, mirroring
        the unique-key constraint the reference's UPSERT relies on.

        Atomicity: the merged result is written to a staging dir, then swapped
        in with two renames (crash before the final rename leaves the old
        table intact).
        """
        updates = updates.dropDuplicates(key_cols)
        target = self.path(name)
        if not self.exists(name):
            updates.write.mode("overwrite").parquet(target)
            return
        existing = self.spark.read.parquet(target)
        keep = existing.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = keep.unionByName(updates)
        staging = target + ".__staging__" + uuid.uuid4().hex[:8]
        merged.write.mode("overwrite").parquet(staging)
        old = target + ".__old__" + uuid.uuid4().hex[:8]
        os.rename(target, old)
        os.rename(staging, target)
        shutil.rmtree(old, ignore_errors=True)

    def merge_upsert_bucketed(
        self,
        updates: DataFrame,
        name: str,
        key_cols: list[str],
        n_buckets: int = 64,
    ) -> None:
        """Partition-local MERGE: the table lives partitioned by
        ``__kb = pmod(xxhash64(keys), n_buckets)``; a merge rewrites ONLY
        the bucket partitions that contain update keys (dynamic partition
        overwrite), so merge cost is O(affected buckets), not O(table) —
        the scale fix for :meth:`merge_upsert`'s full rewrite (r1 accepted
        debt). On Iceberg this whole method is ``MERGE INTO`` with
        bucket-partitioned tables; the layout and touched-partition math are
        identical. Read the table back with :meth:`read_bucketed`.

        Duplicate keys WITHIN ``updates`` are resolved like
        :meth:`merge_upsert`: ``dropDuplicates(key_cols)`` keeps an
        arbitrary-but-stable single row per key (the unique-key contract the
        reference's UPSERT relies on); conflicting duplicate update rows are
        NOT an error — dedupe upstream if last-writer-wins ordering matters.

        Atomicity is per-partition (Spark's commit protocol swaps each
        ``__kb=N`` directory); a crash mid-merge can leave some buckets
        merged and others not, but every bucket is internally consistent and
        re-running the same merge is idempotent.
        """
        kb = F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")
        updates = updates.dropDuplicates(key_cols).withColumn("__kb", kb)
        target = self.path(name)
        if not self.exists(name):
            updates.write.mode("overwrite").partitionBy("__kb").parquet(target)
            return
        affected = [r["__kb"] for r in updates.select("__kb").distinct().collect()]
        existing = self.spark.read.parquet(target).filter(
            F.col("__kb").isin(affected)  # partition-pruned scan
        )
        keep = existing.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = keep.unionByName(updates)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__kb")
            .parquet(target)
        )

    def read_bucketed(self, name: str) -> DataFrame:
        """Read a bucket-partitioned table, hiding the bucket column."""
        return self.read(name).drop("__kb")

    # ------------------------------------------------------------------
    # snapshots (S11 — reference pg_dump/restore, README.md:244-254)
    # ------------------------------------------------------------------
    def _partition_cols(self, name: str) -> list[str]:
        """Hive-style partition columns of a table directory (top-level
        ``col=value`` subdirs), e.g. ``__kb`` for bucketed tables."""
        p = self.path(name)
        if not os.path.isdir(p):
            return []
        cols = []
        for entry in os.listdir(p):
            if os.path.isdir(os.path.join(p, entry)) and "=" in entry:
                col = entry.split("=", 1)[0]
                if col not in cols:
                    cols.append(col)
        return cols

    @staticmethod
    def _check_snapshot_name(snapshot_name: str) -> None:
        """Snapshot names become path components: reject separators and
        traversal so a name can never escape the ``__snapshots__`` tree."""
        if (
            not snapshot_name
            or "/" in snapshot_name
            or "\\" in snapshot_name
            or snapshot_name in (".", "..")
        ):
            raise ValueError(
                f"invalid snapshot name {snapshot_name!r}: must be a single "
                "non-empty path component (no '/', '\\', '.' or '..')"
            )

    def snapshot(self, name: str, snapshot_name: str) -> str:
        """CTAS-style snapshot of a table's CURRENT contents, PRESERVING its
        partition layout (a bucketed table restores bucketed, so
        merge_upsert_bucketed keeps working after a restore). Re-snapshotting
        the same name overwrites (idempotent). On Iceberg this becomes a
        zero-copy tag/branch; here it is a parquet copy through Spark."""
        self._check_snapshot_name(snapshot_name)
        snap = f"__snapshots__/{name}/{snapshot_name}"
        os.makedirs(os.path.dirname(self.path(snap)), exist_ok=True)
        w = self.read(name).write.mode("overwrite")
        parts = self._partition_cols(name)
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(self.path(snap))
        return snap

    def list_snapshots(self, name: str) -> list[str]:
        d = self.path(f"__snapshots__/{name}")
        if not os.path.isdir(d):
            return []
        return sorted(
            s for s in os.listdir(d) if os.path.isdir(os.path.join(d, s))
        )

    def restore(self, name: str, snapshot_name: str) -> None:
        """Restore a table from a snapshot, atomically: the snapshot is
        materialized to a staging dir, then swapped in with two renames
        (same crash contract as merge_upsert). The snapshot itself is
        untouched, so restore is repeatable."""
        self._check_snapshot_name(snapshot_name)
        snap = f"__snapshots__/{name}/{snapshot_name}"
        if not self.exists(snap):
            raise FileNotFoundError(f"no snapshot {snapshot_name!r} for table {name!r}")
        target = self.path(name)
        staging = target + ".__staging__" + uuid.uuid4().hex[:8]
        w = self.read(snap).write.mode("overwrite")
        parts = self._partition_cols(snap)
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(staging)
        if os.path.isdir(target):
            old = target + ".__old__" + uuid.uuid4().hex[:8]
            os.rename(target, old)
            os.rename(staging, target)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(staging, target)

    # ------------------------------------------------------------------
    # manifest
    # ------------------------------------------------------------------
    def manifest(self) -> DataFrame:
        if not self.exists(MANIFEST_TABLE):
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)
        return self.read(MANIFEST_TABLE)

    def append_manifest(self, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [
                (
                    r["stage"], int(r["partition_id"]), r["status"],
                    int(r["rows_in"]), int(r["rows_out"]), int(r["errors"]),
                    r.get("lineage"), r["run_id"],
                )
                for r in rows
            ],
            MANIFEST_SCHEMA,
        )
        df.write.mode("append").parquet(self.path(MANIFEST_TABLE))

    def completed_partitions(self, stage: str, lineage: str | None = None) -> set[int]:
        if not self.exists(MANIFEST_TABLE):
            return set()
        m = self.manifest().filter(
            (F.col("stage") == stage) & (F.col("status") == "completed")
        )
        if lineage is not None:
            m = m.filter(F.col("lineage") == lineage)
        return {r.partition_id for r in m.select("partition_id").distinct().collect()}


def partition_id_col(key_col: str, n_partitions: int) -> F.Column:
    """Deterministic partition assignment: pmod(xxhash64(key), n)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_partitions)).cast("int")


def run_stage(
    catalog: Catalog,
    stage: str,
    input_df: DataFrame,
    transform,
    key_col: str = "doc_id",
    n_partitions: int = 8,
    run_id: str | None = None,
    lineage: str | None = None,
    error_col: str | None = None,
    fail_after_partitions: int | None = None,
    granular: bool = True,
) -> DataFrame:
    """Run one checkpointed pipeline stage, resumable per partition.

    * input rows are assigned a deterministic ``__pid`` bucket;
    * buckets already ``completed`` in the manifest (same stage+lineage) are
      skipped entirely — a re-run after a crash is a no-op for them;
    * ``granular=True``: each pending bucket is transformed and written
      independently (output dir ``{stage}/__pid={p}``), then its manifest row
      is appended — the write is atomic per bucket via staging-dir rename.
      Finest resume granularity; one Spark job per bucket.
    * ``granular=False`` (throughput mode): ALL pending buckets run in ONE
      Spark job (dynamic partition overwrite on ``__pid``); manifest rows land
      after the job commits. A crash mid-job redoes all pending buckets but
      stays idempotent — completed buckets from previous runs are untouched.
      Requires ``transform`` to preserve ``key_col`` so ``__pid`` can be
      recomputed on the output.
    * when ``error_col`` is set, rows with a non-null error value are split to
      ``{stage}_errors`` and counted in the manifest instead of failing the
      stage (per-item error isolation, F3).

    ``fail_after_partitions`` is a test hook: raise after N buckets to
    simulate a mid-run crash (granular mode only).

    Returns the full stage output (read back from the table).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    lineage = lineage or stage + ":input"
    done = catalog.completed_partitions(stage, lineage)
    bucketed = input_df.withColumn("__pid", partition_id_col(key_col, n_partitions))
    pending = [p for p in range(n_partitions) if p not in done]

    table_dir = catalog.path(stage)
    os.makedirs(table_dir, exist_ok=True)

    if not granular and pending:
        sub = bucketed.filter(F.col("__pid").isin(pending)).drop("__pid")
        in_counts = {
            r["__pid"]: r["count"]
            for r in bucketed.filter(F.col("__pid").isin(pending))
            .groupBy("__pid").count().collect()
        }
        out = transform(sub)
        if error_col is not None:
            bad = out.filter(F.col(error_col).isNotNull())
            err_counts = {
                r["__pid"]: r["count"]
                for r in bad.withColumn("__pid", partition_id_col(key_col, n_partitions))
                .groupBy("__pid").count().collect()
            }
            if err_counts:
                bad.write.mode("append").parquet(catalog.path(stage + "_errors"))
            out = out.filter(F.col(error_col).isNull()).drop(error_col)
        else:
            err_counts = {}
        out = out.withColumn("__pid", partition_id_col(key_col, n_partitions))
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__pid")
            .parquet(table_dir)
        )
        out_counts = {
            r["__pid"]: r["count"]
            for r in catalog.spark.read.parquet(table_dir)
            .filter(F.col("__pid").isin(pending)).groupBy("__pid").count().collect()
        }
        catalog.append_manifest(
            [
                {
                    "stage": stage,
                    "partition_id": pid,
                    "status": "completed",
                    "rows_in": in_counts.get(pid, 0),
                    "rows_out": out_counts.get(pid, 0),
                    "errors": err_counts.get(pid, 0),
                    "lineage": lineage,
                    "run_id": run_id,
                }
                for pid in pending
            ]
        )
        return catalog.spark.read.parquet(table_dir).drop("__pid")

    processed = 0
    for pid in pending:
        if fail_after_partitions is not None and processed >= fail_after_partitions:
            raise RuntimeError(f"simulated crash after {processed} partitions")
        part_in = bucketed.filter(F.col("__pid") == pid).drop("__pid")
        rows_in = part_in.count()
        out = transform(part_in)
        if error_col is not None:
            bad = out.filter(F.col(error_col).isNotNull())
            good = out.filter(F.col(error_col).isNull()).drop(error_col)
            n_err = bad.count()
            if n_err:
                bad.write.mode("append").parquet(catalog.path(stage + "_errors"))
            out = good
        else:
            n_err = 0
        part_dir = os.path.join(table_dir, f"__pid={pid}")
        staging = part_dir + ".__staging__" + run_id
        out.write.mode("overwrite").parquet(staging)
        rows_out = catalog.spark.read.parquet(staging).count()
        shutil.rmtree(part_dir, ignore_errors=True)
        os.rename(staging, part_dir)
        catalog.append_manifest(
            [
                {
                    "stage": stage,
                    "partition_id": pid,
                    "status": "completed",
                    "rows_in": rows_in,
                    "rows_out": rows_out,
                    "errors": n_err,
                    "lineage": lineage,
                    "run_id": run_id,
                }
            ]
        )
        processed += 1

    return catalog.spark.read.option("basePath", table_dir).parquet(
        *[os.path.join(table_dir, f"__pid={p}") for p in range(n_partitions)]
    ).drop("__pid")
