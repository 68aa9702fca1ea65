"""Merge-on-read deletes: deletion vectors + compaction for parquet
tables.

The CDC target family (sources/target.py) is copy-on-write — a delete
rewrites the touched bucket. That is the right trade when deletes arrive
with the batch that owns the bucket anyway (the merge already rewrites
it); it is the WRONG trade for sparse retroactive deletes — GDPR
erasure, retention sweeps, corpus redactions — where rewriting a 1 GB
file to drop 3 rows costs 9 orders of magnitude more IO than the
deletes. Delta and Iceberg both grew deletion vectors for exactly this;
this module is that feature, Spark-first:

- **delete** (``delete_where``): one scan evaluates the predicate and
  emits only ``(_metadata.file_path, _metadata.row_index)`` of the hit
  rows — Spark's stable per-file row position, so the vector survives
  any later scan order. The cumulative vector is written as a NEW
  version under ``_dv/`` and committed with an atomic pointer flip
  (``os.replace``), the same idempotent-commit discipline as the
  versioned CDC target. Cost: O(matching rows), never a data rewrite.
- **read**: data scan (with metadata columns) LEFT ANTI the current
  vector on (file, row). The vector is deletes-sized — tiny relative to
  data — so the anti-join plans as a broadcast; correctness never
  depends on size, only the join strategy does.
- **compact**: when the vector grows past taste, one rewrite folds it
  into the files and resets the vector — merge-on-read's amortization
  valve (Delta's OPTIMIZE). Write-to-temp, then swap: readers of the
  old files are never mid-rewrite.

At 100 TB: deletes are metadata-rate, reads pay one broadcast
hash-probe per row, and compaction is a scheduled background rewrite —
the standard lakehouse cost model.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DV_SCHEMA = "file string, row_idx long"


class DeletionVectorTable:
    """``auto_compact_threshold``: when set, ``delete_where`` folds the
    vector into the data (``compact``) as soon as the cumulative deleted
    count reaches the threshold — merge-on-read's amortization valve run
    as policy instead of by hand (Delta's OPTIMIZE trigger). Bounds read
    amplification: the broadcast anti-join's right side never exceeds the
    threshold, and the data file count returns to ``n_files`` at each
    fold, so a long delete soak's read cost stays flat (pinned in
    tests/test_soak.py)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        auto_compact_threshold: int | None = None,
        n_files: int = 8,
    ):
        self.spark = spark
        self.path = path
        self.auto_compact_threshold = auto_compact_threshold
        self.n_files = n_files
        self.compactions = 0  # policy observability for tests/ops

    @property
    def _dv_root(self) -> str:
        return os.path.join(self.path, "_dv")

    @property
    def _pointer(self) -> str:
        return os.path.join(self._dv_root, "_CURRENT")

    def _current_version(self) -> int | None:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _dv_path(self, version: int) -> str:
        return os.path.join(self._dv_root, f"v{version:06d}")

    def _release_claim(self, v: int) -> None:
        try:
            os.rmdir(os.path.join(self._dv_root, f"_claim_v{v:06d}"))
        except OSError:
            pass

    def _abort_staged(self, v: int) -> None:
        shutil.rmtree(self._dv_path(v), ignore_errors=True)
        self._release_claim(v)

    def write(self, df: DataFrame, n_files: int = 8) -> None:
        df.repartition(n_files).write.mode("overwrite").parquet(self.path)
        if os.path.exists(self._dv_root):  # fresh table: no deletes yet
            shutil.rmtree(self._dv_root)

    def _dv(self) -> DataFrame | None:
        v = self._current_version()
        if v is None:
            return None
        return self.spark.read.parquet(self._dv_path(v))

    def _with_pos(self) -> DataFrame:
        return self.spark.read.parquet(self.path).select(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.row_index").alias("row_idx"),
            "*",
        )

    def delete_where(self, pred) -> int:
        """Mark rows matching ``pred`` deleted; returns rows newly marked.
        One scan emits (file, row) of the hits; the cumulative vector is
        committed as a new version + CAS pointer flip. No data file is
        touched.

        The commit is the same claim-marker + compare-and-swap protocol as
        the versioned CDC target (sources/target.py): two concurrent
        deleters (a GDPR sweep racing a retention job) must not both flip
        to vectors that each lack the other's rows — that silently
        RESURRECTS erased records, the one failure mode a deletion store
        cannot have. The loser raises ConcurrentWriteError with its staged
        vector removed; a retry re-reads the winner's cumulative vector
        and converges."""
        import time

        from tipoca_stream_spark.sources.target import ConcurrentWriteError

        base = self._current_version()
        hits = self._with_pos().filter(pred).select("file", "row_idx")
        prior = self._dv()
        new = hits if prior is None else prior.union(hits).distinct()
        os.makedirs(self._dv_root, exist_ok=True)
        # claim a version number via atomic mkdir on a marker Spark never
        # touches (overwrite deletes+recreates its own target dir)
        v = (base or 0) + 1
        while True:
            if os.path.isdir(self._dv_path(v)):
                v += 1
                continue
            try:
                os.mkdir(os.path.join(self._dv_root, f"_claim_v{v:06d}"))
                break
            except FileExistsError:
                v += 1
        new.coalesce(1).write.mode("overwrite").parquet(self._dv_path(v))
        total = self.spark.read.parquet(self._dv_path(v)).count()
        n_new = total - (prior.count() if prior is not None else 0)

        lock = self._pointer + ".lock"
        fd = None
        deadline = time.monotonic() + 30.0
        while fd is None:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                if time.monotonic() > deadline:
                    self._abort_staged(v)
                    raise TimeoutError(f"delete-vector commit lock {lock} held >30s")
                time.sleep(0.02)
        try:
            if self._current_version() != base:
                self._abort_staged(v)
                raise ConcurrentWriteError(
                    f"deletion vector at {self.path}: pointer moved from "
                    f"{base!r} to {self._current_version()!r} while this delete "
                    f"staged v{v:06d}; staged vector removed — retry the delete "
                    "against the current cumulative vector"
                )
            tmp = self._pointer + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(v))
            os.replace(tmp, self._pointer)  # atomic commit
            self._release_claim(v)
        finally:
            os.close(fd)
            os.unlink(lock)
        # vector versions are cumulative — superseded ones serve no reader
        # after the flip; keep one for in-flight scans, drop the rest so a
        # long delete soak's metadata stays O(1) files
        victims = sorted(
            d for d in os.listdir(self._dv_root)
            if d.startswith("v") and d != f"v{v:06d}" and d != f"v{v - 1:06d}"
        )
        for d in victims:
            shutil.rmtree(os.path.join(self._dv_root, d), ignore_errors=True)
        if (
            self.auto_compact_threshold is not None
            and total >= self.auto_compact_threshold
        ):
            self.compact(self.n_files)
            self.compactions += 1
        return n_new

    def read(self) -> DataFrame:
        dv = self._dv()
        base = self._with_pos()
        if dv is None:
            return base.drop("file", "row_idx")
        # deletes-sized right side: plans as a broadcast anti-join
        return base.join(
            F.broadcast(dv), on=["file", "row_idx"], how="left_anti"
        ).drop("file", "row_idx")

    def deleted_count(self) -> int:
        dv = self._dv()
        return 0 if dv is None else dv.count()

    def compact(self, n_files: int = 8) -> None:
        """Fold the vector into the data: rewrite surviving rows to a
        temp dir, swap it in, reset the vector. Old files are fully
        replaced only after the rewrite completes."""
        tmp = self.path + "__compact_tmp"
        self.read().repartition(n_files).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(os.path.join(self.path, "part-*")):
            os.remove(f)
        shutil.rmtree(self._dv_root, ignore_errors=True)
        for f in glob.glob(os.path.join(tmp, "part-*")):
            shutil.move(f, os.path.join(self.path, os.path.basename(f)))
        shutil.rmtree(tmp, ignore_errors=True)
