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
  valve (Delta's OPTIMIZE). Nothing is EVER mutated in place (VERDICT
  r6 worklist #1, the loader's staged-merge discipline,
  reference load_processor.go:386-444): the fold writes a brand-new
  ``d=<n>`` data-version directory, then one CAS pointer flip makes it
  current and resets the vector atomically. A reader that resolved the
  pointer before the flip keeps scanning the old (intact) version; a
  crash between stage and flip leaves the old state current and only a
  janitor-collectable orphan behind.

Every commit — delete or fold — goes through ONE pointer file holding
``(data_version, vector_version)`` as a unit, claim-marker version
allocation, and a compare-and-swap flip. A delete racing a fold (or a
second delete) can lose the CAS but can never clobber, resurrect, or
half-apply anything.

At 100 TB: deletes are metadata-rate, reads pay one broadcast
hash-probe per row, and compaction is a scheduled background rewrite —
the standard lakehouse cost model.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DV_SCHEMA = "file string, row_idx long"

# pointer sentinel for "no deletion vector"
_NO_DV = -1


class DeletionVectorTable:
    """``auto_compact_threshold``: when set, ``delete_where`` folds the
    vector into the data (``compact``) as soon as the cumulative deleted
    count reaches the threshold — merge-on-read's amortization valve run
    as policy instead of by hand (Delta's OPTIMIZE trigger). Bounds read
    amplification: the broadcast anti-join's right side never exceeds the
    threshold, and the data file count returns to ``n_files`` at each
    fold, so a long delete soak's read cost stays flat (pinned in
    tests/test_soak.py).

    Layout (all state under ``path``)::

        _CURRENT            "<data_v>:<dv_v>"  (dv_v = -1 → no vector)
        d=<n>/part-*        immutable data versions
        _dv/v<nnnnnn>/      immutable cumulative vector versions
        _claim_d=<n>/       data-version claim markers (atomic mkdir)
        _dv/_claim_v<n>/    vector-version claim markers

    The single pointer file is the one mutable object; both halves flip
    together, so "which data files" and "which deletes apply to them"
    can never be observed out of sync."""

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

    # --- pointer: one file, (data_version, dv_version) flip as a unit ----

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def _state(self) -> tuple[int | None, int | None]:
        """(data_version, vector_version) named by the pointer; (None,
        None) when the table has never been written."""
        try:
            with open(self._pointer) as f:
                d, v = f.read().strip().split(":")
            dv = int(v)
            return int(d), (None if dv == _NO_DV else dv)
        except (FileNotFoundError, ValueError):
            return None, None

    def _current_version(self) -> int | None:
        """Current VECTOR version (None = no deletes). Separate from
        ``_state`` so the concurrency tests can interpose on exactly the
        base-capture read."""
        return self._state()[1]

    def _current_data_version(self) -> int | None:
        return self._state()[0]

    def _write_pointer(self, data_v: int, dv_v: int | None) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{data_v}:{_NO_DV if dv_v is None else dv_v}")
        os.replace(tmp, self._pointer)  # atomic commit on POSIX

    # --- paths -----------------------------------------------------------

    @property
    def _dv_root(self) -> str:
        return os.path.join(self.path, "_dv")

    def _data_path(self, version: int) -> str:
        return os.path.join(self.path, f"d={version}")

    def _dv_path(self, version: int) -> str:
        return os.path.join(self._dv_root, f"v{version:06d}")

    # --- claim markers: atomic mkdir = local-FS conditional PUT ----------
    # (the marker is SEPARATE from the version dir: Spark's overwrite
    # deletes+recreates its own target dir, see sources/target.py)

    def _dv_claim(self, v: int) -> str:
        return os.path.join(self._dv_root, f"_claim_v{v:06d}")

    def _data_claim(self, v: int) -> str:
        return os.path.join(self.path, f"_claim_d={v}")

    @staticmethod
    def _claim_next(claim_of, exists_of, start: int) -> int:
        v = start
        while True:
            if exists_of(v):
                v += 1
                continue
            try:
                os.mkdir(claim_of(v))
                return v
            except FileExistsError:
                v += 1

    def _release(self, marker: str) -> None:
        try:
            os.rmdir(marker)
        except OSError:
            pass

    def _abort_staged_dv(self, v: int) -> None:
        shutil.rmtree(self._dv_path(v), ignore_errors=True)
        self._release(self._dv_claim(v))

    def _abort_staged_data(self, v: int) -> None:
        shutil.rmtree(self._data_path(v), ignore_errors=True)
        self._release(self._data_claim(v))

    # --- CAS flip: check+write under a short exclusive lock --------------

    def _cas_flip(
        self,
        expected: tuple[int | None, int | None],
        new: tuple[int, int | None],
        abort,
        what: str,
    ) -> None:
        """Commit point: flip the pointer to ``new`` iff it still reads
        ``expected``. On mismatch run ``abort`` (removes the staged
        version) and raise ConcurrentWriteError — exactly one of two
        racing commits wins and the loser leaves no trace. On an object
        store this is a conditional PUT on the pointer object."""
        from tipoca_stream_spark.sources.target import ConcurrentWriteError

        lock = self._pointer + ".lock"
        fd = None
        deadline = time.monotonic() + 30.0
        while fd is None:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                if time.monotonic() > deadline:
                    abort()
                    raise TimeoutError(
                        f"deletion-table commit lock {lock} held >30s"
                    )
                time.sleep(0.02)
        try:
            # re-read both halves THROUGH the overridable accessors so the
            # race tests can interpose; a foreign commit to either half
            # (another delete, or a fold) fails this CAS
            now = (self._current_data_version(), self._current_version())
            if now != expected:
                abort()
                raise ConcurrentWriteError(
                    f"deletion table at {self.path}: pointer moved from "
                    f"{expected!r} to {now!r} while this {what} staged; "
                    "staged version removed — retry against the current state"
                )
            self._write_pointer(*new)
        finally:
            os.close(fd)
            os.unlink(lock)

    # --- lifecycle -------------------------------------------------------

    def write(self, df: DataFrame, n_files: int = 8) -> None:
        """Create/replace the table: stage a fresh data version, flip the
        pointer to (it, no-vector). Replaces any prior state; the previous
        data version is kept for in-flight scans, older ones swept."""
        os.makedirs(self.path, exist_ok=True)
        prev_data, _ = self._state()
        v = self._claim_next(
            self._data_claim,
            lambda n: os.path.isdir(self._data_path(n)),
            (prev_data or 0) + 1,
        )
        df.repartition(n_files).write.mode("overwrite").parquet(self._data_path(v))
        self._write_pointer(v, None)  # creation: unconditional flip
        self._release(self._data_claim(v))
        self._sweep(keep_data={v, prev_data}, keep_dv=set())

    def _dv(self) -> DataFrame | None:
        v = self._current_version()
        if v is None:
            return None
        return self.spark.read.parquet(self._dv_path(v))

    def _with_pos(self, data_v: int | None = None) -> DataFrame:
        v = data_v if data_v is not None else self._current_data_version()
        if v is None:
            raise FileNotFoundError(f"deletion table at {self.path} not written")
        return self.spark.read.parquet(self._data_path(v)).select(
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
        and converges. A racing fold (compact) also moves the pointer and
        fails the CAS — a vector keyed on pre-fold row positions must
        never apply to post-fold files."""
        from tipoca_stream_spark.sources.target import ConcurrentWriteError

        data_base = self._current_data_version()
        base = self._current_version()
        hits = self._with_pos(data_base).filter(pred).select("file", "row_idx")
        prior = self._dv()
        new = hits if prior is None else prior.union(hits).distinct()
        os.makedirs(self._dv_root, exist_ok=True)
        v = self._claim_next(
            self._dv_claim,
            lambda n: os.path.isdir(self._dv_path(n)),
            (base or 0) + 1,
        )
        new.coalesce(1).write.mode("overwrite").parquet(self._dv_path(v))
        total = self.spark.read.parquet(self._dv_path(v)).count()
        n_new = total - (prior.count() if prior is not None else 0)

        self._cas_flip(
            (data_base, base),
            (data_base, v),
            lambda: self._abort_staged_dv(v),
            "delete",
        )
        # vector versions are cumulative — superseded ones serve no reader
        # after the flip; keep one for in-flight scans, drop older UNCLAIMED
        # ones so a long delete soak's metadata stays O(1) files. A live
        # claim marker = a concurrent deleter mid-stage (ADVICE r6): its
        # directory is NOT ours to sweep — either its CAS loses and it
        # cleans itself up, or it wins and becomes current.
        self._sweep(keep_data={data_base}, keep_dv={v, v - 1})
        if (
            self.auto_compact_threshold is not None
            and total >= self.auto_compact_threshold
        ):
            try:
                self.compact(self.n_files)
                self.compactions += 1
            except ConcurrentWriteError:
                pass  # maintenance: a racer moved the pointer; fold later
        return n_new

    def read(self) -> DataFrame:
        # resolve BOTH halves from one pointer read: the data version and
        # the vector that applies to it can never be observed out of sync
        data_v, dv_v = self._state()
        base = self._with_pos(data_v)
        if dv_v is None:
            return base.drop("file", "row_idx")
        dv = self.spark.read.parquet(self._dv_path(dv_v))
        # deletes-sized right side: plans as a broadcast anti-join
        return base.join(
            F.broadcast(dv), on=["file", "row_idx"], how="left_anti"
        ).drop("file", "row_idx")

    def deleted_count(self) -> int:
        dv = self._dv()
        return 0 if dv is None else dv.count()

    def compact(self, n_files: int = 8) -> None:
        """Fold the vector into the data: write surviving rows as a NEW
        staged data version, then one CAS pointer flip to (new data, no
        vector). No file under the old version is touched — a reader that
        resolved the pointer pre-flip finishes its scan against intact
        files and a vector that matches them; a crash before the flip
        leaves the old state current (the orphaned staged dir is
        janitor-collectable via ``vacuum``). CAS is against BOTH halves
        as read at fold start: a delete that lands mid-fold wins and the
        fold loses cleanly — folding it away would resurrect its rows."""
        data_base, dv_base = self._state()
        if data_base is None:
            return
        v = self._claim_next(
            self._data_claim,
            lambda n: os.path.isdir(self._data_path(n)),
            data_base + 1,
        )
        self.read().repartition(n_files).write.mode("overwrite").parquet(
            self._data_path(v)
        )
        self._cas_flip(
            (data_base, dv_base),
            (v, None),
            lambda: self._abort_staged_data(v),
            "compaction",
        )
        # keep the immediately-superseded data+vector for in-flight scans
        self._sweep(
            keep_data={v, data_base},
            keep_dv={dv_base} if dv_base is not None else set(),
        )

    # --- hygiene ---------------------------------------------------------

    def _sweep(self, keep_data: set, keep_dv: set) -> None:
        """Remove superseded, UNCLAIMED version dirs. Anything with a live
        claim marker belongs to a concurrent writer mid-stage and is never
        touched (it self-cleans on CAS loss); anything in ``keep_*``
        serves in-flight readers."""
        for d in os.listdir(self.path) if os.path.isdir(self.path) else []:
            if not d.startswith("d="):
                continue
            n = int(d.split("=", 1)[1])
            if n in keep_data or os.path.isdir(self._data_claim(n)):
                continue
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        if os.path.isdir(self._dv_root):
            for d in os.listdir(self._dv_root):
                if not (d.startswith("v") and d[1:].isdigit()):
                    continue
                n = int(d[1:])
                if n in keep_dv or os.path.isdir(self._dv_claim(n)):
                    continue
                shutil.rmtree(os.path.join(self._dv_root, d), ignore_errors=True)

    def vacuum(self, claim_ttl_seconds: float = 900.0) -> list[str]:
        """Janitor for crash orphans: a writer that died after claiming +
        staging but before its flip leaves a version dir and claim marker
        forever. Remove staged dirs not named by the pointer whose claim
        is STALE (older than ``claim_ttl_seconds`` — a live writer's claim
        is always younger than its in-progress Spark write). Returns the
        removed relative paths."""
        removed: list[str] = []
        now = time.time()

        def stale(marker: str) -> bool:
            try:
                return (now - os.path.getmtime(marker)) > claim_ttl_seconds
            except OSError:
                return True  # no marker at all → nothing live owns the dir

        data_v, dv_v = self._state()
        for d in sorted(os.listdir(self.path)) if os.path.isdir(self.path) else []:
            if d.startswith("d="):
                n = int(d.split("=", 1)[1])
                if n != data_v and stale(self._data_claim(n)):
                    shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
                    self._release(self._data_claim(n))
                    removed.append(d)
        if os.path.isdir(self._dv_root):
            for d in sorted(os.listdir(self._dv_root)):
                if d.startswith("v") and d[1:].isdigit():
                    n = int(d[1:])
                    if n != dv_v and stale(self._dv_claim(n)):
                        shutil.rmtree(os.path.join(self._dv_root, d), ignore_errors=True)
                        self._release(self._dv_claim(n))
                        removed.append(os.path.join("_dv", d))
        return removed
