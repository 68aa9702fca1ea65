"""Engine-owned target tables on parquet with atomic version swap.

The reference's target is a Redshift table mutated in a transaction
(load_processor.go:386-444); on an immutable-file store the equivalent is
versioned rewrite + atomic pointer flip. Layout::

    <root>/<name>/v=<n>/part-*.parquet      # immutable table versions
    <root>/<name>/_CURRENT                  # text file: current version n

Readers resolve ``_CURRENT`` then scan exactly one version directory —
the same two-phase pattern Delta/Iceberg use (manifest → files), reduced
to its core. Writes never touch a live version, so a crashed merge leaves
the previous version intact (T4: effectively exactly-once when combined
with the epoch guard in streaming.pipeline).

Also implements:
- D7 release swap (``swap_from``): controllers/release.go:69-146's
  drop-cascade + rename cutover;
- schema evolution on merge: new columns appear via unionByName with
  allowMissingColumns (D5 ADD COLUMN); type changes rewrite (D6) — which a
  versioned write does anyway.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetTargetTable:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        name: str,
        zone_cols: list[str] | None = None,
        zone_files: int = 32,
    ):
        self.spark = spark
        self.name = name
        self.path = os.path.join(root, name)
        # SORTKEY analogue on the versioned target (the reference declares
        # SORTKEY on every Redshift table so zone maps skip blocks): when
        # zone_cols is set, full rewrites range-cluster on zone_cols[0] and
        # every commit maintains per-file min/max stats for all zone_cols
        # under v=<n>/_zones/, so read_range schedules only overlapping
        # files. Stats commit ATOMICALLY with the data (same version dir,
        # same pointer flip).
        self.zone_cols = zone_cols or []
        self.zone_files = zone_files
        os.makedirs(self.path, exist_ok=True)

    @property
    def _current_file(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._current_file) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def exists(self) -> bool:
        return self.current_version() is not None

    def read(self, version: int | None = None) -> DataFrame:
        """Current version, or any still-retained version (time travel —
        versions are immutable, so a historical read is just a different
        directory; ``vacuum`` bounds how far back travel reaches)."""
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        vdir = os.path.join(self.path, f"v={v}")
        if not os.path.isdir(vdir):
            raise FileNotFoundError(f"table {self.name} version {v} not retained")
        return self.spark.read.parquet(vdir)

    def versions(self) -> list[int]:
        """Retained version numbers, oldest first."""
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("v=") and d.split("=", 1)[1].isdigit()
        )

    def read_metadata(self) -> dict:
        """Commit metadata of the current version (``{}`` when absent)."""
        v = self.current_version()
        if v is None:
            return {}
        try:
            with open(os.path.join(self.path, f"v={v}", "_meta.json")) as f:
                import json

                return json.load(f)
        except (FileNotFoundError, ValueError):
            return {}

    def write(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        metadata: dict | None = None,
    ) -> int:
        """Write a new version and flip the pointer. The parquet write is to
        a not-yet-referenced directory; the pointer flip (a single tiny file
        rename) is the commit point.

        ``metadata`` commits ATOMICALLY with the data: it is written to
        ``v=<n>/_meta.json`` before the pointer flip, so a reader either
        sees the old version with the old metadata or the new version with
        the new metadata — never a mix. The streaming epoch guard rides on
        this (T4): the merged-epoch set lives in the same commit as the
        merge result. ``None`` carries the current version's metadata
        forward (so compaction/maintenance rewrites don't drop it).

        ``partition_by`` lays the version out as hive-partitioned
        directories — at 100 TB this is what lets the merge's anti-join and
        downstream readers prune whole files by PK-range/date instead of
        filtering rows (SCALE.md: partition pruning on the CDC target)."""
        import json

        if metadata is None:
            metadata = self.read_metadata()
        v = (self.current_version() or 0) + 1
        target_dir = os.path.join(self.path, f"v={v}")
        if self.zone_cols and not partition_by:
            # range-cluster the rewrite on the primary zone column so each
            # file owns a tight value range (the SORTKEY's physical
            # meaning); partitioned layouts keep their directory layout and
            # rely on stats within each partition
            df = df.repartitionByRange(self.zone_files, F.col(self.zone_cols[0]))
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target_dir)
        self._ensure_readable(target_dir, df)
        if self.zone_cols:
            self._write_zone_stats(target_dir, self._version_files(target_dir), None)
        if metadata:
            with open(os.path.join(target_dir, "_meta.json"), "w") as f:
                json.dump(metadata, f)
        tmp = self._current_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._current_file)  # atomic on POSIX
        return v

    def write_partition_delta(
        self,
        changed: DataFrame,
        partition_col: str,
        changed_values: list,
        metadata: dict | None = None,
    ) -> int:
        """Commit a new version writing ONLY the changed partitions;
        every other partition directory is carried over from the current
        version via hard links (same-filesystem, O(files) not O(bytes)) —
        the Delta/Iceberg file-reuse trick reduced to its core. This is
        what makes an incremental merge's WRITE cost O(batch partitions)
        instead of O(table): a 1 GiB batch against a 100 TB table links
        ~all partitions and rewrites only the handful it touched.

        ``changed`` must contain exactly the rows of the partitions in
        ``changed_values`` (hive value strings as Spark renders them).
        Vacuum safety: removing an old version only unlinks names — data
        files survive through the links held by newer versions."""
        import json

        if metadata is None:
            metadata = self.read_metadata()
        prev = self.current_version()
        v = (prev or 0) + 1
        target_dir = os.path.join(self.path, f"v={v}")
        changed.write.mode("overwrite").partitionBy(partition_col).parquet(target_dir)
        self._ensure_readable(target_dir, changed)
        new_files = self._version_files(target_dir) if self.zone_cols else []
        changed_names = {f"{partition_col}={val}" for val in changed_values}
        if prev is not None:
            prev_dir = os.path.join(self.path, f"v={prev}")
            for entry in os.listdir(prev_dir):
                src = os.path.join(prev_dir, entry)
                if (
                    not entry.startswith(f"{partition_col}=")
                    or entry in changed_names
                    or not os.path.isdir(src)
                ):
                    continue
                dst = os.path.join(target_dir, entry)
                os.makedirs(dst, exist_ok=True)
                for fn in os.listdir(src):
                    if fn.endswith(".parquet"):
                        os.link(os.path.join(src, fn), os.path.join(dst, fn))
        if self.zone_cols:
            # stats rows: fresh for the rewritten partitions (O(batch)),
            # carried for every hard-linked file (bytes unchanged). If the
            # previous version has no stats (target predates zone_cols),
            # stat EVERY file once — partial stats would make read_range
            # silently skip the linked files.
            carried = self._carried_zone_stats(
                prev,
                lambda s: F.substring_index(F.col("file"), "/", 1).isin(
                    list(changed_names)
                ),
            )
            if carried is None and prev is not None:
                new_files = self._version_files(target_dir)
            self._write_zone_stats(target_dir, new_files, carried)
        if metadata:
            with open(os.path.join(target_dir, "_meta.json"), "w") as f:
                json.dump(metadata, f)
        tmp = self._current_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._current_file)  # atomic on POSIX
        return v

    # --- zone-map stats (per-version, commit-atomic file skipping) --------

    def _zones_dir(self, vdir: str) -> str:
        # underscore prefix: invisible to Spark's data-file index, same
        # convention as _meta.json / Delta's _delta_log
        return os.path.join(vdir, "_zones")

    @staticmethod
    def _version_files(vdir: str) -> list[str]:
        """All data files of a version (recursive — partitioned layouts
        nest), excluding the _zones sidecar."""
        out = []
        for base, dirs, files in os.walk(vdir):
            # prune hidden/sidecar dirs (_zones) but KEEP hive partition
            # dirs — a partition column named _bucket makes dirs like
            # "_bucket=3" that start with an underscore yet hold data
            dirs[:] = [
                d for d in dirs if "=" in d or not d.startswith(("_", "."))
            ]
            out += [
                os.path.join(base, f)
                for f in files
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
        return out

    def _zone_stats_of(self, files: list[str]) -> DataFrame:
        """One column-pruned pass over ``files`` → one stats row per file
        (relative path + min/max per zone column). Never lands on the
        driver; the caller writes it straight back out."""
        aggs = []
        for c in self.zone_cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        rel = F.regexp_replace(F.input_file_name(), r"^.*/v=\d+/", "")
        return (
            self.spark.read.parquet(*files)
            .select(rel.alias("file"), *self.zone_cols)
            .groupBy("file")
            .agg(*aggs)
        )

    def _write_zone_stats(self, vdir: str, new_files: list[str], carried: DataFrame | None) -> None:
        """Persist the version's stats table: fresh rows for ``new_files``
        (O(batch) on a delta commit) unioned with ``carried`` rows for
        hard-linked files (their bytes — and so their stats — are
        unchanged). Writes nothing when there is nothing to describe."""
        stats = self._zone_stats_of(new_files) if new_files else None
        if carried is not None:
            stats = carried if stats is None else stats.unionByName(carried)
        if stats is None:
            return
        stats.coalesce(1).write.mode("overwrite").parquet(self._zones_dir(vdir))

    def _carried_zone_stats(self, prev: int | None, drop_pred) -> DataFrame | None:
        """Previous version's stats minus the rows ``drop_pred`` marks as
        rewritten (their files were not linked into the new version)."""
        if prev is None:
            return None
        zdir = self._zones_dir(os.path.join(self.path, f"v={prev}"))
        if not os.path.isdir(zdir):
            return None
        stats = self.spark.read.parquet(zdir)
        return stats.filter(~drop_pred(stats))

    def read_range(self, lo, hi, col: str | None = None, version: int | None = None) -> DataFrame:
        """Rows with ``col`` (default: zone_cols[0]) in [lo, hi], scanning
        only the current (or given) version's files whose zone overlaps —
        the stats filter runs distributed and only surviving file PATHS
        reach the driver. Falls back to a plain filtered scan when stats
        are absent or the column untracked; correctness never depends on
        the stats, only scheduling."""
        col = col or (self.zone_cols[0] if self.zone_cols else None)
        if col is None:
            raise ValueError("read_range needs a column (no zone_cols declared)")
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        vdir = os.path.join(self.path, f"v={v}")
        pred = F.col(col).between(F.lit(lo), F.lit(hi))
        zdir = self._zones_dir(vdir)
        if not os.path.isdir(zdir):
            return self.read(v).filter(pred)
        stats = self.spark.read.parquet(zdir)
        if f"min_{col}" not in stats.columns:
            return self.read(v).filter(pred)
        # defensive coverage check: a file the stats table doesn't know
        # about would be silently skipped — if counts disagree (partial
        # sidecar, manual surgery), pruning is forfeited, never correctness
        if stats.count() != len(self._version_files(vdir)):
            return self.read(v).filter(pred)
        disjoint = (F.col(f"max_{col}") < F.lit(lo)) | (F.col(f"min_{col}") > F.lit(hi))
        keep = F.coalesce(~disjoint, F.lit(True))  # all-null stats: keep
        files = [
            os.path.join(vdir, r["file"])
            for r in stats.filter(keep).select("file").collect()
        ]
        files = [f for f in files if os.path.exists(f)]
        if not files:
            return self.read(v).limit(0).filter(pred)
        return (
            self.spark.read.option("basePath", vdir).parquet(*files).filter(pred)
        )

    def _ensure_readable(self, target_dir: str, df: DataFrame) -> None:
        """A PARTITIONED write of zero rows emits no parquet files at all
        (partition dirs come from row values), leaving an unreadable
        version — e.g. a delete-only epoch that empties the table. Detect
        the no-files case and write one schema-carrying empty file so
        readers and later merges see an empty table, not an error."""
        for _, _, files in os.walk(target_dir):
            if any(f.endswith(".parquet") for f in files):
                return
        df.limit(0).write.mode("overwrite").parquet(target_dir)

    def changes(
        self, from_version: int, to_version: int, keys: list[str] | None = None
    ) -> DataFrame:
        """Change-data-feed between two retained versions: every row tagged
        ``_change_type`` ∈ {insert, delete, update_preimage,
        update_postimage} (the Delta CDF vocabulary). This is what lets a
        downstream consumer — a cache, an index, a reverse-ETL sink — apply
        O(changed rows) instead of re-reading the table, the same consumer
        contract the reference's sink group serves with per-batch manifests.

        When both versions were committed by the partition-delta path
        (``_bucket``-partitioned), unchanged buckets are pruned BEFORE any
        Spark work by comparing file inodes: a bucket carried over by
        ``write_partition_delta`` hard-links the same files, so identical
        inode sets prove identical bytes and only differing buckets are
        scanned. At 100 TB that makes CDF cost O(touched buckets), not
        O(table) — without the layout it degrades gracefully to a full
        keyed diff.

        With ``keys`` a full-outer join classifies inserts/deletes/updates
        (non-key columns compared null-safely); without, a positional
        multiset diff (``exceptAll`` both ways) yields inserts+deletes
        only."""
        old_dir = os.path.join(self.path, f"v={from_version}")
        new_dir = os.path.join(self.path, f"v={to_version}")
        for d, v in ((old_dir, from_version), (new_dir, to_version)):
            if not os.path.isdir(d):
                raise FileNotFoundError(f"table {self.name} version {v} not retained")

        def bucket_inodes(vdir: str) -> dict[str, frozenset[int]] | None:
            out: dict[str, frozenset[int]] = {}
            for entry in os.listdir(vdir):
                src = os.path.join(vdir, entry)
                if entry.startswith("_bucket=") and os.path.isdir(src):
                    out[entry] = frozenset(
                        os.stat(os.path.join(src, fn)).st_ino
                        for fn in os.listdir(src)
                        if fn.endswith(".parquet")
                    )
            return out or None

        def read_side(vdir: str, buckets: list[str] | None) -> DataFrame:
            if buckets is None:
                return self.spark.read.parquet(vdir)
            # a bucket first written in the OTHER version has no directory
            # on this side — it contributes no rows here, not an error
            dirs = [os.path.join(vdir, b) for b in buckets]
            dirs = [d for d in dirs if os.path.isdir(d)]
            if not dirs:
                return self.spark.read.parquet(vdir).limit(0)
            return self.spark.read.option("basePath", vdir).parquet(*dirs)

        ob, nb = bucket_inodes(old_dir), bucket_inodes(new_dir)
        changed: list[str] | None = None
        if ob is not None and nb is not None:
            changed = sorted(k for k in ob.keys() | nb.keys() if ob.get(k) != nb.get(k))
        old = read_side(old_dir, changed)
        new = read_side(new_dir, changed)
        if ob is not None:
            old = old.drop("_bucket")
        if nb is not None:
            new = new.drop("_bucket")
        # D5 schema evolution across the window: columns added since
        # from_version read as NULL on the old side
        for c in [c for c in new.columns if c not in old.columns]:
            old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))

        if keys is None:
            cols = new.columns
            ins = new.exceptAll(old.select(*cols)).withColumn("_change_type", F.lit("insert"))
            dels = old.select(*cols).exceptAll(new).withColumn(
                "_change_type", F.lit("delete")
            )
            return ins.union(dels)

        cols = new.columns
        non_keys = [c for c in cols if c not in keys]
        o = old.select(*cols).alias("o")
        n = new.alias("n")
        cond = [o[k].eqNullSafe(n[k]) for k in keys]
        j = o.join(n, cond, "full_outer")
        o_key0, n_key0 = o[keys[0]], n[keys[0]]
        same = F.struct(*[o[c] for c in non_keys]).eqNullSafe(
            F.struct(*[n[c] for c in non_keys])
        )
        ins = j.filter(o_key0.isNull() & n_key0.isNotNull()).select(
            *[n[c] for c in cols], F.lit("insert").alias("_change_type")
        )
        dels = j.filter(n_key0.isNull() & o_key0.isNotNull()).select(
            *[o[c] for c in cols], F.lit("delete").alias("_change_type")
        )
        upd = j.filter(o_key0.isNotNull() & n_key0.isNotNull() & ~same)
        pre = upd.select(*[o[c] for c in cols], F.lit("update_preimage").alias("_change_type"))
        post = upd.select(
            *[n[c] for c in cols], F.lit("update_postimage").alias("_change_type")
        )
        return ins.union(dels).union(pre).union(post)

    def compact(self, target_files: int = 1, partition_by: list[str] | None = None) -> int:
        """Small-file compaction: rewrite the current version into
        ``target_files`` files (one per partition directory if partitioned)
        and commit it as a new version. Streaming merges produce one file
        set per epoch; without periodic compaction a long-lived target's
        scan cost is dominated by file-open overhead.

        Unpartitioned: ``coalesce`` — a pure narrow rewrite, no shuffle.
        Partitioned: hash-``repartition`` on the partition columns so each
        task owns whole partition values and writes one file per value —
        ``coalesce(1)`` here would funnel the entire table through a
        single task, which is exactly the 100 TB mistake."""
        df = self.read()
        if partition_by:
            df = df.repartition(*[F.col(c) for c in partition_by])
        else:
            df = df.coalesce(target_files)
        return self.write(df, partition_by=partition_by)

    def swap_from(self, other: "ParquetTargetTable") -> None:
        """D7 release: make this table's current version point at the
        reload table's data (release.go:69-146 drop+rename, minus grants)."""
        df = other.read()
        self.write(df)

    def vacuum(self, keep: int = 2) -> list[int]:
        """Drop all but the newest ``keep`` versions (compaction hygiene —
        the reference's staging-table drop, load_processor.go:783-801)."""
        import shutil

        current = self.current_version()
        if current is None:
            return []
        versions = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("v=") and d.split("=", 1)[1].isdigit()
        )
        victims = [v for v in versions if v <= current][:-keep]
        for v in victims:
            shutil.rmtree(os.path.join(self.path, f"v={v}"), ignore_errors=True)
        return victims


# Spark bucketed-write file naming: part-<task>-<uuid>_<bucketid>.c000...
_BUCKET_FILE_RE = re.compile(r"_(\d{5})\.")


class BucketedTargetTable(ParquetTargetTable):
    """Versioned CDC target whose versions are CATALOG-REGISTERED bucketed
    tables — the DISTKEY half of the reference's DDL made planner-visible.

    Two properties the plain target can't give:

    - **planner-visible clustering**: ``read()`` goes through the catalog,
      so every downstream join/aggregate on the primary key plans with ZERO
      Exchange on the target side (bucketed scan = HashPartitioning on the
      PK) — at 100 TB the target is the one frame that must never shuffle;
    - **O(batch) steady-state commits**: Spark encodes the bucket id in
      each file name (``part-*-uuid_00042.c000``), so a merge that touches
      k buckets writes k bucket files and HARD-LINKS every other bucket's
      files from the previous version (``write_bucket_delta``) — the same
      file-reuse trick as ``write_partition_delta``, but the resulting
      layout still satisfies the catalog bucket spec, because linked files
      keep their bucket-id names.

    The bucket function is Spark's own (``pmod(hash(keys), n)``), so
    ``bucket_of`` computed on a batch agrees exactly with where the writer
    puts rows. Catalog entries are per-version (``<name>_v<n>``) and are
    re-created on demand from the files' schema (``_ensure_registered``) —
    a fresh session reading an existing target gets the bucketed plan
    back, not a plain parquet scan."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        name: str,
        buckets: int,
        keys: list[str],
        sort_keys: list[str] | None = None,
        zone_cols: list[str] | None = None,
        zone_split: int = 4,
    ):
        # zone_cols on a BUCKETED target: the write range-partitions on
        # (bucket_id, zone_col) into ~zone_split tasks per bucket — a range
        # task's rows for any one bucket are a CONTIGUOUS zone run, so each
        # output file (one per bucket per task) carries a tight zone even
        # though buckets hash on the PK. This is exactly Redshift's
        # DISTKEY + SORTKEY pair: hash placement, range-tight blocks.
        super().__init__(spark, root, name, zone_cols=zone_cols)
        self.buckets = buckets
        self.keys = keys
        self.sort_keys = sort_keys or keys
        self.zone_split = zone_split

    def bucket_of(self) -> F.Column:
        """The bucket id expression — identical to the writer's assignment
        (murmur3 ``hash`` + ``pmod``), so callers can compute which buckets
        a batch touches without writing anything."""
        return F.pmod(F.hash(*[F.col(k) for k in self.keys]), F.lit(self.buckets))

    def _table_ident(self, v: int) -> str:
        # the identifier carries a short hash of the table PATH: two targets
        # with the same name under different roots in one session must not
        # collide in the catalog (a stale registration would silently point
        # reads at the other root's LOCATION)
        safe = re.sub(r"[^A-Za-z0-9_]", "_", self.name)
        tag = hashlib.sha1(os.path.abspath(self.path).encode()).hexdigest()[:8]
        return f"{safe}_{tag}_v{v}"

    def _vdir(self, v: int) -> str:
        return os.path.join(self.path, f"v={v}")

    def _register(self, v: int) -> None:
        vdir = self._vdir(v)
        ident = self._table_ident(v)
        schema = self._version_schema(vdir)
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        keys = ", ".join(f"`{k}`" for k in self.keys)
        sort = ", ".join(f"`{k}`" for k in self.sort_keys)
        self.spark.sql(
            f"CREATE TABLE {ident} ({cols}) USING parquet "
            f"CLUSTERED BY ({keys}) SORTED BY ({sort}) INTO {self.buckets} BUCKETS "
            f"LOCATION '{vdir}'"
        )

    def _version_schema(self, vdir: str):
        """Schema of a version dir — from the persisted ``_schema.json``
        when present, else inferred from the parquet files. The sidecar is
        what keeps a version READABLE when it holds zero parquet files
        (delete-only epoch that empties the table: empty write tasks emit
        no files, and a bucketed LOCATION cannot take the base class's
        plain empty-file fallback — Spark rejects data files whose names
        carry no bucket id)."""
        from pyspark.sql import types as T

        sfile = os.path.join(vdir, "_schema.json")
        if os.path.exists(sfile):
            with open(sfile) as f:
                return T.StructType.fromJson(json.load(f))
        return self.spark.read.parquet(vdir).schema

    def _ensure_registered(self, v: int) -> None:
        if not self.spark.catalog.tableExists(self._table_ident(v)):
            self._register(v)

    def read(self, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        if not os.path.isdir(self._vdir(v)):
            raise FileNotFoundError(f"table {self.name} version {v} not retained")
        self._ensure_registered(v)
        return self.spark.table(self._table_ident(v))

    def _bucket_files(self, v: int) -> dict[int, list[str]]:
        out: dict[int, list[str]] = {}
        vdir = self._vdir(v)
        for fn in os.listdir(vdir):
            m = _BUCKET_FILE_RE.search(fn)
            if fn.endswith(".parquet") and m:
                out.setdefault(int(m.group(1)), []).append(os.path.join(vdir, fn))
        return out

    def read_buckets(self, bucket_ids: list[int]) -> DataFrame:
        """Only the files of the given buckets — the merge's O(batch) read
        (rows outside the batch's buckets cannot be touched by the merge).
        A plain file-list scan: bucket metadata isn't needed here because
        the merge join broadcasts the batch keys."""
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        by_bucket = self._bucket_files(v)
        files = [f for b in bucket_ids for f in by_bucket.get(b, [])]
        if not files:
            return self.read(v).limit(0)
        return self.spark.read.schema(self.read(v).schema).parquet(*files)

    def _write_bucketed(self, df: DataFrame, v: int, n_tasks: int | None = None) -> None:
        ident = self._table_ident(v)
        self.spark.sql(f"DROP TABLE IF EXISTS {ident}")
        if self.zone_cols:
            # (bucket, zone) range layout: zone-tight files per bucket (see
            # __init__). Task count scales with what's being written — the
            # whole table on a full rewrite, the touched buckets on a delta.
            base = n_tasks if n_tasks is not None else self.buckets
            clustered = df.repartitionByRange(
                max(base, 1) * self.zone_split,
                self.bucket_of(),
                F.col(self.zone_cols[0]),
            )
        elif n_tasks is None:
            # full rewrite: one task per bucket → one sorted file per bucket
            # (see sources/bucketed.py for the rationale)
            clustered = df.repartition(self.buckets, *[df[k] for k in self.keys])
        else:
            # delta write: the rows span only k touched buckets — scheduling
            # self.buckets tasks (250k at 100 TB) for a batch-sized delta
            # would be k real tasks and n-k empty ones. Repartition by the
            # BUCKET id into ~k partitions instead: all rows of one bucket
            # share the id, so each bucket lands whole in one task and the
            # write still emits one file per touched bucket.
            clustered = df.repartition(max(n_tasks, 1), self.bucket_of())
        (
            clustered.write.mode("overwrite")
            .format("parquet")
            .bucketBy(self.buckets, *self.keys)
            .sortBy(*self.sort_keys)
            .option("path", self._vdir(v))
            .saveAsTable(ident)
        )
        # schema sidecar: lets _register rebuild the catalog entry after
        # catalog loss even when this version has no parquet files (see
        # _version_schema)
        with open(os.path.join(self._vdir(v), "_schema.json"), "w") as f:
            f.write(df.schema.json())

    def _commit(self, v: int, metadata: dict | None) -> int:
        import json

        if metadata:
            with open(os.path.join(self._vdir(v), "_meta.json"), "w") as f:
                json.dump(metadata, f)
        tmp = self._current_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._current_file)  # atomic on POSIX
        return v

    def write(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,  # ignored: layout is the bucket spec
        metadata: dict | None = None,
    ) -> int:
        if metadata is None:
            metadata = self.read_metadata()
        v = (self.current_version() or 0) + 1
        self._write_bucketed(df, v)
        if self.zone_cols:
            vdir = self._vdir(v)
            self._write_zone_stats(vdir, self._version_files(vdir), None)
        return self._commit(v, metadata)

    def write_bucket_delta(
        self,
        changed: DataFrame,
        changed_buckets: list[int],
        metadata: dict | None = None,
    ) -> int:
        """Commit a new version writing ONLY the changed buckets' rows;
        every other bucket's files hard-link from the current version
        (O(files), not O(bytes)). ``changed`` must hold exactly the rows of
        ``changed_buckets``. Linked files keep their bucket-id names, so
        the new version still satisfies the bucket spec and re-registers as
        a bucketed catalog table."""
        if metadata is None:
            metadata = self.read_metadata()
        prev = self.current_version()
        v = (prev or 0) + 1
        self._write_bucketed(changed, v, n_tasks=len(changed_buckets))
        new_files = self._version_files(self._vdir(v)) if self.zone_cols else []
        changed_set = set(changed_buckets)
        if prev is not None:
            for b, files in self._bucket_files(prev).items():
                if b in changed_set:
                    continue
                for src in files:
                    os.link(src, os.path.join(self._vdir(v), os.path.basename(src)))
        if self.zone_cols:
            # stats rows only for the touched buckets' fresh files —
            # O(batch), like the data commit; linked buckets carry their
            # rows forward (the file name encodes the bucket id). No prior
            # stats to carry (target predates zone_cols) → stat every file
            # once, or read_range would skip the linked ones.
            carried = self._carried_zone_stats(
                prev,
                lambda s: F.regexp_extract(F.col("file"), r"_(\d{5})\.", 1)
                .cast("int")
                .isin(list(changed_set)),
            )
            if carried is None and prev is not None:
                new_files = self._version_files(self._vdir(v))
            self._write_zone_stats(self._vdir(v), new_files, carried)
        return self._commit(v, metadata)

    def compact(self, target_files: int = 1, partition_by: list[str] | None = None) -> int:
        """Bucketed rewrite IS compaction: one file per bucket."""
        return self.write(self.read())

    def vacuum(self, keep: int = 2) -> list[int]:
        victims = super().vacuum(keep)
        for v in victims:
            self.spark.sql(f"DROP TABLE IF EXISTS {self._table_ident(v)}")
        return victims
