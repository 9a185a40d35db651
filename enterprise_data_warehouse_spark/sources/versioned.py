"""Crash-safe table commits: a commit-manifest protocol for parquet sinks.

``merge_upsert`` (sink.py:48) swaps a staged directory into place with
delete-then-rename — atomic per-directory on HDFS, but on object stores a
crash between the delete and the rename leaves NO readable table. This
module closes that window the way Delta Lake's ``_delta_log`` does
(reference's production materialization target is Snowflake/Delta; see
SURVEY.md §7.4a): data is written to an immutable versioned directory, and
the table "pointer" only moves when a tiny commit-marker file is created —
single-file creation is atomic on HDFS (NameNode op) and on S3/GCS (PUT is
all-or-nothing). There is no moment at which a reader can observe a
half-table:

    root/
      v00000001/ ... parquet files ...          (immutable once committed)
      v00000002/ ...
      _commits/v00000001.json                   (existence == committed)
      _commits/v00000002.json

* Readers resolve ``current = max(version with a marker AND a data dir)``
  and read that directory only.
* Writers stage ``v{n+1}`` fully, then create the marker. A crash at ANY
  point before the marker leaves an orphan data dir the readers never see
  — the previous version stays live. ``vacuum`` reclaims orphans and old
  versions.
* Concurrency: single-writer (same stance as Delta on S3 without a lock
  service). The marker create uses ``overwrite=False`` so two racing
  writers of the same version cannot both succeed.
"""

from __future__ import annotations

import json
import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"^v(\d{8})$")
_MARKER_RE = re.compile(r"^v(\d{8})\.json$")


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath.getFileSystem(conf)


class VersionedTable:
    """A parquet table whose visible state moves only via atomic
    commit-marker creation (see module docstring)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self._jvm, self._hfs = _fs(spark, self.root)

    # -- path helpers ------------------------------------------------------
    def _path(self, rel: str):
        return self._jvm.org.apache.hadoop.fs.Path(f"{self.root}/{rel}")

    def _data_dir(self, version: int) -> str:
        return f"{self.root}/v{version:08d}"

    def _marker(self, version: int):
        return self._path(f"_commits/v{version:08d}.json")

    # -- read side ---------------------------------------------------------
    def committed_versions(self) -> list[int]:
        """Versions with BOTH a marker and a data dir, ascending. The data-dir
        check makes vacuum's marker-then-data delete order crash-safe too."""
        commits = self._path("_commits")
        if not self._hfs.exists(commits):
            return []
        out = []
        for st in self._hfs.listStatus(commits):
            m = _MARKER_RE.match(st.getPath().getName())
            if m and self._hfs.exists(self._path(f"v{m.group(1)}")):
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int | None:
        versions = self.committed_versions()
        return versions[-1] if versions else None

    def exists(self) -> bool:
        return self.current_version() is not None

    def read(self) -> DataFrame:
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        return self.spark.read.parquet(self._data_dir(v))

    # -- write side --------------------------------------------------------
    def _write_data(self, df: DataFrame, version: int,
                    partition_by: Sequence[str] | None = None) -> None:
        """Stage the data dir WITHOUT committing (split out so the kill-test
        can simulate a crash between data write and marker create)."""
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._data_dir(version))

    def _create_marker(self, version: int, meta: dict) -> None:
        marker = self._marker(version)
        self._hfs.mkdirs(marker.getParent())
        # overwrite=False: racing writers of the same version — one wins.
        out = self._hfs.create(marker, False)
        try:
            out.write(bytearray(json.dumps(meta, sort_keys=True), "utf-8"))
        finally:
            out.close()

    def commit(self, df: DataFrame, partition_by: Sequence[str] | None = None,
               op: str = "overwrite") -> int:
        version = (self.current_version() or 0) + 1
        self._write_data(df, version, partition_by)
        self._create_marker(version, {"version": version, "op": op})
        return version

    def merge(self, src: DataFrame, keys: Sequence[str]) -> int:
        """MERGE with no unreadable window: anti-join survivors ∪ src into
        v{n+1}, marker last. Source rows win on key collision (same
        semantics as sink.merge_upsert). On Delta this is one MERGE INTO."""
        if not self.exists():
            return self.commit(src, op="merge")
        target = self.read()
        survivors = target.join(src.select(*keys).distinct(), list(keys), "left_anti")
        return self.commit(src.unionByName(survivors), op="merge")

    def incremental(self, source: DataFrame, watermark_col: str,
                    keys: Sequence[str],
                    default_watermark: str = "1900-01-01 00:00:00") -> int:
        """dbt incremental-merge materialization on the versioned layout:
        watermark from the CURRENT version, delta-filter, merge. Idempotent
        under replays; a crash mid-build replays from the same watermark
        because the watermark source never moved."""
        from pyspark.sql import functions as F

        if self.exists():
            row = self.read().agg(F.max(watermark_col).alias("wm")).collect()[0]
            wm = str(row["wm"]) if row["wm"] is not None else default_watermark
        else:
            wm = default_watermark
        delta = source.where(F.col(watermark_col) > F.lit(wm).cast("timestamp"))
        return self.merge(delta, keys)

    # -- maintenance -------------------------------------------------------
    def vacuum(self, keep: int = 2) -> dict[str, list[int]]:
        """Reclaim (a) orphan data dirs — staged versions whose writer died
        before the marker — and (b) committed versions older than the last
        ``keep``. Markers are deleted BEFORE their data dir so a crash
        mid-vacuum never yields a marker pointing at missing data (readers
        also double-check the data dir exists)."""
        committed = self.committed_versions()
        live = set(committed[-keep:]) if committed else set()
        removed_versions: list[int] = []
        removed_orphans: list[int] = []
        for v in committed:
            if v not in live:
                self._hfs.delete(self._marker(v), False)
                self._hfs.delete(self._path(f"v{v:08d}"), True)
                removed_versions.append(v)
        if self._hfs.exists(self._path("")):
            for st in self._hfs.listStatus(self._path("")):
                m = _VERSION_RE.match(st.getPath().getName())
                if m and int(m.group(1)) not in live and int(m.group(1)) not in removed_versions:
                    self._hfs.delete(st.getPath(), True)
                    removed_orphans.append(int(m.group(1)))
        return {"versions": removed_versions, "orphans": sorted(removed_orphans)}
