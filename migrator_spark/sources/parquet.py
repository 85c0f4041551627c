"""Parquet-directory source/sink: ``<root>/<table>.parquet``.

Writes are atomic per table via symlink-pinned versioning: each
overwrite materializes a fresh version directory under
``<root>/.v/<table>/`` and atomically repoints the
``<table>.parquet`` symlink at it. Readers resolve the symlink once
(``table()``) and read the pinned version directory, which is retained
for KEEP_VERSIONS further overwrites — so a reader concurrent with a
swap sees a complete old or new table, never missing part-files.
Appends and swaps on the same table are serialized by an in-process
per-path lock, so an insert-fast-path append can't land in a version
directory a concurrent swap is about to retire.

(Delta/Iceberg would give true MVCC commits with multi-process
isolation; this is the dependency-free single-process equivalent at
table-replacement granularity, per SURVEY.md §7.4. At cluster scale
the parquet sink is swapped for the Delta sink in sources/delta.py.)
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession

# old versions kept after a swap; bounds how long an in-flight reader
# holding a resolved version dir stays valid (N further overwrites)
KEEP_VERSIONS = 3

_locks: dict[str, threading.Lock] = {}
_locks_guard = threading.Lock()


def _lock_for(path: str) -> threading.Lock:
    key = os.path.abspath(path)
    with _locks_guard:
        return _locks.setdefault(key, threading.Lock())


class ParquetSource:
    def __init__(self, root: str) -> None:
        self.root = root.rstrip("/")

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}.parquet"

    def _versions(self, name: str) -> str:
        return f"{self.root}/.v/{name}"

    def table(self, spark: SparkSession, name: str) -> DataFrame:
        # resolve the symlink here so Spark reads a pinned version dir:
        # a concurrent swap repoints the link but never mutates the
        # files this DataFrame will list
        return spark.read.parquet(os.path.realpath(self._path(name)))

    def exists(self, spark: SparkSession, name: str) -> bool:
        return os.path.exists(self._path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        os.makedirs(self.root, exist_ok=True)
        final = self._path(name)
        lock = _lock_for(final)
        if mode == "append" and os.path.isdir(final):
            # insert-only fast path: add part-files, no rewrite. Lock so
            # the resolved target can't be retired mid-append by a swap.
            with lock:
                df.write.mode("append").parquet(os.path.realpath(final))
            return
        # materialize fully before repointing; if df reads this same
        # table, it reads the still-intact current version
        new_version = self._materialize(df, name)
        with lock:
            self._swap(name, new_version)

    def rmw(self, spark: SparkSession, name: str, fn) -> None:
        """Replace ``name`` with ``fn(current_df)``, holding the table
        lock across the fresh file listing AND the swap — a concurrent
        ``write(mode='append')`` either lands before the listing (and is
        seen by ``fn``) or after the swap (and survives it); it can never
        fall in between and be silently dropped by the rewrite."""
        with _lock_for(self._path(name)):
            df = fn(spark.read.parquet(os.path.realpath(self._path(name))))
            self._swap(name, self._materialize(df, name))

    def _materialize(self, df: DataFrame, name: str) -> str:
        vdir = self._versions(name)
        os.makedirs(vdir, exist_ok=True)
        new_version = f"{vdir}/{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(new_version)
        return new_version

    def _swap(self, name: str, new_version: str) -> None:
        """Atomically repoint the table symlink. Called under the lock."""
        final = self._path(name)
        vdir = self._versions(name)
        if os.path.lexists(final) and not os.path.islink(final):
            # legacy plain directory: adopt it as a version so the
            # path can become a symlink
            os.rename(final, f"{vdir}/{uuid.uuid4().hex[:12]}")
        tmp_link = f"{self.root}/.{name}.{uuid.uuid4().hex[:8]}.lnk"
        os.symlink(os.path.abspath(new_version), tmp_link)
        os.replace(tmp_link, final)  # atomic repoint
        self._gc(name, keep=KEEP_VERSIONS)

    def _gc(self, name: str, keep: int) -> None:
        """Drop all but the current target and the `keep` newest other
        versions. Called under the table lock."""
        vdir = self._versions(name)
        current = os.path.realpath(self._path(name))
        versions = sorted(
            (e.path for e in os.scandir(vdir) if e.is_dir()),
            key=os.path.getmtime,
            reverse=True,
        )
        others = [v for v in versions if os.path.abspath(v) != current]
        for stale in others[keep:]:
            shutil.rmtree(stale, ignore_errors=True)
