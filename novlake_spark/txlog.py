"""Log-structured table on plain Parquet: snapshot isolation and
optimistic concurrency from a JSON commit log — the transaction-log
half of the lakehouse story (Delta Lake, VLDB 2020) without any
external jars.

Why a log instead of directory listing:

- **Atomic multi-file commits.** A writer lands data files under
  ``data/`` (invisible to readers — readers never list directories),
  then publishes them with ONE log entry. Readers see all of a commit
  or none of it, on any filesystem, including object stores where
  directory rename is not atomic — this is exactly the gap
  ``Lake.merge_into``'s prefix swap documents.
- **Snapshot isolation.** A reader resolves the file set at version N
  once; concurrent commits create N+1, N+2… and never mutate existing
  log entries or data files, so a long scan is never torn.
- **Optimistic concurrency.** Version N+1 is claimed by creating
  ``_log/{N+1}.json`` with create-if-absent semantics (Hadoop
  ``rename`` onto an existing destination fails; HDFS/POSIX make this
  atomic). Exactly one of two racing writers wins; the loser re-reads
  the log and retries or raises :class:`CommitConflict`. On S3-style
  stores without atomic rename, the same protocol runs against a
  coordination layer (DynamoDB-style log store in published designs);
  the log format is unchanged.
- **Scan planning stays O(files-in-snapshot)**: the log replaces the
  100 TB directory listing, and per-file stats in the add action
  (row count; extensible to min/max) support file skipping before
  Spark ever lists anything.

Kept deliberately minimal: add/remove actions, append/overwrite
commits, time travel, retention vacuum. Delta's richer features
(column-mapping MERGE on the log, schema enforcement on commit,
compaction as remove+add) compose from these primitives — ``compact``
below shows the pattern.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer claimed the target version (after retries)."""


def replay(entries: list[dict]) -> list[str]:
    """Fold ordered log entries into the live file list (pure function —
    property-tested in isolation; :meth:`TxTable.snapshot_files` is this
    over the persisted log)."""
    live: list[str] = []
    for e in entries:
        if e["mode"] == "overwrite":
            live = []
        removed = set(e.get("remove", []))
        live = [f for f in live if f not in removed]
        live.extend(a["file"] for a in e.get("add", []))
    return live


class TxTable:
    """A transaction-logged Parquet table rooted at ``path``.

    Layout::

        path/_log/0.json, 1.json, ...   one JSON document per commit
        path/data/<uuid>.parquet        immutable data files

    Log entry: ``{"version": N, "mode": "append"|"overwrite",
    "add": [{"file": name, "rows": n}], "remove": [name, ...]}``.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        jvm = spark._jvm
        self._jpath = jvm.org.apache.hadoop.fs.Path
        self._fs = self._jpath(self.path).getFileSystem(spark._jsc.hadoopConfiguration())

    # -- log primitives ----------------------------------------------------
    def _log_path(self, version: int):
        return self._jpath(f"{self.path}/_log/{version}.json")

    def versions(self) -> list[int]:
        statuses = self._fs.globStatus(self._jpath(f"{self.path}/_log/*.json")) or []
        return sorted(int(s.getPath().getName().removesuffix(".json")) for s in statuses)

    def _read_entry(self, version: int) -> dict:
        stream = self._fs.open(self._log_path(version))
        try:
            data = bytes(self.spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        return json.loads(data.decode())

    def _try_publish(self, entry: dict) -> bool:
        """Atomically claim ``entry['version']``: write a temp log file,
        rename onto the final name. Hadoop's rename contract fails when
        the destination exists (unlike POSIX), which makes the rename
        the commit point — exactly one racing writer's rename succeeds.
        """
        tmp = self._jpath(f"{self.path}/_log/.tmp-{uuid.uuid4().hex}.json")
        out = self._fs.create(tmp, False)
        try:
            out.write(bytearray(json.dumps(entry).encode()))
        finally:
            out.close()
        committed = self._fs.rename(tmp, self._log_path(entry["version"]))
        if not committed:
            self._fs.delete(tmp, False)
        return bool(committed)

    # -- snapshot resolution -----------------------------------------------
    def snapshot_files(self, version: int | None = None) -> list[str]:
        """File names live at ``version`` (default: latest), by log replay."""
        vs = self.versions()
        if not vs:
            return []
        upto = max(vs) if version is None else version
        if upto not in vs:
            raise ValueError(f"version {upto} not in {vs}")
        return replay([self._read_entry(v) for v in vs if v <= upto])

    def read(self, version: int | None = None) -> DataFrame:
        files = self.snapshot_files(version)
        if not files:
            raise FileNotFoundError(f"no committed data under {self.path}")
        return self.spark.read.parquet(*[f"{self.path}/data/{f}" for f in files])

    def history(self) -> list[dict]:
        return [self._read_entry(v) for v in self.versions()]

    # -- commits -----------------------------------------------------------
    def _write_data(self, df: DataFrame) -> list[dict]:
        """Land data files invisibly; return add-actions with stats."""
        staging = f"{self.path}/.stage-{uuid.uuid4().hex}"
        df.write.parquet(staging)
        adds = []
        for s in self._fs.globStatus(self._jpath(f"{staging}/*.parquet")) or []:
            name = f"{uuid.uuid4().hex}.parquet"
            self._fs.mkdirs(self._jpath(f"{self.path}/data"))
            if not self._fs.rename(s.getPath(), self._jpath(f"{self.path}/data/{name}")):
                raise IOError(f"could not stage {s.getPath()}")
            adds.append({"file": name})
        self._fs.delete(self._jpath(staging), True)
        return adds

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        remove: list[str] | None = None,
        max_retries: int = 5,
        txn: str | None = None,
    ) -> int:
        """Write ``df`` and publish it as one atomic commit; returns the
        committed version. ``mode='overwrite'`` replaces the snapshot;
        ``remove`` drops named files in the same commit (the compaction
        / MERGE building block). Data files are written ONCE — only the
        cheap log publish retries under contention.

        ``txn`` makes the commit IDEMPOTENT: a commit whose txn id is
        already in the log is skipped (its version returned, the fresh
        data files discarded). This is what turns an at-least-once
        caller — a ``foreachBatch`` micro-batch that gets re-executed
        after a failure — into exactly-once: pass
        ``f"{app_id}.{batch_id}"`` and replays become no-ops. The check
        re-runs after every lost race, so two same-txn writers racing
        still commit once.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(mode)

        def committed_txn() -> int | None:
            if txn is None:
                return None
            for e in self.history():
                if e.get("txn") == txn:
                    return e["version"]
            return None

        dup = committed_txn()
        if dup is not None:
            return dup
        adds = self._write_data(df)

        def discard() -> None:
            for a in adds:  # unpublished files are invisible; remove them
                self._fs.delete(self._jpath(f"{self.path}/data/{a['file']}"), False)

        for _ in range(max_retries):
            version = (self.versions() or [-1])[-1] + 1 if self.versions() else 0
            entry = {"version": version, "mode": mode, "add": adds, "remove": remove or []}
            if txn is not None:
                entry["txn"] = txn
            if self._try_publish(entry):
                return version
            # lost the race: another writer claimed this version. If it
            # was our own txn replayed elsewhere, we're already done;
            # otherwise an append composes with any interleaved commit —
            # re-read the log and try the next slot.
            dup = committed_txn()
            if dup is not None:
                discard()
                return dup
        discard()
        raise CommitConflict(f"lost {max_retries} commit races on {self.path}")

    def compact(self, target_version: int | None = None) -> int:
        """Rewrite the current snapshot as one commit: add the merged
        files, remove the old ones — readers at older versions are
        untouched (their files stay until vacuum)."""
        files = self.snapshot_files(target_version)
        merged = self.read(target_version)
        return self.commit(merged, mode="append", remove=files)

    def vacuum(self, keep_from_version: int) -> list[str]:
        """Delete data files not referenced by any snapshot >= the
        retention horizon. Time travel before the horizon stops working
        — same contract as Delta's VACUUM."""
        vs = [v for v in self.versions() if v >= keep_from_version]
        keep: set[str] = set()
        for v in vs:
            keep.update(self.snapshot_files(v))
        removed = []
        for s in self._fs.globStatus(self._jpath(f"{self.path}/data/*.parquet")) or []:
            name = s.getPath().getName()
            if name not in keep:
                self._fs.delete(s.getPath(), False)
                removed.append(name)
        return removed
