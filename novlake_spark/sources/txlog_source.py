"""``spark.read.format("txlog")`` / ``spark.readStream.format("txlog")``:
the transaction-logged table as a first-class Spark data source, built
on PySpark 4's public Python Data Source API (SPARK-44076).

Why this exists when :meth:`TxTable.read` already plans scans natively:

- **Streaming.** Structured Streaming cannot consume a TxTable through
  the file source (``data/`` receives files BEFORE their commit
  publishes, so a directory watcher would read uncommitted data — the
  exact torn-read the log exists to prevent). Here the *commit log* is
  the stream: offsets are commit versions, a micro-batch is the file
  set published by the versions in ``(start, end]``, and Spark's
  offset checkpointing + the log's immutable entries give exactly-once
  replay with no extra bookkeeping. This is the Delta streaming-source
  design (VLDB 2020 §4.3) expressed through Spark's public API.
- **Engine-independent planning.** ``pushFilters`` receives Catalyst's
  pushed predicates and prunes files with the same pure
  :func:`~novlake_spark.txlog.file_matches` (min/max + Bloom) the
  native path uses — the scan plan Spark executes only ever contains
  the matching files, and the filters are *also* kept row-level
  (we return every filter as unhandled), so pruning can only be
  conservative, never wrong.

Batch reads of large snapshots should still prefer ``TxTable.read``
(native parquet scan, whole-stage codegen); this source's batch path
routes each file through a Python worker as Arrow batches — fine for
the change feed and small/medium snapshots, ~2-5× slower for a full
100 TB scan. The streaming path has no such caveat: deltas are small
by construction and arrive as Arrow batches.

The write path completes the symmetry: ``df.write.format("txlog")``
publishes one atomic log commit per save (executors land one parquet
file per task with per-column min/max stats computed on the Arrow
batches as they stream through; the driver's ``commit`` hook publishes
the entry), and ``writeStream.format("txlog")`` is an exactly-once
streaming sink when given ``txnAppId`` — each micro-batch commits under
txn ``<appId>@<batchId>``, so Spark replaying a batch after a crash is
a log-detected no-op. Python and JVM writers interoperate on the same
log: both claim a version slot with an atomic create-if-absent on the
same directory entry (Hadoop rename-no-overwrite vs ``os.link``).

Log access here is pure Python (``os`` + ``json``) because the
DataSource API runs outside any JVM: the driver plans from
``_log/*.json`` directly and executors open only the data files their
partition names. On an object store, swap ``open``/``listdir`` for an
``fsspec`` filesystem — the protocol (numeric-basename entries,
checkpoint fold, :func:`replay_adds`) is unchanged.
"""

from __future__ import annotations

import base64
import json
import os
import uuid
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from novlake_spark.txlog import (
    _BLOOM_K,
    _BLOOM_M,
    _STAT_TYPES,
    CommitConflict,
    ProtocolError,
    SchemaMismatch,
    TxTable,
    _bloom_positions,
    _is_mapped,
    _is_superset,
    _phys_map,
    _stat_value,
    file_matches,
    replay_adds,
)

#: Change-feed metadata columns (match :meth:`TxTable.changes`).
_CDF_FIELDS = [
    T.StructField("_change_type", T.StringType()),
    T.StructField("_commit_version", T.IntegerType()),
]


def _local_path(path: str) -> str:
    """Strip a ``file:`` scheme; reject remote schemes explicitly rather
    than failing somewhere inside ``os.listdir``."""
    if path.startswith("file://"):
        return path[len("file:"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    if "://" in path:
        raise NotImplementedError(
            f"txlog source reads local paths in this build; got {path!r} "
            "(swap _PyLog's open/listdir for fsspec to target object stores)"
        )
    return path


class _PyLog:
    """Pure-Python replica of :class:`TxTable`'s log *reader* (no JVM,
    no SparkSession) — exactly what the Data Source API's driver-side
    planning hooks can use. Shares :func:`replay_adds` with the JVM
    path so the two can never disagree on snapshot resolution."""

    def __init__(self, path: str):
        self.path = _local_path(path).rstrip("/")
        self._log = os.path.join(self.path, "_log")
        self._entries: dict[int, dict] = {}  # immutable once published

    def _numeric(self, prefix: str = "", suffix: str = ".json") -> list[int]:
        if not os.path.isdir(self._log):
            return []
        out = []
        for name in os.listdir(self._log):
            if not (name.startswith(prefix) and name.endswith(suffix)):
                continue
            stem = name[len(prefix):-len(suffix)]
            if stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def versions(self) -> list[int]:
        return [v for v in self._numeric() ]

    def checkpoints(self) -> list[int]:
        return self._numeric(prefix="checkpoint-")

    def latest_version(self) -> int | None:
        vs, cps = self.versions(), self.checkpoints()
        heads = ([vs[-1]] if vs else []) + ([cps[-1]] if cps else [])
        return max(heads) if heads else None

    def version_at_time(self, ts_ms: int) -> int:
        """TIMESTAMP AS OF resolution — mirrors TxTable.version_at_time
        (entry ``ts_ms``, falling back to log-file mtime for
        pre-timestamp entries)."""

        def commit_ms(v: int) -> int:
            e = self.read_entry(v)
            if "ts_ms" in e:
                return int(e["ts_ms"])
            return int(os.path.getmtime(os.path.join(self._log, f"{v}.json")) * 1000)

        candidates = [v for v in self.versions() if commit_ms(v) <= ts_ms]
        if not candidates:
            raise ValueError(
                f"no commit at or before ts_ms={ts_ms} under {self.path}"
            )
        return max(candidates)

    def read_entry(self, version: int) -> dict:
        if version not in self._entries:
            with open(os.path.join(self._log, f"{version}.json")) as f:
                self._entries[version] = json.load(f)
        return self._entries[version]

    def full_state(
        self, version: int | None = None
    ) -> tuple[
        list[dict], str | None, dict[str, int], dict[str, str], dict[str, int], dict[str, int]
    ]:
        """(live add-actions, schema json, txn→version, constraints,
        protocol, identity watermarks) — checkpoint + entry-tail fold,
        mirroring ``TxTable._state_at`` (including its reader-side
        protocol gate).

        A concurrent ``clean_log`` can delete an entry between our
        listing and our read; re-resolution against a fresh listing
        (which then includes the newer checkpoint that replaced those
        entries) makes the race invisible. Deadline-bounded like
        ``TxTable._state_at`` (round 9): pure-Python reads are narrow,
        but full-suite contention can still lap a fixed attempt count."""
        from novlake_spark.txlog import _retry_missing

        return _retry_missing(lambda: self._full_state_once(version))

    def _full_state_once(
        self, version: int | None = None
    ) -> tuple[
        list[dict], str | None, dict[str, int], dict[str, str], dict[str, int], dict[str, int]
    ]:
        vs, cps = self.versions(), self.checkpoints()
        protocol = {"min_reader": 1, "min_writer": 1}
        identity: dict[str, int] = {}
        if version is None:
            heads = ([vs[-1]] if vs else []) + ([cps[-1]] if cps else [])
            if not heads:
                return [], None, {}, {}, protocol, identity
            upto = max(heads)
        else:
            upto = version
            if upto not in vs and upto not in cps:
                raise ValueError(f"version {upto} not in log {vs} or checkpoints {cps}")
        cp = max((c for c in cps if c <= upto), default=None)
        if cp is not None:
            with open(os.path.join(self._log, f"checkpoint-{cp}.json")) as f:
                doc = json.load(f)
            if doc.get("adds_parquet"):
                from novlake_spark.txlog import _decode_checkpoint_parquet

                with open(
                    os.path.join(self._log, f"checkpoint-{cp}.parquet"), "rb"
                ) as f:
                    doc["adds"] = _decode_checkpoint_parquet(f.read())
            adds, schema_json = doc["adds"], doc.get("schema")
            txns = dict(doc.get("txns", {}))
            constraints = dict(doc.get("constraints", {}))
            protocol = dict(doc.get("protocol", protocol))
            identity = dict(doc.get("identity", {}))
        else:
            adds, schema_json, txns, constraints = [], None, {}, {}
        entries = [self.read_entry(v) for v in vs if (cp is None or v > cp) and v <= upto]
        for e in entries:
            if "schema" in e:
                schema_json = e["schema"]
            if "txn" in e:
                txns[e["txn"]] = e["version"]
            constraints.update(e.get("set_constraints", {}))
            for name in e.get("drop_constraints", []):
                constraints.pop(name, None)
            # per-field MAX, mirroring TxTable._state_at: protocol is
            # monotone, so last-wins would let a stale republished entry
            # downgrade the reader gate
            for k, w in e.get("protocol", {}).items():
                protocol[k] = max(protocol.get(k, 1), int(w))
            for c, w in e.get("identity", {}).items():
                identity[c] = max(identity.get(c, int(w)), int(w))
        if protocol.get("min_reader", 1) > TxTable.READER_VERSION:
            raise ProtocolError(
                f"{self.path} requires min_reader={protocol['min_reader']} "
                f"but this client supports {TxTable.READER_VERSION}; "
                "upgrade the client to read this table"
            )
        return replay_adds(entries, base=adds), schema_json, txns, constraints, protocol, identity

    def state_at(self, version: int | None = None) -> tuple[list[dict], str | None]:
        adds, schema_json = self.full_state(version)[:2]
        return adds, schema_json

    def try_publish(self, entry: dict) -> bool:
        """Pure-Python twin of ``TxTable._try_publish``: temp under
        ``_log/_tmp``, then an atomic create-if-absent claim of the
        version slot via ``os.link`` (hard-link creation fails when the
        destination exists — POSIX's rename-no-overwrite). A JVM writer
        racing this one loses or wins the same slot cleanly: Hadoop's
        local rename and ``link`` are both atomic on the same directory
        entry."""
        import time as _time

        if entry["version"] > 0:  # version 0 creates the table
            proto = self.full_state()[4]
            if proto.get("min_writer", 1) > TxTable.WRITER_VERSION:
                raise ProtocolError(
                    f"{self.path} requires min_writer={proto['min_writer']} "
                    f"but this client supports {TxTable.WRITER_VERSION}; "
                    "upgrade the client to write this table"
                )
        entry.setdefault("ts_ms", int(_time.time() * 1000))
        tmp_dir = os.path.join(self._log, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(tmp_dir, uuid.uuid4().hex)
        with open(tmp, "w") as f:
            json.dump(entry, f)
        try:
            os.link(tmp, os.path.join(self._log, f"{entry['version']}.json"))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def snapshot_files(self, version: int | None = None) -> list[str]:
        return [a["file"] for a in self.state_at(version)[0]]

    def schema_at(self, version: int | None = None) -> T.StructType | None:
        schema_json = self.state_at(version)[1]
        return None if schema_json is None else T.StructType.fromJson(json.loads(schema_json))

    def data_path(self, file_name: str) -> str:
        return os.path.join(self.path, "data", file_name)

    def add_path(self, add: dict) -> str:
        """Absolute path of an add-action's file — honors shallow-cloned
        adds' ``path`` the same way ``TxTable._data_path`` does."""
        if "path" in add:
            return _local_path(add["path"])
        return self.data_path(add["file"])


@dataclass
class _FilePartition(InputPartition):
    """One data file; for streaming also its change tag. Carries the
    absolute path (and the file's deletion-vector positions) so
    executors never touch the log. ``dv_mode='exclude'`` drops the DV
    positions (snapshot semantics); ``'only'`` keeps exactly them (the
    change feed's delete rows for a set_dv commit)."""

    path: str | None  # None ⇒ deliberately empty partition
    change_type: str | None = None
    commit_version: int | None = None
    dv: tuple = ()
    dv_mode: str = "exclude"


def _arrow_schema(spark_schema: T.StructType) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


def _aligned_batches(
    path: str | None, target: pa.Schema, dv=(), dv_mode="exclude", phys=None
):
    """Stream one parquet file batch-by-batch (never the whole file in
    memory) aligned to the declared source schema: pre-evolution files
    surface post-evolution columns as nulls (the log's snapshot-schema
    contract), dropped columns are not delivered, and physical/logical
    type drift is cast. ``phys`` maps logical→physical column names on
    column-mapped tables (files spell the physical name, the yielded
    batches spell the logical one). Deletion-vector positions are
    dropped (``exclude``) or isolated (``only``) by tracking the
    running row offset per batch. Yields Arrow batches."""
    if path is None:
        return
    phys = phys or {}
    pf = pq.ParquetFile(path)
    names = {f.name: phys.get(f.name, f.name) for f in target}
    present = [p for p in names.values() if p in pf.schema_arrow.names]
    dv_set = set(dv)
    offset = 0
    for batch in pf.iter_batches(columns=present):
        n = batch.num_rows
        if dv_set or dv_mode == "only":
            hit = [i for i in range(n) if (offset + i) in dv_set]
            keep = hit if dv_mode == "only" else [
                i for i in range(n) if (offset + i) not in dv_set
            ]
            offset += n
            if len(keep) < n:
                batch = batch.take(pa.array(keep, pa.int64()))
            if batch.num_rows == 0:
                continue
        cols = []
        for field in target:
            pname = names[field.name]
            if pname in batch.schema.names:
                col = batch.column(pname)
                if col.type != field.type:
                    col = col.cast(field.type)
                cols.append(col)
            else:
                cols.append(pa.nulls(batch.num_rows, field.type))
        yield pa.RecordBatch.from_arrays(cols, schema=target)


def _to_predicates(filters: list[Filter]) -> list[tuple]:
    """Pushed Catalyst filters → the ``(col, op, value)`` grammar
    :func:`file_matches` prunes with. Only shapes the skip index can
    use are kept; everything else is simply not pruned on (and since
    ALL filters are reported back as unhandled, Spark re-applies every
    predicate row-level — pruning is an optimization, never semantics).
    """
    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    preds = []
    for f in filters:
        op = ops.get(type(f))
        if op is None or len(f.attribute) != 1:
            continue
        if f.value is None or isinstance(f.value, (list, tuple, dict)):
            continue
        preds.append((f.attribute[0], op, f.value))
    return preds


def _resolve_version(log: _PyLog, options: dict) -> int | None:
    """Shared batch time-travel resolution: ``version`` wins, else
    ``timestampMs`` resolves through the commit timestamps."""
    version = options.get("version")
    ts = options.get("timestampms")
    if version is not None and ts is not None:
        raise ValueError("pass version OR timestampMs, not both")
    if version is not None:
        return int(version)
    if ts is not None:
        return log.version_at_time(int(ts))
    return None


class _TxLogBatchReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._log = _PyLog(options["path"])
        version = _resolve_version(self._log, options)
        adds, schema_json = self._log.state_at(version)
        self._adds = adds
        self._target = _arrow_schema(schema)
        # logical→physical names on column-mapped tables (file columns
        # and stats/Bloom keys are physical; this source's output and
        # pushed filters are logical)
        self._phys = _phys_map(
            None if schema_json is None else T.StructType.fromJson(json.loads(schema_json))
        )

    def pushFilters(self, filters: list[Filter]):
        from pyspark.sql.datasource import In

        preds = [
            (self._phys.get(c, c), op, v) for c, op, v in _to_predicates(filters)
        ]
        if preds:
            self._adds = [a for a in self._adds if file_matches(a, preds)]
        for f in filters:
            # IN is a disjunction: keep a file if ANY value could be in
            # it (per-value Bloom/min-max probe — the point-lookup path)
            if (
                isinstance(f, In)
                and len(f.attribute) == 1
                and f.value
                and all(
                    isinstance(v, (int, str)) and not isinstance(v, bool)
                    for v in f.value
                )
            ):
                col = self._phys.get(f.attribute[0], f.attribute[0])
                self._adds = [
                    a
                    for a in self._adds
                    if any(file_matches(a, [(col, "=", v)]) for v in f.value)
                ]
        # Report every filter unhandled: file skipping is conservative
        # (a kept file may still hold non-matching rows), so Spark must
        # keep the row-level Filter above this scan.
        return filters

    def partitions(self):
        parts = [
            _FilePartition(self._log.add_path(a), dv=tuple(a.get("dv", [])))
            for a in self._adds
        ]
        return parts or [_FilePartition(None)]

    def read(self, partition: _FilePartition):
        yield from _aligned_batches(
            partition.path, self._target, partition.dv, partition.dv_mode,
            phys=self._phys,
        )


class _TxLogStreamReader(DataSourceStreamReader):
    """Offsets are commit versions: offset ``{"version": N}`` means
    "everything through commit N is delivered". A micro-batch
    ``(start, end]`` is exactly the files published by those commits —
    deterministic from immutable log entries, so a replayed batch is
    byte-identical and Spark's offset checkpoint gives exactly-once.

    Modes:

    - default: append-only tail (rows from ``add`` actions). A commit
      that removes or overwrites raises mid-stream unless
      ``ignoreChanges=true`` (rewritten files' rows then re-deliver —
      Delta's ``ignoreChanges`` contract; consumers must be idempotent).
    - ``readChangeFeed=true``: row-level change feed — inserts AND
      deletes, tagged ``_change_type`` / ``_commit_version`` exactly
      like :meth:`TxTable.changes`.

    ``startingVersion``: first commit to deliver (default 0 = full
    history, i.e. the table's current content arrives as the first
    batches); ``"latest"`` tails only commits made after stream start.

    Deliberately NO ``maxFilesPerTrigger``: the Python API's
    ``latestOffset()`` receives neither the last committed offset nor a
    read limit (no ``SupportsAdmissionControl`` surface), so any
    reader-internal cursor desynchronizes from Spark's checkpoint on
    restart — the offset log would walk backwards and re-deliver.
    Backfill batches are instead bounded by the log itself: commit at
    the producer's cadence and each version is its own micro-batch
    unit; Spark coalesces only what accumulated between triggers.
    """

    def __init__(self, schema: T.StructType, options: dict):
        self._log = _PyLog(options["path"])
        self._cdf = str(options.get("readchangefeed", "false")).lower() == "true"
        self._ignore_changes = str(options.get("ignorechanges", "false")).lower() == "true"
        base_fields = schema.fields[:-2] if self._cdf else schema.fields
        self._base_arrow = _arrow_schema(T.StructType(base_fields))
        log_schema = self._log.schema_at()
        self._phys = _phys_map(log_schema)  # logical→physical (mapped tables)
        start = str(options.get("startingversion", "0"))
        if start.lower() == "latest":
            latest = self._log.latest_version()
            self._start_after = -1 if latest is None else latest
        else:
            self._start_after = int(start) - 1

    def initialOffset(self) -> dict:
        return {"version": self._start_after}

    def latestOffset(self) -> dict:
        latest = self._log.latest_version()
        return {"version": self._start_after if latest is None else max(latest, self._start_after)}

    def partitions(self, start: dict, end: dict):
        parts: list[_FilePartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            e = self._log.read_entry(v)
            prior: dict[str, dict] = {}
            if v > 0 and (e["mode"] == "overwrite" or e.get("remove") or e.get("set_dv")):
                prior = {a["file"]: a for a in self._log.state_at(v - 1)[0]}
            if e["mode"] == "overwrite" and v > 0:
                removed = list(prior.values())
            elif e.get("remove"):
                # resolve remove names to full adds (clone-aware paths)
                removed = [prior.get(f, {"file": f}) for f in e["remove"]]
            else:
                removed = []
            set_dv = e.get("set_dv") or {}
            if (removed or set_dv) and not self._cdf:
                if not self._ignore_changes:
                    raise ValueError(
                        f"version {v} is not append-only (mode={e['mode']}, "
                        f"{len(removed)} removes, {len(set_dv)} deletion "
                        "vectors); stream with readChangeFeed=true for "
                        "row-level deletes, or ignoreChanges=true to "
                        "re-deliver rewritten rows"
                    )
            elif removed or set_dv:
                # a removed file's delete rows exclude its prior DV (those
                # rows were already reported deleted when the DV landed)
                parts.extend(
                    _FilePartition(
                        self._log.add_path(a), "delete", v,
                        dv=tuple(a.get("dv", [])),
                    )
                    for a in removed
                )
                parts.extend(
                    _FilePartition(
                        self._log.add_path(prior.get(f, {"file": f})),
                        "delete", v, dv=tuple(ps), dv_mode="only",
                    )
                    for f, ps in set_dv.items()
                )
            parts.extend(
                _FilePartition(self._log.add_path(a), "insert", v)
                for a in e.get("add", [])
            )
        return parts or [_FilePartition(None)]

    def read(self, partition: _FilePartition):
        for batch in _aligned_batches(
            partition.path, self._base_arrow, partition.dv, partition.dv_mode,
            phys=self._phys,
        ):
            if not self._cdf:
                yield batch
                continue
            n = batch.num_rows
            arrays = list(batch.columns) + [
                pa.array([partition.change_type] * n, pa.string()),
                pa.array([partition.commit_version] * n, pa.int32()),
            ]
            names = list(batch.schema.names) + ["_change_type", "_commit_version"]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; log entries are immutable


# -- write path ----------------------------------------------------------


@dataclass
class _TxFileCommit(WriterCommitMessage):
    """One executor task's landed file (None = the task saw no rows)."""

    file: str | None
    rows: int = 0
    stats: dict = field(default_factory=dict)
    bloom: dict = field(default_factory=dict)
    bytes: int = 0


class _WriterCore:
    """Shared by the batch and streaming writers. Executors land one
    parquet file per non-empty task under ``data/`` (invisible until a
    log entry references it — the same land-then-publish protocol as
    ``TxTable._write_data``) and return its add-action in the commit
    message, with min/max stats computed per Arrow batch as it streams
    through, so the driver's ``commit`` publishes ONE atomic log entry
    and needs no second pass over the data."""

    def __init__(self, schema: T.StructType, options: dict, mode: str):
        self._log = _PyLog(options["path"])
        self._schema = schema
        self._mode = mode
        self._txn = options.get("txn")  # batch idempotency key
        self._txn_app = options.get("txnappid")  # streaming: <app>@<batchId>
        self._stat_cols = {
            f.name for f in schema.fields if isinstance(f.dataType, _STAT_TYPES)
        }
        # Same eligibility rule as TxTable._write_data: only types whose
        # Spark CAST(... AS STRING) equals Python str() may feed the
        # Bloom filter, or the two planners would probe different keys.
        wanted = {
            c.strip() for c in options.get("bloomcols", "").split(",") if c.strip()
        }
        self._bloom_cols = {
            f.name
            for f in schema.fields
            if f.name in wanted
            and isinstance(
                f.dataType,
                (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType),
            )
        }

    # -- executor side ---------------------------------------------------
    def write(self, iterator) -> _TxFileCommit:
        import pyarrow.compute as pc

        writer = None
        name = f"{uuid.uuid4().hex}.parquet"
        path = self._log.data_path(name)
        rows = 0
        lo: dict = {}
        hi: dict = {}
        bloom_bits = {c: bytearray(_BLOOM_M >> 3) for c in self._bloom_cols}
        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                if writer is None:
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    writer = pq.ParquetWriter(path, batch.schema)
                writer.write_batch(batch)
                rows += batch.num_rows
                for c in self._stat_cols:
                    if c not in batch.schema.names:
                        continue
                    mm = pc.min_max(batch.column(c))
                    bl, bh = mm["min"].as_py(), mm["max"].as_py()
                    if bl is not None:
                        lo[c] = bl if c not in lo or bl < lo[c] else lo[c]
                        hi[c] = bh if c not in hi or bh > hi[c] else hi[c]
                for c in self._bloom_cols:
                    if c not in batch.schema.names:
                        continue
                    bits = bloom_bits[c]
                    for v in batch.column(c).to_pylist():
                        if v is None:
                            continue
                        for pos in _bloom_positions(str(v)):
                            bits[pos >> 3] |= 1 << (pos & 7)
        finally:
            if writer is not None:
                writer.close()
        if rows == 0:
            return _TxFileCommit(None)
        size = os.path.getsize(path)
        stats = {
            c: [_stat_value(lo.get(c)), _stat_value(hi.get(c))]
            for c in self._stat_cols
        }
        bloom = {
            c: {
                "m": _BLOOM_M,
                "k": _BLOOM_K,
                "bits": base64.b64encode(bytes(bits)).decode(),
            }
            for c, bits in bloom_bits.items()
        }
        return _TxFileCommit(name, rows, stats, bloom, size)

    # -- driver side -----------------------------------------------------
    def _adds(self, messages) -> list[dict]:
        out = []
        for m in messages:
            if m is None or m.file is None:
                continue
            add = {"file": m.file, "rows": m.rows, "stats": m.stats, "bytes": m.bytes}
            if m.bloom:
                add["bloom"] = m.bloom
            out.append(add)
        return out

    def _discard(self, messages) -> None:
        for m in messages or []:
            if m is not None and m.file is not None:
                try:
                    os.unlink(self._log.data_path(m.file))
                except FileNotFoundError:
                    pass

    def _schema_action(self, cur_schema_json: str | None) -> str | None:
        """Mirror of ``TxTable._check_schema`` over the writer's schema."""
        new_json = json.dumps(self._schema.jsonValue())
        if self._mode == "overwrite" or cur_schema_json is None:
            return new_json
        cur = T.StructType.fromJson(json.loads(cur_schema_json))
        if self._schema == cur:
            return None
        if _is_superset(self._schema, cur):
            return new_json  # additive evolution
        missing = [f.name for f in cur.fields if f.name not in self._schema.fieldNames()]
        changed = [
            f.name
            for f in cur.fields
            if f.name in self._schema.fieldNames()
            and self._schema[f.name].dataType != f.dataType
        ]
        raise SchemaMismatch(
            f"write to {self._log.path} incompatible with table schema: "
            f"missing columns {missing}, changed types {changed}"
        )

    def _publish(self, messages, txn: str | None, max_retries: int = 20) -> int:
        adds = self._adds(messages)
        for _ in range(max_retries):
            _, cur_schema_json, txns, constraints, _, identity = self._log.full_state()
            if txn is not None and txn in txns:
                # replayed batch: the table already has this commit;
                # this run's landed files are orphans
                self._discard(messages)
                return txns[txn]
            if constraints:
                # CHECK constraints are SQL expressions — only the JVM
                # path can evaluate them. Refusing beats silently
                # committing rows a constraint would have rejected.
                self._discard(messages)
                raise NotImplementedError(
                    f"table {self._log.path} has CHECK constraints "
                    f"{sorted(constraints)}; write through TxTable.commit"
                )
            if identity:
                # identity allocation + watermark advance live in
                # TxTable.commit; a Python-side commit would hand out
                # colliding ids. Refuse rather than corrupt.
                self._discard(messages)
                raise NotImplementedError(
                    f"table {self._log.path} has identity column "
                    f"{sorted(identity)}; write through TxTable.commit"
                )
            if cur_schema_json is not None and _is_mapped(
                T.StructType.fromJson(json.loads(cur_schema_json))
            ):
                # column-mapped tables write files under PHYSICAL names;
                # this writer landed logical-named files. Refuse rather
                # than publish files every reader would misbind.
                self._discard(messages)
                raise NotImplementedError(
                    f"table {self._log.path} has column mapping enabled; "
                    "write through TxTable.commit"
                )
            schema_action = self._schema_action(cur_schema_json)
            latest = self._log.latest_version()
            entry: dict = {
                "version": 0 if latest is None else latest + 1,
                "mode": self._mode,
                "add": adds,
            }
            if schema_action is not None:
                entry["schema"] = schema_action
            if txn is not None:
                entry["txn"] = txn
            if self._log.try_publish(entry):
                return entry["version"]
            # lost the slot to a rival — loop re-reads the tail (pure
            # appends always compose; this writer never removes files)
        self._discard(messages)
        raise CommitConflict(f"lost {max_retries} commit races on {self._log.path}")


class _TxLogBatchWriter(_WriterCore, DataSourceArrowWriter):
    def commit(self, messages) -> None:
        self._publish(messages, txn=self._txn)

    def abort(self, messages) -> None:
        self._discard(messages)


class _TxLogStreamWriter(_WriterCore, DataSourceStreamArrowWriter):
    """Exactly-once streaming sink: with ``txnAppId`` set, each
    micro-batch commits under txn ``<appId>@<batchId>``, so a batch
    Spark replays after a sink-committed-but-checkpoint-lost crash is
    recognized in the log and skipped — the data-source-API twin of the
    foreachBatch + ``txn=`` pattern in streaming/events.py. Without
    ``txnAppId`` the sink is at-least-once (documented, not default-on,
    because a wrong appId shared by two streams would wrongly dedupe)."""

    def commit(self, messages, batchId: int) -> None:
        txn = f"{self._txn_app}@{batchId}" if self._txn_app else None
        self._publish(messages, txn=txn)

    def abort(self, messages, batchId: int) -> None:
        self._discard(messages)


class TxLogDataSource(DataSource):
    """``format("txlog")``. Options: ``path`` (required), ``version``
    (batch time travel), ``readChangeFeed``, ``startingVersion``,
    ``ignoreChanges`` (streaming). Register once per session with
    :func:`register_txlog_source`."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def schema(self) -> T.StructType:
        log = _PyLog(self.options["path"])
        schema = log.schema_at(_resolve_version(log, self.options))
        if schema is None:
            raise FileNotFoundError(f"no committed schema under {self.options['path']}")
        # All-nullable, like every Spark file source (and evolution pads
        # pre-evolution files with nulls, so nothing is truly required).
        schema = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in schema.fields]
        )
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            schema = T.StructType(schema.fields + _CDF_FIELDS)
        return schema

    def reader(self, schema: T.StructType) -> _TxLogBatchReader:
        return _TxLogBatchReader(schema, self.options)

    def streamReader(self, schema: T.StructType) -> _TxLogStreamReader:
        return _TxLogStreamReader(schema, self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> _TxLogBatchWriter:
        return _TxLogBatchWriter(
            schema, self.options, "overwrite" if overwrite else "append"
        )

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> _TxLogStreamWriter:
        return _TxLogStreamWriter(
            schema, self.options, "overwrite" if overwrite else "append"
        )


def register_txlog_source(spark) -> None:
    """Idempotent per-session registration of ``format("txlog")``."""
    spark.dataSource.register(TxLogDataSource)
    # Without this Catalyst never calls pushFilters (and 4.1 hard-errors
    # on a reader that implements it); runtime-settable SQL conf.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
