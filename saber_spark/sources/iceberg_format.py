"""From-scratch implementation of the Apache Iceberg table format (spec v2
semantics) in pure Python over parquet data files.

The north_rule targets "Iceberg tables of multi-turn transcripts" with an
"exactly-once idempotent Iceberg sink". The sandbox image has no Iceberg
runtime jars (``sources/iceberg.py`` carries the gated real-connector
config), so this module implements the table *format* itself from the
public spec (https://iceberg.apache.org/spec/) rather than stubbing it:

- **Metadata model**: ``metadata/v{N}.metadata.json`` files holding
  table-uuid, schemas (field-id based), partition specs (identity /
  hour / day / truncate / bucket transforms), the snapshot list, and a
  snapshot-log for timestamp time-travel — the same shape as the spec's
  TableMetadata.
- **Commit protocol**: the Hadoop-catalog optimistic protocol
  (HadoopTableOperations in the reference implementation): a writer
  renders v{N+1}.metadata.json to a temp file and publishes it with an
  atomic create-if-absent (``os.link``); losing a race raises
  ``CommitConflict`` and the commit loop re-reads the new base and
  re-applies — appends always merge cleanly because their manifests are
  already on disk. ``version-hint.text`` is then swapped atomically.
- **Snapshots → manifest list → manifests → data files**, with
  per-file record counts and per-column lower/upper bounds harvested
  from the parquet footers (pyarrow), used for scan-time file pruning.
- **Honest deviation**: the spec serializes manifests as Avro; no Avro
  library exists in this sandbox, so manifest lists and manifests are
  JSON documents carrying the same fields. ``bucket[N]`` uses a
  md5-based portable hash rather than the spec's murmur3 (documented —
  no interop target exists here to murmur-match). Everything else
  (field-id schemas, sequence numbers, snapshot summaries, atomic
  version swap, snapshot isolation, incremental scans) follows the spec.

Readers are snapshot-isolated: a scan pins one snapshot's file list, so
concurrent appends never tear a read. Crash-before-commit leaves orphan
data files that no snapshot references (invisible to every reader);
``remove_orphan_files`` reclaims them — both exactly Iceberg's behavior.

Reference analogue: Saber has no persistent store at all (results are
byte-counted and re-dispatched, ResultAggregator.java:164-209); this
layer is new engineering mandated by the north_rule.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from urllib.parse import unquote

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


# -- immutable-file JSON cache ----------------------------------------------
#
# Manifest lists and manifests are written ONCE under unique uuid names and
# never modified (the spec's immutability invariant; commits add NEW files
# and re-reference old ones by path). Planning a scan walks every live
# manifest, so at file-count scale (10k files / hundreds of snapshots —
# measured in BENCH/ICEBERG.md §metadata-planning) re-parsing the same JSON
# per scan dominates planning time. This process-wide LRU (hits reinsert at
# the tail; eviction drops the least-recently-used half) caches the parsed
# documents keyed by (path, mtime_ns, size) — the stat key means a
# hypothetically rewritten file misses rather than serving stale bytes.
# Concurrent driver threads (one foreachBatch thread per streaming sink) may
# race here; every step is a single atomic dict op or tolerates a lost race
# (pop(k, None) on evict, a double file re-parse on a popped hit), so no
# lock is needed.
# CALLERS MUST TREAT CACHED OBJECTS AS READ-ONLY: every consumer either
# copies entries into new dicts ({**d, ...}) or reads fields; commits build
# fresh manifests rather than mutating parsed ones.

_JSON_CACHE_MAX = 8192
_json_cache: dict = {}


def _read_json_immutable(path: str):
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    hit = _json_cache.pop(key, None)
    if hit is not None:
        _json_cache[key] = hit  # move-to-tail: dict order IS recency order
        return hit
    with open(path) as f:
        val = json.load(f)
    if len(_json_cache) >= _JSON_CACHE_MAX:
        # drop the least-recently-used half — cheap, amortized
        for k in list(_json_cache)[: _JSON_CACHE_MAX // 2]:
            _json_cache.pop(k, None)  # another evictor may have won the race
    _json_cache[key] = val
    return val


class CommitConflict(Exception):
    """Another writer published the metadata version this commit targeted."""


class ValidationFailed(Exception):
    """A copy-on-write commit found its pinned input files already
    rewritten/removed by a concurrent commit (spec: validation exception;
    the caller must re-plan against the new snapshot, not blind-retry)."""


class AlreadyCommitted(Exception):
    """Idempotent re-drive: the commit tag is already in table history."""


# -- schema (field-id based, spec §Schemas) --------------------------------

_SPARK_TO_ICEBERG = {
    "string": "string",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _schema_from_spark(schema) -> list[dict]:
    fields = []
    for i, f in enumerate(schema.fields, start=1):
        simple = f.dataType.simpleString()
        fields.append(
            {
                "id": i,
                "name": f.name,
                "required": not f.nullable,
                "type": _SPARK_TO_ICEBERG.get(simple, simple),
                # faithful round-trip for types outside the mapping table
                # (decimal(p,s), array<...>): keep the Spark simpleString
                "spark_type": simple,
            }
        )
    return fields


def _spark_type_of(f: dict) -> str:
    inv = {"int": "int", "long": "bigint", "timestamp": "timestamp"}
    return f.get("spark_type") or inv.get(f["type"], f["type"])


def _spark_ddl(fields: list[dict]) -> str:
    return ", ".join(f"`{f['name']}` {_spark_type_of(f)}" for f in fields)


def _projection_to_current(
    writer_fields: list[dict], cur_fields: list[dict]
) -> list[Column] | None:
    """Field-id column resolution (spec §Schema Evolution): the Column
    list that projects a DataFrame read under ``writer_fields`` onto the
    current schema — renames resolve by id (values survive), fields the
    writer predates become typed nulls, dropped fields are simply not
    selected. Returns None when the writer schema already IS the current
    one (the fast path skips the projection node entirely)."""
    shape = lambda fs: [(f["id"], f["name"], _spark_type_of(f)) for f in fs]  # noqa: E731
    if shape(writer_fields) == shape(cur_fields):
        return None
    by_id = {f["id"]: f for f in writer_fields}
    proj = []
    for f in cur_fields:
        t = _spark_type_of(f)
        w = by_id.get(f["id"])
        if w is None:
            proj.append(F.lit(None).cast(t).alias(f["name"]))
        else:
            c = F.col(w["name"])
            if _spark_type_of(w) != t:
                c = c.cast(t)
            proj.append(c.alias(f["name"]))
    return proj


# -- partition transforms (spec §Partition Transforms) ----------------------


def _transform_expr(transform: str, col: str):
    """Partition transform → Catalyst Column (computed once at write)."""
    if transform == "identity":
        return F.col(col).cast("string")
    if transform == "hour":
        return F.floor(F.col(col).cast("timestamp").cast("long") / 3600).cast(
            "string"
        )
    if transform == "day":
        return F.floor(F.col(col).cast("timestamp").cast("long") / 86400).cast(
            "string"
        )
    if transform.startswith("truncate["):
        w = int(transform[len("truncate[") : -1])
        return F.substring(F.col(col).cast("string"), 1, w)
    if transform.startswith("bucket["):
        n = int(transform[len("bucket[") : -1])
        # spec uses murmur3_32; md5 here is the same portable-hash
        # construction the rest of the engine standardizes on (no
        # murmur-interop target exists in this sandbox)
        return (
            F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
            .cast("long")
            % n
        ).cast("string")
    raise ValueError(f"unknown transform {transform!r}")


# -- parquet footer stats ----------------------------------------------------


def _file_stats(path: str) -> dict:
    """record_count + per-column lower/upper bounds from the footer —
    what Iceberg manifests carry per data file (spec §Manifests)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    meta = pf.metadata
    lower: dict = {}
    upper: dict = {}
    nulls: dict = {}
    # Bounds are only sound if EVERY row group contributed: a column whose
    # stats are missing/undecodable in any one row group gets NO bounds at
    # all (pruning on partial bounds would silently drop matching files).
    incomplete: set = set()
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested: skip bounds, spec allows partial stats
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                incomplete.add(name)
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    incomplete.add(name)
                    continue
            if hasattr(mn, "isoformat"):
                # space separator, not 'T': bounds compare lexicographically
                # against SQL-literal-style 'YYYY-MM-DD HH:MM:SS' strings.
                # (plain dates take no sep — their isoformat has none)
                try:
                    mn, mx = mn.isoformat(sep=" "), mx.isoformat(sep=" ")
                except TypeError:
                    mn, mx = mn.isoformat(), mx.isoformat()
            if not isinstance(mn, (str, int, float, bool)):
                incomplete.add(name)
                continue
            lower[name] = mn if name not in lower else min(lower[name], mn)
            upper[name] = mx if name not in upper else max(upper[name], mx)
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
    for name in incomplete:
        lower.pop(name, None)
        upper.pop(name, None)
    return {
        "record_count": meta.num_rows,
        "file_size_in_bytes": os.path.getsize(path),
        "lower_bounds": lower,
        "upper_bounds": upper,
        "null_value_counts": nulls,
    }


# -- the table ----------------------------------------------------------------


class IcebergTable:
    """Handle on one table rooted at a filesystem ``location``."""

    def __init__(self, location: str) -> None:
        self.location = location
        self.meta_dir = os.path.join(location, "metadata")
        self.data_dir = os.path.join(location, "data")

    # -- create / load --------------------------------------------------------

    @classmethod
    def create(
        cls,
        location: str,
        schema,
        partition_by: list[tuple[str, str]] | None = None,
        properties: dict | None = None,
    ) -> "IcebergTable":
        """``schema``: a Spark StructType (or a DataFrame, whose schema is
        taken). ``partition_by``: [(source_column, transform)] with
        transform ∈ identity|hour|day|truncate[w]|bucket[n]."""
        if isinstance(schema, DataFrame):
            schema = schema.schema
        t = cls(location)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        fields = _schema_from_spark(schema)
        by_name = {f["name"]: f["id"] for f in fields}
        # spec default naming: identity fields keep the source column name;
        # other transforms append the transform name (HOUR -> ts_hour etc.)
        spec = [
            {
                "name": col if tr == "identity" else f"{col}_{tr.split('[')[0]}",
                "source-id": by_name[col],
                "source-name": col,
                "transform": tr,
                "field-id": 1000 + i,
            }
            for i, (col, tr) in enumerate(partition_by or [])
        ]
        meta = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid4()),
            "location": location,
            "last-sequence-number": 0,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": len(fields),
            "current-schema-id": 0,
            "schemas": [{"schema-id": 0, "fields": fields}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec}],
            "last-partition-id": 999 + len(spec),
            "properties": properties or {},
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
        }
        t._publish_version(meta, expected_version=0)
        return t

    @classmethod
    def load(cls, location: str) -> "IcebergTable":
        t = cls(location)
        t._read_metadata()  # raises if absent
        return t

    # -- metadata io -----------------------------------------------------------

    def _version_path(self, v: int) -> str:
        return os.path.join(self.meta_dir, f"v{v}.metadata.json")

    def _current_version(self) -> int:
        hint = os.path.join(self.meta_dir, "version-hint.text")
        try:
            with open(hint) as f:
                v = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            v = 0
        # the hint is advisory (spec: may lag after a crash between the
        # version publish and the hint swap) — roll forward to the latest
        # published version
        while os.path.exists(self._version_path(v + 1)):
            v += 1
        if v == 0:
            raise FileNotFoundError(f"no Iceberg table at {self.location}")
        return v

    def _read_metadata(self) -> dict:
        v = self._current_version()
        with open(self._version_path(v)) as f:
            meta = json.load(f)
        meta["__version"] = v
        return meta

    def _publish_version(self, meta: dict, expected_version: int) -> None:
        """Atomic optimistic publish of v{expected+1} (Hadoop-catalog
        protocol): create-if-absent via os.link, then swap the hint."""
        meta = {k: v for k, v in meta.items() if not k.startswith("__")}
        new_v = expected_version + 1
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        try:
            os.link(tmp, self._version_path(new_v))  # atomic, fails if exists
        except FileExistsError:
            raise CommitConflict(
                f"metadata v{new_v} already published by another writer"
            )
        finally:
            os.unlink(tmp)
        hint_tmp = os.path.join(self.meta_dir, f".hint-{uuid.uuid4().hex}")
        with open(hint_tmp, "w") as f:
            f.write(str(new_v))
        os.replace(hint_tmp, os.path.join(self.meta_dir, "version-hint.text"))

    def _commit(self, build_fn, retries: int = 10) -> dict:
        """Optimistic-concurrency commit loop: build new metadata against
        the freshest base; on CommitConflict, refresh and re-apply."""
        for _ in range(retries):
            base = self._read_metadata()
            new = build_fn(base)
            try:
                self._publish_version(new, base["__version"])
                return new
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {retries} retries")

    # -- write path --------------------------------------------------------------

    def _partition_fields(self, meta: dict) -> list[dict]:
        spec_id = meta["default-spec-id"]
        return next(
            s["fields"] for s in meta["partition-specs"] if s["spec-id"] == spec_id
        )

    @staticmethod
    def _spec_maps(meta: dict) -> dict[int, dict[str, dict]]:
        """{spec-id: {source-name: partition field}} for EVERY spec the
        table has ever had — after partition evolution a scan judges each
        file's partition values under the spec that wrote it."""
        return {
            s["spec-id"]: {f["source-name"]: f for f in s["fields"]}
            for s in meta["partition-specs"]
        }

    def _schema_fields(self, meta: dict, schema_id: int | None = None) -> list[dict]:
        sid = meta["current-schema-id"] if schema_id is None else schema_id
        for s in meta["schemas"]:
            if s["schema-id"] == sid:
                return s["fields"]
        raise ValueError(f"unknown schema-id {sid} in {self.location}")

    def _read_data_entries(
        self,
        spark: SparkSession,
        meta: dict,
        entries: list[dict],
        del_paths: list[str] | None = None,
    ) -> DataFrame:
        """Read manifest data-file ``entries`` under the CURRENT schema,
        resolving columns by field id through each file's writer schema
        (spec §Schema Evolution): renamed columns keep their values, a
        column the file predates reads as null, dropped columns vanish.
        Files are grouped by writer schema-id, so the unevolved common
        case stays ONE parquet read; position deletes fold in per group
        (the (file_path, pos) join is schema-independent)."""
        cur = self._schema_fields(meta)
        if not entries:
            return spark.createDataFrame([], _spark_ddl(cur))
        groups: dict[int, list[str]] = {}
        for d in entries:
            groups.setdefault(int(d.get("schema-id", 0)), []).append(d["file_path"])
        parts = []
        for sid in sorted(groups):
            wf = self._schema_fields(meta, sid)
            rdf = spark.read.schema(_spark_ddl(wf)).parquet(*sorted(groups[sid]))
            if del_paths:
                rdf = self._apply_position_deletes(spark, rdf, del_paths)
            proj = _projection_to_current(wf, cur)
            if proj is not None:
                rdf = rdf.select(*proj)
            parts.append(rdf)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _write_data_files(self, df: DataFrame, meta: dict) -> list[dict]:
        """Write df as parquet data files partitioned by the table's
        transform columns; return manifest data_file entries with stats.

        Data files keep ALL source columns (Iceberg semantics: partition
        values live in metadata, not carved out of the file), so the
        derived transform columns are written under ``__p_*`` directory
        names and recorded per file, never stored inside the files.
        """
        spec = self._partition_fields(meta)
        stage = os.path.join(self.data_dir, f".stage-{uuid.uuid4().hex}")
        writer = df
        pcols = []
        for pf_ in spec:
            pcol = f"__p_{pf_['name']}"
            writer = writer.withColumn(
                pcol, _transform_expr(pf_["transform"], pf_["source-name"])
            )
            pcols.append(pcol)
        if pcols:
            writer.write.partitionBy(*pcols).parquet(stage)
        else:
            writer.write.parquet(stage)
        entries = []
        for root, _dirs, files in os.walk(stage):
            part_vals = {}
            rel = os.path.relpath(root, stage)
            if rel != ".":
                for seg in rel.split(os.sep):
                    k, _, val = seg.partition("=")
                    # Spark Hive-escapes partition directory values
                    # (%XX for '=', ':', '#', ... and the null marker);
                    # the manifest must carry the RAW value or identity
                    # equality pruning silently drops matching files
                    part_vals[k.removeprefix("__p_")] = (
                        None
                        if val == "__HIVE_DEFAULT_PARTITION__"
                        else unquote(val)
                    )
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(root, fn)
                dst_name = f"{uuid.uuid4().hex}.parquet"
                if rel != ".":
                    dst_dir = os.path.join(self.data_dir, rel.replace("__p_", ""))
                else:
                    dst_dir = self.data_dir
                os.makedirs(dst_dir, exist_ok=True)
                dst = os.path.join(dst_dir, dst_name)
                os.rename(src, dst)
                entries.append(
                    {
                        "content": 0,  # data (spec v2: 0=data, 1/2=deletes)
                        "file_path": dst,
                        "file_format": "PARQUET",
                        "partition": part_vals,
                        # partition spec the values were derived under —
                        # after partition evolution, pruning must judge
                        # each file by ITS spec, not the current default
                        "spec-id": meta["default-spec-id"],
                        # writer schema: rename/drop evolution resolves
                        # columns by field id through this (entries that
                        # predate the stamp default to schema 0, which is
                        # exact for any table created before evolution)
                        "schema-id": meta["current-schema-id"],
                        **_file_stats(dst),
                    }
                )
        shutil.rmtree(stage, ignore_errors=True)
        return entries

    def _snapshot_commit(
        self,
        data_files: list[dict],
        operation: str,
        summary_extra: dict | None,
        validate=None,
        carry_manifests: bool | None = None,
    ) -> dict:
        """Write the manifest + manifest list, then run the commit loop.
        The manifest files are immutable and written once; only the
        metadata json is rebuilt on a conflict retry. ``validate``, if
        given, runs against each fresh base inside the commit loop
        (raise ``ValidationFailed`` to abort — e.g. a merge-on-read
        delete whose referenced data files were rewritten concurrently
        must not commit positions into files no reader will ever open)."""
        snap_id = uuid.uuid4().int >> 75  # 53-bit, JSON-exact
        manifest_path = os.path.join(
            self.meta_dir, f"{uuid.uuid4().hex}-m0.manifest.json"
        )
        mlist_path = os.path.join(
            self.meta_dir, f"snap-{snap_id}.manifest-list.json"
        )

        def build(base: dict) -> dict:
            tag = (summary_extra or {}).get("saber.commit-tag")
            if tag and any(
                s["summary"].get("saber.commit-tag") == tag
                for s in base["snapshots"]
            ):
                raise AlreadyCommitted(tag)
            if validate is not None:
                validate(base)
            seq = base["last-sequence-number"] + 1
            # the manifest is written INSIDE the commit loop so entries
            # carry their data sequence number (spec: equality deletes
            # apply only to rows whose data-seq is strictly lower) —
            # a retry rewrites the same not-yet-referenced file
            with open(manifest_path, "w") as f:
                json.dump(
                    [
                        {
                            "status": 1,
                            "snapshot_id": snap_id,
                            "data_file": {**d, "data-seq": seq},
                        }
                        for d in data_files
                    ],
                    f,
                )
            parent = base["current-snapshot-id"]
            now_ms = int(time.time() * 1000)
            carry = (
                operation != "overwrite"
                if carry_manifests is None
                else carry_manifests
            )
            if not carry:  # full overwrite: the new manifest IS the table
                manifests = [mlist_entry(manifest_path, snap_id, data_files)]
            else:  # append / row-delta: carry every live manifest forward
                manifests = self._manifest_list(base) + [
                    mlist_entry(manifest_path, snap_id, data_files)
                ]
            with open(mlist_path, "w") as f:
                json.dump(manifests, f)
            snap = {
                "snapshot-id": snap_id,
                "parent-snapshot-id": parent if parent != -1 else None,
                "sequence-number": seq,
                "timestamp-ms": now_ms,
                "manifest-list": mlist_path,
                "schema-id": base["current-schema-id"],
                "summary": {
                    "operation": operation,
                    # DATA entries only: delete files are tuples/positions,
                    # not rows — counting them would skew lineage() and
                    # any files-written accounting
                    "added-data-files": str(
                        len([d for d in data_files if d.get("content", 0) == 0])
                    ),
                    "added-records": str(
                        sum(
                            d["record_count"]
                            for d in data_files
                            if d.get("content", 0) == 0
                        )
                    ),
                    **(
                        {
                            "added-delete-files": str(
                                len(
                                    [
                                        d
                                        for d in data_files
                                        if d.get("content", 0) != 0
                                    ]
                                )
                            )
                        }
                        if any(d.get("content", 0) != 0 for d in data_files)
                        else {}
                    ),
                    **(summary_extra or {}),
                },
            }
            new = dict(base)
            new["snapshots"] = base["snapshots"] + [snap]
            new["snapshot-log"] = base["snapshot-log"] + [
                {"timestamp-ms": now_ms, "snapshot-id": snap_id}
            ]
            new["current-snapshot-id"] = snap_id
            new["last-sequence-number"] = seq
            new["last-updated-ms"] = now_ms
            return new

        def mlist_entry(path: str, sid: int, dfs: list[dict]) -> dict:
            return {
                "manifest_path": path,
                "manifest_length": os.path.getsize(path),
                "partition_spec_id": 0,
                "added_snapshot_id": sid,
                "added_files_count": len(dfs),
                "added_rows_count": sum(d["record_count"] for d in dfs),
                **_manifest_summary(dfs),
            }

        return self._commit(build)

    def append(self, df: DataFrame, summary_extra: dict | None = None) -> dict:
        """Commit ``df``'s rows as a new append snapshot; returns the new
        table metadata. Conflict-safe: concurrent appends both land."""
        meta = self._read_metadata()
        files = self._write_data_files(df, meta)
        return self._snapshot_commit(files, "append", summary_extra)

    def overwrite(self, df: DataFrame, summary_extra: dict | None = None) -> dict:
        """Replace the table's data with ``df`` in one atomic snapshot
        (previous snapshots stay time-travelable)."""
        meta = self._read_metadata()
        files = self._write_data_files(df, meta)
        return self._snapshot_commit(files, "overwrite", summary_extra)

    def add_files(
        self, paths: list[str], summary_extra: dict | None = None
    ) -> dict:
        """Iceberg's ``add_files`` / migrate import: commit EXISTING
        parquet files as one append snapshot without rewriting a byte —
        only footers are read (stats harvest) plus one metadata commit.
        At 100 TB this is how a parquet lake becomes an Iceberg table in
        minutes instead of a full rewrite. The files must match the
        table schema; external paths are never touched by
        ``remove_orphan_files`` (it only sweeps the table's own data
        dir), matching Iceberg's referenced-location semantics.
        Unpartitioned specs only — partition values would need to be
        supplied per file (spec add_files does this via the source
        layout; not needed here)."""
        meta = self._read_metadata()
        if self._partition_fields(meta):
            raise ValueError("add_files requires an unpartitioned spec")
        entries = [
            {
                "content": 0,
                "file_path": p,
                "file_format": "PARQUET",
                "partition": {},
                "spec-id": meta["default-spec-id"],
                # imported files match the CURRENT schema by contract —
                # stamp it, or a later rename would resolve them through
                # schema 0 and silently null the renamed columns
                "schema-id": meta["current-schema-id"],
                **_file_stats(p),
            }
            for p in paths
        ]
        return self._snapshot_commit(entries, "append", summary_extra)

    # -- copy-on-write row-level operations (spec §Row-level deletes; this
    # implementation takes the copy-on-write path Iceberg v1 engines use:
    # affected data files are rewritten without the target rows and swapped
    # atomically in one snapshot — readers never see a torn state) ---------

    def _live_files(self, meta: dict) -> dict[str, dict]:
        """path -> data_file for every live file of the CURRENT snapshot
        of ``meta`` (recomputed inside commit retries so concurrent
        appends are carried forward, not lost)."""
        live: dict[str, dict] = {}
        for m in self._manifest_list(meta):
            for entry in _read_json_immutable(m["manifest_path"]):
                if entry["status"] != 2:
                    live[entry["data_file"]["file_path"]] = entry["data_file"]
        return live

    def _rewrite_commit(
        self,
        new_files: list[dict],
        removed_paths: set[str],
        operation: str,
        summary_extra: dict | None = None,
        known_delete_paths: set[str] | None = None,
        meta_update=None,
    ) -> dict:
        """Commit that replaces ``removed_paths`` with ``new_files`` and
        carries every other live file forward. Concurrent appends merge
        cleanly (carried set is recomputed against the fresh base each
        retry); a concurrent rewrite of one of OUR input files raises
        ``ValidationFailed`` — the rows we rewrote were derived from a
        file that no longer speaks for the table."""
        snap_id = uuid.uuid4().int >> 75

        def build(base: dict) -> dict:
            tag = (summary_extra or {}).get("saber.commit-tag")
            if tag and any(
                s["summary"].get("saber.commit-tag") == tag
                for s in base["snapshots"]
            ):
                raise AlreadyCommitted(tag)
            live = self._live_files(base)
            missing = removed_paths - set(live)
            if missing:
                raise ValidationFailed(
                    f"input files rewritten/removed concurrently: {sorted(missing)[:3]}"
                )
            carried = []
            for p, d in live.items():
                if p in removed_paths:
                    continue
                if d.get("content", 0) == 2:
                    if (
                        known_delete_paths is not None
                        and p not in known_delete_paths
                        and any(
                            self._data_seq(live[r]) < self._data_seq(d)
                            for r in removed_paths
                            if r in live
                        )
                    ):
                        # an equality delete landed on rows we rewrote
                        # AFTER we read them — our new files get a higher
                        # data-seq, so the delete would silently stop
                        # applying to those rows. Fail and retry.
                        raise ValidationFailed(
                            f"concurrent equality delete {p} applies to "
                            "files being rewritten — retry the rewrite"
                        )
                    carried.append(d)
                    continue
                if d.get("content", 0) == 1:
                    if (
                        known_delete_paths is not None
                        and p not in known_delete_paths
                        and set(d.get("referenced_data_files", [])) & removed_paths
                    ):
                        # delete-conflict validation (what real Iceberg's
                        # rewrite validation does): a merge-on-read delete
                        # landed on one of OUR input files AFTER we read
                        # it — our rewritten rows predate that delete, so
                        # dropping/trimming it would resurrect rows.
                        # Fail the rewrite; the caller re-reads and
                        # retries against the fresh state.
                        raise ValidationFailed(
                            f"concurrent merge-on-read delete {p} targets "
                            "files being rewritten — retry the rewrite"
                        )
                    # position deletes name (file, pos) pairs in IMMUTABLE
                    # files — once a referenced data file is rewritten
                    # (deletes applied by the delete-aware read), its
                    # delete rows are obsolete: drop the delete file when
                    # every target was rewritten, trim it when only some
                    d = self._trim_delete_entry(d, removed_paths)
                    if d is None:
                        continue
                carried.append(d)
            # retire equality deletes no remaining data file is older
            # than (every target rewritten with the delete applied) —
            # the equality analogue of _trim_delete_entry's drop case
            min_data_seq = min(
                (
                    self._data_seq(d)
                    for d in carried
                    if d.get("content", 0) == 0
                ),
                default=None,
            )
            carried = [
                d
                for d in carried
                if d.get("content", 0) != 2
                or (
                    min_data_seq is not None
                    and self._data_seq(d) > min_data_seq
                )
            ]
            seq = base["last-sequence-number"] + 1
            # new files stamp the rewrite's own data-seq; carried files
            # KEEP theirs (a compaction's rewritten rows already had the
            # live deletes applied, so the fresh seq is exactly right —
            # older equality deletes must not re-apply to them)
            manifest_path = os.path.join(
                self.meta_dir, f"{uuid.uuid4().hex}-m0.manifest.json"
            )
            with open(manifest_path, "w") as f:
                json.dump(
                    [
                        {"status": 0, "snapshot_id": snap_id, "data_file": d}
                        for d in carried
                    ]
                    + [
                        {
                            "status": 1,
                            "snapshot_id": snap_id,
                            "data_file": {**d, "data-seq": seq},
                        }
                        for d in new_files
                    ],
                    f,
                )
            mlist_path = os.path.join(
                self.meta_dir, f"snap-{snap_id}.manifest-list.json"
            )
            all_files = carried + new_files
            with open(mlist_path, "w") as f:
                json.dump(
                    [
                        {
                            "manifest_path": manifest_path,
                            "manifest_length": os.path.getsize(manifest_path),
                            "partition_spec_id": 0,
                            "added_snapshot_id": snap_id,
                            "added_files_count": len(new_files),
                            "added_rows_count": sum(
                                d["record_count"] for d in new_files
                            ),
                            **_manifest_summary(all_files),
                        }
                    ],
                    f,
                )
            now_ms = int(time.time() * 1000)
            parent = base["current-snapshot-id"]
            snap = {
                "snapshot-id": snap_id,
                "parent-snapshot-id": parent if parent != -1 else None,
                "sequence-number": seq,
                "timestamp-ms": now_ms,
                "manifest-list": mlist_path,
                "schema-id": base["current-schema-id"],
                "summary": {
                    "operation": operation,
                    "added-data-files": str(len(new_files)),
                    "added-records": str(
                        sum(d["record_count"] for d in new_files)
                    ),
                    "deleted-data-files": str(len(removed_paths)),
                    "deleted-records": str(
                        sum(
                            live[p]["record_count"] for p in removed_paths
                        )
                    ),
                    "total-records": str(
                        sum(d["record_count"] for d in all_files)
                    ),
                    **(summary_extra or {}),
                },
            }
            new = dict(base)
            new["snapshots"] = base["snapshots"] + [snap]
            new["snapshot-log"] = base["snapshot-log"] + [
                {"timestamp-ms": now_ms, "snapshot-id": snap_id}
            ]
            new["current-snapshot-id"] = snap_id
            new["last-sequence-number"] = seq
            new["last-updated-ms"] = now_ms
            if meta_update is not None:
                # table-level metadata riding the same atomic commit
                # (e.g. the sort order a clustering rewrite establishes)
                meta_update(new)
            return new

        return self._commit(build)

    @staticmethod
    def _pos_delete_frame(spark: SparkSession, paths: list[str]) -> DataFrame:
        """The (file, position) delete set as a joinable frame — shared
        by every position-delete anti-join site."""
        return spark.read.parquet(*sorted(paths)).select(
            F.col("file_path").alias("_del_fp"),
            F.col("pos").alias("_del_pos"),
        )

    @staticmethod
    def _apply_position_deletes(
        spark: SparkSession, df: DataFrame, delete_paths: list[str]
    ) -> DataFrame:
        """Merge-on-read: drop rows named by position-delete files. The
        scan exposes (_metadata.file_path, _metadata.row_index) and
        left-anti-joins the (file_path, pos) delete set — positions are
        row indices in the ORIGINAL immutable file, so the join is exact
        at any parallelism. AQE broadcasts the (typically tiny) delete
        side; zero overhead when no delete files exist (caller skips)."""
        dels = IcebergTable._pos_delete_frame(spark, delete_paths)
        fp = F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
        cols = df.columns
        return (
            df.withColumn("_fp", fp)
            .withColumn("_pos", F.col("_metadata.row_index"))
            .join(
                dels,
                (F.col("_fp") == F.col("_del_fp"))
                & (F.col("_pos") == F.col("_del_pos")),
                "left_anti",
            )
            .select(*cols)
        )

    def _trim_delete_entry(self, d: dict, removed_paths: set) -> dict | None:
        """Carry logic for a position-delete entry when ``removed_paths``
        data files leave the table: None if every referenced target was
        removed (the whole delete file is obsolete); a NEW trimmed delete
        file/entry if only some were; ``d`` unchanged if none were.
        Delete files are small (they carry positions, not rows), so the
        trim is a driver-side pyarrow filter."""
        refs = set(d.get("referenced_data_files", []))
        if not refs & removed_paths:
            return d
        if refs <= removed_paths:
            return None
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(d["file_path"])
        keep = pc.invert(
            pc.is_in(t.column("file_path"), value_set=pa.array(sorted(removed_paths)))
        )
        trimmed = t.filter(keep)
        dst = os.path.join(self.data_dir, f"delete-{uuid.uuid4().hex}.parquet")
        pq.write_table(trimmed, dst)
        return {
            **d,
            "file_path": dst,
            "referenced_data_files": sorted(refs - removed_paths),
            **_file_stats(dst),
        }

    def _read_paths(
        self,
        spark: SparkSession,
        meta: dict,
        paths: list[str],
        apply_deletes: bool = True,
        live: dict | None = None,
    ) -> DataFrame:
        """Read data files at ``paths`` under the current schema, with
        live position deletes applied by default — every row-level
        operation that rewrites files MUST see the merge-on-read view,
        or a copy-on-write rewrite would resurrect MoR-deleted rows.
        Columns resolve by field id via each file's writer schema (see
        _read_data_entries), so rename/drop evolution is rewrite-safe.
        Callers that already hold ``_live_files(meta)`` pass it via
        ``live`` to avoid a second full manifest walk."""
        if not paths:
            return spark.createDataFrame([], _spark_ddl(self._schema_fields(meta)))
        if live is None:
            live = self._live_files(meta)
        entries = [live.get(p, {"file_path": p}) for p in paths]
        del_paths = None
        eq_entries: list[dict] = []
        if apply_deletes:
            del_paths = [
                d["file_path"]
                for d in live.values()
                if d.get("content", 0) == 1
            ]
            eq_entries = [
                d for d in live.values() if d.get("content", 0) == 2
            ]
        return self._read_with_all_deletes(
            spark, meta, entries, del_paths or None, eq_entries
        )

    def delete_where(
        self,
        spark: SparkSession,
        filters: list[tuple],
        mode: str = "copy-on-write",
    ) -> dict:
        """``DELETE FROM t WHERE <conj>``. Only files whose partition
        values / column bounds ADMIT a match participate (same pruning
        as ``scan``) — at 100 TB a targeted delete touches a handful of
        files, not the table. Rows where the predicate is NULL are kept
        (SQL DELETE semantics).

        ``mode='copy-on-write'`` (spec v1 engines): affected files are
        rewritten without the target rows and swapped atomically —
        write-heavy, read-free. ``mode='merge-on-read'`` (spec v2
        position deletes): the matching (file_path, pos) pairs are
        written as a position-delete file and committed WITHOUT touching
        any data file — a delete costs one small write no matter how big
        the affected files are; readers fold the deletes in (``scan``/
        the DataSource), and ``rewrite_data_files`` compacts them away.
        The right default is COW for broad deletes (read amplification
        ∝ accumulated deletes) and MoR for frequent targeted deletes
        (write amplification ∝ file size); BENCH/ICEBERG.md measures
        both sides of that trade."""
        if mode not in ("copy-on-write", "merge-on-read"):
            raise ValueError(f"unknown delete mode {mode!r}")
        meta = self._read_metadata()
        # plan under the SAME pinned metadata used by the rewrite below:
        # a concurrent append committing between the two reads would
        # otherwise land in ``affected`` but miss from meta's live set,
        # and _read_paths would resolve it under schema-id 0 — nulling
        # renamed columns in the persisted rewrite
        affected = self.files(filters=filters, meta=meta)
        if not affected:
            return meta
        paths = {d["file_path"] for d in affected}
        pred = None
        for col, op, val in filters:
            ops = {"=": "==", "<": "<", "<=": "<=", ">": ">", ">=": ">="}
            lit = json.dumps(val) if isinstance(val, str) else val
            c = F.expr(f"`{col}` {ops[op]} {lit}")
            pred = c if pred is None else (pred & c)
        if mode == "merge-on-read":
            entries = self._write_position_deletes(spark, meta, sorted(paths), pred)
            if not entries:
                return meta  # bounds admitted a match but no row matched
            refs = {
                p for e in entries for p in e.get("referenced_data_files", [])
            }

            def _targets_still_live(base: dict) -> None:
                live_data = {
                    p
                    for p, d in self._live_files(base).items()
                    if d.get("content", 0) == 0
                }
                gone = refs - live_data
                if gone:
                    # a concurrent rewrite replaced files we computed
                    # positions against — committing would silently lose
                    # this delete (positions point into dead files)
                    raise ValidationFailed(
                        f"merge-on-read delete targets rewritten files: "
                        f"{sorted(gone)[:3]} — re-run the delete"
                    )

            return self._snapshot_commit(
                entries,
                "delete",
                {"saber.delete-mode": "merge-on-read"},
                validate=_targets_still_live,
            )
        all_live = self._live_files(meta)
        known_dels = {
            p
            for p, d in all_live.items()
            if d.get("content", 0) in (1, 2)
        }
        keep = self._read_paths(spark, meta, sorted(paths), live=all_live).where(
            ~F.coalesce(pred, F.lit(False))
        )
        new_files = self._write_data_files(keep, meta)
        return self._rewrite_commit(
            new_files, paths, "delete", known_delete_paths=known_dels
        )

    def _write_position_deletes(
        self, spark: SparkSession, meta: dict, paths: list[str], pred
    ) -> list[dict]:
        """Write (file_path, pos) position-delete parquet for every row in
        ``paths`` matching ``pred`` (spec v2 §Position Delete Files: rows
        sorted by file_path then pos). Positions already deleted by LIVE
        delete files are excluded so repeated MoR deletes stay disjoint
        and the summary counts stay truthful. Each manifest entry records
        ``referenced_data_files`` so rewrites can drop or trim delete
        files whose targets were rewritten."""
        import pyarrow.parquet as pq

        # the predicate names CURRENT columns, but each file stores its
        # WRITER schema's names — evaluate per writer-schema group on the
        # field-id-resolved view (same resolution as _read_data_entries),
        # keeping (_metadata.file_path, row_index) through the projection
        fp = F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
        live = self._live_files(meta)
        cur = self._schema_fields(meta)
        groups: dict[int, list[str]] = {}
        for p in paths:
            sid = int(live.get(p, {}).get("schema-id", 0))
            groups.setdefault(sid, []).append(p)
        hit_parts = []
        for sid in sorted(groups):
            wf = self._schema_fields(meta, sid)
            rdf = (
                spark.read.schema(_spark_ddl(wf))
                .parquet(*sorted(groups[sid]))
                .withColumn("__fp", fp)
                .withColumn("__pos", F.col("_metadata.row_index"))
            )
            proj = _projection_to_current(wf, cur)
            if proj is not None:
                rdf = rdf.select(*proj, F.col("__fp"), F.col("__pos"))
            hit_parts.append(
                rdf.where(F.coalesce(pred, F.lit(False))).select(
                    F.col("__fp").alias("file_path"),
                    F.col("__pos").alias("pos"),
                )
            )
        hits = hit_parts[0]
        for h in hit_parts[1:]:
            hits = hits.unionByName(h)
        live_dels = [
            d["file_path"]
            for d in live.values()
            if d.get("content", 0) == 1
        ]
        if live_dels:
            prior = spark.read.parquet(*live_dels).select("file_path", "pos")
            hits = hits.join(prior, ["file_path", "pos"], "left_anti")
        stage = os.path.join(self.data_dir, f".stage-del-{uuid.uuid4().hex}")
        hits.coalesce(1).sortWithinPartitions("file_path", "pos").write.parquet(stage)
        entries = []
        for root, _dirs, files in os.walk(stage):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(root, fn)
                if pq.ParquetFile(src).metadata.num_rows == 0:
                    continue
                dst = os.path.join(
                    self.data_dir, f"delete-{uuid.uuid4().hex}.parquet"
                )
                os.rename(src, dst)
                refs = sorted(
                    pq.read_table(dst, columns=["file_path"])
                    .column("file_path")
                    .unique()
                    .to_pylist()
                )
                entries.append(
                    {
                        "content": 1,  # spec v2: position deletes
                        "file_path": dst,
                        "file_format": "PARQUET",
                        "partition": {},
                        "referenced_data_files": refs,
                        **_file_stats(dst),
                    }
                )
        shutil.rmtree(stage, ignore_errors=True)
        return entries

    def delete_by_equality(
        self,
        spark: SparkSession,
        keys: DataFrame,
        cols: list[str] | None = None,
        summary_extra: dict | None = None,
    ) -> dict:
        """Merge-on-read DELETE by column VALUES (spec v2 equality-delete
        files, content=2): commit one small parquet of key tuples; a data
        row is deleted iff it null-safe-matches any tuple AND its file's
        data sequence number is strictly LOWER than the delete's —
        later-appended rows with the same keys are untouched, which is
        what makes this the upsert primitive: append new rows + equality-
        delete their keys = an upsert whose write cost is O(batch), not
        O(affected data files) (contrast ``merge_into``'s copy-on-write
        rewrite and ``delete_where(mode='merge-on-read')``'s position
        deletes, which must first FIND the positions by reading the
        data). Readers fold the tuples in as a broadcast null-safe
        anti-join; ``rewrite_data_files`` applies and retires them.

        ``keys``: DataFrame of the delete tuples (deduplicated here);
        ``cols`` defaults to all of its columns. The columns are recorded
        by FIELD ID, so later renames keep the delete valid; dropping a
        referenced column is refused while the delete is live."""
        meta = self._read_metadata()
        entry = self._write_equality_delete_file(keys, cols, meta)
        if entry is None:
            return meta  # zero tuples: a no-op must not poison readers
        return self._snapshot_commit(
            [entry],
            "delete",
            {"saber.delete-mode": "merge-on-read-equality",
             **(summary_extra or {})},
        )

    def upsert_by_key(
        self,
        spark: SparkSession,
        df: DataFrame,
        key_cols: list[str],
        summary_extra: dict | None = None,
    ) -> dict:
        """Merge-on-read UPSERT in ONE atomic snapshot: the batch's rows
        as new data files plus an equality-delete of their key tuples,
        committed together. Both carry the SAME data sequence number and
        equality deletes apply only to STRICTLY lower sequences, so the
        delete retires every pre-existing row with a matching key while
        the batch's own rows are untouched — ``merge_into`` semantics at
        O(batch) write cost instead of a copy-on-write rewrite of every
        affected data file. Read amplification accrues instead (each
        scan anti-joins the accumulated tuples) until
        ``rewrite_data_files`` applies and retires them — the standard
        MoR trade, now available on the upsert path; the streaming sink
        exposes it as ``merge_mode='mor'``."""
        if not key_cols:
            raise ValueError("upsert_by_key: key_cols must be non-empty")
        meta = self._read_metadata()
        # one evaluation of the input: the key tuples and the data files
        # must come from the SAME rows, or a non-deterministic source
        # could delete keys it never re-inserts (or vice versa)
        df = df.persist()
        try:
            # MERGE semantics for NULL keys: SQL MERGE's equality ON
            # never matches NULLs, so a null-key row always inserts and
            # never retires prior null-key rows — drop null-key tuples
            # from the delete (delete_by_equality stays null-safe: a
            # DELETE by value is a different contract)
            key_pred = None
            for k in key_cols:
                c = F.col(k).isNotNull()
                key_pred = c if key_pred is None else (key_pred & c)
            eq_entry = self._write_equality_delete_file(
                df.select(*key_cols).where(key_pred), key_cols, meta
            )
            data_entries = self._write_data_files(df, meta)
        finally:
            df.unpersist()
        if not data_entries and eq_entry is None:
            return meta  # empty batch: nothing to commit
        return self._snapshot_commit(
            data_entries + ([eq_entry] if eq_entry is not None else []),
            "overwrite",  # the spec's row-delta operation label
            {"saber.delete-mode": "merge-on-read-equality",
             **(summary_extra or {})},
            carry_manifests=True,
        )

    def _write_equality_delete_file(
        self, keys: DataFrame, cols: list[str] | None, meta: dict
    ) -> dict | None:
        cols = list(cols or keys.columns)
        by_name = {f["name"]: f["id"] for f in self._schema_fields(meta)}
        missing = [c for c in cols if c not in by_name]
        if missing:
            raise ValueError(
                f"equality delete: columns {missing} not in the "
                f"current schema ({sorted(by_name)})"
            )
        if not cols:
            raise ValueError("equality delete: needs at least one column")
        stage = os.path.join(self.data_dir, f".stage-eq-{uuid.uuid4().hex}")
        keys.select(*cols).distinct().coalesce(1).write.parquet(stage)
        dst = os.path.join(self.data_dir, f"eqdelete-{uuid.uuid4().hex}.parquet")
        part = next(
            os.path.join(stage, fn)
            for fn in os.listdir(stage)
            if fn.endswith(".parquet")
        )
        os.rename(part, dst)
        shutil.rmtree(stage, ignore_errors=True)
        stats = _file_stats(dst)
        if stats["record_count"] == 0:
            os.remove(dst)  # zero tuples delete nothing — skip (the
            return None  # position-delete writer has the same rule)
        return {
            "content": 2,  # spec v2: equality deletes
            "file_path": dst,
            "file_format": "PARQUET",
            "partition": {},
            "equality-ids": [by_name[c] for c in cols],
            "schema-id": meta["current-schema-id"],
            **stats,
        }

    def equality_delete_files(self, snapshot_id=None, as_of_ms=None) -> list[dict]:
        """Live EQUALITY-DELETE files (spec v2 content=2) of one snapshot."""
        return [
            d
            for d in self._live_entries(snapshot_id, as_of_ms)
            if d.get("content", 0) == 2
        ]

    @staticmethod
    def _data_seq(d: dict) -> int:
        # entries predating the stamp read as oldest (seq 0): every
        # equality delete applies — conservative for pre-existing tables
        return int(d.get("data-seq", 0))

    def _read_with_all_deletes(
        self,
        spark: SparkSession,
        meta: dict,
        file_entries: list[dict],
        pos_del_paths: list[str] | None,
        eq_entries: list[dict],
        keep_addr: bool = False,
    ) -> DataFrame:
        """The full merge-on-read view in ONE pass over the data: every
        file is read once with its row address kept, position deletes
        anti-join on (file, pos), and equality deletes anti-join with
        the data-sequence rule folded INTO the join condition — each
        row carries its file's data-seq (broadcast path→seq map), each
        delete tuple carries its own seq, and the null-safe key match
        requires ``tuple_seq > row_seq``. One anti-join per distinct
        equality-id set, never a per-sequence-class re-read of the
        corpus. Field ids resolve through each delete file's writer
        schema, so renames after the delete keep matching.
        ``keep_addr``: also return the ``(_fp, _pos, _fseq)`` row
        address columns (the changelog's eq-delete resolution needs
        them; plain scans drop them)."""
        if not eq_entries and not keep_addr:
            return self._read_data_entries(
                spark, meta, file_entries, pos_del_paths
            )
        cols = [f["name"] for f in self._schema_fields(meta)]
        df = self._read_entries_with_pos(spark, meta, file_entries)
        if pos_del_paths:
            pdels = self._pos_delete_frame(spark, pos_del_paths)
            df = df.join(
                F.broadcast(pdels),
                (F.col("_fp") == F.col("_del_fp"))
                & (F.col("_pos") == F.col("_del_pos")),
                "left_anti",
            )
        seq_df = spark.createDataFrame(
            [(e["file_path"], self._data_seq(e)) for e in file_entries],
            "_sq_fp string, _fseq long",
        )
        df = df.join(
            F.broadcast(seq_df), F.col("_fp") == F.col("_sq_fp"), "left"
        ).drop("_sq_fp")
        for ids, cond, dels in self._eq_tuple_frames(spark, meta, eq_entries):
            df = df.join(F.broadcast(dels), cond, "left_anti")
        if keep_addr:
            return df.select(*cols, "_fp", "_pos", "_fseq")
        return df.select(*cols)

    def _eq_tuple_frames(
        self, spark: SparkSession, meta: dict, eq_entries: list[dict]
    ):
        """Per (equality-id set, writer schema) group: the tuple frame
        (columns ``_eq_<id>…`` + each tuple's ``_eqseq``) and the join
        condition against a row frame that carries ``_fseq`` — ONE
        parquet read per group however many delta files have accrued
        (a per-file read+union would grow the plan linearly with every
        mor-mode micro-batch); each tuple's own seq attaches via a
        broadcast path→seq map. Yields (ids, condition, frame)."""
        cur_by_id = {f["id"]: f["name"] for f in self._schema_fields(meta)}
        groups: dict[tuple, list[dict]] = {}
        for e in eq_entries:
            key = (
                tuple(sorted(e["equality-ids"])),
                int(e.get("schema-id", 0)),
            )
            groups.setdefault(key, []).append(e)
        for (ids, sid), entries in groups.items():
            missing = [i for i in ids if i not in cur_by_id]
            if missing:
                raise ValueError(
                    f"equality delete references dropped field ids {missing}"
                )
            wf = {
                f["id"]: f["name"]
                for f in self._schema_fields(meta, sid)
            }
            fp = F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/+", "/"
            )
            raw = spark.read.parquet(
                *sorted(e["file_path"] for e in entries)
            ).select(
                *[F.col(wf[i]).alias(f"_eq_{i}") for i in ids],
                fp.alias("_eq_fp"),
            )
            eq_seq = spark.createDataFrame(
                [(e["file_path"], self._data_seq(e)) for e in entries],
                "_eqs_fp string, _eqseq long",
            )
            dels = raw.join(
                F.broadcast(eq_seq),
                F.col("_eq_fp") == F.col("_eqs_fp"),
                "inner",
            ).drop("_eq_fp", "_eqs_fp").distinct()
            cond = F.col("_eqseq") > F.col("_fseq")
            for i in ids:
                cond = cond & F.col(cur_by_id[i]).eqNullSafe(F.col(f"_eq_{i}"))
            yield ids, cond, dels

    def merge_into(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        summary_extra: dict | None = None,
        delete_condition: str | None = None,
    ) -> dict:
        """``MERGE INTO t USING source ON keys WHEN MATCHED THEN UPDATE
        WHEN NOT MATCHED THEN INSERT`` (full-row upsert), copy-on-write:
        files whose bounds on ``key_cols[0]`` cannot contain any source
        key are carried untouched; affected files are rewritten as
        (target ANTI JOIN source) ∪ source. One atomic snapshot.

        ``delete_condition`` (a SQL boolean over the source columns) adds
        the ``WHEN MATCHED AND <cond> THEN DELETE`` arm: source rows
        satisfying it still knock out their matching target rows via the
        anti-join but are NOT re-inserted — an upsert and its sibling
        deletes land in the SAME atomic snapshot (the exactly-once MV
        fold needs both or neither applied on replay)."""
        meta = self._read_metadata()
        cols = [
            f["name"]
            for f in next(
                s
                for s in meta["schemas"]
                if s["schema-id"] == meta["current-schema-id"]
            )["fields"]
        ]
        # one evaluation of the source: the bounds probe, the empty
        # check, the survivors anti-join and the inserts must all see
        # the SAME rows — a non-deterministic source re-evaluated per
        # branch could delete target rows whose keys it never re-inserts
        # (same hazard upsert_by_key pins with persist)
        source = source.select(*cols).persist()
        try:
            return self._merge_into_pinned(
                spark, source, key_cols, meta, summary_extra, delete_condition
            )
        finally:
            source.unpersist()

    def _merge_into_pinned(
        self, spark, source, key_cols, meta, summary_extra, delete_condition
    ) -> dict:
        cols = [f.name for f in source.schema.fields]
        k0 = key_cols[0]
        bounds = source.agg(
            F.min(k0).alias("lo"), F.max(k0).alias("hi")
        ).collect()[0]
        if bounds["lo"] is None and source.isEmpty():
            # empty source: MERGE is the identity — bail out before the
            # no-bounds path below rewrites every live file for nothing.
            # Return the CURRENT metadata dict like every other commit
            # path (a snapshot-shaped return would KeyError callers
            # reading metadata keys exactly and only on empty batches).
            return meta
        all_live = self._live_files(meta)
        known_dels = {
            p
            for p, d in all_live.items()
            if d.get("content", 0) in (1, 2)
        }
        live = [d for d in all_live.values() if d.get("content", 0) == 0]
        affected, carried_n = [], 0
        nmaps = _bound_name_maps(meta)
        for d in live:
            # resolve the key's bound name through the file's writer
            # schema — a rename chain must not let stale bounds carry a
            # file that actually holds matching keys (missed update)
            bk = nmaps.get(int(d.get("schema-id", 0)), {}).get(k0)
            lo = None if bk is None else d["lower_bounds"].get(bk)
            hi = None if bk is None else d["upper_bounds"].get(bk)
            if (
                lo is not None
                and hi is not None
                and bounds["lo"] is not None
                and type(lo) is type(bounds["lo"])
                and (hi < bounds["lo"] or lo > bounds["hi"])
            ):
                carried_n += 1
                continue
            affected.append(d["file_path"])
        target = self._read_paths(spark, meta, sorted(affected), live=all_live)
        survivors = target.join(source, on=key_cols, how="left_anti").select(*cols)
        # SQL MERGE's `WHEN MATCHED AND cond THEN DELETE` does NOT fire on a
        # NULL condition — coalesce keeps such rows on the upsert arm
        # (bare NOT(NULL) is NULL, which would silently drop them)
        inserts = (
            source.where(f"NOT coalesce(({delete_condition}), false)")
            if delete_condition is not None
            else source
        )
        new_files = self._write_data_files(survivors.unionByName(inserts), meta)
        return self._rewrite_commit(
            new_files, set(affected), "overwrite", summary_extra,
            known_delete_paths=known_dels,
        )

    def rewrite_data_files(
        self,
        spark: SparkSession,
        target_file_size_bytes: int = 128 * 1024 * 1024,
        min_input_files: int = 2,
    ) -> dict | None:
        """Bin-pack compaction (the RewriteDataFiles maintenance action):
        coalesce files smaller than half the target into
        ⌈total/target⌉-file rewrites, committed as a ``replace``
        snapshot — row content is untouched (incremental consumers skip
        non-append snapshots, so compaction never re-emits rows). This is
        the antidote to streaming sinks accreting one small file per
        micro-batch. ALSO FOLDS POSITION DELETES: any data file a live
        merge-on-read delete references joins the rewrite input, the
        delete-aware read applies the deletes, and the obsolete delete
        entries drop out in the commit — bounding MoR read amplification
        the way Iceberg's RewriteDataFiles+RewritePositionDeleteFiles
        maintenance pair does. Returns None if there is nothing worth
        compacting."""
        meta = self._read_metadata()
        live = self._live_files(meta)
        deletes = [
            d for d in live.values() if d.get("content", 0) in (1, 2)
        ]
        del_targets = {
            p for d in deletes for p in d.get("referenced_data_files", [])
        }
        # an equality delete targets every data file with a LOWER data
        # sequence — those files must join the rewrite input or the
        # delete can never retire (big files would otherwise never
        # qualify and the guarded reader paths would stay blocked)
        max_eq_seq = max(
            (
                self._data_seq(d)
                for d in deletes
                if d.get("content", 0) == 2
            ),
            default=None,
        )
        small = [
            d
            for d in live.values()
            if d.get("content", 0) == 0
            and (
                d["file_size_in_bytes"] < target_file_size_bytes // 2
                or d["file_path"] in del_targets
                or (
                    max_eq_seq is not None
                    and self._data_seq(d) < max_eq_seq
                )
            )
        ]
        if len(small) < min_input_files and not (
            small and (del_targets or max_eq_seq is not None)
        ):
            return None
        total = sum(d["file_size_in_bytes"] for d in small)
        n_out = max(1, -(-total // target_file_size_bytes))
        df = self._read_paths(
            spark, meta, sorted(d["file_path"] for d in small), live=live
        ).repartition(n_out)
        new_files = self._write_data_files(df, meta)
        return self._rewrite_commit(
            new_files, {d["file_path"] for d in small}, "replace",
            known_delete_paths={d["file_path"] for d in deletes},
        )

    def compact_if_needed(
        self,
        spark: SparkSession,
        max_delete_files: int = 8,
        max_delete_rows: int = 100_000,
        **rewrite_kwargs,
    ) -> dict | None:
        """Auto-compaction trigger bounding merge-on-read read
        amplification: every scan anti-joins the ACCUMULATED equality-
        delete tuples and folds the accumulated position deletes, so scan
        cost grows with each MoR upsert/delete until a rewrite retires
        them (scan-cost curve measured in BENCH/ICEBERG.md
        §delete-accumulation). This checks the CURRENT snapshot's live
        delete entries — a metadata-only read — and runs
        ``rewrite_data_files`` only when either threshold is exceeded:
        ``max_delete_files`` (delete FILE count — each adds a per-scan
        join/fold) or ``max_delete_rows`` (total delete-row count — the
        anti-join's build side). Returns the rewrite result, or None
        while under both thresholds (the common, free case). Callers on
        a write loop — e.g. a MoR streaming sink — invoke it after each
        commit; Iceberg proper ships the same policy as table properties
        driving RewriteDataFiles scheduling."""
        meta = self._read_metadata()
        dels = [
            d
            for d in self._live_files(meta).values()
            if d.get("content", 0) in (1, 2)
        ]
        if (
            len(dels) <= max_delete_files
            and sum(d.get("record_count", 0) for d in dels) <= max_delete_rows
        ):
            return None
        return self.rewrite_data_files(spark, **rewrite_kwargs)

    def rewrite_sorted(
        self,
        spark: SparkSession,
        by: list[str],
        target_file_size_bytes: int = 128 * 1024 * 1024,
    ) -> dict | None:
        """Sort-order rewrite — RewriteDataFiles with the SORT strategy
        (clustering): read every live data file through the merge-on-read
        view, range-partition the whole table by ``by``, sort within
        partitions, rewrite, and commit one ``replace`` snapshot that
        also records the order under ``sort-orders`` /
        ``default-sort-order-id`` (spec §Sort Orders).

        This is the data-LAYOUT lever behind the stats pruning in
        ``files(filters=…)``: after clustering, per-file min/max bounds
        on the sort columns are tight and non-overlapping (ranges are
        disjoint by construction), so a selective range predicate prunes
        to ~the files that actually hold matching rows instead of every
        file whose accidental bounds straddle the literal. At 100 TB the
        scan cost of `ts`-range / `conv_id`-prefix queries is decided
        here, not in the reader. Incremental/streaming consumers skip it
        like any compaction ('replace' rewrites bytes, never rows), and
        folded position deletes drop out of the metadata exactly as in
        ``rewrite_data_files``. Returns None on an empty table.

        Reference analogue: none (Saber holds no tables) — this is table
        maintenance for the Iceberg layer the north_rule adds."""
        meta = self._read_metadata()
        names = {f["name"]: f["id"] for f in self._schema_fields(meta)}
        missing = [c for c in by if c not in names]
        if missing:
            raise ValueError(
                f"rewrite_sorted: sort columns {missing} not in the "
                f"current schema ({sorted(names)})"
            )
        live = self._live_files(meta)
        data = [d for d in live.values() if d.get("content", 0) == 0]
        deletes = {
            p for p, d in live.items() if d.get("content", 0) in (1, 2)
        }
        if not data:
            return None
        total = sum(d["file_size_in_bytes"] for d in data)
        n_out = max(1, -(-total // target_file_size_bytes))
        df = (
            self._read_paths(
                spark, meta, sorted(d["file_path"] for d in data), live=live
            )
            .repartitionByRange(n_out, *by)
            .sortWithinPartitions(*by)
        )
        new_files = self._write_data_files(df, meta)

        def record_sort_order(new: dict) -> None:
            orders = new.get("sort-orders", [{"order-id": 0, "fields": []}])
            oid = max(o["order-id"] for o in orders) + 1
            new["sort-orders"] = orders + [
                {
                    "order-id": oid,
                    "fields": [
                        {
                            "transform": "identity",
                            "source-id": names[c],
                            "direction": "asc",
                            "null-order": "nulls-first",
                        }
                        for c in by
                    ],
                }
            ]
            new["default-sort-order-id"] = oid

        return self._rewrite_commit(
            new_files,
            {d["file_path"] for d in data},
            "replace",
            summary_extra={"saber.sort-by": ",".join(by)},
            known_delete_paths=deletes,
            meta_update=record_sort_order,
        )

    def rewrite_zorder(
        self,
        spark: SparkSession,
        by: list[str],
        bits: int = 6,
        target_file_size_bytes: int = 128 * 1024 * 1024,
    ) -> dict | None:
        """Z-order clustering rewrite — RewriteDataFiles with the ZORDER
        strategy. Linear sort (``rewrite_sorted``) gives tight per-file
        bounds on the FIRST sort column and accidental bounds on the
        rest; interleaving the bit patterns of per-column bucket ids
        orders the table along a space-filling curve, so per-file min/max
        bounds stay tight on EVERY z-column at once and
        ``files(filters=…)`` prunes multi-column predicates that a linear
        order cannot. BENCH/ICEBERG.md measures the difference.

        Scale design: per-column bucket ids come from ONE distributed
        pass — numeric/timestamp columns bucket by ``approxQuantile``
        boundaries (2^bits-1 cuts, so skew cannot collapse the curve;
        the boundary search is a broadcast O(2^bits) array filter inside
        codegen), string columns by ``xxhash64 mod 2^bits`` — equal
        values co-locate into ~1/2^bits of the files (tight dictionary /
        row-group locality for equality scans), but lexicographic
        min/max bounds over a hash bucket stay wide, so bound-PROVABLE
        file pruning comes from the numeric/timestamp z-columns.
        The interleave itself is shift/mask arithmetic — no UDF, no
        window, no extra shuffle beyond the rewrite's own
        ``repartitionByRange`` on the z-value. Commits one ``replace``
        snapshot (rows unchanged — incremental/changelog consumers skip
        it); like real Iceberg, z-order is a rewrite action, not a
        recorded sort order. Returns None on an empty table."""
        if not 1 <= bits <= 16:
            raise ValueError("rewrite_zorder: bits must be in [1, 16]")
        if len(by) < 2:
            raise ValueError(
                "rewrite_zorder: needs >= 2 columns (one column is a "
                "plain sort — use rewrite_sorted)"
            )
        if bits * len(by) > 63:
            raise ValueError(
                f"rewrite_zorder: bits*len(by) = {bits * len(by)} exceeds "
                "the 63 interleaved bit positions a signed long holds — "
                "lower bits or drop a column"
            )
        meta = self._read_metadata()
        fields = {f["name"]: f for f in self._schema_fields(meta)}
        missing = [c for c in by if c not in fields]
        if missing:
            raise ValueError(
                f"rewrite_zorder: columns {missing} not in the current "
                f"schema ({sorted(fields)})"
            )
        live = self._live_files(meta)
        data = [d for d in live.values() if d.get("content", 0) == 0]
        deletes = {p for p, d in live.items() if d.get("content", 0) in (1, 2)}
        if not data:
            return None
        df = self._read_paths(
            spark, meta, sorted(d["file_path"] for d in data), live=live
        )
        n_buckets = 1 << bits
        numeric = [
            c
            for c in by
            if fields[c]["type"]
            in ("int", "long", "float", "double", "date", "timestamp", "timestamptz")
        ]
        # date/timestamp cannot cast straight to double — route them
        # through timestamp (DATE -> TIMESTAMP -> DOUBLE is legal)
        def _as_double(c: str):
            if fields[c]["type"] in ("timestamp", "timestamptz", "date"):
                return F.col(c).cast("timestamp").cast("double")
            return F.col(c).cast("double")

        probed = df.select(*[_as_double(c).alias(c) for c in numeric])
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = (
            dict(zip(numeric, probed.approxQuantile(numeric, probs, 0.001)))
            if numeric
            else {}
        )
        bucket_cols = []
        for c in by:
            if c in cuts:
                val = _as_double(c)
                bounds = F.array(*[F.lit(float(x)) for x in cuts[c]])
                bucket = F.size(F.filter(bounds, lambda v: v <= val))
            else:
                bucket = F.pmod(F.xxhash64(F.col(c)), F.lit(n_buckets)).cast("int")
            bucket_cols.append(bucket)
        z = F.lit(0).cast("long")
        k = len(by)
        for j in range(bits):
            for i, bc in enumerate(bucket_cols):
                z = z + (
                    F.shiftright(bc, j).bitwiseAND(F.lit(1)).cast("long")
                    * F.lit(1 << (j * k + i)).cast("long")
                )
        total = sum(d["file_size_in_bytes"] for d in data)
        n_out = max(1, -(-total // target_file_size_bytes))
        clustered = (
            df.withColumn("__z", z)
            .repartitionByRange(n_out, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        new_files = self._write_data_files(clustered, meta)
        return self._rewrite_commit(
            new_files,
            {d["file_path"] for d in data},
            "replace",
            summary_extra={"saber.zorder-by": ",".join(by)},
            known_delete_paths=deletes,
        )

    @staticmethod
    def _evolved(base: dict, new_fields: list[dict], last_column_id=None) -> dict:
        """New metadata dict with ``new_fields`` appended as the current
        schema (fresh schema-id = max existing + 1, never reused — old
        ids stay resolvable for every data file that names them)."""
        sid = max(s["schema-id"] for s in base["schemas"]) + 1
        new = dict(base)
        new["schemas"] = base["schemas"] + [
            {"schema-id": sid, "fields": new_fields}
        ]
        new["current-schema-id"] = sid
        if last_column_id is not None:
            new["last-column-id"] = last_column_id
        new["last-updated-ms"] = int(time.time() * 1000)
        return new

    def add_column(self, name: str, spark_type: str) -> dict:
        """Schema evolution: add a nullable column (new field id; data
        files written before it read back as null via field-id
        resolution in _read_data_entries)."""

        def build(base: dict) -> dict:
            fields = self._schema_fields(base)
            if name in {f["name"] for f in fields}:
                raise ValueError(f"column {name!r} already exists")
            fid = base["last-column-id"] + 1
            return self._evolved(
                base,
                fields
                + [
                    {
                        "id": fid,
                        "name": name,
                        "required": False,
                        "type": _SPARK_TO_ICEBERG.get(spark_type, spark_type),
                        "spark_type": spark_type,
                    }
                ],
                last_column_id=fid,
            )

        return self._commit(build)

    def rename_column(self, old: str, new: str) -> dict:
        """Schema evolution: rename WITHOUT rewriting data — the field id
        is the identity (spec §Schema Evolution), so files written under
        the old name keep serving their values through the id-resolving
        read path. Partition source columns are refused (the spec keys
        partition specs by source field, but manifests here carry the
        source NAME, so a rename would orphan existing partition stats)."""

        def build(base: dict) -> dict:
            fields = self._schema_fields(base)
            names = {f["name"] for f in fields}
            if old not in names:
                raise ValueError(f"no such column {old!r}")
            if new in names:
                raise ValueError(f"column {new!r} already exists")
            if any(
                pf["source-name"] == old
                for s in base["partition-specs"]
                for pf in s["fields"]
            ):  # ANY spec: old files still prune under the spec that wrote them
                raise ValueError(
                    f"{old!r} is a partition source column — rename is not "
                    "supported for partition sources in this format"
                )
            return self._evolved(
                base,
                [dict(f, name=new) if f["name"] == old else f for f in fields],
            )

        return self._commit(build)

    def drop_column(self, name: str) -> dict:
        """Schema evolution: drop a column WITHOUT rewriting data — the
        field simply leaves the current schema; old files still carry the
        bytes, the id-resolving read path stops selecting them. Refused
        for partition source columns and for the last remaining column."""

        def build(base: dict) -> dict:
            fields = self._schema_fields(base)
            if name not in {f["name"] for f in fields}:
                raise ValueError(f"no such column {name!r}")
            if len(fields) == 1:
                raise ValueError("cannot drop the only column")
            if any(
                pf["source-name"] == name
                for s in base["partition-specs"]
                for pf in s["fields"]
            ):  # ANY spec, not just the default (see rename_column)
                raise ValueError(
                    f"{name!r} is a partition source column — drop the "
                    "partition spec first"
                )
            fid = next(f["id"] for f in fields if f["name"] == name)
            eq_refs = [
                d["file_path"]
                for d in self._live_files(base).values()
                if d.get("content", 0) == 2 and fid in d.get("equality-ids", [])
            ]
            if eq_refs:
                raise ValueError(
                    f"{name!r} is referenced by live equality-delete "
                    f"files ({eq_refs[:2]}) — compact them away first"
                )
            return self._evolved(
                base, [f for f in fields if f["name"] != name]
            )

        return self._commit(build)

    def update_partition_spec(
        self, partition_by: list[tuple[str, str]]
    ) -> dict:
        """Partition evolution (spec §Partition Evolution): switch the
        table's DEFAULT partition spec without rewriting a single data
        file. ``partition_by``: [(source_column, transform)], same forms
        as ``create``; ``[]`` makes the table unpartitioned for new
        writes. Existing files keep their layout and their original
        spec-id — the read path judges every file's partition values
        under the spec that wrote it (``_spec_maps``), so pruning stays
        exact across the boundary: old-spec predicates keep pruning old
        files, new-spec predicates prune new files, and a file whose spec
        lacks the predicate column is conservatively kept. A later
        ``rewrite_data_files`` / ``rewrite_sorted`` / ``rewrite_zorder``
        migrates old files to the new layout as a side effect (rewrites
        always write under the current default spec).

        Field-id stability per the spec: a (source column, transform)
        pair that appeared in ANY earlier spec keeps its partition
        field-id; genuinely new fields get fresh ids above
        ``last-partition-id``. If the requested spec matches an existing
        one field-for-field, the default simply switches back to it (no
        duplicate spec entry). Metadata-only optimistic commit — no
        snapshot, concurrent appends land on whichever spec their writer
        read, which is exactly Iceberg's behavior."""

        def build(base: dict) -> dict:
            by_name = {f["name"]: f["id"] for f in self._schema_fields(base)}
            missing = [c for c, _t in partition_by if c not in by_name]
            if missing:
                raise ValueError(
                    f"update_partition_spec: source columns {missing} not "
                    f"in the current schema ({sorted(by_name)})"
                )
            prior = {}  # (source-id, transform) -> existing field-id
            for s in base["partition-specs"]:
                for f in s["fields"]:
                    prior.setdefault((f["source-id"], f["transform"]), f["field-id"])
            last_id = base.get("last-partition-id", 999)
            fields = []
            for col, tr in partition_by:
                key = (by_name[col], tr)
                fid = prior.get(key)
                if fid is None:
                    last_id += 1
                    fid = last_id
                fields.append(
                    {
                        "name": col
                        if tr == "identity"
                        else f"{col}_{tr.split('[')[0]}",
                        "source-id": by_name[col],
                        "source-name": col,
                        "transform": tr,
                        "field-id": fid,
                    }
                )
            shape = lambda fs: [  # noqa: E731
                (f["source-id"], f["transform"]) for f in fs
            ]
            new = dict(base)
            match = next(
                (
                    s
                    for s in base["partition-specs"]
                    if shape(s["fields"]) == shape(fields)
                ),
                None,
            )
            if match is not None:
                new["default-spec-id"] = match["spec-id"]
                return new
            sid = max(s["spec-id"] for s in base["partition-specs"]) + 1
            new["partition-specs"] = base["partition-specs"] + [
                {"spec-id": sid, "fields": fields}
            ]
            new["default-spec-id"] = sid
            new["last-partition-id"] = max(
                base.get("last-partition-id", 999), last_id
            )
            return new

        return self._commit(build)

    # -- read path -----------------------------------------------------------------

    def _snapshot(self, meta: dict, snapshot_id=None, as_of_ms=None) -> dict | None:
        if isinstance(snapshot_id, str):
            # named ref (spec §Refs): a tag pins one snapshot forever, a
            # branch names its current head — both resolve here so every
            # read path (scan/files/changes/time-travel) takes refs
            ref = meta.get("refs", {}).get(snapshot_id)
            if ref is None:
                raise ValueError(
                    f"unknown ref {snapshot_id!r} in {self.location} "
                    f"(known: {sorted(meta.get('refs', {}))})"
                )
            snapshot_id = ref["snapshot-id"]
        if snapshot_id is None and as_of_ms is not None:
            # time travel: last snapshot at or before the timestamp
            eligible = [
                e for e in meta["snapshot-log"] if e["timestamp-ms"] <= as_of_ms
            ]
            if not eligible:
                return None
            snapshot_id = eligible[-1]["snapshot-id"]
        if snapshot_id is None:
            snapshot_id = meta["current-snapshot-id"]
        if snapshot_id == -1:
            return None
        snap = next(
            (s for s in meta["snapshots"] if s["snapshot-id"] == snapshot_id), None
        )
        if snap is None:
            raise ValueError(
                f"snapshot {snapshot_id} not found in {self.location} — "
                "it may have been removed by expire_snapshots"
            )
        return snap

    def _manifest_list(self, meta: dict, snap: dict | None = None) -> list[dict]:
        snap = snap or self._snapshot(meta)
        if snap is None:
            return []
        return _read_json_immutable(snap["manifest-list"])

    def _live_entries(
        self, snapshot_id=None, as_of_ms=None, meta: dict | None = None,
        skip_manifest=None,
    ) -> list[dict]:
        """Every live manifest entry (data AND delete files) of one
        snapshot. Pass ``meta`` to reuse an already-read metadata json
        (scan/planning paths list manifests exactly once).
        ``skip_manifest(mlist_entry) -> bool`` lets planning drop whole
        manifests on their manifest-list summary without reading them —
        only sound for callers that tolerate losing every entry the
        summary excludes (``files`` with filters; NOT delete
        resolution)."""
        if meta is None:
            meta = self._read_metadata()
        snap = self._snapshot(meta, snapshot_id, as_of_ms)
        if snap is None:
            return []
        out = []
        for m in self._manifest_list(meta, snap):
            if skip_manifest is not None and skip_manifest(m):
                continue
            out += [
                e["data_file"]
                for e in _read_json_immutable(m["manifest_path"])
                if e["status"] != 2
            ]
        return out

    def files(
        self, snapshot_id=None, as_of_ms=None, filters=None, meta=None
    ) -> list[dict]:
        """Live DATA files of one snapshot, after partition- and
        column-bound pruning. ``filters``: [(col, op, value)] with op in
        = < <= > >= — conservative (a file is kept unless its bounds
        PROVE no row matches), exactly manifest-level pruning. Position-
        delete files (content=1) are excluded — use ``delete_files``.
        Manifests whose manifest-list column summary contradicts
        ``filters`` are skipped without being read (cold planning scales
        with matching manifests, not live manifests). ``meta`` pins the
        listing to metadata the caller already read — multi-step
        operations (delete_where) must plan and read under ONE metadata
        version or a concurrent commit between the two reads hands them
        files resolved under the wrong writer schema."""
        meta = meta if meta is not None else self._read_metadata()
        specs = self._spec_maps(meta)
        nmaps = _bound_name_maps(meta) if filters else None
        skip = (
            (lambda m: _manifest_pruned(m, filters, nmaps))
            if filters
            else None
        )
        out = []
        for d in self._live_entries(
            snapshot_id, as_of_ms, meta=meta, skip_manifest=skip
        ):
            if d.get("content", 0) != 0:
                continue
            spec = specs.get(int(d.get("spec-id", 0)), {})
            if filters and _pruned(d, filters, spec, nmaps):
                continue
            out.append(d)
        return out

    def delete_files(self, snapshot_id=None, as_of_ms=None) -> list[dict]:
        """Live POSITION-DELETE files (spec v2 content=1) of one snapshot:
        parquet files of (file_path, pos) rows naming deleted positions
        in data files. Merge-on-read counterpart to ``files``."""
        return [
            d
            for d in self._live_entries(snapshot_id, as_of_ms)
            if d.get("content", 0) == 1
        ]

    def scan(
        self,
        spark: SparkSession,
        snapshot_id=None,
        as_of_ms=None,
        filters=None,
    ) -> DataFrame:
        """Snapshot-isolated scan: the file list is pinned from one
        snapshot, so concurrent commits never tear the read. The
        manifests are listed ONCE (one metadata read, one walk) and split
        into data/delete sets — the pinning and the I/O bound in one."""
        meta = self._read_metadata()
        snap = self._snapshot(meta, snapshot_id, as_of_ms)
        ddl = _spark_ddl(self._schema_fields(meta))
        if snap is None:
            return spark.createDataFrame([], ddl)
        nmaps = _bound_name_maps(meta) if filters else None
        skip = (
            (lambda m: _manifest_pruned_mor(m, filters, nmaps))
            if filters
            else None
        )
        entries = self._live_entries(
            snap["snapshot-id"], meta=meta, skip_manifest=skip
        )
        specs = self._spec_maps(meta)
        files = [
            d
            for d in entries
            if d.get("content", 0) == 0
            and not (
                filters
                and _pruned(
                    d, filters, specs.get(int(d.get("spec-id", 0)), {}), nmaps
                )
            )
        ]
        if not files:
            return spark.createDataFrame([], ddl)
        del_paths = [
            d["file_path"] for d in entries if d.get("content", 0) == 1
        ]
        eq_entries = [d for d in entries if d.get("content", 0) == 2]
        # field-id column resolution + merge-on-read in one grouped read
        df = self._read_with_all_deletes(
            spark, meta, files, del_paths or None, eq_entries
        )
        if filters:
            for col, op, val in filters:  # residual row-level filter
                ops = {"=": "==", "<": "<", "<=": "<=", ">": ">", ">=": ">="}
                df = df.where(
                    F.expr(f"`{col}` {ops[op]} {json.dumps(val)}")
                    if isinstance(val, str)
                    else F.expr(f"`{col}` {ops[op]} {val}")
                )
        return df

    def appended_file_paths(self, from_seq: int, to_seq: int) -> list[str]:
        """Data files added by *append* snapshots with sequence number in
        the half-open range ``(from_seq, to_seq]`` — the replayable unit a
        streaming source plans micro-batches from (snapshots are
        immutable, so a range always resolves to the same files)."""
        return [d["file_path"] for d in self.appended_files(from_seq, to_seq)]

    def appended_files(self, from_seq: int, to_seq: int) -> list[dict]:
        """appended_file_paths, but full manifest data_file entries —
        streaming readers need each file's writer ``schema-id`` to
        resolve renamed columns by field id."""
        meta = self._read_metadata()
        # sequence numbers are dense (one per commit), so any number in
        # the range with no surviving snapshot means expire_snapshots
        # removed an intermediate append AFTER the reader checkpointed —
        # its rows are unrecoverable from this range and a silent skip
        # would be silent data loss (real Iceberg's incremental scan
        # raises on a missing intermediate snapshot the same way)
        present = {sn["sequence-number"] for sn in meta["snapshots"]}
        # clamp to the last committed sequence: callers pass a huge
        # to_seq as the "to latest" idiom, and sequences beyond the last
        # commit were never written, hence cannot be missing (also keeps
        # this check O(#commits), never O(to_seq))
        hi = min(to_seq, max(present, default=0))
        missing = [q for q in range(from_seq + 1, hi + 1) if q not in present]
        if missing:
            raise ValueError(
                f"snapshots with sequence numbers {missing} were expired "
                "out of the incremental range — the appended rows are no "
                "longer reachable; re-seed the reader from a full scan "
                "(and retain snapshots at least as long as reader "
                "checkpoint lag)"
            )
        out: list[dict] = []
        for s in meta["snapshots"]:
            if from_seq < s["sequence-number"] <= to_seq and s["summary"][
                "operation"
            ] not in ("append", "replace"):
                # fail loudly like real Iceberg's incremental scan: a
                # MERGE/overwrite/delete snapshot in the range means this
                # table is not an append-only stream source, and a silent
                # skip would be silent data loss downstream. 'replace'
                # (compaction) stays silently skippable — it rewrites
                # bytes, never rows.
                raise ValueError(
                    f"snapshot {s['snapshot-id']} in range is "
                    f"'{s['summary']['operation']}', not 'append' — "
                    "incremental/streaming reads require append-only "
                    "history (tail a sink without merge_keys, or re-seed "
                    "from a full scan)"
                )
            if (
                from_seq < s["sequence-number"] <= to_seq
                and s["summary"]["operation"] == "append"
            ):
                for m in self._manifest_list(meta, s):
                    if m["added_snapshot_id"] != s["snapshot-id"]:
                        continue  # carried-forward manifest, not new rows
                    out += [
                        e["data_file"]
                        for e in _read_json_immutable(m["manifest_path"])
                        if e["status"] == 1
                    ]
        return out

    def schema_ddl(self) -> str:
        """Current schema as a Spark DDL string."""
        meta = self._read_metadata()
        return _spark_ddl(
            next(
                s
                for s in meta["schemas"]
                if s["schema-id"] == meta["current-schema-id"]
            )["fields"]
        )

    def incremental(
        self, spark: SparkSession, from_snapshot_id: int, to_snapshot_id=None
    ) -> DataFrame:
        """Rows appended strictly AFTER ``from_snapshot_id`` up to
        ``to_snapshot_id`` (default current) — the incremental-scan
        primitive a streaming source consumes snapshot-by-snapshot."""
        meta = self._read_metadata()
        from_seq = 0
        if from_snapshot_id is not None and from_snapshot_id != -1:
            from_seq = self._snapshot(meta, from_snapshot_id)["sequence-number"]
        to_snap = self._snapshot(meta, to_snapshot_id)
        entries = (
            self.appended_files(from_seq, to_snap["sequence-number"])
            if to_snap is not None
            else []
        )
        # field-id resolution, NOT a name-keyed read under the current
        # schema: files written before a rename carry the old column
        # name, and parquet's by-name matching would silently null the
        # renamed column here while scan()/changes() return real values
        return self._read_data_entries(spark, meta, entries)

    def _read_entries_with_pos(
        self, spark: SparkSession, meta: dict, entries: list[dict]
    ) -> DataFrame:
        """``_read_data_entries`` variant that keeps each row's physical
        address: CURRENT-schema columns plus ``(_fp, _pos)`` — the
        (file path, row index) key position-delete files name. Groups by
        writer schema-id for field-id resolution, same as the main read."""
        cur = self._schema_fields(meta)
        groups: dict[int, list[str]] = {}
        for d in entries:
            groups.setdefault(int(d.get("schema-id", 0)), []).append(d["file_path"])
        fp = F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
        parts = []
        for sid in sorted(groups):
            wf = self._schema_fields(meta, sid)
            rdf = (
                spark.read.schema(_spark_ddl(wf))
                .parquet(*sorted(groups[sid]))
                .withColumn("_fp", fp)
                .withColumn("_pos", F.col("_metadata.row_index"))
            )
            proj = _projection_to_current(wf, cur)
            if proj is not None:
                rdf = rdf.select(*proj, F.col("_fp"), F.col("_pos"))
            parts.append(rdf)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def changes(
        self, spark: SparkSession, from_snapshot_id=None, to_snapshot_id=None
    ) -> DataFrame:
        """Row-level CDC changelog over the half-open snapshot range
        ``(from, to]`` — the from-scratch analogue of Iceberg's
        ``create_changelog_view`` (spec v2 + Spark procedure semantics;
        reference parity: Saber has no table format at all, this extends
        the sink side of SURVEY.md §2.5). Every row each snapshot adds is
        emitted as ``_change_type='insert'`` and every row it removes as
        ``'delete'``, under the CURRENT schema, stamped with
        ``_change_ordinal`` (position of the commit within the range) and
        ``_commit_snapshot_id``. An upsert (``merge_into``) therefore
        shows as delete(old row) + insert(new row) — the default
        changelog form when no row-identifier fields are configured.

        Exactness rules, one per storage subtlety:

        - ``replace`` snapshots (compaction, sort-order clustering) move
          bytes, never rows — they emit nothing.
        - A data file removed by copy-on-write only announces its rows
          that were still LIVE at the parent: position deletes already
          covering it are applied to the removed-file read.
        - A position-delete file that merely changed PATH because a later
          rewrite trimmed it re-states old positions; new deletes at a
          snapshot are the added delete-file rows anti-joined against the
          previously-live delete set, so each deleted row is announced
          exactly once across the whole history.

        Equality deletes resolve to row events too: new tuples announce
        the still-live parent rows they match under the data-sequence
        rule, with the parent's own tuples and positions applied first
        so nothing dead re-announces. Unlike ``incremental`` (which
        refuses non-append history), this read is the general-history
        primitive: it is how a downstream
        consumer replays a table that takes deletes and merges. All
        per-snapshot work is file-list diffing on the driver (bounded by
        manifest size); row reads are distributed scans of exactly the
        changed files."""
        meta = self._read_metadata()
        fields = self._schema_fields(meta)
        cols = [f["name"] for f in fields]
        clash = {"_change_type", "_change_ordinal", "_commit_snapshot_id"} & set(cols)
        if clash:
            raise ValueError(f"changes: schema already has {sorted(clash)}")
        change_ddl = _spark_ddl(fields) + (
            ", _change_type STRING, _change_ordinal INT,"
            " _commit_snapshot_id BIGINT"
        )
        to_snap = self._snapshot(meta, to_snapshot_id)
        if to_snap is None:
            return spark.createDataFrame([], change_ddl)
        from_seq = 0
        if from_snapshot_id is not None and from_snapshot_id != -1:
            from_seq = self._snapshot(meta, from_snapshot_id)["sequence-number"]
        snaps = sorted(
            (
                s
                for s in meta["snapshots"]
                if from_seq < s["sequence-number"] <= to_snap["sequence-number"]
            ),
            key=lambda s: s["sequence-number"],
        )
        prev: dict[str, dict] = {}
        if from_seq:
            prev = {
                d["file_path"]: d
                for d in self._live_entries(from_snapshot_id, meta=meta)
            }

        def stamp(df: DataFrame, kind: str, ordinal: int, sid: int) -> DataFrame:
            return df.select(
                *cols,
                F.lit(kind).alias("_change_type"),
                F.lit(ordinal).cast("int").alias("_change_ordinal"),
                F.lit(sid).cast("long").alias("_commit_snapshot_id"),
            )

        parts: list[DataFrame] = []
        for i, s in enumerate(snaps):
            cur = {
                d["file_path"]: d
                for d in self._live_entries(s["snapshot-id"], meta=meta)
            }
            if s["summary"]["operation"] == "replace":
                prev = cur
                continue
            sid = s["snapshot-id"]
            diff = _cdc_diff(prev, cur)
            if diff["added_data"]:
                parts.append(
                    stamp(
                        self._read_data_entries(
                            spark, meta, diff["added_data"]
                        ),
                        "insert", i, sid,
                    )
                )
            if diff["removed_data"]:
                parts.append(
                    stamp(
                        self._read_with_all_deletes(
                            spark,
                            meta,
                            diff["removed_data"],
                            diff["prev_del_paths"] or None,
                            diff["prev_eq"],  # rows already dead via an
                            # earlier equality delete must not re-announce
                        ),
                        "delete", i, sid,
                    )
                )
            if diff["added_dels"]:
                new_del = self._pos_delete_frame(
                    spark, [d["file_path"] for d in diff["added_dels"]]
                )
                if diff["prev_del_paths"]:
                    old_del = self._pos_delete_frame(
                        spark, diff["prev_del_paths"]
                    )
                    new_del = new_del.join(
                        old_del, ["_del_fp", "_del_pos"], "left_anti"
                    )
                if diff["delete_targets"]:
                    # parent eq tuples applied: a row already dead via an
                    # earlier equality delete must not re-announce even
                    # if a new position delete names its position (MoR
                    # position writers compute positions over raw files)
                    rows = self._read_with_all_deletes(
                        spark,
                        meta,
                        diff["delete_targets"],
                        None,  # prior positions excluded via new_del
                        diff["prev_eq"],
                        keep_addr=True,
                    )
                    hit = rows.join(
                        F.broadcast(new_del),
                        (F.col("_fp") == F.col("_del_fp"))
                        & (F.col("_pos") == F.col("_del_pos")),
                        "inner",
                    ).select(*cols)
                    parts.append(stamp(hit, "delete", i, sid))
            if diff["added_eq"] and diff["eq_targets"]:
                # new equality tuples: announce the still-live parent
                # rows they match — parent view first (position deletes
                # + the parent's own tuples applied), then one semi-join
                # per new tuple group under the seq rule; a row matching
                # several groups dedupes by its (file, position) address
                base = self._read_with_all_deletes(
                    spark,
                    meta,
                    diff["eq_targets"],
                    diff["prev_del_paths"] or None,
                    diff["prev_eq"],
                    keep_addr=True,
                )
                if diff["added_dels"]:
                    # a row BOTH position-deleted and equality-matched in
                    # this one snapshot (only an external writer commits
                    # both kinds at once — this format's own writers
                    # never do) is announced exactly once, by the
                    # position-delete path above
                    nd = self._pos_delete_frame(
                        spark, [d["file_path"] for d in diff["added_dels"]]
                    )
                    base = base.join(
                        F.broadcast(nd),
                        (F.col("_fp") == F.col("_del_fp"))
                        & (F.col("_pos") == F.col("_del_pos")),
                        "left_anti",
                    )
                hits = []
                for _ids, cond, dels in self._eq_tuple_frames(
                    spark, meta, diff["added_eq"]
                ):
                    hits.append(base.join(F.broadcast(dels), cond, "left_semi"))
                h = hits[0]
                for x in hits[1:]:
                    h = h.unionByName(x)
                if len(hits) > 1:
                    h = h.dropDuplicates(["_fp", "_pos"])
                parts.append(
                    stamp(h.select(*cols), "delete", i, sid)
                )
            prev = cur
        if not parts:
            return spark.createDataFrame([], change_ddl)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- maintenance / introspection ------------------------------------------------

    def snapshots(self) -> list[dict]:
        return self._read_metadata()["snapshots"]

    def current_snapshot_id(self) -> int:
        return self._read_metadata()["current-snapshot-id"]

    def history(self) -> list[dict]:
        return self._read_metadata()["snapshot-log"]

    def has_commit_tag(self, tag: str) -> bool:
        return any(
            s["summary"].get("saber.commit-tag") == tag for s in self.snapshots()
        )

    def remove_orphan_files(self, older_than_s: float = 3 * 24 * 3600) -> list[str]:
        """Delete data files referenced by NO snapshot (crash-before-commit
        leftovers). Safe because readers only follow manifests — BUT a
        concurrent writer may have staged/renamed its data files and not
        yet published the snapshot, so only files older than
        ``older_than_s`` (by mtime; Iceberg's default is likewise 3 days)
        are eligible. Pass 0 only when no writer can be in flight."""
        meta = self._read_metadata()
        live = set()
        for s in meta["snapshots"]:
            for m in self._manifest_list(meta, s):
                live |= {
                    e["data_file"]["file_path"]
                    for e in _read_json_immutable(m["manifest_path"])
                }
        cutoff = time.time() - older_than_s
        removed = []
        for root, _dirs, files in os.walk(self.data_dir):
            for fn in files:
                p = os.path.join(root, fn)
                if (
                    fn.endswith(".parquet")
                    and p not in live
                    and os.path.getmtime(p) <= cutoff
                ):
                    os.unlink(p)
                    removed.append(p)
        return removed

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` snapshots from metadata
        (their unshared data files become orphans; run
        remove_orphan_files to reclaim). Snapshots pinned by a named ref
        (tag or branch, spec §Refs) are RETAINED regardless of age —
        expiring a tagged snapshot would silently break every reader of
        that ref, so retention works around refs exactly as in real
        Iceberg; drop the ref first to release the snapshot."""

        def build(base: dict) -> dict:
            pinned = {
                r["snapshot-id"] for r in base.get("refs", {}).values()
            }
            keep, kept_tail = [], 0
            for snap in reversed(base["snapshots"]):
                if kept_tail < keep_last or snap["snapshot-id"] in pinned:
                    keep.append(snap)
                if kept_tail < keep_last:
                    kept_tail += 1
            keep.reverse()
            keep_ids = {s["snapshot-id"] for s in keep}
            new = dict(base)
            new["snapshots"] = keep
            new["snapshot-log"] = [
                e for e in base["snapshot-log"] if e["snapshot-id"] in keep_ids
            ]
            new["last-updated-ms"] = int(time.time() * 1000)
            return new

        return self._commit(build)

    # -- named refs: tags and branches (spec §Refs) ----------------------------------

    def create_tag(self, name: str, snapshot_id=None) -> dict:
        """Pin ``snapshot_id`` (default: current) under an immutable
        name. Readers address it as ``scan(spark, snapshot_id=name)`` —
        every read path resolves string snapshot ids through the ref
        table — and ``expire_snapshots`` retains pinned snapshots. The
        audit/reproducibility primitive: tag the snapshot a training run
        consumed and the exact input multiset stays readable forever."""
        return self._set_ref(name, snapshot_id, "tag")

    def create_branch(self, name: str, snapshot_id=None) -> dict:
        """Name a snapshot as a mutable branch head (advance it with
        another create_branch call; main is implicit as the current
        snapshot). Unlike real Iceberg this format does not WRITE to
        non-main branches (writes always advance main) — branches here
        are movable read pointers; the write-audit workflow (WAP) uses
        tags + commit-tags instead."""
        return self._set_ref(name, snapshot_id, "branch")

    def drop_ref(self, name: str) -> dict:
        def build(base: dict) -> dict:
            refs = dict(base.get("refs", {}))
            if name not in refs:
                raise ValueError(f"unknown ref {name!r}")
            del refs[name]
            new = dict(base)
            new["refs"] = refs
            return new

        return self._commit(build)

    def refs(self) -> dict:
        return dict(self._read_metadata().get("refs", {}))

    def _set_ref(self, name: str, snapshot_id, kind: str) -> dict:
        if (
            not name
            or "/" in name
            or name in ("earliest", "latest")
            or name.lstrip("-").isdigit()
        ):
            # digit-only names are rejected so a snapshot-id string is
            # never ambiguous between a ref and an integer id (the
            # DataSource option parses digits as ids)
            raise ValueError(f"invalid ref name {name!r}")

        def build(base: dict) -> dict:
            sid = snapshot_id
            if sid is None:
                sid = base["current-snapshot-id"]
            if sid == -1:
                raise ValueError("cannot ref an empty table")
            if not any(s["snapshot-id"] == sid for s in base["snapshots"]):
                raise ValueError(f"snapshot {sid} not found")
            refs = dict(base.get("refs", {}))
            if name in refs:
                if refs[name]["type"] == "tag":
                    raise ValueError(
                        f"tag {name!r} already exists — tags are immutable, "
                        "drop_ref first"
                    )
                if kind != "branch":
                    # a tag must not silently clobber (and freeze) an
                    # existing branch pointer of the same name
                    raise ValueError(
                        f"branch {name!r} already exists — a tag cannot "
                        "replace it; drop_ref first or pick another name"
                    )
            refs[name] = {"snapshot-id": sid, "type": kind}
            new = dict(base)
            new["refs"] = refs
            return new

        return self._commit(build)


def _cdc_diff(prev: dict, cur: dict) -> dict:
    """The single snapshot-to-snapshot CDC diff BOTH changelog readers
    consume (batch ``IcebergTable.changes`` and the streaming
    ``IcebergChangelogStreamReader``) — one algorithm, one set of
    fallback rules, so the two can never diverge. ``prev``/``cur`` map
    file_path -> manifest entry of the live sets at consecutive
    snapshots.

    Returns ``added_data`` (insert events), ``removed_data`` (COW delete
    events; apply ``prev_del_paths`` so rows already dead via
    merge-on-read are not re-announced), ``added_dels`` (new
    position-delete files), ``prev_del_paths`` (for the trimmed-carry
    anti-join), and ``delete_targets`` — the prev-live data files the
    new deletes may reference. A delete entry missing
    ``referenced_data_files`` (an external/older writer) falls back to
    ALL prev data files: conservative, never loses a delete event."""
    added_data = [
        d for p, d in cur.items() if d.get("content", 0) == 0 and p not in prev
    ]
    removed_data = [
        d for p, d in prev.items() if d.get("content", 0) == 0 and p not in cur
    ]
    added_dels = [
        d for p, d in cur.items() if d.get("content", 0) == 1 and p not in prev
    ]
    prev_del_paths = [p for p, d in prev.items() if d.get("content", 0) == 1]
    refs: set[str] = set()
    fallback_all = False
    for d in added_dels:
        r = d.get("referenced_data_files")
        if r:
            refs |= set(r)
        else:
            fallback_all = True
    # a file REMOVED by this same snapshot is excluded: its live rows are
    # already announced whole-file via removed_data, and resolving new
    # positions against it too would announce those rows twice
    delete_targets = (
        [
            d
            for p, d in prev.items()
            if d.get("content", 0) == 0
            and p in cur
            and (fallback_all or p in refs)
        ]
        if added_dels
        else []
    )
    # equality deletes: new tuples announce the still-live parent rows
    # they match; ``eq_targets`` bounds the value-matching read to data
    # files whose data-seq any new tuple can apply to, and ``prev_eq``
    # carries the parent's accumulated tuples so rows ALREADY dead via
    # an earlier equality delete are not re-announced
    def _seq(d: dict) -> int:
        return int(d.get("data-seq", 0))

    added_eq = [
        d for p, d in cur.items() if d.get("content", 0) == 2 and p not in prev
    ]
    prev_eq = [d for d in prev.values() if d.get("content", 0) == 2]
    max_new_eq = max((_seq(d) for d in added_eq), default=None)
    eq_targets = (
        [
            d
            for p, d in prev.items()
            if d.get("content", 0) == 0
            and p in cur
            and _seq(d) < max_new_eq
        ]
        if max_new_eq is not None
        else []
    )
    return {
        "added_data": added_data,
        "removed_data": removed_data,
        "added_dels": added_dels,
        "prev_del_paths": prev_del_paths,
        "delete_targets": delete_targets,
        "added_eq": added_eq,
        "prev_eq": prev_eq,
        "eq_targets": eq_targets,
    }


_TS_BOUND_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}")


def _norm_ts_bounds(lo, hi, val):
    """Timestamp bounds serialize with a space separator since r3, but
    manifests written before that carry ISO 'T'-separated strings — a
    lexicographic compare across the two formats can wrongly prune a
    file whose bound shares the date with the literal (' ' < 'T').

    Normalization must be ALL-OR-NOTHING across (lo, hi, val): rewriting
    only the values that individually look like timestamps is not
    monotonic under lexicographic order (a string column mixing
    '2024-01-01 50' and '2024-01-01T10:00' would get hi' < lo and
    wrongly prune). Only when all three match the timestamp shape is the
    column a timestamp column and the rewrite order-preserving."""

    def is_ts(x):
        return isinstance(x, str) and _TS_BOUND_RE.match(x)

    if is_ts(lo) and is_ts(hi) and is_ts(val):
        return lo.replace("T", " "), hi.replace("T", " "), val.replace("T", " ")
    return lo, hi, val


def _bound_name_maps(meta: dict) -> dict[int, dict[str, str]]:
    """Per writer-schema-id map {CURRENT column name -> the name that
    same field (by id) had in that writer schema}. File column bounds
    are keyed by the writer-time name, so after a rename chain
    (a->b then c->a) the current name 'a' would otherwise collide with
    a different field's stale bounds and wrongly prune live rows —
    resolving through field ids makes pruning rename-proof, mirroring
    the data read path."""
    cur = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )["fields"]
    maps: dict[int, dict[str, str]] = {}
    for s in meta["schemas"]:
        by_id = {f["id"]: f["name"] for f in s["fields"]}
        maps[s["schema-id"]] = {
            f["name"]: by_id[f["id"]] for f in cur if f["id"] in by_id
        }
    return maps


def _manifest_summary(entries: list[dict]) -> dict:
    """Aggregated column bounds for a manifest-list entry. Real Iceberg
    keeps partition-field summaries in the manifest list so planning can
    skip whole manifests without reading them; this format's data files
    carry COLUMN bounds, so the summary aggregates those instead — same
    planning role, documented deviation. Computed once at write time
    over the entries going INTO the manifest (manifests are immutable).
    Omitted — meaning the manifest is always read — when the manifest
    holds no data files, mixes writer schema-ids (bound keys are
    writer-time column names; one rename translation per manifest is
    only sound for a single schema), or a column's bound types differ
    across files (min/max across them proves nothing)."""
    data = [d for d in entries if d.get("content", 0) == 0]
    if not data:
        return {}
    sids = {int(d.get("schema-id", 0)) for d in data}
    if len(sids) != 1:
        return {}
    common = set(data[0].get("lower_bounds", {})) & set(
        data[0].get("upper_bounds", {})
    )
    for d in data[1:]:
        common &= set(d.get("lower_bounds", {})) & set(d.get("upper_bounds", {}))
    bounds: dict = {}
    for col in common:
        los = [d["lower_bounds"][col] for d in data]
        his = [d["upper_bounds"][col] for d in data]
        # same all-or-nothing separator normalization as _norm_ts_bounds:
        # manifests can mix pre-r3 'T'-separated and space-separated
        # timestamp strings across files, and ' ' < 'T' lexicographically
        # — min/max over the mixed forms would pick a temporally WRONG
        # aggregate bound (a later space-form lower beats an earlier
        # T-form one), making the summary prune manifests that hold
        # matching rows. Normalize only when EVERY bound looks like a
        # timestamp, for the monotonicity reason documented there.
        if all(
            isinstance(x, str) and _TS_BOUND_RE.match(x) for x in los + his
        ):
            los = [x.replace("T", " ") for x in los]
            his = [x.replace("T", " ") for x in his]
        try:
            bounds[col] = [min(los), max(his)]
        except TypeError:  # mixed bound types across files: unprovable
            continue
    if not bounds:
        return {}
    return {
        "bounds": bounds,
        "bounds_schema_id": sids.pop(),
        # delete-aware readers (scan / the DataSource) may only skip
        # manifests that provably hold no delete entries — a skipped
        # position/equality delete would resurrect dead rows in files
        # kept from OTHER manifests
        "has_deletes": any(d.get("content", 0) != 0 for d in entries),
    }


def _manifest_pruned(mentry: dict, filters, name_maps: dict | None) -> bool:
    """True iff the manifest-list summary PROVES no data file inside the
    manifest can match ``filters`` — the manifest JSON is then skipped
    unread, taking cold planning from O(live manifests) parses to
    O(matching manifests). Entries without a summary (pre-summary
    manifest lists, mixed-schema or no-data manifests) are always read.
    Reuses ``_pruned`` on a synthetic file carrying the aggregated
    bounds so timestamp-separator normalization and rename translation
    behave identically to per-file pruning."""
    b = mentry.get("bounds")
    if not b:
        return False
    probe = {
        "lower_bounds": {c: v[0] for c, v in b.items()},
        "upper_bounds": {c: v[1] for c, v in b.items()},
        "partition": {},
        "schema-id": mentry.get("bounds_schema_id", 0),
    }
    return _pruned(probe, filters, {}, name_maps)


def _manifest_pruned_mor(mentry: dict, filters, name_maps: dict | None) -> bool:
    """Manifest skip for DELETE-AWARE readers (``scan``, the DataSource):
    only manifests recorded delete-free may be skipped — a skipped
    manifest might otherwise hold position/equality deletes applying to
    files kept from other manifests. ``has_deletes is False`` requires
    the summary to have been written (missing flag -> never skip)."""
    return mentry.get("has_deletes") is False and _manifest_pruned(
        mentry, filters, name_maps
    )


def _pruned(
    data_file: dict, filters, spec: dict, name_maps: dict | None = None
) -> bool:
    """True iff the file PROVABLY contains no matching row (bounds or
    identity-partition value contradict a conjunct). ``name_maps``
    (from ``_bound_name_maps``) translates current column names to the
    file's writer-schema bound keys; without it names are used as-is
    (exact for never-renamed tables)."""
    nm = (
        name_maps.get(int(data_file.get("schema-id", 0)))
        if name_maps is not None
        else None
    )
    for col, op, val in filters:
        pf_ = spec.get(col)
        if pf_ is not None and pf_["transform"] == "identity":
            pv = data_file["partition"].get(pf_["name"])
            # pv was written via Spark's string cast, which disagrees
            # with Python str() for bool ('true' vs 'True') and for
            # float-vs-int literals ('5' vs '5.0') — compare in the
            # value domain and keep the file when equality cannot be
            # DISPROVEN (pruning must be conservative)
            if pv is not None and op == "=":
                if isinstance(val, bool):
                    if pv != ("true" if val else "false"):
                        return True
                elif isinstance(val, (int, float)):
                    try:
                        if float(pv) != float(val):
                            return True
                    except ValueError:
                        pass  # non-numeric partition value: cannot prove
                elif pv != str(val):
                    return True
        if nm is not None:
            key = nm.get(col)
            if key is None:  # field absent in the writer schema: no bounds
                continue
        else:
            key = col
        lo = data_file["lower_bounds"].get(key)
        hi = data_file["upper_bounds"].get(key)
        if lo is None or hi is None:
            continue
        lo, hi, val = _norm_ts_bounds(lo, hi, val)
        if isinstance(val, (int, float)) and isinstance(lo, str):
            continue  # incomparable, keep
        try:
            if op == "=" and (val < lo or val > hi):
                return True
            if op in ("<", "<=") and lo > val:
                return True
            if op == "<" and lo == val:
                return True
            if op in (">", ">=") and hi < val:
                return True
            if op == ">" and hi == val:
                return True
        except TypeError:
            continue
    return False
