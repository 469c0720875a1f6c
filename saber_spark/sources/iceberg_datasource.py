"""Spark Python Data Source over the from-scratch Iceberg table format.

``sources/iceberg_format.py`` implements the table format itself (spec
metadata, optimistic commits, snapshot isolation); this module plugs it
into Spark's planner through the Python Data Source API (SPARK-44076,
public in 4.x) so Iceberg tables participate in normal query plans:

    spark.dataSource.register(IcebergDataSource)
    spark.read.format("saber_iceberg").option("location", loc).load()
    spark.readStream.format("saber_iceberg").option("location", loc).load()

- **Batch reader**: one ``InputPartition`` per live data file of the
  pinned snapshot, so Spark schedules file reads across executors
  exactly like its native parquet source. ``pushFilters`` (4.1 API)
  receives the query's AND-ed predicates and applies them to the
  manifest statistics — partition-transform values and per-column
  lower/upper bounds — so non-matching files are never scheduled at
  all. All filters are also returned as residuals: file-level pruning
  is a superset guarantee, Spark still applies the row-level predicate
  (same contract as Iceberg's own scan planning).
- **Stream reader**: offsets are snapshot sequence numbers; each
  micro-batch is the half-open sequence range ``(start, end]`` and its
  partitions are the data files added by *append* snapshots in that
  range — the incremental-scan contract of ``IcebergTable.incremental``
  expressed as a replayable source. Offsets live in the query
  checkpoint, and a given range always resolves to the same files
  (snapshots are immutable), so restart gives exactly-once batches.
  ``starting-offsets`` ∈ {earliest, latest} picks where a fresh
  checkpoint begins.

Executors read the parquet data files with pyarrow directly (no JVM
round trip) and stream Arrow record batches back, cast to the table
schema's Arrow form so TIMESTAMP_NTZ files surface as the session-UTC
timestamps the rest of the engine assumes.

Retention caveat (same as real Iceberg streaming reads): a stream that
resumes from a checkpoint needs its ``start`` snapshot still present —
``expire_snapshots`` retention must cover the longest expected restart
gap.

Reference analogue: Saber's dispatcher hands fixed-size byte-buffer
tasks to workers (SURVEY.md §3.2); here the planner hands per-file
Arrow tasks to executors, with pruning instead of scan-everything.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from saber_spark.sources.iceberg_format import IcebergTable

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.types import StructType


@dataclass
class FilePartition(InputPartition):
    """One Iceberg data file == one Spark input partition.

    ``delete_paths``: position-delete parquet files (spec v2 content=1)
    that reference this data file — the executor folds them in
    (merge-on-read) while reading. Empty tuple on delete-free tables.

    ``renames``: (file_column_name, current_column_name) pairs for
    columns this file wrote under a pre-rename name (field-id schema
    evolution) — the executor reads the file name and emits the current
    one. Empty tuple when the writer schema matches the current names.

    ``absent``: current-schema column names whose field id is NOT in
    this file's writer schema — the executor must null-fill them even
    if the file happens to carry a same-named column (a field dropped
    then re-added under the same name has a NEW id; name-matching would
    resurrect the dropped bytes)."""

    file_path: str
    delete_paths: tuple = ()
    renames: tuple = ()
    absent: tuple = ()


@dataclass
class ChangePartition(InputPartition):
    """One CDC read task of the changelog stream (mode='changelog').

    ``kind``:
      'insert'     — every row of ``file_path`` (a data file ADDED by
                     the snapshot) is an insert event.
      'delete-file'— every row of ``file_path`` (a data file REMOVED by
                     a copy-on-write snapshot) still live at the parent
                     is a delete event; ``delete_paths`` carries the
                     parent's position-delete files so rows already dead
                     via merge-on-read are not re-announced.
      'delete-pos' — a merge-on-read delete landed on ``file_path``:
                     the delete events are the rows at positions named
                     by ``delete_paths`` (delete files ADDED by the
                     snapshot) minus positions in ``prior_delete_paths``
                     (delete files live before — a TRIMMED carry
                     re-states old positions and must not re-announce).
      'delete-eq'  — new EQUALITY deletes may match rows of
                     ``file_path``: emit the still-live rows (parent
                     position deletes in ``delete_paths`` and parent
                     tuples in ``eq_prior`` applied) that value-match
                     ``eq_new`` under the data-sequence rule.

    ``eq_prior``/``eq_new``: equality-delete specs, each
    ``(path, seq, ((file_col, current_col), ...))`` — tuples apply to
    this file only when ``seq > file_seq``; every delete kind applies
    ``eq_prior`` so rows already dead by value never re-announce.
    ``ordinal``/``snapshot_id`` stamp the emitted rows' CDC columns."""

    kind: str
    file_path: str
    delete_paths: tuple = ()
    prior_delete_paths: tuple = ()
    renames: tuple = ()
    absent: tuple = ()
    ordinal: int = 0
    snapshot_id: int = 0
    eq_prior: tuple = ()
    eq_new: tuple = ()
    file_seq: int = 0


_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def _arrow_schema(schema: "StructType"):
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    return pa.schema(
        [pa.field(f.name, to_arrow_type(f.dataType)) for f in schema.fields]
    )


def _resolution(
    table: "IcebergTable", meta: dict, schema_id: int
) -> tuple[tuple, tuple]:
    """Field-id column resolution for one writer schema vs the current
    one: (renames, absent). ``renames`` = (file_name, current_name)
    pairs where the field's name changed; ``absent`` = current names
    whose id the writer schema lacks (must null-fill, never name-match:
    a drop-then-re-add reuses the name but NOT the id). Both empty in
    the unevolved common case."""
    cur = table._schema_fields(meta)
    by_id = {f["id"]: f["name"] for f in table._schema_fields(meta, schema_id)}
    renames = tuple(
        (by_id[f["id"]], f["name"])
        for f in cur
        if f["id"] in by_id and by_id[f["id"]] != f["name"]
    )
    absent = tuple(f["name"] for f in cur if f["id"] not in by_id)
    return renames, absent


def _read_file_batches(
    path: str, arrow_schema, delete_paths=(), renames=(), absent=()
) -> Iterator:
    """Executor-side: stream one data file as Arrow batches cast to the
    table schema (column order + TIMESTAMP_NTZ -> session-UTC). Columns
    the file predates (schema evolution: add_column after this file was
    written) are filled with nulls, matching IcebergTable.scan().
    ``delete_paths``: merge-on-read — positions named for THIS file in
    those position-delete files are dropped before the rows leave the
    reader (an Arrow take on the kept indices; deletes for other files
    are filtered out by path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # field-id rename resolution: ask the file for its OWN column name,
    # then emit the current name (values survive a rename; a name-based
    # read would silently null the column instead)
    to_file = {cur: old for old, cur in renames}
    to_current = {old: cur for old, cur in renames}
    present = set(pq.read_schema(path).names)
    table = pq.read_table(
        path,
        columns=[
            to_file.get(n, n)
            for n in arrow_schema.names
            if n not in absent and to_file.get(n, n) in present
        ],
    )
    if renames:
        table = table.rename_columns(
            [to_current.get(c, c) for c in table.column_names]
        )
    if delete_paths:
        dels = pa.concat_tables(
            [pq.read_table(p, columns=["file_path", "pos"]) for p in delete_paths]
        )
        mine = dels.filter(pc.equal(dels.column("file_path"), path))
        if mine.num_rows:
            drop = mine.column("pos").to_numpy(zero_copy_only=False)
            keep = np.setdiff1d(np.arange(len(table), dtype="int64"), drop)
            table = table.take(keep)
    # ``absent`` fields are invisible by id even when the file carries a
    # same-named column (drop-then-re-add) — they were not read above,
    # so force the null-fill for them here
    present_current = {to_current.get(n, n) for n in present} - set(absent)
    for field in arrow_schema:
        if field.name not in present_current:
            table = table.append_column(
                field.name, pa.nulls(len(table), type=field.type)
            )
    # select() reorders: null-fills append at the end, but cast() matches
    # positionally (a dropped-then-added middle column would misalign)
    yield from table.select(arrow_schema.names).cast(arrow_schema).to_batches()


def _positions_in(delete_paths, path: str):
    """Distinct positions the given position-delete files name for ONE
    data file (executor-side, pyarrow)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if not delete_paths:
        return None
    dels = pa.concat_tables(
        [pq.read_table(p, columns=["file_path", "pos"]) for p in delete_paths]
    )
    mine = dels.filter(pc.equal(dels.column("file_path"), path))
    return np.unique(mine.column("pos").to_numpy(zero_copy_only=False))


def _read_deleted_rows(
    path: str, arrow_schema, new_dels, prior_dels, renames=(), absent=()
) -> Iterator:
    """Executor-side CDC delete resolution: the rows of ``path`` at
    positions named by ``new_dels`` minus positions already named by
    ``prior_dels`` (a trimmed delete carry re-states old positions —
    subtracting the prior set keeps every delete announced exactly
    once). Reuses the schema-resolved full read, then takes positions."""
    import numpy as np
    import pyarrow as pa

    new_pos = _positions_in(new_dels, path)
    if new_pos is None or not len(new_pos):
        return
    prior_pos = _positions_in(prior_dels, path)
    if prior_pos is not None:
        new_pos = np.setdiff1d(new_pos, prior_pos)
    if not len(new_pos):
        return
    batches = list(
        _read_file_batches(path, arrow_schema, (), renames, absent)
    )
    table = pa.Table.from_batches(batches, schema=arrow_schema)
    yield from table.take(new_pos).to_batches()


def _eq_match_mask(pdf, eq_specs: tuple, file_seq: int):
    """Boolean mask: row value-matches ANY tuple of a spec whose seq is
    strictly greater than the file's (the data-sequence rule), NULL-SAFE
    — both sides normalize nulls to one sentinel object, matching the
    JVM path's eqNullSafe semantics exactly."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    mask = np.zeros(len(pdf), dtype=bool)
    sentinel = "\x00__NULL__"

    def norm(s: "pd.Series") -> "pd.Series":
        o = s.astype(object)
        return o.where(pd.notna(o), sentinel)

    for path, seq, pairs in eq_specs:
        if seq <= file_seq or not len(pdf):
            continue
        tup = pq.read_table(path, columns=[fc for fc, _cc in pairs]).to_pandas()
        tup.columns = [cc for _fc, cc in pairs]
        cols = list(tup.columns)
        left = pd.DataFrame({c: norm(pdf[c]) for c in cols})
        right = pd.DataFrame({c: norm(tup[c]) for c in cols}).drop_duplicates()
        merged = left.merge(right, on=cols, how="left", indicator=True)
        mask |= (merged["_merge"] == "both").to_numpy()
    return mask


def _drop_eq_matches(table, eq_specs: tuple, file_seq: int):
    """Arrow-table filter: remove rows matching prior equality tuples."""
    if not eq_specs or table.num_rows == 0:
        return table
    import numpy as np

    mask = _eq_match_mask(table.to_pandas(), eq_specs, file_seq)
    return table.take(np.nonzero(~mask)[0])


def _with_cdc_columns(batches: Iterator, kind: str, ordinal: int, sid: int):
    """Append the constant CDC columns to each Arrow batch."""
    import pyarrow as pa

    for b in batches:
        n = b.num_rows
        t = pa.Table.from_batches([b])
        t = t.append_column("_change_type", pa.array([kind] * n, pa.string()))
        t = t.append_column(
            "_change_ordinal", pa.array([ordinal] * n, pa.int32())
        )
        t = t.append_column(
            "_commit_snapshot_id", pa.array([sid] * n, pa.int64())
        )
        yield from t.to_batches()


class IcebergBatchReader(DataSourceReader):
    def __init__(self, location: str, options: dict, schema: "StructType"):
        self.location = location
        # an integer pins a snapshot id; anything else is a named ref
        # (tag/branch) resolved by the metadata ref table at plan time
        raw = options.get("snapshot-id")
        self.snapshot_id = (
            None if raw is None else int(raw) if raw.lstrip("-").isdigit() else raw
        )
        self.as_of_ms = int(options["as-of-ms"]) if "as-of-ms" in options else None
        self.arrow_schema = _arrow_schema(schema)
        self.pruning_filters: list[tuple] = []

    def pushFilters(self, filters):
        for f in filters:
            op = _OPS.get(type(f))
            # only top-level columns with plain scalar values participate
            # in manifest pruning; everything else is Spark's problem
            if op and len(f.attribute) == 1 and isinstance(
                f.value, (int, float, str)
            ):
                self.pruning_filters.append((f.attribute[0], op, f.value))
        # every filter stays residual: file pruning is a superset
        # guarantee, the row-level predicate still runs in Spark
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        table = IcebergTable(self.location)
        # one metadata read + one manifest walk yields BOTH the data and
        # delete sets — pinned to a single snapshot by construction
        meta = table._read_metadata()
        from saber_spark.sources.iceberg_format import (
            _bound_name_maps,
            _manifest_pruned_mor,
            _pruned,
        )

        # delete-free manifests whose manifest-list column summary
        # contradicts the pushed filters are skipped UNREAD (planning
        # scales with matching manifests, not live manifests). The
        # writer-schema name maps MUST flow here exactly as in
        # IcebergTable.files()/scan(): bounds are keyed by writer-time
        # column names, and after a rename chain that reuses a name
        # (a->b then c->a) the stale key COLLIDES with the current name
        # — "missing key keeps the manifest" does not save that case
        name_maps = _bound_name_maps(meta)
        skip = (
            (lambda m: _manifest_pruned_mor(m, self.pruning_filters, name_maps))
            if self.pruning_filters
            else None
        )
        entries = table._live_entries(
            self.snapshot_id, self.as_of_ms, meta=meta, skip_manifest=skip
        )
        specs = table._spec_maps(meta)  # per-file spec after evolution

        files = [
            d
            for d in entries
            if d.get("content", 0) == 0
            and not (
                self.pruning_filters
                and _pruned(
                    d,
                    self.pruning_filters,
                    specs.get(int(d.get("spec-id", 0)), {}),
                    name_maps,
                )
            )
        ]
        eq = [d for d in entries if d.get("content", 0) == 2]
        if eq:
            raise ValueError(
                "saber_iceberg: this snapshot has live equality-delete "
                "files, which the per-file Arrow reader does not fold in "
                "yet — scan via IcebergTable.scan (full MoR view) or run "
                "rewrite_data_files to apply and retire them"
            )
        # merge-on-read: hand each partition exactly the delete files
        # that reference it (referenced_data_files from the manifest), so
        # executors never open unrelated delete files
        dels = [d for d in entries if d.get("content", 0) == 1]
        by_target: dict[str, list[str]] = {}
        for d in dels:
            for ref in d.get("referenced_data_files", []):
                by_target.setdefault(ref, []).append(d["file_path"])
        res_by_sid = {
            sid: _resolution(table, meta, sid)
            for sid in {int(d.get("schema-id", 0)) for d in files}
        }
        return [
            FilePartition(
                d["file_path"],
                tuple(sorted(by_target.get(d["file_path"], ()))),
                *res_by_sid[int(d.get("schema-id", 0))],
            )
            for d in files
        ]

    def read(self, partition: FilePartition) -> Iterator:
        # pyspark substitutes [None] for an empty partition list — an
        # empty table / fully-pruned / no-new-snapshot read must yield
        # zero rows, not crash on partition.file_path
        if partition is None:
            return
        yield from _read_file_batches(
            partition.file_path,
            self.arrow_schema,
            getattr(partition, "delete_paths", ()),
            getattr(partition, "renames", ()),
            getattr(partition, "absent", ()),
        )


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, location: str, options: dict, schema: "StructType"):
        self.location = location
        self.arrow_schema = _arrow_schema(schema)
        self.start_at_latest = (
            options.get("starting-offsets", "earliest").lower() == "latest"
        )
        # NOTE deliberately NO per-trigger rate limit: latestOffset() in
        # the Python stream-reader API takes no start offset, so a
        # snapshot clamp needs reader-instance state — and the engine
        # calls initialOffset/latestOffset/commit on instances and in
        # orders that make any such floor non-monotonic (observed: a
        # batch planned with an end BELOW the committed offset, which on
        # restart means re-read = duplicates). Until the API grows the
        # JVM side's ReadLimit-aware latestOffset(start, limit),
        # admission control belongs to the trigger (availableNow) and to
        # writer-side batch sizing — SURVEY.md §4.2.

    def _seqs(self) -> list[int]:
        return sorted(
            s["sequence-number"] for s in IcebergTable(self.location).snapshots()
        )

    def initialOffset(self) -> dict:
        if self.start_at_latest:
            seqs = self._seqs()
            return {"seq": seqs[-1] if seqs else 0}
        return {"seq": 0}

    def latestOffset(self) -> dict:
        seqs = self._seqs()
        return {"seq": seqs[-1] if seqs else 0}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        table = IcebergTable(self.location)
        files = table.appended_files(start["seq"], end["seq"])
        meta = table._read_metadata()
        res_by_sid = {
            sid: _resolution(table, meta, sid)
            for sid in {int(d.get("schema-id", 0)) for d in files}
        }
        return [
            FilePartition(
                d["file_path"], (), *res_by_sid[int(d.get("schema-id", 0))]
            )
            for d in files
        ]

    def read(self, partition: FilePartition) -> Iterator:
        # pyspark substitutes [None] for an empty partition list — an
        # empty table / fully-pruned / no-new-snapshot read must yield
        # zero rows, not crash on partition.file_path
        if partition is None:
            return
        yield from _read_file_batches(
            partition.file_path,
            self.arrow_schema,
            renames=getattr(partition, "renames", ()),
            absent=getattr(partition, "absent", ()),
        )

    def commit(self, end: dict) -> None:
        # offsets are durable in the query checkpoint; the table needs no
        # consumer-side bookkeeping (snapshots are immutable)
        return


CDC_COLS = ("_change_type", "_change_ordinal", "_commit_snapshot_id")


class IcebergChangelogStreamReader(IcebergStreamReader):
    """mode='changelog': the CDC stream of the table — every snapshot in
    the micro-batch's sequence range becomes its row-level insert/delete
    events (IcebergTable.changes semantics, planned as per-file executor
    tasks instead of a driver-side DataFrame union). Where the append
    stream REFUSES non-append history (a delete in range would be silent
    data loss for an append consumer), the changelog stream is how a
    downstream consumer correctly tails a table that takes deletes,
    merges, and compactions:

    - append snapshot      → added files read as 'insert' events
    - merge-on-read delete → 'delete-pos' tasks resolve the new position
                             deletes to rows (minus prior-named
                             positions, so trimmed carries never
                             re-announce)
    - equality delete / MoR upsert
                           → 'delete-eq' tasks value-match the new
                             tuples against still-live parent rows
                             under the data-sequence rule (null-safe,
                             identical to batch changes() — parity
                             tested)
    - copy-on-write delete / MERGE / overwrite
                           → removed files read as 'delete' events (with
                             the parent's MoR deletes applied), added
                             files as 'insert' events
    - replace (compaction/clustering) → nothing: bytes move, rows don't

    Offsets are the same snapshot sequence numbers as the append stream,
    so a range always resolves to the same events (snapshots are
    immutable) — exactly-once across restarts from the query checkpoint.
    Ordinals restart per micro-batch (they order commits WITHIN a
    batch); ``_commit_snapshot_id`` is the stable cross-batch identity.
    """

    def __init__(self, location: str, options: dict, schema: "StructType"):
        from pyspark.sql.types import StructType

        data_fields = [f for f in schema.fields if f.name not in CDC_COLS]
        super().__init__(location, options, StructType(data_fields))

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        table = IcebergTable(self.location)
        meta = table._read_metadata()
        snaps = sorted(
            (
                s
                for s in meta["snapshots"]
                if start["seq"] < s["sequence-number"] <= end["seq"]
            ),
            key=lambda s: s["sequence-number"],
        )
        prev: dict[str, dict] = {}
        if start["seq"]:
            base = next(
                (
                    s
                    for s in meta["snapshots"]
                    if s["sequence-number"] == start["seq"]
                ),
                None,
            )
            if base is None:
                raise ValueError(
                    f"changelog start snapshot (seq {start['seq']}) is gone "
                    f"from {self.location} — expired while the stream was "
                    "down; expire_snapshots retention must cover the "
                    "longest restart gap (re-seed from a fresh checkpoint)"
                )
            prev = {
                d["file_path"]: d
                for d in table._live_entries(base["snapshot-id"], meta=meta)
            }
        res_cache: dict[int, tuple] = {}

        def res(d: dict) -> tuple:
            sid = int(d.get("schema-id", 0))
            if sid not in res_cache:
                res_cache[sid] = _resolution(table, meta, sid)
            return res_cache[sid]

        from saber_spark.sources.iceberg_format import _cdc_diff

        cur_by_id = {f["id"]: f["name"] for f in table._schema_fields(meta)}

        def eq_spec(e: dict) -> tuple:
            wf = {
                f["id"]: f["name"]
                for f in table._schema_fields(meta, int(e.get("schema-id", 0)))
            }
            return (
                e["file_path"],
                int(e.get("data-seq", 0)),
                tuple((wf[i], cur_by_id[i]) for i in e["equality-ids"]),
            )

        parts: list[ChangePartition] = []
        for i, s in enumerate(snaps):
            cur = {
                d["file_path"]: d
                for d in table._live_entries(s["snapshot-id"], meta=meta)
            }
            if s["summary"]["operation"] == "replace":
                prev = cur
                continue
            sid = s["snapshot-id"]
            diff = _cdc_diff(prev, cur)  # same rules as batch changes()
            prev_dels = tuple(sorted(diff["prev_del_paths"]))
            new_dels = tuple(
                sorted(d["file_path"] for d in diff["added_dels"])
            )
            prev_eq = tuple(eq_spec(e) for e in diff["prev_eq"])
            new_eq = tuple(eq_spec(e) for e in diff["added_eq"])
            for d in diff["added_data"]:
                parts.append(
                    ChangePartition(
                        "insert", d["file_path"], (), (), *res(d), i, sid
                    )
                )
            for d in diff["removed_data"]:
                parts.append(
                    ChangePartition(
                        "delete-file", d["file_path"], prev_dels, (),
                        *res(d), i, sid,
                        eq_prior=prev_eq,
                        file_seq=int(d.get("data-seq", 0)),
                    )
                )
            for d in diff["delete_targets"]:
                parts.append(
                    ChangePartition(
                        "delete-pos", d["file_path"], new_dels, prev_dels,
                        *res(d), i, sid,
                        eq_prior=prev_eq,
                        file_seq=int(d.get("data-seq", 0)),
                    )
                )
            for d in diff["eq_targets"]:
                parts.append(
                    ChangePartition(
                        "delete-eq", d["file_path"], prev_dels, (),
                        *res(d), i, sid,
                        eq_prior=prev_eq,
                        eq_new=new_eq,
                        file_seq=int(d.get("data-seq", 0)),
                    )
                )
            prev = cur
        return parts

    def read(self, partition: ChangePartition) -> Iterator:
        if partition is None:
            return
        import numpy as np
        import pyarrow as pa

        p = partition
        eq_prior = getattr(p, "eq_prior", ())
        if p.kind == "insert":
            batches = _read_file_batches(
                p.file_path, self.arrow_schema, (), p.renames, p.absent
            )
            yield from _with_cdc_columns(
                batches, "insert", p.ordinal, p.snapshot_id
            )
            return
        if p.kind == "delete-file":
            batches = list(
                _read_file_batches(
                    p.file_path,
                    self.arrow_schema,
                    p.delete_paths,
                    p.renames,
                    p.absent,
                )
            )
        elif p.kind == "delete-pos":
            batches = list(
                _read_deleted_rows(
                    p.file_path,
                    self.arrow_schema,
                    p.delete_paths,
                    p.prior_delete_paths,
                    p.renames,
                    p.absent,
                )
            )
        else:  # delete-eq: still-live rows value-matching the new tuples
            batches = list(
                _read_file_batches(
                    p.file_path,
                    self.arrow_schema,
                    p.delete_paths,  # parent position deletes
                    p.renames,
                    p.absent,
                )
            )
        if not batches:
            return
        table = pa.Table.from_batches(batches, schema=self.arrow_schema)
        # rows already dead by value at the parent never re-announce
        table = _drop_eq_matches(table, eq_prior, p.file_seq)
        if p.kind == "delete-eq":
            if table.num_rows == 0:
                return
            mask = _eq_match_mask(
                table.to_pandas(), getattr(p, "eq_new", ()), p.file_seq
            )
            table = table.take(np.nonzero(mask)[0])
        if table.num_rows:
            yield from _with_cdc_columns(
                table.to_batches(), "delete", p.ordinal, p.snapshot_id
            )


class IcebergDataSource(DataSource):
    """``format("saber_iceberg")`` — batch + streaming reads of
    ``IcebergTable`` locations through Spark's planner."""

    @classmethod
    def name(cls) -> str:
        return "saber_iceberg"

    def _location(self) -> str:
        loc = self.options.get("location") or self.options.get("path")
        if not loc:
            raise ValueError(
                "saber_iceberg requires .option('location', <table dir>)"
            )
        return loc

    def _mode(self) -> str:
        mode = self.options.get("mode", "append").lower()
        if mode not in ("append", "changelog"):
            raise ValueError(
                f"saber_iceberg: unknown mode {mode!r} (append|changelog)"
            )
        return mode

    def schema(self) -> str:
        ddl = IcebergTable(self._location()).schema_ddl()
        if self._mode() == "changelog":
            ddl += (
                ", _change_type STRING, _change_ordinal INT,"
                " _commit_snapshot_id BIGINT"
            )
        return ddl

    def reader(self, schema: "StructType") -> IcebergBatchReader:
        if self._mode() == "changelog":
            raise ValueError(
                "saber_iceberg: mode='changelog' is a streaming read "
                "(readStream); batch CDC is IcebergTable.changes()"
            )
        return IcebergBatchReader(self._location(), dict(self.options), schema)

    def streamReader(self, schema: "StructType") -> IcebergStreamReader:
        cls = (
            IcebergChangelogStreamReader
            if self._mode() == "changelog"
            else IcebergStreamReader
        )
        return cls(self._location(), dict(self.options), schema)


def register_iceberg_source(spark) -> None:
    """Idempotent registration of the ``saber_iceberg`` format."""
    spark.dataSource.register(IcebergDataSource)
