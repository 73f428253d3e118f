"""F1 — continuous queries (the reference's only streaming feature).

Reference semantics (``QueryMode`` in yaii-types.ts:15-19; wiring in
base-inverted-index.ts:457-489): ``query(filter, …, mode)`` resolves
the filter over the CURRENT segments and/or an ``"added"`` event
stream — each ``add()`` emits the new segment range, and the SAME
filter is re-resolved against just that range. Sorted queries apply
the sorted top-N to the CURRENT part only (``op.take(actualLimit)``
then ``limit = undefined``); future matches stream unsorted and
unlimited. Unsorted limits count down across the whole concatenated
stream (``op.take(limit)`` over ``concat(current, future)``).

Batch-engine analog: :class:`ContinuousIndex` ingests one micro-batch
per ``add()``, builds an in-memory :class:`MemorySegment` with the
SAME termization as the on-disk build (``stages.termize``) and the
SAME resolver (``shards.PostingsResolver``), re-resolves every live
registration against just that batch, and returns the new matches.
``commit()`` persists the stream through the resumable ``build_index``
append path (S5): micro-batches spill to Parquet at ``add()`` time
(the reference's scheduled persist, base-inverted-index.ts:552-575),
and the unit plan being a pure function of the file list keeps doc
ids stable across commits and crashes.

Scale note: the un-committed tail (micro-batches since the last
commit) is driver-resident by design, exactly like the reference's
mutable in-memory segment — commit cadence bounds it. Historical /
backfill resolution belongs to the committed :class:`engine.Index`
(shard actors); this class only owns the streaming tail. Likewise a
registration's CURRENT part materializes its matches (the reference
API returns the full stream): for broad filters over a big committed
index, take the current side through ``Index.query`` /
``Index.docs_dataset`` (streaming, two-phase top-k) and register
FUTURE-only here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa

from yaii_ray import codec
from yaii_ray.config import Flags, IndexConfig
from yaii_ray.query import dsl, ir
from yaii_ray.shards import PostingsResolver
from yaii_ray.stages.termize import extract_postings

MODE_CURRENT = "current"
MODE_CURRENT_AND_FUTURE = "current_and_future"
MODE_FUTURE = "future"


class MemorySegment(PostingsResolver):
    """Postings over ONE in-memory micro-batch; resolves the same IR
    as an on-disk shard (same termizer, same resolver mixin), so a
    future-mode match is bit-identical to what a rebuild would find."""

    def __init__(self, table: pa.Table, doc_ids: np.ndarray, config: IndexConfig):
        part, _dl = extract_postings(table, doc_ids, config)
        keys = np.asarray(part["key"].to_pandas(), dtype=object)
        chunk = part["chunk"].to_numpy()
        order = np.lexsort((chunk, keys))
        part = part.take(pa.array(order, type=pa.int64()))
        self.keys = np.asarray(part["key"].to_pandas(), dtype=object)
        self.df = part["df"].to_numpy()
        self._cells = part
        self._doc_ids = np.sort(np.asarray(doc_ids, dtype=np.uint64))
        self._filter_cache: dict[str, np.ndarray] = {}

    def doc_ids(self) -> np.ndarray:
        return self._doc_ids

    def _decode_row(self, row: int) -> tuple:
        df = int(self.df[row])
        docs = codec.delta_decode_docs(self._cells["docs"][row].as_py(), df)
        tfs = codec.decode_tfs(self._cells["tfs"][row].as_py(), df)
        raw = self._cells["dls"][row].as_py()
        dls = codec.decode_tfs(raw, df) if raw else None
        return (docs, tfs, dls, None, None, None)


@dataclass
class _Registration:
    name: str
    filter: dsl.Query
    exp: ir.Exp
    mode: str
    sort: list | None
    columns: list[str] | None
    remaining: int | None  # unsorted-limit countdown; None = unlimited
    tables: list[pa.Table] = dc_field(default_factory=list)

    @property
    def exhausted(self) -> bool:
        return self.remaining == 0


class ContinuousIndex:
    """Micro-batch ingestion + registered continuous queries.

    ``index_dir=None`` runs a pure in-memory stream session;
    with a directory, ``commit()`` folds the stream into a normal
    on-disk index (incrementally — completed segments are skipped)
    and the committed part serves the CURRENT side of registrations.
    """

    def __init__(self, config: IndexConfig, index_dir: str | None = None):
        self.config = config
        self.index_dir = index_dir
        self._base = None  # lazy engine.Index over index_dir
        self._committed_files: list[str] = []
        self._committed_rows = 0
        self._batch_seq = 0
        if index_dir and os.path.exists(os.path.join(index_dir, "manifest.json")):
            from yaii_ray.build import load_manifest

            man = load_manifest(index_dir)
            units = [u for seg in man["segments"] for u in seg["units"]]
            self._committed_files = list(dict.fromkeys(u["path"] for u in units))
            self._committed_rows = sum(u["rows"] for u in units)
        self._next_doc = self._committed_rows
        self._segs: list[MemorySegment] = []
        self._tables: list[pa.Table] = []  # doc_id + stored columns
        self._offsets: list[int] = []
        self._stream_files: list[str] = []
        self._regs: dict[str, _Registration] = {}
        if index_dir:
            sdir = os.path.join(index_dir, "stream")
            os.makedirs(sdir, exist_ok=True)
            # numeric sort, NOT lexicographic: names are zero-padded to
            # 5 digits, so past seq 99999 "batch-100000" would sort
            # before "batch-99999" and recovery would reassign doc-id
            # ranges in the wrong order
            existing = sorted(
                (f for f in os.listdir(sdir) if f.endswith(".parquet")),
                key=lambda f: int(f.split("-")[1].split(".")[0]),
            )
            if existing:
                self._batch_seq = 1 + max(
                    int(f.split("-")[1].split(".")[0]) for f in existing
                )
            # crash recovery: stream batches spilled after the last
            # commit are NOT in the manifest — rebuild their in-memory
            # segments (name order == seq order == ingestion order, so
            # every batch gets back its pre-crash doc-id range) and
            # re-queue them so the next commit() folds them in instead
            # of silently dropping them / reissuing their ids.
            import pyarrow.parquet as pq

            committed = set(self._committed_files)
            for f in existing:
                path = os.path.join(sdir, f)
                if path in committed:
                    continue
                table = pq.read_table(path)
                n = table.num_rows
                ids = np.arange(
                    self._next_doc, self._next_doc + n, dtype=np.uint64
                )
                self._segs.append(MemorySegment(table, ids, self.config))
                self._tables.append(self._stored_view(table, ids))
                self._offsets.append(self._next_doc)
                self._stream_files.append(path)
                self._next_doc += n

    # ---- helpers ---------------------------------------------------

    def _stored_view(self, table: pa.Table, ids: np.ndarray) -> pa.Table:
        """doc_id + STORED fields — the stream twin of a docs block.
        Any input ``doc_id`` column is replaced by the dense internal
        id, exactly as the build pipeline does."""
        cols = [
            c
            for c in table.column_names
            if c != "doc_id"
            and (fc := self.config.resolve(c)).flags & Flags.STORED
            and not fc.flags & Flags.IGNORED
        ]
        out = table.select(cols)
        return out.add_column(0, "doc_id", pa.array(ids, type=pa.uint64()))

    def _base_index(self):
        if self._base is None and self._committed_rows:
            from yaii_ray.engine import Index

            self._base = Index(self.index_dir)
        return self._base

    def _fetch_cols(self, reg: _Registration) -> list[str] | None:
        if reg.columns is None:
            return None
        extra = [c.field for c in (reg.sort or [])]
        return list(dict.fromkeys(reg.columns + extra))

    def _project_stream(self, si: int, ids: np.ndarray, fetch) -> pa.Table:
        t = self._tables[si]
        local = (ids - np.uint64(self._offsets[si])).astype(np.int64)
        rows = t.take(pa.array(local, type=pa.int64()))
        if fetch is not None:
            rows = rows.select(
                ["doc_id"] + [c for c in fetch if c != "doc_id"]
            )
        return rows

    def _current_rows(self, reg: _Registration) -> pa.Table:
        fetch = self._fetch_cols(reg)
        parts: list[pa.Table] = []
        base = self._base_index()
        if base is not None:
            ids = base.resolve(reg.filter)
            parts.append(base.project(ids, columns=fetch))
        for si, seg in enumerate(self._segs):
            ids = seg.resolve(reg.exp)
            if ids.size:
                parts.append(self._project_stream(si, ids, fetch))
        if not parts:
            return self._empty_like(fetch)
        first = parts[0]
        parts = [p.select(first.column_names) for p in parts]
        return pa.concat_tables(parts)

    def _empty_like(self, fetch) -> pa.Table:
        if self._tables:
            t = self._tables[0]
            if fetch is not None:
                t = t.select(["doc_id"] + [c for c in fetch if c != "doc_id"])
            return t.schema.empty_table()
        return pa.table({"doc_id": pa.array([], type=pa.uint64())})

    # ---- API -------------------------------------------------------

    def register(
        self,
        name: str,
        filter: dsl.Query,
        mode: str = MODE_CURRENT_AND_FUTURE,
        sort: list | None = None,
        limit: int | None = None,
        columns: list[str] | None = None,
    ) -> pa.Table:
        """Register ``filter`` and return its CURRENT matches (empty
        for ``MODE_FUTURE``). Future matches accumulate via ``add()``
        into ``matches(name)``."""
        from yaii_ray.engine import plan, sort_table

        if mode not in (MODE_CURRENT, MODE_CURRENT_AND_FUTURE, MODE_FUTURE):
            raise ValueError(f"unknown mode: {mode}")
        if mode == MODE_FUTURE and sort:
            # reference semantics: sorting is meaningless over an
            # unbounded future stream, so FUTURE-mode registrations
            # reject sort clauses (base-inverted-index.ts:457-489)
            raise ValueError("sort is not supported in FUTURE mode")
        for c in columns or []:
            if c == "doc_id":
                continue
            fc = self.config.resolve(c)
            if fc.flags & Flags.IGNORED or not fc.flags & Flags.STORED:
                raise ValueError(f"column {c!r} is not a stored field")
        reg = _Registration(
            name=name, filter=filter, exp=plan(filter), mode=mode,
            sort=sort, columns=columns, remaining=None,
        )
        if mode == MODE_FUTURE:
            if limit is not None and not sort:
                reg.remaining = limit
            rows = pa.table({"doc_id": pa.array([], type=pa.uint64())})
        else:
            rows = self._current_rows(reg)
            if sort:
                rows = sort_table(rows, sort)
                if limit is not None:
                    # sorted top-N applies to the current part ONLY;
                    # the future stream is unlimited (reference drops
                    # `limit` after take(actualLimit))
                    rows = rows.slice(0, limit)
            elif limit is not None:
                rows = rows.slice(0, limit)
                reg.remaining = limit - rows.num_rows
            if columns is not None:
                # unconditional, like add(): a validated-but-absent
                # column raises here instead of silently skipping the
                # projection and diverging from the future schema
                rows = rows.select(
                    ["doc_id"] + [c for c in columns if c != "doc_id"]
                )
            reg.tables.append(rows)
        if mode != MODE_CURRENT:
            self._regs[name] = reg
        return rows

    def add(self, table: pa.Table) -> dict[str, pa.Table]:
        """Ingest one micro-batch; returns the NEW matches per live
        registration (the reference's "added"-event resolution)."""
        n = table.num_rows
        off = self._next_doc
        ids = np.arange(off, off + n, dtype=np.uint64)
        seg = MemorySegment(table, ids, self.config)
        stored = self._stored_view(table, ids)
        if self.index_dir:
            import pyarrow.parquet as pq

            path = os.path.join(
                self.index_dir, "stream", f"batch-{self._batch_seq:05d}.parquet"
            )
            pq.write_table(table, path)
            self._stream_files.append(path)
            self._batch_seq += 1
        self._segs.append(seg)
        self._tables.append(stored)
        self._offsets.append(off)
        self._next_doc += n

        out: dict[str, pa.Table] = {}
        for reg in self._regs.values():
            if reg.exhausted:
                continue
            got = seg.resolve(reg.exp)
            if not got.size:
                continue
            rows = self._project_stream(
                len(self._segs) - 1, got, self._fetch_cols(reg)
            )
            if reg.remaining is not None:
                rows = rows.slice(0, reg.remaining)
                reg.remaining -= rows.num_rows
            if reg.columns is not None:
                rows = rows.select(
                    ["doc_id"] + [c for c in reg.columns if c != "doc_id"]
                )
            if rows.num_rows:
                reg.tables.append(rows)
                out[reg.name] = rows
        return out

    def matches(self, name: str) -> pa.Table:
        """Everything the registration has yielded so far (current
        part first, then future matches in arrival order)."""
        reg = self._regs[name]
        tables = [t for t in reg.tables if t.num_rows] or reg.tables[:1]
        if not tables:
            return pa.table({"doc_id": pa.array([], type=pa.uint64())})
        first = tables[0]
        return pa.concat_tables([t.select(first.column_names) for t in tables])

    def unregister(self, name: str) -> None:
        self._regs.pop(name, None)

    def commit(self) -> str:
        """Fold the spilled stream into the on-disk index via the
        resumable ``build_index`` append (S5 commit): completed
        segments are skipped, only the trailing segment rebuilds."""
        if self.index_dir is None:
            raise ValueError("commit() needs index_dir")
        from yaii_ray.build import build_index

        files = self._committed_files + self._stream_files
        if not files:
            return self.index_dir
        build_index(files, self.index_dir, self.config)
        self._committed_files = files
        self._stream_files = []
        self._committed_rows = self._next_doc
        self._segs.clear()
        self._tables.clear()
        self._offsets.clear()
        if self._base is not None:
            self._base.close()
            self._base = None
        return self.index_dir

    def close(self) -> None:
        if self._base is not None:
            self._base.close()
            self._base = None
