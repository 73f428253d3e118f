"""Index facade — open / search / query / project over a built index.

Mirrors the reference's public surface (``BaseInvertedIndex.query`` /
``aggregateQuery``, ``src/base-inverted-index.ts:297-497``) re-expressed
for a distributed index:

- the driver plans (DSL → IR → rewrite, pure — query/ir.py), looks up
  global term stats, and broadcasts the plan to the shard actor pool;
- shards answer with doc-id arrays (boolean) or local top-k
  (doc, score) pairs (BM25); the driver k-way merges — the same
  two-phase top-k the reference runs across segments
  (``base-inverted-index.ts:430-467``);
- winning rows are projected by reading only the docs-table files
  whose doc-id range overlaps the winners (manifest-driven pruning).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

from yaii_ray import scoring
from yaii_ray.build import load_manifest
from yaii_ray.config import IndexConfig
from yaii_ray.query import dsl, ir
from yaii_ray.shards import make_shard_actor
from yaii_ray.stages.termize import KEY_SEP


class Index:
    # above this many matches, sorted-limit queries switch to the
    # distributed two-phase top-k instead of a driver-side sort
    topk_scan_threshold = 10_000

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.manifest = load_manifest(index_dir)
        self.config = IndexConfig.from_json(self.manifest["config"])
        self._actors: list | None = None

    # ---- actor pool ------------------------------------------------

    # total posting-payload / decoded-memo budgets across the WHOLE
    # shard pool (split evenly per actor) — the pool is usually
    # co-located on one node in local mode, so the bounds must be
    # pool-wide, not per-actor
    pool_payload_budget_bytes = 16 << 30
    pool_decoded_budget_bytes = 8 << 30

    @property
    def actors(self) -> list:
        if self._actors is None:
            cls = make_shard_actor()
            nsh = self.manifest["num_shards"]
            per_shard = max(256 << 20, self.pool_payload_budget_bytes // nsh)
            per_shard_dec = max(128 << 20, self.pool_decoded_budget_bytes // nsh)
            self._actors = [
                cls.remote(self.index_dir, s, per_shard, per_shard_dec)
                for s in range(nsh)
            ]
        return self._actors

    def warmup(self) -> None:
        import ray

        ray.get([a.warmup.remote() for a in self.actors])

    def close(self) -> None:
        if self._actors:
            import ray

            for a in self._actors:
                ray.kill(a)
            self._actors = None

    # ---- global statistics ----------------------------------------

    def fields(self) -> dict:
        """Field name -> FieldConfig — the reference's
        ``listAllKnownField()`` (yaii-types.ts:26, schema is explicit
        here rather than lazily inferred)."""
        return dict(self.config.fields)

    def field_stats(self, field: str) -> tuple[int, float]:
        """(doc_count, avgdl) of a scored field."""
        st = self.manifest["stats"]["fields"][field]
        dc = st["doc_count"]
        return dc, (float(st["sum_dl"]) / dc if dc else 0.0)

    _TERMSTATS_CACHE_BYTES = 1 << 29  # keep term dict driver-resident below this

    def _termstats(self):
        """(sorted key array, df array) — cached in driver memory when
        the on-disk term dictionary is small enough, else None (lookups
        fall back to predicate-pushdown Parquet reads)."""
        if not hasattr(self, "_ts_arrays"):
            tdir = self.manifest.get("termstats_dir")
            self._ts_arrays = None
            if tdir:
                import glob as _glob

                files = sorted(_glob.glob(os.path.join(tdir, "*.parquet")))
                total = sum(os.path.getsize(f) for f in files)
                if total <= self._TERMSTATS_CACHE_BYTES:
                    t = pa.concat_tables(pq.read_table(f) for f in files)
                    keys = np.asarray(t["key"].to_pandas(), dtype=object)
                    dfs = t["sum(df)"].to_numpy()
                    order = np.argsort(keys)
                    self._ts_arrays = (keys[order], dfs[order])
        return self._ts_arrays

    def df_lookup(self, field: str, terms: list[str]) -> dict[str, int]:
        """Global df per term from the termstats table — driver-cached
        sorted-array lookup, or a predicate-pushdown read of the
        2-column Parquet dir when the dictionary is too big to cache.
        No shard involvement either way."""
        tdir = self.manifest.get("termstats_dir")
        if not tdir:
            return {}
        keys = [field + KEY_SEP + t for t in terms]
        out: dict[str, int] = {}
        cached = self._termstats()
        if cached is not None:
            skeys, sdfs = cached
            for k in keys:
                i = int(np.searchsorted(skeys, k))
                if i < skeys.size and skeys[i] == k:
                    out[k.split(KEY_SEP, 1)[1]] = int(sdfs[i])
            return out
        dataset = pa_ds.dataset(tdir)
        t = dataset.to_table(filter=pa_ds.field("key").isin(keys))
        for key, df in zip(t["key"].to_pylist(), t["sum(df)"].to_pylist()):
            out[key.split(KEY_SEP, 1)[1]] = int(df)
        return out

    # ---- BM25 search ----------------------------------------------

    def _analyze_query(self, field: str, query: str) -> list[str]:
        """Query terms through the FIELD'S OWN analyzer (sorted,
        deduped) — a query against a stemmed/custom-analyzed field must
        follow the same token pipeline the index did, or its terms
        never match. standard/standard_stop behave exactly as the
        previous tokenize_string path."""
        from yaii_ray.analysis.tokenizer import ensure_analyzers, get_analyzer

        ensure_analyzers(self.config.analyzers)
        fc = self.config.resolve(field)
        toks = get_analyzer(fc.analyzer)(pa.array([query], type=pa.string()))
        return sorted(set(toks[0].as_py()))

    def search(
        self,
        query: str,
        field: str = "text",
        k: int = 10,
        filter: dsl.Query | None = None,
        project: list[str] | None = None,
    ) -> pa.Table:
        """Top-k BM25 over ``field``. Tokenizes ``query`` with the
        field's analyzer semantics, fans out block-max WAND to the
        shard pool, k-way merges. Returns (doc_id, score [, columns])."""
        import ray

        raw_terms = self._analyze_query(field, query)
        terms = ["0" + t for t in raw_terms]
        dfs = self.df_lookup(field, terms)
        terms = [t for t in terms if dfs.get(t, 0) > 0]
        doc_count, avgdl = self.field_stats(field)
        idfs = [float(scoring.bm25_idf(float(dfs[t]), doc_count)) for t in terms]
        filter_exp = plan(filter) if filter is not None else None

        if terms:
            results = ray.get(
                [
                    a.search_bm25.remote(
                        field, terms, idfs, k,
                        self.config.k1, self.config.b, avgdl, filter_exp,
                    )
                    for a in self.actors
                ]
            )
            docs = np.concatenate([r[0] for r in results])
            scores = np.concatenate([r[1] for r in results])
            docs, scores = scoring.topk(docs, scores, k)
        else:
            docs = np.zeros(0, dtype=np.uint64)
            scores = np.zeros(0, dtype=np.float64)
        out = pa.table(
            {"doc_id": pa.array(docs, type=pa.uint64()),
             "score": pa.array(scores, type=pa.float64())}
        )
        if project:
            rows = self.project(docs, columns=project)
            for c in project:
                out = out.append_column(c, rows[c])
        return out

    def search_many(
        self,
        queries: list[str],
        field: str = "text",
        k: int = 10,
        filter: dsl.Query | None = None,
    ) -> list[pa.Table]:
        """Batched BM25: per-element identical to :meth:`search`, but
        the WHOLE batch ships in ONE RPC per shard actor. Single-query
        p50 on a small pool is dominated by the actor round-trip
        (~18 ms on this host); throughput callers (eval sweeps,
        query-by-document dedup) amortize it across the batch."""
        import ray

        doc_count, avgdl = self.field_stats(field)
        filter_exp = plan(filter) if filter is not None else None

        # driver-side stats for every query, one df lookup over the
        # union of terms
        per_q: list[list[str]] = []
        all_terms: set[str] = set()
        for q in queries:
            raw = self._analyze_query(field, q)
            per_q.append(["0" + t for t in raw])
            all_terms.update("0" + t for t in raw)
        dfs = self.df_lookup(field, sorted(all_terms))

        args: list[tuple] = []
        slots: list[int | None] = []  # batch position per query
        for terms in per_q:
            terms = [t for t in terms if dfs.get(t, 0) > 0]
            if not terms:
                slots.append(None)
                continue
            idfs = [
                float(scoring.bm25_idf(float(dfs[t]), doc_count)) for t in terms
            ]
            slots.append(len(args))
            args.append(
                (field, terms, idfs, k,
                 self.config.k1, self.config.b, avgdl, filter_exp)
            )

        per_shard = (
            ray.get([a.search_bm25_many.remote(args) for a in self.actors])
            if args
            else []
        )
        out: list[pa.Table] = []
        for slot in slots:
            if slot is None:
                docs = np.zeros(0, dtype=np.uint64)
                scores = np.zeros(0, dtype=np.float64)
            else:
                docs = np.concatenate([r[slot][0] for r in per_shard])
                scores = np.concatenate([r[slot][1] for r in per_shard])
                docs, scores = scoring.topk(docs, scores, k)
            out.append(
                pa.table(
                    {"doc_id": pa.array(docs, type=pa.uint64()),
                     "score": pa.array(scores, type=pa.float64())}
                )
            )
        return out

    # ---- deletes (Q14) ----------------------------------------------

    def delete(self, query: dsl.Query) -> int:
        """Tombstone every doc matching ``query`` — the reference's
        ``remove()`` / deleted-bitmap semantics (Q14,
        ``removeDeletedAndAddedAfter`` utils.ts:196-220,
        segment deleted set segment.ts:12-57). Deleted docs stop
        matching ALL queries (boolean, sorted, BM25, aggregates)
        immediately; global BM25 statistics (df, N, avgdl) stay frozen
        until :func:`yaii_ray.build.compact_index` physically purges
        the postings and recomputes stats — standard segment-index
        behavior. Returns the number of newly tombstoned docs.

        Durability: one sorted-doc_id Parquet file per call under
        ``deletes/`` plus an atomically replaced ``deletes.json``
        manifest — the same atomic-rename commit discipline as segment
        manifests, so a crash mid-delete leaves the index at the prior
        delete generation."""
        import ray

        ids = self.resolve(query)  # actor-masked: excludes prior deletes
        if ids.size == 0:
            return 0
        ddir = os.path.join(self.index_dir, "deletes")
        os.makedirs(ddir, exist_ok=True)
        dj = os.path.join(self.index_dir, "deletes.json")
        cur = {"files": [], "count": 0}
        if os.path.exists(dj):
            import json

            with open(dj) as f:
                cur = json.load(f)
        rel = os.path.join("deletes", f"del-{len(cur['files']):05d}.parquet")
        path = os.path.join(self.index_dir, rel)
        tmp = path + ".tmp"
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.uint64())}), tmp
        )
        os.replace(tmp, path)
        cur["files"].append(rel)
        cur["count"] = int(cur.get("count", 0)) + int(ids.size)
        import json

        jt = dj + ".tmp"
        with open(jt, "w") as f:
            json.dump(cur, f)
        os.replace(jt, dj)
        self.manifest.setdefault("delete_files", []).append(path)
        self.manifest["deleted_count"] = cur["count"]
        if self._actors is not None:
            ray.get([a.add_deletes.remote(path) for a in self._actors])
        return int(ids.size)

    def deleted_count(self) -> int:
        return int(self.manifest.get("deleted_count", 0))

    # ---- boolean / sorted queries ---------------------------------

    def resolve(self, query: dsl.Query) -> np.ndarray:
        """Matching doc ids (sorted u64) across all shards,
        materialized ON THE DRIVER — use only when the caller needs the
        ids themselves (small/selective filters). For broad filters
        feeding a scan, use :meth:`resolve_refs`; for counts,
        :meth:`count` (both keep ids off the driver)."""
        import ray

        exp = plan(query)
        if isinstance(exp, ir.NoneExp):
            return np.zeros(0, dtype=np.uint64)
        parts = ray.get([a.resolve.remote(exp) for a in self.actors])
        return np.sort(np.concatenate(parts)) if parts else np.zeros(0, np.uint64)

    def resolve_refs(self, query: dsl.Query) -> list:
        """Per-shard sorted match-id arrays as ObjectRefs. The ids stay
        in the object store (plasma, zero-copy to scan tasks); the
        driver holds only ``num_shards`` refs, so a filter matching
        10^11 docs costs the driver nothing. Feed to
        ``docs_dataset(doc_ids=...)``."""
        exp = plan(query)
        if isinstance(exp, ir.NoneExp):
            return []
        return [a.resolve.remote(exp) for a in self.actors]

    def count(self, query: dsl.Query) -> int:
        """Match count — summed shard-side, no id array ships."""
        import ray

        exp = plan(query)
        if isinstance(exp, ir.NoneExp):
            return 0
        return int(sum(ray.get([a.count.remote(exp) for a in self.actors])))

    def query(
        self,
        filter: dsl.Query,
        sort: list[dsl.SortClause] | None = None,
        limit: int | None = None,
        columns: list[str] | None = None,
    ) -> pa.Table:
        """Filter [+ sort] [+ limit] [+ projection] — the reference's
        ``query()`` (base-inverted-index.ts:408-497). Unsorted limited
        queries truncate in doc-id order (= ingestion order, matching
        the reference's arrival-order semantics)."""
        import ray

        exp = plan(filter)
        if sort is None and limit is not None:
            # each shard ships at most `limit` ids; driver merge is
            # bounded by num_shards x limit regardless of match breadth
            if isinstance(exp, ir.NoneExp):
                docs = np.zeros(0, dtype=np.uint64)
            else:
                heads = ray.get(
                    [a.resolve_head.remote(exp, limit) for a in self.actors]
                )
                docs = np.sort(np.concatenate(heads))[:limit]
        elif sort and limit is not None:
            docs = None  # broad path decided below on the shard-side count
        else:
            docs = self.resolve(filter)
        fetch = columns
        if columns is not None and sort:
            fetch = list(dict.fromkeys(columns + [c.field for c in sort]))
        # two-phase top-k (reference K2, base-inverted-index.ts:430-467):
        # when a sorted limit is requested over a large match set, run
        # per-block local top-k over the docs Dataset and only ship
        # ≤ k × n_blocks rows to the driver for the final merge. The
        # match ids stay in the object store (resolve_refs) — the
        # driver holds neither the ids nor the losing rows.
        if sort and limit is not None:
            n = self.count(filter)
            if n <= self.topk_scan_threshold:
                docs = self.resolve(filter)
        if sort and limit is not None and docs is None:
            ds = self.docs_dataset(columns=fetch, doc_ids=self.resolve_refs(filter))
            k = limit

            def local_topk(b, sort=sort, k=k):
                if not len(b):
                    return b
                return sort_pandas(b, sort).head(k)

            parts = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
            rows = pa.Table.from_pandas(
                sort_pandas(parts, sort).head(k).reset_index(drop=True),
                preserve_index=False,
            )
        else:
            rows = self.project(docs, columns=fetch)
            if sort:
                rows = sort_table(rows, sort)
                if limit is not None:
                    rows = rows.slice(0, limit)
        if sort and columns is not None:
            rows = rows.select(["doc_id"] + [c for c in columns if c != "doc_id"])
        return rows

    # ---- dataset view (scalable scan path) -------------------------

    def docs_dataset(self, columns: list[str] | None = None, doc_ids=None):
        """The docs table as a streaming ``ray.data.Dataset``, optionally
        column-pruned and filtered to an index result.

        ``doc_ids`` is either a sorted array (selective filters —
        broadcast ONCE via ``ray.put``) or a list of per-shard
        ObjectRefs from :meth:`resolve_refs` (broad filters — the ids
        never touch the driver; each scan task reads the shard arrays
        zero-copy from the object store). Either way each batch applies
        a vectorized ``searchsorted`` membership mask — no per-batch
        re-shipping, no shuffle for the filter itself."""
        import ray
        import ray.data

        files = [p for seg in self.manifest["segments"] for p in seg["docs_files"]]
        cols = None
        if columns is not None:
            cols = ["doc_id"] + [c for c in columns if c != "doc_id"]
        ds = ray.data.read_parquet(files, columns=cols)
        if doc_ids is None and self.manifest.get("delete_files"):
            # Q14: the raw scan must not surface tombstoned rows (the
            # resolve paths already mask shard-side). Broadcast the
            # tombstone union once; per-batch exclusion is one
            # vectorized searchsorted.
            from yaii_ray.build import load_deleted

            dref = ray.put(load_deleted(self.manifest))

            def drop_deleted(batch: pa.Table) -> pa.Table:
                dele = ray.get(dref)
                ids = batch["doc_id"].to_numpy()
                idx = np.searchsorted(dele, ids)
                idx[idx == dele.size] = 0
                return batch.filter(pa.array(dele[idx] != ids))

            ds = ds.map_batches(drop_deleted, batch_format="pyarrow")
        if doc_ids is not None:
            if isinstance(doc_ids, list):  # per-shard ObjectRefs
                refs = doc_ids
            else:
                refs = [ray.put(np.asarray(doc_ids, dtype=np.uint64))]

            def keep(batch: pa.Table) -> pa.Table:
                ids = batch["doc_id"].to_numpy()
                mask = np.zeros(len(ids), dtype=bool)
                for r in refs:  # shard id-sets are disjoint: OR of masks
                    allowed = ray.get(r)
                    if allowed.size:
                        idx = np.searchsorted(allowed, ids)
                        idx[idx == allowed.size] = 0
                        mask |= allowed[idx] == ids
                return batch.filter(pa.array(mask))

            ds = ds.map_batches(keep, batch_format="pyarrow")
        return ds

    def aggregate(self, filter: dsl.Query, aggs: list) -> dict:
        """G1-G4 aggregations over matching docs (yaii_ray.aggs)."""
        from yaii_ray import aggs as aggs_mod

        return aggs_mod.aggregate(self, filter, aggs)

    # ---- projection (M5) ------------------------------------------

    def project(
        self, doc_ids: np.ndarray, columns: list[str] | None = None
    ) -> pa.Table:
        """Fetch doc rows by id, returned in the order of ``doc_ids``.
        Reads only docs files whose dense-id range overlaps."""
        want = np.asarray(doc_ids, dtype=np.uint64)
        order = np.argsort(want, kind="stable")
        sorted_want = want[order]
        tables = []
        for seg in self.manifest["segments"]:
            for u, path in zip(seg["units"], seg["docs_files"]):
                lo, hi = u["doc_base"], u["doc_base"] + u["rows"]
                a = np.searchsorted(sorted_want, np.uint64(lo), side="left")
                z = np.searchsorted(sorted_want, np.uint64(hi), side="left")
                if z <= a:
                    continue
                cols = (["doc_id"] + [c for c in columns if c != "doc_id"]) if columns else None
                t = pq.read_table(path, columns=cols)
                ids = t["doc_id"].to_numpy()
                mask = np.isin(ids, sorted_want[a:z])
                tables.append(t.filter(pa.array(mask)))
        if not tables:
            schema = pq.read_schema(self.manifest["segments"][0]["docs_files"][0])
            if columns:
                schema = pa.schema([schema.field(c) for c in (["doc_id"] + [c for c in columns if c != "doc_id"])])
            return schema.empty_table()
        got = pa.concat_tables(tables)
        # restore requested order
        got_ids = got["doc_id"].to_numpy()
        pos = {int(d): i for i, d in enumerate(got_ids)}
        take = [pos[int(d)] for d in want if int(d) in pos]
        return got.take(pa.array(take, type=pa.int64()))


def plan(query: dsl.Query) -> ir.Exp:
    """DSL → rewritten IR (pure, driver-side)."""
    return ir.build_expression(query)


def collation_base_key(s: str) -> str:
    """Sort key approximating ICU primary strength (the reference's
    ``Intl.Collator(..., sensitivity: 'base')``, utils.ts:41-47):
    NFKD-decompose, drop combining marks (accents), casefold. 'Äpfel'
    -> 'apfel', 'éclair'/'Eclair' -> 'eclair', 'ß' -> 'ss'. Known
    approximation: non-Latin scripts and punctuation keep codepoint
    order rather than full ICU root-collation weights."""
    import unicodedata

    return "".join(
        ch
        for ch in unicodedata.normalize("NFKD", s)
        if not unicodedata.combining(ch)
    ).casefold()


def _sort_value(v):
    """Reference comparator operand: a multi-valued field sorts by its
    FIRST element (utils.ts:128-135 ``Array.isArray(...) ? el[0]``)."""
    import numpy as _np

    if isinstance(v, (list, _np.ndarray)):
        return v[0] if len(v) else None
    return v


def sort_pandas(df, clauses: list[dsl.SortClause]):
    for cl in reversed(clauses):
        col = cl.field
        vals = df[cl.field]
        if vals.dtype == object:
            vals = vals.map(_sort_value)
            collation = getattr(cl, "collation", None)
            if collation == "base":
                vals = vals.map(
                    lambda v: collation_base_key(v) if isinstance(v, str) else v
                )
            elif collation == "icu":
                # exact DUCET-subset primary order (punctuation /
                # symbol / digit / letter classes, æ/œ/ø/ß foldings) —
                # see analysis/collate.py for the covered subset
                from yaii_ray.analysis.collate import ducet_primary_key

                vals = vals.map(
                    lambda v: ducet_primary_key(v) if isinstance(v, str) else v
                )
            col = "__collation_key__"
            df = df.assign(**{col: vals})
        df = df.sort_values(
            col,
            ascending=(cl.dir == dsl.ASC),
            na_position=("first" if cl.dir == dsl.ASC else "last"),
            kind="stable",
        )
        if col != cl.field:
            df = df.drop(columns=[col])
    return df


def sort_table(table: pa.Table, clauses: list[dsl.SortClause]) -> pa.Table:
    """Multi-clause stable sort with the reference's null semantics:
    missing values are smallest (undefined < everything,
    ``utils.ts:122-184``), so DESC puts them last. String clauses sort
    by codepoint by default; ``SortClause(collation="base")`` applies
    the Intl.Collator-equivalent case/accent-insensitive order
    (:func:`collation_base_key`)."""
    df = sort_pandas(table.to_pandas(), clauses)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
