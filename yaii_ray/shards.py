"""Index shards — stateful query-side actors over doc-range partitions.

A shard owns every chunk ``c`` with ``c % num_shards == shard_id``;
since postings were written partitioned by shard, the shard holds ALL
terms for ITS docs (document-partitioned index). Consequences:

- boolean algebra (AND/OR/NOT) is fully shard-local on sorted u64
  doc-id arrays (np.intersect1d/union/setdiff — the vectorized
  counterpart of the reference's leapfrog/heap iterator ops,
  ``operations.ts:12-226``),
- BM25 top-k is shard-local block-max WAND + a tiny driver-side k-way
  merge; global statistics (df, N, avgdl) are computed once at build
  and passed IN with the query, so no cross-shard chatter at query
  time.

State lives in an actor (``IndexShardActor``): only the term
dictionary (sorted key array + row metadata) is loaded eagerly in
``__init__``; posting payload columns load lazily per bucket file and
decoded rows are memoized, both under LRU caps — the Ray-native
equivalent of the reference's memory-capped per-segment posting cache
(``immutable-segment.ts:87,311-331``). ``warmup()`` pre-faults files
up to the cap, so a shard whose working set fits memory serves at
fully-resident latency while an over-sized one degrades gracefully
instead of OOMing.

Block-max WAND (Ding & Suel, "Faster Top-k Document Retrieval Using
Block-Max Indexes", SIGIR 2011; WAND: Broder et al., CIKM 2003) here
is a *best-first windowed* variant: the doc
space is cut into windows, each window gets an upper bound from the
per-block (max tf, min dl) sidecars, and windows are scored in
descending upper-bound order until the bound falls below the running
k-th score — at which point NO remaining window can contain a top-k
doc, so the scan stops. Skipping is provably lossless (scores of
surviving windows are computed exactly), which is what makes
rank-AND-score-identical parity with the brute-force oracle testable.
"""

from __future__ import annotations

import bisect

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from yaii_ray import codec, scoring
from yaii_ray.query import ir
from yaii_ray.stages.termize import KEY_SEP


class PostingsResolver:
    """Boolean resolve (Q4-Q12) over any key-sorted posting store.

    Host contract: ``self.keys`` (key-sorted, bisectable sequence of
    ``field<KEY_SEP>term`` strings), ``self._filter_cache`` (dict),
    ``self.doc_ids()`` (sorted u64 universe) and ``self._decode_row(row)
    -> (docs, tfs, dls, blk_last, blk_maxtf, blk_mindl)``. Shared by
    the on-disk shard (:class:`ShardState`) and the in-memory
    micro-batch segment (:class:`yaii_ray.continuous.MemorySegment`),
    so continuous queries resolve with EXACTLY the on-disk semantics."""

    # ---- term dictionary ------------------------------------------

    def _span(self, key: str) -> tuple[int, int]:
        lo = bisect.bisect_left(self.keys, key)  # type: ignore[arg-type]
        hi = bisect.bisect_right(self.keys, key)  # type: ignore[arg-type]
        return lo, hi

    def _key_range_span(self, key_lo: str, key_hi: str) -> tuple[int, int]:
        lo = bisect.bisect_left(self.keys, key_lo)  # type: ignore[arg-type]
        hi = bisect.bisect_left(self.keys, key_hi)  # type: ignore[arg-type]
        return lo, hi

    def term_postings(self, field: str, term: str) -> tuple:
        """Concatenate chunk rows of (field, term) in doc order.
        -> (docs, tfs, dls, blk_last, blk_maxtf, blk_mindl)."""
        lo, hi = self._span(field + KEY_SEP + term)
        return self._concat_rows(range(lo, hi))

    def _concat_rows(self, rows) -> tuple:
        parts = [self._decode_row(r) for r in rows]
        if not parts:
            z = np.zeros(0, dtype=np.uint64)
            return z, z.copy(), None, None, None, None
        if len(parts) == 1:
            return parts[0]

        def cat(i):
            arrs = [p[i] for p in parts]
            return None if arrs[0] is None else np.concatenate(arrs)

        return tuple(cat(i) for i in range(6))

    # ---- boolean resolve (Q4-Q12) ----------------------------------

    def resolve(self, exp: ir.Exp) -> np.ndarray:
        """Exp tree -> sorted u64 doc-id array (store-local)."""
        if isinstance(exp, ir.AllExp):
            return self.doc_ids()
        if isinstance(exp, ir.NoneExp):
            return np.zeros(0, dtype=np.uint64)
        if isinstance(exp, ir.TermExp):
            return self.term_postings(exp.field, exp.term)[0]
        if isinstance(exp, ir.CachedExp):
            hit = self._filter_cache.get(exp.name)
            if hit is None:
                hit = self.resolve(exp.inner)
                self._filter_cache[exp.name] = hit
            return hit
        if isinstance(exp, ir.TermRangeExp):
            lo, hi = self._key_range_span(
                exp.field + KEY_SEP + exp.lo, exp.field + KEY_SEP + exp.hi
            )
            docs = self._concat_rows(range(lo, hi))[0]
            return np.unique(docs)
        if isinstance(exp, ir.TermContainsExp):
            # contiguous string-term slice of the sorted dictionary
            # (all string terms share the '0' prefix), then one
            # vectorized literal-substring kernel over the token parts
            prefix = exp.field + KEY_SEP + "0"
            lo, hi = self._key_range_span(prefix, exp.field + KEY_SEP + "1")
            if hi <= lo:
                return np.zeros(0, dtype=np.uint64)
            import pyarrow.compute as pc

            toks = pc.utf8_slice_codeunits(
                pa.array(list(self.keys[lo:hi]), type=pa.string()),
                start=len(prefix),
            )
            rows = np.flatnonzero(
                pc.match_substring(toks, exp.needle).to_numpy(zero_copy_only=False)
            )
            docs = self._concat_rows((lo + int(r) for r in rows))[0]
            return np.unique(docs)
        if isinstance(exp, ir.BoolExp):
            must_sets = [self.resolve(e) for e in exp.must]
            should_sets = [self.resolve(e) for e in exp.should]
            acc: np.ndarray | None = None
            if must_sets:
                must_sets.sort(key=len)
                acc = must_sets[0]
                for s in must_sets[1:]:
                    if acc.size == 0:
                        break
                    acc = snp_intersect(acc, s)
            if should_sets:
                union = (
                    np.unique(np.concatenate(should_sets))
                    if len(should_sets) > 1
                    else should_sets[0]
                )
                acc = union if acc is None else snp_intersect(acc, union)
            if acc is None:
                acc = self.doc_ids()
            for e in exp.must_not:
                if acc.size == 0:
                    break
                acc = snp_setdiff(acc, self.resolve(e))
            return acc
        raise TypeError(f"cannot resolve {type(exp).__name__}")


class ShardState(PostingsResolver):
    # resident-memory bounds (the Ray-native equivalent of the
    # reference's sizeInMemory-capped posting LRU,
    # immutable-segment.ts:87): payload columns stay resident up to
    # this byte budget per shard actor (evicted whole-file LRU)…
    PAYLOAD_CACHE_BYTES = 4 << 30
    # …and decoded posting rows are memoized up to this byte budget.
    DECODED_CACHE_BYTES = 2 << 30

    _PAYLOAD_COLS = ["docs", "tfs", "dls", "blk_last", "blk_maxtf", "blk_mindl"]

    def __init__(
        self,
        manifest: dict,
        shard_id: int,
        payload_cache_bytes: int | None = None,
        decoded_cache_bytes: int | None = None,
    ):
        from collections import OrderedDict

        if payload_cache_bytes is not None:
            self.PAYLOAD_CACHE_BYTES = int(payload_cache_bytes)
        if decoded_cache_bytes is not None:
            self.DECODED_CACHE_BYTES = int(decoded_cache_bytes)
        self.manifest = manifest
        self.shard_id = shard_id
        self.num_shards = manifest["num_shards"]
        self.chunk_shift = manifest["chunk_shift"]
        files = [
            p["path"]
            for seg in manifest["segments"]
            for p in seg["postings"]
            if p["shard"] == shard_id
        ]
        # eager: the term DICTIONARY only (key, chunk, df — small);
        # payload columns (posting binaries) load lazily per bucket
        # file, bounded by the LRU caps above, so a shard's resident
        # footprint is dictionary + working set, not the whole index
        metas = [pq.read_table(f, columns=["key", "chunk", "df"]) for f in files]
        self._files = files
        if metas:
            meta = pa.concat_tables(metas)
            keys = np.asarray(meta["key"].to_pandas(), dtype=object)
            chunk = meta["chunk"].to_numpy()
            df = meta["df"].to_numpy()
            file_idx = np.concatenate(
                [np.full(m.num_rows, i, dtype=np.int32) for i, m in enumerate(metas)]
            )
            local_row = np.concatenate(
                [np.arange(m.num_rows, dtype=np.int64) for m in metas]
            )
            order = np.lexsort((chunk, keys))
            self.keys: np.ndarray = keys[order]
            self.chunk = chunk[order]
            self.df = df[order]
            self._file_idx = file_idx[order]
            self._local_row = local_row[order]
        else:
            self.keys = np.zeros(0, dtype=object)
            self.chunk = np.zeros(0, np.int64)
            self.df = np.zeros(0, np.int64)
            self._file_idx = np.zeros(0, np.int32)
            self._local_row = np.zeros(0, np.int64)
        self._payloads: "OrderedDict[int, pa.Table]" = OrderedDict()
        self._payload_bytes = 0
        self._decoded_bytes = 0
        self._decoded: "OrderedDict[int, tuple]" = OrderedDict()
        self._filter_cache: dict[str, np.ndarray] = {}
        self._doc_ids: np.ndarray | None = None
        self._deleted: np.ndarray | None = None

    # ---- deleted mask (Q14) -----------------------------------------

    def deleted(self) -> np.ndarray:
        """This shard's slice of the tombstone set (sorted u64) —
        lazily loaded from the delete files the manifest lists. The
        reference masks deleted ids out of every resolved doc set at
        query time (``removeDeletedAndAddedAfter``, utils.ts:196-220);
        here the mask is applied once per top-level resolve (actor
        ``_resolve``) and as a denied-set filter inside WAND."""
        if self._deleted is None:
            parts = []
            for f in self.manifest.get("delete_files", []):
                arr = pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy()
                mask = (arr >> np.uint64(self.chunk_shift)) % np.uint64(
                    self.num_shards
                ) == np.uint64(self.shard_id)
                parts.append(arr[mask])
            self._deleted = (
                np.unique(np.concatenate(parts)).astype(np.uint64)
                if parts
                else np.zeros(0, dtype=np.uint64)
            )
        return self._deleted

    def add_delete_file(self, path: str) -> int:
        """Merge one more tombstone file into the live mask (called on
        open indexes when Index.delete() commits a new file)."""
        arr = pq.read_table(path, columns=["doc_id"])["doc_id"].to_numpy()
        mask = (arr >> np.uint64(self.chunk_shift)) % np.uint64(
            self.num_shards
        ) == np.uint64(self.shard_id)
        mine = arr[mask].astype(np.uint64)
        self._deleted = np.unique(np.concatenate([self.deleted(), mine]))
        return int(mine.size)

    def resolve_live(self, exp: ir.Exp) -> np.ndarray:
        """resolve() minus tombstoned ids — the Q14 public surface."""
        return snp_setdiff(self.resolve(exp), self.deleted())

    def _payload(self, file_idx: int) -> pa.Table:
        hit = self._payloads.get(file_idx)
        if hit is not None:
            self._payloads.move_to_end(file_idx)
            return hit
        t = pq.read_table(self._files[file_idx], columns=self._PAYLOAD_COLS)
        self._payloads[file_idx] = t
        self._payload_bytes += t.nbytes
        while self._payload_bytes > self.PAYLOAD_CACHE_BYTES and len(self._payloads) > 1:
            _, old = self._payloads.popitem(last=False)
            self._payload_bytes -= old.nbytes
        return t

    def warmup_payloads(self) -> int:
        """Pre-fault payload files into the LRU until the byte budget
        is reached — resident-grade query latency when the working set
        fits, bounded memory when it doesn't. Returns files resident."""
        for fi in range(len(self._files)):
            if self._payload_bytes >= self.PAYLOAD_CACHE_BYTES:
                break
            self._payload(fi)
            # _payload evicts DOWN to the cap after each insert, so the
            # budget check above may never fire on an over-budget shard;
            # once any eviction has happened (fewer resident files than
            # loaded), further warmup would just thrash the LRU
            if len(self._payloads) <= fi:
                break
        return len(self._payloads)

    def _decode_row(self, row: int) -> tuple:
        """-> (docs, tfs, dls, blk_last, blk_maxtf, blk_mindl) arrays."""
        hit = self._decoded.get(row)
        if hit is not None:
            self._decoded.move_to_end(row)
            return hit
        df = int(self.df[row])
        t = self._payload(int(self._file_idx[row]))
        r = int(self._local_row[row])
        docs = codec.delta_decode_docs(t["docs"][r].as_py(), df)
        tfs = codec.decode_tfs(t["tfs"][r].as_py(), df)
        dls_raw = t["dls"][r].as_py()
        dls = codec.decode_tfs(dls_raw, df) if dls_raw else None
        bl_raw = t["blk_last"][r].as_py()
        blk_last = codec.delta_decode_docs(bl_raw) if bl_raw else None
        mt_raw = t["blk_maxtf"][r].as_py()
        blk_maxtf = codec.decode_tfs(mt_raw) if mt_raw else None
        md_raw = t["blk_mindl"][r].as_py()
        blk_mindl = codec.decode_tfs(md_raw) if md_raw else None
        out = (docs, tfs, dls, blk_last, blk_maxtf, blk_mindl)
        self._decoded[row] = out
        self._decoded_bytes += sum(
            a.nbytes for a in out if isinstance(a, np.ndarray)
        )
        while self._decoded_bytes > self.DECODED_CACHE_BYTES and len(self._decoded) > 1:
            _, old = self._decoded.popitem(last=False)
            self._decoded_bytes -= sum(
                a.nbytes for a in old if isinstance(a, np.ndarray)
            )
        return out

    # ---- doc universe (for ALL / NOT) ------------------------------

    def doc_ids(self) -> np.ndarray:
        """All doc ids owned by this shard (sorted). Lazily loaded from
        the docs table's doc_id column (single-column Parquet read)."""
        if self._doc_ids is None:
            files = [
                p for seg in self.manifest["segments"] for p in seg["docs_files"]
            ]
            cols = []
            for f in files:
                arr = pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy()
                mask = (arr >> np.uint64(self.chunk_shift)) % np.uint64(
                    self.num_shards
                ) == np.uint64(self.shard_id)
                cols.append(arr[mask])
            self._doc_ids = (
                np.sort(np.concatenate(cols)) if cols else np.zeros(0, np.uint64)
            )
        return self._doc_ids

    # ---- BM25 block-max WAND (§2.11) -------------------------------

    def search_bm25(
        self,
        field: str,
        terms: list[str],
        idfs: list[float],
        k: int,
        k1: float,
        b: float,
        avgdl: float,
        filter_exp: ir.Exp | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Shard-local exact top-k by BM25 (see module docstring).

        ``terms`` MUST be sorted ascending (the driver guarantees it) —
        that fixes the float accumulation order for oracle parity.
        """
        postings = []
        for term, idf in zip(terms, idfs):
            docs, tfs, dls, blk_last, blk_maxtf, blk_mindl = self.term_postings(
                field, term
            )
            if docs.size == 0 or dls is None:
                continue
            postings.append((idf, docs, tfs, dls, blk_last, blk_maxtf, blk_mindl))
        if not postings:
            return np.zeros(0, np.uint64), np.zeros(0, np.float64)

        allowed = self.resolve(filter_exp) if filter_exp is not None else None
        if allowed is not None and allowed.size == 0:
            return np.zeros(0, np.uint64), np.zeros(0, np.float64)
        # Q14: tombstoned docs never surface, but global stats (df, N,
        # avgdl) stay frozen until compaction purges the postings —
        # the usual segment-index semantics (deleted docs stop matching
        # immediately; scores shift only after merge)
        denied = self.deleted()

        lo_doc = min(int(p[1][0]) for p in postings)
        hi_doc = max(int(p[1][-1]) for p in postings)
        span = hi_doc - lo_doc + 1
        # window grid: at most ~4096 windows over the occupied doc range
        w_shift = max(0, span.bit_length() - 12)
        nwin = (hi_doc >> w_shift) - (lo_doc >> w_shift) + 1
        w_base = lo_doc >> w_shift

        # window bound = Σ over terms of (max block contribution
        # overlapping the window) — paint each term's maxima into its
        # own array, then SUM across terms
        win_ub = np.zeros(nwin, dtype=np.float64)
        for idf, docs, tfs, dls, blk_last, blk_maxtf, blk_mindl in postings:
            ub = scoring.bm25_contrib(blk_maxtf, blk_mindl, idf, k1, b, avgdl)
            first_doc = np.empty_like(blk_last)
            first_doc[0] = docs[0]
            first_doc[1:] = blk_last[:-1] + np.uint64(1)
            w_lo = (first_doc >> np.uint64(w_shift)).astype(np.int64) - w_base
            w_hi = (blk_last >> np.uint64(w_shift)).astype(np.int64) - w_base
            spans = w_hi - w_lo + 1
            total_paint = int(spans.sum())
            term_ub = np.zeros(nwin, dtype=np.float64)
            if total_paint <= 4 * nwin + 4096:
                idx = _segment_indices(w_lo, spans)
                np.maximum.at(term_ub, idx, np.repeat(ub, spans))
            else:
                # sparse fallback: constant bound over the term's range
                term_ub[int(w_lo.min()) : int(w_hi.max()) + 1] = float(ub.max())
            win_ub += term_ub

        # best-first BATCHED window processing: 64 windows per vectorized
        # iteration (per-term gather via searchsorted + segment indices),
        # stop when the best remaining window bound < running k-th score.
        # Windows are disjoint doc ranges, so a doc's contributions are
        # never split across iterations and scores stay exact.
        order = np.argsort(-win_ub, kind="stable")
        order = order[win_ub[order] > 0.0]
        top_docs = np.zeros(0, dtype=np.uint64)
        top_scores = np.zeros(0, dtype=np.float64)
        kth = -np.inf
        BATCH = 64
        ptr = 0
        while ptr < order.size:
            if top_docs.size >= k and win_ub[order[ptr]] < kth:
                break  # no remaining window can beat the k-th score
            batch = order[ptr : ptr + BATCH]
            ptr += BATCH
            if top_docs.size >= k:
                batch = batch[win_ub[batch] >= kth]
            w_starts = ((batch.astype(np.int64) + w_base) << w_shift).astype(np.uint64)
            w_ends = (
                ((batch.astype(np.int64) + w_base + 1) << w_shift) - 1
            ).astype(np.uint64)
            docs_pt, contribs_pt = [], []
            for idf, docs, tfs, dls, *_ in postings:
                a = np.searchsorted(docs, w_starts, side="left")
                z = np.searchsorted(docs, w_ends, side="right")
                sizes = z - a
                if not sizes.any():
                    continue
                sel = _segment_indices(a[sizes > 0], sizes[sizes > 0])
                docs_pt.append(docs[sel])
                contribs_pt.append(
                    scoring.bm25_contrib(tfs[sel], dls[sel], idf, k1, b, avgdl)
                )
            cand_docs, cand_scores = scoring.combine_contributions(
                docs_pt, contribs_pt
            )
            if allowed is not None and cand_docs.size:
                mask = snp_member(cand_docs, allowed)
                cand_docs, cand_scores = cand_docs[mask], cand_scores[mask]
            if denied.size and cand_docs.size:
                mask = ~snp_member(cand_docs, denied)
                cand_docs, cand_scores = cand_docs[mask], cand_scores[mask]
            if cand_docs.size == 0:
                continue
            top_docs = np.concatenate([top_docs, cand_docs])
            top_scores = np.concatenate([top_scores, cand_scores])
            top_docs, top_scores = scoring.topk(top_docs, top_scores, k)
            if top_docs.size >= k:
                kth = top_scores[-1]
        return top_docs, top_scores


def _segment_indices(starts: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Concatenated arange(start_i, start_i + size_i)."""
    total = int(sizes.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.ones(total, dtype=np.int64)
    ends = np.cumsum(sizes)
    out_starts = ends - sizes
    idx[out_starts] = starts
    idx[out_starts[1:]] -= starts[:-1] + sizes[:-1] - 1
    return np.cumsum(idx)


def snp_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sorted-array intersection (galloping via searchsorted)."""
    if a.size > b.size:
        a, b = b, a
    idx = np.searchsorted(b, a)
    idx[idx == b.size] = 0
    return a[b[idx] == a]


def snp_setdiff(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if b.size == 0 or a.size == 0:
        return a
    idx = np.searchsorted(b, a)
    idx[idx == b.size] = 0
    return a[b[idx] != a]


def snp_member(a: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(sorted_set, a)
    idx[idx == sorted_set.size] = 0
    return sorted_set[idx] == a


def make_shard_actor():
    """ray.remote wrapper created lazily so importing this module never
    requires an initialized Ray."""
    import ray

    # num_cpus=0: shard actors are resident request servers that burst
    # CPU only while a query is in flight; reserving whole cores would
    # starve concurrently running Dataset build jobs (on a multi-node
    # cluster, pin them with num_cpus=1 and spread via scheduling
    # strategy instead).
    # max_restarts/max_task_retries: shard state is a PURE function of
    # (index_dir, shard_id) — the manifest is immutable once built — so
    # a crashed/preempted actor is safely rebuilt by Ray and the failed
    # query call retried (SURVEY.md §7 "actor restart semantics").
    @ray.remote(num_cpus=0, max_restarts=-1, max_task_retries=-1)
    class IndexShardActor:
        """One query shard held in actor memory (stateful stage)."""

        def __init__(
            self, index_dir: str, shard_id: int,
            payload_cache_bytes: int | None = None,
            decoded_cache_bytes: int | None = None,
        ):
            from yaii_ray.build import load_manifest

            self.state = ShardState(
                load_manifest(index_dir), shard_id,
                payload_cache_bytes, decoded_cache_bytes,
            )
            # tiny LRU over whole-expression resolves: a sorted+limited
            # query calls count() then resolve()/resolve_refs() with
            # the SAME exp — the second call must not redo the resolve
            # work (IR nodes are hashable by value). Results are
            # treated as immutable by every consumer.
            from collections import OrderedDict

            self._resolve_memo: "OrderedDict[ir.Exp, np.ndarray]" = OrderedDict()

        _RESOLVE_MEMO_SIZE = 4

        def _resolve(self, exp: ir.Exp) -> np.ndarray:
            hit = self._resolve_memo.get(exp)
            if hit is None:
                # resolve_live: tombstone mask applied ONCE at the top
                # of the exp tree (set algebra distributes over the
                # complement-intersection, so top-level == per-node)
                hit = self.state.resolve_live(exp)
                self._resolve_memo[exp] = hit
                while len(self._resolve_memo) > self._RESOLVE_MEMO_SIZE:
                    self._resolve_memo.popitem(last=False)
            else:
                self._resolve_memo.move_to_end(exp)
            return hit

        def add_deletes(self, path: str) -> int:
            """Pick up a tombstone file committed by Index.delete()
            without an actor restart. Masked-resolve memo entries are
            stale afterwards, so the memo is dropped."""
            n = self.state.add_delete_file(path)
            self._resolve_memo.clear()
            return n

        def resolve(self, exp: ir.Exp) -> np.ndarray:
            return self._resolve(exp)

        def count(self, exp: ir.Exp) -> int:
            """Match count only — no id array leaves the shard."""
            return int(self._resolve(exp).size)

        def resolve_head(self, exp: ir.Exp, limit: int) -> np.ndarray:
            """First ``limit`` matching ids (doc order) — bounds the
            driver merge for unsorted limited queries."""
            return self._resolve(exp)[:limit]

        def search_bm25(self, *args, **kw):
            return self.state.search_bm25(*args, **kw)

        def search_bm25_many(self, batch: list[tuple]) -> list[tuple]:
            """Whole query batch in ONE actor round-trip: on small
            clusters single-query p50 is dominated by the RPC floor,
            so throughput callers (eval sweeps, dedup-by-search)
            amortize it across the batch."""
            return [self.state.search_bm25(*args) for args in batch]

        def warmup(self) -> int:
            self.state.warmup_payloads()
            return len(self.state.keys)

    return IndexShardActor
