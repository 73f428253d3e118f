"""Distributed BM25 scoring of a Dataset of queries against an
on-disk index (query-by-document at corpus scale).

``Index.search_many`` batches queries through the resident shard-actor
pool — right for interactive latency, but a *corpus-sized* query set
(every doc queried against an index for retrieval-based dedup, eval
sweeps, hard-negative mining) would funnel through one fixed pool and
its driver. This stage inverts that shape, Ray-Data-first: queries are
a ``Dataset``; each map-batches ACTOR opens the immutable index
read-only (term dictionaries eager, posting payloads via the same
byte-budgeted LRU the shard actors use — ``shards.py:144``) and scores
its partition of queries locally. Throughput scales with
``concurrency`` instead of the shard-pool size, nothing query-shaped
touches the driver, and on a multi-node cluster every worker reads the
index from shared storage.

Trade-off, documented: each scorer actor holds ALL shards' term
dictionaries (payloads stream through the LRU). The resident floor per
actor is the dictionary size; for a dictionary too large for that,
shrink ``payload_cache_bytes`` / partition the index into fewer, wider
shards — the posting working set stays LRU-bounded either way.

Per-query results are bitwise identical to ``Index.search`` (same
analyzer, df lookup, block-max WAND, (score desc, doc asc) tie-break)
— pinned by tests/test_ops.py and the ``bm25_query_ds`` driver oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class BM25DatasetScorer:
    """map_batches callable: (qid, query) rows -> (qid, rank, doc_id,
    score) top-k rows. Index open + dictionary load happen ONCE per
    actor in ``__init__``; ``__call__`` only scores."""

    def __init__(
        self,
        index_dir: str,
        field: str = "text",
        k: int = 10,
        query_col: str = "query",
        qid_col: str = "qid",
        filter=None,
        payload_cache_bytes: int = 1 << 30,
        decoded_cache_bytes: int = 512 << 20,
    ):
        from yaii_ray.engine import Index, plan
        from yaii_ray.shards import ShardState

        # Index here is used ONLY for its driver-free helpers
        # (manifest, field stats, analyzer, termstats df lookup) —
        # .actors is never touched, so no actor pool spawns per worker
        self.idx = Index(index_dir)
        m = self.idx.manifest
        nsh = m["num_shards"]
        self.states = [
            ShardState(
                m, s,
                max(64 << 20, payload_cache_bytes // nsh),
                max(32 << 20, decoded_cache_bytes // nsh),
            )
            for s in range(nsh)
        ]
        self.field, self.k = field, int(k)
        self.query_col, self.qid_col = query_col, qid_col
        self.doc_count, self.avgdl = self.idx.field_stats(field)
        # dsl queries are frozen dataclasses (picklable constructor
        # arg); planned ONCE per actor, applied as the WAND allowed-set
        # mask — global stats stay corpus-wide, matching Index.search
        self.filter_exp = plan(filter) if filter is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from yaii_ray import scoring

        queries = batch[self.query_col].to_pylist()
        qids = batch[self.qid_col].to_numpy(zero_copy_only=False)

        # analyze all queries, ONE df lookup over the union of terms
        per_q = [
            ["0" + t for t in self.idx._analyze_query(self.field, q or "")]
            for q in queries
        ]
        all_terms = sorted({t for terms in per_q for t in terms})
        dfs = self.idx.df_lookup(self.field, all_terms)

        out_qid: list[np.ndarray] = []
        out_rank: list[np.ndarray] = []
        out_doc: list[np.ndarray] = []
        out_score: list[np.ndarray] = []
        cfg = self.idx.config
        for qid, terms in zip(qids, per_q):
            terms = [t for t in terms if dfs.get(t, 0) > 0]
            if not terms:
                continue
            idfs = [
                float(scoring.bm25_idf(float(dfs[t]), self.doc_count))
                for t in terms
            ]
            parts = [
                st.search_bm25(
                    self.field, terms, idfs, self.k,
                    cfg.k1, cfg.b, self.avgdl, self.filter_exp,
                )
                for st in self.states
            ]
            docs = np.concatenate([p[0] for p in parts])
            scores = np.concatenate([p[1] for p in parts])
            docs, scores = scoring.topk(docs, scores, self.k)
            out_qid.append(np.full(docs.size, qid))
            out_rank.append(np.arange(1, docs.size + 1, dtype=np.int64))
            out_doc.append(docs)
            out_score.append(scores)

        if not out_qid:
            return pa.table(
                {
                    "qid": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.uint64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_qid).astype(np.int64)),
                "rank": pa.array(np.concatenate(out_rank)),
                "doc_id": pa.array(np.concatenate(out_doc), type=pa.uint64()),
                "score": pa.array(np.concatenate(out_score), type=pa.float64()),
            }
        )


def search_dataset(
    queries_ds,
    index_dir: str,
    field: str = "text",
    k: int = 10,
    query_col: str = "query",
    qid_col: str = "qid",
    filter=None,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 256,
):
    """Score every row of ``queries_ds`` (``qid_col``, ``query_col``)
    against the index at ``index_dir``; returns a Dataset of
    (qid, rank, doc_id, score) with at most k rows per query. Lazy —
    chain ``write_parquet`` / further stages without materializing."""
    return queries_ds.map_batches(
        BM25DatasetScorer,
        fn_constructor_kwargs=dict(
            index_dir=index_dir, field=field, k=k,
            query_col=query_col, qid_col=qid_col, filter=filter,
        ),
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )
