"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does ONE matmul and emits
  its local top-k rows, the driver merges ≤ (k × n_blocks) partials.
  This is the correctness baseline and is already the right *shape*
  at scale (no shuffle, no materialization).
- :class:`IVFIndex` — the scale path (inverted-file indexing à la
  Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
  Search", TPAMI 2011 — coarse quantizer only, no PQ compression
  here): k-means coarse quantizer
  (seeded, trained on a driver-side sample), assignments computed by a
  vectorized ``map_batches`` pass and written as bucket-partitioned
  state; queries probe the ``nprobe`` nearest centroids only. Exact
  within probed buckets, so recall -> 1 as nprobe -> nlist (tested
  against brute in tests/test_ops.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from yaii_ray.ops.dedup import _embedding_matrix, _normalize, _vec_matrix


def brute_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k for each query row.

    -> DataFrame (query, vec_id, rank, cosine), deterministic
    tie-break (cosine desc, vec_id asc)."""
    import ray

    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    qref = ray.put(Q)

    def local_topk(b: pa.Table) -> pa.Table:
        Qm = ray.get(qref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        V = _normalize(_vec_matrix(b[vec_col]))
        sims = Qm @ V.T  # (nq, nb)
        nq, nb = sims.shape
        kk = min(k, nb)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = {
            "query": np.repeat(np.arange(nq, dtype=np.int64), kk),
            "vec_id": ids[part.ravel()],
            "cosine": np.take_along_axis(sims, part, axis=1).ravel(),
        }
        return pa.table(rows)

    parts = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = []
    for q, g in parts.groupby("query"):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    return (
        pd.concat(out)[["query", "vec_id", "rank", "cosine"]].reset_index(drop=True)
        if out
        else pd.DataFrame({"query": [], "vec_id": [], "rank": [], "cosine": []})
    )


class IVFIndex:
    """Inverted-file ANN: seeded k-means centroids + bucketed vectors.

    Built ONCE (driver samples ≤ ``train_size`` vectors for k-means;
    assignment is a streaming map_batches), held in memory here; at
    cluster scale each bucket would be its own parquet partition /
    shard actor, probed the same way.
    """

    def __init__(self, nlist: int = 16, iters: int = 10, seed: int = 13, train_size: int = 100_000):
        self.nlist = nlist
        self.iters = iters
        self.seed = seed
        self.train_size = train_size

    def fit(self, ds, id_col: str = "vec_id", vec_col: str = "embedding") -> "IVFIndex":
        mat, ids = _embedding_matrix(ds, id_col, vec_col)
        rng = np.random.default_rng(self.seed)
        sample = mat[rng.choice(mat.shape[0], min(self.train_size, mat.shape[0]), replace=False)]
        C = sample[rng.choice(sample.shape[0], min(self.nlist, sample.shape[0]), replace=False)].copy()
        for _ in range(self.iters):
            assign = np.argmax(sample @ C.T, axis=1)
            for j in range(C.shape[0]):
                m = assign == j
                if m.any():
                    C[j] = sample[m].mean(axis=0)
            C = _normalize(C)
        self.centroids = C
        assign = np.argmax(mat @ C.T, axis=1)
        order = np.argsort(assign, kind="stable")
        self._ids = ids[order]
        self._vecs = mat[order]
        self._bounds = np.searchsorted(assign[order], np.arange(C.shape[0] + 1))
        return self

    def search(self, queries: np.ndarray, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
        Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
        out = []
        cd = Q @ self.centroids.T
        for qi in range(Q.shape[0]):
            probes = np.argsort(-cd[qi], kind="stable")[:nprobe]
            segs = [
                (self._ids[self._bounds[p] : self._bounds[p + 1]],
                 self._vecs[self._bounds[p] : self._bounds[p + 1]])
                for p in probes
            ]
            ids = np.concatenate([s[0] for s in segs]) if segs else np.zeros(0, np.int64)
            V = np.concatenate([s[1] for s in segs]) if segs else np.zeros((0, Q.shape[1]))
            if not len(ids):
                continue
            sims = V @ Q[qi]
            order = np.lexsort((ids, -sims))[:k]
            out.append(
                pd.DataFrame(
                    {
                        "query": qi,
                        "vec_id": ids[order],
                        "rank": np.arange(1, len(order) + 1),
                        "cosine": sims[order],
                    }
                )
            )
        return (
            pd.concat(out).reset_index(drop=True)
            if out
            else pd.DataFrame({"query": [], "vec_id": [], "rank": [], "cosine": []})
        )


class LSHIndex:
    """Random-hyperplane LSH for cosine ANN (Charikar, "Similarity
    Estimation Techniques from Rounding Algorithms", STOC 2002):
    signature bit i = sign(v . h_i); vectors bucketed by signature.
    Queries probe the query's own bucket plus the ``probes-1`` buckets
    reached by flipping the lowest-|margin| signature bits (multi-probe
    LSH, Lv et al., VLDB 2007), then exact-rescore candidates.

    Like :class:`IVFIndex`, held in memory here; the scale path writes
    one parquet partition per signature prefix and probes those files /
    shard actors the same way.

    ``search`` returns NO rows for a query whose probed buckets are all
    empty (possible for out-of-corpus vectors with few probes) — group
    per-query results with that in mind.
    """

    def __init__(self, nbits: int = 12, seed: int = 29):
        self.nbits = nbits
        self.seed = seed

    def fit(self, ds, id_col: str = "vec_id", vec_col: str = "embedding") -> "LSHIndex":
        mat, ids = _embedding_matrix(ds, id_col, vec_col)
        rng = np.random.default_rng(self.seed)
        self.planes = rng.standard_normal((self.nbits, mat.shape[1]))
        sigs = self._signature(mat)
        order = np.argsort(sigs, kind="stable")
        self._ids = ids[order]
        self._vecs = mat[order]
        self._sigs = sigs[order]
        return self

    def _signature(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return (bits.astype(np.uint64) << np.arange(self.nbits, dtype=np.uint64)).sum(axis=1)

    def search(self, queries: np.ndarray, k: int = 10, probes: int = 8) -> pd.DataFrame:
        Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
        margins = Q @ self.planes.T  # signed distance to each plane
        out = []
        for qi in range(Q.shape[0]):
            base = np.uint64(
                ((margins[qi] > 0).astype(np.uint64)
                 << np.arange(self.nbits, dtype=np.uint64)).sum()
            )
            flip_order = np.argsort(np.abs(margins[qi]), kind="stable")
            cand_sigs = [base]
            for b in flip_order[: max(0, probes - 1)]:
                cand_sigs.append(base ^ (np.uint64(1) << np.uint64(b)))
            idxs = []
            for s in cand_sigs:
                a = np.searchsorted(self._sigs, s, side="left")
                z = np.searchsorted(self._sigs, s, side="right")
                if z > a:
                    idxs.append(np.arange(a, z))
            if not idxs:
                continue
            sel = np.concatenate(idxs)
            ids = self._ids[sel]
            sims = self._vecs[sel] @ Q[qi]
            order = np.lexsort((ids, -sims))[:k]
            out.append(
                pd.DataFrame(
                    {
                        "query": qi,
                        "vec_id": ids[order],
                        "rank": np.arange(1, len(order) + 1),
                        "cosine": sims[order],
                    }
                )
            )
        return (
            pd.concat(out).reset_index(drop=True)
            if out
            else pd.DataFrame({"query": [], "vec_id": [], "rank": [], "cosine": []})
        )
