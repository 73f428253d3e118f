"""BM25 scoring + top-k kernels, shared by the engine AND the oracle.

The parity requirement (BASELINE.md: "rank-identical top-k docIDs and
scores vs exact-scoring oracle") is met by construction: the block-max
WAND path and the brute-force oracle call the SAME ``bm25_contrib``
kernel (same float64 expression tree) and accumulate per-doc
contributions in the SAME order (query terms sorted ascending by term
string, summed left-to-right via ``np.add.reduceat``), so scores are
bitwise identical, not merely close.

Formula (public formulation: Robertson & Zaragoza, "The Probabilistic
Relevance Framework: BM25 and Beyond", FnTIR 2009; the +1 idf variant
popularized by Lucene — SURVEY.md §2.11):
    idf      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm  = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d) = Σ_t idf_t * tf_norm(t, d)
yaii itself has no scoring concept (grep finds no bm25/idf — SURVEY.md
"critical scope finding"); this layer is the north rule's addition.
"""

from __future__ import annotations

import numpy as np


def bm25_idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_contrib(
    tf: np.ndarray,
    dl: np.ndarray,
    idf: float,
    k1: float,
    b: float,
    avgdl: float,
) -> np.ndarray:
    """idf * tf_norm, float64. The ONE expression both paths share."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)))


def combine_contributions(
    docs_per_term: list[np.ndarray], contribs_per_term: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Sum per-term contributions per doc, deterministically.

    Inputs MUST be in ascending-term order; within each doc the sum
    runs over terms in that order (stable argsort keeps concatenation
    order among equal docs), so float addition order is reproducible.
    Returns (unique sorted docs, scores).
    """
    if not docs_per_term:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.float64)
    docs = np.concatenate(docs_per_term)
    contribs = np.concatenate(contribs_per_term)
    if docs.size == 0:
        return docs.astype(np.uint64), contribs
    order = np.argsort(docs, kind="stable")
    docs = docs[order]
    contribs = contribs[order]
    boundary = np.empty(docs.size, dtype=bool)
    boundary[0] = True
    boundary[1:] = docs[1:] != docs[:-1]
    starts = np.flatnonzero(boundary)
    scores = np.add.reduceat(contribs, starts)
    return docs[starts], scores


def topk(
    docs: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (score desc, doc asc) — the engine-wide tie-break."""
    if docs.size == 0 or k <= 0:
        return docs[:0], scores[:0]
    if docs.size > k:
        # keep every doc scoring >= the k-th best so score ties are
        # broken deterministically by doc id in the final lexsort
        kth = scores[np.argpartition(-scores, k - 1)[k - 1]]
        keep = np.flatnonzero(scores >= kth)
        docs, scores = docs[keep], scores[keep]
    order = np.lexsort((docs, -scores))[:k]
    return docs[order], scores[order]
