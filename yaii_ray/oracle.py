"""Exact brute-force oracles computed from the RAW corpus.

These never touch the index — they recompute statistics and scores
from first principles with the same tokenizer (analysis/tokenizer.py)
and the same float kernel (scoring.bm25_contrib), and are the parity
targets for:

- BM25: engine WAND top-k must be rank- AND score-identical
  (bitwise float64) — SURVEY.md §5 test plan item 2,
- boolean queries: engine doc-id sets must equal the scan results —
  the stand-in for yaii's golden system tests, which our golden-corpus
  tests port directly (``test/system/test-index.ts``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from yaii_ray import scoring
from yaii_ray.analysis.tokenizer import tokenize_string
from yaii_ray.config import IndexConfig


class BruteForceBM25:
    """In-memory exact scorer over one text column of an Arrow table."""

    def __init__(
        self,
        table: pa.Table,
        field: str,
        doc_ids: np.ndarray,
        config: IndexConfig,
        stopwords: bool = True,
    ):
        self.k1 = config.k1
        self.b = config.b
        self.doc_ids = np.asarray(doc_ids, dtype=np.uint64)
        texts = table[field].to_pylist()
        self.postings: dict[str, dict[int, int]] = {}
        self.dl = np.zeros(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            if text is None:
                continue
            toks = tokenize_string(text, stopwords=stopwords)
            self.dl[i] = len(toks)
            for t in toks:
                self.postings.setdefault(t, {}).setdefault(i, 0)
                self.postings[t][i] += 1
        self.doc_count = int((self.dl > 0).sum())
        self.avgdl = float(self.dl.sum()) / self.doc_count if self.doc_count else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def search(self, query: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """Top-k by (score desc, doc asc), scores bitwise-reproducible:
        terms sorted ascending, contributions summed in that order."""
        terms = sorted(set(tokenize_string(query, stopwords=True)))
        docs_pt, contribs_pt = [], []
        for t in terms:
            post = self.postings.get(t)
            if not post:
                continue
            local = np.array(sorted(post.keys()), dtype=np.int64)
            tf = np.array([post[i] for i in local], dtype=np.int64)
            idf = float(scoring.bm25_idf(float(len(post)), self.doc_count))
            docs_pt.append(self.doc_ids[local])
            contribs_pt.append(
                scoring.bm25_contrib(
                    tf, self.dl[local], idf, self.k1, self.b, self.avgdl
                )
            )
        docs, scores = scoring.combine_contributions(docs_pt, contribs_pt)
        return scoring.topk(docs, scores, k)
