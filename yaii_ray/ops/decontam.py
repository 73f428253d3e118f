"""Benchmark decontamination: flag/drop training docs that share any
word n-gram with an evaluation/benchmark set (the GPT-3-style 13-gram
overlap screen; n is a parameter — the gate oracles use 3-grams so the
synthetic corpus actually overlaps).

Scale shape: the benchmark side is SMALL (eval sets are 10^3-10^6
docs) and the training side is the 100 TB stream, so this is a
broadcast join, not a shuffle — the benchmark's distinct shingle-hash
set is computed once (distributed map + driver union of per-block
UNIQUE hashes), ``ray.put`` once, and every filter task tests
membership with ``np.searchsorted`` against the sorted broadcast
array. Nothing training-side ever shuffles or reaches the driver.

Shingles are :func:`yaii_ray.ops.dedup._shingle_hashes` word n-gram
SETS (64-bit pandas hash — the same exact-verification hash the
Jaccard stages use); docs with fewer than n words shingle to their
whole text, empty docs have no shingles and can never be contaminated,
matching the SQL twin's CTE semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from yaii_ray.ops.dedup import _shingle_hashes


def _bench_shingle_set(bench_ds, col: str, n: int) -> np.ndarray:
    """Sorted distinct shingle hashes of the benchmark side. Per-block
    shingling + per-block unique run distributed; only unique hashes
    (bounded by the benchmark's vocabulary, not its row count) ship to
    the driver for the final union."""

    def block_hashes(b: pa.Table) -> pa.Table:
        h, _ = _shingle_hashes(b[col].to_pylist(), n=n)
        return pa.table({"h": pa.array(np.unique(h), type=pa.uint64())})

    parts = bench_ds.map_batches(block_hashes, batch_format="pyarrow")
    df = parts.to_pandas()
    if "h" not in df.columns:
        # zero shingles on every block (empty/whitespace benchmark):
        # Ray drops the schema of an all-empty result (ADVICE r4)
        return np.zeros(0, dtype=np.uint64)
    return np.unique(df["h"].to_numpy().astype(np.uint64))


def decontaminate_ngrams(
    ds,
    bench_ds,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    keep: str = "clean",
):
    """Split ``ds`` against ``bench_ds`` by n-gram overlap.

    keep='clean' returns rows sharing NO n-gram with the benchmark
    (the decontaminated training set); keep='contaminated' returns the
    flagged rows. Lazy Dataset either way.
    """
    assert keep in ("clean", "contaminated")
    import ray

    bench_ref = ray.put(_bench_shingle_set(bench_ds, col, n))
    want_contaminated = keep == "contaminated"

    def filter_block(b: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        h, counts = _shingle_hashes(b[col].to_pylist(), n=n)
        if bench.size == 0:
            # degenerate benchmark (no shingles): nothing can be
            # contaminated, and indexing the empty array below would
            # raise (ADVICE r4)
            hit = np.zeros(h.size, dtype=bool)
        else:
            idx = np.searchsorted(bench, h)
            hit = (idx < bench.size) & (bench[np.minimum(idx, bench.size - 1)] == h)
        # any-hit per doc via segment sums over the flattened hits
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        per_doc = np.zeros(b.num_rows, dtype=bool)
        nz = counts > 0
        if nz.any():
            per_doc[nz] = np.add.reduceat(hit.astype(np.int64), starts[nz]) > 0
        mask = per_doc if want_contaminated else ~per_doc
        return b.filter(pa.array(mask))

    return ds.map_batches(filter_block, batch_format="pyarrow")
