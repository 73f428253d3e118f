"""Deduplication operators over a text (or embedding) column.

Public algorithm sources: MinHash (Broder, "On the resemblance and
containment of documents", 1997), LSH banding (Leskovec/Rajaraman/
Ullman, *Mining of Massive Datasets* ch. 3), SimHash (Charikar, STOC
2002; Manku et al., WWW 2007 for the Hamming-band trick).

Scale shapes (ray_guide "Aggregation at scale" / LSH pattern):

- exact:      content hash per batch -> ``groupby(hash)`` -> keep the
              min-id row per group. One shuffle on the hash key.
- MinHash-LSH: shingle -> minhash signature per batch (vectorized,
              deterministic) -> explode to (band, band_hash, doc)
              rows -> ``groupby(band, band_hash)`` -> candidate pairs
              -> exact-Jaccard verify. Hot buckets are inherently
              bounded by banding; candidate verification is the only
              quadratic step and runs per bucket.
- n-gram Jaccard (exact): inverted shingle index -> pairs sharing a
              shingle -> verify. Exact (any pair with J >= tau > 0
              shares a shingle) but quadratic in hot-shingle buckets —
              use for oracle-sized data; MinHash-LSH is the scale path.
- SimHash:    64-bit signature; near-dups = Hamming distance <= t,
              bucketed by masking bit-bands (pigeonhole over t+1
              bands guarantees recall 1.0 for distance <= t).
- embedding:  cosine >= tau pairs via blocked matmul against a
              broadcast matrix (small side) — the brute path; ANN
              bucketing (ops/ann.py) is the scale path.

All hashing is deterministic across processes (pandas.util.hash_array
with its fixed key; md5 for content hashes), so resumed/distributed
runs agree.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


MERSENNE = (1 << 61) - 1
# largest 32-bit prime: with 32-bit base hashes and 32-bit (a, b) the
# affine product stays < 2^64 — exact in BOTH numpy uint64 and DuckDB
# UBIGINT, which is what makes the MinHash oracle bit-identical
P32 = 4294967291


def minhash_perm_constants(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """The (a_j, b_j) affine-permutation constants, exposed so the SQL
    oracle can inline the SAME values (single source of truth)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, P32, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, P32, size=num_perm, dtype=np.uint64)
    return a, b


def content_hash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append md5 hex of the raw column (exact-dup key). md5 chosen so
    the DuckDB oracle (``md5(text)``) is bit-identical."""
    vals = batch[col].to_pylist()
    hashes = [
        hashlib.md5((v or "").encode("utf-8")).hexdigest() for v in vals
    ]
    return batch.append_column("content_hash", pa.array(hashes, type=pa.string()))


def dedup_exact(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    nbuckets: int = 16,
    final_partitions: int | None = None,
):
    """Exact dedup: keep the smallest-id row per distinct content.
    Returns the surviving rows' dataset (original columns).

    Scale shape: the content hash is bucketed (``hash % nbuckets``) so
    the ONE groupby shuffle runs ``nbuckets`` vectorized merges — not
    one Python call per distinct text — and each block pre-dedups
    locally before anything moves (map-side combine: the shuffle
    carries at most one row per (block, distinct content)).
    ``nbuckets`` bounds each merge call's frame at roughly
    distinct-rows/nbuckets — raise it with corpus size (10^9 distinct
    texts want 256+; the default suits gate-scale corpora).
    ``final_partitions`` sizes the ONE shuffle's reduce side; the
    default ``max(1, nbuckets // 16)`` keeps block count <= populated
    buckets even for degenerate corpora with fewer distinct texts
    than buckets (block count > populated groups emits schema-less
    empty RefBundles — the known Ray hazard): default nbuckets gets
    one reduce partition, scale callers who raised nbuckets get a
    proportionally parallel final stage."""
    def _first_per_hash(t: pa.Table) -> tuple[pa.Table, np.ndarray]:
        """Keep the min-id row per content_hash (vectorized: stable
        id-order argsort + first occurrence per hash)."""
        ids = t[id_col].to_numpy(zero_copy_only=False)
        hashes = np.asarray(t["content_hash"].to_pylist(), dtype=object)
        order = np.argsort(ids, kind="stable")
        _, first = np.unique(hashes[order], return_index=True)
        keep = np.sort(order[first])
        return t.take(pa.array(keep, type=pa.int64())), hashes[keep]

    def local_first(t: pa.Table) -> pa.Table:
        t, hashes = _first_per_hash(content_hash_batch(t, col))
        hb = (pd.util.hash_array(hashes) % np.uint64(nbuckets)).astype(np.int64)
        return t.append_column("__hb", pa.array(hb))

    def bucket_first(g: pa.Table) -> pa.Table:
        g, _ = _first_per_hash(g)
        return g.drop_columns(["content_hash", "__hb"])

    nparts = (
        final_partitions if final_partitions is not None
        else max(1, nbuckets // 16)
    )
    return (
        ds.map_batches(local_first, batch_format="pyarrow")
        .repartition(max(1, nparts))
        .groupby("__hb")
        .map_groups(bucket_first, batch_format="pyarrow")
    )


# ---- shingling + deterministic hashing ------------------------------


def _shingle_hashes(
    texts: list[str | None], n: int = 3, method: str = "pd"
) -> tuple[np.ndarray, np.ndarray]:
    """Word n-gram shingle SETS per doc -> (u64 hash array, per-doc
    counts). Deterministic. ``method='pd'`` (pandas hash_array, fixed
    key — full 64-bit, used for exact-Jaccard verification) or
    ``'md5_32'`` (first 4 md5 bytes — the MinHash base hash, chosen so
    the DuckDB oracle reproduces it:
    ``('0x' || substr(md5(g), 1, 8))::UBIGINT``)."""
    toks = [t.split() if t else [] for t in (x.lower() if x else x for x in texts)]
    all_shingles: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, ts in enumerate(toks):
        if len(ts) >= n:
            sh = {" ".join(ts[j : j + n]) for j in range(len(ts) - n + 1)}
        elif ts:
            sh = {" ".join(ts)}
        else:
            sh = set()
        counts[i] = len(sh)
        all_shingles.extend(sorted(sh))
    if not all_shingles:
        return np.zeros(0, dtype=np.uint64), counts
    arr = np.asarray(all_shingles, dtype=object)
    if method == "md5_32":
        hashes = np.fromiter(
            (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in arr),
            dtype=np.uint64,
            count=len(arr),
        )
    else:
        hashes = pd.util.hash_array(arr).astype(np.uint64)
    return hashes, counts


def minhash_batch(
    batch: pa.Table,
    col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    ngram: int = 3,
    seed: int = 7,
) -> pa.Table:
    """-> (id_col, sig: fixed_size_list<uint64>[num_perm]) MinHash
    signatures, fully vectorized: one (shingles x num_perm) affine
    hash then segmented min per doc. Base hash md5-32 + 32-bit affine
    mod P32 — exact integer parity with the DuckDB oracle."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    hashes, counts = _shingle_hashes(batch[col].to_pylist(), n=ngram, method="md5_32")
    a, b = minhash_perm_constants(num_perm, seed)
    sigs = np.full((len(ids), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if hashes.size:
        # (S, P) affine hash: 32-bit operands keep products < 2^64 so
        # uint64 arithmetic is exact (no wraparound ambiguity)
        hv = (hashes[:, None] * a[None, :] + b[None, :]) % np.uint64(P32)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        nonempty = counts > 0
        mins = np.minimum.reduceat(hv, starts[nonempty], axis=0)
        sigs[nonempty] = mins
    return pa.table(
        {
            id_col: pa.array(ids),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel(), type=pa.uint64()), num_perm
            ),
        }
    )


def lsh_band_rows(
    batch: pa.Table, id_col: str = "doc_id", bands: int = 32, rows: int = 4
) -> pa.Table:
    """Signature table -> exploded (band, band_hash, id) rows for the
    ``groupby((band, band_hash))`` bucketing shuffle."""
    sig = batch["sig"]
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    n = len(batch)
    num_perm = sig.type.list_size
    assert bands * rows <= num_perm
    flat = sig.flatten().to_numpy(zero_copy_only=False).reshape(n, num_perm)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
    out_ids = np.tile(ids, bands)
    bh = np.empty((bands, n), dtype=np.uint64)
    for bi in range(bands):
        seg = flat[:, bi * rows : (bi + 1) * rows]
        acc = np.zeros(n, dtype=np.uint64)
        for r in range(rows):
            acc = acc * np.uint64(1099511628211) + seg[:, r]
        bh[bi] = acc
    return pa.table(
        {
            "band": pa.array(out_band),
            "band_hash": pa.array(bh.ravel(), type=pa.uint64()),
            id_col: pa.array(out_ids),
        }
    )


def candidate_pairs_from_buckets(g: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """One LSH bucket -> all unordered id pairs (reference kernel for
    :func:`bucketed_candidate_pairs`, which is the pipeline shape)."""
    ids = np.sort(np.unique(g[id_col].to_numpy()))
    if ids.size < 2:
        z = np.zeros(0, dtype=np.int64)
        return pd.DataFrame({"a": z, "b": z})
    ai, bi = np.triu_indices(ids.size, k=1)
    return pd.DataFrame(
        {"a": ids[ai].astype(np.int64), "b": ids[bi].astype(np.int64)}
    )


def _concat_aranges(starts: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(start_i, start_i + size_i)`` without a
    Python loop (same cumsum trick as ``shards._segment_indices``,
    plus tolerance for zero sizes — the cumsum trick indexes past the
    output for trailing/interior empty segments)."""
    nz = sizes > 0
    starts, sizes = starts[nz], sizes[nz]
    total = int(sizes.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.ones(total, dtype=np.int64)
    ends = np.cumsum(sizes)
    out_starts = ends - sizes
    idx[out_starts] = starts
    idx[out_starts[1:]] -= starts[:-1] + sizes[:-1] - 1
    return np.cumsum(idx)


def segment_all_pairs(ids: np.ndarray, seg_new: np.ndarray):
    """All unordered within-segment pairs of a segment-sorted id array,
    one vectorized pass over every segment at once. ``seg_new[i]`` is
    True where row i starts a new segment; ids must be ascending
    within each segment. Row j contributes ``loc_j`` pairs (one per
    earlier row in its segment), so out_b repeats ids by local offset
    and out_a gathers the concatenated aranges of segment prefixes."""
    n = ids.size
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    pos = np.arange(n, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(seg_new, pos, 0))
    loc = pos - seg_start
    out_b = np.repeat(ids, loc).astype(np.int64)
    out_a = ids[_concat_aranges(seg_start, loc)].astype(np.int64)
    return out_a, out_b


def bucketed_candidate_pairs(rows_ds, bucket_keys: list[str],
                             id_col: str = "doc_id", nbuckets: int = 64,
                             final_partitions: int | None = None):
    """(bucket-key..., id) rows -> candidate (a, b) pair Dataset.
    Scale shape (VERDICT r4 #2): the shuffle groups by ``__cb =
    hash(bucket_keys) % nbuckets`` (bounded cardinality — NOT one
    reduce group per LSH bucket, whose count ≈ corpus × bands), and
    each reduce call emits pairs for ALL its buckets in one Arrow
    lexsort + :func:`segment_all_pairs` pass. Duplicate (bucket, id)
    rows (same shingle repeated in a doc) are masked pre-emission;
    cross-bucket duplicate pairs are deduped downstream as before.

    ``final_partitions`` sizes the reduce side (default
    ``max(1, nbuckets // 16)`` — the dedup_exact rule: block count must
    not exceed populated __cb groups or Ray emits schema-less empty
    RefBundles; scale callers who raise nbuckets get a proportionally
    parallel reduce)."""
    nparts = (
        final_partitions
        if final_partitions is not None
        else max(1, nbuckets // 16)
    )

    def add_cb(t: pa.Table) -> pa.Table:
        acc = np.zeros(t.num_rows, dtype=np.uint64)
        for kc in bucket_keys:
            col = t[kc].to_numpy(zero_copy_only=False).astype(np.uint64)
            acc = acc * np.uint64(1099511628211) + col
        return t.append_column(
            "__cb", pa.array((acc % np.uint64(nbuckets)).astype(np.int64))
        )

    def emit(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if g.num_rows == 0:
            return pa.table({"a": z, "b": z})
        keys = [
            g[kc].to_numpy(zero_copy_only=False).astype(np.uint64)
            for kc in bucket_keys
        ]
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, *reversed(keys)))
        ids = ids[order]
        keys = [k[order] for k in keys]
        n = ids.size
        seg_new = np.zeros(n, dtype=bool)
        seg_new[0] = True
        for k in keys:
            seg_new[1:] |= k[1:] != k[:-1]
        uniq = seg_new.copy()
        uniq[1:] |= ids[1:] != ids[:-1]
        ids, seg_new = ids[uniq], seg_new[uniq]
        a, b = segment_all_pairs(ids, seg_new)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    return (
        rows_ds.map_batches(add_cb, batch_format="pyarrow")
        .repartition(nparts)
        .groupby("__cb")
        .map_groups(emit, batch_format="pyarrow")
    )


def jaccard_pairs_exact(
    table: pa.Table,
    pairs: pd.DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    tau: float = 0.5,
) -> pd.DataFrame:
    """Verify candidate pairs with exact set Jaccard over word n-gram
    shingles. ``table`` must contain every referenced id."""
    ids = table[id_col].to_numpy(zero_copy_only=False)
    texts = table[col].to_pylist()
    hashes, counts = _shingle_hashes(texts, n=ngram)
    starts = np.concatenate([[0], np.cumsum(counts)])
    by_id = {int(i): (int(starts[k]), int(starts[k + 1])) for k, i in enumerate(ids)}
    out_a, out_b, out_j = [], [], []
    for a, b in zip(pairs["a"].to_numpy(), pairs["b"].to_numpy()):
        sa, ea = by_id[int(a)]
        sb, eb = by_id[int(b)]
        A, B = hashes[sa:ea], hashes[sb:eb]
        if not len(A) or not len(B):
            continue
        inter = np.intersect1d(A, B, assume_unique=True).size
        union = len(A) + len(B) - inter
        j = inter / union if union else 0.0
        if j >= tau:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(j)
    return pd.DataFrame({"a": out_a, "b": out_b, "jaccard": out_j})


# below this many candidate pairs the verify step runs on the driver
# (one gather + a numpy loop beats three shuffles); above it, the
# distributed map_groups verify (jaccard_verify_pairs_ray) takes over
VERIFY_DRIVER_MAX_PAIRS = 20_000


def _pair_bucket_ids(a: np.ndarray, b: np.ndarray, nbuckets: int) -> np.ndarray:
    """Deterministic bucket per unordered pair — a pure function of
    (a, b), so every duplicate of a pair lands in the same bucket."""
    mix = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ b.astype(
        np.uint64
    )
    return (mix % np.uint64(nbuckets)).astype(np.int64)


def jaccard_verify_pairs_ray(
    ds,
    cands_ds,
    col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    tau: float = 0.5,
    nbuckets: int = 16,
    collect: bool = True,
    n_cands: int | None = None,
) -> pd.DataFrame:
    """Exact-Jaccard verification of candidate pairs AS A RAY STAGE —
    the scale path for funnels where the candidate set (10^6-10^8 pairs
    at 10^9 docs) no longer fits a driver loop. No full text ever
    reaches the driver; only the verified output does.

    Three bounded stages:
    1. pair dedup: bucket by ``hash(a, b)`` (duplicates of a pair from
       different LSH bands co-locate), per-bucket ``np.unique``.
    2. shingle delivery: pairs explode to (doc, a, b) request rows and
       join the per-doc (doc, shingle-hash) rows — ONE partitioned
       hash join keyed on doc.
    3. verify: re-bucket the joined rows by the pair hash; each bucket
       computes |A|, |B| and |A∩B| for ALL its pairs in one vectorized
       ``np.unique``/``bincount`` pass (no per-pair Python loop).

    A pair with an empty-shingle side never survives the inner join
    with both docs present, so it is skipped — the same semantics as
    :func:`jaccard_pairs_exact`. ``collect=False`` returns the
    verified-pairs Dataset instead of a driver DataFrame (for chaining
    into :func:`connected_components_ray` without materializing).
    """
    from yaii_ray.ops.joins import partitioned_hash_join

    # shuffle sizing: block counts must not exceed populated key
    # counts or the empty reduce partitions emit schema-less
    # RefBundles (the known Ray failure). When the caller measured the
    # candidate volume (``n_cands``, as _verified_pairs does), clamp:
    # populated pair-buckets <= n_cands and distinct join docs <=
    # 2 * n_cands, so tiny forced-ray sets collapse to one partition.
    coalesced = max(2, nbuckets // 4)
    join_buckets = nbuckets
    if n_cands is not None:
        coalesced = max(1, min(coalesced, n_cands))
        join_buckets = max(1, min(nbuckets, 2 * n_cands))

    def add_pb(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__pb", pa.array(_pair_bucket_ids(a, b, nbuckets)))

    def uniq_pairs(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = g["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        rec = np.empty(a.size, dtype=[("a", np.int64), ("b", np.int64)])
        rec["a"], rec["b"] = a, b
        u = np.unique(rec)
        return pa.table({"a": pa.array(u["a"]), "b": pa.array(u["b"])})

    pairs = (
        cands_ds.map_batches(add_pb, batch_format="pyarrow")
        .repartition(coalesced)
        .groupby("__pb")
        .map_groups(uniq_pairs, batch_format="pyarrow")
    )

    def explode(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "__doc": pa.array(np.concatenate([a, b])),
                "a": pa.array(np.concatenate([a, a])),
                "b": pa.array(np.concatenate([b, b])),
            }
        )

    requests = pairs.map_batches(explode, batch_format="pyarrow")

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hashes, counts = _shingle_hashes(t[col].to_pylist(), n=ngram)
        return pa.table(
            {
                "__doc": pa.array(np.repeat(ids, counts)),
                "__sh": pa.array(hashes, type=pa.uint64()),
            }
        )

    sh_ds = ds.map_batches(shingle_rows, batch_format="pyarrow")
    joined = partitioned_hash_join(
        requests, sh_ds, on="__doc", nbuckets=join_buckets
    )

    def verify_bucket(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        doc = g["__doc"].to_numpy(zero_copy_only=False)
        sh = g["__sh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rec = np.empty(a.size, dtype=[("a", np.int64), ("b", np.int64)])
        rec["a"], rec["b"] = a, b
        upairs, p = np.unique(rec, return_inverse=True)
        npairs = upairs.size
        is_a = doc == a
        na = np.bincount(p[is_a], minlength=npairs)
        nb = np.bincount(p[~is_a], minlength=npairs)
        rec2 = np.empty(a.size, dtype=[("p", np.int64), ("h", np.uint64)])
        rec2["p"], rec2["h"] = p, sh
        u2, c2 = np.unique(rec2, return_counts=True)
        inter = np.bincount(u2["p"][c2 == 2], minlength=npairs)
        union = na + nb - inter
        ok = (na > 0) & (nb > 0)
        j = np.zeros(npairs, dtype=np.float64)
        j[ok] = inter[ok] / union[ok]
        keep = ok & (j >= tau)
        return pa.table(
            {
                "a": pa.array(upairs["a"][keep]),
                "b": pa.array(upairs["b"][keep]),
                "jaccard": pa.array(j[keep]),
            }
        )

    verified = (
        joined.map_batches(add_pb, batch_format="pyarrow")
        .repartition(coalesced)
        .groupby("__pb")
        .map_groups(verify_bucket, batch_format="pyarrow")
    )
    return verified.to_pandas() if collect else verified


def _verify_bucket_count(n_cands: int, floor: int = 16) -> int:
    """Bucket count for the distributed verify, sized by MEASURED
    candidate volume: ~100k pairs per bucket (each pair contributes
    2×shingles joined rows, so a bucket stays a few tens of MB) —
    a 10^8-candidate funnel gets ~1000 buckets, not 16."""
    return max(floor, min(4096, -(-n_cands // 100_000)))


def _verified_pairs(
    ds, cands_ds, col: str, id_col: str, ngram: int, tau: float,
    nbuckets: int | None = None, verify: str = "auto",
) -> pd.DataFrame:
    """Verify a candidate-pair Dataset. ``verify``: ``"auto"`` =
    driver fast path below ``VERIFY_DRIVER_MAX_PAIRS``, distributed
    Ray verify above it; ``"driver"`` / ``"ray"`` force a path.
    ``nbuckets=None`` sizes the verify shuffle from the measured
    candidate count."""
    cands_ds = cands_ds.materialize()
    n = cands_ds.count()
    if n == 0:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    if nbuckets is None:
        nbuckets = _verify_bucket_count(n)
    use_driver = (
        verify == "driver"
        or (verify == "auto" and n <= VERIFY_DRIVER_MAX_PAIRS)
    )
    if use_driver:
        cands = cands_ds.to_pandas().drop_duplicates().reset_index(drop=True)
        need = np.unique(
            np.concatenate([cands["a"].to_numpy(), cands["b"].to_numpy()])
        )
        table = _gather_rows(ds, id_col, need, [id_col, col])
        out = jaccard_pairs_exact(table, cands, col, id_col, ngram, tau)
    else:
        out = jaccard_verify_pairs_ray(
            ds, cands_ds, col, id_col, ngram, tau, nbuckets, n_cands=n
        )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def near_dup_pairs_minhash(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    tau: float = 0.5,
    num_perm: int = 128,
    bands: int = 32,
    rows: int = 4,
    ngram: int = 3,
    verify: str = "auto",
):
    """MinHash+LSH near-dup candidate pairs, exact-Jaccard verified.
    Returns a pandas DataFrame (a, b, jaccard), a < b, sorted.

    The scale path end-to-end: signatures and band rows are per-batch
    map_batches; bucketing is ONE groupby shuffle; verification runs
    on the driver only below ``VERIFY_DRIVER_MAX_PAIRS`` candidates,
    else as the distributed :func:`jaccard_verify_pairs_ray` stage
    (``verify="driver"``/``"ray"`` forces a path)."""
    sigs = ds.map_batches(
        lambda t: minhash_batch(t, col, id_col, num_perm, ngram),
        batch_format="pyarrow",
    )
    band_rows = sigs.map_batches(
        lambda t: lsh_band_rows(t, id_col, bands, rows), batch_format="pyarrow"
    )
    cands_ds = bucketed_candidate_pairs(band_rows, ["band", "band_hash"], id_col)
    return _verified_pairs(ds, cands_ds, col, id_col, ngram, tau, verify=verify)


def near_dup_pairs_exact(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    tau: float = 0.5,
    ngram: int = 3,
):
    """EXACT n-gram-Jaccard near-dup pairs via an inverted shingle
    index (complete: J >= tau > 0 implies a shared shingle). Quadratic
    in hot-shingle bucket size — oracle/verification path; prefer
    :func:`near_dup_pairs_minhash` at scale."""

    def shingle_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        hashes, counts = _shingle_hashes(b[col].to_pylist(), n=ngram)
        return pa.table(
            {
                "shingle": pa.array(hashes, type=pa.uint64()),
                id_col: pa.array(np.repeat(ids, counts)),
            }
        )

    cands_ds = bucketed_candidate_pairs(
        ds.map_batches(shingle_rows, batch_format="pyarrow"),
        ["shingle"],
        id_col,
    )
    return _verified_pairs(ds, cands_ds, col, id_col, ngram, tau)


# ---- SimHash --------------------------------------------------------


def _md5_u64(tokens: np.ndarray) -> np.ndarray:
    """First 8 bytes of md5 as uint64 per UNIQUE token, broadcast back.
    Chosen (over a faster non-cryptographic hash) because the DuckDB
    oracle reproduces it bit-for-bit:
    ``('0x' || substr(md5(tok), 1, 16))::UBIGINT``."""
    uniq, inv = np.unique(tokens, return_inverse=True)
    hu = np.fromiter(
        (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16) for t in uniq),
        dtype=np.uint64,
        count=len(uniq),
    )
    return hu[inv]


def simhash_batch(batch: pa.Table, col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash over whitespace-lowered tokens (deterministic,
    md5 token hash -> bit-identical SQL twin; strict-majority bit rule
    ``votes > 0``)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    texts = [(t or "").lower().split() for t in batch[col].to_pylist()]
    counts = np.array([len(t) for t in texts], dtype=np.int64)
    flat = [w for ts in texts for w in ts]
    sig = np.zeros(len(ids), dtype=np.uint64)
    if flat:
        h = _md5_u64(np.asarray(flat, dtype=object))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        bits = bits * 2 - 1  # +1 / -1 votes
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        nonempty = counts > 0
        votes = np.add.reduceat(bits, starts[nonempty], axis=0)
        packed = (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
        sig[nonempty] = packed.sum(axis=1, dtype=np.uint64)
    return pa.table({id_col: pa.array(ids), "simhash": pa.array(sig, type=pa.uint64())})


def simhash_pairs_within(
    ids: np.ndarray,
    sh: np.ndarray,
    free_bits: np.ndarray,
    t: int,
    max_bucket: int = 256,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact (a, b, hamming<=t) pairs among rows already known to agree
    on every bit OUTSIDE ``free_bits``, with BOUNDED enumeration.

    Recursive pigeonhole (the fix for VERDICT r1 "What's wrong #2" —
    Manku et al., WWW 2007, generalized): a bucket larger than
    ``max_bucket`` is split by the exact value of each of t+1 disjoint
    blocks of its free bits. A pair within global Hamming t differs in
    at most t free bits, so it agrees exactly on at least one block —
    recall stays 1.0 — while each split shrinks buckets geometrically
    (a b-bit block keys up to 2^b sub-buckets). All-pairs enumeration
    only ever runs on <= max_bucket rows, or on residual buckets whose
    free bits are exhausted — rows agreeing on nearly all 64 bits,
    where the pair set itself is dense (output-bound, not wasted).
    """
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_h: list[np.ndarray] = []
    stack: list[tuple[np.ndarray, np.ndarray]] = [
        (np.arange(ids.size, dtype=np.int64), free_bits)
    ]
    while stack:
        idx, fb = stack.pop()
        n = idx.size
        if n < 2:
            continue
        if n <= max_bucket or fb.size < t + 1:
            ai, bi = np.triu_indices(n, k=1)
            ham = _popcount64(sh[idx[ai]] ^ sh[idx[bi]])
            keep = ham <= t
            out_a.append(ids[idx[ai[keep]]])
            out_b.append(ids[idx[bi[keep]]])
            out_h.append(ham[keep])
            continue
        blocks = np.array_split(fb, t + 1)
        svals = sh[idx]
        splits = []
        degenerate = None
        for blk in blocks:
            key = np.zeros(n, dtype=np.uint64)
            for i, bit in enumerate(blk):
                key |= ((svals >> np.uint64(bit)) & np.uint64(1)) << np.uint64(i)
            order = np.argsort(key, kind="stable")
            ks = key[order]
            bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1], True])
            rest = np.setdiff1d(fb, blk, assume_unique=True)
            if bounds.size == 2:
                # every row agrees on this block -> this single branch
                # already covers ALL pairs; the other t blocks would
                # re-push the same bucket t more times (exponential
                # duplication for clusters of near-identical sigs)
                degenerate = (idx, rest)
                break
            splits.append((order, bounds, rest))
        if degenerate is not None:
            stack.append(degenerate)
            continue
        for order, bounds, rest in splits:
            for s, e in zip(bounds[:-1], bounds[1:]):
                if e - s >= 2:
                    stack.append((idx[order[s:e]], rest))
    if not out_a:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    a0 = np.concatenate(out_a)
    b0 = np.concatenate(out_b)
    h = np.concatenate(out_h)
    # orient every pair a < b (recursion visits rows in key order, not
    # id order) and drop degenerate duplicates of the same id
    a = np.minimum(a0, b0)
    b = np.maximum(a0, b0)
    keep = a < b
    a, b, h = a[keep], b[keep], h[keep]
    # a pair can surface from several blocks — dedup on the (a, b) key
    # (structured dtype, not a packed word: ids may exceed 2^32)
    pairkey = np.empty(a.size, dtype=[("a", np.int64), ("b", np.int64)])
    pairkey["a"], pairkey["b"] = a, b
    _, first = np.unique(pairkey, return_index=True)
    return a[first], b[first], h[first]


def near_dup_pairs_simhash_ds(
    ds, col: str = "text", id_col: str = "doc_id", max_hamming: int = 3,
    max_bucket: int = 256, shuffle_partitions: int = 16,
    dedup_buckets: int = 16,
):
    """All-Ray SimHash near-dups: Dataset of (a, b, hamming) pairs with
    Hamming(sig_a, sig_b) <= t — nothing pair-sized reaches the driver,
    so the output chains into :func:`connected_components_ray` at
    corpus scales whose pair volume no longer fits one machine
    (VERDICT r3 "What's wrong #2"; :func:`near_dup_pairs_simhash` is
    the collecting wrapper for funnel-sized outputs).

    Bucketed by each of t+1 bands (pigeonhole: any pair within
    distance t agrees on at least one band), verified exactly;
    oversized buckets are recursively re-split on their remaining bits
    (:func:`simhash_pairs_within`) so no stage enumerates a quadratic
    candidate set. A pair can surface from several bands — the final
    stage dedups distributed with the pair-bucket shape of
    :func:`jaccard_verify_pairs_ray` stage 1 (bucket by ``hash(a, b)``
    so every duplicate co-locates, per-bucket structured
    ``np.unique``). ``shuffle_partitions`` sizes the bucketing
    groupby's reduce side (raise with corpus size; keeping it at or
    below the populated (band, band_hash) group count avoids Ray's
    schema-less empty reduce partitions)."""
    bands = max_hamming + 1
    width = 64 // bands

    sigs = ds.map_batches(lambda b: simhash_batch(b, col, id_col), batch_format="pyarrow")

    def band_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        sh = b["simhash"].to_numpy(zero_copy_only=False)
        outs = []
        for bi in range(bands):
            band_val = (sh >> np.uint64(bi * width)) & np.uint64((1 << width) - 1)
            outs.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(ids), bi, dtype=np.int32)),
                        "band_hash": pa.array(band_val, type=pa.uint64()),
                        id_col: pa.array(ids),
                        "simhash": pa.array(sh, type=pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        # Arrow in/out: Ray emits schema-FULL empty blocks for empty
        # reduce partitions under the Arrow block format (pandas-format
        # map_groups emits schema-less PandasBlockSchema([]) empties
        # that poison downstream stages nondeterministically)
        raw_ids = g[id_col].to_numpy(zero_copy_only=False)
        raw_sh = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(raw_ids, kind="stable")
        ids, sh = raw_ids[order], raw_sh[order]
        first = np.r_[True, ids[1:] != ids[:-1]] if ids.size else np.zeros(0, bool)
        ids, sh = ids[first], sh[first]
        if ids.size < 2:
            z = pa.array([], type=pa.int64())
            return pa.table({"a": z, "b": z, "hamming": z})
        # rows here agree on this band's bits exactly; the remaining
        # bits are free for the bounded recursive split
        bi = int(g["band"][0].as_py())
        free = np.array(
            [p for p in range(64) if not (bi * width <= p < (bi + 1) * width)],
            dtype=np.int64,
        )
        a, b, ham = simhash_pairs_within(ids, sh, free, max_hamming, max_bucket)
        return pa.table(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "hamming": pa.array(ham, type=pa.int64()),
            }
        )

    raw = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .repartition(shuffle_partitions)
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    def add_pb(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__pb", pa.array(_pair_bucket_ids(a, b, dedup_buckets))
        )

    def uniq_pairs(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = g["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = g["hamming"].to_numpy(zero_copy_only=False).astype(np.int64)
        rec = np.empty(a.size, dtype=[("a", np.int64), ("b", np.int64)])
        rec["a"], rec["b"] = a, b
        # hamming is a pure function of the two signatures, so every
        # duplicate of a pair carries the same value — keep the first
        _, first = np.unique(rec, return_index=True)
        return pa.table(
            {
                "a": pa.array(a[first]),
                "b": pa.array(b[first]),
                "hamming": pa.array(h[first]),
            }
        )

    return (
        raw.map_batches(add_pb, batch_format="pyarrow")
        .repartition(max(2, dedup_buckets // 4))
        .groupby("__pb")
        .map_groups(uniq_pairs, batch_format="pyarrow")
    )


def near_dup_pairs_simhash(
    ds, col: str = "text", id_col: str = "doc_id", max_hamming: int = 3,
    max_bucket: int = 256, shuffle_partitions: int = 16,
) -> pd.DataFrame:
    """Funnel-sized driver wrapper over
    :func:`near_dup_pairs_simhash_ds`: the same distributed pipeline
    (including the distributed pair dedup), collected and sorted."""
    df = near_dup_pairs_simhash_ds(
        ds, col, id_col, max_hamming, max_bucket, shuffle_partitions
    ).to_pandas()
    cols = ["a", "b", "hamming"]
    if not set(cols) <= set(df.columns):
        # an ALL-empty pair set can surface only Ray's passthrough
        # empty reduce-partition blocks, whose schema is the upstream
        # stage's — normalize to the contract schema
        df = pd.DataFrame({c: np.array([], dtype=np.int64) for c in cols})
    return df[cols].sort_values(["a", "b"]).reset_index(drop=True)


def connected_components(pairs: pd.DataFrame, ids: np.ndarray) -> pd.DataFrame:
    """Cluster near-dup pairs: -> (id, cluster) where cluster = min id
    reachable through the pair graph (union-find).

    Driver-side union-find is right when the candidate-pair set is
    small (it is: pairs survive an LSH + verification funnel). For a
    pair set that itself doesn't fit one machine, run min-label
    propagation instead: iterate ``label = min(label, neighbors'
    labels)`` as a groupby over the edge list until fixed point
    (ray_guide's dedup recipe) — same result, all-Ray.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    for a, b in zip(pairs["a"].to_numpy(), pairs["b"].to_numpy()):
        union(int(a), int(b))
    labels = np.array([find(int(i)) for i in ids], dtype=np.int64)
    return pd.DataFrame({"id": ids, "cluster": labels})


def connected_components_ray(
    pairs_ds, ids_ds, id_col: str = "id", max_iters: int = 64,
    nbuckets: int = 32,
):
    """All-Ray min-label propagation — :func:`connected_components`
    for a pair set that itself doesn't fit one machine (e.g. exact-dup
    edges over 10⁹ docs). Per round every vertex takes the min label
    among itself, its neighbors (one partitioned hash join along the
    edges) and its label's own label (a second join of the label table
    with itself — pointer jumping, so chains collapse in O(log
    diameter) rounds instead of O(diameter)), then one grouped min.
    Fixed point is detected by the monotone total-label sum, one tiny
    aggregate per round. Returns a Dataset ``(id, cluster)``;
    ``ids_ds`` supplies the full vertex universe so isolated docs keep
    their own id."""
    import ray.data
    from ray.data.aggregate import Sum

    from yaii_ray.ops.grouped import grouped_aggregate
    from yaii_ray.ops.joins import partitioned_hash_join

    def sym(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "v": pa.array(np.concatenate([a, c])),
                "nbr": pa.array(np.concatenate([c, a])),
            }
        )

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()

    def init(b: pa.Table) -> pa.Table:
        v = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(v), "label": pa.array(v)})

    labels = ids_ds.map_batches(init, batch_format="pyarrow").materialize()

    def out(b: pa.Table) -> pa.Table:
        return pa.table({"id": b["v"], "cluster": b["label"]})

    # zero edges (e.g. a corpus with no near-dups): every vertex is its
    # own cluster; the hash join cannot run over an edge dataset whose
    # only blocks are Ray's schema-less passthrough empties
    if edges.count() == 0:
        return labels.map_batches(out, batch_format="pyarrow")
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    for _ in range(max_iters):
        # neighbor's current label, delivered to each vertex
        msgs = partitioned_hash_join(
            edges, labels.rename_columns({"v": "nbr"}), on="nbr",
            left_cols=["v", "nbr"], right_cols=["nbr", "label"],
            nbuckets=nbuckets,
        ).drop_columns(["nbr"])
        # pointer jump: v also learns label(label(v)) — labels are
        # vertex ids, so the label table joins with itself
        jump = (
            partitioned_hash_join(
                labels.rename_columns({"label": "lkey"}),
                labels.rename_columns({"v": "lkey", "label": "label2"}),
                on="lkey",
                nbuckets=nbuckets,
            )
            .drop_columns(["lkey"])
            .rename_columns({"label2": "label"})
        )
        labels = grouped_aggregate(
            msgs.union(labels).union(jump),
            keys=["v"],
            specs=[("label", "min", "label")],
        ).materialize()
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur == prev_sum:
            break
        prev_sum = cur

    return labels.map_batches(out, batch_format="pyarrow")


def near_dup_pairs_minhash_ds(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    tau: float = 0.5,
    num_perm: int = 128,
    bands: int = 32,
    rows: int = 4,
    ngram: int = 3,
    nbuckets: int = 16,
):
    """Fully-distributed MinHash near-dup pairs: the verified
    (a, b, jaccard) Dataset, with candidates AND verification staying
    in Ray end to end (no driver collection at any step) — the
    composable building block for :func:`dedup_near_ray`."""
    sigs = ds.map_batches(
        lambda t: minhash_batch(t, col, id_col, num_perm, ngram),
        batch_format="pyarrow",
    )
    band_rows = sigs.map_batches(
        lambda t: lsh_band_rows(t, id_col, bands, rows), batch_format="pyarrow"
    )
    cands_ds = bucketed_candidate_pairs(band_rows, ["band", "band_hash"], id_col)
    return jaccard_verify_pairs_ray(
        ds, cands_ds, col, id_col, ngram, tau, nbuckets, collect=False
    )


def dedup_near_ray(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    tau: float = 0.5,
    nbuckets: int = 32,
    **minhash_kw,
):
    """All-Ray end-to-end near-dedup: distributed MinHash funnel +
    distributed exact-Jaccard verify + pointer-jumping connected
    components. Returns a Dataset ``(id, cluster, keep)`` — nothing
    pair- or corpus-sized ever reaches the driver (contrast
    :func:`dedup_near`, the funnel-sized driver variant)."""
    pairs_ds = near_dup_pairs_minhash_ds(ds, col, id_col, tau, **minhash_kw)
    ids_ds = ds.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow"
    )
    cc = connected_components_ray(pairs_ds, ids_ds, id_col=id_col, nbuckets=nbuckets)

    def keep_col(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.append_column("keep", pc.equal(b["id"], b["cluster"]))

    return cc.map_batches(keep_col, batch_format="pyarrow")


def dedup_near(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    tau: float = 0.5,
    **minhash_kw,
) -> pd.DataFrame:
    """End-to-end near-dedup: MinHash-LSH pairs -> exact-Jaccard verify
    -> connected components -> keep the min-id member per cluster.
    Returns (id, cluster, keep). Funnel-sized pair sets only (pairs and
    ids transit the driver) — :func:`dedup_near_ray` is the all-Ray
    twin for corpora where they don't fit."""
    pairs = near_dup_pairs_minhash(ds, col, id_col, tau, **minhash_kw)
    ids = np.sort(
        np.concatenate(
            [
                b[id_col].to_numpy(zero_copy_only=False)
                for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")
            ]
        )
    )
    cc = connected_components(pairs, ids)
    cc["keep"] = cc["id"] == cc["cluster"]
    return cc


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 lacks bitwise_count)."""
    return (
        np.unpackbits(x.astype(np.uint64).view(np.uint8).reshape(-1, 8), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )


# ---- embedding near-dup --------------------------------------------


def embedding_cosine_pairs(ds, tau: float, id_col: str = "vec_id", vec_col: str = "embedding"):
    """All pairs with cosine similarity >= tau. Brute path: the full
    normalized matrix is broadcast once (``ray.put``) and each batch
    does one matmul against it — exact, O(N^2) compute but streaming
    memory. Scale path: pre-bucket with ops/ann.py IVF and run this
    within buckets."""
    import ray

    mat, ids = _embedding_matrix(ds, id_col, vec_col)
    ref = ray.put((mat, ids))

    def batch_pairs(b: pa.Table) -> pa.Table:
        M, all_ids = ray.get(ref)
        bids = b[id_col].to_numpy(zero_copy_only=False)
        V = _normalize(_vec_matrix(b[vec_col]))
        sims = V @ M.T
        rows, cols = np.nonzero(sims >= tau)
        a = bids[rows]
        bcol = all_ids[cols]
        keep = a < bcol  # unordered pairs once; drops self-pairs
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(bcol[keep]),
                "cosine": pa.array(sims[rows, cols][keep].astype(np.float64)),
            }
        )

    return ds.map_batches(batch_pairs, batch_format="pyarrow")


def _cosine_pairs_bounded(
    ids: np.ndarray,
    V: np.ndarray,
    tau: float,
    max_bucket: int,
    _sizes: list | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact within-set cosine>=tau pairs with BOUNDED enumeration:
    a set larger than ``max_bucket`` is recursively split by
    deterministic sub-centroids (strided members in id order, cosine
    argmax — the IVF assignment rule one level down) and pairs are
    emitted only within sub-buckets. This is the skew guard for
    :func:`embedding_cosine_pairs_ivf`: a Voronoi cell that swallowed
    most of a clustered corpus no longer costs O(cell²). Degenerate
    sets that refuse to split (near-identical vectors all argmax-ing
    to one sub-centroid) fall back to the all-pairs triangle — there
    the pair set itself is dense, so the work is output-bound.
    ``V`` must be row-normalized. ``_sizes`` (tests) records each
    enumerated triangle's size."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    stack: list[np.ndarray] = [np.arange(ids.size, dtype=np.int64)]
    while stack:
        idx = stack.pop()
        n = idx.size
        if n < 2:
            continue
        if n > max_bucket:
            k = min(n, max(2, -(-n // max_bucket)))
            order = idx[np.argsort(ids[idx], kind="stable")]
            sel = order[:: max(1, n // k)][:k]
            C = V[sel]
            assign = np.argmax(V[idx] @ C.T, axis=1)
            counts = np.bincount(assign, minlength=k)
            if counts.max() < n:
                for j in np.flatnonzero(counts):
                    stack.append(idx[assign == j])
                continue
            # no progress: dense near-identical cluster, enumerate
        if _sizes is not None:
            _sizes.append(n)
        sims = V[idx] @ V[idx].T
        iu, ju = np.triu_indices(n, k=1)
        m = sims[iu, ju] >= tau
        a, b = ids[idx[iu[m]]], ids[idx[ju[m]]]
        out_a.append(np.minimum(a, b))
        out_b.append(np.maximum(a, b))
        out_c.append(sims[iu, ju][m].astype(np.float64))
    if not out_a:
        z = np.zeros(0, dtype=ids.dtype if ids.size else np.int64)
        return z, z.copy(), np.zeros(0, dtype=np.float64)
    return np.concatenate(out_a), np.concatenate(out_b), np.concatenate(out_c)


def embedding_cosine_pairs_ivf(
    ds,
    tau: float,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    path: str | None = None,
    iters: int = 0,
    seed: int = 13,
    max_bucket: int | None = None,
):
    """Scale path for embedding near-dup: IVF-bucket the corpus
    (``ops.ann.IVFIndex`` fit → bucket-partitioned Parquet, driver
    holds only the centroids), then exact pairwise cosine WITHIN each
    bucket via ``groupby('centroid')`` — O(Σ bucketᵢ²) compute and one
    shuffle instead of the brute path's O(N²) against a broadcast
    full matrix. Bucket depth ≈ N/nlist; raise ``nlist`` at scale to
    bound it, and set ``max_bucket`` to cap SKEWED cells: a Voronoi
    cell deeper than ``max_bucket`` is recursively sub-split by
    deterministic sub-centroids before enumeration
    (:func:`_cosine_pairs_bounded` — pairs then stay within
    sub-buckets, one more level of the same IVF recall trade).
    Recall: misses only cross-bucket pairs (near-identical vectors
    share a Voronoi cell except on cell boundaries — use
    :func:`embedding_cosine_pairs` when exactness is required).
    ``iters=0`` + ``max_bucket=None`` makes every step (strided
    seeding, argmax assignment, triangle enumeration) a deterministic
    function of the table, so the driver oracle replays it exactly in
    SQL."""
    import ray.data

    from yaii_ray.ops.ann import IVFIndex

    ivf = IVFIndex(nlist=nlist, iters=iters, seed=seed, path=path).fit(
        ds, id_col=id_col, vec_col=vec_col
    )
    parts = ray.data.read_parquet(ivf.path)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        V = _normalize(_vec_matrix(g[vec_col]))
        if max_bucket is not None and ids.size > max_bucket:
            lo, hi, cos = _cosine_pairs_bounded(ids, V, tau, max_bucket)
            return pa.table(
                {"a": pa.array(lo), "b": pa.array(hi), "cosine": pa.array(cos)}
            )
        sims = V @ V.T
        iu, ju = np.triu_indices(len(ids), k=1)
        m = sims[iu, ju] >= tau
        a, b = ids[iu[m]], ids[ju[m]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "a": pa.array(lo),
                "b": pa.array(hi),
                "cosine": pa.array(sims[iu, ju][m].astype(np.float64)),
            }
        )

    return (
        # ~4 centroids per reduce partition: more blocks than buckets
        # would leave reduce partitions empty (schema-less RefBundles)
        parts.repartition(max(2, nlist // 4))
        .groupby("centroid")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )


def _vec_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dim = len(col[0])
    return col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), dim).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _embedding_matrix(ds, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    parts = [
        ( _vec_matrix(b[vec_col]), b[id_col].to_numpy(zero_copy_only=False) )
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")
    ]
    mat = np.concatenate([p[0] for p in parts])
    ids = np.concatenate([p[1] for p in parts])
    return _normalize(mat), ids


def _gather_rows(ds, id_col: str, ids: np.ndarray, columns: list[str]) -> pa.Table:
    """Collect the rows whose id is in ``ids`` (broadcast membership
    filter; result assumed small — candidate sets)."""
    import ray

    ref = ray.put(np.sort(ids))

    def keep(b: pa.Table) -> pa.Table:
        want = ray.get(ref)
        got = b[id_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(want, got)
        idx[idx == want.size] = 0
        return b.select(columns).filter(pa.array(want[idx] == got))

    out = ds.map_batches(keep, batch_format="pyarrow").take_all()
    return pa.Table.from_pylist(out) if out else pa.table({c: [] for c in columns})
