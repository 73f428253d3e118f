"""Tests for dedup / ANN / textstats / multimodal operators against
brute-force recomputation on small deterministic data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from yaii_ray.ops import ann, dedup, multimodal, textstats


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    base_docs = []
    for i in range(40):
        words = [vocab[j] for j in rng.integers(0, 50, size=12)]
        base_docs.append(words)
        texts.append(" ".join(words))
        ids.append(i)
    # near-duplicates: copy docs 0..4 with one word changed
    for k in range(5):
        words = list(base_docs[k])
        words[5] = "CHANGED"
        texts.append(" ".join(words))
        ids.append(40 + k)
    # one exact duplicate of doc 7
    texts.append(texts[7])
    ids.append(45)
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})
    return ray.data.from_arrow(t), t


def _brute_jaccard_pairs(t: pa.Table, tau: float, n: int = 3) -> set:
    texts = t["text"].to_pylist()
    ids = t["doc_id"].to_pylist()
    def sh(s):
        ts = s.lower().split()
        if len(ts) >= n:
            return {" ".join(ts[j:j+n]) for j in range(len(ts)-n+1)}
        return {" ".join(ts)} if ts else set()
    sets = [sh(s) for s in texts]
    out = set()
    for i in range(len(ids)):
        for j in range(i+1, len(ids)):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= tau:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_dedup_exact(docs_ds):
    ds, t = docs_ds
    surv = dedup.dedup_exact(ds).to_pandas().sort_values("doc_id")
    # doc 45 is an exact copy of doc 7 -> dropped; everything else kept
    assert set(surv["doc_id"]) == set(range(45))


def test_near_dup_exact_jaccard(docs_ds):
    ds, t = docs_ds
    got = dedup.near_dup_pairs_exact(ds, tau=0.5)
    want = _brute_jaccard_pairs(t, 0.5)
    assert set(zip(got["a"], got["b"])) == want


def test_near_dup_minhash_lsh(docs_ds):
    ds, t = docs_ds
    got = dedup.near_dup_pairs_minhash(ds, tau=0.5, num_perm=128, bands=32, rows=4)
    want = _brute_jaccard_pairs(t, 0.5)
    # verified candidates are always TRUE positives; with 32 bands of 4
    # rows, P(miss | J>=0.5) ≈ (1-0.5^4)^32 ≈ 0.13 per pair — on this
    # corpus the planted near-dups have J≈0.8 (miss ≈ 3e-6), assert
    # exact recovery
    assert set(zip(got["a"], got["b"])) == want
    # scores agree with exact computation
    exact = dedup.near_dup_pairs_exact(ds, tau=0.5)
    m = {(a, b): j for a, b, j in zip(exact["a"], exact["b"], exact["jaccard"])}
    for a, b, j in zip(got["a"], got["b"], got["jaccard"]):
        assert m[(a, b)] == j


def test_simhash_near_dups(docs_ds):
    ds, t = docs_ds
    pairs = dedup.near_dup_pairs_simhash(ds, max_hamming=10)
    got = set(zip(pairs["a"], pairs["b"]))
    # the exact duplicate pair must be found at distance 0
    assert (7, 45) in got
    z = pairs[(pairs["a"] == 7) & (pairs["b"] == 45)]
    assert int(z["hamming"].iloc[0]) == 0
    # verify every reported distance against direct recomputation
    sig = dedup.simhash_batch(t).to_pandas().set_index("doc_id")["simhash"]
    for a, b, h in zip(pairs["a"], pairs["b"], pairs["hamming"]):
        x = np.uint64(sig[a]) ^ np.uint64(sig[b])
        assert bin(int(x)).count("1") == h


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    base = rng.standard_normal((30, 16))
    # three planted near-dup rows of vectors 0..2
    extra = base[:3] + rng.standard_normal((3, 16)) * 0.01
    mat = np.concatenate([base, extra]).astype(np.float32)
    ids = np.arange(mat.shape[0], dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), type=pa.float32()), 16
            ),
        }
    )
    return ray.data.from_arrow(t), mat, ids


def test_embedding_cosine_pairs(emb_ds):
    ds, mat, ids = emb_ds
    got = dedup.embedding_cosine_pairs(ds, tau=0.99).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    M = mat.astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = M @ M.T
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.99
    }
    assert pairs == want
    assert {(30, 31, 32) != ()}  # planted dups present
    assert all((int(a), int(b)) in want for a, b in pairs)


def test_connected_components_ray_matches_union_find(ray_session):
    """All-Ray min-label propagation == driver union-find on a random
    graph with chains (multi-hop), a star, isolated vertices and a
    cycle."""
    import ray.data

    rng = np.random.default_rng(7)
    n = 200
    edges = [(i, i + 1) for i in range(0, 16, 1)]          # 16-hop chain
    edges += [(100, j) for j in range(101, 110)]           # star
    edges += [(150, 151), (151, 152), (152, 150)]          # cycle
    edges += [
        (int(a), int(b))
        for a, b in rng.integers(160, 190, size=(12, 2))
        if a != b
    ]
    pairs_ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edges], type=pa.int64()),
                "b": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
    )
    ids = np.arange(n, dtype=np.int64)
    ids_ds = ray.data.from_arrow(pa.table({"id": pa.array(ids)}))
    got = (
        dedup.connected_components_ray(pairs_ds, ids_ds, nbuckets=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = dedup.connected_components(
        pd.DataFrame({"a": [a for a, _ in edges], "b": [b for _, b in edges]}),
        ids,
    )
    assert got["id"].tolist() == want["id"].tolist()
    assert got["cluster"].tolist() == want["cluster"].tolist()


def test_embedding_pairs_ivf_recall(emb_ds, tmp_path):
    """The IVF-bucketed scale path must (a) return only true pairs
    (exact cosine within buckets — no false positives ever) and
    (b) find every PLANTED near-dup: ~identical vectors share a
    Voronoi cell, so high-tau recall is where bucketing is safe."""
    ds, mat, ids = emb_ds
    got = dedup.embedding_cosine_pairs_ivf(
        ds, tau=0.99, nlist=4, path=str(tmp_path / "ivf")
    ).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    M = mat.astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = M @ M.T
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.99
    }
    assert want == {(0, 30), (1, 31), (2, 32)}  # the planted dups
    assert pairs <= want  # subset of the exact answer: no false hits
    assert pairs == want  # ...and full recall on the planted dups


def test_brute_topk_matches_numpy(emb_ds):
    ds, mat, ids = emb_ds
    q = mat[0]
    got = ann.brute_topk(ds, q, k=5)
    M = mat.astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = M @ qn
    order = np.lexsort((ids, -sims))[:5]
    assert got["vec_id"].tolist() == ids[order].tolist()
    # matmul association order differs between (nq,d)@(d,N) and
    # (N,d)@(d,) — allow BLAS-level float noise only
    np.testing.assert_allclose(got["cosine"].to_numpy(), sims[order], rtol=1e-6)


def test_ivf_recall(emb_ds):
    ds, mat, ids = emb_ds
    idx = ann.IVFIndex(nlist=4, iters=5).fit(ds)
    qs = mat[:5]
    brute = ann.brute_topk(ds, qs, k=5)
    # full probe = exact
    full = idx.search(qs, k=5, nprobe=4)
    for qi in range(5):
        b = brute[brute["query"] == qi]["vec_id"].tolist()
        f = full[full["query"] == qi]["vec_id"].tolist()
        assert b == f
    # partial probe: planted near-dup of q0 (vec 30) must be found
    part = idx.search(mat[:1], k=3, nprobe=1)
    assert 30 in part["vec_id"].tolist()


def test_text_stats(docs_ds, ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": ["the quick brown fox", "a a a the of", ""],
        }
    )
    out = textstats.text_stats_batch(t).to_pandas()
    assert out["n_tokens"].tolist() == [4, 5, 1]  # "" -> one empty token
    assert out["stopword_ratio"][0] == 0.25
    assert out["stopword_ratio"][1] == 1.0
    lang = textstats.lang_id_batch(
        pa.table({"text": ["the cat and the dog of it", "le chat et la maison est dans", "xyzzy plugh"]})
    )
    assert lang["lang_guess"].to_pylist() == ["en", "fr", "und"]
    fp = textstats.fingerprint_batch(
        pa.table({"text": ["Hello   World", "hello world", "different"]})
    ).to_pandas()
    assert fp["fp_md5"][0] == fp["fp_md5"][1]  # whitespace/case-insensitive
    assert fp["fp_md5"][0] != fp["fp_md5"][2]
    assert fp["fp_roll"][0] == fp["fp_roll"][1]


def test_multimodal_image_pipeline(ray_session):
    import ray.data

    payloads = [multimodal.encode_fake_image(16, 8, seed=s) for s in range(6)]
    t = pa.table(
        {
            "img_id": pa.array(range(6), type=pa.int64()),
            "image": pa.array(payloads, type=pa.binary()),
        }
    )
    ds = ray.data.from_arrow(t)
    out = (
        ds.map_batches(multimodal.ImageDecode, batch_size=2, concurrency=2, batch_format="pyarrow")
        .to_pandas()
        .sort_values("img_id")
    )
    assert out["width"].tolist() == [16] * 6
    assert out["height"].tolist() == [8] * 6
    pix0 = np.frombuffer(payloads[0], np.uint8, 16 * 8, 8)
    assert out["mean_luma"].iloc[0] == pytest.approx(pix0.mean())

    feats = ds.map_batches(multimodal.ImageResizeFeature, batch_size=3, concurrency=2, batch_format="pyarrow").to_pandas()
    assert len(feats["feature"].iloc[0]) == 64

    audio = pa.table(
        {
            "aud_id": pa.array([0, 1], type=pa.int64()),
            "audio": pa.array(
                [multimodal.encode_fake_audio(16000, 5000, seed=s) for s in range(2)],
                type=pa.binary(),
            ),
        }
    )
    aout = (
        ray.data.from_arrow(audio)
        .map_batches(multimodal.AudioFrameSample(stride=500, max_frames=4), batch_size=1, concurrency=2, batch_format="pyarrow")
        .to_pandas()
        .sort_values("aud_id")
    )
    assert aout["rate"].tolist() == [16000, 16000]
    assert all(len(f) == 4 for f in aout["frames"])


def test_dedup_near_clusters(docs_ds):
    """Full near-dedup funnel: pairs -> union-find clusters -> keep
    min-id per cluster; verified against a brute transitive closure."""
    ds, t = docs_ds
    cc = dedup.dedup_near(ds, tau=0.5)
    want_pairs = _brute_jaccard_pairs(t, 0.5)
    # brute transitive closure
    ids = sorted(t["doc_id"].to_pylist())
    label = {i: i for i in ids}

    def root(x):
        while label[x] != x:
            x = label[x]
        return x

    for a, b in want_pairs:
        ra, rb = root(a), root(b)
        if ra != rb:
            label[max(ra, rb)] = min(ra, rb)
    want = {i: root(i) for i in ids}
    got = dict(zip(cc["id"], cc["cluster"]))
    assert got == want
    # keep = exactly one representative (the min id) per cluster
    keep_ids = set(cc[cc["keep"]]["id"])
    assert keep_ids == set(want.values())


def test_multimodal_video_pipeline(ray_session):
    import ray.data

    payloads = [multimodal.encode_fake_video(8, 4, nframes=10, seed=s) for s in range(4)]
    t = pa.table(
        {
            "vid_id": pa.array(range(4), type=pa.int64()),
            "video": pa.array(payloads, type=pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            multimodal.VideoFrameSample(stride=3, max_frames=3),
            batch_size=2,
            concurrency=2,
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vid_id")
    )
    assert out["width"].tolist() == [8] * 4
    assert out["height"].tolist() == [4] * 4
    # frames 0, 3, 6 of 10 at stride 3, capped at 3
    assert all(len(f) == 3 for f in out["frame_lumas"])
    frames0 = np.frombuffer(payloads[0], np.uint8, 10 * 8 * 4, 10).reshape(10, 4, 8)
    assert out["frame_lumas"].iloc[0][1] == pytest.approx(frames0[3].mean())


def test_lsh_recall(emb_ds):
    """LSH finds true NEAR neighbors (cosine ~ 1): self + the planted
    near-dups land in the query's own bucket; random far vectors are
    not recallable by locality hashing and are not asserted."""
    ds, mat, ids = emb_ds
    idx = ann.LSHIndex(nbits=6, seed=29).fit(ds)
    got = idx.search(mat[:5], k=5, probes=8)
    for qi in range(5):
        g = got[got["query"] == qi]
        assert g["vec_id"].iloc[0] == qi  # self is rank 1
        if qi < 3:  # planted near-dup of rows 0..2 is vec 30+qi
            assert 30 + qi in g["vec_id"].tolist()
    # single-probe (own bucket only) still finds self
    g1 = idx.search(mat[:1], k=5, probes=1)["vec_id"].tolist()
    assert g1[0] == 0


def test_ann_fit_never_materializes_corpus(emb_ds, monkeypatch, tmp_path):
    """VERDICT r1 'What's wrong #1': IVF/LSH fit must stream. Poison
    the whole-dataset gather helper; fit + search must still work
    (bucket-partitioned parquet on disk, probed-bucket reads) and stay
    exact when every bucket is probed."""
    from yaii_ray.ops import dedup as dd

    ds, mat, ids = emb_ds

    def boom(*a, **k):
        raise AssertionError("driver-side _embedding_matrix called in ANN path")

    monkeypatch.setattr(dd, "_embedding_matrix", boom)
    idx = ann.IVFIndex(nlist=4, iters=0, path=str(tmp_path / "ivf")).fit(ds)
    brute = ann.brute_topk(ds, mat[:3], k=5)
    full = idx.search(mat[:3], k=5, nprobe=4)
    for qi in range(3):
        assert (
            brute[brute["query"] == qi]["vec_id"].tolist()
            == full[full["query"] == qi]["vec_id"].tolist()
        )
    # buckets really are hive partitions on disk
    import os as _os

    assert any(d.startswith("centroid=") for d in _os.listdir(tmp_path / "ivf"))
    lsh = ann.LSHIndex(nbits=4, planes="data", path=str(tmp_path / "lsh")).fit(ds)
    got = lsh.search(mat[:1], k=3, probe_hamming=4)  # full Hamming ball = exact
    assert got["vec_id"].iloc[0] == 0
    assert any(d.startswith("sig_bucket=") for d in _os.listdir(tmp_path / "lsh"))


def test_simhash_bounded_bucket_split():
    """VERDICT r1 'What's wrong #2': 10^5 signatures sharing one band
    must not trigger quadratic pair enumeration. Recursive pigeonhole
    splitting keeps it output-bound while recall stays exact."""
    import time

    rng = np.random.default_rng(3)
    n, t, width = 100_000, 3, 16
    shared_band = np.uint64(0xBEEF)
    # random high 48 bits, identical low 16-bit band-0
    sigs = (rng.integers(0, 1 << 48, n, dtype=np.uint64) << np.uint64(16)) | shared_band
    # plant 5 near-dup pairs at hamming 1..3 (flip bits OUTSIDE band 0)
    planted = set()
    for i in range(5):
        a = 2 * i
        b = 2 * i + 1
        s = sigs[a]
        for bit in range(17, 17 + (i % t) + 1):
            s ^= np.uint64(1) << np.uint64(bit)
        sigs[b] = s
        planted.add((a, b))
    ids = np.arange(n, dtype=np.int64)
    free = np.arange(16, 64, dtype=np.int64)  # band 0 = bits 0..15 shared
    t0 = time.time()
    a, b, h = dedup.simhash_pairs_within(ids, sigs, free, t, max_bucket=256)
    elapsed = time.time() - t0
    got = set(zip(a.tolist(), b.tolist()))
    assert planted <= got
    # with t=3 over 48 random free bits, chance collisions are ~1e-13
    # per pair — any non-planted pair would be a bug
    assert got == planted, got - planted
    assert all(hh <= t for hh in h)
    # the old all-pairs path would do 5e9 popcounts here; the bounded
    # split finishes in interactive time
    assert elapsed < 30, f"bounded split took {elapsed:.1f}s"


def test_simhash_split_matches_bruteforce():
    """Exhaustive cross-check of the recursive splitter on a corpus
    small enough to brute-force, with heavy duplication to force deep
    recursion through the residual (free-bits-exhausted) path."""
    rng = np.random.default_rng(5)
    n, t = 1500, 7
    base = rng.integers(0, 1 << 63, 200, dtype=np.uint64)
    sigs = base[rng.integers(0, 200, n)]
    flips = rng.integers(0, 64, n, dtype=np.uint64)
    many = rng.random(n) < 0.5
    sigs = np.where(many, sigs ^ (np.uint64(1) << flips), sigs)
    ids = np.arange(n, dtype=np.int64)
    free = np.arange(0, 64, dtype=np.int64)
    a, b, h = dedup.simhash_pairs_within(ids, sigs, free, t, max_bucket=16)
    ai, bi = np.triu_indices(n, k=1)
    ham = dedup._popcount64(sigs[ai] ^ sigs[bi])
    keep = ham <= t
    want = set(zip(ai[keep].tolist(), bi[keep].tolist()))
    got = set(zip(a.tolist(), b.tolist()))
    assert got == want
    wanth = {(x, y): hh for x, y, hh in zip(ai[keep], bi[keep], ham[keep])}
    for x, y, hh in zip(a.tolist(), b.tolist(), h.tolist()):
        assert wanth[(x, y)] == hh


def test_distributed_verify_matches_driver(docs_ds, monkeypatch):
    """Forcing the distributed verify path (threshold 0) must produce
    EXACTLY the driver-loop result, without _gather_rows ever running
    (no full-text driver materialization)."""
    ds, t = docs_ds
    want = dedup.near_dup_pairs_minhash(ds, tau=0.5)  # driver path
    monkeypatch.setattr(dedup, "VERIFY_DRIVER_MAX_PAIRS", 0)
    monkeypatch.setattr(
        dedup, "_gather_rows",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver gather used on the distributed path")
        ),
    )
    got = dedup.near_dup_pairs_minhash(ds, tau=0.5)
    assert list(got["a"]) == list(want["a"])
    assert list(got["b"]) == list(want["b"])
    assert np.allclose(got["jaccard"], want["jaccard"])
    # exact-shingle candidate generation takes the same dispatcher
    got2 = dedup.near_dup_pairs_exact(ds, tau=0.5)
    want2 = _brute_jaccard_pairs(t, 0.5)
    assert set(zip(got2["a"], got2["b"])) == want2


def test_distributed_verify_planted_100k_pairs(ray_session, monkeypatch):
    """VERDICT r2 #1 'done' criterion: a planted >=1e5-pair candidate
    set verifies as a Ray stage — vectorized, no full-text driver
    materialization — and matches per-pair exact Jaccard."""
    import ray.data

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(30)]
    nbase, ndocs = 25, 460
    bases = [
        [vocab[j] for j in rng.integers(0, 30, size=6)] for _ in range(nbase)
    ]
    ids, texts = [], []
    for i in range(ndocs):
        words = list(bases[i % nbase])
        if rng.random() < 0.5:
            words[rng.integers(0, 6)] = f"mut{i}"
        ids.append(i)
        texts.append(" ".join(words))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})
    ds = ray.data.from_arrow(t)
    ai, bi = np.triu_indices(ndocs, k=1)
    assert ai.size >= 100_000
    cands = ray.data.from_arrow(
        pa.table(
            {"a": pa.array(ai.astype(np.int64)), "b": pa.array(bi.astype(np.int64))}
        )
    )
    monkeypatch.setattr(
        dedup, "_gather_rows",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver gather used on the distributed path")
        ),
    )
    got = (
        dedup.jaccard_verify_pairs_ray(ds, cands, tau=0.5, nbuckets=8)
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = dedup.jaccard_pairs_exact(
        t, pd.DataFrame({"a": ai, "b": bi}), tau=0.5
    ).sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert list(got["a"]) == list(want["a"])
    assert list(got["b"]) == list(want["b"])
    assert np.allclose(got["jaccard"], want["jaccard"])


def test_hamming_ball_matches_scan_and_scales():
    """Probe-set enumeration must equal the old O(2^nbits) scan at
    small nbits and stay usable at nbits=24 (where the scan is 16M)."""
    for nbits, r in [(10, 0), (10, 1), (10, 2), (8, 3)]:
        base = 0b1011001 & ((1 << nbits) - 1)
        want = np.array(
            [s for s in range(1 << nbits) if bin(s ^ base).count("1") <= r],
            dtype=np.int64,
        )
        got = ann._hamming_ball(base, nbits, r)
        assert np.array_equal(got, want)
    big = ann._hamming_ball(12345, 24, 2)
    assert big.size == 1 + 24 + 24 * 23 // 2
    assert (np.sort(big) == big).all()


def test_ivf_pairs_bounded_under_skew(ray_session, tmp_path):
    """VERDICT r2 #5: a clustered corpus that collapses into one
    Voronoi cell must NOT enumerate an O(cell^2) triangle — oversized
    buckets recursively sub-split, planted exact-duplicate pairs stay
    recall-1.0, and every reported pair is a true >=tau pair."""
    import ray.data

    rng = np.random.default_rng(21)
    dim, n_noise, n_dup_groups, dup_size = 8, 1800, 20, 5
    base = rng.standard_normal(dim)
    # skew: every vector near one direction -> one hot Voronoi cell
    noise = base[None, :] + 0.05 * rng.standard_normal((n_noise, dim))
    dup_centers = base[None, :] + 0.05 * rng.standard_normal((n_dup_groups, dim))
    dups = np.repeat(dup_centers, dup_size, axis=0)  # exact duplicates
    V = np.concatenate([noise, dups])
    ids = np.arange(len(V), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(V.astype(np.float64))),
        }
    )
    ds = ray.data.from_arrow(t)
    got = dedup.embedding_cosine_pairs_ivf(
        ds, tau=0.9999, nlist=8, path=str(tmp_path / "ivf_skew"),
        max_bucket=64,
    ).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    # planted exact-dup pairs (cosine 1.0) share every sub-bucket split
    for gidx in range(n_dup_groups):
        members = n_noise + gidx * dup_size + np.arange(dup_size)
        for i in range(dup_size):
            for j in range(i + 1, dup_size):
                assert (members[i], members[j]) in pairs
    # soundness: every reported pair really clears tau
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    for a, b, c in zip(got["a"], got["b"], got["cosine"]):
        assert Vn[a] @ Vn[b] >= 0.9999 - 1e-9
        assert abs(Vn[a] @ Vn[b] - c) < 1e-9


def test_cosine_pairs_bounded_enumeration_sizes():
    """The recursive splitter never enumerates a non-degenerate
    triangle larger than max_bucket, and matches brute force exactly
    on diverse data."""
    rng = np.random.default_rng(4)
    n, dim, mb = 3000, 6, 100
    V = rng.standard_normal((n, dim))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    ids = np.arange(n, dtype=np.int64)
    sizes: list = []
    a, b, c = dedup._cosine_pairs_bounded(ids, V, tau=0.95, max_bucket=mb, _sizes=sizes)
    assert max(sizes) <= mb  # diverse data: no degenerate fallback
    # subset-of-brute soundness + exact cosines
    sims = V @ V.T
    for x, y, cc in zip(a, b, c):
        assert sims[x, y] >= 0.95
        assert abs(sims[x, y] - cc) < 1e-12


def test_image_resize_pool_matches_loop_reference():
    """Integral-image pooling == the per-cell loop it replaced,
    including the h<GRID overlapping-window edge."""
    rf = multimodal.ImageResizeFeature()
    g = rf.GRID
    for w, h, seed in [(16, 8, 0), (5, 3, 1), (37, 23, 2), (8, 8, 3), (64, 2, 4)]:
        rng = np.random.default_rng(seed)
        pix = rng.integers(0, 256, size=(h, w)).astype(np.float64)
        ys = np.linspace(0, h, g + 1).astype(int)
        xs = np.linspace(0, w, g + 1).astype(int)
        want = np.array(
            [
                pix[ys[i]: max(ys[i + 1], ys[i] + 1),
                    xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
                for i in range(g)
                for j in range(g)
            ]
        ) / 255.0
        got = rf._pool(pix)
        assert np.allclose(got, want, atol=1e-12)


def test_audio_frame_count_geometry(ray_session):
    """AudioFrameSample frame count == min(max_frames, ceil(n/stride))
    — the deterministic geometry the multimodal_audio_frames oracle
    checks in SQL."""
    import ray.data

    ns = [16, 17, 31, 32, 33, 63, 64, 65, 115]
    t = pa.table(
        {
            "aud_id": pa.array(range(len(ns)), type=pa.int64()),
            "audio": pa.array(
                [multimodal.encode_fake_audio(8000, n, seed=i) for i, n in enumerate(ns)],
                type=pa.binary(),
            ),
        }
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            multimodal.AudioFrameSample(stride=16, max_frames=4),
            batch_size=4, concurrency=2, batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("aud_id")
    )
    want = [min(4, -(-n // 16)) for n in ns]
    assert [len(f) for f in out["frames"]] == want
    # values are the strided samples themselves
    s0 = np.frombuffer(t["audio"][0].as_py(), np.float32, ns[0], 12)
    assert np.array_equal(out["frames"].iloc[0], s0[::16][:4])


def test_dedup_near_ray_matches_driver_variant(docs_ds):
    """dedup_near_ray (all-Ray funnel + verify + components) produces
    the same clusters/keep set as the driver-side dedup_near."""
    ds, t = docs_ds
    want = dedup.dedup_near(ds, tau=0.5).sort_values("id").reset_index(drop=True)
    got = (
        dedup.dedup_near_ray(ds, tau=0.5, nbuckets=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(got["id"]) == list(want["id"])
    assert list(got["cluster"]) == list(want["cluster"])
    assert list(got["keep"]) == list(want["keep"])


def test_curate_pipeline_composition(docs_ds):
    """pipelines.curate == score -> filter -> exact-dedup composed by
    hand from the same batch functions."""
    from yaii_ray import pipelines

    ds, t = docs_ds
    got = (
        pipelines.curate(ds, min_quality=0.0, langs=None)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # langs=None, min_quality=0.0: only the dedup stage filters —
    # doc 45 (exact copy of 7) drops, score columns present
    assert set(got["doc_id"]) == set(range(45))
    assert {"quality", "lang_guess", "n_tokens"} <= set(got.columns)
    want_scores = textstats.text_stats_batch(t).to_pandas().set_index("doc_id")
    assert np.allclose(
        got.set_index("doc_id")["quality"],
        want_scores["quality"].reindex(got["doc_id"]),
    )
    # threshold + lang filter apply on top (this synthetic corpus is
    # all lang 'und' with quality ≈ 0.37)
    strict = pipelines.curate(ds, min_quality=0.3, langs=("und",)).to_pandas()
    lg = textstats.lang_id_batch(t).to_pandas().set_index("doc_id")["lang_guess"]
    assert len(strict) > 0
    kept = set(strict["doc_id"])
    for d in want_scores.index:
        expect = (
            round(want_scores["quality"][d], 6) >= 0.3
            and lg[d] == "und"
            and d != 45  # exact dup of doc 7
        )
        assert (d in kept) == expect
    assert pipelines.curate(ds, min_quality=0.99, langs=("en",)).count() == 0


def test_verify_bucket_count_scales_with_candidates():
    assert dedup._verify_bucket_count(10) == 16
    assert dedup._verify_bucket_count(20_001) == 16
    assert dedup._verify_bucket_count(1_000_000) == 16
    assert dedup._verify_bucket_count(5_000_000) == 50
    assert dedup._verify_bucket_count(100_000_000) == 1000
    assert dedup._verify_bucket_count(10**9) == 4096


def test_simhash_ds_no_driver_collection(docs_ds, monkeypatch):
    """VERDICT r3 #2 'done' criterion: the Dataset pair path never
    collects pairs on the driver — to_pandas poisoned — and its rows
    match the collecting wrapper (distributed pair dedup included)."""
    import ray.data

    ds, t = docs_ds
    want = dedup.near_dup_pairs_simhash(ds, max_hamming=10)

    real_to_pandas = ray.data.Dataset.to_pandas
    monkeypatch.setattr(
        ray.data.Dataset,
        "to_pandas",
        lambda self, *a, **k: (_ for _ in ()).throw(
            AssertionError("driver collection on the Dataset path")
        ),
    )
    pds = dedup.near_dup_pairs_simhash_ds(ds, max_hamming=10).materialize()
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", real_to_pandas)
    got = (
        pds.to_pandas()[["a", "b", "hamming"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(want.astype("int64"))
    # duplicates of a pair from different bands were deduped IN RAY
    assert not got.duplicated(subset=["a", "b"]).any()


def test_simhash_ds_chains_into_components(docs_ds):
    """SimHash pairs chain into the all-Ray clustering without a
    driver hop, matching driver union-find over the same pairs."""
    ds, t = docs_ds
    pairs = dedup.near_dup_pairs_simhash(ds, max_hamming=10)
    ids = np.sort(t["doc_id"].to_numpy())
    want = dedup.connected_components(pairs, ids)

    pds = dedup.near_dup_pairs_simhash_ds(ds, max_hamming=10)
    import ray.data

    ids_ds = ray.data.from_arrow(t.select(["doc_id"]))
    got = (
        dedup.connected_components_ray(pds, ids_ds, id_col="doc_id", nbuckets=8)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert np.array_equal(got["id"].to_numpy(), want["id"].to_numpy())
    assert np.array_equal(got["cluster"].to_numpy(), want["cluster"].to_numpy())


def test_simhash_empty_pair_set(ray_session):
    """A corpus with no near-dups: the wrapper returns an empty frame
    with the contract schema, and the CC chain yields singleton
    clusters (zero-edge early exit)."""
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": [
                "one two three four",
                "five six seven eight",
                "nine ten eleven twelve",
            ],
        }
    )
    ds = ray.data.from_arrow(t)
    out = dedup.near_dup_pairs_simhash(ds, max_hamming=2)
    assert list(out.columns) == ["a", "b", "hamming"] and len(out) == 0
    cc = (
        dedup.connected_components_ray(
            dedup.near_dup_pairs_simhash_ds(ds, max_hamming=2),
            ray.data.from_arrow(t.select(["doc_id"])),
            id_col="doc_id",
            nbuckets=4,
        )
        .to_pandas()
        .sort_values("id")
    )
    assert cc["cluster"].tolist() == [0, 1, 2]


def test_lsh_probe_membership_large_nbits(emb_ds, tmp_path):
    """VERDICT r3 #1 'done' criterion: search carries only sorted
    probe-signature arrays (O(probes) memory — no (nq, 2^nbits) LUT,
    which at nbits=24 would be 16 MiB/query) and still returns exactly
    the explicit-membership reference result at nbits=12 AND 24."""
    ds, mat, ids = emb_ds
    V = mat.astype(np.float64)
    Vn = ann._normalize(V)
    for nbits in (12, 24):
        idx = ann.LSHIndex(
            nbits=nbits, seed=3, path=str(tmp_path / f"lsh{nbits}")
        ).fit(ds)
        raw_q = V[:4]
        got = idx.search(raw_q, k=5, probe_hamming=2)
        # reference: explicit probe-set membership + brute cosine top-k
        sig = idx._signature(V)
        probe_sets = idx._probe_sigs(raw_q, 0, 2)
        Qn = ann._normalize(raw_q)
        sims = Qn @ Vn.T
        for qi in range(raw_q.shape[0]):
            member = np.isin(sig, probe_sets[qi])
            order = np.lexsort((ids[member], -sims[qi][member]))[:5]
            g = got[got["query"] == qi]
            assert g["vec_id"].tolist() == list(ids[member][order])
            assert np.allclose(g["cosine"].to_numpy(), sims[qi][member][order])
            assert g["rank"].tolist() == list(range(1, len(g) + 1))


def test_bpe_count_matches_python_re(ray_session):
    """The vectorized pc.count_substring_regex kernel (RE2) counts
    exactly what Python re.findall counts on this alternation."""
    import re

    cases = [
        "",
        " ",
        "it's a test",
        "hello  world",
        "don't 123 foo-bar!!",
        "a1b2 c3",
        "  'll 'd x",
        "über café 北京 12.5%",
        "we're: they've; I'm",
        "\tnew\nline\r",
        "'s't're",
        None,
    ]
    t = pa.table({"text": pa.array(cases, type=pa.string())})
    got = textstats.bpe_token_count_batch(t)["n_bpe_tokens"].to_pylist()
    R = re.compile(textstats.BPE_ISH_PATTERN)
    want = [len(R.findall(c or "")) for c in cases]
    assert got == want


def test_dedup_exact_degenerate_tiny_corpus(ray_session):
    """ADVICE r3: fewer populated hash buckets than reduce partitions
    (1-3 distinct texts, default nbuckets) must not trip Ray's
    empty-reduce-partition schema failure."""
    import ray.data

    for ndistinct, nb in [(1, 16), (2, 16), (1, 64), (3, 16)]:
        t = pa.table(
            {
                "doc_id": pa.array(list(range(8)), type=pa.int64()),
                "text": [chr(97 + i % ndistinct) for i in range(8)],
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        out = dedup.dedup_exact(ds, nbuckets=nb).to_pandas()
        assert len(out) == ndistinct
        assert sorted(out["doc_id"]) == list(range(ndistinct))


def test_forced_ray_verify_single_candidate(ray_session):
    """ADVICE r3: verify='ray' forced on a 1-pair candidate set (auto
    mode would route it to the driver) runs the distributed stage
    without empty-partition failures."""
    import ray.data

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": ["x y z w q", "x y z w v"],
        }
    )
    cands = ray.data.from_arrow(
        pa.table({"a": pa.array([0], type=pa.int64()), "b": pa.array([1], type=pa.int64())})
    )
    out = dedup.jaccard_verify_pairs_ray(
        ray.data.from_arrow(docs), cands, tau=0.1, nbuckets=16, ngram=1
    )
    assert len(out) == 1 and out["a"].iloc[0] == 0 and out["b"].iloc[0] == 1


def test_search_dataset_matches_index_search(ray_session, tmp_path):
    """ops/search.py: the distributed query-Dataset scorer returns
    per-query results bitwise identical to Index.search (same
    analyzer, df lookup, WAND, tie-break); no-term queries vanish."""
    import ray.data

    from yaii_ray.build import build_index_from_table
    from yaii_ray.config import FieldConfig, IndexConfig, KIND_TEXT
    from yaii_ray.engine import Index
    from yaii_ray.ops.search import search_dataset

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "merge", "sort", "hash"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in range(200)
    ]
    t = pa.table({"text": pa.array(texts)})
    cfg = IndexConfig(
        fields={"text": FieldConfig(kind=KIND_TEXT, scored=True)},
        all_field=False,
        num_shards=2,
    )
    out = str(tmp_path / "sds_idx")
    build_index_from_table(t, out, cfg)

    queries = [
        "alpha merge", "sort hash gamma", "delta",
        "zzz_not_in_vocab",  # no surviving terms -> no output rows
        "beta beta alpha",
    ]
    qt = pa.table(
        {
            "qid": pa.array(range(len(queries)), type=pa.int64()),
            "query": queries,
        }
    )
    idx = Index(out)
    try:
        # both execution shapes: auto (shard-parallel pools + merge on
        # this 2-shard index) and replicated single-pool
        for sharded in (None, False):
            got = (
                search_dataset(
                    ray.data.from_arrow(qt), out, k=7, concurrency=2,
                    batch_size=2, sharded=sharded,
                )
                .to_pandas()
                .sort_values(["qid", "rank"])
                .reset_index(drop=True)
            )
            for qid, q in enumerate(queries):
                want = idx.search(q, field="text", k=7)
                sub = got[got["qid"] == qid]
                assert sub["doc_id"].tolist() == want["doc_id"].to_pylist()
                assert sub["score"].tolist() == want["score"].to_pylist()
                assert sub["rank"].tolist() == list(range(1, len(sub) + 1))
            assert (got["qid"] == 3).sum() == 0

        # filtered variant: the WAND allowed-set mask matches too
        from yaii_ray.query import dsl

        flt = dsl.token("merge", "text")
        gotf = (
            search_dataset(
                ray.data.from_arrow(qt), out, k=7, concurrency=2,
                batch_size=2, filter=flt,
            )
            .to_pandas()
            .sort_values(["qid", "rank"])
        )
        for qid, q in enumerate(queries):
            want = idx.search(q, field="text", k=7, filter=flt)
            sub = gotf[gotf["qid"] == qid]
            assert sub["doc_id"].tolist() == want["doc_id"].to_pylist()
            assert sub["score"].tolist() == want["score"].to_pylist()
    finally:
        idx.close()


def test_decontaminate_ngrams_partition(ray_session):
    """ops/decontam.py: clean + contaminated partition the input; a
    doc is contaminated iff it shares an n-gram with the benchmark;
    short docs shingle to their whole text; empty docs are clean."""
    import ray.data

    from yaii_ray.ops.decontam import decontaminate_ngrams

    bench = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100, 101], type=pa.int64()),
                "text": ["the quick brown fox jumps", "tiny doc"],
            }
        )
    )
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(6)), type=pa.int64()),
                "text": [
                    "a quick brown fox ran",      # shares "quick brown fox"
                    "nothing in common here",      # clean
                    "tiny doc",                    # short-doc whole-text match
                    "tiny doc plus more words x",  # contains no full 3-gram of bench
                    "",                            # empty -> clean
                    "the quick brown dog",         # shares "the quick brown"
                ],
            }
        )
    ).repartition(3)

    dirty = decontaminate_ngrams(
        train, bench, n=3, keep="contaminated"
    ).to_pandas()
    clean = decontaminate_ngrams(train, bench, n=3, keep="clean").to_pandas()
    assert sorted(dirty["doc_id"]) == [0, 2, 5]
    assert sorted(clean["doc_id"]) == [1, 3, 4]
    assert len(dirty) + len(clean) == 6


def test_decontaminate_ngrams_empty_benchmark(ray_session):
    """ADVICE r4: a benchmark with zero shingles (empty texts) must
    mark every doc clean, not IndexError into the empty hash array."""
    import ray.data

    from yaii_ray.ops.decontam import decontaminate_ngrams

    bench = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([0], type=pa.int64()), "text": [""]}
        )
    )
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": ["some words here", ""],
            }
        )
    )
    clean = decontaminate_ngrams(train, bench, n=3, keep="clean").to_pandas()
    dirty = decontaminate_ngrams(
        train, bench, n=3, keep="contaminated"
    ).to_pandas()
    assert sorted(clean["doc_id"]) == [0, 1]
    assert len(dirty) == 0


def test_curate_with_decontam_stage(ray_session):
    """pipelines.curate(bench_ds=...): the decontamination stage drops
    benchmark-overlapping docs between the quality filter and dedup."""
    import ray.data

    from yaii_ray.pipelines import curate

    mk = lambda ids, texts: ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": texts,
            }
        )
    )
    base = (
        "the data model is small and the table scans are fast because "
        "the planner prunes all of the columns it can"
    )
    train = mk(
        [0, 1, 2],
        [
            base,                              # clean, high quality
            base,                              # exact dup of 0
            base + " zebra quagga yak",        # contains bench 3-gram
        ],
    )
    bench = mk([99], ["zebra quagga yak with other filler words"])
    out = (
        curate(train, min_quality=0.0, langs=None, bench_ds=bench,
               decontam_n=3)
        .to_pandas()
        .sort_values("doc_id")
    )
    # doc 2 decontaminated; doc 1 deduped against doc 0
    assert out["doc_id"].tolist() == [0]


def test_redact_pii_patterns():
    """ops/curation.py: email/phone/IPv4 scrubbed in order; nulls ->
    empty; non-PII digit runs untouched (kernel-only, no Ray)."""
    from yaii_ray.ops.curation import redact_pii_batch

    t = pa.table(
        {
            "text": [
                "mail bob.smith+x@ex-ample.co.uk now",
                "call 555-123-4567 or 10.0.0.1 today",
                None,
                "plain text 1.2 no pii 1234.5678",
                "a@b.io c@d.org twice",
            ]
        }
    )
    got = redact_pii_batch(t)["text"].to_pylist()
    assert got == [
        "mail <EMAIL> now",
        "call <PHONE> or <IP> today",
        "",
        "plain text 1.2 no pii 1234.5678",
        "<EMAIL> <EMAIL> twice",
    ]


def test_repetition_stats_handcrafted():
    """ops/textstats.py: dup-word and top-bigram fractions on docs
    with known values; empty/whitespace/single-token docs are 0/0."""
    from yaii_ray.ops.textstats import repetition_stats_batch

    t = pa.table({"text": ["a a a b", "x y x y x z", "", "  ", "solo", "a b a b"]})
    out = repetition_stats_batch(t)
    assert out["dup_word_frac"].to_pylist() == [
        0.5, 0.5, 0.0, 0.0, 0.0, 0.5,
    ]
    got_bg = out["top_bigram_frac"].to_pylist()
    want_bg = [2 / 3, 2 / 5, 0.0, 0.0, 0.0, 2 / 3]
    assert all(abs(g - w) < 1e-12 for g, w in zip(got_bg, want_bg))


def test_sample_hash_deterministic(ray_session):
    """ops/curation.py: keep set == direct md5 recompute, stable
    across runs, stratified rates route per source, missing strata
    drop; Dataset wrapper matches the kernel."""
    import hashlib

    import ray.data

    from yaii_ray.ops.curation import (
        _hex_threshold, sample_hash, sample_hash_batch,
    )

    n = 500
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "source": pa.array(["s%d" % (i % 3) for i in range(n)]),
        }
    )
    rates = {"s0": 1.0, "s1": 0.3}  # s2 missing -> dropped
    want = [
        i
        for i in range(n)
        if hashlib.md5(str(i).encode()).hexdigest()[:8]
        < _hex_threshold(rates.get("s%d" % (i % 3), 0.0))
        and "s%d" % (i % 3) in rates
    ]
    got = sample_hash_batch(t, rates=rates)["doc_id"].to_pylist()
    assert got == want
    assert all(i % 3 == 0 for i in got if i % 3 == 0)  # s0 kept fully
    assert [i for i in got if i % 3 == 0] == [i for i in range(n) if i % 3 == 0]
    assert not any(i % 3 == 2 for i in got)
    ds_got = (
        sample_hash(ray.data.from_arrow(t), rates=rates)
        .to_pandas()["doc_id"].sort_values().tolist()
    )
    assert ds_got == want
    # seed changes the sample
    assert sample_hash_batch(t, rate=0.5, seed="v2")["doc_id"].to_pylist() != \
        sample_hash_batch(t, rate=0.5)["doc_id"].to_pylist()


def test_pack_sequences_matches_reference_loop(ray_session):
    """ops/curation.py: grouped greedy packing == a driver reference
    loop per domain; oversize docs sit alone; ids may arrive
    unsorted."""
    import ray.data

    from yaii_ray.ops.curation import pack_sequences

    rng = np.random.default_rng(11)
    ids = rng.permutation(300).astype(np.int64)
    sizes = rng.integers(10, 900, size=300).astype(np.int64)
    sizes[17] = 5000  # oversize: alone in its sequence
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(sizes)})
    budget, rs = 1000, 64

    got = (
        pack_sequences(ray.data.from_arrow(t), budget=budget, range_size=rs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    by_id = dict(zip(ids.tolist(), sizes.tolist()))
    want = {}
    for dom in sorted({i // rs for i in range(300)}):
        running, s = 0, 0
        for i in sorted(d for d in range(300) if d // rs == dom):
            nch = by_id[i]
            if running > 0 and running + nch > budget:
                s += 1
                running = 0
            want[i] = (dom, s)
            running += nch
    assert len(got) == 300
    for _, row in got.iterrows():
        assert (row["dom"], row["seq"]) == want[row["doc_id"]]
    # the oversize doc (position 17 of the PERMUTED id array) is
    # alone in its (dom, seq)
    odom, oseq = want[int(ids[17])]
    assert sum(1 for v in want.values() if v == (odom, oseq)) == 1


def test_dedup_shuffles_degenerate_sizing(ray_session):
    """ADVICE r3 #1: degenerate corpora (fewer distinct keys than
    shuffle blocks) must not leave empty reduce partitions.
    dedup_exact's final defaults to nbuckets//16 partitions (1 at the
    default), and the forced-ray Jaccard verify clamps its coalesce /
    join buckets to the measured candidate count."""
    import ray.data

    # 1 distinct text across 40 rows, default nbuckets=16
    t = pa.table(
        {
            "doc_id": pa.array(range(40), type=pa.int64()),
            "text": ["same text here"] * 40,
        }
    )
    out = dedup.dedup_exact(ray.data.from_arrow(t)).to_pandas()
    assert out["doc_id"].tolist() == [0]

    # forced ray verify on ONE candidate pair with a large nbuckets
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": ["x y z w q", "x y z w v"],
        }
    )
    cands = ray.data.from_arrow(
        pa.table(
            {"a": pa.array([0], type=pa.int64()),
             "b": pa.array([1], type=pa.int64())}
        )
    )
    got = dedup.jaccard_verify_pairs_ray(
        ray.data.from_arrow(docs), cands, tau=0.1, nbuckets=64,
        ngram=1, n_cands=1,
    )
    assert len(got) == 1
    assert (got["a"].iloc[0], got["b"].iloc[0]) == (0, 1)


def test_curate_extended_stages(ray_session):
    """pipelines.curate: the repetition screen drops word-soup docs,
    redaction scrubs survivor text, and per-stratum sampling keeps
    exactly the md5-selected ids — stage order dedup -> redact ->
    sample."""
    import hashlib

    import ray.data

    from yaii_ray.ops.curation import _hex_threshold
    from yaii_ray.pipelines import curate

    nat = (
        "the quick brown fox and the lazy dog were seen in the park "
        "and it was a fine day for all of them to play"
    )
    soup = "spam spam spam spam spam spam ham"
    t = pa.table(
        {
            "doc_id": pa.array(range(8), type=pa.int64()),
            "text": [
                nat,
                soup,                      # dup_word_frac 5/7 > 0.6 -> dropped
                nat + " contact a@b.io",   # distinct text, redacted later
                nat,                       # exact dup of 0 -> dropped
            ] * 2,
            "source": ["s0", "s0", "s0", "s0", "s1", "s1", "s1", "s1"],
        }
    )
    out = (
        curate(
            ray.data.from_arrow(t),
            min_quality=0.0,
            langs=None,
            max_dup_word_frac=0.6,
            redact=True,
            sample_rates={"s0": 1.0},  # s1 missing -> dropped entirely
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    # doc 1 repetition-dropped; 3 deduped vs 0; 4-7 are s1 (no rate);
    # doc 4's text == doc 0's -> also deduped before sampling anyway
    assert out["doc_id"].tolist() == [0, 2]
    assert out.loc[out.doc_id == 2, "text"].iloc[0].endswith("contact <EMAIL>")
    assert _hex_threshold(1.0) == "g"
    assert hashlib.md5(b"0").hexdigest()[:8] < "g"


def test_unigram_logprob_handcrafted(ray_session):
    """ops/textstats.py: bits_per_token == hand-computed mean
    -log2 p under the add-0.5-smoothed corpus unigram model; empty
    docs score 0."""
    import math

    import ray.data

    from yaii_ray.ops.textstats import unigram_logprob

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": ["a a b", "b c", ""],
        }
    )
    out = (
        unigram_logprob(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
    )
    # counts: a=2 b=2 c=1, total=5, V=3, denom = 5 + 0.5*3 = 6.5
    pa_, pb, pc_ = 2.5 / 6.5, 2.5 / 6.5, 1.5 / 6.5
    want = [
        -(2 * math.log2(pa_) + math.log2(pb)) / 3,
        -(math.log2(pb) + math.log2(pc_)) / 2,
        0.0,
    ]
    got = out["bits_per_token"].tolist()
    assert all(abs(g - w) < 1e-12 for g, w in zip(got, want))


def test_search_dataset_all_termless_queries(ray_session, tmp_path):
    """Sharded path: a query set where NO query has surviving terms
    produces an empty (schema-full) result — the union + merge
    shuffle must not choke on all-empty partials."""
    import ray.data

    from yaii_ray.build import build_index_from_table
    from yaii_ray.config import FieldConfig, IndexConfig, KIND_TEXT
    from yaii_ray.ops.search import search_dataset

    t = pa.table({"text": pa.array(["alpha beta gamma"] * 20)})
    cfg = IndexConfig(
        fields={"text": FieldConfig(kind=KIND_TEXT, scored=True)},
        all_field=False,
        num_shards=2,
    )
    out = str(tmp_path / "termless_idx")
    build_index_from_table(t, out, cfg)
    qt = pa.table(
        {
            "qid": pa.array([0, 1], type=pa.int64()),
            "query": ["zzz_nope", "qqq_nothing"],
        }
    )
    got = search_dataset(
        ray.data.from_arrow(qt), out, k=5, concurrency=2, batch_size=1
    ).to_pandas()
    # Ray drops the schema when a groupby has zero groups (verified:
    # even unioning a schema-full 0-row seed doesn't restore it), so
    # the contract for this degenerate case is 0 rows, columns
    # unspecified — callers must gate on len() before column access
    assert len(got) == 0


def test_greedy_pack_invariants_property():
    """ops/curation.greedy_pack (pure, no Ray): sequence ids start at
    0 and step by at most 1; every multi-item sequence's total fits
    the budget; greedy = the first item of each new sequence would
    have overflowed the previous one."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from yaii_ray.ops.curation import greedy_pack

    @settings(max_examples=200, deadline=None)
    @given(
        ns=st.lists(st.integers(1, 2000), min_size=1, max_size=120),
        budget=st.integers(1, 3000),
    )
    def check(ns, budget):
        arr = np.asarray(ns, dtype=np.int64)
        seq = greedy_pack(arr, budget)
        assert seq[0] == 0
        steps = np.diff(seq)
        assert ((steps == 0) | (steps == 1)).all()
        for s in range(int(seq.max()) + 1):
            members = arr[seq == s]
            assert members.size >= 1
            if members.size > 1:
                assert members.sum() <= budget
        starts = np.flatnonzero(np.r_[False, steps == 1])
        for i in starts:
            prev_members = arr[(seq == seq[i] - 1)]
            assert prev_members.sum() + arr[i] > budget

    check()


def test_quantize_embeddings_batch():
    """ops/ann.py: int8 codes match direct computation, reconstruction
    error is bounded by scale/2 per component, zero vectors get scale
    0 and zero codes (kernel-only, no Ray)."""
    rng = np.random.default_rng(3)
    vecs = [rng.standard_normal(8).astype(np.float32) for _ in range(5)]
    vecs.append(np.zeros(8, dtype=np.float32))
    t = pa.table(
        {
            "vec_id": pa.array(range(6), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float32())),
        }
    )
    out = ann.quantize_embeddings_batch(t)
    scales = out["q_scale"].to_pylist()
    codes = out["q_embedding"].to_pylist()
    for v, s, q in zip(vecs, scales, codes):
        x = v.astype(np.float64)
        if not x.any():
            assert s == 0.0 and all(c == 0 for c in q)
            continue
        want_s = np.abs(x).max() / 127.0
        assert s == want_s
        want_q = np.clip(np.floor(x / want_s + 0.5), -127, 127)
        assert q == want_q.astype(np.int64).tolist()
        recon = np.asarray(q, dtype=np.float64) * s
        assert np.abs(recon - x).max() <= s / 2 + 1e-12
        assert max(abs(c) for c in q) == 127  # max component hits full range


def test_quantize_embeddings_alignment_under_nulls_and_slices():
    """ops/ann.py _flat_values: a null slot with a spanning backing
    range (or a sliced view, or a null fixed_size_list row) must not
    shift later vectors' values — flatten() would (kernel-only)."""
    # variable list: middle slot null but spanning two backing values
    values = pa.array([1.0, 2.0, 9.0, 9.0, 4.0, 8.0], pa.float32())
    offsets = pa.array([0, 2, 4, 6], pa.int32())
    mask = pa.array([False, True, False])
    arr = pa.ListArray.from_arrays(offsets, values, mask=mask)
    t = pa.table({"vec_id": pa.array(range(3), pa.int64()), "embedding": arr})
    out = ann.quantize_embeddings_batch(t)
    # row 2 = [4, 8]: scale 8/127, codes floor(x/s + .5)
    s2 = out["q_scale"][2].as_py()
    assert s2 == 8.0 / 127.0
    assert out["q_embedding"][2].as_py() == [64, 127]
    assert out["q_scale"][0].as_py() == 2.0 / 127.0

    # sliced fixed_size_list with a null row in front
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array([0.0, 0.0, 3.0, 6.0, 5.0, 10.0], pa.float32()), 2
    )
    sl = fsl.slice(1, 2)  # [[3,6],[5,10]]
    t2 = pa.table({"vec_id": pa.array(range(2), pa.int64()), "embedding": sl})
    out2 = ann.quantize_embeddings_batch(t2)
    assert out2["q_scale"].to_pylist() == [6.0 / 127.0, 10.0 / 127.0]
    assert out2["q_embedding"][1].as_py() == [64, 127]


def test_brute_topk_quantized_close_to_exact(emb_ds):
    """ops/ann.py: int8-served top-k — cosines within quantization
    noise of the exact scores, and the planted near-identical vectors
    (cosine ~1, far above the noise floor) keep their top-1 slots."""
    ds, mat, ids = emb_ds
    qm = mat[:3].astype(np.float64)
    exact = ann.brute_topk(ds, qm, k=5)
    quant = ann.brute_topk_quantized(ds, qm, k=5)
    assert len(quant) == len(exact)
    # planted pairs: query j's top hit list must contain vec 30+j with
    # cosine > 0.99 even after int8 reconstruction
    for j in range(3):
        sub = quant[quant["query"] == j]
        hit = sub[sub["vec_id"] == 30 + j]
        assert len(hit) == 1 and hit["cosine"].iloc[0] > 0.99
    # per-(query, vec) cosine deltas bounded by quantization noise
    m = exact.merge(quant, on=["query", "vec_id"], suffixes=("_e", "_q"))
    assert len(m) > 0
    assert (m["cosine_e"] - m["cosine_q"]).abs().max() < 0.02


def test_bucketed_candidate_pairs_parity_and_scale(ray_session):
    """VERDICT r4 #2: candidate emission groups by a bounded hash
    bucket (Arrow), not per LSH bucket in pandas. Parity: the same
    pair set as the per-bucket reference kernel on random buckets.
    Scale: ~1e5 distinct LSH buckets complete in a handful of reduce
    calls (time-bounded — per-bucket Python would be 1e5 calls)."""
    import time

    import ray.data

    rng = np.random.default_rng(17)
    # parity on a skewed small case: bucket sizes 1..40, repeated ids
    sizes = rng.integers(1, 40, size=200)
    bh, ids = [], []
    for bkt, s in enumerate(sizes):
        members = rng.choice(500, size=s, replace=True)
        bh.extend([bkt] * s)
        ids.extend(members.tolist())
    rows = pd.DataFrame({
        "band": np.zeros(len(bh), dtype=np.int32),
        "band_hash": np.array(bh, dtype=np.uint64),
        "doc_id": np.array(ids, dtype=np.int64),
    })
    got = (
        dedup.bucketed_candidate_pairs(
            ray.data.from_pandas(rows), ["band", "band_hash"], "doc_id",
            nbuckets=16,
        )
        .to_pandas()
        .drop_duplicates()
    )
    want = (
        rows.groupby(["band", "band_hash"], group_keys=False)[rows.columns]
        .apply(lambda g: dedup.candidate_pairs_from_buckets(g, "doc_id"))
        .drop_duplicates()
    )
    assert set(zip(got["a"], got["b"])) == set(zip(want["a"], want["b"]))

    # scale: 1e5 buckets of 2 -> exactly 1e5 pairs, no per-bucket loop
    nb = 100_000
    big = pd.DataFrame({
        "band": np.zeros(2 * nb, dtype=np.int32),
        "band_hash": np.repeat(np.arange(nb, dtype=np.uint64), 2),
        "doc_id": np.arange(2 * nb, dtype=np.int64),
    })
    t0 = time.monotonic()
    out = dedup.bucketed_candidate_pairs(
        ray.data.from_pandas(big), ["band", "band_hash"], "doc_id"
    ).to_pandas()
    assert len(out) == nb
    assert (out["b"] - out["a"] == 1).all()
    assert time.monotonic() - t0 < 30, "per-bucket Python loop regression"


def test_segment_all_pairs_fuzz():
    """Pure-numpy fuzz of the vectorized pair-emission kernel against
    a per-segment reference loop (edge cases: empty input, all
    singletons, interleaved empty prefixes in _concat_aranges)."""
    from yaii_ray.ops.dedup import _concat_aranges, segment_all_pairs

    a, b = segment_all_pairs(np.array([], dtype=np.int64), np.array([], dtype=bool))
    assert a.size == b.size == 0
    a, b = segment_all_pairs(
        np.array([5, 7, 9], dtype=np.int64), np.array([True, True, True])
    )
    assert a.size == 0
    out = _concat_aranges(
        np.array([3, 9, 100], dtype=np.int64), np.array([2, 0, 3], dtype=np.int64)
    )
    assert out.tolist() == [3, 4, 100, 101, 102]

    rng = np.random.default_rng(0)
    for trial in range(100):
        nseg = rng.integers(1, 20)
        sizes = rng.integers(1, 8, size=nseg)
        ids_l, seg_l = [], []
        for s in sizes:
            vals = np.sort(rng.choice(1000, size=s, replace=False))
            ids_l.extend(vals.tolist())
            seg_l.extend([True] + [False] * (s - 1))
        ids = np.array(ids_l, dtype=np.int64)
        seg = np.array(seg_l)
        a, b = segment_all_pairs(ids, seg)
        want = []
        pos = 0
        for s in sizes:
            grp = ids[pos : pos + s]
            for i in range(int(s)):
                for j in range(i + 1, int(s)):
                    want.append((int(grp[i]), int(grp[j])))
            pos += int(s)
        assert sorted(zip(a.tolist(), b.tolist())) == sorted(want), trial
