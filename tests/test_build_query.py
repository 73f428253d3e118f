"""End-to-end: build over the synthetic transcript corpus, then verify
boolean retrieval, BM25 parity against the brute-force oracle, text
round-trip under stable (conv_id, turn_idx) order, and resume."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yaii_ray import corpus
from yaii_ray.build import build_index, load_manifest
from yaii_ray.config import transcripts_config
from yaii_ray.engine import Index
from yaii_ray.oracle import BruteForceBM25
from yaii_ray.query import dsl

N_TURNS = 3000


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    src = corpus.transcripts_path(N_TURNS, base="/tmp/yaii_corpus_test", row_group_size=500)
    out = str(tmp_path_factory.mktemp("idx") / "transcripts")
    cfg = transcripts_config(num_shards=4)
    cfg.chunk_shift = 9  # 512-doc chunks -> exercises salting/chunking
    build_index(src, out, cfg, target_unit_rows=700)
    idx = Index(out)
    idx.warmup()
    full = pa.concat_tables(
        pq.read_table(f)
        for f in sorted(
            os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
        )
    )
    yield idx, full
    idx.close()


def test_docs_roundtrip_stable_order(built):
    """Per-turn text equality under stable (conv_id, turn_idx) order —
    the driver input_hint's per-row invariant."""
    idx, src = built
    docs_files = [p for s in idx.manifest["segments"] for p in s["docs_files"]]
    rebuilt = pa.concat_tables(pq.read_table(f) for f in docs_files)
    rebuilt = rebuilt.sort_by("doc_id")
    assert rebuilt.num_rows == src.num_rows
    assert rebuilt["text"].to_pylist() == src["text"].to_pylist()
    assert rebuilt["conv_id"].to_pylist() == src["conv_id"].to_pylist()
    assert rebuilt["turn_idx"].to_pylist() == src["turn_idx"].to_pylist()
    # doc ids are dense 0..N-1 in (conv_id, turn_idx) order
    assert rebuilt["doc_id"].to_pylist() == list(range(src.num_rows))
    # listAllKnownField analog
    assert set(idx.fields()) >= {"conv_id", "turn_idx", "text"}


def test_boolean_retrieval_matches_scan(built):
    idx, src = built
    texts = src["text"].to_pylist()
    from yaii_ray.analysis.tokenizer import tokenize_string

    tok_sets = [set(tokenize_string(t, stopwords=True)) for t in texts]
    # pick a mid-frequency and a rare term from the corpus
    from collections import Counter

    df = Counter(t for s in tok_sets for t in s)
    mid = next(t for t, c in df.most_common() if c < len(texts) // 3)
    rare = min(df, key=lambda t: (df[t], t))

    got = idx.resolve(dsl.token(mid, "text"))
    want = np.array([i for i, s in enumerate(tok_sets) if mid in s], dtype=np.uint64)
    assert (got == want).all()

    got = idx.resolve(dsl.and_query(dsl.token(mid, "text"), dsl.token(rare, "text")))
    want = [i for i, s in enumerate(tok_sets) if mid in s and rare in s]
    assert got.tolist() == want

    got = idx.resolve(
        dsl.and_query(
            dsl.token(mid, "text"), dsl.not_query(dsl.token(rare, "text"))
        )
    )
    want = [i for i, s in enumerate(tok_sets) if mid in s and rare not in s]
    assert got.tolist() == want

    got = idx.resolve(dsl.or_query(dsl.token(mid, "text"), dsl.token(rare, "text")))
    want = [i for i, s in enumerate(tok_sets) if mid in s or rare in s]
    assert got.tolist() == want


def test_keyword_and_presence(built):
    idx, src = built
    roles = src["role"].to_pylist()
    got = idx.resolve(dsl.token("assistant", "role"))
    want = [i for i, r in enumerate(roles) if r == "assistant"]
    assert got.tolist() == want

    tools = src["tool"].to_pylist()
    got = idx.resolve(dsl.present("tool"))
    want = [i for i, t in enumerate(tools) if t is not None]
    assert got.tolist() == want


def test_token_range_and_text_contains(built):
    """Q15 — declared-but-throwing upstream (query-ir.ts:220-223);
    implemented here over the sorted term dictionary. Oracle: python
    re-tokenization + codepoint comparison / substring test."""
    idx, src = built
    from yaii_ray.analysis.tokenizer import tokenize_string

    tok_sets = [set(tokenize_string(t, stopwords=True)) for t in src["text"].to_pylist()]
    vocab = sorted({t for s in tok_sets for t in s})
    lo, hi = vocab[len(vocab) // 3], vocab[2 * len(vocab) // 3]

    for mini, maxi in [(True, False), (True, True), (False, False), (False, True)]:
        got = idx.resolve(
            dsl.token_range("text", min=lo, max=hi, min_inclusive=mini, max_inclusive=maxi)
        )
        def keep(t):
            okl = t >= lo if mini else t > lo
            okh = t <= hi if maxi else t < hi
            return okl and okh
        want = [i for i, s in enumerate(tok_sets) if any(keep(t) for t in s)]
        assert got.tolist() == want, (mini, maxi)

    # unbounded above; then the empty range
    got = idx.resolve(dsl.token_range("text", min=hi))
    want = [i for i, s in enumerate(tok_sets) if any(t >= hi for t in s)]
    assert got.tolist() == want
    assert idx.resolve(dsl.token_range("text", min=hi, max=lo)).size == 0

    # substring over dictionary tokens (pick a needle hitting >1 term)
    needle = next(t[1:-1] for t in vocab if len(t) >= 4)
    matching = {t for t in vocab if needle in t}
    assert len(matching) >= 1
    got = idx.resolve(dsl.text_contains(needle, "text"))
    want = [i for i, s in enumerate(tok_sets) if s & matching]
    assert got.tolist() == want

    # composes with boolean algebra + empty needle = any-token
    got = idx.resolve(
        dsl.and_query(dsl.text_contains(needle, "text"), dsl.token("assistant", "role"))
    )
    roles = src["role"].to_pylist()
    want = [i for i, s in enumerate(tok_sets) if s & matching and roles[i] == "assistant"]
    assert got.tolist() == want
    got = idx.resolve(dsl.text_contains("", "text"))
    want = [i for i, s in enumerate(tok_sets) if s]
    assert got.tolist() == want
    # no-match needle
    assert idx.resolve(dsl.text_contains("\x01zz\x01", "text")).size == 0


def test_number_queries(built):
    idx, src = built
    turn = src["turn_idx"].to_pylist()
    got = idx.resolve(dsl.number(3, "turn_idx"))
    want = [i for i, v in enumerate(turn) if v == 3]
    assert got.tolist() == want

    got = idx.resolve(dsl.number_range("turn_idx", min=2, max=5))
    want = [i for i, v in enumerate(turn) if 2 <= v < 5]
    assert got.tolist() == want


def test_bm25_rank_and_score_identical_to_oracle(built):
    idx, src = built
    oracle = BruteForceBM25(
        src, "text", np.arange(src.num_rows, dtype=np.uint64), idx.config
    )
    # engine stats must equal oracle stats
    dc, avgdl = idx.field_stats("text")
    assert dc == oracle.doc_count
    assert avgdl == oracle.avgdl

    vocab = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    hot, mid, rare = vocab[0], vocab[len(vocab) // 3], vocab[-1]
    queries = [
        hot,
        mid,
        rare,
        f"{hot} {mid}",
        f"{hot} {rare} {mid}",
        f"{mid} the and of {rare}",   # stopwords must drop out
        "zzz-no-such-term",
        f"{mid} {mid} {hot}",          # duplicate query terms collapse
        # several similar-df terms: the window bound must SUM per-term
        # maxima (regression for the max-vs-sum window-bound bug)
        " ".join(vocab[10:14]),
        " ".join(vocab[2:7]),
    ]
    for q in queries:
        for k in (1, 10, 50):
            got_d, got_s = None, None
            t = idx.search(q, field="text", k=k)
            got_d = np.asarray(t["doc_id"].to_numpy(), dtype=np.uint64)
            got_s = t["score"].to_numpy()
            want_d, want_s = oracle.search(q, k=k)
            assert got_d.tolist() == want_d.tolist(), f"docs differ for {q!r} k={k}"
            # bitwise-identical float64 scores
            assert got_s.tolist() == want_s.tolist(), f"scores differ for {q!r} k={k}"


def test_search_many_matches_single(built):
    """Batched BM25 (one RPC per shard for the whole batch) must be
    per-element bitwise identical to search(), including empty-term
    queries mid-batch."""
    idx, src = built
    oracle = BruteForceBM25(
        src, "text", np.arange(src.num_rows, dtype=np.uint64), idx.config
    )
    vocab = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    queries = [
        vocab[0],
        f"{vocab[0]} {vocab[5]}",
        "zzz-no-such-term",
        " ".join(vocab[2:6]),
        vocab[-1],
    ]
    batched = idx.search_many(queries, field="text", k=10)
    assert len(batched) == len(queries)
    for q, got in zip(queries, batched):
        want = idx.search(q, field="text", k=10)
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist(), q
        assert got["score"].to_pylist() == want["score"].to_pylist(), q


def test_filtered_bm25(built):
    idx, src = built
    oracle = BruteForceBM25(
        src, "text", np.arange(src.num_rows, dtype=np.uint64), idx.config
    )
    vocab = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    q = f"{vocab[0]} {vocab[5]}"
    t = idx.search(q, field="text", k=20, filter=dsl.token("user", "role"))
    roles = src["role"].to_pylist()
    allowed = {i for i, r in enumerate(roles) if r == "user"}
    full_d, full_s = oracle.search(q, k=src.num_rows)
    keep = [i for i, d in enumerate(full_d) if int(d) in allowed][:20]
    assert t["doc_id"].to_pylist() == [int(full_d[i]) for i in keep]
    assert t["score"].to_pylist() == [float(full_s[i]) for i in keep]


def test_sorted_query_and_projection(built):
    idx, src = built
    t = idx.query(
        dsl.token("user", "role"),
        sort=[dsl.SortClause("ts", dsl.DESC)],
        limit=5,
        columns=["conv_id", "turn_idx", "ts"],
    )
    roles = src["role"].to_pylist()
    ts = src["ts"].to_pylist()
    want = sorted(
        (i for i, r in enumerate(roles) if r == "user"),
        key=lambda i: ts[i],
        reverse=True,
    )[:5]
    assert t["doc_id"].to_pylist() == want


def test_resume_skips_completed_segments(ray_session, tmp_path):
    src = corpus.transcripts_path(N_TURNS, base="/tmp/yaii_corpus_test", row_group_size=500)
    out = str(tmp_path / "idx2")
    cfg = transcripts_config(num_shards=2)
    m1: dict = {}
    build_index(src, out, cfg, target_unit_rows=1000, units_per_segment=2, metrics=m1)
    manifest1 = load_manifest(out)
    assert len(manifest1["segments"]) >= 2
    assert all(not s.get("skipped") for s in m1["segments"])

    # delete the LAST segment's manifest -> only it rebuilds
    segs = sorted(
        f for f in os.listdir(out) if f.endswith(".manifest.json")
    )
    os.remove(os.path.join(out, segs[-1]))
    m2: dict = {}
    build_index(src, out, cfg, target_unit_rows=1000, units_per_segment=2, metrics=m2)
    skipped = [s for s in m2["segments"] if s.get("skipped")]
    assert len(skipped) == len(segs) - 1
    manifest2 = load_manifest(out)
    assert manifest1["stats"] == manifest2["stats"]
    assert [s["postings"] for s in manifest1["segments"]] == [
        s["postings"] for s in manifest2["segments"]
    ]


def test_shard_actor_restart_recovers(built):
    """Shard state is a pure function of (index_dir, shard_id): a
    killed actor is transparently restarted by Ray (max_restarts) and
    the retried query returns identical results."""
    import ray

    idx, _ = built
    q = dsl.token("the", "text")
    before = idx.resolve(q)
    victim = idx.actors[0]
    ray.kill(victim, no_restart=False)
    after = idx.resolve(q)
    assert np.array_equal(before, after)
    s_before = idx.search("retry tool error", field="text", k=5)
    ray.kill(idx.actors[1], no_restart=False)
    s_after = idx.search("retry tool error", field="text", k=5)
    assert s_before.equals(s_after)


def test_docs_dataset_empty_filter(built):
    """An empty index result pushed into a scan yields zero rows (the
    broadcast searchsorted mask edge the gate's filtered_scan_agg
    relies on)."""
    idx, _src = built
    ds = idx.docs_dataset(columns=["text"], doc_ids=np.zeros(0, dtype=np.uint64))
    assert ds.count() == 0


def test_bm25_oracle_parity_50k(ray_session, tmp_path):
    """FIXTURES.md sf-correct scale: WAND top-k rank- AND
    score-identical (bitwise float64) to the brute-force oracle on a
    50k-turn corpus — larger df skew, multi-chunk postings, all 4
    shards populated."""
    src = corpus.transcripts_path(
        50_000, base="/tmp/yaii_corpus_test", row_group_size=2000
    )
    out = str(tmp_path / "idx50k")
    cfg = transcripts_config(num_shards=4)
    cfg.chunk_shift = 12  # 4096-doc chunks -> multi-chunk hot terms
    build_index(src, out, cfg, target_unit_rows=8000)
    idx = Index(out)
    idx.warmup()
    full = pa.concat_tables(
        pq.read_table(f)
        for f in sorted(
            os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
        )
    )
    oracle = BruteForceBM25(
        full, "text", np.arange(full.num_rows, dtype=np.uint64), cfg
    )
    assert idx.field_stats("text") == (oracle.doc_count, oracle.avgdl)
    vocab = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    queries = [
        vocab[0],
        f"{vocab[0]} {vocab[50]}",
        f"{vocab[5]} {vocab[500]} {vocab[-1]}",
        " ".join(vocab[20:25]),
    ]
    for q in queries:
        t = idx.search(q, field="text", k=20)
        want_d, want_s = oracle.search(q, k=20)
        assert t["doc_id"].to_numpy().tolist() == want_d.tolist(), q
        assert t["score"].to_numpy().tolist() == want_s.tolist(), q
    idx.close()
