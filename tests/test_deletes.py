"""Q14 — deleted/tombstone mask. The reference masks a per-segment
deleted set out of every resolved doc range at query time
(``removeDeletedAndAddedAfter``, src/lib/internal/utils.ts:196-220;
deleted bitmap in segment.ts:12-57). Here deletes are tombstone
Parquet files + an atomic manifest; query paths mask shard-side, and
``compact_index`` physically purges postings/docs and recomputes
stats (EXCEEDS reference — upstream merge is a TODO)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yaii_ray import corpus
from yaii_ray.build import build_index, compact_index, load_manifest
from yaii_ray.config import transcripts_config
from yaii_ray.engine import Index
from yaii_ray.oracle import BruteForceBM25
from yaii_ray.query import dsl

N_TURNS = 2000


@pytest.fixture(scope="module")
def delidx(ray_session, tmp_path_factory):
    src = corpus.transcripts_path(N_TURNS, base="/tmp/yaii_corpus_test", row_group_size=500)
    out = str(tmp_path_factory.mktemp("delidx") / "transcripts")
    cfg = transcripts_config(num_shards=4)
    cfg.chunk_shift = 9
    build_index(src, out, cfg, target_unit_rows=700)
    idx = Index(out)
    full = pa.concat_tables(
        pq.read_table(os.path.join(src, f))
        for f in sorted(os.listdir(src))
        if f.endswith(".parquet")
    )
    yield idx, full, out, cfg
    idx.close()


def _tok_sets(src):
    from yaii_ray.analysis.tokenizer import tokenize_string

    return [set(tokenize_string(t, stopwords=True)) for t in src["text"].to_pylist()]


def _mid_term(tok_sets):
    from collections import Counter

    df = Counter(t for s in tok_sets for t in s)
    return next(t for t, c in df.most_common() if c < len(tok_sets) // 3)


def test_delete_masks_all_query_paths(delidx):
    idx, src, out, cfg = delidx
    tok_sets = _tok_sets(src)
    mid = _mid_term(tok_sets)
    n_docs = src.num_rows

    del_q = dsl.and_query(dsl.token(mid, "text"), dsl.token("user", "role"))
    expect_del = sorted(
        i
        for i, s in enumerate(tok_sets)
        if mid in s and src["role"][i].as_py() == "user"
    )
    before = idx.resolve(del_q)
    assert before.tolist() == expect_del

    n = idx.delete(del_q)
    assert n == len(expect_del)
    assert idx.deleted_count() == n
    dele = set(expect_del)

    # boolean paths (resolve / count / NOT / ALL)
    assert idx.resolve(del_q).size == 0
    assert idx.count(del_q) == 0
    got = idx.resolve(dsl.token(mid, "text"))
    assert got.tolist() == [i for i, s in enumerate(tok_sets) if mid in s and i not in dele]
    got = idx.resolve(dsl.all_query())
    assert got.tolist() == [i for i in range(n_docs) if i not in dele]
    got = idx.resolve(dsl.not_query(dsl.token(mid, "text")))
    assert got.tolist() == [i for i in range(n_docs) if mid not in tok_sets[i] and i not in dele]

    # unsorted limited query (resolve_head) returns only live docs
    rows = idx.query(dsl.token("user", "role"), limit=7)
    live_user = [
        i for i in range(n_docs) if src["role"][i].as_py() == "user" and i not in dele
    ]
    assert rows["doc_id"].to_pylist() == live_user[:7]

    # BM25: stats frozen (full-corpus df/N/avgdl), candidates masked —
    # oracle = full brute ranking, deleted filtered out, head-k
    brute = BruteForceBM25(src, "text", np.arange(n_docs, dtype=np.uint64), cfg)
    q = f"{mid} data"
    bd, bs = brute.search(q, k=n_docs)
    keep = np.array([int(d) not in dele for d in bd], dtype=bool)
    bd, bs = bd[keep][:10], bs[keep][:10]
    got = idx.search(q, field="text", k=10)
    assert got["doc_id"].to_pylist() == bd.tolist()
    assert got["score"].to_pylist() == bs.tolist()

    # raw docs_dataset scan excludes tombstones
    ids = idx.docs_dataset(columns=["doc_id"]).to_pandas()["doc_id"]
    assert set(ids) == set(range(n_docs)) - dele

    # a second delete accumulates; re-deleting the same set is a no-op
    more_q = dsl.number_range("turn_idx", min=0, max=1)
    more = [
        i for i in range(n_docs)
        if src["turn_idx"][i].as_py() == 0 and i not in dele
    ]
    assert idx.delete(more_q) == len(more)
    assert idx.delete(more_q) == 0
    dele |= set(more)
    got = idx.resolve(dsl.all_query())
    assert got.tolist() == [i for i in range(n_docs) if i not in dele]

    # a FRESH open (new actors, manifest re-read) sees the tombstones
    idx2 = Index(out)
    try:
        assert idx2.deleted_count() == len(dele)
        assert idx2.resolve(dsl.all_query()).tolist() == [
            i for i in range(n_docs) if i not in dele
        ]
    finally:
        idx2.close()


def test_compact_purges_tombstones(delidx, tmp_path_factory):
    """compact_index physically drops tombstoned docs from postings and
    docs parts, recomputes stats from the surviving dl_* columns, and
    emits a tombstone-free index whose BM25 matches a brute oracle over
    ONLY the survivors (i.e. stats are re-derived, not frozen)."""
    idx, src, out, cfg = delidx
    n_docs = src.num_rows
    # ensure at least one delete exists (ordering with the other test)
    if idx.deleted_count() == 0:
        tok_sets = _tok_sets(src)
        idx.delete(dsl.token(_mid_term(tok_sets), "text"))
    from yaii_ray.build import load_deleted

    dele = set(int(d) for d in load_deleted(idx.manifest))
    assert dele

    cdir = str(tmp_path_factory.mktemp("compacted") / "idx")
    compact_index(out, cdir)
    cman = load_manifest(cdir)
    assert not cman.get("delete_files")
    cidx = Index(cdir)
    try:
        live = [i for i in range(n_docs) if i not in dele]
        assert cidx.resolve(dsl.all_query()).tolist() == live

        # docs parts physically dropped the rows
        total_rows = sum(
            pq.read_metadata(p).num_rows
            for s in cman["segments"]
            for p in s["docs_files"]
        )
        assert total_rows == len(live)

        # stats recomputed exactly from surviving docs
        keep_mask = np.array([i not in dele for i in range(n_docs)])
        surv = src.filter(pa.array(keep_mask))
        brute = BruteForceBM25(
            surv, "text", np.array(live, dtype=np.uint64), cfg
        )
        st = cman["stats"]["fields"]["text"]
        assert st["doc_count"] == brute.doc_count
        assert st["sum_dl"] == int(brute.dl.sum())
        assert cman["stats"]["N"] == len(live)

        # BM25 over the compacted index == brute over survivors only
        # (df/avgdl shifted by the purge — scores must match exactly)
        tok_sets = _tok_sets(src)
        mid = _mid_term(tok_sets)
        bd, bs = brute.search(f"{mid} data", k=10)
        got = cidx.search(f"{mid} data", field="text", k=10)
        assert got["doc_id"].to_pylist() == bd.tolist()
        assert got["score"].to_pylist() == bs.tolist()

        # boolean + projection still correct on the purged index
        got = cidx.resolve(dsl.token(mid, "text"))
        assert got.tolist() == [i for i in live if mid in tok_sets[i]]
        rows = cidx.query(dsl.token(mid, "text"), limit=5, columns=["text"])
        assert rows["text"].to_pylist() == [
            src["text"][i].as_py() for i in [j for j in live if mid in tok_sets[j]][:5]
        ]
    finally:
        cidx.close()
