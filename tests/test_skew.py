"""Skew handling: a pathological hot term (present in EVERY doc) must
be split across chunk-salted groups, stay correct, and the df-lookup
pushdown fallback must agree with the driver cache."""

import numpy as np
import pyarrow as pa
import pytest

from yaii_ray.build import build_index_from_table, load_manifest
from yaii_ray.config import FieldConfig, IndexConfig, KIND_TEXT
from yaii_ray.engine import Index
from yaii_ray.oracle import BruteForceBM25
from yaii_ray.query import dsl
from yaii_ray.stages.termize import KEY_SEP


@pytest.fixture(scope="module")
def hot_idx(ray_session, tmp_path_factory):
    n = 2000
    rng = np.random.default_rng(17)
    texts = [
        "hot " + " ".join(f"w{int(x)}" for x in rng.integers(0, 400, size=10))
        for _ in range(n)
    ]
    t = pa.table({"text": texts})
    cfg = IndexConfig(
        fields={"text": FieldConfig(kind=KIND_TEXT, analyzer="standard_stop", scored=True, add_to_all=False)},
        all_field=False,
        num_shards=2,
        chunk_shift=7,  # 128-doc chunks -> ~16 salted groups for 'hot'
    )
    out = str(tmp_path_factory.mktemp("hot") / "idx")
    build_index_from_table(t, out, cfg)
    idx = Index(out)
    yield idx, t
    idx.close()


def test_hot_term_is_chunk_salted(hot_idx):
    """The hot term's postings are stored as MULTIPLE (key, chunk)
    rows — no single group ever holds the whole posting list."""
    import pyarrow.parquet as pq

    idx, t = hot_idx
    rows = 0
    max_df = 0
    for seg in idx.manifest["segments"]:
        for p in seg["postings"]:
            tbl = pq.read_table(p["path"], columns=["key", "df"])
            mask = [k == "text" + KEY_SEP + "0hot" for k in tbl["key"].to_pylist()]
            sel = tbl.filter(pa.array(mask))
            rows += sel.num_rows
            if sel.num_rows:
                max_df = max(max_df, max(sel["df"].to_pylist()))
    assert rows >= 8  # split across many chunks
    assert max_df <= 128  # bounded by the chunk size (2^7)


def test_hot_term_query_correct(hot_idx):
    idx, t = hot_idx
    assert idx.count(dsl.token("hot", "text")) == t.num_rows
    # global df reassembled across chunks/shards
    assert idx.df_lookup("text", ["0hot"])["0hot"] == t.num_rows
    # BM25 over the skewed corpus still bitwise-matches the oracle
    oracle = BruteForceBM25(t, "text", np.arange(t.num_rows, dtype=np.uint64), idx.config)
    got = idx.search("hot w1 w399", k=10)
    want_d, want_s = oracle.search("hot w1 w399", k=10)
    assert got["doc_id"].to_pylist() == want_d.tolist()
    assert got["score"].to_pylist() == want_s.tolist()


def test_df_lookup_pushdown_fallback(hot_idx):
    """With the driver cache disabled, df lookup goes through Parquet
    predicate pushdown and must return identical statistics."""
    idx, t = hot_idx
    cached = idx.df_lookup("text", ["0hot", "0w1", "0nope"])
    idx2 = Index(idx.index_dir)
    idx2._TERMSTATS_CACHE_BYTES = 0  # force the pushdown path
    pushed = idx2.df_lookup("text", ["0hot", "0w1", "0nope"])
    assert cached == pushed
    assert "0nope" not in cached
