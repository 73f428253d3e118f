"""Incremental (append) builds, cached filters, custom analyzers,
computed fields, and the distributed two-phase sorted top-k."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yaii_ray import corpus
from yaii_ray.analysis.tokenizer import make_regex_rules_analyzer, register_analyzer
from yaii_ray.build import build_index, build_index_from_table, load_manifest
from yaii_ray.config import FieldConfig, IndexConfig, KIND_KEYWORD, KIND_TEXT, transcripts_config
from yaii_ray.engine import Index
from yaii_ray.query import dsl


def test_incremental_append_build(ray_session, tmp_path):
    """Appending new input files and re-running build_index only builds
    the new/changed segments — the batch analog of the reference's
    CURRENT_AND_FUTURE continuous mode (F1, SURVEY.md §2.9)."""
    src = corpus.transcripts_path(3000, base="/tmp/yaii_corpus_test", row_group_size=500)
    files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    # stage: two directories, partial (first half of row groups via one
    # file copy trick isn't possible -> use unit-level: build from the
    # single file twice with different segment shapes instead)
    inc_src = tmp_path / "src"
    inc_src.mkdir()
    full = pq.read_table(files[0])
    half = full.slice(0, 1500)
    pq.write_table(half, str(inc_src / "part-00000.parquet"), row_group_size=500)

    out = str(tmp_path / "idx")
    cfg = transcripts_config(num_shards=2)
    m1: dict = {}
    build_index(str(inc_src), out, cfg, target_unit_rows=500, units_per_segment=2, metrics=m1)
    n_seg_1 = len(load_manifest(out)["segments"])

    # append a second file with the remaining rows
    pq.write_table(full.slice(1500), str(inc_src / "part-00001.parquet"), row_group_size=500)
    m2: dict = {}
    build_index(str(inc_src), out, cfg, target_unit_rows=500, units_per_segment=2, metrics=m2)
    man = load_manifest(out)
    assert len(man["segments"]) > n_seg_1
    skipped = [s for s in m2["segments"] if s.get("skipped")]
    built = [s for s in m2["segments"] if not s.get("skipped")]
    assert skipped and built  # old segments skipped, new ones built

    # the incremental index answers identically to a fresh build
    fresh_out = str(tmp_path / "idx_fresh")
    build_index(str(inc_src), fresh_out, cfg, target_unit_rows=500, units_per_segment=2)
    a, b = Index(out), Index(fresh_out)
    try:
        for q in [dsl.token("user", "role"), dsl.present("tool"), dsl.number(2, "turn_idx")]:
            assert a.resolve(q).tolist() == b.resolve(q).tolist()
        sa = a.search("the quick data model", k=10)
        sb = b.search("the quick data model", k=10)
        assert sa["doc_id"].to_pylist() == sb["doc_id"].to_pylist()
        assert sa["score"].to_pylist() == sb["score"].to_pylist()
    finally:
        a.close()
        b.close()


def test_cached_filter(ray_session, tmp_path):
    t = pa.table(
        {
            "id": ["1", "2", "3", "4"],
            "tag": ["x", "y", "x", "y"],
            "text": ["alpha beta", "alpha", "gamma", "beta gamma"],
        }
    )
    cfg = IndexConfig(
        fields={
            "id": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "tag": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "text": FieldConfig(kind=KIND_TEXT, analyzer="standard", add_to_all=False),
        },
        all_field=False,
        num_shards=2,
        chunk_shift=1,
    )
    out = str(tmp_path / "idx")
    build_index_from_table(t, out, cfg)
    idx = Index(out)
    try:
        f = dsl.cached("only-x", dsl.token("x", "tag"))
        q = dsl.and_query(f, dsl.token("alpha", "text"))
        assert idx.resolve(q).tolist() == [0]
        # second use hits the shard-side memo (same result)
        q2 = dsl.and_query(f, dsl.token("gamma", "text"))
        assert idx.resolve(q2).tolist() == [2]
    finally:
        idx.close()


def test_regex_rules_analyzer_and_generator(ray_session, tmp_path):
    """moo-style lexer (A4) + computed field (M2: a ValueGenerator is a
    vectorized map_batches adding a derived column before the build)."""
    rules = [
        ["ref", r"[@%&][A-Za-z0-9/+]{4}=\.\w+"],   # SSB-ref-like token
        ["word", r"[A-Za-z]+"],
        ["_", r"[^A-Za-z@%&]+"],
    ]
    spec = {"type": "regex_rules", "rules": rules, "lowercase": ["word"]}
    t = pa.table(
        {
            "id": ["a", "b"],
            "ts1": pa.array([100, 50], type=pa.int64()),
            "ts2": pa.array([90, 60], type=pa.int64()),
            "text": ["Hello @AB/c=.ed World", "plain words only"],
        }
    )
    # computed field TDA = min(ts1, ts2) — applied as a pre-build
    # map_batches stage (the Ray-native ValueGenerator)
    tda = pa.compute.min_element_wise(t["ts1"], t["ts2"])
    t = t.append_column("tda", tda)

    cfg = IndexConfig(
        fields={
            "id": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "text": FieldConfig(kind=KIND_TEXT, analyzer="ssb", add_to_all=False),
            "tda": FieldConfig(kind="number", add_to_all=False),
        },
        analyzers={"ssb": spec},  # JSON spec travels to build workers
        all_field=False,
        num_shards=1,
        chunk_shift=1,
    )
    out = str(tmp_path / "idx")
    build_index_from_table(t, out, cfg)
    idx = Index(out)
    try:
        # lexer kept the ref token verbatim, lowercased words
        assert idx.resolve(dsl.token("@AB/c=.ed", "text")).tolist() == [0]
        assert idx.resolve(dsl.token("hello", "text")).tolist() == [0]
        assert idx.resolve(dsl.token("Hello", "text")).tolist() == []
        # computed field is queryable
        assert idx.resolve(dsl.number(90, "tda")).tolist() == [0]
        assert idx.resolve(dsl.number(50, "tda")).tolist() == [1]
    finally:
        idx.close()


def test_two_phase_sorted_topk(ray_session, tmp_path):
    src = corpus.transcripts_path(3000, base="/tmp/yaii_corpus_test", row_group_size=500)
    out = str(tmp_path / "idx")
    build_index(src, out, transcripts_config(num_shards=2), target_unit_rows=1000)
    idx = Index(out)
    try:
        idx.topk_scan_threshold = 0  # force the distributed path
        t = idx.query(
            dsl.token("user", "role"),
            sort=[dsl.SortClause("ts", dsl.DESC)],
            limit=7,
            columns=["conv_id", "turn_idx", "ts"],
        )
        idx.topk_scan_threshold = 10**9  # driver-side reference path
        t2 = idx.query(
            dsl.token("user", "role"),
            sort=[dsl.SortClause("ts", dsl.DESC)],
            limit=7,
            columns=["conv_id", "turn_idx", "ts"],
        )
        assert t["doc_id"].to_pylist() == t2["doc_id"].to_pylist()
        assert t["ts"].to_pylist() == t2["ts"].to_pylist()
    finally:
        idx.close()


def test_per_row_error_isolation(ray_session, tmp_path):
    """M4 (reference base-inverted-index.ts:236-268): a row whose
    termization throws is indexed as an EMPTY doc — the build
    completes, the drop count lands in metrics, and good rows index
    normally. NaN in a float (NUMBER-routed) field makes the
    vectorized Arrow cast raise, exercising the bisecting fallback."""
    t = pa.table(
        {
            "text": [f"alpha bravo row{i}" for i in range(40)],
            "score": [float("nan") if i in (7, 23) else float(i) for i in range(40)],
        }
    )
    out = str(tmp_path / "idx")
    m: dict = {}
    build_index_from_table(
        t, out, IndexConfig(num_shards=1), target_unit_rows=20, metrics=m
    )
    assert m["dropped_rows"] == 2
    idx = Index(out)
    try:
        # bad rows are present as docs but carry no postings at all
        hits = idx.resolve(dsl.token("alpha", "text"))
        assert sorted(hits.tolist()) == [i for i in range(40) if i not in (7, 23)]
        assert idx.resolve(dsl.number(23, "score")).tolist() == []
        assert idx.resolve(dsl.number(8, "score")).tolist() == [8]
        st = idx.manifest["stats"]
        assert st["N"] == 40 and st["dropped_rows"] == 2
    finally:
        idx.close()


def test_porter_analyzer_end_to_end(ray_session, tmp_path):
    """A5 (reference TODO, implemented here): field indexed with the
    porter analyzer matches morphological variants — BM25 search
    analyzes the query through the FIELD'S analyzer, and boolean
    tokens match the stemmed term."""
    import numpy as np
    import pyarrow as pa

    from yaii_ray.build import build_index_from_table
    from yaii_ray.config import FieldConfig, IndexConfig, KIND_TEXT
    from yaii_ray.engine import Index
    from yaii_ray.query import dsl

    texts = [
        "connected circuits hum",            # 0
        "new connections were made",         # 1
        "a connection was refused",          # 2
        "nothing relevant here at all",      # 3
        "motoring along while hopping",      # 4
    ]
    t = pa.table({"text": pa.array(texts)})
    cfg = IndexConfig(
        fields={
            "text": FieldConfig(kind=KIND_TEXT, analyzer="porter", scored=True)
        },
        all_field=False,
        num_shards=2,
    )
    out = str(tmp_path / "porter_idx")
    build_index_from_table(t, out, cfg)
    idx = Index(out)
    try:
        # boolean: the stemmed term matches every variant
        got = np.sort(idx.resolve(dsl.token("connect", "text")))
        assert got.tolist() == [0, 1, 2]
        # BM25: the query word stems to the same term
        hits = idx.search("connecting", field="text", k=5)
        assert sorted(hits["doc_id"].to_pylist()) == [0, 1, 2]
        hits2 = idx.search("motored hops", field="text", k=5)
        assert 4 in hits2["doc_id"].to_pylist()
    finally:
        idx.close()
