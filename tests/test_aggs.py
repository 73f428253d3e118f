"""G1-G4 aggregation tests over the transcript index, checked against
pandas recomputation on the raw corpus — incl. the reference's
"vector clock" pattern GROUP_BY(author, [COUNT, FIRST(sequence DESC)])
(``test/performance/performance-ssb.ts:484-518``)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yaii_ray import corpus
from yaii_ray.aggs import Count, First, GroupBy, Last
from yaii_ray.build import build_index
from yaii_ray.config import transcripts_config
from yaii_ray.engine import Index
from yaii_ray.query import dsl

N = 2000


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    src = corpus.transcripts_path(N, base="/tmp/yaii_corpus_test", row_group_size=500)
    out = str(tmp_path_factory.mktemp("aggidx") / "idx")
    build_index(src, out, transcripts_config(num_shards=2), target_unit_rows=800)
    idx = Index(out)
    import os

    full = pa.concat_tables(
        pq.read_table(os.path.join(src, f))
        for f in sorted(os.listdir(src))
        if f.endswith(".parquet")
    ).to_pandas()
    yield idx, full
    idx.close()


def test_count(built):
    idx, df = built
    res = idx.aggregate(dsl.token("user", "role"), [Count()])
    assert res["count"] == int((df["role"] == "user").sum())


def test_first_last(built):
    idx, df = built
    res = idx.aggregate(
        dsl.token("assistant", "role"),
        [
            First((dsl.SortClause("ts", dsl.ASC),), project=("conv_id", "turn_idx")),
            Last((dsl.SortClause("ts", dsl.ASC),), project=("conv_id", "turn_idx")),
        ],
    )
    sub = df[df["role"] == "assistant"].sort_values("ts", kind="stable")
    assert res["first"]["conv_id"] == sub.iloc[0]["conv_id"]
    assert res["first"]["turn_idx"] == sub.iloc[0]["turn_idx"]
    assert res["last"]["conv_id"] == sub.iloc[-1]["conv_id"]
    assert res["last"]["turn_idx"] == sub.iloc[-1]["turn_idx"]


def test_group_by_vector_clock(built):
    """GROUP_BY(role, [COUNT, FIRST(ts DESC, project turn_idx)]) — the
    SSB vector-clock aggregation shape."""
    idx, df = built
    res = idx.aggregate(
        dsl.all_query(),
        [
            GroupBy(
                "role",
                (First((dsl.SortClause("ts", dsl.DESC),), project=("turn_idx",)),),
            )
        ],
    )["group_by"]
    for _, row in res.iterrows():
        sub = df[df["role"] == row["role"]]
        assert row["count"] == len(sub)
        want = sub.sort_values("ts", ascending=False, kind="stable").iloc[0]
        assert row["first.ts"] == want["ts"]
        assert row["first.turn_idx"] == want["turn_idx"]
    assert sorted(res["role"]) == sorted(df["role"].unique())


def test_group_by_filtered(built):
    idx, df = built
    res = idx.aggregate(dsl.present("tool"), [GroupBy("tool")])["group_by"]
    want = df[df["tool"].notna()].groupby("tool").size()
    got = dict(zip(res["tool"], res["count"]))
    assert got == want.to_dict()


def test_broad_filter_never_materializes_ids_on_driver(built, monkeypatch):
    """VERDICT r1 'What's wrong #3': counts and filtered-scan aggregates
    must not round-trip the full match-id set through the driver.
    Index.resolve (the driver-materializing path) is poisoned; the
    shard-side count and the resolve_refs scan must still work."""
    from yaii_ray.engine import Index

    idx, df = built

    def boom(self, q):
        raise AssertionError("driver-side resolve() called on broad-filter path")

    monkeypatch.setattr(Index, "resolve", boom)
    q = dsl.all_query()  # matches EVERY doc — the worst case
    assert idx.count(q) == len(df)
    res = idx.aggregate(q, [Count(), GroupBy("role")])
    assert res["count"] == len(df)
    got = dict(zip(res["group_by"]["role"], res["group_by"]["count"]))
    assert got == df.groupby("role").size().to_dict()

    # NB: ds.aggregate(Count()) ALONE is broken in Ray 2.49.2 (returns
    # the zero_factory even for ray.data.range(1000)); pair Count with
    # another aggregate or use ds.count().
    ds = idx.docs_dataset(columns=["turn_idx"], doc_ids=idx.resolve_refs(q))
    assert ds.count() == len(df)


def test_unsorted_limit_bounded_driver_merge(built):
    """Unsorted limited queries truncate in doc-id order via per-shard
    resolve_head — results identical to the full-resolve truncation."""
    idx, df = built
    q = dsl.token("user", "role")
    full = idx.resolve(q)
    t = idx.query(q, limit=7)
    assert t["doc_id"].to_numpy().tolist() == full[:7].tolist()


def test_group_by_high_cardinality_parallel_final(ray_session):
    """VERDICT r2 #2 'done' criterion: GROUP_BY on a ~1e5-cardinality
    key runs WITHOUT collapsing the partials to a single block — the
    final stage is sized by measured partial volume — and still merges
    per-group count + nested FIRST correctly."""
    import ray.data

    from yaii_ray import aggs

    n, k = 200_000, 100_000
    rng = np.random.default_rng(3)
    key = (np.arange(n) % k).astype(np.int64)
    val = rng.integers(0, 1_000_000, size=n).astype(np.int64)
    rid = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(key), "v": pa.array(val), "rid": pa.array(rid)})
    )
    spec = GroupBy(
        "g",
        (First(sort=(dsl.SortClause("v", dsl.DESC), dsl.SortClause("rid", dsl.ASC))),),
    )
    got = aggs._group_by(ds, spec)
    assert len(got) == k
    # the sizing rule must pick a parallel final stage at this volume
    assert aggs._final_partition_count(n) > 1
    pdf = pd.DataFrame({"g": key, "v": val, "rid": rid})
    want_cnt = pdf.groupby("g").size()
    win = pdf.sort_values(["v", "rid"], ascending=[False, True], kind="stable")
    want_first = win.drop_duplicates(subset="g", keep="first").set_index("g")
    got = got.set_index("g")
    assert (got["count"].to_numpy() == want_cnt.reindex(got.index).to_numpy()).all()
    assert (
        got["first.v"].to_numpy()
        == want_first["v"].reindex(got.index).to_numpy()
    ).all()
    assert (
        got["first.rid"].to_numpy()
        == want_first["rid"].reindex(got.index).to_numpy()
    ).all()


def test_term_and_numeric_buckets(built):
    """G5 sugar (bucket-query.ts:8-30): TermBuckets == GROUP_BY(term),
    NumericBuckets groups by floor(v/size)*size with range-start
    labels; both checked against pandas recomputation."""
    from yaii_ray.aggs import NumericBuckets, TermBuckets

    idx, df = built
    res = idx.aggregate(
        dsl.token("user", "role"),
        [
            TermBuckets("conv_id"),
            NumericBuckets("turn_idx", 4),
        ],
    )
    sub = df[df["role"] == "user"]

    tb = res["term_buckets"].set_index("bucket")["count"]
    want_tb = sub.groupby("conv_id").size()
    assert tb.to_dict() == want_tb.to_dict()

    nb = res["numeric_buckets"].set_index("bucket")["count"]
    want_nb = sub.groupby((sub["turn_idx"] // 4) * 4).size()
    assert nb.to_dict() == want_nb.to_dict()
    # integer field + integer width -> integer bucket labels
    assert all(isinstance(b, (int, np.integer)) for b in nb.index)
