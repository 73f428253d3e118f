"""Nested-doc flatten goldens (reference test-flat-object.ts:5-138)
and the F3 nested-message corpus end-to-end: dotted-path presence
queries + GROUP_BY over a flattened struct column."""

import numpy as np
import pyarrow as pa
import pytest

from yaii_ray.aggs import Count, First, GroupBy
from yaii_ray.build import build_index_from_table
from yaii_ray.config import FieldConfig, Flags, IndexConfig, KIND_KEYWORD, KIND_NUMBER
from yaii_ray.engine import Index
from yaii_ray.query import dsl
from yaii_ray.stages.flatten import flatten_batch


def test_flatten_struct_and_list_of_struct():
    t = pa.table(
        {
            "key": ["k1", "k2"],
            "value": pa.array(
                [
                    {"author": "a1", "content": {"type": "contact", "following": True}},
                    {"author": "a2", "content": {"type": "post", "following": None}},
                ]
            ),
            "mentions": pa.array(
                [
                    [{"link": "x", "name": "nx"}, {"link": "y", "name": "ny"}],
                    [],
                ]
            ),
        }
    )
    flat = flatten_batch(t)
    assert set(flat.column_names) == {
        "key",
        "value.author",
        "value.content.type",
        "value.content.following",
        "mentions.link",
        "mentions.name",
    }
    assert flat["value.content.type"].to_pylist() == ["contact", "post"]
    assert flat["value.content.following"].to_pylist() == [True, None]
    # array-of-objects per-path merge (utils.ts:60-100)
    assert flat["mentions.link"].to_pylist() == [["x", "y"], []]
    assert flat["mentions.name"].to_pylist() == [["nx", "ny"], []]


def test_flatten_missing_parent_gives_nulls():
    t = pa.table(
        {"value": pa.array([{"content": {"type": "contact"}}, None])}
    )
    flat = flatten_batch(t)
    assert flat["value.content.type"].to_pylist() == ["contact", None]


@pytest.fixture(scope="module")
def nested_idx(ray_session, tmp_path_factory):
    """F3-style SSB message corpus: flatten -> build -> query."""
    n = 200
    rng = np.random.default_rng(3)
    types = ["contact", "about", "post", "vote"]
    rows = []
    for i in range(n):
        ty = types[i % 4]
        content = {"type": ty}
        if ty == "contact":
            content["following"] = bool(i % 2)
        rows.append(
            {
                "author": f"auth{i % 7}",
                "sequence": i // 7 + 1,
                "timestamp": 1_000_000 + i,
                "content": content,
            }
        )
    t = pa.table(
        {
            "key": [f"%msg{i}" for i in range(n)],
            "value": pa.array(rows),
        }
    )
    flat = flatten_batch(t)
    cfg = IndexConfig(
        fields={
            "key": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "value.author": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "value.sequence": FieldConfig(kind=KIND_NUMBER, add_to_all=False),
            "value.timestamp": FieldConfig(kind=KIND_NUMBER, add_to_all=False),
            "value.content.type": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "value.content.following": FieldConfig(kind="bool", add_to_all=False),
        },
        all_field=False,
        num_shards=2,
        chunk_shift=5,
    )
    out = str(tmp_path_factory.mktemp("nested") / "idx")
    build_index_from_table(flat, out, cfg)
    idx = Index(out)
    yield idx, flat
    idx.close()


def test_nested_presence_query(nested_idx):
    """present('value.content.following') — the reference's nested-doc
    presence golden shape (test-index.ts:334-367)."""
    idx, flat = nested_idx
    got = idx.resolve(dsl.present("value.content.following"))
    want = [
        i for i, v in enumerate(flat["value.content.following"].to_pylist())
        if v is not None
    ]
    assert got.tolist() == want
    # boolean term query on the flattened path
    got_t = idx.resolve(dsl.token(True, "value.content.following"))
    want_t = [
        i for i, v in enumerate(flat["value.content.following"].to_pylist()) if v is True
    ]
    assert got_t.tolist() == want_t


def test_vector_clock_on_flattened(nested_idx):
    """GROUP_BY(value.author, [COUNT, FIRST(value.sequence DESC)]) —
    the SSB vector-clock aggregation on flattened paths."""
    idx, flat = nested_idx
    res = idx.aggregate(
        dsl.token("contact", "value.content.type"),
        [
            GroupBy(
                "value.author",
                (First((dsl.SortClause("value.sequence", dsl.DESC),)),),
            )
        ],
    )["group_by"]
    df = flat.to_pandas()
    sub = df[df["value.content.type"] == "contact"]
    want = sub.groupby("value.author")["value.sequence"].agg(["count", "max"])
    for _, row in res.iterrows():
        assert row["count"] == want.loc[row["value.author"], "count"]
        assert row["first.value.sequence"] == want.loc[row["value.author"], "max"]


def test_nested_parquet_build_multivalue(ray_session, tmp_path):
    """Nested parquet straight through the FILE build (auto-flatten in
    partials._one_unit): list<struct> text is multi-value TEXT (union
    of per-element tokens, dl = token sum), list<struct> numbers are
    multi-value NUMBER, struct keywords resolve by dotted path."""
    import pyarrow.parquet as pq

    from yaii_ray.build import build_index
    from yaii_ray.config import KIND_TEXT

    texts = [
        "merge the batch window",
        "sort and filter rows",
        "merge sort join",
        "tiny doc",
    ]
    srcs = ["src5", "src5", "src7", "src5"]
    langs = ["en", "fr", "en", "en"]
    nested = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "meta": pa.StructArray.from_arrays(
                [
                    pa.array(srcs),
                    pa.array(langs),
                    pa.array([100, 200, 300, 10], type=pa.int64()),
                ],
                names=["source", "lang", "n_chars"],
            ),
            "turns": pa.array(
                [
                    [{"idx": 0, "text": t}, {"idx": 1, "text": "reply " + s}]
                    for t, s in zip(texts, srcs)
                ],
                type=pa.list_(
                    pa.struct([("idx", pa.int64()), ("text", pa.string())])
                ),
            ),
        }
    )
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(nested, str(src / "nested.parquet"))
    cfg = IndexConfig(
        fields={
            "doc_id": FieldConfig(
                flags=Flags.IGNORED, kind=KIND_NUMBER, add_to_all=False
            ),
            "turns.text": FieldConfig(
                kind=KIND_TEXT, analyzer="standard_stop", scored=True,
                add_to_all=False,
            ),
            "turns.idx": FieldConfig(kind=KIND_NUMBER, add_to_all=False),
            "meta.source": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "meta.lang": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "meta.n_chars": FieldConfig(kind=KIND_NUMBER, add_to_all=False),
        },
        all_field=False,
        num_shards=2,
    )
    out = str(tmp_path / "idx")
    build_index(str(src), out, cfg)
    idx = Index(out)
    try:
        # cross-element AND: 'merge' from turn 0, 'src5' from turn 1
        got = idx.resolve(
            dsl.and_query(
                dsl.token("merge", "turns.text"), dsl.token("src5", "turns.text")
            )
        )
        assert got.tolist() == [0]
        # nested keyword + nested number range
        got = idx.resolve(
            dsl.and_query(
                dsl.token("merge", "turns.text"), dsl.token("en", "meta.lang")
            )
        )
        assert got.tolist() == [0, 2]
        assert idx.resolve(dsl.number_range("meta.n_chars", 50, 250)).tolist() == [0, 1]
        # multi-value number: every doc has turns.idx values {0, 1}
        assert idx.resolve(dsl.number(1, "turns.idx")).tolist() == [0, 1, 2, 3]
        # BM25 over the multi-value field: dl = summed token counts
        res = idx.search("merge window", field="turns.text", k=4)
        assert res["doc_id"].to_pylist()[0] == 0
        # dotted projection returns the stored nested-path columns
        proj = idx.project(
            np.array([0, 2], dtype=np.uint64), ["meta.source", "turns.text"]
        ).to_pandas()
        assert proj["meta.source"].tolist() == ["src5", "src7"]
        assert [list(x) for x in proj["turns.text"]] == [
            ["merge the batch window", "reply src5"],
            ["merge sort join", "reply src7"],
        ]
    finally:
        idx.close()
