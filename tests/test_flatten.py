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
