"""Schema normalization for mixed-type feeds (stages/normalize.py) —
the Ray-typed counterpart of the reference's dynamic codec upgrades
(doc-packed-array.ts:577-729 repack-upward, :188-221 mixed arrays)."""

import pyarrow as pa
import pytest

from yaii_ray.stages.normalize import (
    cast_column,
    normalize_batch,
    normalize_dataset,
    promote_schemas,
    promote_types,
    rows_to_table,
)


def test_promote_lattice():
    assert promote_types(pa.int64(), pa.float64()) == pa.float64()
    assert promote_types(pa.int32(), pa.int64()) == pa.int64()
    assert promote_types(pa.bool_(), pa.int64()) == pa.int64()
    assert promote_types(pa.bool_(), pa.bool_()) == pa.bool_()
    assert promote_types(pa.int64(), pa.string()) == pa.large_string()
    assert promote_types(pa.null(), pa.int64()) == pa.int64()
    # scalar vs list -> list of promoted element
    t = promote_types(pa.int64(), pa.list_(pa.float64()))
    assert t == pa.large_list(pa.float64())
    # struct merge: union of fields, per-field promotion
    a = pa.struct([("x", pa.int64())])
    b = pa.struct([("x", pa.float64()), ("y", pa.string())])
    m = promote_types(a, b)
    assert m.field("x").type == pa.float64()
    assert m.field("y").type == pa.string()
    # idempotent / commutative joins
    assert promote_types(t, t) == t
    assert promote_types(pa.string(), pa.int64()) == pa.large_string()


def test_promote_schemas_union_of_fields():
    s1 = pa.schema([("a", pa.int64()), ("b", pa.string())])
    s2 = pa.schema([("a", pa.float64()), ("c", pa.bool_())])
    s = promote_schemas([s1, s2])
    assert s.names == ["a", "b", "c"]
    assert s.field("a").type == pa.float64()


def test_cast_column_scalar_to_list_wraps():
    arr = pa.array([1, None, 3], type=pa.int64())
    out = cast_column(arr, pa.large_list(pa.float64()))
    assert out.to_pylist() == [[1.0], None, [3.0]]


def test_cast_column_list_with_spanning_null_ranges():
    """A null list slot whose offset range is NON-empty (legal Arrow,
    produced by other writers and by slicing) must survive the
    list->list cast; flatten() would compact it and misalign."""
    values = pa.array([1, 2, 3, 4, 5], pa.int32())
    offsets = pa.array([0, 2, 4, 5], pa.int32())
    mask = pa.array([False, True, False])
    arr = pa.ListArray.from_arrays(offsets, values, mask=mask)
    out = cast_column(arr, pa.large_list(pa.float64()))
    assert out.to_pylist() == [[1.0, 2.0], None, [5.0]]
    # sliced view keeps alignment too
    out2 = cast_column(arr.slice(1, 2), pa.large_list(pa.int64()))
    assert out2.to_pylist() == [None, [5]]


def test_normalize_batch_missing_and_mixed():
    t = pa.table({"a": pa.array([1, 2]), "b": pa.array(["x", "y"])})
    schema = pa.schema(
        [("a", pa.large_string()), ("b", pa.large_string()), ("c", pa.float64())]
    )
    out = normalize_batch(t, schema)
    assert out["a"].to_pylist() == ["1", "2"]
    assert out["c"].to_pylist() == [None, None]


def test_rows_to_table_json_feed():
    rows = [
        {"a": 1, "tags": "x"},
        {"a": 2.5, "tags": ["y", "z"], "extra": True},
        {"a": "seven"},
    ]
    t = rows_to_table(rows)
    assert t["a"].type == pa.large_string()
    assert t["a"].to_pylist() == ["1", "2.5", "seven"]
    tags = t["tags"].to_pylist()
    assert tags[0] == ["x"] and tags[1] == ["y", "z"] and tags[2] is None
    assert t["extra"].to_pylist() == [None, True, None]


def test_normalize_dataset_and_build(ray_session, tmp_path):
    """End to end: a feed whose blocks disagree on schema -> one
    promoted schema -> normal index build -> queries. This is the
    documented normalization pass in front of build_index for
    schema-less inputs (SURVEY §1.2 / §8 mixed-type note)."""
    import ray.data

    from yaii_ray.build import build_index_from_table
    from yaii_ray.config import FieldConfig, Flags, IndexConfig, KIND_NUMBER, KIND_TEXT
    from yaii_ray.engine import Index
    from yaii_ray.query import dsl

    b1 = pa.table({"doc": pa.array(["alpha beta", "beta gamma"]), "n": pa.array([1, 2])})
    b2 = pa.table({"doc": pa.array(["gamma delta"]), "n": pa.array([3.5]), "lang": pa.array(["en"])})
    ds = ray.data.from_arrow([b1, b2])
    nds, schema = normalize_dataset(ds)
    assert schema.field("n").type == pa.float64()
    got = nds.to_pandas()
    assert sorted(got["doc"]) == ["alpha beta", "beta gamma", "gamma delta"]
    assert sorted(got["n"]) == [1.0, 2.0, 3.5]

    table = pa.Table.from_pandas(got.sort_values("n").reset_index(drop=True), preserve_index=False)
    cfg = IndexConfig(
        fields={
            "doc": FieldConfig(kind=KIND_TEXT, analyzer="standard_stop", scored=True, add_to_all=False),
            "n": FieldConfig(kind=KIND_NUMBER, add_to_all=False),
            "lang": FieldConfig(kind=KIND_TEXT, add_to_all=False, flags=Flags.STORED),
        },
        all_field=False,
        num_shards=2,
    )
    out = str(tmp_path / "normidx")
    build_index_from_table(table, out, cfg)
    idx = Index(out)
    try:
        assert idx.resolve(dsl.token("beta", "doc")).tolist() == [0, 1]
        assert idx.resolve(dsl.number_range("n", min=2, max=4)).tolist() == [1, 2]
    finally:
        idx.close()
