"""Partitioned hash join (Arrow-native tag + one bucket shuffle +
per-bucket ``pyarrow.Table.join``) vs pandas merge ground truth.
The engine's extension beyond the reference (which has no join
operator, SURVEY.md §2.8)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from yaii_ray.ops import joins


def _mk(ray_session, seed=11, nl=500, nr=60):
    import ray.data

    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 80, size=nl),
            "lv": rng.normal(size=nl).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.permutation(80)[:nr],
            "rv": [f"r{i}" for i in range(nr)],
        }
    )
    return (
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        left,
        right,
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(list(df.columns))
        .reset_index(drop=True)
        .astype({"k": "float64"})
    )


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
def test_partitioned_join_matches_pandas(ray_session, how):
    lds, rds, l, r = _mk(ray_session)
    got = joins.partitioned_hash_join(
        lds, rds, on="k", nbuckets=8, how=how
    ).to_pandas()
    want = l.merge(r, on="k", how=how)
    assert got.columns.tolist() == ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(_norm(got), _norm(want[got.columns.tolist()]))


def test_partitioned_join_column_pruning(ray_session):
    lds, rds, l, r = _mk(ray_session)
    got = joins.partitioned_hash_join(
        lds, rds, on="k", nbuckets=4, left_cols=["k"], right_cols=["k", "rv"]
    ).to_pandas()
    want = l[["k"]].merge(r, on="k", how="inner")
    assert got.columns.tolist() == ["k", "rv"]
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_partitioned_join_rejects_dup_names(ray_session):
    import ray.data

    a = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    b = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [3]}))
    with pytest.raises(ValueError, match="non-key"):
        joins.partitioned_hash_join(a, b, on="k")


def test_partitioned_join_empty_side_keeps_schema(ray_session):
    """Buckets where one side is empty must emit a schema-full (not
    schema-less) empty table — VERDICT r1 'What's wrong #5'."""
    import ray.data

    lds = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(64), "lv": np.arange(64) * 1.5})
    )
    rds = ray.data.from_pandas(pd.DataFrame({"k": [3], "rv": ["only"]}))
    out = joins.partitioned_hash_join(lds, rds, on="k", nbuckets=16)
    t = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")]
    )
    assert t.column_names == ["k", "lv", "rv"]
    assert t.num_rows == 1 and t["rv"].to_pylist() == ["only"]


@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_join_matches_pandas(ray_session, how):
    lds, _rds, l, r = _mk(ray_session)
    got = joins.broadcast_join(lds, r, on="k", how=how).to_pandas()
    want = l.merge(r, on="k", how=how)
    assert got.columns.tolist() == ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(_norm(got), _norm(want[got.columns.tolist()]))


def test_partitioned_join_string_keys(ray_session):
    import ray.data

    l = pd.DataFrame({"k": ["a", "b", "c", "a"], "lv": [1, 2, 3, 4]})
    r = pd.DataFrame({"k": ["a", "c", "z"], "rv": [10, 30, 99]})
    got = joins.partitioned_hash_join(
        ray.data.from_pandas(l), ray.data.from_pandas(r), on="k", nbuckets=4
    ).to_pandas()
    want = l.merge(r, on="k")
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got.sort_values(cols).reset_index(drop=True)[cols],
        want.sort_values(cols).reset_index(drop=True)[cols],
    )
