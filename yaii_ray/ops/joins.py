"""Join operators — the engine's extension beyond the reference (which
has NO join operator; its perf harness loops per-key follow-up queries,
SURVEY.md §2.8). Three scale shapes from the Ray guide:

- :func:`broadcast_join` — small side ``ray.put`` once, Arrow hash
  join per batch. No shuffle. THE default for dimension tables.
- :func:`partitioned_hash_join` — both sides large: tag + bucket by
  key hash, one ``groupby(bucket)`` shuffle, per-bucket Arrow hash
  join. Salt/bucket count is explicit (skew handling = raise
  ``nbuckets``).
- :func:`asof_join` — backward as-of lookup, hash-bucketed by key
  (one groupby over ``nbuckets`` buckets; every key in a bucket
  resolved in one vectorized sort + run-boundary pass), strict
  inequality, deterministic tie-break by the secondary id column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_join(ds, small, on: str, how: str = "inner"):
    """Join a Dataset against a small table (broadcast via ``ray.put``
    once, read zero-copy in every task). Arrow-native: each batch
    joins through ``pyarrow.Table.join`` and stays an Arrow block, so
    downstream native groupby/aggregate take Ray's fast Arrow path.
    ``small`` may be a pandas DataFrame or a pyarrow Table."""
    import ray

    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    jt = _PA_JOIN_TYPE[how]
    ref = ray.put(small)

    def merge(b: pa.Table) -> pa.Table:
        rhs = ray.get(ref)
        return b.join(rhs, keys=on, join_type=jt)

    return ds.map_batches(merge, batch_format="pyarrow")


def _arrow_schema(ds) -> pa.Schema:
    """Dataset schema as pyarrow. An upstream pandas ``map_batches``
    yields a PandasBlockSchema (numpy dtypes) — convert what converts
    cleanly; ``object`` dtype is ambiguous (str? list?) so fall back to
    the first block's real Arrow schema via ``limit(1)``."""
    s = ds.schema().base_schema
    if isinstance(s, pa.Schema):
        return s
    try:
        return pa.schema(
            [(n, pa.from_numpy_dtype(t)) for n, t in zip(s.names, s.types)]
        )
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.Table.from_pandas(
            ds.limit(1).to_pandas(), preserve_index=False
        ).schema


_PA_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "outer": "full outer",
}


def partitioned_hash_join(
    left, right, on: str, nbuckets: int = 32, how: str = "inner",
    left_cols: list[str] | None = None, right_cols: list[str] | None = None,
):
    """Explicit partitioned hash join of two Datasets.

    Both sides get ``bucket = hash(key) % nbuckets`` and a side tag,
    are unioned, and each bucket joins its two sides in one
    ``map_groups`` call — ONE shuffle total, bucket size bounded by
    ``nbuckets`` (salt hot keys by raising it).

    Arrow-native end to end: the tag stage prunes each side to its
    requested columns and pads to the union schema with ``pa.nulls``
    (a validity bitmap, not materialized values — the shuffle carries
    each side at roughly its own width), and each bucket joins via
    ``pyarrow.Table.join``. Non-key column names must be disjoint."""

    jt = _PA_JOIN_TYPE[how]
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lnames = list(left_cols or lschema.names)
    rnames = list(right_cols or rschema.names)
    dup = (set(lnames) & set(rnames)) - {on}
    if dup:
        raise ValueError(f"non-key columns on both sides: {sorted(dup)}")
    types = {c: lschema.field(c).type for c in lnames}
    types.update({c: rschema.field(c).type for c in rnames})
    all_cols = lnames + [c for c in rnames if c != on]

    def tag(side: int, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays = [
                t.column(c) if c in own else pa.nulls(n, type=types[c])
                for c in all_cols
            ]
            key = t.column(on).to_numpy(zero_copy_only=False)
            bucket = (pd.util.hash_array(key) % np.uint64(nbuckets)).astype(
                np.int64
            )
            arrays += [pa.array(np.full(n, side, dtype=np.int8)), pa.array(bucket)]
            return pa.table(arrays, names=all_cols + ["__side", "__bucket"])

        return fn

    lt = left.map_batches(tag(0, lnames), batch_format="pyarrow")
    rt = right.map_batches(tag(1, rnames), batch_format="pyarrow")

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("__side")
        l = g.filter(pc.equal(side, 0)).select(lnames)
        r = g.filter(pc.equal(side, 1)).select(rnames)
        return l.join(r, keys=on, join_type=jt).select(all_cols)

    return (
        lt.union(rt)
        # non-shuffle block coalesce so the bucket groupby runs with
        # ~4 buckets per reduce partition — more input blocks than
        # buckets would leave reduce partitions empty (schema-less
        # RefBundles, idle tasks), and exactly-one-bucket partitions
        # still go empty when Ray's sampled quantile boundaries
        # collide on the few distinct values. nbuckets (not the
        # partition count) keeps bounding per-group memory.
        .repartition(max(2, nbuckets // 4))
        .groupby("__bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def asof_join(
    ds,
    key: str,
    ts: str,
    value_cols: list[str],
    id_col: str,
    out_prefix: str = "prev_",
    nbuckets: int = 32,
):
    """Per-key backward as-of self-lookup: for each row, the values of
    the latest same-key row with a STRICTLY smaller timestamp
    (deterministic: rows ordered by (ts, id_col), so equal timestamps
    tie-break by id). Rows with no predecessor get nulls.

    Scale shape (VERDICT r4 #1): keys are hash-bucketed map-side and
    the one shuffle groups by ``__bucket`` (cardinality ``nbuckets``,
    not #keys). Each bucket resolves ALL its keys in one vectorized
    pass: sort by (key, ts, id), then the predecessor of row i is
    ``run_start(i) - 1`` where runs are (key, ts) groups — valid only
    while it stays inside i's key group. Null-index Arrow ``take``
    yields the nulls. No per-key Python call anywhere."""
    import pyarrow.compute as pc

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__bucket")
        n = g.num_rows
        if n == 0:
            for c in value_cols:
                g = g.append_column(
                    f"{out_prefix}{c}",
                    pa.array([], type=g.schema.field(c).type),
                )
            return g
        order = pc.sort_indices(
            g,
            sort_keys=[(key, "ascending"), (ts, "ascending"),
                       (id_col, "ascending")],
        )
        g = g.take(order)
        t = g.column(ts).combine_chunks().to_numpy(zero_copy_only=False)
        kcol = g.column(key).combine_chunks()
        idx = np.arange(n, dtype=np.int64)
        new_key = np.ones(n, dtype=bool)
        if n > 1:
            new_key[1:] = ~pc.equal(
                kcol.slice(1), kcol.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        new_run = new_key.copy()
        if n > 1:
            new_run[1:] |= t[1:] != t[:-1]
        key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        prev = run_start - 1
        valid = prev >= key_start
        take_idx = pa.array(np.where(valid, prev, 0), mask=~valid)
        for c in value_cols:
            g = g.append_column(
                f"{out_prefix}{c}", pc.take(g.column(c), take_idx)
            )
        return g

    from yaii_ray.ops.windows import add_key_bucket

    return (
        ds.map_batches(add_key_bucket(key, nbuckets), batch_format="pyarrow")
        .repartition(max(2, nbuckets // 4))
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
