"""Join operators — the engine's extension beyond the reference (which
has NO join operator; its perf harness loops per-key follow-up queries,
SURVEY.md §2.8). Three scale shapes from the Ray guide:

- :func:`broadcast_join` — small side ``ray.put`` once, pandas merge
  per batch. No shuffle. THE default for dimension tables.
- :func:`partitioned_hash_join` — both sides large: tag + bucket by
  key hash, one ``groupby(bucket)`` shuffle, per-bucket pandas merge.
  Salt/bucket count is explicit (skew handling = raise ``nbuckets``).
- :func:`asof_join` — per-key ordered backward as-of lookup
  (sort within key groups + ``searchsorted``), strict inequality,
  deterministic tie-break by the secondary id column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_join(ds, small: pd.DataFrame, on: str, how: str = "inner"):
    """Join a Dataset against a small pandas table (broadcast once)."""
    import ray

    ref = ray.put(small)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return b.merge(rhs, on=on, how=how)

    return ds.map_batches(merge, batch_format="pandas")


def partitioned_hash_join(
    left, right, on: str, nbuckets: int = 32, how: str = "inner",
    left_cols: list[str] | None = None, right_cols: list[str] | None = None,
):
    """Explicit partitioned hash join of two Datasets.

    Both sides get ``bucket = hash(key) % nbuckets`` and a side tag,
    are unioned, and each bucket joins its two sides in one
    ``map_groups`` call — ONE shuffle total, bucket size bounded by
    ``nbuckets`` (salt hot keys by raising it)."""

    lnames = list(left_cols or left.schema().names)
    rnames = list(right_cols or right.schema().names)
    # union() requires one schema: pad each side with the other side's
    # columns as nulls, split again inside the bucket join
    all_cols = lnames + [c for c in rnames if c not in lnames]

    def tag(side: str, cols):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b[cols].copy()
            for c in all_cols:
                if c not in b.columns:
                    b[c] = None
            b = b[all_cols]
            b["__side"] = side
            b["__bucket"] = (
                pd.util.hash_array(b[on].to_numpy()) % np.uint64(nbuckets)
            ).astype(np.int64)
            return b

        return fn

    lt = left.map_batches(tag("l", lnames), batch_format="pandas")
    rt = right.map_batches(tag("r", rnames), batch_format="pandas")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][lnames]
        r = g[g["__side"] == "r"][rnames]
        if how == "inner" and (not len(l) or not len(r)):
            return l.iloc[0:0].merge(r.iloc[0:0], on=on)
        return l.merge(r, on=on, how=how)

    return lt.union(rt).groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join(
    ds,
    key: str,
    ts: str,
    value_cols: list[str],
    id_col: str,
    out_prefix: str = "prev_",
):
    """Per-key backward as-of self-lookup: for each row, the values of
    the latest same-key row with a STRICTLY smaller timestamp
    (deterministic: rows ordered by (ts, id_col), so equal timestamps
    tie-break by id). Rows with no predecessor get nulls.

    Ray shape: ``groupby(key)`` shuffle (keys co-located), vectorized
    searchsorted per group — the merge_asof pattern of the guide with
    an explicit tie-break."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, id_col], kind="stable").reset_index(drop=True)
        tvals = g[ts].to_numpy()
        idx = np.searchsorted(tvals, tvals, side="left") - 1
        valid = idx >= 0
        for c in value_cols:
            vals = g[c].to_numpy()
            out = np.full(len(g), None, dtype=object)
            out[valid] = vals[idx[valid]]
            g[f"{out_prefix}{c}"] = out
        return g

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
