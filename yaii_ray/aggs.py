"""Aggregations over index query results — G1-G4 (SURVEY.md §2.7).

The reference runs an explicit partial (per-segment accumulator) +
final (merger) scheme (``aggregateQuery``,
``src/base-inverted-index.ts:297-394``; accumulators
``src/lib/internal/aggregate.ts``). That contract maps 1:1 onto Ray
Data: partials are vectorized ``map_batches`` over docs-table blocks,
finals are a tiny driver-side reduce (COUNT/FIRST/LAST) or a native
``groupby`` shuffle (GROUP_BY).

The matching-doc set comes from the index (shard actors) and is pushed
into the scan as per-shard ObjectRefs (``resolve_refs``): the ids live
in the object store, scan tasks read them zero-copy, and the driver
never holds the match set — safe for filters matching most of the
corpus. No per-batch re-shipping, no shuffle for the filter itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from yaii_ray.query import dsl


class Agg:
    pass


@dataclass(frozen=True)
class Count(Agg):
    """G1 — matching-doc count (aggregate.ts:118-155)."""

    name: str = "count"


@dataclass(frozen=True)
class First(Agg):
    """G2 — top-1 row under the sort clauses (TopAccumulator,
    aggregate.ts:41-116). ``project`` = columns attached to the winner."""

    sort: tuple
    project: tuple = ()
    name: str = "first"


@dataclass(frozen=True)
class Last(Agg):
    """G3 — top-1 under the reversed comparator
    (base-inverted-index.ts:347-350)."""

    sort: tuple
    project: tuple = ()
    name: str = "last"


@dataclass(frozen=True)
class GroupBy(Agg):
    """G4 — hash-group on a stored field with nested sub-aggregations
    (GroupByAccumulator, aggregate.ts:158-277). The hand-rolled
    two-level map becomes a native Ray ``groupby`` shuffle."""

    field: str
    aggs: tuple = dc_field(default_factory=tuple)
    name: str = "group_by"


def _reverse(sort: tuple) -> tuple:
    return tuple(
        dsl.SortClause(c.field, dsl.DESC if c.dir == dsl.ASC else dsl.ASC)
        for c in sort
    )


def _sort_df(df: pd.DataFrame, sort: tuple) -> pd.DataFrame:
    for cl in reversed(sort):
        df = df.sort_values(
            cl.field,
            ascending=(cl.dir == dsl.ASC),
            na_position=("first" if cl.dir == dsl.ASC else "last"),
            kind="stable",
        )
    return df


def _needed_columns(aggs: list[Agg]) -> set[str]:
    cols: set[str] = set()
    for a in aggs:
        if isinstance(a, (First, Last)):
            cols |= {c.field for c in a.sort} | set(a.project)
        elif isinstance(a, GroupBy):
            cols.add(a.field)
            cols |= _needed_columns(list(a.aggs))
    return cols


def aggregate(index, filter: dsl.Query, aggs: list[Agg]) -> dict[str, Any]:
    """Run aggregations over docs matching ``filter``.

    Partial/final per agg kind:
    - Count: resolved set size (no scan at all).
    - First/Last: per-block top-1 (vectorized pandas sort over each
      docs block) → driver-side final top-1 over ≤ n_blocks rows.
    - GroupBy: per-block partial (count + per-subagg top-1 PER GROUP)
      → ``groupby(field)`` over the much smaller partials → final
      merge per group. Pre-aggregation before the shuffle keeps hot
      groups cheap (ray_guide 'Aggregation at scale').
    """
    out: dict[str, Any] = {}
    scan_aggs = [a for a in aggs if not isinstance(a, Count)]
    for a in aggs:
        if isinstance(a, Count):
            # shard-side count: no id array ever reaches the driver
            out[a.name] = index.count(filter)
    if not scan_aggs:
        return out

    cols = sorted(_needed_columns(scan_aggs))
    # broad-filter-safe: ids stay in the object store as per-shard refs
    ds = index.docs_dataset(columns=cols, doc_ids=index.resolve_refs(filter))

    for a in scan_aggs:
        if isinstance(a, (First, Last)):
            sort = a.sort if isinstance(a, First) else _reverse(a.sort)
            keep = sorted({c.field for c in sort} | set(a.project))

            def block_top1(b: pd.DataFrame, sort=sort, keep=keep) -> pd.DataFrame:
                if not len(b):
                    return b[keep]
                return _sort_df(b, sort).head(1)[keep]

            parts = ds.map_batches(block_top1, batch_format="pandas").to_pandas()
            if len(parts):
                win = _sort_df(parts, sort).head(1).iloc[0]
                out[a.name] = {c: win[c] for c in keep}
            else:
                out[a.name] = None
        elif isinstance(a, GroupBy):
            out[a.name] = _group_by(ds, a)
    return out


def _group_by(ds, spec: GroupBy) -> pd.DataFrame:
    sub = list(spec.aggs)
    gcol = spec.field

    # deterministic column order — set iteration varies per process and
    # blocks with permuted columns trip the executor's schema check
    sub_cols = {
        a.name: sorted({c.field for c in a.sort} | set(a.project))
        for a in sub
        if isinstance(a, (First, Last))
    }
    partial_cols = [gcol, "__n"] + [
        f"{name}.{c}" for name, cs in sub_cols.items() for c in cs
    ]
    final_cols = [gcol, "count"] + partial_cols[2:]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in b.groupby(gcol, dropna=False, sort=False):
            row = {gcol: key, "__n": len(g)}
            for a in sub:
                if isinstance(a, (First, Last)):
                    srt = a.sort if isinstance(a, First) else _reverse(a.sort)
                    win = _sort_df(g, srt).head(1).iloc[0]
                    for c in sub_cols[a.name]:
                        row[f"{a.name}.{c}"] = win[c]
            rows.append(row)
        return pd.DataFrame(rows, columns=partial_cols)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        row = {gcol: g[gcol].iloc[0], "count": int(g["__n"].sum())}
        for a in sub:
            if isinstance(a, (First, Last)):
                srt = a.sort if isinstance(a, First) else _reverse(a.sort)
                renamed = g.rename(
                    columns={f"{a.name}.{c}": c for c in sub_cols[a.name]}
                )
                win = _sort_df(renamed, srt).head(1).iloc[0]
                for c in sub_cols[a.name]:
                    row[f"{a.name}.{c}"] = win[c]
        return pd.DataFrame([row], columns=final_cols)

    # partials total ≤ #blocks × #groups rows; collapsing them to one
    # block keeps every reduce partition of the groupby populated (no
    # schema-less empty RefBundles)
    partials = ds.map_batches(partial, batch_format="pandas").repartition(1)
    result = partials.groupby(gcol).map_groups(final, batch_format="pandas")
    df = result.to_pandas()
    return df.sort_values(gcol).reset_index(drop=True)
