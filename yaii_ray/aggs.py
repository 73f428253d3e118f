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


@dataclass(frozen=True)
class TermBuckets(Agg):
    """G5 — one bucket per distinct term (reference
    ``src/lib/api/bucket-query.ts:8-12,25-30``, an API surface with no
    executor upstream). Sugar for GROUP_BY(field); the result column
    is named ``bucket``."""

    field: str
    aggs: tuple = dc_field(default_factory=tuple)
    name: str = "term_buckets"


@dataclass(frozen=True)
class NumericBuckets(Agg):
    """G5 — fixed-width numeric buckets (``bucket-query.ts:14-18``):
    ``bucket = floor(value / bucket_size) * bucket_size`` (the range
    start labels the bucket). Desugars to GROUP_BY over the derived
    key — a pure map-side column, no extra shuffle."""

    field: str
    bucket_size: float
    aggs: tuple = dc_field(default_factory=tuple)
    name: str = "numeric_buckets"


def _reverse(sort: tuple) -> tuple:
    return tuple(
        dsl.SortClause(
            c.field,
            dsl.DESC if c.dir == dsl.ASC else dsl.ASC,
            collation=getattr(c, "collation", None),
        )
        for c in sort
    )


def _sort_df(df: pd.DataFrame, sort: tuple) -> pd.DataFrame:
    """Comparator used by First/Last winners — the reference builds
    the SAME comparator for aggregates as for sorted queries
    (buildComparatorAndProjections, base-inverted-index.ts:606-659),
    so delegate to engine.sort_pandas: stable multi-clause order,
    undefined-first null semantics, multi-value first-element
    operands, and SortClause collation ('base'/'icu') all apply to
    aggregate sort clauses too."""
    from yaii_ray.engine import sort_pandas  # lazy: engine imports aggs

    return sort_pandas(df, list(sort))


def _needed_columns(aggs: list[Agg]) -> set[str]:
    cols: set[str] = set()
    for a in aggs:
        if isinstance(a, (First, Last)):
            cols |= {c.field for c in a.sort} | set(a.project)
        elif isinstance(a, (GroupBy, TermBuckets, NumericBuckets)):
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
        elif isinstance(a, TermBuckets):
            res = _group_by(ds, GroupBy(a.field, a.aggs))
            out[a.name] = res.rename(columns={a.field: "bucket"})
        elif isinstance(a, NumericBuckets):
            out[a.name] = _group_by(
                _with_bucket_column(ds, a.field, a.bucket_size),
                GroupBy("bucket", a.aggs),
            )
    return out


def _with_bucket_column(ds, field: str, width: float):
    """Append ``bucket = floor(field / width) * width`` (Arrow map —
    integer arithmetic when both sides are integral, so int fields get
    int bucket labels)."""
    int_width = float(width).is_integer()

    def add_bucket(t: pa.Table) -> pa.Table:
        x = t[field].to_numpy(zero_copy_only=False)
        if int_width and np.issubdtype(x.dtype, np.integer):
            w = np.int64(int(width))
            b = (x.astype(np.int64) // w) * w
        else:
            b = np.floor(x.astype(np.float64) / width) * width
        return t.append_column("bucket", pa.array(b))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def _final_partition_count(n_partial_rows: int, rows_per_partition: int = 65536) -> int:
    """Final-stage reduce sizing (the ops/grouped.py rule, applied):
    one reduce partition per ~64k partial rows. Modest group counts
    collapse to 1 (every reduce partition stays populated — partial
    rows ≥ distinct groups, and #blocks ≪ 64k, so partitions never
    exceed the group count); a high-cardinality key gets a parallel
    final stage instead of a single reducer."""
    return max(1, n_partial_rows // rows_per_partition)


def _first_per_code(
    g: pd.DataFrame, codes: np.ndarray, srt: tuple, rename: dict[str, str]
) -> np.ndarray:
    """Row position of each group's top-1 under ``srt`` — one stable
    whole-frame sort, then the first occurrence per group code
    (identical winner to a per-group sort+head(1), vectorized)."""
    view = g.rename(columns=rename) if rename else g
    order = _sort_df(
        view.assign(__pos=np.arange(len(view))), srt
    )["__pos"].to_numpy()
    # codes are 0..K-1 with every value present, so np.unique's
    # ascending uniques align index i == code i
    first_sorted = np.unique(codes[order], return_index=True)[1]
    return order[first_sorted]


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

    # Blocks crossing the ONE shuffle are Arrow end-to-end: Ray's
    # sort-based groupby over pandas blocks is ~12x slower than over
    # Arrow blocks (the ops/grouped.py gotcha — VERDICT r4 #3). The
    # winner logic stays pandas/numpy INSIDE each call; every callable
    # emits Arrow against an explicit schema derived from its input
    # (so empty blocks and null-promoted int->float frames can't
    # diverge block schemas).
    def _partial_schema(in_schema: pa.Schema) -> pa.Schema:
        fields = [(gcol, in_schema.field(gcol).type), ("__n", pa.int64())]
        fields += [
            (f"{name}.{c}", in_schema.field(c).type)
            for name, cs in sub_cols.items()
            for c in cs
        ]
        return pa.schema(fields)

    def partial(b: pa.Table) -> pa.Table:
        target = _partial_schema(b.schema)
        if b.num_rows == 0:
            return target.empty_table()
        pdf = b.to_pandas()
        codes, uniq = pd.factorize(pdf[gcol], use_na_sentinel=False)
        out = pd.DataFrame({gcol: uniq, "__n": np.bincount(codes, minlength=len(uniq))})
        for a in sub:
            if isinstance(a, (First, Last)):
                srt = a.sort if isinstance(a, First) else _reverse(a.sort)
                win = _first_per_code(pdf, codes, srt, rename={})
                for c in sub_cols[a.name]:
                    out[f"{a.name}.{c}"] = pdf[c].to_numpy()[win]
        return pa.Table.from_pandas(
            out[partial_cols], schema=target, preserve_index=False
        )

    def final_group(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__kb")
        target = pa.schema(
            [(gcol, g.schema.field(gcol).type), ("count", pa.int64())]
            + [(f, g.schema.field(f).type) for f in partial_cols[2:]]
        )
        if g.num_rows == 0:
            return target.empty_table()
        pdf = g.to_pandas()
        codes, uniq = pd.factorize(pdf[gcol], use_na_sentinel=False)
        out = pd.DataFrame(
            {
                gcol: uniq,
                "count": np.bincount(
                    codes, weights=pdf["__n"].to_numpy(), minlength=len(uniq)
                ).astype(np.int64),
            }
        )
        for a in sub:
            if isinstance(a, (First, Last)):
                srt = a.sort if isinstance(a, First) else _reverse(a.sort)
                rename = {f"{a.name}.{c}": c for c in sub_cols[a.name]}
                win = _first_per_code(pdf, codes, srt, rename)
                for c in sub_cols[a.name]:
                    out[f"{a.name}.{c}"] = pdf[f"{a.name}.{c}"].to_numpy()[win]
        return pa.Table.from_pandas(
            out[final_cols], schema=target, preserve_index=False
        )

    # final-stage sizing by MEASURED partial volume (the partials are
    # the pre-aggregated small side, so materializing them is cheap):
    # modest group counts collapse to one populated reduce partition;
    # a high-cardinality key keeps a parallel final stage. Keys are
    # re-bucketed by hash so each map_groups call merges a whole
    # BUCKET of groups vectorized (not one Python call per group).
    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    nparts = _final_partition_count(partials.count())

    def add_kb(t: pa.Table) -> pa.Table:
        kb = (
            pd.util.hash_array(t[gcol].to_numpy(zero_copy_only=False))
            % np.uint64(nparts)
        ).astype(np.int64)
        return t.append_column("__kb", pa.array(kb))

    result = (
        partials.map_batches(add_kb, batch_format="pyarrow")
        # ≥ ~4 buckets per reduce partition (joins.py sizing): more
        # blocks than populated buckets would leave reduce partitions
        # empty (schema-less RefBundles)
        .repartition(max(1, nparts // 4))
        .groupby("__kb")
        .map_groups(final_group, batch_format="pyarrow")
    )
    df = result.to_pandas()
    return df.sort_values(gcol).reset_index(drop=True)
