"""Two-level grouped aggregation: map-side partial combine inside
``map_batches`` (each block shrinks to its distinct keys before any
data moves), then ONE native ``groupby().aggregate()`` over the
partials.

Why not a bare ``groupby().aggregate()`` on the raw rows: (a) the
shuffle then carries every row instead of per-block partials
(ray_guide 'Aggregation at scale'), and (b) with groups ≪ blocks most
of Ray's reduce partitions are EMPTY and surface as schema-less
RefBundles (the "different schema … new schema: ." executor warning);
``final_partitions=1`` collapses the tiny partials to one populated
reduce partition.

Both stages are Arrow-native. This matters beyond copies: Ray's
sort-based aggregate dispatches on the BLOCK format, and its
pandas-block path is ~12x slower than the Arrow path on this
workload (measured sf0.1 events, 95k groups: 61 s pandas partials vs
5 s Arrow partials for the identical final aggregate).

``final_partitions`` sizing: leave None (keep block count) when the
group count is large — every reduce partition stays populated and
parallel; set 1 when #groups is modest (the partials total #blocks ×
#groups-per-block rows, so one reducer sees almost nothing).
"""

from __future__ import annotations

import pyarrow as pa

_PA_AGG = {"sum": "sum", "min": "min", "max": "max"}
_FINAL_CLS = {"sum": "Sum", "count": "Sum", "min": "Min", "max": "Max"}


def grouped_aggregate(
    ds,
    keys: list[str],
    specs: list[tuple[str | None, str, str]],
    final_partitions: int | None = None,
):
    """``specs`` = [(column, kind, alias)] with kind in
    sum/count/min/max (count ignores ``column``). Returns a Dataset
    with columns ``keys + [alias, ...]``."""
    from ray.data import aggregate as ragg

    pa_aggs = []
    for col, kind, _alias in specs:
        if kind == "count":
            pa_aggs.append(([], "count_all"))
        elif kind in _PA_AGG:
            if col is None:
                raise ValueError(f"{kind} needs a column")
            pa_aggs.append((col, _PA_AGG[kind]))
        else:
            raise ValueError(f"unsupported agg kind: {kind}")
    out_names = list(keys) + [alias for _c, _k, alias in specs]

    def partial(t: pa.Table) -> pa.Table:
        # use_threads=False: Ray already runs one task per core
        g = t.group_by(keys, use_threads=False)
        return g.aggregate(pa_aggs).rename_columns(out_names)

    final_aggs = [
        getattr(ragg, _FINAL_CLS[kind])(alias, alias_name=alias)
        for _col, kind, alias in specs
    ]

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    return partials.groupby(keys).aggregate(*final_aggs)
