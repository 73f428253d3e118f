"""Windowed aggregates over event streams on a batch engine.

Ray Data has no event-time window machinery (nor does the reference — its
only streaming feature is continuous-query re-resolution, SURVEY.md
§2.9); windows are expressed as key computations + groupby, per the
Ray guide's "streaming-shaped workloads" pattern. Ordering assumption:
event time is a column; no late-data/watermark semantics.

- tumbling: one window key per row (pure map + groupby).
- hopping: each row replicated to size/hop windows (flat map +
  groupby) — replication factor is explicit and small.
- session: gap-based sessionization, hash-bucketed by key (one
  groupby over ``nbuckets`` buckets, all keys in a bucket sessionized
  in one vectorized sort + boundary-mask pass — no per-key Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(ds, key: str, ts: str, size_us: int):
    """Append ``win`` = floor(ts / size) (group with ``groupby([key,
    'win'])`` afterwards)."""

    def bucket(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64())
        return b.append_column("win", pc.cast(pc.divide(us, size_us), pa.int64()))

    return ds.map_batches(bucket, batch_format="pyarrow")


def hopping_window(ds, key: str, ts: str, size_us: int, hop_us: int):
    """Replicate each row into every window [w*hop, w*hop + size) that
    contains it; window id = start // hop."""
    assert size_us % hop_us == 0
    k = size_us // hop_us

    def explode(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy()
        base = us // hop_us
        n = len(us)
        reps = np.repeat(np.arange(n, dtype=np.int64), k)
        wins = np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64), n)
        keep = wins >= 0
        out = b.take(pa.array(reps[keep]))
        return out.append_column("win", pa.array(wins[keep], type=pa.int64()))

    return ds.map_batches(explode, batch_format="pyarrow")


def add_key_bucket(key: str, nbuckets: int):
    """Map-side ``__bucket = hash(key) % nbuckets`` tag (Arrow in/out).
    Shared by the bucketed per-key reducers below: the shuffle groups
    by BUCKET (bounded cardinality), never by the raw key, so per-key
    operators stay one vectorized call per bucket even at 10^9 distinct
    keys."""

    def fn(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        bucket = (pd.util.hash_array(k) % np.uint64(nbuckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(bucket))

    return fn


def key_boundaries(kcol: pa.Array, n: int) -> np.ndarray:
    """Boolean mask: True where row i starts a new key run in a
    key-sorted table (row 0 always True). One Arrow kernel, no per-key
    Python."""
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = ~pc.equal(kcol.slice(1), kcol.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    return new


def session_windows(ds, key: str, ts: str, gap_us: int, id_col: str,
                    nbuckets: int = 32):
    """Gap-based sessions per key: a new session starts when the gap to
    the previous event (ordered by (ts, id_col)) exceeds ``gap_us``.
    Emits one row per session: key, session start/end, event count.

    Scale shape (VERDICT r4 #1): keys are hash-bucketed map-side, the
    one shuffle groups by ``__bucket`` (cardinality ``nbuckets``, not
    #keys), and each bucket sessionizes ALL its keys in one vectorized
    pass — sort by (key, ts, id), boundary masks, ``reduceat``-style
    segment extraction. No per-key Python call anywhere."""

    def per_bucket(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table({
                key: pa.array([], type=g.schema.field(key).type),
                "session_start": pa.array([], type=pa.int64()),
                "session_end": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
            })
        order = pc.sort_indices(
            g,
            sort_keys=[(key, "ascending"), (ts, "ascending"),
                       (id_col, "ascending")],
        )
        g = g.take(order)
        t = pc.cast(g[ts], pa.int64()).to_numpy()
        kcol = g.column(key).combine_chunks()
        new = key_boundaries(kcol, n)
        if n > 1:
            new[1:] |= (t[1:] - t[:-1]) > gap_us
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            key: kcol.take(pa.array(starts)),
            "session_start": pa.array(t[starts]),
            "session_end": pa.array(t[ends]),
            "n_events": pa.array(np.diff(np.append(starts, n)).astype(np.int64)),
        })

    return (
        ds.map_batches(add_key_bucket(key, nbuckets), batch_format="pyarrow")
        # same sizing rationale as joins.partitioned_hash_join: keep
        # reduce partitions ≤ populated buckets so none go empty.
        .repartition(max(2, nbuckets // 4))
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
