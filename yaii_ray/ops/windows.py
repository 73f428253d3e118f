"""Windowed aggregates over event streams on a batch engine.

Ray Data has no event-time window machinery (nor does the reference — its
only streaming feature is continuous-query re-resolution, SURVEY.md
§2.9); windows are expressed as key computations + groupby, per the
Ray guide's "streaming-shaped workloads" pattern. Ordering assumption:
event time is a column; no late-data/watermark semantics.

- tumbling: one window key per row (pure map + groupby).
- hopping: each row replicated to size/hop windows (flat map +
  groupby) — replication factor is explicit and small.
- session: per-key gap-based sessionization (groupby(key) + sorted
  cumulative gap splits inside the group).
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


def session_windows(ds, key: str, ts: str, gap_us: int, id_col: str):
    """Gap-based sessions per key: a new session starts when the gap to
    the previous event (ordered by (ts, id_col)) exceeds ``gap_us``.
    Emits one row per session: key, session start/end, event count."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, id_col], kind="stable").reset_index(drop=True)
        t = g[ts].astype("int64").to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (t[1:] - t[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        out = (
            pd.DataFrame({key: g[key], "sid": sid, "t": t})
            .groupby("sid")
            .agg(**{
                key: (key, "first"),
                "session_start": ("t", "min"),
                "session_end": ("t", "max"),
                "n_events": ("t", "size"),
            })
            .reset_index(drop=True)
        )
        return out

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
