"""Local replica of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` callable against the matching
``oracle_sql()`` statement in DuckDB on the same parquet tables and
compares row count, sorted-column schema and an order-insensitive
value hash — the same comparison the driver records in
``CORRECTNESS_r{N}.json``.

Usage: ``python selfcheck.py [sf_dir] [name ...]`` (default
``/root/testdata/sf0.01``, all queries).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(obj) -> pd.DataFrame:
    # pandas passes through; pyarrow Table and ray Dataset both expose
    # to_pandas()
    return obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            df[c] = col.round(6) + 0.0  # +0.0 folds -0.0 into 0.0 pre-hash
        elif pd.api.types.is_integer_dtype(col):
            df[c] = col.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(df[c].astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
        )

    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = _normalize(_to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}", flush=True)
            failures.append(name)
            continue
        ray_s = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {ray_s:.1f}s, no oracle)", flush=True)
            continue
        try:
            exp = _normalize(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}", flush=True)
            failures.append(name)
            continue
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"schema {list(got.columns)} != {list(exp.columns)}")
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if not problems and _value_hash(got) != _value_hash(exp):
            diff = (got != exp) & ~(got.isna() & exp.isna())
            bad = diff.any(axis=1)
            problems.append(
                f"value hash mismatch ({int(bad.sum())} differing rows; first: "
                f"got={got[bad].head(2).to_dict('records')} "
                f"exp={exp[bad].head(2).to_dict('records')})"
            )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems), flush=True)
            failures.append(name)
        else:
            print(f"ok   {name}: {len(got)} rows match ({ray_s:.1f}s)", flush=True)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
