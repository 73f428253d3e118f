"""Index build orchestration — the Ray-Data-native ``add()`` + ``commit()``.

Pipeline (SURVEY.md §3.1 "Ray shape", §7 step 2-4, 8):

    unit plan (parquet footers only, deterministic)
      → segments of units (checkpoint/resume granularity)
      → per segment:
          from_items(units)
            .map_batches(BuildPartials)     # read, doc-ids, tokenize,
                                            # docs-part write, partial
                                            # postings (salted)
            .groupby(["shard","bucket"])    # THE term-keyed shuffle
            .map_groups(MergeBucket)        # vectorized merge + write
          → segment manifest json (atomic)  # resume = skip segment
      → global stats (N, doc_count/sum_dl per scored field) from the
        docs table's dl_* columns — a single pruned-column Ray pass
      → term stats (global df per key) from the postings' (key, df)
        columns — pruned-column read + native groupby sum
      → manifest.json

Layout (all paths relative to ``index_dir``)::

    manifest.json                     # config, stats, file inventory
    seg-000.manifest.json             # per-segment checkpoint
    docs/seg-000/part-u000000.parquet # doc_id + stored cols + dl_*
    postings/seg-000/shard=S/bucket-B.parquet
    termstats/                        # (key, df) global df per term

The reference persists one LevelDB per segment with postings keyed
``field\\x1eterm`` (``immutable-segment.ts:98-309``); this layout is the
same logical content as partitioned Parquet: doc-range shards of
key-sorted posting rows + the docs table as Parquet row groups.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data

from yaii_ray.config import IndexConfig
from yaii_ray.stages.merge import MergeBucket
from yaii_ray.stages.partials import BuildPartials, plan_units


def _input_files(path_or_paths) -> list[str]:
    if isinstance(path_or_paths, str):
        if os.path.isdir(path_or_paths):
            files = sorted(glob.glob(os.path.join(path_or_paths, "*.parquet")))
        else:
            files = [path_or_paths]
    else:
        files = sorted(path_or_paths)
    if not files:
        raise FileNotFoundError(f"no parquet inputs at {path_or_paths}")
    return files


def _atomic_json(obj: dict, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def build_index(
    input_path,
    index_dir: str,
    config: IndexConfig,
    *,
    target_unit_rows: int = 65_536,
    units_per_segment: int = 256,
    num_buckets: int | None = None,
    metrics: dict | None = None,
) -> str:
    """Build (or resume building) an index. Returns ``index_dir``.

    Resume semantics: a segment whose ``seg-*.manifest.json`` exists is
    skipped entirely; within an unfinished segment, docs parts already
    written are not rewritten. The unit plan is a pure function of the
    input file list, so doc ids are identical across resumes.

    ``metrics`` (optional dict) receives per-stage wall times and
    counts — the per-stage lineage/throughput record the north rule
    asks for; it is also persisted into the manifest.
    """
    os.makedirs(index_dir, exist_ok=True)
    files = _input_files(input_path)
    units = plan_units(files, target_rows=target_unit_rows)
    segments = [
        units[i : i + units_per_segment]
        for i in range(0, len(units), units_per_segment)
    ]
    metrics = metrics if metrics is not None else {}
    metrics["segments"] = []

    cfg_json = config.to_json()
    seg_manifests = []
    for si, seg_units in enumerate(segments):
        seg_name = f"seg-{si:03d}"
        seg_manifest_path = os.path.join(index_dir, f"{seg_name}.manifest.json")
        planned_units = [
            {"unit": u["unit"], "path": u["path"], "rows": u["rows"],
             "doc_base": u["doc_base"]}
            for u in seg_units
        ]
        if os.path.exists(seg_manifest_path):
            with open(seg_manifest_path) as f:
                prev = json.load(f)
            if prev.get("units") == planned_units:
                seg_manifests.append(prev)
                metrics["segments"].append({"segment": seg_name, "skipped": True})
                continue
            # incremental append can reshape the trailing segment —
            # its old outputs are stale; wipe and rebuild this segment
            os.remove(seg_manifest_path)
            import shutil as _shutil

            _shutil.rmtree(os.path.join(index_dir, "docs", seg_name), ignore_errors=True)
            _shutil.rmtree(os.path.join(index_dir, "postings", seg_name), ignore_errors=True)
            _shutil.rmtree(os.path.join(index_dir, "termstats", seg_name), ignore_errors=True)
        t0 = time.monotonic()
        docs_dir = os.path.join(index_dir, "docs", seg_name)
        postings_dir = os.path.join(index_dir, "postings", seg_name)
        # a missing segment manifest means any postings/termstats here
        # are from a crashed run — rebuild them from scratch (docs
        # parts stay: they ARE resumable per unit)
        import shutil as _shutil

        _shutil.rmtree(postings_dir, ignore_errors=True)
        _shutil.rmtree(os.path.join(index_dir, "termstats", seg_name), ignore_errors=True)
        os.makedirs(docs_dir, exist_ok=True)
        os.makedirs(postings_dir, exist_ok=True)
        nb = num_buckets or max(16, len(seg_units))

        # fixed-size actor pool: starts at full parallelism immediately
        # (autoscaling pools ramp up too slowly for short segments) and
        # amortizes per-process warmup across units
        pool = int(min(len(seg_units), ray.cluster_resources().get("CPU", 8)))
        ds = ray.data.from_items(seg_units)
        partials = ds.map_batches(
            BuildPartials,
            fn_constructor_args=(cfg_json, docs_dir, nb),
            batch_size=1,
            concurrency=pool,
            batch_format="numpy",
        )
        # ONE streaming pipeline: partial postings → term-keyed merge
        # (writes postings + manifest sidecars) → global df per key →
        # per-segment termstats. Stats/manifests come back via tiny
        # sidecar files, so no second job re-reads the postings.
        seg_termstats = os.path.join(index_dir, "termstats", seg_name)
        (
            partials.groupby(["shard", "bucket"])
            .map_groups(MergeBucket(cfg_json, postings_dir), batch_format="pyarrow")
            .groupby("key")
            .sum("df")
            .write_parquet(seg_termstats)
        )
        manifest_rows = []
        for mf in sorted(
            glob.glob(os.path.join(postings_dir, "shard=*", "*.manifest.json"))
        ):
            with open(mf) as f:
                manifest_rows.append(json.load(f))
        rows = int(sum(u["rows"] for u in seg_units))
        seg_manifest = {
            "segment": seg_name,
            "doc_lo": int(seg_units[0]["doc_base"]),
            "doc_hi": int(seg_units[-1]["doc_base"] + seg_units[-1]["rows"]),
            "units": planned_units,
            "docs_files": [
                os.path.join(docs_dir, f"part-u{u['unit']:06d}.parquet")
                for u in seg_units
            ],
            "postings": sorted(
                manifest_rows, key=lambda r: (r["shard"], r["bucket"])
            ),
            "termstats": seg_termstats,
        }
        _atomic_json(seg_manifest, seg_manifest_path)
        seg_manifests.append(seg_manifest)
        dt = time.monotonic() - t0
        metrics["segments"].append(
            {"segment": seg_name, "rows": rows, "sec": round(dt, 3),
             "rows_per_sec": round(rows / dt, 1)}
        )

    # ---- global stats: sum the per-unit sidecars (no extra Ray job)
    t0 = time.monotonic()
    stats: dict = {"N": 0, "fields": {}, "dropped_rows": 0}
    for m in seg_manifests:
        for p in m["docs_files"]:
            with open(p + ".stats.json") as f:
                s = json.load(f)
            stats["N"] += s["n"]
            stats["dropped_rows"] += s.get("errors", 0)
            for fname, fs in s["fields"].items():
                agg = stats["fields"].setdefault(
                    fname, {"doc_count": 0, "sum_dl": 0}
                )
                agg["doc_count"] += fs["doc_count"]
                agg["sum_dl"] += fs["sum_dl"]
    metrics["stats_sec"] = round(time.monotonic() - t0, 3)
    # rows whose termization raised and were indexed as EMPTY docs
    # (per-row error isolation, stages/partials.py)
    metrics["dropped_rows"] = stats["dropped_rows"]

    # ---- global term stats: single segment -> use its termstats dir
    # directly; multiple segments -> one tiny merge groupby over the
    # per-segment (key, sum(df)) tables
    t0 = time.monotonic()
    termstats_dir = None
    seg_ts = [m["termstats"] for m in seg_manifests if m.get("termstats")]
    if len(seg_ts) == 1:
        termstats_dir = seg_ts[0]
    elif seg_ts:
        termstats_dir = os.path.join(index_dir, "termstats", "merged")
        import shutil as _shutil

        _shutil.rmtree(termstats_dir, ignore_errors=True)
        ts_files = [
            f for d in seg_ts for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
        ]
        (
            ray.data.read_parquet(ts_files)
            .groupby("key")
            .sum("sum(df)")
            .map_batches(
                lambda t: t.rename_columns(["key", "sum(df)"]),
                batch_format="pyarrow",
            )
            .write_parquet(termstats_dir)
        )
    metrics["termstats_sec"] = round(time.monotonic() - t0, 3)

    manifest = {
        "version": 1,
        "config": cfg_json,
        "stats": stats,
        "num_shards": config.num_shards,
        "chunk_shift": config.chunk_shift,
        "segments": seg_manifests,
        "termstats_dir": termstats_dir,
        "metrics": metrics,
    }
    _atomic_json(manifest, os.path.join(index_dir, "manifest.json"))
    return index_dir


def compact_index(index_dir: str, out_dir: str) -> str:
    """Merge a multi-segment index into a single segment (the
    reference's never-implemented ``scheduleNextMerge``,
    ``base-inverted-index.ts:536-548`` — LSM-style compaction).

    Doc ids are already global and disjoint across segments, so the
    merge is the SAME term-keyed groupby the build uses: posting rows
    from all segments re-shuffled on (shard, bucket) and re-merged by
    :class:`MergeBucket` (which re-sorts per (key, chunk) group —
    boundary chunks shared by adjacent segments fold together). Docs
    parts are re-linked, not rewritten — UNLESS tombstones exist
    (Q14): then deleted postings are purged inside the merge (the
    tombstone union broadcast once via ``ray.put``), overlapping docs
    parts are rewritten without the deleted rows, per-field stats are
    recomputed exactly from the surviving ``dl_*`` columns, and the
    output index carries no deletes. Surviving doc ids are NOT
    renumbered (unit ``rows`` keeps its original id-span semantics so
    range pruning and continuous-query doc_base stay correct).
    """
    import shutil

    manifest = load_manifest(index_dir)
    config = IndexConfig.from_json(manifest["config"])
    cfg_json = manifest["config"]
    deleted = load_deleted(manifest)
    deleted_ref = ray.put(deleted) if deleted.size else None
    os.makedirs(out_dir, exist_ok=True)
    seg_name = "seg-000"
    postings_dir = os.path.join(out_dir, "postings", seg_name)
    docs_dir = os.path.join(out_dir, "docs", seg_name)
    termstats_dir = os.path.join(out_dir, "termstats", seg_name)
    shutil.rmtree(postings_dir, ignore_errors=True)
    shutil.rmtree(termstats_dir, ignore_errors=True)
    os.makedirs(postings_dir, exist_ok=True)
    os.makedirs(docs_dir, exist_ok=True)

    posting_files = [
        p["path"] for m in manifest["segments"] for p in m["postings"]
    ]
    nb = max(16, len(posting_files))

    def re_key(t: pa.Table) -> pa.Table:
        import zlib

        t = t.select(["key", "chunk", "df", "docs", "tfs", "dls"])
        chunks = t["chunk"].to_numpy()
        key_hash = np.array(
            [zlib.crc32(k) for k in t["key"].cast(pa.large_binary()).to_pylist()],
            dtype=np.uint64,
        )
        shard = (chunks % np.int64(config.num_shards)).astype(np.int64)
        bucket = (
            (key_hash + chunks.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(nb)
        ).astype(np.int64)
        return t.append_column("shard", pa.array(shard)).append_column(
            "bucket", pa.array(bucket)
        )

    from yaii_ray.stages.merge import MergeBucket

    (
        ray.data.read_parquet(posting_files)
        .map_batches(re_key, batch_format="pyarrow")
        .groupby(["shard", "bucket"])
        .map_groups(
            MergeBucket(cfg_json, postings_dir, deleted_ref=deleted_ref),
            batch_format="pyarrow",
        )
        .groupby("key")
        .sum("df")
        .write_parquet(termstats_dir)
    )

    manifest_rows = []
    for mf in sorted(glob.glob(os.path.join(postings_dir, "shard=*", "*.manifest.json"))):
        with open(mf) as f:
            manifest_rows.append(json.load(f))

    docs_files = []
    units = []
    for m in manifest["segments"]:
        for u, p in zip(m["units"], m["docs_files"]):
            dest = docs_part_path_compat(docs_dir, len(docs_files))
            lo, hi = int(u["doc_base"]), int(u["doc_base"]) + int(u["rows"])
            overlaps = deleted.size and (
                np.searchsorted(deleted, np.uint64(lo))
                < np.searchsorted(deleted, np.uint64(hi))
            )
            if overlaps:
                # rewrite the part without the tombstoned rows and
                # recompute its stats sidecar from the surviving dl_*
                # columns (exactly the build's formula)
                import pyarrow.parquet as _pq

                t = _pq.read_table(p)
                ids = t["doc_id"].to_numpy()
                didx = np.searchsorted(deleted, ids)
                didx[didx == deleted.size] = 0
                t = t.filter(pa.array(deleted[didx] != ids))
                tmp = dest + ".tmp"
                _pq.write_table(t, tmp, compression="zstd")
                os.replace(tmp, dest)
                with open(p + ".stats.json") as f:
                    old_stats = json.load(f)
                stats = {
                    "n": int(t.num_rows),
                    "errors": int(old_stats.get("errors", 0)),
                    "fields": {
                        c[3:]: {
                            "doc_count": int((t[c].to_numpy() > 0).sum()),
                            "sum_dl": int(t[c].to_numpy().sum()),
                        }
                        for c in t.column_names
                        if c.startswith("dl_")
                    },
                }
                stmp = dest + ".stats.json.tmp"
                with open(stmp, "w") as f:
                    json.dump(stats, f)
                os.replace(stmp, dest + ".stats.json")
                # "rows" keeps the original id SPAN (range pruning /
                # next-doc_base semantics); live_rows is informational
                units.append({**u, "unit": len(units), "live_rows": int(t.num_rows)})
            else:
                if os.path.abspath(p) != os.path.abspath(dest):
                    if not os.path.exists(dest):
                        os.link(p, dest) if _same_fs(p, dest) else shutil.copy2(p, dest)
                    shutil.copy2(p + ".stats.json", dest + ".stats.json")
                units.append({**u, "unit": len(units)})
            docs_files.append(dest)

    seg_manifest = {
        "segment": seg_name,
        "doc_lo": manifest["segments"][0]["doc_lo"],
        "doc_hi": manifest["segments"][-1]["doc_hi"],
        "units": units,
        "docs_files": docs_files,
        "postings": sorted(manifest_rows, key=lambda r: (r["shard"], r["bucket"])),
        "termstats": termstats_dir,
    }
    _atomic_json(seg_manifest, os.path.join(out_dir, f"{seg_name}.manifest.json"))
    new_manifest = {
        **manifest,
        "segments": [seg_manifest],
        "termstats_dir": termstats_dir,
        "metrics": {"compacted_from": index_dir},
    }
    # runtime-attached tombstone keys never serialize; after a purge
    # the global stats are re-aggregated from the (rewritten) sidecars
    new_manifest.pop("delete_files", None)
    new_manifest.pop("deleted_count", None)
    if deleted.size:
        stats: dict = {"N": 0, "fields": {}, "dropped_rows": 0}
        for p in docs_files:
            with open(p + ".stats.json") as f:
                s = json.load(f)
            stats["N"] += s["n"]
            stats["dropped_rows"] += s.get("errors", 0)
            for fname, fs in s["fields"].items():
                agg = stats["fields"].setdefault(
                    fname, {"doc_count": 0, "sum_dl": 0}
                )
                agg["doc_count"] += fs["doc_count"]
                agg["sum_dl"] += fs["sum_dl"]
        new_manifest["stats"] = stats
        new_manifest["metrics"]["purged_docs"] = int(deleted.size)
    _atomic_json(new_manifest, os.path.join(out_dir, "manifest.json"))
    return out_dir


def _same_fs(a: str, b: str) -> bool:
    return os.stat(os.path.dirname(os.path.abspath(a))).st_dev == os.stat(
        os.path.dirname(os.path.abspath(b))
    ).st_dev


def docs_part_path_compat(docs_dir: str, unit: int) -> str:
    from yaii_ray.stages.partials import docs_part_path

    return docs_part_path(docs_dir, unit)


def build_index_from_table(
    table: "pa.Table", index_dir: str, config: IndexConfig, **kw
) -> str:
    """Convenience for tests / small corpora: stage an Arrow table as a
    Parquet input dir, then run the normal distributed build."""
    import pyarrow.parquet as pq

    src = index_dir.rstrip("/") + ".src"
    os.makedirs(src, exist_ok=True)
    dest = os.path.join(src, "part-00000.parquet")
    if not os.path.exists(dest):
        pq.write_table(table, dest)
    return build_index(src, index_dir, config, **kw)


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    # tombstones (Q14): deletes.json lists delete files appended by
    # Index.delete() after the build — attach absolute paths so shard
    # actors (which receive only the manifest dict) can load their
    # slice of the deleted set. Absent file == no deletes.
    dj = os.path.join(index_dir, "deletes.json")
    if os.path.exists(dj):
        with open(dj) as f:
            dmeta = json.load(f)
        manifest["delete_files"] = [
            os.path.join(index_dir, p) for p in dmeta.get("files", [])
        ]
        manifest["deleted_count"] = int(dmeta.get("count", 0))
    return manifest


def load_deleted(manifest: dict) -> np.ndarray:
    """Union of all tombstoned doc ids (sorted u64) — empty when the
    index has no deletes. Tombstone files are small by design (each is
    one delete call's match set), so the union is driver-loadable."""
    files = manifest.get("delete_files") or []
    if not files:
        return np.zeros(0, dtype=np.uint64)
    import pyarrow.parquet as _pq

    parts = [
        _pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy() for f in files
    ]
    return np.unique(np.concatenate(parts)).astype(np.uint64)
