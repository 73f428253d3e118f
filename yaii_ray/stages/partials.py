"""Build stage 1: input units -> docs-table parts + partial postings.

A *unit* is a contiguous row-group range of one input Parquet file plus
its precomputed dense doc-id base (prefix sum over the deterministic
unit plan — SURVEY.md §7 "dense stable doc_ids at scale"). Each unit is
processed by one task:

1. read its row groups (only searchable/stored columns),
2. assign ``doc_id = base + row_index`` (dense u64; files are required
   to be globally ordered by the logical doc key, e.g.
   ``(conv_id, turn_idx)``, which makes ids rank-stable — the corpus
   generator and the docs sink both guarantee this ordering),
3. write the docs-table part (stored columns + per-field ``dl_*``
   lengths) atomically — already-present parts are skipped on re-runs
   (per-partition checkpoint/resume),
4. emit partially-aggregated posting groups (stages/termize.py) tagged
   with their shuffle keys: ``shard`` (doc-range partition of the
   index, ``chunk % num_shards``) and ``bucket`` (salted merge bucket,
   ``crc32(key) ⊕ chunk`` — hot terms spread across buckets so no
   merge task ever sees more than ~1/num_buckets of the postings).
"""

from __future__ import annotations

import os
import uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from yaii_ray.config import Flags, IndexConfig
from yaii_ray.stages import termize


def plan_units(
    files: list[str], target_rows: int = 65_536
) -> list[dict]:
    """Deterministic unit plan: split each file's row groups into
    ~target_rows units and prefix-sum dense doc-id bases.

    Only Parquet footers are read — at 100 TB this is a metadata-only
    pass, parallelizable if ever needed.
    """
    units: list[dict] = []
    base = 0
    for path in files:
        md = pq.ParquetFile(path).metadata
        rg_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        lo = 0
        acc = 0
        for i, r in enumerate(rg_rows):
            acc += r
            if acc >= target_rows or i == len(rg_rows) - 1:
                units.append(
                    {
                        "unit": len(units),
                        "path": path,
                        "rg_lo": lo,
                        "rg_hi": i + 1,
                        "rows": acc,
                        "doc_base": base,
                    }
                )
                base += acc
                lo = i + 1
                acc = 0
    return units


def atomic_write_parquet(table: pa.Table, path: str, **kw) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(table, tmp, **kw)
    os.replace(tmp, path)


def docs_part_path(docs_dir: str, unit: int) -> str:
    return os.path.join(docs_dir, f"part-u{unit:06d}.parquet")


def build_partials_batch(
    batch: dict, *, config_json: dict, docs_dir: str, num_buckets: int
) -> pa.Table:
    """Stateless map_batches TASK body (preferred over an actor pool:
    no per-batch state worth amortizing, and a task pool parallelizes
    instantly instead of waiting for actor-pool scale-up)."""
    return BuildPartials(config_json, docs_dir, num_buckets)(batch)


class BuildPartials:
    """The per-unit build stage (see module docstring); used via
    :func:`build_partials_batch` with batch_size=1."""

    def __init__(self, config_json: dict, docs_dir: str, num_buckets: int):
        from yaii_ray.analysis.tokenizer import ensure_analyzers

        self.config = IndexConfig.from_json(config_json)
        ensure_analyzers(self.config.analyzers)
        self.docs_dir = docs_dir
        self.num_buckets = num_buckets

    def __call__(self, batch: dict) -> pa.Table:
        out: list[pa.Table] = []
        for i in range(len(batch["unit"])):
            out.append(
                self._one_unit(
                    int(batch["unit"][i]),
                    str(batch["path"][i]),
                    int(batch["rg_lo"][i]),
                    int(batch["rg_hi"][i]),
                    int(batch["doc_base"][i]),
                )
            )
        return pa.concat_tables(out)

    @staticmethod
    def _extract_isolating(
        table: pa.Table, doc_ids: np.ndarray, cfg: IndexConfig
    ) -> tuple[pa.Table, dict, int]:
        """Slow path after a vectorized-extraction failure: bisect the
        batch to locate the k offending rows (O(k log n) probe slices),
        index them as EMPTY docs (no postings, dl=0 — the reference's
        try/catch -> {} fallback), and re-run the vectorized extraction
        once on the good rows."""
        bad: list[int] = []

        def probe(lo: int, hi: int) -> None:
            if lo >= hi:
                return
            sl = table.slice(lo, hi - lo)
            try:
                termize.extract_postings(
                    sl, doc_ids[lo:hi], cfg
                )
                return
            except Exception:
                if hi - lo == 1:
                    bad.append(lo)
                    return
                mid = (lo + hi) // 2
                probe(lo, mid)
                probe(mid, hi)

        n = table.num_rows
        probe(0, n)
        good = np.setdiff1d(np.arange(n, dtype=np.int64), np.array(bad, dtype=np.int64))
        partials, dl_good = termize.extract_postings(
            table.take(pa.array(good)), doc_ids[good], cfg
        )
        dl_cols = {}
        for fname, dl in dl_good.items():
            full = np.zeros(n, dtype=dl.dtype)
            full[good] = dl
            dl_cols[fname] = full
        return partials, dl_cols, len(bad)

    def _one_unit(
        self, unit: int, path: str, rg_lo: int, rg_hi: int, doc_base: int
    ) -> pa.Table:
        cfg = self.config
        pf = pq.ParquetFile(path)
        wanted = [
            c
            for c in pf.schema_arrow.names
            if not (cfg.resolve(c).flags & Flags.IGNORED)
        ]
        table = pf.read_row_groups(list(range(rg_lo, rg_hi)), columns=wanted)
        if any(
            pa.types.is_struct(t)
            or ((pa.types.is_list(t) or pa.types.is_large_list(t))
                and pa.types.is_struct(t.value_type))
            for t in table.schema.types
        ):
            # nested input (M1): dotted-path columns from here on —
            # config fields, postings keys, stored docs columns and
            # dl_* sidecars all use the flattened names. Column
            # pruning above is top-level only for nested inputs.
            from yaii_ray.stages.flatten import flatten_batch

            table = flatten_batch(table)
        n = table.num_rows
        doc_ids = (doc_base + np.arange(n, dtype=np.uint64)).astype(np.uint64)

        # per-row error isolation (reference M4 semantics: a doc whose
        # termization throws is indexed as EMPTY and the build goes on,
        # base-inverted-index.ts:236-268). Zero cost unless the
        # vectorized extraction actually raises.
        try:
            partials, dl_cols = termize.extract_postings(table, doc_ids, cfg)
            n_errors = 0
        except Exception:
            partials, dl_cols, n_errors = self._extract_isolating(
                table, doc_ids, cfg
            )

        dest = docs_part_path(self.docs_dir, unit)
        if not os.path.exists(dest):
            stored = [c for c in table.column_names if cfg.resolve(c).flags & Flags.STORED]
            docs_tbl = table.select(stored).add_column(
                0, "doc_id", pa.array(doc_ids, type=pa.uint64())
            )
            for fname, dl in dl_cols.items():
                docs_tbl = docs_tbl.append_column(
                    f"dl_{fname}", pa.array(dl, type=pa.uint32())
                )
            atomic_write_parquet(docs_tbl, dest, compression="zstd")
        # per-unit stats sidecar (N, per-field doc_count/sum_dl) — the
        # driver sums these tiny jsons instead of running a separate
        # stats job over the docs table
        import json

        stats = {
            "n": int(n),
            "errors": int(n_errors),
            "fields": {
                f: {"doc_count": int((dl > 0).sum()), "sum_dl": int(dl.sum())}
                for f, dl in dl_cols.items()
            },
        }
        tmp = dest + ".stats.json.tmp"
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, dest + ".stats.json")

        # shuffle keys: shard = doc-range partition, bucket = salted
        # merge bucket mixing term hash with the chunk salt
        chunks = partials["chunk"].to_numpy()
        keys = partials["key"]
        key_hash = np.array(
            [zlib.crc32(k) for k in keys.cast(pa.binary()).to_pylist()],
            dtype=np.uint64,
        )
        shard = (chunks % np.int64(cfg.num_shards)).astype(np.int64)
        bucket = (
            (key_hash + chunks.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(self.num_buckets)
        ).astype(np.int64)
        return partials.append_column("shard", pa.array(shard)).append_column(
            "bucket", pa.array(bucket)
        )
