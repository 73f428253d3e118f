"""Build stage 2: merge partial posting groups into final postings.

Runs as ``groupby(["shard", "bucket"]).map_groups(MergeBucket)`` — the
term-keyed groupby-aggregate shuffle of the north rule. One call
receives every partial (key, chunk) group of one (shard, bucket); the
merge is vectorized across ALL groups in the bucket at once:

1. bulk-decode every partial binary (one varint pass, segmented
   un-delta),
2. one ``lexsort`` by (group, doc) restores global doc order inside
   each (key, chunk) group (partials from different build tasks cover
   disjoint doc ranges),
3. bulk re-encode with per-group slicing, plus **block-max sidecars**
   per ``block_size`` postings: last doc id, max tf, min dl. The
   sidecar upper-bounds the BM25 contribution of a block
   (``tfnorm(max_tf, min_dl) >= max tfnorm in block``) without needing
   global ``avgdl`` at build time, which keeps the build single-pass.

The merged table is written directly to its deterministic location
``postings/shard=S/bucket-B.parquet`` (atomic rename, safe under Ray
task retries) and only a small manifest row flows back to the driver —
posting bytes never transit the driver.

Replaces the reference's posting serialization + (never-implemented)
segment merge — ``immutable-segment.ts:257-283``,
``base-inverted-index.ts:536-548`` (T3/T6 in SURVEY.md §2.4).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from yaii_ray import codec
from yaii_ray.config import IndexConfig
from yaii_ray.stages.partials import atomic_write_parquet
from yaii_ray.stages.termize import KEY_SEP

DF_PARTIAL_SCHEMA = pa.schema([("key", pa.large_string()), ("df", pa.int64())])


def _posting_index_ranges(row_starts: np.ndarray, row_sizes: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(start, start+size)`` per row — the posting
    indices covered by a set of rows."""
    total = int(row_sizes.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.ones(total, dtype=np.int64)
    ends = np.cumsum(row_sizes)
    starts_in_out = ends - row_sizes
    idx[starts_in_out] = row_starts
    idx[starts_in_out[1:]] -= row_starts[:-1] + row_sizes[:-1] - 1
    return np.cumsum(idx)


class MergeBucket:
    """Vectorized per-bucket merge + write (see module docstring)."""

    def __init__(self, config_json: dict, postings_dir: str, deleted_ref=None):
        self.config = IndexConfig.from_json(config_json)
        self.postings_dir = postings_dir
        # compaction purge (Q14): ObjectRef to the sorted u64 tombstone
        # union — broadcast ONCE via ray.put by compact_index, fetched
        # zero-copy per worker, never re-shipped per group
        self._deleted_ref = deleted_ref
        self._deleted_cache = None
        self.__name__ = "MergeBucket"  # map_groups wants a function-like name

    def _deleted(self):
        if self._deleted_ref is None:
            return None
        if self._deleted_cache is None:
            import ray

            self._deleted_cache = ray.get(self._deleted_ref)
        return self._deleted_cache

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return DF_PARTIAL_SCHEMA.empty_table()
        shard = int(group["shard"][0].as_py())
        bucket = int(group["bucket"][0].as_py())
        t = group.sort_by([("key", "ascending"), ("chunk", "ascending")])

        df = t["df"].to_numpy()
        total = int(df.sum())
        row_ends = np.cumsum(df)
        row_starts = row_ends - df

        gaps = codec.vbyte_decode(codec.concat_binary_column(t["docs"]), total)
        docs = codec.segmented_undelta(gaps, row_starts)
        tfs = codec.vbyte_decode(codec.concat_binary_column(t["tfs"]), total) + np.uint64(1)

        dls_len = pa.compute.binary_length(t["dls"]).to_numpy()
        scored_rows = dls_len > 0
        dl_full = np.zeros(total, dtype=np.uint64)
        if scored_rows.any():
            dl_vals = codec.vbyte_decode(
                codec.concat_binary_column(t["dls"].filter(pa.array(scored_rows)))
            ) + np.uint64(1)
            slots = _posting_index_ranges(row_starts[scored_rows], df[scored_rows])
            dl_full[slots] = dl_vals

        # final groups: consecutive rows with equal (key, chunk)
        keys = np.asarray(t["key"].to_pandas(), dtype=object)
        chunks = t["chunk"].to_numpy()
        row_boundary = np.empty(len(keys), dtype=bool)
        row_boundary[0] = True
        if len(keys) > 1:
            row_boundary[1:] = (keys[1:] != keys[:-1]) | (chunks[1:] != chunks[:-1])
        row_gid = np.cumsum(row_boundary) - 1
        ngroups = int(row_gid[-1]) + 1
        posting_gid = np.repeat(row_gid, df)

        order = np.lexsort((docs, posting_gid))
        docs = docs[order]
        tfs = tfs[order]
        dl_full = dl_full[order]

        g_first_row = np.flatnonzero(row_boundary)
        g_sizes = np.bincount(row_gid, weights=df).astype(np.int64)
        deleted = self._deleted()
        if deleted is not None and deleted.size:
            # purge tombstoned postings: one searchsorted membership
            # mask over the sorted doc array, then per-group sizes
            # recounted and emptied groups dropped (their terms vanish
            # from the dictionary and from the df partials below, so
            # global term stats come out purge-exact automatically)
            didx = np.searchsorted(deleted, docs)
            didx[didx == deleted.size] = 0
            keep = deleted[didx] != docs
            if not keep.all():
                pg = posting_gid[order][keep]
                docs, tfs, dl_full = docs[keep], tfs[keep], dl_full[keep]
                g_sizes = np.bincount(pg, minlength=ngroups).astype(np.int64)
                live = g_sizes > 0
                g_first_row = g_first_row[live]
                g_sizes = g_sizes[live]
                ngroups = int(live.sum())
                if ngroups == 0:
                    return DF_PARTIAL_SCHEMA.empty_table()
        g_ends = np.cumsum(g_sizes)
        g_starts = g_ends - g_sizes
        g_scored = scored_rows[g_first_row]

        doc_payload, doc_nb = codec.vbyte_encode_with_lengths(
            codec.segmented_gaps(docs, g_starts)
        )
        tf_payload, tf_nb = codec.vbyte_encode_with_lengths(tfs - np.uint64(1))
        docs_col = codec.binary_cells_from_lengths(doc_payload, doc_nb, g_starts)
        tfs_col = codec.binary_cells_from_lengths(tf_payload, tf_nb, g_starts)

        # dls: values exist only for scored groups; group start indices
        # into the scored-value array (empty groups collapse)
        scored_counts = np.where(g_scored, g_sizes, 0)
        val_starts = np.concatenate([[0], np.cumsum(scored_counts)])[:-1]
        scored_slots = _posting_index_ranges(g_starts[g_scored], g_sizes[g_scored])
        dl_payload, dl_nb = codec.vbyte_encode_with_lengths(
            dl_full[scored_slots] - np.uint64(1)
        )
        dls_col = codec.binary_cells_from_lengths(dl_payload, dl_nb, val_starts)

        # ---- block-max sidecars -------------------------------------
        B = self.config.block_size
        nblocks = (g_sizes + B - 1) // B
        blk_ends_cum = np.cumsum(nblocks)
        blk_starts_cum = blk_ends_cum - nblocks
        total_blocks = int(blk_ends_cum[-1])
        blk_gid = np.repeat(np.arange(ngroups), nblocks)
        blk_ord = np.arange(total_blocks) - np.repeat(blk_starts_cum, nblocks)
        blk_start = g_starts[blk_gid] + blk_ord * B
        blk_last = np.minimum(blk_start + B, g_ends[blk_gid]) - 1

        blk_last_doc = docs[blk_last]
        blk_maxtf = np.maximum.reduceat(tfs, blk_start) if total_blocks else np.zeros(0, np.uint64)
        blk_mindl = np.minimum.reduceat(dl_full, blk_start) if total_blocks else np.zeros(0, np.uint64)

        bl_payload, bl_nb = codec.vbyte_encode_with_lengths(
            codec.segmented_gaps(blk_last_doc, blk_starts_cum)
        )
        blk_last_col = codec.binary_cells_from_lengths(bl_payload, bl_nb, blk_starts_cum)

        g_blk_scored = g_scored[blk_gid]
        sc_counts = np.where(g_scored, nblocks, 0)
        sc_starts = np.concatenate([[0], np.cumsum(sc_counts)])[:-1]
        mt_payload, mt_nb = codec.vbyte_encode_with_lengths(
            blk_maxtf[g_blk_scored] - np.uint64(1)
        )
        blk_maxtf_col = codec.binary_cells_from_lengths(mt_payload, mt_nb, sc_starts)
        md_payload, md_nb = codec.vbyte_encode_with_lengths(
            blk_mindl[g_blk_scored] - np.uint64(1)
        )
        blk_mindl_col = codec.binary_cells_from_lengths(md_payload, md_nb, sc_starts)

        out = pa.table(
            {
                "key": pa.compute.cast(pa.array(keys[g_first_row].astype("U")), pa.large_string()),
                "chunk": pa.array(chunks[g_first_row], type=pa.int64()),
                "df": pa.array(g_sizes, type=pa.int64()),
                "docs": docs_col,
                "tfs": tfs_col,
                "dls": dls_col,
                "blk_last": blk_last_col,
                "blk_maxtf": blk_maxtf_col,
                "blk_mindl": blk_mindl_col,
            }
        )
        shard_dir = os.path.join(self.postings_dir, f"shard={shard}")
        os.makedirs(shard_dir, exist_ok=True)
        path = os.path.join(shard_dir, f"bucket-{bucket:05d}.parquet")
        atomic_write_parquet(out, path, compression="zstd")
        # bucket manifest as an atomic json sidecar — the driver globs
        # these after the pipeline instead of shipping rows through it
        import json

        sidecar = {
            "shard": shard,
            "bucket": bucket,
            "path": path,
            "rows": int(ngroups),
            "n_postings": int(docs.size),
        }
        tmp = path + ".manifest.json.tmp"
        with open(tmp, "w") as f:
            json.dump(sidecar, f)
        os.replace(tmp, path + ".manifest.json")

        # return per-key df partials (summed over this bucket's chunks)
        # so global term stats continue IN THE SAME streaming pipeline
        # (groupby("key").sum("df")) with no second job / postings
        # re-read
        key_arr = keys[g_first_row]
        kb = np.empty(len(key_arr), dtype=bool)
        kb[0] = True
        if len(key_arr) > 1:
            kb[1:] = key_arr[1:] != key_arr[:-1]
        kstarts = np.flatnonzero(kb)
        df_per_key = np.add.reduceat(g_sizes, kstarts)
        return pa.table(
            {
                "key": pa.compute.cast(
                    pa.array(key_arr[kstarts].astype("U")), pa.large_string()
                ),
                "df": pa.array(df_per_key, type=pa.int64()),
            }
        )
