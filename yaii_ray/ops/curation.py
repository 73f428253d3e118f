"""Corpus-curation operators for training-data pipelines: PII
redaction, deterministic hash sampling / source mixing, and
fixed-budget sequence packing.

No reference-repo analogue (gpicron/yaii is a query engine); these are
the standard curation stages a 100 TB pretraining pipeline runs next
to dedup/decontam, built Ray-Data-first:

- :func:`redact_pii_batch` — vectorized regex scrubbing (RE2 kernels,
  ``pc.replace_substring_regex``); pure map stage, no shuffle.
- :func:`sample_hash` — deterministic md5-threshold sampling with
  optional per-stratum rates (data mixing). Pure map-side filter: the
  keep/drop decision is a pure function of (seed, id), so any worker,
  any retry, any cluster size selects the same rows — no RNG state,
  no shuffle, resumable by construction.
- :func:`pack_sequences` — greedy first-fit packing of docs into
  fixed-budget training sequences within doc-id ranges. Packing is
  inherently sequential, so the op makes the sequential DOMAIN
  explicit: ids are bucketed into ``range_size`` spans, each span
  packs independently in one grouped task (ONE groupby shuffle), and
  sequence ids are (domain, local seq) pairs — deterministic and
  embarrassingly parallel across domains at any scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement) applied IN ORDER — email first (its local
# part may contain digits a later pass would mangle), then dashed
# phones, then dotted IPv4. All RE2-compatible: the same pattern
# strings run under DuckDB's regexp_replace(..., 'g') in the oracle.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii_batch(
    batch: pa.Table, col: str = "text", out_col: str | None = None
) -> pa.Table:
    """Replace emails / dashed phone numbers / IPv4 literals with
    typed placeholders. One vectorized RE2 pass per pattern over the
    whole batch; writes ``out_col`` (default: replaces ``col``)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.fill_null(arr, "")
    for pat, rep in PII_PATTERNS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    name = out_col or col
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, s)
    return batch.append_column(name, s)


def _hex_threshold(rate: float) -> str:
    """8-hex-digit keep threshold for ``sample_hash``. Fixed-width
    lowercase hex compares lexicographically == numerically, which is
    what the SQL twin does (``substr(md5(..),1,8) < '..'``); rate>=1
    returns 'g' (> every hex digit, keeps all rows)."""
    if rate >= 1.0:
        return "g"
    return format(max(0, int(rate * (1 << 32))), "08x")


def sample_hash_batch(
    batch: pa.Table,
    rate: float | None = None,
    rates: dict[str, float] | None = None,
    id_col: str = "doc_id",
    strata_col: str = "source",
    seed: str = "",
) -> pa.Table:
    """Keep rows where ``md5(seed || str(id))[:8] < threshold(rate)``
    — the row's rate is ``rates[stratum]`` when ``rates`` is given
    (missing strata drop), else the global ``rate``. md5 is the
    deliberate oracle contract (DuckDB ``md5()``), per-value like
    :func:`yaii_ray.ops.textstats.fingerprint_batch`."""
    # the md5 itself is per-value by contract; everything around it is
    # numpy (no Arrow to_pylist, vectorized threshold compare — ADVICE r4)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    sb = seed.encode("utf-8")
    md5 = hashlib.md5
    hexes = np.fromiter(
        (md5(sb + str(i).encode("utf-8")).hexdigest()[:8] for i in ids.tolist()),
        dtype="U8",
        count=ids.size,
    )
    if rates is not None:
        strata = pd.Series(batch[strata_col].to_numpy(zero_copy_only=False))
        thr = {k: _hex_threshold(v) for k, v in rates.items()}
        thr_arr = strata.map(thr).fillna("0").to_numpy(dtype="U8")
        keep = hexes < thr_arr
    else:
        keep = hexes < _hex_threshold(rate if rate is not None else 1.0)
    return batch.filter(pa.array(keep))


def sample_hash(
    ds,
    rate: float | None = None,
    rates: dict[str, float] | None = None,
    id_col: str = "doc_id",
    strata_col: str = "source",
    seed: str = "",
):
    """Dataset wrapper for :func:`sample_hash_batch` — a lazy map-side
    filter (the per-stratum ``rates`` dict ships in the task closure;
    it is stratum-count-sized, never data-sized)."""
    return ds.map_batches(
        lambda b: sample_hash_batch(
            b, rate=rate, rates=rates, id_col=id_col,
            strata_col=strata_col, seed=seed,
        ),
        batch_format="pyarrow",
    )


def greedy_pack(ns: np.ndarray, budget: int) -> np.ndarray:
    """First-fit sequence ids for sizes ``ns`` in order: break before
    item i iff the running total is non-empty and would exceed
    ``budget`` with it; an oversized item sits alone. Pure — the
    sequential core of :func:`pack_sequences`, property-tested in
    isolation."""
    seq = np.empty(len(ns), dtype=np.int64)
    running, s = 0, 0
    for i, n in enumerate(ns):
        if running > 0 and running + n > budget:
            s += 1
            running = 0
        seq[i] = s
        running += int(n)
    return seq


def pack_sequences(
    ds,
    budget: int,
    range_size: int = 1000,
    id_col: str = "doc_id",
    n_col: str = "n_chars",
    final_partitions: int = 1,
):
    """Assign each doc a training-sequence id by greedy first-fit in
    id order: a doc opens a new sequence when adding it would push the
    running ``n_col`` total past ``budget`` (an oversized doc sits
    alone in its own sequence). Returns (id_col, dom, seq) — the
    global sequence key is the (dom, seq) pair.

    Partitioning assumption, explicit: packing is sequential WITHIN a
    ``range_size`` span of ids (``dom = id // range_size``) and
    independent ACROSS spans, so one groupby shuffle fans the spans
    out and each grouped task runs the O(range_size) greedy loop —
    the only non-vectorized loop here, inherent to first-fit's
    running-total dependency.

    ``final_partitions`` sizes the groupby's reduce side (the shuffle
    makes one reduce partition per input block; blocks > populated dom
    groups emits schema-less empty RefBundles — the documented Ray
    hazard, same mitigation as ``dedup_exact``). The default 1 suits
    gate-scale corpora; scale callers raise it toward their populated
    dom count for a parallel reduce."""
    rs = int(range_size)

    def add_dom(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                "__n": pa.array(
                    t[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "dom": pa.array(ids // rs),
            }
        )

    def pack(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        ns = g["__n"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, ns = ids[order], ns[order]
        seq = greedy_pack(ns, budget)
        return pa.table(
            {
                id_col: pa.array(ids),
                "dom": pa.array(np.full(ids.size, g["dom"][0].as_py(), dtype=np.int64)),
                "seq": pa.array(seq),
            }
        )

    return (
        ds.map_batches(add_dom, batch_format="pyarrow")
        .repartition(max(1, int(final_partitions)))
        .groupby("dom")
        .map_groups(pack, batch_format="pyarrow")
    )
