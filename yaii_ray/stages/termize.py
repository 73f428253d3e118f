"""Tokenize + termize a batch of docs into partial posting groups.

This is the vectorized heart of the build pipeline — the Ray-native
re-expression of the reference's per-doc posting upsert loop
(``MutableSegment.add``, reference
``src/lib/internal/segments/mutable-segment.ts:54-153``): instead of
mutating a hash map one doc at a time, each task turns its whole batch
into **already partially-aggregated** posting groups

    (key = field \\x1e term, chunk = doc_id >> chunk_shift)
        -> sorted doc_ids, tfs, dls   (delta + VByte encoded)

so the term-keyed shuffle that follows moves compressed partial
aggregates, not raw (term, doc) pairs. ``chunk`` doubles as the *salt*
of the salted partial aggregation the north rule requires: a
stopword-frequency hot term is split into one group per doc-range
chunk, which bounds every shuffle group's size no matter how skewed
the term distribution is.

Everything here is numpy / pyarrow vectorized — no per-row or
per-group Python in the hot path. Term frequencies fall out of the
``np.unique`` on (term_code << 32 | local_doc) pairs; per-doc field
lengths (``dl``) fall out of the token-list offsets. Both are the BM25
statistics yaii lacks (SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from yaii_ray import codec
from yaii_ray.analysis import terms as terms_mod
from yaii_ray.analysis.tokenizer import get_analyzer
from yaii_ray.config import (
    FIELD_ALL,
    FIELD_PRESENCE,
    KIND_BOOL,
    KIND_KEYWORD,
    KIND_NUMBER,
    KIND_TEXT,
    Flags,
    IndexConfig,
)

KEY_SEP = "\x1e"  # same separator as the reference's LevelDB keys
                  # (immutable-segment.ts:76)

_DIGITS = np.array(list(terms_mod.ENCODING_DIGITS))
_SHIFT = np.int64(terms_mod.NUMBER_SHIFT)

PARTIAL_SCHEMA = pa.schema(
    [
        ("key", pa.large_string()),
        ("chunk", pa.int64()),
        ("df", pa.int64()),
        ("docs", pa.large_binary()),
        ("tfs", pa.large_binary()),
        ("dls", pa.large_binary()),
    ]
)


_DIGIT_BYTES = np.frombuffer(terms_mod.ENCODING_DIGITS.encode(), dtype=np.uint8)


def _number_terms_vectorized(values: np.ndarray) -> tuple[pa.Array, np.ndarray]:
    """int64 values -> (flat_terms StringArray, counts=2 per value):
    the L0 digit term and the full-precision L8 prefix term.

    Only L0 + L8 of the reference's 9 trie levels are indexed: equality
    is L0 AND L8 (reference query-ir.ts:177-189) and our range scans
    operate on the lexicographically ordered L8 dictionary
    (analysis/terms.py), so levels L1..L7 — which only served the
    reference's test-skipped trie range decomposition — would be dead
    index weight. ``number_to_terms`` keeps full 9-term parity for the
    golden unit vectors.

    Term strings are assembled as a fixed-width byte matrix viewed as
    |S dtype (no per-level np.char.add string reallocation).
    """
    n = values + _SHIFT
    size = values.size
    # L0: '1' + digit  (2 ASCII chars)
    l0 = np.empty((size, 2), dtype=np.uint8)
    l0[:, 0] = ord("1")
    l0[:, 1] = _DIGIT_BYTES[(n & 63).astype(np.int64)]
    # L8: '2' + 8 big-endian digits of n >> 6  (9 ASCII chars)
    hi = (n >> 6).astype(np.int64)
    l8 = np.empty((size, 9), dtype=np.uint8)
    l8[:, 0] = ord("2")
    for k in range(8):
        l8[:, 1 + k] = _DIGIT_BYTES[(hi >> (6 * (7 - k))) & 63]
    flat = np.empty(size * 2, dtype="S9")
    flat[0::2] = l0.view("S2").ravel()
    flat[1::2] = l8.view("S9").ravel()
    arr = pa.array(flat)  # -> binary; cast to utf8 (pure ASCII)
    return arr.cast(pa.string()), np.full(size, 2, dtype=np.int64)


def _prefix0(arr: pa.Array) -> pa.Array:
    """Prepend the string-term type prefix '0' (scalar broadcast — no
    per-token Python objects)."""
    return pa.compute.binary_join_element_wise(
        pa.scalar("0", type=pa.string()), arr, pa.scalar("", type=pa.string())
    )


def _column_tokens(
    col: pa.ChunkedArray | pa.Array, kind: str, analyzer_name: str
) -> tuple[pa.Array, np.ndarray, np.ndarray | None]:
    """column -> (flat prefixed-term strings, per-doc counts, per-doc dl).

    dl (field length, number of tokens the analyzer kept) is returned
    for KIND_TEXT only; other kinds aren't BM25-scored.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    # value-type routing for default-configured fields (reference
    # valueTermizer, base-inverted-index.ts:170-218): a non-string
    # column under the default TEXT config is termized by its type
    def _is_str_list(t: pa.DataType) -> bool:
        return (pa.types.is_list(t) or pa.types.is_large_list(t)) and (
            pa.types.is_string(t.value_type) or pa.types.is_large_string(t.value_type)
        )

    if kind == KIND_TEXT and not (
        pa.types.is_string(col.type)
        or pa.types.is_large_string(col.type)
        or _is_str_list(col.type)
    ):
        if pa.types.is_boolean(col.type):
            kind = KIND_BOOL
        elif (
            pa.types.is_integer(col.type)
            or pa.types.is_floating(col.type)
            or pa.types.is_timestamp(col.type)
        ):
            kind = KIND_NUMBER
        else:
            kind = KIND_KEYWORD
    if kind in (KIND_TEXT, KIND_NUMBER, KIND_BOOL) and (
        pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
    ):
        # multi-value field (flattened list<struct> path, e.g.
        # "turns.text"/"turns.idx"): termize the flat values once via
        # recursion, then roll per-value term counts up to per-doc
        # counts — a doc's values are consecutive, so dl is the
        # per-doc sum (reference merges array-of-objects per path,
        # utils.ts:75-103, then termizes each element)
        raw_off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_off = raw_off - raw_off[0]
        # slice .values by the raw offsets (NOT .flatten(), which drops
        # null slots and would misalign the per-doc rollup)
        values = col.values.slice(raw_off[0], raw_off[-1] - raw_off[0])
        flat, per_val, dl_val = _column_tokens(values, kind, analyzer_name)
        cum = np.concatenate([[0], np.cumsum(per_val, dtype=np.int64)])
        counts = cum[doc_off[1:]] - cum[doc_off[:-1]]
        if dl_val is not None:
            dcum = np.concatenate([[0], np.cumsum(dl_val, dtype=np.int64)])
            dl = dcum[doc_off[1:]] - dcum[doc_off[:-1]]
        else:
            dl = None
        return flat, counts, dl
    if kind == KIND_TEXT:
        toks = get_analyzer(analyzer_name)(col)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets - offsets[0])
        return _prefix0(toks.values), counts, counts
    if kind == KIND_KEYWORD:
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            counts = np.diff(offsets - offsets[0])
            values = col.values
        else:
            valid = pa.compute.is_valid(col).to_numpy(zero_copy_only=False)
            counts = valid.astype(np.int64)
            values = col.drop_null()
        return _prefix0(pa.compute.cast(values, pa.string())), counts, None
    if kind == KIND_NUMBER:
        if pa.types.is_timestamp(col.type):
            col = pa.compute.cast(col, pa.int64())
        elif pa.types.is_floating(col.type):
            col = pa.compute.cast(pa.compute.floor(col), pa.int64())
        valid = pa.compute.is_valid(col).to_numpy(zero_copy_only=False)
        vals = col.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        # unsafe integers (|v| > 2^53-1) are dropped, like the
        # reference's flatten does at indexing (utils.ts:111-116)
        safe = np.abs(vals) <= terms_mod.MAX_SAFE_INTEGER
        counts = np.zeros(n, dtype=np.int64)
        if not safe.all():
            idx = np.flatnonzero(valid)
            valid = valid.copy()
            valid[idx[~safe]] = False
            vals = vals[safe]
        flat, per_val = _number_terms_vectorized(vals)
        counts[valid] = per_val
        return flat, counts, None
    if kind == KIND_BOOL:
        valid = pa.compute.is_valid(col).to_numpy(zero_copy_only=False)
        vals = col.drop_null().to_numpy(zero_copy_only=False)
        flat_np = np.where(vals, terms_mod.TERM_TRUE, terms_mod.TERM_FALSE)
        return pa.array(flat_np, type=pa.string()), valid.astype(np.int64), None
    raise ValueError(f"unknown field kind {kind!r}")


def _groups_from_pairs(
    field: str,
    term_dict: np.ndarray,
    codes: np.ndarray,
    local_docs: np.ndarray,
    tfs: np.ndarray,
    doc_ids: np.ndarray,
    dl_per_doc: np.ndarray | None,
    chunk_shift: int,
) -> pa.Table | None:
    """(term_code, local_doc, tf) triples -> one partial-posting row per
    (key, chunk) group, binaries encoded in bulk."""
    if codes.size == 0:
        return None
    docs = doc_ids[local_docs]
    chunks = (docs >> np.uint64(chunk_shift)).astype(np.int64)
    # pairs arrive sorted by (code, doc) => chunk is non-decreasing
    # within a code run; group boundary = code or chunk change.
    boundary = np.empty(codes.size, dtype=bool)
    boundary[0] = True
    boundary[1:] = (codes[1:] != codes[:-1]) | (chunks[1:] != chunks[:-1])
    starts = np.flatnonzero(boundary)
    df = np.diff(np.concatenate([starts, [codes.size]]))

    doc_payload, doc_nb = codec.vbyte_encode_with_lengths(
        codec.segmented_gaps(docs, starts)
    )
    tf_payload, tf_nb = codec.vbyte_encode_with_lengths(tfs.astype(np.uint64) - 1)
    docs_col = codec.binary_cells_from_lengths(doc_payload, doc_nb, starts)
    tfs_col = codec.binary_cells_from_lengths(tf_payload, tf_nb, starts)
    if dl_per_doc is not None:
        dls = dl_per_doc[local_docs].astype(np.uint64)
        dl_payload, dl_nb = codec.vbyte_encode_with_lengths(dls - 1)
        dls_col = codec.binary_cells_from_lengths(dl_payload, dl_nb, starts)
    else:
        empty_offsets = np.zeros(starts.size + 1, dtype=np.int64)
        dls_col = pa.Array.from_buffers(
            pa.large_binary(),
            starts.size,
            [None, pa.py_buffer(empty_offsets.tobytes()), pa.py_buffer(b"")],
        )

    group_terms = term_dict[codes[starts]]
    keys = np.char.add(field + KEY_SEP, group_terms.astype("U"))
    return pa.table(
        {
            "key": pa.compute.cast(pa.array(keys), pa.large_string()),
            "chunk": pa.array(chunks[starts], type=pa.int64()),
            "df": pa.array(df, type=pa.int64()),
            "docs": docs_col,
            "tfs": tfs_col,
            "dls": dls_col,
        }
    )


def _pairs_from_tokens(
    flat_terms: pa.Array, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(flat term strings, per-doc counts) -> unique (code, local_doc,
    tf) triples sorted by (code, doc) + the code->term dictionary."""
    enc = pa.compute.dictionary_encode(flat_terms.combine_chunks() if isinstance(flat_terms, pa.ChunkedArray) else flat_terms)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    term_dict = np.asarray(enc.dictionary.to_pandas(), dtype=object)
    doc_rep = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    pair = (codes << 32) | doc_rep
    uniq, tf = np.unique(pair, return_counts=True)
    return (uniq >> 32), (uniq & 0xFFFFFFFF), tf, term_dict


def extract_postings(
    table: pa.Table, doc_ids: np.ndarray, config: IndexConfig
) -> tuple[pa.Table, dict[str, np.ndarray]]:
    """One doc batch -> (partial posting-group table, per-doc dl columns).

    Emits, per the reference's indexing semantics:
    - per searchable field: (field, term) postings with tf
      (mutable-segment.ts:103-122, + tf per SURVEY.md §2.11),
    - field-presence postings under ``_field``
      (mutable-segment.ts:126-139),
    - the ``_all`` catch-all field from ``add_to_all`` fields analyzed
      with the stopword analyzer (base-inverted-index.ts:133-161).
    """
    n = table.num_rows
    parts: list[pa.Table] = []
    dl_cols: dict[str, np.ndarray] = {}
    all_flat: list[pa.Array] = []
    all_docrep: list[np.ndarray] = []

    for name in table.column_names:
        fc = config.resolve(name)
        if fc.flags & Flags.IGNORED or not (fc.flags & Flags.SEARCHABLE):
            continue
        col = table[name]
        flat, counts, dl = _column_tokens(col, fc.kind, fc.analyzer)
        if fc.scored and dl is not None:
            dl_cols[name] = dl
        codes, local, tf, tdict = _pairs_from_tokens(flat, counts)
        part = _groups_from_pairs(
            name, tdict, codes, local, tf, doc_ids,
            dl if fc.scored else None, config.chunk_shift,
        )
        if part is not None:
            parts.append(part)

        # presence postings: one term per field, docs where field set
        valid = pa.compute.is_valid(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ).to_numpy(zero_copy_only=False)
        pres_local = np.flatnonzero(valid).astype(np.int64)
        if pres_local.size:
            pres = _groups_from_pairs(
                FIELD_PRESENCE,
                np.asarray(["0" + name], dtype=object),
                np.zeros(pres_local.size, dtype=np.int64),
                pres_local,
                np.ones(pres_local.size, dtype=np.int64),
                doc_ids,
                None,
                config.chunk_shift,
            )
            if pres is not None:
                parts.append(pres)

        # collect raw values for the _all field (re-analyzed below with
        # the _all analyzer, like the reference's allFieldGenerator)
        if config.all_field and fc.add_to_all and fc.kind in (KIND_TEXT, KIND_KEYWORD):
            c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if pa.types.is_list(c.type) or pa.types.is_large_list(c.type):
                offs = c.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
                cnts = np.diff(offs - offs[0])
                vals = c.values
            else:
                cnts = np.ones(n, dtype=np.int64)
                vals = c
            if not (
                pa.types.is_string(vals.type) or pa.types.is_large_string(vals.type)
            ):
                if fc.kind == KIND_TEXT:
                    # default-config value-type routing (same rule as
                    # _column_tokens): a non-string column under the
                    # default TEXT config is a number/bool/keyword
                    # field — it has no text for the _all analyzer
                    continue
                vals = pa.compute.cast(vals, pa.string())
            toks = get_analyzer(config.all_analyzer)(vals)
            toffs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            tcounts = np.diff(toffs - toffs[0])
            value_doc = np.repeat(np.arange(cnts.size, dtype=np.int64), cnts)
            all_docrep.append(np.repeat(value_doc, tcounts))
            all_flat.append(_prefix0(toks.values))

    if config.all_field and all_flat:
        flat = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in all_flat])
        docrep = np.concatenate(all_docrep)
        enc = pa.compute.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tdict = np.asarray(enc.dictionary.to_pandas(), dtype=object)
        pair = (codes << 32) | docrep
        uniq, tf = np.unique(pair, return_counts=True)
        # dl of _all = total tokens contributed per doc
        dl_all = np.bincount(docrep, minlength=n).astype(np.int64)
        part = _groups_from_pairs(
            FIELD_ALL, tdict, uniq >> 32, uniq & 0xFFFFFFFF, tf, doc_ids,
            dl_all if config.all_scored else None, config.chunk_shift,
        )
        if part is not None:
            parts.append(part)
        if config.all_scored:
            dl_cols[FIELD_ALL] = dl_all

    if not parts:
        return PARTIAL_SCHEMA.empty_table(), dl_cols
    return pa.concat_tables(parts), dl_cols
