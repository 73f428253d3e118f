"""Text analysis operators for training-data curation.

All vectorized per batch; the engine tokenizer (reference semantics)
is reused so statistics agree with the index.

- :func:`text_stats_batch` — token count, char count, stopword ratio,
  punctuation ratio, mean token length, a composite quality score.
- :func:`lang_id_batch` — n-gram/stopword-hit heuristic language ID
  over small built-in function-word lists (en/fr/de/es) — deterministic,
  no model download.
- :func:`fingerprint_batch` — document fingerprint: md5 of the
  normalized token stream (whitespace-insensitive exact dedup key,
  SQL-reproducible), plus a 64-bit rolling polynomial hash.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from yaii_ray.analysis.tokenizer import STOPWORDS, tokenize_strings

_PUNCT = set(",.;:!?-—'\"()[]{}")
# RE2 class matching _PUNCT one char at a time — the same class the
# SQL twin uses (regexp_extract_all), so counts are bit-identical
_PUNCT_RE = "[,.;:!?\\-—'\"()\\[\\]{}]"

_FUNCTION_WORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "his", "they", "at"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "en", "que", "une", "dans", "pour", "qui", "pas"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "auf", "sich", "auch"},
    "es": {"el", "la", "los", "las", "de", "y", "es", "en", "que", "una", "por", "con", "para", "del"},
}


def text_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append n_tokens / n_chars_text / stopword_ratio / punct_ratio /
    mean_token_len / quality columns (float64, deterministic)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = tokenize_strings(arr, stopwords=False)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    base = offsets[0]
    counts = np.diff(offsets - base)
    flat = toks.values
    flat_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    is_stop = pc.is_in(
        flat, value_set=pa.array(sorted(STOPWORDS))
    ).to_numpy(zero_copy_only=False)
    starts = (offsets - base)[:-1]
    nonzero = counts > 0
    stop_cnt = np.zeros(len(counts), dtype=np.int64)
    len_sum = np.zeros(len(counts), dtype=np.int64)
    if flat_len.size:
        stop_cnt[nonzero] = np.add.reduceat(is_stop.astype(np.int64), starts[nonzero])
        len_sum[nonzero] = np.add.reduceat(flat_len, starts[nonzero])
    # empty-string tokens (JS-split artifacts) count as tokens, like
    # the reference tokenizer emits them
    filled = pc.fill_null(arr, "")
    nchars = pc.utf8_length(filled).to_numpy(zero_copy_only=False).astype(np.int64)
    npunct = (
        pc.count_substring_regex(filled, pattern=_PUNCT_RE)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    safe = np.maximum(counts, 1)
    stop_ratio = stop_cnt / safe
    punct_ratio = npunct / np.maximum(nchars, 1)
    mean_len = len_sum / safe
    # composite quality: in-range length, some stopwords (natural
    # language), low punctuation density — each term in [0, 1]
    len_ok = np.clip(counts, 0, 100) / 100.0
    stop_ok = np.clip(stop_ratio * 3.0, 0.0, 1.0)
    punct_ok = 1.0 - np.clip(punct_ratio * 5.0, 0.0, 1.0)
    quality = (len_ok + stop_ok + punct_ok) / 3.0
    out = batch
    for name, vals in [
        ("n_tokens", counts),
        ("stopword_ratio", stop_ratio),
        ("punct_ratio", punct_ratio),
        ("mean_token_len", mean_len),
        ("quality", quality),
    ]:
        out = out.append_column(
            name,
            pa.array(vals.astype(np.float64) if vals.dtype != np.int64 else vals),
        )
    return out


def lang_id_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``lang_guess``: argmax function-word hit count (ties or
    zero hits -> 'und'). Deterministic heuristic, no external model.

    Fully vectorized (the text_stats_batch pattern): one Arrow regex
    split for the whole batch, one ``pc.is_in`` membership pass per
    language over the flat token array, per-doc sums via
    ``np.add.reduceat`` — no per-row Python. Tokenization parity with
    ``str.split()``: empty tokens from the ``\\s+`` split are never
    function words, so they cannot affect any score."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    langs = sorted(_FUNCTION_WORDS)
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(arr, "")), pattern=r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    base = offsets[0]
    counts = np.diff(offsets - base)
    starts = (offsets - base)[:-1]
    nonzero = counts > 0
    flat = toks.values
    scores = np.zeros((len(batch), len(langs)), dtype=np.int64)
    if len(flat):
        for li, L in enumerate(langs):
            hit = pc.is_in(
                flat, value_set=pa.array(sorted(_FUNCTION_WORDS[L]))
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            scores[nonzero, li] = np.add.reduceat(hit, starts[nonzero])
    best = scores.max(axis=1)
    ties = (scores == best[:, None]).sum(axis=1)
    guesses = np.where(
        (best == 0) | (ties > 1), "und", np.asarray(langs, dtype=object)[scores.argmax(axis=1)]
    )
    return batch.append_column(
        "lang_guess", pa.array(guesses.astype(object), type=pa.string())
    )


# GPT-2-style pre-tokenizer pattern (public; contractions, word
# chunks, number chunks, punctuation runs, whitespace runs). Python's
# re lacks \p classes — \w/\d approximations keep it DuckDB-oracle
# compatible (same pattern string runs under RE2's regexp_extract_all).
BPE_ISH_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``n_bpe_tokens``: count of GPT-2-style pre-tokenizer
    matches — the cheap deterministic stand-in for a real BPE token
    count (no tokenizer model in this container; the split pattern is
    the public GPT-2 regex shape). Fully vectorized: one
    ``pc.count_substring_regex`` pass (RE2 leftmost-first matches the
    Python-``re`` count on this alternation — pinned by
    ``test_bpe_count_matches_python_re``), the same kernel the
    punctuation counter above uses."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    counts = (
        pc.count_substring_regex(pc.fill_null(arr, ""), pattern=BPE_ISH_PATTERN)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return batch.append_column("n_bpe_tokens", pa.array(counts))


def repetition_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append Gopher-style repetition signals (public heuristic from
    Rae et al. 2021 "Scaling Language Models" §A1.1 repetition
    filters, re-derived — no reference-repo analogue):

    - ``dup_word_frac``: 1 - distinct_tokens/total_tokens (0 for empty
      docs) — high for word-soup repetition.
    - ``top_bigram_frac``: occurrences of the most frequent word
      bigram / total bigrams (0 for docs with < 2 tokens) — high for
      boilerplate/templating.

    Tokens are lowercased ``\\s+`` splits with empties dropped (the
    SQL twin's ``list_filter(t, x -> x <> '')``). Fully vectorized:
    one Arrow split + lowercase for the batch, distinct-per-doc via
    one lexsort + boundary reduceat, bigrams via two slices of the
    flat token array joined element-wise — no per-row Python.
    Distinctness is computed over 64-bit token/bigram hashes (pandas
    ``hash_array``, fixed key) — the same no-collision-at-corpus-scale
    assumption the MinHash/Jaccard oracles already rely on."""
    import pandas as pd

    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(arr, "")), pattern=r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    base = offsets[0]
    raw_counts = np.diff(offsets - base)
    ndocs = len(raw_counts)
    flat = toks.values
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    counts = np.zeros(ndocs, dtype=np.int64)
    nz = raw_counts > 0
    if keep.size:
        counts[nz] = np.add.reduceat(
            keep.astype(np.int64), (offsets - base)[:-1][nz]
        )
    flat = flat.filter(pa.array(keep))
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), counts)

    dup_frac = np.zeros(ndocs, dtype=np.float64)
    top_bg_frac = np.zeros(ndocs, dtype=np.float64)
    if len(flat):
        h = pd.util.hash_array(flat.to_numpy(zero_copy_only=False))
        order = np.lexsort((h, doc_idx))
        hs, ds_ = h[order], doc_idx[order]
        new_run = np.r_[True, (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])]
        doc_starts = np.r_[0, np.cumsum(counts)][:-1]
        distinct = np.zeros(ndocs, dtype=np.int64)
        distinct[counts > 0] = np.add.reduceat(
            new_run.astype(np.int64), doc_starts[counts > 0]
        )
        np.divide(
            counts - distinct, counts, out=dup_frac, where=counts > 0
        )

        # bigrams: adjacent filtered tokens within the same doc
        if len(flat) > 1:
            joined = pc.binary_join_element_wise(
                flat.slice(0, len(flat) - 1), flat.slice(1), " "
            )
            same_doc = doc_idx[:-1] == doc_idx[1:]
            bdoc = doc_idx[:-1][same_doc]
            if bdoc.size:
                bh = pd.util.hash_array(
                    joined.filter(pa.array(same_doc)).to_numpy(
                        zero_copy_only=False
                    )
                )
                nb = np.maximum(counts - 1, 0)
                order = np.lexsort((bh, bdoc))
                bhs, bds = bh[order], bdoc[order]
                run_start = np.r_[
                    True, (bds[1:] != bds[:-1]) | (bhs[1:] != bhs[:-1])
                ]
                starts_idx = np.flatnonzero(run_start)
                run_len = np.diff(np.append(starts_idx, bds.size))
                run_doc = bds[starts_idx]
                doc_first_run = np.r_[True, run_doc[1:] != run_doc[:-1]]
                top_per_doc = np.maximum.reduceat(
                    run_len, np.flatnonzero(doc_first_run)
                )
                docs_with_bg = run_doc[doc_first_run]
                top_bg_frac[docs_with_bg] = top_per_doc / nb[docs_with_bg]

    return batch.append_column(
        "dup_word_frac", pa.array(dup_frac)
    ).append_column("top_bigram_frac", pa.array(top_bg_frac))


def token_counts(ds, col: str = "text", final_partitions: int | None = 1):
    """Corpus unigram counts as a Dataset of (token, c): per-batch
    explode to one row per token (lowercased ``\\s+`` splits, empties
    dropped), then the canonical partial-combine grouped aggregate
    (each block shrinks to its distinct tokens before the ONE
    shuffle). ``final_partitions=1`` suits natural-language vocabulary
    sizes; raise it for corpora whose token space is genuinely huge."""
    from yaii_ray.ops.grouped import grouped_aggregate

    def explode(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(arr, "")), pattern=r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"token": flat})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return grouped_aggregate(
        exploded, ["token"], [(None, "count", "c")],
        final_partitions=final_partitions,
    )


def unigram_logprob(
    ds, col: str = "text", id_col: str = "doc_id", alpha: float = 0.5
):
    """CCNet-style LM quality signal (Wenzek et al. 2019 use a real
    5-gram LM; the deterministic stand-in is the corpus's own unigram
    model): append ``bits_per_token`` = mean -log2 p(token) under the
    add-``alpha``-smoothed corpus unigram distribution. High values =
    rare-token soup; low = common-word text. Docs with no tokens
    score 0.

    Two passes over the input (build the model, then score — pass a
    materialized/cheaply-re-readable Dataset): pass 1 is
    :func:`token_counts` (one shuffle, vocab-sized result), whose
    (sorted vocab, logp) arrays broadcast ONCE via ``ray.put``; pass 2
    scores each batch vectorized — one split, one ``np.searchsorted``
    against the broadcast vocab, per-doc means via ``reduceat``."""
    import ray

    counts = token_counts(ds, col).to_pandas()  # vocab-sized by design
    total = float(counts["c"].sum())
    v = float(len(counts))
    vocab_arr = counts["token"].to_numpy(dtype=object)
    order = np.argsort(vocab_arr)
    vocab_sorted = vocab_arr[order].astype(str)
    logp = np.log2(
        (counts["c"].to_numpy(dtype=np.float64)[order] + alpha)
        / (total + alpha * v)
    )
    model_ref = ray.put((vocab_sorted, logp))

    def score(batch: pa.Table) -> pa.Table:
        vocab_s, lp = ray.get(model_ref)
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(arr, "")), pattern=r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        raw_counts = np.diff(offsets - base)
        ndocs = len(raw_counts)
        flat = toks.values
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        counts_d = np.zeros(ndocs, dtype=np.int64)
        nz = raw_counts > 0
        if keep.size:
            counts_d[nz] = np.add.reduceat(
                keep.astype(np.int64), (offsets - base)[:-1][nz]
            )
        flat = flat.filter(pa.array(keep))
        bits = np.zeros(ndocs, dtype=np.float64)
        if len(flat):
            ft = flat.to_numpy(zero_copy_only=False).astype(str)
            # every token is in-vocab (the model was built on this
            # corpus), so searchsorted is an exact lookup
            idx = np.searchsorted(vocab_s, ft)
            tok_bits = -lp[idx]
            starts = np.r_[0, np.cumsum(counts_d)][:-1]
            has = counts_d > 0
            bits[has] = (
                np.add.reduceat(tok_bits, starts[has]) / counts_d[has]
            )
        return batch.append_column("bits_per_token", pa.array(bits))

    return ds.map_batches(score, batch_format="pyarrow")


def fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``fp_md5`` (md5 hex of lowercased whitespace-normalized
    token join — SQL: ``md5(array_to_string(tokens, ' '))``) and
    ``fp_roll`` (64-bit deterministic hash of the same stream —
    pandas hash_array, fixed key)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    norms = [" ".join(t.lower().split()) for t in pc.fill_null(arr, "").to_pylist()]
    md5s = [hashlib.md5(n.encode("utf-8")).hexdigest() for n in norms]
    import pandas as pd

    rolls = pd.util.hash_array(np.asarray(norms, dtype=object)).astype(np.uint64)
    return batch.append_column("fp_md5", pa.array(md5s, type=pa.string())).append_column(
        "fp_roll", pa.array(rolls, type=pa.uint64())
    )
