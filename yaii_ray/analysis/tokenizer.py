"""Text analyzers — behavior-parity with the reference's analyzer chain.

Reference behaviors reproduced (observable semantics, not code):
- standard tokenizer: ``trim().toLowerCase().split(/[\\s\\-,;:.]+/)``
  (reference ``src/lib/analyzer/standard-tokenizer.ts:4-21``). Note the
  JS split keeps empty strings produced at the edges (e.g. ``"-a"`` →
  ``["", "a"]``); so do we.
- stopword filter: drops the reference's hard-coded English stopword
  list *including the empty string* (reference
  ``src/lib/analyzer/stopwords-filter.ts:4-138``). The word list below
  is copied verbatim because it is observable behavior
  (``test/system/test-index.ts:303-307`` relies on "about" being
  dropped from the ``_all`` field).

All hot-path entry points are vectorized over Arrow arrays
(``pyarrow.compute`` kernels); the scalar versions exist for tests and
for the exact-BM25 oracle.

Known divergence: Arrow's ``utf8_lower`` applies SIMPLE unicode case
mapping while Python/JS apply FULL mapping — they differ only for a
handful of codepoints whose lowercase expands (e.g. ``İ`` U+0130 →
``i̇``). Transcript corpora are unaffected; exotic-codepoint inputs
should be normalized upstream if bit-parity matters there.
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Same separator class as the reference tokenizer (`/[\s\-,;:.]+/` in
# JS). \s differs between regex engines (Python's includes U+0085,
# RE2's is ASCII-only, JS's includes NBSP etc), so the JS WhiteSpace +
# LineTerminator set is spelled out explicitly — the scalar (re) and
# vectorized (Arrow/RE2) paths then agree by construction and match
# the reference's engine.
JS_WHITESPACE = (
    "\t\n\v\f\r \u00a0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000\ufeff"
)
SEPARATOR_PATTERN = "[" + JS_WHITESPACE + r"\-,;:.]+"
_SEPARATOR_RE = re.compile(SEPARATOR_PATTERN)

# Verbatim from reference src/lib/analyzer/stopwords-filter.ts:4-125
# (119 words + the empty string). Observable behavior — do not edit.
STOPWORDS = frozenset(
    [
        "", "a", "able", "about", "across", "after", "all", "almost",
        "also", "am", "among", "an", "and", "any", "are", "as", "at",
        "be", "because", "been", "but", "by", "can", "cannot", "could",
        "dear", "did", "do", "does", "either", "else", "ever", "every",
        "for", "from", "get", "got", "had", "has", "have", "he", "her",
        "hers", "him", "his", "how", "however", "i", "if", "in", "into",
        "is", "it", "its", "just", "least", "let", "like", "likely",
        "may", "me", "might", "most", "must", "my", "neither", "no",
        "nor", "not", "of", "off", "often", "on", "only", "or", "other",
        "our", "own", "rather", "said", "say", "says", "she", "should",
        "since", "so", "some", "than", "that", "the", "their", "them",
        "then", "there", "these", "they", "this", "tis", "to", "too",
        "twas", "us", "wants", "was", "we", "were", "what", "when",
        "where", "which", "while", "who", "whom", "why", "will", "with",
        "would", "yet", "you", "your",
    ]
)


def tokenize_string(text: str, stopwords: bool = False) -> list[str]:
    """Scalar standard tokenizer (oracle / test path).

    Matches the reference byte-for-byte: trim, lowercase, regex split.
    With ``stopwords=True`` also applies the stopword filter (this is
    the analyzer of the ``_all`` field and of BM25 ``text`` fields).
    """
    toks = _SEPARATOR_RE.split(text.strip(JS_WHITESPACE).lower())
    if stopwords:
        toks = [t for t in toks if t not in STOPWORDS]
    return toks


def tokenize_strings(
    arr: pa.Array | pa.ChunkedArray, stopwords: bool = False
) -> pa.ListArray:
    """Vectorized standard tokenizer: string array → list<string> array.

    Pure Arrow kernels — zero-copy in, one allocation out. Nulls map to
    empty token lists.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    filled = pc.fill_null(arr, "")
    lowered = pc.utf8_lower(pc.utf8_trim(filled, characters=JS_WHITESPACE))
    tokens = _split_separators(lowered)
    if stopwords:
        flat = tokens.flatten()
        keep = pc.invert(pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS))))
        # Rebuild the list array with the filtered flat values: compute
        # new offsets as the cumulative count of kept tokens per row.
        keep_np = keep.to_numpy(zero_copy_only=False)
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        kept_cum = np.concatenate([[0], np.cumsum(keep_np)])
        new_offsets = kept_cum[offsets - offsets[0]]
        new_flat = flat.filter(keep)
        tokens = pa.ListArray.from_arrays(
            pa.array(new_offsets, type=pa.int32()), new_flat
        )
    return tokens


# ASCII members of the separator class, as a byte-translation table
# mapping them all to ' ' (the RE2 class split is ~5x slower than a
# literal split — measured in this sandbox — so pure-ASCII batches
# take the translate+collapse+literal-split path below)
_ASCII_SEPS = b"\t\n\v\f\r -,;:."
_TRANSLATE = np.arange(256, dtype=np.uint8)
_TRANSLATE[list(_ASCII_SEPS)] = 0x20


def _split_separators(low: pa.Array) -> pa.ListArray:
    """Split on the separator class. Fast path for pure-ASCII batches:
    translate separator bytes to ' ', collapse runs (JS ``[..]+``
    semantics: interior runs merge, edge separators still yield the
    edge empty token), then one literal split. Any non-ASCII byte in
    the batch falls back to the RE2 class split — bit-identical output
    either way (guarded by tests/test_property.py equivalence)."""
    bufs = low.buffers()
    raw_off = np.frombuffer(bufs[1], dtype=np.int32)[
        low.offset : low.offset + len(low) + 1
    ]
    base = raw_off[0] if raw_off.size else 0
    offsets = (raw_off - base).astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)[base : raw_off[-1]]
        if bufs[2] is not None and raw_off.size
        else np.zeros(0, np.uint8)
    )
    if data.size == 0 or (data >= 0x80).any():
        return pc.split_pattern_regex(low, SEPARATOR_PATTERN)
    tdata = _TRANSLATE[data]
    is_sp = tdata == 0x20
    prev_sp = np.empty_like(is_sp)
    prev_sp[0] = False
    prev_sp[1:] = is_sp[:-1]
    # a space opening a string is never "preceded" by one (starts of
    # trailing empty strings can equal the data length — clip those)
    starts = offsets[:-1]
    prev_sp[starts[starts < prev_sp.size]] = False
    keep = ~(is_sp & prev_sp)
    new_data = tdata[keep]
    # new offsets via per-string dropped-byte counts (dropped bytes are
    # few, so this beats a full cumsum over the data by ~10x)
    drop_idx = np.flatnonzero(~keep)
    seg = np.searchsorted(offsets[1:], drop_idx, side="right")
    seg_drop = np.bincount(seg, minlength=len(low)) if drop_idx.size else np.zeros(len(low), np.int64)
    new_lens = np.diff(offsets) - seg_drop
    new_offsets = np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int32)
    collapsed = pa.Array.from_buffers(
        pa.utf8(),
        len(low),
        # numpy arrays expose the buffer protocol — zero-copy wrap
        [None, pa.py_buffer(new_offsets), pa.py_buffer(new_data)],
    )
    return pc.split_pattern(collapsed, " ")


def keyword_tokens(arr: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    """Keyword analyzer: whole value = single token; nulls → no token."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    offsets = np.concatenate([[0], np.cumsum(valid)]).astype(np.int32)
    flat = arr.drop_null()
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), flat)


AnalyzerFn = Callable[[pa.Array], pa.ListArray]

_REGISTRY: dict[str, AnalyzerFn] = {
    "standard": lambda a: tokenize_strings(a, stopwords=False),
    "standard_stop": lambda a: tokenize_strings(a, stopwords=True),
    "keyword": keyword_tokens,
}


def make_regex_rules_analyzer(
    rules: list[tuple[str, str]], lowercase: set[str] | None = None
) -> AnalyzerFn:
    """moo-style rule lexer (reference ``moo-tokenizer.ts:6-22``; usage
    ``performance-ssb.ts:109-115``): an ordered list of (name, pattern)
    rules compiled into one alternation; each match emits its text as a
    token, lowercased when the rule name is in ``lowercase``. Rules
    named '_' (or matching nothing useful, e.g. whitespace) are
    dropped. Register the result with :func:`register_analyzer` and
    reference it from a FieldConfig — it runs inside the tokenize
    map_batches stage like any built-in analyzer.

    Python-regex per value (custom lexers are an extension point, not
    the bulk path — the bulk path is the Arrow-kernel standard
    analyzer).
    """
    pattern = re.compile(
        "|".join(f"(?P<{name}>{pat})" for name, pat in rules)
    )
    lower = lowercase or set()

    def analyze(arr: pa.Array) -> pa.ListArray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        tokens: list[str] = []
        offsets = [0]
        for v in pc.fill_null(arr, "").to_pylist():
            for m in pattern.finditer(v):
                name = m.lastgroup
                if name == "_":
                    continue
                tok = m.group(0)
                tokens.append(tok.lower() if name in lower else tok)
            offsets.append(len(tokens))
        return pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(tokens, type=pa.string())
        )

    return analyze


def register_analyzer(name: str, fn: AnalyzerFn) -> None:
    """User-extension surface (reference ``src/lib/api/config.ts:27``):
    a custom analyzer is a callable string-array → list<string>-array,
    applied inside the tokenize ``map_batches`` stage."""
    _REGISTRY[name] = fn


def get_analyzer(name: str) -> AnalyzerFn:
    return _REGISTRY[name]


def analyzer_from_spec(spec: dict) -> AnalyzerFn:
    """Build an analyzer from a JSON-able spec — the form that travels
    inside IndexConfig to build workers (a bare Python callable
    registered on the driver would not exist in worker processes).

    Specs: ``{"type": "regex_rules", "rules": [[name, pattern], ...],
    "lowercase": [rule names]}``.
    """
    if spec["type"] == "regex_rules":
        return make_regex_rules_analyzer(
            [tuple(r) for r in spec["rules"]], set(spec.get("lowercase", []))
        )
    raise ValueError(f"unknown analyzer spec type {spec['type']!r}")


def ensure_analyzers(specs: dict[str, dict]) -> None:
    """Register config-carried analyzer specs in this process (no-op
    for already-registered names). Called by build/query stages on
    entry so worker processes agree with the driver."""
    for name, spec in specs.items():
        if name not in _REGISTRY:
            _REGISTRY[name] = analyzer_from_spec(spec)
