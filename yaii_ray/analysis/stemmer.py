"""Porter stemmer — the reference's A5 analyzer slot, which upstream
left as an unimplemented TODO (`/root/reference/src/lib/analyzer/
porter-stemmer.ts` is a stub); implemented here from the published
algorithm (M.F. Porter, "An algorithm for suffix stripping", *Program*
14(3), 1980) so stemmed fields are available as an opt-in analyzer.

Faithful to the paper, with the one guard Porter's own reference
implementation adds: words of length <= 2 are returned unchanged.
Within each step the LONGEST listed suffix that matches is the only
rule considered (if its condition fails, the step is a no-op) — the
paper's matching discipline.

Wired into the analyzer registry as ``"porter"`` (standard tokenizer
then stem) and ``"porter_stop"`` (stopword filter then stem); use from
a ``FieldConfig(analyzer="porter")``. :func:`stem_tokens` stems the
UNIQUE tokens of a batch once and broadcasts (token distributions are
heavy-tailed, so this is the vectorization that matters).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V] — the number of vowel->consonant crossings."""
    n = len(stem)
    i = 0
    while i < n and _is_cons(stem, i):
        i += 1
    m = 0
    while True:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            return m
        while i < n and _is_cons(stem, i):
            i += 1
        m += 1


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    n = len(w)
    return (
        n >= 3
        and _is_cons(w, n - 3)
        and not _is_cons(w, n - 2)
        and _is_cons(w, n - 1)
        and w[-1] not in "wxy"
    )


def _longest(w: str, table: list[tuple[str, str]]) -> tuple[str, str] | None:
    """The longest listed suffix that matches ``w`` (tables are given
    longest-first), or None."""
    for suf, rep in table:
        if w.endswith(suf):
            return suf, rep
    return None


_STEP2 = [
    ("ational", "ate"), ("ization", "ize"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("tional", "tion"),
    ("biliti", "ble"), ("entli", "ent"), ("ousli", "ous"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("iviti", "ive"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("ator", "ate"), ("eli", "e"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ion", "ism", "ate", "iti", "ous", "ive", "ize", "al", "er",
    "ic", "ou",
]


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2 or not w.isascii() or not w.isalpha():
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        fired = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    hit = _longest(w, _STEP2)
    if hit is not None:
        suf, rep = hit
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # Step 3
    hit = _longest(w, _STEP3)
    if hit is not None:
        suf, rep = hit
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1 and (
                suf != "ion" or (stem and stem[-1] in "st")
            ):
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def stem_tokens(tokens: pa.ListArray) -> pa.ListArray:
    """Stem every token of a list<string> array: unique tokens stemmed
    once (heavy-tailed distributions make this the cheap direction),
    broadcast back through the inverse index — offsets unchanged."""
    flat = tokens.values
    if len(flat) == 0:
        return tokens
    vals = np.asarray(flat.to_pylist(), dtype=object)
    # null flat slots pass through unstemmed (custom registered
    # analyzers may emit them; the built-in tokenizers never do) and
    # the list-level validity bitmap is preserved
    valid = np.array([v is not None for v in vals], dtype=bool)
    out_vals = vals
    if valid.any():
        uniq, inv = np.unique(vals[valid], return_inverse=True)
        stemmed = np.array([porter_stem(t) for t in uniq], dtype=object)
        out_vals = vals.copy()
        out_vals[valid] = stemmed[inv]
    new_flat = pa.array(out_vals, type=pa.string())
    mask = tokens.is_null() if tokens.null_count else None
    return pa.ListArray.from_arrays(tokens.offsets, new_flat, mask=mask)


def _register() -> None:
    from yaii_ray.analysis.tokenizer import register_analyzer, tokenize_strings

    register_analyzer("porter", lambda a: stem_tokens(tokenize_strings(a)))
    register_analyzer(
        "porter_stop", lambda a: stem_tokens(tokenize_strings(a, stopwords=True))
    )


_register()
