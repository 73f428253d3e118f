"""Term encoding — type-prefixed term strings, parity with the reference.

A term is a plain string with a 1-char type prefix (reference
``src/lib/internal/query-ir/term-exp.ts:6`` and
``query-ir.ts:21-35``):

- ``"0" + token``            string token
- ``"1".."9" + digits``      number-trie levels L0..L8
- ``"A"`` / ``"B"``          boolean true / false

Numbers are floored, shifted by 2^53 into an unsigned 54-bit space and
split into nine little-endian 6-bit digits over a lexicographically
ordered 64-char alphabet; term L0 is the low digit, terms L1..L8 are
big-endian prefixes of the remaining digits (reference
``query-ir.ts:57-120``; golden vectors ported from
``test/unit/test-query-ir.ts:11-182`` into our unit tests).

The digit alphabet is ASCII-increasing, so the lexicographic order of
L8 terms equals numeric order — our range queries exploit this with a
sorted term-dictionary scan instead of the reference's (buggy,
test.skip'd) trie decomposition (see SURVEY.md §2.5 Q9).
"""

from __future__ import annotations

import math

ENCODING_DIGITS = "+/0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

PREFIX_STRING = "0"
PREFIX_NUMBER_L0 = "1"
PREFIX_NUMBER_L8 = "9"
TERM_TRUE = "A"
TERM_FALSE = "B"

NUMBER_SHIFT = 1 << 53  # maps [-2^53, 2^53) onto [0, 2^54)
MIN_SAFE_INTEGER = -(2**53 - 1)
MAX_SAFE_INTEGER = 2**53 - 1


def string_to_term(token: str) -> str:
    return PREFIX_STRING + token


def bool_to_term(v: bool) -> str:
    return TERM_TRUE if v else TERM_FALSE


def term_to_token(term: str) -> str | bool:
    p = term[0]
    if p == PREFIX_STRING:
        return term[1:]
    if p == TERM_TRUE:
        return True
    if p == TERM_FALSE:
        return False
    raise NotImplementedError(f"term prefix {p!r}")


def _digits(n: int) -> list[int]:
    return [(n >> (6 * k)) & 0x3F for k in range(9)]


def number_to_terms(v: float) -> list[str]:
    """All 9 trie terms for a numeric value (reference query-ir.ts:117-120).

    Non-integer floats are floored — same as the reference's indexing
    path (``src/lib/internal/utils.ts:111-116``).
    """
    n = math.floor(v) + NUMBER_SHIFT
    if not (0 <= n < (1 << 54)):
        raise ValueError(f"number out of safe range: {v}")
    d = _digits(n)
    terms = [PREFIX_NUMBER_L0 + ENCODING_DIGITS[d[0]]]
    acc = ""
    for i in range(8, 0, -1):
        acc += ENCODING_DIGITS[d[i]]
        terms.append(ENCODING_DIGITS[i + 3] + acc)
    return terms


def number_equality_terms(v: float) -> tuple[str, str]:
    """The (L0, L8) term pair whose conjunction is numeric equality
    (reference query-ir.ts:177-189)."""
    t = number_to_terms(v)
    return t[0], t[8]


def full_prefix_term(n_shifted_high48: int) -> str:
    """The full-precision prefix term ('2' + 8 big-endian digits — the
    reference's ``numberToTerms(v)[8]``) for the top-48-bit prefix
    value ``n >> 6``. Used by equality (with an L0 digit) and by our
    range scans."""
    if n_shifted_high48 >= 1 << 48:
        # exclusive upper bound above every '2'-prefixed term
        return "3"
    acc = ""
    for i in range(8, 0, -1):
        acc += ENCODING_DIGITS[(n_shifted_high48 >> (6 * (i - 1))) & 0x3F]
    return "2" + acc


def number_range_plan(
    lo: float, hi: float, lo_inclusive: bool = True, hi_inclusive: bool = False
) -> tuple[tuple[str, str] | None, tuple[str, list[str]] | None, tuple[str, list[str]] | None]:
    """Decompose a numeric range into term-dictionary operations.

    Returns ``(scan, lo_edge, hi_edge)`` where

    - ``scan`` is a half-open lexicographic L8-term range
      ``[term_lo, term_hi)`` selecting every doc whose full 48-bit
      prefix lies strictly inside the range,
    - ``lo_edge`` / ``hi_edge`` are ``(prefix_term, [l0_terms...])``
      conjunctions covering the partial 64-value buckets at the edges.

    Correct replacement for the reference's skipped trie decomposition:
    value ``n = P*64 + d0``; docs with P strictly between the edge
    prefixes match unconditionally, edge prefixes constrain d0.
    """
    if lo == float("-inf"):
        lo_n = MIN_SAFE_INTEGER + NUMBER_SHIFT
    else:
        lo_n = math.floor(lo) + (0 if lo_inclusive else 1) + NUMBER_SHIFT
    if hi == float("inf"):
        hi_n = MAX_SAFE_INTEGER + NUMBER_SHIFT + 1
    else:
        hi_n = math.floor(hi) + (1 if hi_inclusive else 0) + NUMBER_SHIFT
    if lo_n >= hi_n:
        return None, None, None

    lo_p, lo_r = divmod(lo_n, 64)
    hi_p, hi_r = divmod(hi_n, 64)

    if lo_p == hi_p:
        # single bucket
        edge = (full_prefix_term(lo_p), [PREFIX_NUMBER_L0 + ENCODING_DIGITS[i] for i in range(lo_r, hi_r)])
        return None, edge, None

    lo_edge = None
    scan_start = lo_p
    if lo_r != 0:
        lo_edge = (full_prefix_term(lo_p), [PREFIX_NUMBER_L0 + ENCODING_DIGITS[i] for i in range(lo_r, 64)])
        scan_start = lo_p + 1

    hi_edge = None
    if hi_r != 0:
        hi_edge = (full_prefix_term(hi_p), [PREFIX_NUMBER_L0 + ENCODING_DIGITS[i] for i in range(0, hi_r)])

    scan = None
    if scan_start < hi_p:
        scan = (full_prefix_term(scan_start), full_prefix_term(hi_p))
    return scan, lo_edge, hi_edge
