"""Primary-strength (level-1) collation keys — the exact-order option
for K3 string sorts (``SortClause(collation="icu")``).

The reference sorts strings with ``Intl.Collator(['en','fr','de'],
{sensitivity: 'base'})`` (reference ``src/lib/internal/utils.ts:41-47``),
i.e. ICU *primary strength* under the CLDR root order (en/fr/de apply
no primary-order tailorings). :func:`ducet_primary_key` reproduces that
order from an embedded subset of the public Unicode DUCET
(``allkeys.txt``) primary weights:

- one weight per *collation group* in DUCET primary order: whitespace
  < punctuation < symbols < currency < digits < letters — NOT
  codepoint order ('Z' < 'a', '[' between, under codepoints);
- case and diacritics are primary-ignored (NFKD + per-char casefold +
  combining-mark strip — same fold as :func:`engine.collation_base_key`);
- DUCET *expansions* for the non-decomposable Latin letters: ``æ → ae``,
  ``œ → oe``, ``ß → ss`` (via casefold), and group membership for the
  stroked/crossed letters ``ø → o``, ``đ/ð → d``, ``ħ → h``, ``ł → l``,
  ``ŧ → t``, ``ı → i``, ``ĸ → k``;
- ``ŋ`` and ``þ`` keep their own DUCET primaries (after n / after t);
- completely-ignorable characters (soft hyphen, zero-width
  joiners/space, BOM) produce no weight.

Outside the subset (non-Latin scripts, exotic symbols) characters fall
back to ``0x10000 + codepoint`` — above every subset weight, keeping
codepoint order within the tail. That matches DUCET's broad layout
(Latin before Greek before Cyrillic before CJK) without embedding the
full 30k-entry table; the limitation is documented at the call sites.

Keys are ``bytes`` (3 bytes per weight, big-endian), so they compare
lexicographically in numpy/pandas object sorts exactly like the weight
sequences themselves.
"""

from __future__ import annotations

import unicodedata

# DUCET primary order, CLDR root subset. One entry = one primary
# weight; entries listed in ascending collation order.
_ORDER: list[str] = [
    # whitespace / control (DUCET: TAB < LF < VT < FF < CR < space;
    # NBSP folds to plain space via NFKD before lookup)
    "\t", "\n", "\x0b", "\x0c", "\r", " ",
    # punctuation
    "_", "-", "‐", "–", "—",
    ",", ";", ":", "!", "¡", "?", "¿",
    ".", "…", "·",
    "'", "‘", "’", "‚",
    "\"", "“", "”", "„",
    "«", "»",
    "(", ")", "[", "]", "{", "}",
    "§", "¶", "@", "*", "/", "\\", "&", "#", "%",
    "†", "‡", "•", "′", "″",
    # symbols (modifiers, math, misc)
    "`", "^", "¨", "¯", "´", "¸",
    "°", "©", "®",
    "+", "±", "÷", "×",
    "<", "=", ">", "¬", "|", "¦", "~",
    # currency
    "¤", "¢", "$", "£", "¥", "€",
    # digits (decomposed forms — ², ½ — reach these via NFKD)
    "0", "1", "2", "3", "4", "5", "6", "7", "8", "9",
    # letters: diacritics fold into the base via NFKD; stroked forms
    # via _MEMBERS; ŋ and þ are their own DUCET primaries
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "ŋ", "o", "p", "q", "r", "s", "t", "þ",
    "u", "v", "w", "x", "y", "z",
]

# non-decomposable letters that are primary-EQUAL to a subset letter
# (DUCET secondary/tertiary-only differences), or expansions
_MEMBERS: dict[str, str] = {
    "æ": "ae",   # æ  (DUCET expansion a+e)
    "œ": "oe",   # œ  (o+e)
    "ø": "o",    # ø
    "đ": "d",    # đ
    "ð": "d",    # ð (eth — d group in CLDR root)
    "ħ": "h",    # ħ
    "ł": "l",    # ł
    "ŧ": "t",    # ŧ
    "ı": "i",    # ı (dotless i)
    "ĸ": "k",    # ĸ (kra)
}

# completely ignorable at every strength
_IGNORE = frozenset("­​‌‍⁠﻿")

_PRIMARY: dict[str, int] = {ch: i + 1 for i, ch in enumerate(_ORDER)}

# beyond-subset fallback base: strictly above every subset weight
_FALLBACK_BASE = 0x10000


def ducet_primary_key(s: str) -> bytes:
    """Primary-strength sort key for ``s`` (see module docstring).
    Strings equal at primary strength (case/accent variants) map to
    identical keys, so a stable sort keeps their insertion order —
    the Intl.Collator 'base' tie behavior the goldens encode."""
    out = bytearray()
    for ch in unicodedata.normalize("NFKD", s):
        if unicodedata.combining(ch):
            continue
        for c in ch.casefold():
            # casefold can re-introduce combining marks ('İ' → 'i' +
            # U+0307) — primary-ignore those too
            if c in _IGNORE or unicodedata.combining(c):
                continue
            for e in _MEMBERS.get(c, c):
                w = _PRIMARY.get(e, _FALLBACK_BASE + ord(e))
                out += w.to_bytes(3, "big")
    return bytes(out)
