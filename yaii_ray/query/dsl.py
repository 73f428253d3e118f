"""Public query DSL — same constructor surface as the reference.

Reference: ``src/lib/api/query-dsl.ts:14-84`` exposes
``token / all / number / present / numberRange / and / or / not``.
Python keywords force the ``*_query`` suffix on ``all/and/or/not``.
Queries are immutable dataclasses; the planner (``query.ir``) turns
them into an expression tree.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


class Query:
    pass


@dataclass(frozen=True)
class All(Query):
    pass


@dataclass(frozen=True)
class Token(Query):
    value: str | bool | tuple
    field: str | None = None  # None -> _all


@dataclass(frozen=True)
class Number(Query):
    value: float
    field: str | None = None


@dataclass(frozen=True)
class NumberRange(Query):
    field: str
    min: float = float("-inf")
    max: float = float("inf")
    min_inclusive: bool = True
    max_inclusive: bool = False


@dataclass(frozen=True)
class Present(Query):
    field: str


@dataclass(frozen=True)
class TokenRange(Query):
    """All docs having any indexed token t with min <= t <= / < max in
    ``field`` (codepoint order over analyzed tokens).

    The reference DECLARES this node (``src/lib/api/base.ts:64-67``)
    but its planner throws 'Not yet implemented'
    (``query-ir.ts:220-223``) — implemented here (EXCEEDS reference)
    as a sorted term-dictionary range scan, the same machinery that
    backs NumberRange. Bounds are compared against tokens as indexed
    (i.e. post-analysis; pass lowercase bounds for lowercasing
    analyzers), mirroring ``Token``'s raw-value contract."""

    field: str | None = None  # None -> _all
    min: str = ""
    max: str | None = None  # None -> unbounded above
    min_inclusive: bool = True
    max_inclusive: bool = False


@dataclass(frozen=True)
class TextContains(Query):
    """All docs having any indexed token that contains ``text`` as a
    literal substring in ``field``.

    Declared-but-throwing upstream like TokenRange (``api/base.ts:64-67``,
    ``query-ir.ts:220-223``) — implemented here (EXCEEDS reference) as
    a vectorized substring scan over the shard's sorted term
    dictionary followed by an OR of the matching terms' postings.
    ``text`` is matched against tokens as indexed (post-analysis)."""

    text: str
    field: str | None = None  # None -> _all


@dataclass(frozen=True)
class And(Query):
    operands: tuple


@dataclass(frozen=True)
class Or(Query):
    operands: tuple


@dataclass(frozen=True)
class Not(Query):
    operand: Query


def token(value, field: str | None = None) -> Token:
    if isinstance(value, list):
        value = tuple(value)
    return Token(value=value, field=field)


def all_query() -> All:
    return All()


def number(value: float, field: str | None = None) -> Number:
    return Number(value=value, field=field)


def number_range(
    field: str,
    min: float = float("-inf"),
    max: float = float("inf"),
    min_inclusive: bool = True,
    max_inclusive: bool = False,
) -> NumberRange:
    return NumberRange(field, min, max, min_inclusive, max_inclusive)


def present(field: str) -> Present:
    return Present(field)


def token_range(
    field: str | None = None,
    min: str = "",
    max: str | None = None,
    min_inclusive: bool = True,
    max_inclusive: bool = False,
) -> TokenRange:
    return TokenRange(field, min, max, min_inclusive, max_inclusive)


def text_contains(text: str, field: str | None = None) -> TextContains:
    return TextContains(text, field)


def and_query(*operands: Query) -> And:
    return And(tuple(operands))


def or_query(*operands: Query) -> Or:
    return Or(tuple(operands))


def not_query(operand: Query) -> Not:
    return Not(operand)


@dataclass(frozen=True)
class Cached(Query):
    """Named filter whose resolved doc set is memoized per shard
    (reference ``CachedFilter``, cached-filter.ts:10-41)."""

    name: str
    operand: Query


def cached(name: str, operand: Query) -> Cached:
    return Cached(name, operand)


# Sorting ------------------------------------------------------------
ASC = "asc"
DESC = "desc"


@dataclass(frozen=True)
class SortClause:
    """``collation=None`` compares strings by codepoint; ``"base"``
    approximates the reference's ``Intl.Collator(['en','fr','de'],
    sensitivity:'base', caseFirst:'lower')`` (utils.ts:41-47): case
    and accents are ignored for ordering, and base-equal strings keep
    stable input order (at 'base' sensitivity the ICU comparator
    returns 0 for them, and the reference's sort is stable).
    ``"icu"`` is the exact option: DUCET-subset primary weights
    (analysis/collate.py) — punctuation/symbol/digit/letter class
    order and the æ/œ/ø/ß foldings that NFKD alone misses."""

    field: str
    dir: str = ASC
    collation: str | None = None
