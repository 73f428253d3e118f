"""Query IR + boolean rewrite — pure planner, runs on the driver.

Mirrors the reference's ``Exp`` tree and rewrite rules
(``src/lib/internal/query-ir/query-ir.ts:127-225`` and
``boolean-exp.ts:41-149``) with one improvement: expression equality
is by value (the reference uses JS ``Set`` reference identity, so its
dedup only fires on identical object instances — value equality is
strictly stronger and observationally equivalent).

Differences by design (SURVEY.md §2.5):
- term pruning against a segment's dictionary (``mayMatch``) happens in
  the shard at resolve time (a missing term is an empty posting list —
  same result), so the rewrite needs no segment handle;
- ``NumberRange`` compiles to a sorted term-dictionary range scan
  (``TermRangeExp``) plus edge-bucket conjunctions instead of the
  reference's trie decomposition, which is test.skip'd as broken
  upstream (``test/system/test-index.ts:201,234``).
"""

from __future__ import annotations

from yaii_ray.analysis import terms as T
from yaii_ray.config import FIELD_ALL, FIELD_PRESENCE
from yaii_ray.query import dsl


class Exp:
    pass


class AllExp(Exp):
    def __repr__(self):
        return "ALL"

    def __eq__(self, other):
        return isinstance(other, AllExp)

    def __hash__(self):
        return hash("ALL_EXP")


class NoneExp(Exp):
    def __repr__(self):
        return "NONE"

    def __eq__(self, other):
        return isinstance(other, NoneExp)

    def __hash__(self):
        return hash("NONE_EXP")


ALL_EXP = AllExp()
NONE_EXP = NoneExp()


class TermExp(Exp):
    __slots__ = ("field", "term")

    def __init__(self, field: str, term: str):
        self.field = field
        self.term = term

    def __repr__(self):
        return f"{self.field}:{self.term}"

    def __eq__(self, other):
        return isinstance(other, TermExp) and (self.field, self.term) == (
            other.field,
            other.term,
        )

    def __hash__(self):
        return hash((self.field, self.term))


class TermRangeExp(Exp):
    """All docs having any term t with ``lo <= t < hi`` in ``field``.

    Resolved per shard by scanning the sorted term dictionary — correct
    because the number-trie digit alphabet is ASCII-increasing, so
    lexicographic L8-term order == numeric order (analysis/terms.py).
    """

    __slots__ = ("field", "lo", "hi")

    def __init__(self, field: str, lo: str, hi: str):
        self.field = field
        self.lo = lo
        self.hi = hi

    def __repr__(self):
        return f"{self.field}:[{self.lo},{self.hi})"

    def __eq__(self, other):
        return isinstance(other, TermRangeExp) and (
            self.field,
            self.lo,
            self.hi,
        ) == (other.field, other.lo, other.hi)

    def __hash__(self):
        return hash((self.field, self.lo, self.hi))


class TermContainsExp(Exp):
    """All docs having any STRING term in ``field`` whose token part
    contains ``needle`` as a literal substring.

    Resolved per shard by a vectorized ``match_substring`` over the
    field's contiguous string-term slice of the sorted dictionary
    (string terms share the ``'0'`` type prefix, analysis/terms.py, so
    the slice is one bisect span), then an OR of matching postings.
    Backs dsl.TextContains — declared-but-throwing upstream
    (``query-ir.ts:220-223``)."""

    __slots__ = ("field", "needle")

    def __init__(self, field: str, needle: str):
        self.field = field
        self.needle = needle

    def __repr__(self):
        return f"{self.field}:*{self.needle}*"

    def __eq__(self, other):
        return isinstance(other, TermContainsExp) and (
            self.field,
            self.needle,
        ) == (other.field, other.needle)

    def __hash__(self):
        return hash(("CONTAINS", self.field, self.needle))


class CachedExp(Exp):
    """Named sub-expression; shards memoize its resolved doc set
    (reference ``£_FILTER_CACHE`` / cached-filter.ts:10-41)."""

    __slots__ = ("name", "inner")

    def __init__(self, name: str, inner: Exp):
        self.name = name
        self.inner = inner

    def __repr__(self):
        return f"cached[{self.name}]({self.inner!r})"

    def __eq__(self, other):
        return isinstance(other, CachedExp) and self.name == other.name

    def __hash__(self):
        return hash(("CACHED", self.name))


class BoolExp(Exp):
    def __init__(self, should=None, must=None, must_not=None):
        self.should = list(should or [])
        self.must = list(must or [])
        self.must_not = list(must_not or [])

    def is_should_only(self):
        return not self.must and not self.must_not

    def is_must_only(self):
        return not self.should and not self.must_not

    def __repr__(self):
        return (
            "("
            + " ".join(f"({s})" for s in self.should)
            + " "
            + " ".join(f"+{m}" for m in self.must)
            + " "
            + " ".join(f"!{m}" for m in self.must_not)
            + ")"
        )

    def _key(self):
        return (
            frozenset(self.should),
            frozenset(self.must),
            frozenset(self.must_not),
        )

    def __eq__(self, other):
        return isinstance(other, BoolExp) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def rewrite(self) -> Exp:
        # -- should clauses: rewrite, dedup, bubble up should-only kids
        should: list[Exp] = []

        def add_unique(lst, e):
            if e not in lst:
                lst.append(e)

        for q in self.should:
            nq = q.rewrite() if isinstance(q, BoolExp) else q
            if isinstance(nq, AllExp):
                should = [nq]
                break
            if isinstance(nq, BoolExp) and nq.is_should_only():
                for s in nq.should:
                    add_unique(should, s)
            elif isinstance(nq, NoneExp):
                continue
            else:
                add_unique(should, nq)

        # an OR whose clauses all vanished (e.g. every token unknown)
        # matches nothing — the reference reaches the same result via a
        # NoneExp that survives into resolve (query-ir.ts:150-152)
        if self.should and not should:
            return NONE_EXP

        must_to_analyze = list(self.must)
        if len(should) == 1:
            must_to_analyze.append(should[0])
            should = []

        # -- must clauses
        must: list[Exp] = []
        for q in must_to_analyze:
            nq = q.rewrite() if isinstance(q, BoolExp) else q
            if isinstance(nq, BoolExp) and nq.is_must_only():
                for m in nq.must:
                    add_unique(must, m)
            elif isinstance(nq, AllExp):
                continue
            elif isinstance(nq, NoneExp):
                return NONE_EXP
            else:
                add_unique(must, nq)

        # -- mustNot clauses
        must_not: list[Exp] = []
        for q in self.must_not:
            nq = q.rewrite() if isinstance(q, BoolExp) else q
            if isinstance(nq, BoolExp) and nq.is_should_only():
                for s in nq.should:
                    add_unique(must_not, s)
            elif isinstance(nq, AllExp):
                return NONE_EXP
            elif isinstance(nq, NoneExp):
                continue
            else:
                add_unique(must_not, nq)

        # should that are also must/mustNot are redundant
        if should:
            drop = set(must) | set(must_not)
            should = [s for s in should if s not in drop]

        # must(pure mustNot) bubbles up
        for m in list(must):
            if isinstance(m, BoolExp) and not m.must and not m.should:
                for n in m.must_not:
                    add_unique(must_not, n)
                must.remove(m)

        # A AND NOT A -> NONE
        mn = set(must_not)
        for m in must:
            if m in mn:
                return NONE_EXP

        if len(must) == 1 and not should and not must_not:
            return must[0]
        if not must and not should and not must_not:
            return ALL_EXP
        return BoolExp(should, must, must_not)


def _field_or_all(f: str | None) -> str:
    return f if f is not None else FIELD_ALL


def build_expression(query: dsl.Query) -> Exp:
    """Query DSL → Exp tree (reference buildFilterExpression,
    query-ir.ts:127-225), followed by ``rewrite()`` where boolean."""
    e = _build(query)
    if isinstance(e, BoolExp):
        e = e.rewrite()
    return e


def _build(query: dsl.Query) -> Exp:
    if isinstance(query, dsl.All):
        return ALL_EXP
    if isinstance(query, dsl.Token):
        values = query.value if isinstance(query.value, tuple) else (query.value,)
        exps: list[Exp] = []
        for v in values:
            if isinstance(v, bool):
                exps.append(TermExp(_field_or_all(query.field), T.bool_to_term(v)))
            elif isinstance(v, str):
                exps.append(TermExp(_field_or_all(query.field), T.string_to_term(v)))
        if not exps:
            return NONE_EXP
        if len(exps) == 1:
            return exps[0]
        return BoolExp(should=exps)
    if isinstance(query, dsl.And):
        return BoolExp(must=[_build(q) for q in query.operands])
    if isinstance(query, dsl.Or):
        return BoolExp(should=[_build(q) for q in query.operands])
    if isinstance(query, dsl.Not):
        return BoolExp(must_not=[_build(query.operand)])
    if isinstance(query, dsl.Number):
        l0, l8 = T.number_equality_terms(query.value)
        f = _field_or_all(query.field)
        return BoolExp(must=[TermExp(f, l0), TermExp(f, l8)])
    if isinstance(query, dsl.Present):
        return TermExp(FIELD_PRESENCE, T.string_to_term(query.field))
    if isinstance(query, dsl.Cached):
        inner = _build(query.operand)
        if isinstance(inner, BoolExp):
            inner = inner.rewrite()
        return CachedExp(query.name, inner)
    if isinstance(query, dsl.NumberRange):
        scan, lo_edge, hi_edge = T.number_range_plan(
            query.min, query.max, query.min_inclusive, query.max_inclusive
        )
        shoulds: list[Exp] = []
        f = query.field
        if scan is not None:
            shoulds.append(TermRangeExp(f, scan[0], scan[1]))
        for edge in (lo_edge, hi_edge):
            if edge is not None:
                l8_term, l0_terms = edge
                shoulds.append(
                    BoolExp(
                        should=[TermExp(f, t) for t in l0_terms],
                        must=[TermExp(f, l8_term)],
                    )
                )
        if not shoulds:
            return NONE_EXP
        if len(shoulds) == 1:
            return shoulds[0]
        return BoolExp(should=shoulds)
    if isinstance(query, dsl.TokenRange):
        # string terms are '0'+token (analysis/terms.py PREFIX_STRING),
        # so token order == term order inside the half-open key range
        # ['0', '1'); inclusivity maps to '\x00' suffix nudges because
        # '\x00' is the smallest codepoint (no token extends a token by
        # less).
        f = _field_or_all(query.field)
        lo = T.PREFIX_STRING + query.min
        if not query.min_inclusive:
            lo += "\x00"
        if query.max is None:
            hi = _STRING_TERMS_END
        else:
            hi = T.PREFIX_STRING + query.max
            if query.max_inclusive:
                hi += "\x00"
        if lo >= hi:
            return NONE_EXP
        return TermRangeExp(f, lo, hi)
    if isinstance(query, dsl.TextContains):
        f = _field_or_all(query.field)
        if query.text == "":
            # every token contains "" — any doc with >=1 string token
            return TermRangeExp(f, T.PREFIX_STRING, _STRING_TERMS_END)
        return TermContainsExp(f, query.text)
    raise NotImplementedError(f"query type {type(query).__name__}")


# exclusive upper bound over the string-term key space: the next type
# prefix after PREFIX_STRING ('0' -> '1', analysis/terms.py:30-32)
_STRING_TERMS_END = chr(ord(T.PREFIX_STRING) + 1)
