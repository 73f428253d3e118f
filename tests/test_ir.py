"""Boolean rewrite rules — ported semantics from reference
boolean-exp.ts:41-149 rewrite tests + DSL construction."""

from yaii_ray.query import dsl
from yaii_ray.query.ir import (
    ALL_EXP,
    BoolExp,
    NoneExp,
    TermExp,
    TermRangeExp,
    build_expression,
)


def t(field, term):
    return TermExp(field, term)


class TestRewrite:
    def test_flatten_nested_should(self):
        e = BoolExp(should=[BoolExp(should=[t("f", "0a"), t("f", "0b")]), t("f", "0c")])
        r = e.rewrite()
        assert isinstance(r, BoolExp)
        assert set(r.should) == {t("f", "0a"), t("f", "0b"), t("f", "0c")}

    def test_single_should_becomes_must(self):
        r = BoolExp(should=[t("f", "0a")]).rewrite()
        assert r == t("f", "0a")

    def test_flatten_nested_must(self):
        e = BoolExp(must=[BoolExp(must=[t("f", "0a"), t("f", "0b")]), t("f", "0c")])
        r = e.rewrite()
        assert set(r.must) == {t("f", "0a"), t("f", "0b"), t("f", "0c")}

    def test_none_in_must_kills(self):
        assert isinstance(BoolExp(must=[t("f", "0a"), NoneExp()]).rewrite(), NoneExp)

    def test_all_in_must_dropped(self):
        r = BoolExp(must=[ALL_EXP, t("f", "0a")]).rewrite()
        assert r == t("f", "0a")

    def test_all_in_must_not_kills(self):
        assert isinstance(BoolExp(must_not=[ALL_EXP]).rewrite(), NoneExp)

    def test_a_and_not_a(self):
        assert isinstance(
            BoolExp(must=[t("f", "0a")], must_not=[t("f", "0a")]).rewrite(), NoneExp
        )

    def test_must_of_pure_mustnot_bubbles(self):
        e = BoolExp(must=[BoolExp(must_not=[t("f", "0a")]), t("f", "0b")])
        r = e.rewrite()
        assert r.must == [t("f", "0b")] and r.must_not == [t("f", "0a")]

    def test_empty_is_all(self):
        assert BoolExp().rewrite() is ALL_EXP

    def test_or_of_all_is_all(self):
        assert BoolExp(should=[ALL_EXP, t("f", "0a")]).rewrite() is ALL_EXP

    def test_or_of_all_none_clauses_is_none(self):
        assert isinstance(BoolExp(should=[NoneExp(), NoneExp()]).rewrite(), NoneExp)

    def test_dedup_by_value(self):
        r = BoolExp(should=[t("f", "0a"), t("f", "0a"), t("f", "0b")]).rewrite()
        assert sorted(x.term for x in r.should) == ["0a", "0b"]

    def test_should_dropped_when_also_must(self):
        e = BoolExp(should=[t("f", "0a"), t("f", "0b")], must=[t("f", "0a")])
        r = e.rewrite()
        assert r.should == [t("f", "0b")] and r.must == [t("f", "0a")]


class TestBuildExpression:
    def test_token(self):
        assert build_expression(dsl.token("abc", "td")) == t("td", "0abc")

    def test_token_defaults_to_all_field(self):
        assert build_expression(dsl.token("abc")) == t("_all", "0abc")

    def test_token_multi_value(self):
        r = build_expression(dsl.token(["a", "b"], "td"))
        assert set(r.should) == {t("td", "0a"), t("td", "0b")}

    def test_bool_token(self):
        assert build_expression(dsl.token(True, "flag")) == t("flag", "A")

    def test_and_or_not(self):
        r = build_expression(
            dsl.and_query(dsl.token("a", "f"), dsl.not_query(dsl.token("b", "f")))
        )
        assert r.must == [t("f", "0a")] and r.must_not == [t("f", "0b")]

    def test_number_equality_is_two_term_and(self):
        r = build_expression(dsl.number(20, "nd"))
        assert len(r.must) == 2
        prefixes = sorted(m.term[0] for m in r.must)
        assert prefixes == ["1", "2"]  # L0 digit + full 8-digit prefix term

    def test_present(self):
        assert build_expression(dsl.present("value.content.following")) == t(
            "_field", "0value.content.following"
        )

    def test_number_range_has_scan(self):
        r = build_expression(dsl.number_range("nd", 0, 10**9))
        found_scan = any(
            isinstance(s, TermRangeExp)
            for s in (r.should if isinstance(r, BoolExp) else [r])
        )
        assert found_scan

    def test_empty_range_is_none(self):
        assert isinstance(build_expression(dsl.number_range("nd", 10, 10)), NoneExp)


def test_plan_ir_is_value_hashable():
    """Two independent plans of the same query are == and hash-equal —
    the property the shard actors' resolve memo keys on (count() then
    resolve() of the same filter must hit the memo)."""
    from yaii_ray.engine import plan

    q = lambda: dsl.and_query(
        dsl.or_query(dsl.token("sort", "text"), dsl.token("window", "text")),
        dsl.not_query(dsl.token("merge", "text")),
    )
    e1, e2 = plan(q()), plan(q())
    assert e1 == e2
    assert hash(e1) == hash(e2)
    assert len({e1, e2}) == 1
