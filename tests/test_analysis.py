"""Unit tests: tokenizer parity, stopwords, number-trie goldens.

Golden vectors ported from the reference's own tests
(test/unit/test-query-ir.ts:11-182, test/system/test-index.ts:303-307).
"""

import re

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from yaii_ray.analysis import terms as T
from yaii_ray.analysis.tokenizer import (
    SEPARATOR_PATTERN,
    STOPWORDS,
    keyword_tokens,
    tokenize_string,
    tokenize_strings,
)

MAX_SAFE = 2**53 - 1
MIN_SAFE = -(2**53 - 1)


class TestTokenizer:
    def test_basic(self):
        assert tokenize_string("Hello, World-x") == ["hello", "world", "x"]

    def test_js_split_edge_semantics(self):
        # JS "-a".split(regex) -> ["", "a"]; trailing separators too
        assert tokenize_string("-a") == ["", "a"]
        assert tokenize_string("a-") == ["a", ""]
        assert tokenize_string("") == [""]
        assert tokenize_string("   ") == [""]

    def test_separator_class(self):
        assert tokenize_string("a b-c,d;e:f.g") == list("abcdefg")

    def test_stopwords(self):
        assert tokenize_string("ufg about test", stopwords=True) == ["ufg", "test"]
        assert "" in STOPWORDS and len(STOPWORDS) == 120  # 119 words + ""

    @given(st.lists(st.text(alphabet="ab -,;:.xyzABC", max_size=20), max_size=10))
    @settings(deadline=None)  # first Arrow kernel invocation is slow
    def test_vectorized_matches_scalar(self, texts):
        arr = pa.array(texts, type=pa.string())
        for stop in (False, True):
            vec = tokenize_strings(arr, stopwords=stop).to_pylist()
            ref = [tokenize_string(t, stopwords=stop) for t in texts]
            assert vec == ref

    def test_vectorized_nulls(self):
        arr = pa.array(["a b", None, "c"], type=pa.string())
        assert tokenize_strings(arr).to_pylist() == [["a", "b"], [""], ["c"]]

    def test_keyword(self):
        arr = pa.array(["x", None, "Y z"], type=pa.string())
        assert keyword_tokens(arr).to_pylist() == [["x"], [], ["Y z"]]

    def test_pattern_matches_python_re(self):
        r = re.compile(SEPARATOR_PATTERN)
        assert r.split("a\tb\nc") == ["a", "b", "c"]


class TestNumberTrie:
    """Goldens from reference test/unit/test-query-ir.ts."""

    def test_max_safe_integer(self):
        assert T.number_to_terms(MAX_SAFE) == [
            "1z", "9z", "8zz", "7zzz", "6zzzz", "5zzzzz", "4zzzzzz",
            "3zzzzzzz", "2zzzzzzzz",
        ]

    def test_min_safe_integer(self):
        assert T.number_to_terms(MIN_SAFE) == [
            "1/", "9+", "8++", "7+++", "6++++", "5+++++", "4++++++",
            "3+++++++", "2++++++++",
        ]

    def test_zero_one_minus_one(self):
        assert T.number_to_terms(0) == [
            "1+", "9U", "8U+", "7U++", "6U+++", "5U++++", "4U+++++",
            "3U++++++", "2U+++++++",
        ]
        assert T.number_to_terms(1)[0] == "1/"
        assert T.number_to_terms(1)[1:] == T.number_to_terms(0)[1:]
        assert T.number_to_terms(-1) == [
            "1z", "9T", "8Tz", "7Tzz", "6Tzzz", "5Tzzzz", "4Tzzzzz",
            "3Tzzzzzz", "2Tzzzzzzz",
        ]

    def test_powers_of_64(self):
        assert T.number_to_terms(1 << 6)[8] == "2U++++++/"
        assert T.number_to_terms(1 << 12)[7:] == ["3U+++++/", "2U+++++/+"]
        assert T.number_to_terms(1 << 18)[6] == "4U++++/"
        assert T.number_to_terms(2 ** 24)[5] == "5U+++/"
        assert T.number_to_terms(2 ** 30)[4] == "6U++/"
        assert T.number_to_terms(2 ** 36)[3] == "7U+/"
        assert T.number_to_terms(2 ** 42)[2] == "8U/"

    def test_floats_floored(self):
        assert T.number_to_terms(25.7) == T.number_to_terms(25)

    def test_digit_alphabet_is_ascii_increasing(self):
        d = T.ENCODING_DIGITS
        assert all(d[i] < d[i + 1] for i in range(len(d) - 1))

    @given(st.integers(min_value=MIN_SAFE, max_value=MAX_SAFE))
    def test_l8_order_matches_numeric_order(self, v):
        # lexicographic order of L8 terms == numeric order
        t1 = T.number_to_terms(v)[8]
        t2 = T.number_to_terms(min(v + 1, MAX_SAFE))[8]
        assert t1 <= t2

    def test_equality_terms(self):
        l0, full = T.number_equality_terms(20)
        # reference uses numberToTerms(v)[0] ('1'+digit) and [8]
        # ('2'+8 digits) — query-ir.ts:177-189
        assert l0.startswith("1") and full.startswith("2") and len(full) == 9


class TestNumberRangePlan:
    def _matches(self, v, plan):
        scan, lo_edge, hi_edge = plan
        terms = T.number_to_terms(v)
        l0, l8 = terms[0], terms[8]
        if scan is not None and scan[0] <= l8 < scan[1]:
            return True
        for edge in (lo_edge, hi_edge):
            if edge is not None and edge[0] == l8 and l0 in edge[1]:
                return True
        return False

    @given(
        st.integers(min_value=-300, max_value=300),
        st.integers(min_value=-300, max_value=300),
        st.booleans(),
        st.booleans(),
        st.integers(min_value=-310, max_value=310),
    )
    def test_plan_semantics(self, lo, hi, lo_inc, hi_inc, v):
        plan = T.number_range_plan(lo, hi, lo_inc, hi_inc)
        expected = (lo < v or (lo_inc and v == lo)) and (v < hi or (hi_inc and v == hi))
        assert self._matches(v, plan) == expected

    def test_open_ended(self):
        plan = T.number_range_plan(30, float("inf"), True, True)
        assert self._matches(10_000_000, plan)
        assert self._matches(30, plan)
        assert not self._matches(29, plan)


class TestTermRoundtrip:
    def test_string(self):
        assert T.term_to_token(T.string_to_term("abc")) == "abc"

    def test_bool(self):
        assert T.term_to_token(T.bool_to_term(True)) is True
        assert T.term_to_token(T.bool_to_term(False)) is False

    def test_number_prefix_rejected(self):
        with pytest.raises(NotImplementedError):
            T.term_to_token("1z")


def test_porter_stemmer_paper_vectors():
    """Porter (1980) — every step's examples from the paper, plus the
    intro's full-pipeline examples."""
    from yaii_ray.analysis.stemmer import porter_stem

    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit",
        "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
        "digitizer": "digit", "conformabli": "conform",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "homologou": "homolog",
        "communism": "commun", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
        "connected": "connect", "connecting": "connect",
        "connection": "connect", "connections": "connect",
        "generalizations": "gener", "oscillators": "oscil",
        # guards: short / non-alpha / non-ascii unchanged
        "is": "is", "a1b2": "a1b2", "héllo": "héllo", "": "",
    }
    for w, want in cases.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_stem_tokens_list_array():
    import pyarrow as pa

    from yaii_ray.analysis.stemmer import stem_tokens
    from yaii_ray.analysis.tokenizer import get_analyzer

    arr = pa.array(["connected connections", "", "hopping motoring"])
    toks = get_analyzer("porter")(arr)
    assert toks.to_pylist() == [["connect", "connect"], [""], ["hop", "motor"]]
    # offsets untouched — same per-row token counts as the raw tokenizer
    raw = get_analyzer("standard")(arr)
    assert [len(x) for x in toks.to_pylist()] == [len(x) for x in raw.to_pylist()]
    assert stem_tokens(raw).to_pylist() == toks.to_pylist()


def test_stem_tokens_null_safety():
    """ADVICE r3: null flat tokens pass through unstemmed and the
    list-level validity bitmap survives (custom registered analyzers
    may emit null slots; built-in tokenizers never do)."""
    import pyarrow as pa

    from yaii_ray.analysis.stemmer import stem_tokens

    arr = pa.array(
        [["running", None, "happily"], None, ["cats"], []],
        type=pa.list_(pa.string()),
    )
    out = stem_tokens(arr)
    assert out.to_pylist() == [["run", None, "happili"], None, ["cat"], []]
    assert out.null_count == 1
