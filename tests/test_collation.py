"""K3 collation-aware sort goldens: the reference sorts strings via
``Intl.Collator(['en','fr','de'], {sensitivity:'base',
caseFirst:'lower'})`` (utils.ts:41-47) inside a stable sort
(base-inverted-index.ts:606-659). At 'base' sensitivity case and
accents are ignored and base-equal strings compare EQUAL, so ties
keep insertion order. Corpus = the reference's 4-doc system-test
corpus (test/system/test-index.ts:76-106) extended with accented /
mixed-case rows; expected orders are derived from those collator
semantics."""

import numpy as np
import pyarrow as pa

from yaii_ray.build import build_index_from_table
from yaii_ray.config import (
    FieldConfig,
    Flags,
    IndexConfig,
    KIND_KEYWORD,
)
from yaii_ray.engine import Index, collation_base_key, sort_table
from yaii_ray.query import dsl


def _corpus() -> pa.Table:
    # reference docs 12..15 (token_data of doc 14 is multi-valued —
    # the comparator takes the FIRST element) + accented extensions
    ids = ["12", "13", "14", "15", "16", "17", "18", "19", "20"]
    token_data = [
        ["abc"],
        ["efg"],
        ["abc", "bcd"],
        ["hij"],
        ["Äbc"],
        ["ébc"],
        ["Abc"],
        ["zyx"],
        ["Ébf"],
    ]
    return pa.table({"id": ids, "token_data": token_data})


def test_collation_base_key():
    assert collation_base_key("Äpfel") == "apfel"
    assert collation_base_key("éclair") == collation_base_key("Eclair") == "eclair"
    assert collation_base_key("Straße") == "strasse"


def test_collated_sort_goldens(ray_session, tmp_path):
    cfg = IndexConfig(
        fields={
            "id": FieldConfig(flags=Flags.STORED, kind=KIND_KEYWORD),
            "token_data": FieldConfig(
                flags=Flags.SEARCHABLE | Flags.STORED, kind=KIND_KEYWORD
            ),
        },
        num_shards=1,
    )
    out = str(tmp_path / "idx")
    build_index_from_table(_corpus(), out, cfg)
    idx = Index(out)
    try:
        asc = idx.query(
            dsl.all_query(),
            sort=[dsl.SortClause("token_data", dsl.ASC, collation="base")],
            columns=["id"],
        )
        # base keys: abc(12,14,16,18 — ties keep insertion order),
        # ebc(17), ebf(20), efg(13), hij(15), zyx(19)
        assert asc["id"].to_pylist() == [
            "12", "14", "16", "18", "17", "20", "13", "15", "19"
        ]
        desc = idx.query(
            dsl.all_query(),
            sort=[dsl.SortClause("token_data", dsl.DESC, collation="base")],
            columns=["id"],
        )
        # reversed comparator, stable: base-equal group keeps insertion
        # order (reverseCompareFunction negates compare; JS sort and
        # our mergesort are both stable)
        assert desc["id"].to_pylist() == [
            "19", "15", "13", "20", "17", "12", "14", "16", "18"
        ]
        # WITHOUT collation the same query is codepoint-ordered — the
        # two orders must differ (this is what K3 adds)
        plain = idx.query(
            dsl.all_query(),
            sort=[dsl.SortClause("token_data", dsl.ASC)],
            columns=["id"],
        )
        assert plain["id"].to_pylist() == [
            "18", "12", "14", "13", "15", "19", "16", "20", "17"
        ]
    finally:
        idx.close()


def test_collated_sort_null_semantics():
    """undefined < everything (utils.ts:122-184) holds under collation
    too: ASC puts missing first, DESC puts them last."""
    t = pa.table({"k": ["b", None, "Ä", "a"], "v": [1, 2, 3, 4]})
    asc = sort_table(t, [dsl.SortClause("k", dsl.ASC, collation="base")])
    assert asc["v"].to_pylist() == [2, 3, 4, 1]
    desc = sort_table(t, [dsl.SortClause("k", dsl.DESC, collation="base")])
    assert desc["v"].to_pylist() == [1, 3, 4, 2]


def test_ducet_primary_key_classes():
    """collation='icu' (analysis/collate.py): DUCET class order and the
    foldings NFKD+casefold alone cannot produce."""
    from yaii_ray.analysis.collate import ducet_primary_key as k

    # class order: whitespace < punctuation < digits < letters
    assert k(" ") < k("-") < k("[") < k("0") < k("a")
    # codepoint order gets BOTH of these wrong ('Z' < 'a' < '[' there)
    assert k("Z") > k("a")
    assert k("[") < k("a")
    # primary equality: case + accents + DUCET foldings
    assert k("Äpfel") == k("apfel") == k("APFEL")
    assert k("æble") == k("aeble")
    assert k("œuf") == k("oeuf")
    assert k("øre") == k("ore")
    assert k("Straße") == k("strasse")
    # own primaries positioned per DUCET
    assert k("t") < k("þ") < k("u")
    assert k("n") < k("ŋ") < k("o")
    # completely-ignorable characters
    assert k("co­op") == k("coop")
    # beyond-subset fallback keeps script blocks above Latin
    assert k("z") < k("α") < k("я")


def test_icu_collated_sort_table():
    """sort_table(collation='icu') orders by DUCET classes; 'base' and
    codepoint both misplace the bracket row and the æ/ø rows."""
    rows = [
        "banana",
        "Apple",
        "[bracket]",
        "42nd",
        "æble",      # æble -> aeble
        "Zebra",
        "øre",       # øre -> ore
        "apple pie",
    ]
    t = pa.table({"k": rows, "v": list(range(len(rows)))})
    got = sort_table(t, [dsl.SortClause("k", dsl.ASC, collation="icu")])
    assert got["k"].to_pylist() == [
        "[bracket]",
        "42nd",
        "æble",
        "Apple",
        "apple pie",
        "banana",
        "øre",
        "Zebra",
    ]
    # the 'base' approximation leaves æ/ø at codepoint positions
    # (after z) and sorts digits before punctuation
    base = sort_table(t, [dsl.SortClause("k", dsl.ASC, collation="base")])
    assert base["k"].to_pylist() == [
        "42nd",
        "[bracket]",
        "Apple",
        "apple pie",
        "banana",
        "Zebra",
        "æble",
        "øre",
    ]


def test_icu_collated_index_query(ray_session, tmp_path):
    """K3 end-to-end with collation='icu': the reference system-test
    sort shape (test-index.ts:76-106 sortedQuery over token_data) on a
    corpus whose order differs under codepoint, base and icu."""
    t = pa.table(
        {
            "id": ["1", "2", "3", "4", "5", "6"],
            "token_data": [
                ["banana"],
                ["æble"],
                ["Apple"],
                ["[x]"],
                ["øre"],
                ["zebra"],
            ],
        }
    )
    cfg = IndexConfig(
        fields={
            "id": FieldConfig(flags=Flags.STORED, kind=KIND_KEYWORD),
            "token_data": FieldConfig(
                flags=Flags.SEARCHABLE | Flags.STORED, kind=KIND_KEYWORD
            ),
        },
        num_shards=1,
    )
    out = str(tmp_path / "idx")
    build_index_from_table(t, out, cfg)
    idx = Index(out)
    try:
        got = idx.query(
            dsl.all_query(),
            sort=[dsl.SortClause("token_data", dsl.ASC, collation="icu")],
            columns=["id"],
        )
        # [x] < æble(aeble) < Apple < banana < øre(ore) < zebra
        assert got["id"].to_pylist() == ["4", "2", "3", "1", "5", "6"]
        desc = idx.query(
            dsl.all_query(),
            sort=[dsl.SortClause("token_data", dsl.DESC, collation="icu")],
            columns=["id"],
        )
        assert desc["id"].to_pylist() == ["6", "5", "1", "3", "2", "4"]
    finally:
        idx.close()


def test_collated_first_last_aggregate(ray_session, tmp_path):
    """The reference builds the SAME collator-aware comparator for
    aggregates as for sorted queries (base-inverted-index.ts:606-659
    used by TopAccumulator) — First/Last honor SortClause collation."""
    from yaii_ray.aggs import First, Last

    t = pa.table(
        {
            "id": ["1", "2", "3", "4"],
            "token_data": [["banana"], ["æble"], ["Apple"], ["zebra"]],
        }
    )
    cfg = IndexConfig(
        fields={
            "id": FieldConfig(flags=Flags.STORED, kind=KIND_KEYWORD),
            "token_data": FieldConfig(
                flags=Flags.SEARCHABLE | Flags.STORED, kind=KIND_KEYWORD
            ),
        },
        num_shards=1,
    )
    out = str(tmp_path / "idx")
    build_index_from_table(t, out, cfg)
    idx = Index(out)
    try:
        res = idx.aggregate(
            dsl.all_query(),
            [
                First(
                    (dsl.SortClause("token_data", dsl.ASC, collation="icu"),),
                    project=("id",),
                ),
                Last(
                    (dsl.SortClause("token_data", dsl.ASC, collation="icu"),),
                    project=("id",),
                ),
            ],
        )
        # icu: æble(aeble) < Apple < banana < zebra
        assert res["first"]["id"] == "2"
        assert res["last"]["id"] == "4"
        # codepoint order would instead pick 'Apple' (uppercase A) first
        plain = idx.aggregate(
            dsl.all_query(),
            [First((dsl.SortClause("token_data", dsl.ASC),), project=("id",))],
        )
        assert plain["first"]["id"] == "3"
    finally:
        idx.close()
