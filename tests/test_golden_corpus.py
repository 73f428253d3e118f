"""Golden parity with the reference's 4-doc system corpus.

Corpus and expectations ported from ``test/system/test-index.ts:77-331``
(FIXTURES.md F2): token / and / or / number equality / sort asc+desc /
limit / ``_all``-with-stopwords / field presence / source round-trip.
The reference's number-range e2e is test.skip'd upstream (known buggy);
ours is tested and correct (tests/test_build_query.py), so a range
golden is included as an upgrade, not a parity claim.
"""

import numpy as np
import pyarrow as pa
import pytest

from yaii_ray.build import build_index_from_table
from yaii_ray.config import (
    FieldConfig,
    Flags,
    IndexConfig,
    KIND_KEYWORD,
    KIND_NUMBER,
    KIND_TEXT,
)
from yaii_ray.engine import Index
from yaii_ray.query import dsl

CORPUS = pa.table(
    {
        "id": ["12", "13", "14", "15"],
        "text": ["lorem ipsum", "dolor", "this is a demo", "and it is working"],
        "token_data": [["abc"], ["efg"], ["abc", "bcd"], ["hij"]],
        "number_data": [20, 30, 25, 10000000],
        "number_data_opt_sort": [20, 30, 25, 10000000],
        "unknown_data": ["ufg about test", None, None, None],
    }
)


def golden_config() -> IndexConfig:
    return IndexConfig(
        fields={
            "id": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "text": FieldConfig(kind=KIND_TEXT, analyzer="standard", add_to_all=False),
            "token_data": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "number_data": FieldConfig(kind=KIND_NUMBER, add_to_all=False),
            "number_data_opt_sort": FieldConfig(
                flags=Flags.SEARCHABLE | Flags.STORED | Flags.SORT_OPTIMIZED,
                kind=KIND_NUMBER,
                add_to_all=False,
            ),
            # unknown_data deliberately NOT declared -> default config
            # (searchable text, add_to_all=True), like the reference's
            # lazily-registered defaultFieldConfig
        },
        all_field=True,
        all_analyzer="standard_stop",
        num_shards=2,
        chunk_shift=1,
    )


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("golden") / "idx")
    build_index_from_table(CORPUS, out, golden_config())
    ix = Index(out)
    yield ix
    ix.close()


def ids_of(idx: Index, q) -> list[str]:
    docs = idx.resolve(q)
    if docs.size == 0:
        return []
    return idx.project(docs, columns=["id"])["id"].to_pylist()


def test_token_query(idx):
    # test-index.ts:110-151
    assert ids_of(idx, dsl.token("abc", "token_data")) == ["12", "14"]
    assert ids_of(idx, dsl.token("hij", "token_data")) == ["15"]
    assert ids_of(idx, dsl.token("nope", "token_data")) == []


def test_boolean_combinations(idx):
    # test-index.ts:153-177
    assert ids_of(
        idx, dsl.or_query(dsl.token("abc", "token_data"), dsl.token("efg", "token_data"))
    ) == ["12", "13", "14"]
    assert ids_of(
        idx, dsl.and_query(dsl.token("abc", "token_data"), dsl.token("bcd", "token_data"))
    ) == ["14"]
    assert ids_of(
        idx,
        dsl.and_query(
            dsl.token("abc", "token_data"),
            dsl.not_query(dsl.token("bcd", "token_data")),
        ),
    ) == ["12"]
    # multi-value token = OR of terms (query-ir.ts:131-158)
    assert ids_of(idx, dsl.token(["abc", "hij"], "token_data")) == ["12", "14", "15"]


def test_number_equality(idx):
    # test-index.ts:179-198
    assert ids_of(idx, dsl.number(25, "number_data")) == ["14"]
    assert ids_of(idx, dsl.number(10000000, "number_data")) == ["15"]
    assert ids_of(idx, dsl.number(26, "number_data")) == []


def test_number_range(idx):
    # upstream e2e is test.skip (test-index.ts:201,234); ours works
    assert ids_of(idx, dsl.number_range("number_data", min=20, max=30)) == ["12", "14"]
    assert ids_of(
        idx, dsl.number_range("number_data", min=20, max=30, max_inclusive=True)
    ) == ["12", "13", "14"]
    assert ids_of(idx, dsl.number_range("number_data", min=31)) == ["15"]


def test_text_standard_analyzer(idx):
    # default field text analyzed with the standard tokenizer
    assert ids_of(idx, dsl.token("lorem", "text")) == ["12"]
    assert ids_of(idx, dsl.token("working", "text")) == ["15"]


def test_sort_by_id_string(idx):
    # test-index.ts "Test Sort query": string sort on id
    t = idx.query(
        dsl.all_query(), sort=[dsl.SortClause("id", dsl.ASC)], limit=2, columns=["id"]
    )
    assert t["id"].to_pylist() == ["12", "13"]
    t = idx.query(dsl.all_query(), sort=[dsl.SortClause("id", dsl.DESC)], columns=["id"])
    assert t["id"].to_pylist() == ["15", "14", "13", "12"]


def test_sort_by_number_sort_optimized(idx):
    # test-index.ts "Test Sort query on sort optimized": numeric order
    # (20 < 25 < 30 < 1e7)
    t = idx.query(
        dsl.all_query(),
        sort=[dsl.SortClause("number_data_opt_sort", dsl.ASC)],
        limit=2,
        columns=["id", "number_data_opt_sort"],
    )
    assert t["id"].to_pylist() == ["12", "14"]
    t = idx.query(
        dsl.all_query(),
        sort=[dsl.SortClause("number_data_opt_sort", dsl.DESC)],
        columns=["id"],
    )
    assert t["id"].to_pylist() == ["15", "13", "14", "12"]


def test_all_field_respects_not_to_all(idx):
    # test-index.ts: 'text' is configured not-to-all -> absent in _all
    assert ids_of(idx, dsl.token("lorem")) == []
    # but unknown_data (default config) IS in _all
    assert ids_of(idx, dsl.token("test", "unknown_data")) == ["12"]


def test_all_field_with_stopwords(idx):
    # test-index.ts:299-307: unknown_data feeds _all through the
    # stopword analyzer -> 'about' is dropped, 'ufg' survives
    assert ids_of(idx, dsl.token("ufg")) == ["12"]
    assert ids_of(idx, dsl.token("about")) == []
    assert ids_of(idx, dsl.token("test")) == ["12"]


def test_presence_query(idx):
    # nested-doc presence pattern (test-index.ts:334-367): HAS_FIELD
    assert ids_of(idx, dsl.present("unknown_data")) == ["12"]
    assert ids_of(idx, dsl.present("text")) == ["12", "13", "14", "15"]


def test_source_roundtrip(idx):
    # test-index.ts:309-331: stored fields round-trip exactly
    docs = idx.resolve(dsl.token("abc", "token_data"))
    rows = idx.project(docs)
    assert rows["id"].to_pylist() == ["12", "14"]
    assert rows["text"].to_pylist() == ["lorem ipsum", "this is a demo"]
    assert rows["token_data"].to_pylist() == [["abc"], ["abc", "bcd"]]
    assert rows["number_data"].to_pylist() == [20, 25]
    assert rows["unknown_data"].to_pylist() == ["ufg about test", None]


def test_unsorted_limit(idx):
    # take(limit) truncates in ingestion (doc-id) order
    t = idx.query(dsl.all_query(), limit=3, columns=["id"])
    assert t["id"].to_pylist() == ["12", "13", "14"]
