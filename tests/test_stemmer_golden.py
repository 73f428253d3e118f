"""Frozen end-to-end golden for the porter analyzer (VERDICT r3 #7).

The stemmer path has no SQL oracle (DuckDB ``stem()`` needs the fts
extension, absent from this container), so this is its driver-style
gate: build a porter-analyzed index over the sf0.01 ``documents``
table and compare BM25 top-10 (doc ids AND scores) against a frozen
expected list. Every query word is a morphological variant NOT
literally present in the corpus ("queries" -> "queri" matches docs
containing "query"), so a regression in either query-side or
index-side stemming breaks the golden; the standard-analyzer control
proves the stemming is load-bearing.
"""

import os

import pyarrow.parquet as pq
import pytest

from yaii_ray.build import build_index_from_table
from yaii_ray.config import FieldConfig, IndexConfig, KIND_TEXT
from yaii_ray.engine import Index

SF_DIR = "/root/testdata/sf0.01"

# frozen from the deterministic build (dense doc ids, fixed BM25
# k1/b, stable tie-breaks); regenerate only on a deliberate scoring
# or analyzer change
GOLDEN = {
    "queries merged tables": [
        (310, 1.279814), (389, 1.273127), (111, 1.254386),
        (91, 1.224614), (96, 1.223124), (103, 1.201152),
        (234, 1.200551), (375, 1.200227), (395, 1.19938),
        (136, 1.193682),
    ],
    "customers keys values": [
        (68, 1.422592), (355, 1.35611), (229, 1.322105),
        (102, 1.319602), (184, 1.303813), (286, 1.300249),
        (491, 1.298641), (325, 1.296114), (331, 1.29388),
        (35, 1.285534),
    ],
    "sorting filtered windows": [
        (317, 1.259829), (71, 1.250176), (426, 1.218266),
        (138, 1.216837), (133, 1.201432), (162, 1.193366),
        (143, 1.192905), (355, 1.192753), (401, 1.192452),
        (478, 1.181985),
    ],
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_porter_bm25_frozen_golden(ray_session, tmp_path):
    t = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )

    def build(analyzer: str) -> Index:
        cfg = IndexConfig(
            fields={
                "text": FieldConfig(
                    kind=KIND_TEXT, analyzer=analyzer, scored=True
                )
            },
            all_field=False,
            num_shards=2,
        )
        out = str(tmp_path / f"idx_{analyzer}")
        build_index_from_table(t, out, cfg)
        return Index(out)

    idx = build("porter_stop")
    try:
        for q, want in GOLDEN.items():
            hits = idx.search(q, field="text", k=10).to_pydict()
            got = [
                (d, round(s, 6))
                for d, s in zip(hits["doc_id"], hits["score"])
            ]
            assert got == want, (q, got)
    finally:
        idx.close()

    # control: without stemming the variant query words match nothing
    # (the corpus holds "query"/"merge"/"table", never "queries"/...)
    ctl = build("standard_stop")
    try:
        for q in GOLDEN:
            assert ctl.search(q, field="text", k=10).num_rows == 0
    finally:
        ctl.close()
