"""Segment compaction (T6): a multi-segment index compacted into one
segment must answer every query identically."""

import numpy as np
import pytest

from yaii_ray import corpus
from yaii_ray.build import build_index, compact_index, load_manifest
from yaii_ray.config import transcripts_config
from yaii_ray.engine import Index
from yaii_ray.query import dsl


def test_compaction_preserves_results(ray_session, tmp_path):
    src = corpus.transcripts_path(3000, base="/tmp/yaii_corpus_test", row_group_size=500)
    multi = str(tmp_path / "multi")
    cfg = transcripts_config(num_shards=2)
    build_index(src, multi, cfg, target_unit_rows=500, units_per_segment=2)
    assert len(load_manifest(multi)["segments"]) >= 3

    single = str(tmp_path / "single")
    compact_index(multi, single)
    assert len(load_manifest(single)["segments"]) == 1

    a, b = Index(multi), Index(single)
    try:
        assert a.manifest["stats"] == b.manifest["stats"]
        for q in [
            dsl.token("user", "role"),
            dsl.and_query(dsl.present("tool"), dsl.token("assistant", "role")),
            dsl.number_range("turn_idx", min=1, max=4),
        ]:
            assert a.resolve(q).tolist() == b.resolve(q).tolist()
        for qtext in ["the data model test", "term00009 term00544"]:
            ra = a.search(qtext, k=10)
            rb = b.search(qtext, k=10)
            assert ra["doc_id"].to_pylist() == rb["doc_id"].to_pylist()
            assert ra["score"].to_pylist() == rb["score"].to_pylist()
    finally:
        a.close()
        b.close()
