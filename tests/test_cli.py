"""CLI (ray-job-submit surface) smoke tests, sharing the session Ray."""

import json

import pytest

from yaii_ray import cli, corpus


def test_cli_build_search_count(ray_session, tmp_path, capsys):
    src = corpus.transcripts_path(2000, base="/tmp/yaii_corpus_test", row_group_size=500)
    out = str(tmp_path / "idx")
    assert cli.main(["build", "--input", src, "--out", out, "--num-shards", "2"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["index"] == out
    assert built["metrics"]["segments"][0]["rows"] == 2000

    assert cli.main(["search", "--index", out, "--query", "term00009", "--k", "3"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res["doc_ids"]) == 3
    assert res["scores"] == sorted(res["scores"], reverse=True)

    assert cli.main(["count", "--index", out, "--token", "user", "--field", "role"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["count"] == 500  # roles cycle over 4 values

    import ray

    assert ray.is_initialized()  # CLI must not tear down a session it didn't own
