"""F1 continuous queries: MemorySegment resolve parity with the
on-disk index, QueryMode semantics (current_and_future / future /
current; sorted top-N on current only; unsorted limit across the
concatenated stream — base-inverted-index.ts:457-489), and commit()
through the resumable build_index append."""

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
from yaii_ray.continuous import (
    MODE_CURRENT,
    MODE_CURRENT_AND_FUTURE,
    MODE_FUTURE,
    ContinuousIndex,
    MemorySegment,
)
from yaii_ray.engine import Index, plan
from yaii_ray.query import dsl


def _config(num_shards=2) -> IndexConfig:
    return IndexConfig(
        fields={
            "text": FieldConfig(kind=KIND_TEXT, analyzer="standard_stop"),
            "tag": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "num": FieldConfig(kind=KIND_NUMBER, add_to_all=False),
        },
        all_field=False,
        num_shards=num_shards,
    )


def _table(n=60, seed=3) -> pa.Table:
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 5, size=6)) for _ in range(n)
    ]
    tags = [["red", "green", "blue"][i % 3] for i in range(n)]
    nums = rng.integers(0, 100, size=n)
    return pa.table(
        {"text": texts, "tag": tags, "num": pa.array(nums, type=pa.int64())}
    )


FILTERS = [
    dsl.token("red", field="tag"),
    dsl.token("alpha", field="text"),
    dsl.and_query(
        dsl.token("green", field="tag"), dsl.token("beta", field="text")
    ),
    dsl.or_query(dsl.token("blue", field="tag"), dsl.number(7, field="num")),
    dsl.number_range("num", min=10, max=60),
    dsl.not_query(dsl.token("red", field="tag")),
    dsl.present("tag"),
]


def test_memory_segment_matches_ondisk_resolve(ray_session, tmp_path):
    """Same termizer + same resolver mixin => identical match sets."""
    t = _table()
    cfg = _config()
    out = str(tmp_path / "idx")
    build_index_from_table(t, out, cfg)
    idx = Index(out)
    seg = MemorySegment(t, np.arange(t.num_rows, dtype=np.uint64), cfg)
    try:
        for q in FILTERS:
            got = seg.resolve(plan(q))
            want = idx.resolve(q)
            assert np.array_equal(got, want), q
    finally:
        idx.close()


def test_future_mode_accumulates_only_new_batches():
    cfg = _config()
    t = _table(90)
    ci = ContinuousIndex(cfg)
    ci.add(t.slice(0, 30))  # before registration: must NOT match
    first = ci.register("reds", dsl.token("red", field="tag"), mode=MODE_FUTURE)
    assert first.num_rows == 0
    got1 = ci.add(t.slice(30, 30))
    got2 = ci.add(t.slice(60, 30))
    ids = ci.matches("reds")["doc_id"].to_numpy()
    want = np.array([i for i in range(30, 90) if i % 3 == 0], dtype=np.uint64)
    assert np.array_equal(np.sort(ids), want)
    # per-add deltas partition the total
    assert got1["reds"].num_rows + got2["reds"].num_rows == want.size


def test_current_and_future_with_unsorted_limit():
    """take(limit) across concat(current, future): the countdown spans
    both parts and stops mid-batch."""
    cfg = _config()
    t = _table(90)
    ci = ContinuousIndex(cfg)
    ci.add(t.slice(0, 30))
    cur = ci.register(
        "r", dsl.token("red", field="tag"),
        mode=MODE_CURRENT_AND_FUTURE, limit=15, columns=["tag"],
    )
    assert cur.num_rows == 10  # 10 reds in batch 0
    ci.add(t.slice(30, 30))  # 10 more, 5 taken
    out2 = ci.add(t.slice(60, 30))  # exhausted: no new rows
    assert "r" not in out2
    m = ci.matches("r")
    assert m.num_rows == 15
    assert m.column_names == ["doc_id", "tag"]
    assert m["doc_id"].to_numpy().max() < 60


def test_sorted_limit_applies_to_current_only():
    """Reference: sorted top-N then `limit = undefined` — future
    matches stream unsorted and unlimited."""
    cfg = _config()
    t = _table(60)
    ci = ContinuousIndex(cfg)
    ci.add(t.slice(0, 30))
    cur = ci.register(
        "s", dsl.token("red", field="tag"),
        mode=MODE_CURRENT_AND_FUTURE,
        sort=[dsl.SortClause("num", dsl.DESC)], limit=3, columns=["num"],
    )
    assert cur.num_rows == 3
    nums = cur["num"].to_numpy()
    assert list(nums) == sorted(nums, reverse=True)
    ci.add(t.slice(30, 30))
    m = ci.matches("s")
    assert m.num_rows == 3 + 10  # future part unlimited


def test_current_mode_is_one_shot():
    cfg = _config()
    t = _table(30)
    ci = ContinuousIndex(cfg)
    ci.add(t)
    cur = ci.register("c", dsl.token("red", field="tag"), mode=MODE_CURRENT)
    assert cur.num_rows == 10
    with pytest.raises(KeyError):
        ci.matches("c")


def test_commit_folds_stream_into_index(ray_session, tmp_path):
    cfg = _config()
    t = _table(80)
    d = str(tmp_path / "cidx")
    ci = ContinuousIndex(cfg, index_dir=d)
    ci.add(t.slice(0, 40))
    ci.commit()
    idx = Index(d)
    try:
        assert idx.count(dsl.all_query()) == 40
    finally:
        idx.close()
    # current part now served from the committed index
    cur = ci.register(
        "r", dsl.token("red", field="tag"), mode=MODE_CURRENT_AND_FUTURE
    )
    assert cur.num_rows == 14  # ceil(40/3)
    ci.add(t.slice(40, 40))
    ci.commit()  # incremental: first segment unit plan unchanged
    idx2 = Index(d)
    try:
        assert idx2.count(dsl.all_query()) == 80
        want = idx2.resolve(dsl.token("red", field="tag"))
    finally:
        idx2.close()
    got = np.sort(ci.matches("r")["doc_id"].to_numpy())
    assert np.array_equal(got, want)
    ci.close()


def test_register_future_then_matches_empty():
    ci = ContinuousIndex(_config())
    ci.register("x", dsl.token("red", field="tag"), mode=MODE_FUTURE)
    assert ci.matches("x").num_rows == 0


def test_future_mode_rejects_sort():
    """Reference parity (base-inverted-index.ts:457-489): sort clauses
    are meaningless over an unbounded future stream -> ValueError."""
    ci = ContinuousIndex(_config())
    with pytest.raises(ValueError, match="sort"):
        ci.register(
            "s",
            dsl.token("red", field="tag"),
            mode=MODE_FUTURE,
            sort=[dsl.SortClause("num", dsl.ASC)],
        )


def test_register_validates_columns():
    """Requested columns are validated once at register() time: an
    IGNORED or non-STORED field raises instead of silently skipping
    the projection (which would diverge current vs future schemas)."""
    cfg = _config()
    cfg.fields["hidden"] = FieldConfig(
        flags=Flags.SEARCHABLE, kind=KIND_KEYWORD, add_to_all=False
    )
    cfg.fields["gone"] = FieldConfig(
        flags=Flags.IGNORED, kind=KIND_KEYWORD, add_to_all=False
    )
    ci = ContinuousIndex(cfg)
    ci.add(_table(30))
    for bad in ("hidden", "gone"):
        with pytest.raises(ValueError, match="stored"):
            ci.register(
                "b", dsl.token("red", field="tag"),
                mode=MODE_CURRENT_AND_FUTURE, columns=[bad],
            )
    # valid stored column still projects (current part)
    cur = ci.register(
        "ok", dsl.token("red", field="tag"),
        mode=MODE_CURRENT_AND_FUTURE, columns=["tag"],
    )
    assert cur.column_names == ["doc_id", "tag"]


def test_reopen_recovers_uncommitted_stream_batches(ray_session, tmp_path):
    """ADVICE r2: stream batches spilled after the last commit must
    survive a crash — a reopened index rebuilds their segments, keeps
    their doc-id ranges, folds them into the next commit(), and never
    reissues their ids to new add() calls."""
    cfg = _config()
    t = _table(90)
    d = str(tmp_path / "cidx_recover")
    ci = ContinuousIndex(cfg, index_dir=d)
    ci.add(t.slice(0, 30))
    ci.commit()
    ci.add(t.slice(30, 30))  # spilled but NOT committed
    ci.close()  # "crash": the in-memory tail is gone

    re = ContinuousIndex(cfg, index_dir=d)
    # the orphaned batch is back: ids continue after the committed part
    assert re._next_doc == 60
    assert len(re._stream_files) == 1
    # registrations see the recovered rows as CURRENT matches
    cur = re.register(
        "r", dsl.token("red", field="tag"), mode=MODE_CURRENT_AND_FUTURE
    )
    assert cur.num_rows == 20  # 10 per 30-row slice
    # new adds continue AFTER the recovered range (no id collision)
    out = re.add(t.slice(60, 30))
    assert int(out["r"]["doc_id"].to_numpy().min()) >= 60
    re.commit()
    idx = Index(d)
    try:
        assert idx.count(dsl.all_query()) == 90
        want = np.sort(idx.resolve(dsl.token("red", field="tag")))
    finally:
        idx.close()
    got = np.sort(re.matches("r")["doc_id"].to_numpy())
    assert np.array_equal(got, want)
    re.close()


def test_recovery_orders_stream_batches_numerically(ray_session, tmp_path):
    """ADVICE r3: recovery must order uncommitted stream batches by
    the PARSED sequence number — past seq 99999 the 5-digit zero
    padding overflows and 'batch-100000' sorts lexicographically
    before 'batch-99999'."""
    cfg = _config()
    t = _table(60)
    d = str(tmp_path / "cidx_seq")
    ci = ContinuousIndex(cfg, index_dir=d)
    ci._batch_seq = 99999
    ci.add(t.slice(0, 30))   # spills batch-99999.parquet
    ci.add(t.slice(30, 30))  # spills batch-100000.parquet
    first_ids = ci._offsets[0]
    assert ci._batch_seq == 100001
    ci.close()  # crash: nothing committed

    re = ContinuousIndex(cfg, index_dir=d)
    # recovered in seq order: batch-99999 keeps the LOWER doc-id range
    assert [f.split("/")[-1] for f in re._stream_files] == [
        "batch-99999.parquet",
        "batch-100000.parquet",
    ]
    assert re._offsets == [0, 30]
    assert re._next_doc == 60
    # row content of the first recovered segment is the first add()
    got0 = re._tables[0]
    assert got0["text"].to_pylist() == t.slice(0, 30)["text"].to_pylist()
    re.close()
