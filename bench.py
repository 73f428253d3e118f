"""Headline benchmark — prints ONE JSON line.

Pipelines timed (the north-rule workload, SURVEY.md §6):
  1. ``build``   — full inverted-index build over the deterministic
                   synthetic transcript corpus (BENCH_TURNS turns):
                   read → tokenize/termize → term-keyed salted shuffle
                   → delta+VByte merge + block-max → manifest + stats.
  2. ``bm25``    — p50 latency of BM25 top-10 queries (shard actor
                   pool, block-max WAND) over that index.
  3. sf queries  — a subset of the __ray_entry__ pipelines over
                   $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env: RAY_GRAFT_CPUS (default 32) — fresh ``ray.init(num_cpus=...)``;
GRAFT_SF_DIR; BENCH_TURNS (default 2000000).

``--scaling`` re-runs the same input in fresh processes at 8 and 32
CPUs and reports throughput at both + scaling efficiency — the sandbox
stand-in for the N vs 4N-node cluster criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from yaii_ray import tune_allocator

tune_allocator()  # before ray.init so workers inherit (BASELINE.md)


def _machine_ceiling(lo: int, hi: int, n_turns: int) -> dict:
    """Calibrate the box with the ENGINE'S OWN per-unit workload run
    Ray-free as lo / hi concurrent OS processes over disjoint unit
    slices (parquet read + tokenize + termize + encode + docs write —
    everything but the shuffle). On shared/throttled sandboxes this
    saturates far below the nominal CPU count (measured here: the raw
    workload scales only ~1.8x from 8 to 32 procs while cache-resident
    np.sort scales ~3.8x), which caps ANY engine's 8->32 scaling; the
    engine's efficiency is judged against this deliverable ceiling,
    not an unreachable 4x."""
    import time as _time

    probe_turns = min(n_turns, 2_000_000)
    # generate/caches the probe corpus ONCE, outside the timed region
    # (probe subprocesses only read it)
    from yaii_ray.corpus import transcripts_path

    transcripts_path(probe_turns, row_group_size=16_384)
    code = f"""
import sys, os, shutil
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
proc_id, nprocs = int(sys.argv[1]), int(sys.argv[2])
from yaii_ray.config import transcripts_config
from yaii_ray.corpus import transcripts_path
from yaii_ray.stages.partials import BuildPartials, plan_units
src = transcripts_path({probe_turns}, row_group_size=16_384)
files = sorted(os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet"))
cfg = transcripts_config(num_shards=16); cfg.chunk_shift = 16
units = plan_units(files, target_rows=32_768)[:64]
while len(units) < {hi} * 2:   # pad small corpora so no proc starves
    units = units + units
units = units[: max(64, {hi} * 2)]
docs_dir = f"/tmp/yaii_probe/{{nprocs}}_{{proc_id}}"
shutil.rmtree(docs_dir, ignore_errors=True); os.makedirs(docs_dir)
bp = BuildPartials(cfg.to_json(), docs_dir, 64)
for i, u in enumerate(units):
    if i % nprocs == proc_id:
        bp._one_unit(i, u["path"], u["rg_lo"], u["rg_hi"], u["doc_base"])
"""

    def run(n: int) -> float:
        t0 = _time.monotonic()
        ps = [
            subprocess.Popen(
                [sys.executable, "-c", code, str(i), str(n)],
                stdout=subprocess.DEVNULL,
            )
            for i in range(n)
        ]
        rcs = [p.wait() for p in ps]
        if any(rcs):
            raise RuntimeError(
                f"machine-ceiling probe subprocess failed (rc={rcs}); "
                "ceiling would be garbage — fix the probe"
            )
        return _time.monotonic() - t0  # wall seconds for the fixed work

    t_lo, t_hi = run(lo), run(hi)
    shutil.rmtree("/tmp/yaii_probe", ignore_errors=True)
    ratio = t_lo / t_hi  # speedup of the same work lo -> hi procs
    return {
        "probe_wall_sec_lo": round(t_lo, 3),
        "probe_wall_sec_hi": round(t_hi, 3),
        "machine_ceiling_ratio": round(ratio, 3),
        "machine_ceiling_efficiency": round(ratio / (hi / lo), 3),
    }


def run_scaling() -> None:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__) or ".", "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # second operating point (e.g. SCALE_LO=4 SCALE_HI=16) shows
    # whether a sub-4x gap tracks the host or the pipeline
    lo = int(os.environ.get("SCALE_LO", "8"))
    hi = int(os.environ.get("SCALE_HI", "32"))
    n_turns = int(os.environ.get("BENCH_TURNS", "2000000"))
    ceiling = _machine_ceiling(lo, hi, n_turns)
    r_lo, r_hi = one(lo), one(hi)
    tput_lo = r_lo["build_turns_per_sec"]
    tput_hi = r_hi["build_turns_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"index-build scaling efficiency ({lo} -> {hi} CPUs, same input)",
                f"build_sec_{lo}": r_lo["queries"]["build"],
                f"build_sec_{hi}": r_hi["queries"]["build"],
                f"turns_per_sec_{lo}": tput_lo,
                f"turns_per_sec_{hi}": tput_hi,
                "scaling_efficiency": round(eff, 3),
                # engine efficiency relative to what the hardware can
                # deliver at all (see _machine_ceiling)
                "normalized_efficiency": round(
                    eff / ceiling["machine_ceiling_efficiency"], 3
                ),
                **ceiling,
                f"bm25_p50_ms_{hi}": r_hi["bm25_p50_ms"],
                "turns": r_hi["turns"],
            }
        )
    )


_ROUNDTRIP_CHILD = """
import json, os, sys
sys.path.insert(0, {repo!r})
from yaii_ray import tune_allocator
tune_allocator()
import ray
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import time
from yaii_ray.build import build_index, compact_index, load_manifest
from yaii_ray.config import transcripts_config
from yaii_ray.corpus import build_vocab
from yaii_ray.engine import Index

cfg = transcripts_config(num_shards=min({ncpu}, 16))
cfg.chunk_shift = 16
metrics = {{}}
t0 = time.monotonic()
build_index({src!r}, {idx_dir!r}, cfg, target_unit_rows={unit_rows},
            units_per_segment={ups}, metrics=metrics)
build_sec = round(time.monotonic() - t0, 3)

out = {{"build_sec": build_sec,
        "segments": [{{k: s.get(k) for k in ("segment", "rows", "sec", "skipped")}}
                     for s in metrics["segments"]]}}
if {query!r}:
    qdir = {idx_dir!r}
    if {compact!r}:
        import shutil
        shutil.rmtree({idx_dir!r} + "_compacted", ignore_errors=True)
        t0 = time.monotonic()
        qdir = compact_index({idx_dir!r}, {idx_dir!r} + "_compacted")
        out["compact_sec"] = round(time.monotonic() - t0, 3)
        out["n_segments_compacted"] = len(load_manifest(qdir)["segments"])
    out["n_segments"] = len(load_manifest({idx_dir!r})["segments"])
    idx = Index(qdir)
    idx.warmup()
    vocab = build_vocab()
    queries = []
    for i in range(40):
        a = vocab[(137 + i * 61) % 2000]
        b_ = vocab[(411 + i * 97) % 6000]
        c = vocab[(911 + i * 13) % 300]
        queries.append(f"{{a}} {{b_}} {{c}}" if i % 2 else f"{{a}} {{b_}}")
    res = idx.search_many(queries, field="text", k=10)
    out["results"] = [
        [(int(d), round(float(s), 6))
         for d, s in zip(r["doc_id"].to_pylist(), r["score"].to_pylist())]
        for r in res
    ]
    out["stats"] = load_manifest(qdir)["stats"]
    idx.close()
with open({out_path!r}, "w") as f:
    json.dump(out, f)
ray.shutdown()
"""


def run_roundtrip() -> None:
    """Crash-resume + compaction roundtrip at bench scale (VERDICT r3
    item 6, promoting tests/test_compaction.py to 20M turns):

      1. clean multi-segment build (control) -> BM25 signature
      2. same build in a fresh process, SIGKILLed mid-3rd-segment
      3. resume in another fresh process (finished segments skipped)
      4. compact the resumed index to ONE segment
      5. the control, the crash-resumed, and the compacted index must
         return byte-identical BM25 top-10 (ids + scores) for the
         standard 40-query mix, and identical corpus stats.

    Prints ONE JSON line with phase timings + `identical` verdicts.
    """
    import hashlib
    import signal

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("BENCH_ROUNDTRIP_TURNS", "20000000"))
    from yaii_ray.corpus import transcripts_path

    src = transcripts_path(n_turns, row_group_size=16_384)
    repo = os.path.dirname(os.path.abspath(__file__))
    unit_rows = 65_536
    n_units = (n_turns + unit_rows - 1) // unit_rows
    ups = max(1, (n_units + 3) // 4)  # ~4 segments

    def child(idx_dir: str, out_path: str, query: bool, compact: bool):
        code = _ROUNDTRIP_CHILD.format(
            repo=repo, ncpu=ncpu, src=src, idx_dir=idx_dir,
            unit_rows=unit_rows, ups=ups, query=query, compact=compact,
            out_path=out_path,
        )
        return subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            start_new_session=True,
        )

    clean_dir = f"/tmp/yaii_rt_clean_c{ncpu}_n{n_turns}"
    crash_dir = f"/tmp/yaii_rt_crash_c{ncpu}_n{n_turns}"
    for d in (clean_dir, crash_dir, crash_dir + "_compacted"):
        shutil.rmtree(d, ignore_errors=True)

    # 1. control build + query signature
    p = child(clean_dir, "/tmp/yaii_rt_clean.json", query=True, compact=False)
    assert p.wait() == 0, "control build failed"
    with open("/tmp/yaii_rt_clean.json") as f:
        clean = json.load(f)

    # 2. crash: SIGKILL the whole process group once the 3rd segment
    # is underway (2 segment manifests committed + its docs appearing)
    p = child(crash_dir, "/tmp/yaii_rt_na.json", query=False, compact=False)
    t0 = time.monotonic()
    killed_at = None
    while p.poll() is None:
        time.sleep(0.5)
        done = [
            f for f in os.listdir(crash_dir)
            if f.startswith("seg-") and f.endswith(".manifest.json")
        ] if os.path.isdir(crash_dir) else []
        seg2_docs = os.path.join(crash_dir, "docs", "seg-002")
        if len(done) >= 2 and os.path.isdir(seg2_docs) and os.listdir(seg2_docs):
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            killed_at = round(time.monotonic() - t0, 3)
            break
    p.wait()
    assert killed_at is not None, (
        "build finished before the kill trigger — corpus too small for "
        "a mid-segment crash; raise BENCH_ROUNDTRIP_TURNS"
    )

    # 3+4. resume in a fresh process, then compact + query both
    p = child(crash_dir, "/tmp/yaii_rt_resumed.json", query=True, compact=True)
    assert p.wait() == 0, "resume/compact failed"
    with open("/tmp/yaii_rt_resumed.json") as f:
        resumed = json.load(f)

    def sig(r: dict) -> str:
        return hashlib.md5(
            json.dumps([r["results"], r["stats"]], sort_keys=True).encode()
        ).hexdigest()

    skipped = [s["segment"] for s in resumed["segments"] if s.get("skipped")]
    print(
        json.dumps(
            {
                "metric": "20M crash-resume + compaction roundtrip",
                "turns": n_turns,
                "num_cpus": ncpu,
                "clean_build_sec": clean["build_sec"],
                "clean_turns_per_sec": round(n_turns / clean["build_sec"], 1),
                "killed_after_sec": killed_at,
                "segments_skipped_on_resume": skipped,
                "resume_build_sec": resumed["build_sec"],
                "compact_sec": resumed["compact_sec"],
                "n_segments": resumed["n_segments"],
                "n_segments_compacted": resumed["n_segments_compacted"],
                # resumed child queries the COMPACTED index; signature
                # equality vs the clean multi-segment control proves
                # crash -> resume -> compact changed nothing
                "signature_clean": sig(clean),
                "signature_resumed_compacted": sig(resumed),
                "identical": sig(clean) == sig(resumed),
            }
        )
    )
    assert sig(clean) == sig(resumed), "roundtrip changed query results"


def main() -> None:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default sized so the build runs ~15-20 s at 32 CPUs: small enough
    # for a per-round bench, large enough that actor-pool startup and
    # first-task import costs don't dominate the throughput number
    n_turns = int(os.environ.get("BENCH_TURNS", "2000000"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from yaii_ray.build import build_index
    from yaii_ray.config import transcripts_config
    from yaii_ray.corpus import build_vocab, transcripts_path
    from yaii_ray.engine import Index

    timings: dict[str, float] = {}

    # untimed: corpus generation (cached) + page-cache warm read.
    # 16k-row groups let the unit planner split finely at high CPU
    # counts (units are row-group aligned).
    src = transcripts_path(n_turns, row_group_size=16_384)
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            with open(os.path.join(src, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass

    # 1. index build (fresh — delete any previous output first)
    idx_dir = f"/tmp/yaii_bench_idx_c{ncpu}_n{n_turns}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    cfg = transcripts_config(num_shards=min(ncpu, 16))
    cfg.chunk_shift = 16
    # units sized so every worker gets several tasks at this CPU count,
    # capped at 64k rows: larger units measurably hurt (A/B at 10M
    # turns: 104k-row units build 2.4x slower than 64k — bigger
    # per-task intermediates thrash the allocator/page cache, and
    # coarser tasks straggle)
    unit_rows = min(65_536, max(16_384, n_turns // (ncpu * 3)))
    build_metrics: dict = {}
    t0 = time.monotonic()
    build_index(src, idx_dir, cfg, target_unit_rows=unit_rows, metrics=build_metrics)
    timings["build"] = round(time.monotonic() - t0, 3)

    # 2. BM25 top-10 latency (p50 over a fixed query mix)
    idx = Index(idx_dir)
    idx.warmup()
    vocab = build_vocab()
    queries = []
    for i in range(40):
        a = vocab[(137 + i * 61) % 2000]
        b_ = vocab[(411 + i * 97) % 6000]
        c = vocab[(911 + i * 13) % 300]
        queries.append(f"{a} {b_} {c}" if i % 2 else f"{a} {b_}")
    lat = []
    for q in queries:
        t0 = time.monotonic()
        idx.search(q, field="text", k=10)
        lat.append(time.monotonic() - t0)
    timings["bm25_total"] = round(sum(lat), 3)
    p50_ms = round(1000 * statistics.median(lat), 2)
    # batched mode: same 40 queries in ONE RPC per shard (amortizes
    # the actor round-trip that dominates single-query p50 here);
    # kept out of `timings` so the summed total stays comparable
    # across rounds
    t0 = time.monotonic()
    idx.search_many(queries, field="text", k=10)
    batch_sec = time.monotonic() - t0
    idx.close()

    # 3. sf-dir pipelines (driver-contract subset)
    import __ray_entry__ as entrymod

    for name in ("term_df_top50", "bm25_top10", "lineitem_group_agg", "events_window_hourly"):
        t0 = time.monotonic()
        out = entrymod.queries()[name](sf_dir)
        if hasattr(out, "to_pandas"):
            out.to_pandas()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "transcript index build + BM25 p50 + sf pipelines",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "num_cpus": ncpu,
                "turns": n_turns,
                "build_turns_per_sec": round(n_turns / timings["build"], 1),
                "build_stages": {
                    "segments": [
                        {k: s[k] for k in ("segment", "rows", "sec", "rows_per_sec") if k in s}
                        for s in build_metrics.get("segments", [])
                    ],
                    "stats_sec": build_metrics.get("stats_sec"),
                    "termstats_sec": build_metrics.get("termstats_sec"),
                },
                "bm25_p50_ms": p50_ms,
                "bm25_batch_sec": round(batch_sec, 3),
                "bm25_batch_qps": round(len(queries) / batch_sec, 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--roundtrip" in sys.argv:
        run_roundtrip()
    else:
        main()
