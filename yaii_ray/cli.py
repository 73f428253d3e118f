"""CLI entry point — the ``ray job submit`` surface of the north rule.

Examples (on a cluster, ``ray job submit --working-dir . --`` prefix)::

    python -m yaii_ray.cli build --input /data/transcripts \
        --out /data/idx --schema transcripts --num-shards 32
    python -m yaii_ray.cli search --index /data/idx \
        --query "error handling retry" --k 10
    python -m yaii_ray.cli compact --index /data/idx --out /data/idx2

Owns its Ray session (guarded init) — library code never calls
ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int) -> bool:
    """Init Ray if needed; returns True when WE initialized it (the
    caller only shuts down a session it owns)."""
    from yaii_ray import tune_allocator

    # no-op for workers when attaching to an already-running cluster
    # (env can't reach an existing raylet — see tune_allocator's doc)
    tune_allocator()
    import ray

    owned = not ray.is_initialized()
    if owned:
        # explicit num_cpus: containerized hosts often misreport core
        # counts to auto-detection (this sandbox's nproc says 1)
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return owned


def main(argv: list[str] | None = None) -> int:
    import os

    p = argparse.ArgumentParser(prog="yaii_ray")
    p.add_argument(
        "--num-cpus",
        type=int,
        default=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--schema", default="transcripts", choices=["transcripts", "documents"])
    b.add_argument("--num-shards", type=int, default=16)
    b.add_argument("--chunk-shift", type=int, default=None)
    b.add_argument(
        "--unit-rows", type=int, default=65_536,
        help="target rows per build unit (resume only skips segments "
        "whose unit plan matches: changing this re-plans and rebuilds)",
    )
    b.add_argument("--units-per-segment", type=int, default=256)

    s = sub.add_parser("search", help="BM25 top-k query")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--field", default="text")
    s.add_argument("--k", type=int, default=10)

    c = sub.add_parser("count", help="boolean keyword count")
    c.add_argument("--index", required=True)
    c.add_argument("--token", required=True)
    c.add_argument("--field", default=None)

    m = sub.add_parser("compact", help="merge all segments into one")
    m.add_argument("--index", required=True)
    m.add_argument("--out", required=True)

    args = p.parse_args(argv)
    owned = _ensure_ray(args.num_cpus)

    if args.cmd == "build":
        from yaii_ray.build import build_index, load_manifest
        from yaii_ray.config import documents_config, transcripts_config

        cfg = (
            transcripts_config(args.num_shards)
            if args.schema == "transcripts"
            else documents_config(args.num_shards)
        )
        if args.chunk_shift is not None:
            cfg.chunk_shift = args.chunk_shift
        metrics: dict = {}
        build_index(
            args.input,
            args.out,
            cfg,
            target_unit_rows=args.unit_rows,
            units_per_segment=args.units_per_segment,
            metrics=metrics,
        )
        print(json.dumps({"index": args.out, "metrics": metrics}))
    elif args.cmd == "search":
        from yaii_ray.engine import Index

        idx = Index(args.index)
        t = idx.search(args.query, field=args.field, k=args.k)
        print(
            json.dumps(
                {
                    "doc_ids": t["doc_id"].to_pylist(),
                    "scores": t["score"].to_pylist(),
                }
            )
        )
        idx.close()
    elif args.cmd == "count":
        from yaii_ray.engine import Index
        from yaii_ray.query import dsl

        idx = Index(args.index)
        print(json.dumps({"count": idx.count(dsl.token(args.token, args.field))}))
        idx.close()
    elif args.cmd == "compact":
        from yaii_ray.build import compact_index

        compact_index(args.index, args.out)
        print(json.dumps({"index": args.out}))
    if owned:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
