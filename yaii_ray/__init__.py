"""yaii_ray — a Ray-Data-native inverted-index + BM25 query engine.

From-scratch reimplementation of the *capabilities* of gpicron/yaii
(reference at /root/reference, MIT) on top of ray.data Datasets:

- tokenize/normalize as zero-copy Arrow ``map_batches`` stages
- posting-list construction as a term-keyed groupby-aggregate shuffle
  (salted/chunked for hot terms)
- delta + VByte compressed postings with block-max sidecars
- document-partitioned index shards served by a stateful actor pool
- block-max WAND top-k BM25 scoring (rank-identical to an exact oracle)
- boolean / sort / aggregation queries matching yaii's golden tests
- per-partition (segment) checkpoint + manifest for resumable builds

The reference is a single-process Node.js engine; nothing here is a
port — see SURVEY.md for the capability mapping (file:line citations
into the reference appear in docstrings throughout).
"""

import os as _os
import sys as _sys

# Ray worker processes import this package by name; make sure they can
# even when the driver wasn't started from the repo root (workers
# inherit the driver's environment, so extending PYTHONPATH before
# ray.init covers task/actor deserialization).
_pkg_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _pkg_parent not in _sys.path:
    _sys.path.insert(0, _pkg_parent)
_pp = _os.environ.get("PYTHONPATH", "")
if _pkg_parent not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _pkg_parent + (_os.pathsep + _pp if _pp else "")
    )

ALLOC_ENV = {
    "ARROW_DEFAULT_MEMORY_POOL": "system",
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "-1",
}


def tune_allocator() -> None:
    """Set retained-heap allocator env vars (see BASELINE.md "allocator
    note": this class of VM services fresh page faults at ~25 MB/s, and
    default glibc/jemalloc mmap+munmap of every large allocation
    re-faults pages per batch; ~25% build wall time here).

    MUST run before ``ray.init`` in the process that will start the
    raylet — workers inherit the raylet's environment. Attaching to an
    already-running cluster? Pass these via
    ``ray.init(runtime_env={"env_vars": ALLOC_ENV})`` instead; mutating
    os.environ after the raylet exists reaches no worker.
    """
    for k, v in ALLOC_ENV.items():
        _os.environ.setdefault(k, v)

from yaii_ray.config import FieldConfig, IndexConfig, Flags
from yaii_ray.query.dsl import (
    all_query,
    and_query,
    not_query,
    number,
    number_range,
    or_query,
    present,
    token,
)

__all__ = [
    "FieldConfig",
    "IndexConfig",
    "Flags",
    "token",
    "all_query",
    "and_query",
    "or_query",
    "not_query",
    "number",
    "number_range",
    "present",
]

__version__ = "0.1.0"
