"""Index / field configuration — mirrors the reference's flag surface.

Reference: ``src/lib/api/config.ts:3-28`` — fields carry a bitmask
``SEARCHABLE | STORED | SORT_OPTIMIZED | IGNORED``, an optional
analyzer, an optional generator (computed field) and ``addToAllField``.
``SORT_OPTIMIZED`` is kept as an accepted flag but is a no-op here:
Parquet/Arrow sorts native columns directly (SURVEY.md §2.6 K4).

Internal fields (reference ``src/lib/internal/utils.ts:34-39``):
``_all`` catch-all text field, ``_field`` presence index. We use the
ASCII names ``_all`` / ``_field`` (the reference's ``£_*`` names are an
implementation detail; its public query surface already says
``'_all'`` — ``test/system/test-index.ts:300``).
"""

from __future__ import annotations

import enum
import hashlib
import json
from dataclasses import dataclass, field


class Flags(enum.IntFlag):
    SEARCHABLE = 1
    STORED = 2
    SORT_OPTIMIZED = 4
    IGNORED = 8


FIELD_ALL = "_all"
FIELD_PRESENCE = "_field"

# Kinds drive the term encoding in the build flat-map.
KIND_TEXT = "text"        # analyzed string -> string terms, tf + doclen
KIND_KEYWORD = "keyword"  # whole string = one term
KIND_NUMBER = "number"    # int/float -> 9 trie terms
KIND_BOOL = "bool"        # -> TERM_TRUE/TERM_FALSE


@dataclass
class FieldConfig:
    flags: Flags = Flags.SEARCHABLE | Flags.STORED
    kind: str = KIND_TEXT
    analyzer: str = "standard"       # name in the analyzer registry
    add_to_all: bool = True
    scored: bool = False             # participates in BM25 (tf + doclen emitted)

    def to_json(self) -> dict:
        return {
            "flags": int(self.flags),
            "kind": self.kind,
            "analyzer": self.analyzer,
            "add_to_all": self.add_to_all,
            "scored": self.scored,
        }

    @staticmethod
    def from_json(d: dict) -> "FieldConfig":
        return FieldConfig(
            flags=Flags(d["flags"]),
            kind=d["kind"],
            analyzer=d["analyzer"],
            add_to_all=d["add_to_all"],
            scored=d["scored"],
        )


@dataclass
class IndexConfig:
    fields: dict[str, FieldConfig] = field(default_factory=dict)
    # JSON-able custom-analyzer specs (tokenizer.analyzer_from_spec) —
    # shipped to build workers so the registry agrees across processes
    analyzers: dict[str, dict] = field(default_factory=dict)
    # default config applied to fields seen in the data but not declared
    # (reference: defaultFieldConfig lazily applied,
    # mutable-segment.ts:84-92)
    default: FieldConfig = field(
        default_factory=lambda: FieldConfig(
            flags=Flags.SEARCHABLE | Flags.STORED, kind=KIND_TEXT, analyzer="standard"
        )
    )
    all_field: bool = True           # maintain the _all catch-all field
    all_analyzer: str = "standard_stop"  # _all uses the stopword filter
    all_scored: bool = False         # _all participates in BM25 (dl tracked)
    num_shards: int = 8
    chunk_shift: int = 20            # salt granularity: doc-range chunks of 2^20 ids
    block_size: int = 128            # block-max block length (postings per block)
    k1: float = 1.2
    b: float = 0.75

    def resolve(self, name: str) -> FieldConfig:
        return self.fields.get(name, self.default)

    def to_json(self) -> dict:
        return {
            "fields": {k: v.to_json() for k, v in self.fields.items()},
            "analyzers": self.analyzers,
            "default": self.default.to_json(),
            "all_field": self.all_field,
            "all_analyzer": self.all_analyzer,
            "all_scored": self.all_scored,
            "num_shards": self.num_shards,
            "chunk_shift": self.chunk_shift,
            "block_size": self.block_size,
            "k1": self.k1,
            "b": self.b,
        }

    @staticmethod
    def from_json(d: dict) -> "IndexConfig":
        return IndexConfig(
            fields={k: FieldConfig.from_json(v) for k, v in d["fields"].items()},
            analyzers=d.get("analyzers", {}),
            default=FieldConfig.from_json(d["default"]),
            all_field=d["all_field"],
            all_analyzer=d["all_analyzer"],
            all_scored=d.get("all_scored", False),
            num_shards=d["num_shards"],
            chunk_shift=d["chunk_shift"],
            block_size=d["block_size"],
            k1=d["k1"],
            b=d["b"],
        )

    # bump when the on-disk index layout changes incompatibly, so
    # fingerprint-keyed caches (e.g. /tmp/yaii_idx_cache) self-invalidate
    FORMAT_VERSION = 1

    def fingerprint(self) -> str:
        return hashlib.sha256(
            json.dumps({"format": self.FORMAT_VERSION, **self.to_json()},
                       sort_keys=True).encode()
        ).hexdigest()[:16]


def transcripts_config(num_shards: int = 8) -> IndexConfig:
    """Index config for the driver's transcript schema (input_hint)."""
    return IndexConfig(
        fields={
            "conv_id": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "turn_idx": FieldConfig(kind=KIND_NUMBER, add_to_all=False),
            "role": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "text": FieldConfig(
                kind=KIND_TEXT, analyzer="standard_stop", scored=True, add_to_all=False
            ),
            "tool": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "ts": FieldConfig(flags=Flags.STORED, kind=KIND_NUMBER, add_to_all=False),
        },
        all_field=False,
        num_shards=num_shards,
    )


def documents_config(num_shards: int = 4) -> IndexConfig:
    """Index config for the testdata ``documents`` table."""
    return IndexConfig(
        fields={
            # input doc_id is 0..N-1 in row order == our dense internal
            # doc_id, so indexing/storing it again would only collide
            # with the engine's id column
            "doc_id": FieldConfig(flags=Flags.IGNORED, kind=KIND_NUMBER, add_to_all=False),
            "text": FieldConfig(
                kind=KIND_TEXT, analyzer="standard_stop", scored=True, add_to_all=False
            ),
            "lang": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "source": FieldConfig(kind=KIND_KEYWORD, add_to_all=False),
            "n_chars": FieldConfig(kind=KIND_NUMBER, add_to_all=False),
        },
        all_field=False,
        num_shards=num_shards,
    )
