"""Deterministic synthetic transcript corpus (FIXTURES.md F1).

Schema = the driver ``input_hint``: ``conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp[us]``. Seeded,
Zipf(s=1.1) token distribution over a fixed 10k-word vocabulary whose
hottest ranks are the reference's stopwords — this guarantees
stopword-frequency hot terms so the salted/chunked aggregation path is
exercised. Occasional ``,;:.-`` separators exercise the reference
tokenizer split class (``src/lib/analyzer/standard-tokenizer.ts:4``).

Generation is vectorized and cached on disk (multiple Parquet files so
reads parallelize); everything is a pure function of (n_turns, seed).
"""

from __future__ import annotations

import os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from yaii_ray.analysis.tokenizer import STOPWORDS

VOCAB_SIZE = 10_000
SEED = 42
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "browser", "python", "bash", "editor", "calculator", "sql", "http"]
SEPARATORS = [" ", " ", " ", " ", " ", " ", " ", " ", ", ", ". "]
EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp


def build_vocab() -> list[str]:
    words = sorted(w for w in STOPWORDS if w)
    i = 0
    while len(words) < VOCAB_SIZE:
        words.append(f"term{i:05d}")
        i += 1
    return words


# Conversation sizes are 1 + (i*7919 % 12); 7919 ≡ 11 (mod 12), and
# 11·i mod 12 cycles through every residue, so sizes repeat with
# period 12 and every 12 consecutive conversations cover exactly
#   12 + (0+1+...+11) = 78 turns.
# That closed form lets any row range [offset, offset+n) derive its
# (conv, turn) structure in O(n) with no global prefix sum — the
# property that makes generation streaming/sharded at any scale.
_PERIOD_CONVS = 12
_PERIOD_TURNS = 78
_SIZES_PERIOD = 1 + (np.arange(_PERIOD_CONVS, dtype=np.int64) * 7919) % 12
_CUM_PERIOD = np.concatenate([[0], np.cumsum(_SIZES_PERIOD)])  # len 13


def _conv_turn_for_rows(offset: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Global row index range -> (conv index, turn index) arrays."""
    rows = offset + np.arange(n, dtype=np.int64)
    block = rows // _PERIOD_TURNS
    within = rows % _PERIOD_TURNS
    local_conv = np.searchsorted(_CUM_PERIOD, within, side="right") - 1
    conv = block * _PERIOD_CONVS + local_conv
    turn = within - _CUM_PERIOD[local_conv]
    return conv, turn.astype(np.int32)


def generate_transcripts_slice(offset: int, length: int, seed: int = SEED) -> pa.Table:
    """Rows [offset, offset+length) of the infinite deterministic
    corpus — a pure function of (offset, length, seed), so generation
    shards/streams at any scale (10^12 turns never materialize).

    rng streams are seeded (seed, offset), so slices are deterministic
    per (offset, length) partitioning (the writers below always cut at
    ``rows_per_file`` boundaries, keeping cached corpora consistent).
    """
    rng = np.random.default_rng([seed, offset])
    vocab = np.array(build_vocab())
    n = length

    conv_seq, turn_idx = _conv_turn_for_rows(offset, n)
    conv_ids = np.char.add("conv", np.char.zfill(conv_seq.astype("U10"), 10))
    roles = np.array(ROLES)[(offset + np.arange(n)) % 4]

    tool_draw = rng.integers(0, 10, size=n)
    tools = np.where(tool_draw < 8, None, np.array(TOOLS)[rng.integers(0, 8, size=n)])

    ts = EPOCH_US + conv_seq * 3_600_000_000 + turn_idx.astype(np.int64) * 1_000_000

    # text: 5..60 tokens, Zipf(1.1) ranks clipped to vocab
    lengths = rng.integers(5, 61, size=n)
    flat_n = int(lengths.sum())
    ranks = rng.zipf(1.1, size=flat_n)
    ranks = np.minimum(ranks, VOCAB_SIZE) - 1
    flat_tokens = vocab[ranks]
    seps = np.array(SEPARATORS)[rng.integers(0, len(SEPARATORS), size=flat_n)]
    # last token of each row gets a sentinel separator; one C-level
    # join + split assembles all texts with no per-row Python loop
    # (sentinel is \x1f — \x00 would be eaten by numpy's U-dtype
    # null-termination)
    ends = np.cumsum(lengths) - 1
    seps[ends] = "\x1f"
    pieces = np.char.add(flat_tokens, seps)
    texts = "".join(pieces.tolist()).split("\x1f")[:n]

    return pa.table(
        {
            "conv_id": pa.array(conv_ids.tolist(), type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles.tolist(), type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools.tolist(), type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def generate_transcripts(n_turns: int, seed: int = SEED) -> pa.Table:
    """Whole corpus as one table (tests / small fixtures)."""
    return generate_transcripts_slice(0, n_turns, seed)


def transcripts_path(
    n_turns: int,
    seed: int = SEED,
    base: str = "/tmp/yaii_corpus",
    rows_per_file: int = 250_000,
    row_group_size: int = 65_536,
) -> str:
    """Generate (once, cached) and return the corpus directory.

    Written as multi-row-group Parquet files so the read stage
    parallelizes (the build's unit planner splits on row-group
    boundaries); files are strictly ordered by (conv_id, turn_idx)
    across the file-name sort order — doc-id assignment relies on this.
    """
    out = os.path.join(base, f"n{n_turns}_s{seed}_rg{row_group_size}_v2")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    # parts are generated as independent Ray tasks when a session is
    # up (each part is a pure function of its offset), else serially
    offsets = list(range(0, n_turns, rows_per_file))

    def write_part(part: int, offset: int) -> str:
        n = min(rows_per_file, n_turns - offset)
        tbl = generate_transcripts_slice(offset, n, seed)
        dest = os.path.join(out, f"part-{part:05d}.parquet")
        if not os.path.exists(dest):
            tmp = f"{dest}.tmp-{os.getpid()}"
            pq.write_table(tbl, tmp, row_group_size=row_group_size)
            os.replace(tmp, dest)
        return dest

    try:
        import ray

        if ray.is_initialized() and len(offsets) > 1:
            remote = ray.remote(num_cpus=1)(write_part)
            ray.get([remote.remote(i, off) for i, off in enumerate(offsets)])
        else:
            raise ImportError
    except ImportError:
        for i, off in enumerate(offsets):
            write_part(i, off)
    with open(marker, "w") as f:
        f.write("ok")
    return out
