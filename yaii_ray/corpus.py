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


def generate_transcripts(n_turns: int, seed: int = SEED) -> pa.Table:
    """Generate exactly ``n_turns`` transcript turns as an Arrow table."""
    rng = np.random.default_rng(seed)
    vocab = np.array(build_vocab())

    # conversation sizes: 1 + (i*7919 % 12)  (FIXTURES.md F1)
    est_convs = n_turns // 6 + 16
    sizes = 1 + (np.arange(est_convs, dtype=np.int64) * 7919) % 12
    cum = np.cumsum(sizes)
    n_convs = int(np.searchsorted(cum, n_turns) + 1)
    sizes = sizes[:n_convs]
    total = int(sizes.sum())

    conv_seq = np.repeat(np.arange(n_convs, dtype=np.int64), sizes)[:n_turns]
    turn_idx = (np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(sizes) - sizes, sizes))[
        :n_turns
    ].astype(np.int32)

    conv_ids = np.char.add("conv", np.char.zfill(conv_seq.astype("U8"), 8))
    roles = np.array(ROLES)[np.arange(n_turns) % 4]

    tool_draw = rng.integers(0, 10, size=n_turns)
    tools = np.where(tool_draw < 8, None, np.array(TOOLS)[rng.integers(0, 8, size=n_turns)])

    ts = EPOCH_US + conv_seq * 3_600_000_000 + turn_idx.astype(np.int64) * 1_000_000

    # text: 5..60 tokens, Zipf(1.1) ranks clipped to vocab
    lengths = rng.integers(5, 61, size=n_turns)
    flat_n = int(lengths.sum())
    ranks = rng.zipf(1.1, size=flat_n)
    ranks = np.minimum(ranks, VOCAB_SIZE) - 1
    flat_tokens = vocab[ranks]
    seps = np.array(SEPARATORS)[rng.integers(0, len(SEPARATORS), size=flat_n)]

    offsets = np.concatenate([[0], np.cumsum(lengths)])
    texts = []
    for i in range(n_turns):
        a, b = offsets[i], offsets[i + 1]
        parts = flat_tokens[a:b]
        s = seps[a : b - 1]
        buf = []
        for j in range(len(parts) - 1):
            buf.append(parts[j])
            buf.append(s[j])
        buf.append(parts[-1])
        texts.append("".join(buf))

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
    out = os.path.join(base, f"n{n_turns}_s{seed}_rg{row_group_size}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    written = 0
    part = 0
    while written < n_turns:
        n = min(rows_per_file, n_turns - written)
        tbl = generate_transcripts_slice(n_turns, seed, written, n)
        pq.write_table(
            tbl,
            os.path.join(out, f"part-{part:05d}.parquet"),
            row_group_size=row_group_size,
        )
        written += n
        part += 1
    with open(marker, "w") as f:
        f.write("ok")
    return out


def generate_transcripts_slice(n_turns: int, seed: int, offset: int, length: int) -> pa.Table:
    """Slice [offset, offset+length) of the full deterministic corpus.

    For simplicity the full table is generated once per process and
    memoized; at the scales used in tests/bench (≤ a few million rows)
    this fits comfortably. A truly huge corpus would re-derive each
    slice from counters instead.
    """
    global _MEMO
    key = (n_turns, seed)
    if _MEMO.get("key") != key:
        _MEMO = {"key": key, "table": generate_transcripts(n_turns, seed)}
    return _MEMO["table"].slice(offset, length)


_MEMO: dict = {}
