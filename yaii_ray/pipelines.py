"""Composed training-data pipelines over ``yaii_ray.ops`` building
blocks — the end-to-end shapes a large-scale curation job runs, kept
streaming from read to write.

:func:`curate` is the canonical one: score -> filter -> exact-dedup,
every stage a vectorized ``map_batches``/one-shuffle op, so the whole
pipeline is Ray-Data lazy and spills through the object store instead
of materializing anywhere. Write the result with
``result.write_parquet(out_dir, partition_cols=["lang_guess"])`` for
resumable partitioned output.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from yaii_ray.ops.dedup import dedup_exact
from yaii_ray.ops.textstats import lang_id_batch, text_stats_batch


def curate(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    min_quality: float | None = 0.5,
    langs: tuple[str, ...] | None = ("en",),
    bench_ds=None,
    decontam_n: int = 13,
    dedupe: bool = True,
    dedup_buckets: int = 16,
    max_dup_word_frac: float | None = None,
    redact: bool = False,
    sample_rates: dict[str, float] | None = None,
    sample_strata: str = "source",
):
    """Curation pipeline: text statistics + language ID per batch,
    optional Gopher-style repetition screen (``max_dup_word_frac`` —
    drop docs whose duplicate-word fraction exceeds it),
    quality/language filter, optional benchmark decontamination
    (``bench_ds`` — n-gram overlap screen, broadcast small side),
    exact content dedup (keep the min-id row per distinct text), then
    optional PII redaction (``redact`` — after dedup, on survivors
    only) and deterministic per-stratum hash sampling
    (``sample_rates`` — data mixing; a pure function of the id, so
    the stage order is part of the contract: sampling AFTER dedup
    means the min-id winner is chosen before any row is sampled away).
    Returns the surviving rows as a streaming Dataset carrying the
    original columns plus the score columns (n_tokens,
    stopword_ratio, ..., quality, lang_guess).

    The quality threshold compares the 6-decimal ROUNDED score (both
    here and in the SQL oracle) so the float boundary cannot flip row
    membership between engines. Tie-mode caveat: ``pc.round`` rounds
    half-to-even while DuckDB ``round`` rounds half-away-from-zero —
    a score landing EXACTLY on a 5e-7 tie could differ; these quality
    ratios are quotients of small integers and never land there, so
    the convention is round-to-6 on both sides and ignore the mode."""

    def score(b: pa.Table) -> pa.Table:
        out = lang_id_batch(text_stats_batch(b, col), col)
        if max_dup_word_frac is not None:
            from yaii_ray.ops.textstats import repetition_stats_batch

            out = repetition_stats_batch(out, col)
        return out

    scored = ds.map_batches(score, batch_format="pyarrow")

    if min_quality is not None or langs is not None or max_dup_word_frac is not None:

        def keep(b: pa.Table) -> pa.Table:
            mask = pa.array([True] * b.num_rows, type=pa.bool_())
            if min_quality is not None:
                q = pc.round(b["quality"], ndigits=6)
                mask = pc.and_(mask, pc.greater_equal(q, pa.scalar(float(min_quality))))
            if langs is not None:
                mask = pc.and_(
                    mask,
                    pc.is_in(b["lang_guess"], value_set=pa.array(sorted(langs))),
                )
            if max_dup_word_frac is not None:
                d = pc.round(b["dup_word_frac"], ndigits=6)
                mask = pc.and_(
                    mask,
                    pc.less_equal(d, pa.scalar(float(max_dup_word_frac))),
                )
            return b.filter(mask)

        scored = scored.map_batches(keep, batch_format="pyarrow")

    if bench_ds is not None:
        # benchmark decontamination BETWEEN the cheap per-row filters
        # and the dedup shuffle — the broadcast filter shrinks what the
        # groupby has to move (yaii_ray.ops.decontam)
        from yaii_ray.ops.decontam import decontaminate_ngrams

        scored = decontaminate_ngrams(
            scored, bench_ds, col=col, n=decontam_n, keep="clean"
        )

    if dedupe:
        scored = dedup_exact(scored, col=col, id_col=id_col, nbuckets=dedup_buckets)

    if redact:
        from yaii_ray.ops.curation import redact_pii_batch

        scored = scored.map_batches(
            lambda b: redact_pii_batch(b, col), batch_format="pyarrow"
        )

    if sample_rates is not None:
        from yaii_ray.ops.curation import sample_hash

        scored = sample_hash(
            scored, rates=sample_rates, id_col=id_col, strata_col=sample_strata
        )
    return scored
