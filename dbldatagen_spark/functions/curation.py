"""End-to-end corpus curation: the composite every LLM-data pipeline runs —
language filter + quality gate + near-duplicate removal (keep one canonical
document per duplicate cluster).

Composition, not new machinery: language ID and quality scoring are pure
column expressions that run inside the scan; near-dup clustering reuses
:func:`~dbldatagen_spark.functions.dedup.ngram_jaccard_pairs` (or any other
pair generator) + :func:`~dbldatagen_spark.functions.dedup.duplicate_components`.
The only data moved is (doc_id, hash/label) pairs; document bodies stream
straight from the scan to the output filter. The final removal is a
left-anti join against the non-canonical id set — ids only, so the shuffle
is bytes-per-doc, not payload.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbldatagen_spark.functions.dedup import (
    duplicate_components,
    ngram_jaccard_pairs,
)
from dbldatagen_spark.functions._parallel import ensure_parallelism
from dbldatagen_spark.functions.text_analysis import (
    detect_language,
    quality_metrics,
)


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    lang: str = "en",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.5,
    shingle_k: int = 3,
    max_posting_len: Optional[int] = 1000,
) -> DataFrame:
    """Return the curated keep-set: documents in ``lang`` with
    ``quality_score >= min_quality``, minus every near-duplicate that is
    not its cluster's canonical (minimum-id) member.

    ``max_posting_len`` is passed through to :func:`ngram_jaccard_pairs`:
    the default 1000 keeps the pair stage bounded at scale (a viral
    boilerplate shingle is a d^2 explosion); pass ``None`` for exact
    small-corpus dedup where every shared shingle must count.

    Output: (id, detected_lang, quality_score) for each kept document.
    """
    langs = detect_language(df, id_col, text_col).select(id_col, "detected_lang")
    quality = quality_metrics(df, id_col, text_col).select(id_col, "quality_score")
    pairs = ngram_jaccard_pairs(
        df, id_col, text_col, k=shingle_k, threshold=jaccard_threshold,
        max_posting_len=max_posting_len,
    )
    non_canonical = duplicate_components(pairs).where(
        F.col("vertex") != F.col("component")
    ).select(F.col("vertex").alias(id_col))
    return (
        df.select(id_col)
        .join(langs, id_col)
        .join(quality, id_col)
        .where(
            (F.col("detected_lang") == lang)
            & (F.col("quality_score") >= F.lit(min_quality))
        )
        .join(non_canonical, id_col, "left_anti")
        .select(id_col, "detected_lang", "quality_score")
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_doc_frac: float = 0.05,
    min_docs: int = 2,
) -> DataFrame:
    """Remove corpus-wide boilerplate lines (headers, footers, nav chrome,
    license banners): any trimmed line appearing in at least
    ``max(min_docs, ceil(min_doc_frac * n_docs))`` distinct documents is
    stripped from every document.

    Returns ``(id, cleaned_text, n_lines_removed)``; line order within each
    document is preserved, blank lines are structural and never counted as
    boilerplate.

    Scale shape: one explode to ``(trimmed_line, id)``, a distinct-doc
    count per line (shuffle keyed by line content — partial aggregation
    collapses each partition's repeats map-side), a broadcast-able
    boilerplate set joined back (boilerplate lines are few by definition;
    Spark's AQE broadcasts the small side), and one per-doc reassembly
    keyed by id. Nothing quadratic; the corpus text moves at most twice.
    The document count rides the plan as a 1-row broadcast aggregate, not
    a driver-side action.
    """
    df = ensure_parallelism(df)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_pos", "_line"),
    ).withColumn("_key", F.trim(F.col("_line")))

    n_docs = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    per_line = (
        lines.where(F.col("_key") != "")
        .groupBy("_key")
        .agg(F.countDistinct(id_col).alias("_docs_with_line"))
    )
    boilerplate = (
        per_line.crossJoin(F.broadcast(n_docs))
        .where(
            F.col("_docs_with_line")
            >= F.greatest(
                F.lit(int(min_docs)),
                F.ceil(F.lit(float(min_doc_frac)) * F.col("_n_docs")).cast("int"),
            )
        )
        .select("_key")
    )
    kept = lines.join(boilerplate, "_key", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("cleaned_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_total"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
            (F.col("_n_total") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_lines_removed"),
        )
    )
