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
