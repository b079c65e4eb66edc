"""Broadcast Bloom filters for join prefiltering (runtime-filter pattern).

The canonical 100-TB join problem: a huge fact table semi/anti-joined
against a selective dimension subset.  A plain join shuffles the entire
fact side on the key; the production remedy (Spark's own
``spark.sql.optimizer.runtimeFilter.bloomFilter``, ORC/Parquet bloom
indexes, Flink's runtime filters) is to build a small bit set from the
dimension keys, broadcast it, and discard fact rows map-side BEFORE the
shuffle.  Bloom filters have no false negatives, so the prefilter is
lossless for semi joins; for anti joins, a bloom miss proves absence, so
only the (few) "maybe" rows need the exact join.

This module builds the filter distributively — per-partition bitmaps are
OR-merged by a ``bit_or`` aggregation on the word index, so driver
traffic is ``num_bits / 64`` longs regardless of key count — and tests
membership with pure Catalyst expressions (no UDF) against the broadcast
word array.

Hashing is dual-mode: ``hash_method="xxhash64"`` (default) keeps the
membership scan pure codegen arithmetic — the scale path; ``"md5"``
derives positions from hex windows of md5 digests (the repo's
engine-portable idiom: ``conv(substr(md5(..)),16,10)`` == DuckDB
``('0x'||substr(md5(..)))::BIGINT``) so an external SQL oracle can
replay bit positions bit-for-bit, at ~10x the per-row scan cost.

Reference parity: dbldatagen has no bloom surface; this extends the
training-pipeline toolkit (dedup/contamination anti-joins are its main
consumers).

.. rubric:: Compatibility note (breaking change)

The default ``hash_method`` changed from the md5-derived scheme to
``"xxhash64"`` (~5x faster scans), and the ``"md5"`` scheme's position
derivation itself changed: positions now come from independent 24-bit
hex windows of ``md5(seed:i//5:key)`` (5 positions per digest) instead
of the old 60-bit ``md5(seed:i:key)`` prefix.  Filters serialized or
positions replayed against an earlier revision will NOT line up —
rebuild the filter and its oracle together.  Every in-repo caller and
oracle uses the current scheme consistently.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_positions_expr",
    "bloom_build",
    "bloom_contains_expr",
    "bloom_semi_join",
    "bloom_anti_join",
]


def _require_pow2_words(num_bits: int) -> int:
    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    return num_bits // 64


def bloom_positions_expr(
    key: Column,
    *,
    num_bits: int,
    num_hashes: int,
    seed: int = 0,
    hash_method: str = "xxhash64",
) -> Column:
    """``array<long>`` of ``num_hashes`` bit positions in ``[0, num_bits)``
    for ``key`` — deterministic and partition-independent.

    ``hash_method="xxhash64"`` (default) is the scale path: salted
    native hashes, pure codegen.  ``hash_method="md5"`` derives each
    position from a 24-bit hex window of ``md5(seed:(i//5):key)``
    (window ``i%5``; one digest serves five positions) — ~10x the
    per-row cost, but replayable in any engine with ``md5``/``substr``
    for external verification.  Both are unbiased mod the power-of-2
    ``num_bits``.
    """
    _require_pow2_words(num_bits)
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    if hash_method == "md5" and num_bits > (1 << 24):
        raise ValueError(
            f"num_bits must be <= 2^24 for md5 (24-bit digest windows), "
            f"got {num_bits}"
        )
    return F.array(
        *_position_cols(
            key,
            num_bits=num_bits,
            num_hashes=num_hashes,
            seed=seed,
            hash_method=hash_method,
        )
    )


def _position_cols(
    key: Column,
    *,
    num_bits: int,
    num_hashes: int,
    seed: int,
    hash_method: str = "xxhash64",
) -> List[Column]:
    """The individual position expressions behind
    :func:`bloom_positions_expr` — kept as plain columns so
    :func:`bloom_contains_expr` can AND them flat and stay inside
    whole-stage codegen (higher-order functions evaluate interpreted).

    ``hash_method="xxhash64"`` (default): salted native hashes — the
    scale path; the membership scan is pure codegen arithmetic.
    ``hash_method="md5"``: 24-bit hex windows of md5 digests — ~10x the
    per-row cost (hex ``conv`` parsing), but replayable in any engine
    with ``md5``/``substr``, which is what an external oracle needs.
    Both are unbiased mod the power-of-2 ``num_bits``.
    """
    if hash_method == "xxhash64":
        return [
            F.pmod(F.xxhash64(F.lit(seed), F.lit(i), key), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    if hash_method != "md5":
        raise ValueError(
            f"hash_method must be 'xxhash64' or 'md5', got {hash_method!r}"
        )
    s = key.cast("string")
    digests = {
        g: F.md5(F.concat_ws(":", F.lit(seed), F.lit(g), s))
        for g in range((num_hashes + 4) // 5)
    }
    return [
        F.pmod(
            F.conv(
                F.substring(digests[i // 5], 1 + 6 * (i % 5), 6), 16, 10
            ).cast("long"),
            F.lit(num_bits),
        )
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
    seed: int = 0,
    hash_method: str = "xxhash64",
) -> List[int]:
    """Build the filter: returns ``num_bits / 64`` packed little-endian
    words (word ``w`` holds positions ``[64w, 64w+64)``; position ``p``
    sets bit ``p % 64``).

    Plan shape: positions explode map-side, distinct positions hash-agg
    (map-side combine; cardinality bounded by ``num_bits``), then a
    ``bit_or`` aggregation per word index — the ONLY driver traffic is
    at most ``num_bits / 64`` (word, bits) rows.  NULL keys are skipped
    (SQL join semantics: NULL matches nothing).
    """
    n_words = _require_pow2_words(num_bits)
    pos = (
        df.select(F.col(key_col).alias("_k"))
        .where(F.col("_k").isNotNull())
        .select(
            F.explode_outer(
                bloom_positions_expr(
                    F.col("_k"), num_bits=num_bits, num_hashes=num_hashes,
                    seed=seed, hash_method=hash_method,
                )
            ).alias("_p")
        )
        .where(F.col("_p").isNotNull())
        .distinct()
    )
    words_rows = (
        pos.groupBy((F.col("_p") / 64).cast("int").alias("_w"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(_p % 64 as int)))").alias("_bits"))
        .collect()
    )
    words = [0] * n_words
    for r in words_rows:
        words[r["_w"]] = r["_bits"]
    return words


def bloom_contains_expr(
    key: Column,
    words: List[int],
    *,
    num_bits: int,
    num_hashes: int,
    seed: int = 0,
    hash_method: str = "xxhash64",
) -> Column:
    """Membership test (``true`` = maybe present, ``false`` = definitely
    absent) as a pure expression: every hash position's bit must be set
    in the broadcast literal word array.  NULL keys test ``false``.
    """
    n_words = _require_pow2_words(num_bits)
    if len(words) != n_words:
        raise ValueError(f"words must have {n_words} entries, got {len(words)}")
    lit_words = F.lit(words)
    # flat AND of the per-position bit tests, NOT an F.aggregate fold over
    # the positions array: higher-order functions evaluate interpreted and
    # break whole-stage codegen for the scan they sit in; on the md5 path
    # codegen subexpression elimination additionally shares each digest
    # across its five windowed positions
    hit = F.lit(True)
    for p in _position_cols(
        key, num_bits=num_bits, num_hashes=num_hashes, seed=seed,
        hash_method=hash_method,
    ):
        word = F.element_at(lit_words, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        hit = hit & (F.expr("0L") != word.bitwiseAND(bit))
    return F.when(key.isNotNull(), hit).otherwise(F.lit(False))


def _build_and_filter(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_bits: int,
    num_hashes: int,
    seed: int,
    hash_method: str = "xxhash64",
    words: Optional[List[int]] = None,
) -> Tuple[DataFrame, DataFrame]:
    if words is None:
        words = bloom_build(
            small, small_key, num_bits=num_bits, num_hashes=num_hashes,
            seed=seed, hash_method=hash_method,
        )
    maybe = bloom_contains_expr(
        F.col(big_key), words, num_bits=num_bits, num_hashes=num_hashes,
        seed=seed, hash_method=hash_method,
    )
    return big.where(maybe), big.where(~maybe)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    small_on: str | None = None,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
    seed: int = 0,
    hash_method: str = "xxhash64",
    words: Optional[List[int]] = None,
) -> DataFrame:
    """``big LEFT SEMI JOIN small`` with a broadcast-bloom prefilter:
    fact rows whose key misses the bloom are discarded BEFORE the
    shuffle (no false negatives, so the result is exactly the semi
    join); survivors — true matches plus the bloom's false positives —
    go through the exact semi join, which at typical selectivity is now
    broadcast-able even when ``big`` was not.

    Scale shape: one driver round-trip of ``num_bits / 64`` longs to
    build the filter, then the map-side discard removes
    ``(1 - selectivity - fpp)`` of the fact side from the join exchange.
    Callers that already hold the built filter (e.g. to share one build
    across a semi/anti pair) pass it via ``words=`` and skip the build
    job entirely.
    """
    sk = small_on or on
    maybe, _ = _build_and_filter(
        big, small, on, sk, num_bits, num_hashes, seed, hash_method,
        words=words,
    )
    dim = small.select(sk).distinct()
    cond = maybe[on] == dim[sk]
    return maybe.join(dim, cond, "left_semi").select(*big.columns)


def bloom_anti_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    small_on: str | None = None,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
    seed: int = 0,
    hash_method: str = "xxhash64",
    words: Optional[List[int]] = None,
) -> DataFrame:
    """``big LEFT ANTI JOIN small`` with a broadcast-bloom shortcut: a
    bloom miss PROVES the key is absent from ``small``, so those rows
    are emitted with no join at all; only the "maybe" sliver (true
    matches + false positives) pays the exact anti join.  This is the
    decontamination-scrub shape: ``small`` = banned/eval keys, ``big`` =
    the corpus, and virtually the whole corpus short-circuits map-side.

    The two branches scan ``big`` twice; at scale that is a column-
    pruned, predicate-pushed parquet re-scan — strictly cheaper than
    shuffling the full fact side, which is what the plain anti join
    does.  NULL fact keys follow SQL anti-join semantics (kept).
    A prebuilt filter passes through ``words=`` as in
    :func:`bloom_semi_join`.
    """
    sk = small_on or on
    maybe, definite_miss = _build_and_filter(
        big, small, on, sk, num_bits, num_hashes, seed, hash_method,
        words=words,
    )
    null_rows = big.where(F.col(on).isNull())
    dim = small.select(sk).distinct()
    cond = maybe[on] == dim[sk]
    checked = maybe.join(dim, cond, "left_anti")
    return (
        definite_miss.where(F.col(on).isNotNull())
        .unionByName(checked)
        .unionByName(null_rows)
        .select(*big.columns)
    )
