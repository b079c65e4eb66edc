"""String-family builders: value lists, patterns, deterministic UUIDs.

All pure Catalyst expressions (reference semantics:
``/root/reference/dbldatagen/core/engine/columns/string.py:24-246`` and
``core/engine/columns/uuid.py:15-58``; implementation original).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from dbldatagen_spark.operators.distributions import (
    index_expr,
    weighted_index_expr,
)
from dbldatagen_spark.operators.seed import decorrelate

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_ALPHA_UPPER = _ALPHA.upper()

# width caps mirror the reference's plan-time guards
# (core/spec/_constants.py:12-25): seq 24, digit 18, alpha 64, hex 15
_WIDTH_CAPS = {"seq": 24, "digit": 18, "alpha": 64, "hex": 15}

_PLACEHOLDER_RE = re.compile(r"\{(seq|uuid|digit|alpha|hex)(?::(\d+))?\}")


@dataclass(frozen=True)
class _Token:
    kind: str  # 'literal' | 'seq' | 'uuid' | 'digit' | 'alpha' | 'hex'
    text: str = ""
    width: Optional[int] = None


def parse_pattern(pattern: str) -> List[_Token]:
    """Tokenize ``"ORD-{digit:4}-{alpha:3}"`` into literal/placeholder tokens,
    validating widths against the caps. Raises SpecValidationError on any
    malformed ``{...}`` group."""
    from dbldatagen_spark.plans.spec import SpecValidationError

    tokens: List[_Token] = []
    pos = 0
    for m in _PLACEHOLDER_RE.finditer(pattern):
        if m.start() > pos:
            tokens.append(_Token("literal", pattern[pos : m.start()]))
        kind = m.group(1)
        width = int(m.group(2)) if m.group(2) else None
        if kind == "uuid" and width is not None:
            raise SpecValidationError("{uuid} takes no width")
        if kind in ("digit", "alpha", "hex") and width is None:
            raise SpecValidationError(f"{{{kind}}} requires a width, e.g. {{{kind}:4}}")
        if width is not None:
            cap = _WIDTH_CAPS.get(kind)
            if cap is not None and not (1 <= width <= cap):
                raise SpecValidationError(
                    f"{{{kind}:{width}}} width out of range [1,{cap}]"
                )
        tokens.append(_Token(kind, width=width))
        pos = m.end()
    if pos < len(pattern):
        rest = pattern[pos:]
        if "{" in rest or "}" in rest:
            bad = re.search(r"\{[^}]*\}?", rest)
            if bad:
                raise SpecValidationError(f"malformed placeholder {bad.group(0)!r}")
        tokens.append(_Token("literal", rest))
    for t in tokens:
        if t.kind == "literal" and ("{" in t.text or "}" in t.text):
            raise SpecValidationError(f"stray brace in pattern literal {t.text!r}")
    return tokens


def _alpha_chars(seed_col: Column, column_seed: int, salt: int, width: int,
                 alphabet: str) -> Column:
    """``width`` independent alphabet characters via per-position decorrelated
    hashes; each char is ``substring(alphabet, pmod(h, len)+1, 1)``."""
    parts = []
    for i in range(width):
        h = F.xxhash64(F.lit(decorrelate(column_seed, salt * 1000 + i)), seed_col)
        idx = F.pmod(h, F.lit(len(alphabet))).cast("int") + F.lit(1)
        parts.append(F.substring(F.lit(alphabet), 1, len(alphabet)).substr(idx, F.lit(1)))
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def uuid_expr(seed_col: Column, column_seed: int) -> Column:
    """Deterministic UUID-shaped string (8-4-4-4-12 hex; not RFC-4122) from
    two 64-bit hash draws.

    Renders each hash once as a 16-char unsigned-hex string and slices
    the 8/4/4 and 4/12 groups out — bit-identical to formatting the five
    bit-field chunks with ``%x`` but ~3x faster at 10M rows: two
    hex renders + five substrings beat five Java ``format_string``
    invocations per row."""
    h1 = seed_col
    h2 = F.xxhash64(F.lit(decorrelate(column_seed, 0xBEEF)), seed_col)
    x1 = F.lpad(F.lower(F.hex(h1)), 16, "0")
    x2 = F.lpad(F.lower(F.hex(h2)), 16, "0")
    return F.concat(
        F.substring(x1, 1, 8), F.lit("-"),
        F.substring(x1, 9, 4), F.lit("-"),
        F.substring(x1, 13, 4), F.lit("-"),
        F.substring(x2, 1, 4), F.lit("-"),
        F.substring(x2, 5, 12),
    )


def pattern_expr(
    pattern_or_tokens: Union[str, Sequence[_Token]],
    seed_col: Column,
    id_col: Column,
    column_seed: int,
) -> Column:
    """Compile a pattern template into one concat expression.

    Each placeholder draws from its own decorrelated seed stream (salted by
    position) so ``{digit:4}-{digit:4}`` yields independent halves.
    """
    tokens = (
        parse_pattern(pattern_or_tokens)
        if isinstance(pattern_or_tokens, str)
        else list(pattern_or_tokens)
    )
    parts: List[Column] = []
    for pos, t in enumerate(tokens):
        if t.kind == "literal":
            parts.append(F.lit(t.text))
        elif t.kind == "seq":
            seq = id_col.cast("long") + F.lit(1)
            if t.width:
                parts.append(F.lpad(seq.cast("string"), t.width, "0"))
            else:
                parts.append(seq.cast("string"))
        elif t.kind == "uuid":
            h = F.xxhash64(F.lit(decorrelate(column_seed, pos + 7)), seed_col)
            parts.append(uuid_expr(h, decorrelate(column_seed, pos + 7)))
        elif t.kind == "digit":
            h = F.xxhash64(F.lit(decorrelate(column_seed, pos + 101)), seed_col)
            modulus = 10**t.width
            parts.append(
                F.lpad(F.pmod(h, F.lit(modulus)).cast("string"), t.width, "0")
            )
        elif t.kind == "hex":
            h = F.xxhash64(F.lit(decorrelate(column_seed, pos + 211)), seed_col)
            modulus = 16**t.width
            parts.append(
                F.lower(F.lpad(F.hex(F.pmod(h, F.lit(modulus))), t.width, "0"))
            )
        elif t.kind == "alpha":
            parts.append(
                _alpha_chars(seed_col, column_seed, pos + 307, t.width, _ALPHA_UPPER)
            )
        else:  # pragma: no cover
            raise ValueError(f"unknown token {t.kind}")
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def values_expr(
    values: Sequence,
    seed_col: Column,
    distribution,
    *,
    random: bool = True,
    id_col: Column = None,
    dtype: Optional[str] = None,
) -> Column:
    """Pick from an explicit value list.

    Non-random mode cycles by row id (v0 semantics); random mode uses the
    distribution (WeightedValues → cumulative-threshold fold).
    """
    from dbldatagen_spark.plans.spec import WeightedValues

    n = len(values)
    if not random:
        src = id_col if id_col is not None else seed_col
        idx = F.pmod(src.cast("long"), F.lit(n))
    elif isinstance(distribution, WeightedValues):
        idx = weighted_index_expr(seed_col, distribution.weights)
    else:
        idx = index_expr(seed_col, n, distribution)
    arr = F.array(*[F.lit(v) for v in values])
    out = F.element_at(arr, idx.cast("int") + F.lit(1))
    if dtype is not None and dtype not in ("infer",):
        from dbldatagen_spark.operators.numeric import spark_type_name

        out = out.cast(spark_type_name(dtype))
    return out
