"""Row-filter / transform constraints.

Reference surface: ``/root/reference/dbldatagen/constraints/*`` (8 classes;
semantics table in SURVEY §2.4). Applied after generation: each constraint
may transform the DataFrame and/or contribute a filter expression; all
filter expressions are AND-combined into a **single** ``where`` so Catalyst
sees one conjunctive predicate (reference ``data_generator.py:1609-1640``).

Streaming gate: constraints with ``supports_streaming = False`` raise at
build time when streaming output is requested.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {"<", "<=", ">", ">=", "==", "=", "!=", "<>"}


def _cols(columns: Union[str, Sequence[str]]) -> List[str]:
    return [columns] if isinstance(columns, str) else list(columns)


def _apply_op(col: Column, op: str, other) -> Column:
    if op in ("==", "="):
        return col == other
    if op in ("!=", "<>"):
        return col != other
    if op == "<":
        return col < other
    if op == "<=":
        return col <= other
    if op == ">":
        return col > other
    if op == ">=":
        return col >= other
    raise ValueError(f"unsupported operator {op!r} (use one of {sorted(_OPS)})")


class Constraint:
    """Base: optional DataFrame transform + optional filter expression."""

    supports_streaming: bool = True

    def prepare(self, spec) -> None:  # hook for pre-generation adjustments
        return None

    def transform(self, df: DataFrame) -> DataFrame:
        return df

    def filter_expression(self) -> Optional[Column]:
        return None

    @staticmethod
    def combine_filters(constraints: Sequence["Constraint"]) -> Optional[Column]:
        exprs = [c.filter_expression() for c in constraints]
        exprs = [e for e in exprs if e is not None]
        if not exprs:
            return None
        combined = exprs[0]
        for e in exprs[1:]:
            combined = combined & e
        return combined

    # -- reference-name surface (constraints/constraint.py:80-155,189-209) --

    @staticmethod
    def mkCombinedConstraintExpression(constraintExpressions) -> Optional[Column]:
        """AND-combine a list of Column filter expressions (None entries
        skipped); raises on non-list / non-Column input like the
        reference."""
        if constraintExpressions is None or not isinstance(constraintExpressions, list):
            raise ValueError(
                "Constraints must be a list of Pyspark SQL Column instances"
            )
        if not all(e is None or isinstance(e, Column) for e in constraintExpressions):
            raise ValueError(
                "Constraint expressions must be Pyspark SQL columns or None"
            )
        valid = [e for e in constraintExpressions if e is not None]
        if not valid:
            return None
        combined = valid[0]
        for e in valid[1:]:
            combined = combined & e
        return combined

    @property
    def supportsStreaming(self) -> bool:
        return self.supports_streaming

    @property
    def filterExpression(self) -> Optional[Column]:
        return self.filter_expression()

    def prepareDataGenerator(self, dataGenerator):
        """Reference-named form of :meth:`prepare`: may adjust the
        generator before build; returns it for chaining."""
        self.prepare(dataGenerator)
        return dataGenerator

    def transformDataframe(self, dataGenerator, dataFrame: DataFrame) -> DataFrame:
        """Reference-named form of :meth:`transform` (the generator
        argument is accepted for signature parity and unused)."""
        return self.transform(dataFrame)


class SqlExpr(Constraint):
    """Keep rows where the SQL expression evaluates true."""

    def __init__(self, expr: str):
        if not expr or not expr.strip():
            raise ValueError("SqlExpr requires a non-empty expression")
        self.expr = expr

    def filter_expression(self) -> Column:
        return F.expr(self.expr)


class PositiveValues(Constraint):
    """Columns not null and >= 0 (> 0 when strict)."""

    def __init__(self, columns: Union[str, Sequence[str]], strict: bool = False):
        self.columns = _cols(columns)
        self.strict = strict

    def filter_expression(self) -> Column:
        parts = []
        for c in self.columns:
            col = F.col(c)
            bound = col > 0 if self.strict else col >= 0
            parts.append(col.isNotNull() & bound)
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out


class NegativeValues(Constraint):
    """Columns not null and <= 0 (< 0 when strict)."""

    def __init__(self, columns: Union[str, Sequence[str]], strict: bool = False):
        self.columns = _cols(columns)
        self.strict = strict

    def filter_expression(self) -> Column:
        parts = []
        for c in self.columns:
            col = F.col(c)
            bound = col < 0 if self.strict else col <= 0
            parts.append(col.isNotNull() & bound)
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out


class LiteralRange(Constraint):
    """low < col < high (or inclusive when strict=False... the reference's
    convention: strict=True means exclusive bounds)."""

    def __init__(self, columns, low_value, high_value, strict: bool = False):
        self.columns = _cols(columns)
        self.low = low_value
        self.high = high_value
        self.strict = strict

    def filter_expression(self) -> Column:
        parts = []
        for c in self.columns:
            col = F.col(c)
            if self.strict:
                parts.append((col > F.lit(self.low)) & (col < F.lit(self.high)))
            else:
                parts.append((col >= F.lit(self.low)) & (col <= F.lit(self.high)))
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out


class LiteralRelation(Constraint):
    """col OP literal for each named column."""

    def __init__(self, columns, op: str, value):
        self.columns = _cols(columns)
        if op not in _OPS:
            raise ValueError(f"unsupported operator {op!r}")
        self.op = op
        self.value = value

    def filter_expression(self) -> Column:
        parts = [_apply_op(F.col(c), self.op, F.lit(self.value)) for c in self.columns]
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out


class RangedValues(Constraint):
    """low_col < col < high_col, bounds taken from other columns."""

    def __init__(self, columns, low_column: str, high_column: str, strict: bool = False):
        self.columns = _cols(columns)
        self.low_column = low_column
        self.high_column = high_column
        self.strict = strict

    def filter_expression(self) -> Column:
        lo, hi = F.col(self.low_column), F.col(self.high_column)
        parts = []
        for c in self.columns:
            col = F.col(c)
            if self.strict:
                parts.append((col > lo) & (col < hi))
            else:
                parts.append((col >= lo) & (col <= hi))
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out


class ChainedRelation(Constraint):
    """a OP b OP c ... pairwise over the column list."""

    def __init__(self, columns: Sequence[str], op: str):
        self.columns = _cols(columns)
        if len(self.columns) < 2:
            raise ValueError("ChainedRelation needs at least two columns")
        if op not in _OPS:
            raise ValueError(f"unsupported operator {op!r}")
        self.op = op

    def filter_expression(self) -> Column:
        pairs = [
            _apply_op(F.col(a), self.op, F.col(b))
            for a, b in zip(self.columns, self.columns[1:])
        ]
        out = pairs[0]
        for p in pairs[1:]:
            out = out & p
        return out


class UniqueCombinations(Constraint):
    """Dedupe on the named columns (all columns when ``"*"``).

    The only shuffle-inducing constraint. In streaming mode dedup would be
    per-micro-batch only, so it declares ``supports_streaming = False``
    (reference ``constraints/unique_combinations.py:26-33``).
    """

    supports_streaming = False

    def __init__(self, columns: Union[str, Sequence[str]] = "*"):
        self.columns = columns

    def transform(self, df: DataFrame) -> DataFrame:
        if self.columns == "*" or self.columns == ["*"]:
            return df.dropDuplicates()
        return df.dropDuplicates(_cols(self.columns))
