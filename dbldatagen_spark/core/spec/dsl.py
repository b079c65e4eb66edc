"""Column-spec DSL helpers (reference ``core/spec/dsl.py:38-449``): the
one-line builders reference users compose plans from. Each returns a
:class:`~dbldatagen_spark.plans.spec.ColumnSpec` wired to this engine's
strategy dataclasses (field spellings differ from the reference's
pydantic models — ``min_value``/``max_value`` vs ``min``/``max`` — but
the helpers absorb that, so DSL-level code ports unchanged).
"""

from __future__ import annotations

from typing import Any, List, Optional

from dbldatagen_spark.plans.spec import (
    ArrayColumn,
    ColumnSpec,
    ConstantColumn,
    DataType,
    Distribution,
    ExpressionColumn,
    FakerColumn,
    ForeignKeyColumn,
    ForeignKeyRef,
    PatternColumn,
    RangeColumn,
    SequenceColumn,
    StructColumn,
    TimestampColumn,
    UUIDColumn,
    ValuesColumn,
    Zipf,
)

__all__ = [
    "pk_auto", "pk_uuid", "pk_pattern", "fk", "integer", "double",
    "decimal", "text", "faker", "timestamp", "pattern", "expression",
    "constant", "struct", "array",
]


def pk_auto(name: str = "id") -> ColumnSpec:
    """Auto-incrementing LONG primary-key column (1, 2, 3, ...)."""
    return ColumnSpec(name, SequenceColumn(), dtype="long")


def pk_uuid(name: str = "id") -> ColumnSpec:
    """Deterministic UUID primary-key column."""
    return ColumnSpec(name, UUIDColumn(), dtype="string")


def pk_pattern(name: str, template: str) -> ColumnSpec:
    """Patterned string primary key, e.g. ``"CUST-{digit:6}"``."""
    return ColumnSpec(name, PatternColumn(pattern=template), dtype="string")


def fk(
    name: str,
    ref: str,
    *,
    nullable: bool = False,
    null_fraction: float = 0.0,
    distribution: Optional[Distribution] = None,
) -> ColumnSpec:
    """Foreign-key column referencing ``"table.column"``; dtype follows
    the parent PK at resolution. Default skew Zipf(1.2) like the
    reference."""
    return ColumnSpec(
        name,
        foreign_key=ForeignKeyRef(
            ref=ref,
            nullable=nullable,
            null_fraction=null_fraction,
            distribution=distribution or Zipf(exponent=1.2),
        ),
    )


def integer(
    name: str,
    min: float = 0,  # noqa: A002 — reference parameter name
    max: float = 100,  # noqa: A002
    seed_from: Optional[str] = None,
    **kw: Any,
) -> ColumnSpec:
    """INT column uniform (or ``distribution=``-shaped) on [min, max]."""
    return ColumnSpec(
        name, RangeColumn(min, max, **kw), dtype="int", seed_from=seed_from
    )


def double(
    name: str,
    min: float = 0.0,  # noqa: A002
    max: float = 1.0,  # noqa: A002
    seed_from: Optional[str] = None,
    **kw: Any,
) -> ColumnSpec:
    """DOUBLE column on [min, max]; use :func:`decimal` for fixed
    precision."""
    return ColumnSpec(
        name, RangeColumn(min, max, **kw), dtype="double", seed_from=seed_from
    )


def decimal(
    name: str,
    min: float = 0.0,  # noqa: A002
    max: float = 1000.0,  # noqa: A002
    seed_from: Optional[str] = None,
    precision: Optional[int] = None,
    scale: Optional[int] = None,
    **kw: Any,
) -> ColumnSpec:
    """DECIMAL(precision, scale) column on [min, max] (defaults 10, 0)."""
    dtype = f"decimal({precision if precision is not None else 10},{scale or 0})"
    return ColumnSpec(
        name, RangeColumn(min, max, **kw), dtype=dtype, seed_from=seed_from
    )


def text(
    name: str,
    values: List[str],
    seed_from: Optional[str] = None,
    **kw: Any,
) -> ColumnSpec:
    """STRING column selecting from a value list (weight via
    ``distribution=WeightedValues(...)``)."""
    return ColumnSpec(
        name, ValuesColumn(tuple(values), **kw), dtype="string",
        seed_from=seed_from,
    )


def faker(
    name: str,
    provider: str,
    *,
    dtype: DataType = DataType.STRING,
    locale: Optional[str] = None,
    seed_from: Optional[str] = None,
    **kwargs: Any,
) -> ColumnSpec:
    """Faker-provider column (seeded pool; deterministic fallback when the
    faker package is absent)."""
    return ColumnSpec(
        name,
        FakerColumn(method=provider, locale=locale, **kwargs),
        dtype=str(DataType(dtype).value),
        seed_from=seed_from,
    )


def timestamp(
    name: str,
    start: str,
    end: str,
    seed_from: Optional[str] = None,
    **kw: Any,
) -> ColumnSpec:
    """TIMESTAMP column on [start, end] (ISO-8601 strings); output is
    session-timezone independent."""
    return ColumnSpec(
        name, TimestampColumn(start=start, end=end, **kw), dtype="timestamp",
        seed_from=seed_from,
    )


def pattern(
    name: str,
    template: str,
    seed_from: Optional[str] = None,
) -> ColumnSpec:
    """STRING column from a placeholder template, e.g. ``"ORD-{digit:4}"``."""
    return ColumnSpec(
        name, PatternColumn(pattern=template), dtype="string",
        seed_from=seed_from,
    )


def expression(name: str, expr: str) -> ColumnSpec:
    """Column computed by a Spark SQL expression; type always inferred
    (cast inside the expression to control it)."""
    return ColumnSpec(name, ExpressionColumn(expr=expr))


def constant(
    name: str, value: Any, dtype: Optional[DataType] = None
) -> ColumnSpec:
    """Column where every row carries the same literal."""
    dt = str(DataType(dtype).value) if dtype is not None else None
    return ColumnSpec(name, ConstantColumn(value=value), dtype=dt)


def struct(name: str, fields: List[ColumnSpec]) -> ColumnSpec:
    """Nested struct column; each field generates like a top-level column
    with its own seed."""
    return ColumnSpec(name, StructColumn(fields=tuple(fields)))


def array(
    name: str,
    element,
    min_length: int = 1,
    max_length: int = 5,
) -> ColumnSpec:
    """Variable-length array column; length uniform in
    [min_length, max_length]. ``element`` is a strategy (reference form)
    or a full ColumnSpec."""
    if not isinstance(element, ColumnSpec):
        element = ColumnSpec("element", element)
    return ColumnSpec(
        name,
        ArrayColumn(element=element, min_length=min_length,
                    max_length=max_length),
    )
