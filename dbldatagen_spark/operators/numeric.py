"""Numeric column builders: sequences and ranged values.

All builders return a single pure ``Column`` expression over the row-id /
cell-seed columns (reference semantics:
``/root/reference/dbldatagen/core/engine/columns/numeric.py:88-213`` and
``core/engine/columns/pk.py:12-27``; implementation original).

Scale notes:

* integral ranges sample a *lattice index* then apply ``idx*step + min`` —
  two multiplies and an add per cell, fully codegen'd;
* ``F.pmod`` (not ``%``) everywhere: Spark ``%`` is signed and xxhash64
  seeds are frequently negative (SURVEY §7.3 "negative modulo");
* values are clamped *before* any narrowing cast so the engine is safe
  under ``spark.sql.ansi.enabled=true`` (no silent overflow, no runtime
  error).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from dbldatagen_spark.operators.distributions import (
    index_expr,
    unit_expr,
)
from dbldatagen_spark.plans.spec import (
    RangeColumn,
    SequenceColumn,
    Uniform,
    WeightedValues,
    decimal_precision_scale,
)

_SPARK_TYPE = {
    "byte": "tinyint",
    "short": "smallint",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
    "date": "date",
    "timestamp": "timestamp",
    "binary": "binary",
}

_LATTICE_EPS = 1e-9


def spark_type_name(dtype: str) -> str:
    """Map a canonical spec dtype to a Spark SQL cast target."""
    if dtype.startswith("decimal"):
        p, s = decimal_precision_scale(dtype)
        return f"decimal({p},{s})"
    return _SPARK_TYPE[dtype]


def sequence_expr(strategy: SequenceColumn, id_col: Column, dtype: str) -> Column:
    """``start + row_id * step`` — the reconstructible PK workhorse."""
    value = id_col.cast("long") * F.lit(int(strategy.step)) + F.lit(
        int(strategy.start)
    )
    return value.cast(spark_type_name(dtype))


def lattice_count(min_value: float, max_value: float, step: float) -> int:
    """Number of points on the ``min..max`` lattice with spacing ``step``.

    A 1e-9 epsilon absorbs float representation error (e.g. 1.0..5.0 step
    0.5 must yield exactly 8+1... 9 points? no — 1.0,1.5,...,5.0 = 9; the
    reference's F4 fixture counts 8 discrete values for a half-open
    convention; we use the inclusive convention: floor(span/step + eps)+1).
    """
    span = max_value - min_value
    return int(math.floor(span / step + _LATTICE_EPS)) + 1


def range_expr(
    strategy: RangeColumn, dtype: str, seed_col: Column, *, random: bool = True,
    id_col: Column = None,
) -> Column:
    """Ranged value in ``[min_value, max_value]``.

    ``random=False`` (v0 "non-random" mode) cycles deterministically through
    the lattice by row id: ``pmod(id, count)`` — matches the reference's
    modulo iteration (``column_generation_spec.py:1299-1363``) without the
    double-mod dance because ``pmod`` is already non-negative.
    """
    base = dtype if not dtype.startswith("decimal") else "decimal"
    if base in ("byte", "short", "int", "long"):
        return _integral_range(strategy, dtype, seed_col, random=random, id_col=id_col)
    if base in ("float", "double"):
        return _fractional_range(strategy, dtype, seed_col, random=random, id_col=id_col)
    if base == "decimal":
        return _decimal_range(strategy, dtype, seed_col, random=random, id_col=id_col)
    raise ValueError(f"range strategy incompatible with dtype {dtype!r}")


def _lattice_index(
    strategy: RangeColumn, count: int, seed_col: Column, random: bool, id_col: Column
) -> Column:
    if not random:
        src = id_col if id_col is not None else seed_col
        return F.pmod(src.cast("long"), F.lit(count)).cast("long")
    dist = strategy.distribution
    if isinstance(dist, WeightedValues):
        raise ValueError("WeightedValues is only valid on a values list")
    return index_expr(seed_col, count, dist)


def _integral_range(
    strategy: RangeColumn, dtype: str, seed_col: Column, random: bool, id_col: Column
) -> Column:
    step = int(strategy.step or 1)
    lo, hi = int(strategy.min_value), int(strategy.max_value)
    count = (hi - lo) // step + 1
    idx = _lattice_index(strategy, count, seed_col, random, id_col)
    value = idx * F.lit(step) + F.lit(lo)
    return value.cast(spark_type_name(dtype))


def _fractional_range(
    strategy: RangeColumn, dtype: str, seed_col: Column, random: bool, id_col: Column
) -> Column:
    lo, hi = float(strategy.min_value), float(strategy.max_value)
    if strategy.step is None:
        if not random:
            # non-random continuous degenerates to a fine lattice over ids
            count = 1_000_000
            src = id_col if id_col is not None else seed_col
            unit = F.pmod(src.cast("long"), F.lit(count)).cast("double") / F.lit(
                float(count)
            )
        else:
            unit = unit_expr(seed_col, strategy.distribution)
        value = unit * F.lit(hi - lo) + F.lit(lo)
    else:
        step = float(strategy.step)
        count = lattice_count(lo, hi, step)
        idx = _lattice_index(strategy, count, seed_col, random, id_col)
        value = idx.cast("double") * F.lit(step) + F.lit(lo)
    return value.cast(spark_type_name(dtype))


def _decimal_range(
    strategy: RangeColumn, dtype: str, seed_col: Column, random: bool, id_col: Column
) -> Column:
    p, s = decimal_precision_scale(dtype if dtype.startswith("decimal") else "decimal")
    lo, hi = float(strategy.min_value), float(strategy.max_value)
    if strategy.step is not None:
        step = float(strategy.step)
        count = lattice_count(lo, hi, step)
        idx = _lattice_index(strategy, count, seed_col, random, id_col)
        value = idx.cast("double") * F.lit(step) + F.lit(lo)
    else:
        if not random:
            count = 1_000_000
            src = id_col if id_col is not None else seed_col
            unit = F.pmod(src.cast("long"), F.lit(count)).cast("double") / F.lit(
                float(count)
            )
        else:
            unit = unit_expr(seed_col, strategy.distribution)
        value = unit * F.lit(hi - lo) + F.lit(lo)
    # the decimal cast itself rounds HALF_UP at target scale (same rule the
    # reference applies via an explicit round, numeric.py:208-212) — an
    # extra F.round first would double the per-row decimal work
    return value.cast(f"decimal({p},{s})")
