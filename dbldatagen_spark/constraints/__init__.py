"""Import-path parity with ``dbldatagen.constraints``
(reference ``constraints/__init__.py:23-31``): the constraint classes
live in :mod:`dbldatagen_spark.operators.constraints` and are
re-exported here so ``from dbldatagen_spark.constraints import SqlExpr``
works.
"""

from dbldatagen_spark.operators.constraints import (
    ChainedRelation,
    Constraint,
    LiteralRange,
    LiteralRelation,
    NegativeValues,
    PositiveValues,
    RangedValues,
    SqlExpr,
    UniqueCombinations,
)

__all__ = [
    "ChainedRelation", "Constraint", "LiteralRange", "LiteralRelation",
    "NegativeValues", "PositiveValues", "RangedValues", "SqlExpr",
    "UniqueCombinations",
]
