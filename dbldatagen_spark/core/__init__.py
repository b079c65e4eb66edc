"""Import-path parity with ``dbldatagen.core`` (reference
``core/__init__.py``): the declarative plan models and generation
functions live in :mod:`dbldatagen_spark.plans` / :mod:`.generator` and
are re-exported here so reference-style imports work unchanged:

    from dbldatagen_spark.core import DataGenPlan, TableSpec, generate
"""

from dbldatagen_spark.generator import generate, generate_table
from dbldatagen_spark.plans.planner import ResolvedPlan, resolve_plan
from dbldatagen_spark.plans.spec import (
    ColumnSpec,
    DataGenPlan,
    DataType,
    ForeignKeyRef,
    PrimaryKey,
    TableSpec,
)

__all__ = [
    "ColumnSpec", "DataGenPlan", "DataType", "ForeignKeyRef", "PrimaryKey",
    "ResolvedPlan", "TableSpec", "generate", "generate_table", "resolve_plan",
]
