"""Shim for reference-style ``from dbldatagen.core.spec import TableSpec``:
re-exports the plan models from :mod:`dbldatagen_spark.plans.spec`."""

from dbldatagen_spark.plans.spec import (  # noqa: F401
    ColumnSpec,
    DataGenPlan,
    DataType,
    ForeignKeyRef,
    PrimaryKey,
    TableSpec,
)

__all__ = ["ColumnSpec", "DataGenPlan", "DataType", "ForeignKeyRef",
           "PrimaryKey", "TableSpec"]
