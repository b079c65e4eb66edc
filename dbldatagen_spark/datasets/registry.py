"""Dataset provider registry + ``Datasets`` facade."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

from pyspark.sql import SparkSession

_REGISTRY: Dict[str, "DatasetProvider"] = {}

DEFAULT_ROWS = 100_000


@dataclass
class DatasetProvider:
    """A named factory producing a :class:`DataGenerator` for a table."""

    name: str
    summary: str
    description: str
    tables: List[str]
    factory: Callable[..., Any]  # (spark, tableName, rows, partitions, **options)
    supports_streaming: bool = True
    primary_table: Optional[str] = None

    def get_table_generator(
        self,
        spark: SparkSession,
        table_name: Optional[str] = None,
        rows: Optional[int] = None,
        partitions: Optional[int] = None,
        **options: Any,
    ):
        table = table_name or self.primary_table or self.tables[0]
        if table not in self.tables:
            raise ValueError(
                f"dataset {self.name!r} has no table {table!r} (tables: {self.tables})"
            )
        if rows is None or rows < 0:
            rows = DEFAULT_ROWS
        return self.factory(spark, table, rows, partitions, **options)


def dataset_definition(
    name: str,
    summary: str = "",
    description: str = "",
    tables: Optional[List[str]] = None,
    primary_table: Optional[str] = None,
    supports_streaming: bool = True,
):
    """Decorator registering a provider factory under ``category/name``."""

    def wrap(factory: Callable[..., Any]) -> Callable[..., Any]:
        _REGISTRY[name] = DatasetProvider(
            name=name,
            summary=summary or factory.__doc__ or "",
            description=description or factory.__doc__ or "",
            tables=tables or ["primary"],
            factory=factory,
            supports_streaming=supports_streaming,
            primary_table=primary_table,
        )
        return factory

    return wrap


def list_datasets() -> List[Dict[str, Any]]:
    return [
        {
            "name": p.name,
            "summary": p.summary,
            "tables": p.tables,
            "supportsStreaming": p.supports_streaming,
        }
        for p in sorted(_REGISTRY.values(), key=lambda p: p.name)
    ]


class Datasets:
    """Facade: ``Datasets(spark, "basic/user").get(rows=...)`` →
    DataGenerator."""

    def __init__(self, spark: SparkSession, name: str):
        if name not in _REGISTRY:
            known = sorted(_REGISTRY)
            raise ValueError(f"unknown dataset {name!r} (known: {known})")
        self._spark = spark
        self._provider = _REGISTRY[name]

    @staticmethod
    def list() -> List[Dict[str, Any]]:
        return list_datasets()

    @staticmethod
    def describe(name: str) -> Dict[str, Any]:
        if name not in _REGISTRY:
            raise ValueError(f"unknown dataset {name!r}")
        p = _REGISTRY[name]
        return {
            "name": p.name,
            "summary": p.summary,
            "description": p.description,
            "tables": p.tables,
            "primaryTable": p.primary_table or p.tables[0],
            "supportsStreaming": p.supports_streaming,
        }

    def get(
        self,
        table: Optional[str] = None,
        rows: Optional[int] = None,
        partitions: Optional[int] = None,
        **options: Any,
    ):
        return self._provider.get_table_generator(
            self._spark, table, rows, partitions, **options
        )
