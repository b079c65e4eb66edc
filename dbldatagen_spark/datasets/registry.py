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


# -- reference-name surface (dataset_provider.py:100-312,
#    datasets_object.py:52-330) ---------------------------------------------

_REGISTRY_VERSION = 0


def _bump_registry_version() -> None:
    global _REGISTRY_VERSION
    _REGISTRY_VERSION += 1


def _provider_getTableGenerator(
    self,
    sparkSession: SparkSession,
    *,
    tableName: Optional[str] = None,
    rows: int = -1,
    partitions: int = -1,
    **options: Any,
):
    """Reference-named form of :meth:`DatasetProvider.get_table_generator`
    (``dataset_provider.py:194-218``): -1 means provider default."""
    return self.get_table_generator(
        sparkSession,
        table_name=tableName,
        rows=None if rows is None or rows < 0 else rows,
        partitions=None if partitions is None or partitions < 0 else partitions,
        **options,
    )


def _provider_getAssociatedDataset(
    self,
    sparkSession: SparkSession,
    *,
    tableName: Optional[str] = None,
    rows: int = -1,
    partitions: int = -1,
    **options: Any,
):
    """Associated (computed/supporting) datasets — none of the built-in
    providers define any, matching the reference's
    NoAssociatedDatasetsMixin behavior (``dataset_provider.py:313-330``)."""
    raise NotImplementedError(
        f"dataset {self.name!r} does not provide associated datasets"
    )


def _provider_getDatasetDefinition(self) -> "DatasetProvider":
    """The provider record is its own definition object here."""
    return self


def _provider_getDatasetTables(self) -> List[str]:
    return list(self.tables)


def _provider_checkOptions(self, options: Dict[str, Any], allowedOptions: List[str]):
    """Reject option keys outside ``allowedOptions``
    (``dataset_provider.py:279-289``)."""
    for key in options:
        if key not in allowedOptions:
            raise ValueError(f"Invalid option '{key}'")
    return self


def _provider_autoComputePartitions(self, rows: int, columns: int) -> int:
    """Log-scaled partition heuristic (``dataset_provider.py:291-306``):
    minimum 4; grows logarithmically with rows and columns."""
    import math

    return max(
        DatasetProvider.DEFAULT_PARTITIONS,
        int(math.log(max(rows, 1) / 350_000) * max(1, math.log(max(columns, 1)))),
    )


def _allowed_options(options: Optional[List[str]] = None):
    """Decorator enforcing an allowed-option list on a provider factory
    (``dataset_provider.py:251-277``)."""
    import functools

    default_options = ["sparkSession", "tableName", "rows", "partitions"]
    allowed = set(default_options) | set(options or [])

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            bad = [k for k in kwargs if k not in allowed]
            if bad:
                raise ValueError(f"Invalid option '{bad[0]}'")
            return func(*args, **kwargs)

        return wrapper

    return decorator


def _register_dataset(datasetProvider) -> None:
    """Register a provider record (``dataset_provider.py:129-163``).
    Accepts a :class:`DatasetProvider` instance (this module's model)."""
    if not isinstance(datasetProvider, DatasetProvider):
        raise ValueError(
            "datasetProvider must be a DatasetProvider instance"
        )
    _REGISTRY[datasetProvider.name] = datasetProvider
    _bump_registry_version()


def _unregister_dataset(name: str) -> None:
    if not (name and name.strip()):
        raise ValueError("name must be provided and not empty")
    if name in _REGISTRY:
        del _REGISTRY[name]
        _bump_registry_version()


DatasetProvider.DEFAULT_PARTITIONS = 4
DatasetProvider.DEFAULT_TABLE_NAME = "primary"
DatasetProvider.getTableGenerator = _provider_getTableGenerator
DatasetProvider.getAssociatedDataset = _provider_getAssociatedDataset
DatasetProvider.getDatasetDefinition = _provider_getDatasetDefinition
DatasetProvider.getDatasetTables = _provider_getDatasetTables
DatasetProvider.checkOptions = _provider_checkOptions
DatasetProvider.autoComputePartitions = _provider_autoComputePartitions
DatasetProvider.allowed_options = staticmethod(_allowed_options)
DatasetProvider.registerDataset = staticmethod(_register_dataset)
DatasetProvider.unregisterDataset = staticmethod(_unregister_dataset)
DatasetProvider.getRegisteredDatasets = staticmethod(lambda: dict(_REGISTRY))
DatasetProvider.getRegisteredDatasetsVersion = staticmethod(
    lambda: _REGISTRY_VERSION
)
DatasetProvider.isValidDataProviderType = staticmethod(
    lambda candidate: isinstance(candidate, DatasetProvider)
    or (isinstance(candidate, type) and issubclass(candidate, DatasetProvider))
)


def _datasets_getProviderDefinitions(
    name: Optional[str] = None,
    pattern: Optional[str] = None,
    supportsStreaming: bool = False,
) -> List[DatasetProvider]:
    """Provider definitions filtered by exact name and/or regex pattern,
    optionally restricted to streaming-capable providers
    (``datasets_object.py:52-90``)."""
    import re as _re

    defs = list(_REGISTRY.values())
    if name is not None:
        defs = [d for d in defs if d.name == name]
    if pattern is not None:
        defs = [d for d in defs if _re.match(pattern, d.name)]
    if supportsStreaming:
        defs = [d for d in defs if d.supports_streaming]
    return sorted(defs, key=lambda d: d.name)


def _datasets_getAssociatedDataset(
    self, *, table: str, rows: int = -1, partitions: int = -1, **kwargs
):
    return self._provider.getAssociatedDataset(
        self._spark, tableName=table, rows=rows, partitions=partitions, **kwargs
    )


Datasets.getProviderDefinitions = staticmethod(_datasets_getProviderDefinitions)
Datasets.getAssociatedDataset = _datasets_getAssociatedDataset
