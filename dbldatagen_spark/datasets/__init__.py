"""Standard dataset providers: a registry of named spec factories.

Reference surface: ``DatasetProvider`` registry + ``Datasets`` facade
(``/root/reference/dbldatagen/datasets/dataset_provider.py:24-218,324-483``,
``datasets_object.py:30-120``). Implementation original.

Usage::

    from dbldatagen_spark.datasets import Datasets
    gen = Datasets(spark, "benchmark/groupby").get(rows=1_000_000, groups=100)
    df = gen.build()
"""

from dbldatagen_spark.datasets.registry import (
    Datasets,
    DatasetProvider,
    dataset_definition,
    list_datasets,
)

# importing providers registers them
from dbldatagen_spark.datasets import providers as _providers  # noqa: F401

__all__ = ["DatasetProvider", "Datasets", "dataset_definition", "list_datasets"]
