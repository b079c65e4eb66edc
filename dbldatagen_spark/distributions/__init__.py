"""Import-path parity with ``dbldatagen.distributions``
(reference ``distributions/__init__.py:21-28``): the distribution classes
live in :mod:`dbldatagen_spark.plans.spec` (pure-expression dataclasses,
not the reference's scipy-backed pandas-UDF classes) and are re-exported
here so ``from dbldatagen_spark.distributions import Beta`` works.

``DataDistribution`` aliases the Distribution union type — usable in
``isinstance`` checks like the reference ABC.
"""

from dbldatagen_spark.plans.spec import (
    Beta,
    Distribution,
    Distribution as DataDistribution,
    Exponential,
    Gamma,
    Normal,
    Pareto,
)

__all__ = ["Normal", "DataDistribution", "Beta", "Gamma", "Exponential",
           "Pareto", "Distribution"]
