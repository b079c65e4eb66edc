"""Shim for reference-style ``from dbldatagen.core.api import generate``."""

from dbldatagen_spark.generator import generate

__all__ = ["generate"]
