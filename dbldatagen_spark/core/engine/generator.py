"""Shim for reference-style ``from dbldatagen.core.engine.generator import
generate_table``."""

from dbldatagen_spark.generator import generate_table

__all__ = ["generate_table"]
