"""Shim for reference-style ``from dbldatagen.core.engine.planner import
resolve_plan``."""

from dbldatagen_spark.plans.planner import ResolvedPlan, resolve_plan

__all__ = ["ResolvedPlan", "resolve_plan"]
