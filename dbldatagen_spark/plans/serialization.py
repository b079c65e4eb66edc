"""Plan (de)serialization: dict/JSON/YAML round-trip.

Mirrors the reference's polymorphic ``kind``-tagged serialization
(``/root/reference/dbldatagen/serialization.py:11-44``) and core plan-file
loading (``tests/core/spec/test_file_loading.py``): strategies and
distributions carry their discriminator (``strategy`` / ``kind``) in the
payload, so a plan saved by this module reloads to an equal plan.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional

from dbldatagen_spark.plans.spec import (
    ArrayColumn,
    ColumnSpec,
    DISTRIBUTION_KINDS,
    DataGenPlan,
    Distribution,
    STRATEGY_KINDS,
    SpecValidationError,
    StructColumn,
    TableSpec,
)


def distribution_to_dict(dist: Distribution) -> Dict[str, Any]:
    d = dataclasses.asdict(dist)
    if "weights" in d:
        d["weights"] = list(d["weights"])
    return d


def distribution_from_dict(d: Dict[str, Any]) -> Distribution:
    d = dict(d)
    kind = d.pop("kind", "uniform")
    if kind not in DISTRIBUTION_KINDS:
        raise SpecValidationError(f"unknown distribution kind {kind!r}")
    cls = DISTRIBUTION_KINDS[kind]
    if kind == "weighted":
        return cls(d["weights"])
    return cls(**d)


def strategy_to_dict(strategy) -> Dict[str, Any]:
    out: Dict[str, Any] = {"strategy": strategy.strategy}
    for f in dataclasses.fields(strategy):
        if f.name == "strategy":
            continue
        v = getattr(strategy, f.name)
        if f.name == "distribution":
            out[f.name] = distribution_to_dict(v)
        elif f.name == "fields":  # StructColumn
            out[f.name] = [column_to_dict(c) for c in v]
        elif f.name == "element":  # ArrayColumn
            out[f.name] = column_to_dict(v)
        elif isinstance(v, tuple):
            out[f.name] = list(v)
        else:
            out[f.name] = v
    return out


def strategy_from_dict(d: Dict[str, Any]):
    d = dict(d)
    kind = d.pop("strategy")
    if kind not in STRATEGY_KINDS:
        raise SpecValidationError(f"unknown strategy kind {kind!r}")
    cls = STRATEGY_KINDS[kind]
    if "distribution" in d and d["distribution"] is not None:
        d["distribution"] = distribution_from_dict(d["distribution"])
    if kind == "struct":
        return StructColumn([column_from_dict(f) for f in d["fields"]])
    if kind == "array":
        d["element"] = column_from_dict(d["element"])
        return ArrayColumn(**d)
    if kind == "values":
        return cls(d["values"], d.get("distribution"))
    return cls(**d)


def column_to_dict(col: ColumnSpec) -> Dict[str, Any]:
    return {
        "name": col.name,
        "dtype": col.dtype,
        "nullable": col.nullable,
        "null_fraction": col.null_fraction,
        "seed_from": col.seed_from,
        "seed": col.seed,
        "strategy": strategy_to_dict(col.strategy),
    }


def column_from_dict(d: Dict[str, Any]) -> ColumnSpec:
    return ColumnSpec(
        name=d["name"],
        strategy=strategy_from_dict(d["strategy"]),
        dtype=d.get("dtype"),
        nullable=bool(d.get("nullable", False)),
        null_fraction=d.get("null_fraction"),
        seed_from=d.get("seed_from"),
        seed=d.get("seed"),
    )


def table_to_dict(table: TableSpec) -> Dict[str, Any]:
    return {
        "name": table.name,
        "rows": table.rows,
        "primary_key": table.primary_key,
        "seed": table.seed,
        "partitions": table.partitions,
        "columns": [column_to_dict(c) for c in table.columns],
    }


def table_from_dict(d: Dict[str, Any]) -> TableSpec:
    return TableSpec(
        name=d["name"],
        rows=d["rows"],
        columns=[column_from_dict(c) for c in d["columns"]],
        primary_key=d.get("primary_key"),
        seed=d.get("seed"),
        partitions=d.get("partitions"),
    )


def plan_to_dict(plan: DataGenPlan) -> Dict[str, Any]:
    return {
        "seed": plan.seed,
        "default_locale": plan.default_locale,
        "tables": [table_to_dict(t) for t in plan.tables],
    }


def plan_from_dict(d: Dict[str, Any]) -> DataGenPlan:
    return DataGenPlan(
        tables=[table_from_dict(t) for t in d["tables"]],
        seed=int(d.get("seed", 42)),
        default_locale=d.get("default_locale"),
    )


def save_plan_json(plan: DataGenPlan, path: str) -> None:
    with open(path, "w") as f:
        json.dump(plan_to_dict(plan), f, indent=2)


def load_plan_json(path: str) -> DataGenPlan:
    with open(path) as f:
        return plan_from_dict(json.load(f))


def load_plan_yaml(path: str) -> DataGenPlan:
    """YAML plan file (optional dependency; clear error if absent)."""
    try:
        import yaml  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "pyyaml is required for YAML plan files; use JSON instead"
        ) from e
    with open(path) as f:
        return plan_from_dict(yaml.safe_load(f))


def load_plan(path: str) -> DataGenPlan:
    if path.endswith((".yml", ".yaml")):
        return load_plan_yaml(path)
    return load_plan_json(path)
