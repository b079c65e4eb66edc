"""Text generation: faker-style pools and (see below) template languages.

The reference's Faker integration (``/root/reference/dbldatagen/core/engine/
columns/faker_pool.py:18-135``) pre-generates a driver-side pool of N values
and indexes it executor-side with a mixed per-row seed — one pandas UDF, no
per-row Faker calls, Spark-Connect-safe closure capture. We reproduce that
architecture; since the ``faker`` package is not bundled in this
environment, a deterministic built-in provider synthesizes method-shaped
values (names, emails, cities, ...) so plans relying on faker columns stay
runnable and repeatable. If ``faker`` IS importable, it is used.
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from dbldatagen_spark.plans.spec import FakerColumn

_MASK64 = (1 << 64) - 1
# LCG constants (Knuth MMIX) for executor-side pool-index mixing
_LCG_A = 6364136525727742013 & _MASK64
_LCG_C = 1442695040888963407

_FIRST = [
    "Alice", "Bob", "Carol", "David", "Eve", "Frank", "Grace", "Heidi",
    "Ivan", "Judy", "Mallory", "Niaj", "Olivia", "Peggy", "Rupert", "Sybil",
    "Trent", "Uma", "Victor", "Wendy", "Xavier", "Yolanda", "Zach", "Nina",
]
_LAST = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
]
_CITY = [
    "Springfield", "Rivertown", "Lakeside", "Hillcrest", "Fairview",
    "Oakdale", "Maplewood", "Cedarville", "Brookfield", "Elmhurst",
    "Ashford", "Winfield", "Clearwater", "Stonebridge", "Redmond",
]
_STREET = ["Main St", "Oak Ave", "Pine Rd", "Maple Dr", "Cedar Ln",
           "Elm Blvd", "Lake View", "Hill Ct", "River Way", "Park Pl"]
_TLD = ["example.com", "example.org", "example.net", "mail.test", "post.test"]
_COMPANY_A = ["Acme", "Globex", "Initech", "Umbra", "Vertex", "Nimbus",
              "Quantum", "Stellar", "Apex", "Zenith"]
_COMPANY_B = ["Corp", "LLC", "Industries", "Labs", "Systems", "Group",
              "Holdings", "Partners", "Dynamics", "Works"]


def _mix(x: int) -> int:
    x &= _MASK64
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & _MASK64
    x ^= x >> 33
    return x


def _builtin_fake(method: str, rng_state: int) -> str:
    """One deterministic method-shaped fake value from a 64-bit state."""
    h = _mix(rng_state)

    def pick(options: List[str], shift: int) -> str:
        return options[(h >> shift) % len(options)]

    m = method.lower()
    if m in ("name", "full_name"):
        return f"{pick(_FIRST, 0)} {pick(_LAST, 8)}"
    if m == "first_name":
        return pick(_FIRST, 0)
    if m == "last_name":
        return pick(_LAST, 0)
    if m == "email":
        return (
            f"{pick(_FIRST, 0).lower()}.{pick(_LAST, 8).lower()}"
            f"{h % 1000}@{pick(_TLD, 20)}"
        )
    if m == "city":
        return pick(_CITY, 0)
    if m in ("address", "street_address"):
        return f"{h % 9900 + 100} {pick(_STREET, 16)}, {pick(_CITY, 24)}"
    if m == "company":
        return f"{pick(_COMPANY_A, 0)} {pick(_COMPANY_B, 8)}"
    if m == "phone_number":
        return f"({h % 900 + 100:03d}) {(h >> 10) % 900 + 100:03d}-{(h >> 20) % 10000:04d}"
    if m == "country":
        return pick(
            ["Freedonia", "Sylvania", "Arendelle", "Genovia", "Wakanda",
             "Elbonia", "Latveria", "Zubrowka"], 0)
    if m == "job":
        return pick(
            ["Engineer", "Analyst", "Designer", "Manager", "Scientist",
             "Technician", "Consultant", "Architect"], 0)
    if m == "user_name":
        return f"{pick(_FIRST, 0).lower()}{h % 10000}"
    if m == "url":
        return f"https://www.{pick(_COMPANY_A, 0).lower()}.{pick(_TLD, 8).split('.')[-1]}/p/{h % 100000}"
    # generic fallback: method-tagged token
    return f"{m}_{h % 1_000_000}"


def build_pool(spec: FakerColumn, column_seed: int) -> List[str]:
    """Driver-side pool of ``pool_size`` values; real ``faker`` if available,
    else the deterministic builtin provider."""
    try:
        import faker as _faker  # type: ignore

        fk = _faker.Faker(spec.locale) if spec.locale else _faker.Faker()
        fk.seed_instance(column_seed & _MASK64)
        method = getattr(fk, spec.method)
        return [str(method()) for _ in range(spec.pool_size)]
    except Exception:
        state = _mix((column_seed & _MASK64) ^ 0xFA4E2)
        pool = []
        for i in range(spec.pool_size):
            pool.append(_builtin_fake(spec.method, state ^ (i * 0x9E3779B97F4A7C15)))
        return pool


def faker_pool_expr(spec: FakerColumn, column_seed: int, id_col: Column) -> Column:
    """Pandas UDF indexing the captured pool with an LCG-mixed row seed.

    The pool rides the UDF closure (serialized once per executor); per-row
    work is one multiply-add + list index over an Arrow batch.
    """
    pool = build_pool(spec, column_seed)
    pool_size = len(pool)
    seed = column_seed & _MASK64

    def _lookup(batch: pd.Series) -> pd.Series:
        import numpy as np

        arr = batch.to_numpy(dtype="int64").astype(np.uint64)
        with np.errstate(over="ignore"):
            mixed = arr * np.uint64(_LCG_A) + np.uint64((_LCG_C ^ seed) & _MASK64)
        idx = (mixed % np.uint64(pool_size)).astype(np.int64)
        return pd.Series([pool[i] for i in idx])

    udf = F.pandas_udf(_lookup, StringType())
    return udf(id_col.cast("long"))
