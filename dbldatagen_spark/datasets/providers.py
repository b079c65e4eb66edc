"""Built-in dataset providers, mirroring the reference's standard set:
``basic/user``, ``basic/telephony``, ``benchmark/groupby``,
``multi_table/sales_order`` (reference ``/root/reference/dbldatagen/
datasets/*.py``; specs re-authored here).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import SparkSession

from dbldatagen_spark.datagen import DataGenerator
from dbldatagen_spark.datasets.registry import dataset_definition


def _auto_partitions(rows: int, columns: int) -> int:
    """Partition count from data volume (reference
    ``dataset_provider.py:213-216`` heuristic: scale with rows x columns)."""
    return max(1, min(96, int(math.sqrt(rows * max(columns, 1)) // 1000) or 1))


@dataset_definition(
    name="basic/user",
    summary="Basic user profile table",
    tables=["primary"],
)
def basic_user(
    spark: SparkSession, table: str, rows: int, partitions: Optional[int], **options
) -> DataGenerator:
    """Synthetic user profiles: customer id, name, email, ip, phone, dates."""
    random = bool(options.get("random", False))
    dummy_values = int(options.get("dummyValues", 0))
    gen = (
        DataGenerator(
            spark, name="basic_user", rows=rows,
            partitions=partitions or _auto_partitions(rows, 6 + dummy_values),
            random=random,
        )
        .withColumn("customer_id", "long", minValue=1000000, maxValue=1000000 + rows)
        .withColumn("name", "string", template=r"\w \w|\w \w \w")
        .withColumn("email", "string", template=r"\w.\w@\w.com|\w@\w.co.u\k")
        .withColumn("ip_addr", "string", template=r"\n.\n.\n.\n")
        .withColumn("phone", "string", template=r"(ddd)-ddd-dddd|1(ddd) ddd-dddd|ddd ddddddd")
    )
    for i in range(dummy_values):
        gen = gen.withColumn(
            f"dummy_{i}", "long", minValue=1, maxValue=10, random=random
        )
    return gen


@dataset_definition(
    name="basic/telephony",
    summary="Telephony billing events (plans/devices/events)",
    tables=["plans", "customers", "events"],
    primary_table="events",
)
def basic_telephony(
    spark: SparkSession, table: str, rows: int, partitions: Optional[int], **options
) -> DataGenerator:
    """Telco-style plans / customers / usage events."""
    parts = partitions or _auto_partitions(rows, 8)
    if table == "plans":
        return (
            DataGenerator(spark, name="plans", rows=rows, partitions=parts)
            .withColumn("plan_id", "long", minValue=1, maxValue=rows)
            .withColumn("plan_name", "string", prefix="plan", baseColumn="plan_id")
            .withColumn("cost_per_mb", "decimal(5,3)", minValue=0.005, maxValue=0.050,
                        step=0.005, random=True)
            .withColumn("cost_per_message", "decimal(5,3)", minValue=0.001,
                        maxValue=0.02, step=0.001, random=True)
            .withColumn("cost_per_minute", "decimal(5,3)", minValue=0.01,
                        maxValue=0.10, step=0.01, random=True)
        )
    if table == "customers":
        return (
            DataGenerator(spark, name="customers", rows=rows, partitions=parts)
            .withColumn("customer_id", "long", minValue=1, maxValue=rows)
            .withColumn("customer_name", "string", template=r"\w \w")
            .withColumn("device_id", "string", template="XX-dddddddd")
            .withColumn("phone_number", "string", template="(ddd) ddd-dddd")
            .withColumn("plan_id", "long", minValue=1, maxValue=max(2, rows // 100),
                        random=True)
        )
    return (
        DataGenerator(spark, name="events", rows=rows, partitions=parts, random=True)
        .withColumn("event_id", "long", minValue=1, maxValue=rows)
        .withColumn("customer_id", "long", minValue=1, maxValue=max(2, rows // 10),
                    random=True)
        .withColumn("event_type", "string",
                    values=["call", "sms", "data"], weights=[5, 3, 2], random=True)
        .withColumn("duration_minutes", "decimal(8,2)", minValue=0.1, maxValue=120.0,
                    random=True)
        .withColumn("bytes_transferred", "long", minValue=0, maxValue=100_000_000,
                    random=True)
        .withColumn("event_ts", "timestamp", begin="2024-01-01 00:00:00",
                    end="2024-12-31 23:59:59", interval="1 second", random=True)
    )


@dataset_definition(
    name="benchmark/groupby",
    summary="h2oai/db-benchmark-style groupby workload table",
    tables=["primary"],
)
def benchmark_groupby(
    spark: SparkSession, table: str, rows: int, partitions: Optional[int], **options
) -> DataGenerator:
    """Groupby benchmark schema: id1..id6 keys at two cardinalities, v1..v3
    measures (reference ``datasets/benchmark_groupby.py:84-127``)."""
    groups = int(options.get("groups", 100))
    percent_nulls = float(options.get("percentNulls", 0.0))
    random = bool(options.get("random", False))
    big = 1 + rows // max(groups, 1)
    gen = (
        DataGenerator(
            spark, name="benchmark_groupby", rows=rows,
            partitions=partitions or _auto_partitions(rows, 9), random=random,
        )
        .withColumn("_g1", "int", minValue=1, maxValue=groups, uniqueValues=groups,
                    omit=True, random=random)
        .withColumn("_g2", "int", minValue=1, maxValue=groups, uniqueValues=groups,
                    omit=True, random=random, baseColumn="_g1", baseColumnType="hash")
        .withColumn("_g3", "int", minValue=1, maxValue=big, uniqueValues=big,
                    omit=True, random=random)
        .withColumn("id1", "string", format="id%03d", baseColumn="_g1",
                    percentNulls=percent_nulls)
        .withColumn("id2", "string", format="id%03d", baseColumn="_g2",
                    percentNulls=percent_nulls)
        .withColumn("id3", "string", format="id%010d", baseColumn="_g3",
                    percentNulls=percent_nulls)
        .withColumn("id4", "int", minValue=1, maxValue=groups, random=random,
                    percentNulls=percent_nulls)
        .withColumn("id5", "int", minValue=1, maxValue=groups, random=random,
                    baseColumn="id4" if not random else "id",
                    percentNulls=percent_nulls)
        .withColumn("id6", "int", minValue=1, maxValue=big, random=random,
                    percentNulls=percent_nulls)
        .withColumn("v1", "int", minValue=1, maxValue=5, random=random)
        .withColumn("v2", "int", minValue=1, maxValue=15, random=random)
        .withColumn("v3", "decimal(9,6)", minValue=0.0, maxValue=100.0,
                    step=1e-6, random=random)
    )
    return gen


@dataset_definition(
    name="multi_table/sales_order",
    summary="Sales-order star: customers, carriers, catalog items, orders, "
            "order line items, invoices",
    tables=["customers", "carriers", "catalog_items", "base_orders",
            "base_order_line_items", "base_order_shipments", "base_invoices"],
    primary_table="base_orders",
)
def multi_table_sales_order(
    spark: SparkSession, table: str, rows: int, partitions: Optional[int], **options
) -> DataGenerator:
    """Multi-table sales-order scenario (reference
    ``datasets/multi_table_sales_order_provider.py``): each table's keys are
    derived deterministically so FK joins line up without materializing
    parents."""
    n_customers = int(options.get("numCustomers", max(10, rows // 20)))
    n_carriers = int(options.get("numCarriers", 20))
    n_catalog = int(options.get("numCatalogItems", max(10, rows // 50)))
    parts = partitions or _auto_partitions(rows, 8)
    if table == "customers":
        return (
            DataGenerator(spark, name="customers", rows=n_customers, partitions=parts)
            .withColumn("customer_id", "long", minValue=1, maxValue=n_customers)
            .withColumn("customer_name", "string", template=r"\w \w")
            .withColumn("email", "string", template=r"\w.\w@\w.com")
        )
    if table == "carriers":
        return (
            DataGenerator(spark, name="carriers", rows=n_carriers, partitions=1)
            .withColumn("carrier_id", "long", minValue=1, maxValue=n_carriers)
            .withColumn("carrier_name", "string", prefix="carrier", baseColumn="carrier_id")
        )
    if table == "catalog_items":
        return (
            DataGenerator(spark, name="catalog_items", rows=n_catalog, partitions=parts)
            .withColumn("item_id", "long", minValue=1, maxValue=n_catalog)
            .withColumn("item_name", "string", template=r"\w \w \w")
            .withColumn("unit_price", "decimal(9,2)", minValue=1.0, maxValue=500.0,
                        random=True)
        )
    if table == "base_order_line_items":
        return (
            DataGenerator(spark, name="line_items", rows=rows * 3, partitions=parts,
                          random=True)
            .withColumn("order_line_id", "long", minValue=1, maxValue=rows * 3)
            .withColumn("order_id", "long", minValue=1, maxValue=rows, random=True)
            .withColumn("item_id", "long", minValue=1, maxValue=n_catalog, random=True)
            .withColumn("quantity", "int", minValue=1, maxValue=20, random=True)
        )
    if table == "base_order_shipments":
        return (
            DataGenerator(spark, name="shipments", rows=rows, partitions=parts,
                          random=True)
            .withColumn("shipment_id", "long", minValue=1, maxValue=rows)
            .withColumn("order_id", "long", baseColumn="shipment_id")
            .withColumn("carrier_id", "long", minValue=1, maxValue=n_carriers,
                        random=True)
            .withColumn("ship_date", "date", begin="2024-01-01", end="2024-12-31",
                        random=True)
        )
    if table == "base_invoices":
        return (
            DataGenerator(spark, name="invoices", rows=rows, partitions=parts)
            .withColumn("invoice_id", "long", minValue=1, maxValue=rows)
            .withColumn("order_id", "long", baseColumn="invoice_id")
            .withColumn("invoice_total", "decimal(12,2)", minValue=10.0,
                        maxValue=10000.0, random=True)
        )
    return (
        DataGenerator(spark, name="orders", rows=rows, partitions=parts)
        .withColumn("order_id", "long", minValue=1, maxValue=rows)
        .withColumn("customer_id", "long", minValue=1, maxValue=n_customers,
                    random=True)
        .withColumn("order_ts", "timestamp", begin="2024-01-01 00:00:00",
                    end="2024-12-31 23:59:59", interval="1 minute", random=True)
        .withColumn("status", "string",
                    values=["open", "shipped", "delivered", "returned"],
                    weights=[2, 3, 8, 1], random=True)
    )


@dataset_definition(
    name="basic/geometries",
    summary="Point/lineString/polygon WKT geometries",
    tables=["primary"],
)
def basic_geometries(
    spark: SparkSession, table: str, rows: int, partitions: Optional[int], **options
):
    """WKT geometry table (reference ``datasets/basic_geometries.py``
    capability): ``geometryType`` option selects point, lineString, or
    polygon; lat/lon bounds configurable; coordinates random."""
    geometry = str(options.get("geometryType", "point"))
    max_vertices = int(options.get("maxVertices", 3 if geometry == "polygon" else 2))
    min_lat = float(options.get("minLatitude", -90.0))
    max_lat = float(options.get("maxLatitude", 90.0))
    min_lon = float(options.get("minLongitude", -180.0))
    max_lon = float(options.get("maxLongitude", 180.0))
    parts = partitions or _auto_partitions(rows, 4)
    gen = (
        DataGenerator(spark, name="geometries", rows=rows, partitions=parts)
        .withColumn("location_id", "long", minValue=1, maxValue=rows)
    )
    n_pts = {"point": 1, "lineString": max(2, max_vertices)}.get(
        geometry, max(3, max_vertices)
    )
    for i in range(n_pts):
        gen = gen.withColumn(
            f"lat_{i}", "decimal(8,5)", minValue=min_lat, maxValue=max_lat,
            random=True, omit=True,
        ).withColumn(
            f"lon_{i}", "decimal(8,5)", minValue=min_lon, maxValue=max_lon,
            random=True, omit=True,
        )
    pairs = ", ".join(f"concat(lon_{i}, ' ', lat_{i})" for i in range(n_pts))
    if geometry == "point":
        wkt = "concat('POINT(', lon_0, ' ', lat_0, ')')"
    elif geometry == "lineString":
        wkt = f"concat('LINESTRING(', concat_ws(', ', {pairs}), ')')"
    elif geometry == "polygon":
        # close the ring by repeating the first vertex
        wkt = (
            f"concat('POLYGON((', concat_ws(', ', {pairs}), "
            f"', ', lon_0, ' ', lat_0, '))')"
        )
    else:
        raise ValueError(f"unknown geometryType {geometry!r}")
    return gen.withColumn("wkt", "string", expr=wkt)


@dataset_definition(
    name="basic/process_historian",
    summary="Plant-floor sensor readings (device/plant/tag time series)",
    tables=["primary"],
)
def basic_process_historian(
    spark: SparkSession, table: str, rows: int, partitions: Optional[int], **options
):
    """Process-historian style sensor table (reference
    ``datasets/basic_process_historian.py`` capability)."""
    n_devices = int(options.get("numDevices", 10_000))
    n_plants = int(options.get("numPlants", 100))
    n_tags = int(options.get("numTags", 10))
    start_ts = str(options.get("startTimestamp", "2024-01-01 00:00:00"))
    end_ts = str(options.get("endTimestamp", "2024-02-01 00:00:00"))
    parts = partitions or _auto_partitions(rows, 8)
    return (
        DataGenerator(spark, name="process_historian", rows=rows, partitions=parts)
        .withColumn("internal_device_id", "long", minValue=0x1000000000000,
                    uniqueValues=n_devices, omit=True)
        .withColumn("device_id", "string", format="0x%09x",
                    baseColumn="internal_device_id")
        .withColumn("plant_id", "string", prefix="plant", minValue=1,
                    maxValue=n_plants, random=True)
        .withColumn("tag_name", "string", prefix="tag", minValue=1,
                    maxValue=n_tags, random=True)
        .withColumn("ts", "timestamp", begin=start_ts, end=end_ts,
                    interval="1 second", random=True)
        .withColumn("value", "double", minValue=0.0, maxValue=400.0, random=True)
        .withColumn("engineering_units", "string", values=["Deg.F"])
    )


@dataset_definition(
    name="basic/stock_ticker",
    summary="Daily OHLCV stock quotes with per-symbol growth model",
    tables=["primary"],
)
def basic_stock_ticker(
    spark: SparkSession, table: str, rows: int, partitions: Optional[int], **options
):
    """Deterministic stock-ticker table (reference
    ``datasets/basic_stock_ticker.py`` capability): one row per symbol per
    day; open/close/high/low derive from a per-symbol start value, growth
    rate, and a bounded oscillator, so every build is reproducible."""
    n_symbols = int(options.get("numSymbols", 100))
    start_date = str(options.get("startDate", "2024-10-01"))
    parts = partitions or _auto_partitions(rows, 8)
    return (
        DataGenerator(spark, name="stock_ticker", rows=rows, partitions=parts)
        .withColumn("symbol_id", "long", expr=f"id % {n_symbols}", omit=True)
        .withColumn(
            "symbol", "string",
            expr=(
                "concat_ws('', transform(split(conv(symbol_id, 10, 26), ''), "
                "x -> case when ascii(x) < 58 then char(ascii(x) + 17) "
                "else char(ascii(x) + 10) end))"
            ),
        )
        .withColumn("day_offset", "int", expr=f"floor(id div {n_symbols})", omit=True)
        .withColumn("post_date", "date",
                    expr=f"date_add(cast('{start_date}' as date), day_offset)")
        .withColumn("start_value", "decimal(11,2)",
                    expr="1.0 + pmod(hash(symbol_id) / 2147483647.0, 1.0) * 199.0",
                    omit=True)
        .withColumn("growth_rate", "float",
                    expr="-0.1 + pmod(hash(symbol_id, 7) / 2147483647.0, 1.0) * 0.35",
                    omit=True)
        .withColumn("volatility", "float",
                    expr="pmod(hash(symbol_id, 13) / 2147483647.0, 1.0) * 0.0075",
                    omit=True)
        .withColumn(
            "open", "decimal(11,2)",
            expr=(
                "greatest(start_value * (1.0 + growth_rate * day_offset / 365.0)"
                " + volatility * start_value * sin((id - 1) % 17), 0.0)"
            ),
        )
        .withColumn(
            "close", "decimal(11,2)",
            expr=(
                "greatest(start_value * (1.0 + growth_rate * day_offset / 365.0)"
                " + volatility * start_value * sin(id % 17), 0.0)"
            ),
        )
        .withColumn("high", "decimal(11,2)",
                    expr="greatest(open, close) * 1.01")
        .withColumn("low", "decimal(11,2)",
                    expr="least(open, close) * 0.99")
        .withColumn("adj_close", "decimal(11,2)", expr="close")
        .withColumn("volume", "long", minValue=100_000, maxValue=5_000_000,
                    random=True)
    )


@dataset_definition(
    name="basic/telematics",
    summary="Vehicle telematics pings: device, ts, lat/lon, speed, heading",
    tables=["primary"],
)
def basic_telematics(
    spark: SparkSession, table: str, rows: int, partitions: Optional[int], **options
):
    """Telematics ping table (reference ``datasets/basic_telematics.py``
    capability), with optional WKT output."""
    n_devices = int(options.get("numDevices", 1000))
    min_lat = float(options.get("minLatitude", 40.0))
    max_lat = float(options.get("maxLatitude", 43.0))
    min_lon = float(options.get("minLongitude", -93.0))
    max_lon = float(options.get("maxLongitude", -89.0))
    generate_wkt = bool(options.get("generateWkt", False))
    parts = partitions or _auto_partitions(rows, 8)
    gen = (
        DataGenerator(spark, name="telematics", rows=rows, partitions=parts)
        .withColumn("device_id", "long", minValue=1, uniqueValues=n_devices,
                    random=True)
        .withColumn("ts", "timestamp", begin="2024-01-01 00:00:00",
                    end="2024-01-31 23:59:59", interval="1 second", random=True)
        .withColumn("lat", "decimal(8,5)", minValue=min_lat, maxValue=max_lat,
                    random=True)
        .withColumn("lon", "decimal(8,5)", minValue=min_lon, maxValue=max_lon,
                    random=True)
        .withColumn("speed_kph", "decimal(5,1)", minValue=0.0, maxValue=140.0,
                    random=True)
        .withColumn("heading", "int", minValue=0, maxValue=359, random=True)
    )
    if generate_wkt:
        gen = gen.withColumn(
            "wkt", "string", expr="concat('POINT(', lon, ' ', lat, ')')"
        )
    return gen


@dataset_definition(
    name="multi_table/telephony",
    summary="Telecom scenario: plans, customers, device events",
    tables=["plans", "customers", "device_events"],
    primary_table="customers",
)
def multi_table_telephony(
    spark: SparkSession, table: str, rows: int, partitions: Optional[int], **options
):
    """Telephony multi-table scenario (reference
    ``datasets/multi_table_telephony_provider.py`` capability): key ranges
    are aligned so FK joins line up without materializing parents."""
    n_plans = int(options.get("numPlans", 20))
    n_customers = int(options.get("numCustomers", max(10, rows)))
    parts = partitions or _auto_partitions(rows, 8)
    if table == "plans":
        return (
            DataGenerator(spark, name="plans", rows=n_plans, partitions=1)
            .withColumn("plan_id", "int", minValue=1, maxValue=n_plans)
            .withColumn("plan_name", "string", prefix="plan", baseColumn="plan_id")
            .withColumn("cost_per_minute", "decimal(5,3)", minValue=0.005,
                        maxValue=0.375, random=True)
            .withColumn("cost_per_message", "decimal(5,3)", minValue=0.001,
                        maxValue=0.02, random=True)
            .withColumn("cost_per_mb", "decimal(5,3)", minValue=0.01,
                        maxValue=0.05, random=True)
            .withColumn("ld_multiplier", "decimal(4,2)", minValue=1.5,
                        maxValue=3.0, random=True)
        )
    if table == "customers":
        return (
            DataGenerator(spark, name="customers", rows=n_customers,
                          partitions=parts)
            .withColumn("customer_id", "decimal(10)", minValue=1,
                        uniqueValues=n_customers)
            .withColumn("customer_name", "string", template=r"\w \w")
            .withColumn("phone_number", "string", template="ddd-ddd-dddd")
            .withColumn("email", "string", format="subscriber_%s@myoperator.com",
                        baseColumn="customer_id")
            .withColumn("plan_id", "int", minValue=1, maxValue=n_plans,
                        random=True)
        )
    if table == "device_events":
        return (
            DataGenerator(spark, name="device_events", rows=rows * 5,
                          partitions=parts)
            .withColumn("event_id", "long", minValue=1, maxValue=rows * 5)
            .withColumn("customer_id", "decimal(10)", minValue=1,
                        maxValue=n_customers, random=True)
            .withColumn("event_type", "string",
                        values=["sms", "internet", "local_call", "ld_call"],
                        weights=[50, 30, 15, 5], random=True)
            .withColumn("event_ts", "timestamp", begin="2024-07-01 00:00:00",
                        end="2024-07-31 23:59:59", interval="1 second",
                        random=True)
            .withColumn("minutes", "decimal(6,1)", minValue=1.0, maxValue=60.0,
                        random=True)
            .withColumn("bytes_transferred", "long", minValue=1024,
                        maxValue=100_000_000, random=True)
        )
    raise ValueError(f"unknown telephony table {table!r}")
