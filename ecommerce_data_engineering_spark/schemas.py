"""Declared schemas — one StructType per table, never inferSchema in the
pipeline proper (SURVEY.md §1.3).

Two families:

1. FIXTURES — the driver's TPC-H-ish parquet tables (TESTDATA.md).
   These are what the oracle-checked queries read.
2. ECOMMERCE — the reference warehouse's staging tables
   (reference: database/init.sql:24-145), used by the synthetic
   generator + SCD2/quality unit tests.  Money stays DecimalType for
   the e-commerce schemas (init.sql:53-54); fixture-facing queries
   follow the fixtures' double types so value hashes match DuckDB
   (SURVEY.md §7.4.6).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# 1. Driver fixture schemas (parquet already typed; kept here for asserts
#    and for reading the same data from CSV/JSON if re-materialized).
# --------------------------------------------------------------------------

FIXTURES: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

FIXTURE_TABLES = tuple(FIXTURES)

# --------------------------------------------------------------------------
# 2. Reference e-commerce staging schemas (init.sql:24-145 / FIXTURES.md).
#    Only the columns the pipelines actually touch; DECIMAL preserved.
# --------------------------------------------------------------------------

ECOMMERCE: dict[str, T.StructType] = {
    "customers": T.StructType([
        T.StructField("customer_id", T.StringType(), False),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("registration_date", T.DateType()),
        T.StructField("customer_segment", T.StringType()),
        T.StructField("marketing_consent", T.BooleanType()),
    ]),
    "products": T.StructType([
        T.StructField("product_id", T.StringType(), False),
        T.StructField("product_name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("cost_price", T.DecimalType(10, 2)),
        T.StructField("selling_price", T.DecimalType(10, 2)),
        T.StructField("is_active", T.BooleanType()),
    ]),
    "orders": T.StructType([
        T.StructField("order_id", T.StringType(), False),
        T.StructField("customer_id", T.StringType()),
        T.StructField("order_date", T.DateType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("subtotal", T.DecimalType(12, 2)),
        T.StructField("discount_amount", T.DecimalType(12, 2)),
        T.StructField("shipping_cost", T.DecimalType(8, 2)),
        T.StructField("tax_amount", T.DecimalType(10, 2)),
        T.StructField("total_amount", T.DecimalType(12, 2)),
    ]),
    "order_items": T.StructType([
        T.StructField("order_item_id", T.StringType(), False),
        T.StructField("order_id", T.StringType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("unit_price", T.DecimalType(10, 2)),
        T.StructField("total_price", T.DecimalType(12, 2)),
    ]),
    "inventory": T.StructType([
        T.StructField("inventory_id", T.StringType(), False),
        T.StructField("product_id", T.StringType()),
        T.StructField("warehouse_location", T.StringType()),
        T.StructField("current_stock", T.IntegerType()),
        T.StructField("reserved_stock", T.IntegerType()),
    ]),
    "marketing_campaigns": T.StructType([
        T.StructField("campaign_id", T.StringType(), False),
        T.StructField("campaign_name", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("start_date", T.DateType()),
        T.StructField("end_date", T.DateType()),
        T.StructField("budget", T.DecimalType(12, 2)),
    ]),
    "clickstream": T.StructType([
        T.StructField("event_id", T.StringType(), False),
        T.StructField("session_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),   # NULL 30% (anonymous)
        T.StructField("product_id", T.StringType()),    # NULL 50%
        T.StructField("event_type", T.StringType()),
        T.StructField("device_type", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("duration_seconds", T.IntegerType()),
    ]),
}
