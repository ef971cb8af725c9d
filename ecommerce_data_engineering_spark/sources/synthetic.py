"""Synthetic e-commerce data source (SURVEY.md §2.1 S8).

The reference seeds Faker+numpy (generate_data.py:9-10) and builds 7
CSVs on the driver.  Here generation is **distributed and
deterministic**: every column is a pure function of the row id
(`spark.range` + arithmetic + md5), so any executor count produces the
same table — no Python loop, no driver bottleneck, works at any scale.

Value domains follow FIXTURES.md §1-7 (segment weights 0.2/0.6/0.2,
30% anonymous clickstream, 0-stock inventory rows, ≤0-price DQ rows,
messy emails for the P1 cleaner...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SEED_DATE = "2024-07-08"  # the reference's fallback date key (warehouse_dag.py:312)

_SEGMENTS = ("Premium", "Regular", "Budget")
_CITIES = ("Dhaka", "Chittagong", "Sylhet", "Rajshahi", "Khulna")
_CATEGORIES = ("Electronics", "Fashion", "Home & Garden", "Books",
               "Sports", "Beauty")
_STATUSES = ("Completed", "Shipped", "Processing", "Cancelled")
_EVENT_TYPES = ("page_view", "product_view", "add_to_cart",
                "remove_from_cart", "checkout_start", "purchase", "search")
_WAREHOUSES = ("Dhaka_Main", "Chittagong_Hub", "Sylhet_Center")
_CHANNELS = ("Email", "Facebook Ads", "Google Ads", "SMS", "Instagram")


def _pick(col, options: tuple[str, ...]):
    """Deterministic categorical pick by modulus."""
    expr = F.lit(options[0])
    chain = F.when(col % len(options) == 0, F.lit(options[0]))
    for i, o in enumerate(options[1:], start=1):
        chain = chain.when(col % len(options) == i, F.lit(o))
    return chain.otherwise(expr)


def customers(spark: SparkSession, n: int = 2500) -> DataFrame:
    i = F.col("id")
    # weights 0.2 / 0.6 / 0.2 (generate_data.py:18-19)
    segment = (F.when(i % 10 < 2, "Premium")
                .when(i % 10 < 8, "Regular")
                .otherwise("Budget"))
    return spark.range(n).select(
        F.format_string("CUST_%06d", i).alias("customer_id"),
        F.concat(F.lit("First"), i % 997).alias("first_name"),
        F.concat(F.lit("Last"), i % 499).alias("last_name"),
        # messy emails: every 17th uppercase+padded → exercises P1
        F.when(i % 17 == 0,
               F.format_string("  FIRST.LAST%d@GMAIL.COM  ", i))
         .otherwise(F.format_string("first.last%d@gmail.com", i))
         .alias("email"),
        _pick(i, _CITIES).alias("city"),
        F.lit("Bangladesh").alias("country"),
        F.date_add(F.lit("2022-07-08").cast("date"), (i % 730).cast("int"))
         .alias("registration_date"),
        # every 97th NULL segment → exercises P2 fillna('Unknown')
        F.when(i % 97 == 0, F.lit(None).cast("string"))
         .otherwise(segment).alias("customer_segment"),
        (i % 3 != 0).alias("marketing_consent"),
    )


def products(spark: SparkSession, n: int = 650) -> DataFrame:
    i = F.col("id")
    sell = (F.lit(50) + (i * 7) % 1450 + F.lit(0.99)).cast("decimal(10,2)")
    cost = (sell * F.lit(0.55)).cast("decimal(10,2)")
    return spark.range(n).select(
        F.format_string("PROD_%06d", i).alias("product_id"),
        F.format_string("Product %d", i).alias("product_name"),
        _pick(i, _CATEGORIES).alias("category"),
        F.concat(F.lit("Brand"), i % 40).alias("brand"),
        # every 111th non-positive cost → exercises Q4 invalid-price check
        F.when(i % 111 == 110, F.lit(0).cast("decimal(10,2)"))
         .otherwise(cost).alias("cost_price"),
        sell.alias("selling_price"),
        (i % 4 != 0).alias("is_active"),
    )


def orders(spark: SparkSession, n: int = 12000, n_customers: int = 2500) -> DataFrame:
    i = F.col("id")
    subtotal = (F.lit(20) + (i * 13) % 980 + F.lit(0.50)).cast("decimal(12,2)")
    discount = (F.when(i % 5 == 0, subtotal * F.lit(0.10))
                 .otherwise(F.lit(0))).cast("decimal(12,2)")
    shipping = (F.when(subtotal > 500, F.lit(0))
                 .otherwise(F.lit(10) + i % 41)).cast("decimal(8,2)")
    tax = ((subtotal - discount) * F.lit(0.15)).cast("decimal(10,2)")
    return spark.range(n).select(
        F.format_string("ORD_%08d", i).alias("order_id"),
        F.format_string("CUST_%06d", (i * 31) % n_customers).alias("customer_id"),
        F.date_sub(F.lit(SEED_DATE).cast("date"), (i % 365).cast("int"))
         .alias("order_date"),
        _pick(i, _STATUSES).alias("order_status"),
        subtotal.alias("subtotal"),
        discount.alias("discount_amount"),
        shipping.alias("shipping_cost"),
        tax.alias("tax_amount"),
        (subtotal - discount + shipping + tax).cast("decimal(12,2)")
         .alias("total_amount"),
    )


def order_items(spark: SparkSession, n_orders: int = 12000,
                n_products: int = 650) -> DataFrame:
    """~2 items per order (1-3 by id pattern, FIXTURES.md §4)."""
    i = F.col("id")
    n_items = 2 * n_orders
    qty = (i % 3 + 1).cast("int")
    unit = (F.lit(50) + ((i * 13) % n_products * 7) % 1450 + F.lit(0.99)) \
        .cast("decimal(10,2)")
    return spark.range(n_items).select(
        F.format_string("OI_%08d", i).alias("order_item_id"),
        F.format_string("ORD_%08d", i % n_orders).alias("order_id"),
        F.format_string("PROD_%06d", (i * 13) % n_products).alias("product_id"),
        qty.alias("quantity"),
        unit.alias("unit_price"),
        (unit * qty).cast("decimal(12,2)").alias("total_price"),
    )


def clickstream(spark: SparkSession, n: int = 75000,
                n_customers: int = 2500, n_products: int = 650) -> DataFrame:
    i = F.col("id")
    return spark.range(n).select(
        F.format_string("EVT_%08d", i).alias("event_id"),
        F.md5(F.concat(F.lit("sess"), (i / 7).cast("long").cast("string")))
         .alias("session_id"),
        # 30% anonymous (generate_data.py:251) — the null-key skew driver
        F.when(i % 10 < 3, F.lit(None).cast("string"))
         .otherwise(F.format_string("CUST_%06d", (i * 17) % n_customers))
         .alias("customer_id"),
        F.when(i % 2 == 0, F.lit(None).cast("string"))
         .otherwise(F.format_string("PROD_%06d", (i * 7) % n_products))
         .alias("product_id"),
        _pick(i, _EVENT_TYPES).alias("event_type"),
        _pick(i * 3, ("desktop", "mobile", "tablet")).alias("device_type"),
        (F.lit(SEED_DATE).cast("timestamp")
         - F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                              (i % 31536000).cast("double"))).alias("timestamp"),
        (i % 296 + 5).cast("int").alias("duration_seconds"),
    )


def inventory(spark: SparkSession, n_products: int = 650) -> DataFrame:
    i = F.col("id")
    prod = (i / 3).cast("long")
    return spark.range(n_products * 3).select(
        F.format_string("INV_%06d", i).alias("inventory_id"),
        F.format_string("PROD_%06d", prod).alias("product_id"),
        _pick(i, _WAREHOUSES).alias("warehouse_location"),
        # includes 0-stock rows (FIXTURES.md §7 — the divide-guard case)
        (i * 37 % 1001).cast("int").alias("current_stock"),
        (i % 51).cast("int").alias("reserved_stock"),
    )


def marketing_campaigns(spark: SparkSession, n: int = 25) -> DataFrame:
    i = F.col("id")
    start = F.date_add(F.lit("2023-07-15").cast("date"), (i * 12).cast("int"))
    return spark.range(n).select(
        F.format_string("CAMP_%06d", i).alias("campaign_id"),
        F.format_string("Campaign %d", i).alias("campaign_name"),
        _pick(i, _CHANNELS).alias("channel"),
        start.alias("start_date"),
        F.date_add(start, (7 + (i * 2) % 54).cast("int")).alias("end_date"),
        (F.lit(5000) + (i * 997) % 95000).cast("decimal(12,2)").alias("budget"),
    )


def generate_ecommerce(spark: SparkSession, scale: float = 1.0) -> dict[str, DataFrame]:
    """All 7 staging inputs at a fraction of reference volume
    (scale=1.0 ≙ the reference's 2500/650/12000/24000/75000/25/1950)."""
    n_cust = max(50, int(2500 * scale))
    n_prod = max(20, int(650 * scale))
    n_ord = max(100, int(12000 * scale))
    n_click = max(200, int(75000 * scale))
    return {
        "customers": customers(spark, n_cust),
        "products": products(spark, n_prod),
        "orders": orders(spark, n_ord, n_cust),
        "order_items": order_items(spark, n_ord, n_prod),
        "clickstream": clickstream(spark, n_click, n_cust, n_prod),
        "inventory": inventory(spark, n_prod),
        "marketing_campaigns": marketing_campaigns(spark),
    }
