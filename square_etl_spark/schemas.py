"""Explicit StructType schemas.

The reference declares nominal TypeScript interfaces with
nullable-by-default fields and normalizes missing values to SQL NULL
(reference src/etl-square-payments.ts:27-47 and the five sibling
mappers; SURVEY.md §1.3).  This engine's equivalent stance: every
source and warehouse table has a declared StructType — schema
inference never runs on a production path — all business fields are
nullable, and every warehouse table carries the three tenancy columns
plus a raw_payload escape hatch (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Warehouse star schema (reference parity — SURVEY.md §1.4)
# ---------------------------------------------------------------------------

#: columns every warehouse table carries (reference: env constants
#: injected per row, src/etl-square-payments.ts:100-103; raw payload
#: kept at :45).
TENANCY_FIELDS = [
    T.StructField("tenant_id", T.StringType(), False),
    T.StructField("provider", T.StringType(), False),
    T.StructField("provider_account_id", T.StringType(), True),
]
RAW_PAYLOAD_FIELD = T.StructField("raw_payload", T.StringType(), True)

#: money is integer minor units + currency code — never float
#: (reference SquareMoney, src/square.ts:15-18; SURVEY.md §1.2).
MONEY = T.StructType(
    [
        T.StructField("amount", T.LongType(), True),
        T.StructField("currency", T.StringType(), True),
    ]
)

POS_PAYMENTS = T.StructType(
    TENANCY_FIELDS
    + [
        T.StructField("payment_id", T.StringType(), False),
        T.StructField("order_id", T.StringType(), True),
        T.StructField("location_id", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("amount", T.LongType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("reference_id", T.StringType(), True),
        RAW_PAYLOAD_FIELD,
    ]
)
#: natural key per reference ON CONFLICT (src/etl-square-payments.ts:82)
POS_PAYMENTS_KEY = ["tenant_id", "provider", "payment_id"]

POS_ORDER_ITEMS = T.StructType(
    TENANCY_FIELDS
    + [
        T.StructField("order_id", T.StringType(), False),
        T.StructField("payment_id", T.StringType(), True),
        T.StructField("line_item_uid", T.StringType(), False),
        T.StructField("catalog_object_id", T.StringType(), True),
        T.StructField("item_name", T.StringType(), True),
        T.StructField("sku", T.StringType(), True),
        T.StructField("quantity", T.DoubleType(), True),
        T.StructField("base_price_amount", T.LongType(), True),
        T.StructField("total_money_amount", T.LongType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("location_id", T.StringType(), True),
        RAW_PAYLOAD_FIELD,
    ]
)
POS_ORDER_ITEMS_KEY = ["tenant_id", "provider", "order_id", "line_item_uid"]

POS_CATALOG = T.StructType(
    TENANCY_FIELDS
    + [
        T.StructField("catalog_object_id", T.StringType(), False),
        T.StructField("object_type", T.StringType(), True),
        T.StructField("item_name", T.StringType(), True),
        T.StructField("variation_name", T.StringType(), True),
        T.StructField("sku", T.StringType(), True),
        T.StructField("category_id", T.StringType(), True),
        T.StructField("is_deleted", T.BooleanType(), True),
        RAW_PAYLOAD_FIELD,
    ]
)
POS_CATALOG_KEY = ["tenant_id", "provider", "provider_account_id", "catalog_object_id"]

POS_INVENTORY = T.StructType(
    TENANCY_FIELDS
    + [
        T.StructField("catalog_object_id", T.StringType(), False),
        T.StructField("catalog_object_type", T.StringType(), True),
        T.StructField("location_id", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("quantity", T.DoubleType(), True),
        T.StructField("calculated_at", T.TimestampType(), True),
        RAW_PAYLOAD_FIELD,
    ]
)
POS_INVENTORY_KEY = [
    "tenant_id",
    "provider",
    "provider_account_id",
    "catalog_object_id",
    "location_id",
    "state",
]

POS_CATEGORIES = T.StructType(
    TENANCY_FIELDS
    + [
        T.StructField("category_id", T.StringType(), False),
        T.StructField("category_name", T.StringType(), True),
        T.StructField("parent_category_id", T.StringType(), True),
        T.StructField("is_top_level", T.BooleanType(), True),
        T.StructField("is_deleted", T.BooleanType(), True),
        RAW_PAYLOAD_FIELD,
    ]
)
POS_CATEGORIES_KEY = ["tenant_id", "provider", "provider_account_id", "category_id"]

POS_LOCATIONS = T.StructType(
    TENANCY_FIELDS
    + [
        T.StructField("location_id", T.StringType(), False),
        T.StructField("location_name", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        RAW_PAYLOAD_FIELD,
    ]
)
POS_LOCATIONS_KEY = ["tenant_id", "provider", "provider_account_id", "location_id"]

#: table name → (schema, natural key) for the merge sink and tests.
WAREHOUSE_TABLES: dict[str, tuple[T.StructType, list[str]]] = {
    "pos_payments": (POS_PAYMENTS, POS_PAYMENTS_KEY),
    "pos_order_items": (POS_ORDER_ITEMS, POS_ORDER_ITEMS_KEY),
    "pos_catalog": (POS_CATALOG, POS_CATALOG_KEY),
    "pos_inventory": (POS_INVENTORY, POS_INVENTORY_KEY),
    "pos_categories": (POS_CATEGORIES, POS_CATEGORIES_KEY),
    "pos_locations": (POS_LOCATIONS, POS_LOCATIONS_KEY),
}

# ---------------------------------------------------------------------------
# Fixture tables (driver-generated TPC-H-ish star schema — FIXTURES.md)
# ---------------------------------------------------------------------------
# Declared so that scans never depend on parquet footer inference being
# right, and so column pruning targets are explicit.

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

#: physical read schema for events WHEN the fixture stores ts as
#: parquet TIMESTAMP(NANOS) (which Spark cannot represent — read as
#: raw int64 via legacy.parquet.nanosAsLong, truncated to µs in
#: io.load_table, matching DuckDB's ns→µs cast).  Current fixture
#: generations store TIMESTAMP(MICROS); io.load_table sniffs the
#: footer and only applies the ns path when ts reads as bigint.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

FIXTURE_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
