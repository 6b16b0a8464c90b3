"""Explicit schemas — the engine's central contracts.

The reference infers schemas everywhere (`spark_jobs/count_by_district.py:22`
uses `spark.read.json` inference; the mapper tolerates anything,
`batch_jobs/listing_count_by_district/mapper.py:18`). At 100 TB an
inference pass is a full extra scan, and inferred types drift per
partition — so every table here is pinned once and shared by batch and
streaming paths.

SESSION-CONF CONTRACT: ``load_table``/``load_tables`` PERMANENTLY pin
``spark.sql.session.timeZone=UTC`` and
``spark.sql.legacy.parquet.nanosAsLong=true`` on the caller's session —
the timestamp normalizations they build are lazy and consult the session
timezone at EXECUTION time, so restoring the confs after the (unexecuted)
read would silently corrupt the returned DataFrames. A caller that needs
a non-UTC session timezone for its own queries must use a separate
SparkSession for engine tables, or re-set the conf between engine and
non-engine queries (accepting that engine DataFrames must be fully
materialized first).

`RAW_LISTING_SCHEMA` mirrors the loose crawler record
(`crawler/alonhadat.py:177-193`): strings and union types exactly as the
scraper emits them. `LISTING_SCHEMA` is the normalized engine table
(SURVEY.md §1.2): the `price` union type (float | "Thỏa thuận" |
"Không rõ", `crawler/alonhadat.py:125-137`) is split into
`price_ty DOUBLE + price_status STRING`.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# Listing pipeline schemas
# --------------------------------------------------------------------------

#: Raw scraped record as the crawler emits it (crawler/alonhadat.py:177-193)
#: and as it lands in the JSONL lake. All-loose types on purpose: the
#: normalization operators consume exactly this.
RAW_LISTING_SCHEMA = StructType(
    [
        StructField("raw_post_date", StringType()),
        StructField("duong_pho", StringType()),
        StructField("phuong_xa", StringType()),
        StructField("quan_huyen", StringType()),
        StructField("thanh_pho", StringType()),
        StructField("loai_bds", StringType()),
        StructField("raw_price", StringType()),
        StructField("raw_area", StringType()),
        StructField("raw_kich_thuoc", StringType()),
        StructField("duong_truoc_nha", StringType()),
        StructField("so_tang", StringType()),
        StructField("so_phong_ngu", StringType()),
        StructField("cho_de_xe", StringType()),
        StructField("source", StringType()),
        StructField("link", StringType()),
        StructField("title", StringType()),
    ]
)

#: Normalized listing table (SURVEY.md §1.2 target types).
LISTING_SCHEMA = StructType(
    [
        StructField("post_date", DateType()),
        StructField("duong_pho", StringType()),
        StructField("phuong_xa", StringType()),
        StructField("quan_huyen", StringType()),
        StructField("thanh_pho", StringType()),
        StructField("loai_bds", StringType()),
        StructField("area", DoubleType()),
        StructField("chieu_ngang", DoubleType()),
        StructField("chieu_dai", DoubleType()),
        StructField("duong_truoc_nha", DoubleType()),
        StructField("so_tang", IntegerType()),
        StructField("so_phong_ngu", IntegerType()),
        StructField("cho_de_xe", BooleanType()),
        StructField("price_ty", DoubleType()),
        StructField("price_status", StringType()),
        StructField("source", StringType()),
        StructField("ingest_date", DateType()),
    ]
)

#: Kafka envelope for the streaming path (kafka_cc/producer/kafka_producer.py:59-63).
KAFKA_ENVELOPE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("value", StringType()),
        StructField("topic", StringType()),
        StructField("timestamp", TimestampType()),
    ]
)

# --------------------------------------------------------------------------
# Driver analytical tables (/root/testdata/sf*/ — TESTDATA.md)
# --------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)


def load_table(spark, sf_dir: str, name: str):
    """Read one driver testdata table as a DataFrame.

    Parquet carries its own schema, so no inference pass happens; column
    pruning + predicate pushdown apply at the scan.

    Timestamp columns have shipped in two physical encodings across
    testdata generations: parquet TIMESTAMP(NANOS) (which Spark's
    vectorized reader rejects — read as raw nanos via the legacy conf,
    truncate to micros exactly like DuckDB does) and TIMESTAMP(MICROS)
    without the UTC-adjusted flag (which Spark reads as TIMESTAMP_NTZ).
    Both are normalized to session-UTC TimestampType so every downstream
    operator and oracle sees identical wall-clock values.
    """
    from pyspark.sql import functions as F

    # Both normalizations below are only instant-preserving under
    # spark.sql.session.timeZone=UTC, and NANOS-encoded columns only read
    # at all under the legacy nanosAsLong conf. The module contract
    # (entry(spark)/queries()) means callers may hand us THEIR session —
    # both confs are runtime-settable and idempotent, so pin them here
    # rather than requiring get_spark-built sessions. The pin is
    # deliberately PERMANENT (module-docstring contract): the returned
    # DataFrame is lazy and reads session.timeZone at execution time, so
    # restoring the conf here would corrupt the casts below once the
    # caller actually runs the query.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col, dtype in df.dtypes:
        if name == "events" and col == "ts" and dtype == "bigint":
            # TIMESTAMP(NANOS) surfaced as raw nanos under the legacy conf
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype.startswith("timestamp_ntz"):
            # wall-clock preserving under the session's UTC timezone
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES):
    """Load several testdata tables at once -> dict[name, DataFrame]."""
    return {n: load_table(spark, sf_dir, n) for n in names}
