"""PySpark-native analytics engine with the capability surface of
KhongDucQuang/Real_Estate_Bigdata, rebuilt Spark-first.

The reference is a Lambda-architecture ETL pipeline (Selenium crawler ->
Kafka -> HDFS JSONL -> Spark/MapReduce batch views). This package
re-expresses that entire surface — plus a 100 TB-scale analytics and
training-data-pipeline extension — as idiomatic PySpark:

- ``schema``     : explicit StructTypes (the reference infers everything)
- ``session``    : tuned SparkSession factory (AQE, Arrow, shuffle sizing)
- ``functions``  : normalization (crawler parse cluster as Column exprs),
                   text analysis, vector math
- ``operators``  : batch analytics (aggregates, joins, windows, top-k),
                   dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                   similarity search over embeddings
- ``sources``    : partitioned Parquet lake, JSONL ingest, Kafka config,
                   compaction
- ``streaming``  : Structured Streaming ingest (file/Kafka source ->
                   normalize -> partitioned sink), event-time windows
"""

__version__ = "0.1.0"
