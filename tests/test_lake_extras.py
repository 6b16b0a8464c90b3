"""CSV sink/source, bucketed tables (shuffle-free co-located joins),
and the multi-source registry fan-out."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from real_estate_bigdata_spark.plans import plan_stats
from real_estate_bigdata_spark.schema import load_table
from real_estate_bigdata_spark.sources import lake
from real_estate_bigdata_spark.sources.registry import SourceRegistry, SourceSpec

SF = "/root/testdata/sf0.01"


def test_orc_roundtrip_with_partitioning_and_pushdown(spark, tmp_path):
    df = spark.createDataFrame(
        [("Đống Đa", "2024-01-01", 3), ("Gò Vấp", "2024-01-02", 7)],
        "quan_huyen string, ingest_date string, so_luong int",
    )
    path = str(tmp_path / "lake_orc")
    lake.write_orc(df, path, partition_by=("ingest_date",))
    back = lake.read_orc(spark, path)
    assert {(r.quan_huyen, r.so_luong) for r in back.collect()} == {
        ("Đống Đa", 3),
        ("Gò Vấp", 7),
    }
    # partition pruning: a filter on the partition column must cut the
    # scan to one directory (one row survives without reading the other)
    pruned = back.filter(back.ingest_date == "2024-01-02")
    assert pruned.count() == 1
    # predicate pushdown reaches the ORC scan like parquet
    from real_estate_bigdata_spark.plans import plan_stats

    assert plan_stats(back.filter(back.so_luong > 5)).scans_with_pushdown >= 1


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("Đống Đa", 3), ("Gò Vấp", 7)], "quan_huyen string, so_luong int"
    )
    path = str(tmp_path / "view_csv")
    lake.write_csv_view(df, path)
    back = lake.read_csv(spark, path, df.schema)
    assert {(r.quan_huyen, r.so_luong) for r in back.collect()} == {
        ("Đống Đa", 3),
        ("Gò Vấp", 7),
    }


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must join with ZERO
    exchanges and zero extra sorts — the pay-the-shuffle-once-at-ingest
    contract that makes repeated fact-fact joins viable at scale."""
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    try:
        lake.write_bucketed(
            orders, "t_orders_b", str(tmp_path / "ob"), ("o_orderkey",), 8,
            sort_cols=("o_orderkey",),
        )
        lake.write_bucketed(
            lineitem, "t_lineitem_b", str(tmp_path / "lb"), ("l_orderkey",), 8,
            sort_cols=("l_orderkey",),
        )
        ob = spark.table("t_orders_b")
        lb = spark.table("t_lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        stats = plan_stats(ob.join(lb, ob.o_orderkey == lb.l_orderkey))
        assert stats.shuffles == 0, stats
        # and the full aggregate query still returns correct results
        plain = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_registry_multi_source_fanout(spark, tmp_path):
    rec = {
        "raw_post_date": "24/04/2025", "duong_pho": "Lê Lợi", "phuong_xa": "Bến Nghé",
        "quan_huyen": "Quận 1", "thanh_pho": "Hồ Chí Minh", "loai_bds": "Nhà đất",
        "raw_price": "1,5 tỷ", "raw_area": "45 m2", "raw_kich_thuoc": "4x10m",
        "duong_truoc_nha": "5m", "so_tang": "2 lầu", "so_phong_ngu": "3 phòng ngủ",
        "cho_de_xe": "Có", "source": "payload-claims-otherwise", "link": None,
        "title": None,
    }
    for src in ("alpha", "beta"):
        d = tmp_path / src
        d.mkdir()
        with open(d / "drop.jsonl", "w", encoding="utf-8") as f:
            for i in range(3):
                f.write(json.dumps(rec, ensure_ascii=False) + "\n")

    reg = (
        SourceRegistry()
        .register(SourceSpec(name="alpha", src=str(tmp_path / "alpha")))
        .register(SourceSpec(name="beta", src=str(tmp_path / "beta")))
    )
    queries = reg.start_all(
        spark, str(tmp_path / "lake"), str(tmp_path / "ckpt"), available_now=True
    )
    assert len(queries) == 2
    for q in queries:
        q.awaitTermination(120)
    out = lake.read_lake(spark, str(tmp_path / "lake"))
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # registry name wins over the payload's claimed source
    assert counts == {"alpha": 3, "beta": 3}


def test_registry_rejects_duplicates():
    reg = SourceRegistry().register(SourceSpec(name="x", src="/tmp/x"))
    try:
        reg.register(SourceSpec(name="x", src="/tmp/y"))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_write_lake_cluster_by_produces_file_skipping_ranges(spark, tmp_path):
    """cluster_by must leave each parquet file with a narrow value range
    so footer min/max stats can skip files: with enough distinct keys and
    multiple output files, per-file (min, max) spans must be (near-)
    disjoint — here strictly non-overlapping since keys are unique."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    n = 10_000
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.lit("2024-01-01").alias("ingest_date"),
            F.lit("s").alias("source"),
        )
        .repartition(8)  # deliberately scrambled input
    )
    path = str(tmp_path / "clustered")
    lake.write_lake(df, path, mode="overwrite", cluster_by=("k",), cluster_partitions=6)
    import glob

    files = glob.glob(f"{path}/**/*.parquet", recursive=True)
    assert len(files) > 1, "need multiple files to demonstrate skipping"
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"
    # and the data is intact
    assert lake.read_lake(spark, path).count() == n


class TestExportJsonlShards:
    """Deterministic training-data export: shard layout, permutation
    order, manifest integrity, epoch salts."""

    def _docs(self, spark):
        from real_estate_bigdata_spark.schema import load_table

        return load_table(spark, "/root/testdata/sf0.01", "documents").select(
            "doc_id", "text", "source"
        )

    def test_layout_order_and_manifest(self, spark, tmp_path):
        import json as _json

        from real_estate_bigdata_spark.operators.sampling import shuffle_shard
        from real_estate_bigdata_spark.sources.lake import export_jsonl_shards

        docs = self._docs(spark)
        out = str(tmp_path / "export")
        manifest = export_jsonl_shards(docs, out, n_shards=8).collect()
        assert [r.shard for r in manifest] == list(range(8))
        assert sum(r.n_rows for r in manifest) == docs.count()

        # each shard dir holds exactly ONE data file, in (shard,pos) order
        expected = shuffle_shard(docs, 8)
        for r in manifest:
            shard_dir = tmp_path / "export" / f"shard={r.shard}"
            files = [
                p for p in shard_dir.iterdir()
                if p.name.startswith("part-") and not p.name.endswith(".crc")
            ]
            assert len(files) == 1, files
            lines = files[0].read_text(encoding="utf-8").splitlines()
            assert len(lines) == r.n_rows
            ids = [_json.loads(ln)["doc_id"] for ln in lines]
            want = [
                row.doc_id
                for row in expected.filter(F.col("shard") == r.shard)
                .orderBy("pos")
                .collect()
            ]
            assert ids == want
            # manifest byte count matches the physical file
            assert files[0].stat().st_size == r.n_bytes

        # _MANIFEST written and readable, invisible to a reader of out
        mdf = spark.read.json(f"{out}/_MANIFEST")
        assert mdf.count() == 8
        txt = spark.read.text(out)
        assert txt.count() == docs.count()

    def test_deterministic_and_salted(self, spark, tmp_path):
        from real_estate_bigdata_spark.sources.lake import export_jsonl_shards

        docs = self._docs(spark)
        m1 = export_jsonl_shards(
            docs, str(tmp_path / "a"), 4, write_manifest=False
        ).collect()
        m2 = export_jsonl_shards(
            docs.repartition(13), str(tmp_path / "b"), 4, write_manifest=False
        ).collect()
        assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
        m3 = export_jsonl_shards(
            docs, str(tmp_path / "c"), 4, salt="epoch1", write_manifest=False
        ).collect()
        # same corpus, different permutation: totals match, layout differs
        assert sum(r.n_rows for r in m3) == sum(r.n_rows for r in m1)
        assert [tuple(r) for r in m3] != [tuple(r) for r in m1]

    def test_rejects_empty_schema(self, spark, tmp_path):
        import pytest as _pytest

        from real_estate_bigdata_spark.sources.lake import export_jsonl_shards

        empty_cols = spark.createDataFrame([], "x int").drop("x")
        with _pytest.raises(ValueError):
            export_jsonl_shards(empty_cols, str(tmp_path / "z"), 2)
