"""Round-2 source/ops surfaces: XML round-trip, streaming state-store
introspection, and runtime bloom-filter join pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.sources.readers import load_table, read_xml, write_xml


def test_xml_roundtrip(spark, tmp_path, sf_dir):
    """XML write→read round-trip (built-in Spark 4 XML source):
    rows and values survive; explicit schema read skips inference."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_xml")
    write_xml(nation, path, row_tag="nation", root_tag="nations")

    back = read_xml(
        spark,
        path,
        row_tag="nation",
        schema="n_nationkey INT, n_name STRING, n_regionkey INT",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_statestore_reader_introspects_checkpoint(spark, tmp_path, sf_dir):
    """The Spark 4 state-store reader turns a streaming checkpoint
    into a DataFrame — the ops surface for debugging stateful queries
    (what keys are in state? how big?) without replaying the stream.
    Run a windowed count over a file stream, then read its state back
    and reconcile against the stream's own output."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    load_table(spark, sf_dir, "events").limit(500).select(
        "event_id", "ts", "event_type"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
        .parquet(src)
        .groupBy("event_type")
        .count()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ss_probe")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    state = (
        spark.read.format("statestore")
        .load(ckpt)
        .select(
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").alias("n"),
        )
    )
    got = {r.event_type: r.n for r in state.collect()}
    want = {
        r.event_type: r["count"] for r in spark.table("ss_probe").collect()
    }
    assert got == want and len(got) > 0
    _ = out  # reserved for future sink variants


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Runtime bloom-filter join pruning (on by default in our
    session): a selective dimension side should inject a bloom probe
    into the fact scan — rows that can't join die in the scan stage
    instead of riding the shuffle. Thresholds are lowered here because
    sf0.001 is below the default 10 MB creation floor; on the real
    cluster the defaults apply."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join: broadcast joins skip bloom injection
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan or "BloomFilter" in plan or "might_contain" in plan
        # semantics unchanged by the injected filter
        n = joined.collect()[0].n
        expect = (
            li.join(orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey)
            .count()
        )
        assert n == expect
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_jsonl_sink_two_phase_commit(spark, tmp_path, sf_dir):
    """Python DataSource writer: per-partition staged files, driver
    commit renames + _SUCCESS manifest; every row lands exactly once."""
    import json
    import os

    from lime_etl_spark.sources.jsonl_sink import register_jsonl_sink

    register_jsonl_sink(spark)
    nation = load_table(spark, sf_dir, "nation").repartition(4)
    out = str(tmp_path / "feed")
    nation.write.mode("overwrite").format("jsonlsink").option("path", out).save()

    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(files) == 4  # one per partition, no driver funnel
    rows = []
    for fn in files:
        with open(os.path.join(out, fn), encoding="utf-8") as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["n_nationkey"] for r in rows) == sorted(
        r.n_nationkey for r in nation.collect()
    )
    with open(os.path.join(out, "_SUCCESS"), encoding="utf-8") as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == nation.count()
    assert sum(manifest["files"].values()) == nation.count()
    assert not os.path.isdir(os.path.join(out, "_staging"))  # staging cleaned


def test_jsonl_sink_abort_leaves_nothing(spark, tmp_path, sf_dir):
    """A failing partition must abort the job with no visible output —
    the half-written feed is the classic custom-sink footgun."""
    import os

    from pyspark.sql import functions as F

    from lime_etl_spark.sources.jsonl_sink import register_jsonl_sink

    register_jsonl_sink(spark)
    poisoned = (
        load_table(spark, sf_dir, "nation")
        .repartition(4)
        .withColumn(
            "boom",
            F.when(F.col("n_nationkey") >= 0, F.col("n_nationkey"))
            .otherwise(F.col("n_nationkey"))
            .cast("int"),
        )
        .withColumn("boom", F.expr("assert_true(n_nationkey < 10)"))
    )
    out = str(tmp_path / "feed_fail")
    try:
        poisoned.write.mode("overwrite").format("jsonlsink").option("path", out).save()
        raise AssertionError("write should have failed")
    except Exception:
        pass
    visible = [f for f in os.listdir(out) if f.endswith(".jsonl")] if os.path.isdir(out) else []
    assert visible == []
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))


def test_jsonl_sink_streaming_micro_batches(spark, tmp_path, sf_dir):
    """Streaming half of the Python DataSource sink: one commit per
    micro-batch (batch-{id} file names + manifest lines), every source
    row lands exactly once across batches."""
    import json
    import os

    from pyspark.sql import functions as F

    from lime_etl_spark.sources.jsonl_sink import register_jsonl_sink

    register_jsonl_sink(spark)
    src = str(tmp_path / "src")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang").limit(40)
    half1 = docs.where(F.col("doc_id") % 2 == 0)
    half2 = docs.where(F.col("doc_id") % 2 == 1)
    half1.coalesce(1).write.parquet(f"{src}/f1.parquet")
    half2.coalesce(1).write.parquet(f"{src}/f2.parquet")

    out = str(tmp_path / "feed")
    q = (
        spark.readStream.schema("doc_id bigint, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
        .writeStream.format("jsonlsink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    files = [
        f for f in os.listdir(out) if f.endswith(".jsonl") and not f.startswith("_")
    ]
    assert files and all(f.startswith("batch-") for f in files)
    got = []
    for fn in files:
        with open(os.path.join(out, fn), encoding="utf-8") as f:
            got += [json.loads(line)["doc_id"] for line in f]
    expected = sorted(r.doc_id for r in half1.collect()) + sorted(
        r.doc_id for r in half2.collect()
    )
    assert sorted(got) == sorted(expected)

    with open(os.path.join(out, "_streaming_manifest.jsonl"), encoding="utf-8") as f:
        manifest = [json.loads(line) for line in f]
    assert len({m["batch_id"] for m in manifest}) == len(manifest) >= 2
    assert sum(m["rows"] for m in manifest) == len(expected)


# --- real JDBC round-trip (driver round 2) -----------------------------------


def _find_duckdb_jdbc_jar():
    """The DuckDB JDBC driver is a public Maven Central artifact
    (org.duckdb:duckdb_jdbc); discover a locally cached copy rather
    than downloading (no network in this sandbox)."""
    import glob as _glob
    import os as _os

    for pattern in (
        "~/.cache/coursier/**/duckdb_jdbc-*.jar",
        "~/.m2/repository/org/duckdb/**/duckdb_jdbc-*.jar",
        "~/.ivy2/**/duckdb_jdbc-*.jar",
    ):
        hits = _glob.glob(_os.path.expanduser(pattern), recursive=True)
        if hits:
            return sorted(hits)[-1]
    return None


def test_jdbc_partitioned_read_and_writeback_real_driver(tmp_path):
    """End-to-end JDBC against a REAL database (file-backed DuckDB via
    its JDBC driver): parallel partitioned read (4 genuine JDBC range
    queries), filter pushdown to the remote scan, and a write-back
    verified by re-opening the file natively. Runs in a subprocess
    because the driver jar must be on the JVM classpath at session
    construction, and the suite's shared session is already up."""
    import os
    import subprocess
    import sys
    import textwrap

    import duckdb
    import pytest

    jar = _find_duckdb_jdbc_jar()
    if jar is None:
        pytest.skip("no locally cached DuckDB JDBC driver jar")

    db = str(tmp_path / "jdbc_src.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE src AS SELECT r AS id, 'n' || CAST(r % 97 AS VARCHAR) AS name,"
        " CAST(r AS DOUBLE) / 7 AS val FROM range(10000) t(r)"
    )
    # pre-created write target: Spark's table-exists probe (SELECT 1
    # FROM dst WHERE 1=0) surfaces DuckDB's missing-table error through
    # the generic JDBC dialect's classifyException instead of treating
    # it as 'create me' — appending to an existing table is the
    # portable path
    con.execute("CREATE TABLE dst (id BIGINT, name VARCHAR, val DOUBLE)")
    con.close()

    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as F
        from lime_etl_spark.sources.readers import read_jdbc

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("jdbc-e2e")
            .config("spark.jars", {jar!r})
            .config("spark.sql.shuffle.partitions", "4")
            .getOrCreate()
        )
        url = "jdbc:duckdb:" + {db!r}
        df = read_jdbc(
            spark, url, "src",
            partition_column="id", num_partitions=4,
            lower_bound=0, upper_bound=10000,
            properties={{"driver": "org.duckdb.DuckDBDriver"}},
        )
        assert df.rdd.getNumPartitions() == 4, df.rdd.getNumPartitions()
        assert df.count() == 10000
        total = df.agg(F.sum("id")).collect()[0][0]
        assert total == 10000 * 9999 // 2, total

        # filter pushdown: the JDBC scan itself must carry the predicate
        filtered = df.where(F.col("id") >= 9000)
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "9000" in plan, plan[:1500]
        assert filtered.count() == 1000

        # write-back to a new table through the same driver
        (
            df.where(F.col("id") < 100)
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", "dst")
            .option("driver", "org.duckdb.DuckDBDriver")
            .mode("append")
            .save()
        )
        spark.stop()
        print("JDBC-E2E-OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "JDBC-E2E-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]

    con = duckdb.connect(db)
    n, smin, smax = con.execute("SELECT COUNT(*), MIN(id), MAX(id) FROM dst").fetchone()
    con.close()
    assert (n, smin, smax) == (100, 0, 99)
