"""JDBC contract tests against embedded Derby (on Spark's classpath).

S2/K3 were previously "untested by necessity — no DB in the sandbox";
Derby's embedded engine IS a database in the sandbox, so the real
codepaths run here: partitioned write fan-in (``write_jdbc`` with
``numPartitions``), partitioned read with range splitting, and the
min/max bounds-discovery side query (the reference's swapped-bounds bug,
``sparktools/core.py:431-438``, is what these assertions pin down).
"""

from __future__ import annotations

import pytest

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("Derby embedded driver not on the Spark classpath")
    # keep derby.log out of the repo root
    spark._jvm.java.lang.System.setProperty(
        "derby.system.home", str(tmp_path)
    )
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_write_read_roundtrip_partitioned(spark, derby_url):
    from spark_pipeline_spark.io.sinks import write_jdbc
    from spark_pipeline_spark.io.sources import read_jdbc

    from pyspark.sql import functions as F

    props = {"driver": DERBY_DRIVER}
    df = spark.range(0, 100).select(
        F.col("id").cast("long").alias("K"),
        (F.col("id") % 7).cast("long").alias("GRP"),
    )
    write_jdbc(
        df, derby_url, "t_roundtrip", mode="overwrite",
        properties=props, num_partitions=2,
    )

    # bounds NOT given -> the min/max side query discovers them; a
    # swapped-bounds bug would put every row in one stride and misassign
    # the rest of the range splits.
    out = read_jdbc(
        spark,
        "SELECT K, GRP FROM t_roundtrip",
        derby_url,
        properties=props,
        partition_column="K",
        num_partitions=4,
    )
    assert out.rdd.getNumPartitions() == 4
    rows = sorted((r["K"], r["GRP"]) for r in out.collect())
    assert rows == [(i, i % 7) for i in range(100)]
    # every partition stride non-degenerate: no single partition holds
    # all rows (the symptom of swapped/degenerate bounds)
    sizes = out.rdd.glom().map(len).collect()
    assert max(sizes) < 100 and sum(sizes) == 100


def test_jdbc_read_explicit_bounds_and_single_partition(spark, derby_url):
    from pyspark.sql import functions as F

    from spark_pipeline_spark.io.sinks import write_jdbc
    from spark_pipeline_spark.io.sources import read_jdbc

    props = {"driver": DERBY_DRIVER}
    df = spark.range(0, 20).select(F.col("id").alias("K"))
    write_jdbc(df, derby_url, "t_bounds", mode="overwrite", properties=props)

    # explicit bounds are honored verbatim (no discovery query)
    out = read_jdbc(
        spark,
        "SELECT K FROM t_bounds",
        derby_url,
        properties=props,
        partition_column="K",
        num_partitions=2,
        lower_bound=0,
        upper_bound=19,
    )
    assert sorted(r["K"] for r in out.collect()) == list(range(20))

    # num_partitions=1 takes the unpartitioned path
    single = read_jdbc(
        spark, "SELECT K FROM t_bounds", derby_url,
        properties=props, num_partitions=1,
    )
    assert single.count() == 20


def test_jdbc_append_mode(spark, derby_url):
    from pyspark.sql import functions as F

    from spark_pipeline_spark.io.sinks import write_jdbc
    from spark_pipeline_spark.io.sources import read_jdbc

    props = {"driver": DERBY_DRIVER}
    df = spark.range(0, 5).select(F.col("id").alias("K"))
    write_jdbc(df, derby_url, "t_append", mode="overwrite", properties=props)
    write_jdbc(df, derby_url, "t_append", mode="append", properties=props)
    out = read_jdbc(
        spark, "SELECT K FROM t_append", derby_url,
        properties=props, num_partitions=1,
    )
    assert out.count() == 10


def test_jdbc_explicit_bounds_equal_auto_discovered(spark, derby_url):
    """Pins the §2.13.1 swapped-bounds fix forever: a read with explicit
    (correct) bounds and a read that auto-discovers them via the min/max
    side query must produce identical rows AND equivalent range splits.
    Under the reference's swap (min->upperBound), the discovered path
    degenerates to one stride holding every row."""
    from pyspark.sql import functions as F

    from spark_pipeline_spark.io.sinks import write_jdbc
    from spark_pipeline_spark.io.sources import read_jdbc

    props = {"driver": DERBY_DRIVER}
    df = spark.range(0, 80).select((F.col("id") + 10).alias("K"))
    write_jdbc(
        df, derby_url, "t_bounds_parity", mode="overwrite",
        properties=props, num_partitions=2,
    )

    kwargs = dict(
        properties=props, partition_column="K", num_partitions=4
    )
    q = "SELECT K FROM t_bounds_parity"
    auto = read_jdbc(spark, q, derby_url, **kwargs)
    explicit = read_jdbc(
        spark, q, derby_url, lower_bound=10, upper_bound=89, **kwargs
    )

    a = sorted(r["K"] for r in auto.collect())
    b = sorted(r["K"] for r in explicit.collect())
    assert a == b == list(range(10, 90))

    auto_sizes = sorted(auto.rdd.glom().map(len).collect())
    explicit_sizes = sorted(explicit.rdd.glom().map(len).collect())
    assert auto_sizes == explicit_sizes  # identical stride assignment
    assert max(auto_sizes) < 80  # no degenerate single-stride split
