"""Z-order layout tests: the clustered write must (a) preserve the data
and (b) make parquet footer stats selective on BOTH cluster columns —
the property row-group pruning depends on (sources/layout.py)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import load
from stock_data_pipeline_spark.sources.layout import write_zordered, z_value


def _eligible_row_groups(path_glob, lo_a, hi_a, lo_b, hi_b, col_a, col_b):
    """(eligible, total) row groups whose [min,max] stats intersect the
    rectangle — exactly the footer-stats test a parquet reader applies."""
    eligible = total = 0
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            sa = md.row_group(rg).column(names[col_a]).statistics
            sb = md.row_group(rg).column(names[col_b]).statistics
            if sa.min <= hi_a and sa.max >= lo_a and sb.min <= hi_b and sb.max >= lo_b:
                eligible += 1
    return eligible, total


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    )
    got = df.select(z_value(F.col("a"), F.col("b")).alias("z")).collect()

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = df.collect()
    for r, g in zip(rows, got):
        assert g.z == morton(r.a, r.b), (r.a, r.b)


def test_zorder_layout_prunes_both_dimensions(spark, sf_check_dir, tmp_path):
    """Same rows, same predicate: the Z-ordered layout must leave far
    fewer stats-eligible row groups than arrival order, on a rectangle
    over BOTH columns."""
    orders = load(spark, sf_check_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))).alias(
            "o_day"
        ),
    )
    arrival = str(tmp_path / "arrival")
    zordered = str(tmp_path / "zordered")
    orders.repartition(16).write.parquet(arrival)  # arrival-order baseline
    write_zordered(orders, zordered, col_a="o_custkey", col_b="o_day", n_files=16)

    # Round trip: clustering must not change the data.
    a = spark.read.parquet(zordered)
    assert a.count() == orders.count()
    assert (
        a.agg(F.sum("o_orderkey")).first()[0]
        == orders.agg(F.sum("o_orderkey")).first()[0]
    )

    stats = orders.agg(
        F.min("o_custkey").alias("ck_lo"),
        F.max("o_custkey").alias("ck_hi"),
        F.min("o_day").alias("dy_lo"),
        F.max("o_day").alias("dy_hi"),
    ).first()
    # a ~1/8 × 1/8 rectangle at the low corner of each domain
    lo_a, hi_a = stats.ck_lo, stats.ck_lo + (stats.ck_hi - stats.ck_lo) // 8
    lo_b, hi_b = stats.dy_lo, stats.dy_lo + (stats.dy_hi - stats.dy_lo) // 8
    e_arr, t_arr = _eligible_row_groups(
        f"{arrival}/*.parquet", lo_a, hi_a, lo_b, hi_b, "o_custkey", "o_day"
    )
    e_z, t_z = _eligible_row_groups(
        f"{zordered}/*.parquet", lo_a, hi_a, lo_b, hi_b, "o_custkey", "o_day"
    )
    assert t_arr >= 8 and t_z >= 8
    # Arrival order: random keys make every row group span the domain.
    assert e_arr == t_arr
    # Z-order: the rectangle intersects only a corner of the curve.
    assert e_z <= t_z // 2, (e_z, t_z)
