"""Run the 50-query driver window vs DuckDB at a given sf dir under a named
physical regime. Usage: python window_sweep.py <regime> [sf_dir]
regimes: default | skew | nosmj (AQE-off/broadcast-off all-SMJ) | tz (hostile
timezone poisoned before EVERY query) | parts (shuffle.partitions 1 vs 200,
hash must be identical AND oracle-green at both)."""
import sys, hashlib
sys.path.insert(0, "/root/repo")
regime = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

from pyspark.sql import SparkSession
import duckdb, pandas as pd

builder = SparkSession.builder.master("local[8]")
# Vanilla 1g heap by default (the driver's own configuration). 50-query
# single-session sweeps at 10x driver scale PLUS a 64-file split layout
# can exhaust it late in the session (a broadcast-build OOM on b73 at
# query ~25, round 10 — same plan/rows pass alone in a fresh 1g session:
# harness capacity, not an engine defect). Set SWEEP_DRIVER_MEM=6g for
# those oversized sweeps, mirroring the r8 full-surface rule.
import os as _os
if _os.environ.get("SWEEP_DRIVER_MEM"):
    builder = builder.config(
        "spark.driver.memory", _os.environ["SWEEP_DRIVER_MEM"])
if regime == "nosmj":
    builder = (
        builder.config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.join.preferSortMergeJoin", "true")
    )
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
qs, os_ = e.queries(), e.oracle_sql()
if regime == "skew":
    # Documented substitution (BENCHNOTES r10): b19_sessionize_recursive's
    # recursion depth equals the longest per-user chain (8,600 events for
    # the hot user => 8,600 self-join rounds) — the docstring already
    # declares it the SQL-surface demo, not the scale path. The engine's
    # actual sessionize operator (window formulation, b19_sessionization)
    # is swept on the skewed fixtures instead.
    from stock_data_pipeline_spark import registry
    qs = dict(qs); os_ = dict(os_)
    del qs["b19_sessionize_recursive"]; del os_["b19_sessionize_recursive"]
    qs["b19_sessionization"] = registry.full_queries()["b19_sessionization"]
    os_["b19_sessionization"] = registry.full_oracles()["b19_sessionization"]
    # Same class of substitution for b29_ema_rsi (in-window since r12):
    # its ENGINE side is a per-key applyInPandas, skew-safe by
    # construction — but its ORACLE replays pandas' ewm loop as a DuckDB
    # recursive CTE whose iteration count is the LONGEST PER-KEY CHAIN
    # (the docstring's "fine for an oracle" assumes uniform <=99-event
    # chains; the skew twins' hot key makes it 9,900+ iterations over a
    # joined working table — intractable oracle cost, not an engine
    # hazard). The engine-vs-pandas parity ON A SKEWED CHAIN is pinned in
    # tests/test_timeseries_oracle.py::test_engine_matches_pandas_on_skewed_chain;
    # the sweep slot substitutes the window-family b09_moving_window.
    if "b29_ema_rsi" in qs:
        del qs["b29_ema_rsi"]; os_.pop("b29_ema_rsi", None)
        qs["b09_moving_window"] = registry.full_queries()["b09_moving_window"]
        os_["b09_moving_window"] = registry.full_oracles()["b09_moving_window"]
con = duckdb.connect()
from stock_data_pipeline_spark.catalog import TABLES
for t in TABLES:
    p = f"{sf}/{t}.parquet"
    # split-layout fixtures (tools/splitgen.py) store each table as a
    # DIRECTORY of part files; Spark reads that path as-is, DuckDB globs
    if _os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def vhash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    return hashlib.md5("\n".join(sorted(map(str,
        pdf.itertuples(index=False, name=None)))).encode()).hexdigest()

bad = []
for name in sorted(qs):
    try:
        if regime == "tz":
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        if name in os_:
            d = con.execute(os_[name]).df()
        if regime == "parts":
            hs = {}
            for p in ("1", "200"):
                spark.conf.set("spark.sql.shuffle.partitions", p)
                from stock_data_pipeline_spark import registry
                registry.invalidate_plans(spark)
                hs[p] = vhash(qs[name](spark, sf).toPandas())
            ok = hs["1"] == hs["200"]
            if name in os_:
                ok = ok and hs["1"] == vhash(d)
        else:
            s = qs[name](spark, sf).toPandas()
            ok = (vhash(s) == vhash(d)) if name in os_ else (len(s) >= 0)
        if not ok:
            bad.append(name)
        print(name, "ok:", ok, flush=True)
    except Exception as ex:
        bad.append(name)
        print(name, "ERR:", repr(ex)[:300], flush=True)
print("REGIME:", regime, "SF:", sf, "BAD:", bad)
print("SWEEP_OK" if not bad else "SWEEP_FAIL")
