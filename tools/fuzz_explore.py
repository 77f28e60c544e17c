"""Exploration sweep for the non-SQL-text fuzz shapes (15: as-of join,
16: pivot + unpivot): fresh-seed random plans beyond the derandomized
suite corpus. Usage: python tools/fuzz_explore.py <sf_dir> <n_per_shape> <seed>
(The 14 single-SQL-text shapes have their own exploration protocol in
BENCHNOTES rounds 8-9.)
"""
import sys
sys.path.insert(0, "/root/repo")
SF = sys.argv[1]
N = int(sys.argv[2])
SEED = int(sys.argv[3])

from hypothesis import HealthCheck, given, seed, settings
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import tests.test_differential_fuzz as fz

fz._ensure_views(spark, SF)

S = dict(
    max_examples=N,
    deadline=None,
    database=None,
    derandomize=False,
    suppress_health_check=list(HealthCheck),
)
counts = {}


def run(name, fn):
    counts[name] = 0
    fn()
    print(f"{name}: {counts[name]} plans OK", flush=True)


@seed(SEED)
@settings(**S)
@given(params=fz._asof_params())
def sweep_asof(params):
    counts["asof"] += 1
    fz._assert_frame_matches_oracle(
        fz._asof_spark_frame(spark, params), fz._asof_oracle_sql(params), SF
    )


@seed(SEED + 1)
@settings(**S)
@given(params=fz._pivot_params())
def sweep_pivot(params):
    counts["pivot"] += 1
    fz._assert_frame_matches_oracle(
        fz._pivot_spark_frame(spark, params), fz._pivot_oracle_sql(params), SF
    )


@seed(SEED + 2)
@settings(**S)
@given(params=fz._unpivot_params())
def sweep_unpivot(params):
    counts["unpivot"] += 1
    fz._assert_frame_matches_oracle(
        fz._unpivot_spark_frame(spark, params), fz._unpivot_oracle_sql(params), SF
    )


run("asof", sweep_asof)
run("pivot", sweep_pivot)
run("unpivot", sweep_unpivot)
print("EXPLORE_OK", SF, N, SEED)
