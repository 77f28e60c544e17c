"""Local differential-test harness mirroring the driver's oracle compare.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, normalizes both to pandas (columns sorted by name, rows sorted by
all columns), and compares values exactly. Stricter than the driver's
order-insensitive value hash — if this passes, the driver's check passes.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from stock_data_pipeline_spark.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    for name in TABLES:
        p = table_path(sf_dir, name)
        # split-layout fixtures (tools/splitgen.py) store a table as a
        # DIRECTORY of part files; Spark reads the path as-is, DuckDB globs
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    return con.execute(sql).df()


def collect_pdf(df) -> pd.DataFrame:
    """Spark-result → pandas for the differential compare.

    Default: plain ``toPandas()`` — one collect, fastest at the design
    scales (sf0.001/0.01). ``FUZZ_STREAM_COLLECT=1`` switches to a
    streamed twin that pulls ONE PARTITION AT A TIME through
    ``toLocalIterator`` and buffers rows as Arrow record chunks, so the
    driver JVM never materializes the whole result at once (r11's sf1
    mini-fuzz OOM: a ~6M-row ``toPandas`` killed the default-1g fuzz
    JVM mid-collect, VERDICT r11 task 7). All chunks are concatenated
    at the ARROW level and converted to pandas ONCE, which preserves
    ``toPandas``'s exact dtype mapping (int-with-nulls → float64,
    timestamp → datetime64[us], decimal → object) — equivalence pinned
    by tests/test_stream_collect.py. Python-side memory still holds the
    full frame, like the DuckDB side of the compare; the JVM heap stops
    being the binding constraint on where fuzzing can run.
    """
    import os

    if os.environ.get("FUZZ_STREAM_COLLECT") != "1":
        return df.toPandas()
    return _streamed_pdf(df)


def _streamed_pdf(df, rows_per_chunk: int = 100_000) -> pd.DataFrame:
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    # toPandas renders TIMESTAMP (LTZ) as tz-NAIVE session-tz wall time;
    # the row-level iterator would instead surface OS-local naive
    # datetimes and the Arrow schema a tz-aware column — both wrong for
    # hash parity. Casting LTZ→NTZ in the PLAN applies the session tz
    # JVM-side (identical wall times to toPandas, no OS-tz dependence).
    # Scalar columns only, which is all the fuzz shapes emit.
    if any(isinstance(f.dataType, T.TimestampType) for f in df.schema.fields):
        df = df.select(
            [
                F.col(f.name).cast("timestamp_ntz").alias(f.name)
                if isinstance(f.dataType, T.TimestampType)
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )
    schema = to_arrow_schema(df.schema)
    names = schema.names
    # dict(zip(names, row)) below would silently collapse duplicate output
    # column names (toPandas keeps both) — fail loudly instead of
    # diverging confusingly at the hash compare (ADVICE r12).
    if len(set(names)) != len(names):
        raise ValueError(
            f"streamed collect requires unique column names, got {names}"
        )
    chunks: list[pa.Table] = []
    buf: list[dict] = []
    for row in df.toLocalIterator(prefetchPartitions=False):
        buf.append(dict(zip(names, row)))
        if len(buf) >= rows_per_chunk:
            chunks.append(pa.Table.from_pylist(buf, schema=schema))
            buf = []
    if buf or not chunks:
        chunks.append(pa.Table.from_pylist(buf, schema=schema))
    return pa.concat_tables(chunks).to_pandas()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out.reindex(sorted(out.columns), axis=1)
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[col] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, (bytes,)):
            out[col] = s.map(lambda b: b.hex() if isinstance(b, bytes) else b)
        elif pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.astype("float64")
    out = out.sort_values(by=list(out.columns), ignore_index=True, na_position="last")
    return out


def assert_matches_oracle(spark, name: str, sf_dir: str) -> None:
    from stock_data_pipeline_spark import registry

    entry = registry.get(name)
    assert entry.oracle is not None, f"{name} has no oracle"
    spark_pdf = normalize(entry.fn(spark, sf_dir).toPandas())
    duck_pdf = normalize(run_oracle(entry.oracle, sf_dir))
    assert list(spark_pdf.columns) == list(duck_pdf.columns), (
        f"{name}: column mismatch {list(spark_pdf.columns)} vs {list(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    for col in spark_pdf.columns:
        a, b = spark_pdf[col], duck_pdf[col]
        # the driver's value-hash stringifies tuples, so int64 vs float64
        # (e.g. a DuckDB HUGEINT sum surfacing as float) hashes "2" vs
        # "2.0" — a dtype MISMATCH here must fail even when values
        # compare equal, or local parity over-promises driver parity
        assert pd.api.types.is_float_dtype(a) == pd.api.types.is_float_dtype(b), (
            f"{name}: column {col!r} dtype class differs "
            f"(spark {a.dtype} vs duck {b.dtype}) — cast the oracle "
            f"(e.g. CAST(SUM(...) AS BIGINT)) so both engines agree"
        )
        if pd.api.types.is_float_dtype(a):
            eq = np.isclose(a.to_numpy(), b.to_numpy(), rtol=0, atol=0, equal_nan=True)
        else:
            eq = (a.fillna("«null»") == b.fillna("«null»")).to_numpy() if a.dtype == object else (
                (a.isna() & b.isna()) | (a == b)
            ).to_numpy()
        if not eq.all():
            bad = (~eq).nonzero()[0][:5]
            detail = "\n".join(
                f"  row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}" for i in bad
            )
            raise AssertionError(
                f"{name}: value mismatch in column {col!r} "
                f"({(~eq).sum()}/{len(eq)} rows):\n{detail}"
            )
    # Final gate: the DRIVER's exact protocol — md5 over sorted stringified
    # tuples. Catches representation drift the per-column compare tolerates
    # ('2' vs '2.0', bytes repr, None vs NaN spelling); b54's HUGEINT float
    # surfaced only here. Zero extra engine executions.
    assert _driver_hash(spark_pdf) == _driver_hash(duck_pdf), (
        f"{name}: driver-protocol value-hash mismatch despite per-column "
        f"equality — a dtype/representation difference the canonicalizer "
        f"can't absorb; align the oracle's output types"
    )


def _driver_hash(pdf: pd.DataFrame) -> str:
    """The verification driver's canonicalization, verbatim."""
    import hashlib

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    return hashlib.md5(
        "\n".join(sorted(map(str, pdf.itertuples(index=False, name=None)))).encode()
    ).hexdigest()
