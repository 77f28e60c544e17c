"""Sink schemas for the four reference-domain tables.

Exact Spark translations of the reference's BigQuery ``schema_fields``
declarations (BigQuery DATETIME→TimestampNTZ, STRING→String, FLOAT→Double;
every field NULLABLE because per-ticker fetch failures are skipped):

- ticker_data:   /root/reference/dags/stock_data_to_gcp.py:128-133 (cols :43)
- fin_ratio_data: /root/reference/dags/financial_ratio_to_gcp.py:128-137 (:43)
- fin_stm_data:  /root/reference/dags/financial_statement_to_gcp.py:128-138 (:43)
- news_data:     /root/reference/dags/news_data_to_gcp.py:155-162 (cols :45;
  the reference's own list has a syntax error at :159-160 — the intended
  6-column schema is used here)
"""

from __future__ import annotations

from pyspark.sql import types as T


def _table(time_col: str, *fields: tuple[str, T.DataType]) -> T.StructType:
    cols = [T.StructField(time_col, T.TimestampNTZType(), True),
            T.StructField("Ticker", T.StringType(), True)]
    cols += [T.StructField(name, dtype, True) for name, dtype in fields]
    return T.StructType(cols)


D = T.DoubleType()

TICKER_DATA = _table("Time", ("Price", D), ("Volume", D))

FIN_RATIO_DATA = _table(
    "Time",
    ("QuickRatio", D),
    ("CurrentRatio", D),
    ("ROA", D),
    ("ROE", D),
    ("DebttoEquity", D),
    ("FCF", D),
)

FIN_STM_DATA = _table(
    "Time",
    ("DividendYield", D),
    ("TotalCash", D),
    ("TotalDebt", D),
    ("TotalRevenue", D),
    ("RevPerShare", D),
    ("GrossProfits", D),
    ("OCF", D),
)

NEWS_DATA = T.StructType(
    [
        T.StructField("CollectedAt", T.TimestampNTZType(), True),
        T.StructField("Date", T.TimestampNTZType(), True),
        T.StructField("Ticker", T.StringType(), True),
        T.StructField("Title", T.StringType(), True),
        T.StructField("Price", D, True),
        T.StructField("Volume", D, True),
    ]
)

SINK_SCHEMAS: dict[str, T.StructType] = {
    "ticker_data": TICKER_DATA,
    "fin_ratio_data": FIN_RATIO_DATA,
    "fin_stm_data": FIN_STM_DATA,
    "news_data": NEWS_DATA,
}
