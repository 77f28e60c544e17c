"""A13 landed-HTML news extraction: fixture pages shaped like the CNBC
quote page the reference scrapes (news_data_to_gcp.py:54-59), including
one truncated page that must quarantine rather than crash or silently
vanish. Oracle parity for a13_news_dom runs in test_oracle_parity.py."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from stock_data_pipeline_spark.sources.landed import (
    FIXTURE_NEWS_DIR,
    landed_news_items,
    landed_news_quarantine,
    read_landed_news_pages,
)


def test_pages_scan_is_one_row_per_file(spark):
    pages = read_landed_news_pages(spark)
    rows = {r.ticker: r for r in pages.collect()}
    assert set(rows) == {"AAPL", "MSFT", "GOOGL", "TSLA"}
    # the full page is NOT well-formed XML (raw '<' in the quote strip);
    # the isolated list fragment is — that isolation is what's under test
    assert rows["AAPL"].news_list_html.startswith('<ul class="LatestNews-list">')
    assert rows["TSLA"].news_list_html == ""  # truncated page: no match


def test_items_parse_counts_titles_and_dates(spark):
    items = landed_news_items(read_landed_news_pages(spark))
    rows = items.collect()
    per_ticker = {}
    for r in rows:
        per_ticker.setdefault(r.ticker, []).append(r)
    assert {t: len(v) for t, v in per_ticker.items()} == {
        "AAPL": 5,
        "MSFT": 4,
        "GOOGL": 3,
    }
    first_aapl = min(per_ticker["AAPL"], key=lambda r: r.item_idx)
    assert first_aapl.title == (
        "Apple reportedly readies in-house AI server chip for 2027"
    )
    assert first_aapl.href.startswith("https://www.cnbc.com/2026/08/12/")
    # "%B %d, %Y" parse, exactly the reference's format
    assert first_aapl.news_date == datetime.datetime(2026, 8, 12)
    assert all(r.news_date is not None for r in rows)


def test_truncated_page_quarantines_not_crashes(spark):
    pages = read_landed_news_pages(spark)
    q = landed_news_quarantine(pages).collect()
    assert len(q) == 1
    assert q[0].ticker == "TSLA"
    assert q[0].reason == "news list block not found"
    assert q[0].page_path.endswith("broken.html")
    # quarantined page contributes zero item rows
    items = landed_news_items(pages)
    assert items.filter(F.col("ticker") == "TSLA").count() == 0


def test_extraction_plan_is_python_free(spark):
    """The whole A13 batch path must stay in codegen — a Python UDF here
    would put a scrape-scale scan on the slow path."""
    items = landed_news_items(read_landed_news_pages(spark))
    plan = items._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unparsable_list_block_quarantines(spark, tmp_path):
    """A list block that regex-matches but is NOT well-formed XML (the
    from_xml failure mode) must land in quarantine with the other
    reason string."""
    bad = (
        '<html><head><meta name="ticker" content="NVDA"/></head><body>'
        '<ul class="LatestNews-list"><li class="LatestNews-item">'
        "<a href=unquoted>Broken attr</a></li></ul></body></html>"
    )
    p = tmp_path / "nvda.html"
    p.write_text(bad)
    pages = read_landed_news_pages(spark, str(tmp_path))
    q = landed_news_quarantine(pages).collect()
    assert len(q) == 1
    assert q[0].ticker == "NVDA"
    assert q[0].reason == "news list block unparsable"
