"""Landed-HTML news pages: the batch-query side of the A13 news scrape.

The reference drives a headless browser per ticker and XPath-plucks five
headline blocks from the live CNBC quote page
(/root/reference/dags/news_data_to_gcp.py:54-59). The lake-native
re-expression: the scrape LANDS raw HTML files in an object-store
directory (one page per ticker per run — landing raw bytes is what makes
re-parsing and backfills possible), and extraction is a declarative batch
query over that directory:

- ``spark.read.option("wholetext", True).text(dir)`` — one row per page;
- isolate the news-list fragment with a codegen ``regexp_extract`` (the
  page as a whole is NOT well-formed XML — quote strips embed raw ``<``;
  the list block is);
- parse the fragment with ``from_xml``
  (operators/semistructured.py::parse_news_dom) into typed
  (href, title, published) structs and fan out with ``posexplode``.

Pages that yield no parsable items (scrape raced the page build,
truncated write, error banner) are quarantined by the same
observable-quarantine contract as row-level ingest
(sources/quarantine.py) — never silently dropped.

Scale: one file-source scan, all extraction row-local JVM expressions —
no Python, no shuffle; a 100 TB landing zone parses at scan speed and
partition count follows the file listing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Repo-relative sample landing directory (tests + registered query).
REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
FIXTURE_NEWS_DIR = os.path.join(REPO_ROOT, "fixtures", "landed_news")

# The CNBC-shaped page anatomy the extraction targets.
_TICKER_RE = r'<meta name="ticker" content="([A-Z.]+)"'
_NEWS_LIST_RE = r'(?s)(<ul class="LatestNews-list">.*?</ul>)'
_DATE_FMT = "MMMM dd, yyyy"  # reference: datetime.strptime(temp[1], "%B %d, %Y")


def read_landed_news_pages(
    spark: SparkSession, pages_dir: str = FIXTURE_NEWS_DIR
) -> DataFrame:
    """One row per landed HTML page: (page_path, ticker, news_list_html).

    ``wholetext`` keeps each page a single value; ticker comes from the
    page's own meta tag (self-describing — no dependence on file naming).
    """
    raw = spark.read.text(os.path.join(pages_dir, "*.html"), wholetext=True)
    return raw.select(
        F.input_file_name().alias("page_path"),
        F.regexp_extract("value", _TICKER_RE, 1).alias("ticker"),
        F.regexp_extract("value", _NEWS_LIST_RE, 1).alias("news_list_html"),
    )


def landed_news_items(pages: DataFrame) -> DataFrame:
    """Typed news rows from landed pages: (ticker, item_idx, href, title,
    news_date) — one row per headline, in page order.

    ``parse_news_dom`` (from_xml) does the DOM work; the date string
    parses with the reference's exact format. Pages whose list fragment
    is missing or malformed produce zero rows here (from_xml yields null
    → posexplode emits nothing) and surface in
    :func:`landed_news_quarantine` instead.
    """
    from ..operators.semistructured import parse_news_dom

    items = pages.select(
        "ticker",
        F.posexplode(parse_news_dom("news_list_html")).alias("item_idx", "item"),
    )
    return items.select(
        "ticker",
        F.col("item_idx").cast("int").alias("item_idx"),
        F.col("item.href").alias("href"),
        F.col("item.title").alias("title"),
        F.to_timestamp(F.col("item.published"), _DATE_FMT).alias("news_date"),
    )


def landed_news_quarantine(pages: DataFrame) -> DataFrame:
    """Pages that produced no parsable news items, with the reason —
    the observable-quarantine contract (count them, inspect them, never
    silently drop them)."""
    from ..operators.semistructured import parse_news_dom

    n_items = F.size(parse_news_dom("news_list_html"))
    return (
        pages.withColumn(
            "n_items", F.when(n_items > 0, n_items).otherwise(F.lit(0))
        )
        .filter(F.col("n_items") == 0)
        .select(
            "page_path",
            "ticker",
            F.when(F.col("news_list_html") == "", "news list block not found")
            .otherwise("news list block unparsable")
            .alias("reason"),
        )
    )
