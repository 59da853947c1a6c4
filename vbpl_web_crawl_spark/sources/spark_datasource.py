"""The synthetic crawl universe as a first-class Spark *Python Data
Source* (pyspark 4 ``spark.dataSource.register`` API) — the reference's
paginated listing scan (SURVEY §2 S1, /root/reference/app/service/
vbpl.py:96-131) re-expressed as a planned, partitioned, filter-pushdown
scan instead of an imperative page loop.

Why this exists next to ``sources/synth_site.py``: the crawl engine
drives ``fetch()`` imperatively because frontier expansion is iterative
by nature, but the *listing universe itself* is a static, enumerable
table — exactly what a DataSource models. Registering it gives every
Spark surface (SQL, readStream, other sessions) the listing-link table
with

- **partition-per-(mirror, doc_class, page) planning**: each listing
  page is one ``InputPartition``, so a 1000-executor cluster scans
  1000 pages concurrently with zero shuffle — the scan parallelism IS
  the page grid, the exact shape the reference's ThreadPoolExecutor
  approximates with 8 threads (vbpl.py:101-112);
- **real filter pushdown** (``pushFilters``, pyspark >= 4.1): equality
  /range/IN predicates on ``page``, ``doc_class``, ``mirror`` prune
  partitions at PLANNING time — ``WHERE page = 7`` fetches one page
  per class per mirror instead of the whole universe. At the 10^10-URL
  scale this is the difference between a point re-crawl and a full
  sweep;
- **Arrow-vectorized reads**: ``read()`` yields one
  ``pyarrow.RecordBatch`` per listing page (130 rows built columnar),
  never per-row Python tuples, per the input-hint's no-per-row-Python
  rule;
- **a streaming re-crawl source** (``SimpleDataSourceStreamReader``):
  the reference's ``while True`` re-crawl loop (main.py:13-20) as a
  native ``readStream`` source whose offset is the next page index —
  deterministic offsets make replay (``readBetweenOffsets``) exact,
  so a restarted stream re-reads identical micro-batches.

Row parity with the engine is by construction: the row generator calls
the same ``synth_site.fetch`` the crawl engine and the pure-Python
oracle use, and the gate ``datasource_listing_links`` pins the output
against a from-scratch DuckDB SQL reconstruction of the link
arithmetic (no shared code at all).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("mirror", IntegerType(), False),
        StructField("doc_class", StringType(), False),
        StructField("page", IntegerType(), False),
        StructField("pos", IntegerType(), False),
        StructField("url", StringType(), False),
        StructField("doc_type", StringType(), False),
    ]
)

# columns a filter may be pushed on; everything else stays in Spark
_PARTITION_COLS = {"mirror", "doc_class", "page"}


def _cfg_from_options(options) -> "SiteConfig":
    from vbpl_web_crawl_spark.sources.synth_site import SiteConfig

    return SiteConfig(
        n_pages=int(options.get("pages", 6)),
        docs_per_page=int(options.get("docs_per_page", 130)),
        n_mirrors=int(options.get("mirrors", 1)),
    )


def _page_rows(cfg, mirror: int, doc_class: str, page: int):
    """Column arrays for one listing page — built through the SAME
    ``fetch()`` the crawl engine uses, so source/engine parity is by
    construction, then rewritten onto the mirror host exactly like
    ``fetch()`` does for mirror URLs (synth_site.py:189-210)."""
    from vbpl_web_crawl_spark.sources.synth_site import fetch, listing_url

    url = listing_url(doc_class, page)
    if mirror:
        url = url.replace("https://", f"https://m{mirror}.", 1)
    pg = fetch(cfg, url)
    urls = [u for u, _, _ in pg.links]
    types = [t for _, t, _ in pg.links]
    poss = [p for _, _, p in pg.links]
    n = len(urls)
    return {
        "mirror": [mirror] * n,
        "doc_class": [doc_class] * n,
        "page": [page] * n,
        "pos": poss,
        "url": urls,
        "doc_type": types,
    }


class _PagePartition(InputPartition):
    def __init__(self, mirror: int, doc_class: str, page: int):
        self.mirror = mirror
        self.doc_class = doc_class
        self.page = page


def _filter_keeps(f: Filter, part: dict) -> bool:
    col = f.attribute[0]
    v = part[col]
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, In):
        return v in f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return v >= f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    raise AssertionError(f"unsupported pushed filter {f!r}")  # pragma: no cover


class SynthSiteReader(DataSourceReader):
    """Batch reader: plans one partition per (mirror, doc_class, page),
    prunes the plan with pushed filters, emits Arrow batches."""

    def __init__(self, options):
        self.cfg = _cfg_from_options(options)
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if (
                isinstance(
                    f,
                    (
                        EqualTo,
                        In,
                        GreaterThan,
                        GreaterThanOrEqual,
                        LessThan,
                        LessThanOrEqual,
                    ),
                )
                and len(f.attribute) == 1
                and f.attribute[0] in _PARTITION_COLS
            ):
                # fully handled at partition-planning time (every row in
                # a partition shares mirror/doc_class/page), so Spark
                # need not re-evaluate it
                self.pushed.append(f)
            else:
                yield f

    def partitions(self):
        from vbpl_web_crawl_spark.sources.synth_site import DOC_CLASSES

        out = []
        for mirror in range(max(self.cfg.n_mirrors, 1)):
            for dc in DOC_CLASSES:
                for page in range(1, self.cfg.n_pages + 1):
                    part = {"mirror": mirror, "doc_class": dc, "page": page}
                    if all(_filter_keeps(f, part) for f in self.pushed):
                        out.append(_PagePartition(mirror, dc, page))
        return out

    def read(self, part: _PagePartition):
        import pyarrow as pa

        cols = _page_rows(self.cfg, part.mirror, part.doc_class, part.page)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols["mirror"], type=pa.int32()),
                pa.array(cols["doc_class"], type=pa.string()),
                pa.array(cols["page"], type=pa.int32()),
                pa.array(cols["pos"], type=pa.int32()),
                pa.array(cols["url"], type=pa.string()),
                pa.array(cols["doc_type"], type=pa.string()),
            ],
            names=[f.name for f in SCHEMA.fields],
        )


class SynthSiteStreamReader(SimpleDataSourceStreamReader):
    """Re-crawl rounds as a stream: micro-batch k carries listing page
    k+1 for every (mirror, doc_class). The offset is just the next page
    index, so restart/replay is exact — ``readBetweenOffsets`` rebuilds
    any past batch bit-identically (the driver checkpoints offsets, not
    data). After the universe is exhausted the source idles (empty
    batches), modeling the reference's continuous re-crawl pause
    (main.py:20) without wall-clock state."""

    def __init__(self, options):
        self.cfg = _cfg_from_options(options)
        self.pages_per_batch = int(options.get("pages_per_batch", 1))

    def initialOffset(self) -> dict:
        return {"next_page": 1}

    def _rows(self, first: int, last: int) -> list[tuple]:
        # materialized list, not a generator: the driver-side prefetch
        # cache copies the returned iterator between read() and the
        # micro-batch's plan, and generators are not copyable
        from vbpl_web_crawl_spark.sources.synth_site import DOC_CLASSES

        out: list[tuple] = []
        for page in range(first, last):
            for mirror in range(max(self.cfg.n_mirrors, 1)):
                for dc in DOC_CLASSES:
                    cols = _page_rows(self.cfg, mirror, dc, page)
                    out.extend(
                        zip(
                            cols["mirror"],
                            cols["doc_class"],
                            cols["page"],
                            cols["pos"],
                            cols["url"],
                            cols["doc_type"],
                        )
                    )
        return out

    def read(self, start: dict):
        first = start["next_page"]
        last = min(first + self.pages_per_batch, self.cfg.n_pages + 1)
        return self._rows(first, last), {"next_page": max(last, first)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["next_page"], end["next_page"])


class SynthSiteDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthsite"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> SynthSiteReader:
        return SynthSiteReader(self.options)

    def simpleStreamReader(self, schema) -> SynthSiteStreamReader:
        return SynthSiteStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SynthSiteDataSource)
