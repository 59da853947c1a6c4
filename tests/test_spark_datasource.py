"""The synthetic-site Python DataSource (sources/spark_datasource.py):
planning-level pushdown pruning, Arrow-batch reads, batch equality vs
direct ``fetch()`` enumeration, and the streaming re-crawl reader's
offset determinism."""

from __future__ import annotations

import time

import pyarrow as pa
import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan, In, StringStartsWith

from vbpl_web_crawl_spark.sources import spark_datasource as sds
from vbpl_web_crawl_spark.sources.synth_site import (
    DOC_CLASSES,
    SiteConfig,
    fetch,
    listing_url,
)

OPTS = {"pages": "4", "docs_per_page": "20", "mirrors": "2"}
CFG = SiteConfig(n_pages=4, docs_per_page=20, n_mirrors=2)


def direct_rows(cfg: SiteConfig) -> set[tuple]:
    out = set()
    for mirror in range(cfg.n_mirrors):
        for dc in DOC_CLASSES:
            for page in range(1, cfg.n_pages + 1):
                url = listing_url(dc, page)
                if mirror:
                    url = url.replace("https://", f"https://m{mirror}.", 1)
                for u, t, p in fetch(cfg, url).links:
                    out.add((mirror, dc, page, p, u, t))
    return out


def test_pushfilters_partition_pruning_planning_level():
    r = sds.SynthSiteReader(OPTS)
    unsupported = list(
        r.pushFilters(
            [
                EqualTo(("page",), 3),
                In(("mirror",), (0,)),
                GreaterThan(("pos",), 5),  # not a partition col
                StringStartsWith(("url",), "https://m1."),  # not pushable
            ]
        )
    )
    # page + mirror absorbed; pos + url handed back to Spark
    assert {type(f).__name__ for f in unsupported} == {
        "GreaterThan",
        "StringStartsWith",
    }
    parts = r.partitions()
    assert len(parts) == len(DOC_CLASSES)  # 1 mirror x 2 classes x 1 page
    assert all(p.page == 3 and p.mirror == 0 for p in parts)

    full = sds.SynthSiteReader(OPTS)
    assert len(full.partitions()) == 2 * len(DOC_CLASSES) * 4


def test_read_yields_one_arrow_batch_per_page():
    r = sds.SynthSiteReader(OPTS)
    part = r.partitions()[0]
    batches = list(r.read(part))
    assert len(batches) == 1 and isinstance(batches[0], pa.RecordBatch)
    assert batches[0].num_rows == CFG.docs_per_page
    assert batches[0].schema.names == [f.name for f in sds.SCHEMA.fields]


def test_batch_read_equals_direct_enumeration(spark):
    sds.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = spark.read.format("synthsite").options(**OPTS).load()
    got = {tuple(r) for r in df.collect()}
    assert got == direct_rows(CFG)
    # scan parallelism IS the page grid
    assert df.rdd.getNumPartitions() == 2 * len(DOC_CLASSES) * 4


def test_pruned_scan_returns_exact_rows(spark):
    sds.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("synthsite")
        .options(**OPTS)
        .load()
        .where("page = 2 AND mirror = 1")
    )
    assert df.rdd.getNumPartitions() == len(DOC_CLASSES)
    got = {tuple(r) for r in df.collect()}
    want = {t for t in direct_rows(CFG) if t[2] == 2 and t[0] == 1}
    assert got == want


def test_stream_reader_offsets_are_deterministic():
    r = sds.SynthSiteStreamReader(OPTS)
    assert r.initialOffset() == {"next_page": 1}
    rows1, off1 = r.read({"next_page": 1})
    rows1 = list(rows1)
    assert off1 == {"next_page": 2}
    # replay reproduces the exact batch
    assert list(r.readBetweenOffsets({"next_page": 1}, off1)) == rows1
    assert len(rows1) == 2 * len(DOC_CLASSES) * CFG.docs_per_page
    # exhausted universe: no progress, empty batch
    rows5, off5 = r.read({"next_page": 5})
    assert list(rows5) == [] and off5 == {"next_page": 5}


def test_streaming_recrawl_rounds(spark, tmp_path):
    sds.register(spark)
    q = (
        spark.readStream.format("synthsite")
        .options(**OPTS)
        .load()
        .writeStream.format("memory")
        .queryName("synthsite_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    want_total = 2 * len(DOC_CLASSES) * 4 * CFG.docs_per_page
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM synthsite_stream").first().c
            if n >= want_total:
                break
            time.sleep(0.5)
        got = {
            tuple(r)
            for r in spark.sql("SELECT * FROM synthsite_stream").collect()
        }
    finally:
        q.stop()
    assert got == direct_rows(CFG)


@pytest.mark.parametrize("name", ["datasource_listing_links", "datasource_point_page"])
def test_gate_matches_duckdb_oracle(spark, name):
    import duckdb
    import pandas as pd

    from vbpl_web_crawl_spark.plans.queries import get_oracles, get_queries

    got = (
        get_queries()[name](spark, "")
        .toPandas()
        .sort_values(["mirror", "doc_class", "page", "pos"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(get_oracles()[name])
        .df()
        .sort_values(["mirror", "doc_class", "page", "pos"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
