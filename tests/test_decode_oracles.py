"""The decode gates' lazy oracle builders must resolve.

``plans/queries.get_oracles`` downgrades a raising lazy builder to a
rows-only gate instead of failing the sweep — the right behavior for
the driver, but it means a regression inside a builder would silently
weaken four gates from oracle-backed to rows-only. This pins the
builders: each returns non-empty SQL that DuckDB can parse and run.
"""

import duckdb
import pytest

from vbpl_web_crawl_spark.plans import decode_oracles as D

BUILDERS = [
    ("multimodal_decode_stats", D.multimodal_decode_oracle),
    ("audio_feature_stats", D.audio_feature_oracle),
    ("video_frame_sample_stats", D.video_frame_oracle),
    ("codec_matrix_stats", D.codec_matrix_oracle),
    ("crawl_visit_log", D.crawl_visit_oracle),
    ("crawl_toan_van_sections", D.toan_van_oracle),
]


@pytest.mark.parametrize("name,builder", BUILDERS, ids=[n for n, _ in BUILDERS])
def test_builder_returns_runnable_sql(name, builder):
    sql = builder()
    assert sql and "VALUES" in sql
    df = duckdb.connect().execute(sql).df()
    assert len(df) > 0
    # registered: get_oracles() must expose them as resolved strings
    from vbpl_web_crawl_spark.plans.queries import get_oracles

    assert get_oracles()[name].strip() == sql.strip()


def test_sequential_reference_is_memoized():
    # second call must be cache-hit (oracle_sql() is called per sweep;
    # re-decoding 96 images + 24 videos each time would be waste).
    # Asserted structurally — the returned string IS the cached object —
    # rather than by wall-clock, which is flaky on a loaded host.
    first = D.codec_matrix_oracle()
    assert D._CACHE["codec"] is first
    assert D.codec_matrix_oracle() is first
