"""Direct parity pin for the md5-prefix integer lane.

Many oracle-backed gates derive deterministic integers as
``conv(substr(md5(x), 1, 8), 16, 10)`` in Spark and
``CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)`` in DuckDB
(stratified sampling, image-aspect packing, mirror-host sketches,
streaming_first_seen_dedup's key universe). Every one of those gates
certifies the pattern end-to-end; this test pins it in isolation over
adversarial inputs — unicode, empty string, digit strings with
leading zeros — so a drift in either engine's md5/hex handling is
attributable without decoding a whole gate.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

CASES = [
    "0",
    "00042",
    "hello",
    "xin chào việt nam",  # unicode, multi-byte
    "",
    "a" * 300,
    "1234567890",
    "Ключ",  # cyrillic
]


@pytest.mark.parametrize("salt", ["", "s"])
def test_md5_lane_matches_duckdb(spark, salt):  # noqa: F811
    df = spark.createDataFrame([(c,) for c in CASES], "x string")
    got = {
        r.x: (r.lane, r.lane % 64, r.lane % 100)
        for r in df.select(
            "x",
            F.conv(
                F.substring(F.md5(F.concat(F.col("x"), F.lit(salt))), 1, 8), 16, 10
            )
            .cast("long")
            .alias("lane"),
        ).collect()
    }
    con = duckdb.connect()
    for c in CASES:
        want = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 8)) AS BIGINT)", [c + salt]
        ).fetchone()[0]
        assert got[c] == (want, want % 64, want % 100), c
    # the lane is a full unsigned 32-bit value: non-negative, < 2^32
    for lane, _, _ in got.values():
        assert 0 <= lane < (1 << 32)
