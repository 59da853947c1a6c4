"""Per-host politeness: robots rules table + deterministic round budget.

The reference hardcodes sleeps (3 s listing / 1 s detail,
/root/reference/app/service/vbpl.py:181,701,801) and has no robots
handling; the north_rule requires robots.txt + crawl-delay enforcement.

Model: each round represents a fixed wall-clock window W. A host with
crawl-delay d may be fetched at most floor(W/d) times in the window —
that is the host's *round budget*. Budgets are enforced by ranking each
host's eligible frontier rows in priority order and cutting at the
budget (window row_number — one shuffle on host, which is also the
fetch co-location key). Determinism: budgets are pure functions of the
robots table, never of measured time, so engine and oracle agree.

At cluster scale the same host-keyed partitioning bounds per-host
concurrency (hot hosts get a salt column so one host's rows spread over
``per_host_slots`` tasks while the budget still caps the total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay", T.DoubleType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), False),
    ]
)

DEFAULT_CRAWL_DELAY = 1.0


def parse_robots_txt(text: str, agent: str = "*") -> dict:
    """Parse a robots.txt body into the engine's rule dict
    ({"crawl_delay": float, "disallow": (prefixes,)}). Honors the
    longest-matching User-agent group (exact agent wins over '*'),
    Disallow path prefixes, and Crawl-delay; empty Disallow lines (allow
    all) and comments are handled per the de-facto standard."""
    groups: dict[str, dict] = {}
    current: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            ua = val.lower()
            groups.setdefault(ua, {"crawl_delay": None, "disallow": []})
            # consecutive User-agent lines share the following rules
            if current and current[-1] != "__rules_seen__":
                current.append(ua)
            else:
                current = [ua]
        elif key in ("disallow", "crawl-delay"):
            if not current:
                continue
            if current[-1] != "__rules_seen__":
                current = [*current, "__rules_seen__"]
            for ua in current[:-1]:
                if key == "disallow":
                    if val:
                        groups[ua]["disallow"].append(val)
                else:
                    try:
                        groups[ua]["crawl_delay"] = float(val)
                    except ValueError:
                        pass
    chosen = groups.get(agent.lower()) or groups.get("*") or {
        "crawl_delay": None,
        "disallow": [],
    }
    return {
        "crawl_delay": chosen["crawl_delay"]
        if chosen["crawl_delay"] is not None
        else DEFAULT_CRAWL_DELAY,
        "disallow": tuple(chosen["disallow"]),
    }


def robots_df(spark: SparkSession, robots: dict[str, dict]) -> DataFrame:
    rows = [
        (host, float(r.get("crawl_delay", DEFAULT_CRAWL_DELAY)), list(r.get("disallow", ())))
        for host, r in robots.items()
    ]
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def host_budget(crawl_delay: float, round_window_s: float) -> int:
    return max(1, int(round_window_s // max(crawl_delay, 1e-9)))


def budgets_df(robots: DataFrame, round_window_s: float) -> DataFrame:
    """(host, budget) from the robots table — the distributed form of
    host_budget (hosts NOT in the table get budget 1 via the engine's
    coalesce, the conservative-politeness default the oracle shares)."""
    return robots.select(
        "host",
        F.greatest(
            F.floor(F.lit(round_window_s) / F.greatest(F.col("crawl_delay"), F.lit(1e-9))),
            F.lit(1),
        )
        .cast("int")
        .alias("budget"),
    )


def is_disallowed(url_col, disallow_col):
    """True when the URL path falls under any disallow prefix of its
    host's robots rules. ``disallow`` holds path prefixes."""
    path = F.regexp_replace(url_col, r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    return F.exists(
        F.coalesce(disallow_col, F.array()),
        lambda prefix: path.startswith(prefix),
    )
