"""Lakehouse table seam: ONE contract (read / replace / merge-upsert /
snapshot history), TWO backends dispatched by what the session offers —
real Iceberg SQL when an Iceberg catalog is configured, snapshot-
versioned parquet otherwise.

The reference's check-then-insert-or-update blocks (S9/T6,
/root/reference/app/service/vbpl.py:186-252) map to Iceberg

    MERGE INTO <table> t
    USING <updates> u
      ON  t.k1 = u.k1 [AND ...]
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *

which is exactly what the Iceberg backend issues. This sandbox has no
Iceberg runtime (SURVEY.md §7 allows the fallback), so the default
backend provides the same contract over parquet with Iceberg-style
snapshot commits: every write lands in a fresh ``v-<n>`` directory and
is committed by writing a NEW monotonically-numbered pointer file
``current-<n>`` (tmp-write + rename to a fresh name; readers take the
highest committed pointer) — the exact manifest protocol the crawl
checkpoints use (crawl/fsio.py). Committed pointers are never deleted
or renamed-over, so readers never observe a half-written table, a
writer crashing at ANY step leaves every committed snapshot readable,
and the next commit always numbers PAST the last committed one (a
crash can orphan only its own uncommitted ``v-<n>`` dir, which the
retry overwrites — never a committed snapshot). The earlier
delete-then-rename single-pointer flip had a crash window where no
pointer existed and versioning restarted at 1 over the oldest
snapshot (round-4 advice). Both backends run the identical contract test suite
(tests/test_lakehouse.py); the Iceberg half auto-skips where no
catalog is configured.

Cluster deployment (README §deploy): add the Iceberg runtime and a
catalog to spark-submit and pass a catalog-qualified table name —

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.8.1 \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=hdfs:///warehouse \
      ... ; LakehouseTable.for_name(spark, "lake.db.documents")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

import re

from vbpl_web_crawl_spark.crawl import fsio
from vbpl_web_crawl_spark.operators.upsert import latest_wins, merge_upsert

_POINTER_RE = re.compile(r"current-(\d+)")


def iceberg_catalog_ready(spark: SparkSession, catalog: str) -> bool:
    """True when ``catalog`` is a configured Spark catalog backed by a
    loadable Iceberg SparkCatalog class."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl or "iceberg" not in impl.lower():
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)
        return True
    except Exception:
        return False


class LakehouseTable:
    """Format-dispatched upsert-able table.

    ``for_name(spark, "cat.db.tbl")`` -> Iceberg backend (requires the
    catalog to be Iceberg-ready, else ValueError so a mis-deploy fails
    loudly instead of silently writing local parquet);
    ``for_path(spark, "/warehouse/tbl")`` -> snapshot-versioned parquet.
    """

    def __init__(self, spark: SparkSession, *, name: str | None, path: str | None):
        assert (name is None) != (path is None)
        self.spark = spark
        self.name = name
        self.path = path

    @classmethod
    def for_name(cls, spark: SparkSession, name: str) -> "LakehouseTable":
        catalog = name.split(".", 1)[0]
        if not iceberg_catalog_ready(spark, catalog):
            raise ValueError(
                f"catalog {catalog!r} is not an Iceberg catalog on this "
                "session — configure spark.sql.catalog.* (see module "
                "docstring) or use LakehouseTable.for_path"
            )
        return cls(spark, name=name, path=None)

    @classmethod
    def for_path(cls, spark: SparkSession, path: str) -> "LakehouseTable":
        return cls(spark, name=None, path=path)

    # ---------------- contract ----------------

    def exists(self) -> bool:
        if self.name is not None:
            return bool(self.spark.catalog.tableExists(self.name))
        return self._committed_version() is not None

    def read(self, version: str | int | None = None) -> DataFrame:
        """Read the latest snapshot, or — time travel — a specific one.

        ``version`` accepts an entry of :meth:`snapshots` (Iceberg: a
        snapshot id for ``VERSION AS OF``; parquet: a ``v-<n>`` name or
        bare integer n). Reading a version that was expired by
        :meth:`expire_snapshots` raises ``FileNotFoundError`` — same
        contract as Iceberg after ``expire_snapshots`` drops a
        snapshot's manifests. Reference analog: the reference keeps a
        single mutable row per document (app/service/vbpl.py upsert);
        snapshot history + time travel is what replaces its lost
        pre-update states at lakehouse scale."""
        if self.name is not None:
            if version is None:
                return self.spark.table(self.name)
            return self.spark.sql(
                f"SELECT * FROM {self.name} VERSION AS OF {int(version)}"
            )
        if version is None:
            return self.spark.read.parquet(self._current_dir())
        n = int(version[2:]) if isinstance(version, str) else int(version)
        cur = self._committed_version()
        if cur is None or not 1 <= n <= cur:
            raise FileNotFoundError(
                f"no committed snapshot v-{n:08d} under {self.path}"
            )
        vdir = f"{self.path}/v-{n:08d}"
        if not fsio.exists(self.spark, vdir):
            raise FileNotFoundError(
                f"snapshot v-{n:08d} was expired (expire_snapshots) — "
                f"earliest retained: {self.snapshots()[:1]}"
            )
        return self.spark.read.parquet(vdir)

    def replace(self, df: DataFrame) -> None:
        """Create or fully replace the table contents (one snapshot)."""
        if self.name is not None:
            df.writeTo(self.name).createOrReplace()
            return
        self._commit_snapshot(df)

    def merge(
        self, updates: DataFrame, keys: list[str], recency_col: str | None = None
    ) -> None:
        """MERGE semantics: same-key rows replaced, new keys inserted;
        duplicate keys inside ``updates`` collapse latest-wins when
        ``recency_col`` is given. One snapshot per call."""
        if not self.exists():
            deduped = (
                latest_wins(updates, keys, recency_col)
                if recency_col is not None
                else updates.dropDuplicates(keys)
            )
            self.replace(deduped)
            return
        if self.name is not None:
            if recency_col is not None:
                updates = latest_wins(updates, keys, recency_col)
            else:
                updates = updates.dropDuplicates(keys)
            view = "_lakehouse_merge_updates"
            updates.createOrReplaceTempView(view)
            cond = " AND ".join(f"t.{k} = u.{k}" for k in keys)
            self.spark.sql(
                f"MERGE INTO {self.name} t USING {view} u ON {cond} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            return
        merged = merge_upsert(self.read(), updates, keys, recency_col)
        self._commit_snapshot(merged)

    def snapshots(self) -> list[str]:
        """Snapshot ids, oldest first (Iceberg: snapshot history table;
        parquet: committed v-<n> directories)."""
        if self.name is not None:
            rows = self.spark.sql(
                f"SELECT snapshot_id FROM {self.name}.snapshots "
                "ORDER BY committed_at"
            ).collect()
            return [str(r.snapshot_id) for r in rows]
        vs = sorted(
            d for d in fsio.listdir(self.spark, self.path) if d.startswith("v-")
        )
        cur = self._current_version()
        return [v for v in vs if v <= cur]

    # ---------------- maintenance (Iceberg procedure analogs) -------

    def expire_snapshots(self, keep_last: int) -> list[str]:
        """Drop the data of all but the newest ``keep_last`` committed
        snapshots; returns the expired snapshot names, oldest first.

        Iceberg backend: ``CALL <cat>.system.expire_snapshots(retain_last
        => K)``. Parquet backend: deletes expired ``v-<n>`` data
        directories but NEVER pointer files — committed pointers stay
        immutable (bytes-sized), so the version counter keeps advancing
        monotonically and a reader of an expired version fails loudly
        instead of seeing a half-deleted table. At 10^10-URL scale the
        crawl upserts one snapshot per round; without expiration the
        warehouse holds every round's full copy — this is the operation
        that bounds storage to K rounds."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        if self.name is not None:
            catalog, tbl = self.name.split(".", 1)
            before = self.snapshots()
            self.spark.sql(
                f"CALL {catalog}.system.expire_snapshots("
                f"table => '{tbl}', retain_last => {int(keep_last)}, "
                # newer than *now*: let retain_last alone decide
                f"older_than => TIMESTAMP '9999-01-01 00:00:00')"
            )
            after = set(self.snapshots())
            return [s for s in before if s not in after]
        live = self.snapshots()
        expired = live[:-keep_last] if len(live) > keep_last else []
        for vname in expired:
            fsio.delete(self.spark, f"{self.path}/{vname}", recursive=True)
        return expired

    def remove_orphans(self) -> list[str]:
        """Delete debris no committed snapshot references: ``v-<n>``
        directories beyond the last committed pointer (a crashed
        writer's data) and stale ``current-*.tmp`` pointer writes.
        Requires no writer in flight (single-writer protocol, same as
        Iceberg's remove_orphan_files age-threshold caveat). Iceberg
        backend: the real procedure. Returns removed names."""
        if self.name is not None:
            catalog, tbl = self.name.split(".", 1)
            rows = self.spark.sql(
                f"CALL {catalog}.system.remove_orphan_files(table => '{tbl}')"
            ).collect()
            return [r[0] for r in rows]
        cur = self._committed_version() or 0
        removed = []
        for name in sorted(fsio.listdir(self.spark, self.path)):
            is_orphan_dir = (
                name.startswith("v-")
                and name[2:].isdigit()
                and int(name[2:]) > cur
            )
            if is_orphan_dir or name.endswith(".tmp"):
                fsio.delete(self.spark, f"{self.path}/{name}", recursive=True)
                removed.append(name)
        return removed

    # ---------------- parquet snapshot commit ----------------
    #
    # fsio-manifest protocol: commit n = the existence of the file
    # ``current-<n>`` (written tmp + rename-to-fresh-name, atomic on
    # HDFS/local; on object stores the PUT of a new key is the commit).
    # Committed pointer files are immutable and never deleted, so there
    # is no instant at which a reader can find zero pointers once the
    # first commit lands, and a crashed writer can never roll the
    # version counter back over a committed snapshot.

    def _committed_version(self) -> int | None:
        best = None
        for name in fsio.listdir(self.spark, self.path):
            m = _POINTER_RE.fullmatch(name)
            if m:
                n = int(m.group(1))
                best = n if best is None else max(best, n)
        return best

    def _current_version(self) -> str:
        n = self._committed_version()
        if n is None:
            raise FileNotFoundError(f"no committed snapshot under {self.path}")
        return f"v-{n:08d}"

    def _current_dir(self) -> str:
        return f"{self.path}/{self._current_version()}"

    def _commit_snapshot(self, df: DataFrame) -> None:
        cur = self._committed_version()
        nxt = 1 if cur is None else cur + 1
        vname = f"v-{nxt:08d}"
        # overwrite can only hit an ORPHAN dir left by a crashed commit
        # of this same uncommitted version, never a committed snapshot
        df.write.mode("overwrite").parquet(f"{self.path}/{vname}")
        final = f"{self.path}/current-{nxt:08d}"
        tmp = f"{final}.tmp"
        fsio.write_bytes(self.spark, tmp, vname.encode())
        if fsio.exists(self.spark, final):  # retry of a crashed rename
            fsio.delete(self.spark, final, recursive=False)
        fsio.rename(self.spark, tmp, final)
