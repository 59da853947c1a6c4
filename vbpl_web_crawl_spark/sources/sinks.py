"""Archive export sink (X7): the reference compresses its downloaded
document folders with py7zr (/root/reference/app/service/get_pdf.py and
the 7z export path); the Spark-native equivalent packs the documents
table into one archive per hash bucket, written executor-side.

Shape: repartition by bucket -> mapInPandas writes one zip per
partition (stdlib zipfile — py7zr is absent in this container; a
deployment that needs .7z swaps the two-line writer for py7zr behind
the same manifest contract) -> returns a manifest DataFrame (archive
path, file count, raw/compressed bytes) instead of collecting anything
to the driver. Archive membership is deterministic (bucket =
pmod(xxhash64(key), n)) and files are written in sorted key order, so
re-exports are byte-stable for stable inputs.
"""

from __future__ import annotations

import os
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("archive", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_files", T.IntegerType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("archive_bytes", T.LongType(), False),
    ]
)


def export_zip_archives(
    docs: DataFrame,
    out_dir: str,
    key_col: str,
    bytes_col: str,
    n_buckets: int = 16,
    ext: str = "bin",
) -> DataFrame:
    """Pack (key, bytes) rows into ``n_buckets`` zip archives under
    ``out_dir``; returns the manifest. Work and I/O happen on the
    executors — the driver never sees file contents.

    ``out_dir`` must be a filesystem visible to the executors (shared
    mount, NFS, or local mode); on a multi-node cluster point it at a
    shared path, or swap the two ``open``-level calls for the Hadoop FS
    layer (``crawl/fsio``) to target HDFS/S3. Each task writes to a
    per-attempt temp name and ``os.replace``s it into place, so a task
    retry or speculative duplicate cannot leave a half-written archive
    at the final path — last completed attempt wins with identical
    bytes (membership and order are deterministic)."""
    bucketed = docs.select(
        F.col(key_col).alias("k"),
        F.col(bytes_col).alias("b"),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int").alias("bucket"),
    ).repartition(n_buckets, "bucket")

    def pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = tc.taskAttemptId() if tc is not None else 0
        os.makedirs(out_dir, exist_ok=True)  # executor-side, not driver
        rows: list[tuple[str, bytes, int]] = []
        for pdf in it:
            for r in pdf.itertuples(index=False):
                rows.append((str(r.k), bytes(r.b), int(r.bucket)))
        if not rows:
            yield pd.DataFrame(columns=[f.name for f in MANIFEST_SCHEMA.fields])
            return
        by_bucket: dict[int, list[tuple[str, bytes]]] = {}
        for k, b, bk in rows:
            by_bucket.setdefault(bk, []).append((k, b))
        out = []
        for bk, files in sorted(by_bucket.items()):
            path = os.path.join(out_dir, f"archive-{bk:05d}.zip")
            tmp = f"{path}.attempt-{attempt}.tmp"
            files.sort(key=lambda t: t[0])  # deterministic member order
            raw = 0
            with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
                for k, b in files:
                    # fixed timestamp: archives must be byte-stable
                    info = zipfile.ZipInfo(f"{k}.{ext}", date_time=(1980, 1, 1, 0, 0, 0))
                    zf.writestr(info, b)
                    raw += len(b)
            os.replace(tmp, path)  # atomic publish; retries re-replace
            out.append(
                {
                    "archive": path,
                    "bucket": bk,
                    "n_files": len(files),
                    "raw_bytes": raw,
                    "archive_bytes": os.path.getsize(path),
                }
            )
        yield pd.DataFrame(out, columns=[f.name for f in MANIFEST_SCHEMA.fields])

    return bucketed.mapInPandas(pack, MANIFEST_SCHEMA)
