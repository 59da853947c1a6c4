"""Checkpoint filesystem I/O through the Hadoop FileSystem API.

The engine's state lives wherever Spark can write parquet — local disk,
HDFS, or an object store. Driver-side metadata operations (manifest
commit, live-dir swap, orphan cleanup) therefore must NOT use POSIX
calls (``os.rename`` / ``shutil.rmtree``): those only work for
driver-local paths. Everything here goes through
``org.apache.hadoop.fs.FileSystem`` resolved from the path's scheme, so
``/tmp/ckpt``, ``hdfs://nn/ckpt`` and ``s3a://bucket/ckpt`` all behave.

Commit protocol (object-store tolerant): each round writes a NEW
manifest file ``manifest-<round>.json`` via tmp-file + rename-to-fresh-
name (atomic on HDFS and local FS; on S3 the PUT of a new key is the
commit). The current checkpoint is the manifest with the highest round
— no rename-with-overwrite anywhere, which object stores lack. This is
the same monotonically-increasing-snapshot-pointer shape Iceberg uses;
swapping these tables to real Iceberg replaces this module with the
catalog's own commit.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import SparkSession

_MANIFEST_RE = re.compile(r"manifest-(\d+)\.json$")


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, _, p = _fs(spark, path)
    return bool(fs.exists(p))


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, _, p = _fs(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Rename to a fresh name (no overwrite — HDFS rename onto an
    existing path is not atomic and object stores cannot do it at all)."""
    fs, jvm, psrc = _fs(spark, src)
    pdst = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(psrc, pdst):
        raise IOError(f"rename failed: {src} -> {dst}")


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, _, p = _fs(spark, path)
    fs.mkdirs(p)


def write_bytes(spark: SparkSession, path: str, data: bytes) -> None:
    fs, _, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def read_bytes(spark: SparkSession, path: str) -> bytes:
    fs, jvm, p = _fs(spark, path)
    stream = fs.open(p)
    try:
        util = jvm.org.apache.commons.io.IOUtils
        return bytes(util.toByteArray(stream))
    finally:
        stream.close()


def listdir(spark: SparkSession, path: str) -> list[str]:
    fs, _, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def commit_manifest(spark: SparkSession, ckpt_dir: str, manifest: dict) -> None:
    """Atomic commit: write manifest-<round>.json.tmp, rename to the
    final (fresh) name. Readers pick the highest committed round."""
    rnd = int(manifest["round"])
    final = f"{ckpt_dir}/manifest-{rnd:08d}.json"
    tmp = final + ".tmp"
    write_bytes(spark, tmp, json.dumps(manifest).encode("utf-8"))
    if exists(spark, final):  # re-run of a crashed round: replace
        delete(spark, final, recursive=False)
    rename(spark, tmp, final)


def read_manifest(spark: SparkSession, ckpt_dir: str) -> dict | None:
    """Highest-round committed manifest, or None if no checkpoint."""
    best = -1
    for name in listdir(spark, ckpt_dir):
        m = _MANIFEST_RE.fullmatch(name)
        if m:
            best = max(best, int(m.group(1)))
    if best < 0:
        return None
    data = read_bytes(spark, f"{ckpt_dir}/manifest-{best:08d}.json")
    return json.loads(data.decode("utf-8"))
