"""Checkpoint FS layer (crawl/fsio.py): Hadoop-FS routed I/O, the
manifest commit protocol (write-new-name, max round wins), and
crash-orphan behavior."""

import os

from vbpl_web_crawl_spark.crawl import fsio


def test_bytes_roundtrip_and_exists(spark, tmp_path):
    p = str(tmp_path / "sub" / "blob.bin")
    fsio.write_bytes(spark, p, b"\x00\xffhello")
    assert fsio.exists(spark, p)
    assert fsio.read_bytes(spark, p) == b"\x00\xffhello"
    assert not fsio.exists(spark, str(tmp_path / "nope"))


def test_rename_and_delete(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    fsio.write_bytes(spark, a, b"x")
    fsio.rename(spark, a, b)
    assert not fsio.exists(spark, a) and fsio.exists(spark, b)
    assert fsio.delete(spark, b, recursive=False)
    assert not fsio.delete(spark, b, recursive=False)  # already gone


def test_manifest_max_round_wins(spark, tmp_path):
    ckpt = str(tmp_path)
    assert fsio.read_manifest(spark, ckpt) is None
    fsio.commit_manifest(spark, ckpt, {"round": 1, "x": "a"})
    fsio.commit_manifest(spark, ckpt, {"round": 3, "x": "c"})
    fsio.commit_manifest(spark, ckpt, {"round": 2, "x": "b"})
    m = fsio.read_manifest(spark, ckpt)
    assert m == {"round": 3, "x": "c"}


def test_orphan_tmp_never_wins(spark, tmp_path):
    """A crashed commit leaves only manifest-*.json.tmp — readers must
    ignore it (the .tmp name never matches the committed pattern)."""
    ckpt = str(tmp_path)
    fsio.commit_manifest(spark, ckpt, {"round": 1})
    fsio.write_bytes(spark, os.path.join(ckpt, "manifest-00000009.json.tmp"), b"{}")
    assert fsio.read_manifest(spark, ckpt)["round"] == 1


def test_recommit_same_round_replaces(spark, tmp_path):
    """Re-running a crashed round re-commits the same round number."""
    ckpt = str(tmp_path)
    fsio.commit_manifest(spark, ckpt, {"round": 2, "v": 1})
    fsio.commit_manifest(spark, ckpt, {"round": 2, "v": 2})
    assert fsio.read_manifest(spark, ckpt) == {"round": 2, "v": 2}
