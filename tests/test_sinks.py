"""Archive export sink (X7 equivalent of the reference's 7z packing)."""

import zipfile

from vbpl_web_crawl_spark.sources.corpus import synth_corpus
from vbpl_web_crawl_spark.sources.sinks import export_zip_archives


def test_zip_export_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "archives")
    corpus = synth_corpus(spark, 40, partitions=4)
    manifest = export_zip_archives(
        corpus, out, key_col="image_id", bytes_col="bytes", n_buckets=4, ext="img"
    ).collect()
    assert sum(m.n_files for m in manifest) == 40
    assert {m.bucket for m in manifest} <= set(range(4))
    # every archived member decodes back to the exact source bytes
    src = {r.image_id: bytes(r.bytes) for r in corpus.collect()}
    seen = 0
    for m in manifest:
        with zipfile.ZipFile(m.archive) as zf:
            for name in zf.namelist():
                iid = name[: -len(".img")]
                assert zf.read(name) == src[iid]
                seen += 1
        assert m.archive_bytes > 0 and m.raw_bytes > 0
    assert seen == 40


def test_zip_export_deterministic(spark, tmp_path):
    corpus = synth_corpus(spark, 16, partitions=2)
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    a = export_zip_archives(corpus, a_dir, "image_id", "bytes", n_buckets=2).collect()
    b = export_zip_archives(corpus, b_dir, "image_id", "bytes", n_buckets=2).collect()
    for ma, mb in zip(sorted(a, key=lambda m: m.bucket), sorted(b, key=lambda m: m.bucket)):
        assert open(ma.archive, "rb").read() == open(mb.archive, "rb").read()
