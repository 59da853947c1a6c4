"""Deterministic generator for the reference's relational tables
(FIXTURES.md §4; schemas from /root/reference/app/model/vbpl.py:7-24,
77-91,100-105,124-129,148-154 and app/model/anle.py:6-20,46-52).

Used by the reference-parity query suite (plans/reference_queries.py)
and its pytest DuckDB oracle. Seed-42, no wall clock: every run — and
the DuckDB side — sees identical rows. FK-consistent with ~2% dangling
edges, ~10% NULL dates, a few soft-deleted rows, duplicate business
keys with differing updated_at (latest-wins), and near-duplicate titles
straddling the 0.8 Levenshtein-ratio threshold.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from vbpl_web_crawl_spark.sources.images import splitmix64

_BASE = datetime(2015, 1, 1)

DOC_TYPES = ("Nghị định", "Thông tư", "Quyết định", "Luật", "Nghị quyết")
STATES = ("Có hiệu lực", "Hết hiệu lực", "Chưa có hiệu lực")
AUTHORITIES = ("Chính phủ", "Bộ Tài chính", "Bộ Tư pháp", "Quốc hội")
SECTORS = ("Đất đai", "Thuế", "Môi trường", "Giao thông", "Lao động")


def _h(i: int, salt: int) -> int:
    return int(splitmix64(i * 1_000_003 + salt))


def _maybe_date(i: int, salt: int, null_every: int = 10):
    if _h(i, salt) % null_every == 0:
        return None
    return _BASE + timedelta(days=_h(i, salt) % 3000, hours=_h(i, salt + 1) % 24)


def gen_vbpl(n: int = 500) -> pd.DataFrame:
    rows = []
    for i in range(n):
        h = _h(i, 1)
        title = f"{DOC_TYPES[h % 5]} số {100 + i}/{2015 + h % 10} về {SECTORS[h % 5].lower()}"
        # near-duplicate titles around the 0.8 ratio threshold
        if i % 37 == 5:
            title = title[:-1] + "x"  # ratio just above 0.8 vs i-? variant
        rows.append(
            {
                "id": i,
                "file_link": f"documents/pdf/{i}.pdf" if h % 7 else None,
                "title": title,
                "sub_title": f"Về việc {SECTORS[h % 5].lower()} ({i})",
                "doc_type": DOC_TYPES[h % 5],
                "serial_number": f"{100 + i}/{2015 + h % 10}/ND-CP",
                "issuance_date": _maybe_date(i, 2),
                "effective_date": _maybe_date(i, 3),
                "expiration_date": _maybe_date(i, 4, null_every=3),
                "gazette_date": _maybe_date(i, 5),
                "state": STATES[h % 3],
                "issuing_authority": AUTHORITIES[h % 4],
                "applicable_information": f"Toàn quốc {h % 3}",
                "sector": SECTORS[h % 5],
                "html": f"<p>Điều 1. Nội dung {i}</p>",
                "org_pdf_link": f"https://vbpl.vn/Attachments/{i}/vb.pdf" if h % 5 else None,
                "created_at": _BASE + timedelta(days=i % 100),
                # duplicate-update pattern: every 11th doc was re-crawled
                "updated_at": _BASE + timedelta(days=i % 100 + (7 if i % 11 == 0 else 0)),
                "deleted_at": (_BASE + timedelta(days=400)) if i % 53 == 13 else None,
            }
        )
    return pd.DataFrame(rows)


def gen_vbpl_toan_van(n_docs: int = 500) -> pd.DataFrame:
    rows = []
    for i in range(n_docs):
        for s in range(1 + _h(i, 10) % 5):
            rows.append(
                {
                    "vbpl_id": i,
                    "section_number": s + 1,
                    "section_name": f"Điều khoản {s + 1} của văn bản {i}",
                    "section_content": f"Nội dung điều {s + 1}.\nChi tiết {_h(i, s) % 1000}.",
                    "chapter_number": f"{1 + s // 2}",
                    "chapter_name": f"Chương {1 + s // 2}",
                    "big_part_number": None if s < 3 else "I",
                    "big_part_name": None if s < 3 else "Phần thứ nhất",
                    "part_number": f"{1 + s % 2}",
                    "part_name": f"Mục {1 + s % 2}",
                    "mini_part_number": None,
                    "mini_part_name": None,
                }
            )
    return pd.DataFrame(rows)


def _edges(n_docs: int, salt: int, per_doc: int) -> list[tuple[int, int]]:
    out = []
    for i in range(n_docs):
        for k in range(_h(i, salt) % (per_doc + 1)):
            j = _h(i, salt + 10 + k) % n_docs
            if i % 47 == 3 and k == 0:
                j = n_docs + 17  # ~2% dangling FK
            if j != i:
                out.append((i, j))
    return sorted(set(out))


def gen_vbpl_related(n_docs: int = 500) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {"source_id": a, "related_id": b, "doc_type": DOC_TYPES[_h(a + b, 20) % 5]}
            for a, b in _edges(n_docs, 21, 4)
        ]
    )


def gen_vbpl_doc_map(n_docs: int = 500) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {"source_id": a, "doc_map_id": b, "doc_map_type": DOC_TYPES[_h(a + b, 30) % 5]}
            for a, b in _edges(n_docs, 31, 3)
        ]
    )


def gen_anle(n: int = 120) -> pd.DataFrame:
    rows = []
    for i in range(n):
        h = _h(i, 40)
        # duplicate business keys with different updated_at (latest-wins,
        # app/service/anle.py:285)
        doc_id = f"AL{i % 100:03d}"
        rows.append(
            {
                "id": i,
                "doc_id": doc_id,
                "title": f"Án lệ số {i % 100:02d}/{2016 + h % 8}/AL",
                "serial_number": f"{i % 100:02d}/{2016 + h % 8}/AL",
                "adoption_date": _maybe_date(i, 41),
                "application_date": _maybe_date(i, 42),
                "expiration_date": _maybe_date(i, 43, null_every=2),
                "publication_date": _maybe_date(i, 44),
                "state": STATES[h % 3],
                "sector": SECTORS[h % 5],
                "publication_decision": f"QĐ {200 + i}/QĐ-CA",
                "file_link": f"documents/pdf/anle_{i}.pdf",
                "org_pdf_link": f"https://anle.toaan.gov.vn/file/{i}.pdf",
                "created_at": _BASE + timedelta(days=i),
                "updated_at": _BASE + timedelta(days=i + (30 if i >= 100 else 0)),
                "deleted_at": (_BASE + timedelta(days=500)) if i % 59 == 7 else None,
            }
        )
    return pd.DataFrame(rows)


def gen_anle_section(n: int = 120) -> pd.DataFrame:
    rows = []
    for i in range(n):
        rows.append(
            {
                "id": i,
                "anle_id": i,
                "context": f"Tình huống án lệ {i}: tranh chấp hợp đồng.",
                "solution": f"Giải pháp pháp lý {i}: chấp nhận yêu cầu.",
                "content": f"Nội dung án lệ {i} " + "x" * (_h(i, 50) % 40),
            }
        )
    return pd.DataFrame(rows)


GENERATORS = {
    "vbpl": gen_vbpl,
    "vbpl_toan_van": gen_vbpl_toan_van,
    "vbpl_related_document": gen_vbpl_related,
    "vbpl_doc_map": gen_vbpl_doc_map,
    "anle": gen_anle,
    "anle_section": gen_anle_section,
}


def write_reference_tables(out_dir: str) -> dict[str, str]:
    """Materialize all tables as parquet (pandas->pyarrow, no Spark
    needed); returns table -> path."""
    import os

    paths = {}
    for name, gen in GENERATORS.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df = gen()
        for c in df.columns:
            # Spark cannot read TIMESTAMP(NANOS) parquet — force micros
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = df[c].astype("datetime64[us]")
            elif df[c].dtype == object and df[c].map(lambda v: hasattr(v, "year")).any():
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        df.to_parquet(path, index=False)
        paths[name] = path
    return paths


def load_reference_tables(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    import os

    if not os.path.exists(os.path.join(out_dir, "vbpl.parquet")):
        os.makedirs(out_dir, exist_ok=True)
        write_reference_tables(out_dir)
    return {
        name: spark.read.parquet(os.path.join(out_dir, f"{name}.parquet"))
        for name in GENERATORS
    }
