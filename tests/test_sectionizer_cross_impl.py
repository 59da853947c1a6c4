"""Cross-implementation property test: the window-function sectionizer
(operators/sectionizer.py) vs the independent imperative state machine
(plans/decode_oracles._sectionize_seq) on randomized marker-soup
documents.

The toan_van gate pins the two implementations against each other on
the tiny crawl's 8 documents; this test widens the input space to
random compositions of every marker type the reference parser knows
(big parts, chapters, parts, mini-parts, sections, appendix, rules,
400-char overflow names, name-on-next-line, empty lines, markers in
scrambled hierarchy order) so a divergence on a path the synthetic
site never generates still fails loudly.
"""

import random

import pandas as pd
import pytest

from vbpl_web_crawl_spark.operators.sectionizer import sectionize
from vbpl_web_crawl_spark.plans.decode_oracles import _sectionize_seq

_ROMAN = ["I", "II", "III", "IV", "V", "VI"]
_ORDS = ["nhất", "hai", "ba", "bốn", "năm"]


def _random_doc(rng: random.Random) -> list[str]:
    lines: list[str] = [f"TIÊU ĐỀ {rng.randint(1, 9)}", ""]
    dieu = 0
    for _ in range(rng.randint(4, 28)):
        kind = rng.randint(0, 11)
        if kind == 0:
            lines.append(f"Phần thứ {rng.choice(_ORDS)}")
            lines.append(f"TÊN PHẦN {rng.randint(1, 9)}")
        elif kind == 1:
            lines.append(f"Chương {rng.choice(_ROMAN)}")
            lines.append(f"TÊN CHƯƠNG {rng.randint(1, 9)}")
        elif kind == 2:
            lines.append(f"Mục {rng.choice(_ROMAN)}")
            lines.append(f"TÊN MỤC {rng.randint(1, 9)}")
        elif kind == 3:
            lines.append(f"Tiểu mục {rng.choice(_ROMAN)}")
            lines.append(f"TÊN TIỂU MỤC {rng.randint(1, 9)}")
        elif kind in (4, 5, 6):
            dieu += 1
            if kind == 4:
                # F17 overflow: a "name" at the column limit is body text
                name = "x" * (380 + rng.randint(0, 60))
            else:
                name = f"Quy định {dieu} ({rng.randint(1, 99)})"
            sep = rng.choice([".", ":", ""])
            lines.append(f"Điều {dieu}{sep} {name}".rstrip())
            for _ in range(rng.randint(0, 3)):
                lines.append(f"Nội dung {rng.randint(1, 999)}.")
        elif kind == 7:
            lines.append("_____")
        elif kind == 8:
            lines.append("PHỤ LỤC")
            lines.append(f"Phụ lục {rng.choice(_ROMAN)}. Biểu {rng.randint(1, 9)}")
        elif kind == 9:
            lines.append("")
        else:
            lines.append(f"Đoạn văn tự do {rng.randint(1, 999)}.")
    return lines


@pytest.mark.parametrize("seed", [7, 19, 41])
def test_random_docs_match_imperative_reference(spark, seed):
    rng = random.Random(seed)
    docs = {f"doc{j:03d}": _random_doc(rng) for j in range(12)}
    rows = [
        (doc_id, ln_no, line)
        for doc_id, lines in docs.items()
        for ln_no, line in enumerate(lines)
    ]
    lines_df = spark.createDataFrame(rows, "doc_id string, line_no int, line string")
    got = (
        sectionize(lines_df)
        .orderBy("doc_id", "section_number")
        .toPandas()
        .reset_index(drop=True)
    )
    cols = list(got.columns)
    want = pd.DataFrame(_sectionize_seq(docs), columns=cols)
    want = want.sort_values(["doc_id", "section_number"]).reset_index(drop=True)
    want["section_number"] = want["section_number"].astype(got["section_number"].dtype)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
