"""Hand-expected value pins for the bibliographic ingest sources.

The DuckDB oracle proves ENGINE AGREEMENT on src_ris / src_medline,
but both parsers could share a bug (same wrong prefix width, same
mis-split) and still hash-match — these tests pin the semantics the
formats actually guarantee against hand-read fixture values:

- RIS: records terminate on an ``ER  -`` LINE, never on the string
  appearing inside a value; repeating AU tags accumulate in order.
- MEDLINE: records split on BLANK lines; 6-space continuation lines
  fold into the preceding tag's value; an unknown tag that happens to
  spell ``ER`` stays inside its record (MEDLINE has no terminator).
"""

from __future__ import annotations

import duckdb

from systematic_review_classification_spark import all_queries
from systematic_review_classification_spark.operators.scans import (
    _medline_fields,
    _read_medline,
)
from tests.harness import compare


def _rows(spark, key):
    df = all_queries()[key](spark, "unused-sf-dir")
    return {r[0]: r.asDict() for r in df.collect()}


def test_src_ris_values(spark):
    by_type = all_queries()["src_ris"](spark, "x").collect()
    assert len(by_type) == 9
    rows = {r["doi"]: r.asDict() for r in by_type if r["doi"]}
    first = rows["10.1016/j.foodcont.2019.01.001"]
    # repeating AU tags accumulate in file order
    assert first["authors"] == "Verhoef, Anna; de Jong, Pieter"
    assert first["n_authors"] == 2
    assert first["pub_year"] == 2019
    assert first["year_raw"] == "2019"
    # dated PY (legal RIS): typed pub_year is NULL, raw string is kept
    dated = [r for r in by_type if r["year_raw"] == "2019/05/01"]
    assert len(dated) == 1 and dated[0]["pub_year"] is None
    assert first["keywords"] == "systematic review; active learning"
    # an 'ER - ' inside an abstract is NOT a record boundary (the
    # terminator is the tag line, matched with its two-space padding)
    packaging = rows["10.1016/j.tifs.2021.09.017"]
    assert "not a record boundary" in packaging["abstract"]
    # missing singletons surface as NULL, not ''
    no_journal = [r for r in by_type if r["ris_type"] == "RPRT"]
    assert len(no_journal) == 1 and no_journal[0]["journal"] is None
    assert no_journal[0]["authors"] == "European Food Safety Authority"


def test_src_medline_crlf_parity(spark, tmp_path):
    """A CRLF .nbib (Windows PubMed export) must parse identically to
    the LF original — before the r8 line-ending sniff, the literal
    '\\n\\n' lineSep never matched '\\r\\n\\r\\n' and the whole file
    collapsed into ONE record (silent data loss; ADVICE r7)."""
    import os

    from systematic_review_classification_spark.operators.scans import (
        _MEDLINE_SELECT,
    )

    lf = os.path.join(os.path.dirname(__file__), "fixtures", "pubmed.nbib")
    data = open(lf, "rb").read()
    assert b"\r" not in data  # fixture is LF; synthesize the CRLF twin
    crlf = tmp_path / "pubmed_crlf.nbib"
    crlf.write_bytes(data.replace(b"\n", b"\r\n"))

    df = _read_medline(spark, str(crlf))
    rows = {r["pmid"]: r.asDict() for r in df.collect()}
    assert len(rows) == 6, "CRLF records must split, not fold into one"
    assert rows[29381234]["n_authors"] == 3
    # and full value parity against the oracle parsing the same file
    con = duckdb.connect()
    compare(
        _read_medline(spark, str(crlf)),
        con,
        _medline_fields(str(crlf)) + _MEDLINE_SELECT,
        key="src_medline@crlf",
    )
    con.close()


def test_src_medline_values(spark):
    rows = _rows(spark, "src_medline")
    assert len(rows) == 6
    first = rows[31411498]
    # 6-space continuation lines fold into the wrapped value
    assert first["title"].endswith("recall-oriented classifiers.")
    assert "benchmark\nlinear" not in first["abstract"]
    assert "We benchmark linear and ensemble classifiers" in first["abstract"]
    assert first["pub_types"] == "Journal Article; Benchmark"
    # a stray tag spelling 'ER' does NOT terminate a MEDLINE record
    # (records split on blank lines only) — PMID 31411498 keeps all
    # its fields despite the ER line in the middle
    assert first["journal"] == "Food control"
    assert rows[29381234]["abstract"] is None
    assert rows[29381234]["n_authors"] == 3
