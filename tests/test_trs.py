"""TRS compat parser vs the reference's documented edge cases (FIXTURES.md §3,
SURVEY.md §8)."""

from __future__ import annotations

import pytest

from flume_elasticsearch_2_spark.sources.trs import (
    parse_trs_text,
    read_trs,
    trs_dedup_by_sid,
    trs_project,
)

FILE_A = """<REC>
<IR_SID>=a1
<TITLE>=hello world

<BODY>=first body
garbage line no pattern
<REC>
<IR_SID>=a2
<EMPTY>=
<TITLE>=second
"""

FILE_B = """<REC>
<IR_SID>=a2
<TITLE>=redelivered
<REC>
<IR_SID>=b1
<TITLE>=unicode çĕ東
"""


def test_parse_basic_and_edge_cases():
    recs, dropped = parse_trs_text(FILE_A, flush_final=True)
    assert len(recs) == 2
    assert recs[0] == {"IR_SID": "a1", "TITLE": "hello world", "BODY": "first body"}
    # empty value field kept; blank lines skipped; garbage counted
    assert recs[1]["EMPTY"] == ""
    assert dropped == 1


def test_reference_mode_drops_final_record():
    recs, _ = parse_trs_text(FILE_A, flush_final=False)
    assert len(recs) == 1  # reference bug §8.2: trailing record lost


def test_empty_file():
    recs, dropped = parse_trs_text("", flush_final=True)
    assert recs == [] and dropped == 0


def test_duplicate_key_last_wins():
    recs, _ = parse_trs_text("<REC>\n<K>=1\n<K>=2\n", flush_final=True)
    assert recs[0]["K"] == "2"


def test_fields_before_first_rec_are_dropped():
    recs, dropped = parse_trs_text("<K>=orphan\n<REC>\n<K>=ok\n")
    assert recs == [{"K": "ok"}] and dropped == 1


@pytest.fixture(scope="module")
def trs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trs")
    (d / "a.trs").write_text(FILE_A, encoding="utf-8")
    (d / "b.trs").write_text(FILE_B, encoding="utf-8")
    (d / "empty.trs").write_text("", encoding="utf-8")  # zero-length skip (S3)
    return str(d)


def test_read_trs_spark(spark, trs_dir):
    df = read_trs(spark, trs_dir)
    rows = df.collect()
    assert len(rows) == 4  # 2 + 2 + 0
    proj = trs_project(df, ["TITLE"])
    assert {r.IR_SID for r in proj.collect()} == {"a1", "a2", "b1"}


def test_trs_dedup_by_sid(spark, trs_dir):
    out = trs_dedup_by_sid(read_trs(spark, trs_dir), ["TITLE"])
    got = {r.IR_SID: r.TITLE for r in out.collect()}
    assert got["a2"] == "redelivered"  # later file wins (upsert semantics)
    assert got["b1"] == "unicode çĕ東"  # UTF-8 intact (reference bug §8.4)
    assert len(got) == 3


def test_crlf_values_not_corrupted():
    recs, dropped = parse_trs_text("<REC>\r\n<K>=abc\r\n<L>=\r\n")
    assert recs == [{"K": "abc", "L": ""}] and dropped == 0


def test_dropped_lines_counted_once_per_file(spark, tmp_path):
    from flume_elasticsearch_2_spark.sources.trs import read_trs

    (tmp_path / "a.trs").write_text("<REC>\n<K>=1\njunk\n<REC>\n<K>=2\nmorejunk\n")
    (tmp_path / "b.trs").write_text("only junk\nno recs\n")
    out = read_trs(spark, str(tmp_path)).collect()
    total = sum(r.dropped_lines for r in out)
    assert total == 4  # 2 junk lines in a.trs + 2 in b.trs, counted once
    assert sum(1 for r in out if r.rec_idx == -1) == 1  # b.trs sentinel
    assert sum(1 for r in out if r.rec_idx >= 0) == 2


def test_chunked_reader_matches_wholetext(spark, tmp_path):
    """Byte-range splits must parse IDENTICALLY to the wholetext path even
    when chunk boundaries land mid-record, mid-field-line, or inside a
    multi-byte UTF-8 char — records heal across splits via the ownership
    rule, dropped-line totals agree, and rec_idx stays monotone in file
    order."""
    from flume_elasticsearch_2_spark.sources.trs import read_trs_chunked

    d = tmp_path / "trs"
    d.mkdir()
    # many records with unicode + garbage + CRLF + blank lines + no final REC
    body = []
    for i in range(60):
        body.append("<REC>")
        body.append(f"<IR_SID>=doc{i}")
        body.append(f"<TITLE>=çĕ東 multi-byte {i} ✓")
        if i % 7 == 0:
            body.append("garbage line no pattern")
        if i % 5 == 0:
            body.append("")
        body.append(f"<BODY>=text body {i} with some padding to cross chunks")
    (d / "a.trs").write_text("\n".join(body) + "\n", encoding="utf-8")
    (d / "b.trs").write_bytes(
        "<REC>\r\n<IR_SID>=crlf1\r\n<T>=v\r\n".encode("utf-8")
    )
    (d / "_SUCCESS").write_bytes(b"")  # zero-length skip

    whole = read_trs(spark, str(d / "*")).collect()
    for chunk in (48, 97, 1 << 20):  # mid-line, mid-record, single-chunk
        chunked = read_trs_chunked(spark, str(d), chunk_bytes=chunk).collect()
        # same records in the same per-file order, same fields
        w = sorted(
            ((r.file.split("/")[-1], r.rec_idx, tuple(sorted(r.fields.items()))) for r in whole if r.rec_idx >= 0),
        )
        c = sorted(
            ((r.file.split("/")[-1], r.rec_idx, tuple(sorted(r.fields.items()))) for r in chunked if r.rec_idx >= 0),
        )
        assert [x[0] for x in w] == [x[0] for x in c]
        assert [x[2] for x in w] == [x[2] for x in c], f"chunk={chunk}"
        # rec_idx monotone within each file on the chunked path
        from collections import defaultdict

        by_file = defaultdict(list)
        for f, idx, _ in c:
            by_file[f].append(idx)
        for idxs in by_file.values():
            assert idxs == sorted(idxs)
        # dropped-line totals identical
        assert sum(r.dropped_lines for r in chunked) == sum(
            r.dropped_lines for r in whole
        ), f"chunk={chunk}"
