"""TRS-format compatibility source (SURVEY.md §2.1 S2, §8 edge cases).

Re-expresses the reference's record reader (/root/reference/file-source/src/
main/java/com/file/elasticsearch/FileSource.java:128-191): text files where a
literal ``<REC>`` line opens each record, followed by ``<KEY>=value`` field
lines matched by the regex ``<(.+?)>=(.+?|$)$`` (FileSource.java:168).

Spark-first: one row per input file (``wholetext``) → Arrow-batched
``mapInPandas`` parser with a pre-compiled regex (the reference recompiled
its pattern every line, bug §8.7). The file is the unit of parallelism —
the same granularity the Flume source used, with Spark handling discovery,
scheduling, and retries (S1/S3 are free).

Intended-vs-actual semantics (SURVEY §8, tested both ways):

* ``flush_final=True`` (default, *intended*): the last record of a file is
  emitted even without a trailing ``<REC>`` (the reference silently drops
  it, bug §8.2).
* blank lines are skipped (FileSource.java:148-149); non-matching lines are
  dropped but **counted** in the ``dropped_lines`` column (the reference
  dropped them silently, bug §8.3).
* files are decoded as UTF-8 (the reference's ``RandomAccessFile.readLine``
  mangles multi-byte chars, bug §8.4).
* duplicate keys within a record: last wins (HashMap.put semantics).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REC_MARK = "<REC>"
FIELD_RE = re.compile(r"^<(.+?)>=(.*)$")

TRS_SCHEMA = (
    "file string, rec_idx long, fields map<string,string>, dropped_lines long"
)


def parse_trs_text(text: str, flush_final: bool = True) -> tuple[list[dict[str, str]], int]:
    """Parse one file's content into records. Returns (records, dropped)."""
    records: list[dict[str, str]] = []
    cur: dict[str, str] | None = None
    dropped = 0
    for line in text.split("\n"):
        if line.endswith("\r"):  # CRLF files: the \r is an EOL artifact,
            line = line[:-1]  # not part of the field value
        if line.strip() == "":
            continue
        if line.strip() == REC_MARK:
            if cur is not None:
                records.append(cur)
            cur = {}
            continue
        m = FIELD_RE.match(line)
        if m is None or cur is None:
            dropped += 1  # reference drops silently (bug §8.3); we count
            continue
        cur[m.group(1)] = m.group(2)
    if flush_final and cur is not None:
        records.append(cur)  # reference bug §8.2 drops this record
    return records, dropped


def read_trs(spark: SparkSession, path: str, flush_final: bool = True) -> DataFrame:
    """Directory/glob of TRS files -> (file, rec_idx, fields, dropped_lines)."""
    raw = spark.read.text(path, wholetext=True).withColumn(
        "file", F.input_file_name()
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, text in zip(pdf["file"], pdf["value"]):
                recs, dropped = parse_trs_text(text, flush_final)
                # dropped-line accounting (fixing reference bug §8.3's silent
                # drops): attributed ONCE per file — on its first record, or
                # on a rec_idx=-1 sentinel row when the file yields no
                # records at all — so sum(dropped_lines) is the true count
                for i, r in enumerate(recs):
                    rows.append((fname, i, r, dropped if i == 0 else 0))
                if not recs and dropped:
                    rows.append((fname, -1, {}, dropped))
            yield pd.DataFrame(rows, columns=["file", "rec_idx", "fields", "dropped_lines"])

    return raw.mapInPandas(parse, TRS_SCHEMA)


def _parse_trs_span(
    fname: str, start: int, end: int, flush_final: bool
) -> tuple[list[tuple[int, dict[str, str]]], int]:
    """Parse the records OWNED by byte span [start, end) of one TRS file.

    Ownership rule (Hadoop LineRecordReader convention lifted to records): a
    record belongs to the span containing the first byte of its ``<REC>``
    marker line; the owning reader keeps reading PAST ``end`` until the next
    ``<REC>`` or EOF, and a reader with ``start > 0`` first skips any partial
    line plus any lines belonging to a record opened upstream. Every line is
    therefore parsed by exactly one reader. Returns
    ([(marker_byte_offset, fields)...], dropped_lines). Lines of head-of-file
    garbage (before the first ``<REC>``) are counted by the start=0 reader;
    multi-byte UTF-8 never splits because assembly is line-wise at the byte
    level before decoding (preserving the §8.4 fix)."""
    records: list[tuple[int, dict[str, str]]] = []
    cur: dict[str, str] | None = None
    cur_off = -1
    dropped = 0
    at_eof = False
    with open(fname, "rb") as fh:
        if start > 0:
            fh.seek(start - 1)
            if fh.read(1) != b"\n":
                fh.readline()  # partial line: owned by the upstream reader
        else:
            fh.seek(0)
        while True:
            line_off = fh.tell()
            raw = fh.readline()
            if not raw:
                at_eof = True
                break
            # stop once past the span UNLESS we are completing an owned record
            if line_off >= end and cur is None:
                break
            line = raw.decode("utf-8").rstrip("\n")
            if line.endswith("\r"):
                line = line[:-1]
            if line.strip() == "":
                continue
            if line.strip() == REC_MARK:
                if cur is not None:
                    records.append((cur_off, cur))
                    cur = None
                if line_off >= end:
                    break  # next record is owned downstream
                cur, cur_off = {}, line_off
                continue
            if cur is None:
                # head-of-file garbage (count, start=0 only) or the tail of an
                # upstream record (already counted by its owner): skip
                if start == 0:
                    dropped += 1
                continue
            m = FIELD_RE.match(line)
            if m is None:
                dropped += 1
                continue
            cur[m.group(1)] = m.group(2)
    # cur can only remain open at EOF (both mid-span breaks close it first)
    assert cur is None or at_eof
    if cur is not None and flush_final:
        records.append((cur_off, cur))  # §8.2 fix: flush the final record
    return records, dropped


def read_trs_chunked(
    spark: SparkSession,
    path: str,
    chunk_bytes: int = 64 << 20,
    flush_final: bool = True,
) -> DataFrame:
    """TRS reader for LARGE files: byte-range splits instead of wholetext.

    ``read_trs`` loads each file as ONE row (the Flume source's granularity)
    — fine for the reference's file sizes, but a >2 GB file breaks Spark's
    string column and one giant file serializes parallelism. Here each file
    is cut into ``chunk_bytes`` spans that parse independently (record
    boundaries healed via the ownership rule in :func:`_parse_trs_span`), so
    a single 1 TB TRS file fans out across the whole cluster. ``rec_idx`` is
    the byte offset of the record's ``<REC>`` marker — monotone per file, so
    ``trs_dedup_by_sid``'s (file, rec_idx) ordering still means file order.
    Parses identically to :func:`read_trs` on well-formed files (tested with
    splits landing mid-record and mid-field-line)."""
    import glob as _glob
    import os as _os

    if _os.path.isdir(path):
        names = sorted(_glob.glob(_os.path.join(path, "*")))
    else:
        names = sorted(_glob.glob(path))
    names = [n for n in names if _os.path.isfile(n)]
    splits = []
    for n in names:
        size = _os.path.getsize(n)
        if size == 0:
            continue  # S3 zero-length skip, same as the wholetext path
        for s in range(0, size, chunk_bytes):
            splits.append((n, s, min(s + chunk_bytes, size)))
    if not splits:
        return spark.createDataFrame([], TRS_SCHEMA)
    sdf = spark.createDataFrame(
        spark.sparkContext.parallelize(splits, len(splits)), "file string, start long, end long"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, s, e in zip(pdf["file"], pdf["start"], pdf["end"]):
                recs, dropped = _parse_trs_span(fname, int(s), int(e), flush_final)
                for j, (off, r) in enumerate(recs):
                    rows.append((fname, off, r, dropped if j == 0 else 0))
                if not recs and dropped:
                    rows.append((fname, -1, {}, dropped))
            yield pd.DataFrame(rows, columns=["file", "rec_idx", "fields", "dropped_lines"])

    return sdf.mapInPandas(parse, TRS_SCHEMA)


def trs_project(df: DataFrame, keys: list[str], id_key: str = "IR_SID") -> DataFrame:
    """Project map fields to typed columns (SURVEY §2.2 P3); rows missing the
    id key are dropped like the sink's null-id bulk failure would."""
    cols = [F.element_at("fields", k).alias(k) for k in keys]
    out = df.select(F.element_at("fields", id_key).alias(id_key), *cols)
    return out.where(F.col(id_key).isNotNull())


def trs_dedup_by_sid(df: DataFrame, keys: list[str], id_key: str = "IR_SID") -> DataFrame:
    """Idempotent-redelivery semantics: last record per IR_SID wins — the ES
    ``setId`` upsert (/root/reference/elasticsearch-sink/.../
    ElasticsearchSink.java:67) as a deterministic window."""
    from pyspark.sql.window import Window

    proj2 = df.select(
        F.element_at("fields", id_key).alias(id_key),
        *[F.element_at("fields", k).alias(k) for k in keys],
        "file",
        "rec_idx",
    ).where(F.col(id_key).isNotNull())
    w = Window.partitionBy(id_key).orderBy(F.col("file").desc(), F.col("rec_idx").desc())
    return (
        proj2.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "file", "rec_idx")
    )
