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
