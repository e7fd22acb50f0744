"""Streaming percolation: match a DOCUMENT STREAM against the registered
query table — the percolator's production shape (alerting / routing /
live classification on an ingest feed; the reference's pipeline is exactly
a continuous doc feed into ES, ElasticsearchSink.java:62, and 1.x clients
percolate at index time via ``?percolate=*``).

Two Spark-first forms, both reusing the BATCH percolation kernel
(:func:`~..operators.percolate.mpercolate` — term-exploded equi-join,
rules broadcast, never |docs|x|queries|):

* :func:`percolate_matches_stream` — a fully DECLARATIVE streaming plan:
  stream docs explode on term and stream-static-join the registered terms
  table; per ES OR-mode rules a doc matches when ANY term overlaps, so the
  join + per-(doc, query) dedup needs no cross-batch state. AND-mode rules
  need the per-pair distinct-term count, a streaming aggregation — rather
  than silently emitting under weaker semantics the declarative form
  REFUSES and-mode rule tables and points at the foreachBatch form.
* :func:`percolate_stream_foreach` — the reference's own batch-drain model
  (SURVEY B2: take a batch from the channel, process, commit): every
  micro-batch runs the full batch kernel (both modes, identical semantics
  to static mpercolate) and hands (query_id, doc matches) to the caller's
  sink function. At-least-once under the streaming checkpoint, idempotent
  when the sink upserts by (query_id, doc_id) — the ES upsert contract.

Scale notes: the registered table is read once and broadcast per
micro-batch (config-to-millions of rules: the same guidance as mpercolate;
beyond-broadcast rule sets use the term-keyed percolator index inside the
foreachBatch body). Stream state is ZERO in both forms — matching is
per-document, so nothing crosses batch boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import tokens_col


def percolate_matches_stream(
    stream_docs: DataFrame,
    registered: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: "list[str] | None" = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """Declarative streaming percolation for OR-mode rule tables: returns
    an append-mode streaming DataFrame of ``(doc_id, query_id)`` matches.

    The plan is stream-side explode-on-term -> stream-static equi-join
    against the exploded registered terms (static side broadcast) ->
    ``dropDuplicates`` on (doc, query) WITHIN the batch (a doc's multiple
    shared terms must emit one match). No watermark needed: matching is
    stateless across batches. AND-mode rules refuse loudly — use
    :func:`percolate_stream_foreach`, which runs the exact batch kernel."""
    if not stream_docs.isStreaming:
        raise ValueError("percolate_matches_stream needs a streaming DataFrame")
    n_and = registered.where(F.col("mode") == "and").limit(1).count()
    if n_and:
        raise ValueError(
            "registered table has and-mode rules: the declarative streaming "
            "form supports OR rules only (AND needs a per-pair streaming "
            "aggregation) — use percolate_stream_foreach for full semantics"
        )
    rule_terms = registered.select(
        "query_id", F.explode("terms").alias("term")
    )
    doc_terms = stream_docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(tokens_col(text_col, stopwords, analyzer))
        ).alias("term"),
    )
    return (
        doc_terms.join(F.broadcast(rule_terms), "term")
        .select("doc_id", "query_id")
        .dropDuplicates(["doc_id", "query_id"])
    )


def percolate_stream_foreach(
    stream_docs: DataFrame,
    registered: DataFrame,
    sink,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: "list[str] | None" = None,
    analyzer: str = "ascii",
    trigger_available_now: bool = True,
):
    """Batch-drain streaming percolation (the reference's B2 model): each
    micro-batch runs :func:`~..operators.percolate.mpercolate` — BOTH rule
    modes, semantics identical to static percolation — and calls
    ``sink(matches_df, batch_id)`` with the batch's ``(query_id, doc_id)``
    matches. Returns the started StreamingQuery (caller awaits/stops).

    At-least-once: a batch replayed after a crash re-emits its matches;
    sinks keyed on (query_id, doc_id) upsert to exactly-once effect (the
    same idempotence contract the reference gets from ES doc ids)."""
    from ..operators.percolate import mpercolate

    def _run_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
        matches = mpercolate(
            registered, docs, id_col="doc_id", text_col=text_col,
            stopwords=stopwords, analyzer=analyzer,
        )
        sink(matches, batch_id)

    writer = (
        stream_docs.writeStream.foreachBatch(_run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
