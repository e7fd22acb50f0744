"""Streaming percolation: match a DOCUMENT STREAM against the registered
query table — the percolator's production shape (alerting / routing /
live classification on an ingest feed; the reference's pipeline is exactly
a continuous doc feed into ES, ElasticsearchSink.java:62, and 1.x clients
percolate at index time via ``?percolate=*``).

Two Spark-first forms (the foreachBatch one reuses the BATCH percolation
kernel :func:`~..operators.percolate.mpercolate` — term-exploded
equi-join + per-batch dedup, rules broadcast):

* :func:`percolate_matches_stream` — a fully DECLARATIVE streaming plan:
  stream docs join the broadcast rule table on ``arrays_overlap`` (the ES
  OR-mode predicate itself), which emits exactly ONE row per matching
  (doc, rule) pair — no dedup operator anywhere in the plan, so the state
  store stays empty by construction and a doc re-ingested in a later
  batch (an update) re-matches, as ES's index-time percolation does.
  AND-mode rules need the per-pair distinct-term count, a streaming
  aggregation — rather than silently emitting under weaker semantics the
  declarative form REFUSES and-mode rule tables and points at the
  foreachBatch form.
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

    The plan is a stream-static BROADCAST join on the OR-mode predicate
    itself — ``arrays_overlap(doc_tokens, rule_terms)`` — so each matching
    (doc, rule) pair yields exactly one row and the plan needs NO
    deduplication operator.  (The obvious explode-on-term equi-join needs a
    per-(doc, query) dedup, and ``dropDuplicates`` on a STREAMING frame is
    a GLOBAL stateful dedup: unbounded state growth, and a doc re-ingested
    in a later batch would be silently suppressed instead of re-matched.
    This shape avoids the operator entirely.)  Matching is genuinely
    stateless across batches: a doc that reappears (an update) re-matches,
    exactly as ES index-time percolation re-percolates updated docs.

    Cost shape: each stream row evaluates ``arrays_overlap`` against every
    broadcast rule (|batch| x |rules| predicate evaluations, JVM-side) —
    the ES percolator's own model (every doc runs the registered queries).
    Rule sets beyond broadcast size belong on
    :func:`percolate_stream_foreach`, whose batch kernel uses the
    term-keyed equi-join + SAFE per-batch dedup.  AND-mode rules refuse
    loudly — same pointer."""
    if not stream_docs.isStreaming:
        raise ValueError("percolate_matches_stream needs a streaming DataFrame")
    n_and = registered.where(F.col("mode") == "and").limit(1).count()
    if n_and:
        raise ValueError(
            "registered table has and-mode rules: the declarative streaming "
            "form supports OR rules only (AND needs a per-pair streaming "
            "aggregation) — use percolate_stream_foreach for full semantics"
        )
    rules = registered.select("query_id", F.col("terms").alias("__rule_terms"))
    toks = stream_docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(text_col, stopwords, analyzer).alias("__doc_terms"),
    )
    return (
        toks.join(
            F.broadcast(rules),
            F.arrays_overlap(F.col("__doc_terms"), F.col("__rule_terms")),
        )
        .select("doc_id", "query_id")
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
