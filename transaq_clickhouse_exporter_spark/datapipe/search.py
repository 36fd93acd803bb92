"""Corpus search / ranking for training-data curation: BM25 scoring
over the portable ASCII tokenization.

Why this belongs in a training-data engine: query-based corpus
filtering ("give me the documents most relevant to these seed terms")
is a standard curation step — domain-targeted subset extraction,
quality-seed expansion, and contamination triage all reduce to ranked
retrieval over the corpus.  BM25 is the canonical ranking function.

No reference parity — the reference (kmlebedev/transaq-clickhouse-
exporter) has no text-search surface; this is part of the
training-pipeline extension mandated by BASELINE.json's north star.

Scale shape (the 100 TB story):

- Document lengths are a NARROW projection (no explode): ``dl`` is the
  size of the filtered token array, computed inside whole-stage
  codegen in the same scan that feeds the term match.
- The token explode is filtered to the (tiny, broadcast) query-term
  set BEFORE any shuffle — the exploded stream that reaches the
  (doc, term) aggregate is only the matching tokens, not the corpus.
- Per-term document frequencies aggregate that already-tiny frame
  (≤ |query terms| rows out) and re-enter via a broadcast join.
- The corpus constants (N, avgdl) are a 1-row aggregate cross-joined
  back (Spark broadcasts a 1-row side automatically).
- The final top-k is ``orderBy(...).limit(k)`` → TakeOrderedAndProject,
  never a global sort.

Cross-engine exactness: every arithmetic step except ``ln`` is
IEEE-754 correctly rounded and written with IDENTICAL association in
the Spark expression and the SQL oracle; the per-(doc, term) score is
quantized to an integer (``round(score·1e6)`` BIGINT) before the
per-document sum, so summation order cannot perturb the result.  The
single ``ln`` may differ between engines in the last ulp, which flips
the micro-quantization only if the true value sits within ~1e-16
relative of a 0.5e-6 boundary — the same accepted exposure as the
rounded-cosine ANN family (dp04/ann01 precedent, green across five
driver rounds).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: portable tokenization shared with text.term_stats: lowercase, split
#: on runs of non-letters, drop empties.  DuckDB reproduces it via
#: ``regexp_split_to_array(lower(text), '[^a-z]+')``.
_SPLIT_RE = "[^a-z]+"


def doc_length_col(text_col: str) -> F.Column:
    """Token count of the portable tokenization as a codegen'd column
    (no explode): size of the split array minus empty strings."""
    arr = F.split(F.lower(F.col(text_col)), _SPLIT_RE)
    return F.size(F.filter(arr, lambda t: t != F.lit(""))).cast("long")


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 for a bag of ``query_terms``.

    Output: (``id_col``, ``score_micro`` BIGINT — the BM25 score in
    1e-6 units, summed over matched terms — ``n_hit_terms`` BIGINT),
    ordered by (score desc, id asc), total order.

    idf uses the standard +1 smoothing (Lucene form):
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — always positive, so adding
    a matched term never lowers the score."""
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")

    dl = df.select(F.col(id_col), doc_length_col(text_col).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )

    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), _SPLIT_RE)).alias("token"),
    ).filter(F.col("token").isin(list(terms)))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfq"))

    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    # association mirrors the SQL oracle TEXTUALLY — float ops are
    # order-sensitive and both engines must run the identical tree
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfq") + F.lit(0.5)) / (F.col("dfq") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    )
    s_micro = F.round(idf * tfn * F.lit(1e6), 0).cast("long")

    return (
        scored.select(F.col(id_col), s_micro.alias("s_micro"))
        .groupBy(id_col)
        .agg(
            F.sum("s_micro").alias("score_micro"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
        .orderBy(F.desc("score_micro"), F.asc(id_col))
        .limit(k)
    )
