"""Sliding-window document chunking — the context-window preprocessing
step of an LLM training / retrieval pipeline: split each document's
token stream into fixed-size chunks with overlap (stride < size), the
standard HF-style ``return_overflowing_tokens`` convention.

Not in the reference (its surface is market data); part of the
training-data extension family next to packing (`packing.py`) and
passage dedup (`text.py`): chunking feeds either the tokenizer/packer
(training) or the embedding index (`similarity.py`, retrieval).

Semantics (deterministic, engine-portable):

* tokens = whitespace-split of ``trim(text)``, empties dropped — the
  same tokenizer ``text.text_profile`` counts with.
* chunk starts = 0, stride, 2·stride, …; enumeration stops once a
  chunk has reached the end of the document: a start survives iff it
  is 0 or the PREVIOUS start's chunk was still short of the end
  (``start - stride + size < n_tokens``).  Every token lands in ≥1
  chunk; consecutive chunks share exactly ``size - stride`` tokens
  (except a shorter final chunk); no fully-redundant tail chunks.
* output: one row per chunk — ``(id_col, chunk_idx, start_tok,
  n_tok, chunk_text)`` with ``chunk_text`` the space-joined token
  slice.  ``(id_col, chunk_idx)`` is the stable chunk key.

Plan shape at 100 TB: pure whole-stage-codegen — split + one
``posexplode`` per document, no shuffle at all (the explode is a
map-side generator); downstream groupBys shuffle chunk rows, never
raw text twice.  Chunk count per doc is ~n/stride, so output size is
bounded by ``(1 + size/stride)`` × corpus tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into overlapping token-window chunks."""
    if not (0 < stride <= size):
        raise ValueError("need 0 < stride <= size (stride == size → no overlap)")
    toks = F.expr(rf"filter(split(trim({text_col}), '\\s+'), t -> t != '')")
    starts = F.expr(
        f"filter(sequence(0, greatest(size(__toks) - 1, 0), {stride}), "
        f"st -> st = 0 OR st - {stride} + {size} < size(__toks))"
    )
    per_doc = docs.select(
        F.col(id_col), toks.alias("__toks")
    ).select(
        id_col,
        "__toks",
        F.size("__toks").alias("__n"),
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    return per_doc.filter(F.col("__n") > 0).select(
        id_col,
        "chunk_idx",
        "start_tok",
        F.least(F.lit(size), F.col("__n") - F.col("start_tok")).alias("n_tok"),
        F.array_join(
            F.slice("__toks", F.col("start_tok") + 1, F.lit(size)), " "
        ).alias("chunk_text"),
    )
