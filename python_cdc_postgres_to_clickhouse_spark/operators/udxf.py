"""UDF / UDAF / UDTF escape hatches (SURVEY.md §2.6).

The declared relational surface is plan-asserted Python-free — these are
the documented slow paths for logic the built-ins genuinely can't express,
each in its Arrow-optimized form:

- UDTF (``chunk_text``): one input row → many output rows with schema known
  up front — the lateral-explode shape for per-row expansion logic too
  imperative for ``explode(transform(...))``.
- Grouped-agg pandas UDAF (``weighted_mean``): one Arrow batch per group →
  one scalar; partial aggregation does NOT apply (Spark ships whole groups),
  so at scale prefer built-in ``sum(x*w)/sum(w)`` — kept here as the
  documented escape-hatch shape with that caveat attached.

Reference parity: the reference's only Python "UDF" is its consumer-loop
Avro decode (read_from_kafka.py); the engine-side equivalents here follow
Spark's Arrow-vectorized contracts instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


class _ChunkText:
    """UDTF: split a text into fixed-size token chunks, one output row per
    chunk. eval() runs once per input row and yields rows — the UDTF
    contract; Spark plans it as a generator (LateralJoin / Generate), so
    it parallelizes like explode and never funnels through the driver."""

    def eval(self, text: str, chunk_tokens: int):  # noqa: D401
        if text is None:
            return
        toks = text.split()
        for i in range(0, max(len(toks), 1), chunk_tokens):
            window = toks[i : i + chunk_tokens]
            yield i // chunk_tokens, " ".join(window), len(window)


def chunk_text_udtf():
    """Wrap lazily: the DDL returnType parses against the active session,
    so the decorator must not run at import time."""
    return udtf(_ChunkText, returnType="chunk_idx: int, chunk: string, n_tokens: int")


def chunk_documents(docs: DataFrame, chunk_tokens: int = 16) -> DataFrame:
    """Lateral-join the chunking UDTF against the documents table."""
    chunk_text = chunk_text_udtf()
    return docs.lateralJoin(
        chunk_text(F.col("text").outer(), F.lit(chunk_tokens)).alias("c")
    ).select("doc_id", "chunk_idx", "chunk", "n_tokens")


def weighted_mean_udaf():
    """Grouped-agg pandas UDAF: Σvw/Σw per group over one Arrow batch.
    Built lazily — pandas_udf parses its DDL type against the active
    session, so the decorator must not run at import time.

    Scale caveat (why the declared surface doesn't use this): grouped-agg
    UDFs receive the ENTIRE group — no map-side partials, one task per
    group. Express the same thing with built-ins when possible:
    ``(sum(v*w)/sum(w))`` gets partial aggregation for free.
    """

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        denom = float(w.sum())
        return float((v * w).sum() / denom) if denom else float("nan")

    return weighted_mean


def revenue_weighted_discount(lineitem: DataFrame) -> DataFrame:
    """Demo consumer: per-returnflag discount rate weighted by extended
    price, via the UDAF (and only via it — this function exists to exercise
    the grouped-agg contract end to end)."""
    weighted_mean = weighted_mean_udaf()
    return lineitem.groupBy("l_returnflag").agg(
        weighted_mean("l_discount", "l_extendedprice").alias("weighted_discount")
    )
