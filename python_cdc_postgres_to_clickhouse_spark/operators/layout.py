"""Analytic table layout: clustered (ORDER BY) and Z-ordered writes.

The reference's sink tables are ClickHouse MergeTree with an ORDER BY key
(reference docker-compose.yml:155-174 provisions the server; the consumer
relies on the warehouse to keep data key-clustered for range scans). The
Spark-native equivalent is a range-partitioned, sorted parquet layout:

- ``cluster_write``: ``repartitionByRange(key)`` + ``sortWithinPartitions``
  → every output file covers a *disjoint* key range, so parquet row-group
  min/max statistics let any reader (Spark, DuckDB, Trino) skip whole
  files on a key predicate — the MergeTree primary-index effect without a
  server. Range partition bounds come from Spark's reservoir sampling of
  the key (one extra narrow pass), not a full sort.
- ``zorder_key``: bit-interleaved key over TWO dimensions so one layout
  serves range predicates on either column (MergeTree can only serve its
  leading ORDER BY column). The interleave is a static JVM expression
  tree (shift/and/or — whole-stage codegen, no UDF).

At 100 TB: the write's only wide stage is the range exchange itself, which
any sorted-sink write needs; file count scales with data; each task sorts
only its own partition. Readers get monotone pruning: a predicate selecting
p% of the key space touches ~p% of files (plus one boundary file per side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def cluster_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    mode: str = "overwrite",
    bloom_cols: list[str] | None = None,
    bloom_ndv: int = 100_000,
) -> None:
    """Write ``df`` as parquet clustered on ``cols`` (ClickHouse ORDER BY
    analog): disjoint per-file key ranges + sorted row groups.

    ``bloom_cols`` is the ClickHouse ``INDEX … TYPE bloom_filter`` analog:
    parquet row-group bloom filters on high-cardinality columns that are
    NOT the cluster key, so equality probes skip row groups where min/max
    stats cannot help (a clustered layout only prunes on its own keys).
    Any parquet reader honoring blooms (Spark, Trino, Impala) gets the
    skipping; cost is ~(ndv-sized) filter bytes per row group per column.
    parquet-mr adaptively OMITS the bloom for column chunks that stay fully
    dictionary-encoded (the dictionary is already an exact membership
    filter) — so low-cardinality columns cost nothing and genuinely
    high-cardinality ones (where CH users reach for bloom_filter indexes)
    get real filters."""
    w = (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode(mode)
    )
    for c in bloom_cols or []:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_ndv)
        )
    w.parquet(path)


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column to an integer bucket in [0, 2**bits) by linear
    min/max scaling — rank-free (no global sort), good enough for pruning.

    The +1 on the span keeps the max value strictly below 2**bits.
    """
    span = (hi - lo).cast("double") + F.lit(1.0)
    frac = (col.cast("double") - lo.cast("double")) / span
    return F.floor(frac * F.lit(float(1 << bits))).cast("long")


def zorder_key(
    x_bucket: Column, y_bucket: Column, bits: int = DEFAULT_BITS
) -> Column:
    """Interleave the low ``bits`` bits of two bucket columns (x gets the
    odd positions). Static expression tree — stays inside codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftleft(F.shiftright(x_bucket, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ybit = F.shiftleft(F.shiftright(y_bucket, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z.bitwiseOR(xbit).bitwiseOR(ybit)
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-ordered on (x_col, y_col): one layout that prunes on
    range predicates over EITHER column.

    One cheap global min/max aggregate (broadcast as literals via a
    1-row cross join — never a collect of data rows) scales both columns
    to ``bits``-bit buckets; rows are then range-partitioned and sorted
    by the interleaved key. Each file covers a compact Z-curve segment,
    i.e. a small bounding box in (x, y) space, so min/max footer stats
    prune on both dimensions.
    """
    bounds = df.agg(
        F.min(x_col).alias("_xlo"),
        F.max(x_col).alias("_xhi"),
        F.min(y_col).alias("_ylo"),
        F.max(y_col).alias("_yhi"),
    )
    with_key = df.join(F.broadcast(bounds)).withColumn(
        "_z",
        zorder_key(
            _scale_to_bits(F.col(x_col), F.col("_xlo"), F.col("_xhi"), bits),
            _scale_to_bits(F.col(y_col), F.col("_ylo"), F.col("_yhi"), bits),
            bits,
        ),
    )
    (
        with_key.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", "_xlo", "_xhi", "_ylo", "_yhi")
        .write.mode(mode)
        .parquet(path)
    )
