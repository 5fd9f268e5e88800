"""Clustered / Z-ordered layout: the data-skipping properties the writes
exist for, asserted from parquet footer statistics (what any engine's
pruning actually reads)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.operators.layout import (
    cluster_write,
    zorder_key,
    zorder_write,
)
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_SMOKE


def _file_stats(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` across all row groups."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_cluster_write_files_cover_disjoint_key_ranges(spark, tmp_path):
    ev = load_tables(spark, SF_SMOKE)["events"]
    path = str(tmp_path / "ev_clustered")
    cluster_write(ev, path, ["ts"], n_files=8)

    stats = sorted(_file_stats(path, "ts"))
    assert len(stats) > 1, "expected multiple files"
    for (_, hi_prev), (lo_next, _) in zip(stats, stats[1:]):
        assert hi_prev <= lo_next, "file key ranges overlap — no skipping"

    # Round trip: nothing lost, nothing duplicated.
    back = spark.read.parquet(path)
    assert back.count() == ev.count()

    # Pruning effectiveness: a ~10% key-range predicate intersects only a
    # few files (monotone layout → ~10% of files + boundary effects).
    glo = min(s[0] for s in stats)
    ghi = max(s[1] for s in stats)
    span = ghi - glo
    qlo, qhi = glo + 0.45 * span, glo + 0.55 * span
    touched = sum(1 for lo, hi in stats if hi >= qlo and lo <= qhi)
    assert touched <= max(2, len(stats) // 2), (touched, len(stats))


def test_zorder_key_matches_python_interleave(spark):
    df = spark.range(1).select(
        *[
            zorder_key(F.lit(x), F.lit(y), bits=8).alias(f"z_{x}_{y}")
            for x, y in [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)]
        ]
    )
    row = df.collect()[0]

    def ref(x, y, bits=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    for x, y in [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)]:
        assert row[f"z_{x}_{y}"] == ref(x, y), (x, y)


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path):
    ev = load_tables(spark, SF_SMOKE)["events"].select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "ev_zordered")
    zorder_write(ev, path, "user_id", "value", n_files=8)

    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert set(back.columns) == {"event_id", "user_id", "value"}

    xs = _file_stats(path, "user_id")
    ys = _file_stats(path, "value")
    gx = (min(s[0] for s in xs), max(s[1] for s in xs))
    gy = (min(s[0] for s in ys), max(s[1] for s in ys))

    def frac(lohi, g):
        lo, hi = lohi
        return (hi - lo) / max(g[1] - g[0], 1e-9)

    # Z-curve segments are compact in BOTH dimensions: the mean bounding-box
    # area is well below 1 (an unsorted write gives ~1 per file — every file
    # spans the whole space on both axes).
    areas = [frac(x, gx) * frac(y, gy) for x, y in zip(xs, ys)]
    assert sum(areas) / len(areas) < 0.6, areas

    # A mid-range predicate on EITHER dimension skips at least one file.
    for stats, g in ((xs, gx), (ys, gy)):
        span = g[1] - g[0]
        qlo, qhi = g[0] + 0.4 * span, g[0] + 0.6 * span
        touched = sum(1 for lo, hi in stats if hi >= qlo and lo <= qhi)
        assert touched < len(stats), "no pruning on one dimension"


def test_bloom_cols_write_filters_and_preserve_reads(spark, tmp_path):
    """bloom_cols must actually emit parquet bloom filters (file size grows
    by the filter bytes — pyarrow exposes no bloom accessor, so size is the
    observable) and must not change read results. The column must be
    HIGH-cardinality: parquet-mr adaptively skips blooms for fully
    dictionary-encoded chunks (the dictionary is already exact), which is
    also why the CH bloom_filter-index use case is high-cardinality keys."""
    import os

    from pyspark.sql import functions as F

    from python_cdc_postgres_to_clickhouse_spark.operators.layout import (
        cluster_write,
    )

    df = spark.range(200_000).select(
        F.col("id"), (F.col("id") % 50_000).alias("k")
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    cluster_write(df, plain, ["id"], n_files=1)
    cluster_write(df, bloomed, ["id"], n_files=1,
                  bloom_cols=["k"], bloom_ndv=50_000)

    def total(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p) if f.endswith(".parquet")
        )

    # NDV 50k → ~65 KB of filter bytes per row group; data is identical
    assert total(bloomed) > total(plain) + 30_000
    probe = sorted(r["id"] for r in spark.read.parquet(bloomed)
                   .filter(F.col("k") == 42).collect())
    assert probe == sorted(r["id"] for r in df.filter("k = 42").collect())
    assert len(probe) == 4  # 200k / 50k occurrences of each key
