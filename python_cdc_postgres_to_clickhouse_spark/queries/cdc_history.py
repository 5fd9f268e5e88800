"""CDC warehouse-history queries: SCD2 versioning, versioned collapse,
and pipeline reconciliation digests.

The reference ships changes into ClickHouse and stops there (reference
main.py:39-52 inserts the unwrapped rows; docker-compose.yml:155-174
provisions the warehouse). What a warehouse team then *builds* from that
change stream is history tables and integrity checks — the three shapes
here:

- **SCD Type-2 history** (`cdc_scd2_history`): every upsert opens a
  version valid until the key's next change; deletes close the current
  version without opening one. The standard "dimension history" read of a
  Debezium changelog.
- **VersionedCollapsingMergeTree** (`cdc_versioned_collapse`): ClickHouse's
  out-of-order-tolerant collapse — rows carry (key, version, sign); each
  version collapses independently by SUM(sign), and the served state is the
  newest surviving version per key.
- **Reconciliation digests** (`cdc_reconciliation`): source-vs-destination
  integrity checking without moving rows — both sides reduce their
  materialized state to per-bucket (count, hash-sum) digests and only the
  digests are compared. This is how CDC pipelines are actually validated
  at 100 TB: the network carries O(buckets), never O(rows).

Same stand-in mapping as queries/cdc_queries.py: ``events`` is the change
stream, ``user_id`` the key, ``(ts, event_id)`` the LSN-like total order,
``event_type = 'error'`` the delete/cancel op.

Scale notes (100 TB):
- SCD2 is ONE window shuffle on the key (lead over the key's timeline) —
  the filter to non-deletes happens after the lead, so closes-by-delete
  cost nothing extra.
- Versioned collapse is one hash aggregate on (key, version) + a per-key
  top-1; both shuffles hash on the same leading key, and AQE coalesces.
- Reconciliation digests: each side is a window + hash agg collapsing to
  ``N_BUCKETS`` rows; the comparison join moves a constant number of
  bytes regardless of table size. Digest hash-sums are associative, so
  partial aggregation combines map-side exactly like the final merge.

Float determinism: balances are exact DECIMAL(18,6) sums surfaced as
DOUBLE; digests are int64 sums of a 32-bit md5 prefix (max |sum| ≈
rows·2^32 ≪ 2^63) — all bit-identical across engines (see
queries/_exprs.py and operators/sampling.md5_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables
from ._exprs import DEC

SCD2_SQL = """
SELECT user_id, event_id, valid_from, valid_to,
       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER)
         AS is_current,
       value
FROM (
  SELECT user_id, event_id, ts AS valid_from, event_type, value,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM events) t
WHERE event_type <> 'error'
"""


@query("cdc_scd2_history", oracle=SCD2_SQL, tags=("cdc", "history"))
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history from the change stream: each non-delete
    change opens a version at its own ``ts``, valid until the key's NEXT
    change of any kind (a later upsert supersedes it; a delete closes it
    without opening a successor — its own row is then dropped). Open-ended
    versions (``valid_to IS NULL``) are the current state, so this one
    table serves both point-in-time ("as of ts") and current-state reads.

    One window shuffle on the key; the lead runs over ALL changes before
    the delete-filter so deletes still close the interval they terminate.
    No join, no second shuffle — at 100 TB the cost is exactly one hash
    exchange of the five projected columns.
    """
    ev = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            "event_type",
            "value",
        )
        .filter(F.col("event_type") != "error")
        .select(
            "user_id",
            "event_id",
            "valid_from",
            "valid_to",
            F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("int").alias(
                "is_current"
            ),
            "value",
        )
    )


VERSIONED_COLLAPSE_SQL = """
SELECT user_id, version, net_rows, balance FROM (
  SELECT user_id, version, net_rows, balance,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY version DESC)
           AS rn
  FROM (
    SELECT user_id,
           date_trunc('day', ts) AS version,
           CAST(SUM(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END)
                AS BIGINT) AS net_rows,
           CAST(SUM(CASE WHEN event_type = 'error'
                         THEN -CAST(value AS DECIMAL(18,6))
                         ELSE CAST(value AS DECIMAL(18,6)) END)
                AS DOUBLE) AS balance
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
    HAVING SUM(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) > 0) c) t
WHERE rn = 1
"""


@query(
    "cdc_versioned_collapse", oracle=VERSIONED_COLLAPSE_SQL, tags=("cdc", "mergetree")
)
def cdc_versioned_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VersionedCollapsingMergeTree read semantics: signed rows collapse
    *per (key, version)* — out-of-order state/cancel pairs still meet
    because the version disambiguates them (the engine CollapsingMergeTree
    cannot offer under reordered delivery) — and the served state is the
    newest version whose net sign is positive. The day of ``ts`` (as a
    day-truncated timestamp) stands in for the version column; 'error' rows are the cancels.

    One hash aggregate on (key, version) + a per-key top-1 window. Both
    exchanges hash the same leading key; partial sums of sign / sign·value
    ARE the background merge, identical to cdc_collapsing_state but
    version-scoped. Decimal-exact balance → bit-identical DOUBLE.
    """
    ev = load_tables(spark, sf_dir)["events"]
    sign = F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1))
    sign_val = F.when(
        F.col("event_type") == "error", -F.col("value").cast(DEC)
    ).otherwise(F.col("value").cast(DEC))
    collapsed = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("version"))
        .agg(
            F.sum(sign).alias("net_rows"),
            F.sum(sign_val).cast("double").alias("balance"),
        )
        .filter(F.col("net_rows") > 0)
    )
    w = W.partitionBy("user_id").orderBy(F.desc("version"))
    return (
        collapsed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "version", "net_rows", "balance")
    )


N_RECON_BUCKETS = 16
_SNAPSHOT_MAX_EVENT = 5000  # same prefix split as cdc_snapshot_union_changelog

# 32-bit row fingerprint from the md5 of "user_id:event_id" — the same
# engine-portable construction as operators/sampling.md5_bucket.
_SQL_ROW_HASH = (
    "CAST(concat('0x', substr(md5(concat(CAST(user_id AS VARCHAR), ':',"
    " CAST(event_id AS VARCHAR))), 1, 8)) AS BIGINT)"
)

RECONCILIATION_SQL = f"""
WITH latest_src AS (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC,
                            event_id DESC) AS rn
  FROM events WHERE event_id <= {_SNAPSHOT_MAX_EVENT}),
latest_dst AS (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC,
                            event_id DESC) AS rn
  FROM events),
dig_src AS (
  SELECT user_id % {N_RECON_BUCKETS} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS src_keys,
         CAST(SUM({_SQL_ROW_HASH}) AS BIGINT) AS src_digest
  FROM latest_src WHERE rn = 1 GROUP BY user_id % {N_RECON_BUCKETS}),
dig_dst AS (
  SELECT user_id % {N_RECON_BUCKETS} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS dst_keys,
         CAST(SUM({_SQL_ROW_HASH}) AS BIGINT) AS dst_digest
  FROM latest_dst WHERE rn = 1 GROUP BY user_id % {N_RECON_BUCKETS})
SELECT COALESCE(s.bucket, d.bucket) AS bucket,
       COALESCE(s.src_keys, 0) AS src_keys,
       COALESCE(d.dst_keys, 0) AS dst_keys,
       COALESCE(s.src_digest, 0) AS src_digest,
       COALESCE(d.dst_digest, 0) AS dst_digest,
       CAST(CASE WHEN COALESCE(s.src_keys, 0) = COALESCE(d.dst_keys, 0)
                  AND COALESCE(s.src_digest, 0) = COALESCE(d.dst_digest, 0)
                 THEN 1 ELSE 0 END AS INTEGER) AS is_match
FROM dig_src s FULL OUTER JOIN dig_dst d ON s.bucket = d.bucket
"""


def _state_digest(ev: DataFrame, side: str) -> DataFrame:
    """Materialize latest-by-key state, then collapse it to per-bucket
    (count, hash-sum) digests. The digest is an int64 sum of a 32-bit md5
    prefix of (key, version): associative (map-side combinable), engine
    portable, and overflow-free below ~2^31 rows per bucket."""
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    state = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
    )
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("event_id").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return state.groupBy(
        (F.col("user_id") % N_RECON_BUCKETS).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias(f"{side}_keys"),
        F.sum(row_hash).alias(f"{side}_digest"),
    )


@query("cdc_reconciliation", oracle=RECONCILIATION_SQL, tags=("cdc", "ops"))
def cdc_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-vs-destination reconciliation digests: both sides' latest-by-
    key state collapses to per-bucket (key count, int64 hash-sum) pairs and
    only those digests meet. Mismatched buckets localize divergence to a
    1/{N_RECON_BUCKETS} key range for targeted re-sync — the standard CDC
    integrity check. Here the "source" is the snapshot prefix
    (event_id ≤ {_SNAPSHOT_MAX_EVENT}, the cdc_snapshot_union_changelog
    split), the "destination" the fully-applied stream, so non-matching
    buckets are exactly those touched by post-snapshot changes.

    Each side: one key-window + one hash agg ending at {N_RECON_BUCKETS}
    rows; the FULL OUTER digest join moves constant bytes. At 100 TB the
    two sides run in different systems and only digests cross the wire —
    which is the point.
    """
    ev = load_tables(spark, sf_dir)["events"]
    src = _state_digest(ev.filter(F.col("event_id") <= _SNAPSHOT_MAX_EVENT), "src")
    dst = _state_digest(ev, "dst")
    joined = src.withColumnRenamed("bucket", "s_bucket").join(
        dst.withColumnRenamed("bucket", "d_bucket"),
        F.col("s_bucket") == F.col("d_bucket"),
        "full_outer",
    )
    zero = F.lit(0).cast("long")
    src_keys = F.coalesce(F.col("src_keys"), zero)
    dst_keys = F.coalesce(F.col("dst_keys"), zero)
    src_digest = F.coalesce(F.col("src_digest"), zero)
    dst_digest = F.coalesce(F.col("dst_digest"), zero)
    return joined.select(
        F.coalesce(F.col("s_bucket"), F.col("d_bucket")).alias("bucket"),
        src_keys.alias("src_keys"),
        dst_keys.alias("dst_keys"),
        src_digest.alias("src_digest"),
        dst_digest.alias("dst_digest"),
        F.when((src_keys == dst_keys) & (src_digest == dst_digest), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_match"),
    )
