"""Fuzzy (edit-distance) pair join: entity-resolution dedup for short text.

Jaccard/MinHash (operators/dedup.py) target token-level document overlap;
entity strings (names, titles, product labels) need *character-level*
tolerance — OCR noise, typos, transliteration drift. This operator finds
all id pairs whose normalized strings are within Levenshtein distance k,
without an all-pairs comparison.

Blocking is the classic count-filter on q-gram MULTISETS, which is
complete (zero false negatives), not heuristic: one edit operation
destroys at most q of a string's q-grams (the grams overlapping the edit
position; the rest survive as multiset members even when shifted), so

    lev(a, b) ≤ k  ⇒  |grams(a) ⊓ grams(b)| ≥ max(|a|,|b|) − (q−1) − k·q

Multiset intersection is made equi-joinable by numbering each gram's
occurrences: the pair shares min(cnt_a, cnt_b) copies of a gram exactly
when their (gram, occurrence_idx) rows match. Candidates also need
|len_a − len_b| ≤ k (k deletes can't bridge more). Survivors are verified
with the exact ``levenshtein`` built-in (JVM-side).

Strings too short to carry the bound (n ≤ q−1+k·q, where the threshold
degenerates to ≤ 0) take a separate length-banded join over DISTINCT
short strings — distinct-first collapses the quadratic term to the short
VOCABULARY, which is bounded in practice (and exact-dedup upstream removes
the worst mass).

Scale shape: one postings shuffle on (gram, occ) — the same skew profile
as the Jaccard postings join (stop-gram skew answers to the same df-based
remedies) — then a candidate-count aggregate and two id-keyed hash joins
to fetch strings for verification. Never O(N²).

Round-6 note: DuckDB ships ``levenshtein`` too, so this can be declared as
a fully oracle-checked query (`x_fuzzy_name_pairs` over part.p_name) when
a driver-window slot opens — the round-5 window was already committed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    q: int = 2,
) -> DataFrame:
    """All (id_a, id_b, distance) with id_a < id_b and
    ``levenshtein(norm_a, norm_b) ≤ max_distance`` over lower/trim
    normalized text. Complete — blocking never drops a true pair."""
    k = max_distance
    short_max = (q - 1) + k * q  # bound degenerates at or below this length

    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.lower(F.trim(F.col(text_col))).alias("s"),
        )
        .filter(F.col("s").isNotNull())
        .withColumn("n", F.length("s"))
    )
    long_side = base.filter(F.col("n") > short_max)

    grams = long_side.select(
        "id",
        "n",
        F.posexplode(
            F.expr(f"transform(sequence(1, n - {q - 1}), i -> substring(s, i, {q}))")
        ).alias("pos", "gram"),
    )
    w = Window.partitionBy("id", "gram").orderBy("pos")
    grams = grams.withColumn("occ", F.row_number().over(w)).select(
        "id", "n", "gram", "occ"
    )
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.occ") == F.col("b.occ"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("ida"),
            F.col("b.id").alias("idb"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(
            (F.abs(F.col("na") - F.col("nb")) <= k)
            & (
                F.col("common")
                >= F.greatest(F.col("na"), F.col("nb")) - F.lit(q - 1) - F.lit(k * q)
            )
        )
        .select("ida", "idb")
    )

    # Short-string band: distinct strings first (collapses repeated shorts),
    # banded on length, then expanded back to ids. A short string can also
    # pair with a long one only when the long side is ≤ short_max + k.
    shorts = base.filter(F.col("n") <= short_max + k)
    sd = shorts.select("s", "n").distinct()
    sa, sb = sd.alias("sa"), sd.alias("sb")
    short_str_pairs = sa.join(
        sb,
        (F.abs(F.col("sa.n") - F.col("sb.n")) <= k)
        & (F.col("sa.s") <= F.col("sb.s"))
        & (
            (F.col("sa.n") <= short_max) | (F.col("sb.n") <= short_max)
        ),  # at least one side is genuinely short — longer pairs belong to the gram path
        "inner",
    ).select(F.col("sa.s").alias("s_a"), F.col("sb.s").alias("s_b"))
    short_cand = (
        short_str_pairs.join(
            base.select(F.col("id").alias("id_x"), F.col("s").alias("s_a")), "s_a"
        )
        .join(base.select(F.col("id").alias("id_y"), F.col("s").alias("s_b")), "s_b")
        .filter(F.col("id_x") != F.col("id_y"))
        # String order (s_a ≤ s_b) and id order are independent — normalize
        # to (min, max) AFTER expansion or pairs whose id order disagrees
        # with the string order are silently dropped.
        .select(
            F.least("id_x", "id_y").alias("ida"),
            F.greatest("id_x", "id_y").alias("idb"),
        )
    )

    cand_all = cand.unionByName(short_cand).distinct()
    sa2 = base.select(F.col("id").alias("ida"), F.col("s").alias("str_a"))
    sb2 = base.select(F.col("id").alias("idb"), F.col("s").alias("str_b"))
    return (
        cand_all.join(sa2, "ida")
        .join(sb2, "idb")
        .withColumn("distance", F.levenshtein("str_a", "str_b"))
        .filter(F.col("distance") <= k)
        .select("ida", "idb", "distance")
    )
