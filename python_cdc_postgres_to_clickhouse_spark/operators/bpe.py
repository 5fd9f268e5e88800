"""BPE merge induction — tokenizer training over the corpus (SURVEY.md
§2.7 vocabulary-construction family, taken to its real endpoint: the
byte-pair-encoding merge table an LLM tokenizer ships with).

Algorithm (Sennrich et al., 2016): train on the WORD-FREQUENCY DICTIONARY,
not the corpus — each distinct word becomes a symbol sequence (characters
plus an end-of-word marker), and each round merges the globally most
frequent adjacent symbol pair inside every word, weighted by word
frequency.

Scale split (100 TB):
- The corpus-scale stage is the word count: one token explode + one
  partial-aggregated hash aggregate on the token — word-count shaped,
  linear shuffle.
- The dictionary is then CAPPED to the top-V words by (count desc, token
  asc) via TakeOrdered — a bounded per-partition heap, no global sort, no
  prior count. Real tokenizer trainers do exactly this (frequency floor /
  vocab cap): the merge table converges on the head of the Zipf curve,
  and an uncapped tail would make training state unbounded.
- Merge training then runs driver-side on ≤ cap entries — bounded model
  fitting like the IVF/PQ trainers (operators/similarity.py), not a
  corpus pass. Each round is O(dict symbols); the output is the few-KB
  merge table you broadcast to encode the corpus.

Pair counting counts overlapping occurrences ("aaa" contributes (a,a)
twice); applying a merge rewrites left-to-right non-overlapping
("aaa" -> ["aa", "a"]) — both match the reference BPE implementation.
Ties break on (pair count desc, left asc, right asc): deterministic for a
given dictionary.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def top_word_freqs(tokens: DataFrame, cap: int, token_col: str = "token") -> list:
    """(word, count) for the ``cap`` most frequent words — one corpus-scale
    word-count aggregate + a TakeOrdered head. Deterministic: ties on count
    break by token text."""
    counts = tokens.groupBy(token_col).agg(F.count(F.lit(1)).alias("n"))
    return [
        (r[token_col], r["n"])
        for r in counts.orderBy(F.desc("n"), F.asc(token_col)).limit(cap).collect()
    ]


def bpe_merges_from_dict(
    word_freqs: list, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side BPE: ``n_merges`` rounds over the capped dictionary.

    Returns [(rank, left, right, pair_count), ...]; stops early when no
    pair occurs twice (merging singletons would be vocabulary noise).
    """
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [EOW], int(n)) for w, n in word_freqs if w
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in seqs:
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((rank, left, right, int(cnt)))
        joined = left + right
        new_seqs = []
        for sym, n in seqs:
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_seqs.append((out, n))
        seqs = new_seqs
    return merges


def train_bpe(
    tokens: DataFrame,
    n_merges: int = 16,
    cap: int = 5000,
    token_col: str = "token",
) -> list[tuple[int, str, str, int]]:
    """Corpus-scale word count -> capped dictionary -> driver BPE rounds."""
    return bpe_merges_from_dict(top_word_freqs(tokens, cap, token_col), n_merges)


def encode_token_expr(token, merges: list):
    """Column: token string -> array of BPE symbols after applying
    ``merges`` in rank order — pure JVM string expressions, no UDF.

    Representation: symbols joined by DOUBLE spaces, with leading/trailing
    doubles ("  a  b  c  </w>  "). A merge (a, b) is one literal
    ``replace(" a  b ", " ab ")``: the pattern consumes only the INNER
    space of each double separator, so back-to-back occurrences keep a
    spare space between them and plain left-to-right replace() reproduces
    BPE's non-overlapping apply exactly ("a a a a" -> "aa aa", not
    "aa a a"). Symbols never contain spaces (tokens are whitespace-split),
    so no false boundary matches. k merges = k chained replaces in ONE
    narrow whole-stage-codegen map — the encode pass over 100 TB is
    shuffle-free with the few-KB merge table inlined as literals.
    """
    col = token if isinstance(token, Column) else F.col(token)
    s = F.concat(
        F.lit("  "), F.regexp_replace(col, "(.)", "$1  "), F.lit(EOW + "  ")
    )
    for _, left, right, _ in merges:
        s = F.replace(
            s, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
        )
    return F.filter(
        F.split(F.trim(s), " +"), lambda x: x != F.lit("")
    )


def apply_merges_py(word: str, merges: list) -> list[str]:
    """Pure-python replay of encode_token_expr (tests/oracles)."""
    sym = list(word) + [EOW]
    for _, left, right, _ in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym
