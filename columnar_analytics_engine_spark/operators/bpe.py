"""BPE merge induction over a distributed word-frequency table.

Byte-pair-encoding tokenizer training (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units") — the vocabulary-learning
step of an LLM data pipeline.  The classic algorithm never touches the
corpus after the first pass: it iterates on the WORD-FREQUENCY table
(count adjacent symbol pairs weighted by word count, merge the most
frequent pair everywhere, repeat).  That is exactly the distributed
shape used here:

1. one corpus-scale aggregation builds (word, n) — the only pass whose
   cost grows with corpus size;
2. each merge round runs on the vocabulary table (Zipf: |vocab| ≪
   corpus): explode adjacent symbol pairs weighted by ``n``, one
   map-combinable groupBy, a TakeOrdered(1) argmax, then a pure-JVM
   ``aggregate`` fold that greedily merges the winning pair inside each
   word's symbol array (left-to-right, non-overlapping — the reference
   semantics);
3. ``localCheckpoint`` per round truncates the growing lineage, the
   same fixpoint discipline as operators/clusters.py and kmeans.

The winning pair is collected to the driver each round — 1 row, the
Lloyd-iteration pattern (kmeans collects k centroids per round): the
rule value must parameterize the next round's plan.

Determinism: ties on pair count break on (left, right) lexicographic —
part of the operator definition, replayed identically by the pure-Python
reference in tests/test_bpe.py (this operator is iterative and not
SQL-expressible, so its verification is the Python cross-check, like
the NB classifier in queries/classify.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_pair_fold(syms: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) into
    one symbol inside a symbol array — a pure-JVM ``aggregate`` fold
    threading (out, carry) so a freshly merged symbol never re-merges
    with the following one in the same pass."""
    empty = F.array().cast("array<string>")
    null_s = F.lit(None).cast("string")
    init = F.struct(empty.alias("out"), null_s.alias("carry"))

    def step(acc, s):
        out = acc.getField("out")
        carry = acc.getField("carry")
        is_merge = carry.isNotNull() & (carry == left) & (s == right)
        return (
            F.when(carry.isNull(), F.struct(out.alias("out"), s.alias("carry")))
            .when(
                is_merge,
                F.struct(
                    F.concat(out, F.array(F.concat(carry, s))).alias("out"),
                    null_s.alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(out, F.array(carry)).alias("out"), s.alias("carry")
                )
            )
        )

    def finish(acc):
        return F.when(
            acc.getField("carry").isNotNull(),
            F.concat(acc.getField("out"), F.array(acc.getField("carry"))),
        ).otherwise(acc.getField("out"))

    return F.aggregate(syms, init, step, finish)


def learn_bpe_merges(words: DataFrame, n_merges: int = 12) -> list[tuple]:
    """Learn ``n_merges`` BPE merge rules from a (word, n) frequency
    table; returns [(merge_rank, left, right, pair_count), ...].

    Stops early when no adjacent pair remains (fully merged vocabulary).
    """
    spark = words.sparkSession
    # lazy checkpoints throughout the loop: each round's argmax collect
    # is the first action over the current vocab frame and materializes
    # its checkpoint as a side effect — eager=True would spend a second
    # job per round (2x the fixed overhead, 2x the passes at scale).
    # Plan truncation (the reason for checkpointing: the fold nests one
    # level per round) happens at wrap time regardless of eagerness.
    vocab = words.select(
        F.expr("filter(split(word, ''), s -> s != '')").alias("syms"),
        F.col("n").cast("long").alias("n"),
    ).localCheckpoint(eager=False)
    rules: list[tuple] = []
    for r in range(1, n_merges + 1):
        pairs = (
            # size guard: sequence(1, stop) descends through index 0 for
            # stop < 1 — single-symbol words contribute no pairs
            vocab.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS l,"
                        "             element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("c"))
        )
        best = pairs.orderBy(F.col("c").desc(), "l", "r").limit(1).collect()
        if not best:
            break
        bl, br, bc = best[0]["l"], best[0]["r"], int(best[0]["c"])
        rules.append((r, bl, br, bc))
        vocab = vocab.select(
            _merge_pair_fold(F.col("syms"), F.lit(bl), F.lit(br)).alias("syms"),
            "n",
        ).localCheckpoint(eager=False)
    return rules


def bpe_merges_df(words: DataFrame, n_merges: int = 12) -> DataFrame:
    """:func:`learn_bpe_merges` as a DataFrame
    (merge_rank, left, right, pair_count)."""
    rules = learn_bpe_merges(words, n_merges)
    return words.sparkSession.createDataFrame(
        rules, "merge_rank long, left string, right string, pair_count long"
    )


def bpe_encode_words(words: DataFrame, rules: list[tuple]) -> DataFrame:
    """Segment each distinct word with a learned merge table — the
    tokenizer *apply* step (Sennrich et al. §3: merges are replayed on
    new text in the order they were learned, each applied greedily
    left-to-right).

    Input: any DataFrame with a ``word`` string column (extra columns
    pass through).  Output adds ``subwords array<string>`` and
    ``n_subwords int``.

    Scale shape: the merge table is tiny (k rules, driver-resident), so
    the plan is k chained pure-JVM ``aggregate`` folds over the symbol
    array — one narrow projection, NO shuffle, NO Python UDF, and the
    caller applies it to the DISTINCT-word table (Zipf: |vocab| ≪
    corpus tokens), not the token stream.  Encoding a 100 TB corpus is
    therefore one vocabulary-sized projection plus one word-key join
    back to the token stream — exactly how production tokenizers batch-
    encode (word-level memoization).
    """
    syms = F.expr("filter(split(word, ''), s -> s != '')")
    for _, left, right, *_ in rules:
        syms = _merge_pair_fold(syms, F.lit(left), F.lit(right))
    return words.withColumn("subwords", syms).withColumn(
        "n_subwords", F.size("subwords")
    )
