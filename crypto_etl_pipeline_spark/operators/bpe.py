"""Byte-pair-encoding merge training over a distributed corpus.

The reference pipeline has no tokenizer surface at all; this is the
missing trainer half of the §2.13 token-counting story (the BPE-ish
regex pre-tokenizer in operators/textops.py is the INFERENCE half).

Scale shape — the standard BPE factorization, distributed where it
matters:

- The corpus reduces to the WORD-FREQUENCY table in one scan + one
  shuffle. Everything after runs on that sufficient statistic: pair
  statistics are weighted by word counts, never by re-reading text.
- Each merge round's pair counting is a distributed aggregation over
  the symbolized vocabulary (posexplode + per-word lead window), and
  only the single argmax pair row reaches the driver per round — the
  same driver-scalar discipline as IVF's k centroids
  (operators/similarity.py).
- Applying a merge is a per-word greedy left-to-right rewrite; it runs
  as an Arrow-batched mapInPandas over the vocabulary table. Python
  cost is bounded by VOCABULARY size, not corpus size — the property
  that makes single-node BPE trainers viable is exactly what bounds
  the slow path here.
- The vocabulary state is lazily localCheckpointed per round, the
  operators/cluster.py lineage discipline for driver-looped iteration.

Determinism: argmax ties break on (count desc, left asc, right asc);
greedy application consumes overlapping occurrences left-to-right
("aaaa" with merge (a,a) -> ["aa","aa"]), matching the de-facto
standard (Sennrich et al., ACL'16) reference implementation. The
iterative rewrite is not SQL-expressible, so the registry entry is
rows-only; tests/test_round4_ops.py pins the output against an
independent pure-Python trainer on adversarial fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _pair_counts(state: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over (word, cnt, syms) state.

    posexplode to (word, pos, sym) rows, pair via a lead window
    partitioned by word — flat columns and a keyed shuffle, no
    higher-order-function lambdas for Catalyst to inline (see
    .claude/skills/verify HOF re-evaluation hazard).
    """
    pos = state.select(
        "word", "cnt", F.posexplode("syms").alias("pos", "left_sym")
    )
    w = Window.partitionBy("word").orderBy("pos")
    return (
        pos.withColumn("right_sym", F.lead("left_sym").over(w))
        .where(F.col("right_sym").isNotNull())
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _apply_merge(state: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of (left, right) in every word's
    symbol list — Arrow-batched, vocabulary-sized input."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                merged = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append(merged)
            yield pd.DataFrame(
                {"word": pdf["word"], "cnt": pdf["cnt"], "syms": out}
            )

    return state.mapInPandas(run, schema="word string, cnt long, syms array<string>")


def bpe_train_merges(words: DataFrame, n_merges: int) -> DataFrame:
    """Train ``n_merges`` BPE merges from a (word, cnt) frequency table.

    Returns one row per learned merge:
    (merge_rank, left_sym, right_sym, merged_sym, pair_count) — the
    trained artifact a tokenizer loads, in learned order. Stops early
    if the vocabulary runs out of adjacent pairs.
    """
    spark = words.sparkSession
    state = words.select(
        "word", F.col("cnt").cast("long").alias("cnt"), F.split("word", "").alias("syms")
    ).localCheckpoint(eager=False)
    merges = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(state)
            .orderBy(F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, pc = top[0]["left_sym"], top[0]["right_sym"], top[0]["pair_count"]
        merges.append((rank, left, right, left + right, int(pc)))
        state = _apply_merge(state, left, right).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, merged_sym string, pair_count long",
    )
