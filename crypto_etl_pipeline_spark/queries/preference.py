"""Preference-aggregation queries (r13): Copeland scores and
Bradley-Terry strengths from pairwise comparisons.

The RLHF-data operator family: aggregating noisy pairwise preferences
("A beat B in this comparison") into a per-item ranking is how
preference datasets are audited (annotator consistency, cyclic
majorities) and how reward-model targets are derived (Bradley-Terry
maximum-likelihood strengths — the model BT reward heads fit).

Instantiated here on the one pairwise-comparison source the driver
tables carry: day-aligned head-to-heads of instrument daily returns
(market._daily_returns_df — instrument i "wins" day d against j if
its log return is higher). The comparison matrix is built by ONE
fact-scale aggregation (bars -> day-aligned pair outcomes -> integer
win counts per ordered pair); everything after runs on the
instruments^2-row matrix — dimension-sized at ANY corpus scale, the
same aggregate-first discipline as the indicator family.

Engine parity: win counts are exact integers (comparisons of
bit-identical picked-close returns); Copeland is pure integer
arithmetic; Bradley-Terry runs Hunter's (2004) MM update for a FIXED
3 iterations (unrolled CTEs in the oracle, the pagerank precedent)
and normalizes by the alphabetically-first item's strength — a single
division, no cross-item float sum — before 6-decimal rounding.

Reference: no preference surface in the reference pipeline —
north-star extension (training-data curation beyond the reference's
own operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.queries.base import register
from crypto_etl_pipeline_spark.queries.market import _DAILY_CTE, _RETS_CTE, _daily_returns_df

#: DuckDB CTE `comp(i, j, w, n)` over both ordered pairs: w = days i
#: out-returned j, n = decisive days (ties excluded). Requires
#: _DAILY_CTE + _RETS_CTE in scope. MATERIALIZED: referenced by every
#: MM iteration and the win totals.
_COMP_CTE = """
    comp AS MATERIALIZED (
      SELECT a.event_type AS i, b.event_type AS j,
             sum(CASE WHEN a.r > b.r THEN 1 ELSE 0 END)  AS w,
             sum(CASE WHEN a.r <> b.r THEN 1 ELSE 0 END) AS n
      FROM rets a JOIN rets b ON a.day = b.day AND a.event_type <> b.event_type
      GROUP BY 1, 2
    )
"""


def _comparisons_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :data:`_COMP_CTE`, lazily checkpointed: the MM
    iterations and the win totals all branch from this frame, and a
    checkpoint stops each branch re-running the bar aggregation
    (the shared-Aggregate recompute trap)."""
    rets = _daily_returns_df(spark, sf_dir)
    a = rets.select(F.col("event_type").alias("i"), "day", F.col("r").alias("ra"))
    b = rets.select(F.col("event_type").alias("j"), "day", F.col("r").alias("rb"))
    comp = (
        a.join(b, (a.day == b.day) & (F.col("i") != F.col("j")))
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("ra") > F.col("rb")).cast("long")).alias("w"),
            F.sum((F.col("ra") != F.col("rb")).cast("long")).alias("n"),
        )
    )
    return comp.localCheckpoint(eager=False)


@register(
    "pref_copeland_scores",
    oracle=f"""
    WITH {_DAILY_CTE},
    {_RETS_CTE},
    {_COMP_CTE}
    SELECT i AS event_type,
           count(*)::BIGINT AS n_opponents,
           sum(CASE WHEN w > n - w THEN 1 ELSE 0 END)::BIGINT AS pair_wins,
           sum(CASE WHEN w < n - w THEN 1 ELSE 0 END)::BIGINT AS pair_losses,
           (sum(CASE WHEN w > n - w THEN 1 ELSE 0 END)
            - sum(CASE WHEN w < n - w THEN 1 ELSE 0 END))::BIGINT AS copeland
    FROM comp GROUP BY i
    """,
    description="Copeland preference scores: majority pairwise wins minus losses per item (integer-exact)",
    tags=("preference", "stats", "agg", "annotation"),
)
def pref_copeland_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copeland's method: item i scores +1 per opponent it beats on a
    majority of decisive comparisons, -1 per opponent that beats it
    (majority ties score 0) — the tournament ranking that is cheap,
    integer-exact, and Condorcet-consistent. One aggregation over the
    ordered-pair matrix; a cyclic majority (A>B>C>A) lands everyone
    at 0, which is the audit signal preference datasets use to detect
    intransitive labeling."""
    comp = _comparisons_df(spark, sf_dir)
    beats = (F.col("w") > F.col("n") - F.col("w")).cast("long")
    beaten = (F.col("w") < F.col("n") - F.col("w")).cast("long")
    return comp.groupBy(F.col("i").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_opponents"),
        F.sum(beats).alias("pair_wins"),
        F.sum(beaten).alias("pair_losses"),
        (F.sum(beats) - F.sum(beaten)).alias("copeland"),
    )


_BT_ITERS = 3


@register(
    "pref_bradley_terry",
    oracle=f"""
    WITH {_DAILY_CTE},
    {_RETS_CTE},
    {_COMP_CTE},
    wins AS MATERIALIZED (SELECT i, sum(w) AS tot, sum(n) AS dec FROM comp GROUP BY i),
    it0 AS MATERIALIZED (SELECT i, 1.0 AS p FROM wins),
    """ + ",\n    ".join(
        f"""it{k} AS MATERIALIZED (
      SELECT c.i, w.tot / sum(c.n / (pi.p + pj.p)) AS p
      FROM comp c
      JOIN it{k - 1} pi ON pi.i = c.i
      JOIN it{k - 1} pj ON pj.i = c.j
      JOIN wins w ON w.i = c.i
      GROUP BY c.i, w.tot
    )"""
        for k in range(1, _BT_ITERS + 1)
    ) + f"""
    SELECT t.i AS event_type,
           w.tot::BIGINT AS total_wins,
           w.dec::BIGINT AS n_decisive,
           round(t.p / a.p, 6) AS strength
    FROM it{_BT_ITERS} t
    JOIN wins w ON w.i = t.i
    JOIN (SELECT p FROM it{_BT_ITERS} WHERE i = (SELECT min(i) FROM it{_BT_ITERS})) a ON true
    """,
    description=f"Bradley-Terry preference strengths: {_BT_ITERS} MM iterations over pairwise win counts, anchor-normalized",
    tags=("preference", "stats", "iterative", "annotation"),
)
def pref_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry maximum-likelihood item strengths via Hunter's
    MM update p_i <- W_i / sum_j n_ij / (p_i + p_j), run a FIXED
    3 iterations (_BT_ITERS) from p = 1 so the DuckDB twin unrolls
    exactly (pagerank precedent), then normalized by the
    alphabetically-first item's strength — one division instead of a
    cross-item float sum, keeping every float op fixed-shape. The
    iteration state is items-sized; each step is a broadcast join
    against the checkpointed integer comparison matrix, so at 100 TB
    only the matrix build touches the corpus."""
    comp = _comparisons_df(spark, sf_dir)
    wins = comp.groupBy("i").agg(F.sum("w").alias("tot"), F.sum("n").alias("dec"))
    wins = wins.localCheckpoint(eager=False)
    p = wins.select("i", F.lit(1.0).alias("p"))
    for _ in range(_BT_ITERS):
        pi = p.select(F.col("i").alias("_ii"), F.col("p").alias("_pi"))
        pj = p.select(F.col("i").alias("_ji"), F.col("p").alias("_pj"))
        p = (
            comp.join(pi, comp.i == F.col("_ii"))
            .join(pj, comp.j == F.col("_ji"))
            .groupBy("i")
            .agg(F.sum(F.col("n") / (F.col("_pi") + F.col("_pj"))).alias("den"))
            .join(wins, "i")
            .select("i", (F.col("tot") / F.col("den")).alias("p"))
            .localCheckpoint(eager=False)
        )
    anchor = p.orderBy("i").limit(1).select(F.col("p").alias("_anchor"))
    return (
        p.join(wins, "i")
        .crossJoin(F.broadcast(anchor))
        .select(
            F.col("i").alias("event_type"),
            F.col("tot").alias("total_wins"),
            F.col("dec").alias("n_decisive"),
            F.round(F.col("p") / F.col("_anchor"), 6).alias("strength"),
        )
    )
