"""Behavioral-analytics tier (round 11): RFM segmentation, Markov
event-transition matrix, day-of-week seasonal decomposition, and
brand-basket association rules. These extend the reference's
audit/metrics reporting surface (``pipeline_architecture.py:330-368`` —
grouped counts over the run log) to the customer/event analytics a
warehouse user runs on the same lake tables.

Scale shapes:

- RFM scores come from the winsorized-stats histogram idiom
  (training_plans.py): quartile thresholds are found on a per-VALUE
  frequency histogram, so the only ordered window runs over the metric
  DOMAIN (days / order counts / spend cents — bounded by the value
  range, not the customer count); the 3-row threshold table broadcasts
  back. The oracle uses the rank() formulation, which is provably
  equivalent: ``v > t_k`` where ``t_k = min v with cum(v) >= K`` holds
  iff ``cnt_less(v) >= K`` iff ``rank(v) - 1 >= K``.
- Transitions: one window shuffle on ``user_id`` (per-key state is one
  row), then a domain-bounded (|event types|²) aggregate.
- Seasonal profile: the dense daily series is tiny (calendar domain);
  all windows run over it, never over raw events.
- Association rules: the basket self-join is keyed on the customer, so
  the pair expansion is bounded by |brands|² per customer and the output
  by |brands|² total — never an all-pairs join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.binning import quartile_score, quartile_thresholds
from ..sources import load_table
from .registry import query

# --------------------------------------------------------------------------
# RFM customer segmentation.
#
# Recency/frequency/monetary per customer, each scored 1-4 by strict-rank
# quartile binning: score = 1 + [cnt_less >= ceil(n/4)] + [cnt_less >=
# ceil(n/2)] + [cnt_less >= ceil(3n/4)], where cnt_less counts customers
# with a STRICTLY smaller metric (higher = better; recency is negated).
# Ties share a score, so the binning is deterministic without a
# tiebreak column — and it is computable from the value histogram alone.
# --------------------------------------------------------------------------

@query(
    "rfm_customer_segments",
    oracle="""
WITH per AS (
  SELECT o_custkey,
         date_diff('day', max(CAST(o_orderdate AS DATE)),
                   (SELECT max(CAST(o_orderdate AS DATE)) FROM orders))
           AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT *,
         rank() OVER (ORDER BY -recency_days) - 1 AS lr,
         rank() OVER (ORDER BY frequency) - 1 AS lf,
         rank() OVER (ORDER BY monetary_cents) - 1 AS lm,
         count(*) OVER () AS n
  FROM per
)
SELECT o_custkey, recency_days, frequency, monetary_cents,
       1 + CAST(lr >= (n + 3) // 4 AS BIGINT) + CAST(lr >= (n + 1) // 2 AS BIGINT)
         + CAST(lr >= (3 * n + 3) // 4 AS BIGINT) AS r_score,
       1 + CAST(lf >= (n + 3) // 4 AS BIGINT) + CAST(lf >= (n + 1) // 2 AS BIGINT)
         + CAST(lf >= (3 * n + 3) // 4 AS BIGINT) AS f_score,
       1 + CAST(lm >= (n + 3) // 4 AS BIGINT) + CAST(lm >= (n + 1) // 2 AS BIGINT)
         + CAST(lm >= (3 * n + 3) // 4 AS BIGINT) AS m_score
FROM ranked
ORDER BY o_custkey
""",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile scores per customer. The Spark side never ranks the
    customer relation: for each metric it builds a (value, freq)
    histogram, finds the 3 quartile thresholds with a window over the
    value DOMAIN, and broadcasts them back — score = 1 + Σ[v > t_k],
    equivalent to the oracle's rank() binning (see module docstring)."""
    o = load_table(spark, sf_dir, "orders")
    # One scan of the fact: the per-customer rollup is consumed by the
    # anchor, the three metric histograms, AND the scored output below —
    # localCheckpoint it so the branches read the (|customers|-sized)
    # materialization instead of re-aggregating orders per branch.
    per0 = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("monetary_cents"),
        )
        .localCheckpoint(eager=True)
    )
    anchor = per0.agg(F.max("last_day").alias("anchor_day"))
    per = per0.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("anchor_day", "last_day").alias("recency_days"),
        "frequency",
        "monetary_cents",
    )

    scored = (
        # recency (day ages) and frequency (order counts) are
        # small-domain by construction — the hint skips their range
        # probes; monetary_cents is near-unique and wide, so it probes
        # and takes the two-level path.
        per.crossJoin(
            F.broadcast(
                quartile_thresholds(
                    per, -F.col("recency_days"), "r", small_domain=True
                )
            )
        )
        .crossJoin(
            F.broadcast(
                quartile_thresholds(per, F.col("frequency"), "f", small_domain=True)
            )
        )
        .crossJoin(
            F.broadcast(quartile_thresholds(per, F.col("monetary_cents"), "m"))
        )
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        quartile_score(-F.col("recency_days"), "r").alias("r_score"),
        quartile_score(F.col("frequency"), "f").alias("f_score"),
        quartile_score(F.col("monetary_cents"), "m").alias("m_score"),
    ).orderBy("o_custkey")


# --------------------------------------------------------------------------
# Markov event-transition matrix: per-user consecutive event-type pairs
# (ordered by ts, tiebroken by the unique event_id), counted and
# normalized into a row-stochastic transition probability matrix.
# --------------------------------------------------------------------------


@query(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT event_type AS src_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst_type
  FROM events
),
pairs AS (
  SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n_transitions
  FROM seq WHERE dst_type IS NOT NULL
  GROUP BY src_type, dst_type
)
SELECT src_type, dst_type, n_transitions,
       round(n_transitions / (sum(n_transitions) OVER
             (PARTITION BY src_type)), 4) AS p_q
FROM pairs
ORDER BY src_type, dst_type
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|types|² transition counts + probabilities. One shuffle (the
    per-user window); the normalizing window runs over the tiny
    transition matrix, not over events."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).filter(F.col("dst_type").isNotNull())
    pairs = seq.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_src = Window.partitionBy("src_type")
    return pairs.select(
        "src_type",
        "dst_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(w_src), 4
        ).alias("p_q"),
    ).orderBy("src_type", "dst_type")


# --------------------------------------------------------------------------
# Day-of-week seasonal decomposition of daily purchase revenue:
# total = dow-mean (the seasonal component) + residual. Integer cents
# end-to-end; the dow mean FLOOR-divides on both engines — Spark's
# `div` truncates toward zero, so the Spark side computes floor
# division explicitly as (s - pmod(s, n)) div n (pmod is non-negative),
# which equals DuckDB's `//` for any sign of the day totals (refund-
# heavy days with negative sums included), not just the current
# all-positive fixtures.
# --------------------------------------------------------------------------


@query(
    "seasonal_dow_profile",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY CAST(ts AS DATE)
),
prof AS (
  SELECT day, isodow(day) AS iso_dow, total_cents,
         CAST(sum(total_cents) OVER (PARTITION BY isodow(day))
              // count(*) OVER (PARTITION BY isodow(day)) AS BIGINT)
           AS dow_mean_cents
  FROM daily
)
SELECT day, CAST(iso_dow AS BIGINT) AS iso_dow, total_cents, dow_mean_cents,
       total_cents - dow_mean_cents AS resid_cents
FROM prof
ORDER BY day
""",
)
def seasonal_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive decomposition over the dense daily series — every
    window runs over the calendar domain (one row per day), so the plan
    is one shuffle to daily grain regardless of event volume."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("total_cents")
        )
    )
    # Spark weekday(): Monday=0 … Sunday=6 → ISO dow = weekday + 1.
    daily = daily.withColumn(
        "iso_dow", (F.weekday("day") + F.lit(1)).cast("long")
    )
    w_dow = Window.partitionBy("iso_dow")
    prof = daily.select(
        "day",
        "iso_dow",
        "total_cents",
        # exact integer FLOOR division (matches DuckDB //): subtract the
        # non-negative pmod remainder, then the truncating div is exact
        F.expr(
            "(sum(total_cents) OVER (PARTITION BY iso_dow)"
            " - pmod(sum(total_cents) OVER (PARTITION BY iso_dow),"
            "        count(*) OVER (PARTITION BY iso_dow)))"
            " div count(*) OVER (PARTITION BY iso_dow)"
        ).alias("dow_mean_cents"),
    )
    return prof.select(
        "day",
        "iso_dow",
        "total_cents",
        "dow_mean_cents",
        (F.col("total_cents") - F.col("dow_mean_cents")).alias("resid_cents"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Association rules over brand baskets: basket = the set of part brands
# a customer has ever ordered; rule quality = support / confidence /
# lift per unordered brand pair. The pair expansion is a self-join on
# the customer key (≤ |brands|² rows per customer), never an all-pairs
# join across customers.
# --------------------------------------------------------------------------

_MIN_PAIR_USERS = 5


@query(
    "assoc_rules_brand_lift",
    oracle=f"""
WITH cb AS (
  SELECT DISTINCT o.o_custkey AS c, p.p_brand AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT CAST(count(DISTINCT c) AS BIGINT) AS n_users FROM cb),
sup AS (SELECT b, CAST(count(*) AS BIGINT) AS n_b FROM cb GROUP BY b),
pair AS (
  SELECT x.b AS brand_a, y.b AS brand_b, CAST(count(*) AS BIGINT) AS n_both
  FROM cb x JOIN cb y ON x.c = y.c AND x.b < y.b
  GROUP BY x.b, y.b
)
SELECT brand_a, brand_b, n_both, sa.n_b AS n_a, sb.n_b AS n_b,
       round(n_both / n.n_users, 4) AS support_q,
       round(n_both / sa.n_b, 4) AS conf_q,
       round((n_both * n.n_users) / (sa.n_b * CAST(sb.n_b AS DOUBLE)), 4)
         AS lift_q
FROM pair
JOIN sup sa ON sa.b = brand_a
JOIN sup sb ON sb.b = brand_b
CROSS JOIN n
WHERE n_both >= {_MIN_PAIR_USERS}
ORDER BY brand_a, brand_b
""",
)
def assoc_rules_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support/confidence/lift for brand pairs co-purchased by the same
    customer. Per-brand supports and the user count broadcast back onto
    the |brands|²-bounded pair table."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # One scan of the fact joins: the (customer, brand) set feeds the
    # user count, the per-brand supports, and both sides of the pair
    # self-join — checkpoint it rather than re-running li⋈o⋈p per branch.
    cb = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("o_custkey").alias("c"), F.col("p_brand").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_users = cb.agg(F.count_distinct("c").alias("n_users"))
    sup = cb.groupBy("b").agg(F.count(F.lit(1)).alias("n_b"))
    x = cb.alias("x")
    y = cb.alias("y")
    pair = (
        x.join(y, (F.col("x.c") == F.col("y.c")) & (F.col("x.b") < F.col("y.b")))
        .groupBy(F.col("x.b").alias("brand_a"), F.col("y.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= _MIN_PAIR_USERS)
    )
    sa = F.broadcast(sup.select(F.col("b").alias("brand_a"), F.col("n_b").alias("n_a")))
    sb = F.broadcast(sup.select(F.col("b").alias("brand_b"), F.col("n_b").alias("n_b")))
    return (
        pair.join(sa, "brand_a")
        .join(sb, "brand_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(F.col("n_both") / F.col("n_users"), 4).alias("support_q"),
            F.round(F.col("n_both") / F.col("n_a"), 4).alias("conf_q"),
            F.round(
                (F.col("n_both") * F.col("n_users"))
                / (F.col("n_a") * F.col("n_b").cast("double")),
                4,
            ).alias("lift_q"),
        )
        .orderBy("brand_a", "brand_b")
    )
