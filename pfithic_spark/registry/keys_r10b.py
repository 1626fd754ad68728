"""SURVEY.md §2.24 — round-10 second batch: stratified/sequential
statistics and heavy-tail analytics.

The inference layer §2.23's maintenance surfaces report into:
stratified association (CMH), heavy-tail diagnostics (Hill tail
index, Gumbel block maxima), discriminative vocabulary (Monroe
weighted log-odds), chain analytics (stationary distribution,
conditional-entropy predictability), and event-rate testing.

Same house rules as keys_r10 (FIXTURES.md §8): integer-first,
ln/transcendental round(9)-before-use, per-term round → DECIMAL sums
internal only, full DuckDB oracle per key, planted closed-form test
per key, plan gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .. import llmops  # noqa: F401
from .. import windows as win  # noqa: F401
from ..io import epoch_us, load_table  # noqa: F401
from ._core import register  # noqa: F401

# ========================================================================
# q_cmh_test — Cochran–Mantel–Haenszel stratified 2×2 association
# ========================================================================

#: chi²(0.95, df=1) — frozen pure-math literal (rule 22).
_CMH_CRIT = 3.841458820694124


@register(
    "q_cmh_test",
    oracle=f"""
WITH o AS (
  SELECT c_mktsegment AS seg,
         CASE WHEN (((o_custkey % 2654435761) * 2654435761)
                    % 4294967296) % 2 = 0 THEN 1 ELSE 0 END AS x,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
),
k AS (
  SELECT seg,
         CAST(SUM(x * y) AS BIGINT) AS a,
         CAST(SUM(x * (1 - y)) AS BIGINT) AS b,
         CAST(SUM((1 - x) * y) AS BIGINT) AS c,
         CAST(SUM((1 - x) * (1 - y)) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM o GROUP BY seg HAVING COUNT(*) > 1
),
t AS (
  SELECT a, n,
         CAST(ROUND(CAST(a AS DOUBLE)
               - CAST((a + b) * (a + c) AS DOUBLE) / CAST(n AS DOUBLE),
             9) AS DECIMAL(28,9)) AS dev,
         CAST(ROUND(
           (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
            * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
              * CAST(n - 1 AS DOUBLE)),
         9) AS DECIMAL(28,9)) AS v,
         CAST(ROUND(CAST(a * d AS DOUBLE) / CAST(n AS DOUBLE), 9)
              AS DECIMAL(28,9)) AS adn,
         CAST(ROUND(CAST(b * c AS DOUBLE) / CAST(n AS DOUBLE), 9)
              AS DECIMAL(28,9)) AS bcn
  FROM k
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(a) AS BIGINT) AS sum_a,
         CAST(SUM(dev) AS DOUBLE) AS sdev,
         CAST(SUM(v) AS DOUBLE) AS sv,
         CAST(SUM(adn) AS DOUBLE) AS sad,
         CAST(SUM(bcn) AS DOUBLE) AS sbc
  FROM t
)
SELECT n_strata, sum_a,
       CASE WHEN sv = 0 THEN NULL ELSE
         (ABS(sdev) - 0.5) * (ABS(sdev) - 0.5) / sv END AS chi2,
       CASE WHEN sbc = 0 THEN NULL ELSE sad / sbc END AS or_mh,
       CASE WHEN sv = 0 THEN NULL ELSE
         (ABS(sdev) - 0.5) * (ABS(sdev) - 0.5) / sv > {_CMH_CRIT!r}
       END AS significant
FROM s
""",
)
def q_cmh_test(spark, sf_dir):
    """COCHRAN–MANTEL–HAENSZEL stratified 2×2 association test:
    does the hash-split exposure predict urgency AFTER controlling
    for customer segment — the confounder-adjusted sibling of
    q_chi_square (which Simpson's paradox can invert; CMH pools
    per-stratum evidence instead of marginalizing it away), plus the
    Mantel–Haenszel common odds ratio.  Continuity-corrected
    χ² = (|Σ(a_k − E_k)| − ½)² / ΣV_k, OR_MH = Σ(a_k d_k/n_k) /
    Σ(b_k c_k/n_k); strata of size ≤ 1 carry no information and are
    excluded by contract (V's n−1 denominator).

    100 TB shape: one fact join attaches the stratum, one
    map-side-combinable (stratum)-grain census, then everything
    rides the bounded |strata|-row table.  Determinism: cell counts
    exact int64; per-stratum E/V/OR terms are fixed-order double
    chains on hardware-exact casts (the four-margin product would
    overflow int64, §8.21 — doubles with round(9) → DECIMAL(28,9)
    sums make the cross-stratum fold engine-identical); NULL when
    ΣV = 0 or Σb·c = 0 (§8.17)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        (llmops.knuth_hash("o_custkey") % 2 == 0)
        .cast("long")
        .alias("x"),
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("y"),
    )
    k = (
        base.groupBy("seg")
        .agg(
            F.sum(F.col("x") * F.col("y")).cast("long").alias("a"),
            F.sum(F.col("x") * (1 - F.col("y"))).cast("long").alias("b"),
            F.sum((1 - F.col("x")) * F.col("y")).cast("long").alias("c"),
            F.sum((1 - F.col("x")) * (1 - F.col("y")))
            .cast("long")
            .alias("d"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .filter(F.col("n") > 1)
    )
    nD = F.col("n").cast("double")
    dev = F.round(
        F.col("a").cast("double")
        - ((F.col("a") + F.col("b")) * (F.col("a") + F.col("c"))).cast(
            "double"
        )
        / nD,
        9,
    ).cast("decimal(28,9)")
    v = F.round(
        (
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("c") + F.col("d")).cast("double")
            * (F.col("a") + F.col("c")).cast("double")
            * (F.col("b") + F.col("d")).cast("double")
        )
        / (nD * nD * (F.col("n") - 1).cast("double")),
        9,
    ).cast("decimal(28,9)")
    adn = F.round(
        (F.col("a") * F.col("d")).cast("double") / nD, 9
    ).cast("decimal(28,9)")
    bcn = F.round(
        (F.col("b") * F.col("c")).cast("double") / nD, 9
    ).cast("decimal(28,9)")
    s = k.select(
        "a", dev.alias("dev"), v.alias("v"), adn.alias("adn"),
        bcn.alias("bcn"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum("dev").cast("double").alias("sdev"),
        F.sum("v").cast("double").alias("sv"),
        F.sum("adn").cast("double").alias("sad"),
        F.sum("bcn").cast("double").alias("sbc"),
    )
    chi2 = (
        (F.abs(F.col("sdev")) - 0.5)
        * (F.abs(F.col("sdev")) - 0.5)
        / F.col("sv")
    )
    return s.select(
        "n_strata",
        "sum_a",
        F.when(F.col("sv") == 0, F.lit(None).cast("double"))
        .otherwise(chi2)
        .alias("chi2"),
        F.when(F.col("sbc") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("sad") / F.col("sbc"))
        .alias("or_mh"),
        F.when(F.col("sv") == 0, F.lit(None).cast("boolean"))
        .otherwise(chi2 > _CMH_CRIT)
        .alias("significant"),
    )


# ========================================================================
# q_hill_tail_index — Hill estimator of the price tail exponent
# ========================================================================

#: Tail order statistics used by the estimator (top k+1; the
#: (k+1)-th largest is the threshold).
_HILL_K = 1000


@register(
    "q_hill_tail_index",
    oracle=f"""
WITH v AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         o_orderkey
  FROM orders
),
r AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_orderkey) AS rn
  FROM v
),
top AS (SELECT cents, rn FROM r WHERE rn <= {_HILL_K + 1}),
xm AS (
  SELECT MIN(cents) AS xmin, CAST(MAX(rn) AS BIGINT) AS cnt FROM top
),
terms AS (
  SELECT CAST(ROUND(LN(CAST(t.cents AS DOUBLE)
                       / CAST(x.xmin AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS lr,
         x.cnt
  FROM top t CROSS JOIN xm x WHERE t.rn < x.cnt
),
s AS (
  SELECT CAST(MAX(cnt) - 1 AS BIGINT) AS k_eff,
         CAST(SUM(lr) AS DOUBLE) AS slr
  FROM terms
)
SELECT s.k_eff, x.xmin AS xmin_cents,
       CASE WHEN s.k_eff IS NULL OR s.k_eff = 0 THEN NULL
            ELSE s.slr / CAST(s.k_eff AS DOUBLE) END AS gamma_hill,
       CASE WHEN s.k_eff IS NULL OR s.k_eff = 0 OR s.slr = 0
            THEN NULL
            ELSE CAST(s.k_eff AS DOUBLE) / s.slr END AS alpha_hill
FROM s CROSS JOIN xm x
""",
)
def q_hill_tail_index(spark, sf_dir):
    """HILL ESTIMATOR of the heavy-tail exponent of order values:
    γ̂ = (1/k) Σᵢ₌₁..k ln(X₍ᵢ₎/X₍ₖ₊₁₎) over the top-k order
    statistics, α̂ = 1/γ̂ — the tail-heaviness diagnostic behind
    capacity planning and outlier budgets (α ≤ 2 means infinite
    variance: means/CLT-based monitors are lying), complementing
    q_zipf_fit (frequency tail) with the VALUE tail.

    100 TB shape: the ONLY data-grain op is a TakeOrderedAndProject
    of k+1 = 1001 rows (per-partition heaps — never a global sort);
    the estimator runs on the bounded survivor set.  Determinism:
    the top set is cut under the total (cents DESC, orderkey) order;
    each log-ratio is ln of one exact-int division, round(9) →
    DECIMAL sum (q_entropy discipline), ONE final division; fewer
    than 2 distinct ranks → NULL (§8.17); ties with the threshold
    contribute exactly 0."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .alias("cents"),
        "o_orderkey",
    )
    top = (
        v.orderBy(F.col("cents").desc(), "o_orderkey")
        .limit(_HILL_K + 1)
        .select(
            "cents",
            F.row_number()
            .over(Window.orderBy(F.col("cents").desc(), "o_orderkey"))
            .alias("rn"),
        )
    )
    xm = top.agg(
        F.min("cents").alias("xmin"),
        F.max("rn").cast("long").alias("cnt"),
    )
    terms = top.crossJoin(F.broadcast(xm)).filter(
        F.col("rn") < F.col("cnt")
    ).select(
        "cnt",
        F.round(
            F.log(
                F.col("cents").cast("double")
                / F.col("xmin").cast("double")
            ),
            9,
        )
        .cast("decimal(28,9)")
        .alias("lr"),
    )
    s = terms.agg(
        (F.max("cnt") - 1).cast("long").alias("k_eff"),
        F.sum("lr").cast("double").alias("slr"),
    )
    return s.crossJoin(F.broadcast(xm.select(F.col("xmin").alias("xmin_cents")))).select(
        "k_eff",
        "xmin_cents",
        F.when(
            F.col("k_eff").isNull() | (F.col("k_eff") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.col("slr") / F.col("k_eff").cast("double"))
        .alias("gamma_hill"),
        F.when(
            F.col("k_eff").isNull()
            | (F.col("k_eff") == 0)
            | (F.col("slr") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.col("k_eff").cast("double") / F.col("slr"))
        .alias("alpha_hill"),
    )


# ========================================================================
# q_log_odds_tokens — Monroe weighted log-odds discriminative tokens
# ========================================================================

#: Dirichlet prior mass (Monroe et al. 2008 "Fightin' Words") and
#: the corpus-frequency hygiene floor.
_LOGODDS_ALPHA0 = 1000.0
_LOGODDS_MIN_CF = 5
_LOGODDS_TOPK = 25


@register(
    "q_log_odds_tokens",
    oracle=f"""
WITH tf AS (
  SELECT w, doc_id % 2 AS half, CAST(COUNT(*) AS BIGINT) AS y
  FROM (
    SELECT doc_id,
           UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS w
    FROM documents
  ) GROUP BY w, half
),
p AS (
  SELECT w,
         CAST(SUM(CASE WHEN half = 0 THEN y ELSE 0 END) AS BIGINT)
           AS ya,
         CAST(SUM(CASE WHEN half = 1 THEN y ELSE 0 END) AS BIGINT)
           AS yb
  FROM tf GROUP BY w
),
m AS (
  SELECT w, ya, yb,
         CAST(SUM(ya) OVER () AS BIGINT) AS na,
         CAST(SUM(yb) OVER () AS BIGINT) AS nb,
         CAST(SUM(ya + yb) OVER () AS BIGINT) AS ntot
  FROM p WHERE ya + yb >= {_LOGODDS_MIN_CF}
),
z AS (
  SELECT w, ya, yb,
         ROUND(
           (ROUND(LN((CAST(ya AS DOUBLE)
                      + {_LOGODDS_ALPHA0!r}
                        * CAST(ya + yb AS DOUBLE)
                        / CAST(ntot AS DOUBLE))
                     / (CAST(na AS DOUBLE) + {_LOGODDS_ALPHA0!r}
                        - CAST(ya AS DOUBLE)
                        - {_LOGODDS_ALPHA0!r}
                          * CAST(ya + yb AS DOUBLE)
                          / CAST(ntot AS DOUBLE))), 9)
            - ROUND(LN((CAST(yb AS DOUBLE)
                      + {_LOGODDS_ALPHA0!r}
                        * CAST(ya + yb AS DOUBLE)
                        / CAST(ntot AS DOUBLE))
                     / (CAST(nb AS DOUBLE) + {_LOGODDS_ALPHA0!r}
                        - CAST(yb AS DOUBLE)
                        - {_LOGODDS_ALPHA0!r}
                          * CAST(ya + yb AS DOUBLE)
                          / CAST(ntot AS DOUBLE))), 9))
           / SQRT(1.0 / (CAST(ya AS DOUBLE)
                         + {_LOGODDS_ALPHA0!r}
                           * CAST(ya + yb AS DOUBLE)
                           / CAST(ntot AS DOUBLE))
                  + 1.0 / (CAST(yb AS DOUBLE)
                           + {_LOGODDS_ALPHA0!r}
                             * CAST(ya + yb AS DOUBLE)
                             / CAST(ntot AS DOUBLE))),
         6) AS z6
  FROM m
)
SELECT w AS token, ya AS tf_a, yb AS tf_b, z6 AS z_score
FROM z
ORDER BY z6 DESC, token
LIMIT {_LOGODDS_TOPK}
""",
)
def q_log_odds_tokens(spark, sf_dir):
    """MONROE WEIGHTED LOG-ODDS (Fightin' Words, informative
    Dirichlet prior): which tokens most distinguish corpus half A
    from half B, shrunk toward the background frequency so rare
    flukes don't top the list — the principled replacement for raw
    log-odds/tf-idf diffs when comparing corpus slices, beside
    q_token_chi2's one-vs-rest census.  δ_w = ln-odds(A) −
    ln-odds(B) with prior α_w = α₀·f_w(background); z = δ/√var,
    var ≈ 1/(y_aw+α_w) + 1/(y_bw+α_w); top-25 A-leaning tokens.

    100 TB shape: ONE token-stream aggregate to (token, half) grain
    (term frequency — inverted-index shape), vocab-grain pivot,
    DERIVED marginals via windows over the bounded vocab grain.
    Determinism: counts exact int64; each z is a per-row fixed-order
    double chain (prior/odds divisions of hardware-exact casts, the
    two lns round(9) BEFORE subtracting, IEEE sqrt), round(6)
    before the (z DESC, token) rank (§8.16); the df ≥ 5 floor cuts
    noise rows (§8.17 as filtering — a 1-occurrence token carries no
    discriminative evidence)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(
            (F.col("doc_id") % 2).alias("half"),
            F.explode(llmops.tokens_col("text")).alias("w"),
        )
        .groupBy("w", "half")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    p = tf.groupBy("w").agg(
        F.sum(F.when(F.col("half") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("ya"),
        F.sum(F.when(F.col("half") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("yb"),
    )
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = p.filter(
        F.col("ya") + F.col("yb") >= _LOGODDS_MIN_CF
    ).select(
        "w",
        "ya",
        "yb",
        F.sum("ya").over(wall).cast("long").alias("na"),
        F.sum("yb").over(wall).cast("long").alias("nb"),
        F.sum(F.col("ya") + F.col("yb"))
        .over(wall)
        .cast("long")
        .alias("ntot"),
    )
    aw = F.lit(_LOGODDS_ALPHA0) * (
        (F.col("ya") + F.col("yb")).cast("double")
        / F.col("ntot").cast("double")
    )
    la = F.round(
        F.log(
            (F.col("ya").cast("double") + aw)
            / (
                F.col("na").cast("double")
                + F.lit(_LOGODDS_ALPHA0)
                - F.col("ya").cast("double")
                - aw
            )
        ),
        9,
    )
    lb = F.round(
        F.log(
            (F.col("yb").cast("double") + aw)
            / (
                F.col("nb").cast("double")
                + F.lit(_LOGODDS_ALPHA0)
                - F.col("yb").cast("double")
                - aw
            )
        ),
        9,
    )
    z6 = F.round(
        (la - lb)
        / F.sqrt(
            F.lit(1.0) / (F.col("ya").cast("double") + aw)
            + F.lit(1.0) / (F.col("yb").cast("double") + aw)
        ),
        6,
    )
    return (
        m.select(
            F.col("w").alias("token"),
            F.col("ya").alias("tf_a"),
            F.col("yb").alias("tf_b"),
            z6.alias("z_score"),
        )
        .orderBy(F.col("z_score").desc(), "token")
        .limit(_LOGODDS_TOPK)
    )


# ========================================================================
# q_markov_stationary — stationary distribution in exact micro-units
# ========================================================================

#: Fixed synchronous power-iteration rounds (documented contract —
#: the series converges geometrically for the aperiodic event chain;
#: 20 rounds settle micro-unit probabilities for any mixing chain).
_MSTAT_ITERS = 20


def _mstat_oracle() -> str:
    head = """
WITH s AS (
  SELECT event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS next_type
  FROM events
),
tc AS (
  SELECT event_type AS i, next_type AS j,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT i, CAST(SUM(n) AS BIGINT) AS t FROM tc GROUP BY i),
pm AS MATERIALIZED (
  SELECT tc.i, tc.j, (tc.n * 1000000) // tot.t AS p
  FROM tc JOIN tot ON tc.i = tot.i
),
st AS (SELECT DISTINCT i FROM pm),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM st),
pi0 AS MATERIALIZED (
  SELECT st.i, CAST(1000000 // k.k AS BIGINT) AS v
  FROM st CROSS JOIN k
)"""
    its = []
    for r in range(_MSTAT_ITERS):
        its.append(f"""
pi{r + 1} AS MATERIALIZED (
  SELECT pm.j AS i,
         CAST(SUM((pi{r}.v * pm.p) // 1000000) AS BIGINT) AS v
  FROM pi{r} JOIN pm ON pi{r}.i = pm.i
  GROUP BY pm.j
)""")
    return (
        head
        + ","
        + ",".join(its)
        + f"""
SELECT i AS event_type, v AS pi_micro,
       CAST(v AS DOUBLE) / 1000000.0 AS stationary_prob
FROM pi{_MSTAT_ITERS}
"""
    )


@register("q_markov_stationary", oracle=_mstat_oracle())
def q_markov_stationary(spark, sf_dir):
    """STATIONARY DISTRIBUTION of the user event-type chain by 20
    synchronous power-iteration rounds in EXACT INTEGER MICRO-UNITS —
    where q_markov_transitions reports where users go NEXT, this
    reports where the chain spends its time in the long run (the
    steady-state attention share behind capacity and ranking
    priors).  Transition probabilities quantize once to micro-units
    (p_µ = n_ij·10⁶ div tot_i); each round is
    π'(j) = Σᵢ (π(i)·p_µ(i,j)) div 10⁶ — all integer floor math, so
    the iteration is bit-identical in any engine with NO float
    rounding contract at all; sub-micro mass lost to flooring (≤ |S|
    micro-units/round) is the documented quantization contract, and
    the fixed 20-round horizon (not a convergence test) keeps the
    computation replayable.

    100 TB shape: ONE user-clustered sequence window builds the
    bounded |types|²-grain count matrix; all 20 rounds ride
    |types|-row frames (eager-checkpointed every few rounds — the
    kcore lineage-truncation lesson).  Determinism: INTEGERS END TO
    END (products ≤ 10⁶·10⁶ = 10¹², §8.21-safe); the single output
    division is display-only."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type", "user_id", "event_id", epoch_us(ev).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    s = t.select(
        F.col("event_type").alias("i"),
        F.lead("event_type").over(w).alias("j"),
    ).filter(F.col("j").isNotNull())
    tc = s.groupBy("i", "j").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = tc.groupBy("i").agg(F.sum("n").cast("long").alias("t"))
    pm = (
        tc.join(tot, "i")
        .select("i", "j", F.expr("(n * 1000000) div t").alias("p"))
        .persist()
    )
    try:
        st = pm.select("i").distinct()
        kk = st.agg(F.count(F.lit(1)).alias("k"))
        pi = st.crossJoin(F.broadcast(kk)).select(
            "i", F.expr("1000000 div k").cast("long").alias("v")
        ).localCheckpoint(eager=True)
        for r in range(_MSTAT_ITERS):
            pi = (
                pi.join(pm, "i")
                .groupBy(F.col("j").alias("i2"))
                .agg(
                    F.sum(F.expr("(v * p) div 1000000"))
                    .cast("long")
                    .alias("v")
                )
                .withColumnRenamed("i2", "i")
            )
            if r % 5 == 4 or r == _MSTAT_ITERS - 1:
                # truncate lineage — 20 chained joins otherwise grow
                # the logical plan superlinearly (kcore lesson)
                pi = pi.localCheckpoint(eager=True)
        return pi.select(
            F.col("i").alias("event_type"),
            F.col("v").alias("pi_micro"),
            (F.col("v").cast("double") / F.lit(1_000_000.0)).alias(
                "stationary_prob"
            ),
        ).localCheckpoint(eager=True)
    finally:
        pm.unpersist()


# ========================================================================
# q_poisson_rate_test — two-sample event-rate comparison
# ========================================================================

#: z(0.975) — frozen pure-math literal.
_PRT_CRIT = 1.959963984540054


@register(
    "q_poisson_rate_test",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         (((user_id % 2654435761) * 2654435761) % 4294967296) % 2
           AS arm,
         CAST(COUNT(*) AS BIGINT) AS n_ev
  FROM events GROUP BY user_id
),
s AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN n_ev ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(SUM(CASE WHEN arm = 1 THEN n_ev ELSE 0 END) AS BIGINT)
           AS n2,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS u1,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS u2
  FROM u
)
SELECT n1, n2, u1, u2,
       CASE WHEN u1 = 0 THEN NULL
            ELSE CAST(n1 AS DOUBLE) / CAST(u1 AS DOUBLE) END AS rate1,
       CASE WHEN u2 = 0 THEN NULL
            ELSE CAST(n2 AS DOUBLE) / CAST(u2 AS DOUBLE) END AS rate2,
       CASE WHEN u1 = 0 OR u2 = 0 OR n1 + n2 = 0 THEN NULL ELSE
         (CAST(n1 AS DOUBLE)
          - CAST(n1 + n2 AS DOUBLE)
            * (CAST(u1 AS DOUBLE) / CAST(u1 + u2 AS DOUBLE)))
         / SQRT(CAST(n1 + n2 AS DOUBLE)
                * (CAST(u1 AS DOUBLE) / CAST(u1 + u2 AS DOUBLE))
                * (1.0 - CAST(u1 AS DOUBLE) / CAST(u1 + u2 AS DOUBLE)))
       END AS z,
       CASE WHEN u1 = 0 OR u2 = 0 OR n1 + n2 = 0 THEN NULL ELSE
         ABS((CAST(n1 AS DOUBLE)
              - CAST(n1 + n2 AS DOUBLE)
                * (CAST(u1 AS DOUBLE) / CAST(u1 + u2 AS DOUBLE)))
             / SQRT(CAST(n1 + n2 AS DOUBLE)
                    * (CAST(u1 AS DOUBLE) / CAST(u1 + u2 AS DOUBLE))
                    * (1.0 - CAST(u1 AS DOUBLE)
                             / CAST(u1 + u2 AS DOUBLE))))
         > {_PRT_CRIT!r} END AS significant
FROM s
""",
)
def q_poisson_rate_test(spark, sf_dir):
    """TWO-SAMPLE POISSON RATE test (conditional/binomial form) of
    per-user event rates between the standard Knuth-hash arms: given
    N = n₁+n₂ total events and exposures u₁/u₂ users, under equal
    rates n₁ ~ Binomial(N, u₁/(u₁+u₂)) — the count-metric sibling of
    q_ab_srm's assignment check and q_ratio_metric_delta's
    continuous ratio (events-per-user is THE engagement count
    metric, and Poisson counts need the conditional test, not a
    t-test).

    100 TB shape: one user-grain aggregate then a 1-row census —
    map-side combinable, no joins.  Determinism: exact int64 counts;
    z is one fixed-order double chain with IEEE sqrt; NULL on an
    empty arm or zero events (§8.17)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev")
    ).select(
        (llmops.knuth_hash("user_id") % 2).alias("arm"), "n_ev"
    )
    s = u.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n_ev")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_ev")).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum((F.col("arm") == 0).cast("long")).cast("long").alias("u1"),
        F.sum((F.col("arm") == 1).cast("long")).cast("long").alias("u2"),
    )
    p = F.col("u1").cast("double") / (F.col("u1") + F.col("u2")).cast(
        "double"
    )
    nD = (F.col("n1") + F.col("n2")).cast("double")
    z = (F.col("n1").cast("double") - nD * p) / F.sqrt(
        nD * p * (F.lit(1.0) - p)
    )
    degenerate = (
        (F.col("u1") == 0)
        | (F.col("u2") == 0)
        | (F.col("n1") + F.col("n2") == 0)
    )
    return s.select(
        "n1",
        "n2",
        "u1",
        "u2",
        F.when(F.col("u1") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("n1").cast("double") / F.col("u1").cast("double"))
        .alias("rate1"),
        F.when(F.col("u2") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("n2").cast("double") / F.col("u2").cast("double"))
        .alias("rate2"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(z)
        .alias("z"),
        F.when(degenerate, F.lit(None).cast("boolean"))
        .otherwise(F.abs(z) > _PRT_CRIT)
        .alias("significant"),
    )


# ========================================================================
# q_sequence_entropy — conditional entropy / predictability of the chain
# ========================================================================


@register(
    "q_sequence_entropy",
    oracle="""
WITH s AS (
  SELECT event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS next_type
  FROM events
),
tc AS (
  SELECT event_type AS i, next_type AS j,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
),
m AS (
  SELECT i, j, n,
         CAST(SUM(n) OVER (PARTITION BY i) AS BIGINT) AS ti,
         CAST(SUM(n) OVER (PARTITION BY j) AS BIGINT) AS mj,
         CAST(SUM(n) OVER () AS BIGINT) AS nn
  FROM tc
),
hc AS (
  SELECT nn,
         CAST(SUM(CAST(ROUND(
           -(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
           * ROUND(LN(CAST(n AS DOUBLE) / CAST(ti AS DOUBLE)), 9),
         9) AS DECIMAL(28,9))) AS DECIMAL(28,9)) AS h_cond
  FROM m GROUP BY nn
),
hm AS (
  SELECT CAST(SUM(CAST(ROUND(
           -(CAST(mj AS DOUBLE) / CAST(nn AS DOUBLE))
           * ROUND(LN(CAST(mj AS DOUBLE) / CAST(nn AS DOUBLE)), 9),
         9) AS DECIMAL(28,9))) AS DECIMAL(28,9)) AS h_marg
  FROM (SELECT DISTINCT j, mj, nn FROM m)
)
SELECT CAST(hc.nn AS BIGINT) AS n_bigrams,
       CAST(hc.h_cond AS DOUBLE) AS h_cond_nats,
       CAST(hm.h_marg AS DOUBLE) AS h_marginal_nats,
       CASE WHEN CAST(hm.h_marg AS DOUBLE) = 0 THEN NULL
            ELSE 1.0 - CAST(hc.h_cond AS DOUBLE)
                       / CAST(hm.h_marg AS DOUBLE) END
         AS predictability
FROM hc CROSS JOIN hm
""",
)
def q_sequence_entropy(spark, sf_dir):
    """CONDITIONAL ENTROPY RATE of the user event chain:
    H(next | current) vs the marginal H(next), and predictability =
    1 − H_cond/H_marg — how much knowing the current action tells
    you about the next one (0 = memoryless stream, 1 = deterministic
    flows).  The information-theoretic summary OF
    q_markov_transitions' matrix, beside q_entropy's unigram view —
    the single number that says whether sequence modeling is worth
    anything on this stream.

    100 TB shape: ONE user-clustered sequence window to the bounded
    |types|²-grain bigram matrix; marginals DERIVE via windows over
    that grain; both entropy folds are ≤|types|²-term DECIMAL sums.
    Determinism: q_entropy's spelling — exact-int probabilities
    divide once, ln rounds 9 BEFORE the multiply, per-term round(9)
    → DECIMAL(28,9) sums, doubles only in the final projection; NULL
    predictability on a zero marginal entropy (§8.17)."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type", "user_id", "event_id", epoch_us(ev).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    s = t.select(
        F.col("event_type").alias("i"),
        F.lead("event_type").over(w).alias("j"),
    ).filter(F.col("j").isNotNull())
    tc = s.groupBy("i", "j").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wi = Window.partitionBy("i")
    wj = Window.partitionBy("j")
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = tc.select(
        "i",
        "j",
        "n",
        F.sum("n").over(wi).cast("long").alias("ti"),
        F.sum("n").over(wj).cast("long").alias("mj"),
        F.sum("n").over(wall).cast("long").alias("nn"),
    ).persist()
    try:
        hc_term = F.round(
            -(F.col("n").cast("double") / F.col("nn").cast("double"))
            * F.round(
                F.log(
                    F.col("n").cast("double") / F.col("ti").cast("double")
                ),
                9,
            ),
            9,
        ).cast("decimal(28,9)")
        hc = m.select("nn", hc_term.alias("t")).groupBy("nn").agg(
            F.sum("t").cast("decimal(28,9)").alias("h_cond")
        )
        hm_term = F.round(
            -(F.col("mj").cast("double") / F.col("nn").cast("double"))
            * F.round(
                F.log(
                    F.col("mj").cast("double") / F.col("nn").cast("double")
                ),
                9,
            ),
            9,
        ).cast("decimal(28,9)")
        hm = (
            m.select("j", "mj", "nn")
            .distinct()
            .select(hm_term.alias("t"))
            .agg(F.sum("t").cast("decimal(28,9)").alias("h_marg"))
        )
        out = hc.crossJoin(F.broadcast(hm)).select(
            F.col("nn").cast("long").alias("n_bigrams"),
            F.col("h_cond").cast("double").alias("h_cond_nats"),
            F.col("h_marg").cast("double").alias("h_marginal_nats"),
            F.when(
                F.col("h_marg").cast("double") == 0,
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.lit(1.0)
                - F.col("h_cond").cast("double")
                / F.col("h_marg").cast("double")
            )
            .alias("predictability"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        m.unpersist()


# ========================================================================
# q_block_maxima_gumbel — extreme-value fit of weekly maxima
# ========================================================================

#: Frozen pure-math literals (rule 22): Euler–Mascheroni γ, √6/π,
#: and ln(−ln(1 − 1/52)) for the 52-block (≈ yearly at weekly
#: blocks) return level.
_GUM_EULER = 0.5772156649015329
_GUM_SQRT6_PI = 0.779696801233676
_GUM_LNLN52 = -3.9415503865226063


@register(
    "q_block_maxima_gumbel",
    oracle=f"""
WITH w AS (
  SELECT EPOCH_US(o_orderdate) // 604800000000 AS wk,
         CAST(MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS mx
  FROM orders GROUP BY wk
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mx) AS BIGINT) AS sx,
         CAST(SUM(mx * mx) AS BIGINT) AS sxx
  FROM w
),
f AS (
  SELECT n, sx,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_max,
         CASE WHEN n < 2 THEN NULL ELSE
           (CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
              / CAST(n AS DOUBLE))
           / CAST(n - 1 AS DOUBLE) END AS var_max
  FROM s
)
SELECT n AS n_blocks, mean_max AS mean_max_cents,
       CASE WHEN var_max IS NULL OR var_max <= 0 THEN NULL
            ELSE SQRT(var_max) * {_GUM_SQRT6_PI!r} END AS gumbel_beta,
       CASE WHEN var_max IS NULL OR var_max <= 0 THEN NULL
            ELSE mean_max - {_GUM_EULER!r}
                 * (SQRT(var_max) * {_GUM_SQRT6_PI!r}) END
         AS gumbel_mu,
       CASE WHEN var_max IS NULL OR var_max <= 0 THEN NULL
            ELSE (mean_max - {_GUM_EULER!r}
                  * (SQRT(var_max) * {_GUM_SQRT6_PI!r}))
                 - (SQRT(var_max) * {_GUM_SQRT6_PI!r})
                   * {_GUM_LNLN52!r} END
         AS return_level_52
FROM f
""",
)
def q_block_maxima_gumbel(spark, sf_dir):
    """EXTREME-VALUE (Gumbel) fit of WEEKLY block maxima of order
    value by the method of moments: β̂ = s·√6/π, μ̂ = x̄ − γβ̂, and
    the 52-block (≈ yearly) return level μ̂ − β̂·ln(−ln(1−1/52)) —
    "how big an order should we expect once a year", the
    tail-risk partner of q_hill_tail_index (Hill measures HOW heavy
    the tail is; Gumbel block maxima turn it into a capacity
    number).  Block maxima, not peaks-over-threshold: the block
    grain is calendar-bounded, so the fit input never grows with
    volume.

    100 TB shape: one map-side-combinable week-grain MAX, then a
    1-row moment census over the calendar-bounded block table.
    Determinism: weekly maxima and both moment sums are exact int64
    (mx² ≤ 9·10¹⁸ needs cents ≤ 3·10⁹ — a $30 M order cap,
    documented; the §8.21 swap is a dollar-unit rescale); the fit is
    one fixed-order double chain over frozen pure-math literals
    (IEEE sqrt); NULL under 2 blocks or zero variance (§8.17)."""
    o = load_table(spark, sf_dir, "orders")
    wk = o.groupBy(
        F.floor(epoch_us(o, "o_orderdate") / F.lit(604_800_000_000)).alias(
            "wk"
        )
    ).agg(
        F.max(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("mx")
    )
    s = wk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").cast("long").alias("sx"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("sxx"),
    )
    nD = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / nD
    var = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / nD
    ) / (F.col("n") - 1).cast("double")
    beta = F.sqrt(var) * F.lit(_GUM_SQRT6_PI)
    mu = mean - F.lit(_GUM_EULER) * beta
    degenerate = (F.col("n") < 2) | (var <= 0)
    return s.select(
        F.col("n").alias("n_blocks"),
        mean.alias("mean_max_cents"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(beta)
        .alias("gumbel_beta"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(mu)
        .alias("gumbel_mu"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(mu - beta * F.lit(_GUM_LNLN52))
        .alias("return_level_52"),
    )


# ========================================================================
# q_mrr — mean reciprocal rank of relevant docs per retrieval slice
# ========================================================================

#: Deterministic relevance flag: ~20% of docs (Knuth hash residue).
_MRR_REL_MOD = 5


@register(
    "q_mrr",
    oracle=f"""
WITH r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk,
         CASE WHEN ((doc_id % 2654435761) * 2654435761)
                   % 4294967296 % {_MRR_REL_MOD} = 0
              THEN 1 ELSE 0 END AS rel
  FROM documents
),
fr AS (
  SELECT source, CAST(MIN(CASE WHEN rel = 1 THEN rk END) AS BIGINT)
           AS first_rank
  FROM r GROUP BY source
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(SUM(CASE WHEN first_rank IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_with_hit,
         CAST(SUM(CASE WHEN first_rank IS NULL THEN CAST(0 AS DECIMAL(28,9))
                       ELSE CAST(ROUND(1.0 / CAST(first_rank AS DOUBLE),
                                       9) AS DECIMAL(28,9)) END)
              AS DECIMAL(28,9)) AS srr
  FROM fr
)
SELECT n_queries, n_with_hit,
       CASE WHEN n_queries = 0 THEN NULL
            ELSE CAST(srr AS DOUBLE) / CAST(n_queries AS DOUBLE) END
         AS mrr
FROM s
""",
)
def q_mrr(spark, sf_dir):
    """MEAN RECIPROCAL RANK: queries = sources, ranking = the
    q_rrf_fusion lexical proxy (n_chars DESC, doc_id), relevance =
    the deterministic 20% hash flag — the first-hit retrieval metric
    beside q_ndcg's graded gain (MRR is what question-answering and
    known-item search report; a query with NO relevant doc
    contributes 0 by the standard convention; n_with_hit exposes how
    many queries contributed a nonzero reciprocal).

    100 TB shape (REBUILT round 11, VERDICT r10 #3): the old plan
    ranked EVERY document inside ``W.partitionBy(source)`` — with a
    small fixed |sources| each window partition is corpus-sized, one
    task per source.  first_rank needs NO window at all: (pass 1)
    per source, MIN over relevant docs of the ranking key
    struct(-n_chars, doc_id) — an ordinary partial-aggregated
    groupBy; (pass 2) broadcast the |sources|-row best-key table
    back onto documents and COUNT rows strictly ahead of the best
    key per source — another partial-aggregated groupBy.
    first_rank = n_ahead + 1.  Both passes are map-side-combining
    aggregates over the bounded |sources| grain; no row ever sorts.
    Determinism: the ranking key is a total order (doc_id
    tiebreak), first_rank an exact integer; each reciprocal rounds
    9 → DECIMAL sum (q_entropy discipline), ONE final division
    (§8.21); NULL on an empty corpus (§8.17)."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        "doc_id",
        (llmops.knuth_hash("doc_id") % _MRR_REL_MOD == 0).alias("rel"),
    )
    # Pass 1: per-source best (first-ranked) RELEVANT doc as the min
    # of an order-embedding struct — (-n_chars ASC, doc_id ASC) is
    # exactly (n_chars DESC, doc_id ASC).
    best = d.groupBy("source").agg(
        F.min(
            F.when(
                F.col("rel"),
                F.struct(
                    (-F.col("n_chars")).alias("neg_chars"),
                    F.col("doc_id").alias("best_id"),
                ),
            )
        ).alias("b")
    )
    # Pass 2: count docs strictly ahead of the best key, per source.
    ahead = (
        F.col("b").isNotNull()
        & (
            (F.col("n_chars") > -F.col("b.neg_chars"))
            | (
                (F.col("n_chars") == -F.col("b.neg_chars"))
                & (F.col("doc_id") < F.col("b.best_id"))
            )
        )
    ).cast("long")
    fr = (
        d.join(F.broadcast(best), "source")
        .groupBy("source")
        .agg(
            F.max(F.col("b").isNotNull()).alias("_hit"),
            F.sum(ahead).alias("_n_ahead"),
        )
        .select(
            "source",
            F.when(F.col("_hit"), F.col("_n_ahead") + 1)
            .cast("long")
            .alias("first_rank"),
        )
    )
    rr = F.when(
        F.col("first_rank").isNull(),
        F.lit(0).cast("decimal(28,9)"),
    ).otherwise(
        F.round(
            F.lit(1.0) / F.col("first_rank").cast("double"), 9
        ).cast("decimal(28,9)")
    )
    s = fr.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(F.col("first_rank").isNotNull().cast("long"))
        .cast("long")
        .alias("n_with_hit"),
        F.sum(rr).cast("decimal(28,9)").alias("srr"),
    )
    return s.select(
        "n_queries",
        "n_with_hit",
        F.when(F.col("n_queries") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.col("srr").cast("double")
            / F.col("n_queries").cast("double")
        )
        .alias("mrr"),
    )


# ========================================================================
# q_rank_biased_overlap — truncated RBO between two rankings
# ========================================================================

#: Truncated rank-biased overlap weights (Webber et al. 2010),
#: p = 0.9, depth d = 50: a doc present in BOTH top-50 prefixes with
#: ranks (ra, rb) contributes w[max(ra, rb)] where
#: w[m] = (1−p)·Σ_{{k=m..d}} p^(k−1)/k.  FROZEN PURE-MATH LITERALS
#: (rule 22): computing p^(k−1) at runtime would ride each engine's
#: libm pow and diverge by ulps; the frozen table makes the overlap
#: fold exact-identical everywhere.
_RBO_WEIGHTS = (
    0.2557551391667857,
    0.15575513916678563,
    0.11075513916678571,
    0.08375513916678577,
    0.06553013916678577,
    0.05240813916678575,
    0.04256663916678575,
    0.03497462488107147,
    0.028995913631071468,
    0.02421294463107146,
    0.02033873974107146,
    0.01716893574016237,
    0.014553847439412364,
    0.01238131254340467,
    0.010565694094598245,
    0.009040574597600843,
    0.007753755022009287,
    0.006663743146214089,
    0.005737233051788167,
    0.004947261287067118,
    0.004271835428230622,
    0.0036928989777993393,
    0.0031955399362924653,
    0.002767378674473504,
    0.002398089586154649,
    0.002079023813847159,
    0.001802909203196447,
    0.0015636098739658297,
    0.001355932241812115,
    0.0011754675407681975,
    0.001018463250859989,
    0.000881717579004453,
    0.000762492446355407,
    0.0006584414214980582,
    0.0005675497909609032,
    0.00048808453683413364,
    0.0004185524394732103,
    0.00035766487313553685,
    0.00030430813737120717,
    0.00025751838447017963,
    0.00021646037629952786,
    0.00018040944229602885,
    0.00014873612170724043,
    0.00012089306314314273,
    9.640382754244766e-05,
    7.485330021383599e-05,
    5.587946637016704e-05,
    3.916634464404161e-05,
    2.443790612289358e-05,
    1.1452833794044708e-05,
)


@register(
    "q_rank_biased_overlap",
    oracle=f"""
WITH lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS ra
  FROM documents
),
sem AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY ((doc_id % 2654435761) * 2654435761) % 4294967296,
                    doc_id
         ) AS rb
  FROM documents
),
wt(m, w) AS (
  VALUES
    (1, CAST(0.2557551391667857 AS DOUBLE)),
    (2, CAST(0.15575513916678563 AS DOUBLE)),
    (3, CAST(0.11075513916678571 AS DOUBLE)),
    (4, CAST(0.08375513916678577 AS DOUBLE)),
    (5, CAST(0.06553013916678577 AS DOUBLE)),
    (6, CAST(0.05240813916678575 AS DOUBLE)),
    (7, CAST(0.04256663916678575 AS DOUBLE)),
    (8, CAST(0.03497462488107147 AS DOUBLE)),
    (9, CAST(0.028995913631071468 AS DOUBLE)),
    (10, CAST(0.02421294463107146 AS DOUBLE)),
    (11, CAST(0.02033873974107146 AS DOUBLE)),
    (12, CAST(0.01716893574016237 AS DOUBLE)),
    (13, CAST(0.014553847439412364 AS DOUBLE)),
    (14, CAST(0.01238131254340467 AS DOUBLE)),
    (15, CAST(0.010565694094598245 AS DOUBLE)),
    (16, CAST(0.009040574597600843 AS DOUBLE)),
    (17, CAST(0.007753755022009287 AS DOUBLE)),
    (18, CAST(0.006663743146214089 AS DOUBLE)),
    (19, CAST(0.005737233051788167 AS DOUBLE)),
    (20, CAST(0.004947261287067118 AS DOUBLE)),
    (21, CAST(0.004271835428230622 AS DOUBLE)),
    (22, CAST(0.0036928989777993393 AS DOUBLE)),
    (23, CAST(0.0031955399362924653 AS DOUBLE)),
    (24, CAST(0.002767378674473504 AS DOUBLE)),
    (25, CAST(0.002398089586154649 AS DOUBLE)),
    (26, CAST(0.002079023813847159 AS DOUBLE)),
    (27, CAST(0.001802909203196447 AS DOUBLE)),
    (28, CAST(0.0015636098739658297 AS DOUBLE)),
    (29, CAST(0.001355932241812115 AS DOUBLE)),
    (30, CAST(0.0011754675407681975 AS DOUBLE)),
    (31, CAST(0.001018463250859989 AS DOUBLE)),
    (32, CAST(0.000881717579004453 AS DOUBLE)),
    (33, CAST(0.000762492446355407 AS DOUBLE)),
    (34, CAST(0.0006584414214980582 AS DOUBLE)),
    (35, CAST(0.0005675497909609032 AS DOUBLE)),
    (36, CAST(0.00048808453683413364 AS DOUBLE)),
    (37, CAST(0.0004185524394732103 AS DOUBLE)),
    (38, CAST(0.00035766487313553685 AS DOUBLE)),
    (39, CAST(0.00030430813737120717 AS DOUBLE)),
    (40, CAST(0.00025751838447017963 AS DOUBLE)),
    (41, CAST(0.00021646037629952786 AS DOUBLE)),
    (42, CAST(0.00018040944229602885 AS DOUBLE)),
    (43, CAST(0.00014873612170724043 AS DOUBLE)),
    (44, CAST(0.00012089306314314273 AS DOUBLE)),
    (45, CAST(9.640382754244766e-05 AS DOUBLE)),
    (46, CAST(7.485330021383599e-05 AS DOUBLE)),
    (47, CAST(5.587946637016704e-05 AS DOUBLE)),
    (48, CAST(3.916634464404161e-05 AS DOUBLE)),
    (49, CAST(2.443790612289358e-05 AS DOUBLE)),
    (50, CAST(1.1452833794044708e-05 AS DOUBLE))
),
b AS (
  SELECT lex.doc_id,
         CAST(lex.ra AS BIGINT) AS ra, CAST(sem.rb AS BIGINT) AS rb,
         GREATEST(lex.ra, sem.rb) AS m
  FROM lex JOIN sem ON lex.doc_id = sem.doc_id
  WHERE lex.ra <= 50 AND sem.rb <= 50
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_both,
         CAST(SUM(CAST(ROUND(wt.w, 9) AS DECIMAL(28,9)))
              AS DECIMAL(28,9)) AS rbo_dec
  FROM b JOIN wt ON b.m = wt.m
)
SELECT n_both AS n_in_both_top50,
       CAST(rbo_dec AS DOUBLE) AS rbo
FROM s
""",
)
def q_rank_biased_overlap(spark, sf_dir):
    """Truncated RANK-BIASED OVERLAP (p = 0.9, depth 50) between the
    two q_rrf_fusion rankings (lexical n_chars proxy vs semantic
    hash proxy) — the top-weighted ranking-similarity measure
    (Webber et al. 2010) that answers "did the index rebuild change
    what users actually see": Kendall/Spearman weight rank 1 and
    rank 10⁶ equally, RBO geometrically discounts depth, and the
    truncated partial sum is a guaranteed LOWER bound of full RBO.
    The per-doc form: a doc in both top-d prefixes at ranks (ra, rb)
    first enters the overlap at depth max(ra, rb) and contributes
    the frozen tail weight w[max(ra, rb)].

    100 TB shape (REBUILT round 11, VERDICT r10 #2): the old plan
    ran two raw unpartitioned ``Window.orderBy`` row_numbers over
    the FULL corpus — the single-task global-sort anti-pattern the
    suite banned after ADVICE r8.  Only rows with BOTH ranks ≤ 50
    can reach the fold, so each ranking is now an
    ``orderBy(...).limit(50)`` — Spark plans TakeOrderedAndProject:
    every scan partition keeps a local 50-row heap, the driver
    merges #partitions × 50 candidates; NOTHING global-sorts.  The
    row_number window then re-ranks only the bounded 50-row prefix
    (one task over ≤ 50 rows by construction — the sanctioned
    post-limit window shape, cf. keys_r10b q_hill_tail_index).  The
    overlap join and fold are ≤ d rows.  Determinism: both orders
    are total (doc_id tiebreak) so the limit-50 set and the re-ranks
    are exact; weights are FROZEN pure-math literals keyed by an
    integer (no runtime pow); round(9) → DECIMAL sum, double out."""
    d = load_table(spark, sf_dir, "documents")
    lex = (
        d.select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(50)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("n_chars").desc(), "doc_id"))
            .alias("ra"),
        )
    )
    sem = (
        d.select(
            "doc_id", llmops.knuth_hash("doc_id").alias("_h")
        )
        .orderBy("_h", "doc_id")
        .limit(50)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy("_h", "doc_id"))
            .alias("rb"),
        )
    )
    wt = F.array(*[F.lit(w) for w in _RBO_WEIGHTS])
    b = (
        lex.join(sem, "doc_id")
        .filter((F.col("ra") <= 50) & (F.col("rb") <= 50))
        .select(
            F.greatest(F.col("ra"), F.col("rb"))
            .cast("int")
            .alias("m")
        )
    )
    s = b.select(
        F.round(F.element_at(wt, F.col("m")), 9)
        .cast("decimal(28,9)")
        .alias("w")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_in_both_top50"),
        F.sum("w").cast("decimal(28,9)").alias("rbo_dec"),
    )
    return s.select(
        "n_in_both_top50",
        F.col("rbo_dec").cast("double").alias("rbo"),
    )


# ========================================================================
# q_price_index — Laspeyres / Paasche / Fisher between two years
# ========================================================================


@register(
    "q_price_index",
    oracle="""
WITH li AS (
  SELECT l_partkey AS pk,
         EXTRACT(YEAR FROM o_orderdate) AS yr,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS ext_cents,
         CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1997, 1998)
),
py AS (
  SELECT pk, yr,
         CAST(SUM(ext_cents) AS BIGINT) AS s_ext,
         CAST(SUM(qty) AS BIGINT) AS s_qty
  FROM li GROUP BY pk, yr HAVING SUM(qty) > 0
),
c AS (
  SELECT p0.pk, p0.s_ext AS e0, p0.s_qty AS q0,
         p1.s_ext AS e1, p1.s_qty AS q1
  FROM py p0 JOIN py p1 ON p0.pk = p1.pk
  WHERE p0.yr = 1997 AND p1.yr = 1998
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_common,
         CAST(SUM(e0) AS BIGINT) AS se0,
         CAST(SUM(e1) AS BIGINT) AS se1,
         CAST(SUM((e1 * q0) // q1) AS BIGINT) AS sp1q0,
         CAST(SUM((e0 * q1) // q0) AS BIGINT) AS sp0q1
  FROM c
)
SELECT n_common AS n_common_parts,
       CASE WHEN n_common = 0 OR se0 = 0 THEN NULL
            ELSE CAST(sp1q0 AS DOUBLE) / CAST(se0 AS DOUBLE) END
         AS laspeyres,
       CASE WHEN n_common = 0 OR sp0q1 = 0 THEN NULL
            ELSE CAST(se1 AS DOUBLE) / CAST(sp0q1 AS DOUBLE) END
         AS paasche,
       CASE WHEN n_common = 0 OR se0 = 0 OR sp0q1 = 0 THEN NULL
            ELSE SQRT((CAST(sp1q0 AS DOUBLE) / CAST(se0 AS DOUBLE))
                      * (CAST(se1 AS DOUBLE)
                         / CAST(sp0q1 AS DOUBLE))) END AS fisher
FROM t
""",
)
def q_price_index(spark, sf_dir):
    """PRICE INDEX panel between 1997 and 1998 over parts traded in
    BOTH years: Laspeyres (base-year basket Σp₁q₀/Σp₀q₀), Paasche
    (current basket Σp₁q₁/Σp₀q₁) and their geometric-mean Fisher
    ideal index — the inflation/deflation read on the engine's own
    fact data (the econometric aggregate beside q_price_elasticity's
    per-brand slopes).  Unit prices are quantity-weighted yearly
    averages p = Σext/Σqty.

    Exactness: Σp₀q₀ = Σext₀ and Σp₁q₁ = Σext₁ EXACTLY (the
    weighted-average price times its own year's quantity recovers
    the integer revenue), and the cross-basket terms stay integer
    too: p₁·q₀ = (ext₁·q₀) div q₁ — one floor division per part
    (sub-cent remainders dropped, documented contract; a round(9)
    DOUBLE product here hit a cross-engine ROUND tie at the 10th
    digit in testing — the §8.14 class this rewrite removes).  ALL
    FOUR index sums are exact int64 (budget: per-part ext ×
    cross-year qty < 2⁶³ — a $10 M-revenue part × 10⁶ units holds
    ~60 bits; per-term hi/lo split is the §8.21 swap).  100 TB
    shape: one fact join to attach the year, one
    (part, year)-grain aggregate, a part-keyed equi self-join, and
    a scalar census; zero-quantity part-years are filtered (§8.17:
    no unit price exists).  NULL when no common parts or a zero
    denominator."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    base = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).select(
        F.col("l_partkey").alias("pk"),
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("ext_cents"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
    ).filter(F.col("yr").isin(1997, 1998))
    py = (
        base.groupBy("pk", "yr")
        .agg(
            F.sum("ext_cents").cast("long").alias("s_ext"),
            F.sum("qty").cast("long").alias("s_qty"),
        )
        .filter(F.col("s_qty") > 0)
    )
    p0 = py.filter(F.col("yr") == 1997).select(
        "pk", F.col("s_ext").alias("e0"), F.col("s_qty").alias("q0")
    )
    p1 = py.filter(F.col("yr") == 1998).select(
        "pk", F.col("s_ext").alias("e1"), F.col("s_qty").alias("q1")
    )
    c = p0.join(p1, "pk")
    t = c.select(
        "e0",
        "e1",
        F.expr("(e1 * q0) div q1").alias("p1q0"),
        F.expr("(e0 * q1) div q0").alias("p0q1"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("e0").cast("long").alias("se0"),
        F.sum("e1").cast("long").alias("se1"),
        F.sum("p1q0").cast("long").alias("sp1q0"),
        F.sum("p0q1").cast("long").alias("sp0q1"),
    )
    lasp = F.col("sp1q0").cast("double") / F.col("se0").cast("double")
    paas = F.col("se1").cast("double") / F.col("sp0q1").cast("double")
    return t.select(
        F.col("n_common").alias("n_common_parts"),
        F.when(
            (F.col("n_common") == 0) | (F.col("se0") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(lasp)
        .alias("laspeyres"),
        F.when(
            (F.col("n_common") == 0) | (F.col("sp0q1") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(paas)
        .alias("paasche"),
        F.when(
            (F.col("n_common") == 0)
            | (F.col("se0") == 0)
            | (F.col("sp0q1") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.sqrt(lasp * paas))
        .alias("fisher"),
    )


# ========================================================================
# q_negative_binomial_fit — overdispersion of per-user event counts
# ========================================================================

#: hi/lo split base for Σc² (§8.21: per-user counts can reach 10⁶ at
#: scale, Σc² then exceeds int64).
_NBF_SPLIT = 2_097_152


@register(
    "q_negative_binomial_fit",
    oracle=f"""
WITH u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM((c * c) // {_NBF_SPLIT}) AS BIGINT) AS scc_hi,
         CAST(SUM((c * c) % {_NBF_SPLIT}) AS BIGINT) AS scc_lo
  FROM u
),
m AS (
  SELECT n, sc,
         CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
         CASE WHEN n < 2 THEN NULL ELSE
           ((CAST(scc_hi AS DOUBLE) * {float(_NBF_SPLIT)!r}
             + CAST(scc_lo AS DOUBLE))
            - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
              / CAST(n AS DOUBLE))
           / CAST(n - 1 AS DOUBLE) END AS var_c
  FROM s
)
SELECT n AS n_users, sc AS n_events, mean_c AS mean_events,
       var_c AS var_events,
       CASE WHEN var_c IS NULL OR mean_c = 0 THEN NULL
            ELSE var_c / mean_c END AS dispersion_index,
       CASE WHEN var_c IS NULL OR var_c <= mean_c OR mean_c = 0
            THEN NULL
            ELSE mean_c * mean_c / (var_c - mean_c) END AS nb_r,
       CASE WHEN var_c IS NULL OR var_c <= mean_c OR mean_c = 0
            THEN NULL
            ELSE mean_c / var_c END AS nb_p
FROM m
""",
)
def q_negative_binomial_fit(spark, sf_dir):
    """NEGATIVE-BINOMIAL moment fit of per-user event counts: mean,
    variance, the dispersion index v/m̄ (Poisson = 1; > 1 means
    heterogeneous users), and the NB(r, p) parameters r = m̄²/(v−m̄),
    p = m̄/v — THE distributional reality check before any Poisson
    assumption (q_poisson_rate_test's z is anti-conservative on
    overdispersed counts; this key says by how much), and the
    per-user companion to q_burstiness's within-user timing view.

    100 TB shape: one user-grain count aggregate then a 1-row moment
    census — map-side combinable, no joins.  Determinism/overflow
    (§8.21): c² hi/lo-splits at 2²¹ (a 10⁶-event power user puts Σc²
    past int64); the moment chain is fixed-order doubles on
    hardware-exact casts; NULL fits when v ≤ m̄ (under-dispersed —
    NB does not exist) or on degenerate inputs (§8.17)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    sp = _NBF_SPLIT
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.expr(f"(c * c) div {sp}")).cast("long").alias("scc_hi"),
        F.sum(F.expr(f"(c * c) % {sp}")).cast("long").alias("scc_lo"),
    )
    nD = F.col("n").cast("double")
    mean_c = F.col("sc").cast("double") / nD
    var_c = (
        (
            F.col("scc_hi").cast("double") * F.lit(float(sp))
            + F.col("scc_lo").cast("double")
        )
        - F.col("sc").cast("double") * F.col("sc").cast("double") / nD
    ) / (F.col("n") - 1).cast("double")
    no_var = F.col("n") < 2
    return s.select(
        F.col("n").alias("n_users"),
        F.col("sc").alias("n_events"),
        mean_c.alias("mean_events"),
        F.when(no_var, F.lit(None).cast("double"))
        .otherwise(var_c)
        .alias("var_events"),
        F.when(no_var | (mean_c == 0), F.lit(None).cast("double"))
        .otherwise(var_c / mean_c)
        .alias("dispersion_index"),
        F.when(
            no_var | (var_c <= mean_c) | (mean_c == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(mean_c * mean_c / (var_c - mean_c))
        .alias("nb_r"),
        F.when(
            no_var | (var_c <= mean_c) | (mean_c == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(mean_c / var_c)
        .alias("nb_p"),
    )


# ========================================================================
# q_capture_recapture — Chapman estimate of the TRUE duplicate count
# ========================================================================


@register(
    "q_capture_recapture",
    oracle="""
WITH sig AS (
  SELECT doc_id, doc_id % 2 AS half, MD5(LOWER(TRIM(text))) AS s
  FROM documents
),
g AS (
  SELECT s,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c0,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c1
  FROM sig GROUP BY s
),
t AS (
  SELECT CAST(SUM(CASE WHEN c0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(SUM(CASE WHEN c1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n2,
         CAST(SUM(CASE WHEN c0 > 0 AND c1 > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_seen
  FROM g
)
SELECT n1, n2, m, n_seen,
       (n1 + 1) * (n2 + 1) / (m + 1) - 1 AS chapman_est,
       CAST(FLOOR((n1 + 1) * (n2 + 1) / (m + 1) - 1
                  - CAST(n_seen AS DOUBLE)) AS BIGINT) AS est_unseen
FROM t
""",
)
def q_capture_recapture(spark, sf_dir):
    """CAPTURE–RECAPTURE (Chapman-corrected Lincoln–Petersen)
    estimate of the TRUE number of distinct document signatures:
    treat the two corpus halves as two independent "captures" of the
    signature population; N̂ = (n₁+1)(n₂+1)/(m+1) − 1 where m is the
    overlap — the completeness estimator that answers what no dedup
    key can ("how many distinct documents exist that we have NOT yet
    seen"), the coverage QA for q_dedup_exact's census and the
    acquisition-planning number behind q_mixture_allocation.

    100 TB shape: one corpus scan to the signature grain (the
    q_dedup_exact md5 discipline — 16-byte keys), then a 1-row
    census.  Determinism: counts exact int64; the estimator is ONE
    fixed-order double chain (the (n₁+1)(n₂+1) product ≤ (8M+1)² ≈
    6.4·10¹³ is a hardware-exact double, §8.21); est_unseen is
    FLOOR-then-cast in BOTH engines (§8.7: DuckDB CAST(double AS
    BIGINT) rounds while Spark's cast truncates — a bare cast here
    diverges on any fractional estimate); m = 0 never divides by
    zero (the +1 Chapman correction exists for exactly that)."""
    d = load_table(spark, sf_dir, "documents")
    sig = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("s"),
    )
    g = sig.groupBy("s").agg(
        F.sum((F.col("half") == 0).cast("long")).cast("long").alias("c0"),
        F.sum((F.col("half") == 1).cast("long")).cast("long").alias("c1"),
    )
    t = g.agg(
        F.sum((F.col("c0") > 0).cast("long")).cast("long").alias("n1"),
        F.sum((F.col("c1") > 0).cast("long")).cast("long").alias("n2"),
        F.sum(((F.col("c0") > 0) & (F.col("c1") > 0)).cast("long"))
        .cast("long")
        .alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_seen"),
    )
    chapman = (
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1).cast("double")
        / (F.col("m") + 1).cast("double")
        - F.lit(1.0)
    )
    return t.select(
        "n1",
        "n2",
        "m",
        "n_seen",
        chapman.alias("chapman_est"),
        F.floor(chapman - F.col("n_seen").cast("double"))
        .cast("long")
        .alias("est_unseen"),
    )


# ========================================================================
# q_unseen_vocabulary — Chao1 richness + Good–Turing missing mass
# ========================================================================


@register(
    "q_unseen_vocabulary",
    oracle="""
WITH c AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS w
    FROM documents
  ) GROUP BY w
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_obs,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS f1,
         CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS f2
  FROM c
)
SELECT v_obs, n_tokens, f1, f2,
       CASE WHEN f2 = 0
            THEN CAST(v_obs AS DOUBLE)
                 + CAST(f1 * (f1 - 1) AS DOUBLE) / 2.0
            ELSE CAST(v_obs AS DOUBLE)
                 + CAST(f1 * f1 AS DOUBLE)
                   / (2.0 * CAST(f2 AS DOUBLE)) END AS chao1_richness,
       CASE WHEN n_tokens = 0 THEN NULL
            ELSE CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) END
         AS gt_missing_mass
FROM t
""",
)
def q_unseen_vocabulary(spark, sf_dir):
    """UNSEEN-VOCABULARY estimators: Chao1 species richness
    V̂ = V_obs + f₁²/(2f₂) (bias-corrected f₁(f₁−1)/2 when f₂ = 0)
    and the Good–Turing missing mass f₁/N — "how much vocabulary
    would more data reveal, and what probability mass do unseen
    types carry": the diversity-side completeness check pairing
    q_capture_recapture's document-level estimate (q_heaps_law says
    how V GROWS; Chao1 says where it is HEADED), and the number that
    justifies — or kills — another crawl of a source.

    100 TB shape: one token-stream aggregate to the vocabulary grain
    (inverted-index shape), then a 1-row census of exact frequency-
    of-frequency counts.  Determinism: f₁, f₂, V, N exact int64;
    f₁² ≤ V² is §8.21-safe as a hardware-exact double product
    (V ≤ 10¹⁰ types → 67 bits — computed as double for exactly that
    reason); the two outputs are fixed-order double chains; NULL
    missing mass on an empty corpus (§8.17)."""
    d = load_table(spark, sf_dir, "documents")
    c = d.select(
        F.explode(llmops.tokens_col("text")).alias("w")
    ).groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    t = c.agg(
        F.count(F.lit(1)).cast("long").alias("v_obs"),
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum((F.col("cnt") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("cnt") == 2).cast("long")).cast("long").alias("f2"),
    )
    chao1 = F.when(
        F.col("f2") == 0,
        F.col("v_obs").cast("double")
        + (F.col("f1") * (F.col("f1") - 1)).cast("double") / F.lit(2.0),
    ).otherwise(
        F.col("v_obs").cast("double")
        + (F.col("f1") * F.col("f1")).cast("double")
        / (F.lit(2.0) * F.col("f2").cast("double"))
    )
    return t.select(
        "v_obs",
        "n_tokens",
        "f1",
        "f2",
        chao1.alias("chao1_richness"),
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.col("f1").cast("double") / F.col("n_tokens").cast("double")
        )
        .alias("gt_missing_mass"),
    )
