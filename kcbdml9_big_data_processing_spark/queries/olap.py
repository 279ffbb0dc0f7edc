"""General OLAP queries over the TPC-H-ish star schema.

The reference's operator surface stops at one join + windowed sums
(SURVEY.md §2.5-2.8); a user switching engines also needs the rest of
the relational vocabulary. These queries exercise multi-way joins,
analytic window functions, set ops, pivot, rollup, as-of joins and
sessionization — all built-in DataFrame ops, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import davg, davg_sql, dsum, dsum_sql, epoch_millis
from ..sources.parquet import read_table
from .parity import LATEST_EVENT_ORACLE
from .registry import register


# --- TPC-H Q1 analog -----------------------------------------------------


@register(
    "pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql('l_quantity')} AS sum_qty,
               {dsum_sql('l_extendedprice')} AS sum_base_price,
               {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
               {dsum_sql('(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)')} AS sum_charge,
               {davg_sql('l_quantity')} AS avg_qty,
               {davg_sql('l_extendedprice')} AS avg_price,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    prepare=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with multiple measures.
    One shuffle (partial+final HashAggregate); the shipdate filter and
    8-column projection push to the parquet scan."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- TPC-H Q3 analog -----------------------------------------------------


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join with selective filters on both
    dimensions, then grouped revenue. Filters push below the joins; no
    join hints — AQE broadcasts the filtered customer side when its
    runtime size fits, falls back to shuffle joins when it doesn't
    (customer scales with the fact data, so a forced broadcast would
    not survive 100×)."""
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(revenue).alias("revenue"))
    )


# --- TPC-H Q5 analog -----------------------------------------------------


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. Only the constant-cardinality
    dims (region=5 rows, nation=25 rows) carry a broadcast hint;
    customer and supplier scale with the data, so their join strategy
    is left to AQE — broadcast at small SF, shuffle at 100 TB."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
    )


# --- TPC-H Q6 analog: single-row forecast --------------------------------


def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-global-agg; every predicate
    reaches PushedFilters, no shuffle beyond the final single-partition
    reduce."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- analytic window functions -------------------------------------------


def top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ROW_NUMBER — Spark plans a partial top-K
    (WindowGroupLimit) before the shuffle, so the full sort never
    happens at scale. Tie-broken on o_orderkey for determinism."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", F.col("rn").cast("long").alias("rn"))
    )


@register(
    "sessionize_events",
    oracle="""
        SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM (
            SELECT user_id,
                   CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 3600000
                        THEN 1 ELSE 0 END AS is_new
            FROM (
                SELECT user_id, ts,
                       LAG(epoch_ms(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_ms
                FROM events
            )
        )
        GROUP BY user_id
    """,
    prepare=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a session break is a >1 h gap between a user's
    consecutive events (lag + conditional sum — one shuffle on user_id,
    reused by both the window and the final aggregate)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ms", F.lag(epoch_millis("ts")).over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ms").isNull()
                | (epoch_millis("ts") - F.col("prev_ms") > 3_600_000),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .groupBy("user_id")
        .agg(
            F.sum("is_new").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "asof_last_click_before_purchase",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts,
               (SELECT MAX(c.ts) FROM events c
                WHERE c.event_type = 'click' AND c.user_id = p.user_id
                  AND c.ts <= p.ts) AS last_click_ts
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
    prepare=True,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): for each purchase, the
    latest click by the same user at-or-before it. Routed through the
    GENERAL operator (operators/temporal.asof_join) so the generic
    union-plus-event-time-window formulation — one shuffle on the key,
    no self-join, no cross product — sits inside the driver's oracle
    gate; a theta-join on user + ts<=ts would explode quadratically on
    hot users."""
    from ..operators.temporal import asof_join

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(purchases, clicks, on="user_id", prefix="last_click_")


# --- set operations -------------------------------------------------------


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS). The orders side is reduced to its
    join key before the shuffle by Catalyst's column pruning."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def buyers_with_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two filtered scans."""
    ev = read_table(spark, sf_dir, "events")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id")
    erroring = ev.where(F.col("event_type") == "error").select("user_id")
    return buyers.intersect(erroring)


def event_users_not_in_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) across two tables with heterogeneous key names."""
    ev = read_table(spark, sf_dir, "events").select("user_id").distinct()
    building = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("user_id"))
    )
    return ev.exceptAll(building.distinct()).distinct()


# --- multi-dimensional aggregation ----------------------------------------


def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grouping sets) — one pass, Spark expands
    grouping sets inside the aggregate, still a single shuffle."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty")
    )


def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure profile incl. exact distinct count (expands to a
    two-phase aggregate; min/max/avg ride along)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        davg("value").alias("avg_value"),
    )


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _pivot_col(t: str) -> str:
    p = 10**6
    return (
        f"(CAST(CAST(SUM(CAST(FLOOR(value * {p}.0) AS BIGINT)) "
        f"FILTER (WHERE event_type = '{t}') AS BIGINT) AS DOUBLE) / {p}.0) AS {t}"
    )


def user_value_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column of summed value per event_type. With the pivot
    values listed explicitly Spark skips the extra distinct-values job."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").pivot("event_type", _PIVOT_TYPES).agg(dsum("value"))


@register(
    "user_summary",
    oracle=f"""
        WITH p AS (
            SELECT user_id, {', '.join(_pivot_col(t) for t in _PIVOT_TYPES)}
            FROM events
            GROUP BY user_id
        ),
        l AS ({LATEST_EVENT_ORACLE})
        SELECT p.*, l.event_id AS last_event_id, l.ts AS last_ts,
               l.event_type AS last_event_type
        FROM p JOIN l ON p.user_id = l.user_id
    """,
    prepare=True,
)
def user_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user summary in one registration (r6 reshuffle freeing a
    slot for the CDC suite): the PIVOT value matrix joined 1:1 on
    user_id with the recency-compaction latest event. Both
    constituents stay importable individually and keep their full
    computation (pivot aggregate + WindowGroupLimit top-1)."""
    from .parity import latest_event_per_user

    latest = latest_event_per_user(spark, sf_dir).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
    )
    return user_value_pivot(spark, sf_dir).join(latest, "user_id")


# --- semi join (EXISTS) ---------------------------------------------------


def late_shipped_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS): orders with at least one lineitem
    shipped after the order date, counted per priority. A left-semi
    join — the lineitem side is pruned to its join+filter columns and
    never duplicates orders rows, so the aggregate input stays
    |orders|-sized at any SF."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --- scalar aggregate subquery (per-group threshold) ----------------------


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems below 20% of their part's average
    quantity. The correlated scalar subquery is decorrelated into an
    aggregate + self-join on l_partkey — both sides shuffle on the
    same key once; no per-row subquery execution."""
    li = read_table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        davg("l_quantity").alias("threshold")
    )
    return (
        li.join(thresholds, li.l_partkey == thresholds.t_partkey)
        .where(F.col("l_quantity") < 0.2 * F.col("threshold"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# --- exact rank-based percentiles ----------------------------------------


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank percentiles per event_type (element at
    floor(p*(n-1)) of the sorted values — integer rank selection, no
    interpolation, so every engine agrees bit-for-bit; Spark's
    percentile()/approx variants interpolate differently per engine).
    One shuffle on event_type shared by both windows and the final
    aggregate. For 100 TB dashboards swap in percentile_approx and
    accept the documented error bound."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        (F.row_number().over(w) - 1).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(p: float):
        return F.max(
            F.when(
                F.col("rk") == F.floor(F.lit(p) * (F.col("n") - 1)).cast("long"),
                F.col("value"),
            )
        )

    return ranked.groupBy("event_type").agg(
        pick(0.5).alias("p50"), pick(0.9).alias("p90"), pick(0.99).alias("p99")
    )


# --- global top-k ---------------------------------------------------------


def top100_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject —
    each partition keeps its local top 100, the driver merges k*P rows;
    the full sort never materializes at any SF. Tie-broken on
    o_orderkey for determinism."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


# --- CUBE grouping sets ---------------------------------------------------


def status_flag_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping sets in one
    pass — Spark expands the sets inside a single hash aggregate
    (rows replicate x4 map-side, still one shuffle)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("l_extendedprice").alias("sum_price")
    )


# --- part-dimension revenue -----------------------------------------------


def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per part brand for small parts: the dimension filter
    (p_size < 25) is applied before the join, shrinking the build side
    so AQE can broadcast it; the lineitem side reads only its 3 needed
    columns."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_size") < 25)
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# --- approximate distinct (HLL) -------------------------------------------


@register(
    "user_reach_approx",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_3pct
        FROM events
        GROUP BY event_type
    """,
    prepare=True,
)
def user_reach_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event_type via HyperLogLog++
    (approx_count_distinct, 1% relative error) — the 100 TB path for
    reach metrics: constant memory per group vs the exact two-phase
    distinct expansion. HLL sketches are engine-specific, so the raw
    estimate can never hash-match a DuckDB oracle; instead this row
    emits a bounded-error WITNESS: the exact distinct count plus
    ``within_3pct`` = |approx − exact| ≤ max(3, 0.03·exact) (3 sigma
    at rsd=0.01, small-count floor so tiny groups can't flake — the
    same bound tests/test_approx.py pins at two SFs). The oracle
    recomputes the exact count and emits a constant TRUE, so the
    driver hash matches iff the exact counts agree AND Spark's
    approximation genuinely lands inside the pinned bound — a
    non-vacuous, order-insensitive full-hash gate for an operator
    whose output is inherently engine-specific. Production reach
    callers drop the exact column and keep only the sketch; the
    witness shape exists so the driver can gate it.

    Plan shape: mixing count_distinct with other aggregates makes
    Catalyst Expand every input row ×2 (measured 2.3 s at sf0.1), so
    the witness dedups (event_type, user_id) pairs first — one
    map-side-combined shuffle of the tiny pair set — then counts
    pairs (exact), sums pair counts (n_events), and runs the HLL over
    the deduped pairs, which is register-identical to running it over
    the raw rows (duplicates never change a sketch). 1.1 s at sf0.1,
    same result bit-for-bit."""
    ev = read_table(spark, sf_dir, "events")
    pairs = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = pairs.groupBy("event_type").agg(
        F.sum("c").alias("n_events"),
        # count(user_id), not count(*): a NULL user_id forms its own
        # pair group, which COUNT(DISTINCT) and the HLL both ignore —
        # count(*) would diverge from the oracle on any null-bearing
        # input (r13 review; latent in the null-free testdata)
        F.count(F.col("user_id")).alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("_approx_users"),
    )
    err = F.abs(F.col("_approx_users") - F.col("exact_users")).cast("double")
    bound = F.greatest(F.lit(3.0), F.lit(0.03) * F.col("exact_users").cast("double"))
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (err <= bound).alias("within_3pct"),
    )


def approx_value_percentiles(
    spark: SparkSession, sf_dir: str, accuracy: int = 2000
) -> DataFrame:
    """Approximate per-group percentiles with a SELF-WITNESS — the
    100 TB swap for value_percentiles' exact nearest-rank window: one
    aggregation pass with a bounded-memory GK sketch
    (approx_percentile, rank error ≤ n/accuracy) instead of a full
    per-group sort, plus one verification pass that proves the bound
    held on THIS data. For each percentile p the witness recomputes
    the returned value's exact rank interval [count(<v), count(≤v)]
    and checks p·n lands inside it ± (n/accuracy + 1) — the same
    bounded-error-witness construction that driver-gates
    user_reach_approx, pytest-pinned at two SFs (tests/test_approx.py)
    AND driver-gated since r14 through grouped_stats_suite's
    ``approx_percentiles`` variant (exact n + the bound booleans vs an
    oracle emitting constant TRUE — the sketch values themselves are
    engine-specific and stay out of the hash). The verification pass
    doubles the scan cost, so production callers on the hot path run
    the first aggregation alone and leave the witness to audit jobs.

    Emits (event_type, n, p50, p90, p99, r50_ok, r90_ok, r99_ok);
    the p-values are engine-specific sketch outputs (never
    hash-comparable — exactly why the booleans exist)."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    ps = (0.5, 0.9, 0.99)
    stats = ev.groupBy("event_type").agg(
        F.expr(
            "approx_percentile(value, array(0.5D, 0.9D, 0.99D),"
            f" {int(accuracy)})"
        ).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    aggs = []
    for i in range(len(ps)):
        aggs.append(
            F.sum((F.col("value") < F.col("ap")[i]).cast("long")).alias(f"lt{i}")
        )
        aggs.append(
            F.sum((F.col("value") <= F.col("ap")[i]).cast("long")).alias(f"le{i}")
        )
    ranks = j.groupBy("event_type").agg(
        *aggs, F.first("n").alias("n"), F.first("ap").alias("ap")
    )
    err = F.col("n").cast("double") / accuracy + 1.0
    cols = [F.col("event_type"), F.col("n")]
    cols += [F.col("ap")[i].alias(f"p{int(p * 100)}") for i, p in enumerate(ps)]
    for i, p in enumerate(ps):
        target = F.lit(p) * F.col("n").cast("double")
        ok = ((F.col(f"lt{i}").cast("double") - err) <= target) & (
            target <= (F.col(f"le{i}").cast("double") + err)
        )
        cols.append(ok.alias(f"r{int(p * 100)}_ok"))
    return ranks.select(*cols)


# --- left outer join + distribution (TPC-H Q13 shape) ---------------------


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram including
    zero-order customers — LEFT OUTER join then two stacked
    aggregations. count(o_orderkey) counts matches only (nulls from
    the outer side don't count), so customers without orders land in
    the c_count=0 bucket."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy(cust.c_custkey)
        .agg(F.count(orders.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- IN over grouped HAVING (TPC-H Q18 shape) -----------------------------


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped HAVING subquery — planned as
    an aggregation feeding a left-semi join, then the outer
    join+aggregate. Both aggregations shuffle on l_orderkey, so AQE
    reuses the exchange partitioning."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 150.0)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


# --- disjunctive multi-clause predicate (TPC-H Q19 shape) -----------------


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive clauses spanning both join
    sides. Catalyst factors the common-column predicates below the
    join (CNF conversion), so each scan still prunes; the residual
    disjunction evaluates post-join in codegen."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    clause1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size") <= 15)
        & (F.col("l_quantity") >= 1.0)
        & (F.col("l_quantity") <= 30.0)
    )
    clause2 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size") <= 30)
        & (F.col("l_quantity") >= 10.0)
        & (F.col("l_quantity") <= 40.0)
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return j.where(clause1 | clause2).agg(
        dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_rows")
    )


# --- single-pass profiling -------------------------------------------------


@register(
    "profile_orders",
    oracle="""
        SELECT col AS "column", n_rows, n_nulls, n_distinct, min_value, max_value
        FROM (
            SELECT 'o_custkey' AS col,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_nulls,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
                   CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
                   CAST(MAX(o_custkey) AS VARCHAR) AS max_value
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
                   CAST(MIN(o_orderstatus) AS VARCHAR),
                   CAST(MAX(o_orderstatus) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
                   CAST(MIN(o_totalprice) AS VARCHAR),
                   CAST(MAX(o_totalprice) AS VARCHAR)
            FROM orders
        )
    """,
    prepare=True,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass profiling of three orders columns (nulls, exact
    distincts, bounds) — all measures in one hash aggregate, then the
    wide row unpivoted; the oracle phrases the same numbers as
    per-column passes, proving the one-pass plan computes them all
    correctly. Caveat shared with the oracle: numeric min/max render
    via each engine's double->string; the profiled numeric column here
    (o_totalprice) has 2-decimal values that format identically."""
    from ..operators.profile import profile_columns

    orders = read_table(spark, sf_dir, "orders")
    return profile_columns(orders, ["o_custkey", "o_orderstatus", "o_totalprice"])


# --- deterministic stratified sampling ------------------------------------


@register(
    "stratified_sample",
    oracle="""
        SELECT event_type, event_id, user_id
        FROM (
            SELECT event_type, event_id, user_id,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY event_id) AS rn
            FROM events
        )
        WHERE rn % 10 = 1
    """,
    prepare=True,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% stratified sample: every 10th event per
    event_type stratum by id order. Systematic (rank-based) rather
    than rand()-based on purpose — reproducible across runs/engines,
    and exactly proportional per stratum, which Bernoulli sampling
    only approximates. One shuffle on the stratum key; at 100 TB
    swap ROW_NUMBER for a hash-mod predicate (pmod(xxhash64(id), 10)
    = 0) to avoid the per-stratum sort entirely — same distributional
    guarantee, fully scan-parallel."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") % 10 == 1)
        .select("event_type", "event_id", "user_id")
    )


# =========================================================================
# Consolidated suites: each bundles queries of one relational family into
# a single registered query (UNION ALL with a `variant` discriminator, or
# a long-format melt), so the external driver's per-round correctness
# window covers the entire registry. Every constituent keeps its full
# computation and its own oracle phrasing inside the union — nothing is
# weakened, only the registration count shrinks (round-3 verdict item 1).
# The plain per-shape functions above remain importable individually.
# =========================================================================


@register(
    "membership_suite",
    oracle="""
        SELECT 'no_orders' AS variant, c_custkey AS key FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT 'buyers_with_errors', user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'error'
        )
        UNION ALL
        SELECT 'not_in_building', user_id FROM (
            SELECT DISTINCT user_id FROM events
            EXCEPT
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
    """,
    prepare=True,
)
def membership_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership family in one result: left-anti join (NOT
    EXISTS), INTERSECT, and EXCEPT, each tagged by variant. All three
    reduce to key-only shuffles after Catalyst prunes the non-key
    columns below the exchange."""
    no_orders = customers_without_orders(spark, sf_dir).select(
        F.lit("no_orders").alias("variant"), F.col("c_custkey").alias("key")
    )
    buyers = buyers_with_errors(spark, sf_dir).select(
        F.lit("buyers_with_errors").alias("variant"), F.col("user_id").alias("key")
    )
    not_building = event_users_not_in_building(spark, sf_dir).select(
        F.lit("not_in_building").alias("variant"), F.col("user_id").alias("key")
    )
    return no_orders.unionAll(buyers).unionAll(not_building)


@register(
    "grouping_sets_suite",
    oracle=f"""
        SELECT 'rollup' AS variant, l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               {dsum_sql('l_quantity')} AS measure
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'cube', l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT),
               {dsum_sql('l_extendedprice')}
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    prepare=True,
)
def grouping_sets_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets family: ROLLUP hierarchy totals (measure =
    quantity) and the full CUBE (measure = price) over the same two
    dimensions — each a single hash aggregate with map-side grouping-
    set expansion, one shuffle apiece."""
    rollup = lineitem_rollup(spark, sf_dir).select(
        F.lit("rollup").alias("variant"),
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        F.col("sum_qty").alias("measure"),
    )
    cube = status_flag_cube(spark, sf_dir).select(
        F.lit("cube").alias("variant"),
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        F.col("sum_price").alias("measure"),
    )
    return rollup.unionAll(cube)


@register(
    "filtered_revenue_suite",
    oracle=f"""
        SELECT 'q6_forecast' AS variant,
               {dsum_sql('l_extendedprice * l_discount')} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24.0
        UNION ALL
        SELECT 'q17_small_quantity',
               ({dsum_sql('l.l_extendedprice')} / 7.0),
               CAST(NULL AS BIGINT)
        FROM lineitem l
        JOIN (
            SELECT l_partkey, {davg_sql('l_quantity')} AS threshold
            FROM lineitem GROUP BY l_partkey
        ) t ON l.l_partkey = t.l_partkey
        WHERE l.l_quantity < 0.2 * t.threshold
        UNION ALL
        SELECT 'q19_disjunctive',
               {dsum_sql('l.l_extendedprice * (1.0 - l.l_discount)')},
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 15
               AND l.l_quantity >= 1.0 AND l.l_quantity <= 30.0)
           OR (p.p_brand = 'Brand#3' AND p.p_size <= 30
               AND l.l_quantity >= 10.0 AND l.l_quantity <= 40.0)
    """,
    prepare=True,
)
def filtered_revenue_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-filter-global-aggregate family: TPC-H Q6 (pure pushed-down
    filter), Q17 (decorrelated per-group-threshold self-join), and Q19
    (disjunctive cross-side predicate) — three single-row revenue
    aggregates tagged by variant. Each keeps its distinctive plan; the
    union concatenates three 1-row frames."""
    q6 = revenue_forecast(spark, sf_dir).select(
        F.lit("q6_forecast").alias("variant"), "revenue", "n_rows"
    )
    q17 = small_quantity_revenue(spark, sf_dir).select(
        F.lit("q17_small_quantity").alias("variant"),
        F.col("avg_yearly").alias("revenue"),
        F.lit(None).cast("long").alias("n_rows"),
    )
    q19 = disjunctive_revenue(spark, sf_dir).select(
        F.lit("q19_disjunctive").alias("variant"), "revenue", "n_rows"
    )
    return q6.unionAll(q17).unionAll(q19)


@register(
    "ranked_orders",
    oracle="""
        SELECT 'per_priority' AS variant, o_orderpriority, o_orderkey,
               o_totalprice, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 5
        UNION ALL
        SELECT 'global_top100', CAST(NULL AS VARCHAR), o_orderkey,
               o_totalprice, CAST(NULL AS BIGINT)
        FROM (
            SELECT o_orderkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 100
        )
    """,
    prepare=True,
)
def ranked_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: top-5 per group (ROW_NUMBER with partial
    WindowGroupLimit before the shuffle) and global top-100 (ORDER BY +
    LIMIT planning as TakeOrderedAndProject — per-partition top-k,
    driver merge, no full sort at any SF). Both plans survive in the
    union; the global variant carries NULL priority/rank."""
    per_priority = top_orders_per_priority(spark, sf_dir).select(
        F.lit("per_priority").alias("variant"),
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        "rn",
    )
    top100 = top100_orders(spark, sf_dir).select(
        F.lit("global_top100").alias("variant"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "o_orderkey",
        "o_totalprice",
        F.lit(None).cast("long").alias("rn"),
    )
    return per_priority.unionAll(top100)


@register(
    "join_revenue_suite",
    oracle=f"""
        SELECT 'q3_shipping' AS variant,
               CAST(o.o_orderkey AS VARCHAR) AS key,
               {dsum_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS measure
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY o.o_orderkey
        UNION ALL
        SELECT 'q5_local_supplier', n.n_name,
               {dsum_sql('l.l_extendedprice * (1.0 - l.l_discount)')}
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
        UNION ALL
        SELECT 'brand_revenue', p.p_brand,
               {dsum_sql('l.l_extendedprice * (1.0 - l.l_discount)')}
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size < 25
        GROUP BY p.p_brand
        UNION ALL
        SELECT 'q18_large_volume', CAST(o.o_orderkey AS VARCHAR),
               {dsum_sql('l.l_quantity')}
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 150.0
        )
        GROUP BY o.o_orderkey
    """,
)
def join_revenue_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-then-grouped-sum family, one variant per TPC-H shape: Q3
    (3-way join, selective dim filters), Q5 (6-way star join with
    broadcast hints only on constant-cardinality dims), Q19-adjacent
    brand revenue (filtered dim shrink-then-broadcast), and Q18 (IN
    over grouped HAVING -> semi-join). Each variant keeps its full
    join pipeline and plan; outputs conform to (variant, key,
    measure).

    r11: the union-of-four-pipelines plan is PREPARED once per
    process (_prepared_plan) — exp_plan_vs_exec measured per-call
    Catalyst construction+analysis at 1.2 s vs 0.88 s execution
    (four full TPC-H pipelines re-analyzed per call, the same
    analysis-bound shape the ngram/ann suites had). Inputs are
    immutable per (app, sf_dir), so re-analysis buys nothing."""
    from .similarity import _prepared_plan

    def build() -> DataFrame:
        q3 = shipping_priority(spark, sf_dir).select(
            F.lit("q3_shipping").alias("variant"),
            F.col("o_orderkey").cast("string").alias("key"),
            F.col("revenue").alias("measure"),
        )
        q5 = local_supplier_volume(spark, sf_dir).select(
            F.lit("q5_local_supplier").alias("variant"),
            F.col("n_name").alias("key"),
            F.col("revenue").alias("measure"),
        )
        brand = brand_revenue(spark, sf_dir).select(
            F.lit("brand_revenue").alias("variant"),
            F.col("p_brand").alias("key"),
            F.col("revenue").alias("measure"),
        )
        q18 = large_volume_customers(spark, sf_dir).select(
            F.lit("q18_large_volume").alias("variant"),
            F.col("o_orderkey").cast("string").alias("key"),
            F.col("total_qty").alias("measure"),
        )
        return q3.unionAll(q5).unionAll(brand).unionAll(q18)

    return _prepared_plan(spark, "join_revenue_suite", sf_dir, build)


@register(
    "grouped_stats_suite",
    oracle=f"""
        WITH ets AS MATERIALIZED (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value,
                   {davg_sql('value')} AS avg_value
            FROM events
            GROUP BY event_type
        ),
        pct AS MATERIALIZED (
            SELECT event_type,
                   MAX(CASE WHEN rn - 1 = CAST(floor(0.5 * (n - 1)) AS BIGINT)
                       THEN value END) AS p50,
                   MAX(CASE WHEN rn - 1 = CAST(floor(0.9 * (n - 1)) AS BIGINT)
                       THEN value END) AS p90,
                   MAX(CASE WHEN rn - 1 = CAST(floor(0.99 * (n - 1)) AS BIGINT)
                       THEN value END) AS p99
            FROM (
                SELECT event_type, value,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY value, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM events
            )
            GROUP BY event_type
        ),
        apx AS MATERIALIZED (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events
            GROUP BY event_type
        )
        SELECT 'event_type_stats' AS variant, event_type AS key,
               'n_events' AS metric, CAST(n_events AS DOUBLE) AS value FROM ets
        UNION ALL
        SELECT 'event_type_stats', event_type, 'n_users',
               CAST(n_users AS DOUBLE) FROM ets
        UNION ALL
        SELECT 'event_type_stats', event_type, 'min_value', min_value FROM ets
        UNION ALL
        SELECT 'event_type_stats', event_type, 'max_value', max_value FROM ets
        UNION ALL
        SELECT 'event_type_stats', event_type, 'avg_value', avg_value FROM ets
        UNION ALL
        SELECT 'value_percentiles', event_type, 'p50', p50 FROM pct
        UNION ALL
        SELECT 'value_percentiles', event_type, 'p90', p90 FROM pct
        UNION ALL
        SELECT 'value_percentiles', event_type, 'p99', p99 FROM pct
        UNION ALL
        SELECT 'approx_percentiles', event_type, 'n', CAST(n AS DOUBLE) FROM apx
        UNION ALL
        SELECT 'approx_percentiles', event_type, 'r50_ok',
               CAST(1.0 AS DOUBLE) FROM apx
        UNION ALL
        SELECT 'approx_percentiles', event_type, 'r90_ok',
               CAST(1.0 AS DOUBLE) FROM apx
        UNION ALL
        SELECT 'approx_percentiles', event_type, 'r99_ok',
               CAST(1.0 AS DOUBLE) FROM apx
        UNION ALL
        SELECT 'customer_order_distribution', CAST(c_count AS VARCHAR),
               'custdist', CAST(custdist AS DOUBLE)
        FROM (
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (
                SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
                FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
                GROUP BY c.c_custkey
            )
            GROUP BY c_count
        )
        UNION ALL
        SELECT 'late_shipped', o_orderpriority, 'n_orders',
               CAST(COUNT(*) AS DOUBLE)
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        )
        GROUP BY o_orderpriority
    """,
)
def grouped_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-statistics family, melted to (variant, key, metric,
    value): multi-measure profile with exact distinct
    (event_type_stats), exact nearest-rank percentiles
    (value_percentiles), the GK-sketch percentile swap's self-witness
    (approx_percentiles — exact counts + bound booleans; the
    engine-specific sketch values stay out of the hash), the Q13
    orders-per-customer histogram (customer_order_distribution), and
    the Q4 EXISTS counts (late_shipped_priority_counts). Every
    constituent keeps its plan;
    the melt is a per-row stack() — no extra shuffle. All values are
    exactly-representable doubles (counts < 2^53, fixed-point
    averages, rank-selected raw values), so the cross-engine hash
    stays bit-exact."""
    from .similarity import _prepared_plan

    def build() -> DataFrame:
        ets = event_type_stats(spark, sf_dir).select(
            F.lit("event_type_stats").alias("variant"),
            F.col("event_type").alias("key"),
            F.expr(
                "stack(5,"
                " 'n_events', CAST(n_events AS DOUBLE),"
                " 'n_users', CAST(n_users AS DOUBLE),"
                " 'min_value', min_value,"
                " 'max_value', max_value,"
                " 'avg_value', avg_value) AS (metric, value)"
            ),
        ).select("variant", "key", "metric", "value")
        pct = value_percentiles(spark, sf_dir).select(
            F.lit("value_percentiles").alias("variant"),
            F.col("event_type").alias("key"),
            F.expr(
                "stack(3, 'p50', p50, 'p90', p90, 'p99', p99) AS (metric, value)"
            ),
        ).select("variant", "key", "metric", "value")
        # r14: the GK-sketch swap's self-witness, driver-gated the same
        # way as user_reach_approx — the sketch values themselves are
        # engine-specific (never hash-comparable), so the row carries
        # the exact group count plus the exact-rank bound booleans; the
        # oracle recomputes n and emits constant TRUE, so the hash
        # matches iff approx_percentile genuinely landed inside its
        # contractual n/accuracy rank bound on this data.
        apx = approx_value_percentiles(spark, sf_dir).select(
            F.lit("approx_percentiles").alias("variant"),
            F.col("event_type").alias("key"),
            F.expr(
                "stack(4,"
                " 'n', CAST(n AS DOUBLE),"
                " 'r50_ok', CAST(r50_ok AS DOUBLE),"
                " 'r90_ok', CAST(r90_ok AS DOUBLE),"
                " 'r99_ok', CAST(r99_ok AS DOUBLE)) AS (metric, value)"
            ),
        ).select("variant", "key", "metric", "value")
        cod = customer_order_distribution(spark, sf_dir).select(
            F.lit("customer_order_distribution").alias("variant"),
            F.col("c_count").cast("string").alias("key"),
            F.lit("custdist").alias("metric"),
            F.col("custdist").cast("double").alias("value"),
        )
        late = late_shipped_priority_counts(spark, sf_dir).select(
            F.lit("late_shipped").alias("variant"),
            F.col("o_orderpriority").alias("key"),
            F.lit("n_orders").alias("metric"),
            F.col("n_orders").cast("double").alias("value"),
        )
        return ets.unionAll(pct).unionAll(apx).unionAll(cod).unionAll(late)

    # r11: four static pipelines over immutable inputs — prepared once
    # per process (exp_plan_vs_exec: 0.64 s construction vs 0.79 exec)
    return _prepared_plan(spark, "grouped_stats_suite", sf_dir, build)
