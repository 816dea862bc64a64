"""Window / event-time / set-operation extensions (SURVEY §2.11) over the
`events` table, with DuckDB oracles.

All batch-mode here; Structured Streaming variants live in streaming/.
Scale notes: every op is a single keyed shuffle (or none); window functions
partition by user_id, so skewed users are the only hazard — AQE skew
handling plus the high-cardinality user_id key cover it.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
    dec_sum,
    exact_ntile,
    global_row_number,
    sql_dec_sum,
    t,
)


def q_ext_window_rank(spark, sf_dir):
    """Top-3 events per user by value (deterministic tiebreak on event_id)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("value"), F.asc("event_id"))
    )
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", "value", "rn")
    )


def q_ext_window_lag_lead(spark, sf_dir):
    """Per-user event deltas: lag/lead over event time."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
        ).alias("micros_since_prev"),
    )


def q_ext_tumbling_agg(spark, sf_dir):
    """10-minute tumbling event-time windows."""
    ev = t(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_ext_sliding_agg(spark, sf_dir):
    """10-minute windows sliding every 5 minutes (each event lands in 2)."""
    ev = t(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events",
                "sum_value")
    )


def q_ext_session_agg(spark, sf_dir):
    """Per-user session windows with a 30-minute inactivity gap."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def q_ext_grouping_sets(spark, sf_dir):
    """ROLLUP over lineitem (returnflag, linestatus)."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("l_quantity").alias("sum_qty"),
    )


def q_ext_cube(spark, sf_dir):
    """CUBE over events (event_type, user_id bucket)."""
    ev = t(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 4).cast("long")
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value").alias("sum_value"),
    )


def q_ext_events_funnel(spark, sf_dir):
    """Click->purchase conversion funnel per user: first click, first
    purchase at-or-after that click, and the converted flag — the
    standard two-step funnel over an event stream.

    Scale shape: one aggregation per funnel step keyed by user_id (map-
    side combined), one user_id-keyed join between them — no windows over
    the raw stream, no per-event state. Adding steps adds aggregations,
    not shuffles of wider frames.
    """
    ev = t(spark, sf_dir, "events")
    first_click = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).alias("first_click_ts")
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("first_click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return first_click.join(first_purchase, "user_id", "left").select(
        "user_id",
        "first_click_ts",
        "first_purchase_ts",
        F.col("first_purchase_ts").isNotNull().alias("converted"),
    )


def q_ext_events_retention(spark, sf_dir):
    """Day-1 retention cohorts: users grouped by their first active day;
    retained = also active the next calendar day — the standard cohort
    table behind any engagement dashboard.

    Scale shape: distinct (user, day) activity is one aggregation; first
    day per user another; the D+1 membership check is a user-keyed
    left-semi-shaped join against the (user, day) relation. Everything
    shuffles on user_id or (user_id, day); cohort output is |days|-sized.
    """
    ev = t(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    first_day = activity.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    next_day = activity.select(
        "user_id", F.date_sub(F.col("day"), 1).alias("cohort_day")
    ).distinct()
    retained = first_day.join(
        next_day, ["user_id", "cohort_day"], "left_semi"
    ).groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n_retained_d1"))
    cohorts = first_day.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    return cohorts.join(retained, "cohort_day", "left").select(
        "cohort_day",
        "n_users",
        F.coalesce("n_retained_d1", F.lit(0)).alias("n_retained_d1"),
        F.round(
            F.coalesce("n_retained_d1", F.lit(0)).cast("double")
            / F.col("n_users"),
            6,
        ).alias("retention_d1"),
    )


def q_ext_events_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credits the most recent
    preceding click/view by the same user — the standard marketing-
    attribution join behind conversion reporting.

    Scale shape: ONE window pass per user ordered by (ts, event_id) with
    an ignore-nulls last() over preceding rows — no self-join of the
    event stream against itself, no per-event state. The three
    last()-projections share the null pattern (all fire on exactly the
    touch rows), so the attributed fields are mutually consistent.
    """
    ev = t(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def last_touch(col):
        return F.last(F.when(is_touch, col), ignorenulls=True).over(w)

    attributed = ev.select(
        "user_id",
        F.col("event_id").alias("conv_event_id"),
        F.col("ts").alias("conv_ts"),
        "event_type",
        last_touch(F.col("event_id")).alias("touch_event_id"),
        last_touch(F.col("event_type")).alias("touch_type"),
        last_touch(F.col("ts")).alias("touch_ts"),
    )
    return attributed.filter(
        (F.col("event_type") == "purchase")
        & F.col("touch_event_id").isNotNull()
    ).select(
        "user_id", "conv_event_id", "conv_ts",
        "touch_event_id", "touch_type", "touch_ts",
    )


def q_ext_events_sessionize(spark, sf_dir):
    """Event-level sessionization: every event gets its user-relative
    session sequence number (gap >= 30 minutes starts a new session) —
    the row-level companion to ext_session_agg's per-session rollup,
    and the id-assignment pass a sessionized clickstream export needs.

    Scale shape: ONE window pass partitioned by user_id ordered by
    (ts, event_id): a lag to detect gaps and a running sum to number the
    islands — the classic gaps-and-islands plan, shuffling once on the
    high-cardinality user key and never holding more than a partition's
    events in the sort.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(micros).over(w)
    new_session = F.when(
        prev.isNull() | (micros - prev >= 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select("user_id", "event_id", "ts", "event_type", "session_seq")
    )


def q_ext_session_paths(spark, sf_dir):
    """Session path mining: the frequency table of event-type journeys
    (click>view>purchase...) across sessions — the product-analytics
    query behind 'what do users do before buying'.

    Scale shape: builds on the sessionize gaps-and-islands pass; per-
    session path assembly is ONE hash aggregation collecting (ts,
    event_id, event_type) structs, sorted within the session's own
    bounded row set (array_sort is per-group, not a shuffle sort) and
    stringified; the path frequency rollup then map-side combines to
    |distinct paths| rows.
    """
    sess = q_ext_events_sessionize(spark, sf_dir)
    paths = (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.expr(
                "array_join(transform(evs, e -> e.event_type), '>')"
            ).alias("path")
        )
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


def q_ext_events_transitions(spark, sf_dir):
    """First-order Markov transition matrix over event types: for each
    (from, to) pair of consecutive events BY THE SAME USER, the count
    and conditional probability P(to | from) — the model behind
    next-action prediction and funnel-leak analysis (session_paths
    shows whole journeys; this is their bigram factorization).

    Scale shape: one lag window pass per user (same shuffle the
    sessionizer pays), then a map-side-combined count to at most
    |types|^2 rows; the row-conditional probability joins the tiny
    |types|-row margin back by broadcast. Probability = exact-integer
    division, identical on both engines.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
    )
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    margins = counts.groupBy("from_type").agg(
        F.sum("n").alias("n_from")
    )
    return counts.join(F.broadcast(margins), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_from"), 6)
        .alias("p"),
    )


def q_ext_events_anomaly(spark, sf_dir):
    """Daily volume anomalies per event type: z-score of each day's event
    count against that type's across-days mean/stddev, flagged at
    |z| >= 2 — the standard ops-dashboard outlier pass.

    Scale shape: the daily rollup is one map-side-combined aggregation to
    |types| x |days| rows; the per-type moment aggregates (n, sum, sum of
    squares — exact BIGINTs) reduce that to |types| rows, broadcast back
    over the daily frame. The raw stream is scanned once; z is computed
    from integer moments with the identical double expression on both
    engines, so the rounded score is engine-exact.
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    var = (
        (F.col("ss").cast("double") - F.col("s").cast("double") * mean)
        / (F.col("n_days") - 1)
    )
    std = F.sqrt(var)
    z = F.round((F.col("n_events") - mean) / std, 6)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.col("n_days") > 1)
        .select(
            "event_type",
            "day",
            "n_events",
            F.when(std > 0, z).alias("zscore"),
            F.when(std > 0, F.abs(z) >= 2).otherwise(F.lit(False))
            .alias("is_anomaly"),
        )
    )


def q_ext_moving_avg(spark, sf_dir):
    """7-day moving average of daily event volume per type — a RANGE
    window frame (value-based, not row-based: days with no events leave
    a genuine hole in the average's denominator), the time-series
    smoothing pass behind every metrics dashboard.

    Scale shape: the daily rollup map-side combines to |types| x |days|
    rows; the range-frame window then sorts only that small frame. The
    average divides two exact integers with the identical double
    expression on both engines.
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    day_num = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(day_num)
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "n_events",
        F.round(
            F.sum("n_events").over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("ma7"),
    )


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_ext_pivot(spark, sf_dir):
    """Pivot (long -> wide): per user-bucket event counts spread into one
    column per event type — `df.groupBy().pivot()` with an EXPLICIT value
    list, which is the scale-safe form (the list-less variant runs a
    blocking distinct scan over the stream to discover columns; at 100 TB
    the schema must be declared, not inferred).

    Scale shape: a pivot with explicit values compiles to one map-side-
    combined aggregation with |values| conditional counters — identical
    shuffle profile to the plain groupBy count.
    """
    ev = t(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("int")
    )
    return (
        ev.groupBy("user_bucket")
        .pivot("event_type", list(PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(PIVOT_TYPES))
    )


def q_ext_unpivot(spark, sf_dir):
    """Unpivot / melt (wide -> long): the pivoted frame back to (bucket,
    event_type, n) rows via `df.unpivot` (SQL UNPIVOT / stack) — the
    inverse transform a feature store needs when a wide metrics table
    feeds a long-format consumer.

    Scale shape: unpivot is a narrow per-row flatMap (|values| output
    rows per input row), no shuffle at all beyond the upstream pivot's.
    """
    wide = q_ext_pivot(spark, sf_dir)
    return wide.unpivot(
        "user_bucket", list(PIVOT_TYPES), "event_type", "n"
    )


HIST_LO = 0.0
HIST_WIDTH = 10_000.0  # bins are open-ended: values beyond the last
                       # expected bin simply create higher bin indexes


def q_ext_histogram(spark, sf_dir):
    """Fixed-width histogram of lineitem.l_extendedprice — the OLAP
    profiling primitive behind every data-quality dashboard.

    Scale shape: bin assignment is a narrow integer expression; the
    count-per-bin aggregation map-side combines to |bins| rows. No
    sort, no window — the cheapest possible full-column profile.
    """
    li = t(spark, sf_dir, "lineitem")
    bin_idx = F.floor(
        (F.col("l_extendedprice") - F.lit(HIST_LO)) / F.lit(HIST_WIDTH)
    ).cast("int")
    return (
        li.select(bin_idx.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(HIST_LO) + F.col("bin") * F.lit(HIST_WIDTH))
            .alias("bin_lo"),
            (F.lit(HIST_LO) + (F.col("bin") + 1) * F.lit(HIST_WIDTH))
            .alias("bin_hi"),
            "n",
        )
    )


def q_ext_window_running(spark, sf_dir):
    """Cumulative frames: per-user running event count and value sum
    ordered by time (rowsBetween unboundedPreceding..currentRow)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("running_n"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w)
        .cast("double").alias("running_value"),
    )


def q_ext_setops(spark, sf_dir):
    """UNION/INTERSECT/EXCEPT: classify users by click/purchase overlap."""
    ev = t(spark, sf_dir, "events")

    def users(et):
        return ev.filter(F.col("event_type") == et).select("user_id").distinct()

    clicks, purchases = users("click"), users("purchase")
    both = clicks.intersect(purchases).withColumn("cohort", F.lit("both"))
    click_only = clicks.exceptAll(purchases).withColumn(
        "cohort", F.lit("click_only")
    )
    return both.unionByName(click_only).select("cohort", "user_id")


def q_ext_json_extract(spark, sf_dir):
    """Semi-structured extraction: parse the events.props JSON column with
    a typed schema (from_json stays JVM-side/codegen) and aggregate the
    extracted field per event type."""
    ev = t(spark, sf_dir, "events")
    k = F.from_json("props", "k int").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


def approx_distinct_df(spark, sf_dir):
    """Raw approx_count_distinct of users per event type (internal — the
    sketch estimate itself is engine-specific; tests/test_approx.py bounds
    its error)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
    )


def q_ext_approx_distinct(spark, sf_dir):
    """approx_count_distinct made oracle-checkable: emit the exact distinct
    count plus a deterministic within-bound flag (HLL++ default rsd 5%,
    3-sigma allowance as in tests/test_approx.py) — the oracle asserts the
    exact counts and `true`."""
    both = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.countDistinct("user_id").alias("n_exact"),
        )
    )
    within = F.abs(F.col("approx_users") - F.col("n_exact")) <= F.greatest(
        F.lit(1.0), F.col("n_exact") * F.lit(0.15)
    )
    return both.select("event_type", "n_exact", within.alias("within_bound"))


def q_ext_percentiles(spark, sf_dir):
    """Exact quartiles of extended price per return flag (`percentile` is
    the exact interpolating aggregate; percentile_approx is the sketch
    variant for the 100 TB path, checked by error-bound tests instead)."""
    li = t(spark, sf_dir, "lineitem")
    pct = F.expr(
        "percentile(l_extendedprice, array(0.25, 0.5, 0.75))"
    )
    return li.groupBy("l_returnflag").agg(
        F.round(pct.getItem(0), 6).alias("p25"),
        F.round(pct.getItem(1), 6).alias("p50"),
        F.round(pct.getItem(2), 6).alias("p75"),
    )


def q_ext_window_ntile(spark, sf_dir):
    """Customer-spend distribution ranking: ntile(10) deciles plus
    percent_rank / cume_dist over per-customer total spend — the
    segmentation primitive behind "top-decile customers" reports.

    Scale shape: the total order is computed DISTRIBUTED —
    global_row_number range-repartitions the per-customer spend frame on
    (spend, custkey), ranks within each range partition in parallel, and
    joins back broadcast per-partition offsets; ntile/percent_rank/
    cume_dist are then pure arithmetic on (rank, total). |customers| is
    corpus-proportional, so the previous single-partition global window
    was the whole job at 100 TB (the r04 verdict's scale fix; banned
    registry-wide by tests/test_plan_lint.py). The ORDER BY is made
    unique with the key tiebreak, so ntile is deterministic AND
    percent_rank=(rank-1)/(N-1), cume_dist=rank/N hold exactly.
    """
    orders = t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        dec_sum("o_totalprice", 2).alias("spend")
    )
    ranked = global_row_number(
        spend,
        [F.asc("spend"), F.asc("o_custkey")],
        out="_grnk",
        total_out="_gn",
    )
    rnk, n = F.col("_grnk"), F.col("_gn")
    pct_rank = F.when(
        n > 1, (rnk - F.lit(1)) / (n - F.lit(1))
    ).otherwise(F.lit(0.0))
    return ranked.select(
        "o_custkey",
        "spend",
        exact_ntile(rnk, n, 10).alias("decile"),
        F.round(pct_rank, 6).alias("pct_rank"),
        F.round(rnk / n, 6).alias("cume"),
    )


def _dec_prod_sum(a: str, b: str, pa: int = 19, pb: int = 18):
    """Order-independent sum of a product of two double columns: cast each
    factor to decimal FIRST (single-value double->decimal casts round
    identically on both engines), multiply exactly in decimal, sum
    exactly. Factor precisions: pa=19 forces DuckDB onto the int128
    physical type (width-18 operands multiply in int64 and overflow), and
    pa + pb + 1 <= 38 keeps Spark from clamping the product's scale below
    12 — so (19,18) is the one pair exact on BOTH engines."""
    return F.sum(
        F.col(a).cast(f"decimal({pa},6)") * F.col(b).cast(f"decimal({pb},6)")
    ).cast("double")


def q_ext_corr_stats(spark, sf_dir):
    """Numeric column profiling: Pearson correlation, sample covariance,
    and sample standard deviations of (l_quantity, l_extendedprice) per
    return flag — the schema-profiling step before feature selection.

    Built-in corr()/covar_samp() accumulate double co-moments in
    partition-merge order, which is not reproducible against a
    sequential oracle; instead the five raw sums (Sx, Sy, Sxy, Sxx, Syy)
    are computed EXACTLY in decimal (order-independent), and the
    statistics are derived from them with one identical double
    expression tree on both engines — bit-stable at any parallelism.
    Scale shape: one map-side-combined groupBy over the scan; the
    formula work is per-group constant.
    """
    li = t(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("l_quantity").alias("sx"),
        dec_sum("l_extendedprice").alias("sy"),
        _dec_prod_sum("l_quantity", "l_extendedprice", 19, 18).alias("sxy"),
        _dec_prod_sum("l_quantity", "l_quantity", 19, 18).alias("sxx"),
        _dec_prod_sum("l_extendedprice", "l_extendedprice", 19, 18)
        .alias("syy"),
    )
    n = F.col("n").cast("double")
    cov_n = F.col("sxy") - F.col("sx") * F.col("sy") / n
    var_x = F.col("sxx") - F.col("sx") * F.col("sx") / n
    var_y = F.col("syy") - F.col("sy") * F.col("sy") / n
    return sums.select(
        "l_returnflag",
        "n",
        F.round(cov_n / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
        F.round(cov_n / (n - 1), 6).alias("covar_qty_price"),
        F.round(F.sqrt(var_x / (n - 1)), 6).alias("stddev_qty"),
        F.round(F.sqrt(var_y / (n - 1)), 6).alias("stddev_price"),
    )


QUERIES = {
    "ext_window_rank": q_ext_window_rank,
    "ext_window_ntile": q_ext_window_ntile,
    "ext_corr_stats": q_ext_corr_stats,
    "ext_window_lag_lead": q_ext_window_lag_lead,
    "ext_tumbling_agg": q_ext_tumbling_agg,
    "ext_sliding_agg": q_ext_sliding_agg,
    "ext_session_agg": q_ext_session_agg,
    "ext_grouping_sets": q_ext_grouping_sets,
    "ext_cube": q_ext_cube,
    "ext_events_funnel": q_ext_events_funnel,
    "ext_events_retention": q_ext_events_retention,
    "ext_events_attribution": q_ext_events_attribution,
    "ext_events_sessionize": q_ext_events_sessionize,
    "ext_session_paths": q_ext_session_paths,
    "ext_events_transitions": q_ext_events_transitions,
    "ext_events_anomaly": q_ext_events_anomaly,
    "ext_pivot": q_ext_pivot,
    "ext_unpivot": q_ext_unpivot,
    "ext_histogram": q_ext_histogram,
    "ext_moving_avg": q_ext_moving_avg,
    "ext_window_running": q_ext_window_running,
    "ext_setops": q_ext_setops,
    "ext_json_extract": q_ext_json_extract,
    "ext_approx_distinct": q_ext_approx_distinct,
    "ext_percentiles": q_ext_percentiles,
}

_SQL_DEC_PROD_SUM = (
    "CAST(SUM(CAST({a} AS DECIMAL({pa},6)) * CAST({b} AS DECIMAL({pb},6)))"
    " AS DOUBLE)"
)

ORACLES = {
    "ext_window_ntile": f"""
WITH spend AS (
  SELECT o_custkey, {sql_dec_sum('o_totalprice', 2)} AS spend
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, spend,
       ntile(10) OVER w AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM spend WINDOW w AS (ORDER BY spend ASC, o_custkey ASC)
""",
    "ext_corr_stats": f"""
WITH sums AS (
  SELECT l_returnflag, COUNT(*) AS n,
         {sql_dec_sum('l_quantity')} AS sx,
         {sql_dec_sum('l_extendedprice')} AS sy,
         {_SQL_DEC_PROD_SUM.format(a='l_quantity', b='l_extendedprice',
                                    pa=19, pb=18)}
           AS sxy,
         {_SQL_DEC_PROD_SUM.format(a='l_quantity', b='l_quantity',
                                    pa=19, pb=18)} AS sxx,
         {_SQL_DEC_PROD_SUM.format(a='l_extendedprice',
                                   b='l_extendedprice', pa=19, pb=18)}
           AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((sxy - sx * sy / CAST(n AS DOUBLE))
             / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                    * (syy - sy * sy / CAST(n AS DOUBLE))), 6)
         AS corr_qty_price,
       round((sxy - sx * sy / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1), 6) AS covar_qty_price,
       round(sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1)), 6) AS stddev_qty,
       round(sqrt((syy - sy * sy / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1)), 6) AS stddev_price
FROM sums
""",
    "ext_window_rank": """
SELECT user_id, event_id, event_type, value, rn FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= 3
""",
    "ext_window_lag_lead": """
SELECT user_id, event_id, ts,
       lag(event_id) OVER w AS prev_event_id,
       lead(event_id) OVER w AS next_event_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS micros_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    "ext_tumbling_agg": f"""
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start, event_type,
       COUNT(*) AS n_events, {sql_dec_sum('value')} AS sum_value
FROM events GROUP BY 1, 2
""",
    # Each event belongs to exactly 2 sliding windows: the 5-minute bucket
    # it falls in, and the one before.
    "ext_sliding_agg": f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value
  FROM events
)
SELECT window_start, COUNT(*) AS n_events, {sql_dec_sum('value')} AS sum_value
FROM assigned GROUP BY 1
""",
    # Gaps-and-islands replication of session_window semantics: a new
    # session starts when the gap from the previous event is >= 30 minutes;
    # session_end = last ts + gap (Spark's half-open [start, last+gap)).
    "ext_session_agg": f"""
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events, {sql_dec_sum('value')} AS sum_value
FROM islands GROUP BY user_id, session_id
""",
    "ext_grouping_sets": f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       {sql_dec_sum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "ext_events_retention": """
WITH activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
first_day AS (
  SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
),
retained AS (
  SELECT f.cohort_day, COUNT(*) AS n_retained_d1
  FROM first_day f
  WHERE EXISTS (
    SELECT 1 FROM activity a
    WHERE a.user_id = f.user_id AND a.day = f.cohort_day + 1
  )
  GROUP BY f.cohort_day
),
cohorts AS (
  SELECT cohort_day, COUNT(*) AS n_users FROM first_day GROUP BY cohort_day
)
SELECT c.cohort_day, c.n_users,
       COALESCE(r.n_retained_d1, 0) AS n_retained_d1,
       round(COALESCE(r.n_retained_d1, 0)::DOUBLE / c.n_users, 6)
         AS retention_d1
FROM cohorts c LEFT JOIN retained r ON c.cohort_day = r.cohort_day
""",
    "ext_events_funnel": """
WITH fc AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click_ts
  FROM events GROUP BY user_id
),
fp AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
  FROM events e JOIN fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click_ts
  GROUP BY e.user_id
)
SELECT fc.user_id, fc.first_click_ts, fp.first_purchase_ts,
       fp.first_purchase_ts IS NOT NULL AS converted
FROM fc LEFT JOIN fp ON fc.user_id = fp.user_id
""",
    "ext_events_attribution": """
WITH attributed AS (
  SELECT user_id, event_id AS conv_event_id, ts AS conv_ts, event_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_id END IGNORE NULLS) OVER w
           AS touch_event_id,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS) OVER w
           AS touch_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN ts END IGNORE NULLS) OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, conv_event_id, conv_ts,
       touch_event_id, touch_type, touch_ts
FROM attributed
WHERE event_type = 'purchase' AND touch_event_id IS NOT NULL
""",
    "ext_cube": f"""
SELECT event_type, user_bucket, COUNT(*) AS n,
       {sql_dec_sum('value')} AS sum_value
FROM (SELECT event_type, user_id % 4 AS user_bucket, value FROM events)
GROUP BY CUBE (event_type, user_bucket)
""",
    "ext_window_running": """
SELECT user_id, event_id,
       COUNT(*) OVER w AS running_n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
         AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
""",
    "ext_percentiles": """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
FROM lineitem GROUP BY l_returnflag
""",
    "ext_json_extract": """
SELECT event_type, COUNT(json_extract(props, '$.k')) AS n_with_k,
       MIN(json_extract(props, '$.k')::INT) AS min_k,
       MAX(json_extract(props, '$.k')::INT) AS max_k,
       SUM(json_extract(props, '$.k')::INT)::BIGINT AS sum_k
FROM events GROUP BY event_type
""",
    "ext_setops": """
WITH clicks AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
purchases AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'both' AS cohort, user_id FROM (SELECT user_id FROM clicks INTERSECT
                                       SELECT user_id FROM purchases)
UNION ALL
SELECT 'click_only', user_id FROM (SELECT user_id FROM clicks EXCEPT
                                   SELECT user_id FROM purchases)
""",
    "ext_approx_distinct": """
SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
       TRUE AS within_bound
FROM events GROUP BY event_type
""",
    # Gaps-and-islands at event granularity (same gap rule as
    # ext_session_agg, but the islands themselves are the output).
    "ext_events_sessionize": """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                      >= 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, ts, event_type,
       CAST(SUM(new_session) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS session_seq
FROM ordered
""",
    # RANGE frame keyed on integer days-since-epoch, same 7-day window
    # and exact-integer division as the Spark side.
    "ext_moving_avg": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n_events,
       round(CAST(SUM(n_events) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 6) AS ma7
FROM daily
WINDOW w AS (PARTITION BY event_type
             ORDER BY (day - DATE '1970-01-01')
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    # Explicit-value pivot = |values| conditional counts; COUNT never
    # returns NULL, matching the Spark side's na.fill(0).
    "ext_pivot": """
SELECT CAST(user_id % 10 AS INT) AS user_bucket,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY 1
""",
    "ext_unpivot": """
WITH wide AS (
  SELECT CAST(user_id % 10 AS INT) AS user_bucket,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
  FROM events GROUP BY 1
)
SELECT user_bucket, 'click' AS event_type, click AS n FROM wide
UNION ALL
SELECT user_bucket, 'error', error FROM wide
UNION ALL
SELECT user_bucket, 'purchase', purchase FROM wide
UNION ALL
SELECT user_bucket, 'signup', signup FROM wide
UNION ALL
SELECT user_bucket, 'view', view FROM wide
""",
    # DOUBLE casts: DuckDB types the x.0 literals as DECIMAL, which
    # would ship Decimal cells where Spark has doubles.
    "ext_histogram": """
SELECT bin, CAST(bin * 10000.0 AS DOUBLE) AS bin_lo,
       CAST((bin + 1) * 10000.0 AS DOUBLE) AS bin_hi, n
FROM (
  SELECT CAST(floor((l_extendedprice - 0.0) / 10000.0) AS INT) AS bin,
         COUNT(*) AS n
  FROM lineitem GROUP BY 1
)
""",
    # lag-pair counts + row-conditional probability from exact integers.
    "ext_events_transitions": """
WITH steps AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n FROM steps
  WHERE from_type IS NOT NULL GROUP BY 1, 2
),
margins AS (
  SELECT from_type, SUM(n) AS n_from FROM counts GROUP BY 1
)
SELECT c.from_type, c.to_type, c.n,
       round(c.n::DOUBLE / m.n_from, 6) AS p
FROM counts c JOIN margins m ON c.from_type = m.from_type
""",
    # Same gaps-and-islands sessionization; the path is the in-session
    # (ts, event_id)-ordered event_type concatenation.
    "ext_session_paths": """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                      >= 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM ordered
),
paths AS (
  SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, session_seq
)
SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path
""",
    # z from exact integer moments (n, sum, sum of squares) with the
    # identical double expression as the Spark side.
    "ext_events_anomaly": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, COUNT(*) AS n_days, SUM(n_events) AS s,
         SUM(n_events * n_events) AS ss
  FROM daily GROUP BY 1
)
SELECT d.event_type, d.day, d.n_events,
       CASE WHEN sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) *
                       (CAST(s AS DOUBLE) / n_days)) / (n_days - 1)) > 0
            THEN round((d.n_events - CAST(s AS DOUBLE) / n_days) /
                       sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) *
                             (CAST(s AS DOUBLE) / n_days)) / (n_days - 1)),
                       6)
       END AS zscore,
       CASE WHEN sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) *
                       (CAST(s AS DOUBLE) / n_days)) / (n_days - 1)) > 0
            THEN abs(round((d.n_events - CAST(s AS DOUBLE) / n_days) /
                           sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) *
                                 (CAST(s AS DOUBLE) / n_days)) /
                                (n_days - 1)), 6)) >= 2
            ELSE FALSE
       END AS is_anomaly
FROM daily d JOIN stats st ON d.event_type = st.event_type
WHERE n_days > 1
""",
}
