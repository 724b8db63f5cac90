"""Relational core: Q01-Q18 of the declared query surface (SURVEY §2.12).

Pure DataFrame/SQL plans — zero custom execution code. Small dimensions
are broadcast explicitly; everything else is left to Catalyst + AQE
(which at 100 TB picks sort-merge joins shuffled on the join keys, with
skew splitting). Money columns in the testdata are exact 2-decimal
doubles, so DECIMAL(18,2) sums are exact and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..tables import load_table
from .base import Registry, TS_FMT_DUCK, TS_FMT_SPARK

REG = Registry()


def _dec(c: str | F.Column) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def _cents(c: str | F.Column) -> F.Column:
    """Exact integer cents of a 2-decimal money double.

    The money columns are 2-dp values stored as doubles, so
    round(x*100) recovers the exact integer the DECIMAL(18,2) cast
    also rounds to (verified max |x*100 - round(x*100)| ~ 1e-9 across
    all SFs). Summing int64 cents inside codegen is one long add per
    row vs a per-row double->Decimal box — measured 2.3x faster on the
    q11 aggregation (its docstring carries the original proof) — and
    the final divide produces the same single correctly-rounded double
    the DECIMAL sum's cast does, because the integer sum stays under
    2^53 (exact int64->double) for ~9e11 rows per group at max-price
    1e5. Beyond that bound, use the decimal path.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * 100).cast("bigint")


def _fmt(c: str | F.Column) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col, TS_FMT_SPARK)


# ---------------------------------------------------------------- Q01
@REG.add(
    "q01",
    f"""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_returnflag LIKE 'R%' AND l_quantity > 30
    ORDER BY l_orderkey, l_linenumber, l_quantity
    """,
    doc="Scan + projection + predicate (OP-PROJ, OP-FILT-1); pushed to parquet.",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag").like("R%") & (F.col("l_quantity") > 30))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    )


# ---------------------------------------------------------------- Q02
@REG.add(
    "q02",
    """
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word LIKE 's%'
    GROUP BY word
    ORDER BY word, cnt
    """,
    doc="Split + explode + count (OP-EXPL-1, OP-AGG-CNT).",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word").startswith("s"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy("word", "cnt")
    )


# ---------------------------------------------------------------- Q03
@REG.add(
    "q03",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
    FROM events
    WHERE value IS NOT NULL AND event_type IS NOT NULL AND props IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type, cnt
    """,
    doc="Null/completeness predicate (OP-FILT-2), mirrors epss_handler.py:134-142.",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("props").isNotNull()
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type", "cnt")
    )


# ---------------------------------------------------------------- Q04
@REG.add(
    "q04",
    """
    SELECT CAST(props->>'$.k' AS INTEGER) % 10 AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY bucket
    ORDER BY bucket, cnt
    """,
    doc="JSON scalar extraction + modulo bucketing (§2.8 json/regex class).",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket", "cnt")
    )


# ---------------------------------------------------------------- Q05
@REG.add(
    "q05",
    """
    SELECT COALESCE(o.o_orderkey, l.l_orderkey) AS o_orderkey,
           CAST(COALESCE(ROUND(l.sum_price_d, 4), 0) AS DOUBLE) AS sum_price,
           o.o_orderstatus
    FROM orders o
    FULL OUTER JOIN (
        SELECT l_orderkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price_d
        FROM lineitem GROUP BY l_orderkey
    ) l ON o.o_orderkey = l.l_orderkey
    ORDER BY o_orderkey, sum_price, o_orderstatus
    """,
    doc="OP-MERGE rewrite: full-outer join + coalesce = keyed upsert-merge "
    "(mongodb_handler.py:154-175 semantics as a relational plan).",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # integer-cents aggregation (see _cents): the bigint sum divided
    # once is value-identical to SUM(DECIMAL(18,2)) -> ROUND(.,4) ->
    # DOUBLE (the sum has scale 2, so ROUND(.,4) is the identity on
    # the decimal path, and both paths round the same exact rational
    # to the nearest double once)
    li_agg = li.groupBy("l_orderkey").agg(
        F.sum(_cents("l_extendedprice")).alias("sum_cents")
    )
    return (
        orders.join(li_agg, orders.o_orderkey == li_agg.l_orderkey, "full_outer")
        .select(
            F.coalesce("o_orderkey", "l_orderkey").alias("o_orderkey"),
            F.coalesce(F.round(F.col("sum_cents") / 100.0, 4), F.lit(0))
            .cast("double")
            .alias("sum_price"),
            "o_orderstatus",
        )
        .orderBy("o_orderkey", "sum_price", "o_orderstatus")
    )


# ---------------------------------------------------------------- Q06
@REG.add(
    "q06",
    f"""
    SELECT o.o_orderkey,
           strftime(o.o_orderdate, '{TS_FMT_DUCK}') AS o_orderdate,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY o_orderkey, o_orderdate, revenue
    """,
    doc="TPC-H Q3 shape: 3-way join + group agg (OP-JOIN-ENRICH, sort-merge at scale).",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Group-by pushdown, by hand (Catalyst does not reorder an agg
    # below a join): revenue is additive per orderkey and the customer
    # predicate selects whole orders, so lineitem aggregates FIRST —
    # the orders ⨝ lineitem join then moves one pre-summed row per
    # order instead of every line item, and the post-join groupBy
    # disappears. The customer filter becomes a semi join (only
    # membership matters). The lineitem aggregation shuffles the same
    # bytes the join shuffle would have, so this strictly removes the
    # wide join output — the dominant term at scale.
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # the surviving orders side (orders ⋉ BUILDING customers) is the
    # build relation of the final join anyway; probing the SAME
    # broadcast as a semi join BEFORE the lineitem aggregation drops
    # the ~4/5 of line items whose order cannot survive the inner join,
    # so the aggregation and its exchange carry only matching rows
    # (guide §3.2 — pre-filter the big side; the second probe reuses
    # the one BroadcastExchange, so it costs no extra build).
    orders_f = orders.join(cust, orders.o_custkey == cust.c_custkey, "leftsemi")
    li_agg = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey, "leftsemi")
        .groupBy("l_orderkey")
        # integer "ten-thousandths" aggregation (see _cents): cents(price)
        # * cents(1-disc) sums exactly in int64; one divide at the end
        # rounds the same exact rational the DECIMAL product-sum's
        # double cast rounds (sum < 2^53 up to ~9e9 rows/group here,
        # since the per-row product is <= 1e9)
        .agg(
            (
                F.sum(_cents("l_extendedprice") * _cents(F.lit(1) - F.col("l_discount")))
                / 10000.0
            )
            .cast("double")
            .alias("revenue")
        )
    )
    return (
        orders_f.join(li_agg, orders_f.o_orderkey == li_agg.l_orderkey)
        .select(
            "o_orderkey", _fmt("o_orderdate").alias("o_orderdate"), "revenue"
        )
        .orderBy("o_orderkey", "o_orderdate", "revenue")
    )


# ---------------------------------------------------------------- Q07
@REG.add(
    "q07",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    ORDER BY n_name, revenue
    """,
    doc="Star join with broadcast dimensions (OP-JOIN-ENRICH broadcast path).",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    # Collapse the dimension star FIRST (guide §2.4/§3.1): supplier ⨝
    # nation ⨝ region is dim-only work (tiny at any scale — dims don't
    # grow with the fact table), projected to the one mapping the fact
    # probe needs (s_suppkey → n_name). The fact scan then pays ONE
    # broadcast hash probe instead of three chained ones — one build,
    # one probe pass per lineitem row, and two fewer broadcast builds.
    dim = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        # integer ten-thousandths sum (see _cents and the q06 note):
        # measured 0.98s -> 0.56s warm min at sf0.1 for this query —
        # the decimal product-sum was ~45% of its wall
        .agg(
            (
                F.sum(_cents("l_extendedprice") * _cents(F.lit(1) - F.col("l_discount")))
                / 10000.0
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("n_name", "revenue")
    )


# ---------------------------------------------------------------- Q08
@REG.add(
    "q08",
    """
    SELECT o_orderkey, o_orderstatus
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
    ORDER BY o_orderkey, o_orderstatus
    """,
    doc="Left-semi join (OP-JOIN-SEMI, the include-list probe of cveorg_handler.py:76).",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey", "o_orderstatus")
    )


# ---------------------------------------------------------------- Q09
@REG.add(
    "q09",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    ORDER BY c_custkey, c_name
    """,
    doc="Left-anti join (OP-JOIN-ANTI, the exclude-set probe of "
    "cveorg_handler.py:60-74): customers with no 'P'-status order.",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey", "c_name")
    )


# ---------------------------------------------------------------- Q10
@REG.add(
    "q10",
    """
    SELECT e1.user_id AS user_id, CAST(count(*) AS BIGINT) AS cnt
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts BETWEEN e1.ts AND e1.ts + INTERVAL 5 MINUTE
     AND e1.event_id <> e2.event_id
    GROUP BY e1.user_id
    ORDER BY user_id, cnt
    """,
    tags=("id-set",),
    doc="Range/theta self-join: equi on user_id + interval band predicate.",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Band self-join as a RANGE-frame window count (guide §2.4 — the
    # self-join re-reads and re-shuffles/broadcasts the whole relation;
    # the window form is ONE exchange on user_id and an O(n) two-pointer
    # frame per partition instead of a quadratic per-user probe — the
    # only shape that survives 100 TB, where neither side broadcasts).
    # Per event: |{e2 : same user, ts2 in [ts1, ts1+5min]}| includes
    # exactly the self-row the join's event_id<>event_id predicate
    # excludes, so each event contributes (frame_count - 1); summing per
    # user and dropping zero totals reproduces the inner join + groupBy
    # bit-for-bit (a user whose events have no qualifying partner emits
    # no join rows). Precondition (held by the table's key, witnessed by
    # the oracle gate at every SF): event_id is unique — `<>` excludes
    # only the self pairing.
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(0, 300_000_000)  # [ts, ts + 5 min], inclusive
    )
    per_event = ev.select(
        "user_id", (F.count("*").over(w) - F.lit(1)).alias("m")
    )
    return (
        per_event.groupBy("user_id")
        .agg(F.sum("m").alias("cnt"))
        .filter(F.col("cnt") > 0)
        .select("user_id", F.col("cnt").cast("long").alias("cnt"))
        .orderBy("user_id", "cnt")
    )


# ---------------------------------------------------------------- Q11
@REG.add(
    "q11",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS sum_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus, sum_qty, sum_price, avg_disc, count_order
    """,
    doc="TPC-H Q1 shape: partial+final aggregation. Money columns are "
    "2-decimal doubles, so the exact sum is an INTEGER-CENTS sum: "
    "round(x*100) into BIGINT, one long add per row inside codegen, "
    "divide once at the end — value-identical to the DECIMAL(18,2) "
    "path (same single double rounding) and measured 2.3x faster at "
    "sf0.1 (0.51s vs 1.17s min-of-5), because it avoids a per-row "
    "double->Decimal box per money column. Overflow bound: max price "
    "1e5 -> 1e7 cents/row -> int64 holds ~9e11 rows per group; beyond "
    "that (extreme-scale global sums) use the decimal path.",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def cents(c: str) -> F.Column:
        return F.expr(f"cast(round({c} * 100) as bigint)")

    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
            F.round(F.sum(cents("l_extendedprice")) / 100.0, 4).alias("sum_price"),
            F.round(
                (F.sum(cents("l_discount")) / 100.0) / F.count("*"), 4
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_price", "avg_disc", "count_order"
        )
    )


# ---------------------------------------------------------------- Q12
@REG.add(
    "q12",
    f"""
    SELECT o_orderstatus,
           strftime(min(o_orderdate), '{TS_FMT_DUCK}') AS min_date,
           strftime(max(o_orderdate), '{TS_FMT_DUCK}') AS max_date
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus, min_date, max_date
    """,
    doc="Min/max over timestamps (OP-AGG-MIN, cveorg_handler.py:126-127).",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            _fmt(F.min("o_orderdate")).alias("min_date"),
            _fmt(F.max("o_orderdate")).alias("max_date"),
        )
        .orderBy("o_orderstatus", "min_date", "max_date")
    )


# ---------------------------------------------------------------- Q13
@REG.add(
    "q13",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type, n_users
    """,
    doc="Exact distinct aggregation (expand+two-phase under Catalyst).",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type", "n_users")
    )


# ---------------------------------------------------------------- Q14
@REG.add(
    "q14",
    """
    SELECT COALESCE(n.n_name, 'ALL') AS n_name,
           COALESCE(o.o_orderpriority, 'ALL') AS o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY ROLLUP(n.n_name, o.o_orderpriority)
    ORDER BY n_name, o_orderpriority, cnt
    """,
    doc="ROLLUP grouping sets over a 3-way join.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).join(
        orders, orders.o_custkey == cust.c_custkey
    )
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "cnt",
        )
        .orderBy("n_name", "o_orderpriority", "cnt")
    )


# ---------------------------------------------------------------- Q15
@REG.add(
    "q15",
    f"""
    SELECT user_id, event_id, event_type, strftime(ts, '{TS_FMT_DUCK}') AS ts
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_id, event_type, ts
    """,
    doc="Latest-record-per-key (OP-LATEST): the last-writer-wins upsert as a window.",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", _fmt("ts").alias("ts"))
        .orderBy("user_id", "event_id", "event_type", "ts")
    )


# ---------------------------------------------------------------- Q16
@REG.add(
    "q16",
    """
    SELECT user_id, event_id,
           lag(value) OVER w AS lag_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id, lag_value, run_sum
    """,
    doc="Analytic window: lag + running frame sum (exact decimal accumulation).",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lag("value").over(w).alias("lag_value"),
            F.sum(_dec("value"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double")
            .alias("run_sum"),
        )
        .orderBy("user_id", "event_id", "lag_value", "run_sum")
    )


# ---------------------------------------------------------------- Q17
@REG.add(
    "q17",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="Top-k: Catalyst TakeOrderedAndProject — no full sort at scale.",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------- Q18
@REG.add(
    "q18",
    """
    SELECT o_custkey AS custkey FROM orders
    INTERSECT
    SELECT c_custkey AS custkey FROM customer
    ORDER BY custkey
    """,
    doc="Set ops: INTERSECT (left-semi under the hood).",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.select(F.col("o_custkey").alias("custkey"))
        .intersect(cust.select(F.col("c_custkey").alias("custkey")))
        .orderBy("custkey")
    )


# ------------------------------------------------------------ Q29/Q30
@REG.add(
    "q29",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority, n_orders
    """,
    doc="Correlated EXISTS subquery (TPC-H Q4 shape, adapted to this "
    "schema): orders with at least one returned lineitem, counted per "
    "priority — exercising Catalyst's subquery decorrelation "
    "(RewritePredicateSubquery rewrites EXISTS to a left-semi join, "
    "so the physical plan is the q08 semi-join shape with the filter "
    "pushed into the subquery scan).",
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM sq_orders o
        WHERE EXISTS (
            SELECT 1 FROM sq_lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority, n_orders
        """
    )


@REG.add(
    "q30",
    """
    SELECT l.l_partkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS small_lot_revenue
    FROM lineitem l
    WHERE CAST(l.l_quantity AS BIGINT) * 5 * (
        SELECT count(*) FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey
    ) < (
        SELECT CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey
    ORDER BY l.l_partkey, small_lot_revenue
    """,
    doc="Correlated scalar-aggregate subquery (TPC-H Q17 shape): "
    "lineitems whose quantity is below 20% of their part's average "
    "(expressed as 5*qty*n < sum via two correlated scalar subqueries "
    "in exact integer arithmetic), revenue per part. Catalyst "
    "decorrelates the scalar subquery into an aggregate + join "
    "(RewriteCorrelatedScalarSubquery) — l_partkey-keyed aggregates "
    "joined back, no per-row re-execution, which is what makes the "
    "correlated form viable at 100 TB; revenue sums in DECIMAL(18,2).",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("sq30_lineitem")
    return spark.sql(
        """
        SELECT l.l_partkey,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS small_lot_revenue
        FROM sq30_lineitem l
        WHERE CAST(l.l_quantity AS BIGINT) * 5 * (
            SELECT count(*) FROM sq30_lineitem l3 WHERE l3.l_partkey = l.l_partkey
        ) < (
            SELECT CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
            FROM sq30_lineitem l2 WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l.l_partkey
        ORDER BY l.l_partkey, small_lot_revenue
        """
    )


@REG.add(
    "q31",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey NOT IN (
        SELECT n_nationkey FROM nation WHERE n_name LIKE 'A%'
    )
    ORDER BY s_suppkey, s_name
    """,
    doc="Null-aware NOT IN subquery: suppliers outside 'A%' nations. "
    "NOT IN over a subquery has three-valued-logic semantics (one NULL "
    "in the list empties the result), so Catalyst plans it as a "
    "null-aware anti join (BroadcastHashJoin LeftAnti, buildSide "
    "marked NAAJ) rather than the plain anti join of NOT EXISTS — a "
    "distinct join strategy q09/q18 do not exercise. The subquery side "
    "is a pruned dim scan; broadcast keeps it shuffle-free at any "
    "fact size.",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("sq31_supplier")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("sq31_nation")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM sq31_supplier
        WHERE s_nationkey NOT IN (
            SELECT n_nationkey FROM sq31_nation WHERE n_name LIKE 'A%'
        )
        ORDER BY s_suppkey, s_name
        """
    )


@REG.add(
    "q32",
    """
    WITH RECURSIVE walk(root, node) AS (
        SELECT o_orderkey, o_orderkey FROM orders WHERE o_orderkey < 10
        UNION ALL
        SELECT w.root, o.o_orderkey
        FROM walk w JOIN orders o ON o.o_orderkey // 10 = w.node
         AND o.o_orderkey >= 10
    )
    SELECT w.root,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS subtree_price
    FROM walk w JOIN orders o ON o.o_orderkey = w.node
    GROUP BY w.root
    ORDER BY root, n_nodes, subtree_price
    """,
    doc="Recursive CTE (native WITH RECURSIVE, new executable surface "
    "in Spark 4): walk the implicit decimal-digit tree over orderkeys "
    "(parent = key div 10) from the single-digit roots, aggregating "
    "subtree size and DECIMAL-exact price. Spark executes the "
    "recursion as iterated UnionLoop steps — each level is one "
    "equi-join shuffle, depth = tree height (log10 of the keyspace), "
    "the same per-level cost model as the driver-loop connected-"
    "components operator (dedup_components) but declared in SQL. "
    "DuckDB runs the identical recursion natively, making the gate a "
    "cross-engine check of a genuinely recursive plan.",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sq32_orders")
    return spark.sql(
        """
        WITH RECURSIVE walk(root, node) AS (
            SELECT o_orderkey, o_orderkey FROM sq32_orders WHERE o_orderkey < 10
            UNION ALL
            SELECT w.root, o.o_orderkey
            FROM walk w JOIN sq32_orders o ON o.o_orderkey div 10 = w.node
             AND o.o_orderkey >= 10
        )
        SELECT w.root,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS subtree_price
        FROM walk w JOIN sq32_orders o ON o.o_orderkey = w.node
        GROUP BY w.root
        ORDER BY root, n_nodes, subtree_price
        """
    )


@REG.add(
    "q33",
    """
    SELECT n.n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS acctbal
    FROM nation n,
    LATERAL (
        SELECT c_name, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
    ORDER BY n_name, c_name, acctbal
    """,
    doc="Correlated LATERAL subquery with per-row ORDER BY + LIMIT "
    "(top-2 customers by balance for each nation) — the LATERAL join "
    "surface, decorrelated by Catalyst into a ranked join rather "
    "than a per-outer-row re-execution (the same per-group top-N "
    "physics as e_topn_group, reached through SQL LATERAL instead "
    "of a window). DuckDB runs the identical LATERAL natively.",
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("sq33_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("sq33_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS acctbal
        FROM sq33_nation n,
        LATERAL (
            SELECT c_name, c_acctbal FROM sq33_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
        ORDER BY n_name, c_name, acctbal
        """
    )


@REG.add(
    "q34",
    """
    WITH i AS (
        SELECT o_custkey AS custkey FROM orders
        INTERSECT ALL
        SELECT l_suppkey FROM lineitem
    ),
    e AS (
        SELECT o_custkey AS custkey FROM orders
        EXCEPT ALL
        SELECT l_suppkey FROM lineitem
    )
    SELECT custkey, CAST(count(*) AS BIGINT) AS n, 'intersect_all' AS op
    FROM i GROUP BY custkey
    UNION ALL
    SELECT custkey, CAST(count(*) AS BIGINT) AS n, 'except_all' AS op
    FROM e GROUP BY custkey
    ORDER BY custkey, n, op
    """,
    doc="Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): "
    "multiplicity-preserving forms — INTERSECT ALL keeps "
    "min(count_left, count_right) copies per value, EXCEPT ALL "
    "subtracts counts — where q18's DISTINCT forms collapse them. "
    "Catalyst compiles both to count-aggregated joins (no row-by-row "
    "matching), one key shuffle each; the grouped output makes the "
    "multiplicities explicit so the gate verifies the bag algebra "
    "itself.",
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.select(F.col("o_custkey").alias("custkey"))
    s = li.select(F.col("l_suppkey").alias("custkey"))
    i = (
        o.intersectAll(s)
        .groupBy("custkey")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    e = (
        o.exceptAll(s)
        .groupBy("custkey")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    return i.unionByName(e).orderBy("custkey", "n", "op")
