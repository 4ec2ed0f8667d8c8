"""Relational join/agg coverage over the driver's TPC-H-shaped tables.

The reference itself has no joins (SURVEY.md §2.4) — its only join-shaped
ops are positional zips (O-22/O-23). An analytics engine claiming the
reference's query capabilities at 100 TB lives on joins, so this module
exercises every physical join strategy Spark has against a DuckDB oracle:

- broadcast hash join        (star dims: nation, region)
- shuffle / sort-merge join  (orders ⋈ lineitem — both large at scale)
- left-semi join             (EXISTS rewrite)
- left-anti join             (NOT EXISTS rewrite)
- explicitly salted join     (hot-key mitigation AQE can't always save)

Money arithmetic note (hash-exactness): all price/balance columns in the
driver tables are cents-exact doubles. Summing doubles is order-dependent
(Spark partial aggregation vs DuckDB's scan order ⇒ different bits), so
every monetary aggregate here converts to EXACT integer cents first
(``CAST(round(x*100) AS BIGINT)``) and sums bigints — associative, ordering
cannot change the result. Discounted revenue multiplies integer cents by
integer basis points, yielding units of 1e-4 dollars (suffix ``_e4``).
DuckDB ``sum(BIGINT)`` returns HUGEINT, so every oracle sum is wrapped in
``CAST(... AS BIGINT)`` (same dtype lesson as METRICS_ROLLUP_SQL).

Averages divide two exact integers (``sum/count``) — both engines do the
single double division on identical operands, so bits match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cents(col: str) -> Column:
    """Exact integer cents from a cents-exact double column."""
    return F.round(F.col(col) * 100, 0).cast("bigint")


def _sql_cents(col: str) -> str:
    return f"CAST(round({col} * 100) AS BIGINT)"


# revenue in 1e-4 dollars: price_cents * (100 - discount_basis_cents)
def _revenue_e4() -> Column:
    return _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))


_SQL_REVENUE_E4 = (
    f"{_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})"
)


# --- Q1 shape: scan-heavy aggregation with map-side partial combine ----------


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan+agg. One shuffle on a 6-value
    group key; partial aggregation happens map-side, so at 100 TB the
    exchange carries ~6 rows per task regardless of input size. The
    l_shipdate filter is a plain parquet-pushable predicate."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-01-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(_revenue_e4()).alias("sum_disc_price_e4"),
            (
                F.sum(F.col("l_quantity").cast("bigint")) / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum({_sql_cents('l_extendedprice')}) AS BIGINT) AS sum_base_cents,
       CAST(sum({_SQL_REVENUE_E4}) AS BIGINT) AS sum_disc_price_e4,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3 shape: large×large shuffle join + top-n --------------------------------


def revenue_topn(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, n: int = 10
) -> DataFrame:
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, revenue top-n.

    Physical plan intent at 100 TB: orders⋈lineitem is the large×large
    sort-merge/shuffle-hash join (both sides shuffle on orderkey); the
    customer side shrinks to one bigint key column after the segment
    filter, so Spark/AQE broadcasts it when it fits and falls back to
    shuffle when it doesn't — we leave that choice to AQE rather than
    pinning a hint that would be wrong at one of the two scales.
    Top-n is TakeOrdered (per-partition heap + driver merge of n rows),
    never a full sort. Ties broken by o_orderkey for determinism."""
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(F.col("l_shipdate") > F.lit("1997-01-01")).select(
        "l_orderkey", _revenue_e4().alias("_rev_e4")
    )
    return (
        ords.join(cust, ords.o_custkey == cust.c_custkey)
        .join(li, ords.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("_rev_e4").alias("revenue_e4"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue_e4",
        )
        .orderBy(F.col("revenue_e4").desc(), F.col("o_orderkey"))
        .limit(n)
    )


REVENUE_TOPN_SQL = f"""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority,
       CAST(sum({_SQL_REVENUE_E4}) AS BIGINT) AS revenue_e4
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, o_orderkey
LIMIT 10
"""


# --- Q5 shape: multi-way star join, dims broadcast -----------------------------


def star_region_rollup(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: fact chain (lineitem→orders→customer) shuffles on its
    keys; the two dimension joins are EXPLICITLY broadcast — nation (25
    rows) and region (5 rows) are fixed-cardinality dims that stay tiny at
    any corpus scale, so the hint is always right (unlike customer above)."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select("l_orderkey", _revenue_e4().alias("_rev_e4"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("_rev_e4").alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


STAR_REGION_ROLLUP_SQL = f"""
SELECT r_name, n_name,
       CAST(sum({_SQL_REVENUE_E4}) AS BIGINT) AS revenue_e4,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r_name, n_name
"""


# --- semi-join: EXISTS ---------------------------------------------------------


def customers_with_open_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join — "customers with ≥1 open order". Semi-join ships only
    the distinct key set of the right side through the shuffle (no row
    multiplication, no right columns), the correct EXISTS plan at scale."""
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


CUSTOMERS_OPEN_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
"""


# --- anti-join: NOT EXISTS ------------------------------------------------------


def parts_without_early_orders(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Left-anti join — parts with no shipment in the corpus's first quarter.
    Same shuffle shape as the resume filter (checkpoint.pending_documents);
    here against the large fact table with a pushed-down date predicate."""
    early = lineitem.filter(F.col("l_shipdate") < F.lit("1995-04-01")).select(
        "l_partkey"
    )
    return part.join(
        early, part.p_partkey == early.l_partkey, "left_anti"
    ).select("p_partkey", "p_name", "p_brand")


PARTS_WITHOUT_EARLY_ORDERS_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_partkey = p_partkey
    AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
)
"""


# --- explicitly salted hot-key join ---------------------------------------------


N_JOIN_SALTS = 8


def salted_hot_key_join(
    lineitem: DataFrame, region: DataFrame, n_salts: int = N_JOIN_SALTS
) -> DataFrame:
    """Hot-key join with EXPLICIT salting — the 10^12-row mitigation for a
    join key with pathological skew (here ``l_orderkey % 5``: 60k rows onto
    5 keys, so every row lands on one of five reducers in a naive shuffle).

    Pattern: replicate the dim side ``n_salts``× with a salt column, give
    each fact row a deterministic salt in [0, n_salts), join on
    (key, salt) — each hot key now spreads over ``n_salts`` reducers. The
    salt must never leak into the result: the oracle is the PLAIN join.

    At this toy size Spark would broadcast the dim and make salting moot, so
    the join is pinned to the shuffle path (``SHUFFLE_HASH`` hint) — the
    scenario this pattern exists for is a mid-size dim (too big to
    broadcast) meeting a skewed fact, where AQE's skew-split only helps
    sort-merge joins after the skewed shuffle files already exist."""
    fact = lineitem.select(
        (F.col("l_orderkey") % 5).cast("int").alias("hot_key"),
        _revenue_e4().alias("_rev_e4"),
    ).withColumn("_salt", F.pmod(F.hash("_rev_e4"), F.lit(n_salts)))
    dim = region.select(
        F.col("r_regionkey").alias("hot_key"), "r_name"
    ).withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    joined = fact.hint("shuffle_hash").join(dim, ["hot_key", "_salt"])
    return joined.groupBy("r_name").agg(
        F.sum("_rev_e4").alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SALTED_HOT_KEY_JOIN_SQL = f"""
SELECT r_name,
       CAST(sum({_SQL_REVENUE_E4}) AS BIGINT) AS revenue_e4,
       count(*) AS n_rows
FROM lineitem
JOIN region ON CAST(l_orderkey % 5 AS INTEGER) = r_regionkey
GROUP BY r_name
"""


# --- broadcast multi-dim rollup (supplier side) ----------------------------------


def supplier_nation_balance(
    supplier: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Two chained broadcast joins (supplier→nation→region) + rollup —
    the pure star-dim path with zero fact-side shuffle before the agg."""
    return (
        supplier.join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_cents("s_acctbal")).alias("total_acctbal_cents"),
        )
    )


SUPPLIER_NATION_BALANCE_SQL = f"""
SELECT r_name, n_name, count(*) AS n_suppliers,
       CAST(sum({_sql_cents('s_acctbal')}) AS BIGINT) AS total_acctbal_cents
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""
