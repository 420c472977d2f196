package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The reference queries as Spark-SQL TEXT (the notebook's entry path,
  * SURVEY.md §3.1) — same shapes the reference uses: RIGHT JOIN with the
  * IS-abandoned filter, FULL JOIN dim rollup, GROUP BY on a select alias,
  * HAVING on an alias, CTE + backtick identifiers. SqlParitySpec asserts
  * each text produces exactly the DataFrame builder's rows, so both entry
  * points stay semantically locked together.
  *
  * (Reference: `TyreStore Challenge.py:180-188, 296-308, 449-474,
  * 531-543`; GROUP BY/HAVING-on-alias per `py:242,450,468`.)
  */
object CartSql {

  private def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.registerFor(spark, dir, sql) // only the tables this text names
    spark.sql(sql)
  }

  /** q01 as SQL (py:180-188 shape). */
  def q01Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """SELECT l_partkey,
      |       count(DISTINCT o_orderkey) AS abandoned_orders,
      |       coalesce(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)
      |         AS abandoned_value
      |FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderstatus = 'O'
      |GROUP BY l_partkey
      |ORDER BY abandoned_orders DESC, l_partkey ASC
      |LIMIT 100""".stripMargin)

  /** q05 as SQL: agg subquery + FULL JOIN + zero-fill (py:296-308 shape). */
  def q05Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """SELECT n_name,
      |       coalesce(total_abandoned_orders, 0) AS total_abandoned_orders,
      |       coalesce(total_abandoned_value, 0.0) AS total_abandoned_value
      |FROM (
      |  SELECT c_nationkey,
      |         count(DISTINCT o_orderkey) AS total_abandoned_orders,
      |         coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)
      |           AS total_abandoned_value
      |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderstatus = 'O'
      |  GROUP BY c_nationkey) agg
      |FULL JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY total_abandoned_orders DESC, n_name ASC""".stripMargin)

  /** q08 as SQL: GROUP BY select-alias + zero-pad idiom (py:449-472 shape). */
  def q08Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """SELECT concat(CAST(year(launch_ts) AS STRING), '-',
      |              right(concat('0', CAST(month(launch_ts) AS STRING)), 2)) AS launch_month,
      |       count(*) AS n_parts,
      |       sum(coalesce(abandoned_orders, 0)) AS total_abandoned_orders
      |FROM (
      |  SELECT l_partkey, min(o_orderdate) AS launch_ts
      |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY l_partkey) launch
      |LEFT JOIN (
      |  SELECT l_partkey, count(DISTINCT o_orderkey) AS abandoned_orders
      |  FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'O'
      |  GROUP BY l_partkey) ab
      |USING (l_partkey)
      |GROUP BY launch_month
      |ORDER BY launch_month ASC""".stripMargin)

  /** q06 as SQL: supplier-nation variant of q05 — chained LEFT then
    * RIGHT join (left-deep, the reference's py:318-330 shape), agg
    * subquery, FULL JOIN zero-fill. */
  def q06Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """SELECT n_name,
      |       coalesce(total_abandoned_orders, 0) AS total_abandoned_orders,
      |       coalesce(total_abandoned_value, 0.0) AS total_abandoned_value
      |FROM (
      |  SELECT s_nationkey,
      |         count(DISTINCT o_orderkey) AS total_abandoned_orders,
      |         coalesce(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)
      |           AS total_abandoned_value
      |  FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
      |       RIGHT JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'O'
      |  GROUP BY s_nationkey) agg
      |FULL JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY total_abandoned_orders DESC, n_name ASC""".stripMargin)

  /** q07 as SQL: equi-join on a COMPUTED key (the reference's zip-concat
    * join, py:343 — here the rebuilt customer name). */
  def q07Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """SELECT c_mktsegment,
      |       count(DISTINCT o_orderkey) AS abandoned_orders,
      |       coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)
      |         AS abandoned_value
      |FROM orders LEFT JOIN customer
      |  ON concat('Customer#', lpad(CAST(o_custkey AS STRING), 9, '0')) = c_name
      |WHERE o_orderstatus = 'O'
      |GROUP BY c_mktsegment
      |ORDER BY abandoned_orders DESC, c_mktsegment ASC""".stripMargin)

  /** q09 as SQL: HAVING-on-derived-launch-year via a scalar subquery
    * (py:415-439 shape), top-100. */
  def q09Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """SELECT l_partkey, year(launch_ts) AS launch_year,
      |       coalesce(abandoned_orders, 0) AS abandoned_orders
      |FROM (
      |  SELECT l_partkey, min(o_orderdate) AS launch_ts,
      |         CASE WHEN l_partkey IS NULL THEN 0
      |              ELSE count(DISTINCT CASE WHEN o_orderstatus = 'O'
      |                                       THEN o_orderkey END) END AS abandoned_orders
      |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY l_partkey) launch
      |WHERE year(launch_ts) = (SELECT year(min(o_orderdate)) FROM orders)
      |ORDER BY abandoned_orders DESC, l_partkey ASC
      |LIMIT 100""".stripMargin)

  /** q11 as SQL: the DAILY gap-fill (py:496-515 shape) — 90-day spine
    * anchored on MAX(o_orderdate) via a bounds CTE, two fact grains. */
  def q11Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """WITH bounds AS (
      |  SELECT CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
      |spine AS (
      |  SELECT explode(sequence(date_sub(hi, 89), hi, interval 1 day)) AS date FROM bounds),
      |o_agg AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         count(DISTINCT o_orderkey) AS o_cnt,
      |         coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS o_val
      |  FROM orders WHERE o_orderstatus = 'O'
      |  GROUP BY date),
      |i_agg AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         coalesce(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS i_cnt,
      |         coalesce(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS i_val
      |  FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'O'
      |  GROUP BY date)
      |SELECT date,
      |       coalesce(o_cnt, 0) AS total_abandoned_orders,
      |       coalesce(o_val, 0.0) AS total_value_orders,
      |       coalesce(i_cnt, 0.0) AS total_abandoned_items,
      |       coalesce(i_val, 0.0) AS total_value_items
      |FROM spine LEFT JOIN o_agg USING (date)
      |           LEFT JOIN i_agg USING (date)
      |ORDER BY date ASC""".stripMargin)

  /** q10 as SQL: the reference's first table-materializing query
    * (py:449-515 shape) — calendar spine from a bounds CTE, two
    * aggregated fact subqueries at different grains LEFT JOINed onto the
    * spine, GROUP BY on a select alias, multi-key ORDER BY on aliases. */
  def q10Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """WITH bounds AS (
      |  SELECT CAST(date_format(min(o_orderdate), 'yyyy-MM-01') AS DATE) AS lo,
      |         CAST(date_format(max(o_orderdate), 'yyyy-MM-01') AS DATE) AS hi
      |  FROM orders),
      |spine AS (
      |  SELECT explode(sequence(lo, hi, interval 1 month)) AS month_start FROM bounds),
      |o_agg AS (
      |  SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS month_start,
      |         count(DISTINCT o_orderkey) AS o_cnt,
      |         coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS o_val
      |  FROM orders WHERE o_orderstatus = 'O'
      |  GROUP BY month_start),
      |i_agg AS (
      |  SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS month_start,
      |         coalesce(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS i_cnt,
      |         coalesce(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS i_val
      |  FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'O'
      |  GROUP BY month_start)
      |SELECT concat(CAST(year(month_start) AS STRING), '-',
      |              right(concat('0', CAST(month(month_start) AS STRING)), 2)) AS year_month,
      |       coalesce(o_cnt, 0) AS total_abandoned_orders,
      |       coalesce(o_val, 0.0) AS total_value_orders,
      |       coalesce(i_cnt, 0.0) AS total_abandoned_items,
      |       coalesce(i_val, 0.0) AS total_value_items
      |FROM spine LEFT JOIN o_agg USING (month_start)
      |           LEFT JOIN i_agg USING (month_start)
      |ORDER BY year_month ASC, total_abandoned_orders DESC""".stripMargin)

  /** q12 as SQL: the 6-way mixed-outer export join (py:531-543 shape). */
  def q12Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |       o_totalprice, o_orderpriority, c_name, c_mktsegment, n_name, r_name,
      |       count(l_linenumber) AS n_items,
      |       coalesce(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS items_value,
      |       coalesce(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_quantity,
      |       count(DISTINCT s_name) AS n_suppliers
      |FROM lineitem
      |RIGHT JOIN orders ON l_orderkey = o_orderkey
      |LEFT JOIN customer ON o_custkey = c_custkey
      |LEFT JOIN nation ON c_nationkey = n_nationkey
      |LEFT JOIN region ON n_regionkey = r_regionkey
      |LEFT JOIN part ON l_partkey = p_partkey
      |LEFT JOIN supplier ON l_suppkey = s_suppkey
      |WHERE o_orderstatus = 'O'
      |GROUP BY o_orderkey, CAST(o_orderdate AS DATE), o_totalprice, o_orderpriority,
      |         c_name, c_mktsegment, n_name, r_name
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 50""".stripMargin)

  /** q02's pair stage as the reference's LITERAL SQL shape (py:197-213):
    * comma join + RIGHT JOIN whose ON references the first comma operand
    * (parses left-deep on Spark 4.1.2 — SqlParitySpec pins it against the
    * explicit rewrite), CASE-built canonical pair key + row_number rank=1
    * dedup of (a,b)/(b,a). Two deliberate deviations from the reference
    * text, both correctness fixes: a '_' separator inside the CASE concat
    * (the reference's bare concat collides e.g. (1,23) with (12,3)) and a
    * unique ORDER BY tiebreak (the reference's bare `ORDER BY count DESC
    * LIMIT 100` is nondeterministic across ties). */
  def q02PairsRefShapeSql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """SELECT product1 AS part_a, product2 AS part_b,
      |       total_abandoned_carts AS abandoned_orders
      |FROM (
      |    SELECT c1.l_partkey AS product1, c2.l_partkey AS product2,
      |           COUNT(DISTINCT o.o_orderkey) AS total_abandoned_carts,
      |           row_number() OVER (PARTITION BY CASE
      |                 WHEN c1.l_partkey < c2.l_partkey
      |                 THEN CONCAT(CAST(c1.l_partkey AS varchar(50)), '_', CAST(c2.l_partkey AS varchar(50)))
      |                 ELSE CONCAT(CAST(c2.l_partkey AS varchar(50)), '_', CAST(c1.l_partkey AS varchar(50)))
      |                 END ORDER BY c1.l_partkey, c2.l_partkey) AS rank
      |    FROM lineitem AS c1, lineitem AS c2
      |    RIGHT JOIN orders AS o ON c1.l_orderkey = o.o_orderkey
      |    WHERE o.o_orderstatus = 'O'
      |      AND c1.l_orderkey = c2.l_orderkey
      |      AND c1.l_partkey <> c2.l_partkey
      |    GROUP BY c1.l_partkey, c2.l_partkey
      |)
      |WHERE rank = 1
      |ORDER BY total_abandoned_carts DESC, part_a ASC, part_b ASC
      |LIMIT 100""".stripMargin)

  /** q03 in the reference's LITERAL dialect (py:222-246): 3-arg
    * `DATEADD(MONTH,-n,'${carts.last_datetime}')` over a conf-substituted
    * scalar param — Spark 4.1.2 parses the Databricks form natively (unit
    * keyword first arg, ANSI string→timestamp coercion on the literal), so
    * a user pasting reference SQL needs NO rewrite. The param is captured
    * the reference's way too: scalar fetch → `spark.conf.set` → `${var}`
    * substitution (S8/S9, py:78-82). Deliberate deviations, as in every
    * twin: engine column names and a unique ORDER BY tiebreak (the
    * reference's bare `ORDER BY increase DESC LIMIT 100` is
    * nondeterministic across ties). */
  def q03RefDialectSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.register(spark, dir, Seq("orders"))
    graft.sources.Ingest.captureScalar(spark,
      spark.sql("SELECT date_format(max(o_orderdate), 'yyyy-MM-dd') FROM orders"),
      "carts.last_datetime")
    run(spark, dir,
      """SELECT abandonment_last_month.l_partkey,
        |       COALESCE(abandonment_month_before_last.total_abandoned_carts,0) AS prev_month_orders,
        |       COALESCE(abandonment_last_month.total_abandoned_carts,0) AS last_month_orders,
        |       COALESCE(abandonment_last_month.total_abandoned_carts,0) - COALESCE(abandonment_month_before_last.total_abandoned_carts,0) AS increase
        |FROM (
        |    SELECT lineitem.l_partkey, COUNT(DISTINCT orders.o_orderkey) AS total_abandoned_carts
        |    FROM lineitem
        |    RIGHT JOIN orders ON lineitem.l_orderkey = orders.o_orderkey
        |    WHERE orders.o_orderstatus = 'O' AND YEAR(orders.o_orderdate) = YEAR(DATEADD(MONTH,-1,'${carts.last_datetime}')) AND MONTH(orders.o_orderdate) = MONTH(DATEADD(MONTH,-1,'${carts.last_datetime}'))
        |    GROUP BY lineitem.l_partkey
        |) AS abandonment_last_month
        |LEFT JOIN (
        |    SELECT lineitem.l_partkey, COUNT(DISTINCT orders.o_orderkey) AS total_abandoned_carts
        |    FROM lineitem
        |    RIGHT JOIN orders ON lineitem.l_orderkey = orders.o_orderkey
        |    WHERE orders.o_orderstatus = 'O' AND YEAR(orders.o_orderdate) = YEAR(DATEADD(MONTH,-2,'${carts.last_datetime}')) AND MONTH(orders.o_orderdate) = MONTH(DATEADD(MONTH,-2,'${carts.last_datetime}'))
        |    GROUP BY lineitem.l_partkey
        |) AS abandonment_month_before_last
        |  ON abandonment_last_month.l_partkey = abandonment_month_before_last.l_partkey
        |GROUP BY abandonment_last_month.l_partkey, prev_month_orders, last_month_orders
        |HAVING increase > 0
        |ORDER BY increase DESC, abandonment_last_month.l_partkey ASC
        |LIMIT 100""".stripMargin)
  }

  /** q04 as SQL: HAVING on an alias (py:242/274 shape). */
  def q04Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """WITH anchor AS (SELECT year(max(o_orderdate)) AS y FROM orders),
      |cur AS (
      |  SELECT l_partkey, count(DISTINCT o_orderkey) AS last_year_orders
      |  FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'O' AND year(o_orderdate) = (SELECT y FROM anchor)
      |  GROUP BY l_partkey),
      |pre AS (
      |  SELECT l_partkey, count(DISTINCT o_orderkey) AS prev_year_orders
      |  FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'O' AND year(o_orderdate) = (SELECT y - 1 FROM anchor)
      |  GROUP BY l_partkey)
      |SELECT cur.l_partkey,
      |       coalesce(prev_year_orders, 0) AS prev_year_orders,
      |       last_year_orders,
      |       last_year_orders - coalesce(prev_year_orders, 0) AS increase
      |FROM cur LEFT JOIN pre ON cur.l_partkey = pre.l_partkey
      |GROUP BY cur.l_partkey, prev_year_orders, last_year_orders
      |HAVING increase > 0
      |ORDER BY increase DESC, cur.l_partkey ASC
      |LIMIT 100""".stripMargin)

  /** q22 as SQL: analytic windows (lag, framed running sum, whole-partition
    * sum, rank) in OVER-clause text — the §2.5 surface through the SQL
    * entry path. */
  def q22Sql(spark: SparkSession, dir: String): DataFrame = run(spark, dir,
    """WITH m AS (
      |  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY yr, mo)
      |SELECT yr, mo,
      |       CAST(rev AS DOUBLE) AS revenue,
      |       CAST(lag(rev, 1) OVER (PARTITION BY yr ORDER BY mo ASC) AS DOUBLE)
      |         AS prev_revenue,
      |       CAST(rev - lag(rev, 1) OVER (PARTITION BY yr ORDER BY mo ASC) AS DOUBLE)
      |         AS mom_delta,
      |       CAST(sum(rev) OVER (PARTITION BY yr ORDER BY mo ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS ytd_revenue,
      |       CAST(rev AS DOUBLE) / CAST(sum(rev) OVER (PARTITION BY yr) AS DOUBLE)
      |         AS yr_share,
      |       row_number() OVER (PARTITION BY yr ORDER BY rev DESC, mo ASC) AS rev_rank
      |FROM m
      |ORDER BY yr ASC, mo ASC""".stripMargin)
}
