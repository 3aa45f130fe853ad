package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage (SURVEY.md §2.2-§2.6): filter/project,
  * aggregation, joins (broadcast / semi / anti), windows, top-k, set ops,
  * deterministic sampling. These are the `gf`-tool shapes (measure ->
  * comparator -> projection) re-expressed over the TPC-H-ish tables. */
object RelationalQueries {

  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // partial+final hash agg; decimal sums for engine-exact totals
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"), col("sum_price"),
          round(col("avg_disc"), 6).as("avg_disc"), col("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // broadcast dim join chain: revenue per nation (small side broadcast)
    "q_join_nation_revenue" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    }),

    // left semi: customers having at least one 'F' order (apriori-filter shape,
    // reference lwm_miningAndExtension.c:112)
    "q_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey").cast("long").as("c_custkey"))
        .orderBy("c_custkey")
    }),

    // left anti: customers with no orders (infrequent-dump shape,
    // reference lwm_miningAndExtension.c:238)
    "q_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey").cast("long").as("c_custkey"))
        .orderBy("c_custkey")
    }),

    // window ranking: 3 most recent orders per customer (row_number,
    // SURVEY §2.5); deterministic tie-break by orderkey
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"), col("rn").cast("long"))
        .orderBy("o_custkey", "rn")
    }),

    // running aggregate over event time per user (SURVEY §2.5)
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running_value", round(sum(col("value").cast("decimal(18,2)")).over(w).cast("double"), 2))
        .select(col("user_id").cast("long"), col("event_id").cast("long"), col("running_value"))
        .orderBy("user_id", "event_id")
    }),

    // top-k (TakeOrderedAndProject): 10 priciest orders
    "q_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey").cast("long"), col("o_totalprice"))
    }),

    // set ops: event types seen by even users but never with value > 9
    "q_set_ops" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.where(col("user_id") % 2 === 0).select("event_type").distinct()
        .except(ev.where(col("value") > 9).select("event_type").distinct())
        .orderBy("event_type")
    }),

    // deterministic sample: gf -f randomSample analogue with a hash-free
    // reproducible predicate (reference filter.c:398-400 seeds its RNG; the
    // SQL-portable analogue is a modulus on the key)
    "q_sample" -> ((s, dir) => {
      t(s, dir, "orders")
        .where(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"))
        .orderBy("o_orderkey")
    }),

    // rollup (free from Catalyst, SURVEY §2.4 note): doc counts by lang/source
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"), col("n"), col("sum_chars"))
        .orderBy("lang", "source")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  (sum(l_quantity::DECIMAL(18,2)))::DOUBLE AS sum_qty,
        |  (sum(l_extendedprice::DECIMAL(18,2)))::DOUBLE AS sum_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*)::BIGINT AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_nation_revenue" ->
      """SELECT n_name,
        |  (sum(o_totalprice::DECIMAL(18,2)))::DOUBLE AS revenue,
        |  count(*)::BIGINT AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey::BIGINT AS c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey::BIGINT AS c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey::BIGINT AS o_custkey, o_orderkey::BIGINT AS o_orderkey, rn::BIGINT AS rn
        |FROM (SELECT o_custkey, o_orderkey,
        |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_running" ->
      """SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id,
        |  round((sum(value::DECIMAL(18,2)) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE, 2) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey::BIGINT AS o_orderkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_set_ops" ->
      """SELECT DISTINCT event_type FROM events WHERE user_id % 2 = 0
        |EXCEPT
        |SELECT DISTINCT event_type FROM events WHERE value > 9
        |ORDER BY event_type""".stripMargin,

    "q_sample" ->
      """SELECT o_orderkey::BIGINT AS o_orderkey, o_custkey::BIGINT AS o_custkey
        |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |  count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS sum_chars
        |FROM documents GROUP BY ROLLUP(lang, source)
        |ORDER BY lang, source""".stripMargin
  )
}
