package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. MapReduce-core re-expressions
    "q_word_count" -> ((s, d) => MapReduceOps.wordCount(Tables.documents(s, d))),
    "q_avg_by_key" -> ((s, d) =>
      MapReduceOps.avgByKey(Tables.part(s, d), "p_brand", "p_retailprice")),
    "q_grep" -> ((s, d) => MapReduceOps.grep(Tables.documents(s, d), "data")),
    "q_sort" -> ((s, d) => MapReduceOps.sortedTopN(Tables.lineitem(s, d), 1000)),
    "q_top_k" -> ((s, d) => MapReduceOps.topKWords(Tables.documents(s, d), 20)),
    "q_distinct" -> ((s, d) => MapReduceOps.distinctKeys(Tables.lineitem(s, d))),
    // B. Analytics
    "q1_agg" -> ((s, d) => Analytics.q1(Tables.lineitem(s, d))),
    "q3_join" -> ((s, d) => Analytics.q3(s, d)),
    "q5_join" -> ((s, d) => Analytics.q5(s, d)),
    "q_window" -> ((s, d) => Analytics.topOrdersPerCustomer(Tables.orders(s, d), 3)),
    "q_rollup" -> ((s, d) => Analytics.rollupSummary(Tables.lineitem(s, d))),
    "q_semi_anti" -> ((s, d) =>
      Analytics.customersByOrderPresence(Tables.customer(s, d), Tables.orders(s, d))),
    "q_having" -> ((s, d) => Analytics.bigCustomers(Tables.orders(s, d), 12)),
    // C. Events
    "e_tumbling" -> ((s, d) => Events.tumblingHourly(Tables.events(s, d))),
    "e_sessionize" -> ((s, d) => Events.sessionize(Tables.events(s, d))),
    "e_user_stats" -> ((s, d) => Events.userStats(Tables.events(s, d))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_word_count" ->
      """SELECT word, count(*) AS cnt
         FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
         WHERE word <> '' GROUP BY word""",
    "q_avg_by_key" ->
      "SELECT p_brand, CAST(sum(CAST(round((p_retailprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_val FROM part GROUP BY p_brand",
    "q_grep" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE text LIKE '%data%'",
    "q_sort" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 1000""",
    "q_top_k" ->
      """SELECT word, count(*) AS cnt
         FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
         WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word LIMIT 20""",
    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(round((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
                CAST(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
                CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
                CAST(sum(CAST(round((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
                CAST(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_price,
                count(*) AS count_order
         FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_join" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
                CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1999-01-01'
           AND l_shipdate > TIMESTAMP '1998-06-30'
         GROUP BY o_orderkey, CAST(o_orderdate AS DATE)""",
    "q5_join" ->
      """SELECT n_name, CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name""",
    "q_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders) WHERE rnk <= 3""",
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                CAST(sum(CAST(round((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q_semi_anti" ->
      """SELECT c_custkey, 'with_orders' AS tag FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT c_custkey, 'no_orders' AS tag FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q_having" ->
      """SELECT o_custkey, count(*) AS order_cnt,
                CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_spent
         FROM orders GROUP BY o_custkey HAVING count(*) > 12""",
    "e_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
                event_type, count(*) AS cnt, CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
         FROM events GROUP BY 1, 2""",
    "e_sessionize" ->
      """WITH g AS (
           SELECT user_id, value, epoch_us(ts) AS tsu,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
           FROM events),
         s AS (
           SELECT user_id, value, tsu,
                  CASE WHEN prev IS NULL OR tsu - prev > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM g),
         t AS (
           SELECT user_id, value, tsu,
                  sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu
                                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM s)
         SELECT user_id, session_id, count(*) AS n_events,
                CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
                max(tsu) - min(tsu) AS duration_us
         FROM t GROUP BY user_id, session_id""",
    "e_user_stats" ->
      """SELECT user_id, count(*) AS n_events,
                count(DISTINCT event_type) AS n_types,
                CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen
         FROM events GROUP BY user_id""",
  )
}
