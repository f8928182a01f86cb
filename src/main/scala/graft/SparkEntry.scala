package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{ReferenceQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB-runnable twin in [[oracleSql]]
  * (same column names, same deterministic ORDER BY, same rounding) unless the
  * operator is not SQL-expressible, in which case the driver records a
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query (the reference's own end-to-end app, main.c:26-140):
    * inverted index over documents at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.q2InvertedIndex(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.11. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_wordcount"      -> (ReferenceQueries.q1WordCount _),
    "q2_inverted_index" -> (ReferenceQueries.q2InvertedIndex _),
    "q3_distinct_tokens"-> (ReferenceQueries.q3DistinctTokens _),
    "q4_top_words"      -> (ReferenceQueries.q4TopWords _),
    "q5_filter_agg"     -> (RelationalQueries.q5FilterAgg _),
    "q6_groupby_agg"    -> (RelationalQueries.q6GroupByAgg _),
    "q7_join_agg"       -> (RelationalQueries.q7JoinAgg _),
    "q8_multi_join"     -> (RelationalQueries.q8MultiJoin _),
    "q9_semi_join"      -> (RelationalQueries.q9Semi _),
    "q9_anti_join"      -> (RelationalQueries.q9Anti _),
    "q10_window_rank"   -> (RelationalQueries.q10WindowTopOrder _),
    "q11_sort_limit"    -> (RelationalQueries.q11TopOrders _),
    "q12_intersect"     -> (RelationalQueries.q12Intersect _),
    "q12_except"        -> (RelationalQueries.q12Except _),
    "q13_rollup"        -> (RelationalQueries.q13Rollup _),
    "q14_time_bucket"   -> (RelationalQueries.q14TimeBucket _),
  )

  /** DuckDB twins. The tokenizer CTE mirrors graft.functions.Text.tokens:
    * lower → split on [^a-z0-9]+ → drop empties → 255-char cap. */
  private val tokCte: String =
    """WITH tok AS (
      |  SELECT substr(w, 1, 255) AS word, source FROM (
      |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w,
      |           source
      |    FROM documents) raw
      |  WHERE length(w) > 0
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_wordcount" ->
      s"""$tokCte
         |SELECT word, count(*) AS cnt FROM tok
         |GROUP BY word ORDER BY word""".stripMargin,
    "q2_inverted_index" ->
      s"""$tokCte, ts AS (SELECT DISTINCT word, source FROM tok)
         |SELECT word,
         |       word || ' -> [' ||
         |       string_agg(source, ', ' ORDER BY source) || ']' AS line
         |FROM ts GROUP BY word ORDER BY word""".stripMargin,
    "q3_distinct_tokens" ->
      s"""$tokCte
         |SELECT count(DISTINCT word) AS unique_words FROM tok""".stripMargin,
    "q4_top_words" ->
      s"""$tokCte
         |SELECT word, count(*) AS cnt FROM tok
         |GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 10""".stripMargin,
    "q5_filter_agg" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07""".stripMargin,
    "q6_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q7_join_agg" ->
      """SELECT c_mktsegment,
        |       round(sum(o_totalprice), 2) AS total_revenue,
        |       count(*) AS order_cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q8_multi_join" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q9_semi_join" ->
      """SELECT c_nationkey, count(*) AS customers_with_orders
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q9_anti_join" ->
      """SELECT c_nationkey, count(*) AS customers_without_orders
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q11_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "q12_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer
        |ORDER BY custkey""".stripMargin,
    "q12_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,
    "q13_rollup" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |       coalesce(o_orderstatus, 'ALL') AS status,
        |       round(sum(o_totalprice), 2) AS revenue, count(*) AS cnt
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin,
    "q14_time_bucket" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |       event_type, count(*) AS cnt,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
  )
}
