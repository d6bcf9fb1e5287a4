package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.FrameEngine

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql`) per
  * implemented operator from SURVEY.md §2 and the LLM-pipeline extensions.
  * Column names are aligned between the Spark result and the oracle SQL
  * (the driver sorts columns by name before hashing values).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      // events.parquet stores TIMESTAMP(NANOS): readable only as long
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full toLong explosion of the embeddings table.
    */
  def entry(spark: SparkSession): DataFrame =
    FrameEngine(t(spark, "/root/testdata/sf0.001", "embeddings"),
      indexcols = Seq("vec_id", "label")).toLong("embedding")

  // -------------------------------------------------------------------
  // Parity operators (SURVEY §2)
  // -------------------------------------------------------------------

  private def qAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_qty"))

  private def toLongArray(s: SparkSession, dir: String): DataFrame =
    FrameEngine(t(s, dir, "embeddings"), indexcols = Seq("vec_id", "label"))
      .toLong("embedding")

  private def toLongMap(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(
      col("event_id"),
      from_json(col("props"), MapType(StringType, LongType)).as("props"))
    FrameEngine(ev, indexcols = Seq("event_id")).toLong("props")
  }

  private def toLongNested(s: SparkSession, dir: String): DataFrame = {
    // 64-dim vector reshaped to 8x8 → two explosion levels.
    val m = t(s, dir, "embeddings").select(
      col("vec_id"),
      transform(sequence(lit(0), lit(7)),
        i => slice(col("embedding"), i * lit(8) + lit(1), lit(8))).as("m"))
    FrameEngine(m, indexcols = Seq("vec_id")).toLong("m")
  }

  private def xyFrame(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(
      col("vec_id"),
      slice(col("embedding"), 1, 3).as("x"),
      slice(col("embedding"), 5, 3).as("y"))

  private def toLongMulti(s: SparkSession, dir: String): DataFrame =
    FrameEngine(xyFrame(s, dir), indexcols = Seq("vec_id")).toLong()

  private def toLongShared(s: SparkSession, dir: String): DataFrame =
    FrameEngine(xyFrame(s, dir), indexcols = Seq("vec_id"))
      .toLong(sharedAxes = Map("axis" -> Map("x" -> 0, "y" -> 0)))

  private def toLongScalar(s: SparkSession, dir: String): DataFrame =
    FrameEngine(t(s, dir, "documents"), indexcols = Seq("doc_id"))
      .select("n_chars", "lang").toLong()

  private def toLongStruct(s: SparkSession, dir: String): DataFrame = {
    // Nested-table cells (array<struct>): pos level + field-name level in
    // one step. sort_array makes the collect order deterministic.
    val puffy = t(s, dir, "lineitem").groupBy("l_orderkey")
      .agg(sort_array(collect_list(struct(col("l_quantity"), col("l_discount"))))
        .as("item"))
    FrameEngine(puffy, indexcols = Seq("l_orderkey")).toLong("item")
  }

  private def expandColQ(s: SparkSession, dir: String): DataFrame = {
    val puffy = t(s, dir, "lineitem").groupBy("l_orderkey")
      .agg(collect_list(struct(
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))
        .as("items"))
    FrameEngine(puffy, indexcols = Seq("l_orderkey")).expandCol("items")
  }

  private def toPuffyQ(s: SparkSession, dir: String): DataFrame =
    FrameEngine(
      t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
      indexcols = Seq("l_orderkey", "l_linenumber"))
      .toPuffy(Seq("l_orderkey"),
        aggfunc = (_, c) => sort_array(collect_list(c)))

  private def toPuffyAgg(s: SparkSession, dir: String): DataFrame =
    FrameEngine(
      t(s, dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice"),
      indexcols = Seq("l_returnflag", "l_orderkey", "l_linenumber"))
      .toPuffy(Seq("l_returnflag"), keepMissingIdcs = false,
        aggfunc = (_, c) => avg(c))

  private def multidPivotQ(s: SparkSession, dir: String): DataFrame =
    FrameEngine(t(s, dir, "lineitem"),
      indexcols = Seq("l_orderkey", "l_linenumber"))
      .multidPivot(Seq("l_extendedprice"), Seq("l_returnflag", "l_linestatus"))

  private def multidPivotWideQ(s: SparkSession, dir: String): DataFrame =
    FrameEngine(t(s, dir, "lineitem"),
      indexcols = Seq("l_orderkey", "l_linenumber"))
      .multidPivotWide("l_extendedprice", "l_returnflag", "l_linestatus",
        colValues = Seq("F", "O"))

  private def colApplyQ(s: SparkSession, dir: String): DataFrame =
    FrameEngine(t(s, dir, "customer"), indexcols = Seq("c_custkey"))
      .select("c_name")
      .colApply(upper, "c_name", Some("c_name_upper")).df

  private def rowApplyQ(s: SparkSession, dir: String): DataFrame =
    FrameEngine(
      t(s, dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"),
      indexcols = Seq("l_orderkey", "l_linenumber"))
      .applyRow(cs => cs(0) * (lit(1.0) - cs(1)),
        Seq("l_extendedprice", "l_discount"), "revenue").df

  private def getitemQ(s: SparkSession, dir: String): DataFrame =
    FrameEngine(t(s, dir, "part"), indexcols = Seq("p_partkey"))
      .select("p_name", "p_retailprice").df

  private def dropRenameQ(s: SparkSession, dir: String): DataFrame =
    FrameEngine(t(s, dir, "supplier"), indexcols = Seq("s_suppkey"))
      .drop("s_acctbal")
      .rename(Map("s_name" -> "supplier_name")).df

  // -------------------------------------------------------------------
  // Registry
  // -------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"           -> (qAgg _),
    "to_long_array"    -> (toLongArray _),
    "to_long_map"      -> (toLongMap _),
    "to_long_nested"   -> (toLongNested _),
    "to_long_multi"    -> (toLongMulti _),
    "to_long_shared"   -> (toLongShared _),
    "to_long_scalar"   -> (toLongScalar _),
    "to_long_struct"   -> (toLongStruct _),
    "expand_col"       -> (expandColQ _),
    "to_puffy"         -> (toPuffyQ _),
    "to_puffy_agg"     -> (toPuffyAgg _),
    "multid_pivot"     -> (multidPivotQ _),
    "multid_pivot_wide" -> (multidPivotWideQ _),
    "col_apply"        -> (colApplyQ _),
    "row_apply"        -> (rowApplyQ _),
    "getitem_select"   -> (getitemQ _),
    "drop_rename"      -> (dropRenameQ _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      "SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1",
    "to_long_array" ->
      """SELECT vec_id, label,
         CAST(generate_subscripts(embedding,1)-1 AS INTEGER) AS embedding_level0,
         unnest(embedding) AS embedding
         FROM embeddings""",
    "to_long_map" ->
      """SELECT event_id, k AS props_level0,
         CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS props
         FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)""",
    "to_long_nested" ->
      """WITH t AS (SELECT vec_id,
             [embedding[(i*8+1):(i*8+8)] for i in range(0,8)] AS m
           FROM embeddings),
         l1 AS (SELECT vec_id,
             CAST(generate_subscripts(m,1)-1 AS INTEGER) AS m_level0,
             unnest(m) AS xs FROM t)
         SELECT vec_id, m_level0,
           CAST(generate_subscripts(xs,1)-1 AS INTEGER) AS m_level1,
           unnest(xs) AS m
         FROM l1""",
    "to_long_multi" ->
      """WITH t AS (SELECT vec_id, embedding[1:3] AS x, embedding[5:7] AS y FROM embeddings),
         lx AS (SELECT vec_id, CAST(generate_subscripts(x,1)-1 AS INTEGER) AS x_level0, unnest(x) AS x FROM t),
         ly AS (SELECT vec_id, CAST(generate_subscripts(y,1)-1 AS INTEGER) AS y_level0, unnest(y) AS y FROM t)
         SELECT vec_id, x_level0, x, y_level0, y FROM lx FULL JOIN ly USING (vec_id)""",
    "to_long_shared" ->
      """WITH t AS (SELECT vec_id, embedding[1:3] AS x, embedding[5:7] AS y FROM embeddings),
         lx AS (SELECT vec_id, CAST(generate_subscripts(x,1)-1 AS INTEGER) AS axis, unnest(x) AS x FROM t),
         ly AS (SELECT vec_id, CAST(generate_subscripts(y,1)-1 AS INTEGER) AS axis, unnest(y) AS y FROM t)
         SELECT vec_id, axis, x, y FROM lx FULL JOIN ly USING (vec_id, axis)""",
    "to_long_scalar" ->
      "SELECT doc_id, n_chars, lang FROM documents",
    "to_long_struct" ->
      """WITH s AS (SELECT l_orderkey,
             CAST(row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_quantity, l_discount) - 1 AS INTEGER) AS item_level0,
             l_quantity, l_discount
           FROM lineitem)
         SELECT l_orderkey, item_level0, 'l_quantity' AS item_level1,
                l_quantity AS item FROM s
         UNION ALL
         SELECT l_orderkey, item_level0, 'l_discount' AS item_level1,
                l_discount AS item FROM s""",
    "expand_col" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem",
    "to_puffy" ->
      """SELECT l_orderkey,
         list(l_linenumber ORDER BY l_linenumber) AS l_linenumber,
         list(l_quantity ORDER BY l_quantity) AS l_quantity
         FROM lineitem GROUP BY l_orderkey""",
    "to_puffy_agg" ->
      """SELECT l_returnflag, avg(l_quantity) AS l_quantity,
         avg(l_extendedprice) AS l_extendedprice
         FROM lineitem GROUP BY 1""",
    "multid_pivot" ->
      """SELECT l_returnflag, l_linestatus,
         avg(l_extendedprice) AS l_extendedprice
         FROM lineitem GROUP BY 1, 2""",
    "multid_pivot_wide" ->
      """SELECT l_returnflag,
         avg(CASE WHEN l_linestatus='F' THEN l_extendedprice END) AS F,
         avg(CASE WHEN l_linestatus='O' THEN l_extendedprice END) AS O
         FROM lineitem GROUP BY 1""",
    "col_apply" ->
      "SELECT c_custkey, c_name, upper(c_name) AS c_name_upper FROM customer",
    "row_apply" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
         l_extendedprice * (1 - l_discount) AS revenue FROM lineitem""",
    "getitem_select" ->
      "SELECT p_partkey, p_name, p_retailprice FROM part",
    "drop_rename" ->
      "SELECT s_suppkey, s_name AS supplier_name, s_nationkey FROM supplier",
  )
}
