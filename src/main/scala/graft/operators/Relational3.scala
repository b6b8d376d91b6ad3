package graft.operators

import graft.Tables
import graft.mr.MRRunner
import graft.queries.Entry
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third tranche: window frames/distribution functions, pivot via the
  * dedicated API, unpivot, and the MR combiner path.
  */
object Relational3 {

  private val T = Tables

  /** Word count through the COMBINER path ([[MRRunner.reduceByKeyDF]]) — the
    * partial-aggregation upgrade the reference never had: the shuffle carries
    * one row per (map-partition, key) instead of one per token. Same result
    * as q30's sort-group path, verified by the shared oracle.
    */
  private def countMap(line: String): IterableOnce[(String, String)] =
    line.split(' ').iterator.filter(_.nonEmpty).map(_ -> "1")

  val entries: Seq[Entry] = Seq(
    // q59: MR wordcount via map-side combine (reduceByKeyDF); oracle shared
    // with q30 — identical results from a different physical strategy.
    Entry(
      "q59_mr_combiner",
      (s, d) => {
        import s.implicits._
        val lines = T.documents(s, d).select(col("text")).as[String]
        MRRunner
          .reduceByKeyDF(s, lines, countMap, (a, b) => (a.toLong + b.toLong).toString, 32)
          .toDF("word", "cnt_str")
          .select(col("word"), col("cnt_str").cast("long").as("cnt"))
          .orderBy(col("word"))
      },
      Some("""SELECT word, count(*) AS cnt FROM (
             | SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
             |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin)),

    // q73: inverted index through the MR surface (registry user_id
    // "invertedindex") — the second canonical MapReduce job: full
    // scan → flatMap(word, doc) → hash shuffle → key-sorted grouped reduce
    // emitting sorted distinct posting lists.
    Entry(
      "q73_mr_inverted_index",
      (s, d) => {
        import s.implicits._
        val lines = T.documents(s, d)
          .select(concat(col("doc_id"), lit(":"), col("text")))
          .as[String]
        MRRunner
          .transform(s, lines, graft.mr.JobRegistry.get("invertedindex"), 32)
          .toDF("word", "doc_ids")
          .orderBy(col("word"))
      },
      Some("""WITH t AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS word, doc_id
             |  FROM documents)
             |SELECT word,
             | string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
             |FROM t WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin)),

    // q60: window frames + distribution functions — running revenue (rows
    // frame), ntile quartile, cumulative distribution per customer's orders.
    Entry(
      "q60_window_frames",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice")).over(wf), 2).as("running_spend"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(cume_dist().over(w), 4).as("cd"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |   ORDER BY o_orderdate, o_orderkey
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
             | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             | round(cume_dist() OVER w, 4) AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // q61: pivot through the dedicated RelationalGroupedDataset.pivot API
    // with a declared value list (no extra pass to discover values — the
    // scale-correct form); one conditional-agg pass underneath.
    Entry(
      "q61_pivot_api",
      (s, d) =>
        T.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(
            col("o_orderstatus"),
            col("1-URGENT").as("urgent"),
            col("2-HIGH").as("high"),
            col("3-MEDIUM").as("medium"),
            col("4-NOT SPECIFIED").as("notspec"),
            col("5-LOW").as("low"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             | count(*) FILTER (o_orderpriority='1-URGENT') AS urgent,
             | count(*) FILTER (o_orderpriority='2-HIGH') AS high,
             | count(*) FILTER (o_orderpriority='3-MEDIUM') AS medium,
             | count(*) FILTER (o_orderpriority='4-NOT SPECIFIED') AS notspec,
             | count(*) FILTER (o_orderpriority='5-LOW') AS low
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // q62: unpivot (wide→long) via the dedicated Dataset.unpivot API over a
    // per-segment aggregate; oracle as UNION ALL for portability.
    Entry(
      "q62_unpivot",
      (s, d) =>
        T.customer(s, d)
          .groupBy(col("c_mktsegment"))
          .agg(
            round(sum(col("c_acctbal")), 2).as("total_bal"),
            round(avg(col("c_acctbal")), 2).as("avg_bal"),
            count(lit(1)).cast("double").as("n_cust"))
          .unpivot(
            Array(col("c_mktsegment")),
            Array(col("total_bal"), col("avg_bal"), col("n_cust")),
            "metric",
            "value")
          .orderBy(col("c_mktsegment"), col("metric")),
      Some("""WITH a AS (SELECT c_mktsegment,
             |  round(sum(c_acctbal),2) AS total_bal,
             |  round(avg(c_acctbal),2) AS avg_bal,
             |  CAST(count(*) AS DOUBLE) AS n_cust
             | FROM customer GROUP BY c_mktsegment)
             |SELECT c_mktsegment, 'total_bal' AS metric, total_bal AS value FROM a
             |UNION ALL SELECT c_mktsegment, 'avg_bal', avg_bal FROM a
             |UNION ALL SELECT c_mktsegment, 'n_cust', n_cust FROM a
             |ORDER BY c_mktsegment, metric""".stripMargin))
  )
}
