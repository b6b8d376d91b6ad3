package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.queries.Entry
import graft.{Tables => T}

/** WordPiece-style tokenizer (Wu et al. 2016 / BERT lineage) — the FOURTH
  * tokenizer family beside char-BPE (q83/q282), byte-BPE (q297) and the
  * unigram LM (q309): segmentation is GREEDY LONGEST-MATCH-FIRST against
  * a fixed vocabulary with position classes (word-initial vs continuation
  * — the `##` distinction, carried here as a boolean class), not a merge
  * list (BPE) or a Viterbi cost argmin (unigram).
  *
  * Vocabulary fit is the declared count-based variant (the q194
  * frozen-model posture — the likelihood-driven trainer is offline):
  * every substring (≤ 8 chars) of the distinct-word table weighted by
  * corpus counts, kept at ≥ 4 % of total tokens, unioned with all single
  * characters in BOTH classes so no word is ever out-of-vocabulary (the
  * real WordPiece [UNK] rule is implemented — a position with no match
  * falls back to the 1-char piece — but cannot fire by construction; the
  * fixture segments at ≈ 3.7 pieces/token, so the greedy path is
  * genuinely exercised, not word-passthrough).
  *
  * Scale posture (the q309 discipline): the corpus collapses through ONE
  * (source, word) exchange; the fit, the per-(word, pos) longest-match
  * jump table, and the greedy walk all run over the DISTINCT-WORD
  * table (vocab-bounded — 31 rows here, |vocab|-ish at 100 TB), so the
  * iterations cost nothing at scale. The walk's round count is DERIVED
  * from max(length(word)) over that table (each round consumes ≥ 1
  * char, so maxWl rounds always finish every word — r18 advice: a
  * hard-coded 8 was sufficient only because the longest fixture word is
  * 8 chars, and a longer word would have been under-segmented
  * IDENTICALLY to the 8-round oracle, passing parity while diverging
  * from real WordPiece). The static oracle still unrolls exactly 8
  * steps, so the suite pins maxWl == 8 on the fixture: a fixture drift
  * past 8 now breaks the pin (and the hash) loudly instead of silently.
  *
  * Oracle: the same fit in SQL CTEs and the same 8 greedy steps unrolled,
  * each step's longest match a correlated scalar subquery against the
  * vocab CTE; per-word digests fold the class marker + piece characters,
  * so a single wrong piece boundary anywhere breaks the hash.
  *
  * Reference scope (JasperWoo/MapReduceCore): the reference tokenizes on
  * delimiters only (user_tasks.cc:15); subword segmentation is the job
  * its LLM users would write as map tasks, made first-class.
  */
object WordPiece {

  private val P = 2147483647L

  val entries: Seq[Entry] = Seq(

    Entry(
      "q327_wordpiece_encode",
      (s, d) => {
        val wc = T.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("source"), col("word"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // feeds the fit AND the final rollup
        // materialized (vocab-bounded, tiny): dw feeds the fit, the jump
        // table, the greedy walk AND the eager maxWl bound below — without
        // this the maxWl .head action re-runs the distinct-word aggregation
        // as a separate job at plan-construction time (r19 ADVICE).
        val dw = wc.groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))
          .localCheckpoint()
        val tot = dw.agg(sum(col("cnt")).as("t"))
        val cand = dw
          .select(col("word"), col("cnt"),
            explode(expr("sequence(1, length(word))")).as("pos"))
          .select(col("word"), col("cnt"), col("pos"),
            explode(expr("sequence(1, 8)")).as("len"))
          .filter(expr("pos + len - 1 <= length(word)"))
          .select(expr("substring(word, pos, len)").as("piece"),
            expr("pos = 1").as("cls"), col("cnt"))
        val vfreq = cand
          .groupBy(col("piece"), col("cls"))
          .agg(sum(col("cnt")).as("c"))
          .crossJoin(broadcast(tot))
          .filter(expr("c * 25 >= t"))
          .select(col("piece"), col("cls"))
        val chars = dw
          .select(explode(expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
            .as("piece"))
          .distinct()
          .crossJoin(broadcast(
            s.createDataFrame(Seq(Tuple1(true), Tuple1(false)))
              .toDF("cls")))
        val vocab = vfreq.union(chars).distinct().localCheckpoint()
        // longest-match jump table per (word, start position, class)
        val jump = dw
          .select(col("word"),
            explode(expr("sequence(1, length(word))")).as("pos"))
          .select(col("word"), col("pos"),
            explode(expr("sequence(1, 8)")).as("len"))
          .filter(expr("pos + len - 1 <= length(word)"))
          .withColumn("piece", expr("substring(word, pos, len)"))
          .withColumn("cls", expr("pos = 1"))
          .join(vocab, Seq("piece", "cls"))
          .groupBy(col("word"), col("pos"))
          .agg(max(col("len")).as("jl"))
        // greedy walk over the distinct-word table; rounds = the LONGEST
        // word's length (1-row agg over the vocab-bounded table — the
        // walk advances ≥ 1 char per round, so this always terminates
        // every word regardless of corpus)
        val maxWl = Option(dw.agg(max(length(col("word")))).head.get(0))
          .map(_.asInstanceOf[Number].intValue).getOrElse(1)
        var g = dw
          .select(col("word"), expr("length(word)").as("wl"),
            lit(1).as("pos"), lit(0L).as("np"), lit(0L).as("dg"))
        for (_ <- 1 to maxWl) {
          g = g.join(jump, Seq("word", "pos"), "left")
            .select(col("word"), col("wl"),
              expr("IF(pos > wl, pos, pos + coalesce(jl, 1))").as("npos"),
              expr("IF(pos > wl, np, np + 1L)").as("np"),
              expr(s"IF(pos > wl, dg, aggregate(" +
                s"sequence(pos, pos + coalesce(jl, 1) - 1), " +
                s"(dg * 131L + IF(pos = 1, 2L, 1L)) % ${P}L, " +
                s"(a, j) -> (a * 131L + ascii(substring(word, j, 1))) " +
                s"% ${P}L))").as("dg"))
            .withColumnRenamed("npos", "pos")
        }
        wc.join(g.select(col("word"), col("np"), col("dg")), Seq("word"))
          .groupBy(col("source"))
          .agg(sum(col("cnt")).as("n_tokens"),
            sum(expr("np * cnt")).as("n_pieces"),
            expr(s"CAST(sum((dg * (cnt % ${P}L)) % ${P}L) % ${P}L AS BIGINT)")
              .as("seg_digest"))
          .select(col("source"), col("n_tokens"), col("n_pieces"),
            expr("n_pieces * 1000000L div greatest(n_tokens, 1L)")
              .as("ppt_ppm"),
            col("seg_digest"))
          .orderBy(col("source"))
      },
      Some {
        val step = (i: Int) =>
          s"""g${i + 1} AS (SELECT source_na, word, wl,
             |    CASE WHEN pos > wl THEN pos ELSE pos
             |      + coalesce((SELECT max(length(v.piece)) FROM vocab v
             |        WHERE v.cls = (g$i.pos = 1) AND v.piece
             |          = substr(g$i.word, g$i.pos, length(v.piece))), 1)
             |      END AS pos,
             |    CASE WHEN pos > wl THEN np ELSE np + 1 END AS np,
             |    CASE WHEN pos > wl THEN dg ELSE
             |      list_reduce(list_prepend(
             |        (dg * 131 + CASE WHEN pos = 1 THEN 2 ELSE 1 END) % $P,
             |        list_transform(range(pos, pos
             |          + coalesce((SELECT max(length(v.piece)) FROM vocab v
             |            WHERE v.cls = (g$i.pos = 1) AND v.piece
             |              = substr(g$i.word, g$i.pos, length(v.piece))), 1)),
             |          j -> CAST(unicode(substr(g$i.word, CAST(j AS INT), 1))
             |            AS BIGINT))),
             |        (a, c) -> (a * 131 + c) % $P) END AS dg
             |  FROM g$i)""".stripMargin
        s"""WITH w AS (SELECT source,
           |    unnest(string_split(text, ' ')) AS word FROM documents),
           |wc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
           |  FROM w WHERE word <> '' GROUP BY 1, 2),
           |dw AS (SELECT word, CAST(sum(cnt) AS BIGINT) AS cnt
           |  FROM wc GROUP BY 1),
           |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM dw),
           |c1 AS (SELECT word, cnt,
           |    unnest(range(1, length(word) + 1)) AS pos FROM dw),
           |c2 AS (SELECT word, cnt, pos, unnest(range(1, 9)) AS len FROM c1),
           |cand AS (SELECT substr(word, CAST(pos AS INT), CAST(len AS INT))
           |      AS piece, pos = 1 AS cls, cnt
           |  FROM c2 WHERE pos + len - 1 <= length(word)),
           |vfreq AS (SELECT piece, cls FROM cand GROUP BY 1, 2
           |  HAVING sum(cnt) * 25 >= (SELECT t FROM tot)),
           |chars AS (SELECT DISTINCT substr(word, CAST(pos AS INT), 1)
           |      AS piece, b.cls
           |  FROM c1, (VALUES (TRUE), (FALSE)) b(cls)),
           |vocab AS (SELECT DISTINCT piece, cls FROM
           |  (SELECT * FROM vfreq UNION ALL SELECT * FROM chars)),
           |g0 AS (SELECT 0 AS source_na, word, length(word) AS wl,
           |    1 AS pos, CAST(0 AS BIGINT) AS np, CAST(0 AS BIGINT) AS dg
           |  FROM dw),
           |${(0 until 8).map(step).mkString(",\n")}
           |SELECT wc.source AS source, CAST(sum(wc.cnt) AS BIGINT)
           |    AS n_tokens,
           |  CAST(sum(g8.np * wc.cnt) AS BIGINT) AS n_pieces,
           |  CAST(sum(g8.np * wc.cnt) * 1000000
           |      // greatest(sum(wc.cnt), 1) AS BIGINT)
           |    AS ppt_ppm,
           |  CAST(sum((g8.dg * (wc.cnt % $P)) % $P) % $P AS BIGINT)
           |    AS seg_digest
           |FROM wc JOIN g8 ON wc.word = g8.word
           |GROUP BY wc.source ORDER BY wc.source""".stripMargin
      })
  )
}
