package graft.operators

import org.apache.spark.sql.functions._
import graft.queries.Entry
import graft.{Tables => T}

/** URL canonicalization — the FIRST dedup key a web-crawl pipeline
  * computes (before any content hash): lowercase scheme/host, strip the
  * scheme's default port, drop the fragment, drop tracking (utm_*)
  * params, sort the surviving query params, strip a www. prefix, and
  * trim a trailing slash. Two fetches of the same page under different
  * spellings must collapse to one canonical key.
  *
  * Engine shape: PURE CATALYST EXPRESSIONS end to end — string splits,
  * higher-order filter/sort over the param array, and an aggregate()
  * char fold for the digest; no mapPartitions, no UDF, whole-stage
  * codegen throughout. The messy URL is synthesized per doc from the
  * row's own doc_id (no URL column in the fixture — the q308/q319
  * synthesis discipline), and the ORACLE RE-PARSES it generically in
  * DuckDB rather than rebuilding the answer from residues, so the
  * canonicalization logic itself is what the comparison checks.
  *
  * Reference scope (JasperWoo/MapReduceCore): the reference tokenizes
  * text only (user_tasks.cc:15); URL keying is the map task its crawl
  * users write first, made first-class.
  */
object UrlOps {

  private val P = 2147483647L

  /** The messy synthesized URL — one generator, the cast type name and
    * integer-division spelling the only dialect differences (Spark
    * STRING/div vs DuckDB VARCHAR,//). CONTENT derives from the logical
    * URL id u = doc_id div 2; SPELLING variation (case, www., default
    * port, param order, tracking param, trailing slash, fragment) from
    * doc_id itself — so ids 2k and 2k+1 are two spellings of the SAME
    * page and the canonical key MUST collapse them, at every SF.
    */
  private[graft] def messy(t: String, dv: String): String = {
    // u = logical URL id; v = spelling index. The fixture assigns
    // sources round-robin (source = doc_id % 20), so same-source
    // neighbors are doc_id and doc_id + 20: with u = doc_id div 40 they
    // share a logical URL half the time, and with v = doc_id div 20
    // they ALWAYS differ in spelling — guaranteed real collapse of
    // genuinely different spellings, at every SF.
    val u = s"(doc_id $dv 40)"
    val v = s"(doc_id $dv 20)"
    s"concat(CASE WHEN $u % 2 = 0 THEN " +
      s"CASE WHEN $v % 2 = 0 THEN 'HTTP' ELSE 'http' END " +
      s"ELSE CASE WHEN $v % 2 = 0 THEN 'HTTPS' ELSE 'https' END END, " +
      "'://', " +
      s"CASE WHEN $v % 2 = 0 THEN concat('WWW.Example', " +
      s"CAST($u % 7 AS $t), '.COM') " +
      s"ELSE concat('example', CAST($u % 7 AS $t), '.com') END, " +
      s"CASE WHEN $u % 2 = 0 AND $v % 4 = 0 THEN ':80' " +
      s"WHEN $u % 2 = 1 AND $v % 4 = 2 THEN ':443' ELSE '' END, " +
      s"'/A/b/', CAST($u % 50 AS $t), " +
      s"CASE WHEN $v % 5 = 0 THEN '/' ELSE '' END, " +
      s"CASE WHEN $v % 2 = 0 THEN concat('?b=2&a=', " +
      s"CAST($u % 9 AS $t), '&utm_source=feed') " +
      s"ELSE concat('?a=', CAST($u % 9 AS $t), '&b=2') END, " +
      s"CASE WHEN $v % 3 = 0 THEN concat('#sec', " +
      s"CAST($v % 4 AS $t)) ELSE '' END)"
  }

  val entries: Seq[Entry] = Seq(

    // q339: URL CANONICALIZATION + canonical-key dedup accounting.
    // Same-source neighbor ids pair up as two SPELLINGS of one logical
    // URL (content from doc_id div 40, spelling from doc_id div 20 —
    // see messy()), so the canonical key provably collapses ~2:1 at
    // every SF and n_unique measures real dedup.
    Entry(
      "q339_url_canonicalize",
      (s, d) => {
        val u = T.documents(s, d)
          .select(col("source"), col("doc_id"), expr(messy("STRING", "div")).as("messy"))
          .withColumn("nofrag", expr("substring_index(messy, '#', 1)"))
          .withColumn("scheme",
            expr("lower(substring_index(nofrag, '://', 1))"))
          .withColumn("rest", expr("substring(nofrag, length(scheme) + 4)"))
          .withColumn("hostport", expr("substring_index(rest, '/', 1)"))
          .withColumn("pathq", expr("substring(rest, length(hostport) + 1)"))
          .withColumn("host", expr(
            "lower(CASE WHEN scheme = 'http' AND hostport LIKE '%:80' " +
              "THEN left(hostport, length(hostport) - 3) " +
              "WHEN scheme = 'https' AND hostport LIKE '%:443' " +
              "THEN left(hostport, length(hostport) - 4) " +
              "ELSE hostport END)"))
          .withColumn("host2", expr(
            "CASE WHEN host LIKE 'www.%' THEN substring(host, 5) " +
              "ELSE host END"))
          .withColumn("path", expr("substring_index(pathq, '?', 1)"))
          .withColumn("path2", expr(
            "CASE WHEN length(path) > 1 AND path LIKE '%/' " +
              "THEN left(path, length(path) - 1) ELSE path END"))
          .withColumn("qs", expr(
            "CASE WHEN pathq LIKE '%?%' " +
              "THEN substring_index(pathq, '?', -1) ELSE '' END"))
          .withColumn("params", expr(
            "array_join(array_sort(filter(split(qs, '&'), " +
              "p -> substring(p, 1, 4) != 'utm_')), '&')"))
          .withColumn("canon", expr(
            "concat(scheme, '://', host2, path2, " +
              "CASE WHEN params = '' THEN '' " +
              "ELSE concat('?', params) END)"))
        u.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_urls"),
            countDistinct(col("canon")).as("n_unique"),
            sum(expr("CAST(messy LIKE '%#%' AS BIGINT)"))
              .as("n_frag_dropped"),
            sum(expr("CAST(hostport LIKE '%:80' AS BIGINT)"))
              .as("n_port_stripped"),
            pmod(sum(expr(
              s"aggregate(sequence(1, length(canon)), 0L, (a, i) -> " +
                s"(a * 131L + ascii(substring(canon, i, 1))) % ${P}L)")),
              lit(P)).as("url_digest"))
          .orderBy(col("source"))
      },
      Some(s"""WITH u0 AS (SELECT source, doc_id, ${messy("VARCHAR", "//")} AS messy
         |  FROM documents),
         |u1 AS (SELECT source, messy,
         |    split_part(messy, '#', 1) AS nofrag FROM u0),
         |u2 AS (SELECT source, messy, nofrag,
         |    lower(split_part(nofrag, '://', 1)) AS scheme FROM u1),
         |u3 AS (SELECT source, messy, scheme,
         |    substr(nofrag, length(scheme) + 4) AS rest FROM u2),
         |u4 AS (SELECT source, messy, scheme, rest,
         |    split_part(rest, '/', 1) AS hostport FROM u3),
         |u5 AS (SELECT source, messy, scheme, hostport,
         |    substr(rest, length(hostport) + 1) AS pathq FROM u4),
         |u6 AS (SELECT source, messy, scheme, hostport, pathq,
         |    lower(CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
         |      THEN left(hostport, length(hostport) - 3)
         |      WHEN scheme = 'https' AND hostport LIKE '%:443'
         |      THEN left(hostport, length(hostport) - 4)
         |      ELSE hostport END) AS host FROM u5),
         |u7 AS (SELECT source, messy, scheme, hostport, pathq,
         |    CASE WHEN host LIKE 'www.%' THEN substr(host, 5)
         |      ELSE host END AS host2,
         |    split_part(pathq, '?', 1) AS path FROM u6),
         |u8 AS (SELECT source, messy, scheme, hostport, host2,
         |    CASE WHEN length(path) > 1 AND path LIKE '%/'
         |      THEN left(path, length(path) - 1) ELSE path END AS path2,
         |    CASE WHEN contains(pathq, '?')
         |      THEN split_part(pathq, '?', 2) ELSE '' END AS qs FROM u7),
         |u9 AS (SELECT source, messy, hostport,
         |    concat(scheme, '://', host2, path2,
         |      CASE WHEN params = '' THEN ''
         |        ELSE concat('?', params) END) AS canon
         |  FROM (SELECT *, array_to_string(list_sort(list_filter(
         |      string_split(qs, '&'),
         |      p -> substr(p, 1, 4) != 'utm_')), '&') AS params FROM u8))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_urls,
         |  CAST(count(DISTINCT canon) AS BIGINT) AS n_unique,
         |  CAST(sum(CASE WHEN contains(messy, '#') THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_frag_dropped,
         |  CAST(sum(CASE WHEN hostport LIKE '%:80' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_port_stripped,
         |  CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, length(canon) + 1),
         |        i -> CAST(unicode(canon[i]) AS BIGINT))),
         |      (a, c) -> (a * 131 + c) % $P)) % $P AS BIGINT)
         |    AS url_digest
         |FROM u9 GROUP BY source ORDER BY source""".stripMargin))
  )
}
