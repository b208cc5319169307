package graft.queries

/** DuckDB-dialect oracle SQL for each SQL-expressible query in [[Corpus]].
  *
  * Conventions that keep the cross-engine hash compare exact:
  *  - aggregates over doubles go through a fixed-scale DECIMAL
  *    (order-independent exact sum) and are cast back to DOUBLE, mirroring
  *    [[graft.functions.Exact]];
  *  - DuckDB's widened aggregate types (SUM(BIGINT) → HUGEINT,
  *    year() → BIGINT) are cast back to the Spark result types;
  *  - DuckDB dayofweek is 0=Sunday; Spark's is 1=Sunday — normalized with +1;
  *  - every query has a deterministic total ORDER BY.
  */
object Oracle {

  private val salesCte =
    """sales AS (
      |  SELECT n_name AS Country,
      |         CAST(l_partkey AS VARCHAR) AS StockCode,
      |         CAST(l_shipdate AS DATE) AS InvoiceDate,
      |         CAST(l_quantity AS BIGINT) AS Quantity,
      |         l_extendedprice AS UnitPrice,
      |         l_extendedprice * (1.0 - l_discount) AS LineRevenue
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey)""".stripMargin

  private val dailyCte =
    """daily AS (
      |  SELECT Country, StockCode, InvoiceDate,
      |         CAST(year(InvoiceDate) AS INTEGER) AS Year,
      |         CAST(month(InvoiceDate) AS INTEGER) AS Month,
      |         CAST(day(InvoiceDate) AS INTEGER) AS Day,
      |         CAST(weekofyear(InvoiceDate) AS INTEGER) AS Week,
      |         CAST(dayofweek(InvoiceDate) + 1 AS INTEGER) AS DayOfWeek,
      |         CAST(SUM(Quantity) AS BIGINT) AS NetDailyQuantity,
      |         CAST(SUM(CAST(LineRevenue AS DECIMAL(30,6))) AS DOUBLE) AS NetDailyRevenue,
      |         CAST(SUM(CAST(UnitPrice AS DECIMAL(30,6))) AS DOUBLE) / CAST(COUNT(UnitPrice) AS DOUBLE) AS AvgUnitPrice
      |  FROM sales
      |  GROUP BY 1,2,3,4,5,6,7,8)""".stripMargin

  private def withDaily(body: String): String =
    s"WITH $salesCte,\n$dailyCte\n$body"

  /** Spark results normalize temporal outputs to TIMESTAMP_NTZ (see
    * Corpus.normalizeTemporal); DATE outputs get the matching cast here. */
  private val tsDate = "CAST(InvoiceDate AS TIMESTAMP) AS InvoiceDate"

  /** Mirrors TextFunctions.Stopwords as a DuckDB list literal. */
  private val stopList: String =
    graft.text.TextFunctions.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  private val stopListDe: String =
    graft.text.TextFunctions.StopwordsDe.map(w => s"'$w'").mkString("[", ", ", "]")

  private val stopListFr: String =
    graft.text.TextFunctions.StopwordsFr.map(w => s"'$w'").mkString("[", ", ", "]")

  private val stopListEs: String =
    graft.text.TextFunctions.StopwordsEs.map(w => s"'$w'").mkString("[", ", ", "]")

  private val stopListIt: String =
    graft.text.TextFunctions.StopwordsIt.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Exact ridge sufficient statistics (mirrors NormalEq.ridgeStats: design
    * z = (1, features…), λ = 10 on non-intercept diagonals), generated with
    * the same (i, j) enumeration as the Spark side so the m0_i_j column set
    * matches by construction. `z` are BIGINT-valued SQL expressions (the
    * implicit leading 1 is added here). */
  private def ridgeStatsSql(
      features: Seq[String], yExpr: String, from: String, keys: Seq[String]): String = {
    val z = "CAST(1 AS BIGINT)" +: features
    val k = z.size
    val entries = for { i <- 0 until k; j <- i to k } yield {
      val prod = if (j == k) s"${z(i)} * $yExpr" else s"${z(i)} * ${z(j)}"
      val summed = if (i == j && i > 0) s"SUM($prod) + 10" else s"SUM($prod)"
      s"CAST($summed AS DOUBLE) AS m0_${i}_$j"
    }
    val keyCols = if (keys.isEmpty) "" else keys.mkString(", ") + ", "
    val groupBy = if (keys.isEmpty) "" else s" GROUP BY ${keys.mkString(", ")}"
    s"""stats AS (
       |  SELECT ${keyCols}CAST(COUNT(*) AS BIGINT) AS n,
       |         ${entries.mkString(",\n         ")},
       |         CAST(SUM($yExpr * $yExpr) AS DOUBLE) AS m_yy
       |  FROM $from$groupBy)""".stripMargin
  }

  /** q_ml3's per-country calendar-feature ridge: z = (1, DayOfWeek, Month,
    * Week, Day) over the daily grain, solved by the shared elimination text
    * ([[graft.ml.NormalEq.oracleSolveSql]] — one CTE per stage, identical
    * formulas to the Spark projection chain). */
  private def ridgeCalendarSql: String =
    ridgeStatsSql(
      Seq("CAST(DayOfWeek AS BIGINT)", "CAST(Month AS BIGINT)",
        "CAST(Week AS BIGINT)", "CAST(Day AS BIGINT)"),
      "NetDailyQuantity", "daily", Seq("Country")) +
      "\n" + graft.ml.NormalEq.oracleSolveSql(5, Seq("Country"))

  /** q_ml5's per-country scorecard: the q_ml3 design solved WITH the
    * generated diagnostics stage (SSE/SST/R²/RMSE from the same sufficient
    * statistics) — fit and evaluation both hash-gated. */
  private def ridgeScorecardSql: String =
    ridgeStatsSql(
      Seq("CAST(DayOfWeek AS BIGINT)", "CAST(Month AS BIGINT)",
        "CAST(Week AS BIGINT)", "CAST(Day AS BIGINT)"),
      "NetDailyQuantity", "daily", Seq("Country")) +
      "\n" + graft.ml.NormalEq.oracleSolveSql(5, Seq("Country"), 10L, diagnostics = true)

  /** q_ml4's global lag-feature ridge: z = (1, lag1, lag2, lag3, DayOfWeek)
    * where the lags mirror the Spark side's coalesced series-window lags. */
  private def ridgeLagSql: String = {
    val lagd =
      s"""lagd AS (
         |  SELECT NetDailyQuantity, CAST(DayOfWeek AS BIGINT) AS dow,
         |         COALESCE(lag(NetDailyQuantity, 1) OVER w, 0) AS lag1,
         |         COALESCE(lag(NetDailyQuantity, 2) OVER w, 0) AS lag2,
         |         COALESCE(lag(NetDailyQuantity, 3) OVER w, 0) AS lag3
         |  FROM daily WINDOW $seriesWin)""".stripMargin
    lagd + ",\n" +
      ridgeStatsSql(Seq("lag1", "lag2", "lag3", "dow"), "NetDailyQuantity", "lagd", Nil) +
      "\n" + graft.ml.NormalEq.oracleSolveSql(5, Nil)
  }

  /** The tp1 cleaning chain (quality gate → exact dedup → near-dup
    * removal) as CTEs t..removed over `documents`; `body` is the final
    * SELECT — or, with trailingCtes = true, a further CTE list ending in
    * the final SELECT (the tp5 composition). */
  /** The q_t2 heuristic-quality CTEs (t → c → q) over `documents` — shared
    * by the clean chain, the dataset card, and the q_t21 classifier
    * labels. */
  private def qualityCtes(src: String = "documents"): String =
    s"""t AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS toks FROM $src),
       |c AS (
       |  SELECT doc_id, text,
       |         CAST(len(toks) AS DOUBLE) AS n_tok,
       |         CASE WHEN len(toks) > 0
       |              THEN CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
       |                   / CAST(len(toks) AS DOUBLE)
       |              ELSE CAST(0.0 AS DOUBLE) END AS stop_ratio,
       |         CASE WHEN len(toks) > 0
       |              THEN CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
       |                   / CAST(len(toks) AS DOUBLE)
       |              ELSE CAST(0.0 AS DOUBLE) END AS mean_tok_len
       |  FROM t),
       |q AS (
       |  SELECT doc_id, text,
       |         least(CAST(1.0 AS DOUBLE), n_tok / 100.0) * 0.5
       |           + stop_ratio * 0.3
       |           + least(CAST(1.0 AS DOUBLE), mean_tok_len / 8.0) * 0.2 AS quality
       |  FROM c)""".stripMargin

  /** The exact-dedup + capped-Jaccard near-dup removal CTEs (keep..removed)
    * over a prior CTE named `qf` carrying (doc_id, text, …) — shared by the
    * heuristic-gated clean chain and the q_tp7 classifier-gated variant. */
  private def dedupTailCtes: String =
    s"""keep AS (
       |  SELECT MIN(doc_id) AS doc_id FROM qf
       |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
       |ex AS (SELECT qf.* FROM qf JOIN keep USING (doc_id)),
       |n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM ex),
       |tk AS (SELECT doc_id, regexp_extract_all(norm, '\\S+') AS toks FROM n),
       |wp AS (
       |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
       |  FROM tk WHERE len(toks) >= 3),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS shingle
       |  FROM wp),
       |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) > 1000),
       |pru AS (SELECT doc_id, shingle FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
       |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh FROM pru GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS n_common
       |  FROM pru a JOIN pru b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pr AS (
       |  SELECT id1, id2,
       |         CAST(n_common AS DOUBLE) / CAST(ca.nsh + cb.nsh - n_common AS DOUBLE) AS jaccard
       |  FROM inter JOIN cnt ca ON ca.doc_id = id1 JOIN cnt cb ON cb.doc_id = id2),
       |removed AS (SELECT DISTINCT id2 AS doc_id FROM pr WHERE jaccard >= CAST(0.1 AS DOUBLE))""".stripMargin

  /** The q_t16 bigram-LM CTEs, ending in `lmscore` (doc_id, n_bigrams,
    * avg_logp) — shared by the raw score surface (q_t16) and the
    * perplexity-bucketed sampler (q_p14). */
  private val ngramLmCtes: String =
    """nm AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
      |tk AS (SELECT doc_id, regexp_extract_all(norm, '\S+') AS toks FROM nm),
      |uni AS (
      |  SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS c1
      |  FROM (SELECT unnest(toks) AS t FROM tk) GROUP BY 1),
      |voc AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
      |bi AS (
      |  SELECT doc_id,
      |         toks[CAST(i AS INTEGER)] AS w1,
      |         toks[CAST(i AS INTEGER) + 1] AS w2
      |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
      |        FROM tk WHERE len(toks) >= 2)),
      |btf AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf FROM bi GROUP BY 1, 2, 3),
      |big AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c2 FROM btf GROUP BY 1, 2),
      |lmj AS (
      |  SELECT btf.doc_id, btf.tf, big.c2, uni.c1, voc.v
      |  FROM btf
      |  JOIN big ON big.w1 = btf.w1 AND big.w2 = btf.w2
      |  JOIN uni ON uni.w = btf.w1
      |  CROSS JOIN voc),
      |lmscore AS (
      |  SELECT doc_id,
      |         CAST(SUM(tf) AS BIGINT) AS n_bigrams,
      |         CAST(SUM(floor(ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)) * 1.0E6) * tf) AS DOUBLE)
      |           / 1.0E6 / CAST(SUM(tf) AS DOUBLE) AS avg_logp
      |  FROM lmj GROUP BY 1)""".stripMargin

  /** The q_t21 trained-quality-classifier CTEs, ending in `scored`
    * (doc_id, score): hashed-TF-IDF features collapsed to (x1, x2, x3),
    * q_t2 quality labels on the md5 fold-0 slice, exact-integer ridge
    * stats + the shared elimination text, fixed-order score expression
    * over broadcast betas. Includes [[qualityCtes]] (t/c/q) for the
    * labels. Shared by q_t21 and the q_tp7 classifier-gated clean. */
  private def classifierCtes: String = {
    val stages = graft.ml.NormalEq.eliminationStages(4)
    val elimCtes = stages.zipWithIndex.map { case (stage, idx) =>
      val from = if (idx == 0) "stats" else s"e$idx"
      val cols = stage.map { case (n, e) => s"$e AS $n" }.mkString(",\n         ")
      s"e${idx + 1} AS (\n  SELECT *,\n         $cols\n  FROM $from)"
    }.mkString(",\n")
    s"""${qualityCtes()},
       |nm AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM documents),
       |tm AS (SELECT doc_id, unnest(regexp_extract_all(norm, '\\S+')) AS term FROM nm),
       |bk AS (
       |  SELECT doc_id,
       |         CAST(CAST(concat('0x', substr(md5(term), 1, 4)) AS BIGINT) % 256 AS INTEGER) AS bucket
       |  FROM tm),
       |tf AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf FROM bk GROUP BY 1, 2),
       |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
       |dfreq AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |w AS (
       |  SELECT tf.doc_id,
       |         CAST(floor(CAST(tf.tf AS DOUBLE)
       |           * ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE))
       |           * 1.0E6) AS BIGINT) AS w_micro
       |  FROM tf JOIN dfreq ON dfreq.bucket = tf.bucket CROSS JOIN nd),
       |feats AS (
       |  SELECT doc_id,
       |         CAST(SUM(w_micro) AS BIGINT) AS x1,
       |         CAST(COUNT(*) AS BIGINT) AS x2,
       |         CAST(MAX(w_micro) AS BIGINT) AS x3
       |  FROM w GROUP BY 1),
       |lab AS (
       |  SELECT doc_id, CAST(floor(quality * 1000) AS BIGINT) AS label_milli
       |  FROM q
       |  WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 = 0),
       |trn AS (
       |  SELECT l.label_milli, f.x1, f.x2, f.x3
       |  FROM lab l JOIN feats f USING (doc_id)),
       |${ridgeStatsSql(Seq("x1", "x2", "x3"), "label_milli", "trn", Nil)},
       |$elimCtes,
       |betas AS (SELECT beta_0, beta_1, beta_2, beta_3 FROM e${stages.size}),
       |sc AS (
       |  SELECT d.doc_id,
       |         COALESCE(f.x1, 0) AS x1, COALESCE(f.x2, 0) AS x2, COALESCE(f.x3, 0) AS x3
       |  FROM documents d LEFT JOIN feats f ON f.doc_id = d.doc_id),
       |scored AS (
       |  SELECT sc.doc_id,
       |         beta_0 + beta_1 * CAST(x1 AS DOUBLE) + beta_2 * CAST(x2 AS DOUBLE) + beta_3 * CAST(x3 AS DOUBLE) AS score
       |  FROM sc CROSS JOIN betas)""".stripMargin
  }

  private def cleanChainSql(
      body: String,
      trailingCtes: Boolean = false,
      src: String = "documents",
      pre: String = ""): String = {
    val chain =
      s"""${qualityCtes(src)},
         |qf AS (SELECT * FROM q WHERE quality >= CAST(0.35 AS DOUBLE)),
         |$dedupTailCtes""".stripMargin
    s"WITH ${if (pre.isEmpty) "" else pre + ",\n"}$chain${if (trailingCtes) "," else ""}\n$body"
  }

  /** The [[graft.text.TextFunctions.MarkupReplacements]] chain as one SQL
    * expression over `src` — identical pattern order, with DuckDB's 'g'
    * flag standing in for Spark regexp_replace's replace-all default. */
  private def stripSqlExpr(src: String): String = {
    val inner = graft.text.TextFunctions.MarkupReplacements.foldLeft(src) {
      case (acc, (pat, rep)) =>
        s"regexp_replace($acc, '${pat.replace("'", "''")}', '${rep.replace("'", "''")}', 'g')"
    }
    s"trim(regexp_replace($inner, '\\s+', ' ', 'g'))"
  }

  /** The injected markup fixtures as a VALUES select — literal-identical
    * to Corpus.markupSamples (shared by q_t22/q_tp8 and q_tp12). */
  private val markupValuesSql: String =
    """SELECT CAST(v.doc_id AS BIGINT), v.text FROM (VALUES
      |    (4100000, '<html><body><h1>Hello &amp; welcome</h1><p>A &lt;tag&gt; isn&#39;t text.</p></body></html>'),
      |    (4100001, 'plain text stays untouched'),
      |    (4100002, '<div class="x">nested <b>bold</b>&nbsp;text</div> tail &quot;quoted&quot;')
      |  ) AS v(doc_id, text)""".stripMargin

  private val markupBaseCte: String =
    s"""base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  $markupValuesSql)""".stripMargin

  /** The injected Gopher fixtures as a VALUES select — multi-line strings
    * assembled with chr(10) so the SQL literal carries the identical
    * bytes as the Scala fixture (shared by q_t24 and q_tp12). */
  private val gopherValuesSql: String =
    """SELECT CAST(v.doc_id AS BIGINT), v.text FROM (VALUES
      |    (4200000, 'the quick brown fox jumps over the lazy dog and then walks to the river of glass that shines have you seen it with your own eyes before the morning light fades away and the water runs clear beneath the old stone bridge where children play their games during long summer days that seem to last forever until dusk settles in'),
      |    (4200001, 'intro line' || chr(10) || '- alpha item one' || chr(10) || '- beta item two' || chr(10) || '- gamma item three' || chr(10) || '- delta item four' || chr(10) || '- epsilon item five' || chr(10) || '- zeta item six' || chr(10) || '- eta item seven' || chr(10) || '- theta item eight' || chr(10) || '- iota item nine'),
      |    (4200002, 'first thought trails off ...' || chr(10) || 'second line is fine here' || chr(10) || 'third one also ends ...' || chr(10) || 'fourth stays normal'),
      |    (4200003, '# header # tag # more # hash # series # of # markers # everywhere # in # this # doc'),
      |    (4200004, 'too short to pass'),
      |    (4200005, '12345 67890 11111 22222 33333 44444 55555 66666 77777 88888 99999 00000'),
      |    (4200006, 'extraordinarily incomprehensibilities institutionalization internationalization characteristically disproportionately')
      |  ) AS v(doc_id, text)""".stripMargin

  private val gopherBaseCte: String =
    s"""gbase AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  $gopherValuesSql)""".stripMargin

  /** q_t24/q_tp12: distinct-stopword-kind count over a text column — one
    * list_contains per Gopher stopword on the lowercased token list
    * (mirrors the Scala array_contains sum). */
  private def gopherStopSqlFor(c: String): String =
    graft.queries.Corpus.GopherStopwords
      .map(w => s"CASE WHEN list_contains(regexp_extract_all(lower($c), '\\S+'), '$w') THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  private val gopherStopSql: String = gopherStopSqlFor("text")

  /** q_tp12: the q_t24 rule set as one WHERE predicate over column `c`
    * (integer cross-multiplication form, stopMin knob — mirrors
    * Corpus.gopherPassCol exactly). */
  private def gopherPassSql(c: String, stopMin: Int): String =
    s"""(len(regexp_extract_all($c, '\\S+')) BETWEEN 50 AND 100000
       | AND length(regexp_replace($c, '\\s+', '', 'g')) >= len(regexp_extract_all($c, '\\S+')) * 3
       | AND length(regexp_replace($c, '\\s+', '', 'g')) <= len(regexp_extract_all($c, '\\S+')) * 10
       | AND len(regexp_extract_all($c, '#|\\.\\.\\.')) * 10 <= len(regexp_extract_all($c, '\\S+'))
       | AND len(regexp_extract_all($c, '(?m)^[ \\t]*[-*] ')) * 10 <= len(string_split($c, chr(10))) * 9
       | AND len(regexp_extract_all($c, '(?m)\\.\\.\\.$$')) * 10 <= len(string_split($c, chr(10))) * 3
       | AND len(regexp_extract_all($c, '[^\\s]*\\p{L}[^\\s]*')) * 10 >= len(regexp_extract_all($c, '\\S+')) * 8
       | AND ${gopherStopSqlFor(c)} >= $stopMin)""".stripMargin.replace("\n", "")

  /** q_t25/q_tp12: the deterministic messy-URL synthesis (mirrors
    * Corpus.messyUrl — `keyExpr` names the resource, doc_id mods pick the
    * messiness pattern). */
  private def messyUrlSql(keyExpr: String): String =
    s"""(CASE WHEN doc_id % 5 = 0
       |    THEN 'HTTPS://WWW.SITE' || CAST(($keyExpr) % 40 AS VARCHAR) || '.EXAMPLE.COM'
       |    ELSE 'https://www.site' || CAST(($keyExpr) % 40 AS VARCHAR) || '.example.com' END)
       | || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
       | || (CASE WHEN doc_id % 2 = 1 THEN '/doc//' ELSE '/doc/' END)
       | || CAST(($keyExpr) AS VARCHAR)
       | || (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END)
       | || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed' ELSE '' END)
       | || (CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END)""".stripMargin.replace("\n", "")

  /** q_t25/q_tp12: the canonicalization chain over a url column (mirrors
    * TextFunctions.canonicalUrl; DuckDB's \1 group syntax vs Spark's $1 is
    * the only divergence). Emits the canonical url given the stripped
    * intermediate `u1` — callers first compute u1 via [[urlStripSql]]. */
  private def urlStripSql(c: String): String =
    s"regexp_replace(regexp_replace(regexp_replace(regexp_replace($c, '#.*$$', ''), '&utm_[^&#]*', '', 'g'), '\\?utm_[^&#]*&', '?'), '\\?utm_[^&#]*$$', '')"

  /** q_s13/q_s14: the from-scratch shard manifest (the incremental merge
    * is algebraically identical, so both keys share this). */
  private val shardManifestSql: String =
    """SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INTEGER) AS shard,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS n_chars,
      |       CAST(SUM(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) AS BIGINT) AS n_tokens,
      |       MIN(doc_id) AS min_doc_id,
      |       MAX(doc_id) AS max_doc_id,
      |       CAST(SUM(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
      |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin

  /** q_t23/q_t23b: blocklist + md5-ordered per-domain cap (the salted
    * two-phase variant is result-identical, so both keys share this). */
  private val domainCurationSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |         'https://www.' || source || '-' || CAST(doc_id % 3 AS VARCHAR)
      |           || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
      |  FROM documents),
      |dom AS (
      |  SELECT doc_id, regexp_extract(url, 'https?://([^/]+)/', 1) AS domain FROM u),
      |ok AS (
      |  SELECT * FROM dom
      |  WHERE domain NOT IN ('www.src0-0.example.com', 'www.src5-2.example.com')),
      |rk AS (
      |  SELECT doc_id, domain,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY domain
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
      |  FROM ok)
      |SELECT doc_id, domain, rk FROM rk WHERE rk <= 5 ORDER BY doc_id""".stripMargin

  /** q_t25/q_e14: the messy-URL synthesis + canonicalization CTE chain
    * with a caller-chosen final select over `canon(doc_id, url_raw,
    * url_canon)`. */
  private def urlDedupOracle(finalSelect: String): String =
    s"""WITH raw AS (
       |  SELECT doc_id, ${messyUrlSql("doc_id // 2")} AS url_raw
       |  FROM documents
       |  UNION ALL
       |  SELECT CAST(v.doc_id AS BIGINT), v.url_raw FROM (VALUES
       |    (4300000, 'HTTPS://Site.Example.COM:443//a//b/?utm_source=x&utm_medium=y#frag'),
       |    (4300001, 'https://site.example.com/a/b?id=2&utm_campaign=z'),
       |    (4300002, 'http://host.example.com:80/x/'),
       |    (4300003, 'https://site.example.com//a/b/'),
       |    (4300004, 'https://Path-Less.Example.com?id=AbC&utm_source=x'),
       |    (4300005, 'https://path-less.example.com:443?id=AbC'),
       |    (4300006, 'https://qv.example.com/p?next=//x/'),
       |    (4300007, 'https://qv.example.com/p?next=/x')
       |  ) AS v(doc_id, url_raw)),
       |step AS (
       |  SELECT doc_id, url_raw, ${urlStripSql("url_raw")} AS u1
       |  FROM raw),
       |canon AS (
       |  SELECT doc_id, url_raw, ${urlCanonSql("u1")} AS url_canon
       |  FROM step)
       |$finalSelect""".stripMargin

  private def urlCanonSql(u1: String): String =
    s"""regexp_replace(regexp_replace(
       |  lower(regexp_extract($u1, '^[^/?#]*//[^/?#]*')),
       |  '^(https://[^:]*):443$$', '\\1'), '^(http://[^:]*):80$$', '\\1')
       ||| regexp_replace(regexp_replace(
       |     regexp_replace(regexp_replace($u1, '^[^/?#]*//[^/?#]*', ''), '(?s)\\?.*$$', ''),
       |     '//+', '/', 'g'), '/+$$', '')
       ||| regexp_extract(regexp_replace($u1, '^[^/?#]*//[^/?#]*', ''), '(?s)(\\?.*)$$', 1)""".stripMargin.replace("\n", " ")

  /** q_g1: replay [[graft.operators.Graph.pageRank]]'s integer-exact
    * rounds as unrolled CTEs (the q_t18 round-replay discipline lifted to
    * rank propagation — same graph synthesis, same int64 floor-division
    * mass arithmetic, so ranks match bit for bit). The CTE body is shared
    * with q_g2's rank-gated curation. */
  /** The synthesized host-graph SQL shared by every graph-family oracle
    * (q_g1/q_g1b/q_g2/q_g3/q_g4) — ONE definition of the md5-link edge
    * synthesis and node set, so a change to the graph can never
    * desynchronize one family member's oracle from the others (mirrors
    * Corpus.hostGraphEdges). */
  private val hostE0Cte: String =
    """e0 AS (
      |  SELECT 'www.' || source || '-' || CAST(doc_id % 3 AS VARCHAR) || '.example.com' AS src,
      |         'www.src' || CAST(h % 20 AS VARCHAR) || '-' || CAST((h // 20) % 3 AS VARCHAR) || '.example.com' AS dst
      |  FROM (SELECT doc_id, source,
      |          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'link'), 1, 8)) AS BIGINT) AS h
      |        FROM documents))""".stripMargin

  private val hostEdgesCte: String =
    """edges AS (
      |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
      |  FROM e0 WHERE src <> dst GROUP BY 1, 2)""".stripMargin

  private val hostNodesCte: String =
    "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)"

  private def pageRankCtes(rounds: Int): String = {
    val scale = "1000000000000"
    val roundCtes = (1 to rounds).map { k =>
      s"""r$k AS (
         |  SELECT n2.node,
         |         CAST((15 * ($scale // nn.n)) // 100
         |           + (85 * COALESCE(inf.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n2 CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst AS node, SUM((r.rank * e.w) // o.ow) AS s
         |    FROM r${k - 1} r
         |    JOIN edges e ON e.src = r.node
         |    JOIN outw o ON o.src = e.src
         |    GROUP BY 1) inf ON inf.node = n2.node)""".stripMargin
    }.mkString(",\n")
    s"""$hostE0Cte,
       |$hostEdgesCte,
       |$hostNodesCte,
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1),
       |r0 AS (SELECT node, ($scale // nn.n) AS rank FROM nodes CROSS JOIN nn),
       |$roundCtes""".stripMargin
  }

  /** q_g1b: the dangling-mass-REDISTRIBUTION rounds over the sink-heavy
    * graph (hostGraphEdges plus one external 'www.extN' link per doc —
    * hosts never crawled, so pure sinks). Each round adds a scalar CTE
    * d_k = the rank mass sitting on sinks after round k−1; every node's
    * inflow gains `dm // n` before damping — exactly
    * [[graft.operators.Graph]]'s `redistributeDangling` rule. */
  private def pageRankRedistCtes(rounds: Int): String = {
    val scale = "1000000000000"
    val roundCtes = (1 to rounds).map { k =>
      s"""d$k AS (
         |  SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dm
         |  FROM r${k - 1} r LEFT JOIN outw o ON o.src = r.node
         |  WHERE o.src IS NULL),
         |r$k AS (
         |  SELECT n2.node,
         |         CAST((15 * ($scale // nn.n)) // 100
         |           + (85 * (COALESCE(inf.s, 0) + (d$k.dm // nn.n))) // 100 AS BIGINT) AS rank
         |  FROM nodes n2 CROSS JOIN nn CROSS JOIN d$k
         |  LEFT JOIN (
         |    SELECT e.dst AS node, SUM((r.rank * e.w) // o.ow) AS s
         |    FROM r${k - 1} r
         |    JOIN edges e ON e.src = r.node
         |    JOIN outw o ON o.src = e.src
         |    GROUP BY 1) inf ON inf.node = n2.node)""".stripMargin
    }.mkString(",\n")
    s"""$hostE0Cte,
       |x0 AS (
       |  SELECT 'www.' || source || '-' || CAST(doc_id % 3 AS VARCHAR) || '.example.com' AS src,
       |         'www.ext' || CAST(h2 % 25 AS VARCHAR) || '.example.com' AS dst
       |  FROM (SELECT doc_id, source,
       |          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'extlink'), 1, 8)) AS BIGINT) AS h2
       |        FROM documents)),
       |edges AS (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM e0 WHERE src <> dst GROUP BY 1, 2
       |  UNION ALL
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM x0 GROUP BY 1, 2),
       |$hostNodesCte,
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1),
       |r0 AS (SELECT node, ($scale // nn.n) AS rank FROM nodes CROSS JOIN nn),
       |$roundCtes""".stripMargin
  }

  /** q_g4: HITS replayed as unrolled CTEs over the q_g1 graph — each
    * round's authority/hub alternation with its two scalar L1-rescale
    * CTEs, mirroring [[graft.operators.Graph.hits]]'s integer rule. */
  private def hitsSql(rounds: Int): String = {
    val scale = "1000000"
    val roundCtes = (1 to rounds).map { k =>
      s"""ra$k AS (
         |  SELECT e.dst AS node, SUM(h.hub * e.w) AS ra
         |  FROM h${k - 1} h JOIN edges e ON e.src = h.node GROUP BY 1),
         |sa$k AS (SELECT CAST(COALESCE(SUM(ra), 1) AS BIGINT) AS sa FROM ra$k),
         |a$k AS (
         |  SELECT n.node,
         |         CAST((COALESCE(r.ra, 0) * $scale) // s.sa AS BIGINT) AS authority
         |  FROM nodes n CROSS JOIN sa$k s LEFT JOIN ra$k r ON r.node = n.node),
         |rh$k AS (
         |  SELECT e.src AS node, SUM(a.authority * e.w) AS rh
         |  FROM a$k a JOIN edges e ON e.dst = a.node GROUP BY 1),
         |sh$k AS (SELECT CAST(COALESCE(SUM(rh), 1) AS BIGINT) AS sh FROM rh$k),
         |h$k AS (
         |  SELECT n.node,
         |         CAST((COALESCE(r.rh, 0) * $scale) // s.sh AS BIGINT) AS hub
         |  FROM nodes n CROSS JOIN sh$k s LEFT JOIN rh$k r ON r.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $hostE0Cte,
       |$hostEdgesCte,
       |$hostNodesCte,
       |h0 AS (SELECT node, CAST($scale AS BIGINT) AS hub FROM nodes),
       |$roundCtes
       |SELECT n.node AS domain, h.hub, a.authority
       |FROM nodes n
       |JOIN h$rounds h ON h.node = n.node
       |JOIN a$rounds a ON a.node = n.node
       |ORDER BY domain""".stripMargin
  }

  private def pageRankSql(rounds: Int): String =
    s"""WITH ${pageRankCtes(rounds)}
       |SELECT n.node AS domain, r.rank,
       |       CAST(COALESCE(o.ow, 0) AS BIGINT) AS out_w,
       |       CAST(COALESCE(i.iw, 0) AS BIGINT) AS in_w
       |FROM nodes n
       |JOIN r$rounds r ON r.node = n.node
       |LEFT JOIN outw o ON o.src = n.node
       |LEFT JOIN (SELECT dst, SUM(w) AS iw FROM edges GROUP BY 1) i ON i.dst = n.node
       |ORDER BY domain""".stripMargin

  /** q_t18: replay the BPE training rounds in SQL. Each word type rides as
    * ONE string of chr(1)<sym>chr(2)-wrapped segments, so DuckDB's plain
    * non-overlapping leftmost replace() IS the greedy BPE merge (adjacent
    * occurrences stay disjoint in string space, repeated symbols merge
    * leftmost-first — both exactly the kernel's semantics), while pair
    * counting unwraps the segments and zips neighbors. */
  /** The training rounds as CTEs (w0..wN carry (word, s, n); bN holds round
    * N's chosen rule) — shared by q_t18/q_t19/q_t20/q_tp5.
    *
    * Tokenization contract (ADVICE r7): the wrapped-segment encoding
    * reserves bytes 0x01/0x02 as symbol delimiters, so corpus text
    * containing RAW control characters 0x01/0x02 would corrupt the
    * replay and diverge from the Scala kernel. The synthetic fixtures are
    * printable-ASCII; for arbitrary text, strip 0x01/0x02 (or re-wrap
    * with codepoints proven absent) before pointing these CTEs at it. */
  private def bpeRoundCtes(rounds: Int, src: String = "documents"): String = {
    val init =
      raw"""w0 AS MATERIALIZED (
         |  SELECT word, regexp_replace(word, '(.)', chr(1) || '\1' || chr(2), 'g') AS s, n
         |  FROM (
         |    SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS n
         |    FROM (SELECT unnest(regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+')) AS t
         |          FROM $src)
         |    GROUP BY 1))""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""l$r AS MATERIALIZED (
         |  SELECT regexp_extract_all(s, chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1) AS syms, n
         |  FROM w${r - 1}),
         |p$r AS MATERIALIZED (
         |  SELECT syms[CAST(i AS INTEGER)] AS a, syms[CAST(i AS INTEGER) + 1] AS b,
         |         CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM (SELECT syms, n, unnest(generate_series(1, len(syms) - 1)) AS i FROM l$r)
         |  GROUP BY 1, 2),
         |b$r AS MATERIALIZED (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |w$r AS MATERIALIZED (
         |  SELECT word, replace(s,
         |           chr(1) || (SELECT a FROM b$r) || chr(2) || chr(1) || (SELECT b FROM b$r) || chr(2),
         |           chr(1) || (SELECT a FROM b$r) || (SELECT b FROM b$r) || chr(2)) AS s, n
         |  FROM w${r - 1})""".stripMargin
    }.mkString(",\n")
    s"$init,\n$roundCtes"
  }

  /** q_t18b: the batched-disjoint training rounds in SQL. Per round: the
    * candidate pool is one ROW_NUMBER window over the pair counts, the
    * disjointness rule ("symbol set {a, b, a||b} disjoint from every
    * higher-ranked pool candidate's") is one correlated NOT EXISTS, and the
    * batch apply is a recursive CTE stepping arnk = 1..|accepted| with the
    * same wrapped-segment replace() kernel as [[bpeRoundCtes]] (accepted
    * merges are pairwise symbol-disjoint, so the step order is immaterial —
    * the recursion just serializes a commuting batch). */
  private def bpeBatchedSql(rounds: Int, poolK: Int): String = {
    val init =
      raw"""w0 AS MATERIALIZED (
         |  SELECT word, regexp_replace(word, '(.)', chr(1) || '\1' || chr(2), 'g') AS s, n
         |  FROM (
         |    SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS n
         |    FROM (SELECT unnest(regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+')) AS t
         |          FROM documents)
         |    GROUP BY 1))""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""l$r AS MATERIALIZED (
         |  SELECT regexp_extract_all(s, chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1) AS syms, n
         |  FROM w${r - 1}),
         |p$r AS MATERIALIZED (
         |  SELECT syms[CAST(i AS INTEGER)] AS a, syms[CAST(i AS INTEGER) + 1] AS b,
         |         CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM (SELECT syms, n, unnest(generate_series(1, len(syms) - 1)) AS i FROM l$r)
         |  GROUP BY 1, 2),
         |cd$r AS MATERIALIZED (
         |  SELECT a, b, cnt, rnk FROM (
         |    SELECT a, b, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, a, b) AS rnk FROM p$r)
         |  WHERE rnk <= $poolK),
         |ac$r AS MATERIALIZED (
         |  SELECT a, b, cnt, ROW_NUMBER() OVER (ORDER BY rnk) AS arnk
         |  FROM cd$r c
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM cd$r h
         |    WHERE h.rnk < c.rnk
         |      AND (h.a IN (c.a, c.b, c.a || c.b)
         |        OR h.b IN (c.a, c.b, c.a || c.b)
         |        OR (h.a || h.b) IN (c.a, c.b, c.a || c.b)))),
         |ap$r AS (
         |  SELECT word, s, n, 0 AS k FROM w${r - 1}
         |  UNION ALL
         |  SELECT t.word,
         |         replace(t.s, chr(1) || m.a || chr(2) || chr(1) || m.b || chr(2),
         |                 chr(1) || m.a || m.b || chr(2)) AS s,
         |         t.n, t.k + 1 AS k
         |  FROM ap$r t JOIN ac$r m ON m.arnk = t.k + 1),
         |w$r AS MATERIALIZED (
         |  SELECT word, s, n FROM ap$r WHERE k = (SELECT COUNT(*) FROM ac$r))""".stripMargin
    }.mkString(",\n")
    val sel = (1 to rounds).map(r =>
      s"SELECT $r AS round, arnk, a, b, cnt FROM ac$r").mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE $init,
       |$roundCtes
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY round, arnk) AS INTEGER) AS merge_rank,
       |       CAST(round AS INTEGER) AS round, a AS left_sym, b AS right_sym, cnt AS pair_count
       |FROM ($sel)
       |ORDER BY merge_rank""".stripMargin
  }

  private def bpeTrainSql(rounds: Int): String = {
    val finals = (1 to rounds).map { r =>
      s"SELECT CAST($r AS INTEGER) AS merge_rank, a AS left_sym, b AS right_sym, cnt AS pair_count FROM b$r"
    }.mkString("\nUNION ALL\n")
    s"WITH ${bpeRoundCtes(rounds)}\n$finals\nORDER BY merge_rank"
  }

  /** q_t19: the final-round symbol strings ARE the trained encoding of each
    * word type — count their segments and join back to token instances. */
  private def bpeEncodeSql(rounds: Int): String =
    raw"""WITH ${bpeRoundCtes(rounds)},
       |nb AS MATERIALIZED (
       |  SELECT word,
       |         CAST(len(regexp_extract_all(s, chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1)) AS BIGINT) AS n_bpe
       |  FROM w$rounds),
       |tok AS (
       |  SELECT doc_id, unnest(regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+')) AS word
       |  FROM documents)
       |SELECT tok.doc_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_ws_tokens,
       |       CAST(SUM(nb.n_bpe) AS BIGINT) AS n_bpe_tokens
       |FROM tok JOIN nb ON nb.word = tok.word
       |GROUP BY 1 ORDER BY tok.doc_id""".stripMargin

  /** q_t20: unnest the final-round symbols per word type and aggregate to
    * the vocab artifact. */
  private def bpeVocabSql(rounds: Int): String =
    s"""WITH ${bpeRoundCtes(rounds)},
       |sy AS (
       |  SELECT word, n,
       |         unnest(regexp_extract_all(s, chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1)) AS symbol
       |  FROM w$rounds)
       |SELECT symbol,
       |       CAST(SUM(n) AS BIGINT) AS total_occurrences,
       |       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_word_types
       |FROM sy GROUP BY 1 ORDER BY symbol""".stripMargin

  /** q_t27: dense vocab ids (byte-order rank over the final symbols), each
    * doc's words expanded to symbol sequences, order-sensitive Σ id·pos
    * checksum. */
  private def bpeTokenIdsSql(rounds: Int): String =
    s"""WITH ${bpeRoundCtes(rounds)},
       |fs AS MATERIALIZED (
       |  SELECT word, regexp_extract_all(s, chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1) AS syms
       |  FROM w$rounds),
       |vid AS (
       |  SELECT symbol, CAST(ROW_NUMBER() OVER (ORDER BY symbol) AS BIGINT) AS id
       |  FROM (SELECT DISTINCT unnest(syms) AS symbol FROM fs)),
       |docw AS (
       |  SELECT doc_id, CAST(i AS INTEGER) AS wpos, toks[CAST(i AS INTEGER)] AS word
       |  FROM (SELECT doc_id, regexp_extract_all(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\S+') AS toks
       |        FROM documents),
       |       unnest(generate_series(1, len(toks))) AS g(i)),
       |sq AS (
       |  SELECT d.doc_id, d.wpos, CAST(j AS INTEGER) AS spos, fs.syms[CAST(j AS INTEGER)] AS symbol
       |  FROM docw d JOIN fs ON fs.word = d.word,
       |       unnest(generate_series(1, len(fs.syms))) AS h(j)),
       |wt AS (
       |  SELECT sq.doc_id, vid.id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY sq.doc_id ORDER BY sq.wpos, sq.spos) AS BIGINT) AS tok_idx
       |  FROM sq JOIN vid ON vid.symbol = sq.symbol)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ids,
       |       CAST(SUM(id * tok_idx) AS BIGINT) AS ids_checksum
       |FROM wt GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Count-min grid + top-20 point queries (q_a25); q_e12 builds the same
    * grid through Structured Streaming and shares it. */
  private val countMinSql: String =
    """WITH ab AS (
      |  SELECT CAST(j AS INTEGER) AS j,
      |         ([2654435761, 40503, 2246822519, 3266489917])[j + 1] AS a,
      |         ([11, 101, 1009, 10007])[j + 1] AS b
      |  FROM (SELECT unnest(generate_series(0, 3)) AS j)),
      |h AS (
      |  SELECT e.user_id, ab.j,
      |         ((ab.a * e.user_id + ab.b) % 2305843009213693951) % 64 AS bucket
      |  FROM events e CROSS JOIN ab),
      |sketch AS (SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY 1, 2),
      |exact AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n FROM events GROUP BY 1),
      |probes AS (SELECT user_id, exact_n FROM exact ORDER BY exact_n DESC, user_id LIMIT 20)
      |SELECT p.user_id, p.exact_n, MIN(s.c) AS cms_n
      |FROM probes p
      |CROSS JOIN ab
      |JOIN sketch s
      |  ON s.j = ab.j
      | AND s.bucket = ((ab.a * p.user_id + ab.b) % 2305843009213693951) % 64
      |GROUP BY 1, 2
      |ORDER BY p.user_id""".stripMargin

  /** Floor-quantized cosine aggregate (the q_dd5 construction) over grouped
    * rows carrying component columns x, y — exact-integer sums, so the
    * result is bit-identical to HashUtil.cosineFloor. */
  private val quantCosAgg: String =
    """(CAST(SUM(CAST(floor(x * y * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15)
      |           / (sqrt(CAST(SUM(CAST(floor(x * x * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15)
      |              * sqrt(CAST(SUM(CAST(floor(y * y * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15))""".stripMargin

  /** Bit-reproducible mean via IEEE-only ops — mirrors Exact.floorAvg(c, 9). */
  private def floorAvg9(x: String, alias: String): String =
    s"CAST(SUM(CAST(floor(($x) * 1.0E9) AS BIGINT)) AS DOUBLE) / 1.0E9 / CAST(COUNT($x) AS DOUBLE) AS $alias"

  /** Bit-reproducible sum — mirrors Exact.floorSum(c, 4). */
  private def floorSum4(x: String, alias: String): String =
    s"CAST(SUM(CAST(floor(($x) * 1.0E4) AS BIGINT)) AS DOUBLE) / 1.0E4 AS $alias"

  private val incrementalDedupSql: String =
      """WITH store_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        |batch_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 2 = 0 AND doc_id < 50
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 2 = 1 AND doc_id < 50),
        |allb AS (
        |  SELECT 's' AS side, doc_id, text FROM store_docs
        |  UNION ALL SELECT 'b', doc_id, text FROM batch_docs),
        |n AS (SELECT side, doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM allb),
        |tk AS (SELECT side, doc_id, regexp_extract_all(norm, '\S+') AS toks FROM n),
        |wp AS (
        |  SELECT side, doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        |  FROM tk WHERE len(toks) >= 3),
        |sh AS (
        |  SELECT DISTINCT side, doc_id,
        |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS shingle
        |  FROM wp),
        |sets AS (
        |  SELECT side, doc_id, CAST(list_sort(list(shingle)) AS VARCHAR) AS sig
        |  FROM sh GROUP BY side, doc_id),
        |store_match AS (
        |  SELECT b.doc_id, min(s.doc_id) AS match_id
        |  FROM sets b JOIN sets s ON b.sig = s.sig AND b.side = 'b' AND s.side = 's'
        |  GROUP BY b.doc_id),
        |batch_rest AS (
        |  SELECT doc_id, sig FROM sets
        |  WHERE side = 'b' AND doc_id NOT IN (SELECT doc_id FROM store_match)),
        |batch_keep AS (
        |  SELECT sig, min(doc_id) AS keeper FROM batch_rest GROUP BY sig)
        |SELECT b.doc_id AS doc_id,
        |       CASE WHEN sm.doc_id IS NOT NULL THEN 'dup_of_store'
        |            WHEN bk.keeper < b.doc_id THEN 'dup_in_batch'
        |            ELSE 'kept' END AS status,
        |       CASE WHEN sm.doc_id IS NOT NULL THEN sm.match_id
        |            WHEN bk.keeper < b.doc_id THEN bk.keeper END AS match_id
        |FROM batch_docs b
        |LEFT JOIN store_match sm ON b.doc_id = sm.doc_id
        |LEFT JOIN batch_rest br ON b.doc_id = br.doc_id
        |LEFT JOIN batch_keep bk ON br.sig = bk.sig
        |ORDER BY b.doc_id""".stripMargin

  private val seriesWin =
    "w AS (PARTITION BY Country, StockCode ORDER BY InvoiceDate)"
  private val dowWin =
    "wd AS (PARTITION BY Country, StockCode, DayOfWeek ORDER BY InvoiceDate)"
  private def frameWin(name: String, n: Int, dow: Boolean = false): String = {
    val keys = if (dow) "Country, StockCode, DayOfWeek" else "Country, StockCode"
    s"$name AS (PARTITION BY $keys ORDER BY InvoiceDate ROWS BETWEEN $n PRECEDING AND 1 PRECEDING)"
  }

  /** Eval-frame CTE: MA(6) baseline with last-value fallback + naive lag-1
    * prediction + error columns (mirrors Forecast.evalFrame). */
  private val evalCte =
    s"""ev AS (
       |  SELECT Country, AvgUnitPrice, NetDailyQuantity,
       |         COALESCE(
       |           CAST(SUM(NetDailyQuantity) OVER f6 AS DOUBLE) / CAST(COUNT(NetDailyQuantity) OVER f6 AS DOUBLE),
       |           CAST(lag(NetDailyQuantity, 1) OVER w AS DOUBLE)) AS baseline_qty,
       |         CAST(lag(NetDailyQuantity, 1) OVER w AS DOUBLE) AS prediction
       |  FROM daily
       |  WINDOW $seriesWin, ${frameWin("f6", 6)}),
       |err AS (
       |  SELECT Country, AvgUnitPrice,
       |         prediction - CAST(NetDailyQuantity AS DOUBLE) AS err_model,
       |         baseline_qty - CAST(NetDailyQuantity AS DOUBLE) AS err_baseline,
       |         abs(prediction - CAST(NetDailyQuantity AS DOUBLE)) AS abs_err_model,
       |         abs(baseline_qty - CAST(NetDailyQuantity AS DOUBLE)) AS abs_err_baseline,
       |         abs(prediction - CAST(NetDailyQuantity AS DOUBLE))
       |           / (CASE WHEN NetDailyQuantity = 0 THEN NULL ELSE CAST(NetDailyQuantity AS DOUBLE) END) AS ape_model,
       |         abs(baseline_qty - CAST(NetDailyQuantity AS DOUBLE))
       |           / (CASE WHEN NetDailyQuantity = 0 THEN NULL ELSE CAST(NetDailyQuantity AS DOUBLE) END) AS ape_baseline
       |  FROM ev)""".stripMargin

  /** Mirrors Dedup.jaccardPairs with the shingle-frequency cap live: the
    * inverted index is pruned of shingles with df > cap (a deterministic
    * filter, identical across engines) and BOTH the pair intersections and
    * the per-doc set sizes are computed over that pruned universe, so the
    * score is self-consistent at any cap (and the exact full-set Jaccard
    * whenever the cap prunes nothing). */
  private def jaccardTopSql(maxShingleDf: Int): String =
    s"""WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM documents),
       |tk AS (SELECT doc_id, regexp_extract_all(norm, '\\S+') AS toks FROM n),
       |wp AS (
       |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
       |  FROM tk WHERE len(toks) >= 3),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS shingle
       |  FROM wp),
       |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) > $maxShingleDf),
       |pr AS (SELECT doc_id, shingle FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
       |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM pr GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS n_common
       |  FROM pr a JOIN pr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id1, id2, n_common,
       |       CAST(n_common AS DOUBLE) / CAST(ca.n + cb.n - n_common AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = id1
       |JOIN cnt cb ON cb.doc_id = id2
       |ORDER BY jaccard DESC, id1, id2 LIMIT 50""".stripMargin

  private val kpiAggs = Seq(
    floorAvg9("abs_err_model", "mae_model"),
    floorAvg9("abs_err_baseline", "mae_baseline"),
    floorAvg9("ape_model", "mape_model"),
    floorAvg9("ape_baseline", "mape_baseline"),
    floorAvg9("err_model", "bias_model"),
    floorAvg9("err_baseline", "bias_baseline")).mkString(",\n       ")

  /** Connected components of the q_dd6/q_dd8 injected-clone pair graph
    * via a recursive-CTE closure — shared by both cluster-resolution
    * algorithms (min-label propagation and star contraction). */
  private val dupClustersSql: String =
    """WITH RECURSIVE base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 30
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 15),
        |n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM base),
        |tk AS (SELECT doc_id, regexp_extract_all(norm, '\S+') AS toks FROM n),
        |wp AS (
        |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        |  FROM tk WHERE len(toks) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS shingle
        |  FROM wp),
        |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) > 1000),
        |pr AS (SELECT doc_id, shingle FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
        |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM pr GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM pr a JOIN pr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id1, id2
        |  FROM inter JOIN cnt ca ON ca.doc_id = id1 JOIN cnt cb ON cb.doc_id = id2
        |  WHERE CAST(n_common AS DOUBLE) / CAST(ca.n + cb.n - n_common AS DOUBLE)
        |        >= CAST(0.8 AS DOUBLE)),
        |e AS (SELECT id1 AS s, id2 AS t FROM pairs UNION SELECT id2, id1 FROM pairs),
        |nodes AS (SELECT DISTINCT s AS id FROM e),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT reach.id, e.t AS r FROM reach JOIN e ON e.s = reach.r)
        |SELECT CAST(id AS BIGINT) AS id, CAST(MIN(r) AS BIGINT) AS label
        |FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** The engine tokenizer mirrored in SQL (TextFunctions.tokens ∘
    * normText over column `c`) — the single definition NEW queries
    * interpolate. ~15 pre-round-9 copies remain inline: they are green
    * and frozen, and converting their quoting contexts (plain vs
    * s-interpolated triple-quoted strings process `\\` and `$`
    * differently) risks silent escape corruption for zero behavior
    * change — the engine tokenizer itself is contractually fixed
    * (\S+ runs over lower/trim/ws-collapse), so drift pressure on the
    * old copies is nil. */
  private def toksSql(c: String): String =
    s"regexp_extract_all(regexp_replace(lower(trim($c)), '\\s+', ' ', 'g'), '\\S+')"

  /** q_dd11/q_dd12: the shared fuzzy-dedup CTE chain — corpus + planted
    * near-clones, shingles, portable universal-hash minwise signatures
    * (base h = hex32(md5(shingle)) mod p, slot i = min of (a_i·h + b_i)
    * mod p with p = 2^31−1 and md5-derived coefficients — mirrors
    * Dedup.portableMinhashCandidatesShingled exactly), 4-band bucket-
    * capped candidates, and the exact verify tier, ending in
    * `scored(id1, id2, n_common, n_union, edit_dist, edit_ratio)`. */
  private val fuzzyPairCtes: String =
    """docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 3000000, text || ' qq zz qq zz qq'
      |  FROM documents WHERE doc_id < 60),
      |n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM docs),
      |tk AS (SELECT doc_id, norm, regexp_extract_all(norm, '\S+') AS toks FROM n),
      |wp AS (
      |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
      |  FROM tk WHERE len(toks) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS shingle
      |  FROM wp),
      |hv AS (
      |  SELECT doc_id, CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) % 2147483647 AS h
      |  FROM sh),
      |hs AS (
      |  SELECT doc_id, sd.seed,
      |         MIN(((CAST(concat('0x', substr(md5('a' || CAST(sd.seed AS VARCHAR)), 1, 8)) AS BIGINT) % 2147483646 + 1) * h
      |              + CAST(concat('0x', substr(md5('b' || CAST(sd.seed AS VARCHAR)), 1, 8)) AS BIGINT) % 2147483647) % 2147483647) AS sig
      |  FROM hv CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed) sd
      |  GROUP BY 1, 2),
      |bk AS (
      |  SELECT doc_id, seed // 4 AS band,
      |         string_agg(CAST(sig AS VARCHAR), ',' ORDER BY seed) AS bkey
      |  FROM hs GROUP BY 1, 2),
      |hotb AS (SELECT band, bkey FROM bk GROUP BY 1, 2 HAVING COUNT(*) > 100),
      |pb AS (
      |  SELECT bk.* FROM bk
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM hotb h WHERE h.band = bk.band AND h.bkey = bk.bkey)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |  FROM pb a JOIN pb b
      |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
      |ip AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS nc
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT c.id1, c.id2,
      |         CAST(COALESCE(i.nc, 0) AS BIGINT) AS n_common,
      |         ca.nsh + cb.nsh - CAST(COALESCE(i.nc, 0) AS BIGINT) AS n_union,
      |         CAST(levenshtein(n1.norm, n2.norm) AS INTEGER) AS edit_dist,
      |         CAST(levenshtein(n1.norm, n2.norm) AS DOUBLE)
      |           / CAST(greatest(length(n1.norm), length(n2.norm)) AS DOUBLE) AS edit_ratio
      |  FROM cand c
      |  LEFT JOIN ip i ON i.id1 = c.id1 AND i.id2 = c.id2
      |  JOIN cnt ca ON ca.doc_id = c.id1
      |  JOIN cnt cb ON cb.doc_id = c.id2
      |  JOIN n n1 ON n1.doc_id = c.id1
      |  JOIN n n2 ON n2.doc_id = c.id2)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_a1_scan_count" ->
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem",

    "q_a2_date_profile" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS Year,
        |       CAST(month(o_orderdate) AS INTEGER) AS Month,
        |       MIN(o_orderkey) AS min_orderkey,
        |       MAX(o_orderkey) AS max_orderkey,
        |       CAST(MIN(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS min_date,
        |       CAST(MAX(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS max_date,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_a3_daily_sales" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate, Year, Month, Day, Week, DayOfWeek,
         |       NetDailyQuantity, NetDailyRevenue, AvgUnitPrice
         |FROM daily ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    "q_a4_monthly_rollup" -> withDaily(
      """SELECT Year, Month,
        |       CAST(SUM(NetDailyQuantity) AS BIGINT) AS total_qty,
        |       CAST(SUM(CAST(NetDailyRevenue AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
        |FROM daily GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_a5_country_topk" -> withDaily(
      """SELECT Country, CAST(SUM(NetDailyQuantity) AS BIGINT) AS total_qty
        |FROM daily GROUP BY 1
        |ORDER BY total_qty DESC, Country ASC LIMIT 15""".stripMargin),

    "q_a6_dow_rollup" -> withDaily(
      """SELECT DayOfWeek,
        |       CAST(SUM(NetDailyQuantity) AS BIGINT) AS total_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n_days
        |FROM daily GROUP BY 1 ORDER BY 1""".stripMargin),

    "q_a7_daily_totals" -> withDaily(
      s"""SELECT $tsDate, CAST(SUM(NetDailyQuantity) AS BIGINT) AS total_qty
         |FROM daily GROUP BY InvoiceDate ORDER BY InvoiceDate""".stripMargin),

    "q_a8_kpi_global" -> withDaily(
      s""",$evalCte
         |SELECT $kpiAggs
         |FROM err""".stripMargin),

    "q_a9_kpi_by_country" -> withDaily(
      s""",$evalCte
         |SELECT Country,
         |       $kpiAggs
         |FROM err GROUP BY Country ORDER BY Country""".stripMargin),

    "q_a10_value_weighted" -> withDaily(
      s""",$evalCte
         |SELECT *,
         |       (1.0 - total_err_value_model / total_err_value_baseline) * 100.0 AS pct_reduction
         |FROM (
         |  SELECT ${floorSum4("abs_err_model * AvgUnitPrice", "total_err_value_model")},
         |         ${floorSum4("abs_err_baseline * AvgUnitPrice", "total_err_value_baseline")},
         |         CAST(COUNT(*) AS BIGINT) AS n_rows
         |  FROM err) t""".stripMargin),

    "q_a11_percentile" ->
      """SELECT l_partkey,
        |       quantile_cont(l_quantity, 0.5) AS med_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_a12_count_distinct" ->
      """SELECT l_returnflag,
        |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_w7_ranking" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate,
         |       CAST(row_number() OVER w AS INTEGER) AS rn,
         |       lead(NetDailyQuantity, 1) OVER w AS next_qty,
         |       CAST(SUM(NetDailyQuantity) OVER cum AS BIGINT) AS cum_qty,
         |       CAST(rank() OVER cw AS INTEGER) AS date_rank,
         |       CAST(dense_rank() OVER cw AS INTEGER) AS date_dense_rank,
         |       CAST(ntile(4) OVER w AS INTEGER) AS quartile
         |FROM daily
         |WINDOW $seriesWin,
         |       cum AS (PARTITION BY Country, StockCode ORDER BY InvoiceDate
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |       cw AS (PARTITION BY Country ORDER BY InvoiceDate)
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    "q_a14_rollup" -> withDaily(
      """SELECT Year, Month,
        |       CAST(SUM(NetDailyQuantity) AS BIGINT) AS total_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n_days
        |FROM daily GROUP BY ROLLUP(Year, Month)
        |ORDER BY Year ASC NULLS FIRST, Month ASC NULLS FIRST""".stripMargin),

    "q_p1_proj_filter" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |       l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_p4_segment_filter" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,

    "q_p5_split_flag" ->
      """SELECT o_orderkey,
        |       CAST(o_orderdate <= TIMESTAMP '1998-06-30 00:00:00' AS INTEGER) AS is_train
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_d1_distinct_count" ->
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT DISTINCT * FROM lineitem) t",

    "q_d2_dedup_exact" ->
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q_j1_join_left" ->
      """SELECT o_orderkey, o_totalprice,
        |       COALESCE(c_name, 'UNKNOWN') AS cust_name
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_j2_join_composite" -> withDaily(
      s"""SELECT d.Country, d.StockCode, CAST(d.InvoiceDate AS TIMESTAMP) AS InvoiceDate, d.NetDailyQuantity, b.baseline_qty
         |FROM daily d
         |LEFT JOIN (
         |  SELECT Country, StockCode, InvoiceDate,
         |         COALESCE(
         |           CAST(SUM(NetDailyQuantity) OVER f6 AS DOUBLE) / CAST(COUNT(NetDailyQuantity) OVER f6 AS DOUBLE),
         |           CAST(lag(NetDailyQuantity, 1) OVER w AS DOUBLE)) AS baseline_qty
         |  FROM daily
         |  WINDOW $seriesWin, ${frameWin("f6", 6)}) b
         |  ON d.Country = b.Country AND d.StockCode = b.StockCode AND d.InvoiceDate = b.InvoiceDate
         |ORDER BY d.Country, d.StockCode, d.InvoiceDate""".stripMargin),

    "q_j3_join_inner" ->
      """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_j4_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_j5_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    // Mirrors AsofJoin.asofJoin (inclusive tie semantics: click at the same
    // instant counts) with DuckDB's native ASOF LEFT JOIN; clicks are
    // deduped to unique (user, ts) so "the" latest row is well-defined in
    // both engines.
    "q_j6_asof_clicks" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT event_id, user_id, ts, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
        |       CAST(c.ts AS TIMESTAMP) AS click_ts, c.click_value
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY event_id""".stripMargin,

    // Mirrors RangeJoin.intervalJoin's semantics with a plain inequality
    // join (DuckDB handles small inequality joins fine; the Spark side bins
    // to avoid the nested-loop plan).
    "q_j7_interval_clicks" ->
      """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
        |       CAST(c.ts AS TIMESTAMP) AS click_ts, c.value AS click_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts
        | AND c.ts > p.ts - INTERVAL 30 MINUTE
        |ORDER BY event_id, click_ts""".stripMargin,

    // Mirrors EventStreams.purchasesWithRecentClicks (inclusive 30-minute
    // lower bound, purchase-side value): run-to-completion streaming ⇒ the
    // watermarked stream-stream join must reproduce the batch join exactly.
    "q_e6_stream_join" ->
      """SELECT p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
        |       CAST(c.ts AS TIMESTAMP) AS click_ts, p.value
        |FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY p.user_id, purchase_ts, click_ts""".stripMargin,

    "q_u1_union_segments" -> withDaily(
      """SELECT * FROM (
        |  SELECT Country, CAST(SUM(NetDailyQuantity) AS BIGINT) AS total_qty, 'uk' AS segment
        |  FROM daily WHERE Country = 'NATION_0' GROUP BY Country
        |  UNION ALL
        |  SELECT Country, CAST(SUM(NetDailyQuantity) AS BIGINT) AS total_qty, 'others' AS segment
        |  FROM daily WHERE Country <> 'NATION_0' GROUP BY Country) t
        |ORDER BY segment, Country""".stripMargin),

    "q_u2_set_ops" -> withDaily(
      """SELECT * FROM (
        |  SELECT Country, 'intersect' AS op FROM (
        |    SELECT Country FROM daily WHERE StockCode = '1'
        |    INTERSECT
        |    SELECT Country FROM daily WHERE StockCode = '2')
        |  UNION ALL
        |  SELECT Country, 'except' AS op FROM (
        |    SELECT Country FROM daily WHERE StockCode = '1'
        |    EXCEPT
        |    SELECT Country FROM daily WHERE StockCode = '2')) t
        |ORDER BY op, Country""".stripMargin),

    "q_o1_sort_limit" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate, NetDailyQuantity
         |FROM daily ORDER BY Country, StockCode, InvoiceDate LIMIT 500""".stripMargin),

    "q_f1_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(ln(1.0 + CAST(l_quantity AS DOUBLE)), 6) AS log_qty,
        |       abs(l_extendedprice - 50000.0) AS abs_dev,
        |       l_quantity * 2.0 + 1.0 AS qty_affine,
        |       CASE WHEN l_discount > 0.05 THEN 'H' ELSE 'L' END AS disc_band
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1995-07-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_f2_json_extract" ->
      """SELECT event_id,
        |       CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q_f3_strings" ->
      """SELECT c_custkey,
        |       upper(c_name) AS name_upper,
        |       substr(c_name, 1, 8) AS name_prefix,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |       CAST(strpos(c_name, '0') AS INTEGER) AS first_zero_pos,
        |       concat_ws('|', c_mktsegment, c_name) AS seg_name,
        |       (string_split(c_name, '#'))[-1] AS name_suffix
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // max_by/min_by keyed on the unique custkey — ties impossible, so the
    // arg-extremum is deterministic in both engines.
    "q_f4_cond_aggs" ->
      """SELECT c_mktsegment,
        |       CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_positive,
        |       bool_or(c_acctbal < 0) AS any_negative,
        |       bool_and(c_acctbal > -1000) AS all_above_floor,
        |       max_by(c_name, c_custkey) AS latest_customer,
        |       min_by(c_name, c_custkey) AS earliest_customer
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_w10_nav" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate,
         |       first_value(NetDailyQuantity) OVER wc AS series_first_qty,
         |       last_value(NetDailyQuantity) OVER wc AS running_last_qty,
         |       nth_value(NetDailyQuantity, 2) OVER wc AS second_qty
         |FROM daily
         |WINDOW wc AS (PARTITION BY Country, StockCode ORDER BY InvoiceDate
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    "q_e1_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same oracle as q_e1: the streaming plan aggregates through the exact
    // DECIMAL accumulator (order-independent), so incremental execution must
    // reproduce the batch result bit-for-bit.
    "q_e3_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Mirrors session_window's merge rule (strict: a new session starts when
    // the event-to-event gap is >= the 30-minute window; Spark sessions are
    // [start, last+gap) half-open) via gaps-and-islands.
    "q_e2_sessions" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS is_start
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
        |                                ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id,
        |       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
        |       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // Same oracle as q_e2: streaming session_window aggregates through the
    // exact DECIMAL accumulator, so the incremental session merge must
    // reproduce the batch gaps-and-islands result bit-for-bit.
    "q_e4_stream_sessions" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS is_start
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
        |                                ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id,
        |       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
        |       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_a18_cube" -> withDaily(
      """SELECT Year, DayOfWeek,
        |       CAST(SUM(NetDailyQuantity) AS BIGINT) AS total_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n_days
        |FROM daily GROUP BY CUBE(Year, DayOfWeek)
        |ORDER BY Year ASC NULLS FIRST, DayOfWeek ASC NULLS FIRST""".stripMargin),

    "q_a19_grouping_sets" -> withDaily(
      """SELECT Country, Year,
        |       CAST(SUM(NetDailyQuantity) AS BIGINT) AS total_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(GROUPING(Country) AS INTEGER) AS g_country,
        |       CAST(GROUPING(Year) AS INTEGER) AS g_year
        |FROM daily
        |GROUP BY GROUPING SETS ((Country), (Year), ())
        |ORDER BY g_country ASC, g_year ASC,
        |         Country ASC NULLS FIRST, Year ASC NULLS FIRST""".stripMargin),

    // Mirrors Corpus.momentStats: (x, y·100) are lossless BIGINTs, the
    // moment sums are exact (HUGEINT here, DECIMAL(38,0) in Spark — both
    // exact integers, so the casts to DOUBLE agree bit-for-bit), and the
    // closed-form statistics below use the identical IEEE expression trees.
    "q_a20_moment_stats" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |         CAST(l_quantity AS BIGINT) AS x,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag,
        |         CAST(COUNT(*) AS BIGINT) AS n_out,
        |         CAST(SUM(x) AS DOUBLE) AS sx,
        |         CAST(SUM(y) AS DOUBLE) AS sy,
        |         CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |         CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |         CAST(SUM(y * y) AS DOUBLE) AS syy
        |  FROM b GROUP BY 1),
        |d AS (SELECT *, CAST(n_out AS DOUBLE) AS n FROM m)
        |SELECT l_returnflag, n_out AS n,
        |       (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |         AS corr_qty_price,
        |       (sxy - sx * sy / n) / (n - 1.0) / 100.0 AS covar_samp,
        |       (sxx - sx * sx / n) / n AS var_pop_qty,
        |       (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0 AS slope,
        |       sy / n / 100.0 - (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0 * (sx / n)
        |         AS intercept
        |FROM d ORDER BY l_returnflag""".stripMargin,

    // Mirrors Corpus.typedWeightedMean: the Aggregator's scaled-Long state
    // (Σ floor(price·100)·qty, Σ qty) recomputed as SQL integer moments —
    // exact in both engines, then the identical finish arithmetic.
    "q_a21_typed_agg" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)
        |                 * CAST(floor(l_quantity) AS BIGINT)) AS DOUBLE)
        |         / CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS DOUBLE) / 100.0 AS wmean_price,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Corpus.fromJsonParse: same injected edge rows. json_ok mirrors
    // the PERMISSIVE corrupt-record contract: malformed JSON or a
    // non-integer k field marks the record corrupt; a missing or null k
    // does not.
    "q_f7_from_json" ->
      """WITH base AS (
        |  SELECT event_id, props FROM events
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (CAST(5000000 AS BIGINT), '{"k": 42}'),
        |    (CAST(5000001 AS BIGINT), '{"x": 1}'),
        |    (CAST(5000002 AS BIGINT), '{"k": "abc"}'),
        |    (CAST(5000003 AS BIGINT), 'not json at all'),
        |    (CAST(5000004 AS BIGINT), '{"k": null}')
        |  ) v(event_id, props))
        |SELECT event_id,
        |       CASE WHEN json_valid(props)
        |            THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) END AS k_val,
        |       CASE WHEN NOT json_valid(props) THEN false
        |            WHEN json_extract(props, '$.k') IS NULL THEN true
        |            WHEN json_type(json_extract(props, '$.k')) IN ('NULL', 'BIGINT', 'UBIGINT') THEN true
        |            ELSE false END AS json_ok
        |FROM base ORDER BY event_id""".stripMargin,

    "q_f5_arrays" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |tk AS (SELECT doc_id, regexp_extract_all(norm, '\S+') AS toks FROM n)
        |SELECT doc_id,
        |       CAST(len(toks) AS INTEGER) AS n_tokens,
        |       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
        |       CAST(len(list_filter(toks, x -> length(x) >= 5)) AS INTEGER) AS n_long,
        |       CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
        |       list_contains(toks, 'spark') AS has_spark,
        |       list_min(toks) AS min_token,
        |       array_to_string(toks[1:3], '-') AS first3_joined
        |FROM tk ORDER BY doc_id""".stripMargin,

    "q_j10_join_full" -> withDaily(
      """,t1 AS (
        |  SELECT Country, CAST(SUM(NetDailyQuantity) AS BIGINT) AS qty_p1
        |  FROM daily WHERE StockCode = '1' GROUP BY 1),
        |t2 AS (
        |  SELECT Country, CAST(SUM(NetDailyQuantity) AS BIGINT) AS qty_p2
        |  FROM daily WHERE StockCode = '2' GROUP BY 1)
        |SELECT COALESCE(t1.Country, t2.Country) AS Country, qty_p1, qty_p2
        |FROM t1 FULL OUTER JOIN t2 ON t1.Country = t2.Country
        |ORDER BY Country""".stripMargin),

    "q_o7_sort_offset" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate, NetDailyQuantity
         |FROM daily ORDER BY Country, StockCode, InvoiceDate
         |LIMIT 200 OFFSET 100""".stripMargin),

    "q_f8_hashes" ->
      """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_u3_unpivot" -> withDaily(
      """,w AS (
        |  SELECT Country,
        |         CAST(SUM(NetDailyQuantity) AS DOUBLE) AS total_qty,
        |         CAST(SUM(CAST(NetDailyRevenue AS DECIMAL(30,6))) AS DOUBLE) AS total_rev,
        |         CAST(COUNT(*) AS DOUBLE) AS n_days
        |  FROM daily GROUP BY 1)
        |SELECT Country, metric, value FROM (
        |  SELECT Country, 'total_qty' AS metric, total_qty AS value FROM w
        |  UNION ALL SELECT Country, 'total_rev', total_rev FROM w
        |  UNION ALL SELECT Country, 'n_days', n_days FROM w) t
        |ORDER BY Country, metric""".stripMargin),

    // Mirrors Corpus.densifiedDailyTotals: generate_series materializes the
    // calendar, COALESCE zero-fills, and the trailing frame sum/count over
    // an empty frame propagates NULL identically in both engines.
    // Mirrors Corpus.exactMedianNosort: a full sort picking the identical
    // rank — the histogram-narrowed value must match bit for bit.
    "q_a23_exact_median" ->
      """WITH o AS (
        |  SELECT l_extendedprice AS v,
        |         ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn,
        |         COUNT(*) OVER () AS n
        |  FROM lineitem)
        |SELECT v AS median, CAST(n AS BIGINT) AS n_rows
        |FROM o WHERE rn = (n + 1) // 2""".stripMargin,

    // Mirrors Corpus.contentChecksum: the same md5-hex32 row fingerprints,
    // commutatively summed — identical under any row order or engine.
    "q_o8_content_checksum" -> withDaily(
      """,h AS (
        |  SELECT Year,
        |         CAST(concat('0x', substr(md5(concat_ws('|',
        |           Country, StockCode, strftime(InvoiceDate, '%Y-%m-%d'),
        |           CAST(NetDailyQuantity AS VARCHAR))), 1, 8)) AS BIGINT) AS h
        |  FROM daily)
        |SELECT Year, CAST(SUM(h) AS BIGINT) AS checksum,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM h GROUP BY Year ORDER BY Year""".stripMargin),

    // Mirrors Corpus.interpolatedDailyTotals: same grid, same IGNORE NULLS
    // endpoint windows, same prev + (next−prev)·Δ expression order.
    "q_w16_interpolate" -> withDaily(
      """,tot AS (
        |  SELECT Country, InvoiceDate, CAST(SUM(NetDailyQuantity) AS BIGINT) AS qty
        |  FROM daily GROUP BY 1, 2),
        |sp AS (SELECT Country, MIN(InvoiceDate) AS d0, MAX(InvoiceDate) AS d1 FROM tot GROUP BY 1),
        |cal AS (
        |  SELECT Country,
        |         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS InvoiceDate
        |  FROM sp),
        |g AS (
        |  SELECT c.Country, c.InvoiceDate, t.qty
        |  FROM cal c LEFT JOIN tot t ON t.Country = c.Country AND t.InvoiceDate = c.InvoiceDate),
        |e AS (
        |  SELECT Country, InvoiceDate, qty,
        |         last_value(CASE WHEN qty IS NOT NULL THEN InvoiceDate END IGNORE NULLS) OVER wb AS prev_day,
        |         last_value(qty IGNORE NULLS) OVER wb AS prev_qty,
        |         last_value(CASE WHEN qty IS NOT NULL THEN InvoiceDate END IGNORE NULLS) OVER wr AS next_day,
        |         last_value(qty IGNORE NULLS) OVER wr AS next_qty
        |  FROM g
        |  WINDOW wb AS (PARTITION BY Country ORDER BY InvoiceDate ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wr AS (PARTITION BY Country ORDER BY InvoiceDate DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT Country, CAST(InvoiceDate AS TIMESTAMP) AS InvoiceDate, qty,
        |       CASE WHEN qty IS NOT NULL THEN CAST(qty AS DOUBLE)
        |            ELSE CAST(prev_qty AS DOUBLE) + CAST(next_qty - prev_qty AS DOUBLE) *
        |                 (CAST(datediff('day', prev_day, InvoiceDate) AS DOUBLE) /
        |                  CAST(datediff('day', prev_day, next_day) AS DOUBLE))
        |       END AS qty_interp
        |FROM e
        |ORDER BY Country, InvoiceDate""".stripMargin),

    "q_w12_densify" -> withDaily(
      """,tot AS (
        |  SELECT Country, InvoiceDate, CAST(SUM(NetDailyQuantity) AS BIGINT) AS qty
        |  FROM daily GROUP BY 1, 2),
        |sp AS (SELECT Country, MIN(InvoiceDate) AS d0, MAX(InvoiceDate) AS d1 FROM tot GROUP BY 1),
        |cal AS (
        |  SELECT Country,
        |         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS InvoiceDate
        |  FROM sp),
        |dense AS (
        |  SELECT c.Country, c.InvoiceDate,
        |         COALESCE(t.qty, 0) AS qty,
        |         t.qty IS NOT NULL AS observed
        |  FROM cal c LEFT JOIN tot t ON t.Country = c.Country AND t.InvoiceDate = c.InvoiceDate)
        |SELECT Country, CAST(InvoiceDate AS TIMESTAMP) AS InvoiceDate, qty, observed,
        |       CAST(SUM(qty) OVER w AS DOUBLE) / CAST(COUNT(qty) OVER w AS DOUBLE) AS ma7_calendar
        |FROM dense
        |WINDOW w AS (PARTITION BY Country ORDER BY InvoiceDate ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |ORDER BY Country, InvoiceDate""".stripMargin),

    "q_w13_ratio_to_report" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate, NetDailyQuantity,
         |       CAST(NetDailyQuantity AS DOUBLE)
         |         / CAST(SUM(NetDailyQuantity) OVER (PARTITION BY Country) AS DOUBLE)
         |         AS share_of_country
         |FROM daily
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    "q_w11_dist" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate,
         |       percent_rank() OVER wc AS pct_rank,
         |       cume_dist() OVER wc AS cume,
         |       last_value(CASE WHEN DayOfWeek NOT IN (1, 7) THEN NetDailyQuantity END IGNORE NULLS)
         |         OVER (PARTITION BY Country ORDER BY InvoiceDate, StockCode
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_weekday_qty
         |FROM daily
         |WINDOW wc AS (PARTITION BY Country ORDER BY InvoiceDate, StockCode)
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    // Mirrors Corpus.datetimeFunctions; DATE outputs carry the TIMESTAMP
    // cast per the normalizeTemporal convention; floor(epoch(...)) matches
    // Spark's seconds truncation for positive timestamps.
    "q_f6_datetime" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date,
        |       CAST(quarter(l_shipdate) AS INTEGER) AS qtr,
        |       CAST(dayofyear(l_shipdate) AS INTEGER) AS doy,
        |       CAST(last_day(CAST(l_shipdate AS DATE)) AS TIMESTAMP) AS month_end,
        |       CAST(CAST(l_shipdate AS DATE) + 7 AS TIMESTAMP) AS week_later,
        |       CAST(date_diff('day', CAST(l_shipdate AS DATE), DATE '1999-01-01') AS INTEGER) AS days_to_1999,
        |       CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS TIMESTAMP) AS month_start,
        |       CAST(make_date(CAST(year(l_shipdate) AS INTEGER), CAST(month(l_shipdate) AS INTEGER), 1) AS TIMESTAMP) AS month_first,
        |       CAST(floor(epoch(l_shipdate)) AS BIGINT) AS epoch_s
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // Mirrors Corpus.countMinUsers: the same 4×64 count-min grid from the
    // same literal multiply-shift hashes over p = 2^61-1, probed for the
    // top-20 exact-heaviest users — grid contents, collisions, and the
    // min-over-rows estimates all reproduce exactly. q_e12 builds the SAME
    // grid as a Complete-mode streaming aggregate (cells only add, so the
    // final state equals the batch grid) and shares this oracle verbatim.
    "q_a25_countmin" -> countMinSql,
    "q_e12_stream_countmin" -> countMinSql,

    // Mirrors Corpus.bpeTrainMerges: the identical 8 training rounds —
    // weighted pair counts, (cnt desc, a, b) argmax, greedy merge apply.
    "q_t18_bpe_train" -> bpeTrainSql(8),
    "q_t18b_bpe_train_batched" -> bpeBatchedSql(16, 16),

    // Mirrors Corpus.bpeEncodeCounts: train the same 8 rules, encode every
    // word type, join back to token instances — per-doc integer counts.
    "q_t19_bpe_encode" -> bpeEncodeSql(8),

    // Mirrors Corpus.bpeVocab: the final-round symbol multiset per word
    // type, aggregated to the vocab artifact.
    "q_t20_bpe_vocab" -> bpeVocabSql(8),
    "q_t27_bpe_token_ids" -> bpeTokenIdsSql(8),

    // Mirrors Corpus.temperatureMix: identical BPE-pretoken counts, sqrt
    // weights, floor-quantized exact weight total, floor quotas, md5-ordered
    // exact-integer cumsum fill.
    "q_p13_temperature_mix" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |bs AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens FROM t GROUP BY 1),
        |wts AS (SELECT source, src_tokens, sqrt(CAST(src_tokens AS DOUBLE)) AS w FROM bs),
        |tw AS (SELECT CAST(SUM(CAST(floor(w * 1.0E9) AS BIGINT)) AS DOUBLE) / 1.0E9 AS total_w FROM wts),
        |qs AS (
        |  SELECT source, src_tokens,
        |         CAST(floor(100000.0 * w / total_w) AS BIGINT) AS quota
        |  FROM wts CROSS JOIN tw),
        |cum AS (
        |  SELECT doc_id, source, n_tokens,
        |         CAST(SUM(n_tokens) OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS cum_tokens
        |  FROM t),
        |sel AS (
        |  SELECT cum.source,
        |         CAST(COUNT(*) AS BIGINT) AS n_docs_selected,
        |         CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected
        |  FROM cum JOIN qs ON qs.source = cum.source AND cum.cum_tokens <= qs.quota
        |  GROUP BY 1)
        |SELECT qs.source, qs.src_tokens, qs.quota, sel.n_docs_selected, sel.tokens_selected
        |FROM qs JOIN sel ON sel.source = qs.source
        |ORDER BY qs.source""".stripMargin,

    // Mirrors Corpus.datasetCard: the q_t2 quality CTEs (via the shared
    // clean chain — only t/c/q are referenced, the dedup tail is never
    // evaluated), fingerprints, BPE pretoken counts, per-source rollup.
    "q_a26_dataset_card" -> cleanChainSql(
      """card AS (
        |  SELECT d.source, d.lang, d.n_chars, q.doc_id, q.quality,
        |         CAST(len(regexp_extract_all(d.text, '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS BIGINT) AS n_tokens,
        |         md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g')) AS fp
        |  FROM q JOIN documents d ON d.doc_id = q.doc_id)
        |SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en_docs,
        |       CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
        |       CAST(SUM(CAST(floor(quality * 1.0E9) AS BIGINT)) AS DOUBLE) / 1.0E9
        |         / CAST(COUNT(quality) AS DOUBLE) AS avg_quality
        |FROM card GROUP BY 1 ORDER BY source""".stripMargin, trailingCtes = true),

    // Mirrors Corpus.kfoldSplit: identical hex32(md5) mod 5 fold, exact
    // integer stratification counts.
    "q_p12_kfold" ->
      """SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS INTEGER) AS fold,
        |       lang,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Mirrors Corpus.hashedTfidf: identical tokenization, identical
    // hex16(md5) mod 256 bucket, exact tf/df/N, floor-scaled tf·idf micros
    // (ln on identical double quotients), same (w desc, bucket) top-3.
    // Mirrors Corpus.qualityClassifier: q_t17's hashed features collapsed
    // to (x1, x2, x3), q_t2 quality labels on the md5 fold-0 slice, the
    // exact-integer ridge stats + shared elimination text (q_ml3), and the
    // identical fixed-order score expression over broadcast betas.
    "q_t21_quality_classifier" ->
      s"""WITH $classifierCtes
         |SELECT doc_id, score, score >= 450.0 AS kept
         |FROM scored ORDER BY doc_id""".stripMargin,

    // q_e13 shares q_t21's oracle verbatim: scoring with the frozen model
    // is stateless, so the streamed micro-batches reproduce the batch pass
    // bit-for-bit.
    "q_e13_stream_classify" ->
      s"""WITH $classifierCtes
         |SELECT doc_id, score, score >= 450.0 AS kept
         |FROM scored ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.classifierThresholdSweep: the classifier CTEs' scored
    // surface joined to heuristic labels on the held-out md5 folds (1-4),
    // exact confusion counts per threshold, and the identical fixed-order
    // precision/recall/F1 expressions.
    "q_ml6_threshold_sweep" ->
      s"""WITH $classifierCtes,
         |hl AS (
         |  SELECT doc_id, quality >= CAST(0.35 AS DOUBLE) AS is_pos
         |  FROM q
         |  WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 <> 0),
         |j AS (SELECT s.score, hl.is_pos FROM scored s JOIN hl USING (doc_id)),
         |g AS (
         |  SELECT thr,
         |         CAST(SUM(CASE WHEN score >= CAST(thr AS DOUBLE) AND is_pos THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |         CAST(SUM(CASE WHEN score >= CAST(thr AS DOUBLE) AND NOT is_pos THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |         CAST(SUM(CASE WHEN score < CAST(thr AS DOUBLE) AND is_pos THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |         CAST(SUM(CASE WHEN score < CAST(thr AS DOUBLE) AND NOT is_pos THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM j CROSS JOIN (SELECT unnest([350, 400, 450, 500, 550]) AS thr) t
         |  GROUP BY thr),
         |pr AS (
         |  SELECT thr, tp, fp, fn, tn,
         |         CASE WHEN tp + fp = 0 THEN 0.0
         |              ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS prec,
         |         CASE WHEN tp + fn = 0 THEN 0.0
         |              ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS rec
         |  FROM g)
         |SELECT thr, tp, fp, fn, tn, prec, rec,
         |       CASE WHEN prec + rec = 0.0 THEN 0.0
         |            ELSE 2.0 * prec * rec / (prec + rec) END AS f1
         |FROM pr ORDER BY thr""".stripMargin,

    // Mirrors Corpus.cleanCorpusClassified (q_tp7): the tp1 chain with the
    // TRAINED classifier score as the stage-1 gate — classifier CTEs feed
    // qf, then the shared exact-dedup + capped-Jaccard tail.
    "q_tp7_clean_classified" ->
      s"""WITH $classifierCtes,
         |qf AS (
         |  SELECT d.doc_id, d.text, s.score
         |  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE s.score >= 450.0),
         |$dedupTailCtes
         |SELECT ex.doc_id, ex.score
         |FROM ex
         |WHERE ex.doc_id NOT IN (SELECT doc_id FROM removed)
         |ORDER BY ex.doc_id""".stripMargin,

    // Mirrors Corpus.markupStrip: the identical replacement chain (tags,
    // entities with &amp; last, whitespace collapse) over the clone of the
    // injected-HTML corpus.
    "q_t22_markup_strip" ->
      s"""WITH $markupBaseCte
         |SELECT doc_id,
         |       ${stripSqlExpr("text")} AS clean_text,
         |       CAST(length(text) AS INTEGER) AS n_chars_raw,
         |       CAST(length(${stripSqlExpr("text")}) AS INTEGER) AS n_chars_clean,
         |       CAST(len(regexp_extract_all(text, '<[^>]*>')) AS INTEGER) AS n_tags
         |FROM base ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.cleanCorpusStripped (q_tp8): strip markup first, then
    // the tp1 chain over the stripped text.
    "q_tp8_clean_stripped" -> cleanChainSql(
      """SELECT ex.doc_id, q2.quality
        |FROM ex
        |JOIN q q2 ON q2.doc_id = ex.doc_id
        |WHERE ex.doc_id NOT IN (SELECT doc_id FROM removed)
        |ORDER BY ex.doc_id""".stripMargin,
      src = "stripped",
      pre = s"""$markupBaseCte,
        |stripped AS (SELECT doc_id, ${stripSqlExpr("text")} AS text FROM base)""".stripMargin),

    // Mirrors Corpus.domainCuration: same synthesized URL, same regexp
    // domain extraction, same blocklist, same md5-ordered per-domain cap.
    // q_t23b (the salted two-phase cap) is RESULT-identical by the
    // rank-selectability property, so it shares this oracle verbatim.
    "q_t23_domain_curation" -> domainCurationSql,
    "q_t23b_salted_cap" -> domainCurationSql,

    // Mirrors Corpus.hostPageRank: identical synthesized host graph and
    // three unrolled integer-arithmetic damped rounds.
    "q_g1_pagerank" -> pageRankSql(3),

    // Mirrors Corpus.hostHits: two unrolled authority/hub rounds with
    // integer L1 rescale, same synthesized host graph as q_g1.
    "q_g4_hits" -> hitsSql(2),

    // Mirrors Corpus.hostPageRankRedistributed: sink-heavy graph (extra
    // www.extN links), per-round dangling-mass scalar redistributed
    // uniformly before damping.
    "q_g1b_pagerank_redist" ->
      s"""WITH ${pageRankRedistCtes(3)}
         |SELECT n.node AS domain, r.rank,
         |       CAST(COALESCE(o.ow, 0) AS BIGINT) AS out_w,
         |       CAST(COALESCE(i.iw, 0) AS BIGINT) AS in_w
         |FROM nodes n
         |JOIN r3 r ON r.node = n.node
         |LEFT JOIN outw o ON o.src = n.node
         |LEFT JOIN (SELECT dst, SUM(w) AS iw FROM edges GROUP BY 1) i ON i.dst = n.node
         |ORDER BY domain""".stripMargin,

    // Mirrors Corpus.pageRankConvergence: L1 deltas between consecutive
    // unrolled rounds of the shared CTEs.
    "q_g3_rank_convergence" ->
      s"""WITH ${pageRankCtes(3)}
         |SELECT 1 AS round, CAST(SUM(ABS(a.rank - b.rank)) AS BIGINT) AS l1_delta
         |FROM r1 a JOIN r0 b ON b.node = a.node
         |UNION ALL
         |SELECT 2, CAST(SUM(ABS(a.rank - b.rank)) AS BIGINT) FROM r2 a JOIN r1 b ON b.node = a.node
         |UNION ALL
         |SELECT 3, CAST(SUM(ABS(a.rank - b.rank)) AS BIGINT) FROM r3 a JOIN r2 b ON b.node = a.node
         |ORDER BY round""".stripMargin,

    // Mirrors Corpus.rankGatedDocs: the shared PageRank CTEs joined back
    // onto documents by domain; keep = above-uniform rank share.
    "q_g2_rank_gate" ->
      s"""WITH ${pageRankCtes(3)},
         |docdom AS (
         |  SELECT doc_id,
         |         'www.' || source || '-' || CAST(doc_id % 3 AS VARCHAR) || '.example.com' AS domain
         |  FROM documents)
         |SELECT dd.doc_id, dd.domain, r.rank,
         |       (r.rank * nn.n > 1000000000000) AS keep
         |FROM docdom dd
         |JOIN r3 r ON r.node = dd.domain
         |CROSS JOIN nn
         |ORDER BY dd.doc_id""".stripMargin,

    // Mirrors Corpus.shardManifest: same hash shard key, same
    // commutative per-shard checksum. q_s14 (merge of base+delta partial
    // manifests) is algebraically identical, so it shares this oracle.
    "q_s14_incr_manifest" -> shardManifestSql,

    // Mirrors Corpus.manifestDiff: identical v2 synthesis (%97 update
    // suffix + 10 re-arrived docs at +5000000 with their ORIGINAL text),
    // the same manifest aggregates per version, full-outer diff.
    "q_s15_manifest_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 97 = 0 THEN text || ' updated-v2' ELSE text END AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 5000000, text FROM documents WHERE doc_id < 10),
        |m1 AS (
        |  SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INTEGER) AS shard,
        |         CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS n_chars,
        |         CAST(SUM(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) AS BIGINT) AS n_tokens,
        |         CAST(SUM(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
        |  FROM v1 GROUP BY 1),
        |m2 AS (
        |  SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INTEGER) AS shard,
        |         CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS n_chars,
        |         CAST(SUM(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) AS BIGINT) AS n_tokens,
        |         CAST(SUM(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
        |  FROM v2 GROUP BY 1)
        |SELECT COALESCE(a.shard, b.shard) AS shard,
        |       COALESCE(a.n_docs, 0) AS n_docs_v1,
        |       COALESCE(b.n_docs, 0) AS n_docs_v2,
        |       COALESCE(b.n_docs, 0) - COALESCE(a.n_docs, 0) AS delta_docs,
        |       COALESCE(b.n_chars, 0) - COALESCE(a.n_chars, 0) AS delta_chars,
        |       COALESCE(b.n_tokens, 0) - COALESCE(a.n_tokens, 0) AS delta_tokens,
        |       (a.checksum IS DISTINCT FROM b.checksum) AS changed
        |FROM m1 a FULL JOIN m2 b ON a.shard = b.shard
        |ORDER BY shard""".stripMargin,
    "q_e15_stream_manifest" -> shardManifestSql,
    "q_s13_shard_manifest" -> shardManifestSql,

    // Mirrors Corpus.ensembleGate (q_tp15): the shared classifier CTEs
    // (ending in `scored`) joined with the Gopher predicate (stopMin=1)
    // and the integer repetition cap.
    "q_tp15_ensemble_gate" ->
      s"""WITH $classifierCtes,
         |esig AS (
         |  SELECT doc_id,
         |         ${gopherPassSql("text", 1)} AS pass_gopher,
         |         ((len(tn) - len(list_distinct(tn))) * 10 <= len(tn) * 9) AS pass_repetition
         |  FROM (SELECT doc_id, text,
         |          regexp_extract_all(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\S+') AS tn
         |        FROM documents))
         |SELECT s.doc_id, s.score,
         |       (s.score >= 450.0) AS pass_classifier,
         |       g.pass_gopher, g.pass_repetition,
         |       ((s.score >= 450.0) AND g.pass_gopher AND g.pass_repetition) AS keep
         |FROM scored s JOIN esig g USING (doc_id)
         |ORDER BY s.doc_id""".stripMargin,

    // Mirrors Corpus.publishPipeline (q_tp16): ensemble-gate survivors →
    // epoch instances → md5(doc_id#copy)-sharded manifest, one composed
    // replay.
    "q_tp16_publish" ->
      s"""WITH $classifierCtes,
         |esig AS (
         |  SELECT doc_id,
         |         ${gopherPassSql("text", 1)} AS pass_gopher,
         |         ((len(tn) - len(list_distinct(tn))) * 10 <= len(tn) * 9) AS pass_repetition
         |  FROM (SELECT doc_id, text,
         |          regexp_extract_all(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\S+') AS tn
         |        FROM documents)),
         |keepers AS (
         |  SELECT s.doc_id
         |  FROM scored s JOIN esig g USING (doc_id)
         |  WHERE s.score >= 450.0 AND g.pass_gopher AND g.pass_repetition),
         |pcfg(source, epochs, fthr) AS (VALUES
         |    ('src0', 3, '80'), ('src1', 3, '80'), ('src2', 3, '80'),
         |    ('src3', 3, '80'), ('src4', 3, '80'),
         |    ('src5', 1, '40'), ('src6', 1, '40'), ('src7', 1, '40'),
         |    ('src8', 1, '40'), ('src9', 1, '40'),
         |    ('src10', 0, 'c0'), ('src11', 0, 'c0'), ('src12', 0, 'c0'),
         |    ('src13', 0, 'c0'), ('src14', 0, 'c0'), ('src15', 0, 'c0'),
         |    ('src16', 0, 'c0'), ('src17', 0, 'c0'), ('src18', 0, 'c0'),
         |    ('src19', 0, 'c0')),
         |pnc AS (
         |  SELECT d.source, d.doc_id,
         |         pcfg.epochs + (CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || 'epoch'), 1, 2) < pcfg.fthr
         |                       THEN 1 ELSE 0 END) AS n_copies
         |  FROM documents d
         |  JOIN keepers k ON k.doc_id = d.doc_id
         |  JOIN pcfg ON pcfg.source = d.source),
         |pinst AS (
         |  SELECT doc_id,
         |         CAST(doc_id AS VARCHAR) || '#' || CAST(unnest(generate_series(1, n_copies)) AS VARCHAR) AS ikey
         |  FROM pnc WHERE n_copies > 0)
         |SELECT CAST(CAST(concat('0x', substr(md5(ikey), 1, 8)) AS BIGINT) % 8 AS INTEGER) AS shard,
         |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       CAST(COUNT(*) AS BIGINT) AS n_instances,
         |       CAST(SUM(CAST(concat('0x', substr(md5('i|' || ikey), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
         |FROM pinst GROUP BY 1 ORDER BY shard""".stripMargin,

    // Mirrors Corpus.epochRepeat: same broadcast config, same fractional
    // md5 epoch, same instance checksum.
    "q_p16_epoch_repeat" ->
      """WITH cfg(source, epochs, fthr) AS (VALUES
        |    ('src0', 3, '80'), ('src1', 3, '80'), ('src2', 3, '80'),
        |    ('src3', 3, '80'), ('src4', 3, '80'),
        |    ('src5', 1, '40'), ('src6', 1, '40'), ('src7', 1, '40'),
        |    ('src8', 1, '40'), ('src9', 1, '40'),
        |    ('src10', 0, 'c0'), ('src11', 0, 'c0'), ('src12', 0, 'c0'),
        |    ('src13', 0, 'c0'), ('src14', 0, 'c0'), ('src15', 0, 'c0'),
        |    ('src16', 0, 'c0'), ('src17', 0, 'c0'), ('src18', 0, 'c0'),
        |    ('src19', 0, 'c0')),
        |nc AS (
        |  SELECT d.source, d.doc_id,
        |         cfg.epochs + (CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || 'epoch'), 1, 2) < cfg.fthr
        |                       THEN 1 ELSE 0 END) AS n_copies
        |  FROM documents d JOIN cfg ON cfg.source = d.source),
        |inst AS (
        |  SELECT source, doc_id, unnest(generate_series(1, n_copies)) AS copy
        |  FROM nc WHERE n_copies > 0)
        |SELECT source,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(COUNT(*) AS BIGINT) AS n_instances,
        |       CAST(SUM(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(copy AS VARCHAR)), 1, 8)) AS BIGINT)) AS BIGINT) AS instance_checksum
        |FROM inst GROUP BY source ORDER BY source""".stripMargin,

    // Mirrors Corpus.importanceResample: hashed unigram+bigram bag
    // features, Laplace-smoothed floor-scaled log importance ratios
    // (target = src0-src4 vs raw), per-doc integer weight sums, and
    // deterministic Gumbel top-k selection (k = n//4). The oracle selects
    // via a rank window; the engine via the broadcast k-th-key threshold
    // — identical sets under the (key desc, doc_id asc) total order.
    "q_p17_importance_resample" ->
      s"""WITH tk AS (
        |  SELECT doc_id, source,
        |         ${toksSql("text")} AS toks
        |  FROM documents),
        |uni AS (SELECT doc_id, source, unnest(toks) AS gram FROM tk),
        |bi AS (
        |  SELECT doc_id, source,
        |         toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER) + 1] AS gram
        |  FROM tk, unnest(generate_series(1, len(toks) - 1)) AS g(i)
        |  WHERE len(toks) >= 2),
        |grams AS (
        |  SELECT doc_id, source, gram,
        |         CAST(CAST(concat('0x', substr(md5(gram), 1, 8)) AS BIGINT) % 1024 AS INTEGER) AS bucket
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        |raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM grams GROUP BY 1),
        |tgt AS (
        |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM grams
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4') GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT SUM(cr) FROM raw) AS rtot,
        |         (SELECT SUM(ct) FROM tgt) AS ttot),
        |lam AS (
        |  SELECT raw.bucket,
        |         CAST(floor(ln(
        |           (CAST(COALESCE(ct, 0) + 1 AS DOUBLE) * CAST(rtot + 1024 AS DOUBLE))
        |             / (CAST(COALESCE(cr, 0) + 1 AS DOUBLE) * CAST(ttot + 1024 AS DOUBLE))
        |         ) * 1.0E6) AS BIGINT) AS lam_micro
        |  FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket CROSS JOIN tot),
        |scored AS (
        |  SELECT g.doc_id,
        |         CAST(SUM(l.lam_micro) AS BIGINT) AS w_micro,
        |         CAST(COUNT(*) AS BIGINT) AS n_grams
        |  FROM grams g JOIN lam l ON l.bucket = g.bucket GROUP BY 1),
        |keyed AS (
        |  SELECT d.doc_id,
        |         COALESCE(s.n_grams, 0) AS n_grams,
        |         COALESCE(s.w_micro, 0) AS w_micro,
        |         COALESCE(s.w_micro, 0)
        |           + CAST(floor(-ln(-ln(
        |               (CAST(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR) || 'gum'), 1, 8)) AS BIGINT) AS DOUBLE) + 0.5)
        |                 / 4294967296.0)) * 1.0E6) AS BIGINT) AS gumbel_key
        |  FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id) AS r
        |  FROM keyed)
        |SELECT doc_id, n_grams, w_micro, gumbel_key,
        |       (r <= (SELECT COUNT(*) // 4 FROM documents)) AS selected
        |FROM rk ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.filterFunnel: one scan computes every gate flag
    // (length floor, integer repetition cap, language evidence, the tp1
    // quality formula verbatim), funnel = staged survivor sums.
    "q_t26_filter_funnel" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |         regexp_extract_all(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\S+') AS tn,
         |         regexp_extract_all(text, '\\S+') AS toks
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |         (len(tn) >= 20) AS g1,
         |         ((len(tn) - len(list_distinct(tn))) * 10 <= len(tn) * 3) AS g2,
         |         list_contains(tn, 'the') AS g3,
         |         (least(CAST(1.0 AS DOUBLE), CAST(len(toks) AS DOUBLE) / 100.0) * 0.5
         |           + (CASE WHEN len(toks) > 0
         |                THEN CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
         |                     / CAST(len(toks) AS DOUBLE)
         |                ELSE CAST(0.0 AS DOUBLE) END) * 0.3
         |           + least(CAST(1.0 AS DOUBLE),
         |               (CASE WHEN len(toks) > 0
         |                  THEN CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
         |                       / CAST(len(toks) AS DOUBLE)
         |                  ELSE CAST(0.0 AS DOUBLE) END) / 8.0) * 0.2 >= 0.5) AS g4
         |  FROM f),
         |a AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         |         CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         |         CAST(SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         |         CAST(SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         |         CAST(SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
         |  FROM g)
         |SELECT '1_length' AS stage, n0 AS docs_in, s1 AS docs_out, n0 - s1 AS dropped FROM a
         |UNION ALL SELECT '2_repetition', s1, s2, s1 - s2 FROM a
         |UNION ALL SELECT '3_language', s2, s3, s2 - s3 FROM a
         |UNION ALL SELECT '4_quality', s3, s4, s3 - s4 FROM a
         |ORDER BY stage""".stripMargin,

    // Mirrors Corpus.mojibakeRepair: same fixtures, the identical ordered
    // literal replacement chain (DuckDB replace() is global, matching
    // Spark's regexp_replace on the quoted literal).
    "q_t28_mojibake" -> {
      val fixed = graft.text.TextFunctions.MojibakeReplacements
        .foldLeft("text") { case (acc, (bad, good)) => s"replace($acc, '$bad', '$good')" }
      val pat = graft.text.TextFunctions.MojibakeReplacements.map(_._1).mkString("|")
      s"""WITH mb AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT CAST(v.doc_id AS BIGINT), v.text FROM (VALUES
         |    (4950000, 'CafÃ© rÃ©sumÃ© â€“ itâ€™s naÃ¯ve'),
         |    (4950001, 'â€œquotedâ€“dashâ€¦ and Ã¼ber Ã¶l Ã± Ã¨'),
         |    (4950002, 'perfectly clean ascii text here')
         |  ) AS v(doc_id, text))
         |SELECT doc_id,
         |       $fixed AS fixed_text,
         |       CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_artifacts,
         |       (len(regexp_extract_all(text, '$pat')) > 0) AS had_mojibake
         |FROM mb ORDER BY doc_id""".stripMargin
    },

    // Mirrors Corpus.gopherRules: same injected fixtures (newlines as
    // chr(10) concatenation), same RE2 count regexes, and the same
    // integer cross-multiplied rule set — no IEEE arithmetic anywhere.
    "q_t24_gopher_rules" ->
      s"""WITH $gopherBaseCte,
         |sig AS (
         |  SELECT doc_id,
         |         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
         |         CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS sum_wlen,
         |         CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT) AS n_symbols,
         |         CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         |         CAST(len(regexp_extract_all(text, '(?m)^[ \\t]*[-*] ')) AS BIGINT) AS n_bullet_lines,
         |         CAST(len(regexp_extract_all(text, '(?m)\\.\\.\\.$$')) AS BIGINT) AS n_ellipsis_lines,
         |         CAST(len(regexp_extract_all(text, '[^\\s]*\\p{L}[^\\s]*')) AS BIGINT) AS n_alpha_words,
         |         CAST($gopherStopSql AS BIGINT) AS n_stopword_kinds
         |  FROM gbase)
         |SELECT *,
         |       (n_words BETWEEN 50 AND 100000
         |        AND sum_wlen >= n_words * 3 AND sum_wlen <= n_words * 10
         |        AND n_symbols * 10 <= n_words
         |        AND n_bullet_lines * 10 <= n_lines * 9
         |        AND n_ellipsis_lines * 10 <= n_lines * 3
         |        AND n_alpha_words * 10 >= n_words * 8
         |        AND n_stopword_kinds >= 2) AS pass_gopher
         |FROM sig ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.nfcNormalizeDocs: DuckDB's nfc_normalize (utf8proc)
    // vs the engine's java.text.Normalizer — two independent NFC
    // implementations, one hash-gated answer (composition is stabilized
    // by Unicode policy). Fixtures built from chr() codepoints so no
    // editor ever normalizes them away.
    "q_t29_nfc_normalize" ->
      """WITH nf AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT CAST(v.doc_id AS BIGINT), v.text FROM (VALUES
        |    (4960000, 'Cafe' || chr(769) || ' au lait and A' || chr(778) || 'ngstro' || chr(776) || 'm units'),
        |    (4960001, 'Caf' || chr(233) || ' au lait and ' || chr(197) || 'ngstr' || chr(246) || 'm units'),
        |    (4960002, 'ascii only stays byte identical')
        |  ) AS v(doc_id, text)),
        |nn AS (
        |  SELECT doc_id, nfc_normalize(text) AS text_nfc,
        |         (nfc_normalize(text) <> text) AS changed
        |  FROM nf)
        |SELECT doc_id, text_nfc, changed,
        |       doc_id = MIN(doc_id) OVER (PARTITION BY md5(text_nfc)) AS keep,
        |       COUNT(*) OVER (PARTITION BY md5(text_nfc)) AS n_forms
        |FROM nn ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.chunkWithOverlap: identical integer chunk-count and
    // offset arithmetic (W=64, stride=48), per-chunk md5 over the
    // space-joined token slice.
    "q_t31_chunk_overlap" ->
      s"""WITH tk AS (
        |  SELECT doc_id,
        |         ${toksSql("text")} AS toks
        |  FROM documents),
        |nz AS (SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) > 0),
        |ch AS (
        |  SELECT doc_id, toks, n, CAST(i AS BIGINT) AS chunk_idx
        |  FROM nz, unnest(generate_series(0,
        |         CASE WHEN n <= 64 THEN 0 ELSE (n - 64 + 47) // 48 END)) AS g(i))
        |SELECT doc_id, chunk_idx,
        |       chunk_idx * 48 AS start_tok,
        |       least(chunk_idx * 48 + 64, n) AS end_tok,
        |       md5(array_to_string(
        |         toks[CAST(chunk_idx * 48 + 1 AS INTEGER):CAST(least(chunk_idx * 48 + 64, n) AS INTEGER)],
        |         ' ')) AS chunk_md5,
        |       least(chunk_idx * 48 + 64, n) - chunk_idx * 48 AS n_tokens
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    // Mirrors Corpus.zipfFit: same micro-log regression sums (exact
    // int64), slope assembled from exact wide-integer products (HUGEINT
    // here, DECIMAL(38,0) in the engine) and divided as double — both
    // engines divide the identical integers, and the intercept reuses
    // the named slope so the IEEE operation order matches.
    "q_t32_zipf_fit" ->
      s"""WITH tf AS (
        |  SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(${toksSql("text")}) AS t
        |        FROM documents)
        |  GROUP BY 1),
        |top AS (
        |  SELECT token, cnt FROM tf ORDER BY cnt DESC, token LIMIT 1000),
        |rkd AS (
        |  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rk FROM top),
        |xy AS (
        |  SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1.0E6) AS BIGINT) AS x,
        |         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1.0E6) AS BIGINT) AS y
        |  FROM rkd),
        |sums AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM xy),
        |sl AS (
        |  SELECT n, sx, sy,
        |         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |           / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS slope
        |  FROM sums)
        |SELECT n AS n_ranks, slope,
        |       (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |         - slope * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS intercept_micro
        |FROM sl""".stripMargin,

    // Mirrors Corpus.codeDetect: identical integer signal counts (the
    // fixtures carry real newlines/tabs — injected via chr() so the SQL
    // string needs no escape processing) and the same cross-multiplied
    // disjunction gate.
    "q_t30_code_detect" -> {
      val kwList = graft.queries.Corpus.CodeKeywords
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH cd AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT CAST(v.doc_id AS BIGINT), v.text FROM (VALUES
         |    (4980000, 'def main(args):' || chr(10) || '    x = load(args)' || chr(10) || '    for row in x:' || chr(10) || '        print(row)' || chr(10) || '    return x'),
         |    (4980001, 'int main() {' || chr(10) || '  int x = 0;' || chr(10) || '  while (x < 10) { x = x + 1; }' || chr(10) || '  return x;' || chr(10) || '}'),
         |    (4980002, 'the traveler chose to return home before dark and wrote a long letter about the journey across the hills and the quiet villages that lined the road'),
         |    (4980003, 'struct point {' || chr(13) || chr(10) || '  int x;' || chr(13) || chr(10) || '  int y;' || chr(13) || chr(10) || '};' || chr(13) || chr(10) || 'struct point origin' || chr(13) || chr(10))
         |  ) AS v(doc_id, text)),
         |sig AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         |         CAST(len(regexp_extract_all(text, '(?m)^(    |\\t)')) AS BIGINT) AS n_indent_lines,
         |         CAST(len(regexp_extract_all(text, '(?m)[;{}][ \\t]*\\r?$$')) AS BIGINT) AS n_punct_lines,
         |         CAST(len(list_filter(${toksSql("text")},
         |                              x -> list_contains($kwList, x))) AS BIGINT) AS n_kw,
         |         CAST(len(${toksSql("text")}) AS BIGINT) AS n_words
         |  FROM cd)
         |SELECT doc_id, n_lines, n_indent_lines, n_punct_lines, n_kw, n_words,
         |       (n_indent_lines * 10 >= n_lines * 3
         |        OR n_punct_lines * 10 >= n_lines * 4
         |        OR (n_kw > 0 AND n_kw * 20 >= n_words)) AS code_like
         |FROM sig ORDER BY doc_id""".stripMargin
    },

    // Mirrors Corpus.urlCanonicalDedup: same synthesized messy URLs (DIV-2
    // host key, case/port/slash/param/fragment pathologies keyed off
    // doc_id mods), the same canonicalization chain (DuckDB's \1 group
    // syntax vs Spark's $1 — semantically identical), and the same
    // min/count-per-canonical-key dedup.
    "q_t25_url_canonical" -> urlDedupOracle(
      """SELECT doc_id, url_raw, url_canon,
        |       doc_id = MIN(doc_id) OVER (PARTITION BY url_canon) AS keep,
        |       COUNT(*) OVER (PARTITION BY url_canon) AS group_size
        |FROM canon ORDER BY doc_id""".stripMargin),

    // q_t25b (salted two-phase min/count) is RESULT-identical to the
    // direct window — min and count are algebraic — so it shares q_t25's
    // oracle verbatim (the q_t23/q_t23b pattern).
    "q_t25b_salted_urls" -> urlDedupOracle(
      """SELECT doc_id, url_raw, url_canon,
        |       doc_id = MIN(doc_id) OVER (PARTITION BY url_canon) AS keep,
        |       COUNT(*) OVER (PARTITION BY url_canon) AS group_size
        |FROM canon ORDER BY doc_id""".stripMargin),

    // Mirrors Corpus.streamedUrlFrontier (q_e14): ascending-range
    // micro-batches + a canonical-URL frontier store make the streaming
    // keep/dup classification IDENTICAL to the one-shot q_t25 min rule,
    // so the oracle is q_t25's chain minus the (future-knowledge)
    // group_size column.
    "q_e14_stream_urls" -> urlDedupOracle(
      """SELECT doc_id, url_raw, url_canon,
        |       doc_id = MIN(doc_id) OVER (PARTITION BY url_canon) AS keep
        |FROM canon ORDER BY doc_id""".stripMargin),

    // Mirrors Corpus.crawlPipeline (q_tp12): ONE composed replay of the
    // crawl front door — canonical-URL dedup, markup strip, Gopher gate
    // (stopMin=1) on the stripped text, per-domain cap, exact content
    // dedup — over documents plus BOTH fixture families.
    "q_tp12_crawl_pipeline" ->
      s"""WITH cb AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  $markupValuesSql
         |  UNION ALL
         |  $gopherValuesSql),
         |curl AS (
         |  SELECT doc_id, text,
         |         ${messyUrlSql("CASE WHEN doc_id >= 4000000 THEN doc_id ELSE doc_id // 2 END")} AS url_raw
         |  FROM cb),
         |cstep AS (SELECT doc_id, text, ${urlStripSql("url_raw")} AS u1 FROM curl),
         |ccanon AS (SELECT doc_id, text, ${urlCanonSql("u1")} AS url_canon FROM cstep),
         |ukeep AS (
         |  SELECT doc_id, text, url_canon FROM (
         |    SELECT *, MIN(doc_id) OVER (PARTITION BY url_canon) AS u_min FROM ccanon)
         |  WHERE doc_id = u_min),
         |cstrip AS (
         |  SELECT doc_id, url_canon, ${stripSqlExpr("text")} AS text_clean FROM ukeep),
         |cgate AS (
         |  SELECT *, regexp_extract(url_canon, 'https?://([^/:]+)', 1) AS domain
         |  FROM cstrip
         |  WHERE ${gopherPassSql("text_clean", 1)}),
         |ccap AS (
         |  SELECT * FROM (
         |    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY domain
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
         |    FROM cgate)
         |  WHERE rk <= 5),
         |cfp AS (
         |  SELECT *, md5(regexp_replace(lower(trim(text_clean)), '\\s+', ' ', 'g')) AS fp
         |  FROM ccap)
         |SELECT doc_id, domain, rk,
         |       CAST(len(regexp_extract_all(text_clean, '\\S+')) AS BIGINT) AS n_words
         |FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS fp_min FROM cfp)
         |WHERE doc_id = fp_min
         |ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.groupSplit: same synthesized URL and regexp domain,
    // fold = hex32(md5(domain)) mod 5 — the group-keyed split.
    "q_p15_group_split" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         'https://www.' || source || '-' || CAST(doc_id % 3 AS VARCHAR)
        |           || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents)
        |SELECT doc_id,
        |       regexp_extract(url, 'https?://([^/]+)/', 1) AS domain,
        |       CAST(CAST(concat('0x', substr(md5(regexp_extract(url, 'https?://([^/]+)/', 1)), 1, 8)) AS BIGINT) % 5 AS INTEGER) AS fold
        |FROM u ORDER BY doc_id""".stripMargin,

    "q_t17_hashed_tfidf" ->
      """WITH nm AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |tk AS (SELECT doc_id, regexp_extract_all(norm, '\S+') AS toks FROM nm),
        |t AS (SELECT doc_id, unnest(toks) AS term FROM tk),
        |b AS (
        |  SELECT doc_id,
        |         CAST(CAST(concat('0x', substr(md5(term), 1, 4)) AS BIGINT) % 256 AS INTEGER) AS bucket
        |  FROM t),
        |tf AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf FROM b GROUP BY 1, 2),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |dfreq AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |w AS (
        |  SELECT tf.doc_id, tf.bucket, tf.tf,
        |         CAST(floor(CAST(tf.tf AS DOUBLE)
        |           * ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE))
        |           * 1.0E6) AS BIGINT) AS w_micro
        |  FROM tf JOIN dfreq ON dfreq.bucket = tf.bucket CROSS JOIN nd),
        |r AS (
        |  SELECT doc_id, bucket, tf, w_micro,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |                                 ORDER BY w_micro DESC, bucket) AS INTEGER) AS rk
        |  FROM w)
        |SELECT doc_id, rk, bucket, tf, w_micro FROM r
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // Mirrors Corpus.abTest: identical hash assignment, identical exact
    // moment sums, identical fixed-order Welch t expression.
    "q_a24_ab_test" ->
      """WITH e AS (
        |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |              THEN 'A' ELSE 'B' END AS variant,
        |         CAST(round(value * 100, 0) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
        |         SUM(CAST(v AS DECIMAL(38,0))) AS sv,
        |         SUM(CAST(v * v AS DECIMAL(38,0))) AS svv
        |  FROM e GROUP BY 1),
        |p AS (
        |  SELECT MAX(CASE WHEN variant = 'A' THEN n END) AS na0,
        |         MAX(CASE WHEN variant = 'A' THEN sv END) AS sva0,
        |         MAX(CASE WHEN variant = 'A' THEN svv END) AS svva0,
        |         MAX(CASE WHEN variant = 'B' THEN n END) AS nb0,
        |         MAX(CASE WHEN variant = 'B' THEN sv END) AS svb0,
        |         MAX(CASE WHEN variant = 'B' THEN svv END) AS svvb0
        |  FROM m)
        |SELECT na0 AS n_a, nb0 AS n_b,
        |       CAST(sva0 AS DOUBLE) / CAST(na0 AS DOUBLE) / 100.0 AS mean_a,
        |       CAST(svb0 AS DOUBLE) / CAST(nb0 AS DOUBLE) / 100.0 AS mean_b,
        |       (CAST(sva0 AS DOUBLE) / CAST(na0 AS DOUBLE) - CAST(svb0 AS DOUBLE) / CAST(nb0 AS DOUBLE)) /
        |       sqrt((CAST(svva0 AS DOUBLE) - CAST(sva0 AS DOUBLE) * CAST(sva0 AS DOUBLE) / CAST(na0 AS DOUBLE)) / (CAST(na0 AS DOUBLE) - 1.0) / CAST(na0 AS DOUBLE)
        |          + (CAST(svvb0 AS DOUBLE) - CAST(svb0 AS DOUBLE) * CAST(svb0 AS DOUBLE) / CAST(nb0 AS DOUBLE)) / (CAST(nb0 AS DOUBLE) - 1.0) / CAST(nb0 AS DOUBLE))
        |         AS t_stat
        |FROM p""".stripMargin,

    // Mirrors Corpus.eventFunnel: the same chained whole-partition stage
    // windows and exact-integer conversion divisions.
    "q_e9_funnel" ->
      """WITH s AS (
        |  SELECT user_id, event_type, ts,
        |         MIN(CASE WHEN event_type = 'signup' THEN ts END) OVER w AS t1
        |  FROM events WINDOW w AS (PARTITION BY user_id)),
        |s2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'view' AND ts >= t1 THEN ts END) OVER w AS t2
        |  FROM s WINDOW w AS (PARTITION BY user_id)),
        |s3 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= t2 THEN ts END) OVER w AS t3
        |  FROM s2 WINDOW w AS (PARTITION BY user_id)),
        |s4 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t3 THEN ts END) OVER w AS t4
        |  FROM s3 WINDOW w AS (PARTITION BY user_id)),
        |a AS (
        |  SELECT CAST(COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS BIGINT) AS u1,
        |         CAST(COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS BIGINT) AS u2,
        |         CAST(COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS BIGINT) AS u3,
        |         CAST(COUNT(DISTINCT CASE WHEN t4 IS NOT NULL THEN user_id END) AS BIGINT) AS u4
        |  FROM s4)
        |SELECT stage, stage_name,
        |       CASE stage WHEN 1 THEN u1 WHEN 2 THEN u2 WHEN 3 THEN u3 ELSE u4 END AS n_users,
        |       CAST(CASE stage WHEN 1 THEN u1 WHEN 2 THEN u2 WHEN 3 THEN u3 ELSE u4 END AS DOUBLE)
        |         / CAST(u1 AS DOUBLE) AS conversion
        |FROM a, (VALUES (1, 'signup'), (2, 'view'), (3, 'click'), (4, 'purchase')) AS v(stage, stage_name)
        |ORDER BY stage""".stripMargin,

    // Mirrors Corpus.cohortRetention: same week truncation, same offset
    // arithmetic, same first_value cohort size.
    "q_e10_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('week', ts) AS aw,
        |         MIN(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cw
        |  FROM events),
        |tri AS (
        |  SELECT CAST(cw AS TIMESTAMP) AS cohort_week,
        |         CAST(datediff('day', cw, aw) / 7 AS INTEGER) AS week_offset,
        |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        |  FROM e GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_active,
        |       CAST(n_active AS DOUBLE) /
        |       CAST(first_value(n_active) OVER (PARTITION BY cohort_week ORDER BY week_offset) AS DOUBLE)
        |         AS retention
        |FROM tri
        |ORDER BY cohort_week, week_offset""".stripMargin,

    // q_e8 is the q_u4 merge executed as a foreachBatch stream — same
    // final state, same oracle.
    "q_e8_stream_merge" ->
      """WITH base AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name, c_acctbal FROM customer),
        |upd AS (
        |  SELECT k, c_name, c_acctbal + 1000.0 AS c_acctbal, (k % 20 = 0) AS del
        |  FROM base WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT k + 900000, c_name, c_acctbal, false FROM base WHERE k % 7 = 3),
        |merged AS (
        |  SELECT k, c_name, c_acctbal FROM base WHERE k NOT IN (SELECT k FROM upd)
        |  UNION ALL
        |  SELECT k, c_name, c_acctbal FROM upd WHERE NOT del)
        |SELECT k AS c_custkey, c_name, c_acctbal
        |FROM merged ORDER BY c_custkey""".stripMargin,

    // Mirrors Corpus.schemaEvolutionRead: mergeSchema back-fills the
    // late-added column with NULL for pre-evolution files.
    "q_s12_schema_evolution" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,

    // Mirrors Corpus.zorderKeys: the identical bit-interleave arithmetic —
    // every term is an exact-in-double integer, so the double SUM is exact
    // in any order and the final BIGINT cast matches Spark's.
    "q_s11_zorder" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |         CAST(o_custkey % 1024 AS INTEGER) AS zx,
        |         CAST(dayofyear(o_orderdate) - 1 AS INTEGER) AS zy
        |  FROM orders)
        |SELECT o_orderkey, zx, zy,
        |       CAST(SUM(
        |         fmod(floor(zx / pow(2.0, k)), 2.0) * pow(4.0, k)
        |       + fmod(floor(zy / pow(2.0, k)), 2.0) * pow(4.0, k) * 2.0
        |       ) AS BIGINT) AS zval
        |FROM b, unnest(generate_series(0, 9)) AS g(k)
        |GROUP BY o_orderkey, zx, zy
        |ORDER BY o_orderkey""".stripMargin,

    // The ORC round-trip must be lossless: reading the ORC copy back with a
    // predicate equals the same query over the original parquet.
    "q_s8_orc_roundtrip" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY c_custkey""".stripMargin,

    // The partitioned layout must round-trip: reading the partitionBy(Year)
    // parquet back with a Year predicate equals the plain filtered query.
    "q_s7_partitioned_scan" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate, Year, NetDailyQuantity
         |FROM daily WHERE Year = 1997
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    // Mirrors Corpus.rebalancedRoundtrip — the sized write changes file
    // boundaries only, so the oracle is the plain projected daily grain.
    "q_s10_rebalanced_write" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate, NetDailyQuantity
         |FROM daily
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    // Mirrors Corpus.dppJoin — dynamic partition pruning changes only the
    // physical scan, so the oracle is the plain daily ⋈ filtered-dim join.
    "q_s9_dpp_join" -> withDaily(
      """,dim AS (
        |  SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS Year
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31')
        |SELECT d.Year,
        |       CAST(SUM(d.NetDailyQuantity) AS BIGINT) AS total_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM daily d JOIN dim USING (Year)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Mirrors Corpus.tokenHistogram (q_a16-style capped bands over the token
    // count).
    "q_t11_length_hist" ->
      """WITH n AS (SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |c AS (SELECT len(regexp_extract_all(norm, '\S+')) AS n_tok FROM n)
        |SELECT CAST(least(greatest(floor(n_tok / 20.0), 0.0), 9.0) AS INTEGER) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // Streaming dedup of a twice-delivered stream must restore the original
    // table: the oracle aggregates the ORIGINAL events (ids unique by
    // fixture contract), through the exact DECIMAL accumulator.
    "q_e5_stream_dedup" ->
      """SELECT event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Corpus.rangeFrameWeek: RANGE frame over the exact epoch-day
    // integer key; NULL sums over empty frames propagate identically.
    "q_w9_range_frame" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate, NetDailyQuantity,
         |       CAST(SUM(NetDailyQuantity) OVER wr AS DOUBLE)
         |         / CAST(COUNT(NetDailyQuantity) OVER wr AS DOUBLE) AS week_mean_qty
         |FROM daily
         |WINDOW wr AS (PARTITION BY Country, StockCode
         |              ORDER BY (InvoiceDate - DATE '1970-01-01')
         |              RANGE BETWEEN 6 PRECEDING AND 1 PRECEDING)
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    // Mirrors Corpus.saltedTrailing — salting + the two-level shape change
    // nothing, so the oracle is the plain GROUP BY + trailing range window.
    "q_w14_salted_trailing" -> withDaily(
      s""",g AS (
         |  SELECT Country, InvoiceDate,
         |         CAST(SUM(NetDailyQuantity) AS BIGINT) AS day_total
         |  FROM daily GROUP BY 1, 2)
         |SELECT Country, $tsDate, day_total,
         |       CAST(SUM(day_total) OVER wr AS BIGINT) AS trail7
         |FROM g
         |WINDOW wr AS (PARTITION BY Country
         |              ORDER BY (InvoiceDate - DATE '1970-01-01')
         |              RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
         |ORDER BY Country, InvoiceDate""".stripMargin),

    // Mirrors Corpus.blockCumsumDaily — the hierarchical prefix sum must be
    // bit-identical to the plain whole-partition running-total window.
    "q_w15_block_cumsum" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate, NetDailyQuantity,
         |       CAST(SUM(NetDailyQuantity) OVER (
         |         PARTITION BY Country ORDER BY InvoiceDate, StockCode
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_total
         |FROM daily
         |ORDER BY Country, InvoiceDate, StockCode""".stripMargin),

    "q_a16_histogram" ->
      """SELECT CAST(least(greatest(floor(value / 10.0), 0.0), 9.0) AS INTEGER) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_a17_pivot" -> withDaily(
      """SELECT Country,
        |       CAST(SUM(CASE WHEN DayOfWeek = 1 THEN NetDailyQuantity END) AS BIGINT) AS dow_1,
        |       CAST(SUM(CASE WHEN DayOfWeek = 2 THEN NetDailyQuantity END) AS BIGINT) AS dow_2,
        |       CAST(SUM(CASE WHEN DayOfWeek = 3 THEN NetDailyQuantity END) AS BIGINT) AS dow_3,
        |       CAST(SUM(CASE WHEN DayOfWeek = 4 THEN NetDailyQuantity END) AS BIGINT) AS dow_4,
        |       CAST(SUM(CASE WHEN DayOfWeek = 5 THEN NetDailyQuantity END) AS BIGINT) AS dow_5,
        |       CAST(SUM(CASE WHEN DayOfWeek = 6 THEN NetDailyQuantity END) AS BIGINT) AS dow_6,
        |       CAST(SUM(CASE WHEN DayOfWeek = 7 THEN NetDailyQuantity END) AS BIGINT) AS dow_7
        |FROM daily GROUP BY Country ORDER BY Country""".stripMargin),

    "q_w1_lag_features" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate,
         |       COALESCE(lag(NetDailyQuantity, 1) OVER w, 0) AS lag_qty_1_day,
         |       COALESCE(lag(NetDailyQuantity, 2) OVER w, 0) AS lag_qty_2_day,
         |       COALESCE(lag(NetDailyQuantity, 3) OVER w, 0) AS lag_qty_3_day,
         |       COALESCE(lag(AvgUnitPrice, 1) OVER w, CAST(0 AS DOUBLE)) AS lag_price_1_day,
         |       COALESCE(lag(NetDailyQuantity, 6) OVER w, 0) AS lag_qty_1_6cycle,
         |       COALESCE(lag(NetDailyQuantity, 1) OVER wd, 0) AS lag_qty_1_dow
         |FROM daily
         |WINDOW $seriesWin, $dowWin
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    "q_w2_rolling_stats" -> withDaily(
      s""",roll AS (
         |  SELECT Country, StockCode, InvoiceDate,
         |         CAST(COUNT(NetDailyQuantity) OVER f3 AS DOUBLE) AS n3,
         |         CAST(SUM(NetDailyQuantity) OVER f3 AS DOUBLE) AS a3,
         |         CAST(SUM(NetDailyQuantity * NetDailyQuantity) OVER f3 AS DOUBLE) AS b3,
         |         CAST(COUNT(NetDailyQuantity) OVER f6 AS DOUBLE) AS n6,
         |         CAST(SUM(NetDailyQuantity) OVER f6 AS DOUBLE) AS a6,
         |         CAST(SUM(NetDailyQuantity * NetDailyQuantity) OVER f6 AS DOUBLE) AS b6,
         |         CAST(COUNT(NetDailyQuantity) OVER fd3 AS DOUBLE) AS nd3,
         |         CAST(SUM(NetDailyQuantity) OVER fd3 AS DOUBLE) AS ad3
         |  FROM daily
         |  WINDOW ${frameWin("f3", 3)}, ${frameWin("f6", 6)}, ${frameWin("fd3", 3, dow = true)})
         |SELECT Country, StockCode, $tsDate,
         |       a3 / n3 AS roll_mean_3d,
         |       CASE WHEN n3 >= 2 THEN sqrt((b3 - a3 * a3 / n3) / (n3 - 1.0)) END AS roll_std_3d,
         |       a6 / n6 AS roll_mean_6d,
         |       CASE WHEN n6 >= 2 THEN sqrt((b6 - a6 * a6 / n6) / (n6 - 1.0)) END AS roll_std_6d,
         |       ad3 / nd3 AS roll_mean_3_dow
         |FROM roll
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    "q_w4_rolling_median" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate,
         |       quantile_cont(NetDailyQuantity, 0.5) OVER f3 AS roll_median_3d,
         |       quantile_cont(NetDailyQuantity, 0.5) OVER f6 AS roll_median_6d,
         |       quantile_cont(NetDailyQuantity, 0.5) OVER fd3 AS roll_median_3_dow
         |FROM daily
         |WINDOW ${frameWin("f3", 3)}, ${frameWin("f6", 6)}, ${frameWin("fd3", 3, dow = true)}
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    "q_w5_diff_features" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate,
         |       CAST(NetDailyQuantity AS DOUBLE)
         |         - CAST(SUM(NetDailyQuantity) OVER f3 AS DOUBLE) / CAST(COUNT(NetDailyQuantity) OVER f3 AS DOUBLE) AS diff_qty_mean_3d,
         |       CAST(NetDailyQuantity AS DOUBLE)
         |         - quantile_cont(NetDailyQuantity, 0.5) OVER f3 AS diff_qty_median_3d
         |FROM daily
         |WINDOW ${frameWin("f3", 3)}
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    "q_w4c_papprox_window" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate,
         |       quantile_disc(NetDailyQuantity, 0.5) OVER f3 AS approx_median_3d,
         |       quantile_disc(NetDailyQuantity, 0.5) OVER f6 AS approx_median_6d,
         |       quantile_disc(NetDailyQuantity, 0.5) OVER fd3 AS approx_median_3_dow
         |FROM daily
         |WINDOW ${frameWin("f3", 3)}, ${frameWin("f6", 6)}, ${frameWin("fd3", 3, dow = true)}
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin),

    // Per-series grain: group sizes stay ≪ accuracy at any sf, so the
    // sketch's exact path survives distributed merge (see Corpus scaladoc —
    // the Country-level form drifted off-by-one at sf0.1).
    "q_w4b_percentile_approx" -> withDaily(
      """SELECT Country, StockCode,
        |       quantile_disc(NetDailyQuantity, 0.5) AS approx_median_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM daily GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_a15_profile" ->
      """SELECT column_name, min_val, max_val, n_nulls, n_rows FROM (
        |  SELECT 'l_quantity' AS column_name,
        |         CAST(MIN(l_quantity) AS DOUBLE) AS min_val,
        |         CAST(MAX(l_quantity) AS DOUBLE) AS max_val,
        |         CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_nulls,
        |         CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice',
        |         CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
        |         CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT), CAST(COUNT(*) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount',
        |         CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
        |         CAST(COUNT(*) - COUNT(l_discount) AS BIGINT), CAST(COUNT(*) AS BIGINT)
        |  FROM lineitem)
        |ORDER BY column_name""".stripMargin,

    // Mirrors graft.text.NgramLm.scoreDocs: identical tokenization to q_t1,
    // exact integer unigram/bigram counts and vocab size, add-one-smoothed
    // conditional as a double quotient of exact ints, floor-scaled ln terms
    // weighted by per-doc bigram tf, IEEE-exact final divides.
    "q_t16_ngram_lm" ->
      s"""WITH $ngramLmCtes
         |SELECT doc_id, n_bigrams, avg_logp
         |FROM lmscore ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.perplexityMix: the q_t16 LM score bucketed at the
    // same fixed double thresholds and the same md5 keep-rate hash.
    "q_p14_perplexity_mix" ->
      s"""WITH $ngramLmCtes,
         |b AS (
         |  SELECT doc_id,
         |         CASE WHEN avg_logp >= CAST(-3.39 AS DOUBLE) THEN 'head'
         |              WHEN avg_logp >= CAST(-3.42 AS DOUBLE) THEN 'middle'
         |              ELSE 'tail' END AS bucket,
         |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS h
         |  FROM lmscore)
         |SELECT doc_id, bucket,
         |       CASE WHEN bucket = 'head' THEN TRUE
         |            WHEN bucket = 'middle' THEN h < 50
         |            ELSE h < 10 END AS kept
         |FROM b ORDER BY doc_id""".stripMargin,

    // Mirrors graft.text.Bm25.topK: identical tokenization to q_t1, integer
    // tf/df/dl, exact integer-sum avgdl, Lucene idf, floor-scaled exact
    // per-doc sum (the q_dd5 construction) — ln() is the only
    // transcendental, on identical double inputs in both engines.
    "q_t6_bm25" ->
      """WITH nm AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |tk AS (SELECT doc_id, regexp_extract_all(norm, '\S+') AS toks FROM nm),
        |d AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM tk),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |         CAST(CAST(SUM(CAST(dl AS BIGINT)) AS BIGINT) AS DOUBLE)
        |           / CAST(COUNT(*) AS DOUBLE) AS avgdl
        |  FROM d),
        |tf AS (
        |  SELECT doc_id, t AS term, CAST(COUNT(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
        |  WHERE t IN ('spark', 'merge', 'window', 'stream')
        |  GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |w AS (
        |  SELECT tf.doc_id,
        |         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |           * (tf.tf * (1.2 + 1.0))
        |           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / avgdl)) AS w
        |  FROM tf
        |  JOIN dfreq ON dfreq.term = tf.term
        |  JOIN d ON d.doc_id = tf.doc_id
        |  CROSS JOIN stats)
        |SELECT doc_id,
        |       CAST(SUM(CAST(floor(w * 1.0E6) AS BIGINT)) AS DOUBLE) / 1.0E6 AS bm25
        |FROM w GROUP BY 1
        |ORDER BY bm25 DESC, doc_id LIMIT 25""".stripMargin,

    "q_t1_tokens" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_tokens,
        |       CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS INTEGER) AS n_distinct_tokens,
        |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_t2_quality" ->
      s"""WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS toks FROM documents),
         |c AS (
         |  SELECT doc_id, text,
         |         CAST(len(toks) AS DOUBLE) AS n_tok,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS stop_ratio,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS mean_tok_len
         |  FROM t)
         |SELECT doc_id,
         |       CAST(length(text) AS INTEGER) AS n_chars,
         |       CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS INTEGER) AS n_punct,
         |       stop_ratio,
         |       least(CAST(1.0 AS DOUBLE), n_tok / 100.0) * 0.5
         |         + stop_ratio * 0.3
         |         + least(CAST(1.0 AS DOUBLE), mean_tok_len / 8.0) * 0.2 AS quality
         |FROM c ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.textLangId / TextFunctions.langId5: same injected
    // en/de/fr/es/it sentences, same function-word + accent-char profile
    // scoring, same argmax with en > de > fr > es > it tie order. All score
    // arithmetic is int/int division, 5.0 * x, and one addition —
    // IEEE-identical in both engines.
    "q_t3_langid" ->
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (CAST(3000000 AS BIGINT), 'the quick brown fox and the lazy dog are in the garden and it is a fine day'),
         |    (CAST(3000001 AS BIGINT), 'der hund und die katze sind nicht in dem haus aber ich bin mit den kindern auf den feldern'),
         |    (CAST(3000002 AS BIGINT), 'ich habe das buch von dem mann mit der großen tür und es ist schön für die übung'),
         |    (CAST(3000003 AS BIGINT), 'le chat est dans la maison et je ne pense pas que les enfants vont jouer avec le chien'),
         |    (CAST(3000004 AS BIGINT), 'nous avons mangé le dîner à côté de la fenêtre et c est une belle journée pour les amis'),
         |    (CAST(3000005 AS BIGINT), 'el perro y el gato no están en la casa pero es un buen día para jugar con los niños en el jardín'),
         |    (CAST(3000006 AS BIGINT), 'il cane e il gatto non sono nella casa ma è un bel giorno per giocare con i bambini più piccoli nel giardino')
         |  ) v(doc_id, text)),
         |n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM base),
         |t AS (SELECT doc_id, norm, regexp_extract_all(norm, '\\S+') AS toks FROM n),
         |c AS (
         |  SELECT doc_id,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS r_en,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(len(list_filter(toks, x -> list_contains($stopListDe, x))) AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS r_de,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(len(list_filter(toks, x -> list_contains($stopListFr, x))) AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS r_fr,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(len(list_filter(toks, x -> list_contains($stopListEs, x))) AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS r_es,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(len(list_filter(toks, x -> list_contains($stopListIt, x))) AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS r_it,
         |         CASE WHEN length(norm) > 0
         |              THEN CAST(length(norm) - length(regexp_replace(norm, '[äöüß]', '', 'g')) AS DOUBLE)
         |                   / CAST(length(norm) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS a_de,
         |         CASE WHEN length(norm) > 0
         |              THEN CAST(length(norm) - length(regexp_replace(norm, '[éèêëàâçîïôùû]', '', 'g')) AS DOUBLE)
         |                   / CAST(length(norm) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS a_fr,
         |         CASE WHEN length(norm) > 0
         |              THEN CAST(length(norm) - length(regexp_replace(norm, '[áéíóúñ]', '', 'g')) AS DOUBLE)
         |                   / CAST(length(norm) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS a_es,
         |         CASE WHEN length(norm) > 0
         |              THEN CAST(length(norm) - length(regexp_replace(norm, '[àèéìòù]', '', 'g')) AS DOUBLE)
         |                   / CAST(length(norm) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS a_it
         |  FROM t),
         |s AS (
         |  SELECT doc_id,
         |         r_en AS score_en,
         |         r_de + 5.0 * a_de AS score_de,
         |         r_fr + 5.0 * a_fr AS score_fr,
         |         r_es + 5.0 * a_es AS score_es,
         |         r_it + 5.0 * a_it AS score_it
         |  FROM c)
         |SELECT doc_id, score_en, score_de, score_fr, score_es, score_it,
         |       CASE WHEN greatest(score_en, score_de, score_fr, score_es, score_it) < CAST(0.05 AS DOUBLE) THEN 'other'
         |            WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es AND score_en >= score_it THEN 'en'
         |            WHEN score_de >= score_fr AND score_de >= score_es AND score_de >= score_it THEN 'de'
         |            WHEN score_fr >= score_es AND score_fr >= score_it THEN 'fr'
         |            WHEN score_es >= score_it THEN 'es'
         |            ELSE 'it' END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin,

    "q_t4_shingles" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |cp AS (
        |  SELECT doc_id, norm, unnest(generate_series(1, length(norm) - 4)) AS i
        |  FROM n WHERE length(norm) >= 5),
        |cg AS (
        |  SELECT doc_id, COUNT(DISTINCT substr(norm, CAST(i AS INTEGER), 5)) AS n5
        |  FROM cp GROUP BY 1),
        |tk AS (SELECT doc_id, regexp_extract_all(norm, '\S+') AS toks FROM n),
        |wp AS (
        |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        |  FROM tk WHERE len(toks) >= 3),
        |wg AS (
        |  SELECT doc_id,
        |         COUNT(DISTINCT array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ')) AS w3
        |  FROM wp GROUP BY 1)
        |SELECT n.doc_id,
        |       CAST(COALESCE(cg.n5, 0) AS INTEGER) AS n_char5,
        |       CAST(COALESCE(wg.w3, 0) AS INTEGER) AS n_word3
        |FROM n LEFT JOIN cg ON n.doc_id = cg.doc_id LEFT JOIN wg ON wg.doc_id = n.doc_id
        |ORDER BY n.doc_id""".stripMargin,

    // Mirrors Corpus.vocabulary; (tf DESC, token ASC) is a total order so
    // LIMIT 50 is stable; share is one int/int IEEE division.
    // Mirrors Corpus.heavyHitters: the two-phase Misra-Gries result must
    // equal the direct global count > N/k filter exactly — the oracle IS
    // that direct computation.
    "q_t13_heavy_hitters" ->
      """WITH n AS (SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |tk AS (SELECT unnest(regexp_extract_all(norm, '\S+')) AS tok FROM n),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_tf FROM tk),
        |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY 1)
        |SELECT tok, cnt,
        |       CAST(cnt AS DOUBLE) / CAST(total_tf AS DOUBLE) AS share
        |FROM c, tot
        |WHERE CAST(cnt AS DOUBLE) > CAST(total_tf AS DOUBLE) / 200.0
        |ORDER BY cnt DESC, tok ASC""".stripMargin,

    "q_t12_vocabulary" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |tk AS (SELECT doc_id, unnest(regexp_extract_all(norm, '\S+')) AS token FROM n),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_tf FROM tk),
        |c AS (
        |  SELECT token,
        |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
        |         CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tk GROUP BY 1)
        |SELECT token, df, tf,
        |       CAST(tf AS DOUBLE) / CAST(total_tf AS DOUBLE) AS share
        |FROM c, tot
        |ORDER BY tf DESC, token ASC LIMIT 50""".stripMargin,

    // Mirrors Corpus.contamination: same word-3-gram universe as q_t4's wg
    // CTE, same doc_id % 17 benchmark split, same distinct-gram overlap
    // ratio (exact int/int division — IEEE-identical).
    "q_t9_contamination" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |tk AS (SELECT doc_id, regexp_extract_all(norm, '\S+') AS toks FROM n),
        |wp AS (
        |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        |  FROM tk WHERE len(toks) >= 3),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS gram
        |  FROM wp),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0),
        |agg AS (
        |  SELECT c.doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_grams,
        |         CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        |  FROM g c LEFT JOIN bench b ON c.gram = b.gram
        |  WHERE c.doc_id % 17 <> 0
        |  GROUP BY 1)
        |SELECT doc_id, n_grams, n_hit,
        |       CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) AS contamination,
        |       CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) >= 0.5 AS flagged
        |FROM agg ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.boilerplateGrams over the same distinct (doc, gram)
    // universe; (df DESC, gram ASC) is a total order, so LIMIT 50 is stable.
    "q_t10_boilerplate" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |tk AS (SELECT doc_id, regexp_extract_all(norm, '\S+') AS toks FROM n),
        |wp AS (
        |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        |  FROM tk WHERE len(toks) >= 3),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS gram
        |  FROM wp)
        |SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |FROM g GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY df DESC, gram ASC LIMIT 50""".stripMargin,

    // Mirrors Corpus.piiScrub: same injected PII rows, same RE2-compatible
    // patterns ('g' flag for replace-all to match Spark's regexp_replace).
    "q_t7_pii_scrub" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (CAST(4000000 AS BIGINT), 'contact me at john.doe@example.com or call 555-123-4567 today'),
        |    (CAST(4000001 AS BIGINT), 'emails alice@foo.org bob@bar.net and phone 800 555 1212 plus 123-456-7890'),
        |    (CAST(4000002 AS BIGINT), 'no personal data here just plain text')
        |  ) v(doc_id, text))
        |SELECT doc_id,
        |       regexp_replace(
        |         regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |         '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS scrubbed,
        |       CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
        |       CAST(len(regexp_extract_all(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS INTEGER) AS n_phones
        |FROM base ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.textRepetition: 1 - distinct/total for tokens and
    // char-5-grams — int/int division then one subtraction, IEEE-identical.
    "q_t8_repetition" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |tk AS (SELECT doc_id, norm, regexp_extract_all(norm, '\S+') AS toks FROM n),
        |cp AS (
        |  SELECT doc_id, norm, unnest(generate_series(1, length(norm) - 4)) AS i
        |  FROM n WHERE length(norm) >= 5),
        |cg AS (
        |  SELECT doc_id, CAST(COUNT(DISTINCT substr(norm, CAST(i AS INTEGER), 5)) AS BIGINT) AS n5
        |  FROM cp GROUP BY 1),
        |r AS (
        |  SELECT tk.doc_id,
        |         CASE WHEN len(toks) > 0
        |              THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
        |              ELSE CAST(0.0 AS DOUBLE) END AS dup_token_ratio,
        |         CASE WHEN greatest(length(norm) - 4, 0) > 0
        |              THEN 1.0 - CAST(COALESCE(cg.n5, 0) AS DOUBLE)
        |                         / CAST(greatest(length(norm) - 4, 0) AS DOUBLE)
        |              ELSE CAST(0.0 AS DOUBLE) END AS dup_char5_ratio
        |  FROM tk LEFT JOIN cg ON cg.doc_id = tk.doc_id)
        |SELECT doc_id, dup_token_ratio, dup_char5_ratio,
        |       dup_token_ratio > CAST(0.3 AS DOUBLE) AS is_repetitive
        |FROM r ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.mixSample: same rates table as VALUES, same md5-prefix
    // threshold — the realized mix is a pure function of the keys.
    "q_p10_mix_sample" ->
      """WITH rates(source, threshold) AS (
        |  SELECT 'src' || CAST(i AS VARCHAR),
        |         CASE WHEN i <= 4 THEN 'cc' WHEN i <= 9 THEN '80' ELSE '1a' END
        |  FROM (SELECT unnest(generate_series(0, 19)) AS i))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled
        |FROM documents JOIN rates USING (source)
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < threshold
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_d3_dedup_fingerprint" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |       MIN(doc_id) AS keep_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "q_dd1_jaccard_top" -> jaccardTopSql(1000),
    "q_dd1b_jaccard_capped" -> jaccardTopSql(5),

    // Mirrors Corpus.editDistanceVerify: the q_dd1 candidate chain composed
    // with classic Levenshtein over the canonical texts (both engines
    // implement unit-cost edit distance; the ratio is one IEEE division).
    "q_dd7_edit_verify" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |tk AS (SELECT doc_id, norm, regexp_extract_all(norm, '\S+') AS toks FROM n),
        |wp AS (
        |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        |  FROM tk WHERE len(toks) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS shingle
        |  FROM wp),
        |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) > 1000),
        |pr AS (SELECT doc_id, shingle FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
        |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS cn FROM pr GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM pr a JOIN pr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT id1, id2,
        |         CAST(n_common AS DOUBLE) / CAST(ca.cn + cb.cn - n_common AS DOUBLE) AS jaccard
        |  FROM inter
        |  JOIN cnt ca ON ca.doc_id = id1
        |  JOIN cnt cb ON cb.doc_id = id2
        |  ORDER BY jaccard DESC, id1, id2 LIMIT 50)
        |SELECT id1, id2, jaccard,
        |       CAST(levenshtein(n1.norm, n2.norm) AS INTEGER) AS edit_dist,
        |       CAST(levenshtein(n1.norm, n2.norm) AS DOUBLE)
        |         / CAST(greatest(length(n1.norm), length(n2.norm)) AS DOUBLE) AS edit_ratio
        |FROM top
        |JOIN n n1 ON n1.doc_id = id1
        |JOIN n n2 ON n2.doc_id = id2
        |ORDER BY id1, id2""".stripMargin,

    // Mirrors Corpus.fuzzyDedupPipeline: BOTH tiers of the production
    // pairing — the universal-hash minwise banding (base h =
    // hex32(md5(shingle)) mod p, slot i = min of (a_i·h + b_i) mod p,
    // p = 2^31−1, band key = slot values joined in seed order, bucket
    // cap 100) generates the IDENTICAL candidate set, then the exact
    // verify tier (full-set Jaccard + Levenshtein) scores it.
    "q_dd11_fuzzy_pipeline" ->
      s"""WITH $fuzzyPairCtes
        |SELECT id1, id2, n_common, n_union,
        |       CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard,
        |       edit_dist, edit_ratio,
        |       (CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE) >= 0.5
        |        AND edit_ratio <= 0.2) AS is_dup
        |FROM scored ORDER BY id1, id2""".stripMargin,

    // Mirrors Corpus.lshRecallEval: ground truth from the DF-CAPPED
    // shingle index (shingles with df > 1000 dropped before the pair
    // expansion — the Dedup.jaccardPairs guard; at this fixture scale no
    // shingle reaches the cap, so capped truth == full-set truth),
    // integer cross-multiplied Jaccard >= 0.5 over the capped universe,
    // candidates from the shared banding CTEs, one metrics row with IEEE
    // divisions of exact integers.
    "q_dd13_lsh_recall" ->
      s"""WITH $fuzzyPairCtes,
        |hot_t AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) > 1000),
        |pr_t AS (
        |  SELECT doc_id, shingle FROM sh
        |  WHERE shingle NOT IN (SELECT shingle FROM hot_t)),
        |cnt_t AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh FROM pr_t GROUP BY 1),
        |ip_t AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS nc
        |  FROM pr_t a JOIN pr_t b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |truth AS (
        |  SELECT i.id1, i.id2
        |  FROM ip_t i
        |  JOIN cnt_t a ON a.doc_id = i.id1
        |  JOIN cnt_t b ON b.doc_id = i.id2
        |  WHERE i.nc * 3 >= a.nsh + b.nsh),
        |hits AS (
        |  SELECT t.id1, t.id2 FROM truth t
        |  JOIN cand c ON c.id1 = t.id1 AND c.id2 = t.id2),
        |m AS (
        |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_hits)
        |SELECT n_truth, n_candidates, n_hits,
        |       CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall,
        |       CAST(n_hits AS DOUBLE) / CAST(n_candidates AS DOUBLE) AS "precision"
        |FROM m""".stripMargin,

    // Mirrors Corpus.fuzzyDedupClusters: the q_dd11 verified pairs closed
    // into clusters — the engine's iterative min-label CC vs the oracle's
    // recursive-CTE transitive closure, one hash-gated keep list.
    "q_dd12_fuzzy_clusters" ->
      s"""WITH RECURSIVE $fuzzyPairCtes,
        |dpairs AS (
        |  SELECT id1, id2 FROM scored
        |  WHERE CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE) >= 0.5
        |    AND edit_ratio <= 0.2),
        |e AS (SELECT id1 AS s, id2 AS t FROM dpairs UNION SELECT id2, id1 FROM dpairs),
        |cnodes AS (SELECT DISTINCT s AS id FROM e),
        |reach AS (
        |  SELECT id, id AS r FROM cnodes
        |  UNION
        |  SELECT reach.id, e.t AS r FROM reach JOIN e ON e.s = reach.r),
        |lab AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id),
        |kl AS (
        |  SELECT d.doc_id,
        |         CAST(COALESCE(l.label, d.doc_id) AS BIGINT) AS keeper
        |  FROM docs d LEFT JOIN lab l ON l.id = d.doc_id),
        |sz AS (SELECT keeper, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM kl GROUP BY 1)
        |SELECT kl.doc_id, kl.keeper, (kl.doc_id = kl.keeper) AS keep, sz.cluster_size
        |FROM kl JOIN sz ON sz.keeper = kl.keeper
        |ORDER BY kl.doc_id""".stripMargin,

    // Mirrors Corpus.labelCentroids: float→double widening is exact in both
    // engines; the floor-scaled mean matches Exact.floorAvg(v, 9).
    "q_ann4_centroids" ->
      s"""WITH e AS (
         |  SELECT label, embedding, unnest(generate_series(1, len(embedding))) AS i
         |  FROM embeddings),
         |x AS (
         |  SELECT label, CAST(i - 1 AS INTEGER) AS pos,
         |         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS v
         |  FROM e)
         |SELECT label, pos,
         |       ${floorAvg9("v", "centroid_v")},
         |       CAST(COUNT(*) AS BIGINT) AS n
         |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_ann1_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |pos AS (
        |  SELECT e.vec_id, e.embedding, q.qv,
        |         unnest(generate_series(1, len(e.embedding))) AS i
        |  FROM embeddings e, q),
        |terms AS (
        |  SELECT vec_id,
        |         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x,
        |         CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) AS y
        |  FROM pos),
        |s AS (
        |  SELECT vec_id,
        |         CAST(SUM(CAST(floor(x * y * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15 AS dot,
        |         CAST(SUM(CAST(floor(x * x * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15 AS nx,
        |         CAST(SUM(CAST(floor(y * y * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15 AS nq
        |  FROM terms GROUP BY 1)
        |SELECT vec_id, dot / (sqrt(nx) * sqrt(nq)) AS cosine
        |FROM s ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin,

    // Recall oracles for the bucketed ANN paths (Corpus.withQueryClones): 25
    // exact clones of the query vector are planted under ids 1000000+; they
    // are guaranteed candidates (identical signature / cell) at cosine ≈ 1
    // while the best natural cosine is ≈ 0.6, so the (cosine DESC, id ASC)
    // top-20 is exactly vec 0 followed by the first 19 clone ids. Any recall
    // loss in the LSH/IVF path surfaces as missing rows.
    "q_ann2_lsh_topk" ->
      """SELECT CAST(0 AS BIGINT) AS vec_id
        |UNION ALL
        |SELECT CAST(1000000 + unnest(generate_series(0, 18)) AS BIGINT)
        |ORDER BY vec_id""".stripMargin,

    "q_ann3_ivf_topk" ->
      """SELECT CAST(0 AS BIGINT) AS vec_id
        |UNION ALL
        |SELECT CAST(1000000 + unnest(generate_series(0, 18)) AS BIGINT)
        |ORDER BY vec_id""".stripMargin,

    // Same recall contract through the INCREMENTAL index path (q_ann9):
    // every planted clone arrives in the delta batch and is appended to the
    // frozen-centroid layout — losing any of them from this literal set
    // means the incremental path broke recall.
    "q_ann9_ivf_incremental" ->
      """SELECT CAST(0 AS BIGINT) AS vec_id
        |UNION ALL
        |SELECT CAST(1000000 + unnest(generate_series(0, 18)) AS BIGINT)
        |ORDER BY vec_id""".stripMargin,

    // Mirrors Corpus.annIvfRecallCurve END TO END: the q_dd10b Lloyd replay
    // (16 lowest-id seeds, one floor-quantized centroid update with REAL
    // round-trip and COALESCE for empty cells, final quantized-cosine argmax
    // assignment), per-query centroid ranking, exact ground-truth top-10,
    // per-nprobe candidate sets and hits — every count exact-integer, the
    // two ratios single fixed-order IEEE divides. The IVF fit itself is on
    // trial here, not just the curve arithmetic.
    "q_ann10_recall_curve" ->
      s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
         |dims AS (
         |  SELECT vec_id, CAST(i AS INTEGER) AS i,
         |         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
         |  FROM (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM v)),
         |c0 AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j, embedding AS se
         |  FROM (SELECT vec_id, embedding FROM v ORDER BY vec_id LIMIT 16)),
         |c0d AS (
         |  SELECT j, CAST(i AS INTEGER) AS i, CAST(se[CAST(i AS INTEGER)] AS REAL) AS y
         |  FROM (SELECT j, se, unnest(generate_series(1, len(se))) AS i FROM c0)),
         |t1 AS (
         |  SELECT d.vec_id, c.j, d.x, CAST(c.y AS DOUBLE) AS y
         |  FROM dims d JOIN c0d c ON c.i = d.i),
         |s1 AS (SELECT vec_id, j, $quantCosAgg AS c FROM t1 GROUP BY 1, 2),
         |a1 AS (
         |  SELECT vec_id, j AS cluster FROM (
         |    SELECT vec_id, j,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, j) AS rn
         |    FROM s1) WHERE rn = 1),
         |m1 AS (
         |  SELECT a.cluster AS j, d.i,
         |         CAST(CAST(SUM(CAST(floor(d.x * 1.0E9) AS BIGINT)) AS DOUBLE)
         |              / 1.0E9 / CAST(COUNT(d.x) AS DOUBLE) AS REAL) AS y
         |  FROM a1 a JOIN dims d ON d.vec_id = a.vec_id
         |  GROUP BY 1, 2),
         |c1d AS (
         |  SELECT c0d.j, c0d.i, COALESCE(m1.y, c0d.y) AS y
         |  FROM c0d LEFT JOIN m1 ON m1.j = c0d.j AND m1.i = c0d.i),
         |t2 AS (
         |  SELECT d.vec_id, c.j, d.x, CAST(c.y AS DOUBLE) AS y
         |  FROM dims d JOIN c1d c ON c.i = d.i),
         |s2 AS (SELECT vec_id, j, $quantCosAgg AS c FROM t2 GROUP BY 1, 2),
         |a2 AS (
         |  SELECT vec_id, j AS cluster FROM (
         |    SELECT vec_id, j,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, j) AS rn
         |    FROM s2) WHERE rn = 1),
         |q AS (SELECT vec_id AS qid FROM v WHERE vec_id % 50 = 7 ORDER BY vec_id LIMIT 10),
         |qd AS (SELECT q.qid, d.i, d.x FROM q JOIN dims d ON d.vec_id = q.qid),
         |qct AS (
         |  SELECT qd.qid, c.j, qd.x, CAST(c.y AS DOUBLE) AS y
         |  FROM qd JOIN c1d c ON c.i = qd.i),
         |qs AS (SELECT qid, j, $quantCosAgg AS c FROM qct GROUP BY 1, 2),
         |crank AS (
         |  SELECT qid, j AS cluster,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, j) AS INTEGER) AS crank
         |  FROM qs),
         |vqt AS (
         |  SELECT qd.qid, d.vec_id, d.x, qd.x AS y
         |  FROM dims d JOIN qd ON qd.i = d.i),
         |vq AS (SELECT qid, vec_id, $quantCosAgg AS c FROM vqt GROUP BY 1, 2),
         |rt AS (
         |  SELECT qid, vec_id, c,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS r_true
         |  FROM vq),
         |jx AS (
         |  SELECT rt.qid, rt.vec_id, rt.c, rt.r_true, cr.crank
         |  FROM rt
         |  JOIN a2 ON a2.vec_id = rt.vec_id
         |  JOIN crank cr ON cr.qid = rt.qid AND cr.cluster = a2.cluster),
         |e AS (
         |  SELECT jx.*, p.np FROM jx
         |  JOIN (VALUES (1), (2), (4), (8), (16)) AS p(np) ON p.np >= jx.crank),
         |ri AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid, np ORDER BY c DESC, vec_id) AS r_ivf
         |  FROM e),
         |agg AS (
         |  SELECT np,
         |         CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |         CAST(SUM(CASE WHEN r_ivf <= 10 AND r_true <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |  FROM ri GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT COUNT(*) FROM q) AS nq, (SELECT COUNT(*) FROM v) AS nv)
         |SELECT CAST(np AS INTEGER) AS nprobe,
         |       CAST(nq * 10 AS BIGINT) AS n_truth,
         |       n_candidates, n_hits,
         |       CAST(n_hits AS DOUBLE) / CAST(nq * 10 AS DOUBLE) AS recall,
         |       CAST(n_candidates AS DOUBLE) / CAST(nq * nv AS DOUBLE) AS scan_frac
         |FROM agg CROSS JOIN tot ORDER BY nprobe""".stripMargin,

    // Mirrors Corpus.hybridRrf: the q_t6 BM25 leg and the q_ann1
    // exact-cosine leg, each rank-numbered inside its own top-50, fused by
    // reciprocal-rank — floor(1e6/(60+rank)) summed as BIGINT, so the
    // fusion is pure integer arithmetic on both engines.
    "q_r1_hybrid_rrf" ->
      """WITH corpus AS (
        |  SELECT d.doc_id, d.text, e.embedding
        |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |nm AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM corpus),
        |tk AS (SELECT doc_id, regexp_extract_all(norm, '\S+') AS toks FROM nm),
        |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM tk),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |         CAST(CAST(SUM(CAST(dl AS BIGINT)) AS BIGINT) AS DOUBLE)
        |           / CAST(COUNT(*) AS DOUBLE) AS avgdl
        |  FROM dl),
        |tf AS (
        |  SELECT doc_id, t AS term, CAST(COUNT(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
        |  WHERE t IN ('spark', 'merge', 'window', 'stream')
        |  GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |w AS (
        |  SELECT tf.doc_id,
        |         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |           * (tf.tf * (1.2 + 1.0))
        |           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS w
        |  FROM tf
        |  JOIN dfreq ON dfreq.term = tf.term
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN stats),
        |bm AS (
        |  SELECT doc_id,
        |         CAST(SUM(CAST(floor(w * 1.0E6) AS BIGINT)) AS DOUBLE) / 1.0E6 AS bm25
        |  FROM w GROUP BY 1
        |  ORDER BY bm25 DESC, doc_id LIMIT 50),
        |lex AS (
        |  SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r_lex
        |  FROM bm),
        |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pos AS (
        |  SELECT c.doc_id, c.embedding, qv.qe,
        |         unnest(generate_series(1, len(c.embedding))) AS i
        |  FROM corpus c, qv),
        |terms AS (
        |  SELECT doc_id,
        |         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x,
        |         CAST(qe[CAST(i AS INTEGER)] AS DOUBLE) AS y
        |  FROM pos),
        |sc AS (
        |  SELECT doc_id,
        |         CAST(SUM(CAST(floor(x * y * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15 AS dot,
        |         CAST(SUM(CAST(floor(x * x * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15 AS nx,
        |         CAST(SUM(CAST(floor(y * y * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15 AS nq
        |  FROM terms GROUP BY 1),
        |vtop AS (
        |  SELECT doc_id, dot / (sqrt(nx) * sqrt(nq)) AS cosine
        |  FROM sc ORDER BY cosine DESC, doc_id LIMIT 50),
        |vec AS (
        |  SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS INTEGER) AS r_vec
        |  FROM vtop),
        |fused AS (
        |  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex.r_lex, vec.r_vec,
        |         COALESCE(CAST(floor(1.0E6 / (60.0 + CAST(r_lex AS DOUBLE))) AS BIGINT), 0)
        |           + COALESCE(CAST(floor(1.0E6 / (60.0 + CAST(r_vec AS DOUBLE))) AS BIGINT), 0) AS rrf_micro
        |  FROM lex FULL OUTER JOIN vec ON vec.doc_id = lex.doc_id)
        |SELECT doc_id, r_lex, r_vec, rrf_micro
        |FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 20""".stripMargin,

    // Mirrors Corpus.hybridRrfIvf: the q_r1 BM25 leg unchanged, the vector
    // leg served through the REPLAYED IVF index — the q_ann10 Lloyd replay
    // refit on the corpus embeddings (16 lowest-doc-id seeds, one
    // floor-quantized update), the query's 4-cell probe set, candidates
    // restricted to probed cells, quantized-cosine top-50 — then the same
    // integer RRF fusion. The cell prune's approximation is pinned
    // bit-for-bit by the oracle, not assumed away.
    "q_r2_hybrid_ivf" ->
      s"""WITH corpus AS (
         |  SELECT d.doc_id, d.text, e.embedding
         |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
         |dims AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS i,
         |         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
         |  FROM (SELECT doc_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM corpus)),
         |c0 AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS INTEGER) AS j, embedding AS se
         |  FROM (SELECT doc_id, embedding FROM corpus ORDER BY doc_id LIMIT 16)),
         |c0d AS (
         |  SELECT j, CAST(i AS INTEGER) AS i, CAST(se[CAST(i AS INTEGER)] AS REAL) AS y
         |  FROM (SELECT j, se, unnest(generate_series(1, len(se))) AS i FROM c0)),
         |t1 AS (
         |  SELECT d.doc_id, c.j, d.x, CAST(c.y AS DOUBLE) AS y
         |  FROM dims d JOIN c0d c ON c.i = d.i),
         |s1 AS (SELECT doc_id, j, $quantCosAgg AS c FROM t1 GROUP BY 1, 2),
         |a1 AS (
         |  SELECT doc_id, j AS cluster FROM (
         |    SELECT doc_id, j,
         |           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, j) AS rn
         |    FROM s1) WHERE rn = 1),
         |m1 AS (
         |  SELECT a.cluster AS j, d.i,
         |         CAST(CAST(SUM(CAST(floor(d.x * 1.0E9) AS BIGINT)) AS DOUBLE)
         |              / 1.0E9 / CAST(COUNT(d.x) AS DOUBLE) AS REAL) AS y
         |  FROM a1 a JOIN dims d ON d.doc_id = a.doc_id
         |  GROUP BY 1, 2),
         |c1d AS (
         |  SELECT c0d.j, c0d.i, COALESCE(m1.y, c0d.y) AS y
         |  FROM c0d LEFT JOIN m1 ON m1.j = c0d.j AND m1.i = c0d.i),
         |t2 AS (
         |  SELECT d.doc_id, c.j, d.x, CAST(c.y AS DOUBLE) AS y
         |  FROM dims d JOIN c1d c ON c.i = d.i),
         |s2 AS (SELECT doc_id, j, $quantCosAgg AS c FROM t2 GROUP BY 1, 2),
         |a2 AS (
         |  SELECT doc_id, j AS cluster FROM (
         |    SELECT doc_id, j,
         |           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, j) AS rn
         |    FROM s2) WHERE rn = 1),
         |qd AS (
         |  SELECT CAST(i AS INTEGER) AS i,
         |         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
         |  FROM (SELECT embedding, unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings WHERE vec_id = 0)),
         |qct AS (
         |  SELECT c.j, qd.x, CAST(c.y AS DOUBLE) AS y
         |  FROM qd JOIN c1d c ON c.i = qd.i),
         |qs AS (SELECT j, $quantCosAgg AS c FROM qct GROUP BY 1),
         |probe AS (
         |  SELECT j AS cluster FROM (
         |    SELECT j, ROW_NUMBER() OVER (ORDER BY c DESC, j) AS crank FROM qs)
         |  WHERE crank <= 4),
         |vq AS (
         |  SELECT d.doc_id, $quantCosAgg AS c
         |  FROM (SELECT dims.doc_id, dims.x, qd.x AS y
         |        FROM dims JOIN qd ON qd.i = dims.i) d
         |  GROUP BY 1),
         |vtop AS (
         |  SELECT vq.doc_id, vq.c AS cosine
         |  FROM vq
         |  JOIN a2 ON a2.doc_id = vq.doc_id
         |  JOIN probe p ON p.cluster = a2.cluster
         |  ORDER BY vq.c DESC, vq.doc_id LIMIT 50),
         |vec AS (
         |  SELECT doc_id,
         |         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS INTEGER) AS r_vec
         |  FROM vtop),
         |nm AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM corpus),
         |tk AS (SELECT doc_id, regexp_extract_all(norm, '\\S+') AS toks FROM nm),
         |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM tk),
         |stats AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |         CAST(CAST(SUM(CAST(dl AS BIGINT)) AS BIGINT) AS DOUBLE)
         |           / CAST(COUNT(*) AS DOUBLE) AS avgdl
         |  FROM dl),
         |tf AS (
         |  SELECT doc_id, t AS term, CAST(COUNT(*) AS DOUBLE) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
         |  WHERE t IN ('spark', 'merge', 'window', 'stream')
         |  GROUP BY 1, 2),
         |dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |w AS (
         |  SELECT tf.doc_id,
         |         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         |           * (tf.tf * (1.2 + 1.0))
         |           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS w
         |  FROM tf
         |  JOIN dfreq ON dfreq.term = tf.term
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN stats),
         |bm AS (
         |  SELECT doc_id,
         |         CAST(SUM(CAST(floor(w * 1.0E6) AS BIGINT)) AS DOUBLE) / 1.0E6 AS bm25
         |  FROM w GROUP BY 1
         |  ORDER BY bm25 DESC, doc_id LIMIT 50),
         |lex AS (
         |  SELECT doc_id,
         |         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r_lex
         |  FROM bm),
         |fused AS (
         |  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex.r_lex, vec.r_vec,
         |         COALESCE(CAST(floor(1.0E6 / (60.0 + CAST(r_lex AS DOUBLE))) AS BIGINT), 0)
         |           + COALESCE(CAST(floor(1.0E6 / (60.0 + CAST(r_vec AS DOUBLE))) AS BIGINT), 0) AS rrf_micro
         |  FROM lex FULL OUTER JOIN vec ON vec.doc_id = lex.doc_id)
         |SELECT doc_id, r_lex, r_vec, rrf_micro
         |FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 20""".stripMargin,

    // Same recall contract through the STREAMING ingest path (q_e16):
    // every planted clone arrives in a micro-batch and is appended to the
    // frozen-centroid layout by foreachBatch — the maintained index must
    // serve them identically to a from-scratch build.
    "q_e16_stream_ivf" ->
      """SELECT CAST(0 AS BIGINT) AS vec_id
        |UNION ALL
        |SELECT CAST(1000000 + unnest(generate_series(0, 18)) AS BIGINT)
        |ORDER BY vec_id""".stripMargin,

    // Same recall contract for the composed IVF→PQ→rerank stack (q_ann8):
    // the planted clones must survive the cell prune AND the ADC shortlist
    // AND the exact rerank — a drop at any tier loses rows from this set.
    "q_ann8_ivfpq_topk" ->
      """SELECT CAST(0 AS BIGINT) AS vec_id
        |UNION ALL
        |SELECT CAST(1000000 + unnest(generate_series(0, 18)) AS BIGINT)
        |ORDER BY vec_id""".stripMargin,

    // Same recall contract for the PQ tier: the 19 planted clones + the
    // query vector itself are the only cosine-1.0 vectors, so the exact
    // top-20 is this literal set — the ADC scan must carry every one of
    // them into the rerank or rows go missing.
    "q_ann5_pq_topk" ->
      """SELECT CAST(0 AS BIGINT) AS vec_id
        |UNION ALL
        |SELECT CAST(1000000 + unnest(generate_series(0, 18)) AS BIGINT)
        |ORDER BY vec_id""".stripMargin,

    // Mirrors Corpus.annHardNegatives: exact brute-force pairs for the 100
    // anchors via the quantized cosine, positive = best same-label, hard
    // negative = best different-label, both with the (cos desc, id) order
    // that Spark's max(struct(c, -id)) aggregate implements.
    "q_ann6_hard_negatives" ->
      s"""WITH a AS (
         |  SELECT vec_id AS anchor_id, embedding AS avec, label AS albl
         |  FROM embeddings WHERE vec_id < 100),
         |pr AS (
         |  SELECT a.anchor_id, a.albl, e.vec_id, e.label, e.embedding AS evec, a.avec
         |  FROM embeddings e CROSS JOIN a WHERE e.vec_id <> a.anchor_id),
         |pos AS (
         |  SELECT anchor_id, albl, vec_id, label, evec AS ea, avec AS eb,
         |         unnest(generate_series(1, len(evec))) AS i
         |  FROM pr),
         |terms AS (
         |  SELECT anchor_id, albl, vec_id, label,
         |         CAST(ea[CAST(i AS INTEGER)] AS DOUBLE) AS x,
         |         CAST(eb[CAST(i AS INTEGER)] AS DOUBLE) AS y
         |  FROM pos),
         |cosv AS (
         |  SELECT anchor_id, albl, vec_id, label, $quantCosAgg AS c
         |  FROM terms GROUP BY 1, 2, 3, 4),
         |p AS (
         |  SELECT anchor_id, vec_id AS pos_id, c AS pos_cos FROM (
         |    SELECT anchor_id, vec_id, c,
         |           ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY c DESC, vec_id) AS rn
         |    FROM cosv WHERE label = albl) WHERE rn = 1),
         |n AS (
         |  SELECT anchor_id, vec_id AS neg_id, c AS neg_cos FROM (
         |    SELECT anchor_id, vec_id, c,
         |           ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY c DESC, vec_id) AS rn
         |    FROM cosv WHERE label <> albl) WHERE rn = 1)
         |SELECT p.anchor_id, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos
         |FROM p JOIN n ON n.anchor_id = p.anchor_id
         |ORDER BY p.anchor_id""".stripMargin,

    // Mirrors Corpus.annInt8TopK / HashUtil.int8Cosine: the identical
    // symmetric int8 quantization (floor(x·127/amax + 0.5)) replayed per
    // vector AND for the vec_id=0 query, exact integer dot/norm sums, and
    // the same fixed-order IEEE score — bit-exact ranking. Zero vectors
    // (amax = 0) score a -2.0 sentinel on the Spark side and are dropped
    // here; with 500+ real vectors they can never reach the top-20 either
    // way, so the compared surface is identical.
    "q_ann7_int8_topk" ->
      """WITH qa AS (
        |  SELECT embedding AS qe,
        |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
        |  FROM embeddings WHERE vec_id = 0),
        |qn AS (
        |  SELECT qv, CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS qnorm
        |  FROM (SELECT list_transform(qe, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / amax) + 0.5) AS BIGINT)) AS qv
        |        FROM qa)),
        |v AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
        |  FROM embeddings),
        |pos AS (
        |  SELECT vec_id, embedding, amax, unnest(generate_series(1, len(embedding))) AS i
        |  FROM v WHERE amax > 0),
        |terms AS (
        |  SELECT p.vec_id,
        |         CAST(floor(CAST(p.embedding[CAST(p.i AS INTEGER)] AS DOUBLE) * (127.0 / p.amax) + 0.5) AS BIGINT) AS xi,
        |         q.qv[CAST(p.i AS INTEGER)] AS yi,
        |         q.qnorm AS qnorm
        |  FROM pos p, qn q),
        |sc AS (
        |  SELECT vec_id,
        |         CAST(SUM(xi * yi) AS BIGINT) AS dot,
        |         CAST(SUM(xi * xi) AS BIGINT) AS vn,
        |         MAX(qnorm) AS qnorm
        |  FROM terms GROUP BY vec_id)
        |SELECT vec_id,
        |       CAST(dot AS DOUBLE) / (sqrt(CAST(vn AS DOUBLE)) * sqrt(CAST(qnorm AS DOUBLE))) AS q_cos
        |FROM sc
        |ORDER BY q_cos DESC, vec_id
        |LIMIT 20""".stripMargin,

    // Mirrors Corpus.passageDedup: same chunking arithmetic, the same
    // (doc_id, idx)-ordered first-occurrence rule (ROW_NUMBER ≡ Spark's
    // min-struct on the unique key), and ordered string_agg reassembly.
    "q_tp4_passage_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id < 20),
        |t AS (
        |  SELECT doc_id,
        |         regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+') AS toks
        |  FROM base),
        |c AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS idx,
        |         array_to_string(toks[CAST(i * 16 + 1 AS INTEGER) : CAST(i * 16 + 16 AS INTEGER)], ' ') AS chunk
        |  FROM t, unnest(generate_series(0, CAST(floor((len(toks) + 15) / 16.0) AS INTEGER) - 1)) AS g(i)
        |  WHERE len(toks) > 0),
        |k AS (
        |  SELECT doc_id, idx, chunk,
        |         ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
        |  FROM c)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_kept,
        |       string_agg(chunk, ' ' ORDER BY idx) AS clean_text
        |FROM k WHERE rn = 1
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.cdcPassageDedup: identical md5-shingle boundary rule,
    // lag-cumsum chunk ids, (doc_id, chunk_idx)-ordered first occurrence
    // (ROW_NUMBER ≡ Spark's min-struct on the unique key), ordered
    // reassembly. Variable-length chunking, yet fully exact.
    "q_tp6_cdc_passage_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, 'xshift yshift ' || text FROM documents WHERE doc_id < 20),
        |t AS (
        |  SELECT doc_id,
        |         regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+') AS toks
        |  FROM base),
        |tr AS (
        |  SELECT doc_id, toks, CAST(i AS INTEGER) AS p, toks[CAST(i AS INTEGER)] AS tok
        |  FROM t, unnest(generate_series(1, len(toks))) AS g(i)),
        |m AS (
        |  -- coalesce keeps the vectorized hash total even where the guard
        |  -- is false (p < 3): toks[0] is NULL and '0x' alone cannot cast
        |  SELECT doc_id, p, tok,
        |         CASE WHEN p >= 3 AND
        |              CAST(concat('0x', substr(md5(coalesce(toks[p - 2], '') || ' ' || coalesce(toks[p - 1], '') || ' ' || toks[p]), 1, 4)) AS BIGINT) % 16 = 0
        |              THEN 1 ELSE 0 END AS marker
        |  FROM tr),
        |c AS (
        |  SELECT doc_id, p, tok,
        |         CAST(COALESCE(SUM(marker) OVER (PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_idx
        |  FROM m),
        |ch AS (
        |  SELECT doc_id, chunk_idx, string_agg(tok, ' ' ORDER BY p) AS chunk
        |  FROM c GROUP BY 1, 2),
        |k AS (
        |  SELECT doc_id, chunk_idx, chunk,
        |         ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
        |  FROM ch)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_kept,
        |       string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
        |FROM k WHERE rn = 1
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.spanDedup: identical tokenization, the same md5 hash
    // over every length-8 sliding shingle, duplicated iff > 1 global
    // occurrences, and the same gaps-and-islands merge (break when
    // p > prev + 8) into maximal per-doc spans.
    "q_tp9_span_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4000000,
        |         array_to_string(
        |           regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+')[11:40], ' ')
        |  FROM documents
        |  WHERE doc_id < 60
        |    AND len(regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+')) >= 40),
        |t AS (
        |  SELECT doc_id,
        |         regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+') AS toks
        |  FROM base),
        |st AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS p,
        |         md5(array_to_string(toks[CAST(i AS INTEGER) : CAST(i + 7 AS INTEGER)], ' ')) AS h
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS g(i)
        |  WHERE len(toks) >= 8),
        |dup AS (SELECT h FROM st GROUP BY h HAVING COUNT(*) > 1),
        |ds AS (SELECT st.doc_id, st.p FROM st JOIN dup ON dup.h = st.h),
        |b AS (
        |  SELECT doc_id, p,
        |         CASE WHEN p > COALESCE(LAG(p) OVER (PARTITION BY doc_id ORDER BY p), -2147483648) + 8
        |              THEN 1 ELSE 0 END AS brk
        |  FROM ds),
        |sp AS (
        |  SELECT doc_id, p,
        |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        |  FROM b)
        |SELECT doc_id,
        |       CAST(MIN(p) AS INTEGER) AS span_start,
        |       CAST(MAX(p) + 7 AS INTEGER) AS span_end,
        |       CAST(MAX(p) + 7 - MIN(p) + 1 AS INTEGER) AS dup_tokens
        |FROM sp GROUP BY doc_id, span_id
        |ORDER BY doc_id, span_start""".stripMargin,

    // Mirrors Corpus.spanScrub: same clone injection and shingle hashing as
    // q_tp9; scrub = non-first occurrence of a duplicated hash (ROW_NUMBER
    // over (doc_id, p) ≡ Spark's min-struct); the difference-array coverage
    // cumsums and the keep rule replayed verbatim.
    "q_tp10_span_scrub" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4000000,
        |         array_to_string(
        |           regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+')[11:40], ' ')
        |  FROM documents
        |  WHERE doc_id < 60
        |    AND len(regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+')) >= 40),
        |t AS (
        |  SELECT doc_id,
        |         regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+') AS toks
        |  FROM base),
        |tr AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS t, toks[CAST(i AS INTEGER)] AS tok
        |  FROM t, unnest(generate_series(1, len(toks))) AS g(i)),
        |st AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS p,
        |         md5(array_to_string(toks[CAST(i AS INTEGER) : CAST(i + 7 AS INTEGER)], ' ')) AS h
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS g(i)
        |  WHERE len(toks) >= 8),
        |fl AS (
        |  SELECT doc_id, p,
        |         (COUNT(*) OVER (PARTITION BY h)) > 1
        |           AND ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, p) > 1 AS scrub
        |  FROM st),
        |dl AS (
        |  SELECT doc_id, p AS t,
        |         CASE WHEN scrub THEN 1 ELSE 0 END AS ds,
        |         CASE WHEN scrub THEN 0 ELSE 1 END AS dn
        |  FROM fl
        |  UNION ALL
        |  SELECT doc_id, p + 8,
        |         CASE WHEN scrub THEN -1 ELSE 0 END,
        |         CASE WHEN scrub THEN 0 ELSE -1 END
        |  FROM fl),
        |dg AS (SELECT doc_id, t, SUM(ds) AS ds, SUM(dn) AS dn FROM dl GROUP BY 1, 2),
        |cv AS (
        |  SELECT tr.doc_id, tr.t, tr.tok,
        |         SUM(COALESCE(dg.ds, 0)) OVER (PARTITION BY tr.doc_id ORDER BY tr.t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
        |         SUM(COALESCE(dg.dn, 0)) OVER (PARTITION BY tr.doc_id ORDER BY tr.t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        |  FROM tr LEFT JOIN dg ON dg.doc_id = tr.doc_id AND dg.t = tr.t)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN cs > 0 AND cn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |       COALESCE(string_agg(tok, ' ' ORDER BY t) FILTER (WHERE NOT (cs > 0 AND cn = 0)), '') AS clean_text
        |FROM cv GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.decontamScrub (q_tp13): benchmark = doc_id % 17 == 0;
    // planted rows carry an interior benchmark slice; a token drops iff
    // ANY covering 8-window matches a benchmark window.
    "q_tp13_decontam_scrub" ->
      """WITH t0 AS (
        |  SELECT doc_id, text,
        |         regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+') AS toks
        |  FROM documents),
        |bh AS (
        |  SELECT DISTINCT md5(array_to_string(toks[CAST(i AS INTEGER) : CAST(i + 7 AS INTEGER)], ' ')) AS h
        |  FROM t0, unnest(generate_series(1, len(toks) - 7)) AS g(i)
        |  WHERE doc_id % 17 = 0 AND len(toks) >= 8),
        |base AS (
        |  SELECT doc_id, text FROM t0 WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 4500000,
        |         'fresh opening words ' || array_to_string(toks[5:24], ' ') || ' fresh closing words'
        |  FROM t0 WHERE doc_id % 17 = 0 AND doc_id < 120 AND len(toks) >= 40),
        |t AS (
        |  SELECT doc_id,
        |         regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+') AS toks
        |  FROM base),
        |tr AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS t, toks[CAST(i AS INTEGER)] AS tok
        |  FROM t, unnest(generate_series(1, len(toks))) AS g(i)),
        |st AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS p,
        |         md5(array_to_string(toks[CAST(i AS INTEGER) : CAST(i + 7 AS INTEGER)], ' ')) AS h
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS g(i)
        |  WHERE len(toks) >= 8),
        |hits AS (SELECT doc_id, p FROM st WHERE h IN (SELECT h FROM bh)),
        |dl AS (
        |  SELECT doc_id, p AS t, 1 AS ds FROM hits
        |  UNION ALL
        |  SELECT doc_id, p + 8, -1 FROM hits),
        |dg AS (SELECT doc_id, t, SUM(ds) AS ds FROM dl GROUP BY 1, 2),
        |cv AS (
        |  SELECT tr.doc_id, tr.t, tr.tok,
        |         SUM(COALESCE(dg.ds, 0)) OVER (PARTITION BY tr.doc_id ORDER BY tr.t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        |  FROM tr LEFT JOIN dg ON dg.doc_id = tr.doc_id AND dg.t = tr.t)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN cs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |       COALESCE(string_agg(tok, ' ' ORDER BY t) FILTER (WHERE cs <= 0), '') AS clean_text
        |FROM cv GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.lineDedup (q_tp14): same fixtures (chr(10) lines),
    // same md5-of-normalized-line key, same count>=3 discard rule.
    "q_tp14_line_dedup" ->
      """WITH lbase AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT CAST(v.doc_id AS BIGINT), v.text FROM (VALUES
        |    (4600000, 'Breaking news about mountain weather' || chr(10) || 'Subscribe to our newsletter' || chr(10) || 'All rights reserved'),
        |    (4600001, 'Local sports results from yesterday' || chr(10) || 'Subscribe to our newsletter' || chr(10) || 'All rights reserved'),
        |    (4600002, 'Recipes for the summer season' || chr(10) || 'Subscribe to our newsletter' || chr(10) || 'All rights reserved'),
        |    (4600003, 'A unique essay with no boilerplate at all')
        |  ) AS v(doc_id, text)),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM lbase),
        |l AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS ln, lines[CAST(i AS INTEGER)] AS line
        |  FROM ls, unnest(generate_series(1, len(lines))) AS g(i)),
        |k AS (
        |  SELECT *, md5(regexp_replace(lower(trim(line)), '\s+', ' ', 'g')) AS lkey FROM l),
        |c AS (SELECT *, COUNT(*) OVER (PARTITION BY lkey) AS n FROM k)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CASE WHEN n >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |       COALESCE(string_agg(line, chr(10) ORDER BY ln) FILTER (WHERE n < 3), '') AS clean_text
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.cleanCorpusScrubbed (q_tp11): the q_tp10 scrub chain
    // (no clone injection — the natural corpus) feeding the shared tp1
    // clean chain over the scrubbed text. CTEs are sc_-prefixed to avoid
    // colliding with the quality/dedup chain's names.
    "q_tp11_clean_scrubbed" -> cleanChainSql(
      """SELECT ex.doc_id, q2.quality
        |FROM ex
        |JOIN q q2 ON q2.doc_id = ex.doc_id
        |WHERE ex.doc_id NOT IN (SELECT doc_id FROM removed)
        |ORDER BY ex.doc_id""".stripMargin,
      src = "scrubbed",
      pre = """sc_t AS (
        |  SELECT doc_id,
        |         regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\S+') AS toks
        |  FROM documents),
        |sc_tr AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS t, toks[CAST(i AS INTEGER)] AS tok
        |  FROM sc_t, unnest(generate_series(1, len(toks))) AS g(i)),
        |sc_st AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS p,
        |         md5(array_to_string(toks[CAST(i AS INTEGER) : CAST(i + 7 AS INTEGER)], ' ')) AS h
        |  FROM sc_t, unnest(generate_series(1, len(toks) - 7)) AS g(i)
        |  WHERE len(toks) >= 8),
        |sc_fl AS (
        |  SELECT doc_id, p,
        |         (COUNT(*) OVER (PARTITION BY h)) > 1
        |           AND ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, p) > 1 AS scrub
        |  FROM sc_st),
        |sc_dl AS (
        |  SELECT doc_id, p AS t,
        |         CASE WHEN scrub THEN 1 ELSE 0 END AS ds,
        |         CASE WHEN scrub THEN 0 ELSE 1 END AS dn
        |  FROM sc_fl
        |  UNION ALL
        |  SELECT doc_id, p + 8,
        |         CASE WHEN scrub THEN -1 ELSE 0 END,
        |         CASE WHEN scrub THEN 0 ELSE -1 END
        |  FROM sc_fl),
        |sc_dg AS (SELECT doc_id, t, SUM(ds) AS ds, SUM(dn) AS dn FROM sc_dl GROUP BY 1, 2),
        |sc_cv AS (
        |  SELECT tr.doc_id, tr.t, tr.tok,
        |         SUM(COALESCE(dg.ds, 0)) OVER (PARTITION BY tr.doc_id ORDER BY tr.t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
        |         SUM(COALESCE(dg.dn, 0)) OVER (PARTITION BY tr.doc_id ORDER BY tr.t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        |  FROM sc_tr tr LEFT JOIN sc_dg dg ON dg.doc_id = tr.doc_id AND dg.t = tr.t),
        |scrubbed AS (
        |  SELECT doc_id,
        |         COALESCE(string_agg(tok, ' ' ORDER BY t) FILTER (WHERE NOT (cs > 0 AND cn = 0)), '') AS text
        |  FROM sc_cv GROUP BY doc_id)""".stripMargin),

    "q_tp1_clean_corpus" -> cleanChainSql(
      """SELECT ex.doc_id, q2.quality
        |FROM ex
        |JOIN q q2 ON q2.doc_id = ex.doc_id
        |WHERE ex.doc_id NOT IN (SELECT doc_id FROM removed)
        |ORDER BY ex.doc_id""".stripMargin),

    // Mirrors Corpus.trainingDataset: the tp1 clean chain, then the BPE
    // rounds TRAINED ON THE SURVIVORS (bpeRoundCtes over `cleaned`), the
    // t19 encode join, and the t15 per-source cumsum pack — one replay
    // gating the composed pipeline end to end.
    "q_tp5_training_dataset" -> cleanChainSql(
      s"""cleaned AS MATERIALIZED (
         |  SELECT ex.doc_id, ex.text FROM ex
         |  WHERE ex.doc_id NOT IN (SELECT doc_id FROM removed)),
         |${bpeRoundCtes(8, "cleaned")},
         |nb AS MATERIALIZED (
         |  SELECT word,
         |         CAST(len(regexp_extract_all(s, chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1)) AS BIGINT) AS n_bpe
         |  FROM w8),
         |tok2 AS (
         |  SELECT doc_id, unnest(regexp_extract_all(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\S+')) AS word
         |  FROM cleaned),
         |pc AS (
         |  SELECT tok2.doc_id,
         |         CAST(COUNT(*) AS BIGINT) AS n_ws_tokens,
         |         CAST(SUM(nb.n_bpe) AS BIGINT) AS n_bpe_tokens
         |  FROM tok2 JOIN nb ON nb.word = tok2.word
         |  GROUP BY 1),
         |pk AS (
         |  SELECT pc.doc_id, d.source, pc.n_ws_tokens, pc.n_bpe_tokens,
         |         CAST(SUM(pc.n_bpe_tokens) OVER (PARTITION BY d.source ORDER BY pc.doc_id) AS BIGINT) AS end_off
         |  FROM pc JOIN documents d ON d.doc_id = pc.doc_id)
         |SELECT doc_id, source, n_ws_tokens, n_bpe_tokens,
         |       end_off - n_bpe_tokens AS start_off,
         |       CAST(FLOOR(CAST(end_off - n_bpe_tokens AS DOUBLE) / 2048) AS BIGINT) AS first_seq,
         |       CAST(FLOOR(CAST(end_off - 1 AS DOUBLE) / 2048) AS BIGINT) AS last_seq
         |FROM pk ORDER BY source, doc_id""".stripMargin, trailingCtes = true),

    // Mirrors Corpus.cleanCorpusDecontaminated: the tp1 CTE chain over the
    // doc_id % 17 <> 0 corpus slice, then the q_t9 gram probe against the
    // RAW benchmark slice; shingles for contamination are the UNPRUNED
    // distinct word-3-grams (sh), matching the Scala recompute from survivor
    // text. Docs too short to shingle coalesce to contamination 0.
    "q_tp3_clean_decontaminated" ->
      s"""WITH docs0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0),
         |t AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS toks FROM docs0),
         |c AS (
         |  SELECT doc_id, text,
         |         CAST(len(toks) AS DOUBLE) AS n_tok,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS stop_ratio,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS mean_tok_len
         |  FROM t),
         |q AS (
         |  SELECT doc_id, text,
         |         least(CAST(1.0 AS DOUBLE), n_tok / 100.0) * 0.5
         |           + stop_ratio * 0.3
         |           + least(CAST(1.0 AS DOUBLE), mean_tok_len / 8.0) * 0.2 AS quality
         |  FROM c),
         |qf AS (SELECT * FROM q WHERE quality >= CAST(0.35 AS DOUBLE)),
         |keep AS (
         |  SELECT MIN(doc_id) AS doc_id FROM qf
         |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
         |ex AS (SELECT qf.* FROM qf JOIN keep USING (doc_id)),
         |n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM ex),
         |tk AS (SELECT doc_id, regexp_extract_all(norm, '\\S+') AS toks FROM n),
         |wp AS (
         |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
         |  FROM tk WHERE len(toks) >= 3),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS shingle
         |  FROM wp),
         |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) > 1000),
         |pru AS (SELECT doc_id, shingle FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh FROM pru GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM pru a JOIN pru b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pr AS (
         |  SELECT id1, id2,
         |         CAST(n_common AS DOUBLE) / CAST(ca.nsh + cb.nsh - n_common AS DOUBLE) AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = id1 JOIN cnt cb ON cb.doc_id = id2),
         |removed AS (SELECT DISTINCT id2 AS doc_id FROM pr WHERE jaccard >= CAST(0.1 AS DOUBLE)),
         |surv AS (
         |  SELECT ex.doc_id, q2.quality
         |  FROM ex JOIN q q2 ON q2.doc_id = ex.doc_id
         |  WHERE ex.doc_id NOT IN (SELECT doc_id FROM removed)),
         |bn AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
         |       FROM documents WHERE doc_id % 17 = 0),
         |btk AS (SELECT doc_id, regexp_extract_all(norm, '\\S+') AS toks FROM bn),
         |bwp AS (
         |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
         |  FROM btk WHERE len(toks) >= 3),
         |bg AS (
         |  SELECT DISTINCT array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS gram
         |  FROM bwp),
         |sg AS (SELECT sh.doc_id, sh.shingle AS gram FROM sh JOIN surv ON surv.doc_id = sh.doc_id),
         |ca2 AS (
         |  SELECT sg.doc_id,
         |         CAST(COUNT(*) AS BIGINT) AS n_grams,
         |         CAST(SUM(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM sg LEFT JOIN bg ON sg.gram = bg.gram
         |  GROUP BY 1)
         |SELECT surv.doc_id, surv.quality,
         |       COALESCE(CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE), CAST(0.0 AS DOUBLE)) AS contamination
         |FROM surv LEFT JOIN ca2 ON ca2.doc_id = surv.doc_id
         |WHERE COALESCE(CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE), CAST(0.0 AS DOUBLE)) < CAST(0.5 AS DOUBLE)
         |ORDER BY surv.doc_id""".stripMargin,

    // Mirrors Corpus.cleanCorpusClustered: the tp1 CTE chain (quality gate →
    // exact dedup → pruned-universe Jaccard pairs) composed with the dd6
    // recursive closure — survivors are exact-dedup keepers that are either
    // unclustered or their cluster's minimum id.
    "q_tp2_clean_clustered" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS toks FROM documents),
         |c AS (
         |  SELECT doc_id, text,
         |         CAST(len(toks) AS DOUBLE) AS n_tok,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS stop_ratio,
         |         CASE WHEN len(toks) > 0
         |              THEN CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
         |                   / CAST(len(toks) AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END AS mean_tok_len
         |  FROM t),
         |q AS (
         |  SELECT doc_id, text,
         |         least(CAST(1.0 AS DOUBLE), n_tok / 100.0) * 0.5
         |           + stop_ratio * 0.3
         |           + least(CAST(1.0 AS DOUBLE), mean_tok_len / 8.0) * 0.2 AS quality
         |  FROM c),
         |qf AS (SELECT * FROM q WHERE quality >= CAST(0.35 AS DOUBLE)),
         |keep AS (
         |  SELECT MIN(doc_id) AS doc_id FROM qf
         |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
         |ex AS (SELECT qf.* FROM qf JOIN keep USING (doc_id)),
         |n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM ex),
         |tk AS (SELECT doc_id, regexp_extract_all(norm, '\\S+') AS toks FROM n),
         |wp AS (
         |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
         |  FROM tk WHERE len(toks) >= 3),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS shingle
         |  FROM wp),
         |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) > 1000),
         |pru AS (SELECT doc_id, shingle FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh FROM pru GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM pru a JOIN pru b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id1, id2
         |  FROM inter JOIN cnt ca ON ca.doc_id = id1 JOIN cnt cb ON cb.doc_id = id2
         |  WHERE CAST(n_common AS DOUBLE) / CAST(ca.nsh + cb.nsh - n_common AS DOUBLE)
         |        >= CAST(0.1 AS DOUBLE)),
         |e AS (SELECT id1 AS s, id2 AS t2 FROM pairs UNION SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT s AS id FROM e),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT reach.id, e.t2 AS r FROM reach JOIN e ON e.s = reach.r),
         |lab AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id),
         |dropped AS (SELECT id AS doc_id FROM lab WHERE label <> id)
         |SELECT ex.doc_id, q2.quality
         |FROM ex
         |JOIN q q2 ON q2.doc_id = ex.doc_id
         |WHERE ex.doc_id NOT IN (SELECT doc_id FROM dropped)
         |ORDER BY ex.doc_id""".stripMargin,

    // Mirrors Corpus.embedNearDup's injected ground truth: the corpus has no
    // natural pair near cosine 0.9 (max ≈ 0.51/0.60), identical clones hash
    // to identical LSH signatures and cosine ≈ 1, so the result is exactly
    // the clone pairs — an actual recall oracle for the LSH operator.
    "q_dd4_embed_neardup" ->
      """SELECT vec_id AS id1, vec_id + 1000000 AS id2
        |FROM embeddings WHERE vec_id < 50 ORDER BY id1, id2""".stripMargin,

    // Deterministic stratified sample: md5-prefix threshold per language
    // stratum — a pure function of the key, identical across engines.
    "q_p9_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |      CASE WHEN lang = 'en' THEN '80' ELSE '20' END
        |ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.weightedSample: identical hex32 uniform and the same
    // nano-quantized race key (ln may differ by 1 ulp across libms; the
    // ×1e9 floor absorbs it — see the Corpus scaladoc).
    "q_p11_weighted_sample" ->
      """SELECT doc_id, lang, n_chars,
        |       CAST(floor(ln(CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
        |          / 4294967296.0) / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS wkey_nanos
        |FROM documents
        |ORDER BY wkey_nanos DESC, doc_id LIMIT 50""".stripMargin,

    "q_w8_group_topk" ->
      """SELECT source, doc_id, n_chars, rk FROM (
        |  SELECT source, doc_id, n_chars,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY source
        |                                 ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rk
        |  FROM documents)
        |WHERE rk <= 3 ORDER BY source, rk""".stripMargin,

    "q_o5_det_shuffle" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin,

    // Mirrors Corpus.saltedCountryKpi with the plain one-phase GROUP BY:
    // algebraic aggregates are salt-invariant (the revenue sum stays exact
    // DECIMAL through both phases), so the two-phase salted plan must equal
    // this query bit-for-bit.
    "q_o6_salted_agg" -> withDaily(
      """SELECT Country,
        |       CAST(SUM(NetDailyQuantity) AS BIGINT) AS total_qty,
        |       CAST(SUM(CAST(NetDailyRevenue AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_days,
        |       MAX(NetDailyQuantity) AS max_qty
        |FROM daily GROUP BY Country ORDER BY Country""".stripMargin),

    // Mirrors Corpus.dupClusterLabels: same cloned corpus, same
    // pruned-universe Jaccard pair graph at threshold 0.8, then connected
    // components as a recursive-CTE transitive closure — MIN(reachable id)
    // per node is exactly the fixpoint of min-label propagation.
    "q_dd6_dup_clusters" -> dupClustersSql,

    // q_dd8 resolves the SAME pair graph with the large-star/small-star
    // contraction instead of min-label propagation — two independent
    // algorithms, one oracle: any divergence between them is a bug in one.
    "q_dd8_star_clusters" -> dupClustersSql,


    // Mirrors Corpus.bucketedOrdersJoin: the bucketed layout changes only
    // the physical plan (Exchange-free zip of bucket files, plan-asserted in
    // OperatorsSpec), never the result — the oracle is the plain inner join.
    // A join hint can only change the physical strategy, never the result:
    // the oracle is the plain join + aggregate.
    "q_j9_shuffle_hash" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS Year,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Corpus.bloomPrunedJoin: the bloom pre-filter changes only
    // which fact rows reach the shuffle — false positives die at the exact
    // join — so the oracle is the PLAIN dim-filtered join + aggregate.
    "q_j13_bloom_join" ->
      """SELECT CAST(month(o_orderdate) AS INTEGER) AS Month,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1997
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Corpus.starJoin: the same five-table star with the same
    // decimal-exact revenue accumulator.
    "q_j11_star_join" ->
      """SELECT r_name,
        |       CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |       COUNT(DISTINCT o_custkey) AS n_customers,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE year(o_orderdate) BETWEEN 1996 AND 1997
        |GROUP BY r_name, o_year
        |ORDER BY r_name, o_year""".stripMargin,

    // Mirrors Corpus.scd2Lookup: the q_u5 dimension rebuilt inline, then
    // the same covering-interval fact lookup and exact price sums.
    "q_j12_scd2_lookup" ->
      """WITH d AS (
        |  SELECT o_custkey, o_orderdate, o_orderstatus,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |                            ORDER BY o_orderkey DESC) AS rn,
        |         o_orderpriority
        |  FROM orders),
        |l AS (
        |  SELECT o_custkey, o_orderdate, o_orderstatus, o_orderpriority,
        |         LAG(o_orderstatus) OVER w AS ps,
        |         LAG(o_orderpriority) OVER w AS pp
        |  FROM d WHERE rn = 1
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)),
        |c AS (
        |  SELECT * FROM l
        |  WHERE o_orderstatus IS DISTINCT FROM ps
        |     OR o_orderpriority IS DISTINCT FROM pp),
        |dim AS (
        |  SELECT o_custkey AS d_custkey, o_orderstatus,
        |         o_orderdate AS effective_from,
        |         LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS effective_to
        |  FROM c),
        |f AS (
        |  SELECT o_custkey, l_shipdate, l_extendedprice
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderstatus,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price
        |FROM f JOIN dim
        |  ON o_custkey = d_custkey
        | AND l_shipdate >= effective_from
        | AND (effective_to IS NULL OR l_shipdate < effective_to)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // Mirrors Corpus.scd2Orders: same per-day dedup (max orderkey), the
    // same IS DISTINCT FROM change-compression (≡ Spark's !(a <=> lag a)),
    // and the same LEAD validity stitch over surviving versions.
    "q_u5_scd2" ->
      """WITH d AS (
        |  SELECT o_custkey, o_orderdate, o_orderstatus, o_orderpriority,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |                            ORDER BY o_orderkey DESC) AS rn
        |  FROM orders),
        |l AS (
        |  SELECT o_custkey, o_orderdate, o_orderstatus, o_orderpriority,
        |         LAG(o_orderstatus) OVER w AS ps,
        |         LAG(o_orderpriority) OVER w AS pp
        |  FROM d WHERE rn = 1
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)),
        |c AS (
        |  SELECT * FROM l
        |  WHERE o_orderstatus IS DISTINCT FROM ps
        |     OR o_orderpriority IS DISTINCT FROM pp)
        |SELECT o_custkey, o_orderstatus, o_orderpriority,
        |       CAST(o_orderdate AS TIMESTAMP) AS effective_from,
        |       CAST(LEAD(o_orderdate) OVER w2 AS TIMESTAMP) AS effective_to,
        |       (LEAD(o_orderdate) OVER w2 IS NULL) AS is_current
        |FROM c
        |WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate)
        |ORDER BY o_custkey, effective_from""".stripMargin,

    // Mirrors Corpus.snapshotDiffCustomers: the q_u4 merge replayed, then
    // a full-outer diff keeping only changed keys, null-safe on payloads.
    "q_u6_snapshot_diff" ->
      """WITH base AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name, c_acctbal FROM customer),
        |upd AS (
        |  SELECT k, c_name, c_acctbal + 1000.0 AS c_acctbal, (k % 20 = 0) AS del
        |  FROM base WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT k + 900000, c_name, c_acctbal, false FROM base WHERE k % 7 = 3),
        |newsnap AS (
        |  SELECT k, c_name, c_acctbal FROM base WHERE k NOT IN (SELECT k FROM upd)
        |  UNION ALL
        |  SELECT k, c_name, c_acctbal FROM upd WHERE NOT del)
        |SELECT COALESCE(b.k, n.k) AS c_custkey,
        |       CASE WHEN b.k IS NULL THEN 'insert'
        |            WHEN n.k IS NULL THEN 'delete'
        |            ELSE 'update' END AS change_type,
        |       b.c_name AS old_c_name, n.c_name AS new_c_name,
        |       b.c_acctbal AS old_c_acctbal, n.c_acctbal AS new_c_acctbal
        |FROM base b FULL OUTER JOIN newsnap n ON b.k = n.k
        |WHERE b.k IS NULL OR n.k IS NULL
        |   OR b.c_name IS DISTINCT FROM n.c_name
        |   OR b.c_acctbal IS DISTINCT FROM n.c_acctbal
        |ORDER BY c_custkey""".stripMargin,

    // Mirrors Corpus.incrementalRollup from scratch: the oracle aggregates
    // the MERGED table directly — if the incremental signed-delta path
    // double-counts, drops, or mis-signs anything, the decimal sums differ.
    "q_a22_incremental_rollup" ->
      """WITH base AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k, c_nationkey, c_acctbal FROM customer),
        |upd AS (
        |  SELECT k, c_nationkey, c_acctbal + 1000.0 AS c_acctbal, (k % 20 = 0) AS del
        |  FROM base WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT k + 900000, c_nationkey, c_acctbal, false FROM base WHERE k % 7 = 3),
        |merged AS (
        |  SELECT k, c_nationkey, c_acctbal FROM base WHERE k NOT IN (SELECT k FROM upd)
        |  UNION ALL
        |  SELECT k, c_nationkey, c_acctbal FROM upd WHERE NOT del)
        |SELECT c_nationkey,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal,
        |       COUNT(*) AS n_customers
        |FROM merged GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // Mirrors Corpus.mergeUpsertCustomers — the same deterministic CDC
    // changeset merged with the same full-outer semantics.
    "q_u4_merge_upsert" ->
      """WITH base AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name, c_acctbal FROM customer),
        |upd AS (
        |  SELECT k, c_name, c_acctbal + 1000.0 AS c_acctbal, (k % 20 = 0) AS del
        |  FROM base WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT k + 900000, c_name, c_acctbal, false FROM base WHERE k % 7 = 3),
        |merged AS (
        |  SELECT COALESCE(u.k, b.k) AS k,
        |         CASE WHEN u.k IS NOT NULL THEN u.c_name ELSE b.c_name END AS c_name,
        |         CASE WHEN u.k IS NOT NULL THEN u.c_acctbal ELSE b.c_acctbal END AS c_acctbal,
        |         u.del
        |  FROM base b FULL OUTER JOIN upd u ON b.k = u.k)
        |SELECT k AS c_custkey, c_name, c_acctbal
        |FROM merged WHERE COALESCE(del, false) = false
        |ORDER BY c_custkey""".stripMargin,

    "q_j8_bucketed_join" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // Mirrors Corpus.incrementalDedupBatch at threshold 1.0: signature
    // matching degenerates to shingle-set equality, so ground truth is
    // computable from sorted shingle lists — tier 1 pairs each batch doc
    // with the min-id store doc of equal set; tier 2 groups the remaining
    // batch docs by set and keeps the class minimum. Docs with fewer than
    // 3 tokens have no shingle set and are always kept. q_e11 runs the SAME
    // classification through ordered Structured-Streaming micro-batches
    // (first-seen-wins == min-id-wins under the staged arrival order), so
    // it shares this oracle verbatim.
    "q_dd9_incremental_dedup" -> incrementalDedupSql,
    "q_e11_stream_dedup_store" -> incrementalDedupSql,

    // Mirrors Corpus.minhashRecall at threshold 1.0: identical shingle sets
    // ⇒ identical signatures ⇒ guaranteed band-bucket candidates, and the
    // operator's exact-Jaccard scoring keeps only jaccard = 1 — so the
    // expected output is precisely the identical-set pairs, computable
    // without porting any hash function.
    "q_dd2b_minhash_recall" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
        |n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM base),
        |tk AS (SELECT doc_id, regexp_extract_all(norm, '\S+') AS toks FROM n),
        |wp AS (
        |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        |  FROM tk WHERE len(toks) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS shingle
        |  FROM wp),
        |sets AS (
        |  SELECT doc_id, CAST(list_sort(list(shingle)) AS VARCHAR) AS sig
        |  FROM sh GROUP BY doc_id)
        |SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(1.0 AS DOUBLE) AS jaccard
        |FROM sets a JOIN sets b ON a.sig = b.sig AND a.doc_id < b.doc_id
        |ORDER BY id1, id2""".stripMargin,

    // Mirrors Corpus.simhashRecall: ids ≥ 1000000 exist only as planted
    // clones of docs < 50; identical text gives an identical sketch
    // (hamming 0) and the pigeonhole banding guarantees candidacy, so the
    // planted pairs are exactly the expected rows — recall is the claim.
    "q_dd3b_simhash_recall" ->
      """SELECT doc_id AS id1, doc_id + 1000000 AS id2, CAST(0 AS INTEGER) AS hamming
        |FROM documents WHERE doc_id < 50 ORDER BY id1""".stripMargin,

    // Mirrors Corpus.simhashTelemetry: the ENTIRE capped-simhash pipeline
    // replayed from raw text — FNV-1a 64 per token (exact unsigned wrap:
    // the multiply runs in HUGEINT mod 2^64; ASCII corpus, so ord() =
    // byte), per-bit votes, sketch assembly (HUGEINT shifts — DuckDB's
    // UBIGINT << overflows at bit 63), the 8x8-bit banding over DISTINCT
    // sketches, the mass probe's Σc² vs 8·rows, the hot buckets'
    // remaining-56-bit 8x7-bit sub-band split, over-cap sub-bucket
    // shedding, both join tiers (hamming INSIDE the join), and the
    // doc-level cross/within expansion. Engine block/sub values use
    // shiftrightunsigned on the signed sketch = UBIGINT >> here on the
    // same bit pattern, so every intermediate is integer-identical.
    "q_dd3c_simhash_telemetry" ->
      """WITH nrm AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(regexp_extract_all(norm, '\S+')) AS tok FROM nrm),
        |th AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS UBIGINT),
        |      list_transform(generate_series(1, strlen(tok)),
        |        i -> CAST(ord(substr(tok, i, 1)) AS UBIGINT))),
        |    (h, b) -> CAST(CAST(xor(h, b) AS HUGEINT) * 1099511628211
        |                   % 18446744073709551616 AS UBIGINT)) AS h
        |  FROM tok),
        |bits AS (
        |  SELECT doc_id, bb.b,
        |         SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
        |  GROUP BY 1, 2),
        |skraw AS (
        |  SELECT doc_id,
        |         CAST(COALESCE(SUM(CASE WHEN vote > 0 THEN CAST(1 AS HUGEINT) << b END), 0)
        |              AS UBIGINT) AS sh
        |  FROM bits GROUP BY 1),
        |sk AS (
        |  SELECT d.doc_id, COALESCE(s.sh, CAST(0 AS UBIGINT)) AS sh
        |  FROM documents d LEFT JOIN skraw s ON d.doc_id = s.doc_id),
        |grp AS (SELECT sh, list_sort(list(doc_id)) AS docs, count(*) AS gn FROM sk GROUP BY sh),
        |blk AS (
        |  SELECT g.sh, bb.block, (g.sh >> (bb.block * 8)) & 255 AS bv
        |  FROM grp g CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS block) bb),
        |bc AS (SELECT block, bv, count(*) AS c FROM blk GROUP BY 1, 2),
        |stats AS (SELECT CAST(SUM(c * c) AS BIGINT) AS mass,
        |                 CAST(SUM(c) AS BIGINT) AS rows_n FROM bc),
        |hot AS (
        |  -- gated on the probe: when Σc² stays under the linear budget the
        |  -- ENGINE keeps the plain uncapped band join (no hot exclusion, no
        |  -- refinement), so the mirror's hot set must be empty there too
        |  SELECT block, bv FROM bc
        |  WHERE c > 8 AND (SELECT mass FROM stats) > 8 * (SELECT rows_n FROM stats)),
        |cold AS (SELECT b.* FROM blk b ANTI JOIN hot h ON b.block = h.block AND b.bv = h.bv),
        |coldp AS (
        |  SELECT l.sh AS sh1, r.sh AS sh2
        |  FROM cold l JOIN cold r ON l.block = r.block AND l.bv = r.bv AND l.sh < r.sh
        |  WHERE bit_count(xor(l.sh, r.sh)) <= 7),
        |hotm AS (SELECT b.sh, b.block, b.bv
        |         FROM blk b SEMI JOIN hot h ON b.block = h.block AND b.bv = h.bv),
        |pck AS (
        |  SELECT sh, block, bv,
        |         (CASE WHEN block = 7 THEN CAST(0 AS UBIGINT)
        |               ELSE (sh >> ((block + 1) * 8)) << (block * 8) END)
        |         | (sh & CAST((CAST(1 AS HUGEINT) << (block * 8)) - 1 AS UBIGINT)) AS packed
        |  FROM hotm),
        |sub AS (
        |  SELECT sh, block, bv, jj.sub, (packed >> (7 * jj.sub)) & 127 AS sv
        |  FROM pck CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS sub) jj),
        |sc AS (SELECT block, bv, sub, sv, count(*) AS c FROM sub GROUP BY 1, 2, 3, 4),
        |shed AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nb,
        |         CAST(COALESCE(SUM(c * c), 0) AS BIGINT) AS m
        |  FROM sc WHERE c > 8),
        |subk AS (
        |  SELECT s.* FROM sub s
        |  SEMI JOIN (SELECT block, bv, sub, sv FROM sc WHERE c <= 8) k
        |    ON s.block = k.block AND s.bv = k.bv AND s.sub = k.sub AND s.sv = k.sv),
        |hotp AS (
        |  SELECT l.sh AS sh1, r.sh AS sh2
        |  FROM subk l JOIN subk r
        |    ON l.block = r.block AND l.bv = r.bv AND l.sub = r.sub AND l.sv = r.sv
        |       AND l.sh < r.sh
        |  WHERE bit_count(xor(l.sh, r.sh)) <= 7),
        |skp AS (SELECT DISTINCT sh1, sh2
        |        FROM (SELECT * FROM coldp UNION ALL SELECT * FROM hotp)),
        |crossp AS (
        |  SELECT least(a.d1, b.d2) AS id1, greatest(a.d1, b.d2) AS id2,
        |         bit_count(xor(p.sh1, p.sh2)) AS hamming
        |  FROM skp p
        |  JOIN (SELECT sh, unnest(docs) AS d1 FROM grp) a ON a.sh = p.sh1
        |  JOIN (SELECT sh, unnest(docs) AS d2 FROM grp) b ON b.sh = p.sh2),
        |withinp AS (
        |  SELECT x.da AS id1, y.db AS id2, 0 AS hamming
        |  FROM (SELECT sh, unnest(docs) AS da FROM grp WHERE gn > 1) x
        |  JOIN (SELECT sh, unnest(docs) AS db FROM grp WHERE gn > 1) y
        |    ON x.sh = y.sh AND x.da < y.db),
        |allp AS (SELECT * FROM crossp UNION ALL SELECT * FROM withinp),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(COALESCE(SUM(CAST(concat('0x', substr(md5(
        |           CAST(id1 AS VARCHAR) || '#' || CAST(id2 AS VARCHAR) || '#'
        |             || CAST(hamming AS VARCHAR)), 1, 8)) AS BIGINT)), 0) AS BIGINT)
        |           AS pair_checksum
        |  FROM allp)
        |SELECT CAST(CASE WHEN s.mass > 8 * s.rows_n THEN 1 ELSE 0 END AS INTEGER) AS engaged,
        |       s.mass AS band_mass,
        |       CAST(8 * s.rows_n AS BIGINT) AS linear_budget,
        |       CASE WHEN s.mass > 8 * s.rows_n
        |            THEN (SELECT CAST(count(*) AS BIGINT) FROM hot) ELSE 0 END AS hot_buckets,
        |       CASE WHEN s.mass > 8 * s.rows_n THEN sh.nb ELSE 0 END AS shed_sub_buckets,
        |       CASE WHEN s.mass > 8 * s.rows_n THEN sh.m ELSE 0 END AS shed_sub_mass,
        |       a.n_pairs, a.pair_checksum
        |FROM stats s CROSS JOIN shed sh CROSS JOIN agg a""".stripMargin,

    // Mirrors Corpus.semanticDedup (SemDeDup): seeds are the 8 lowest-id
    // embeddings; assignment argmax and the within-cluster ≥0.9 prune both
    // use the q_dd5 floor-quantized cosine, so every natural vector's
    // cluster AND the dropped set (exactly the injected clones) are
    // reproduced bit-for-bit.
    "q_dd10_semantic_dedup" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 40),
         |seeds AS (SELECT vec_id AS sid, embedding AS se FROM embeddings ORDER BY vec_id LIMIT 8),
         |spos AS (
         |  SELECT v.vec_id, s.sid, v.embedding AS e, s.se,
         |         unnest(generate_series(1, len(v.embedding))) AS i
         |  FROM v CROSS JOIN seeds s),
         |sterm AS (
         |  SELECT vec_id, sid,
         |         CAST(e[CAST(i AS INTEGER)] AS DOUBLE) AS x,
         |         CAST(se[CAST(i AS INTEGER)] AS DOUBLE) AS y
         |  FROM spos),
         |scos AS (SELECT vec_id, sid, $quantCosAgg AS c FROM sterm GROUP BY 1, 2),
         |assign AS (
         |  SELECT vec_id, sid AS cluster FROM (
         |    SELECT vec_id, sid,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, sid) AS rn
         |    FROM scos) WHERE rn = 1),
         |cand AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2, va.embedding AS ea, vb.embedding AS eb
         |  FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  JOIN v va ON va.vec_id = a.vec_id
         |  JOIN v vb ON vb.vec_id = b.vec_id),
         |ppos AS (SELECT id1, id2, ea, eb, unnest(generate_series(1, len(ea))) AS i FROM cand),
         |pterm AS (
         |  SELECT id1, id2,
         |         CAST(ea[CAST(i AS INTEGER)] AS DOUBLE) AS x,
         |         CAST(eb[CAST(i AS INTEGER)] AS DOUBLE) AS y
         |  FROM ppos),
         |pcos AS (SELECT id1, id2, $quantCosAgg AS c FROM pterm GROUP BY 1, 2),
         |dropped AS (SELECT DISTINCT id2 AS vec_id FROM pcos WHERE c >= CAST(0.9 AS DOUBLE))
         |SELECT a.vec_id, a.cluster,
         |       CASE WHEN d.vec_id IS NOT NULL THEN 'dropped' ELSE 'kept' END AS status
         |FROM assign a LEFT JOIN dropped d ON d.vec_id = a.vec_id
         |ORDER BY a.vec_id""".stripMargin,

    // Mirrors Corpus.semanticDedupKmeans: seed init from the 8 lowest ids,
    // ONE Lloyd update (floor-quantized per-dimension mean, float-cast at
    // the kernel boundary — CAST(.. AS REAL) is the same IEEE
    // round-to-nearest as Scala's .toFloat), final assignment vs the
    // updated centroids, then the within-cluster quantized-cosine prune.
    // Empty clusters COALESCE back to their previous centroid, exactly as
    // the Scala update loop leaves missing (cluster, dim) cells untouched.
    "q_dd10b_semantic_kmeans" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 40),
         |dims AS (
         |  SELECT vec_id, CAST(i AS INTEGER) AS i,
         |         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
         |  FROM (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM v)),
         |c0 AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j, embedding AS se
         |  FROM (SELECT vec_id, embedding FROM v ORDER BY vec_id LIMIT 8)),
         |c0d AS (
         |  SELECT j, CAST(i AS INTEGER) AS i, CAST(se[CAST(i AS INTEGER)] AS REAL) AS y
         |  FROM (SELECT j, se, unnest(generate_series(1, len(se))) AS i FROM c0)),
         |t1 AS (
         |  SELECT d.vec_id, c.j, d.x, CAST(c.y AS DOUBLE) AS y
         |  FROM dims d JOIN c0d c ON c.i = d.i),
         |s1 AS (SELECT vec_id, j, $quantCosAgg AS c FROM t1 GROUP BY 1, 2),
         |a1 AS (
         |  SELECT vec_id, j AS cluster FROM (
         |    SELECT vec_id, j,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, j) AS rn
         |    FROM s1) WHERE rn = 1),
         |m1 AS (
         |  SELECT a.cluster AS j, d.i,
         |         CAST(CAST(SUM(CAST(floor(d.x * 1.0E9) AS BIGINT)) AS DOUBLE)
         |              / 1.0E9 / CAST(COUNT(d.x) AS DOUBLE) AS REAL) AS y
         |  FROM a1 a JOIN dims d ON d.vec_id = a.vec_id
         |  GROUP BY 1, 2),
         |c1d AS (
         |  SELECT c0d.j, c0d.i, COALESCE(m1.y, c0d.y) AS y
         |  FROM c0d LEFT JOIN m1 ON m1.j = c0d.j AND m1.i = c0d.i),
         |t2 AS (
         |  SELECT d.vec_id, c.j, d.x, CAST(c.y AS DOUBLE) AS y
         |  FROM dims d JOIN c1d c ON c.i = d.i),
         |s2 AS (SELECT vec_id, j, $quantCosAgg AS c FROM t2 GROUP BY 1, 2),
         |a2 AS (
         |  SELECT vec_id, j AS cluster FROM (
         |    SELECT vec_id, j,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, j) AS rn
         |    FROM s2) WHERE rn = 1),
         |cand AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2
         |  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
         |pterm AS (
         |  SELECT c.id1, c.id2, da.x, db.x AS y
         |  FROM cand c
         |  JOIN dims da ON da.vec_id = c.id1
         |  JOIN dims db ON db.vec_id = c.id2 AND db.i = da.i),
         |pcos AS (
         |  SELECT id1, id2,
         |         (CAST(SUM(CAST(floor(x * y * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15)
         |           / (sqrt(CAST(SUM(CAST(floor(x * x * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15)
         |              * sqrt(CAST(SUM(CAST(floor(y * y * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15)) AS c
         |  FROM pterm GROUP BY 1, 2),
         |dropped AS (SELECT DISTINCT id2 AS vec_id FROM pcos WHERE c >= CAST(0.9 AS DOUBLE))
         |SELECT a.vec_id, a.cluster,
         |       CASE WHEN d.vec_id IS NOT NULL THEN 'dropped' ELSE 'kept' END AS status
         |FROM a2 a LEFT JOIN dropped d ON d.vec_id = a.vec_id
         |ORDER BY a.vec_id""".stripMargin,

    "q_dd5_embed_pairs_top" ->
      """WITH base AS (
        |  -- mirrors the engine's truthCap=2048 bound on the all-pairs
        |  -- ground-truth tier (never binds at the oracle gates: 500/2000
        |  -- vectors; bounds the pair mass at staged scales)
        |  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 2048),
        |pairs AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2, a.embedding AS ea, b.embedding AS eb
        |  FROM base a JOIN base b ON a.vec_id < b.vec_id),
        |pos AS (
        |  SELECT id1, id2, ea, eb, unnest(generate_series(1, len(ea))) AS i FROM pairs),
        |terms AS (
        |  SELECT id1, id2,
        |         CAST(ea[CAST(i AS INTEGER)] AS DOUBLE) AS x,
        |         CAST(eb[CAST(i AS INTEGER)] AS DOUBLE) AS y
        |  FROM pos),
        |s AS (
        |  SELECT id1, id2,
        |         CAST(SUM(CAST(floor(x * y * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15 AS dot,
        |         CAST(SUM(CAST(floor(x * x * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15 AS nx,
        |         CAST(SUM(CAST(floor(y * y * 1.0E15) AS BIGINT)) AS DOUBLE) / 1.0E15 AS ny
        |  FROM terms GROUP BY 1, 2)
        |SELECT id1, id2, dot / (sqrt(nx) * sqrt(ny)) AS cosine
        |FROM s ORDER BY cosine DESC, id1, id2 LIMIT 100""".stripMargin,

    // Mirrors Multimodal.frameSampleStub: nFrames = 1 + n_bytes % 5, pts at
    // 40 ms steps, frame_bytes = n_bytes // nFrames (integer division both
    // engines). Scalar unnest(generate_series(...)) — DuckDB 1.0 has no
    // lateral table generate_series.
    "q_mm2_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n, unnest(generate_series(0, n % 5)) AS i FROM b)
        |SELECT doc_id,
        |       CAST(i AS INTEGER) AS frame_idx,
        |       CAST(i * 40 AS BIGINT) AS pts_ms,
        |       CAST(n // (1 + n % 5) AS BIGINT) AS frame_bytes
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // Mirrors the PNG fixture's dimension formulas (Multimodal.toPngBlobs);
    // the Spark side must REALLY decode the PNG bytes (javax.imageio) to
    // recover them — a decode oracle, not an arithmetic mirror.
    "q_mm1_blob_meta" ->
      """SELECT doc_id,
        |       CAST(8 + (doc_id % 32) AS INTEGER) AS width,
        |       CAST(8 + ((doc_id // 7) % 32) AS INTEGER) AS height,
        |       CAST(3 AS INTEGER) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.resizeFeatures against the fixture's pixel formula
    // (Multimodal.pngBytes: rgb(x,y) = (id·31 + y·w + x) & 0xffffff): the
    // nearest-neighbor sample reads in(2x, 2y), red = bits 16-23. The Spark
    // side must really decode, resample, and reduce the pixels to match.
    // Mirrors Corpus.imageHashDedup (q_mm7): the aHash recomputed from the
    // pngBytes pixel formula (v = (seed*31 + y*w + x) & 0xffffff, gray =
    // (r+g+b)//3, 8x8 nearest-neighbor grid, floor-mean threshold) — the
    // Spark side must really decode the PNGs to reproduce these bits.
    "q_mm7_image_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, doc_id AS seed FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4700000, doc_id FROM documents WHERE doc_id < 50),
        |dim AS (
        |  SELECT doc_id, seed,
        |         CAST(8 + (seed % 32) AS BIGINT) AS w,
        |         CAST(8 + ((seed // 7) % 32) AS BIGINT) AS h
        |  FROM ids),
        |g AS (SELECT *, unnest(generate_series(0, 7)) AS gx FROM dim),
        |gxy AS (SELECT *, unnest(generate_series(0, 7)) AS gy FROM g),
        |px AS (
        |  SELECT doc_id, seed, w, h, gx, gy,
        |         ((seed * 31 + (gy * h // 8) * w + (gx * w // 8)) & 16777215) AS v
        |  FROM gxy),
        |gr AS (
        |  SELECT *, (((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)) // 3 AS gray
        |  FROM px),
        |mn AS (SELECT doc_id, SUM(gray) // 64 AS m FROM gr GROUP BY 1),
        |hsh AS (
        |  SELECT gr.doc_id,
        |         CAST(MIN(gr.w) AS INTEGER) AS width, CAST(MIN(gr.h) AS INTEGER) AS height,
        |         string_agg(CASE WHEN gray > m THEN '1' ELSE '0' END, ''
        |           ORDER BY gy, gx) AS ahash
        |  FROM gr JOIN mn ON mn.doc_id = gr.doc_id
        |  GROUP BY 1)
        |SELECT doc_id, width, height, ahash,
        |       doc_id = MIN(doc_id) OVER (PARTITION BY ahash) AS keep,
        |       COUNT(*) OVER (PARTITION BY ahash) AS group_size
        |FROM hsh ORDER BY doc_id""".stripMargin,

    "q_mm4_resize_features" ->
      """WITH dim AS (
        |  SELECT doc_id,
        |         CAST(8 + (doc_id % 32) AS INTEGER) AS w,
        |         CAST(8 + ((doc_id // 7) % 32) AS INTEGER) AS h
        |  FROM documents),
        |d2 AS (SELECT *, (w + 1) // 2 AS nw, (h + 1) // 2 AS nh FROM dim),
        |px AS (SELECT *, unnest(generate_series(0, nw - 1)) AS x FROM d2),
        |pxy AS (SELECT *, unnest(generate_series(0, nh - 1)) AS y FROM px),
        |r AS (
        |  SELECT doc_id, w, h, nw, nh,
        |         ((doc_id * 31 + CAST(2 * y AS BIGINT) * w + CAST(2 * x AS BIGINT)) & 16777215) >> 16 AS red
        |  FROM pxy)
        |SELECT doc_id, w AS width, h AS height,
        |       CAST(nw AS INTEGER) AS rs_width, CAST(nh AS INTEGER) AS rs_height,
        |       CAST(SUM(red) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_red
        |FROM r GROUP BY 1, 2, 3, 4, 5 ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.videoDemux against the GVID fixture formulas: n = 1 +
    // id % 5 frames of (8 + id % 8) × (8 + (id//3) % 8), sampled at indices
    // i·n/k (k = min(n, 3)), 25 fps ⇒ pts = idx·40 ms, per-frame pixel seed
    // id·1000 + idx. The Spark side must really parse the container and
    // decode the frames to reproduce these numbers.
    "q_mm5_video_demux" ->
      """WITH v AS (
        |  SELECT doc_id,
        |         CAST(1 + (doc_id % 5) AS BIGINT) AS n,
        |         CAST(8 + (doc_id % 8) AS INTEGER) AS w,
        |         CAST(8 + ((doc_id // 3) % 8) AS INTEGER) AS h
        |  FROM documents),
        |kk AS (SELECT *, least(n, 3) AS k FROM v),
        |s AS (SELECT *, unnest(generate_series(0, k - 1)) AS i FROM kk),
        |f AS (SELECT doc_id, w, h, CAST((i * n) // k AS INTEGER) AS frame_idx FROM s),
        |px AS (SELECT *, unnest(generate_series(0, w - 1)) AS x FROM f),
        |pxy AS (SELECT *, unnest(generate_series(0, h - 1)) AS y FROM px),
        |r AS (
        |  SELECT doc_id, frame_idx, w, h,
        |         (((doc_id * 1000 + frame_idx) * 31 + CAST(y AS BIGINT) * w + CAST(x AS BIGINT)) & 16777215) >> 16 AS red
        |  FROM pxy)
        |SELECT doc_id, frame_idx,
        |       CAST(frame_idx * 40 AS BIGINT) AS pts_ms,
        |       w AS width, h AS height,
        |       CAST(SUM(red) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_red
        |FROM r GROUP BY 1, 2, 3, 4, 5 ORDER BY doc_id, frame_idx""".stripMargin,

    // Mirrors Corpus.videoHashDedup (q_mm11): per-clip signature = frame
    // count + the q_mm7 aHash of each sampled frame (indices i·n/k,
    // k = min(n, 3)), every hash recomputed from the GVID fixture formulas
    // (per-frame pixel seed = seed·1000 + frame_idx, v = (s·31 + y·w + x)
    // & 0xffffff, gray = (r+g+b)//3, 8×8 nearest-neighbor grid, floor-mean
    // threshold). The Spark side must really demux the container AND
    // decode the frame pixels to reproduce the signature; clones (ids
    // +4900000, original id as seed → byte-identical clips) plant the
    // groups.
    "q_mm11_video_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, doc_id AS seed FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4900000, doc_id FROM documents WHERE doc_id < 50),
        |vid AS (
        |  SELECT doc_id, seed,
        |         CAST(1 + (seed % 5) AS BIGINT) AS n,
        |         CAST(8 + (seed % 8) AS BIGINT) AS w,
        |         CAST(8 + ((seed // 3) % 8) AS BIGINT) AS h
        |  FROM ids),
        |kk AS (SELECT *, least(n, 3) AS k FROM vid),
        |sf AS (SELECT *, unnest(generate_series(0, k - 1)) AS i FROM kk),
        |fr AS (SELECT doc_id, seed, n, w, h, (i * n) // k AS fidx FROM sf),
        |g AS (SELECT *, unnest(generate_series(0, 7)) AS gx FROM fr),
        |gxy AS (SELECT *, unnest(generate_series(0, 7)) AS gy FROM g),
        |px AS (
        |  SELECT doc_id, n, fidx, gx, gy,
        |         (((seed * 1000 + fidx) * 31 + (gy * h // 8) * w + (gx * w // 8)) & 16777215) AS v
        |  FROM gxy),
        |gr AS (
        |  SELECT *, (((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)) // 3 AS gray
        |  FROM px),
        |mn AS (SELECT doc_id, fidx, SUM(gray) // 64 AS m FROM gr GROUP BY 1, 2),
        |fh AS (
        |  SELECT gr.doc_id, MIN(gr.n) AS n, gr.fidx,
        |         string_agg(CASE WHEN gray > m THEN '1' ELSE '0' END, ''
        |           ORDER BY gy, gx) AS fhash
        |  FROM gr JOIN mn ON mn.doc_id = gr.doc_id AND mn.fidx = gr.fidx
        |  GROUP BY gr.doc_id, gr.fidx),
        |sig AS (
        |  SELECT doc_id, CAST(MIN(n) AS INTEGER) AS n_frames,
        |         CAST(MIN(n) AS VARCHAR) || ':' ||
        |           string_agg(fhash, '|' ORDER BY fidx) AS sig
        |  FROM fh GROUP BY 1)
        |SELECT doc_id, n_frames, sig,
        |       doc_id = MIN(doc_id) OVER (PARTITION BY sig) AS keep,
        |       COUNT(*) OVER (PARTITION BY sig) AS group_size
        |FROM sig ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.olsFit: closed-form OLS from exact-integer sufficient
    // statistics; the only double ops are one division (beta) and the
    // three-op intercept chain — IEEE-identical across engines. Magnitudes
    // stay far below 2^53, so the BIGINT→DOUBLE casts are exact.
    "q_ml2_ols_fit" -> withDaily(
      """,a AS (
        |  SELECT Country, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(DayOfWeek AS BIGINT)) AS BIGINT) AS sx,
        |         CAST(SUM(NetDailyQuantity) AS BIGINT) AS sy,
        |         CAST(SUM(CAST(DayOfWeek AS BIGINT) * NetDailyQuantity) AS BIGINT) AS sxy,
        |         CAST(SUM(CAST(DayOfWeek AS BIGINT) * CAST(DayOfWeek AS BIGINT)) AS BIGINT) AS sxx
        |  FROM daily GROUP BY Country),
        |b AS (
        |  SELECT Country, n, sx, sy,
        |         CASE WHEN n * sxx - sx * sx <> 0
        |              THEN CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        |         END AS beta
        |  FROM a)
        |SELECT Country, n, beta,
        |       CASE WHEN beta IS NOT NULL
        |            THEN (CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |       END AS alpha
        |FROM b ORDER BY Country""".stripMargin),

    // Mirrors Corpus.ridgeMultiFit: exact integer sufficient statistics for
    // the 5×5 ridge normal equations, then THE SAME generated elimination
    // formula text NormalEq feeds Spark (fixed-order IEEE arithmetic on
    // identical doubles → bit-identical betas). DuckDB's HUGEINT sums and
    // Spark's DECIMAL(38,0) sums agree exactly; both cast to DOUBLE below
    // 2^53 so the boundary cast is value-exact too.
    "q_ml3_ridge_fit" -> withDaily(s",$ridgeCalendarSql"),

    // Mirrors Corpus.ridgeLagFit: the reference's model SHAPE — a global
    // multi-feature fit on lag features (Sales_forecast_pyspark.py:1160-
    // 1169) — as a closed-form ridge, hash-gated end to end: DuckDB
    // recomputes the same coalesced lag windows, the same exact integer
    // sufficient statistics, and the same generated elimination text.
    "q_ml4_ridge_lags" -> withDaily(s",$ridgeLagSql"),

    // Mirrors Corpus.streamedRidge: the incremental streaming fit must be
    // bit-identical to the batch fit — decimal sufficient statistics are
    // exact and order-independent, so the oracle is simply the batch stats
    // + the shared elimination text over the events table.
    "q_e7_stream_ridge" ->
      s"""WITH ev AS (
         |  SELECT event_type,
         |         CAST(hour(ts) AS BIGINT) AS h,
         |         CAST(dayofweek(ts) + 1 AS BIGINT) AS dw,
         |         CAST(floor(value * 100) AS BIGINT) AS y
         |  FROM events),
         |${ridgeStatsSql(Seq("h", "dw"), "y", "ev", Seq("event_type"))}
         |${graft.ml.NormalEq.oracleSolveSql(3, Seq("event_type"))}""".stripMargin,

    // Mirrors Corpus.ridgeScorecard: the q_ml3 fit plus the generated
    // diagnostics text — per-country SSE/SST/R²/RMSE from the same exact
    // sufficient statistics, hash-gated end to end.
    "q_ml5_ridge_scorecard" -> withDaily(s",$ridgeScorecardSql"),

    // Mirrors Corpus.hash64Groups by grouping on the canonical text itself:
    // hash-exact iff the custom RollingHash64 expression partitions content
    // Mirrors Corpus.textBpeTokens: the RE2-compatible GPT-2-style
    // pre-tokenization pattern is the SAME regex text in both engines (no
    // lookahead, so Java and RE2 agree on every match).
    "q_t14_bpe_tokens" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS INTEGER) AS n_bpe_tokens,
        |       COALESCE(
        |         CAST(length(text) AS DOUBLE)
        |           / CAST(greatest(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')), 1) AS DOUBLE),
        |         CAST(0.0 AS DOUBLE)) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.sequencePack: per-source exact-integer token cumsum,
    // sequence ids via FLOOR of a double division (Spark's `/` on longs is
    // true division in both engines at these magnitudes — exact ints < 2^53).
    "q_t15_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS end_off
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |       end_off - n_tokens AS start_off,
        |       CAST(FLOOR(CAST(end_off - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS first_seq,
        |       CAST(FLOOR(CAST(end_off - 1 AS DOUBLE) / 2048) AS BIGINT) AS last_seq,
        |       greatest(
        |         CAST(FLOOR(CAST(end_off - 1 AS DOUBLE) / 2048) AS BIGINT)
        |           - CAST(FLOOR(CAST(end_off - n_tokens AS DOUBLE) / 2048) AS BIGINT),
        |         CAST(0 AS BIGINT)) AS n_boundaries
        |FROM c ORDER BY source, doc_id""".stripMargin,

    // identically to content equality.
    "q_t5b_hash64_groups" ->
      """SELECT MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM documents
        |GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |ORDER BY keep_id""".stripMargin,

    // Mirrors the WAV fixture's format formulas (Multimodal.toWavBlobs);
    // the Spark side must really parse the RIFF/WAVE structure
    // (javax.sound.sampled) to recover them.
    "q_mm3_audio_meta" ->
      """SELECT doc_id,
        |       CAST(8000 AS INTEGER) AS sample_rate,
        |       CAST(1 + (doc_id % 2) AS INTEGER) AS channels,
        |       CAST(100 + (doc_id % 400) AS BIGINT) AS n_frames,
        |       CAST((100 + (doc_id % 400)) * 1000 // 8000 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors the WAV fixture's PCM sample formula (Multimodal.wavBytes:
    // sample_i = int16((doc_id*131 + i*7919) & 0xffff), interleaved over
    // channels): peak and the square sum are exact integers, the RMS is one
    // IEEE division + sqrt — the Spark side must decode the actual waveform.
    // Mirrors Corpus.imageNearDups (q_mm10): aHash from the pixel formula,
    // then ALL-PAIRS hamming at the oracle's scale — the engine must
    // reproduce exactly this pair set through its banded join (pigeonhole
    // recall at dist <= 3 is structural).
    "q_mm10_image_neardup" ->
      """WITH dim AS (
        |  SELECT doc_id,
        |         CAST(8 + (doc_id % 32) AS BIGINT) AS w,
        |         CAST(8 + ((doc_id // 7) % 32) AS BIGINT) AS h
        |  FROM documents),
        |g AS (SELECT *, unnest(generate_series(0, 7)) AS gx FROM dim),
        |gxy AS (SELECT *, unnest(generate_series(0, 7)) AS gy FROM g),
        |px AS (
        |  SELECT doc_id, w, h, gx, gy,
        |         ((doc_id * 31 + (gy * h // 8) * w + (gx * w // 8)) & 16777215) AS v
        |  FROM gxy),
        |gr AS (
        |  SELECT *, (((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)) // 3 AS gray
        |  FROM px),
        |mn AS (SELECT doc_id, SUM(gray) // 64 AS m FROM gr GROUP BY 1),
        |hsh AS (
        |  SELECT gr.doc_id,
        |         string_agg(CASE WHEN gray > m THEN '1' ELSE '0' END, ''
        |           ORDER BY gy, gx) AS ahash
        |  FROM gr JOIN mn ON mn.doc_id = gr.doc_id
        |  GROUP BY 1),
        |pr AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |         (SELECT CAST(COUNT(*) AS INTEGER)
        |          FROM unnest(generate_series(1, 64)) t(k)
        |          WHERE substr(a.ahash, CAST(k AS INTEGER), 1)
        |             <> substr(b.ahash, CAST(k AS INTEGER), 1)) AS dist
        |  FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id)
        |SELECT i, j, dist FROM pr WHERE dist BETWEEN 1 AND 3 ORDER BY i, j""".stripMargin,

    // Mirrors Corpus.imageTextPairs (q_mm9): decoded dims from the PNG
    // fixture formulas + caption token stats + the integer-exact gate.
    "q_mm9_pair_curation" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(8 + (doc_id % 32) AS INTEGER) AS width,
        |         CAST(8 + ((doc_id // 7) % 32) AS INTEGER) AS height,
        |         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_caption_tokens
        |  FROM documents)
        |SELECT doc_id, width, height, n_caption_tokens,
        |       (width * height >= 400
        |        AND greatest(width, height) <= least(width, height) * 3
        |        AND n_caption_tokens BETWEEN 5 AND 60) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.audioHashDedup (q_mm8): the 4-window integer energy
    // profile recomputed from the WAV sample formula (smp = signed 16-bit
    // of (seed*131 + i*7919) & 0xffff, window = (i*4)//n) — the Spark
    // side must decode real PCM to reproduce the fingerprint.
    "q_mm8_audio_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, doc_id AS seed FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4800000, doc_id FROM documents WHERE doc_id < 50),
        |d AS (
        |  SELECT doc_id, seed,
        |         CAST((100 + seed % 400) * (1 + seed % 2) AS BIGINT) AS n
        |  FROM ids),
        |s AS (SELECT doc_id, seed, n, unnest(generate_series(0, n - 1)) AS i FROM d),
        |v AS (
        |  SELECT doc_id, n, (i * 4) // n AS w,
        |         CASE WHEN ((seed * 131 + i * 7919) & 65535) >= 32768
        |              THEN ((seed * 131 + i * 7919) & 65535) - 65536
        |              ELSE ((seed * 131 + i * 7919) & 65535) END AS smp
        |  FROM s),
        |wi AS (
        |  SELECT doc_id, n, w, SUM(smp * smp) // COUNT(*) AS m
        |  FROM v GROUP BY 1, 2, 3),
        |sig AS (
        |  SELECT doc_id, MIN(n) AS n_samples,
        |         string_agg(CAST(m AS VARCHAR), ':' ORDER BY w) AS sig
        |  FROM wi GROUP BY 1)
        |SELECT doc_id, n_samples, sig,
        |       doc_id = MIN(doc_id) OVER (PARTITION BY sig) AS keep,
        |       COUNT(*) OVER (PARTITION BY sig) AS group_size
        |FROM sig ORDER BY doc_id""".stripMargin,

    "q_mm6_audio_features" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         (100 + doc_id % 400) * (1 + doc_id % 2) AS n
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM d),
        |v AS (
        |  SELECT doc_id, n,
        |         CASE WHEN ((doc_id * 131 + i * 7919) & 65535) >= 32768
        |              THEN ((doc_id * 131 + i * 7919) & 65535) - 65536
        |              ELSE ((doc_id * 131 + i * 7919) & 65535) END AS smp
        |  FROM s)
        |SELECT doc_id,
        |       CAST(max(n) AS BIGINT) AS n_samples,
        |       CAST(max(abs(smp)) AS INTEGER) AS peak,
        |       sqrt(CAST(sum(smp * smp) AS DOUBLE) / CAST(max(n) AS DOUBLE)) AS rms
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_w6_ma_baseline" -> withDaily(
      s"""SELECT Country, StockCode, $tsDate, NetDailyQuantity,
         |       COALESCE(
         |         CAST(SUM(NetDailyQuantity) OVER f6 AS DOUBLE) / CAST(COUNT(NetDailyQuantity) OVER f6 AS DOUBLE),
         |         CAST(lag(NetDailyQuantity, 1) OVER w AS DOUBLE)) AS baseline_qty
         |FROM daily
         |WINDOW $seriesWin, ${frameWin("f6", 6)}
         |ORDER BY Country, StockCode, InvoiceDate""".stripMargin)
  )
}
