package graft

import graft.analysis.Analyzer
import graft.codec.SmallFloat

/** Generators for the DuckDB oracle SQL of the full-text entries: the
  * analysis chain and the BM25 formula are re-expressed in ANSI SQL over
  * the same `documents` parquet table, with the lossy SmallFloat norm
  * reproduced via an inline lookup table generated from the codec itself
  * (single source of truth; SURVEY.md §5.2.3).
  */
object OracleGen {

  /** DuckDB list of quoted stopwords. */
  val stopList: String =
    Analyzer.EnglishStopWords.toSeq.sorted.map(w => s"'$w'").mkString(", ")

  private def termList(terms: Seq[String]): String =
    terms.map(t => s"'$t'").mkString(", ")

  /** Tokenized, stop-filtered (doc_id, term) stream. The documents corpus
    * is space-separated lowercase [a-z0-9]+ words, on which the reference
    * StandardAnalyzer chain coincides with string_split (FIXTURES.md §1).
    */
  val tokCte: String =
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
       |), tokf AS (
       |  SELECT doc_id, term FROM tok
       |  WHERE length(term) > 0 AND term NOT IN ($stopList)
       |)""".stripMargin

  /** Inline table of all decoded values representable by the SmallFloat
    * byte4 norm encoding; decode(encode(dl)) = max representable ≤ dl.
    */
  val normValues: String =
    SmallFloat.representableValues.map(v => s"($v)").mkString(", ")

  val dlCtes: String =
    s"""dl AS (
       |  SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id
       |), norm AS (
       |  SELECT doc_id, dl,
       |    (SELECT max(v) FROM (VALUES $normValues) AS nv(v) WHERE nv.v <= dl.dl) AS ldl
       |  FROM dl
       |), st AS (
       |  SELECT count(*) AS n, sum(dl) AS sttf FROM dl
       |)""".stripMargin

  def tokenizeCountsSql: String =
    s"WITH $tokCte SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id"

  def termDfSql: String =
    s"""WITH $tokCte
       |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ctf
       |FROM tokf GROUP BY term""".stripMargin

  /** CTE chain ending in `persc(doc_id, term, s)` — the per-(doc, term)
    * BM25 score (Lucene 8.x formula shape, float64) — and
    * `sc(doc_id, score, n_matched)` — per-doc disjunctive sum.
    */
  def bm25Ctes(terms: Seq[String], k1: Double = 1.2,
               b: Double = 0.75): String = {
    val qs = termList(terms.distinct)
    s"""$tokCte, $dlCtes, df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ($qs) GROUP BY term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), persc AS (
       |  SELECT tf.doc_id, tf.term,
       |    ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
       |      * tf.tf / (tf.tf + $k1 * (1 - $b + $b * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE)))) AS s
       |  FROM tf JOIN df USING (term) JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st
       |), sc AS (
       |  SELECT doc_id, sum(s) AS score, count(*) AS n_matched
       |  FROM persc GROUP BY doc_id
       |)""".stripMargin
  }

  /** BM25 top-k with schema-tuned k1/b (BM25SimilarityFactory params). */
  def bm25ParamsSql(terms: Seq[String], k: Int, k1: Double,
                    b: Double): String =
    s"""WITH ${bm25Ctes(terms, k1, b)}
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** BM25 with norms omitted: ldl replaced by the constant 1 (the
    * normless field's norm value in 8.x), same idf/tf shape.
    */
  def bm25OmitNormsSql(terms: Seq[String], k: Int): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ($qs) GROUP BY term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), persc AS (
       |  SELECT tf.doc_id, tf.term,
       |    ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
       |      * tf.tf / (tf.tf
       |        + 1.2 * (1 - 0.75 + 0.75 / (st.sttf / CAST(st.n AS DOUBLE)))) AS s
       |  FROM tf JOIN df USING (term) CROSS JOIN st
       |), sc AS (SELECT doc_id, sum(s) AS score FROM persc GROUP BY doc_id)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** BM25 top-k: disjunctive when minShouldMatch=1, conjunctive when
    * = #terms.
    */
  def bm25TopKSql(terms: Seq[String], k: Int, minShouldMatch: Int = 1): String =
    s"""WITH ${bm25Ctes(terms)}
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc WHERE n_matched >= $minShouldMatch
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** Filtered top-k replay (`fq` semantics): score only over `terms`,
    * restrict candidates to docs containing `filterTerm` — the filter
    * never contributes to the score, exactly Occur.FILTER.
    */
  def bm25FilteredTopKSql(terms: Seq[String], filterTerm: String,
                          k: Int): String =
    s"""WITH ${bm25Ctes(terms)}
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc
       |WHERE doc_id IN (
       |  SELECT DISTINCT doc_id FROM tokf WHERE term = '$filterTerm')
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** explain()/debugQuery: per-term decomposition rows of the top-k
    * docs' BM25 scores — contribution, idf, tf, df, lossy dl per
    * matched (doc, term), plus the doc total they sum to (the CheckHits
    * invariant).
    */
  def explainSql(terms: Seq[String], k: Int): String =
    s"""WITH ${bm25Ctes(terms)}, topd AS (
       |  SELECT doc_id, score FROM sc
       |  ORDER BY score DESC, doc_id ASC LIMIT $k
       |)
       |SELECT t.doc_id, p.term, tf.tf, df.df, norm.ldl AS dl,
       |  CAST(round(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5)) * 10000) AS BIGINT) AS idf_q,
       |  CAST(round(p.s * 10000) AS BIGINT) AS contrib_q,
       |  CAST(round(t.score * 10000) AS BIGINT) AS score_q
       |FROM topd t
       |JOIN persc p ON t.doc_id = p.doc_id
       |JOIN tf ON tf.doc_id = p.doc_id AND tf.term = p.term
       |JOIN df ON df.term = p.term
       |JOIN norm ON norm.doc_id = p.doc_id
       |CROSS JOIN st""".stripMargin

  /** SynonymQuery: the synonym set as ONE pseudo-term — per-doc
    * tf = Σ over the terms, idf from the blended docFreq = max over the
    * terms' dfs (8.x SynonymQuery.createWeight blending).
    */
  def synonymTopKSql(terms: Seq[String], k: Int): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, sdf AS (
       |  SELECT max(df) AS df FROM (
       |    SELECT count(DISTINCT doc_id) AS df FROM tokf
       |    WHERE term IN ($qs) GROUP BY term)
       |), stf AS (
       |  SELECT doc_id, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id
       |)
       |SELECT stf.doc_id, CAST(round(
       |  ln(1 + (st.n - sdf.df + 0.5) / (sdf.df + 0.5))
       |    * stf.tf / (stf.tf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE))))
       |  * 10000) AS BIGINT) AS score_q
       |FROM stf JOIN norm ON stf.doc_id = norm.doc_id CROSS JOIN sdf CROSS JOIN st
       |ORDER BY ln(1 + (st.n - sdf.df + 0.5) / (sdf.df + 0.5))
       |    * stf.tf / (stf.tf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE)))) DESC,
       |  stf.doc_id ASC LIMIT $k""".stripMargin
  }

  /** BoostQuery: wrapped query's score × boost. */
  def bm25BoostSql(terms: Seq[String], boost: Double, k: Int): String =
    s"""WITH ${bm25Ctes(terms)}
       |SELECT doc_id, CAST(round(score * $boost * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** MUST_NOT: scored disjunction minus docs containing any notTerms. */
  def bm25NotSql(terms: Seq[String], notTerms: Seq[String], k: Int): String =
    s"""WITH ${bm25Ctes(terms)}
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc WHERE doc_id NOT IN (
       |  SELECT DISTINCT doc_id FROM tokf WHERE term IN (${termList(notTerms)}))
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** FILTER clause: scored disjunction restricted to an n_chars range
    * (PointRangeQuery analog; the filter contributes no score).
    */
  def bm25FilterRangeSql(terms: Seq[String], lo: Long, hi: Long, k: Int): String =
    s"""WITH ${bm25Ctes(terms)}
       |SELECT sc.doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc JOIN documents d ON sc.doc_id = d.doc_id
       |WHERE d.n_chars BETWEEN $lo AND $hi
       |ORDER BY score DESC, sc.doc_id ASC LIMIT $k""".stripMargin

  /** DisjunctionMax: max clause score + tieBreaker * (sum - max). */
  def disMaxSql(terms: Seq[String], k: Int, tieBreaker: Double): String =
    s"""WITH ${bm25Ctes(terms)}, agg AS (
       |  SELECT doc_id, max(s) AS mx, sum(s) AS sm FROM persc GROUP BY doc_id
       |)
       |SELECT doc_id,
       |  CAST(round((mx + $tieBreaker * (sm - mx)) * 10000) AS BIGINT) AS score_q
       |FROM agg ORDER BY (mx + $tieBreaker * (sm - mx)) DESC, doc_id ASC LIMIT $k""".stripMargin

  /** Exact phrase: docs where the words occur consecutively (positions
    * from the raw token stream — stop-filter gaps preserved, so a
    * removed stopword between words breaks adjacency, as in the
    * reference). Currently 2-word phrases (enough for the oracle; the
    * engine supports n-word).
    */
  def phraseSql(w1: String, w2: String): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2')
       |SELECT a.doc_id, count(*) AS phrase_tf
       |FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |GROUP BY a.doc_id""".stripMargin

  /** Three-level block join: replay the deterministic deep-block split
    * (child0 = first half, child1 = second half; each child's
    * grandchildren = its two ceil-halves) with DuckDB list slices —
    * a parent qualifies per child iff the child slice contains the
    * child term AND one of its grandchild slices contains the
    * grandchild term.
    */
  def blockJoinGrandchildSql(a: String, b: String): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), p AS (
       |  SELECT doc_id, l, len(l) AS n, (len(l) + 1) // 2 AS h FROM lists
       |), q AS (
       |  SELECT doc_id, l, n, h,
       |    (h + 1) // 2 AS qa, (n - h + 1) // 2 AS qb FROM p
       |), m AS (
       |  SELECT doc_id,
       |    CASE WHEN list_contains(l[1:h], '$a') AND
       |      (list_contains(l[1:qa], '$b') OR list_contains(l[qa+1:h], '$b'))
       |      THEN 1 ELSE 0 END AS c0,
       |    CASE WHEN list_contains(l[h+1:n], '$a') AND
       |      (list_contains(l[h+1:h+qb], '$b')
       |       OR list_contains(l[h+qb+1:n], '$b'))
       |      THEN 1 ELSE 0 END AS c1
       |  FROM q)
       |SELECT doc_id, CAST(c0 + c1 AS BIGINT) AS n_qual_children
       |FROM m WHERE c0 + c1 > 0""".stripMargin

  /** Field-masking span: the ordered span-near anchor chain with the
    * masked (title) side restricted to the title window — title is a
    * prefix field, so SQL positions 1..titleWords ARE its positions.
    */
  def fieldMaskingSpanSql(w1: String, w2: String, slop: Int,
                          titleWords: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos
       |         WHERE term = '$w1' AND pos <= $titleWords),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2'),
       |anchors AS (
       |  SELECT a.doc_id, a.pos, min(b.pos) AS nb
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos > a.pos
       |  GROUP BY a.doc_id, a.pos)
       |SELECT doc_id, count(*) AS span_tf
       |FROM anchors WHERE nb - pos - 1 <= $slop GROUP BY doc_id""".stripMargin

  /** Payload-checked span: phrase occurrences gated by the first-slot
    * payload (payload of an occurrence = its 1-based token position, the
    * payload_score model), so the check is simply `a.pos <= max`.
    */
  def spanPayloadCheckSql(w1: String, w2: String, maxPayload: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2')
       |SELECT a.doc_id, count(*) AS n_matches
       |FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |WHERE a.pos <= $maxPayload
       |GROUP BY a.doc_id""".stripMargin

  /** BM25-scored phrase top-k: freq = phrase_tf (consecutive
    * occurrences), weight = sum of the two slot terms' idfs — the
    * reference's PhraseWeight (one TermStatistics per slot) through the
    * 8.x BM25 formula shape, float64.
    */
  def phraseScoredSql(w1: String, w2: String, k: Int): String = {
    val scoreExpr =
      "widf.w * ph.ptf / (ph.ptf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE))))"
    s"""WITH $tokCte, $dlCtes, pdf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ('$w1', '$w2') GROUP BY term
       |), widf AS (
       |  SELECT sum(ln(1 + (st.n - pdf.df + 0.5) / (pdf.df + 0.5))) AS w
       |  FROM pdf CROSS JOIN st
       |), lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2'),
       |   ph AS (
       |  SELECT a.doc_id, count(*) AS ptf
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  GROUP BY a.doc_id
       |)
       |SELECT ph.doc_id,
       |  CAST(round($scoreExpr * 10000) AS BIGINT) AS score_q
       |FROM ph JOIN norm ON ph.doc_id = norm.doc_id CROSS JOIN widf CROSS JOIN st
       |ORDER BY $scoreExpr DESC, ph.doc_id ASC
       |LIMIT $k""".stripMargin
  }

  /** Two-phase distributed grouping replay: shard proposals → group
    * election → per-shard per-group cut → merge, with the engine's
    * shard convention (doc_id // 128). The oracle replays the PROTOCOL
    * (the reference's distributed grouping is approximate by design),
    * not the idealized global answer.
    */
  def shardedGroupSql(terms: Seq[String], nGroups: Int,
                      perGroup: Int): String =
    s"""WITH ${bm25Ctes(terms)}, sg AS (
       |  SELECT sc.doc_id, sc.score, sc.doc_id // 128 AS shard, d.source
       |  FROM sc JOIN documents d ON sc.doc_id = d.doc_id
       |), gbest AS (
       |  SELECT shard, source, max(score) AS gmax FROM sg GROUP BY 1, 2
       |), prop AS (
       |  SELECT shard, source, gmax FROM gbest
       |  QUALIFY row_number() OVER (
       |    PARTITION BY shard ORDER BY gmax DESC, source ASC) <= $nGroups
       |), sel AS (
       |  SELECT source FROM (
       |    SELECT source, max(gmax) AS gmax FROM prop GROUP BY 1)
       |  ORDER BY gmax DESC, source ASC LIMIT $nGroups
       |), ship AS (
       |  SELECT sg.doc_id, sg.score, sg.shard, sg.source
       |  FROM sg JOIN sel USING (source)
       |  QUALIFY row_number() OVER (PARTITION BY shard, source
       |    ORDER BY score DESC, doc_id ASC) <= $perGroup
       |), merged AS (
       |  SELECT source, doc_id, score, row_number() OVER (
       |    PARTITION BY source ORDER BY score DESC, doc_id ASC) AS grank
       |  FROM ship
       |)
       |SELECT source, CAST(grank AS BIGINT) AS grank, doc_id,
       |  CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM merged WHERE grank <= $perGroup""".stripMargin

  /** Query-time synonym graph ("w1 w2, syn"): the parsed disjunction
    * phrase(w1 w2) OR term(syn), each path scored by its own weight,
    * SHOULD-summed per doc — phrase CTEs as [[phraseScoredSql]], term
    * path as plain BM25, full-outer coalesce union.
    */
  def synonymGraphSql(w1: String, w2: String, syn: String, k: Int): String =
    s"""WITH $tokCte, $dlCtes, pdf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ('$w1', '$w2') GROUP BY term
       |), widf AS (
       |  SELECT sum(ln(1 + (st.n - pdf.df + 0.5) / (pdf.df + 0.5))) AS w
       |  FROM pdf CROSS JOIN st
       |), lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2'),
       |   ph AS (
       |  SELECT a.doc_id, count(*) AS ptf
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  GROUP BY a.doc_id
       |), p1 AS (
       |  SELECT ph.doc_id,
       |    widf.w * ph.ptf / (ph.ptf + 1.2 * (1 - 0.75
       |      + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE)))) AS s
       |  FROM ph JOIN norm ON ph.doc_id = norm.doc_id
       |  CROSS JOIN widf CROSS JOIN st
       |), df1 AS (
       |  SELECT count(DISTINCT doc_id) AS df FROM tokf WHERE term = '$syn'
       |), t1 AS (
       |  SELECT doc_id, count(*) AS tf FROM tokf WHERE term = '$syn'
       |  GROUP BY doc_id
       |), s1 AS (
       |  SELECT t1.doc_id,
       |    ln(1 + (st.n - df1.df + 0.5) / (df1.df + 0.5))
       |      * t1.tf / (t1.tf + 1.2 * (1 - 0.75
       |        + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE)))) AS s
       |  FROM t1 JOIN norm ON t1.doc_id = norm.doc_id
       |  CROSS JOIN df1 CROSS JOIN st
       |), u AS (
       |  SELECT COALESCE(p1.doc_id, s1.doc_id) AS doc_id,
       |    COALESCE(p1.s, 0) + COALESCE(s1.s, 0) AS score
       |  FROM p1 FULL OUTER JOIN s1 ON p1.doc_id = s1.doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM u ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** Unrolled batch logistic regression (TextLogitStream oracle): the
    * SAME per-iteration arithmetic as the engine — per-doc gradient
    * contributions quantized to 2^24 integers, weight updates in float64
    * from the exact integer sums — as a chain of CTEs (w0 → g1 → w1 → …),
    * one gradient/weight pair per iteration.
    */
  def textLogitSql(features: Seq[String], iters: Int, lr: Double,
                   q: Long = 1L << 24): String = {
    val nf = features.size
    val fsel = features.zipWithIndex.map { case (f, j) =>
      s"max(CASE WHEN term = '$f' THEN 1 ELSE 0 END) AS x$j" }.mkString(", ")
    val flist = termList(features)
    val xcoal = features.indices.map(j =>
      s"COALESCE(x$j, 0) AS x$j").mkString(", ")
    val zeroW = (0 to nf).map(k => s"CAST(0.0 AS DOUBLE) AS c$k").mkString(", ")
    def gradCte(t: Int): String = {
      val z = "w.c0 + " + features.indices.map(j =>
        s"w.c${j + 1}*CAST(x$j AS DOUBLE)").mkString(" + ")
      val gsums = s"sum(eq) AS g0, " + features.indices.map(j =>
        s"sum(CASE WHEN x$j = 1 THEN eq ELSE 0 END) AS g${j + 1}").mkString(", ")
      s"""g$t AS (
         |  SELECT $gsums FROM (
         |    SELECT f.*, CAST(round((1.0/(1.0 + exp(-($z))) - CAST(y AS DOUBLE)) * $q) AS BIGINT) AS eq
         |    FROM feat f CROSS JOIN w${t - 1} w) qq
         |)""".stripMargin
    }
    def wCte(t: Int): String = {
      val cols = (0 to nf).map(k =>
        s"w.c$k - $lr*(CAST(g.g$k AS DOUBLE)/$q.0)/t.n AS c$k").mkString(", ")
      s"w$t AS (SELECT $cols FROM w${t - 1} w CROSS JOIN g$t g CROSS JOIN tot t)"
    }
    val chain = (1 to iters).map(t => gradCte(t) + ",\n" + wCte(t)).mkString(",\n")
    val out = (s"SELECT 'intercept' AS feature, CAST(round(c0*1000000) AS BIGINT) AS weight_q FROM w$iters" +:
      features.zipWithIndex.map { case (f, j) =>
        s"SELECT '$f', CAST(round(c${j + 1}*1000000) AS BIGINT) FROM w$iters" })
      .mkString("\nUNION ALL ")
    s"""WITH $tokCte, dt AS (SELECT DISTINCT doc_id, term FROM tokf),
       |xs AS (SELECT doc_id, $fsel FROM dt WHERE term IN ($flist) GROUP BY doc_id),
       |feat AS (
       |  SELECT d.doc_id, d.doc_id % 2 AS y, $xcoal
       |  FROM documents d LEFT JOIN xs ON d.doc_id = xs.doc_id
       |), tot AS (SELECT count(*) AS n FROM feat),
       |w0 AS (SELECT $zeroW),
       |$chain
       |$out""".stripMargin
  }

  /** Binary entropy from two exact integer counts, in the SAME float64
    * expression shape as the engine's Catalyst column (0·ln0 = 0 via
    * CASE, division inside the guarded branch only).
    */
  def entropy2Sql(a: String, b: String): String = {
    val s = s"CAST(($a) + ($b) AS DOUBLE)"
    s"(-(CASE WHEN ($a) > 0 THEN (CAST(($a) AS DOUBLE)/$s)*ln(CAST(($a) AS DOUBLE)/$s) ELSE 0 END + " +
      s"CASE WHEN ($b) > 0 THEN (CAST(($b) AS DOUBLE)/$s)*ln(CAST(($b) AS DOUBLE)/$s) ELSE 0 END))"
  }

  /** Scored MultiPhraseQuery top-k: slot positions are the UNION of the
    * slot's alternatives' positions; weight sums the idfs of every
    * alternative of every slot (MultiPhraseWeight semantics).
    */
  def multiPhraseScoredSql(slot0: Seq[String], slot1: Seq[String],
                           k: Int): String = {
    val all = (slot0 ++ slot1).distinct
    val scoreExpr =
      "widf.w * ph.ptf / (ph.ptf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE))))"
    s"""WITH $tokCte, $dlCtes, pdf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN (${termList(all)}) GROUP BY term
       |), widf AS (
       |  SELECT sum(ln(1 + (st.n - pdf.df + 0.5) / (pdf.df + 0.5))) AS w
       |  FROM pdf CROSS JOIN st
       |), lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT DISTINCT doc_id, pos FROM tokpos
       |         WHERE term IN (${termList(slot0)})),
       |   b AS (SELECT DISTINCT doc_id, pos FROM tokpos
       |         WHERE term IN (${termList(slot1)})),
       |   ph AS (
       |  SELECT a.doc_id, count(*) AS ptf
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  GROUP BY a.doc_id
       |)
       |SELECT ph.doc_id,
       |  CAST(round($scoreExpr * 10000) AS BIGINT) AS score_q
       |FROM ph JOIN norm ON ph.doc_id = norm.doc_id CROSS JOIN widf CROSS JOIN st
       |ORDER BY $scoreExpr DESC, ph.doc_id ASC
       |LIMIT $k""".stripMargin
  }

  /** Scored ordered span-near top-k: span_tf (ordered anchors within
    * the gap budget) through the same phrase-weight BM25 shape.
    */
  def spanScoredSql(w1: String, w2: String, slop: Int, k: Int): String = {
    val scoreExpr =
      "widf.w * sp.stf / (sp.stf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE))))"
    s"""WITH $tokCte, $dlCtes, pdf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ('$w1', '$w2') GROUP BY term
       |), widf AS (
       |  SELECT sum(ln(1 + (st.n - pdf.df + 0.5) / (pdf.df + 0.5))) AS w
       |  FROM pdf CROSS JOIN st
       |), lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2'),
       |   anchors AS (
       |  SELECT a.doc_id, a.pos, min(b.pos) AS nb
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos > a.pos
       |  GROUP BY a.doc_id, a.pos
       |), sp AS (
       |  SELECT doc_id, count(*) AS stf FROM anchors
       |  WHERE nb - pos - 1 <= $slop GROUP BY doc_id
       |)
       |SELECT sp.doc_id,
       |  CAST(round($scoreExpr * 10000) AS BIGINT) AS score_q
       |FROM sp JOIN norm ON sp.doc_id = norm.doc_id CROSS JOIN widf CROSS JOIN st
       |ORDER BY $scoreExpr DESC, sp.doc_id ASC
       |LIMIT $k""".stripMargin
  }

  /** Rescoring: top-N of the first-pass disjunction re-ranked by
    * first + weight * second (second-pass score 0 when not matching).
    */
  def rescoreSql(firstTerms: Seq[String], secondTerms: Seq[String],
                 n: Int, k: Int, weight: Double): String = {
    val f = termList(firstTerms.distinct)
    val sTerms = termList(secondTerms.distinct)
    s"""WITH ${bm25Ctes(firstTerms ++ secondTerms)}, passes AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN term IN ($f) THEN s END) AS s1,
       |    sum(CASE WHEN term IN ($sTerms) THEN s END) AS s2
       |  FROM persc GROUP BY doc_id
       |), topn AS (
       |  SELECT doc_id, s1, s2 FROM passes WHERE s1 IS NOT NULL
       |  ORDER BY s1 DESC, doc_id ASC LIMIT $n
       |)
       |SELECT doc_id,
       |  CAST(round((s1 + $weight * coalesce(s2, 0)) * 10000) AS BIGINT) AS score_q
       |FROM topn
       |ORDER BY (s1 + $weight * coalesce(s2, 0)) DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** delete-then-search: disjunctive top-k with tombstoned docs
    * (doc_id % 7 == 3) excluded from RESULTS but not from STATS — the
    * reference's deleted-doc semantics before merge (docFreq/docCount
    * keep counting deleted docs until segments merge).
    */
  def bm25DeleteSql(terms: Seq[String], k: Int): String =
    s"""WITH ${bm25Ctes(terms)}
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc WHERE doc_id % 7 <> 3
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** Sloppy 2-term phrase: anchor positions of w1 with a w2 occurrence
    * within edit-distance slop (|(pos2 - 1) - pos1| <= slop — reversed
    * adjacent order needs slop 2, the reference's slop metric).
    */
  def phraseSlopSql(w1: String, w2: String, slop: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2')
       |SELECT a.doc_id, count(DISTINCT a.pos) AS phrase_tf
       |FROM a JOIN b ON b.doc_id = a.doc_id AND abs((b.pos - 1) - a.pos) <= $slop
       |GROUP BY a.doc_id""".stripMargin

  /** Shared-budget sloppy phrase, any arity (distinct terms): anchors of
    * slot 0 for which SOME per-slot occurrence selection has all
    * offset-adjusted positions within one window of width `slop`
    * (greatest − least of the adjusted positions <= slop) — the
    * reference SloppyPhraseMatcher's total edit-distance budget shared
    * across slots, not an independent ±slop window per slot.
    */
  def phraseSlopSharedSql(terms: Seq[String], slop: Int): String = {
    // the SQL has no distinct-occurrence constraint, so repeated terms
    // would diverge from the matcher's repeats rule — fail fast
    require(terms.distinct.size == terms.size,
      "phraseSlopSharedSql supports distinct terms only")
    val names = terms.indices.map(i => s"t$i")
    val ctes = terms.zip(names).map { case (w, n) =>
      s"$n AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w')"
    }.mkString(",\n   ")
    val joins = names.tail.map(n => s"JOIN $n ON $n.doc_id = t0.doc_id")
      .mkString(" ")
    val adj = names.zipWithIndex.map { case (n, i) =>
      if (i == 0) s"$n.pos" else s"$n.pos - $i"
    }
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), $ctes
       |SELECT t0.doc_id, count(DISTINCT t0.pos) AS phrase_tf
       |FROM t0 $joins
       |WHERE greatest(${adj.mkString(", ")}) - least(${adj.mkString(", ")}) <= $slop
       |GROUP BY t0.doc_id""".stripMargin
  }

  /** Unordered 2-term span-near: anchors of w1 with a w2 occurrence in
    * EITHER direction within width-minus-length slop
    * (|pos2 - pos1| - 1 <= slop).
    */
  def spanNearUnorderedSql(w1: String, w2: String, slop: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2')
       |SELECT a.doc_id, count(DISTINCT a.pos) AS span_tf
       |FROM a JOIN b ON b.doc_id = a.doc_id AND abs(b.pos - a.pos) - 1 <= $slop
       |GROUP BY a.doc_id""".stripMargin

  /** Ordered span near (anchor w1 → nearest following w2 within slop) —
    * the parameterized twin of the span_near_query oracle, reused by the
    * surround-parser entries.
    */
  def spanNearOrderedSql(w1: String, w2: String, slop: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2'),
       |anchors AS (
       |  SELECT a.doc_id, a.pos, min(b.pos) AS nb
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos > a.pos
       |  GROUP BY a.doc_id, a.pos)
       |SELECT doc_id, count(*) AS span_tf
       |FROM anchors WHERE nb - pos - 1 <= $slop GROUP BY doc_id""".stripMargin

  /** Result grouping with QUERY-defined groups (group.query=…): the
    * main query's ranked results restricted to each group query's doc
    * set, top `perGroup` per group.
    */
  def groupQuerySql(terms: Seq[String], groups: Seq[(String, String)],
                    perGroup: Int): String = {
    val gd = groups.map { case (t, g) =>
      s"SELECT '$g' AS grp, doc_id FROM (SELECT DISTINCT doc_id FROM tokf WHERE term = '$t')"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${bm25Ctes(terms)}, gd AS (
       |  $gd
       |)
       |SELECT gd.grp, sc.doc_id,
       |       CAST(round(sc.score * 10000) AS BIGINT) AS score_q
       |FROM sc JOIN gd USING (doc_id)
       |QUALIFY row_number() OVER (
       |  PARTITION BY gd.grp ORDER BY sc.score DESC, sc.doc_id ASC)
       |  <= $perGroup""".stripMargin
  }

  /** BooleanSimilarity top-k: score = Σ query boost per matched term —
    * no tf, no idf, no norms.
    */
  def booleanSimSql(boosts: Seq[(String, Double)], k: Int): String = {
    val qs = termList(boosts.map(_._1))
    val vals = boosts.map { case (t, b) => s"('$t', $b)" }.mkString(", ")
    s"""WITH $tokCte, m AS (
       |  SELECT DISTINCT doc_id, term FROM tokf WHERE term IN ($qs)
       |), b(term, boost) AS (VALUES $vals)
       |SELECT doc_id, CAST(round(sum(boost) * 10000) AS BIGINT) AS score_q
       |FROM m JOIN b USING (term) GROUP BY doc_id
       |ORDER BY sum(boost) DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** CoveringQuery: per-doc minimum-match threshold from the uniqueKey
    * docvalue (1 + doc_id % 3); score = sum of matching clause scores.
    * Ordered by the quantized score so both engines break ties the same
    * way inside a quantization bucket.
    */
  def coveringQuerySql(terms: Seq[String], k: Int): String =
    s"""WITH ${bm25Ctes(terms)}
       |SELECT doc_id, n_matched,
       |  CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc WHERE n_matched >= 1 + doc_id % 3
       |ORDER BY score_q DESC, doc_id ASC LIMIT $k""".stripMargin

  /** TopTermsScoringRewrite: expansion = the n highest-df dictionary
    * terms under the prefix (df desc, term asc — the reference's
    * priority-queue order made total), each scored as a TermQuery.
    */
  def wildcardScoredSql(prefix: String, n: Int, k: Int): String =
    s"""WITH $tokCte, $dlCtes, alldf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term LIKE '$prefix%' GROUP BY term
       |), exp AS (
       |  SELECT term, df FROM alldf ORDER BY df DESC, term ASC LIMIT $n
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN (SELECT term FROM exp) GROUP BY doc_id, term
       |), persc AS (
       |  SELECT tf.doc_id,
       |    ln(1 + (st.n - exp.df + 0.5) / (exp.df + 0.5))
       |      * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE)))) AS s
       |  FROM tf JOIN exp USING (term)
       |  JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st
       |), sc AS (SELECT doc_id, sum(s) AS score FROM persc GROUP BY doc_id)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** LMJelinekMercerSimilarity top-k (λ = Solr factory default 0.7):
    * ln(1 + ((1−λ)·tf/dl) / (λ·ctf/total)), dl lossy. The λ-products
    * are forced to DOUBLE so both engines run identical IEEE ops
    * (DuckDB would otherwise do DECIMAL×BIGINT exactly).
    */
  def lmJelinekMercerSql(terms: Seq[String], k: Int,
                         lambda: Double = 0.7): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, ctf AS (
       |  SELECT term, count(*) AS ctf FROM tokf
       |  WHERE term IN ($qs) GROUP BY term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), sc AS (
       |  SELECT tf.doc_id,
       |    sum(ln(1.0 + (${1.0 - lambda} * CAST(tf.tf AS DOUBLE)
       |                   / CAST(norm.ldl AS DOUBLE))
       |                 / ($lambda * CAST(ctf.ctf AS DOUBLE)
       |                   / CAST(st.sttf AS DOUBLE)))) AS score
       |  FROM tf JOIN ctf USING (term)
       |  JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st
       |  GROUP BY tf.doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** DFR I(n)·L·H2 (c = 1): tfn = tf·log2(1 + avgdl/dl);
    * score = tfn/(1+tfn) · log2((N+1)/(df+0.5)).
    */
  def dfrSql(terms: Seq[String], k: Int, c: Double = 1.0): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ($qs) GROUP BY term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), persc AS (
       |  SELECT tf.doc_id,
       |    CAST(tf.tf AS DOUBLE)
       |      * log2(1.0 + $c * (st.sttf / CAST(st.n AS DOUBLE))
       |                    / CAST(norm.ldl AS DOUBLE)) AS tfn,
       |    log2((st.n + 1.0) / (df.df + 0.5)) AS inf
       |  FROM tf JOIN df USING (term)
       |  JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st
       |), sc AS (
       |  SELECT doc_id, sum(tfn / (1.0 + tfn) * inf) AS score
       |  FROM persc GROUP BY doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** IB LL·DF·H2 (c = 1): tfn = tf·log2(1 + avgdl/dl);
    * λ = (df+1)/(N+1); score = ln((tfn + λ)/λ).
    */
  def ibLlSql(terms: Seq[String], k: Int, c: Double = 1.0): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ($qs) GROUP BY term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), persc AS (
       |  SELECT tf.doc_id,
       |    CAST(tf.tf AS DOUBLE)
       |      * log2(1.0 + $c * (st.sttf / CAST(st.n AS DOUBLE))
       |                    / CAST(norm.ldl AS DOUBLE)) AS tfn,
       |    (df.df + 1.0) / (st.n + 1.0) AS lam
       |  FROM tf JOIN df USING (term)
       |  JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st
       |), sc AS (
       |  SELECT doc_id, sum(ln((tfn + lam) / lam)) AS score
       |  FROM persc GROUP BY doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** Axiomatic F2EXP (s = 0.5, k = 0.35):
    * score = ((N+1)/df)^k · tf / (tf + s + s·dl/avgdl).
    */
  def axiomaticF2ExpSql(terms: Seq[String], k: Int,
                        s: Double = 0.5, kExp: Double = 0.35): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ($qs) GROUP BY term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), sc AS (
       |  SELECT tf.doc_id,
       |    sum(pow((st.n + 1.0) / df.df, $kExp)
       |        * CAST(tf.tf AS DOUBLE)
       |        / (CAST(tf.tf AS DOUBLE) + $s
       |           + $s * CAST(norm.ldl AS DOUBLE)
       |               / (st.sttf / CAST(st.n AS DOUBLE)))) AS score
       |  FROM tf JOIN df USING (term)
       |  JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st
       |  GROUP BY tf.doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** spanNear([spanOr(or-predicate), anchor], slop, ordered): the
    * or-side positions are the union (one term per position, so
    * DISTINCT suffices); the near walk is the two-term ordered rule.
    * `orPred` is a SQL predicate over `term` — an IN list for an
    * explicit SpanOrQuery, a LIKE prefix for SpanMultiTermQueryWrapper.
    */
  def spanOrNearSql(orPred: String, anchor: String, slop: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT DISTINCT doc_id, pos FROM tokpos WHERE $orPred),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$anchor'),
       |anchors AS (
       |  SELECT a.doc_id, a.pos, min(b.pos) AS nb
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos > a.pos
       |  GROUP BY a.doc_id, a.pos)
       |SELECT doc_id, count(*) AS span_tf
       |FROM anchors WHERE nb - pos - 1 <= $slop GROUP BY doc_id""".stripMargin

  /** LimitTokenCountFilter: dictionary of the corpus truncated to the
    * first `maxTokens` tokens per doc (stopwords count toward the
    * budget — the filter sits right after the tokenizer).
    */
  def limitTokenCountSql(maxTokens: Int): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents)
       |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ctf
       |FROM tok
       |WHERE pos <= $maxTokens AND length(term) > 0
       |  AND term NOT IN ($stopList)
       |GROUP BY term""".stripMargin

  /** PathHierarchyTokenizer: every ancestor prefix of the synthesized
    * /source/lang/bucket path is one token; df per prefix.
    */
  val pathHierarchySql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    '/' || source || '/' || lang || '/'
      |      || CAST(doc_id % 10 AS VARCHAR) AS p
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id,
      |    array_to_string(list_slice(string_split(p, '/'), 1, k), '/') AS path
      |  FROM p, LATERAL unnest(generate_series(2,
      |    len(string_split(p, '/')))) AS t(k))
      |SELECT path, count(*) AS df FROM toks GROUP BY path""".stripMargin

  /** UAX29URLEmailTokenizer twin: the same alternation regex (RE2 ∩
    * java.util.regex subset) over the synthesized contact lines, token
    * type from the same prefix/contains rules.
    */
  def urlEmailSql(pattern: String): String =
    s"""WITH lines AS (
       |  SELECT doc_id,
       |    'contact admin@' || source || '.example.com or see https://www.'
       |      || source || '.org/' || lang || ' for details' AS line
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(line, '$pattern')) AS token
       |  FROM lines)
       |SELECT token,
       |  CASE WHEN token LIKE 'http%' THEN 'URL'
       |       WHEN contains(token, '@') THEN 'EMAIL'
       |       ELSE 'ALPHANUM' END AS ttype,
       |  count(DISTINCT doc_id) AS df
       |FROM toks GROUP BY token, ttype""".stripMargin

  /** JSON facet sorted by a nested stat: top-3 langs by integer-grid
    * average n_chars.
    */
  val facetSortStatSql: String =
    """SELECT lang, count(*) AS n,
      |  CAST((sum(n_chars) * 10000) // count(*) AS BIGINT) AS avg_chars_q
      |FROM documents GROUP BY lang
      |ORDER BY avg_chars_q DESC, lang ASC LIMIT 3""".stripMargin

  /** Blended-freq fuzzy scoring rewrite: expansion + per-term edit
    * distance in SQL (DuckDB levenshtein = the unit-cost algorithm the
    * dictionary rewrite uses), boost 1 − ed/min(|term|, |query|),
    * docFreq blended to the expansion max.
    */
  def fuzzyScoredSql(query: String, maxEdits: Int, k: Int): String =
    s"""WITH $tokCte, $dlCtes, dfm AS (
       |  SELECT term, count(DISTINCT doc_id) AS df,
       |    levenshtein(term, '$query') AS ed
       |  FROM tokf GROUP BY term
       |), exp AS (
       |  SELECT term, df, ed FROM dfm WHERE ed <= $maxEdits
       |  QUALIFY row_number() OVER (ORDER BY
       |    1.0 - CAST(ed AS DOUBLE)
       |      / CAST(least(length(term), ${query.length}) AS DOUBLE) DESC,
       |    term ASC) <= ${graft.search.MoreQueries.FuzzyMaxExpansions}),
       |bl AS (SELECT max(df) AS dfb FROM exp),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN (SELECT term FROM exp) GROUP BY doc_id, term
       |), persc AS (
       |  SELECT tf.doc_id,
       |    (1.0 - CAST(exp.ed AS DOUBLE)
       |        / CAST(least(length(exp.term), ${query.length}) AS DOUBLE))
       |      * ln(1 + (st.n - bl.dfb + 0.5) / (bl.dfb + 0.5))
       |      * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE)))) AS s
       |  FROM tf JOIN exp USING (term)
       |  JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st CROSS JOIN bl
       |), sc AS (SELECT doc_id, sum(s) AS score FROM persc GROUP BY doc_id)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** SpanPositionRangeQuery: single-term spans with start ≥ a and
    * end ≤ b — raw 1-based positions in [a+1, b].
    */
  def spanPositionRangeSql(term: String, start: Int, end: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists)
       |SELECT doc_id, CAST(count(*) AS INT) AS span_tf FROM tokpos
       |WHERE term = '$term' AND pos >= ${start + 1} AND pos <= $end
       |GROUP BY doc_id""".stripMargin

  /** BlendedInfixSuggester: bigram suggestions with the position-linear
    * weight discount on the integer grid.
    */
  def suggestBlendedSql(fragment: String, k: Int): String =
    s"""WITH base AS ($shingleDfSql),
       |posed AS (
       |  SELECT shingle AS suggestion, ctf AS weight,
       |    CASE WHEN contains(string_split(shingle, ' ')[1], '$fragment') THEN 0
       |         WHEN contains(string_split(shingle, ' ')[2], '$fragment') THEN 1
       |         ELSE -1 END AS pos
       |  FROM base)
       |SELECT suggestion, CAST(weight AS BIGINT) AS weight,
       |  CAST(pos AS BIGINT) AS pos,
       |  CAST((weight * (10 - pos)) // 10 AS BIGINT) AS blended_q
       |FROM posed WHERE pos >= 0
       |ORDER BY blended_q DESC, suggestion ASC LIMIT $k""".stripMargin

  /** Point-in-polygon (even-odd ray cast) over the synthetic
    * key-derived coordinates — identical IEEE expression shape to the
    * engine's per-edge crossing test so the doubles agree bit-for-bit.
    */
  private def edgeValues(verts: Seq[(Int, Int)]): String =
    verts.indices.map { i =>
      val (y1, x1) = verts(i)
      val (y2, x2) = verts((i + 1) % verts.length)
      s"($y1, $x1, $y2, $x2)"
    }.mkString(", ")

  def geoPolygonSql(verts: Seq[(Int, Int)]): String =
    s"""WITH pts AS (
       |  SELECT c_custkey,
       |    CAST((c_custkey % 180) - 90 AS DOUBLE) + 0.5 AS lat,
       |    CAST(((c_custkey * 7) % 360) - 180 AS DOUBLE) + 0.5 AS lon
       |  FROM customer
       |), edges(y1, x1, y2, x2) AS (VALUES ${edgeValues(verts)})
       |SELECT c_custkey FROM pts
       |WHERE (SELECT count(*) FROM edges e
       |       WHERE ((e.y1 > pts.lat) <> (e.y2 > pts.lat))
       |         AND pts.lon < (e.x2 - e.x1) * (pts.lat - e.y1)
       |                       / (e.y2 - e.y1) + e.x1) % 2 = 1""".stripMargin

  /** Polygon-with-holes replay: inside the outer ring (odd crossings)
    * and NOT inside the hole ring (even crossings), both counts the
    * same IEEE expression shape as [[geoPolygonSql]].
    */
  def geoPolygonHolesSql(outer: Seq[(Int, Int)],
                         hole: Seq[(Int, Int)]): String =
    s"""WITH pts AS (
       |  SELECT c_custkey,
       |    CAST((c_custkey % 180) - 90 AS DOUBLE) + 0.5 AS lat,
       |    CAST(((c_custkey * 7) % 360) - 180 AS DOUBLE) + 0.5 AS lon
       |  FROM customer
       |), oe(y1, x1, y2, x2) AS (VALUES ${edgeValues(outer)}),
       |he(y1, x1, y2, x2) AS (VALUES ${edgeValues(hole)})
       |SELECT c_custkey FROM pts
       |WHERE (SELECT count(*) FROM oe e
       |       WHERE ((e.y1 > pts.lat) <> (e.y2 > pts.lat))
       |         AND pts.lon < (e.x2 - e.x1) * (pts.lat - e.y1)
       |                       / (e.y2 - e.y1) + e.x1) % 2 = 1
       |  AND (SELECT count(*) FROM he e
       |       WHERE ((e.y1 > pts.lat) <> (e.y2 > pts.lat))
       |         AND pts.lon < (e.x2 - e.x1) * (pts.lat - e.y1)
       |                       / (e.y2 - e.y1) + e.x1) % 2 = 0""".stripMargin

  /** Context-filtered prefix suggester: context-df-weighted dictionary
    * terms under a prefix, context = a stored-field predicate.
    */
  def suggestContextSql(prefix: String, lang: String, k: Int): String =
    s"""WITH $tokCte, m AS (
       |  SELECT DISTINCT t.doc_id, t.term
       |  FROM tokf t JOIN documents d USING (doc_id)
       |  WHERE d.lang = '$lang' AND t.term LIKE '$prefix%'
       |)
       |SELECT term, count(*) AS weight FROM m GROUP BY term
       |ORDER BY weight DESC, term ASC LIMIT $k""".stripMargin

  /** Per-lang-bucket exact median (JSON facet percentile agg),
    * quantized like every float output (driver-contract rule).
    */
  val facetPercentileSql: String =
    """SELECT lang,
      |       CAST(round(quantile_cont(n_chars, 0.5) * 10000) AS BIGINT)
      |         AS p50_chars_q,
      |       count(*) AS n
      |FROM documents GROUP BY lang""".stripMargin

  /** More-like-this: seed doc's top-m terms by tf(seed) x idf, then the
    * BM25 disjunction over them, seed excluded.
    */
  def moreLikeThisSql(seed: Long, m: Int, k: Int): String =
    s"""WITH $tokCte, $dlCtes, seedtf AS (
       |  SELECT term, count(*) AS tf FROM tokf WHERE doc_id = $seed GROUP BY term
       |), alldf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf GROUP BY term
       |), mlt AS (
       |  SELECT s.term,
       |    s.tf * ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5)) AS w
       |  FROM seedtf s JOIN alldf d USING (term) CROSS JOIN st
       |  ORDER BY w DESC, s.term ASC LIMIT $m
       |), tf2 AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN (SELECT term FROM mlt) GROUP BY doc_id, term
       |), persc2 AS (
       |  SELECT tf2.doc_id,
       |    ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5))
       |      * tf2.tf / (tf2.tf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE)))) AS s
       |  FROM tf2 JOIN alldf d USING (term)
       |  JOIN norm ON tf2.doc_id = norm.doc_id CROSS JOIN st
       |), sc2 AS (
       |  SELECT doc_id, sum(s) AS score FROM persc2 GROUP BY doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc2 WHERE doc_id <> $seed
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** Nested compiled query (the `query_compile_nested` entry):
    * must=[spark], should=[bool(merge OR join), boost(scan, 2.0)],
    * mustNot=[dup], filter=[prefix 'sl'] — score = s(spark) +
    * s(merge) + s(join) + 2*s(scan) over docs passing the clauses.
    */
  def queryCompileNestedSql: String =
    s"""WITH ${bm25Ctes(Seq("spark", "merge", "join", "scan"))}, agg AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN term = 'scan' THEN 2.0 * s ELSE s END) AS total,
       |    count(*) FILTER (WHERE term = 'spark') AS n_must
       |  FROM persc GROUP BY doc_id
       |)
       |SELECT doc_id, CAST(round(total * 10000) AS BIGINT) AS score_q
       |FROM agg
       |WHERE n_must > 0
       |  AND doc_id NOT IN (SELECT DISTINCT doc_id FROM tokf WHERE term = 'dup')
       |  AND doc_id IN (SELECT DISTINCT doc_id FROM tokf WHERE term LIKE 'sl%')
       |ORDER BY total DESC, doc_id ASC LIMIT 10""".stripMargin

  /** Oracle of the PARSED `spark AND (join OR merge) -dup scan^2 sl*`:
    * required spark, required (join|merge) group, prohibited dup,
    * optional boosted scan, optional const-score-1.0 prefix clause —
    * the clause-occur outcome QueryParserSpec pins at the AST level.
    */
  def qparseLuceneSql(k: Int): String =
    s"""WITH ${bm25Ctes(Seq("spark", "merge", "join", "scan"))}, agg AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN term = 'scan' THEN 2.0 * s ELSE s END) AS total,
       |    count(*) FILTER (WHERE term = 'spark') AS n_spark,
       |    count(*) FILTER (WHERE term IN ('join', 'merge')) AS n_grp
       |  FROM persc GROUP BY doc_id
       |), wc AS (SELECT DISTINCT doc_id FROM tokf WHERE term LIKE 'sl%'),
       |fin AS (
       |  SELECT agg.doc_id,
       |    total + CASE WHEN wc.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END AS sc
       |  FROM agg LEFT JOIN wc ON agg.doc_id = wc.doc_id
       |  WHERE n_spark > 0 AND n_grp > 0
       |    AND agg.doc_id NOT IN (SELECT DISTINCT doc_id FROM tokf WHERE term = 'dup')
       |)
       |SELECT doc_id, CAST(round(sc * 10000) AS BIGINT) AS score_q
       |FROM fin ORDER BY sc DESC, doc_id ASC LIMIT $k""".stripMargin

  /** The fixed 31-word corpus vocabulary (FIXTURES.md §1 — identical at
    * every scale factor; verified sf0.001/0.01/0.1). Lets dictionary-
    * level oracles (Porter) enumerate the vocabulary statically.
    */
  val CorpusVocab: Seq[String] = Seq("a", "agg", "batch", "big", "column",
    "customer", "data", "dup", "fast", "filter", "group", "hash", "join",
    "key", "line", "merge", "order", "part", "query", "row", "scan",
    "slow", "small", "sort", "spark", "stream", "table", "the", "value",
    "vector", "window")

  /** Porter-stemmed dictionary stats. The (term, stem) map is inline
    * VALUES generated from [[graft.analysis.Porter.stem]] (single source
    * of truth — the algorithm itself is pinned by PorterSpec's published
    * known-answer vectors); tokenization, stop filtering, df/ctf
    * counting are DuckDB's own. A corpus term missing from the map
    * would drop from the join and mismatch loudly.
    */
  def porterStemDfSql: String = {
    val pairs = CorpusVocab
      .map(w => s"('$w', '${graft.analysis.Porter.stem(w)}')")
      .mkString(", ")
    s"""WITH $tokCte, sm(term, stem) AS (VALUES $pairs)
       |SELECT sm.stem, count(DISTINCT doc_id) AS df, count(*) AS ctf
       |FROM tokf JOIN sm USING (term) GROUP BY 1""".stripMargin
  }

  /** Atomic multivalued add / add-distinct / remove replay: the three
    * generations as successive CTE rewrites of the [source, lang] tags
    * list — list_append / list_contains guard / list_filter are the
    * modifier algebra; generation membership from the tokenized corpus
    * (same docs the engine selects via decoded postings).
    */
  def atomicAddRemoveSql(addT: String, disT: String, remT: String): String =
    s"""WITH $tokCte, m AS (
       |  SELECT doc_id,
       |    max(CASE WHEN term = '$addT' THEN 1 ELSE 0 END) AS f_add,
       |    max(CASE WHEN term = '$disT' THEN 1 ELSE 0 END) AS f_dis,
       |    max(CASE WHEN term = '$remT' THEN 1 ELSE 0 END) AS f_rem
       |  FROM tokf WHERE term IN ('$addT', '$disT', '$remT')
       |  GROUP BY doc_id
       |), j AS (
       |  SELECT d.doc_id, d.source, d.lang,
       |    coalesce(m.f_add, 0) AS f_add, coalesce(m.f_dis, 0) AS f_dis,
       |    coalesce(m.f_rem, 0) AS f_rem
       |  FROM documents d LEFT JOIN m USING (doc_id)
       |), t1 AS (
       |  SELECT doc_id, lang, f_dis, f_rem,
       |    CASE WHEN f_add = 1 THEN [source, lang, 'hot']
       |         ELSE [source, lang] END AS tags FROM j
       |), t2 AS (
       |  SELECT doc_id, lang, f_rem,
       |    CASE WHEN f_dis = 1 AND NOT list_contains(tags, 'hot')
       |         THEN list_append(tags, 'hot') ELSE tags END AS tags FROM t1
       |), t3 AS (
       |  SELECT doc_id,
       |    CASE WHEN f_rem = 1 THEN list_filter(tags, x -> x <> lang)
       |         ELSE tags END AS tags FROM t2
       |)
       |SELECT doc_id, len(tags) AS n_tags,
       |  array_to_string(tags, ' ') AS tags_str FROM t3""".stripMargin

  /** Simple-parser entry replay for `spark + (join | merge) -dup sl*`:
    * the AND-group scores (spark + matching of join/merge) only when
    * BOTH sides match, the prefix adds constant 1, at least one SHOULD
    * side must match, dup docs are prohibited — the left-assoc fold's
    * Bool(should=[must-group, prefix], mustNot=[dup]) semantics.
    */
  def qparseSimpleSql(k: Int): String =
    s"""WITH ${bm25Ctes(Seq("spark", "join", "merge"))}, agg AS (
       |  SELECT doc_id, sum(s) AS total,
       |    count(*) FILTER (WHERE term = 'spark') AS n_spark,
       |    count(*) FILTER (WHERE term IN ('join', 'merge')) AS n_grp
       |  FROM persc GROUP BY doc_id
       |), wc AS (SELECT DISTINCT doc_id FROM tokf WHERE term LIKE 'sl%'),
       |uni AS (
       |  SELECT coalesce(a.doc_id, w.doc_id) AS doc_id,
       |    CASE WHEN a.doc_id IS NOT NULL AND a.n_spark > 0 AND a.n_grp > 0
       |         THEN a.total ELSE 0.0 END
       |      + CASE WHEN w.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END AS sc,
       |    CASE WHEN a.doc_id IS NOT NULL AND a.n_spark > 0 AND a.n_grp > 0
       |         THEN 1 ELSE 0 END
       |      + CASE WHEN w.doc_id IS NOT NULL THEN 1 ELSE 0 END AS n_sh
       |  FROM agg a FULL OUTER JOIN wc w ON a.doc_id = w.doc_id
       |)
       |SELECT doc_id, CAST(round(sc * 10000) AS BIGINT) AS score_q
       |FROM uni WHERE n_sh >= 1
       |  AND doc_id NOT IN (SELECT DISTINCT doc_id FROM tokf WHERE term = 'dup')
       |ORDER BY sc DESC, doc_id ASC LIMIT $k""".stripMargin

  /** `/analysis/field` stage oracle: the per-stage token streams are an
    * inline VALUES map generated from
    * [[graft.operators.AnalysisOps.fieldStages]] (single source of
    * truth — the chain pieces are pinned by AnalyzerSpec/PorterSpec);
    * DuckDB independently computes the DISTINCT raw vocabulary and
    * joins. A corpus token missing from the map drops from the join
    * and mismatches loudly.
    */
  def analysisStagesSql: String = {
    val rows = CorpusVocab.flatMap { w =>
      graft.operators.AnalysisOps.fieldStages(w).map {
        case (o, st, tok) => s"('$w', $o, '$st', '$tok')"
      }
    }.mkString(", ")
    s"""WITH raw AS (
       |  SELECT DISTINCT term FROM (
       |    SELECT unnest(string_split(text, ' ')) AS term FROM documents
       |  ) WHERE length(term) > 0
       |), st(term, stage_ord, stage, token) AS (VALUES $rows)
       |SELECT st.term, st.stage_ord, st.stage, st.token
       |FROM raw JOIN st ON raw.term = st.term""".stripMargin
  }

  /** Snowball English (Porter2) twin of [[porterStemDfSql]]; the map
    * derives from [[graft.analysis.Porter2.stem]], pinned by
    * Porter2Spec's known-answer vectors.
    */
  def porter2StemDfSql: String = {
    val pairs = CorpusVocab
      .map(w => s"('$w', '${graft.analysis.Porter2.stem(w)}')")
      .mkString(", ")
    s"""WITH $tokCte, sm(term, stem) AS (VALUES $pairs)
       |SELECT sm.stem, count(DISTINCT doc_id) AS df, count(*) AS ctf
       |FROM tokf JOIN sm USING (term) GROUP BY 1""".stripMargin
  }

  /** Passage-scored highlighting oracle: BM25 top-k docs, candidate
    * `window`-token passages anchored at match positions, score =
    * distinct terms × 1000 + occurrences, leftmost best passage per doc.
    */
  def highlightPassagesSql(terms: Seq[String], k: Int, window: Int): String = {
    val qs = termList(terms.distinct)
    s"""WITH ${bm25Ctes(terms)}, top AS (
       |  SELECT doc_id FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k
       |), lists AS (
       |  SELECT d.doc_id, string_split(d.text, ' ') AS l
       |  FROM documents d JOIN top USING (doc_id)
       |), mm AS (
       |  SELECT doc_id, term, pos FROM (
       |    SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |    FROM lists) WHERE term IN ($qs)
       |), wins AS (
       |  SELECT a.doc_id, a.pos AS anchor,
       |    count(DISTINCT b.term) * 1000 + count(*) AS p_score
       |  FROM mm a JOIN mm b ON a.doc_id = b.doc_id
       |    AND b.pos >= a.pos AND b.pos < a.pos + $window
       |  GROUP BY a.doc_id, a.pos
       |), best AS (
       |  SELECT doc_id, anchor, p_score, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY p_score DESC, anchor ASC) AS rn
       |  FROM wins
       |)
       |SELECT l.doc_id,
       |  array_to_string(l.l[b.anchor:b.anchor + $window - 1], ' ') AS passage,
       |  CAST(b.p_score AS BIGINT) AS p_score
       |FROM best b JOIN lists l ON b.doc_id = l.doc_id WHERE rn = 1""".stripMargin
  }

  /** Multi-term-query highlighting oracle: prefix-expanded anchors over
    * the first-k constant-score docs (docID order), same window scoring
    * as [[highlightPassagesSql]]. The prefix predicate replays the
    * dictionary rewrite (stop-filtered like the index dictionary).
    */
  def highlightMultiTermSql(prefix: String, k: Int, window: Int): String =
    s"""WITH lists0 AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tp AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists0
       |), m0 AS (
       |  SELECT doc_id, term, pos FROM tp
       |  WHERE term LIKE '$prefix%' AND term NOT IN ($stopList)
       |), top AS (
       |  SELECT DISTINCT doc_id FROM m0 ORDER BY doc_id ASC LIMIT $k
       |), lists AS (
       |  SELECT l0.doc_id, l0.l FROM lists0 l0 JOIN top USING (doc_id)
       |), mm AS (
       |  SELECT m0.doc_id, m0.term, m0.pos FROM m0 JOIN top USING (doc_id)
       |), wins AS (
       |  SELECT a.doc_id, a.pos AS anchor,
       |    count(DISTINCT b.term) * 1000 + count(*) AS p_score
       |  FROM mm a JOIN mm b ON a.doc_id = b.doc_id
       |    AND b.pos >= a.pos AND b.pos < a.pos + $window
       |  GROUP BY a.doc_id, a.pos
       |), best AS (
       |  SELECT doc_id, anchor, p_score, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY p_score DESC, anchor ASC) AS rn
       |  FROM wins
       |)
       |SELECT l.doc_id,
       |  array_to_string(l.l[b.anchor:b.anchor + $window - 1], ' ') AS passage,
       |  CAST(b.p_score AS BIGINT) AS p_score
       |FROM best b JOIN lists l ON b.doc_id = l.doc_id WHERE rn = 1""".stripMargin

  /** hl.snippets = 2: the two best non-overlapping passages per top-k
    * doc — passage 1 = the [[highlightPassagesSql]] winner, passage 2 =
    * the best candidate at |anchor₂ − anchor₁| ≥ window, NULL when no
    * disjoint candidate exists.
    */
  def highlightSnippetsSql(terms: Seq[String], k: Int, window: Int): String = {
    val qs = termList(terms.distinct)
    s"""WITH ${bm25Ctes(terms)}, top AS (
       |  SELECT doc_id FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k
       |), lists AS (
       |  SELECT d.doc_id, string_split(d.text, ' ') AS l
       |  FROM documents d JOIN top USING (doc_id)
       |), mm AS (
       |  SELECT doc_id, term, pos FROM (
       |    SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |    FROM lists) WHERE term IN ($qs)
       |), wins AS (
       |  SELECT a.doc_id, a.pos AS anchor,
       |    count(DISTINCT b.term) * 1000 + count(*) AS p_score
       |  FROM mm a JOIN mm b ON a.doc_id = b.doc_id
       |    AND b.pos >= a.pos AND b.pos < a.pos + $window
       |  GROUP BY a.doc_id, a.pos
       |), b1 AS (
       |  SELECT doc_id, anchor, p_score FROM wins
       |  QUALIFY row_number() OVER (
       |    PARTITION BY doc_id ORDER BY p_score DESC, anchor ASC) = 1
       |), b2 AS (
       |  SELECT w.doc_id, w.anchor, w.p_score
       |  FROM wins w JOIN b1 ON w.doc_id = b1.doc_id
       |    AND abs(w.anchor - b1.anchor) >= $window
       |  QUALIFY row_number() OVER (
       |    PARTITION BY w.doc_id ORDER BY w.p_score DESC, w.anchor ASC) = 1
       |)
       |SELECT l.doc_id,
       |  array_to_string(l.l[b1.anchor:b1.anchor + $window - 1], ' ') AS passage1,
       |  CAST(b1.p_score AS BIGINT) AS p1_score,
       |  array_to_string(l.l[b2.anchor:b2.anchor + $window - 1], ' ') AS passage2,
       |  CAST(b2.p_score AS BIGINT) AS p2_score
       |FROM b1 JOIN lists l ON b1.doc_id = l.doc_id
       |LEFT JOIN b2 ON b2.doc_id = b1.doc_id""".stripMargin
  }

  /** DoubleMetaphone primary-code codebook stats — same single-source
    * VALUES-map pattern as [[porterStemDfSql]].
    */
  def dmetaphoneSql: String = {
    val pairs = CorpusVocab
      .map(w => s"('$w', '${graft.analysis.DoubleMetaphone.primary(w)}')")
      .mkString(", ")
    s"""WITH $tokCte, dm(term, code) AS (VALUES $pairs)
       |SELECT dm.code, count(DISTINCT term) AS n_terms,
       |  count(*) AS ctf
       |FROM tokf JOIN dm USING (term) GROUP BY 1""".stripMargin
  }

  /** FuzzyQuery with transpositions: single-source (term, OSA distance)
    * VALUES map generated from the engine's own distance function
    * (pinned by known-answer vectors in its spec); DuckDB does the doc
    * matching independently.
    */
  def fuzzyTransposeSql(query: String, maxEdits: Int): String = {
    val pairs = CorpusVocab
      .map(w => s"('$w', ${graft.search.MoreQueries.dlDistance(w, query)})")
      .mkString(", ")
    s"""WITH $tokCte, ed(term, d) AS (VALUES $pairs)
       |SELECT DISTINCT doc_id FROM tokf JOIN ed USING (term)
       |WHERE ed.d <= $maxEdits""".stripMargin
  }

  /** JSON facet relatedness() — per-bucket SKG z-score replay. */
  def facetRelatednessSql(fgTerm: String): String =
    s"""WITH $tokCte, fg AS (
       |  SELECT DISTINCT doc_id FROM tokf WHERE term = '$fgTerm'
       |), st2 AS (
       |  SELECT (SELECT count(*) FROM documents) AS bgn,
       |         (SELECT count(*) FROM fg) AS fgn
       |), agg AS (
       |  SELECT d.source, count(*) AS bg_count, count(fg.doc_id) AS fg_count
       |  FROM documents d LEFT JOIN fg ON d.doc_id = fg.doc_id GROUP BY 1
       |)
       |SELECT source, CAST(fg_count AS BIGINT) AS fg_count,
       |  CAST(bg_count AS BIGINT) AS bg_count,
       |  CAST(round((fg_count - fgn * (bg_count / CAST(bgn AS DOUBLE)))
       |    / sqrt(fgn * (bg_count / CAST(bgn AS DOUBLE))
       |           * (1 - bg_count / CAST(bgn AS DOUBLE))) * 10000)
       |    AS BIGINT) AS relatedness_q
       |FROM agg CROSS JOIN st2""".stripMargin

  /** IndexOrDocValuesQuery: conjunction docs + the per-segment lead
    * decision replayed from the same per-side segment counts.
    */
  def indexOrDocValuesSql(term: String, lo: Long, hi: Long,
                          segSize: Long): String =
    s"""WITH $tokCte, t AS (
       |  SELECT DISTINCT doc_id FROM tokf WHERE term = '$term'
       |), r AS (
       |  SELECT doc_id FROM documents WHERE n_chars BETWEEN $lo AND $hi
       |), tc AS (SELECT doc_id // $segSize AS sid, count(*) AS c FROM t GROUP BY 1),
       |rc AS (SELECT doc_id // $segSize AS sid, count(*) AS c FROM r GROUP BY 1),
       |m AS (SELECT t.doc_id FROM t JOIN r USING (doc_id))
       |SELECT m.doc_id, m.doc_id // $segSize AS segment_id,
       |  CASE WHEN COALESCE(tc.c, 0) <= COALESCE(rc.c, 0)
       |       THEN 'terms' ELSE 'docvalues' END AS lead
       |FROM m LEFT JOIN tc ON tc.sid = m.doc_id // $segSize
       |LEFT JOIN rc ON rc.sid = m.doc_id // $segSize""".stripMargin

  /** Constant-score doc set for a term-dictionary predicate. */
  def docsWithTermWhereSql(termPred: String): String =
    s"""WITH $tokCte
       |SELECT DISTINCT doc_id FROM tokf WHERE $termPred""".stripMargin

  /** Cross-field DisMax over (title = first 4 tokens, body): per-field
    * BM25 with the FIELD's docCount/avgdl/df, combined PER TERM across
    * fields as max + tie * (sum - max), then summed over terms — the
    * Solr DisMaxQParser shape (one DisjunctionMaxQuery per query term).
    */
  /** Shared CTE chain of the cross-field dismax oracles: raw tokens
    * with positions (btok), the two field streams, per-field dl/norm/
    * stats/df/tf, per-(doc, field, term) scores and the per-doc dismax
    * total — ends in `agg(doc_id, total)`. Composed by
    * [[multifieldDismaxSql]] and [[edismaxPfSql]] so the field model
    * can never drift between them.
    */
  private def multifieldCtes(qs: String, tie: Double,
                             titleBoost: Double): String = {
    val w = s"CASE ftf.field WHEN 'title' THEN $titleBoost ELSE 1.0 END"
    s"""btok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents
       |), toks AS (
       |  SELECT doc_id, 'body' AS field, term FROM btok
       |  WHERE length(term) > 0 AND term NOT IN ($stopList)
       |  UNION ALL
       |  SELECT doc_id, 'title' AS field, term FROM btok
       |  WHERE pos <= 4 AND length(term) > 0 AND term NOT IN ($stopList)
       |), fdl AS (
       |  SELECT doc_id, field, count(*) AS dl FROM toks GROUP BY doc_id, field
       |), fnorm AS (
       |  SELECT doc_id, field, dl,
       |    (SELECT max(v) FROM (VALUES $normValues) AS nv(v) WHERE nv.v <= fdl.dl) AS ldl
       |  FROM fdl
       |), fst AS (
       |  SELECT field, count(*) AS n, sum(dl) AS sttf FROM fdl GROUP BY field
       |), fdf AS (
       |  SELECT field, term, count(DISTINCT doc_id) AS df FROM toks
       |  WHERE term IN ($qs) GROUP BY field, term
       |), ftf AS (
       |  SELECT doc_id, field, term, count(*) AS tf FROM toks
       |  WHERE term IN ($qs) GROUP BY doc_id, field, term
       |), fsc AS (
       |  SELECT ftf.doc_id, ftf.field, ftf.term,
       |    $w * ln(1 + (fst.n - fdf.df + 0.5) / (fdf.df + 0.5))
       |      * ftf.tf / (ftf.tf + 1.2 * (1 - 0.75 + 0.75 * fnorm.ldl / (fst.sttf / CAST(fst.n AS DOUBLE)))) AS s
       |  FROM ftf
       |  JOIN fdf ON ftf.field = fdf.field AND ftf.term = fdf.term
       |  JOIN fnorm ON ftf.doc_id = fnorm.doc_id AND ftf.field = fnorm.field
       |  JOIN fst ON fst.field = ftf.field
       |), pt AS (
       |  SELECT doc_id, term, max(s) AS mx, sum(s) AS sm
       |  FROM fsc GROUP BY doc_id, term
       |), agg AS (
       |  SELECT doc_id, sum(mx + $tie * (sm - mx)) AS total
       |  FROM pt GROUP BY doc_id
       |)""".stripMargin
  }

  def multifieldDismaxSql(terms: Seq[String], tie: Double, k: Int,
                          titleBoost: Double = 1.0): String = {
    val qs = termList(terms.distinct)
    s"""WITH ${multifieldCtes(qs, tie, titleBoost)}
       |SELECT doc_id,
       |  CAST(round(total * 10000) AS BIGINT) AS score_q
       |FROM agg ORDER BY total DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** CombinedFieldQuery (simple BM25F): per-term tf' = Σ w_f·tf_f,
    * len' = norm-codec re-encode of Σ w_f·len_f, df' = max_f df_f,
    * sttf' = Σ w_f·sttf_f, N' = max_f N_f — then plain BM25. Field
    * streams identical to the dismax oracles (title = first 4 raw
    * tokens, stop filter after).
    */
  def combinedFieldSql(terms: Seq[String], k: Int,
                       titleBoost: Double): String = {
    val qs = termList(terms.distinct)
    val w = s"CASE field WHEN 'title' THEN $titleBoost ELSE 1.0 END"
    s"""WITH btok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents
       |), toks AS (
       |  SELECT doc_id, 'body' AS field, term FROM btok
       |  WHERE length(term) > 0 AND term NOT IN ($stopList)
       |  UNION ALL
       |  SELECT doc_id, 'title' AS field, term FROM btok
       |  WHERE pos <= 4 AND length(term) > 0 AND term NOT IN ($stopList)
       |), fdl AS (
       |  SELECT doc_id, field, count(*) AS dl FROM toks GROUP BY doc_id, field
       |), fnorm AS (
       |  SELECT doc_id, field, dl,
       |    (SELECT max(v) FROM (VALUES $normValues) AS nv(v) WHERE nv.v <= fdl.dl) AS ldl
       |  FROM fdl
       |), fst AS (
       |  SELECT field, count(*) AS n, sum(dl) AS sttf FROM fdl GROUP BY field
       |), cst AS (
       |  SELECT max(n) AS n, sum($w * sttf) AS sttf FROM fst
       |), fdf AS (
       |  SELECT field, term, count(DISTINCT doc_id) AS df FROM toks
       |  WHERE term IN ($qs) GROUP BY field, term
       |), cdf AS (
       |  SELECT term, max(df) AS df FROM fdf GROUP BY term
       |), clen AS (
       |  SELECT doc_id, CAST(round(sum($w * ldl)) AS BIGINT) AS wl
       |  FROM fnorm GROUP BY doc_id
       |), clenq AS (
       |  SELECT doc_id,
       |    (SELECT max(v) FROM (VALUES $normValues) AS nv(v) WHERE nv.v <= clen.wl) AS cl
       |  FROM clen
       |), ftf AS (
       |  SELECT doc_id, field, term, count(*) AS tf FROM toks
       |  WHERE term IN ($qs) GROUP BY doc_id, field, term
       |), ctf2 AS (
       |  SELECT doc_id, term, sum($w * tf) AS tfc FROM ftf
       |  GROUP BY doc_id, term
       |), sc AS (
       |  SELECT c.doc_id,
       |    sum(ln(1 + (cst.n - cdf.df + 0.5) / (cdf.df + 0.5))
       |      * c.tfc / (c.tfc + 1.2 * (1 - 0.75
       |          + 0.75 * clenq.cl / (cst.sttf / CAST(cst.n AS DOUBLE))))) AS score
       |  FROM ctf2 c JOIN cdf USING (term)
       |  JOIN clenq ON c.doc_id = clenq.doc_id CROSS JOIN cst
       |  GROUP BY c.doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** Per-field similarity mixing: title scored by BM25 with the title
    * field's stats, body by LMDirichlet (μ, body ctf/sttf), dismax
    * combined per term — field streams as in [[combinedFieldSql]].
    */
  def mixedSimSql(terms: Seq[String], tie: Double, mu: Double,
                  k: Int): String = {
    val qs = termList(terms.distinct)
    s"""WITH btok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents
       |), toks AS (
       |  SELECT doc_id, 'body' AS field, term FROM btok
       |  WHERE length(term) > 0 AND term NOT IN ($stopList)
       |  UNION ALL
       |  SELECT doc_id, 'title' AS field, term FROM btok
       |  WHERE pos <= 4 AND length(term) > 0 AND term NOT IN ($stopList)
       |), fdl AS (
       |  SELECT doc_id, field, count(*) AS dl FROM toks GROUP BY doc_id, field
       |), fnorm AS (
       |  SELECT doc_id, field, dl,
       |    (SELECT max(v) FROM (VALUES $normValues) AS nv(v) WHERE nv.v <= fdl.dl) AS ldl
       |  FROM fdl
       |), fst AS (
       |  SELECT field, count(*) AS n, sum(dl) AS sttf FROM fdl GROUP BY field
       |), fdf AS (
       |  SELECT field, term, count(DISTINCT doc_id) AS df FROM toks
       |  WHERE term IN ($qs) GROUP BY field, term
       |), fctf AS (
       |  SELECT field, term, count(*) AS ctf FROM toks
       |  WHERE term IN ($qs) GROUP BY field, term
       |), ftf AS (
       |  SELECT doc_id, field, term, count(*) AS tf FROM toks
       |  WHERE term IN ($qs) GROUP BY doc_id, field, term
       |), fsc AS (
       |  SELECT ftf.doc_id, ftf.field, ftf.term,
       |    CASE WHEN ftf.field = 'title' THEN
       |      ln(1 + (fst.n - fdf.df + 0.5) / (fdf.df + 0.5))
       |        * ftf.tf / (ftf.tf + 1.2 * (1 - 0.75
       |            + 0.75 * fnorm.ldl / (fst.sttf / CAST(fst.n AS DOUBLE))))
       |    ELSE
       |      greatest(0, ln(1 + ftf.tf / ($mu * fctf.ctf / fst.sttf))
       |        + ln($mu / (fnorm.ldl + $mu)))
       |    END AS s
       |  FROM ftf
       |  JOIN fdf ON ftf.field = fdf.field AND ftf.term = fdf.term
       |  JOIN fctf ON ftf.field = fctf.field AND ftf.term = fctf.term
       |  JOIN fnorm ON ftf.doc_id = fnorm.doc_id AND ftf.field = fnorm.field
       |  JOIN fst ON fst.field = ftf.field
       |), pt AS (
       |  SELECT doc_id, term, max(s) AS mx, sum(s) AS sm
       |  FROM fsc GROUP BY doc_id, term
       |), agg AS (
       |  SELECT doc_id, sum(mx + $tie * (sm - mx)) AS total
       |  FROM pt GROUP BY doc_id
       |)
       |SELECT doc_id, CAST(round(total * 10000) AS BIGINT) AS score_q
       |FROM agg ORDER BY total DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** docCount — docs with ≥1 indexed (non-stop) token. */
  def matchAllCountSql: String =
    s"WITH $tokCte SELECT count(DISTINCT doc_id) AS n FROM tokf"

  /** CommonTermsQuery: low-df terms (df ≤ maxTf·N) required, high-df
    * optional, score over all matched — the classification is DERIVED
    * from dfs in-query, same as the engine.
    */
  def commonTermsSql(terms: Seq[String], maxTf: Double, k: Int): String =
    s"""WITH ${bm25Ctes(terms)}, qterms(term) AS (
       |  VALUES ${terms.distinct.map(t => s"('$t')").mkString(", ")}
       |), dfz AS (
       |  -- literal query-term list, df defaulted to 0: a term ABSENT
       |  -- from the index stays a required (low-df) clause, exactly as
       |  -- the engine treats it — df-derived rows alone would silently
       |  -- drop it from the required set
       |  SELECT q.term, COALESCE(df.df, 0) AS df
       |  FROM qterms q LEFT JOIN df ON q.term = df.term
       |), lowt AS (
       |  SELECT dfz.term FROM dfz CROSS JOIN st WHERE dfz.df <= $maxTf * st.n
       |), nlow AS (SELECT count(*) AS c FROM lowt),
       |lowm AS (
       |  SELECT doc_id, count(DISTINCT term) AS lm FROM persc
       |  WHERE term IN (SELECT term FROM lowt) GROUP BY doc_id
       |)
       |SELECT sc.doc_id, CAST(round(sc.score * 10000) AS BIGINT) AS score_q
       |FROM sc JOIN lowm USING (doc_id) CROSS JOIN nlow
       |WHERE lowm.lm = nlow.c
       |ORDER BY sc.score DESC, sc.doc_id ASC LIMIT $k""".stripMargin

  /** LTR linear-model rerank of the BM25 top-n: model = w0·score +
    * w1·ln(1 + n_chars/100) + w2·[doc matches flagTerm].
    */
  def ltrRerankSql(terms: Seq[String], flagTerm: String, n: Int, k: Int,
                   w0: Double, w1: Double, w2: Double): String = {
    val model = s"($w0 * c.score + $w1 * ln(1 + d.n_chars / 100.0) + " +
      s"$w2 * (CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END))"
    s"""WITH ${bm25Ctes(terms)}, cand AS (
       |  SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id ASC LIMIT $n
       |), flag AS (SELECT DISTINCT doc_id FROM tokf WHERE term = '$flagTerm')
       |SELECT c.doc_id, CAST(round($model * 10000) AS BIGINT) AS ltr_q
       |FROM cand c JOIN documents d ON c.doc_id = d.doc_id
       |LEFT JOIN flag f ON c.doc_id = f.doc_id
       |ORDER BY $model DESC, c.doc_id ASC LIMIT $k""".stripMargin
  }

  /** LTR feature logger (`fl=[features]`): the RAW named feature
    * vector per doc of the BM25 top-n candidate window — score,
    * ln-length, flag-term membership — each quantized on the shared
    * integer grid (the un-blended twin of [[ltrRerankSql]]).
    */
  def ltrFeaturesSql(terms: Seq[String], flagTerm: String, n: Int): String =
    s"""WITH ${bm25Ctes(terms)}, cand AS (
       |  SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id ASC LIMIT $n
       |), flag AS (SELECT DISTINCT doc_id FROM tokf WHERE term = '$flagTerm')
       |SELECT c.doc_id,
       |  CAST(round(c.score * 10000) AS BIGINT) AS f_score_q,
       |  CAST(round(ln(1 + d.n_chars / 100.0) * 10000) AS BIGINT) AS f_len_q,
       |  CAST(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS f_flag
       |FROM cand c JOIN documents d ON c.doc_id = d.doc_id
       |LEFT JOIN flag f ON c.doc_id = f.doc_id""".stripMargin

  /** `fl=[subquery]`: top-k main-query hits each decorated with the
    * top-n same-source docs ranked by the sub term's tf.
    */
  def subquerySql(terms: Seq[String], subTerm: String,
                  k: Int, n: Int): String =
    s"""WITH ${bm25Ctes(terms)}, cand AS (
       |  SELECT doc_id FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k
       |), par AS (
       |  SELECT c.doc_id, d.source FROM cand c
       |  JOIN documents d ON c.doc_id = d.doc_id
       |), sub AS (
       |  SELECT d.source, t.doc_id AS sub_doc_id, count(*) AS tf
       |  FROM tokf t JOIN documents d ON t.doc_id = d.doc_id
       |  WHERE t.term = '$subTerm'
       |    AND d.source IN (SELECT source FROM par)
       |  GROUP BY d.source, t.doc_id
       |), r AS (
       |  SELECT source, sub_doc_id, tf, row_number() OVER (
       |    PARTITION BY source ORDER BY tf DESC, sub_doc_id ASC) AS sub_rank
       |  FROM sub)
       |SELECT p.doc_id, CAST(r.sub_rank AS BIGINT) AS sub_rank,
       |  r.sub_doc_id, CAST(r.tf AS BIGINT) AS sub_tf
       |FROM par p JOIN r ON p.source = r.source AND r.sub_rank <= $n""".stripMargin

  /** Additive-trees rerank (MultipleAdditiveTreesModel): the fixed
    * 3-tree ensemble over the quantized feature vector, nested-CASE
    * replay — every branch compares integers, so the twin is exact.
    */
  def ltrTreesSql(terms: Seq[String], flagTerm: String,
                  n: Int, k: Int): String =
    s"""WITH ${bm25Ctes(terms)}, cand AS (
       |  SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id ASC LIMIT $n
       |), flag AS (SELECT DISTINCT doc_id FROM tokf WHERE term = '$flagTerm'),
       |feat AS (
       |  SELECT c.doc_id,
       |    CAST(round(c.score * 10000) AS BIGINT) AS f_score_q,
       |    CAST(round(ln(1 + d.n_chars / 100.0) * 10000) AS BIGINT) AS f_len_q,
       |    CAST(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS f_flag
       |  FROM cand c JOIN documents d ON c.doc_id = d.doc_id
       |  LEFT JOIN flag f ON c.doc_id = f.doc_id)
       |SELECT doc_id, CAST(
       |    (CASE WHEN f_score_q <= 3650 THEN 10
       |          WHEN f_flag = 1 THEN 40 ELSE 25 END)
       |  + (CASE WHEN f_len_q <= 13000 THEN 5 ELSE 15 END)
       |  + (CASE WHEN f_score_q <= 3750 THEN
       |       (CASE WHEN f_len_q <= 15000 THEN 2 ELSE 8 END)
       |     ELSE 20 END) AS BIGINT) AS model_score
       |FROM feat
       |ORDER BY model_score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** Per-shard-statistics BM25 top-k (LocalStatsCache): each doc-range
    * shard scores with its own df/n/avgdl, local top-k, merge by score.
    */
  def shardLocalIdfSql(terms: Seq[String], shardSize: Long, k: Int): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, sh AS (
       |  SELECT doc_id, doc_id // $shardSize AS shard FROM dl
       |), sst AS (
       |  SELECT shard, count(*) AS n, sum(dl.dl) AS sttf
       |  FROM dl JOIN sh USING (doc_id) GROUP BY shard
       |), sdf AS (
       |  SELECT sh.shard, t.term, count(DISTINCT t.doc_id) AS df
       |  FROM tokf t JOIN sh ON t.doc_id = sh.doc_id
       |  WHERE t.term IN ($qs) GROUP BY sh.shard, t.term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), persc AS (
       |  SELECT sh.shard, tf.doc_id,
       |    ln(1 + (sst.n - sdf.df + 0.5) / (sdf.df + 0.5))
       |      * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl
       |        / (sst.sttf / CAST(sst.n AS DOUBLE)))) AS s
       |  FROM tf JOIN sh ON tf.doc_id = sh.doc_id
       |  JOIN sdf ON sdf.shard = sh.shard AND sdf.term = tf.term
       |  JOIN norm ON tf.doc_id = norm.doc_id
       |  JOIN sst ON sst.shard = sh.shard
       |), sc AS (
       |  SELECT shard, doc_id, sum(s) AS score FROM persc
       |  GROUP BY shard, doc_id
       |), r AS (
       |  SELECT doc_id, score, row_number() OVER (
       |    PARTITION BY shard ORDER BY score DESC, doc_id ASC) AS rn
       |  FROM sc)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM r WHERE rn <= $k
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** Exact phrase over the 2-value multivalued split with
    * positionIncrementGap=`gap`: value-1 positions offset by
    * len(value0's RAW tokens) + gap, so a (w1, w2) pair straddling the
    * value boundary can never satisfy pos(b) = pos(a) + 1.
    */
  def phraseMultiValueSql(w1: String, w2: String, gap: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), halves AS (
       |  SELECT doc_id, l[1:(len(l)+1)//2] AS v0,
       |         l[(len(l)+1)//2+1:len(l)] AS v1 FROM lists
       |), tokpos AS (
       |  SELECT doc_id, unnest(v0) AS term,
       |         generate_subscripts(v0, 1) AS pos FROM halves
       |  UNION ALL
       |  SELECT doc_id, unnest(v1) AS term,
       |         len(v0) + $gap + generate_subscripts(v1, 1) AS pos FROM halves
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2')
       |SELECT a.doc_id, count(*) AS phrase_tf
       |FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |GROUP BY a.doc_id""".stripMargin

  /** Soundex codebook over the stop-filtered term stream: the phonetic
    * rules are ONE shared portable SQL expression (Phonetic.soundexSql)
    * evaluated verbatim here and in the engine.
    */
  def phoneticSoundexSql: String =
    s"""WITH $tokCte
       |SELECT ${graft.analysis.Phonetic.soundexSql("term")} AS code,
       |  count(DISTINCT term) AS n_terms, count(*) AS ctf
       |FROM tokf WHERE ${graft.analysis.Phonetic.alphaOnlySql("term")}
       |GROUP BY 1""".stripMargin

  /** edismax pf: the qf-weighted dismax total PLUS pfBoost × the exact
    * body-phrase score (PhraseWeight: summed slot idfs) for the
    * adjacent (w1, w2) pair; docs without the phrase contribute 0. The
    * ranking cut compares the QUANTIZED combined score (the engine cuts
    * after quantization too, so ties resolve identically).
    */
  def edismaxPfSql(w1: String, w2: String, tie: Double, titleBoost: Double,
                   pfBoost: Double, k: Int): String = {
    val qs = termList(Seq(w1, w2).distinct)
    s"""WITH ${multifieldCtes(qs, tie, titleBoost)}, bnorm AS (
       |  SELECT doc_id, dl, ldl FROM fnorm WHERE field = 'body'
       |), bst AS (
       |  SELECT n, sttf FROM fst WHERE field = 'body'
       |), pdf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM toks
       |  WHERE field = 'body' AND term IN ($qs) GROUP BY term
       |), widf AS (
       |  SELECT sum(ln(1 + (bst.n - pdf.df + 0.5) / (pdf.df + 0.5))) AS w
       |  FROM pdf CROSS JOIN bst
       |), a AS (SELECT doc_id, pos FROM btok WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM btok WHERE term = '$w2'),
       |   ph AS (
       |  SELECT a.doc_id, count(*) AS ptf
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  GROUP BY a.doc_id
       |), psc AS (
       |  SELECT ph.doc_id,
       |    widf.w * ph.ptf / (ph.ptf + 1.2 * (1 - 0.75 + 0.75 * bnorm.ldl / (bst.sttf / CAST(bst.n AS DOUBLE)))) AS ps
       |  FROM ph JOIN bnorm ON ph.doc_id = bnorm.doc_id
       |  CROSS JOIN widf CROSS JOIN bst
       |)
       |SELECT agg.doc_id,
       |  CAST(round((agg.total + $pfBoost * coalesce(psc.ps, 0)) * 10000) AS BIGINT) AS score_q
       |FROM agg LEFT JOIN psc ON agg.doc_id = psc.doc_id
       |ORDER BY score_q DESC, agg.doc_id ASC LIMIT $k""".stripMargin
  }

  /** edismax pf2: the qf-weighted dismax total PLUS pfBoost × the sum
    * of the exact body-phrase scores of EVERY ADJACENT BIGRAM of the
    * query — (w1 w2) and (w2 w3) for a three-term q [8x Solr
    * ExtendedDismaxQParser.java addShingledPhraseQueries(…, 2)]. Each
    * bigram gets its own PhraseWeight (summed slot idfs over ITS two
    * terms); the combine shape `total + pfBoost * (ps1 + ps2)` is the
    * engine's, verbatim, before the shared quantized cut.
    */
  def edismaxPf2Sql(w1: String, w2: String, w3: String, tie: Double,
                    titleBoost: Double, pfBoost: Double, k: Int): String = {
    val qs = termList(Seq(w1, w2, w3).distinct)
    def pairCtes(i: Int, a: String, b: String): String =
      s"""widf$i AS (
         |  SELECT sum(ln(1 + (bst.n - pdf.df + 0.5) / (pdf.df + 0.5))) AS w
         |  FROM pdf CROSS JOIN bst WHERE pdf.term IN ('$a', '$b')
         |), a$i AS (SELECT doc_id, pos FROM btok WHERE term = '$a'),
         |   b$i AS (SELECT doc_id, pos FROM btok WHERE term = '$b'),
         |   ph$i AS (
         |  SELECT a$i.doc_id, count(*) AS ptf
         |  FROM a$i JOIN b$i ON b$i.doc_id = a$i.doc_id AND b$i.pos = a$i.pos + 1
         |  GROUP BY a$i.doc_id
         |), psc$i AS (
         |  SELECT ph$i.doc_id,
         |    widf$i.w * ph$i.ptf / (ph$i.ptf + 1.2 * (1 - 0.75 + 0.75 * bnorm.ldl / (bst.sttf / CAST(bst.n AS DOUBLE)))) AS ps
         |  FROM ph$i JOIN bnorm ON ph$i.doc_id = bnorm.doc_id
         |  CROSS JOIN widf$i CROSS JOIN bst
         |)""".stripMargin
    s"""WITH ${multifieldCtes(qs, tie, titleBoost)}, bnorm AS (
       |  SELECT doc_id, dl, ldl FROM fnorm WHERE field = 'body'
       |), bst AS (
       |  SELECT n, sttf FROM fst WHERE field = 'body'
       |), pdf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM toks
       |  WHERE field = 'body' AND term IN ($qs) GROUP BY term
       |), ${pairCtes(1, w1, w2)}, ${pairCtes(2, w2, w3)}
       |SELECT agg.doc_id,
       |  CAST(round((agg.total + $pfBoost * (coalesce(psc1.ps, 0) + coalesce(psc2.ps, 0))) * 10000) AS BIGINT) AS score_q
       |FROM agg LEFT JOIN psc1 ON agg.doc_id = psc1.doc_id
       |         LEFT JOIN psc2 ON agg.doc_id = psc2.doc_id
       |ORDER BY score_q DESC, agg.doc_id ASC LIMIT $k""".stripMargin
  }

  /** edismax mm (minimum should match): the qf-weighted dismax ranking
    * restricted to docs matching ≥ mm of the query's term clauses — a
    * term clause matches when ANY qf field contains the term, which is
    * exactly one `pt` row per (doc, matched term) in the shared dismax
    * CTE chain [8x Solr SolrPluginUtils.setMinShouldMatch].
    */
  def edismaxMmSql(terms: Seq[String], tie: Double, titleBoost: Double,
                   mm: Int, k: Int): String = {
    val qs = termList(terms.distinct)
    s"""WITH ${multifieldCtes(qs, tie, titleBoost)}, nt AS (
       |  SELECT doc_id, count(*) AS n FROM pt GROUP BY doc_id
       |)
       |SELECT agg.doc_id,
       |  CAST(round(agg.total * 10000) AS BIGINT) AS score_q
       |FROM agg JOIN nt USING (doc_id) WHERE nt.n >= $mm
       |ORDER BY agg.total DESC, agg.doc_id ASC LIMIT $k""".stripMargin
  }

  /** MLT interestingTerms: the seed doc's terms ranked by tf × idf —
    * the `mlt` CTE of [[moreLikeThisSql]] surfaced as the result.
    */
  def mltInterestingTermsSql(seed: Long, m: Int): String =
    s"""WITH $tokCte, $dlCtes, seedtf AS (
       |  SELECT term, count(*) AS tf FROM tokf WHERE doc_id = $seed GROUP BY term
       |), alldf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf GROUP BY term
       |)
       |SELECT s.term, CAST(round(
       |  s.tf * ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5)) * 10000) AS BIGINT) AS w_q
       |FROM seedtf s JOIN alldf d USING (term) CROSS JOIN st
       |ORDER BY s.tf * ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5)) DESC,
       |  s.term ASC LIMIT $m""".stripMargin

  /** Spellcheck collation: per-word candidate cut (distance, df desc,
    * term) then conjunctive hit counts over the candidate pairs.
    */
  def spellcheckCollateSql(w1: String, w2: String, maxEdits: Int,
                           perTerm: Int, k: Int): String =
    s"""WITH $tokCte, d AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf GROUP BY term
       |), c1 AS (
       |  SELECT term FROM d
       |  WHERE levenshtein(term, '$w1') BETWEEN 1 AND $maxEdits
       |  ORDER BY levenshtein(term, '$w1') ASC, df DESC, term ASC LIMIT $perTerm
       |), c2 AS (
       |  SELECT term FROM d
       |  WHERE levenshtein(term, '$w2') BETWEEN 1 AND $maxEdits
       |  ORDER BY levenshtein(term, '$w2') ASC, df DESC, term ASC LIMIT $perTerm
       |), o1 AS (
       |  SELECT DISTINCT doc_id, term FROM tokf
       |  WHERE term IN (SELECT term FROM c1)
       |), o2 AS (
       |  SELECT DISTINCT doc_id, term FROM tokf
       |  WHERE term IN (SELECT term FROM c2)
       |)
       |SELECT o1.term || ' ' || o2.term AS collated,
       |  count(DISTINCT o1.doc_id) AS hits
       |FROM o1 JOIN o2 USING (doc_id)
       |GROUP BY 1 ORDER BY hits DESC, collated ASC LIMIT $k""".stripMargin

  /** Bounding-box filter over the key-derived synth coordinates. */
  def geoBboxSql(latLo: Double, latHi: Double,
                 lonLo: Double, lonHi: Double): String =
    s"""SELECT * FROM (
       |  SELECT c_custkey,
       |    CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5 AS lat,
       |    CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) + 0.5 AS lon
       |  FROM customer) t
       |WHERE lat BETWEEN $latLo AND $latHi
       |  AND lon BETWEEN $lonLo AND $lonHi""".stripMargin

  /** Block-join child facet: top child terms over the children (halves)
    * of parents (full docs) matching `parentTerm`, replicating the
    * deterministic half split and the index's stop filter.
    */
  def blockJoinFacetSql(parentTerm: String, k: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), halves AS (
       |  SELECT doc_id, l, l[1:(len(l)+1)//2] AS c0,
       |         l[(len(l)+1)//2+1:len(l)] AS c1
       |  FROM lists
       |), kids AS (
       |  SELECT doc_id * 2 AS child_key, unnest(c0) AS term
       |  FROM halves WHERE list_contains(l, '$parentTerm')
       |  UNION ALL
       |  SELECT doc_id * 2 + 1 AS child_key, unnest(c1) AS term
       |  FROM halves WHERE list_contains(l, '$parentTerm')
       |)
       |SELECT term, count(DISTINCT child_key) AS n_children
       |FROM kids WHERE length(term) > 0 AND term NOT IN ($stopList)
       |GROUP BY 1 ORDER BY n_children DESC, term ASC LIMIT $k""".stripMargin

  /** uniqueBlock(_root_): same child-domain facet, distinct PARENT
    * blocks per bucket (the source doc_id IS the block key here — both
    * halves of a doc carry it, unlike blockJoinFacetSql's per-child
    * doc_id*2 / doc_id*2+1 keys).
    */
  def blockJoinFacetUniqueSql(parentTerm: String, k: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), halves AS (
       |  SELECT doc_id, l, l[1:(len(l)+1)//2] AS c0,
       |         l[(len(l)+1)//2+1:len(l)] AS c1
       |  FROM lists
       |), kids AS (
       |  SELECT doc_id AS block, unnest(c0) AS term
       |  FROM halves WHERE list_contains(l, '$parentTerm')
       |  UNION ALL
       |  SELECT doc_id AS block, unnest(c1) AS term
       |  FROM halves WHERE list_contains(l, '$parentTerm')
       |)
       |SELECT term, count(DISTINCT block) AS n_blocks
       |FROM kids WHERE length(term) > 0 AND term NOT IN ($stopList)
       |GROUP BY 1 ORDER BY n_blocks DESC, term ASC LIMIT $k""".stripMargin

  /** Block-join parent facet: top parent terms (stop-filtered full-text
    * vocabulary) over parents whose block has ≥ 1 child matching the
    * child term. A child is a half of the source doc's tokens, so
    * "some child contains T" ⇔ "the full token list contains T" — the
    * oracle uses the simpler equivalent form.
    */
  def blockJoinParentFacetSql(childTerm: String, k: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), m AS (
       |  SELECT doc_id, l FROM lists WHERE list_contains(l, '$childTerm')
       |), pt AS (
       |  SELECT doc_id, unnest(l) AS term FROM m
       |)
       |SELECT term, count(DISTINCT doc_id) AS n_parents
       |FROM pt WHERE length(term) > 0 AND term NOT IN ($stopList)
       |GROUP BY 1 ORDER BY n_parents DESC, term ASC LIMIT $k""".stripMargin

  /** Infix suggest: contains-anywhere over the dictionary, weight =
    * corpus frequency. The engine's stage-1 gram cut is recall-lossless
    * for fragments ≥ 3 chars (a term containing the fragment contains
    * every 3-gram of it), so the oracle is the plain contains.
    */
  def suggestInfixSql(fragment: String, k: Int): String =
    s"""WITH $tokCte, d AS (SELECT term, count(*) AS weight FROM tokf GROUP BY 1)
       |SELECT term, weight FROM d WHERE contains(term, '$fragment')
       |ORDER BY weight DESC, term ASC LIMIT $k""".stripMargin

  /** CommonGrams phrase: raw-token adjacency for the stopword-side
    * pair — positions BEFORE stop filtering, matching the filter's
    * placement in the reference chain (it runs ahead of StopFilter).
    */
  def commonGramsPhraseSql(w1: String, w2: String): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2')
       |SELECT a.doc_id, count(*) AS tf
       |FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |GROUP BY 1""".stripMargin

  /** KeywordMarker + Porter: the protected set bypasses the stemmer.
    * Map generated from the impl (single source, Porter pinned by
    * PorterSpec, protection pinned by FiltersSpec); DuckDB recounts ctf.
    */
  def keywordMarkerSql(protectedWords: Set[String]): String = {
    val pairs = CorpusVocab.map { w =>
      val st = if (protectedWords.contains(w)) w else graft.analysis.Porter.stem(w)
      s"('$w', '$st')"
    }.mkString(", ")
    s"""WITH $tokCte, sm(term, stem) AS (VALUES $pairs)
       |SELECT sm.term, sm.stem, count(*) AS ctf
       |FROM tokf JOIN sm USING (term) GROUP BY 1, 2""".stripMargin
  }

  /** Character-3-gram codebook — single-source (term, gram) VALUES map
    * generated from the engine's n-gram function over the fixed
    * vocabulary; DuckDB recounts terms and ctf independently.
    */
  def charNgramSql: String = {
    val pairs = (for {
      w <- CorpusVocab
      g <- graft.operators.AnalysisOps.charNgrams(w, 3)
    } yield s"('$w', '$g')").mkString(", ")
    s"""WITH $tokCte, ng(term, gram) AS (VALUES $pairs),
       |d AS (SELECT term, count(*) AS ctf FROM tokf GROUP BY term)
       |SELECT ng.gram, count(*) AS n_terms, CAST(sum(d.ctf) AS BIGINT) AS ctf
       |FROM ng JOIN d USING (term) GROUP BY 1""".stripMargin
  }

  /** KeywordRepeat + RemoveDuplicates combined dictionary — each vocab
    * term maps to itself plus its Porter stem when different (the
    * RemoveDuplicates rule), single-source VALUES map; DuckDB recounts
    * df/ctf over the emitted-token stream independently.
    */
  def keywordRepeatSql: String = {
    val pairs = (for {
      w <- CorpusVocab
      t <- Seq(w, graft.analysis.Porter.stem(w)).distinct
    } yield s"('$w', '$t')").mkString(", ")
    s"""WITH $tokCte, km(term, token) AS (VALUES $pairs)
       |SELECT km.token, count(DISTINCT doc_id) AS df, count(*) AS ctf
       |FROM tokf JOIN km USING (term) GROUP BY 1""".stripMargin
  }

  /** StemmerOverride + Porter: overridden lemmas bypass the stemmer.
    * Same single-source VALUES pattern as [[keywordMarkerSql]].
    */
  def stemmerOverrideSql: String = {
    val pairs = CorpusVocab.map { w =>
      val st = graft.operators.AnalysisOps.StemOverrides
        .getOrElse(w, graft.analysis.Porter.stem(w))
      s"('$w', '$st')"
    }.mkString(", ")
    s"""WITH $tokCte, sm(term, stem) AS (VALUES $pairs)
       |SELECT sm.stem, count(DISTINCT doc_id) AS df, count(*) AS ctf
       |FROM tokf JOIN sm USING (term) GROUP BY 1""".stripMargin
  }

  /** LengthFilter dictionary: df/ctf of terms within [min, max] chars —
    * DuckDB's own tokenize/count with the same length predicate.
    */
  def lengthFilterSql(min: Int, max: Int): String =
    s"""WITH $tokCte
       |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ctf
       |FROM tokf WHERE length(term) BETWEEN $min AND $max
       |GROUP BY term""".stripMargin

  /** PatternReplaceFilter: the shared vowel-strip regex replayed by
    * DuckDB's regexp_replace (global flag; Spark's replaces all by
    * default), empty outputs dropped as the engine does.
    */
  def patternReplaceSql: String =
    s"""WITH $tokCte, rep AS (
       |  SELECT doc_id,
       |    regexp_replace(term, '${graft.operators.AnalysisOps.PatternReplaceRegex}', '', 'g') AS rep
       |  FROM tokf
       |)
       |SELECT rep, count(DISTINCT doc_id) AS df, count(*) AS ctf
       |FROM rep WHERE length(rep) > 0 GROUP BY 1""".stripMargin

  /** TruncateTokenFilter: first-n-chars merge of the dictionary,
    * recounted from the raw token stream.
    */
  def truncateSql(n: Int): String =
    s"""WITH $tokCte
       |SELECT substr(term, 1, $n) AS trunc, count(DISTINCT doc_id) AS df,
       |  count(*) AS ctf
       |FROM tokf GROUP BY 1""".stripMargin

  /** Multi-token synonym rule "`w1 w2` => `out`": the output term's
    * df/ctf must equal the adjacent-pair statistics of the input phrase
    * on the RAW token stream (matching happens before stop filtering).
    */
  def multiwordSynonymSql(w1: String, w2: String, out: String): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2')
       |SELECT '$out' AS term, count(DISTINCT a.doc_id) AS df,
       |  count(*) AS ctf
       |FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1""".stripMargin

  /** Independent DuckDB twin of the default word-delimiter split over
    * `customer.c_name`: boundary insertion via RE2 backref replacement
    * (lower→upper, letter↔digit), then split on non-alphanumerics and
    * lowercase — the same subword set [[graft.analysis.WordDelimiter]]
    * produces for this data (no case-change-after-acronym or possessive
    * forms occur in `Customer#NNNNNNNNN`; those rules are pinned by
    * FiltersSpec's published vectors instead).
    */
  def wordDelimiterSql: String =
    """WITH pre AS (
      |  SELECT c_custkey, regexp_replace(regexp_replace(regexp_replace(c_name,
      |    '([a-z])([A-Z])', '\1 \2', 'g'),
      |    '([A-Za-z])([0-9])', '\1 \2', 'g'),
      |    '([0-9])([A-Za-z])', '\1 \2', 'g') AS s
      |  FROM customer),
      |parts AS (
      |  SELECT c_custkey, lower(p) AS part
      |  FROM pre, unnest(regexp_split_to_array(s, '[^A-Za-z0-9]+')) AS t(p)
      |  WHERE p <> '')
      |SELECT part, count(DISTINCT c_custkey) AS n_keys, count(*) AS n_occ
      |FROM parts GROUP BY 1""".stripMargin

  /** ASCII-folding round trip: accent the vowels with `translate` (the
    * portable expression the engine shares), expect the engine's real
    * fold table to invert it exactly (`refolded` = the bare term).
    */
  def asciiFoldingSql: String =
    s"""WITH $tokCte
       |SELECT term, translate(term, 'aeiou', 'áéíóú') AS accented,
       |  term AS refolded, count(*) AS ctf
       |FROM tokf GROUP BY term""".stripMargin

  /** `text_en` chain tail (possessive strip then Porter) on the
    * possessive surface form of every vocabulary word. The inline map
    * encodes poss = term + 's and stem = Porter.stem(term) — the
    * possessive strip itself is what the engine must get right for the
    * stems to line up.
    */
  def textEnChainSql: String =
    possessiveChainSql(w => graft.analysis.Porter.stem(w))

  /** Shared skeleton of the two `text_en` chain oracles: a VALUES map
    * (term, possessive form, stem-of-vocab-word) joined against the
    * tokenized corpus; only the stem generator differs per variant.
    */
  private def possessiveChainSql(stemOf: String => String): String = {
    val pairs = CorpusVocab
      .map(w => s"('$w', '$w''s', '${stemOf(w)}')")
      .mkString(", ")
    s"""WITH $tokCte, sm(term, poss, stem) AS (VALUES $pairs)
       |SELECT sm.poss, sm.stem, count(DISTINCT doc_id) AS df
       |FROM tokf JOIN sm USING (term) GROUP BY 1, 2""".stripMargin
  }

  /** Snowball (Porter2) `text_en` chain twin of [[textEnChainSql]]:
    * the stem map is generated from Porter2.stem applied DIRECTLY to
    * the possessive form — step 0 of the published algorithm strips
    * `'s`, so no separate possessive strip appears anywhere.
    */
  def textEnPorter2Sql: String =
    possessiveChainSql(w => graft.analysis.Porter2.stem(w + "'s"))

  /** Shingle (bigram) dictionary: tokenize with ordinality, stop-filter
    * KEEPING the original positions (the index's position-gap
    * semantics), shingle only position-adjacent survivors.
    */
  def shingleDfSql: String =
    s"""WITH tokp AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents
       |), tokfp AS (
       |  SELECT doc_id, term, pos FROM tokp
       |  WHERE length(term) > 0 AND term NOT IN ($stopList)
       |), sh AS (
       |  SELECT doc_id, term, pos,
       |    lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nt,
       |    lead(pos)  OVER (PARTITION BY doc_id ORDER BY pos) AS np
       |  FROM tokfp
       |)
       |SELECT term || ' ' || nt AS shingle, count(DISTINCT doc_id) AS df,
       |  count(*) AS ctf
       |FROM sh WHERE np = pos + 1 GROUP BY 1""".stripMargin

  /** LatLonShape polygon-vs-polygon replay: the same integer diamond
    * construction, bbox candidate cut, and CCW cross-product tests as
    * [[graft.search.Shapes]] — separation = some edge with the other
    * shape strictly outside (SAT), containment = all vertices
    * inside-or-on all edges. The pentagon and its bbox come from the
    * SAME shared constant the entry uses ([[graft.search.Shapes
    * .QueryPentagon]]) — one source of truth, like geoPolygonSql.
    */
  def shapePolygonSql: String = {
    val q = graft.search.Shapes.QueryPentagon
    val n = q.length
    val (qx0, qx1, qy0, qy1) = graft.search.Shapes.bbox(q)
    val qVals = q.zipWithIndex
      .map { case ((x, y), i) => s"($i,$x,$y)" }.mkString(",")
    s"""WITH shapes AS (
       |  SELECT doc_id, (doc_id*37)%1000 AS cx, (doc_id*73)%1000 AS cy,
       |    10 + (doc_id%40)*25 AS w, 10 + (doc_id%30)*30 AS h
       |  FROM documents
       |), cand AS (
       |  SELECT * FROM shapes
       |  WHERE cx-w <= $qx1 AND cx+w >= $qx0 AND cy-h <= $qy1 AND cy+h >= $qy0
       |), pv AS (
       |  SELECT doc_id, 0 AS i, cx AS x, cy-h AS y FROM cand UNION ALL
       |  SELECT doc_id, 1, cx+w, cy FROM cand UNION ALL
       |  SELECT doc_id, 2, cx, cy+h FROM cand UNION ALL
       |  SELECT doc_id, 3, cx-w, cy FROM cand
       |), pe AS (
       |  SELECT a.doc_id, a.i, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by_
       |  FROM pv a JOIN pv b ON a.doc_id = b.doc_id AND b.i = (a.i+1)%4
       |), qv(i, x, y) AS (VALUES
       |  $qVals
       |), qe AS (
       |  SELECT a.i, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by_
       |  FROM qv a JOIN qv b ON b.i = (a.i+1)%$n
       |), sep_p AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT pe.doc_id, pe.i,
       |      max((pe.bx-pe.ax)*(q.y-pe.ay) - (pe.by_-pe.ay)*(q.x-pe.ax)) AS mx
       |    FROM pe CROSS JOIN qv q GROUP BY pe.doc_id, pe.i) WHERE mx < 0
       |), sep_q AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT pv.doc_id, qe.i,
       |      max((qe.bx-qe.ax)*(pv.y-qe.ay) - (qe.by_-qe.ay)*(pv.x-qe.ax)) AS mx
       |    FROM qe CROSS JOIN pv GROUP BY pv.doc_id, qe.i) WHERE mx < 0
       |), win AS (
       |  SELECT pv.doc_id, min(CASE WHEN
       |    (qe.bx-qe.ax)*(pv.y-qe.ay) - (qe.by_-qe.ay)*(pv.x-qe.ax) >= 0
       |    THEN 1 ELSE 0 END) AS w
       |  FROM pv CROSS JOIN qe GROUP BY pv.doc_id
       |), con AS (
       |  SELECT pe.doc_id, min(CASE WHEN
       |    (pe.bx-pe.ax)*(q.y-pe.ay) - (pe.by_-pe.ay)*(q.x-pe.ax) >= 0
       |    THEN 1 ELSE 0 END) AS c
       |  FROM pe CROSS JOIN qv q GROUP BY pe.doc_id
       |)
       |SELECT c.doc_id,
       |  CAST(CASE WHEN sp.doc_id IS NULL AND sq.doc_id IS NULL
       |    THEN 1 ELSE 0 END AS BIGINT) AS intersects,
       |  CAST(win.w AS BIGINT) AS within,
       |  CAST(con.c AS BIGINT) AS contains
       |FROM cand c
       |LEFT JOIN sep_p sp USING (doc_id) LEFT JOIN sep_q sq USING (doc_id)
       |JOIN win USING (doc_id) JOIN con USING (doc_id)""".stripMargin
  }

  /** STC base-cluster phrase labels over the top-`k` hits of `term`:
    * adjacent-position bigrams (position semantics identical to
    * [[shingleDfSql]]) restricted to hit docs, query-term bigrams
    * excluded, scored |docs| × 2.
    */
  def clusterLabelsPhraseSql(term: String, k: Int): String =
    s"""WITH ${bm25Ctes(Seq(term))}, hits AS (
       |  SELECT doc_id FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k
       |), tokp AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents
       |), tokfp AS (
       |  SELECT t.doc_id, t.term, t.pos FROM tokp t JOIN hits USING (doc_id)
       |  WHERE length(t.term) > 0 AND t.term NOT IN ($stopList)
       |), sh AS (
       |  SELECT doc_id, term, pos,
       |    lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nt,
       |    lead(pos)  OVER (PARTITION BY doc_id ORDER BY pos) AS np
       |  FROM tokfp
       |)
       |SELECT term || ' ' || nt AS label,
       |  count(DISTINCT doc_id) AS n_docs,
       |  CAST(count(DISTINCT doc_id) * 2 AS BIGINT) AS score
       |FROM sh
       |WHERE np = pos + 1 AND term <> '$term' AND nt <> '$term'
       |GROUP BY term, nt
       |ORDER BY n_docs DESC, label ASC LIMIT 5""".stripMargin

  /** STC binary cluster merge over the top-10 base clusters of
    * [[clusterLabelsPhraseSql]]: edges where the member overlap
    * exceeds half of BOTH clusters, components via a recursive-CTE
    * transitive closure, component label = lexicographic minimum.
    */
  def clusterMergeStcSql(term: String, k: Int): String =
    s"""WITH RECURSIVE ${bm25Ctes(Seq(term))}, hits AS (
       |  SELECT doc_id FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k
       |), tokp AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents
       |), tokfp AS (
       |  SELECT t.doc_id, t.term, t.pos FROM tokp t JOIN hits USING (doc_id)
       |  WHERE length(t.term) > 0 AND t.term NOT IN ($stopList)
       |), sh AS (
       |  SELECT doc_id, term, pos,
       |    lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nt,
       |    lead(pos)  OVER (PARTITION BY doc_id ORDER BY pos) AS np
       |  FROM tokfp
       |), lab AS (
       |  SELECT DISTINCT doc_id, term || ' ' || nt AS label FROM sh
       |  WHERE np = pos + 1 AND term <> '$term' AND nt <> '$term'
       |), base AS (
       |  SELECT label, count(*) AS n FROM lab GROUP BY 1
       |  ORDER BY n DESC, label ASC LIMIT 10
       |), mem AS (
       |  SELECT l.label, l.doc_id FROM lab l JOIN base USING (label)
       |), sz AS (
       |  SELECT label, count(*) AS n FROM mem GROUP BY 1
       |), ov AS (
       |  SELECT a.label AS la, b.label AS lb, count(*) AS n_both
       |  FROM mem a JOIN mem b ON a.doc_id = b.doc_id AND a.label < b.label
       |  GROUP BY 1, 2
       |), edges AS (
       |  SELECT la, lb FROM ov
       |  JOIN sz sa ON sa.label = ov.la JOIN sz sb ON sb.label = ov.lb
       |  WHERE n_both * 2 > sa.n AND n_both * 2 > sb.n
       |), sym AS (
       |  SELECT la AS a, lb AS b FROM edges
       |  UNION ALL SELECT lb, la FROM edges
       |), reach(a, b) AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
       |), root AS (
       |  SELECT bl.label,
       |    least(bl.label, coalesce(min(r.b), bl.label)) AS root
       |  FROM base bl LEFT JOIN reach r ON r.a = bl.label
       |  GROUP BY bl.label
       |)
       |SELECT root.root AS cluster_label,
       |  CAST(count(DISTINCT root.label) AS BIGINT) AS n_base,
       |  CAST(count(DISTINCT m.doc_id) AS BIGINT) AS n_docs
       |FROM root JOIN mem m ON m.label = root.label
       |GROUP BY 1""".stripMargin

  /** FreeTextSuggester: next-word candidates after `prev` by raw
    * corpus bigram frequency (the suggester's analyzer has no stop
    * filter, so the RAW token stream is the right source).
    */
  def suggestFreeTextSql(prev: String, k: Int): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), nxt AS (
       |  SELECT b.term AS next_term
       |  FROM tokpos a JOIN tokpos b
       |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  WHERE a.term = '$prev' AND length(b.term) > 0
       |)
       |SELECT next_term, count(*) AS weight FROM nxt
       |GROUP BY next_term ORDER BY weight DESC, next_term ASC LIMIT $k""".stripMargin

  /** WordBreakSpellChecker.suggestWordBreaks: split non-dictionary
    * compounds at every point where both halves are dictionary terms
    * with df ≥ minDf; freq = min(df_left, df_right).
    */
  def wordBreakSql(inputs: Seq[String], minDf: Long, k: Int): String = {
    val vals = inputs.map(i => s"('$i')").mkString(", ")
    val maxI = inputs.map(_.length).max - 1
    s"""WITH $tokCte, df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf GROUP BY term
       |), ins AS (
       |  SELECT input FROM (VALUES $vals) AS t(input)
       |  WHERE input NOT IN (SELECT term FROM df)
       |), sp AS (
       |  SELECT input, substr(input, 1, i) AS l, substr(input, i + 1) AS r
       |  FROM ins CROSS JOIN generate_series(1, $maxI) AS g(i)
       |  WHERE i <= length(input) - 1
       |), cand AS (
       |  SELECT input, l, r, dl.df AS df_l, dr.df AS df_r
       |  FROM sp JOIN df dl ON dl.term = sp.l JOIN df dr ON dr.term = sp.r
       |  WHERE dl.df >= $minDf AND dr.df >= $minDf
       |)
       |SELECT input, l || ' ' || r AS suggestion, least(df_l, df_r) AS freq
       |FROM cand ORDER BY freq DESC, suggestion ASC LIMIT $k""".stripMargin
  }

  /** FeatureField.newSaturationQuery: BM25 + weight · f/(f + pivot)
    * with f = the n_chars docvalues column.
    */
  def rankFeatureSql(terms: Seq[String], weight: Double, pivot: Double,
                     k: Int): String =
    s"""WITH ${bm25Ctes(terms)}
       |SELECT sc.doc_id,
       |  CAST(round((sc.score + $weight * (d.n_chars / (d.n_chars + $pivot)))
       |    * 10000) AS BIGINT) AS score_q
       |FROM sc JOIN documents d ON d.doc_id = sc.doc_id
       |ORDER BY sc.score + $weight * (d.n_chars / (d.n_chars + $pivot)) DESC,
       |  sc.doc_id ASC
       |LIMIT $k""".stripMargin

  /** SpanNotQuery: ordered-near include spans (greedy-minimal chain —
    * end = first w2 position after the anchor — within the gap budget)
    * with NO exclude-term position inside [anchor, end].
    */
  def spanNotSql(w1: String, w2: String, slop: Int, excl: String): String =
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2'),
       |   e AS (SELECT doc_id, pos FROM tokpos WHERE term = '$excl'),
       |   anchors AS (
       |  SELECT a.doc_id, a.pos, min(b.pos) AS nb
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos > a.pos
       |  GROUP BY a.doc_id, a.pos
       |), ok AS (
       |  SELECT an.doc_id FROM anchors an
       |  WHERE an.nb - an.pos - 1 <= $slop
       |    AND NOT EXISTS (SELECT 1 FROM e
       |      WHERE e.doc_id = an.doc_id AND e.pos BETWEEN an.pos AND an.nb)
       |)
       |SELECT doc_id, count(*) AS span_tf FROM ok GROUP BY doc_id""".stripMargin

  /** Shared anchors CTE for the span containing/within pair: valid
    * ordered big spans (anchor w1 → nearest following w2 within slop)
    * plus the little term's positions.
    */
  private def spanBigLittleCtes(w1: String, w2: String, slop: Int,
                                little: String): String =
    s"""lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   b AS (SELECT doc_id, pos FROM tokpos WHERE term = '$w2'),
       |   e AS (SELECT doc_id, pos FROM tokpos WHERE term = '$little'),
       |   spans AS (
       |  SELECT doc_id, pos, nb FROM (
       |    SELECT a.doc_id, a.pos, min(b.pos) AS nb
       |    FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos > a.pos
       |    GROUP BY a.doc_id, a.pos)
       |  WHERE nb - pos - 1 <= $slop
       |)""".stripMargin

  /** SpanContainingQuery: big spans that contain a little occurrence. */
  def spanContainingSql(w1: String, w2: String, slop: Int,
                        little: String): String =
    s"""WITH ${spanBigLittleCtes(w1, w2, slop, little)}
       |SELECT doc_id, count(*) AS span_tf FROM spans s
       |WHERE EXISTS (SELECT 1 FROM e
       |  WHERE e.doc_id = s.doc_id AND e.pos BETWEEN s.pos AND s.nb)
       |GROUP BY doc_id""".stripMargin

  /** SpanWithinQuery: little occurrences enclosed by some big span. */
  def spanWithinSql(w1: String, w2: String, slop: Int,
                    little: String): String =
    s"""WITH ${spanBigLittleCtes(w1, w2, slop, little)}
       |SELECT doc_id, count(*) AS span_tf FROM e
       |WHERE EXISTS (SELECT 1 FROM spans s
       |  WHERE s.doc_id = e.doc_id AND e.pos BETWEEN s.pos AND s.nb)
       |GROUP BY doc_id""".stripMargin

  /** ScoreJoinQParserPlugin ({!join ... score=max}): outer docs score =
    * max BM25 score of inner-query docs sharing the join key
    * (doc_id / 100 — the synthetic stored join field).
    */
  def scoredJoinSql(terms: Seq[String], k: Int): String =
    s"""WITH ${bm25Ctes(terms)}, inn AS (
       |  SELECT CAST(floor(doc_id / 100) AS BIGINT) AS jk,
       |         max(score) AS jscore
       |  FROM sc GROUP BY 1
       |)
       |SELECT d.doc_id, CAST(round(i.jscore * 10000) AS BIGINT) AS score_q
       |FROM documents d JOIN inn i ON CAST(floor(d.doc_id / 100) AS BIGINT) = i.jk
       |ORDER BY i.jscore DESC, d.doc_id ASC LIMIT $k""".stripMargin

  /** Multi-select faceting ({!tag}/{!ex}): per-bucket counts over the
    * QUERY domain with the bucket filter excluded (n_ex) and applied
    * (n_sel) — both from ONE scan of the matching docs.
    */
  def facetExclTagSql(term: String, lo: Long, hi: Long): String =
    s"""WITH $tokCte, hits AS (
       |  SELECT DISTINCT doc_id FROM tokf WHERE term = '$term'
       |)
       |SELECT CAST(floor(d.n_chars / 100) * 100 AS BIGINT) AS bucket,
       |       count(*) AS n_ex,
       |       CAST(sum(CASE WHEN d.n_chars BETWEEN $lo AND $hi
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sel
       |FROM documents d JOIN hits USING (doc_id)
       |GROUP BY 1""".stripMargin

  /** ComplexPhraseQParser "w0 p*": scored MultiPhraseQuery whose second
    * slot is the dictionary expansion of the prefix — same weight rule
    * as [[multiPhraseScoredSql]] (sum of every alternative's idf), with
    * the alternatives coming from a LIKE predicate instead of literals
    * (= the engine's expandTerms over the same stop-filtered dictionary).
    */
  def phrasePrefixScoredSql(w0: String, prefix: String, k: Int): String = {
    val scoreExpr =
      "widf.w * ph.ptf / (ph.ptf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE))))"
    s"""WITH $tokCte, $dlCtes, pdf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term = '$w0' OR term LIKE '$prefix%' GROUP BY term
       |), widf AS (
       |  SELECT sum(ln(1 + (st.n - pdf.df + 0.5) / (pdf.df + 0.5))) AS w
       |  FROM pdf CROSS JOIN st
       |), lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT DISTINCT doc_id, pos FROM tokpos WHERE term = '$w0'),
       |   b AS (SELECT DISTINCT t.doc_id, t.pos FROM tokpos t
       |         WHERE t.term IN (SELECT term FROM pdf WHERE term LIKE '$prefix%')),
       |   ph AS (
       |  SELECT a.doc_id, count(*) AS ptf
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  GROUP BY a.doc_id
       |)
       |SELECT ph.doc_id,
       |  CAST(round($scoreExpr * 10000) AS BIGINT) AS score_q
       |FROM ph JOIN norm ON ph.doc_id = norm.doc_id CROSS JOIN widf CROSS JOIN st
       |ORDER BY $scoreExpr DESC, ph.doc_id ASC
       |LIMIT $k""".stripMargin
  }

  /** ComplexPhraseQueryParser with the wildcard at the LEADING slot
    * ("h*h table"): slot 0 expands against the dictionary by LIKE
    * pattern, slot 1 is exact; anchors are slot-0 positions with the
    * exact term at pos+1, scored like every multi-phrase (weight = Σ
    * idf over all alternatives + the exact term).
    */
  def complexPhraseScoredSql(likePattern: String, w1: String,
                             k: Int): String = {
    val scoreExpr =
      "widf.w * ph.ptf / (ph.ptf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE))))"
    s"""WITH $tokCte, $dlCtes, pdf AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term LIKE '$likePattern' OR term = '$w1' GROUP BY term
       |), widf AS (
       |  SELECT sum(ln(1 + (st.n - pdf.df + 0.5) / (pdf.df + 0.5))) AS w
       |  FROM pdf CROSS JOIN st
       |), lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), a AS (SELECT DISTINCT t.doc_id, t.pos FROM tokpos t
       |         WHERE t.term IN (SELECT term FROM pdf WHERE term LIKE '$likePattern')),
       |   b AS (SELECT DISTINCT doc_id, pos FROM tokpos WHERE term = '$w1'),
       |   ph AS (
       |  SELECT a.doc_id, count(*) AS ptf
       |  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  GROUP BY a.doc_id
       |)
       |SELECT ph.doc_id,
       |  CAST(round($scoreExpr * 10000) AS BIGINT) AS score_q
       |FROM ph JOIN norm ON ph.doc_id = norm.doc_id CROSS JOIN widf CROSS JOIN st
       |ORDER BY $scoreExpr DESC, ph.doc_id ASC
       |LIMIT $k""".stripMargin
  }

  /** FuzzySuggester: dictionary completions whose leading substring (at
    * length |p|−1, |p|, or |p|+1 — an edit shifts the matched prefix by
    * at most one) is within maxEdits Levenshtein of the typed prefix,
    * first character exact (nonFuzzyPrefix = 1), weight = df.
    */
  def fuzzySuggestSql(prefix: String, maxEdits: Int, k: Int): String = {
    val p = prefix.length
    val first = prefix.substring(0, 1)
    s"""WITH $tokCte, df AS (
       |  SELECT term, count(DISTINCT doc_id) AS weight FROM tokf GROUP BY term
       |)
       |SELECT term, weight FROM df
       |WHERE substr(term, 1, 1) = '$first'
       |  AND length(term) >= ${p - maxEdits}
       |  AND least(levenshtein(substr(term, 1, ${p - 1}), '$prefix'),
       |            levenshtein(substr(term, 1, $p), '$prefix'),
       |            levenshtein(substr(term, 1, ${p + 1}), '$prefix')) <= $maxEdits
       |ORDER BY weight DESC, term ASC LIMIT $k""".stripMargin
  }

  /** docfreq()/totaltermfreq()/idf() function queries over a literal
    * term list — dictionary stats only, idf in the 8.x shape quantized.
    */
  def funcIdfSql(terms: Seq[String]): String =
    s"""WITH $tokCte, $dlCtes, d AS (
       |  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf
       |  FROM tokf WHERE term IN (${termList(terms)}) GROUP BY term
       |)
       |SELECT term, df, ttf,
       |  CAST(round(ln(1 + (st.n - df + 0.5) / (df + 0.5)) * 10000) AS BIGINT)
       |    AS idf_q
       |FROM d CROSS JOIN st""".stripMargin

  /** ClassicSimilarity (TF-IDF) top-k, 8.x shape (LUCENE-7347: no coord,
    * no queryNorm): per-term (ln((N+1)/(df+1)) + 1) · sqrt(tf) / sqrt(dl)
    * over the lossy SmallFloat length, summed per doc.
    */
  def classicTfidfSql(terms: Seq[String], k: Int): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ($qs) GROUP BY term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), sc AS (
       |  SELECT tf.doc_id,
       |    sum((ln((st.n + 1.0) / (df.df + 1.0)) + 1.0)
       |        * sqrt(CAST(tf.tf AS DOUBLE))
       |        / sqrt(CAST(norm.ldl AS DOUBLE))) AS score
       |  FROM tf JOIN df USING (term)
       |  JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st
       |  GROUP BY tf.doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** SweetSpotSimilarity top-k: classic TF-IDF with the plateau
    * lengthNorm 1/sqrt(steep·(|dl−min|+|dl−max|−(max−min))+1), dl lossy.
    */
  def sweetSpotSql(terms: Seq[String], k: Int,
                   min: Int, max: Int, steep: Double): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ($qs) GROUP BY term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), sc AS (
       |  SELECT tf.doc_id,
       |    sum((ln((st.n + 1.0) / (df.df + 1.0)) + 1.0)
       |        * sqrt(CAST(tf.tf AS DOUBLE))
       |        / sqrt($steep * (abs(CAST(norm.ldl AS DOUBLE) - $min)
       |            + abs(CAST(norm.ldl AS DOUBLE) - $max)
       |            - ${max - min}) + 1.0)) AS score
       |  FROM tf JOIN df USING (term)
       |  JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st
       |  GROUP BY tf.doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** LMDirichletSimilarity top-k (μ = reference default 2000): per-term
    * max(0, ln(1 + tf/(μ·ctf/total)) + ln(μ/(dl + μ))), dl lossy.
    */
  def lmDirichletSql(terms: Seq[String], k: Int, mu: Double = 2000.0): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, ctf AS (
       |  SELECT term, count(*) AS ctf FROM tokf
       |  WHERE term IN ($qs) GROUP BY term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), sc AS (
       |  SELECT tf.doc_id,
       |    sum(greatest(0.0,
       |      ln(1.0 + CAST(tf.tf AS DOUBLE)
       |          / ($mu * ctf.ctf / CAST(st.sttf AS DOUBLE)))
       |      + ln($mu / (CAST(norm.ldl AS DOUBLE) + $mu)))) AS score
       |  FROM tf JOIN ctf USING (term)
       |  JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st
       |  GROUP BY tf.doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** SimpleNaiveBayesClassifier: add-one-smoothed multinomial NB over
    * the analyzed term frequencies, label = documents.lang. Log-probs
    * quantized ×10⁶ per (term, class) then pure integer sums — the
    * argmax replays exactly (order-proof, like lm_surprisal).
    */
  def naiveBayesSql: String =
    s"""WITH $tokCte, lab AS (
       |  SELECT doc_id, lang FROM documents
       |), dt AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf GROUP BY doc_id, term
       |), v AS (SELECT count(DISTINCT term) AS v FROM tokf),
       |nn AS (SELECT count(*) AS n FROM documents),
       |ctc AS (
       |  SELECT l.lang, d.term, sum(d.tf) AS ctf_tc
       |  FROM dt d JOIN lab l USING (doc_id) GROUP BY l.lang, d.term
       |), tc AS (
       |  SELECT lang, sum(ctf_tc) AS tokens_c FROM ctc GROUP BY lang
       |), pri AS (
       |  SELECT lang, count(*) AS n_c FROM lab GROUP BY lang
       |), cls AS (
       |  SELECT p.lang,
       |    CAST(round(ln(CAST(p.n_c AS DOUBLE) / nn.n) * 1000000) AS BIGINT)
       |      AS prior_q,
       |    CAST(round(ln(1.0 / (t.tokens_c + v.v)) * 1000000) AS BIGINT) AS q0
       |  FROM pri p JOIN tc t USING (lang) CROSS JOIN nn CROSS JOIN v
       |), ql AS (
       |  SELECT c.term, c.lang,
       |    CAST(round(ln((c.ctf_tc + 1.0) / (t.tokens_c + v.v)) * 1000000)
       |      AS BIGINT) AS q_ln
       |  FROM ctc c JOIN tc t USING (lang) CROSS JOIN v
       |), contrib AS (
       |  SELECT d.doc_id, c.lang, d.tf * coalesce(q.q_ln, c.q0) AS cb
       |  FROM dt d CROSS JOIN cls c
       |  LEFT JOIN ql q ON q.term = d.term AND q.lang = c.lang
       |), sc AS (
       |  SELECT ct.doc_id, ct.lang,
       |    CAST(sum(ct.cb) + min(c2.prior_q) AS BIGINT) AS score_q
       |  FROM contrib ct JOIN cls c2 USING (lang)
       |  GROUP BY ct.doc_id, ct.lang
       |)
       |SELECT doc_id, lang AS pred_lang, score_q FROM (
       |  SELECT doc_id, lang, score_q, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score_q DESC, lang ASC) AS rn
       |  FROM sc) WHERE rn = 1""".stripMargin

  /** KNearestNeighborClassifier over embeddings: k nearest by quantized
    * cosine (self excluded) vote; most votes wins, ties by higher summed
    * similarity then smaller label.
    */
  def knnClassifySql(nQueries: Int, k: Int): String =
    s"""WITH ev AS (
       |  SELECT vec_id, unnest(embedding) AS x,
       |         generate_subscripts(embedding, 1) AS i FROM embeddings
       |), nn AS (
       |  SELECT vec_id, sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS n2
       |  FROM ev GROUP BY vec_id
       |), qd AS (
       |  SELECT e.vec_id, q.vec_id AS qid,
       |    sum(CAST(e.x AS DOUBLE) * CAST(q.x AS DOUBLE)) AS dot
       |  FROM ev e JOIN ev q ON q.i = e.i AND q.vec_id < $nQueries
       |    AND e.vec_id <> q.vec_id
       |  GROUP BY e.vec_id, q.vec_id
       |), sims AS (
       |  SELECT qd.qid, qd.vec_id, l.label,
       |    CAST(round(qd.dot / (sqrt(na.n2) * sqrt(nb.n2)) * 1e6) AS BIGINT)
       |      AS sim_q
       |  FROM qd JOIN nn na ON na.vec_id = qd.vec_id
       |  JOIN nn nb ON nb.vec_id = qd.qid
       |  JOIN embeddings l ON l.vec_id = qd.vec_id
       |), top AS (
       |  SELECT qid, label, sim_q FROM (
       |    SELECT qid, label, sim_q, row_number() OVER (
       |      PARTITION BY qid ORDER BY sim_q DESC, vec_id ASC) AS rn
       |    FROM sims) WHERE rn <= $k
       |), vote AS (
       |  SELECT qid, label, count(*) AS votes, sum(sim_q) AS sim_sum
       |  FROM top GROUP BY qid, label
       |)
       |SELECT qid AS vec_id, CAST(label AS BIGINT) AS pred_label, votes
       |FROM (SELECT qid, label, votes, row_number() OVER (
       |    PARTITION BY qid ORDER BY votes DESC, sim_sum DESC, label ASC) AS vr
       |  FROM vote) WHERE vr = 1""".stripMargin
}
