package graft

import graft.analysis.Analyzer

/** DuckDB oracle SQL for the training-data pipeline entries
  * ([[graft.operators.TrainingData]], [[graft.operators.Vectors]],
  * [[graft.operators.Multimodal]]). Shingles are reproduced with
  * window `lead` over the split token stream; md5 is byte-stable across
  * engines; similarities/Jaccard are quantized integers. Hash-based ops
  * (SimHash, MinHash internals, LSH buckets) have no SQL oracle — the
  * MinHash+LSH *result* is oracle-checked against the exact-Jaccard SQL
  * (recall ≈ 1 by construction), the fingerprints are rows-only.
  */
object TrainingOracles {

  private val stopList: String =
    Analyzer.EnglishStopWords.toSeq.sorted.map(w => s"'$w'").mkString(", ")

  /** Context-window chunking: the same windows via generate_series +
    * list slicing (DuckDB clamps the slice end; Spark's `slice` clamps
    * the length — identical chunks).
    */
  def chunkDocuments(size: Int, overlap: Int): String = {
    val stride = size - overlap
    s"""WITH l AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (
       |  SELECT doc_id, i AS chunk_ord,
       |    toks[CAST(i*$stride + 1 AS INT) : CAST(least(i*$stride + $size, len(toks)) AS INT)] AS ctoks
       |  FROM l, LATERAL unnest(generate_series(0,
       |    greatest(1, CAST(ceil((len(toks) - $overlap) / ${stride}.0) AS INT)) - 1)) AS t(i)
       |)
       |SELECT doc_id, chunk_ord, len(ctoks) AS n_tokens,
       |  array_to_string(ctoks, ' ') AS chunk FROM c""".stripMargin
  }

  val dedupExact: String =
    """SELECT md5(text) AS content_hash, count(*) AS n_dups,
      |  min(doc_id) AS keeper
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** Stratified hash sampling: same md5-prefix draw and per-lang
    * thresholds as the Spark side (hex md5 is byte-stable, 2-hex-digit
    * prefix compare = 1/256-granular uniform threshold).
    */
  val sampleStratified: String =
    """WITH kept AS (
      |  SELECT doc_id, lang FROM documents
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 2) <
      |    CASE lang WHEN 'en' THEN '80' WHEN 'zh' THEN '20' ELSE '40' END)
      |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM kept GROUP BY lang""".stripMargin

  /** Token-budget sequence packing: exclusive prefix sum over doc_id
    * order, integer-divided by the budget (the oracle may use the
    * single-node window; the Spark side computes the same prefix sum
    * with per-partition offsets).
    */
  def packSequences(budget: Long): String =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, tok,
       |    coalesce(sum(tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
       |  FROM t)
       |SELECT CAST(excl // $budget AS BIGINT) AS seq_id, count(*) AS n_docs,
       |  CAST(sum(tok) AS BIGINT) AS tok_sum,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1""".stripMargin

  /** Inline (term, subword-count) map of the BPE tokenizer: merges are
    * trained on the fixed corpus vocabulary minus stopwords — exactly
    * the engine's term dictionary — via [[graft.analysis.Bpe]] (single
    * source of truth); DuckDB independently splits and sums. Stopwords
    * ARE in the map (counted in budgets) as out-of-vocabulary encodes.
    */
  private def bpeMapValues: String = {
    val dict = OracleGen.CorpusVocab
      .filterNot(Analyzer.EnglishStopWords.contains)
    val merges = graft.analysis.Bpe.train(dict,
      graft.operators.TrainingData.BpeMerges)
    OracleGen.CorpusVocab
      .map(w => s"('$w', ${graft.analysis.Bpe.tokenCount(w, merges)})")
      .mkString(", ")
  }

  def bpeTokenCounts: String =
    s"""WITH bp(term, n_tok) AS (VALUES $bpeMapValues), w AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents)
       |SELECT doc_id, CAST(sum(bp.n_tok) AS BIGINT) AS bpe_tokens
       |FROM w JOIN bp USING (term) GROUP BY doc_id""".stripMargin

  def packSequencesBpe(budget: Long): String =
    s"""WITH bp(term, n_tok) AS (VALUES $bpeMapValues), w AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, CAST(sum(bp.n_tok) AS BIGINT) AS tok
       |  FROM w JOIN bp USING (term) GROUP BY doc_id),
       |c AS (
       |  SELECT doc_id, tok,
       |    coalesce(sum(tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
       |  FROM t)
       |SELECT CAST(excl // $budget AS BIGINT) AS seq_id, count(*) AS n_docs,
       |  CAST(sum(tok) AS BIGINT) AS tok_sum,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1""".stripMargin

  /** Duplicate word-5-gram counts per doc (same lead()-window shingle
    * formulation as [[ngramJaccardPairs]], extended to 5 slots).
    */
  val dupNgramPrune: String =
    """WITH tp AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |sh0 AS (
      |  SELECT doc_id,
      |    term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w
      |      || ' ' || lead(term, 3) OVER w || ' ' || lead(term, 4) OVER w AS s
      |  FROM tp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL),
      |sdf AS (SELECT s, count(DISTINCT doc_id) AS sdf FROM sh GROUP BY s)
      |SELECT sh.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN sdf.sdf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      |FROM sh JOIN sdf ON sh.s = sdf.s
      |GROUP BY sh.doc_id""".stripMargin

  /** ExactSubstr span dedup (Lee et al. 2021): token positions covered
    * by any corpus-duplicated 8-gram are cut; per doc the token counts
    * and the md5 of the re-joined surviving text. Positions 1-based
    * here, 0-based in the engine — each side is self-consistent.
    */
  val exactSubstrDedup: String =
    """WITH lists AS (
      |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
      |), g0 AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 7),
      |    i -> {'pos': i, 'gram': array_to_string(l[i:i+7], ' ')})) AS u
      |  FROM lists
      |), g AS (
      |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g0
      |), dup AS (
      |  SELECT gram FROM g GROUP BY gram HAVING count(*) > 1
      |), cov0 AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(0, 7),
      |    o -> pos + o)) AS cpos
      |  FROM g JOIN dup USING (gram)
      |), cov AS (
      |  SELECT DISTINCT doc_id, cpos FROM cov0
      |), tok AS (
      |  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
      |  FROM lists
      |), kept AS (
      |  SELECT t.doc_id, count(*) AS n_kept,
      |    string_agg(t.tok, ' ' ORDER BY t.pos) AS clean
      |  FROM tok t LEFT JOIN cov ON cov.doc_id = t.doc_id AND cov.cpos = t.pos
      |  WHERE cov.cpos IS NULL
      |  GROUP BY t.doc_id
      |)
      |SELECT l.doc_id, CAST(len(l.l) AS BIGINT) AS n_tok,
      |  CAST(len(l.l) - coalesce(k.n_kept, 0) AS BIGINT) AS n_dup_tok,
      |  md5(coalesce(k.clean, '')) AS clean_md5
      |FROM lists l LEFT JOIN kept k USING (doc_id)""".stripMargin

  /** Per-lang 60th-percentile n_chars threshold filter (quantile_cont
    * == Spark's exact `percentile`).
    */
  val qualityQuantile: String =
    """WITH thr AS (
      |  SELECT lang, quantile_cont(n_chars, 0.6) AS thr
      |  FROM documents GROUP BY lang)
      |SELECT d.lang, count(*) AS n_kept,
      |  CAST(sum(d.doc_id) AS BIGINT) AS id_sum
      |FROM documents d JOIN thr ON d.lang = thr.lang
      |WHERE d.n_chars >= thr.thr
      |GROUP BY d.lang""".stripMargin

  /** Per-source cap via the same deterministic (md5, doc_id) rank. */
  def sourceCap(cap: Int): String =
    s"""WITH rk AS (
       |  SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM documents)
       |SELECT source, count(*) AS n_kept,
       |  CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM rk WHERE rk <= $cap GROUP BY source""".stripMargin

  /** int8 scalar-quantized ANN, two-stage replay: the same corpus-wide
    * symmetric scale, integer code dot for the oversampled candidate
    * cut (ties by vec_id), exact cosine rerank — deterministic, so the
    * oracle is exact despite the op being "approximate" vs brute force.
    */
  def annSq8TopK(queryId: Long, k: Int, oversample: Int): String =
    s"""WITH sc AS (
       |  SELECT max(list_max(list_transform(embedding, x -> abs(x)))) AS s
       |  FROM embeddings),
       |codes AS (
       |  SELECT vec_id, embedding,
       |    list_transform(embedding,
       |      x -> CAST(round(CAST(x AS DOUBLE) / sc.s * 127) AS BIGINT)) AS c
       |  FROM embeddings CROSS JOIN sc),
       |q AS (SELECT c AS qc, embedding AS qv FROM codes WHERE vec_id = $queryId),
       |cand AS (
       |  SELECT codes.vec_id, codes.embedding, q.qv,
       |    CAST(list_dot_product(codes.c, q.qc) AS BIGINT) AS dot8
       |  FROM codes CROSS JOIN q WHERE codes.vec_id <> $queryId
       |  ORDER BY dot8 DESC, codes.vec_id ASC LIMIT ${k * oversample})
       |SELECT vec_id,
       |  CAST(round(list_dot_product(
       |      list_transform(embedding, x -> CAST(x AS DOUBLE)),
       |      list_transform(qv, x -> CAST(x AS DOUBLE)))
       |    / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
       |                             list_transform(embedding, x -> CAST(x AS DOUBLE))))
       |     * sqrt(list_dot_product(list_transform(qv, x -> CAST(x AS DOUBLE)),
       |                             list_transform(qv, x -> CAST(x AS DOUBLE)))))
       |    * 1e6) AS BIGINT) AS sim_q
       |FROM cand ORDER BY sim_q DESC, vec_id ASC LIMIT $k""".stripMargin

  /** End-to-end curation pipeline: the same five-stage chain as the
    * Spark side (en filter → p40 n_chars cut → exact-dedup keepers →
    * exact-Jaccard near-dup losers dropped → 512-token packing).
    */
  def curationPipeline(budget: Long): String =
    s"""WITH en AS (SELECT * FROM documents WHERE lang = 'en'),
       |thr AS (SELECT quantile_cont(n_chars, 0.4) AS t FROM en),
       |q AS (SELECT en.* FROM en CROSS JOIN thr WHERE n_chars >= t),
       |keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
       |ex AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
       |tp AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM ex),
       |sh0 AS (
       |  SELECT doc_id,
       |    term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS s
       |  FROM tp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pair AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |losers AS (
       |  SELECT DISTINCT j AS doc_id
       |  FROM pair JOIN sz x ON i = x.doc_id JOIN sz y ON j = y.doc_id
       |  WHERE CAST(round(inter * 10000.0 / (x.n + y.n - inter)) AS BIGINT) >= 8000),
       |kept AS (
       |  SELECT ex.* FROM ex LEFT JOIN losers USING (doc_id)
       |  WHERE losers.doc_id IS NULL),
       |t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
       |      FROM kept),
       |c AS (
       |  SELECT doc_id, tok,
       |    coalesce(sum(tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
       |  FROM t)
       |SELECT CAST(excl // $budget AS BIGINT) AS seq_id, count(*) AS n_docs,
       |  CAST(sum(tok) AS BIGINT) AS tok_sum,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1""".stripMargin

  /** Unigram-LM surprisal: ln(ctf) quantized ONCE per distinct term
    * (one deterministic double op in each engine), then integer sums —
    * no cross-engine float-summation-order hazard.
    */
  val lmSurprisal: String =
    """WITH tk0 AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tk AS (SELECT doc_id, term FROM tk0 WHERE length(term) > 0),
      |tf AS (
      |  SELECT term, CAST(round(ln(count(*)) * 10000) AS BIGINT) AS q_ln
      |  FROM tk GROUP BY term),
      |tot AS (
      |  SELECT CAST(round(ln(count(*)) * 10000) AS BIGINT) AS q_ln_n FROM tk)
      |SELECT doc_id, count(*) AS n_tok,
      |  CAST(count(*) * q_ln_n - sum(q_ln) AS BIGINT) AS surprisal_scaled
      |FROM tk JOIN tf USING (term) CROSS JOIN tot
      |GROUP BY doc_id, q_ln_n""".stripMargin

  /** Exact 3-gram-shingle Jaccard pairs at threshold 0.8 (×10⁴ = 8000).
    * Also the oracle of the MinHash+LSH path: at J ≥ 0.8 with 16×2
    * bands the LSH miss probability is ≈ 7e-8 per pair.
    */
  val ngramJaccardPairs: String =
    """WITH tp AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |sh0 AS (
      |  SELECT doc_id,
      |    term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS s
      |  FROM tp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |pair AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT i, j,
      |  CAST(round(inter * 10000.0 / (x.n + y.n - inter)) AS BIGINT) AS jaccard_q
      |FROM pair JOIN sz x ON i = x.doc_id JOIN sz y ON j = y.doc_id
      |WHERE CAST(round(inter * 10000.0 / (x.n + y.n - inter)) AS BIGINT) >= 8000""".stripMargin

  /** Exact-Jaccard twin of the `{!min_hash}` batch query surface:
    * for every query doc (doc_id < maxQueryId), all corpus docs with
    * shingle Jaccard ≥ threshold. LSH miss probability at J ≥ 0.8 with
    * 16×2 bands ≈ 7e-8 per pair (the dedup_minhash_lsh argument).
    */
  def minhashQuerySql(maxQueryId: Long, thresholdQ: Long): String =
    s"""WITH tp AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id,
       |    term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS s
       |  FROM tp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |q AS (SELECT doc_id AS q_id, s FROM sh WHERE doc_id < $maxQueryId),
       |inter AS (
       |  SELECT q.q_id, a.doc_id, count(*) AS inter
       |  FROM sh a JOIN q ON a.s = q.s AND a.doc_id <> q.q_id
       |  GROUP BY 1, 2)
       |SELECT i.q_id, i.doc_id,
       |  CAST(round(inter * 10000.0 / (x.n + y.n - inter)) AS BIGINT) AS jaccard_q
       |FROM inter i JOIN sz x ON i.q_id = x.doc_id
       |  JOIN sz y ON i.doc_id = y.doc_id
       |WHERE CAST(round(inter * 10000.0 / (x.n + y.n - inter)) AS BIGINT)
       |  >= $thresholdQ""".stripMargin

  /** Exact all-pairs hashed-TF cosine pairs at τ = 0.99, integer-exact:
    * the same md5-hex feature bucket as the Spark side, then
    * 10⁴·dot² ≥ 9801·n2a·n2b (dot > 0). Also the oracle of the
    * sign-sketch LSH path ([[graft.operators.TrainingData.dedupEmbedding]]).
    * HUGEINT-safe: products cast back to BIGINT only in the output.
    */
  val embeddingCosinePairs: String =
    """WITH tk0 AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tk AS (SELECT doc_id, term FROM tk0 WHERE length(term) > 0),
      |buck AS (
      |  SELECT doc_id,
      |    ((strpos('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 16
      |     + strpos('0123456789abcdef', substr(md5(term), 2, 1)) - 1) % 64 AS b
      |  FROM tk),
      |vec AS (SELECT doc_id, b, count(*) AS c FROM buck GROUP BY 1, 2),
      |nrm AS (SELECT doc_id, sum(c * c) AS n2 FROM vec GROUP BY 1),
      |dots AS (
      |  SELECT a.doc_id AS i, b2.doc_id AS j, sum(a.c * b2.c) AS dot
      |  FROM vec a JOIN vec b2 ON a.b = b2.b AND a.doc_id < b2.doc_id
      |  GROUP BY 1, 2)
      |SELECT i, j,
      |  CAST((10000 * dot * dot) // (na.n2 * nb.n2) AS BIGINT) AS cos2_q
      |FROM dots JOIN nrm na ON dots.i = na.doc_id JOIN nrm nb ON dots.j = nb.doc_id
      |WHERE dot > 0 AND 10000 * dot * dot >= 9801 * na.n2 * nb.n2""".stripMargin

  val langId: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |a AS (
       |  SELECT doc_id, count(*) AS n_tok,
       |    count(*) FILTER (WHERE term IN ($stopList)) AS n_stop
       |  FROM t GROUP BY doc_id)
       |SELECT doc_id,
       |  CASE WHEN n_tok > 0 AND 100 * n_stop > 15 * n_tok
       |       THEN 'en' ELSE 'unk' END AS lang_pred
       |FROM a""".stripMargin

  val qualityScore: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |a AS (
       |  SELECT doc_id, count(*) AS n_tok,
       |    count(*) FILTER (WHERE term IN ($stopList)) AS n_stop,
       |    CAST(sum(length(term)) AS BIGINT) AS sum_len
       |  FROM t GROUP BY doc_id)
       |SELECT d.doc_id, a.n_tok AS n_tokens,
       |  CAST(length(d.text) AS BIGINT) AS n_chars,
       |  1000 * a.n_stop // a.n_tok AS stop_permille,
       |  100 * a.sum_len // a.n_tok AS mean_wordlen_c
       |FROM documents d JOIN a ON d.doc_id = a.doc_id""".stripMargin

  val tokenCounts: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens
      |FROM documents""".stripMargin

  val docFingerprint: String =
    """WITH tp AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |sh0 AS (
      |  SELECT doc_id,
      |    term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w
      |         || ' ' || lead(term, 3) OVER w AS g
      |  FROM tp WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
      |SELECT doc_id, min(md5(g)) AS fingerprint
      |FROM sh0 WHERE g IS NOT NULL GROUP BY doc_id""".stripMargin

  val annCosineTopK: String =
    """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
      |ev AS (SELECT vec_id, unnest(embedding) AS x,
      |       generate_subscripts(embedding, 1) AS i FROM embeddings),
      |qv AS (SELECT unnest(embedding) AS x,
      |       generate_subscripts(embedding, 1) AS i FROM q),
      |dots AS (
      |  SELECT e.vec_id,
      |    sum(CAST(e.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS dot,
      |    sum(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE)) AS na2
      |  FROM ev e JOIN qv v USING (i) GROUP BY e.vec_id),
      |qn AS (SELECT sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nq FROM qv)
      |SELECT vec_id,
      |  CAST(round(dot / (sqrt(na2) * nq) * 1e6) AS BIGINT) AS sim_q
      |FROM dots CROSS JOIN qn
      |WHERE vec_id <> 0
      |ORDER BY sim_q DESC, vec_id ASC LIMIT 10""".stripMargin

  /** Benchmark decontamination: 8-gram md5 collision vs the held-out
    * doc_id % 29 == 0 set (same lead()-window shingle formulation as the
    * Jaccard oracle; DISTINCT mirrors the engine's array_distinct).
    */
  val decontaminate: String = {
    val leads = (1 to 7)
      .map(i => s"lead(term, $i) OVER w").mkString(" || ' ' || ")
    s"""WITH tp AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id, term || ' ' || $leads AS s
       |  FROM tp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |sh AS (SELECT DISTINCT doc_id, md5(s) AS h FROM sh0 WHERE s IS NOT NULL),
       |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 29 = 0)
       |SELECT s.doc_id, count(DISTINCT s.h) AS n_hits
       |FROM sh s JOIN bench USING (h)
       |WHERE s.doc_id % 29 <> 0
       |GROUP BY s.doc_id""".stripMargin
  }

  /** Per-doc contamination fraction: the decontaminate shingle CTEs with
    * a LEFT join so clean docs keep a zero numerator; permille floor
    * division mirrors the engine's integer grid.
    */
  val contaminationScore: String = {
    val leads = (1 to 7)
      .map(i => s"lead(term, $i) OVER w").mkString(" || ' ' || ")
    s"""WITH tp AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id, term || ' ' || $leads AS s
       |  FROM tp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |sh AS (SELECT DISTINCT doc_id, md5(s) AS h FROM sh0 WHERE s IS NOT NULL),
       |bench AS (SELECT DISTINCT h, 1 AS hit FROM sh WHERE doc_id % 29 = 0)
       |SELECT s.doc_id, count(*) AS n_shingles,
       |  count(bench.hit) AS n_contaminated,
       |  (count(bench.hit) * 1000) // count(*) AS contam_permille
       |FROM sh s LEFT JOIN bench USING (h)
       |WHERE s.doc_id % 29 <> 0
       |GROUP BY s.doc_id""".stripMargin
  }

  /** URL canonicalization: the oracle reconstructs the normalized form
    * arithmetically from the same deterministic doc_id-derived raw URL
    * the engine parses with real `parse_url` machinery.
    */
  val urlNormalize: String =
    """SELECT doc_id,
      |  'example' || CAST(doc_id % 50 AS VARCHAR) || '.com' AS host,
      |  'http://example' || CAST(doc_id % 50 AS VARCHAR) || '.com/p/'
      |    || CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id % 7 AS VARCHAR)
      |    AS norm_url
      |FROM documents""".stripMargin

  /** Dedup clustering: connected components of the exact near-dup pair
    * graph via a recursive reachability CTE; cluster_id = min reachable
    * doc_id (the engine's min-label-propagation fixpoint).
    */
  val dedupClusters: String =
    s"""WITH RECURSIVE p AS (
      |  $ngramJaccardPairs
      |), e AS (
      |  SELECT i AS a, j AS b FROM p UNION SELECT j AS a, i AS b FROM p
      |), reach(src, dst) AS (
      |  SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM e) t
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
      |)
      |SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src""".stripMargin

  /** Cluster keeper by quality: the dedup-cluster recursive CTE plus an
    * argmax (max n_chars, tie min doc_id) per cluster.
    */
  val clusterKeepBest: String =
    s"""WITH RECURSIVE p AS (
       |  $ngramJaccardPairs
       |), e AS (
       |  SELECT i AS a, j AS b FROM p UNION SELECT j AS a, i AS b FROM p
       |), reach(src, dst) AS (
       |  SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM e) t
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
       |), cl AS (
       |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
       |), j AS (
       |  SELECT cl.cluster_id, cl.doc_id, d.n_chars
       |  FROM cl JOIN documents d USING (doc_id)
       |), a AS (
       |  SELECT cluster_id, count(*) AS n_docs, max(n_chars) AS best
       |  FROM j GROUP BY cluster_id
       |)
       |SELECT a.cluster_id, a.n_docs, CAST(min(j.doc_id) AS BIGINT) AS keeper
       |FROM a JOIN j ON j.cluster_id = a.cluster_id AND j.n_chars = a.best
       |GROUP BY a.cluster_id, a.n_docs""".stripMargin

  /** Mixture allocation: the mixture-weights ppm CTE → per-source
    * integer budget share → per-source running-sum admission (whole
    * docs only). The window here is oracle-side only; the engine uses
    * the distributed prefix-sum.
    */
  def mixtureAllocate(budget: Long): String =
    s"""WITH ps AS (
       |  SELECT source,
       |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000) AS BIGINT) AS sq
       |  FROM documents GROUP BY source
       |), t AS (SELECT sum(sq) AS sq_total FROM ps),
       |w AS (
       |  SELECT source,
       |    (CAST((sq * 1000000) // sq_total AS BIGINT) * $budget) // 1000000
       |      AS src_budget
       |  FROM ps CROSS JOIN t
       |), tok AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
       |  FROM documents
       |), c AS (
       |  SELECT source, doc_id, tok,
       |    sum(tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - tok AS excl
       |  FROM tok
       |)
       |SELECT c.source, count(*) AS n_selected,
       |  CAST(sum(tok) AS BIGINT) AS tok_selected
       |FROM c JOIN w USING (source)
       |WHERE excl + tok <= src_budget
       |GROUP BY c.source""".stripMargin

  /** PII scrub: the oracle runs the SAME regexes (Java/RE2-compatible
    * subset) over the same deterministically augmented text.
    */
  val piiScrub: String =
    """WITH raw AS (
      |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
      |    || '@mail.example.org from 10.' || CAST(doc_id % 200 AS VARCHAR)
      |    || '.0.7 call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR)
      |    || '-0199' AS raw
      |  FROM documents
      |), scrub AS (
      |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(raw,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
      |  FROM raw
      |)
      |SELECT doc_id, md5(scrubbed) AS scrub_md5,
      |  CAST(len(string_split(scrubbed, '<EMAIL>')) - 1 AS BIGINT) AS n_email,
      |  CAST(len(string_split(scrubbed, '<IP>')) - 1 AS BIGINT) AS n_ip,
      |  CAST(len(string_split(scrubbed, '<PHONE>')) - 1 AS BIGINT) AS n_phone
      |FROM scrub""".stripMargin

  /** DSIR importance weights: the same md5-first-byte-mod-64 hashed
    * unigram buckets as the Spark side ([[graft.operators.TrainingData
    * .hashedTfVecs]]), Laplace-smoothed target (lang='en') vs raw
    * bucket LMs, per-bucket log ratio quantized to integer micro-nats
    * once, per-doc weight = integer dot product.
    */
  val dsirImportance: String =
    """WITH tk0 AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tk AS (SELECT doc_id, term FROM tk0 WHERE length(term) > 0),
      |buck AS (
      |  SELECT doc_id,
      |    ((strpos('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 16
      |     + strpos('0123456789abcdef', substr(md5(term), 2, 1)) - 1) % 64 AS b
      |  FROM tk),
      |vec AS (SELECT doc_id, b, count(*) AS c FROM buck GROUP BY 1, 2),
      |dl AS (SELECT doc_id, (lang = 'en') AS tgt FROM documents),
      |agg AS (
      |  SELECT b, sum(c) AS rc,
      |         sum(CASE WHEN dl.tgt THEN c ELSE 0 END) AS tc
      |  FROM vec JOIN dl USING (doc_id) GROUP BY b),
      |tot AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM agg),
      |lr AS (
      |  SELECT b,
      |    CAST(round((ln((tc + 1.0) / (tt + 64.0))
      |               - ln((rc + 1.0) / (rt + 64.0))) * 1000000) AS BIGINT) AS lrq
      |  FROM agg CROSS JOIN tot)
      |SELECT v.doc_id, CAST(sum(v.c * lr.lrq) AS BIGINT) AS weight_q
      |FROM vec v JOIN lr USING (b) GROUP BY v.doc_id""".stripMargin

  val binaryMeta: String =
    """SELECT doc_id,
      |  CAST(strlen('<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
      |    || '</title></head><body><p>' || text || '</p></body></html>') AS BIGINT)
      |    AS n_bytes,
      |  md5('<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
      |    || '</title></head><body><p>' || text || '</p></body></html>')
      |    AS content_md5
      |FROM documents""".stripMargin

  /** SemDeDup: fixed-seed cluster assignment (argmax quantized cosine
    * to the kSeeds lowest vec_ids, tie → lowest seed), then the
    * within-cluster lower-id cosine ≥ tauQ dup rule — pairwise dots
    * computed ONLY for same-cluster pairs, like the engine.
    */
  def semDedup(kSeeds: Int, tauQ: Long): String =
    s"""WITH ev AS (
       |  SELECT vec_id, unnest(embedding) AS x,
       |         generate_subscripts(embedding, 1) AS i FROM embeddings),
       |nn AS (
       |  SELECT vec_id, sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS n2
       |  FROM ev GROUP BY vec_id),
       |sdot AS (
       |  SELECT e.vec_id, s.vec_id AS seed,
       |    sum(CAST(e.x AS DOUBLE) * CAST(s.x AS DOUBLE)) AS dot
       |  FROM ev e JOIN ev s ON s.i = e.i AND s.vec_id < $kSeeds
       |  GROUP BY e.vec_id, s.vec_id),
       |ssim AS (
       |  SELECT d.vec_id, d.seed,
       |    CAST(round(d.dot / (sqrt(na.n2) * sqrt(nb.n2)) * 1e6) AS BIGINT)
       |      AS s_sim
       |  FROM sdot d JOIN nn na ON na.vec_id = d.vec_id
       |  JOIN nn nb ON nb.vec_id = d.seed),
       |assign AS (
       |  SELECT vec_id, seed AS cluster FROM (
       |    SELECT vec_id, seed, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY s_sim DESC, seed ASC) AS rn
       |    FROM ssim) WHERE rn = 1),
       |cp AS (
       |  SELECT hi.vec_id AS va, lo.vec_id AS vb
       |  FROM assign hi JOIN assign lo
       |    ON lo.cluster = hi.cluster AND lo.vec_id < hi.vec_id),
       |pd AS (
       |  SELECT cp.va, cp.vb,
       |    sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
       |  FROM cp JOIN ev a ON a.vec_id = cp.va
       |  JOIN ev b ON b.vec_id = cp.vb AND b.i = a.i
       |  GROUP BY cp.va, cp.vb),
       |dups AS (
       |  SELECT DISTINCT pd.va AS vec_id FROM pd
       |  JOIN nn na ON na.vec_id = pd.va JOIN nn nb ON nb.vec_id = pd.vb
       |  WHERE CAST(round(pd.dot / (sqrt(na.n2) * sqrt(nb.n2)) * 1e6) AS BIGINT)
       |        >= $tauQ)
       |SELECT a.vec_id, a.cluster,
       |  CAST(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_dup
       |FROM assign a LEFT JOIN dups d ON d.vec_id = a.vec_id""".stripMargin

  /** Gopher rules: word count / mean word length / ≥2 distinct
    * stopwords, per-rule flags + final keep.
    */
  def gopherRules(minWords: Long, maxWords: Long): String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |a AS (
       |  SELECT doc_id, count(*) AS n_words,
       |    100 * CAST(sum(length(term)) AS BIGINT) // count(*) AS mean_c,
       |    count(DISTINCT term) FILTER (WHERE term IN ($stopList))
       |      AS n_stop_distinct
       |  FROM t GROUP BY doc_id)
       |SELECT doc_id, n_words, mean_c AS mean_wordlen_c,
       |  CAST(n_stop_distinct AS BIGINT) AS n_stop_distinct,
       |  CAST(n_words BETWEEN $minWords AND $maxWords AS BIGINT) AS ok_words,
       |  CAST(mean_c BETWEEN 300 AND 1000 AS BIGINT) AS ok_wordlen,
       |  CAST(n_stop_distinct >= 2 AS BIGINT) AS ok_stop,
       |  CAST((n_words BETWEEN $minWords AND $maxWords)
       |    AND (mean_c BETWEEN 300 AND 1000)
       |    AND n_stop_distinct >= 2 AS BIGINT) AS keep
       |FROM a""".stripMargin

  /** CCNet head/middle/tail perplexity buckets per language: per-token
    * quantized surprisal (integer floor division), exact interpolated
    * 1/3 and 2/3 per-lang thresholds (quantile_cont = Spark percentile).
    */
  val ccnetBucket: String =
    """WITH tk0 AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tk AS (SELECT doc_id, term FROM tk0 WHERE length(term) > 0),
      |tf AS (
      |  SELECT term, CAST(round(ln(count(*)) * 10000) AS BIGINT) AS q_ln
      |  FROM tk GROUP BY term),
      |tot AS (
      |  SELECT CAST(round(ln(count(*)) * 10000) AS BIGINT) AS q_ln_n FROM tk),
      |sur AS (
      |  SELECT doc_id,
      |    CAST((count(*) * q_ln_n - sum(q_ln)) // count(*) AS BIGINT) AS ppl_q
      |  FROM tk JOIN tf USING (term) CROSS JOIN tot
      |  GROUP BY doc_id, q_ln_n),
      |pt AS (
      |  SELECT s.doc_id, d.lang, s.ppl_q
      |  FROM sur s JOIN documents d ON d.doc_id = s.doc_id),
      |thr AS (
      |  SELECT lang, quantile_cont(ppl_q, CAST(1 AS DOUBLE)/3) AS t1,
      |         quantile_cont(ppl_q, CAST(2 AS DOUBLE)/3) AS t2
      |  FROM pt GROUP BY lang)
      |SELECT pt.doc_id, pt.lang, pt.ppl_q,
      |  CASE WHEN pt.ppl_q <= thr.t1 THEN 'head'
      |       WHEN pt.ppl_q <= thr.t2 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM pt JOIN thr ON pt.lang = thr.lang""".stripMargin

  /** TextProfileSignature replay: integer quant rule, quantized counts,
    * (count desc, token asc) serialization, md5 — all byte-stable.
    */
  val textProfileSignature: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |cnt AS (
      |  SELECT doc_id, term, count(*) AS cnt FROM tok
      |  WHERE length(term) >= 2 GROUP BY doc_id, term),
      |q AS (
      |  SELECT doc_id,
      |    CASE WHEN (max(cnt) + 50) // 100 >= 2 THEN (max(cnt) + 50) // 100
      |         WHEN max(cnt) > 4 THEN 2 ELSE 1 END AS quant
      |  FROM cnt GROUP BY doc_id),
      |p AS (
      |  SELECT c.doc_id, q.quant, c.term, (c.cnt // q.quant) * q.quant AS qcnt
      |  FROM cnt c JOIN q USING (doc_id))
      |SELECT doc_id, quant,
      |  md5(string_agg(term || ' ' || CAST(qcnt AS VARCHAR), ' '
      |      ORDER BY qcnt DESC, term ASC)) AS signature
      |FROM p WHERE qcnt >= quant GROUP BY doc_id, quant""".stripMargin

  /** URL keep-best dedup: canonical key replayed with the urlNormalize
    * string rules, keeper = argmax (n_chars, -doc_id) per key.
    */
  val urlDedupBest: String =
    """WITH c AS (
      |  SELECT doc_id, n_chars,
      |    'http://example' || CAST(doc_id % 50 AS VARCHAR) || '.com/p/'
      |      || CAST(doc_id % 100 AS VARCHAR) AS canon_url
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, canon_url, row_number() OVER (
      |    PARTITION BY canon_url ORDER BY n_chars DESC, doc_id ASC) AS rn
      |  FROM c)
      |SELECT canon_url, count(*) AS n_dups,
      |  min(CASE WHEN rn = 1 THEN doc_id END) AS keeper
      |FROM r GROUP BY canon_url""".stripMargin

  /** kmeans stream evaluator replay: integer-milli coordinates, exact
    * integer squared distances, floor-gridded centroid means, `iters`
    * Lloyd rounds from the first-k seeds — every step order-proof.
    */
  def streamKmeans(k: Int, iters: Int): String = {
    require(iters == 2, "oracle replays exactly 2 Lloyd rounds")
    s"""WITH eq AS (
       |  SELECT vec_id, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS x, i
       |  FROM (SELECT vec_id, unnest(embedding) AS x,
       |          generate_subscripts(embedding, 1) AS i FROM embeddings)),
       |init AS (SELECT vec_id AS cid, x AS cx, i FROM eq WHERE vec_id < $k),
       |d1 AS (
       |  SELECT e.vec_id, c.cid,
       |    CAST(sum((e.x - c.cx) * (e.x - c.cx)) AS BIGINT) AS dist
       |  FROM eq e JOIN init c ON c.i = e.i GROUP BY e.vec_id, c.cid),
       |a1 AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d1)
       |  WHERE rn = 1),
       |c1 AS (
       |  SELECT a1.cluster AS cid, eq.i,
       |    CAST(floor(sum(eq.x) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cx
       |  FROM a1 JOIN eq ON eq.vec_id = a1.vec_id GROUP BY a1.cluster, eq.i),
       |d2 AS (
       |  SELECT e.vec_id, c.cid,
       |    CAST(sum((e.x - c.cx) * (e.x - c.cx)) AS BIGINT) AS dist
       |  FROM eq e JOIN c1 c ON c.i = e.i GROUP BY e.vec_id, c.cid)
       |SELECT vec_id, cid AS cluster, dist AS dist_q FROM (
       |  SELECT vec_id, cid, dist, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d2)
       |WHERE rn = 1""".stripMargin
  }

  /** Deterministic epoch shuffle: the whole permutation replayed as one
    * global row_number over the same md5(seed:doc_id) sort key (md5 and
    * long→VARCHAR casts are byte-identical across engines — the
    * leakage_split precedent). The oracle's single window is the
    * SMALL-SCALE REPLAY of what the engine computes with the prefix-sum
    * shape (no single-partition window on the engine side).
    */
  def epochShuffle(seed: String, nShards: Int): String =
    s"""WITH perm AS (
       |  SELECT doc_id,
       |    row_number() OVER (
       |      ORDER BY md5('$seed:' || CAST(doc_id AS VARCHAR)), doc_id)
       |      - 1 AS epoch_pos
       |  FROM documents
       |)
       |SELECT doc_id, epoch_pos, epoch_pos % $nShards AS shard
       |FROM perm""".stripMargin
}
