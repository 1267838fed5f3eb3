package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.{Folding, Porter, Possessive, WordDelimiter}
import graft.codec.PostingCodec
import graft.index.Indexer

/** Corpus-level demonstrations of the analysis-chain filters the stock
  * Solr schemas apply beyond the StandardAnalyzer core: word-delimiter
  * splitting, ASCII folding, the possessive+Porter `text_en` tail, and
  * shingles. Each is a dictionary- or postings-routed dataflow (the raw
  * corpus is never re-tokenized — the filters run on DISTINCT dictionary
  * terms or on decoded index positions, both dictionary-sized at 100 TB
  * while occurrences are trillions).
  */
object AnalysisOps {

  /** Protected words for the KeywordMarker entry — vocabulary words the
    * Porter stemmer would otherwise rewrite (query → queri, table →
    * tabl), so protection is observable in the output.
    */
  val ProtectedWords: Set[String] = Set("query", "table")

  /** Character n-grams of one term — the reference's `NGramTokenizer` /
    * `NGramTokenFilter` [8x lucene/analysis/common .../ngram/
    * NGramTokenizer.java] at a fixed size (the partial-match /
    * substring-search index vocabulary). Distinct grams per term (the
    * dictionary-stats use case counts a term once per gram).
    */
  def charNgrams(t: String, n: Int): Seq[String] =
    if (t.length < n) Seq.empty
    else (0 to t.length - n).map(i => t.substring(i, i + n)).distinct

  /** N-gram codebook over the term dictionary: for every DISTINCT term,
    * its distinct 3-grams; per gram, how many terms contain it and the
    * summed corpus ctf of those terms — the statistics a substring-
    * match index needs. Dictionary-sized: the corpus is never scanned.
    */
  def charNgramDf(s: SparkSession, dir: String): DataFrame = {
    val v = graft.IndexCache.documentsIndex(s, dir)
    val ngU = udf((t: String) => charNgrams(t, 3))
    v.terms.where(col("field") === Indexer.Field)
      .groupBy("term").agg(sum("ctf").as("tctf"))
      .select(explode(ngU(col("term"))).as("gram"), col("tctf"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n_terms"), sum("tctf").as("ctf"))
  }

  /** Word-delimiter subword statistics over `customer.c_name`
    * ("Customer#000000042" → `customer`, `000000042`) — the
    * WordDelimiterGraphFilter [8x .../miscellaneous/
    * WordDelimiterGraphFilter.java] with the stock factory flags,
    * followed by lowercase. Narrow per-row map + one hash aggregation.
    */
  def wordDelimiterParts(s: SparkSession, dir: String): DataFrame = {
    val partsU = udf((name: String) => WordDelimiter.parts(name))
    s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), explode(partsU(col("c_name"))).as("p"))
      .select(col("c_custkey"), lower(col("p")).as("part"))
      .groupBy("part")
      .agg(countDistinct("c_custkey").as("n_keys"), count(lit(1)).as("n_occ"))
  }

  /** ASCII-folding differential over the term dictionary: accent the
    * vowels of every DISTINCT term with the portable `translate`
    * expression both engines share, fold back with the real
    * [[graft.analysis.Folding]] table, and report the folded form next
    * to the original (equal by construction — the oracle encodes that
    * expectation, so any divergence in the fold table mismatches
    * loudly). ctf comes from the dictionary, never a corpus re-scan.
    */
  def asciiFolding(s: SparkSession, dir: String): DataFrame = {
    val v = graft.IndexCache.documentsIndex(s, dir)
    val foldU = udf(Folding.fold _)
    v.terms.where(col("field") === Indexer.Field)
      .groupBy("term").agg(sum("ctf").as("ctf"))
      .withColumn("accented", translate(col("term"), "aeiou", "áéíóú"))
      .withColumn("refolded", foldU(col("accented")))
      .select("term", "accented", "refolded", "ctf")
  }

  /** The `text_en` chain tail — EnglishPossessiveFilter then
    * PorterStemFilter [8x .../en/EnglishPossessiveFilter.java,
    * PorterStemFilter.java] — run end-to-end on the possessive surface
    * form of every dictionary term (`spark's` → `spark` → `spark`),
    * with doc frequency from the decoded posting pairs. The oracle's
    * (term, stem) map is generated from `Porter.stem` alone, so the
    * possessive strip is the part under test.
    */
  def textEnChain(s: SparkSession, dir: String): DataFrame =
    possessiveChain(s, dir, t => Porter.stem(Possessive.strip(t)))

  /** Shared dataflow of the two `text_en` chain variants: the chain
    * function runs on the possessive surface form of every dictionary
    * term (`spark's` → `spark`), df from decoded posting pairs.
    */
  private def possessiveChain(s: SparkSession, dir: String,
                              chain: String => String): DataFrame = {
    val v = graft.IndexCache.documentsIndex(s, dir)
    val chainU = udf(chain)
    val dict = v.terms.where(col("field") === Indexer.Field)
      .select("term").distinct()
      .withColumn("poss", concat(col("term"), lit("'s")))
      .withColumn("stem", chainU(col("poss")))
    Relational.docTermsFromIndex(s, dir)
      .join(broadcast(dict.select("term", "poss", "stem")), Seq("term"))
      .groupBy("poss", "stem").agg(countDistinct("doc_id").as("df"))
  }

  /** The Snowball variant of the `text_en` chain [8x solr stock
    * `text_en` with SnowballPorterFilterFactory language="English"]:
    * unlike the classic chain (EnglishPossessiveFilter THEN
    * PorterStemFilter — [[textEnChain]]), the Snowball English stemmer
    * strips `'s` ITSELF (Porter2 step 0), so the chain needs no
    * separate possessive filter — the possessive forms here go
    * straight through [[graft.analysis.Porter2]]. Same dictionary-sized
    * dataflow: stems computed once on the distinct vocabulary,
    * df doc-distinct off the decoded postings.
    */
  def textEnPorter2Chain(s: SparkSession, dir: String): DataFrame =
    possessiveChain(s, dir, graft.analysis.Porter2.stem)

  /** FingerprintFilter [8x lucene/analysis/common .../miscellaneous/
    * FingerprintFilter.java, solr FingerprintFilterFactory]: collapse a
    * document's whole token stream into ONE fingerprint token — the
    * sorted, de-duplicated terms joined by a separator (Solr's
    * duplicate-detection analysis chain). Derived from the index's
    * posting docID streams (each (term, doc) pair exists exactly once
    * in the postings, so no distinct() shuffle), never by re-tokenizing
    * stored text; one per-doc sort-agg over dictionary-pair rows.
    */
  def fingerprintFilter(s: SparkSession, dir: String): DataFrame =
    Relational.docTermsFromIndex(s, dir)
      .groupBy("doc_id")
      .agg(collect_set("term").as("ts"))
      .select(col("doc_id"),
        concat_ws(" ", sort_array(col("ts"))).as("fingerprint"),
        size(col("ts")).cast("long").as("n_terms"))

  /** Shingle (token-bigram) dictionary — the ShingleFilter
    * [8x lucene/analysis/common .../shingle/ShingleFilter.java] at its
    * stock size (min=max=2): df/ctf per adjacent token pair. Decoded
    * from the index's POSITION payloads, not by re-tokenizing text;
    * adjacency = consecutive positions, so a stopword's position gap
    * correctly suppresses the shingle that would span it (the
    * reference's enablePositionIncrements semantics with no filler
    * emission). One shuffle: the per-doc window over (doc, pos).
    */
  def shingleDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = graft.IndexCache.documentsIndex(s, dir)
    val occ = v.postings
      .filter($"field" === Indexer.Field)
      .flatMap { b =>
        val d = PostingCodec.decode(b.docs, b.freqs, b.norms)
        val ps = PostingCodec.decodePositions(b.positions, d.freqs)
        Iterator.range(0, d.docIds.length).flatMap(i =>
          ps(i).iterator.map(p => (d.docIds(i), b.term, p)))
      }
      .toDF("doc_id", "term", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    occ
      .select(col("doc_id"), col("term"), col("pos"),
        lead("term", 1).over(w).as("nt"), lead("pos", 1).over(w).as("np"))
      .where(col("np") === col("pos") + 1)
      .groupBy(concat_ws(" ", col("term"), col("nt")).as("shingle"))
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("ctf"))
  }

  /** LimitTokenCountFilter [8x lucene/analysis/common .../miscellaneous/
    * LimitTokenCountFilter.java; Solr's old `maxFieldLength`]: only the
    * first `maxTokens` tokens a document emits are indexed — the
    * index-time truncation every large-document schema applies. The
    * filter sits right after the tokenizer (so stopwords count toward
    * the budget, matching the chain position Solr configures), then the
    * stop filter runs. Output: the truncated corpus's term dictionary
    * (df + ctf), which downstream differs from the full dictionary
    * exactly on the tail tokens. Fully narrow until the dictionary-
    * sized aggregate — no corpus-wide shuffle beyond the df count.
    */
  def limitTokenCount(s: SparkSession, dir: String,
                      maxTokens: Int = 40): DataFrame = {
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .where(col("pos") < maxTokens && length(col("col")) > 0 &&
        !col("col").isin(graft.analysis.Analyzer.EnglishStopWords.toSeq: _*))
      .groupBy(col("col").as("term"))
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("ctf"))
  }

  /** PathHierarchyTokenizer [8x lucene/analysis/common .../path/
    * PathHierarchyTokenizer.java]: a path field emits every ancestor
    * prefix as a token (`/a/b/c` → `/a`, `/a/b`, `/a/b/c`) so a prefix
    * filter on the tokenized field matches whole subtrees — the
    * canonical faceted-navigation / URL-path field for a web corpus.
    * Paths are synthesized deterministically from the stored fields
    * (source/lang/doc_id — the corpus has no real URL column,
    * TESTDATA.md); the tokenizer itself is the published prefix rule.
    * One narrow transform + explode, then a dictionary-sized count.
    */
  def pathHierarchyDf(s: SparkSession, dir: String): DataFrame = {
    val path = concat(lit("/"), col("source"), lit("/"), col("lang"),
      lit("/"), (col("doc_id") % 10).cast("string"))
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), path.as("p"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(split(p, '/'))), " +
          "k -> array_join(slice(split(p, '/'), 1, k), '/'))")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("df"))
  }

  /** UAX29URLEmailTokenizer [8x lucene/analysis/common .../standard/
    * UAX29URLEmailTokenizer.java]: the StandardTokenizer variant that
    * keeps URLs and e-mail addresses as SINGLE tokens instead of
    * splitting on punctuation — the web-corpus analysis front door.
    * The full UAX#29+RFC grammar is reduced to the alternation that is
    * total on this corpus's synthesized contact lines (scheme://…,
    * local@domain, else alphanumeric runs) — the same
    * restricted-input-twin honesty as `word_delimiter_parts`. The
    * token-type attribute (<URL>/<EMAIL>/<ALPHANUM>) is emitted like
    * the reference's TypeAttribute. Narrow regexp pass + small agg.
    */
  val UrlEmailPattern = "(https?://[a-z0-9./]+|[a-z0-9.]+@[a-z0-9.]+|[a-z0-9]+)"

  /** KeywordRepeatFilter + RemoveDuplicatesTokenFilter [8x
    * lucene/analysis/common .../miscellaneous/KeywordRepeatFilter.java,
    * RemoveDuplicatesTokenFilter.java] — the stock "index both the
    * surface form and its stem" chain: every token is emitted twice
    * (keyword-marked original + Porter stem at the same position),
    * then RemoveDuplicates drops the second copy when the stem equals
    * the original. Output = the combined dictionary's stats: per
    * emitted token, doc frequency (doc-distinct over the union of
    * source terms mapping to it) and ctf (total emissions). The
    * term→token map is dictionary-sized and broadcast; df comes from
    * the decoded posting pairs, ctf from the dictionary ctf sums — the
    * corpus is never re-tokenized.
    */
  def keywordRepeatDf(s: SparkSession, dir: String): DataFrame = {
    val v = graft.IndexCache.documentsIndex(s, dir)
    val stemU = udf(Porter.stem _)
    val dict = v.terms.where(col("field") === Indexer.Field)
      .groupBy("term").agg(sum("ctf").as("tctf"))
      .withColumn("stem", stemU(col("term")))
    val mapping = dict.select(col("term"), col("tctf"), explode(
        when(col("stem") === col("term"), array(col("term")))
          .otherwise(array(col("term"), col("stem")))).as("token"))
    Relational.docTermsFromIndex(s, dir)
      .join(broadcast(mapping.select("term", "token").distinct()), Seq("term"))
      .groupBy("token").agg(countDistinct("doc_id").as("df"))
      .join(mapping.groupBy("token").agg(sum("tctf").as("ctf")), Seq("token"))
  }

  /** StemmerOverrideFilter [8x lucene/analysis/common .../miscellaneous/
    * StemmerOverrideFilter.java]: a dictionary of hand-curated
    * lemmas applied BEFORE the algorithmic stemmer; an overridden token
    * is keyword-marked so Porter never touches it (the irregular-form
    * escape hatch every production `text_en` schema carries). Output =
    * the stemmed dictionary's df/ctf under the override map.
    */
  val StemOverrides: Map[String, String] =
    Map("data" -> "datum", "column" -> "col")

  def stemmerOverrideDf(s: SparkSession, dir: String): DataFrame = {
    val stemU = udf((t: String) => StemOverrides.getOrElse(t, Porter.stem(t)))
    dictRecount(s, dir, "stem", stemU(col("term")))
  }

  /** Shared dictionary-rewrite recount pipeline of the single-output
    * filters (StemmerOverride / PatternReplace / Truncate): rewrite the
    * DISTINCT dictionary via `mapped`, drop empty outputs, then df
    * doc-distinct over the rewritten form from the posting pairs and
    * ctf from the dictionary sums — the corpus is never re-tokenized.
    */
  private def dictRecount(s: SparkSession, dir: String, outName: String,
                          mapped: org.apache.spark.sql.Column): DataFrame = {
    val v = graft.IndexCache.documentsIndex(s, dir)
    val dict = v.terms.where(col("field") === Indexer.Field)
      .groupBy("term").agg(sum("ctf").as("tctf"))
      .withColumn(outName, mapped)
      .where(length(col(outName)) > 0)
    Relational.docTermsFromIndex(s, dir)
      .join(broadcast(dict.select("term", outName)), Seq("term"))
      .groupBy(outName).agg(countDistinct("doc_id").as("df"))
      .join(dict.groupBy(outName).agg(sum("tctf").as("ctf")), Seq(outName))
  }

  /** LengthFilter [8x lucene/analysis/common .../miscellaneous/
    * LengthFilter.java] — tokens outside [min, max] chars are dropped
    * from the indexed stream. Dictionary-routed: the predicate runs on
    * the terms table only (parquet-stat prunable at scale); the
    * surviving dictionary's per-term df/ctf is the output.
    */
  def lengthFilterDf(s: SparkSession, dir: String,
                     min: Int = 4, max: Int = 6): DataFrame = {
    val v = graft.IndexCache.documentsIndex(s, dir)
    v.terms.where(col("field") === Indexer.Field &&
        length(col("term")).between(min, max))
      .groupBy("term").agg(sum("df").as("df"), sum("ctf").as("ctf"))
  }

  /** PatternReplaceFilter [8x lucene/analysis/pattern/
    * PatternReplaceFilter.java] with `replaceAll` semantics — here the
    * vowel-strip pattern, so every vowel-bearing term visibly changes
    * form ("merge" → "mrg") and forms that collide group together;
    * empty outputs are dropped (the LengthFilter
    * companion every such chain appends). The regex is ONE shared
    * expression evaluated verbatim by Spark and the DuckDB oracle.
    * Rewrites run on the DISTINCT dictionary; df is doc-distinct over
    * the collapsed form from the posting pairs, ctf from dictionary
    * sums.
    */
  val PatternReplaceRegex = "[aeiou]"

  def patternReplaceDf(s: SparkSession, dir: String): DataFrame =
    dictRecount(s, dir, "rep",
      regexp_replace(col("term"), PatternReplaceRegex, ""))

  /** TruncateTokenFilter [8x lucene/analysis/common .../miscellaneous/
    * TruncateTokenFilter.java] — every token truncated to its first
    * `prefixLength` chars (the crude stemmer for agglutinative
    * languages; Solr `TruncateTokenFilterFactory`). Terms truncating to
    * the same prefix merge into one dictionary entry; df is doc-distinct
    * over the (possibly merged) truncated form, ctf summed.
    */
  def truncateDf(s: SparkSession, dir: String,
                 prefixLength: Int = 4): DataFrame =
    dictRecount(s, dir, "trunc", substring(col("term"), 1, prefixLength))

  def urlEmailTokens(s: SparkSession, dir: String): DataFrame = {
    val line = concat(lit("contact admin@"), col("source"),
      lit(".example.com or see https://www."), col("source"),
      lit(".org/"), col("lang"), lit(" for details"))
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), line.as("line"))
      .select(col("doc_id"),
        explode(expr(s"regexp_extract_all(line, '$UrlEmailPattern', 0)"))
          .as("token"))
      .select(col("doc_id"), col("token"),
        when(col("token").startsWith("http"), lit("URL"))
          .when(col("token").contains("@"), lit("EMAIL"))
          .otherwise(lit("ALPHANUM")).as("ttype"))
      .groupBy("token", "ttype")
      .agg(countDistinct("doc_id").as("df"))
  }

  /** Per-stage token stream of the `text_en`-style chain for one raw
    * token — the FieldAnalysisRequestHandler's per-filter breakdown [8x
    * solr/core/.../handler/FieldAnalysisRequestHandler.java, admin UI
    * "Analysis" screen]: each row is (stage_ord, stage, token) after
    * that stage; a stop-dropped token's stream ends after `lowercase`
    * (the handler shows exactly where a token disappears). Shared with
    * the DuckDB oracle's VALUES map (single source of truth; the chain
    * pieces are pinned by AnalyzerSpec/PorterSpec).
    */
  def fieldStages(raw: String): Seq[(Int, String, String)] = {
    // Locale.ROOT to match the indexed chain exactly (Analyzer
    // tokenizeRaw) — the default locale would misreport e.g. tr_TR 'I'
    val lower = raw.toLowerCase(java.util.Locale.ROOT)
    val head = Seq((1, "tokenizer", raw), (2, "lowercase", lower))
    if (graft.analysis.Analyzer.EnglishStopWords.contains(lower)) head
    else head ++ Seq((3, "stop", lower), (4, "porter", Porter.stem(lower)))
  }

  /** `/analysis/field` over the corpus vocabulary: for every DISTINCT
    * raw token of the documents corpus, the stage-by-stage token stream
    * of the index chain (tokenizer → lowercase → stop → porter).
    * Dictionary-sized and fully narrow after the distinct (the one
    * shuffle): at 100 TB the vocabulary is ~10⁶ rows while occurrences
    * are trillions — the handler introspects the schema chain, it never
    * re-reads the corpus per probe.
    */
  def analysisStages(s: SparkSession, dir: String): DataFrame = {
    val stagesU = udf((t: String) => fieldStages(t))
    s.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
      .distinct()
      .select(col("term"), explode(stagesU(col("term"))).as("st"))
      .select(col("term"), col("st._1").as("stage_ord"),
        col("st._2").as("stage"), col("st._3").as("token"))
  }
}
