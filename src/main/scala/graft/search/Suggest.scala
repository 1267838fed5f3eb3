package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.IndexView

/** Suggest / spellcheck over the term dictionary — the reference's
  * suggester and did-you-mean surfaces [8x lucene/suggest
  * AnalyzingSuggester.java, search/spell/DirectSpellChecker.java; Solr
  * SuggestComponent/SpellCheckComponent], re-derived on the terms
  * table: both are small dictionary-side computations (the dictionary
  * is orders of magnitude smaller than the corpus), ranked exactly so
  * a SQL oracle reproduces them.
  */
object Suggest {

  /** Prefix suggester: top-k dictionary terms with `prefix`, ranked by
    * total occurrence count (the suggester's weight) desc, term asc —
    * the AnalyzingSuggester contract with weight = corpus frequency.
    */
  def suggestPrefix(s: SparkSession, view: IndexView, prefix: String,
                    k: Int): DataFrame =
    view.terms
      .where(col("term").startsWith(prefix))
      .groupBy("term").agg(sum("ctf").as("weight"))
      .orderBy(col("weight").desc, col("term").asc)
      .limit(k)

  /** Context-filtered prefix suggester [8x lucene/suggest .../document/
    * ContextQuery.java; Solr suggester contextField]: suggestions for
    * `prefix` restricted to a context (here lang), weighted by the
    * term's doc frequency WITHIN the context. The prefix predicate
    * prunes the posting blocks (sargable on the sorted term column);
    * only their docID streams are decoded and semi-joined against the
    * context doc set (a two-column docvalues read of the stored
    * fields) — the corpus text is never touched and the expensive side
    * is bounded by the prefix's postings, not the corpus.
    */
  def suggestContext(s: SparkSession, view: IndexView, dir: String,
                     prefix: String, lang: String, k: Int): DataFrame = {
    import s.implicits._
    val ctx = s.read.parquet(s"$dir/documents.parquet")
      .where(col("lang") === lang).select("doc_id")
    view.postings
      .where(col("term").startsWith(prefix))
      .flatMap(b => graft.codec.VByte.decodeDeltas(b.docs)
        .map(d => (b.term, d)))
      .toDF("term", "doc_id")
      .join(ctx, Seq("doc_id"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("weight"))
      .orderBy(col("weight").desc, col("term").asc)
      .limit(k)
  }

  /** Edge-n-gram completion dictionary [8x analysis/common
    * EdgeNGramTokenFilter.java; Solr FreeTextSuggester-style lookup]:
    * every 2..maxGram prefix of every dictionary term, weighted by the
    * terms' total occurrence count — the index-time expansion behind
    * instant prefix lookup (the completion FST analog). Dictionary-side
    * only: the corpus is never re-read, and the explode fans out ≤
    * maxGram-1 rows per dictionary term.
    */
  def edgeNgramDict(s: SparkSession, view: IndexView, maxGram: Int,
                    k: Int): DataFrame = {
    // sequence(2, 1) would generate DESCENDING [2, 1] and emit 1-grams
    require(maxGram >= 2, s"edgeNgramDict needs maxGram >= 2, got $maxGram")
    view.terms
      .groupBy("term").agg(sum("ctf").as("ctf"))
      .where(length(col("term")) >= 2)
      .select(explode(sequence(lit(2), least(lit(maxGram), length(col("term")))))
        .as("g"), col("term"), col("ctf"))
      .groupBy(expr("substring(term, 1, g)").as("gram"))
      .agg(sum("ctf").as("weight"))
      .orderBy(col("weight").desc, col("gram").asc)
      .limit(k)
  }

  /** Infix suggester [8x lucene/suggest .../analyzing/
    * AnalyzingInfixSuggester.java]: suggestions whose text contains the
    * typed fragment ANYWHERE, ranked by weight — the "search-as-you-
    * type from the middle" surface. An unanchored contains cannot prune
    * the dictionary, so the reference indexes grams of the suggestion
    * text; here stage 1 cuts candidates with the character-3-gram
    * codebook (terms containing EVERY 3-gram of the fragment — bounded
    * gram-key lookups, dictionary-sized), and stage 2 verifies the
    * exact contains on the candidates only. Weight = corpus frequency,
    * the same rank key as [[suggestPrefix]].
    */
  def suggestInfix(s: SparkSession, view: IndexView, fragment: String,
                   k: Int): DataFrame = {
    val fgrams = graft.operators.AnalysisOps.charNgrams(fragment, 3)
    require(fgrams.nonEmpty, s"fragment must be >= 3 chars: '$fragment'")
    val ngU = udf((t: String) => graft.operators.AnalysisOps.charNgrams(t, 3))
    view.terms
      .groupBy("term").agg(sum("ctf").as("weight"))
      .select(col("term"), col("weight"), explode(ngU(col("term"))).as("gram"))
      .where(col("gram").isin(fgrams: _*))
      .groupBy("term", "weight").agg(countDistinct("gram").as("ng"))
      .where(col("ng") === fgrams.size && col("term").contains(fragment))
      .select(col("term"), col("weight"))
      .orderBy(col("weight").desc, col("term").asc)
      .limit(k)
  }

  /** Did-you-mean: candidate corrections within `maxEdits` of the
    * (presumably unindexed) input, ranked by (edit distance asc,
    * document frequency desc, term asc) — DirectSpellChecker's
    * more-popular ordering.
    */
  def spellcheck(s: SparkSession, view: IndexView, input: String,
                 maxEdits: Int, k: Int): DataFrame =
    view.terms
      .groupBy("term").agg(sum("df").as("df"))
      .select(col("term"), col("df"),
        levenshtein(col("term"), lit(input)).as("dist"))
      .where(col("dist") <= maxEdits && col("dist") > 0)
      .orderBy(col("dist").asc, col("df").desc, col("term").asc)
      .limit(k)

  /** Spellcheck collation [8x solr/core .../spelling/SpellCheckCollator
    * .java, `spellcheck.collate=true`]: correct EVERY word of a
    * multi-word query and keep only combinations that actually produce
    * conjunctive hits, ranked by hit count. Candidate enumeration per
    * word is the [[spellcheck]] ranking (edit distance, then df) cut to
    * `perTerm` — a handful of terms, collected driver-side exactly like
    * the reference's collator building trial queries; the hit counts
    * come from ONE decode of the candidates' posting docID streams.
    */
  def collate(s: SparkSession, view: IndexView, dir: String,
              w1: String, w2: String, maxEdits: Int, perTerm: Int,
              k: Int): DataFrame = {
    def cands(w: String): Array[String] =
      spellcheck(s, view, w, maxEdits, perTerm)
        .select("term").collect().map(_.getString(0))
    val ts1 = cands(w1)
    val ts2 = cands(w2)
    val occ = graft.operators.Relational.docTermsFromIndex(s, dir,
      Some(col("term").isin((ts1 ++ ts2).distinct.toSeq: _*)))
    val o1 = occ.where(col("term").isin(ts1.toSeq: _*))
      .withColumnRenamed("term", "t1")
    val o2 = occ.where(col("term").isin(ts2.toSeq: _*))
      .withColumnRenamed("term", "t2")
    o1.join(o2, Seq("doc_id"))
      .groupBy("t1", "t2").agg(countDistinct("doc_id").as("hits"))
      .select(concat_ws(" ", col("t1"), col("t2")).as("collated"),
        col("hits"))
      .orderBy(col("hits").desc, col("collated").asc).limit(k)
  }

  /** Free-text (next-word) suggester [8x lucene/suggest .../analyzing/
    * FreeTextSuggester.java]: given the previous word, rank candidate
    * next words by corpus bigram frequency — the reference builds an
    * n-gram LM FST from one analysis pass over the corpus at build
    * time; this is that build pass cut to the queried context. The
    * successor extraction is fully NARROW (one zip of adjacent token
    * slots, codegen-fused) and filters to `prev`'s successors BEFORE
    * the shuffle, so only matching bigrams — not the token stream —
    * ever flow into the aggregate. At scale the unfiltered bigram
    * table is materialized once per corpus like [[edgeNgramDict]].
    */
  def freeText(s: SparkSession, corpus: DataFrame, prev: String,
               k: Int): DataFrame = {
    require(prev.matches("[a-z0-9]+"), s"analyzed single word: '$prev'")
    corpus
      .select(split(col("text"), " ").as("w"))
      .select(explode(expr(
        s"""filter(
           |  transform(sequence(1, size(w) - 1),
           |    i -> IF(element_at(w, i) = '$prev', element_at(w, i + 1), NULL)),
           |  x -> x IS NOT NULL AND length(x) > 0)""".stripMargin))
        .as("next_term"))
      .groupBy("next_term").agg(count(lit(1)).as("weight"))
      .orderBy(col("weight").desc, col("next_term").asc)
      .limit(k)
  }

  /** Word-break spellcheck [8x lucene/suggest .../spell/
    * WordBreakSpellChecker.java#suggestWordBreaks; Solr
    * WordBreakSolrSpellChecker]: for compound inputs that are NOT
    * dictionary terms, enumerate every split point whose two halves
    * both are (with df ≥ `minDf`), ranked by the limiting half's
    * document frequency (freq = min(df_left, df_right)) desc,
    * suggestion asc. The split enumeration is a tiny literal frame
    * (#inputs × word length) broadcast against the dictionary — two
    * dictionary joins, the corpus is never read.
    */
  /** Fuzzy completion suggester [8x lucene/suggest .../analyzing/
    * FuzzySuggester.java]: completions whose indexed prefix is within
    * `maxEdits` Levenshtein of the typed prefix, ranked by weight
    * (here corpus df, like [[edgeNgramDict]]'s weighting). The
    * reference intersects a Levenshtein automaton with the suggest
    * FST; this analog compares the typed prefix against the term's
    * leading substring at lengths |p|−1, |p|, |p|+1 (an edit changes
    * the matched-prefix length by at most one), taking the minimum —
    * a dictionary-only scan, never the corpus. nonFuzzyPrefix = 1:
    * the first character must match exactly (the reference's default,
    * and the index-side prefix prune at scale).
    */
  def fuzzySuggest(s: SparkSession, view: IndexView, prefix: String,
                   maxEdits: Int, k: Int): DataFrame = {
    require(prefix.length >= 2, "fuzzy suggest needs >= 2 chars")
    val p = prefix.length
    val lev = Seq(p - 1, p, p + 1)
      .map(l => levenshtein(expr(s"substring(term, 1, $l)"), lit(prefix)))
      .reduce(least(_, _))
    view.terms.groupBy("term").agg(sum("df").as("weight"))
      .where(expr(s"substring(term, 1, 1)") === prefix.substring(0, 1) &&
        length(col("term")) >= p - maxEdits && lev <= maxEdits)
      .orderBy(col("weight").desc, col("term").asc)
      .limit(k)
  }

  def wordBreak(s: SparkSession, view: IndexView, inputs: Seq[String],
                minDf: Long, k: Int): DataFrame = {
    import s.implicits._
    val splits = inputs.flatMap { in =>
      (1 until in.length).map(i => (in, in.take(i), in.drop(i)))
    }.toDF("input", "left", "right")
    val df = view.terms.groupBy("term").agg(sum("df").as("df"))
    val inDict = df.select(col("term").as("input"))
    broadcast(splits)
      .join(inDict, Seq("input"), "left_anti") // only break NON-terms
      .join(df.select(col("term").as("left"), col("df").as("df_l")), Seq("left"))
      .join(df.select(col("term").as("right"), col("df").as("df_r")), Seq("right"))
      .where(col("df_l") >= minDf && col("df_r") >= minDf)
      .select(col("input"),
        concat_ws(" ", col("left"), col("right")).as("suggestion"),
        least(col("df_l"), col("df_r")).as("freq"))
      .orderBy(col("freq").desc, col("suggestion").asc)
      .limit(k)
  }

  /** BlendedInfixSuggester [8x lucene/suggest .../analyzing/
    * BlendedInfixSuggester.java, BlenderType.POSITION_LINEAR]: infix
    * suggestions whose weight is DISCOUNTED by how deep into the
    * suggestion the matched token sits — coefficient 0.10 per position,
    * the reference's linear blender, on the integer grid
    * (w·(10−pos) div 10) so ranking is data-pure. The suggestion set is
    * the corpus bigram table (the index-positions shingle kernel —
    * dictionary-sized, corpus text never read); the matched position is
    * the first token containing the fragment.
    */
  def suggestBlended(s: SparkSession, dir: String, fragment: String,
                     k: Int): DataFrame = {
    val sh = graft.operators.AnalysisOps.shingleDf(s, dir)
    val w0 = element_at(split(col("shingle"), " "), 1)
    val w1 = element_at(split(col("shingle"), " "), 2)
    sh.select(col("shingle").as("suggestion"), col("ctf").as("weight"),
        when(w0.contains(fragment), lit(0L))
          .when(w1.contains(fragment), lit(1L))
          .otherwise(lit(-1L)).as("pos"))
      .where(col("pos") >= 0)
      .select(col("suggestion"), col("weight"), col("pos"),
        expr("(weight * (10 - pos)) div 10").as("blended_q"))
      .orderBy(col("blended_q").desc, col("suggestion").asc)
      .limit(k)
  }
}
