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
}
