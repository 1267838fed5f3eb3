package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Index-time synonym injection — the reference's `SynonymGraphFilter`
  * + `FlattenGraphFilter` pair [8x lucene/analysis/common
  * .../synonym/SynonymGraphFilter.java, SynonymMap.java,
  * core/.../FlattenGraphFilter.java]: rewrite the token stream so
  * matched input phrases ALSO emit their synonyms as real tokens, which
  * then index as ordinary postings (query-time synonym blending is the
  * separate `SynonymQuery` operator, already implemented).
  *
  * Matching and emission semantics (the flattened index-time contract):
  *
  *  - rules match CONSECUTIVE tokens of the raw lowercased stream
  *    (before stop filtering, like a schema chain that puts synonyms
  *    before the stop filter); at each position the LONGEST matching
  *    rule wins and scanning resumes after the matched input (the
  *    reference's parse-then-jump);
  *  - outputs are injected at the position of the FIRST matched token;
  *    a multi-token output occupies consecutive positions from there
  *    (exactly what FlattenGraphFilter produces for indexing);
  *  - originals are always kept (`keepOrig`, the expand=true contract
  *    expressed by rule construction: [[equivalence]] gives every
  *    member of the class the others as outputs);
  *  - injected tokens do NOT count toward the doc length norm — the
  *    reference's `discountOverlaps=true` default (position-increment-0
  *    tokens are excluded from the norm);
  *  - stop filtering applies after injection (an output that is a stop
  *    word is dropped).
  *
  * Pure per-doc function — docIDs and postings stay a pure function of
  * the data at any parallelism.
  */
final case class SynRule(input: List[String], output: List[String])

object SynonymGraph {

  /** Equivalence class ("a, b, c" in Solr synonyms.txt with
    * expand=true): every member emits every other member.
    */
  def equivalence(terms: String*): Seq[SynRule] =
    terms.map(t => SynRule(List(t), terms.filterNot(_ == t).toList))

  /** Prebuilt rule dispatch (head token → candidate rules). Build ONCE
    * per task/partition, not per document — the per-doc-allocation
    * discipline of the index build path.
    */
  def matcher(rules: Seq[SynRule]): Map[String, Seq[SynRule]] =
    rules.groupBy(_.input.head)

  /** Analyze with synonym injection: tokenize raw (lowercase, positions
    * 0,1,2,…), match + inject, stop-filter, aggregate to per-term
    * postings. `dl` counts only the surviving ORIGINAL tokens.
    */
  def analyze(text: String, rules: Seq[SynRule],
              stopWords: Set[String] = Analyzer.EnglishStopWords): DocTerms =
    analyzeWith(text, matcher(rules), stopWords)

  def analyzeWith(text: String, byFirst: Map[String, Seq[SynRule]],
                  stopWords: Set[String]): DocTerms = {
    val raw = Analyzer.tokenizeRaw(text)
    val injected = ArrayBuffer.empty[Token]
    var i = 0
    while (i < raw.length) {
      var best: SynRule = null
      byFirst.get(raw(i).term) match {
        case Some(cands) =>
          cands.foreach { r =>
            val len = r.input.length
            if ((best == null || len > best.input.length) &&
                len <= raw.length - i) {
              var ok = true
              var j = 1 // head already matched via the byFirst key
              while (ok && j < len) {
                if (raw(i + j).term != r.input(j)) ok = false
                j += 1
              }
              if (ok) best = r
            }
          }
        case None => ()
      }
      if (best != null) {
        val basePos = raw(i).pos
        var oi = 0
        best.output.foreach { t => injected += Token(t, basePos + oi); oi += 1 }
        i += best.input.length
      } else i += 1
    }
    val surviving = raw.filterNot(t => stopWords.contains(t.term))
    val inj = injected.filterNot(t => stopWords.contains(t.term))
    val all = surviving ++ inj
    val terms = all.groupBy(_.term).toArray.sortBy(_._1).map { case (t, ts) =>
      TermInDoc(t, ts.length, ts.map(_.pos).sorted)
    }
    DocTerms(surviving.length, terms)
  }
}
