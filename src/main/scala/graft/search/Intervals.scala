package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.codec.PostingCodec
import graft.index.IndexView

/**
 * Minimal-interval query algebra — re-derivation of the reference's
 * interval queries [8x queries/intervals/Intervals.java,
 * IntervalsSource, minimal-interval semantics after Clarke/Cormack and
 * Vigna's "Efficient optimally lazy algorithms for minimal-interval
 * semantics"]: every operator produces the MINIMAL set of matching
 * position intervals per document (no interval in the result properly
 * contains another), and combinators compose:
 *
 *  - [[Interval.Term]]        — one-position intervals of a term
 *  - [[Interval.Or]]          — union, minimalized
 *  - [[Interval.Ordered]]     — children in order, optional max gap
 *                               count (Intervals.maxgaps analog)
 *  - [[Interval.Unordered]]   — children in any order (min-window sweep)
 *  - [[Interval.MaxWidth]]    — width filter (Intervals.maxwidth)
 *  - [[Interval.Containing]] / [[Interval.ContainedBy]] — containment
 *                               filters, each with a negated form
 *  - [[Interval.Before]] / [[Interval.After]] — relative-position
 *                               filters (Intervals.before/after)
 *  - [[Interval.Overlapping]] — overlap filter + negation
 *                               (Intervals.overlapping/nonOverlapping)
 *  - [[Interval.AtLeast]]     — minimal windows covering n of k
 *                               children (Intervals.atLeast)
 *  - [[Interval.Extend]]      — pad intervals (Intervals.extend)
 *  - [[Interval.Prefix]] / [[Interval.Wildcard]] — dictionary-expanded
 *                               sources, resolved via [[resolve]]
 *
 * Evaluation is per document over decoded position lists (the same
 * two-phase shape as phrase/span matching: docs first, positions only
 * for docs containing every required term).
 */
object Interval {
  sealed trait Expr extends Serializable
  final case class Term(t: String) extends Expr
  final case class Or(children: Seq[Expr]) extends Expr
  /** Children must match in order, later child strictly after the
    * previous child's end. `maxGaps >= 0` bounds the total number of
    * uncovered positions inside the enclosing interval.
    */
  final case class Ordered(children: Seq[Expr], maxGaps: Int = -1) extends Expr
  final case class Unordered(children: Seq[Expr]) extends Expr
  final case class MaxWidth(child: Expr, width: Int) extends Expr
  /** Exact adjacency (Intervals.phrase): ordered with zero gaps. */
  def PhraseOf(children: Seq[Expr]): Expr = Ordered(children, maxGaps = 0)
  /** Intervals of `big` that contain an interval of `small`
    * (Intervals.containing) / the negation (notContaining).
    */
  final case class Containing(big: Expr, small: Expr,
                              negate: Boolean = false) extends Expr
  /** Intervals of `small` contained by an interval of `big`
    * (Intervals.containedBy) / the negation (notContainedBy).
    */
  final case class ContainedBy(small: Expr, big: Expr,
                               negate: Boolean = false) extends Expr
  /** Intervals of `a` that end before the start of some interval of `b`
    * (Intervals.before).
    */
  final case class Before(a: Expr, b: Expr) extends Expr
  /** Intervals of `a` that start after the end of some interval of `b`
    * (Intervals.after).
    */
  final case class After(a: Expr, b: Expr) extends Expr
  /** Intervals of `a` overlapping some interval of `b`
    * (Intervals.overlapping) / the negation (nonOverlapping).
    */
  final case class Overlapping(a: Expr, b: Expr,
                               negate: Boolean = false) extends Expr
  /** Minimal intervals covering at least `n` of the children
    * (Intervals.atLeast — MinimumShouldMatchIntervalsSource).
    * Evaluated as the minimalized union over all n-subsets' unordered
    * windows: any minimal >= n window is an unordered window of some
    * n-subset, so the union contains every candidate and minimalization
    * keeps exactly the minimal ones. Child count is bounded like the
    * reference's clause limit (here: combinations must stay small).
    */
  final case class AtLeast(n: Int, children: Seq[Expr]) extends Expr {
    require(n >= 1 && n <= children.size, "need 1 <= n <= #children")
    require(children.size <= 8, "atLeast children capped at 8")
  }
  /** Dictionary-expanded sources (Intervals.prefix / Intervals.wildcard):
    * rewritten by [[resolve]] into an Or over the matching terms of the
    * index's term dictionary, capped at 128 expansions like the
    * reference's automaton bound.
    */
  final case class Prefix(prefix: String) extends Expr
  final case class Wildcard(pattern: String) extends Expr
  final case class Fuzzy(term: String, maxEdits: Int = 1) extends Expr
  /** Intervals ending within the first `n` positions (SpanFirstQuery
    * [8x search/spans/SpanFirstQuery.java]: end < n, 0-based).
    */
  final case class First(child: Expr, n: Int) extends Expr
  /** Pad every child interval by `before`/`after` positions
    * (Intervals.extend); padding counts as covered for the gap metric,
    * start clamped at 0, re-minimalized (clamping can create
    * containment).
    */
  final case class Extend(child: Expr, before: Int, after: Int) extends Expr

  val MaxDictExpansions = 128 // the reference's interval automaton cap

  /** Rewrite dictionary-expanded sources against the index's term
    * dictionary. MUST run before [[eval]]/[[matches]] sees the tree —
    * Prefix/Wildcard have no term set until resolved.
    */
  def resolve(e: Expr, view: IndexView): Expr = e match {
    case Prefix(p) =>
      val ts = MoreQueries.prefixTerms(view, p)
      require(ts.size <= MaxDictExpansions,
        s"prefix '$p' expands to > $MaxDictExpansions terms")
      Or(ts.map(Term(_)))
    case Wildcard(w) =>
      val ts = MoreQueries.wildcardTerms(view, w)
      require(ts.size <= MaxDictExpansions,
        s"wildcard '$w' expands to > $MaxDictExpansions terms")
      Or(ts.map(Term(_)))
    case Fuzzy(t, n) =>
      val ts = MoreQueries.fuzzyTerms(view, t, n)
      require(ts.size <= MaxDictExpansions,
        s"fuzzy '$t'~$n expands to > $MaxDictExpansions terms")
      Or(ts.map(Term(_)))
    case First(c, n)       => First(resolve(c, view), n)
    case Term(_)        => e
    case Or(cs)         => Or(cs.map(resolve(_, view)))
    case Ordered(cs, g) => Ordered(cs.map(resolve(_, view)), g)
    case Unordered(cs)  => Unordered(cs.map(resolve(_, view)))
    case MaxWidth(c, w) => MaxWidth(resolve(c, view), w)
    case Containing(b, sm, n)  => Containing(resolve(b, view), resolve(sm, view), n)
    case ContainedBy(sm, b, n) => ContainedBy(resolve(sm, view), resolve(b, view), n)
    case Before(a, b)      => Before(resolve(a, view), resolve(b, view))
    case After(a, b)       => After(resolve(a, view), resolve(b, view))
    case Overlapping(a, b, n) => Overlapping(resolve(a, view), resolve(b, view), n)
    case AtLeast(n, cs)    => AtLeast(n, cs.map(resolve(_, view)))
    case Extend(c, b, a)   => Extend(resolve(c, view), b, a)
  }

  /** All terms referenced by an expression. */
  def termsOf(e: Expr): Seq[String] = e match {
    case Term(t)        => Seq(t)
    case Or(cs)         => cs.flatMap(termsOf)
    case Ordered(cs, _) => cs.flatMap(termsOf)
    case Unordered(cs)  => cs.flatMap(termsOf)
    case MaxWidth(c, _) => termsOf(c)
    case Containing(b, s, _)  => termsOf(b) ++ termsOf(s)
    case ContainedBy(s, b, _) => termsOf(s) ++ termsOf(b)
    case Before(a, b)         => termsOf(a) ++ termsOf(b)
    case After(a, b)          => termsOf(a) ++ termsOf(b)
    case Overlapping(a, b, _) => termsOf(a) ++ termsOf(b)
    case AtLeast(_, cs)       => cs.flatMap(termsOf)
    case Extend(c, _, _)      => termsOf(c)
    case First(c, _)          => termsOf(c)
    case Prefix(p)   => sys.error(s"unresolved Prefix($p): call resolve() first")
    case Wildcard(w) => sys.error(s"unresolved Wildcard($w): call resolve() first")
    case Fuzzy(t, _) => sys.error(s"unresolved Fuzzy($t): call resolve() first")
  }

  /** Necessary term groups of an expression: a matching doc must contain
    * >= 1 term of EVERY group (an Or collapses to one group — any child
    * can satisfy it; every other node requires all its children). Drives
    * the docs-only prefilter in [[MoreQueries.positionalPostings]].
    */
  private def requiredGroups(e: Expr): Seq[Seq[String]] = e match {
    case Term(t)        => Seq(Seq(t))
    case Or(cs)         => Seq(cs.flatMap(termsOf).distinct)
    case Ordered(cs, _) => cs.flatMap(requiredGroups)
    case Unordered(cs)  => cs.flatMap(requiredGroups)
    case MaxWidth(c, _) => requiredGroups(c)
    // a NEGATED filter side is not required: docs lacking its terms
    // entirely satisfy the negation (requiring them would silently drop
    // exactly the docs most likely to match)
    case Containing(b, s, neg)  =>
      if (neg) requiredGroups(b) else requiredGroups(b) ++ requiredGroups(s)
    case ContainedBy(s, b, neg) =>
      if (neg) requiredGroups(s) else requiredGroups(s) ++ requiredGroups(b)
    case Before(a, b)      => requiredGroups(a) ++ requiredGroups(b)
    case After(a, b)       => requiredGroups(a) ++ requiredGroups(b)
    case Overlapping(a, b, neg) =>
      if (neg) requiredGroups(a) else requiredGroups(a) ++ requiredGroups(b)
    // n of k: only "some child term present" is necessary (n == k would
    // allow all groups, but the Or-style union is always safe)
    case AtLeast(n, cs) =>
      if (n == cs.size) cs.flatMap(requiredGroups)
      else Seq(cs.flatMap(termsOf).distinct)
    case Extend(c, _, _) => requiredGroups(c)
    case First(c, _)     => requiredGroups(c)
    case Prefix(p)   => sys.error(s"unresolved Prefix($p): call resolve() first")
    case Wildcard(w) => sys.error(s"unresolved Wildcard($w): call resolve() first")
    case Fuzzy(t, _) => sys.error(s"unresolved Fuzzy($t): call resolve() first")
  }

  /** (start, end, coveredLen) — coveredLen is the total length of the
    * leaf intervals inside (for the gap metric).
    */
  private type Iv = (Int, Int, Int)

  /** Keep only minimal intervals (none properly containing another),
    * sorted by start asc; input may be any order. O(n log n).
    */
  private def minimalize(ivs: Array[Iv]): Array[Iv] = {
    if (ivs.length <= 1) return ivs
    val sorted = ivs.distinct.sortBy(iv => (-iv._1, iv._2)) // start desc, end asc
    val out = new scala.collection.mutable.ArrayBuffer[Iv](sorted.length)
    var minEnd = Int.MaxValue
    sorted.foreach { iv =>
      if (iv._2 < minEnd) { out += iv; minEnd = iv._2 }
    }
    out.reverseIterator.toArray // start asc, ends strictly increasing
  }

  /** Evaluate to the minimal interval set of one document. */
  private[graft] def eval(e: Expr,
                          posByTerm: Map[String, Array[Int]]): Array[Iv] = e match {
    case Term(t) =>
      posByTerm.getOrElse(t, Array.emptyIntArray).map(p => (p, p, 1))
    case Or(cs) =>
      minimalize(cs.toArray.flatMap(c => eval(c, posByTerm)))
    case MaxWidth(c, w) =>
      eval(c, posByTerm).filter(iv => iv._2 - iv._1 + 1 <= w)
    case Containing(b, s, neg) =>
      // filters never break minimality (they only remove intervals)
      val smalls = eval(s, posByTerm)
      eval(b, posByTerm).filter { big =>
        smalls.exists(sm => big._1 <= sm._1 && sm._2 <= big._2) != neg
      }
    case ContainedBy(s, b, neg) =>
      val bigs = eval(b, posByTerm)
      eval(s, posByTerm).filter { sm =>
        bigs.exists(big => big._1 <= sm._1 && sm._2 <= big._2) != neg
      }
    case Before(a, b) =>
      val refs = eval(b, posByTerm)
      eval(a, posByTerm).filter(iv => refs.exists(r => iv._2 < r._1))
    case After(a, b) =>
      val refs = eval(b, posByTerm)
      eval(a, posByTerm).filter(iv => refs.exists(r => r._2 < iv._1))
    case Overlapping(a, b, neg) =>
      val refs = eval(b, posByTerm)
      eval(a, posByTerm).filter { iv =>
        refs.exists(r => r._1 <= iv._2 && iv._1 <= r._2) != neg
      }
    case Ordered(cs, maxGaps) =>
      val lists = cs.map(c => eval(c, posByTerm))
      if (lists.exists(_.isEmpty)) Array.empty[Iv]
      else {
        // for each first-child interval, chain greedily: the first
        // following interval of each next child (children are minimal
        // with increasing starts AND ends, so the earliest-starting
        // follower also has the minimal end) — yields the minimal
        // ordered interval anchored at that start, then minimalize.
        val out = lists.head.flatMap { first =>
          var end = first._2
          var covered = first._3
          var ok = true
          lists.tail.foreach { lst =>
            if (ok) {
              val i = indexOfFirstStartAfter(lst, end)
              if (i < 0) ok = false
              else { end = lst(i)._2; covered += lst(i)._3 }
            }
          }
          if (ok) Some((first._1, end, covered)) else None
        }
        // minimalize FIRST, then apply the gap filter (the reference's
        // maxgaps wraps the minimal iterator)
        minimalize(out).filter(iv =>
          maxGaps < 0 || (iv._2 - iv._1 + 1) - iv._3 <= maxGaps)
      }
    case First(c, n) =>
      eval(c, posByTerm).filter(_._2 < n) // filter keeps minimality
    case Extend(c, before, after) =>
      minimalize(eval(c, posByTerm).map { iv =>
        val ns = math.max(0, iv._1 - before)
        (ns, iv._2 + after, iv._3 + (iv._1 - ns) + after)
      })
    case Prefix(p)   => sys.error(s"unresolved Prefix($p): call resolve() first")
    case Wildcard(w) => sys.error(s"unresolved Wildcard($w): call resolve() first")
    case Fuzzy(t, _) => sys.error(s"unresolved Fuzzy($t): call resolve() first")
    case AtLeast(n, cs) =>
      // evaluate every child ONCE, sweep each n-subset over the cached
      // interval lists (a child appears in C(k-1, n-1) subsets)
      val evald = cs.map(c => eval(c, posByTerm)).toArray
      minimalize(evald.indices.combinations(n).toArray.flatMap { sub =>
        unorderedSweep(sub.map(evald).toArray)
      })
    case Unordered(cs) =>
      unorderedSweep(cs.map(c => eval(c, posByTerm)).toArray)
  }

  /** Minimal unordered windows over pre-evaluated child interval lists:
    * classic min-window sweep — one cursor per child, record the current
    * window, advance the child whose interval starts first.
    */
  private def unorderedSweep(lists: Array[Array[Iv]]): Array[Iv] = {
    if (lists.exists(_.isEmpty)) Array.empty[Iv]
    else {
      val idx = Array.fill(lists.length)(0)
      val out = new scala.collection.mutable.ArrayBuffer[Iv]()
      var done = false
      while (!done) {
        var mnStart = Int.MaxValue; var mxEnd = Int.MinValue
        var covered = 0; var argmin = -1
        var i = 0
        while (i < lists.length) {
          val iv = lists(i)(idx(i))
          if (iv._1 < mnStart) { mnStart = iv._1; argmin = i }
          if (iv._2 > mxEnd) mxEnd = iv._2
          covered += iv._3
          i += 1
        }
        out += ((mnStart, mxEnd, math.min(covered, mxEnd - mnStart + 1)))
        idx(argmin) += 1
        if (idx(argmin) >= lists(argmin).length) done = true
      }
      minimalize(out.toArray)
    }
  }

  private def indexOfFirstStartAfter(lst: Array[Iv], pos: Int): Int = {
    // first interval with start > pos (starts are strictly increasing)
    var lo = 0; var hi = lst.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lst(mid)._1 <= pos) lo = mid + 1 else hi = mid
    }
    if (lo < lst.length) lo else -1
  }

  /** (doc_id, n_intervals) for docs with >= 1 minimal matching interval
    * — the IntervalQuery match surface (its score would feed the same
    * per-doc freq into the similarity, like phrase_tf).
    */
  def matches(spark: SparkSession, view: IndexView, expr0: Expr): DataFrame = {
    import spark.implicits._
    val expr = resolve(expr0, view) // expand prefix/wildcard sources
    val terms = termsOf(expr).distinct
    val bcExpr = spark.sparkContext.broadcast(expr)
    val perDoc = MoreQueries.positionalPostings(spark, view, terms,
        requiredGroups(expr))
      .groupByKey(_._1)
      .mapGroups { (docId, it) =>
        val posByTerm = it.map(t => t._2 -> t._3).toMap
        (docId, eval(bcExpr.value, posByTerm).length)
      }
    perDoc.filter(_._2 > 0).toDF("doc_id", "n_intervals")
  }
}
