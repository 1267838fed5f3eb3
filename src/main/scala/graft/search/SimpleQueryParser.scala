package graft.search

/** Simple query parser — the error-TOLERANT end-user parser face [8x
  * lucene/queryparser/.../simple/SimpleQueryParser.java; Solr
  * SimpleQParserPlugin `{!simple}`]: the operator set is `+` (AND),
  * `|` (OR), `-` (NOT), `"…"` phrase (with `~N` slop), trailing `*`
  * prefix, `~N` fuzzy, `(…)` grouping and `\` escapes — and, the
  * defining contract, **it never throws**: malformed input degrades
  * gracefully (an unterminated phrase runs to end-of-input, an
  * unmatched `)` is ignored, a dangling operator is dropped), because
  * this parser fronts raw end-user search boxes. Clean-room from the
  * PUBLISHED operator/degradation contract; combination is
  * left-associative exactly as documented (`a | b + c` folds as
  * `(a OR b) AND c` — the simple grammar has no precedence beyond
  * parentheses).
  *
  * Occur semantics per the reference: the default connective is OR;
  * `-` marks the next clause prohibited (MUST_NOT on the enclosing
  * bool — a purely negative query matches nothing, as the reference's
  * all-MUST_NOT BooleanQuery does). Terms are analyzer-normalized
  * (lowercase) and keyed through the same pluggable `termKey` as the
  * classic parser, so both faces share the multi-field layout.
  */
object SimpleQueryParser {
  import Query._

  val DefaultFuzzyEdits = 2

  def parse(q: String,
            termKey: (Option[String], String) => String =
              QueryParser.defaultTermKey): Query =
    new P(q, termKey).parseAll()

  private final class P(
      s: String, termKey: (Option[String], String) => String) {
    private var i = 0

    def parseAll(): Query = parseExpr(0)

    /** One (sub)expression, up to an unmatched `)` at depth > 0 or end
      * of input. Left-associative fold: each clause joins the running
      * result with the operator that preceded it (default OR).
      */
    private def parseExpr(depth: Int): Query = {
      var result: Option[Query] = None
      var negAcc = List.empty[Query] // prohibited clauses at this level
      var nextOp: Char = '|'         // connective for the NEXT clause
      var done = false
      while (!done) {
        skipWs()
        if (i >= s.length) done = true
        else s(i) match {
          case ')' =>
            if (depth > 0) { i += 1; done = true }
            else i += 1 // tolerance: unmatched ')' at top level ignored
          case '+' => i += 1; nextOp = '+'
          case '|' => i += 1; nextOp = '|'
          case '-' =>
            i += 1
            clause(depth) match {
              case Some(c) => negAcc ::= c
              case None    => () // dangling '-': tolerance, dropped
            }
            // a prohibited clause CONSUMES its preceding operator
            // (otherwise "a + -x b" would leak the '+' onto b)
            nextOp = '|'
          case _ =>
            clause(depth) match {
              case Some(c) =>
                result = Some(result match {
                  case None       => c
                  case Some(prev) =>
                    if (nextOp == '+') andCombine(prev, c)
                    else orCombine(prev, c)
                })
                nextOp = '|'
              case None => () // empty clause (e.g. "" phrase): dropped
            }
        }
      }
      (result, negAcc.reverse) match {
        case (None, Nil)      =>
          // empty input: the reference returns a match-no-docs query;
          // an empty Bool compiles to exactly that
          Bool()
        case (Some(q), Nil)   => q
        case (Some(q), negs)  => q match {
          case Bool(sh, mu, no, fi, msm) if no.isEmpty =>
            Bool(sh, mu, negs, fi, msm)
          case other => Bool(should = Seq(other), mustNot = negs)
        }
        case (None, negs)     =>
          // purely negative: matches nothing (all-MUST_NOT BooleanQuery)
          Bool(mustNot = negs)
      }
    }

    /** `a + b` → MUST bag (flattening a previous `+` fold). */
    private def andCombine(prev: Query, c: Query): Query = prev match {
      case Bool(Nil, mu, Nil, Nil, 0) if mu.nonEmpty => Bool(must = mu :+ c)
      case _ => Bool(must = Seq(prev, c))
    }

    /** `a | b` / default-OR → SHOULD bag (flattening). */
    private def orCombine(prev: Query, c: Query): Query = prev match {
      case Bool(sh, Nil, Nil, Nil, 0) if sh.nonEmpty => Bool(should = sh :+ c)
      case _ => Bool(should = Seq(prev, c))
    }

    /** Nesting cap: beyond it a '(' is ignored (tolerance) so
      * adversarially deep input cannot overflow the stack — this
      * parser fronts raw end-user search boxes.
      */
    private val MaxDepth = 64

    /** One positive clause: group, phrase or term. None = degenerate
      * (empty phrase, empty group) — dropped by the caller.
      */
    private def clause(depth: Int): Option[Query] = {
      skipWs()
      // at the cap, excess '(' are consumed WITHOUT recursing (their
      // eventual ')' closes an enclosing group early or is ignored at
      // the top — tolerance, bounded stack)
      while (depth >= MaxDepth && i < s.length && s(i) == '(') {
        i += 1; skipWs()
      }
      if (i >= s.length) return None
      s(i) match {
        case '(' =>
          i += 1
          parseExpr(depth + 1) match {
            // a stray "()" must not become a match-nothing MUST clause
            case Bool(Nil, Nil, Nil, Nil, 0) => None
            case q                           => Some(q)
          }
        case '"' => phrase()
        case _   => term()
      }
    }

    private def phrase(): Option[Query] = {
      i += 1 // opening quote
      val b = new StringBuilder
      var closed = false
      while (!closed && i < s.length) {
        s(i) match {
          case '"'  => closed = true; i += 1
          case '\\' => // escapes work inside phrases too (\" stays in)
            i += 1
            if (i < s.length) { b += s(i); i += 1 }
          case c    => b += c; i += 1
        }
      } // tolerance: EOF closes an unterminated phrase
      val slop =
        if (i < s.length && s(i) == '~') { i += 1; digits().getOrElse(0) }
        else 0
      QueryParser.phraseOf(b.result(), slop, None, termKey)
    }

    private def term(): Option[Query] = {
      val b = new StringBuilder
      var prefix = false
      var fuzzy: Option[Int] = None
      var stop = false
      while (!stop && i < s.length) {
        s(i) match {
          case c if c.isWhitespace          => stop = true
          case '(' | ')' | '+' | '|' | '"'  => stop = true
          case '\\' => // escape: next char literal (incl. operators)
            i += 1
            if (i < s.length) { b += s(i); i += 1 }
          case '*' =>
            i += 1
            // prefix only as the TRAILING char; a '*' mid-term stays a
            // literal term character
            if (i >= s.length || s(i).isWhitespace ||
              "()+|\"".indexOf(s(i).toInt) >= 0) { prefix = true; stop = true }
            else b += '*'
          case '~' =>
            i += 1
            fuzzy = Some(digits().getOrElse(DefaultFuzzyEdits)
              .min(DefaultFuzzyEdits))
            stop = true
          case c => b += c; i += 1
        }
      }
      val raw = b.result().toLowerCase(java.util.Locale.ROOT)
      if (raw.isEmpty) None
      else {
        val keyed = termKey(None, raw)
        if (prefix) Some(Prefix(keyed))
        else fuzzy match {
          case Some(n) if n > 0 => Some(Fuzzy(keyed, n))
          case _                => Some(Term(keyed))
        }
      }
    }

    private def digits(): Option[Int] = {
      val start = i
      while (i < s.length && s(i).isDigit) i += 1
      if (i == start) None
      // never-throws: an absurdly long digit run saturates instead of
      // overflowing Int (9 digits always fit)
      else Some(s.substring(start, i).take(9).toInt)
    }

    private def skipWs(): Unit =
      while (i < s.length && s(i).isWhitespace) i += 1
  }
}
