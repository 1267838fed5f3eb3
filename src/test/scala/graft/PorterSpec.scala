package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Porter

/** Known-answer vectors from the published algorithm (Porter 1980):
  * the paper's own per-step examples (run through the FULL stemmer,
  * so each pair is an end-to-end check) plus the famous whole-word
  * examples the paper closes with.
  */
class PorterSpec extends AnyFunSuite {

  private val vectors = Seq(
    // step 1a examples
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b + cleanup examples
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2 (full-stem outcomes)
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc",
    "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form",
    "formalize" -> "formal", "electriciti" -> "electr",
    "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "homologou" -> "homolog",
    "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // the paper's closing whole-word examples
    "generalizations" -> "gener", "oscillators" -> "oscil")

  test("paper known-answer vectors") {
    val bad = vectors.collect {
      case (in, want) if Porter.stem(in) != want =>
        s"$in -> ${Porter.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("short words pass through") {
    assert(Porter.stem("a") == "a")
    assert(Porter.stem("is") == "is")
  }

  test("corpus vocabulary stems are stable (oracle map inputs)") {
    // the 31-word fixed corpus vocabulary (FIXTURES.md §1): the oracle's
    // inline (term, stem) map is generated from Porter.stem, so pin the
    // outcomes that differ from identity
    assert(Porter.stem("query") == "queri")
    assert(Porter.stem("merge") == "merg")
    assert(Porter.stem("value") == "valu")
    assert(Porter.stem("table") == "tabl")
    assert(Porter.stem("customer") == "custom")
    assert(Porter.stem("line") == "line")
    assert(Porter.stem("spark") == "spark")
  }
}
