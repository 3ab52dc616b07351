package graft.nlp

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import scala.jdk.CollectionConverters._

/** Adversarial fuzz of the trie matcher against the FULL 2,412-pattern
  * reference gazetteer (closing SURVEY §2.3 E2's last parity risk): texts
  * embed randomly rendered gazetteer phrases behind hostile boundaries —
  * hyphen/slash infixes that re-tokenize the phrase, punctuation runs,
  * quotes/parens, case mutations (legal for LOWER tokens, match-breaking
  * for TEXT-exact ones like `.NET`), unicode dashes — and extraction must
  * EXACTLY equal an independent naive reference matcher over the same
  * token splits: brute-force window×pattern enumeration + a literal
  * filter_spans, no trie, no multi-state walk. Equality over 10k+ cases
  * is the evidence that the trie's live-hypothesis tracking and span
  * resolution implement the same function as the spec-by-enumeration.
  */
object SkillMatcherFuzzProps extends Properties("SkillMatcherFuzz") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10000)

  private val gazPath = sys.env.getOrElse("GRAFT_GAZETTEER",
    "/root/reference/assets/skills_no_en.jsonl")

  private val patterns: Seq[Seq[TokenPattern]] = {
    val mapper = new ObjectMapper()
    val src = scala.io.Source.fromFile(gazPath, "UTF-8")
    try src.getLines().flatMap { line =>
      val t = line.trim
      if (t.isEmpty) None
      else {
        val node = mapper.readTree(t)
        if (node.path("label").asText() != "SKILL") None
        else {
          val toks = node.path("pattern").elements().asScala.map { tn =>
            if (tn.has("LOWER")) LowerTok(tn.get("LOWER").asText())
            else if (tn.has("TEXT")) TextTok(tn.get("TEXT").asText())
            else LowerTok(tn.elements().asScala.next().asText())
          }.toSeq
          if (toks.nonEmpty) Some(toks) else None
        }
      }
    }.toSeq
    finally src.close()
  }

  private val matcher = SkillMatcher.fromJsonlFile(gazPath)

  /** The reference-by-enumeration: every (position, pattern) window
    * tried literally, spans resolved by a literal filter_spans, output
    * lowercased + first-occurrence deduped. Independent of the trie.
    */
  private def naiveExtract(text: String): Seq[String] = {
    val tokens = Tokenizer.tokenize(text)
    val lowered = tokens.map(_.toLowerCase)
    val spans = for {
      i <- tokens.indices
      pat <- patterns
      if i + pat.length <= tokens.length
      if pat.zipWithIndex.forall {
        case (LowerTok(v), k) => lowered(i + k) == v
        case (TextTok(v), k)  => tokens(i + k) == v
      }
    } yield (i, i + pat.length)
    val sorted = spans.sortBy { case (s, e) => (-(e - s), s) }
    val occupied = new Array[Boolean](tokens.length)
    val taken = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    sorted.foreach { case (s, e) =>
      if (!(s until e).exists(occupied)) {
        (s until e).foreach(occupied(_) = true)
        taken += ((s, e))
      }
    }
    val seen = new java.util.LinkedHashSet[String]()
    taken.sortBy(_._1).foreach { case (s, e) =>
      seen.add(lowered.slice(s, e).mkString(" "))
    }
    seen.asScala.toSeq
  }

  // --- hostile text generation over the real gazetteer ---

  private def mutateCase(s: String): Gen[String] = Gen.oneOf(
    Gen.const(s), Gen.const(s.toUpperCase), Gen.const(s.toLowerCase),
    Gen.const(s.capitalize),
    Gen.const(s.map(c => if (scala.util.Random.nextBoolean()) c.toUpper else c.toLower)))

  private val renderTok: TokenPattern => Gen[String] = {
    case LowerTok(v) => mutateCase(v)
    // TEXT tokens: exact half the time (should match), mutated half the
    // time (usually match-breaking — the case-sensitivity probe)
    case TextTok(v) => Gen.oneOf(Gen.const(v), mutateCase(v))
  }

  private val separator: Gen[String] = Gen.frequency(
    8 -> Gen.const(" "), 1 -> Gen.const("-"), 1 -> Gen.const("/"),
    1 -> Gen.const(", "), 1 -> Gen.const(" – "))

  private val phraseGen: Gen[String] = for {
    pat <- Gen.oneOf(patterns)
    toks <- Gen.sequence[Seq[String], String](pat.map(renderTok))
    sep <- separator
  } yield toks.mkString(sep)

  private val junkGen: Gen[String] = Gen.oneOf(
    "builds", "teams", "with", "pipelines", "experience", "role,",
    "..,;!!", "(", ")", "\"", "«quote»", "’s", "3D", ".NET.", "C++",
    "-", "--", "–", "a/b", "(x)", "...", "!?", "[ok]", "{x}",
    "e.g.", "etc.", "co-op", "re/max")

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 8)
    parts <- Gen.listOfN(n, Gen.frequency(2 -> junkGen, 3 -> phraseGen))
    glue <- Gen.listOfN(math.max(n - 1, 0), Gen.frequency(
      6 -> Gen.const(" "), 1 -> Gen.const("  "), 1 -> Gen.const(". "),
      1 -> Gen.const(" (" ), 1 -> Gen.const(") ")))
  } yield parts.zipAll(glue, "", "").flatMap { case (a, b) => Seq(a, b) }.mkString

  property("trie extraction == naive enumeration over hostile boundaries (full gazetteer)") =
    forAll(textGen) { t =>
      val got = matcher.extract(t)
      val want = naiveExtract(t)
      Prop(got == want) :| s"text=<$t>\n trie=$got\n naive=$want"
    }
}
