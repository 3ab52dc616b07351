package graft.nlp

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the gazetteer matcher (SURVEY §5):
  * pure-Scala, no Spark — sbt's ScalaCheck framework runs this natively.
  */
object SkillMatcherProps extends Properties("SkillMatcher") {

  private val phrases = Seq("spark", "machine learning", "data engineering",
    "python", "apache airflow")
  private val matcher = SkillMatcher.fromPhrases(phrases)
  private val phraseSet = phrases.toSet

  private val noiseWord: Gen[String] =
    Gen.oneOf("builds", "teams", "with", "large", "pipelines", "daily",
      "modern", "cloud", "experience", "role")
  private val fragment: Gen[String] =
    Gen.frequency(3 -> noiseWord, 1 -> Gen.oneOf(phrases))
  private val text: Gen[String] =
    Gen.listOf(fragment).map(_.mkString(" "))

  property("output is a subset of the gazetteer, lowercase, distinct") =
    forAll(text) { t =>
      val out = matcher.extract(t)
      Prop(out.forall(phraseSet.contains)) :| s"subset: $out" &&
        Prop(out.forall(s => s == s.toLowerCase)) :| "lowercase" &&
        Prop(out.distinct == out) :| "distinct"
    }

  property("every planted phrase is found regardless of surrounding noise") =
    forAll(Gen.oneOf(phrases), Gen.listOfN(3, noiseWord), Gen.listOfN(3, noiseWord)) {
      (p, pre, post) =>
        val t = (pre :+ p) ++: post mkString " "
        Prop(matcher.extract(t).contains(p)) :| s"'$p' lost in '$t'"
    }

  property("case-insensitive for LOWER patterns") =
    forAll(Gen.oneOf(phrases)) { p =>
      val shouted = p.toUpperCase
      Prop(matcher.extract(s"we use $shouted heavily").contains(p)) :| shouted
    }

  property("no matches in pure noise") =
    forAll(Gen.listOf(noiseWord)) { ws =>
      Prop(matcher.extract(ws.mkString(" ")).isEmpty)
    }
}
