package graft.nlp

import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {
  test("whitespace split") {
    assert(Tokenizer.tokenize("big data  engineer").toSeq == Seq("big", "data", "engineer"))
  }
  test("leading dot stays attached (.NET), trailing punct splits") {
    assert(Tokenizer.tokenize("we use .NET daily.").toSeq == Seq("we", "use", ".NET", "daily", "."))
  }
  test("infix slash and hyphen split into separate tokens") {
    assert(Tokenizer.tokenize("ci/cd and data-driven").toSeq ==
      Seq("ci", "/", "cd", "and", "data", "-", "driven"))
  }
  test("surrounding punctuation") {
    assert(Tokenizer.tokenize("(python), \"sql\"").toSeq ==
      Seq("(", "python", ")", ",", "\"", "sql", "\""))
  }
  test("null and empty") {
    assert(Tokenizer.tokenize(null).isEmpty)
    assert(Tokenizer.tokenize("").isEmpty)
  }
}

class SkillMatcherSpec extends AnyFunSuite {

  // mini gazetteer in the reference's JSONL shape
  // (assets/skills_no_en.jsonl) incl. a TEXT exact-case pattern
  private val jsonl = Seq(
    """{"label":"SKILL","pattern":[{"TEXT":".NET"}]}""",
    """{"label":"SKILL","pattern":[{"TEXT":"3D"}]}""",
    """{"label":"SKILL","pattern":[{"LOWER":"python"}]}""",
    """{"label":"SKILL","pattern":[{"LOWER":"machine"},{"LOWER":"learning"}]}""",
    """{"label":"SKILL","pattern":[{"LOWER":"machine"},{"LOWER":"learning"},{"LOWER":"ops"}]}""",
    """{"label":"SKILL","pattern":[{"LOWER":"learning"}]}""",
    """{"label":"OTHER","pattern":[{"LOWER":"ignored"}]}""")

  private val m = SkillMatcher.fromJsonl(jsonl.iterator)

  test("parses only SKILL-labeled patterns") {
    assert(m.patternCount == 6)
    assert(m.extract("this is ignored text").isEmpty)
  }

  test("LOWER matches case-insensitively; output lowercased") {
    assert(m.extract("We love PYTHON and Python").toSeq == Seq("python"))
  }

  test("TEXT matches exact case only (spaCy TEXT attr)") {
    assert(m.extract("built on .NET platform").toSeq == Seq(".net"))
    assert(m.extract("built on .net platform").isEmpty) // .net != .NET
    assert(m.extract("3D and 3d modelling").toSeq == Seq("3d")) // only exact '3D' hits
  }

  test("longest match wins over contained shorter patterns (filter_spans)") {
    // 'machine learning ops' shadows both 'machine learning' and 'learning'
    assert(m.extract("we do machine learning ops at scale").toSeq == Seq("machine learning ops"))
    // two-token beats one-token 'learning'
    assert(m.extract("machine learning rocks").toSeq == Seq("machine learning"))
    // standalone 'learning' still matches when not shadowed
    assert(m.extract("learning python").toSeq == Seq("learning", "python"))
  }

  test("distinct with first-occurrence order (set semantics upgrade)") {
    assert(m.extract("python then machine learning then python again").toSeq ==
      Seq("python", "machine learning"))
  }

  test("null-safe") { assert(m.extract(null).isEmpty) }

  test("full reference gazetteer loads and matches") {
    val full = SkillMatcher.fromJsonlFile("/root/reference/assets/skills_no_en.jsonl")
    assert(full.patternCount > 2000)
    val got = full.extract("Experience with Apache Spark, SQL and Machine Learning required; .NET a plus")
    assert(got.contains("sql"))
    assert(got.contains("machine learning"))
  }
}
