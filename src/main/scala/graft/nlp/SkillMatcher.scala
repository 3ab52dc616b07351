package graft.nlp

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** One token matcher inside a gazetteer phrase pattern.
  * Mirrors the two spaCy attributes the reference gazetteer uses
  * (`/root/reference/assets/skills_no_en.jsonl`): `LOWER` (case-insensitive
  * token match) and `TEXT` (exact-case token match, e.g. `.NET`, `3D`).
  */
sealed trait TokenPattern extends Serializable
final case class LowerTok(value: String) extends TokenPattern
final case class TextTok(value: String) extends TokenPattern

/** Gazetteer phrase matcher with spaCy-EntityRuler semantics
  * (reference: `/root/reference/main.py:132-139`):
  *
  *   - patterns are sequences of 1..7 token matchers (`LOWER` or `TEXT`)
  *   - all matches over the tokenized text are collected, then overlapping
  *     spans are resolved longest-first, earliest-first (spaCy
  *     `util.filter_spans`, which EntityRuler applies to its matches)
  *   - surviving entity texts are lowercased and de-duplicated
  *     (`main.py:138-139` — `ent.text.lower()` + `set()`); we keep
  *     first-occurrence order rather than Python's nondeterministic set
  *     order (documented determinism upgrade, SURVEY.md §7)
  *
  * Matching runs over a token trie, O(tokens × maxPatternLen); the whole
  * matcher is ~100 KB and is meant to be `sparkContext.broadcast` once per
  * job and shared by all partitions.
  */
final class SkillMatcher(patterns: Seq[Seq[TokenPattern]]) extends Serializable {

  /** Trie node: edges keyed by (isExact, token-string). Terminal marks a
    * complete pattern.
    */
  private final class Node extends Serializable {
    var terminal: Boolean = false
    val lowerEdges = new java.util.HashMap[String, Node]()
    val textEdges = new java.util.HashMap[String, Node]()
    def hasText: Boolean = !textEdges.isEmpty
  }

  private val root: Node = {
    val r = new Node
    patterns.foreach { pat =>
      var node = r
      pat.foreach {
        case LowerTok(v) =>
          var next = node.lowerEdges.get(v)
          if (next == null) { next = new Node; node.lowerEdges.put(v, next) }
          node = next
        case TextTok(v) =>
          var next = node.textEdges.get(v)
          if (next == null) { next = new Node; node.textEdges.put(v, next) }
          node = next
      }
      node.terminal = true
    }
    r
  }

  val patternCount: Int = patterns.size

  /** All maximal matches, resolved like spaCy's filter_spans, as
    * (startTokenIdx, endTokenIdxExclusive) spans.
    */
  private def matchSpans(tokens: Array[String], lowered: Array[String]): Seq[(Int, Int)] = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // Walk the trie from each start position with a SET of active states,
    // not one greedy path: a token can advance both a LOWER and a TEXT
    // edge (e.g. patterns `[LOWER:net]` and `[TEXT:.NET ...]` diverging at
    // the same surface token), and spaCy's Matcher keeps every live
    // hypothesis — a single-path walk would let the LOWER branch shadow a
    // TEXT pattern that completes later. Active sets stay tiny (edges
    // diverge only on mixed-case gazetteer tokens).
    val states = scala.collection.mutable.ArrayBuffer.empty[Node]
    val nextStates = scala.collection.mutable.ArrayBuffer.empty[Node]
    var i = 0
    while (i < tokens.length) {
      states.clear(); states += root
      var j = i
      while (states.nonEmpty && j < tokens.length) {
        nextStates.clear()
        var terminalHere = false
        var s = 0
        while (s < states.length) {
          val st = states(s)
          val l = st.lowerEdges.get(lowered(j))
          if (l != null) { nextStates += l; terminalHere ||= l.terminal }
          if (st.hasText) {
            val t = st.textEdges.get(tokens(j))
            if (t != null) { nextStates += t; terminalHere ||= t.terminal }
          }
          s += 1
        }
        j += 1
        if (terminalHere) spans += ((i, j))
        states.clear(); states ++= nextStates
      }
      i += 1
    }
    // filter_spans: sort by (length desc, start asc), greedily keep
    // non-overlapping
    val sorted = spans.sortBy { case (s, e) => (-(e - s), s) }
    val taken = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val occupied = new java.util.BitSet(tokens.length)
    sorted.foreach { case (s, e) =>
      var free = true
      var k = s
      while (free && k < e) { if (occupied.get(k)) free = false; k += 1 }
      if (free) { occupied.set(s, e); taken += ((s, e)) }
    }
    taken.sortBy(_._1).toSeq
  }

  /** Extract distinct lowercase skill phrases from `text`; first-occurrence
    * order.
    */
  def extract(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val tokens = Tokenizer.tokenize(text)
    val lowered = tokens.map(_.toLowerCase)
    val seen = new java.util.LinkedHashSet[String]()
    matchSpans(tokens, lowered).foreach { case (s, e) =>
      seen.add(lowered.slice(s, e).mkString(" "))
    }
    seen.asScala.toSeq
  }
}

object SkillMatcher {

  /** Parse spaCy-EntityRuler JSONL pattern lines:
    * `{"label":"SKILL","pattern":[{"LOWER":"machine"},{"LOWER":"learning"}]}`.
    * Only `label=="SKILL"` patterns are kept (the reference filters on that
    * label, `main.py:138`).
    */
  def fromJsonl(lines: Iterator[String], label: String = "SKILL"): SkillMatcher = {
    val mapper = new ObjectMapper()
    val pats = lines.flatMap { line =>
      val trimmed = line.trim
      if (trimmed.isEmpty) None
      else {
        val node = mapper.readTree(trimmed)
        if (node.path("label").asText() != label) None
        else {
          val toks = node.path("pattern").elements().asScala.map { tokNode =>
            if (tokNode.has("LOWER")) LowerTok(tokNode.get("LOWER").asText())
            else if (tokNode.has("TEXT")) TextTok(tokNode.get("TEXT").asText())
            else LowerTok(tokNode.elements().asScala.next().asText())
          }.toSeq
          if (toks.nonEmpty) Some(toks) else None
        }
      }
    }.toSeq
    new SkillMatcher(pats)
  }

  def fromJsonlFile(path: String): SkillMatcher = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromJsonl(src.getLines()) finally src.close()
  }

  /** Convenience: build from plain phrase strings (each tokenized,
    * case-insensitive) — used for mini-gazetteers in tests/queries.
    */
  def fromPhrases(phrases: Seq[String]): SkillMatcher =
    new SkillMatcher(phrases.map(p => Tokenizer.tokenize(p).map(t => LowerTok(t.toLowerCase)).toSeq))
}
