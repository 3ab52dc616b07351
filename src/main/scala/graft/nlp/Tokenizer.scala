package graft.nlp

/** Rule-based tokenizer approximating spaCy's default English tokenization
  * closely enough for gazetteer phrase matching (reference: the EntityRuler
  * pipeline at `/root/reference/main.py:132-139`; pattern tokens produced by
  * spaCy tokenization in `/root/reference/assets/get_skills.py`).
  *
  * Rules implemented (subset of spaCy's prefix/suffix/infix machinery that
  * matters for 1-7-token skill phrases):
  *   - split on whitespace
  *   - strip *leading* opening punctuation `([{"'` repeatedly
  *   - strip *trailing* punctuation `.,;:!?)]}"'` repeatedly — but keep a
  *     token that is entirely punctuation, and keep leading `.` attached
  *     (so `.NET` stays one token, matching spaCy, while `NET.` → `NET`, `.`)
  *   - split infix `/`, `-`, `–`, `—` into separate tokens (spaCy treats
  *     hyphens/slashes as infixes: `ci/cd` → `ci`, `/`, `cd`)
  *
  * Pure Scala, no Spark dependency; used both driver-side and inside
  * expressions/UDFs.
  */
object Tokenizer extends Serializable {

  private val openPunct = "([{\"'«“‘"
  private val closePunct = ".,;:!?)]}\"'»”’"
  private val infix = "/-–—"

  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      // skip whitespace
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) splitChunk(text.substring(start, i), out)
    }
    out.toArray
  }

  /** Apply prefix/suffix/infix rules to one whitespace-delimited chunk. */
  private def splitChunk(chunk0: String, out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    var chunk = chunk0
    // prefixes
    while (chunk.length > 1 && openPunct.indexOf(chunk.charAt(0)) >= 0) {
      out += chunk.substring(0, 1)
      chunk = chunk.substring(1)
    }
    // suffixes (collected in reverse, emitted after the core token)
    val suffixes = scala.collection.mutable.ArrayBuffer.empty[String]
    while (chunk.length > 1 && closePunct.indexOf(chunk.charAt(chunk.length - 1)) >= 0) {
      suffixes += chunk.substring(chunk.length - 1)
      chunk = chunk.substring(0, chunk.length - 1)
    }
    // infix split (keep separators); leading '.' stays attached (.NET)
    var seg = new StringBuilder
    var j = 0
    while (j < chunk.length) {
      val c = chunk.charAt(j)
      if (infix.indexOf(c) >= 0 && seg.nonEmpty && j + 1 < chunk.length) {
        out += seg.toString; seg = new StringBuilder
        out += c.toString
      } else seg.append(c)
      j += 1
    }
    if (seg.nonEmpty) out += seg.toString
    out ++= suffixes.reverseIterator
  }
}
