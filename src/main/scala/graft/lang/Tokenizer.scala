package graft.lang

import scala.collection.mutable.ArrayBuffer

/** Word splitting + alphabet/script language prefilter.
  *
  * Re-derives the observable contract of the unvendored `alphabet_detector`
  * crate from its call sites (SURVEY.md §1.4; reference:
  * src/detector/mod.rs:235, train/src/writer.rs:36-59):
  *
  *  - a word is a maximal run of letter code points; case is folded; digits,
  *    punctuation, separators and symbols split words; combining marks are
  *    dropped (so "i̇" folds to plain "i");
  *  - per word, per language, we count how many of its code points belong to
  *    that language's orthography (`Word.langs_cnt`);
  *  - the fulltext prefilter keeps the languages whose total membership count
  *    is within a 95% margin of the best-covered language
  *    (`fulltext_filter_with_margin::<_, 95>`).
  */
object Tokenizer {

  /** A tokenized word: lowercased letter code points. */
  final case class Word(cps: Array[Int]) {
    def length: Int = cps.length
    def utf8Bytes: Int = {
      var n = 0; var i = 0
      while (i < cps.length) {
        val c = cps(i)
        n += (if (c < 0x80) 1 else if (c < 0x800) 2 else if (c < 0x10000) 3 else 4)
        i += 1
      }
      n
    }
    override def toString: String = new String(cps, 0, cps.length)
  }

  private def isWordChar(cp: Int): Boolean = Character.isLetter(cp)

  private def isCombining(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
    t == Character.ENCLOSING_MARK
  }

  /** Split a text into lowercased words (reference contract of
    * `words::from_ch_ind`, train/src/writer.rs:36).
    */
  def words(text: String): ArrayBuffer[Word] = {
    val out = ArrayBuffer.empty[Word]
    val buf = new ArrayBuffer[Int](16)
    var i = 0
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      if (isWordChar(cp)) buf += Character.toLowerCase(cp)
      else if (isCombining(cp)) { /* dropped: fold "i̇" → "i" */ }
      else if (buf.nonEmpty) { out += Word(buf.toArray); buf.clear() }
      i += Character.charCount(cp)
    }
    if (buf.nonEmpty) out += Word(buf.toArray)
    out
  }

  /** Result of the fulltext prefilter: the words plus candidate language ids
    * within the margin, sorted ascending by id (= popularity ordinal).
    */
  final case class Prefiltered(words: ArrayBuffer[Word], candidates: Array[Int])

  /** Language prefilter with a `marginPercent` (reference uses 95): keep the
    * languages whose per-char orthography coverage is ≥ margin% of the
    * best-covered language's coverage. Candidates are computed over ALL
    * registered languages; the detector intersects with its configured set
    * afterwards (reference: src/detector/mod.rs:235-239).
    */
  def prefilter(text: String, marginPercent: Int = 95): Prefiltered = {
    val ws = words(text)
    if (ws.isEmpty) return Prefiltered(ws, Array.emptyIntArray)

    val counts = new Array[Long](ScriptLang.count)
    var w = 0
    while (w < ws.length) {
      val cpsArr = ws(w).cps
      var i = 0
      while (i < cpsArr.length) {
        // one bitmask load per char; iterate only the set bits
        var mask = ScriptLang.maskOf(cpsArr(i))
        while (mask != 0L) {
          counts(java.lang.Long.numberOfTrailingZeros(mask)) += 1
          mask &= mask - 1
        }
        i += 1
      }
      w += 1
    }

    var max = 0L
    var l = 0
    while (l < counts.length) { if (counts(l) > max) max = counts(l); l += 1 }
    if (max == 0L) return Prefiltered(ws, Array.emptyIntArray)

    val out = new ArrayBuffer[Int](8)
    l = 0
    while (l < counts.length) {
      if (counts(l) * 100 >= max * marginPercent) out += l
      l += 1
    }
    Prefiltered(ws, out.toArray)
  }
}
