package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Shared JVM implementations for the native text-hash expressions.
  *
  * Semantics are EXACTLY those of the pure-Catalyst versions in
  * [[graft.ops.Dedup]] (tokenize = lower, scrub `[^a-z ]` to space, split
  * on `\s+`, drop empties; 3-word shingles or whole text when short;
  * MD5-hex lexicographic minima; SimHash over the first 64 bits of each
  * token's MD5) — property-tested equal in `NativeFunctionsSpec`.
  */
object TextHashes {

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val HEX = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Exactly Catalyst's `lower()` (`UTF8String.toLowerCase`): locale-
    * independent ASCII mapping on all-ASCII strings, JVM-default-locale
    * `String.toLowerCase` otherwise — so native/declarative equivalence
    * holds bit-for-bit on ANY input and ANY default locale (a plain
    * `toLowerCase(Locale.ROOT)` would diverge from Catalyst on non-ASCII
    * text under e.g. a Turkish default locale). */
  private def catalystLower(text: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < text.length) { ascii = text.charAt(i) < 0x80; i += 1 }
    if (ascii) {
      val out = new Array[Char](text.length)
      i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        out(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        i += 1
      }
      new String(out)
    } else text.toLowerCase
  }

  def cleanTokens(text: String): Array[String] =
    catalystLower(text)
      .replaceAll("[^a-z ]", " ")
      .split("\\s+").filter(_.nonEmpty)

  /** Share of clean tokens contained in `set` (0.0 for token-less text):
    * the JVM twin of `size(filter(toks, _.isInCollection(set))) /
    * size(toks)` — same integer-count-over-integer-count double division. */
  def wordSetRatio(text: String, set: java.util.Set[String]): Double = {
    val toks = cleanTokens(text)
    if (toks.length == 0) 0.0
    else {
      var c = 0
      var i = 0
      while (i < toks.length) { if (set.contains(toks(i))) c += 1; i += 1 }
      c.toDouble / toks.length.toDouble
    }
  }

  /** Marker-word argmax language ID, the JVM twin of
    * [[graft.ops.Quality.langId]]: per language (in `langs` order) the
    * share of clean tokens that are marker words; emit the FIRST language
    * whose ratio equals the maximum when that maximum clears `floor`,
    * else "unknown". Single tokenization pass for all languages. */
  def langId(text: String, langs: Array[(String, java.util.Set[String])],
             floor: Double): String = {
    val toks = cleanTokens(text)
    if (toks.length == 0) return "unknown"
    val ratios = new Array[Double](langs.length)
    var li = 0
    while (li < langs.length) {
      val set = langs(li)._2
      var c = 0
      var i = 0
      while (i < toks.length) { if (set.contains(toks(i))) c += 1; i += 1 }
      ratios(li) = c.toDouble / toks.length.toDouble
      li += 1
    }
    var best = ratios(0)
    li = 1
    while (li < langs.length) { if (ratios(li) > best) best = ratios(li); li += 1 }
    if (best < floor) return "unknown"
    li = 0
    while (li < langs.length) {
      if (ratios(li) == best) return langs(li)._1
      li += 1
    }
    "unknown"
  }

  def shingles(text: String, n: Int = 3): Array[String] = {
    val t = cleanTokens(text)
    if (t.length >= n)
      Array.tabulate(t.length - n + 1)(i => t.slice(i, i + n).mkString(" "))
    else Array(t.mkString(" "))
  }

  /** k MD5-hex minima over seed-salted shingles ("<seed>:<shingle>"). */
  def minhashSig(text: String, k: Int): Array[String] = {
    val sh = shingles(text)
    val prefixes = Array.tabulate(k)(i => s"$i:".getBytes(UTF_8))
    val mins = new Array[String](k)
    val digest = md.get()
    var si = 0
    while (si < sh.length) {
      val sb = sh(si).getBytes(UTF_8)
      var i = 0
      while (i < k) {
        digest.reset()
        digest.update(prefixes(i))
        digest.update(sb)
        val hex = toHex(digest.digest())
        if (mins(i) == null || hex.compareTo(mins(i)) < 0) mins(i) = hex
        i += 1
      }
      si += 1
    }
    mins
  }

  /** 64-bit SimHash: bit j set iff sum over tokens of ±1 (bit j of the
    * token's first-8-md5-bytes big-endian word) is positive. */
  def simhash64(text: String): Long = {
    val toks = cleanTokens(text)
    val sums = new Array[Int](64)
    val digest = md.get()
    var ti = 0
    while (ti < toks.length) {
      digest.reset()
      val h = digest.digest(toks(ti).getBytes(UTF_8))
      var u = 0L
      var i = 0
      while (i < 8) { u = (u << 8) | (h(i) & 0xffL); i += 1 }
      var j = 0
      while (j < 64) {
        sums(j) += (if (((u >>> (63 - j)) & 1L) == 1L) 1 else -1)
        j += 1
      }
      ti += 1
    }
    var acc = 0L
    var j = 0
    while (j < 64) { if (sums(j) > 0) acc |= (1L << (63 - j)); j += 1 }
    acc
  }
}
