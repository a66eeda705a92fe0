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

  def cleanTokens(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z ]", " ")
      .split("\\s+").filter(_.nonEmpty)

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
