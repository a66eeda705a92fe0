package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Map-side word counting as a typed imperative aggregate: tokenizes each
  * input string in a tight JVM loop and accumulates counts into a
  * per-partition hash map; partitions merge maps, and the final value is a
  * `map<string,bigint>` of token -> count.
  *
  * This is the "combiner" the reference deliberately omitted
  * (`WordCount.java:104`), taken further: the explode-then-groupBy plan
  * materializes one row PER TOKEN (27M rows at the 500k-line bench) before
  * partial aggregation collapses them, while this operator never
  * materializes token rows at all — the shuffle carries one small map per
  * partition. Token semantics are identical to
  * `fastTokenize`+`keepToken` (cross-checked in WordCountAggSpec).
  */
object TokenCountsAgg {
  /** Input is plain text: tokenize + stop-filter + count. */
  val ModeText = "text"
  /** Input is a raw csv line: Java split -> headline re-join -> tokenize
    * (the whole reference WordCount mapper). */
  val ModeCsvTokens = "csv_tokens"
  /** Input is a raw csv line: Java split -> arity>3 filter -> trimmed last
    * field (the whole reference StockCount mapper); no stop filter. */
  val ModeCsvTicker = "csv_ticker"
}

case class TokenCountsAgg(
    child: Expression,
    stopWords: Seq[String],
    mode: String = TokenCountsAgg.ModeText,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JHashMap[String, Long]] {

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopWords.size * 2)
    stopWords.foreach(s.add)
    s
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, false)
  override def prettyName: String = "graft_token_counts"

  override def createAggregationBuffer(): JHashMap[String, Long] =
    new JHashMap[String, Long]()

  /** With `fromCsvLine`, the input is the RAW csv line and the whole
    * reference mapper runs here in one JVM pass: Java `String.split(",")`
    * (the exact reference semantics — no expression-tree emulation needed),
    * headline re-join of fields 1..len-3 (`WordCount.java:45-52`), then
    * tokenize. Rows with <2 fields contribute no tokens, same as the
    * declarative filter (their headline is empty). */
  private def headlineOf(line: String): String = {
    val fields = line.split(",")
    if (fields.length < 2) return ""
    val sb = new java.lang.StringBuilder
    var i = 1
    while (i <= fields.length - 3) {
      sb.append(fields(i))
      if (i < fields.length - 3) sb.append(',')
      i += 1
    }
    sb.toString
  }

  /** Single-pass tokenize+count for all-ASCII input: lower/scrub/split
    * fused into one char loop, no regex and no intermediate strings.
    * Provably identical to [[TextHashes.cleanTokens]] there — the scrub
    * maps every char outside [a-z ] to a space, so after it the only
    * token delimiters are space runs, which is exactly what this loop
    * splits on. Non-ASCII input (locale-sensitive lowercasing, possible
    * multi-char case mappings) falls back to the reference path. */
  private def countTokens(s: String, buf: JHashMap[String, Long]): Unit = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { ascii = s.charAt(i) < 0x80; i += 1 }
    if (!ascii) {
      val toks = TextHashes.cleanTokens(s)
      var j = 0
      while (j < toks.length) {
        val t = toks(j)
        if (!stopSet.contains(t)) buf.merge(t, 1L, (a, b) => a + b)
        j += 1
      }
    } else {
      val sb = new java.lang.StringBuilder(24)
      i = 0
      while (i <= s.length) {
        val c = if (i < s.length) s.charAt(i) else ' ' // flush at end
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        if (lc >= 'a' && lc <= 'z') sb.append(lc)
        else if (sb.length > 0) {
          val t = sb.toString
          if (!stopSet.contains(t)) buf.merge(t, 1L, (a, b) => a + b)
          sb.setLength(0)
        }
        i += 1
      }
    }
  }

  override def update(buf: JHashMap[String, Long], input: InternalRow)
  : JHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s0 = v.asInstanceOf[UTF8String].toString
      mode match {
        case TokenCountsAgg.ModeText => countTokens(s0, buf)
        case TokenCountsAgg.ModeCsvTokens => countTokens(headlineOf(s0), buf)
        case TokenCountsAgg.ModeCsvTicker =>
          // StockCount.java:26-30 verbatim: real String.split, so no
          // regex-emulation expression and only ONE pass per line (the
          // declarative plan evaluates the split in both filter and
          // project after predicate pushdown)
          val fields = s0.split(",")
          if (fields.length > 3)
            buf.merge(fields(fields.length - 1).trim, 1L, (a, b) => a + b)
      }
    }
    buf
  }

  override def merge(b1: JHashMap[String, Long], b2: JHashMap[String, Long])
  : JHashMap[String, Long] = {
    b2.forEach((k, v) => b1.merge(k, v, (a, b) => a + b))
    b1
  }

  override def eval(buf: JHashMap[String, Long]): Any = {
    val n = buf.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = e.getValue
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: JHashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    buf.forEach((k, v) => { out.writeUTF(k); out.writeLong(v) })
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): JHashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new JHashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TokenCountsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TokenCountsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TokenCountsAgg =
    copy(child = newChildren.head)
}
