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
case class TokenCountsAgg(
    child: Expression,
    stopWords: Seq[String],
    fromCsvLine: Boolean = false,
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

  override def update(buf: JHashMap[String, Long], input: InternalRow)
  : JHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s0 = v.asInstanceOf[UTF8String].toString
      val s = if (fromCsvLine) headlineOf(s0) else s0
      val toks = TextHashes.cleanTokens(s)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (!stopSet.contains(t)) buf.merge(t, 1L, (a, b) => a + b)
        i += 1
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
