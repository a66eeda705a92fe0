package graft

import graft.ops.NaiveCsv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: NaiveCsv must match Java `String.split` byte-for-byte —
  * the reference's exact splitting semantics (`StockCount.java:26`,
  * `WordCount.java:41`) including trailing-empty dropping. */
class NaiveCsvSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** The ground truth: the JVM's own split. */
  private def javaRef(s: String): Seq[String] = s.split(",").toSeq

  private def sparkSplit(ss: Seq[String]): Seq[Seq[String]] =
    ss.toDF("s").select(NaiveCsv.javaSplit(col("s"))).as[Seq[String]]
      .collect().toSeq

  test("javaSplit matches String.split on curated edge cases") {
    val cases = Seq(
      "", ",", ",,", "a", "a,", "a,,", ",a", ",,a", "a,b", "a,,b",
      "a,b,,", ",,a,,b,,", "a,b,c,d", " a , b ", ",", ",,,,,",
      "x,,,y,,,", ",x,", "a,b,c,", " , , ")
    val got = sparkSplit(cases)
    cases.zip(got).foreach { case (in, out) =>
      assert(out == javaRef(in), s"input=${in.inspect}")
    }
  }

  test("javaSplit matches String.split on 2000 random comma-strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab, ,,"
    val cases = Seq.fill(2000)(
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    val got = sparkSplit(cases)
    cases.zip(got).foreach { case (in, out) =>
      assert(out == javaRef(in), s"input=${in.inspect}")
    }
  }

  test("headline reconstruction matches the reference's Java loop") {
    // Java loop at WordCount.java:45-52: fields[1] + "," + ... + fields[len-3]
    def ref(fields: Seq[String]): String = {
      val sb = new StringBuilder
      var i = 1
      while (i <= fields.length - 3) {
        sb.append(fields(i))
        if (i < fields.length - 3) sb.append(",")
        i += 1
      }
      sb.toString
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(500)(
      Seq.fill(rnd.nextInt(7))(Seq.fill(rnd.nextInt(4))("ab c"(rnd.nextInt(4))).mkString))
    val got = cases.map(_.mkString(",")).toDF("s")
      .select(NaiveCsv.headline(NaiveCsv.javaSplit(col("s"))))
      .as[String].collect().toSeq
    cases.zip(got).foreach { case (fields, out) =>
      // javaSplit(fields.mkString(",")) may differ from fields when there
      // are trailing empties — compare against the Java-split view
      val jf = fields.mkString(",").split(",").toSeq
      assert(out == ref(jf), s"fields=$jf")
    }
  }

  test("lastField trims and takes the final Java-split field") {
    val got = Seq("1,hello world, 2020-01-01 , MS ", "a,b,c,  X")
      .toDF("s").select(NaiveCsv.lastField(NaiveCsv.javaSplit(col("s"))))
      .as[String].collect().toSeq
    assert(got == Seq("MS", "X"))
  }

  implicit private class Inspect(s: String) {
    def inspect: String = s.map(c => if (c == ',') '⸴' else c).mkString("⟨", "", "⟩")
  }
}
