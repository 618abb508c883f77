package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Pins the r20 native one-pass band-keys expression
  * (functions/MinhashBandKeys) bit-for-bit against the batch
  * explode+partial-agg path (TextOps.bandedKeys) — the parity the
  * streaming near-dup queries' shared oracle depends on.
  */
class MinhashBandKeysSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "der schnelle braune fuchs und der faule hund"),
    (4L, "one two"),            // < 3 tokens: no shingles → NULL bands
    (5L, ""),                   // tokenless
    (6L, "a b c a b c a b c"),  // repeated shingles
    (7L, (1 to 400).map(i => s"w${i % 37}").mkString(" "))
  ).toDF("doc_id", "text")

  private def assertParity(k: Int, bands: Int): Unit = {
    // batch path restated from the public signature op (bandedKeys is
    // operators-private): explode+partial-agg signatures, then the band
    // concat — the exact formulation minhashCandidates shares
    val r = k / bands
    val sigs = TextOps.withMinhashSignature(corpus, k)
    val bandCols = (0 until bands).map { j =>
      md5(concat_ws("|",
        lit(j.toString) +: (0 until r).map(i => col(s"sig${j * r + i}")): _*))
    }
    val batch = sigs
      .select(col("doc_id"), sort_array(array(bandCols: _*)).as("bands"))
      .as[(Long, Seq[String])].collect().toMap
    val native = TextOps.withMinhashBandKeys(corpus, k, bands)
      .select(col("doc_id"), col("bands"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    // docs with shingles: identical band multisets
    for ((id, b) <- batch)
      assert(native(id).map(_.sorted).contains(b.toList),
        s"doc $id k=$k bands=$bands: native=${native(id)} batch=$b")
    // docs absent from the batch explode (no shingles) must be NULL
    for ((id, v) <- native if !batch.contains(id))
      assert(v.isEmpty, s"doc $id: expected NULL bands, got $v")
    assert(native(4L).isEmpty && native(5L).isEmpty)
  }

  test("native band keys == batch explode+agg path (declared k=8,b=4)") {
    assertParity(8, 4)
  }

  test("native band keys parity at family boundaries (k=4,b=4 and k=12,b=3)") {
    assertParity(4, 4)   // r=1, exactly one md5 family
    assertParity(12, 3)  // r=4, three md5 families
  }

  test("interpreted eval matches codegen (collect via filter forces both)") {
    // same expression evaluated on a non-codegen path (driver-side eval
    // through a literal row) must agree with the dataframe run
    val df = TextOps.withMinhashBandKeys(corpus, 8, 4)
      .filter(col("bands").isNotNull)
    val viaDf = df.select("doc_id", "bands")
      .as[(Long, Seq[String])].collect().toMap
    val expr = graft.functions.MinhashBandKeys(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType), nullable = true), 8, 4)
    val shingleRows = corpus
      .select(col("doc_id"),
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
      .as[(Long, Seq[String])].collect()
    for ((id, shs) <- shingleRows if shs.nonEmpty) {
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        shs.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      val got = expr.bandKeys(arr)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got == viaDf(id), s"doc $id interpreted vs codegen")
    }
  }
}
