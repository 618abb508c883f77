package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Pins the r20 native DSIR gram-weight expression
  * (functions/DsirGramWeight) bit-for-bit against the composable
  * element_at(mapLit, md5-slice) formulation it replaced in
  * importanceStream — the parity docs_stream_importance's shared batch
  * oracle depends on.
  */
class DsirGramWeightSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  private val buckets = 64

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs and more"),
    (3L, "a"),
    (4L, (1 to 300).map(i => s"tok${i % 91}").mkString(" "))
  ).toDF("doc_id", "text")

  private def grams = corpus
    .withColumn("toks", TextOps.tokens(col("text")))
    .withColumn("grams", concat(col("toks"), TextOps.shingles(col("toks"), 2)))
    .filter(size(col("grams")) > 0)

  test("native gram weight == element_at/aggregate HOF formulation") {
    // an arbitrary fitted model covering every bucket (values exercise
    // negative deltas and zero)
    val fitted = (0L until buckets.toLong)
      .map(b => b -> (b * 31 - 997)).toMap
    val deltaLit = map(fitted.toSeq.sortBy(_._1)
      .flatMap { case (b, d) => Seq(lit(b), lit(d)) }: _*)
    val hof = grams
      .withColumn("deltas", transform(col("grams"), g =>
        element_at(deltaLit,
          conv(substring(md5(g), 1, 6), 16, 10).cast("long") % buckets)))
      .select(col("doc_id"),
        aggregate(col("deltas"), lit(0L), (acc, x) => acc + x).as("w"))
      .as[(Long, Long)].collect().toMap
    val native = grams
      .select(col("doc_id"), graft.functions.DsirGramWeight
        .dsir_gram_weight(col("grams"), fitted, buckets).as("w"))
      .as[(Long, Long)].collect().toMap
    assert(native == hof && native.nonEmpty)
  }

  test("a bucket missing from the fitted map nulls the document weight " +
       "(element_at NULL-propagation parity)") {
    // empty model: every lookup misses; the HOF aggregate propagates
    // NULL, and so must the native pass
    val native = grams
      .select(col("doc_id"), graft.functions.DsirGramWeight
        .dsir_gram_weight(col("grams"), Map.empty[Long, Long], buckets)
        .as("w"))
      .as[(Long, Option[Long])].collect().toMap
    assert(native.values.forall(_.isEmpty) && native.nonEmpty)
  }

  test("empty gram array returns the aggregate's init (0)") {
    val fitted = (0L until buckets.toLong).map(b => b -> 1L).toMap
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("grams")
    val got = empty.select(graft.functions.DsirGramWeight
      .dsir_gram_weight(col("grams"), fitted, buckets).as("w"))
      .as[Option[Long]].head()
    assert(got.contains(0L))
  }
}
