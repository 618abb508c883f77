package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewOps

class ExtensionsAndSkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  test("dot_product and word_shingles callable from SQL after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .as[Double].head()
    assert(dot == 32.0)

    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c','d'), 3) AS s")
      .select(explode(col("s"))).as[String].collect().toSeq
    assert(sh == Seq("a b c", "b c d"))
  }

  test("dot_product handles float arrays (embedding column type)") {
    GraftExtensions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("emb_ext")
    val norm = spark.sql(
      "SELECT sqrt(dot_product(embedding, embedding)) AS n FROM emb_ext LIMIT 5")
      .as[Double].collect()
    assert(norm.forall(n => n > 0 && !n.isNaN))
  }

  test("salted join equals plain join on skewed data") {
    val large = (1 to 10000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v")   // key 1 holds ~10% of rows
    val small = Seq((1L, "hot"), (2L, "cold"), (7L, "other")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(large, small, "k", buckets = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("skew diagnostics identify the heavy hitter") {
    val df = (1 to 1000).map(i => (if (i % 2 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val top = SkewOps.keyHistogram(df, "k", 1).select("k").as[String].head()
    assert(top == "hot")
    assert(math.abs(SkewOps.skewFactor(df, "k") - 0.5) < 0.01)
  }
}
