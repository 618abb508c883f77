package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation (SURVEY §7.5's benchmark-driven candidate).
  *
  * The window formulation (`row_number().over(partitionBy(q).orderBy(sim
  * desc)) <= k`) shuffles and fully sorts EVERY candidate row per group.
  * This Aggregator keeps a k-bounded buffer instead, and because Spark
  * plans Aggregators as object-hash aggregates with partial merge, each
  * map task emits at most k rows per group before the shuffle — at
  * 100 TB that is the difference between shuffling the corpus and
  * shuffling k rows per query.
  *
  * Ordering matches the window variant exactly: sim DESC, then id ASC on
  * ties, so both paths produce identical results (asserted in
  * VectorOpsSpec and by sharing the DuckDB oracle).
  */
object TopKAgg {

  case class Scored(id: Long, sim: Double)
  case class Ranked(id: Long, sim: Double, rank: Long)

  private def better(a: Scored, b: Scored): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  /** Insert keeping the buffer sorted best-first and bounded at k. */
  private def insert(buf: List[Scored], v: Scored, k: Int): List[Scored] = {
    if (buf.size >= k && better(buf.last, v)) buf
    else {
      val (front, back) = buf.span(better(_, v))
      (front ::: v :: back).take(k)
    }
  }

  /** Aggregator over (group, id, sim) rows — the group key is handled by
    * groupByKey, the aggregator only sees id/sim.
    */
  def topK(k: Int): Aggregator[(Long, Long, Double), List[Scored], Seq[Ranked]] =
    new Aggregator[(Long, Long, Double), List[Scored], Seq[Ranked]] {
      override def zero: List[Scored] = Nil
      override def reduce(b: List[Scored], a: (Long, Long, Double)): List[Scored] =
        insert(b, Scored(a._2, a._3), k)
      override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
        b2.foldLeft(b1)((acc, v) => insert(acc, v, k))
      override def finish(r: List[Scored]): Seq[Ranked] =
        r.zipWithIndex.map { case (s, i) => Ranked(s.id, s.sim, i + 1L) }
      override def bufferEncoder: Encoder[List[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
      override def outputEncoder: Encoder[Seq[Ranked]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ranked]]()
    }
}
