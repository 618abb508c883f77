package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** Randomized (fixed-seed, deterministic) tests against independent
  * in-memory models — random inputs catch the shapes hand-written fixtures
  * miss (odd components, duplicate edges, dense graphs, singletons).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  /** Brute-force union-find ground truth. */
  private def ufComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (1L to n.toLong).map(i => i -> find(i)).toMap
  }

  test("connectedComponents equals union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(24)
      val edges = Seq.fill(rnd.nextInt(31)) {
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))
      }.collect {
        // operator contract: undirected candidate PAIRS (a < b, no loops)
        case (a, b) if a != b => (math.min(a, b), math.max(a, b))
      }.distinct
      val nodes = (1L to n.toLong).toDF("doc_id")
      val got = CorpusOps.connectedComponents(
          nodes, edges.toDF("doc_a", "doc_b"), maxIter = 40)
        .as[(Long, Long)].collect().toMap
      val want = ufComponents(n, edges)
      assert(got == want, s"trial $trial n=$n edges=$edges")
    }
  }

  test("salted join equals plain join on random frames, inner and left") {
    import graft.operators.SkewOps
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      // null keys and duplicate small-side keys are the shapes the fixed
      // fixture (and the oracle query) never exercises
      val large = Seq.fill(200)((
        if (rnd.nextInt(10) == 0) Option.empty[Long]
        else Some(rnd.nextInt(8).toLong), rnd.nextInt(100)))
        .toDF("k", "v")
      val small = ((0 to 4).map(i => (Option(i.toLong), s"n$i")) :+
        (Option(2L), "dup")).toDF("k", "name")
      for (jt <- Seq("inner", "left")) {
        // multiset compare (sorted seqs, not sets): duplicate rows are
        // near-certain here, and a dropped-or-doubled duplicate is exactly
        // the failure a buckets off-by-one would produce
        def rows(df: org.apache.spark.sql.DataFrame) = df
          .select("k", "v", "name").collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
        val plain = rows(large.join(small, Seq("k"), jt))
        val salted = rows(SkewOps.saltedJoin(large, small, "k", buckets = 4, jt))
        assert(salted == plain, s"trial $trial $jt")
      }
    }
  }

  test("upsert equals latest-wins on random newer-than-current batches") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2025-01-$day%02d 00:00:00")
    for (trial <- 1 to 6) {
      val keys = (1 to 12).map(i => s"obj_$i")
      val current = keys.map(k =>
        (rnd.nextLong().abs, "m", k, 4L, ts(1), s"e-$k", "text/plain",
         ts(1 + rnd.nextInt(5)), "success"))
        .toDF("id", "mapping_id", "object_name", "size", "last_modified",
              "etag", "content_type", "last_synced", "sync_status")
      // updates: random subset of keys, strictly newer last_synced
      val updates = rnd.shuffle(keys).take(1 + rnd.nextInt(keys.size))
        .map(k => (0L, "m", k, 5L, ts(10), s"new-$k", "text/plain",
                   ts(10 + rnd.nextInt(5)), "success"))
        .toDF("id", "mapping_id", "object_name", "size", "last_modified",
              "etag", "content_type", "last_synced", "sync_status")
      val a = graft.operators.SyncOps.ledgerUpsert(current, updates)
      val b = graft.operators.SyncOps.ledgerLatestWins(current, updates)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"trial $trial")
    }
  }
}
