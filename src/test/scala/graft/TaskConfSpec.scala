package graft

import java.nio.file.{Files, Path => JPath}
import org.apache.hadoop.fs.RawLocalFileSystem
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CopyExecutor
import graft.sources.{ObjectStoreCatalog, TaskConf}

/** Local filesystem under a scheme ONLY the session conf knows about
  * (`fs.graftest.impl` is set on `sparkContext.hadoopConfiguration`, never
  * in core-site): any task that builds its FileSystem from a bare
  * `new Configuration()` dies with "No FileSystem for scheme: graftest",
  * so a green copy/list through this scheme PROVES the session conf
  * reached the task (r12 verdict item 2 — the masked-by-local[*] class of
  * bug where ProviderFactory's s3a/gcs endpoint keys never reach
  * executors).
  */
class GraftTestFs extends RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path}
  override def getScheme: String = "graftest"
  override def getUri: java.net.URI = java.net.URI.create("graftest:///")
  // RawLocalFileSystem's statuses load permissions lazily via
  // `new java.io.File(uri)`, which rejects non-"file" schemes; rewrap into
  // eager permission-free statuses so listFiles/listStatus work here.
  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
                   st.getBlockSize, st.getModificationTime, st.getAccessTime,
                   null, null, null, st.getPath)
  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}

class TaskConfSpec extends AnyFunSuite {
  lazy val spark = Spec.spark

  private def registerScheme(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftest.impl", classOf[GraftTestFs].getName)

  private def write(p: JPath, s: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, s.getBytes("UTF-8"))
  }

  test("TaskConf round-trips session-only keys through a real task") {
    spark.sparkContext.hadoopConfiguration.set("graft.test.marker", "xyz")
    val tc = TaskConf(spark)
    val got = spark.sparkContext.parallelize(1 to 4, 4)
      .map(_ => String.valueOf(tc.value.get("graft.test.marker"))).collect()
    assert(got.toSeq == Seq.fill(4)("xyz"))
  }

  test("copyObjects/deleteObjects see session-conf-only filesystem schemes") {
    registerScheme()
    val root = Files.createTempDirectory("graft-taskconf")
    write(root.resolve("src/a.txt"), "alpha")
    write(root.resolve("src/n/b.txt"), "beta")
    val src = s"graftest://$root/src"
    val dst = s"graftest://$root/dst"
    import spark.implicits._
    val tasks = Seq(("a.txt", 5L, "text/plain"), ("n/b.txt", 4L, "text/plain"))
      .toDF("name", "size", "content_type")
    val receipts = CopyExecutor.copyObjects(spark, tasks, src, dst).collect()
    assert(receipts.forall(_.sync_status == "success"), receipts.mkString("; "))
    assert(new String(Files.readAllBytes(root.resolve("dst/a.txt"))) == "alpha")
    assert(new String(Files.readAllBytes(root.resolve("dst/n/b.txt"))) == "beta")

    val del = CopyExecutor
      .deleteObjects(spark, Seq("a.txt").toDF("name"), dst).collect()
    assert(del.forall(_.removed) && !Files.exists(root.resolve("dst/a.txt")))
  }

  test("scanCatalogDistributed lists through a session-conf-only scheme " +
       "and splits a hot prefix across tasks") {
    registerScheme()
    val root = Files.createTempDirectory("graft-skew")
    // skewed tree: one hot first-level dir with 6 subdirs × 3 files
    // (plus direct files), one lean dir, one top-level file
    write(root.resolve("b/top.txt"), "t")
    write(root.resolve("b/lean/only.txt"), "x")
    for (d <- 1 to 6; f <- 1 to 3)
      write(root.resolve(s"b/hot/d$d/f$f.txt"), s"$d$f")
    write(root.resolve("b/hot/direct.txt"), "d")
    val uri = s"graftest://$root/b"

    val expected = ObjectStoreCatalog.scanCatalog(spark, s"file://$root/b")
      .select("name", "size").collect().map(_.toSeq).toSet
    assert(expected.size == 21)

    // no splitting: the hot subtree recurses inside ONE task
    val unsplit = ObjectStoreCatalog.scanCatalogDistributed(
      spark, uri, splitThreshold = 100000)
    assert(unsplit.select("name", "size").collect().map(_.toSeq).toSet == expected)

    // splitThreshold below the hot dir's direct fan-out (7 entries): the
    // hot prefix re-seeds — its 6 children become their own scan tasks
    val split = ObjectStoreCatalog.scanCatalogDistributed(
      spark, uri, splitThreshold = 4)
    assert(split.select("name", "size").collect().map(_.toSeq).toSet == expected)
    assert(split.rdd.getNumPartitions > unsplit.rdd.getNumPartitions,
      s"split=${split.rdd.getNumPartitions} unsplit=${unsplit.rdd.getNumPartitions}")
  }
}
