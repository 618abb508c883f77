package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Deterministic scratch "buckets" under /tmp for the side-effecting
  * operator queries (object_put / object_delete / bucket_ddl / config IO).
  * Each call rebuilds the fixture from scratch so Verify/Bench runs are
  * rerunnable and the receipts are byte-stable.
  */
object IoFixtures {
  private val Root = "/tmp/graft-io"

  def freshDir(name: String): Path = {
    val p = Paths.get(Root, name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p
  }

  def write(dir: Path, rel: String, content: String): Unit = {
    val f = dir.resolve(rel)
    Files.createDirectories(f.getParent)
    Files.write(f, content.getBytes("UTF-8"))
  }

  def uri(p: Path): String = "file://" + p.toString
}
