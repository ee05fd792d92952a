package graft

import java.nio.file.{Files, Path, Paths}

/** tiny shared filesystem helpers (one implementation — Bench,
  * ScalingEvidence and the store's delete path all need them). */
object FsUtils {

  /** recursive delete; multi-GB bench staging and retired store buckets
    * must never outlive their run (a leaked staging dir once filled the
    * sandbox disk). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      } finally walk.close()
    }

  def deleteRecursively(dir: String): Unit = deleteRecursively(Paths.get(dir))
}
