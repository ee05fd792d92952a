package graft

import java.nio.file.{Files, Path}

/**
 * Temp directories for specs, deleted when the forked test JVM exits
 * (Test / fork := true, so the hook fires at the end of every `sbt
 * test`) — repeated runs must not accumulate /tmp litter (CLAUDE.md:
 * nothing graft-made leaks into /tmp). Fingerprinted REUSE artifacts
 * (posting stores, staged events) are intentionally not routed through
 * here: surviving the JVM is their point.
 */
object TestTmp {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    created.forEach { p =>
      try FsUtils.deleteRecursively(p)
      catch { case _: Throwable => () } // best effort; never block exit
    }))

  /** like Files.createTempDirectory, but removed at JVM exit. */
  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }
}
