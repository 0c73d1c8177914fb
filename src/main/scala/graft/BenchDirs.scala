package graft

import java.nio.file.{Files, Path, Paths}

/** Recursive delete-on-exit for bench scratch directories. The bench mains
  * put Glacier roots and `spark.local.dir` on tmpfs (measure the engine,
  * not a shared disk) — RAM-backed space MUST be reclaimed when the run
  * ends, or repeated runs fill /dev/shm until writes fail mid-bench.
  */
object BenchDirs {
  def deleteOnExit(dir: String): String = {
    val p = Paths.get(dir)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
    dir
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p)) { s =>
        s.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach { f =>
            try Files.deleteIfExists(f)
            catch { case _: java.io.IOException => () }
          }
      }
}
