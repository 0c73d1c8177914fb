package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Glacier — an Iceberg-style snapshot-table layer written from scratch
  * (no Iceberg runtime is resolvable offline; SURVEY.md §7.0 documents the
  * substitution). One Glacier root holds a *catalog* of named logical
  * tables whose state advances atomically in snapshots:
  *
  * {{{
  * root/
  *   data/snap-<id>/<table>/   immutable parquet dirs (never rewritten)
  *   meta/snap-<id>.json       manifest: parent id, per-table file lists
  *                             (per-partition lineage: part-file names +
  *                             byte sizes + row counts), metrics
  *   meta/CURRENT              atomic pointer (tmp-write + ATOMIC_MOVE)
  * }}}
  *
  * Semantics:
  *  - `Append` table: snapshot's file list = parent's list ++ new dir
  *    (seen set, crawl-order log, docs — monotone state).
  *  - `Replace` table: file list = new dir only (frontier — rewritten
  *    each round).
  *  - Time travel: `read(table, Some(snapshotId))` unions exactly that
  *    snapshot's file list.
  *  - Crash safety: data + manifest are written first; the commit *is* the
  *    pointer rename. A crash before the rename leaves the previous
  *    snapshot current and only orphan data files (never a torn table).
  *
  * At cluster scale the same layout works on any Hadoop-compatible FS;
  * the pointer rename maps to a conditional-put / metastore swap. Local
  * java.nio is used here because the sandbox FS is POSIX.
  */
final class Glacier(val root: String) {
  import Glacier._
  // expose the commit vocabulary through the instance for call-site brevity
  val Append: Glacier.Append.type = Glacier.Append
  val Replace: Glacier.Replace.type = Glacier.Replace
  def TableWrite(table: String, df: DataFrame, mode: Mode,
                 rows: Option[() => Long] = None,
                 stage: Int = 0): Glacier.TableWrite =
    Glacier.TableWrite(table, df, mode, rows, stage)

  private implicit val fmts: Formats = DefaultFormats
  private val SnapJsonRe = "^snap-(\\d+)\\.json$".r

  private def metaDir: Path = Paths.get(root, "meta")
  private def dataDir(snap: Long): String = s"$root/data/snap-$snap"

  // ---- read side -----------------------------------------------------------

  def currentSnapshotId: Option[Long] = {
    val p = metaDir.resolve("CURRENT")
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  def manifest(id: Long): Manifest = {
    val json = Files.readString(metaDir.resolve(s"snap-$id.json"))
    JsonMethods.parse(json).extract[Manifest]
  }

  /** Missing-tolerant manifest lookup (expired or never-written snapshot
    * ids → None), keeping read()/rowCount()'s documented contract. */
  def manifestOpt(id: Long): Option[Manifest] =
    if (Files.exists(metaDir.resolve(s"snap-$id.json"))) Some(manifest(id))
    else None

  def currentManifest: Option[Manifest] = currentSnapshotId.map(manifest)

  def history: Seq[Manifest] = {
    currentManifest match {
      case None => Nil
      case Some(m) =>
        // stops at the oldest RETAINED ancestor (expiry may have deleted
        // manifests beyond it)
        Iterator.iterate(Option(m))(_.flatMap(_.parentId).flatMap(manifestOpt))
          .takeWhile(_.isDefined).flatten.toSeq.reverse
    }
  }

  /** Read a table at a snapshot (default: current). Missing table/snapshot
    * → None (caller supplies the empty-state Dataset; schemas live with the
    * caller's Encoders, not the table layer).
    */
  def read(spark: SparkSession, table: String,
           snapshotId: Option[Long] = None): Option[DataFrame] = {
    val id = snapshotId.orElse(currentSnapshotId)
    id.flatMap(manifestOpt).flatMap(_.tables.get(table)).flatMap { st =>
      if (st.files.isEmpty) None
      else Some(spark.read.parquet(st.files: _*))
    }
  }

  def rowCount(table: String, snapshotId: Option[Long] = None): Long =
    snapshotId.orElse(currentSnapshotId).flatMap(manifestOpt)
      .flatMap(_.tables.get(table)).map(_.rows).getOrElse(0L)

  // ---- commit --------------------------------------------------------------

  /** Atomically commit one snapshot containing all `writes` plus carried-
    * forward state of untouched tables. Returns the new snapshot id.
    */
  def commit(spark: SparkSession, writes: Seq[TableWrite],
             metrics: => Map[String, Long] = Map.empty,
             note: String = ""): Long = synchronized {
    Files.createDirectories(metaDir)
    val parent = currentManifest
    val newId = parent.map(_.snapshotId + 1).getOrElse(1L)

    val verbose = sys.env.contains("SPARK_GRAFT_COMMIT_VERBOSE")
    // Table writes run SERIALLY by default: each write is one Spark job
    // that already parallelizes across the cluster, and measurement showed
    // concurrent submission in a shared executor is an anti-optimization —
    // two heavy jobs racing for the same task slots + cache blocks ran the
    // same round 4-5× slower at 32 local cores (140 s vs 26 s round-1
    // wall; see BENCH.md round 2). On a real multi-executor cluster where
    // single small writes genuinely under-fill the cluster, set
    // SPARK_GRAFT_COMMIT_PAR>1 to overlap them — `TableWrite.stage`
    // ordering (ascending stages, concurrency only within a stage) still
    // protects writes that share an uncached upstream chain. Order-
    // sensitive effects (manifest, row-count thunks) happen after the
    // final barrier either way.
    locally {
      val par = sys.env.getOrElse("SPARK_GRAFT_COMMIT_PAR", "1").toInt
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(par, writes.size)))
      try {
        import scala.jdk.CollectionConverters._
        writes.groupBy(_.stage).toSeq.sortBy(_._1).foreach { case (_, ws) =>
          val tasks: Seq[java.util.concurrent.Callable[Unit]] = ws.map { w =>
            () => {
              val t0 = System.nanoTime()
              w.df.write.mode("overwrite").parquet(s"${dataDir(newId)}/${w.table}")
              if (verbose) System.err.println(
                f"[commit] snap-$newId ${w.table}%-10s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
            }
          }
          pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
        }
      } finally pool.shutdown()
    }
    val written: Map[String, TableState] = writes.map { w =>
      val dir = s"${dataDir(newId)}/${w.table}"
      val local = Paths.get(dir)
      val paths = scala.util.Using.resource(Files.list(local)) { stream =>
        stream.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .toList
      }
      // footer reads are independent local metadata reads — run them on a
      // small pool (serially they add ~10 ms × parts × tables to every
      // round's commit floor)
      val parts = {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.max(1, math.min(8, paths.size)))
        try {
          val tasks: Seq[java.util.concurrent.Callable[FileEntry]] =
            paths.map(p => () => FileEntry(p.getFileName.toString,
              Files.size(p), parquetRowCount(p)))
          pool.invokeAll(tasks.asJava).asScala.map(_.get()).toList
        } finally pool.shutdown()
      }.sortBy(_.path)
      // caller-known count (a thunk, so Observation-backed metrics fired
      // by this very write can supply it), else the sum of per-part footer
      // counts — driver-local metadata reads, NO Spark job either way
      val rows = w.rows.map(_.apply()).getOrElse(parts.map(_.rows).sum)
      val parentFiles = w.mode match {
        case Append =>
          parent.flatMap(_.tables.get(w.table)).map(_.files).getOrElse(Nil)
        case Replace => Nil
      }
      val parentRows = w.mode match {
        case Append =>
          parent.flatMap(_.tables.get(w.table)).map(_.rows).getOrElse(0L)
        case Replace => 0L
      }
      w.table -> TableState(parentFiles :+ dir, parentRows + rows, parts)
    }.toMap

    val carried = parent.map(_.tables).getOrElse(Map.empty) -- written.keySet
    val m = Manifest(newId, parent.map(_.snapshotId), carried ++ written,
                     metrics, note)

    Files.writeString(metaDir.resolve(s"snap-$newId.json"),
                      Serialization.writePretty(m))
    // the atomic commit point:
    val tmp = metaDir.resolve(s"CURRENT.tmp-$newId")
    Files.writeString(tmp, newId.toString)
    Files.move(tmp, metaDir.resolve("CURRENT"),
               StandardCopyOption.ATOMIC_MOVE,
               StandardCopyOption.REPLACE_EXISTING)
    newId
  }

  // ---- maintenance ---------------------------------------------------------

  /** Rewrite a table's current contents into ONE fresh directory with a
    * bounded part-file count, committed as a Replace snapshot (rows
    * unchanged up to `transformFn` — e.g. folding bloom delta rows per
    * shard). An append-only table accretes one directory per commit and its
    * manifests re-list every historical dir; a long crawl (thousands of
    * rounds) pays that listing on every read. Compaction folds the list
    * back to one entry; older snapshots still time-travel to the
    * pre-compaction dirs until expired.
    */
  def compact(spark: SparkSession, table: String, parts: Int = 8,
              transformFn: DataFrame => DataFrame = identity): Option[Long] =
    read(spark, table).map { df =>
      commit(spark,
        Seq(TableWrite(table, transformFn(df).coalesce(parts), Replace)),
        note = s"compact $table")
    }

  /** Delete all snapshots except the most recent `keepLast`: expired
    * manifest files are removed, then every `data/snap-*` directory not
    * referenced by a retained manifest is deleted. Time travel to retained
    * snapshots is untouched (their manifests may reference old data dirs —
    * those are kept). Returns the expired snapshot ids.
    */
  def expireSnapshots(keepLast: Int): Seq[Long] = synchronized {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val all = scala.util.Using.resource(Files.list(metaDir)) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .collect { case SnapJsonRe(id) => id.toLong }.toList.sorted
    }
    val retained = history.map(_.snapshotId).takeRight(keepLast).toSet
    val expired = all.filterNot(retained)
    val referencedDirs: Set[String] = retained.flatMap(id =>
      manifestOpt(id).toSeq.flatMap(_.tables.values.flatMap(_.files)))
    expired.foreach(id => Files.deleteIfExists(metaDir.resolve(s"snap-$id.json")))
    val dataRoot = Paths.get(root, "data")
    if (Files.isDirectory(dataRoot)) {
      val dirs = scala.util.Using.resource(Files.list(dataRoot))(
        _.iterator().asScala.toList)
      dirs.foreach { d =>
        val snapDirs = scala.util.Using.resource(Files.list(d))(
          _.iterator().asScala.toList)
        snapDirs.filterNot(t => referencedDirs.contains(t.toString))
          .foreach(deleteRecursively)
        if (scala.util.Using.resource(Files.list(d))(!_.iterator().hasNext))
          Files.deleteIfExists(d)
      }
    }
    expired
  }

  /** Exact row count of one part-file from its parquet FOOTER — a local
    * metadata read (tail of the file), not a data scan; completes per-part
    * lineage (bytes + rows) at zero job cost even at 10^4-round manifest
    * scale. */
  private def parquetRowCount(p: Path): Long =
    scala.util.Using.resource(
      org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toUri),
          new org.apache.hadoop.conf.Configuration())))(_.getRecordCount)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      scala.util.Using.resource(Files.list(p))(
        _.iterator().asScala.toList).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

object Glacier {
  /** One parquet part-file: lineage unit (name, bytes, rows). `rows`
    * defaults to -1 so manifests written before the footer-count landed
    * still deserialize. */
  final case class FileEntry(path: String, bytes: Long, rows: Long = -1L)
  final case class TableState(files: List[String], rows: Long,
                              partitions: List[FileEntry])
  final case class Manifest(
      snapshotId: Long,
      parentId: Option[Long],
      tables: Map[String, TableState],
      metrics: Map[String, Long],
      note: String,
  )

  sealed trait Mode
  case object Append extends Mode
  case object Replace extends Mode
  /** `rows`: caller-known row count of `df`; when provided the commit skips
    * the read-back count job (the crawl loop already knows every delta's
    * cardinality from its metric aggregations). `stage`: writes in a lower
    * stage complete before a higher stage starts — the caller's way to
    * declare "this write materializes a cache that one reads".
    */
  final case class TableWrite(table: String, df: DataFrame, mode: Mode,
                              rows: Option[() => Long] = None,
                              stage: Int = 0)

}
