package graft.operators

import graft.Json
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** D54 — manifest-based snapshot versioning: every commit (append or
  * replace) writes IMMUTABLE data files plus one manifest listing the
  * exact file set of the new version. Readers resolve a manifest and
  * read only its files, so
  *  - a reader mid-query never sees a half-committed epoch (the
  *    manifest lands last, atomically),
  *  - any historical version stays readable until vacuumed (time
  *    travel — the audit/debug primitive a continuously-rewritten
  *    corpus otherwise loses),
  *  - upsert/compaction rewrites (MergeUpsert/Compact) can run while
  *    yesterday's training job keeps reading yesterday's manifest.
  *
  * Scale shape: a manifest is one driver-written file of paths —
  * size scales with FILE count, not data; commits move no data at
  * all beyond the files the epoch itself wrote; reads plan from an
  * explicit file list (no directory listing of the whole table).
  * Concurrency: the version slot is claimed by an atomic
  * create-new-file — a lost race surfaces as a retry with the next
  * version number (optimistic concurrency), never a clobber.
  */
object Snapshots {

  private def manifestDir(table: String): Path = Paths.get(table, "_manifests")
  private def manifestPath(table: String, v: Int): Path =
    manifestDir(table).resolve(f"v$v%06d.json")

  /** Highest committed version, if any. */
  def currentVersion(table: String): Option[Int] = {
    val d = manifestDir(table)
    if (!Files.isDirectory(d)) None
    else {
      val vs = Files.list(d).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
          s.stripPrefix("v").stripSuffix(".json").toInt }
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** The exact file list of `version` (default: latest). */
  def files(table: String, version: Option[Int] = None): Seq[String] = {
    val v = version.orElse(currentVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $table"))
    val p = manifestPath(table, v)
    require(Files.exists(p), s"version $v does not exist in $table")
    Json.parse(Files.readString(p)) match {
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]]("files")
          .asInstanceOf[Vector[Any]].map(_.toString)
      case other => throw new IllegalStateException(s"bad manifest: $other")
    }
  }

  /** Time-travel read: the table AS OF `version` (default: latest). */
  def read(spark: SparkSession, table: String, version: Option[Int] = None): DataFrame =
    spark.read.parquet(files(table, version): _*)

  /** Append commit: new version = previous files + this epoch's. */
  def commitAppend(spark: SparkSession, table: String, df: DataFrame): Int =
    commit(table, df, replace = false)

  /** Replace commit: new version = exactly this epoch's files (the
    * delete/rewrite/compaction shape — old versions keep reading the
    * old files, which stay on disk until [[vacuum]]).
    */
  def commitReplace(spark: SparkSession, table: String, df: DataFrame): Int =
    commit(table, df, replace = true)

  private def commit(table: String, df: DataFrame, replace: Boolean): Int = {
    val epochDir = Paths.get(table, "data",
      java.util.UUID.randomUUID().toString.take(8))
    df.write.parquet(epochDir.toString)
    val newFiles = Files.list(epochDir).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted
    Files.createDirectories(manifestDir(table))
    var attempt = 0
    while (true) {
      val prev = if (replace) Nil
        else currentVersion(table).map(v => files(table, Some(v))).getOrElse(Nil)
      val v = currentVersion(table).getOrElse(0) + 1
      val body = Json.obj(Seq(
        "version" -> v.toString,
        "files" -> Json.arr((prev ++ newFiles).map(Json.str))))
      val tmp = manifestDir(table).resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.writeString(tmp, body)
      try {
        // claim the version slot atomically; an existing target means a
        // concurrent committer won the race — recompute against ITS
        // manifest and retry with the next slot
        Files.move(tmp, manifestPath(table, v), StandardCopyOption.ATOMIC_MOVE)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          attempt += 1
          require(attempt < 100, s"commit contention on $table")
      }
    }
    -1 // unreachable
  }

  /** Drop manifests older than the newest `keepVersions` and delete
    * data files no kept manifest references. Time travel shrinks to
    * the retention window; the current version is never touched.
    */
  def vacuum(table: String, keepVersions: Int): Unit = {
    require(keepVersions >= 1, "must keep at least the current version")
    val cur = currentVersion(table).getOrElse(return)
    val keepFrom = math.max(1, cur - keepVersions + 1)
    val kept = (keepFrom to cur)
      .filter(v => Files.exists(manifestPath(table, v)))
      .flatMap(v => files(table, Some(v))).toSet
    (1 until keepFrom).foreach { v =>
      val p = manifestPath(table, v)
      if (Files.exists(p)) {
        val orphans = files(table, Some(v)).filterNot(kept)
        Files.delete(p)
        orphans.foreach(f => Files.deleteIfExists(Paths.get(f)))
      }
    }
  }
}
