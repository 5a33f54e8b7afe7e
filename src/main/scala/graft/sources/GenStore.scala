package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generational partitioned store: the atomic-maintenance device shared
  * by the persisted dedup band index ([[graft.operators.DedupOps]]) and
  * the ANN serving index ([[graft.operators.SimilarityOps]]).
  *
  * Data files are IMMUTABLE once written — a fold never modifies the live
  * generation; it writes a new generation directory and COMMITS it by
  * atomically replacing a tiny `CURRENT` pointer file (the Iceberg/Delta
  * commit discipline on a plain filesystem). Readers resolve the pointer
  * and see fully-pre-fold or fully-post-fold state, never a torn mix; a
  * fold that dies mid-write leaves only an orphaned staging directory,
  * swept by the next successful fold. Single WRITER per store path (a
  * real deployment serializes folds through its ingest loop); concurrent
  * readers are always safe.
  *
  * Folds rewrite only the partitions the batch touches; untouched
  * partitions carry into the new generation as hard links — a
  * metadata-only operation, no data copied or read (on an object store
  * this step is the manifest re-listing old files, same device).
  */
object GenStore {

  /** Name of the committed generation under `path`, if any. */
  def currentGen(path: String): Option[String] = {
    val cur = java.nio.file.Paths.get(path, "CURRENT")
    if (java.nio.file.Files.exists(cur))
      Some(java.nio.file.Files.readString(cur).trim)
    else None
  }

  private def genNumber(gen: String): Long =
    gen.stripPrefix("gen-").takeWhile(_.isDigit).toLong

  /** The committed view of the store — resolves `CURRENT` and reads that
    * generation only (partition dirs intact, so partition-column filters
    * still prune at the scan). */
  def load(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/${currentGen(path).getOrElse(
      sys.error(s"no committed generation at $path"))}")

  /** Fold `batch` into the store at `path`, latest-wins per `idCol`:
    *
    *  1. collect the batch's distinct touched `partCol` values (bounded
    *     by the caller's partitioning contract — band count, quantizer
    *     cell count — never by data volume);
    *  2. read ONLY those partitions of the current generation, drop rows
    *     whose `idCol` re-appears in the batch (a re-ingested id REPLACES
    *     its rows), union the batch, write as the touched partitions of
    *     a NEW generation. Reading old and writing new are different
    *     paths — no checkpoint needed, no read-overwrite hazard;
    *  3. hard-link the untouched partitions into the new generation;
    *  4. commit via atomic `CURRENT` replace; sweep retired generations
    *     and crashed-fold orphans (POSIX unlink keeps any in-flight
    *     reader's open files alive until it finishes).
    *
    * Idempotent per batch: re-folding the same rows commits a generation
    * with identical content. */
  /** Children of `dir` (fully drained, stream closed — `Files.list`
    * leaks a directory FD unless explicitly closed). */
  private def children(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.list(dir)
    try st.iterator().asScala.toList finally st.close()
  }

  def fold(s: SparkSession, path: String, batch: DataFrame,
      partCol: String, idCol: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Paths.get(path)
    Files.createDirectories(root)
    val curGen = currentGen(path)
    // a non-empty root with no CURRENT pointer is NOT an empty store —
    // it is a foreign or pre-generational layout; treating it as empty
    // would commit a generation holding only this batch and silently
    // drop the standing data. Fail loudly instead of guessing.
    if (curGen.isEmpty) {
      val stray = children(root).map(_.getFileName.toString)
        .filter(n => n.startsWith(s"$partCol=") || n.startsWith("gen-"))
      require(stray.isEmpty,
        s"$path holds data ($stray) but no CURRENT pointer — not a GenStore " +
          "layout (or a crashed first fold); migrate or clear it explicitly")
    }
    val genNum = curGen.map(genNumber).getOrElse(0L) + 1
    val newGen = f"gen-$genNum%06d-p${ProcessHandle.current().pid()}"
    val newPath = s"$path/$newGen"
    curGen match {
      case None =>
        batch.write.mode("overwrite").partitionBy(partCol).parquet(newPath)
      case Some(g) =>
        val touched = batch.select(col(partCol)).distinct()
          .collect().map(_.get(0)).toSeq
        val touchedDirs = touched.map(v => s"$partCol=$v").toSet
        val survivors = s.read.parquet(s"$path/$g")
          .where(col(partCol).isInCollection(touched))
          .join(batch.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
        survivors.select(batch.columns.map(col): _*)
          .unionByName(batch)
          .write.mode("overwrite").partitionBy(partCol).parquet(newPath)
        children(Paths.get(s"$path/$g"))
          .filter(_.getFileName.toString.startsWith(s"$partCol="))
          .filterNot(p => touchedDirs.contains(p.getFileName.toString))
          .foreach { partDir =>
            val dst = Paths.get(newPath, partDir.getFileName.toString)
            Files.createDirectories(dst)
            children(partDir)
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .foreach(f => Files.createLink(dst.resolve(f.getFileName), f))
          }
    }
    // commit: atomic pointer replace — the only mutation readers observe
    val tmp = root.resolve(s"CURRENT.tmp${ProcessHandle.current().pid()}")
    Files.writeString(tmp, newGen)
    Files.move(tmp, root.resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // sweep: crashed-fold orphans at or below this commit's number, and
    // generations retired TWO OR MORE commits ago. The immediately
    // previous generation is RETAINED one fold longer — Spark readers
    // open parquet files lazily at task time, so a reader that resolved
    // CURRENT just before this commit may not have opened its files yet;
    // one-generation retention gives it a full fold cycle to finish
    // (the Iceberg/Delta snapshot-retention discipline, horizon = 1).
    children(root)
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("gen-") && n != newGen &&
          (genNumber(n) < genNum - 1 ||
            (genNumber(n) == genNum && n != newGen)) // same-number orphan
      }
      .foreach(Layouts.deleteRecursively)
  }
}
