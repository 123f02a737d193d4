package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write sinks as engine surface (SURVEY §2.1 S4/S5/S6/S13): the
  * reference's row mutations become whole-relation rewrites — the only
  * scalable shape for immutable columnar storage.
  *
  *  - S4 append (`db.add(...); db.commit()`, routers.py:86-92):
  *    `mode("append")` parquet — new files land next to old ones, no
  *    rewrite of existing data.
  *  - S5 update (routers.py:124-136): read → conditional column rewrite
  *    → overwrite. At 100 TB this is a partition-scoped rewrite
  *    (dynamic partition overwrite), not a row update.
  *  - S6 delete (routers.py:152-153): anti-join against the key set,
  *    then overwrite.
  *  - S13 atomic single-file CSV (demo_synthetic.py:25-40,
  *    tmp + os.replace): write to a temp dir, then ATOMICALLY move the
  *    single part file to the target path — readers never observe a
  *    half-written file, exactly the reference's contract. Single-file
  *    CSV is inherently a small-result sink (coalesce(1)); big results
  *    belong in parquet.
  */
object Sinks {

  /** S4 — append rows to a parquet table path. */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** S5 — update-as-overwrite with a real directory swap: write the
    * rewrite to a staging dir (the only Spark job that reads the old
    * files), then two renames — old → backup, staging → path — so a
    * crash at any point leaves either the old table (at path or at
    * backup) or the new one intact; nothing is deleted until the new
    * directory is in place. */
  def updateOverwrite(spark: SparkSession, path: String)(rewrite: DataFrame => DataFrame): Unit = {
    val base = path.stripSuffix("/")
    val staging = Paths.get(base + ".staging")
    val backup = Paths.get(base + ".backup")
    deleteRecursively(staging)
    deleteRecursively(backup)
    rewrite(spark.read.parquet(path)).write.mode("overwrite").parquet(staging.toString)
    val dest = Paths.get(base)
    Files.move(dest, backup, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(staging, dest, StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable => // roll back so readers still see the old table
      Files.move(backup, dest, StandardCopyOption.ATOMIC_MOVE); throw e
    }
    deleteRecursively(backup)
  }

  /** Small-files compaction — the table-maintenance operator every
    * 100 TB lake runs on a schedule: streaming appends and fine-grained
    * updates leave directories with thousands of KB-scale files whose
    * per-file open/footer overhead dominates scan time. Rewrites the
    * directory into ceil(totalBytes / targetBytes) files through
    * [[updateOverwrite]]'s staging+swap (crash-safe, readers never see
    * a partial table). With `sortCols`, compaction ALSO restores
    * clustering via repartitionByRange + sortWithinPartitions, so
    * min/max file pruning (the ZOrder read path) works again after the
    * append traffic scrambled it. Returns (files before, files after).
    *
    * Sizing note: the ratio uses the CURRENT on-disk bytes, so
    * compression ratio carries over approximately; targetBytes should
    * be the cluster's `maxPartitionBytes` so one post-compaction file
    * is one scan split. */
  def compactParquet(spark: SparkSession, path: String,
                     targetBytes: Long = 128L << 20,
                     sortCols: Seq[String] = Nil): (Int, Int) = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(fsPath)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val nFiles = math.max(1,
      math.ceil(parts.map(_.getLen).sum.toDouble / targetBytes).toInt)
    updateOverwrite(spark, path) { df =>
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)
    }
    (parts.length, nFiles)
  }

  /** S6 — delete-as-anti-join: drop rows whose key appears in `keys`. */
  def deleteWhere(spark: SparkSession, path: String, keys: DataFrame, keyCol: String): Unit =
    updateOverwrite(spark, path)(df =>
      df.join(keys.select(col(keyCol)), Seq(keyCol), "left_anti"))

  /** S13 — atomic single-file CSV with header: temp dir + rename of the
    * lone part file (os.replace semantics). */
  def csvAtomic(df: DataFrame, path: String): Unit = {
    val tmp = path + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    val listing = Files.list(Paths.get(tmp))
    val part =
      try listing.filter(_.getFileName.toString.startsWith("part-"))
        .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
      finally listing.close()
    Files.move(part, Paths.get(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(Paths.get(tmp))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
}
