package graft.sources

import org.apache.spark.sql.SparkSession

/** Shared naming + hygiene for content-fingerprinted catalog layouts
  * (round-11): every persisted serving layout — graph edge variants,
  * BM25 postings, the exact-dedup keeper index, IVFADC codes — is
  * memoized per (source dir, data fingerprint), so a testdata
  * regeneration mints a fresh table name while the previous
  * fingerprint's parquet dirs stay in the warehouse forever unless
  * pruned. The name scheme here makes pruning safe: the dir and the
  * content fingerprint hash SEPARATELY (`<base>_<dirtag>_<fptag>`), so
  * a build can recognize a stale fingerprint of the SAME source dir
  * without ever touching another dir's live layout (two sf dirs in one
  * warehouse is the normal test/bench state).
  */
object Layouts {

  private def md5hex(s: String, bytes: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(bytes).map("%02x".format(_)).mkString

  def dirTag(dir: String): String = md5hex(s"dir|$dir", 3)

  /** Catalog-safe layout name: `<base>_<dirtag>_<fptag>`. `contentKey`
    * must fold everything that invalidates the layout (source data
    * fingerprints, build parameters). */
  def name(base: String, dir: String, contentKey: String): String =
    s"${base}_${dirTag(dir)}_" + md5hex(contentKey, 5)

  /** Drop warehouse dirs (and any live catalog entries) that carry
    * `base` + THIS dir's tag but a different fingerprint — called on
    * build, i.e. exactly when a fresh fingerprint supersedes them.
    * `keepPrefix` protects the layout being built (exact table name,
    * or the common prefix of a multi-table layout like the BM25 /
    * IVFADC families). Legacy un-tagged names
    * (`<base>_<10 hex>[_suffix]`) are unreachable under this scheme
    * and pruned on sight; another dir's tagged layouts never match.
    * Filesystem-level, because the in-memory catalog forgets a
    * previous JVM's tables while their dirs persist. */
  def pruneStale(spark: SparkSession, base: String, dir: String,
                 keepPrefix: String): Unit = {
    val samedir = s"${base}_${dirTag(dir)}_"
    val legacy = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(base) + "_[0-9a-f]{10}(_[a-z]+)?")
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.listStatus(wh).foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith(keepPrefix) &&
          (n.startsWith(samedir) || legacy.matcher(n).matches())) {
        if (spark.catalog.tableExists(n)) spark.sql(s"DROP TABLE IF EXISTS `$n`")
        fs.delete(st.getPath, true)
      }
    }
  }
}
