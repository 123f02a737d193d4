package graft

/** Cross-process rate-limit store contention probe (round-12 VERDICT
  * item 8): measures admit/deny throughput of the shared
  * [[graft.serving.FileRateLimitStore]] under N concurrent serving
  * processes drawing down one budget — the regime the file-locked
  * store exists for. Each probe process hammers `incr` on a small key
  * population for a fixed wall window and prints one JSON line; the
  * driver script launches N of these concurrently on the SAME store
  * file and sums ops. Run with plain java, classpath = the spark jars
  * dir glob plus target/scala-2.13/{classes,test-classes} (no Spark
  * session — the store is pure JDK).
  *
  * args: <storePath> <seconds> [keys=4] [periodMs=1000]
  */
object RateLimitContentionProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val seconds = args(1).toDouble
    val keys = if (args.length > 2) args(2).toInt else 4
    val periodMs = if (args.length > 3) args(3).toLong else 1000L
    val burst = 100
    val store = graft.serving.FileRateLimitStore(path)
    val rnd = new scala.util.Random(ProcessHandle.current().pid())
    var ops = 0L
    var admits = 0L
    val deadline = System.nanoTime() + (seconds * 1e9).toLong
    while (System.nanoTime() < deadline) {
      val now = System.currentTimeMillis()
      val key = s"res:ip${rnd.nextInt(keys)}"
      val n = store.incr(key, now / periodMs, now, periodMs * 2)
      if (n <= burst) admits += 1
      ops += 1
    }
    println(s"""{"pid":${ProcessHandle.current().pid()},"ops":$ops,"admits":$admits,"denies":${ops - admits},"seconds":$seconds,"opsPerSec":${ops / seconds}}""")
  }
}
