package graft.operators

/** Per-JVM cache for small index METADATA reads (generation manifests,
  * centroid tables, corpus-stat rows). The index probe paths used to
  * re-run a tiny Spark collect()/head() job for these on EVERY query
  * (one to three driver-blocking mini-jobs per probe); index layouts
  * are write-once per generation directory, so a (path, mtime
  * signature) key makes the cache exact — any maintenance rewrite
  * changes the signature and misses. This caches metadata only, never
  * query results (round-13, guide §1.2 step 2: driver-side overhead).
  */
object MetaCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Recursive name@mtime:size signature of `dir` — pure filesystem
    * metadata, no file reads. Point it at the small meta/centroids
    * directories, not at data directories. Size is part of the key so
    * an in-place rewrite with identical names within mtime granularity
    * still changes the signature (round-13 advisory).
    */
  def dirSignature(dir: String): String = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) return "absent"
    val sb = new StringBuilder
    val w = java.nio.file.Files.walk(root)
    try w.sorted().forEach { p =>
      sb.append(p.getFileName).append('@')
      try {
        sb.append(java.nio.file.Files.getLastModifiedTime(p).toMillis)
        sb.append(':').append(java.nio.file.Files.size(p))
      } catch { case _: Exception => sb.append('?') }
      sb.append(';')
    } finally w.close()
    sb.toString
  }

  /** Memoizes `load`. A `load` that THROWS leaves the entry absent
    * (computeIfAbsent semantics) so a transient read failure is retried
    * on the next probe instead of caching a wrong fallback — callers
    * must keep their catch-branch fallbacks OUTSIDE this call
    * (round-13 advisory).
    */
  def cached[T <: AnyRef](key: String)(load: => T): T =
    cache.computeIfAbsent(key, _ => load).asInstanceOf[T]

  private[graft] def clear(): Unit = cache.clear()
}
