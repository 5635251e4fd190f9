package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Single place all table reads go through.
  *
  * Every loader is a plain parquet scan: Catalyst sees the scan node
  * directly, so filter pushdown / column pruning / partition pruning
  * work unimpeded. At 100 TB the same loaders point at a partitioned
  * parquet/iceberg root instead of a single file — nothing downstream
  * changes.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts: downstream code uses one fixed convention — INT64
    * nanoseconds since epoch — because exact integer arithmetic (session
    * gaps, LOCF grids, decay ages) must not round. The physical parquet
    * type has varied across testdata generations (TIMESTAMP(NANOS) read
    * as INT64 under nanosAsLong; TIMESTAMP(MICROS) read as
    * TIMESTAMP_NTZ), so normalize at the loader:
    *   - LONG: already ns, pass through.
    *   - TIMESTAMP / TIMESTAMP_NTZ: `unix_micros(cast(ts as timestamp))
    *     * 1000L` — exact (no doubles), and with session tz UTC the
    *     NTZ→TZ cast is the identity on the underlying micros, matching
    *     DuckDB's `epoch_ns(ts)` on the same file.
    * Cost note: the derived column means a raw min/max ts predicate is
    * no longer pushed into the parquet footer for the timestamp-typed
    * case; at 100 TB you'd partition events by date and prune on the
    * partition column instead, which survives the conversion. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case other =>
        throw new IllegalStateException(s"events.ts has unsupported type $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Cache key for write-once derived layouts/indexes (z-order, avro,
    * CSV/JSON round-trips, dup-groups, ANN): dir + source parquet
    * size/mtime, so driver-side data REGENERATION invalidates the
    * materialization instead of serving stale rows — the events.ts
    * type drift proved testdata changes between rounds are real.
    * The RAW size/mtime values are embedded in the key (not a 32-bit
    * hash of them): a hash collision across regenerations would
    * silently serve a stale layout, and raw values cannot collide
    * unless the bytes-on-disk fingerprint itself is identical.
    * `params` appends a build-parameter/format-version token so
    * changing an index's construction defaults (nlist/m/ksub/dim, …)
    * keys a fresh build instead of serving one trained under the old
    * parameters. */
  def layoutKey(dir: String, tableName: String, params: String = ""): String = {
    val f = new java.io.File(s"$dir/$tableName.parquet")
    val dirTag = dir.replaceAll("[^A-Za-z0-9.-]", "_").stripPrefix("_")
    // the readable tag is LOSSY (distinct dirs can sanitize alike, e.g.
    // `a/b_c` vs `a_b/c`), so the FULL 128-bit digest of the raw path
    // rides along — consistent with this key's own rule that truncated
    // hashes are unacceptable where a collision silently serves a
    // stale layout
    val dirHash = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val p = if (params.isEmpty) "" else s"_$params"
    s"${dirTag}_${dirHash}_${f.length}_${f.lastModified}$p"
  }

  /** Atomic publication for write-once derived layouts: `build` writes
    * the complete index into a session-unique temp directory, which is
    * then RENAMED into `path` in one filesystem move. Readers therefore
    * never observe a partially-written index, and two concurrent
    * sessions building the same layout race to a single winner — the
    * loser's temp dir is discarded — instead of interleaving overwrite
    * writes into one shared directory (the check-then-overwrite race
    * ADVICE r6 flagged). Returns true when `path` exists on exit
    * (published by us or a concurrent winner). The move is same-volume
    * (temp sibling of the target), so ATOMIC_MOVE is a rename. */
  def publishLayout(path: String)(build: String => Unit): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val target = Paths.get(path)
    if (Files.exists(target)) return
    val tmp = path + ".build-" + java.util.UUID.randomUUID().toString.take(8)
    build(tmp)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    try Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileSystemException =>
      // lost the race — a complete index is already at `path`; drop ours
      deleteRecursively(new java.io.File(tmp))
      if (!Files.exists(target))
        throw new IllegalStateException(s"layout publish failed for $path")
    }
  }

  /** Completeness check for a published layout. `marker` is the
    * build's completeness witness (_SUCCESS for a single Spark write,
    * _done for multi-part builds). A directory WITHOUT its marker is a
    * partial remnant of a crashed pre-atomic-convention build — it is
    * removed so [[publishLayout]] can rebuild, never silently served. */
  def layoutReady(path: String, marker: String = "_SUCCESS"): Boolean = {
    if (new java.io.File(s"$path/$marker").exists()) true
    else { deleteRecursively(new java.io.File(path)); false }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete(); ()
  }
}
