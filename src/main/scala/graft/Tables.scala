package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver testdata star schema
  * (see /root/repo/TESTDATA.md). Reads are plain `spark.read.parquet`
  * so Catalyst's scan planning (column pruning + predicate pushdown
  * into the parquet reader) applies untouched — at 100 TB each table
  * becomes a partitioned directory and nothing here changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val cache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame])

  /** Cached frames are bound to their SparkSession; keying by session
    * identity keeps a second session in the same JVM (or a restarted one)
    * from receiving frames of a stopped context.
    */
  def sessionKey(spark: SparkSession): Int = System.identityHashCode(spark)

  /** Single-evaluation memoization for the driver-side frame caches.
    * `TrieMap.getOrElseUpdate` may evaluate a racing thunk twice and
    * keep only one result — harmless for pure values, but these thunks
    * `persist()` a DataFrame, so the loser's blocks would leak
    * (ADVICE r5). Computation is coarse-locked on the cache; the
    * lock-free read fast path keeps steady-state cost at one TrieMap
    * lookup, and first-use contention per (session, dir) is nil.
    */
  def memo[K, V](cache: scala.collection.concurrent.TrieMap[K, V], key: K)(
      compute: => V): V =
    cache.get(key) match {
      case Some(v) => v
      case None => cache.synchronized(cache.getOrElseUpdate(key, compute))
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((sessionKey(spark), dir, name), read(spark, dir, name))

  /** Persist every table in memory and force materialization — the
    * engine-level corpus cache (the reference keeps parsed records in
    * memory across queries the same way, `files.py:19-49`). Bench and
    * repeated-query sessions call this once.
    */
  def warm(spark: SparkSession, dir: String): Unit = {
    // Cache at the session's shuffle parallelism, not the file-split
    // count: a sub-128MB table is ONE split, and a 1-partition cached
    // relation serializes every downstream compute-heavy projection
    // (text tokenization, hashing) on a single core no matter how many
    // the box has. At cluster scale the scan has thousands of splits
    // and this exchange is noise; locally it is the difference between
    // 1-way and n-way map stages.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    names.foreach { n =>
      val df = load(spark, dir, n).repartition(parts).persist()
      df.count()
      cache.put((sessionKey(spark), dir, n), df)
    }
  }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver regenerates the testdata between rounds and the parquet
    // timestamp physical type has ALREADY shifted twice (TIMESTAMP(NANOS)
    // through round 7, timestamp[us] without timezone — TIMESTAMP_NTZ —
    // in round 8, which broke 11 queries at analysis). Normalize every
    // temporal spelling to TIMESTAMP here, for every table:
    //  - nanos: rejected by Spark 4 by default → nanosAsLong + integer
    //    division (nanos exceed 2^53, double math would corrupt them);
    //  - NTZ: unix_micros fails analysis on it → cast; every engine
    //    session pins spark.sql.session.timeZone=UTC, so the cast is the
    //    identity on the stored micros and matches DuckDB's epoch_us on
    //    the same naive column.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val ntzCols = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    val normalized = ntzCols.foldLeft(df)((d, c) =>
      d.withColumn(c, col(c).cast(TimestampType)))
    if (name == "events" && normalized.schema("ts").dataType == LongType)
      normalized.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else normalized
  }

  /** Register every table as a temp view named after itself, enabling the
    * `spark.sql` surface over the same data the DataFrame queries use.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
