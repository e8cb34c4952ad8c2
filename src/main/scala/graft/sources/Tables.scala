package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table catalog over a scale-factor directory of parquet files.
  *
  * Spark-first analogue of scida's format discovery + lazy load
  * (reference: src/scida/convenience.py:160 `load`,
  * src/scida/io/_base.py): a dataset directory is opened lazily, each
  * member becomes a lazily-scanned DataFrame, and column
  * pruning/predicate pushdown replace dask's chunk-level laziness.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // In-session catalog: `spark.read.parquet` runs a driver-side
  // schema/footer job on EVERY call — ~40-80 ms per query that a real
  // deployment pays once at catalog registration (metastore), not per
  // query. DataFrames are immutable plans, safe to share; keyed by
  // session too so a restarted session never leaks stale plans.
  private val catalog =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val k = (spark, dir, name)
    val hit = catalog.get(k)
    if (hit != null) return hit
    // miss path (once per session x table): sweep entries whose
    // session has stopped — without this a JVM that recycles sessions
    // (suite-per-session test runs, long-lived services) pins every
    // dead session's plans and file indexes in this static map forever
    val it = catalog.keySet().iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    catalog.computeIfAbsent(k, _ => {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") normalizeEvents(df) else df
    })
  }

  /** Cached read of a derived-artifact parquet path (rank tables,
    * persisted indexes): same per-session catalog rationale — the
    * listing/footer job runs once, consumers share the plan. Callers
    * must key artifact paths per dataset (Fixtures.tmpPath does). */
  def parquetCached(spark: SparkSession, path: String): DataFrame = {
    val k = (spark, path, "__artifact__")
    val hit = catalog.get(k)
    if (hit != null) return hit
    catalog.computeIfAbsent(k, _ => spark.read.parquet(path))
  }

  /** events.parquet's `ts` arrives in one of two physical layouts
    * depending on the generator: TIMESTAMP(NANOS) read as an
    * epoch-nano long (GraftSession nanosAsLong), or a plain
    * microsecond timestamp (naive parquet micros → TIMESTAMP_NTZ).
    * Normalize both to the SAME logical triple: raw epoch nanos
    * (`ts_ns`) and micros (`ts_us`) for cheap integer arithmetic at
    * 100 TB, and a microsecond TimestampType (`ts`) for window
    * functions. The NTZ cast is exact because the session time zone
    * is pinned to UTC — the same naive-as-UTC reading DuckDB's
    * epoch_us/epoch_ns use. ONE derivation site: every event query
    * reads `ts_us` instead of re-spelling the micros/nanos
    * convention, so a third physical layout is a one-line change. */
  private def normalizeEvents(df: DataFrame): DataFrame =
    (df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
        .withColumnRenamed("ts", "ts_ns")
        // integer division — `/` would cast the ~1.7e18 nano value to
        // double (> 2^53) and round, putting ~13% of ts off by 1us
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => df
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }).withColumn("ts_us", expr("ts_ns div 1000"))

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  /** Corpus contract: `doc_id` is UNIQUE per row (a doc identity, not
    * a page/revision key). Retrieval operators lean on it — bm25's df
    * counts `count(1)` over (doc_id, dl, term) groups, which equals
    * `count(DISTINCT doc_id)` only while doc_id never repeats with
    * different text (TextHashingSpec pins the precondition). */
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Series loader — scida `DatasetSeries` (reference:
    * src/scida/series.py:1): an ordered collection of snapshots of the
    * same logical table, unioned with a snapshot tag so downstream
    * queries can partition-prune on it. */
  def series(spark: SparkSession, dirs: Seq[(String, String)], name: String): DataFrame =
    dirs.map { case (tag, d) => apply(spark, d, name).withColumn("snapshot", lit(tag)) }
      .reduce(_ unionByName _)
}
