package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided synthetic star schema
  * (/root/testdata/sf*, see TESTDATA.md).
  *
  * Design note (100 TB): every operator in this library receives its input as
  * a DataFrame produced here, so the scan layer is a single seam. At cluster
  * scale these calls would point at partitioned/bucketed table roots instead
  * of single files; the operator code is unchanged. Filters/projections are
  * applied by callers *after* these loaders, and Catalyst pushes them into
  * the Parquet scan (verify with `.explain`: PushedFilters / ReadSchema).
  */
object Tables {

  /** Inferred-schema memo: every `spark.read.parquet(path)` without an
    * explicit schema runs a driver JOB to read footers for inference —
    * measured 25-35 ms per table per query construction (ProfileQ r16:
    * 2-5 such jobs per query = a fixed ~0.1 s tax on all 165 bench
    * queries). A table's schema is a property of its files, so it is
    * inferred ONCE per (app, path, mtime, len) and passed back explicitly;
    * the mtime+len key re-infers when a path is rewritten in-session.
    * Staleness contract (r16 ADVICE, documented): the key is the table
    * root's OWN stat, so only whole-path replacement invalidates — every
    * writer in this repo overwrites the table root (mode("overwrite")
    * replaces the dir), which bumps it. An in-place rewrite of files
    * inside a partition subdirectory would NOT bump the root; no engine
    * path does that, and a session that did must call Caches.clear() and
    * use a fresh path or app. One stat call replaces one job.
    */
  private val schemaMemo =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val key = try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      s"${spark.sparkContext.applicationId}:$path:${st.getModificationTime}:${st.getLen}"
    } catch { case _: Exception =>
      // missing/unstattable path: fall through to the plain read so the
      // caller sees the standard PATH_NOT_FOUND, not a memo artifact
      return spark.read.parquet(path)
    }
    val schema = schemaMemo.getOrElseUpdate(key, spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Normalize `events.ts` to session-zoned TimestampType. The testdata
    * stores Timestamp(isAdjustedToUTC=false, MICROS), which Spark 4 surfaces
    * as TIMESTAMP_NTZ: every session here pins spark.sql.session.timeZone=
    * UTC, so `cast("timestamp")` maps the wall-clock value to the identical
    * instant (exact, no precision change). Data written with TIMESTAMP(NANOS)
    * is NOT readable here — no session sets the nanosAsLong legacy flag, so
    * such a scan fails fast with ILLEGAL_PARQUET_TYPE rather than surfacing a
    * long column (the former long-reconstruction branch was unreachable and
    * was removed; re-reading that generation means re-enabling the flag AND
    * reinstating micros = nanos div 1000 — integer division, a double
    * division loses precision above 2^53 ns). Downstream engine logic is
    * second-granularity, matching the DuckDB oracle's epoch_ms(ts)//1000.
    */
  private def withNanoTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol,
          org.apache.spark.sql.functions.col(tsCol).cast("timestamp"))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** Hive-style partition column surfaced when events is stored as a
    * date-partitioned directory (events.parquet/event_date=YYYY-MM-DD/…,
    * the layout a 100 TB event log actually has — see PartitionEvents).
    * Loaders drop it so both layouts present the identical 6-column
    * schema to every operator; eventsInRange turns it into a partition
    * filter FIRST, so date-range scans list only the in-range day dirs.
    */
  val EventsPartCol = "event_date"

  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    val flat = if (raw.columns.contains(EventsPartCol))
      raw.drop(EventsPartCol) else raw
    withNanoTs(flat, "ts")
  }

  /** events bounded to [from, until) with the predicate applied on the RAW
    * stored column BEFORE the timestamp normalization, so it pushes into the
    * parquet scan (a filter on a rewritten column is per-row compute —
    * measured: only IsNotNull reached the scan; at 100 TB that is a full
    * stream-table scan per time-range query). Bounds are second-granularity
    * 'yyyy-MM-dd HH:mm:ss' UTC strings. NTZ storage: compare against a typed
    * LocalDateTime literal (same NTZ type → pushable, no cast on the column).
    */
  def eventsInRange(s: SparkSession, d: String, from: String,
      until: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    def ldt(ts: String): java.time.LocalDateTime =
      java.time.LocalDateTime.parse(ts.replace(' ', 'T'))
    val raw = table(s, d, "events")
    // Derived partition predicate: when the layout is date-partitioned,
    // event_date == date(ts) by construction (PartitionEvents), so the ts
    // range implies event_date ∈ [date(from), date(last in-range instant)].
    // The redundant bound is what Catalyst turns into PartitionFilters —
    // the scan then LISTS only the in-range day directories, the file-level
    // analog of skipping 99.99% of a year-partitioned 100 TB event log.
    // An `until` at exactly midnight excludes its whole day (ts < until).
    val pruned = if (raw.columns.contains(EventsPartCol)) {
      val u = ldt(until)
      val lastDay = if (u.toLocalTime == java.time.LocalTime.MIDNIGHT)
        u.toLocalDate.minusDays(1) else u.toLocalDate
      raw.where(col(EventsPartCol) >= lit(java.sql.Date.valueOf(ldt(from).toLocalDate)) &&
        col(EventsPartCol) <= lit(java.sql.Date.valueOf(lastDay)))
    } else raw
    val ranged = pruned.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        pruned.where(
          col("ts") >= lit(ldt(from)) && col("ts") < lit(ldt(until)))
      case _ =>
        pruned.where(col("ts") >= from && col("ts") < until)
    }
    val flat = if (ranged.columns.contains(EventsPartCol))
      ranged.drop(EventsPartCol) else ranged
    withNanoTs(flat, "ts")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Session factory used by Bench and tests (Verify builds its own per the
  * driver contract). AQE on; shuffle partitions sized for local[32] — on a
  * real cluster this would be `spark.sql.adaptive.coalescePartitions` doing
  * the sizing from runtime stats.
  */
object GraftSession {
  def build(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle width = core count. Measured r16 (hot-22 subset, floor 64k):
    // 2×cores REGRESSED wall 19.5 -> 26.8 s and executor CPU 229 -> 363 k
    // ms — per-task fixed cost dominates at bench scale, so extra width
    // buys contention, not parallelism. Env-overridable for A/Bs; derived
    // from cores, never a fixed local constant.
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE coalesced-partition floor, r16-measured (OPTIMIZATION_r16.md):
      // tasks under ~0.5 MiB of shuffle input carry more fixed per-task
      // cost than compute — sweeping 16k/64k/128k/256k/512k/1m/2m on the
      // 22 CPU-heaviest queries gave walls 28.2/19.5/18.4/15.4/14.3/16.3/
      // 18.3 s (executor CPU collapsed 229k -> 42k ms at 512k). 512k also
      // won on the pair-emission family (12.6 -> 9.6 s) that the old
      // 64 KiB floor was protecting. Full-suite walls tie within noise
      // across 64k/256k/512k once the codegen cache (below) is sized
      // right, but total CPU still scales with task count (216k -> 49k
      // ms), and total CPU is what the wall becomes at low core counts
      // (8-CPU suite: 81.9 s at the r15 config, 56.8 s here). At
      // production scale the 64 MiB advisory target dominates and the
      // floor never binds.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART_SIZE", "512k"))
      // Scan-split open cost: LEFT AT THE 4 MiB DEFAULT (r17, measured).
      // Splitting the 2-16 MiB bench tables into 32 scan tasks (openCost
      // 256 KiB) parallelized single-task scan stages but regressed the
      // 12-query probe subset 5.8 -> 6.4 s: at this input size ~30 extra
      // tasks per stage cost more in per-task fixed overhead than the
      // parallelism returns — the same width-vs-contention tradeoff as
      // the r16 AQE-floor sweep. Env seam kept for future A/Bs.
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "4194304"))
      // let persisted frames KEEP their output partitioning (off by
      // default under AQE): the memoized shared frames are deliberately
      // persisted pre-partitioned on their join keys, and with this off
      // every cache consumer re-shuffled what the build already placed
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // Generated-class cache (static conf, default 100 entries): a
      // 165-query engine cycles ~several hundred distinct generated
      // sources per suite, so the default LRU thrashes and stages pay
      // Janino recompiles all run long. Sized to hold the whole suite.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
