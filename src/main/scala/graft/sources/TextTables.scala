package graft.sources

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's native line-oriented I/O surface (SURVEY §2.1)
  * re-expressed on Spark sources/sinks:
  *
  *  - S1/S2 line scans incl. multi-path source union
  *  - S3 side-input (distributed cache → broadcast)
  *  - S4 Hive-style dt=<date> partitioned directory source with
  *    partition pruning
  *  - S6/S7 uncompressed text sink with overwrite semantics
  *  - the `\001`-delimited key + JSON payload record formats of
  *    UserHotcar/UserNewcar (FIXTURES.md §1.3-1.5)
  */
object TextTables {

  /** S1/S2 — line scan over one or more paths (the reference's two
    * `addInputPath` calls into one job, ReduceJoinJob.java:66-67). Use
    * `input_file_name()` downstream for source-tag dispatch (P4).
    */
  def readLines(spark: SparkSession, paths: String*): DataFrame =
    spark.read.text(paths: _*)

  /** The `\001`-keyed JSON profile record (UserHotcar.java:45-56):
    * `userId \001 {"bycar_profile": {"cityid": "...", "priceid": "..."}}`
    * → (user_id, cityid packed string, priceid float-with-default).
    * Malformed rows (arity != 2, reference :46) are dropped — P3.
    */
  def parseProfiles(lines: DataFrame): DataFrame = {
    val parts = split(col("value"), "")
    lines
      .withColumn("__p", parts)
      .filter(size(col("__p")) === 2)
      .select(
        col("__p").getItem(0).as("user_id"),
        get_json_object(col("__p").getItem(1), "$.bycar_profile.cityid").as("cityid"),
        coalesce(
          get_json_object(col("__p").getItem(1), "$.bycar_profile.priceid")
            .try_cast("float"),
          lit(0.0f)).as("priceid"))
      .filter(col("cityid").isNotNull)
  }

  /** The city → packed car list side record (UserHotcar.java:124-129):
    * `cityId \001 {"infoidlist": "infoId@price,..."}`.
    */
  def parseCityCars(lines: DataFrame): DataFrame = {
    val parts = split(col("value"), "")
    lines
      .withColumn("__p", parts)
      .filter(size(col("__p")) === 2)
      .select(
        col("__p").getItem(0).as("city_id"),
        get_json_object(col("__p").getItem(1), "$.infoidlist").as("infoidlist"))
      .filter(col("infoidlist").isNotNull)
  }

  /** S6/S7 — value-only text sink, uncompressed, overwrite-if-exists
    * (UserHotcar.java:221-229: delete output dir + setCompressOutput
    * false). `df` must be a single string column.
    */
  def writeTextUncompressed(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "none")
      .text(path)

  /** S8 — LZO codec support (ref pom.xml:101-105 ships hadoop-lzo).
    * The GPL hadoop-lzo native binding doesn't exist here; aircompressor
    * (already on Spark's classpath for ORC/Parquet) provides pure-Java
    * Hadoop `CompressionCodec`s for the same on-disk formats: LzopCodec
    * writes/reads the framed `.lzo` lzop container hadoop-lzo produces,
    * LzoCodec the raw `.lzo_deflate` block format. Registering them on
    * the Hadoop conf wires BOTH directions: the text sink accepts the
    * codec by class name, and the read path resolves `.lzo` files by
    * extension through the codec factory — so a directory of
    * hadoop-lzo-written files is directly scannable.
    */
  val LzopCodecClass = "io.airlift.compress.lzo.LzopCodec"
  val LzoCodecClass = "io.airlift.compress.lzo.LzoCodec"

  def enableLzo(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val existing = Option(conf.get(key)).filter(_.nonEmpty)
      .map(_.split(",").toSeq).getOrElse(Seq(
        "org.apache.hadoop.io.compress.DefaultCodec",
        "org.apache.hadoop.io.compress.GzipCodec",
        "org.apache.hadoop.io.compress.BZip2Codec"))
    val want = Seq(LzopCodecClass, LzoCodecClass)
    conf.set(key, (existing ++ want.filterNot(existing.contains)).mkString(","))
  }

  /** S8 write side — LZO-compressed text sink (the reference's
    * `setCompressOutput` + LzopCodec shape). Output files end in `.lzo`.
    */
  def writeTextLzo(df: DataFrame, path: String): Unit = {
    enableLzo(df.sparkSession)
    df.write.mode(SaveMode.Overwrite)
      .option("compression", LzopCodecClass)
      .text(path)
  }

  /** S4 — Hive-style date-partitioned directory source: reads
    * `parent/dt=<date>/` via a partition-column filter so Catalyst
    * prunes every other partition at planning time (the reference builds
    * the path by hand, UserNewcar.java:241-247; declaring it as a filter
    * keeps pruning AND schema evolution).
    */
  def readDatePartition(spark: SparkSession, parent: String, date: String)
      : DataFrame =
    spark.read
      .option("basePath", parent)
      .text(parent)
      .filter(col("dt") === date)

  /** S4, columnar form — same Hive-style `parent/dt=<date>/` pruned read
    * over parquet partitions (the layout `writeDatePartitioned` lays
    * down). The `dt` filter is a partition-column predicate, so Catalyst
    * plans a scan of exactly one directory; `basePath` keeps `dt`
    * visible as a column.
    */
  def readDatePartitionParquet(spark: SparkSession, parent: String,
                               date: String): DataFrame =
    spark.read
      .option("basePath", parent)
      .parquet(parent)
      .filter(col("dt") === date)

  /** "Yesterday" in yyyy-MM-dd, the reference's partition choice
    * (DateHelper.offsetDateTime, DateHelper.java:39-47).
    */
  def yesterday(today: java.time.LocalDate = java.time.LocalDate.now()): String =
    today.minusDays(1).toString

  /** S4 write side — lay a DataFrame out as `path/dt=<date>/` Hive-style
    * partitions from a date column (the layout the reference's daily
    * batch consumes). Dynamic partition overwrite replaces only the
    * partitions present in `df` — the idempotent daily-rerun behavior a
    * dt= pipeline needs (a full-dir overwrite would drop history).
    */
  def writeDatePartitioned(df: DataFrame, path: String, dateCol: String): Unit =
    df.withColumn("dt", date_format(col(dateCol), "yyyy-MM-dd"))
      .write
      .partitionBy("dt")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** S3 — side-input as a literal broadcast map (the distributed-cache →
    * in-heap HashMap pattern, UserHotcar.java:102-142). Prefer a
    * `broadcast(df)` join; this exists for byte-level parity with
    * mapper-side lookup logic and for genuinely non-relational probes.
    * Collects the SMALL side only — caller asserts boundedness.
    */
  def sideInputMap(df: DataFrame, keyCol: String, valCol: String,
                   maxRows: Int = 1000000): Broadcast[Map[String, String]] = {
    val rows = df.select(col(keyCol).cast("string"), col(valCol).cast("string"))
      .limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"side input exceeds $maxRows rows - use a broadcast join instead")
    df.sparkSession.sparkContext.broadcast(
      rows.map(r => r.getString(0) -> r.getString(1)).toMap)
  }

  /** NCDC-style fixed-width weather line source (BootStrap pipeline,
    * MaxTemperatureMapper.java:17-22): (year, signed temp).
    */
  def parseWeather(lines: DataFrame): DataFrame =
    lines.select(
      graft.ops.Ops.fixedWidth(col("value"), 15, 19).as("year"),
      graft.ops.Ops.fixedWidthInt(col("value"), 87, 92).as("temp"))
      .filter(col("temp").isNotNull)
}
