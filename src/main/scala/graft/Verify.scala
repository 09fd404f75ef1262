package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name prefixes for a targeted
    // local re-check (the driver always calls with two args). Empty
    // prefixes (trailing comma, "") would match EVERY query via
    // startsWith("") — drop them and fail fast on an all-empty filter
    // instead of silently running the full suite.
    val targeted = args.length > 2
    val keep: String => Boolean =
      if (targeted) {
        val ps = args(2).split(',').toSeq.filter(_.nonEmpty)
        require(ps.nonEmpty, s"no non-empty prefixes in filter '${args(2)}'")
        name => ps.exists(name.startsWith)
      } else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Targeted mode MERGES into an existing oracle_sql.json instead of
    // clobbering it with only the filtered subset — a targeted re-check
    // pointed at a full run's outDir must leave the untouched parquet
    // dirs' oracle entries comparable. Full mode writes fresh (no stale
    // entries for renamed queries).
    val path = Paths.get(s"$outDir/oracle_sql.json")
    val existing: Map[String, String] =
      if (targeted && Files.exists(path)) {
        import scala.jdk.CollectionConverters._
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(Files.readString(path), classOf[java.util.Map[String, String]])
          .asScala.toMap
      } else Map.empty
    val merged = existing ++ SparkEntry.oracleSql.filter(kv => keep(kv._1))
    val json = merged.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(path, json)
    spark.stop()
  }
}
