package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Semi-structured payload handling: JSON columns inside otherwise
 * columnar tables (the `events.props` pattern — per-event attribute
 * bags too sparse/varied to column-ize), and JSONL as an interchange
 * format for document corpora.
 *
 * Design: `from_json` with an EXPLICIT schema, never schema inference —
 * inference is a full extra pass over the data (a non-starter at
 * 100 TB) and makes the output schema data-dependent. Malformed rows
 * yield nulls (PERMISSIVE), so one bad payload can't fail a 10^11-row
 * stage; count the nulls downstream if you need a quality signal.
 */
object SemiStructured {

  /**
   * Parse a JSON-string column with a DDL schema (e.g. `"k INT, tag
   * STRING"`) and flatten every top-level field to its own column.
   * Map-only, codegen'd (`JsonToStructs`); the source column is kept.
   * Fields missing in a payload — or the whole payload failing to
   * parse — come out null. A schema field whose name collides with an
   * existing column is rejected up front: silently replacing, say, a
   * real `ts` column with a mostly-null JSON field would corrupt
   * downstream event-time logic with no error.
   */
  def parseJson(df: DataFrame, jsonCol: String, ddlSchema: String): DataFrame = {
    val schema = StructType.fromDDL(ddlSchema)
    val clash = schema.fields.map(_.name).toSet.intersect(df.columns.toSet)
    require(clash.isEmpty,
      s"parseJson field(s) ${clash.mkString(", ")} collide with existing columns")
    val parsed = df.withColumn("__j", from_json(col(jsonCol), schema))
    schema.fields.foldLeft(parsed) { (d, f) =>
      d.withColumn(f.name, col("__j").getField(f.name))
    }.drop("__j")
  }

  /**
   * Field-quality report for a JSON column under a declared schema —
   * the schema-drift monitor for attribute bags: per declared field,
   * how many payloads carry it (a producer silently dropping a field
   * shows up as a present-rate cliff), plus a `__corrupt` row counting
   * payloads that fail to parse at all. One row per field + the
   * corrupt row: (field, n_rows, n_present, present_rate).
   *
   * Scale: ONE aggregation pass — every per-field counter is a
   * conditional count in the same partial-agg, and the wide result
   * unpivots in-row on the single output row. No shuffle beyond the
   * 1-row aggregate; run it per ingestion batch as the canary.
   */
  def jsonFieldQuality(df: DataFrame, jsonCol: String,
                       ddlSchema: String): DataFrame = {
    val schema = StructType.fromDDL(ddlSchema)
    // PERMISSIVE from_json yields an all-null struct for corrupt input
    // (never a null struct), so corruption is only observable through
    // the corrupt-record column
    val parseSchema = schema.add("__cr", org.apache.spark.sql.types.StringType)
    val parsed = df.withColumn("__j", from_json(col(jsonCol), parseSchema,
      Map("columnNameOfCorruptRecord" -> "__cr")))
    val aggs =
      count(lit(1)).as("__n") +:
        count(when(col("__j").getField("__cr").isNotNull, 1))
          .as("__corrupt") +:
        schema.fields.map(f =>
          count(when(col("__j").getField(f.name).isNotNull, 1))
            .as(s"__p_${f.name}"))
    val wide = parsed.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val rows = struct(lit("__corrupt").as("field"),
      col("__corrupt").as("n_present")) +:
      schema.fields.map(f => struct(lit(f.name).as("field"),
        col(s"__p_${f.name}").as("n_present")))
    wide.select(col("__n"), explode(array(rows.toIndexedSeq: _*)).as("__r"))
      .select(col("__r.field").as("field"), col("__n").as("n_rows"),
        col("__r.n_present").as("n_present"),
        (col("__r.n_present").cast("double") / col("__n").cast("double"))
          .as("present_rate"))
  }

  /**
   * Corpus sink as JSON Lines — the lingua franca for LLM training
   * corpora. `shards` bounds the file count (one writer task each);
   * size it so shards land near 128-512 MB at the target scale.
   * Uncompressed by design: gzip JSONL is not splittable, so a
   * compressed shard caps downstream read parallelism at one task per
   * file — at 100 TB prefer more plain shards (or parquet) instead.
   */
  def writeJsonl(df: DataFrame, path: String, shards: Int = 4): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.repartition(shards).write.mode("overwrite").json(path)
  }

  /** JSONL source with a mandatory explicit schema (no inference pass;
    * see object doc). Plain-text JSONL splits by line, so read
    * parallelism is bytes/`maxPartitionBytes`, not file count. */
  def readJsonl(spark: SparkSession, path: String, ddlSchema: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddlSchema)).json(path)

  /**
   * CSV corpus sink (interchange with tabular tooling). Quoting is
   * explicit and round-trip-safe for embedded delimiters, quotes and
   * newlines (`escape` = `"` — the RFC 4180 doubled-quote convention
   * CSV readers outside Spark expect, NOT Spark's backslash default,
   * which silently breaks interchange). Same shard-count contract as
   * [[writeJsonl]]; uncompressed for splittability. Multiline payloads
   * make a file non-splittable on read — corpora with newline-bearing
   * text should prefer JSONL/parquet; this sink exists for the
   * tabular-export edge of the pipeline.
   */
  def writeCsv(df: DataFrame, path: String, shards: Int = 4): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.repartition(shards).write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(path)
  }

  /** CSV source with a mandatory explicit schema and the same RFC 4180
    * quoting as [[writeCsv]]. `multiLine` parses quoted embedded
    * newlines correctly (cost: per-file parallelism on those files). */
  def readCsv(spark: SparkSession, path: String, ddlSchema: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddlSchema))
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
}
