package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped streaming event source — the deploy-day packaging the
  * reference ships as its production entry point (reference
  * OrcSinkTest.java:32 builds the pipeline as kafka-source → ORC sink;
  * README.md:19-22 describes the offset-rewind failure model).
  *
  * The offline sandbox carries no spark-sql-kafka jar, so the design
  * splits where the jar boundary is:
  *
  *  - [[kafka]] issues the real `readStream.format("kafka")` call with
  *    the standard option surface (bootstrap servers, topic(s), starting
  *    offsets, per-trigger rate cap). It compiles and plans here; at
  *    deploy time dropping `spark-sql-kafka-0-10` on the classpath is
  *    the ONLY change. Exactly-once end-to-end comes from the same
  *    source-agnostic protocol KafkaParitySourceSpec pins: offsets WAL'd
  *    to the checkpoint before execution + manifest-committed file sink.
  *
  *  - [[parseEventJson]] is the wire-to-table transform shared by every
  *    entry path: Kafka's fixed output schema (key/value binary, topic,
  *    partition, offset, timestamp) → the typed `events` table schema.
  *    All parsing is codegen'd built-ins (`from_json`, casts) — no UDFs
  *    on the hot path.
  *
  *  - [[fileQueue]] is the offline twin: a file-backed queue whose rows
  *    carry the SAME wire schema, so the parse transform (and everything
  *    downstream) is exercised by spec without a broker. Swapping
  *    fileQueue → kafka changes the offset representation only.
  *
  * Scale posture: one Kafka partition maps to one Spark input partition;
  * `maxOffsetsPerTrigger` bounds per-batch volume so micro-batches stay
  * memory-sized at any topic throughput. Malformed payloads surface as
  * NULL parsed structs (PERMISSIVE mode) and are routed by
  * [[splitCorrupt]] rather than killing the stream — at 100 TB/day a
  * poison message must never stop ingestion.
  */
object EventStreamSource {

  /** Typed payload schema of the `events` table (TESTDATA.md):
    * what `from_json` parses the Kafka value into. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Kafka's fixed source schema (the wire frame) — what [[fileQueue]]
    * reproduces and [[parseEventJson]] consumes. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)
  ))

  /** The production source: `format("kafka")` with the standard option
    * surface. Requires spark-sql-kafka on the deploy classpath — here it
    * plans but fails at source resolution (EventStreamSourceSpec pins
    * that the wiring reaches exactly that point and no further).
    *
    * @param startingOffsets "earliest" | "latest" | per-partition JSON —
    *   the reference's rewind model (README.md:19-22) is "earliest" +
    *   checkpointed offsets: first run reads from the start, restarts
    *   resume from the WAL, never from this option.
    * @param maxOffsetsPerTrigger per-batch row cap across all partitions;
    *   bounds micro-batch memory at any backlog size.
    */
  def kafka(
      spark: SparkSession,
      bootstrapServers: String,
      topics: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      extraOptions: Map[String, String] = Map.empty
  ): DataFrame = {
    val r = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      // A lost broker should surface as a stream error, not silent data
      // loss masked by the source skipping ahead.
      .option("failOnDataLoss", "true")
    val r2 = maxOffsetsPerTrigger.fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString))
    extraOptions.foldLeft(r2) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  /** Offline twin of [[kafka]]: a parquet file-queue whose rows already
    * carry [[wireSchema]]. One file ≈ one partition segment;
    * `maxFilesPerTrigger` makes batch boundaries observable, mirroring
    * `maxOffsetsPerTrigger`. */
  def fileQueue(
      spark: SparkSession,
      dir: String,
      maxFilesPerTrigger: Int = 1
  ): DataFrame =
    spark.readStream
      .schema(wireSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)

  /** Wire frame → typed events rows. PERMISSIVE `from_json`: a malformed
    * value yields an all-NULL-fields struct, never an exception — which
    * makes any single payload field useless as a corruption signal (a
    * well-formed `"event_id":null` is indistinguishable from poison).
    * Parse failure is detected properly via `columnNameOfCorruptRecord`:
    * the parser itself records the unparseable raw text, so `_corrupt` is
    * true exactly when the parser failed (malformed JSON, field type
    * mismatch) or the Kafka value was NULL — never for a legitimate null
    * field. Kafka metadata survives as `_topic`/`_partition`/`_offset`
    * /`_kafka_ts` for audit/replay lineage. */
  def parseEventJson(wire: DataFrame): DataFrame = {
    val parseSchema = eventSchema.add(StructField("_corrupt_record", StringType))
    val parsed = wire
      .select(
        col("value").cast("string").as("_raw"),
        col("topic").as("_topic"),
        col("partition").as("_partition"),
        col("offset").as("_offset"),
        col("timestamp").as("_kafka_ts")
      )
      .withColumn("_e", from_json(col("_raw"), parseSchema,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
    parsed.select(
      col("_e.event_id").as("event_id"),
      col("_e.ts").as("ts"),
      col("_e.user_id").as("user_id"),
      col("_e.event_type").as("event_type"),
      col("_e.value").as("value"),
      col("_e.props").as("props"),
      (col("_e").isNull || col("_e._corrupt_record").isNotNull).as("_corrupt"),
      col("_raw"), col("_topic"), col("_partition"), col("_offset"), col("_kafka_ts")
    )
  }

  /** Poison-message routing: only TRUE parse failures (`_corrupt`, i.e.
    * the parsed struct was NULL) go to the dead-letter leg, carrying the
    * raw bytes + offsets for replay. Well-formed events with a null
    * `event_id` stay on the clean leg — routing them to dead-letter
    * would silently drop valid data. Clean rows drop the audit columns
    * and are exactly the `events` table schema. */
  def splitCorrupt(parsed: DataFrame): (DataFrame, DataFrame) = {
    val bad = parsed.filter(col("_corrupt"))
      .select(col("_raw"), col("_topic"), col("_partition"), col("_offset"), col("_kafka_ts"))
    val good = parsed.filter(!col("_corrupt"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    (good, bad)
  }

  /** One-call production entry: kafka → parse → clean events stream
    * (dead-letter leg dropped; use [[parseEventJson]]+[[splitCorrupt]]
    * directly to keep it). */
  def kafkaEvents(
      spark: SparkSession,
      bootstrapServers: String,
      topics: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None
  ): DataFrame =
    splitCorrupt(parseEventJson(
      kafka(spark, bootstrapServers, topics, startingOffsets, maxOffsetsPerTrigger)))._1
}
