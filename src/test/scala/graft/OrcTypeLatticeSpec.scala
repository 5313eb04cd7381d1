package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ORC write→read round trip over the full type lattice of the reference
  * (SURVEY §1.3; reference OrcSchema.java:45-57 maps 10 input types).
  *
  * The reference's writer has three semantic quirks we deliberately do NOT
  * replicate (SURVEY §1.3): bytes stringified (OrcSchema.java:47), shorts
  * narrowed to tinyint (OrcSchema.java:50), and per-row decimal
  * precision/scale mutation (RowOrcWriter.java:103-104). This spec pins
  * OUR contract instead: ByteType→ORC tinyint, ShortType→smallint,
  * DecimalType(18,4) fixed at schema level, timestamps at micro precision
  * — all values, including nulls in every column, survive the round trip
  * bit-exactly.
  *
  * Generation is ScalaCheck with a fixed seed — property-style coverage
  * (boundary values, nulls, random interior points), deterministic reruns.
  */
class OrcTypeLatticeSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("c_bool", BooleanType),
    StructField("c_byte", ByteType),
    StructField("c_short", ShortType),
    StructField("c_int", IntegerType),
    StructField("c_long", LongType),
    StructField("c_float", FloatType),
    StructField("c_double", DoubleType),
    StructField("c_string", StringType),
    StructField("c_decimal", DecimalType(18, 4)),
    StructField("c_ts", TimestampType)
  ))

  private def opt[T](g: Gen[T]): Gen[Any] =
    Gen.frequency(9 -> g.map(_.asInstanceOf[Any]), 1 -> Gen.const(null))

  private val rowGen: Gen[Seq[Any]] = for {
    b   <- opt(Gen.oneOf(true, false))
    by  <- opt(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    sh  <- opt(Gen.chooseNum(Short.MinValue, Short.MaxValue))
    i   <- opt(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    l   <- opt(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    f   <- opt(Gen.chooseNum(-1e6f, 1e6f))
    d   <- opt(Gen.chooseNum(-1e12, 1e12))
    s   <- opt(Gen.asciiPrintableStr.map(_.take(64)))
    dec <- opt(Gen.chooseNum(-99999999999999L, 99999999999999L)
             .map(u => new java.math.BigDecimal(java.math.BigInteger.valueOf(u), 4)))
    // micros precision, epoch ≥ 0: the ORC Java reader reassembles
    // negative-epoch sub-second timestamps with truncation-toward-zero,
    // shifting e.g. 1969-12-31T23:59:59.999999 to +00:00:00.999999 — a
    // storage-format limitation we document rather than mask (the
    // reference's writer has the related double-count quirk,
    // RowOrcWriter.java:95-96). Pre-1970 data should use parquet.
    ts  <- opt(Gen.chooseNum(0L, 4102444800000L).flatMap(ms =>
             Gen.chooseNum(0, 999).map { micro =>
               val t = new Timestamp(ms)
               t.setNanos((ms % 1000).toInt * 1000000 + micro * 1000)
               t
             }))
  } yield Seq(b, by, sh, i, l, f, d, s, dec, ts)

  private def norm(r: Row): Seq[Any] =
    r.toSeq.map {
      case bd: java.math.BigDecimal => bd.stripTrailingZeros
      case v                        => v
    }

  test("all 10 lattice types + nulls round-trip through partitioned ORC bit-exactly") {
    val n = 300
    val seed = Seed(42L)
    val rows: Seq[Row] = (0 until n).map { i =>
      // deterministic: re-seed per row index
      val vals = rowGen.apply(Gen.Parameters.default, seed.reseed(i.toLong)).get
      Row.fromSeq(i.toLong +: vals)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)

    val out = Files.createTempDirectory("graft_lattice").toString
    df.write.mode("overwrite").orc(out)
    val back = spark.read.schema(schema).orc(out)

    assert(back.schema === schema.copy(fields = schema.fields.map(_.copy(nullable = true))))
    val got = back.collect().map(norm).sortBy(_.head.asInstanceOf[Long].toString)
    val exp = rows.map(norm).sortBy(_.head.asInstanceOf[Long].toString)
    assert(got.length === exp.length)
    got.zip(exp).foreach { case (g, e) => assert(g === e, s"row mismatch: got=$g exp=$e") }
  }
}
