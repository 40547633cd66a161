package graft.hub

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFunSuite
import org.apache.spark.sql.types._

/** ScalaCheck properties for the pure parsers/formatters (SURVEY.md §5
  * port plan: property-based coverage beyond the reference's example
  * matrices).
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("property: quote/unquote round-trips any unicode string") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.listOf(Gen.oneOf(" ", "é", "🐍", "~", "%", "/"))) {
      (base: String, extras: List[String]) =>
        val s = base + extras.mkString
        PathParser.unquote(PathParser.quote(s)) == s
    })
  }

  test("property: ArrowFormat.doubleToString round-trips every finite double") {
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { bits: Long =>
      val v = java.lang.Double.longBitsToDouble(bits)
      v.isNaN || v.isInfinite ||
        java.lang.Double.parseDouble(ArrowFormat.doubleToString(v)) == v
    })
  }

  test("property: parse_file accepts date+sep+name and rejects no-date names") {
    val dateGen = for {
      y <- Gen.choose(0, 9999); m <- Gen.choose(0, 99); d <- Gen.choose(0, 99)
    } yield f"$y%04d-$m%02d-$d%02d"
    val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val sepGen = Gen.oneOf("-", "_", "", "--", "__", " ")
    check(Prop.forAll(dateGen, sepGen, nameGen) { (d: String, sep: String, n: String) =>
      val p = PathParser.parseFile(s"$d$sep$n")
      p.roundId == d && p.modelId == n
    })
    check(Prop.forAll(Gen.alphaStr.suchThat(_.nonEmpty)) { s: String =>
      scala.util.Try(PathParser.parseFile(s)).isFailure
    })
  }

  test("property: stem + suffix reassemble the basename") {
    val nameGen = Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const('.'), 1 -> Gen.const('-'))).map(_.mkString)
    check(Prop.forAll(nameGen) { name: String =>
      PathParser.stem(name) + PathParser.suffix(name) == name
    })
  }
}

/** Properties that need a SparkSession: sentinel normalization across
  * column types (reference op-3 semantics).
  */
class CsvSentinelPropertySpec extends SparkFunSuite {

  test("every sentinel nulls in string, long, double, and date columns") {
    val dir = tmpDir("sentinel-prop")
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("dt", DateType)))
    for (sentinel <- ModelOutputReader.CsvNullSentinels) {
      val quoted = "\"" + sentinel + "\""
      val csv = s"s,l,d,dt\n$quoted,$quoted,$quoted,$quoted\nkeep,7,1.5,2024-01-02\n"
      val p = s"$dir/f-${sentinel.hashCode}.csv"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), csv)
      val rows = ModelOutputReader.readCsv(spark, p, schema).collect()
      val r0 = rows.head
      assert((0 to 3).forall(r0.isNullAt), s"sentinel ${sentinel.map(_.toInt)} not nulled: $r0")
      val r1 = rows(1)
      assert(r1.getString(0) == "keep" && r1.getLong(1) == 7L && r1.getDouble(2) == 1.5)
    }
  }

  test("values are NOT trimmed — ' x' survives while ' ' nulls") {
    val dir = tmpDir("sentinel-trim")
    val p = s"$dir/f.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "s\n\" x\"\n\" \"\n")
    val rows = ModelOutputReader.readCsv(
      spark, p, StructType(Seq(StructField("s", StringType)))).collect()
    assert(rows(0).getString(0) == " x")
    assert(rows(1).isNullAt(0))
  }
}
