package graft.hub

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference unit tests for file-name/path parsing
  * (test_model_output.py:26-46, :48-89, :92-140, :143-156, :245-260).
  */
class PathParserSpec extends AnyFunSuite {

  test("parse_file matrix (test_model_output.py:26-46)") {
    val cases = Seq(
      ("2420-01-01-team-model", "2420-01-01", "team-model"),
      ("2420-01-01-----team-model", "2420-01-01", "team-model"),
      ("2420-01-01____teammodelallonestring", "2420-01-01", "teammodelallonestring"),
      ("2420-01-01____look-at-all-the-hyphens-", "2420-01-01", "look-at-all-the-hyphens-"),
      ("2420-01-01-team_one-model", "2420-01-01", "team_one-model"),
      ("2420-01-01 look ma no hyphens", "2420-01-01", "look ma no hyphens"),
      ("2420-01-01-janewaysaddiction-voyager1", "2420-01-01", "janewaysaddiction-voyager1"),
    )
    for ((name, round, model) <- cases) {
      val p = PathParser.parseFile(name)
      assert(p.roundId == round, name)
      assert(p.modelId == model, name)
    }
  }

  test("parse_file invalid names raise (test_model_output.py:143-156)") {
    for (bad <- Seq("2420-01-01", "round_id-team-model", "01-02-2440-team-model-name"))
      assertThrows[IllegalArgumentException](PathParser.parseFile(bad))
  }

  test("stem / suffix semantics (model_output.py:109-122)") {
    assert(PathParser.stem("a/b/2420-01-01-team-model.name.pqt") == "2420-01-01-team-model.name")
    assert(PathParser.suffix("a/b/2420-01-01-team-model.name.pqt") == ".pqt")
    assert(PathParser.stem("x/2420-01-01-a.snappy.parquet") == "2420-01-01-a.snappy")
    assert(PathParser.suffix("raw/prefix1/prefix2/") == "")
    assert(PathParser.suffix("raw/prefix1/prefix2/01-02-2440-team-model-name") == "")
    assert(PathParser.suffix("photo.jpg") == ".jpg")
  }

  test("sanitize strips stem whitespace, preserves inner spaces/unicode (test_model_output.py:48-89)") {
    assert(
      PathParser.sanitizePath("raw/raw/prefix 1/prefix2/2420-01-01-spáces at end .csv")
        == "raw/raw/prefix 1/prefix2/2420-01-01-spáces at end.csv")
    assert(
      PathParser.sanitizePath("raw/prefix 1/prefix 🐍/2420-01-01 look ma no hyphens.csv")
        == "raw/prefix 1/prefix 🐍/2420-01-01 look ma no hyphens.csv")
    // quote keeps : and /, encodes spaces
    assert(PathParser.quote("a b/c:d") == "a%20b/c:d")
    assert(PathParser.unquote("a%20b/c:d") == "a b/c:d")
  }

  test("from_s3 path derivation (test_model_output.py:92-140)") {
    val c1 = PathParser.fromS3("hubverse-test", "raw/prefix1/prefix2/2420-01-01-team-model.csv")
    assert(c1.outputPath == "s3://hubverse-test/prefix1/prefix2")
    val c2 = PathParser.fromS3("hubverse-test", "raw/model-output/prefix1/prefix2/2420-01-01-team-model.parquet")
    assert(c2.outputPath == "s3://hubverse-test/model-output/prefix1/prefix2")
    val c3 = PathParser.fromS3("hubverse-test", "raw/2420-01-01-team-model.csv")
    assert(c3.outputPath == "s3://hubverse-test/.")
    // only the FIRST origin-prefix segment is dropped
    val c4 = PathParser.fromS3("b", "raw/raw/prefix 1/prefix2/2420-01-01-x.csv")
    assert(c4.outputPath == "s3://b/raw/prefix 1/prefix2")
    val c5 = PathParser.fromS3(
      "hubverse-test",
      "different-raw-prefix/prefix1/prefix2/2420-01-01-team-model.snappy.parquet",
      originPrefix = "different-raw-prefix")
    assert(c5.outputPath == "s3://hubverse-test/prefix1/prefix2")
    assertThrows[IllegalArgumentException](
      PathParser.fromS3("hubverse-test", "prefix1/2420-01-01-team_name-model.csv"))
  }

  test("property: any YYYY-MM-DD + separators + model name round-trips") {
    val rnd = new scala.util.Random(42)
    val seps = Seq("-", "_", "--", "__", "-_", "", " ")
    for (_ <- 1 to 500) {
      val date = f"${1000 + rnd.nextInt(9000)}%04d-${rnd.nextInt(100)}%02d-${rnd.nextInt(100)}%02d"
      val sep = seps(rnd.nextInt(seps.length))
      val name = (1 to (1 + rnd.nextInt(12)))
        .map(_ => "abcXYZ0189"(rnd.nextInt(10))).mkString
      val parsed = PathParser.parseFile(s"$date$sep$name")
      assert(parsed.roundId == date, s"$date$sep$name")
      assert(parsed.modelId == name, s"$date$sep$name")
    }
  }
}
