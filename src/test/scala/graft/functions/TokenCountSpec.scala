package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The native token counter must be BIT-IDENTICAL to
  * `size(split(lower(s), "\\s+"))` — Spark's split keeps leading and
  * trailing empty segments (limit −1), so the count is 1 + whitespace
  * runs. Any divergence would silently shift every corpus-assembly
  * statistic that rides it.
  */
class TokenCountSpec extends SparkFunSuite {

  test("pinned edge cases match the split formulation") {
    val s2 = spark
    import s2.implicits._
    val cases = Seq("", "a", "a b", " a b", "a b ", "  a\t\tb\nc  ",
      "\t", "  ", "a  b", "é café  中文")
    val bad = cases.toDF("s")
      .select(size(split(lower(col("s")), "\\s+")).as("a"),
        graft.GraftSession.token_count(col("s")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("property: random mixed-whitespace strings agree with split") {
    val s2 = spark
    import s2.implicits._
    val r = new scala.util.Random(11)
    val rand = (1 to 3000).map(_ => (0 to r.nextInt(40)).map(_ =>
      r.nextInt(7) match {
        case 0 => " "
        case 1 => "\t"
        case 2 => "\n"
        case 3 => "\r"
        case _ => ('a' + r.nextInt(4)).toChar.toString
      }).mkString)
    val bad = rand.toDF("s")
      .select(size(split(lower(col("s")), "\\s+")).as("a"),
        graft.GraftSession.token_count(col("s")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("SQL registration and interpreted eval agree with codegen") {
    graft.GraftSession.registerFunctions(spark)
    val viaSql = spark.sql("SELECT token_count('  a b\tc ')").collect()(0).getInt(0)
    assert(viaSql == 5) // ["", "a", "b", "c", ""]
    val e = TokenCount(org.apache.spark.sql.catalyst.expressions.Literal("a b  c"))
    assert(e.eval(null) == 3)
  }
}
