package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.VecDot

/** Session wiring for the graft engine: custom function registration (SQL
  * + Column surfaces) and the recommended session configuration.
  */
object GraftSession {

  /** Register graft's custom expressions on an existing session so SQL text
    * can call them (`SELECT vec_dot(a, b) ...`). Idempotent.
    */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      (exprs: Seq[Expression]) => functions.VecDot(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_key",
      (exprs: Seq[Expression]) => functions.HilbertKey(
        exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_count",
      (exprs: Seq[Expression]) => functions.TokenCount(exprs(0)),
      "built-in")
    unaryWalkers.foreach { case (name, mk) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, (exprs: Seq[Expression]) => mk(exprs(0)), "built-in")
    }
  }

  /** The unary media byte walkers, registered under their SQL names so
    * SQL text can run the decode-free prep path
    * (`SELECT exif_datetime(content) ...`) — same expressions the Column
    * surfaces wrap.
    */
  private[graft] val unaryWalkers: Seq[(String, Expression => Expression)] = Seq(
    "image_dims" -> (functions.ImageDims(_)),
    "mp4_meta" -> (functions.Mp4Meta(_)),
    "wav_meta" -> (functions.WavMeta(_)),
    "wav_data_len" -> (functions.WavDataLen(_)),
    "jpeg_dqt" -> (functions.JpegDqt(_)),
    "exif_orient" -> (functions.ExifOrient(_)),
    "exif_datetime" -> (functions.ExifDateTime(_)),
    "exif_gps_lat" -> (functions.ExifGps(_, lon = false)),
    "exif_gps_lon" -> (functions.ExifGps(_, lon = true)),
    "exif_thumb" -> (functions.ExifThumb(_)),
    "repetition_profile" -> (functions.RepetitionProfile(_)),
    "html_text" -> (functions.HtmlText(_)),
    "html_links" -> (functions.HtmlLinks(_)),
  )

  /** Builder with the engine's recommended configuration; callers add
    * master/memory. `nanosAsLong` is set up front so parquet ns timestamps
    * read consistently across the whole session (see SCALE.md).
    */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")

  /** Column-API surface for the custom expressions. */
  def vec_dot(a: Column, b: Column): Column = VecDot(a, b)
  def token_count(s: Column): Column = functions.TokenCount(s)
}

/** `SparkSessionExtensions` hook — usable via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("hilbert_key"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.HilbertKey].getName, "hilbert_key"),
      (exprs: Seq[Expression]) => graft.functions.HilbertKey(
        exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Number].intValue())))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("token_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.TokenCount].getName, "token_count"),
      (exprs: Seq[Expression]) => graft.functions.TokenCount(exprs(0))))
    GraftSession.unaryWalkers.foreach { case (name, mk) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          mk(org.apache.spark.sql.catalyst.expressions.Literal(null)).getClass.getName,
          name),
        (exprs: Seq[Expression]) => mk(exprs(0))))
    }
    e.injectPlannerStrategy(_ => new graft.plans.TopKPerKeyStrategy)
    e.injectOptimizerRule(_ => graft.plans.NativeTopKRule)
  }
}
