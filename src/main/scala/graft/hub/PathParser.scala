package graft.hub

/** Driver-side path / file-name semantics of the hubverse model-output
  * pipeline.
  *
  * Behavior contract (reference: hubverse-org/hubverse-transform,
  * `src/hubverse_transform/model_output.py`):
  *  - round_id  = leading `YYYY-MM-DD` of the file stem (model_output.py:245-248)
  *  - model_id  = remainder after `round_id[-_]*`, trimmed (model_output.py:250-254)
  *  - stem/suffix = POSIX basename minus the LAST extension only
  *    (model_output.py:109-122)
  *  - sanitize  = strip whitespace around the stem and the whole path, then
  *    percent-encode with `:` and `/` kept safe (model_output.py:223-234)
  *  - fromS3    = origin-prefix check + destination derivation
  *    (model_output.py:137-189)
  *
  * All functions are pure and run on the driver — they operate on file names,
  * never on column data, so they add zero cost to the distributed plan.
  */
object PathParser {

  /** Raised for skip-this-file conditions (reference `UserWarning`,
    * model_output.py:212-221); the event dispatcher logs and skips.
    */
  final class UserWarning(msg: String) extends RuntimeException(msg)

  final case class FileParts(roundId: String, modelId: String)

  val SupportedFileTypes: Set[String] = Set(".csv", ".parquet", ".pqt")

  private val RoundIdRe = "^\\d{4}-\\d{2}-\\d{2}".r

  /** POSIX basename of a path (trailing separators ignored). */
  def baseName(path: String): String = {
    val p = path.reverse.dropWhile(_ == '/').reverse
    p.substring(p.lastIndexOf('/') + 1)
  }

  /** File name minus the LAST extension only (`a.snappy.parquet` → `a.snappy`).
    * Mirrors Python `Path.stem`.
    */
  def stem(path: String): String = {
    val name = baseName(path)
    val i = name.lastIndexOf('.')
    if (i > 0 && i < name.length - 1) name.substring(0, i) else name
  }

  /** Last extension including the dot, or "" (mirrors Python `Path.suffix`). */
  def suffix(path: String): String = {
    val name = baseName(path)
    val i = name.lastIndexOf('.')
    if (i > 0 && i < name.length - 1) name.substring(i) else ""
  }

  /** Parse `round_id` / `model_id` from a file stem.
    *
    * @throws IllegalArgumentException when the stem has no leading
    *         `YYYY-MM-DD` or nothing follows it (reference `ValueError`).
    */
  def parseFile(fileName: String): FileParts = {
    val roundId = RoundIdRe
      .findPrefixOf(fileName)
      .getOrElse(throw new IllegalArgumentException(
        s"Unable to get YYYY-MM-DD round_id from file name $fileName."))
    // Python: re.split(rf"{round_id}[-_]*", name)[-1].strip()
    val parts = fileName.split(java.util.regex.Pattern.quote(roundId) + "[-_]*", -1)
    val last = if (parts.isEmpty) "" else parts.last
    if (parts.length <= 1 || last.isEmpty)
      throw new IllegalArgumentException(
        s"Unable to get model_id from file name $fileName.")
    FileParts(roundId, last.strip())
  }

  /** Percent-encode like Python `urllib.parse.quote(s, safe=":/")`:
    * unreserved `[A-Za-z0-9_.~-]` and the safe chars pass through, everything
    * else is UTF-8 %XX-encoded.
    */
  def quote(s: String, safe: String = ":/"): String = {
    val keep = safe.toSet
    val sb = new StringBuilder
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      val unreserved =
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '~' || c == '-'
      if (unreserved || keep(c)) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Inverse of [[quote]] (Python `urllib.parse.unquote`). */
  def unquote(s: String): String = {
    val bytes = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        bytes.write(c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i += 1
      }
    }
    new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Strip whitespace around the file stem and the whole path, then
    * percent-encode (reference `sanitize_uri`, model_output.py:223-234).
    */
  def sanitizeUri(path: String, safe: String = ":/"): String = {
    val st = stem(path)
    val cleaned =
      if (st.nonEmpty) path.replace(st, st.strip()) else path
    quote(cleaned.strip(), safe)
  }

  /** [[sanitizeUri]] followed by decode — the net effect the reference gets
    * after `fs.FileSystem.from_uri` (strip the stem/path, keep spaces etc.).
    */
  def sanitizePath(path: String): String = unquote(sanitizeUri(path))

  final case class S3Paths(hubPath: String, moPath: String, outputPath: String)

  /** Derive (hub, model-output, output) paths from an S3 event key.
    *
    * Only the FIRST path segment must equal `originPrefix` and only that
    * segment is dropped for the destination (`raw/raw/x` → `raw/x`); a file
    * directly under the prefix maps to destination `"."` — both quirks pinned
    * by reference tests (test_model_output.py:92-140).
    */
  def fromS3(bucketName: String, s3Key: String, originPrefix: String = "raw"): S3Paths = {
    val parts = s3Key.split("/").filter(_.nonEmpty)
    if (parts.isEmpty || parts.head != originPrefix)
      throw new IllegalArgumentException(
        s"Model output path $s3Key does not begin with $originPrefix.")
    val rel = parts.drop(1)
    val destination = if (rel.length <= 1) "." else rel.dropRight(1).mkString("/")
    S3Paths(s"s3://$bucketName", s3Key, s"s3://$bucketName/$destination")
  }
}
