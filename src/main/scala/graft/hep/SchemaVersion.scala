package graft.hep

/** Schema-version gates (ref: hepdata_validator versions frozen at
  * {0.1.0, 1.0.0, 1.0.1, 1.1.0, 1.1.1}; checks are gated by version —
  * data_file_validator.py:136-142, submission_file_validator.py:92,100,112,
  * full_submission_validator.py:201,319). The structural (schema) phase here
  * models the 1.1.1 schemas; the version switch gates the semantic check
  * families exactly as the reference does. */
final case class SchemaVersion(major: Int, minor: Int, patch: Int)
    extends Ordered[SchemaVersion] {
  def compare(o: SchemaVersion): Int =
    Ordering[(Int, Int, Int)].compare((major, minor, patch), (o.major, o.minor, o.patch))
}

object SchemaVersion {
  val V110: SchemaVersion = SchemaVersion(1, 1, 0)
  val Default: SchemaVersion = SchemaVersion(1, 1, 1)
  def parse(s: String): SchemaVersion = s.split("\\.") match {
    case Array(a, b, c) => SchemaVersion(a.toInt, b.toInt, c.toInt)
    case _ => throw new IllegalArgumentException(s"bad schema version: $s")
  }
}
