package graft.ingest

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.LoaderOptions
import org.yaml.snakeyaml.composer.Composer
import org.yaml.snakeyaml.error.{Mark, MarkedYAMLException}
import org.yaml.snakeyaml.nodes._
import org.yaml.snakeyaml.parser.ParserImpl
import org.yaml.snakeyaml.reader.StreamReader
import org.yaml.snakeyaml.resolver.Resolver

/** Raised for any document that the reference's loader would reject;
  * `rendered` is the Python exception text — `str(e)` of the
  * ScannerError/ParserError/ReaderError/ConstructorError/ValueError the
  * reference embeds in "There was a problem parsing the file" messages
  * (ref: data_file_validator.py:108-114, full_submission_validator.py:
  * 164-171). */
final class PyYamlError(val rendered: String) extends Exception(rendered)

/** YAML → [[PyVal]] with the reference loader's semantics
  * (ref: hepdata_validator/__init__.py:34-46 — CSafeLoader when libyaml is
  * present, SafeLoader otherwise; both share the Python-side Resolver and
  * SafeConstructor, so scalar typing is identical and only parse-error TEXT
  * differs between them).
  *
  * snakeyaml supplies events/composition only; tag resolution and
  * construction are re-implemented here from the YAML 1.1 rules PyYAML
  * follows (resolver.py regexes, SafeConstructor int/float/timestamp
  * algorithms), because snakeyaml's own resolver follows a different spec
  * revision (`1e2` and `1.0e2` are floats there, strings in PyYAML — the
  * exact quirks HepModel's raw tokens must preserve).
  *
  * Error text: rendered in libyaml's format (problem + "  in \"<name>\",
  * line L, column C", no source snippet) via a snakeyaml→libyaml problem
  * phrase table, differential-pinned by tools/gen_parse_error_corpus.py.
  */
object PyYamlParse {

  // ---- PyYAML resolver regexes (YAML 1.1 + PyYAML quirks) ----------------
  // The exponent REQUIRES a sign ([eE][-+][0-9]+) — '1.0e2' is a string —
  // and the leading-dot form takes no sign — '-.5' is a string.
  private val BoolRe =
    "^(?:yes|Yes|YES|no|No|NO|true|True|TRUE|false|False|FALSE|on|On|ON|off|Off|OFF)$".r
  private val FloatRe =
    ("^(?:[-+]?(?:[0-9][0-9_]*)\\.[0-9_]*(?:[eE][-+][0-9]+)?" +
      // leading-dot form needs a DIGIT first: '._00' is a string
      // (fuzz-caught, seed 71)
      "|\\.[0-9][0-9_]*(?:[eE][-+][0-9]+)?" +
      "|[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\\.[0-9_]*" +
      "|[-+]?\\.(?:inf|Inf|INF)" +
      "|\\.(?:nan|NaN|NAN))$").r
  private val IntRe =
    ("^(?:[-+]?0b[0-1_]+" +
      "|[-+]?0[0-7_]+" +
      "|[-+]?(?:0|[1-9][0-9_]*)" +
      "|[-+]?0x[0-9a-fA-F_]+" +
      "|[-+]?[1-9][0-9_]*(?::[0-5]?[0-9])+)$").r
  private val NullRe = "^(?:~|null|Null|NULL|)$".r
  private val TimestampRe =
    ("^(?:([0-9][0-9][0-9][0-9])-([0-9][0-9])-([0-9][0-9])" +
      "|([0-9][0-9][0-9][0-9])-([0-9][0-9]?)-([0-9][0-9]?)" +
      "(?:[Tt]|[ \\t]+)([0-9][0-9]?):([0-9][0-9]):([0-9][0-9])" +
      "(?:\\.([0-9]*))?" +
      "(?:[ \\t]*(?:(Z)|([-+])([0-9][0-9]?)(?::([0-9][0-9]))?))?)$").r

  // ---- scalar construction (PyYAML SafeConstructor) ----------------------

  /** Plain-scalar resolution + construction. */
  def resolveScalar(raw: String): PyVal = raw match {
    case NullRe() => PNone
    case BoolRe() => PBool(raw.head match {
      case 'y' | 'Y' | 't' | 'T' => true
      case 'o' | 'O' => raw.length == 2 // on/On/ON vs off/Off/OFF
      case _ => false
    })
    case FloatRe() => constructFloat(raw)
    case IntRe() => constructInt(raw)
    case "=" =>
      throw new PyYamlError(
        "could not determine a constructor for the tag 'tag:yaml.org,2002:value'")
    case "<<" =>
      throw new PyYamlError(
        "could not determine a constructor for the tag 'tag:yaml.org,2002:merge'")
    case TimestampRe(y0, m0, d0, y1, m1, d1, hh, mi, ss, frac, z, sgn, th, tm) =>
      constructTimestamp(y0, m0, d0, y1, m1, d1, hh, mi, ss, frac, z, sgn, th, tm)
    case _ => PStr(raw)
  }

  /** construct_yaml_int: strip '_', sign, then binary/hex/octal/sexagesimal/
    * decimal. `0x_` resolves but int('',16) raises — replicated. */
  def constructInt(raw: String): PyVal = {
    var s = raw.replace("_", "")
    var sign = BigInt(1)
    if (s.nonEmpty && (s.head == '-' || s.head == '+')) {
      if (s.head == '-') sign = -1
      s = s.tail
    }
    def parse(digits: String, base: Int): BigInt =
      if (digits.isEmpty || digits.exists(c => Character.digit(c, base) < 0))
        throw new PyYamlError(
          s"invalid literal for int() with base $base: '$digits'")
      else BigInt(digits, base)
    val mag: BigInt =
      if (s == "0") BigInt(0)
      else if (s.startsWith("0b")) parse(s.drop(2), 2)
      else if (s.startsWith("0x")) parse(s.drop(2), 16)
      else if (s.startsWith("0")) parse(s, 8)
      else if (s.contains(':'))
        s.split(':').foldLeft(BigInt(0))((acc, p) => acc * 60 + parse(p, 10))
      else parse(s, 10)
    PInt(sign * mag)
  }

  /** construct_yaml_float: strip '_', lowercase, sign, inf/nan/sexagesimal. */
  def constructFloat(raw: String): PyVal = {
    var s = raw.replace("_", "").toLowerCase
    var sign = 1.0
    if (s.nonEmpty && (s.head == '-' || s.head == '+')) {
      if (s.head == '-') sign = -1.0
      s = s.tail
    }
    val v =
      if (s == ".inf") Double.PositiveInfinity
      else if (s == ".nan") return PFloat(Double.NaN)
      else if (s.contains(':')) {
        val parts = s.split(':')
        parts.foldLeft(0.0)((acc, p) => acc * 60 + p.toDouble)
      } else s.toDouble
    PFloat(sign * v)
  }

  /** construct_yaml_timestamp → PDate carrying Python str()/repr(). */
  private def constructTimestamp(
      y0: String, m0: String, d0: String,
      y1: String, m1: String, d1: String,
      hh: String, mi: String, ss: String, frac: String,
      z: String, sgn: String, th: String, tm: String): PDate = {
    // datetime.date/datetime range validation (ValueError text order is
    // CPython's: year, month, day, hour, minute, second)
    def check(y: Int, mo: Int, d: Int, h: Int = 0, mi2: Int = 0, s2: Int = 0): Unit = {
      if (y < 1 || y > 9999)
        throw new PyYamlError(s"year $y is out of range")
      if (mo < 1 || mo > 12)
        throw new PyYamlError("month must be in 1..12")
      val dim = mo match {
        case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
        case 4 | 6 | 9 | 11 => 30
        case _ => if ((y % 4 == 0 && y % 100 != 0) || y % 400 == 0) 29 else 28
      }
      if (d < 1 || d > dim)
        throw new PyYamlError("day is out of range for month")
      if (h > 23) throw new PyYamlError("hour must be in 0..23")
      if (mi2 > 59) throw new PyYamlError("minute must be in 0..59")
      if (s2 > 59) throw new PyYamlError("second must be in 0..59")
    }
    if (y0 != null) {
      check(y0.toInt, m0.toInt, d0.toInt)
      val str = f"${y0.toInt}%04d-${m0.toInt}%02d-${d0.toInt}%02d"
      PDate(str, s"datetime.date(${y0.toInt}, ${m0.toInt}, ${d0.toInt})")
    } else {
      val (y, mo, d) = (y1.toInt, m1.toInt, d1.toInt)
      val (h, m, s) = (hh.toInt, mi.toInt, ss.toInt)
      check(y, mo, d, h, m, s)
      val micro =
        if (frac == null || frac.isEmpty) 0
        else (frac.take(6) + "0" * (6 - math.min(frac.length, 6))).toInt
      val tzMinutes: Option[Int] =
        if (z != null) Some(0)
        else if (sgn != null) {
          val mins = th.toInt * 60 + (if (tm != null) tm.toInt else 0)
          // datetime.timezone rejects |offset| >= 24h (ValueError text
          // includes the timedelta repr)
          val signed = if (sgn == "-") -mins else mins
          if (mins >= 24 * 60) {
            val total = signed * 60
            val days = Math.floorDiv(total, 86400)
            val secs = Math.floorMod(total, 86400)
            val parts = Seq(
              if (days != 0) Some(s"days=$days") else None,
              if (secs != 0) Some(s"seconds=$secs") else None).flatten
            throw new PyYamlError(
              "offset must be a timedelta strictly between -timedelta(hours=24)" +
                s" and timedelta(hours=24), not datetime.timedelta(${parts.mkString(", ")}).")
          }
          Some(signed)
        } else None
      val base = f"$y%04d-$mo%02d-$d%02d $h%02d:$m%02d:$s%02d" +
        (if (micro != 0) f".$micro%06d" else "")
      val str = base + tzMinutes.fold("") { mm =>
        val a = math.abs(mm)
        f"${if (mm < 0) "-" else "+"}${a / 60}%02d:${a % 60}%02d"
      }
      val tzRepr = tzMinutes.fold("") {
        case 0 => ", tzinfo=datetime.timezone.utc"
        case mm if mm > 0 =>
          s", tzinfo=datetime.timezone(datetime.timedelta(seconds=${mm * 60}))"
        case mm =>
          s", tzinfo=datetime.timezone(datetime.timedelta(days=-1, seconds=${86400 + mm * 60}))"
      }
      val microRepr = if (micro != 0) s", $micro" else ""
      PDate(str,
        s"datetime.datetime($y, $mo, $d, $h, $m${if (s != 0 || micro != 0) s", $s" else ""}$microRepr$tzRepr)")
    }
  }

  // ---- printable-character gate (reader-level, before the scanner) -------
  // libyaml reader: "control characters are not allowed"; allowed set is
  // PyYAML reader.py's NON_PRINTABLE complement.
  private def isPrintable(cp: Int): Boolean =
    cp == '\t' || cp == '\n' || cp == '\r' ||
      (cp >= 0x20 && cp <= 0x7e) || cp == 0x85 ||
      (cp >= 0xa0 && cp <= 0xd7ff) || (cp >= 0xe000 && cp <= 0xfffd) ||
      (cp >= 0x10000 && cp <= 0x10ffff)

  private def checkPrintable(text: String, name: String): Unit = {
    var i = 0; var cpIndex = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (!isPrintable(cp))
        throw new PyYamlError(
          f"unacceptable character #x$cp%04x: control characters are not allowed\n" +
            s"""  in "$name", position $cpIndex""")
      i += Character.charCount(cp); cpIndex += 1
    }
  }

  /** Python open(p,'r').read(): strict UTF-8 decode with CPython's exact
    * UnicodeDecodeError text (probed: start-byte errors report the single
    * byte; a bad/missing first continuation reports the START byte; k≥2
    * failures report the byte RANGE) + universal-newline translation. */
  def decode(bytes: Array[Byte], name: String): String = {
    val n = bytes.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    def fail(pos: Int, len: Int, reason: String): Nothing = {
      val what =
        if (len == 1) f"byte 0x${bytes(pos) & 0xff}%x in position $pos"
        else s"bytes in position $pos-${pos + len - 1}"
      throw new PyYamlError(s"'utf-8' codec can't decode $what: $reason")
    }
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { sb.append(b.toChar); i += 1 }
      else {
        val need =
          if (b >= 0xc2 && b <= 0xdf) 1
          else if (b >= 0xe0 && b <= 0xef) 2
          else if (b >= 0xf0 && b <= 0xf4) 3
          else fail(i, 1, "invalid start byte")
        var cp = b & (0x7f >> (need + 1))
        var k = 1
        while (k <= need) {
          // consumed = k bytes so far (start + k-1 continuations)
          if (i + k >= n)
            fail(i, k, "unexpected end of data")
          val c = bytes(i + k) & 0xff
          val badCont = (c & 0xc0) != 0x80 ||
            (b == 0xe0 && k == 1 && c < 0xa0) ||
            (b == 0xed && k == 1 && c > 0x9f) ||
            (b == 0xf0 && k == 1 && c < 0x90) ||
            (b == 0xf4 && k == 1 && c > 0x8f)
          if (badCont) fail(i, k, "invalid continuation byte")
          cp = (cp << 6) | (c & 0x3f)
          k += 1
        }
        sb.appendCodePoint(cp)
        i += need + 1
      }
    }
    // universal newlines: \r\n and \r -> \n
    sb.toString.replace("\r\n", "\n").replace('\r', '\n')
  }

  // ---- error rendering ---------------------------------------------------
  // snakeyaml problem/context phrases → libyaml's, for shapes both engines
  // detect (differential-pinned by tools/gen_parse_error_corpus.py).
  // Phrases with no entry pass through — a readable parse error either
  // way, never a silent mis-parse.
  private val ExpectedTokenRe = "expected (.*), but got .*".r

  private def mapPhrase(s: String, context: String): String = {
    if (s == null) return null
    s match {
      case "mapping values are not allowed here" =>
        "mapping values are not allowed in this context"
      case "sequence entries are not allowed here" =>
        "block sequence entries are not allowed in this context"
      case "found incompatible YAML document (version 1.* is required)" =>
        "found incompatible YAML document"
      case "found duplicate YAML directive" => "found duplicate %YAML directive"
      case "expected the node content, but found ','" =>
        "did not find expected node content"
      case _ if s.startsWith("found character") &&
          s.contains("that cannot start any token") &&
          s.contains("\t(TAB)") =>
        "found a tab character that violates indentation"
      case _ if s.startsWith("found character") &&
          s.contains("that cannot start any token") =>
        "found character that cannot start any token"
      case _ if s.startsWith("found undefined alias") => "found undefined alias"
      case _ if s.startsWith("unexpected character found") &&
          (context == "while scanning an anchor" ||
            context == "while scanning an alias") =>
        "did not find expected alphabetic or numeric character"
      case _ if context == "while parsing a block collection" &&
          s.startsWith("expected <block end>") =>
        "did not find expected '-' indicator"
      case _ if context == "while parsing a block mapping" &&
          s.startsWith("expected <block end>") =>
        "did not find expected key"
      case _ if s.startsWith("expected '<document start>'") =>
        "did not find expected <document start>"
      case "while scanning a double-quoted scalar" =>
        "while parsing a quoted scalar"
      case _ if s.startsWith("found unknown escape character") =>
        "found unknown escape character"
      case ExpectedTokenRe(what)
          if what.startsWith("',' or ") => s"did not find expected $what"
      case other => other
    }
  }

  private def renderMark(m: Mark, name: String): String =
    s"""  in "$name", line ${m.getLine + 1}, column ${m.getColumn + 1}"""

  private def sameMark(a: Mark, b: Mark): Boolean =
    a != null && b != null && a.getLine == b.getLine && a.getColumn == b.getColumn

  /** PyYAML MarkedYAMLError.__str__: context, context mark (suppressed
    * when identical to the problem mark), problem, problem mark. */
  private def render(e: MarkedYAMLException, name: String): String = {
    val sb = new StringBuilder
    if (e.getContext != null) {
      sb.append(mapPhrase(e.getContext, null))
      if (e.getContextMark != null &&
          (e.getProblem == null || e.getProblemMark == null ||
            !sameMark(e.getContextMark, e.getProblemMark)))
        sb.append('\n').append(renderMark(e.getContextMark, name))
      if (e.getProblem != null) sb.append('\n')
    }
    if (e.getProblem != null) {
      sb.append(mapPhrase(e.getProblem, e.getContext))
      if (e.getProblemMark != null) {
        // libyaml marks the offending ESCAPE char; snakeyaml the char after
        val shift =
          if (e.getProblem.startsWith("found unknown escape character")) -1
          else 0
        val m = e.getProblemMark
        sb.append('\n').append(
          s"""  in "$name", line ${m.getLine + 1}, column ${m.getColumn + 1 + shift}""")
      }
    }
    sb.toString
  }

  /** libyaml rejects unknown %-directives that snakeyaml skips. Both
    * scanners treat ANY column-0 '%' as a directive token (PyYAML
    * scanner: `self.column == 0 and ch == '%'`), so scan every line;
    * the caller arbitrates against snakeyaml's own error by POSITION
    * (the reference's scanner is sequential — whichever comes first in
    * the stream wins). Theoretical false positive: a column-0 '%'
    * continuation line of a root-level multi-line FLOW scalar — not
    * constructible in the mapping-rooted documents this validator sees.
    * Returns (0-based line, rendered error). */
  private def findBadDirective(text: String, name: String): Option[(Int, String)] = {
    text.split("\n", -1).zipWithIndex.collectFirst {
      case (l, line) if l.startsWith("%") && {
        val n0 = l.drop(1).takeWhile(c => c != ' ' && c != '\t')
        n0 != "YAML" && n0 != "TAG"
      } =>
        val name0 = l.drop(1).takeWhile(c => c != ' ' && c != '\t')
        (line,
          "while scanning a directive\n" +
            s"""  in "$name", line ${line + 1}, column 1""" + "\n" +
            "found unknown directive name\n" +
            s"""  in "$name", line ${line + 1}, column ${name0.length + 2}""")
    }
  }

  // ---- composition -------------------------------------------------------

  private val PlainTag = new Tag("tag:graft,2026:plain")

  /** Tags non-specific scalars: a PLAIN untagged scalar (implicit=true)
    * gets the sentinel so [[resolveScalar]] types it; quoted scalars and
    * the `!` non-specific tag (implicit=false) are strings in PyYAML.
    * Explicit `!!` tags never reach the resolver. */
  private final class SentinelResolver extends Resolver {
    override def resolve(kind: NodeId, value: String, implicitFlag: Boolean): Tag =
      if (kind == NodeId.scalar) { if (implicitFlag) PlainTag else Tag.STR }
      else super.resolve(kind, value, implicitFlag)
  }

  private def loaderOptions(): LoaderOptions = {
    val o = new LoaderOptions
    o.setAllowDuplicateKeys(true) // Python dict semantics: last value wins
    o.setMaxAliasesForCollections(1000000)
    o.setAllowRecursiveKeys(true)
    o.setNestingDepthLimit(1000) // ≈ Python's default recursion limit
    o.setCodePointLimit(64 * 1024 * 1024) // the 10 MiB cap gates earlier
    // tag acceptance is decided by the CONSTRUCTOR (walk/scalar raise
    // PyYAML's ConstructorError), not at compose time
    o.setTagInspector(new org.yaml.snakeyaml.inspector.TagInspector {
      override def isGlobalTagAllowed(tag: Tag): Boolean = true
    })
    o
  }

  /** The `!` non-specific tag means str in PyYAML; snakeyaml's composer
    * erases it before resolution, so intercept the scalar event. */
  private final class PyComposer(
      p: ParserImpl, r: Resolver, o: LoaderOptions) extends Composer(p, r, o) {
    override protected def composeScalarNode(
        anchor: String,
        comments: java.util.List[org.yaml.snakeyaml.comments.CommentLine]): Node = {
      val bang = parser.peekEvent() match {
        case ev: org.yaml.snakeyaml.events.ScalarEvent => ev.getTag == "!"
        case _ => false
      }
      val node = super.composeScalarNode(anchor, comments)
      if (bang) node.setTag(Tag.STR)
      node
    }
  }

  private def composer(text: String): Composer = {
    val opts = loaderOptions()
    new PyComposer(new ParserImpl(new StreamReader(text), opts),
      new SentinelResolver, opts)
  }

  /** yaml.load(text, YamlLoader): single document (None when empty). */
  def load(text: String, name: String): PyVal = {
    checkPrintable(text, name)
    val badDir = findBadDirective(text, name)
    def dirError(): Nothing = throw new PyYamlError(badDir.get._2)
    try {
      val c = composer(text)
      val node = c.getSingleNode
      if (badDir.isDefined) dirError() // snakeyaml skipped it; libyaml errors
      if (node == null) PNone else construct(node, name)
    } catch {
      case e: PyYamlError => throw e
      case e: MarkedYAMLException =>
        // sequential-scanner arbitration: the earlier stream position wins
        if (badDir.exists(d => e.getProblemMark == null ||
            d._1 <= e.getProblemMark.getLine)) dirError()
        throw new PyYamlError(render(e, name))
      case e: org.yaml.snakeyaml.error.YAMLException =>
        if (badDir.isDefined) dirError()
        throw new PyYamlError(e.getMessage)
    }
  }

  /** yaml.load_all(text, YamlLoader): the reference materializes the
    * stream with list() before use, so eager is faithful. */
  def loadAll(text: String, name: String): Vector[PyVal] = {
    checkPrintable(text, name)
    val badDir = findBadDirective(text, name)
    def dirError(): Nothing = throw new PyYamlError(badDir.get._2)
    try {
      val c = composer(text)
      val out = Vector.newBuilder[PyVal]
      while (c.checkNode()) out += construct(c.getNode, name)
      if (badDir.isDefined) dirError()
      out.result()
    } catch {
      case e: PyYamlError => throw e
      case e: MarkedYAMLException =>
        if (badDir.exists(d => e.getProblemMark == null ||
            d._1 <= e.getProblemMark.getLine)) dirError()
        throw new PyYamlError(render(e, name))
      case e: org.yaml.snakeyaml.error.YAMLException =>
        if (badDir.isDefined) dirError()
        throw new PyYamlError(e.getMessage)
    }
  }

  // ---- node walk (anchors may form cycles: track the path) ---------------

  private def construct(root: Node, name: String): PyVal = {
    val inProgress = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Node, java.lang.Boolean]())

    // SafeConstructor: a collection with a non-core tag (e.g.
    // !!python/object:, application tags) has no constructor. (!!set /
    // !!omap / !!pairs construction is not modeled — unreachable for the
    // validator's schemas, and failing closed matches nothing silently.)
    def checkCollectionTag(node: Node, expect: Tag): Unit = {
      val t = node.getTag
      if (t != expect)
        throw new PyYamlError(
          s"could not determine a constructor for the tag '${t.getValue}'\n" +
            renderMark(node.getStartMark, name))
    }

    def walk(node: Node): PyVal = node match {
      case s: ScalarNode => scalar(s, name)
      case seq: SequenceNode =>
        checkCollectionTag(seq, Tag.SEQ)
        if (!inProgress.add(seq)) PRecursive(inSeq = true)
        else try PSeq(seq.getValue.asScala.map(walk).toVector)
        finally inProgress.remove(seq)
      case m: MappingNode =>
        checkCollectionTag(m, Tag.MAP)
        if (!inProgress.add(m)) PRecursive(inSeq = false)
        else try {
          val flat = flattenMerge(m)
          PMap.fromPairs(flat.map { t =>
            val k = walk(t.getKeyNode)
            k match {
              case _: PSeq | _: PMap | _: PRecursive =>
                // Python dict keys must be hashable (ConstructorError;
                // the context mark is suppressed when it equals the key's)
                val ctxMark =
                  if (sameMark(m.getStartMark, t.getKeyNode.getStartMark)) ""
                  else "\n" + renderMark(m.getStartMark, name)
                throw new PyYamlError(
                  "while constructing a mapping" + ctxMark +
                    "\nfound unhashable key\n" +
                    renderMark(t.getKeyNode.getStartMark, name))
              case _ => ()
            }
            (k, walk(t.getValueNode))
          })
        } finally inProgress.remove(m)
      case other =>
        throw new PyYamlError(
          s"could not determine a constructor for the tag '${other.getTag.getValue}'")
    }

    // PyYAML flatten_mapping: merge-key pairs first (later list entries
    // lower precedence), then the node's own non-merge pairs.
    def isMergeKey(t: NodeTuple): Boolean = t.getKeyNode match {
      case s: ScalarNode => s.isPlain && s.getValue == "<<" &&
        (s.getTag == PlainTag || s.getTag == Tag.MERGE)
      case _ => false
    }
    def flattenMerge(parent: MappingNode): List[NodeTuple] = {
      // ConstructorError marks: the PARENT mapping's start as context,
      // the offending value node as problem (probed live)
      def mergeErr(what: String, bad: Node): Nothing =
        throw new PyYamlError(
          "while constructing a mapping\n" +
            renderMark(parent.getStartMark, name) + "\n" +
            s"expected a $what for merging, but found " +
            bad.getNodeId.toString + "\n" +
            renderMark(bad.getStartMark, name))
      val (merges, rest) = parent.getValue.asScala.toList.partition(isMergeKey)
      if (merges.isEmpty) rest
      else {
        val merged = merges.flatMap { t =>
          t.getValueNode match {
            case m: MappingNode => flattenMerge(m)
            case s: SequenceNode =>
              s.getValue.asScala.toList.reverse.flatMap {
                case m: MappingNode => flattenMerge(m)
                case bad => mergeErr("mapping", bad)
              }
            case bad => mergeErr("mapping or list of mappings", bad)
          }
        }
        merged ++ rest
      }
    }

    walk(root)
  }

  private def scalar(s: ScalarNode, name: String): PyVal = {
    val tag = s.getTag
    if (tag == PlainTag) {
      if (!s.isPlain) PStr(s.getValue)
      else if (s.getValue == "=" || s.getValue == "<<") {
        // SafeConstructor has no value/merge constructor; Python's
        // ConstructorError carries the node mark
        val t = if (s.getValue == "=") "value" else "merge"
        throw new PyYamlError(
          s"could not determine a constructor for the tag 'tag:yaml.org,2002:$t'\n" +
            renderMark(s.getStartMark, name))
      } else resolveScalar(s.getValue)
    } else tag.getValue match {
      case "tag:yaml.org,2002:str" => PStr(s.getValue)
      case "tag:yaml.org,2002:int" => constructInt(s.getValue.trim)
      case "tag:yaml.org,2002:float" => constructFloat(s.getValue.trim)
      case "tag:yaml.org,2002:bool" =>
        s.getValue.toLowerCase match {
          case "yes" | "true" | "on" => PBool(true)
          case "no" | "false" | "off" => PBool(false)
          case other => throw new PyYamlError(
            s"could not determine a constructor for the tag 'tag:yaml.org,2002:bool'")
        }
      case "tag:yaml.org,2002:null" => PNone
      case "tag:yaml.org,2002:binary" =>
        try PBytes(java.util.Base64.getMimeDecoder.decode(s.getValue))
        catch {
          case e: IllegalArgumentException => throw new PyYamlError(
            "failed to decode base64 data: " + e.getMessage)
        }
      case "tag:yaml.org,2002:timestamp" =>
        resolveScalar(s.getValue.trim) match {
          case d: PDate => d
          case _ => throw new PyYamlError(
            "could not determine a constructor for the tag 'tag:yaml.org,2002:timestamp'")
        }
      case other =>
        // SafeConstructor: unknown / unconstructable tag (incl. explicit
        // merge/value and all application tags)
        throw new PyYamlError(
          s"could not determine a constructor for the tag '$other'\n" +
            renderMark(s.getStartMark, name))
    }
  }
}
