package graft.ingest

import graft.spec.PyRepr

/** Python-semantics value tree for YAML documents — what PyYAML's
  * SafeConstructor would hand the reference validator
  * (ref: hepdata_validator/__init__.py:34-46 YamlLoader;
  * data_file_validator.py:100-114 yaml.load). The row-model translation
  * (HepRow/SubDoc raw tokens, Python-type flags, dict reprs) needs exactly
  * Python's `str()`/`repr()` renderings and `isinstance` kinds, so the
  * carrier is an explicit ADT, not snakeyaml's Java objects (whose
  * Integer/Double/Date toString would leak Java formatting into messages).
  */
sealed trait PyVal {
  /** Python `str(v)`. */
  def pyStr: String
  /** Python `repr(v)`. */
  def pyRepr: String
}

case object PNone extends PyVal {
  val pyStr = "None"; val pyRepr = "None"
}

final case class PBool(b: Boolean) extends PyVal {
  def pyStr: String = if (b) "True" else "False"
  def pyRepr: String = pyStr
}

final case class PInt(v: BigInt) extends PyVal {
  def pyStr: String = v.toString
  def pyRepr: String = pyStr
}

final case class PFloat(v: Double) extends PyVal {
  def pyStr: String = PyRepr.double(v)
  def pyRepr: String = pyStr
}

final case class PStr(s: String) extends PyVal {
  def pyStr: String = s
  def pyRepr: String = PyRepr.str(s)
}

/** A !!timestamp-resolved scalar (datetime.date / datetime.datetime).
  * Renderings are precomputed at construction (PyYamlParse.timestamp). */
final case class PDate(pyStr: String, pyRepr: String) extends PyVal

/** A !!binary-resolved scalar (Python bytes). Repr only — the validator
  * never str()s bytes in any message path the reference exercises. */
final case class PBytes(bytes: Array[Byte]) extends PyVal {
  def pyStr: String = pyRepr
  def pyRepr: String = {
    val sb = new StringBuilder("b'")
    bytes.foreach { b =>
      val c = (b & 0xff).toChar
      if (c == '\\') sb.append("\\\\")
      else if (c == '\'') sb.append("\\'")
      else if (c == '\n') sb.append("\\n")
      else if (c == '\r') sb.append("\\r")
      else if (c == '\t') sb.append("\\t")
      else if (c >= 0x20 && c < 0x7f) sb.append(c)
      else sb.append(f"\\x${b & 0xff}%02x")
    }
    sb.append('\'').toString
  }
}

/** Marks a cycle through anchors/aliases (`a: &x [*x]`): Python prints the
  * back-reference as `[...]` / `{...}`. The validator never recurses into
  * one (its checks walk finite schema shapes). */
final case class PRecursive(inSeq: Boolean) extends PyVal {
  def pyStr: String = if (inSeq) "[...]" else "{...}"
  def pyRepr: String = pyStr
}

final case class PSeq(xs: Vector[PyVal]) extends PyVal {
  def pyStr: String = pyRepr
  def pyRepr: String = xs.map(_.pyRepr).mkString("[", ", ", "]")
}

/** Python dict: insertion-ordered; duplicate keys keep the FIRST position
  * and the LAST value (PyYAML construct_mapping assigns in pair order).
  * Keys are full PyVals (Python dicts hash any immutable); the validator
  * only ever looks up string keys. */
final case class PMap(entries: Vector[(PyVal, PyVal)]) extends PyVal {
  def pyStr: String = pyRepr
  def pyRepr: String =
    entries.map { case (k, v) => s"${k.pyRepr}: ${v.pyRepr}" }
      .mkString("{", ", ", "}")

  def get(key: String): Option[PyVal] =
    entries.collectFirst { case (PStr(`key`), v) => v }
  /** Python `d[key] = value`: replace in place when present, else append. */
  def updated(key: String, value: PyVal): PMap = {
    val i = entries.indexWhere { case (PStr(`key`), _) => true; case _ => false }
    if (i >= 0) PMap(entries.updated(i, (entries(i)._1, value)))
    else PMap(entries :+ ((PStr(key): PyVal) -> value))
  }
  def has(key: String): Boolean = get(key).isDefined
  /** String keys in insertion order (non-string keys rendered via str()
    * would never match the schemas' known-key sets anyway). */
  def stringKeys: Vector[String] = entries.collect { case (PStr(k), _) => k }
  /** All keys as Python strings, for extra-key sets. */
  def keyStrings: Vector[String] = entries.map(_._1.pyStr)
}

object PMap {
  /** Python dict key identity: hash/eq of the key VALUE. Numbers compare
    * across types (1 == 1.0 == True) so they canonicalize to one id
    * (exact BigInt conversion for any finite whole double). NaN keys also
    * collapse: through the reference's loader `{.nan: 1, .nan: 2}` loads
    * as `{nan: 2}` (corpus-pinned — raw-Python two-NaN-object dicts would
    * keep both, but that is not what the loader produces). */
  private def keyId(k: PyVal): String = k match {
    case PBool(b) => "num:" + (if (b) "1" else "0")
    case PInt(n) => "num:" + n.toString
    case PFloat(d) if d.isNaN => "num:nan"
    case PFloat(d) if d.isWhole && !d.isInfinite =>
      "num:" + BigDecimal(d).toBigInt.toString
    case other => other.pyRepr
  }

  /** Build with Python dict assignment semantics from raw pairs. */
  def fromPairs(pairs: Seq[(PyVal, PyVal)]): PMap = {
    val order = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(PyVal, PyVal)]
    pairs.foreach { case (k, v) =>
      val id = keyId(k)
      order.get(id) match {
        case Some(i) => out(i) = (out(i)._1, v)
        case None => order(id) = out.length; out += ((k, v))
      }
    }
    PMap(out.toVector)
  }
}
