package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.hep._
import graft.hep.HepModel._

/** Differential test of the phase-1 kernel: an INDEPENDENT Scala mirror of
  * the reference's `check_error_values` loop (data_file_validator.py:
  * 224-284, including the stale `error_plus`/`error_minus` locals and the
  * KeyError/NameError/TypeError aborts) is evaluated over seeded-random
  * error sequences and compared message-for-message against what
  * [[HepDataRules.violations]] emits for phase 1 (plus the abort's effect:
  * phases 2-3 suppressed). The mirror is written directly from the Python,
  * not from the kernel — a regression in either shows up as a diff. */
class ErrorValuesDifferentialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- the mirror -------------------------------------------------------
  // convert_to_float: strip '%', float(); '' allowed; bad strings emit the
  // message and stay strings; bools convert; list/None raise (abort).
  sealed trait Py
  case object PyUnbound extends Py
  case object PyEmpty extends Py
  final case class PyStr(s: String) extends Py
  final case class PyNum(d: Double) extends Py

  private val FloatRe =
    "^[+-]?((\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?|[iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])$".r

  def mirror(vals: Seq[HepDepVal]): (Seq[String], Boolean) = {
    val out = Seq.newBuilder[String]
    var plus: Py = PyUnbound
    var minus: Py = PyUnbound
    def convert(raw: String, repr: String, path: String): Option[Py] = {
      if (repr == "True") return Some(PyNum(1.0))
      if (repr == "False") return Some(PyNum(0.0))
      if (repr != null || raw == null) return None // float(list/dict/None)
      val stripped = raw.replace("%", "")
      val t = stripped.trim
      if (t.nonEmpty && FloatRe.matches(t)) {
        val d = t.toLowerCase match {
          case "inf" | "+inf" | "infinity" | "+infinity" => Double.PositiveInfinity
          case "-inf" | "-infinity" => Double.NegativeInfinity
          case "nan" | "+nan" | "-nan" => Double.NaN
          case _ => t.toDouble
        }
        Some(PyNum(d))
      } else if (stripped.isEmpty) Some(PyEmpty)
      else {
        out += s"Invalid error value $stripped: value must be a number (possibly ending in %) in '$path'"
        Some(PyStr(stripped))
      }
    }
    for ((value, i) <- vals.zipWithIndex) {
      if (value.hasErrors) {
        var zeros = List.empty[Boolean]
        for ((e, j) <- value.errors.zipWithIndex) {
          var hasAsymFlag = false
          if (e.hasSym) {
            convert(e.symRaw, e.symRepr,
                s"dependent_variables.values[$i].errors[$j].symerror") match {
              case Some(p) => plus = p; minus = p
              case None => return (out.result(), true)
            }
          } else if (e.hasAsym) {
            hasAsymFlag = true
            if (e.asymRepr != null || !e.hasPlus) return (out.result(), true)
            convert(e.plusRaw, e.plusRepr,
                s"dependent_variables.values[$i].errors[$j].asymerror.plus") match {
              case Some(p) => plus = p
              case None => return (out.result(), true)
            }
            if (!e.hasMinus) return (out.result(), true)
            convert(e.minusRaw, e.minusRepr,
                s"dependent_variables.values[$i].errors[$j].asymerror.minus") match {
              case Some(p) => minus = p
              case None => return (out.result(), true)
            }
          } else {
            if (plus == PyUnbound) return (out.result(), true) // NameError
          }
          if (plus == PyEmpty && minus == PyEmpty) {
            if (hasAsymFlag)
              out += s"asymerror plus and minus cannot both be empty in 'dependent_variables.values[$i].errors[$j].asymerror'"
            else
              out += s"symerror cannot be empty in 'dependent_variables.values[$i].errors[$j].symerror'"
          }
          val z = (plus, minus) match {
            case (PyNum(a), PyNum(b)) => a == 0.0 && b == 0.0
            case _ => false
          }
          zeros = z :: zeros
        }
        if (zeros.nonEmpty && zeros.forall(identity))
          out += s"Uncertainties should not all be zero in 'dependent_variables.values[$i].errors'"
      }
    }
    (out.result(), false)
  }

  // ---- random generator -------------------------------------------------
  def randErr(rnd: scala.util.Random): HepErr = rnd.nextInt(12) match {
    case 0 => sym(rnd.nextInt(3).toString) // parseable, sometimes "0"
    case 1 => sym("") // empty
    case 2 => sym(s"x${rnd.nextInt(9)}") // invalid string
    case 3 => sym(s"${rnd.nextInt(2)}.${rnd.nextInt(9)}%")
    case 4 => asym(rnd.nextInt(2) + ".1", "-0." + rnd.nextInt(9))
    case 5 => asym("", "") // both empty
    case 6 => asym("0", "0.0") // zero pair
    case 7 => noneErr("{'label': 'x'}", "x") // stale / NameError trigger
    case 8 => HepErr(hasSym = true, symRaw = if (rnd.nextBoolean()) "True" else "False",
      hasAsym = false, plusRaw = null, minusRaw = null, hasLabel = false,
      labelRaw = null, labelIsString = true, extraKeys = Nil,
      symRepr = "bool") // filled below
    case 9 => HepErr(hasSym = true, symRaw = null, hasAsym = false,
      plusRaw = null, minusRaw = null, hasLabel = false, labelRaw = null,
      labelIsString = true, extraKeys = Nil, symRepr = "[1, 2]") // TypeError
    case 10 => HepErr(hasSym = false, symRaw = null, hasAsym = true,
      plusRaw = "0.1", minusRaw = null, hasLabel = false, labelRaw = null,
      labelIsString = true, extraKeys = Nil, hasMinus = false) // KeyError
    case _ => sym(" ") // whitespace-only: invalid but non-empty
  }

  test("kernel matches an independent mirror of the reference loop on 400 random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val docs = (0 until 400).map { d =>
      val nVals = 1 + rnd.nextInt(4)
      val vals = (0 until nVals).map { _ =>
        if (rnd.nextInt(10) == 0) dval("1.0") // no errors key
        else dval("1.0", Seq.fill(1 + rnd.nextInt(4)) {
          val e = randErr(rnd)
          if (e.symRepr == "bool") e.copy(symRepr = e.symRaw) else e
        })
      }
      row(f"doc_$d%04d.yaml",
        indep = Seq(indepVar("X",
          (0 until nVals).map(v => point(v.toString, isString = false)))),
        dep = Seq(depVar("Y", vals)))
    }
    val got = HepDataRules.violations(docs.toDS().toDF())
      .orderBy("file", "seq").collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Int]("phase"),
        r.getAs[String]("message")))
      .groupBy(_._1).view
      .mapValues(_.toSeq.map(t => (t._2, t._3))).toMap

    var aborts = 0
    var msgs = 0
    docs.foreach { d =>
      val (expPhase1, aborted) = mirror(d.dep.head.values)
      if (aborted) aborts += 1
      msgs += expPhase1.size
      val gotD = got.getOrElse(d.file, Seq.empty)
      val gotPhase1 = gotD.filter(_._1 == 1).map(_._2)
      assert(gotPhase1 === expPhase1, d.file)
      // abort must also suppress the phase-2 length check for this doc
      // (indep count == dep count here, so length only fires... never) —
      // instead assert phase 3+ absence under abort via the apology rule:
      // an abort with NO other messages yields exactly the apology
      if (aborted && expPhase1.isEmpty && gotD.forall(_._1 != 0))
        assert(gotD.map(_._2) ===
          Seq(s"An unexpected error occurred whilst validating ${d.file}. Please contact info@hepdata.net if this issue recurs."))
    }
    info(s"aborted docs: $aborts of 400; mirror phase-1 messages: $msgs")
    assert(aborts > 50 && msgs > 200) // the generator actually exercises both
  }
}
