package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.hep._
import graft.hep.HepModel._

/** Robustness: adversarially-shaped rows (empty arrays, missing sections,
  * nulls in every optional slot, pathological scalars) must never make the
  * fused projections throw — at 10^12 rows a single malformed document must
  * not kill the job. */
class HepFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("HepDataRules never throws on adversarial rows") {
    import spark.implicits._
    val weird = Seq(
      emptyRow("f0"),
      HepRow("f1", emptyDoc = false, hasIndep = false, Nil, hasDep = false, Nil),
      row("f2", indep = Seq.empty, dep = Seq.empty),
      row("f3", indep = Seq(indepVar("v", Seq.empty)), dep = Seq(depVar("d", Seq.empty))),
      row("f4", indep = Seq(indepVar("v", null)), dep = Seq(depVar("d", null))),
      row("f5",
        indep = Seq(indepVar("v", Seq(
          HepIndepVal(hasValue = false, null, valueIsString = false,
            hasLow = false, null, lowIsNum = false, None,
            hasHigh = false, null, highIsNum = false, None, "{}", Nil)))),
        dep = Seq(depVar("d", Seq(
          dval(null, Seq(HepErr(hasSym = false, null, hasAsym = false, null,
            null, hasLabel = false, null, labelIsString = false,
            Seq("a", "b", "c")))),
          dval("", Seq.empty),
          dval("x", null))))),
      row("f6",
        indep = Seq(indepVar("v", Seq(
          point("∞ - ∞", isString = true), point("--", isString = true),
          point("1-2-3", isString = true),
          bin("inf", Some(Double.PositiveInfinity), "inf", Some(Double.PositiveInfinity)),
          bin("nan", Some(Double.NaN), "nan", Some(Double.NaN))))),
        dep = Seq(depVar("d", Seq(
          dval("v", Seq(sym("%%%"), sym("%"), sym("  "), asym("%", "%"),
            asym(null, null).copy(hasAsym = false, hasSym = false))))))))
    val df = weird.toDS().toDF()
    val v = HepDataRules.violations(df).collect() // must not throw
    val verdicts = HepDataRules.verdicts(df).collect()
    assert(verdicts.length === weird.size)
    assert(v.forall(_.getAs[String]("message") != null))
  }

  test("version lattice holds on a 2000-doc generated corpus") {
    // properties the published schemas imply, checked per generated doc:
    //  - 1.1.0 and 1.1.1 are structurally identical
    //  - v0 only ever emits structural (phase ≤ 0) messages
    //  - 1.0.x emits no phase-3 (independent-variable) messages
    //  - every version's messages are a deterministic function (re-run equal)
    val corpus = graft.testdata.HepGen.rows(spark, 2000)
    def byVersion(v: String) =
      HepDataRules.violations(corpus, SchemaVersion.parse(v))
        .select("file", "seq", "phase", "message").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .sortBy(t => (t._1, t._2))
    val v111 = byVersion("1.1.1")
    assert(byVersion("1.1.0") === v111)
    val v0 = byVersion("0.1.0")
    assert(v0.forall(_._3 <= 0), v0.filter(_._3 > 0).take(3).mkString("\n"))
    val v100 = byVersion("1.0.0")
    assert(v100.forall(_._3 <= 2), v100.filter(_._3 > 2).take(3).mkString("\n"))
    assert(byVersion("1.1.1") === v111) // determinism
  }

  test("SubmissionRules never throws on adversarial rows") {
    import spark.implicits._
    val weird = Seq(
      SubFile("s0", Seq.empty),
      SubFile("s1", Seq(SubModel.emptyDoc)),
      SubFile("s2", Seq(SubModel.addInfoDoc(recids = Seq(
        RelItem(null, isString = false, isInt = false, None))))),
      SubFile("s3", Seq(
        SubModel.tableDoc(null, null, keywords = Seq(
          SubKeyword(hasName = false, null, hasValues = false, null, Seq("z")),
          SubModel.kw("cmenergies", Seq(SubModel.kvs(""), SubModel.kvs("-"),
            SubModel.kvs(null))))))),
      SubFile("s4", Seq(SubModel.tableDoc("t", "f.yaml")
        .copy(hasDois = true, dois = Seq(RelItem("", isString = true,
          isInt = false, None))))))
    val v = SubmissionRules.violations(weird.toDS().toDF()).collect()
    val verdicts = SubmissionRules.verdicts(weird.toDS().toDF()).collect()
    assert(verdicts.length === weird.size)
    assert(v.forall(_.getAs[String]("message") != null))
  }
}
