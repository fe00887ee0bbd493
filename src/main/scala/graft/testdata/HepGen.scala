package graft.testdata

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.hep._
import graft.hep.HepModel._

/** Deterministic synthetic HEPData-shaped corpus at arbitrary scale: one
  * nested document row per id, with known defect residues (same pattern as
  * PagesGen) so nested-rule throughput and counts can be validated at any n.
  */
object HepGen {
  object Residues {
    val ZeroUnc = 97L // all-zero uncertainties at values[1]
    val EmptySym = 89L // empty symerror at values[0].errors[2]
    val BadNumeric = 83L // unparseable symerror at values[0].errors[1]
    val LengthMismatch = 79L // indep 1 value vs dep 2 values
    val OneOfFail = 101L // neither-key error appended at values[1] (P10
    // structural oneOf + the kernel's stale-value continuation path)
    def expected(n: Long): Map[String, Long] = Map(
      "zero" -> (0L until n).count(i => i % ZeroUnc == 0).toLong,
      "empty" -> (0L until n).count(i => i % EmptySym == 0).toLong,
      "numeric" -> (0L until n).count(i => i % BadNumeric == 0).toLong,
      "length" -> (0L until n).count(i => i % LengthMismatch == 0).toLong,
      "oneof" -> (0L until n).count(i => i % OneOfFail == 0).toLong)
  }

  def rows(spark: SparkSession, n: Long): DataFrame = {
    import Residues._
    spark.range(n).map { id =>
      val v = (id % 10).toString
      val sym1 = if (id % BadNumeric == 0) s"$v.x%" else s"0.$v"
      val sym2 = if (id % EmptySym == 0) "" else "1.2%"
      val errs0 = Seq(sym(s"0.4$v", "stat"), sym(sym1, "sys"), sym(sym2, "sys,lumi"))
      val errs1base =
        if (id % ZeroUnc == 0) Seq(sym("0.0", "stat"), asym("0.0%", "-0.0", "sys"))
        else Seq(sym(s"0.1$v", "stat"), asym(s"0.$v", s"-0.$v", "sys"))
      // stale-continuation residue: a neither-key error AFTER defined ones
      // emits the structural oneOf violation and reuses the stale values
      // (no extra semantic message; all-zero verdicts unchanged because the
      // stale pair repeats the previous error's zeroness)
      val errs1 =
        if (id % OneOfFail == 0) errs1base :+ noneErr("{'label': 'sys'}", "sys")
        else errs1base
      val indepVals =
        if (id % LengthMismatch == 0) Seq(point(s"7$v", isString = false))
        else Seq(point(s"7$v", isString = false), point(s"8$v", isString = false))
      row(s"gen_$id.yaml",
        indep = Seq(indepVar("SQRT(S)", indepVals)),
        dep = Seq(depVar("SIG", Seq(dval(s"6.$v", errs0), dval(s"5.$v", errs1)))))
    }(HepModel.hepRowEncoder).toDF()
  }
}
