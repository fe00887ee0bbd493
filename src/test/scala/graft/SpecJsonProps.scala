package graft

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.spec._

/** ScalaCheck properties: the JSON spec codec is a total roundtrip over the
  * rule ADT (any spec a user writes can be persisted and reloaded). */
object SpecJsonProps extends Properties("SpecJson") {

  val genCol: Gen[String] = Gen.oneOf("url", "lang", "text", "n_chars", "warc_ts")
  val genRule: Gen[Rule] = Gen.oneOf(
    genCol.map(NotNull(_)),
    genCol.map(MatchesRegex(_, "^https?://")),
    for { c <- genCol; vs <- Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty)) }
      yield InSet(c, vs.take(5)),
    for { c <- genCol; n <- Gen.choose(1, 1024) } yield MaxLen(c, n),
    for { c <- genCol; m <- Gen.choose(-100.0, 100.0) } yield MinValue(c, m),
    for { c <- genCol; p <- Arbitrary.arbBool.arbitrary } yield NumericString(c, p),
    genCol.map(c => EqualsExpr(c, s"length($c)", "length")),
    genCol.map(Between(_, "0", "10")),
    genCol.map(NotContains(_, "/")),
    for { c <- genCol; id <- Gen.identifier.suchThat(_.nonEmpty) }
      yield ExprRule(id, c, s"$c IS NOT NULL", s"'bad $c'", "hint"))

  val genSpec: Gen[TableSpec] = for {
    rules <- Gen.nonEmptyListOf(genRule)
    keys <- Gen.nonEmptyListOf(genCol)
  } yield TableSpec("pages", "part_id", keys.distinct.take(3), rules.take(10))

  property("parse(toJson(spec)) == spec") = forAll(genSpec) { spec =>
    SpecJson.parse(SpecJson.toJson(spec)) == spec
  }

  property("toJson is stable (deterministic)") = forAll(genSpec) { spec =>
    SpecJson.toJson(spec) == SpecJson.toJson(SpecJson.parse(SpecJson.toJson(spec)))
  }
}
