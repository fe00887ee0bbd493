package graft.ingest

/** Raw YAML data-file fixtures for the driver's oracle-gated
  * `raw_yaml_violations` query: actual YAML bytes pushed through the
  * executor-side ingester (PyYamlParse → YamlIngest → HepDataRules), the
  * production path a real submission store exercises. The documents span
  * the rule families: a clean table, %-errors, all-zero uncertainties,
  * both oneOf failure directions, bad member types, string '-inf' bin
  * edges, qualifier/header errors, extra keys, length mismatches,
  * YAML-1.1 scalar quirks ('1.0e2' stays a string, '0x1A' is 26, the
  * '2.300e-003f' float-gate golden), and an empty document.
  *
  * Stored as classpath resources (src/main/resources/rawyaml/) so the
  * reference validator reads the SAME bytes:
  * tools/gen_rawyaml_golden.py records its messages, and
  * RawYamlGoldenSpec pins the engine's output against them. */
object RawYamlFixtures {

  val names: Seq[String] = Seq(
    "raw_valid.yaml", "raw_zero_unc.yaml", "raw_oneof.yaml",
    "raw_badtypes.yaml", "raw_inf_bins.yaml", "raw_lengths.yaml",
    "raw_extras.yaml", "raw_scalar_quirks.yaml", "raw_missing_parts.yaml",
    "raw_bad_arrays.yaml", "raw_empty.yaml")

  lazy val docs: Seq[(String, String)] = names.map { n =>
    val in = getClass.getResourceAsStream(s"/rawyaml/$n")
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    n -> text
  }
}
