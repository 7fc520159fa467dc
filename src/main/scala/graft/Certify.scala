package graft

/** Certification-count emitter (VERDICT r12 #3): the certified-end-state
  * numbers in NOTES.md are GENERATED from the tree, never hand-typed —
  * two consecutive rounds had a counting slip (r11: repeat totals; r12:
  * 214 claimed vs 213 goldens on disk). Prints one JSON line with the
  * registry size, oracle coverage, and plan-golden count at snapshot
  * time; tools/certify.py wraps it with the suite size parsed from the
  * last full test log and writes CERTIFY.json.
  *
  * No SparkSession: QueryDef construction is metadata-only.
  */
object Certify {
  def main(args: Array[String]): Unit = {
    val defs = Registry.all
    val names = defs.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate registry names: ${names.diff(names.distinct).mkString(",")}")
    val goldenDir = java.nio.file.Paths.get("src/test/resources/golden_plans")
    val goldens = java.nio.file.Files.list(goldenDir).toArray
      .map(_.toString).count(_.endsWith(".txt"))
    val withOracle = defs.count(_.oracle.isDefined)
    println(s"""{"n_contracts":${defs.size},"n_oracles":$withOracle,""" +
      s""""n_plan_goldens":$goldens}""")
  }
}
