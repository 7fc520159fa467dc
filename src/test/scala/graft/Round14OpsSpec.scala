package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 additions: the m17 priced band-occupancy guard (VERDICT
  * r13 #1 — the flat-payload degenerate case m17's own docstring named
  * but left to deployments), and the structured refusal marker the
  * probe artifact uses to tell a by-design priced refusal from a crash
  * (ADVICE r13 #1).
  */
class Round14OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("m17: flat-payload corpus refuses BEFORE the band join, naming the entropy-prefilter route") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_m17_flat_").toString
    // constant-letter payloads: every neighbor-difference bit is 0, so
    // all six 42-bit gradient words collapse to the all-zero key for
    // base AND both plant families (upper() shifts a level the gradient
    // is invariant to; reverse() of a constant is a no-op) — the
    // degenerate-VALUE saturation the aHash prototype measured (one
    // band key holding 7,399 of 450k rows). Unlike m10's refusal this
    // is not a key-space width problem: the guard must price it in one
    // linear aggregate and refuse action-free, routing to m09/pHash,
    // NOT to a wider band.
    val docs = (1L to 200L).map(id => (id, "a" * 80, "en"))
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ex = intercept[IllegalArgumentException] {
      operators.Multimodal.m17WidehashPairs(spark, dir, priceAboveRows = 0L)
    }
    assert(ex.getMessage.contains("refused: priced candidate volume"),
      s"refusal must carry the structured priced-guard prefix: ${ex.getMessage}")
    assert(ex.getMessage.contains("m09_payload_entropy"),
      s"refusal must name the in-tree entropy-prefilter route: ${ex.getMessage}")
    assert(ScaleProbe.isPricedRefusal(ex.getMessage),
      "the probe's structured marker must classify this as a by-design refusal")
  }

  test("m17: the gate corpus stays under the saturation budget even when priced") {
    // same corpus as the Round13 plant-separation test, pricing forced
    // on (priceAboveRows = 0): real payloads' gradient bits spread the
    // band keys, so the priced volume sits well under 64 pairs/row and
    // the guard is a no-op — the refusal above is payload-degeneracy-
    // specific, not a blanket size cutoff
    val out = operators.Multimodal.m17WidehashPairs(spark, sf, priceAboveRows = 0L)
    assert(out.count() > 0)
  }

  test("probe refusal marker: structured prefix only — a crash mentioning 'refused' is a crash") {
    // ADVICE r13 #1: the probe used to match the bare substring
    // 'refused', so any genuine failure whose message happened to
    // contain the word was recorded as a by-design refusal
    assert(ScaleProbe.isPricedRefusal(
      "m17_widehash_pairs refused: priced candidate volume 1.194e+06 pairs exceeds 38400"))
    assert(ScaleProbe.isPricedRefusal(
      "d16_prefix_filter_join refused: priced candidate volume 5.2e+08 pairs exceeds x"))
    assert(!ScaleProbe.isPricedRefusal(
      "connection refused: executor lost while fetching shuffle block"))
    assert(!ScaleProbe.isPricedRefusal("the write was refused by the filesystem"))
    assert(!ScaleProbe.isPricedRefusal(null))
  }
}
