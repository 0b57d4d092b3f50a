package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI harness for the 10× scale probe (gated: materializing and running
  * the five heaviest ops at 10× sf0.1 is a multi-minute job, so the probe
  * runs per-round via `GRAFT_SCALE_SMOKE=1 sbt "testOnly graft.ScaleSmokeSpec"`
  * — its committed output lives in SCALESMOKE_r*.md — not on every test
  * invocation). */
class ScaleSmokeSpec extends AnyFunSuite {

  test("10x data: every probe stays within the linear-wall bar, " +
      "no errors, no empty results") {
    assume(sys.env.contains("GRAFT_SCALE_SMOKE"),
      "set GRAFT_SCALE_SMOKE=1 to run the 10x scale probe")
    val spark = TestSpark.spark
    val results = ScaleSmoke.run(spark, "/root/testdata/sf0.1",
      sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10"))
    results.foreach(p => info(
      f"${p.name}: base=${p.baseSec}%.2fs x10=${p.scaledSec}%.2fs " +
        f"ratio=${p.ratio}%.2f rows=${p.baseRows}->${p.scaledRows} " +
        p.err.getOrElse("")))
    assert(results.size == ScaleSmoke.Probes.size)
    results.foreach { p =>
      assert(p.err.isEmpty, s"${p.name} errored: ${p.err}")
      assert(p.baseRows > 0 && p.scaledRows > 0, s"${p.name} empty result")
      assert(p.ratio <= ScaleSmoke.MaxRatio,
        f"${p.name}: ${p.ratio}%.2fx wall for 10x data — scale-killer")
    }
  }
}
