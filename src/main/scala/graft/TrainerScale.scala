package graft

import org.apache.spark.sql.SparkSession

/** Production-budget trainer probe: [[graft.ops.Corpus.bpeMergesLocal]]
  * at a REAL vocabulary budget (default 32,768 merges — the 30k-100k
  * class a production tokenizer carries) over a Heaps-realistic
  * synthetic word table (default 5,000,000 distinct words — the
  * trainer's default `maxWords` gate, i.e. the largest table the
  * committed collect admits). Round19OpsSpec pins 4,000 merges
  * structurally; this main records the WALL at the production point so
  * the 30k-100k claim is a measurement, not an extrapolation. Output is
  * committed per-round into SCALESMOKE_r*.md.
  *
  * Words are syllable-structured (consonant+vowel pairs, 2-5 syllables,
  * seeded LCG) so the merge loop faces natural-language-like pair
  * statistics — shared prefixes/suffixes, a small character alphabet
  * fanning into a large pair space as merges create longer symbols —
  * rather than uniform noise; they are generated DRIVER-side (the word
  * table is driver-collected by the trainer anyway) and shipped as
  * 200-word documents so the corpus pass itself stays a real Spark
  * aggregation.
  *
  * Usage: `runMain graft.TrainerScale [rounds] [words]`. */
object TrainerScale {

  private[graft] def word(id: Long): String = {
    val cons = "bcdfghjklmnpqrstvwz"
    val vow = "aeiou"
    var x = id * 6364136223846793005L + 1442695040888963407L
    def next(n: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % n).toInt + n) % n
    }
    val sylls = 2 + next(4)
    val sb = new StringBuilder(sylls * 2)
    var i = 0
    while (i < sylls) {
      sb.append(cons.charAt(next(cons.length)))
      sb.append(vow.charAt(next(vow.length)))
      i += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(32768)
    val nWords = args.drop(1).headOption.map(_.toInt).getOrElse(5000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // driver-side generation, 200 words per document (collisions in the
    // syllable space make the DISTINCT count land slightly under
    // nWords; the trainer reports what it actually collected)
    val gen0 = System.nanoTime()
    val docs = (0L until nWords.toLong).grouped(200).zipWithIndex.map {
      case (ids, d) => (d.toLong, ids.map(word).mkString(" "))
    }.toSeq.toDF("doc_id", "text")
    val genSec = (System.nanoTime() - gen0) / 1e9
    val t0 = System.nanoTime()
    val ledger = graft.ops.Corpus.bpeMergesLocal(
      docs, "doc_id", "text", rounds = rounds, maxWords = nWords)
    val n = ledger.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"TRAINER rounds=$rounds words~$nWords gen=${genSec}%.1fs " +
      f"merges=$n wall=${sec}%.1fs merges_per_sec=${n / sec}%.0f")
    spark.stop()
  }
}
