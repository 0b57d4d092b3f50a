package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combine per-query rankings from
  * heterogeneous retrievers (BM25 postings, exact/ANN kNN, …) into one
  * list per query. The training-data-curation shape: "which corpus docs
  * does this benchmark question retrieve under EITHER lexical or
  * semantic search" — the union-of-retrievers decontamination net, and
  * the standard first stage of hybrid RAG retrieval. (The reference has
  * no retrieval surface; this extends the engine's lexical (q106-q111)
  * and kNN (q65/q69/q85) families the same way §2.6 windows extend the
  * reference's missing aggregation surface.)
  *
  * Reciprocal-rank fusion (Cormack et al., SIGIR 2009): each list
  * contributes `1 / (k0 + rank)` for every (query, doc) it ranks; docs
  * are re-ranked by the summed contribution. RRF needs only RANKS, not
  * scores — which is exactly why it fuses heterogeneous retrievers
  * whose score scales are incomparable (BM25 micro-units vs cosine).
  *
  * Determinism contract (same discipline as [[Lexical]]): contributions
  * are computed in integer micro-units — `1000000 div (k0 + rank)` on
  * BIGINTs — so the fused score is a sum of exact integers, replayable
  * bit-for-bit by any SQL engine; the final rank breaks ties by doc id.
  *
  * Scale posture: the inputs are already per-query top-k lists (≤
  * |queries| · k rows each — the retrievers upstream did the 100 TB
  * work), so fusion costs one union + one (query, doc)-keyed map-side-
  * combined aggregation + one group-limited rank window. Nothing here
  * touches the corpus.
  */
object Fusion {

  /** Fuse per-query ranked lists by reciprocal rank. Each input must
    * have columns `(query_id, doc_id, rank)` with `rank` a dense 1-based
    * per-query rank and at most one row per (query, doc). Output: top
    * `k` fused rows per query as `(query_id, rnk, doc_id, n_lists,
    * rrf_micro)` where `n_lists` counts the lists that retrieved the
    * doc and `rrf_micro = Σ 1000000 div (k0 + rank)` exact BIGINTs. */
  def rrf(lists: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    val contrib = lists.map { l =>
      l.select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        expr(s"1000000 div ($k0 + CAST(rank AS BIGINT))").as("m"))
    }.reduce(_.unionByName(_))
    contrib.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_lists"), sum("m").as("rrf_micro"))
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("rrf_micro").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("n_lists"),
        col("rrf_micro"))
  }
}
