package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Sampling

/** Streaming corpus-curation operators — the incremental twins of the
  * batch ops in [[graft.ops]]. Like [[EventStreams]], every operator is a
  * plain `DataFrame → DataFrame` over a streaming source, so the same
  * call sites compose under `readStream`/`writeStream`.
  */
object CorpusStreams {

  /** Streaming per-stratum weighted reservoir — the incremental twin of
    * [[Sampling.weightedReservoir]] (Efraimidis–Spirakis A-ES). Scores
    * are the same deterministic hash draws as the batch operator
    * (u = hashUnit(key), s = round(u^(1/w), 9)), computed with the SAME
    * column expressions before the rows reach keyed state; the state per
    * stratum is just the current k best (score, key) pairs. Because
    * top-k-by-a-pure-score is an associative, commutative, idempotent
    * merge, the reservoir after any sequence of micro-batches equals the
    * batch operator over the union of rows seen — arrival order,
    * batching, retries and duplicate deliveries cannot change it.
    *
    * State is bounded at k entries per stratum BY CONSTRUCTION (that is
    * what a reservoir is), so no watermark/timeout is needed for state
    * growth; strata live as long as the query. Emits the stratum's full
    * refreshed reservoir whenever a batch changes it (Update mode): one
    * (stratum, sample_rank, key, sample_score) row per kept element.
    *
    * @param rows streaming frame carrying `keyCol` (castable to long),
    *             `stratumCol`, `weightCol` (castable to double)
    */
  def weightedReservoir(rows: DataFrame, k: Int,
      keyCol: String = "doc_id", stratumCol: String = "stratum",
      weightCol: String = "weight"): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    val spark = rows.sparkSession
    import spark.implicits._
    val scored = rows
      .where(col(keyCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol).cast("double") > 0)
      // keyed state needs a non-null group key; a null stratum folds into
      // "" (the batch twin keeps nulls as their own window partition —
      // callers with both null and empty-string strata should normalize)
      .select(coalesce(col(stratumCol).cast("string"), lit("")).as("stratum"),
        col(keyCol).cast("long").as("key"),
        round(pow(Sampling.hashUnit(col(keyCol)),
          lit(1.0) / col(weightCol).cast("double")), 9).as("score"))
      .as[(String, Long, Double)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Double, Long)],
          (String, Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (stratum: String, rows: Iterator[(String, Long, Double)],
            state: GroupState[List[(Double, Long)]]) =>
          val prev = state.getOption.getOrElse(Nil)
          // same ordering contract as the batch window: score desc, key
          // asc; a key re-delivered in a later batch carries the same
          // deterministic score, so distinct-by-pair dedups it
          val merged = (prev ++ rows.map(r => (r._3, r._2)))
            .distinct
            .sortBy { case (score, key) => (-score, key) }
            .take(k)
          if (merged == prev) Iterator.empty
          else {
            state.update(merged)
            merged.iterator.zipWithIndex.map { case ((score, key), i) =>
              (stratum, (i + 1).toLong, key, score)
            }
          }
      }
      .toDF("stratum", "sample_rank", "key", "sample_score")
  }
}
