package graft.operators

import graft.PlanProbe.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Markov-chain analysis over observed transition pairs.
  *
  * The reference's replicated event stream supports "what does a user do
  * next" (the R58 kernel); the stationary distribution answers the
  * long-run version — where does the process SPEND ITS TIME — the
  * steady-state page/screen/state share that sizes caches, staffing, and
  * sampling budgets (reference: README.md:24, the warehouse's behavioral
  * workload).
  *
  * Exact-arithmetic contract: the kernel is the R58 ppm row
  * normalization (n·10⁶ div row_total); each power-iteration round is
  * πᵏ⁺¹(s) = (Σ_f πᵏ(f)·p(f,s)) div 10⁶ — one floor division per state
  * per round AFTER the exact integer sum, so a fixed round count replays
  * as chained CTEs in any engine. Floors shed at most |S| ppm of mass
  * per round (stated; the result is a deterministic fixed-point vector,
  * not a float approximation). Dangling states (never seen as a source)
  * get the standard self-loop p(s,s) = 10⁶.
  *
  * Scale shape: the only data-sized work is the pair-count aggregate;
  * the kernel, the dangling patch, and every iteration run on the
  * STATE-sized tables (|S| and ≤ |S|² rows — event-type domains are
  * bounded), far below any shuffle worth worrying about.
  */
object Markov {

  /** Stationary distribution after `rounds` exact power-iteration steps.
    *
    * @param pairs  observed transitions, columns (from_state, to_state) —
    *               one row per observed step (pre-aggregation happens
    *               here)
    * @return (state, pi_ppm), every state in from ∪ to present
    */
  def stationaryPpm(pairs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val counts = pairs
      .select(col("from_state"), col("to_state"))
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
      .ckpt
    val states = counts.select(col("from_state").as("state"))
      .unionAll(counts.select(col("to_state").as("state")))
      .distinct().ckpt
    val kernel = counts
      .withColumn("row_total",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("from_state"))))
      .select(col("from_state"), col("to_state"),
        expr("n * 1000000 div row_total").as("p_ppm"))
    val dangling = states
      .join(counts.select(col("from_state").as("state")).distinct(),
        Seq("state"), "left_anti")
      .select(col("state").as("from_state"), col("state").as("to_state"),
        lit(1000000L).as("p_ppm"))
    val trans = kernel.unionByName(dangling).ckpt
    val nStates = states.count()
    var pi = states.select(col("state"), lit(1000000L / nStates).as("pi"))
    for (_ <- 1 to rounds) {
      pi = states
        .join(trans
            .join(pi.withColumnRenamed("state", "from_state"), Seq("from_state"))
            .groupBy(col("to_state").as("state"))
            .agg(sum(col("pi") * col("p_ppm")).as("inflow")),
          Seq("state"), "left")
        .select(col("state"),
          expr("coalesce(inflow, 0) div 1000000").as("pi"))
        .ckpt
    }
    pi.select(col("state"), col("pi").as("pi_ppm"))
  }
}
