package graft.api

import org.apache.spark.sql.DataFrame

/** Minimal composition API mirroring the reference framework's ergonomics
  * (named transformation stages chained over a frame), Spark-first: each
  * stage is DataFrame => DataFrame, the whole pipeline stays one lazy
  * Catalyst plan (no materialization between stages), and `describe`
  * exposes the composed plan for audit.
  */
final case class Pipeline(stages: Vector[(String, DataFrame => DataFrame)]) {

  def andThen(name: String)(f: DataFrame => DataFrame): Pipeline =
    Pipeline(stages :+ (name -> f))

  /** Apply all stages; still lazy — one optimized plan end to end. */
  def run(input: DataFrame): DataFrame =
    stages.foldLeft(input) { case (df, (_, f)) => f(df) }

  /** Stage names + the final optimized plan (for logging/audit). */
  def describe(input: DataFrame): String = {
    val out = run(input)
    stages.map(_._1).mkString("stages: ", " -> ", "\n") +
      out.queryExecution.optimizedPlan.toString
  }

  /** Row count after each stage — forces one action per stage, so use on
    * samples / in tests, not in production plans.
    */
  def profile(input: DataFrame): Seq[(String, Long)] = {
    var df = input
    stages.map { case (name, f) => df = f(df); name -> df.count() }
  }
}

object Stage {
  /** A materialization barrier: persist the frame at this point so stages
    * that fan out over it (self-joins, multi-branch reuse) read the cached
    * result instead of recomputing the whole upstream plan per branch.
    * This is the Spark-idiomatic checkpoint you'd place before a self-join
    * at the 100 TB scale — upstream regex/normalization work runs once.
    */
  def materialize(name: String): (String, DataFrame => DataFrame) =
    name -> ((df: DataFrame) =>
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
}

object Pipeline {
  def apply(stages: (String, DataFrame => DataFrame)*): Pipeline =
    Pipeline(stages.toVector)
}
