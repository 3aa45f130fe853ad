package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.table.TableIO

/** Periodic iteration-state checkpointing for the iterative algorithms
  * (SURVEY.md §2.9): every `every`-th iteration the state DataFrame is
  * committed as a table snapshot with per-partition lineage + metrics, so a
  * killed run resumes mid-algorithm from the latest snapshot and converges
  * to the identical result (north rule resumability requirement). */
final case class IterationCheckpoint(root: String, every: Int = 5) {

  def maybeWrite(iteration: Int, delta: Double, state: DataFrame): Unit =
    if (every > 0 && iteration % every == 0) write(iteration, delta, state)

  def write(iteration: Int, delta: Double, state: DataFrame): Unit = {
    TableIO.commit(state, root, iteration, Map("delta" -> delta))
    ()
  }

  /** Latest committed (iteration, state) if any. */
  def latest(spark: SparkSession): Option[(Int, DataFrame)] =
    TableIO.readLatest(spark, root).map { case (m, df) => (m.iteration, df) }

  def lineage: Seq[TableIO.Manifest] = TableIO.lineage(root)
}
