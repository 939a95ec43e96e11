package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Checkpoint / idempotent-resume protocol (SURVEY.md §2 J1, §7).
 *
 * The reference gets at-least-once delivery from RabbitMQ manual ack
 * (`consumer/LogConsumer.java:48`): a message is acked only after the ES
 * index succeeds, so a crash replays it. The batch recast of that contract
 * is **commit-marker-last**: each stage writes its outputs, then — only
 * after every output is durable — writes a single commit row to the
 * checkpoint table. On re-run, stages whose commit row exists are skipped;
 * stages without one are re-executed with `overwrite` (so half-written
 * output is replaced, not duplicated). This emulates Iceberg's atomic
 * snapshot commit with plain parquet + a marker (no Iceberg runtime in this
 * environment — SURVEY.md §7).
 *
 * Lineage (J7): the commit row carries row counts from the stage's
 * `Observation` metrics; per-partition lineage rows are stored alongside.
 */
object Checkpoint {

  final case class CommitRow(
      stageId: String,
      inputRows: Long,
      outputRows: Long,
      rejectedRows: Long,
      commitTs: String,
      status: String)

  private def markerPath(root: String, stageId: String) =
    new Path(s"$root/_checkpoint/$stageId/_COMMITTED")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True iff the stage's commit marker exists (stage fully done). */
  def committed(spark: SparkSession, root: String, stageId: String): Boolean = {
    val p = markerPath(root, stageId)
    fs(spark, p).exists(p)
  }

  /**
   * Runs `body` unless the stage already committed; on success writes the
   * commit row + optional lineage table, then the marker file LAST.
   * Returns true if the stage ran, false if skipped (resume).
   */
  def runStage(spark: SparkSession, root: String, stageId: String,
               jobStartTs: java.sql.Timestamp)
              (body: => (CommitRow, Option[DataFrame])): Boolean = {
    if (committed(spark, root, stageId)) return false
    import spark.implicits._
    val (row, lineage) = body
    lineage.foreach(_.write.mode(SaveMode.Overwrite)
      .parquet(s"$root/_checkpoint/$stageId/lineage"))
    Seq(row.copy(commitTs = jobStartTs.toInstant.toString, status = "committed"))
      .toDS().write.mode(SaveMode.Overwrite)
      .parquet(s"$root/_checkpoint/$stageId/commit")
    // marker last — the atomicity point of the protocol
    val p = markerPath(root, stageId)
    fs(spark, p).create(p, true).close()
    true
  }

  /** All commit rows (the checkpoint table). */
  def commits(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/_checkpoint/*/commit")

  /** Clears a stage's marker (test helper for the resume property). */
  def invalidate(spark: SparkSession, root: String, stageId: String): Unit = {
    val p = markerPath(root, stageId)
    val f = fs(spark, p)
    if (f.exists(p)) f.delete(p, false)
  }
}
