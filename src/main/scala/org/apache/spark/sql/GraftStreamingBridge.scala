package org.apache.spark.sql

import org.apache.spark.sql.connector.read.streaming.SparkDataStream
import org.apache.spark.sql.execution.LogicalRDD

/** The one internal seam a DataSource-V1 streaming `Source` needs:
  * `Source.getBatch` must return a DataFrame whose logical plan has
  * `isStreaming = true` (MicroBatchExecution asserts it), but the
  * public API offers no way to mark a batch-computed DataFrame as
  * streaming — `FileStreamSource` itself reaches for
  * `internalCreateDataFrame(..., isStreaming = true)`, which is
  * `private[sql]`. This bridge lives in `org.apache.spark.sql` purely
  * to re-expose that one capability to `graft.sources`' bronze
  * change-feed source, the standard practice for external DSv1
  * streaming connectors. Nothing else from the internal surface is
  * used. */
object GraftStreamingBridge {

  /** Re-wrap `df`'s physical RDD as a streaming leaf (the
    * `LogicalRDD(isStreaming = true)` form FileStreamSource produces),
    * optionally tagging the originating stream so Spark can associate
    * the leaf with its source. */
  def asStreamingBatch(df: Dataset[Row],
      stream: Option[SparkDataStream] = None): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val qe = df.queryExecution
    classic.Dataset.ofRows(spark,
      LogicalRDD(qe.analyzed.output, qe.toRdd, isStreaming = true,
        stream = stream)(spark))
  }
}
