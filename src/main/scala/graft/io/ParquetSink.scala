package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Parquet sinks — the Spark-native re-expression of the reference's writers
  * (`/root/reference/src/load/write.py:6-24` run-stamped plain,
  * `/root/reference/src/load/write.py:51-70` partitioned; the broken S5 pair at
  * `write.py:27-46` is deliberately not reproduced, SURVEY §2.1).
  *
  * Differences on purpose:
  *  - The run stamp is a caller-supplied `runId`, not `datetime.now()` inside the
  *    writer (`write.py:8`) — deterministic, testable, and one stamp per run
  *    instead of one per call.
  *  - Partitioned writes repartition on the partition columns first: without it,
  *    every task writes a file into every partition directory — at 1000
  *    executors × hundreds of months/stores that is millions of small files.
  *    With it, each partition's rows arrive at one task and parquet gets
  *    chunky files. (AQE may further coalesce.)
  *  - Paths are Hadoop-FS URIs, so `file:///…` and `s3a://bucket/…` go through
  *    the same code path — the reference maintains parallel local/S3 writers.
  */
object ParquetSink {

  /** Plain overwrite write under a run-stamped directory; returns the path. */
  def writeRunStamped(df: DataFrame, base: String, runId: String): String = {
    val path = s"$base/$runId"
    df.write.mode(SaveMode.Overwrite).parquet(path)
    path
  }

  /** Partitioned overwrite write (S4), run-stamped; returns the path.
    *
    * The repartition count is pinned explicitly: a bare `repartition(cols)`
    * is an AQE-coalescible exchange, and on a small-relative-to-cluster write
    * AQE collapses it to ONE task that then opens every partition directory's
    * file serially (~10ms of writer setup each — observed 18s for a 1.5k-dir
    * mart that writes in ~2s when spread). Pinning keeps file-open cost
    * parallel while still clustering rows so each directory gets exactly one
    * file.
    */
  def writePartitioned(
      df: DataFrame, base: String, runId: String, partitionCols: Seq[String]): String = {
    val path = s"$base/$runId"
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    path
  }
}
