package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Validated CSV batch ingest — the Spark-native `validate_schema`
  * (`/root/reference/src/transform/transform.py:19-83`, SURVEY §3.2).
  *
  * Per file: scan → mandatory-column check (P1) → emptiness check (P2) →
  * extra-column collapse into `additional_column` (concat_ws,
  * `transform.py:51-56`) → canonical projection (P3); then one `unionByName` fold
  * (U1) — by-name, not the reference's positional `union`, so a column-order drift
  * between files can never silently mis-assign values.
  *
  * Differences from the reference, on purpose (SURVEY §7.4):
  *  - explicit schema instead of `inferSchema` (deterministic; one pass instead of
  *    two over each file — at 100 TB inference alone doubles ingest I/O);
  *  - empty-file check via `limit(1)` instead of a full `count()` job per file;
  *  - empty input yields `None`, not a Python-list-masquerading-as-DataFrame
  *    (`transform.py:75-77` bug).
  */
object CsvBatchReader {

  final case class LoadResult(
      data: Option[DataFrame],
      validFiles: Seq[String],
      badSchemaFiles: Seq[String],
      emptyFiles: Seq[String])

  val AdditionalColumn = "additional_column"

  /** Read one CSV with header; `schema` fixes the types of the mandatory columns,
    * any extra columns arrive as strings.
    */
  private def readOne(spark: SparkSession, path: String, schema: Option[StructType]): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", "true").csv(path)
    }
  }

  def validateAndLoad(
      spark: SparkSession,
      files: Seq[String],
      mandatory: Seq[String],
      schema: Option[StructType] = None): LoadResult = {

    var valid = Vector.empty[String]
    var bad = Vector.empty[String]
    var empty = Vector.empty[String]
    var frames = Vector.empty[DataFrame]

    files.foreach { path =>
      try {
        val df = readOne(spark, path, schema)
        val missing = mandatory.toSet -- df.columns.toSet
        if (missing.nonEmpty) bad :+= path
        else if (df.limit(1).count() == 0) empty :+= path
        else {
          val extras = df.columns.filterNot(mandatory.contains).toSeq
          val withExtra =
            if (extras.isEmpty) df.withColumn(AdditionalColumn, lit(null).cast("string"))
            else df.withColumn(AdditionalColumn, concat_ws(", ", extras.map(col): _*))
          frames :+= withExtra.select((mandatory :+ AdditionalColumn).map(col): _*)
          valid :+= path
        }
      } catch {
        // unreadable / malformed files land in the bad-schema bucket, like the
        // reference's broad except (`transform.py:66-68`)
        case scala.util.control.NonFatal(_) => bad :+= path
      }
    }

    val data = frames.reduceOption(_ unionByName _)
    LoadResult(data, valid, bad, empty)
  }

  /** File-type gate (C3, `/root/reference/src/main_1.py:157-181`): split a listing
    * into CSVs and everything else (to be quarantined by the caller).
    */
  def partitionByExtension(files: Seq[String]): (Seq[String], Seq[String]) =
    files.partition(_.toLowerCase.endsWith(".csv"))
}
