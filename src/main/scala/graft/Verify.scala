package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated subset (dev iteration; the driver
    // always runs the full registry). The full-registry invariant below is
    // scoped to the subset so a dev run doesn't scream about unrun queries.
    val only = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean =
      only.forall(keys => keys.exists(k => name == k || name.startsWith(k + "_")))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.SessionFactory.local(cpus.toInt, "graft-verify")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.toSeq.sortBy(_._1).filter(q => selected(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A crashing query must surface as a RED row in the driver's
        // correctness report, not silently vanish (round-4 lesson: q80
        // crashed at analysis and was absent from CORRECTNESS_r04). Write
        // a one-row parquet whose schema is just `err` — the DuckDB
        // compare then fails schema/rows/hash loudly for this query.
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(500)
        failed(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        try {
          import spark.implicits._
          Seq(msg).toDF("err").coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name could not write err marker: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(e => selected(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failed
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    // Loud invariant: every registered query must have produced an output
    // directory (real result or err marker) — a missing one is a harness bug.
    val missing = SparkEntry.queries.keySet.filter(selected)
      .filterNot(n => Files.exists(Paths.get(s"$outDir/$n")))
    if (missing.nonEmpty)
      System.err.println(s"[verify] HARNESS BUG — no output for: ${missing.mkString(", ")}")
    spark.stop()
    // A query with NO output at all (even the err marker failed to write) is a
    // harness bug an rc-gated caller must see — exit non-zero. Per-query
    // failures that DID write their marker stay rc 0 on purpose: the marker is
    // the red row in the driver's compare, and failing the whole process would
    // replace 80 green rows + 1 red with a single opaque failure.
    if (missing.nonEmpty) sys.exit(2)
  }
}
