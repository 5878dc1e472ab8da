package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A versioned parquet table with snapshot isolation, time travel and a
  * change feed — the lakehouse transaction-log pattern (Delta/Iceberg-style)
  * built on nothing but parquet directories and a tiny text manifest per
  * version. Completes the table-maintenance tier: [[graft.ops.Merge]] is the
  * row-level upsert semantics, `ops.Relational` SCD2/CDC the history
  * modeling, `ops.Compaction` the file-size hygiene — this is the COMMIT
  * protocol that makes those operations versioned and readable as-of.
  *
  * Layout under `base/`:
  *   - `_log/v00000.txt, v00001.txt, …` — one manifest per version, text
  *     lines: `action <name>`, `add <relative group dir>`,
  *     `remove <relative group dir>`. Version N's live set is the fold of
  *     manifests 0..N (adds minus removes).
  *   - `groups/g<version>-<k>/` — immutable parquet "file groups". Data
  *     files are NEVER mutated or deleted by commits; old versions stay
  *     readable (time travel) until a vacuum (not modeled) reclaims them.
  *
  * Commit protocol: data groups are fully written BEFORE the manifest, and
  * the manifest lands by write-to-temp + atomic move — a reader either sees
  * version N complete or not at all, and a crashed writer leaves only
  * unreferenced data (cleaned by vacuum), never a torn table. Single-writer
  * by design; a multi-writer deployment swaps the atomic rename for the
  * object store's conditional put, exactly as the real systems do.
  *
  * Scale shape: ALL log operations are manifest-sized (file counts, not row
  * counts) — snapshot resolution reads a handful of text files driver-side,
  * the same work a Delta driver does, then hands Spark one multi-path
  * parquet read. [[deleteWhere]] is copy-on-write at FILE-GROUP granularity:
  * one pruning job finds the groups that actually contain matching rows
  * (`input_file_name` aggregated to groups), only those are rewritten;
  * untouched groups carry over by reference. A delete matching 1% of rows
  * rewrites ~1% of the data, not the table.
  */
object VersionedTable {

  private def logDir(base: String) = Paths.get(base, "_log")

  /** An added file group, optionally carrying min/max stats for ONE declared
    * clustering column — the manifest-level data-skipping index. Stats are
    * doubles (numeric clustering keys); a group without stats is never
    * skipped (correctness default for mixed histories).
    */
  private case class Group(rel: String, statsCol: Option[String] = None,
      min: Double = 0, max: Double = 0) {
    def manifestLine: String = statsCol match {
      case Some(c) => s"add $rel $c $min $max"
      case None => s"add $rel"
    }
  }

  private case class Manifest(action: String, add: Seq[Group], remove: Seq[String])

  private def manifestFiles(base: String): Seq[java.nio.file.Path] = {
    val d = logDir(base)
    if (!Files.exists(d)) Seq.empty
    else Files.list(d).iterator().asScala.toSeq
      .filter(_.getFileName.toString.matches("v\\d+\\.txt")).sortBy(_.getFileName.toString)
  }

  private def readManifest(p: java.nio.file.Path): Manifest = {
    val lines = Files.readAllLines(p).asScala.toSeq
    val adds = lines.collect {
      case s if s.startsWith("add ") => s.drop(4).split(" ") match {
        case Array(rel) => Group(rel)
        case Array(rel, c, mn, mx) => Group(rel, Some(c), mn.toDouble, mx.toDouble)
      }
    }
    Manifest(
      lines.collectFirst { case s if s.startsWith("action ") => s.drop(7) }.getOrElse("?"),
      adds,
      lines.collect { case s if s.startsWith("remove ") => s.drop(7) })
  }

  /** Latest committed version, or -1 for an empty/absent table. */
  def latestVersion(base: String): Int = manifestFiles(base).size - 1

  private def liveGroups(base: String, asOf: Int): Seq[Group] = {
    val ms = manifestFiles(base).take(asOf + 1).map(readManifest)
    ms.foldLeft(Vector.empty[Group])((live, m) =>
      live.filterNot(g => m.remove.contains(g.rel)) ++ m.add)
  }

  private def commit(base: String, action: String, add: Seq[Group],
      remove: Seq[String]): Int = {
    val v = latestVersion(base) + 1
    Files.createDirectories(logDir(base))
    val body = (s"action $action" +: (add.map(_.manifestLine) ++ remove.map("remove " + _)))
      .mkString("", "\n", "\n")
    val tmp = logDir(base).resolve(f".v$v%05d.txt.tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, logDir(base).resolve(f"v$v%05d.txt"),
      StandardCopyOption.ATOMIC_MOVE)
    v
  }

  private def writeGroup(df: DataFrame, base: String, version: Int, k: Int,
      statsCol: Option[String] = None): Option[Group] = {
    val rel = f"groups/g$version%05d-$k"
    df.write.mode("overwrite").parquet(s"$base/$rel")
    statsCol match {
      case None => Some(Group(rel))
      case Some(c) =>
        // stats ride the commit: one tiny agg over the group just written
        // (a production writer folds this into the write task's footer scan)
        val r = df.sparkSession.read.parquet(s"$base/$rel")
          .agg(count(lit(1)), min(col(c).cast("double")), max(col(c).cast("double"))).head
        if (r.getLong(0) == 0L) None   // empty rewrite: nothing to track
        else if (r.isNullAt(1)) Some(Group(rel))  // only null keys: statless, never skipped
        else Some(Group(rel, Some(c), r.getDouble(1), r.getDouble(2)))
    }
  }

  /** Append `df` as a new file group. */
  def append(df: DataFrame, base: String): Int = {
    val v = latestVersion(base) + 1
    commit(base, "append", writeGroup(df, base, v, 0).toSeq, Seq.empty)
  }

  /** Append `df` range-CLUSTERED on a numeric column into `nGroups` file
    * groups, each with min/max stats in the manifest — the write-side half
    * of data skipping: clustering makes group ranges narrow, stats make
    * them skippable. Boundaries come from `approxQuantile` (one pass,
    * driver gets `nGroups−1` doubles); each group is a filtered write, so
    * clustering costs `nGroups` scans here — a production writer does ONE
    * `repartitionByRange` job and collects per-file stats from the commit
    * protocol instead, same log contents.
    */
  def appendClustered(df: DataFrame, base: String, statsCol: String,
      nGroups: Int): Int = {
    val v = latestVersion(base) + 1
    val cuts = df.stat.approxQuantile(statsCol,
      (1 until nGroups).map(_.toDouble / nGroups).toArray, 0.001)
    val bounds = (None +: cuts.map(Option(_)).toSeq) :+ None
    val groups = bounds.sliding(2).zipWithIndex.flatMap {
      case (Seq(lo, hi), k) =>
        val c = col(statsCol).cast("double")
        val range = (lo.map(c >= _) ++ hi.map(c < _))
          .reduceOption(_ && _).getOrElse(lit(true))
        // null clustering keys satisfy NO range predicate — route them into
        // group 0 so the full snapshot keeps them (a range read never wants
        // them: NULL fails the residual filter whatever groups are opened)
        val pred = if (k == 0) range || c.isNull else range
        writeGroup(df.filter(pred), base, v, k, Some(statsCol))
    }.toSeq
    commit(base, "append_clustered", groups, Seq.empty)
  }

  /** Table state at `version` (defaults to latest). An empty live set needs a
    * schema to stand on, so callers pass the table schema source for that
    * edge; normal reads are a plain multi-path parquet scan.
    */
  def snapshot(spark: SparkSession, base: String, version: Int = Int.MaxValue): DataFrame = {
    val v = math.min(version, latestVersion(base))
    require(v >= 0, s"no committed version in $base")
    val paths = liveGroups(base, v).map(g => s"$base/${g.rel}")
    require(paths.nonEmpty, s"version $v of $base has no live data groups")
    spark.read.parquet(paths: _*)
  }

  /** Range read with manifest-level data skipping: only file groups whose
    * [min,max] stats intersect [lo,hi] are opened at all (groups without
    * stats are conservatively read); the residual filter then applies
    * exactly. The skipping is invisible in the result — same rows as
    * filtering the full snapshot — which is what makes it safe; the spec
    * pins that the group count actually shrinks. This is the manifest tier
    * of the pruning stack (above it: parquet row-group min/max, below it:
    * partition directories).
    */
  def snapshotRange(spark: SparkSession, base: String, statsCol: String,
      lo: Double, hi: Double, version: Int = Int.MaxValue): DataFrame = {
    val c = col(statsCol).cast("double")
    prunedPaths(base, statsCol, lo, hi, version) match {
      case Seq() => // every live group skipped: empty result, schema from v
        snapshot(spark, base, version).filter(lit(false))
      case paths => spark.read.parquet(paths: _*).filter(c >= lo && c <= hi)
    }
  }

  /** The group paths [[snapshotRange]] would open — exposed so the spec can
    * pin the skip count without reaching into private state.
    */
  private[io] def prunedPaths(base: String, statsCol: String, lo: Double,
      hi: Double, version: Int = Int.MaxValue): Seq[String] = {
    val v = math.min(version, latestVersion(base))
    require(v >= 0, s"no committed version in $base")
    liveGroups(base, v).filter { g =>
      g.statsCol match {
        case Some(c) if c == statsCol => g.max >= lo && g.min <= hi
        case _ => true   // no stats for this column: cannot skip safely
      }
    }.map(g => s"$base/${g.rel}")
  }

  /** Copy-on-write DELETE WHERE: rewrite ONLY the file groups that contain
    * matching rows; groups the predicate never touches carry over by
    * reference (the file-pruning property VersionedTableSpec pins). One
    * Spark job prunes (matching files → owning groups), one rewrite job per
    * touched group, one manifest.
    */
  def deleteWhere(spark: SparkSession, base: String, predicate: Column): Int = {
    val v = latestVersion(base)
    require(v >= 0, s"no committed version in $base")
    val live = liveGroups(base, v)
    val touchedFiles = snapshot(spark, base).filter(predicate)
      .select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
    val touched = live.filter(g => touchedFiles.exists(_.contains(s"/${g.rel}/")))
    if (touched.isEmpty) commit(base, "delete_noop", Seq.empty, Seq.empty)
    else {
      val next = v + 1
      val rewritten = touched.zipWithIndex.flatMap { case (g, k) =>
        // a clustered group keeps its stats column: the rewrite re-collects
        // min/max over the kept rows so skipping stays tight after deletes
        writeGroup(spark.read.parquet(s"$base/${g.rel}").filter(!predicate),
          base, next, k, g.statsCol)
      }
      commit(base, "delete", rewritten, touched.map(_.rel))
    }
  }

  /** Versioned MERGE INTO — [[graft.ops.Merge]]'s row semantics committed
    * through the copy-on-write protocol: groups containing MATCHED target
    * keys are rewritten through `mergeInto` (update/delete clauses, inserts
    * suppressed — an existing group never absorbs new rows), not-matched
    * source rows land as ONE fresh append group, untouched groups carry
    * over by reference, and the whole thing is a single atomic commit.
    * Each rewrite joins one group against the slice of the source matching
    * ITS keys, so rewrite cost scales with touched data; the cardinality
    * guard inside `mergeInto` rides along unchanged (an ambiguous source
    * fails the commit before any manifest lands — data groups written by
    * the failed attempt are unreferenced garbage for vacuum, exactly the
    * crashed-writer story).
    */
  def merge(spark: SparkSession, base: String, source: DataFrame,
      keys: Seq[String],
      updateWhen: Option[Column] = None,
      updateSet: Map[String, Column] = Map.empty,
      deleteWhen: Option[Column] = None,
      insertWhen: Option[Column] = None): Int = {
    val v = latestVersion(base)
    require(v >= 0, s"no committed version in $base")
    val live = liveGroups(base, v)
    val snap = snapshot(spark, base)
    val keyCols = keys.map(col)

    // input_file_name() must bind to the scan BEFORE the join — after it the
    // expression has two sources and analysis rejects it
    val touchedFiles = snap.withColumn("__graft_file", input_file_name())
      .join(source.select(keyCols: _*).distinct(), keys)
      .select(col("__graft_file")).distinct().collect().map(_.getString(0))
    val touched = live.filter(g => touchedFiles.exists(_.contains(s"/${g.rel}/")))

    val next = v + 1
    val rewritten = touched.zipWithIndex.flatMap { case (g, k) =>
      val groupDf = spark.read.parquet(s"$base/${g.rel}")
      val groupSource = source.join(groupDf.select(keyCols: _*).distinct(), keys, "left_semi")
      writeGroup(
        graft.ops.Merge.mergeInto(groupDf, groupSource, keys,
          updateWhen = updateWhen, updateSet = updateSet,
          deleteWhen = deleteWhen, insertWhen = Some(lit(false))),
        base, next, k, g.statsCol)
    }
    // not-matched source rows, projected to the target schema, as one group;
    // the source is aliased `s` so insertWhen can use the same `s.<col>`
    // vocabulary as the matched-clause conditions
    val inserts = source.as("s")
      .join(snap.select(keyCols: _*).distinct(), keys, "left_anti")
      .filter(insertWhen.getOrElse(lit(true)))
    val targetCols = snap.columns.toSeq
    val insertDf = inserts.select(targetCols.map(c =>
      (if (inserts.columns.contains(c)) col(c)
       else lit(null).cast(snap.schema(c).dataType)).as(c)): _*)
    val insertGroup =
      if (insertDf.isEmpty) None else writeGroup(insertDf, base, next, touched.size)

    commit(base, "merge", rewritten ++ insertGroup.toSeq, touched.map(_.rel))
  }

  /** Versions with their actions and file-group deltas — the `DESCRIBE
    * HISTORY` surface. Manifest-sized, computed driver-side like the log
    * itself, returned as a DataFrame for uniformity.
    */
  def history(spark: SparkSession, base: String): DataFrame = {
    import spark.implicits._
    manifestFiles(base).map(readManifest).zipWithIndex.map { case (m, v) =>
      (v.toLong, m.action, m.add.size.toLong, m.remove.size.toLong)
    }.toDF("version", "action", "n_added_groups", "n_removed_groups")
  }

  /** Row-level change feed between two versions: `insert` rows present at
    * `toV` but not `fromV`, `delete` rows present at `fromV` but not `toV`
    * (bag semantics via EXCEPT ALL, so duplicates count). Rows untouched by
    * the interval's commits never appear — copy-on-write rewrites carry
    * them across unchanged and the except cancels them. At 100 TB the
    * manifest diff first restricts both sides to groups ADDED or REMOVED in
    * the interval (file-level pruning); the row-level except here is that
    * same computation with the pruning left to the format's row-group
    * statistics.
    */
  def changesBetween(spark: SparkSession, base: String, fromV: Int, toV: Int): DataFrame = {
    val before = snapshot(spark, base, fromV)
    val after = snapshot(spark, base, toV)
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(before.exceptAll(after).withColumn("_change_type", lit("delete")))
  }
}
