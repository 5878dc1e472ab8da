package graft.ledger

import java.sql.{Connection, DriverManager}

import scala.collection.mutable.ArrayBuffer

/** Staging-table ledger — the reference's idempotency / crash-recovery state
  * machine (`/root/reference/src/staging/staging.py:8-113`,
  * `/root/reference/src/main_1.py:45-86,218-247,657-676`; README's signature
  * feature, `README.md:147-153`).
  *
  * One row per input file: `(file_name, file_location, created_date, status)`,
  * `status ∈ {START, COMPLETED}`. The state machine:
  *
  *  - C5: every file entering a run is inserted as START *before* any data
  *    write, so a crash leaves evidence.
  *  - C6: after the run's writes all succeed, the batch flips to COMPLETED.
  *  - C1: a file present in the input AND in the ledger as START means the
  *    previous run died mid-flight — the pipeline refuses to start (manual
  *    intervention, exactly the reference's policy at `main_1.py:76-86`).
  *  - C4: a file already COMPLETED is skipped (and archived), so re-delivering
  *    yesterday's batch cannot double-count revenue.
  */
trait Ledger {
  /** C5: record files as in-flight. */
  def insertStart(fileNames: Seq[String], location: String, createdDate: java.time.LocalDate): Unit
  /** C6: flip files to COMPLETED. */
  def markCompleted(fileNames: Seq[String]): Unit
  /** C1: which of these files are recorded as in-flight (START)? */
  def inflight(fileNames: Seq[String]): Seq[String]
  /** C4: which of these files are recorded as COMPLETED? */
  def completed(fileNames: Seq[String]): Seq[String]
}

/** JDBC implementation. All SQL is parameterized PreparedStatements — the
  * reference interpolates file names straight into SQL strings
  * (`staging.py:42`, `main_1.py:67-72`), which both breaks on quotes in file
  * names and is an injection hazard.
  *
  * The ledger is driver-side control-plane state (a few rows per file per day),
  * so plain JDBC — not a Spark job — is the right tool; Spark enters only for
  * the data path.
  */
final class JdbcLedger(conn: Connection, table: String = "staging_table") extends Ledger {

  locally {
    val meta = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
    val exists = meta.next()
    meta.close()
    if (!exists) {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE $table (
           |  file_name VARCHAR(512) NOT NULL,
           |  file_location VARCHAR(1024),
           |  created_date DATE,
           |  status VARCHAR(16) NOT NULL)""".stripMargin)
      finally st.close()
    }
  }

  override def insertStart(fileNames: Seq[String], location: String,
      createdDate: java.time.LocalDate): Unit = {
    val ps = conn.prepareStatement(
      s"INSERT INTO $table (file_name, file_location, created_date, status) VALUES (?, ?, ?, 'START')")
    try {
      fileNames.foreach { f =>
        ps.setString(1, f)
        ps.setString(2, location)
        ps.setDate(3, java.sql.Date.valueOf(createdDate))
        ps.addBatch()
      }
      ps.executeBatch()
    } finally ps.close()
  }

  override def markCompleted(fileNames: Seq[String]): Unit = {
    val ps = conn.prepareStatement(
      s"UPDATE $table SET status = 'COMPLETED' WHERE file_name = ? AND status = 'START'")
    try {
      fileNames.foreach { f => ps.setString(1, f); ps.addBatch() }
      ps.executeBatch()
    } finally ps.close()
  }

  private def withStatus(fileNames: Seq[String], status: String): Seq[String] = {
    if (fileNames.isEmpty) return Seq.empty
    val found = ArrayBuffer.empty[String]
    // parameterized IN-list, chunked to keep statements bounded
    fileNames.distinct.grouped(100).foreach { chunk =>
      val marks = chunk.map(_ => "?").mkString(", ")
      val ps = conn.prepareStatement(
        s"SELECT file_name FROM $table WHERE status = ? AND file_name IN ($marks)")
      try {
        ps.setString(1, status)
        chunk.zipWithIndex.foreach { case (f, i) => ps.setString(i + 2, f) }
        val rs = ps.executeQuery()
        while (rs.next()) found += rs.getString(1)
        rs.close()
      } finally ps.close()
    }
    fileNames.filter(found.toSet)
  }

  override def inflight(fileNames: Seq[String]): Seq[String] = withStatus(fileNames, "START")
  override def completed(fileNames: Seq[String]): Seq[String] = withStatus(fileNames, "COMPLETED")

  def close(): Unit = conn.close()
}

object JdbcLedger {
  /** Embedded-Derby convenience: a local, durable ledger database. */
  def derby(dbDir: String, table: String = "staging_table"): JdbcLedger = {
    val conn = DriverManager.getConnection(s"jdbc:derby:$dbDir;create=true")
    new JdbcLedger(conn, table)
  }

  /** Cleanly shut down one embedded Derby database. Required before deleting
    * a db directory that may have been booted in this JVM: the engine keeps
    * booted instances alive, so a delete-then-recreate at the same path
    * otherwise resurrects the old database's state over the fresh files.
    * Derby signals successful shutdown via SQLException (SQLState 08006);
    * "database not booted" is equally fine — both are swallowed.
    */
  def shutdownDerby(dbDir: String): Unit =
    try { DriverManager.getConnection(s"jdbc:derby:$dbDir;shutdown=true"); () }
    catch { case _: java.sql.SQLException => () }
}

/** No idempotency at all — the reference's earlier orchestrator generation
  * (`/root/reference/src/main_0.py`: same flow, no staging-table checks).
  * Running [[graft.pipeline.SalesEtlJob]] with this ledger reproduces that
  * behavior: every delivered file processes every time.
  */
object NullLedger extends Ledger {
  override def insertStart(fileNames: Seq[String], location: String,
      createdDate: java.time.LocalDate): Unit = ()
  override def markCompleted(fileNames: Seq[String]): Unit = ()
  override def inflight(fileNames: Seq[String]): Seq[String] = Seq.empty
  override def completed(fileNames: Seq[String]): Seq[String] = Seq.empty
}
