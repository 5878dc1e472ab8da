package graft.ledger

import org.scalatest.funsuite.AnyFunSuite

/** The START/COMPLETED state machine (C1, C4-C6;
  * `/root/reference/src/staging/staging.py:8-113`), including the idempotency
  * property: filtering an already-processed batch twice yields no new work.
  */
class LedgerSpec extends AnyFunSuite {

  private def freshLedger(): JdbcLedger = {
    val dir = java.nio.file.Files.createTempDirectory("ledger").toString
    JdbcLedger.derby(s"$dir/db")
  }

  test("insertStart marks files inflight; markCompleted flips them") {
    val ledger = freshLedger()
    val files = Seq("sales_1.csv", "sales_2.csv")
    ledger.insertStart(files, "/drop", java.time.LocalDate.of(2026, 1, 1))
    assert(ledger.inflight(files) == files)
    assert(ledger.completed(files).isEmpty)

    ledger.markCompleted(files)
    assert(ledger.inflight(files).isEmpty)
    assert(ledger.completed(files) == files)
  }

  test("idempotency: the completed filter is stable under repetition") {
    val ledger = freshLedger()
    val batch = Seq("a.csv", "b.csv", "c.csv")
    ledger.insertStart(batch, "/drop", java.time.LocalDate.of(2026, 1, 1))
    ledger.markCompleted(batch)

    val once = batch.filterNot(ledger.completed(batch).toSet)
    val twice = once.filterNot(ledger.completed(once).toSet)
    assert(once.isEmpty && twice.isEmpty) // no new work appears on re-filtering
  }

  test("unknown files are neither inflight nor completed") {
    val ledger = freshLedger()
    ledger.insertStart(Seq("known.csv"), "/drop", java.time.LocalDate.of(2026, 1, 1))
    assert(ledger.inflight(Seq("unknown.csv")).isEmpty)
    assert(ledger.completed(Seq("unknown.csv")).isEmpty)
  }

  test("file names with SQL metacharacters survive (parameterized statements)") {
    val ledger = freshLedger()
    val tricky = Seq("we'rd; DROP TABLE staging_table--.csv")
    ledger.insertStart(tricky, "/drop", java.time.LocalDate.of(2026, 1, 1))
    assert(ledger.inflight(tricky) == tricky)
    ledger.markCompleted(tricky)
    assert(ledger.completed(tricky) == tricky)
  }

  test("partial completion: only the completed subset is filtered") {
    val ledger = freshLedger()
    val batch = Seq("x.csv", "y.csv")
    ledger.insertStart(batch, "/drop", java.time.LocalDate.of(2026, 1, 1))
    ledger.markCompleted(Seq("x.csv"))
    assert(ledger.completed(batch) == Seq("x.csv"))
    assert(ledger.inflight(batch) == Seq("y.csv"))
  }
}
