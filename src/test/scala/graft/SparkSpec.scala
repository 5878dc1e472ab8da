package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (getOrCreate → one context per
  * forked test JVM), built by the same [[graft.core.SessionFactory]] as the
  * Verify/Bench entry points so tests and the gate share one configuration.
  */
object SparkSpec {
  lazy val spark: SparkSession = graft.core.SessionFactory.local(4, "graft-test")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark

  def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }
}
