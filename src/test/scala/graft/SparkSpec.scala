package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs; mirrors the driver harness confs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    // fresh warehouse per JVM: the in-memory catalog forgets tables across
    // sessions but their directories would otherwise persist and collide
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()

  /** All messages down a throwable's cause chain — the shared walker
    * for loud-throw specs (Spark wraps kernel exceptions in several
    * layers of SparkException, so asserting on the top message alone
    * is flaky). */
  def causeMessages(t: Throwable): Seq[String] =
    if (t == null) Seq.empty
    else Option(t.getMessage).toSeq ++ causeMessages(t.getCause)

  override def afterAll(): Unit = {
    // keep the session alive across suites (single forked JVM)
    super.afterAll()
  }
}
