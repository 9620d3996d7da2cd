package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (getOrCreate ⇒ one JVM-wide session
  * across suites; small core count keeps per-test scheduling cheap). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Graft.session("graft-test", cpus = 4)

  def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  /** Sorted (by toString) rows — order-insensitive comparison. */
  def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
}
