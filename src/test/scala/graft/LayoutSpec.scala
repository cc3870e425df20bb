package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.pipeline.Layout

/** Z-order layout: Morton interleave correctness, probe ≡ plain
  * filter (layout moves bytes, never rows), REAL partition pruning on
  * the zp prefix, and the bounded-enumeration full-scan fallback.
  */
class LayoutSpec extends GraftSuite {
  import spark.implicits._

  test("zValue interleaves bucket bits (dimension 0 lowest)") {
    // boundaries 1,2,3 → buckets 0..3 for values 0..3
    val b = Array(1.0, 2.0, 3.0)
    val df = Seq((0, 0), (3, 0), (0, 3), (3, 3), (1, 2)).toDF("x", "y")
    val got = df.select(Layout.zValue(Seq(col("x"), col("y")), Seq(b, b), bits = 2))
      .as[Long].collect().toSeq
    // interleave(x=01,y=10) = y1 x1 y0 x0 = 1 0 0 1 = 9
    assert(got == Seq(0L, 5L, 10L, 15L, 9L))
  }

  test("probe result equals a plain filter, with REAL partition pruning") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val cols = Seq("l_partkey", "l_suppkey")
    val lay = Layout.ZLayout(cols, Layout.boundaries(li, cols, 4), bits = 4, prefixBits = 4)
    val path = graft.queries.SessionPublish.tempDir("layout-spec")
    Layout.writeZOrdered(li, path, lay)

    val ranges = Seq((100.0, 300.0), (10.0, 30.0))
    val probed = Layout.probe(spark, path, lay, ranges)
    val direct = li.filter(col("l_partkey").between(100, 300) &&
      col("l_suppkey").between(10, 30))
    assert(probed.select(col("l_orderkey"), col("l_linenumber")).collect().map(_.toSeq).toSet ==
      direct.select(col("l_orderkey"), col("l_linenumber")).collect().map(_.toSeq).toSet)

    // pruning is structural: the scan selects a strict subset of the
    // zp directories
    val scans = probed.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val total = spark.read.parquet(path).select(col("zp")).distinct().count()
    val read = scans.map(_.selectedPartitions.partitionCount).sum
    assert(read < total, s"probe must prune zp dirs: read $read of $total")
    val zps = Layout.probePrefixes(lay, ranges).get
    assert(read <= zps.size, "reads at most the enumerated prefixes")
  }

  test("rectangle spanning all buckets degenerates to an unpruned scan") {
    val lay = Layout.ZLayout(Seq("x", "y"),
      Seq(Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)), bits = 2, prefixBits = 2)
    assert(Layout.probePrefixes(lay, Seq((0.0, 9.0), (0.0, 9.0)), maxCombos = 8).isEmpty)
    // within budget: the full enumeration is every prefix
    val all = Layout.probePrefixes(lay, Seq((0.0, 9.0), (0.0, 9.0)), maxCombos = 16).get
    assert(all == Seq(0L, 1L, 2L, 3L))
  }

  test("probePrefixes bucket arithmetic matches bucketOf") {
    val b = Array(10.0, 20.0, 30.0)
    val vals = Seq(5.0, 10.0, 15.0, 30.0, 99.0)
    val viaCol = vals.toDF("v")
      .select(Layout.bucketOf(col("v"), b)).as[Int].collect().toSeq
    val viaDriver = vals.map(x => b.count(x >= _))
    assert(viaCol == viaDriver)
  }
}
