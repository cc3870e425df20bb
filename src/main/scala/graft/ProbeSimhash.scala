package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Scale probe for SimHash Hamming blocking (SCALE.md evidence, not a
  * driver contract): for a corpus dir, prints — at the FIXED 32-bit
  * width and at the auto-selected width — the candidate-pair volume
  * of the block equi-join (pre-verify), the surviving pairs, and the
  * wall time. Usage: `runMain graft.ProbeSimhash <sfDir>`.
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val spark = graft.core.Graft.session("graft-probe-simhash",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").localCheckpoint()
    val n = docs.count()
    val auto = Dedup.autoSimhashBits(n)
    def candidates(bits: Int): Long = {
      val blocks = 4
      val width = bits / blocks
      val mask = (1L << width) - 1
      val sh = Dedup.simhashByDoc(docs, "doc_id", col("text"), bits)
      val keyed = sh.select(col("id"),
        explode(array((0 until blocks).map(b =>
          struct(lit(b).as("blk"),
            shiftright(col("simhash"), b * width).bitwiseAND(mask).as("key"))): _*)).as("bk"))
        .select(col("bk.blk").as("blk"), col("bk.key").as("key"), col("id"))
      keyed.groupBy(col("blk"), col("key")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1))).first().getLong(0) / 2
    }
    for (bits <- Seq(32, auto).distinct) {
      val t0 = System.nanoTime()
      val pairs = Dedup.simhashHammingPairs(docs, "doc_id", col("text"),
        maxHamming = 3, bits = bits).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] n=$n%d bits=$bits%d (auto=$auto%d) candidates=${candidates(bits)}%d " +
        f"pairs=$pairs%d time=$sec%.2f s")
    }
    spark.stop()
  }
}
