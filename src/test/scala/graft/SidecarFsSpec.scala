package graft

import org.apache.spark.sql.functions._

import graft.core.Sidecar
import graft.pipeline.Ivf

/** A minimal non-`file:` Hadoop filesystem: `testdfs://` resolves
  * through the Hadoop FileSystem registry (conf key
  * `fs.testdfs.impl`) onto local storage. Every operation goes
  * through the Hadoop API — java.nio on a `testdfs:///x` string would
  * treat it as a relative local path named "testdfs:" and fail — so a
  * green run proves the sidecar/marker/manifest I/O works on any
  * registered scheme (hdfs://, s3a://), which is exactly what the
  * local-filesystem-only java.nio calls it replaced could not.
  */
class TestDfsFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("testdfs:///")
  override def getScheme: String = "testdfs"
}

class SidecarFsSpec extends GraftSuite {

  private lazy val root: String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.testdfs.impl", classOf[TestDfsFileSystem].getName)
    s"testdfs://${java.nio.file.Files.createTempDirectory("sidecar-dfs")}"
  }

  test("sidecar read/write/list/promote work on a non-file: scheme") {
    val dir = s"$root/meta"
    assert(!Sidecar.exists(s"$dir/a.properties"))
    Sidecar.writeProps(s"$dir/a.properties", Seq("planes" -> "13", "dim" -> "64"))
    assert(Sidecar.exists(s"$dir/a.properties"))
    assert(Sidecar.readProps(s"$dir/a.properties")
      .contains(Map("planes" -> "13", "dim" -> "64")))

    // atomic overwrite replaces content; no temp residue remains
    Sidecar.writeString(s"$dir/a.properties", "k=v\n")
    assert(Sidecar.readProps(s"$dir/a.properties").contains(Map("k" -> "v")))
    assert(Sidecar.listNames(dir) == Seq("a.properties"))

    // promoteTree moves partition files and drops the staging dir
    Sidecar.writeString(s"$dir/stage/cell=3/part-0.parquet", "x")
    Sidecar.writeString(s"$dir/stage/_SUCCESS", "")
    Sidecar.promoteTree(s"$dir/stage", s"$dir/live")
    assert(Sidecar.readString(s"$dir/live/cell=3/part-0.parquet").contains("x"))
    assert(!Sidecar.exists(s"$dir/stage"))

    Sidecar.delete(dir, recursive = true)
    assert(!Sidecar.exists(dir))
  }

  test("a concurrent reader never observes a missing sidecar during republish") {
    val p = s"$root/repub/meta.properties"
    Sidecar.writeProps(p, Seq("v" -> "0"))
    val failures = new java.util.concurrent.atomic.AtomicInteger
    val reads = new java.util.concurrent.atomic.AtomicInteger
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) {
        if (Sidecar.readPropsExpected(p).isEmpty) failures.incrementAndGet()
        reads.incrementAndGet(): Unit
      }
    })
    reader.start()
    try (1 to 200).foreach(i => Sidecar.writeProps(p, Seq("v" -> i.toString)))
    finally { stop = true; reader.join() }
    assert(failures.get == 0,
      s"reader observed a missing sidecar mid-republish (${failures.get}/${reads.get} reads)")
    assert(reads.get > 0, "the reader must actually have raced the republisher")
    assert(Sidecar.readProps(p).contains(Map("v" -> "200")))
  }

  test("promoteTree refuses a staging dir holding top-level data files; committer files stay a no-op") {
    val dir = s"$root/strays"
    Sidecar.writeString(s"$dir/stage/part-0.parquet", "x")
    intercept[IllegalArgumentException] {
      Sidecar.promoteTree(s"$dir/stage", s"$dir/live")
    }
    assert(Sidecar.readString(s"$dir/stage/part-0.parquet").contains("x"),
      "a refused promote must leave the staging content untouched")

    // an empty batch's staging (committer artifacts only) promotes to
    // nothing and is dropped — the legitimate no-op
    val dir2 = s"$root/strays2"
    Sidecar.writeString(s"$dir2/stage/_SUCCESS", "")
    Sidecar.promoteTree(s"$dir2/stage", s"$dir2/live")
    assert(!Sidecar.exists(s"$dir2/stage"))
  }

  test("an IVF layout publishes, guards, and appends on a non-file: scheme") {
    val emb = graft.sources.Tables(spark, sf0001).embeddings
    val base  = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val idx = Ivf.train(spark, base, "vec_id", "embedding", nlist = 8)
    val layout = s"$root/ivf-layout"

    Ivf.writePartitioned(base, "embedding", idx, layout)
    assert(Sidecar.exists(s"$layout/_ivf_meta.properties"),
      "publish must land the sidecar on the remote scheme")
    Ivf.appendPartitioned(batch, "embedding", idx, layout)
    assert(spark.read.parquet(layout).count() == emb.count(),
      "base + appended batch readable through the remote scheme")

    // the geometry guard still refuses a mismatched index remotely
    val other = Ivf.train(spark, base, "vec_id", "embedding", nlist = 4)
    intercept[IllegalArgumentException] {
      Ivf.appendPartitioned(batch, "embedding", other, layout)
    }
  }

  test("the snapshot manifest reads and writes on a non-file: scheme") {
    val dir = s"$root/manifest-snap"
    assert(graft.core.GraphSnapshot.readManifest(dir).isEmpty)
    Sidecar.writeString(s"$dir/_manifest.json", """{"n_nodes": 1}""")
    assert(graft.core.GraphSnapshot.readManifest(dir).contains("""{"n_nodes": 1}"""))
  }
}
