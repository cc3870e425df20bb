package graft

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

import graft.core.GraphBuilder
import graft.model.PropertyValue
import graft.model.PropertyValue._
import graft.operators.Traversal
import graft.operators.Traversal._

/** Property-based value-codec round-trips, mirroring the reference's
  * QuickCheck suites (STMGraph TypesSpec.hs:76-93, LowLevelDB
  * ConversionsSpec.hs:13-44): arbitrary typed property values written
  * through the builder come back identical through a traversal.
  * Plain ScalaCheck generators with a fixed seed (deterministic).
  */
class CodecSpec extends GraftSuite {

  private val genValue: Gen[PropertyValue] = Gen.oneOf(
    Gen.asciiPrintableStr.map(PVText(_)),
    // beyond-64-bit integers within the documented DECIMAL(38,0) bound
    Gen.chooseNum(-1e18.toLong, 1e18.toLong)
      .flatMap(a => Gen.chooseNum(0L, 1000L).map(b => PVInteger(BigInt(a) * b))),
    Gen.listOf(Arbitrary.arbitrary[Byte]).map(bs => PVBinary(bs.toArray)),
    Gen.oneOf(
      Gen.const(PVJson("{\"a\": 1}")),
      Gen.asciiPrintableStr.map(s => PVJson("\"" + s.replace("\\", "").replace("\"", "") + "\""))))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def eqv(a: PropertyValue, b: PropertyValue): Boolean = (a, b) match {
    case (PVBinary(x), PVBinary(y)) => java.util.Arrays.equals(x, y)
    case (x, y)                     => x == y
  }

  test("PropertyValue round-trips through snapshot + Values traversal") {
    // one graph with 30 nodes, each carrying a generated value list —
    // a single Spark job instead of 30
    val cases: Seq[List[PropertyValue]] =
      (1 to 30).map(i => sample(Gen.nonEmptyListOf(genValue), 1000L + i).take(5))
    val b = new GraphBuilder
    val ids = cases.map(vs => b.addNode("t", Map("p" -> vs)))
    val g = b.snapshot(spark)
    val rows = Traversal.run(g, Composed(Seq(Ns, Values(Seq("p")))))
      .df.collect().groupBy(_.getLong(0))
    ids.zip(cases).foreach { case (id, vs) =>
      val got = rows(id).sortBy(_.getInt(3)).map { r =>
        (r.getByte(r.fieldIndex("vType")): Int) match {
          case 0 => PVText(r.getString(r.fieldIndex("vText")))
          case 1 => PVInteger(BigInt(r.getDecimal(r.fieldIndex("vInt")).toBigInteger))
          case 2 => PVBinary(r.getAs[Array[Byte]]("vBin"))
          case 3 => PVJson(r.getString(r.fieldIndex("vJson")))
        }
      }
      assert(got.length == vs.length, s"node $id arity")
      got.zip(vs).foreach { case (g0, v) => assert(eqv(g0, v), s"node $id: expected $v got $g0") }
    }
  }

  test("integer bound: values beyond DECIMAL(38,0) are rejected at build") {
    intercept[IllegalArgumentException] {
      PVInteger(BigInt(10).pow(38))
    }
    PVInteger(BigInt(10).pow(38) - 1) // max representable: fine
  }
}
