package graft.queries

/** Centroid/codebook-literal SQL rendering shared by the DEFERRED ANN
  * oracles (IVF probes, PQ/ADC): the Spark paths assign cells and
  * score with exact double arithmetic in a fixed order, and these
  * helpers emit the SAME arithmetic in the SAME order as DuckDB SQL
  * over literal values, so the doubles — and hence argmins, probe
  * lists, and integer-micro scores — agree bit-for-bit.
  *
  * Every constant goes through a string cast ('…'::DOUBLE): DuckDB
  * parses bare decimal literals as DECIMAL, and only the string form
  * guarantees the exact nearest-double round-trip of Double.toString.
  */
private[queries] object AnnOracleSql {

  def dlit(x: Double): String = s"'$x'::DOUBLE"

  /** Same fold as NearestCell's cached |c|²: left-to-right over dims. */
  def c2Of(c: Array[Float]): Double =
    c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)

  /** `|c|² - 2 v·c` with NearestCell's exact arithmetic: dot terms
    * (centroid * element) summed left-to-right in doubles. `off` shifts
    * the vector index — subspace s of a PQ code reads
    * v[off+1 .. off+dsub] (0 for whole-vector IVF cells).
    */
  def cellDistSql(c: Array[Float], v: String, off: Int = 0): String = {
    val dot = c.indices.map(d => s"${dlit(c(d).toDouble)} * $v[${off + d + 1}]").mkString(" + ")
    s"${dlit(c2Of(c))} - 2.0 * ($dot)"
  }

  /** First-wins argmin id via lexicographic sort of [dist, id] pairs —
    * NearestCell's strict-< scan keeps the lower id on ties, exactly
    * what (dist, id) ascending yields. Works for IVF cells (off=0,
    * whole vector) and PQ codes (off = s*dsub, one subspace).
    */
  def argminSql(cents: Array[Array[Float]], v: String, off: Int = 0): String = {
    val entries = cents.zipWithIndex
      .map { case (c, i) => s"[${cellDistSql(c, v, off)}, CAST($i AS DOUBLE)]" }
      .mkString(", ")
    s"CAST(list_sort([$entries])[1][2] AS INT)"
  }

  /** `np` probe cells ascending by the given per-cell distance SQL
    * (ties to the lower cell id), as an INT list.
    */
  def probeListSql(cents: Array[Array[Float]], np: Int,
      distSql: (Array[Float], String) => String, v: String): String = {
    val entries = cents.zipWithIndex
      .map { case (c, i) => s"[${distSql(c, v)}, CAST($i AS DOUBLE)]" }
      .mkString(", ")
    s"list_transform(list_sort([$entries])[1:$np], x -> CAST(x[2] AS INT))"
  }

  /** Squared Euclidean distance with [[graft.pipeline.Ivf.probeOrder]]'s
    * exact arithmetic: (v_i - c_i)² accumulated left-to-right.
    */
  def euclidDistSql(c: Array[Float], v: String): String =
    c.indices.map { d =>
      s"($v[${d + 1}] - ${dlit(c(d).toDouble)}) * ($v[${d + 1}] - ${dlit(c(d).toDouble)})"
    }.mkString(" + ")
}
