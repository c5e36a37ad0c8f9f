package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve keys for multi-dimensional data layout.
  *
  * At 100 TB the scan cost of a two-predicate query is set by FILE
  * SKIPPING: parquet row-group min/max stats prune only along the sort
  * key. Sorting by `interleave16(a, b)` makes row-group ranges narrow in
  * BOTH dimensions at once (each Z-curve segment is a small rectangle),
  * so predicates on either column skip most files — the layout trick
  * behind Delta/Iceberg OPTIMIZE ZORDER, expressed as a plain column:
  * `df.repartitionByRange(col("z")).sortWithinPartitions("z").write...`.
  *
  * Pure integer shift/mask arithmetic — bit-identical on any engine, so
  * the key itself is oracle-checkable (ZOrderSpec also proves the
  * locality property: deinterleave(interleave(x,y)) == (x,y)).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (0,2,4,...30). */
  private[operators] def spread(c: Column): Column = {
    val v0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit dimensions (x in even bits, y odd). */
  def interleave16(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Collapse the even bits of `c` back into a 16-bit value. */
  private[operators] def collapse(c: Column): Column = {
    val v0 = c.cast("long").bitwiseAND(lit(0x55555555L))
    val v1 = (v0.bitwiseOR(shiftright(v0, 1))).bitwiseAND(lit(0x33333333L))
    val v2 = (v1.bitwiseOR(shiftright(v1, 2))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftright(v2, 4))).bitwiseAND(lit(0x00FF00FFL))
    (v3.bitwiseOR(shiftright(v3, 8))).bitwiseAND(lit(0x0000FFFFL))
  }

  /** Inverse of [[interleave16]]: (x, y). */
  def deinterleave16(z: Column): (Column, Column) =
    (collapse(z), collapse(shiftright(z, 1)))

  /** The same spread chain as a DuckDB SQL fragment (oracle mirror). */
  def spreadSql(v: String): String = {
    val m1 = "16711935"   // 0x00FF00FF
    val m2 = "252645135"  // 0x0F0F0F0F
    val m3 = "858993459"  // 0x33333333
    val m4 = "1431655765" // 0x55555555
    val s0 = s"(($v) & 65535)"
    val s1 = s"(($s0 | ($s0 << 8)) & $m1)"
    val s2 = s"(($s1 | ($s1 << 4)) & $m2)"
    val s3 = s"(($s2 | ($s2 << 2)) & $m3)"
    s"(($s3 | ($s3 << 1)) & $m4)"
  }

  def interleave16Sql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}
