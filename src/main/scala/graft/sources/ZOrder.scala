package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout — the
  * clustering key behind Delta/Iceberg `OPTIMIZE ZORDER BY`: rows sorted
  * by the bit-interleave of two bucketized dimensions land near each
  * other when they are close in EITHER dimension, so min/max file stats
  * prune scans filtered on either column (a plain sort only prunes its
  * leading column).
  *
  * Pure scan-side bit math (shift/and/or on BIGINT — codegen'd, exact,
  * identical in any engine), intended as the key of a
  * `repartitionByRange(zorder)` at write time: the range exchange is the
  * one shuffle a layout rewrite needs, and the z-key makes that shuffle
  * place both dimensions' neighborhoods together.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (Morton
    * part1by1 via the standard magic-number dilation). */
  def part1by1(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = (m0.bitwiseOR(shiftleft(m0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val m2 = (m1.bitwiseOR(shiftleft(m1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = (m2.bitwiseOR(shiftleft(m2, 2))).bitwiseAND(lit(0x33333333L))
    (m3.bitwiseOR(shiftleft(m3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions (x in even bits, y in
    * odd bits). Inputs are masked to 16 bits. */
  def morton2(x: Column, y: Column): Column =
    part1by1(x).bitwiseOR(shiftleft(part1by1(y), 1))
}
