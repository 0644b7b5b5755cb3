package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog sketch (Flajolet et al. 2007) for
  * approximate COUNT DISTINCT at 100 TB: exact distinct needs a full
  * shuffle of every key; the HLL register table is a CONSTANT-size
  * (m rows) mergeable aggregate — partial max(rho) per register
  * map-side, one tiny shuffle, and sketches of different partitions /
  * days / tables merge by register-wise max without rescanning.
  *
  * Portability contract (what makes the register table oracle-checkable
  * bit-for-bit, unlike the engine-private hash in
  * `approx_count_distinct`): the hash is md5 (15 hex chars = 60 bits —
  * 16 would overflow signed BIGINT in the oracle's parse), register =
  * low `p` bits, and rho = leading-zero count of the remaining bit field
  * + 1 computed as a GENERATED COMPARISON LADDER (x ≥ 2^(w−1) → 1, …) —
  * pure integer compares, no log2/clz dependence on any engine builtin.
  *
  * The cardinality ESTIMATE involves the bias constant α and (in the
  * small range) a logarithm — transcendentals whose last ulp is
  * libm-dependent — so [[registers]] returns the integer sketch (the
  * oracle-checkable part) and [[estimate]] folds it to a Double on the
  * driver (spec-checked against exact distinct within HLL's theoretical
  * error; m=256 → σ ≈ 6.5%).
  */
object Hll {

  /** Number of registers (2^p). p=8 keeps the ladder and the sketch
    * tiny while giving ~6.5% standard error — callers needing tighter
    * error raise p. */
  val DefaultP = 8

  /** (register, rho_max) rows — registers never observed are absent
    * (their rho is implicitly 0). `keys` must be one column. */
  def registers(df: DataFrame, key: Column, p: Int = DefaultP): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val bits = 60 // 15 md5 hex chars — parses as a positive BIGINT
    val w = bits - p // width of the rho field
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long")
    val reg = pmod(h, lit(1L << p))
    val field = shiftright(h, p) // w bits remain
    // leading-zeros-plus-one as a comparison ladder: rho = k iff the
    // first set bit (from the MSB of the w-bit field) is at position k
    // fold k = w..1 so the OUTERMOST when tests the highest threshold
    // (2^(w-1) → rho 1) first — the CASE ladder order the oracle mirrors
    val rho = (w to 1 by -1).foldLeft(lit(w + 1)) { (acc, k) =>
      when(field >= lit(1L << (w - k)), lit(k)).otherwise(acc)
    }
    df.select(reg.as("register"), rho.as("rho"))
      .groupBy("register").agg(max("rho").as("rho_max"))
  }

  /** The same ladder as SQL text, for oracle construction. */
  def rhoLadderSql(fieldExpr: String, w: Int): String =
    (1 to w).map(k => s"WHEN $fieldExpr >= ${1L << (w - k)} THEN $k")
      .mkString("CASE ", " ", s" ELSE ${w + 1} END")

  /** Raw HLL estimate from a collected register table (driver-side fold;
    * includes the standard linear-counting small-range correction). */
  def estimate(regs: Seq[(Long, Long)], p: Int = DefaultP): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val byReg = regs.toMap
    val z = (0 until m).map(r =>
      math.pow(2.0, -byReg.getOrElse(r.toLong, 0L).toDouble)).sum
    val raw = alpha * m * m / z
    val zeros = m - regs.size
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
