package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch as a typed mergeable
  * [[Aggregator]] — the CONSTANT-state sibling of [[KmvDistinctAgg]]:
  * KMV's k-min state answers set algebra (overlap, q153) but its
  * estimate degrades as k shrinks; HLL's m=2^p byte registers give
  * ~1.04/√m relative error in 64 BYTES at p=6, the register-table
  * shape the batch column pipeline ([[graft.operators.TextCorpus
  * .hllDistinct]]) builds relationally. Same sketch, two execution
  * layers: the column version for corpus-scale jobs where registers
  * ARE rows; this Aggregator for per-group use where the sketch must
  * ride inside one aggregate buffer — bounded state per group is what
  * makes it legal under a watermarked STREAMING window (state per
  * open window = m bytes, vs `collect_set`'s unbounded distinct set).
  *
  * The register construction matches the column pipeline BIT-FOR-BIT
  * (same md5 60-bit input hash, bucket = h mod m, rank =
  * nlz(h >> p) − p − 3 computed so w = 0 lands on maxBits + 1), and
  * `finish` replays the exact IEEE sequence of the relational
  * estimator (alpha·m²·2^(maxBits+1) / Z with the V-zero
  * linear-counting branch) — so the same oracle SQL closed form
  * verifies both layers, and the parity is spec-asserted rather than
  * assumed.
  *
  * Flajolet et al. 2007 (AofA) for the estimator; Heule et al.
  * EDBT'13 for why production HLLs pin the small-range correction.
  */
class HllDistinctAgg(p: Int) extends Aggregator[Long, Array[Byte], Double] {
  require(p >= 4 && p <= 14, s"HLL precision $p outside [4,14]")
  private val m = 1 << p
  private val maxBits = 60 - p
  private val alpha = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }
  private val scaleF = math.pow(2.0, (maxBits + 1).toDouble)

  override def zero: Array[Byte] = new Array[Byte](m)

  private def rho(h: Long): Int = {
    val w = h >>> p
    // w < 2^(60-p); nlz(w) - (64 - 60 + p) + 1 == maxBits + 1 - bitlen(w),
    // and nlz(0) = 64 makes w = 0 land on maxBits + 1 with no branch
    java.lang.Long.numberOfLeadingZeros(w) - (4 + p) + 1
  }

  override def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
    val b = (h % m).toInt
    val r = rho(h)
    if (r > buf(b)) buf(b) = r.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Double = {
    var zScaled = 0L
    var vZero = 0L
    var i = 0
    while (i < m) {
      val r = buf(i)
      if (r == 0) vZero += 1
      zScaled += (1L << (maxBits + 1 - r))
      i += 1
    }
    // identical IEEE sequence to the relational estimator (and the
    // oracle SQL): alpha * m * m * 2^(maxBits+1) / Zs, left-assoc
    val estRaw = alpha * m.toDouble * m.toDouble * scaleF / zScaled.toDouble
    if (estRaw <= 2.5 * m && vZero > 0)
      m.toDouble * math.log(m.toDouble / vZero.toDouble)
    else estRaw
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
