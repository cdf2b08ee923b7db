package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-stable rounding for oracle-compared outputs. */
object Rounding {

  /** Boundary-stable 4-decimal rounding for AVERAGES (sum/count
    * results). Plain ROUND diverges across engines in two ways:
    * (1) averages of non-integer doubles — Spark's partial-agg
    * summation and DuckDB's sequential fold differ by 1 ulp exactly
    * when the true value sits on a .00005 boundary (frequent for
    * 2-decimal inputs averaged over even counts: 307.03/8 =
    * 38.378750); (2) integer averages landing on odd/32 — exactly
    * representable in binary AND on the boundary, where Spark
    * HALF_UP and another engine's half-even disagree on the SAME
    * double. The 1e-6 offset pushes every boundary case to the same
    * side in both engines; away from boundaries it equals ROUND
    * half-up. SUM outputs don't need this (their true values have
    * <= 4 decimals, never on-boundary). Oracle counterpart:
    * floor(x*10000 + 0.5 + 0.000001)/10000. */
  def round4eps(c: Column): Column =
    floor(c * lit(10000) + lit(0.5) + lit(1e-6)) / lit(10000)

  /** Same boundary logic at 1e-6 — the quantization pin for values
    * that FEED further arithmetic or comparisons (iterated model
    * parameters, bucket boundaries): both engines recompute from the
    * identical quantized double, so ulp drift can't compound or flip
    * a comparison. Oracle counterpart:
    * floor(x*1000000 + 0.5 + 0.000001)/1000000. */
  def round6eps(c: Column): Column =
    floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
}
