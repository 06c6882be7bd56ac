package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{ColumnShim, DotProduct, HammingDistance, MicroSquaredDistance, SubvectorDist2}

/**
 * Column-level entry points for graft's native vector expressions (see
 * [[org.apache.spark.sql.graftshim.DotProduct]] for why these are custom
 * codegen'd Catalyst expressions rather than higher-order functions).
 */
object VectorFunctions {

  /** Σ aᵢ·bᵢ over two `ARRAY<DOUBLE>` columns — whole-stage-codegen'd. */
  def dotp(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Byte-wise Hamming distance of two (ASCII sketch) strings —
    * whole-stage-codegen'd. */
  def hamming(a: Column, b: Column): Column =
    ColumnShim.column(HammingDistance(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Σ round((aᵢ−bᵢ)²·10⁶) as LONG over two `ARRAY<DOUBLE>` columns —
    * the summation-order-proof µ-scaled squared L2 distance,
    * whole-stage-codegen'd. */
  def l2mu(a: Column, b: Column): Column =
    ColumnShim.column(MicroSquaredDistance(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Σ (a[offset+i] − b[i])² over i < len(b), left-assoc —
    * whole-stage-codegen'd subvector distance (the PQ assignment
    * scalar). */
  def subdist2(a: Column, b: Column, offset: Column): Column =
    ColumnShim.column(SubvectorDist2(ColumnShim.expression(a),
      ColumnShim.expression(b), ColumnShim.expression(offset)))
}
