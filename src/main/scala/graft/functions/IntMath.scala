package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

/** Exact integer Column arithmetic helpers. `Column./` always promotes to
  * DOUBLE, which loses exactness past 2^53 — the oracle-exact quantizers
  * (quality score nanos, percentile nanos) need true BIGINT division so
  * Spark and the DuckDB oracle compute bit-identical integers. */
object IntMath {

  /** BIGINT integral division (SQL `div`): truncates toward zero, which
    * equals floor division for the non-negative operands our quantizers
    * produce. Mirrors DuckDB's `//` on BIGINT. */
  def intDiv(a: Column, b: Column): Column =
    toCol(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      toExpr(a), toExpr(b)))
}
