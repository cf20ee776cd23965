package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (z-order) interleaving for multi-dimensional data clustering:
  * sorting/range-partitioning by z-value co-locates rows that are close in
  * BOTH dimensions, so per-file min/max stats become tight boxes and scans
  * filtered on either dimension skip most files — the standard layout
  * technique for 100 TB tables queried on more than one column.
  *
  * The encoding is plain bit arithmetic (mask-and-shift spreading), so a
  * SQL oracle can reproduce it exactly — see ZOrderUtil.spreadSql.
  */
object ZOrderUtil {

  private final val Steps =
    Seq((16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))

  /** Spread the low 32 bits of x to the even bit positions of a long. */
  def part1by1(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    Steps.foreach { case (sh, mask) => x = (x | (x << sh)) & mask }
    x
  }

  def morton(x: Long, y: Long): Long = part1by1(x) | (part1by1(y) << 1)

  /** The identical computation as a SQL expression string (DuckDB/Spark
    * shared arithmetic), for oracle parity. */
  def spreadSql(e: String): String = {
    var x = s"(($e) & 4294967295)"
    Steps.foreach { case (sh, mask) => x = s"((($x) | (($x) << $sh)) & $mask)" }
    x
  }
  def mortonSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}

/** graft_zorder(x, y) → long Morton code of the two keys' low 32 bits. */
case class ZOrderExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two integral arguments")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.morton(asLong(left, a), asLong(right, b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderUtil.morton((long) $a, (long) $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
