package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Float-array kernels callable straight from generated code (top-level
  * object = static forwarders). They read Catalyst `ArrayData` in place —
  * unlike a Scala UDF, whose array arguments are first converted to
  * `Seq[Float]` and boxed per element by the ScalaUDF bridge — so the hot
  * loop touches the columnar bytes with zero copies and zero allocation.
  */
object ArrayKernels {
  /** Sequential-f64 L2 norm (null elements count as 0) — bit-identical
    * to the `aggregate`/`transform` higher-order form it replaces and to
    * DuckDB's `list_sum(list_transform(...))` oracle.
    */
  def l2NormF(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = (if (a.isNullAt(i)) 0.0f else a.getFloat(i)).toDouble
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  /** Sequential-f64 cosine, bit-identical to `TextHash.cosine` (same
    * accumulation order, same `dot / (√na · √nb)` form, min-length zip,
    * zero-norm → 0.0) and therefore to DuckDB's
    * `list_cosine_similarity` oracle. Null elements count as 0.
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = (if (a.isNullAt(i)) 0.0f else a.getFloat(i)).toDouble
      val y = (if (b.isNullAt(i)) 0.0f else b.getFloat(i)).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Sign-random-projection signature, bit-identical to
    * `TextHash.srpSignature` (same `mix(seed·1315423911 + j, i)` ±1
    * plane weights, same f64 accumulation order, same strict `dot > 0`
    * sign rule), reading `ArrayData` in place. Null array elements are
    * DEFINED as 0 here — an improvement over the `Seq[Float]` UDF
    * bridge this replaced, which threw an NPE unboxing a null
    * `java.lang.Float`; the bit-identity claim above therefore covers
    * null-free arrays (the only inputs the bridge could evaluate).
    */
  def srpSigF(a: ArrayData, bits: Int, seed: Long): Long = {
    val n = a.numElements()
    var sig = 0L
    var j = 0
    while (j < bits) {
      val planeSeed = seed * 1315423911L + j
      var dot = 0.0
      var i = 0
      while (i < n) {
        val v = (if (a.isNullAt(i)) 0.0f else a.getFloat(i)).toDouble
        val w = if ((graft.text.TextHash.mix(planeSeed, i.toLong) & 1L) == 0L)
          1.0 else -1.0
        dot += v * w
        i += 1
      }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Native Catalyst expression for cosine similarity over two
  * `Array[Float]` columns — the codegen'd replacement for the Scala-UDF
  * kernel on the hottest arithmetic path (every ANN re-rank and near-dup
  * verify evaluates it once per candidate pair).
  *
  * Why an `Expression` and not a UDF: `doGenCode` splices a single static
  * call into whole-stage codegen, so the operator stays inside the fused
  * loop (a ScalaUDF forces a codegen boundary), and the kernel reads
  * `ArrayData` directly instead of paying the UDF bridge's per-row
  * `Seq[Float]` conversion with per-element boxing. Results are
  * bit-identical to the UDF kernel — the DuckDB oracles hash-compare
  * unchanged.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // inferred Seq[ArrayType] <: Seq[AbstractDataType] (the latter is
  // private[sql], so it cannot be named here)
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArrayKernels.cosineF($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native L2 norm of an `Array[Float]` column — same design as
  * `CosineSimilarity` (static kernel call inside whole-stage codegen,
  * `ArrayData` read in place), replacing the interpreted
  * `aggregate`/`transform` higher-order form on the embedding-norm path.
  */
case class L2Norm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2_norm"

  override def nullSafeEval(a: Any): Any =
    ArrayKernels.l2NormF(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ArrayKernels.l2NormF($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native sign-random-projection signature over an `Array[Float]`
  * column — the per-vector hot loop of every SRP-LSH query (bits × dim
  * multiply-adds per row, the heaviest arithmetic on the embedding
  * paths). Same design as `CosineSimilarity`: one static kernel call
  * spliced into whole-stage codegen, `ArrayData` read in place, no UDF
  * bridge (whose `Seq[Float]` conversion boxes every element — measured
  * 16× slower at 2M dim-64 rows). `seed` is an expression so banded
  * callers can derive per-table seeds from a column; `bits` is plan
  * configuration. Bit-identical to the `TextHash.srpSignature` UDF it
  * replaces, so every committed LSH witness holds unchanged.
  */
case class SrpSignature(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def inputTypes = Seq(ArrayType(FloatType),
    org.apache.spark.sql.types.LongType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_srp_sig"

  override def nullSafeEval(a: Any, s: Any): Any =
    ArrayKernels.srpSigF(a.asInstanceOf[ArrayData], bits,
      s.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, s) => s"graft.functions.ArrayKernels.srpSigF($a, $bits, $s)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-extension entry point (`spark.sql.extensions=
  * graft.functions.GraftExtensions` on spark-submit) registering the
  * native functions for SQL users; `GraftExtensions.register` installs
  * the same builders on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineFunction)
    e.injectFunction(GraftExtensions.l2NormFunction)
    e.injectFunction(GraftExtensions.srpSigFunction)
  }
}

object GraftExtensions {
  val cosineFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName,
        "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_cosine expects 2 arguments, got ${args.length}")
        CosineSimilarity(args.head, args(1))
      })

  val l2NormFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_l2_norm"),
      new ExpressionInfo(classOf[L2Norm].getCanonicalName, "graft_l2_norm"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_l2_norm expects 1 argument, got ${args.length}")
        L2Norm(args.head)
      })

  val srpSigFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_srp_sig"),
      new ExpressionInfo(classOf[SrpSignature].getCanonicalName,
        "graft_srp_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"graft_srp_sig expects (vec, bits, seed), got ${args.length} args")
        val bits = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_srp_sig bits must be an integer literal, got $other")
        }
        SrpSignature(args.head, args(2), bits)
      })

  def register(spark: SparkSession): Unit =
    Seq(cosineFunction, l2NormFunction, srpSigFunction).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
