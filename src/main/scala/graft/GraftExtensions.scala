package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CmsEstimate, CmsMergeAgg, CmsSketchAgg, CosineSimilarity, DotProduct, IpBytesString, Ipv4String, SubvectorL2}

/** SQL surface for the engine's native Catalyst expressions: register via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (cluster-wide) or
  * `GraftExtensions.register(spark)` (programmatic), then:
  *
  * ```sql
  * SELECT ip_v4_string(CAST(167772161 AS BIGINT)),   -- '10.0.0.1'
  *        ip_bytes_string(addr_bytes),               -- v4/v6 render (P2)
  *        cosine_similarity(vec_a, vec_b)            -- codegen'd float[] cosine
  * ```
  *
  * All three are whole-stage-codegen expressions — the SQL route costs the
  * same as the DataFrame column functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptions.foreach(ext.injectFunction)
    // naive range joins rewrite to the binned equi-join — see
    // plans.BinRangeJoinRule for the guards and the BNLJ cliff it removes
    ext.injectOptimizerRule(_ => graft.plans.BinRangeJoinRule)
    // aggregates over a registered base table route to its materialized
    // cube — see plans.CubeRewrite for the merge laws and bail guards
    ext.injectOptimizerRule(_ => graft.plans.CubeRewrite)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = { args =>
    require(args.length == n,
      s"$name expects $n argument(s), got ${args.length}")
    b(args)
  }

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("ip_v4_string"),
      info("ip_v4_string", "ip_v4_string(bigint) - dotted-quad render"),
      arity("ip_v4_string", 1)(args => Ipv4String(args.head))),
    (FunctionIdentifier("ip_bytes_string"),
      info("ip_bytes_string", "ip_bytes_string(binary) - v4/v6 address render"),
      arity("ip_bytes_string", 1)(args => IpBytesString(args.head))),
    (FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(array<float>, array<float>)"),
      arity("cosine_similarity", 2)(args => CosineSimilarity(args.head, args(1)))),
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(array<float>, array<float>)"),
      arity("dot_product", 2)(args => DotProduct(args.head, args(1)))),
    (FunctionIdentifier("subvector_l2"),
      info("subvector_l2",
        "subvector_l2(array<float>, array<float>, int) - squared L2 between " +
          "a window of the first array (constant 0-based offset, second's " +
          "length) and the second array (the PQ subspace kernel)"),
      arity("subvector_l2", 3) { args =>
        val off = args(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"subvector_l2 offset must be an INT literal, got $other")
        }
        SubvectorL2(args.head, args(1), off)
      }),
    (FunctionIdentifier("cms_sketch_agg"),
      info("cms_sketch_agg",
        "cms_sketch_agg(string, depth INT literal, width INT literal) - " +
          "aggregate a token column into one serialized count-min grid"),
      arity("cms_sketch_agg", 3) { args =>
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"cms_sketch_agg $what must be an INT literal, got $other")
        }
        CmsSketchAgg(args.head, intLit(args(1), "depth"),
          intLit(args(2), "width"))
      }),
    (FunctionIdentifier("cms_merge_agg"),
      info("cms_merge_agg",
        "cms_merge_agg(binary) - merge serialized count-min partials by cell addition"),
      arity("cms_merge_agg", 1)(args => CmsMergeAgg(args.head))),
    (FunctionIdentifier("cms_estimate"),
      info("cms_estimate",
        "cms_estimate(binary, string) - count-min point estimate (never underestimates)"),
      arity("cms_estimate", 2)(args => CmsEstimate(args.head, args(1)))))

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
