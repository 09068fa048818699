package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DotProductF, ExplodeBlocks, HyperplaneSig, L2Dist2F, Md5_64, MinHashPortableAgg, MinHashSig, RollingHash, SimHash64, SimHashBitsAgg}

/** SQL surface for the native expressions.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` (spark-submit /
  *    cluster config) via [[GraftExtensions]]
  *  - `GraftFunctions.register(spark)` on a live session
  *
  * After either, `SELECT rolling_hash(text), simhash64(split(text, ' ')),
  * minhash_sig(shingles, 32) FROM docs` works from pure SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    // HOF dot-product pattern → native codegen DotProductF (see
    // graft.plans.RewriteHofVectorOps for the safety argument)
    e.injectOptimizerRule(_ => graft.plans.RewriteHofVectorOps)
  }
}

object GraftExtensions {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> (exprs => RollingHash(exprs.head)),
    "simhash64" -> (exprs => SimHash64(exprs.head)),
    "minhash_sig" -> (exprs =>
      MinHashSig(exprs.head, intArg(exprs(1), "minhash_sig numHashes"))),
    "dot_f" -> (exprs => DotProductF(exprs.head, exprs(1))),
    "dist2_f" -> (exprs => L2Dist2F(exprs.head, exprs(1))),
    "hyperplane_sig" -> (exprs =>
      HyperplaneSig(exprs.head, intArg(exprs(1), "hyperplane_sig planes"))),
    "explode_blocks" -> (exprs => ExplodeBlocks(exprs.head)),
    "md5_64" -> (exprs => Md5_64(exprs.head)),
    // aggregates: the analyzer wraps a bare AggregateFunction from the
    // registry in an AggregateExpression, so GROUP BY ... simhash_bits(h)
    // works from pure SQL (weight defaults to 1)
    "simhash_bits" -> (exprs => SimHashBitsAgg(exprs.head,
      if (exprs.size > 1) exprs(1) else Literal(1L))),
    "minhash_portable" -> (exprs => MinHashPortableAgg(exprs.head,
      intArg(exprs(1), "minhash_portable numHashes"))),
  )
}

object GraftFunctions {
  /** Register the native functions on a live session. */
  def register(spark: SparkSession): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
