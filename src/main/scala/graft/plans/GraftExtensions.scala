package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL surface for the native expressions (SURVEY §3 plans/): makes
  * `graft_dot`, `graft_minhash`, `graft_simhash` callable from
  * `spark.sql(...)`.
  *
  * Two registration routes:
  *  - at session build: `.config("spark.sql.extensions",
  *    "graft.plans.GraftExtensions")` (standard extensions mechanism);
  *  - on a live session: `GraftFunctions.register(spark)` (idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
}

object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case f if f.foldable => f.eval().asInstanceOf[Number].intValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_dot(vec, vec)")
      DotProduct(args(0), args(1))
    },
    "graft_simhash" -> { args: Seq[Expression] =>
      require(args.length == 1, "graft_simhash(tokens)")
      SimHash64(args(0))
    },
    "graft_minhash" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_minhash(tokens, k)")
      MinHashSignature(args(0), intLit(args(1), "k"))
    },
    "graft_shingle_hashes" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_shingle_hashes(text, n)")
      ShingleHashes(args(0), intLit(args(1), "n"))
    })

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      ColumnBridge.registerFunction(spark, name, b)
    }
}
