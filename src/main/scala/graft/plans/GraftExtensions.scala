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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
    // Whole-operator extension (SURVEY §3 rung c): the native as-of join
    // planner strategy. Also registered lazily on live sessions by
    // AsOfJoin.asofNative via ColumnBridge.addStrategy.
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
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
    },
    // Spark ships BloomFilterMightContain for its own runtime-filter
    // rewrites but does not register a SQL surface for it; graft's
    // incremental dedup uses it to pre-prune the corpus fingerprint
    // scan (the bloom side must be a scalar subquery or literal —
    // enforced by the expression's own checkInputDataTypes).
    "graft_might_contain" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_might_contain(bloom, xxhash64_value)")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        args(0), args(1))
    },
    // BloomFilterAggregate ships in catalyst for runtime-filter rewrites
    // but is not on the public SQL search path in this build
    "graft_bloom_filter_agg" -> { args: Seq[Expression] =>
      require(args.length == 3,
        "graft_bloom_filter_agg(xxhash64_value, est_items, num_bits)")
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(args(0), args(1), args(2))
    })

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      ColumnBridge.registerFunction(spark, name, b)
    }
}
