package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  import spark.implicits._

  test("pcaBasis recovers a planted dominant direction exactly") {
    // points k·(3,4,0)/1 for k = -2..2: zero mean, all variance along
    // (0.6, 0.8, 0) with eigenvalue 25·Var(k) = 25·2 = 50
    val rows = (-2 to 2).map(k =>
      (k.toLong + 2L, Seq(3.0 * k, 4.0 * k, 0.0).map(_.toFloat), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val (mu, comps, eig) = SimilaritySearch.pcaBasis(df, nc = 2)
    assert(mu.forall(math.abs(_) < 1e-9), "mean must be zero")
    val v1 = comps(0)
    assert(math.abs(math.abs(v1(0)) - 0.6) < 1e-6 &&
      math.abs(math.abs(v1(1)) - 0.8) < 1e-6 &&
      math.abs(v1(2)) < 1e-6,
      s"pc1 must align with (0.6, 0.8, 0), got ${v1.mkString(",")}")
    assert(math.abs(eig(0) - 50.0) < 1e-6)
    assert(eig(1) < 1e-6, "no variance left after deflating the line")
  }

  test("pcaBasis components are unit-norm, orthogonal, eigen-consistent") {
    val emb = Tables.embeddings(spark, sf)
    val (_, comps, eig) = SimilaritySearch.pcaBasis(emb, nc = 3)
    comps.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    for (a <- 0 until 3; b <- a + 1 until 3) {
      val d = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d) < 1e-6, s"pc${a + 1} ⊥ pc${b + 1} violated: $d")
    }
    assert(eig(0) >= eig(1) && eig(1) >= eig(2) && eig(2) > 0,
      s"eigenvalues must come out ordered: ${eig.mkString(",")}")
  }

  test("pcaProject variance matches the eigenvalues on the real corpus") {
    val emb = Tables.embeddings(spark, sf)
    val (_, _, eig) = SimilaritySearch.pcaBasis(emb, nc = 2)
    val proj = SimilaritySearch.pcaProject(emb, nc = 2)
    val r = proj.agg(var_pop(col("pc1")).as("v1"), var_pop(col("pc2")).as("v2"),
      covar_pop(col("pc1"), col("pc2")).as("cv")).head()
    assert(math.abs(r.getDouble(0) - eig(0)) / eig(0) < 1e-3,
      s"var(pc1)=${r.getDouble(0)} vs λ1=${eig(0)}")
    assert(math.abs(r.getDouble(1) - eig(1)) / eig(1) < 1e-3)
    // uncorrelated scores: the basis is orthogonal in a zero-covariance
    // rotation, so the projected covariance must vanish relative to λ1
    assert(math.abs(r.getDouble(2)) / eig(0) < 1e-3,
      s"pc1/pc2 covariance ${r.getDouble(2)} not ~0")
  }
}
