package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (entity resolution on short
  * strings — near-identical names/titles/SKUs), PassJoin-style:
  * candidates come from an EQUI-join on string segments, never an n²
  * cross join, and every candidate is verified with a thresholded
  * levenshtein — so the output is exactly the ≤ maxDist pair set while
  * only segment keys shuffle.
  *
  * Completeness (pigeonhole): split the index string t into m
  * contiguous segments; an optimal alignment of a pair within distance
  * d edits at most d of them, so at least m−d segments of t survive
  * verbatim in the probe s, each with its start shifted by at most d
  * (the net indel drift). For d=1 we use m=3 and join on PAIRS of
  * clean segments — two short segments make a far more selective key
  * than one, which is what keeps a dense keyspace (sequential ids,
  * where any single ⌊len/2⌋-gram is shared by thousands of rows) from
  * exploding into a quadratic candidate stream. For d ≥ 2 the m=d+1
  * single-segment scheme keeps the probe fan-out polynomial. Strings
  * shorter than m fall back to a per-length bucket (no segment to
  * pin). Probe fan-out is a constant per row either way — never a
  * function of corpus size.
  */
object FuzzyJoin {

  private def commonPrefixLen(a: String, b: String): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }

  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
                 maxDist: Int = 1): DataFrame = {
    val d = maxDist
    require(d >= 1, "maxDist must be >= 1")

    // Strip the CORPUS-WIDE common prefix/suffix before blocking:
    // trimming a shared affix preserves levenshtein exactly, and a
    // formatted-id corpus ("Customer#000...") otherwise puts its whole
    // population into one constant-segment bucket. The corpus common
    // prefix is exactly the common prefix of the lexicographic min and
    // max (one tiny agg); suffixes via the reversed strings; the strip
    // is capped so prefix+suffix never overlap on the shortest string.
    val raw = df.select(col(idCol).cast("long").as("id"),
      col(strCol).as("str"))
    val mm = raw.agg(min("str").as("lo"), max("str").as("hi"),
      min(reverse(col("str"))).as("rlo"), max(reverse(col("str"))).as("rhi"),
      min(length(col("str"))).as("minLen")).head()
    // empty input: the global agg still returns one all-null row
    if (mm.isNullAt(0))
      return raw.sparkSession.emptyDataFrame
        .select(lit(0L).as("id_a"), lit(0L).as("id_b"), lit(0).as("dist"))
        .limit(0)
    val cp = commonPrefixLen(mm.getAs[String]("lo"), mm.getAs[String]("hi"))
    val cs = math.min(
      commonPrefixLen(mm.getAs[String]("rlo"), mm.getAs[String]("rhi")),
      math.max(0, mm.getAs[Int]("minLen") - cp))
    val base = raw
      .withColumn("str",
        col("str").substr(lit(cp + 1), length(col("str")) - cp - cs))
      .withColumn("len", length(col("str")))

    val (probe, idx) =
      if (d == 1) pairSegmentKeys(base) else singleSegmentKeys(base, d)

    // verify INSIDE the streamed join output: a low-entropy segment can
    // still qualify many candidates, and those must die in codegen at
    // ~ns each — never reach a shuffle. Only true pairs (dist ≥ 0 under
    // the threshold-capped levenshtein) continue to the final
    // pair-dedup exchange.
    val joinCols = probe.columns.filterNot(Set("pid", "pstr")).toSeq
    probe.join(idx, joinCols)
      .filter(col("pid") < col("id"))
      .withColumn("dist", levenshtein(col("pstr"), col("str"), d))
      .filter(col("dist") >= 0) // thresholded verify: -1 = over budget
      .select(col("pid").as("id_a"), col("id").as("id_b"), col("dist"))
      .distinct()
  }

  /** d=1, m=3: key = an unordered PAIR of clean segments (each start
    * independently shiftable by ±1 on the probe side).
    *
    * The probe fan-out (3 lengths × 3 combos × 9 shift pairs, bounds-
    * checked, row-locally deduped) is a typed flatMap, NOT a Column
    * expression: the equivalent expression tree (~160 substrs inside
    * nested CASEs) exceeds codegen limits and falls back to interpreted
    * eval — measured ~350 µs/row vs the lambda's JIT-compiled
    * microseconds. The index side is 3 small structs and stays a
    * codegen'd Column. */
  private def pairSegmentKeys(base: DataFrame): (DataFrame, DataFrame) = {
    val spark = base.sparkSession
    import spark.implicits._
    val m = 3
    def stc(k: Int, l: Column): Column = floor(lit(k) * l / m).cast("int")
    val combos = for (k1 <- 0 until m; k2 <- k1 + 1 until m) yield (k1, k2)

    val idxKey: Column = when(col("len") < m,
      array(struct(col("len").as("l"), lit(-1).as("k1"), lit(-1).as("k2"),
        lit("").as("s1"), lit("").as("s2"))))
      .otherwise(array(combos.map { case (k1, k2) =>
        val l = col("len")
        def seg(k: Int) =
          col("str").substr(stc(k, l) + 1, stc(k + 1, l) - stc(k, l))
        struct(l.as("l"), lit(k1).as("k1"), lit(k2).as("k2"),
          seg(k1).as("s1"), seg(k2).as("s2"))
      }: _*))
    val idx = base.select(col("id"), col("str"), explode(idxKey).as("ik"))
      .select(col("id"), col("str"), col("ik.l"), col("ik.k1"),
        col("ik.k2"), col("ik.s1"), col("ik.s2"))

    val probe = base.select(col("id"), col("str")).as[(Long, String)]
      .flatMap { case (id, s) =>
        val len = s.length
        val keys =
          scala.collection.mutable.LinkedHashSet.empty[(Int, Int, Int, String, String)]
        var l = math.max(len - 1, 1)
        while (l <= len + 1) {
          if (l < m) keys += ((l, -1, -1, "", ""))
          else {
            def st(k: Int) = k * l / m
            for ((k1, k2) <- combos; sh1 <- -1 to 1; sh2 <- -1 to 1) {
              val len1 = st(k1 + 1) - st(k1)
              val len2 = st(k2 + 1) - st(k2)
              val p1 = st(k1) + sh1
              val p2 = st(k2) + sh2
              if (p1 >= 0 && p1 + len1 <= len && p2 >= 0 && p2 + len2 <= len)
                keys += ((l, k1, k2, s.substring(p1, p1 + len1),
                  s.substring(p2, p2 + len2)))
            }
          }
          l += 1
        }
        keys.iterator.map { case (kl, k1, k2, s1, s2) =>
          (id, s, kl, k1, k2, s1, s2) }
      }
      .toDF("pid", "pstr", "l", "k1", "k2", "s1", "s2")
    (probe, idx)
  }

  /** d ≥ 2, m=d+1: key = ONE clean segment (start shiftable ±d). */
  private def singleSegmentKeys(base: DataFrame, d: Int)
      : (DataFrame, DataFrame) = {
    val nSeg = d + 1
    def idiv(x: Column): Column = floor(x / nSeg).cast("int")

    val idxKey: Column = when(col("len") < nSeg,
      array(struct(col("len").as("l"), lit(-1).as("k"), lit("").as("seg"))))
      .otherwise(transform(sequence(lit(0), lit(d)), k => {
        val slen = idiv((k + 1) * col("len")) - idiv(k * col("len"))
        val pk = idiv(k * col("len"))
        struct(col("len").as("l"), k.as("k"),
          col("str").substr(pk + 1, slen).as("seg"))
      }))
    val idx = base.select(col("id"), col("str"), explode(idxKey).as("ik"))
      .select(col("id"), col("str"), col("ik.l"), col("ik.k"), col("ik.seg"))

    val probeKey: Column = flatten(transform(
      sequence(greatest(col("len") - d, lit(1)), col("len") + d), l =>
        when(l < nSeg,
          array(struct(l.as("l"), lit(-1).as("k"), lit("").as("seg"))))
          .otherwise(flatten(transform(sequence(lit(0), lit(d)), k => {
            val slen = idiv((k + 1) * l) - idiv(k * l)
            val pk = idiv(k * l)
            filter(transform(sequence(pk - d, pk + d), pos =>
              when(pos >= 0 && pos + slen <= col("len"),
                struct(l.as("l"), k.as("k"),
                  col("str").substr(pos + 1, slen).as("seg")))),
              x => x.isNotNull)
          })))))
    val probe = base.select(col("id").as("pid"), col("str").as("pstr"),
        explode(array_distinct(probeKey)).as("pk"))
      .select(col("pid"), col("pstr"),
        col("pk.l"), col("pk.k"), col("pk.seg"))
    (probe, idx)
  }
}
