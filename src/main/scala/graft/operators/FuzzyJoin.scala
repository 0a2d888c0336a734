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
  * Completeness (pigeonhole): split the index string t into d+1
  * contiguous segments; an optimal alignment of a pair within distance
  * d edits at most d of them, so some segment of t survives verbatim in
  * the probe s, with its start shifted by at most d (the net indel
  * drift). The probe therefore emits, for every candidate target length
  * l ∈ [len−d, len+d] and every segment slot, all substrings at starts
  * within ±d of that slot's position — a constant ((2d+1)·(d+1)·(d+1))
  * keys per row, NOT a function of corpus size. Strings shorter than
  * d+1 fall back to a per-length bucket (no segment to pin).
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
    val nSeg = d + 1
    // Column `/` is double division; segment geometry needs integer div
    def idiv(x: Column): Column = floor(x / nSeg).cast("int")

    // Strip the CORPUS-WIDE common prefix/suffix before blocking:
    // trimming a shared affix preserves levenshtein exactly, and a
    // formatted-id corpus ("Customer#000...") otherwise puts its whole
    // population into one constant-segment bucket — an n² candidate
    // stream no verify speed can absorb. The corpus common prefix is
    // exactly the common prefix of the lexicographic min and max (one
    // tiny agg); suffixes via the reversed strings; the strip is capped
    // so prefix+suffix never overlap on the shortest string.
    val raw = df.select(col(idCol).cast("long").as("id"),
      col(strCol).as("str"))
    val mm = raw.agg(min("str").as("lo"), max("str").as("hi"),
      min(reverse(col("str"))).as("rlo"), max(reverse(col("str"))).as("rhi"),
      min(length(col("str"))).as("minLen")).head()
    val cp = commonPrefixLen(mm.getAs[String]("lo"), mm.getAs[String]("hi"))
    val cs = math.min(
      commonPrefixLen(mm.getAs[String]("rlo"), mm.getAs[String]("rhi")),
      math.max(0, mm.getAs[Int]("minLen") - cp))
    val base = raw
      .withColumn("str",
        col("str").substr(lit(cp + 1), length(col("str")) - cp - cs))
      .withColumn("len", length(col("str")))

    // index side: (target length, slot, the slot's verbatim segment)
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

    // probe side: for each candidate target length, each slot, each
    // ±d shift — substrings cut to the TARGET's segment geometry
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
        explode(probeKey).as("pk"))
      .select(col("pid"), col("pstr"),
        col("pk.l"), col("pk.k"), col("pk.seg"))
      // shifted cuts often repeat the same substring — dedupe the
      // (cheap, key-sized) probe frame before it can multiply the join
      .distinct()

    // verify INSIDE the streamed join output: a low-entropy segment (a
    // corpus-wide shared prefix) can qualify ~n² candidates, and those
    // must die in codegen at ~ns each — never reach a shuffle. Only
    // true pairs (dist ≥ 0 under the threshold-capped levenshtein)
    // continue to the final pair-dedup exchange.
    probe.join(idx, Seq("l", "k", "seg"))
      .filter(col("pid") < col("id"))
      .withColumn("dist", levenshtein(col("pstr"), col("str"), d))
      .filter(col("dist") >= 0) // thresholded verify: -1 = over budget
      .select(col("pid").as("id_a"), col("id").as("id_b"), col("dist"))
      .distinct()
  }
}
