package graft.operators

import graft.functions.SpatialFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nearest-neighbor spatial join (reference: work/Projet/preparation_noaa
  * .ipynb — crossJoin of zones × stations + haversine UDF + rank window).
  *
  * Spark-first redesign: the small side (suppliers ≙ stations) is
  * broadcast, so the "cross join" is a map-side nested loop over a
  * handful of rows — no shuffle of the large side at any scale — and the
  * per-key argmin is `min_by`-style (rank window over a partition that is
  * already co-located). At true 100 TB × large-station-count scale the
  * grid-cell bucketed variant joins on cell id + neighbor cells instead;
  * the broadcast NL join is correct while one side fits in memory.
  */
object SpatialJoin {

  /** Customers and suppliers get deterministic synthetic coordinates
    * (no geo columns in the test tables). */
  def customerPoints(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"),
      round(syntheticLat(col("c_custkey"), 17), 4).as("c_lat"),
      round(syntheticLon(col("c_custkey"), 31), 4).as("c_lon"))

  def supplierPoints(supplier: DataFrame): DataFrame =
    supplier.select(col("s_suppkey"),
      round(syntheticLat(col("s_suppkey"), 23), 4).as("s_lat"),
      round(syntheticLon(col("s_suppkey"), 41), 4).as("s_lon"))

  /** Per-row provable settle bound for the expanding-ring grid probes:
    * a lower bound on the distance from THIS customer (latitude
    * `latCol`) to any point outside its probed (2r+1)² cell block.
    *
    * Any outside point differs by more than g = ring·cellDeg degrees in
    * latitude (distance ≥ chord(sin g/2)) or in longitude. For a
    * longitude-out point, split on an auxiliary gap h: either the
    * point's |lat| exceeds |φc|+h (so the latitude gap alone gives
    * chord(sin h/2)), or cos φs > cos(|φc|+h) and the haversine
    * cross-term gives chord(√(cos φc · cos(|φc|+h)) · sin g/2). Both
    * h = g and h = cellDeg/2 yield valid bounds, so the max of the two
    * is valid and tightest. The payoff vs the previous GLOBAL
    * worst-case-latitude constant: the bound now uses the row's own
    * cos φc — ~4× looser at the equator (2155 km vs 539 km at ring 1,
    * cellDeg 20), which settles 100% of in-gate rows at ring 1 on the
    * sf0.1 lattice instead of 32% (one whole ring round of jobs saved);
    * near the poles it collapses to ~0 and those rows ride to the exact
    * fallback exactly as before. The 1e-3 km margin absorbs the 4-dp
    * rounding of the candidate distances it is compared against. */
  private def settleBoundKm(ring: Int, cellDeg: Int, latCol: Column): Column = {
    val g = ring.toDouble * cellDeg
    val sinG2 = math.sin(math.toRadians(g) / 2.0)
    def chordS(x: Double): Double =
      2.0 * EarthRadiusKm * math.asin(math.min(1.0, x))
    def chordC(x: Column): Column =
      lit(2.0 * EarthRadiusKm) * asin(least(lit(1.0), x))
    val absLat = abs(latCol)
    val cosC = cos(radians(absLat))
    def cosFar(h: Double): Column =
      greatest(lit(0.0), cos(radians(least(absLat + h, lit(90.0)))))
    // h = g: the lat-out term equals chord(sin g/2) ≥ the cross term
    val hG = chordC(sqrt(cosC * cosFar(g)) * lit(sinG2))
    // h = cellDeg/2: cross term min'd with the scalar lat-gap terms
    val hHalf = least(
      lit(math.min(chordS(sinG2), chordS(math.sin(math.toRadians(cellDeg) / 4.0)))),
      chordC(sqrt(cosC * cosFar(cellDeg / 2.0)) * lit(sinG2)))
    greatest(hG, hHalf) - lit(1e-3)
  }

  /** Pairwise haversine distances (bounded: every customer × broadcast
    * supplier set). */
  def distances(customer: DataFrame, supplier: DataFrame): DataFrame =
    customerPoints(customer)
      .crossJoin(broadcast(supplierPoints(supplier)))
      .withColumn("dist_km",
        round(haversineKm(col("c_lat"), col("c_lon"), col("s_lat"), col("s_lon")), 4))

  /** Nearest supplier per customer: argmin as `min(struct(dist, key))` —
    * lexicographic struct ordering gives a deterministic tie-break AND
    * partial-aggregates map-side, so the shuffle carries one row per
    * customer instead of the full pair expansion (the reference's rank()
    * window would shuffle every pair: 2000× more rows at sf0.1). */
  def nearestSupplier(customer: DataFrame, supplier: DataFrame): DataFrame =
    nearestFromPoints(customerPoints(customer), supplierPoints(supplier))

  private def nearestFromPoints(cpts: DataFrame, spts: DataFrame): DataFrame =
    cpts.crossJoin(broadcast(spts))
      .withColumn("dist_km",
        round(haversineKm(col("c_lat"), col("c_lon"), col("s_lat"), col("s_lon")), 4))
      .groupBy("c_custkey")
      .agg(min(struct(col("dist_km"), col("s_suppkey"))).as("best"))
      .select(col("c_custkey"), col("best.s_suppkey").as("s_suppkey"),
        col("best.dist_km").as("dist_km"))

  /** Exact NN for a SMALL customer tail against a supplier set too big
    * to broadcast: the roles flip — the tail rides the broadcast, the
    * supplier table streams through the map side, and the min(struct)
    * partial-aggregates before the one-row-per-customer shuffle. The
    * supplier set is never broadcast, shuffled, or re-partitioned. */
  private def nearestFromPointsSmallTail(ctail: DataFrame, spts: DataFrame): DataFrame =
    spts.crossJoin(broadcast(ctail))
      .withColumn("dist_km",
        round(haversineKm(col("c_lat"), col("c_lon"), col("s_lat"), col("s_lon")), 4))
      .groupBy("c_custkey")
      .agg(min(struct(col("dist_km"), col("s_suppkey"))).as("best"))
      .select(col("c_custkey"), col("best.s_suppkey").as("s_suppkey"),
        col("best.dist_km").as("dist_km"))

  /** Grid-cell nearest-neighbor join — the 100 TB variant promised by the
    * scaladoc above, for when NEITHER side fits in memory. Identical
    * output to `nearestSupplier` (oracle-checked).
    *
    * Each point gets a (latCell, lonCell) id at `cellDeg` resolution and
    * customers resolve through EXPANDING RINGS: ring 1 probes the 3×3
    * cell neighborhood (9 map-side rows, lon wraps modulo 360/cellDeg),
    * ring 2 the 5×5, … up to `maxRing`. Candidates always come from an
    * EQUI-join on the cell id — a hash shuffle both sides, no broadcast,
    * no cross join — and the per-customer argmin is the map-side-partial
    * min(struct). Each ring re-probes only the customers the previous
    * ring could not settle, a population that collapses geometrically.
    *
    * Exactness for ARBITRARY inputs: a customer settles at ring r only
    * if |c_lat| ≤ maxAbsLat (row-local guard) AND its best candidate is
    * under a bound B(r) that holds for any supplier latitude. A supplier
    * outside the (2r+1)² block differs by ≥ r·cellDeg in latitude
    * (distance ≥ 2R·asin(sin(r·cellDeg/2))) or by ≥ r·cellDeg in
    * wrapped longitude; in the longitude case either |s_lat| ≤
    * maxAbsLat + cellDeg/2 (distance ≥ 2R·asin(sin(r·cellDeg/2)
    * ·√(cos maxAbsLat · cos(maxAbsLat+cellDeg/2)))) or the latitude gap
    * alone is ≥ cellDeg/2 (distance ≥ 2R·asin(sin(cellDeg/4)), the
    * r-independent term that caps what rings can prove). B(r) is the
    * min of the three, so no in-guard customer is ever mis-settled, and
    * the result never depends on the grid actually resolving.
    *
    * The residual tail (polar customers, ultra-sparse regions) gets the
    * exact pass with the SMALLER side broadcast: supplier sets under
    * `broadcastRowLimit` take the classic broadcast-suppliers path;
    * bigger ones stream map-side while the (by-then tiny) customer tail
    * rides the broadcast — the supplier set is never broadcast wholesale
    * just because the grid left a tail (the round-2 scale defect). The
    * two counts steering this are an AQE-style strategy pick on
    * checkpointed row counts, not data loops. */
  def nearestSupplierGrid(customer: DataFrame, supplier: DataFrame,
                          cellDeg: Int = 20, maxAbsLat: Double = 70.0,
                          maxRing: Int = 3,
                          broadcastRowLimit: Long = 4000000L,
                          fallbackPairBudget: Long = 2000000L): DataFrame = {
    require(360 % cellDeg == 0, "cellDeg must divide 360")
    require(maxRing >= 1, "need at least one grid ring")
    val nLon = 360 / cellDeg

    val cpts = customerPoints(customer)
    val spts = supplierPoints(supplier)
    // pmod wraps the supplier cell too: s_lon = 180.0 lands in cell nLon
    // unwrapped, which no (already-wrapped) customer probe could reach
    val sCells = spts
      .withColumn("cell_lat", floor((col("s_lat") + 90) / cellDeg).cast("int"))
      .withColumn("cell_lon",
        pmod(floor((col("s_lon") + 180) / cellDeg), lit(nLon)).cast("int"))

    // one ring pass: probe the (2r+1)² neighborhood of each remaining
    // customer, settle those whose best is provably global. `best` is
    // consumed twice (resolved branch + the anti-join feeding the next
    // ring) and Catalyst does NOT reuse the exchange across the two
    // subtrees — materialize it once; it is one row per customer, far
    // smaller than the probe expansion it caps. localCheckpoint blocks
    // are ContextCleaner-freed when the frame goes out of scope.
    def ringPass(cands: DataFrame, ring: Int): (DataFrame, DataFrame) = {
      val probes = cands
        .withColumn("lat0", floor((col("c_lat") + 90) / cellDeg).cast("int"))
        .withColumn("lon0", floor((col("c_lon") + 180) / cellDeg).cast("int"))
        .withColumn("d", explode(array(
          (for (dy <- -ring to ring; dx <- -ring to ring)
            yield struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)))
        .select(col("c_custkey"), col("c_lat"), col("c_lon"),
          (col("lat0") + col("d.dy")).as("cell_lat"),
          pmod(col("lon0") + col("d.dx"), lit(nLon)).as("cell_lon"))
      // LEFT join so a customer whose whole probed block is empty still
      // reaches `best` (with a null candidate): the next ring's
      // population is then a FILTER of the checkpointed `best`, not an
      // anti-join round against `cands` — one shuffle and one
      // materialization fewer per ring. The null-candidate guard keeps
      // min(struct) from electing an empty cell (nulls sort first in
      // struct order): a probe row with no supplier contributes a null
      // STRUCT, which min() ignores.
      val best = probes.join(sCells, Seq("cell_lat", "cell_lon"), "left")
        .withColumn("dist_km",
          round(haversineKm(col("c_lat"), col("c_lon"), col("s_lat"), col("s_lon")), 4))
        .groupBy("c_custkey", "c_lat", "c_lon")
        .agg(min(when(col("s_suppkey").isNotNull,
          struct(col("dist_km"), col("s_suppkey")))).as("best"))
        .withColumn("__settled",
          col("best.dist_km") < settleBoundKm(ring, cellDeg, col("c_lat")) &&
            abs(col("c_lat")) <= maxAbsLat)
        .localCheckpoint(true)
      val resolved = best.filter(col("__settled"))
        .select(col("c_custkey"), col("best.s_suppkey").as("s_suppkey"),
          col("best.dist_km").as("dist_km"))
      val unresolved = best.filter(!coalesce(col("__settled"), lit(false)))
        .select("c_custkey", "c_lat", "c_lon")
      (resolved, unresolved)
    }

    val sptsN = spts.count() // one cheap action, reused by the exit test
    var acc: Option[DataFrame] = None
    var remaining = cpts
    var remainingN = -1L // unknown until first measured
    var ring = 1
    // stop ringing once the exact fallback is outright cheaper: each
    // extra ring is a full job round (probe join + checkpoint + count),
    // and the fallback's true cost is the remaining×supplier PAIR count,
    // not the remaining row count — a row-count cutoff would bail into a
    // quadratic scan while the tail is still wide
    while (ring <= maxRing && remainingN != 0L &&
           (remainingN < 0L || remainingN * sptsN > fallbackPairBudget)) {
      val (resolved, unresolved) = ringPass(remaining, ring)
      acc = Some(acc.fold(resolved)(_.unionByName(resolved)))
      // unresolved is a narrow filter of the ring's checkpointed frame —
      // the count and the next ring's probes recompute only a local scan
      remaining = unresolved
      remainingN = remaining.count()
      ring += 1
    }
    val settled = acc.get
    if (remainingN == 0L) settled
    else {
      val fallback =
        if (sptsN <= broadcastRowLimit) nearestFromPoints(remaining, spts)
        else nearestFromPointsSmallTail(remaining, spts)
      settled.unionByName(fallback)
    }
  }

  /** Grid-cell k-NEAREST-neighbors join — [[nearestSupplierGrid]]
    * generalized to k results per customer (the form a feature pipeline
    * runs: "the 3 closest depots per customer"), both sides too big to
    * broadcast.
    *
    * Same expanding-ring equi-join skeleton; the per-ring winnow is a
    * row_number ≤ k over (dist, key) — a map-side WindowGroupLimit, so
    * a hot cell forwards at most k candidate rows per customer per
    * task. A customer settles at ring r only when it has ALL k
    * candidates and its k-th best distance is under the same provable
    * bound B(r) (any supplier outside the probed block is ≥ B(r) away,
    * so the k found are globally correct, in rank order). The residual
    * tail takes the measured smaller-side-broadcast exact pass, as the
    * 1-NN operator does. Output: (c_custkey, s_suppkey, dist_km, rnk),
    * k rows per customer (fewer only if suppliers < k). */
  def knnSuppliersGrid(customer: DataFrame, supplier: DataFrame, k: Int = 3,
                       cellDeg: Int = 20, maxAbsLat: Double = 70.0,
                       maxRing: Int = 3,
                       broadcastRowLimit: Long = 4000000L,
                       fallbackPairBudget: Long = 2000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(360 % cellDeg == 0, "cellDeg must divide 360")
    require(maxRing >= 1 && 2 * maxRing + 1 <= 360 / cellDeg,
      "ring blocks must stay narrower than the longitude wrap")
    val nLon = 360 / cellDeg
    val cpts = customerPoints(customer)
    val spts = supplierPoints(supplier)
    val sCells = spts
      .withColumn("cell_lat", floor((col("s_lat") + 90) / cellDeg).cast("int"))
      .withColumn("cell_lon",
        pmod(floor((col("s_lon") + 180) / cellDeg), lit(nLon)).cast("int"))

    def ringPass(cands: DataFrame, ring: Int): (DataFrame, DataFrame) = {
      val probes = cands
        .withColumn("lat0", floor((col("c_lat") + 90) / cellDeg).cast("int"))
        .withColumn("lon0", floor((col("c_lon") + 180) / cellDeg).cast("int"))
        .withColumn("d", explode(array(
          (for (dy <- -ring to ring; dx <- -ring to ring)
            yield struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)))
        .select(col("c_custkey"), col("c_lat"), col("c_lon"),
          (col("lat0") + col("d.dy")).as("cell_lat"),
          pmod(col("lon0") + col("d.dx"), lit(nLon)).as("cell_lon"))
      // k candidate rows per customer at most (map-side WindowGroupLimit).
      // The settle test is FUSED into the same per-customer exchange: a
      // second Window over the identical partitioning (the row_number
      // sort already orders by the partition key prefix) adds no shuffle
      // and no sort — the k-th best distance (null when fewer than k
      // candidates survive) rides along on every retained row, so
      // "settled" is a filter, not a groupBy + semi-join round
      val wAll = Window.partitionBy("c_custkey")
      // LEFT join so an all-empty probe block still yields a (null
      // candidate, rnk 1) row: the next ring's population is a FILTER
      // of the checkpointed frame, not an anti-join round. Null
      // distances sort LAST so padding rows can never displace real
      // candidates inside the top k; a padded k-th row leaves __kth
      // null, which correctly reads "not settled".
      val cand = probes.join(sCells, Seq("cell_lat", "cell_lon"), "left")
        .withColumn("dist_km",
          round(haversineKm(col("c_lat"), col("c_lon"), col("s_lat"), col("s_lon")), 4))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("c_custkey")
            .orderBy(col("dist_km").asc_nulls_last,
              col("s_suppkey").asc_nulls_last)))
        .filter(col("rnk") <= k)
        .withColumn("__kth",
          max(when(col("rnk") === k, col("dist_km"))).over(wAll))
        .withColumn("__settled",
          col("__kth").isNotNull &&
            col("__kth") < settleBoundKm(ring, cellDeg, col("c_lat")) &&
            abs(col("c_lat")) <= maxAbsLat)
        .select(col("c_custkey"), col("c_lat"), col("c_lon"),
          col("s_suppkey"), col("dist_km"), col("rnk"), col("__settled"))
        .localCheckpoint(true)
      val resolved = cand.filter(col("__settled"))
        .select(col("c_custkey"), col("s_suppkey"), col("dist_km"), col("rnk"))
      val unresolved = cand
        .filter(!col("__settled") && col("rnk") === 1)
        .select("c_custkey", "c_lat", "c_lon")
      (resolved, unresolved)
    }

    val sptsN = spts.count()
    var acc: Option[DataFrame] = None
    var remaining = cpts
    var remainingN = -1L
    var ring = 1
    // same pair-budget cutoff as nearestSupplierGrid: exit to the exact
    // fallback only when remaining×supplier pairs are cheap to scan
    while (ring <= maxRing && remainingN != 0L &&
           (remainingN < 0L || remainingN * sptsN > fallbackPairBudget)) {
      val (resolved, unresolved) = ringPass(remaining, ring)
      acc = Some(acc.fold(resolved)(_.unionByName(resolved)))
      // unresolved is a narrow filter of the ring's checkpointed frame —
      // the count and the next ring's probes recompute only a local scan
      remaining = unresolved
      remainingN = remaining.count()
      ring += 1
    }
    val settled = acc.get
    if (remainingN == 0L) settled
    else {
      val pairs =
        if (sptsN <= broadcastRowLimit)
          remaining.crossJoin(broadcast(spts))
        else spts.crossJoin(broadcast(remaining))
      val fallback = pairs
        .withColumn("dist_km",
          round(haversineKm(col("c_lat"), col("c_lon"), col("s_lat"), col("s_lon")), 4))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")))
        .filter(col("rnk") <= k)
        .select(col("c_custkey"), col("s_suppkey"), col("dist_km"), col("rnk"))
      settled.unionByName(fallback)
    }
  }

  /** Within-radius spatial pair join (the spatial range join): every
    * unordered point pair closer than `epsKm`, with its distance —
    * output rows are proportional to the true neighbor count, never n².
    *
    * Candidate pairs come from a grid EQUI-join, never a cross join:
    * each point homes in one (latCell, lonCell) at `cellDeg` resolution,
    * probes its 3×3 neighborhood (9 map-side rows, lon wraps), and the
    * `pid` ordering plus the unique home cell make each unordered pair
    * meet exactly once. The grid is provably sufficient: a pair within
    * epsKm differs by ≤ deg(2·asin(eps/2R)) in latitude and — since
    * a ≥ cos²(maxAbsLat)·sin²(Δlon/2) in the haversine — by
    * ≤ deg(2·asin(sin(eps/2R)/cos maxAbsLat)) in longitude; the
    * constructor REQUIRES both under cellDeg, so no in-guard pair can
    * escape the 3×3 block (inputs must satisfy |lat| ≤ maxAbsLat). */
  def withinRadiusPairs(points: DataFrame, epsKm: Double, cellDeg: Int = 6,
                        maxAbsLat: Double = 70.0): DataFrame = {
    require(360 % cellDeg == 0, "cellDeg must divide 360")
    val nLon = 360 / cellDeg
    require(nLon >= 3, "need >= 3 longitude cells for distinct neighbors")
    val epsLatDeg = math.toDegrees(
      2 * math.asin(math.min(1.0, epsKm / (2 * EarthRadiusKm))))
    val epsLonDeg = math.toDegrees(2 * math.asin(math.min(1.0,
      math.sin(epsKm / (2 * EarthRadiusKm)) /
        math.cos(math.toRadians(maxAbsLat)))))
    require(epsLatDeg <= cellDeg && epsLonDeg <= cellDeg,
      s"cellDeg=$cellDeg cells cannot contain epsKm=$epsKm neighborhoods " +
        s"at |lat|<=$maxAbsLat (need >= ${math.max(epsLatDeg, epsLonDeg)})")
    val base = points.select(col("pid"), col("lat"), col("lon"))
      .withColumn("latc", floor((col("lat") + lit(90.0)) / cellDeg).cast("int"))
      .withColumn("lonc",
        pmod(floor((col("lon") + lit(180.0)) / cellDeg).cast("int"), lit(nLon)))
    val neighborhood = explode(array((for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct((col("latc") + dx).as("latc"),
        pmod(col("lonc") + dy, lit(nLon)).as("lonc"))): _*))
    val probe = base
      .select(col("pid").as("p1"), col("lat").as("lat1"),
        col("lon").as("lon1"), neighborhood.as("nc"))
      .select(col("p1"), col("lat1"), col("lon1"),
        col("nc.latc").as("latc"), col("nc.lonc").as("lonc"))
    val home = base.select(col("pid").as("p2"), col("lat").as("lat2"),
      col("lon").as("lon2"), col("latc"), col("lonc"))
    probe.join(home, Seq("latc", "lonc"))
      .filter(col("p1") < col("p2"))
      .withColumn("dist_km", round(haversineKm(col("lat1"), col("lon1"),
        col("lat2"), col("lon2")), 4))
      .filter(col("dist_km") <= epsKm)
      .select(col("p1"), col("p2"), col("dist_km"))
  }

  /** ε-distance spatial clustering — the connectivity core of DBSCAN
    * (minPts=2) at lake scale: points closer than `epsKm` connect
    * ([[withinRadiusPairs]] grid equi-join), and connected components
    * become clusters (the same pointer-doubling CC machinery as text
    * dedup, Dedup.dupClusters). Output: (pid, cluster_id) for every
    * point in some ≥2-point cluster (singletons emit nothing, matching
    * the dedup-cluster convention). */
  def epsilonClusters(points: DataFrame, epsKm: Double, cellDeg: Int = 6,
                      maxAbsLat: Double = 70.0): DataFrame =
    Dedup.dupClusters(
      withinRadiusPairs(points, epsKm, cellDeg, maxAbsLat)
        .select(col("p1").as("d1"), col("p2").as("d2")))
      .select(col("doc_id").as("pid"), col("cluster_id"))

  /** FULL DBSCAN (minPts ≥ 2) — upgrades [[epsilonClusters]]'
    * connectivity core to the real core/border/noise semantics: a point
    * with ≥ minPts−1 ε-neighbors is CORE; clusters are connected
    * components over CORE–CORE edges only (a chain of sparse points no
    * longer bridges two dense blobs — the density guarantee minPts
    * buys); non-core points adjacent to a core join as BORDER; noise
    * emits nothing. Classic DBSCAN assigns a border point touching two
    * clusters by scan order — here it attaches to the MIN cluster
    * label, making the output deterministic and engine-portable.
    *
    * Scale shape: neighbor pairs come from [[withinRadiusPairs]]' grid
    * equi-join (rows ∝ true neighbor count, checkpointed once — degree
    * rollup, core-edge filter and border attach all reuse it); the
    * degree rollup is one narrow (pid, n) agg; CC is the shared
    * pointer-doubling labeler; an isolated core (no core neighbor)
    * keeps its own pid as label. */
  def dbscan(points: DataFrame, epsKm: Double, minPts: Int = 4,
             cellDeg: Int = 6, maxAbsLat: Double = 70.0): DataFrame = {
    val pairs = withinRadiusPairs(points, epsKm, cellDeg, maxAbsLat)
      .select("p1", "p2").localCheckpoint(true) // 3 consumers below
    val sym = pairs.unionByName(
      pairs.select(col("p2").as("p1"), col("p1").as("p2")))
    val core = sym.groupBy(col("p1").as("pid"))
      .agg(count(lit(1)).as("__nn"))
      .filter(col("__nn") >= minPts - 1).select("pid")
    val coreEdges = sym
      .join(core.select(col("pid").as("p1")), Seq("p1"))
      .join(core.select(col("pid").as("p2")), Seq("p2"))
    val cc = Dedup.dupClusters(
      coreEdges.select(col("p1").as("d1"), col("p2").as("d2")))
      .select(col("doc_id").as("pid"), col("cluster_id"))
    val coreLab = core.join(cc, Seq("pid"), "left")
      .select(col("pid"),
        coalesce(col("cluster_id"), col("pid")).as("cluster_id"))
    val borderLab = sym
      .join(coreLab.select(col("pid").as("p2"), col("cluster_id")), Seq("p2"))
      .join(core.select(col("pid").as("p1")), Seq("p1"), "left_anti")
      .groupBy(col("p1").as("pid"))
      .agg(min("cluster_id").as("cluster_id"))
    coreLab.withColumn("role", lit("core"))
      .unionByName(borderLab.withColumn("role", lit("border")))
  }

  /** GEOFENCE containment join — points × rectangles (delivery zones,
    * coverage boxes, geofenced compliance regions): every (zone, point)
    * pair where the point lies inside the zone's lat/lon box, rolled up
    * to per-zone counts. Pure 2-D interval-containment at lake scale:
    * each point homes in ONE grid cell; each rectangle explodes to the
    * (≤⌈w/cellDeg⌉+1 per axis) cells it overlaps — so the candidate
    * join is an EQUI-join on cell id, each true pair meets exactly once
    * (a point has one home cell), and the BETWEEN containment check is
    * the residual filter. No cross join, no BNLJ; candidate rows ∝
    * zone-area/cell-area. Boxes are clamped to the synthetic domain so
    * no lon wrap is needed (a wrapping deployment splits a wrapping box
    * into two, same machinery). */
  def geofenceJoin(points: DataFrame, zones: DataFrame,
                   cellDeg: Int = 6): DataFrame = {
    val p = points
      .withColumn("latc", floor((col("lat") + 90) / cellDeg).cast("int"))
      .withColumn("lonc", floor((col("lon") + 180) / cellDeg).cast("int"))
    val z = zones
      .withColumn("latc", explode(sequence(
        floor((col("lat_lo") + 90) / cellDeg).cast("int"),
        floor((col("lat_hi") + 90) / cellDeg).cast("int"))))
      .withColumn("lonc", explode(sequence(
        floor((col("lon_lo") + 180) / cellDeg).cast("int"),
        floor((col("lon_hi") + 180) / cellDeg).cast("int"))))
    z.join(p, Seq("latc", "lonc"))
      .filter(col("lat").between(col("lat_lo"), col("lat_hi")) &&
        col("lon").between(col("lon_lo"), col("lon_hi")))
      .groupBy("zone_id")
      .agg(count(lit(1)).as("n_inside"))
  }

  /** Driver-contract face of [[geofenceJoin]]: supplier-centered
    * delivery zones (box half-width 1+s%3 degrees, clamped to the
    * synthetic domain) counted over customer points. */
  def geofenceSummary(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val pts = customerPoints(customer)
      .select(col("c_custkey").as("pid"), col("c_lat").as("lat"),
        col("c_lon").as("lon"))
    val half = lit(1.0) + (col("s_suppkey") % 3).cast("double")
    val zones = supplierPoints(supplier).select(
      col("s_suppkey").as("zone_id"),
      greatest(col("s_lat") - half, lit(-70.0)).as("lat_lo"),
      least(col("s_lat") + half, lit(70.0)).as("lat_hi"),
      greatest(col("s_lon") - half, lit(-180.0)).as("lon_lo"),
      least(col("s_lon") + half, lit(180.0)).as("lon_hi"))
    geofenceJoin(pts, zones)
  }

  /** Grid-cell density heat map: customer count + share per
    * `cellDeg`-degree cell, top-N densest cells — the aggregation face
    * of the spatial family (the same cell id every grid join here keys
    * on, exposed as a report). ONE partial-agg pass to a cell-count-
    * sized frame (≤ (180/cellDeg)·(360/cellDeg) rows at ANY corpus
    * scale), total as a 1-row broadcast, top-N is TakeOrdered with the
    * (n desc, cell) total order. */
  /** SIMPLIFIED SILHOUETTE of the grid quantization — "does the cell
    * grid actually fit the point cloud": per point, a = distance to
    * its OWN cell's centroid, b = distance to the nearest OTHER cell's
    * centroid, s = (b−a)/max(a,b) ∈ [−1,1]; the mean says whether the
    * quantization separates (→1) or slices through natural clusters
    * (→0/negative). The centroid-based (simplified) form — the
    * all-pairs classic is O(n²); this is one scan against a
    * lattice-bounded centroid array riding a broadcast, exactly the
    * trade production clustering evals make. Distances are euclidean
    * in (lat, lon) quantization space (the grid's own metric —
    * documented); singleton cells score 0 by the standard convention.
    * One cell rollup, one map-side min over ≤ cells centroids, one
    * 1-row mean. */
  def gridSilhouette(customer: DataFrame, cellDeg: Int = 10): DataFrame =
    silhouetteOnPoints(customerPoints(customer), cellDeg)

  /** [[gridSilhouette]]'s core over an explicit (c_custkey, c_lat,
    * c_lon) frame — split out so specs can plant exact geometries. */
  private[operators] def silhouetteOnPoints(points: DataFrame,
                                            cellDeg: Int): DataFrame = {
    val pts = points
      .select(col("c_custkey"), col("c_lat"), col("c_lon"),
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
    val cents = pts.groupBy("cell_lat", "cell_lon")
      .agg(round(avg("c_lat"), 6).as("g_lat"),
        round(avg("c_lon"), 6).as("g_lon"),
        count(lit(1)).as("n_pts"))
    def d2(lat: org.apache.spark.sql.Column, lon: org.apache.spark.sql.Column) =
      (col("c_lat") - lat) * (col("c_lat") - lat) +
        (col("c_lon") - lon) * (col("c_lon") - lon)
    val joined = pts.join(broadcast(cents), Seq("cell_lat", "cell_lon"))
      .withColumn("a", sqrt(d2(col("g_lat"), col("g_lon"))))
    // LEFT join: with a single occupied cell there is no "other" centroid —
    // every point must still survive (scored 0 by the degenerate-cell
    // convention below), not silently drop to an empty report.
    val others = joined.as("p").join(
      broadcast(cents.select(col("cell_lat").as("o_lat"),
        col("cell_lon").as("o_lon"), col("g_lat").as("o_glat"),
        col("g_lon").as("o_glon"))),
      col("cell_lat") =!= col("o_lat") || col("cell_lon") =!= col("o_lon"),
      "left")
      .groupBy(col("c_custkey"), col("a"), col("n_pts"))
      .agg(min(sqrt(d2(col("o_glat"), col("o_glon")))).as("b"))
    others
      .withColumn("s", when(col("n_pts") === 1 || col("b").isNull,
          lit(0.0))
        .otherwise((col("b") - col("a")) /
          nullif(greatest(col("a"), col("b")), lit(0.0))))
      .crossJoin(broadcast(cents.agg(count(lit(1)).as("n_cells"))))
      .agg(count(lit(1)).as("n_points"), max("n_cells").as("n_cells"),
        round(avg("s"), 6).as("mean_silhouette"))
  }

  /** DAVIES–BOULDIN index over the grid clustering — the
    * worst-neighbor companion to [[gridSilhouette]]'s mean view: each
    * cluster is scored by its WORST overlap ratio Rᵢ = maxⱼ(σᵢ+σⱼ)/
    * d(cᵢ,cⱼ) (scatter vs separation against the most confusable
    * other cluster), DB = mean Rᵢ — lower is better; a clustering can
    * look fine on mean silhouette while one pair of clusters bleeds
    * into each other, which is exactly what the max surfaces.
    *
    * Engine-exactness: per-point centroid distances quantize to
    * MICRO-units before the per-cell sum (σ then divides exact longs),
    * and each cell's Rᵢ quantizes before the final mean — both
    * unordered sums run in long arithmetic. Scale: one cell rollup,
    * one broadcast re-join for scatter, a lattice-bounded cells² pair
    * frame (≤ (18·36)² rows, parameter- not data-sized), one 1-row
    * mean. Single-cell corpora score 0 by the [[gridSilhouette]]
    * degenerate convention. */
  def gridDaviesBouldin(customer: DataFrame, cellDeg: Int = 10)
      : DataFrame =
    daviesBouldinOnPoints(customerPoints(customer), cellDeg)

  private[operators] def daviesBouldinOnPoints(points: DataFrame,
                                               cellDeg: Int): DataFrame = {
    val pts = points
      .select(col("c_custkey"), col("c_lat"), col("c_lon"),
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
    val cents = pts.groupBy("cell_lat", "cell_lon")
      .agg(round(avg("c_lat"), 6).as("g_lat"),
        round(avg("c_lon"), 6).as("g_lon"),
        count(lit(1)).as("n_pts"))
    val scat = pts.join(broadcast(cents), Seq("cell_lat", "cell_lon"))
      .withColumn("dm", round(sqrt(
        (col("c_lat") - col("g_lat")) * (col("c_lat") - col("g_lat")) +
          (col("c_lon") - col("g_lon")) * (col("c_lon") - col("g_lon")))
        * 1e6).cast("long"))
      .groupBy("cell_lat", "cell_lon")
      .agg(sum("dm").as("su"), count(lit(1)).as("n"))
      .join(cents, Seq("cell_lat", "cell_lon"))
      .withColumn("sigma",
        col("su").cast("double") / col("n") / lit(1e6))
    val i = scat.select(col("cell_lat").as("ia"), col("cell_lon").as("ib"),
      col("g_lat").as("gi_lat"), col("g_lon").as("gi_lon"),
      col("sigma").as("si"))
    val j = scat.select(col("cell_lat").as("ja"), col("cell_lon").as("jb"),
      col("g_lat").as("gj_lat"), col("g_lon").as("gj_lon"),
      col("sigma").as("sj"))
    val ri = i.join(broadcast(j),
        col("ia") =!= col("ja") || col("ib") =!= col("jb"), "left")
      .withColumn("r", (col("si") + col("sj")) /
        nullif(sqrt(
          (col("gi_lat") - col("gj_lat")) * (col("gi_lat") - col("gj_lat")) +
            (col("gi_lon") - col("gj_lon")) * (col("gi_lon") - col("gj_lon"))),
          lit(0.0)))
      .groupBy("ia", "ib")
      .agg(coalesce(round(max("r") * 1e6), lit(0.0)).cast("long").as("rq"))
    ri.crossJoin(broadcast(scat.agg(sum("n").as("n_points"))))
      .agg(count(lit(1)).as("n_cells"), max("n_points").as("n_points"),
        round(sum("rq") / count(lit(1)) / lit(1e6), 6).as("db_index"))
  }

  /** MORAN'S I spatial autocorrelation of the per-cell customer count —
    * "is density CLUSTERED on the map or salt-and-pepper": I compares
    * each occupied cell's deviation with its rook neighbors',
    * I = (n/W)·Σᵢⱼ wᵢⱼ(xᵢ−x̄)(xⱼ−x̄)/Σᵢ(xᵢ−x̄)², against the null
    * E[I] = −1/(n−1) (reported alongside). Positive I: hot cells sit
    * next to hot cells (a partitioner must expect spatial skew);
    * near-E[I]: density is spatially random.
    *
    * Scale: cells are a lattice-bounded frame (≤ 18·36 at cellDeg=10 —
    * never data-sized); adjacency is an EQUI-join on the shifted cell
    * key (4-direction explode on one side, no distance predicate, no
    * cross join), x̄ rides a 1-row broadcast, one rollup ends it.
    * Occupied cells only (empty lattice cells carry no customers and
    * no neighbors — documented choice, matching the oracle). */
  def moranI(customer: DataFrame, cellDeg: Int = 10): DataFrame =
    moranOnCells(customerPoints(customer)
      .groupBy(
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
      .agg(count(lit(1)).cast("double").as("x")))

  /** GETIS–ORD Gi* hotspot detection over the per-cell customer count —
    * [[moranI]] answers "is density clustered ANYWHERE" with one global
    * number; Gi* answers "WHERE": per cell, the z-score of its queen
    * neighborhood's (3×3, self included — that's the * in Gi*) total
    * against what a random scatter of the observed values would put
    * there, z = (Σⱼ wᵢⱼxⱼ − x̄Wᵢ) / (S·√((nWᵢ−Wᵢ²)/(n−1))). |z| ≥ 2ish
    * flags hot/cold spots — the cells a spatial partitioner must salt.
    *
    * Scale shape: identical to moranI — the occupied-cell frame is
    * lattice-bounded, the neighborhood is a 9-offset EXPLODE + equi-join
    * on the shifted cell key (never a distance cross join), globals ride
    * a 1-row broadcast. EXACT until the close: x and Wᵢ are longs, Σx²
    * and the variance numerators widen to decimal(38,0) (counts at
    * 100 TB square past a long — same discipline as st_skew_kurt), and
    * both engines cast the identical exact integers to double for the
    * two sqrts. Unoccupied cells contribute nothing and are not scored
    * (documented choice, matching moranI and the oracle). */
  def getisOrd(customer: DataFrame, cellDeg: Int = 10): DataFrame =
    getisOrdOnCells(customerPoints(customer)
      .groupBy(
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
      .agg(count(lit(1)).as("x")))

  /** [[getisOrd]]'s core over an explicit (cell_lat, cell_lon, x: long)
    * frame — split out so specs can plant exact lattices. */
  private[operators] def getisOrdOnCells(cells: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val g = cells.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("x").cast(dec) * col("x").cast(dec)).cast(dec).as("sxx"))
    val offsets = for { a <- -1 to 1; b <- -1 to 1 }
      yield struct(lit(a).as("dlat"), lit(b).as("dlon"))
    val hood = cells
      .select(explode(array(offsets: _*)).as("o"),
        col("cell_lat"), col("cell_lon"), col("x"))
      .select((col("cell_lat") + col("o.dlat")).as("t_lat"),
        (col("cell_lon") + col("o.dlon")).as("t_lon"), col("x"))
      .groupBy("t_lat", "t_lon")
      .agg(count(lit(1)).as("w"), sum("x").as("s"))
    val num = (col("n").cast(dec) * col("s").cast(dec) -
      col("sx").cast(dec) * col("w").cast(dec)).cast("double")
    val sTerm = sqrt((col("n").cast(dec) * col("sxx") -
      col("sx").cast(dec) * col("sx").cast(dec)).cast("double"))
    val wTerm = sqrt((col("n") * col("w") - col("w") * col("w"))
      .cast("double") / (col("n") - lit(1)).cast("double"))
    cells
      .join(hood, col("cell_lat") === col("t_lat") &&
        col("cell_lon") === col("t_lon"))
      .crossJoin(broadcast(g))
      .select(col("cell_lat"), col("cell_lon"), col("x").as("n_points"),
        col("w").as("w_cells"),
        round(num / nullif(sTerm * wTerm, lit(0.0)), 6).as("gi_z"))
  }

  /** LOCAL MORAN'S I (LISA) over the 10° cell lattice — the
    * cell-level decomposition of [[moranI]]'s single global number
    * (global I says "the field is autocorrelated"; LISA says WHERE:
    * each cell gets its own Iᵢ = zᵢ·Σⱼwᵢⱼzⱼ/m₂ plus the Moran-scatter
    * QUADRANT — HH hot-spot core, LL cold core, HL/LH the spatial
    * outliers global statistics average away; [[getisOrd]] is the
    * hot/cold z-score, LISA adds the outlier classes). Queen
    * contiguity EXCLUDING self (the LISA convention; G* includes it).
    *
    * NORMALIZATION CONVENTION: here m₂ means Σz² (the raw deviation
    * square-sum), so Iᵢ = zᵢ·Σⱼwᵢⱼzⱼ/Σz² — the Anselin Iᵢ divided by
    * n (PySAL/GeoDa use m₂ = Σz²/n and report values n× larger).
    * Internally consistent with the SQL twin and sign/quadrant-
    * identical; multiply local_i by n_cells to compare against PySAL.
    *
    * Exact-integer discipline: deviations ride n-scaled (n·zᵢ =
    * n·xᵢ − Σx, exact longs), the neighborhood deviation sum is the
    * same 9-offset equi-join [[getisOrd]] uses minus the self term,
    * and Iᵢ = (n·zᵢ)(n·Σⱼzⱼ)·... collapses to exact decimal integers
    * over ONE double division (n·(nΣx²−(Σx)²)). Lattice-bounded
    * frames after one corpus rollup. */
  def localMoran(customer: DataFrame, cellDeg: Int = 10): DataFrame =
    localMoranOnCells(customerPoints(customer)
      .groupBy(
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
      .agg(count(lit(1)).as("x")))

  private[operators] def localMoranOnCells(cells: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val g = cells.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("x").cast(dec) * col("x").cast(dec)).cast(dec).as("sxx"))
    val offsets = for { a <- -1 to 1; b <- -1 to 1 }
      yield struct(lit(a).as("dlat"), lit(b).as("dlon"))
    val hood = cells
      .select(explode(array(offsets: _*)).as("o"),
        col("cell_lat"), col("cell_lon"), col("x"))
      .select((col("cell_lat") + col("o.dlat")).as("t_lat"),
        (col("cell_lon") + col("o.dlon")).as("t_lon"), col("x"))
      .groupBy("t_lat", "t_lon")
      .agg(count(lit(1)).as("w9"), sum("x").as("s9"))
    val nzi = (col("n").cast(dec) * col("x").cast(dec) -
      col("sx").cast(dec))                      // n·z_i
    val nSz = (col("n").cast(dec) * (col("s9") - col("x")).cast(dec) -
      (col("w9") - 1).cast(dec) * col("sx").cast(dec)) // n·Σ_{j≠i} z_j
    val m2n3 = (col("n").cast(dec) *
      (col("n").cast(dec) * col("sxx") -
        col("sx").cast(dec) * col("sx").cast(dec))).cast("double")
    cells
      .join(hood, col("cell_lat") === col("t_lat") &&
        col("cell_lon") === col("t_lon"))
      .crossJoin(broadcast(g))
      .select(col("cell_lat"), col("cell_lon"), col("x").as("n_points"),
        (col("w9") - 1).as("w_neighbors"),
        round((nzi * nSz).cast("double") / nullif(m2n3, lit(0.0)), 6)
          .as("local_i"),
        concat(when(nzi > 0, lit("H")).otherwise(lit("L")),
          when(nSz > 0, lit("H")).otherwise(lit("L"))).as("quadrant"))
  }

  /** JOIN-COUNT statistics over the binarized cell lattice —
    * [[moranI]]/[[getisOrd]] for BINARY spatial data (hot cell = count
    * above the global mean): of all queen-adjacent cell pairs, how
    * many are hot–hot / cold–cold / hot–cold, against the
    * free-sampling expectation E[BB] = J·p², E[WW] = J·(1−p)²,
    * E[BW] = 2J·p(1−p)? Observed BW far BELOW expectation = hot cells
    * clump (spatial autocorrelation in the binary field — the
    * checkerboard-vs-continent question Moran's I asks of levels).
    *
    * Each unordered adjacent pair counted exactly once via the FORWARD
    * half of the queen neighborhood — 4 offset explodes + one
    * equi-join on the shifted cell key (never a distance join);
    * hot = x·n > Σx is an exact long comparison; lattice-bounded
    * frames; the three expectations are the only doubles. */
  def joinCounts(customer: DataFrame, cellDeg: Int = 10): DataFrame =
    joinCountsOnCells(customerPoints(customer)
      .groupBy(
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
      .agg(count(lit(1)).as("x")))

  /** MANTEL-style distance correlation between GEOGRAPHY and VALUE
    * over the cell lattice — "do nearby cells hold similar densities"
    * asked as one correlation ([[moranI]] fixes a weight matrix and
    * tests against it; Mantel regresses value distance on the actual
    * km distances, so the DECAY itself is the statistic): Pearson r
    * between haversine cell-center distance and |count difference|
    * over all cell pairs. Negative r = similarity decays with
    * distance (spatial structure); ~0 = geography doesn't matter.
    *
    * Lattice-bounded all-pairs frame (cells², never points²) with a
    * lexicographic i<j condition; each pair's km distance quantizes
    * to 1e4 units (the sp_haversine round-4 trig convention — the one
    * float step, identical libm-rounded on both engines at this
    * quantum) and value distance is an exact long, so the five
    * correlation sums accumulate in decimal(38,0) and r is one double
    * formula. */
  def mantelCells(customer: DataFrame, cellDeg: Int = 10): DataFrame =
    mantelOnCells(customerPoints(customer)
      .groupBy(
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
      .agg(count(lit(1)).as("x")), cellDeg)

  private[operators] def mantelOnCells(cells: DataFrame,
                                       cellDeg: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val b = cells.select(col("cell_lat").as("b_lat"),
      col("cell_lon").as("b_lon"), col("x").as("x2"))
    def ctrLat(c: Column) = (c.cast("double") + 0.5) * cellDeg - 90.0
    def ctrLon(c: Column) = (c.cast("double") + 0.5) * cellDeg - 180.0
    val aLat = ctrLat(col("cell_lat"))
    val bLat = ctrLat(col("b_lat"))
    val dKm = lit(2.0) * 6371.0 * asin(sqrt(
      pow(sin(radians(bLat - aLat) / 2), 2) +
        cos(radians(aLat)) * cos(radians(bLat)) *
          pow(sin(radians(ctrLon(col("b_lon")) -
            ctrLon(col("cell_lon"))) / 2), 2)))
    val pairs = cells.join(b,
        col("cell_lat") < col("b_lat") ||
          (col("cell_lat") === col("b_lat") &&
            col("cell_lon") < col("b_lon")))
      .select(round(dKm * 1e4).cast("long").as("dg"),
        abs(col("x") - col("x2")).as("dv"))
    val s = pairs.agg(count(lit(1)).as("np"),
      sum(col("dg").cast(dec)).as("sg"), sum(col("dv").cast(dec)).as("sv"),
      sum(col("dg").cast(dec) * col("dg").cast(dec)).as("sgg"),
      sum(col("dv").cast(dec) * col("dv").cast(dec)).as("svv"),
      sum(col("dg").cast(dec) * col("dv").cast(dec)).as("sgv"))
    val n = col("np").cast("double")
    val num = n * col("sgv").cast("double") -
      col("sg").cast("double") * col("sv").cast("double")
    val den = sqrt(n * col("sgg").cast("double") -
        col("sg").cast("double") * col("sg").cast("double")) *
      sqrt(n * col("svv").cast("double") -
        col("sv").cast("double") * col("sv").cast("double"))
    s.select(col("np").as("n_pairs"),
      round(num / nullif(den, lit(0.0)), 6).as("mantel_r"))
  }

  /** EMPIRICAL SEMIVARIOGRAM over the cell lattice — the
    * geostatistics primitive under every kriging/interpolation model
    * ([[mantelCells]] gives ONE correlation number; the variogram
    * gives the SHAPE — γ(h) = ½·mean (xᵢ−xⱼ)² per distance band,
    * whose sill/range say how far a measurement carries information,
    * i.e. how far apart sensors or samples can afford to be): bands
    * of `bandKm` km over all lattice cell pairs.
    *
    * Same lattice-bounded machinery as [[mantelCells]] (cells² pairs,
    * lexicographic i<j, km quantized at 1e4 via the one haversine
    * convention); squared value differences are exact decimals summed
    * per band; band-count-bounded output. */
  def semivariogramCells(customer: DataFrame, cellDeg: Int = 10,
                         bandKm: Int = 2000): DataFrame =
    semivariogramOnCells(customerPoints(customer)
      .groupBy(
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
      .agg(count(lit(1)).as("x")), cellDeg, bandKm)

  private[operators] def semivariogramOnCells(cells: DataFrame,
                                              cellDeg: Int,
                                              bandKm: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val b = cells.select(col("cell_lat").as("b_lat"),
      col("cell_lon").as("b_lon"), col("x").as("x2"))
    def ctrLat(c: Column) = (c.cast("double") + 0.5) * cellDeg - 90.0
    def ctrLon(c: Column) = (c.cast("double") + 0.5) * cellDeg - 180.0
    val aLat = ctrLat(col("cell_lat"))
    val bLat = ctrLat(col("b_lat"))
    val dKm = lit(2.0) * 6371.0 * asin(sqrt(
      pow(sin(radians(bLat - aLat) / 2), 2) +
        cos(radians(aLat)) * cos(radians(bLat)) *
          pow(sin(radians(ctrLon(col("b_lon")) -
            ctrLon(col("cell_lon"))) / 2), 2)))
    cells.join(b,
        col("cell_lat") < col("b_lat") ||
          (col("cell_lat") === col("b_lat") &&
            col("cell_lon") < col("b_lon")))
      .select(
        // explicit floor: double→long CASTs round in some engines
        // (DuckDB) and truncate in others (Spark) — floor is the one
        // spelling both agree on
        floor(round(dKm * 1e4).cast("long") / lit(bandKm * 10000L))
          .cast("long").as("band"),
        ((col("x") - col("x2")) * (col("x") - col("x2"))).cast(dec)
          .as("d2"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum("d2").cast("double") /
          (lit(2.0) * count(lit(1))), 6).as("gamma"))
  }

  /** [[joinCounts]]'s core over an explicit (cell_lat, cell_lon,
    * x: long) frame — split out so specs can plant exact lattices. */
  private[operators] def joinCountsOnCells(cells: DataFrame): DataFrame = {
    val g = broadcast(cells.agg(count(lit(1)).as("n"), sum("x").as("sx")))
    val marked = cells.crossJoin(g)
      .select(col("cell_lat"), col("cell_lon"),
        (col("x") * col("n") > col("sx")).as("hot"))
    val fwd = Seq((0, 1), (1, -1), (1, 0), (1, 1)).map { case (a, b) =>
      struct(lit(a).as("dlat"), lit(b).as("dlon")) }
    val pairs = marked
      .select(explode(array(fwd: _*)).as("o"), col("cell_lat"),
        col("cell_lon"), col("hot"))
      .select((col("cell_lat") + col("o.dlat")).as("t_lat"),
        (col("cell_lon") + col("o.dlon")).as("t_lon"),
        col("hot").as("hot_a"))
      .join(marked.select(col("cell_lat").as("t_lat"),
        col("cell_lon").as("t_lon"), col("hot").as("hot_b")),
        Seq("t_lat", "t_lon"))
    val hotTot = marked.agg(count(lit(1)).as("n_cells"),
      sum(when(col("hot"), 1L).otherwise(0L)).as("n_hot"))
    val cnt = pairs.agg(
      sum(when(col("hot_a") && col("hot_b"), 1L).otherwise(0L)).as("bb"),
      sum(when(!col("hot_a") && !col("hot_b"), 1L).otherwise(0L))
        .as("ww"),
      sum(when(col("hot_a") =!= col("hot_b"), 1L).otherwise(0L))
        .as("bw"))
    val j = (col("bb") + col("ww") + col("bw")).cast("double")
    val p = col("n_hot").cast("double") / col("n_cells")
    cnt.crossJoin(broadcast(hotTot))
      .select(col("n_cells"), col("n_hot"),
        (col("bb") + col("ww") + col("bw")).as("joins"),
        col("bb"), col("ww"), col("bw"),
        round(j * p * p, 6).as("e_bb"),
        round(j * (lit(1.0) - p) * (lit(1.0) - p), 6).as("e_ww"),
        round(lit(2.0) * j * p * (lit(1.0) - p), 6).as("e_bw"))
  }

  /** [[moranI]]'s core over an explicit (cell_lat, cell_lon, x) frame —
    * split out so specs can plant exact lattices. */
  private[operators] def moranOnCells(cells: DataFrame): DataFrame = {
    val m = cells.agg(avg("x").as("xbar"),
      count(lit(1)).as("n"))
    val centered = cells.crossJoin(broadcast(m))
      .select(col("cell_lat"), col("cell_lon"),
        (col("x") - col("xbar")).as("dx"), col("n"))
    val probes = centered.select(
      explode(array(
        struct(lit(1).as("dlat"), lit(0).as("dlon")),
        struct(lit(-1).as("dlat"), lit(0).as("dlon")),
        struct(lit(0).as("dlat"), lit(1).as("dlon")),
        struct(lit(0).as("dlat"), lit(0 - 1).as("dlon")))).as("o"),
      (col("cell_lat") + col("o.dlat")).as("n_lat"),
      (col("cell_lon") + col("o.dlon")).as("n_lon"),
      col("dx").as("dx_i"))
      .select("n_lat", "n_lon", "dx_i")
    val pairs = probes.join(centered,
      col("n_lat") === col("cell_lat") && col("n_lon") === col("cell_lon"))
      .agg(count(lit(1)).as("w"), sum(col("dx_i") * col("dx")).as("cross"))
    val denom = centered.agg(sum(col("dx") * col("dx")).as("ssq"),
      max("n").as("n"))
    pairs.crossJoin(broadcast(denom))
      .select(col("n").as("n_cells"), col("w").as("w_pairs"),
        round(col("n").cast("double") / col("w") * col("cross") /
          nullif(col("ssq"), lit(0.0)), 6).as("moran_i"),
        round(lit(-1.0) / (col("n") - 1), 6).as("expected_i"))
  }

  def gridDensity(customer: DataFrame, cellDeg: Int = 10,
                  topN: Int = 15): DataFrame = {
    val cells = customerPoints(customer)
      .groupBy(
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
      .agg(count(lit(1)).as("n_points"))
    cells.crossJoin(broadcast(cells.agg(sum("n_points").as("__t"))))
      .select(col("cell_lat"), col("cell_lon"), col("n_points"),
        round(col("n_points") / col("__t"), 6).as("share"))
      .orderBy(desc("n_points"), asc("cell_lat"), asc("cell_lon"))
      .limit(topN)
  }

  /** RIPLEY'S K pair-correlation ladder over the customer point cloud —
    * "is the spatial process CLUSTERED at radius r, and at which
    * scale": for each radius the share of point pairs within r,
    * compared against the CSR (complete spatial randomness) share =
    * sphericalCapArea(r) / domainArea (domain = the ±70° latitude band
    * the synthetic points live on; cap/band areas are pinned literal
    * constants so both engines divide by the identical double —
    * recomputing sin/cos per engine risks a ulp).  k_ratio > 1 at small
    * r with ≈ 1 at large r is the "clustered at city scale, random at
    * continent scale" signature sp_moran's single-lattice number
    * cannot resolve.
    *
    * Scale shape: pairs come from ONE [[withinRadiusPairs]] grid
    * equi-join at the LARGEST radius (never all-pairs); each smaller
    * radius is a conditional count over that pair frame; n rides as a
    * 1-row broadcast. Exact integer pair counts; one division chain
    * per radius at the close. */
  private val CsrShareByRadius: Map[Double, Double] = Map(
    100.0 -> 6.55435659280035e-05,
    200.0 -> 2.621581161880989e-04,
    400.0 -> 1.0483741361924782e-03)

  def ripleyK(customer: DataFrame,
              radiiKm: Seq[Double] = Seq(100.0, 200.0, 400.0))
      : DataFrame =
    ripleyOnPoints(customerPoints(customer).select(
      col("c_custkey").as("pid"), col("c_lat").as("lat"),
      col("c_lon").as("lon")), radiiKm)

  /** [[ripleyK]]'s core over an explicit (pid, lat, lon) frame — split
    * out so specs can plant exact geometries. */
  private[operators] def ripleyOnPoints(pts: DataFrame,
                                        radiiKm: Seq[Double])
      : DataFrame = {
    def csr(r: Double): Double = CsrShareByRadius.getOrElse(r,
      (1 - math.cos(r / EarthRadiusKm)) /
        (2 * math.sin(math.toRadians(70.0))))
    // cellDeg 12: the smallest 360-divisor whose cells contain 400 km
    // neighborhoods at |lat| <= 70 (withinRadiusPairs requires it)
    val pairs = withinRadiusPairs(pts, radiiKm.max, cellDeg = 12)
      .localCheckpoint(true)
    val perR = radiiKm.map { r =>
      pairs.agg(sum(when(col("dist_km") <= r, 1L).otherwise(0L))
          .as("n_pairs"))
        .select(lit(r).as("r_km"), col("n_pairs"),
          lit(csr(r)).as("__csr"))
    }.reduce(_ unionByName _)
    val nn = pts.agg(count(lit(1)).as("n"))
    perR.crossJoin(broadcast(nn))
      .select(col("r_km"), col("n_pairs"),
        round(lit(2.0) * col("n_pairs") /
          (col("n") * (col("n") - 1)), 8).as("pair_share"),
        round(col("__csr"), 8).as("csr_share"),
        round(lit(2.0) * col("n_pairs") /
          (col("n") * (col("n") - 1)) / col("__csr"), 4).as("k_ratio"))
  }

  /** CLARK–EVANS nearest-neighbor index — the POINT-distance CSR test
    * next to [[quadratTest]]'s cell census (quadrats see density
    * variation at the cell scale; Clark–Evans sees it at the
    * nearest-neighbor scale): R = observed mean NN distance /
    * (0.5/√density), R < 1 clustered, ≈1 CSR, → 2.15 regular.
    * Density uses the ±70° band area as a PINNED literal (the
    * sp_ripley constant discipline — both engines divide by the
    * identical double).
    *
    * Scale shape: candidate neighbors come from the 3×3 cell-block
    * equi-join (the sp_dbscan neighborhood shape — never all-pairs);
    * the per-point min is a map-side-combining min(struct). The NN is
    * therefore BLOCK-BOUNDED by contract (a rare cross-block-closer
    * neighbor is over-estimated, and points with an empty block are
    * excluded and REPORTED as n_isolated — stated approximation, the
    * oracle mirrors it exactly). Per-point distances are pre-rounded
    * and sum as exact micro-ints. */
  def clarkEvans(customer: DataFrame, cellDeg: Int = 10): DataFrame = {
    val bandAreaKm2 = 4.79305144464871e8
    val pts = customerPoints(customer)
      .select(col("c_custkey").as("id"), col("c_lat").as("lat"),
        col("c_lon").as("lon"),
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("ca"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cb"))
      .localCheckpoint(true)
    val probes = pts.select(
      explode(array((for (dy <- -1 to 1; dx <- -1 to 1) yield
        struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)).as("o"),
      col("id"), col("lat"), col("lon"), col("ca"), col("cb"))
      .select(col("id"), col("lat"), col("lon"),
        (col("ca") + col("o.dy")).as("na"),
        (col("cb") + col("o.dx")).as("nb"))
    val nn = probes.join(
        pts.select(col("id").as("jid"), col("lat").as("jlat"),
          col("lon").as("jlon"), col("ca").as("na"), col("cb").as("nb")),
        Seq("na", "nb"))
      .filter(col("id") =!= col("jid"))
      .groupBy("id")
      .agg(min(struct(
        round(haversineKm(col("lat"), col("lon"), col("jlat"),
          col("jlon")), 4).as("d"), col("jid"))).as("best"))
      .select(col("id"), round(col("best.d") * 1e4).cast("long").as("du"))
    val tot = pts.agg(count(lit(1)).as("n"))
    nn.agg(count(lit(1)).as("n_with_nn"), sum("du").as("su"))
      .crossJoin(broadcast(tot))
      .select(col("n").as("n_points"),
        (col("n") - col("n_with_nn")).as("n_isolated"),
        round(col("su").cast("double") / col("n_with_nn") / 1e4, 4)
          .as("mean_nn_km"),
        round(lit(0.5) / sqrt(col("n").cast("double") /
          lit(bandAreaKm2)), 4).as("expected_nn_km"),
        round((col("su").cast("double") / col("n_with_nn") / 1e4) /
          (lit(0.5) / sqrt(col("n").cast("double") /
            lit(bandAreaKm2))), 4).as("clark_evans_r"))
  }

  /** KERNEL-SMOOTHED density grid — the "heatmap the dashboard
    * actually draws" over [[gridDensity]]'s raw counts: a 3×3 binomial
    * kernel (1-2-1 ⊗ 1-2-1, integer weights summing 16) convolved over
    * the cell lattice, so single-cell spikes spread into the blobs a
    * human reads while the total mass is preserved up to edge loss.
    *
    * Scale shape: convolution as an EQUI-join on the shifted cell key
    * (9-offset explode of the occupied-cells frame — lattice-bounded,
    * never data-sized; no distance predicate, no cross join); weights
    * stay integers so smoothed mass is the exact rational Σw·n/16 —
    * one division per output cell on exact longs. Top-N cut with the
    * (mass, cell) total order. */
  def kernelDensity(customer: DataFrame, cellDeg: Int = 10,
                    topN: Int = 15): DataFrame = {
    val cells = customerPoints(customer)
      .groupBy(
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val offsets = Seq(-1, 0, 1).flatMap(dy => Seq(-1, 0, 1).map(dx =>
      (dy, dx, (if (dy == 0) 2L else 1L) * (if (dx == 0) 2L else 1L))))
    val spread = cells.select(
      explode(array(offsets.map { case (dy, dx, w) =>
        struct(lit(dy).as("dy"), lit(dx).as("dx"), lit(w).as("w"))
      }: _*)).as("o"), col("cell_lat"), col("cell_lon"), col("n"))
      .select((col("cell_lat") + col("o.dy")).as("cell_lat"),
        (col("cell_lon") + col("o.dx")).as("cell_lon"),
        (col("o.w") * col("n")).as("wn"))
    spread.groupBy("cell_lat", "cell_lon")
      .agg(sum("wn").as("mass16"))
      .orderBy(col("mass16").desc, col("cell_lat"), col("cell_lon"))
      .limit(topN)
      .select(col("cell_lat"), col("cell_lon"),
        round(col("mass16") / lit(16.0), 4).as("smoothed"))
  }

  /** QUADRAT-COUNT CSR test over the customer point cloud — the
    * lattice-census complement to Ripley's pair-distance view: bin
    * points into the FIXED 14×36 10° study-region lattice (empty cells
    * count — that's what makes it a census, not a density top-N) and
    * test the counts against the uniform expectation with χ² and the
    * variance-to-mean ratio (VMR > 1 = clustered, < 1 = regular).
    *
    * The algebra needs only n and Σo² (empty cells contribute zero to
    * both): χ² = C·Σo²/n − n and VMR = (Σo² − n²/C)/(C−1)/(n/C) with
    * C = 504 fixed cells — so the whole test is TWO map-side-combined
    * rollups ending in a 1-row exact-integer formula; no cell grid is
    * ever materialized, which is also why it holds at any point count.
    */
  def quadratTest(customer: DataFrame, cellDeg: Int = 10): DataFrame = {
    val nLatCells = 140 / cellDeg // ±70° synthetic latitude band
    val nLonCells = 360 / cellDeg
    val cells = 1L * nLatCells * nLonCells
    customerPoints(customer)
      .groupBy(
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
      .agg(count(lit(1)).as("o"))
      .agg(sum("o").as("n"), sum(col("o") * col("o")).as("ssq"))
      .select(col("n").as("n_points"), lit(cells).as("n_cells"),
        round(col("n").cast("double") / cells, 6).as("mean_per_cell"),
        round((col("ssq").cast("double") -
          col("n").cast("double") * col("n") / cells) / (cells - 1) /
          (col("n").cast("double") / cells), 4).as("vmr"),
        round(lit(cells.toDouble) * col("ssq") / col("n") -
          col("n"), 4).as("chi2"),
        lit(cells - 1).as("df"))
  }

  /** STANDARD DEVIATIONAL ELLIPSE (r9) — the dispersion ORIENTATION
    * summary the scalar spreads (sp_quadrat's VMR, sp_clark_evans' R)
    * cannot express: mean center, the rotation θ that maximizes
    * variance along one axis (the classic CrimeStat/ArcGIS SDE,
    * Lefever 1926), and the σ along major/minor axes — "the point
    * cloud leans northeast, stretched 3:1". Planar lon/lat treatment
    * by stated contract (the sp_kde/sp_grid_density convention).
    *
    * Exactness: coordinates are 4dp by construction, so the five
    * moments (Σx, Σy, Σx², Σy², Σxy) reduce exactly in decimal(38,0)
    * over 1e4-scaled longs — ONE partial-agg pass, partitioning-
    * invariant — and the closed-form θ/σ algebra runs on identical
    * doubles in both engines (atan/sqrt/sin/cos agreement is the
    * sp_haversine precedent). B = 0 (no covariance) pins θ = 0
    * explicitly — no atan2 branch ambiguity to replay. */
  def deviationalEllipse(points: DataFrame, latCol: String,
                         lonCol: String): DataFrame = {
    val x4 = round(col(lonCol) * 1e4).cast("long")
    val y4 = round(col(latCol) * 1e4).cast("long")
    val dec = "decimal(38,0)"
    val m = points.agg(count(lit(1)).as("n"),
      sum(x4.cast(dec)).as("sx"), sum(y4.cast(dec)).as("sy"),
      sum((x4 * x4).cast(dec)).as("sxx"),
      sum((y4 * y4).cast(dec)).as("syy"),
      sum((x4 * y4).cast(dec)).as("sxy"))
    val n = col("n").cast("double")
    val mx = col("sx").cast("double") / n / lit(1e4)
    val my = col("sy").cast("double") / n / lit(1e4)
    val cxx = col("sxx").cast("double") / n / lit(1e8) - mx * mx
    val cyy = col("syy").cast("double") / n / lit(1e8) - my * my
    val cxy = col("sxy").cast("double") / n / lit(1e8) - mx * my
    val a = cxx - cyy
    val theta = when(cxy === 0.0, lit(0.0))
      .otherwise(atan((a + sqrt(a * a + lit(4.0) * cxy * cxy)) /
        (lit(2.0) * cxy)))
    val (c, sn) = (cos(theta), sin(theta))
    val v1 = c * c * cxx + lit(2.0) * c * sn * cxy + sn * sn * cyy
    val v2 = sn * sn * cxx - lit(2.0) * c * sn * cxy + c * c * cyy
    m.select(col("n").as("n_points"),
      round(mx, 6).as("center_lon"), round(my, 6).as("center_lat"),
      round(degrees(theta), 4).as("theta_deg"),
      round(sqrt(greatest(v1, v2)), 6).as("sigma_major"),
      round(sqrt(least(v1, v2)), 6).as("sigma_minor"))
  }

  /** POINTY-TOP HEXAGONAL binning of the customer point cloud — the
    * honest density grid for isotropic point data ([[gridDensity]]'s
    * square cells bias along the axes: a square's corner neighbor is
    * √2 farther than its edge neighbor, a hexagon's six neighbors are
    * equidistant — why every serious point-density map hexbins):
    * axial coordinates q = (√3/3·x − 1/3·y)/size, r = 2/3·y/size, with
    * the standard CUBE ROUNDING (round q, r, s = −q−r; re-derive the
    * axis with the largest rounding error from the other two — the
    * constraint q+r+s = 0 is what makes nearest-hex assignment exact).
    * Lon/lat are treated as planar for the binning (the documented
    * convention of every hexbin chart; the equal-area variant swaps
    * the projection, not the algebra). One rollup; rounding uses the
    * floor(x+0.5) convention spelled identically in the oracle
    * (SURVEY §8.6 — engine round() half-cases are not portable).
    * Top-N by count, ties to (q, r). */
  def hexbinDensity(customer: DataFrame, sizeDeg: Double = 8.0,
                    topN: Int = 15): DataFrame = {
    def rnd(c: Column) = floor(c + 0.5)
    val p = customerPoints(customer)
      .select(((col("c_lon") * (math.sqrt(3.0) / 3.0) -
        col("c_lat") / 3.0) / sizeDeg).as("qf"),
        (col("c_lat") * (2.0 / 3.0) / sizeDeg).as("rf"))
      .withColumn("sf", -col("qf") - col("rf"))
      .withColumn("qr", rnd(col("qf")))
      .withColumn("rr", rnd(col("rf")))
      .withColumn("sr", rnd(col("sf")))
      .withColumn("dq", abs(col("qr") - col("qf")))
      .withColumn("dr", abs(col("rr") - col("rf")))
      .withColumn("ds", abs(col("sr") - col("sf")))
      .select(
        when(col("dq") > col("dr") && col("dq") > col("ds"),
          -col("rr") - col("sr")).otherwise(col("qr"))
          .cast("long").as("hex_q"),
        when(!(col("dq") > col("dr") && col("dq") > col("ds")) &&
          col("dr") > col("ds"), -col("qr") - col("sr"))
          .otherwise(when(col("dq") > col("dr") && col("dq") > col("ds"),
            col("rr"))
            .otherwise(when(col("dr") > col("ds"), -col("qr") - col("sr"))
              .otherwise(col("rr"))))
          .cast("long").as("hex_r"))
    val cells = p.groupBy("hex_q", "hex_r").agg(count(lit(1)).as("n_points"))
    cells.crossJoin(broadcast(cells.agg(sum("n_points").as("__t"))))
      .select(col("hex_q"), col("hex_r"), col("n_points"),
        round(col("n_points") / col("__t"), 6).as("share"))
      .orderBy(desc("n_points"), asc("hex_q"), asc("hex_r"))
      .limit(topN)
  }

  /** INVERSE-DISTANCE-WEIGHTED interpolation of the cell-density
    * surface at fixed probe points — the "what is the density HERE,
    * between my samples" query ([[kdeCells]] smooths the whole grid;
    * IDW answers point queries, the geostatistics workhorse when a
    * full kriging model is overkill): v̂(p) = Σᵢ nᵢ/dᵢ² / Σᵢ 1/dᵢ²
    * over the 10°-cell centroids (power 2, the standard Shepard
    * choice), haversine distances, with the exact-hit convention
    * (d < 1 km snaps to the cell's own value). The cell frame is
    * lattice-bounded (≤ 18×36) and the probes are a literal broadcast
    * — the corpus is touched ONCE for the cell rollup; everything
    * after is probe × cell arithmetic. */
  def idwDensity(customer: DataFrame, cellDeg: Int = 10): DataFrame = {
    import graft.functions.SpatialFunctions.haversineKm
    import customer.sparkSession.implicits._
    val cells = customerPoints(customer)
      .groupBy(
        floor((col("c_lat") + 90) / cellDeg).cast("int").as("cell_lat"),
        floor((col("c_lon") + 180) / cellDeg).cast("int").as("cell_lon"))
      .agg(count(lit(1)).as("n_points"))
      .select(((col("cell_lat") + 0.5) * cellDeg - 90.0).as("g_lat"),
        ((col("cell_lon") + 0.5) * cellDeg - 180.0).as("g_lon"),
        col("n_points"))
    val probes = broadcast(Seq(
      (1L, 10.0, 20.0), (2L, -35.0, 140.0), (3L, 48.0, -100.0),
      (4L, 0.0, 0.0)).toDF("probe_id", "p_lat", "p_lon"))
    cells.crossJoin(probes)
      .withColumn("d", haversineKm(col("g_lat"), col("g_lon"),
        col("p_lat"), col("p_lon")))
      .withColumn("w", lit(1.0) / (col("d") * col("d")))
      .groupBy("probe_id")
      .agg(max(when(col("d") < 1.0, col("n_points").cast("double")))
          .as("__exact"),
        sum(col("w") * col("n_points")).as("__num"),
        sum(col("w")).as("__den"),
        count(lit(1)).as("n_cells"))
      .select(col("probe_id"), col("n_cells"),
        round(coalesce(col("__exact"), col("__num") / col("__den")), 6)
          .as("idw_density"))
      .orderBy("probe_id")
  }
}
