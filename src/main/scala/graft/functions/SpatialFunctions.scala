package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial column functions (reference: work/Projet/preparation_noaa.ipynb
  * haversine). The reference registered haversine as a Python UDF — a
  * per-row interpreter round-trip. Here it is a pure Column composition,
  * so Catalyst inlines it into WholeStageCodegen: no serialization, no
  * codegen boundary, and it can constant-fold when one side is a literal
  * query point.
  */
object SpatialFunctions {

  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * all in degrees. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Deterministic synthetic coordinates from an integer key (the test
    * tables carry no geo columns; integer-modulo placement is exact in
    * both Spark and the DuckDB oracle). */
  def syntheticLat(key: Column, mult: Int): Column =
    (key * mult % 1400) / lit(10.0) - lit(70.0)
  def syntheticLon(key: Column, mult: Int): Column =
    (key * mult % 3600) / lit(10.0) - lit(180.0)
}
