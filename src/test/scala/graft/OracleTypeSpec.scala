package graft

import org.apache.spark.sql.types._

/** Output-type hygiene for every ORACLE-BACKED query (r11).
  *
  * The driver's comparator hashes values at the serialization layer:
  * int32 and int64 canonicalize identically, but an int128/DECIMAL
  * (what DuckDB's sum()/list_aggregate over integers silently widens
  * to — the r9/r10 ann_l2 / ml_stump / ts_pettitt hash-fails) or a
  * float32 does NOT hash like the int64/float64 the other engine
  * emits, even when every value is equal. tools/check_oracle_types.py
  * asserts full Spark↔DuckDB type parity per oracle run; this spec is
  * the Spark-side half that runs in every `sbt test`: no oracle-backed
  * query may emit a Decimal/Float/Short/Byte output column — widen to
  * long/double in the final projection instead (and mirror the CAST in
  * the DuckDB twin, which the python tool then confirms). */
class OracleTypeSpec extends SparkSpec {

  // Decimal outputs are banned EXCEPT this explicit per-column
  // whitelist: q33_runtime_filter's exact money sum is decimal on BOTH
  // sides by design, and its scale-for-scale cross-engine parity is
  // verified by `python3 tools/check_oracle_types.py /root/testdata/
  // sf0.01 /tmp/graft_verify` (run after every full graft.Verify dump
  // — a SURVEY §8 round-close checklist item, expects `0 failures`).
  // Any OTHER decimal column fails HERE, in every `sbt test`, instead
  // of waiting for the out-of-band python gate.
  private val decimalWhitelist: Set[(String, String)] =
    Set(("q33_runtime_filter", "revenue"))

  private def allowedScalar(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | StringType |
         BooleanType | DateType | TimestampType | TimestampNTZType |
         BinaryType => true
    case _ => false
  }

  private def allowed(dt: DataType): Boolean = dt match {
    case ArrayType(e, _) => allowed(e)
    case s: StructType => s.fields.forall(f => allowed(f.dataType))
    case other => allowedScalar(other)
  }

  test("no oracle-backed query emits a Decimal/Float/Short/Byte " +
      "output column (the serialization-hash divergence class)") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap {
      name =>
        val schema = SparkEntry.queries(name)(spark, sf).schema
        val bad = schema.fields.filterNot { f =>
          allowed(f.dataType) || (f.dataType.isInstanceOf[DecimalType]
            && decimalWhitelist((name, f.name)))
        }
        if (bad.isEmpty) Nil
        else Seq(s"$name: " + bad
          .map(f => s"${f.name}:${f.dataType.simpleString}")
          .mkString(", "))
    }
    assert(offenders.isEmpty,
      "oracle-backed outputs must stick to int/long/double/string/" +
        "boolean/date/timestamp (decimal only via the per-column " +
        "whitelist — see doc comment):\n" +
        offenders.mkString("\n"))
  }
}
