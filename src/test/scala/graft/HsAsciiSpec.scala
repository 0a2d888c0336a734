package graft

import org.apache.spark.sql.functions._

/** Gate for the hsExpr ASCII-corpus assumption (OracleSql.scala, r14
  * ADVICE): the DuckDB poly-fingerprint twin folds per-character
  * `ascii(ch)` code points while the engine folds raw UTF-8 bytes —
  * identical on ASCII, divergent on any multi-byte character. This
  * spec pins that the corpus those oracles actually replay over
  * (`documents.text`) is pure ASCII at test scale, so a regenerated
  * or swapped corpus that breaks the assumption fails HERE with a
  * named reason instead of as an opaque hash mismatch in the driver
  * compare.
  */
class HsAsciiSpec extends SparkSpec {

  test("documents.text is pure ASCII (hsExpr code-point/byte parity holds)") {
    val docs = Tables.documents(spark, sf)
    // a string is pure ASCII iff its UTF-8 byte length equals its
    // character length (every multi-byte char inflates the encoding)
    val nonAscii = docs
      .filter(octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii documents carry non-ASCII text: the hsExpr oracle " +
        "twin (ascii() code points) no longer matches the engine's " +
        "byte fold — switch the DuckDB side to a byte-level fold " +
        "before trusting the poly-fingerprint oracles")
  }
}
