package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding MERGE TRAINING — the tokenizer-induction step of
  * an LLM data pipeline (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): repeatedly merge the
  * most frequent adjacent symbol pair across the corpus, emitting the
  * ordered merge table a tokenizer would apply.
  *
  * Scale design — the insight that makes BPE training cheap at 100 TB:
  * merges operate on the WORD-FREQUENCY table, not the corpus. One
  * corpus scan collapses text to (word, freq) — a vocabulary-sized
  * frame (≤ a few M rows regardless of corpus size) — and every merge
  * round is a pair-count aggregation + a row-local array rewrite over
  * that small frame. The corpus text is read exactly once.
  *
  * Per round: explode adjacent symbol pairs weighted by word freq,
  * take the top pair (deterministic tie-break: freq desc, then left/
  * right asc), apply the merge as a codegen'd `aggregate` left-fold
  * over each word's symbol array (greedy leftmost-first, matching the
  * reference algorithm), and localCheckpoint to keep the loop's plan
  * flat. The one-row-per-round collect is the model-artifact action —
  * the same justified driver decision as IVF codebook training.
  *
  * The `</w>` end-of-word marker follows the paper: merges never cross
  * word boundaries and a final subword knows it ends a word.
  */
object Bpe {

  /** Train `nMerges` BPE merges over the corpus; returns the ordered
    * merge table (merge_rank, left, right, merged, pair_freq). Stops
    * early if no adjacent pair remains (fully merged vocabulary). */
  def trainMerges(documents: DataFrame, nMerges: Int): DataFrame = {
    val spark = documents.sparkSession
    var vocab = documents
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        concat(split(col("w"), ""), array(lit("</w>"))).as("syms"))
      .localCheckpoint()

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      // adjacent pairs weighted by word frequency, over the vocab frame
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("freq"),
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("la"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("ra"))
        .select(col("freq"), explode(arrays_zip(col("la"), col("ra"))).as("p"))
        .groupBy(col("p.la").as("l"), col("p.ra").as("r"))
        .agg(sum("freq").as("pf"))
        .orderBy(desc("pf"), asc("l"), asc("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val Row(l: String, r: String, pf: Long) = top.head
        merges += ((rank, l, r, l + r, pf))
        // greedy leftmost-first merge as a row-local left fold: the
        // merged token becomes the new tail, so its right half can't
        // re-merge in the same round (matches the reference scan)
        vocab = vocab.select(col("freq"),
          aggregate(col("syms"), array().cast("array<string>"),
            (acc, x) =>
              when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
                .otherwise(array_append(acc, x))).as("syms"))
          .localCheckpoint()
        rank += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result().map {
        case (k, l, r, m, f) => Row(k, l, r, m, f)
      }, 1),
      StructType(Seq(
        StructField("merge_rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_freq", LongType, nullable = false))))
  }

  /** Apply a trained merge table to tokenize text — the inference twin
    * (row-local fold per merge, the same codegen'd rewrite the trainer
    * uses). Exposed for the spec's round-trip check; a production
    * tokenizer would bake the merges into a trie. */
  def applyMerges(documents: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val start = documents.select(col("doc_id"),
      explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), col("w"),
        concat(split(col("w"), ""), array(lit("</w>"))).as("syms"))
    merges.foldLeft(start) { case (df, (l, r)) =>
      df.select(col("doc_id"), col("w"),
        aggregate(col("syms"), array().cast("array<string>"),
          (acc, x) =>
            when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(array_append(acc, x))).as("syms"))
    }
  }
}
