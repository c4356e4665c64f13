package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking — the retrieval/RAG preprocessing
  * step that turns a document corpus into overlapping context chunks
  * with provenance offsets (SURVEY.md §2.8 LLM-pipeline family).
  *
  * Windows of `size` characters start every `stride = size - overlap`
  * characters; the count is chosen so the last window's END reaches the
  * end of the text (no trailing fragment that is mostly overlap):
  * nc = max(1, ceil((len − overlap) / stride)). Every document yields at
  * least one chunk, so chunking never silently drops rows.
  *
  * Execution shape: one `sequence()` generator + `substring` projection —
  * codegen'd builtins, no UDF, no shuffle, output partitioning inherits
  * the scan. At 100 TB this is a map-only pass whose output is ~
  * (1 + overlap/stride)× the input bytes; provenance (doc_id, offset)
  * travels with every chunk so downstream embedding/near-dup stages can
  * join back without re-reading the corpus.
  */
object Chunking {

  /** (doc_id, chunk_seq, chunk_start, chunk_len, chunk_text) per window.
    * `chunk_start` is a 0-based character offset; `chunk_len` is the
    * actual (possibly short, for the final window) chunk length. */
  def charChunks(docs: DataFrame, idCol: String, textCol: String,
                 size: Int, overlap: Int): DataFrame = {
    require(size > 0, s"size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val stride = size - overlap
    // NULL text counts as empty: a NULL length would make nc NULL, the
    // sequence NULL, and explode would DROP the row — violating the
    // never-drops-rows contract above (ADVICE r4). NULL-text docs emit
    // one empty chunk instead.
    val txt = coalesce(col(textCol), lit(""))
    // integer ceil((len - overlap) / stride), clamped to >= 1 chunk
    val nc = greatest(lit(1L),
      (length(txt).cast("long") - overlap + (stride - 1)) / stride)
    docs
      .select(col(idCol), txt.as("__txt"),
        explode(sequence(lit(0L), nc.cast("long") - 1)).as("chunk_seq"))
      .select(
        col(idCol),
        col("chunk_seq"),
        (col("chunk_seq") * stride).as("chunk_start"),
        least(lit(size.toLong), length(col("__txt")).cast("long") -
          col("chunk_seq") * stride).as("chunk_len"),
        col("__txt").substr((col("chunk_seq") * stride + 1).cast("int"),
          lit(size)).as("chunk_text"))
  }
}
