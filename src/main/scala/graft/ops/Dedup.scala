package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deduplication operators over `documents`: exact, n-gram Jaccard, MinHash+LSH,
  * SimHash. The near-dup family is the canonical LLM-corpus pipeline
  * (shingle → signature → band → bucket-join → verify).
  *
  * Scale design:
  *  - Exact dedup is one hash-aggregate on a 32-char key — shuffle carries the
  *    md5 + doc_id only, never the document body.
  *  - Pairwise Jaccard is NEVER all-pairs: candidates are blocked (same lang,
  *    close length) so the join is an equi-join on the block key plus a cheap
  *    residual predicate. At 100 TB, blocking is what turns O(n²) into O(n·k).
  *  - MinHash signatures are computed per-document with array HOFs (no explode
  *    of shingles through a shuffle); only the 16-value signature — constant
  *    size, independent of document length — moves to the LSH band join.
  *  - SimHash packs a document into one 48-bit integer; near-dup candidates are
  *    equal fingerprints (or low Hamming distance at scale).
  *
  * All hashes derive from md5 / integer polynomial arithmetic — deterministic and
  * portable across engines, so every stage is oracle-checkable.
  */
object Dedup {

  /** Exact dedup: group documents by content fingerprint, keep the lowest doc_id
    * (deterministic survivor), count copies.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(TextAnalysis.normText(col("text"))).as("fingerprint"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** Distinct character shingles (q-grams) of the normalized text. */
  private def shingles(c: Column, q: Int): Column = {
    val t = TextAnalysis.normText(c)
    array_distinct(transform(
      sequence(lit(1), length(t) - lit(q - 1)),
      i => t.substr(i, lit(q))))
  }

  /** N-gram Jaccard near-dup pairs: distinct 3-gram sets, |∩|/|∪|, blocked by
    * (lang, |length delta| ≤ 20), emitted when similarity ≥ 0.5.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        shingles(col("text"), 3).as("grams"))
    val a = docs.as("a")
    val b = docs.as("b")
    val inter = size(array_intersect(col("a.grams"), col("b.grams")))
    val uni = size(col("a.grams")) + size(col("b.grams")) - inter
    a.join(b,
        col("a.lang") === col("b.lang") &&
        col("a.doc_id") < col("b.doc_id") &&
        abs(col("a.n_chars") - col("b.n_chars")) <= 20)
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        inter.cast("long").as("n_common"),
        (inter.cast("double") / uni).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  val MinhashFuncs = 16
  val BandSize = 4

  /** MinHash signatures, long form: (doc_id, h_idx, minhash). Hash family i is
    * "first 8 hex chars of md5(i ++ ':' ++ shingle)"; the signature entry is the
    * lexicographic minimum over the document's distinct 4-gram shingles.
    */
  def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = transform(
      sequence(lit(0), lit(MinhashFuncs - 1)),
      i => array_min(transform(
        col("grams"),
        s => substring(md5(concat(i.cast("string"), lit(":"), s)), 1, 8))))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingles(col("text"), 4).as("grams"))
      .select(col("doc_id"), posexplode(sigs).as(Seq("h_idx", "minhash")))
  }

  /** LSH banding over the MinHash signature: 4 bands × 4 rows; documents sharing
    * any full band value become a candidate pair. Only (band_idx, 35-char band
    * key) travels through the shuffle.
    */
  def lshCandidatePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val bands = minhashSignatures(spark, sfDir)
      .groupBy(col("doc_id"), floor(col("h_idx") / BandSize).as("band_idx"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("h_idx"), col("minhash")))),
        s => s.getField("minhash")), "|").as("band_key"))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 48-bit polynomial token hash, Horner form: acc·131 + ascii(ch) mod 2^48.
    * Stays within int64 (2^48·131 < 2^63) and is expressible in any engine with
    * integer arithmetic — no dependence on a specific hash builtin.
    */
  private val Mod48 = 281474976710656L // 2^48

  private def tokenHash(t: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(t)), j => ascii(t.substr(j, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * lit(131L) + c) % lit(Mod48))

  /** SimHash document fingerprint: for each of 48 bits, sum ±1 votes across all
    * token hashes (occurrences weighted); bit set iff the vote is positive.
    * Near-dups share fingerprints (or differ in few bits).
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val hashes = transform(toks, t => tokenHash(t))
    // bit positions unrolled at plan-build time (shiftright needs a literal count)
    val sim = (0 until 48).map { b =>
      val vote = aggregate(col("hashes"), lit(0L),
        (acc, h) => acc + shiftright(h, b) % lit(2L) * lit(2L) - lit(1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), hashes.as("hashes"))
      .select(col("doc_id"), sim.as("simhash"))
  }
}
