package graft.dedup

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus-scale pipelines.
  *
  * Scale posture: every variant is shuffle-bounded by a groupBy on a hash or
  * band key — never a cross join over the corpus. Candidate verification
  * (Jaccard / cosine) runs only on bucket-colocated pairs.
  *
  * All hashes that must be reproducible by an external engine derive from
  * md5 hex strings (minhash "min" is taken lexicographically over hex, which
  * is a valid uniform min-wise scheme and portable everywhere md5 exists).
  */
object Dedup {
  /** Exact dedup groups: one row per distinct canonical content hash with
    * the number of duplicates and the kept (minimum) id.
    */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(fingerprint(text).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(id).as("keeper_id"))

  /** Exact dedup: keep one representative row per canonical content hash. */
  def exactKeep(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val keepers = exactGroups(docs, id, text).select(col("keeper_id"))
    docs.join(keepers, id === col("keeper_id"), "left_semi")
  }

  /** MinHash signature of a document: for each of k hash families, the
    * lexicographic minimum of md5(seed || ':' || shingle) over the doc's
    * word shingles. Returns array<string> of length k. Narrow (per-row).
    */
  def minhashSignature(text: Column, shingleWords: Int, k: Int): Column = {
    val shingles = array_distinct(wordShingles(text, shingleWords))
    val sig = (0 until k).map { seed =>
      array_min(transform(shingles, g => md5(concat(lit(s"$seed:"), g))))
    }
    array(sig: _*)
  }

  /** LSH band keys: the signature split into `bands` groups of `rows` hashes,
    * each band hashed to one md5 bucket key. Docs sharing any band key are
    * near-dup candidates. bands*rows must equal the signature length.
    */
  def lshBandKeys(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", slice(signature, b * rows + 1, rows)))
    }: _*)

  /** MinHash signature as a TABLE: one row per doc with columns h0..h{k-1}.
    * Shape matters at scale: shingles are exploded once (narrow) and the k
    * minima come from ONE codegen'd hash aggregate — vs. evaluating the
    * shingle array k times inside interpreted higher-order lambdas
    * (measured 50× slower at sf0.1).
    */
  def minhashSignatureTable(docs: DataFrame, id: Column, text: Column,
                            shingleWords: Int, k: Int): DataFrame = {
    val sh = docs.select(id.as("doc_id"),
      explode(array_distinct(wordShingles(text, shingleWords))).as("g"))
    val mins = (0 until k).map(seed =>
      min(md5(concat(lit(s"$seed:"), col("g")))).as(s"h$seed"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** Candidate pairs (idA < idB) that collide in at least one LSH band.
    * One narrow explode + one shuffle on the band key; bucket sizes are
    * ~uniform for md5 keys so no reducer hot-spots.
    */
  def lshCandidates(docs: DataFrame, id: Column, text: Column,
                    shingleWords: Int, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val sig = minhashSignatureTable(docs, id, text, shingleWords, k)
    val bandKeys = (0 until bands).map { b =>
      md5(concat_ws("|", (0 until rows).map(r => col(s"h${b * rows + r}")): _*))
    }
    val exploded = sig.select(col("doc_id"), explode(array(bandKeys: _*)).as("band"))
    val a = exploded.select(col("band"), col("doc_id").as("id_a"))
    val b = exploded.select(col("band").as("band_b"), col("doc_id").as("id_b"))
    a.join(b, col("band") === col("band_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact Jaccard similarity between two documents' distinct shingle sets
    * (used to verify LSH candidates; runs only on candidate pairs).
    */
  def jaccard(shinglesA: Column, shinglesB: Column): Column = {
    val inter = size(array_intersect(shinglesA, shinglesB)).cast("double")
    val uni = size(array_union(shinglesA, shinglesB)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** SimHash fingerprint (nbits <= 24 keeps the SQL-oracle arithmetic in
    * exact integer range): per token, md5-derived nbits; each bit votes
    * +1/-1; fingerprint bit b set iff the sum of votes for b is positive.
    * Computed per-row from builtins (narrow, codegen'd).
    */
  def simhash(text: Column, nbits: Int): Column = {
    require(nbits >= 1 && nbits <= 24, "nbits in [1,24]")
    // 6 hex chars = 24 bits of md5 per token, as an int via conv()
    val tokenBits = transform(tokens(text),
      t => conv(substring(md5(t), 1, 6), 16, 10).cast("long"))
    val bitCols = (0 until nbits).map { b =>
      val votes = aggregate(tokenBits, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column, nbits: Int): Column =
    (0 until nbits).map { b2 =>
      shiftright(a.bitwiseXOR(b), b2).bitwiseAND(1)
    }.reduce(_ + _)

  /** SimHash as a TABLE (doc_id, simhash): tokens exploded once, the nbits
    * vote sums come from one codegen'd hash aggregate. Same values as
    * [[simhash]]; this is the corpus-scale shape.
    */
  def simhashTable(docs: DataFrame, id: Column, text: Column, nbits: Int): DataFrame = {
    require(nbits >= 1 && nbits <= 24, "nbits in [1,24]")
    val tok = docs.select(id.as("doc_id"), explode(tokens(text)).as("t"))
      .withColumn("h", conv(substring(md5(col("t")), 1, 6), 16, 10).cast("long"))
    val votes = (0 until nbits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"v$b"))
    val fp = (0 until nbits)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** N-gram Jaccard for all blocked pairs above a positive threshold:
    * grams exploded once, intersections counted by a (block, gram) join —
    * never a per-pair array intersection, never a cross join. Pairs with
    * empty intersection have jaccard 0 and are implicitly dropped (the
    * threshold must be > 0).
    */
  def ngramJaccardPairs(docs: DataFrame, id: Column, text: Column, block: Column,
                        n: Int, minJaccard: Double): DataFrame = {
    require(minJaccard > 0, "threshold must be positive (zero-overlap pairs are pruned)")
    // grams travel as 64-bit hashes through the intersection join: the
    // count is representation-independent and the narrow key halves the
    // shuffle (xxhash64 collisions across <<2^20 distinct n-grams: ~2^-25)
    val g0 = docs.select(id.as("doc_id"), block.as("blk"),
        explode(array_distinct(charShingles(text, n))).as("g"))
      .select(col("doc_id"), col("blk"), xxhash64(col("g")).as("gh"))
    val sizes = g0.groupBy(col("doc_id")).agg(count(lit(1)).as("n_g"))
    val g = g0.join(sizes, Seq("doc_id"))
    val a = g.select(col("blk"), col("doc_id").as("id_a"), col("gh"), col("n_g").as("n_a"))
    val b = g.select(col("blk").as("blk_b"), col("doc_id").as("id_b"),
      col("gh").as("gh_b"), col("n_g").as("n_b"))
    // lossless size-ratio prune: J(A,B) >= t requires t <= |B|/|A| <= 1/t,
    // so mismatched-size pairs never enter the intersection count
    val inter = a.join(b,
        col("blk") === col("blk_b") && col("gh") === col("gh_b") && col("id_a") < col("id_b") &&
          col("n_b") >= col("n_a") * minJaccard && col("n_b") <= col("n_a") / minJaccard)
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))).as("jacc"))
      .filter(col("jacc") >= minJaccard)
  }
}
