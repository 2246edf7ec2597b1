package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over a document corpus — BM25-shaped scoring in exact
  * integer fixed-point, on top of the same term statistics the inverted
  * index (SURVEY T12) materializes.
  *
  * Why fixed-point: the gate oracle demands bit-identical scores in two
  * engines, and `ln()` is a libm call with no cross-engine bit contract.
  * BM25's two factors are therefore re-expressed as exact rationals:
  *
  *  - '''tf saturation''' is BM25's own formula, exactly: with k₁ = 6/5
  *    and b = 3/4, and avgdl written as L/N (L = total tokens in the
  *    corpus, N = documents),
  *
  *      tf·(k₁+1) / (tf + k₁·(1 − b + b·dl·N/L))
  *        = 44·tf·L / (20·tf·L + 6·L + 18·dl·N)
  *
  *    — an integer numerator over an integer denominator, no rounding
  *    anywhere until the final fixed-point division.
  *
  *  - '''idf''' replaces ln((N−df+½)/(df+½)) with the ratio itself in
  *    parts-per-million: idf_ppm = (2(N−df)+1)·10⁶ div (2df+1). The
  *    ratio is a strictly monotone transform of the true idf, so
  *    PER-TERM ordering is preserved exactly; multi-term scores weight
  *    rare terms more heavily than the log form (documented, determinate,
  *    and the same in both engines — the contract log cannot give).
  *
  * Per-term score = idf_ppm · 44·tf·L div (20·tf·L + 6·L + 18·dl·N),
  * computed in DECIMAL(38,0) (the numerator can exceed int64 at corpus
  * scale: idf_ppm ≤ 2N·10⁶ alone), summed per document.
  *
  * Scale shape: one narrow explode of the corpus filtered to the probe
  * vocabulary (the filter lands inside the generator — non-vocab terms
  * never become rows), the per-term df table and the 1-row corpus stats
  * broadcast back, and the only shuffle is the per-document score
  * aggregate keyed on doc id. The corpus itself is read once and never
  * shuffled; a per-probe re-scan never happens (T14's posting-probe
  * shape). Top-n selection is TakeOrderedAndProject, not a global sort.
  *
  * Reference anchor: the reference ships replicated text to Oracle and
  * would run CONTAINS scoring there (Oracle Text); this is the engine-side
  * equivalent a 100 TB corpus needs.
  */
object Retrieval {

  /** BM25-ranked documents for a disjunctive probe-term query.
    *
    * @param docs     corpus with `docIdCol` (integral) and `textCol`
    *                 (space-separated tokens, the corpus convention)
    * @param vocab    probe terms (small — broadcast by construction)
    * @param topN     rows to return, ranked (score desc, doc_id asc)
    * @return (rank, doc_id, n_terms, score) — score is the summed
    *         per-term fixed-point integer, deterministic across engines
    */
  def bm25(docs: DataFrame, docIdCol: String, textCol: String,
           vocab: Seq[String], topN: Int): DataFrame = {
    require(vocab.nonEmpty, "bm25: empty probe vocabulary")
    val toks = docs.select(col(docIdCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    // dl per doc; one row per (doc, vocab term occurrence) after the explode
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val hits = toks
      .select(col("doc_id"),
        explode(filter(col("toks"), t => t.isInCollection(vocab))).as("term"))
    val tf = hits.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // per-term document frequency — ≤ |vocab| rows, broadcast back
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    // 1-row corpus stats (N docs, L total tokens), broadcast
    val stats = dl.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("l_total"))
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_ppm",
        expr("(2 * (n_docs - df) + 1) * 1000000 div (2 * df + 1)"))
      .withColumn("term_score",
        expr("""CAST(idf_ppm AS DECIMAL(38,0)) * 44 * tf * l_total
               | div (20 * tf * l_total + 6 * l_total + 18 * dl * n_docs)"""
          .stripMargin))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("rank").cast("long").as("rank"), col("doc_id"),
        col("n_terms"), col("score"))
  }

  /** Phrase + proximity retrieval for a two-term query: documents
    * containing BOTH terms, scored by exact phrase hits ("a b" adjacent,
    * in order) and the minimum token distance between any occurrence
    * pair — the positional-postings capability BM25's bag-of-words
    * scoring cannot express (Oracle Text's NEAR operator is the
    * reference-world equivalent).
    *
    * Shape: a cheap `contains` prefilter keeps only documents where both
    * terms can occur (substring-level, a superset of token matches —
    * semantics-preserving because the position join is inner), so the
    * positional explode runs on the candidate slice, not the corpus.
    * Each side's position list is term-frequency-sized; the per-document
    * pair join is tf(a)·tf(b) — bounded by document length, never
    * corpus-quadratic — and the only shuffle is the per-document
    * aggregate. Ranking is TakeOrderedAndProject on the total order
    * (n_phrase desc, min_dist asc, doc_id).
    *
    * @param docs corpus with `docIdCol` (integral) and `textCol`
    *             (space-separated tokens, the corpus convention)
    * @param termA,termB the query phrase "termA termB"; must differ
    * @return (doc_id, n_phrase, min_dist): phrase-occurrence count
    *         (0 when both terms occur but never adjacently) and minimum
    *         absolute token distance, for the top `topN` documents
    */
  def phraseProximity(docs: DataFrame, docIdCol: String, textCol: String,
                      termA: String, termB: String, topN: Int): DataFrame = {
    require(termA != termB, "phrase terms must differ")
    val tok = docs
      .filter(col(textCol).contains(termA) && col(textCol).contains(termB))
      .select(col(docIdCol).as("doc_id"),
        posexplode(split(col(textCol), " ")))
      // 1-based positions: the cross-engine convention (SQL ordinality)
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("term"))
    val pa = tok.filter(col("term") === termA)
      .select(col("doc_id"), col("pos").as("pa"))
    val pb = tok.filter(col("term") === termB)
      .select(col("doc_id"), col("pos").as("pb"))
    pa.join(pb, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("pb") === col("pa") + 1, 1L).otherwise(0L))
          .as("n_phrase"),
        min(abs(col("pb") - col("pa"))).cast("long").as("min_dist"))
      .orderBy(col("n_phrase").desc, col("min_dist"), col("doc_id"))
      .limit(topN)
  }

  /** T28: source vocabulary-overlap matrix — for every source pair, the
    * exact Jaccard of their word VOCABULARIES: the corpus-mixture
    * diagnostic one level up from D10's document-level leakage matrix
    * ("do these sources even speak the same words" vs "do they share
    * documents"); near-10⁶ pairs are redundant in the mixture,
    * near-zero pairs are the diversity a training mix wants.
    *
    * Shape: distinct (source, word) pairs — an inverted-index build —
    * then a self-join on the WORD whose fanout per word is the number
    * of sources carrying it (bounded by |sources|, never by data), and
    * a |sources|²-sized scaffold so zero-overlap pairs report 0 rather
    * than vanish. Scale-safe by construction.
    *
    * @return (src_a, src_b, nv_a, nv_b, n_inter, jaccard_ppm),
    *         src_a < src_b, one row per unordered source pair
    */
  /** T29: Good–Turing frequency smoothing (Good 1953) — the adjusted
    * count r* = (r+1)·N_{r+1}/N_r over the frequency-of-frequencies
    * table, EXACT in ppm because it is a pure integer ratio:
    * r_star_ppm = (r+1)·N_{r+1}·10⁶ div N_r, NULL where N_{r+1} = 0
    * (the tail gap the literature smooths separately — stated, not
    * papered over). mass_ppm = r·N_r·10⁶ div total reports each
    * frequency class's share of the corpus; the r = 1 row's mass IS
    * the Good–Turing estimate of unseen-type probability.
    *
    * Scale: the token count is one hash aggregate on the token; the
    * frequency-of-frequencies table is ~log-sized (distinct observed
    * frequencies); everything after is metadata arithmetic.
    *
    * @param tokens array column — the frequency unit (words, shingles)
    * @return (r, n_r, r_star_ppm, mass_ppm) per observed frequency r
    */
  def goodTuring(docs: DataFrame, tokens: Column): DataFrame = {
    val wf = docs.select(explode(tokens).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("r"))
    val nr = wf.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    val tot = nr.agg(sum(col("r") * col("n_r")).as("__tot"))
    nr
      .join(nr.select((col("r") - 1).as("r"), col("n_r").as("__nn")),
        Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        when(col("__nn").isNull, lit(null))
          .otherwise(expr("(r + 1) * __nn * 1000000 div n_r"))
          .as("r_star_ppm"),
        expr("r * n_r * 1000000 div __tot").as("mass_ppm"))
  }

  /** T30: Zipf constancy report — the rank-frequency law stated
    * WITHOUT logarithms: Zipf predicts rank·freq ≈ constant, so the
    * report ships the exact product per rank (plus its ppm ratio to
    * the rank-1 product) and lets the reader see the plateau and where
    * it breaks. Ranks come from the two-stage exact rank on
    * (−freq, token) — no data-sized single-partition sort even on a
    * 100 TB vocabulary.
    *
    * @return (rank, w, freq, rank_freq, vs_top_ppm) for rank ≤ topN
    */
  def zipfReport(docs: DataFrame, tokens: Column, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val wf = docs.select(explode(tokens).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val ranked = Ranking.rankExact(wf, Seq.empty, -col("freq"),
        Seq(col("w")), "rank")
      .drop("__total")
      .filter(col("rank") <= topN)
      .withColumn("rank_freq", col("rank") * col("freq"))
    val top = ranked.filter(col("rank") === 1)
      .select(col("rank_freq").as("__top"))
    ranked.crossJoin(broadcast(top))
      .select(col("rank"), col("w"), col("freq"), col("rank_freq"),
        expr("rank_freq * 1000000 div __top").as("vs_top_ppm"))
  }

  def vocabOverlap(docs: DataFrame, source: Column,
                   textCol: Column): DataFrame = {
    val sv = docs.select(source.cast("string").as("src"),
        explode(split(textCol, " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val sizes = sv.groupBy(col("src")).agg(count(lit(1)).as("nv"))
    val inter = sv
      .join(sv.select(col("src").as("src_b"), col("w")), Seq("w"))
      .filter(col("src") < col("src_b"))
      .groupBy(col("src").as("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    val pairs = sizes.select(col("src").as("src_a"), col("nv").as("nv_a"))
      .crossJoin(
        broadcast(sizes.select(col("src").as("src_b"), col("nv").as("nv_b"))))
      .filter(col("src_a") < col("src_b"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("nv_a"), col("nv_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"))
      .withColumn("jaccard_ppm",
        expr("n_inter * 1000000 div (nv_a + nv_b - n_inter)"))
  }
}
