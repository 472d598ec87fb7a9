package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Document-level term co-occurrence with PMI scoring — the corpus
  * association-mining pass (collocation discovery, topic seeding,
  * embedding-free relatedness) over the same normalized token stream the
  * dedup families ride. For terms a < b (lexicographic):
  * `pmi = ln(n_ab * N / (n_a * n_b))` where `n_x` counts DOCS containing
  * x (per-doc multiplicity never inflates the signal) and N is the
  * corpus size.
  *
  * The blowup hazard is the within-doc pair generation — quadratic in a
  * doc's distinct vocabulary terms — so the semantics are CAPPED by
  * definition, the standard co-occurrence practice: only the top
  * `maxVocab` corpus terms participate (by document frequency,
  * `(df DESC, term)` total order), and a doc contributes at most its
  * `maxTermsPerDoc` best-ranked vocab terms. Both caps are part of the
  * declared semantics and the oracle replays them exactly.
  *
  * Scale shape: the distinct `(doc, term)` stream shuffles once for the
  * doc-frequency agg (map-side combine); the vocab is a top-K
  * (TakeOrdered — never a single-partition window over the full term
  * set) and joins back as a BROADCAST; the per-doc cap window and the
  * pair self-join both key on the doc id (bounded groups ≤
  * maxTermsPerDoc, pairs ≤ cap²/2 per doc); the pair count agg map-side
  * combines boilerplate pairs. No corpus-sized broadcast, no cartesian.
  */
object Cooccur {

  /** `(term_a, term_b, n_ab, pmi)` for vocab pairs co-occurring in at
    * least `minPairCount` docs, `pmi` rounded 6dp.
    */
  def pmiPairs(
      docs: DataFrame,
      minPairCount: Long = 2L,
      maxVocab: Int = 10000,
      maxTermsPerDoc: Int = 1000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minPairCount >= 1, "pmiPairs: minPairCount must be >= 1")
    require(maxVocab >= 2, "pmiPairs: maxVocab must be >= 2")
    require(maxTermsPerDoc >= 2, "pmiPairs: maxTermsPerDoc must be >= 2")
    val dt = docs
      .select(col(idCol).as("__id"),
        explode(array_distinct(filter(Text.tokens(col(textCol)),
          t => t =!= ""))).as("__term"))
    val dfT = dt.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    // top-K by (df DESC, term): a distributed TakeOrdered; the rank
    // window runs AFTER the limit, over maxVocab rows only
    val vocab = dfT
      .orderBy(col("__df").desc, col("__term"))
      .limit(maxVocab)
      .withColumn("__rank",
        row_number().over(Window.orderBy(col("__df").desc, col("__term"))))
    val capped = dt
      .join(broadcast(vocab), Seq("__term"))
      .withColumn("__dr", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__rank"))))
      .filter(col("__dr") <= maxTermsPerDoc)
      .select(col("__id"), col("__term"), col("__df"))
    val pairs = capped.select(col("__id"), col("__term").as("term_a"),
        col("__df").as("__df_a"))
      .join(capped.select(col("__id"), col("__term").as("term_b"),
        col("__df").as("__df_b")), Seq("__id"))
      .filter(col("term_a") < col("term_b"))
      .groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).as("n_ab"),
        first(col("__df_a")).as("__na"), first(col("__df_b")).as("__nb"))
      .filter(col("n_ab") >= minPairCount)
    val total = docs.agg(count(lit(1)).as("__n_docs"))
    pairs.crossJoin(broadcast(total))
      .select(col("term_a"), col("term_b"), col("n_ab"),
        round(log(col("n_ab") * col("__n_docs") / (col("__na") * col("__nb"))), 6)
          .as("pmi"))
  }
}
