package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline: the composition a 100 TB corpus actually
  * runs before training — exact dedup → near-dup cluster resolution →
  * quality rules → benchmark decontamination — with ONE first-match
  * status per document and a survival report. Every stage is an operator
  * this library already oracle-checks individually; this query proves the
  * COMPOSITION matches too (the stages share scans/postings through the
  * persisted shingle frames, so the pipeline costs barely more than its
  * most expensive stage).
  *
  * Stage order (first match wins): exact_dup (not the min-id copy of its
  * text) → near_dup (in a >= 0.5-Jaccard cluster, not the canonical
  * min-id member) → rule reject (TextOps.filterReasons' first-match
  * reason) → contaminated (>= 3 shingles shared with an eval doc) → kept.
  */
object Curation {

  /** Per-document curation status — the doc-level view the report
    * aggregates (exposed for the API facade and specs).
    */
  def statuses(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val keepers = docs.groupBy("text").agg(min("doc_id").as("keep_id"))
    val exactDup = docs.join(keepers, Seq("text"))
      .where(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit(1).as("is_exact"))
    val nonCanon = Dedup.clusterLabels(s, d)
      .where(col("id") =!= col("lab"))
      .select(col("id").as("doc_id"), lit(1).as("is_near"))
    val contam = Dedup.contaminatedIds(s, d)
      .select(col("doc_id"), lit(1).as("is_contam"))
    docs.select("doc_id")
      .join(exactDup, Seq("doc_id"), "left_outer")
      .join(nonCanon, Seq("doc_id"), "left_outer")
      .join(TextOps.filterReasons(s, d), Seq("doc_id"))
      .join(contam, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("is_exact").isNotNull, "exact_dup")
          .when(col("is_near").isNotNull, "near_dup")
          .when(col("rule_reason") =!= "kept", col("rule_reason"))
          .when(col("is_contam").isNotNull, "contaminated")
          .otherwise("kept")
          .as("status"))
  }

  val entries: Seq[Q] = Seq(
    Q("q_curation_report",
      s"""WITH RECURSIVE ${Dedup.ngramPairsDuck},
         |${Dedup.ccDuck},
         |noncanon AS (SELECT doc_id FROM cc WHERE doc_id <> cluster_id),
         |keepers AS (SELECT text, min(doc_id) AS keep_id
         |  FROM documents GROUP BY text),
         |exactdup AS (SELECT d.doc_id FROM documents d
         |  JOIN keepers k ON d.text = k.text WHERE d.doc_id <> k.keep_id),
         |${TextOps.ruleReasonDuck},
         |bench AS (SELECT doc_id AS bench_id, hsh FROM e WHERE doc_id < 10),
         |train AS (SELECT doc_id, hsh FROM e WHERE doc_id >= 10),
         |contam AS (SELECT DISTINCT doc_id FROM (
         |    SELECT t.doc_id, bn.bench_id, count(*) AS n_shared
         |    FROM train t JOIN bench bn ON t.hsh = bn.hsh
         |    GROUP BY 1, 2) o WHERE n_shared >= 3),
         |st AS (SELECT d.doc_id,
         |    CASE
         |      WHEN ed.doc_id IS NOT NULL THEN 'exact_dup'
         |      WHEN nc.doc_id IS NOT NULL THEN 'near_dup'
         |      WHEN r.rule_reason <> 'kept' THEN r.rule_reason
         |      WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
         |      ELSE 'kept' END AS status
         |  FROM documents d
         |  LEFT JOIN exactdup ed ON d.doc_id = ed.doc_id
         |  LEFT JOIN noncanon nc ON d.doc_id = nc.doc_id
         |  JOIN rr r ON d.doc_id = r.doc_id
         |  LEFT JOIN contam ct ON d.doc_id = ct.doc_id)
         |SELECT status, count(*) AS n_docs
         |FROM st GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      statuses(s, d)
        .groupBy("status")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("status")
    }
  )
}
