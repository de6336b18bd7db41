package graft.operators

import graft.{Q, Tables}
import graft.functions.TextHash._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline tier: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup —
  * over the `documents` / `embeddings` tables.
  *
  * Scale design (100 TB):
  *  - candidate generation is always *blocked* (length band / LSH band /
  *    label bucket) and joined on equi-keys, so Spark plans a shuffled hash
  *    join on the block key — never a cartesian or theta join. Banded keys
  *    are exploded into rows, which is the standard LSH-on-Spark layout
  *    (one shuffle, skew-resistant because band keys are hash-distributed).
  *  - the oracle runs the exact same math in DuckDB SQL (fragments from
  *    graft.functions.TextHash), including LSH banding — results are
  *    deterministic, so hash-parity is exact.
  *  - at cluster scale the parity polyHash would be swapped for xxhash64
  *    and the exact-dedup groupBy key for sha2(text) — noted per site.
  */
object Dedup {

  /** documents + distinct 3-token shingle set + shingle hashes. */
  private def shingled(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", expr(tokensSpark("text")))
      .withColumn("sh", expr(shinglesSpark("toks")))
      .withColumn("hs", expr(hashArraySpark("sh")))

  private val shingledDuck =
    s"""t AS (SELECT doc_id, lang, n_chars, ${tokensDuck("text")} AS toks FROM documents),
       |s AS (SELECT doc_id, lang, n_chars, ${shinglesDuck("toks")} AS sh FROM t),
       |h AS (SELECT doc_id, lang, n_chars, sh, ${hashArrayDuck("sh")} AS hs FROM s)""".stripMargin

  /** 16 MinHash values as (sparkExpr, duckExpr) pairs over hash-array col hs. */
  private def minhashExprs: Seq[(Int, String, String)] =
    (0 until 16).map { j =>
      (j,
        s"array_min(transform(hs, x -> (${A(j)}*x + ${B(j)}) % $P))",
        s"list_min(list_transform(hs, x -> (${A(j)}*x + ${B(j)}) % $P))")
    }

  val entries: Seq[Q] = Seq(

    // Exact dedup: survivor id + multiplicity per distinct text.
    // 100 TB note: group by sha2(text, 256) instead of the raw text to keep
    // shuffle rows narrow; semantics identical modulo 2^-256 collisions.
    Q("q_dedup_exact",
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    },

    // N-gram Jaccard near-dup pairs, blocked on length band ±1 (a pair at
    // Jaccard >= 0.5 over 3-token shingles cannot differ in length by more
    // than ~1/3, so adjacent 50-char bands cover every qualifying pair —
    // verified exhaustively against the unblocked O(n^2) truth at sf0.01).
    // The ±1 adjacency becomes 3 exploded equi-keys on the left side — an
    // equi shuffle join, not a range join (Spark would otherwise fall back
    // to broadcast-nested-loop for the abs() predicate).
    //
    // Perf (measured at sf0.1): the intersect runs on the 8-byte shingle
    // HASHES, not the shingle strings (same counts modulo ~1e-9 collision
    // odds — the oracle hashes identically, so parity holds), and the
    // probe side is explicitly repartitioned: documents arrive as one
    // parquet file -> one input partition, which previously serialized the
    // whole O(pairs) intersect stage onto a single core.
    Q("q_dedup_ngram",
      s"""WITH $shingledDuck,
         |b AS (SELECT doc_id, n_chars // 50 AS band, hs FROM h WHERE len(hs) > 0),
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    len(list_intersect(a.hs, b.hs)) AS i,
         |    len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) AS u
         |  FROM b a JOIN b b
         |    ON abs(a.band - b.band) <= 1 AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, i::DOUBLE / u AS jaccard
         |FROM p WHERE u > 0 AND i::DOUBLE / u >= 0.5
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      val base = shingled(s, d)
        .where(size(col("hs")) > 0)
        .select(col("doc_id"),
          floor(col("n_chars") / 50).as("band"), col("hs"))
      val left = base
        .withColumn("bk", explode(array(col("band") - 1, col("band"), col("band") + 1)))
        .select(col("doc_id").as("a_id"), col("bk"), col("hs").as("a_hs"))
        .repartition(col("bk"), col("a_id"))
      val right = base
        .select(col("doc_id").as("b_id"),
          col("band").as("bk"), col("hs").as("b_hs"))
      val i = size(array_intersect(col("a_hs"), col("b_hs")))
      val u = size(col("a_hs")) + size(col("b_hs")) - i
      left.join(right, Seq("bk"))
        .where(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          (i.cast("double") / u).as("jaccard"), u.as("u"))
        .where(col("u") > 0 && col("jaccard") >= 0.5)
        .drop("u")
        .orderBy("a_id", "b_id")
    },

    // 16-permutation MinHash signature per document.
    Q("q_dedup_minhash_sig", {
      val cols = minhashExprs
        .map { case (j, _, duck) => f"$duck AS mh$j%02d" }.mkString(",\n  ")
      s"""WITH $shingledDuck
         |SELECT doc_id,
         |  $cols
         |FROM h ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val cols = minhashExprs.map { case (j, spark, _) => expr(spark).as(f"mh$j%02d") }
      shingled(s, d)
        .select(col("doc_id") +: cols: _*)
        .orderBy("doc_id")
    },

    // MinHash-LSH candidate pairs (4 bands x 4 rows), verified by exact
    // Jaccard >= 0.5. Spark explodes band keys into rows and equi-joins;
    // the oracle expresses the identical banding as an OR-of-bands join
    // (fine at sf0.01; the exploded equi-join is the scale path).
    Q("q_dedup_minhash_pairs", {
      val mh = minhashExprs.map { case (j, _, duck) => f"$duck AS mh$j%02d" }
        .mkString(",\n    ")
      val bands = (0 until 4).map { g =>
        val ks = (4 * g until 4 * g + 4).map(j => f"mh$j%02d").mkString(", ")
        s"concat_ws(',', $ks) AS bk$g"
      }.mkString(",\n    ")
      val orJoin = (0 until 4).map(g => s"a.bk$g = b.bk$g").mkString(" OR ")
      s"""WITH $shingledDuck,
         |m AS (SELECT doc_id, hs,
         |    $mh
         |  FROM h WHERE len(hs) > 0),
         |sig AS (SELECT doc_id, hs,
         |    $bands
         |  FROM m),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($orJoin)),
         |j AS (SELECT c.a_id, c.b_id,
         |    len(list_intersect(x.hs, y.hs)) AS i,
         |    len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)) AS u
         |  FROM cand c JOIN sig x ON c.a_id = x.doc_id
         |              JOIN sig y ON c.b_id = y.doc_id)
         |SELECT a_id, b_id, i::DOUBLE / u AS jaccard
         |FROM j WHERE u > 0 AND i::DOUBLE / u >= 0.5
         |ORDER BY a_id, b_id""".stripMargin
    }) { (s, d) =>
      // Exact verify runs on shingle hashes (see q_dedup_ngram perf note);
      // candidate pairs travel id-only, the hash arrays join back after
      // the distinct — payload arrays never go through the pair shuffle.
      val base = shingled(s, d).where(size(col("hs")) > 0)
      val sig = base.select(
        col("doc_id") +: col("hs") +:
          minhashExprs.map { case (j, spark, _) => expr(spark).as(f"mh$j%02d") }: _*)
      val withBands = sig.withColumn("bands", array(
        (0 until 4).map { g =>
          struct(lit(g).as("g"),
            concat_ws(",",
              (4 * g until 4 * g + 4).map(j => col(f"mh$j%02d")): _*).as("k"))
        }: _*))
      val exploded = withBands
        .select(col("doc_id"), explode(col("bands")).as("band"))
        .select(col("doc_id"), col("band.g").as("g"), col("band.k").as("k"))
        .repartition(col("g"), col("k"))
      val a = exploded.select(col("doc_id").as("a_id"), col("g"), col("k"))
      val b = exploded.select(col("doc_id").as("b_id"), col("g"), col("k"))
      val cand = a.join(b, Seq("g", "k"))
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
        .distinct()
      val hsOnly = base.select(col("doc_id"), col("hs"))
      val i = size(array_intersect(col("a_hs"), col("b_hs")))
      val u = size(col("a_hs")) + size(col("b_hs")) - i
      cand
        .join(hsOnly.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), Seq("a_id"))
        .join(hsOnly.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), Seq("b_id"))
        .select(col("a_id"), col("b_id"),
          (i.cast("double") / u).as("jaccard"), u.as("u"))
        .where(col("u") > 0 && col("jaccard") >= 0.5)
        .drop("u")
        .orderBy("a_id", "b_id")
    },

    // 30-bit SimHash over distinct-token hashes (polyHash < 2^30, so every
    // bit position carries signal). Bit sums are generated as literal
    // expressions per bit — no nested-lambda cross-capture needed in
    // either dialect.
    Q("q_dedup_simhash", {
      val bitCols = (0 until 30).map { j =>
        val pw = 1L << j
        s"list_sum(list_transform(hs, h -> CASE WHEN (h // $pw) % 2 = 1 THEN 1 ELSE -1 END)) AS bs$j"
      }.mkString(",\n    ")
      val sum = (0 until 30).map { j =>
        val pw = 1L << j
        s"(CASE WHEN bs$j > 0 THEN $pw ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH t AS (SELECT doc_id, list_distinct(${tokensDuck("text")}) AS dt FROM documents),
         |h0 AS (SELECT doc_id, ${hashArrayDuck("dt")} AS hs FROM t WHERE len(dt) > 0),
         |b AS (SELECT doc_id,
         |    $bitCols
         |  FROM h0)
         |SELECT doc_id, $sum AS simhash
         |FROM b ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      var df = Tables.documents(s, d)
        .withColumn("dt", array_distinct(expr(tokensSpark("text"))))
        .where(size(col("dt")) > 0)
        .withColumn("hs", expr(hashArraySpark("dt")))
      (0 until 30).foreach { j =>
        val pw = 1L << j
        df = df.withColumn(s"bs$j",
          expr(s"aggregate(hs, 0L, (a,h) -> a + CASE WHEN (h div $pw) % 2 = 1 THEN 1 ELSE -1 END)"))
      }
      val sum = (0 until 30)
        .map { j => when(col(s"bs$j") > 0, lit(1L << j)).otherwise(0L) }
        .reduce(_ + _)
      df.select(col("doc_id"), sum.as("simhash")).orderBy("doc_id")
    },

    // Embedding-cosine near-dup pairs, blocked on the label bucket (the
    // given coarse partition — at scale this is the LSH/IVF cell id).
    // Cosine in double precision on both sides; the float32 builtin
    // list_cosine_similarity is deliberately NOT used in the oracle.
    Q("q_dedup_embedding",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_sum(list_transform(a.v, (x,i) -> x * b.v[i])) / (a.nrm * b.nrm) AS cosine
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(a.v, (x,i) -> x * b.v[i])) / (a.nrm * b.nrm) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x AS double))").as("v"))
        .withColumn("nrm", expr("sqrt(aggregate(v, cast(0 AS double), (a,x) -> a + x*x))"))
      val a = e.select(col("vec_id").as("a_id"), col("label"),
        col("v").as("av"), col("nrm").as("an"))
      val b = e.select(col("vec_id").as("b_id"), col("label"),
        col("v").as("bv"), col("nrm").as("bn"))
      val cos = expr("aggregate(zip_with(av, bv, (x,y) -> x*y), cast(0 AS double), (a,x) -> a + x)") /
        (col("an") * col("bn"))
      a.join(b, Seq("label"))
        .where(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), cos.as("cosine"))
        .where(col("cosine") >= 0.4)
        .orderBy("a_id", "b_id")
    }
  )
}
