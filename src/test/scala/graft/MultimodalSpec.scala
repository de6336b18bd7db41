package graft

import graft.functions.Bmp

/** The multimodal tier: binary encoding, partition-batched decode, feature
  * shape — and since round 8 a REAL pure-JVM BMP codec (header parse,
  * bottom-up padded BGR rows) exercised on actual image bytes.
  */
class MultimodalSpec extends SparkSpec {

  test("Bmp round-trip is byte-exact on pixels, incl. padded widths") {
    // widths 1..5 cover every rowPad value (1->1, 2->2, 3->3, 4->0, 5->1)
    for (w <- 1 to 5; h <- Seq(1, 3, 4)) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val file = Bmp.encode24(w, h, rgb)
      val (dw, dh, out) = Bmp.decode24(file)
      assert((dw, dh) === ((w, h)), s"dims ${w}x$h")
      assert(out.toSeq === rgb.toSeq, s"pixels ${w}x$h")
      // stored size: 54-byte header + padded rows
      assert(file.length === 54 + (w * 3 + Bmp.rowPad(w)) * h)
    }
  }

  test("Bmp decode parses a hand-built reference file, not just its own output") {
    // 2x1 image, pixels: left=RGB(1,2,3), right=RGB(250,251,252).
    // Stored: one bottom-up row, BGR order, padded to 8 bytes.
    val header = Array[Int](
      'B', 'M', 62, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 1, 0, 0, 0, // info: size, w=2, h=1
      1, 0, 24, 0, 0, 0, 0, 0, 8, 0, 0, 0, // planes, bpp, BI_RGB, imgSize
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) // res + palette
    val row = Array[Int](3, 2, 1, 252, 251, 250, 0, 0) // BGR,BGR,pad
    val file = (header ++ row).map(_.toByte)
    val (w, h, rgb) = Bmp.decode24(file)
    assert((w, h) === ((2, 1)))
    assert(rgb.map(_ & 0xff).toSeq === Seq(1, 2, 3, 250, 251, 252))
  }

  test("Bmp decode rejects corrupt input instead of returning garbage") {
    val good = Bmp.encode24(3, 2, Array.fill(18)(7.toByte))
    intercept[IllegalArgumentException](Bmp.decode24(good.take(53))) // truncated header
    intercept[IllegalArgumentException](Bmp.decode24(good.dropRight(1))) // truncated pixels
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Bmp.decode24(badMagic))
    val badBpp = good.clone(); badBpp(28) = 8.toByte
    intercept[IllegalArgumentException](Bmp.decode24(badBpp))
    val badComp = good.clone(); badComp(30) = 1.toByte // BI_RLE8
    intercept[IllegalArgumentException](Bmp.decode24(badComp))
  }

  test("q_mm_decode decodes real BMP fixtures for every non-empty document") {
    import org.apache.spark.sql.functions._
    val nDocs = Tables.documents(spark, sfDir)
      .where(length(col("text")) > 0).count()
    val rows = SparkEntry.queries("q_mm_decode")(spark, sfDir).collect()
    assert(rows.length.toLong === nDocs)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      assert(w >= 1 && w <= 13 && h >= 1 && h <= 7, s"dims $w x $h")
      assert(r.getAs[Long]("n_px_bytes") === w * h * 3)
      assert(r.getAs[Double]("f_max") <= 255.0)
    }
  }

  test("mapPartitions feature extraction covers every document") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val feats = SparkEntry.queries("q_mm_features")(spark, sfDir).collect()
    assert(feats.length.toLong === nDocs)
    // f_len equals the utf-8 byte length reported by q_mm_meta
    val meta = SparkEntry.queries("q_mm_meta")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    feats.foreach { r =>
      assert(r.getDouble(1) === meta(r.getLong(0)).toDouble)
    }
  }

  test("chunking reassembles: chunk lengths sum to doc length, hashes chain") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_mm_chunks")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docLens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .where(col("n") > 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet === docLens.keySet)
    byDoc.foreach { case (id, cs) =>
      assert(cs.map(_._3).sum === docLens(id), s"doc $id chunk-length sum")
      assert(cs.map(_._2).sorted.toSeq === (1L to cs.length), s"doc $id idx")
      // every chunk except the last is exactly 64 units
      assert(cs.sortBy(_._2).dropRight(1).forall(_._3 == 64L), s"doc $id sizes")
    }
  }

  test("chunk dedup: exact payload copies pair up, disjoint payloads don't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mmdedup").toString
    val big = (1 to 40).map(i => f"block$i%04d payload segment").mkString(" ")
    val other = (1 to 40).map(i => f"wholly$i%04d different bytes").mkString(" ")
    Seq(
      (1L, big, "en", "s", big.length.toLong),
      (2L, big, "en", "s", big.length.toLong), // byte-identical re-upload
      (3L, "tiny", "en", "s", 4L), // < 3 chunks: can never pair
      (4L, other, "en", "s", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("q_mm_dedup")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }
}
