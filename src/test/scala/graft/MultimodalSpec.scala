package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.Multimodal

/** Multimodal plumbing on the sf0.001 testdata-derived media table:
  * binary content + typed metadata schema, partition-wise decode batch
  * shape, filter-before-decode, and frame fan-out. */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("mediaTable: binary content with consistent typed metadata") {
    val rows = Multimodal.mediaTable(spark, dir).limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("content").length.toLong === r.getAs[Long]("n_bytes"))
      assert(Set("image", "audio", "video").contains(r.getAs[String]("kind")))
    }
  }

  test("extractFeatures: fixed-dim deterministic features per row") {
    val f = Multimodal.extractFeatures(spark, dir).collect()
    val docs = Tables.documents(spark, dir).count()
    assert(f.length.toLong === docs)
    assert(f.forall(_.features.length === Multimodal.FeatureDim))
    // deterministic: re-running yields identical vectors
    val f2 = Multimodal.extractFeatures(spark, dir).collect()
      .map(x => x.media_id -> x.features.toSeq).toMap
    assert(f.forall(x => f2(x.media_id) === x.features.toSeq))
  }

  test("resizeImages: only image rows, metadata tracks new content") {
    val r = Multimodal.resizeImages(spark, dir, 64, 32).collect()
    assert(r.nonEmpty)
    r.foreach { m =>
      assert(m.kind === "image")
      assert(m.width === 64 && m.height === 32)
      assert(m.n_bytes === m.content.length.toLong)
      assert(m.content.length === 64 * 32 / 64)
    }
  }

  test("sampleFrames: n frames per video row, map-side fan-out") {
    val frames = Multimodal.sampleFrames(spark, dir, n = 4).collect()
    val videos = Multimodal.mediaTable(spark, dir)
      .filter(col("kind") === "video").count()
    assert(frames.length.toLong === videos * 4)
    assert(frames.map(_.frame_no).toSet === Set(0, 1, 2, 3))
  }

  test("stub decode is the documented byte-fold (oracle-replayable)") {
    // Recompute one row's features with an independent implementation
    // of the documented fold: channel c sums (byte - 127.5)/127.5 in
    // double over positions i % 32 == c, then one final float cast.
    val row = Multimodal.mediaTable(spark, dir)
      .select("media_id", "content").limit(1).collect().head
    val content = row.getAs[Array[Byte]]("content")
    val expected = {
      val acc = new Array[Double](Multimodal.FeatureDim)
      content.zipWithIndex.foreach { case (b, i) =>
        acc(i % Multimodal.FeatureDim) += ((b & 0xFF) - 127.5d) / 127.5d
      }
      acc.map(_.toFloat).toSeq
    }
    val got = Multimodal.extractFeatures(spark, dir)
      .filter(col("media_id") === row.getAs[Long]("media_id"))
      .collect().head.features.toSeq
    assert(got === expected)
  }

  test("featureNorms: per-kind gate rows with positive norms") {
    val n = Multimodal.featureNorms(spark, dir).collect()
    assert(n.map(_.getAs[String]("kind")).toSet === Set("image", "audio", "video"))
    n.foreach { r =>
      assert(r.getAs[Long]("n_items") > 0)
      assert(r.getAs[Double]("avg_norm") > 0.0)
      assert(r.getAs[Double]("max_norm") >= r.getAs[Double]("avg_norm"))
    }
  }

  test("mediaNearDups: byte-identical payloads pair at cosine 1, cross-kind never pairs") {
    // doc_ids 0 and 3 are both kind=image (id % 3 == 0) with identical
    // text -> identical byte-fold features -> cosine exactly 1.
    // doc 6 (image) has disjoint character content; docs 1/2 are other
    // kinds and must never pair with images regardless of similarity.
    val mdir = TestSpark.documentsFixture(Seq(
      (0L, "aaaa bbbb cccc dddd", "en", "s"),
      (3L, "aaaa bbbb cccc dddd", "en", "s"),
      (6L, "zz!? 019 ZZZZ !!!!", "en", "s"),
      (1L, "aaaa bbbb cccc dddd", "en", "s"),
      (2L, "aaaa bbbb cccc dddd", "en", "s")))
    val pairs = Multimodal.mediaNearDups(spark, mdir, threshold = 0.99).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"),
        r.getAs[String]("kind"), r.getAs[Double]("feature_cosine")))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 3L && p._3 == "image" && p._4 == 1.0))
    // no cross-kind pair can exist by construction
    assert(pairs.forall(p => (p._1 % 3) == (p._2 % 3)))
  }

  test("mediaProfile groups by kind with exact byte accounting") {
    val p = Multimodal.mediaProfile(spark, dir).collect()
    assert(p.map(_.getAs[String]("kind")).toSet === Set("image", "audio", "video"))
    val total = p.map(_.getAs[Long]("total_bytes")).sum
    val expected = Multimodal.mediaTable(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_bytes")).collect().head.getLong(0)
    assert(total === expected)
  }
}
