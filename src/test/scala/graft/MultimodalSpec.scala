package graft

import graft.operators.Multimodal

class MultimodalSpec extends GraftSpec {

  test("media table has binary payload + kind metadata") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction preserves rows, emits fixed-width feature vectors") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val feats = Multimodal.extractFeatures(spark, media, partitions = 4)
    assert(feats.count() == media.count())
    feats.collect().foreach { r =>
      val f = r.getSeq[Double](r.fieldIndex("feat"))
      assert(f.length == 8)
      assert(f.forall(v => v >= 0.0 && v <= 1.0))
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 576)
    }
  }

  test("stub decode is deterministic across partition counts") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val a = Multimodal.extractFeatures(spark, media, 2)
      .select("id", "checksum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Multimodal.extractFeatures(spark, media, 16)
      .select("id", "checksum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
