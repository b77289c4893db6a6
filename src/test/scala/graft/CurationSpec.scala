package graft

import org.apache.spark.sql.functions._

/** Properties of the training-data curation operators (llm/Curation.scala):
  * sampling determinism + stratification, chunk geometry + reconstruction,
  * mask completeness, quality-flag conjunction, containment ≥ Jaccard.
  */
class CurationSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  test("sample_stratified_hash: deterministic, stratified, subset") {
    val q = SparkEntry.queries("sample_stratified_hash")
    val s1 = q(spark, sf).collect().map(_.getLong(0)).toSeq
    val s2 = q(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(s1 === s2) // hash-based: bit-identical across runs
    val docs = Tables.documents(spark, sf)
    val byLang = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptByLang = q(spark, sf).groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-downsampled languages keep every doc
    for (l <- byLang.keySet -- Set("en", "de"))
      assert(keptByLang.getOrElse(l, 0L) === byLang(l))
    // downsampled languages keep roughly their configured rate
    val enRate = keptByLang.getOrElse("en", 0L).toDouble / byLang("en")
    assert(enRate > 0.05 && enRate < 0.5, s"en keep rate $enRate")
  }

  test("sample_split: splits partition the corpus at the declared rates") {
    val rows = SparkEntry.queries("sample_split")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum === total) // exactly one split per doc
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    val trainFrac = bySplit("train").toDouble / total
    assert(trainFrac > 0.85 && trainFrac < 0.95, s"train frac $trainFrac")
    // char volume is conserved too
    val chars = Tables.documents(spark, sf).agg(sum($"n_chars")).head.getLong(0)
    assert(rows.map(_._4).sum === chars)
  }

  test("curation_keep_best: one survivor per text-hash cluster, max quality wins") {
    val kept = SparkEntry.queries("curation_keep_best")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", md5(lower(trim($"text"))).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val clusters = docs.groupBy(_._2)
    assert(kept.length === clusters.size) // exactly one survivor per cluster
    assert(kept.map(_._3).sum === docs.length.toLong) // sizes tile the corpus
    // the survivor's score is the cluster max: no member of the survivor's
    // cluster may out-score it (scores live on the full quality frame)
    val scoreOf = Tables.documents(spark, sf).select($"doc_id",
        (length($"text").between(60, 520).cast("int") +
         (size(split(trim($"text"), " ")) >= 15).cast("int") +
         (length(regexp_replace($"text", " ", "")) >= size(split(trim($"text"), " ")) * 2 &&
          length(regexp_replace($"text", " ", "")) <= size(split(trim($"text"), " ")) * 12).cast("int") +
         ((length($"text") - length(regexp_replace($"text", "[0-9]", ""))) * 10 <
          length($"text") * 3).cast("int")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hOf = docs.toMap
    for ((id, s, _) <- kept) {
      assert(s === scoreOf(id), s"doc $id reported score")
      val clusterMax = clusters(hOf(id)).map(m => scoreOf(m._1)).max
      assert(s === clusterMax, s"doc $id is not the best of its cluster")
    }
  }

  test("text_chunk: window/stride geometry and first-chunk reconstruction") {
    val chunks = SparkEntry.queries("text_chunk")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val tokens = Tables.documents(spark, sf)
      .select($"doc_id", split(trim($"text"), " ").as("w")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet === tokens.keySet) // every doc chunks (nw >= 1 always)
    for ((id, cs) <- byDoc) {
      val nw = tokens(id).size
      assert(cs.length === (nw - 1) / 40 + 1, s"doc $id chunk count")
      assert(cs.forall(c => c._4 >= 1 && c._4 <= 50))
      val first = cs.find(_._2 == 0L).get
      assert(first._3 === tokens(id).take(50).mkString(" "), s"doc $id chunk 0")
      // each chunk holds exactly the window clipped at the doc end
      for ((_, cid, _, n) <- cs)
        assert(n === math.min(50L, nw - 40L * cid), s"doc $id chunk $cid size")
      // the final chunk reaches the last token exactly
      val lastCid = cs.map(_._2).max
      assert(40L * lastCid + cs.find(_._2 == lastCid).get._4 === nw.toLong,
        s"doc $id tail coverage")
    }
  }

  test("text_pii_mask: planted email and number are scrubbed, lengths consistent") {
    val masked = SparkEntry.queries("text_pii_mask")(spark, sf).collect()
    masked.foreach { r =>
      val m = r.getString(1)
      assert(!m.matches(".*[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}.*"))
      assert(r.getLong(2) === m.length.toLong)
    }
    // direct plant through the same declared pipeline on a scratch corpus
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    Seq((1L, "reach me at jane.doe+spam@example.org or 415-555-0182 today", "en", "t", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_pii_mask")(spark, dir).collect().head.getString(1)
    assert(out === "reach me at <EMAIL> or <NUM> today")
  }

  test("quality_filter_pipeline: keep is the conjunction of its flags") {
    val rows = SparkEntry.queries("quality_filter_pipeline")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(5) ===
        (r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)))
    }
    // the fixture corpus is clean synthetic text: most docs should survive
    assert(rows.count(_.getBoolean(5)) > rows.length / 2)
  }

  test("sample_group_cap: hard per-language budget, deterministic") {
    val q = SparkEntry.queries("sample_group_cap")
    val rows = q(spark, sf).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = rows.groupBy(_._2)
    val totals = Tables.documents(spark, sf).groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, rs) <- byLang) {
      assert(rs.length <= 60, s"$lang over cap")
      assert(rs.length === math.min(60L, totals(lang)).toInt, s"$lang under-filled")
      assert(rs.map(_._3).sorted === (1L to rs.length).toSeq, s"$lang ranks")
    }
    assert(q(spark, sf).collect().map(_.getLong(0)).toSeq ===
      rows.map(_._1).toSeq) // deterministic across runs
  }

  test("dedup_containment dominates dedup_ngram_jaccard per doc") {
    val cont = SparkEntry.queries("dedup_containment")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val jacc = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cont.values.forall(c => c >= 0.0 && c <= 1.0))
    // |∩|/|A| ≥ |∩|/|∪| for every pair, and containment scans a superset
    // of jaccard's (a<b) pair set — small epsilon for the round-to-6-places
    for ((id, j) <- jacc; c <- cont.get(id))
      assert(c >= j - 1e-6, s"doc $id containment $c < jaccard $j")
  }
}
