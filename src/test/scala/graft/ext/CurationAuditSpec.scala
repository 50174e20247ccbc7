package graft.ext

import graft.SparkSpec

/** Invariant pins for the r8 audit/tuning queries — properties that must
  * hold on ANY fixture (the oracle checks exact values at sf0.01; these
  * state WHY those values are right).
  */
class CurationAuditSpec extends SparkSpec {

  test("dedup_sensitivity: pair/doc counts are non-increasing in threshold") {
    val rows = Dedup.dedupSensitivity(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    rows.sliding(2).foreach {
      case Array((t1, p1, d1), (t2, p2, d2)) =>
        assert(p2 <= p1, s"pairs rose from $t1 to $t2")
        assert(d2 <= d1, s"docs rose from $t1 to $t2")
      case _ =>
    }
    // the floor threshold equals the artifact's own verify floor: every
    // maintained pair appears there
    assert(rows.head._1 === 0.5)
  }

  test("split_leakage_audit: the cluster split admits ZERO straddling pairs") {
    val byMethod = Curation.splitLeakageAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (clusterPairs, clusterStraddle) = byMethod("cluster")
    val (naivePairs, naiveStraddle) = byMethod("naive_doc")
    assert(clusterStraddle === 0L,
      "cluster-level split leaked a near-dup pair across splits")
    assert(clusterPairs === naivePairs, "both audits must see the same pairs")
    assert(naiveStraddle >= 0L && naiveStraddle <= naivePairs)
  }

  test("quality_threshold_by_lang: census is consistent and the cut is bounded") {
    val rows = TextStats.qualityThresholdByLang(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, _, n, cut, kept) =>
      assert(cut + kept === n, s"$lang census leaks rows")
      // strictly-below-the-rank-r-value count is < r = ceil(0.2 n)
      assert(cut < math.ceil(n * 0.2).toLong + 1, s"$lang cut too deep")
      assert(kept > 0, s"$lang kept nothing")
    }
  }

  test("copurchase_kcore: monotone peeling, consistent converged flag, degree bound") {
    val rows = Graph.copurchaseKCore(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq === (1 to rows.length))
    rows.sliding(2).foreach {
      case Array((_, n1, e1, _), (r2, n2, e2, conv2)) =>
        assert(n2 <= n1 && e2 <= e1, s"round $r2 grew the subgraph")
        assert(conv2 === (n2 == n1), s"round $r2 converged flag wrong")
      case _ =>
    }
    // a surviving k-core round supports at least k·n/2 edges
    rows.filter(_._4).foreach { case (r, n, e, _) =>
      assert(e * 2 >= 2L * n, s"round $r: converged subgraph under-degreed")
    }
  }

  test("curation_provenance: statuses partition docs; keepers are real and kept-or-cut consistently") {
    val rows = Curation.curationProvenance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length.toLong === nDocs, "provenance must cover every doc")
    val byId = rows.map(t => t._1 -> t).toMap
    rows.foreach { case (id, status, keeper) =>
      status match {
        case "cut_exact_dup" =>
          // an exact-dup keeper has IDENTICAL text, so it passes/fails
          // every content stage identically — it can only be kept or
          // fall to the content-independent sampling cut
          assert(keeper >= 0 && keeper < id, s"doc $id keeper=$keeper")
          val ks = byId(keeper)._2
          assert(ks == "kept" || ks == "cut_sample",
            s"doc $id lost to keeper $keeper which is itself $ks")
        case "cut_near_dup" =>
          // a NEAR-dup cluster representative (min doc_id) can have
          // different text from its members, so it may itself fail an
          // earlier content stage (e.g. C4) — only the structural
          // property holds: the keeper exists and has a smaller id
          assert(keeper >= 0 && keeper < id, s"doc $id keeper=$keeper")
          assert(byId.contains(keeper), s"doc $id keeper $keeper missing")
        case _ => assert(keeper === -1L, s"doc $id status=$status keeper set")
      }
    }
    // on this fixture the pipeline keeps something and cuts something
    assert(rows.exists(_._2 == "kept"))
    assert(rows.exists(_._2 != "kept"))
  }
}
