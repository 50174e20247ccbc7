package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("nameMatches: blocking is lossless vs brute force; pairs unique") {
    val matched = EntityResolution.nameMatches(spark, sf).collect()
    // brute force over the distinct-name space (the oracle's shape)
    val names = spark.read.parquet(s"$sf/part.parquet")
      .groupBy($"p_name").agg(min($"p_partkey").as("name_id"))
    val a = names.select($"name_id".as("id_a"), $"p_name".as("name_a"))
    val b = names.select($"name_id".as("id_b"), $"p_name".as("name_b"))
    val brute = a.crossJoin(b)
      .where($"id_a" < $"id_b" &&
        levenshtein($"name_a", $"name_b") <= 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(matched.map(r =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet === brute)
    assert(matched.length === brute.size, "no duplicate pair rows")
    assert(brute.nonEmpty, "fixture must exercise the matcher")
    matched.foreach { r =>
      assert(r.getAs[Int]("edit_dist") <= 1)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }

  test("nameMatches: delete-neighborhood catches separator edits the old " +
    "(pos, token) blocking missed") {
    // "redwidget" is lev 1 from "red widget" (space deletion) but shares
    // no (position, token) with it — the r13 blocking rewrite's witness;
    // brute force (and the DuckDB twin's shape) always found this pair
    val dir = java.nio.file.Files.createTempDirectory("graft_er_sep").toString
    Seq(
      (1L, "red widget"), (2L, "redwidget"),
      (3L, "blue bolt"), (4L, "blue bolts"),
      (5L, "cold gear")
    ).toDF("p_partkey", "p_name").write.parquet(s"$dir/part.parquet")
    val pairs = EntityResolution.nameMatches(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (3L, 4L)))
  }

  test("goldenRecords: entities partition names, conserve rows, min-id canon") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
    val nParts = parts.count()
    val nNames = parts.select($"p_name").distinct().count()
    val gold = EntityResolution.goldenRecords(spark, sf).collect()
    // every part row lands in exactly one entity
    assert(gold.map(_.getAs[Long]("n_parts")).sum === nParts)
    // variants partition the distinct-name space
    assert(gold.map(_.getAs[Long]("n_variants")).sum === nNames)
    // canonical name is the entity id's own name (min name_id of cluster)
    val idToName = parts.groupBy($"p_name")
      .agg(min($"p_partkey").as("name_id"))
      .collect().map(r => r.getAs[Long]("name_id") -> r.getAs[String]("p_name")).toMap
    gold.foreach { r =>
      assert(idToName(r.getAs[Long]("entity_id"))
        === r.getAs[String]("canonical_name"))
    }
    // matches must actually merge something on the fixture
    assert(gold.exists(_.getAs[Long]("n_variants") > 1L))
  }

  test("typoMatches: 1-deletion blocking lossless vs brute; DL beats lev") {
    graft.functions.GraftFunctions.register(spark)
    val out = EntityResolution.typoMatches(spark, sf).collect()
    // every typo is within DL 1 of its source by construction (an
    // adjacent swap costs 1, or 0 when the swapped bytes are equal), so
    // every distinct name must appear as its own typo's match
    val names = spark.read.parquet(s"$sf/part.parquet")
      .groupBy($"p_name").agg(min($"p_partkey").as("name_id"))
    assert(out.count(r =>
      r.getAs[Long]("typo_id") == r.getAs[Long]("name_id")) ==
      names.count())
    // blocking losslessness: blocked pairs == brute-force cross join at
    // DL <= 1 (the oracle re-proves this against DuckDB's kernel; this
    // test re-proves it in-engine so it can't rot between sweeps)
    val typos = out.map(r =>
      (r.getAs[Long]("typo_id"), r.getAs[String]("typo_text")))
      .distinct.toSeq.toDF("typo_id", "typo_text")
    val brute = typos.crossJoin(names)
      .where(expr("graft_dl(typo_text, p_name)") <= 1)
      .collect()
      .map(r => (r.getAs[Long]("typo_id"), r.getAs[Long]("name_id"))).toSet
    assert(out.map(r =>
      (r.getAs[Long]("typo_id"), r.getAs[Long]("name_id"))).toSet === brute)
    assert(out.length === brute.size, "no duplicate pair rows")
    // the leg's reason to exist: transpositions that plain levenshtein
    // misses at tau=1 (dl=1, lev=2) dominate the fixture
    assert(out.count(r => r.getAs[Boolean]("is_transposition") &&
      r.getAs[Int]("dl_dist") == 1 && r.getAs[Int]("lev_dist") == 2) >
      out.length / 2)
  }
}
