package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** MinHash+LSH invariants on generated corpora: exact duplicates have
  * identical signatures, so they ALWAYS share every band bucket and
  * survive verification at Jaccard exactly 1.0 — LSH is probabilistic
  * for near-dups but deterministic for true dups. Also q23/q24/q43
  * agreement: every exact-dup pair q23 collapses appears in q24's
  * verified pairs and lands in one q43 component.
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Gen.oneOf(
    "scan", "filter", "merge", "join", "sort", "group", "window", "stream",
    "batch", "query", "table", "data", "spark", "the", "a")

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("exact duplicates always survive LSH + verification at jacc = 1.0") {
    withTempDir { dir =>
      // 8 random base docs; docs 100+i duplicate doc i for i in 0..3
      val bases = Gen.listOfN(8, Gen.listOfN(20, vocab)).sample.get
        .map(_.mkString(" "))
      val docs = bases.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
        (0 until 4).map(i => (100L + i, bases(i)))
      writeDocs(dir, docs)
      val pairs = DedupQueries.q24MinhashLsh.fn(spark, dir)
        .select("d1", "d2", "jacc").as[(Long, Long, Double)].collect()
        .map(p => (p._1, p._2) -> p._3).toMap
      (0 until 4).foreach { i =>
        withClue(s"dup pair ($i, ${100 + i}): ") {
          pairs.get((i.toLong, 100L + i)) shouldBe Some(1.0)
        }
      }
    }
  }

  test("q23 groups, q24 pairs, and q43 components agree on exact dups") {
    withTempDir { dir =>
      val t1 = "p q r s t u v w x y"
      val t2 = "a b c d e f g h i j"
      writeDocs(dir, Seq(1L -> t1, 2L -> t1, 3L -> t1, 10L -> t2, 11L -> t2,
        20L -> "solo doc with nothing shared"))
      // q23: one survivor per fingerprint group, with the right copy count
      val q23 = DedupQueries.q23DedupExact.fn(spark, dir)
        .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
      q23(1L) shouldBe 3L
      q23(10L) shouldBe 2L
      q23(20L) shouldBe 1L
      q23.keySet shouldBe Set(1L, 10L, 20L)
      // q24: every within-group pair verified at 1.0
      val q24 = DedupQueries.q24MinhashLsh.fn(spark, dir)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)).subsetOf(q24) shouldBe true
      // q43: groups collapse to min-id components; solo doc absent
      val comp = DedupQueries.q43DedupComponents.fn(spark, dir)
        .as[(Long, Long)].collect().toMap
      comp(2L) shouldBe 1L
      comp(3L) shouldBe 1L
      comp(11L) shouldBe 10L
      comp.contains(20L) shouldBe false
    }
  }

  test("q59 keeps exactly one doc per cluster plus singletons") {
    withTempDir { dir =>
      val t1 = "p q r s t u v w x y"
      val t2 = "a b c d e f g h i j"
      writeDocs(dir, Seq(1L -> t1, 2L -> t1, 3L -> t1, 10L -> t2, 11L -> t2,
        20L -> "solo doc with nothing shared"))
      val row = DedupQueries.q59DedupMaterialize.fn(spark, dir)
        .select("lang", "n_docs", "n_kept", "n_dropped")
        .as[(String, Long, Long, Long)].collect().toList
      // 6 docs: {1,2,3} keep 1, {10,11} keep 10, 20 is a singleton -> 3 kept
      row shouldBe List(("en", 6L, 3L, 3L))
    }
  }

  test("q61 flags a planted contaminated doc, not an unrelated one") {
    withTempDir { dir =>
      // doc 0 is BENCHMARK (0 % 97 = 0); doc 5 copies an 8-token run from
      // it (>= 3 shared 3-shingles); doc 6 shares nothing
      val benchText = "alpha beta gamma delta epsilon zeta eta theta"
      writeDocs(dir, Seq(
        0L -> benchText,
        5L -> ("intro words then " + benchText + " trailing bits"),
        6L -> "completely different content with no overlap at all"))
      val pairs = DedupQueries.q61Decontaminate.fn(spark, dir)
        .select("doc_id", "bench_doc").as[(Long, Long)].collect().toSet
      pairs should contain((5L, 0L))
      pairs.map(_._1) should not contain 6L
    }
  }

  test("q63 boilerplate: planted shared phrase flags its docs only") {
    withTempDir { dir =>
      // 6 docs; docs 1-3 share a phrase (shingle df=3 >= floor 2);
      // docs 4-6 are fully unique -> ratio 0
      val phrase = "shared boiler plate phrase here"
      val docs = (1L to 3L).map(i => i -> s"$phrase unique$i tail$i") ++
        (4L to 6L).map(i => i -> s"only$i unique$i words$i content$i never$i")
      writeDocs(dir, docs)
      val row = DedupQueries.q63Boilerplate.fn(spark, dir)
        .select("n_docs", "n_flagged", "max_ratio")
        .as[(Long, Long, Double)].collect().head
      row._1 shouldBe 6L
      row._2 should be >= 1L   // the phrase-sharing docs cross 0.2
      row._3 should be > 0.0
      // and a corpus of fully unique docs flags nothing (df floor of 2)
      writeDocs(dir, (1L to 6L).map(i =>
        i -> s"a$i b$i c$i d$i e$i f$i g$i"))
      val clean = DedupQueries.q63Boilerplate.fn(spark, dir)
        .select("n_flagged", "max_ratio").as[(Long, Double)].collect().head
      clean shouldBe ((0L, 0.0))
    }
  }

  test("q60 admission accounting: statuses partition the batch") {
    // on the real fixture so all three statuses occur (verified non-zero
    // at sf0.01 during oracle design; sf0.001 exercises the invariant)
    val rows = DedupQueries.q60IncrementalDedup.fn(spark, "/root/testdata/sf0.001")
      .select("n_batch", "n_admitted", "n_dup_corpus", "n_dup_batch")
      .as[(Long, Long, Long, Long)].collect()
    rows should not be empty
    rows.foreach { case (b, a, c, ib) =>
      a + c + ib shouldBe b
      a should be > 0L
    }
  }

  test("q180 SNM equals a flat-global-rank window dedup on random " +
      "corpora — the distributed rank construction is exact") {
    withTempDir { dir =>
      import org.apache.spark.sql.expressions.Window
      val bases = Gen.listOfN(30, Gen.listOfN(12, vocab)).sample.get
        .map(_.mkString(" "))
      // near-dups share the prefix (token appended at the END), so some
      // land inside the window and exercise the verified path
      val docs = bases.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
        (0 until 8).map(i => (200L + i, bases(i) + " extra"))
      writeDocs(dir, docs)
      // reference: single-partition global row_number + brute-force
      // range self-join + composed-functions jaccard — the DELIBERATELY
      // serial oracle model (source of this suite's `WindowExec: No
      // Partition Defined` log warnings; 30-row corpus, never a query
      // path — those are policed by GlobalWindowPolicySpec)
      val raw = spark.read.parquet(s"$dir/documents.parquet")
      val flat = raw
        .select(col("doc_id"), lower(substring(col("text"), 1, 24)).as("k"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("k"), col("doc_id"))))
      val a = flat.select(col("doc_id").as("i1"), col("rn").as("rn1"))
      val b = flat.select(col("doc_id").as("i2"), col("rn").as("rn2"))
      val sh = raw.select(col("doc_id"),
        array_distinct(graft.engine.ext.Text.shingles(
          split(col("text"), " "), 3)).as("sh"))
      val expected = a.join(b,
          col("rn2") > col("rn1") && col("rn2") <= col("rn1") + 3)
        .select(least(col("i1"), col("i2")).as("d1"),
          greatest(col("i1"), col("i2")).as("d2"))
        .join(sh.select(col("doc_id").as("d1"), col("sh").as("s1")), Seq("d1"))
        .join(sh.select(col("doc_id").as("d2"), col("sh").as("s2")), Seq("d2"))
        .select(col("d1"), col("d2"),
          (org.apache.spark.sql.functions.size(array_intersect(
            col("s1"), col("s2"))).cast("double") /
            org.apache.spark.sql.functions.size(array_union(
              col("s1"), col("s2")))).as("jacc"))
        .filter(col("jacc") >= 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val got = DedupQueries.q180SortedNeighborhood.fn(spark, dir)
        .select("d1", "d2", "jacc")
        .as[(Long, Long, Double)].collect().toSet
      expected should not be empty
      got shouldBe expected
    }
  }
}
