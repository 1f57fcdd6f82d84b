package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Curation, LlmOps}

/** Curation operators: prefix-filtered exact set-similarity join,
  * distributed k-means, weighted reservoir sampling. The DuckDB oracle
  * gate hash-checks all three against independent SQL re-derivations
  * every driver run; these specs assert the algorithmic properties the
  * hash compare can't express — prefix-filter COMPLETENESS against a
  * full inverted-index join, the k-means monotone-objective invariant,
  * and an independent Scala re-derivation of the A-ES selection.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_join_setsim finds EXACTLY the pairs a full inverted-index join finds") {
    import spark.implicits._
    // reference: brute-force via the full gram inverted index (every
    // gram joins, not just the prefix) — the plan prefix filtering must
    // not lose a single pair from
    val grams = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) => Curation.threeGrams(t).map(g => (id, g)) }
      .toDF("doc_id", "gram")
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val full = grams.alias("a").join(grams.alias("b"),
        $"a.gram" === $"b.gram" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .where($"inter" * 3 >= $"na" + $"nb")
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = Curation.qJoinSetsim(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == full, "prefix filtering must be lossless at tau=0.5")
    assert(full.nonEmpty, "vacuous corpus — no pairs to verify")
  }

  test("q_join_setsim prefix is strictly smaller than the full gram set") {
    // the filter must actually filter: candidate-side gram rows < full
    // gram rows (otherwise the 'scale path' is the inverted index again)
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) => Curation.threeGrams(t).map(g => (id, g)) }
      .toDF("doc_id", "gram")
    val fullRows = docs.count()
    // prefix length for tau=0.5 is n - ceil(n/2) + 1 ~ n/2 + 1
    val prefixRows = docs.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .agg(sum((col("n") - ((col("n") + 1) / lit(2)).cast("long") + 1)))
      .head.getLong(0)
    assert(prefixRows * 3 < fullRows * 2,
      s"prefix ($prefixRows rows) should be ~half of full ($fullRows rows)")
  }

  test("q_cluster_kmeans objective is monotone and partitions the corpus") {
    val n = Tables.embeddings(spark, sf).count()
    def run(iters: Int) = {
      val rows = Curation.kmeans(spark, sf, iters).collect()
      (rows.map(_.getAs[Long]("n_members")).sum,
       rows.map(_.getAs[Double]("inertia")).sum,
       rows.length)
    }
    val (n1, inertia1, _)  = run(1)
    val (n2, inertia2, k2) = run(2)
    val (n3, inertia3, _)  = run(3)
    assert(n1 == n && n2 == n && n3 == n,
      "every vector must be assigned exactly once at every iteration")
    assert(k2 <= 8 && k2 > 1)
    assert(inertia2 <= inertia1 + 1e-3,
      s"Lloyd iteration must not increase the objective ($inertia1 -> $inertia2)")
    assert(inertia3 <= inertia2 + 1e-3,
      s"Lloyd iteration must not increase the objective ($inertia2 -> $inertia3)")
    // and it must actually improve on this data, not just not-regress
    assert(inertia2 < inertia1 * 0.999)
  }

  test("q_cluster_kmeans is deterministic across runs") {
    val a = Curation.qClusterKmeans(spark, sf).collect().map(_.toString).toSeq
    val b = Curation.qClusterKmeans(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("q_sample_weighted matches an independent Scala A-ES re-derivation") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent key derivation: BigInt hash (no 64-bit wrap), ln, scale
    val expected = docs.map { case (id, nc) =>
      val hkey = ((BigInt(id) * BigInt(2654435761L)).mod(BigInt(1L << 31))).toLong
      val u = (hkey + 1).toDouble / 2147483648.0
      val wkey = math.round(math.log(u) / math.max(nc, 1L) * 1e9)
      (id, wkey)
    }.sortBy { case (id, wkey) => (-wkey, id) }.take(50)
    val got = Curation.qSampleWeighted(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("wkey"))).toSeq
    assert(got == expected.toSeq)
  }

  test("q_text_dedup_substrings flags both sides of every near-dup pair") {
    val flagged = Curation.qTextDedupSubstrings(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_ratio")).toMap
    assert(flagged.nonEmpty)
    assert(flagged.values.forall(r => r > 0.0 && r <= 1.0))
    // a tau=0.5 3-gram near-dup pair shares long verbatim runs, so both
    // docs must carry duplicated 10-token windows
    val pairs = Curation.qJoinSetsim(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(flagged.contains(a) && flagged.contains(b),
        s"near-dup pair ($a,$b) must surface in the substring screen")
    }
  }

  test("q_agg_heavy_hitters: sketch estimate within the DataSketches bound for all 20") {
    val rows = Curation.qAggHeavyHitters(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Boolean]("within_bound")),
      "every heavy hitter must satisfy the DataSketches error contract " +
        "(tracked within 3.5*N/65536, or untracked with count <= that)")
    val counts = rows.map(_.getAs[Long]("n_exact"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "output must be ranked by exact count")
  }

  test("q_sample_weighted prefers heavy documents") {
    val sel = Curation.qSampleWeighted(spark, sf)
      .agg(avg("n_chars")).head.getDouble(0)
    val all = Tables.documents(spark, sf)
      .agg(avg("n_chars")).head.getDouble(0)
    assert(sel > all,
      s"w=n_chars sample mean ($sel) should exceed corpus mean ($all)")
  }

  test("q_dedup_bloom: verbatim re-crawls all flagged, novel docs all pass") {
    val rows = Curation.qDedupBloom(spark, sf).collect()
    assert(rows.nonEmpty)
    val nBatch = rows.map(_.getAs[Long]("n_batch")).sum
    val nDups = rows.map(_.getAs[Long]("n_true_dups")).sum
    // batch construction: doc_id%10==0 are novel, %10==5 verbatim dups
    val docs = Tables.documents(spark, sf)
    val expDups = docs.where(col("doc_id") % 10 === 5).count()
    val expNovel = docs.where(col("doc_id") % 10 === 0).count()
    assert(nDups == expDups, "every verbatim re-crawl must verify as dup")
    assert(nBatch == expDups + expNovel)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("no_false_negatives"),
             s"${r.getString(0)}: bloom missed a true member")
      assert(r.getAs[Boolean]("fp_within_bound"),
             s"${r.getString(0)}: bloom fp rate above bound")
    }
  }

  test("q_text_normalize: planted case/punct/whitespace variants collapse") {
    val rows = Curation.qTextNormalize(spark, sf).collect()
    val planted = rows.filter(_.getAs[Long]("doc_id") >= 100000L)
    assert(planted.nonEmpty, "variant construction must plant rows")
    planted.foreach { r =>
      assert(r.getAs[Long]("dup_count") == 2L,
             s"variant ${r.getAs[Long]("doc_id")} did not collapse onto its source")
      assert(!r.getAs[Boolean]("keep"),
             "the higher-id variant must lose the keep decision")
    }
    // originals keep their groups
    assert(rows.filter(_.getAs[Long]("doc_id") < 100000L)
               .forall(_.getAs[Boolean]("keep")))
  }

  test("q_embed_quantize: 256-level codes bound reconstruction error by half a step") {
    import spark.implicits._
    val rows = Curation.qEmbedQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    // max step/2 over all dims bounds the per-label mean |err|
    val elems = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("v", col("v").cast("double"))
    val maxWidth = elems.groupBy("pos")
      .agg((max("v") - min("v")).as("w"))
      .agg(max("w")).head.getDouble(0)
    val bound = maxWidth / 256.0 / 2.0 + 1e-9
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_abs_err") <= bound,
             s"label ${r.get(0)}: mean err above half-step bound $bound")
    }
  }

  test("q_sample_stratified draws exactly min(20, |stratum|) by the hash order") {
    import spark.implicits._
    val rows = Curation.qSampleStratified(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    val byLang = docs.groupBy(_._2)
    val got = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, ds) =>
      val want = ds.map(_._1)
        .sortBy(id => (id * 2654435761L % (1L << 31), id))
        .take(20).toSet
      assert(got(lang).map(_.getAs[Long]("doc_id")).toSet == want,
             s"$lang: selection must follow the deterministic hash order")
      assert(got(lang).length == math.min(20, ds.length))
    }
  }

  test("q_text_winnowing: every w-window holds a fingerprint (coverage guarantee)") {
    import spark.implicits._
    val rows = Curation.qTextWinnowing(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(rows.size == docs.length)
    // driver-side winnow for a deterministic sample of docs
    docs.filter(_._1 % 7 == 0).foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val grams =
        if (toks.length < 4) Array(toks.mkString(" "))
        else toks.sliding(4).map(_.mkString(" ")).toArray
      val hashes = grams.map { g =>
        java.security.MessageDigest.getInstance("MD5").digest(
          g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      val sel = (0 to math.max(0, hashes.length - 5)).map { i =>
        val win = hashes.slice(i, math.min(i + 5, hashes.length))
        val minH = win.min
        i + win.lastIndexOf(minH) // rightmost min in window
      }.distinct
      val r = rows(id)
      assert(r.getAs[Long]("n_grams") == grams.length.toLong)
      assert(r.getAs[Long]("n_fp") == sel.size.toLong,
             s"doc $id: fingerprint count must match driver-side winnow")
      // density guarantee: at most one fp per window anchor
      assert(r.getAs[Long]("n_fp") <=
             math.max(1L, grams.length.toLong - 4L))
    }
  }

  test("q_dedup_semantic: leaders survive, prune flags match recomputed cosines") {
    import spark.implicits._
    val rows = Curation.qDedupSemantic(spark, sf).collect()
    assert(rows.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    // members partition the table
    assert(rows.map(_.getAs[Long]("n_members")).sum == vecs.size.toLong)
    rows.foreach { r =>
      val leader = r.getAs[Long]("leader")
      assert(vecs.contains(leader))
      assert(r.getAs[Long]("n_pruned") <= r.getAs[Long]("n_members") - 1,
             "the leader itself is never pruned")
      val c = r.getAs[Double]("avg_cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("q_text_para_dedup: kept blocks across sources = distinct block values") {
    import spark.implicits._
    val rows = Curation.qTextParaDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent Scala re-derivation of the block inventory
    val blocks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .flatMap { case (_, text) =>
        text.split(" ").filter(_.nonEmpty).grouped(8).map(_.mkString(" "))
      }
    assert(rows.map(_.getAs[Long]("blocks_total")).sum == blocks.length.toLong,
           "block census must cover every non-empty doc")
    // exactly one keeper per distinct block value, summed over sources
    assert(rows.map(_.getAs[Long]("blocks_kept")).sum ==
           blocks.distinct.length.toLong,
           "keep-first must retain each distinct block exactly once")
    rows.foreach { r =>
      assert(r.getAs[Long]("blocks_kept") >= 1L)
      assert(r.getAs[Long]("blocks_kept") <= r.getAs[Long]("blocks_total"))
      val ratio = r.getAs[Double]("dup_ratio")
      assert(ratio >= 0.0 && ratio < 1.0)
    }
  }

  test("q_text_containment scores match a per-pair Scala recompute") {
    import spark.implicits._
    val rows = Curation.qTextContainment(spark, sf).collect()
    val gramSets = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> LlmOps.twoGrams(t).toSet }.toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val inter = (gramSets(a) & gramSets(b)).size.toDouble
      val cab = inter / gramSets(a).size
      val cba = inter / gramSets(b).size
      assert(math.abs(r.getAs[Double]("c_ab") - cab) < 1e-6)
      assert(math.abs(r.getAs[Double]("c_ba") - cba) < 1e-6)
      assert(math.max(cab, cba) >= 0.6, "pair must clear the threshold")
    }
    // completeness: no qualifying pair within a source is missed
    val bySource = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val want = bySource.values.flatMap { ids =>
      for {
        i <- ids.indices.iterator
        j <- (i + 1) until ids.length
        ga = gramSets(ids(i)); gb = gramSets(ids(j))
        inter = (ga & gb).size.toDouble
        if inter / math.min(ga.size, gb.size) >= 0.6
      } yield (ids(i), ids(j))
    }.toSet
    val got = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got == want, "containment join must find exactly the brute-force pairs")
  }

  test("q_select_mixture: rates cap at 1 and budgets never exceed supply") {
    val rows = Curation.qSelectMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("lang_tokens")).sum.toDouble
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("sampled_tokens") <= r.getAs[Long]("lang_tokens"))
      // rate = 1 exactly when the language is under-represented vs target
      val unconstrained = r.getAs[Double]("target_share") * total /
        r.getAs[Long]("lang_tokens")
      if (unconstrained >= 1.0 + 1e-9) assert(rate == 1.0)
      else assert(math.abs(rate - unconstrained) < 1e-5)
    }
  }

  test("q_curation_funnel: stages chain and attrition is monotone") {
    val rows = Curation.qCurationFunnel(spark, sf).collect()
      .sortBy(_.getAs[Long]("stage"))
    assert(rows.length == 3)
    assert(rows.head.getAs[Long]("docs_in") ==
           Tables.documents(spark, sf).count())
    rows.sliding(2).foreach {
      case Array(prev, next) =>
        assert(next.getAs[Long]("docs_in") == prev.getAs[Long]("docs_out"),
               "stage input must be the previous stage's output")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("dropped") ==
             r.getAs[Long]("docs_in") - r.getAs[Long]("docs_out"))
      assert(r.getAs[Long]("docs_out") <= r.getAs[Long]("docs_in"))
    }
  }

  test("q_text_cdc_chunk: boundaries are content-defined — a prefix edit leaves later chunks intact") {
    import org.apache.spark.sql.functions._
    // the defining CDC property (vs fixed-size chunking): prepending
    // tokens shifts positions but the boundary VERDICT of every
    // untouched 4-gram is unchanged, so all chunks after the first
    // boundary survive the edit byte-for-byte
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def chunks(toks: Array[String]): Seq[Seq[String]] = {
      val grams = toks.sliding(4).map(_.mkString(" ")).toArray
      val out = Seq.newBuilder[Seq[String]]
      var start = 0
      grams.zipWithIndex.foreach { case (g, i) =>
        if (md5hex(g).startsWith("0")) { // boundary AFTER this gram
          out += toks.slice(start, i + 1).toSeq
          start = i + 1
        }
      }
      if (start < grams.length) out += toks.slice(start, grams.length).toSeq
      out.result()
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).limit(8).collect().map(_.getString(0))
    var verified = 0
    docs.foreach { text =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.length >= 40) {
        val orig = chunks(toks)
        val edited = chunks(Array("zz1", "zz2", "zz3") ++ toks)
        if (orig.length >= 3) {
          // every original chunk from the second onward must reappear
          val later = orig.drop(1).map(_.mkString(" ")).toSet
          val after = edited.map(_.mkString(" ")).toSet
          assert(later.subsetOf(after),
                 s"content-defined boundaries must survive a prefix edit")
          verified += 1
        }
      }
    }
    assert(verified > 0, "fixture docs too short to exercise the property")
    // and the operator agrees with the driver-side chunker on counts
    val got = Curation.qTextCdcChunk(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).collect()
    all.take(30).foreach { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      if (toks.length >= 4)
        assert(got(r.getLong(0)) == chunks(toks).length.toLong,
               s"doc ${r.getLong(0)} chunk count")
    }
  }

  test("q_text_bm25: every hit contains a query term; scores replay exactly") {
    val rows = Curation.qTextBm25(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val terms = Set("spark", "join", "window")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)
        .split(" ").filter(_.nonEmpty).toSeq).toMap
    // driver-side BM25 replay (k1=1.2, b=0.75, round-6 per-term sum)
    val n = docs.size
    val avgdl = docs.values.map(_.length).sum.toDouble / n
    val df = terms.map(t =>
      t -> docs.values.count(_.contains(t))).toMap
    val expect = docs.flatMap { case (id, toks) =>
      val ts = terms.toSeq.map { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) BigDecimal(0)
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          BigDecimal(idf * (tf * 2.2) /
              (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
      }
      val s = ts.sum
      if (s > 0) Some(id -> s.toDouble) else None
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(docs(id).exists(terms), s"doc $id has no query term")
      assert(math.abs(r.getAs[Double]("score") - expect(id)) < 1e-9,
        s"doc $id score")
    }
  }

  test("q_embed_sim_hist: bucket counts partition the sampled pair space") {
    val rows = Curation.qEmbedSimHist(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= -10L && b <= 9L, s"bucket $b out of cosine range")
    }
    val sampled = Tables.embeddings(spark, sf)
      .where(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.get(1).toString))
    val nPairs = sampled.groupBy(_._2).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nPairs)
  }

  test("q_text_classify: deciles in range, counts partition the corpus") {
    val rows = Curation.qTextClassify(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(d >= 0L && d <= 9L)
      assert(r.getAs[Long]("n_docs") > 0L)
    }
    val nDocs = Tables.documents(spark, sf)
      .where(size(filter(split(col("text"), " "), t => t =!= "")) > 0)
      .count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
  }
}
