package graft

import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the custom expressions (runtime registration path;
  * the same builders back the `spark.sql.extensions=graft.GraftExtensions`
  * config route).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("custom expressions callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT simhash64(array('a','b')) AS sh,
                minhash_bands(array('a b c','b c d'), 4, 2) AS mh,
                jaccard_sorted(array('a','b','c'), array('b','c','d')) AS js,
                word_shingles(array('a','b','c'), 2) AS ws,
                rolling_hash64('ab') AS rh""").head()
    assert(row.getLong(0) != 0L)
    assert(row.getSeq[Long](1).length == 4)
    assert(row.getDouble(2) == 0.5)
    assert(row.getSeq[String](3) == Seq("a b", "b c"))
    assert(row.getLong(4) == 'a'.toLong * 31 + 'b'.toLong)
  }

  test("topk_by and topk_by_scored callable as SQL aggregates") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((0L, 10L, 1.0), (0L, 11L, 3.0), (0L, 12L, 2.0))
      .toDF("g", "id", "score").createOrReplaceTempView("tk")
    val ids = spark.sql("SELECT topk_by(score, id, 2) FROM tk GROUP BY g")
      .head().getSeq[Long](0)
    assert(ids == Seq(11L, 12L))
    val scored = spark.sql(
      "SELECT topk_by_scored(score, id, 2) AS t FROM tk GROUP BY g")
      .selectExpr("inline(t)").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(scored == Seq((3.0, 11L), (2.0, 12L)))
  }

  test("approx_heavy_hitters callable as a SQL aggregate, exact in the small regime") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (Seq.fill(9)("a") ++ Seq.fill(4)("b") ++ Seq("c"))
      .toDF("item").createOrReplaceTempView("hh_in")
    val r = spark.sql(
      "SELECT hh.n, hh.err, hh.items FROM (SELECT approx_heavy_hitters(item, 4) AS hh FROM hh_in)")
      .head()
    assert(r.getLong(0) == 14L && r.getLong(1) == 0L)
    val items = r.getSeq[org.apache.spark.sql.Row](2)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(items == Seq(("a", 9L), ("b", 4L), ("c", 1L)))
  }

  test("graft_attribution TVF: SQL cells equal the Column-API operator") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, 5L, 1L, "c", 0.0), (1L, 6L, 2L, "v", 0.0),
      (1L, 10L, 3L, "c", 0.0), (1L, 15L, 5L, "p", 100.0),
      (2L, 40L, 6L, "p", 50.0))
    rows.toDF("user_id", "ts_ms", "event_id", "event_type", "value")
      .createOrReplaceTempView("attr_ev")
    val viaSql = spark.sql(
        "SELECT * FROM graft_attribution('attr_ev', 'p', 'c,v', 10)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        math.rint(r.getDouble(3) * 1e6))).toSet
    val viaApi = graft.operators.Analytics.attribution(
        rows.toDF("user_id", "ts_ms", "event_id", "event_type", "value"),
        "p", Seq("c", "v"), 10L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        math.rint(r.getDouble(3) * 1e6))).toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("subword_split callable from SQL with an array-literal vocab") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT subword_split('unbelievable', array('un', 'believ', 'able'), 6) AS p")
      .head().getSeq[String](0)
    assert(out == Seq("un", "believ", "able"))
    // non-foldable vocab argument fails loudly, not silently
    import spark.implicits._
    Seq(("ab", Seq("a"))).toDF("w", "v").createOrReplaceTempView("sw")
    val e = intercept[Exception] {
      spark.sql("SELECT subword_split(w, v, 3) FROM sw").collect()
    }
    assert(e.getMessage.contains("foldable") || e.getMessage.toLowerCase.contains("vocab"))
  }

  test("table-valued functions: engine and views queryable from pure SQL") {
    GraftExtensions.register(spark)
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // engine
    val dbDir = Files.createTempDirectory("gx-tvf-db").toString
    val db = new graft.core.GraftDB(spark, dbDir)
    db.set("k1".getBytes, "v1".getBytes)
    db.set("k2".getBytes, "v2".getBytes)
    db.del("k2".getBytes)
    val kv = spark.sql(
      s"SELECT decode(key, 'UTF-8') AS k, decode(value, 'UTF-8') AS v FROM graft_view('$dbDir')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kv == Set(("k1", "v1")))
    // the TVF composes like any table: filters/joins/aggregates over it
    assert(spark.sql(s"SELECT count(*) FROM graft_view('$dbDir') WHERE key = encode('k1','UTF-8')")
      .head().getLong(0) == 1L)
    // agg view
    val avDir = Files.createTempDirectory("gx-tvf-av").toString
    graft.operators.AggView.buildAggView(
      Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("g", "x"),
      avDir, keys = Seq("g"), metrics = Seq("x"))
    val av = spark.sql(
      s"SELECT g, cnt, x_sum FROM graft_agg_view('$avDir') ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(av == Seq(("a", 2L, 3.0), ("b", 1L, 5.0)))
    // join view: inner default, left form via the second argument
    val jvDir = Files.createTempDirectory("gx-tvf-jv").toString
    graft.operators.JoinView.buildJoinView(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "fv"),
      Seq((1L, "a")).toDF("k", "dv"), jvDir, joinKeys = Seq("k"))
    assert(spark.sql(s"SELECT count(*) FROM graft_join_view('$jvDir')").head().getLong(0) == 1L)
    assert(spark.sql(s"SELECT count(*) FROM graft_join_view('$jvDir', false)").head().getLong(0) == 2L)
    // loud argument errors
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_view(42)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string literal"))
  }

  test("graft_changes TVF: catch-up feed between a backup and the live engine") {
    GraftExtensions.register(spark)
    import java.nio.file.Files
    val liveDir = Files.createTempDirectory("gx-tvf-live").toString
    val db = new graft.core.GraftDB(spark, liveDir)
    db.set("a".getBytes, "1".getBytes)
    db.set("b".getBytes, "2".getBytes)
    val backupDir = Files.createTempDirectory("gx-tvf-bak").toString
    db.backupTo(backupDir)
    db.set("a".getBytes, "1x".getBytes)
    db.del("b".getBytes)
    db.set("c".getBytes, "3".getBytes)
    val feed = spark.sql(
      s"""SELECT decode(key,'UTF-8') k, op, decode(value,'UTF-8') v
          FROM graft_changes('$backupDir', '$liveDir') ORDER BY k""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(feed == Seq(("a", "set", "1x"), ("b", "del", null), ("c", "set", "3")))
  }

  test("SQL and Column APIs agree") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq("x y z", "y z w"))).toDF("id", "sh")
    val viaCol = df.select(
      graft.functions.expressions.HashExpressions.minhash_bands(col("sh"), 4, 2)).head().getSeq[Long](0)
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT minhash_bands(sh, 4, 2) FROM t").head().getSeq[Long](0)
    assert(viaCol == viaSql)
  }

  test("graft_search TVF: SQL probe matches the programmatic indexed search") {
    import spark.implicits._
    val docs = Seq(
      (1L, "stream filter group by join"),
      (2L, "filter stream stream stream"),
      (3L, "completely unrelated words here"),
      (4L, "group group group stream")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft-tvf-idx").toString
    graft.llmops.Search.buildTextIndex(docs, idx, numBuckets = 8)
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
        s"SELECT rank, doc_id, score FROM graft_search('$idx', 'stream filter', 3) ORDER BY rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaApi = graft.llmops.Search.bm25TopKIndexed(spark, idx,
        Seq((0L, "stream filter")).toDF("query_id", "qtext"), k = 3)
      .orderBy("rank")
      .select("rank", "doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaSql.nonEmpty && viaSql == viaApi)
    assert(viaSql.map(_._2).contains(2L)) // the stream-heavy doc ranks
    // default k and arity guard
    assert(spark.sql(s"SELECT * FROM graft_search('$idx', 'stream')").count() <= 10)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_search('$idx')").collect()
    }
    assert(e.getMessage.contains("graft_search"))
  }

  test("graft_ann TVF: SQL vector probe matches the programmatic IVF search") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val emb = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-ivf").toString
    graft.llmops.Similarity.buildIvfIndex(emb, dir, numCentroids = 4)
    graft.GraftExtensions.register(spark)
    val qv = Seq.fill(8)(0.5f)
    val lit = qv.map(v => s"CAST($v AS FLOAT)").mkString("array(", ", ", ")")
    val viaSql = spark.sql(
        s"SELECT rank, neighbor_id FROM graft_ann('$dir', $lit, 5, 2) ORDER BY rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaApi = graft.llmops.Similarity.ivfTopKIndexed(spark, dir,
        Seq((-1L, qv)).toDF("vec_id", "embedding"), k = 5, nProbe = 2)
      .orderBy("rank").select("rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql.size == 5 && viaSql == viaApi)
    // a plain double-literal array coerces too
    val viaDouble = spark.sql(
        s"SELECT count(*) FROM graft_ann('$dir', array(${qv.mkString(", ")}), 5)")
      .head().getLong(0)
    assert(viaDouble == 5L)
  }

  test("rank-family + skyline_n TVFs: values on a hand-checked frame, loud arity errors") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 10L), (2L, 30L), (3L, 20L)).toDF("id", "v")
      .createOrReplaceTempView("rk_in")
    val asc = spark.sql(
        "SELECT id, rn FROM graft_rank('rk_in', 'v', 'id') ORDER BY rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(asc == Seq((1L, 1L), (3L, 2L), (2L, 3L)))
    // descending mode: the TVF negates the key internally
    val desc = spark.sql(
        "SELECT id, rn FROM graft_rank('rk_in', 'v', 'id', true) ORDER BY rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(desc == Seq((2L, 1L), (3L, 2L), (1L, 3L)))
    val rs = spark.sql("""SELECT id, running_sum
        FROM graft_running_sum('rk_in', 'v', 'id', 'v') ORDER BY running_sum""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rs == Seq((1L, 10L), (3L, 30L), (2L, 60L)))
    // strict prefix: global first row is NULL
    val pm = spark.sql(
        "SELECT id, prefix_max FROM graft_prefix_max('rk_in', 'v', 'id', 'v')")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(pm == Map(1L -> -1L, 3L -> 10L, 2L -> 20L))
    // skyline_n over (min v, max id): (20,3) dominates (30,2); (10,1) stays
    val sk = spark.sql("SELECT v, id FROM graft_skyline_n('rk_in', 'v', 'id')")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(sk == Set((10.0, 1.0), (20.0, 3.0)))
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_rank('rk_in', 'v')").collect())
    assert(e.getMessage.contains("graft_rank"))
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graft_running_sum('rk_in', 'v', 'id')").collect())
    assert(e2.getMessage.contains("graft_running_sum"))
    // non-numeric ordering key fails LOUDLY at the boundary: a string
    // key would cast to NULL and collapse every row into bucket 0 —
    // right answer, single-partition performance (the skyline2 hazard)
    Seq(("a", 1L), ("b", 2L)).toDF("s", "id")
      .createOrReplaceTempView("rk_str")
    for (q <- Seq(
        "SELECT * FROM graft_rank('rk_str', 's', 'id')",
        "SELECT * FROM graft_running_sum('rk_str', 's', 'id', 'id')",
        "SELECT * FROM graft_prefix_max('rk_str', 's', 'id', 'id')",
        "SELECT * FROM graft_ntile('rk_str', 's', 'id', 2)",
        "SELECT * FROM graft_percent_rank('rk_str', 's', 'id')",
        "SELECT * FROM graft_quantiles('rk_str', 's', '0.5')")) {
      val ex = intercept[Exception](spark.sql(q).collect())
      assert(ex.getMessage.contains("must be numeric"), s"no guard for: $q")
    }
  }

  test("sampling TVFs: graft_stratum_sample per-stratum counts and guards") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (for (s <- Seq("a", "b"); i <- 1L to 20L)
      yield (i + (s.head - 'a') * 100L, s, i % 5 + 1))
      .toDF("doc_id", "stratum", "w")
      .createOrReplaceTempView("strat_in")
    val got = spark.sql("""SELECT stratum, count(*) AS n
        FROM graft_stratum_sample('strat_in', 4, 'w', 'stratum', 'doc_id')
        GROUP BY stratum ORDER BY stratum""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 4L), ("b", 4L)))
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_stratum_sample('strat_in', 4, 'stratum', 'stratum', 'doc_id')")
        .collect())
    assert(e.getMessage.contains("must be numeric"))
  }

  test("graft_random_project TVF: SQL projection equals the API, loud arity error") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(8L)
    val df = (1L to 30L).map(i => (i, Array.fill(12)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    df.createOrReplaceTempView("rp_tvf_in")
    val viaSql = spark.sql(
        "SELECT vec_id, rp FROM graft_random_project('rp_tvf_in', 'embedding', 5, 12, 77)")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaApi = graft.llmops.Similarity
      .randomProject(df, "embedding", k = 5, d = 12, seed = 77L)
      .select("vec_id", "rp")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaSql == viaApi)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_random_project('rp_tvf_in', 'embedding', 5)").collect())
    assert(e.getMessage.contains("graft_random_project"), e.getMessage)
  }

  test("graft_temperature_mix TVF: SQL keep set equals the API, loud arity error") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rows = (1L to 120L).map(i => (i, if (i <= 100) "big" else "small"))
    val df = rows.toDF("doc_id", "lang")
    df.createOrReplaceTempView("tm_tvf_in")
    val viaSql = spark.sql(
        "SELECT doc_id FROM graft_temperature_mix('tm_tvf_in', 'lang', 40)")
      .collect().map(_.getLong(0)).toSet
    val viaApi = graft.llmops.Curation
      .temperatureMix(df, "lang", budget = 40L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)
    // the optional 5th argument selects the exactBudget water-filling
    // mode — a clamping stratum ("tiny", 3 rows whose flattened target
    // exceeds its size) exercises the redistribution path through SQL
    val rows2 = rows ++ (9001L to 9003L).map(i => (i, "tiny"))
    rows2.toDF("doc_id", "lang").createOrReplaceTempView("tm_tvf_exact_in")
    val viaSqlExact = spark.sql(
        "SELECT doc_id FROM graft_temperature_mix('tm_tvf_exact_in', " +
          "'lang', 40, 0.5, true)")
      .collect().map(_.getLong(0)).toSet
    val viaApiExact = graft.llmops.Curation
      .temperatureMix(rows2.toDF("doc_id", "lang"), "lang", budget = 40L,
        exactBudget = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaSqlExact == viaApiExact && viaSqlExact.nonEmpty)
    // the clamped stratum arrives whole through the SQL path too
    assert((9001L to 9003L).forall(viaSqlExact),
      s"clamped stratum incomplete via SQL: $viaSqlExact")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_temperature_mix('tm_tvf_in', 'lang')").collect())
    assert(e.getMessage.contains("graft_temperature_mix"), e.getMessage)
  }

  test("graft_codeid TVF: SQL scores equal the Column API, loud arity error") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "def countItems(itemList):\n    return len(itemList);"),
      (2L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    df.createOrReplaceTempView("cid_tvf_in")
    val viaSql = spark.sql(
        "SELECT doc_id, code_score FROM graft_codeid('cid_tvf_in', 'text')")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    import org.apache.spark.sql.functions.col
    val viaApi = df.select(col("doc_id"),
        graft.functions.Text.codeScore(col("text")).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaApi)
    assert(viaSql(1L) > viaSql(2L), "code must outscore prose through SQL")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_codeid('cid_tvf_in')").collect())
    assert(e.getMessage.contains("graft_codeid"), e.getMessage)
  }

  test("graft_encoding / graft_script TVFs: SQL equals the API, loud arity errors") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "clean latin text"),
      (2L, "bro�ken transcode"),
      (3L, "你好世界好世界 hi")
    ).toDF("doc_id", "text")
    df.createOrReplaceTempView("encscr_tvf_in")
    val encSql = spark.sql(
        "SELECT doc_id, enc_score FROM graft_encoding('encscr_tvf_in', 'text')")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val encApi = graft.functions.Text
      .withEncodingQuality(df, col("text"))
      .select("doc_id", "enc_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(encSql == encApi)
    assert(encSql(1L) == 1.0 && encSql(2L) < 1.0,
      s"mojibake must lower enc_score via SQL: $encSql")
    val scrSql = spark.sql(
        "SELECT doc_id, script_pred FROM graft_script('encscr_tvf_in', 'text')")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val scrApi = graft.functions.Text
      .withScriptProfile(df, col("text"))
      .select("doc_id", "script_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scrSql == scrApi)
    assert(scrSql(3L) == "han", s"CJK row must route han via SQL: $scrSql")
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM graft_encoding('encscr_tvf_in')").collect())
    assert(e1.getMessage.contains("graft_encoding"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graft_script('encscr_tvf_in')").collect())
    assert(e2.getMessage.contains("graft_script"), e2.getMessage)
  }

  test("graft_c4_clean TVF: SQL cleaning equals the API, loud arity error") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "Good line stays right here.\ntoo short\nAnother keeper ends well."),
      (2L, "Enable JavaScript to view this page.\nbraces { inside } fail.")
    ).toDF("doc_id", "text")
    df.createOrReplaceTempView("c4_tvf_in")
    val viaSql = spark.sql(
        "SELECT doc_id, clean_text, n_kept FROM graft_c4_clean('c4_tvf_in', 'text')")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val viaApi = graft.functions.Text.withC4LineClean(df, col("text"))
      .select("doc_id", "clean_text", "n_kept")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(viaSql == viaApi)
    assert(viaSql(1L)._2 == 2L && viaSql(2L)._2 == 0L, s"rules via SQL: $viaSql")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_c4_clean('c4_tvf_in')").collect())
    assert(e.getMessage.contains("graft_c4_clean"), e.getMessage)
  }

  test("graft_corpus_report / graft_oov TVFs: SQL equals the API, loud arity errors") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat", "web"),
      (2L, "def f(x):\n    return x;", "web"),
      (3L, "short text here", "crawl")
    ).toDF("doc_id", "text", "source")
    df.createOrReplaceTempView("crp_tvf_in")
    val viaSql = spark.sql(
        """SELECT source, n_docs, n_tokens, n_ctrl_chars, n_latin_docs,
          latin_share FROM graft_corpus_report('crp_tvf_in', 'source', 'text')
          ORDER BY source""")
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.llmops.Curation.corpusReport(df)
      .select("source", "n_docs", "n_tokens", "n_ctrl_chars",
        "n_latin_docs", "latin_share")
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(viaSql == viaApi && viaSql.nonEmpty)
    val eCrp = intercept[Exception](
      spark.sql("SELECT * FROM graft_corpus_report('crp_tvf_in')").collect())
    assert(eCrp.getMessage.contains("graft_corpus_report"), eCrp.getMessage)
    val viaOovSql = spark.sql(
        """SELECT doc_id, n_tokens, n_oov, oov_rate
          FROM graft_oov('crp_tvf_in', 3) ORDER BY doc_id""")
      .collect().map(_.toSeq).toSeq
    val viaOovApi = graft.llmops.Tokenize.vocabCoverage(df, vocabSize = 3)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaOovSql == viaOovApi && viaOovSql.nonEmpty)
    // a 3-term vocabulary over this corpus leaves real OOV mass
    assert(viaOovSql.exists(r => r(2).asInstanceOf[Long] > 0L))
    val eOov = intercept[Exception](
      spark.sql("SELECT * FROM graft_oov('crp_tvf_in')").collect())
    assert(eOov.getMessage.contains("graft_oov"), eOov.getMessage)
    // 4-arg form: explicit id/text columns route identically
    val viaOov4 = spark.sql(
        """SELECT doc_id, n_tokens, n_oov, oov_rate
          FROM graft_oov('crp_tvf_in', 3, 'doc_id', 'text')
          ORDER BY doc_id""").collect().map(_.toSeq).toSeq
    assert(viaOov4 == viaOovApi)
  }

  test("graft_oov_model TVF: persisted vocabulary applies from SQL, loud on missing model and bad arity") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat the cat"), (2L, "the cat sat qq"),
      (3L, "the the the xylophone qq")
    ).toDF("doc_id", "text")
    df.createOrReplaceTempView("oovm_tvf_in")
    val mdir = java.nio.file.Files.createTempDirectory("oovm-tvf").toString
    graft.llmops.Tokenize.saveVocabModel(
      graft.llmops.Tokenize.vocabFit(df, vocabSize = 3), mdir)
    val viaSql = spark.sql(
        s"""SELECT doc_id, n_tokens, n_oov, oov_rate
          FROM graft_oov_model('$mdir', 'oovm_tvf_in') ORDER BY doc_id""")
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.llmops.Tokenize.oovAgainstVocab(df,
        graft.llmops.Tokenize.loadVocabModel(spark, mdir))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaSql == viaApi && viaSql.nonEmpty)
    // a missing model fails at ANALYSIS, loudly — not with an empty scan
    val eMissing = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_oov_model('$mdir-nope', 'oovm_tvf_in')"))
    assert(eMissing.getMessage.contains("corrupt or missing model"),
      eMissing.getMessage)
    val eArity = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_oov_model('$mdir')"))
    assert(eArity.getMessage.contains("graft_oov_model"), eArity.getMessage)
  }

  test("resample TVFs: non-numeric ts/value boundaries raise loudly") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // a string ts would cast to NULL inside floor(col/step) and yield a
    // silent NULL-bucket row — the graft_priority_sample requireNumeric
    // discipline, applied to both TVF boundaries
    Seq((1L, "noon", 1L, 2.0), (1L, "one", 2L, 3.0))
      .toDF("key", "ts_ms", "tie", "value")
      .createOrReplaceTempView("rs_strts")
    Seq((1L, 100L, 1L, "two"), (1L, 1500L, 2L, "three"))
      .toDF("key", "ts_ms", "tie", "value")
      .createOrReplaceTempView("rs_strval")
    for (tvf <- Seq("graft_resample", "graft_interpolate");
         t <- Seq("rs_strts", "rs_strval")) {
      val ex = intercept[Exception](spark.sql(
        s"SELECT * FROM $tvf('$t', 'key', 'ts_ms', 'value', 'tie', 1000)")
        .collect())
      assert(ex.getMessage.contains("must be numeric"),
        s"no numeric guard for $tvf on $t: ${ex.getMessage}")
    }
    // numeric boundaries still resample fine through the same TVF path
    Seq((1L, 100L, 1L, 2.0), (1L, 2500L, 2L, 8.0))
      .toDF("key", "ts_ms", "tie", "value")
      .createOrReplaceTempView("rs_ok")
    val n = spark.sql(
      "SELECT * FROM graft_interpolate('rs_ok', 'key', 'ts_ms', 'value', 'tie', 1000)")
      .count()
    assert(n == 3L)
  }

  test("layout keys callable from SQL: hilbert_key and interleave_bits hand values") {
    GraftExtensions.register(spark)
    // order-1 Hilbert quadrants + a Morton hand value (x=3, y=1 -> 0b0111)
    val r = spark.sql("""SELECT
        hilbert_key(CAST(0 AS INT), CAST(1 AS INT), 1) AS h01,
        hilbert_key(CAST(1 AS INT), CAST(1 AS INT), 1) AS h11,
        hilbert_key(CAST(1 AS INT), CAST(0 AS INT), 1) AS h10,
        interleave_bits(array(CAST(3 AS INT), CAST(1 AS INT)), 2) AS z""").head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 7L)
    val e = intercept[Exception](
      spark.sql("SELECT hilbert_key(1, 2)").collect())
    assert(e.getMessage.contains("hilbert_key expects 3"))
  }

  test("int-parameter boundaries: out-of-Int-range literals and bad arity fail loudly") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 10L), (2L, 30L)).toDF("id", "v").createOrReplaceTempView("bnd_in")
    // 5000000000 truncates to a wrong-but-positive Int under a bare
    // .toInt; the boundary must reject it instead of mis-bucketing
    val eN = intercept[Exception](
      spark.sql("SELECT * FROM graft_ntile('bnd_in', 'v', 'id', 5000000000)")
        .collect())
    assert(eN.getMessage.contains("32-bit"), s"got: ${eN.getMessage}")
    // register()-path aggregates get the same arity + literal diagnostics
    // as the extension-injection path (no IndexOutOfBounds / opaque casts)
    val eA = intercept[Exception](
      spark.sql("SELECT quantile_sketch(v, '0.5') FROM bnd_in").collect())
    assert(eA.getMessage.contains("quantile_sketch expects 3"),
      s"got: ${eA.getMessage}")
    val eK = intercept[Exception](
      spark.sql("SELECT quantile_sketch(v, '0.5', v) FROM bnd_in").collect())
    assert(eK.getMessage.toLowerCase.contains("literal"),
      s"got: ${eK.getMessage}")
  }

  test("graft_dsir / graft_dsir_model TVFs equal the API path; loud arity and model errors") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Seq((0L, "the cat sat", "en"), (1L, "dog runs far", "de"),
      (2L, "the cat runs", "en"), (3L, "qq vv ww", "de"))
      .toDF("doc_id", "text", "lang")
    docs.createOrReplaceTempView("dsir_tvf_docs")
    docs.filter(org.apache.spark.sql.functions.col("lang") === "en")
      .createOrReplaceTempView("dsir_tvf_target")
    val api = graft.llmops.Importance.dsirWeights(docs,
        graft.llmops.Importance.dsirFit(
          docs.filter(org.apache.spark.sql.functions.col("lang") === "en"),
          docs, buckets = 64), buckets = 64)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val sql = spark.sql(
      "SELECT * FROM graft_dsir('dsir_tvf_target', 'dsir_tvf_docs', 64) " +
        "ORDER BY doc_id").collect().map(_.toSeq).toSeq
    assert(sql == api)
    // persisted-model TVF: same values through save/load + narrow map
    val mdir = java.nio.file.Files.createTempDirectory("dsir-tvf").toString
    graft.llmops.Importance.saveDsirModel(
      graft.llmops.Importance.dsirFit(
        docs.filter(org.apache.spark.sql.functions.col("lang") === "en"),
        docs, buckets = 64), mdir)
    val sqlM = spark.sql(
      s"SELECT * FROM graft_dsir_model('$mdir', 'dsir_tvf_docs') " +
        "ORDER BY doc_id").collect().map(_.toSeq).toSeq
    assert(sqlM == api)
    val eArity = intercept[Exception](
      spark.sql("SELECT * FROM graft_dsir('dsir_tvf_docs')"))
    assert(eArity.getMessage.contains("graft_dsir"), eArity.getMessage)
    val eModel = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_dsir_model('$mdir-nope', 'dsir_tvf_docs')"))
    assert(eModel.getMessage.contains("corrupt or missing"), eModel.getMessage)
  }

  test("graft_boilerplate TVF equals the API path; loud arity") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // 2-token chunks: "aa bb" is a chunk of 3 of 4 docs -> boilerplate
    val docs = Seq((0L, "aa bb cc dd"), (1L, "aa bb ee ff"),
      (2L, "aa bb gg hh"), (3L, "ii jj kk ll")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("bp_tvf_docs")
    val units = graft.llmops.Curation.chunkDocuments(docs,
        chunkTokens = 2, strideTokens = 2)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("chunk_id").as("pos"),
        org.apache.spark.sql.functions.col("chunk_text").as("unit"))
    val api = graft.llmops.Dedup.removeBoilerplate(
        docs.select(org.apache.spark.sql.functions.col("doc_id")), units,
        minDocFrac = 0.5, minDocs = 2, joinSep = " ")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val sql = spark.sql(
      "SELECT * FROM graft_boilerplate('bp_tvf_docs', 2, 0.5, 2) " +
        "ORDER BY doc_id").collect().map(_.toSeq).toSeq
    assert(sql == api)
    // the shared chunk really was removed everywhere
    assert(sql.forall(r => !r(3).asInstanceOf[String].contains("aa bb")))
    val eArity = intercept[Exception](
      spark.sql("SELECT * FROM graft_boilerplate('bp_tvf_docs', 2)"))
    assert(eArity.getMessage.contains("graft_boilerplate"), eArity.getMessage)
  }
}
