package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Hashing, Similarity, TextFunctions}

/** The driver-facing operator catalog: one named query per implemented
  * operator family from SURVEY.md §2, each with a DuckDB oracle (same
  * parquet tables) where ANSI-SQL-expressible; engine-hash operators
  * (MinHash/SimHash/ER) are rows-only checks.
  *
  * Cross-engine hash-compare rules followed throughout:
  *  - every computed column aliased identically in Spark and SQL;
  *  - integer-like results cast to BIGINT on both sides;
  *  - money sums cast to DECIMAL(18,2) pre-aggregation (exact, order-free);
  *  - float results rounded AFTER identical per-row arithmetic, and sort
  *    keys use the rounded value so ordering can't diverge at 1e-16.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q01
  /** A1/A2 grouped aggregation (SURVEY §2.6). */
  private val q01: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        sum("l_quantity").as("sum_qty"),
        // 4dp: price(2dp) * discount(2dp) is exact at 4 decimals, so the
        // double->decimal cast never lands on a rounding boundary (Spark
        // HALF_UP vs DuckDB half-even would disagree at 2dp)
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).as("revenue"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty,
      |sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS revenue
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** F1-F5 predicate pushdown + projection pruning (SURVEY §2.2). */
  private val q02: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(expr("l_shipdate >= timestamp'1995-06-01' AND l_shipdate < timestamp'1996-01-01' AND l_quantity < 25"))
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      |AND l_quantity < 25 ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  /** J2/J5 three-way equi join + aggregation (SURVEY §2.5). */
  private val q03: Q = (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("revenue"))
      .orderBy("c_mktsegment")

  private val q03Sql =
    """SELECT c_mktsegment, count(*) AS cnt,
      |sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q04
  /** J1/J3/J4 star join with broadcast dimensions (SURVEY §2.5, §4). */
  private val q04: Q = (s, d) =>
    t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("suppliers"))
      .orderBy("r_name", "n_name")

  private val q04Sql =
    """SELECT r_name, n_name, count(*) AS suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q05
  /** F6 semi join (entity-has-page gate, SURVEY §2.2). */
  private val q05: Q = (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  private val q05Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q06
  /** J9 anti join (frontier set-minus, SURVEY §2.5). */
  private val q06: Q = (s, d) =>
    t(s, d, "part")
      .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")

  private val q06Sql =
    """SELECT p_partkey, p_name FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q07
  /** A6/A7 distinct (SURVEY §2.6). */
  private val q07: Q = (s, d) =>
    t(s, d, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  private val q07Sql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q08
  /** A3 union of grouped counts re-aggregated (candidate prior shape). */
  private val q08: Q = (s, d) => {
    val orders = t(s, d, "orders")
    val a = orders.groupBy(col("o_orderpriority").as("k")).agg(count(lit(1)).as("cnt"))
    val b = orders.groupBy(col("o_orderstatus").as("k")).agg(count(lit(1)).as("cnt"))
    a.unionByName(b).groupBy("k")
      .agg(sum("cnt").cast("long").as("total"))
      .orderBy("k")
  }

  private val q08Sql =
    """SELECT k, CAST(sum(cnt) AS BIGINT) AS total FROM (
      |  SELECT o_orderpriority AS k, count(*) AS cnt FROM orders GROUP BY 1
      |  UNION ALL
      |  SELECT o_orderstatus AS k, count(*) AS cnt FROM orders GROUP BY 1
      |) GROUP BY k ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q09
  /** A4/O4 ranking window (first-seen labels / deterministic split). */
  private val q09: Q = (s, d) =>
    t(s, d, "orders")
      .withColumn("rnk",
        row_number().over(Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
      .where(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "rnk")
      .orderBy("o_custkey", "rnk")

  private val q09Sql =
    """SELECT o_custkey, o_orderkey, CAST(rnk AS BIGINT) AS rnk FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin

  // ---------------------------------------------------------------- q10
  /** O1/O3 global top-k with deterministic tiebreak. */
  private val q10: Q = (s, d) =>
    t(s, d, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .limit(100)

  private val q10Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Conditional aggregation over the events table. */
  private val q11: Q = (s, d) =>
    t(s, d, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("value") > 50, 1L).otherwise(0L)).cast("long").as("big_cnt"))
      .orderBy("event_type")

  private val q11Sql =
    """SELECT event_type, count(*) AS cnt,
      |CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS big_cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q12
  /** HAVING filter on grouped counts. */
  private val q12: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 5)
      .orderBy("o_custkey")

  private val q12Sql =
    """SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
      |HAVING count(*) >= 5 ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q13
  /** J7 correlated scalar subquery (Catalyst decorrelates,
    * /root/reference/src/scripts/alter_table_entities.py:30). */
  private val q13: Q = (s, d) => {
    t(s, d, "customer").createOrReplaceTempView("graft_customer")
    t(s, d, "orders").createOrReplaceTempView("graft_orders")
    s.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM graft_orders o WHERE o.o_custkey = c.c_custkey) AS num_orders
        |FROM graft_customer c ORDER BY c_custkey""".stripMargin)
  }

  private val q13Sql =
    """SELECT c_custkey,
      |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS num_orders
      |FROM customer c ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q14
  /** S6/O3 keyed range scan (pagination analog). */
  private val q14: Q = (s, d) =>
    t(s, d, "orders")
      .where(col("o_orderkey").between(1000, 2000))
      .select("o_orderkey", "o_orderstatus")
      .orderBy("o_orderkey")

  private val q14Sql =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE o_orderkey BETWEEN 1000 AND 2000 ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q15
  /** P1 clean_page_content as pure Column algebra
    * (/root/reference/src/data_cleaners.py:5-14), md5-compared. */
  private val q15: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        md5(regexp_replace(
          regexp_replace(
            expr("replace(text, '<references />', '')"),
            lit("""\( *[,;.][^()]* *\)"""), lit("")),
          lit("""\( *[^()]*[,;] *\)"""), lit(""))).as("clean_md5"))
      .orderBy("doc_id")

  private val q15Sql =
    """SELECT doc_id, md5(regexp_replace(regexp_replace(
      |  replace(text, '<references />', ''),
      |  '\( *[,;.][^()]* *\)', '', 'g'),
      |  '\( *[^()]*[,;] *\)', '', 'g')) AS clean_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q16
  /** P7/P10/P11 title normalizations (upperFirst != initcap). */
  private val q16: Q = (s, d) =>
    t(s, d, "documents")
      .select("source").distinct()
      .select(
        col("source"),
        expr("concat(upper(substring(source, 1, 1)), substring(source, 2))").as("upper_first"),
        expr("concat(lower(substring(source, 1, 1)), substring(source, 2))").as("lower_first"),
        expr("replace(source, '_', ' ')").as("despaced"))
      .orderBy("source")

  private val q16Sql =
    """SELECT source,
      |  concat(upper(substring(source, 1, 1)), substring(source, 2)) AS upper_first,
      |  concat(lower(substring(source, 1, 1)), substring(source, 2)) AS lower_first,
      |  replace(source, '_', ' ') AS despaced
      |FROM (SELECT DISTINCT source FROM documents) ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q17
  /** P5 match_all occurrence counting via the non-overlapping replace
    * identity (/root/reference/src/utils.py:13-25). */
  private val q17: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        expr("CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)").as("the_cnt"),
        expr("CAST((length(text) - length(replace(text, 'spark', ''))) / 5 AS BIGINT)").as("spark_cnt"))
      .orderBy("doc_id")

  private val q17Sql =
    """SELECT doc_id,
      |  CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT) AS the_cnt,
      |  CAST((length(text) - length(replace(text, 'spark', ''))) / 5 AS BIGINT) AS spark_cnt
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Token counting (whitespace tokens; training-data text analysis). */
  private val q18: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .orderBy("doc_id")

  private val q18Sql =
    """SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Quality scoring: char-class ratios (training-data text analysis). */
  private val q19: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_actual"),
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long").as("alpha_chars"),
        round(length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
          length(col("text")), 4).as("alpha_ratio"))
      .orderBy("doc_id")

  private val q19Sql =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars_actual,
      |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha_chars,
      |  round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text), 4) AS alpha_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Language-ID heuristic: stopword-count argmax (text analysis). */
  private val q20: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        expr("CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT)").as("stop_a"),
        expr("CAST((length(text) - length(replace(text, ' data ', ''))) / 6 AS BIGINT)").as("stop_b"))
      .withColumn("lang_guess",
        when(col("stop_a") >= col("stop_b"), lit("en-ish")).otherwise(lit("data-ish")))
      .orderBy("doc_id")

  private val q20Sql =
    """SELECT doc_id, stop_a, stop_b,
      |  CASE WHEN stop_a >= stop_b THEN 'en-ish' ELSE 'data-ish' END AS lang_guess
      |FROM (SELECT doc_id,
      |  CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS stop_a,
      |  CAST((length(text) - length(replace(text, ' data ', ''))) / 6 AS BIGINT) AS stop_b
      |FROM documents) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Exact dedup via content hash + window-min canonical id (S9/W1 analog,
    * training-data exact dedup). */
  private val q21: Q = (s, d) =>
    t(s, d, "documents")
      .withColumn("fp", md5(lower(trim(col("text")))))
      .withColumn("canonical_id",
        min("doc_id").over(Window.partitionBy("fp")))
      .select("doc_id", "fp", "canonical_id")
      .orderBy("doc_id")

  private val q21Sql =
    """SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS canonical_id
      |FROM (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q22
  /** P6 mention offsets via instr/strpos (1-based, 0 = absent). */
  private val q22: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        instr(col("text"), "spark").cast("long").as("spark_pos"),
        instr(col("text"), "the").cast("long").as("the_pos"))
      .orderBy("doc_id")

  private val q22Sql =
    """SELECT doc_id, CAST(strpos(text, 'spark') AS BIGINT) AS spark_pos,
      |  CAST(strpos(text, 'the') AS BIGINT) AS the_pos
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Embedding vector norm via higher-order functions (similarity search
    * support; double-cast before multiply on both sides). */
  private val q23: Q = (s, d) =>
    t(s, d, "embeddings")
      .select(
        col("vec_id"),
        expr("round(sqrt(aggregate(embedding, 0D, (s, x) -> s + cast(x AS double) * cast(x AS double))), 4)").as("nrm"))
      .orderBy("vec_id")

  private val q23Sql =
    """SELECT vec_id,
      |  round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS nrm
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Brute-force top-k cosine ANN baseline: probe = min vec_id; sort key is
    * the ROUNDED score + id so cross-engine ordering is stable. */
  private val q24: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val probe = emb.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    emb.crossJoin(broadcast(probe))
      .where(col("vec_id") =!= col("probe_id"))
      .select(
        col("vec_id"),
        expr("round(aggregate(zip_with(embedding, pe, (x, y) -> cast(x AS double) * cast(y AS double)), 0D, (s, v) -> s + v), 4)").as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  private val q24Sql =
    """WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
      |           WHERE vec_id = (SELECT min(vec_id) FROM embeddings))
      |SELECT e.vec_id,
      |  round(list_sum(list_transform(list_zip(e.embedding, p.pe),
      |        t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))), 4) AS cos_sim
      |FROM embeddings e, p WHERE e.vec_id <> p.probe_id
      |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q25
  /** N-gram (3-shingle) Jaccard near-dup scores within a source block
    * (training-data near-dedup; J10 blocking-key self-join shape). */
  private val q25: Q = (s, d) => {
    val sh = t(s, d, "documents")
      .withColumn("arr", split(lower(trim(col("text"))), "\\s+"))
      .where(size(col("arr")) >= 3)
      .select(
        col("doc_id"), col("source"),
        expr("array_distinct(transform(sequence(0, size(arr) - 3), i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2])))").as("sh"))
    val a = sh.select(col("doc_id").as("src_doc"), col("source"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("dst_doc"), col("source"), col("sh").as("sh_b"))
    a.join(b, "source")
      .where(col("src_doc") < col("dst_doc"))
      .select(
        col("src_doc"), col("dst_doc"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jac"))
      .where(col("jac") > 0)
      .orderBy("src_doc", "dst_doc")
  }

  private val q25Sql =
    """WITH sh AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_transform(range(len(arr) - 2), i -> arr[i+1] || ' ' || arr[i+2] || ' ' || arr[i+3])) AS sh
      |  FROM (SELECT doc_id, source, regexp_split_to_array(lower(trim(text)), '\s+') AS arr FROM documents)
      |  WHERE len(arr) >= 3)
      |SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc,
      |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jac
      |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) > 0
      |ORDER BY src_doc, dst_doc""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Levenshtein (built-in both engines) on source-name pairs. */
  private val q26: Q = (s, d) => {
    val src = t(s, d, "documents").select("source").distinct()
    val a = src.select(col("source").as("src_a"))
    val b = src.select(col("source").as("src_b"))
    a.crossJoin(b).where(col("src_a") < col("src_b"))
      .select(
        col("src_a"), col("src_b"),
        levenshtein(col("src_a"), col("src_b")).cast("long").as("lev"))
      .orderBy("src_a", "src_b")
  }

  private val q26Sql =
    """SELECT a.source AS src_a, b.source AS src_b,
      |  CAST(levenshtein(a.source, b.source) AS BIGINT) AS lev
      |FROM (SELECT DISTINCT source FROM documents) a
      |JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source
      |ORDER BY src_a, src_b""".stripMargin

  // ------------------------------------------------- native expressions
  /** P8 ASCII-fold as a native codegen Expression (registered via
    * GraftExtensions); oracle = DuckDB strip_accents on the same
    * fold-range input. */
  private val q31: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        expr("graft_ascii_fold(concat(source, ' Wêreldé-ü ö í à'))").as("folded"))
      .orderBy("doc_id")

  private val q31Sql =
    """SELECT doc_id, strip_accents(concat(source, ' Wêreldé-ü ö í à')) AS folded
      |FROM documents ORDER BY doc_id""".stripMargin

  /** P9 percent-encode as a native Expression; oracle = handcrafted
    * replace chain over the known input charset. */
  private val q32: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        expr("graft_escape_title(concat(source, ' one/two+three'))").as("escaped"))
      .orderBy("doc_id")

  private val q32Sql =
    """SELECT doc_id,
      |  replace(replace(concat(source, ' one/two+three'), ' ', '%20'), '+', '%2B') AS escaped
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Jaro-Winkler as a native binary Expression vs DuckDB's builtin. */
  private val q33: Q = (s, d) => {
    val src = t(s, d, "documents").select("source").distinct()
    val a = src.select(col("source").as("src_a"))
    val b = src.select(col("source").as("src_b"))
    a.crossJoin(b).where(col("src_a") < col("src_b"))
      .select(
        col("src_a"), col("src_b"),
        expr("round(graft_jaro_winkler(src_a, src_b), 6)").as("jw"))
      .orderBy("src_a", "src_b")
  }

  private val q33Sql =
    """SELECT a.source AS src_a, b.source AS src_b,
      |  round(jaro_winkler_similarity(a.source, b.source), 6) AS jw
      |FROM (SELECT DISTINCT source FROM documents) a
      |JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source
      |ORDER BY src_a, src_b""".stripMargin

  // ------------------------------------------------------- rows-only set
  /** MinHash-LSH near-dup candidate blocks over documents (engine hashes —
    * no SQL oracle; driver does a rows-only check). */
  private val q27: Q = (s, d) => {
    import s.implicits._
    val docs = t(s, d, "documents").select("doc_id", "text").as[(Long, String)]
    docs.flatMap { case (id, text) =>
      val toks = TextFunctions.wordTokens(text)
      val sig = Similarity.minHashSignature(Similarity.shingleHashes(toks, 3), 20)
      Similarity.lshBandKeys(sig, 4).map(k => (k, id))
    }.toDF("band_key", "doc_id")
      .groupBy("band_key").agg(count(lit(1)).as("sz"), min("doc_id").as("min_doc"))
      .orderBy(col("band_key"))
  }

  /** SimHash fingerprints + hamming distance to the corpus min doc. */
  private val q28: Q = (s, d) => {
    import s.implicits._
    val docs = t(s, d, "documents").select("doc_id", "text").as[(Long, String)]
    val sims = docs.map { case (id, text) =>
      (id, Similarity.simHash(TextFunctions.wordTokens(text).map(Hashing.hashString)))
    }.toDF("doc_id", "simhash")
    val probe = sims.orderBy("doc_id").limit(1)
      .select(col("simhash").as("probe_sim"))
    sims.crossJoin(broadcast(probe))
      .select(
        col("doc_id"), col("simhash"),
        expr("CAST(bit_count(simhash ^ probe_sim) AS BIGINT)").as("hamming_to_first"))
      .orderBy("doc_id")
  }

  /** The full ER pipeline on the deterministic synthetic corpus (constant
    * size — independent of sf): url -> cluster id (rows-only). */
  private val q29: Q = (s, _) => {
    import s.implicits._
    val pages = graft.sources.WebPagesGen.webpages(s, 150)
    val extracted = graft.pipeline.EntityResolution.extract(s, pages)
    val feats = graft.operators.Blocking.features(s, extracted)
    val blocks = graft.operators.Blocking.blockEntries(s, feats)
    val (pairs, _) = graft.operators.Blocking.candidatePairs(s, blocks)
    val scored = graft.operators.PairScoring.score(s, pairs, feats)
    val edges = scored.where(col("isDuplicate"))
      .select(col("src"), col("dst")).as[graft.model.Edge]
    val assigned = graft.operators.ConnectedComponents.assign(
      s, edges, feats.select(col("id")))
    feats.select(col("id"), col("url")).join(assigned, "id")
      .select(col("url"), col("comp").as("cluster"))
      .orderBy("url")
  }

  /** LSH-bucketed approximate nearest neighbors (the ANN scale path;
    * engine hashes — rows-only): top-3 per query over the embeddings
    * table, queries = first 20 vectors. */
  private val q34: Q = (s, d) => {
    import s.implicits._
    import graft.operators.SimilaritySearch
    import graft.operators.SimilaritySearch.EmbeddingRow
    val emb = t(s, d, "embeddings")
      .selectExpr("vec_id AS id", "embedding AS vec").as[EmbeddingRow]
    val queries = emb.filter((r: EmbeddingRow) => r.id < 20)
    SimilaritySearch.lshTopK(s, queries, emb, 3)
      .orderBy("qid", "rnk")
  }

  /** Multimodal plumbing: opaque binary columns + typed metadata through
    * the batched Multimodal operator (decode is a marked stub — no media
    * libs in-container; schema/partitioning/batch shape real; rows-only). */
  private val q30: Q = (s, _) => {
    import s.implicits._
    import graft.operators.Multimodal
    val media = graft.sources.WebPagesGen.webpages(s, 200).map { p =>
      val modality = (Hashing.hashString(p.url) & 3L) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "text"
      }
      Multimodal.MediaRow(graft.operators.Blocking.docId(p.url), modality, p.html)
    }
    Multimodal.extractFeatures(s, media).toDF().orderBy("id")
  }

  val all: Map[String, Q] = Map(
    "q01_group_agg" -> q01,
    "q02_filter_project" -> q02,
    "q03_join3_agg" -> q03,
    "q04_star_join" -> q04,
    "q05_semi_join" -> q05,
    "q06_anti_join" -> q06,
    "q07_distinct" -> q07,
    "q08_union_counts" -> q08,
    "q09_window_rank" -> q09,
    "q10_topk" -> q10,
    "q11_case_agg" -> q11,
    "q12_having" -> q12,
    "q13_correlated_count" -> q13,
    "q14_range_scan" -> q14,
    "q15_clean_text" -> q15,
    "q16_normalize_titles" -> q16,
    "q17_match_count" -> q17,
    "q18_token_count" -> q18,
    "q19_quality_score" -> q19,
    "q20_lang_guess" -> q20,
    "q21_dedup_exact" -> q21,
    "q22_mention_offset" -> q22,
    "q23_embed_norm" -> q23,
    "q24_embed_knn" -> q24,
    "q25_ngram_jaccard" -> q25,
    "q26_levenshtein" -> q26,
    "q27_minhash_blocks" -> q27,
    "q28_simhash" -> q28,
    "q29_er_clusters" -> q29,
    "q30_multimodal_stub" -> q30,
    "q31_ascii_fold_expr" -> q31,
    "q32_escape_title_expr" -> q32,
    "q33_jaro_winkler_expr" -> q33,
    "q34_ann_lsh" -> q34)

  val oracles: Map[String, String] = Map(
    "q01_group_agg" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_join3_agg" -> q03Sql,
    "q04_star_join" -> q04Sql,
    "q05_semi_join" -> q05Sql,
    "q06_anti_join" -> q06Sql,
    "q07_distinct" -> q07Sql,
    "q08_union_counts" -> q08Sql,
    "q09_window_rank" -> q09Sql,
    "q10_topk" -> q10Sql,
    "q11_case_agg" -> q11Sql,
    "q12_having" -> q12Sql,
    "q13_correlated_count" -> q13Sql,
    "q14_range_scan" -> q14Sql,
    "q15_clean_text" -> q15Sql,
    "q16_normalize_titles" -> q16Sql,
    "q17_match_count" -> q17Sql,
    "q18_token_count" -> q18Sql,
    "q19_quality_score" -> q19Sql,
    "q20_lang_guess" -> q20Sql,
    "q21_dedup_exact" -> q21Sql,
    "q22_mention_offset" -> q22Sql,
    "q23_embed_norm" -> q23Sql,
    "q24_embed_knn" -> q24Sql,
    "q25_ngram_jaccard" -> q25Sql,
    "q26_levenshtein" -> q26Sql,
    "q31_ascii_fold_expr" -> q31Sql,
    "q32_escape_title_expr" -> q32Sql,
    "q33_jaro_winkler_expr" -> q33Sql)
}
