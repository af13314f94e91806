package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-contract query battery (SparkEntry): one entry per operator from
  * SURVEY.md §2 plus the training-data-pipeline operators (dedup,
  * similarity search, text analysis, multimodal plumbing), each as an
  * idiomatic Spark formulation with an exactly-mirrored DuckDB oracle.
  *
  * Parity rules shared by both engines:
  *  - identical regexes / word lists / hash recipes (md5 hex);
  *  - no raw doubles in outputs: scaled BIGINTs (cents / micro-units) so
  *    IEEE noise cannot break the value-hash compare;
  *  - deterministic sets (no LIMIT without a total tie-broken order).
  */
object Queries {

  // ---------------------------------------------------------------- shared
  private def p(dir: String, t: String) = s"$dir/$t.parquet"

  val SepRegexes: Vector[(String, String)] = Vector(
    "semicolon" -> ";", "pipe" -> "\\|", "colon" -> ":+\\s+\\s*",
    "tab" -> "\\t", "comma" -> ",")

  val IntRe = "^[+-]?([1-9][0-9]*|0)$"
  val FloatRe = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
  val BoolRe = "^(True|False)$"
  val IdentRe = "^[A-Za-z_][A-Za-z0-9_]*$"
  val DateRe = "^\\d{4}-\\d{2}-\\d{2}([T ]\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?)?$"
  val UriRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+\\S*$"
  val TokenSplitRe = "\\s+"
  /** TokenSplitRe escaped for embedding in a Spark SQL string literal
    * (Spark processes backslash escapes inside '...' literals). */
  val TokenSplitSql = "\\\\s+"
  val BpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  val PunctRe = "[^A-Za-z0-9\\s]"

  val StopEn = Vector("the", "a", "and", "of", "to", "in", "is")
  val StopDe = Vector("der", "die", "das", "und", "ist", "nicht", "ein")
  val StopFr = Vector("le", "la", "les", "et", "est", "un", "une")
  val StopEs = Vector("el", "los", "las", "y", "es", "este", "una")

  val MinhashK = 8
  val JaccardWindow = 20

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("(", ",", ")")

  // =============================================================== queries

  /** Q01 — partial-aggregatable pricing summary (A7-style groupBy). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "lineitem"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        expr("cast(round(sum(l_quantity) * 100) as bigint)").as("sum_qty_c"),
        expr("cast(round(sum(l_extendedprice) * 100) as bigint)").as("sum_price_c"),
        expr("cast(round(sum(l_extendedprice * (1 - l_discount)) * 100) as bigint)").as("revenue_c"),
        expr("cast(round(avg(l_discount) * 1000000) as bigint)").as("avg_disc_u"),
        count(lit(1)).as("n"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_c,
      |  CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_price_c,
      |  CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_c,
      |  CAST(round(avg(l_discount) * 1000000) AS BIGINT) AS avg_disc_u,
      |  count(*) AS n
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** Q02 — filter + projection (predicate/column pushdown to the scan). */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "lineitem"))
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-03-01").cast("timestamp") &&
        col("l_quantity") < 10)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("price_c"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_shipdate < TIMESTAMP '1995-03-01' AND l_quantity < 10""".stripMargin

  /** Q03 — multi-join with broadcast dimensions (J-class). */
  def q03JoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(p(dir, "orders"))
    val c = s.read.parquet(p(dir, "customer"))
    val n = s.read.parquet(p(dir, "nation"))
    val r = s.read.parquet(p(dir, "region"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"), col("r_name"))
      .agg(expr("cast(round(sum(o_totalprice) * 100) as bigint)").as("revenue_c"),
        count(lit(1)).as("n_orders"))
  }

  val q03Sql: String =
    """SELECT n_name, r_name,
      |  CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS revenue_c,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2""".stripMargin

  /** Q04 — left-semi join (EXISTS). */
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(p(dir, "orders"))
    val l = s.read.parquet(p(dir, "lineitem")).filter(col("l_quantity") > 45)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, count(*) AS n FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY 1""".stripMargin

  /** Q05 — left-anti join (NOT EXISTS; the resume-filter shape). */
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = s.read.parquet(p(dir, "customer"))
    val o = s.read.parquet(p(dir, "orders"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
  }

  val q05Sql: String =
    """SELECT c_nationkey, count(*) AS n FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY 1""".stripMargin

  /** Q06 — top-k per group (O-class; total tie-broken order). */
  def q06TopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val l = s.read.parquet(p(dir, "lineitem"))
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    l.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("l_suppkey"), col("rk"), col("l_orderkey"), col("l_linenumber"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("price_c"))
  }

  val q06Sql: String =
    """SELECT l_suppkey, rk, l_orderkey, l_linenumber, price_c FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      |    row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      |  FROM lineitem) WHERE rk <= 3""".stripMargin

  /** Q07 — run-length segmentation via lag + cumulative sum: the window
    * formulation of the engine's A1 segmenter (SURVEY §2.4).
    */
  def q07RunlengthSegments(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(p(dir, "events"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    e.withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1).otherwise(0))
      .withColumn("seg_id", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seg_id")
      .agg(min("event_type").as("event_type"), count(lit(1)).as("n_events"),
        expr("min(unix_micros(cast(ts as timestamp_ltz)))").as("first_us"))
  }

  val q07Sql: String =
    """WITH v AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sgm AS (
      |  -- CAST: DuckDB's uncast sum() is HUGEINT; Spark's is BIGINT, and
      |  -- the driver hash is type-sensitive (VERDICT r01 item 1).
      |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_id FROM v)
      |SELECT user_id, seg_id, min(event_type) AS event_type,
      |  count(*) AS n_events, min(epoch_us(ts)) AS first_us
      |FROM sgm GROUP BY 1, 2""".stripMargin

  /** Q08 — sessionization (gap > 30 min), same lag+sum shape. */
  def q08Sessionize(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(p(dir, "events"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    e.withColumn("prev_us", lag(expr("unix_micros(cast(ts as timestamp_ltz))"), 1).over(w))
      .withColumn("gap",
        when(col("prev_us").isNull ||
          expr("unix_micros(cast(ts as timestamp_ltz))") - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("gap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  val q08Sql: String =
    """WITH v AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
      |         ELSE 0 END AS gap
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT *, CAST(sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM v)
      |SELECT user_id, max(session_id) AS n_sessions, count(*) AS n_events
      |FROM sess GROUP BY 1""".stripMargin

  /** Q09 — structured-string field extraction (F11-class, regexp both
    * sides to avoid engine JSON dialects).
    */
  def q09JsonExtract(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "events"))
      .withColumn("kx", regexp_extract(col("props"), "\"k\": (\\d+)", 1))
      .withColumn("k", when(col("kx") === "", lit(null)).otherwise(col("kx")).cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))

  val q09Sql: String =
    """SELECT event_type,
      |  CAST(sum(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  /** Q10 — per-line separator vote (P1), German-decimal-comma fallback
    * included (annotator.py:254-277), as pure column arithmetic.
    */
  def q10SepVote(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
    val counted = SepRegexes.foldLeft(d.select(col("doc_id"), col("text"))) {
      case (df, (label, re)) => df.withColumn("c_" + label, regexp_count(col("text"), lit(re)))
    }
    val Seq(c1, c2, c3, c4, c5) = SepRegexes.map { case (l, _) => col("c_" + l) }
    val bestNonComma =
      when(c1 >= c2 && c1 >= c3 && c1 >= c4, struct(lit("semicolon").as("sep"), c1.as("cnt")))
        .when(c2 >= c3 && c2 >= c4, struct(lit("pipe").as("sep"), c2.as("cnt")))
        .when(c3 >= c4, struct(lit("colon").as("sep"), c3.as("cnt")))
        .otherwise(struct(lit("tab").as("sep"), c4.as("cnt")))
    val winner =
      when(greatest(c1, c2, c3, c4, c5) === lit(0), struct(lit("none").as("sep"), lit(0).as("cnt")))
        .when(c5 > greatest(c1, c2, c3, c4),
          // comma won outright; German fallback when runner-up >= cnt-1
          when(greatest(c1, c2, c3, c4) >= c5 - 1, bestNonComma)
            .otherwise(struct(lit("comma").as("sep"), c5.as("cnt"))))
        .otherwise(bestNonComma)
    counted.select(col("doc_id"), winner.getField("sep").as("sep"),
      winner.getField("cnt").cast("long").as("cnt"))
  }

  val q10Sql: String = {
    val cs = SepRegexes.map { case (l, re) =>
      s"len(regexp_extract_all(text, '$re')) AS c_$l"
    }.mkString(",\n    ")
    s"""WITH counted AS (SELECT doc_id, $cs FROM documents),
       |best AS (SELECT doc_id, c_semicolon, c_pipe, c_colon, c_tab, c_comma,
       |  CASE WHEN c_semicolon >= c_pipe AND c_semicolon >= c_colon AND c_semicolon >= c_tab THEN 'semicolon'
       |       WHEN c_pipe >= c_colon AND c_pipe >= c_tab THEN 'pipe'
       |       WHEN c_colon >= c_tab THEN 'colon' ELSE 'tab' END AS nc_sep,
       |  CASE WHEN c_semicolon >= c_pipe AND c_semicolon >= c_colon AND c_semicolon >= c_tab THEN c_semicolon
       |       WHEN c_pipe >= c_colon AND c_pipe >= c_tab THEN c_pipe
       |       WHEN c_colon >= c_tab THEN c_colon ELSE c_tab END AS nc_cnt
       |  FROM counted)
       |SELECT doc_id,
       |  CASE WHEN greatest(c_semicolon, c_pipe, c_colon, c_tab, c_comma) = 0 THEN 'none'
       |       WHEN c_comma > greatest(c_semicolon, c_pipe, c_colon, c_tab)
       |         THEN CASE WHEN greatest(c_semicolon, c_pipe, c_colon, c_tab) >= c_comma - 1
       |                   THEN nc_sep ELSE 'comma' END
       |       ELSE nc_sep END AS sep,
       |  CAST(CASE WHEN greatest(c_semicolon, c_pipe, c_colon, c_tab, c_comma) = 0 THEN 0
       |       WHEN c_comma > greatest(c_semicolon, c_pipe, c_colon, c_tab)
       |         THEN CASE WHEN greatest(c_semicolon, c_pipe, c_colon, c_tab) >= c_comma - 1
       |                   THEN nc_cnt ELSE c_comma END
       |       ELSE nc_cnt END AS BIGINT) AS cnt
       |FROM best""".stripMargin
  }

  /** Q11 — cell-type sniff (F2) over all document tokens, as a codegen'd
    * when/rlike cascade (the SQL-mirrorable core of CellType.typeOf).
    */
  def q11Typeof(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
    val toks = d.select(col("doc_id"),
      posexplode(split(col("text"), TokenSplitRe)).as(Seq("pos", "tok")))
    val t = regexp_replace(trim(col("tok")), ",", ".")
    toks.withColumn("celltype",
        when(t === "", "BLANK")
          .when(t.rlike(IntRe), "INT")
          .when(t.rlike(FloatRe), "FLOAT")
          .when(t.rlike(BoolRe), "BOOL")
          .when(t.rlike(IdentRe), "TEXT")
          .when(t.rlike(DateRe), "DATE")
          .when(t.rlike(UriRe), "URI")
          .otherwise("TEXT"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"), col("celltype"))
  }

  val q11Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, u['pos'] AS pos, u['tok'] AS tok FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
       |      i -> {'pos': i - 1, 'tok': t[i]})) AS u
       |    FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents))
       |), prepped AS (SELECT doc_id, pos, tok, replace(trim(tok), ',', '.') AS t FROM toks)
       |SELECT doc_id, pos, tok,
       |  CASE WHEN t = '' THEN 'BLANK'
       |       WHEN regexp_matches(t, '$IntRe') THEN 'INT'
       |       WHEN regexp_matches(t, '$FloatRe') THEN 'FLOAT'
       |       WHEN regexp_matches(t, '$BoolRe') THEN 'BOOL'
       |       WHEN regexp_matches(t, '$IdentRe') THEN 'TEXT'
       |       WHEN regexp_matches(t, '$DateRe') THEN 'DATE'
       |       WHEN regexp_matches(t, '$UriRe') THEN 'URI'
       |       ELSE 'TEXT' END AS celltype
       |FROM prepped""".stripMargin

  /** Q12 — unit-token normalization chain (F4). */
  def q12UnitNormalize(s: SparkSession, dir: String): DataFrame = {
    val toks = s.read.parquet(p(dir, "part"))
      .select(col("p_partkey"), posexplode(split(col("p_name"), " ")).as(Seq("pos", "tok")))
    val norm = regexp_replace(regexp_replace(regexp_replace(
      expr("trim(BOTH ' []():' FROM tok)"),
      "N/mm2", "MPa"), "Nm", "N.m"), "sec", "s")
    toks.select(col("p_partkey"), col("pos").cast("long").as("pos"),
      col("tok"), norm.as("norm"))
  }

  val q12Sql: String =
    """WITH toks AS (
      |  SELECT p_partkey, u['pos'] AS pos, u['tok'] AS tok FROM (
      |    SELECT p_partkey, unnest(list_transform(generate_series(1, len(t)),
      |      i -> {'pos': i - 1, 'tok': t[i]})) AS u
      |    FROM (SELECT p_partkey, string_split(p_name, ' ') AS t FROM part)))
      |SELECT p_partkey, pos, tok,
      |  replace(replace(replace(trim(tok, ' []():'),
      |    'N/mm2', 'MPa'), 'Nm', 'N.m'), 'sec', 's') AS norm
      |FROM toks""".stripMargin

  /** Q13 — entity-linking broadcast join against the QUDT dictionary
    * (J1). The oracle inlines the winner-per-key dictionary as VALUES so
    * DuckDB checks the join itself (the dictionary derivation from TTL
    * is pinned separately by OracleSpec against the reference).
    */
  def q13UnitLink(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // deterministic winner per key: min (key_kind, parse_order) — the
    // exact rule UnitDict.fromRows applies when building `default.entries`
    // ((key_kind, parse_order) is unique per row, so min-of-struct is
    // decided by those two fields alone). r9: build the broadcast side
    // directly from the already-materialized winner map instead of
    // re-deriving it with a distributed groupBy every run (OracleSpec pins
    // the dictionary derivation; QuerySpec pins groupBy == entries).
    val winner = graft.link.UnitDict.default.entries.toSeq.sortBy(_._1)
      .map { case (k, h) => (k, h.iri, h.rdfType) }
      .toDF("key", "unit_iri", "unit_type")
    val toks = q12UnitNormalize(s, dir).select(col("p_partkey"), col("pos"), col("norm"))
    toks.join(broadcast(winner), toks("norm") === winner("key"), "inner")
      .select(col("p_partkey"), col("pos"), col("norm"), col("unit_iri"), col("unit_type"))
  }

  lazy val q13SqlOpt: Option[String] = scala.util.Try(q13Sql).toOption

  lazy val q13Sql: String = {
    def esc(x: String) = x.replace("'", "''")
    val winners = graft.link.UnitDict.default
      .entries.toSeq.sortBy(_._1)
      .map { case (k, h) => s"('${esc(k)}','${esc(h.iri)}','${esc(h.rdfType)}')" }
      .mkString(",\n    ")
    s"""WITH dict(key, unit_iri, unit_type) AS (VALUES
       |    $winners),
       |toks AS ($q12Sql)
       |SELECT p_partkey, pos, norm, unit_iri, unit_type
       |FROM toks JOIN dict ON norm = key""".stripMargin
  }

  /** Q14 — exact deduplication: content-hash groupBy (hash-groupBy dedup). */
  def q14DedupExact(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "documents"))
      .withColumn("h", md5(col("text")))
      .groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"))

  val q14Sql: String =
    "SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS min_id FROM documents GROUP BY 1"

  // shared shingle SQL helpers
  /** Distinct n-token shingles: the native [[graft.expr.ShinglesOf]]
    * codegen Expression — bit-identical to the HOF/SQL construction
    * `array_distinct(transform(sequence(1, greatest(len-n+1, 1)),
    * i -> t[i] || ' ' || coalesce(t[i+k], '')))` that the DuckDB
    * oracles mirror (equality pinned by OpsSpec). */
  private def sparkShingles(n: Int): Column =
    graft.expr.ShinglesOf(col("text"), n)

  /** Q15 — MinHash + LSH banding for near-duplicate detection. Signature
    * j = lexicographic min of md5(j || ':' || shingle) over distinct token
    * 3-shingles; two 4-row bands hashed into bucket keys.
    *
    * r9 (guide §2.4): signatures via the narrow one-pass
    * [[graft.expr.MinHashMd5Of]] kernel — bit-identical to the previous
    * `explode(shingles) -> groupBy(doc_id) -> 8 min(md5(...))` plan
    * (pinned by OpsSpec) but with NO shingle explode and NO aggregation
    * shuffle: zero exchanges, signatures at scan speed.
    */
  def q15MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sigs = s.read.parquet(p(dir, "documents"))
      .select(col("doc_id"),
        graft.expr.MinHashMd5Of(col("text"), 3, MinhashK).as("_sigs"))
    sigs.select(col("doc_id"),
      md5(concat_ws("|", (0 until 4).map(j => col("_sigs").getItem(j)): _*)).as("band1"),
      md5(concat_ws("|", (4 until 8).map(j => col("_sigs").getItem(j)): _*)).as("band2"))
  }

  val q15Sql: String = {
    val sigCols = (0 until MinhashK).map(j =>
      s"min(md5('$j:' || sh)) AS sig$j").mkString(",\n    ")
    s"""WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
       |shingles AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, greatest(len(t) - 2, 1)),
       |    i -> t[i] || ' ' || coalesce(t[i+1], '') || ' ' || coalesce(t[i+2], '')))) AS sh
       |  FROM toks),
       |sigs AS (SELECT doc_id, $sigCols FROM shingles GROUP BY doc_id)
       |SELECT doc_id,
       |  md5(sig0 || '|' || sig1 || '|' || sig2 || '|' || sig3) AS band1,
       |  md5(sig4 || '|' || sig5 || '|' || sig6 || '|' || sig7) AS band2
       |FROM sigs""".stripMargin
  }

  /** Q16 — LSH candidate pairs. Pairs are generated *within* each bucket
    * group (groupBy bucket -> sorted id set -> i<j pair expansion), not
    * via a bucket self-join: the signature subtree (shingling + 8 md5
    * min-aggregates) is computed ONCE instead of once per join side, and
    * there is no join at all — one shuffle on the bucket key plus the
    * final pair distinct. Same result set as the join formulation (the
    * oracle keeps the join form). The capped, skew-safe production
    * variant is [[graft.ops.Dedup.lshCandidatePairs]].
    */
  def q16MinhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = q15MinhashLsh(s, dir)
    val buckets = sig.select(col("doc_id"),
      explode(array(col("band1"), col("band2"))).as("b"))
    buckets.groupBy("b").agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> named_struct('id1', x, 'id2', y))))""".stripMargin)).as("pr"))
      .select(col("pr.id1").as("id1"), col("pr.id2").as("id2"))
      .distinct()
  }

  val q16Sql: String =
    s"""WITH sig AS ($q15Sql),
       |bands AS (
       |  SELECT doc_id, band1 AS b FROM sig
       |  UNION ALL SELECT doc_id, band2 AS b FROM sig)
       |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |FROM bands a JOIN bands b ON a.b = b.b AND a.doc_id < b.doc_id""".stripMargin

  /** Q17 — SimHash (16-bit demo width): per bit, majority vote of token
    * md5 hex digits; fingerprint reassembled as a bit string.
    */
  def q17Simhash(s: SparkSession, dir: String): DataFrame =
    // r9 (guide §2.4): the whole fingerprint via the narrow one-pass
    // [[graft.expr.SimHashMd5Of]] kernel — bit-identical to the exploded
    // distinct-token + 16 vote-sum aggregation (pinned by OpsSpec), but
    // with NO token explode and NO shuffle (r8 shape: one shuffle on the
    // doc id; r01: two aggregations over a 16x-exploded stream).
    s.read.parquet(p(dir, "documents"))
      .select(col("doc_id"),
        graft.expr.SimHashMd5Of(col("text"), 16).as("simhash"))

  val q17Sql: String =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id, u.tok FROM documents,
      |    unnest(string_split_regex(text, '\s+')) AS u(tok)
      |), hashed AS (SELECT doc_id, md5(tok) AS h FROM toks),
      |bits AS (
      |  SELECT doc_id, b.bit,
      |    CASE WHEN (strpos('0123456789abcdef', substr(h, (b.bit // 4) + 1, 1)) - 1)
      |           // CAST(pow(2, 3 - (b.bit % 4)) AS INT) % 2 = 1 THEN 1 ELSE -1 END AS v
      |  FROM hashed, (SELECT unnest(generate_series(0, 15)) AS bit) b
      |), agg AS (SELECT doc_id, bit, sum(v) AS sv FROM bits GROUP BY 1, 2)
      |SELECT doc_id, string_agg(CASE WHEN sv > 0 THEN '1' ELSE '0' END, ''
      |  ORDER BY bit) AS simhash
      |FROM agg GROUP BY doc_id""".stripMargin

  /** Q18 — n-gram Jaccard near-dup scoring over banded candidate pairs
    * (same source, id distance <= 20 — a linear-cost candidate set).
    */
  def q18NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
      .select(col("doc_id"), col("source"), sparkShingles(3).as("sh"))
    val a = d.as("a"); val b = d.as("b")
    a.join(b, col("a.source") === col("b.source") &&
        col("b.doc_id") > col("a.doc_id") &&
        col("b.doc_id") <= col("a.doc_id") + JaccardWindow)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("inter"),
        (size(col("a.sh")) + size(col("b.sh"))).cast("long").as("sz"))
      .withColumn("jac_u",
        expr("cast(round(1000000.0 * inter / (sz - inter)) as bigint)"))
      .select("id1", "id2", "inter", "jac_u")
  }

  val q18Sql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, source, list_distinct(list_transform(
       |    generate_series(1, greatest(len(t) - 2, 1)),
       |    i -> t[i] || ' ' || coalesce(t[i+1], '') || ' ' || coalesce(t[i+2], ''))) AS sh
       |  FROM (SELECT doc_id, source, string_split_regex(text, '\\s+') AS t FROM documents))
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       |  CAST(round(1000000.0 * len(list_intersect(a.sh, b.sh)) /
       |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) AS BIGINT) AS jac_u
       |FROM sh a JOIN sh b ON a.source = b.source
       |  AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + $JaccardWindow""".stripMargin

  /** Q19 — brute-force cosine top-k against a query vector (vec_id 0):
    * the exact baseline for ANN. Scores integer-scaled after rounding.
    */
  def q19CosineTopk(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(p(dir, "embeddings"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    // graft_dot: native codegen Expression, bit-identical to the HOF form
    e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .withColumn("dotd", graft.expr.ArrayDot(col("embedding"), col("qv")))
      .withColumn("nrm", sqrt(graft.expr.ArrayDot(col("embedding"), col("embedding"))))
      .withColumn("qn", sqrt(graft.expr.ArrayDot(col("qv"), col("qv"))))
      .withColumn("cos_u", expr("cast(round(1000000.0 * dotd / (nrm * qn)) as bigint)"))
      .select(col("vec_id"), col("cos_u"))
      .orderBy(col("cos_u").desc, col("vec_id")).limit(10)
      // rank the post-limit 10 rows: a constant-valued (but non-foldable,
      // so it survives the optimizer) partition key keeps the single-
      // partition window from logging the global "no partition defined"
      // warning on every bench run
      .withColumn("rk", row_number().over(
        Window.partitionBy(pmod(col("vec_id"), lit(1)))
          .orderBy(col("cos_u").desc, col("vec_id"))).cast("long"))
  }

  val q19Sql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |scored AS (
      |  SELECT vec_id, CAST(round(1000000.0 *
      |    list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])) /
      |    (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
      |     sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[]))))) AS BIGINT) AS cos_u
      |  FROM embeddings, q WHERE vec_id <> 0)
      |SELECT vec_id, cos_u,
      |  row_number() OVER (ORDER BY cos_u DESC, vec_id) AS rk
      |FROM scored ORDER BY cos_u DESC, vec_id LIMIT 10""".stripMargin

  /** Q20 — LSH-bucketed ANN scale path: sign-random-projection buckets
    * using dataset vectors 1..8 as deterministic hyperplanes.
    */
  def q20AnnBuckets(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(p(dir, "embeddings"))
    // r9 (guide §2.4): the 8 hyperplanes are a driver-sized constant of
    // the query (dataset vectors 1..8) — collect them once and compute
    // the bucket string NARROW (8 codegen dots + concat per row) instead
    // of a plane crossJoin (8x row blowup) + a per-id collect_list
    // shuffle. Bit rule, plane order (plane_id ascending ==
    // sort_array(struct(plane_id, bit))), and ArrayDot arithmetic are
    // identical; one exchange (the bucket groupBy) instead of two.
    val planes = e.filter(col("vec_id").between(1, 8))
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").collect()
    val bits = planes.map { r =>
      val pv = typedlit(r.getSeq[Float](1))
      when(round(lit(1000000.0) * graft.expr.ArrayDot(col("embedding"), pv))
        .cast("long") > 0, "1").otherwise("0")
    }.toSeq
    e.select(col("vec_id"), concat(bits: _*).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("vec_id").as("min_vec"))
  }

  val q20Sql: String =
    """WITH planes AS (
      |  SELECT vec_id AS plane_id, embedding AS pv FROM embeddings
      |  WHERE vec_id BETWEEN 1 AND 8),
      |bits AS (
      |  SELECT e.vec_id, p.plane_id,
      |    CASE WHEN CAST(round(1000000.0 * list_dot_product(
      |      CAST(e.embedding AS DOUBLE[]), CAST(p.pv AS DOUBLE[]))) AS BIGINT) > 0
      |    THEN '1' ELSE '0' END AS bit
      |  FROM embeddings e, planes p),
      |buckets AS (
      |  SELECT vec_id, string_agg(bit, '' ORDER BY plane_id) AS bucket
      |  FROM bits GROUP BY vec_id)
      |SELECT bucket, count(*) AS n, min(vec_id) AS min_vec
      |FROM buckets GROUP BY 1""".stripMargin

  /** Q21 — language identification by character-trigram profiles
    * ([[graft.ops.LangNgram]]: rank-weighted top trigrams per language,
    * deterministic Cavnar–Trenkle shape; tie priority en > de > fr >
    * es; 'und' when no profile trigram occurs). The Spark side runs
    * the NARROW one-pass scorer (trigram array bound once, single
    * aggregate, no shuffle — the 100 TB shape); the oracle receives
    * the same profile as a VALUES table and re-derives the scores
    * independently via explode + join + pivot.
    */
  def q21Langid(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
    graft.ops.LangNgram.langIdNgram(
        d.select(col("doc_id"), col("lang").as("true_lang"), col("text")), "text")
      .select("doc_id", "true_lang", "pred_lang", "s_en", "s_de", "s_fr", "s_es")
  }

  val q21Sql: String = {
    val values = graft.ops.LangNgram.Langs
      .flatMap(l => graft.ops.LangNgram.Profiles(l).map { case (g, w) =>
        s"('$l', '${g.replace("'", "''")}', $w)"
      }).mkString(",\n    ")
    s"""WITH prof(lang, gram, w) AS (VALUES
       |    $values),
       |tri AS (
       |  SELECT d.doc_id, substr(' ' || lower(d.text) || ' ', CAST(t.i AS INT), 3) AS gram
       |  FROM documents d, LATERAL unnest(generate_series(1, greatest(length(lower(d.text)), 1)))
       |    AS t(i)),
       |sc AS (
       |  SELECT t.doc_id,
       |    CAST(coalesce(sum(p.w) FILTER (p.lang = 'en'), 0) AS BIGINT) AS s_en,
       |    CAST(coalesce(sum(p.w) FILTER (p.lang = 'de'), 0) AS BIGINT) AS s_de,
       |    CAST(coalesce(sum(p.w) FILTER (p.lang = 'fr'), 0) AS BIGINT) AS s_fr,
       |    CAST(coalesce(sum(p.w) FILTER (p.lang = 'es'), 0) AS BIGINT) AS s_es
       |  FROM tri t JOIN prof p ON t.gram = p.gram GROUP BY 1),
       |h AS (
       |  SELECT d.doc_id, d.lang AS true_lang,
       |    coalesce(s.s_en, 0) AS s_en, coalesce(s.s_de, 0) AS s_de,
       |    coalesce(s.s_fr, 0) AS s_fr, coalesce(s.s_es, 0) AS s_es
       |  FROM documents d LEFT JOIN sc s USING (doc_id))
       |SELECT doc_id, true_lang,
       |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
       |       WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
       |       WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
       |       WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS pred_lang,
       |  s_en, s_de, s_fr, s_es
       |FROM h""".stripMargin
  }

  /** Q22 — document quality scoring: token/punct/stopword/length stats
    * (integer-scaled ratios).
    */
  def q22Quality(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "documents"))
      // token array bound once (multi-ref alias survives CollapseProject)
      .withColumn("toks", split(col("text"), TokenSplitRe))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_punct", regexp_count(col("text"), lit(PunctRe)).cast("long"))
      .withColumn("n_stop", size(expr(
        s"filter(toks, w -> lower(w) IN ${sqlList(StopEn)})")).cast("long"))
      .withColumn("stop_ratio_u", expr("cast(round(1000000.0 * n_stop / n_tokens) as bigint)"))
      .withColumn("avg_wlen_u", expr(
        "cast(round(1000000.0 * aggregate(toks, 0L, (a, w) -> a + length(w)) / n_tokens) as bigint)"))
      .select("doc_id", "n_chars", "n_tokens", "n_punct", "n_stop",
        "stop_ratio_u", "avg_wlen_u")

  val q22Sql: String =
    s"""SELECT doc_id, n_chars,
       |  CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
       |  CAST(len(regexp_extract_all(text, '$PunctRe')) AS BIGINT) AS n_punct,
       |  CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
       |    w -> w IN ${sqlList(StopEn)})) AS BIGINT) AS n_stop,
       |  CAST(round(1000000.0 * len(list_filter(string_split_regex(lower(text), '\\s+'),
       |    w -> w IN ${sqlList(StopEn)})) / len(string_split_regex(text, '\\s+'))) AS BIGINT) AS stop_ratio_u,
       |  CAST(round(1000000.0 * list_sum(list_transform(string_split_regex(text, '\\s+'),
       |    w -> length(w))) / len(string_split_regex(text, '\\s+'))) AS BIGINT) AS avg_wlen_u
       |FROM documents""".stripMargin

  /** Q23 — token counting: whitespace tokens + BPE-ish regex pieces. */
  def q23TokenCount(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "documents"))
      .select(col("doc_id"),
        size(split(col("text"), TokenSplitRe)).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit(BpeRe)).cast("long").as("bpe_tokens"))

  val q23Sql: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(text, '$BpeRe')) AS BIGINT) AS bpe_tokens
       |FROM documents""".stripMargin

  /** Q24 — document fingerprint: minimum md5 over 5-token shingles
    * (winnowing-style content fingerprint).
    */
  def q24Fingerprint(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "documents"))
      .withColumn("sh", sparkShingles(5))
      .select(col("doc_id"),
        array_min(transform(col("sh"), x => md5(x))).as("fp"))

  val q24Sql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
      |shingles AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, greatest(len(t) - 4, 1)),
      |    i -> t[i] || ' ' || coalesce(t[i+1], '') || ' ' || coalesce(t[i+2], '')
      |       || ' ' || coalesce(t[i+3], '') || ' ' || coalesce(t[i+4], '')))) AS sh
      |  FROM toks)
      |SELECT doc_id, min(md5(sh)) AS fp FROM shingles GROUP BY doc_id""".stripMargin

  /** Q25 — multimodal header decode: build REAL PNG / GIF / JPEG
    * container headers byte-by-byte from per-doc dimensions, parse them
    * back with the native `graft_media_header` codegen Expression
    * ([[graft.ops.Multimodal.headerDecode]] — pure-JVM container parse,
    * no codecs; binary payload never leaves the scan task). The oracle
    * computes the expected (format, width, height, bit_depth, n_bytes)
    * ARITHMETICALLY from the same per-doc dimensions, so a match proves
    * the byte-level construction and the parser agree on the real
    * container layouts (PNG big-endian IHDR, GIF little-endian screen
    * descriptor, JPEG SOF0 segment walk).
    */
  def q25MediaHeader(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
      .withColumn("w", (pmod(col("n_chars"), lit(500)) + 1).cast("int"))
      .withColumn("h", (pmod(col("n_chars") * 7, lit(500)) + 1).cast("int"))
    val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
      lpad(hex(col("w")), 8, "0"), lpad(hex(col("h")), 8, "0"),
      lit("080600000000000000"))
    val gifHex = concat(lit("474946383961"),
      lpad(hex(pmod(col("w"), lit(256))), 2, "0"), lpad(hex(expr("w div 256")), 2, "0"),
      lpad(hex(pmod(col("h"), lit(256))), 2, "0"), lpad(hex(expr("h div 256")), 2, "0"),
      lit("870000"))
    val jpegHex = concat(lit("FFD8FFC0001108"),
      lpad(hex(col("h")), 4, "0"), lpad(hex(col("w")), 4, "0"),
      lit("03012200021101031101"))
    d.withColumn("payload", unhex(
        when(pmod(col("n_chars"), lit(3)) === 0, pngHex)
          .when(pmod(col("n_chars"), lit(3)) === 1, gifHex)
          .otherwise(jpegHex)))
      .withColumn("hdr", graft.expr.MediaHeaderOf(col("payload")))
      .select(col("doc_id"), col("hdr.format").as("format"),
        col("hdr.width").cast("long").as("width"),
        col("hdr.height").cast("long").as("height"),
        col("hdr.bit_depth").cast("long").as("bit_depth"),
        length(col("payload")).cast("long").as("n_bytes"))
  }

  val q25Sql: String =
    """SELECT doc_id,
      |  CASE n_chars % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END AS format,
      |  CAST(n_chars % 500 + 1 AS BIGINT) AS width,
      |  CAST((n_chars * 7) % 500 + 1 AS BIGINT) AS height,
      |  CAST(8 AS BIGINT) AS bit_depth,
      |  CAST(CASE n_chars % 3 WHEN 0 THEN 33 WHEN 1 THEN 13 ELSE 21 END AS BIGINT) AS n_bytes
      |FROM documents""".stripMargin

  /** Q26 — make_id via the custom Catalyst expression PyTitleCase
    * (SURVEY §7.3).
    */
  def q26MakeId(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "part"))
      .select(col("p_partkey"), col("p_name"),
        graft.expr.Exprs.makeId(col("p_name")).as("make_id"))

  /** Q26 oracle: Python title() has no DuckDB analog, so the expected
    * (p_name -> make_id) mapping is inlined as a VALUES dict computed by
    * the scalar [[graft.text.MakeId]] (pinned against the reference by
    * OracleSpec); DuckDB then exercises the join + compares the
    * distributed PyTitleCase expression path end-to-end — the q13
    * pattern. Dir-dependent (distinct p_names of the verified sf), hence
    * a builder, not a constant.
    */
  def q26Sql(s: SparkSession, dir: String): String = {
    def esc(x: String) = x.replace("'", "''")
    val names = s.read.parquet(p(dir, "part"))
      .select("p_name").distinct().collect().map(_.getString(0)).sorted
    val values = names
      .map(n => s"('${esc(n)}','${esc(graft.text.MakeId(n))}')")
      .mkString(",\n    ")
    s"""WITH dict(p_name, make_id) AS (VALUES
       |    $values)
       |SELECT p.p_partkey, p.p_name, d.make_id
       |FROM part p JOIN dict d ON p.p_name = d.p_name""".stripMargin
  }

  /** Q27 — k-means-trained IVF: train the codebook with Lloyd's
    * iterations (deterministic, [[graft.ops.Similarity.kmeansCodebook]]),
    * route every vector to its argmax-cosine cell, exact top-k inside
    * the query's cell. The oracle receives the trained codebook as an
    * inlined VALUES table and performs the ASSIGNMENT + IN-CELL TOP-K
    * independently in DuckDB — the distributed routing/scoring math is
    * what's being checked (the q19/q20 float->double dot-product parity
    * recipe).
    */
  def q27IvfKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(p(dir, "embeddings"))
    val cb = graft.ops.Similarity.kmeansCodebook(e, "vec_id", "embedding", k = 4, iters = 2)
    graft.ops.Similarity.ivfTopKWith(e, "vec_id", "embedding", cb, queryId = 0, k = 10)
      .select(col("vec_id"), expr("cast(round(1000000.0 * cos) as bigint)").as("cos_u"))
  }

  def q27Sql(s: SparkSession, dir: String): String = {
    val cb = graft.ops.Similarity.kmeansCodebook(
      s.read.parquet(p(dir, "embeddings")), "vec_id", "embedding", k = 4, iters = 2)
    val rows = cb.orderBy("cell_id").collect().map { r =>
      val vec = r.getSeq[Float](1).map(_.toString).mkString("[", ", ", "]")
      s"(${r.getLong(0)}, CAST($vec AS FLOAT[]))"
    }.mkString(",\n    ")
    s"""WITH cb(cell_id, cv) AS (VALUES
       |    $rows),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cbd AS (SELECT cell_id, CAST(cv AS DOUBLE[]) AS cvd FROM cb),
       |scored AS (
       |  SELECT e.vec_id, cbd.cell_id,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(v, cvd) /
       |        (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cvd, cvd))) DESC,
       |      cell_id) AS rk
       |  FROM e, cbd),
       |assign AS (SELECT vec_id, cell_id FROM scored WHERE rk = 1),
       |qcell AS (SELECT cell_id FROM assign WHERE vec_id = 0),
       |qv AS (SELECT v AS qvec FROM e WHERE vec_id = 0),
       |cand AS (
       |  SELECT e.vec_id, e.v FROM e
       |  JOIN assign USING (vec_id) JOIN qcell USING (cell_id)
       |  WHERE e.vec_id <> 0)
       |SELECT vec_id,
       |  CAST(round(1000000.0 * list_dot_product(v, qvec) /
       |    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qvec, qvec)))) AS BIGINT) AS cos_u
       |FROM cand, qv
       |ORDER BY list_dot_product(v, qvec) /
       |  (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qvec, qvec))) DESC, vec_id
       |LIMIT 10""".stripMargin
  }

  /** Q28 — CUBE over (returnflag, linestatus) with grouping_id: the
    * multi-dimensional rollup shape of a metrics/reporting layer (A8
    * extension; Spark's grouping_id bitmask == DuckDB's GROUPING()).
    */
  def q28CubeMetrics(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "lineitem"))
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("long").as("gid"),
        expr("cast(round(sum(l_quantity) * 100) as bigint)").as("sum_qty_c"),
        count(lit(1)).as("n"))

  val q28Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_c,
      |  count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** Q29 — event-time tumbling-window aggregation (the batch form of
    * the streaming watermarked windows, graft.streaming
    * .StreamingWindows): Spark `window()` == DuckDB `time_bucket`.
    * Window bounds emitted as epoch seconds (BIGINT) for the
    * type-stable hash.
    */
  def q29EventWindows(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "events"))
      .withColumn("tts", col("ts").cast("timestamp"))
      .groupBy(window(col("tts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("w_start_s"),
        unix_timestamp(col("window.end")).as("w_end_s"),
        col("event_type"), col("n"))

  val q29Sql: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL '1 minute', ts)) AS BIGINT) AS w_start_s,
      |  CAST(epoch(time_bucket(INTERVAL '1 minute', ts)) + 60 AS BIGINT) AS w_end_s,
      |  event_type, count(*) AS n
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** Q30 — exact interpolated percentiles per group (Spark `percentile`
    * == DuckDB `quantile_cont`), micro-scaled to BIGINT.
    */
  def q30Percentiles(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "lineitem"))
      .groupBy("l_returnflag")
      .agg(
        expr("cast(round(1000000.0 * percentile(l_quantity, 0.5)) as bigint)").as("p50_u"),
        expr("cast(round(1000000.0 * percentile(l_quantity, 0.9)) as bigint)").as("p90_u"),
        expr("cast(round(1000000.0 * percentile(l_extendedprice, 0.99)) as bigint)").as("price_p99_u"))

  val q30Sql: String =
    """SELECT l_returnflag,
      |  CAST(round(1000000.0 * quantile_cont(l_quantity, 0.5)) AS BIGINT) AS p50_u,
      |  CAST(round(1000000.0 * quantile_cont(l_quantity, 0.9)) AS BIGINT) AS p90_u,
      |  CAST(round(1000000.0 * quantile_cont(l_extendedprice, 0.99)) AS BIGINT) AS price_p99_u
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Q31 — pivot: per-user event counts spread across event-type
    * columns (reporting shape). Pivot values pinned (deterministic
    * schema; the oracle mirrors with conditional aggregation).
    */
  def q31Pivot(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(p(dir, "events"))
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "error"))
      .agg(count(lit(1)))
      .select(col("user_id"),
        coalesce(col("click"), lit(0L)).as("n_click"),
        coalesce(col("view"), lit(0L)).as("n_view"),
        coalesce(col("purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("error"), lit(0L)).as("n_error"))

  val q31Sql: String =
    """SELECT user_id,
      |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
      |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
      |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
      |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error
      |FROM events GROUP BY 1""".stripMargin

  /** Q32 — set operations: INTERSECT / EXCEPT (distinct semantics) over
    * customer keys from two derivations (SURVEY §2.7).
    */
  def q32SetOps(s: SparkSession, dir: String): DataFrame = {
    val withOrders = s.read.parquet(p(dir, "orders"))
      .select(col("o_custkey").as("custkey"))
    val bigSpenders = s.read.parquet(p(dir, "orders"))
      .filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("custkey"))
    val both = withOrders.intersect(bigSpenders)
      .withColumn("tag", lit("both"))
    val smallOnly = withOrders.except(bigSpenders)
      .withColumn("tag", lit("small_only"))
    both.unionByName(smallOnly)
      .groupBy("tag").agg(count(lit(1)).as("n"), min("custkey").as("min_key"))
  }

  val q32Sql: String =
    """WITH w AS (SELECT o_custkey AS custkey FROM orders),
      |b AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000),
      |u AS (
      |  SELECT custkey, 'both' AS tag FROM (SELECT custkey FROM w INTERSECT SELECT custkey FROM b)
      |  UNION ALL
      |  SELECT custkey, 'small_only' AS tag FROM (SELECT custkey FROM w EXCEPT SELECT custkey FROM b))
      |SELECT tag, count(*) AS n, min(custkey) AS min_key FROM u GROUP BY 1""".stripMargin

  /** Q33 — as-of join ([[graft.ops.AsOfJoin]]): for every purchase, the
    * latest click at-or-before it by the same user. The oracle mirrors
    * the union + carry-forward window exactly (DuckDB's ASOF JOIN is
    * nondeterministic on timestamp ties; the window form is total).
    */
  def q33AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(p(dir, "events"))
      .withColumn("ts_us", expr("unix_micros(cast(ts as timestamp_ltz))"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    graft.ops.AsOfJoin.asOf(purchases, clicks, "user_id", "ts_us", "event_id")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        // no-prior-click -> -1 sentinel (null-free output keeps the
        // driver's hash compare rendering-independent)
        coalesce(col("asof_ts"), lit(-1L)).as("click_ts_us"),
        coalesce(col("asof_tie"), lit(-1L)).as("click_event_id"))
  }

  val q33Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
      |  FROM events WHERE event_type IN ('purchase', 'click')
      |), carried AS (
      |  SELECT user_id, ts_us, event_id, side,
      |    last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS)
      |      OVER w AS click_ts_us,
      |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
      |      OVER w AS click_event_id
      |  FROM tagged
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
      |               ROWS UNBOUNDED PRECEDING))
      |SELECT user_id, ts_us, event_id,
      |  coalesce(click_ts_us, -1) AS click_ts_us,
      |  coalesce(click_event_id, -1) AS click_event_id
      |FROM carried WHERE side = 1""".stripMargin

  /** Q34 — near-dup clustering end-to-end: LSH candidate pairs (the q16
    * md5 recipe), connected-components label propagation
    * ([[graft.ops.Dedup.connectedComponents]]), survivor selection
    * (min-id per cluster; isolated docs survive as their own
    * component). The oracle recomputes the components INDEPENDENTLY in
    * DuckDB via a recursive transitive-closure CTE over the same pair
    * set — it shares the pair recipe (already q16-verified), not the
    * iteration scheme.
    */
  def q34DedupCluster(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
    val comps = graft.ops.Dedup.connectedComponents(q16MinhashPairs(s, dir))
      .withColumnRenamed("id", "doc_id")
    d.select(col("doc_id")).join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"),
        when(coalesce(col("component"), col("doc_id")) === col("doc_id"), 1L)
          .otherwise(0L).as("survivor"))
  }

  val q34Sql: String =
    s"""WITH RECURSIVE pairs AS ($q16Sql),
       |edges AS (SELECT id1, id2 FROM pairs
       |          UNION SELECT id2 AS id1, id1 AS id2 FROM pairs),
       |reach(id, r) AS (
       |  SELECT id1, id1 FROM edges
       |  UNION
       |  SELECT e.id1, reach.r FROM edges e JOIN reach ON e.id2 = reach.id),
       |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
       |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
       |  CAST(CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id
       |       THEN 1 ELSE 0 END AS BIGINT) AS survivor
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id""".stripMargin

  /** Q35 — embedding-cosine near-duplicate pairs within sign-projection
    * LSH buckets ([[graft.ops.Dedup.embeddingNearDups]]: bucketing
    * subtree computed once, capped in-bucket expansion, cosine inside
    * the pair lambda). The oracle re-derives buckets, the cap, the
    * pairs, and the float->double cosine independently (the q19/q20
    * dot-product parity recipe).
    */
  def q35EmbeddingNearDups(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(p(dir, "embeddings"))
    graft.ops.Dedup.embeddingNearDups(e, "vec_id", "embedding",
        nPlanes = 4, threshold = 0.1)
      .select(col("id1"), col("id2"),
        expr("cast(round(1000000.0 * cos) as bigint)").as("cos_u"))
  }

  val q35Sql: String =
    """WITH planes AS (
      |  SELECT vec_id AS plane_id, CAST(embedding AS DOUBLE[]) AS pv
      |  FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |bits AS (
      |  SELECT e.vec_id, p.plane_id,
      |    CASE WHEN list_dot_product(v, pv) > 0 THEN '1' ELSE '0' END AS bit
      |  FROM e, planes p),
      |buckets AS (
      |  SELECT vec_id, string_agg(bit, '' ORDER BY plane_id) AS bucket
      |  FROM bits GROUP BY 1),
      |capped AS (
      |  SELECT vec_id, bucket,
      |    row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
      |  FROM buckets),
      |pairs AS (
      |  SELECT a.vec_id AS id1, b.vec_id AS id2
      |  FROM capped a JOIN capped b
      |    ON a.bucket = b.bucket AND b.vec_id > a.vec_id
      |  WHERE a.rn <= 1024 AND b.rn <= 1024),
      |scored AS (
      |  SELECT id1, id2,
      |    list_dot_product(e1.v, e2.v) /
      |      (sqrt(list_dot_product(e1.v, e1.v)) * sqrt(list_dot_product(e2.v, e2.v))) AS cos
      |  FROM pairs JOIN e e1 ON e1.vec_id = pairs.id1
      |             JOIN e e2 ON e2.vec_id = pairs.id2)
      |SELECT id1, id2, CAST(round(1000000.0 * cos) AS BIGINT) AS cos_u
      |FROM scored WHERE cos >= 0.1""".stripMargin

  /** Q36 — pair-driven exact verification ([[graft.ops.Dedup
    * .verifyPairs]]): true shingle-set Jaccard for every LSH candidate
    * pair (the stage between candidate generation and clustering; q18
    * is the banded form, this is the pair-driven form). Oracle:
    * DuckDB recomputes pairs (q16 recipe) and the Jaccard from scratch.
    */
  def q36VerifyPairs(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
    // r9 (guide §5): verifyPairs references the pair set twice (the
    // referenced-id semi-join side and the pair rows themselves) — pin
    // the tiny candidate-pair table once (localCheckpoint, inside the
    // timed computation) instead of re-running the whole LSH pipeline
    // per reference. Values identical; q16 itself stays fully lazy.
    val pairs = q16MinhashPairs(s, dir).localCheckpoint()
    graft.ops.Dedup.verifyPairs(pairs, d, "doc_id", "text", 3)
      .select(col("id1"), col("id2"),
        expr("cast(round(1000000.0 * jaccard) as bigint)").as("jac_u"))
  }

  val q36Sql: String =
    s"""WITH pairs AS ($q16Sql),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(len(t) - 2, 1)),
       |    i -> t[i] || ' ' || coalesce(t[i+1], '') || ' ' || coalesce(t[i+2], ''))) AS sh
       |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents))
       |SELECT p.id1, p.id2,
       |  CAST(round(1000000.0 * len(list_intersect(a.sh, b.sh)) /
       |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) AS BIGINT) AS jac_u
       |FROM pairs p JOIN sh a ON a.doc_id = p.id1 JOIN sh b ON b.doc_id = p.id2""".stripMargin

  /** Q37 — multi-probe IVF ANN ([[graft.ops.Similarity
    * .ivfTopKMultiProbe]]): exact cosine top-k over the query's top-2
    * cells by centroid cosine (instead of its single cell — the recall
    * lift for boundary queries). Same trained-codebook-as-VALUES oracle
    * pattern as q27; DuckDB re-derives the probe-cell ranking, the cell
    * assignment, and the in-cell scoring independently.
    */
  def q37AnnMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(p(dir, "embeddings"))
    val cb = graft.ops.Similarity.kmeansCodebook(e, "vec_id", "embedding", k = 4, iters = 2)
    graft.ops.Similarity.ivfTopKMultiProbe(e, "vec_id", "embedding", cb,
        queryId = 0, k = 10, probes = 2)
      .select(col("vec_id"), expr("cast(round(1000000.0 * cos) as bigint)").as("cos_u"))
  }

  def q37Sql(s: SparkSession, dir: String): String = {
    val cb = graft.ops.Similarity.kmeansCodebook(
      s.read.parquet(p(dir, "embeddings")), "vec_id", "embedding", k = 4, iters = 2)
    val rows = cb.orderBy("cell_id").collect().map { r =>
      val vec = r.getSeq[Float](1).map(_.toString).mkString("[", ", ", "]")
      s"(${r.getLong(0)}, CAST($vec AS FLOAT[]))"
    }.mkString(",\n    ")
    s"""WITH cb(cell_id, cv) AS (VALUES
       |    $rows),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cbd AS (SELECT cell_id, CAST(cv AS DOUBLE[]) AS cvd FROM cb),
       |scored AS (
       |  SELECT e.vec_id, cbd.cell_id,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(v, cvd) /
       |        (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cvd, cvd))) DESC,
       |      cell_id) AS rk
       |  FROM e, cbd),
       |assign AS (SELECT vec_id, cell_id FROM scored WHERE rk = 1),
       |qv AS (SELECT v AS qvec FROM e WHERE vec_id = 0),
       |qcells AS (
       |  SELECT cell_id FROM (
       |    SELECT cbd.cell_id, row_number() OVER (ORDER BY
       |      list_dot_product(cvd, qvec) /
       |        (sqrt(list_dot_product(cvd, cvd)) * sqrt(list_dot_product(qvec, qvec))) DESC,
       |      cell_id) AS rk
       |    FROM cbd, qv) WHERE rk <= 2),
       |cand AS (
       |  SELECT e.vec_id, e.v FROM e
       |  JOIN assign USING (vec_id) JOIN qcells USING (cell_id)
       |  WHERE e.vec_id <> 0)
       |SELECT vec_id,
       |  CAST(round(1000000.0 * list_dot_product(v, qvec) /
       |    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qvec, qvec)))) AS BIGINT) AS cos_u
       |FROM cand, qv
       |ORDER BY list_dot_product(v, qvec) /
       |  (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qvec, qvec))) DESC, vec_id
       |LIMIT 10""".stripMargin
  }

  /** Q38 — repetition signals ([[graft.ops.TextAnalysis
    * .repetitionStats]]): duplicate-token ratio (narrow) + fraction of
    * bigram occurrences taken by the most frequent bigram (one
    * (doc, bigram) shuffle with map-side partial counts). The Gopher/
    * RefinedWeb boilerplate-detection family; integer micro-units.
    */
  def q38Repetition(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.repetitionStats(
      s.read.parquet(p(dir, "documents")), "doc_id", "text")

  val q38Sql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |base AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(toks)) AS BIGINT) AS nd
      |  FROM t),
      |bg AS (
      |  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS b
      |  FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(i)),
      |top AS (
      |  SELECT doc_id, max(c) AS top_n
      |  FROM (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1)
      |SELECT base.doc_id, n_tokens,
      |  CAST(round(1000000.0 * (n_tokens - nd) / greatest(n_tokens, 1)) AS BIGINT)
      |    AS dup_token_ratio_u,
      |  CAST(coalesce(top_n, 0) AS BIGINT) AS top_bigram_n,
      |  CAST(round(1000000.0 * coalesce(top_n, 0) / greatest(n_tokens - 1, 1)) AS BIGINT)
      |    AS top_bigram_frac_u
      |FROM base LEFT JOIN top USING (doc_id)""".stripMargin

  /** Q39 — the Gopher quality-filter rule set ([[graft.ops.TextAnalysis
    * .gopherFlags]]; Rae et al. 2021 §A1.1): word count, mean word
    * length, symbol ratio, stopword indicator — every comparison in
    * integer cross-multiplied form, so flags are bit-reproducible.
    * minWords lowered to 5 at test scale so both branches populate.
    */
  def q39GopherFlags(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.gopherFlags(
      s.read.parquet(p(dir, "documents")), "doc_id", "text", minWords = 5)

  val q39Sql: String = {
    val stops = graft.ops.TextAnalysis.GopherStops.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS toks,
       |         CAST(len(regexp_extract_all(text, '$PunctRe')) AS BIGINT) AS npunct
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(toks, w -> length(w))) AS BIGINT) AS sumlen,
       |    npunct,
       |    CAST(len(list_intersect(list_distinct(list_transform(toks, w -> lower(w))),
       |      $stops)) AS BIGINT) AS nstops
       |  FROM t)
       |SELECT doc_id, n_tokens,
       |  CAST(CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1 ELSE 0 END AS BIGINT)
       |    AS flag_word_count,
       |  CAST(CASE WHEN sumlen >= 3 * n_tokens AND sumlen <= 10 * n_tokens
       |       THEN 1 ELSE 0 END AS BIGINT) AS flag_mean_word_len,
       |  CAST(CASE WHEN 10 * npunct < n_tokens THEN 1 ELSE 0 END AS BIGINT)
       |    AS flag_symbol_ratio,
       |  CAST(CASE WHEN nstops >= 2 THEN 1 ELSE 0 END AS BIGINT) AS flag_stopwords,
       |  CAST(CASE WHEN n_tokens BETWEEN 5 AND 100000
       |         AND sumlen >= 3 * n_tokens AND sumlen <= 10 * n_tokens
       |         AND 10 * npunct < n_tokens AND nstops >= 2
       |       THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM f""".stripMargin
  }

  /** Q40 — PII scrubbing ([[graft.ops.TextAnalysis.piiScrub]]): email /
    * URL counts + md5 of the redacted text. The corpus has no organic
    * PII, so deterministic emails/URLs are first synthesized into the
    * text from doc_id arithmetic (the q25 pattern) — both engines build
    * the same contaminated text independently, then the detection
    * counts and the redacted hash must agree exactly (proves the Java
    * and RE2 regex semantics line up on these patterns, including
    * replace-all).
    */
  def q40PiiScrub(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
      .withColumn("t2", concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" contact"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit(" see https://ex.org/p/"), col("doc_id").cast("string")))
          .otherwise(lit(""))))
    graft.ops.TextAnalysis.piiScrub(d, "doc_id", "t2")
  }

  val q40Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN doc_id % 3 = 0
      |         THEN ' contact' || CAST(doc_id AS VARCHAR) || '@example.com'
      |         ELSE '' END ||
      |    CASE WHEN doc_id % 2 = 0
      |         THEN ' see https://ex.org/p/' || CAST(doc_id AS VARCHAR)
      |         ELSE '' END AS t2
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(t2, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
      |  md5(regexp_replace(
      |    regexp_replace(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    'https?://[^\s]+', '<URL>', 'g')) AS redacted_md5
      |FROM t""".stripMargin

  /** Q41 — deterministic hash sampling ([[graft.ops.TextAnalysis
    * .sampleDeterministic]]): the resume-stable subsampling a 10^12-doc
    * pipeline needs (pure function of the id — identical sample across
    * retries, cluster sizes, engines; never `rand()`). The oracle
    * recomputes the md5-prefix filter verbatim; the xxhash64 fast path
    * is pinned to the same statistics by OpsSpec.
    */
  def q41Sample(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.sampleDeterministic(
        s.read.parquet(p(dir, "documents")), "doc_id", 0.2)
      .select(col("doc_id"), col("n_chars"))

  val q41Sql: String = {
    val thr = graft.ops.TextAnalysis.hexThreshold(0.2)
    s"""SELECT doc_id, n_chars FROM documents
       |WHERE md5('sample:' || CAST(doc_id AS VARCHAR)) < '$thr'""".stripMargin
  }

  /** Q42 — benchmark decontamination ([[graft.ops.TextAnalysis
    * .decontaminate]]): flag corpus docs sharing any lowered token
    * 8-gram with a synthetic "benchmark" (the first 40 tokens of every
    * 97th document — both engines derive it from the corpus itself, so
    * no external data). Oracle re-derives the n-gram overlap with the
    * same lower/split/filter parity primitives as q24/q36.
    */
  def q42Decontam(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(p(dir, "documents"))
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(expr(
        "concat_ws(' ', slice(filter(split(lower(text), '\\\\s+'), x -> x <> ''), 1, 40))")
        .as("text"))
    graft.ops.TextAnalysis.decontaminate(docs, bench, "doc_id", "text", n = 8)
  }

  val q42Sql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
      |  FROM documents),
      |bt AS (SELECT ts[1:40] AS ts FROM tok WHERE doc_id % 97 = 0),
      |bng AS (
      |  SELECT DISTINCT array_to_string(ts[i:i+7], ' ') AS ng
      |  FROM bt, LATERAL unnest(generate_series(1, greatest(len(ts) - 7, 0))) AS u(i)),
      |cng AS (
      |  SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS ng
      |  FROM tok, LATERAL unnest(generate_series(1, greatest(len(ts) - 7, 0))) AS u(i))
      |SELECT c.doc_id, CAST(count(DISTINCT c.ng) AS BIGINT) AS n_hits
      |FROM cng c JOIN bng b ON c.ng = b.ng
      |GROUP BY 1""".stripMargin

  /** Q43 — sequence packing ([[graft.ops.TextAnalysis.packSequences]]):
    * 4096-token training shards over the doc_id-ordered corpus stream.
    * partSpan=64 forces many range parts at sf0.01+ so the two-pass
    * prefix sum genuinely exercises the per-part + totals recombination;
    * the oracle is the naive global window the two-pass must equal.
    */
  def q43PackSequences(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
      .withColumn("n_tok", size(split(col("text"), "\\s+")).cast("long"))
    graft.ops.TextAnalysis.packSequences(d, "doc_id", "n_tok",
      budget = 4096L, partSpan = 64L)
  }

  val q43Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS start_off
      |  FROM t)
      |SELECT doc_id, n_tokens, start_off,
      |  CAST(start_off // 4096 AS BIGINT) AS shard_first,
      |  CAST((start_off + greatest(n_tokens, 1) - 1) // 4096 AS BIGINT) AS shard_last
      |FROM o""".stripMargin

  /** Q44 — duplicated n-gram mining ([[graft.ops.TextAnalysis
    * .dupNgrams]]): every lowered token 8-gram appearing in >= 2
    * distinct documents, with doc/total counts — the boilerplate
    * blocklist feed. One corpus shuffle with map-side partials; the
    * hashed fast path is pinned equal by OpsSpec.
    */
  def q44DupNgrams(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.dupNgrams(
      s.read.parquet(p(dir, "documents")), "doc_id", "text", n = 8, minDocs = 2)

  val q44Sql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
      |  FROM documents),
      |cng AS (
      |  SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS ng
      |  FROM tok, LATERAL unnest(generate_series(1, greatest(len(ts) - 7, 0))) AS u(i))
      |SELECT ng, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(count(*) AS BIGINT) AS n_total
      |FROM cng GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin

  /** Q45 — stratified deterministic sampling ([[graft.ops.TextAnalysis
    * .sampleStratified]]): the data-mixing primitive — per-source keep
    * fractions (up-weight src1, down-weight src2, default 10%), decided
    * by a pure hash of (stratum, id) so the mixture is identical across
    * engines/retries. The oracle replays the same CASE'd thresholds.
    */
  val Q45Fractions: Map[String, Double] =
    Map("src1" -> 0.8, "src2" -> 0.05, "src3" -> 0.3)

  def q45SampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.sampleStratified(
        s.read.parquet(p(dir, "documents")), "doc_id", "source",
        Q45Fractions, defaultFraction = 0.1)
      .select(col("doc_id"), col("source"))

  val q45Sql: String = {
    import graft.ops.TextAnalysis.hexThreshold
    val cases = Q45Fractions.toSeq.sortBy(_._1).map { case (s, f) =>
      s"WHEN source = '$s' THEN '${hexThreshold(f)}'"
    }.mkString("\n      |    ")
    s"""SELECT doc_id, source FROM documents
       |WHERE md5('sample:' || source || ':' || CAST(doc_id AS VARCHAR)) <
       |  CASE $cases
       |    ELSE '${hexThreshold(0.1)}' END""".stripMargin
  }

  /** Q46 — Unicode NFC normalization ([[graft.expr.UnicodeNormalize]],
    * the ninth codegen Expression): deterministic composed/decomposed/
    * compatibility suffixes are appended from doc_id arithmetic (the
    * q40 pattern), then the normalized md5 + codepoint lengths must
    * match DuckDB's utf8proc-backed `nfc_normalize` exactly — pinning
    * JVM `java.text.Normalizer` NFC against an independent
    * implementation. Narrow, zero shuffle.
    */
  def q46NfcNormalize(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
      .withColumn("t2", concat(col("text"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit(" xe\u0301"))  // e + U+0301 combining acute
          .when(pmod(col("doc_id"), lit(4)) === 1, lit(" x\u00e9")) // precomposed e-acute
          .when(pmod(col("doc_id"), lit(4)) === 2, lit(" \u212b"))  // angstrom sign -> U+00C5
          .otherwise(lit(" \u1100\u1161"))))     // conjoining jamo -> U+AC00
    val norm = graft.expr.UnicodeNormalize(col("t2"), "NFC")
    d.select(col("doc_id"),
      length(col("t2")).cast("long").as("n_raw"),
      length(norm).cast("long").as("n_norm"),
      md5(norm).as("norm_md5"))
  }

  val q46Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text ||
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN ' x' || chr(101) || chr(769)
      |      WHEN 1 THEN ' x' || chr(233)
      |      WHEN 2 THEN ' ' || chr(8491)
      |      ELSE ' ' || chr(4352) || chr(4449) END AS t2
      |  FROM documents)
      |SELECT doc_id, CAST(length(t2) AS BIGINT) AS n_raw,
      |  CAST(length(nfc_normalize(t2)) AS BIGINT) AS n_norm,
      |  md5(nfc_normalize(t2)) AS norm_md5
      |FROM t""".stripMargin

  /** Q47 — global line-level dedup ([[graft.ops.Dedup
    * .dedupLinesGlobal]], the CCNet boilerplate-removal pass): docs are
    * synthesized into multi-line pages (a shared cookie-banner first
    * line + sentence-split body), then duplicate lines are dropped
    * corpus-wide keeping the earliest (doc_id, idx) occurrence. The
    * oracle replays the identical window rule; fully-deduplicated docs
    * hash the empty string on both engines.
    */
  def q47DedupLines(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(p(dir, "documents"))
      .withColumn("t2", concat(lit("COOKIE BANNER ACCEPT ALL\n"),
        regexp_replace(col("text"), "\\. ", "\n")))
    graft.ops.Dedup.dedupLinesGlobal(d, "doc_id", "t2", minLen = 5)
  }

  val q47Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         'COOKIE BANNER ACCEPT ALL' || chr(10) || replace(text, '. ', chr(10)) AS t2
      |  FROM documents),
      |tok AS (SELECT doc_id, string_split(t2, chr(10)) AS ls FROM t),
      |l AS (
      |  SELECT doc_id, i - 1 AS idx, ls[i] AS ln
      |  FROM tok, LATERAL unnest(generate_series(1, len(ls))) AS u(i)),
      |k AS (
      |  SELECT doc_id, idx, ln,
      |    row_number() OVER (
      |      PARTITION BY (length(ln) >= 5),
      |        CASE WHEN length(ln) >= 5 THEN ln ELSE doc_id || ':' || idx END
      |      ORDER BY doc_id, idx) AS rn
      |  FROM l)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
      |  md5(coalesce(string_agg(CASE WHEN rn = 1 THEN ln END, chr(10) ORDER BY idx), ''))
      |    AS kept_md5
      |FROM k GROUP BY 1""".stripMargin

  /** Q48 — exact-substring excision ([[graft.ops.Dedup
    * .exciseDupSpans]], Lee et al. stage 2): every position covered by
    * a repeated raw-token 8-gram is removed except at the span's first
    * global (doc_id, pos) occurrence. The oracle replays the identical
    * decision with a window (row_number == 1 ⇔ the min-aggregation
    * first) and rebuilds the survivor text position by position.
    */
  def q48ExciseSpans(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.exciseDupSpans(
      s.read.parquet(p(dir, "documents")), "doc_id", "text", n = 8)

  val q48Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
      |occ AS (
      |  SELECT doc_id, i - 1 AS i, array_to_string(ts[i:i+7], ' ') AS ng
      |  FROM toks, LATERAL unnest(generate_series(1, greatest(len(ts) - 7, 0))) u(i)),
      |occ2 AS (
      |  SELECT *, row_number() OVER (PARTITION BY ng ORDER BY doc_id, i) AS rn
      |  FROM occ),
      |exc AS (
      |  SELECT DISTINCT doc_id, v.p
      |  FROM occ2, LATERAL unnest(generate_series(i, i + 7)) v(p)
      |  WHERE rn > 1),
      |agg AS (SELECT doc_id, list(p) AS ps FROM exc GROUP BY 1),
      |cells AS (
      |  SELECT t.doc_id, len(t.ts) AS n_tokens, coalesce(len(a.ps), 0) AS n_excised,
      |    w.j, t.ts[w.j] AS tok,
      |    CASE WHEN a.ps IS NULL OR NOT list_contains(a.ps, w.j - 1)
      |         THEN 1 ELSE 0 END AS k
      |  FROM toks t LEFT JOIN agg a USING (doc_id),
      |       LATERAL unnest(generate_series(1, len(t.ts))) w(j))
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_excised AS BIGINT) AS n_excised,
      |  md5(coalesce(string_agg(CASE WHEN k = 1 THEN tok END, ' ' ORDER BY j), ''))
      |    AS kept_md5
      |FROM cells GROUP BY doc_id, n_tokens, n_excised""".stripMargin

  /** Q49 — VARIABLE-LENGTH exact-substring excision ([[graft.ops.Dedup
    * .exciseDupSpansVar]], the true Lee et al. stage-2 semantics): a
    * 15-token boilerplate tail is appended to every document, so each
    * non-first occurrence is excised as ONE maximal span (length >= 15,
    * not an 8-gram at a time) with exact boundaries; per-doc span
    * count, excised total, and longest-repeat length are reported. The
    * oracle replays the identical math: dup 8-gram coverage, then
    * consecutive covered positions merged into islands (p - row_number)
    * — the same union-of-repeats a suffix array would excise.
    */
  val q49Boiler = "all rights reserved contact the site administrator " +
    "for removal requests and further detailed information today"

  def q49ExciseVar(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.exciseDupSpansVar(
      s.read.parquet(p(dir, "documents"))
        .withColumn("t2", concat(col("text"), lit(" " + q49Boiler))),
      "doc_id", "t2", minLen = 8)
      .drop("spans")

  val q49Sql: String =
    s"""WITH t AS (
      |  SELECT doc_id, text || ' $q49Boiler' AS t2 FROM documents),
      |toks AS (
      |  SELECT doc_id, string_split_regex(t2, '\\s+') AS ts FROM t),
      |occ AS (
      |  SELECT doc_id, i - 1 AS i, array_to_string(ts[i:i+7], ' ') AS ng
      |  FROM toks, LATERAL unnest(generate_series(1, greatest(len(ts) - 7, 0))) u(i)),
      |occ2 AS (
      |  SELECT *, row_number() OVER (PARTITION BY ng ORDER BY doc_id, i) AS rn
      |  FROM occ),
      |exc AS (
      |  SELECT DISTINCT doc_id, v.p
      |  FROM occ2, LATERAL unnest(generate_series(i, i + 7)) v(p)
      |  WHERE rn > 1),
      |isl AS (
      |  SELECT doc_id, p,
      |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
      |  FROM exc),
      |sp AS (
      |  SELECT doc_id, grp, min(p) AS st, max(p) + 1 AS en
      |  FROM isl GROUP BY 1, 2),
      |spanagg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |    CAST(sum(en - st) AS BIGINT) AS n_excised,
      |    CAST(max(en - st) AS BIGINT) AS max_span_len
      |  FROM sp GROUP BY 1),
      |agg AS (SELECT doc_id, list(p) AS ps FROM exc GROUP BY 1),
      |cells AS (
      |  SELECT t.doc_id, len(t.ts) AS n_tokens, w.j, t.ts[w.j] AS tok,
      |    CASE WHEN a.ps IS NULL OR NOT list_contains(a.ps, w.j - 1)
      |         THEN 1 ELSE 0 END AS k
      |  FROM toks t LEFT JOIN agg a USING (doc_id),
      |       LATERAL unnest(generate_series(1, len(t.ts))) w(j)),
      |km AS (
      |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |    md5(coalesce(string_agg(CASE WHEN k = 1 THEN tok END, ' ' ORDER BY j), ''))
      |      AS kept_md5
      |  FROM cells GROUP BY doc_id, n_tokens)
      |SELECT km.doc_id, km.n_tokens,
      |  coalesce(s.n_spans, 0) AS n_spans,
      |  coalesce(s.n_excised, 0) AS n_excised,
      |  coalesce(s.max_span_len, 0) AS max_span_len,
      |  km.kept_md5
      |FROM km LEFT JOIN spanagg s USING (doc_id)""".stripMargin

  /** Q50 — REAL image pixel decode end-to-end ([[graft.ops.Multimodal
    * .decodeImage]], r5): each document gets a deterministic 24x16 RGB
    * image (pixel = closed-form function of doc_id, x, y), the image is
    * ENCODED to PNG and DECODED BACK via the JDK's ImageIO inside the
    * distributed path, and integer channel sums are emitted. The DuckDB
    * oracle never sees an image: it replays the pixel formula
    * arithmetically — so a hash match proves the PNG encode/decode
    * round-trip is pixel-exact at every row. All math integral (no
    * float drift); payloads never shuffle (narrow mapPartitions).
    */
  def q50ImageStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val docs = s.read.parquet(p(dir, "documents")).select("doc_id")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("w", LongType, nullable = false),
      StructField("h", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    docs.mapPartitions { it =>
      // r9 per-task tuning (guide §1.2 step 2; the encode/decode round
      // trip itself is the operator and stays): no ImageIO temp-file
      // spooling (memory-cached streams, byte-identical output), pixels
      // written straight into the INT_RGB raster (== setRGB for this
      // type), one bulk getRGB read-back (same ARGB values as the
      // per-pixel calls), and a reused output buffer per task.
      javax.imageio.ImageIO.setUseCache(false)
      val o = new java.io.ByteArrayOutputStream()
      it.map { row =>
        val id = row.getLong(0)
        val k = (id % 1000).toInt
        val img = new java.awt.image.BufferedImage(24, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val px = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferInt].getData
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 24) {
            val r = (7 * k + 3 * x + 5 * y) % 256
            val g = (11 * k + 5 * x + 7 * y) % 256
            val b = (13 * k + 7 * x + 11 * y) % 256
            px(y * 24 + x) = (r << 16) | (g << 8) | b
            x += 1
          }
          y += 1
        }
        o.reset()
        javax.imageio.ImageIO.write(img, "png", o)
        val back = graft.ops.Multimodal.decodeImage(o.toByteArray).get
        val w = back.getWidth; val h = back.getHeight
        val rgbs = back.getRGB(0, 0, w, h, null, 0, w)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < rgbs.length) {
          val rgb = rgbs(i)
          sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
          i += 1
        }
        Row(id, w.toLong, h.toLong, sr, sg, sb)
      }
    }
  }

  val q50Sql: String =
    """WITH px AS (
      |  SELECT doc_id, u.x, v.y FROM documents,
      |    LATERAL unnest(generate_series(0, 23)) u(x),
      |    LATERAL unnest(generate_series(0, 15)) v(y))
      |SELECT doc_id, CAST(24 AS BIGINT) AS w, CAST(16 AS BIGINT) AS h,
      |  CAST(sum((7 * (doc_id % 1000) + 3 * x + 5 * y) % 256) AS BIGINT) AS sum_r,
      |  CAST(sum((11 * (doc_id % 1000) + 5 * x + 7 * y) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((13 * (doc_id % 1000) + 7 * x + 11 * y) % 256) AS BIGINT) AS sum_b
      |FROM px GROUP BY 1""".stripMargin

  // =============================================================== registry

  type Q = (SparkSession, String) => DataFrame

  lazy val registry: Vector[(String, Q, Option[String])] = Vector(
    ("q01_pricing_summary", q01PricingSummary _, Some(q01Sql)),
    ("q02_filter_project", q02FilterProject _, Some(q02Sql)),
    ("q03_join_revenue", q03JoinRevenue _, Some(q03Sql)),
    ("q04_semi_join", q04SemiJoin _, Some(q04Sql)),
    ("q05_anti_join", q05AntiJoin _, Some(q05Sql)),
    ("q06_topk_per_group", q06TopkPerGroup _, Some(q06Sql)),
    ("q07_runlength_segments", q07RunlengthSegments _, Some(q07Sql)),
    ("q08_sessionize", q08Sessionize _, Some(q08Sql)),
    ("q09_json_extract", q09JsonExtract _, Some(q09Sql)),
    ("q10_sep_vote", q10SepVote _, Some(q10Sql)),
    ("q11_typeof", q11Typeof _, Some(q11Sql)),
    ("q12_unit_normalize", q12UnitNormalize _, Some(q12Sql)),
    ("q13_unit_link", q13UnitLink _, q13SqlOpt),
    ("q14_dedup_exact", q14DedupExact _, Some(q14Sql)),
    ("q15_minhash_lsh", q15MinhashLsh _, Some(q15Sql)),
    ("q16_minhash_pairs", q16MinhashPairs _, Some(q16Sql)),
    ("q17_simhash", q17Simhash _, Some(q17Sql)),
    ("q18_ngram_jaccard", q18NgramJaccard _, Some(q18Sql)),
    ("q19_cosine_topk", q19CosineTopk _, Some(q19Sql)),
    ("q20_ann_buckets", q20AnnBuckets _, Some(q20Sql)),
    ("q21_langid", q21Langid _, Some(q21Sql)),
    ("q22_quality", q22Quality _, Some(q22Sql)),
    ("q23_token_count", q23TokenCount _, Some(q23Sql)),
    ("q24_fingerprint", q24Fingerprint _, Some(q24Sql)),
    ("q25_media_header", q25MediaHeader _, Some(q25Sql)),
    ("q26_make_id", q26MakeId _, None),
    ("q27_ivf_kmeans", q27IvfKmeans _, None),
    ("q28_cube_metrics", q28CubeMetrics _, Some(q28Sql)),
    ("q29_event_windows", q29EventWindows _, Some(q29Sql)),
    ("q30_percentiles", q30Percentiles _, Some(q30Sql)),
    ("q31_pivot", q31Pivot _, Some(q31Sql)),
    ("q32_setops", q32SetOps _, Some(q32Sql)),
    ("q33_asof_join", q33AsofJoin _, Some(q33Sql)),
    ("q34_dedup_cluster", q34DedupCluster _, Some(q34Sql)),
    ("q35_embedding_neardups", q35EmbeddingNearDups _, Some(q35Sql)),
    ("q36_verify_pairs", q36VerifyPairs _, Some(q36Sql)),
    ("q37_ann_multiprobe", q37AnnMultiprobe _, None),
    ("q38_repetition", q38Repetition _, Some(q38Sql)),
    ("q39_gopher_flags", q39GopherFlags _, Some(q39Sql)),
    ("q40_pii_scrub", q40PiiScrub _, Some(q40Sql)),
    ("q41_sample", q41Sample _, Some(q41Sql)),
    ("q42_decontam", q42Decontam _, Some(q42Sql)),
    ("q43_pack_sequences", q43PackSequences _, Some(q43Sql)),
    ("q44_dup_ngrams", q44DupNgrams _, Some(q44Sql)),
    ("q45_sample_stratified", q45SampleStratified _, Some(q45Sql)),
    ("q46_nfc_normalize", q46NfcNormalize _, Some(q46Sql)),
    ("q47_dedup_lines", q47DedupLines _, Some(q47Sql)),
    ("q48_excise_spans", q48ExciseSpans _, Some(q48Sql)),
    ("q49_excise_var", q49ExciseVar _, Some(q49Sql)),
    ("q50_image_stats", q50ImageStats _, Some(q50Sql)))

  /** Oracles whose SQL depends on the verified sf dir (inlined VALUES
    * dicts derived from the data). Evaluated by Verify with the live
    * session + sfDir; a build failure degrades that query to the
    * driver's rows-only check rather than taking down the dump.
    */
  val dynamicOracles: Map[String, (SparkSession, String) => String] =
    Map("q26_make_id" -> (q26Sql _), "q27_ivf_kmeans" -> (q27Sql _),
      "q37_ann_multiprobe" -> (q37Sql _))

  /** Set by Verify (and tests) so the no-arg SparkEntry.oracleSql
    * contract can build the dir-dependent oracles.
    */
  @volatile var oracleSfDir: Option[String] = None
}
