package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * All recipes are hash-deterministic (md5) so results are identical
  * across engines, cluster sizes, and retries.
  *
  * Scale notes (100 TB): exact dedup is one shuffle on a 16-byte key;
  * MinHash/LSH replaces the quadratic all-pairs comparison with a
  * band-bucket shuffle whose fan-in is bounded by bucket size; SimHash
  * is fully narrow until its final fingerprint groupBy.
  */
object Dedup {

  val TokenSplitSql = "\\\\s+"

  /** Global line-level dedup (the CCNet / RefinedWeb pass: boilerplate
    * lines — nav bars, cookie banners, footers — repeat across pages
    * and are removed corpus-wide, keeping only the EARLIEST occurrence
    * by (id, line index)). Returns per doc: total line count, dropped
    * count, and the md5 of the surviving text (lines rejoined in
    * original order).
    *
    * Scale shape: posexplode -> ONE shuffle keyed by the line hash
    * (row_number window) -> one groupBy back on the doc id. Lines
    * shorter than `minLen` do not participate: they are always kept
    * AND keyed by (id, idx) instead of content, so the corpus-wide
    * hot keys ("", "-", "ok") never form a skewed window partition.
    * The eligibility flag is part of the partition key, so salted
    * short-line keys cannot collide with real line content.
    */
  /** The line-level keep decision of [[dedupLinesGlobal]], exposed:
    * (idCol, idx, line, keep) per exploded line. Streaming line dedup
    * is pinned equal to this rule over doc-ordered batches.
    */
  def markDupLines(df: DataFrame, idCol: String, textCol: String,
                   minLen: Int = 5): DataFrame = {
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("idx", "line")))
      .withColumn("elig", length(col("line")) >= minLen)
      .withColumn("k", when(col("elig"), md5(col("line")))
        .otherwise(concat(col(idCol).cast("string"), lit(":"), col("idx"))))
    val w = Window.partitionBy("elig", "k").orderBy(col(idCol), col("idx"))
    lines.withColumn("keep", row_number().over(w) === 1)
  }

  def dedupLinesGlobal(df: DataFrame, idCol: String, textCol: String,
                       minLen: Int = 5): DataFrame = {
    markDupLines(df, idCol, textCol, minLen)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        md5(concat_ws("\n", expr(
          "transform(array_sort(collect_list(case when keep then struct(idx, line) end)), x -> x.line)")))
          .as("kept_md5"))
  }

  /** Exact-substring excision (stage 2 of Lee et al. 2022, the pass
    * that deletes REPEATED SPANS inside documents rather than whole
    * documents): every corpus position covered by a raw-token n-gram
    * whose first global occurrence — smallest (id, position) — is
    * elsewhere gets excised; the survivors are the original tokens
    * minus all duplicated spans (first occurrences stay). Returns per
    * doc: n_tokens, n_excised (distinct excised positions), and the
    * md5 of the surviving space-joined tokens.
    *
    * Scale shape: first occurrences come from a map-side-combinable
    * min((id, pos)) AGGREGATION keyed by the n-gram — deliberately NOT
    * a row_number window, whose hot boilerplate key would serialize
    * one task; the occ-to-first join is AQE-skew-splittable. Span
    * coverage explodes only DUPLICATE occurrences (O(dups·n), not
    * corpus·n), and the rebuild join is keyed by the doc id — on a
    * bucketed corpus table it is co-located (zero exchange on the
    * text side).
    */
  def exciseDupSpans(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 8): DataFrame = {
    require(n >= 1)
    val toks = df.select(col(idCol), split(col(textCol), "\\s+").as("_ts"))
    // r9 (guide §2.3/§2.4): n-grams via the native one-pass
    // [[graft.expr.NgramsOf]] kernel (replaces the interpreted
    // transform/slice/concat_ws lambda chain — the occ subtree is
    // evaluated on both sides of the ownership join, so the kernel pays
    // twice over); ownership stays the skew-safe min-agg. Only n-grams
    // with >= 2 occurrences can own a duplicate, so `first` is filtered
    // before the broadcast/join — the build side shrinks from every
    // distinct n-gram in the corpus to just the repeated tail, and the
    // dup set is provably unchanged (a 1-occurrence n-gram's only
    // occurrence IS its first: the old join always filtered it out).
    val occ = df.select(col(idCol),
      posexplode(graft.expr.NgramsOf(col(textCol), n)).as(Seq("i", "ng")))
    val first = occ.groupBy("ng")
      .agg(min(struct(col(idCol), col("i"))).as("_f"),
        count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= 2)
      .select(col("ng"), col("_f"))
    val dup = occ.join(first, "ng")
      .filter(!(col(idCol) === col(s"_f.$idCol") && col("i") === col("_f.i")))
    val excised = dup
      .select(col(idCol), explode(sequence(col("i"), col("i") + (n - 1))).as("p"))
      .groupBy(col(idCol)).agg(collect_set("p").as("_exc"))
    toks.join(excised, Seq(idCol), "left")
      .select(col(idCol),
        size(col("_ts")).cast("long").as("n_tokens"),
        coalesce(size(col("_exc")), lit(0)).cast("long").as("n_excised"),
        md5(concat_ws(" ", expr(
          """transform(
            |  filter(transform(_ts, (t, j) -> struct(j, t)),
            |         s -> _exc is null or not array_contains(_exc, s.j)),
            |  x -> x.t)""".stripMargin))).as("kept_md5"))
  }

  /** Variable-length exact-substring excision — Lee et al. 2022 stage 2
    * with TRUE repeat-span semantics: every maximal duplicated span of
    * length >= `minLen` tokens is excised wherever it is not the first
    * global occurrence, and the spans themselves (exact start/end
    * boundaries, however long the repeat) are reported per document.
    *
    * Equivalence to the fixed-n operator (the reason this needs no
    * suffix array on the cluster): a position p belongs to a repeated
    * substring of length >= L iff p is covered by a repeated L-gram —
    * every position of an m >= L repeat lies inside one of its L-windows
    * and each such window repeats wherever the repeat does; conversely a
    * repeated L-window IS a repeat of length L. The same identity holds
    * occurrence-wise for the keep-first rule: an occurrence's L-windows
    * are first-occurrences exactly when the enclosing repeat occurrence
    * is first (ties broken by global (id, pos) order in both views). So
    * [[exciseDupSpans]] at n = L already excises the EXACT variable-
    * length position set (OpsSpec pins the equality), and this operator
    * adds what the suffix-array formulation reports and fixed-n cannot:
    * the merged maximal span boundaries, their count, and the longest
    * repeat length. Both are fuzz-pinned against a serial suffix-array +
    * LCP reference (the paper's own formulation) in OpsSpec.
    *
    * Scale shape: identical to [[exciseDupSpans]] — min(struct(id,pos))
    * ownership AGGREGATION on the n-gram key (map-side combinable, AQE
    * skew-splittable; never a window on the hot boilerplate key), dup-
    * only coverage, and ONE doc-keyed rebuild join; the span merge is a
    * narrow per-doc HOF fold over the sorted dup starts. A 10^6-token
    * repeated document costs O(len) fold steps, not O(len^2).
    *
    * Returns per doc: n_tokens, n_spans, n_excised, max_span_len,
    * spans (array<struct<st,en>>, 0-based token offsets, end
    * exclusive), kept_md5.
    */
  def exciseDupSpansVar(df: DataFrame, idCol: String, textCol: String,
                        minLen: Int = 50): DataFrame = {
    require(minLen >= 1)
    val n = minLen
    val toks = df.select(col(idCol), split(col(textCol), "\\s+").as("_ts"))
    val spans = dupSpanSetsText(df, idCol, textCol, n)
    toks.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        size(col("_ts")).cast("long").as("n_tokens"),
        coalesce(size(col("spans")), lit(0)).cast("long").as("n_spans"),
        coalesce(expr("aggregate(spans, 0, (a, x) -> a + x.en - x.st)"), lit(0))
          .cast("long").as("n_excised"),
        coalesce(expr("aggregate(spans, 0, (a, x) -> greatest(a, x.en - x.st))"),
          lit(0)).cast("long").as("max_span_len"),
        coalesce(col("spans"),
          expr("cast(array() as array<struct<st:int,en:int>>)")).as("spans"),
        md5(concat_ws(" ", expr(
          """transform(
            |  filter(transform(_ts, (t, j) -> struct(j, t)),
            |         s -> spans is null or
            |              not exists(spans, sp -> s.j >= sp.st and s.j < sp.en)),
            |  x -> x.t)""".stripMargin))).as("kept_md5"))
  }

  /** Merged maximal dup-span sets per doc over tokenized input
    * (idCol, _ts): (idCol, spans array<struct<st,en>>). The shared
    * core of [[exciseDupSpansVar]] and [[exciseRebuild]] — ownership
    * min-aggregation, dup-only coverage, narrow merge fold (see
    * exciseDupSpansVar's scale notes).
    */
  /** Token n-gram occurrences of tokenized input (idCol, _ts):
    * (idCol, i, ng) with 0-based start i.
    */
  private[graft] def ngramOccurrences(toks: DataFrame, idCol: String, n: Int): DataFrame =
    toks.select(col(idCol), posexplode(expr(
      s"""case when size(_ts) >= $n
         |  then transform(sequence(1, size(_ts) - ${n - 1}),
         |         i -> concat_ws(' ', slice(_ts, i, $n)))
         |  else array() end""".stripMargin)).as(Seq("i", "ng")))

  /** Merge dup occurrence starts (idCol, i) into maximal spans: starts
    * s ascending each contribute [s, s+n); s <= last.en merges (overlap
    * OR abutting coverage — contiguous excised positions are one span,
    * exactly the union-of-repeats the suffix-array formulation excises).
    */
  private[graft] def mergeSpans(dupStarts: DataFrame, idCol: String, n: Int): DataFrame =
    dupStarts.groupBy(col(idCol)).agg(sort_array(collect_set("i")).as("_st"))
      .withColumn("spans", expr(
        s"""aggregate(_st, cast(array() as array<struct<st:int,en:int>>),
           |  (acc, s) -> case
           |    when size(acc) > 0 and s <= element_at(acc, -1).en
           |      then concat(slice(acc, 1, size(acc) - 1),
           |             array(struct(element_at(acc, -1).st as st,
           |                          s + $n as en)))
           |    else concat(acc, array(struct(s as st, s + $n as en)))
           |  end)""".stripMargin))
      .select(col(idCol), col("spans"))

  /** [[dupSpanSets]] over the raw text column — the batch form: occ via
    * the native [[graft.expr.NgramsOf]] kernel and the `first` side
    * filtered to n-grams with >= 2 occurrences before the join (same
    * r9 reasoning as [[exciseDupSpans]]; dup set provably unchanged).
    */
  private[graft] def dupSpanSetsText(df: DataFrame, idCol: String,
                                     textCol: String, n: Int): DataFrame = {
    val occ = df.select(col(idCol),
      posexplode(graft.expr.NgramsOf(col(textCol), n)).as(Seq("i", "ng")))
    val first = occ.groupBy("ng")
      .agg(min(struct(col(idCol), col("i"))).as("_f"),
        count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= 2)
      .select(col("ng"), col("_f"))
    val dup = occ.join(first, "ng")
      .filter(!(col(idCol) === col(s"_f.$idCol") && col("i") === col("_f.i")))
    mergeSpans(dup, idCol, n)
  }

  private[graft] def dupSpanSets(toks: DataFrame, idCol: String, n: Int): DataFrame = {
    val occ = ngramOccurrences(toks, idCol, n)
    val first = occ.groupBy("ng")
      .agg(min(struct(col(idCol), col("i"))).as("_f"))
    val dup = occ.join(first, "ng")
      .filter(!(col(idCol) === col(s"_f.$idCol") && col("i") === col("_f.i")))
    mergeSpans(dup, idCol, n)
  }

  /** [[exciseDupSpansVar]]'s rebuild as TEXT — the composable form the
    * curation funnel's optional excision stage uses: (idCol,
    * text_excised) with every non-first duplicated span >= minLen
    * tokens removed (space-rejoined survivors, matching kept_md5).
    */
  def exciseRebuild(df: DataFrame, idCol: String, textCol: String,
                    minLen: Int = 50): DataFrame = {
    require(minLen >= 1)
    val toks = df.select(col(idCol), split(col(textCol), "\\s+").as("_ts"))
    toks.join(dupSpanSetsText(df, idCol, textCol, minLen), Seq(idCol), "left")
      .select(col(idCol),
        concat_ws(" ", expr(
          """transform(
            |  filter(transform(_ts, (t, j) -> struct(j, t)),
            |         s -> spans is null or
            |              not exists(spans, sp -> s.j >= sp.st and s.j < sp.en)),
            |  x -> x.t)""".stripMargin)).as("text_excised"))
  }

  /** Exact content dedup: groupBy md5(content), keep the smallest id. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("h", md5(col(textCol)))
      .groupBy("h")
      .agg(count(lit(1)).as("n"), min(idCol).as("keep_id"))

  /** Distinct n-token shingles of a text column — the native codegen
    * [[graft.expr.ShinglesOf]] Expression (bit-identical to
    * [[shinglesHof]], pinned by OpsSpec; one pass instead of
    * interpreted HOF lambdas).
    */
  def shingles(textCol: String, n: Int): Column =
    graft.expr.ShinglesOf(col(textCol), n)

  /** The HOF formulation, kept as the equality reference: token array
    * bound once via a single-element-array lambda so the regex split is
    * not re-executed per element.
    */
  def shinglesHof(textCol: String, n: Int): Column = {
    val parts = (1 until n)
      .map(k => s"|| ' ' || coalesce(try_element_at(t, i + $k), '')").mkString(" ")
    expr(s"""element_at(transform(array(split($textCol, '$TokenSplitSql')), t ->
      array_distinct(transform(sequence(1, greatest(size(t) - ${n - 1}, 1)),
        i -> try_element_at(t, i) $parts))), 1)""")
  }

  /** MinHash signatures: sig_j = min md5(j || ':' || shingle); k salts.
    * md5-string recipe — cross-engine reproducible (the DuckDB-parity
    * form the query battery uses). r9: fully NARROW via the one-pass
    * [[graft.expr.MinHashMd5Of]] kernel — no shingle explode, no
    * aggregation shuffle; bit-identical to the exploded
    * `min(md5(j || ':' || sh))` form ([[minhashSignaturesAgg]], pinned
    * by OpsSpec). For the pure-Spark scale path prefer
    * [[minhashSignaturesFast]]: xxhash64 longs are ~4.5x faster to
    * compute and 4x smaller to shuffle, with the same MinHash
    * collision statistics.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, shingleN: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol),
      graft.expr.MinHashMd5Of(col(textCol), shingleN, k).as("_sigs"))
    sigs.select(col(idCol) +:
      (0 until k).map(j => col("_sigs").getItem(j).as(s"sig$j")): _*)
  }

  /** The exploded-aggregation formulation, kept as the equality
    * reference for [[minhashSignatures]].
    */
  def minhashSignaturesAgg(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 8, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol), explode(shingles(textCol, shingleN)).as("sh"))
    val aggs = (0 until k).map(j =>
      min(md5(concat(lit(s"$j:"), col("sh")))).as(s"sig$j"))
    sh.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signatures over xxhash64 (long) instead of md5 (hex
    * string) — AND fully narrow: [[graft.expr.MinHashOf]] computes all k
    * running minimums in one pass per document, so there is no shingle
    * explode and NO aggregation shuffle at all (signatures at scan
    * speed; pinned bit-equal to the exploded `min(xxhash64(j, sh))`
    * form by OpsSpec). The md5 form stays for cross-engine parity.
    */
  def minhashSignaturesFast(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 8, shingleN: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol),
      graft.expr.MinHashOf(col(textCol), shingleN, k).as("sigs"))
    sigs.select(col(idCol) +:
      (0 until k).map(j => col("sigs").getItem(j).as(s"sig$j")): _*)
  }

  /** The exploded-aggregation formulation, kept as the equality
    * reference for [[minhashSignaturesFast]].
    */
  def minhashSignaturesFastAgg(df: DataFrame, idCol: String, textCol: String,
                               k: Int = 8, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol), explode(shingles(textCol, shingleN)).as("sh"))
    val aggs = (0 until k).map(j => min(xxhash64(lit(j), col("sh"))).as(s"sig$j"))
    sh.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** [[lshCandidatePairs]] on the fast long signatures: band keys are
    * xxhash64 over the band's signature slice; identical grouped,
    * capped in-bucket pair expansion.
    */
  def lshCandidatePairsFast(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 8, bands: Int = 2, shingleN: Int = 3,
                            maxBucket: Int = 1024): DataFrame = {
    val rows = k / bands
    val sig = minhashSignaturesFast(df, idCol, textCol, k, shingleN)
    val bandCols = (0 until bands).map { b =>
      xxhash64((lit(b) +: (b * rows until (b + 1) * rows).map(j => col(s"sig$j"))): _*)
    }
    val buckets = sig.select(col(idCol).as("id"), explode(array(bandCols: _*)).as("bucket"))
    pairsWithinBuckets(buckets, maxBucket)
  }

  /** LSH banding: hash bands of the signature into bucket keys, then
    * generate candidate pairs *within* each bucket. bands*rowsPerBand
    * must == k.
    *
    * Scale guards (both essential at 100 TB):
    *  - the signature subtree is computed once (grouped pair expansion,
    *    no bucket self-join that would evaluate it per join side);
    *  - `maxBucket` caps the ids considered per bucket (deterministic:
    *    first maxBucket in id order via a per-bucket row_number), so a
    *    degenerate corpus of near-identical documents cannot turn one
    *    bucket into a quadratic, single-reducer pair explosion. The
    *    row_number window streams + spills (never materializes the
    *    uncapped bucket as an array), and the following groupBy reuses
    *    the window's hash partitioning on `bucket` — no extra shuffle.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, bands: Int = 2, shingleN: Int = 3,
                        maxBucket: Int = 1024): DataFrame = {
    val rows = k / bands
    val sig = minhashSignatures(df, idCol, textCol, k, shingleN)
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws("|", (b * rows until (b + 1) * rows).map(j => col(s"sig$j")): _*))
    }
    val buckets = sig.select(col(idCol).as("id"), explode(array(bandCols: _*)).as("bucket"))
    pairsWithinBuckets(buckets, maxBucket)
  }

  /** Shared grouped, capped pair expansion over (id, bucket) rows. */
  private def pairsWithinBuckets(buckets: DataFrame, maxBucket: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("id")
    buckets
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= maxBucket)
      .groupBy("bucket").agg(array_sort(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> named_struct('id1', x, 'id2', y))))""".stripMargin)).as("pr"))
      .select(col("pr.id1").as("id1"), col("pr.id2").as("id2"))
      .distinct()
  }

  /** SimHash fingerprint over distinct tokens (width bits, <= 128).
    * Single-pass shape: one row per distinct token (no x-width bit
    * explode), width per-bit +/-1 votes as map-side-combined sums ->
    * ONE shuffle on the id key.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              width: Int = 64): DataFrame = {
    require(width >= 1 && width <= 128, "md5 supplies 128 bits")
    val toks = df.select(col(idCol),
        explode(expr(s"array_distinct(split($textCol, '$TokenSplitSql'))")).as("tok"))
      .withColumn("h", md5(col("tok")))
    def vote(bit: Int): Column = {
      val nib = bit / 4; val shift = 1 << (3 - bit % 4)
      expr(s"case when ((cast(conv(substring(h, ${nib + 1}, 1), 16, 10) as int) div $shift) % 2) = 1 then 1 else -1 end")
    }
    val sums = (0 until width).map(b => sum(vote(b)).as(s"sv$b"))
    toks.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
      .select(col(idCol), concat(
        (0 until width).map(b => when(col(s"sv$b") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** SimHash scale path: [[graft.expr.SimHash64Of]] — the whole
    * fingerprint in one narrow pass per document (no token explode, no
    * shuffle), xxhash64 votes, long output. The md5 form above stays
    * for cross-engine oracle parity.
    */
  def simhashFast(df: DataFrame, idCol: String, textCol: String,
                  width: Int = 64): DataFrame =
    df.select(col(idCol),
      graft.expr.SimHash64Of(col(textCol), width).as("simhash64"))

  /** Content fingerprint scale path: min xxhash64 over distinct
    * 5-shingles = a 1-salt [[graft.expr.MinHashOf]] — narrow, one pass.
    */
  def fingerprintFast(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 5): DataFrame =
    df.select(col(idCol),
      graft.expr.MinHashOf(col(textCol), shingleN, 1).getItem(0).as("fp64"))

  /** n-gram Jaccard over a banded candidate set (same group, bounded id
    * distance) — the verification stage after LSH candidate generation.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, window: Int = 20, n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), col(groupCol).as("g"),
      shingles(textCol, n).as("sh"))
    sh.as("a").join(sh.as("b"),
        col("a.g") === col("b.g") && col("b.id") > col("a.id") &&
          col("b.id") <= col("a.id") + window)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          (size(col("a.sh")) + size(col("b.sh")) -
            size(array_intersect(col("a.sh"), col("b.sh"))))).as("jaccard"))
  }

  /** Exact n-gram Jaccard verification of CANDIDATE PAIRS — the stage
    * between LSH candidate generation and clustering: each (id1, id2)
    * pair gets its true shingle-set Jaccard so callers can drop
    * hash-collision false positives before clustering.
    *
    * Scale shape: the corpus is first semi-joined down to the docs the
    * pair set actually references (|referenced| <= 2|pairs| — at 10^12
    * docs with 10^7 candidate pairs the shingle computation runs over
    * 10^7 docs, not the corpus), shingle sets are computed narrowly
    * (`graft_shingles`) over that slice, and attached to the pair rows
    * by two id-keyed joins — all per-stage work is O(|pairs|), never
    * corpus-sized, and the joins broadcast when the pair set is small.
    */
  def verifyPairs(pairs: DataFrame, df: DataFrame, idCol: String,
                  textCol: String, n: Int = 3): DataFrame = {
    // r9 (guide §2.4): referenced ids via ONE explode pass over `pairs`
    // instead of a two-branch self-union — the (possibly expensive)
    // upstream pair pipeline is evaluated once here, not twice; same
    // distinct id set.
    val ids = pairs
      .select(explode(array(col("id1"), col("id2"))).as("_vid")).distinct()
    val refd = df.join(ids, df(idCol) === col("_vid"), "left_semi")
    val sh = refd.select(col(idCol).as("_vid"), shingles(textCol, n).as("_vsh"))
    pairs.select(col("id1"), col("id2"))
      .join(sh.select(col("_vid").as("id1"), col("_vsh").as("sh1")), "id1")
      .join(sh.select(col("_vid").as("id2"), col("_vsh").as("sh2")), "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") /
          (size(col("sh1")) + size(col("sh2")) - col("inter"))).as("jaccard"))
  }

  /** Connected components over near-duplicate pairs — the clustering
    * step between candidate pairs and survivor selection. Label
    * propagation: every vertex's label converges to the minimum id
    * reachable from it; each iteration is one union + one min-groupBy
    * (converges in O(diameter) iterations; near-dup clusters are
    * shallow, so `maxIter` 10 covers any realistic corpus). Logs a
    * warning on non-convergence; use [[connectedComponentsFlagged]]
    * when the caller needs the flag programmatically.
    *
    * Input: (id1, id2) pairs. Output: (id, component) where component =
    * min id of the cluster. Deterministic.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame =
    connectedComponentsFlagged(pairs, maxIter)._1

  /** [[connectedComponents]] + a convergence flag (false = maxIter hit
    * with labels still changing: clusters of diameter > maxIter come
    * back split, and survivor selection keeps extra docs).
    *
    * Scale guards:
    *  - the (possibly expensive) upstream pair pipeline is evaluated
    *    exactly ONCE: edges materialize via a single explode pass over
    *    `pairs` (not a self-union that evaluates the subtree twice) and
    *    are persisted for the loop (OpsSpec pins one evaluation with an
    *    accumulator);
    *  - every iteration's label table is `localCheckpoint`ed (eager),
    *    truncating the lineage so round k does not replay rounds 1..k-1
    *    on recomputation and the plan does not grow with the iteration
    *    count.
    */
  /** Run `f` with Catalyst constraint propagation disabled. The
    * iterative CC loops checkpoint label tables whose captured
    * constraint sets (alias equalities, self-join leftovers) can
    * reference attribute ids absent from the checkpointed output;
    * `Union.rewriteConstraints` then throws `key not found: id#N`
    * (hit with range+format_string pair sources). Constraints are
    * optimizer-only inference hints — disabling them for the loop's
    * trivial join/union/groupBy plans changes no results and no
    * meaningful plan choice.
    */
  private def withoutConstraintPropagation[T](df: DataFrame)(f: => T): T = {
    val key = "spark.sql.constraintPropagation.enabled"
    val conf = df.sparkSession.conf
    val prev = conf.getOption(key)
    conf.set(key, "false")
    try f
    finally prev match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  def connectedComponentsFlagged(pairs: DataFrame,
                                 maxIter: Int = 10): (DataFrame, Boolean) =
    withoutConstraintPropagation(pairs) {
    // eager localCheckpoint (not persist): materializes `edges` once and
    // REPLACES the pair pipeline's logical plan with the checkpointed RDD
    // — the loop's unions/joins never re-optimize the (arbitrary)
    // upstream plan, whose propagated constraints can trip Union
    // constraint rewriting (hit with range+format_string pair sources)
    val edges = pairs
      .select(explode(array(
        struct(col("id1"), col("id2")),
        struct(col("id2").as("id1"), col("id1").as("id2")))).as("e"))
      .select(col("e.id1").as("id1"), col("e.id2").as("id2"))
      .localCheckpoint()
    var labels = edges.select(col("id1").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // candidate label per vertex: min of own and neighbors' labels.
      // The changed-flag join folds INTO the checkpoint materialization
      // (labels is cached), so each round is ONE job plus a cached
      // isEmpty scan — not a separate join+count action per round
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "id2"), "id2")
        .select(col("id1").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(viaNeighbors)
        .groupBy("id").agg(min("component").as("component"))
        .join(labels.withColumnRenamed("component", "old"), "id")
        .select(col("id"), col("component"), (col("component") < col("old")).as("chg"))
        .localCheckpoint() // eager: lineage truncated, result cached
      converged = next.filter(col("chg")).isEmpty
      labels.unpersist()
      labels = next.select("id", "component")
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"connectedComponents: not converged after $maxIter iterations; " +
          "clusters deeper than maxIter are split — raise maxIter")
    (labels, converged)
  }

  /** [[connectedComponentsFlagged]] accelerated with label shortcutting
    * (pointer doubling): after each neighbor-min step every vertex also
    * adopts its LABEL's label (component-of-component — labels are
    * vertex ids, and every vertex id has a label row, so the lookup is
    * one unique-key join). The reach compounds geometrically, so a
    * diameter-D component converges in O(log D) rounds instead of O(D):
    * the adversarial shape for plain label propagation is a CHAIN
    * (each doc paired only to the next — maxIter rounds), which the
    * shortcut collapses (DedupBench --chain measures the cliff; OpsSpec
    * pins label equality with the plain variant on chains and random
    * graphs). Fixpoint and determinism identical to
    * [[connectedComponents]] (min reachable id).
    *
    * Per round: 2 unique-key joins + 1 min-groupBy (vs 1 + 1 for the
    * plain variant) — the right trade whenever cluster diameter can
    * exceed a handful of hops.
    */
  def connectedComponentsPDFlagged(pairs: DataFrame,
                                   maxIter: Int = 20): (DataFrame, Boolean) =
    withoutConstraintPropagation(pairs) {
    // localCheckpoint (not persist) — same reasoning as the plain variant
    val edges = pairs
      .select(explode(array(
        struct(col("id1"), col("id2")),
        struct(col("id2").as("id1"), col("id1").as("id2")))).as("e"))
      .select(col("e.id1").as("id1"), col("e.id2").as("id2"))
      .localCheckpoint()
    var labels = edges.select(col("id1").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "id2"), "id2")
        .select(col("id1").as("id"), col("component"))
      val stepped = labels.select(col("id"), col("component"))
        .union(viaNeighbors)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint() // materialize once: the shortcut self-joins it
      // shortcut: component <- min(component, component's own label).
      // component values are vertex ids, each with exactly one label row
      // -> unique-key equi-join, no fanout. The changed-flag join folds
      // into the checkpoint (labels cached): one job + cached isEmpty
      val next = stepped.as("n")
        .join(stepped.select(col("id").as("lid"), col("component").as("lcomp")),
          col("n.component") === col("lid"), "left")
        .select(col("n.id").as("id"),
          least(col("n.component"), coalesce(col("lcomp"), col("n.component")))
            .as("component"))
        .join(labels.withColumnRenamed("component", "old"), "id")
        .select(col("id"), col("component"), (col("component") < col("old")).as("chg"))
        .localCheckpoint() // eager: lineage truncated, result cached
      converged = next.filter(col("chg")).isEmpty
      labels.unpersist()
      labels = next.select("id", "component")
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"connectedComponentsPD: not converged after $maxIter iterations " +
          s"(covers diameter ~2^$maxIter) — raise maxIter")
    (labels, converged)
  }

  def connectedComponentsPD(pairs: DataFrame, maxIter: Int = 20): DataFrame =
    connectedComponentsPDFlagged(pairs, maxIter)._1

  /** Survivor selection: one canonical doc per near-dup cluster (the
    * minimum id — deterministic), non-clustered docs kept as-is. The
    * full scale recipe: [[lshCandidatePairsFast]] -> (optional verify)
    * -> [[connectedComponents]] -> this. Set `pointerDoubling` when
    * cluster diameter is not known to be small (chain-shaped pair sets
    * need O(log D) rounds instead of O(D) — see
    * [[connectedComponentsPDFlagged]]).
    */
  def dedupByComponents(df: DataFrame, idCol: String, pairs: DataFrame,
                        maxIter: Int = 10,
                        pointerDoubling: Boolean = false): DataFrame = {
    val comps =
      if (pointerDoubling) connectedComponentsPD(pairs, maxIter)
      else connectedComponents(pairs, maxIter)
    df.join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .filter(col("component").isNull || col("component") === col(idCol))
      .drop("component")
  }

  /** Embedding-cosine near-duplicate pairs within LSH buckets: see
    * [[Similarity.annBuckets]] for bucketing. Pairs expand *within*
    * each bucket group (no bucket self-join — the bucketing subtree is
    * computed once, not per join side) and `maxBucket` caps the ids per
    * bucket (deterministic first-by-id via a streaming row_number
    * window) so one degenerate bucket cannot go quadratic — the same
    * guards as [[lshCandidatePairs]].
    *
    * Memory shape: the pair expansion computes the cosine INSIDE the
    * pair lambda and emits only (id1, id2, cos) structs — the vectors
    * never enter the expanded array, so the single pre-explode value is
    * O(maxBucket^2) ids+doubles (~20 MB at the 1024 cap), not
    * O(maxBucket^2 * dim) floats (~1 GB at dim 256 — a task OOM on
    * exactly the degenerate buckets the cap exists for). Norms are
    * computed once per item (codegen graft_dot) before the group-agg;
    * the in-lambda dot is the HOF form, bit-identical to graft_dot
    * (pinned by OpsSpec), so results match the previous recipe exactly.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        nPlanes: Int, threshold: Double,
                        maxBucket: Int = 1024): DataFrame = {
    // r9 (guide §2.4): the nPlanes projection planes are a driver-sized
    // constant (dataset vectors 1..nPlanes) — collect them once and
    // compute the bucket string NARROW per row (plane_id-ascending bit
    // order and graft_dot arithmetic identical to the previous
    // Similarity.annBuckets + id-join formulation, pinned by OpsSpec).
    // Removes the plane crossJoin (nPlanes x row blowup), the per-id
    // collect_list shuffle, AND the id-keyed join that re-attached the
    // vectors; the bucket window is now the first exchange.
    val planes = df.filter(col(idCol).between(1, nPlanes))
      .select(col(idCol), col(vecCol)).orderBy(idCol).collect()
    if (planes.isEmpty)
      // no planes -> the old crossJoin produced no bucket rows at all
      return df.select(col(idCol).as("id1"), col(idCol).as("id2"),
        lit(0.0).as("cos")).limit(0)
    val bits = planes.toSeq.map { r =>
      val v = r.getSeq[Any](1)
      val pv =
        if (v.headOption.exists(_.isInstanceOf[Double]))
          typedlit(v.map(_.asInstanceOf[Double]).toVector)
        else typedlit(v.map(_.asInstanceOf[Float]).toVector)
      when(Similarity.dot(col(vecCol), pv) > 0, "1").otherwise("0")
    }
    val bucketed = df.select(col(idCol), col(vecCol))
      .withColumn("bucket", concat(bits: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(idCol)
    bucketed
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= maxBucket)
      .withColumn("nrm", sqrt(Similarity.dot(col(vecCol), col(vecCol))))
      .groupBy("bucket")
      .agg(array_sort(collect_list(
        struct(col(idCol).as("id"), col(vecCol).as("v"), col("nrm")))).as("items"))
      .filter(size(col("items")) > 1)
      // r9: the in-lambda cosine runs the graft_dot kernel (Column-built
      // lambda) instead of an interpreted aggregate(zip_with(...)) per
      // element — ArrayDot is pinned bit-identical to that HOF form, so
      // the pair set and scores are unchanged; still only (id1, id2, cos)
      // structs enter the expanded array, never the vectors.
      .select(explode(flatten(transform(col("items"), (a, i) =>
        transform(slice(col("items"), i + lit(2), size(col("items"))), b =>
          struct(a.getField("id").as("id1"), b.getField("id").as("id2"),
            (Similarity.dot(a.getField("v"), b.getField("v")) /
              (a.getField("nrm") * b.getField("nrm"))).as("cos")))))).as("pr"))
      .filter(col("pr.cos") >= threshold)
      .select(col("pr.id1").as("id1"), col("pr.id2").as("id2"),
        col("pr.cos").as("cos"))
  }
}
