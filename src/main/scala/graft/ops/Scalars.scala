package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** Scalar function families (SURVEY.md §2.H) — one packed query per
  * family so the oracle checks many functions at once.
  *
  * Scale: pure per-row expressions, no UDFs, no shuffles beyond the
  * final presentation sort; everything runs in whole-stage codegen
  * EXCEPT the higher-order lambdas in the array/map families, which
  * Catalyst interprets — those two queries are API-coverage
  * demonstrations, not hot-path patterns (the hot paths — cosine,
  * shingles — use codegen formulations instead; see LlmOps/Shingles).
  * Transcendental results are rounded to 6 dp (Java Math vs C libm can
  * differ in the last ulp).
  */
object Scalars {

  /** §2.H string family. (initcap has no DuckDB builtin — the oracle
    * emulates it; soundex/bround stay unit-test-only per SURVEY.) */
  def qFnString(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    part(s, dir).select(
      $"p_partkey",
      concat($"p_brand", lit(":"), $"p_type").as("cat"),
      concat_ws("-", $"p_brand", $"p_type", $"p_name").as("cat_ws"),
      substring($"p_name", 1, 4).as("name4"),
      upper($"p_name").as("uc"),
      lower($"p_type").as("lc"),
      initcap($"p_name").as("icap"),
      trim(lit("  pad  ")).as("trimmed"),
      ltrim(lit("  pad  ")).as("ltrimmed"),
      rtrim(lit("  pad  ")).as("rtrimmed"),
      lpad($"p_brand", 10, "*").as("padded"),
      rpad($"p_brand", 10, "*").as("rpadded"),
      length($"p_name").cast("long").as("len"),
      instr($"p_name", "e").cast("long").as("pos_e"),
      translate($"p_name", "aeiou", "AEIOU").as("vowels_uc"),
      regexp_replace($"p_name", "[aeiou]", "_").as("vowels_gone"),
      // serialized, not a raw array: the driver's pandas comparator cannot
      // hash array cells (round-1 lesson) — '|'-join in both engines
      concat_ws("|", split($"p_name", " ")).as("words"),
      regexp_extract($"p_name", "([a-z]+) ([a-z]+)", 2).as("second_word"),
      levenshtein($"p_brand", lit("Brand#1")).cast("long").as("lev"))
      .orderBy($"p_partkey")
  }

  /** §2.H date/time family (months_between is unit-test-only: DuckDB has
    * no fractional-month equivalent). */
  def qFnDate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir).select(
      $"o_orderkey",
      dstr($"o_orderdate").as("d"),
      dstr(date_trunc("month", $"o_orderdate")).as("month_start"),
      year($"o_orderdate").cast("long").as("y"),
      month($"o_orderdate").cast("long").as("m"),
      dayofmonth($"o_orderdate").cast("long").as("dom"),
      hour($"o_orderdate").cast("long").as("hr"),
      dstr(date_add($"o_orderdate", 30)).as("plus30"),
      datediff(lit("2002-01-01").cast("date"), $"o_orderdate").cast("long").as("days_to_2002"),
      dstr(last_day($"o_orderdate")).as("eom"),
      unix_timestamp($"o_orderdate").as("epoch_s"),
      dstr(make_date(year($"o_orderdate"), month($"o_orderdate"), lit(1))).as("made"))
      .orderBy($"o_orderkey")
  }

  /** §2.H math family (round-half-up `round` only; `bround` banker's
    * rounding differs from DuckDB and stays unit-test-only). */
  def qFnMath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir).select(
      $"l_orderkey", $"l_linenumber", $"l_extendedprice",
      round($"l_extendedprice", 1).as("r1"),
      abs($"l_extendedprice" * lit(-1.0)).as("absv"),
      ceil($"l_quantity" / lit(7.0)).as("ceil7"),
      floor($"l_quantity" / lit(7.0)).as("floor7"),
      r6(pow($"l_discount", 2)).as("disc_sq"),
      r6(exp($"l_discount")).as("e_disc"),
      r6(log($"l_quantity" + lit(1.0))).as("ln_qty"),
      r6(log10($"l_extendedprice" + lit(1.0))).as("log10_price"),
      r6(sqrt($"l_quantity")).as("sqrt_qty"),
      r6(sin($"l_discount")).as("sin_disc"),
      r6(cos($"l_discount")).as("cos_disc"),
      signum($"l_extendedprice" - lit(1000.0)).as("sgn"),
      greatest($"l_quantity", $"l_discount" * lit(100.0)).as("gr"),
      least($"l_quantity", $"l_discount" * lit(100.0)).as("ls"),
      pmod($"l_orderkey" - lit(7L), lit(5L)).as("pm"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixtures; order
      // by every source column the output derives from for a total order
      .orderBy($"l_orderkey", $"l_linenumber", $"l_extendedprice",
        $"l_quantity", $"l_discount")
  }

  /** §2.H array family incl. higher-order functions, on the embedding
    * vectors (cast float→double first — lambda arithmetic must run in
    * double on both engines for bit parity). */
  def qFnArray(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
      .withColumn("emb", $"embedding".cast("array<double>"))
    e.select(
      $"vec_id",
      size($"emb").cast("long").as("dim"),
      r6(element_at($"emb", 1)).as("first_el"),
      // double arrays are serialized as '|'-joined scaled longs: a raw
      // double→string cast differs between engines (Spark "1.0E-7" vs
      // DuckDB "1e-07"), but round(x*1e6) on the SAME binary double is
      // bit-identical (both round half away from zero), and long→string
      // is exact everywhere
      concat_ws("|", transform(slice($"emb", 1, 3),
        x => round(x * lit(2000000.0), 0).cast("long").cast("string")))
        .as("head3_x2"),
      size(filter($"emb", x => x > lit(0.0))).cast("long").as("n_pos"),
      exists($"emb", x => x > lit(0.3)).as("any_big"),
      r6(aggregate($"emb", lit(0.0), (acc, x) => acc + x)).as("sum_el"),
      r6(aggregate(zip_with($"emb", $"emb", (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as("norm_sq"),
      concat_ws("|", transform(sort_array(slice($"emb", 1, 4)),
        x => round(x * lit(1000000.0), 0).cast("long").cast("string")))
        .as("head4_sorted"))
      .orderBy($"vec_id")
  }

  /** §2.H map family; values compared as arrays (construction order is
    * deterministic on both engines). */
  def qFnMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir).select(
      $"event_id",
      map(lit("t"), $"event_type", lit("k"),
        get_json_object($"props", "$.k")).as("m"))
      .select(
        $"event_id",
        concat_ws("|", map_keys($"m")).as("mk"),
        concat_ws("|",
          map_values(transform_values($"m", (_, v) => upper(v)))).as("mv_uc"),
        element_at($"m", "t").as("tval"))
      .orderBy($"event_id")
  }

  /** §2.H JSON family on events.props (shape {"k": <int>}). */
  def qFnJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kSchema = org.apache.spark.sql.types.StructType.fromDDL("k INT")
    events(s, dir).select(
      $"event_id",
      get_json_object($"props", "$.k").as("k_str"),
      from_json($"props", kSchema).getField("k").as("k_int"),
      to_json(struct($"event_type".as("t"),
        from_json($"props", kSchema).getField("k").as("k"))).as("j"))
      .orderBy($"event_id")
  }

  /** §2.H regex family (match / count / extract-all / split-count);
    * array results '|'-serialized per the no-raw-arrays discipline. */
  def qFnRegex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    part(s, dir).select(
      $"p_partkey",
      $"p_name".rlike("^[a-z]+ ").as("starts_word"),
      size(regexp_extract_all($"p_name", lit("[aeiou]+"), lit(0)))
        .cast("long").as("n_vowel_runs"),
      concat_ws("|", regexp_extract_all($"p_name", lit("[a-z]{4,}"), lit(0)))
        .as("long_words"),
      regexp_replace($"p_type", "[AEIOU]", "*").as("type_masked"))
      .orderBy($"p_partkey")
  }

  /** §2.H bitwise family on integer keys. Output columns derive only
    * from (l_orderkey, l_linenumber), so duplicate key pairs produce
    * identical rows and the emitted order stays total for compare. */
  def qFnBitwise(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir).select(
      $"l_orderkey", $"l_linenumber",
      $"l_orderkey".bitwiseAND(lit(255L)).as("band"),
      $"l_orderkey".bitwiseOR(lit(16L)).as("bor"),
      $"l_orderkey".bitwiseXOR($"l_linenumber".cast("long")).as("bxor"),
      shiftleft($"l_linenumber", 3).cast("long").as("shl"),
      shiftright($"l_orderkey", 2).as("shr"),
      bit_count($"l_orderkey").cast("long").as("bits"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** §2.H cryptographic-hash family (md5 / sha2-256 — the two with
    * cross-engine twins; xxhash64/crc32 are Spark-only and covered as
    * join-key compaction in the dedup ops). */
  def qFnHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    part(s, dir).select(
      $"p_partkey",
      md5($"p_name").as("h_md5"),
      sha2($"p_name", 256).as("h_sha256"))
      .orderBy($"p_partkey")
  }

  /** §2.H conditionals. */
  def qFnCond(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir).select(
      $"o_orderkey",
      when($"o_orderstatus" === "F", "finished")
        .when($"o_orderstatus" === "O", "open")
        .otherwise("partial").as("status_word"),
      coalesce(nullif($"o_orderstatus", lit("P")), lit("was_p")).as("np"),
      when($"o_totalprice" > 300, $"o_totalprice").as("big_or_null"),
      coalesce(when($"o_totalprice" > 300, $"o_totalprice"), lit(0.0)).as("big_or_zero"))
      .orderBy($"o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_string" -> qFnString _,
    "q_fn_date" -> qFnDate _,
    "q_fn_math" -> qFnMath _,
    "q_fn_array" -> qFnArray _,
    "q_fn_map" -> qFnMap _,
    "q_fn_json" -> qFnJson _,
    "q_fn_cond" -> qFnCond _,
    "q_fn_regex" -> qFnRegex _,
    "q_fn_bitwise" -> qFnBitwise _,
    "q_fn_hash" -> qFnHash _
  )

  val oracleSql: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT p_partkey,
        |  p_brand || ':' || p_type AS cat,
        |  concat_ws('-', p_brand, p_type, p_name) AS cat_ws,
        |  substring(p_name, 1, 4) AS name4,
        |  upper(p_name) AS uc,
        |  lower(p_type) AS lc,
        |  list_aggregate(list_transform(string_split(p_name, ' '),
        |    w -> upper(w[1]) || lower(substring(w, 2))), 'string_agg', ' ') AS icap,
        |  trim('  pad  ') AS trimmed,
        |  ltrim('  pad  ') AS ltrimmed,
        |  rtrim('  pad  ') AS rtrimmed,
        |  lpad(p_brand, 10, '*') AS padded,
        |  rpad(p_brand, 10, '*') AS rpadded,
        |  length(p_name) AS len,
        |  instr(p_name, 'e') AS pos_e,
        |  translate(p_name, 'aeiou', 'AEIOU') AS vowels_uc,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS vowels_gone,
        |  array_to_string(string_split(p_name, ' '), '|') AS words,
        |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  levenshtein(p_brand, 'Brand#1') AS lev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_fn_date" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  year(o_orderdate) AS y,
        |  month(o_orderdate) AS m,
        |  day(o_orderdate) AS dom,
        |  hour(o_orderdate) AS hr,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  strftime(make_date(year(o_orderdate), month(o_orderdate), 1), '%Y-%m-%d') AS made
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  round(l_extendedprice, 1) AS r1,
        |  abs(l_extendedprice * -1.0) AS absv,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil7,
        |  CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor7,
        |  round(pow(l_discount, 2), 6) AS disc_sq,
        |  round(exp(l_discount), 6) AS e_disc,
        |  round(ln(l_quantity + 1.0), 6) AS ln_qty,
        |  round(log10(l_extendedprice + 1.0), 6) AS log10_price,
        |  round(sqrt(l_quantity), 6) AS sqrt_qty,
        |  round(sin(l_discount), 6) AS sin_disc,
        |  round(cos(l_discount), 6) AS cos_disc,
        |  CAST(sign(l_extendedprice - 1000.0) AS DOUBLE) AS sgn,
        |  greatest(l_quantity, l_discount * 100.0) AS gr,
        |  least(l_quantity, l_discount * 100.0) AS ls,
        |  ((l_orderkey - 7) % 5 + 5) % 5 AS pm
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice,
        |         l_quantity, l_discount""".stripMargin,
    "q_fn_array" ->
      """SELECT vec_id,
        |  len(emb) AS dim,
        |  round(emb[1], 6) AS first_el,
        |  array_to_string(list_transform(emb[1:3],
        |    x -> CAST(CAST(round(x * 2000000.0, 0) AS BIGINT) AS VARCHAR)), '|') AS head3_x2,
        |  len(list_filter(emb, x -> x > 0.0)) AS n_pos,
        |  len(list_filter(emb, x -> x > 0.3)) > 0 AS any_big,
        |  round(list_aggregate(emb, 'sum'), 6) AS sum_el,
        |  round(list_aggregate(list_transform(emb, x -> x * x), 'sum'), 6) AS norm_sq,
        |  array_to_string(list_transform(list_sort(emb[1:4]),
        |    x -> CAST(CAST(round(x * 1000000.0, 0) AS BIGINT) AS VARCHAR)), '|') AS head4_sorted
        |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |ORDER BY vec_id""".stripMargin,
    "q_fn_map" ->
      """SELECT event_id,
        |  array_to_string(map_keys(m), '|') AS mk,
        |  array_to_string(list_transform(map_values(m), x -> upper(x)), '|') AS mv_uc,
        |  map_values(m)[1] AS tval
        |FROM (SELECT event_id,
        |        map(['t', 'k'],
        |            [event_type, json_extract_string(props, '$.k')]) AS m
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  CAST(to_json(struct_pack(t := event_type,
        |    k := CAST(json_extract_string(props, '$.k') AS INT))) AS VARCHAR) AS j
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_regex" ->
      """SELECT p_partkey,
        |  regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT)
        |    AS n_vowel_runs,
        |  coalesce(array_to_string(regexp_extract_all(p_name, '[a-z]{4,}'),
        |    '|'), '') AS long_words,
        |  regexp_replace(p_type, '[AEIOU]', '*', 'g') AS type_masked
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |  (l_orderkey & 255) AS band,
        |  (l_orderkey | 16) AS bor,
        |  xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS bxor,
        |  CAST(l_linenumber << 3 AS BIGINT) AS shl,
        |  (l_orderkey >> 2) AS shr,
        |  CAST(bit_count(l_orderkey) AS BIGINT) AS bits
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_fn_hash" ->
      """SELECT p_partkey,
        |  md5(p_name) AS h_md5,
        |  sha256(p_name) AS h_sha256
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_fn_cond" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 'finished'
        |       WHEN o_orderstatus = 'O' THEN 'open'
        |       ELSE 'partial' END AS status_word,
        |  coalesce(nullif(o_orderstatus, 'P'), 'was_p') AS np,
        |  CASE WHEN o_totalprice > 300 THEN o_totalprice END AS big_or_null,
        |  coalesce(CASE WHEN o_totalprice > 300 THEN o_totalprice END, 0.0) AS big_or_zero
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
