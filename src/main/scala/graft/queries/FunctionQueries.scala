package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function batteries (SURVEY.md §2.1 F1-F11): string, date/time, math,
  * array, JSON, hash — every family the reference touches, as codegen'd
  * built-ins (no UDFs anywhere in this file → whole-stage codegen end to end).
  *
  * Cross-engine determinism: libm-backed fns (ln/exp) are rounded to 6 dp;
  * sqrt is IEEE-exact; squares are written x*x (exact) rather than pow;
  * integer-valued outputs are type-aligned (cast to the same width both sides).
  */
object FunctionQueries extends QueryGroup {

  val defs: Seq[QueryDef] = Seq(

    // F1/F5/F6 string battery: concat_ws, split+element_at (±index),
    // regexp_extract/replace, upper, substring, length, lpad.
    QueryDef(
      "f_string_battery",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            substring(col("p_name"), 1, 4).as("pfx"),
            element_at(split(col("p_name"), " "), 1).as("first_word"),
            element_at(split(col("p_name"), " "), -1).as("last_word"),
            concat_ws("_", col("p_brand"), col("p_type")).as("ckey"),
            regexp_extract(col("p_brand"), "#(\\d+)$", 1).as("brand_num"),
            regexp_replace(col("p_type"), "O", "0").as("leet"),
            length(col("p_name")).as("len"),
            lpad(col("p_partkey").cast("string"), 9, "0").as("padded"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  upper(p_name) AS uname,
             |  substr(p_name, 1, 4) AS pfx,
             |  (string_split(p_name, ' '))[1] AS first_word,
             |  (string_split(p_name, ' '))[-1] AS last_word,
             |  concat_ws('_', p_brand, p_type) AS ckey,
             |  regexp_extract(p_brand, '#(\d+)$', 1) AS brand_num,
             |  regexp_replace(p_type, 'O', '0', 'g') AS leet,
             |  length(p_name) AS len,
             |  lpad(CAST(p_partkey AS VARCHAR), 9, '0') AS padded
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // The reference's model-artifact filename grammar
    // `{CODIGO}_{SECCION}_{ESPECIE}_{APL}[_grilla|_rodal|_etiquetas].ext`
    // (download_list_images.py:94-99, examples mysql_process.py:94-100):
    // build a filename from part dims, then parse it back with anchored
    // regexes (fixing the reference's split('.')[1] bug, §2.3.7).
    QueryDef(
      "f_filename_grammar",
      (s, d) => {
        val base = concat_ws("_",
          col("p_brand"), col("p_type"),
          element_at(split(col("p_name"), " "), 1),
          col("p_size").cast("string"))
        val fname = concat(
          base,
          when(col("p_partkey") % 3 === 0, "_grilla")
            .when(col("p_partkey") % 3 === 1, "_rodal")
            .otherwise(""),
          lit(".png"))
        val stem = regexp_replace(col("filename"), "\\.[^.]+$", "")
        val clean = regexp_replace(stem, "_(grilla|etiquetas|rodal)$", "")
        Tables.part(s, d)
          .select(col("p_partkey"), fname.as("filename"))
          .select(
            col("p_partkey"), col("filename"),
            element_at(split(clean, "_"), 1).as("codigo"),
            element_at(split(clean, "_"), 2).as("seccion"),
            element_at(split(clean, "_"), 3).as("especie"),
            element_at(split(clean, "_"), 4).cast("int").as("apl"),
            regexp_extract(col("filename"), "_(grilla|etiquetas|rodal)\\.", 1)
              .as("suffix"),
            regexp_extract(col("filename"), "\\.([^.]+)$", 1).as("ext"))
          .orderBy("p_partkey")
      },
      Some("""WITH named AS (
             |  SELECT p_partkey,
             |    concat_ws('_', p_brand, p_type, (string_split(p_name,' '))[1],
             |              CAST(p_size AS VARCHAR))
             |    || CASE WHEN p_partkey % 3 = 0 THEN '_grilla'
             |            WHEN p_partkey % 3 = 1 THEN '_rodal' ELSE '' END
             |    || '.png' AS filename
             |  FROM part),
             |parsed AS (
             |  SELECT p_partkey, filename,
             |    regexp_replace(regexp_replace(filename, '\.[^.]+$', ''),
             |                   '_(grilla|etiquetas|rodal)$', '') AS clean
             |  FROM named)
             |SELECT p_partkey, filename,
             |  (string_split(clean,'_'))[1] AS codigo,
             |  (string_split(clean,'_'))[2] AS seccion,
             |  (string_split(clean,'_'))[3] AS especie,
             |  CAST((string_split(clean,'_'))[4] AS INT) AS apl,
             |  regexp_extract(filename, '_(grilla|etiquetas|rodal)\.', 1) AS suffix,
             |  regexp_extract(filename, '\.([^.]+)$', 1) AS ext
             |FROM parsed ORDER BY p_partkey""".stripMargin)),

    // F8 date/time battery: trunc, extract, epoch, datediff.
    QueryDef(
      "f_date_battery",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            date_trunc("month", col("o_orderdate")).cast("date").as("month"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"),
            datediff(lit("1999-01-01").cast("date"), col("o_orderdate"))
              .as("days_to_1999"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             |  year(o_orderdate) AS yr,
             |  month(o_orderdate) AS mo,
             |  day(o_orderdate) AS dom,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
             |    AS days_to_1999
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // F2/F10 math battery incl. the planar-distance shape (exact: diff*diff,
    // IEEE sqrt) used by the geo kernel.
    QueryDef(
      "f_math_battery",
      (s, d) => {
        val dx = col("p_retailprice") - col("p_size")
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            sqrt(col("p_retailprice")).as("sqrt_price"),
            floor(col("p_retailprice")).cast("long").as("fl"),
            ceil(col("p_retailprice")).cast("long").as("cl"),
            abs(col("p_size") - lit(25)).as("dev25"),
            round(log(col("p_retailprice")), 6).as("ln_price"),
            round(exp(col("p_size") / lit(100.0)), 6).as("exp_size"),
            (col("p_partkey") % 7).as("mod7"),
            greatest(col("p_size"), lit(25)).as("hi"),
            least(col("p_size"), lit(25)).as("lo"),
            sqrt(dx * dx).as("dist1d"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  sqrt(p_retailprice) AS sqrt_price,
             |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
             |  CAST(ceil(p_retailprice) AS BIGINT) AS cl,
             |  abs(p_size - 25) AS dev25,
             |  round(ln(p_retailprice), 6) AS ln_price,
             |  round(exp(p_size / 100.0), 6) AS exp_size,
             |  p_partkey % 7 AS mod7,
             |  greatest(p_size, 25) AS hi,
             |  least(p_size, 25) AS lo,
             |  sqrt((p_retailprice - p_size) * (p_retailprice - p_size)) AS dist1d
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Array battery over embeddings: size, ±index, min/max, sequential
    // fold-sum (higher-order aggregate), slice.
    QueryDef(
      "f_array_battery",
      (s, d) =>
        Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            element_at(col("embedding"), 1).cast("double").as("e_first"),
            element_at(col("embedding"), -1).cast("double").as("e_last"),
            array_min(col("embedding")).cast("double").as("e_min"),
            array_max(col("embedding")).cast("double").as("e_max"),
            round(
              aggregate(
                transform(col("embedding"), x => x.cast("double")),
                lit(0.0), (acc, x) => acc + x),
              6).as("e_sum"),
            size(slice(col("embedding"), 1, 8)).as("head_dim"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  len(embedding) AS dim,
             |  CAST(embedding[1] AS DOUBLE) AS e_first,
             |  CAST(embedding[-1] AS DOUBLE) AS e_last,
             |  CAST(list_min(embedding) AS DOUBLE) AS e_min,
             |  CAST(list_max(embedding) AS DOUBLE) AS e_max,
             |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)
             |    AS e_sum,
             |  len(list_slice(embedding, 1, 8)) AS head_dim
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // F11 JSON battery over events.props.
    QueryDef(
      "f_json_battery",
      (s, d) =>
        Tables.events(s, d)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"),
            from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
              .getField("k").as("k_typed"),
            get_json_object(col("props"), "$.missing").as("missing"),
            (get_json_object(col("props"), "$.k").cast("long") * 2).as("k2"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
             |  json_extract_string(props, '$.missing') AS missing,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k2
             |FROM events ORDER BY event_id""".stripMargin)),

    // F7 hash battery: md5 / sha256 content addressing (the engine's
    // deterministic replacement for the reference's md5(urandom) keys, S5).
    QueryDef(
      "f_hash_battery",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            md5(col("text").cast("binary")).as("h_md5"),
            sha2(col("text").cast("binary"), 256).as("h_sha256"),
            substring(md5(col("text").cast("binary")), 1, 4).as("bucket"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256,
             |  substr(md5(text), 1, 4) AS bucket
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // String battery 2: translate, repeat, instr, left/right, char-trim,
    // split_part.
    QueryDef(
      "f_string_battery2",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            translate(col("p_name"), "aeiou", "01234").as("leet"),
            repeat(substring(col("p_brand"), 1, 2), 2).as("rep"),
            instr(col("p_name"), "id").as("pos_id"),
            expr("left(p_name, 3)").as("l3"),
            expr("right(p_name, 3)").as("r3"),
            trim(col("p_type"), "PE").as("trimmed"),
            expr("split_part(p_name, ' ', 2)").as("word2"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  translate(p_name, 'aeiou', '01234') AS leet,
             |  repeat(substr(p_brand, 1, 2), 2) AS rep,
             |  strpos(p_name, 'id') AS pos_id,
             |  left(p_name, 3) AS l3,
             |  right(p_name, 3) AS r3,
             |  trim(p_type, 'PE') AS trimmed,
             |  split_part(p_name, ' ', 2) AS word2
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Date battery 2: last_day, quarter, ISO week, add_months (both engines
    // clamp month-end), fixed-day offsets.
    QueryDef(
      "f_date_battery2",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            last_day(col("o_orderdate")).as("month_end"),
            quarter(col("o_orderdate")).as("q"),
            weekofyear(col("o_orderdate")).as("iso_week"),
            add_months(col("o_orderdate"), 2).as("plus2mo"),
            date_add(col("o_orderdate").cast("date"), 30).as("plus30d"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |  quarter(o_orderdate) AS q,
             |  weekofyear(o_orderdate) AS iso_week,
             |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2mo,
             |  CAST(o_orderdate AS DATE) + 30 AS plus30d
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Array battery 2: sort, position, contains, overlap, zip_with sum.
    QueryDef(
      "f_array_battery2",
      (s, d) => {
        val head4 = transform(slice(col("embedding"), 1, 4), x => x.cast("double"))
        val next4 = transform(slice(col("embedding"), 3, 4), x => x.cast("double"))
        val sorted4 = sort_array(head4)
        Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            // Element-wise scalar columns instead of the raw array: the
            // driver's pandas compare can't hash array cells, and casting
            // doubles to strings formats differently across engines.
            round(element_at(sorted4, 1), 6).as("srt1"),
            round(element_at(sorted4, 2), 6).as("srt2"),
            round(element_at(sorted4, 3), 6).as("srt3"),
            round(element_at(sorted4, 4), 6).as("srt4"),
            array_position(head4, element_at(head4, 2)).as("pos_of_2nd"),
            array_contains(head4, element_at(head4, 1)).as("has_1st"),
            arrays_overlap(head4, next4).as("overlaps"),
            round(aggregate(zip_with(head4, next4, (a, b) => a + b),
              lit(0.0), (acc, x) => acc + x), 6).as("zip_sum"))
          .orderBy("vec_id")
      },
      Some("""WITH t AS (SELECT vec_id,
             |    list_transform(list_slice(embedding, 1, 4), x -> CAST(x AS DOUBLE)) h4,
             |    list_transform(list_slice(embedding, 3, 6), x -> CAST(x AS DOUBLE)) n4
             |  FROM embeddings)
             |SELECT vec_id,
             |  round(list_sort(h4)[1], 6) AS srt1,
             |  round(list_sort(h4)[2], 6) AS srt2,
             |  round(list_sort(h4)[3], 6) AS srt3,
             |  round(list_sort(h4)[4], 6) AS srt4,
             |  list_position(h4, h4[2]) AS pos_of_2nd,
             |  list_contains(h4, h4[1]) AS has_1st,
             |  len(list_intersect(h4, n4)) > 0 AS overlaps,
             |  round(list_sum(list_transform(range(1, 5), i -> h4[i] + n4[i])), 6)
             |    AS zip_sum
             |FROM t ORDER BY vec_id""".stripMargin)),

    // G1 generator surface: posexplode over an array (the vertex-flatten
    // shape, script_geo.py:146-154, with position identity kept).
    QueryDef(
      "g1_posexplode",
      (s, d) =>
        Tables.embeddings(s, d)
          .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)))
          .select(col("vec_id"), (col("pos") + 1).as("pos"),
            col("col").cast("double").as("v"))
          .orderBy("vec_id", "pos"),
      Some("""SELECT vec_id,
             |  generate_subscripts(list_slice(embedding, 1, 4), 1) AS pos,
             |  CAST(unnest(list_slice(embedding, 1, 4)) AS DOUBLE) AS v
             |FROM embeddings ORDER BY vec_id, pos""".stripMargin)),

    // P5 typed dispatch as an explicit CASE (replacing the reference's
    // exception-driven JPEG/GeoTIFF branch, script_geo.py:166-189).
    QueryDef(
      "f_case_dispatch",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            when(col("p_type") === "PROMO", lit("promo"))
              .when(col("p_size") < 10, lit("small"))
              .otherwise(lit("std")).as("klass"))
          .groupBy("klass")
          .agg(count(lit(1)).as("n"))
          .orderBy("klass"),
      Some("""SELECT CASE WHEN p_type = 'PROMO' THEN 'promo'
             |            WHEN p_size < 10 THEN 'small'
             |            ELSE 'std' END AS klass, COUNT(*) AS n
             |FROM part GROUP BY 1 ORDER BY klass""".stripMargin))
  )
}
