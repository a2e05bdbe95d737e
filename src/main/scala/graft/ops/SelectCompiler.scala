package graft.ops

import com.fasterxml.jackson.databind.JsonNode
import graft.config.Json._
import graft.expr.{ExprCompiler, FilterCompiler}
import graft.schema.SchemaMapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles the reference's `select` DSL to Catalyst columns
  * (mercari/pipeline `util/pipeline/select/SelectFunction.java`).
  *
  * Each select step sees the outputs of prior steps
  * (`SelectFunction.java:213-234`) — we realize that by folding
  * `withColumn` over the steps, then projecting the declared output
  * names in order. Every function compiles to a codegen-friendly
  * `Column`; only genuinely imperative funcs (bytes_encode/decode)
  * use a UDF.
  *
  * Func inference when `func` is omitted follows
  * `SelectFunction.java:96-127`: bare name → pass; field+type → cast;
  * field → rename; value+type → constant; expression/text/fields keys
  * select their funcs.
  */
object SelectCompiler {

  /** Int8 embedding quantization: array<float> → struct(scale:
    * double, q: array<tinyint>) with q = round(v / scale), scale =
    * max|v| / 127 — a 4x memory cut for ANN/dedup indexes
    * (reconstruction error ≤ scale/2 per element). ONE formula shared
    * by the `quantize` select func and the similarity module's
    * `quantized: true` index, so the q102/q105 oracles replay both.
    * The scale subtree must NOT appear inside a per-element lambda
    * (higher-order lambdas re-evaluate free subtrees per element →
    * O(d²) per row); array_repeat evaluates it once per row and
    * zip_with binds it as an element. */
  def quantizeCol(c: Column): Column = {
    val maxabs = array_max(transform(c, v => abs(v.cast(DoubleType))))
    val scale = maxabs / lit(127.0)
    val scaleArr = array_repeat(scale, size(c))
    struct(
      scale.as("scale"),
      when(maxabs === 0d,
        transform(c, _ => lit(0).cast(ByteType)))
        .otherwise(zip_with(c, scaleArr, (v, s2) =>
          round(v.cast(DoubleType) / s2).cast(ByteType)))
        .as("q"))
  }

  /** Inverse: struct(scale, q) → array<float> (v ≈ q * scale). Same
    * lambda-hoist as [[quantizeCol]]: CollapseProject can inline the
    * whole upstream quantize expression into `c`, so a per-element
    * c.getField("scale") would re-run its array_max scan per element
    * — array_repeat evaluates it once per row instead. */
  def dequantizeCol(c: Column): Column = {
    val q = c.getField("q")
    zip_with(q, array_repeat(c.getField("scale"), size(q)),
      (v, s2) => (v.cast(DoubleType) * s2).cast(FloatType))
  }

  /** Apply a select config (JSON array) to a DataFrame (lenient:
    * lossy steps null out, reference legacy semantics). */
  def apply(df: DataFrame, selects: JsonNode): DataFrame = {
    val f = fold(df, selects, withErrors = false)
    if (f.outNames.isEmpty) df else f.cur.select(f.outNames.map(col): _*)
  }

  /** §2.11 error routing (reference `module/MErrorHandler`/`MFailure`
    * from the Select stage): rows where a lossy step — explicit or
    * inferred `cast`, `expression` with an output type, `bytes_decode`
    * — nulls out a non-null input split off to a failures frame
    * carrying the INPUT columns plus `__error` (first failing step's
    * message). Error predicates and overwritten input columns
    * MATERIALIZE inside the fold before each replacement, so in-place
    * conversions (step name == source field) are detected against the
    * original value and failures carry the pre-conversion inputs. */
  def applyWithFailures(df: DataFrame, selects: JsonNode)
      : (DataFrame, DataFrame) = {
    val f = fold(df, selects, withErrors = true)
    def emptyFailures = df.withColumn("__error", lit(null: String))
      .filter(lit(false))
    if (f.outNames.isEmpty) return (df, emptyFailures)
    if (f.errCols.isEmpty)
      return (f.cur.select(f.outNames.map(col): _*), emptyFailures)
    val err = coalesce(f.errCols.map(col): _*)
    val tagged = f.cur.withColumn("__error", err)
    (tagged.filter(col("__error").isNull)
      .select(f.outNames.map(col): _*),
      tagged.filter(col("__error").isNotNull)
        .select(df.columns.toSeq.map(n =>
          col(f.stashed.getOrElse(n, n)).as(n)) :+ col("__error"): _*))
  }

  /** failFast: any lossy-step error raises instead of routing. */
  def applyFailFast(df: DataFrame, selects: JsonNode): DataFrame = {
    val f = fold(df, selects, withErrors = true)
    if (f.outNames.isEmpty) return df
    if (f.errCols.isEmpty) return f.cur.select(f.outNames.map(col): _*)
    val err = coalesce(f.errCols.map(col): _*)
    // the raise must live inside a selected column or Catalyst
    // prunes it away (same trick as deserialize failFast)
    val head = when(err.isNotNull, raise_error(err))
      .otherwise(col(f.outNames.head)).as(f.outNames.head)
    f.cur.select(head +: f.outNames.tail.map(col): _*)
  }

  private case class Folded(cur: DataFrame, outNames: Seq[String],
      errCols: Seq[String], stashed: Map[String, String])

  private def fold(df: DataFrame, selects: JsonNode,
      withErrors: Boolean): Folded = {
    if (selects == null || !selects.isArray || selects.isEmpty)
      return Folded(df, Seq.empty, Seq.empty, Map.empty)
    var cur = df
    val outNames = Vector.newBuilder[String]
    val errCols = Vector.newBuilder[String]
    val stashed = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    selects.elems.foreach { sel =>
      if (!sel.bool("ignore").getOrElse(false)) {
        val name = sel.str("name").getOrElse(
          throw new IllegalArgumentException(s"select requires name: $sel"))
        val c = compileField(sel, cur.schema)
        if (withErrors) {
          // the error predicate references the step's SOURCE columns:
          // materialize it before the replacement below so an
          // in-place conversion still sees the original value
          stepError(sel, cur.schema, c).foreach { e =>
            val ec = s"__err_$i"; i += 1
            cur = cur.withColumn(ec, e)
            errCols += ec
          }
          // first overwrite of an input column: stash the original
          // for the failures projection
          if (df.columns.contains(name) && !stashed.contains(name)) {
            val sc = s"__orig_$name"
            cur = cur.withColumn(sc, col(name))
            stashed(name) = sc
          }
        }
        cur = cur.withColumn(name, c)
        outNames += name
      }
    }
    Folded(cur, outNames.result().distinct, errCols.result(),
      stashed.toMap)
  }

  /** Error message Column for a lossy step, null when the row is fine.
    * Detection is null-out under ANSI-off semantics: the source value
    * is non-null but the converted result is null. */
  private def stepError(sel: JsonNode, schema: StructType,
      result: Column): Option[Column] = {
    val name = sel.str("name").get
    def field = sel.str("field").getOrElse(name)
    def msg(kind: String, src: Column): Column =
      when(src.isNotNull && result.isNull,
        concat(lit(s"$kind failed for $name: value="),
          src.cast(StringType)))
    inferFunc(sel) match {
      case "cast" =>
        Some(msg(s"cast to ${sel.str("type").get}", col(field)))
      case "expression" if sel.str("type").isDefined =>
        // only the output cast is lossy; the expression itself may
        // produce legitimate nulls
        val pre = ExprCompiler.toNullable(
          ExprCompiler.compile(sel.str("expression").get, schema))
        Some(when(pre.isNotNull && result.isNull,
          lit(s"cast to ${sel.str("type").get} failed for $name")))
      case "bytes_decode" =>
        Some(msg(s"bytes_decode to ${sel.str("type").getOrElse("string")}",
          col(field)))
      case _ => None
    }
  }

  def inferFunc(sel: JsonNode): String =
    sel.str("func").orElse(sel.str("op")).getOrElse {
      if (sel.names.filterNot(_ == "ignore").size == 1) "pass"
      else if (sel("field").isDefined && sel("type").isDefined) "cast"
      else if (sel("field").isDefined) "rename"
      else if (sel("value").isDefined && sel("type").isDefined) "constant"
      // bare {name, type} → cast of the name field (reference requires
      // size==2 here — a type key NEXT TO expression/text is an output
      // cast, not a cast func: SelectFunction.java:115)
      else if (sel("type").isDefined &&
        sel.names.filterNot(_ == "ignore").size == 2) "cast"
      else if (sel("expression").isDefined) "expression"
      else if (sel("text").isDefined) "text"
      else if (sel("fields").isDefined) "struct"
      else throw new IllegalArgumentException(s"select needs func: $sel")
    }

  /** One select step → Column (schema = all visible columns). */
  def compileField(sel: JsonNode, schema: StructType): Column = {
    val name = sel.str("name").get
    def field = sel.str("field").getOrElse(name)
    inferFunc(sel) match {
      case "pass" => col(name)
      case "rename" => col(field)
      case "cast" =>
        col(field).cast(SchemaMapper.baseType(sel.str("type").get, sel))
      case "constant" =>
        val dt = SchemaMapper.baseType(sel.str("type").get, sel)
        lit(sel("value").map(_.asText).orNull).cast(dt)
      case "expression" =>
        val c = ExprCompiler.toNullable(
          ExprCompiler.compile(sel.str("expression").get, schema))
        sel.str("type").map(t => c.cast(SchemaMapper.baseType(t, sel)))
          .getOrElse(c)
      case "concat" =>
        // array-typed fields join element-wise (concat_ws semantics);
        // scalars cast to string
        val delim = sel.str("delimiter").getOrElse("")
        concat_ws(delim,
          sel.strArr("fields").map { f =>
            schema.find(_.name == f).map(_.dataType) match {
              case Some(_: ArrayType) => col(f).cast(ArrayType(StringType))
              case _ => col(f).cast(StringType)
            }
          }: _*)
      case "nullif" =>
        val cond = FilterCompiler.compile(sel("condition").orNull, schema)
        when(!coalesce(cond, lit(false)), col(field))
      case "uuid" => expr("uuid()")
      // parity-plus curation funcs: unicode canonicalization (NFC
      // default; strip_accents = NFD + drop combining marks) as a
      // codegen'd native expression
      case "normalize" =>
        val form = sel.str("form").getOrElse("NFC").toUpperCase
        if (form == "STRIP_ACCENTS")
          org.apache.spark.sql.graft.TextExpressions
            .normalize(col(field), "NFD", strip = true)
        else org.apache.spark.sql.graft.TextExpressions
          .normalize(col(field), form,
            strip = sel.bool("stripMarks").getOrElse(false))
      // estimate of a DataSketches HLL sketch column (see the
      // hll_sketch / hll_union aggregation ops)
      case "hll_estimate" => hll_sketch_estimate(col(field))
      // estimate of a frequent-items sketch column (see the
      // top_k_accumulate / top_k_combine aggregation ops)
      case "top_k_estimate" =>
        call_function("approx_top_k_estimate", col(field),
          lit(sel.int("k").getOrElse(5)))
      // quantile of a binary KLL sketch column (see the kll_sketch /
      // kll_merge aggregation ops); `fraction` in [0, 1]
      case "kll_quantile" =>
        val fr = sel.dbl("fraction").orElse(sel.dbl("percentile"))
          .getOrElse(0.5)
        require(fr >= 0.0 && fr <= 1.0,
          s"select $name: kll_quantile fraction must be in [0, 1], " +
            s"got $fr")
        graft.functions.KllFunctions.kllQuantile(col(field), fr)
      // inverse quantile: the fraction of sketched values <= `value`
      // (exact count(x <= v)/n while the sketch is exact)
      case "kll_rank" =>
        val v = sel.dbl("value").getOrElse(
          throw new IllegalArgumentException(
            s"select $name: kll_rank needs a numeric `value`"))
        graft.functions.KllFunctions.kllRank(col(field), v)
      // set algebra over binary theta sketch columns (see the
      // theta_sketch / theta_union aggregation ops): distinct-count
      // estimate of one sketch, or intersection/difference estimates
      // BETWEEN two sketches — cross-corpus overlap without shuffling
      // raw sets
      case "theta_estimate" =>
        graft.functions.ThetaFunctions.thetaEstimate(col(field))
      case "theta_intersect" =>
        val fs = sel.strArr("fields")
        require(fs.size == 2,
          s"select $name: theta_intersect needs fields: [a, b]")
        graft.functions.ThetaFunctions
          .thetaIntersect(col(fs(0)), col(fs(1)))
      case "theta_difference" =>
        val fs = sel.strArr("fields")
        require(fs.size == 2,
          s"select $name: theta_difference needs fields: [a, b]")
        graft.functions.ThetaFunctions
          .thetaDifference(col(fs(0)), col(fs(1)))
      // point-frequency estimate from a binary count-min sketch
      // column (see the cms_sketch / cms_merge aggregation ops):
      // fields: [sketch, value]. The probe value is normalized
      // exactly like the build side (SketchNorm), so int and double
      // columns of the same logical values agree.
      case "cms_estimate" =>
        val fs = sel.strArr("fields")
        require(fs.size == 2,
          s"select $name: cms_estimate needs fields: [sketch, value]")
        val vdt = graft.functions.SketchNorm.resolveType(schema, fs(1))
        graft.functions.CmsFunctions.cmsEstimate(col(fs(0)),
          graft.functions.SketchNorm.normalize(vdt, col(fs(1))))
      // URL decomposition for crawl curation (host-keyed dedup, TLD
      // filters, path heuristics): Spark's codegen'd parse_url.
      // `part`: host | path | query | protocol | ref | authority |
      // file | userinfo — or a query parameter via `key`.
      case "url" =>
        val part = sel.str("part").getOrElse("host")
          .toUpperCase(java.util.Locale.ROOT)
        require(Set("HOST", "PATH", "QUERY", "PROTOCOL", "REF",
          "AUTHORITY", "FILE", "USERINFO")(part),
          s"select $name: url part '$part' (valid: host, path, " +
            "query, protocol, ref, authority, file, userinfo)")
        sel.str("key") match {
          case Some(k) =>
            require(part == "QUERY",
              s"select $name: url key= only applies to part: query")
            parse_url(col(field), lit(part), lit(k))
          case None => parse_url(col(field), lit(part))
        }
      // int8 embedding quantization + inverse (see quantizeCol /
      // dequantizeCol — formula shared with the similarity module's
      // quantized index, replayed by the q102/q105 oracles)
      case "quantize" => quantizeCol(col(field))
      case "dequantize" => dequantizeCol(col(field))
      // deterministic dataset split assignment (train/val/test …):
      // the row's md5-uniform (same machinery as the sample module,
      // so splits are reproducible, partition-independent, and
      // replayable by any engine) maps to the first label whose
      // cumulative ratio covers it. `ratios` is an ordered
      // {label: weight} object (weights normalized); `fields` form
      // the key, optional `salt` decorrelates independent splits.
      case "split" =>
        val ratios = sel("ratios").getOrElse(
          throw new IllegalArgumentException(
            s"select $name: split needs ratios {label: weight, ...}"))
        val labels = ratios.names
        require(labels.nonEmpty, s"select $name: ratios is empty")
        val weights = labels.map(l => ratios.dbl(l).getOrElse(
          throw new IllegalArgumentException(
            s"select $name: ratio $l must be numeric")))
        require(weights.forall(_ >= 0) && weights.sum > 0,
          s"select $name: ratios must be non-negative, sum positive")
        val keyFields = {
          val fs = sel.strArr("fields")
          if (fs.nonEmpty) fs else Seq(field)
        }
        val keyParts = sel.str("salt").map(s => lit(s) :: Nil)
          .getOrElse(Nil) ++ keyFields.map(f =>
            coalesce(col(f).cast(StringType), lit("")))
        val bucket =
          substring(md5(concat_ws("#", keyParts: _*)), 1, 8)
        val total = weights.sum
        val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
        // the sample module's hex-threshold encoding: equal-length
        // lowercase hex compares like the number it encodes
        labels.init.zip(cum.init).foldRight(
          lit(labels.last): Column) { case ((l, c), acc) =>
          when(bucket < lit(
            graft.operators.SampleTransform.thresholdHex(c)), lit(l))
            .otherwise(acc)
        }
      // edit distance between two string fields (fuzzy matching /
      // curation QA); optional threshold caps the scan per pair
      // (returns -1 past it, Spark's banded algorithm)
      case "levenshtein" =>
        val fs = sel.strArr("fields")
        require(fs.size == 2,
          s"select $name: levenshtein needs fields: [a, b]")
        sel.int("threshold")
          .map(t => levenshtein(col(fs(0)), col(fs(1)), t))
          .getOrElse(levenshtein(col(fs(0)), col(fs(1))))
      // transposition-tolerant similarity with common-prefix boost —
      // levenshtein's companion metric for fuzzy matching
      case "jaro_winkler" =>
        val fs = sel.strArr("fields")
        require(fs.size == 2,
          s"select $name: jaro_winkler needs fields: [a, b]")
        org.apache.spark.sql.graft.TextExpressions
          .jaroWinkler(col(fs(0)), col(fs(1)))
      case "hash" => hashColumn(sel, schema)
      case "event_timestamp" =>
        if (schema.fieldNames.contains("__event_time")) col("__event_time")
        else current_timestamp()
      case "current_timestamp" => current_timestamp()
      case "struct" => structColumn(sel, schema)
      case "map" =>
        // {fields:[...]}: map keyed by field name
        map(sel.strArr("fields").flatMap(f =>
          Seq(lit(f), col(f).cast(StringType))): _*)
      case "json" =>
        // fields → struct serialization; bare field → serialize an
        // existing map/struct/array column directly
        if (sel("fields").isDefined) to_json(structColumn(sel, schema))
        else to_json(col(field))
      case "json_path" =>
        val p0 = sel.str("path").get
        val p = if (p0.startsWith("$")) p0 else s"$$.$p0"
        get_json_object(col(field).cast(StringType), p)
      case "base64_encode" =>
        val c = schema.find(_.name == field).map(_.dataType) match {
          case Some(BinaryType) => col(field)
          case _ => encode(col(field).cast(StringType), "UTF-8")
        }
        base64(c)
      case "base64_decode" => unbase64(col(field))
      case "bytes_encode" => BytesCodec.encode(col(field),
        schema.find(_.name == field).map(_.dataType).getOrElse(StringType))
      case "bytes_decode" => BytesCodec.decode(col(field),
        sel.str("type").getOrElse("string"))
      case "text" => TemplateCompiler.compile(sel.str("text").get, schema)
      case "panic" =>
        // data assertion: raise on condition match (Panic.java)
        val cond = FilterCompiler.compile(sel("condition").orNull, schema)
        val msg = sel.str("message").getOrElse(s"panic condition met: $name")
        when(coalesce(cond, lit(false)),
          raise_error(lit(msg))).otherwise(lit(true))
      case "switch" =>
        // parity-plus (reference Switch.java is a stub): cases of
        // {when: <filter tree>, value|field}, optional default
        val cases = sel.arrOf("cases")
        val base: Column = sel("default")
          .map(d => lit(scalar(d))).getOrElse(lit(null))
        cases.foldRight(base) { (cs, acc) =>
          val cond = FilterCompiler.compile(
            cs("when").orElse(cs("condition")).orNull, schema)
          val v = cs.str("field").map(col)
            .getOrElse(lit(cs("value").map(scalar).orNull))
          when(coalesce(cond, lit(false)), v).otherwise(acc)
        }
      case "http" =>
        // per-row call of a url field or ${...} template (Http.java);
        // method/headers/body ride the full Client.send surface
        val url = sel.str("text").orElse(sel.str("url")) match {
          case Some(t) => TemplateCompiler.compile(t, schema)
          case None => col(field).cast(StringType)
        }
        val timeout = sel.int("timeoutMillis").getOrElse(10000)
        val method = sel.str("method").getOrElse("GET")
        val headerNode = sel("headers")
        val bodyTmpl = sel.str("body")
        if (method == "GET" && headerNode.isEmpty && bodyTmpl.isEmpty)
          HttpFunctions.httpGet(url, timeout)
        else {
          val headersCol: Column = headerNode match {
            case Some(h) if h.names.nonEmpty =>
              map(h.names.flatMap(k => Seq(lit(k),
                TemplateCompiler.compile(h.str(k).get, schema))): _*)
            case _ => map()
          }
          val bodyCol = bodyTmpl.map(TemplateCompiler.compile(_, schema))
            .getOrElse(lit(""))
          val c = HttpFunctions.client // capture at plan time
          val m = method
          val f = udf { (u: String, hs: Map[String, String], b: String) =>
            if (u == null) null
            else try new String(c.send(m, u,
              if (hs == null) Map.empty[String, String] else hs,
              b, timeout).body, "UTF-8")
            catch {
              // task kill interrupts must propagate (see
              // HttpFunctions.callWithRetry) — swallowing one keeps a
              // killed task issuing requests for the whole partition
              case e: InterruptedException => throw e
              case e: Exception => s"__error:${e.getMessage}"
            }
          }.asNondeterministic()
          f(url, headersCol, bodyCol)
        }
      case "scrape" =>
        // reference Scrape.java: jsoup selector + mode + attribute +
        // post-pattern. With a selector → ScrapeFunctions (CSS-subset
        // matcher); nested `fields` → struct output per element; bare
        // `pattern` keeps the codegen'd regex extract.
        sel.str("selector") match {
          case Some(selector) if sel.arrOf("fields").nonEmpty =>
            ScrapeFunctions.scrapeStruct(col(field).cast(StringType),
              ScrapeFunctions.parseSpec(sel))
          case Some(selector) =>
            ScrapeFunctions.scrape(col(field).cast(StringType), selector,
              sel.str("attribute"), sel.str("pattern"),
              sel.int("group").getOrElse(1),
              sel.str("mode").exists(_.equalsIgnoreCase("repeated")),
              sel.bool("trim").getOrElse(true))
          case None =>
            val pattern = sel.str("pattern").getOrElse(
              throw new IllegalArgumentException(
                "scrape requires pattern or selector"))
            // honor group/mode like the selector branch: default
            // group = 1 when the pattern captures, 0 (whole match)
            // otherwise — a hardcoded 1 raised "group count is 0"
            // on capture-free patterns
            val groups = java.util.regex.Pattern.compile(pattern)
              .matcher("").groupCount()
            val g = sel.int("group").getOrElse(math.min(groups, 1))
            if (sel.str("mode").exists(_.equalsIgnoreCase("repeated")))
              regexp_extract_all(col(field).cast(StringType),
                lit(pattern), lit(g))
            else regexp_extract(col(field).cast(StringType), pattern, g)
        }
      case "reshape" =>
        // array reshape (Reshape.java): shape [d1, ..., dk] nests a
        // flat array one level per trailing dimension (the leading
        // dim is derived from the data, numpy-style -1); shape [-1]
        // flattens one level
        val shape = sel.arrOf("shape").map(_.asInt)
        def chunk(c: Column, width: Int): Column =
          transform(
            sequence(lit(0), ((size(c) - 1) / width).cast(IntegerType)),
            i => slice(c, i * width + 1, lit(width)))
        shape match {
          case Seq(-1) => flatten(col(field))
          case dims if dims.length >= 2 && dims.tail.forall(_ > 0) =>
            // innermost dimension first: [2,3,4] → chunk(4) then
            // chunk(3); the outer count falls out of the data
            dims.tail.reverse.foldLeft(col(field))(chunk)
          case other => throw new IllegalArgumentException(
            s"reshape shape: $other (expected [-1] or [d1, ..., dk] " +
              "with positive trailing dims)")
        }
      case "generate" =>
        sel.str("type").getOrElse("uuid") match {
          case "uuid" => expr("uuid()")
          case "random" | "float64" | "double" => rand()
          case "int64" | "long" =>
            (rand() * lit(Long.MaxValue)).cast(LongType)
          case other =>
            throw new IllegalArgumentException(s"generate type: $other")
        }
      case other =>
        throw new IllegalArgumentException(s"unknown select func: $other")
    }
  }

  /** hash func (Hash.java): md5 / SHA-n over fields/text, hex output,
    * optional truncation to `size` chars. */
  private def hashColumn(sel: JsonNode, schema: StructType): Column = {
    val input: Column = sel.str("text") match {
      case Some(t) => TemplateCompiler.compile(t, schema)
      case None =>
        val fs = sel.str("field").map(Seq(_)).getOrElse(sel.strArr("fields"))
        val delim = sel.str("delimiter").getOrElse("")
        concat_ws(delim, fs.map(f => col(f).cast(StringType)): _*)
    }
    val salted = sel.str("secret") match {
      case Some(s) => concat(input, lit(s))
      case None => input
    }
    val algo = sel.str("algorithm").getOrElse("SHA-256").toUpperCase(java.util.Locale.ROOT)
    val hashed = algo match {
      case "MD5" => md5(salted.cast(BinaryType))
      case "SHA-1" | "SHA1" => sha1(salted.cast(BinaryType))
      case "SHA-256" | "SHA256" => sha2(salted.cast(BinaryType), 256)
      case "SHA-384" | "SHA384" => sha2(salted.cast(BinaryType), 384)
      case "SHA-512" | "SHA512" => sha2(salted.cast(BinaryType), 512)
      case other =>
        throw new IllegalArgumentException(s"hash algorithm: $other")
    }
    sel.int("size").map(s => substring(hashed, 1, s)).getOrElse(hashed)
  }

  /** struct func (Struct.java): nested sub-select or plain field list;
    * mode=repeated + each → array of struct via transform(). */
  private def structColumn(sel: JsonNode, schema: StructType): Column = {
    val fields = sel.arrOf("fields")
    val cols = fields.map { f =>
      if (f.isTextual) col(f.asText).as(f.asText)
      else {
        val n = f.str("name").get
        compileField(f, schema).as(n)
      }
    }
    struct(cols: _*)
  }
}
