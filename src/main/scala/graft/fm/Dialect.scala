package graft.fm

import org.apache.spark.sql.SparkSession

/** DuckDB-dialect compatibility for the SQL passthrough surface the
  * reference declares (SURVEY.md §2 B10–B12):
  *
  *  - `FROM t, UNNEST(expr) AS a(c)` → `FROM t LATERAL VIEW explode(expr)
  *    a AS c` (Spark SQL has no FROM-position UNNEST; reference idiom at
  *    README.md:304-310, `tests/test_query.py:127-130`);
  *  - `from_json(x, '["VARCHAR"]')` DuckDB schema hints → Spark DDL type
  *    strings (`docs/adr/0006:26-36`);
  *  - `list_contains` → `array_contains` (`tests/test_query.py:98`),
  *    `string_split` → `split`, registered as function aliases;
  *  - long-tail constructs the reference's verbatim passthrough
  *    (`query.py:72`) grants but Spark SQL lacks: `QUALIFY pred` →
  *    window-in-subquery + filter, the `* EXCLUDE (...)` star modifier →
  *    Spark's `* EXCEPT (...)`, `* REPLACE (expr AS col)` → EXCEPT +
  *    re-projection, and list comprehensions `[e FOR x IN l IF p]` →
  *    `transform`/`filter` higher-order functions. (`WITH RECURSIVE`
  *    needs no rewrite — Spark 4 parses it natively.)
  */
object Dialect {

  /** Register DuckDB-named function aliases on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "list_contains", exprs => ArrayContains(exprs(0), exprs(1)), "built-in")
    // DuckDB's separator is a LITERAL; Spark's split() takes a regex —
    // literal separators are Pattern.quote'd (r12; '.' and '|' now split
    // correctly), non-literal ones keep regex behavior.
    reg.createOrReplaceTempFunction(
      "string_split", exprs => duckStringSplit(exprs), "built-in")
    // DuckDB's len(): LIST element count, character length otherwise —
    // type-branched after resolution (the files table's own arrays are
    // JSON-encoded strings per ADR-0006; real LISTs reach len() via the
    // series functions and split results).
    reg.createOrReplaceTempFunction(
      "len", exprs => DuckLen(exprs(0)), "built-in")
    // DuckDB regexp_matches is a PARTIAL match (find), like Spark's
    // rlike; the optional third flags argument maps to an inline-flag
    // prefix ('i' — 'g'/'c' are no-ops for a boolean match; anything
    // else fails loudly).
    def withInlineFlags(re: Expression, flags: Expression): Expression =
      flags match {
        case Literal(f, StringType) if f != null =>
          f.toString.find(c => !"igc".contains(c)).foreach(c =>
            throw new IllegalArgumentException(
              s"unsupported regexp flag '$c' (supported: i, g, c)"))
          if (f.toString.contains('i')) Concat(Seq(Literal("(?i)"), re)) else re
        case other => throw new IllegalArgumentException(
          s"regexp flags must be a string literal, got: $other")
      }
    reg.createOrReplaceTempFunction(
      "regexp_matches", exprs =>
        if (exprs.length >= 3) RLike(exprs(0), withInlineFlags(exprs(1), exprs(2)))
        else RLike(exprs(0), exprs(1)), "built-in")
    // DuckDB list → string; Spark spells it array_join (both skip NULL
    // elements when no null-replacement is given) — with one divergence
    // the differential fuzzer caught: DuckDB's array_to_string has
    // string_agg semantics, so a list with NO non-null elements yields
    // NULL (verified on v1.0.0: array_to_string([], '|') IS NULL),
    // where array_join yields ''. A list of empty strings still joins
    // to '' in both.
    reg.createOrReplaceTempFunction(
      "array_to_string", exprs => {
        val lv = UnresolvedNamedLambdaVariable(Seq("__graft_x"))
        val anyNonNull =
          ArrayExists(exprs(0), LambdaFunction(IsNotNull(lv), Seq(lv)))
        If(anyNonNull, ArrayJoin(exprs(0), exprs(1), None), Literal(null))
      }, "built-in")
    // DuckDB list_* family → Spark higher-order/array functions. The
    // lambda-taking pair resolves fine through an alias: the parser
    // builds the LambdaFunction argument before function resolution, and
    // ResolveLambdaVariables keys on the HigherOrderFunction node, not
    // the name.
    reg.createOrReplaceTempFunction(
      "list_transform", exprs => ArrayTransform(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "list_filter", exprs => ArrayFilter(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "list_distinct", exprs => ArrayDistinct(exprs(0)), "built-in")
    // list_sort lives in registerFnParity (NULLS-LAST default + the
    // 2/3-argument order forms, r12)
    // DuckDB strftime(ts, fmt) → date_format with the %-codes translated
    // to a java pattern at resolution time. The format must be a literal
    // (it always is in real queries); a non-literal or an unsupported
    // %-code throws with a precise message instead of mis-formatting.
    reg.createOrReplaceTempFunction(
      "strftime", exprs => {
        val fmt = exprs(1) match {
          case Literal(s, _) if s != null => strftimeToJava(s.toString)
          case other => throw new IllegalArgumentException(
            s"strftime format must be a string literal, got: $other")
        }
        DateFormatClass(exprs(0), Literal(fmt))
      }, "built-in")
    // strptime is strftime's inverse — same %-code table, Spark's
    // to_timestamp underneath.
    reg.createOrReplaceTempFunction(
      "strptime", exprs => {
        val fmt = exprs(1) match {
          case Literal(s, _) if s != null => strftimeToJava(s.toString)
          case other => throw new IllegalArgumentException(
            s"strptime format must be a string literal, got: $other")
        }
        new ParseToTimestamp(exprs(0), Literal(fmt))
      }, "built-in")
    // DuckDB arg_max/arg_min are Spark's max_by/min_by with one twist:
    // DuckDB also skips rows whose VALUE argument is NULL (verified on
    // v1.0.0: arg_min over (NULL,1),('b',2) returns 'b'), while Spark's
    // min_by returns the possibly-NULL value of the winning row. NULLing
    // the ordering key where the value is NULL makes Spark skip those
    // rows too (both engines ignore NULL ordering keys). Callers must
    // keep the ordering key UNIQUE for a deterministic pick — true in
    // both engines.
    def skipNullValues(v: Expression, k: Expression): Expression =
      If(IsNull(v), Literal(null), k)
    reg.createOrReplaceTempFunction(
      "arg_max",
      exprs => aggregate.MaxBy(exprs(0), skipNullValues(exprs(0), exprs(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      "arg_min",
      exprs => aggregate.MinBy(exprs(0), skipNullValues(exprs(0), exprs(1))),
      "built-in")
    // DuckDB epoch_us/epoch_ms → Spark unix_micros/unix_millis.
    reg.createOrReplaceTempFunction(
      "epoch_us", exprs => UnixMicros(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "epoch_ms", exprs => UnixMillis(exprs(0)), "built-in")
    // DuckDB starts_with/ends_with (and the prefix/suffix aliases) →
    // Spark's startswith/endswith predicates.
    reg.createOrReplaceTempFunction(
      "starts_with", exprs => StartsWith(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "ends_with", exprs => EndsWith(exprs(0), exprs(1)), "built-in")
    // DuckDB strpos(s, sub) = 1-based position of the first occurrence,
    // 0 when absent — exactly Spark's instr.
    reg.createOrReplaceTempFunction(
      "strpos", exprs => StringInstr(exprs(0), exprs(1)), "built-in")
    // Map/struct manipulation family. Lookup functions use MODERN DuckDB
    // semantics (scalar value, NULL when absent — DuckDB 1.1+ and Spark
    // agree); DuckDB 1.0 returned a single-element LIST from map
    // indexing/map_extract/element_at, a wart later versions removed —
    // that historical shape is NOT replicated. map_keys/map_values/
    // map_entries/cardinality need no alias (same names natively);
    // element_at's DuckDB try-semantics override lives in
    // [[registerOverrides]] (it collides with a Spark builtin).
    // NullabilityGuard on the collection operand: ElementAt over a
    // literal CreateArray with a constant in-bounds index mis-computes
    // nullable=false while its codegen still assigns ev.isNull — the
    // generated class fails to compile and every row silently pays the
    // interpreted-projection fallback (see GuardExpressions.scala).
    reg.createOrReplaceTempFunction(
      "map_extract", exprs =>
        ElementAt(NullabilityGuard(exprs(0)), exprs(1), None, false), "built-in")
    reg.createOrReplaceTempFunction(
      "struct_extract", exprs =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
          exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "prefix", exprs => StartsWith(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "suffix", exprs => EndsWith(exprs(0), exprs(1)), "built-in")
    // Distributional aggregates + series generators (DuckDB names Spark
    // lacks — `mode` needs no alias, Spark's builtin has DuckDB's
    // semantics modulo the scan-order tie-break both engines leave
    // unspecified; `median` is an OVERRIDE, see [[registerOverrides]]).
    reg.createOrReplaceTempFunction(
      "quantile_cont", exprs => DuckQuantileCont(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "quantile_disc", exprs => DuckQuantileDisc(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "quantile", exprs => DuckQuantileDisc(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "histogram", exprs => DuckHistogram(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "product", exprs => DuckProduct(exprs(0)), "built-in")
    // r12 aggregate-parity batch: Shannon entropy and exact MAD from
    // the same counts-map machinery; Kahan-named fsum/favg map to the
    // plain reductions (callers keep the exact-decimal discipline);
    // `list` collects in scan order like DuckDB; `arbitrary` is DuckDB's
    // first-value-seen.
    reg.createOrReplaceTempFunction(
      "entropy", exprs => DuckEntropy(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "mad", exprs => DuckMad(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "fsum", exprs =>
        aggregate.Sum(Cast(exprs(0), org.apache.spark.sql.types.DoubleType)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "favg", exprs => aggregate.Average(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "list", exprs => aggregate.CollectList(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "arbitrary", exprs => aggregate.First(exprs(0), ignoreNulls = false),
      "built-in")
    reg.createOrReplaceTempFunction(
      "generate_series", exprs => DuckSeries(exprs, exclusive = false), "built-in")
    reg.createOrReplaceTempFunction(
      "range", exprs => DuckSeries(exprs, exclusive = true), "built-in")
    // DuckDB string-similarity family (Spark ships only levenshtein;
    // editdist3 is its DuckDB alias). See StringDistanceExpressions.
    reg.createOrReplaceTempFunction(
      "jaccard", exprs => JaccardSim(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "jaro_similarity", exprs => JaroSim(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "jaro_winkler_similarity",
      exprs => JaroWinklerSim(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "damerau_levenshtein",
      exprs => DamerauLevenshtein(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "hamming", exprs => HammingDist(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "mismatches", exprs => HammingDist(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "editdist3", exprs => Levenshtein(exprs(0), exprs(1)), "built-in")
    // DuckDB list_* reductions: a left fold over the (null-compacted)
    // list — sequential within the row in BOTH engines, so even double
    // sums are order-identical. Empty / all-null lists yield NULL
    // (list_count yields 0), DuckDB-pinned. Built from unresolved
    // lambdas like array_to_string above: registry output runs through
    // full analysis, so coercion picks the fold's accumulator type.
    def foldSum(e: Expression): Expression = {
      val acc = UnresolvedNamedLambdaVariable(Seq("__graft_acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("__graft_x"))
      val compact = ArrayCompact(e)
      If(EqualTo(Size(compact), Literal(0)), Literal(null),
        ArrayAggregate(compact, Cast(Literal(0), LongType),
          LambdaFunction(Add(acc, x), Seq(acc, x)),
          { val id = UnresolvedNamedLambdaVariable(Seq("__graft_id"))
            LambdaFunction(id, Seq(id)) }))
    }
    def foldCount(e: Expression): Expression = Size(ArrayCompact(e))
    reg.createOrReplaceTempFunction("list_sum", exprs => foldSum(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "list_count", exprs => foldCount(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "list_avg", exprs => {
        val cnt = foldCount(exprs(0))
        If(EqualTo(cnt, Literal(0)), Literal(null),
          Divide(Cast(foldSum(exprs(0)), DoubleType), Cast(cnt, DoubleType)))
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "list_min", exprs => ArrayMin(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "list_max", exprs => ArrayMax(exprs(0)), "built-in")
    // list_aggregate(l, 'name'[, arg]) (alias list_aggr): DuckDB binds
    // the NAMED aggregate over the list's elements. The name must be a
    // literal (it always is); the supported set covers the reductions
    // above plus string_agg — anything else fails loudly with the list
    // of supported names.
    def listAggregate(exprs: Seq[Expression]): Expression = {
      val fname = exprs(1) match {
        case Literal(s, StringType) if s != null => s.toString.toLowerCase
        case other => throw new IllegalArgumentException(
          s"list_aggregate function name must be a string literal, got: $other")
      }
      fname match {
        case "sum" => foldSum(exprs(0))
        case "count" => foldCount(exprs(0))
        case "avg" | "mean" =>
          val cnt = foldCount(exprs(0))
          If(EqualTo(cnt, Literal(0)), Literal(null),
            Divide(Cast(foldSum(exprs(0)), DoubleType), Cast(cnt, DoubleType)))
        case "min" => ArrayMin(exprs(0))
        case "max" => ArrayMax(exprs(0))
        case "string_agg" | "listagg" =>
          val sep = if (exprs.length >= 3) exprs(2) else Literal(",")
          val lv = UnresolvedNamedLambdaVariable(Seq("__graft_x"))
          val anyNonNull =
            ArrayExists(exprs(0), LambdaFunction(IsNotNull(lv), Seq(lv)))
          If(anyNonNull, ArrayJoin(exprs(0), sep, None), Literal(null))
        case other => throw new IllegalArgumentException(
          s"list_aggregate: unsupported function '$other' " +
            "(supported: sum, count, avg, min, max, string_agg)")
      }
    }
    reg.createOrReplaceTempFunction(
      "list_aggregate", listAggregate _, "built-in")
    reg.createOrReplaceTempFunction(
      "list_aggr", listAggregate _, "built-in")
    // Scalar parity batch: fmt-style format, accent stripping, first
    // codepoint (ord alias), radix rendering, byte sizes, English
    // day/month names, and origin-aligned time_bucket. See
    // ScalarParityExpressions for the DuckDB-pinned semantics.
    reg.createOrReplaceTempFunction(
      "format", exprs => DuckFormat(exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "strip_accents", exprs => StripAccents(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "unicode", exprs => UnicodeCodepoint(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "ord", exprs => UnicodeCodepoint(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "to_base", exprs => ToBase(exprs(0), exprs(1),
        if (exprs.length >= 3) exprs(2) else Literal(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "format_bytes", exprs => FormatBytes(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "dayname", exprs => DateFormatClass(exprs(0), Literal("EEEE")), "built-in")
    reg.createOrReplaceTempFunction(
      "monthname", exprs => DateFormatClass(exprs(0), Literal("MMMM")), "built-in")
    reg.createOrReplaceTempFunction(
      "time_bucket", exprs => DuckTimeBucket(exprs(0), exprs(1)), "built-in")
    registerFnParity(reg)
  }

  /** Round-12 breadth-parity aliases: the DuckDB-1.0 names the function
    * gap probe (tools/fn_gap_exprs.txt differentially vs
    * tools/fn_gap_duck.py) found missing. Spark-builtin compositions
    * where one exists; FnParityExpressions kernels otherwise. Semantics
    * pinned empirically against DuckDB v1.0.0 — see each group's note.
    */
  private def registerFnParity(
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    def f(name: String)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")
    def litStr(e: Expression, what: String): String = e match {
      case Literal(s, _) if s != null => s.toString
      case other =>
        throw new IllegalArgumentException(s"$what must be a string literal, got: $other")
    }
    // ---- strings ----
    f("to_hex")(e => Hex(e(0)))
    f("from_hex")(e => Unhex(e(0)))
    // DuckDB strlen = BYTE length (strlen('héllo') = 6)
    f("strlen")(e => OctetLength(e(0)))
    f("string_split_regex")(e => StringSplit(e(0), e(1), Literal(-1)))
    f("regexp_split_to_array")(e => StringSplit(e(0), e(1), Literal(-1)))
    f("regexp_full_match")(e =>
      RLike(e(0), Concat(Seq(Literal("^(?:"), e(1), Literal(")$")))))
    f("nfc_normalize")(e => NfcNormalize(e(0)))
    // ---- math ----
    // even: round AWAY from zero to the next even number, DOUBLE out
    f("even") { e =>
      val x = Cast(e(0), DoubleType)
      Cast(If(GreaterThanOrEqual(x, Literal(0.0)),
        Multiply(Ceil(Divide(x, Literal(2.0))), Literal(2L)),
        UnaryMinus(Multiply(Ceil(Divide(UnaryMinus(x), Literal(2.0))), Literal(2L)))),
        DoubleType)
    }
    f("gcd")(e => GcdFn(e(0), e(1)))
    f("greatest_common_divisor")(e => GcdFn(e(0), e(1)))
    f("lcm")(e => LcmFn(e(0), e(1)))
    f("least_common_multiple")(e => LcmFn(e(0), e(1)))
    f("gamma")(e => GammaFn(e(0)))
    f("lgamma")(e => LgammaFn(e(0)))
    f("nextafter")(e => NextAfterFn(e(0), e(1)))
    f("signbit")(e => SignBit(e(0)))
    def isInf(x: Expression): Expression =
      Or(EqualTo(x, Literal(Double.PositiveInfinity)),
        EqualTo(x, Literal(Double.NegativeInfinity)))
    f("isinf")(e => isInf(Cast(e(0), DoubleType)))
    f("isfinite") { e =>
      val x = Cast(e(0), DoubleType)
      And(Not(IsNaN(x)), Not(isInf(x)))
    }
    // fdiv/fmod: FLOOR division pair (fmod(-7.5, 2.0) = 0.5 — divisor's
    // sign, unlike Spark's C-style %), DOUBLE out
    f("fdiv") { e =>
      val (a, b) = (Cast(e(0), DoubleType), Cast(e(1), DoubleType))
      Cast(Floor(Divide(a, b)), DoubleType)
    }
    f("fmod") { e =>
      val (a, b) = (Cast(e(0), DoubleType), Cast(e(1), DoubleType))
      Subtract(a, Multiply(b, Cast(Floor(Divide(a, b)), DoubleType)))
    }
    f("xor")(e => BitwiseXor(e(0), e(1)))
    // ---- dates ----
    // DuckDB's extraction family is BIGINT-typed; Sunday-based dow is 0
    f("century")(e =>
      Cast(Ceil(Divide(Cast(Year(e(0)), DoubleType), Literal(100.0))), LongType))
    def isoDow(d: Expression): Expression = Add(WeekDay(d), Literal(1))
    f("isodow")(e => Cast(isoDow(e(0)), LongType))
    // ISO year = calendar year of the Thursday in the date's ISO week
    def isoYear(d: Expression): Expression =
      Year(DateAdd(Cast(d, DateType), Subtract(Literal(4), isoDow(d))))
    f("isoyear")(e => Cast(isoYear(e(0)), LongType))
    f("week")(e => Cast(WeekOfYear(e(0)), LongType))
    f("yearweek")(e =>
      Add(Multiply(Cast(isoYear(e(0)), LongType), Literal(100L)),
        Cast(WeekOfYear(e(0)), LongType)))
    // millisecond/microsecond INCLUDE the seconds component (DuckDB:
    // millisecond of 12:34:56.789 = 56789)
    // Pmod, not %: pre-epoch timestamps have negative unix micros and
    // DuckDB still extracts the positive within-minute component
    // (millisecond(TIMESTAMP '1960-01-01 12:34:56.789') = 56789)
    f("millisecond")(e =>
      IntegralDivide(Pmod(UnixMicros(Cast(e(0), TimestampType)),
        Literal(60000000L)), Literal(1000L)))
    f("microsecond")(e =>
      Pmod(UnixMicros(Cast(e(0), TimestampType)), Literal(60000000L)))
    f("epoch")(e =>
      Divide(Cast(UnixMicros(Cast(e(0), TimestampType)), DoubleType), Literal(1e6)))
    f("epoch_ns")(e => Multiply(UnixMicros(e(0)), Literal(1000L)))
    // session timezone is pinned UTC on every engine session → offset 0;
    // NULL input still propagates
    f("timezone")(e => If(IsNull(e(0)), Literal(null, LongType), Literal(0L)))
    // interval constructors (not gate-comparable — parquet has no
    // interval column — but fully usable in date arithmetic)
    f("to_days")(e => MakeDTInterval(e(0), Literal(0), Literal(0), Literal(Decimal(0))))
    f("to_hours")(e => MakeDTInterval(Literal(0), e(0), Literal(0), Literal(Decimal(0))))
    f("to_minutes")(e => MakeDTInterval(Literal(0), Literal(0), e(0), Literal(Decimal(0))))
    f("to_seconds")(e => MakeDTInterval(Literal(0), Literal(0), Literal(0), e(0)))
    f("to_milliseconds")(e => MakeDTInterval(Literal(0), Literal(0), Literal(0),
      Divide(Cast(e(0), DoubleType), Literal(1000.0))))
    f("to_microseconds")(e => MakeDTInterval(Literal(0), Literal(0), Literal(0),
      Divide(Cast(e(0), DoubleType), Literal(1e6))))
    f("to_months")(e => MakeYMInterval(Literal(0), e(0)))
    f("to_years")(e => MakeYMInterval(e(0), Literal(0)))
    // date_diff counts BOUNDARY CROSSINGS (DuckDB: date_diff('month',
    // Jan 31, Feb 1) = 1); date_sub counts COMPLETE units (= 0 there).
    // rewriteDateFns renames the user spellings to these graft_ names
    // so Spark's parser-owned date_diff special form stays out of the
    // way; the quoted unit arrives as a literal.
    def duckDateUnit(u: String): String = u.toLowerCase match {
      case "year" | "years" | "yr" | "yy" | "yyyy" | "y" => "YEAR"
      case "quarter" | "quarters" | "qq" | "q" => "QUARTER"
      case "month" | "months" | "mon" | "mons" | "mm" => "MONTH"
      case "week" | "weeks" | "ww" | "wk" => "WEEK"
      case "day" | "days" | "dd" | "d" => "DAY"
      case "hour" | "hours" | "hr" | "hh" => "HOUR"
      case "minute" | "minutes" | "min" | "mins" | "mi" | "n" => "MINUTE"
      case "second" | "seconds" | "sec" | "secs" | "ss" | "s" => "SECOND"
      case "millisecond" | "milliseconds" | "ms" | "msec" => "MILLISECOND"
      case "microsecond" | "microseconds" | "us" | "usec" => "MICROSECOND"
      case other => throw new IllegalArgumentException(
        s"unsupported date part unit '$other'")
    }
    f("graft_date_diff") { e =>
      val unit = duckDateUnit(litStr(e(0), "date_diff unit"))
      def tr(x: Expression) = TruncTimestamp(Literal(unit), Cast(x, TimestampType))
      TimestampDiff(unit, tr(e(1)), tr(e(2)))
    }
    f("graft_date_part_sub") { e =>
      val unit = duckDateUnit(litStr(e(0), "date_sub unit"))
      TimestampDiff(unit, Cast(e(1), TimestampType), Cast(e(2), TimestampType))
    }
    // ---- lists ----
    f("array_length") { e =>
      require(e.length == 1,
        "array_length: only the 1-argument form is supported (no md-array dims)")
      Size(e(0), legacySizeOfNull = false)
    }
    f("list_append")(e => ArrayAppend(e(0), e(1)))
    // DuckDB's prepend family takes (element, list)
    f("list_prepend")(e => ArrayPrepend(e(1), e(0)))
    // DuckDB 1.0's list_concat is NULL-absorbing per SIDE, not per call:
    // list_concat([1], NULL) = [1], list_concat(NULL, NULL) = NULL
    // (Spark's Concat returns NULL if ANY argument is). The If-chain
    // needs no typed empty-array literal and keeps both-NULL → NULL.
    def duckListConcat(e: Seq[Expression]): Expression = {
      // untyped NULL literals drop out up front — Concat/If can't
      // coerce NullType against ARRAY and DuckDB treats them as the
      // neutral element anyway
      val typed = e.filter {
        case Literal(null, NullType) => false
        case _ => true
      }
      if (typed.isEmpty) Literal(null, NullType)
      else typed.reduceLeft((a, b) =>
        If(IsNull(a), b, If(IsNull(b), a, Concat(Seq(a, b)))))
    }
    f("list_concat")(duckListConcat)
    f("array_concat")(duckListConcat)
    f("list_has")(e => ArrayContains(e(0), e(1)))
    f("list_position")(e => ArrayPosition(e(0), e(1)))
    f("list_indexof")(e => ArrayPosition(e(0), e(1)))
    def listExtract(e: Seq[Expression]): Expression =
      ElementAt(NullabilityGuard(e(0)), e(1), None, false)
    f("list_extract")(listExtract)
    f("array_extract")(listExtract)
    f("list_element")(listExtract)
    f("list_slice")(e => DuckListSlice(e(0), e(1), e(2)))
    f("array_slice")(e => DuckListSlice(e(0), e(1), e(2)))
    f("list_reverse")(e => Reverse(e(0)))
    // DuckDB's list sorts put NULLs LAST by default in BOTH directions
    // (Spark's sort_array pins them first for ASC) — sort the compacted
    // list and concat the NULL tail back on the requested side
    def duckListSort(l: Expression, asc: Boolean, nullsFirst: Boolean): Expression = {
      val lv = UnresolvedNamedLambdaVariable(Seq("__graft_s"))
      val nulls = ArrayFilter(l, LambdaFunction(IsNull(lv), Seq(lv)))
      val sorted = new SortArray(ArrayCompact(l), Literal(asc))
      if (nullsFirst) Concat(Seq(nulls, sorted)) else Concat(Seq(sorted, nulls))
    }
    def sortDir(e: Expression): Boolean =
      litStr(e, "list_sort order").trim.toUpperCase match {
        case "ASC" | "ASCENDING" => true
        case "DESC" | "DESCENDING" => false
        case other => throw new IllegalArgumentException(
          s"list_sort: unknown order '$other'")
      }
    def nullsSide(e: Expression): Boolean =
      litStr(e, "list_sort null order").trim.toUpperCase match {
        case "NULLS FIRST" | "NULLS_FIRST" => true
        case "NULLS LAST" | "NULLS_LAST" => false
        case other => throw new IllegalArgumentException(
          s"list_sort: unknown null order '$other'")
      }
    f("list_sort") { e =>
      val asc = if (e.length >= 2) sortDir(e(1)) else true
      val nf = if (e.length >= 3) nullsSide(e(2)) else false
      duckListSort(e(0), asc, nf)
    }
    f("list_reverse_sort") { e =>
      val nf = if (e.length >= 2) nullsSide(e(1)) else false
      duckListSort(e(0), asc = false, nullsFirst = nf)
    }
    // list_unique = COUNT of distinct non-NULL elements (not the list)
    f("list_unique")(e =>
      Size(ArrayDistinct(ArrayCompact(e(0))), legacySizeOfNull = false))
    f("list_value")(e => CreateArray(e))
    f("list_pack")(e => CreateArray(e))
    f("list_zip")(e => ArraysZip(e))
    // list_resize: truncate or extend to n, filling NEW slots with the
    // optional third argument (NULL default); existing NULLs stay
    f("list_resize") { e =>
      val fill = if (e.length >= 3) e(2) else Literal(null)
      val iv = UnresolvedNamedLambdaVariable(Seq("__graft_i"))
      val n = Cast(e(1), IntegerType)
      // n = 0 (or NULL — DuckDB: list_resize([1,2], NULL) = []) must
      // yield an EMPTY list, not ride Sequence(1, 0)'s default step -1;
      // Slice(l, 1, 0) is an empty array of the right element type and
      // still propagates a NULL input list. Negative n is looser than
      // DuckDB (which errors on the unsigned cast): also empty here.
      If(GreaterThan(n, Literal(0)),
        ArrayTransform(
          Sequence(Literal(1), n, None),
          LambdaFunction(
            If(LessThanOrEqual(iv, Size(e(0), legacySizeOfNull = false)),
              ElementAt(NullabilityGuard(e(0)), iv, None, false), fill),
            Seq(iv))),
        Slice(e(0), Literal(1), Literal(0)))
    }
    // list_reduce: fold with the FIRST element as the seed (empty list
    // yields NULL here where DuckDB errors — looser, never wrong-valued)
    f("list_reduce") { e =>
      val l = e(0)
      val merge = e(1) match {
        case lf: LambdaFunction => lf
        case other => throw new IllegalArgumentException(
          s"list_reduce expects a lambda, got: $other")
      }
      val seed = ElementAt(NullabilityGuard(l), Literal(1), None, false)
      val rest = Slice(l, Literal(2),
        Greatest(Seq(Subtract(Size(l, legacySizeOfNull = false), Literal(1)),
          Literal(0))))
      val fv = UnresolvedNamedLambdaVariable(Seq("__graft_f"))
      ArrayAggregate(rest, seed, merge, LambdaFunction(fv, Seq(fv)))
    }
    f("str_split")(e => duckStringSplit(e))
    f("string_to_array")(e => duckStringSplit(e))
    // ---- misc ----
    // constant_or_null(v, cond...): v unless ANY condition arg is NULL
    f("constant_or_null") { e =>
      val anyNull = e.tail.map(IsNull(_): Expression).reduce(Or(_, _))
      CaseWhen(Seq((anyNull, Literal(null))), Some(e(0)))
    }
    // ---- r12 second sweep: encodings, hashes, JSON, paths, graphemes,
    // epoch timestamps, remaining date parts and interval constructors,
    // LIKE-with-escape spellings, and the aggregate alias tail ----
    f("to_base64")(e => Base64(e(0)))
    f("from_base64")(e => UnBase64(e(0)))
    f("sha256")(e => Sha2(e(0), Literal(256)))
    f("str_split_regex")(e => StringSplit(e(0), e(1), Literal(-1)))
    // DuckDB encode/decode: VARCHAR ↔ UTF-8 BLOB (one-arg forms)
    f("encode")(e => Encode(e(0), Literal("UTF-8")))
    f("decode")(e => new Decode(Seq(e(0), Literal("UTF-8"))))
    f("unbin")(e => UnBin(e(0)))
    f("from_binary")(e => UnBin(e(0)))
    f("like_escape")(e => likeEscape(e, ilike = false, negate = false))
    f("not_like_escape")(e => likeEscape(e, ilike = false, negate = true))
    f("ilike_escape")(e => likeEscape(e, ilike = true, negate = false))
    f("not_ilike_escape")(e => likeEscape(e, ilike = true, negate = true))
    // julian: DuckDB's day number is the astronomical JD + 0.5 (a DATE
    // lands on .0, noon on .5) — unix epoch day = 2440588.0
    f("julian")(e =>
      Add(Divide(Cast(UnixMicros(Cast(e(0), TimestampType)), DoubleType),
        Literal(86400000000.0)), Literal(2440588.0)))
    f("era")(e =>
      Cast(If(GreaterThan(Year(e(0)), Literal(0)), Literal(1), Literal(0)), LongType))
    f("decade")(e =>
      Cast(Floor(Divide(Cast(Year(e(0)), DoubleType), Literal(10.0))), LongType))
    f("millennium")(e =>
      Cast(Ceil(Divide(Cast(Year(e(0)), DoubleType), Literal(1000.0))), LongType))
    f("timezone_hour")(e => If(IsNull(e(0)), Literal(null, LongType), Literal(0L)))
    f("timezone_minute")(e => If(IsNull(e(0)), Literal(null, LongType), Literal(0L)))
    f("to_weeks")(e => MakeDTInterval(Multiply(Cast(e(0), IntegerType), Literal(7)),
      Literal(0), Literal(0), Literal(Decimal(0))))
    f("to_quarters")(e => MakeYMInterval(Literal(0),
      Multiply(Cast(e(0), IntegerType), Literal(3))))
    f("to_decades")(e => MakeYMInterval(
      Multiply(Cast(e(0), IntegerType), Literal(10)), Literal(0)))
    f("to_centuries")(e => MakeYMInterval(
      Multiply(Cast(e(0), IntegerType), Literal(100)), Literal(0)))
    f("to_millennia")(e => MakeYMInterval(
      Multiply(Cast(e(0), IntegerType), Literal(1000)), Literal(0)))
    f("today")(_ => CurrentDate())
    f("now")(_ => CurrentTimestamp())
    f("transaction_timestamp")(_ => CurrentTimestamp())
    f("get_current_timestamp")(_ => CurrentTimestamp())
    f("current_database")(_ =>
      Literal(UTF8String.fromString("memory"), StringType))
    // the reference pins duckdb 1.0.0 — report its version spelling
    f("version")(_ => Literal(UTF8String.fromString("v1.0.0"), StringType))
    f("gen_random_uuid")(_ => Uuid())
    // JSON extraction: named functions AND the -> / ->> operators
    // (rewriteJsonOps turns the operators into these named spellings;
    // the kernel carries yyjson reserialization semantics — quoted
    // strings under ->, unquoted under ->>, JSON null → SQL NULL). A
    // literal list of paths extracts per-element like DuckDB's
    // list-valued overload.
    def jsonX(e: Seq[Expression], asText: Boolean): Expression = e(1) match {
      case CreateArray(paths, _) =>
        CreateArray(paths.map(p => JsonExtractFn(e(0), p, asText)))
      case p => JsonExtractFn(e(0), p, asText)
    }
    f("json_extract")(e => jsonX(e, asText = false))
    f("json_extract_path")(e => jsonX(e, asText = false))
    f("json_extract_string")(e => jsonX(e, asText = true))
    f("json_extract_path_text")(e => jsonX(e, asText = true))
    // r13 JSON named-function tail (semantics pinned on v1.0.0 — see
    // each kernel's note): path forms of array_length/type/keys, the
    // SQLite-style containment, RFC 7386 merge, minify/structure, and
    // the SQL-value→JSON constructors
    f("json_array_length")(e =>
      JsonPathFn(e(0), if (e.length >= 2) e(1) else Literal("$"), "array_length"))
    f("json_contains")(e => JsonContainsFn(e(0), e(1)))
    f("json_merge_patch")(e => JsonMergePatchFn(e(0), e(1)))
    f("json")(e => JsonMinifyFn(e(0)))
    f("json_structure")(e => JsonStructureFn(e(0)))
    f("to_json")(e => JsonQuoteFn(e(0)))
    f("json_quote")(e => JsonQuoteFn(e(0)))
    f("json_array")(e => JsonBuildFn(e, obj = false))
    f("json_object")(e => JsonBuildFn(e, obj = true))
    // (not Spark's JsonObjectKeys: it returns NULL for non-objects
    // where DuckDB returns [])
    f("json_keys")(e =>
      JsonPathFn(e(0), if (e.length >= 2) e(1) else Literal("$"), "keys"))
    f("json_valid")(e => JsonValid(e(0)))
    f("json_type")(e =>
      if (e.length >= 2) JsonPathFn(e(0), e(1), "type") else JsonTypeOf(e(0)))
    f("length_grapheme")(e => LengthGrapheme(e(0)))
    f("left_grapheme")(e => SideGrapheme(e(0), e(1), fromRight = false))
    f("right_grapheme")(e => SideGrapheme(e(0), e(1), fromRight = true))
    f("substring_grapheme")(e => SubstringGrapheme(e(0), e(1), e(2)))
    f("parse_filename") { e =>
      val trim = if (e.length >= 2 && e(1).dataType == BooleanType) e(1)
        else Literal(false) // a separator-spec 2nd arg means no trim
      ParseFilenameFn(e(0), trim)
    }
    f("parse_dirname")(e => ParseDirFn(e(0), wholePath = false))
    f("parse_dirpath")(e => ParseDirFn(e(0), wholePath = true))
    f("parse_path")(e => ParsePathFn(e(0)))
    f("to_timestamp")(e => DuckToTimestamp(e(0)))
    // aggregate alias tail
    f("kahan_sum")(e => aggregate.Sum(Cast(e(0), DoubleType)))
    f("sumkahan")(e => aggregate.Sum(Cast(e(0), DoubleType)))
    f("group_concat")(e =>
      new aggregate.ListAgg(e(0), if (e.length >= 2) e(1) else Literal(",")))
    f("count_star")(_ => aggregate.Count(Seq(Literal(1))))
    f("argmax")(e => aggregate.MaxBy(e(0),
      If(IsNull(e(0)), Literal(null), e(1))))
    f("argmin")(e => aggregate.MinBy(e(0),
      If(IsNull(e(0)), Literal(null), e(1))))
    f("arg_max_null")(e => aggregate.MaxBy(e(0), e(1)))
    f("arg_min_null")(e => aggregate.MinBy(e(0), e(1)))
    // sem: DuckDB's standard error of the mean uses the POPULATION
    // stddev: stddev_pop / sqrt(count)
    f("sem") { e =>
      Divide(aggregate.StddevPop(e(0)).toAggregateExpression(),
        Sqrt(Cast(aggregate.Count(Seq(e(0))).toAggregateExpression(), DoubleType)))
    }
    // kurtosis_pop: the biased population excess — exactly Spark's
    // builtin (NULL on empty via the builtin's own semantics)
    f("kurtosis_pop")(e => aggregate.Kurtosis(e(0)))
  }

  /** DuckDB's LIKE-with-escape function spellings: like_escape(s, pat,
    * esc) and the ilike/negated variants. The escape char must be a
    * one-character literal (DuckDB's own constraint).
    */
  private def likeEscape(
      e: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      ilike: Boolean, negate: Boolean)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    // the escape is a literal, or the constant expression the
    // trailing-backslash literal rewrite left ('' || chr(92)) — inner
    // functions resolve before this builder runs, so folding works
    val esc = e(2) match {
      case Literal(s, _) if s != null && s.toString.length == 1 =>
        s.toString.charAt(0)
      case e3 if e3.resolved && e3.foldable &&
          e3.eval() != null && e3.eval().toString.length == 1 =>
        e3.eval().toString.charAt(0)
      case other => throw new IllegalArgumentException(
        s"like_escape: the escape must be a one-character literal, got: $other")
    }
    val base: Expression =
      if (ilike) ILike(e(0), e(1), esc) else Like(e(0), e(1), esc)
    if (negate) Not(base) else base
  }

  /** Translate a literal DuckDB JSON path to Spark's get_json_object
    * syntax: '$.a[0].b' passes through; a bare key becomes '$.key'; the
    * '/a/0/b' pointer form becomes '$.a[0].b' (numeric segments index).
    */
  /** DuckDB string_split: the separator is a LITERAL, not a regex —
    * quote a literal separator for Spark's regex split (a non-literal
    * separator keeps regex behavior, documented).
    */
  private def duckStringSplit(
      e: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    val sep = e(1) match {
      case Literal(s, _) if s != null && s.toString.nonEmpty =>
        Literal(java.util.regex.Pattern.quote(s.toString))
      case other => other
    }
    StringSplit(e(0), sep, Literal(-1))
  }

  /** DuckDB-semantics OVERRIDES of names that exist in Spark with
    * DIFFERENT behavior — kept separate from [[register]] (which only
    * ADDS names) so that constructing an engine never silently changes
    * what plain Spark SQL means on the caller's own session. The
    * engine's private dialect session is the only place these install
    * by default; a cluster user who wants the full DuckDB surface on a
    * session calls this explicitly.
    *
    *  - `regexp_replace`: DuckDB replaces only the FIRST match unless
    *    the 'g' flag is given; Spark's builtin always replaces all and
    *    takes a position 4th argument (see [[DuckRegexpReplace]]);
    *  - `element_at`: DuckDB returns NULL out of range / for a missing
    *    map key; Spark's builtin throws under ANSI mode.
    */
  def registerOverrides(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{ByteType, DateType, DoubleType, LongType, StringType}
    val reg = spark.sessionState.functionRegistry
    // ---- r12 breadth-parity overrides of Spark-builtin names whose
    // DuckDB semantics differ (pinned by the function gap probe) ----
    // sign: TINYINT -1/0/1 (Spark's is DOUBLE)
    reg.createOrReplaceTempFunction(
      "sign", exprs => Cast(Signum(Cast(exprs(0), DoubleType)), ByteType), "built-in")
    // log: 1-arg is LOG10 in DuckDB (Spark's is ln); 2-arg log(b, x)
    // matches Spark's argument order
    reg.createOrReplaceTempFunction(
      "log", exprs =>
        if (exprs.length == 1) Log10(exprs(0))
        else Logarithm(exprs(0), exprs(1)), "built-in")
    // trim family: DuckDB's 2-arg form is (string, trimChars) — Spark's
    // SQL functions take (trimChars, string); route both arities through
    // the expression classes with DuckDB's order
    reg.createOrReplaceTempFunction(
      "ltrim", exprs =>
        if (exprs.length == 1) StringTrimLeft(exprs(0))
        else StringTrimLeft(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "rtrim", exprs =>
        if (exprs.length == 1) StringTrimRight(exprs(0))
        else StringTrimRight(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "trim", exprs =>
        if (exprs.length == 1) StringTrim(exprs(0))
        else StringTrim(exprs(0), exprs(1)), "built-in")
    // dayofweek/weekday: DuckDB counts Sunday = 0 .. Saturday = 6 for
    // BOTH names (Spark: dayofweek Sunday = 1, weekday Monday = 0)
    def duckDow(e: Expression): Expression =
      Cast(Pmod(Add(WeekDay(e), Literal(1)), Literal(7)), LongType)
    reg.createOrReplaceTempFunction(
      "dayofweek", exprs => duckDow(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "weekday", exprs => duckDow(exprs(0)), "built-in")
    // trunc: DuckDB's 1-arg numeric toward-zero rounding preserving the
    // input type family; the 2-arg (date, fmt) form stays Spark's
    reg.createOrReplaceTempFunction(
      "trunc", exprs =>
        if (exprs.length == 1) DuckTrunc(exprs(0))
        else TruncDate(exprs(0), exprs(1)), "built-in")
    // typeof: DuckDB type-name spelling (BIGINT, VARCHAR, …)
    reg.createOrReplaceTempFunction(
      "typeof", exprs => DuckTypeOf(exprs(0)), "built-in")
    // array_prepend: DuckDB's argument order is (element, list)
    reg.createOrReplaceTempFunction(
      "array_prepend", exprs => ArrayPrepend(exprs(1), exprs(0)), "built-in")
    // current_schema: DuckDB's default schema name
    reg.createOrReplaceTempFunction(
      "current_schema", _ =>
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString("main"),
          StringType), "built-in")
    // chr/char: Unicode codepoint (Spark's builtin truncates to latin-1)
    reg.createOrReplaceTempFunction(
      "chr", exprs => ChrCodepoint(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "char", exprs => ChrCodepoint(exprs(0)), "built-in")
    // isnan: NULL in → NULL out (Spark's builtin says false)
    reg.createOrReplaceTempFunction(
      "isnan", exprs =>
        If(IsNull(exprs(0)), Literal(null, org.apache.spark.sql.types.BooleanType),
          IsNaN(exprs(0))), "built-in")
    // skewness/kurtosis: DuckDB reports the BIAS-CORRECTED sample
    // statistics (G1/G2); Spark's builtins are the biased population
    // moments (g1/g2). Standard conversions over the same pass, with
    // DuckDB's NULL below the minimum count (Spark says NaN there, and
    // for zero variance):
    //   G1 = g1 · sqrt(n(n−1)) / (n−2),             NULL when n < 3
    //   G2 = (n−1)/((n−2)(n−3)) · ((n+1)·g2 + 6),   NULL when n < 4
    def sampleMoment(e: Expression, minN: Int,
        conv: (Expression, Expression) => Expression): Expression = {
      val n = Cast(aggregate.Count(Seq(e)).toAggregateExpression(), DoubleType)
      val biased = (if (minN == 3) aggregate.Skewness(e) else aggregate.Kurtosis(e))
        .toAggregateExpression()
      val v = conv(biased, n)
      CaseWhen(Seq(
        (LessThan(n, Literal(minN.toDouble)), Literal(null, DoubleType)),
        (IsNaN(v), Literal(null, DoubleType))), Some(v))
    }
    reg.createOrReplaceTempFunction(
      "skewness", exprs => sampleMoment(exprs(0), 3, (g1, n) =>
        Divide(Multiply(g1, Sqrt(Multiply(n, Subtract(n, Literal(1.0))))),
          Subtract(n, Literal(2.0)))), "built-in")
    reg.createOrReplaceTempFunction(
      "kurtosis", exprs => sampleMoment(exprs(0), 4, (g2, n) =>
        Multiply(
          Divide(Subtract(n, Literal(1.0)),
            Multiply(Subtract(n, Literal(2.0)), Subtract(n, Literal(3.0)))),
          Add(Multiply(Add(n, Literal(1.0)), g2), Literal(6.0)))), "built-in")
    // date_add(date, INTERVAL): plain addition, TIMESTAMP out (DuckDB:
    // date_add(DATE '2025-01-31', INTERVAL 1 MONTH) = TIMESTAMP
    // 2025-02-28 00:00:00)
    reg.createOrReplaceTempFunction(
      "date_add", exprs =>
        Cast(Add(exprs(0), exprs(1)),
          org.apache.spark.sql.types.TimestampType), "built-in")
    reg.createOrReplaceTempFunction(
      "regexp_replace", exprs => {
        require(exprs.length == 3 || exprs.length == 4,
          s"regexp_replace takes 3 or 4 arguments, got ${exprs.length}")
        DuckRegexpReplace(exprs(0), exprs(1), exprs(2),
          if (exprs.length >= 4) exprs(3) else Literal(""))
      }, "built-in")
    // Same NullabilityGuard rationale as map_extract in [[register]].
    reg.createOrReplaceTempFunction(
      "element_at", exprs =>
        ElementAt(NullabilityGuard(exprs(0)), exprs(1), None, false), "built-in")
    // Spark's builtin try_element_at (what bracket indexing desugars
    // to) builds the same mis-nullability ElementAt shape — override
    // with the guarded form; semantics are identical.
    reg.createOrReplaceTempFunction(
      "try_element_at", exprs =>
        ElementAt(NullabilityGuard(exprs(0)), exprs(1), None, false), "built-in")
    // Spark's builtin median is numeric-only; DuckDB's also takes
    // strings (lower middle element) and dates/timestamps (interpolated
    // midpoint). Same result where both engines accept the input.
    reg.createOrReplaceTempFunction(
      "median", exprs => DuckMedian(exprs(0)), "built-in")
    // printf: DuckDB yields NULL when ANY argument is NULL; Spark's
    // builtin renders "null" (or throws for numeric verbs). DECIMAL
    // arguments adapt to DOUBLE post-analysis (DuckDB's %f takes its
    // decimal literals; java.util.Formatter rejects BigDecimal).
    reg.createOrReplaceTempFunction(
      "printf", exprs => {
        val anyNull = exprs.tail.map(IsNull(_): Expression)
          .reduceOption(Or).getOrElse(Literal(false))
        If(anyNull, Literal.create(null, org.apache.spark.sql.types.StringType),
          FormatString(exprs.head +: exprs.tail.map(DecimalToDouble): _*))
      }, "built-in")
    // date_trunc/datetrunc: DATE in → DATE out (Spark's is always
    // TIMESTAMP); date_add: DuckDB yields TIMESTAMP from date+interval
    reg.createOrReplaceTempFunction(
      "date_trunc", exprs => DuckDateTrunc(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "datetrunc", exprs => DuckDateTrunc(exprs(0), exprs(1)), "built-in")
    // left/right with NEGATIVE n trim |n| from the OTHER end in DuckDB;
    // Spark's builtins return ''.
    reg.createOrReplaceTempFunction(
      "left", exprs => {
        val s = exprs(0)
        val n = Cast(exprs(1), org.apache.spark.sql.types.IntegerType)
        If(GreaterThanOrEqual(n, Literal(0)),
          Substring(s, Literal(1), n),
          Substring(s, Literal(1),
            Greatest(Seq(Literal(0), Add(Length(s), n)))))
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "right", exprs => {
        val s = exprs(0)
        val n = Cast(exprs(1), org.apache.spark.sql.types.IntegerType)
        If(GreaterThanOrEqual(n, Literal(0)),
          Substring(s, Subtract(Literal(0), n), n),
          Substring(s, Subtract(Literal(1), n), Literal(Int.MaxValue)))
      }, "built-in")
  }

  /** Translate a C/DuckDB strftime format to a java DateTimeFormatter
    * pattern. Literal runs containing letters are single-quoted (pattern
    * letters are active in java patterns); apostrophes escape as ''.
    */
  private[fm] def strftimeToJava(f: String): String = {
    val codes = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
      'j' -> "DDD", 'a' -> "EEE", 'A' -> "EEEE",
      'b' -> "MMM", 'B' -> "MMMM", 'p' -> "a", 'f' -> "SSSSSS",
      'G' -> "yyyy", 'g' -> "yy")
    val sb = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      if (s.exists(_.isLetter)) sb.append('\'').append(s.replace("'", "''")).append('\'')
      else sb.append(s.replace("'", "''"))
      lit.clear()
    }
    var i = 0
    while (i < f.length) {
      val c = f.charAt(i)
      if (c == '%' && i + 1 < f.length) {
        val code = f.charAt(i + 1)
        if (code == '%') { lit.append('%'); i += 2 }
        else codes.get(code) match {
          case Some(j) => flushLit(); sb.append(j); i += 2
          case None => throw new IllegalArgumentException(
            s"unsupported strftime code %$code in '$f'")
        }
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    sb.toString
  }

  def rewrite(sql: String): String =
    rewriteFromJsonHints(rewriteUnnest(rewriteQualify(rewriteWindowExclude(rewriteExclude(
      rewriteDistinctOn(rewriteReplace(rewriteBrackets(rewriteListComp(
        rewriteStructLit(rewriteStructPack(rewriteUsingSample(rewriteUnpivot(
          rewriteNullsModifier(rewriteTypeNames(rewriteDateDiffUnit(rewriteOrderedAgg(rewriteMathOps(
            rewriteGlob(rewriteSimilarTo(rewriteSemiAnti(
              rewriteSeriesFrom(rewriteFromFirst(rewriteJsonOps(
                rewriteTrailingBackslash(sql)))))))))))))))))))))))))

  /** DuckDB string literals ending in a backslash (`'\'`, `'a\'`) can
    * NEVER reach Spark's parser: its lexer consumes `\'` as an escaped
    * quote even under escapedStringLiterals=true, losing the
    * terminator. Re-emit such literals with the trailing backslash run
    * split out as `chr(92)` concatenations — inner backslashes are fine
    * (the lexer keeps `\x` pairs and the escaped-literals conf restores
    * them verbatim).
    */
  private[fm] def rewriteTrailingBackslash(sql: String): String = {
    var out = sql
    var changed = true
    var guard = 0
    while (changed && guard < 64) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val lit = literalMask(msk)
      var i = 0
      while (i < msk.length && !changed) {
        // closing quote of a literal whose last content char is '\'
        if (msk.charAt(i) == '\'' && i >= 2 && lit(i - 1) &&
          msk.charAt(i - 1) == '\\' && (i + 1 >= msk.length || !lit(i + 1))) {
          var k = i - 1
          while (k > 0 && msk.charAt(k - 1) == '\\' && lit(k - 1)) k -= 1
          val run = i - k
          // literal opens where the mask stops being content
          var open = k - 1
          while (open >= 0 && lit(open)) open -= 1
          val prefix = out.substring(open, k) + "'" // '...rest' without the run
          val tail = if (run == 1) "chr(92)" else s"repeat(chr(92), $run)"
          val repl =
            if (k == open + 1) s"($tail)" // the literal was ONLY backslashes
            else s"($prefix || $tail)"
          out = out.substring(0, open) + repl + out.substring(i + 1)
          changed = true
        }
        i += 1
      }
    }
    out
  }

  /** DuckDB type spellings Spark's parser rejects, mapped in CAST
    * contexts only (a bare `CAST(x AS VARCHAR)` is the single most
    * common DuckDB idiom the passthrough surface meets): the LAST
    * top-level `AS <type>` inside every CAST/TRY_CAST paren pair, and
    * every `::<type>` suffix. Identifiers that happen to collide (a
    * column aliased `text`) are untouched — only those two grammar
    * positions rewrite. Unsigned widths map to the next wider signed
    * type (values, not storage, must round-trip); HUGEINT maps to
    * DECIMAL(38,0) like the oracle's own materialization.
    */
  private val duckTypeAliases: Map[String, String] = Map(
    "VARCHAR" -> "STRING", "TEXT" -> "STRING", "BPCHAR" -> "STRING",
    "BLOB" -> "BINARY", "BYTEA" -> "BINARY", "VARBINARY" -> "BINARY",
    "REAL" -> "FLOAT", "FLOAT4" -> "FLOAT", "FLOAT8" -> "DOUBLE",
    "HUGEINT" -> "DECIMAL(38,0)", "UBIGINT" -> "DECIMAL(20,0)",
    "UINTEGER" -> "BIGINT", "USMALLINT" -> "INT", "UTINYINT" -> "SMALLINT",
    "INT1" -> "TINYINT", "INT2" -> "SMALLINT", "INT4" -> "INT",
    "INT8" -> "BIGINT", "SIGNED" -> "INT", "LOGICAL" -> "BOOLEAN")

  // ---- JSON -> / ->> operator rewrite ------------------------------------

  private def isIdentCh(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '$'

  /** Lambda-taking functions: a `->` whose bare-identifier LHS sits at an
    * argument start of one of these is a lambda arrow, not JSON. DuckDB
    * 1.0 spellings plus the Spark HOFs this rewriter itself emits
    * (listcomp → transform/filter/aggregate) and passthrough accepts.
    */
  private val lambdaHofs: Set[String] = Set(
    "list_transform", "array_transform", "list_apply", "array_apply", "apply",
    "list_filter", "array_filter", "filter",
    "list_reduce", "array_reduce", "reduce",
    "transform", "aggregate", "exists", "forall", "zip_with",
    "map_filter", "map_zip_with", "transform_keys", "transform_values",
    "array_sort")

  /** Functions PROVABLY not lambda-taking on either engine: a `->` whose
    * bare-identifier LHS sits at an argument start of one of these is
    * safely a JSON arrow. r15 (verdict r14 advice): admitting ident RHS
    * for `->` made the lambda-shaped position ambiguous for functions in
    * NEITHER set — `someHof(l, x -> y)` for an unlisted HOF would have
    * silently rewritten to `json_extract(x, y)` and miscompiled, where
    * it previously fell through to Spark's parser and failed loudly. So
    * in that position the rewrite now fires only for functions on this
    * whitelist; an unknown function name leaves the arrow unrewritten
    * (an unlisted HOF keeps failing loudly, and a JSON arrow inside an
    * unknown function is a documented loud refusal with the
    * `json_extract(j, p)` spelling as the workaround — COVERAGE.md).
    * Literal/paren/chained LHS positions are unaffected: only a bare
    * ident (or ident-list) at an argument start looks like a lambda
    * head.
    */
  private val nonLambdaFns: Set[String] = Set(
    "coalesce", "nullif", "ifnull", "nvl", "nvl2", "isnull", "if", "iif",
    "concat", "concat_ws", "least", "greatest", "lower", "upper", "trim",
    "ltrim", "rtrim", "substr", "substring", "length", "len", "abs",
    "round", "floor", "ceil", "ceiling", "cast", "try_cast", "typeof",
    "md5", "printf", "format", "contains", "starts_with", "ends_with",
    "replace", "split", "string_split", "split_part", "regexp_replace",
    "regexp_extract", "regexp_matches", "left", "right", "repeat",
    "reverse", "instr", "strpos", "position", "hash", "count", "min",
    "max", "sum", "avg", "any_value", "first", "last", "json",
    "json_extract", "json_extract_string", "json_extract_path",
    "json_extract_path_text", "json_type", "json_structure",
    "json_valid", "json_array_length", "json_keys", "json_contains",
    "json_merge_patch", "json_array", "json_object", "to_json",
    "from_json", "json_quote", "json_serialize", "unnest", "struct",
    "named_struct", "array", "list_value", "map", "element_at",
    "array_contains", "list_contains", "array_position", "list_position",
    "array_to_string", "array_join", "encode", "decode", "to_base64",
    "from_base64", "lpad", "rpad", "translate", "date_trunc", "strftime",
    "strptime", "to_timestamp", "to_date", "date_part", "datepart",
    "date_diff", "datediff", "date_add", "dateadd", "year", "month",
    "day", "hour", "minute", "second",
    // r16 (verdict r15 advice): the common math/string scalar builtins —
    // provably no lambda parameter on either engine — so valid DuckDB
    // arrows at their argument starts rewrite instead of refusing.
    // Deliberately ABSENT: every name Spark or DuckDB binds as a HOF
    // (transform/filter/reduce/aggregate/exists/forall/zip_with/
    // array_sort and the list_*/map_* lambda families in lambdaHofs).
    "sqrt", "cbrt", "ln", "log", "log2", "log10", "exp", "power", "pow",
    "mod", "sign", "trunc", "gcd", "lcm", "even", "factorial", "gamma",
    "lgamma", "sin", "cos", "tan", "asin", "acos", "atan", "atan2",
    "degrees", "radians", "char_length", "character_length", "strlen",
    "octet_length", "bit_length", "ascii", "chr", "unicode", "to_hex",
    "from_hex", "levenshtein", "editdist3", "hamming", "jaccard",
    "jaro_similarity", "jaro_winkler_similarity", "damerau_levenshtein",
    "array_length", "list_extract", "list_element", "array_extract")

  /** Matching `[` for the `]` at `close`, scanning backwards over MASKED
    * text, skipping literal contents; -1 if unbalanced.
    */
  private def backwardMatchBracket(
      msk: String, lit: Array[Boolean], close: Int): Int = {
    var depth = 0
    var i = close
    while (i >= 0) {
      val c = msk.charAt(i)
      if (!lit(i)) {
        if (c == ']') depth += 1
        else if (c == '[') { depth -= 1; if (depth == 0) return i }
      }
      i -= 1
    }
    -1
  }

  /** Start index of the (possibly dotted / double-quoted) identifier chain
    * whose last character is `at`; -1 if `at` isn't in one.
    */
  private def identStartBack(msk: String, at: Int): Int = {
    var l = at
    var start = -1
    var more = true
    while (more && l >= 0) {
      more = false
      if (msk.charAt(l) == '"') {
        var j = l - 1
        while (j >= 0 && msk.charAt(j) != '"') j -= 1
        if (j < 0) return -1
        start = j
        l = j - 1
      } else if (isIdentCh(msk.charAt(l))) {
        var j = l
        while (j >= 0 && isIdentCh(msk.charAt(j))) j -= 1
        start = j + 1
        l = j
      } else return -1
      if (l >= 0 && msk.charAt(l) == '.') { l -= 1; more = true }
    }
    start
  }

  /** Start of the single operand (literal / ident chain / call / paren
    * group / bracket-suffixed base) ENDING at `at`; -1 if none.
    */
  private def operandStartBack(msk: String, lit: Array[Boolean], at: Int): Int = {
    var l = at
    var start = -1
    var consumeBase = true
    while (consumeBase && l >= 0) {
      consumeBase = false
      val c = msk.charAt(l)
      if (lit(l)) {
        var j = l
        while (j >= 0 && lit(j)) j -= 1
        start = j + 1
      } else if (c == ')') {
        val open = backwardMatchParen(msk, lit, l)
        if (open < 0) return -1
        start = open
        if (open > 0 && (isIdentCh(msk.charAt(open - 1)) || msk.charAt(open - 1) == '"')) {
          val s2 = identStartBack(msk, open - 1)
          if (s2 >= 0) start = s2
        }
      } else if (c == ']') {
        // bracket suffix: keep walking for its base (x['k'], tags[1])
        val open = backwardMatchBracket(msk, lit, l)
        if (open <= 0) return -1
        start = open
        l = open - 1
        consumeBase = true
      } else if (isIdentCh(c) || c == '"') {
        val s2 = identStartBack(msk, l)
        if (s2 < 0) return -1
        start = s2
      } else return -1
    }
    start
  }

  /** End (exclusive) of the single operand STARTING at `at`; -1 if none.
    * Accepts literals, signed integers, paren groups, and ident chains
    * with optional call-parens and bracket suffixes.
    */
  private def operandEndFwd(msk: String, lit: Array[Boolean], at: Int): Int = {
    if (at >= msk.length) return -1
    val c = msk.charAt(at)
    if (lit(at)) {
      var j = at
      while (j < msk.length && lit(j)) j += 1
      j
    } else if (c.isDigit || ((c == '-' || c == '+') &&
        at + 1 < msk.length && msk.charAt(at + 1).isDigit)) {
      var j = if (c.isDigit) at else at + 1
      while (j < msk.length && msk.charAt(j).isDigit) j += 1
      j
    } else if (c == '(') {
      val close = matchParen(msk, at)
      if (close < 0) -1 else close + 1
    } else if (isIdentCh(c) || c == '"') {
      var j = at
      var done = false
      while (!done) {
        if (j < msk.length && msk.charAt(j) == '"') {
          var k = j + 1
          while (k < msk.length && msk.charAt(k) != '"') k += 1
          if (k >= msk.length) return -1
          j = k + 1
        } else {
          val e = identEndAt(msk, j)
          if (e <= j) return -1
          j = e
        }
        if (j < msk.length && msk.charAt(j) == '.') j += 1 else done = true
      }
      if (j < msk.length && msk.charAt(j) == '(') {
        val close = matchParen(msk, j)
        if (close < 0) return -1
        j = close + 1
      }
      while (j < msk.length && msk.charAt(j) == '[') {
        val close = matchBracket(msk, j)
        if (close < 0) return -1
        j = close + 1
      }
      j
    } else -1
  }

  /** DuckDB JSON extraction OPERATORS (the reference grants them via
    * verbatim passthrough, `src/frontmatter_mcp/query.py:72`, and its
    * own data model JSON-encodes array columns,
    * `docs/adr/0006-json-encode-arrays.md:15-29`):
    *
    *   `j -> p`  → `json_extract(j, p)`         (JSON-typed result)
    *   `j ->> p` → `json_extract_string(j, p)`  (VARCHAR result)
    *
    * Precedence pinned on v1.0.0 (the PostgreSQL "any other operator"
    * level): the arrows and `||` share one LEFT-ASSOCIATIVE level below
    * arithmetic — `'x' || j ->> 'a'` parses as `('x' || j) ->> 'a'`,
    * `j ->> 1 + 1` as `j ->> (1 + 1)`. The LHS walk therefore absorbs
    * `||` / arithmetic / `::` chains and the RHS walk absorbs arithmetic
    * (not `||`, which associates left onto the finished arrow).
    *
    * `->` is ALSO the lambda arrow. Disambiguation rests on the LHS: a
    * bare-identifier (or `(a, b)` identifier-list) LHS sitting at an
    * argument start of a function call is lambda-SHAPED — it rewrites
    * only when the function is provably non-lambda ([[nonLambdaFns]]);
    * a [[lambdaHofs]] member or any UNKNOWN function name leaves the
    * arrow alone, so an unlisted HOF fails loudly in Spark's parser
    * instead of miscompiling (r15). Every other position is
    * unambiguously JSON. The RHS
    * may be a string/number literal, a column-ref/ident chain
    * (`j -> keycol`, `j -> t.path_col`, `j -> concat('$.', k)` — DuckDB
    * accepts dynamic paths and [[JsonExtractFn]] evaluates any path
    * expression), or — r16 — a parenthesized group
    * (`j -> ('$.' || k)`, closing the verdict r15 "what's missing"
    * item): a paren group is also a legal lambda BODY, but a lambda can
    * only occur as a function argument, which is precisely the position
    * the LHS guard gates — so the paren-RHS rewrite fires under exactly
    * the same conditions as the ident-RHS one, and an unlisted HOF's
    * `x -> (body)` still falls through to fail loudly.
    * `list_transform(l, x -> c)` stays a lambda while
    * `SELECT tags -> 0 FROM files` and `SELECT j -> path_col FROM t`
    * rewrite.
    */
  private[fm] def rewriteJsonOps(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 256) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val lit = literalMask(msk)
      var i = 0
      while (i + 1 < msk.length && !changed) {
        if (!lit(i) && msk.charAt(i) == '-' && msk.charAt(i + 1) == '>') {
          val isText = i + 2 < msk.length && msk.charAt(i + 2) == '>'
          val opEnd = i + (if (isText) 3 else 2)
          var advanced = false
          // ---- RHS ----
          var r = opEnd
          while (r < msk.length && msk.charAt(r).isWhitespace) r += 1
          val literalStart = r < msk.length && (lit(r) || msk.charAt(r).isDigit ||
            ((msk.charAt(r) == '-' || msk.charAt(r) == '+') &&
              r + 1 < msk.length && msk.charAt(r + 1).isDigit))
          // column-ref RHS is legal for '->' too: the lambda case is
          // excluded by the LHS guard below (a lambda's LHS is a bare
          // ident / ident list at an argument start of a lambdaHof).
          // r16 (verdict r15 "what's missing" item 2): a PAREN-GROUP
          // RHS is now admitted for '->' under the SAME guard — a
          // paren group is also a legal lambda body, but a lambda can
          // only occur as a function argument, and that position is
          // exactly what the LHS guard gates (rewrite only under
          // provably-non-lambda fns; unknown fns left alone to fail
          // loudly). Outside argument starts `j -> (expr)` is
          // unambiguously JSON, matching DuckDB's dynamic-path grant.
          val identStart = r < msk.length && !lit(r) &&
            (msk.charAt(r) == '"' ||
              (isIdentCh(msk.charAt(r)) && !msk.charAt(r).isDigit))
          val parenStart = r < msk.length && !lit(r) && msk.charAt(r) == '('
          var rhsEnd =
            if (!isText && !literalStart && !identStart && !parenStart) -1
            else operandEndFwd(msk, lit, r)
          // absorb tighter-binding arithmetic on the right (not || — it
          // associates LEFT onto the completed arrow)
          var growR = rhsEnd > 0
          while (growR) {
            growR = false
            var q = rhsEnd
            while (q < msk.length && msk.charAt(q).isWhitespace) q += 1
            if (q < msk.length && !lit(q)) {
              val c = msk.charAt(q)
              val opLen =
                if (c == '/' && q + 1 < msk.length && msk.charAt(q + 1) == '/') 2
                else if ("+*/%^".indexOf(c) >= 0) 1
                else if (c == '-' && !(q + 1 < msk.length && msk.charAt(q + 1) == '>')) 1
                else 0
              if (opLen > 0) {
                var p = q + opLen
                while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
                val e2 = operandEndFwd(msk, lit, p)
                if (e2 > 0) { rhsEnd = e2; growR = true }
              }
            }
          }
          if (rhsEnd > 0) {
            // ---- LHS ----
            var l = i - 1
            while (l >= 0 && msk.charAt(l).isWhitespace) l -= 1
            val lhsEnd = l + 1
            var lhsStart = if (l < 0) -1 else operandStartBack(msk, lit, l)
            // absorb ||, arithmetic, and :: chains on the left
            var growL = lhsStart >= 0
            while (growL) {
              growL = false
              var q = lhsStart - 1
              while (q >= 0 && msk.charAt(q).isWhitespace) q -= 1
              if (q >= 0 && !lit(q)) {
                val c = msk.charAt(q)
                val opLen =
                  if (c == '|' && q > 0 && msk.charAt(q - 1) == '|') 2
                  else if (c == ':' && q > 0 && msk.charAt(q - 1) == ':') 2
                  else if (c == '/' && q > 0 && msk.charAt(q - 1) == '/') 2
                  else if ("+*/%^".indexOf(c) >= 0) 1
                  else if (c == '-') 1
                  else 0
                if (opLen > 0) {
                  var p = q - opLen
                  while (p >= 0 && msk.charAt(p).isWhitespace) p -= 1
                  val s2 = if (p < 0) -1 else operandStartBack(msk, lit, p)
                  if (s2 >= 0) { lhsStart = s2; growL = true }
                  else if (c == '-' || c == '+') lhsStart = q // unary sign
                }
              }
            }
            if (lhsStart >= 0) {
              // ---- lambda guard (2-char arrow only) ----
              var isLambda = false
              if (!isText) {
                val lhsText = msk.substring(lhsStart, lhsEnd)
                val bareIdent = lhsText.nonEmpty && lhsText.forall(isIdentCh)
                val parenIdents = lhsText.length >= 2 &&
                  lhsText.head == '(' && lhsText.last == ')' &&
                  lhsText.substring(1, lhsText.length - 1).split(",", -1)
                    .forall(s => s.trim.nonEmpty && s.trim.forall(isIdentCh))
                if (bareIdent || parenIdents) {
                  var q = lhsStart - 1
                  while (q >= 0 && msk.charAt(q).isWhitespace) q -= 1
                  if (q >= 0 && !lit(q) && (msk.charAt(q) == '(' || msk.charAt(q) == ',')) {
                    // governing '(' of the argument list this arrow starts in
                    var open = -1
                    if (msk.charAt(q) == '(') open = q
                    else {
                      var depth = 0
                      var p = q - 1
                      while (p >= 0 && open < 0) {
                        val ch = msk.charAt(p)
                        if (!lit(p)) {
                          if (ch == ')') depth += 1
                          else if (ch == '(') {
                            if (depth == 0) open = p else depth -= 1
                          }
                        }
                        p -= 1
                      }
                    }
                    if (open >= 1 && isIdentCh(msk.charAt(open - 1))) {
                      var s = open - 1
                      while (s >= 0 && isIdentCh(msk.charAt(s))) s -= 1
                      val fnName = msk.substring(s + 1, open).toLowerCase
                      // lambda-shaped position inside a call: rewrite
                      // ONLY under provably-non-lambda functions; an
                      // unknown name is treated as a potential HOF so
                      // it fails loudly instead of miscompiling
                      // (nonLambdaFns scaladoc)
                      if (!nonLambdaFns.contains(fnName)) isLambda = true
                    }
                  }
                }
              }
              if (!isLambda) {
                val fn = if (isText) "json_extract_string" else "json_extract"
                out = out.substring(0, lhsStart) + fn + "(" +
                  out.substring(lhsStart, lhsEnd) + ", " +
                  out.substring(r, rhsEnd) + ")" + out.substring(rhsEnd)
                changed = true
              } else { i = opEnd; advanced = true }
            } else { i = opEnd; advanced = true }
          } else { i = opEnd; advanced = true }
          if (!changed && !advanced) i = opEnd
        } else i += 1
      }
    }
    out
  }

  /** Resolve a DuckDB type token starting at `j` in a cast context:
    * base name (aliased to Spark spelling where needed, parenthesized
    * args kept verbatim) plus any `[]` suffixes → `ARRAY<...>` nesting.
    * Returns (sparkSpelling, endIndex); endIndex == j when there is
    * nothing to rewrite at `j` (no alias hit and no array suffix).
    */
  private def sparkTypeTokenAt(msk: String, u: String, j: Int): (String, Int) = {
    val end = identEndAt(msk, j)
    if (end <= j) return ("", j)
    val word = u.substring(j, end)
    var afterBase = end
    var base =
      if (afterBase < msk.length && msk.charAt(afterBase) == '(') {
        val close = matchParen(msk, afterBase)
        if (close < 0) return ("", j)
        afterBase = close + 1
        // parameterized types (DECIMAL(p,s)) keep their args; no alias
        // in this map is parameterized
        msk.substring(j, afterBase)
      } else duckTypeAliases.getOrElse(word, msk.substring(j, end))
    var dims = 0
    while (afterBase + 1 < msk.length && msk.charAt(afterBase) == '[' &&
        msk.charAt(afterBase + 1) == ']') {
      dims += 1
      afterBase += 2
    }
    if (dims == 0 && !duckTypeAliases.contains(word)) return ("", j)
    while (dims > 0) { base = s"ARRAY<$base>"; dims -= 1 }
    (base, afterBase)
  }

  private[fm] def rewriteTypeNames(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 128) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      // `expr::TYPE`
      var i = 0
      while (i + 1 < msk.length && !changed) {
        if (msk.charAt(i) == ':' && msk.charAt(i + 1) == ':' && !lit(i)) {
          var j = i + 2
          while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
          val (spelled, tEnd) = sparkTypeTokenAt(msk, u, j)
          if (tEnd > j && spelled != msk.substring(j, tEnd)) {
            out = out.substring(0, j) + spelled + out.substring(tEnd)
            changed = true
          }
        }
        i += 1
      }
      // last top-level `AS <type>` inside CAST(...) / TRY_CAST(...)
      if (!changed) {
        var k = u.indexOf("CAST")
        while (k >= 0 && !changed) {
          val isCastKw = isKeywordAt(u, k + 3, "CAST") ||
            (k >= 4 && u.regionMatches(k - 4, "TRY_CAST", 0, 8) &&
              isKeywordAt(u, k + 3, "TRY_CAST"))
          if (!lit(k) && isCastKw) {
            var p = k + 4
            while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
            if (p < msk.length && msk.charAt(p) == '(') {
              val close = matchParen(msk, p)
              if (close > p) {
                var asAt = -1
                var q = p + 1
                var d = 0
                while (q < close) {
                  val c = msk.charAt(q)
                  if (lit(q)) ()
                  else if (c == '(') d += 1
                  else if (c == ')') d -= 1
                  else if (d == 0 && u.regionMatches(q, "AS", 0, 2) &&
                    isKeywordAt(u, q + 1, "AS")) asAt = q
                  q += 1
                }
                if (asAt > 0) {
                  var j = asAt + 2
                  while (j < close && msk.charAt(j).isWhitespace) j += 1
                  val (spelled, tEnd) = sparkTypeTokenAt(msk, u, j)
                  if (tEnd > j && spelled != msk.substring(j, tEnd)) {
                    out = out.substring(0, j) + spelled + out.substring(tEnd)
                    changed = true
                  }
                }
              }
            }
          }
          if (!changed) k = u.indexOf("CAST", k + 1)
        }
      }
    }
    out
  }

  /** DuckDB spells the nulls modifier INSIDE the window function's
    * argument list — `lag(x IGNORE NULLS) OVER (…)` — where Spark wants
    * it between the call and OVER: `lag(x) IGNORE NULLS OVER (…)`.
    * Only calls directly followed by OVER rewrite; both modifiers
    * (IGNORE/RESPECT) move.
    */
  private[fm] def rewriteNullsModifier(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 64) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf(" NULLS")
      while (i >= 0 && !changed) {
        val kw =
          if (i >= 6 && u.regionMatches(i - 6, "IGNORE", 0, 6) && !lit(i)) "IGNORE"
          else if (i >= 7 && u.regionMatches(i - 7, "RESPECT", 0, 7) && !lit(i)) "RESPECT"
          else ""
        if (kw.nonEmpty) {
          val start = i - kw.length
          val end = i + 6 // " NULLS"
          // must sit at the END of an argument list whose ')' is
          // directly followed by OVER
          var j = end
          while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
          if (j < msk.length && msk.charAt(j) == ')') {
            var k = j + 1
            while (k < msk.length && msk.charAt(k).isWhitespace) k += 1
            if (u.regionMatches(k, "OVER", 0, 4) && isKeywordAt(u, k + 3, "OVER")) {
              out = out.substring(0, start).stripSuffix(" ").stripSuffix(",") +
                ") " + out.substring(start, end).trim.toUpperCase + " " +
                out.substring(j + 1).stripPrefix(" ")
              changed = true
            }
          }
        }
        if (!changed) i = u.indexOf(" NULLS", i + 1)
      }
    }
    out
  }

  /** DuckDB `struct_pack(name := expr, …)` → `named_struct('name',
    * expr, …)`. Only calls whose every top-level argument is an
    * `identifier := value` pair rewrite; anything else passes through
    * for the parser to reject loudly.
    */
  private[fm] def rewriteStructPack(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 32) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf("STRUCT_PACK")
      while (i >= 0 && !changed) {
        if (!lit(i) && isKeywordAt(u, i + 10, "STRUCT_PACK")) {
          var j = i + 11
          while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
          if (j < msk.length && msk.charAt(j) == '(') {
            val close = matchParen(msk, j)
            if (close > j) {
              val body = out.substring(j + 1, close)
              val args = splitTopLevelArgs(body).map {
                case (s, e) => body.substring(s, e)
              }
              val pairs = args.map { a =>
                val at = a.indexOf(":=")
                if (at < 0) null
                else {
                  val name = a.substring(0, at).trim
                  val value = a.substring(at + 2).trim
                  if (name.matches("[A-Za-z_][A-Za-z0-9_]*") && value.nonEmpty)
                    s"'$name', $value"
                  else null
                }
              }
              if (pairs.nonEmpty && !pairs.contains(null)) {
                out = out.substring(0, i) +
                  s"named_struct(${pairs.mkString(", ")})" +
                  out.substring(close + 1)
                changed = true
              }
            }
          }
        }
        if (!changed) i = u.indexOf("STRUCT_PACK", i + 1)
      }
    }
    out
  }

  /** DuckDB's `generate_series` / `range` TABLE functions: a
    * FROM-position call becomes a one-column relation named after the
    * function (`FROM generate_series(1, 4) gs` yields column
    * `generate_series`). Spark's `range` table function names its
    * column `id` and is end-exclusive only, so both spellings desugar
    * to an explode of the matching SCALAR function (registered in
    * [[register]]), which already carries the inclusive/exclusive and
    * empty-on-unreachable semantics. Arguments pass through verbatim —
    * DuckDB 1.0.0 rejects lateral column references in these calls, so
    * literal-expression arguments are the whole surface.
    */
  private[fm] def rewriteSeriesFrom(sql: String): String = {
    var out = sql
    var changed = true
    var guard = 0
    while (changed && guard < 100) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      for (fn <- Seq("GENERATE_SERIES", "RANGE") if !changed) {
        var i = u.indexOf(fn)
        while (i >= 0 && !changed) {
          if (!lit(i) && isKeywordAt(u, i + fn.length - 1, fn) &&
            fromContext(u, i - 1)) {
            var k = i + fn.length
            while (k < msk.length && msk.charAt(k).isWhitespace) k += 1
            if (k < msk.length && msk.charAt(k) == '(') {
              val close = matchParen(msk, k)
              require(close > k, s"unbalanced parens in ${fn.toLowerCase}(…)")
              val lower = fn.toLowerCase
              val call = out.substring(i, close + 1)
              out = out.substring(0, i) +
                s"(SELECT explode($call) AS $lower)" +
                out.substring(close + 1)
              changed = true
            }
          }
          if (!changed) i = u.indexOf(fn, i + 1)
        }
      }
    }
    out
  }

  /** DuckDB's FROM-first statement form: `FROM t [WHERE …]` selects `*`,
    * and `FROM t SELECT list …` reorders the clauses. Spark's parser is
    * SELECT-first only, so desugar: bare form → `SELECT * FROM t …`,
    * SELECT form → `SELECT list FROM t …` with every other clause left in
    * place. Handled at statement start (including after a top-level WITH
    * CTE list — DuckDB allows `WITH c AS (…) FROM c`) and inside
    * parenthesized subqueries (`SELECT * FROM (FROM t WHERE …)`).
    */
  private[fm] def rewriteFromFirst(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 64) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      // (a) statement start (after optional WITH clause)
      val mainAt = mainQueryStart(msk, u, lit)
      if (mainAt >= 0 && u.regionMatches(mainAt, "FROM", 0, 4) &&
        isKeywordAt(u, mainAt + 3, "FROM")) {
        out = out.substring(0, mainAt) +
          fromFirstToSelect(out.substring(mainAt), msk.substring(mainAt))
        changed = true
      } else {
        // (b) parenthesized subquery whose first token is FROM
        var i = 0
        while (i < msk.length && !changed) {
          if (msk.charAt(i) == '(' && !lit(i)) {
            var j = i + 1
            while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
            if (u.regionMatches(j, "FROM", 0, 4) && isKeywordAt(u, j + 3, "FROM")) {
              val close = matchParen(msk, i)
              if (close > i) {
                val inner = out.substring(j, close)
                out = out.substring(0, j) +
                  fromFirstToSelect(inner, msk.substring(j, close)) +
                  out.substring(close)
                changed = true
              }
            }
          }
          i += 1
        }
        // (c) FROM-first as a set-operation operand:
        // `... UNION [ALL|DISTINCT] FROM t ...` — the operand region
        // runs to the next set operator / result clause within the
        // enclosing parenthesis level.
        i = 0
        while (i < msk.length && !changed) {
          val op = Seq("UNION", "INTERSECT", "EXCEPT").find(o =>
            !lit(i) && u.regionMatches(i, o, 0, o.length) &&
              isKeywordAt(u, i + o.length - 1, o))
          if (op.isDefined) {
            var j = i + op.get.length
            def skipWs(): Unit =
              while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
            skipWs()
            Seq("ALL", "DISTINCT").foreach { m =>
              if (u.regionMatches(j, m, 0, m.length) &&
                isKeywordAt(u, j + m.length - 1, m)) { j += m.length; skipWs() }
            }
            if (u.regionMatches(j, "FROM", 0, 4) && isKeywordAt(u, j + 3, "FROM")) {
              val (_, regionEnd) = enclosingRegion(msk, u, lit, j)
              val end0 = nextTopKeywordIn(msk, u, lit, j + 4, regionEnd,
                Seq("UNION", "INTERSECT", "EXCEPT", "ORDER", "LIMIT", "OFFSET"))
              val end = if (end0 < 0) regionEnd else end0
              val tail = out.substring(end)
              val sep = if (tail.nonEmpty && !tail.head.isWhitespace) " " else ""
              out = out.substring(0, j) +
                fromFirstToSelect(out.substring(j, end), msk.substring(j, end)) +
                sep + tail
              changed = true
            }
          }
          i += 1
        }
      }
    }
    out
  }

  /** Start index of the main query body: 0 normally, or just past a
    * top-level `WITH [RECURSIVE] name [(cols)] AS (…) [, …]` CTE list.
    * -1 when the shape is not recognized (pass through untouched).
    */
  private def mainQueryStart(msk: String, u: String, lit: Array[Boolean]): Int = {
    var p = 0
    while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    if (p >= msk.length) return -1
    if (!(u.regionMatches(p, "WITH", 0, 4) && isKeywordAt(u, p + 3, "WITH"))) return p
    p += 4
    def skipWs(): Unit = while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    skipWs()
    if (u.regionMatches(p, "RECURSIVE", 0, 9) && isKeywordAt(u, p + 8, "RECURSIVE")) {
      p += 9; skipWs()
    }
    var more = true
    while (more) {
      // cte name
      val nameEnd = identEndAt(msk, p)
      if (nameEnd == p) return -1
      p = nameEnd; skipWs()
      // optional column list
      if (p < msk.length && msk.charAt(p) == '(') {
        val c = matchParen(msk, p); if (c < 0) return -1
        p = c + 1; skipWs()
      }
      if (!(u.regionMatches(p, "AS", 0, 2) && isKeywordAt(u, p + 1, "AS"))) return -1
      p += 2; skipWs()
      if (p >= msk.length || msk.charAt(p) != '(') return -1
      val c = matchParen(msk, p); if (c < 0) return -1
      p = c + 1; skipWs()
      if (p < msk.length && msk.charAt(p) == ',') { p += 1; skipWs() }
      else more = false
    }
    p
  }

  /** Desugar ONE FROM-first region (text starting at its FROM keyword).
    * `region` is the original text, `rmsk` its comment-masked twin.
    */
  private def fromFirstToSelect(region: String, rmsk: String): String = {
    val u = rmsk.toUpperCase
    val lit = literalMask(rmsk)
    val clauses = Seq("SELECT", "WHERE", "GROUP", "HAVING", "QUALIFY",
      "WINDOW", "ORDER", "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT")
    def nextClause(from: Int, kws: Seq[String]): Int = {
      var i = from
      var depth = 0
      while (i < rmsk.length) {
        val c = rmsk.charAt(i)
        if (!lit(i)) {
          if (c == '(' || c == '[') depth += 1
          else if (c == ')' || c == ']') depth -= 1
          else if (depth == 0 && kws.exists(kw =>
            u.regionMatches(i, kw, 0, kw.length) &&
              isKeywordAt(u, i + kw.length - 1, kw))) return i
        }
        i += 1
      }
      -1
    }
    val setOps = Seq("UNION", "INTERSECT", "EXCEPT")
    val teStart = 4 // past FROM
    val teEnd0 = nextClause(teStart, clauses)
    val teEnd = if (teEnd0 < 0) region.length else teEnd0
    val te = region.substring(teStart, teEnd).trim
    if (teEnd0 < 0) return s"SELECT * FROM $te"
    // A SELECT belonging to a set-operation operand is NOT this
    // statement's reordered projection: never search past the first
    // top-level set operator (`FROM t UNION SELECT 1` keeps `SELECT *`).
    val setAt = nextClause(teEnd, setOps)
    val selAt = nextClause(teEnd, Seq("SELECT"))
    if (selAt < 0 || (setAt >= 0 && selAt > setAt))
      return s"SELECT * FROM $te ${region.substring(teEnd)}"
    // clauses between the table expr and SELECT stay in order after FROM
    val between = region.substring(teEnd, selAt).trim
    val listEnd0 = nextClause(selAt + 6, clauses.filterNot(_ == "SELECT"))
    val listEnd = if (listEnd0 < 0) region.length else listEnd0
    val list = region.substring(selAt + 6, listEnd).trim
    val tail = region.substring(listEnd)
    val mid = if (between.isEmpty) "" else s" $between"
    s"SELECT $list FROM $te$mid $tail".stripTrailing()
  }

  /** DuckDB's `SIMILAR TO` is a full regex match (`~` semantics, RE2);
    * Spark spells that as an anchored RLIKE. Only literal patterns are
    * rewritten — a non-literal right side passes through and fails loudly
    * at parse rather than silently mis-matching.
    */
  private[fm] def rewriteSimilarTo(sql: String): String = {
    val sb = new StringBuilder(sql)
    var changed = true
    while (changed) {
      changed = false
      val msk = maskComments(sb.toString)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf("SIMILAR")
      while (i >= 0 && !changed) {
        if (!lit(i) && isKeywordAt(u, i + 6, "SIMILAR")) {
          var j = i + 7
          while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
          if (u.regionMatches(j, "TO", 0, 2) && isKeywordAt(u, j + 1, "TO")) {
            var k = j + 2
            while (k < msk.length && msk.charAt(k).isWhitespace) k += 1
            if (k < msk.length && msk.charAt(k) == '\'') {
              val close = literalEnd(msk, k)
              if (close > k) {
                val pat = sb.substring(k + 1, close)
                sb.replace(i, close + 1, s"RLIKE '^(?:$pat)$$'")
                changed = true
              }
            }
          }
        }
        i = u.indexOf("SIMILAR", i + 1)
      }
    }
    sb.toString
  }

  /** DuckDB's `GLOB` operator: case-sensitive fnmatch-style globbing
    * (`*`, `?`, `[…]`/`[!…]` classes, backslash escapes, `.` literal) as
    * a FULL match. Spark has no glob operator — translate the literal
    * pattern to an anchored Java regex and rewrite to RLIKE.
    */
  private[fm] def rewriteGlob(sql: String): String = {
    val sb = new StringBuilder(sql)
    var changed = true
    while (changed) {
      changed = false
      val msk = maskComments(sb.toString)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf("GLOB")
      while (i >= 0 && !changed) {
        if (!lit(i) && isKeywordAt(u, i + 3, "GLOB")) {
          var k = i + 4
          while (k < msk.length && msk.charAt(k).isWhitespace) k += 1
          if (k < msk.length && msk.charAt(k) == '\'') {
            val close = literalEnd(msk, k)
            if (close > k) {
              val pat = sb.substring(k + 1, close)
              val re = globToRegex(pat)
              sb.replace(i, close + 1, s"RLIKE '^$re$$'")
              changed = true
            }
          }
        }
        i = u.indexOf("GLOB", i + 1)
      }
    }
    sb.toString
  }

  private[fm] def globToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      val c = glob.charAt(i)
      c match {
        case '*' => sb.append(".*"); i += 1
        case '?' => sb.append('.'); i += 1
        case '\\' if i + 1 < glob.length =>
          sb.append(java.util.regex.Pattern.quote(glob.charAt(i + 1).toString))
          i += 2
        case '[' =>
          // copy the class through; fnmatch `[!…]` negation → `[^…]`
          val end = glob.indexOf(']', i + 1)
          if (end < 0) { sb.append("\\["); i += 1 }
          else {
            val body0 = glob.substring(i + 1, end)
            val body = if (body0.startsWith("!")) "^" + body0.substring(1) else body0
            sb.append('[').append(body).append(']')
            i = end + 1
          }
        case ch if "\\.[]{}()<>*+-=!?^$|".indexOf(ch) >= 0 =>
          sb.append('\\').append(ch); i += 1
        // '' (an escaped quote in the enclosing SQL literal) copies
        // through verbatim — regex sees one plain apostrophe, correct.
        case ch => sb.append(ch); i += 1
      }
    }
    sb.toString
  }

  /** A DuckDB `CREATE MACRO` definition: scalar (`AS expr`) or table
    * (`AS TABLE query`). Expansion is TEXTUAL, exactly DuckDB's model —
    * parameters substitute into the body parenthesized, the whole body
    * splices parenthesized into the call site, and names referenced by
    * the body (CTEs, views, other macros) resolve at the call site.
    */
  final case class Macro(
      name: String, params: Seq[String], body: String, isTable: Boolean)

  /** Split a script on top-level `;` (outside literals, comments, and
    * parens); empty statements are dropped.
    */
  def splitStatements(sql: String): Seq[String] = {
    val msk = maskComments(sql)
    val lit = literalMask(msk)
    val out = Seq.newBuilder[String]
    var start = 0
    var depth = 0
    var i = 0
    while (i < msk.length) {
      val c = msk.charAt(i)
      if (!lit(i)) {
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (c == ';' && depth == 0) {
          val s = sql.substring(start, i)
          if (s.trim.nonEmpty) out += s
          start = i + 1
        }
      }
      i += 1
    }
    val last = sql.substring(start)
    if (last.trim.nonEmpty) out += last
    out.result()
  }

  /** Session-scoped table DDL (the DuckDB connection model: a script
    * may CREATE TABLE AS / INSERT INTO / DROP TABLE against
    * connection-local tables; reference passthrough `query.py:72` grants
    * all of it). Only the AS-query form is parsed — column-definition
    * CREATE TABLE returns None and fails loudly at the caller.
    */
  final case class CreateTableAs(name: String, orReplace: Boolean, sourceSql: String)
  final case class InsertIntoTable(name: String, sourceSql: String)

  private val CtasRe =
    "(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+AS\\s+(\\(?\\s*(?:SELECT|WITH|FROM|VALUES|PIVOT|UNPIVOT)\\b.*)$".r
  private val InsertRe =
    "(?is)^\\s*INSERT\\s+INTO\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+(\\(?\\s*(?:SELECT|WITH|FROM|VALUES)\\b.*)$".r
  private val DropRe =
    "(?is)^\\s*DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?([A-Za-z_][A-Za-z0-9_]*)\\s*$".r

  def parseCreateTableAs(stmt: String): Option[CreateTableAs] = stmt match {
    case CtasRe(rep, name, src) => Some(CreateTableAs(name, rep != null, src))
    case _ => None
  }

  def parseInsertInto(stmt: String): Option[InsertIntoTable] = stmt match {
    case InsertRe(name, src) => Some(InsertIntoTable(name, src))
    case _ => None
  }

  /** Returns (name, ifExists). */
  def parseDropTable(stmt: String): Option[(String, Boolean)] = stmt match {
    case DropRe(ifEx, name) => Some((name, ifEx != null))
    case _ => None
  }

  /** Parse `CREATE [OR REPLACE] MACRO name(p1, p2) AS [TABLE] body`;
    * None when the statement is anything else. Parameter defaults are not
    * supported (unsupported shapes return None and fail loudly at parse).
    */
  def parseCreateMacro(stmt: String): Option[Macro] = {
    val msk = maskComments(stmt)
    val u = msk.toUpperCase
    var p = 0
    def skipWs(): Unit = while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    def kw(k: String): Boolean = {
      skipWs()
      if (u.regionMatches(p, k, 0, k.length) && isKeywordAt(u, p + k.length - 1, k)) {
        p += k.length; true
      } else false
    }
    if (!kw("CREATE")) return None
    val save = p
    if (kw("OR") && !kw("REPLACE")) return None
    if (p == save) () // no OR REPLACE
    if (!kw("MACRO") && !kw("FUNCTION")) return None
    skipWs()
    val nameEnd = identEndAt(msk, p)
    if (nameEnd == p) return None
    val name = stmt.substring(p, nameEnd)
    p = nameEnd
    skipWs()
    if (p >= msk.length || msk.charAt(p) != '(') return None
    val close = matchParen(msk, p)
    if (close < 0) return None
    val inner = stmt.substring(p + 1, close).trim
    val params =
      if (inner.isEmpty) Seq.empty[String]
      else inner.split(",").map(_.trim).toSeq
    if (params.exists(x => x.isEmpty ||
      !x.forall(c => Character.isLetterOrDigit(c) || c == '_'))) return None
    p = close + 1
    if (!kw("AS")) return None
    val save2 = p
    val isTable = kw("TABLE")
    if (!isTable) p = save2
    skipWs()
    val body = stmt.substring(p).trim.stripSuffix(";").trim
    if (body.isEmpty) None
    else Some(Macro(name, params, body, isTable))
  }

  /** Expand macro call sites in `sql` textually, to fixpoint (macros may
    * call macros; depth-guarded). A call expands only when the argument
    * count matches the definition — anything else passes through to fail
    * loudly at parse.
    */
  def expandMacros(sql: String, macros: Map[String, Macro]): String = {
    if (macros.isEmpty) return sql
    val byUpper = macros.map { case (k, v) => k.toUpperCase -> v }
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 32) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = 0
      while (i < msk.length && !changed) {
        byUpper.foreach { case (un, m) =>
          if (!changed && !lit(i) && u.regionMatches(i, un, 0, un.length) &&
            isKeywordAt(u, i + un.length - 1, un)) {
            // not a qualified reference (a.name) and not its own definition
            var b = i - 1
            while (b >= 0 && Character.isWhitespace(msk.charAt(b))) b -= 1
            val qualified = b >= 0 && msk.charAt(b) == '.'
            if (!qualified) {
              var j = i + un.length
              while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
              if (j < msk.length && msk.charAt(j) == '(') {
                val close = matchParen(msk, j)
                if (close > j) {
                  val args =
                    if (msk.substring(j + 1, close).trim.isEmpty) Vector.empty
                    else splitTopLevelArgs(msk.substring(j + 1, close))
                      .map { case (s, e) => out.substring(j + 1 + s, j + 1 + e) }
                  if (args.length == m.params.length) {
                    var body = m.body
                    m.params.zip(args).foreach { case (param, arg) =>
                      body = substituteParam(body, param, s"(${arg.trim})")
                    }
                    out = out.substring(0, i) + s"($body)" + out.substring(close + 1)
                    changed = true
                  }
                }
              }
            }
          }
        }
        i += 1
      }
    }
    out
  }

  /** Replace keyword-bounded occurrences of `param` (outside literals)
    * in a macro body with `repl`.
    */
  private def substituteParam(body: String, param: String, repl: String): String = {
    val msk = maskComments(body)
    val u = msk.toUpperCase
    val lit = literalMask(msk)
    val up = param.toUpperCase
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      if (!lit(i) && u.regionMatches(i, up, 0, up.length) &&
        isKeywordAt(u, i + up.length - 1, up) &&
        !(i > 0 && msk.charAt(i - 1) == '.')) {
        sb.append(repl)
        i += up.length
      } else {
        sb.append(body.charAt(i))
        i += 1
      }
    }
    sb.toString
  }

  /** Index of the quote CLOSING the string literal opened at `open`
    * (doubling-aware: `''` inside is an escaped quote, not an end); -1 if
    * unterminated.
    */
  private[fm] def literalEnd(msk: String, open: Int): Int = {
    var i = open + 1
    while (i < msk.length) {
      if (msk.charAt(i) == '\'') {
        if (i + 1 < msk.length && msk.charAt(i + 1) == '\'') i += 2
        else return i
      } else i += 1
    }
    -1
  }

  /** DuckDB arithmetic operators Spark lacks: `a // b` integer division
    * (truncating, multiplicative precedence — Spark's `DIV` exactly) and
    * `a ** b` / `a ^ b` power (left-associative, binds tighter than `*`,
    * looser than unary minus — pinned against DuckDB). Spark's `^` is
    * XOR, so in this DuckDB-dialect surface `^` means power and is
    * rewritten; DuckDB spells xor as the `xor()` function, which passes
    * through untouched.
    */
  private[fm] def rewriteMathOps(sql: String): String = {
    var out = rewritePower(sql)
    // DuckDB's prefix abs operator, parenthesized form only: `@(x)` →
    // `abs(x)`. The bare `@x` spelling stays untouched for Spark's
    // parser to reject loudly (no silent guess at operand extent).
    var changed = true
    while (changed) {
      changed = false
      val msk = maskComments(out)
      val lit = literalMask(msk)
      var i = 0
      while (i < msk.length && !changed) {
        if (msk.charAt(i) == '@' && !lit(i)) {
          var j = i + 1
          while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
          if (j < msk.length && msk.charAt(j) == '(') {
            out = out.substring(0, i) + "abs" + out.substring(i + 1)
            changed = true
          }
        }
        i += 1
      }
    }
    // `//` → DIV: same token length not needed; straight splice.
    changed = true
    while (changed) {
      changed = false
      val msk = maskComments(out)
      val lit = literalMask(msk)
      var i = 0
      while (i + 1 < msk.length && !changed) {
        if (msk.charAt(i) == '/' && msk.charAt(i + 1) == '/' && !lit(i)) {
          out = out.substring(0, i) + " DIV " + out.substring(i + 2)
          changed = true
        }
        i += 1
      }
    }
    out
  }

  private def rewritePower(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 64) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = 0
      while (i < msk.length && !changed) {
        val c = msk.charAt(i)
        val isPow = !lit(i) &&
          ((c == '*' && i + 1 < msk.length && msk.charAt(i + 1) == '*') || c == '^')
        if (isPow) {
          val opEnd = if (c == '^') i + 1 else i + 2
          // left operand: base segment, absorbing a unary sign in prefix
          // position (DuckDB: -2 ** 2 = 4, the sign binds tighter)
          var j = i - 1
          while (j >= 0 && Character.isWhitespace(msk.charAt(j))) j -= 1
          var ls = if (j < 0) -2 else baseStartAt(msk, u, lit, j)
          // baseStartAt refuses bare numbers (-1, bracket disambiguation);
          // for power a number IS a valid operand — recover it here.
          if (ls < 0 && j >= 0 && !lit(j)) {
            var p = j
            while (p >= 0 && (Character.isLetterOrDigit(msk.charAt(p)) ||
              msk.charAt(p) == '.' || msk.charAt(p) == '_')) p -= 1
            if (p < j) ls = p + 1
          }
          if (ls >= 0) {
            // unary sign absorption
            var s = ls
            var q = ls - 1
            while (q >= 0 && Character.isWhitespace(msk.charAt(q))) q -= 1
            if (q >= 0 && (msk.charAt(q) == '-' || msk.charAt(q) == '+')) {
              var r = q - 1
              while (r >= 0 && Character.isWhitespace(msk.charAt(r))) r -= 1
              // binary iff the previous token can END an operand: a close
              // paren/bracket, a literal, or an identifier that is NOT a
              // clause keyword (SELECT -2 ** 2 is unary; x -2 ** 2 binary)
              val binary = r >= 0 && {
                val c2 = msk.charAt(r)
                if (c2 == ')' || c2 == ']' || c2 == '`' || lit(r)) true
                else if (Character.isLetterOrDigit(c2) || c2 == '_') {
                  var p2 = r
                  while (p2 >= 0 && (Character.isLetterOrDigit(msk.charAt(p2)) ||
                    msk.charAt(p2) == '_')) p2 -= 1
                  !NonBaseKeywords(u.substring(p2 + 1, r + 1))
                } else false
              }
              if (!binary) s = q
            }
            val re = forwardSegEnd(msk, lit, opEnd)
            if (re > opEnd) {
              val lhs = out.substring(s, j + 1)
              val rhs = out.substring(opEnd, re).trim
              out = out.substring(0, s) + s"power($lhs, $rhs)" + out.substring(re)
              changed = true
            }
          }
        }
        i += 1
      }
    }
    out
  }

  /** End (exclusive) of the operand starting at/after `from`: optional
    * unary sign, then a number / identifier chain / function call /
    * parenthesized expression, with `.`-joined tails. -1 if unsupported.
    */
  private def forwardSegEnd(msk: String, lit: Array[Boolean], from: Int): Int = {
    var i = from
    while (i < msk.length && msk.charAt(i).isWhitespace) i += 1
    if (i >= msk.length) return -1
    if (msk.charAt(i) == '-' || msk.charAt(i) == '+') {
      i += 1
      while (i < msk.length && msk.charAt(i).isWhitespace) i += 1
    }
    if (i >= msk.length) return -1
    def isIdent(ch: Char) = Character.isLetterOrDigit(ch) || ch == '_'
    val c = msk.charAt(i)
    if (c == '(') {
      val close = matchParen(msk, i)
      if (close < 0) -1 else close + 1
    } else if (isIdent(c)) {
      var e = i
      while (e < msk.length && (isIdent(msk.charAt(e)) || msk.charAt(e) == '.')) e += 1
      // function call?
      var w = e
      while (w < msk.length && msk.charAt(w).isWhitespace) w += 1
      if (w < msk.length && msk.charAt(w) == '(' &&
        !Character.isDigit(msk.charAt(i))) {
        val close = matchParen(msk, w)
        if (close < 0) -1 else close + 1
      } else e
    } else -1
  }

  /** DuckDB's in-aggregate ordering `string_agg(x, sep ORDER BY k)` →
    * Spark's `string_agg(x, sep) WITHIN GROUP (ORDER BY k)` (same
    * function since 4.0; `listagg` gets the same treatment).
    */
  private[fm] def rewriteOrderedAgg(sql: String): String = {
    var out = sql
    var changed = true
    while (changed) {
      changed = false
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      for (fn <- Seq("STRING_AGG", "LISTAGG", "GROUP_CONCAT") if !changed) {
        var i = u.indexOf(fn)
        while (i >= 0 && !changed) {
          if (!lit(i) && isKeywordAt(u, i + fn.length - 1, fn)) {
            var j = i + fn.length
            while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
            if (j < msk.length && msk.charAt(j) == '(') {
              val close = matchParen(msk, j)
              val ob = if (close > j)
                findTopKeyword(u, msk, lit, j + 1, close, "ORDER") else -1
              if (ob >= 0) {
                val orderTail = out.substring(ob, close).trim
                val args = out.substring(j + 1, ob).trim
                out = out.substring(0, j) +
                  s"($args) WITHIN GROUP ($orderTail)" + out.substring(close + 1)
                changed = true
              }
            }
          }
          i = u.indexOf(fn, i + 1)
        }
      }
    }
    out
  }

  /** DuckDB `date_diff('day', a, b)` / `datediff(…)` count BOUNDARY
    * CROSSINGS, where Spark's parser-owned date_diff special form counts
    * COMPLETE units (DuckDB: date_diff('month', Jan 31, Feb 1) = 1;
    * Spark: 0 — the r12 gap probe caught the divergence). DuckDB's
    * `date_sub('day', a, b)` / `datesub` are its complete-unit pair.
    * Rename each spelling (recognized by the QUOTED literal first
    * argument) to the graft_ registration implementing the right
    * counting — truncate-both-then-diff for boundaries, plain
    * timestampdiff for complete units.
    */
  private[fm] def rewriteDateDiffUnit(sql: String): String = {
    var out = sql
    val renames = Seq(
      "DATE_DIFF" -> "graft_date_diff", "DATEDIFF" -> "graft_date_diff",
      "DATE_SUB" -> "graft_date_part_sub", "DATESUB" -> "graft_date_part_sub")
    for ((name, target) <- renames) {
      var changed = true
      while (changed) {
        changed = false
        val msk = maskComments(out)
        val u = msk.toUpperCase
        val lit = literalMask(msk)
        var i = u.indexOf(name)
        while (i >= 0 && !changed) {
          if (!lit(i) && isKeywordAt(u, i + name.length - 1, name)) {
            var j = i + name.length
            while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
            if (j < msk.length && msk.charAt(j) == '(') {
              var k = j + 1
              while (k < msk.length && msk.charAt(k).isWhitespace) k += 1
              // only the quoted-unit form is DuckDB's part-counting call;
              // e.g. Spark-style date_sub(date, n) passes through
              if (k < msk.length && msk.charAt(k) == '\'') {
                out = out.substring(0, i) + target + out.substring(i + name.length)
                changed = true
              }
            }
          }
          if (!changed) i = u.indexOf(name, i + 1)
        }
      }
    }
    out
  }

  /** DuckDB's bare `SEMI JOIN` / `ANTI JOIN` keywords → Spark's
    * `LEFT SEMI JOIN` / `LEFT ANTI JOIN` (identical semantics: DuckDB's
    * unprefixed forms are left variants). Already-prefixed `LEFT SEMI`
    * passes through (Spark-native); `RIGHT SEMI`/`RIGHT ANTI` have no
    * Spark SQL spelling and pass through to fail loudly at parse rather
    * than silently flipping sides.
    */
  private[fm] def rewriteSemiAnti(sql: String): String = {
    var out = sql
    var changed = true
    while (changed) {
      changed = false
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      for (kw <- Seq("SEMI", "ANTI") if !changed) {
        var i = u.indexOf(kw)
        while (i >= 0 && !changed) {
          if (!lit(i) && isKeywordAt(u, i + kw.length - 1, kw)) {
            var j = i + kw.length
            while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
            if (u.regionMatches(j, "JOIN", 0, 4) && isKeywordAt(u, j + 3, "JOIN")) {
              // previous word must not be LEFT or RIGHT
              var b = i - 1
              while (b >= 0 && Character.isWhitespace(msk.charAt(b))) b -= 1
              var ws = b
              while (ws >= 0 && (Character.isLetterOrDigit(msk.charAt(ws)) ||
                msk.charAt(ws) == '_')) ws -= 1
              val prev = u.substring(ws + 1, b + 1)
              if (prev != "LEFT" && prev != "RIGHT") {
                out = out.substring(0, i) + "LEFT " + out.substring(i)
                changed = true
              }
            }
          }
          i = u.indexOf(kw, i + 1)
        }
      }
    }
    out
  }

  /** DuckDB's `UNION [ALL] BY NAME`: columns are matched by name, the
    * result schema is the union of both sides' columns (left-first
    * order), and a column absent on one side is NULL there. Spark SQL
    * has no BY NAME spelling, so desugar to a plain UNION over aligned
    * projections. `columnsOf` resolves a probe query's output columns —
    * the same provider pattern as PIVOT/ASOF (the probe text includes
    * the statement's WITH prefix so CTE references resolve).
    * INTERSECT/EXCEPT BY NAME are not rewritten (pass through to fail
    * loudly rather than guess shared-column semantics).
    */
  def rewriteUnionByName(sql: String, columnsOf: String => Seq[String]): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 32) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      def skipWs(k0: Int): Int = {
        var k = k0
        while (k < msk.length && msk.charAt(k).isWhitespace) k += 1
        k
      }
      var i = 0
      while (i < msk.length && !changed) {
        if (!lit(i) && u.regionMatches(i, "UNION", 0, 5) &&
          isKeywordAt(u, i + 4, "UNION")) {
          var j = skipWs(i + 5)
          var all = false
          if (u.regionMatches(j, "ALL", 0, 3) && isKeywordAt(u, j + 2, "ALL")) {
            all = true; j = skipWs(j + 3)
          } else if (u.regionMatches(j, "DISTINCT", 0, 8) &&
            isKeywordAt(u, j + 7, "DISTINCT")) {
            j = skipWs(j + 8)
          }
          if (u.regionMatches(j, "BY", 0, 2) && isKeywordAt(u, j + 1, "BY")) {
            val k = skipWs(j + 2)
            if (u.regionMatches(k, "NAME", 0, 4) && isKeywordAt(u, k + 3, "NAME")) {
              // region: innermost paren enclosing i, else the statement
              // body (past any WITH prefix)
              val (regionStart, regionEnd) = enclosingRegion(msk, u, lit, i)
              // Probe prefix: only the COMPLETE CTE definitions that end
              // before this region. When the BY NAME being rewritten sits
              // INSIDE a CTE body, the full WITH prefix would carry the
              // unrewritten BY NAME into the probe and fail analysis —
              // earlier CTEs are exactly what the operands can reference.
              val withPrefix = cteprefixBefore(out, msk, u, lit, regionStart)
              val left = out.substring(regionStart, i).trim
              val rEnd0 = nextTopKeywordIn(msk, u, lit, k + 4, regionEnd,
                Seq("UNION", "INTERSECT", "EXCEPT", "ORDER", "LIMIT", "OFFSET"))
              val rightEnd = if (rEnd0 < 0) regionEnd else rEnd0
              val right = out.substring(k + 4, rightEnd).trim
              def probe(frag: String): Seq[String] = columnsOf(
                s"${withPrefix}SELECT * FROM (\n$frag\n) __graft_ubn_probe LIMIT 0")
              val lc = probe(left)
              val rc = probe(right)
              val merged = lc ++ rc.filterNot(c => lc.exists(_.equalsIgnoreCase(c)))
              def sel(cols: Seq[String]): String = merged.map { m =>
                if (cols.exists(_.equalsIgnoreCase(m))) s"`$m`"
                else s"NULL AS `$m`"
              }.mkString(", ")
              val op = if (all) "UNION ALL" else "UNION"
              val repl = s"SELECT ${sel(lc)} FROM ($left) __graft_ubn_l $op " +
                s"SELECT ${sel(rc)} FROM ($right) __graft_ubn_r"
              val tail = out.substring(rightEnd)
              val sep = if (tail.nonEmpty && !tail.head.isWhitespace) " " else ""
              out = out.substring(0, regionStart) + repl + sep + tail
              changed = true
            }
          }
        }
        i += 1
      }
    }
    out
  }

  /** A parsed `COPY <source> TO '<path>' [(options)]` statement:
    * `sourceSql` is the query to materialize (a bare table name becomes
    * `SELECT * FROM name`), format is PARQUET/CSV/JSON (explicit FORMAT
    * option, else inferred from the path extension like DuckDB).
    */
  final case class CopyTo(
      sourceSql: String, path: String, format: String, header: Boolean)

  /** Parse a COPY ... TO statement; None when the statement is anything
    * else (including COPY FROM, which this engine does not support —
    * pass-through fails loudly at parse).
    */
  def parseCopyTo(stmt: String): Option[CopyTo] = {
    val msk = maskComments(stmt)
    val u = msk.toUpperCase
    var p = 0
    def skipWs(): Unit =
      while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    skipWs()
    if (!(u.regionMatches(p, "COPY", 0, 4) && isKeywordAt(u, p + 3, "COPY")))
      return None
    p += 4; skipWs()
    val source: String =
      if (p < msk.length && msk.charAt(p) == '(') {
        val close = matchParen(msk, p)
        if (close < 0) return None
        val q = stmt.substring(p + 1, close); p = close + 1; q
      } else {
        val e = identEndAt(msk, p)
        if (e == p) return None
        val name = stmt.substring(p, e); p = e; s"SELECT * FROM $name"
      }
    skipWs()
    if (!(u.regionMatches(p, "TO", 0, 2) && isKeywordAt(u, p + 1, "TO")))
      return None
    p += 2; skipWs()
    if (p >= msk.length || msk.charAt(p) != '\'') return None
    val close = literalEnd(msk, p)
    if (close < 0) return None
    val path = stmt.substring(p + 1, close).replace("''", "'")
    p = close + 1; skipWs()
    var format = ""
    var header: Option[Boolean] = None
    if (p < msk.length && msk.charAt(p) == '(') {
      val c2 = matchParen(msk, p)
      if (c2 < 0) return None
      // Every option must be recognized — an option this engine cannot
      // honor (DELIMITER, COMPRESSION, ...) would silently produce a
      // file DuckDB would not have written, so it fails loudly instead.
      // DuckDB accepts the format bare or quoted (FORMAT CSV / 'csv')
      // and HEADER with TRUE/FALSE/1/0/ON/OFF or no value at all.
      val fmtRe = "^FORMAT\\s+(?:'([A-Z]+)'|\"([A-Z]+)\"|([A-Z]+))$".r
      val hdrRe = "^HEADER(?:\\s+(TRUE|FALSE|1|0|ON|OFF))?$".r
      stmt.substring(p + 1, c2).split(",").map(_.trim).filter(_.nonEmpty)
        .foreach { opt =>
          val up = opt.toUpperCase
          val fm = fmtRe.findFirstMatchIn(up)
          val hd = hdrRe.findFirstMatchIn(up)
          if (fm.isDefined)
            format = Seq(fm.get.group(1), fm.get.group(2), fm.get.group(3))
              .find(_ != null).get
          else if (hd.isDefined)
            header = Some(hd.get.group(1) match {
              case "FALSE" | "0" | "OFF" => false
              case _ => true // bare HEADER, TRUE, 1, ON
            })
          else throw new IllegalArgumentException(
            s"unsupported COPY option: $opt (supported: FORMAT, HEADER)")
        }
      p = c2 + 1
    }
    if (format.isEmpty) {
      val lp = path.toLowerCase
      format =
        if (lp.endsWith(".parquet")) "PARQUET"
        else if (lp.endsWith(".csv")) "CSV"
        else if (lp.endsWith(".json") || lp.endsWith(".ndjson") ||
          lp.endsWith(".jsonl")) "JSON"
        else return None
    }
    if (!Set("PARQUET", "CSV", "JSON")(format)) return None
    if (stmt.substring(p).trim.stripSuffix(";").trim.nonEmpty) return None
    // DuckDB writes a header line for CSV unless HEADER FALSE is given;
    // parquet/json have no header concept, so the default only matters
    // for CSV and matches the reference engine's observed v1.0 behavior.
    Some(CopyTo(source, path, format, header.getOrElse(format == "CSV")))
  }

  /** Spark type → DuckDB type spelling, for DESCRIBE parity. */
  def duckTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => "VARCHAR"
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case ArrayType(e, _) => duckTypeName(e) + "[]"
      case m: MapType =>
        s"MAP(${duckTypeName(m.keyType)}, ${duckTypeName(m.valueType)})"
      case s: StructType =>
        s.fields.map(f => s"${f.name} ${duckTypeName(f.dataType)}")
          .mkString("STRUCT(", ", ", ")")
      case other => other.simpleString.toUpperCase
    }
  }

  /** DuckDB's `SHOW TABLES` statement → the engine's one-table catalog
    * as DuckDB's single `name` column; `SHOW <target>` is DuckDB's
    * DESCRIBE alias and is normalized to DESCRIBE for [[rewriteDescribe]]
    * (which must run after this).
    */
  private[fm] def rewriteShow(sql: String, tables: Seq[String]): String = {
    val msk = maskComments(sql)
    val u = msk.toUpperCase
    var p = 0
    while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    if (!(u.regionMatches(p, "SHOW", 0, 4) && isKeywordAt(u, p + 3, "SHOW")))
      return sql
    var q = p + 4
    while (q < msk.length && msk.charAt(q).isWhitespace) q += 1
    if (u.regionMatches(q, "TABLES", 0, 6) && isKeywordAt(u, q + 5, "TABLES") &&
      sql.substring(q + 6).trim.stripSuffix(";").trim.isEmpty) {
      val rows = tables.sorted
        .map(t => s"('${t.replace("'", "''")}')").mkString(", ")
      s"SELECT * FROM (VALUES $rows) AS __graft_show(name)"
    } else sql.substring(0, p) + "DESCRIBE " + sql.substring(q)
  }

  /** DuckDB's `DESCRIBE`/`DESC` statement (and its table-function form
    * inside a FROM subquery): resolve the target's schema through the
    * provider and splice the DuckDB-shaped six-column result
    * (column_name, column_type, null, key, default, extra) as a VALUES
    * relation. A bare identifier target describes `SELECT * FROM ident`;
    * anything else is treated as a query. `schemaOf` receives a probe
    * query fragment and returns (name, duckdb-type) pairs.
    */
  def rewriteDescribe(
      sql: String, schemaOf: String => Seq[(String, String)]): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      def kwLen(i: Int): Int =
        if (u.regionMatches(i, "DESCRIBE", 0, 8) && isKeywordAt(u, i + 7, "DESCRIBE")) 8
        else if (u.regionMatches(i, "DESC", 0, 4) && isKeywordAt(u, i + 3, "DESC")) 4
        else -1
      // splice [from, end) where the region is `DESCRIBE <target>`
      def tryAt(from: Int, end: Int): Boolean = {
        var i = from
        while (i < end && msk.charAt(i).isWhitespace) i += 1
        val k = kwLen(i)
        if (k < 0) return false
        val inner = out.substring(i + k, end).trim
        if (inner.isEmpty) return false
        val frag =
          if (inner.matches("[A-Za-z_][A-Za-z0-9_.]*")) s"SELECT * FROM $inner"
          else inner
        val rows = schemaOf(frag).map { case (n, t) =>
          s"('${n.replace("'", "''")}', '$t', 'YES', " +
            "CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING))"
        }.mkString(", ")
        val repl = s"SELECT * FROM (VALUES $rows) AS __graft_describe(" +
          "column_name, column_type, `null`, `key`, `default`, `extra`)"
        out = out.substring(0, from) + repl + out.substring(end)
        true
      }
      // (a) whole statement
      var p = 0
      while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
      if (kwLen(p) > 0) changed = tryAt(p, out.length)
      // (b) parenthesized table-function position. Only the full
      // DESCRIBE spelling here: a parenthesized expression over a column
      // named `desc` must not trigger (the DESC shorthand stays
      // statement-level, like DuckDB's own contextual resolution).
      var i = 0
      while (i < msk.length && !changed) {
        if (msk.charAt(i) == '(' && !lit(i)) {
          var j = i + 1
          while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
          if (kwLen(j) == 8) {
            val close = matchParen(msk, i)
            if (close > i) changed = tryAt(j, close)
          }
        }
        i += 1
      }
    }
    out
  }

  /** The statement's WITH prefix truncated to the complete CTE
    * definitions whose bodies END before `pos` (empty when there are
    * none): `WITH a AS (…), b AS (…)` cut after the last `)` before
    * `pos`. Safe to prepend to a schema probe of a fragment at `pos` —
    * it contains every CTE the fragment can reference and nothing after
    * it (in particular not the CTE the fragment sits inside).
    */
  private def cteprefixBefore(
      out: String, msk: String, u: String, lit: Array[Boolean],
      pos: Int): String = {
    var p = 0
    while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    if (!(u.regionMatches(p, "WITH", 0, 4) && isKeywordAt(u, p + 3, "WITH")))
      return ""
    p += 4
    def skipWs(): Unit =
      while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    skipWs()
    if (u.regionMatches(p, "RECURSIVE", 0, 9) && isKeywordAt(u, p + 8, "RECURSIVE")) {
      p += 9; skipWs()
    }
    var lastComplete = -1
    var more = true
    while (more) {
      val nameEnd = identEndAt(msk, p)
      if (nameEnd == p) more = false
      else {
        p = nameEnd; skipWs()
        if (p < msk.length && msk.charAt(p) == '(') {
          val c = matchParen(msk, p)
          if (c < 0) return finishCte(out, lastComplete)
          p = c + 1; skipWs()
        }
        if (!(u.regionMatches(p, "AS", 0, 2) && isKeywordAt(u, p + 1, "AS")))
          return finishCte(out, lastComplete)
        p += 2; skipWs()
        if (p >= msk.length || msk.charAt(p) != '(')
          return finishCte(out, lastComplete)
        val c = matchParen(msk, p)
        if (c < 0) return finishCte(out, lastComplete)
        p = c + 1
        if (p <= pos) lastComplete = p
        skipWs()
        if (p < msk.length && msk.charAt(p) == ',' && p < pos) { p += 1; skipWs() }
        else more = false
      }
    }
    finishCte(out, lastComplete)
  }

  private def finishCte(out: String, lastComplete: Int): String =
    if (lastComplete < 0) "" else out.substring(0, lastComplete) + " "

  /** (start, end) of the query region holding position `at`: the content
    * span of the innermost parenthesis pair enclosing `at`, or the
    * statement body (past any top-level WITH prefix) when unparenthesized.
    */
  private def enclosingRegion(
      msk: String, u: String, lit: Array[Boolean], at: Int): (Int, Int) = {
    var best = -1
    var bestClose = msk.length
    var i = 0
    while (i < at) {
      if (msk.charAt(i) == '(' && !lit(i)) {
        val close = matchParen(msk, i)
        if (close > at && i > best) { best = i; bestClose = close }
      }
      i += 1
    }
    if (best >= 0) (best + 1, bestClose)
    else {
      val ms = mainQueryStart(msk, u, lit)
      (math.max(ms, 0), msk.length)
    }
  }

  /** First depth-0 occurrence of any of `kws` as a keyword in
    * [from, until); -1 when none.
    */
  private def nextTopKeywordIn(msk: String, u: String, lit: Array[Boolean],
      from: Int, until: Int, kws: Seq[String]): Int = {
    var i = from
    var depth = 0
    while (i < until) {
      val c = msk.charAt(i)
      if (!lit(i)) {
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (depth == 0 && kws.exists(kw =>
          u.regionMatches(i, kw, 0, kw.length) &&
            isKeywordAt(u, i + kw.length - 1, kw))) return i
      }
      i += 1
    }
    -1
  }

  /** Length-preserving comment mask: every character inside a `--` line
    * comment or a bracketed comment is replaced by a space, so
    * index-based syntax scanning (quote parity, paren matching, keyword
    * search) never sees quotes or parens that live in comments, while
    * splice positions stay aligned with the original text. Comment
    * openers inside single-quoted literals are data and left alone.
    */
  private[fm] def maskComments(sql: String): String = {
    val a = sql.toCharArray
    var i = 0
    var inStr = false
    while (i < a.length) {
      val c = a(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (c == '-' && i + 1 < a.length && a(i + 1) == '-') {
        while (i < a.length && a(i) != '\n') { a(i) = ' '; i += 1 }
      } else if (c == '/' && i + 1 < a.length && a(i + 1) == '*') {
        a(i) = ' '; a(i + 1) = ' '; i += 2
        while (i < a.length && !(a(i) == '*' && i + 1 < a.length && a(i + 1) == '/')) {
          a(i) = ' '; i += 1
        }
        if (i + 1 < a.length) { a(i) = ' '; a(i + 1) = ' '; i += 2 }
        else if (i < a.length) { a(i) = ' '; i += 1 }
      } else i += 1
    }
    new String(a)
  }

  /** DuckDB JSON-literal schema hints — rewritten ONLY when they are the
    * second argument of a `from_json(...)` call. A bare `'[]'` elsewhere
    * in the query is DATA (the JSON encoding of an empty array, which the
    * files table stores per ADR-0006) and must pass through untouched.
    */
  private[fm] def rewriteFromJsonHints(sql: String): String = {
    val m = maskComments(sql)
    val u = m.toUpperCase
    val out = new StringBuilder
    var i = 0
    var last = 0
    while (i >= 0 && i < sql.length) {
      i = u.indexOf("FROM_JSON", i)
      if (i >= 0) {
        val insideLiteral = m.substring(0, i).count(_ == '\'') % 2 == 1
        var k = i + "FROM_JSON".length
        while (k < m.length && Character.isWhitespace(m.charAt(k))) k += 1
        if (!insideLiteral && k < m.length && m.charAt(k) == '(') {
          val close = matchParen(m, k)
          if (close > 0) {
            // Scan argument structure on the masked text (quotes/parens in
            // comments are spaces there); extract arg text from the original.
            val bounds = splitTopLevelArgs(m.substring(k + 1, close))
            val args = bounds.map { case (s0, e0) => sql.substring(k + 1 + s0, k + 1 + e0) }
            val argsMasked = bounds.map { case (s0, e0) => m.substring(k + 1 + s0, k + 1 + e0) }
            val rewrittenArgs =
              if (args.length >= 2) {
                val a2 = argsMasked(1).trim
                val hinted =
                  if (a2.length >= 2 && a2.head == '\'' && a2.last == '\'')
                    hintToDdl(a2.substring(1, a2.length - 1)).map(d => s"'$d'")
                  else None
                hinted match {
                  case Some(h) =>
                    val a2raw = argsMasked(1)
                    val lead = a2raw.takeWhile(_.isWhitespace)
                    val trail = a2raw.reverse.takeWhile(_.isWhitespace).reverse
                    args.updated(1, lead + h + trail)
                  case None => args
                }
              } else args
            out.append(sql.substring(last, k + 1))
            // recurse for nested from_json in the first argument
            out.append(rewrittenArgs.map(rewriteFromJsonHints).mkString(","))
            out.append(')')
            last = close + 1
            i = close + 1
          } else i = k
        } else i = k
      }
    }
    out.append(sql.substring(last))
    out.toString
  }

  /** Split a paren-free-at-top-level argument list into (start, end)
    * index pairs, respecting nested parens and single-quoted literals.
    * Callers pass the MASKED text so comment contents never confuse the
    * scan, then slice the original at the returned boundaries.
    */
  private def splitTopLevelArgs(s: String): Vector[(Int, Int)] = {
    val args = Vector.newBuilder[(Int, Int)]
    var depth = 0
    var inStr = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ',' && depth == 0) { args += ((start, i)); start = i + 1 }
      i += 1
    }
    args += ((start, s.length))
    args.result()
  }

  /** `["VARCHAR"]` → `array<string>`, `[""]` → `array<string>`,
    * `{"a": "INT"}` → `struct<a:bigint>`; None when not a recognizable
    * hint (leaves ordinary string literals untouched).
    */
  private[fm] def hintToDdl(hint: String): Option[String] = {
    def typeName(t: String): Option[String] = t.trim.stripPrefix("\"").stripSuffix("\"").toUpperCase match {
      case "VARCHAR" | "TEXT" | "STRING" | "" => Some("string")
      case "INT" | "INTEGER" | "BIGINT"       => Some("bigint")
      case "DOUBLE" | "FLOAT" | "REAL"        => Some("double")
      case "BOOLEAN" | "BOOL"                 => Some("boolean")
      case "DATE"                             => Some("date")
      case _                                  => None
    }
    val t = hint.trim
    if (t.startsWith("[") && t.endsWith("]")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.startsWith("[") && inner.endsWith("]"))
        hintToDdl(inner).map(i => s"array<$i>")
      else typeName(inner).map(i => s"array<$i>")
    } else if (t.startsWith("{") && t.endsWith("}")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) None
      else {
        val fields = inner.split(",").toSeq.map { f =>
          f.split(":") match {
            case Array(k, v) =>
              typeName(v).map(tn => s"${k.trim.stripPrefix("\"").stripSuffix("\"")}:$tn")
            case _ => None
          }
        }
        if (fields.forall(_.isDefined)) Some(s"struct<${fields.flatten.mkString(",")}>")
        else None
      }
    } else None
  }

  /** FROM-position lateral UNNEST → LATERAL VIEW explode. Handles
    * `, UNNEST(expr) AS alias(col)`, `, UNNEST(expr) AS col`, and bare
    * `, UNNEST(expr)` (column named `unnest`, DuckDB's default). Only
    * rewrites when the preceding non-space char is a comma in FROM
    * context (so `SELECT a, UNNEST(x)` projections are left alone).
    */
  private[fm] def rewriteUnnest(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      // All syntax decisions scan the masked text (comments → spaces, so a
      // quote or comma living in a comment is never syntax and a comment
      // between ',' and UNNEST reads as whitespace); replacement text is
      // sliced from the original.
      val msk = maskComments(out)
      val u = msk.toUpperCase
      var i = u.indexOf("UNNEST")
      while (i >= 0 && !changed) {
        // preceding non-whitespace must be ','; occurrences inside
        // single-quoted string literals are data, not syntax (doubled ''
        // escapes keep the parity count correct)
        var j = i - 1
        while (j >= 0 && Character.isWhitespace(msk.charAt(j))) j -= 1
        val insideLiteral = msk.substring(0, i).count(_ == '\'') % 2 == 1
        val inFrom = !insideLiteral &&
          j >= 0 && msk.charAt(j) == ',' && fromContext(u, j)
        if (inFrom) {
          // parse UNNEST ( <balanced> )
          var k = i + "UNNEST".length
          while (k < msk.length && Character.isWhitespace(msk.charAt(k))) k += 1
          if (k < msk.length && msk.charAt(k) == '(') {
            val close = matchParen(msk, k)
            if (close > 0) {
              val expr = out.substring(k + 1, close)
              // optional: AS alias(col) | AS col
              var p = close + 1
              while (p < msk.length && Character.isWhitespace(msk.charAt(p))) p += 1
              var alias = "_unnest"
              var colName = "unnest"
              var end = close + 1
              if (p + 2 <= msk.length && u.startsWith("AS", p)) {
                var q = p + 2
                while (q < msk.length && Character.isWhitespace(msk.charAt(q))) q += 1
                val identEnd = identEndAt(msk, q)
                if (identEnd > q) {
                  val ident = out.substring(q, identEnd)
                  var r = identEnd
                  while (r < msk.length && Character.isWhitespace(msk.charAt(r))) r += 1
                  if (r < msk.length && msk.charAt(r) == '(') {
                    val pc = matchParen(msk, r)
                    if (pc > 0) {
                      alias = ident
                      colName = out.substring(r + 1, pc).trim
                      end = pc + 1
                    }
                  } else {
                    alias = "_unnest"
                    colName = ident
                    end = identEnd
                  }
                }
              }
              val replacement = s" LATERAL VIEW explode($expr) $alias AS $colName"
              out = out.substring(0, j) + replacement + out.substring(end)
              changed = true
            }
          }
        }
        if (!changed) i = u.indexOf("UNNEST", i + 1)
      }
    }
    out
  }

  /** DuckDB `SELECT * EXCLUDE (a, b)` / `t.* EXCLUDE a` star modifier →
    * Spark's `* EXCEPT (a, b)` (supported since Spark 3.4). Only fires
    * when the preceding non-whitespace char is `*` so the EXCLUDE
    * keyword anywhere else (e.g. an identifier) survives; the bare
    * single-column form gains the parens Spark requires.
    */
  private[fm] def rewriteExclude(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      var i = u.indexOf("EXCLUDE")
      while (i >= 0 && !changed) {
        val insideLiteral = msk.substring(0, i).count(_ == '\'') % 2 == 1
        val kwOk = isKeywordAt(u, i + "EXCLUDE".length - 1, "EXCLUDE")
        var j = i - 1
        while (j >= 0 && Character.isWhitespace(msk.charAt(j))) j -= 1
        if (!insideLiteral && kwOk && j >= 0 && msk.charAt(j) == '*') {
          var k = i + "EXCLUDE".length
          while (k < msk.length && Character.isWhitespace(msk.charAt(k))) k += 1
          if (k < msk.length && msk.charAt(k) == '(') {
            out = out.substring(0, i) + "EXCEPT" + out.substring(i + "EXCLUDE".length)
            changed = true
          } else {
            val identEnd = identEndAt(msk, k)
            if (identEnd > k) {
              val ident = out.substring(k, identEnd)
              out = out.substring(0, i) + s"EXCEPT ($ident)" + out.substring(identEnd)
              changed = true
            }
          }
        }
        if (!changed) i = u.indexOf("EXCLUDE", i + 1)
      }
    }
    out
  }

  /** DuckDB `QUALIFY pred` (post-window filter; Spark SQL has none) →
    * subquery + WHERE, one query block at a time:
    *
    *  - pred WITHOUT a window call references select-list aliases →
    *    `SELECT * FROM ( <block> ) WHERE (pred) <tail>`;
    *  - pred WITH an inline `... OVER (...)` needs the block's base
    *    columns, so the predicate becomes a helper column computed
    *    alongside the original select list and dropped outside:
    *    `SELECT * EXCEPT (__graft_qualify) FROM ( SELECT <list>,
    *    (pred) AS __graft_qualify FROM <rest> ) WHERE __graft_qualify`.
    *
    * The block's trailing ORDER BY / LIMIT stays outside the wrap (its
    * aliases remain visible through `SELECT *`). Same pre-pass
    * discipline as [[rewriteUnnest]]: all syntax decisions on the
    * comment-masked text, splices from the original.
    */
  /** Per-index "inside a single-quoted literal" flags over MASKED text
    * (the opening/closing quotes themselves read as inside).
    */
  private[fm] def literalMask(msk: String): Array[Boolean] = {
    val in = new Array[Boolean](msk.length)
    var i = 0
    var s = false
    while (i < msk.length) {
      if (msk.charAt(i) == '\'') { in(i) = true; s = !s }
      else in(i) = s
      i += 1
    }
    in
  }

  private[fm] def rewriteQualify(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf("QUALIFY")
      while (i >= 0 && !changed) {
        val insideLiteral = msk.substring(0, i).count(_ == '\'') % 2 == 1
        if (!insideLiteral && isKeywordAt(u, i + "QUALIFY".length - 1, "QUALIFY")) {
          // Enclosing block start: nearest SELECT walking backwards at the
          // same paren depth.
          var blockStart = -1
          var depth = 0
          var j = i - 1
          while (j >= 0 && blockStart < 0) {
            val c = msk.charAt(j)
            if (lit(j)) () // literal contents are data, not syntax
            else if (c == ')') depth += 1
            else if (c == '(') depth -= 1
            else if (depth == 0 && u.charAt(j) == 'T' && j >= 5 &&
              u.regionMatches(j - 5, "SELECT", 0, 6) &&
              (j - 5 == 0 || !Character.isLetterOrDigit(u.charAt(j - 6))) &&
              (j == u.length - 1 || !Character.isLetterOrDigit(u.charAt(j + 1))))
              blockStart = j - 5
            j -= 1
          }
          // Predicate end: first same-depth ORDER/LIMIT/WINDOW/set-op
          // keyword, a block-closing ')', or end of text.
          var predEnd = -1
          var k = i + "QUALIFY".length
          var d2 = 0
          while (k < msk.length && predEnd < 0) {
            val c = msk.charAt(k)
            if (lit(k)) () // literal contents are data, not syntax
            else if (c == '(') d2 += 1
            else if (c == ')') { if (d2 == 0) predEnd = k else d2 -= 1 }
            else if (d2 == 0 && Seq("ORDER", "LIMIT", "WINDOW", "UNION", "INTERSECT", "EXCEPT")
              .exists(kw => u.regionMatches(k, kw, 0, kw.length) &&
                isKeywordAt(u, k + kw.length - 1, kw)))
              predEnd = k
            if (predEnd < 0) k += 1
          }
          if (predEnd < 0) predEnd = msk.length
          if (blockStart >= 0) {
            val head = out.substring(blockStart, i)
            val pred = out.substring(i + "QUALIFY".length, predEnd).trim
            val predMasked = msk.substring(i + "QUALIFY".length, predEnd)
            val predOff = i + "QUALIFY".length
            val hasWindow = {
              val pu = predMasked.toUpperCase
              (0 until pu.length).exists(p =>
                !lit(predOff + p) &&
                pu.regionMatches(p, "OVER", 0, 4) && isKeywordAt(pu, p + 3, "OVER"))
            }
            val replacement =
              if (!hasWindow)
                s"SELECT * FROM ( $head ) WHERE ($pred) "
              else {
                // Top-level FROM inside the block's head — the helper
                // column splices in just before it.
                val headMsk = msk.substring(blockStart, i)
                val hu = headMsk.toUpperCase
                var fromAt = -1
                var d3 = 0
                var p = 0
                while (p < hu.length && fromAt < 0) {
                  val c = headMsk.charAt(p)
                  if (lit(blockStart + p)) ()
                  else if (c == '(') d3 += 1
                  else if (c == ')') d3 -= 1
                  else if (d3 == 0 && hu.regionMatches(p, "FROM", 0, 4) &&
                    isKeywordAt(hu, p + 3, "FROM")) fromAt = p
                  p += 1
                }
                if (fromAt < 0) null
                else {
                  val withHelper = head.substring(0, fromAt) +
                    s", ($pred) AS __graft_qualify " + head.substring(fromAt)
                  s"SELECT * EXCEPT (__graft_qualify) FROM ( $withHelper ) WHERE __graft_qualify "
                }
              }
            if (replacement != null) {
              out = out.substring(0, blockStart) + replacement + out.substring(predEnd)
              changed = true
            }
          }
        }
        if (!changed) i = u.indexOf("QUALIFY", i + 1)
      }
    }
    out
  }

  /** DuckDB window-frame `EXCLUDE` — Spark frames have no exclusion, so
    * the aggregate is recomputed over the two sub-frames AROUND the
    * current row and recombined (all result shapes verified against
    * DuckDB v1.0.0):
    *
    *   - `EXCLUDE NO OTHERS` — the default, stripped (no-op);
    *   - `EXCLUDE CURRENT ROW` over `ROWS BETWEEN a AND b`:
    *       sum   → NULL-aware addition (both sides empty → NULL),
    *       count → plain addition (empty side counts 0),
    *       min/max → least/greatest (NULL-skipping in both engines),
    *       avg   → exact (sum_before + sum_after)/(count_before +
    *               count_after) — one IEEE division of exact parts;
    *     a side that cannot contain rows (frame edge at CURRENT ROW) is
    *     dropped; a frame that never contains the current row makes the
    *     exclusion a no-op; a frame that contains ONLY the current row
    *     yields DuckDB's empty-frame result (NULL; count 0);
    *     KNOWN DIVERGENCE: for a frame that never contains the current
    *     row (e.g. `UNBOUNDED PRECEDING AND 2 PRECEDING`), DuckDB
    *     v1.0.0 is NOT a no-op — it computes the frame as if the end
    *     were 1 PRECEDING (measured: sum over (1..5) at row 5 returns
    *     100, i.e. rows 1-4, not the declared 60 = rows 1-3). That
    *     contradicts the SQL standard ("remove the current row from the
    *     frame" — here it was never in it); this rewrite keeps the
    *     standard no-op;
    *   - `EXCLUDE GROUP` / `EXCLUDE TIES` (peers = rows with the same
    *     ORDER BY key) for sum/count/avg over a ROWS frame containing
    *     the current row: the excluded set is frame ∩ peer-group =
    *     [max(gs,rs)..cur] ∪ [cur+1..min(ge,re)] where gs/ge are the
    *     peer-group edges and rs/re the ROWS-frame edges. Each CANDIDATE
    *     interval is a constant-bound window — [rs..cur] and [cur+1..re]
    *     directly as ROWS frames; [gs..cur] = cum − (gcum − gall) and
    *     [cur+1..ge] = gcum − cum, where cum = ROWS(∞ PRECEDING..CUR),
    *     gcum = RANGE(∞ PRECEDING..CUR) (ends at the peer-group END),
    *     gall = RANGE(CUR..CUR) (exactly the peer group) — and the
    *     tighter candidate is picked by comparing COUNT(*) windows over
    *     the same intervals: both candidates share the current-row
    *     endpoint, so the smaller row count IS the later start/earlier
    *     end. TIES adds the current row's own value back. min/max stay
    *     a loud failure: a minimum over frame-minus-peers is not
    *     decomposable into constant-bound windows (prefix minima can't
    *     be subtracted), unlike the additive aggregates;
    *   - all three modes over a RANGE frame straddling the current row,
    *     for the additive aggregates — see [[rewriteExcludeRange]] (the
    *     peer group is always fully inside such a frame, so no
    *     intersection pick is needed);
    *   - GROUPS frames fail loudly — which is exact PARITY, not a gap:
    *     DuckDB v1.0.0 (the reference's engine, the oracle) itself
    *     rejects them with "GROUPS mode for window functions is not
    *     implemented yet", so no passthrough query can contain one.
    */
  private[fm] def rewriteWindowExclude(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 64) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf("EXCLUDE")
      while (i >= 0 && !changed) {
        if (!lit(i) && isKeywordAt(u, i + 6, "EXCLUDE")) {
          var j = i + 7
          while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
          val mode =
            if (u.regionMatches(j, "CURRENT", 0, 7) && isKeywordAt(u, j + 6, "CURRENT")) "CURRENT"
            else if (u.regionMatches(j, "NO", 0, 2) && isKeywordAt(u, j + 1, "NO")) "NO"
            else if (u.regionMatches(j, "GROUP", 0, 5) && isKeywordAt(u, j + 4, "GROUP")) "GROUP"
            else if (u.regionMatches(j, "TIES", 0, 4) && isKeywordAt(u, j + 3, "TIES")) "TIES"
            else ""
          // enclosing '(' — must be an OVER clause for this to be a
          // window-frame EXCLUDE (the star modifier has no paren+OVER)
          var depth = 0
          var openAt = -1
          var p = i - 1
          while (p >= 0 && openAt < 0) {
            val c = msk.charAt(p)
            if (!lit(p)) {
              if (c == ')') depth += 1
              else if (c == '(') { if (depth == 0) openAt = p else depth -= 1 }
            }
            p -= 1
          }
          var q = openAt - 1
          while (q >= 0 && msk.charAt(q).isWhitespace) q -= 1
          val isOver = openAt >= 0 && q >= 3 &&
            u.regionMatches(q - 3, "OVER", 0, 4) && isKeywordAt(u, q, "OVER")
          if (mode.nonEmpty && isOver) {
            // end of the EXCLUDE clause: CURRENT ROW / NO OTHERS are
            // two words, GROUP / TIES one
            var k = j + (mode match {
              case "CURRENT" => 7; case "NO" => 2; case "GROUP" => 5; case _ => 4 })
            val exclEnd =
              if (mode == "CURRENT" || mode == "NO") {
                while (k < msk.length && msk.charAt(k).isWhitespace) k += 1
                val word = if (mode == "CURRENT") "ROW" else "OTHERS"
                require(u.regionMatches(k, word, 0, word.length),
                  s"EXCLUDE ${if (mode == "CURRENT") "CURRENT" else "NO"} must be followed by $word")
                k + word.length
              } else k
            if (mode == "NO") {
              // the default — strip the clause
              out = out.substring(0, i).stripSuffix(" ") + out.substring(exclEnd)
              changed = true
            } else {
              val closeAt = matchParen(msk, openAt)
              require(closeAt > openAt, "unbalanced OVER clause")
              // <fn>(args) immediately before OVER
              val overStart = q - 3
              var r0 = overStart - 1
              while (r0 >= 0 && msk.charAt(r0).isWhitespace) r0 -= 1
              require(r0 >= 0 && msk.charAt(r0) == ')',
                "EXCLUDE CURRENT ROW: expected <aggregate>(args) OVER (...)")
              var d2 = 0
              var argOpen = -1
              var s0 = r0
              while (s0 >= 0 && argOpen < 0) {
                val c = msk.charAt(s0)
                if (!lit(s0)) {
                  if (c == ')') d2 += 1
                  else if (c == '(') { d2 -= 1; if (d2 == 0) argOpen = s0 }
                }
                s0 -= 1
              }
              require(argOpen > 0, "EXCLUDE CURRENT ROW: malformed aggregate call")
              var f0 = argOpen - 1
              while (f0 >= 0 && (Character.isLetterOrDigit(msk.charAt(f0)) ||
                msk.charAt(f0) == '_')) f0 -= 1
              val fnName = out.substring(f0 + 1, argOpen).trim
              val args = out.substring(argOpen + 1, r0)
              val fu = fnName.toUpperCase
              // frame bounds: ROWS|RANGE BETWEEN <a> AND <b> EXCLUDE ...
              val rowsAt = findTopKeyword(u, msk, lit, openAt + 1, i, "ROWS")
              val rangeAt =
                if (rowsAt >= 0) -1
                else findTopKeyword(u, msk, lit, openAt + 1, i, "RANGE")
              val isRange = rangeAt >= 0
              require(rowsAt >= 0 || rangeAt >= 0,
                s"EXCLUDE $mode requires an explicit ROWS or RANGE BETWEEN " +
                  "frame (GROUPS exclusion is not supported)")
              if (mode == "CURRENT" && !isRange)
                require(Set("SUM", "COUNT", "MIN", "MAX", "AVG")(fu),
                  s"EXCLUDE CURRENT ROW is supported for sum/count/min/max/avg, not $fnName")
              else
                require(Set("SUM", "COUNT", "AVG", "MIN", "MAX")(fu),
                  s"EXCLUDE $mode over a ${if (isRange) "RANGE" else "ROWS"} " +
                    s"frame is supported for sum/count/avg/min/max, not $fnName")
              val frameKwAt = if (isRange) rangeAt else rowsAt
              val frameKwLen = if (isRange) 5 else 4
              val betweenAt = findTopKeyword(u, msk, lit, frameKwAt + frameKwLen, i, "BETWEEN")
              require(betweenAt >= 0, "EXCLUDE: the window frame must use BETWEEN")
              val andAt = findTopKeyword(u, msk, lit, betweenAt + 7, i, "AND")
              require(andAt >= 0, "EXCLUDE: malformed window frame")
              val prefix = out.substring(openAt + 1, frameKwAt).trim
              val aTxt = out.substring(betweenAt + 7, andAt).trim
              val bTxt = out.substring(andAt + 3, i).trim
              def cls(t: String): (String, Long) = {
                val tu = t.toUpperCase.replaceAll("\\s+", " ")
                if (tu == "UNBOUNDED PRECEDING") ("UP", 0L)
                else if (tu == "CURRENT ROW") ("CR", 0L)
                else if (tu == "UNBOUNDED FOLLOWING") ("UF", 0L)
                else if (tu.endsWith(" PRECEDING")) ("NP", tu.dropRight(10).trim.toLong)
                else if (tu.endsWith(" FOLLOWING")) ("NF", tu.dropRight(10).trim.toLong)
                else throw new IllegalArgumentException(s"unsupported frame bound: $t")
              }
              val (ak, an) = cls(aTxt)
              val (bk, bn) = cls(bTxt)
              val hasBefore = ak == "UP" || (ak == "NP" && an >= 1)
              val hasAfter = bk == "UF" || (bk == "NF" && bn >= 1)
              // frame entirely before/after the current row → no-op
              val noop = (ak == "NF" && an >= 1) || (bk == "NP" && bn >= 1)
              def w(fn2: String, lo: String, hi: String) =
                s"$fn2($args) OVER ($prefix ROWS BETWEEN $lo AND $hi)"
              val minMaxTwoLayer = (fu == "MIN" || fu == "MAX") &&
                (mode == "GROUP" || mode == "TIES" || isRange)
              if (minMaxTwoLayer) {
                // min/max aren't subtraction-decomposable, so GROUP/TIES
                // (and RANGE CURRENT ROW) restructure the enclosing
                // SELECT into two window layers instead of replacing the
                // expression in place — see restructureMinMaxExclude.
                require(findTopKeyword(u, msk, lit, openAt + 1, frameKwAt, "ORDER") >= 0,
                  s"EXCLUDE $mode requires an ORDER BY in the window")
                out = restructureMinMaxExclude(
                  out, msk, u, lit, f0 + 1, closeAt + 1,
                  fu, args, prefix, mode, ak, bk)
                changed = true
              } else {
              val repl: String =
                if (isRange) rewriteExcludeRange(
                  mode, fu, args, prefix, aTxt, bTxt, ak, bk,
                  u, msk, lit, openAt, rangeAt)
                else if (mode != "CURRENT") rewriteExcludePeers(
                  mode, fu, args, prefix, aTxt, bTxt, ak, bk,
                  u, msk, lit, openAt, rowsAt)
                else if (noop) s"$fnName($args) OVER ($prefix ROWS BETWEEN $aTxt AND $bTxt)"
                else (hasBefore, hasAfter) match {
                  case (true, true) =>
                    lazy val wb = w(fnName, aTxt, "1 PRECEDING")
                    lazy val wa = w(fnName, "1 FOLLOWING", bTxt)
                    // COUNT suffixes over an UNBOUNDED FOLLOWING end as
                    // total − cumulative (two O(rows) frames) instead of
                    // the per-row-recomputed (1 FOLLOWING, UF) window
                    // (quadratic, r17); exact for counts. SUM/MIN/MAX
                    // keep the direct window (float parity / no
                    // subtraction inverse for extremes).
                    def cntAfter(cf: String) =
                      if (bk == "UF")
                        s"(${w(cf, "UNBOUNDED PRECEDING", "UNBOUNDED FOLLOWING")} - " +
                          s"${w(cf, "UNBOUNDED PRECEDING", "CURRENT ROW")})"
                      else w(cf, "1 FOLLOWING", bTxt)
                    fu match {
                      case "SUM" =>
                        s"CASE WHEN $wb IS NULL AND $wa IS NULL THEN NULL " +
                          s"ELSE coalesce($wb, 0) + coalesce($wa, 0) END"
                      case "COUNT" => s"($wb + ${cntAfter(fnName)})"
                      case "MIN" => s"least($wb, $wa)"
                      case "MAX" => s"greatest($wb, $wa)"
                      case "AVG" =>
                        val sb2 = w("sum", aTxt, "1 PRECEDING")
                        val sa2 = w("sum", "1 FOLLOWING", bTxt)
                        val cb2 = w("count", aTxt, "1 PRECEDING")
                        val ca2 = cntAfter("count")
                        s"CASE WHEN $cb2 + $ca2 = 0 THEN NULL " +
                          s"ELSE (coalesce($sb2, 0) + coalesce($sa2, 0)) / ($cb2 + $ca2) END"
                    }
                  case (true, false) => w(fnName, aTxt, "1 PRECEDING")
                  case (false, true) =>
                    if (fu == "COUNT" && bk == "UF")
                      s"(${w(fnName, "UNBOUNDED PRECEDING", "UNBOUNDED FOLLOWING")} - " +
                        s"${w(fnName, "UNBOUNDED PRECEDING", "CURRENT ROW")})"
                    else w(fnName, "1 FOLLOWING", bTxt)
                  case (false, false) =>
                    // only the current row was in the frame — DuckDB's
                    // empty-frame result, typed via a never-taken branch
                    if (fu == "COUNT") "CAST(0 AS BIGINT)"
                    else s"CASE WHEN 1 = 0 THEN " +
                      s"$fnName($args) OVER ($prefix ROWS BETWEEN $aTxt AND $bTxt) " +
                      "ELSE NULL END"
                }
              out = out.substring(0, f0 + 1) + "(" + repl + ")" +
                out.substring(closeAt + 1)
              changed = true
              }
            }
          }
        }
        if (!changed) i = u.indexOf("EXCLUDE", i + 1)
      }
    }
    out
  }

  /** Two-layer rewrite for `min`/`max` with `EXCLUDE GROUP`/`TIES`
    * (ROWS or RANGE) and `EXCLUDE CURRENT ROW` over a RANGE frame —
    * the cases a single window layer cannot express (extremes don't
    * recombine by subtraction the way sums do). The enclosing SELECT
    * block restructures into
    *
    *   SELECT … <combined> … FROM (SELECT *, <helpers> FROM rel …) rel …
    *
    * where the INNER layer computes per-row helper windows over the
    * original rows and the OUTER layer combines them with peer-group
    * windows:
    *
    *   - before-group piece (frame start UNBOUNDED PRECEDING): the
    *     running min/max over `ROWS UNBOUNDED PRECEDING AND 1
    *     PRECEDING`, PICKED at the peer group's physically-first row
    *     (row_number = rank — exactly one per group) and broadcast to
    *     the group via max(CASE …) OVER (RANGE CURRENT..CURRENT). The
    *     picked value covers [partition start .. group start − 1] and
    *     is tie-order-invariant even though row_number isn't.
    *   - after-group piece (frame end UNBOUNDED FOLLOWING): the same
    *     running-extreme machinery over the INVERTED order (r17): under
    *     `ORDER BY … DESC NULLS LAST` the strictly-later groups are the
    *     running prefix, picked at the group's reverse-first row. The
    *     former (1 FOLLOWING, UNBOUNDED FOLLOWING) spelling made Spark
    *     recompute the frame per row — quadratic per partition.
    *   - peers-minus-current piece (CURRENT ROW mode only): the group
    *     extreme `gm` is group-constant, so the OUTER layer can count
    *     how many peers attain it and take the second-distinct extreme
    *     — if the current row's value isn't the extreme (or attains it
    *     with multiplicity ≥ 2) the answer is `gm`, else the runner-up.
    *   - TIES adds the current row's own value back.
    *
    * The pieces combine with least/greatest (NULL-skipping in Spark,
    * matching the empty-side semantics). Supported envelope: frame
    * bounds must be UNBOUNDED or CURRENT ROW (peer-aligned — the only
    * frames deterministic under ties; a numeric-offset bound makes the
    * before/after pieces row-dependent and fails loudly), and the FROM
    * must be a single base relation (the inner SELECT * passthrough
    * re-exposes it under the same alias, keeping qualified references
    * valid). All shapes differentially fuzzed against DuckDB v1.0.0
    * (win_exclude family min/max members).
    */
  /** `PARTITION BY … ORDER BY …` window-spec text with every ORDER BY
    * item's direction AND null ordering inverted — the exact reversed
    * traversal, so a suffix aggregate over the original order becomes a
    * running prefix aggregate over the inverted one (used by
    * [[restructureMinMaxExclude]] to avoid Spark's per-row-recomputed
    * UNBOUNDED FOLLOWING frames). Items split on top-level commas;
    * defaults made explicit (ASC ⇒ NULLS FIRST, DESC ⇒ NULLS LAST in
    * both engines' window sorts).
    */
  private[fm] def invertOrderBy(prefix: String): String = {
    val u2 = prefix.toUpperCase
    // top-level ORDER keyword (outside parens and quotes — backtick
    // regions too: a backtick-quoted identifier like `order` passes
    // isKeywordAt's boundary checks and would be misdetected as the
    // keyword, mis-splitting the spec; ADVICE r17)
    var obAt = -1
    var d = 0
    var q: Char = 0
    var i = 0
    while (i < prefix.length && obAt < 0) {
      val c = prefix.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '\'' || c == '`') q = c
      else if (c == '(') d += 1
      else if (c == ')') d -= 1
      else if (d == 0 && u2.regionMatches(i, "ORDER", 0, 5) &&
        isKeywordAt(u2, i + 4, "ORDER")) obAt = i
      i += 1
    }
    require(obAt >= 0, s"invertOrderBy: no ORDER BY in window spec: $prefix")
    val byAt = u2.indexOf("BY", obAt + 5)
    val head = prefix.substring(0, byAt + 2)
    val itemsTxt = prefix.substring(byAt + 2)
    // split on top-level commas (same quote tracking as the scan above)
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    d = 0; q = 0
    var j = 0
    while (j < itemsTxt.length) {
      val c = itemsTxt.charAt(j)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '\'' || c == '`') q = c
      else if (c == '(') d += 1
      else if (c == ')') d -= 1
      else if (d == 0 && c == ',') { items += itemsTxt.substring(start, j); start = j + 1 }
      j += 1
    }
    items += itemsTxt.substring(start)
    val inv = items.map { raw =>
      var t = raw.trim
      val nullsRe = "(?is)\\s+NULLS\\s+(FIRST|LAST)\\s*$".r
      val dirRe = "(?is)\\s+(ASC|DESC)\\s*$".r
      val nulls = nullsRe.findFirstMatchIn(t).map(_.group(1).toUpperCase)
      t = nullsRe.replaceFirstIn(t, "")
      val dir = dirRe.findFirstMatchIn(t).map(_.group(1).toUpperCase)
      t = dirRe.replaceFirstIn(t, "").trim
      val effDir = dir.getOrElse("ASC")
      val effNulls = nulls.getOrElse(if (effDir == "ASC") "FIRST" else "LAST")
      val newDir = if (effDir == "ASC") "DESC" else "ASC"
      val newNulls = if (effNulls == "FIRST") "LAST" else "FIRST"
      s"$t $newDir NULLS $newNulls"
    }
    head + " " + inv.mkString(", ")
  }

  private def restructureMinMaxExclude(
      out: String, msk: String, u: String, lit: Array[Boolean],
      exprStart: Int, exprEnd: Int,
      fu: String, args: String, prefix: String,
      mode: String, ak: String, bk: String): String = {
    require(ak == "UP" || ak == "CR",
      s"min/max EXCLUDE $mode: the frame start must be UNBOUNDED " +
        "PRECEDING or CURRENT ROW (an offset start makes the " +
        "before-group piece row-dependent)")
    require(bk == "UF" || bk == "CR",
      s"min/max EXCLUDE $mode: the frame end must be UNBOUNDED " +
        "FOLLOWING or CURRENT ROW (an offset end makes the " +
        "after-group piece row-dependent)")
    // enclosing SELECT: nearest same-depth SELECT walking backwards
    var blockStart = -1
    var depth = 0
    var j = exprStart - 1
    while (j >= 0 && blockStart < 0) {
      val c = msk.charAt(j)
      if (lit(j)) ()
      else if (c == ')') depth += 1
      else if (c == '(') depth -= 1
      else if (depth == 0 && u.charAt(j) == 'T' && j >= 5 &&
        isKeywordAt(u, j, "SELECT")) blockStart = j - 5
      j -= 1
    }
    require(blockStart >= 0, s"min/max EXCLUDE $mode: no enclosing SELECT")
    // skip ALL whitespace after SELECT before testing for DISTINCT —
    // 'SELECT  DISTINCT' / a newline must fail as loudly as one space
    var afterSel = blockStart + 6
    while (afterSel < u.length && u.charAt(afterSel).isWhitespace) afterSel += 1
    require(!(u.regionMatches(afterSel, "DISTINCT", 0, 8) &&
        isKeywordAt(u, afterSel + 7, "DISTINCT")),
      s"min/max EXCLUDE $mode over SELECT DISTINCT is not supported")
    // top-level FROM of the block
    var fromAt = -1
    var d2 = 0
    var p = blockStart + 6
    while (p < msk.length && fromAt < 0) {
      val c = msk.charAt(p)
      if (lit(p)) ()
      else if (c == '(') d2 += 1
      else if (c == ')') { require(d2 > 0, s"min/max EXCLUDE $mode: no FROM in block"); d2 -= 1 }
      else if (d2 == 0 && isKeywordAt(u, p + 3, "FROM") &&
        u.regionMatches(p, "FROM", 0, 4)) fromAt = p
      if (fromAt < 0) p += 1
    }
    require(fromAt > exprEnd,
      s"min/max EXCLUDE $mode: the window must sit in the SELECT list")
    // relation zone: FROM … up to the first same-depth trailing clause
    val stoppers = Seq("GROUP", "HAVING", "QUALIFY", "WINDOW", "ORDER",
      "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT")
    var zoneEnd = -1
    var stopKw = ""
    var d3 = 0
    var q2 = fromAt + 4
    while (q2 < msk.length && zoneEnd < 0) {
      val c = msk.charAt(q2)
      if (lit(q2)) ()
      else if (c == '(') d3 += 1
      else if (c == ')') { if (d3 == 0) zoneEnd = q2 else d3 -= 1 }
      else if (d3 == 0) stoppers.find(kw =>
        u.regionMatches(q2, kw, 0, kw.length) &&
          isKeywordAt(u, q2 + kw.length - 1, kw)) match {
        case Some(kw) => stopKw = kw; zoneEnd = q2
        case None => ()
      }
      if (zoneEnd < 0) q2 += 1
    }
    if (zoneEnd < 0) zoneEnd = msk.length
    require(stopKw != "GROUP" && stopKw != "HAVING",
      s"min/max EXCLUDE $mode in a grouped SELECT is not supported")
    // single base relation (optional alias): the inner SELECT * wrap
    // re-exposes it under the same name
    val whereAt = findTopKeyword(u, msk, lit, fromAt + 4, zoneEnd, "WHERE")
    val relEnd = if (whereAt >= 0) whereAt else zoneEnd
    var relStart = fromAt + 4
    while (relStart < relEnd && msk.charAt(relStart).isWhitespace) relStart += 1
    val aliasName =
      if (relStart < relEnd && msk.charAt(relStart) == '(') {
        // parenthesized subquery + mandatory alias (the shape a previous
        // min/max-EXCLUDE pass in the same block leaves behind)
        val close = matchParen(msk, relStart)
        require(close > relStart && close < relEnd,
          s"min/max EXCLUDE $mode: malformed subquery relation")
        val toks = out.substring(close + 1, relEnd).trim
          .split("\\s+").filter(t => t.nonEmpty && !t.equalsIgnoreCase("AS"))
        require(toks.length == 1 && toks(0).matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"min/max EXCLUDE $mode requires an aliased single-relation FROM " +
            s"(got: ${out.substring(relStart, relEnd).trim})")
        toks(0)
      } else {
        val relToks = out.substring(relStart, relEnd).trim
          .split("\\s+").filter(t => t.nonEmpty && !t.equalsIgnoreCase("AS"))
        require(relToks.length >= 1 && relToks.length <= 2 &&
          relToks.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
          s"min/max EXCLUDE $mode is supported over a single-relation FROM " +
            s"(got: ${out.substring(relStart, relEnd).trim})")
        relToks.last
      }
    // A previous min/max-EXCLUDE pass in the same block leaves
    // `FROM ( SELECT *, __graft_mm… ) alias` behind. Instead of nesting
    // another layer per expression (r12's three-layer plan made this
    // the slowest catalog row), SPLICE this expression's helpers into
    // the EXISTING layer and reuse textually identical helper columns
    // (row_number/rank/count share one definition across expressions) —
    // all helpers are windows over the same block's relation, so one
    // layer is semantically identical and Spark computes every helper
    // in a single Window pass over one sort.
    val priorWrap: Option[(Int, Int)] =
      if (relStart < relEnd && msk.charAt(relStart) == '(') {
        val close = matchParen(msk, relStart)
        val body = out.substring(relStart + 1, close)
        if (body.trim.toUpperCase.startsWith("SELECT *,") &&
            body.contains("__graft_mm")) Some((relStart + 1, close))
        else None
      } else None
    val h = s"__graft_mm${out.sliding(10).count(_ == "__graft_mm")}_"
    val grpW = s"OVER ($prefix RANGE BETWEEN CURRENT ROW AND CURRENT ROW)"
    val helpers = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    if (ak == "UP") {
      helpers += (s"${h}rn" -> s"row_number() OVER ($prefix)")
      helpers += (s"${h}rk" -> s"rank() OVER ($prefix)")
      helpers += (s"${h}bg" ->
        s"$fu($args) OVER ($prefix ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)")
      pieces += s"max(CASE WHEN ${h}rn = ${h}rk THEN ${h}bg END) $grpW"
    }
    if (bk == "UF") {
      // r17: the suffix extreme used to be picked at the group's last
      // row from a (1 FOLLOWING, UNBOUNDED FOLLOWING) window — a frame
      // Spark's window executor recomputes FROM SCRATCH per row
      // (UnboundedFollowingWindowFunctionFrame), i.e. O(rows²) per
      // partition: thread dumps of q_fm_win_exclude_minmax showed the
      // whole exec pinned there. Mirror the before-group piece instead:
      // under the INVERTED order, the strictly-later groups are exactly
      // the running prefix, so the same O(rows) running-extreme +
      // pick-at-first-group-row machinery applies (min/max are order-
      // insensitive, and peer groups are identical under both orders).
      // Costs one extra in-partition sort; removes the quadratic frame.
      val rev = invertOrderBy(prefix)
      helpers += (s"${h}rn2" -> s"row_number() OVER ($rev)")
      helpers += (s"${h}rk2" -> s"rank() OVER ($rev)")
      helpers += (s"${h}ag" ->
        s"$fu($args) OVER ($rev ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)")
      pieces += s"max(CASE WHEN ${h}rn2 = ${h}rk2 THEN ${h}ag END) $grpW"
    }
    if (mode == "TIES" || mode == "CURRENT")
      helpers += (s"${h}x" -> s"($args)")
    if (mode == "TIES") pieces += s"${h}x"
    if (mode == "CURRENT") {
      helpers += (s"${h}gm" ->
        s"$fu($args) OVER ($prefix RANGE BETWEEN CURRENT ROW AND CURRENT ROW)")
      val cmp = if (fu == "MIN") ">" else "<"
      val cntEq = s"count(CASE WHEN ${h}x = ${h}gm THEN 1 END) $grpW"
      val runnerUp = s"$fu(CASE WHEN ${h}x $cmp ${h}gm THEN ${h}x END) $grpW"
      pieces += s"(CASE WHEN ${h}x IS NULL THEN ${h}gm " +
        s"WHEN ${h}x <> ${h}gm THEN ${h}gm " +
        s"WHEN ($cntEq) >= 2 THEN ${h}gm ELSE ($runnerUp) END)"
    }
    val combined =
      if (pieces.isEmpty) s"CASE WHEN 1 = 0 THEN $fu($args) OVER ($prefix) ELSE NULL END"
      else if (pieces.length == 1) pieces.head
      else {
        val comb = if (fu == "MIN") "least" else "greatest"
        s"$comb(${pieces.mkString(", ")})"
      }
    if (helpers.isEmpty)
      // empty excluded-frame result (e.g. GROUP over CURRENT..CURRENT):
      // a typed NULL needs no inner layer — plain expression splice
      return out.substring(0, exprStart) + "(" + combined + ")" +
        out.substring(exprEnd)
    priorWrap match {
      case Some((bodyStart, bodyEnd)) =>
        val body = out.substring(bodyStart, bodyEnd)
        // reuse helpers whose defining expression already exists in the
        // layer (match on the exact `<expr> AS __graft_mm` text)
        var merged = combined
        val fresh = helpers.filter { case (n, e) =>
          val at = body.indexOf(s"$e AS __graft_mm")
          if (at < 0) true
          else {
            val ns = at + s"$e AS ".length
            var ne = ns
            while (ne < body.length && (body.charAt(ne).isLetterOrDigit ||
                body.charAt(ne) == '_')) ne += 1
            // identifier-boundary replace: this pass's helper names are
            // not prefix-free (`…rn` prefixes `…rn2`), so a plain
            // substring replace of `…rn` would also corrupt every
            // `…rn2` reference into an undefined column (ADVICE r17)
            merged = merged.replaceAll(
              java.util.regex.Pattern.quote(n) + "(?![A-Za-z0-9_])",
              java.util.regex.Matcher.quoteReplacement(body.substring(ns, ne)))
            false
          }
        }
        val insertAt = bodyStart + body.indexOf(',') + 1 // after "SELECT *,"
        val addition =
          if (fresh.isEmpty) ""
          else " " + fresh.map { case (n, e) => s"$e AS $n" }.mkString(", ") + ","
        // splice the later position (the layer body) first so the
        // expression indices stay valid
        val withHelpers =
          out.substring(0, insertAt) + addition + out.substring(insertAt)
        withHelpers.substring(0, exprStart) + "(" + merged + ")" +
          withHelpers.substring(exprEnd)
      case None =>
        val inner = "SELECT *, " +
          helpers.map { case (n, e) => s"$e AS $n" }.mkString(", ") +
          " " + out.substring(fromAt, zoneEnd).trim
        out.substring(0, exprStart) + "(" + combined + ")" +
          out.substring(exprEnd, fromAt) +
          s"FROM ( $inner ) $aliasName " + out.substring(zoneEnd)
    }
  }

  /** Build the replacement expression for `EXCLUDE GROUP` / `EXCLUDE
    * TIES` — see [[rewriteWindowExclude]]'s scaladoc for the interval
    * algebra. `fu` is the upper-cased aggregate (SUM/COUNT/AVG),
    * `prefix` the OVER-clause text before ROWS, `aTxt`/`bTxt` the
    * declared frame bounds and `ak`/`bk` their classified kinds.
    * All result shapes differentially fuzzed against DuckDB v1.0.0
    * (win_exclude family, all four modes). Float caveat: SUM/AVG
    * recombine by subtraction, which is exact for integral/decimal
    * inputs but can differ from DuckDB in the last ulp for DOUBLE
    * columns — same class of caveat as the CURRENT ROW path's
    * addition order.
    */
  private def rewriteExcludePeers(
      mode: String, fu: String, args: String, prefix: String,
      aTxt: String, bTxt: String, ak: String, bk: String,
      u: String, msk: String, lit: Array[Boolean],
      openAt: Int, rowsAt: Int): String = {
    require(ak != "NF" && bk != "NP",
      s"EXCLUDE $mode requires a frame containing the current row")
    require(findTopKeyword(u, msk, lit, openAt + 1, rowsAt, "ORDER") >= 0,
      s"EXCLUDE $mode requires an ORDER BY in the window (peers are the " +
        "current row's ORDER BY ties)")
    val UPB = "UNBOUNDED PRECEDING"
    val CR = "CURRENT ROW"
    def ro(g: String, lo: String, hi: String) =
      s"$g OVER ($prefix ROWS BETWEEN $lo AND $hi)"
    def ra(g: String, lo: String, hi: String) =
      s"$g OVER ($prefix RANGE BETWEEN $lo AND $hi)"
    // Interval pieces for an inner aggregate g. Sums pass z =
    // coalesce-to-0 (an empty/all-NULL side must not poison the
    // arithmetic); counts pass identity. RANGE frames with only
    // UNBOUNDED/CURRENT bounds are peer-group-aligned in both engines,
    // whatever the ORDER BY column types.
    def pieces(g: String, z: String => String): (String, String, String, String) = {
      val cum = z(ro(g, UPB, CR))   // [1..cur]
      val gcum = z(ra(g, UPB, CR))  // [1..ge]: RANGE end = peer-group end
      val gall = z(ra(g, CR, CR))   // [gs..ge]: exactly the peer group
      val rsCur = z(ro(g, aTxt, CR))                 // [rs..cur]
      val gsCur = s"($cum - ($gcum - $gall))"        // [gs..cur]
      // [cur+1..re]. For COUNT with an UNBOUNDED FOLLOWING end, derive
      // the suffix as whole-partition total minus cumulative — both
      // O(rows) frames — instead of the (1 FOLLOWING, UNBOUNDED
      // FOLLOWING) window Spark recomputes per row (quadratic, r17);
      // exact for counts. SUMs keep the direct window: recombining a
      // DOUBLE sum by subtraction can move the last ulp, and this
      // piece's direct spelling is what the fuzz family pinned.
      val cur1Re =
        if (bk == "CR") "0"
        else if (bk == "UF" && g.toUpperCase.startsWith("COUNT"))
          s"(${z(ro(g, UPB, "UNBOUNDED FOLLOWING"))} - $cum)"
        else z(ro(g, "1 FOLLOWING", bTxt)) // [cur+1..re]
      val cur1Ge = s"($gcum - $cum)"                 // [cur+1..ge]
      (rsCur, gsCur, cur1Re, cur1Ge)
    }
    val id = (s: String) => s
    val z0 = (s: String) => s"coalesce($s, 0)"
    // Structural comparisons via COUNT(*) windows: both candidates for
    // a side share the current-row endpoint, so the smaller row count
    // IS the tighter interval (the true intersection bound).
    val (cRs, cGs, cRe, cGe) = pieces("COUNT(*)", id)
    def excluded(g: String, z: String => String): String = {
      val (rs, gs, re, ge) = pieces(g, z)
      val left = s"(CASE WHEN $cRs <= $cGs THEN $rs ELSE $gs END)"
      val right =
        if (bk == "CR") "0"
        else s"(CASE WHEN $cRe <= $cGe THEN $re ELSE $ge END)"
      s"($left + $right)"
    }
    def frameW(g: String, z: String => String) = z(ro(g, aTxt, bTxt))
    val isStar = args.trim == "*"
    val cntArg = s"COUNT($args)"
    // Residual count of rows the aggregate actually sees (COUNT(expr)
    // skips NULLs, COUNT(*) doesn't — matching each result's semantics).
    def resCnt(g: String) = s"(${frameW(g, id)} - ${excluded(g, id)})"
    val curNonNull =
      if (isStar) "1" else s"(CASE WHEN ($args) IS NULL THEN 0 ELSE 1 END)"
    fu match {
      case "COUNT" =>
        val base = resCnt(cntArg)
        if (mode == "GROUP") base else s"($base + $curNonNull)"
      case "SUM" =>
        val sumR = s"(${frameW(s"SUM($args)", z0)} - ${excluded(s"SUM($args)", z0)})"
        if (mode == "GROUP")
          s"(CASE WHEN ${resCnt(cntArg)} = 0 THEN NULL ELSE $sumR END)"
        else
          s"(CASE WHEN ${resCnt(cntArg)} + $curNonNull = 0 THEN NULL " +
            s"ELSE $sumR + coalesce(($args), 0) END)"
      case "AVG" =>
        val sumR = s"(${frameW(s"SUM($args)", z0)} - ${excluded(s"SUM($args)", z0)})"
        val cntR = resCnt(cntArg)
        if (mode == "GROUP")
          s"(CASE WHEN $cntR = 0 THEN NULL ELSE $sumR / $cntR END)"
        else
          s"(CASE WHEN $cntR + $curNonNull = 0 THEN NULL " +
            s"ELSE ($sumR + coalesce(($args), 0)) / ($cntR + $curNonNull) END)"
    }
  }

  /** Replacement for EXCLUDE over a RANGE frame (all three non-default
    * modes, additive aggregates). Far simpler algebra than the ROWS
    * case: a RANGE frame's edges are value intervals around the current
    * row's ORDER BY key, so any frame whose bounds straddle the current
    * row (lo PRECEDING/CURRENT, hi CURRENT/FOLLOWING) contains the FULL
    * peer group — frame ∩ peers = peers, no tighter-interval pick
    * needed:
    *   - GROUP   = frame − peers        (peers = RANGE CURRENT..CURRENT)
    *   - TIES    = frame − peers + cur
    *   - CURRENT = frame − cur
    * NULL semantics match [[rewriteExcludePeers]]: sums recombine over
    * coalesced-to-0 windows with a residual COUNT guard restoring the
    * all-NULL → NULL result; COUNT(expr) subtracts only non-NULL rows.
    * A frame that does NOT straddle the current row fails loudly (same
    * DuckDB 1.0 frame-shift divergence zone the ROWS path documents).
    */
  private def rewriteExcludeRange(
      mode: String, fu: String, args: String, prefix: String,
      aTxt: String, bTxt: String, ak: String, bk: String,
      u: String, msk: String, lit: Array[Boolean],
      openAt: Int, rangeAt: Int): String = {
    require(ak != "NF" && bk != "NP",
      s"EXCLUDE $mode over RANGE requires a frame containing the current row")
    require(findTopKeyword(u, msk, lit, openAt + 1, rangeAt, "ORDER") >= 0,
      s"EXCLUDE $mode requires an ORDER BY in the window")
    def fw(g: String) = s"$g OVER ($prefix RANGE BETWEEN $aTxt AND $bTxt)"
    def pw(g: String) = s"$g OVER ($prefix RANGE BETWEEN CURRENT ROW AND CURRENT ROW)"
    def z0(s: String) = s"coalesce($s, 0)"
    val isStar = args.trim == "*"
    val cntArg = s"COUNT($args)"
    val curNonNull =
      if (isStar) "1" else s"(CASE WHEN ($args) IS NULL THEN 0 ELSE 1 END)"
    // Count of rows the recombined aggregate actually sees.
    val resCnt = mode match {
      case "CURRENT" => s"(${fw(cntArg)} - $curNonNull)"
      case "GROUP" => s"(${fw(cntArg)} - ${pw(cntArg)})"
      case _ => s"(${fw(cntArg)} - ${pw(cntArg)} + $curNonNull)"
    }
    def sumR(g: String) = mode match {
      case "CURRENT" => s"(${z0(fw(g))} - coalesce(($args), 0))"
      case "GROUP" => s"(${z0(fw(g))} - ${z0(pw(g))})"
      case _ => s"(${z0(fw(g))} - ${z0(pw(g))} + coalesce(($args), 0))"
    }
    fu match {
      case "COUNT" => resCnt
      case "SUM" =>
        s"(CASE WHEN $resCnt = 0 THEN NULL ELSE ${sumR(s"SUM($args)")} END)"
      case "AVG" =>
        s"(CASE WHEN $resCnt = 0 THEN NULL " +
          s"ELSE ${sumR(s"SUM($args)")} / $resCnt END)"
    }
  }

  /** Heuristic: walking backwards from position `j`, the nearest governing
    * clause keyword at the same paren depth is FROM (not SELECT/WHERE/…).
    */
  private[fm] def fromContext(upper: String, j: Int): Boolean = {
    var depth = 0
    var i = j
    while (i >= 0) {
      val c = upper.charAt(i)
      if (c == ')') depth += 1
      else if (c == '(') { if (depth == 0) return false; depth -= 1 }
      else if (depth == 0 && isKeywordAt(upper, i, "FROM")) return true
      else if (depth == 0 && (isKeywordAt(upper, i, "SELECT") || isKeywordAt(upper, i, "WHERE")))
        return false
      i -= 1
    }
    false
  }

  private[fm] def isKeywordAt(upper: String, endIdx: Int, kw: String): Boolean = {
    // '_' is an identifier character, not a word boundary: without it the
    // QUALIFY inside this rewriter's own __graft_qualify helper matches as
    // a keyword on the next scan pass and the rewrite re-wraps its output
    // into unparsable SQL (round-8 q_fm_qualify ParseException).
    def isIdentChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    val start = endIdx - kw.length + 1
    start >= 0 &&
    upper.regionMatches(start, kw, 0, kw.length) &&
    (start == 0 || !isIdentChar(upper.charAt(start - 1))) &&
    (endIdx == upper.length - 1 || !isIdentChar(upper.charAt(endIdx + 1)))
  }

  private[fm] def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** Matching `(` for the `)` at `close`, scanning backwards over MASKED
    * text and skipping string-literal contents; -1 if unbalanced.
    */
  private def backwardMatchParen(
      msk: String, lit: Array[Boolean], close: Int): Int = {
    var depth = 0
    var i = close
    while (i >= 0) {
      val c = msk.charAt(i)
      if (!lit(i)) {
        if (c == ')') depth += 1
        else if (c == '(') { depth -= 1; if (depth == 0) return i }
      }
      i -= 1
    }
    -1
  }

  /** One member of a statement-level WITH list. `body` excludes the
    * wrapping parens; `bodyStart`/`bodyEnd` are its offsets in the
    * original text (start inclusive, end exclusive).
    */
  private[fm] final case class CteDef(
      name: String,
      columns: Option[Seq[String]],
      body: String,
      nameStart: Int,
      bodyStart: Int,
      bodyEnd: Int)

  /** Parse a statement-level `WITH [RECURSIVE] name [(cols)] AS (…) [,…]`
    * list: (recursive?, members, index of the main query). None when the
    * statement has no top-level WITH or the list is malformed.
    */
  private[fm] def parseWithList(sql: String): Option[(Boolean, Seq[CteDef], Int)] = {
    val msk = maskComments(sql)
    val u = msk.toUpperCase
    var p = 0
    while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    if (p >= msk.length ||
      !(u.regionMatches(p, "WITH", 0, 4) && isKeywordAt(u, p + 3, "WITH")))
      return None
    p += 4
    def skipWs(): Unit = while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    skipWs()
    val recursive =
      u.regionMatches(p, "RECURSIVE", 0, 9) && isKeywordAt(u, p + 8, "RECURSIVE")
    if (recursive) { p += 9; skipWs() }
    val members = Seq.newBuilder[CteDef]
    var more = true
    while (more) {
      val nameStart = p
      val nameEnd = identEndAt(msk, p)
      if (nameEnd == p) return None
      val name = sql.substring(p, nameEnd)
      p = nameEnd; skipWs()
      var cols: Option[Seq[String]] = None
      if (p < msk.length && msk.charAt(p) == '(') {
        val c = matchParen(msk, p); if (c < 0) return None
        cols = Some(sql.substring(p + 1, c).split(',').map(_.trim).toSeq)
        p = c + 1; skipWs()
      }
      if (!(u.regionMatches(p, "AS", 0, 2) && isKeywordAt(u, p + 1, "AS"))) return None
      p += 2; skipWs()
      if (p >= msk.length || msk.charAt(p) != '(') return None
      val c = matchParen(msk, p); if (c < 0) return None
      members += CteDef(name, cols, sql.substring(p + 1, c), nameStart, p + 1, c)
      p = c + 1; skipWs()
      if (p < msk.length && msk.charAt(p) == ',') { p += 1; skipWs() }
      else more = false
    }
    Some((recursive, members.result(), p))
  }

  /** Does `body` reference `name` as a standalone identifier (outside
    * literals/comments, not a qualified-field tail like `x.name`)?
    */
  private[fm] def referencesName(body: String, name: String): Boolean = {
    val msk = maskComments(body)
    val u = msk.toUpperCase
    val lit = literalMask(msk)
    val un = name.toUpperCase
    var i = u.indexOf(un)
    while (i >= 0) {
      if (!lit(i) && isKeywordAt(u, i + un.length - 1, un) &&
        (i == 0 || msk.charAt(i - 1) != '.')) return true
      i = u.indexOf(un, i + 1)
    }
    false
  }

  /** Split `body` at top-level UNION [ALL] boundaries →
    * (segments, isAll flags between them). INTERSECT/EXCEPT at top level
    * return None (out of the recursion rewrite's scope).
    */
  private[fm] def splitUnions(body: String): Option[(Seq[String], Seq[Boolean])] = {
    val msk = maskComments(body)
    val u = msk.toUpperCase
    val lit = literalMask(msk)
    val segs = Seq.newBuilder[String]
    val alls = Seq.newBuilder[Boolean]
    var depth = 0
    var segStart = 0
    var i = 0
    while (i < msk.length) {
      val c = msk.charAt(i)
      if (!lit(i)) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0) {
          if ((u.regionMatches(i, "INTERSECT", 0, 9) && isKeywordAt(u, i + 8, "INTERSECT")) ||
            (u.regionMatches(i, "EXCEPT", 0, 6) && isKeywordAt(u, i + 5, "EXCEPT")))
            return None
          if (u.regionMatches(i, "UNION", 0, 5) && isKeywordAt(u, i + 4, "UNION")) {
            segs += body.substring(segStart, i)
            var j = i + 5
            while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
            var all = false
            if (u.regionMatches(j, "ALL", 0, 3) && isKeywordAt(u, j + 2, "ALL")) {
              all = true; j += 3
            } else if (u.regionMatches(j, "DISTINCT", 0, 8) &&
              isKeywordAt(u, j + 7, "DISTINCT")) {
              j += 8
            }
            alls += all
            segStart = j
            i = j - 1
          }
        }
      }
      i += 1
    }
    segs += body.substring(segStart)
    Some((segs.result(), alls.result()))
  }

  /** A UNION-distinct recursive CTE's split. DuckDB (SQL-standard,
    * left-associative) splits at the LAST top-level UNION: its right
    * operand is the recursive term, everything left the base — a
    * self-reference in the base is a binder error there, so only the
    * last segment is checked. None when the member isn't one the
    * fixpoint executes: no self-reference in the last segment (plain
    * CTE, or base-side circularity both engines reject loudly), a
    * UNION ALL top operator (Spark runs that natively as UnionLoop),
    * or INTERSECT/EXCEPT shapes (left in place for Spark's loud error).
    */
  private[fm] def recursiveUnionSplit(cte: CteDef): Option[(String, String)] = {
    splitUnions(cte.body).flatMap { case (segs, alls) =>
      if (segs.length < 2 || alls.last) None
      else if (!referencesName(segs.last, cte.name)) None
      else if (segs.init.exists(s => referencesName(s, cte.name))) None
      else {
        def join(parts: Seq[String], ops: Seq[Boolean]): String =
          parts.head + parts.tail.zip(ops).map { case (s, all) =>
            (if (all) " UNION ALL " else " UNION ") + s
          }.mkString
        Some((join(segs.init, alls.init), segs.last))
      }
    }
  }

  /** Execute UNION-distinct recursive CTEs through a caller-supplied
    * fixpoint and splice the materialized view back in. Spark 4 runs
    * UNION ALL recursion natively (UnionLoop) but rejects UNION —
    * DuckDB's dedup-until-fixpoint form (reference passthrough surface,
    * `query.py:72`) — so each such member becomes a driver-paced
    * distributed loop: `materialize(precedingCtes, name, cols, base,
    * step)` runs it and returns a view name, and the member's body
    * becomes `SELECT * FROM <view>`. Only statement-level WITH lists are
    * handled; a nested recursive-union subquery still fails loudly.
    */
  def rewriteRecursiveUnion(
      sql: String,
      materialize: (String, String, Option[Seq[String]], String, String) => String): String = {
    val parsed = parseWithList(sql) match {
      case Some((true, members, _)) => members
      case _ => return sql
    }
    var out = sql
    // Left-to-right with a running offset shift, so a LATER member whose
    // base/step references an EARLIER recursive-union member sees that
    // member's already-materialized (executable) body in its preceding
    // CTE text, never the raw UNION form Spark would reject.
    var shift = 0
    val firstNameStart = parsed.head.nameStart
    for (cte <- parsed) {
      recursiveUnionSplit(cte) match {
        case Some((base, step)) =>
          // prior members as they now read (WITH/RECURSIVE header excluded)
          val precedingText = out
            .substring(firstNameStart, cte.nameStart + shift)
            .trim.stripSuffix(",").trim
          val view = materialize(precedingText, cte.name, cte.columns, base, step)
          val replacement = s"SELECT * FROM $view"
          out = out.substring(0, cte.bodyStart + shift) +
            replacement + out.substring(cte.bodyEnd + shift)
          shift += replacement.length - (cte.bodyEnd - cte.bodyStart)
        case None => ()
      }
    }
    out
  }

  /** DuckDB `POSITIONAL JOIN`: align two relations row-by-row, padding
    * the shorter side with NULLs. Spark has no ordinal join, so the
    * caller materializes both sides with a zipWithIndex full-outer join
    * (`materialize(leftSql, rightSql)` returns a view name) and the
    * two-relation region is replaced by that view. Scope: each side is
    * a parenthesized subquery or a bare identifier (optionally an
    * identifier(...) table-function remnant) with NO alias — DuckDB's
    * own documented usage reads files side by side unaliased; an
    * aliased side is left untouched for Spark's loud parse error.
    * Row order is the side plans' output order: deterministic when the
    * sides are ORDER BY'd (the same total-order discipline every gate
    * query already obeys; DuckDB's "insertion order" has no distributed
    * equivalent).
    */
  def rewritePositionalJoin(
      sql: String, materialize: (String, String) => String): String = {
    var out = sql
    var changed = true
    var guard = 0
    while (changed && guard < 50) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf("POSITIONAL")
      while (i >= 0 && !changed) {
        if (!lit(i) && isKeywordAt(u, i + 9, "POSITIONAL")) {
          var j = i + 10
          while (j < msk.length && msk.charAt(j).isWhitespace) j += 1
          if (u.regionMatches(j, "JOIN", 0, 4) && isKeywordAt(u, j + 3, "JOIN")) {
            // left boundary: subquery or identifier ending right before i
            var le = i - 1
            while (le >= 0 && msk.charAt(le).isWhitespace) le -= 1
            val (ls, leftText) =
              if (le >= 0 && msk.charAt(le) == ')') {
                val open = backwardMatchParen(msk, lit, le)
                require(open >= 0, "unbalanced parens before POSITIONAL JOIN")
                (open, out.substring(open + 1, le))
              } else {
                var k = le
                while (k >= 0 && (Character.isLetterOrDigit(msk.charAt(k)) ||
                  msk.charAt(k) == '_')) k -= 1
                (k + 1, s"SELECT * FROM ${out.substring(k + 1, le + 1)}")
              }
            // right side: after JOIN
            var rs = j + 4
            while (rs < msk.length && msk.charAt(rs).isWhitespace) rs += 1
            val (re, rightText) =
              if (rs < msk.length && msk.charAt(rs) == '(') {
                val close = matchParen(msk, rs)
                require(close > rs, "unbalanced parens after POSITIONAL JOIN")
                (close, out.substring(rs + 1, close))
              } else {
                var k = identEndAt(msk, rs)
                require(k > rs, "expected a relation after POSITIONAL JOIN")
                if (k < msk.length && msk.charAt(k) == '(') {
                  val close = matchParen(msk, k)
                  (close, s"SELECT * FROM ${out.substring(rs, close + 1)}")
                } else (k - 1, s"SELECT * FROM ${out.substring(rs, k)}")
              }
            val view = materialize(leftText.trim, rightText.trim)
            out = out.substring(0, ls) + view + out.substring(re + 1)
            changed = true
          }
        }
        if (!changed) i = u.indexOf("POSITIONAL", i + 1)
      }
    }
    out
  }

  private def identEndAt(s: String, start: Int): Int = {
    var i = start
    while (i < s.length && (Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '_')) i += 1
    i
  }

  /** Matching `]` for the `[` at `open`, skipping string literals. */
  private def matchBracket(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '[') depth += 1
      else if (c == ']') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** First occurrence of keyword `kw` in `[from, until)` at nesting depth
    * 0 (both parens and brackets), word-bounded, outside string literals;
    * -1 if absent.
    */
  private def findTopKeyword(
      u: String, msk: String, lit: Array[Boolean],
      from: Int, until: Int, kw: String): Int = {
    var depth = 0
    var i = from
    while (i < until) {
      val c = msk.charAt(i)
      if (!lit(i)) {
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (depth == 0 && u.regionMatches(i, kw, 0, kw.length) &&
          isKeywordAt(u, i + kw.length - 1, kw) && i + kw.length <= until) return i
      }
      i += 1
    }
    -1
  }

  /** Top-level comma positions in `[from, until)` (depth 0, outside
    * literals), returned as the (start, end) spans between them.
    */
  private def splitTopCommas(
      msk: String, lit: Array[Boolean], from: Int, until: Int): Seq[(Int, Int)] = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var depth = 0
    var start = from
    var i = from
    while (i < until) {
      val c = msk.charAt(i)
      if (!lit(i)) {
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (c == ',' && depth == 0) { spans += ((start, i)); start = i + 1 }
      }
      i += 1
    }
    spans += ((start, until))
    spans.toSeq
  }

  /** DuckDB `* REPLACE (expr AS col, ...)` star modifier (passthrough
    * long tail; Spark SQL has none) → `* EXCEPT (col, ...), expr AS col,
    * ...`. The replaced columns move to the END of the projection —
    * DuckDB keeps them in place, but a pure string rewrite has no schema
    * to reconstruct positions from, and the engine's response surface
    * (name-keyed result dicts) is position-independent. Every
    * parenthesized item must carry a top-level `AS`, which is also what
    * distinguishes the star modifier from a multiplication by the
    * `replace()` string function (`a * replace(b, 'x', 'y')` has no AS).
    * The combined `* EXCLUDE (a, b) REPLACE (expr AS col)` spelling is
    * handled too: the EXCLUDE group (or its already-rewritten EXCEPT
    * form) merges into one `* EXCEPT (a, b, col), expr AS col` output.
    */
  private[fm] def rewriteReplace(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf("REPLACE")
      while (i >= 0 && !changed) {
        if (!lit(i) && isKeywordAt(u, i + "REPLACE".length - 1, "REPLACE")) {
          var j = i - 1
          while (j >= 0 && Character.isWhitespace(msk.charAt(j))) j -= 1
          var k = i + "REPLACE".length
          while (k < msk.length && Character.isWhitespace(msk.charAt(k))) k += 1
          // Direct `* REPLACE (...)`, or the combined form where an
          // `EXCLUDE (...)` / `EXCEPT (...)` group sits between the star
          // and REPLACE — its columns merge into the emitted EXCEPT list
          // and the splice then starts at the group's keyword.
          var spliceStart = i
          var exclCols = ""
          var okStar = j >= 0 && msk.charAt(j) == '*'
          if (!okStar && j >= 0 && msk.charAt(j) == ')') {
            val open = backwardMatchParen(msk, lit, j)
            if (open >= 0) {
              var e = open - 1
              while (e >= 0 && Character.isWhitespace(msk.charAt(e))) e -= 1
              for (kw <- Seq("EXCLUDE", "EXCEPT") if !okStar)
                if (e >= kw.length - 1 && isKeywordAt(u, e, kw)) {
                  val st = e - kw.length + 1
                  var b = st - 1
                  while (b >= 0 && Character.isWhitespace(msk.charAt(b))) b -= 1
                  if (b >= 0 && msk.charAt(b) == '*') {
                    okStar = true
                    spliceStart = st
                    exclCols = out.substring(open + 1, j).trim
                  }
                }
            }
          }
          if (okStar && k < msk.length && msk.charAt(k) == '(') {
            val close = matchParen(msk, k)
            if (close > k) {
              val parsed = splitTopCommas(msk, lit, k + 1, close).map { case (s0, e0) =>
                // last top-level AS splits expr from the target column
                var asAt = -1
                var p = findTopKeyword(u, msk, lit, s0, e0, "AS")
                while (p >= 0) { asAt = p; p = findTopKeyword(u, msk, lit, p + 2, e0, "AS") }
                if (asAt < 0) None
                else {
                  val col = out.substring(asAt + 2, e0).trim
                  val expr = out.substring(s0, asAt).trim
                  if (col.nonEmpty && expr.nonEmpty &&
                    col.forall(c => Character.isLetterOrDigit(c) || c == '_' || c == '`'))
                    Some((expr, col))
                  else None
                }
              }
              if (parsed.nonEmpty && parsed.forall(_.isDefined)) {
                val items = parsed.flatten
                val exceptList =
                  (if (exclCols.isEmpty) Nil else Seq(exclCols)) ++ items.map(_._2)
                val repl = s"EXCEPT (${exceptList.mkString(", ")})" +
                  items.map { case (e, c) => s", $e AS $c" }.mkString
                out = out.substring(0, spliceStart) + repl + out.substring(close + 1)
                changed = true
              }
            }
          }
        }
        if (!changed) i = u.indexOf("REPLACE", i + 1)
      }
    }
    out
  }

  /** DuckDB/Postgres `SELECT DISTINCT ON (keys) list … ORDER BY sort` →
    * row_number window + filter (Spark SQL has no DISTINCT ON):
    *
    *   `SELECT * EXCEPT (__graft_rn) FROM ( SELECT list, row_number()
    *    OVER (PARTITION BY keys ORDER BY sort) AS __graft_rn FROM … )
    *    WHERE __graft_rn = 1 ORDER BY sort`
    *
    * With no ORDER BY the window orders by the keys themselves (an
    * arbitrary-but-deterministic pick; DuckDB's pick is arbitrary too).
    * The block's ORDER BY / LIMIT tail stays OUTSIDE the wrap, so it
    * orders the deduplicated result exactly as DuckDB does. An ORDER BY
    * referencing columns the select list drops fails loudly at analysis
    * (Postgres requires the sort to lead with the ON keys anyway).
    */
  private[fm] def rewriteDistinctOn(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf("DISTINCT")
      while (i >= 0 && !changed) {
        // shape: SELECT DISTINCT ON ( keys ) …
        var selAt = -1
        if (!lit(i) && isKeywordAt(u, i + "DISTINCT".length - 1, "DISTINCT")) {
          var j = i - 1
          while (j >= 0 && Character.isWhitespace(msk.charAt(j))) j -= 1
          if (j >= 5 && u.regionMatches(j - 5, "SELECT", 0, 6) &&
            isKeywordAt(u, j, "SELECT")) selAt = j - 5
        }
        var k = i + "DISTINCT".length
        while (k < msk.length && Character.isWhitespace(msk.charAt(k))) k += 1
        if (selAt >= 0 && k + 1 < msk.length && u.regionMatches(k, "ON", 0, 2) &&
          isKeywordAt(u, k + 1, "ON")) {
          var p = k + 2
          while (p < msk.length && Character.isWhitespace(msk.charAt(p))) p += 1
          if (p < msk.length && msk.charAt(p) == '(') {
            val close = matchParen(msk, p)
            if (close > p) {
              val keys = out.substring(p + 1, close).trim
              // select list runs to the block's top-level FROM
              val fromAt = findTopKeyword(u, msk, lit, close + 1, msk.length, "FROM")
              if (fromAt >= 0) {
                val selectList = out.substring(close + 1, fromAt).trim
                // block tail: first same-depth ORDER / LIMIT / ')' / set-op
                var blockEnd = -1
                var orderAt = -1
                var q = fromAt
                var d2 = 0
                while (q < msk.length && blockEnd < 0) {
                  val c = msk.charAt(q)
                  if (lit(q)) ()
                  else if (c == '(') d2 += 1
                  else if (c == ')') { if (d2 == 0) blockEnd = q else d2 -= 1 }
                  else if (d2 == 0) {
                    if (orderAt < 0 && u.regionMatches(q, "ORDER", 0, 5) &&
                      isKeywordAt(u, q + 4, "ORDER")) orderAt = q
                    if (orderAt < 0 &&
                      Seq("LIMIT", "UNION", "INTERSECT", "EXCEPT").exists(kw =>
                        u.regionMatches(q, kw, 0, kw.length) &&
                          isKeywordAt(u, q + kw.length - 1, kw))) blockEnd = q
                    else if (orderAt >= 0 && q > orderAt &&
                      Seq("UNION", "INTERSECT", "EXCEPT").exists(kw =>
                        u.regionMatches(q, kw, 0, kw.length) &&
                          isKeywordAt(u, q + kw.length - 1, kw))) blockEnd = q
                  }
                  if (blockEnd < 0) q += 1
                }
                if (blockEnd < 0) blockEnd = msk.length
                val innerEnd = if (orderAt >= 0 && orderAt < blockEnd) orderAt else blockEnd
                val fromPart = out.substring(fromAt, innerEnd)
                val tail = out.substring(innerEnd, blockEnd)
                var sort = keys
                var sortSpan: Option[(Int, Int)] = None // absolute [from,until) of the sort items
                var limTail = ""
                if (orderAt >= 0 && orderAt < blockEnd) {
                  // contents after "ORDER BY" up to LIMIT / block end
                  val limAt = findTopKeyword(u, msk, lit, orderAt + 5, blockEnd, "LIMIT")
                  val sortEnd = if (limAt >= 0) limAt else blockEnd
                  val byAt = findTopKeyword(u, msk, lit, orderAt + 5, sortEnd, "BY")
                  if (byAt >= 0) {
                    sort = out.substring(byAt + 2, sortEnd).trim
                    sortSpan = Some((byAt + 2, sortEnd))
                    limTail = out.substring(sortEnd, blockEnd)
                  }
                }
                // DuckDB binds the trailing ORDER BY BEFORE projection, so
                // sort expressions the select list drops still resolve; the
                // wrapped Spark form orders AFTER projection. Hoist any such
                // expression into a hidden helper column (computed inside,
                // EXCEPTed outside) — ordinals and references to projected
                // output names stay as-is.
                val (outNames, hasStar) = selectOutputNames(selectList)
                val helpers = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
                val rebuiltTail = sortSpan match {
                  case None => tail
                  case Some((sFrom, sUntil)) =>
                    val items = splitTopCommas(msk, lit, sFrom, sUntil).map {
                      case (a, b) =>
                        val raw = out.substring(a, b).trim
                        val (expr, suffix) = stripSortSuffix(raw)
                        val bare = expr.substring(expr.lastIndexOf('.') + 1)
                        val isOrdinal = expr.matches("[0-9]+")
                        val isProjected =
                          expr.matches("[A-Za-z_][A-Za-z0-9_.]*") &&
                            (hasStar || outNames.contains(bare.toLowerCase))
                        if (isOrdinal || isProjected) raw
                        else {
                          val h = s"__graft_ob_${helpers.length}"
                          helpers += ((expr, h))
                          s"$h$suffix"
                        }
                    }
                    s"ORDER BY ${items.mkString(", ")}" +
                      (if (limTail.trim.nonEmpty) " " + limTail.trim else "")
                }
                val helperCols =
                  helpers.map { case (e, h) => s", $e AS $h" }.mkString
                val exceptList =
                  ("__graft_rn" +: helpers.map(_._2).toSeq).mkString(", ")
                val replacement =
                  s"SELECT * EXCEPT ($exceptList) FROM ( SELECT $selectList$helperCols, " +
                    s"row_number() OVER (PARTITION BY $keys ORDER BY $sort) AS __graft_rn " +
                    s"$fromPart) WHERE __graft_rn = 1 $rebuiltTail"
                out = out.substring(0, selAt) + replacement + out.substring(blockEnd)
                changed = true
              }
            }
          }
        }
        if (!changed) i = u.indexOf("DISTINCT", i + 1)
      }
    }
    out
  }

  /** Output-column names of a SELECT list (lowercased, best effort):
    * the alias after a top-level AS, else the trailing identifier of a
    * plain (possibly qualified) reference; computed items contribute
    * nothing. The boolean is true when the list contains `*` / `t.*`
    * (every source column is then projected).
    */
  private def selectOutputNames(list: String): (Set[String], Boolean) = {
    var star = false
    val names = splitTopLevelArgs(list).flatMap { case (s0, e0) =>
      val item = list.substring(s0, e0).trim
      if (item == "*" || item.endsWith(".*")) { star = true; None }
      else {
        val u = item.toUpperCase
        var depth = 0
        var inS = false
        var asPos = -1
        var i = 0
        while (i < item.length - 3) {
          val c = item.charAt(i)
          if (inS) { if (c == '\'') inS = false }
          else if (c == '\'') inS = true
          else if (c == '(' || c == '[') depth += 1
          else if (c == ')' || c == ']') depth -= 1
          else if (depth == 0 && u.regionMatches(i, " AS ", 0, 4)) asPos = i
          i += 1
        }
        val cand = (if (asPos >= 0) item.substring(asPos + 4) else item).trim
        val last = cand.substring(cand.lastIndexOf('.') + 1).trim
        if (last.matches("[A-Za-z_][A-Za-z0-9_]*")) Some(last.toLowerCase)
        else if (last.length > 2 && last.head == '`' && last.last == '`')
          Some(last.substring(1, last.length - 1).toLowerCase)
        else None
      }
    }.toSet
    (names, star)
  }

  /** Split a sort item into (expression, direction/NULLS suffix):
    * `"n_chars DESC NULLS LAST"` → (`"n_chars"`, `" DESC NULLS LAST"`).
    */
  private def stripSortSuffix(item: String): (String, String) = {
    var e = item.trim
    val sb = new StringBuilder
    def stripWord(w: String): Boolean = {
      val u = e.toUpperCase
      if (u.endsWith(w) && (e.length == w.length ||
        Character.isWhitespace(e.charAt(e.length - w.length - 1)))) {
        sb.insert(0, " " + e.substring(e.length - w.length))
        e = e.substring(0, e.length - w.length).trim
        true
      } else false
    }
    if (stripWord("FIRST") || stripWord("LAST")) stripWord("NULLS")
    val _ = stripWord("ASC") || stripWord("DESC")
    // a sort item that IS one of the keywords (a column literally named
    // `last`, `desc`, …) must survive whole, not strip to emptiness
    if (e.isEmpty) (item.trim, "") else (e, sb.toString)
  }

  /** DuckDB `USING SAMPLE n%` / `USING SAMPLE n [ROWS|PERCENT]` →
    * Spark `TABLESAMPLE (n PERCENT|ROWS)`. Same position in the FROM
    * clause, so a plain splice suffices. A bare number means rows in
    * DuckDB and maps to ROWS here; the method-parameter form
    * `(bernoulli, seed)` is NOT translated — it fails loudly rather than
    * silently sampling with a different method.
    */
  private[fm] def rewriteUsingSample(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf("USING")
      while (i >= 0 && !changed) {
        if (!lit(i) && isKeywordAt(u, i + 4, "USING")) {
          var k = i + 5
          while (k < msk.length && Character.isWhitespace(msk.charAt(k))) k += 1
          if (u.regionMatches(k, "SAMPLE", 0, 6) && isKeywordAt(u, k + 5, "SAMPLE")) {
            var p = k + 6
            while (p < msk.length && Character.isWhitespace(msk.charAt(p))) p += 1
            val numStart = p
            while (p < msk.length &&
              (Character.isDigit(msk.charAt(p)) || msk.charAt(p) == '.')) p += 1
            if (p > numStart) {
              val num = out.substring(numStart, p)
              var q = p
              while (q < msk.length && Character.isWhitespace(msk.charAt(q))) q += 1
              val (unit, endAt) =
                if (q < msk.length && msk.charAt(q) == '%') ("PERCENT", q + 1)
                else if (u.regionMatches(q, "PERCENT", 0, 7) &&
                  isKeywordAt(u, q + 6, "PERCENT")) ("PERCENT", q + 7)
                else if (u.regionMatches(q, "ROWS", 0, 4) &&
                  isKeywordAt(u, q + 3, "ROWS")) ("ROWS", q + 4)
                else ("ROWS", p) // bare number = rows in DuckDB
              out = out.substring(0, i) + s"TABLESAMPLE ($num $unit)" + out.substring(endAt)
              changed = true
            }
          }
        }
        if (!changed) i = u.indexOf("USING", i + 1)
      }
    }
    out
  }

  /** DuckDB list comprehensions (passthrough long tail) →
    * `transform`/`filter` higher-order functions:
    *
    *   `[expr FOR x IN list]`         → `transform(list, x -> expr)`
    *   `[expr FOR x IN list IF cond]` → `transform(filter(list, x -> cond),
    *                                               x -> expr)`
    *
    * Only brackets whose body contains a top-level `FOR` are touched —
    * plain `[1, 2]` array literals and `arr[i]` indexing pass through
    * untouched (their 1-based-vs-0-based semantics must fail loudly at
    * parse time, not be silently shifted). Nested comprehensions resolve
    * outermost-first; the re-scan loop picks up the inner ones on the
    * next pass.
    */
  /** DuckDB struct literals `{'k': expr, ...}` → `named_struct('k',
    * expr, ...)`. Only braces whose body parses COMPLETELY as top-level
    * `'quoted-key': value` pairs are rewritten; anything else (including
    * an empty `{}`) is left for the parser to reject loudly. Nested
    * struct values resolve on the re-scan pass. Field access after the
    * rewrite (`({'a': x}).a`) is native Spark.
    */
  private[fm] def rewriteStructLit(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 32) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val lit = literalMask(msk)
      var i = 0
      while (i < msk.length && !changed) {
        if (msk.charAt(i) == '{' && !lit(i)) {
          val close = matchBrace(msk, i)
          if (close > i) {
            val pairs = splitStructPairs(out, msk, lit, i + 1, close)
            if (pairs != null && pairs.nonEmpty) {
              // `MAP {'k': v, …}` (DuckDB map literal) → map(k, v, …);
              // a bare brace literal → named_struct. The keyword scan
              // must see MAP directly before the brace.
              var b = i - 1
              while (b >= 0 && msk.charAt(b).isWhitespace) b -= 1
              val u = msk.toUpperCase
              val isMap = b >= 2 && u.regionMatches(b - 2, "MAP", 0, 3) &&
                isKeywordAt(u, b, "MAP")
              val args = pairs.map { case (k, v) => s"$k, $v" }.mkString(", ")
              if (isMap) {
                out = out.substring(0, b - 2) + s"map($args)" +
                  out.substring(close + 1)
              } else {
                out = out.substring(0, i) + s"named_struct($args)" +
                  out.substring(close + 1)
              }
              changed = true
            }
          }
        }
        i += 1
      }
    }
    out
  }

  /** Matching `}` for the `{` at `open`, skipping string literals. */
  private[fm] def matchBrace(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '{') depth += 1
      else if (c == '}') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** `[from, until)` parsed as `'key': value` pairs at top level (parens,
    * brackets, AND braces all count as nesting); null when any item does
    * not fit the shape (the brace is then not a struct literal).
    */
  private def splitStructPairs(
      out: String, msk: String, lit: Array[Boolean],
      from: Int, until: Int): Seq[(String, String)] = {
    val items = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var depth = 0
    var start = from
    var i = from
    while (i < until) {
      val c = msk.charAt(i)
      if (!lit(i)) {
        if (c == '(' || c == '[' || c == '{') depth += 1
        else if (c == ')' || c == ']' || c == '}') depth -= 1
        else if (c == ',' && depth == 0) { items += ((start, i)); start = i + 1 }
      }
      i += 1
    }
    items += ((start, until))
    val pairs = items.map { case (s0, e0) =>
      // top-level ':' splits key from value; the key must be a complete
      // single-quoted literal
      var colon = -1
      var d = 0
      var p = s0
      while (p < e0 && colon < 0) {
        val c = msk.charAt(p)
        if (!lit(p)) {
          if (c == '(' || c == '[' || c == '{') d += 1
          else if (c == ')' || c == ']' || c == '}') d -= 1
          else if (c == ':' && d == 0) colon = p
        }
        p += 1
      }
      if (colon < 0) null
      else {
        val k = out.substring(s0, colon).trim
        val v = out.substring(colon + 1, e0).trim
        if (k.length >= 2 && k.head == '\'' && k.last == '\'' &&
          !k.substring(1, k.length - 1).contains('\'') && v.nonEmpty) (k, v)
        else null
      }
    }
    if (pairs.exists(_ == null)) null else pairs.toSeq
  }

  /** DuckDB bracket syntax (passthrough long tail), translated with the
    * exact 1-based semantics instead of the earlier fail-loud stance:
    *
    *   `[a, b, c]`  literal  → `array(a, b, c)`
    *   `l[i]`       indexing → `try_element_at(l, i)` (both engines
    *                           1-based; negative i counts from the end
    *                           in both; out-of-range is NULL in both —
    *                           plain element_at throws under ANSI mode)
    *   `l[a:b]`     slicing  → `slice(l, a, (b)-(a)+1)` (DuckDB slices
    *                           are 1-based and inclusive at both ends)
    *   `l[:b]` / `l[a:]`     → `slice(l, 1, b)` / `slice(l, a, size(l))`
    *
    * A bracket is INDEXING when it directly follows an expression tail —
    * a non-keyword identifier, `)`, `]`, or a backquoted identifier —
    * and a LITERAL otherwise (after SELECT, ',', an operator, ...). The
    * index base is recovered by walking backwards over `ident`,
    * `fn(...)`, `expr[...]`, and `.`-joined chains; an unsupported base
    * shape (e.g. a string literal) is left untouched and fails loudly at
    * parse rather than silently shifting semantics. Negative SLICE
    * bounds are not translated — the emitted negative length throws at
    * runtime (loud, not silent). List comprehensions were rewritten by
    * the earlier pass; a bracket with a top-level FOR is skipped
    * defensively anyway.
    */
  private[fm] def rewriteBrackets(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 64) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = 0
      while (i < msk.length && !changed) {
        if (msk.charAt(i) == '[' && !lit(i)) {
          val close = matchBracket(msk, i)
          val isComp = close > i &&
            findTopKeyword(u, msk, lit, i + 1, close, "FOR") >= 0
          if (close > i && !isComp) {
            var j = i - 1
            while (j >= 0 && Character.isWhitespace(msk.charAt(j))) j -= 1
            val baseStart = if (j < 0) -1 else baseStartAt(msk, u, lit, j)
            if (baseStart >= 0) {
              val base = out.substring(baseStart, j + 1)
              val colonAt = topColonAt(msk, lit, i + 1, close)
              val repl =
                if (colonAt < 0) {
                  val idx = out.substring(i + 1, close).trim
                  // try_element_at, not element_at: DuckDB returns NULL
                  // for an out-of-range index, while Spark's element_at
                  // throws under ANSI mode (the default). Index 0 still
                  // fails loudly in Spark where DuckDB yields NULL —
                  // kept loud (0 is always a caller bug in 1-based code).
                  if (idx.isEmpty) null else s"try_element_at($base, $idx)"
                } else {
                  // list_slice (DuckListSlice) carries the full DuckDB
                  // bound semantics — negative = from the end, clamped
                  // out-of-range (r12; the old slice() arithmetic broke
                  // on a negative upper bound). Open bounds fill with
                  // 1 / Int.MaxValue (clamped to size inside).
                  val lo = out.substring(i + 1, colonAt).trim
                  val hi = out.substring(colonAt + 1, close).trim
                  if (lo.isEmpty && hi.isEmpty) s"slice($base, 1, size($base))"
                  else if (lo.isEmpty) s"list_slice($base, 1, ($hi))"
                  else if (hi.isEmpty) s"list_slice($base, ($lo), 2147483647)"
                  else s"list_slice($base, ($lo), ($hi))"
                }
              if (repl != null) {
                out = out.substring(0, baseStart) + repl + out.substring(close + 1)
                changed = true
              }
            } else if (baseStart == -1) {
              val body = out.substring(i + 1, close).trim
              val repl = if (body.isEmpty) "array()" else s"array($body)"
              out = out.substring(0, i) + repl + out.substring(close + 1)
              changed = true
            }
            // baseStart == -2: indexing-like but unsupported base — leave
            // the bracket for the parser to reject loudly
          }
        }
        i += 1
      }
    }
    out
  }

  /** Keywords that can directly precede an array literal's `[` — an
    * identifier tail that is one of these marks the bracket as a LITERAL,
    * never an index base.
    */
  private val NonBaseKeywords: Set[String] = Set(
    "SELECT", "WHERE", "THEN", "ELSE", "WHEN", "AND", "OR", "NOT", "IN",
    "ON", "BY", "AS", "FROM", "HAVING", "CASE", "END", "UNION", "ALL",
    "DISTINCT", "LIMIT", "OFFSET", "JOIN", "SET", "VALUES", "BETWEEN",
    "LIKE", "ILIKE", "IS", "NULL", "TRUE", "FALSE", "EXISTS", "GROUP",
    "ORDER", "USING", "RETURNING", "INTERSECT", "EXCEPT")

  /** Start index of the expression ending at `end` (inclusive) when it
    * can serve as an indexing base; -1 when the following bracket must
    * be an array LITERAL; -2 when it reads as indexing but the base
    * shape is unsupported. Scans the MASKED text, skipping string
    * literals via `lit` (a paren inside `split(x, '(')` is data).
    */
  private def baseStartAt(
      msk: String, u: String, lit: Array[Boolean], end: Int): Int = {
    def isIdent(ch: Char) = Character.isLetterOrDigit(ch) || ch == '_'
    // start of the single segment ending at e, or -2 unsupported
    def segStart(e: Int): Int = {
      if (e < 0) return -2
      val c = msk.charAt(e)
      if (c == ')' || c == ']') {
        var depth = 0
        var k = e
        while (k >= 0) {
          val ch = msk.charAt(k)
          if (!lit(k)) {
            if (ch == ')' || ch == ']') depth += 1
            else if (ch == '(' || ch == '[') {
              depth -= 1
              if (depth == 0) {
                // include a function name directly before '('
                var p = k - 1
                while (p >= 0 && isIdent(msk.charAt(p))) p -= 1
                return p + 1
              }
            }
          }
          k -= 1
        }
        -2
      } else if (c == '`') {
        var k = e - 1
        while (k >= 0 && msk.charAt(k) != '`') k -= 1
        if (k < 0) -2 else k
      } else if (isIdent(c)) {
        var p = e
        while (p >= 0 && isIdent(msk.charAt(p))) p -= 1
        p + 1
      } else -2
    }
    val c0 = msk.charAt(end)
    if (isIdent(c0)) {
      var p = end
      while (p >= 0 && isIdent(msk.charAt(p))) p -= 1
      val word = u.substring(p + 1, end + 1)
      // after a clause keyword or a bare number the bracket is a literal
      if (NonBaseKeywords(word) || word.forall(Character.isDigit)) return -1
    } else if (c0 != ')' && c0 != ']' && c0 != '`') return -1
    var s = segStart(end)
    if (s < 0) return -2
    // consume `.`-joined qualifier segments backwards (a.b.c[1])
    while (s > 0 && msk.charAt(s - 1) == '.') {
      val prev = segStart(s - 2)
      if (prev < 0) return s
      s = prev
    }
    s
  }

  /** Top-level `:` between [from, until) — depth 0 for parens AND
    * brackets, outside string literals; -1 if absent. `::` casts never
    * appear at depth 0 inside an index bracket in practice; a first `:`
    * of `::` would be matched, yielding a loud parse error downstream
    * rather than a silent mis-slice.
    */
  private def topColonAt(
      msk: String, lit: Array[Boolean], from: Int, until: Int): Int = {
    var depth = 0
    var i = from
    while (i < until) {
      val c = msk.charAt(i)
      if (!lit(i)) {
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (c == ':' && depth == 0) return i
      }
      i += 1
    }
    -1
  }

  /** DuckDB `COLUMNS(...)` star expansion, resolved against a known
    * column list — the engine passes the files view's schema at query
    * time (the same resolution point DuckDB uses). Argument forms: a
    * regex string literal (RE2 partial-match semantics — `Matcher.find()`
    * mirrors that, and an anchored `^...$` pattern behaves identically
    * in both engines), `*`, `* EXCLUDE (...)`, and name lambdas
    * (see [[evalColumnsLambda]]). Two positions are expanded: the bare
    * select-item (preceded by SELECT/DISTINCT or a top-level comma,
    * followed by a comma, FROM, or end of text) and the one-arg function
    * call `fn(COLUMNS(...))` as a select item, which becomes one call
    * per matched column aliased to the COLUMN name (DuckDB's naming).
    * Other positions stay untouched and fail loudly at parse. An
    * argument matching NO column throws (DuckDB errors too) — but only
    * when the occurrence is in an expandable position.
    */
  def rewriteColumns(sql: String, columns: Seq[String]): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = u.indexOf("COLUMNS")
      while (i >= 0 && !changed) {
        if (!lit(i) && isKeywordAt(u, i + "COLUMNS".length - 1, "COLUMNS")) {
          def itemPosOk(at: Int): Boolean = {
            var b = at - 1
            while (b >= 0 && Character.isWhitespace(msk.charAt(b))) b -= 1
            b >= 0 && (msk.charAt(b) == ',' ||
              isKeywordAt(u, b, "SELECT") || isKeywordAt(u, b, "DISTINCT"))
          }
          def tailOkAt(from: Int): Boolean = {
            var t = from
            while (t < msk.length && Character.isWhitespace(msk.charAt(t))) t += 1
            t >= msk.length || msk.charAt(t) == ',' ||
              (t + 3 < msk.length && u.regionMatches(t, "FROM", 0, 4) &&
                isKeywordAt(u, t + 3, "FROM"))
          }
          var j = i - 1
          while (j >= 0 && Character.isWhitespace(msk.charAt(j))) j -= 1
          var k = i + "COLUMNS".length
          while (k < msk.length && Character.isWhitespace(msk.charAt(k))) k += 1
          if (k < msk.length && msk.charAt(k) == '(') {
            val close = matchParen(msk, k)
            // Resolve the POSITION first: the argument is only evaluated
            // (and may only throw) for an occurrence that will actually
            // expand — a COLUMNS in an untouched position keeps the
            // pass-through-to-fail-at-parse contract even for a bad arg.
            val barePos = close > k && itemPosOk(i) && tailOkAt(close + 1)
            // one-arg function call: fn(COLUMNS(...)) as a select item
            val fnPos: Option[(Int, Int)] =
              if (close > k && !barePos && j >= 0 && msk.charAt(j) == '(') {
                val fnOpen = j
                var fe = fnOpen - 1
                while (fe >= 0 && Character.isWhitespace(msk.charAt(fe))) fe -= 1
                var fs = fe
                while (fs >= 0 && (Character.isLetterOrDigit(msk.charAt(fs)) ||
                  msk.charAt(fs) == '_')) fs -= 1
                val fnClose = matchParen(msk, fnOpen)
                var afterCols = close + 1
                while (afterCols < msk.length &&
                  Character.isWhitespace(msk.charAt(afterCols))) afterCols += 1
                if (fs < fe && itemPosOk(fs + 1) && fnClose == afterCols &&
                  tailOkAt(fnClose + 1)) Some((fs, fnClose))
                else None
              } else None
            if (barePos || fnPos.isDefined) {
              val arg = out.substring(k + 1, close).trim
              columnsArg(arg, columns).foreach { matched =>
                if (matched.isEmpty) throw new IllegalArgumentException(
                  s"COLUMNS($arg) matched no column of [${columns.mkString(", ")}]")
                if (barePos) {
                  out = out.substring(0, i) + matched.mkString(", ") +
                    out.substring(close + 1)
                } else {
                  val (fs, fnClose) = fnPos.get
                  val fn = out.substring(fs + 1, j)
                  // DuckDB names each expanded result after the COLUMN
                  // (not `fn(col)`) — mirror that with explicit aliases,
                  // which the oracle compare depends on
                  out = out.substring(0, fs + 1) +
                    matched.map(c => s"${fn.trim}($c) AS $c").mkString(", ") +
                    out.substring(fnClose + 1)
                }
                changed = true
              }
            }
          }
        }
        if (!changed) i = u.indexOf("COLUMNS", i + 1)
      }
    }
    out
  }

  /** Resolve a COLUMNS(...) argument to the matched column list:
    * regex string literal (RE2-partial search), `*`, `* EXCLUDE (...)`,
    * or a name lambda; None when the shape is unsupported (the call
    * passes through to fail loudly).
    */
  private def columnsArg(
      arg: String, columns: Seq[String]): Option[Seq[String]] =
    if (arg.length >= 2 && arg.head == '\'' && arg.last == '\'') {
      val re = java.util.regex.Pattern.compile(
        arg.substring(1, arg.length - 1).replace("''", "'"))
      Some(columns.filter(c => re.matcher(c).find()))
    } else if (arg == "*") Some(columns)
    else {
      val excl = "(?i)^\\*\\s+EXCLUDE\\s*\\(([^)]*)\\)$".r.findFirstMatchIn(arg)
      if (excl.isDefined) {
        val dropped = excl.get.group(1).split(",")
          .map(_.trim).filter(_.nonEmpty).map(_.toLowerCase).toSet
        val unknown = dropped -- columns.map(_.toLowerCase)
        if (unknown.nonEmpty) throw new IllegalArgumentException(
          s"COLUMNS($arg) excludes unknown columns: ${unknown.mkString(", ")}")
        Some(columns.filterNot(c => dropped(c.toLowerCase)))
      } else evalColumnsLambda(arg, columns)
    }

  /** DuckDB's COLUMNS lambda form evaluated over the column NAMES:
    * `c -> c [NOT] LIKE 'pat'`, `c -> c [NOT] SIMILAR TO 'regex'`, and
    * `c -> c = / != / <> 'lit'` — the shapes column selection actually
    * uses. Anything else returns None and passes through to fail loudly
    * at parse rather than guess predicate semantics.
    */
  private def evalColumnsLambda(
      arg: String, columns: Seq[String]): Option[Seq[String]] = {
    val head = "^([A-Za-z_][A-Za-z0-9_]*)\\s*->\\s*(.+)$".r
      .findFirstMatchIn(arg.trim)
    if (head.isEmpty) return None
    val v = java.util.regex.Pattern.quote(head.get.group(1))
    val pred = head.get.group(2).trim
    val patForm =
      ("(?i)^" + v + "\\s+(NOT\\s+)?(LIKE|SIMILAR\\s+TO)\\s+'((?:[^']|'')*)'$").r
    val eqForm = ("^" + v + "\\s*(=|!=|<>)\\s*'((?:[^']|'')*)'$").r
    patForm.findFirstMatchIn(pred) match {
      case Some(g) =>
        val neg = g.group(1) != null
        val raw = g.group(3).replace("''", "'")
        val re =
          if (g.group(2).toUpperCase.startsWith("LIKE")) likeToRegex(raw)
          else raw
        val p = java.util.regex.Pattern.compile("^(?:" + re + ")$")
        Some(columns.filter(c => p.matcher(c).matches() != neg))
      case None =>
        eqForm.findFirstMatchIn(pred).map { g =>
          val lit = g.group(2).replace("''", "'")
          val neg = g.group(1) != "="
          columns.filter(c => (c == lit) != neg)
        }
    }
  }

  /** SQL LIKE pattern → Java regex (`%` any run, `_` any char, the rest
    * literal), for the COLUMNS lambda's name matching.
    */
  private def likeToRegex(pat: String): String = {
    val sb = new StringBuilder
    pat.foreach {
      case '%' => sb.append(".*")
      case '_' => sb.append('.')
      case ch if "\\.[]{}()<>*+-=!?^$|".indexOf(ch) >= 0 =>
        sb.append('\\').append(ch)
      case ch => sb.append(ch)
    }
    sb.toString
  }

  /** DuckDB simplified `PIVOT` statement → Spark SQL
    * (`PIVOT <table> ON <col> [IN (v, …)] USING <agg> [AS alias]
    * [GROUP BY g, …] [ORDER BY …] [LIMIT …]`).
    *
    * DuckDB auto-discovers the pivoted values with a hidden DISTINCT
    * pass; Spark's PIVOT clause needs the list up front. The rewrite
    * makes that discovery explicit through `values` — the engine passes
    * a DISTINCT query over the target view (the identical work DuckDB
    * hides, one bounded driver-side list) — unless the statement pins
    * its own `ON col IN (…)` list, which is used verbatim in user
    * order, like DuckDB. Discovered values are sorted ascending
    * (DuckDB's column order).
    *
    * Two shapes:
    *  - explicit GROUP BY → conditional aggregation (one hash
    *    aggregate; `USING … AS alias` yields DuckDB's value_alias
    *    column names);
    *  - no GROUP BY → Spark's native PIVOT clause, whose implicit
    *    group-by-all-remaining-columns matches DuckDB's.
    * Values are matched as strings (`CAST(col AS STRING) = 'v'`) —
    * exact for the string-typed files surface.
    *
    * Statements that don't start with PIVOT pass through untouched.
    */
  def rewritePivot(sql: String, values: (String, String) => Seq[String]): String = {
    val msk = maskComments(sql)
    val u = msk.toUpperCase
    val lit = literalMask(msk)
    var p = 0
    while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    if (!(u.regionMatches(p, "PIVOT", 0, 5) && isKeywordAt(u, p + 4, "PIVOT")))
      return sql
    // table identifier
    var t0 = p + 5
    while (t0 < msk.length && msk.charAt(t0).isWhitespace) t0 += 1
    var t1 = t0
    while (t1 < msk.length && (Character.isLetterOrDigit(msk.charAt(t1)) ||
      msk.charAt(t1) == '_' || msk.charAt(t1) == '.')) t1 += 1
    if (t1 == t0) return sql
    val table = sql.substring(t0, t1)
    val onAt = findTopKeyword(u, msk, lit, t1, msk.length, "ON")
    if (onAt < 0) return sql
    val usingAt = findTopKeyword(u, msk, lit, onAt + 2, msk.length, "USING")
    if (usingAt < 0) return sql
    // ON span: column expression, optionally followed by IN (v, ...)
    val inAt = findTopKeyword(u, msk, lit, onAt + 2, usingAt, "IN")
    val col = sql.substring(onAt + 2, if (inAt >= 0) inAt else usingAt).trim
    if (col.isEmpty || col.contains(",")) return sql
    val pinned: Option[Seq[String]] =
      if (inAt < 0) None
      else {
        val open = msk.indexOf('(', inAt)
        val close = if (open >= 0) matchParen(msk, open) else -1
        if (close < 0 || close > usingAt) return sql
        Some(sql.substring(open + 1, close).split(",").toSeq
          .map(_.trim).filter(_.nonEmpty).map { v =>
            if (v.length >= 2 && v.head == '\'' && v.last == '\'')
              v.substring(1, v.length - 1).replace("''", "'")
            else v
          })
      }
    // agg span ends at GROUP / ORDER / LIMIT (top level) or statement end
    val stops = Seq("GROUP", "ORDER", "LIMIT")
      .map(k => findTopKeyword(u, msk, lit, usingAt + 5, msk.length, k))
      .filter(_ >= 0)
    val aggEnd = if (stops.isEmpty) msk.length else stops.min
    val aliasAt = findTopKeyword(u, msk, lit, usingAt + 5, aggEnd, "AS")
    val aggExpr = sql.substring(usingAt + 5, if (aliasAt >= 0) aliasAt else aggEnd).trim
    val alias =
      if (aliasAt < 0) None else Some(sql.substring(aliasAt + 2, aggEnd).trim)
    val groupAt = findTopKeyword(u, msk, lit, usingAt + 5, msk.length, "GROUP")
    def esc(v: String) = v.replace("'", "''")
    def tick(v: String) = "`" + v.replace("`", "``") + "`"
    val vals = pinned.getOrElse(values(table, col))
    require(vals.nonEmpty, s"PIVOT ON $col has no non-NULL values to pivot")
    if (groupAt >= 0) {
      val byAt = findTopKeyword(u, msk, lit, groupAt + 5, msk.length, "BY")
      require(byAt >= 0, "PIVOT: GROUP not followed by BY")
      val tailStops = Seq("ORDER", "LIMIT")
        .map(k => findTopKeyword(u, msk, lit, byAt + 2, msk.length, k))
        .filter(_ >= 0)
      val grpEnd = if (tailStops.isEmpty) msk.length else tailStops.min
      val grp = sql.substring(byAt + 2, grpEnd).trim
      val tail = sql.substring(grpEnd).trim
      val m = java.util.regex.Pattern
        .compile("^([A-Za-z_][A-Za-z0-9_]*)\\s*\\((.*)\\)$",
          java.util.regex.Pattern.DOTALL)
        .matcher(aggExpr)
      require(m.matches(), s"PIVOT USING must be a single <fn>(<arg>) aggregate, got: $aggExpr")
      val fn = m.group(1)
      val rawArg = m.group(2).trim
      val distinct = rawArg.toUpperCase.startsWith("DISTINCT ")
      val arg0 = if (distinct) rawArg.substring(9).trim else rawArg
      val inner = if (arg0 == "*") "1" else arg0
      val cells = vals.map { v =>
        val name = alias.fold(v)(a => s"${v}_$a")
        val d = if (distinct) "DISTINCT " else ""
        s"$fn(${d}CASE WHEN CAST(($col) AS STRING) = '${esc(v)}' THEN $inner END) AS ${tick(name)}"
      }
      s"SELECT $grp, ${cells.mkString(", ")} FROM $table GROUP BY $grp" +
        (if (tail.nonEmpty) s" $tail" else "")
    } else {
      require(alias.isEmpty,
        "PIVOT: USING … AS alias requires an explicit GROUP BY in this dialect")
      require(col.forall(c => Character.isLetterOrDigit(c) || c == '_'),
        s"PIVOT without GROUP BY needs a plain column name to pivot on, got: $col")
      val tail = sql.substring(aggEnd).trim
      val inList = vals.map(v => s"'${esc(v)}' AS ${tick(v)}").mkString(", ")
      s"SELECT * FROM $table PIVOT ($aggExpr FOR $col IN ($inList))" +
        (if (tail.nonEmpty) s" $tail" else "")
    }
  }

  /** DuckDB simplified `UNPIVOT` statement → Spark's native UNPIVOT
    * clause (`UNPIVOT <table> ON c1, c2, … INTO NAME <k> VALUE <v>
    * [ORDER BY …] [LIMIT …]` →
    * `SELECT * FROM <table> UNPIVOT (<v> FOR <k> IN (c1, c2, …))`).
    * Both engines exclude NULL cells by default, and both emit the
    * remaining columns followed by the name/value pair, so the mapping
    * is purely syntactic — no schema needed. Statements that don't
    * start with UNPIVOT pass through untouched.
    */
  private[fm] def rewriteUnpivot(sql: String): String = {
    val msk = maskComments(sql)
    val u = msk.toUpperCase
    val lit = literalMask(msk)
    var p = 0
    while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    if (!(u.regionMatches(p, "UNPIVOT", 0, 7) && isKeywordAt(u, p + 6, "UNPIVOT")))
      return sql
    var t0 = p + 7
    while (t0 < msk.length && msk.charAt(t0).isWhitespace) t0 += 1
    var t1 = t0
    while (t1 < msk.length && (Character.isLetterOrDigit(msk.charAt(t1)) ||
      msk.charAt(t1) == '_' || msk.charAt(t1) == '.')) t1 += 1
    if (t1 == t0) return sql
    val table = sql.substring(t0, t1)
    val onAt = findTopKeyword(u, msk, lit, t1, msk.length, "ON")
    if (onAt < 0) return sql
    val intoAt = findTopKeyword(u, msk, lit, onAt + 2, msk.length, "INTO")
    if (intoAt < 0) return sql
    val cols = sql.substring(onAt + 2, intoAt).trim
    if (cols.isEmpty) return sql
    val nameAt = findTopKeyword(u, msk, lit, intoAt + 4, msk.length, "NAME")
    val valueAt = findTopKeyword(u, msk, lit, intoAt + 4, msk.length, "VALUE")
    if (nameAt < 0 || valueAt < 0 || valueAt < nameAt) return sql
    val stops = Seq("ORDER", "LIMIT")
      .map(k => findTopKeyword(u, msk, lit, valueAt + 5, msk.length, k))
      .filter(_ >= 0)
    val valEnd = if (stops.isEmpty) msk.length else stops.min
    val nameCol = sql.substring(nameAt + 4, valueAt).trim
    val valueCol = sql.substring(valueAt + 5, valEnd).trim
    if (nameCol.isEmpty || valueCol.isEmpty) return sql
    val tail = sql.substring(valEnd).trim
    s"SELECT * FROM $table UNPIVOT ($valueCol FOR $nameCol IN ($cols))" +
      (if (tail.nonEmpty) s" $tail" else "")
  }

  /** DuckDB `SUMMARIZE <table>` statement → one-pass per-column profile.
    *
    * DuckDB's output schema is column_name, column_type, min, max,
    * approx_unique, avg, std, q25, q50, q75, count, null_percentage.
    * This engine reproduces it with EXACT semantics over the files
    * surface, where every frontmatter property is a string by design
    * (ADR: everything-is-a-string): min/max are lexicographic,
    * approx_unique is the exact distinct count (a deliberate divergence
    * — DuckDB's HLL estimate is nondeterministic across versions, an
    * exact count is strictly better information at this cardinality),
    * and the numeric-only stats (avg/std/q25/q50/q75) are NULL exactly
    * as DuckDB emits for VARCHAR columns. Non-string columns (e.g. the
    * semantic FLOAT[dim] embedding) profile as count/null%-only rows.
    *
    * Shape: ONE aggregate pass computing 4 stats × N columns, then a
    * `stack` lateral view pivots the single stats row into N output
    * rows — the scan count stays 1 however wide the table is, and the
    * stack input is one row, so at 100 TB this costs exactly one
    * scan + a width-bounded aggregate (the same shape SchemaInfer uses).
    * `schema` supplies (name, Spark SQL type) pairs — the engine passes
    * the resolved files view schema, the same provider pattern as
    * COLUMNS/PIVOT.
    */
  def rewriteSummarize(sql: String, schema: Seq[(String, String)]): String = {
    val msk = maskComments(sql)
    val u = msk.toUpperCase
    var p = 0
    while (p < msk.length && msk.charAt(p).isWhitespace) p += 1
    if (!(u.regionMatches(p, "SUMMARIZE", 0, 9) && isKeywordAt(u, p + 8, "SUMMARIZE")))
      return sql
    var t0 = p + 9
    while (t0 < msk.length && msk.charAt(t0).isWhitespace) t0 += 1
    var t1 = t0
    while (t1 < msk.length && (Character.isLetterOrDigit(msk.charAt(t1)) ||
      msk.charAt(t1) == '_' || msk.charAt(t1) == '.')) t1 += 1
    if (t1 == t0 || msk.substring(t1).exists(!_.isWhitespace)) return sql
    val table = sql.substring(t0, t1)
    require(schema.nonEmpty, s"SUMMARIZE $table: no columns resolved")
    def tick(c: String) = "`" + c.replace("`", "``") + "`"
    // r17 plan restructure (same results, proved by the oracle row): N
    // COUNT(DISTINCT col) in one aggregate made Spark plan an Expand
    // (N+1 rows per input row, full width) into a SortAggregate chain
    // whose grouping sort compared all N string columns and whose
    // distinct-set buffers shuffled every distinct value twice. Instead,
    // pivot each row ONCE into narrow (idx, val, isnull) triples, hash-
    // aggregate them to distinct groups with row counts (all the
    // information every SUMMARIZE stat needs), and fold the per-column
    // stats out of that group frame with one keyless aggregate:
    //   min/max(col)       = min/max over the distinct values
    //   count distinct     = COUNT(val) — each distinct value is 1 row
    //   count / nulls      = SUM(cnt) split by the isnull flag
    // Zero Sort operators, and the exchanges carry (idx, val, isn, cnt)
    // instead of N-column group keys plus distinct-set buffers. Non-
    // string columns profile count/null%-only (val = NULL), as before;
    // the keyless fold keeps the empty-table shape (one stats row → N
    // output rows with count 0, exactly DuckDB's).
    val stackIn = schema.zipWithIndex.map { case ((c, tpe), i) =>
      val v = if (tpe.equalsIgnoreCase("string")) tick(c)
        else "CAST(NULL AS STRING)"
      s"$i, $v, CASE WHEN ${tick(c)} IS NULL THEN 1 ELSE 0 END"
    }
    val aggs = schema.zipWithIndex.flatMap { case ((c, tpe), i) =>
      val base = Seq(
        s"COALESCE(SUM(CASE WHEN __idx = $i AND __isn = 0 THEN __cnt END), 0) AS __cnt_$i",
        s"COALESCE(SUM(CASE WHEN __idx = $i AND __isn = 1 THEN __cnt END), 0) AS __nul_$i")
      if (tpe.equalsIgnoreCase("string"))
        base ++ Seq(
          s"MIN(CASE WHEN __idx = $i THEN __val END) AS __min_$i",
          s"MAX(CASE WHEN __idx = $i THEN __val END) AS __max_$i",
          s"COUNT(CASE WHEN __idx = $i THEN __val END) AS __unq_$i")
      else base
    }
    val duckType = Map("string" -> "VARCHAR", "bigint" -> "BIGINT",
      "int" -> "INTEGER", "double" -> "DOUBLE", "float" -> "REAL",
      "boolean" -> "BOOLEAN", "date" -> "DATE", "timestamp" -> "TIMESTAMP")
    val stackArgs = schema.zipWithIndex.map { case ((c, tpe), i) =>
      val t = duckType.getOrElse(tpe.toLowerCase, tpe.toUpperCase)
      val (mn, mx, uq) =
        if (tpe.equalsIgnoreCase("string"))
          (s"__min_$i", s"__max_$i", s"__unq_$i")
        else ("CAST(NULL AS STRING)", "CAST(NULL AS STRING)",
          "CAST(NULL AS BIGINT)")
      s"'${c.replace("'", "''")}', '$t', $mn, $mx, $uq, __cnt_$i, __nul_$i"
    }
    s"""SELECT column_name, column_type, min, max, approx_unique,
       |  CAST(NULL AS DOUBLE) AS avg, CAST(NULL AS DOUBLE) AS std,
       |  CAST(NULL AS DOUBLE) AS q25, CAST(NULL AS DOUBLE) AS q50,
       |  CAST(NULL AS DOUBLE) AS q75,
       |  __filled + __nulls AS count,
       |  CAST(ROUND(CAST(__nulls * 10000 AS DOUBLE)
       |             / (__filled + __nulls)) AS BIGINT)
       |    / CAST(100 AS DOUBLE) AS null_percentage
       |FROM (SELECT ${aggs.mkString(", ")}
       |      FROM (SELECT __idx, __val, __isn, COUNT(*) AS __cnt
       |            FROM $table
       |            LATERAL VIEW stack(${schema.length},
       |              ${stackIn.mkString(",\n              ")}) g
       |              AS __idx, __val, __isn
       |            GROUP BY __idx, __val, __isn))
       |LATERAL VIEW stack(${schema.length},
       |  ${stackArgs.mkString(",\n  ")}) s
       |  AS column_name, column_type, min, max, approx_unique, __filled, __nulls
       |""".stripMargin
  }

  /** DuckDB `ASOF JOIN` in user SQL → the union + ordered-carry pattern
    * (`SELECT * FROM <a> [al] ASOF [LEFT] JOIN <b> [bl]
    * ON <x>.<k> = <y>.<k> AND <x>.<t> >= <y>.<t> [ORDER BY …] [LIMIT …]`).
    *
    * The naive desugaring (inequality join + keep-latest) explodes into
    * every probe×earlier-build pair per key before pruning — the exact
    * quadratic blowup `ops/AsOfJoin` exists to avoid. This rewrite emits
    * the same scalable shape that operator uses, as SQL: tag both sides,
    * UNION ALL, carry the last build-side payload forward per key with
    * ONE window ordered by (time, build-first), keep probe rows. The
    * build row's columns travel as ONE struct, so they always come from
    * the SAME matched row. One shuffle on the key, no range probe.
    *
    * Supported surface (loudly unsupported otherwise): star projection,
    * plain table/view identifiers, one equality + one `a.t >= b.t` (or
    * flipped `b.t <= a.t`) condition — DuckDB's default backward join.
    * Build rows should be unique per (key, time); at equal times the
    * carried pick among build duplicates is arbitrary (as in DuckDB).
    * `schema` resolves a table name to (column, Spark DDL type) pairs —
    * the engine backs it with the session catalog.
    */
  def rewriteAsof(sql: String, schema: String => Seq[(String, String)]): String = {
    val msk = maskComments(sql)
    val u = msk.toUpperCase
    val lit = literalMask(msk)
    val asofAt = findTopKeyword(u, msk, lit, 0, msk.length, "ASOF")
    if (asofAt < 0) return sql
    // statement head must be exactly SELECT * FROM
    val head = u.take(asofAt).trim.replaceAll("\\s+", " ")
    def ident(from: Int): (String, Int) = {
      var i = from
      while (i < msk.length && msk.charAt(i).isWhitespace) i += 1
      var j = i
      while (j < msk.length && (Character.isLetterOrDigit(msk.charAt(j)) ||
        msk.charAt(j) == '_' || msk.charAt(j) == '.')) j += 1
      (sql.substring(i, j), j)
    }
    if (!head.startsWith("SELECT * FROM ")) return sql
    val fromAt = u.indexOf("FROM")
    val (ta, p1) = ident(fromAt + 4)
    val (aliasA0, p2) = ident(p1)
    // no alias → the scanner grabs the ASOF keyword itself
    val aliasA =
      if (aliasA0.isEmpty || aliasA0.equalsIgnoreCase("ASOF")) ta else aliasA0
    if (!aliasA0.equalsIgnoreCase("ASOF") && p2 > asofAt) return sql
    var q = asofAt + 4
    val leftAt = findTopKeyword(u, msk, lit, q, msk.length, "LEFT")
    val isLeft = leftAt >= 0 && u.substring(q, leftAt).isBlank
    if (isLeft) q = leftAt + 4
    val joinAt = findTopKeyword(u, msk, lit, q, msk.length, "JOIN")
    if (joinAt < 0 || !u.substring(q, joinAt).isBlank) return sql
    val (tb, p3) = ident(joinAt + 4)
    val onAt = findTopKeyword(u, msk, lit, p3, msk.length, "ON")
    if (onAt < 0) return sql
    val (aliasB0, _) = ident(p3)
    val aliasB =
      if (aliasB0.isEmpty || aliasB0.equalsIgnoreCase("ON")) tb else aliasB0
    // conditions: <q>.<c> OP <q>.<c> AND <q>.<c> OP <q>.<c>, then tail
    val stops = Seq("ORDER", "LIMIT")
      .map(k => findTopKeyword(u, msk, lit, onAt + 2, msk.length, k))
      .filter(_ >= 0)
    val onEnd = if (stops.isEmpty) msk.length else stops.min
    val tail = sql.substring(onEnd).trim
    val andAt = findTopKeyword(u, msk, lit, onAt + 2, onEnd, "AND")
    if (andAt < 0) return sql
    val condRe =
      "^\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\.\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*(=|>=|<=)\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\.\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
    def parseCond(s: String): Option[(String, String, String, String, String)] =
      s match {
        case condRe(q1, c1, op, q2, c2) => Some((q1, c1, op, q2, c2))
        case _ => None
      }
    val conds = Seq(sql.substring(onAt + 2, andAt), sql.substring(andAt + 3, onEnd))
      .flatMap(parseCond)
    if (conds.length != 2) return sql
    def sideOf(qual: String): Option[Char] =
      if (qual.equalsIgnoreCase(aliasA) || qual.equalsIgnoreCase(ta)) Some('a')
      else if (qual.equalsIgnoreCase(aliasB) || qual.equalsIgnoreCase(tb)) Some('b')
      else None
    val eq = conds.find(_._3 == "=")
    val ineq = conds.find(c => c._3 == ">=" || c._3 == "<=")
    if (eq.isEmpty || ineq.isEmpty) return sql
    val (ka, kb) = (sideOf(eq.get._1), sideOf(eq.get._4)) match {
      case (Some('a'), Some('b')) => (eq.get._2, eq.get._5)
      case (Some('b'), Some('a')) => (eq.get._5, eq.get._2)
      case _ => return sql
    }
    // accept a.t >= b.t or b.t <= a.t (both: probe time at or after build)
    val (taT, tbT) = (sideOf(ineq.get._1), ineq.get._3, sideOf(ineq.get._4)) match {
      case (Some('a'), ">=", Some('b')) => (ineq.get._2, ineq.get._5)
      case (Some('b'), "<=", Some('a')) => (ineq.get._5, ineq.get._2)
      case _ => return sql
    }
    val aCols = schema(ta)
    val bCols = schema(tb)
    require(aCols.nonEmpty && bCols.nonEmpty,
      s"ASOF JOIN: could not resolve columns of $ta / $tb")
    def tick(c: String) = "`" + c.replace("`", "``") + "`"
    val structTy =
      bCols.map { case (c, t) => s"$c: $t" }.mkString("STRUCT<", ", ", ">")
    val aProbe = aCols.map { case (c, _) => tick(c) }.mkString(", ")
    val aNulls = aCols.map { case (c, t) => s"CAST(NULL AS $t) AS ${tick(c)}" }
      .mkString(", ")
    val bStruct = bCols.map { case (c, _) => s"'$c', ${tick(c)}" }
      .mkString("named_struct(", ", ", ")")
    val bOut = bCols.map { case (c, _) => s"__graft_m.${tick(c)} AS ${tick(c)}" }
      .mkString(", ")
    val matchFilter = if (isLeft) "" else " AND __graft_m IS NOT NULL"
    s"""SELECT $aProbe, $bOut
       |FROM (
       |  SELECT *, last(__graft_v, true) OVER (
       |      PARTITION BY __graft_k ORDER BY __graft_t, __graft_s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __graft_m
       |  FROM (
       |    SELECT $aProbe, ${tick(ka)} AS __graft_k, ${tick(taT)} AS __graft_t,
       |           0 AS __graft_s, CAST(NULL AS $structTy) AS __graft_v
       |    FROM $ta
       |    UNION ALL
       |    SELECT $aNulls, ${tick(kb)} AS __graft_k, ${tick(tbT)} AS __graft_t,
       |           1 AS __graft_s, $bStruct AS __graft_v
       |    FROM $tb))
       |WHERE __graft_s = 0$matchFilter
       |${tail}""".stripMargin.trim
  }

  private[fm] def rewriteListComp(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 32) {
      changed = false
      guard += 1
      val msk = maskComments(out)
      val u = msk.toUpperCase
      val lit = literalMask(msk)
      var i = 0
      while (i < msk.length && !changed) {
        if (msk.charAt(i) == '[' && !lit(i)) {
          val close = matchBracket(msk, i)
          if (close > i) {
            val forAt = findTopKeyword(u, msk, lit, i + 1, close, "FOR")
            if (forAt >= 0) {
              val inAt = findTopKeyword(u, msk, lit, forAt + 3, close, "IN")
              if (inAt >= 0) {
                val ifAt = findTopKeyword(u, msk, lit, inAt + 2, close, "IF")
                val expr = out.substring(i + 1, forAt).trim
                val v = out.substring(forAt + 3, inAt).trim
                val listEnd = if (ifAt >= 0) ifAt else close
                val list = out.substring(inAt + 2, listEnd).trim
                if (expr.nonEmpty && list.nonEmpty &&
                  v.nonEmpty && v.forall(c => Character.isLetterOrDigit(c) || c == '_')) {
                  val repl =
                    if (ifAt >= 0) {
                      val cond = out.substring(ifAt + 2, close).trim
                      s"transform(filter($list, $v -> $cond), $v -> $expr)"
                    } else s"transform($list, $v -> $expr)"
                  out = out.substring(0, i) + repl + out.substring(close + 1)
                  changed = true
                }
              }
            }
          }
        }
        i += 1
      }
    }
    out
  }
}
