package graft.engine

/** DuckDB-dialect acceptance shim (VERDICT r11 #3; SURVEY §7.4-1).
  *
  * The reference's NL→SQL contract pins DuckDB SQL
  * (/root/reference/doc.py:186-188); this rebuild re-pins the generator
  * prompt to Spark SQL, but a user pasting DuckDB-isms — `strftime`,
  * `list_*`, `//` integer division, `epoch()`, `time_bucket` — would get
  * a parse/analysis error where the reference runs them. [[rewrite]]
  * pre-translates the well-known spellings into Spark SQL before the
  * gateway parses; every rewritten name/operator does NOT exist in Spark
  * SQL, so valid Spark SQL passes through byte-identical and the shim
  * can run unconditionally.
  *
  * All passes are string-literal-aware: a `'%Y'` belongs to a format
  * argument being converted, but `'a//b'` or `'strftime('` inside a
  * data literal must never be touched.
  *
  * Deliberately bounded (documented, not silently wrong):
  *  - `strftime`/`strptime` accept both DuckDB (value, fmt) and
  *    sqlite-style (fmt, value) orders — the format is recognized as the
  *    string literal containing `%` codes — and translate the common
  *    C-style codes to Spark's pattern letters; an unrecognized `%` code
  *    throws with the offending code named.
  *  - `time_bucket(INTERVAL 'N unit', ts)` maps to `date_trunc` for
  *    single whole units, to floor arithmetic aligned to DuckDB's
  *    measured default origin 2000-01-03 00:00:00 UTC for N-second/
  *    minute/hour/day/WEEK multiples (round 14 — the previous epoch
  *    alignment agreed only for widths dividing 946857600 s, which
  *    every earlier-fuzzed width coincidentally did), and to
  *    pmod-floored add_months from DuckDB's measured 2000-01-01 month
  *    origin for N-month/year multiples. The 3-arg explicit-origin
  *    form is supported for every unit (second granularity keeps the
  *    origin's full sub-bucket offset; month granularity truncates the
  *    origin to its month start — both measured).
  *  - `//` becomes Spark's ` div `, whose analyzed [[IntegralDivide]]
  *    is then replaced by the type-aware
  *    [[graft.functions.DuckDiv]] via an injected resolution rule
  *    (the analyzer knows the operand types a string-level shim
  *    cannot): INTEGER `//` truncates toward zero (-5//2 = -2,
  *    measured), any FLOAT operand gives plain division (-5.0//2 =
  *    -2.5 — the docs say floor; the engine disagrees), and divisor 0
  *    yields NULL in both regimes. This closed what was a documented
  *    bound (float `//` previously surfaced Spark's div type error).
  *  - Window-frame `EXCLUDE CURRENT ROW` decomposes to frame-minus-
  *    current for SUM/COUNT/AVG; `EXCLUDE GROUP`/`TIES` decompose for
  *    the same aggregates over BOTH frame types (RANGE round 13d; ROWS
  *    and non-containing RANGE round 15, via DuckDB's measured segment
  *    arithmetic [fs, ps−1] ∪ [pe+1, fe] expressed as static prefix
  *    windows); `EXCLUDE NO OTHERS` drops. Frame bounds are classified
  *    by their TRAILING keyword (multi-token INTERVAL offsets included
  *    — round 14); an off-frame ROWS `EXCLUDE CURRENT ROW` reproduces
  *    DuckDB 1.0's measured adjacent-row extension, and the RANGE
  *    spelling — whose measured extension is in ROW space, including
  *    ORDER BY peers — decomposes over mixed ROWS/RANGE prefix windows
  *    (round 15; it was the last frame-exclusion throw). MIN/MAX
  *    (non-subtractive) and DISTINCT arguments throw.
  *  - GROUPS frames (round 16 — forward-compat for the reference's
  *    pinned duckdb>=1.3.2; the LOCAL 1.0 oracle rejects them, so the
  *    rewrites are spec-pinned against ANSI semantics, not
  *    driver-oracled): UNBOUNDED/CURRENT bound mixes map in place to
  *    the equivalent RANGE/ROWS frame; integer offsets decompose to a
  *    RANGE of ±n over a hoisted DENSE_RANK helper column (dense ranks
  *    are gapless, so value distance IS group distance — exact),
  *    wrapping the SELECT once for all such specs.
  *  - Bracket syntax (round 15): list literals `[e, …]` (and the
  *    `ARRAY[…]` spelling) become array(...); 1-based indexing `x[i]`
  *    becomes try_element_at — Spark's own bracket indexing is 0-BASED,
  *    so a pass-through was the silent off-by-one class. NULL at index
  *    0 / out of bounds / negative-from-end all measured and matched;
  *    slices `x[a:b]` throw (operand type unknowable from text).
  *  - Function-surface twins (round 16, each measured equal on DuckDB
  *    1.0): arg_max/arg_min → max_by/min_by; quantile_cont →
  *    percentile (same linear interpolation, array-q included);
  *    quantile_disc/quantile → percentile_disc WITHIN GROUP (value
  *    equal, type widens to double); list_transform/list_filter →
  *    transform/filter; list() → collect_list; select-list unnest →
  *    explode; 3-arg date_diff/datediff → per-part BOUNDARY-CROSSING
  *    arithmetic (calendar-part index difference, ISO-week truncation
  *    difference, epoch floor for sub-day parts) — Spark's own 2-arg
  *    datediff and unquoted-part spellings pass through untouched.
  *  - DISTINCT window aggregates (`COUNT/SUM/AVG/MIN/MAX(DISTINCT x)
  *    OVER …`, DuckDB-native, rejected outright by Spark) decompose
  *    over collect_set: COUNT = size(set), SUM = element-typed fold
  *    seeded by the set's first element (NULL on empty, like the
  *    engine), AVG = the pair, MIN/MAX drop the redundant DISTINCT
  *    (round 15; NULL exclusion, frame semantics and empty-frame
  *    results all measured).
  *  - List functions carry DuckDB's MEASURED semantics where a bare
  *    rename would silently diverge (round 14): `string_split`/
  *    `str_split`/`string_to_array` regex-escape their literal
  *    delimiter (DuckDB splits literally, Spark's split is a regex;
  *    non-literal delimiters throw), `list_slice` translates its
  *    1-based inclusive end to Spark's length argument (0-as-1,
  *    clamped, negative-from-end; the step form throws),
  *    `list_distinct` filters NULLs first (element ORDER is an
  *    acceptance bound — DuckDB returns hash order), `array_to_string`
  *    returns NULL when no non-null element remains, `list_concat`
  *    treats a NULL side as empty, and `len`/`array_length` resolve via
  *    the type-dispatching [[graft.functions.DuckLen]] expression.
  *  - `USING SAMPLE n[%|PERCENT|ROWS]` after a table reference becomes
  *    `TABLESAMPLE (n PERCENT|ROWS)` — an acceptance rewrite: both draw
  *    the requested sample size, by different algorithms (sampling is
  *    nondeterministic in the reference too). Query-level placement
  *    (after WHERE) surfaces Spark's parse error.
  */
object DuckDbDialect {

  /** name → name substitutions: same arity and argument order in both
    * engines, so a token-level rename suffices. */
  private val renames: Seq[(String, String)] = Seq(
    "list_value" -> "array",
    "list_pack" -> "array",
    "list_contains" -> "array_contains",
    "list_has" -> "array_contains",
    "list_length" -> "array_size",
    "list_sort" -> "array_sort",

    "list_position" -> "array_position",
    "list_indexof" -> "array_position",
    "list_min" -> "array_min",
    "list_max" -> "array_max",
    // both inclusive-end list builders with an optional step; the TABLE-
    // function placement (FROM generate_series(...)) has no Spark twin
    // and surfaces Spark's parse error after the rename — clear, not
    // silently wrong
    "generate_series" -> "sequence",
    "regexp_matches" -> "regexp_like",
    "epoch_ms" -> "unix_millis",
    "epoch_us" -> "unix_micros",
    // round 16 — the measured-equal argument-order twins: arg_max/
    // arg_min(x, y) IS max_by/min_by(x, y) (value of x at the extreme
    // y; NULL y rows skipped by both); list lambdas map 1:1 (same `x ->`
    // syntax); `list(x)` is the collect_list aggregate (ORDER BY inside
    // the call surfaces Spark's parse error — loud, documented);
    // quantile_cont(x, q) is Spark's `percentile(x, q)` — the same
    // linear interpolation, measured, and the array-of-quantiles form
    // carries over since percentile accepts an array too; a basic
    // unnest(list) in the select list is explode (struct-unnest and
    // DuckDB's multi-unnest zipping surface Spark's generator errors)
    "arg_max" -> "max_by",
    "arg_min" -> "min_by",
    "argmax" -> "max_by",
    "argmin" -> "min_by",
    "list_transform" -> "transform",
    "list_apply" -> "transform",
    "list_filter" -> "filter",
    "quantile_cont" -> "percentile",
    "list" -> "collect_list",
    "unnest" -> "explode",
    // second round-16 batch (each measured on both engines): string
    // predicates and position, list mutation/indexing (1-based NULL-
    // safe extract IS try_element_at), reversal, length
    "starts_with" -> "startswith",
    "ends_with" -> "endswith",
    "prefix" -> "startswith",
    "suffix" -> "endswith",
    "strpos" -> "instr",
    "list_reverse" -> "reverse",
    "array_reverse" -> "reverse",
    "list_append" -> "array_append",
    "array_length" -> "array_size",
    // regex split: Spark's split IS regex-based — the names map 1:1
    "string_split_regex" -> "split",
    "str_split_regex" -> "split",
    "regexp_split_to_array" -> "split",
    // star-exclusion: DuckDB `* EXCLUDE (c1, c2)` ↔ Spark `* EXCEPT (c1,
    // c2)`. Safe as a call-shaped rename: the '('-requirement leaves
    // DuckDB's window-frame `EXCLUDE CURRENT ROW` (no paren) untouched,
    // and Spark has no EXCLUDE( spelling of its own. The other star
    // modifier, `* REPLACE (expr AS c)`, is handled structurally by
    // [[rewriteStarReplace]]. `::` casts and ILIKE need no rewrite —
    // Spark 4 parses both natively.
    "exclude" -> "except")

  /** strftime %-codes → Spark datetime pattern letters. */
  private val fmtCodes: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'p' -> "a", 'j' -> "DDD", 'a' -> "EEE", 'A' -> "EEEE",
    'b' -> "MMM", 'B' -> "MMMM", 'f' -> "SSSSSS", 'g' -> "SSS",
    'G' -> "yyyy", 'n' -> "M", 'e' -> "d", '%' -> "%")

  /** Schema resolver for schema-dependent rewrites (round 20: the
    * GROUPS wrap's multi-relation qualified star + outer-reference
    * dequalification), installed per-call by [[rewriteWithSchema]] —
    * the same information source [[expandColumns]] takes as an
    * argument, but threaded implicitly because the GROUPS pass sits
    * many private calls deep. Direct [[rewrite]] callers have none and
    * keep the named bounded errors. */
  private val schemaResolver = new ThreadLocal[String => Option[Seq[String]]]

  /** [[rewrite]] with relation schemas available (the gateway path):
    * closes the text-only bounds that are schema-resolvable. */
  def rewriteWithSchema(sql: String,
      schemaOf: String => Option[Seq[String]]): String = {
    schemaResolver.set(schemaOf)
    try rewrite(sql) finally schemaResolver.remove()
  }

  def rewrite(sql: String): String = {
    var s = sql
    s = rewriteFromFirst(s)
    s = rewriteQualifyDeep(s)
    s = rewriteDistinctOn(s)
    s = rewriteStarReplace(s)
    s = rewriteAsOfJoin(s)
    s = rewriteOperatorIntDiv(s)
    s = rewriteUsingSample(s)
    s = rewriteSimilarTo(s)
    s = rewriteIgnoreNulls(s)
    s = rewriteBrackets(s)
    s = rewriteDistinctWindow(s)
    s = rewriteGroupsDeep(s)
    s = rewriteFrameExclude(s)
    s = rewriteCalls(s, "string_split")(stringSplitCall)
    s = rewriteCalls(s, "str_split")(stringSplitCall)
    s = rewriteCalls(s, "string_to_array")(stringSplitCall)
    s = rewriteCalls(s, "list_slice")(listSliceCall)
    s = rewriteCalls(s, "list_distinct")(listDistinctCall)
    s = rewriteCalls(s, "array_to_string")(arrayToStringCall)
    s = rewriteCalls(s, "list_concat")(listConcatCall)
    s = rewriteCalls(s, "list_cat")(listConcatCall)
    s = rewriteCalls(s, "strftime")(fmtCall("date_format"))
    s = rewriteCalls(s, "strptime")(fmtCall("to_timestamp"))
    s = rewriteCalls(s, "time_bucket")(timeBucket)
    s = rewriteCalls(s, "epoch")(epochCall)
    s = rewriteCalls(s, "quantile_disc")(quantileDiscCall)
    s = rewriteCalls(s, "quantile")(quantileDiscCall) // DuckDB alias of _disc
    s = rewriteCallsOpt(s, "date_diff")(dateDiffCall)
    s = rewriteCallsOpt(s, "datediff")(dateDiffCall) // 3-arg alias; 2-arg passes
    s = rewriteCalls(s, "list_prepend")(listPrependCall)
    s = rewriteCalls(s, "list_unique")(listUniqueCall)
    s = rewriteCalls(s, "list_aggregate")(listAggregateCall)
    s = rewriteCalls(s, "list_extract")(listExtractCall)
    s = rewriteCalls(s, "array_extract")(listExtractCall)
    s = rewriteCalls(s, "list_has_any")(listHasAnyCall)
    s = rewriteCalls(s, "list_has_all")(listHasAllCall)
    s = rewriteCalls(s, "array_has_any")(listHasAnyCall)
    s = rewriteCalls(s, "array_has_all")(listHasAllCall)
    s = rewriteCalls(s, "struct_pack")(structPackCall)
    s = rewriteCallsOpt(s, "regexp_extract")(regexpExtractCall)
    renames.foreach { case (from, to) => s = renameFn(s, from, to) }
    s
  }

  // ---- FROM-first syntax -------------------------------------------------

  /** DuckDB's FROM-first "friendly SQL" (promoted throughout its docs):
    * `FROM t`, `FROM t WHERE …`, and `FROM t SELECT list …` are all
    * legal statements. Measured forms (each verified on DuckDB 1.0):
    * bare FROM = SELECT *; a SELECT clause may appear after the source
    * and before WHERE/GROUP/…; trailing clauses bind as usual. The
    * rewrite relocates the SELECT list (or inserts `SELECT *`) in front
    * of each top-level set-operation branch that starts with FROM.
    * TOP-LEVEL only — a parenthesized FROM-first subquery surfaces
    * Spark's parse error (loud, documented), and set-op EXCEPT is
    * distinguished from `* EXCEPT (cols)` by peeking at the token after
    * the paren. */
  private def rewriteFromFirst(sql: String): String = {
    // The statement needs the rewrite when its FIRST branch is
    // FROM-first OR when any LATER set-op branch is (legal in DuckDB:
    // `SELECT 1 UNION ALL FROM t`) — the branch scan below finds the
    // latter, so the head-only gate decides nothing by itself.
    val headFromFirst = "(?is)^\\s*from\\b".r.findFirstIn(sql).isDefined
    val in = inString(sql)
    // segment boundaries: top-level set-op keywords whose next token
    // (after optional ALL/DISTINCT) is FROM — only those branches need
    // the rewrite, and this sidesteps the star-EXCEPT ambiguity here
    var bounds = List.empty[Int]
    var depth = 0
    var i = 0
    while (i < sql.length) {
      if (!in(i)) {
        val c = sql(i)
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        else if (depth == 0 && isIdentChar(c) && (i == 0 || !isIdentChar(sql(i - 1)))) {
          Seq("union", "intersect", "except").find(k =>
            sql.regionMatches(true, i, k, 0, k.length) &&
              (i + k.length >= sql.length || !isIdentChar(sql(i + k.length)))).foreach { k =>
            val after = "(?is)^\\s+(?:(?:all|distinct)\\s+)?from\\b".r
              .findFirstIn(sql.substring(i + k.length))
            if (after.isDefined) bounds ::= i
          }
        }
      }
      i += 1
    }
    if (!headFromFirst && bounds.isEmpty) return sql
    val cuts = (0 :: bounds).distinct.sorted :+ sql.length
    // every cut lands exactly at a set-op keyword; segments join on a
    // NEWLINE (not a space) so a `--` line comment ending one segment
    // cannot swallow the next branch's keywords
    cuts.sliding(2).map { case Seq(a, b) =>
      rewriteFromFirstSegment(sql.substring(a, b)).trim
    }.mkString("\n")
  }

  /** One set-op branch: `[UNION|INTERSECT|EXCEPT [ALL|DISTINCT]] FROM
    * <source> [SELECT <list>] <rest>` → prefix + `SELECT <list|*> FROM
    * <source> <rest>`. */
  private def rewriteFromFirstSegment(seg: String): String = {
    val m = ("(?is)^((?:\\s*(?:union|intersect|except)(?:\\s+(?:all|distinct))?)?\\s*)" +
      "from(?![A-Za-z0-9_])").r.findFirstMatchIn(seg).getOrElse(return seg)
    val prefix = m.group(1)
    val afterFrom = m.end
    val in = inString(seg)
    // clause keywords ending the FROM source / the SELECT list. EXCEPT
    // counts only as a set-op boundary when NOT introducing a
    // parenthesized star-exclusion (`* EXCEPT (cols)`) — peek: set-op
    // EXCEPT is followed by ALL/DISTINCT/SELECT/FROM/( SELECT|FROM.
    def isClauseKw(i: Int): Boolean = {
      val kws = Seq("select", "where", "group", "having", "qualify",
        "window", "order", "limit", "offset", "union", "intersect", "except")
      kws.exists { k =>
        seg.regionMatches(true, i, k, 0, k.length) &&
          (i + k.length >= seg.length || !isIdentChar(seg(i + k.length))) && {
            if (k != "except") true
            else {
              val tail = seg.substring(i + k.length)
              val paren = "(?is)^\\s*\\(\\s*([A-Za-z]+)".r.findFirstMatchIn(tail)
              paren match {
                case Some(pm) => // set-op iff the paren opens a query
                  pm.group(1).equalsIgnoreCase("select") ||
                    pm.group(1).equalsIgnoreCase("from")
                case None => true // ALL/DISTINCT/SELECT/FROM/identifier
              }
            }
          }
      }
    }
    var depth = 0
    var i = afterFrom
    var selPos = -1   // first top-level SELECT (starts the relocated list)
    var selEnd = -1   // first clause keyword after it (ends the list)
    var clausePos = -1 // first clause keyword when no SELECT came first
    while (i < seg.length) {
      if (!in(i)) {
        val c = seg(i)
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        else if (depth == 0 && isIdentChar(c) && !isIdentChar(seg(i - 1)) && isClauseKw(i)) {
          val isSelect = seg.regionMatches(true, i, "select", 0, 6) &&
            (i + 6 >= seg.length || !isIdentChar(seg(i + 6)))
          if (isSelect) { if (selPos < 0 && clausePos < 0) selPos = i }
          else if (selPos >= 0) { if (selEnd < 0) selEnd = i }
          else if (clausePos < 0) clausePos = i
        }
      }
      i += 1
    }
    // Relocated pieces join on NEWLINES: the source (or list) text may
    // end in a `--` line comment, and a space join would comment out
    // the clause that follows it (`FROM t -- c\nWHERE …` must not
    // become `… FROM t -- c WHERE …`).
    if (selPos >= 0) {
      val listEnd = if (selEnd >= 0) selEnd else seg.length
      val source = seg.substring(afterFrom, selPos)
      val list = seg.substring(selPos + 6, listEnd)
      val rest = seg.substring(listEnd).trim
      prefix + "SELECT " + list.trim + "\nFROM " + source.trim +
        (if (rest.isEmpty) "" else "\n" + rest)
    } else {
      val srcEnd = if (clausePos >= 0) clausePos else seg.length
      val source = seg.substring(afterFrom, srcEnd)
      val rest = seg.substring(srcEnd).trim
      prefix + "SELECT * FROM " + source.trim +
        (if (rest.isEmpty) "" else "\n" + rest)
    }
  }

  // ---- QUALIFY ---------------------------------------------------------

  /** DuckDB's `QUALIFY <pred>` (filter on window results — Spark has no
    * equivalent clause) rewrites to a wrapped subquery:
    *
    *   <head> QUALIFY <pred> [ORDER BY/LIMIT tail]
    *     →  SELECT * FROM ( <head> ) __qualify WHERE <pred> <tail>
    *
    * When the predicate names a select-list ALIAS the wrap alone
    * suffices. When it contains INLINE window expressions
    * (`fn(args) OVER (spec)`), each is APPENDED to the head's own
    * select list as a synthetic `__qualify_wN` column (so the window
    * evaluates against the head's FROM relation, exactly DuckDB's
    * semantics), the predicate references the alias, and an outer
    * `* EXCEPT` drops the synthetic columns from the result schema.
    *
    * Subquery-level QUALIFY is handled by [[rewriteQualifyDeep]], which
    * reduces every nested occurrence to this top-level case. Bounded
    * (throws, never silently wrong): QUALIFY followed at the same block's
    * top level by a set operation, or combining an inline window with
    * SELECT DISTINCT (appending a column would change the distinct key),
    * is rejected with a message naming the limitation. */
  /** Recursive QUALIFY driver (round 13 — closes the r12 "QUALIFY inside
    * a subquery" bound): locate a QUALIFY token at paren depth > 0, take
    * its innermost enclosing `( ... )` block — relative to that block's
    * content the QUALIFY is top-level — rewrite the content (recursively,
    * so deeper nests resolve first), splice it back, and repeat until
    * only a top-level QUALIFY (or none) remains for [[rewriteQualify]].
    * Each step eliminates one QUALIFY token, so the recursion is finite;
    * the per-block guards (set operations, DISTINCT + inline windows)
    * still apply within whichever block carries the clause. */
  private def rewriteQualifyDeep(sql: String): String = {
    val in = inString(sql)
    def wordAt(i: Int, w: String): Boolean =
      !in(i) && sql.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isIdentChar(sql(i - 1))) &&
        (i + w.length >= sql.length || !isIdentChar(sql(i + w.length)))
    var opens = List.empty[Int]
    var i = 0
    while (i < sql.length) {
      if (!in(i)) {
        val c = sql(i)
        if (c == '(') opens ::= i
        else if (c == ')') opens = opens.drop(1)
        else if (opens.nonEmpty && wordAt(i, "qualify")) {
          val start = opens.head
          var d = 0
          var end = start
          while (end < sql.length && {
            if (!in(end)) {
              if (sql(end) == '(') d += 1
              else if (sql(end) == ')') d -= 1
            }
            d != 0
          }) end += 1
          require(end < sql.length, "QUALIFY: unbalanced parentheses")
          val inner = rewriteQualifyDeep(sql.substring(start + 1, end))
          return rewriteQualifyDeep(
            sql.substring(0, start + 1) + inner + sql.substring(end))
        }
      }
      i += 1
    }
    rewriteQualify(sql)
  }

  private def rewriteQualify(sql: String): String = {
    val in = inString(sql)
    def wordAt(i: Int, w: String): Boolean =
      !in(i) && sql.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isIdentChar(sql(i - 1))) &&
        (i + w.length >= sql.length || !isIdentChar(sql(i + w.length)))
    // one scan: the FIRST top-level QUALIFY, plus every top-level set
    // operation keyword span (UNION/INTERSECT/EXCEPT with its optional
    // ALL/DISTINCT modifier) — QUALIFY binds to ITS OWN branch of a
    // compound (measured: `A UNION ALL B QUALIFY p` filters only B;
    // trailing ORDER BY/LIMIT binds to the whole compound), so the
    // rewrite wraps just the branch between the surrounding set ops.
    def setOpAt(i: Int): Boolean =
      wordAt(i, "union") || wordAt(i, "intersect") ||
        // EXCEPT is also Spark's star-exclusion (`* EXCEPT (c)`);
        // only the set operation (not preceded by `*`) counts
        (wordAt(i, "except") && {
          var p = i - 1
          while (p >= 0 && sql(p).isWhitespace) p -= 1
          p < 0 || sql(p) != '*'
        })
    def setOpEnd(i: Int): Int = {
      // end of the keyword plus an optional ALL/DISTINCT modifier
      var e = i
      while (e < sql.length && isIdentChar(sql(e))) e += 1
      var w = e
      while (w < sql.length && sql(w).isWhitespace) w += 1
      if (wordAt(w, "all") || wordAt(w, "distinct")) {
        var e2 = w
        while (e2 < sql.length && isIdentChar(sql(e2))) e2 += 1
        e2
      } else e
    }
    var depth = 0
    var q = -1
    var branchStart = 0
    var i = 0
    while (i < sql.length && q < 0) {
      val c = sql(i)
      if (!in(i)) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && setOpAt(i)) branchStart = setOpEnd(i)
        else if (wordAt(i, "qualify")) {
          if (depth > 0) throw new IllegalStateException(
            "QUALIFY at depth > 0 reached rewriteQualify — " +
              "rewriteQualifyDeep should have reduced it first")
          q = i
        }
      }
      i += 1
    }
    if (q < 0) return sql
    val prefix =
      if (branchStart == 0) "" else sql.substring(0, branchStart) + " "
    val head = sql.substring(branchStart, q).trim
    val rest = sql.substring(q + "qualify".length)
    // the predicate ends at the earliest top-level ORDER BY / LIMIT /
    // OFFSET (compound-level tail) or set operation (the next branch)
    val restIn = inString(rest)
    var d2 = 0; var tailAt = -1; var j = 0
    def restWord(i: Int, w: String): Boolean =
      !restIn(i) && rest.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isIdentChar(rest(i - 1))) &&
        (i + w.length >= rest.length || !isIdentChar(rest(i + w.length)))
    while (j < rest.length && tailAt < 0) {
      val c = rest(j)
      if (!restIn(j)) {
        if (c == '(') d2 += 1
        else if (c == ')') d2 -= 1
        else if (d2 == 0 &&
                 (restWord(j, "order") || restWord(j, "limit") || restWord(j, "offset") ||
                  restWord(j, "union") || restWord(j, "intersect") ||
                  (restWord(j, "except") && {
                    var p = j - 1
                    while (p >= 0 && rest(p).isWhitespace) p -= 1
                    p < 0 || rest(p) != '*'
                  })))
          tailAt = j
      }
      j += 1
    }
    val (pred0, tail) =
      if (tailAt < 0) (rest.trim, "")
      else (rest.substring(0, tailAt).trim, " " + rest.substring(tailAt).trim)
    val (pred, hoisted) = hoistWindows(pred0)
    if (hoisted.isEmpty)
      // recurse: a later branch of the compound may carry its own QUALIFY
      rewriteQualify(s"${prefix}SELECT * FROM ( $head ) __qualify WHERE $pred$tail")
    else {
      // Locate the head's MAIN select (the LAST top-level SELECT — a
      // WITH-prefixed head keeps its CTE bodies inside parens) and its
      // FROM, so the DISTINCT guard and the synthetic-column insertion
      // both anchor to the right block even under CTEs.
      val headIn = inString(head)
      var hd = 0; var fromAt = -1; var selAt = -1; var h = 0
      def headWord(i: Int, w: String): Boolean =
        !headIn(i) && head.regionMatches(true, i, w, 0, w.length) &&
          (i == 0 || !isIdentChar(head(i - 1))) &&
          (i + w.length >= head.length || !isIdentChar(head(i + w.length)))
      while (h < head.length) {
        val c = head(h)
        if (!headIn(h)) {
          if (c == '(') hd += 1
          else if (c == ')') hd -= 1
          else if (hd == 0) {
            if (headWord(h, "select")) { selAt = h; fromAt = -1 }
            else if (fromAt < 0 && headWord(h, "from")) fromAt = h
          }
        }
        h += 1
      }
      require(selAt >= 0 && fromAt > selAt,
        "QUALIFY: could not locate the head query's SELECT ... FROM block")
      if ("(?is)^select\\s+distinct\\b".r
            .findFirstIn(head.substring(selAt)).isDefined)
        throw new IllegalArgumentException(
          "QUALIFY with an inline window over SELECT DISTINCT is outside the " +
            "shim's bounded support — alias the window in the select list instead")
      val synth = hoisted.map { case (expr, alias) => s"$expr AS $alias" }.mkString(", ")
      val headWithSynth =
        head.substring(0, fromAt) + s", $synth " + head.substring(fromAt)
      val drop = hoisted.map(_._2).mkString(", ")
      rewriteQualify(
        s"${prefix}SELECT * EXCEPT ($drop) FROM ( $headWithSynth ) __qualify WHERE $pred$tail")
    }
  }

  /** Replace each inline `identifier(args) OVER (spec)` in `pred` with a
    * synthetic alias; returns (rewritten predicate, (expr, alias) list). */
  private def hoistWindows(pred0: String): (String, Seq[(String, String)]) = {
    var pred = pred0
    val hoisted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var guard = 0
    while (guard < 50) {
      guard += 1
      val in = inString(pred)
      var i = 0; var overAt = -1
      while (i < pred.length && overAt < 0) {
        if (!in(i) && pred.regionMatches(true, i, "over", 0, 4) &&
            (i == 0 || !isIdentChar(pred(i - 1))) &&
            (i + 4 >= pred.length || !isIdentChar(pred(i + 4)))) overAt = i
        else i += 1
      }
      if (overAt < 0) return (pred, hoisted.toSeq)
      // spec parens after OVER
      var j = overAt + 4
      while (j < pred.length && pred(j).isWhitespace) j += 1
      require(j < pred.length && pred(j) == '(',
        "QUALIFY: expected ( after OVER (named windows are unsupported)")
      var depth = 1; var k = j + 1
      while (depth > 0 && k < pred.length) {
        if (!in(k)) {
          if (pred(k) == '(') depth += 1 else if (pred(k) == ')') depth -= 1
        }
        k += 1
      }
      require(depth == 0, "QUALIFY: unbalanced OVER specification")
      val specEnd = k // exclusive
      // function call before OVER: walk back over ws to ')', match to
      // its '(' and take the identifier before it
      var p = overAt - 1
      while (p >= 0 && pred(p).isWhitespace) p -= 1
      require(p >= 0 && pred(p) == ')',
        "QUALIFY: expected fn(...) immediately before OVER")
      var d3 = 1; var m = p - 1
      while (d3 > 0 && m >= 0) {
        if (!in(m)) {
          if (pred(m) == ')') d3 += 1 else if (pred(m) == '(') d3 -= 1
        }
        if (d3 > 0) m -= 1
      }
      require(d3 == 0, "QUALIFY: unbalanced window function call")
      var idStart = m - 1
      while (idStart >= 0 && isIdentChar(pred(idStart))) idStart -= 1
      idStart += 1
      require(idStart < m, "QUALIFY: expected a function name before OVER")
      val alias = s"__qualify_w${hoisted.size + 1}"
      hoisted += ((pred.substring(idStart, specEnd), alias))
      pred = pred.substring(0, idStart) + alias + pred.substring(specEnd)
    }
    throw new IllegalArgumentException("QUALIFY window hoisting did not converge")
  }

  /** epoch(ts): DuckDB returns DOUBLE seconds INCLUDING the fractional
    * part (bit-identical to epoch_us/1e6) — a rename to unix_timestamp
    * would floor to whole seconds and round differently under a later
    * CAST. The exact translation divides microseconds as a double.
    * (The `epoch` scan never matches `epoch_ms(`/`epoch_us(` — the
    * character after the matched name must be `(`.) */
  private def epochCall(args: Seq[String]): String = {
    require(args.size == 1, s"epoch: expected 1 argument, got ${args.size}")
    s"(unix_micros(${args.head}) / 1.0E6)"
  }

  // ---- DISTINCT ON -----------------------------------------------------

  /** PostgreSQL-style `SELECT DISTINCT ON (keys) items … ORDER BY …`
    * (DuckDB supports it; Spark does not): keep the FIRST row of each
    * distinct key tuple under the query's ORDER BY. Rewritten to the
    * window formulation:
    *
    *   SELECT items FROM ( SELECT *, ROW_NUMBER() OVER (PARTITION BY
    *     keys ORDER BY <order-tail>) AS __don_rn FROM <from-part>
    *   ) __don WHERE __don_rn = 1 [ORDER BY …] [LIMIT …]
    *
    * Bounds (throws, never silently wrong): an ORDER BY is REQUIRED
    * (without one the picked row is engine-arbitrary — refusing beats
    * silently diverging); no GROUP BY/HAVING in the same block; one
    * top-level DISTINCT ON per statement (none inside subqueries); and
    * bare `*` select items become `* EXCEPT (__don_rn)` so the
    * synthetic rank column never leaks. Window ORDER BY reuses the
    * query's ORDER BY text verbatim; ordinal ORDER BY is rejected
    * (ordinals would re-bind inside the window). */
  private def rewriteDistinctOn(sql: String): String = {
    val in = inString(sql)
    def wordAt(i: Int, w: String): Boolean =
      !in(i) && sql.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isIdentChar(sql(i - 1))) &&
        (i + w.length >= sql.length || !isIdentChar(sql(i + w.length)))
    // locate top-level SELECT DISTINCT ON (
    var i = 0; var depth = 0; var at = -1
    while (i < sql.length && at < 0) {
      if (!in(i)) {
        if (sql(i) == '(') depth += 1
        else if (sql(i) == ')') depth -= 1
        else if (wordAt(i, "select")) {
          var j = i + 6
          while (j < sql.length && sql(j).isWhitespace) j += 1
          if (sql.regionMatches(true, j, "distinct", 0, 8)) {
            var k = j + 8
            while (k < sql.length && sql(k).isWhitespace) k += 1
            if (sql.regionMatches(true, k, "on", 0, 2) &&
                (k + 2 >= sql.length || !isIdentChar(sql(k + 2)))) {
              if (depth > 0) throw new IllegalArgumentException(
                "DISTINCT ON inside a subquery is outside the shim's bounded support")
              at = i
            }
          }
        }
      }
      i += 1
    }
    if (at < 0) return sql
    // keys list
    var p = sql.indexOf('(', at)
    var d2 = 1; var k2 = p + 1
    while (d2 > 0 && k2 < sql.length) {
      if (!in(k2)) {
        if (sql(k2) == '(') d2 += 1 else if (sql(k2) == ')') d2 -= 1
      }
      k2 += 1
    }
    require(d2 == 0, "DISTINCT ON: unbalanced key list")
    val keys = sql.substring(p + 1, k2 - 1).trim
    require(keys.nonEmpty, "DISTINCT ON: empty key list")
    // select items run to the top-level FROM
    val itemsStart = k2
    var q2 = itemsStart; var d3 = 0; var fromAt = -1
    while (q2 < sql.length && fromAt < 0) {
      if (!in(q2)) {
        if (sql(q2) == '(') d3 += 1
        else if (sql(q2) == ')') d3 -= 1
        else if (d3 == 0 && wordAt(q2, "from")) fromAt = q2
      }
      q2 += 1
    }
    require(fromAt > 0, "DISTINCT ON: could not locate FROM")
    val items = sql.substring(itemsStart, fromAt).trim
    // from-part runs to the top-level ORDER BY / LIMIT / OFFSET (GROUP/
    // HAVING/QUALIFY/set ops are out of bounds)
    var r2 = fromAt; var d4 = 0; var tailAt = -1
    while (r2 < sql.length && tailAt < 0) {
      if (!in(r2)) {
        if (sql(r2) == '(') d4 += 1
        else if (sql(r2) == ')') d4 -= 1
        else if (d4 == 0) {
          if (wordAt(r2, "group") || wordAt(r2, "having") ||
              wordAt(r2, "qualify") || wordAt(r2, "union") ||
              wordAt(r2, "intersect") ||
              (wordAt(r2, "except") && { // not the star modifier
                var s2 = r2 - 1
                while (s2 >= 0 && sql(s2).isWhitespace) s2 -= 1
                s2 < 0 || sql(s2) != '*'
              }))
            throw new IllegalArgumentException(
              "DISTINCT ON combined with GROUP BY/HAVING/QUALIFY/set operations " +
                "is outside the shim's bounded support")
          else if (wordAt(r2, "order") || wordAt(r2, "limit") || wordAt(r2, "offset"))
            tailAt = r2
        }
      }
      r2 += 1
    }
    val fromPart = sql.substring(fromAt + 4,
      if (tailAt < 0) sql.length else tailAt).trim
    val tail = if (tailAt < 0) "" else sql.substring(tailAt).trim
    require(tail.toLowerCase.startsWith("order"),
      "DISTINCT ON without ORDER BY picks an engine-arbitrary row — add an " +
        "ORDER BY naming the keys first (the shim refuses rather than diverge)")
    // window order = the ORDER BY expressions, verbatim
    val obIn = inString(tail)
    var obEnd = tail.length; var d5 = 0
    var t2 = 0
    while (t2 < tail.length && obEnd == tail.length) {
      if (!obIn(t2)) {
        if (tail(t2) == '(') d5 += 1
        else if (tail(t2) == ')') d5 -= 1
        else if (d5 == 0 && (tail.regionMatches(true, t2, "limit", 0, 5) ||
                 tail.regionMatches(true, t2, "offset", 0, 6)) &&
                 (t2 == 0 || !isIdentChar(tail(t2 - 1))))
          obEnd = t2
      }
      t2 += 1
    }
    val orderExprs = tail.substring(tail.toLowerCase.indexOf("by") + 2, obEnd).trim
    require(!orderExprs.split(',').exists(_.trim.matches("[0-9]+.*")),
      "DISTINCT ON with ordinal ORDER BY is outside the shim's bounded " +
        "support — name the expressions")
    // a bare * item must not surface the synthetic rank column
    val outItems = splitTopLevel(items, ',')
      .map(it => if (it.trim == "*") "* EXCEPT (__don_rn)" else it.trim)
      .mkString(", ")
    s"SELECT $outItems FROM ( SELECT *, ROW_NUMBER() OVER (PARTITION BY $keys " +
      s"ORDER BY $orderExprs) AS __don_rn FROM $fromPart ) __don " +
      s"WHERE __don_rn = 1 $tail"
  }

  // ---- * REPLACE (expr AS col, ...) ------------------------------------

  /** DuckDB's star-replace modifier — `SELECT * REPLACE (e AS c) …`
    * (reference contract: any DuckDB SELECT) — has no Spark spelling.
    * Rewritten to `* EXCEPT (c), e AS c`: identical column SET and
    * values, but the replaced columns surface at the END of the star
    * expansion instead of in place (Spark's EXCEPT cannot splice). That
    * ordering difference is the documented bound; value semantics match.
    *
    * Disambiguation from multiplication by the REPLACE() function
    * (`price * replace(s,'a','b')`): the star-modifier's `*` is itself a
    * select item, so the non-space char before it is `,` or the keyword
    * SELECT/DISTINCT; any other left context is arithmetic and skipped.
    * The combined chain `* EXCLUDE (cols) REPLACE (e AS c)` (DuckDB's
    * modifier order) is recognized by looking through the EXCLUDE list
    * when the char before REPLACE is its `)`: the exclusion columns are
    * merged into the EXCEPT (`* EXCEPT (cols, c), e AS c`). The reversed
    * spelling `* REPLACE (...) EXCLUDE (...)` is not DuckDB grammar and
    * surfaces as a parse error rather than silently-wrong columns. */
  private def rewriteStarReplace(sql: String): String = {
    val in = inString(sql)
    var i = 0
    while (i < sql.length) {
      if (!in(i) && sql.regionMatches(true, i, "replace", 0, 7) &&
          (i == 0 || !isIdentChar(sql(i - 1))) &&
          (i + 7 >= sql.length || !isIdentChar(sql(i + 7)))) {
        // star immediately before (modifier), '(' after (argument list);
        // OR the chain form `* EXCLUDE (cols) REPLACE (...)`, where the
        // non-space char before REPLACE is the EXCLUDE list's ')'.
        var p = i - 1
        while (p >= 0 && sql(p).isWhitespace) p -= 1
        var a = i + 7
        while (a < sql.length && sql(a).isWhitespace) a += 1
        // starPos = the modifier's '*'; for the chain form also collect
        // the EXCLUDE column list (merged into the EXCEPT below).
        var starPos = -1
        var excludeCols: Seq[String] = Nil
        if (p >= 0 && sql(p) == '*') starPos = p
        else if (p >= 0 && sql(p) == ')') {
          var depth = 1; var b = p - 1
          while (depth > 0 && b >= 0) {
            if (!in(b)) {
              if (sql(b) == ')') depth += 1
              else if (sql(b) == '(') depth -= 1
            }
            if (depth > 0) b -= 1
          }
          if (depth == 0) {
            var q2 = b - 1
            while (q2 >= 0 && sql(q2).isWhitespace) q2 -= 1
            var e2 = q2
            while (e2 >= 0 && isIdentChar(sql(e2))) e2 -= 1
            val kw = sql.substring(e2 + 1, q2 + 1).toLowerCase
            if (kw == "exclude" || kw == "except") {
              var s2 = e2
              while (s2 >= 0 && sql(s2).isWhitespace) s2 -= 1
              if (s2 >= 0 && sql(s2) == '*') {
                starPos = s2
                excludeCols =
                  splitTopLevel(sql.substring(b + 1, p), ',').map(_.trim)
              }
            }
          }
        }
        if (starPos >= 0 && a < sql.length && sql(a) == '(') {
          val p0 = starPos
          // context before the star: ',' or SELECT/DISTINCT → modifier
          var q = p0 - 1
          while (q >= 0 && sql(q).isWhitespace) q -= 1
          val isModifier = q < 0 || sql(q) == ',' || {
            var e = q
            while (e >= 0 && isIdentChar(sql(e))) e -= 1
            val w = sql.substring(e + 1, q + 1).toLowerCase
            w == "select" || w == "distinct"
          }
          if (isModifier) {
            // find the matching ')' of the argument list
            var depth = 1; var k = a + 1
            while (depth > 0 && k < sql.length) {
              if (!in(k)) {
                if (sql(k) == '(') depth += 1
                else if (sql(k) == ')') depth -= 1
              }
              k += 1
            }
            require(depth == 0, "* REPLACE: unbalanced argument list")
            val items = splitTopLevel(sql.substring(a + 1, k - 1), ',')
            val pairs = items.map { it =>
              val m = "(?is)^(.*\\S)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
                .findFirstMatchIn(it.trim).getOrElse(throw new IllegalArgumentException(
                  s"* REPLACE: expected `expr AS column`, got: ${it.trim}"))
              (m.group(1), m.group(2))
            }
            val except = (excludeCols ++ pairs.map(_._2)).mkString(", ")
            val repl = pairs.map { case (e, c) => s"$e AS $c" }.mkString(", ")
            val out = sql.substring(0, p0) + s"* EXCEPT ($except), $repl" + sql.substring(k)
            return rewriteStarReplace(out) // handle any further occurrence
          }
        }
      }
      i += 1
    }
    sql
  }

  // ---- ASOF JOIN -------------------------------------------------------

  /** DuckDB `ASOF [LEFT] JOIN t [alias] ON eq-conds AND one-inequality`
    * (the reference's contract includes it; Spark has no ASOF operator).
    * Rewritten to the domain-join + window formulation — ASOF's match
    * depends only on the left row's (key…, ordering-value) tuple, so the
    * best right row is computed once per DISTINCT tuple and equi-joined
    * back:
    *
    *   a ASOF JOIN b ON b.k = a.k AND a.ts >= b.ts
    *     → a JOIN ( SELECT * FROM (
    *           SELECT d.*, b.*, ROW_NUMBER() OVER (PARTITION BY
    *             d.__asof_c1, d.__asof_t ORDER BY b.ts DESC) AS __asof_rn
    *           FROM (SELECT DISTINCT a.k AS __asof_c1, a.ts AS __asof_t
    *                 FROM lefttable a) d
    *           JOIN b ON b.k = d.__asof_c1 AND d.__asof_t >= b.ts
    *         ) __asof_w WHERE __asof_rn = 1
    *       ) b ON b.__asof_c1 = a.k AND b.__asof_t = a.ts
    *
    * Every join here is an EQUI-join (domain⋈right on the keys, derived
    * ⋈ left on keys + ordering value) and the rank-1 filter plans as
    * WindowGroupLimit — shuffle-bounded at any size. The obvious
    * alternative, a correlated `ORDER BY … LIMIT 1` LATERAL, decorrelates
    * in Catalyst to a BroadcastNestedLoopJoin of the ordering-value
    * domain against the ENTIRE right table (measured; the equality gets
    * pulled to the outer join, leaving only the inequality for the
    * domain join) — a mandatory unbounded broadcast, disqualifying at
    * scale. The dedicated [[graft.ops.AsOf]] merge formulation remains
    * the preferred DataFrame-API path (one shuffle, no expansion).
    *
    * Bounds (throws, never silently wrong): the right side is a plain
    * table/view/CTE name or an aliased parenthesized subquery (the
    * relation text appears once in the rewrite, so a derived table
    * drops in verbatim); the ON clause a top-level
    * AND-conjunction of `=` equalities plus EXACTLY one inequality
    * (>=, <=, >, <); all left-side operands qualified by ONE alias whose
    * relation is the plain name immediately before ASOF; and the outer
    * select list must name its columns (a bare `*` would surface the
    * synthetic `__asof_*` join columns). Ties on the inequality bound
    * are deterministic only when the ordering expression is unique per
    * key — the same caveat DuckDB's ASOF documents. NULL ordering values
    * are 3VL here (a NULL timestamp matches nothing); DuckDB's
    * sort-based ASOF gives them implementation-defined behavior instead
    * (observed on 1.0.0: NULL ≈ +∞ under `>=` but direction-dependent
    * artifacts under `<=`), so rows with NULL ordering keys are outside
    * the equivalence bound — filter them explicitly when they can
    * occur. */
  private def rewriteAsOfJoin(sql: String): String = {
    val in = inString(sql)
    def wordAt(i: Int, w: String): Boolean =
      !in(i) && sql.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isIdentChar(sql(i - 1))) &&
        (i + w.length >= sql.length || !isIdentChar(sql(i + w.length)))
    var i = 0
    while (i < sql.length && !wordAt(i, "asof")) i += 1
    if (i >= sql.length) return sql
    val start = i
    var j = i + 4
    def skipWs(): Unit = { while (j < sql.length && sql(j).isWhitespace) j += 1 }
    def word(): String = {
      skipWs(); val s0 = j
      while (j < sql.length && isIdentChar(sql(j))) j += 1
      sql.substring(s0, j)
    }
    var w1 = word()
    val isLeft = w1.equalsIgnoreCase("left")
    if (isLeft) w1 = word()
    require(w1.equalsIgnoreCase("join"),
      s"ASOF: expected [LEFT] JOIN after ASOF, got '$w1' (RIGHT/FULL ASOF is outside the shim's bounded support)")
    skipWs()
    // right side: a plain table/view/CTE name, or (round 13b) a
    // parenthesized subquery — the relation text appears exactly once in
    // the rewrite (the domain join), so a derived table drops in as-is;
    // it must carry an alias (the ON clause references its columns)
    val table =
      if (j < sql.length && sql(j) == '(') {
        val s0 = j
        var d = 1; j += 1
        while (d > 0 && j < sql.length) {
          if (!in(j)) {
            if (sql(j) == '(') d += 1 else if (sql(j) == ')') d -= 1
          }
          j += 1
        }
        require(d == 0, "ASOF: unbalanced subquery after JOIN")
        sql.substring(s0, j)
      } else word()
    require(table.nonEmpty, "ASOF: expected a table name or subquery after JOIN")
    var nxt = word()
    var alias = if (table.startsWith("(")) "" else table
    if (nxt.equalsIgnoreCase("as")) { alias = word(); nxt = word() }
    else if (!nxt.equalsIgnoreCase("on") && nxt.nonEmpty) { alias = nxt; nxt = word() }
    require(alias.nonEmpty,
      "ASOF JOIN over a subquery needs an alias (its columns are referenced in ON)")
    require(nxt.equalsIgnoreCase("on"), s"ASOF: expected ON, got '$nxt'")
    // condition runs to the next top-level clause keyword or join, or EOS
    val terminators = Seq("where", "group", "having", "order", "limit",
      "offset", "qualify", "window", "union", "intersect", "except",
      "join", "inner", "left", "right", "full", "cross", "asof")
    var depth = 0
    val condStart = { skipWs(); j }
    var condEnd = -1
    while (j < sql.length && condEnd < 0) {
      val c = sql(j)
      if (!in(j)) {
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth < 0) condEnd = j }
        else if (depth == 0 && terminators.exists(wordAt(j, _))) condEnd = j
      }
      if (condEnd < 0) j += 1
    }
    if (condEnd < 0) condEnd = sql.length
    val cond = sql.substring(condStart, condEnd).trim
    val conjuncts = splitTopLevelKeyword(cond, "and")
    def opOf(c: String): Option[(String, String, String)] = {
      val cIn = inString(c)
      var d = 0; var k = 0
      while (k < c.length) {
        val ch = c(k)
        if (!cIn(k)) {
          if (ch == '(') d += 1
          else if (ch == ')') d -= 1
          else if (d == 0 && (ch == '<' || ch == '>' || ch == '=')) {
            val op = if (k + 1 < c.length && (c(k + 1) == '=' || c(k + 1) == '>'))
              c.substring(k, k + 2) else c.substring(k, k + 1)
            return Some((c.substring(0, k).trim, op, c.substring(k + op.length).trim))
          }
        }
        k += 1
      }
      None
    }
    val parsed = conjuncts.map(c => (c, opOf(c)))
    parsed.collectFirst { case (c, None) => c }.foreach(c =>
      throw new IllegalArgumentException(s"ASOF: unsupported ON conjunct (no comparison): $c"))
    val refsRight = (e: String) =>
      ("(?i)(^|[^A-Za-z0-9_])" + java.util.regex.Pattern.quote(alias) + "\\s*\\.").r
        .findFirstIn(e).isDefined
    // split each conjunct into (leftSideExpr, rightSideExpr) with the
    // joined table's side identified
    def sides(lhs: String, rhs: String, what: String): (String, String) =
      (refsRight(lhs), refsRight(rhs)) match {
        case (false, true) => (lhs, rhs)
        case (true, false) => (rhs, lhs)
        case _ => throw new IllegalArgumentException(
          s"ASOF: exactly one side of each $what must reference the joined " +
            s"table's alias '$alias' (qualify the columns)")
      }
    val ineqs = parsed.collect { case (_, Some(t @ (_, op, _)))
      if op == "<" || op == ">" || op == "<=" || op == ">=" => t }
    val eqTriples = parsed.collect { case (_, Some(t @ (_, "=", _))) => t }
    require(ineqs.size == 1,
      s"ASOF: expected exactly one inequality in ON, found ${ineqs.size}")
    require(eqTriples.size + ineqs.size == parsed.size,
      "ASOF: ON conjuncts must be `=` equalities plus one inequality")
    val eqs = eqTriples.map { case (l, _, r) => sides(l, r, "equality") }
    val (ilhs, iop, irhs) = ineqs.head
    val (itL, itR) = sides(ilhs, irhs, "inequality")
    // direction in outer-op-right orientation
    val outerOp =
      if (!refsRight(ilhs)) iop // already outer op right
      else iop match { case ">=" => "<="; case "<=" => ">="; case ">" => "<"; case "<" => ">" }
    // outer >= right → latest right at-or-before → DESC
    val dir = if (outerOp == ">=" || outerOp == ">") "DESC" else "ASC"
    val nf = if (dir == "DESC") "NULLS LAST" else "NULLS FIRST"
    // the ONE alias qualifying every left-side operand
    val aliasOf = (e: String) =>
      "([A-Za-z_][A-Za-z0-9_]*)\\s*\\.".r.findFirstMatchIn(e).map(_.group(1))
    val leftAliases = (eqs.map(_._1) :+ itL).flatMap(aliasOf).distinct
    require(leftAliases.size == 1, "ASOF: left-side operands must all be " +
      s"qualified by one alias (found: ${leftAliases.mkString(", ")})")
    val la = leftAliases.head
    // the relation named immediately before ASOF must define that alias
    val leftTable = {
      var p = start - 1
      def wordBack(): String = {
        while (p >= 0 && sql(p).isWhitespace) p -= 1
        val e = p
        while (p >= 0 && isIdentChar(sql(p))) p -= 1
        sql.substring(p + 1, e + 1)
      }
      val w2 = wordBack()
      val w1 = wordBack()
      if (w2.equalsIgnoreCase(la) && w1.equalsIgnoreCase("from")) la
      else if (w2.equalsIgnoreCase(la) && w1.nonEmpty &&
               !w1.equalsIgnoreCase("join") && !w1.equalsIgnoreCase("as")) w1
      else if (w2.equalsIgnoreCase(la) && w1.equalsIgnoreCase("as")) wordBack()
      else throw new IllegalArgumentException(
        s"ASOF: the relation immediately before ASOF must be the plain " +
          s"table of alias '$la' (multi-join left sides are outside the " +
          "shim's bounded support — wrap them in a CTE)")
    }
    // a bare star in the governing select list would surface the
    // synthetic __asof_* columns — refuse rather than silently widen
    locally {
      var selAt = -1; var fromAt = -1; var d0 = 0; var h = 0
      while (h < start) {
        val c = sql(h)
        if (!in(h)) {
          if (c == '(') d0 += 1
          else if (c == ')') d0 -= 1
          else if (d0 == 0) {
            if (wordAt(h, "select")) { selAt = h; fromAt = -1 }
            else if (fromAt < 0 && wordAt(h, "from")) fromAt = h
          }
        }
        h += 1
      }
      if (selAt >= 0 && fromAt > selAt) {
        val items = sql.substring(selAt + 6, fromAt)
        val itemsIn = inString(items)
        var d1 = 0
        for (i <- 0 until items.length) {
          if (!itemsIn(i)) {
            if (items(i) == '(') d1 += 1
            else if (items(i) == ')') d1 -= 1
            else if (items(i) == '*' && d1 == 0) {
              // multiplication has an operand before the star
              var q = i - 1
              while (q >= 0 && items(q).isWhitespace) q -= 1
              val isMul = q >= 0 && (isIdentChar(items(q)) || items(q) == ')' ||
                items(q) == '\'' || items(q) == '"')
              if (!isMul) throw new IllegalArgumentException(
                "ASOF with a bare * select list is outside the shim's bounded " +
                  "support (the rewrite would surface synthetic __asof_ columns) " +
                  "— name the output columns")
            }
          }
        }
      }
    }
    val domainCols = eqs.map(_._1) :+ itL
    val names = domainCols.indices.map(i =>
      if (i == domainCols.size - 1) "__asof_t" else s"__asof_c${i + 1}")
    val domainSel = domainCols.zip(names)
      .map { case (e, n) => s"$e AS $n" }.mkString(", ")
    val innerOn = (eqs.map(_._2).zip(names.init)
      .map { case (r, n) => s"$r = d.$n" } :+
      s"d.${names.last} $outerOp $itR").mkString(" AND ")
    val outerOn = domainCols.zip(names)
      .map { case (e, n) => s"$alias.$n = $e" }.mkString(" AND ")
    val derived =
      s"SELECT * EXCEPT (__asof_rn) FROM ( SELECT d.*, $alias.*, ROW_NUMBER() OVER (PARTITION BY " +
        names.map(n => s"d.$n").mkString(", ") +
        s" ORDER BY $itR $dir $nf) AS __asof_rn " +
        s"FROM (SELECT DISTINCT $domainSel FROM $leftTable $la) d " +
        s"JOIN $table $alias ON $innerOn ) __asof_w WHERE __asof_rn = 1"
    val joinKw = if (isLeft) "LEFT JOIN" else "JOIN"
    val repl = s"$joinKw ( $derived ) $alias ON $outerOn"
    rewriteAsOfJoin(sql.substring(0, start) + repl + " " + sql.substring(condEnd))
  }

  /** Split on a top-level single-char separator, paren- and mask-aware. */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val in = inString(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var st = 0; var i = 0
    while (i < s.length) {
      val c = s(i)
      if (!in(i)) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == sep && depth == 0) { out += s.substring(st, i); st = i + 1 }
      }
      i += 1
    }
    out += s.substring(st)
    out.toSeq
  }

  /** Split on a top-level keyword (e.g. AND), case-insensitive. */
  private def splitTopLevelKeyword(s: String, kw: String): Seq[String] = {
    val in = inString(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var st = 0; var i = 0
    while (i < s.length) {
      val c = s(i)
      if (!in(i)) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && s.regionMatches(true, i, kw, 0, kw.length) &&
                 (i == 0 || !isIdentChar(s(i - 1))) &&
                 (i + kw.length >= s.length || !isIdentChar(s(i + kw.length)))) {
          out += s.substring(st, i); st = i + kw.length; i += kw.length - 1
        }
      }
      i += 1
    }
    out += s.substring(st)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  // ---- string-literal-aware scanning helpers ---------------------------

  /** Mask of positions the rewrites must not touch: single-quoted string
    * literals, double-quoted identifiers, `--` line comments and
    * `/* */` block comments. Without the latter three, a QUALIFY/UNION/
    * ORDER keyword inside a quoted identifier or comment would mis-steer
    * the clause scan, and `//` inside a comment would be "rewritten". */
  private def inString(sql: String): Array[Boolean] = {
    val in = new Array[Boolean](sql.length)
    var i = 0
    while (i < sql.length) {
      sql(i) match {
        case '\'' | '"' =>
          val quote = sql(i)
          in(i) = true; i += 1
          while (i < sql.length && sql(i) != quote) { in(i) = true; i += 1 }
          if (i < sql.length) { in(i) = true; i += 1 } // closing quote
        case '-' if i + 1 < sql.length && sql(i + 1) == '-' =>
          while (i < sql.length && sql(i) != '\n') { in(i) = true; i += 1 }
        case '/' if i + 1 < sql.length && sql(i + 1) == '*' =>
          in(i) = true; in(i + 1) = true; i += 2
          while (i < sql.length &&
                 !(sql(i) == '*' && i + 1 < sql.length && sql(i + 1) == '/')) {
            in(i) = true; i += 1
          }
          if (i + 1 < sql.length) { in(i) = true; in(i + 1) = true; i += 2 }
        case _ => i += 1
      }
    }
    in
  }

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** Replace `//` with ` div ` outside string literals. */
  /** DuckDB `USING SAMPLE n[%|PERCENT|ROWS]` after a table reference →
    * Spark `TABLESAMPLE (n PERCENT|ROWS)` (round 13). A bare count is
    * rows (DuckDB's default). Equivalence bound, stated: both engines
    * then draw a sample of the requested size — the sampling ALGORITHM
    * differs (DuckDB reservoir vs Spark bernoulli/row-limit), so this
    * is an acceptance rewrite (the statement runs and means the same
    * thing), not a row-identical one; sampling is nondeterministic in
    * the reference too. DuckDB also allows the clause at query level
    * (after WHERE); Spark's TABLESAMPLE is table-level only, so that
    * placement surfaces Spark's parse error — a clear message, never a
    * silently different result. */
  /** `expr [NOT] SIMILAR TO '<pattern>'` → `expr [NOT] RLIKE
    * '^(?:<pattern>)$'`. The SQL standard (and DuckDB's own docs) says
    * SIMILAR TO treats `%`/`_` as LIKE wildcards, but DuckDB 1.0.0 —
    * the oracle this engine answers to — implements it as a plain
    * ANCHORED regex full-match with NO wildcard translation (measured:
    * `'abbbc' SIMILAR TO 'a%c'` is FALSE, `'abc' SIMILAR TO 'a(.|x)c'`
    * is TRUE); `\x` escapes the next char in both regex dialects. So
    * the faithful rewrite is anchor + pass-through, with backslashes
    * doubled for Spark's escaping string-literal parser. Bounds
    * (throws, never silently wrong): an ESCAPE clause. */
  private def rewriteSimilarTo(sql: String): String = {
    val in = inString(sql)
    val re = "(?i)\\b(not\\s+)?similar\\s+to\\s+('(?:[^']|'')*')".r
    re.replaceAllIn(sql, m => {
      if (in(m.start)) scala.util.matching.Regex.quoteReplacement(m.matched)
      else {
        if (sql.substring(m.end).matches("(?is)\\s*escape\\b.*"))
          throw new IllegalArgumentException(
            "SIMILAR TO ... ESCAPE is not supported by the dialect shim")
        val lit = m.group(2)
        val pat = lit.substring(1, lit.length - 1).replace("\\", "\\\\")
        val neg = if (m.group(1) != null) "not " else ""
        scala.util.matching.Regex.quoteReplacement(s"${neg}rlike '^(?:$pat)$$'")
      }
    })
  }

  // ---- COLUMNS('regex') star expansion -----------------------------------

  /** DuckDB's `COLUMNS('regex')` star expansion (friendly SQL). It
    * needs the FROM relation's SCHEMA, which the text shim does not
    * have — so this pass takes a resolver and runs from the GATEWAY
    * (SqlGateway.run), not from [[rewrite]]; a bare rewrite() leaves
    * COLUMNS untouched (Spark's unresolved-routine error names it).
    *
    * Measured semantics (DuckDB 1.0): the regex matches PARTIALLY (RE2
    * search — 'a' matches column 'abc') and case-sensitively; columns
    * expand in relation order; ZERO matches is a binder error (kept: a
    * silent empty expansion would change the projection arity); a
    * COLUMNS inside an expression replicates the ENTIRE select-list
    * item once per matching column, each output named by the BASE
    * column (`SELECT min(COLUMNS('.*')) FROM t` → columns a, b — not
    * min(a)).
    *
    * Bounds (named errors, never silently wrong): literal regex only;
    * one COLUMNS per select-list item; no explicit alias on the item
    * (the replicas are named by column); the FROM must list plain
    * identifiers (joins supported — schemas concatenate in FROM order —
    * but a derived-table FROM is rejected). Subquery-level COLUMNS
    * reduces through the same query-block recursion as the GROUPS
    * pass. */
  def expandColumns(sql: String, schemaOf: String => Option[Seq[String]]): String = {
    val in = inString(sql)
    // locate the first COLUMNS( call outside strings
    var i = 0; var found = -1
    while (found < 0 && i < sql.length) {
      if (!in(i) && sql.regionMatches(true, i, "columns", 0, 7) &&
          (i == 0 || !isIdentChar(sql(i - 1)))) {
        var j = i + 7
        while (j < sql.length && sql(j).isWhitespace) j += 1
        if (j < sql.length && sql(j) == '(') found = i else i += 1
      } else i += 1
    }
    if (found < 0) return sql
    // inside a subquery? recurse into the innermost QUERY-block paren
    var enclosing = List.empty[Int]
    i = 0
    while (i < found) {
      if (!in(i)) {
        if (sql(i) == '(') enclosing ::= i
        else if (sql(i) == ')') enclosing = enclosing.drop(1)
      }
      i += 1
    }
    enclosing.find { op =>
      "(?is)^\\s*(select|from|with|values)\\b".r
        .findFirstIn(sql.substring(op + 1)).isDefined
    } match {
      case Some(outer) =>
        var d = 0; var end = outer
        while (end < sql.length && {
          if (!in(end)) {
            if (sql(end) == '(') d += 1 else if (sql(end) == ')') d -= 1
          }
          d != 0
        }) end += 1
        require(end < sql.length, "COLUMNS: unbalanced parentheses")
        val inner = expandColumns(sql.substring(outer + 1, end), schemaOf)
        return expandColumns(
          sql.substring(0, outer + 1) + inner + sql.substring(end), schemaOf)
      case None => ()
    }
    // argument: a single quoted regex literal
    val argOpen = sql.indexOf('(', found + 7)
    var d2 = 1; var k = argOpen + 1
    while (d2 > 0 && k < sql.length) {
      if (!in(k)) {
        if (sql(k) == '(') d2 += 1 else if (sql(k) == ')') d2 -= 1
      }
      k += 1
    }
    require(d2 == 0, "COLUMNS: unbalanced parentheses")
    val colEnd = k - 1
    val arg = sql.substring(argOpen + 1, colEnd).trim
    val litRe = "(?s)^'((?:[^']|'')*)'$".r
    // COLUMNS(*) = every column (measured); a bare-star arg maps to the
    // match-everything regex so the single code path serves both forms
    val regex = arg match {
      case "*" => ""
      case litRe(r) => r.replace("''", "'")
      case _ => throw new IllegalArgumentException(
        "COLUMNS(...) supports a quoted regex literal or * only — the " +
          "* EXCLUDE / lambda forms are outside the dialect shim")
    }
    // owning SELECT ... FROM of this block (COLUMNS is top-level here)
    def wordAt(j: Int, w: String): Boolean =
      !in(j) && sql.regionMatches(true, j, w, 0, w.length) &&
        (j == 0 || !isIdentChar(sql(j - 1))) &&
        (j + w.length >= sql.length || !isIdentChar(sql(j + w.length)))
    var depth = 0; var selAt = -1; var fromAt = -1
    var j2 = 0
    while (j2 < sql.length && fromAt < 0) {
      if (!in(j2)) {
        val c = sql(j2)
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0) {
          if (wordAt(j2, "select")) selAt = j2
          else if (selAt >= 0 && wordAt(j2, "from")) fromAt = j2
        }
      }
      j2 += 1
    }
    require(selAt >= 0 && selAt < found && fromAt > colEnd,
      "COLUMNS: could not locate the owning SELECT ... FROM block")
    // relation schema: plain identifiers after FROM and each JOIN,
    // concatenated in order (DuckDB expands over the joined relation)
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = fromAt + 4
    var expectTable = true
    var stop = false
    while (p < sql.length && !stop) {
      if (!in(p)) {
        val c = sql(p)
        if (c == '(')
          throw new IllegalArgumentException(
            "COLUMNS over a derived-table FROM is outside the dialect shim — " +
              "name the subquery's columns instead")
        else if (expectTable && isIdentChar(c)) {
          var e = p
          while (e < sql.length && (isIdentChar(sql(e)) || sql(e) == '.')) e += 1
          val name = sql.substring(p, e)
          cols ++= schemaOf(name).getOrElse(throw new IllegalArgumentException(
            s"COLUMNS: unknown relation '$name'"))
          expectTable = false
          p = e - 1
        } else if (!expectTable && wordAt(p, "join")) { expectTable = true; p += 3 }
        // a depth-0 comma is a relation separator (comma cross join) —
        // DuckDB expands COLUMNS over the WHOLE comma join (measured:
        // COLUMNS('a|b') FROM t1, t2 yields both relations' columns),
        // so the next identifier is a table again, not an alias
        else if (!expectTable && c == ',') expectTable = true
        else if (!expectTable &&
            (wordAt(p, "where") || wordAt(p, "group") || wordAt(p, "order") ||
             wordAt(p, "limit") || wordAt(p, "having") || wordAt(p, "window") ||
             wordAt(p, "qualify") || wordAt(p, "union") || wordAt(p, "intersect") ||
             wordAt(p, "except"))) stop = true
      }
      p += 1
    }
    val pat = java.util.regex.Pattern.compile(regex)
    val matched = cols.distinct.filter(c => pat.matcher(c).find())
    if (matched.isEmpty)
      throw new IllegalArgumentException(
        s"""No matching columns found that match regex "$regex"""")
    // the select-list ITEM containing COLUMNS: comma spans at depth 0
    // within [selAt+6, fromAt)
    var itemStart = selAt + "select".length
    var itemEnd = fromAt
    var dItem = 0; var q = selAt + "select".length
    while (q < fromAt) {
      if (!in(q)) {
        val c = sql(q)
        if (c == '(') dItem += 1
        else if (c == ')') dItem -= 1
        else if (c == ',' && dItem == 0) {
          if (q < found) itemStart = q + 1
          else if (q > colEnd && itemEnd == fromAt) itemEnd = q
        }
      }
      q += 1
    }
    val item = sql.substring(itemStart, itemEnd)
    val rel = found - itemStart
    val relEnd = colEnd - itemStart + 1
    if ("(?i)\\bcolumns\\b".r.findAllMatchIn(
        item.substring(relEnd)).exists(m => !inString(item)(relEnd + m.start)))
      throw new IllegalArgumentException(
        "multiple COLUMNS(...) in one select-list item are outside the dialect shim")
    val suffix = item.substring(relEnd)
    if ("(?is)^\\s*(as\\s+)?[A-Za-z_][A-Za-z0-9_]*\\s*$".r.findFirstIn(suffix).isDefined
        && suffix.trim.nonEmpty)
      throw new IllegalArgumentException(
        "COLUMNS(...) with an explicit item alias is outside the dialect shim — " +
          "the replicas are named by the matched columns")
    val prefix = item.substring(0, rel)
    val replicas = matched.map(c => s"$prefix`$c`$suffix AS `$c`").mkString(", ")
    expandColumns(
      sql.substring(0, itemStart) + " " + replicas + " " + sql.substring(itemEnd),
      schemaOf)
  }

  // ---- GROUPS frames -----------------------------------------------------

  /** Constant integer offset EXPRESSIONS the shim folds at rewrite time
    * (round 19): parenthesized +|−|* arithmetic over digit literals, or
    * CAST(<digits> AS <int type>). Division is deliberately excluded —
    * DuckDB's `/` is float division (5/2 = 2.5), so a shim-side integer
    * fold could silently disagree with the engine the SQL targets. */
  private val GroupsIntExpr =
    "(?:\\((?:[\\d\\s+*\\-()])+\\)|cast\\s*\\(\\s*\\d+\\s+as\\s+\\w+\\s*\\))"
  private val GroupsBound =
    s"(?:unbounded\\s+(?:preceding|following)|current\\s+row|(?:\\d+|$GroupsIntExpr)\\s+(?:preceding|following))"
  private val GroupsBetweenRe =
    s"(?is)^groups\\s+between\\s+($GroupsBound)\\s+and\\s+($GroupsBound)".r
  private val GroupsSingleRe = s"(?is)^groups\\s+($GroupsBound)".r
  private val GroupsShapeRe =
    s"(?is)^groups\\s+(between\\s|unbounded\\s+preceding|current\\s+row|(?:\\d+|$GroupsIntExpr)\\s+(preceding|following))".r

  /** Folds the constant-integer offset grammar [[GroupsIntExpr]] admits
    * into the literal Spark's RANGE bound requires. Throws (named, never
    * silent) on anything non-constant, negative, or outside the +|−|*
    * grammar. */
  private def foldIntOffset(expr0: String): Long = {
    val expr = expr0.trim
    if (expr.nonEmpty && expr.forall(_.isDigit)) return expr.toLong
    "(?is)^cast\\s*\\(\\s*(\\d+)\\s+as\\s+\\w+\\s*\\)$".r.findFirstMatchIn(expr) match {
      case Some(m) => return m.group(1).toLong
      case None => ()
    }
    var i = 0
    def ws(): Unit = while (i < expr.length && expr(i).isWhitespace) i += 1
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"GROUPS frame offset `$expr0`: $why — only constant integer " +
        "+|-|* arithmetic and CAST(<int> AS <int type>) fold to the " +
        "literal bound Spark's decomposition needs")
    def atom(): Long = {
      ws()
      if (i < expr.length && expr(i) == '(') {
        i += 1; val v = sum(); ws()
        if (i >= expr.length || expr(i) != ')') fail("unbalanced parentheses")
        i += 1; v
      } else {
        val st = i
        while (i < expr.length && expr(i).isDigit) i += 1
        if (i == st) fail(s"expected an integer at `${expr.substring(st)}`")
        expr.substring(st, i).toLong
      }
    }
    def prod(): Long = {
      var v = atom(); ws()
      while (i < expr.length && expr(i) == '*') { i += 1; v *= atom(); ws() }
      v
    }
    def sum(): Long = {
      var v = prod(); ws()
      while (i < expr.length && (expr(i) == '+' || expr(i) == '-')) {
        val op = expr(i); i += 1
        val r = prod(); v = if (op == '+') v + r else v - r; ws()
      }
      v
    }
    val v = sum(); ws()
    if (i != expr.length) fail(s"trailing `${expr.substring(i)}`")
    if (v < 0) fail(s"folds to $v, but a frame offset must be non-negative")
    v
  }

  /** Locate the first frame-position GROUPS token: outside strings, at
    * depth 0 of a paren group whose content is a window SPEC (the word
    * before the open paren is OVER, or AS for a named-window definition
    * whose content does not start with SELECT/FROM/WITH/VALUES — an AS
    * followed by a query is a CTE/derived table, not a spec), with
    * frame-bound-shaped text following (a mere column named `groups`
    * inside a spec does not match the bound shape). Returns
    * (tokenPos, specOpenParen). */
  private def findGroupsFrame(sql: String): Option[(Int, Int)] = {
    val in = inString(sql)
    var opens = List.empty[Int]
    var i = 0
    while (i < sql.length) {
      if (!in(i)) {
        val c = sql(i)
        if (c == '(') opens ::= i
        else if (c == ')') opens = opens.drop(1)
        else if (opens.nonEmpty && sql.regionMatches(true, i, "groups", 0, 6) &&
            (i == 0 || !isIdentChar(sql(i - 1))) &&
            (i + 6 >= sql.length || !isIdentChar(sql(i + 6))) &&
            GroupsShapeRe.findFirstIn(sql.substring(i)).isDefined) {
          val sp = opens.head
          var w = sp - 1
          while (w >= 0 && sql(w).isWhitespace) w -= 1
          var e = w
          while (e >= 0 && isIdentChar(sql(e))) e -= 1
          val kw = sql.substring(e + 1, w + 1).toLowerCase(java.util.Locale.ROOT)
          val contentIsSpec = "(?is)^\\s*(select|from|with|values)\\b".r
            .findFirstIn(sql.substring(sp + 1)).isEmpty
          if ((kw == "over" || kw == "as") && contentIsSpec) return Some((i, sp))
        }
      }
      i += 1
    }
    None
  }

  /** ANSI GROUPS window frames — forward-compat (round 16) for the
    * reference's pinned `duckdb>=1.3.2` (pyproject.toml:8), which parses
    * them; the LOCAL DuckDB 1.0 oracle does not ("GROUPS mode for window
    * functions is not implemented yet", measured), so these rewrites are
    * spec-pinned against hand-derived ANSI semantics
    * (DuckDbDialectSpec) and carry no driver oracle — documented in
    * COVERAGE.md. Spark has no GROUPS token at all (checked against the
    * 4.1 SqlBaseLexer), so the shim decomposes EXACTLY:
    *
    *  - Bounds drawn only from {UNBOUNDED, CURRENT ROW} (0 PRECEDING/
    *    FOLLOWING included — both engines read it as CURRENT ROW): the
    *    frame is directly expressible, rewritten in place —
    *      UNBOUNDED PRECEDING..CURRENT ROW ≡ RANGE of the same (both
    *        end at the LAST PEER of the current group);
    *      CURRENT ROW..UNBOUNDED FOLLOWING ≡ RANGE of the same;
    *      UNBOUNDED..UNBOUNDED ≡ ROWS UNBOUNDED..UNBOUNDED;
    *      CURRENT ROW..CURRENT ROW ≡ RANGE CURRENT..CURRENT (the peer
    *        group).
    *    Any query shape, named windows included; an EXCLUDE clause is
    *    preserved (the exclusion pass runs after this one, and its
    *    row-space segment arithmetic is frame-type-agnostic — ORDER BY
    *    peers ARE the row's group, so GROUPS exclusion composes).
    *  - Integer offsets (`GROUPS n PRECEDING/FOLLOWING`): n groups
    *    back/forward equals a RANGE of ±n over the DENSE_RANK of the
    *    window's own partition/order — dense ranks are gapless, so
    *    value distance IS group distance, exact for every bound mix.
    *    A rank cannot nest inside a window spec, so the query wraps:
    *      SELECT <list> FROM <rest> [tail]
    *        → SELECT <list'> FROM ( SELECT *, DENSE_RANK() OVER
    *            (<partition> <order>) AS __grpN FROM <rest> ) __groups [tail]
    *    with the spec rewritten to `<partition> ORDER BY __grpN RANGE
    *    BETWEEN a AND b`. WHERE stays inside the wrap (windows see
    *    filtered rows, per evaluation order); ORDER BY/LIMIT tails stay
    *    outside; a bare `*` select list becomes `* EXCEPT (__grpN...)`.
    *
    * Numeric offsets compose with top-level GROUP BY/HAVING (the wrap
    * inverts — [[groupedGroupsWrap]], GROUP BY ordinals resolved to
    * their item expressions), with set-operation branches (each branch
    * re-enters the deep pass independently), with a named WINDOW
    * clause (the clause stays in the wrapped block's outer select),
    * and — round 18 — with GROUP BY and a named WINDOW clause
    * COMBINED (the clause stays outer with its partition/order
    * expressions hoisted into the grouped block as __wp/__wo).
    *
    * Round 19 closed four former bounds: CONSTANT expression offsets
    * ((1+1), CAST(2 AS INT) — folded to the literal by
    * [[foldIntOffset]]; +|−|* only, division excluded because DuckDB's
    * `/` is float division); a qualified star over a SINGLE-relation
    * FROM (`SELECT t.*, … FROM tbl t` — there `t.*` ≡ `*`, so it
    * normalizes into the hoist-star path); `* EXCEPT (cols)` alongside
    * the hoist star (the helper aliases merge into the existing
    * exclusion list); and SELECT DISTINCT + GROUP BY (windows evaluate
    * before DISTINCT, so the keyword moves to the inverted wrap's
    * OUTER select — the outer list preserves the original items, so
    * the distinct key tuple is unchanged).
    *
    * Round 20 closed the multi-relation qualified star THROUGH THE
    * GATEWAY: [[rewriteWithSchema]] installs a relation-schema
    * resolver (the same source as COLUMNS expansion), and the wrap's
    * outer text resolves `t.*` to the relation's columns and
    * dequalifies `t.col` references to bare names — each emitted name
    * verified unique across the joined relations' schemas (shared
    * names throw, named, since the wrap hides the aliases). Direct
    * rewrite() callers (no schema source) keep the bounded error.
    *
    * Bounded (throws, names the limitation — never silently wrong):
    * GROUP BY ALL with numeric offsets (both engines reject GROUP BY
    * ALL + window functions outright — measured, the loud error is
    * parity); grouped select items that are neither plain columns,
    * aliased, nor simple calls with identifier/integer arguments;
    * a qualified star over a MULTI-relation FROM without a schema
    * resolver, or whose bare names would collide post-wrap;
    * non-constant (column-dependent) offset expressions; GROUPS
    * without ORDER BY (rejected by both engines). The single-bound
    * shorthand `GROUPS n PRECEDING` is BETWEEN n PRECEDING AND CURRENT
    * ROW, as everywhere else. */
  private def rewriteGroupsDeep(sql: String): String = {
    findGroupsFrame(sql) match {
      case None => sql
      case Some((_, sp)) =>
        val in = inString(sql)
        var enclosing = List.empty[Int]
        var i = 0
        while (i < sp) {
          if (!in(i)) {
            if (sql(i) == '(') enclosing ::= i
            else if (sql(i) == ')') enclosing = enclosing.drop(1)
          }
          i += 1
        }
        // recurse only into an enclosing paren whose content is a QUERY
        // (a subquery/CTE body) — an expression paren (CAST, a function
        // call) around the OVER spec still belongs to the SAME query
        // block, and recursing into it would strand a numeric-offset
        // hoist without its SELECT...FROM (caught by the --groups fuzz
        // on first run: every CAST-wrapped window failed the wrap)
        val queryBlock = enclosing.find { op =>
          "(?is)^\\s*(select|from|with|values)\\b".r
            .findFirstIn(sql.substring(op + 1)).isDefined
        }
        queryBlock match {
          case None => rewriteGroupsTop(sql) // the spec belongs to the statement
          case Some(outer) =>
            var d = 0; var end = outer
            while (end < sql.length && {
              if (!in(end)) {
                if (sql(end) == '(') d += 1 else if (sql(end) == ')') d -= 1
              }
              d != 0
            }) end += 1
            require(end < sql.length, "GROUPS frame: unbalanced parentheses")
            val inner = rewriteGroupsDeep(sql.substring(outer + 1, end))
            rewriteGroupsDeep(sql.substring(0, outer + 1) + inner + sql.substring(end))
        }
    }
  }

  private def rewriteGroupsTop(sql0: String): String = {
    // set-operation branches are independent window scopes (round 17):
    // split at depth-0 UNION/INTERSECT/EXCEPT and rewrite each branch
    // on its own — a hoist-wrapped branch is still a plain SELECT, so
    // the set op survives, and a statement-level ORDER BY/LIMIT tail
    // (which trails the LAST branch's text) stays outside that branch's
    // wrap, i.e. keeps binding to the whole set operation.
    val cuts = setOpCuts(sql0)
    if (cuts.nonEmpty) {
      val sb = new StringBuilder
      var pos = 0
      // each branch re-enters the DEEP pass, not the top one: a frame
      // nested in a subquery inside a branch must be rewritten (and
      // wrapped) at ITS query block — hoisting it at branch level would
      // reference __grpN inside the subquery while defining the helper
      // outside it (unresolved-column AnalysisException)
      for ((s, e) <- cuts) {
        val seg = rewriteGroupsDeep(sql0.substring(pos, s))
        sb.append(seg)
        // a rewritten branch may have trimmed its boundary whitespace
        if (seg.nonEmpty && !seg.last.isWhitespace) sb.append(' ')
        sb.append(sql0.substring(s, e))
        pos = e
      }
      sb.append(rewriteGroupsDeep(sql0.substring(pos)))
      return sb.toString
    }
    var sql = sql0
    // alias → DENSE_RANK expr, collected across every numeric-offset
    // spec in this block so the wrap happens ONCE
    val hoists = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var guard = 0
    var next = findGroupsFrame(sql)
    while (next.isDefined && guard < 50) {
      guard += 1
      val (gPos, sp) = next.get
      val in = inString(sql)
      val rest = sql.substring(gPos)
      val (aTxt, bTxt, frameLen) = GroupsBetweenRe.findFirstMatchIn(rest) match {
        case Some(m) => (m.group(1), m.group(2), m.matched.length)
        case None =>
          val m = GroupsSingleRe.findFirstMatchIn(rest).getOrElse(
            throw new IllegalArgumentException(
              "GROUPS frame: only integer-literal, constant-expression " +
                "((1+1), CAST(2 AS INT)) and UNBOUNDED/CURRENT ROW bounds are " +
                "supported by the dialect shim (a column-dependent offset " +
                "cannot be hoisted into the dense-rank decomposition)"))
          (m.group(1), "current row", m.matched.length)
      }
      def classify(t0: String): (Int, Long) = { // (kind: -2 UP / 2 UF / 0 CUR / -1 nPREC / 1 nFOLL, n)
        val t = t0.trim.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT)
        if (t == "unbounded preceding") (-2, 0L)
        else if (t == "unbounded following") (2, 0L)
        else if (t == "current row") (0, 0L)
        else {
          // `<offset expr> preceding|following` — the offset is a digit
          // literal or a constant expression the regex admitted; fold it
          // (round 19: (1+1), CAST(2 AS INT) — loud error if non-constant)
          val dir = if (t.endsWith("following")) 1 else -1
          val v = foldIntOffset(
            t.stripSuffix("following").stripSuffix("preceding").trim)
          if (v == 0L) (0, 0L) else (dir, v)
        }
      }
      val a = classify(aTxt); val b = classify(bTxt)
      val prefix = sql.substring(sp + 1, gPos)
      // the spec's own ORDER BY (required for a GROUPS frame by both
      // engines — and the dense-rank hoist is meaningless without it)
      val prefIn = inString(prefix)
      var orderAt = -1; var pd = 0; var pi = 0
      while (pi < prefix.length && orderAt < 0) {
        if (!prefIn(pi)) {
          val c = prefix(pi)
          if (c == '(') pd += 1
          else if (c == ')') pd -= 1
          else if (pd == 0 && prefix.regionMatches(true, pi, "order", 0, 5) &&
              (pi == 0 || !isIdentChar(prefix(pi - 1))) &&
              (pi + 5 >= prefix.length || !isIdentChar(prefix(pi + 5))))
            orderAt = pi
        }
        pi += 1
      }
      if (orderAt < 0)
        throw new IllegalArgumentException(
          "GROUPS frame requires a window ORDER BY (both engines reject it without one)")
      val inline: Option[String] = (a._1, b._1) match {
        case (-2, 0) => Some("RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
        case (0, 2) => Some("RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING")
        case (-2, 2) => Some("ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING")
        case (0, 0) => Some("RANGE BETWEEN CURRENT ROW AND CURRENT ROW")
        case _ => None
      }
      inline match {
        case Some(mapped) =>
          sql = sql.substring(0, gPos) + mapped + sql.substring(gPos + frameLen)
        case None =>
          // numeric offsets → dense-rank hoist. Works for inline OVER
          // specs AND named-window definitions (round 17): the WINDOW
          // clause stays in the wrapped block's OUTER select, where the
          // helper column the wrap synthesizes IS in reach.
          val alias = s"__grp${hoists.size + 1}"
          val partitionClause = prefix.substring(0, orderAt).trim
          val orderClause = prefix.substring(orderAt).trim
          hoists += alias ->
            s"DENSE_RANK() OVER (${(partitionClause + " " + orderClause).trim})"
          def boundTxt(k: (Int, Long)): String = k match {
            case (-2, _) => "UNBOUNDED PRECEDING"
            case (2, _) => "UNBOUNDED FOLLOWING"
            case (0, _) => "CURRENT ROW"
            case (1, n) => s"$n FOLLOWING"
            case (_, n) => s"$n PRECEDING"
          }
          val pb = if (partitionClause.nonEmpty) partitionClause + " " else ""
          val newSpec = s"${pb}ORDER BY $alias RANGE BETWEEN " +
            s"${boundTxt(a)} AND ${boundTxt(b)}"
          sql = sql.substring(0, sp + 1) + newSpec + sql.substring(gPos + frameLen)
      }
      next = findGroupsFrame(sql)
    }
    if (guard >= 50)
      throw new IllegalArgumentException("GROUPS frame rewriting did not converge")
    if (hoists.isEmpty) return sql

    // ---- one wrap for all hoisted dense ranks ----
    val in2 = inString(sql)
    def wordAt(i: Int, w: String): Boolean =
      !in2(i) && sql.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isIdentChar(sql(i - 1))) &&
        (i + w.length >= sql.length || !isIdentChar(sql(i + w.length)))
    var depth = 0; var selAt = -1; var fromAt = -1; var tailAt = -1
    var groupAt = -1; var windowAt = -1
    // a real named-WINDOW clause is `WINDOW <ident> AS (` — a column
    // that happens to be NAMED window (e.g. `WHERE window > 5`) must
    // not truncate the wrapped body at its reference (round-18 advice)
    def isWindowClauseAt(i: Int): Boolean = {
      var k = i + "window".length
      while (k < sql.length && sql(k).isWhitespace) k += 1
      val idStart = k
      while (k < sql.length && isIdentChar(sql(k))) k += 1
      if (k == idStart) return false
      while (k < sql.length && sql(k).isWhitespace) k += 1
      if (!sql.regionMatches(true, k, "as", 0, 2)) return false
      k += 2
      while (k < sql.length && sql(k).isWhitespace) k += 1
      k < sql.length && sql(k) == '('
    }
    var j = 0
    while (j < sql.length) {
      if (!in2(j)) {
        val c = sql(j)
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0) {
          if (wordAt(j, "select")) {
            selAt = j; fromAt = -1; tailAt = -1; groupAt = -1; windowAt = -1
          }
          else if (selAt >= 0 && fromAt < 0 && wordAt(j, "from")) fromAt = j
          else if (fromAt >= 0 && groupAt < 0 &&
              (wordAt(j, "group") || wordAt(j, "having")))
            groupAt = j
          else if (fromAt >= 0 && windowAt < 0 && wordAt(j, "window") &&
              isWindowClauseAt(j))
            windowAt = j
          else if (fromAt >= 0 && tailAt < 0 &&
              (wordAt(j, "order") || wordAt(j, "limit") || wordAt(j, "offset")))
            tailAt = j
        }
      }
      j += 1
    }
    require(selAt >= 0 && fromAt > selAt,
      "GROUPS frame: could not locate the SELECT ... FROM block to wrap")
    if (groupAt >= 0) {
      // grouped block (round 17): the wrap INVERTS — see groupedGroupsWrap
      // (round 18: a named WINDOW clause composes — it stays in the
      // outer select with its partition/order expressions hoisted inner)
      return groupedGroupsWrap(sql, selAt, fromAt, tailAt, windowAt, hoists.toSeq)
    }
    // a named WINDOW clause stays in the OUTER select (its rewritten
    // spec references the hoisted __grpN, defined by the wrap); WHERE
    // stays inside (windows see filtered rows)
    val restEnd =
      if (windowAt >= 0) windowAt else if (tailAt < 0) sql.length else tailAt
    val body = sql.substring(fromAt + "from".length, restEnd).trim
    // Round 19: when the block reads exactly ONE relation (`FROM name
    // [AS] [alias] [WHERE …]` — no join, no comma, no subquery), a
    // qualified star over that relation's alias (or base name) selects
    // the same columns as a bare `*`, so `t.*` normalizes to `*` before
    // the star handling below. Multi-relation FROMs stay bounded out:
    // there the wrap hides the alias and the column subset is unknowable
    // from text.
    val singleRelNames: Set[String] =
      "(?is)^([A-Za-z_][\\w.$]*|\"[^\"]+\"|`[^`]+`)(?:\\s+(?:as\\s+)?(?!where\\b|qualify\\b)([A-Za-z_]\\w*))?\\s*(?:where\\b.*)?$".r
        .findFirstMatchIn(body) match {
        case Some(m) =>
          val base = m.group(1).split('.').last.replaceAll("[\"`]", "")
            .toLowerCase(java.util.Locale.ROOT)
          Option(m.group(2)) match {
            // an explicit alias SHADOWS the base name (both engines)
            case Some(al) => Set(al.toLowerCase(java.util.Locale.ROOT))
            case None => Set(base)
          }
        case None => Set.empty
      }
    val list00 = {
      val raw = sql.substring(selAt + "select".length, fromAt)
      if (singleRelNames.isEmpty) raw
      else {
        // rewrite projection-position `alias.*` → `*` when the alias
        // names the block's sole relation
        val rawIn = inString(raw)
        val sb = new StringBuilder
        var d0 = 0; var k0 = 0; var last = 0
        while (k0 < raw.length) {
          if (!rawIn(k0)) {
            val c = raw(k0)
            if (c == '(') d0 += 1
            else if (c == ')') d0 -= 1
            else if (c == '*' && d0 == 0) {
              var p = k0 - 1
              while (p >= 0 && raw(p).isWhitespace) p -= 1
              if (p >= 0 && raw(p) == '.') {
                var q = p - 1
                while (q >= 0 && raw(q).isWhitespace) q -= 1
                val qe = q
                while (q >= 0 && isIdentChar(raw(q))) q -= 1
                val qual = raw.substring(q + 1, qe + 1)
                var b = q
                while (b >= 0 && raw(b).isWhitespace) b -= 1
                val projectionPos = b < 0 || raw(b) == ','
                if (projectionPos && qual.nonEmpty &&
                    singleRelNames(qual.toLowerCase(java.util.Locale.ROOT))) {
                  sb.append(raw.substring(last, q + 1)).append('*')
                  last = k0 + 1
                }
              }
            }
          }
          k0 += 1
        }
        sb.append(raw.substring(last)).toString
      }
    }
    // Round 20: with the gateway's schema resolver installed, a
    // REMAINING projection-position qualified star (multi-relation
    // FROM) expands to its relation's column names, and qualified
    // column references in the outer text (select list + statement
    // tail — both evaluate OUTSIDE the wrap, where the relation
    // aliases are hidden) dequalify to bare names; both steps verify
    // each bare name is unique across the joined relations. A direct
    // rewrite() caller has no resolver and keeps the named bounded
    // error below.
    val list0 = resolveOuterQualifiers(list00, body)
    // star handling: a projection star must not leak the helper columns
    val listIn = inString(list0)
    var ld = 0; var li = 0; var starAt = -1
    while (li < list0.length) {
      if (!listIn(li)) {
        val c = list0(li)
        if (c == '(') ld += 1
        else if (c == ')') ld -= 1
        else if (c == '*' && ld == 0) {
          var p = li - 1
          while (p >= 0 && list0(p).isWhitespace) p -= 1
          if (p < 0 || list0(p) == ',') starAt = li // projection star
          else if (list0(p) == '.')
            throw new IllegalArgumentException(
              "GROUPS frame with integer offsets and a qualified star (t.*) " +
                "is only supported when the qualifier names the block's sole " +
                "FROM relation (there t.* ≡ *); over a multi-relation FROM " +
                "or a shadowed base name, run through the SQL gateway (which " +
                "resolves relation schemas, round 20) or name the columns")
          else {
            // `SELECT DISTINCT *` / `SELECT ALL *`: still the projection
            // star (round 19 — without this the helper column leaked
            // through the un-rewritten star into the DISTINCT output)
            var q = p
            while (q >= 0 && isIdentChar(list0(q))) q -= 1
            val w = list0.substring(q + 1, p + 1)
              .toLowerCase(java.util.Locale.ROOT)
            if ((w == "distinct" || w == "all") &&
                list0.substring(0, q + 1).trim.isEmpty)
              starAt = li
          }
        }
      }
      li += 1
    }
    val aliases = hoists.map(_._1).mkString(", ")
    val list =
      if (starAt < 0) list0
      else {
        val afterStar = list0.substring(starAt + 1)
        // EXCLUDE is matched too: the call-shaped EXCLUDE→EXCEPT rename
        // runs AFTER this pass, so DuckDB spelling still reads EXCLUDE here
        "(?is)^\\s*(?:except|exclude)\\s*\\(".r.findFirstMatchIn(afterStar) match {
          case Some(m) =>
            // round 19: `* EXCEPT (cols)` composes — merge the helper
            // aliases into the existing exclusion list instead of
            // double-nesting a second EXCEPT
            val absOpen = starAt + 1 + m.matched.length - 1
            var d2 = 1; var k2 = absOpen + 1
            while (k2 < list0.length && d2 != 0) {
              if (!listIn(k2)) {
                if (list0(k2) == '(') d2 += 1
                else if (list0(k2) == ')') d2 -= 1
              }
              k2 += 1
            }
            require(d2 == 0, "GROUPS frame: unbalanced * EXCEPT parentheses")
            list0.substring(0, k2 - 1) + s", $aliases" + list0.substring(k2 - 1)
          case None =>
            list0.substring(0, starAt) + s"* EXCEPT ($aliases)" + afterStar
        }
      }
    val tail = if (restEnd >= sql.length) ""
      else " " + resolveOuterQualifiers(sql.substring(restEnd).trim, body)
    val synth = hoists.map { case (al, ex) => s"$ex AS $al" }.mkString(", ")
    sql.substring(0, selAt) + "SELECT " + list.trim +
      s" FROM ( SELECT *, $synth FROM $body ) __groups" + tail
  }

  /** Relations of a FROM body (`a [AS] x JOIN b y ON … [, c z]`) as
    * (aliasLower, tableNameText) in order — identifier relations only;
    * a derived table throws (named — the caller's qualified-star
    * expansion cannot know a subquery's columns from text). The body
    * may carry a WHERE/QUALIFY tail; ON/USING expressions are skipped
    * (only the word JOIN or a depth-0 comma re-arms table
    * expectation). */
  private def groupsFromRelations(body: String): Seq[(String, String)] = {
    val in = inString(body)
    def wordAt(j: Int, w: String): Boolean =
      !in(j) && body.regionMatches(true, j, w, 0, w.length) &&
        (j == 0 || !isIdentChar(body(j - 1))) &&
        (j + w.length >= body.length || !isIdentChar(body(j + w.length)))
    val aliasStop = Set("on", "using", "join", "inner", "left", "right",
      "full", "cross", "natural", "asof", "anti", "semi", "lateral",
      "where", "qualify", "group", "order", "limit", "offset", "union",
      "intersect", "except", "window", "having")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var expectTable = true
    var depth = 0
    var i = 0; var stop = false
    while (i < body.length && !stop) {
      if (!in(i)) {
        val c = body(i)
        if (expectTable && c == '(')
          throw new IllegalArgumentException(
            "GROUPS frame: qualified-star/reference resolution over a " +
              "derived-table FROM is outside the dialect shim — name the " +
              "columns")
        else if (expectTable && isIdentChar(c)) {
          var e = i
          while (e < body.length && (isIdentChar(body(e)) || body(e) == '.')) e += 1
          val table = body.substring(i, e)
          var alias = table.split('.').last.toLowerCase(java.util.Locale.ROOT)
          var k = e
          while (k < body.length && body(k).isWhitespace) k += 1
          if (k < body.length && isIdentChar(body(k)) && !in(k)) {
            var e2 = k
            while (e2 < body.length && isIdentChar(body(e2))) e2 += 1
            val w = body.substring(k, e2).toLowerCase(java.util.Locale.ROOT)
            if (w == "as") {
              var k2 = e2
              while (k2 < body.length && body(k2).isWhitespace) k2 += 1
              var e3 = k2
              while (e3 < body.length && isIdentChar(body(e3))) e3 += 1
              require(e3 > k2, "GROUPS frame: dangling AS in FROM")
              alias = body.substring(k2, e3).toLowerCase(java.util.Locale.ROOT)
              e = e3
            } else if (!aliasStop(w)) { alias = w; e = e2 }
          }
          out += ((alias, table))
          expectTable = false
          i = e - 1
        } else if (!expectTable) {
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          else if (depth == 0 && c == ',') expectTable = true
          else if (depth == 0 && wordAt(i, "join")) { expectTable = true; i += 3 }
          else if (depth == 0 && (wordAt(i, "where") || wordAt(i, "qualify")))
            stop = true
        }
      }
      i += 1
    }
    out.toSeq
  }

  /** Round 20: schema-resolvable handling of qualified names in the
    * GROUPS wrap's OUTER text (select list / statement tail), where the
    * FROM aliases are hidden behind the `__groups` subquery. With the
    * gateway resolver installed ([[rewriteWithSchema]]):
    *  - a projection-position `alias.*` expands to the relation's
    *    column names (bare, backticked);
    *  - any `alias.col` reference dequalifies to bare `col`;
    * and in BOTH cases every emitted bare name is verified unique
    * across the OTHER joined relations' schemas (the inner `SELECT *`
    * exposes all relations' columns, so a shared name would be
    * ambiguous — thrown, named, never silently wrong). Unknown
    * qualifiers pass through untouched (struct fields, map access —
    * the engine resolves or rejects them itself). Without a resolver
    * the text is returned unchanged, so the existing bounded error
    * fires for multi-relation stars exactly as before. */
  private def resolveOuterQualifiers(text: String, body: String): String = {
    val resolver = schemaResolver.get()
    if (resolver == null || !text.contains(".")) return text
    // an unparseable FROM (derived table) yields NO relations: every
    // qualified candidate then passes through untouched — exactly the
    // pre-round-20 behavior (struct-field access over a derived FROM
    // keeps working; a multi-relation star still hits the bounded
    // error downstream)
    lazy val rels: Seq[(String, String)] =
      scala.util.Try(groupsFromRelations(body)).getOrElse(Seq.empty)
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    def colsOf(alias: String): Option[Seq[String]] =
      rels.find(_._1 == alias).flatMap { case (_, tab) => resolver(tab) }
    def assertUnique(alias: String, col: String): Unit =
      rels.filter(_._1 != alias).foreach { case (oal, otab) =>
        resolver(otab) match {
          case Some(ocols) if ocols.exists(c => lc(c) == lc(col)) =>
            throw new IllegalArgumentException(
              s"GROUPS frame: column `$col` of '$alias' also exists in " +
                s"'$oal' — the wrapped subquery hides the relation " +
                "aliases, so the shared name would be ambiguous; project " +
                "and alias it before the window")
          case Some(_) => ()
          case None => throw new IllegalArgumentException(
            s"GROUPS frame: cannot verify `$alias.$col` is unambiguous — " +
              s"relation '$otab' has no resolvable schema")
        }
      }
    val in = inString(text)
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text(i)
      var consumed = false
      if (!in(i) && isIdentChar(c) && (i == 0 ||
          (!isIdentChar(text(i - 1)) && text(i - 1) != '.'))) {
        var e = i
        while (e < text.length && isIdentChar(text(e))) e += 1
        var k = e
        while (k < text.length && text(k).isWhitespace) k += 1
        if (k < text.length && text(k) == '.') {
          k += 1
          while (k < text.length && text(k).isWhitespace) k += 1
          val qual = lc(text.substring(i, e))
          if (rels.exists(_._1 == qual)) {
            if (k < text.length && text(k) == '*') {
              // `alias.*` — expand to the relation's columns
              val cols = colsOf(qual).getOrElse(
                throw new IllegalArgumentException(
                  s"GROUPS frame: relation of qualified star " +
                    s"`${text.substring(i, e)}.*` has no resolvable schema"))
              cols.foreach(assertUnique(qual, _))
              sb.append(cols.map(cc => s"`$cc`").mkString(", "))
              i = k + 1
              consumed = true
            } else if (k < text.length && isIdentChar(text(k))) {
              var e2 = k
              while (e2 < text.length && isIdentChar(text(e2))) e2 += 1
              // 3-part names (db.tbl.col) pass through untouched
              val afterIsDot = {
                var k2 = e2
                while (k2 < text.length && text(k2).isWhitespace) k2 += 1
                k2 < text.length && text(k2) == '.'
              }
              val col = text.substring(k, e2)
              val known = colsOf(qual).exists(_.exists(cc => lc(cc) == lc(col)))
              if (!afterIsDot && known) {
                assertUnique(qual, col)
                sb.append(s"`$col`")
                i = e2
                consumed = true
              }
            }
          }
        }
      }
      if (!consumed) { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Depth-0 set-operation keyword spans (UNION/INTERSECT/EXCEPT — a
    * star-EXCEPT projection is skipped), outside strings. */
  private def setOpCuts(sql: String): List[(Int, Int)] = {
    val in = inString(sql)
    def wordAt(i: Int, w: String): Boolean =
      !in(i) && sql.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isIdentChar(sql(i - 1))) &&
        (i + w.length >= sql.length || !isIdentChar(sql(i + w.length)))
    val out = List.newBuilder[(Int, Int)]
    var depth = 0; var i = 0
    while (i < sql.length) {
      if (!in(i)) {
        val c = sql(i)
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0) {
          if (wordAt(i, "union")) out += ((i, i + 5))
          else if (wordAt(i, "intersect")) out += ((i, i + 9))
          else if (wordAt(i, "except") && {
            var p = i - 1
            while (p >= 0 && sql(p).isWhitespace) p -= 1
            p < 0 || sql(p) != '*'
          }) out += ((i, i + 6))
        }
      }
      i += 1
    }
    out.result()
  }

  /** Numeric-offset GROUPS frames over a grouped query block (round
    * 17). Windows evaluate AFTER grouping, so the dense-rank helper
    * must rank the GROUPED rows — the wrap therefore INVERTS relative
    * to the plain case: the grouped query becomes the inner subquery
    * (keeping FROM/WHERE/GROUP BY/HAVING and every non-window select
    * item verbatim, so aggregates compute where their inputs live), and
    * the GROUPS windows evaluate in the OUTER block over synthesized
    * columns:
    *   - each non-literal window ARGUMENT expression (an aggregate of
    *     the grouped block, e.g. the inner SUM of SUM(SUM(x)) OVER …)
    *     moves inner as `__waK`; the outer call reads the alias.
    *     `COUNT(*)` needs nothing — it counts the grouped rows.
    *   - each spec PARTITION BY expression moves inner as `__wpK`.
    *   - the DENSE_RANK hoists (original partition/order text — grouped
    *     expressions, valid inner) compute inner as `__grpN`; windows
    *     in a grouped select list evaluate after the aggregation.
    *   - a named WINDOW clause (round 18) stays in the OUTER block:
    *     every defined spec is rewritten for outer evaluation (GROUPS
    *     specs keep ORDER BY __grpN; plain specs hoist their partition
    *     AND order expressions as __wp/__wo, keeping direction tokens
    *     and frame text), and every item referencing a defined name
    *     keeps the reference with its call arguments hoisted as __waK.
    * Non-window items pass through by OUTPUT NAME: a trailing
    * `AS alias`, a plain (qualified) identifier, or a simple call whose
    * auto-name both engines derive identically ([[derivedCallName]]);
    * anything else is bounded out loudly (alias it). GROUP BY ordinals
    * are resolved to their item expressions before the wrap (positions
    * shift through it); GROUP BY ALL is bounded out — both engines
    * reject ALL + window functions (measured round 18). ORDER BY
    * ordinals in the statement tail are safe — the outer list preserves
    * the original arity and order. A wrapper expression AROUND the
    * window call that references other grouped values stays in the
    * outer text: it resolves against the inner aliases when they exist
    * and fails ANALYSIS (loudly, never silently) when they don't. */
  private def groupedGroupsWrap(sql: String, selAt: Int, fromAt: Int,
      tailAt: Int, windowAt: Int, hoists: Seq[(String, String)]): String = {
    // SELECT DISTINCT composes (round 19, closing the r16 bound):
    // windows evaluate BEFORE DISTINCT in both engines, so the keyword
    // moves to the OUTER select of the inverted wrap — the outer list
    // preserves the original items exactly (arity, order, names), so
    // the distinct key tuple is unchanged; the INNER grouped block must
    // NOT carry it (deduping grouped rows before the windows see them
    // would change frame contents).
    val rawList = sql.substring(selAt + "select".length, fromAt)
    val distinctHead = "(?is)^\\s*distinct\\b".r.findFirstIn(rawList).isDefined
    val list0 =
      if (distinctHead) rawList.replaceFirst("(?is)^\\s*distinct\\b", " ")
      else rawList
    val wrapEnd =
      if (windowAt >= 0) windowAt else if (tailAt < 0) sql.length else tailAt
    val fromText = sql.substring(fromAt, wrapEnd).trim
    val tail = if (tailAt < 0) "" else " " + sql.substring(tailAt).trim
    // GROUP BY ordinals / ALL shift through the wrap — bound out
    val ftIn = inString(fromText)
    var gb = -1; var d0 = 0; var fi = 0
    while (fi < fromText.length && gb < 0) {
      if (!ftIn(fi)) {
        val c = fromText(fi)
        if (c == '(') d0 += 1 else if (c == ')') d0 -= 1
        else if (d0 == 0 && fromText.regionMatches(true, fi, "group", 0, 5) &&
            (fi == 0 || !isIdentChar(fromText(fi - 1))) &&
            (fi + 5 >= fromText.length || !isIdentChar(fromText(fi + 5))))
          gb = fi
      }
      fi += 1
    }
    var fromTextR = fromText
    if (gb >= 0) {
      val gbTail = fromText.substring(gb)
      val gbList = "(?is)^group\\s+by\\s+(.*)$".r.findFirstMatchIn(gbTail)
        .map(_.group(1)).getOrElse("")
      val gbEnd = "(?is)\\bhaving\\b".r.findFirstMatchIn(gbList)
        .map(_.start).getOrElse(gbList.length)
      val keys = splitTopLevel(gbList.substring(0, gbEnd), ',').map(_.trim)
      // GROUP BY ALL + window functions: BOTH engines reject the
      // combination outright (measured round 18 — DuckDB 1.0 "Cannot
      // mix aggregates with non-aggregated columns" / "Cannot group on
      // a window clause"; Spark 4.1 UNSUPPORTED_EXPR_FOR_OPERATOR on
      // the inferred window key) — so the shim's loud error IS parity
      if (keys.exists(_.equalsIgnoreCase("all")))
        throw new IllegalArgumentException(
          "GROUPS frame with integer offsets over GROUP BY ALL: both " +
            "engines reject GROUP BY ALL combined with window functions " +
            "(measured: DuckDB 'Cannot mix aggregates with non-aggregated " +
            "columns', Spark UNSUPPORTED_EXPR_FOR_OPERATOR) — name the " +
            "grouping keys")
      // GROUP BY ordinals (round 18): resolve each ordinal to the
      // alias-stripped text of the referenced select item BEFORE the
      // wrap — positions shift through the hoist (window items leave
      // the inner list; __wa/__wp extracts join it), so the ordinal
      // must be pinned to its expression here. An ordinal naming a
      // window item resolves to the window text and fails analysis
      // loudly (it was never a legal grouping key).
      if (keys.exists(_.matches("\\d+"))) {
        val items = splitTopLevel(list0, ',')
        val resolved = keys.map { k =>
          if (!k.matches("\\d+")) k
          else {
            val i = k.toInt
            if (i < 1 || i > items.length)
              throw new IllegalArgumentException(
                s"GROUP BY ordinal $i out of range (${items.length} select items)")
            stripTrailingAlias(items(i - 1)).trim
          }
        }
        val gbHead = gbTail.substring(0, gbTail.length - gbList.length)
        val having = gbList.substring(gbEnd).trim
        fromTextR = fromText.substring(0, gb) + gbHead +
          resolved.mkString(", ") + (if (having.nonEmpty) " " + having else "")
      }
    }
    val innerItems = scala.collection.mutable.ArrayBuffer.empty[String]
    val outerItems = scala.collection.mutable.ArrayBuffer.empty[String]
    var waN = 0; var wpN = 0; var woN = 0
    val literalRe = "(?s)^\\s*(\\d+(\\.\\d+)?|'(?:[^']|'')*'|true|false|null)\\s*$"
    // depth-0, out-of-string position of keyword `w` in `s0`, else -1
    def kwAt(s0: String, w: String): Int = {
      val in0 = inString(s0)
      var at = -1; var d = 0; var i = 0
      while (i < s0.length && at < 0) {
        if (!in0(i)) {
          val c = s0(i)
          if (c == '(') d += 1
          else if (c == ')') d -= 1
          else if (d == 0 && s0.regionMatches(true, i, w, 0, w.length) &&
              (i == 0 || !isIdentChar(s0(i - 1))) &&
              (i + w.length >= s0.length || !isIdentChar(s0(i + w.length))))
            at = i
        }
        i += 1
      }
      at
    }
    // window-call argument list → inner __wa aliases (shared by the
    // inline-OVER and named-OVER paths)
    def rewriteArgs(argsTxt: String): String =
      if (argsTxt.trim == "*") argsTxt
      else splitTopLevel(argsTxt, ',').map { a =>
        if (a.trim.isEmpty || a.trim.toLowerCase.matches(literalRe)) a
        else {
          waN += 1
          innerItems += s"${a.trim} AS __wa$waN"
          s"__wa$waN"
        }
      }.mkString(", ")
    // a window SPEC evaluated in the OUTER (post-wrap) block: partition
    // and order EXPRESSIONS move inner as __wp/__wo aliases (grouped
    // expressions are only computable inside the grouped block); an
    // already-hoisted GROUPS spec keeps its ORDER BY __grpN + frame
    // verbatim (the rank is synthesized inner); a frame over a plain
    // order expr keeps its text (the alias carries the same values)
    def rewriteSpecForOuter(spec: String): String = {
      val obAt = kwAt(spec, "order")
      val partTxt = (if (obAt < 0) spec else spec.substring(0, obAt)).trim
      val partOut =
        if (partTxt.isEmpty) ""
        else {
          val exprs = "(?is)^partition\\s+by\\s+(.*)$".r
            .findFirstMatchIn(partTxt).map(_.group(1)).getOrElse(
              throw new IllegalArgumentException(
                s"GROUPS hoist: unexpected spec prefix: $partTxt"))
          val aliased = splitTopLevel(exprs, ',').map { p =>
            wpN += 1
            innerItems += s"${p.trim} AS __wp$wpN"
            s"__wp$wpN"
          }.mkString(", ")
          s"PARTITION BY $aliased "
        }
      if (obAt < 0) return partOut.trim
      val obTail = spec.substring(obAt)
      if ("(?i)__grp\\d".r.findFirstIn(obTail).isDefined)
        return (partOut + obTail).trim
      // plain spec: ORDER BY e1 [dir], e2 [dir] [frame]
      val obBody = "(?is)^order\\s+by\\s+(.*)$".r
        .findFirstMatchIn(obTail).map(_.group(1)).getOrElse(
          throw new IllegalArgumentException(
            s"GROUPS hoist: malformed window ORDER BY: $obTail"))
      val frameAt = Seq("rows", "range", "groups").map(kwAt(obBody, _))
        .filter(_ >= 0).sorted.headOption.getOrElse(obBody.length)
      val frame = obBody.substring(frameAt).trim
      val orderItems = splitTopLevel(obBody.substring(0, frameAt), ',').map { o =>
        // split a trailing direction off the expression
        var e = o.trim; var dir = ""
        "(?is)\\s+nulls\\s+(first|last)\\s*$".r.findFirstMatchIn(e).foreach { m =>
          dir = e.substring(m.start).trim; e = e.substring(0, m.start)
        }
        "(?is)\\s+(asc|desc)\\s*$".r.findFirstMatchIn(e).foreach { m =>
          dir = (e.substring(m.start).trim + " " + dir).trim
          e = e.substring(0, m.start)
        }
        woN += 1
        innerItems += s"${e.trim} AS __wo$woN"
        if (dir.isEmpty) s"__wo$woN" else s"__wo$woN $dir"
      }
      (partOut + "ORDER BY " + orderItems.mkString(", ") +
        (if (frame.isEmpty) "" else " " + frame)).trim
    }
    // named WINDOW clause (round 18): the clause stays in the OUTER
    // select — every defined spec is rewritten for outer evaluation,
    // and every select item referencing a defined name has its call
    // arguments hoisted inner like an inline item
    var windowOuter = ""
    var winNames = Set.empty[String]
    if (windowAt >= 0) {
      val winEnd = if (tailAt < 0) sql.length else tailAt
      val defsTxt = "(?is)^window\\s+(.*)$".r
        .findFirstMatchIn(sql.substring(windowAt, winEnd).trim).map(_.group(1))
        .getOrElse(throw new IllegalArgumentException(
          "GROUPS frame over GROUP BY: malformed WINDOW clause"))
      val defRe = "(?is)^\\s*([A-Za-z_][A-Za-z0-9_]*)\\s+as\\s*\\((.*)\\)\\s*$".r
      val defs = splitTopLevel(defsTxt, ',').map {
        case defRe(nm, spec) => nm -> spec
        case other => throw new IllegalArgumentException(
          s"GROUPS frame over GROUP BY: unsupported WINDOW definition: $other")
      }
      winNames = defs.map(_._1.toLowerCase(java.util.Locale.ROOT)).toSet
      windowOuter = " WINDOW " + defs.map { case (nm, spec) =>
        s"$nm AS (${rewriteSpecForOuter(spec)})"
      }.mkString(", ")
    }
    // does this item reference a defined window name (`OVER <name>`)?
    def namedRefAt(s0: String, from: Int): Int = {
      val in0 = inString(s0)
      var i = from
      while (i < s0.length) {
        if (!in0(i) && s0.regionMatches(true, i, "over", 0, 4) &&
            (i == 0 || !isIdentChar(s0(i - 1))) &&
            (i + 4 >= s0.length || !isIdentChar(s0(i + 4)))) {
          var k = i + 4
          while (k < s0.length && s0(k).isWhitespace) k += 1
          if (k < s0.length && s0(k) != '(') {
            val st = k
            while (k < s0.length && isIdentChar(s0(k))) k += 1
            if (winNames.contains(
                s0.substring(st, k).toLowerCase(java.util.Locale.ROOT)))
              return i
          }
        }
        i += 1
      }
      -1
    }
    for (item <- splitTopLevel(list0, ',')) {
      if (!"(?i)__grp\\d".r.findFirstIn(item).isDefined &&
          namedRefAt(item, 0) < 0) {
        // passthrough: compute inner, project by output name
        innerItems += item.trim
        val asRe =
          "(?is)^.*\\S\\s+as\\s+([A-Za-z_][A-Za-z0-9_]*|`[^`]+`)\\s*$".r
        val identRe =
          "(?s)^\\s*([A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z_][A-Za-z0-9_]*)*)\\s*$".r
        item match {
          case asRe(alias) => outerItems += alias
          case identRe(path) => outerItems += path.split('.').last
          case _ => derivedCallName(item) match {
            // unaliased simple call (round 18): the inner block keeps
            // the item verbatim, so Spark auto-names it with the same
            // pretty-print DuckDB generates (measured on both engines:
            // sum(x) → `sum(x)`, substr(s,1,2) → `substr(s, 1, 2)`);
            // the outer projects that derived name. A shape the rule
            // cannot derive stays bounded out; a wrong derivation fails
            // ANALYSIS as an unresolved column — loud, never silent.
            case Some(n) => outerItems += s"`$n`"
            case None => throw new IllegalArgumentException(
              "GROUPS frame with integer offsets over GROUP BY requires every " +
                "other select item to be a plain column, a simple call " +
                "(identifier/integer arguments), or carry an explicit " +
                "alias (the item must pass through the hoist wrap by name): " +
                item.trim)
          }
        }
      } else {
        // the window CALL immediately before position `ovPos`: fn(args)
        // → args hoisted inner; returns (callStart, rebuilt call text)
        def rewriteCallBefore(cur: String, ovPos: Int,
            curIn: Int => Boolean): (Int, String) = {
          var ce = ovPos - 1
          while (ce >= 0 && cur(ce).isWhitespace) ce -= 1
          require(ce >= 0 && cur(ce) == ')',
            "GROUPS frame over GROUP BY: expected a window CALL before OVER")
          var d2 = 1; var cs = ce - 1
          while (cs >= 0 && d2 > 0) {
            if (!curIn(cs)) {
              if (cur(cs) == ')') d2 += 1 else if (cur(cs) == '(') d2 -= 1
            }
            if (d2 > 0) cs -= 1
          }
          var fs = cs - 1
          while (fs >= 0 && isIdentChar(cur(fs))) fs -= 1
          val fnName = cur.substring(fs + 1, cs)
          require(fnName.nonEmpty,
            "GROUPS frame over GROUP BY: expected a window CALL before OVER")
          (fs + 1, fnName + "(" + rewriteArgs(cur.substring(cs + 1, ce)) + ")")
        }
        // pre-pass: calls bound to DEFINED window names (`fn(...) OVER w`)
        // keep their reference — the rewritten clause sits in the outer
        // select — but their argument aggregates hoist inner
        val sbN = new StringBuilder
        var curN = item
        var guardN = 0
        while (namedRefAt(curN, 0) >= 0 && guardN < 20) {
          guardN += 1
          val ovPos = namedRefAt(curN, 0)
          val curIn = inString(curN)
          var k = ovPos + 4
          while (k < curN.length && curN(k).isWhitespace) k += 1
          while (k < curN.length && isIdentChar(curN(k))) k += 1 // past the name
          val (callStart, callTxt) = rewriteCallBefore(curN, ovPos, curIn)
          // end of the original call text (the ')' just before OVER)
          val afterCall = {
            var ce = ovPos - 1
            while (ce >= 0 && curN(ce).isWhitespace) ce -= 1
            ce + 1
          }
          sbN.append(curN.substring(0, callStart)).append(callTxt)
            .append(curN.substring(afterCall, k)) // " OVER name" verbatim
          curN = curN.substring(k)
        }
        require(guardN < 20, "GROUPS grouped wrap (named) did not converge")
        sbN.append(curN)
        // inline pass: rewrite each hoisted `OVER ( … __grpN … )` call
        val sb = new StringBuilder
        var cur = sbN.toString
        var guard = 0
        while ("(?i)__grp\\d".r.findFirstIn(cur).isDefined && guard < 20) {
          guard += 1
          val curIn = inString(cur)
          // the OVER ( … __grpN … ) span
          var ov = -1; var oi = 0
          while (oi < cur.length && ov < 0) {
            if (!curIn(oi) && cur.regionMatches(true, oi, "over", 0, 4) &&
                (oi == 0 || !isIdentChar(cur(oi - 1))) &&
                (oi + 4 >= cur.length || !isIdentChar(cur(oi + 4)))) {
              var k = oi + 4
              while (k < cur.length && cur(k).isWhitespace) k += 1
              if (k < cur.length && cur(k) == '(') {
                var d = 1; var e = k + 1
                while (d > 0 && e < cur.length) {
                  if (!curIn(e)) {
                    if (cur(e) == '(') d += 1 else if (cur(e) == ')') d -= 1
                  }
                  e += 1
                }
                val spec = cur.substring(k + 1, e - 1)
                if ("(?i)__grp\\d".r.findFirstIn(spec).isDefined) ov = oi
                else oi = e // skip a non-GROUPS window in the same item
              }
            }
            if (ov < 0) oi += 1
          }
          require(ov >= 0, s"GROUPS hoist: lost the rewritten spec in: $item")
          val (callStart, callTxt) = rewriteCallBefore(cur, ov, curIn)
          // spec partition exprs → inner aliases; ORDER BY __grpN stays
          var specK = ov + 4
          while (specK < cur.length && cur(specK).isWhitespace) specK += 1
          val specStart = specK + 1
          var d3 = 1; var specEnd = specStart
          while (d3 > 0 && specEnd < cur.length) {
            if (!curIn(specEnd)) {
              if (cur(specEnd) == '(') d3 += 1
              else if (cur(specEnd) == ')') d3 -= 1
            }
            specEnd += 1
          }
          val spec = cur.substring(specStart, specEnd - 1)
          if (kwAt(spec, "order") < 0)
            throw new IllegalArgumentException(
              s"GROUPS hoist: rewritten spec lost its ORDER BY: $spec")
          sb.append(cur.substring(0, callStart)).append(callTxt)
            .append(" OVER (").append(rewriteSpecForOuter(spec)).append(')')
          cur = cur.substring(specEnd)
        }
        require(guard < 20, "GROUPS grouped wrap did not converge")
        sb.append(cur)
        outerItems += sb.toString.trim
      }
    }
    val synth = hoists.map { case (al, ex) => s"$ex AS $al" }
    val innerAll = (innerItems ++ synth).mkString(", ")
    sql.substring(0, selAt) + "SELECT " +
      (if (distinctHead) "DISTINCT " else "") + outerItems.mkString(", ") +
      s" FROM ( SELECT $innerAll $fromTextR ) __groups" + windowOuter + tail
  }

  /** The trailing `AS alias` stripped from a select item (for GROUP BY
    * ordinal resolution — the ordinal groups by the item's EXPRESSION). */
  private def stripTrailingAlias(item: String): String =
    "(?is)^(.*\\S)\\s+as\\s+([A-Za-z_][A-Za-z0-9_]*|`[^`]+`)\\s*$".r
      .findFirstMatchIn(item).map(_.group(1)).getOrElse(item)

  /** The auto-generated column name of an unaliased select item, iff it
    * is derivable EXACTLY: a single call `fn(a, b, ...)` whose top-level
    * arguments are all plain (possibly qualified) identifiers or integer
    * literals → lowercase fn, args joined with ", ", qualified idents
    * reduced to their last segment. Measured round 18 to be the
    * identical convention on both engines (Spark toPrettySQL, DuckDB):
    * `SUM(x)` → `sum(x)`, `substr(s,1,2)` → `substr(s, 1, 2)`.
    * Excluded (returns None → the caller's loud bound): `count(*)`
    * (Spark names it count(1), DuckDB count_star()), DISTINCT/nested/
    * string-literal arguments, anything trailing the call (operators,
    * OVER). */
  private def derivedCallName(item: String): Option[String] = {
    "(?s)^\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\((.*)\\)\\s*$".r
      .findFirstMatchIn(item).flatMap { m =>
        val argsTxt = m.group(2)
        // greedy-to-last-')' capture: the parens inside must balance and
        // never go negative, or the item is NOT one single call
        var d = 0; var ok = true
        argsTxt.foreach { c =>
          if (c == '(') d += 1
          else if (c == ')') { d -= 1; if (d < 0) ok = false }
        }
        if (!ok || d != 0) None
        else if (argsTxt.trim.isEmpty)
          Some(m.group(1).toLowerCase(java.util.Locale.ROOT) + "()")
        else {
          val args = splitTopLevel(argsTxt, ',').map(_.trim)
          val identPat = "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*"
          if (args.forall(a => a.matches(identPat) || a.matches("\\d+")))
            Some(m.group(1).toLowerCase(java.util.Locale.ROOT) + "(" +
              args.map(a =>
                if (a.matches("\\d+")) a else a.split('.').last).mkString(", ") + ")")
          else None
        }
      }
  }

  /** DuckDB window frames accept an ANSI frame-exclusion clause
    * (`ROWS BETWEEN ... EXCLUDE CURRENT ROW`); Spark has none. For the
    * decomposable aggregates the rewrite subtracts the current row's
    * contribution from the un-excluded frame (which this pass verified
    * CONTAINS the current row — otherwise the exclusion is a no-op and
    * is simply dropped, as is `EXCLUDE NO OTHERS`):
    *
    *   COUNT(*)  → COUNT(*) OVER spec − 1
    *   COUNT(x)  → COUNT(x) OVER spec − (x IS NOT NULL)
    *   SUM(x)    → SUM(x) OVER spec − COALESCE(x, 0), NULL when no
    *               other non-null row remains (SUM over ∅ is NULL)
    *   AVG(x)    → the SUM/COUNT pair above, divided, NULL-guarded
    *
    * EXCLUDE GROUP/TIES decompose exactly for COUNT/SUM/AVG over BOTH
    * frame types (round 15 closed the ROWS and non-containing-RANGE
    * islands): DuckDB evaluates every exclusion as the row-space
    * segments [frameStart, exclStart−1] ∪ [exclEnd+1, frameEnd], and
    * each segment is expressible with static prefix windows — see the
    * three-case derivation at the GROUP/TIES branch below.
    *
    * Bounded (throws, never silently wrong): DISTINCT arguments,
    * non-decomposable functions (MIN/MAX/...), non-integer-literal ROWS
    * offsets, and a frameless exclusion (DuckDB rejects it too). GROUPS
    * frames no longer reach this pass — [[rewriteGroupsDeep]] decomposes
    * them to ROWS/RANGE first (round 16). Every
    * frame-type × exclusion-kind combination over COUNT/SUM/AVG is now
    * decomposed (the off-frame RANGE CURRENT ROW case closed round 15). */
  private def rewriteFrameExclude(sql0: String): String = {
    var sql = sql0
    var guard = 0
    while (guard < 50) {
      guard += 1
      val in = inString(sql)
      // find an EXCLUDE token whose enclosing paren group follows OVER
      var found = -1; var open = -1
      var i = 0
      while (i < sql.length && found < 0) {
        if (!in(i) && sql.regionMatches(true, i, "exclude", 0, 7) &&
            (i == 0 || !isIdentChar(sql(i - 1))) &&
            (i + 7 >= sql.length || !isIdentChar(sql(i + 7)))) {
          var depth = 0; var b = i - 1; var op = -1
          while (b >= 0 && op < 0) {
            if (!in(b)) {
              if (sql(b) == ')') depth += 1
              else if (sql(b) == '(') { if (depth == 0) op = b else depth -= 1 }
            }
            b -= 1
          }
          if (op > 0) {
            var w = op - 1
            while (w >= 0 && sql(w).isWhitespace) w -= 1
            var e = w
            while (e >= 0 && isIdentChar(sql(e))) e -= 1
            if (sql.substring(e + 1, w + 1).equalsIgnoreCase("over")) {
              found = i; open = op
            }
          }
        }
        if (found < 0) i += 1
      }
      if (found < 0) return sql
      val m = "(?is)^exclude\\s+(current\\s+row|group|ties|no\\s+others)".r
        .findFirstMatchIn(sql.substring(found))
        .getOrElse(throw new IllegalArgumentException(
          "window frame EXCLUDE: expected CURRENT ROW, GROUP, TIES or NO OTHERS"))
      val kind = m.group(1).toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
      var exclStart = found - 1
      while (exclStart >= 0 && sql(exclStart).isWhitespace) exclStart -= 1
      exclStart += 1
      val exclEnd = found + m.matched.length
      // matching close paren of the OVER spec
      var depth2 = 1; var k = open + 1
      while (depth2 > 0 && k < sql.length) {
        if (!in(k)) {
          if (sql(k) == '(') depth2 += 1 else if (sql(k) == ')') depth2 -= 1
        }
        k += 1
      }
      require(depth2 == 0, "window frame EXCLUDE: unbalanced OVER specification")
      val specClose = k - 1
      require(exclEnd <= specClose, "window frame EXCLUDE: exclusion outside the OVER spec")
      val specNoExcl = (sql.substring(open, exclStart) + sql.substring(exclEnd, specClose + 1))
        .replaceAll("\\s+\\)$", ")")
      // Does the (un-excluded) frame contain the current row? When it
      // does NOT, DuckDB 1.0's exclusion is NOT the ANSI no-op: it
      // computes the segments [start, cur-1] ∪ [cur+1, end] without
      // checking membership, so a frame ENDING at k PRECEDING (k ≥ 1)
      // silently EXTENDS its end to cur-1, and one STARTING at
      // k FOLLOWING extends its start to cur+1 — measured:
      // SUM over ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING EXCLUDE
      // CURRENT ROW on b=10i returns 60 at i=4 (= rows 1..3), not the
      // ANSI 30 (= rows 1..2). The engine is the oracle (the SIMILAR TO
      // precedent), so the rewrite reproduces the measured frame.
      val inner = specNoExcl.substring(1, specNoExcl.length - 1)
      val frameM = "(?is)\\b(rows|range|groups)\\b(.*)$".r.findFirstMatchIn(inner)
      frameM.foreach { fm =>
        if (fm.group(1).equalsIgnoreCase("groups"))
          throw new IllegalStateException(
            "GROUPS frame reached rewriteFrameExclude — rewriteGroupsDeep runs " +
              "first and should have decomposed it to ROWS/RANGE")
      }
      // Frame clause parsed uniformly: explicit BETWEEN keeps both
      // bounds; the ANSI single-bound shorthand (`ROWS 2 PRECEDING`,
      // accepted by DuckDB with EXCLUDE — measured) is BETWEEN <bound>
      // AND CURRENT ROW; an absent clause is left as None (the default
      // RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW).
      val betweenInfo: Option[(String, String, String, Int)] = frameM.map { fm =>
        val body = fm.group(2).trim
        val parts = splitTopLevelKeyword(body, "and")
        if (body.toLowerCase(java.util.Locale.ROOT).startsWith("between") && parts.length == 2)
          (parts(0).replaceAll("(?i)^between\\s+", "").trim, parts(1).trim,
            fm.group(1), fm.start)
        else (body, "CURRENT ROW", fm.group(1), fm.start)
      }
      // Bounds are classified by their TRAILING keyword so multi-token
      // offsets (e.g. INTERVAL '5' DAY PRECEDING) are positively
      // recognized — the old ^\S+\s+preceding$ single-token matcher let
      // such a bound fall through to the subtraction rewrite below,
      // which assumes the frame holds the current row (silent wrong
      // result). A zero offset (`0 PRECEDING/FOLLOWING`) is CURRENT ROW
      // in both engines and classifies as such (the bound-adjust branch
      // below would otherwise shrink a frame that DOES hold the current
      // row). Any bound text the classifier cannot place throws.
      def boundKind(b: String): Int = {
        val t = b.trim.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT)
        if (t == "current row" || t.startsWith("unbounded")) 0
        else if (t.matches("0+ (preceding|following)")) 0
        else if (t.endsWith(" following")) 1
        else if (t.endsWith(" preceding")) -1
        else throw new IllegalArgumentException(
          s"window frame EXCLUDE: unrecognized frame bound '${b.trim}'")
      }
      val (startsAfter, endsBefore) = betweenInfo match {
        case Some((a, bnd, _, _)) => (boundKind(a) > 0, boundKind(bnd) < 0)
        case None => (false, false)
      }
      if (kind == "no others") {
        // the ANSI no-op spelling — frame unchanged in both engines
        sql = sql.substring(0, exclStart) + sql.substring(exclEnd)
      } else if ((startsAfter || endsBefore) && kind == "current row" &&
          betweenInfo.exists(_._3.equalsIgnoreCase("rows"))) {
        // current row outside a ROWS frame: reproduce DuckDB's measured
        // segment arithmetic by moving the offending bound to the row
        // adjacent to current, then drop the exclusion. The RANGE
        // spelling of this case routes to the prefix-segment form in
        // the main branch below (round 15 — it was a documented throw).
        val (a, bnd, kw, fStart) = betweenInfo.get
        val newA = if (startsAfter) "1 FOLLOWING" else a
        val newB = if (endsBefore) "1 PRECEDING" else bnd
        val specAdj = "(" + inner.substring(0, fStart) +
          s"$kw BETWEEN $newA AND $newB" + ")"
        sql = sql.substring(0, open) + specAdj + sql.substring(specClose + 1)
      } else {
        // fn(args) immediately before OVER
        var w2 = open - 1
        while (w2 >= 0 && sql(w2).isWhitespace) w2 -= 1
        val overWordEnd = w2 + 1
        var e2 = w2
        while (e2 >= 0 && isIdentChar(sql(e2))) e2 -= 1
        require(sql.substring(e2 + 1, overWordEnd).equalsIgnoreCase("over"),
          "window frame EXCLUDE: lost the OVER anchor")
        var p2 = e2
        while (p2 >= 0 && sql(p2).isWhitespace) p2 -= 1
        require(p2 >= 0 && sql(p2) == ')',
          "window frame EXCLUDE: expected fn(...) immediately before OVER")
        var d3 = 1; var q3 = p2 - 1
        while (d3 > 0 && q3 >= 0) {
          if (!in(q3)) {
            if (sql(q3) == ')') d3 += 1 else if (sql(q3) == '(') d3 -= 1
          }
          if (d3 > 0) q3 -= 1
        }
        require(d3 == 0, "window frame EXCLUDE: unbalanced window function call")
        var idStart = q3 - 1
        while (idStart >= 0 && isIdentChar(sql(idStart))) idStart -= 1
        idStart += 1
        require(idStart < q3, "window frame EXCLUDE: expected a function name before OVER")
        val fn = sql.substring(idStart, q3).toLowerCase(java.util.Locale.ROOT)
        val arg = sql.substring(q3 + 1, p2).trim
        if ("(?is)^distinct\\b.*".r.findFirstIn(arg).isDefined)
          throw new IllegalArgumentException(
            "window frame EXCLUDE over a DISTINCT aggregate is not supported")
        val nonNullCur = s"(CASE WHEN ($arg) IS NULL THEN 0 ELSE 1 END)"
        def unsupportedFn(): Nothing = throw new IllegalArgumentException(
          s"window frame EXCLUDE ${kind.toUpperCase(java.util.Locale.ROOT)} over $fn() has " +
            "no decomposable rewrite — the dialect shim supports COUNT/SUM/AVG")
        val repl = if (kind == "current row" && (startsAfter || endsBefore)) {
          // RANGE frame NOT containing the current row (round 15 — this
          // closed the last frame-exclusion throw): DuckDB evaluates the
          // exclusion as the ROW-space segments [fs, i−1] ∪ [i+1, fe]
          // (round 14 measured the peer-including extension: RANGE 100
          // PRECEDING..5 PRECEDING EXCLUDE CURRENT ROW over
          // (5,100),(10,1),(10,2),(10,4) gives 100/101/103 at the a=10
          // rows). The value bounds fs/fe and the positional i mix, but
          // every piece is a STATIC prefix window:
          //   endsBefore:  [fs, i−1] = P(i−1) − P(fs−1)
          //     P(i−1)  = ROWS UNBOUNDED..1 PRECEDING
          //     P(fs−1) = RANGE UNBOUNDED..CURRENT − RANGE(start..CURRENT)
          //   startsAfter: [i+1, fe] = P(fe) − P(i)
          //     P(fe) = RANGE UNBOUNDED..end,  P(i) = ROWS UNBOUNDED..CURRENT
          // The other segment is empty by construction (rows before the
          // current have values ≤ v < v+c, and symmetrically). Goldens
          // for both directions, counts, AVG, NULL args and INTERVAL
          // bounds measured on DuckDB 1.0 (DuckDbDialectSpec).
          val (bA, bB, _, fStart) = betweenInfo.get
          val oPrefix = inner.substring(0, fStart)
          val sep = if (oPrefix.isEmpty || oPrefix.last.isWhitespace) "" else " "
          def w(frame: String) = s"OVER (${oPrefix}${sep}${frame})"
          val cntFn = if (arg == "*") "COUNT(*)" else s"COUNT($arg)"
          def cnt(frame: String) = s"$cntFn ${w(frame)}"
          def sum(frame: String) = s"COALESCE(SUM($arg) ${w(frame)}, 0)"
          def segs(g: String => String): String =
            if (endsBefore)
              s"(${g("ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING")} " +
                s"- (${g("RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")} " +
                s"- ${g(s"RANGE BETWEEN $bA AND CURRENT ROW")}))"
            else
              s"(${g(s"RANGE BETWEEN UNBOUNDED PRECEDING AND $bB")} " +
                s"- ${g("ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")})"
          val remCnt = segs(cnt)
          fn match {
            case "count" => remCnt
            case "sum" => s"(CASE WHEN $remCnt > 0 THEN ${segs(sum)} ELSE NULL END)"
            case "avg" => s"(CASE WHEN $remCnt > 0 THEN ${segs(sum)} / $remCnt ELSE NULL END)"
            case _ => unsupportedFn()
          }
        } else if (kind == "current row") fn match {
          case "count" if arg == "*" =>
            s"(COUNT(*) OVER $specNoExcl - 1)"
          case "count" =>
            s"(COUNT($arg) OVER $specNoExcl - $nonNullCur)"
          case "sum" =>
            s"(CASE WHEN COUNT($arg) OVER $specNoExcl - $nonNullCur > 0 " +
              s"THEN SUM($arg) OVER $specNoExcl - COALESCE($arg, 0) ELSE NULL END)"
          case "avg" =>
            s"(CASE WHEN COUNT($arg) OVER $specNoExcl - $nonNullCur > 0 " +
              s"THEN (SUM($arg) OVER $specNoExcl - COALESCE($arg, 0)) " +
              s"/ (COUNT($arg) OVER $specNoExcl - $nonNullCur) ELSE NULL END)"
          case _ => unsupportedFn()
        } else {
          // EXCLUDE GROUP / TIES. Three exactly-decomposable cases, all
          // measured on DuckDB 1.0 (DuckDbDialectSpec goldens):
          //
          // 1. RANGE frame CONTAINING the current row (round 13d): such
          //    a frame holds the ENTIRE peer group (peers sit at value-
          //    distance 0), so GROUP = frame − peers and TIES = frame −
          //    peers + current, with peers its own window over
          //    RANGE BETWEEN CURRENT ROW AND CURRENT ROW.
          // 2. RANGE frame NOT containing the current row (round 15):
          //    DuckDB computes the exclusion as the SEGMENTS
          //    [frameStart, peerStart−1] ∪ [peerEnd+1, frameEnd] — the
          //    same segment arithmetic round 14 measured for EXCLUDE
          //    CURRENT ROW, frame EXTENSION included (RANGE BETWEEN 15
          //    PRECEDING AND 5 PRECEDING EXCLUDE GROUP at v=5 over
          //    v∈(1,5,10×4,20,25) returns 100 — the ANSI frame is
          //    empty). In value space the segments are exactly
          //    {val ∈ [v−a, v)} and {val ∈ (v, v+b]}: each is a static
          //    window minus the peer window, self-clamping to 0.
          // 3. ROWS frame, any bounds (round 15): the same segments in
          //    ROW space, [i−sa, ps−1] ∪ [pe+1, i+sb], via prefix sums
          //    (goldens: frame 1P..1F over the peer block, 3P..2P and
          //    2F..4F extension cases, NULL args, shorthand, UNBOUNDED):
          //      seg1 = P(ps−1) − P(i−sa−1)   if precPeers < sa else ∅
          //      seg2 = P(i+sb) − P(pe)       if follPeers < sb else ∅
          //    where P(pe) is the RANGE-unbounded-≤-current sum (all
          //    peers included), P(ps−1) = P(pe) − peerSum, and the
          //    positional P(i−sa−1)/P(i+sb) are ROWS UNBOUNDED..k
          //    prefix windows — every frame bound static. precPeers/
          //    follPeers come from COUNT(*) windows (follPeers =
          //    rangeLeCnt − rowsLeCnt = pe − i). ROWS offsets must be
          //    integer literals (constants in both engines); anything
          //    else throws.
          //
          // All helper windows share the spec's partition/order prefix,
          // so Spark plans them into a single WindowExec over one sort.
          val (boundA, boundB, kw, fStart) = betweenInfo.getOrElse(
            throw new IllegalArgumentException(
              s"window frame EXCLUDE ${kind.toUpperCase(java.util.Locale.ROOT)} needs an " +
                "explicit frame clause (DuckDB itself rejects a frameless " +
                "exclusion — measured parse error)"))
          val oPrefix = inner.substring(0, fStart)
          val sep = if (oPrefix.isEmpty || oPrefix.last.isWhitespace) "" else " "
          def w(frame: String) = s"OVER (${oPrefix}${sep}${frame})"
          val peersF = "RANGE BETWEEN CURRENT ROW AND CURRENT ROW"
          val cntFn = if (arg == "*") "COUNT(*)" else s"COUNT($arg)"
          def cnt(frame: String) = s"$cntFn ${w(frame)}"
          def sum(frame: String) = s"COALESCE(SUM($arg) ${w(frame)}, 0)"
          val keepCur = if (kind == "ties") (if (arg == "*") " + 1" else s" + $nonNullCur") else ""
          val sumBack = if (kind == "ties") s" + COALESCE($arg, 0)" else ""
          val (remCnt, remSum): (String, String) =
            if (kw.equalsIgnoreCase("range") &&
                boundKind(boundA) <= 0 && boundKind(boundB) >= 0) {
              // case 1 — frame ⊇ peer group
              val peersSpec = "(" + oPrefix + sep + peersF + ")"
              (s"($cntFn OVER $specNoExcl - $cntFn OVER $peersSpec$keepCur)",
                s"(SUM($arg) OVER $specNoExcl " +
                  s"- COALESCE(SUM($arg) OVER $peersSpec, 0)$sumBack)")
            } else if (kw.equalsIgnoreCase("range")) {
              // case 2 — value-space segments
              val (c1, s1) =
                if (boundKind(boundA) <= 0)
                  (s"(${cnt(s"RANGE BETWEEN $boundA AND CURRENT ROW")} - ${cnt(peersF)})",
                    s"(${sum(s"RANGE BETWEEN $boundA AND CURRENT ROW")} - ${sum(peersF)})")
                else ("0", "0")
              val (c2, s2) =
                if (boundKind(boundB) >= 0)
                  (s"(${cnt(s"RANGE BETWEEN CURRENT ROW AND $boundB")} - ${cnt(peersF)})",
                    s"(${sum(s"RANGE BETWEEN CURRENT ROW AND $boundB")} - ${sum(peersF)})")
                else ("0", "0")
              (s"($c1 + $c2$keepCur)", s"($s1 + $s2$sumBack)")
            } else {
              // case 3 — row-space segments over prefix windows
              def rowOff(b: String, isStart: Boolean): Option[Long] = {
                val t = b.trim.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT)
                if (t == "current row") Some(0L)
                else if (t == "unbounded preceding" || t == "unbounded following") None
                else "^(\\d+) (preceding|following)$".r.findFirstMatchIn(t) match {
                  case Some(mm) =>
                    val n = mm.group(1).toLong
                    val prec = mm.group(2) == "preceding"
                    Some(if (isStart == prec) n else -n)
                  case None => throw new IllegalArgumentException(
                    s"window frame EXCLUDE ${kind.toUpperCase(java.util.Locale.ROOT)} over " +
                      s"a ROWS frame needs integer-literal offsets — got '${b.trim}'")
                }
              }
              val saO = rowOff(boundA, isStart = true)
              val sbO = rowOff(boundB, isStart = false)
              def cstar(frame: String) = s"COUNT(*) ${w(frame)}"
              val follPeersE =
                s"(${cstar("RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")} " +
                  s"- ${cstar("ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")})"
              val precPeersE = s"(${cstar(peersF)} - 1 - $follPeersE)"
              def segs(g: String => String): String = {
                val sLe = g("RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
                val sPeer = g(peersF)
                val s1 = saO match {
                  case None => s"($sLe - $sPeer)"
                  case Some(sa) if sa <= 0 => "0"
                  case Some(sa) =>
                    val pPrec = g(s"ROWS BETWEEN UNBOUNDED PRECEDING AND ${sa + 1} PRECEDING")
                    s"(CASE WHEN $precPeersE < $sa THEN ($sLe - $sPeer) - $pPrec ELSE 0 END)"
                }
                val s2 = sbO match {
                  case None =>
                    s"(${g("ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING")} - $sLe)"
                  case Some(sb) if sb <= 0 => "0"
                  case Some(sb) =>
                    val pFoll = g(s"ROWS BETWEEN UNBOUNDED PRECEDING AND $sb FOLLOWING")
                    s"(CASE WHEN $follPeersE < $sb THEN $pFoll - $sLe ELSE 0 END)"
                }
                s"($s1 + $s2)"
              }
              (s"(${segs(cnt)}$keepCur)", s"(${segs(sum)}$sumBack)")
            }
          fn match {
            case "count" => remCnt
            case "sum" => s"(CASE WHEN $remCnt > 0 THEN $remSum ELSE NULL END)"
            case "avg" => s"(CASE WHEN $remCnt > 0 THEN $remSum / $remCnt ELSE NULL END)"
            case _ => unsupportedFn()
          }
        }
        sql = sql.substring(0, idStart) + repl + sql.substring(specClose + 1)
      }
    }
    throw new IllegalArgumentException("window frame EXCLUDE rewriting did not converge")
  }

  /** DuckDB-keyword set for the bracket classifier: a '[' straight
    * after one of these is a LIST LITERAL position (`SELECT [1,2]`,
    * `WHEN [..] THEN`, `ARRAY[..]`), not an index on an operand. */
  private val BracketKeywords: Set[String] = Set(
    "select", "from", "where", "when", "then", "else", "end", "and",
    "or", "not", "in", "on", "by", "as", "all", "distinct", "case",
    "union", "intersect", "except", "having", "limit", "offset",
    "join", "cross", "inner", "left", "right", "full", "outer",
    "semi", "anti", "using", "over", "partition", "order", "group",
    "between", "like", "ilike", "is", "null", "asc", "desc", "values",
    "array", "row", "interval", "exists", "any", "some", "escape",
    "nulls", "first", "last", "filter", "within", "window", "qualify",
    "lateral", "natural", "if", "struct", "returning", "cast")

  /** DuckDB bracket syntax (all measured on 1.0): list LITERALS
    * `[e1, e2, …]`, 1-based INDEXING `x[i]` (NULL past either end AND
    * at index 0; negative counts from the end; `x` may be any operand —
    * identifier, call, literal, parenthesized expression or a chained
    * index), and slices `x[a:b]`. Spark parses `x[i]` as 0-BASED
    * GetArrayItem (throwing out of bounds under the default ANSI mode)
    * and rejects bracket literals outright — a bare pass-through is
    * either a parse error or SILENTLY OFF BY ONE, the worst class.
    *
    * Rewrites (outside strings/comments, innermost-last by rescan):
    *  - literal position (bracket follows start of statement, ',', '(',
    *    an operator, or a keyword) → `array(items)`;
    *  - operand position → `try_element_at(operand, nullif(idx, 0))` —
    *    Spark's try_element_at IS DuckDB's indexing (1-based, NULL out
    *    of bounds, negative from the end), and the nullif zero-guard
    *    reproduces l[0] = NULL where Spark's element_at family rejects
    *    index 0 (a NULL index returns NULL on both engines).
    *
    * Bounds: slices `x[a:b]` THROW — the text cannot carry the
    * operand's type (list slice vs string substring); array-TYPE
    * brackets (`CAST(x AS INT[])`, `x::INT[3]`) THROW a named error —
    * Spark spells array types ARRAY<...>; STRING indexing
    * ('abc'[2] = 'b' in DuckDB) surfaces Spark's type error (loud);
    * MAP bracket access diverges by design — DuckDB wraps the value in
    * a one-element LIST, the rewrite yields the scalar (element_at
    * semantics; documented acceptance). */
  private def rewriteBrackets(sql0: String): String = {
    var sql = sql0
    var guard = 0
    var changed = true
    while (changed && guard < 200) {
      guard += 1
      changed = false
      val in = inString(sql)
      var i = 0
      while (i < sql.length && !changed) {
        if (sql(i) == '[' && !in(i)) {
          // matching close bracket; top-level ':' marks a slice
          var depth = 1; var pdepth = 0; var j = i + 1; var colon = -1
          while (depth > 0 && j < sql.length) {
            if (!in(j)) sql(j) match {
              case '[' => depth += 1
              case ']' => depth -= 1
              case '(' => pdepth += 1
              case ')' => pdepth -= 1
              case ':' if depth == 1 && pdepth == 0 => colon = j
              case _ => ()
            }
            if (depth > 0) j += 1
          }
          if (depth != 0)
            throw new IllegalArgumentException("unbalanced '[' in expression")
          val close = j
          var p = i - 1
          while (p >= 0 && sql(p).isWhitespace) p -= 1
          // keyword just before the bracket ⇒ literal position; the
          // `ARRAY[...]` spelling consumes its keyword (it abuts the
          // bracket and `array(...)` already says it), other abutting
          // keywords get a separating space
          var kwStart = -1; var kwText = ""
          if (p >= 0 && isIdentChar(sql(p)) && !in(p)) {
            var w = p
            while (w >= 0 && isIdentChar(sql(w))) w -= 1
            val t = sql.substring(w + 1, p + 1).toLowerCase(java.util.Locale.ROOT)
            if (BracketKeywords.contains(t)) { kwStart = w + 1; kwText = t }
          }
          val kwBefore = kwStart >= 0
          val operandPos = p >= 0 && !kwBefore &&
            (in(p) || isIdentChar(sql(p)) || sql(p) == ')' || sql(p) == ']')
          if (!operandPos) {
            val spliceAt = if (kwText == "array") kwStart else i
            val sep = if (spliceAt == i && p == i - 1 && kwBefore) " " else ""
            sql = sql.substring(0, spliceAt) + sep + "array(" +
              sql.substring(i + 1, close) + ")" + sql.substring(close + 1)
            changed = true
          } else if (colon >= 0) {
            throw new IllegalArgumentException(
              "bracket slice x[a:b] is not supported by the dialect shim: the " +
                "text cannot carry the operand's type (list slice vs string " +
                "substring) — use list_slice(x, a, b) or substring(x, a, n)")
          } else {
            // capture the operand: walk back over a suffix chain of
            // identifiers, '.'-qualified names, call/paren groups,
            // bracket groups and literals
            var s0 = p
            var cont = true
            while (cont && s0 >= 0) {
              if (in(s0)) { while (s0 >= 0 && in(s0)) s0 -= 1 }
              else if (sql(s0) == ')') {
                var d = 1; s0 -= 1
                while (s0 >= 0 && d > 0) {
                  if (!in(s0)) {
                    if (sql(s0) == ')') d += 1
                    else if (sql(s0) == '(') d -= 1
                  }
                  s0 -= 1
                }
              } else if (sql(s0) == ']') {
                var d = 1; s0 -= 1
                while (s0 >= 0 && d > 0) {
                  if (!in(s0)) {
                    if (sql(s0) == ']') d += 1
                    else if (sql(s0) == '[') d -= 1
                  }
                  s0 -= 1
                }
              } else if (isIdentChar(sql(s0))) {
                while (s0 >= 0 && isIdentChar(sql(s0))) s0 -= 1
              } else cont = false
              if (cont) {
                if (s0 >= 0 && sql(s0) == '.') s0 -= 1
                else if (!(s0 >= 0 && isIdentChar(sql(s0)))) cont = false
              }
            }
            val opStart = s0 + 1
            val operand = sql.substring(opStart, i).trim
            val idx = sql.substring(i + 1, close).trim
            // TYPE-position brackets: in CAST(x AS INT[]) / x::INT[3]
            // the bracket modifies a type name, not a value — treating
            // it as indexing would emit try_element_at(INT, 3) and
            // surface a misattributed Spark parse error. Detect the
            // two spellings (:: or AS immediately before the captured
            // operand) and throw the NAMED error instead.
            val beforeOp = {
              var tp = opStart - 1
              while (tp >= 0 && sql(tp).isWhitespace) tp -= 1
              tp
            }
            val typePos =
              (beforeOp >= 1 && sql(beforeOp) == ':' && sql(beforeOp - 1) == ':' && !in(beforeOp)) ||
              (beforeOp >= 1 && isIdentChar(sql(beforeOp)) && !in(beforeOp) && {
                var w = beforeOp
                while (w >= 0 && isIdentChar(sql(w))) w -= 1
                sql.substring(w + 1, beforeOp + 1).equalsIgnoreCase("as")
              })
            if (typePos)
              throw new IllegalArgumentException(
                s"array-type bracket syntax ('$operand[...]', as in CAST(x AS $operand[]) " +
                  s"or x::$operand[n]) is not supported by the dialect shim — " +
                  "Spark spells array types ARRAY<...>")
            require(operand.nonEmpty && idx.nonEmpty,
              s"bracket index: malformed expression near '${sql.substring(opStart, close + 1)}'")
            // zero-guard by index SHAPE: a quoted literal is a MAP key
            // (no zero concept, and nullif(key, 0) would be an ANSI
            // cast error); an integer literal resolves statically; any
            // other expression gets the runtime nullif guard (a
            // COMPUTED string map key through that guard surfaces the
            // cast error loudly — documented, use element_at there)
            val guarded =
              if ("(?s)^'(?:[^']|'')*'$".r.findFirstIn(idx).isDefined)
                s"try_element_at($operand, $idx)"
              else if (idx.matches("[0-9]+"))
                if (idx.toLong == 0L) s"try_element_at($operand, CAST(NULL AS INT))"
                else s"try_element_at($operand, $idx)"
              else if (idx.matches("-[0-9]+"))
                s"try_element_at($operand, $idx)"
              else s"try_element_at($operand, nullif($idx, 0))"
            sql = sql.substring(0, opStart) + guarded + sql.substring(close + 1)
            changed = true
          }
        }
        i += 1
      }
    }
    if (guard >= 200)
      throw new IllegalArgumentException("bracket rewriting did not converge")
    sql
  }

  /** DuckDB evaluates DISTINCT aggregates as WINDOW functions
    * (`COUNT/SUM/AVG/MIN/MAX(DISTINCT x) OVER …`); Spark rejects
    * DISTINCT inside any window function. Measured on DuckDB 1.0
    * (DuckDbDialectSpec goldens): NULLs are excluded from the distinct
    * set, COUNT over an all-NULL/empty frame is 0, SUM/AVG are NULL,
    * and frames apply (the set is the FRAME's distinct values). Exact
    * decompositions over Spark's set-valued window aggregate:
    *
    *   COUNT → size(collect_set(x) OVER spec)          (empty → 0)
    *   SUM   → aggregate(cs, try_element_at(cs, 1) + CAST(0 AS BIGINT),
    *                     (a,b) -> a+b) − try_element_at(cs, 1)
    *           (the first element seeds the fold; the `+ 0L` widens the
    *           accumulator by Spark's binary-arithmetic promotion with
    *           no textual type guess — int/smallint seeds become
    *           BIGINT, matching native SUM's long accumulator instead
    *           of wrapping/ANSI-failing at the element type's range,
    *           and double seeds keep DOUBLE (+0L is the identity
    *           there); the seed is added once more by the fold and
    *           subtracted back; empty set → NULL seed → NULL, DuckDB's
    *           empty-SUM. Bounds vs DuckDB: integer totals beyond
    *           ±2^63 diverge (DuckDB sums in HUGEINT — same bound as
    *           Spark's native SUM), and DECIMAL arguments remain
    *           UNSUPPORTED: decimal + BIGINT widens the accumulator's
    *           precision, the fold then grows precision per addition,
    *           and Spark's lambda type check rejects the plan — a loud
    *           analysis error, never a silent value; the fix would
    *           need the element type, which a text shim doesn't have)
    *   AVG   → the SUM form / size(cs), NULL-guarded
    *   MIN/MAX → DISTINCT dropped (identical by definition)
    *
    * collect_set's order nondeterminism is immaterial — only the set's
    * size and a commutative fold are read; the set itself is the
    * irreducible per-frame state of an exact DISTINCT window on ANY
    * engine. Ordinary (non-window) DISTINCT aggregates are left alone
    * (Spark-native). Bound: the collect_set text is spliced 2–4× —
    * the same deterministic-inputs duplication class documented at the
    * list-call NULL guards. */
  private def rewriteDistinctWindow(sql0: String): String = {
    var sql = sql0
    var guard = 0
    val fns = Seq("count", "sum", "avg", "min", "max")
    while (guard < 100) {
      guard += 1
      val in = inString(sql)
      // first fn( DISTINCT … ) followed by OVER
      var matched: Option[(Int, String, Int, Int)] = None
      var idx = 0
      while (idx < sql.length && matched.isEmpty) {
        if (!in(idx) && (idx == 0 || !isIdentChar(sql(idx - 1)))) {
          fns.find(f => sql.regionMatches(true, idx, f, 0, f.length) &&
              (idx + f.length >= sql.length || !isIdentChar(sql(idx + f.length))))
            .foreach { f =>
              var j = idx + f.length
              while (j < sql.length && sql(j).isWhitespace) j += 1
              if (j < sql.length && sql(j) == '(') {
                var k = j + 1
                while (k < sql.length && sql(k).isWhitespace) k += 1
                if (sql.regionMatches(true, k, "distinct", 0, 8) &&
                    k + 8 < sql.length && !isIdentChar(sql(k + 8))) {
                  var depth = 1; var p = j + 1
                  while (depth > 0 && p < sql.length) {
                    if (!in(p)) {
                      if (sql(p) == '(') depth += 1
                      else if (sql(p) == ')') depth -= 1
                    }
                    p += 1
                  }
                  if (depth == 0) {
                    val close = p - 1
                    var q = close + 1
                    while (q < sql.length && sql(q).isWhitespace) q += 1
                    if (sql.regionMatches(true, q, "over", 0, 4) &&
                        (q + 4 >= sql.length || !isIdentChar(sql(q + 4))))
                      matched = Some((idx, f.toLowerCase(java.util.Locale.ROOT),
                        k + 8, close))
                  }
                }
              }
            }
        }
        idx += 1
      }
      matched match {
        case None => return sql
        case Some((fnStart, f, distEnd, close)) =>
          var q = close + 1
          while (sql(q).isWhitespace) q += 1
          var ovEnd = q + 4
          while (ovEnd < sql.length && sql(ovEnd).isWhitespace) ovEnd += 1
          if (ovEnd < sql.length && sql(ovEnd) == '(') {
            var depth = 1; ovEnd += 1
            while (depth > 0 && ovEnd < sql.length) {
              if (!in(ovEnd)) {
                if (sql(ovEnd) == '(') depth += 1
                else if (sql(ovEnd) == ')') depth -= 1
              }
              ovEnd += 1
            }
            require(depth == 0, "DISTINCT window aggregate: unbalanced OVER specification")
          } else {
            val idStart = ovEnd
            while (ovEnd < sql.length && isIdentChar(sql(ovEnd))) ovEnd += 1
            require(ovEnd > idStart,
              "DISTINCT window aggregate: expected a window spec or name after OVER")
          }
          val ov = sql.substring(q, ovEnd)
          val arg = sql.substring(distEnd, close).trim
          if (arg.isEmpty || arg == "*")
            throw new IllegalArgumentException(
              s"window ${f.toUpperCase(java.util.Locale.ROOT)}(DISTINCT ...): " +
                "expected a column argument")
          val cs = s"collect_set($arg) $ov"
          val sumF = s"(aggregate($cs, try_element_at($cs, 1) + CAST(0 AS BIGINT), " +
            s"(__dw_a, __dw_b) -> __dw_a + __dw_b) - try_element_at($cs, 1))"
          val repl = f match {
            case "min" | "max" => s"${f.toUpperCase(java.util.Locale.ROOT)}($arg) $ov"
            case "count" => s"size(collect_set($arg) $ov)"
            case "sum" => sumF
            case _ => s"(CASE WHEN size($cs) > 0 THEN $sumF / size($cs) ELSE NULL END)"
          }
          sql = sql.substring(0, fnStart) + repl + sql.substring(ovEnd)
      }
    }
    throw new IllegalArgumentException("DISTINCT window rewriting did not converge")
  }

  /** DuckDB spells IGNORE/RESPECT NULLS INSIDE a window function's call
    * parens, as the last token after the arguments (`last_value(x IGNORE
    * NULLS)`, `lag(x, 1 IGNORE NULLS)`); Spark only parses the ANSI
    * TRAILING position (`last_value(x) IGNORE NULLS OVER ...`). Both
    * facts measured on DuckDB 1.0 / Spark 4.1 — neither engine accepts
    * the other's spelling, so this hoists the in-paren form out:
    * `<args> IGNORE NULLS ) OVER` → `<args> ) IGNORE NULLS OVER`. The
    * OVER lookahead pins the rewrite to window calls (the only place
    * DuckDB accepts the modifier), so ordinary identifiers named
    * `ignore`/`nulls` elsewhere are untouched. Spark-style input has no
    * in-paren form to match and passes through byte-identical. */
  private def rewriteIgnoreNulls(sql: String): String = {
    val in = inString(sql)
    val re = "(?i)\\s+(ignore|respect)\\s+nulls\\s*\\)(?=\\s*over\\b)".r
    re.replaceAllIn(sql, m =>
      if (in(m.start)) scala.util.matching.Regex.quoteReplacement(m.matched)
      else scala.util.matching.Regex.quoteReplacement(
        s") ${m.group(1).toUpperCase(java.util.Locale.ROOT)} NULLS"))
  }

  private def rewriteUsingSample(sql: String): String = {
    val in = inString(sql)
    def wordAt(i: Int, w: String): Boolean =
      !in(i) && sql.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isIdentChar(sql(i - 1))) &&
        (i + w.length >= sql.length || !isIdentChar(sql(i + w.length)))
    val b = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (wordAt(i, "using")) {
        var j = i + "using".length
        while (j < sql.length && sql(j).isWhitespace) j += 1
        if (j < sql.length && wordAt(j, "sample")) {
          var k = j + "sample".length
          while (k < sql.length && sql(k).isWhitespace) k += 1
          val numStart = k
          while (k < sql.length && (sql(k).isDigit || sql(k) == '.')) k += 1
          require(k > numStart,
            "USING SAMPLE: expected a numeric sample size")
          val num = sql.substring(numStart, k)
          var m = k
          while (m < sql.length && sql(m).isWhitespace) m += 1
          val (unit, end) =
            if (m < sql.length && sql(m) == '%') ("PERCENT", m + 1)
            else if (m < sql.length && sql.regionMatches(true, m, "percent", 0, 7) &&
                     (m + 7 >= sql.length || !isIdentChar(sql(m + 7))))
              ("PERCENT", m + 7)
            else if (m < sql.length && sql.regionMatches(true, m, "rows", 0, 4) &&
                     (m + 4 >= sql.length || !isIdentChar(sql(m + 4))))
              ("ROWS", m + 4)
            else ("ROWS", k)
          b.append(s"TABLESAMPLE ($num $unit)")
          i = end
        } else { b.append(sql(i)); i += 1 }
      } else { b.append(sql(i)); i += 1 }
    }
    b.toString
  }

  private def rewriteOperatorIntDiv(sql: String): String = {
    val in = inString(sql)
    val b = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (!in(i) && i + 1 < sql.length && sql(i) == '/' && sql(i + 1) == '/') {
        b.append(" div "); i += 2
      } else { b.append(sql(i)); i += 1 }
    }
    b.toString
  }

  /** Case-insensitive rename of `from(` call sites outside strings. */
  private def renameFn(sql: String, from: String, to: String): String = {
    val in = inString(sql)
    val b = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (!in(i) && sql.regionMatches(true, i, from, 0, from.length) &&
          (i == 0 || !isIdentChar(sql(i - 1))) && {
            var j = i + from.length
            while (j < sql.length && sql(j).isWhitespace) j += 1
            j < sql.length && sql(j) == '(' && !isIdentChar(sql(i + from.length - 1 + 1))
          }) {
        b.append(to); i += from.length
      } else { b.append(sql(i)); i += 1 }
    }
    b.toString
  }

  /** Find each `fname( args )` call outside strings (innermost-last via
    * repeated scans), split its top-level args, and substitute
    * `f(args)`. Loops until no call remains, so nested occurrences in
    * rewritten output are handled too. */
  private def rewriteCalls(sql: String, fname: String)(f: Seq[String] => String): String = {
    var s = sql
    var guard = 0
    while (guard < 100) {
      guard += 1
      val in = inString(s)
      var i = 0
      var found = -1
      while (found < 0 && i < s.length) {
        if (!in(i) && s.regionMatches(true, i, fname, 0, fname.length) &&
            (i == 0 || !isIdentChar(s(i - 1)))) {
          var j = i + fname.length
          while (j < s.length && s(j).isWhitespace) j += 1
          if (j < s.length && s(j) == '(') found = i
          else i += 1
        } else i += 1
      }
      if (found < 0) return s
      // balanced scan from the '(' to the matching ')'
      var j = s.indexOf('(', found + fname.length)
      val argStart = j + 1
      var depth = 1
      var k = argStart
      val splits = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (depth > 0 && k < s.length) {
        val c = s(k)
        if (in(k)) ()
        else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == ',' && depth == 1) splits += k
        k += 1
      }
      if (depth != 0) throw new IllegalArgumentException(
        s"$fname(: unbalanced parentheses in SQL")
      val argEnd = k - 1 // position of the matching ')'
      val bounds: Seq[Int] = (argStart +: splits.toSeq.map(_ + 1)) :+ argEnd
      val args = bounds.sliding(2).map { w =>
        s.substring(w(0), math.min(w(1), argEnd)).stripSuffix(",").trim
      }.toSeq.filter(_.nonEmpty)
      s = s.substring(0, found) + f(args) + s.substring(argEnd + 1)
    }
    throw new IllegalArgumentException(s"$fname rewrite did not converge")
  }

  /** [[rewriteCalls]] with PASS-THROUGH: the callback returns None to
    * leave a call site untouched (scanning resumes after it). Needed
    * for names BOTH dialects define with different arities — e.g.
    * DuckDB's 3-arg date_diff('part', a, b) vs Spark's own 2-arg
    * date_diff(end, start): the Spark spelling must survive
    * byte-identical (the shim's standing pass-through contract). */
  private def rewriteCallsOpt(sql: String, fname: String)(
      f: Seq[String] => Option[String]): String = {
    var s = sql
    var from = 0
    var guard = 0
    while (guard < 200) {
      guard += 1
      val in = inString(s)
      var i = from
      var found = -1
      while (found < 0 && i < s.length) {
        if (!in(i) && s.regionMatches(true, i, fname, 0, fname.length) &&
            (i == 0 || !isIdentChar(s(i - 1)))) {
          var j = i + fname.length
          while (j < s.length && s(j).isWhitespace) j += 1
          if (j < s.length && s(j) == '(') found = i
          else i += 1
        } else i += 1
      }
      if (found < 0) return s
      var j = s.indexOf('(', found + fname.length)
      val argStart = j + 1
      var depth = 1
      var k = argStart
      val splits = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (depth > 0 && k < s.length) {
        val c = s(k)
        if (in(k)) ()
        else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == ',' && depth == 1) splits += k
        k += 1
      }
      if (depth != 0) throw new IllegalArgumentException(
        s"$fname(: unbalanced parentheses in SQL")
      val argEnd = k - 1
      val bounds: Seq[Int] = (argStart +: splits.toSeq.map(_ + 1)) :+ argEnd
      val args = bounds.sliding(2).map { w =>
        s.substring(w(0), math.min(w(1), argEnd)).stripSuffix(",").trim
      }.toSeq.filter(_.nonEmpty)
      f(args) match {
        case Some(repl) =>
          s = s.substring(0, found) + repl + s.substring(argEnd + 1)
          from = 0 // a replacement may expose nested rewritable calls
        case None =>
          from = found + fname.length // leave it; scan past
      }
    }
    throw new IllegalArgumentException(s"$fname rewrite did not converge")
  }

  // ---- specific translations ------------------------------------------

  /** DuckDB list_prepend(elem, list): the ARGUMENT ORDER is reversed
    * vs Spark's array_prepend(list, elem) — a rename alone would be the
    * silent swapped-args class. */
  private def listPrependCall(args: Seq[String]): String = {
    require(args.size == 2, s"list_prepend: expected (element, list), got ${args.size}")
    s"array_prepend(${args(1)}, ${args(0)})"
  }

  /** DuckDB list_unique(l): the number of DISTINCT NON-NULL elements
    * (measured: list_unique([1,2,2,3,NULL]) = 3 — NULL is excluded,
    * where a bare size(array_distinct(l)) would count it). */
  private def listUniqueCall(args: Seq[String]): String = {
    require(args.size == 1, s"list_unique: expected 1 argument, got ${args.size}")
    s"size(filter(array_distinct(${args.head}), __lu_x -> __lu_x IS NOT NULL))"
  }

  /** DuckDB list_aggregate(l, 'name'): apply a named aggregate over the
    * list. The supported names map to Spark's array algebra — sum folds
    * with a BIGINT-widening seed (int lists match DuckDB's widened sum;
    * doubles keep their type), count counts non-NULLs, avg is the pair.
    * Other names throw with the supported list. */
  private def listAggregateCall(args: Seq[String]): String = {
    require(args.size == 2,
      s"list_aggregate: expected (list, 'name'), got ${args.size} arguments")
    val l = args(0)
    val name = args(1).trim.replaceAll("^'|'$", "").toLowerCase(java.util.Locale.ROOT)
    // the fold runs over the NULL-FILTERED list (DuckDB's aggregates
    // skip NULL elements), accumulating in DOUBLE: the seed is the
    // first element cast to double times zero — 0.0 on a non-empty
    // list, NULL on an empty one (DuckDB's empty-sum), and a stable
    // accumulator type for int, double AND decimal element types (an
    // element-typed decimal seed grows precision per addition and
    // fails Spark's lambda type check — measured). The result type is
    // therefore DOUBLE where DuckDB keeps the element-derived type —
    // value-equal within 2^53, the quantile_disc-style widening bound.
    def fl = s"filter($l, __la_x -> __la_x IS NOT NULL)"
    def sum0 = s"aggregate($fl, CAST(try_element_at($fl, 1) AS DOUBLE) * 0, " +
      s"(__la_a, __la_b) -> __la_a + __la_b)"
    def cnt = s"size($fl)"
    name match {
      case "sum" => s"($sum0)"
      case "min" => s"array_min($l)"
      case "max" => s"array_max($l)"
      case "count" => cnt
      case "avg" | "mean" => s"(CASE WHEN $cnt > 0 THEN ($sum0) / $cnt ELSE NULL END)"
      case other => throw new IllegalArgumentException(
        s"list_aggregate name '$other' is not supported by the dialect shim " +
          "(sum/min/max/count/avg)")
    }
  }

  /** DuckDB list_extract(l, i) / array_extract: 1-based, negative from
    * the end, NULL for index 0 and out-of-bounds (all measured on
    * DuckDB 1.0: extract([1,2,3], 0) = NULL, (-1) = 3, (9) = NULL).
    * Spark's try_element_at matches everywhere EXCEPT index 0, which it
    * rejects at runtime — the same nullif(idx, 0) guard the bracket
    * rewrite uses pins that case to NULL. Bound: DuckDB also accepts a
    * VARCHAR first argument (character extraction); Spark's element_at
    * family is array/map-only, so string inputs surface Spark's type
    * error (loud), same as the bracket rewrite's documented bound. */
  private def listExtractCall(args: Seq[String]): String = {
    require(args.size == 2, s"list_extract: expected (list, index), got ${args.size}")
    s"try_element_at(${args(0)}, nullif(${args(1)}, 0))"
  }

  /** DuckDB list_has_any(a, b): TRUE when the lists share a NON-NULL
    * element, FALSE when both are non-NULL lists without a shared
    * element — NULL elements never match (measured:
    * has_any([1,NULL],[NULL]) = false) — and NULL when EITHER list
    * argument is NULL (measured: has_any(NULL,[1,2]) = NULL, both
    * positions). Spark's arrays_overlap is three-valued on NULL
    * *elements* (NULL when no match but NULLs present), so the no-match
    * case is pinned to false with coalesce — but only under non-NULL
    * list arguments, so the whole-argument-NULL case still propagates
    * NULL like DuckDB. The arguments are spliced twice each; they are
    * deterministic expressions under the gateway (the documented
    * duplication class of the other list-call guards). */
  private def listHasAnyCall(args: Seq[String]): String = {
    require(args.size == 2, s"list_has_any: expected 2 lists, got ${args.size}")
    val (a, b) = (args(0), args(1))
    s"(CASE WHEN ($a) IS NULL OR ($b) IS NULL THEN NULL " +
      s"ELSE coalesce(arrays_overlap($a, $b), false) END)"
  }

  /** DuckDB list_has_all(l, sub): TRUE when every element of sub is in
    * l — including NULL matching NULL (measured:
    * has_all([1,NULL],[NULL]) = true; has_all(l, []) = true) — and NULL
    * when either LIST argument is NULL (measured: has_all(NULL,[1]) =
    * NULL, has_all([1],NULL) = NULL). Spark has no direct twin; forall
    * + a NULL-aware membership test reproduces the element semantics
    * exactly (bare array_contains is three-valued on NULL-bearing
    * lists, hence the coalesce), and forall already propagates a NULL
    * sub — the CASE adds the NULL-l half so a NULL list on either side
    * yields NULL instead of a fabricated false. */
  private def listHasAllCall(args: Seq[String]): String = {
    require(args.size == 2, s"list_has_all: expected 2 lists, got ${args.size}")
    val (l, sub) = (args(0), args(1))
    s"(CASE WHEN ($l) IS NULL THEN NULL ELSE " +
      s"forall($sub, __ha_x -> CASE WHEN __ha_x IS NULL THEN " +
      s"exists($l, __ha_y -> __ha_y IS NULL) " +
      s"ELSE coalesce(array_contains($l, __ha_x), false) END) END)"
  }

  /** DuckDB struct_pack(a := 1, b := x): named-field struct literal —
    * Spark spells it named_struct('a', 1, 'b', x). */
  private def structPackCall(args: Seq[String]): String = {
    val field = "(?s)^([A-Za-z_][A-Za-z0-9_]*)\\s*:=\\s*(.+)$".r
    val pairs = args.map {
      case field(n, e) => s"'$n', ${e.trim}"
      case other => throw new IllegalArgumentException(
        s"struct_pack: expected name := expr, got '$other'")
    }
    s"named_struct(${pairs.mkString(", ")})"
  }

  /** DuckDB's 2-arg regexp_extract(s, re) returns the FULL MATCH (group
    * 0); Spark's 2-arg form DEFAULTS TO GROUP 1 and errors when the
    * pattern has no group. The gateway serves DuckDB semantics, so the
    * 2-arg form pins idx=0 explicitly; 3-arg calls agree already and
    * pass through. */
  private def regexpExtractCall(args: Seq[String]): Option[String] =
    if (args.size == 2) Some(s"regexp_extract(${args(0)}, ${args(1)}, 0)")
    else None

  /** DuckDB quantile_disc(x, q) / its alias quantile(x, q): the
    * discrete quantile — the smallest element whose cumulative
    * distribution reaches q. Spark's spelling is the ANSI
    * `percentile_disc(q) WITHIN GROUP (ORDER BY x)` (measured equal on
    * DuckDB 1.0: quantile_disc over 1..4 gives 2 at 0.5 and 1 at 0.25,
    * exactly percentile_disc's smallest-cum≥q element; the result TYPE
    * widens to double where DuckDB keeps the element type — same
    * element value, callers cast). The CONTINUOUS
    * twin quantile_cont needs no structure — it is the renames-table
    * map to Spark's `percentile(x, q)` (same linear interpolation,
    * measured: 2.5/1.75 over 1..4 at 0.5/0.25), which also carries
    * DuckDB's array-of-quantiles form for free. Array-q quantile_disc
    * surfaces percentile_disc's loud arity error — documented bound. */
  private def quantileDiscCall(args: Seq[String]): String = {
    require(args.size == 2,
      s"quantile_disc/quantile: expected (value, quantile), got ${args.size} arguments")
    s"percentile_disc(${args(1)}) WITHIN GROUP (ORDER BY ${args(0)})"
  }

  /** DuckDB's 3-arg date_diff('part', start, end) / datediff alias:
    * counts PART BOUNDARIES CROSSED between start and end (measured:
    * month of Jan-31→Feb-01 is 1; Jan-01→Mar-31 is 2 — boundary
    * crossings, NOT elapsed complete months), signed by direction.
    * Spark has no boundary-crossing dateDiff, so each part becomes its
    * boundary arithmetic: calendar parts difference their part index
    * (year/quarter/month), week differences Monday-truncated dates
    * (both engines' weeks are ISO-Monday), day is datediff, and
    * sub-day parts difference the SESSION-LOCAL part truncation
    * (unix_micros of date_trunc), so boundary counts follow the local
    * clock like DuckDB's naive timestamps even in half-hour-offset
    * zones where a raw epoch floor lands mid-hour; both truncations
    * sit on local part boundaries, so the micros delta is an exact
    * unit multiple and `div` is exact. Residual bound: across a DST
    * transition Spark's local clock skips/repeats an hour while
    * DuckDB's naive timestamps do not — counts diverge inside the
    * transition hour only (the gateway's sessions pin UTC).
    * Results CAST BIGINT (DuckDB's type). The 2-arg Spark spelling and
    * non-literal part expressions pass through untouched; an
    * unsupported part name throws with the supported list. DuckDB's
    * date_sub family (COMPLETE elapsed intervals, a different count) is
    * NOT mapped — Spark's arity error surfaces, documented bound. */
  private def dateDiffCall(args: Seq[String]): Option[String] = {
    if (args.size != 3) return None
    val lit = "(?s)^'([A-Za-z]+)'$".r
    val part = args(0) match {
      case lit(p) =>
        val t = p.toLowerCase(java.util.Locale.ROOT)
        if (t.endsWith("s")) t.dropRight(1) else t
      case _ => return None
    }
    val s0 = args(1); val e0 = args(2)
    def truncDiff(unit: String, unitMicros: Long): String =
      s"((unix_micros(date_trunc('$unit', CAST($e0 AS TIMESTAMP))) - " +
        s"unix_micros(date_trunc('$unit', CAST($s0 AS TIMESTAMP)))) div $unitMicros)"
    Some(part match {
      case "year" => s"CAST(year($e0) - year($s0) AS BIGINT)"
      case "quarter" =>
        s"CAST((year($e0) * 4 + quarter($e0)) - (year($s0) * 4 + quarter($s0)) AS BIGINT)"
      case "month" =>
        s"CAST((year($e0) * 12 + month($e0)) - (year($s0) * 12 + month($s0)) AS BIGINT)"
      case "week" =>
        s"CAST(datediff(date_trunc('week', $e0), date_trunc('week', $s0)) / 7 AS BIGINT)"
      case "day" => s"CAST(datediff($e0, $s0) AS BIGINT)"
      case "hour" => truncDiff("hour", 3600000000L)
      case "minute" => truncDiff("minute", 60000000L)
      case "second" => truncDiff("second", 1000000L)
      case "millisecond" => truncDiff("millisecond", 1000L)
      case "microsecond" => truncDiff("microsecond", 1L)
      case other => throw new IllegalArgumentException(
        s"date_diff part '$other' is not supported by the dialect shim " +
          "(year/quarter/month/week/day/hour/minute/second/millisecond/microsecond)")
    })
  }

  /** strftime/strptime: identify the %-format literal among the two args
    * (DuckDB order (value, fmt); sqlite order (fmt, value)); convert it;
    * emit target(value, 'converted'). */
  private def fmtCall(target: String)(args: Seq[String]): String = {
    require(args.size == 2,
      s"strftime/strptime: expected 2 arguments, got ${args.size}")
    def isFmtLiteral(a: String) =
      a.startsWith("'") && a.endsWith("'") && a.contains("%")
    val (value, fmt) =
      if (isFmtLiteral(args(1))) (args(0), args(1))
      else if (isFmtLiteral(args(0))) (args(1), args(0))
      else throw new IllegalArgumentException(
        s"strftime/strptime: no %-format string literal among ($args)")
    // the converted pattern may itself contain single quotes (literal
    // runs) — double them so the emitted SQL string literal stays valid
    val pattern = convertFormat(fmt.substring(1, fmt.length - 1))
    s"$target($value, '${pattern.replace("'", "''")}')"
  }

  /** C-style strftime format → Spark datetime pattern: %-codes map via
    * [[fmtCodes]]; runs of literal letters are wrapped in ONE quoted
    * section (per-letter quoting would read 'a''b' as the literal a'b —
    * '' is an escaped quote inside a pattern). */
  private[graft] def convertFormat(fmt: String): String = {
    val b = new StringBuilder
    val lit = new StringBuilder // pending literal run that needs quoting
    def flush(): Unit = if (lit.nonEmpty) {
      b.append('\'').append(lit.toString.replace("'", "''")).append('\'')
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt(i)
      if (c == '%') {
        if (i + 1 >= fmt.length) throw new IllegalArgumentException(
          "strftime format ends with a bare %")
        val code = fmt(i + 1)
        flush()
        b.append(fmtCodes.getOrElse(code, throw new IllegalArgumentException(
          s"strftime format code %$code has no Spark pattern mapping")))
        i += 2
      } else if (c.isLetter || c == '\'') { lit.append(c); i += 1 }
      else { flush(); b.append(c); i += 1 }
    }
    flush()
    b.toString
  }

  private val IntervalRe =
    "(?i)^INTERVAL\\s+'?(\\d+)\\s*(second|minute|hour|day|week|month|year)s?'?$".r

  /** time_bucket(INTERVAL 'N unit', ts): single whole units become
    * date_trunc; N-multiples of second/minute/hour/day become
    * epoch-floor arithmetic (both engines bucket these relative to an
    * epoch-aligned origin). */
  /** DuckDB's string_split splits on a LITERAL delimiter; Spark's split
    * takes a Java REGEX — so the old token rename silently broke any
    * metachar delimiter (measured: string_split('a.b.c', '.') is
    * ['a','b','c'] in DuckDB but six empty strings through a bare
    * split-on-'.'). A literal delimiter is regex-escaped per character;
    * a non-literal delimiter expression throws (wrapping an arbitrary
    * expression in \Q..\E would itself break on values containing \E —
    * bounded, never silently wrong). With the escape in place the edge
    * behaviors are measured identical: trailing empties kept, empty
    * delimiter splits per character, empty input gives [''], and
    * consecutive delimiters yield empty middle elements. */
  private def stringSplitCall(args: Seq[String]): String = {
    require(args.size == 2, s"string_split: expected 2 arguments, got ${args.size}")
    val d = args(1).trim
    // STRICT quoted-literal pattern (doubled '' is the only interior
    // quote): the greedy (?s)^'(.*)'$ also matched non-literal
    // expressions that merely start and end with a quote, e.g.
    // `'a' || 'b'`, silently splitting on the wrong delimiter instead
    // of taking the documented non-literal throw below.
    "(?s)^'((?:[^']|'')*)'$".r.findFirstMatchIn(d) match {
      case Some(m) =>
        val raw = m.group(1).replace("''", "'")
        val meta = "\\^$.|?*+()[]{}"
        val escaped = raw.flatMap(c =>
          if (meta.indexOf(c.toInt) >= 0) s"\\$c" else c.toString)
        // SQL literal image: Spark string literals themselves treat
        // backslash as an escape, so each regex backslash doubles again
        val sqlLit = "'" + escaped.replace("\\", "\\\\").replace("'", "''") + "'"
        s"split(${args(0)}, $sqlLit)"
      case None => throw new IllegalArgumentException(
        "string_split: only a string-literal delimiter is supported by the dialect shim " +
          "(a non-literal delimiter cannot be regex-quoted safely)")
    }
  }

  /** DuckDB's list_slice(l, b, e) takes a 1-based INCLUSIVE end index
    * (negative indexes count from the end, 0 behaves as 1, out-of-range
    * bounds clamp — all measured), while Spark's slice takes a LENGTH —
    * the old token rename silently returned one extra element for every
    * positive-end call (round 14). Translated positionally:
    * start = clamp(b), length = max(0, pos(e) − pos(b) + 1). The 3-arg
    * step form throws. */
  private def listSliceCall(args: Seq[String]): String = {
    require(args.size == 3,
      s"list_slice: expected (list, begin, end) — got ${args.size} arguments " +
        "(the 4-arg step form is not supported)")
    val l = args(0).trim
    val b = s"(${args(1).trim})"
    val e = s"(${args(2).trim})"
    val pb = s"(CASE WHEN $b < 0 THEN greatest(1, size($l) + $b + 1) ELSE greatest(1, $b) END)"
    val pe = s"(CASE WHEN $e < 0 THEN size($l) + $e + 1 ELSE $e END)"
    s"slice($l, $pb, greatest(0, $pe - $pb + 1))"
  }

  /** DuckDB's list_distinct REMOVES NULL elements (measured:
    * list_distinct([1,NULL,1,2,NULL]) = [2,1]); a bare array_distinct
    * keeps one NULL. The rewrite filters NULLs first. Element ORDER is
    * an ACCEPTANCE bound (the USING SAMPLE precedent): DuckDB returns
    * hash order ([3,1,3,2] → [2,1,3] — measured, not first-occurrence),
    * Spark first-occurrence order — both are "the distinct elements",
    * deterministically per engine, but not bit-identical; wrap in
    * list_sort for a cross-engine-stable spelling. */
  private def listDistinctCall(args: Seq[String]): String = {
    require(args.size == 1, s"list_distinct: expected 1 argument, got ${args.size}")
    s"array_distinct(filter(${args(0).trim}, __ls_t -> __ls_t IS NOT NULL))"
  }

  /** DuckDB's array_to_string returns NULL when the list has NO
    * non-null elements — empty list, [NULL], or a NULL list — and joins
    * the non-null elements otherwise (measured: [''] gives '', ['','x']
    * gives '+x', [NULL,'x'] gives 'x'). Spark's array_join returns ''
    * for the empty cases, so the bare rename (round-14 dlst fuzz,
    * seed 14011, 2/300) silently turned NULL into ''. Both engines skip
    * NULL elements once something non-null remains. */
  private def arrayToStringCall(args: Seq[String]): String = {
    require(args.size == 2, s"array_to_string: expected 2 arguments, got ${args.size}")
    val l = args(0).trim
    s"(CASE WHEN size(filter($l, __ats_t -> __ats_t IS NOT NULL)) = 0 THEN NULL " +
      s"ELSE array_join($l, ${args(1).trim}) END)"
  }

  /** DuckDB's list_concat treats a NULL side as EMPTY (measured:
    * list_concat(NULL, [1,2]) = [1,2]; both-NULL = NULL), while Spark's
    * concat is NULL-propagating — the bare rename silently nulled any
    * concat with one NULL side (round 14). Exactly two arguments in
    * DuckDB 1.0 (the variadic spelling is a binder error there too).
    *
    * DUPLICATION BOUND (applies here, to arrayToStringCall and to
    * listSliceCall): each argument's TEXT is spliced into the rewritten
    * expression more than once (NULL guard + value branch). For
    * deterministic arguments Spark's subexpression elimination folds the
    * copies; a NONDETERMINISTIC argument (rand() inside the list expr)
    * is evaluated per splice and the guard can diverge from the value —
    * same class of bound as the non-literal string_split throw, accepted
    * because DuckDB's own list functions are only defined on
    * deterministic inputs in our oracle surface. Deep textual nesting of
    * these calls also grows the rewritten SQL geometrically; the
    * rewriteCalls 100-iteration guard aborts loudly rather than hanging. */
  private def listConcatCall(args: Seq[String]): String = {
    require(args.size == 2, s"list_concat: expected 2 arguments, got ${args.size}")
    val a = s"(${args(0).trim})"
    val b = s"(${args(1).trim})"
    s"(CASE WHEN $a IS NULL THEN $b WHEN $b IS NULL THEN $a ELSE concat($a, $b) END)"
  }

  private def timeBucket(args: Seq[String]): String = {
    require(args.size == 2 || args.size == 3,
      s"time_bucket: expected 2 or 3 arguments, got ${args.size}")
    val ts = args(1)
    val origin = args.lift(2).map(_.trim)
    args(0).trim match {
      case IntervalRe(n, unit) =>
        val cnt = n.toLong
        val u = unit.toLowerCase
        // Explicit-origin form (round 13). Measured on DuckDB 1.0:
        // second-granularity buckets keep the origin's FULL sub-bucket
        // offset (3-day origin 2024-01-02 12:00 → boundaries at 12:00),
        // month-granularity buckets truncate the origin to its month
        // start (origin 2024-02-15 06:00 → boundaries 02-01, 04-01, …),
        // and instants before the origin floor downward in both.
        if (origin.isDefined && (u == "month" || u == "year")) {
          val nM = if (u == "year") cnt * 12 else cnt
          val o = origin.get
          val md = s"(((year($ts) - year($o)) * 12 + month($ts) - month($o)))"
          s"CAST(add_months(date_trunc('month', $o), $md - pmod($md, $nM)) AS TIMESTAMP)"
        } else if (origin.isDefined) {
          val secs = u match {
            case "second" => 1L
            case "minute" => 60L
            case "hour" => 3600L
            case "day" => 86400L
            case "week" => 604800L
            case other => throw new IllegalArgumentException(
              s"time_bucket: unsupported origin-form unit $other")
          }
          val w = cnt * secs
          val o = origin.get
          val oe = s"unix_timestamp($o)"
          s"timestamp_seconds(CAST(FLOOR((unix_timestamp($ts) - $oe) / $w) AS BIGINT) * $w + $oe)"
        } else if (cnt == 1L)
          s"date_trunc('$u', $ts)"
        else if (u == "month" || u == "year") {
          // DuckDB aligns month-granularity buckets to origin 2000-01-01
          // and floors toward it (measured: 2-month bucket of 1999-02-03
          // → 1999-01-01; 2-year of 1997-07-14 → 1996-01-01). Months
          // since the origin, floored with pmod so pre-2000 instants
          // round DOWN, then re-anchored with add_months.
          val n = if (u == "year") cnt * 12 else cnt
          val mm = s"((year($ts) - 2000) * 12 + month($ts) - 1)"
          s"CAST(add_months(DATE '2000-01-01', $mm - pmod($mm, $n)) AS TIMESTAMP)"
        } else {
          val secs = u match {
            case "second" => 1L
            case "minute" => 60L
            case "hour" => 3600L
            case "day" => 86400L
            case "week" => 604800L
            case other => throw new IllegalArgumentException(
              s"time_bucket: unsupported unit $other")
          }
          val w = cnt * secs
          // DuckDB aligns EVERY sub-month no-origin bucket to origin
          // 2000-01-03 00:00:00 UTC (946857600 s — its documented
          // default origin, measured here on 2-day/5-hour/90-minute/
          // 7-second/2-week widths incl. pre-origin floors). The shim's
          // previous epoch alignment agreed only for widths DIVIDING
          // 946857600 — true of every width the dtb fuzz kind happened
          // to draw (300/900/3600/86400 s), false for e.g. 5-hour or
          // 2-day buckets (round 14). FLOOR of the double quotient is
          // exact: both operands stay far below 2^53.
          s"timestamp_seconds(CAST(FLOOR((unix_timestamp($ts) - 946857600) / $w) " +
            s"AS BIGINT) * $w + 946857600)"
        }
      case other => throw new IllegalArgumentException(
        s"time_bucket: first argument must be an INTERVAL literal, got $other")
    }
  }
}
