package graft.engine

/** NL→SQL generation seam (SURVEY.md §2 Tier A13).
  *
  * The reference calls Gemini with a schema-grounded prompt
  * (/root/reference/doc.py:172–205). This environment is zero-egress, so
  * the generator is a trait: the *prompt contract* (fixed table name,
  * SELECT-only, dialect pin, schema + head-rows grounding) is ported, the
  * transport is pluggable, and the default implementation is a
  * deterministic stub covering the reference's documented example
  * questions (/root/reference/WEB_APP_README.md:107–119 shapes).
  */
trait SqlGenerator {
  /** `table` is the view the SQL must target. The reference gets
    * isolation from a per-file DuckDB database (doc.py:112–119) so its
    * fixed name never collides; on one shared SparkSession the caller
    * passes a per-request view name instead (WebServer) or the fixed
    * default (single-user CLI). */
  def generate(question: String, info: DataInfo,
      table: String = Catalog.TableName): String

  /** Multi-source analysis (the reference's own roadmap item,
    * /root/reference/README.md:109–116 — its per-file single-table model
    * is a documented limitation): generate ONE SQL statement over N
    * registered tables, each `(viewName, info)`. Single-table calls
    * route to [[generate]] so existing generators keep their behavior. */
  def generateMulti(question: String, tables: Seq[(String, DataInfo)]): String =
    tables match {
      case Seq((t, info)) => generate(question, info, t)
      case _ => SqlGenerator.Stub.generateMulti(question, tables)
    }
}

object SqlGenerator {

  /** Select the generator from the environment, mirroring the
    * reference's `GEMINI_API_KEY` config surface (doc.py:13): a
    * non-blank key selects the live [[GeminiSqlGenerator]] transport
    * (model/endpoint overridable for proxied deployments); otherwise
    * the deterministic [[Stub]] — so this zero-egress build and its
    * tests never construct the HTTP client, and a deployment with
    * egress turns on live NL→SQL with one env var. */
  def fromEnv(env: Map[String, String] = sys.env): SqlGenerator =
    env.get("GEMINI_API_KEY").map(_.trim).filter(_.nonEmpty) match {
      case None => Stub
      case Some(key) =>
        new GeminiSqlGenerator(key,
          model = env.getOrElse("GRAFT_GEMINI_MODEL", "gemini-2.5-flash"),
          endpoint = env.getOrElse("GRAFT_GEMINI_ENDPOINT",
            "https://generativelanguage.googleapis.com/v1beta"))
    }

  /** Schema-grounded prompt (doc.py:174–190 analog, dialect = Spark SQL). */
  def buildPrompt(question: String, info: DataInfo,
      table: String = Catalog.TableName): String = {
    val cols = info.columns.map(c => s"  - $c: ${info.dtypes.getOrElse(c, "string")}").mkString("\n")
    val head = info.head.take(3).map(_.toString).mkString("\n")
    s"""You are a SQL generation assistant. Generate ONE Spark SQL query.
       |Rules:
       |  - The table name is fixed: '$table'.
       |  - Only SELECT statements are allowed (no DDL/DML).
       |  - The SQL must be valid Spark SQL.
       |  - Return only the SQL, no explanation.
       |Table: $table (${info.rowCount} rows, ${info.columnCount} columns)
       |Columns:
       |$cols
       |Sample rows:
       |$head
       |Question: $question
       |""".stripMargin
  }

  /** Multi-table prompt: same contract as [[buildPrompt]] with one
    * schema block per table and the join permission stated. */
  def buildPromptMulti(question: String,
      tables: Seq[(String, DataInfo)]): String = {
    val blocks = tables.map { case (t, info) =>
      val cols = info.columns.map(c =>
        s"  - $c: ${info.dtypes.getOrElse(c, "string")}").mkString("\n")
      val head = info.head.take(3).map(_.toString).mkString("\n")
      s"""Table: $t (${info.rowCount} rows, ${info.columnCount} columns)
         |Columns:
         |$cols
         |Sample rows:
         |$head""".stripMargin
    }.mkString("\n\n")
    s"""You are a SQL generation assistant. Generate ONE Spark SQL query.
       |Rules:
       |  - Only these table names exist: ${tables.map(_._1).mkString(", ")}.
       |  - Tables may be JOINed on matching columns when the question spans them.
       |  - Only SELECT statements are allowed (no DDL/DML).
       |  - The SQL must be valid Spark SQL.
       |  - Return only the SQL, no explanation.
       |$blocks
       |Question: $question
       |""".stripMargin
  }

  /** Deterministic keyword-routed stub for the zero-egress environment.
    * Shapes mirror the reference's acceptance questions; fallback mirrors
    * doc.py:188's `SELECT *` default.
    */
  object Stub extends SqlGenerator {
    def generate(question: String, info: DataInfo, table: String): String = {
      val q = question.toLowerCase
      val t = table
      def has(c: String) = info.columns.contains(c)
      if ((q.contains("城市") || q.contains("city")) && has("customer_city"))
        s"SELECT customer_city, SUM(price * quantity) AS total_sales FROM $t GROUP BY customer_city ORDER BY total_sales DESC"
      else if ((q.contains("销售额") || q.contains("revenue") || q.contains("top")) && has("price") && has("quantity"))
        s"SELECT product_name, SUM(price * quantity) AS total_revenue FROM $t GROUP BY product_name ORDER BY total_revenue DESC LIMIT 5"
      else if ((q.contains("数量") || q.contains("quantity")) && has("quantity"))
        s"SELECT * FROM $t WHERE quantity > 2"
      else if ((q.contains("佣金") || q.contains("commission")) && has("commission_rate"))
        s"SELECT sales_rep, AVG(commission_rate) AS avg_commission FROM $t GROUP BY sales_rep ORDER BY avg_commission DESC"
      else if (q.contains("品牌") && has("brand"))
        s"SELECT brand, COUNT(*) AS n FROM $t GROUP BY brand ORDER BY n DESC"
      else if (q.contains("评分") && has("rating"))
        s"SELECT * FROM $t WHERE rating > 4.5"
      else if (q.contains("库存") && has("stock"))
        s"SELECT * FROM $t WHERE stock < 30"
      // ---- north-star routes (round 15): the shell's e2e path must
      // reach the LLM-data-pipeline surface, not just Tier-B shapes.
      // Each emits the corresponding operator family's SQL twin over
      // whatever uploaded table carries the needed columns.
      else if ((q.contains("duplicate") || q.contains("dedup") || q.contains("重复"))
          && has("text"))
        // q_dedup_exact's dashboard number: canonical-hash distinct rate
        s"SELECT COUNT(*) AS n_docs, " +
          s"COUNT(DISTINCT md5(lower(trim(text)))) AS n_unique, " +
          s"ROUND(1.0 - COUNT(DISTINCT md5(lower(trim(text)))) / COUNT(*), 4) AS dup_rate " +
          s"FROM $t"
      else if ((q.contains("data card") || q.contains("datacard") ||
          q.contains("per source") || q.contains("数据卡")) && has("source"))
        // q_corpus_datacard's per-source panel
        s"SELECT source, COUNT(*) AS n_docs" +
          (if (has("n_chars")) ", SUM(n_chars) AS total_chars, ROUND(AVG(n_chars), 2) AS avg_chars"
           else "") +
          s" FROM $t GROUP BY source ORDER BY n_docs DESC, source"
      else if (q.contains("attribut") && has("event_type") && has("user_id") && has("ts"))
        // q_events_attribution's single-pass last-touch window
        s"SELECT event_id, user_id, " +
          s"CASE WHEN mkt_ts >= ts - INTERVAL 1 HOUR THEN mkt_id END AS attributed_id " +
          s"FROM (SELECT event_id, user_id, event_type, ts, " +
          s"last_value(CASE WHEN event_type IN ('view', 'click') THEN event_id END) " +
          s"IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts, event_id " +
          s"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mkt_id, " +
          s"last_value(CASE WHEN event_type IN ('view', 'click') THEN ts END) " +
          s"IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts, event_id " +
          s"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mkt_ts FROM $t) s " +
          s"WHERE event_type = 'purchase' ORDER BY event_id"
      else if ((q.contains("language") || q.contains("语言")) && has("lang"))
        // q_corpus_drift's input panel: the corpus language mix
        s"SELECT lang, COUNT(*) AS n, " +
          s"ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 2) AS pct " +
          s"FROM $t GROUP BY lang ORDER BY n DESC, lang"
      else
        s"SELECT * FROM $t LIMIT 10" // doc.py:188 fallback analog
    }

    /** Deterministic cross-table shape: join the first two tables on
      * their first shared column name; aggregate a numeric column of the
      * second table when the question asks for totals, else count
      * matches. Bounded and explicit — a question over tables with no
      * shared column fails loudly rather than guessing a cross join. */
    override def generateMulti(question: String,
        tables: Seq[(String, DataInfo)]): String = tables match {
      case Seq((t, info)) => generate(question, info, t)
      case Seq((t1, i1), (t2, i2), _*) =>
        val common = i1.columns.filter(i2.columns.contains)
        require(common.nonEmpty,
          s"no shared column between $t1 and $t2 to join on")
        val k = common.head
        val q = question.toLowerCase
        val numeric = Set("double", "float", "int", "long", "bigint", "decimal")
        val v = i2.columns.find(c => c != k &&
          numeric.exists(i2.dtypes.getOrElse(c, "").toLowerCase.contains))
        v match {
          case Some(m) if q.contains("total") || q.contains("sum") ||
              q.contains("总") || q.contains("合计") =>
            s"SELECT a.$k AS $k, SUM(b.$m) AS total_$m FROM $t1 a " +
              s"JOIN $t2 b ON a.$k = b.$k GROUP BY a.$k ORDER BY total_$m DESC"
          case _ =>
            s"SELECT a.$k AS $k, COUNT(*) AS n FROM $t1 a " +
              s"JOIN $t2 b ON a.$k = b.$k GROUP BY a.$k ORDER BY n DESC, $k"
        }
    }
  }
}
