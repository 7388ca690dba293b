package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session/file/chat metadata store (SURVEY.md §2 Tier A15 + Tier C).
  *
  * The reference keeps sessions, uploaded files, and chat history in a
  * three-table SQLite database (/root/reference/database.py:12–269).
  * Spark-native analog: three append-only parquet tables under a store
  * directory, with the same query surface — including the Tier-C SQL
  * shapes the reference actually runs (chat history = LEFT JOIN files,
  * database.py:189–195; session list = two LEFT JOINs + per-group MAX +
  * COUNT, database.py:217–232).
  *
  * Append-only parquet trades SQLite's in-place UPDATE for immutable
  * adds — the natural durable form for this engine; at scale the same
  * layout partitions by session.
  */
class MetaStore(spark: SparkSession, dir: String) {
  import spark.implicits._

  private def path(t: String) = s"$dir/$t.parquet"
  private def readOpt(t: String): Option[DataFrame] =
    if (new java.io.File(path(t)).exists) Some(spark.read.parquet(path(t))) else None

  /** Serialized per store: concurrent web requests appending to the
    * same parquet directory would race on the output-commit protocol
    * (both writers claim the same temporary dir). The lock covers
    * the tiny metadata write only, never a user query. */
  private val writeLock = new Object
  private def append(t: String, df: DataFrame): Unit =
    writeLock.synchronized { df.write.mode("append").parquet(path(t)) }

  def createSession(sessionId: String, now: Long): Unit =
    append("sessions", Seq((sessionId, new java.sql.Timestamp(now)))
      .toDF("session_id", "created_at"))

  def addFile(fileId: String, sessionId: String, filename: String,
      filepath: String, dataInfoJson: String, now: Long): Unit =
    append("files", Seq((fileId, sessionId, filename, filepath, dataInfoJson,
      new java.sql.Timestamp(now)))
      .toDF("file_id", "session_id", "filename", "filepath", "data_info", "created_at"))

  def addChat(chatId: String, sessionId: String, fileId: String,
      question: String, sql: String, resultMd: String, now: Long): Unit =
    append("chats", Seq((chatId, sessionId, fileId, question, sql, resultMd,
      new java.sql.Timestamp(now)))
      .toDF("chat_id", "session_id", "file_id", "question", "sql", "result_md", "ts"))

  def getFile(fileId: String): Option[org.apache.spark.sql.Row] =
    readOpt("files").flatMap(f =>
      f.filter(col("file_id") === fileId).collect().headOption)

  /** Files of a session, newest first (database.py:107–112 analog). */
  def filesForSession(sessionId: String): DataFrame =
    readOpt("files").getOrElse(emptyFiles)
      .filter(col("session_id") === sessionId)
      .orderBy(col("created_at").desc, col("file_id"))

  /** Chat history with file names — LEFT JOIN files, ordered ascending
    * (database.py:189–195 analog). */
  def chatHistory(sessionId: String): DataFrame = {
    val chats = readOpt("chats").getOrElse(emptyChats)
    val files = readOpt("files").getOrElse(emptyFiles)
      .select(col("file_id").as("f_id"), col("filename"))
    chats.filter(col("session_id") === sessionId)
      .join(files, chats("file_id") === col("f_id"), "left")
      .select(chats("chat_id"), chats("question"), chats("sql"),
        chats("result_md"), col("filename"), chats("ts"))
      .orderBy(col("ts").asc, col("chat_id"))
  }

  /** Session list with chat counts and last activity — two LEFT JOINs +
    * per-group MAX + COUNT (database.py:217–232 analog). */
  def sessionList(): DataFrame = {
    val sessions = readOpt("sessions").getOrElse(emptySessions)
    val chats = readOpt("chats").getOrElse(emptyChats)
    val lastChat = chats.groupBy(col("session_id").as("c_sid"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_chats"))
    val nFiles = readOpt("files").getOrElse(emptyFiles)
      .groupBy(col("session_id").as("f_sid")).agg(count(lit(1)).as("n_files"))
    sessions
      .join(lastChat, col("session_id") === col("c_sid"), "left")
      .join(nFiles, col("session_id") === col("f_sid"), "left")
      .select(col("session_id"), col("created_at"),
        coalesce(col("n_chats"), lit(0L)).as("n_chats"),
        coalesce(col("n_files"), lit(0L)).as("n_files"),
        coalesce(col("last_ts"), col("created_at")).as("last_activity"))
      .orderBy(col("last_activity").desc, col("session_id"))
  }

  private def emptySessions =
    Seq.empty[(String, java.sql.Timestamp)].toDF("session_id", "created_at")
  private def emptyFiles =
    Seq.empty[(String, String, String, String, String, java.sql.Timestamp)]
      .toDF("file_id", "session_id", "filename", "filepath", "data_info", "created_at")
  private def emptyChats =
    Seq.empty[(String, String, String, String, String, String, java.sql.Timestamp)]
      .toDF("chat_id", "session_id", "file_id", "question", "sql", "result_md", "ts")
}
