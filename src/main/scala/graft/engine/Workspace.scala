package graft.engine

import java.nio.file.{Files, Path, Paths}

/** Upload workspace (SURVEY.md §2 Tier A14;
  * /root/reference/app.py:113–168 analog): validate extension against
  * the ingest whitelist, enforce the 16 MB cap, store under a
  * timestamped unique name, delete on downstream failure.
  */
object Workspace {
  val MaxUploadBytes: Long = 16L * 1024 * 1024 // app.py:20 analog

  /** Sanitized filename (secure_filename analog): strip path components
    * and anything outside [A-Za-z0-9._-]. */
  def secureName(name: String): String = {
    val base = Paths.get(name).getFileName.toString
    val cleaned = base.replaceAll("[^A-Za-z0-9._一-鿿-]", "_")
    if (cleaned.isEmpty || cleaned.startsWith(".")) s"upload$cleaned" else cleaned
  }

  /** Save uploaded bytes; returns the stored path.
    * Throws IllegalArgumentException on bad extension / size. */
  def saveUpload(bytes: Array[Byte], originalName: String, uploadDir: String,
      now: Long): Path = {
    val ext = Ingest.extension(originalName)
    require(Ingest.SupportedExtensions.contains(ext),
      s"Unsupported file type: .$ext")
    require(bytes.length <= MaxUploadBytes,
      s"File too large: ${bytes.length} bytes (max $MaxUploadBytes)")
    Files.createDirectories(Paths.get(uploadDir))
    val target = Paths.get(uploadDir, s"${now}_${secureName(originalName)}")
    Files.write(target, bytes)
    target
  }

  /** Save + analyze; the upload is deleted if analysis fails
    * (app.py:137–141 cleanup analog). No fixed-name view registration:
    * the web tier serves concurrent sessions off one SparkSession, so
    * queries always target per-request views (WebServer.ask_question),
    * never shared global state. */
  def uploadAndAnalyze(spark: org.apache.spark.sql.SparkSession,
      bytes: Array[Byte], originalName: String, uploadDir: String,
      now: Long): (Path, DataInfo) = {
    val path = saveUpload(bytes, originalName, uploadDir, now)
    try (path, Catalog.analyzeFile(spark, path.toString, registerView = false))
    catch { case e: Throwable => Files.deleteIfExists(path); throw e }
  }
}
