package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversation-export ingest (SURVEY.md §2.1 S1–S7, §3.1): raw Claude /
  * ChatGPT `conversations.json` exports → the normalized `conversations` and
  * `messages` tables of the reference (`uni_parse.py:22-63`).
  *
  * Spark-first shapes:
  *  - S1 streaming array reader → `spark.read.json` (schema-on-read with an
  *    explicit StructType, multiLine for one-big-array exports);
  *  - S3 Claude flatten → `posexplode(chat_messages)` (array position =
  *    order_index, `uni_parse.py:332`);
  *  - S4 ChatGPT tree → per-conversation BFS in a typed `flatMap` (the map
  *    of nodes is genuinely recursive — no relational equivalent; BFS
  *    traversal position = order_index, `uni_parse.py:502`);
  *  - S5 timestamp normalization → `to_timestamp` / `from_unixtime`;
  *  - S6 idempotent upsert → `dropDuplicates("id")` before an overwrite
  *    partitioned write;
  *  - S7 validation/repair → PERMISSIVE mode with `_corrupt_record`.
  */
object Ingest {

  // --- Claude dialect (uni_parse.py:260-335) ---

  val claudeSchema: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("name", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("account", StructType(Seq(StructField("uuid", StringType)))),
    StructField("chat_messages", ArrayType(StructType(Seq(
      StructField("uuid", StringType),
      StructField("sender", StringType),
      StructField("text", StringType),
      StructField("created_at", StringType)))))))

  /** ISO-8601 (Z → UTC) and epoch-seconds normalization (S5,
    * `uni_parse.py:510-544`) to the reference's `%Y-%m-%d %H:%M:%S` shape.
    * `try_`-variants throughout: under ANSI (Spark 4 default) the plain
    * `to_timestamp`/`cast` THROW on the respectively-other format instead of
    * returning null, so the coalesce would never reach its fallback.
    */
  private def normTs(c: org.apache.spark.sql.Column) =
    date_format(coalesce(
      try_to_timestamp(regexp_replace(c, "Z$", "+00:00")),
      to_timestamp(from_unixtime(c.try_cast("double").cast("long")))),
      "yyyy-MM-dd HH:mm:ss")

  def readClaude(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(claudeSchema).option("multiLine", "true").json(path)

  /** Claude conversations table (platform literal, account id, original id —
    * `uni_parse.py:279-295`).
    */
  def claudeConversations(raw: DataFrame): DataFrame =
    raw.select(
      col("uuid").as("id"),
      col("name").as("title"),
      lit("claude").as("platform"),
      normTs(col("created_at")).as("created_at"),
      normTs(col("updated_at")).as("updated_at"),
      col("account.uuid").as("account_id"),
      col("uuid").as("original_id"))
      .dropDuplicates("id")

  /** Claude messages: one row per chat_messages element, array position as
    * order_index (`uni_parse.py:317-335`), content truncated at 100k chars
    * (`uni_parse.py:497-499`).
    */
  def claudeMessages(raw: DataFrame): DataFrame =
    raw.select(col("uuid").as("conversation_id"),
        posexplode(col("chat_messages")).as(Seq("order_index", "m")))
      .select(
        col("m.uuid").as("id"),
        col("conversation_id"),
        lit(null).cast(StringType).as("parent_id"),
        col("m.sender").as("sender"),
        col("m.sender").as("role"),
        substring(col("m.text"), 1, 100000).as("content"),
        normTs(col("m.created_at")).as("created_at"),
        lit("claude").as("model"),
        col("order_index").cast(IntegerType).as("order_index"))
      .dropDuplicates("id")

  // --- ChatGPT dialect (uni_parse.py:337-508) ---

  case class MessageRow(id: String, conversation_id: String, parent_id: String,
                        sender: String, role: String, content: String,
                        created_at: String, model: String, order_index: Int)

  val chatgptSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("create_time", DoubleType),
    StructField("update_time", DoubleType),
    StructField("mapping", MapType(StringType, StructType(Seq(
      StructField("parent", StringType),
      StructField("children", ArrayType(StringType)),
      StructField("message", StructType(Seq(
        StructField("author", StructType(Seq(StructField("role", StringType)))),
        StructField("content", StructType(Seq(
          StructField("parts", ArrayType(StringType))))),
        StructField("create_time", DoubleType),
        StructField("metadata", StructType(Seq(
          StructField("model_slug", StringType)))))))))))))

  def readChatgpt(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(chatgptSchema).option("multiLine", "true").json(path)

  private def fmtEpoch(t: Option[Double]): String =
    t.map { secs =>
      java.time.LocalDateTime.ofEpochSecond(secs.toLong, 0, java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    }.orNull

  def chatgptConversations(raw: DataFrame): DataFrame =
    raw.select(
      col("id"),
      col("title"),
      lit("chatgpt").as("platform"),
      date_format(to_timestamp(from_unixtime(col("create_time").cast("long"))),
        "yyyy-MM-dd HH:mm:ss").as("created_at"),
      date_format(to_timestamp(from_unixtime(col("update_time").cast("long"))),
        "yyyy-MM-dd HH:mm:ss").as("updated_at"),
      lit(null).cast(StringType).as("account_id"),
      col("id").as("original_id"))
      .dropDuplicates("id")

  /** BFS flatten of the ChatGPT message tree (S4): start from the parentless
    * root, traverse children in order, emit role-bearing nodes with BFS
    * position as order_index — `uni_parse.py:380-508`. Role normalization
    * user→human, rest kept (`uni_parse.py:448-452`); content =
    * `content.parts` head; model = `metadata.model_slug`.
    */
  def chatgptMessages(spark: SparkSession, raw: DataFrame): Dataset[MessageRow] = {
    import spark.implicits._
    val typed = raw.select(col("id"), col("title"),
        col("create_time"), col("update_time"),
        col("mapping").as("rawMapping"))
      .withColumnRenamed("rawMapping", "mapping")
      .as[(String, String, Option[Double], Option[Double], Map[String, GptRawNode])]
    typed.flatMap { case (convId, _, _, _, mapping) =>
      val roots = mapping.collect { case (k, v) if v.parent == null => k }.toSeq.sorted
      val queue = scala.collection.mutable.Queue[String](roots: _*)
      val seen = scala.collection.mutable.Set[String]()
      val out = scala.collection.mutable.ArrayBuffer[MessageRow]()
      var order = 0
      while (queue.nonEmpty) {
        val nodeId = queue.dequeue()
        if (!seen.contains(nodeId)) {
          seen += nodeId
          mapping.get(nodeId).foreach { node =>
            Option(node.message).foreach { m =>
              val role = Option(m.author).map(_.role).orNull
              if (role != null) {
                val sender = if (role == "user") "human" else role
                val content = Option(m.content).flatMap(c => Option(c.parts))
                  .flatMap(_.headOption).getOrElse("")
                out += MessageRow(
                  id = nodeId,
                  conversation_id = convId,
                  parent_id = node.parent,
                  sender = sender,
                  role = role,
                  content = content.take(100000),
                  created_at = fmtEpoch(m.create_time),
                  model = Option(m.metadata).flatMap(md => Option(md.model_slug)).getOrElse("unknown"),
                  order_index = order)
                order += 1
              }
            }
            Option(node.children).getOrElse(Seq.empty).foreach(queue.enqueue(_))
          }
        }
      }
      out
    }
  }

  case class GptRawAuthor(role: String)
  case class GptRawContent(parts: Seq[String])
  case class GptRawMeta(model_slug: String)
  case class GptRawMessage(author: GptRawAuthor, content: GptRawContent,
                           create_time: Option[Double], metadata: GptRawMeta)
  case class GptRawNode(parent: String, children: Seq[String], message: GptRawMessage)

  case class TreeStats(conversation_id: String, n_nodes: Long, n_roots: Long,
                       n_leaves: Long, n_branching: Long, max_fanout: Long,
                       max_depth: Long)

  /** i2: per-conversation tree-shape statistics over the raw ChatGPT
    * mapping — S4's graph summarized instead of flattened: node / root /
    * leaf / branching-node counts, max fan-out, and BFS depth (root
    * level = 1). Each conversation's tree lives inside its own row, so
    * the computation is a row-local `map` — embarrassingly parallel at
    * any scale, no join and no shuffle. The oracle replays the same walk
    * as a recursive CTE over the exploded mapping, so levels count every
    * child id a node lists (a well-formed export only lists existing
    * nodes; traversal expands only through existing ones).
    */
  def chatgptTreeStats(spark: SparkSession, raw: DataFrame): Dataset[TreeStats] = {
    import spark.implicits._
    val typed = raw.dropDuplicates("id").select(col("id"), col("mapping"))
      .as[(String, Map[String, GptRawNode])]
    typed.map { case (convId, rawMapping) =>
      // a conversation without a mapping key decodes to null: degenerate
      // stats row, not a task NPE
      val mapping = Option(rawMapping).getOrElse(Map.empty[String, GptRawNode])
      def childrenOf(id: String): Seq[String] =
        mapping.get(id).flatMap(n => Option(n.children)).getOrElse(Seq.empty)
      val roots = mapping.collect { case (k, v) if v.parent == null => k }.toSeq
      var depth = 0L
      var frontier = roots
      val seen = scala.collection.mutable.Set[String]()
      while (frontier.nonEmpty) {
        depth += 1
        seen ++= frontier
        frontier = frontier.flatMap(childrenOf).distinct.filterNot(seen.contains)
      }
      val fanouts = mapping.values.map(n => Option(n.children).map(_.size).getOrElse(0))
      TreeStats(convId,
        n_nodes = mapping.size.toLong,
        n_roots = roots.size.toLong,
        n_leaves = fanouts.count(_ == 0).toLong,
        n_branching = fanouts.count(_ >= 2).toLong,
        max_fanout = if (fanouts.isEmpty) 0L else fanouts.max.toLong,
        max_depth = depth)
    }
  }

  def qTreeStats(spark: SparkSession, sfDir: String): DataFrame =
    chatgptTreeStats(spark,
      readChatgpt(spark, s"$FixtureDir/chatgpt_export.json")).toDF()

  /** i5: the same tree statistics over the ~100× generated fixture
    * (`tools/gen_large_export.py`) — 200 conversations with branching
    * trees, the non-trivial ingest bench row.
    */
  def qTreeStatsLarge(spark: SparkSession, sfDir: String): DataFrame =
    chatgptTreeStats(spark,
      readChatgpt(spark, s"$FixtureDir/large/chatgpt_export.json")).toDF()

  // --- S2 platform detection + S7 validation ---

  /** Dialect sniff (S2, `uni_parse.py:88-123`): presence of the marker keys. */
  def detectPlatform(spark: SparkSession, path: String): String = {
    val head = spark.read.text(path).limit(100)
      .collect().map(_.getString(0)).mkString("\n").take(4000)
    if (head.contains("\"chat_messages\"")) "claude"
    else if (head.contains("\"mapping\"")) "chatgpt"
    else "unknown"
  }

  /** S2 (oracle form, i6): the dialect sniff over both committed raw
    * exports as a dumpable table — one row per fixture with the platform
    * [[detectPlatform]] reports. The DuckDB oracle re-sniffs the same
    * files independently (`read_text`, same first-100-lines/4000-char
    * window, same marker keys), so a hash match verifies the detection
    * logic end to end rather than trusting the Scala constant.
    */
  def qDetectPlatform(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Seq("claude_export.json", "chatgpt_export.json")
      .map(f => (f, detectPlatform(spark, s"$FixtureDir/$f")))
      .toDF("fixture", "detected_platform")
  }

  /** Validation read (S7, `json_clean.py`): PERMISSIVE parse keeping corrupt
    * records for a structure report.
    */
  def validateJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // Spark disallows queries touching only the corrupt-record column on a
      // raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); cache the parsed
      // result so validation reports can filter on it.
      .cache()

  /** S7 (report form, oracle-checkable): per-record validation over a
    * line-delimited export — one row per input line with the parsed id
    * (valid rows only; PERMISSIVE mode may salvage leading fields of a
    * truncated record, which an oracle can't reproduce, so corrupt rows
    * report a null id), a validity flag, and the message count. The scan is
    * a stateless per-line parse: embarrassingly parallel at any scale and
    * streaming-compatible.
    */
  def validationReport(spark: SparkSession, path: String): DataFrame =
    validateJson(spark, path, claudeSchema)
      .select(
        when(col("_corrupt_record").isNull, col("uuid")).as("id"),
        col("_corrupt_record").isNull.as("valid"),
        when(col("_corrupt_record").isNull,
          coalesce(size(col("chat_messages")), lit(0)).cast("long")).as("n_messages"))

  /** i3: validation report over the committed corrupt JSONL fixture (4 of
    * its 11 lines are invalid: plain garbage, a truncated record, an
    * unbalanced value, and a bare scalar — valid JSON but not an object,
    * so struct parsing rejects it).
    */
  def qValidationReport(spark: SparkSession, sfDir: String): DataFrame =
    validationReport(spark, s"$FixtureDir/claude_export_corrupt.jsonl")

  case class RepairResult(success: Boolean, message: String, items: Int,
                          outputPath: Option[String], droppedChars: Int = 0)

  /** S7 (active repair): best-effort fixer for a malformed one-big-array
    * JSON export, the `json_clean.py:105-230` behavior re-expressed as a
    * constant-memory streaming pass: require the file to start with `[` and
    * end with `]`, then scan character-by-character tracking string /
    * escape / brace state, buffer each complete top-level `{...}` object,
    * and emit the objects with exactly one comma between them — repairing
    * missing commas, doubled commas, and trailing commas. Like the
    * reference, stray non-whitespace characters *between* objects are
    * carried into the next object's buffer (quirk preserved): if the stray
    * text merely prefixes the next object it corrupts that object and the
    * final validation pass fails; if it unbalances the brace/quote state
    * (a lone `}`, an unterminated string) everything after it stays
    * buffered to EOF and would be *silently dropped while the output
    * validates clean* — so the repair additionally reports any unflushed
    * tail as `droppedChars` and refuses success when content was lost.
    * The fixed file is re-validated with a streaming token parse (no DOM),
    * so arbitrarily large exports repair in O(1) memory.
    *
    * This is a driver-side single-file utility by design (one export file,
    * inherently sequential char-level state); the *distributed* validation
    * path for line-delimited corpora is [[validationReport]].
    */
  def repairJsonArray(inPath: String, outPath0: String = null): RepairResult = {
    val outPath = Option(outPath0).getOrElse {
      val dot = inPath.lastIndexOf('.')
      if (dot > 0) inPath.substring(0, dot) + "_fixed" + inPath.substring(dot)
      else inPath + "_fixed"
    }
    val in = new java.io.File(inPath)
    if (!in.isFile) return RepairResult(false, s"no such file: $inPath", 0, None)
    def reader() = new java.io.BufferedReader(new java.io.InputStreamReader(
      new java.io.FileInputStream(in),
      java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)))
    // precheck in ONE pass: first char '[' and last non-space char ']'
    val r0 = reader()
    val (firstChar, lastChar) = try {
      val first = r0.read()
      var last = if (first != -1 && !Character.isWhitespace(first)) first else -1
      var c = if (first == -1) -1 else r0.read()
      while (c != -1) { if (!Character.isWhitespace(c)) last = c; c = r0.read() }
      (first, last)
    } finally r0.close()
    if (firstChar != '[')
      return RepairResult(false, "File doesn't start with '['", 0, None)
    if (lastChar != ']')
      return RepairResult(false, "File doesn't end with ']'", 0, None)
    val r = reader()
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(outPath), java.nio.charset.StandardCharsets.UTF_8))
    var items = 0
    var droppedChars = 0
    try {
      out.write("[\n")
      r.read() // skip the opening '['
      val buffer = new StringBuilder
      var braceLevel = 0
      var inString = false
      var escapeNext = false
      var c = r.read()
      while (c != -1) {
        val ch = c.toChar
        if (escapeNext) { escapeNext = false; buffer.append(ch) }
        else if (ch == '\\') { escapeNext = true; buffer.append(ch) }
        else if (ch == '"') { inString = !inString; buffer.append(ch) }
        else if (!inString) {
          ch match {
            case '{' =>
              braceLevel += 1; buffer.append(ch)
            case '}' =>
              braceLevel -= 1; buffer.append(ch)
              if (braceLevel == 0) {
                // complete top-level object: comma-prefix all but the first
                if (items > 0) out.write(",\n")
                out.write(buffer.toString)
                items += 1
                buffer.clear()
              }
            case ',' | '\n' | ' ' | '\t' | '\r' =>
              if (braceLevel > 0) buffer.append(ch)
            case _ => buffer.append(ch)
          }
        } else buffer.append(ch)
        c = r.read()
      }
      out.write("\n]")
      // an unbalanced brace/quote leaves everything after it buffered to
      // EOF; a well-formed tail leaves only the closing ']' here. Anything
      // else is content the repair could not place — count it so the
      // caller learns data was lost even though the output parses clean.
      val leftover = buffer.toString.trim
      if (leftover.nonEmpty && leftover != "]") droppedChars = leftover.length
    } finally { r.close(); out.close() }
    // streaming re-validation of the fixed file (json.load analog)
    try {
      val p = new com.fasterxml.jackson.core.JsonFactory()
        .createParser(new java.io.File(outPath))
      try { while (p.nextToken() != null) () } finally p.close()
      if (droppedChars > 0)
        RepairResult(false,
          s"Fixed file validates but $droppedChars chars of unparseable trailing " +
          s"content were dropped. Items: $items", items, Some(outPath), droppedChars)
      else
        RepairResult(true,
          s"Successfully fixed and validated JSON file. Items: $items", items,
          Some(outPath))
    } catch {
      case e: Exception =>
        RepairResult(false, s"Fixed file is still invalid: ${e.getMessage}", items,
          Some(outPath), droppedChars)
    }
  }

  /** S6: idempotent normalized write — PK-deduped, overwritten, partitioned
    * by platform so platform predicates prune at the source.
    */
  def writeNormalized(conversations: DataFrame, messages: DataFrame, outDir: String): Unit = {
    conversations.dropDuplicates("id").write.mode("overwrite")
      .partitionBy("platform").parquet(s"$outDir/conversations")
    messages.dropDuplicates("id").write.mode("overwrite")
      .parquet(s"$outDir/messages")
  }

  /** i1: end-to-end raw-export normalization over the committed fixtures —
    * both dialects read (`uni_parse.py:260-508`), normalized to the shared
    * conversations/messages schema, unioned, and every message row hydrated
    * with its conversation metadata. The fixture exercises the edge cases:
    * ISO-Z and epoch-string timestamps, duplicate conversation entries
    * (S6 dedup), null message text, a branching ChatGPT tree with a
    * role-less root, empty `parts`, and null/missing `model_slug`.
    */
  def qIngestNormalize(spark: SparkSession, sfDir: String): DataFrame =
    ingestNormalizeAt(spark, FixtureDir)

  /** i4: the end-to-end normalization over the ~100× generated fixtures
    * (305 claude entries incl. planted duplicates, 200 branching chatgpt
    * trees — `tools/gen_large_export.py`).
    */
  def qIngestNormalizeLarge(spark: SparkSession, sfDir: String): DataFrame =
    ingestNormalizeAt(spark, s"$FixtureDir/large")

  private def ingestNormalizeAt(spark: SparkSession, fixtureDir: String): DataFrame = {
    // FixtureDir already resolves SPARK_GRAFT_FIXTURE_DIR
    val cRaw = readClaude(spark, s"$fixtureDir/claude_export.json")
    val gRaw = readChatgpt(spark, s"$fixtureDir/chatgpt_export.json")
    val conv = claudeConversations(cRaw).drop("original_id")
      .unionByName(chatgptConversations(gRaw).drop("original_id"))
    val msgCols = Seq("id", "conversation_id", "parent_id", "sender", "role",
      "content", "created_at", "model", "order_index")
    val msg = claudeMessages(cRaw).select(msgCols.map(col): _*)
      .unionByName(chatgptMessages(spark, gRaw).toDF().select(msgCols.map(col): _*))
    msg.alias("m").join(conv.alias("c"), col("m.conversation_id") === col("c.id"))
      .select(
        col("c.platform"), col("m.conversation_id"), col("c.title"),
        col("c.created_at").as("conv_created_at"),
        col("c.updated_at").as("conv_updated_at"),
        col("c.account_id"),
        col("m.id").as("msg_id"), col("m.parent_id"), col("m.sender"),
        col("m.role"), col("m.content"),
        col("m.created_at").as("msg_created_at"),
        col("m.model"), col("m.order_index"))
  }

  /** Committed raw-export fixtures (testdata ships no raw exports).
    * Resolved against the working directory so any checkout location
    * works; SPARK_GRAFT_FIXTURE_DIR overrides.
    */
  val FixtureDir: String = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
    new java.io.File(sys.props("user.dir"), "src/main/resources/ingest").getPath)

  /** Co-located storage for repeated same-key joins/aggregations: bucket a
    * table by its join key so every later equi-join or groupBy on that key
    * reads pre-shuffled buckets — zero Exchange in the plan. At 100 TB this
    * converts the fact⋈fact self-joins (context windows, session stitching)
    * from full shuffles into local merges; the bucket count is the
    * cluster-side parallelism and should be sized once per table.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Compact a parquet directory written by many tasks/micro-batches into
    * ~`targetBytesPerFile` files — the small-files remedy for streaming
    * sinks and over-parallel writes (a 100 TB table of 1 MB files spends
    * more time opening footers than reading data). Sizing reads the actual
    * on-disk bytes, so compaction is planned from data, not guessed; the
    * swap is rename-aside → rename-in → delete-old, so a crash at any step
    * leaves the full data intact under either the source or `__compact_old`
    * path (single renames are atomic on HDFS-like filesystems; the recursive
    * delete only ever runs against the superseded copy).
    */
  def compact(spark: SparkSession, path: String,
              targetBytesPerFile: Long = 128L * 1024 * 1024): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytesPerFile).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    fs.delete(old, true)
    // rename() signals failure by returning false, not throwing — a
    // missed check here would let the trailing delete destroy the only
    // surviving copy
    if (!fs.rename(hPath, old))
      throw new java.io.IOException(s"compact: rename $hPath -> $old failed")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(old, hPath) // restore; best effort — old copy still intact
      throw new java.io.IOException(s"compact: rename $tmp -> $hPath failed")
    }
    fs.delete(old, true)
  }
}
