package graft

import graft.sources.Ingest
import java.nio.file.Files

/** Ingest-path specs over synthetic Claude / ChatGPT export fixtures
  * (dialects per FIXTURES.md §2, `uni_parse.py:260-508`).
  */
class IngestSpec extends SparkSpec {

  import spark.implicits._

  private def writeFixture(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-ingest")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  val claudeExport: String =
    """[{"uuid": "conv-1", "name": "Test Conversation",
      |  "created_at": "2024-03-01T10:00:00Z", "updated_at": "2024-03-01T11:00:00Z",
      |  "account": {"uuid": "acct-9"},
      |  "chat_messages": [
      |    {"uuid": "m1", "sender": "human", "text": "Hello there", "created_at": "2024-03-01T10:00:00Z"},
      |    {"uuid": "m2", "sender": "assistant", "text": "Hi! How can I help?", "created_at": "2024-03-01T10:00:05Z"}
      |  ]}]""".stripMargin

  val chatgptExport: String =
    """[{"id": "g-1", "title": "Another Test", "create_time": 1709290800.0, "update_time": 1709294400.0,
      |  "mapping": {
      |    "root": {"parent": null, "children": ["n1"], "message": null},
      |    "n1": {"parent": "root", "children": ["n2"],
      |           "message": {"author": {"role": "user"}, "content": {"parts": ["Tell me about transformers."]},
      |                       "create_time": 1709290810.0, "metadata": {"model_slug": null}}},
      |    "n2": {"parent": "n1", "children": [],
      |           "message": {"author": {"role": "assistant"}, "content": {"parts": ["The transformer architecture revolutionized NLP."]},
      |                       "create_time": 1709290820.0, "metadata": {"model_slug": "gpt-4"}}}
      |  }}]""".stripMargin

  test("claude export → normalized conversations + messages with array order_index") {
    val path = writeFixture("claude.json", claudeExport)
    val raw = Ingest.readClaude(spark, path)
    val convs = Ingest.claudeConversations(raw).collect()
    assert(convs.length == 1)
    val c = convs.head
    assert(c.getAs[String]("id") == "conv-1")
    assert(c.getAs[String]("platform") == "claude")
    assert(c.getAs[String]("account_id") == "acct-9")
    assert(c.getAs[String]("created_at") == "2024-03-01 10:00:00")
    val msgs = Ingest.claudeMessages(raw).orderBy("order_index").collect()
    assert(msgs.map(_.getAs[String]("id")).toSeq == Seq("m1", "m2"))
    assert(msgs.map(_.getAs[Int]("order_index")).toSeq == Seq(0, 1))
    assert(msgs.head.getAs[String]("sender") == "human")
  }

  test("chatgpt tree stats: depth, branching, fan-out on a hand-built tree") {
    // root → a → (b, c); b → d  — depth 4, one branching node, fanout 2
    val export =
      """[{"id": "t-1", "title": "T", "create_time": 1709290800.0, "update_time": 1709294400.0,
        |  "mapping": {
        |    "root": {"parent": null, "children": ["a"], "message": null},
        |    "a": {"parent": "root", "children": ["b", "c"], "message": null},
        |    "b": {"parent": "a", "children": ["d"], "message": null},
        |    "c": {"parent": "a", "children": [], "message": null},
        |    "d": {"parent": "b", "children": [], "message": null}
        |  }}]""".stripMargin
    val raw = Ingest.readChatgpt(spark, writeFixture("tree.json", export))
    val s = Ingest.chatgptTreeStats(spark, raw).collect().head
    assert(s.conversation_id == "t-1")
    assert(s.n_nodes == 5 && s.n_roots == 1 && s.n_leaves == 2)
    assert(s.n_branching == 1 && s.max_fanout == 2 && s.max_depth == 4)
  }

  test("chatgpt tree stats: diamond gets BFS first-visit depth; missing mapping → zero row") {
    // r → (a, x); a → b; b → x  — x first visited at level 2, not 4
    val export =
      """[{"id": "d-1", "title": "D", "create_time": 1709290800.0, "update_time": 1709294400.0,
        |  "mapping": {
        |    "r": {"parent": null, "children": ["a", "x"], "message": null},
        |    "a": {"parent": "r", "children": ["b"], "message": null},
        |    "b": {"parent": "a", "children": ["x"], "message": null},
        |    "x": {"parent": "r", "children": [], "message": null}
        |  }},
        | {"id": "d-2", "title": "E", "create_time": 1709290800.0, "update_time": 1709294400.0}]""".stripMargin
    val raw = Ingest.readChatgpt(spark, writeFixture("diamond.json", export))
    val byId = Ingest.chatgptTreeStats(spark, raw).collect()
      .map(s => s.conversation_id -> s).toMap
    assert(byId("d-1").max_depth == 3) // r=1, {a,x}=2, b=3; x not revisited
    assert(byId("d-1").n_nodes == 4 && byId("d-1").n_branching == 1)
    val empty = byId("d-2")
    assert(empty.n_nodes == 0 && empty.n_roots == 0 && empty.max_depth == 0)
  }

  test("chatgpt export → BFS-flattened messages with role normalization") {
    val path = writeFixture("chatgpt.json", chatgptExport)
    val raw = Ingest.readChatgpt(spark, path)
    val convs = Ingest.chatgptConversations(raw).collect()
    assert(convs.head.getAs[String]("platform") == "chatgpt")
    assert(convs.head.getAs[String]("account_id") == null)
    val msgs = Ingest.chatgptMessages(spark, raw).collect().sortBy(_.order_index)
    assert(msgs.length == 2) // root has no message payload
    assert(msgs(0).sender == "human" && msgs(0).role == "user")
    assert(msgs(0).parent_id == "root")
    assert(msgs(1).model == "gpt-4")
    assert(msgs(1).content.startsWith("The transformer"))
    assert(msgs(0).created_at == "2024-03-01 11:00:10")
  }

  test("i1 fixture normalization: both dialects, epoch + ISO timestamps, dedup") {
    // Exercises the committed fixture end-to-end — in particular the
    // epoch-seconds STRING branch of normTs, which under ANSI throws unless
    // the ISO parse and the numeric cast are try_-variants.
    val rows = Ingest.qIngestNormalize(spark, "unused").collect()
    assert(rows.length == 11)
    val byId = rows.map(r => r.getAs[String]("msg_id") -> r).toMap
    // claude epoch-string conversation: normalized + deduped (fixture has it twice)
    assert(rows.count(_.getAs[String]("conversation_id") == "c-002") == 1)
    assert(byId("c-002-m0").getAs[String]("conv_created_at") == "2024-03-01 13:33:20")
    assert(byId("c-002-m0").getAs[String]("msg_created_at") == "2024-03-01 13:33:21")
    // chatgpt BFS order: n1 < n2a < n2b < n3; empty parts → ""; null meta → unknown
    val g1 = rows.filter(_.getAs[String]("conversation_id") == "g-001")
      .sortBy(_.getAs[Int]("order_index"))
    assert(g1.map(_.getAs[String]("msg_id")).toSeq == Seq("n1", "n2a", "n2b", "n3"))
    assert(g1.last.getAs[String]("content") == "")
    assert(g1.last.getAs[String]("model") == "unknown")
    assert(g1.last.getAs[String]("msg_created_at") == null)
  }

  test("platform detection sniffs dialect markers") {
    val cp = writeFixture("c.json", claudeExport)
    val gp = writeFixture("g.json", chatgptExport)
    assert(Ingest.detectPlatform(spark, cp) == "claude")
    assert(Ingest.detectPlatform(spark, gp) == "chatgpt")
  }

  test("permissive validation keeps corrupt records") {
    val bad = writeFixture("bad.json", "{\"uuid\": \"x\", \"chat_messages\": [broken")
    val df = Ingest.validateJson(spark, bad, Ingest.claudeSchema)
    assert(df.where(df("_corrupt_record").isNotNull).count() >= 1)
  }

  test("validation report: one row per line, ids only for valid rows") {
    val report = Ingest.qValidationReport(spark, sf0001)
      .as[(Option[String], Boolean, Option[Long])].collect()
    assert(report.length == 11, s"11 fixture lines, got ${report.length}")
    // garbage, truncated record, unbalanced value, and a bare scalar (valid
    // JSON but not an object — struct parsing and the oracle both reject it)
    assert(report.count(!_._2) == 4, "4 planted corrupt lines")
    // corrupt rows never leak a (possibly salvaged) id or message count
    assert(report.filter(!_._2).forall(r => r._1.isEmpty && r._3.isEmpty))
    val valid = report.filter(_._2)
    assert(valid.flatMap(_._1).sorted.toSeq ==
      Seq("c1", "c2", "c3", "c4", "c6", "c7"), "NoUuid row is valid with null id")
    assert(valid.map(_._3.get).sum == 1 + 2 + 0 + 1 + 1 + 3 + 1)
  }

  test("json repair: fixes missing/doubled/trailing commas, counts items") {
    val broken = s"${Ingest.FixtureDir}/claude_export_broken.json"
    // the committed fixture is genuinely malformed
    val pre = Ingest.validateJson(spark, broken, Ingest.claudeSchema)
      .where($"_corrupt_record".isNotNull).count()
    assert(pre >= 1, "broken fixture must not parse as-is")
    val out = Files.createTempDirectory("graft-repair").resolve("fixed.json").toString
    val res = Ingest.repairJsonArray(broken, out)
    assert(res.success, res.message)
    assert(res.items == 3, s"3 top-level objects, got ${res.items}")
    assert(res.message.contains("Items: 3"))
    val rows = Ingest.claudeConversations(Ingest.readClaude(spark, out))
    assert(rows.select("id").as[String].collect().sorted.toSeq == Seq("b1", "b2", "b3"))
    // brace-in-string content survived the char-level scan intact
    val texts = Ingest.claudeMessages(Ingest.readClaude(spark, out))
      .select("content").as[String].collect().toSet
    assert(texts.contains("some code: if (x) { return y; }"))
    assert(texts.contains("escaped \"quote\" and brace } in string"))
  }

  test("json repair: refuses non-array files; flags unfixable garbage") {
    val notArray = writeFixture("notarray.json", "{\"uuid\": \"x\"}")
    assert(!Ingest.repairJsonArray(notArray).success)
    val noClose = writeFixture("noclose.json", "[{\"uuid\": \"x\"}")
    assert(!Ingest.repairJsonArray(noClose).success)
    // reference quirk: stray tokens between objects ride into the next
    // object's buffer, so the fixed file fails re-validation and says so
    val stray = writeFixture("stray.json", "[{\"a\": 1} junk {\"b\": 2}]")
    val res = Ingest.repairJsonArray(stray)
    assert(!res.success && res.message.startsWith("Fixed file is still invalid"))
  }

  test("json repair: unbalanced garbage that drops content is not success") {
    // a lone '}' unbalances the brace state: everything after stays
    // buffered to EOF, the output validates clean, but content was lost —
    // the report must say so instead of claiming success
    val unbal = writeFixture("unbal.json", "[{\"a\": 1}},{\"b\": 2}]")
    val res = Ingest.repairJsonArray(unbal)
    assert(!res.success && res.droppedChars > 0 && res.items == 1,
      s"got $res")
    assert(res.message.contains("dropped"))
    // an unterminated string swallows the tail the same way
    val unterm = writeFixture("unterm.json", "[{\"a\": 1},{\"b\": \"oops}]")
    val res2 = Ingest.repairJsonArray(unterm)
    assert(!res2.success && res2.droppedChars > 0, s"got $res2")
  }

  test("large generated fixtures: duplicates deduped, trees traversed") {
    val conv = Ingest.claudeConversations(
      Ingest.readClaude(spark, s"${Ingest.FixtureDir}/large/claude_export.json"))
    // generator plants 305 entries, 5 of them full duplicates
    assert(conv.count() == 300)
    val stats = Ingest.qTreeStatsLarge(spark, sf0001)
    assert(stats.count() == 200)
    // every tree has one role-less root and at least one dead side-branch
    import spark.implicits._
    val shapes = stats.select("n_roots", "n_branching", "max_depth")
      .as[(Long, Long, Long)].collect()
    assert(shapes.forall { case (r, b, d) => r == 1 && b >= 1 && d >= 9 })
  }

  test("compaction collapses a many-file directory, preserving the data") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-compact").toString + "/t"
    (1L to 1000L).toDF("id").repartition(64).write.parquet(out)
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts(out) == 64)
    Ingest.compact(spark, out, targetBytesPerFile = 1024L * 1024)
    assert(parts(out) < 8, s"expected few files after compaction, got ${parts(out)}")
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq == (1L to 1000L))
  }

  test("idempotent normalized write round-trips and dedupes") {
    val path = writeFixture("claude2.json", claudeExport)
    val raw = Ingest.readClaude(spark, path)
    val out = Files.createTempDirectory("graft-norm").toString
    Ingest.writeNormalized(
      Ingest.claudeConversations(raw).union(Ingest.claudeConversations(raw)),
      Ingest.claudeMessages(raw).union(Ingest.claudeMessages(raw)), out)
    assert(spark.read.parquet(s"$out/conversations").count() == 1)
    assert(spark.read.parquet(s"$out/messages").count() == 2)
  }
}
