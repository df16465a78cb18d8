package graft.oracles

/** DuckDB oracle for the raw-export ingest query (i1): the same two fixture
  * JSON files read with `read_json`, normalized with pure SQL, including the
  * ChatGPT BFS flatten as a recursive CTE (`uni_parse.py:380-508` semantics).
  *
  * BFS order re-expressed relationally: dequeue order for a forest equals
  * lexicographic order of (level, sortKey) where a node's sortKey is its
  * parent's sortKey with the child position appended zero-padded (roots get
  * their id-rank). `order_index` then numbers only the role-bearing nodes in
  * that order, exactly like the imperative queue in `Ingest.chatgptMessages`.
  *
  * Timestamp handling is timezone-free on purpose: ISO-Z strings parse with
  * an explicit literal-Z strptime pattern (plain TIMESTAMP, UTC implied) and
  * epoch seconds go through make_timestamp(micros); both sides floor doubles
  * toward zero (DuckDB CAST(double AS BIGINT) rounds, Spark `.toLong`
  * truncates — hence floor() before the cast).
  */
object IngestSql {

  /** normTs analog: ISO-Z or epoch-seconds string → 'yyyy-MM-dd HH:mm:ss'. */
  private def normTs(c: String): String =
    s"""strftime(coalesce(try_strptime($c, '%Y-%m-%dT%H:%M:%SZ'),
       |  make_timestamp(TRY_CAST($c AS BIGINT)*1000000)), '%Y-%m-%d %H:%M:%S')""".stripMargin

  /** fmtEpoch analog: DOUBLE epoch seconds → 'yyyy-MM-dd HH:%M:%S' (truncating). */
  private def fmtEpoch(c: String): String =
    s"strftime(make_timestamp(CAST(floor($c) AS BIGINT)*1000000), '%Y-%m-%d %H:%M:%S')"

  /** i2 tree stats ([[graft.sources.Ingest.chatgptTreeStats]]): the mapping
    * exploded per conversation, shape counts from the children arrays, and
    * BFS depth as a recursive CTE. Parity contracts with the Spark walk:
    * a per-path visited array stops the recursion on cyclic (malformed)
    * mappings; a node reachable by several paths takes its MIN level
    * (BFS first-visit semantics, not longest path); conversations with no
    * parentless node — or no mapping at all — keep a row with depth 0 via
    * the left joins. Conversations deduped by id like the reader.
    */
  def treeStatsSql(fixtureDir: String): String =
    s"""WITH RECURSIVE
       |graw AS (
       |  SELECT * FROM read_json('$fixtureDir/chatgpt_export.json',
       |    columns={id:'VARCHAR', title:'VARCHAR', create_time:'DOUBLE', update_time:'DOUBLE',
       |             mapping:'MAP(VARCHAR, STRUCT(parent VARCHAR, children VARCHAR[],
       |               message STRUCT(author STRUCT(role VARCHAR),
       |                              content STRUCT(parts VARCHAR[]),
       |                              create_time DOUBLE,
       |                              metadata STRUCT(model_slug VARCHAR))))'})
       |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY id) = 1
       |),
       |gnodes AS (
       |  SELECT conv_id, e.key AS node_id, e.value.parent AS parent,
       |         e.value.children AS children
       |  FROM (SELECT id AS conv_id, unnest(map_entries(mapping)) AS e FROM graw)
       |),
       |lvls AS (
       |  SELECT conv_id, node_id, 1 AS lvl, [node_id] AS path
       |  FROM gnodes WHERE parent IS NULL
       |  UNION ALL
       |  SELECT l.conv_id, c.child AS node_id, l.lvl + 1 AS lvl,
       |         list_append(l.path, c.child) AS path
       |  FROM lvls l
       |  JOIN (SELECT conv_id, node_id, unnest(children) AS child FROM gnodes) c
       |    ON c.conv_id = l.conv_id AND c.node_id = l.node_id
       |  WHERE NOT list_contains(l.path, c.child)
       |),
       |depths AS (
       |  SELECT conv_id, CAST(max(lvl) AS BIGINT) AS max_depth
       |  FROM (SELECT conv_id, node_id, min(lvl) AS lvl FROM lvls GROUP BY 1, 2)
       |  GROUP BY 1),
       |nstats AS (
       |  SELECT conv_id,
       |         CAST(count(*) AS BIGINT) AS n_nodes,
       |         CAST(count(*) FILTER (parent IS NULL) AS BIGINT) AS n_roots,
       |         CAST(count(*) FILTER (coalesce(len(children), 0) = 0) AS BIGINT) AS n_leaves,
       |         CAST(count(*) FILTER (coalesce(len(children), 0) >= 2) AS BIGINT) AS n_branching,
       |         CAST(max(coalesce(len(children), 0)) AS BIGINT) AS max_fanout
       |  FROM gnodes GROUP BY 1)
       |SELECT g.id AS conversation_id,
       |       coalesce(n.n_nodes, 0) AS n_nodes,
       |       coalesce(n.n_roots, 0) AS n_roots,
       |       coalesce(n.n_leaves, 0) AS n_leaves,
       |       coalesce(n.n_branching, 0) AS n_branching,
       |       coalesce(n.max_fanout, 0) AS max_fanout,
       |       coalesce(d.max_depth, 0) AS max_depth
       |FROM graw g
       |LEFT JOIN nstats n ON n.conv_id = g.id
       |LEFT JOIN depths d ON d.conv_id = g.id""".stripMargin

  /** i3 validation report ([[graft.sources.Ingest.validationReport]]): the
    * corrupt JSONL fixture split into lines, each line's validity decided by
    * a strict JSON cast (DuckDB's grammar vs Spark's Jackson agree on the
    * fixture's failure modes: plain garbage, a truncated string, a missing
    * value). The id comes from the parsed document for valid rows only —
    * Spark PERMISSIVE may salvage leading fields of a corrupt record, which
    * strict parsing can't see, so the Spark side masks them the same way.
    *
    * Validity requires a JSON *object*, not just valid JSON: Spark parses
    * each line against a struct schema, so a bare scalar (`42`) is corrupt
    * there while `try_cast AS JSON` alone would accept it. (A line holding
    * a top-level *array* of objects is outside the report's contract
    * entirely — Spark's JSON source flattens it into one row per element,
    * which no per-line oracle can mirror; the fixture must not contain
    * one.)
    */
  def validationReportSql(fixtureDir: String): String =
    s"""WITH lines AS (
       |  SELECT unnest(string_split(content, chr(10))) AS line
       |  FROM read_text('$fixtureDir/claude_export_corrupt.jsonl')
       |),
       |parsed AS (
       |  SELECT try_cast(line AS JSON) AS j
       |  FROM lines WHERE trim(line) <> ''
       |),
       |checked AS (
       |  SELECT j, (j IS NOT NULL AND json_type(j) = 'OBJECT') AS ok FROM parsed
       |)
       |SELECT CASE WHEN ok THEN json_extract_string(j, '$$.uuid') END AS id,
       |       ok AS valid,
       |       CASE WHEN ok
       |            THEN CAST(coalesce(json_array_length(j, '$$.chat_messages'), 0) AS BIGINT)
       |       END AS n_messages
       |FROM checked""".stripMargin

  /** S2 dialect-sniff oracle ([[graft.sources.Ingest.detectPlatform]], i6):
    * re-detect each committed export's platform from its raw bytes — the
    * same first-100-lines window truncated to 4000 chars, the same marker
    * keys, marker precedence claude before chatgpt.
    */
  def detectPlatformSql(fixtureDir: String): String = {
    def sniff(file: String): String =
      s"""SELECT '$file' AS fixture,
         |       CASE WHEN contains(head, '"chat_messages"') THEN 'claude'
         |            WHEN contains(head, '"mapping"') THEN 'chatgpt'
         |            ELSE 'unknown' END AS detected_platform
         |FROM (SELECT substr(array_to_string(
         |               list_slice(string_split(content, chr(10)), 1, 100),
         |               chr(10)), 1, 4000) AS head
         |      FROM read_text('$fixtureDir/$file'))""".stripMargin
    s"""${sniff("claude_export.json")}
       |UNION ALL
       |${sniff("chatgpt_export.json")}""".stripMargin
  }

  def ingestNormalizeSql(fixtureDir: String): String =
    s"""WITH RECURSIVE
       |craw AS (
       |  SELECT * FROM read_json('$fixtureDir/claude_export.json',
       |    columns={uuid:'VARCHAR', name:'VARCHAR', created_at:'VARCHAR', updated_at:'VARCHAR',
       |             account:'STRUCT(uuid VARCHAR)',
       |             chat_messages:'STRUCT(uuid VARCHAR, sender VARCHAR, text VARCHAR, created_at VARCHAR)[]'})
       |),
       |graw AS (
       |  SELECT * FROM read_json('$fixtureDir/chatgpt_export.json',
       |    columns={id:'VARCHAR', title:'VARCHAR', create_time:'DOUBLE', update_time:'DOUBLE',
       |             mapping:'MAP(VARCHAR, STRUCT(parent VARCHAR, children VARCHAR[],
       |               message STRUCT(author STRUCT(role VARCHAR),
       |                              content STRUCT(parts VARCHAR[]),
       |                              create_time DOUBLE,
       |                              metadata STRUCT(model_slug VARCHAR))))'})
       |),
       |cconv AS (
       |  SELECT uuid AS id, name AS title, 'claude' AS platform,
       |    ${normTs("created_at")} AS created_at,
       |    ${normTs("updated_at")} AS updated_at,
       |    account.uuid AS account_id
       |  FROM craw QUALIFY row_number() OVER (PARTITION BY uuid ORDER BY uuid) = 1
       |),
       |cmsg AS (
       |  SELECT m.uuid AS id, conversation_id, NULL AS parent_id, m.sender AS sender,
       |    m.sender AS role, m.text AS content,
       |    ${normTs("m.created_at")} AS created_at,
       |    'claude' AS model, CAST(idx - 1 AS INTEGER) AS order_index
       |  FROM (SELECT uuid AS conversation_id, unnest(chat_messages) AS m,
       |               generate_subscripts(chat_messages, 1) AS idx FROM craw)
       |  QUALIFY row_number() OVER (PARTITION BY m.uuid ORDER BY m.uuid) = 1
       |),
       |gconv AS (
       |  SELECT id, title, 'chatgpt' AS platform,
       |    ${fmtEpoch("create_time")} AS created_at,
       |    ${fmtEpoch("update_time")} AS updated_at,
       |    CAST(NULL AS VARCHAR) AS account_id
       |  FROM graw QUALIFY row_number() OVER (PARTITION BY id ORDER BY id) = 1
       |),
       |gnodes AS (
       |  SELECT conv_id, e.key AS node_id, e.value.parent AS parent,
       |         e.value.children AS children, e.value.message AS msg
       |  FROM (SELECT id AS conv_id, unnest(map_entries(mapping)) AS e FROM graw)
       |),
       |bfs AS (
       |  SELECT conv_id, node_id, 0 AS lvl,
       |         lpad(CAST(row_number() OVER (PARTITION BY conv_id ORDER BY node_id) AS VARCHAR), 6, '0') AS sk
       |  FROM gnodes WHERE parent IS NULL
       |  UNION ALL
       |  SELECT b.conv_id, c.child AS node_id, b.lvl + 1 AS lvl,
       |         b.sk || lpad(CAST(c.idx AS VARCHAR), 6, '0') AS sk
       |  FROM bfs b
       |  JOIN (SELECT conv_id, node_id, unnest(children) AS child,
       |               generate_subscripts(children, 1) AS idx FROM gnodes) c
       |    ON c.conv_id = b.conv_id AND c.node_id = b.node_id
       |),
       |gmsg AS (
       |  SELECT n.node_id AS id, n.conv_id AS conversation_id, n.parent AS parent_id,
       |    CASE WHEN n.msg.author.role = 'user' THEN 'human' ELSE n.msg.author.role END AS sender,
       |    n.msg.author.role AS role,
       |    coalesce(n.msg.content.parts[1], '') AS content,
       |    ${fmtEpoch("n.msg.create_time")} AS created_at,
       |    coalesce(n.msg.metadata.model_slug, 'unknown') AS model,
       |    CAST(row_number() OVER (PARTITION BY n.conv_id ORDER BY b.lvl, b.sk) - 1 AS INTEGER) AS order_index
       |  FROM bfs b JOIN gnodes n ON n.conv_id = b.conv_id AND n.node_id = b.node_id
       |  WHERE n.msg IS NOT NULL AND n.msg.author.role IS NOT NULL
       |),
       |conv AS (SELECT * FROM cconv UNION ALL BY NAME SELECT * FROM gconv),
       |msg AS (SELECT * FROM cmsg UNION ALL BY NAME SELECT * FROM gmsg)
       |SELECT c.platform, m.conversation_id, c.title,
       |       c.created_at AS conv_created_at, c.updated_at AS conv_updated_at,
       |       c.account_id, m.id AS msg_id, m.parent_id, m.sender, m.role, m.content,
       |       m.created_at AS msg_created_at, m.model, m.order_index
       |FROM msg m JOIN conv c ON m.conversation_id = c.id""".stripMargin
}
