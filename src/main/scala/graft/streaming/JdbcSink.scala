package graft.streaming

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A13/A14: the relational fact sink. The reference initializes two
  * Postgres tables with exact column types (postgres_client.py:26-51)
  * and bulk-appends columnar batches into them (postgres_client.py:
  * 53-67). Spark's JDBC writer picks dialect-default types unless
  * told otherwise (e.g. Postgres TEXT for strings, Derby CLOB), so
  * the reference's column DDL lives HERE, once, and every backend —
  * embedded Derby in tests, Postgres in production — gets identical
  * column types via `createTableColumnTypes`.
  */
object JdbcSink {

  /** orderbook_snapshots column DDL (postgres_client.py:28-37). */
  val snapshotColumnTypes: String =
    "timestamp BIGINT, ticker VARCHAR(50), side VARCHAR(10), " +
      "price_dollars DECIMAL(5,4), contracts INTEGER, " +
      "redis_stream_id VARCHAR(50)"

  /** orderbook_deltas column DDL (postgres_client.py:39-49). */
  val deltaColumnTypes: String =
    "timestamp BIGINT, ticker VARCHAR(50), side VARCHAR(10), " +
      "price_dollars DECIMAL(5,4), delta INTEGER, " +
      "redis_stream_id VARCHAR(50)"

  /** The full initialize-schema statement for a table — what the
    * reference's `initialize_schema` executes, reconstructed from the
    * same column list the writer uses (one source of truth). */
  def createTableSql(table: String, columnTypes: String): String =
    s"CREATE TABLE IF NOT EXISTS $table ($columnTypes)"

  /** A14: batched columnar append (the ADBC bulk insert's Spark twin;
    * batchsize plays adbc's chunk size). Creates the table with the
    * reference column types on first write. */
  def append(df: DataFrame, url: String, table: String,
      columnTypes: String, props: Properties,
      batchSize: Int = 100): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize.toString)
      .option("createTableColumnTypes", columnTypes)
      .jdbc(url, table, props)

  // ------------------------------------------------------ exactly-once
  // The reference's insert-then-XDEL commit (consumer.py:98-107) is
  // at-least-once: a crash between the Postgres insert and the XDEL
  // re-delivers the batch and duplicates rows. The transactional
  // upgrade below makes the JDBC fact sink IDEMPOTENT per
  // (query_id, batch_id), so Structured Streaming's at-least-once
  // foreachBatch contract composes to exactly-once END TO END with no
  // dropDuplicates anywhere:
  //
  //   1. executors bulk-append the batch into `<table>_stage`, tagged
  //      with (query_id, batch_id) — parallel, batched, restartable;
  //      a crashed attempt leaves only junk staging rows;
  //   2. ONE driver transaction promotes the staged rows into the fact
  //      table, records (query_id, batch_id) in the commit log, and
  //      clears the stage — atomically. The promotion is INSERT..SELECT
  //      inside the database: no row ever passes through the driver,
  //      so a 1000-executor batch promotes at database speed;
  //   3. a re-delivered batch is skipped up front because its commit-log
  //      row exists; a CONCURRENT duplicate attempt loses the commit-log
  //      primary-key race and rolls back whole.
  //
  // Crash matrix: before (2) → stage junk, fact clean, replay re-stages
  // (stale rows for this batch are deleted first) and promotes; during
  // (2) → the transaction rolls back, same as before-(2); after (2) →
  // commit row exists, replay no-ops.

  /** Commit-log table shared by every exactly-once sink on a database. */
  val commitLogTable = "graft_sink_commits"

  private def parseCols(columnTypes: String): Seq[(String, String)] =
    // split on commas OUTSIDE parentheses (DECIMAL(5,4) stays whole)
    columnTypes.split(",(?![^(]*\\))").toSeq.map(_.trim).map { c =>
      val i = c.indexOf(' ')
      require(i > 0, s"malformed column spec '$c'")
      (c.substring(0, i), c.substring(i + 1).trim)
    }

  /** Quoted-identifier DDL (Derby folds unquoted names to upper case,
    * while Spark's JDBC writer quotes the DataFrame's lower-case field
    * names — they must agree). Derby has no IF NOT EXISTS, so existence
    * is checked via catalog metadata. */
  private def ensureTable(conn: Connection, table: String,
      cols: Seq[(String, String)], pk: Seq[String] = Nil): Unit = {
    val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
    val exists = try rs.next() finally rs.close()
    if (!exists) {
      val pkDdl =
        if (pk.isEmpty) ""
        else pk.map(c => s""""$c"""").mkString(", PRIMARY KEY (", ", ", ")")
      val st = conn.createStatement()
      try st.executeUpdate(s"CREATE TABLE $table (" +
        cols.map { case (n, t) => s""""$n" $t""" }.mkString(", ") + pkDdl + ")")
      finally st.close()
    }
  }

  private def withConnection[A](url: String, props: Properties)
      (f: Connection => A): A = {
    Option(props.getProperty("driver"))
      .foreach(d => Class.forName(d))
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** Idempotent micro-batch append. Returns false when (queryId,
    * batchId) is already in the commit log — the replayed-batch no-op.
    * `queryId` must be stable across restarts (use the checkpoint
    * location or a fixed query name, NOT the engine's random run id). */
  def appendExactlyOnce(df: DataFrame, url: String, table: String,
      columnTypes: String, props: Properties, queryId: String,
      batchId: Long, batchSize: Int = 100): Boolean = {
    val cols = parseCols(columnTypes)
    require(cols.map(_._1).sorted == df.columns.toSeq.sorted,
      s"batch columns ${df.columns.mkString(",")} do not match sink DDL " +
        s"${cols.map(_._1).mkString(",")}")
    val stage = table + "_stage"
    val stageCols = cols ++ Seq(
      ("query_id", "VARCHAR(200) NOT NULL"), ("batch_id", "BIGINT NOT NULL"))
    val proceed = withConnection(url, props) { conn =>
      ensureTable(conn, table, cols)
      ensureTable(conn, stage, stageCols)
      ensureTable(conn, commitLogTable, Seq(
        ("query_id", "VARCHAR(200) NOT NULL"),
        ("batch_id", "BIGINT NOT NULL"),
        ("committed_at_ms", "BIGINT")), pk = Seq("query_id", "batch_id"))
      val check = conn.prepareStatement(
        s"""SELECT 1 FROM $commitLogTable WHERE "query_id" = ? AND "batch_id" = ?""")
      val committed = try {
        check.setString(1, queryId); check.setLong(2, batchId)
        val rs = check.executeQuery()
        try rs.next() finally rs.close()
      } finally check.close()
      if (!committed) {
        // clear junk left by a previous crashed attempt at THIS batch
        val del = conn.prepareStatement(
          s"""DELETE FROM $stage WHERE "query_id" = ? AND "batch_id" = ?""")
        try { del.setString(1, queryId); del.setLong(2, batchId)
          del.executeUpdate() } finally del.close()
      }
      !committed
    }
    if (!proceed) return false

    // distributed, parallel load into the stage (executor-side, batched)
    df.withColumn("query_id", lit(queryId))
      .withColumn("batch_id", lit(batchId))
      .write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(url, stage, props)

    // single transaction: promote + commit-log + clean — all or nothing
    withConnection(url, props) { conn =>
      conn.setAutoCommit(false)
      try {
        val colList = cols.map { case (n, _) => s""""$n"""" }.mkString(", ")
        val promote = conn.prepareStatement(
          s"""INSERT INTO $table ($colList) SELECT $colList FROM $stage
             | WHERE "query_id" = ? AND "batch_id" = ?""".stripMargin)
        try { promote.setString(1, queryId); promote.setLong(2, batchId)
          promote.executeUpdate() } finally promote.close()
        val mark = conn.prepareStatement(
          s"""INSERT INTO $commitLogTable ("query_id", "batch_id",
             | "committed_at_ms") VALUES (?, ?, ?)""".stripMargin)
        try { mark.setString(1, queryId); mark.setLong(2, batchId)
          mark.setLong(3, System.currentTimeMillis())
          mark.executeUpdate() } finally mark.close()
        val clean = conn.prepareStatement(
          s"""DELETE FROM $stage WHERE "query_id" = ? AND "batch_id" = ?""")
        try { clean.setString(1, queryId); clean.setLong(2, batchId)
          clean.executeUpdate() } finally clean.close()
        conn.commit()
        true
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: Throwable => () }
          throw e
      }
    }
  }

  /** A14/A15 fully exactly-once: the streaming fact sink as a
    * checkpointed foreachBatch over [[appendExactlyOnce]]. `queryId`
    * defaults to the checkpoint path — the one identifier that is
    * stable across restarts and unique per logical query. */
  def factStream(facts: DataFrame, url: String, table: String,
      columnTypes: String, props: Properties, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      queryId: String = null): StreamingQuery = {
    val qid = Option(queryId).getOrElse(checkpoint)
    facts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendExactlyOnce(batch, url, table, columnTypes, props, qid, batchId)
        ()
      }
      .start()
  }
}
