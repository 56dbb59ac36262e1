package graft.queries

import graft.Tables
import graft.operators.EventLog
import org.apache.spark.sql.functions._

/**
 * Reference-semantics queries over the event log (SURVEY.md §2.3, first
 * block). The driver testdata's `events` table stands in for the CloudEvent
 * log; `event_id` plays `offset` (dense from 0, ordered ≙ `ts` order).
 *
 * Each maps 1:1 to a reference operator (O3/O4, O6–O10, O12) — citations in
 * graft.operators.EventLog.
 */
object EventLogQueries {

  private val eventCols = "event_id, ts, user_id, event_type, value, props"

  val all: Seq[Declared] = Seq(
    // O7 — GET /api/v1/range (server.go:305-327)
    Declared(
      "q_range",
      Some("SELECT min(event_id) AS earliest, max(event_id) AS latest FROM events")
    ) { (spark, dir) =>
      EventLog.range(Tables.events(spark, dir), offsetCol = "event_id")
    },

    // O8 — GET /api/v1/events/:id (server.go:269-302)
    Declared(
      "q_point",
      Some(s"SELECT $eventCols FROM events WHERE event_id = 500 ORDER BY event_id")
    ) { (spark, dir) =>
      EventLog.pointLookup(Tables.events(spark, dir), 500L, offsetCol = "event_id")
        .orderBy("event_id")
    },

    // O9 — GET /api/v1/events page scan: last ≤50 ascending (server.go:211-267)
    Declared(
      "q_page",
      Some(
        s"""SELECT $eventCols FROM events
           |WHERE event_id >= greatest((SELECT min(event_id) FROM events),
           |                           (SELECT max(event_id) FROM events) - 49)
           |ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      EventLog.lastPage(Tables.events(spark, dir), offsetCol = "event_id")
    },

    // O10 — watch replay-from-offset (server.go:149-193)
    Declared(
      "q_tail",
      Some(s"SELECT $eventCols FROM events WHERE event_id >= 900 ORDER BY event_id")
    ) { (spark, dir) =>
      EventLog.replayFrom(Tables.events(spark, dir), 900L, offsetCol = "event_id")
    },

    // O6 — 2-segment retention window, N=100 ⇒ capacity 200 (README.md:177-184)
    Declared(
      "q_retain",
      Some(
        // exact 2-segment ring: active starts at the last 100-boundary ≤
        // latest, history is the segment before it
        s"""SELECT $eventCols FROM events
           |WHERE event_id >= ((SELECT max(event_id) FROM events) // 100) * 100 - 100
           |ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      EventLog.retained(Tables.events(spark, dir), segmentSize = 100, offsetCol = "event_id")
    },

    // O3/O4 — CloudEvent envelope projection (main.go:127-132; README.md:54-81)
    Declared(
      "q_envelope",
      Some(
        """SELECT event_id, 'vmware.vsphere.' || event_type || '.v0' AS type,
          |       ts AS time, user_id
          |FROM events ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      EventLog.envelope(Tables.events(spark, dir))
        .select(col("offset").as("event_id"), col("type"), col("time"),
          col("data.user_id").as("user_id"))
        .orderBy("event_id")
    },

    // O12 / §1.2 schema-on-read — JSON payload extraction (server.go:244-249)
    Declared(
      "q_json",
      Some(
        """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
          |FROM events ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    }
  )
}
