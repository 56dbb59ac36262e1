package graft.streaming

import graft.operators.EventLog.{FutureOffset, LogRange, OutOfRange, ReadError}

/**
 * The serving-layer offset log: an in-memory, append-only, offset-addressed
 * record store with 2-segment retention — the reference's `memlog` semantics
 * re-implemented as the Structured Streaming sink state
 * (reference call sites: `cmd/server/main.go:140`, `server.go:77-94`;
 * retention semantics `README.md:177-184`, pinned by
 * `server_test.go:52-59,117-124`).
 *
 * Explicitly a SINGLE-NODE serving construct (the reference is
 * single-writer by design, `main.go:86-152`): the distributed part of the
 * pipeline is everything before the sink — source, transform, serialize are
 * executor-parallel narrow maps; the micro-batch boundary is the
 * serialization point where dense offsets are assigned. At 100 TB the
 * analytics path never materializes this structure; it exists to reproduce
 * the reference's query/API semantics (point read, page, watch, range).
 *
 * Thread-safe: one writer (the streaming query's foreachBatch), many readers.
 */
final class OffsetLog(
    val startOffset: Long = 0L,
    val maxSegmentSize: Int = 1000,
    val maxRecordBytes: Long = 512L * 1024
) {
  require(maxSegmentSize > 0, "segment size must be positive")

  /** Oversize-record rejection (memlog's ErrRecordTooLarge; `server.go:46`). */
  sealed trait WriteError
  case object RecordTooLarge extends WriteError

  // history segment (purged first) and active segment; offsets are dense so
  // a segment is fully described by its first offset + records vector
  private var historyStart: Long                = -1L
  private var history: Vector[Array[Byte]]      = Vector.empty
  private var activeStart: Long                 = startOffset
  private var active: Vector[Array[Byte]]       = Vector.empty
  private var next: Long                        = startOffset

  /** Append; returns the record's permanent offset (dense, monotonic). */
  def write(record: Array[Byte]): Either[WriteError, Long] = synchronized {
    if (record.length > maxRecordBytes) Left(RecordTooLarge)
    else {
      if (active.size == maxSegmentSize) {
        // active full: purge history, roll active → history (README.md:177-184)
        historyStart = activeStart
        history = active
        activeStart = next
        active = Vector.empty
      }
      val offset = next
      active = active :+ record
      next += 1
      Right(offset)
    }
  }

  /** `{earliest, latest}`; empty log = (-1, -1) (`server.go:305-327`). */
  def range: LogRange = synchronized {
    if (active.isEmpty && history.isEmpty) LogRange(-1, -1)
    else {
      val earliest = if (history.nonEmpty) historyStart else activeStart
      LogRange(earliest, next - 1)
    }
  }

  /** O(1) point read (`server.go:269-302` error mapping). */
  def read(offset: Long): Either[ReadError, Array[Byte]] = synchronized {
    val r = range
    if (r.isEmpty) Left(if (offset >= next) FutureOffset else OutOfRange)
    else if (offset < r.earliest) Left(OutOfRange)
    else if (offset > r.latest) Left(FutureOffset)
    else if (offset >= activeStart) Right(active((offset - activeStart).toInt))
    else Right(history((offset - historyStart).toInt))
  }

  /**
   * O10 watch / subscribe (`server.go:130-209`): snapshot of records from
   * `start` (param offset; default `latest+1` = only-new-events,
   * `server.go:161-166`). A purged start is an error
   * (`server_test.go:350-359`); a future start returns an empty snapshot
   * (the live server would wait — `server_test.go:328-337`).
   */
  def watch(startParam: Option[Long] = None): Either[ReadError, Seq[(Long, Array[Byte])]] =
    synchronized {
      val r     = range
      val start = startParam.getOrElse(r.latest + 1)
      // negative offsets are out of range on ANY log state — without the
      // start < 0 arm an EMPTY log skips the purged-start guard and the
      // snapshot loop would read(-1).toOption.get → NoSuchElementException
      // (a 500 where the reference 400s)
      if (start < 0 || (!r.isEmpty && start < r.earliest)) Left(OutOfRange)
      else Right(
        (math.max(start, r.earliest) to r.latest)
          .map(o => o -> read(o).toOption.get))
    }

  /** All retained records in offset order (the queryable sink table). */
  def snapshot: Seq[(Long, Array[Byte])] = synchronized {
    val r = range
    if (r.isEmpty) Seq.empty
    else (r.earliest to r.latest).map(o => o -> read(o).toOption.get)
  }

  def size: Int = synchronized(history.size + active.size)
}
