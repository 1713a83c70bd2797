package graft.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Custom-offset store for state OUTSIDE Spark checkpointing — the
  * functional form of the reference's conceptual OffsetManager
  * (…/state/offset_manager.py:6-121).
  *
  * The reference is emphatic (and right) that for every Structured
  * Streaming stateful operation, Spark's own `checkpointLocation` is the
  * authoritative state/recovery mechanism (offset_manager.py:13-21); our
  * engine follows that (see graft.streaming and the checkpoint-restart
  * test). This store exists for the scenarios the reference reserves it
  * for: manual offset tracking against external systems that don't flow
  * through a Spark source, and job metadata not tied to a stateful
  * operator. Where the reference stubs its bodies (logging, default 0 at
  * :86-103), this implements the file backend it sketches.
  *
  * Durability: atomic per-key replace (write temp + ATOMIC_MOVE), so a
  * crash mid-save leaves the previous committed offset, never a torn
  * file — the same torn-write discipline Spark's own offset log uses.
  * Driver-side only by design (offsets are per-stream bookkeeping, not
  * per-record state); nothing here is touched by executors.
  */
final class OffsetStore(storagePath: String) {

  private val root: Path = {
    val p = Paths.get(storagePath)
    Files.createDirectories(p)
    p
  }

  // '@' is outside the allowed name charset, so the separator can never
  // appear inside a name and per-stream listings cannot leak across
  // streams whose names share a prefix.
  private def fileFor(streamName: String, partitionId: String): Path = {
    require(streamName.matches("[A-Za-z0-9._-]+"),
      s"unsafe stream name: $streamName")
    require(partitionId.matches("[A-Za-z0-9._-]+"),
      s"unsafe partition id: $partitionId")
    root.resolve(s"$streamName@$partitionId.offset")
  }

  /** Persist the offset for (stream, partition) atomically. */
  def saveOffset(streamName: String, partitionId: String, offset: Long): Unit = {
    val target = fileFor(streamName, partitionId)
    val tmp = Files.createTempFile(root, ".tmp_offset", "")
    Files.writeString(tmp, offset.toString)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Load the committed offset; absent ⇒ the reference's default 0
    * (offset_manager.py:86-88).
    */
  def loadOffset(streamName: String, partitionId: String): Long = {
    val f = fileFor(streamName, partitionId)
    if (Files.exists(f)) Files.readString(f).trim.toLong else 0L
  }

  /** All committed (partition → offset) entries for a stream. */
  def offsetsFor(streamName: String): Map[String, Long] = {
    val prefix = s"$streamName@"
    val stream = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(prefix)
          && p.getFileName.toString.endsWith(".offset"))
        .map { p =>
          val name = p.getFileName.toString.stripSuffix(".offset").stripPrefix(prefix)
          name -> Files.readString(p).trim.toLong
        }.toMap
    } finally stream.close()
  }

  /** Render the offsets as the Spark Kafka `startingOffsets` JSON
    * (`{"topic":{"0":1234}}`) — the bridge from manual bookkeeping back
    * into a Spark source (SURVEY.md §2 B4).
    */
  def asStartingOffsetsJson(streamName: String): String = {
    val parts = offsetsFor(streamName).toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p": $o""" }.mkString(", ")
    s"""{"$streamName": {$parts}}"""
  }
}
