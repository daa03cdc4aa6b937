package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.BinaryStatistics
import org.apache.parquet.column.values.bloomfilter.BloomFilter
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.io.api.Binary

/** Driver-side point lookup into a head-layer parquet directory — NO
  * Spark job. A serving path answering "what is this stream's head?"
  * must not pay scheduler latency (~90 ms per cold lookup measured in
  * the bench) for a probe the parquet footers can answer in
  * single-digit ms; the reference's analogue is an in-memory index
  * probe (`crates/sierradb/src/database.rs:298-357`).
  *
  * Layer files are range-partitioned + sorted on
  * (stream_id, partition_key) with a stream_id bloom filter
  * (`EventStore.writeHeadsParquet`), so the probe prunes in three
  * steps, metadata-only until a row group survives:
  *   1. row-group min/max stats on stream_id (sorted layout → the key
  *      lands in at most one file's range, ~one row group);
  *   2. the row group's bloom filter (rules out absent keys without
  *      reading data pages);
  *   3. a record scan of the one surviving row group, short-circuited
  *      on match.
  *
  * COMMITTED layer directories are immutable (`delta-v{n}` /
  * `base-v{n}`; folds write new version-named dirs; manifest versions
  * are monotonic within a store's life), so footers, bloom filters,
  * and directory listings are cached process-wide: a steady-state
  * probe re-reads NO metadata — only the surviving row group's pages.
  * The one path that CAN be rewritten is an uncommitted orphan
  * (layer written, crash before manifest commit, deleted on reopen,
  * version number reused by the next spill) — safe because callers
  * only probe layers referenced by a committed manifest snapshot, and
  * an uncommitted layer is never referenced, hence never cached.
  * Caches are bounded by the live layer-file count (a few dozen per
  * store).
  *
  * Keys are unique within a layer (a layer is a snapshot of a head
  * map), so the first match IS the layer's entry. Layer precedence
  * (newest delta wins over base) is the CALLER's job: probe layers
  * newest-first and stop at the first hit.
  */
object HeadProbe {

  // private[storage] so the spec can pin invalidate()'s path-boundary
  // semantics directly against the cache keys
  private[storage] val dirListings =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Path]]()
  private val footers =
    new java.util.concurrent.ConcurrentHashMap[String, ParquetMetadata]()
  // per (file, rowGroup): None = column has no bloom filter
  private val blooms =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Option[BloomFilter]]()

  /** Drop every cached listing/footer/bloom under `rootPrefix` (a
    * store's `_heads` tree). Committed layer FILES are immutable, but
    * the cache keyed on bare paths outlives them two ways: entries for
    * folded-away layers accumulate for the life of the JVM, and a
    * store path deleted and recreated within one process (test
    * harnesses, reused temp dirs) would be served stale metadata.
    * `EventStore.invalidateHeadCache()` calls this on every layer-
    * structure change, so the caches really are bounded by the live
    * layer count. Both sides are normalized through Hadoop `Path` to
    * the bare URI path before matching: cached keys may carry a
    * filesystem scheme (`file:/...` from listStatus) while callers may
    * pass bare paths, `file:///`-form URIs, or trailing slashes — raw
    * substring matching would silently miss (and leave stale) every
    * entry for a URI-form store root.
    */
  def invalidate(rootPrefix: String): Unit = {
    val want = new Path(rootPrefix).toUri.getPath
    // path-BOUNDARY match, not bare startsWith: invalidating
    // `/x/_heads` must not also drop a sibling store whose directory
    // name merely extends it (`/x/_heads-backup`) — only
    // over-invalidation, but it silently crosses store boundaries.
    // Hadoop Path normalization strips trailing slashes, so `want`
    // never ends with "/" and the "/"-suffix probe is exact.
    def hit(key: String): Boolean = {
      val p = new Path(key).toUri.getPath
      p == want || p.startsWith(want + "/")
    }
    dirListings.keySet.removeIf(hit(_))
    footers.keySet.removeIf(hit(_))
    blooms.keySet.removeIf(k => hit(k._1))
  }

  /** (partition_id, version) for the (stream_id, partition_key) head
    * entry in one layer directory, or None if absent.
    */
  def probe(dir: String, streamId: String, partitionKey: String,
      conf: Configuration): Option[(Int, Long)] = {
    val files = dirListings.computeIfAbsent(dir, { d =>
      val dirPath = new Path(d)
      val fs = dirPath.getFileSystem(conf)
      if (!fs.exists(dirPath)) Nil
      else fs.listStatus(dirPath).toSeq
        .map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
    })
    val it = files.iterator
    while (it.hasNext) {
      val hit = probeFile(it.next(), streamId, partitionKey, conf)
      if (hit.isDefined) return hit
    }
    None
  }

  /** ALL (partition_key, partition_id, version) entries of one stream
    * id in one layer directory — the per-stream analogue of [[probe]]
    * (ESVER wants every partition key's head for a stream). Same
    * pruning; within a surviving row group the (stream_id,
    * partition_key)-sorted layout makes the matches contiguous, so the
    * scan stops at the first row past the target.
    */
  def probeStream(dir: String, streamId: String,
      conf: Configuration): Seq[(String, Int, Long)] = {
    val files = dirListings.computeIfAbsent(dir, { d =>
      val dirPath = new Path(d)
      val fs = dirPath.getFileSystem(conf)
      if (!fs.exists(dirPath)) Nil
      else fs.listStatus(dirPath).toSeq
        .map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
    })
    val target = Binary.fromString(streamId)
    files.flatMap { f =>
      val skip = Option(fileRangeOf(f, conf)).exists { case (mn, mx) =>
        UnsignedBinary.compare(target, mn) < 0 ||
          UnsignedBinary.compare(target, mx) > 0
      }
      if (skip) Nil else scanFileForStream(f, streamId, conf)
    }
  }

  private def fileRangeOf(file: Path,
      conf: Configuration): (Binary, Binary) = {
    val footer = footerOf(file, conf)
    val sidCol = footer.getFileMetaData.getSchema.getFieldIndex("stream_id")
    val blocks = footer.getBlocks
    val rs = (0 until blocks.size()).flatMap { b =>
      blocks.get(b).getColumns.get(sidCol).getStatistics match {
        case s: BinaryStatistics if s.hasNonNullValue =>
          Some((s.genericGetMin, s.genericGetMax))
        case _ => None
      }
    }
    if (rs.isEmpty || rs.length != blocks.size()) null
    else {
      implicit val ord: Ordering[Binary] = (a, b) => UnsignedBinary.compare(a, b)
      (rs.map(_._1).min, rs.map(_._2).max)
    }
  }

  private def scanFileForStream(file: Path, streamId: String,
      conf: Configuration): Seq[(String, Int, Long)] = {
    val target = Binary.fromString(streamId)
    val footer = footerOf(file, conf)
    val schema = footer.getFileMetaData.getSchema
    val sidCol = schema.getFieldIndex("stream_id")
    val blocks = footer.getBlocks
    val inRange = (0 until blocks.size()).filter { b =>
      blocks.get(b).getColumns.get(sidCol).getStatistics match {
        case s: BinaryStatistics if s.hasNonNullValue =>
          UnsignedBinary.compare(s.genericGetMin, target) <= 0 &&
            UnsignedBinary.compare(s.genericGetMax, target) >= 0
        case _ => true
      }
    }
    if (inRange.isEmpty) return Nil
    var reader: ParquetFileReader = null
    def theReader(): ParquetFileReader = {
      if (reader == null) reader = new ParquetFileReader(conf, file, footer)
      reader
    }
    try {
      val out = Seq.newBuilder[(String, Int, Long)]
      val candidates = inRange.filter { b =>
        blooms.computeIfAbsent((file.toString, b), { _ =>
          Option(theReader().getBloomFilterDataReader(blocks.get(b))
            .readBloomFilter(blocks.get(b).getColumns.get(sidCol)))
        }) match {
          case Some(bloom) => bloom.findHash(bloom.hash(target))
          case None => true
        }
      }
      val columnIO = new ColumnIOFactory().getColumnIO(schema)
      candidates.foreach { b =>
        val pages = theReader().readRowGroup(b)
        val recordReader = columnIO.getRecordReader(
          pages, new GroupRecordConverter(schema))
        var i = 0L
        val n = blocks.get(b).getRowCount
        var pastTarget = false
        while (i < n && !pastTarget) {
          val g = recordReader.read()
          val sid = g.getString("stream_id", 0)
          if (sid == streamId)
            out += ((g.getString("partition_key", 0),
              g.getInteger("partition_id", 0), g.getLong("version", 0)))
          else if (UnsignedBinary.compare(
              Binary.fromString(sid), target) > 0)
            pastTarget = true // sorted layout: no more matches here
          i += 1
        }
      }
      out.result()
    } finally if (reader != null) reader.close()
  }

  private def footerOf(file: Path, conf: Configuration): ParquetMetadata =
    footers.computeIfAbsent(file.toString, { _ =>
      ParquetFileReader.readFooter(conf, file, ParquetMetadataConverter.NO_FILTER)
    })

  private def probeFile(file: Path, streamId: String, partitionKey: String,
      conf: Configuration): Option[(Int, Long)] = {
    val target = Binary.fromString(streamId)
    val footer = footerOf(file, conf)
    val schema = footer.getFileMetaData.getSchema
    val sidCol = schema.getFieldIndex("stream_id")
    val blocks = footer.getBlocks

    // 1. metadata-only: row groups whose stream_id range contains the
    //    target (sorted layout → normally one)
    val inRange = (0 until blocks.size()).filter { b =>
      blocks.get(b).getColumns.get(sidCol).getStatistics match {
        case s: BinaryStatistics if s.hasNonNullValue =>
          UnsignedBinary.compare(s.genericGetMin, target) <= 0 &&
            UnsignedBinary.compare(s.genericGetMax, target) >= 0
        case _ => true // no stats: cannot prune
      }
    }
    if (inRange.isEmpty) return None

    // 2.+3. one reader for the bloom checks (cached after first touch)
    //    and the surviving row-group scans
    var reader: ParquetFileReader = null
    def theReader(): ParquetFileReader = {
      if (reader == null)
        reader = new ParquetFileReader(conf, file, footer)
      reader
    }
    try {
      val candidates = inRange.filter { b =>
        blooms.computeIfAbsent((file.toString, b), { _ =>
          Option(theReader().getBloomFilterDataReader(blocks.get(b))
            .readBloomFilter(blocks.get(b).getColumns.get(sidCol)))
        }) match {
          case Some(bloom) => bloom.findHash(bloom.hash(target))
          case None => true // no bloom filter: cannot prune
        }
      }
      val columnIO = new ColumnIOFactory().getColumnIO(schema)
      val ci = candidates.iterator
      while (ci.hasNext) {
        val b = ci.next()
        val pages = theReader().readRowGroup(b)
        val recordReader = columnIO.getRecordReader(
          pages, new GroupRecordConverter(schema))
        var i = 0L
        val n = blocks.get(b).getRowCount
        while (i < n) {
          val g = recordReader.read()
          if (g.getString("stream_id", 0) == streamId &&
              g.getString("partition_key", 0) == partitionKey)
            return Some((g.getInteger("partition_id", 0),
              g.getLong("version", 0)))
          i += 1
        }
      }
      None
    } finally if (reader != null) reader.close()
  }

  /** unsigned lexicographic byte compare — parquet's string order */
  private object UnsignedBinary {
    def compare(a: Binary, b: Binary): Int = {
      val x = a.getBytesUnsafe
      val y = b.getBytesUnsafe
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
  }
}
