package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native WARC reader — the wire format real crawl corpora land in
  * (ISO 28500 / the public WARC 1.0–1.1 specification), implemented
  * from the spec with no external dependencies — the [[Xls]]/[[Cfb]]
  * from-spec precedent applied to the crawl boundary, so the q193/q194
  * extraction chain can run on actual crawl archives instead of a
  * pre-parsed parquet column.
  *
  * Record framing (spec §4): a version line `WARC/1.0` or `WARC/1.1`,
  * named headers one per CRLF line (continuation lines folded per the
  * grammar), an empty line, exactly `Content-Length` payload octets,
  * then two CRLFs. In a `.warc.gz`, each record is its own gzip MEMBER
  * (the spec's annex recommendation — that per-record member boundary
  * is what makes huge archives seekable); `GZIPInputStream` consumes
  * concatenated members natively, and plain `.warc` is detected by the
  * absent 1f-8b magic.
  *
  * Scale shape: the unit of parallelism is the FILE — gzip members
  * force sequential decode within one archive, so a 100 TB crawl is
  * thousands of ~1 GB warcs read one-per-task (`binaryFiles`, the
  * layout CommonCrawl actually ships). Records stream off the
  * decompressor one at a time (constant memory per task, no whole-file
  * buffering), and malformed framing fails LOUDLY with file context —
  * a crawl job must quarantine a truncated archive, not misread it.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("payload_digest", StringType, nullable = true)))

  /** Every WARC record under `path` (a file, glob, or directory of
    * `.warc` / `.warc.gz`), one row per record, one task per archive. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path).flatMap {
      case (file, pds) => records(file, pds.open())
    }
    spark.createDataFrame(rows, schema)
  }

  /** `read` restricted to response records, with the HTTP body split
    * out of the payload: everything after the first CRLF CRLF when the
    * payload is an HTTP message (spec: content-type
    * application/http), the whole payload otherwise — the step every
    * text pipeline wants before [[graft.text.TextExtract]]. */
  def responses(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // codegen split, not a UDF: decode the payload as UTF-8 text (this
    // helper is for TEXT pipelines; binary bodies stay in `payload`)
    // and take everything after the first CRLF CRLF of an HTTP message
    val s = col("payload").cast("string")
    val pos = instr(s, "\r\n\r\n")
    val body = when(!s.startsWith("HTTP/"), s)
      .when(pos > 0, substr(s, pos + 4))
      .otherwise(lit("")) // header-only message
    read(spark, path)
      .filter(col("warc_type") === "response")
      .withColumn("body", body)
  }

  /** Iterate records off one (possibly multi-member-gzip) archive
    * stream; closes the stream when exhausted. */
  def records(file: String, raw: InputStream): Iterator[Row] = {
    val buf = new BufferedInputStream(raw, 1 << 16)
    buf.mark(2)
    val m0 = buf.read(); val m1 = buf.read()
    buf.reset()
    val in: InputStream =
      if (m0 == 0x1f && m1 == 0x8b) new GZIPInputStream(buf, 1 << 16)
      else buf

    new Iterator[Row] {
      private var nextRow: Row = null
      private var done = false

      private def advance(): Unit = {
        if (nextRow != null || done) return
        // tolerate inter-record CRLFs/blank lines before the version line
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) { done = true; in.close(); return }
        require(line == "WARC/1.0" || line == "WARC/1.1",
          s"$file: expected WARC version line, got '$line'")
        val headers = mutable.LinkedHashMap.empty[String, String]
        var last: String = null
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          if ((h.head == ' ' || h.head == '\t') && last != null)
            headers(last) = headers(last) + " " + h.trim // folded line
          else {
            val i = h.indexOf(':')
            require(i > 0, s"$file: malformed WARC header line '$h'")
            last = h.substring(0, i).trim.toLowerCase
            headers(last) = h.substring(i + 1).trim
          }
          h = readLine(in)
        }
        require(h != null, s"$file: EOF inside WARC record headers")
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"$file: WARC record without Content-Length")).toLong
        val payload = readExactly(in, len, file)
        nextRow = Row(file,
          headers.get("warc-type").orNull,
          headers.get("warc-record-id").orNull,
          headers.get("warc-target-uri").orNull,
          headers.get("warc-date").orNull,
          headers.get("content-type").orNull,
          len, payload,
          headers.get("warc-payload-digest").orNull)
      }

      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): Row = {
        advance()
        if (nextRow == null) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }
  }

  /** The body of an HTTP message payload (bytes after the first
    * CRLF CRLF); the payload itself when it isn't an HTTP message. */
  def httpBody(p: Array[Byte]): Array[Byte] = {
    val isHttp = p.length >= 5 && p(0) == 'H' && p(1) == 'T' &&
      p(2) == 'T' && p(3) == 'P' && p(4) == '/'
    if (!isHttp) return p
    var i = 0
    while (i + 3 < p.length) {
      if (p(i) == '\r' && p(i + 1) == '\n' && p(i + 2) == '\r' && p(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(p, i + 4, p.length)
      i += 1
    }
    Array.emptyByteArray // header-only message
  }

  /** One CRLF- (or bare-LF-) terminated line as UTF-8, without the
    * terminator; null at EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val out = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { out.write(b); b = in.read() }
    val bytes = out.toByteArray
    val n = if (bytes.nonEmpty && bytes.last == '\r') bytes.length - 1 else bytes.length
    new String(bytes, 0, n, "UTF-8")
  }

  private def readExactly(in: InputStream, n: Long, file: String): Array[Byte] = {
    require(n <= Int.MaxValue, s"$file: payload over 2 GiB not supported")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val k = in.read(out, off, n.toInt - off)
      if (k < 0) throw new EOFException(
        s"$file: truncated WARC payload (got $off of $n bytes)")
      off += k
    }
    out
  }

  // ---------------------------------------------------------------- write

  /** Serialize one WARC record (version line, headers, payload, the
    * spec's two trailing CRLFs) — UTF-8 headers, raw payload octets. */
  def recordBytes(warcType: String, targetUri: String, date: String,
      recordId: String, contentType: String, payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    sb.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    sb.append("WARC-Date: ").append(date).append("\r\n")
    if (targetUri != null)
      sb.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    extraHeaders.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.result().getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  // ------------------------------------------------------------------ cdx

  /** CDX index schema — the third standard crawl artifact (WARC carries
    * the records, WET the derived text, CDX the random-access index):
    * one row per WARC record with its gzip MEMBER's byte range in the
    * archive, so a reader can seek straight to any record without
    * scanning the archive — the contract CommonCrawl's cdx files
    * publish (offset/length/filename columns of the public CDXJ
    * convention; the md5 payload digest is the house-portable stand-in
    * for its sha1). */
  val cdxSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("digest", StringType, nullable = false)))

  /** Build the CDX index over every `.warc.gz` under `path`: walk each
    * archive's gzip members ([[memberOffsets]] — RFC 1952 framing from
    * the spec), parse the one record inside each member, and emit its
    * (offset, length) range plus identity headers and payload digest.
    * One task per archive (the read()/WET convention); the indexer
    * holds one archive in task memory — real crawl shards are ~1 GB,
    * the size a fetcher fleet rotates at, which fits task memory by
    * design. */
  def cdx(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path).flatMap {
      case (file, pds) =>
        val bytes = pds.toArray()
        memberOffsets(bytes, file).iterator.map { case (off, len) =>
          val member = java.util.Arrays.copyOfRange(
            bytes, off.toInt, (off + len).toInt)
          val rec = records(file, new java.io.ByteArrayInputStream(member)).next()
          Row(file, off, len, rec.getString(1), rec.getString(3),
            rec.getLong(6), md5hex(rec.getAs[Array[Byte]](7)))
        }
    }
    spark.createDataFrame(rows, cdxSchema)
  }

  /** INCREMENTAL CDX maintenance — the advanceIndex lifecycle the
    * fingerprint and IVF indexes already have, applied to the archive
    * index: append the CDX rows of archives the standing index has
    * never seen, WITHOUT re-walking indexed ones (at 100 TB the
    * standing CDX covers millions of immutable archives; only the
    * fetcher fleet's newest shards should ever be opened). Exact by
    * per-archive independence — every CDX row derives from its archive
    * alone, so cdx(A ∪ B) = cdx(A) ∪ cdx(B) row for row, which is the
    * oracle identity (chained ingest ≡ one batch build). Idempotent:
    * a re-offered archive is pruned from the FILE MANIFEST before any
    * byte is read (driver-side and archive-manifest-sized — the same
    * contract as the fetch planner's file list). */
  def advanceCdx(standing: DataFrame, path: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = standing.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val offered = fs.listStatus(p).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
    val seen = standing.select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet // archive-manifest-sized
    val fresh = offered.filterNot(seen).sorted
    if (fresh.isEmpty) standing
    else standing.unionByName(cdx(spark, fresh.mkString(",")))
  }

  /** (offset, length) of every gzip MEMBER in a `.warc.gz` archive —
    * RFC 1952 framing walked from the spec: the 10-byte fixed header
    * (1f 8b magic, CM=8 deflate, FLG, MTIME, XFL, OS), the optional
    * FEXTRA / FNAME / FCOMMENT / FHCRC fields the flags announce, the
    * deflate stream (its compressed extent measured by the inflater —
    * the only way to find a member's end without a length field), and
    * the 8-byte CRC32 + ISIZE trailer. Malformed framing fails loudly
    * with file context (the truncated-archive quarantine contract). */
  def memberOffsets(bytes: Array[Byte], file: String = "<archive>"): Vector[(Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long)]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      require(pos + 10 <= bytes.length &&
        (bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
        s"$file: no gzip member magic at offset $pos")
      require(bytes(pos + 2) == 8, s"$file: unsupported CM at offset $pos")
      val flg = bytes(pos + 3) & 0xff
      pos += 10
      if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian length + data
        val xlen = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
        pos += 2 + xlen
      }
      if ((flg & 8) != 0) { while (bytes(pos) != 0) pos += 1; pos += 1 } // FNAME
      if ((flg & 16) != 0) { while (bytes(pos) != 0) pos += 1; pos += 1 } // FCOMMENT
      if ((flg & 2) != 0) pos += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, pos, bytes.length - pos)
        val sink = new Array[Byte](1 << 16)
        while (!inf.finished()) {
          if (inf.inflate(sink) == 0 && inf.needsInput())
            throw new EOFException(s"$file: truncated deflate stream at member $start")
        }
        pos += inf.getBytesRead.toInt + 8 // deflate extent + CRC32 + ISIZE
      } finally inf.end()
      require(pos <= bytes.length,
        s"$file: gzip member at $start runs past end of archive")
      out += ((start.toLong, (pos - start).toLong))
    }
    out.result()
  }

  /** Range-fetch the WARC record behind every (file, offset, length)
    * row of a CDX index — the read pattern a CDX exists for: seek, read
    * exactly `length` bytes, gunzip the single member, parse. The index
    * is repartitioned by archive and sorted by offset first, so each
    * task opens ONE file handle per archive run and reads forward —
    * sequential range reads, never one open per record. Returns
    * [[schema]] rows. */
  def fetchRecords(index: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = index.sparkSession
    val rows = index.select(col("file"), col("offset"), col("length"))
      .repartition(col("file"))
      .sortWithinPartitions(col("file"), col("offset"))
      .rdd.mapPartitions { it =>
        var raf: java.io.RandomAccessFile = null
        var cur: String = null
        val base = it.map { r =>
          val (f, off, len) = (r.getString(0), r.getLong(1), r.getLong(2))
          if (f != cur) {
            if (raf != null) raf.close()
            raf = new java.io.RandomAccessFile(
              new java.io.File(java.net.URI.create(f)), "r")
            cur = f
          }
          raf.seek(off)
          val buf = new Array[Byte](len.toInt)
          raf.readFully(buf)
          records(f, new java.io.ByteArrayInputStream(buf)).next()
        }
        new Iterator[Row] { // close the last handle when the task drains
          override def hasNext: Boolean = {
            val h = base.hasNext
            if (!h && raf != null) { raf.close(); raf = null }
            h
          }
          override def next(): Row = base.next()
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Resolve `revisit` records against the archive's `response`
    * records — the wire-level dedup convention real crawlers ship
    * (Heritrix / the IIPC identical-payload-digest profile): a fetch
    * whose payload digest matches something already archived is written
    * as a payload-less revisit record carrying `WARC-Payload-Digest`,
    * and a reader materializes the bytes by digest lookup. Returns
    * [[schema]]-shaped rows: responses pass through; each revisit gets
    * the payload of the response sharing its digest (content_length
    * updated to the resolved octets; `warc_type` stays `revisit` so
    * provenance survives).
    *
    * Scale shape: the digest→payload table is the DISTINCT payload
    * vocabulary — the dedup mass, sublinear in archive size — keyed and
    * equi-joined on the digest; the revisit stream is never compared
    * all-pairs and the response stream passes through untouched. Ties
    * (several responses, one digest) resolve to the smallest record id
    * — identical bytes by the profile's own premise, pinned
    * deterministic anyway. */
  def resolveRevisits(recs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val resp = recs.filter(col("warc_type") === "response")
    val byDigest = resp
      .select(coalesce(col("payload_digest"),
          concat(lit("md5:"), md5(col("payload")))).as("pd"),
        col("record_id").as("rid"), col("payload").as("orig"))
      .groupBy(col("pd"))
      .agg(min_by(col("orig"), col("rid")).as("orig"))
    val resolved = recs.filter(col("warc_type") === "revisit")
      .drop("payload", "content_length")
      .join(byDigest, col("payload_digest") === col("pd"))
      .select(col("file"), col("warc_type"), col("record_id"),
        col("target_uri"), col("warc_date"), col("content_type"),
        length(col("orig")).cast("long").as("content_length"),
        col("orig").as("payload"), col("payload_digest"))
    resp.unionByName(resolved)
  }

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  /** One record as its own gzip member (the spec's `.warc.gz` shape). */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record); gz.finish(); gz.close()
    bos.toByteArray
  }
}
