package graft

import java.nio.file.Files

import graft.sources.Warc

/** WARC reader against spec-constructed archives — the Xls/Cfb
  * from-spec testing precedent: the fixture bytes are built from the
  * ISO 28500 framing rules, not by the code under test's own writer
  * (except the writer-roundtrip case, which pins the writer too). */
class WarcSpec extends SparkSpec {

  private def record(tpe: String, uri: String, body: String,
      extra: String = ""): Array[Byte] = {
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
      .getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: $tpe\r\n" +
      s"WARC-Record-ID: <urn:uuid:$tpe-1>\r\n" +
      "WARC-Date: 2026-08-15T00:00:00Z\r\n" +
      s"WARC-Target-URI: $uri\r\n" + extra +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("Warc: per-record gzip members, headers, exact payloads") {
    val dir = graft.Scratch.dir("warcspec")
    val f = dir.resolve("two.warc.gz")
    // two records, each its OWN gzip member (the spec's .warc.gz shape)
    Files.write(f,
      Warc.gzipMember(record("response", "http://a.example/x", "<p>alpha</p>")) ++
        Warc.gzipMember(record("request", "http://a.example/x", "GET")))
    val rows = Warc.read(spark, f.toString)
      .orderBy("warc_type").collect()
    assert(rows.length == 2)
    val Array(req, resp) = rows
    assert(resp.getAs[String]("warc_type") == "response")
    assert(resp.getAs[String]("target_uri") == "http://a.example/x")
    assert(resp.getAs[String]("warc_date") == "2026-08-15T00:00:00Z")
    assert(resp.getAs[String]("record_id") == "<urn:uuid:response-1>")
    assert(resp.getAs[String]("content_type")
      .startsWith("application/http"))
    val payload = new String(resp.getAs[Array[Byte]]("payload"), "UTF-8")
    assert(payload.endsWith("<p>alpha</p>"))
    assert(resp.getAs[Long]("content_length") == payload.getBytes("UTF-8").length)
    assert(req.getAs[String]("warc_type") == "request")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("Warc: plain .warc, folded header, responses() body split") {
    val dir = graft.Scratch.dir("warcspec")
    val f = dir.resolve("plain.warc")
    // folded header line (continuation starts with a space) + a
    // non-HTTP conversion record that responses() must exclude
    val folded = "WARC-Concurrent-To: <urn:uuid:a>\r\n <urn:uuid:b>\r\n"
    Files.write(f,
      record("response", "http://b.example/y", "<h1>Beta</h1> body", folded) ++
        ("WARC/1.1\r\nWARC-Type: conversion\r\n" +
          "WARC-Record-ID: <urn:uuid:c-1>\r\nWARC-Date: 2026-08-15T00:00:01Z\r\n" +
          "Content-Type: text/plain\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
          .getBytes("UTF-8"))
    assert(Warc.read(spark, f.toString).count() == 2)
    val resp = Warc.responses(spark, f.toString).collect()
    assert(resp.length == 1)
    assert(resp.head.getAs[String]("body") == "<h1>Beta</h1> body")
    // the non-HTTP payload passes through httpBody untouched
    assert(new String(Warc.httpBody("hello".getBytes("UTF-8")), "UTF-8") == "hello")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("Warc: memberOffsets walks RFC 1952 framing incl. optional fields") {
    // GZIPOutputStream never writes FEXTRA/FNAME/FCOMMENT/FHCRC, so the
    // skip logic gets a HAND-FRAMED member: deflate(nowrap) + a header
    // carrying FEXTRA (4 bytes) + FNAME + FCOMMENT, per the spec.
    val rec = record("response", "http://d.example/1", "<p>delta</p>")
    def handMember(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(data); d.finish()
      val buf = new Array[Byte](data.length + 64)
      val n = d.deflate(buf); d.end()
      val crc = new java.util.zip.CRC32(); crc.update(data)
      val bos = new java.io.ByteArrayOutputStream()
      // FLG = FEXTRA | FNAME | FCOMMENT = 4 + 8 + 16
      bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, 28, 0, 0, 0, 0, 0, 3))
      bos.write(Array[Byte](4, 0, 1, 2, 3, 4)) // XLEN=4 LE + 4 extra bytes
      bos.write("name.warc".getBytes("UTF-8")); bos.write(0) // FNAME, NUL
      bos.write("a comment".getBytes("UTF-8")); bos.write(0) // FCOMMENT, NUL
      bos.write(buf, 0, n)
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      bos.write(le32(crc.getValue)); bos.write(le32(data.length.toLong))
      bos.toByteArray
    }
    val plain = Warc.gzipMember(rec)
    val archive = handMember(rec) ++ plain ++ handMember(rec)
    val offs = Warc.memberOffsets(archive, "hand.warc.gz")
    assert(offs.length == 3)
    assert(offs.head._1 == 0)
    // members tile the archive exactly: each starts where the previous
    // ended, and the last ends at the file boundary
    assert(offs.sliding(2).forall { case Vector((o1, l1), (o2, _)) => o1 + l1 == o2 })
    assert(offs.last._1 + offs.last._2 == archive.length)
    assert(offs(1) == (handMember(rec).length.toLong, plain.length.toLong))
    // each range gunzips to the same single record
    offs.foreach { case (o, l) =>
      val m = java.util.Arrays.copyOfRange(archive, o.toInt, (o + l).toInt)
      val rows = Warc.records("m",
        new java.io.ByteArrayInputStream(m)).toList
      assert(rows.length == 1 &&
        rows.head.getString(3) == "http://d.example/1")
    }
    // truncated deflate stream fails loudly
    intercept[Exception] {
      Warc.memberOffsets(archive.take(archive.length - 30), "trunc")
    }
  }

  test("Warc: cdx + fetchRecords random-access the archive by range") {
    val dir = graft.Scratch.dir("warcspec")
    val f = dir.resolve("three.warc.gz")
    Files.write(f,
      Warc.gzipMember(record("response", "http://e.example/1", "<p>one</p>")) ++
        Warc.gzipMember(record("response", "http://e.example/2", "<p>two</p>")) ++
        Warc.gzipMember(record("response", "http://e.example/3", "<p>three</p>")))
    val cdx = Warc.cdx(spark, f.toString).orderBy("offset").collect()
    assert(cdx.length == 3)
    assert(cdx.head.getAs[Long]("offset") == 0L)
    // cdx digest == md5 of the payload the plain reader sees
    val byUri = Warc.read(spark, f.toString).collect()
      .map(r => r.getString(3) -> r.getAs[Array[Byte]](7)).toMap
    cdx.foreach { r =>
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(byUri(r.getAs[String]("target_uri")))
        .map(x => f"$x%02x").mkString
      assert(r.getAs[String]("digest") == expect)
    }
    // range fetch returns the identical records
    val fetched = Warc.fetchRecords(Warc.cdx(spark, f.toString))
      .orderBy("target_uri").collect()
    assert(fetched.length == 3)
    assert(fetched.map(_.getAs[String]("target_uri")).toSeq ==
      Seq("http://e.example/1", "http://e.example/2", "http://e.example/3"))
    assert(new String(Warc.httpBody(fetched(1).getAs[Array[Byte]]("payload")),
      "UTF-8") == "<p>two</p>")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("Warc: advanceCdx appends only unseen archives; chained ingest == batch; idempotent") {
    val dir = graft.Scratch.dir("warcspec_adv")
    def writeArchive(name: String, uris: Seq[String]): Unit =
      Files.write(dir.resolve(name),
        uris.map(u => Warc.gzipMember(record("response", u, s"<p>$u</p>")))
          .reduce(_ ++ _))
    writeArchive("a0.warc.gz", Seq("http://e.example/1", "http://e.example/2"))
    val standing0 = Warc.cdx(spark, dir.resolve("a0.warc.gz").toString)
      .localCheckpoint(true)
    // two more archives land; advance must index ONLY those
    writeArchive("a1.warc.gz", Seq("http://e.example/3"))
    writeArchive("a2.warc.gz", Seq("http://e.example/4", "http://e.example/5"))
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select("file", "offset", "length", "target_uri", "digest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4))).toSet
    val advanced = Warc.advanceCdx(standing0, dir.toString).localCheckpoint(true)
    val batch = Warc.cdx(spark, dir.toString)
    assert(asSet(advanced) == asSet(batch), "chained ingest drifted from batch build")
    assert(asSet(advanced).size == 5)
    // idempotent: re-offering the same directory appends nothing
    assert(asSet(Warc.advanceCdx(advanced, dir.toString)) == asSet(advanced))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("Warc: malformed framing fails loudly, truncation detected") {
    val dir = graft.Scratch.dir("warcspec")
    val bad = dir.resolve("bad.warc")
    Files.write(bad, "HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8"))
    val e1 = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, bad.toString).count()
    }
    assert(e1.getMessage.contains("expected WARC version line") ||
      Option(e1.getCause).exists(_.getMessage.contains("expected WARC version line")))
    val trunc = dir.resolve("trunc.warc")
    val full = record("response", "http://c.example/z", "<p>gamma</p>")
    Files.write(trunc, full.take(full.length - 20))
    val e2 = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, trunc.toString).count()
    }
    assert(e2.getMessage.contains("truncated WARC payload") ||
      Option(e2.getCause).exists(_.getMessage.contains("truncated WARC payload")))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
