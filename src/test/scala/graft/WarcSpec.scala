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
