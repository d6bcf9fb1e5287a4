package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WET-style (WARC conversion-record) text ingestion — the Common Crawl
  * interchange shape a 100 TB pretraining pipeline actually starts
  * from: files of concatenated records, each a small header block
  * (`WARC/1.0`, `WARC-Target-URI`, `Content-Length`) terminated by a
  * blank line, then the extracted-text payload, then a blank-line
  * trailer. The reference has no source surface at all (SURVEY §2.1);
  * this is a north-star ingest format next to [[Tables.readAs]]'s
  * json/orc/csv codecs.
  *
  * Scale shape: one file = one task (`wholetext`), which is not a
  * compromise but the native unit of this format — CC WET shards are
  * ~100-150 MB gzip and gzip is unsplittable anyway, so the
  * per-file-task layout is exactly how every production WET reader
  * parallelizes; 100 TB arrives as ~1M files and schedules as ~1M
  * tasks. Record fan-out (`split` + `explode`) and the header/payload
  * regexes all pipeline inside the task — no shuffle anywhere in the
  * read.
  *
  * Parsing contract (documented bounds of a regex-based reader):
  * records split on the literal `WARC/1.0\r\n` version-line string —
  * UNANCHORED, so a payload containing that literal ANYWHERE (even
  * mid-line, e.g. prose quoting a WARC header) mis-splits its record
  * into fragments: the first fragment loses its payload tail and the
  * later fragment can surface as a phantom record whose header
  * regexes match stray payload text. The payload is the span from the
  * first blank line to the LAST trailing blank line of the record
  * (greedy, so internal `\r\n\r\n` inside a payload survives); a
  * payload ending in a blank line also truncates. The
  * `content_length` column carries the header's byte count so
  * consumers can VALIDATE (`content_length = octet_length(text)`) and
  * quarantine the vanishing minority of such records — including both
  * fragments of a mis-split (the phantom either lacks a parsable
  * header or fails the length check) — instead of trusting them
  * silently. (A byte-offset streaming parser is what the
  * format specifies; over `wholetext` strings Spark exposes no binary
  * slicing, so validation-over-trust is the honest contract.)
  */
object Wet {

  private val Sep = "\r\n\r\n"

  /** Write documents as WET-style conversion records, one record per
    * row, `numFiles` output files (partitioned by uri hash —
    * deterministic layout). `Content-Length` is the payload's UTF-8
    * byte count, per the WARC spec.
    */
  def writeWet(
      docs: DataFrame,
      uriCol: String,
      textCol: String,
      path: String,
      numFiles: Int = 16): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
      col(uriCol),
      lit("\r\nContent-Length: "),
      octet_length(col(textCol)).cast("string"),
      lit(Sep), col(textCol), lit(Sep))
    docs.select(col(uriCol).as("__u"), rec.as("value"))
      .repartition(numFiles, col("__u"))
      .select(col("value"))
      .write.mode("overwrite").text(path)
  }

  /** The record fan-out + header/payload parse, shared verbatim by the
    * batch and streaming readers (same stage on the backfill and the
    * live crawl-ingest path).
    */
  private def parseRecords(files: DataFrame): DataFrame =
    files
      .select(input_file_name().as("wet_file"),
        explode(split(col("value"), "WARC/1\\.0\r\n")).as("__rec"))
      .filter(length(col("__rec")) > 0)
      .select(col("wet_file"),
        regexp_extract(col("__rec"),
          "WARC-Target-URI: ([^\r\n]+)", 1).as("uri"),
        regexp_extract(col("__rec"),
          "Content-Length: ([0-9]+)", 1).cast("long").as("content_length"),
        regexp_extract(col("__rec"),
          "(?s)\r\n\r\n(.*)\r\n\r\n[\r\n]*$", 1).as("text"))

  /** Read a directory of WET-style files into
    * `(wet_file, uri, content_length, text)` — `content_length` is the
    * header's declared byte count (see the validation contract in the
    * object doc), `text` the parsed payload.
    */
  def readWet(spark: SparkSession, path: String): DataFrame =
    parseRecords(
      spark.read.format("text").option("wholetext", "true").load(path))

  /** [[readWet]] as an unbounded STREAM over a landing directory — the
    * live crawl-ingest shape: WET shards land as files, each new file
    * becomes one streaming task, records parse with the exact batch
    * logic (shared [[parseRecords]]), and the result composes with the
    * stateless curation stages ([[graft.operators.Pipeline
    * .curateStream]]). File-granular exactly-once comes from the file
    * source's own tracking; the parse itself is stateless.
    */
  def readWetStream(spark: SparkSession, path: String): DataFrame =
    parseRecords(
      spark.readStream.format("text").option("wholetext", "true")
        .load(path))
}
