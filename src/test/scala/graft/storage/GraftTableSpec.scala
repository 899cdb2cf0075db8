package graft.storage

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Transliterates the reference pg_regress suites (create/load/query/alter/
  * truncate/drop — the sql and input dirs of `/root/reference/`) onto the
  * GraftTable layer. */
class GraftTableSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("handle", IntegerType),
    StructField("name", StringType),
    StructField("rating", IntegerType)))

  test("create: empty table is queryable, count 0 (input/create.source:47-49)") {
    val loc = tmpDir("graft-create")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    assert(t.read().count() === 0)
    assert(t.rowCountFromMetadata() === 0)
    GraftTable.drop(s"$loc/tbl")
  }

  test("create: option validation (input/create.source:12-32)") {
    val loc = tmpDir("graft-opts")
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, s"$loc/bad1", schema,
        GraftTableOptions(compression = "invalid_compression_type"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, s"$loc/bad2", schema,
        GraftTableOptions(stripeRowCount = 999))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, s"$loc/bad3", schema,
        GraftTableOptions(blockRowCount = 100001))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, s"$loc/bad4", schema,
        GraftTableOptions(stripeRowCount = 2000, blockRowCount = 4000))
    }
  }

  test("load + append twice doubles counts (input/block_filtering.source:54-58)") {
    import spark.implicits._
    val loc = tmpDir("graft-append")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    val df = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
      .toDF("handle", "name", "rating")
    assert(t.append(df) === 3)
    assert(t.read().count() === 3)
    assert(t.append(df) === 3)
    assert(t.read().count() === 6)
    assert(t.rowCountFromMetadata() === 6)
    // re-open sees committed state (atomic metadata rename)
    val t2 = GraftTable.open(spark, s"$loc/tbl")
    assert(t2.read().count() === 6)
    GraftTable.drop(s"$loc/tbl")
  }

  test("COPY FROM csv with and without column list (input/load.source:26-40)") {
    val loc = tmpDir("graft-copy")
    val csv = s"$loc/in.csv"
    Files.write(Paths.get(csv), "1,first,5\n2,second,7\n".getBytes)
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    assert(t.copyFromCsv(csv) === 2)
    assert(t.read().orderBy("handle").collect().map(_.getString(1)).toSeq
      === Seq("first", "second"))
    // column-list COPY: missing column -> null
    val csv2 = s"$loc/in2.csv"
    Files.write(Paths.get(csv2), "3,9\n".getBytes)
    assert(t.copyFromCsv(csv2, columns = Seq("handle", "rating")) === 1)
    val row3 = t.read().filter(col("handle") === 3).collect().head
    assert(row3.isNullAt(1) && row3.getInt(2) === 9)
    GraftTable.drop(s"$loc/tbl")
  }

  test("COPY FROM error paths: missing file fails; malformed row aborts atomically (input/load.source)") {
    import spark.implicits._
    val loc = tmpDir("graft-copyerr")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "keep", 1)).toDF("handle", "name", "rating"))
    // missing file: immediate error (load.source: COPY from nonexistent path)
    intercept[Exception](t.copyFromCsv(s"$loc/does_not_exist.csv"))
    // malformed row (text in an int column): FAILFAST default aborts the
    // WHOLE load and the table is unchanged — COPY is all-or-nothing,
    // matching the reference's transactional COPY error case
    val bad = s"$loc/bad.csv"
    Files.write(Paths.get(bad), "2,ok,7\n3,broken,not_an_int\n".getBytes)
    intercept[Exception](t.copyFromCsv(bad))
    assert(t.read().count() === 1, "failed COPY must not commit any rows")
    assert(t.rowCountFromMetadata() === 1)
    // PERMISSIVE opt-in: bad fields salvaged as NULL, load commits
    assert(t.copyFromCsv(bad, mode = "PERMISSIVE") === 2)
    val r3 = t.read().filter(col("handle") === 3).collect().head
    assert(r3.isNullAt(2), "permissive mode nulls the malformed field")
    // table still fully usable after the failed + permissive loads
    assert(t.read().count() === 3)
    GraftTable.drop(s"$loc/tbl")
  }

  test("COPY FROM stream/program sources share file-COPY semantics (cstore_fdw.c:539-642)") {
    import spark.implicits._
    val loc = tmpDir("graft-copystream")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    // iterator source
    assert(t.copyFromCsv(Iterator("1,first,5", "2,second,7"),
      header = false, columns = Seq.empty, mode = "FAILFAST") === 2)
    assert(t.read().count() === 2)
    // Reader source with a column list: missing column -> null
    assert(t.copyFromCsv(new java.io.StringReader("3,9\n"),
      header = false, columns = Seq("handle", "rating"), mode = "FAILFAST") === 1)
    val row3 = t.read().filter(col("handle") === 3).collect().head
    assert(row3.isNullAt(1) && row3.getInt(2) === 9)
    // malformed row under FAILFAST aborts atomically, exactly like the file form
    intercept[Exception](t.copyFromCsv(Iterator("4,ok,7", "5,broken,not_an_int"),
      header = false, columns = Seq.empty, mode = "FAILFAST"))
    assert(t.rowCountFromMetadata() === 3, "failed stream COPY must not commit")
    // PERMISSIVE salvages
    assert(t.copyFromCsv(Iterator("5,bad,not_an_int"),
      header = false, columns = Seq.empty, mode = "PERMISSIVE") === 1)
    assert(t.read().filter(col("handle") === 5).collect().head.isNullAt(2))
    // PROGRAM source: stdout becomes the CSV; non-zero exit aborts
    assert(t.copyFromProgram(Seq("sh", "-c", "printf '6,prog,1\\n7,prog2,2\\n'")) === 2)
    assert(t.read().count() === 6)
    intercept[IllegalArgumentException](
      t.copyFromProgram(Seq("sh", "-c", "printf '8,x,1\\n'; exit 3")))
    assert(t.rowCountFromMetadata() === 6, "failing program must not commit rows")
    GraftTable.drop(s"$loc/tbl")
  }

  test("COPY TO round-trips (cstore_fdw.c:651-707)") {
    import spark.implicits._
    val loc = tmpDir("graft-copyto")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "x", 2)).toDF("handle", "name", "rating"))
    t.copyToCsv(s"$loc/out")
    val back = spark.read.option("header", "true").schema(schema).csv(s"$loc/out")
    assert(back.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
      === Seq((1, "x", 2)))
    GraftTable.drop(s"$loc/tbl")
  }

  test("COPY TO stream and PROGRAM sinks round-trip with row-count returns") {
    import spark.implicits._
    val loc = tmpDir("graft-copyto-sink")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "it's \"quoted\"", 2), (2, null.asInstanceOf[String], 5))
      .toDF("handle", "name", "rating"))
    // stream sink: rows as CSV through a Writer, row count returned
    val sw = new java.io.StringWriter()
    assert(t.copyToCsv(sw, header = true) === 2L)
    val tmp = java.nio.file.Files.createTempFile("copyto", ".csv")
    java.nio.file.Files.writeString(tmp, sw.toString)
    val back = spark.read.option("header", "true").schema(schema).csv(tmp.toString)
    assert(back.orderBy("handle").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
      === Seq((1, "it's \"quoted\"", 2), (2, null, 5)),
      "quoting and nulls must survive the stream round-trip")
    // PROGRAM sink: the table streams into the command's stdin; its
    // output file round-trips; a failing program fails the COPY
    val progOut = tmpDir("graft-copyto-prog") + "/out.csv"
    assert(t.copyToProgram(Seq("sh", "-c", s"cat > $progOut")) === 2L)
    val viaProg = spark.read.option("header", "true").schema(schema).csv(progOut)
    assert(viaProg.count() === 2L)
    intercept[IllegalArgumentException](
      t.copyToProgram(Seq("sh", "-c", "cat > /dev/null; exit 3")))
    // a program that stops reading early but exits 0 (the `head` shape)
    // is a SUCCESS — the broken pipe must not surface as an opaque IO
    // error; a program that dies early must report its EXIT STATUS.
    // The table must overflow the OS pipe buffer for the pipe to
    // actually break mid-write.
    val big = GraftTable.create(spark, s"$loc/big", schema)
    big.append((0 until 5000).map(i => (i, "x" * 40, i % 5))
      .toDF("handle", "name", "rating"))
    big.copyToProgram(Seq("sh", "-c", "head -n 1 > /dev/null"))
    val died = intercept[IllegalArgumentException](
      big.copyToProgram(Seq("sh", "-c", "exit 7")))
    assert(died.getMessage.contains("exited with 7"),
      "early death must report the exit status, not a broken pipe")
    GraftTable.drop(s"$loc/big")
    java.nio.file.Files.delete(tmp)
    GraftTable.drop(s"$loc/tbl")
  }

  test("COPY format options: TSV + custom NULL round-trip (DELIMITER/QUOTE/NULL)") {
    import spark.implicits._
    val loc = tmpDir("graft-copyfmt")
    val fmt = GraftTable.CopyFormat(delimiter = "\t", nullValue = "\\N")
    val t = GraftTable.create(spark, s"$loc/src", schema)
    // values exercise the format: an embedded comma (NOT the delimiter
    // now), an embedded tab (IS the delimiter — must quote), and a null
    // that must render as \N and parse back to null, not ""
    t.append(Seq((1, "a,b", 2), (2, "has\ttab", 5),
      (3, null.asInstanceOf[String], 7)).toDF("handle", "name", "rating"))
    val sw = new java.io.StringWriter()
    assert(t.copyToCsv(sw, header = true, fmt) === 3L, "COPY TO returns row count")
    val text = sw.toString
    assert(text.linesIterator.next() === "handle\tname\trating", "TSV header")
    assert(text.contains("\\N"), s"custom NULL token must appear:\n$text")
    val back = GraftTable.create(spark, s"$loc/dst", schema)
    val n = back.copyFromCsv(new java.io.StringReader(text),
      header = true, Seq.empty, "FAILFAST", fmt)
    assert(n === 3L, "COPY FROM returns row count")
    assert(back.read().orderBy("handle").collect().map(_.toSeq).toSeq ===
      Seq(Seq(1, "a,b", 2), Seq(2, "has\ttab", 5), Seq(3, null, 7)),
      "tabs, commas, and NULLs must survive the TSV round-trip")
    // the path-target export honors the same options
    val outDir = tmpDir("graft-copyfmt-out") + "/tsv"
    t.copyToCsv(outDir, header = true, fmt)
    val viaPath = spark.read.option("header", "true").option("sep", "\t")
      .option("nullValue", "\\N").schema(schema).csv(outDir)
    assert(viaPath.count() === 3L)
    assert(viaPath.filter(col("name").isNull).count() === 1L)
    // option validation: multi-char delimiter and quote==delimiter fail
    intercept[IllegalArgumentException](
      GraftTable.CopyFormat(delimiter = ",,").validate())
    intercept[IllegalArgumentException](
      GraftTable.CopyFormat(delimiter = "\"").validate())
    GraftTable.drop(s"$loc/src"); GraftTable.drop(s"$loc/dst")
  }

  test("compactSmall coalesces only the small-file tail, healthy files untouched") {
    import spark.implicits._
    val loc = tmpDir("graft-compact-small")
    val t = GraftTable.create(spark, s"$loc/tbl",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    // one healthy file (10k rows) + four micro-appends (the ingest tail)
    t.append((0 until 10000).map(i => (i, s"value-$i")).toDF("id", "v").coalesce(1))
    for (base <- 0 until 4)
      t.append(Seq((20000 + base, s"s$base")).toDF("id", "v").coalesce(1))
    assert(t.committedFiles.size === 5)
    val (fs, _) = {
      val p = new org.apache.hadoop.fs.Path(s"$loc/tbl")
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    val bigFile = t.committedFiles.maxBy(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)
    val bigLen = fs.getFileStatus(new org.apache.hadoop.fs.Path(bigFile)).getLen
    val before = t.read().orderBy("id").collect().map(_.toSeq).toSeq

    // threshold strictly between the tail and the healthy file
    assert(t.compactSmall(smallBytes = bigLen) === 4)
    assert(t.committedFiles.size === 2, "4 small files -> 1; healthy file kept")
    assert(t.committedFiles.contains(bigFile),
      "the healthy file must keep its identity (no rewrite)")
    assert(t.rowCountFromMetadata() === 10004L)
    assert(t.read().orderBy("id").collect().map(_.toSeq).toSeq === before)
    // idempotent: the merged tail is no longer small relative to itself
    assert(t.compactSmall(smallBytes = 1L) === 0)
    GraftTable.drop(s"$loc/tbl")
  }

  test("compactOverlapping folds only range-overlapping files; disjoint files keep identity") {
    import spark.implicits._
    val loc = tmpDir("graft-compact-overlap")
    val t = GraftTable.create(spark, s"$loc/tbl",
      StructType(Seq(StructField("id", IntegerType), StructField("v", StringType))),
      GraftTableOptions(sortBy = Seq("id")))
    def appendRange(r: Range): String = {
      val before = t.committedFiles.toSet
      t.append(r.map(i => (i, s"value-$i")).toDF("id", "v").coalesce(1))
      (t.committedFiles.toSet -- before).head
    }
    val f1 = appendRange(0 until 100)     // [0, 99]   disjoint
    val f2 = appendRange(100 until 200)   // [100, 199]   ┐
    val f3 = appendRange(500 until 600)   // [500, 599] disjoint
    val f4 = appendRange(150 until 260)   // [150, 259]   ├ one overlap chain
    val f5 = appendRange(240 until 300)   // [240, 299]   ┘
    val before = t.read().orderBy("id").collect().map(_.toSeq).toSeq

    assert(t.compactOverlapping() === 3,
      "exactly the f2/f4/f5 chain is overlapping")
    assert(t.committedFiles.contains(f1) && t.committedFiles.contains(f3),
      "range-disjoint files must keep their identity (no rewrite)")
    assert(!Seq(f2, f4, f5).exists(t.committedFiles.contains),
      "every member of the overlap chain is replaced")
    assert(t.read().orderBy("id").collect().map(_.toSeq).toSeq === before)
    // the repaired layout is pairwise range-disjoint: a point probe
    // prunes to one file again
    val ranges = t.sortFileRanges.get
    val bounds = ranges.stats.values.toSeq.map { case (mn, mx, _) =>
      (mn.toInt, mx.toInt)
    }.sortBy(_._1)
    bounds.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(bMin > aMax, s"post-compaction files still overlap: $bounds")
      case _ => ()
    }
    // idempotent: a disjoint table has nothing to fold
    assert(t.compactOverlapping() === 0)
    GraftTable.drop(s"$loc/tbl")
  }

  test("compactOverlapping: cross-bucket range overlap is legitimate, never folded") {
    import spark.implicits._
    val loc = tmpDir("graft-compact-overlap-bkt")
    val t = GraftTable.create(spark, s"$loc/tbl",
      StructType(Seq(StructField("id", IntegerType), StructField("v", StringType))),
      GraftTableOptions(sortBy = Seq("id"), bucketBy = Seq("id"), bucketCount = 2))
    // every append spans both buckets, so per-bucket files interleave in
    // id range ACROSS buckets while staying disjoint WITHIN each bucket:
    // bucket 0 gets evens, bucket 1 odds — both cover [lo, hi]
    t.append((0 until 100).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.append((100 until 200).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val files = t.committedFiles
    assert(t.compactOverlapping() === 0,
      "within-bucket ranges are disjoint; the sweep must be per bucket")
    assert(t.committedFiles === files, "nothing rewritten")
    // an overlapping append INSIDE a bucket is still caught
    t.append((50 until 150).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    assert(t.compactOverlapping() > 0)
    val post = t.sortFileRanges.get
    t.committedFiles.groupBy(f => GraftTable.fileBucket(f).getOrElse(-1))
      .foreach { case (_, fs) =>
        val bounds = fs.flatMap(f => post.stats.get(
          new org.apache.hadoop.fs.Path(f).toUri.getPath))
          .map { case (mn, mx, _) => (mn.toInt, mx.toInt) }.sortBy(_._1)
        bounds.sliding(2).foreach {
          case Seq((_, aMax), (bMin, _)) =>
            assert(bMin > aMax, s"bucket still overlapping: $bounds")
          case _ => ()
        }
      }
    GraftTable.drop(s"$loc/tbl")
  }

  test("compact merges small files, preserves rows/zone-maps/stream watermarks") {
    import spark.implicits._
    val loc = tmpDir("graft-compact")
    val t = GraftTable.create(spark, s"$loc/tbl",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    // five micro-appends (the streaming-ingest shape) = five files
    for (base <- 0 until 5)
      t.appendStream((base * 10 until base * 10 + 10).map(i => (i, s"v$i"))
        .toDF("id", "v").coalesce(1), "qz", base.toLong)
    assert(t.committedFiles.size === 5)
    val before = t.read().orderBy("id").collect().map(_.toSeq).toSeq

    assert(t.compact() === 1)
    assert(t.committedFiles.size === 1)
    assert(t.rowCountFromMetadata() === 50L)
    assert(t.read().orderBy("id").collect().map(_.toSeq).toSeq === before)
    // zone maps recomputed from the compacted footers still refute
    assert(t.prunedFiles(Seq(org.apache.spark.sql.sources.EqualTo("id", 999))).isEmpty)
    // stream watermark survives: a replay of batch 4 is still a no-op
    assert(t.appendStream(Seq((99, "dup")).toDF("id", "v"), "qz", 4L) === 0L)
    assert(t.rowCountFromMetadata() === 50L)
    // replaced batch dirs stay on disk (in-flight readers may still
    // scan them) until an explicit vacuum reclaims them
    def dataDirCount(): Int = {
      val it = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$loc/tbl/data")).iterator()
      var dirs = 0
      while (it.hasNext) { it.next(); dirs += 1 }
      dirs
    }
    assert(dataDirCount() === 6, "compaction must leave replaced dirs for vacuum")
    // retained snapshots pin the replaced dirs (time travel); only after
    // history expiry does vacuum reclaim them
    assert(t.vacuum() === 0)
    assert(t.expireHistory(keepLast = 1) > 0)
    // the replaced dirs are young (written seconds ago): the in-flight
    // grace spares them until the commit claim grace elapses
    assert(t.vacuum() === 0, "young unreferenced dirs are in-flight-protected")
    withConf("spark.graft.commit.claimGraceMs", "-1") {
      assert(t.vacuum() === 5)
    }
    assert(dataDirCount() === 1)
    assert(t.read().orderBy("id").collect().map(_.toSeq).toSeq === before)
    GraftTable.drop(s"$loc/tbl")
  }

  test("truncate keeps definition, drops data (sql/truncate.sql)") {
    import spark.implicits._
    val loc = tmpDir("graft-trunc")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "x", 2)).toDF("handle", "name", "rating"))
    assert(t.read().count() === 1)
    t.truncate()
    assert(t.read().count() === 0)
    assert(t.rowCountFromMetadata() === 0)
    // still writable after truncate
    t.append(Seq((9, "y", 1)).toDF("handle", "name", "rating"))
    assert(t.read().count() === 1)
    GraftTable.drop(s"$loc/tbl")
  }

  test("drop removes all files (sql/drop.sql)") {
    import spark.implicits._
    val loc = tmpDir("graft-drop")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "x", 2)).toDF("handle", "name", "rating"))
    assert(GraftTable.exists(s"$loc/tbl"))
    GraftTable.drop(s"$loc/tbl")
    assert(!GraftTable.exists(s"$loc/tbl"))
    assert(!Files.exists(Paths.get(s"$loc/tbl")))
  }

  test("table size reflects on-disk bytes (cstore_fdw.c:1183-1229)") {
    import spark.implicits._
    val loc = tmpDir("graft-size")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    val empty = t.tableSize()
    assert(empty > 0) // metadata only
    t.append((1 to 1000).map(i => (i, s"name_$i", i % 7)).toDF("handle", "name", "rating"))
    assert(t.tableSize() > empty)
    GraftTable.drop(s"$loc/tbl")
  }

  test("ADD COLUMN with constant default over old stripes (sql/alter.sql:14-48)") {
    import spark.implicits._
    val loc = tmpDir("graft-alter")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "old", 5)).toDF("handle", "name", "rating"))
    t.addColumn("score", DoubleType, default = 3.5)
    // old file lacks the column -> default synthesized at read
    val oldRow = t.read().filter(col("handle") === 1).collect().head
    assert(oldRow.getDouble(3) === 3.5)
    // new appends carry the column physically
    t.append(Seq((2, "new", 6, 9.0)).toDF("handle", "name", "rating", "score"))
    val rows = t.read().orderBy("handle").collect()
    assert(rows.map(_.getDouble(3)).toSeq === Seq(3.5, 9.0))
    // plain ADD COLUMN (no default) -> nulls
    t.addColumn("note", StringType)
    assert(t.read().filter(col("note").isNull).count() === 2)
    GraftTable.drop(s"$loc/tbl")
  }

  test("appendMergeSchema: novel columns ADD atomically with the batch; plain append drops them") {
    import spark.implicits._
    val loc = tmpDir("graft-msa")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "a", 5)).toDF("handle", "name", "rating"))
    val vBefore = t.version
    // plain append: unknown columns silently align away (documented)
    t.append(Seq((2, "b", 6, "dropped")).toDF("handle", "name", "rating", "extra"))
    assert(t.read().schema.fieldNames.toSeq === Seq("handle", "name", "rating"))
    // schema-evolving append: the column and the rows land in ONE commit
    t.appendMergeSchema(
      Seq((3, "c", 7, "kept")).toDF("handle", "name", "rating", "extra"))
    assert(t.version === vBefore + 2, "evolution is one commit, not ALTER+append")
    assert(t.read().schema.fieldNames.toSeq === Seq("handle", "name", "rating", "extra"))
    val rows = t.read().orderBy("handle").collect()
    assert(rows.map(r => Option(r.getString(3)).orNull).toSeq === Seq(null, null, "kept"),
      "pre-evolution rows read NULL, the evolving batch carries its values")
    // a later plain append in the evolved shape just works
    t.append(Seq((4, "d", 8, "later")).toDF("handle", "name", "rating", "extra"))
    assert(t.read().count() === 4L)
    // no novel columns → byte-identical to a plain append (no schema churn)
    val v4 = t.version
    t.appendMergeSchema(Seq((5, "e", 9)).toDF("handle", "name", "rating"))
    assert(t.version === v4 + 1 &&
      t.read().schema.fieldNames.length === 4)
    // time travel: the pre-evolution snapshot still reads the OLD shape
    assert(t.readVersion(vBefore).schema.fieldNames.toSeq ===
      Seq("handle", "name", "rating"))
    GraftTable.drop(s"$loc/tbl")
  }

  test("re-ADDing a DROPPED column refuses until a full rewrite (no data resurrection)") {
    import spark.implicits._
    val loc = tmpDir("graft-tomb")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "secret", 5)).toDF("handle", "name", "rating"))
    t.dropColumn("name")
    // DROP is metadata-only: the committed file still carries 'secret'.
    // Re-adding the name — by ALTER or by mergeSchema — would resurrect
    // it in pre-drop rows, so both routes refuse with guidance.
    val e1 = intercept[IllegalArgumentException] {
      t.addColumn("name", StringType)
    }
    assert(e1.getMessage.contains("compact"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      t.appendMergeSchema(Seq((2, 6, "new")).toDF("handle", "rating", "name"))
    }
    assert(e2.getMessage.contains("DROPPED"), e2.getMessage)
    assert(t.read().count() === 1L, "the refused evolving append left no rows")
    // a full rewrite materializes the drop; the name is then reusable
    // and pre-drop rows read NULL, never the old values
    t.compact()
    t.addColumn("name", StringType)
    assert(t.read().select("name").collect().map(_.isNullAt(0)).toSeq === Seq(true),
      "the re-added column must read NULL, not the dropped data")
    // TRUNCATE also clears the tombstones: no file remains to resurrect
    val t2 = GraftTable.create(spark, s"$loc/tbl2", schema)
    t2.append(Seq((1, "secret", 5)).toDF("handle", "name", "rating"))
    t2.dropColumn("name")
    t2.truncate()
    t2.addColumn("name", StringType) // no refusal after truncate
    assert(t2.read().count() === 0L)
    GraftTable.drop(s"$loc/tbl2")
    GraftTable.drop(s"$loc/tbl")
  }

  test("mergeSchema novelty honors case-insensitive resolution") {
    import spark.implicits._
    val loc = tmpDir("graft-msa-case")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "a", 5)).toDF("handle", "name", "rating"))
    // 'Rating' is the EXISTING 'rating' under default case-insensitive
    // resolution — committing both would brick every later read with
    // Spark's duplicate-column check
    t.appendMergeSchema(Seq((2, "b", 6)).toDF("handle", "name", "Rating"))
    assert(t.read().schema.fieldNames.toSeq === Seq("handle", "name", "rating"))
    assert(t.read().orderBy("handle").select("rating")
      .collect().map(_.getInt(0)).toSeq === Seq(5, 6))
    GraftTable.drop(s"$loc/tbl")
  }

  test("DROP COLUMN hides data (cstore_fdw.c:1907-1910)") {
    import spark.implicits._
    val loc = tmpDir("graft-dropcol")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "x", 2)).toDF("handle", "name", "rating"))
    t.dropColumn("name")
    assert(t.read().columns.toSeq === Seq("handle", "rating"))
    assert(t.read().collect().head.getInt(1) === 2)
    GraftTable.drop(s"$loc/tbl")
  }

  test("ALTER COLUMN TYPE coercibility (sql/alter.sql:75-83)") {
    import spark.implicits._
    val loc = tmpDir("graft-coerce")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "x", 2)).toDF("handle", "name", "rating"))
    t.alterColumnType("rating", DoubleType) // int -> float OK
    assert(t.read().schema("rating").dataType === DoubleType)
    assert(t.read().collect().head.getDouble(2) === 2.0)
    intercept[IllegalArgumentException] {
      t.alterColumnType("handle", StringType) // not implicitly coercible
    }
    intercept[IllegalArgumentException] {
      t.alterColumnType("rating", IntegerType) // float -> int rejected
    }
    GraftTable.drop(s"$loc/tbl")
  }

  test("compression options produce readable tables with different codecs") {
    import spark.implicits._
    for (codec <- Seq("none", "snappy", "zstd", "gzip")) {
      val loc = tmpDir(s"graft-codec-$codec")
      val t = GraftTable.create(spark, s"$loc/tbl", schema,
        GraftTableOptions(compression = codec))
      t.append((1 to 500).map(i => (i, "v" * 50, i)).toDF("handle", "name", "rating"))
      assert(t.read().count() === 500)
      GraftTable.drop(s"$loc/tbl")
    }
  }
  test("ALTER SET options: new appends honor them, committed files keep their codec") {
    import spark.implicits._
    val loc = tmpDir("graft-setopts")
    val t = GraftTable.create(spark, s"$loc/tbl", schema) // default zstd
    t.append((1 to 100).map(i => (i, s"n$i", i)).toDF("handle", "name", "rating"))
    val before = t.committedFiles
    assert(before.nonEmpty && before.forall(_.contains(".zstd.")))
    // stripe + block together in ONE statement, with an intermediate
    // state (new stripe 5000 < old block 10000) that only validates as a
    // whole — iteration-order-sensitive per-change validation would flake
    t.setOptions(Map("compression" -> "snappy",
      "stripe_row_count" -> "5000", "block_row_count" -> "5000"))
    t.append((101 to 200).map(i => (i, s"n$i", i)).toDF("handle", "name", "rating"))
    val after = GraftTable.open(spark, s"$loc/tbl")
    val fresh = after.committedFiles.filterNot(before.toSet)
    assert(fresh.nonEmpty && fresh.forall(_.contains(".snappy.")),
      s"appends after ALTER must use the new codec: $fresh")
    assert(before.forall(after.committedFiles.toSet),
      "ALTER SET options must not touch committed files")
    assert(after.read().count() === 200, "mixed-codec table must read whole")
    assert(after.options.stripeRowCount === 5000L)
    // structural, unknown, and out-of-range keys are rejected (and the
    // multi-change transaction leaves nothing applied)
    intercept[IllegalArgumentException](after.setOptions(Map("bucket_by" -> "handle")))
    intercept[IllegalArgumentException](after.setOptions(Map("sort_by" -> "handle")))
    intercept[IllegalArgumentException](after.setOptions(Map("no_such_option" -> "1")))
    intercept[IllegalArgumentException](after.setOptions(Map("stripe_row_count" -> "10")))
    intercept[IllegalArgumentException](
      after.setOptions(Map("compression" -> "gzip", "block_row_count" -> "oops")))
    val unchanged = GraftTable.open(spark, s"$loc/tbl").options
    assert(unchanged.compression === "snappy" && unchanged.stripeRowCount === 5000L)
    GraftTable.drop(s"$loc/tbl")
  }

  test("SQL ALTER TABLE SET/UNSET TBLPROPERTIES routes to the option validator") {
    spark.conf.set("spark.sql.catalog.gopt", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gopt.warehouse", tmpDir("graft-setopts-wh"))
    spark.sql("CREATE TABLE gopt.db.t (a INT, b STRING) USING graft")
    spark.sql("INSERT INTO gopt.db.t SELECT id, concat('v', id) FROM range(50)")
    spark.sql("ALTER TABLE gopt.db.t SET TBLPROPERTIES ('compression' = 'gzip')")
    spark.sql("INSERT INTO gopt.db.t SELECT id, concat('w', id) FROM range(50, 100)")
    val wh = spark.conf.get("spark.sql.catalog.gopt.warehouse")
    val t = GraftTable.open(spark, s"$wh/db/t")
    assert(t.options.compression === "gzip")
    assert(t.committedFiles.exists(_.contains(".gz.")),
      s"post-ALTER append must be gzip: ${t.committedFiles}")
    assert(spark.table("gopt.db.t").count() === 100)
    // UNSET reverts to the CREATE-time default codec
    spark.sql("ALTER TABLE gopt.db.t UNSET TBLPROPERTIES ('compression')")
    assert(GraftTable.open(spark, s"$wh/db/t").options.compression === "zstd")
    // the validator still guards the SQL route
    intercept[Exception](
      spark.sql("ALTER TABLE gopt.db.t SET TBLPROPERTIES ('bucket_by' = 'a')"))
    spark.sql("DROP TABLE gopt.db.t")
  }

  test("ANALYZE computes column stats; empty table analyzable (sql/analyze.sql)") {
    import spark.implicits._
    val loc = tmpDir("graft-analyze")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    val empty = t.analyze()
    assert(empty.rowCount === 0)
    t.append((1 to 100).map(i => (i, s"n$i", if (i % 10 == 0) 0 else i))
      .toDF("handle", "name", "rating"))
    val st = t.analyze()
    assert(st.rowCount === 100)
    assert(st.columns("handle").min === "1" && st.columns("handle").max === "100")
    assert(st.columns("handle").nullCount === 0)
    assert(st.columns("handle").ndv >= 95L) // approx
    // stats survive re-open (committed to sibling file atomically)
    val t2 = GraftTable.open(spark, s"$loc/tbl")
    assert(t2.stats().get.rowCount === 100)
    assert(t2.estimatedRowCount === 100)
    assert(t2.explainInfo.contains("rows=100"))
    GraftTable.drop(s"$loc/tbl")
  }

  test("ANALYZE NOSCAN on a never-analyzed table records no column stats") {
    import spark.implicits._
    val loc = tmpDir("graft-noscan")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    // name is entirely NULL: a fabricated nullCount=0 here would make
    // IS NULL selectivity estimate ~0 rows on a 100%-null column
    t.append((1 to 50).map(i => (i, null: String, i)).toDF("handle", "name", "rating"))
    val st = t.analyze(noScan = true)
    assert(st.rowCount === 50)
    assert(st.columns.isEmpty,
      "NOSCAN without prior stats must not fabricate measured-looking column stats")
    // a later full ANALYZE still measures normally
    assert(t.analyze().columns("name").nullCount === 50L)
    GraftTable.drop(s"$loc/tbl")
  }

  test("relative table location: full lifecycle (location qualified at open/create)") {
    import spark.implicits._
    val rel = s"target/rel-tbl-${java.util.UUID.randomUUID().toString.take(8)}"
    val t = GraftTable.create(spark, rel, schema)
    assert(t.location.startsWith("file:/"), s"location qualified: ${t.location}")
    t.append(Seq((1, "a", 10), (2, "b", 20)).toDF("handle", "name", "rating"))
    assert(GraftTable.open(spark, rel).read().count() === 2)
    assert(GraftTable.open(spark, rel).tableSize() > 0L)
    GraftTable.drop(rel)
    assert(!GraftTable.exists(rel))
  }

  test("append atomicity: pre-append reader keeps its snapshot (cstore_writer.c:344-357)") {
    import spark.implicits._
    val loc = tmpDir("graft-vis")
    val t = GraftTable.create(spark, s"$loc/tbl", schema)
    t.append(Seq((1, "a", 1)).toDF("handle", "name", "rating"))
    // reader handle bound to the first committed metadata
    val reader = GraftTable.open(spark, s"$loc/tbl")
    val before = reader.read() // plan pinned to the old file list
    t.append(Seq((2, "b", 2)).toDF("handle", "name", "rating"))
    assert(before.count() === 1) // old snapshot: no torn read
    assert(reader.rowCountFromMetadata() === 1)
    assert(GraftTable.open(spark, s"$loc/tbl").read().count() === 2)
    GraftTable.drop(s"$loc/tbl")
  }
  test("sort_by clustering narrows scan output under a range predicate (README.md:282-294)") {
    import spark.implicits._
    val base = (1 to 50000).map(i => (i, s"n$i", i % 97))
    val shuffled = scala.util.Random.shuffle(base)
    def scannedRows(sortBy: Seq[String]): Long = {
      val loc = tmpDir(s"graft-sort-${sortBy.mkString}") + "/tbl"
      val t = GraftTable.create(spark, loc, schema,
        GraftTableOptions(sortBy = sortBy, blockRowCount = 1000, stripeRowCount = 2000))
      t.append(shuffled.toDF("handle", "name", "rating").repartition(4))
      val df = t.read().filter(col("handle").between(1000, 2000))
      assert(df.collect().length === 1001)
      val n = df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
      GraftTable.drop(loc)
      n
    }
    val unsorted = scannedRows(Seq.empty)
    val sorted = scannedRows(Seq("handle"))
    // clustered load -> narrow min/max ranges -> most pages skipped
    assert(sorted < unsorted,
      s"sorted load scanned $sorted rows vs unsorted $unsorted")
    assert(sorted < 25000, s"sorted load should skip most rows, scanned $sorted")
  }
}
