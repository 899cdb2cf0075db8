package graft.storage

import org.apache.spark.sql.sources.In

import graft.SparkSpec

/** CHANGE-RANGE METADATA IS O(churn), NOT O(table files) — VERDICT
  * r15 #1. `isAppendOnlyRange` and `changes()` sit on every streaming
  * delta tick; they used to hydrate the FULL manifest (the complete
  * file list, ~60 MB of path strings at a million files) for EVERY
  * version in the range. Now they read each version's RAW snapshot
  * (segment refs + dvs + schema — O(commits), no replay) and compute
  * the per-commit file delta from the new manifest DELTA segments
  * alone; only a pair the replay cannot express as a segment-list
  * extension (manifest compaction, RESTORE, the inline→segment
  * upgrade commit) hydrates — and only THAT pair. Covers: the ∝-tick
  * I/O bound on a 500+-file table (via GraftTable.MetaIo, per-thread
  * counters), and result identity across all three fallback shapes
  * (upgrade commit, compaction commit, MOR-delete dv change). */
class ChangeRangeMetaSpec extends SparkSpec {

  import org.apache.spark.sql.types._
  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType)))

  /** `parts` files of `n` rows starting at `base`. */
  private def batch(base: Int, n: Int, parts: Int) = {
    import spark.implicits._
    (base until base + n).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(parts)
  }

  private def manifestBytes(loc: String): Long = {
    val dir = java.nio.file.Paths.get(
      new org.apache.hadoop.fs.Path(loc).toUri.getPath, "_graft_manifest")
    val s = java.nio.file.Files.list(dir)
    try s.mapToLong(java.nio.file.Files.size(_)).sum finally s.close()
  }

  test("delta tick metadata I/O is proportional to the tick's commit on a 500+-file table") {
    val loc = tmpDir("crm-many") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    var base = 0
    for (_ <- 0 until 25) { t.append(batch(base, 240, 24)); base += 240 }
    assert(GraftTable.readMeta(loc).files.size >= 500)

    val from = t.version
    t.append(batch(base, 20, 2)) // the tick's commit: 2 files, 20 rows

    // the tick's reads, cold segment cache, per-thread counters
    GraftTable.invalidateSegmentCacheUnder(loc)
    val (hr0, _, sp0, sb0) = GraftTable.MetaIo.snapshot()
    assert(t.isAppendOnlyRange(from))
    val rows = t.changes(from, t.version).collect()
    val (hr1, _, sp1, sb1) = GraftTable.MetaIo.snapshot()

    // results identical: exactly the tick's rows, all inserts
    assert(rows.length === 20)
    assert(rows.forall(_.getAs[String]("_change_type") == "insert"))
    assert(rows.map(_.getAs[Int]("id")).sorted.toSeq === (base until base + 20))

    // metadata I/O ∝ the tick's own commit: the gate parses the ONE
    // new delta segment (the feed then hits the segment cache), and
    // each reader parses only the range's two raw snapshot JSONs —
    // no per-version full-manifest hydration (the old cost: every
    // live segment, twice)
    assert(sp1 - sp0 <= 2, s"parsed ${sp1 - sp0} segments for a 1-commit tick")
    assert(hr1 - hr0 <= 4, s"read ${hr1 - hr0} history JSONs for a 1-commit tick")
    val total = manifestBytes(loc)
    assert(sb1 - sb0 < total / 10,
      s"tick read ${sb1 - sb0} segment bytes of $total live manifest bytes")

    // …and a NO-TICK streaming trigger is O(1): the refresh skeleton's
    // probe (committedVersion) must not hydrate the manifest just to
    // learn "no new version" — at 1M files that fold is the per-trigger
    // driver cost, paid even when nothing changed
    val rs = new graft.streaming.RefreshableStatic[Long](loc,
      df => df.count(), _ => ())
    rs.get(spark) // the one build
    GraftTable.invalidateSegmentCacheUnder(loc)
    val (nh0, _, ns0, _) = GraftTable.MetaIo.snapshot()
    (1 to 3).foreach(_ => rs.get(spark))
    val (nh1, _, ns1, _) = GraftTable.MetaIo.snapshot()
    assert(ns1 - ns0 === 0L,
      s"no-tick triggers parsed ${ns1 - ns0} manifest segments")
    assert(nh1 - nh0 === 0L,
      s"no-tick triggers read ${nh1 - nh0} history snapshots")
    rs.close()
  }

  test("inline→segment upgrade commit falls back to hydration for that pair, results exact") {
    val loc = tmpDir("crm-upg") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    for (b <- 0 until 3) t.append(batch(b * 100, 10, 1)) // 3 files, inline form
    assert(GraftTable.readMeta(loc).manifest.isEmpty)

    val from = t.version
    t.append(batch(1000, 140, 14)) // 17 files > InlineStatsMax: upgrade commit
    assert(GraftTable.readMeta(loc).manifest.nonEmpty)

    // the upgrade commit's single segment ADDS the whole file list —
    // the extension fast path must not misread the carried files as
    // inserts (this pair hydrates instead)
    assert(t.isAppendOnlyRange(from))
    val rows = t.changes(from, t.version).collect()
    assert(rows.length === 140)
    assert(rows.forall(_.getAs[String]("_change_type") == "insert"))
    assert(rows.map(_.getAs[Int]("id")).min === 1000)
  }

  test("manifest compaction commit inside the range stays append-only and feeds exactly") {
    val loc = tmpDir("crm-compact") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    var base = 0
    // segment form, then grow the segment list to just under the cap
    t.append(batch(base, 170, 17)); base += 170
    while (GraftTable.readMeta(loc).manifest.size <
        GraftTable.ManifestCompactMaxSegments - 2) {
      t.append(batch(base, 10, 1)); base += 10
    }
    val from = t.version
    val firstNew = base
    // these appends cross the cap: one of them commits a full
    // compaction segment (list not an extension → per-pair hydration)
    for (_ <- 0 until 4) { t.append(batch(base, 10, 1)); base += 10 }
    assert(GraftTable.readMeta(loc).manifest.size < 8, "compaction did not trigger")

    assert(t.isAppendOnlyRange(from))
    val rows = t.changes(from, t.version).collect()
    assert(rows.length === 40)
    assert(rows.forall(_.getAs[String]("_change_type") == "insert"))
    assert(rows.map(_.getAs[Int]("id")).sorted.toSeq === (firstNew until base))
  }

  test("property: commitFileDelta ≡ the hydrated diff for every commit shape a seeded mutation sequence writes") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, In, LessThan}
    val loc = tmpDir("crm-prop") + "/t"
    val t = GraftTable.create(spark, loc, schema,
      GraftTableOptions(deleteMode = "merge-on-read"))
    val rnd = new scala.util.Random(20160816L)
    var base = 0
    t.append(batch(base, 200, 20)); base += 200 // straight to segment form
    // a seeded walk over the engine's real commit shapes: trickle and
    // wide appends, COW delete, MOR delete, small-file compaction, and
    // a RESTORE (the replay-inexpressible reorder)
    (1 to 22).foreach { i =>
      rnd.nextInt(6) match {
        case 0 | 1 => t.append(batch(base, 10, 1)); base += 10
        case 2 => t.append(batch(base, 40, 4)); base += 40
        case 3 => // COW delete of a scattered sliver
          t.delete(Seq(GreaterThanOrEqual("id", base - 25),
            LessThan("id", base - 20)))
          ()
        case 4 => // dv-only commit
          t.deleteMor(Seq(In("id", Array(rnd.nextInt(base))))); ()
        case 5 => t.compactSmall(); ()
      }
      if (i == 15) { t.restore(t.version - 3); () }
    }
    val head = t.version
    // every adjacent pair: the O(churn) delta must equal the diff of
    // the two FULLY HYDRATED file lists (the independent ground truth)
    (1L until head).foreach { v =>
      val hp = GraftTable.readHistoryMeta(loc, v).files
      val hc = GraftTable.readHistoryMeta(loc, v + 1).files
      val (removed, added) =
        GraftTable.commitFileDelta(loc,
          GraftTable.readHistoryRaw(loc, v),
          GraftTable.readHistoryRaw(loc, v + 1))
      assert(removed.toSet === hp.toSet -- hc.toSet,
        s"v$v→${v + 1}: removed mismatch")
      assert(added.toSet === hc.toSet -- hp.toSet,
        s"v$v→${v + 1}: added mismatch")
      // and the gate agrees with the hydrated subset + dv + schema rule
      val rp = GraftTable.readHistoryRaw(loc, v)
      val rc = GraftTable.readHistoryRaw(loc, v + 1)
      val hydratedAppendOnly = hp.toSet.subsetOf(hc.toSet) &&
        rp.dvs == rc.dvs && rp.schemaJson == rc.schemaJson
      assert(t.isAppendOnlyRange(v) === ((v + 1) to head).forall { w =>
        val a = GraftTable.readHistoryMeta(loc, w - 1)
        val b = GraftTable.readHistoryMeta(loc, w)
        a.files.toSet.subsetOf(b.files.toSet) && a.dvs == b.dvs &&
          a.currentSchema == b.currentSchema
      }, s"gate disagreement from v$v")
      // (hydratedAppendOnly is the per-pair form the range check folds)
      assert(hydratedAppendOnly ===
        (removed.isEmpty && rp.dvs == rc.dvs && rp.schemaJson == rc.schemaJson),
        s"v$v→${v + 1}: per-pair gate shape mismatch")
    }
    GraftTable.drop(loc)
  }

  test("MOR delete (dv-only commit) breaks the append-only gate and feeds deletes") {
    val loc = tmpDir("crm-mor") + "/t"
    val t = GraftTable.create(spark, loc, schema,
      GraftTableOptions(deleteMode = "merge-on-read"))
    t.append(batch(0, 170, 17)) // segment form
    val from = t.version
    val n = t.deleteMor(Seq(In("id", Array(3, 7, 11))))
    assert(n === 3L)
    assert(GraftTable.readMeta(loc).files.size === 17, "MOR delete must not swap files")

    assert(!t.isAppendOnlyRange(from))
    val rows = t.changes(from, t.version).collect()
    assert(rows.map(r => (r.getAs[Int]("id"), r.getAs[String]("_change_type")))
      .sortBy(_._1).toSeq === Seq((3, "delete"), (7, "delete"), (11, "delete")))
  }

  test("extension delta nets out remove-then-re-add of one path (hydrated diff is zero)") {
    // Unreachable with the unique-batch-dir writer (ADVICE r16), but
    // the invariant belongs to the delta itself: a path live in `p`,
    // removed by one segment in the range, re-added by a later one, is
    // live on BOTH sides — the net delta must cancel it, or a stream
    // walking this range would re-deliver the file's rows.
    val loc = tmpDir("crm-net")
    val s1 = GraftTable.writeSegmentFile(loc, 1L,
      Vector("data/a", "data/b"), Set.empty, Map.empty)
    val s2 = GraftTable.writeSegmentFile(loc, 2L,
      Vector.empty, Set("data/a"), Map.empty)
    val s3 = GraftTable.writeSegmentFile(loc, 3L,
      Vector("data/a", "data/c"), Set.empty, Map.empty)
    def raw(v: Long, manifest: Vector[String]) = GraftTable.RawSnapshot(
      v, "{}", manifest, Vector.empty, Map.empty, Map.empty, 0L,
      changeCommit = false, Vector.empty)
    val (removed, added) = GraftTable.commitFileDelta(loc,
      raw(1, Vector(s1)), raw(3, Vector(s1, s2, s3)))
    assert(removed === Seq.empty, "data/a is live on both sides")
    assert(added === Seq("data/c"))
    // the remove-only pair still reports the gross removal
    val (r2, a2) = GraftTable.commitFileDelta(loc,
      raw(1, Vector(s1)), raw(2, Vector(s1, s2)))
    assert(r2 === Seq("data/a") && a2 === Seq.empty)
  }
}
