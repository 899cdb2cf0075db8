package graft.operators

/** Second-JVM contender for the cross-process stale-marker reclaim
  * race (MarkerRaceSpec — ADVICE r15). Three filesystem-barrier
  * phases, each pinning one guarantee of the tombstone protocol:
  *
  *  1. `_race_go`: every worker fires ONE `reclaimStaleMarker` at the
  *     same stale marker simultaneously — exactly one rename can win.
  *  2. the winner waits for every worker's phase-1 beacon (so no
  *     late first-attempt can land inside the claim's create window —
  *     that collision is a separate, safe-refusal outcome: Hadoop's
  *     local create is create-then-chmod, and a reclaim catching the
  *     half-created empty file restores an empty shell the claimant's
  *     create then refuses on; the claimant fails safe and the shell
  *     ages out in one TTL), then establishes a FRESH claim.
  *  3. `_race_claimed`: the losers each fire 10 MORE reclaims — the
  *     stale observation against the established fresh marker, the
  *     exact TOCTOU the old blind delete lost — every one must refuse
  *     (tombstone content mismatch → restore); the winner then
  *     verifies its claim survived byte-identical.
  *
  * No Spark session: the protocol is pure filesystem ops.
  * Args: indexRoot workerId nWorkers staleContent.
  * Prints `RACE_RESULT <id> won=<b> claimed=<b> intact=<b>`. */
object MarkerRaceWorker {
  def main(args: Array[String]): Unit = {
    val Array(root, idS, nS, observed) = args.take(4)
    val (id, n) = (idS.toInt, nS.toInt)
    val (fs, _) = graft.storage.GraftTable.fsAndPath(root)
    def p(name: String) = new org.apache.hadoop.fs.Path(root, name)
    val marker = p(Similarity.MaintenanceMarker)
    val deadline = System.nanoTime() + 60L * 1000L * 1000L * 1000L
    def awaitAll(names: Seq[String]): Boolean = {
      while (!names.forall(nm => fs.exists(p(nm)))) {
        if (System.nanoTime() > deadline) return false
        Thread.sleep(2)
      }
      true
    }
    def beacon(name: String): Unit = {
      try fs.create(p(name), false).close()
      catch { case _: Exception => () }
    }

    // phase 1: the simultaneous reclaim — exactly one rename wins
    if (!awaitAll(Seq("_race_go"))) { System.err.println(s"TIMEOUT_GO $id"); sys.exit(2) }
    val won = Similarity.reclaimStaleMarker(fs, marker, observed)
    beacon(s"_race_p1_$id")

    var claimed = false
    var intact = false
    val myToken = s"maintenance:worker-$id"
    if (won) {
      // phase 2: claim once every contender's first volley has landed
      if (!awaitAll((0 until n).map(i => s"_race_p1_$i"))) sys.exit(2)
      try {
        val out = fs.create(marker, false)
        out.write(myToken.getBytes("UTF-8")); out.close()
        claimed = true
      } catch { case e: Exception =>
        System.err.println(s"CLAIM_FAIL $id: ${e.getMessage}")
      }
      beacon("_race_claimed")
      // phase 3: survive the losers' storm
      if (!awaitAll((0 until n).filter(_ != id).map(i => s"_race_p3_$i")))
        sys.exit(2)
      val content =
        try {
          val in = fs.open(marker)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        } catch { case _: Exception => "" }
      intact = claimed && content == myToken
      fs.delete(marker, false)
      ()
    } else {
      // phase 3 (losers): the ADVICE scenario — a process that passed
      // the age gate on the STALE marker fires its reclaim at the
      // winner's FRESH claim; the old code's blind delete destroyed
      // it, the tombstone protocol must refuse every time
      if (!awaitAll(Seq("_race_claimed"))) sys.exit(2)
      var lateWins = 0
      (1 to 10).foreach { _ =>
        if (Similarity.reclaimStaleMarker(fs, marker, observed)) lateWins += 1
        Thread.sleep(3)
      }
      if (lateWins > 0) {
        System.err.println(s"LATE_WIN $id: $lateWins"); sys.exit(3)
      }
      beacon(s"_race_p3_$id")
    }
    println(s"RACE_RESULT $id won=$won claimed=$claimed intact=$intact")
  }
}
