package graft.operators

import graft.SparkSpec
import graft.storage.GraftTable

/** CROSS-PROCESS stale-marker reclaim (ADVICE r15): the in-JVM spec
  * (AnnIndexSpec) pins the misfired-reclaim restore deterministically;
  * this one proves the mutual exclusion against REAL separate JVMs —
  * four contenders observe the same stale marker and race
  * `reclaimStaleMarker` simultaneously. Exactly one may win the
  * tombstone rename; the winner's immediately-created FRESH claim (the
  * state the old delete-then-create TOCTOU destroyed) must survive the
  * losers' retry storm; nothing may leak. */
class MarkerRaceSpec extends SparkSpec {

  private def spawnWorker(root: String, id: Int, n: Int, stale: String,
      outFile: java.io.File): Process = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(java, "-Xmx256m",
      "-cp", System.getProperty("java.class.path"),
      "graft.operators.MarkerRaceWorker", root, id.toString, n.toString, stale)
    new ProcessBuilder(cmd: _*)
      .redirectOutput(outFile)
      .redirectErrorStream(true)
      .start()
  }

  test("four JVMs race a stale-marker reclaim: exactly one wins; the winner's fresh claim survives the losers' retries") {
    val root = tmpDir("marker-race")
    val (fs, _) = GraftTable.fsAndPath(root)
    val marker = new org.apache.hadoop.fs.Path(root,
      Similarity.MaintenanceMarker)
    val stale = "autocompact:crashed-stale-token"
    val out = fs.create(marker, false)
    out.write(stale.getBytes("UTF-8")); out.close()

    val n = 4
    val outs = (0 until n).map(i =>
      java.io.File.createTempFile(s"marker-race-$i", ".out"))
    val procs = (0 until n).map(i => spawnWorker(root, i, n, stale, outs(i)))
    try {
      // the barrier: every worker spins on this file, so their first
      // reclaim attempts land as close to simultaneous as the OS allows
      fs.create(new org.apache.hadoop.fs.Path(root, "_race_go"), false).close()
      procs.foreach { p =>
        assert(p.waitFor(90, java.util.concurrent.TimeUnit.SECONDS),
          "worker JVM must finish")
        assert(p.exitValue() === 0,
          "worker must neither time out at a barrier nor land a late reclaim")
      }
    } finally procs.foreach(p => if (p.isAlive) p.destroyForcibly())

    val results = outs.map { f =>
      val s = scala.io.Source.fromFile(f)
      try s.getLines().find(_.startsWith("RACE_RESULT")).getOrElse("")
      finally s.close()
    }
    def flag(line: String, k: String): Boolean =
      line.contains(s"$k=true")
    val winners = results.filter(flag(_, "won"))
    assert(winners.size === 1,
      s"exactly one process may reclaim the stale marker: $results")
    assert(flag(winners.head, "claimed") && flag(winners.head, "intact"),
      s"the winner's fresh claim must survive the losers' late reclaims " +
        s"(the old blind delete destroyed it): $results")
    // nothing leaks: the winner released its claim; no tombstone residue
    assert(!fs.exists(marker), "the winner must have released its marker")
    val residue = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName)
      .filter(nm => nm.contains("_tomb_") && !nm.endsWith(".crc"))
    assert(residue.isEmpty, s"tombstone residue: ${residue.mkString(",")}")
  }
}
