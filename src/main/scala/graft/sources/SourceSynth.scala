package graft.sources

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** Deterministic source-file fixtures for the S2–S11 reader operators —
  * every byte is a pure function of the row index, so the engine reader
  * and the DuckDB oracle can scan the SAME file and must agree exactly.
  * Mirrors the reference's ingestion shapes: header TSV
  * (drugcentral/parse.py:59-66), commented-header TSV (ctd/parse.py:76-86),
  * gzipped CSV, JSONL with corrupt lines (chembl/parse.py:55-95), and a
  * nested-JSON API document (hgnc/parse.py:52-104).
  */
object SourceSynth {

  /** Per-process fixture root (JVM pid suffix): concurrent driver/bench
    * runs on the same host must never race on fixture writes. The oracle
    * SQL strings interpolate this value, so the driver's DuckDB scans
    * exactly the files this process wrote. */
  val Dir = s"/tmp/graft_sources_${ProcessHandle.current().pid()}"

  /** Delete stale per-process fixture roots (ours and the KG oracle's)
    * left by earlier runs. AGE-based, not exit-hook-based, on purpose:
    * the driver's DuckDB reads these paths AFTER the writing JVM exits,
    * so deleting on shutdown would destroy the oracle's inputs; a 6-hour
    * threshold is far beyond the minutes-scale verify→oracle gap while
    * still bounding /tmp growth across repeated runs. Best-effort. */
  def cleanStaleRoots(maxAgeHours: Long = 6): Unit = {
    // best-effort on EVERY failure shape: concurrent janitors racing on
    // the same stale root surface as UncheckedIOException (a
    // RuntimeException) out of Files.walk/list stream iteration, and this
    // is called from a static initializer — an escaping throw would turn
    // into ExceptionInInitializerError and kill every query in the JVM
    import scala.util.control.NonFatal
    try {
      val cutoff = System.currentTimeMillis() - maxAgeHours * 3600 * 1000
      val prefixes = Seq("graft_sources_", "graft_kg_oracle_")
      // pre-round-4 builds used FIXED roots (no pid suffix); they carry no
      // owner pid to liveness-check, so age alone reclaims them
      val legacyNames = Set("graft_sources", "graft_kg_oracle")
      val ls = Files.list(Paths.get("/tmp"))
      try ls.forEach { p =>
        try {
          val n = p.getFileName.toString
          // a root is reclaimable only when its OWNING PROCESS IS DEAD
          // (root mtime is set at creation, so age alone would reap the
          // roots of a >6h still-running soak) AND it has aged past the
          // cutoff (so a just-exited Verify's tables survive until the
          // external DuckDB cross-check has long finished). A recycled
          // pid matching an unrelated live process merely defers cleanup.
          // cheap name match FIRST: /tmp on a busy host holds thousands
          // of unrelated entries, and the process-table probe below
          // should run only for our own roots
          val matches = prefixes.exists(n.startsWith) || legacyNames(n)
          def ownerAlive = n.split('_').lastOption
            .flatMap(_.toLongOption)
            .exists(pid => ProcessHandle.of(pid).isPresent)
          val stale = matches &&
            !n.endsWith(s"_${ProcessHandle.current().pid()}") &&
            !ownerAlive &&
            Files.getLastModifiedTime(p).toMillis < cutoff
          if (stale) graft.util.Fs.deleteRec(p)
        } catch { case NonFatal(_) => () } // one root failing ≠ stop others
      } finally ls.close()
    } catch { case NonFatal(_) => () }
  }

  def peopleTsv: String = s"$Dir/people.tsv"
  def factsTsv: String = s"$Dir/facts.tsv"
  def metricsCsvGz: String = s"$Dir/metrics.csv.gz"
  def eventsJsonl: String = s"$Dir/events.jsonl"
  def apiJson: String = s"$Dir/api.json"
  def docsZip: String = s"$Dir/docs.zip"
  def tolerantTsv: String = s"$Dir/tolerant.tsv"
  def spacedTxt: String = s"$Dir/spaced.txt"

  /** Per-entry JSON body of the zip fixture — shared with the q61 oracle's
    * string arithmetic. */
  def zipJsonBody(i: Int): String = s"""{"k":$i,"w":"z${i % 7}"}"""

  /** Bump when fixture CONTENT changes — stale files from an older layout
    * are rewritten, identical ones skipped. */
  private val Version = "v3"

  /** Write all fixtures (idempotent; tiny files, driver-side by design —
    * this is test-input synthesis, not a data path). */
  def ensure(): Unit = synchronized {
    val marker = Paths.get(Dir, s"_v_$Version")
    if (Files.exists(marker)) return
    cleanStaleRoots()
    Files.createDirectories(Paths.get(Dir))

    writeText(peopleTsv) { w =>
      w.write("pid\tpname\tpscore\n")
      (0 until 2000).foreach { i =>
        w.write(s"$i\tname ${(i * 7) % 97}\t${(i * 31) % 1000}\n")
      }
    }

    writeText(factsTsv) { w =>
      w.write("# source: synthetic fixture\n")
      w.write("# license: none\n")
      w.write("# fields: id label weight\n")
      (0 until 1500).foreach { i =>
        w.write(s"$i\tlab${i % 13}\t${i % 40}.25\n")
      }
    }

    val gz = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(metricsCsvGz)),
      StandardCharsets.UTF_8))
    try {
      gz.write("mid,metric,mval\n")
      (0 until 1000).foreach { i =>
        gz.write(s"$i,m${i % 7},${(i * 3) % 500}\n")
      }
    } finally gz.close()

    writeText(eventsJsonl) { w =>
      (0 until 1300).foreach { i =>
        if (i % 13 == 5) w.write(s"""{"id": $i, "kind": BROKEN\n""")
        else w.write(s"""{"id":$i,"kind":"k${i % 5}","v":${(i * 11) % 400}}\n""")
      }
    }

    writeText(apiJson) { w =>
      val docs = (0 until 300).map { i =>
        s"""{"id":"d$i","symbol":"SYM${i % 50}","alias":["a${i % 9}","b${i % 4}"]}"""
      }.mkString(",")
      w.write(s"""{"response":{"numFound":300,"docs":[$docs]}}""")
    }

    writeText(tolerantTsv) { w =>
      w.write("tid\ttext\n")
      (0 until 800).foreach { i =>
        val v = if (i % 3 == 0) s"""val "$i" quoted""" else s"plain $i"
        w.write(s"$i\t$v\n")
      }
    }

    writeText(spacedTxt) { w =>
      w.write("sa sb sc\n")
      (0 until 900).foreach(i => w.write(s"$i w${i % 9} ${i * 2}\n"))
    }

    val zip = new java.util.zip.ZipOutputStream(
      new FileOutputStream(docsZip))
    try {
      (0 until 100).foreach { i =>
        zip.putNextEntry(new java.util.zip.ZipEntry(f"doc_$i%03d.json"))
        zip.write(zipJsonBody(i).getBytes(StandardCharsets.UTF_8))
        zip.closeEntry()
      }
    } finally zip.close()

    Files.write(marker, Array.emptyByteArray)
  }

  private def writeText(path: String)(body: BufferedWriter => Unit): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new FileOutputStream(path), StandardCharsets.UTF_8))
    try body(w) finally w.close()
  }
}
