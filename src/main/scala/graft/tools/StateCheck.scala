package graft.tools

import java.nio.file.{Files, Paths}
import scala.util.matching.Regex

/** Canonical-counts gate. Round 12 shipped `docs/STATE.md` / SURVEY §8
  * saying 177 queries / 303 tests while the actual surface was 184 /
  * 311 — the canonical-counts file went stale the same day it was
  * written, defeating its purpose. This main derives the counts from
  * the ONE source of truth (`SparkEntry.queries.size` /
  * `oracleSql.size`, plus the ScalaTest report totals under
  * `target/test-reports`) and either asserts the prose matches (exit 1
  * on drift — the round-close gate) or, with `--fix`, rewrites the
  * counted lines in place so they can never be hand-edited wrong.
  */
object StateCheck {
  private val statePath = "docs/STATE.md"
  private val surveyPath = "SURVEY.md"

  // "Canonical counts: **N `SparkEntry.queries` entries, N `oracleSql`
  // entries (zero rows-only), N ScalaTests (N suites).**"
  private val stateRe: Regex =
    ("""Canonical counts: \*\*(\d+) `SparkEntry\.queries` entries, (\d+) `oracleSql`\s*""" +
      """entries \(zero rows-only\), (\d+) ScalaTests \((\d+) suites\)\.\*\*""").r

  // SURVEY §8: "round N: **N queries, ALL N with DuckDB-oracle entries"
  // (may wrap across a line break)
  private val surveyRe: Regex =
    """round (\d+): \*\*(\d+) queries,\s*ALL (\d+) with DuckDB-oracle entries""".r

  /** Correctness-evidence gate. Round 13 closed with the driver's
    * `CORRECTNESS_r13.json` == `{}` — no committed per-query evidence at
    * all; only a judge re-run could confirm the 203/203 claim. The repo
    * must never be in that state again: either the driver's artifact or
    * the builder's local replica (`CORRECTNESS_LOCAL_r{N}.json`, written
    * by `tools/check_oracle.py <sf> <out> <summary>`) must be non-empty
    * at the newest round present, and the newest non-empty artifact must
    * have zero failing queries.
    */
  private def correctnessEvidence(): Int = {
    val re = """CORRECTNESS(_LOCAL)?_r(\d+)\.json""".r
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        f.getName match {
          case re(_, n) => Some((n.toInt, f))
          case _ => None
        }
      }
    if (files.isEmpty) { println("[state] ✗ no correctness artifact at all"); return 1 }
    def queryCount(f: java.io.File): Int = {
      val t = new String(Files.readAllBytes(f.toPath), "UTF-8")
      // count per-query entries without a JSON lib: top-level keys
      """"(rows_match|match)"""".r.findAllIn(t).length max
        (if (t.replaceAll("\\s", "") == "{}") 0
         else """"[A-Za-z0-9_]+"\s*:\s*\{""".r.findAllIn(t).length)
    }
    val newest = files.map(_._1).max
    val newestNonEmpty = files.filter(f => queryCount(f._2) > 0)
    if (newestNonEmpty.isEmpty || newestNonEmpty.map(_._1).max < newest) {
      println(s"[state] ✗ newest correctness round r$newest has only EMPTY artifacts — " +
        "run tools/check_oracle.py with a summary path and commit CORRECTNESS_LOCAL_r" +
        s"$newest.json")
      1
    } else {
      val (r, f) = newestNonEmpty.maxBy(_._1)
      val t = new String(Files.readAllBytes(f.toPath), "UTF-8")
      val fails = """"(rows_match|hash_match)"\s*:\s*false""".r.findAllIn(t).length
      if (fails > 0) {
        println(s"[state] ✗ ${f.getName} (r$r) records $fails failing flags")
        1
      } else {
        println(s"[state] ✓ correctness evidence: ${f.getName} (r$r, ${queryCount(f)} queries, 0 failures)")
        0
      }
    }
  }

  /** Bench-number provenance (round-13 verdict: the committed
    * BENCH_r13.json said 53.78 s while the commit message said 51.5 s —
    * prose numbers drifted from artifacts). STATE.md's bench line must
    * be byte-derived from BENCH_DETAIL.json: `--fix` rewrites it, plain
    * runs fail on drift.
    */
  private val benchRe: Regex =
    """Bench \(from BENCH_DETAIL\.json\): \*\*([0-9.]+) s wall for (\d+) queries,\s*(\d+) failed\*\*""".r

  private def checkBench(fix: Boolean): Int = {
    val bd = Paths.get("BENCH_DETAIL.json")
    val st = Paths.get(statePath)
    if (!Files.exists(bd) || !Files.exists(st)) return 0
    val detail = new String(Files.readAllBytes(bd), "UTF-8")
    val wall = """"value":([0-9.]+)""".r.findFirstMatchIn(detail).map(_.group(1))
    val qmap = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(detail).map(_.group(1))
    (wall, qmap) match {
      case (Some(w), Some(qs)) =>
        val n = """"[^"]+":""".r.findAllIn(qs).length
        val failed = """:-1\.0""".r.findAllIn(qs).length
        val line = s"Bench (from BENCH_DETAIL.json): **$w s wall for $n queries,\n$failed failed**"
        val text = new String(Files.readAllBytes(st), "UTF-8")
        benchRe.findFirstMatchIn(text) match {
          case None =>
            println(s"[state] $statePath has no bench-provenance line — skip")
            0
          case Some(m) if m.group(1) == w && m.group(2).toInt == n &&
              m.group(3).toInt == failed =>
            println(s"[state] ✓ $statePath bench numbers match BENCH_DETAIL.json")
            0
          case Some(m) =>
            println(s"[state] ✗ $statePath bench line (${m.group(1)}s/${m.group(2)}q/" +
              s"${m.group(3)}f) vs BENCH_DETAIL.json ($w s/$n q/$failed f)")
            if (fix) {
              Files.write(st, benchRe.replaceAllIn(text,
                Regex.quoteReplacement(line)).getBytes("UTF-8"))
              println(s"[state]   → rewrote $statePath bench line")
              0
            } else 1
        }
      case _ => println("[state] BENCH_DETAIL.json unparsable — skip"); 0
    }
  }

  private def testReportTotals(): (Int, Int) = {
    val dir = new java.io.File("target/test-reports")
    val reports = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("TEST-") && f.getName.endsWith(".xml"))
    val tests = reports.map { f =>
      val t = new String(Files.readAllBytes(f.toPath), "UTF-8")
      """tests="(\d+)"""".r.findFirstMatchIn(t).map(_.group(1).toInt).getOrElse(0)
    }.sum
    (tests, reports.length)
  }

  def main(args: Array[String]): Unit = {
    val fix = args.contains("--fix")
    val nQueries = graft.SparkEntry.queries.size
    val nOracle = graft.SparkEntry.oracleSql.size
    val (nTests, nSuites) = testReportTotals()
    println(s"[state] actual: $nQueries queries, $nOracle oracles, " +
      s"$nTests tests across $nSuites suites")
    require(nQueries == nOracle,
      s"queries ($nQueries) != oracleSql ($nOracle) — every query needs an oracle")

    var drift = 0
    def checkFile(path: String, re: Regex,
        rewrite: (String, Regex) => String): Unit = {
      val p = Paths.get(path)
      if (!Files.exists(p)) { println(s"[state] $path missing — skip"); return }
      val text = new String(Files.readAllBytes(p), "UTF-8")
      re.findFirstMatchIn(text) match {
        case None =>
          println(s"[state] ✗ $path: canonical-counts line not found")
          drift += 1
        case Some(m) =>
          val declared = m.subgroups.map(_.toInt)
          val ok = path match {
            case `statePath` =>
              declared == List(nQueries, nOracle, nTests, nSuites)
            case _ =>
              declared.tail == List(nQueries, nOracle) // survey: (round, q, o)
          }
          if (ok) println(s"[state] ✓ $path counts match")
          else {
            println(s"[state] ✗ $path declares ${declared.mkString("/")}" +
              s" vs actual $nQueries/$nOracle/$nTests/$nSuites")
            if (fix) {
              Files.write(p, rewrite(text, re).getBytes("UTF-8"))
              println(s"[state]   → rewrote $path")
            } else drift += 1
          }
      }
    }

    checkFile(statePath, stateRe, (text, re) =>
      re.replaceAllIn(text,
        s"Canonical counts: **$nQueries `SparkEntry.queries` entries, " +
          s"$nOracle `oracleSql`\nentries (zero rows-only), $nTests ScalaTests " +
          s"($nSuites suites).**"))
    // SURVEY §8 is a per-round LOG — only the NEWEST round's line may be
    // rewritten (an unconditional replaceAllIn silently rewrote every
    // historical round's counts to the current value through r13;
    // restored by hand in r14).
    checkFile(surveyPath, surveyRe, (text, re) => {
      val maxRound = re.findAllMatchIn(text).map(_.group(1).toInt).max
      re.replaceAllIn(text, m =>
        if (m.group(1).toInt == maxRound)
          Regex.quoteReplacement(
            s"round ${m.group(1)}: **$nQueries queries,\nALL $nOracle with DuckDB-oracle entries")
        else Regex.quoteReplacement(m.matched))
    })

    if (nQueries > 0) drift += correctnessEvidence()
    drift += checkBench(fix)

    if (drift > 0) {
      System.err.println(s"[state] DRIFT in $drift file(s) — run with --fix")
      sys.exit(1)
    }
  }
}
