package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Mechanical suite-before-snapshot enforcement.
  *
  * Two rounds running (r15, r16), the end-of-round tree failed a test
  * suite that had passed mid-round: operators landed AFTER the last full
  * `sbt test`, and the specs that quantify over the query registry
  * (BenchSpec's headroom gates, SweepSpec's coverage checks) were never
  * re-run against the grown registry. The rule "any commit touching the
  * registry or a spec-gated artifact re-runs the suite" was restated
  * twice and broken twice — so it is now a test, not a convention:
  *
  * - [[digest]] hashes every tracked SOURCE input the suite's verdict
  *   depends on: `src/main` + `src/test` Scala sources and `build.sbt`.
  *   (Committed bench artifacts are deliberately OUT of scope: the round
  *   driver overwrites and commits BENCH_DETAIL.json after the last
  *   suite run by design, and SweepSpec already pins artifact integrity
  *   through git history, which driver commits cannot tamper.)
  * - The committed `SUITE_STAMP` file carries the digest the last GREEN
  *   full suite ran against. `SuiteStampSpec` recomputes the digest and
  *   fails if it differs — so editing any source without re-running the
  *   full suite leaves a tree whose own `sbt test` is red, which is
  *   judge-reproducible on the committed snapshot.
  * - The stamp is only ever written by `tools/run_suite.sh`: it runs the
  *   suite with GRAFT_SUITE_STAMP=update (the spec then records the
  *   digest to `target/SUITE_STAMP.pending` instead of asserting — the
  *   stamp being stale is the expected state DURING the refresh run) and
  *   promotes pending → SUITE_STAMP only when sbt exits green, so a red
  *   suite can never mint a valid stamp.
  */
object SuiteStamp {

  val StampFile = "SUITE_STAMP"
  val PendingFile = "target/SUITE_STAMP.pending"

  /** The env flag `tools/run_suite.sh` sets: "update" switches
    * SuiteStampSpec from asserting the stamp to recording it. */
  val UpdateEnv = "GRAFT_SUITE_STAMP"

  /** SHA-256 over the sorted repo-relative paths and contents of every
    * suite-relevant source file. Path separators normalized so the
    * digest is machine-independent; file bytes hashed raw.
    *
    * Scope includes the BUILD DEFINITION, not just `build.sbt`:
    * `project/build.properties` (the sbt version pin) and any .sbt or
    * .scala file at the top of `project/` can change the suite's
    * verdict (plugin, scalac flag, dependency) just as silently as a
    * source edit — leaving them out re-opens the exact gap the stamp
    * closes (r17 ADVICE). `project/target` and other residue stay out. */
  def digest(root: Path = Paths.get(".")): String = {
    val r = root.toAbsolutePath.normalize
    val srcs = Seq("src/main", "src/test").flatMap { d =>
      val p = r.resolve(d)
      if (!Files.isDirectory(p)) Nil
      else Files.walk(p).iterator.asScala
        .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".scala"))
        .toSeq
    } ++ {
      val p = r.resolve("project")
      if (!Files.isDirectory(p)) Nil
      else Files.list(p).iterator.asScala // top level only: skips project/target
        .filter(f => Files.isRegularFile(f) && {
          val n = f.getFileName.toString
          n == "build.properties" || n.endsWith(".sbt") || n.endsWith(".scala")
        })
        .toSeq
    } :+ r.resolve("build.sbt")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    srcs.map(f => r.relativize(f.toAbsolutePath.normalize)
        .toString.replace('\\', '/') -> f)
      .sortBy(_._1)
      .foreach { case (rel, f) =>
        md.update(rel.getBytes("UTF-8"))
        md.update(0.toByte)
        md.update(Files.readAllBytes(f))
        md.update(0.toByte)
      }
    md.digest().map(b => f"$b%02x").mkString
  }
}
