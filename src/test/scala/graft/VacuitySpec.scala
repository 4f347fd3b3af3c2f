package graft

/** Registry-wide vacuity sweep at the SECOND scale factor.
  *
  * Verify's own guard (exit 2 + vacuous.json on any empty oracle result)
  * runs only at the SF it was invoked with — the driver's sf0.01. A
  * predicate that drifts to empty ONLY at sf0.001 (the SF the local dev
  * loop uses for edge cases: empty groups, single rows) would pass the
  * driver gate while certifying nothing at the small scale. This spec is
  * the CI leg the round-7 verdict asked for: every oracle-gated query must
  * return at least one row at sf0.001 too — the in-suite equivalent of
  * asserting `vacuous.json == []` at both SFs.
  *
  * Emptiness is probed with isEmpty (a limit-1 job), not a full count:
  * the sweep gates non-vacuity, while value correctness at this SF stays
  * with the check_oracle.py loop and the driver's DuckDB compare.
  */
class VacuitySpec extends SparkSuite {

  test("no oracle-gated query is vacuous at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val vacuous = SparkEntry.queries.toSeq
      .filter { case (name, _) => SparkEntry.oracleSql.contains(name) }
      .sortBy(_._1)
      .flatMap { case (name, fn) =>
        spark.catalog.clearCache()
        val empty =
          try fn(spark, sfDir).isEmpty
          catch { case e: Throwable =>
            fail(s"$name threw at $sfDir: ${e.getMessage}")
          }
        if (empty) Some(name) else None
      }
    assert(vacuous.isEmpty,
      s"${vacuous.size} oracle-gated quer${if (vacuous.size == 1) "y" else "ies"} " +
        s"returned 0 rows at sf0.001 (trivially matching hash certifies " +
        s"nothing): ${vacuous.mkString(", ")}")
  }
}
