package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The bench harness must be honest: a query that throws is recorded in
  * the JSON line and fails the run — never silently timed as ~0 s (a
  * regression masquerading as a speedup). */
class BenchSpec extends SparkSuite {

  test("a deliberately-broken query fails the bench loudly, not as a ~0s time") {
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "ok" -> ((s, _) => s.range(3).toDF()),
      "broken" -> ((s, _) => s.range(1).select(raise_error(lit("deliberate")))))
    val (line, errors) = Bench.run(spark, "/root/testdata/sf0.001", qs)
    assert(errors.keySet == Set("broken"), s"exactly the broken query recorded: $errors")
    assert(line.contains("\"errors\":{\"broken\":\""), s"error surfaces in the JSON line: $line")
    assert(line.contains("\"ok\":"), "healthy queries still timed")
  }
}
