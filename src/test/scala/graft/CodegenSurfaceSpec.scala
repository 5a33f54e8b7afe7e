package graft

/** Mechanical guard for the "native functions, not UDFs" discipline: every
  * query's physical plan must be UDF-free except the documented exceptions
  * whose kernels have no built-in equivalent (trial-division primality,
  * Gauss-Jordan inverse, the stubbed multimodal codec). A UDF sneaking
  * into any other operator breaks whole-stage codegen on the hot path and
  * fails here before it can regress a benchmark. */
class CodegenSurfaceSpec extends SparkSpec {

  /** Plans allowed to contain UDF / typed-lambda evaluation nodes. */
  private val documentedUdfQueries = Set(
    "q2_prime_sum",        // isPrime — no built-in primality
    "q3_matrix_inverse",   // Gauss-Jordan — no built-in linalg
    "m2_image_features",   // typed mapPartitions batch path (codec stub)
    "m3_frame_sample",     // stub codec UDF
    "m4_resize")           // typed mapPartitions batch path (codec stub)

  // mr_* run eagerly through Engine.mapReduce (RDD lambdas, not SQL UDFs)
  // and produce local results; they have no SQL plan to scan.
  private val planless = (k: String) => k.startsWith("mr_") || k == "sys_server_spec"

  test("every non-exempt query plan is UDF-free") {
    // Walk the actual expression trees — plan.toString truncates wide
    // projections at maxToStringFields and could hide a UDF.
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (k, _) => planless(k) || documentedUdfQueries(k) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan
        val hasUdf = plan.collect { case node =>
          node.expressions.exists(e =>
            e.collectFirst { case u: ScalaUDF => u }.isDefined)
        }.exists(identity)
        if (hasUdf) Some(name) else None
      }
    assert(offenders.isEmpty, s"unexpected UDFs in: ${offenders.mkString(", ")}")
  }
}
