package graft

import org.apache.spark.sql.Column

/** Public column-function surface of the engine. */
package object functions {
  /** Cosine similarity of two `array<float>` columns — a codegen'd native
    * Catalyst expression (see
    * [[org.apache.spark.sql.graftext.CosineSimilarity]]). */
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.GraftColumns.cosineSim(a, b)
}
