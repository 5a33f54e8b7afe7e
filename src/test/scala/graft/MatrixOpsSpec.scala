package graft

import graft.operators.MatrixOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Q3 matrix kernels and the mathematical identity the DuckDB
  * full-trace oracle is generated from: trace(A⁻¹) = Σᵢ Mᵢᵢ / det(A)
  * (principal minors over the determinant). */
class MatrixOpsSpec extends AnyFunSuite {

  private def det(m: Array[Array[Double]]): Double =
    if (m.length == 1) m(0)(0)
    else (0 until m.length).map { j =>
      val minor = m.drop(1).map(r => r.indices.filter(_ != j).map(r).toArray)
      (if (j % 2 == 0) 1.0 else -1.0) * m(0)(j) * det(minor)
    }.sum

  test("gaussJordanInverse: diagonal matrix inverts to reciprocal diagonal") {
    val a = Array(
      Array(2.0, 0.0, 0.0, 0.0), Array(0.0, 4.0, 0.0, 0.0),
      Array(0.0, 0.0, 5.0, 0.0), Array(0.0, 0.0, 0.0, 8.0))
    val inv = MatrixOps.gaussJordanInverse(a)
    assert(math.abs(MatrixOps.trace(inv) - 1.075) < 1e-12)
    assert(MatrixOps.maxAbsErrorVsIdentity(a, inv) < 1e-12)
  }

  test("trace(inv) equals principal-minors-over-det (the oracle identity)") {
    val rng = new scala.util.Random(42L)
    for (_ <- 0 until 50) {
      // same build as Q3: entries in [-1, 1], diagonal boosted by 8
      val a = Array.tabulate(4, 4) { (i, j) =>
        2 * rng.nextDouble() - 1 + (if (i == j) 8.0 else 0.0) }
      val inv = MatrixOps.gaussJordanInverse(a)
      val minors = (0 until 4).map { i =>
        det(a.indices.filter(_ != i).map(r =>
          a.indices.filter(_ != i).map(c => a(r)(c)).toArray).toArray)
      }.sum
      val closed = minors / det(a)
      assert(math.abs(MatrixOps.trace(inv) - closed) < 1e-9,
        s"gauss=${MatrixOps.trace(inv)} closed=$closed")
    }
  }
}
