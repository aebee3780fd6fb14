package graft.functions

/** Driver-side scalar policies (reference §2.8 math kernels).
  *
  * Cubic-Bezier "aggressiveness" curve (api/app/lib/aggressiveness_curve.py
  * :20-197): policy knob → multiplier via a cubic Bezier with control
  * points, evaluated by Newton-solving x(t) = x for t then returning y(t).
  * A driver-side policy function in Spark (it shapes thresholds, not rows).
  */
object Curves {

  /** Evaluate the cubic Bezier defined by (0,0), (x1,y1), (x2,y2), (1,1)
    * at horizontal position x ∈ [0,1] — Newton iteration on the x
    * polynomial, matching the reference's get_y_for_x. */
  def bezierYForX(x: Double, x1: Double, y1: Double, x2: Double, y2: Double,
      tolerance: Double = 1e-7, maxIter: Int = 50): Double = {
    require(x >= 0.0 && x <= 1.0, s"x out of range: $x")
    def xAt(t: Double): Double =
      3 * math.pow(1 - t, 2) * t * x1 + 3 * (1 - t) * t * t * x2 + math.pow(t, 3)
    def dxAt(t: Double): Double =
      3 * math.pow(1 - t, 2) * x1 + 6 * (1 - t) * t * (x2 - x1) +
        3 * t * t * (1 - x2)
    def yAt(t: Double): Double =
      3 * math.pow(1 - t, 2) * t * y1 + 3 * (1 - t) * t * t * y2 + math.pow(t, 3)
    var t = x
    var i = 0
    while (i < maxIter && math.abs(xAt(t) - x) > tolerance) {
      val d = dxAt(t)
      if (d == 0.0) i = maxIter
      else { t = (t - (xAt(t) - x) / d).max(0.0).min(1.0); i += 1 }
    }
    yAt(t)
  }

  /** Michaelis-Menten saturation (Scala-side twin of Scoring.mmSaturation). */
  def mm(x: Double, k: Double): Double = x / (x + k)
}
