package graft.operators

/** Optimized Product Quantization — the learned ROTATION in front of PQ
  * (Ge, He, Ke, Sun, "Optimized Product Quantization for Approximate
  * Nearest Neighbor Search", CVPR 2013, §4 non-parametric solution;
  * VERDICT r16 #9 / r15 #8's unbuilt half).
  *
  * PQ quantizes each dim/m-dimensional SUBSPACE independently, so its
  * error is dominated by variance that straddles subspace boundaries.
  * OPQ-NP alternates two exact steps on a training sample:
  *   1. fix R: train PQ codebooks on the rotated sample Y = {R·x},
  *      reconstruct ŷ = decode(encode(R·x));
  *   2. fix codes: solve the orthogonal Procrustes problem
  *      min_R Σ‖R·x − ŷ‖² — with X the n×d sample and Ŷ the n×d
  *      reconstructions, the minimizer of ‖X·Rᵀ − Ŷ‖_F over orthogonal
  *      Rᵀ is U·Vᵀ from the SVD XᵀŶ = U·S·Vᵀ, i.e. R = V·Uᵀ.
  * Each step cannot increase the objective, so the alternation descends
  * monotonically (the paper's Alg. 2).
  *
  * Everything here is DRIVER-side on a bounded sample (same cost class
  * as the coarse-centroid k-means): the d×d SVD is a one-sided Jacobi —
  * no linear-algebra dependency — and the per-subspace k-means is the
  * plain Lloyd iteration with deterministic first-k-distinct seeding
  * (mirroring [[Pq.seedCodebooks]]). The production encode path stays
  * distributed: [[Ivf.attachOpq]] persists R and trains the FINAL
  * codebooks with the same distributed [[Pq.trainCodebooks]] the raw-PQ
  * tier uses, over `matvec(R, v)`. Cosine ranking is invariant under
  * the rotation (orthonormal), so the probe's exact re-rank is
  * untouched; only the ADC candidate ORDER improves. */
object Opq {

  /** Train the OPQ rotation on a driver-side sample.
    * @param sample n rows × d columns (bounded by the caller)
    * @return R as d rows of d doubles (apply as out_j = Σ_i R(j)(i)·v_i) */
  def trainRotation(sample: Array[Array[Double]], m: Int, ksub: Int,
      iters: Int = 10, kmeansIters: Int = 8, restarts: Int = 4): Seq[Seq[Double]] =
    trainRotationAndCodebooks(sample, m, ksub, iters, kmeansIters, restarts)._1

  /** [[trainRotation]] plus the best run's codebooks — the INIT the
    * distributed final training refines. Re-seeding distributedly from
    * scratch would use first-k-distinct seeding on the ROTATED sample,
    * where float noise makes every subvector distinct and the seeds can
    * all land in one cluster; the driver alternation already holds
    * well-separated centers. */
  def trainRotationAndCodebooks(sample: Array[Array[Double]], m: Int, ksub: Int,
      iters: Int = 10, kmeansIters: Int = 8, restarts: Int = 4)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    require(sample.nonEmpty, "OPQ needs a non-empty training sample")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    // MULTI-START: the alternation descends monotonically but lands in
    // the init's basin — identity plus a few seeded random rotations,
    // keep the lowest final quantization error. Deterministic (fixed
    // seeds), driver-only, bounded by the sample size.
    val inits = identity(d) +: (1 to restarts).map(randomRotation(d, _))
    val runs = inits.map { r0 =>
      var r = r0
      var obj = Double.MaxValue
      var it = 0
      while (it < iters) {
        val y = sample.map(x => apply(r, x))
        val cb = trainPqDriver(y, m, ksub, kmeansIters)
        val yhat = y.map(v => reconstruct(v, cb, m))
        obj = y.zip(yhat).map { case (a, b) =>
          var s = 0.0; var i = 0
          while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
          s
        }.sum
        // M = Xᵀ·Ŷ (d×d)
        val mm = Array.ofDim[Double](d, d)
        var t = 0
        while (t < sample.length) {
          val x = sample(t); val h = yhat(t)
          var i = 0
          while (i < d) {
            val xi = x(i)
            if (xi != 0.0) {
              var j = 0
              while (j < d) { mm(i)(j) += xi * h(j); j += 1 }
            }
            i += 1
          }
          t += 1
        }
        val (u, v) = svdUV(mm)
        // Rᵀ = U·Vᵀ  ⇒  R = V·Uᵀ
        r = matMulT(v, u)
        it += 1
      }
      // codebooks consistent with the FINAL r of this run
      val cbFinal = trainPqDriver(sample.map(x => apply(r, x)), m, ksub, kmeansIters)
      (obj, r, cbFinal)
    }
    val best = runs.minBy(_._1)
    (best._2.map(_.toSeq).toSeq,
      best._3.map(_.map(_.toSeq).toSeq).toSeq)
  }

  /** Deterministic random orthonormal matrix: seeded Gaussian entries,
    * Gram-Schmidt columns. */
  private def randomRotation(d: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed * 1000003L + 17L)
    val a = Array.fill(d, d)(rnd.nextGaussian())
    // orthogonalize COLUMNS in place
    var j = 0
    while (j < d) {
      var k = 0
      while (k < j) {
        var dot = 0.0; var i = 0
        while (i < d) { dot += a(i)(j) * a(i)(k); i += 1 }
        i = 0
        while (i < d) { a(i)(j) -= dot * a(i)(k); i += 1 }
        k += 1
      }
      var n2 = 0.0; var i = 0
      while (i < d) { n2 += a(i)(j) * a(i)(j); i += 1 }
      val n = math.sqrt(n2)
      i = 0
      while (i < d) { a(i)(j) /= n; i += 1 }
      j += 1
    }
    a
  }

  /** y = R·x. */
  def apply(r: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val d = r.length
    val out = new Array[Double](d)
    var j = 0
    while (j < d) {
      val row = r(j)
      var s = 0.0
      var i = 0
      val n = math.min(row.length, x.length)
      while (i < n) { s += row(i) * x(i); i += 1 }
      out(j) = s
      j += 1
    }
    out
  }

  private def identity(d: Int): Array[Array[Double]] =
    Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

  /** A·Bᵀ for square matrices. */
  private def matMulT(a: Array[Array[Double]],
      b: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += a(i)(k) * b(j)(k); k += 1 }
      s
    }
  }

  /** Per-subspace Lloyd k-means with deterministic FARTHEST-POINT
    * seeding (k-means++ without the randomness: seed 0 = sample 0, each
    * next seed = the point farthest from its nearest chosen seed, ties
    * to lowest index) — training-only, the persisted codebooks come
    * from the distributed path. Farthest-point matters here: the
    * Procrustes step's targets are these reconstructions, and
    * first-k-distinct seeding on a rotated (mixed-basis) sample
    * collapses clusters the alternation then never separates. */
  private[graft] def trainPqDriver(y: Array[Array[Double]], m: Int,
      ksub: Int, iters: Int): Array[Array[Array[Double]]] = {
    val d = y.head.length
    val dsub = d / m
    Array.tabulate(m) { s =>
      val sub = y.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      val seeds = scala.collection.mutable.ArrayBuffer(sub(0))
      while (seeds.size < math.min(ksub, sub.length)) {
        var bestIdx = -1; var bestDist = -1.0
        var i = 0
        while (i < sub.length) {
          var nd = Double.MaxValue
          seeds.foreach { c =>
            var t = 0.0; var j = 0
            while (j < dsub) { val x = sub(i)(j) - c(j); t += x * x; j += 1 }
            if (t < nd) nd = t
          }
          if (nd > bestDist + 1e-15) { bestDist = nd; bestIdx = i }
          i += 1
        }
        if (bestDist <= 1e-15) seeds += sub(0) // degenerate: all covered
        else seeds += sub(bestIdx)
        if (bestDist <= 1e-15 && seeds.size < ksub) {
          // no more distinct mass to cover — stop early
          while (seeds.size < ksub) seeds += sub(0)
        }
      }
      var cents = seeds.toArray.map(_.clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Long](cents.length)
        sub.foreach { v =>
          val c = argminL2(v, cents)
          counts(c) += 1
          var j = 0
          while (j < dsub) { sums(c)(j) += v(j); j += 1 }
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))
        }.toArray
        it += 1
      }
      cents
    }
  }

  private def argminL2(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bd = Double.MaxValue; var c = 0
    while (c < cents.length) {
      var s = 0.0; var j = 0
      val w = cents(c)
      while (j < v.length) { val t = v(j) - w(j); s += t * t; j += 1 }
      if (s < bd) { bd = s; best = c }
      c += 1
    }
    best
  }

  private def reconstruct(v: Array[Double], cb: Array[Array[Array[Double]]],
      m: Int): Array[Double] = {
    val d = v.length
    val dsub = d / m
    val out = new Array[Double](d)
    var s = 0
    while (s < m) {
      val sub = java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub)
      val w = cb(s)(argminL2(sub, cb(s)))
      System.arraycopy(w, 0, out, s * dsub, dsub)
      s += 1
    }
    out
  }

  /** One-sided Jacobi SVD of a small square matrix: rotate column pairs
    * until mutually orthogonal (B = M·V), then U = column-normalized B.
    * Zero-norm columns (rank deficiency) are completed to an orthonormal
    * basis from the identity — U·Vᵀ stays orthogonal, which is all the
    * Procrustes step needs. Deterministic; O(d³) per sweep, d ≤ a few
    * hundred in any embedding use. */
  private[operators] def svdUV(mIn: Array[Array[Double]])
      : (Array[Array[Double]], Array[Array[Double]]) = {
    val d = mIn.length
    // work on columns: b(i)(j) = element (row i, col j)
    val b = Array.tabulate(d, d)((i, j) => mIn(i)(j))
    val v = identity(d)
    var sweep = 0
    var rotated = true
    while (sweep < 60 && rotated) {
      rotated = false
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          var app = 0.0; var aqq = 0.0; var apq = 0.0
          var i = 0
          while (i < d) {
            app += b(i)(p) * b(i)(p); aqq += b(i)(q) * b(i)(q)
            apq += b(i)(p) * b(i)(q)
            i += 1
          }
          if (math.abs(apq) > 1e-12 * math.sqrt(app * aqq) && apq != 0.0) {
            rotated = true
            val zeta = (aqq - app) / (2.0 * apq)
            val t = math.signum(zeta) / (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            i = 0
            while (i < d) {
              val bp = b(i)(p); val bq = b(i)(q)
              b(i)(p) = c * bp - s * bq
              b(i)(q) = s * bp + c * bq
              val vp = v(i)(p); val vq = v(i)(q)
              v(i)(p) = c * vp - s * vq
              v(i)(q) = s * vp + c * vq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // U columns = normalized B columns; degenerate ones completed from
    // the identity basis by Gram-Schmidt
    val u = Array.ofDim[Double](d, d)
    val have = scala.collection.mutable.ArrayBuffer.empty[Int]
    var j = 0
    while (j < d) {
      var n2 = 0.0; var i = 0
      while (i < d) { n2 += b(i)(j) * b(i)(j); i += 1 }
      if (n2 > 1e-18) {
        val n = math.sqrt(n2)
        i = 0
        while (i < d) { u(i)(j) = b(i)(j) / n; i += 1 }
        have += j
      }
      j += 1
    }
    val missing = (0 until d).filterNot(have.contains)
    missing.foreach { j =>
      // next identity vector orthogonalized against existing columns
      var picked = false
      var e = 0
      while (!picked && e < d) {
        val w = new Array[Double](d)
        w(e) = 1.0
        var k = 0
        while (k < d) {
          var dot = 0.0; var i = 0
          while (i < d) { dot += w(i) * u(i)(k); i += 1 }
          if (dot != 0.0) { i = 0; while (i < d) { w(i) -= dot * u(i)(k); i += 1 } }
          k += 1
        }
        var n2 = 0.0; var i = 0
        while (i < d) { n2 += w(i) * w(i); i += 1 }
        if (n2 > 1e-12) {
          val n = math.sqrt(n2)
          i = 0
          while (i < d) { u(i)(j) = w(i) / n; i += 1 }
          picked = true
        }
        e += 1
      }
    }
    // return as ROW-major matrices (row i = Seq over j)
    (u, v)
  }
}
