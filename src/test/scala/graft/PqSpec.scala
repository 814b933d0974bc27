package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.{Pq, Similarity}

/** Product quantization: packed-code integrity, ADC recall vs the brute
  * referee, and the planted-near-dup guarantee. */
class PqSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def vecs = Tables.embeddings(spark, sfDir)

  test("packed codes unpack to the per-subspace argmin assignments") {
    val books = Pq.train(vecs, m = 8, ksub = 16, iters = 1)
    val enc = Pq.encode(vecs, books)
    // every nibble is a valid code id, and the pack uses only 32 bits
    val bad = enc.filter(
      (0 until 8).map(j => shiftright(col("pq_code"), j * 4)
        .bitwiseAND(lit(15L)).between(0, 15)).reduce(_ && _) === false ||
        col("pq_code") < 0 || col("pq_code") >= (1L << 32)).count()
    assert(bad == 0L)
    // reconstruction sanity: codeword of nibble j approximates the
    // subvector better than a FIXED wrong codeword would on average —
    // check via quantization distortion < distortion to codeword 0
    val j = 0
    val book0 = books(j)
    val cw = (c: Int) => array(book0(c).toIndexedSeq.map(lit): _*)
    def d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Similarity.dot(a, a) - lit(2.0) * Similarity.dot(a, b) + Similarity.dot(b, b)
    val sub = slice(col("emb"), 1, 8)
    val nib = shiftright(col("pq_code"), 0).bitwiseAND(lit(15L)).cast("int")
    val assignedCw = element_at(
      array(book0.indices.map(cw): _*), nib + 1)
    val dist = enc.select(
      avg(d2(sub, assignedCw)).as("own"),
      avg(d2(sub, cw(0))).as("fixed")).head
    assert(dist.getDouble(0) <= dist.getDouble(1),
      "assigned codeword must beat a fixed codeword on mean distortion")
  }

  test("training sample is hash-bounded to ~trainTarget, and bounded training still recalls") {
    // r14 (VERDICT r13 task 2): the docstring contract is "only training
    // scales down" — the training set must be ~trainTarget rows no
    // matter the corpus, not a constant fraction. Replicate the
    // hash-threshold filter and check the selected-row count is within
    // binomial slack of the target (500-row corpus, target 100 →
    // keep-rate ~0.2, sd ≈ 9).
    val total = vecs.count()
    val target = 100L
    val buckets = 1L << 20
    val keep = (buckets * target + total - 1) / total
    val sampled = vecs.filter(pmod(xxhash64($"vec_id"), lit(buckets)) < lit(keep)).count()
    assert(sampled >= 40 && sampled <= 200,
      s"hash-threshold sample $sampled far from target $target (corpus $total)")
    // codebooks trained on the bounded sample still beat the recall floor
    val books = Pq.train(vecs, m = 8, ksub = 16, iters = 1, trainTarget = target)
    assert(books.length == 8 && books.forall(_.length == 16))
    val qs = vecs.filter($"vec_id" < 5)
    val brute = Similarity.bruteTopK(vecs, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Pq.adcTopK(vecs, qs, 10, iters = 1, rerank = 50, trainTarget = target)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (pq & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"bounded-sample PQ recall@10 $recall below 0.5")
  }

  test("ADC + exact re-rank recovers most of the brute top-10") {
    val qs = vecs.filter($"vec_id" < 5)
    val brute = Similarity.bruteTopK(vecs, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Pq.adcTopK(vecs, qs, 10, rerank = 50).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (pq & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall@10 $recall below 0.5")
    // widening the shortlist can only help (monotone in rerank)
    val pqWide = Pq.adcTopK(vecs, qs, 10, rerank = 200).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallWide = (pqWide & brute).size.toDouble / brute.size
    assert(recallWide >= recall,
      s"recall must be monotone in rerank: $recallWide < $recall")
  }

  test("a planted near-dup query returns its original at rank 1") {
    // perturbed copy of vec 0 (cosine ~0.9998): its subvectors quantize
    // to (nearly) the same codewords, so the original tops the ADC
    // shortlist and exact re-rank puts it first
    val aug = Similarity.withPlantedDups(vecs)
    val q = aug.filter($"vec_id" === 100000L)
    val top = Pq.adcTopK(aug, q, 1).collect()
    assert(top.length == 1)
    assert(top.head.getLong(2) == 0L,
      s"expected original vec 0 at rank 1, got ${top.head.getLong(2)}")
    assert(top.head.getDouble(3) > 0.99)
  }

  test("IVF-PQ: planted near-dup at rank 1, recall floor, probed-cell pruning") {
    val aug = Similarity.withPlantedDups(vecs)
    val q = aug.filter($"vec_id" === 100000L)
    // residual codes of a ±2% copy quantize like the original's; its
    // cell is the original's cell, so nprobe=4 must surface it
    val top = Pq.ivfPqTopK(aug, q, 1).collect()
    assert(top.length == 1 && top.head.getLong(2) == 0L)
    assert(top.head.getDouble(3) > 0.99)
    // recall floor vs brute on plain queries — nprobe misses are the
    // price of pruning, but half the brute top-10 must survive
    val qs = vecs.filter($"vec_id" < 5)
    val brute = Similarity.bruteTopK(vecs, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Pq.ivfPqTopK(vecs, qs, 10, rerank = 200).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF-PQ recall@10 $recall below 0.4")
    // full-probe degenerate case = no pruning: recall must not drop
    // below the same-shortlist plain-PQ path's
    val full = Pq.ivfPqTopK(vecs, qs, 10, nprobe = 16, rerank = 200)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val fullRecall = (full & brute).size.toDouble / brute.size
    assert(fullRecall >= recall,
      s"probing every cell can't lose candidates: $fullRecall < $recall")
  }

  test("reported sims are exact: they match brute sims for shared pairs") {
    val qs = vecs.filter($"vec_id" < 3)
    val brute = Similarity.bruteTopK(vecs, qs, 10).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val pq = Pq.adcTopK(vecs, qs, 10).collect()
    val shared = pq.filter(r => brute.contains((r.getLong(0), r.getLong(2))))
    assert(shared.nonEmpty)
    shared.foreach { r =>
      assert(r.getDouble(3) == brute((r.getLong(0), r.getLong(2))),
        "ADC path must report the same exact cosine as brute")
    }
  }

  test("typed PqOps expressions match the inlined-literal reference formulation") {
    // r15: pq_encode / pq_lut_sum / ivf_assign replaced per-codeword
    // inlined-literal subtrees (seconds of driver-side Catalyst analysis
    // per ANN query). This pins BIT-IDENTICAL arithmetic against the
    // replaced formulation, rebuilt here as the reference.
    import graft.functions.PqOps
    val books = Pq.train(vecs)
    val m = books.length
    val ksub = books(0).length
    val dsub = books(0)(0).length
    val bits = 4
    val prepped = Similarity.prepared(vecs).select(col("vec_id"), col("emb"))
    // reference: the former array_min over (d2, code) structs, per subspace
    def refAssign(j: Int) = {
      val sub = slice(col("emb"), j * dsub + 1, dsub)
      array_min(array(books(j).indices.map { c =>
        val cv = books(j)(c)
        val cvLit = array(cv.toIndexedSeq.map(lit): _*)
        val c2 = cv.map(x => x * x).sum
        struct((lit(-2.0) * Similarity.dot(sub, cvLit) + lit(c2)).as("d2"),
          lit(c).as("code"))
      }: _*)).getField("code")
    }
    val refPacked = (0 until m).map { j =>
      refAssign(j).cast("long") * lit(1L << (j * bits))
    }.reduce(_ + _)
    val mismatch = prepped
      .select(PqOps.pq_encode(col("emb"), books, bits).as("a"), refPacked.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatch == 0L, s"pq_encode diverged from reference on $mismatch rows")
    // reference LUT sum: the former element_at chain over inlined arrays
    val q = prepped.orderBy("vec_id").head.getSeq[Double](1).toArray
    val refLut = (0 until m).map { j =>
      val qsub = q.slice(j * dsub, (j + 1) * dsub)
      val lut = books(j).map(cv =>
        cv.zip(qsub).map { case (c, x) => (c - x) * (c - x) }.sum)
      val nibble = shiftright(col("pc"), j * bits)
        .bitwiseAND(lit((1L << bits) - 1)).cast("int")
      element_at(array(lut.toIndexedSeq.map(lit): _*), nibble + 1)
    }.reduce(_ + _)
    val luts = books.zipWithIndex.map { case (book, j) =>
      val qsub = q.slice(j * dsub, (j + 1) * dsub)
      book.map(cv => cv.zip(qsub).map { case (c, x) => (c - x) * (c - x) }.sum)
    }
    val lutMismatch = prepped
      .select(PqOps.pq_encode(col("emb"), books, bits).as("pc"))
      .select(PqOps.pq_lut_sum(col("pc"), luts, bits).as("a"), refLut.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(lutMismatch == 0L, s"pq_lut_sum diverged on $lutMismatch rows")
    // reference IVF assignment: array_min over (d2, cid) structs with the
    // same (emb2 - 2*dot) + c2 association order
    val cents: Array[(Int, Array[Double])] =
      books(0).zipWithIndex.map { case (cv, i) => (i, cv ++ cv.reverse ++ cv ++ cv.reverse ++ q.slice(0, 32)) }
    val refIvf = array_min(array(cents.toIndexedSeq.map { case (cid, cv) =>
      val cvLit = array(cv.toIndexedSeq.map(lit): _*)
      val c2 = cv.map(x => x * x).sum
      struct((Similarity.dot(col("emb"), col("emb")) - lit(2.0) *
        Similarity.dot(col("emb"), cvLit) + lit(c2)).as("d2"),
        lit(cid).as("cid"))
    }: _*)).getField("cid")
    val ivfMismatch = prepped
      .select(PqOps.ivf_assign(col("emb"), cents).as("a"), refIvf.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(ivfMismatch == 0L, s"ivf_assign diverged on $ivfMismatch rows")
    // reference probe: the former array_sort over (d2, cid) structs +
    // slice + cid extraction — the formulation ivf_probe replaced.
    // Ordering ties and NaN placement must match (struct sort ascending
    // with NaN-last doubles = Double.TotalOrdering in the expression).
    val nprobe = 4
    val refProbe = transform(
      slice(array_sort(array(cents.toIndexedSeq.map { case (cid, cv) =>
        val cvLit = array(cv.toIndexedSeq.map(lit): _*)
        val c2 = cv.map(x => x * x).sum
        struct((Similarity.dot(col("emb"), col("emb")) - lit(2.0) *
          Similarity.dot(col("emb"), cvLit) + lit(c2)).as("d2"),
          lit(cid).as("cid"))
      }: _*)), 1, nprobe), s => s.getField("cid"))
    val probeMismatch = prepped
      .select(PqOps.ivf_probe(col("emb"), cents, nprobe).as("a"),
        refProbe.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(probeMismatch == 0L, s"ivf_probe diverged on $probeMismatch rows")
  }
}
