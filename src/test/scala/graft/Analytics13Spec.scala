package graft

import org.scalatest.funsuite.AnyFunSuite

/** r8 batch: the URL-canonicalization dedup key's unification claim and
  * the DP release's determinism — the properties the oracle compare
  * can't see (it certifies values, not WHY the op is safe to rely on).
  */
class Analytics13Spec extends AnyFunSuite with SharedSpark {

  test("url canonicalization unifies case/order/tracking variants losslessly") {
    val rows = graft.queries.Analytics13.qUrlCanonical(spark, sfDir).collect()
    val total = Tables.events(spark, sfDir).count()
    // lossless: every event lands under exactly one canonical key
    assert(rows.map(_.getLong(1)).sum == total)
    // unifying: at least one canonical key collapses >1 raw spelling
    // (the planted case/order variants), and none explodes
    assert(rows.exists(_.getLong(2) > 1L))
    // canonical form is self-normal: no utm_ params, no fragments, no
    // uppercase, no default port survive
    rows.map(_.getString(0)).foreach { u =>
      assert(!u.contains("utm_") && !u.contains("#") && !u.contains(":80/"))
      assert(u == u.toLowerCase)
    }
  }

  test("html extraction strips markup everywhere and keeps every title") {
    val rows = graft.queries.Analytics13.qHtmlExtract(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1), "every planted doc has a title")
      assert(r.getLong(4) < r.getLong(3), "extraction must shed markup chars")
    }
  }

  test("license filter: class counts bracket the any-class count") {
    val rows = graft.queries.Analytics13.qLicenseFilter(spark, sfDir).collect()
    rows.foreach { r =>
      val (n, c, rr, l, f) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(f <= c + rr + l && f >= Seq(c, rr, l).max, r.toString)
      assert(f <= n)
    }
    // the planted markers actually fire somewhere
    assert(rows.map(_.getLong(5)).sum > 0)
  }

  test("code detect: planted docs flagged, prose docs clean") {
    val rows = graft.queries.Analytics13.qCodeDetect(spark, sfDir).collect()
    val (docs, code) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(code > 0 && code < docs, s"expected a mixed corpus, got $code/$docs")
  }

  test("anchor links: every planted link lands under exactly one host") {
    val rows = graft.queries.Analytics13.qAnchorLinks(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == 2 * total) // 2 anchors per doc
    assert(rows.forall(_.getString(0).endsWith(".example")))
  }

  test("mirror detect: planted mirrors span hosts, planted drift spans crawls") {
    val rows = graft.queries.Analytics13.qMirrorDetect(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (mg, md, mf) = rows("mirror")
    assert(mg > 0 && mf > 1 && md >= mg * 2, s"mirror: $rows")
    val (dg, dd, df) = rows("recrawl_drift")
    assert(dg > 0 && df > 1 && dd >= dg * 2, s"drift: $rows")
  }

  test("dp release is deterministic across runs and noise is real") {
    val a = graft.queries.Analytics13.qDpRelease(spark, sfDir).collect()
    val b = graft.queries.Analytics13.qDpRelease(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq) // seeded noise: re-release never re-randomizes
    val noises = a.map(_.getDouble(2))
    assert(noises.forall(n => !n.isNaN && !n.isInfinite))
    assert(noises.exists(_ != 0.0)) // the release is actually perturbed
  }
}
