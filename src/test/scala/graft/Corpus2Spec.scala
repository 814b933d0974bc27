package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Corpus2

/** Semantic referees for the r7q batch — template prefixes, truncation
  * duplicates, and `_metadata` file accounting.
  */
class Corpus2Spec extends AnyFunSuite with SharedSpark {

  private def toks(text: String): Array[String] = text.trim.split("\\s+")

  test("template detect: prefix groups match the in-memory count") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "n_chars")
      .collect().map(r => (r.getLong(0), toks(r.getString(1)), r.getLong(2)))
      .filter(_._2.length >= 3)
    val expect = docs.groupBy(d => d._2.take(3).mkString(" "))
      .filter(_._2.length >= 2)
      .map { case (p, g) => p -> ((g.length.toLong, g.map(_._3).sum, g.map(_._1).min)) }
    val got = Corpus2.qTemplateDetect(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
  }

  test("prefix dups: every reported pair is a genuine proper token prefix") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val rows = Corpus2.qPrefixDups(spark, sfDir).collect()
    rows.foreach { r =>
      val (sid, lid) = (r.getLong(0), r.getLong(1))
      val (a, b) = (docs(sid), docs(lid))
      assert(a.length < b.length && b.take(a.length).sameElements(a),
        s"pair ($sid, $lid) is not a proper prefix")
      assert(r.getInt(2) == a.length && r.getInt(3) == b.length - a.length)
    }
    // completeness against the brute-force referee (≥8-token docs)
    val eligible = docs.filter(_._2.length >= 8).toSeq
    val brute = for {
      (sid, a) <- eligible; (lid, b) <- eligible
      if a.length < b.length && b.take(a.length).sameElements(a)
    } yield (sid, lid)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == brute.toSet)
  }

  test("file accounting: one file per partition, per-type rows match") {
    val expect = Tables.events(spark, sfDir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Corpus2.qFileAccounting(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == expect.keySet)
    got.foreach { r =>
      assert(r.getLong(1) == 1L, s"${r.getString(0)} has ${r.getLong(1)} files")
      assert(r.getLong(2) == expect(r.getString(0)))
    }
  }
}
