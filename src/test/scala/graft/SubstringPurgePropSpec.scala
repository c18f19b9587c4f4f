package graft

import scala.util.Random
import graft.operators.TextDedup

/** Randomized differential for the exact duplicated-substring purge: a
  * direct driver-side reference implementation (hash windows, count
  * occurrences, spare the global first, strike covered positions,
  * rebuild) is compared against the distributed operator on random
  * small-vocabulary corpora — tiny vocabularies force heavy window
  * duplication, overlapping duplicated runs, within-doc repeats and
  * fully-duplicated documents. */
class SubstringPurgePropSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference purge: (doc -> (nWords, nRemoved, clean)). */
  private def reference(docs: Seq[(Long, String)], w: Int,
      keepFirst: Boolean): Map[Long, (Long, Long, String)] = {
    case class Occ(doc: Long, start: Int)
    val wins = docs.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      (0 to ws.length - w).map(i =>
        md5hex(ws.slice(i, i + w).mkString(" ")) -> Occ(id, i))
    }
    val byHash = wins.groupBy(_._1)
    val removedOcc = byHash.valuesIterator.flatMap { occs =>
      if (occs.size < 2) Iterator.empty
      else {
        val sorted = occs.map(_._2).sortBy(o => (o.doc, o.start))
        (if (keepFirst) sorted.tail else sorted).iterator
      }
    }.toSeq
    val coveredByDoc = removedOcc
      .flatMap(o => (o.start until o.start + w).map(p => o.doc -> p))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val cov = coveredByDoc.getOrElse(id, Set.empty)
      val kept = ws.zipWithIndex.collect { case (word, i) if !cov(i) => word }
      id -> ((ws.length.toLong, cov.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  test("distributed purge equals the reference on random corpora") {
    import spark.implicits._
    val rnd = new Random(20260814L)
    for (trial <- 1 to 12) {
      val vocab = (1 to (2 + rnd.nextInt(5))).map(i => s"w$i")
      val w = 2 + rnd.nextInt(3)
      val keepFirst = rnd.nextBoolean()
      val docs = (0 until (3 + rnd.nextInt(8))).map { id =>
        val len = rnd.nextInt(25)
        (id.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val want = reference(docs, w, keepFirst)
      val got = TextDedup.purgeDuplicateSubstrings(
          docs.toDF("doc_id", "text"), "doc_id", "text", w, keepFirst)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == want,
        s"trial $trial (w=$w keepFirst=$keepFirst vocab=${vocab.size}): " +
          s"first diff ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
    }
  }
}
