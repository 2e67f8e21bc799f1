package graft.props

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Properties}

/** Pure (no-Spark) property tests of the algorithmic building blocks. */
object PureProps extends Properties("graft") {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def tokenize(s: String): Seq[String] =
    s.toLowerCase.replaceAll("[^a-z ]", "").split(" ", -1).toSeq

  private def minhash(tokens: Set[String], k: Int): Seq[String] =
    (0 until k).map(i => tokens.map(t => md5hex(i.toString + t)).min)

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  val wordSet: Gen[Set[String]] = Gen.choose(5, 40)
    .flatMap(n => Gen.listOfN(n, word).map(_.toSet))

  property("tokenize output only contains [a-z] tokens") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      tokenize(s).forall(_.forall(c => c >= 'a' && c <= 'z'))
    }

  property("tokenize is idempotent on its own output") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val once = tokenize(s).mkString(" ")
      tokenize(once).mkString(" ") == once
    }

  property("minhash similarity estimates Jaccard within ±0.35 (k=16)") =
    Prop.forAll(wordSet, wordSet) { (a, b) =>
      val shared = a.intersect(b)
      val union = a.union(b)
      val est = minhash(a, 16).zip(minhash(b, 16)).count { case (x, y) => x == y } / 16.0
      math.abs(est - (shared.size.toDouble / union.size)) <= 0.35
    }

  property("identical sets have identical minhash signatures") =
    Prop.forAll(wordSet)(a => minhash(a, 16) == minhash(a, 16))

  property("jaccard symmetric, bounded, self=1") =
    Prop.forAll(wordSet, wordSet) { (a, b) =>
      val j = jaccard(a, b)
      j >= 0.0 && j <= 1.0 && j == jaccard(b, a) && jaccard(a, a) == 1.0
    }

  property("GeoMean merge is commutative") =
    Prop.forAll(Gen.listOf(Gen.choose(0.1, 100.0)),
      Gen.listOf(Gen.choose(0.1, 100.0))) { (xs, ys) =>
      val g = graft.functions.GeoMean
      val a = xs.foldLeft(g.zero)(g.reduce)
      val b = ys.foldLeft(g.zero)(g.reduce)
      val m1 = g.finish(g.merge(a, b))
      val m2 = g.finish(g.merge(b, a))
      (m1.isNaN && m2.isNaN) || math.abs(m1 - m2) < 1e-9
    }
}
