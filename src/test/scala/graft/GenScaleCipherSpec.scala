package graft

import graft.tools.GenScale
import org.apache.spark.sql.functions._

/** Mechanizes the scale-probe generator's correctness claims
  * (SCALING.md "Method"): the per-replica vocabulary isomorphism must be
  * (1) INJECTIVE per replica — the exact 10×/100× pair-count invariant
  * rests on it; (2) LEXICON-preserving — quality/lang gates must see
  * replicas as the base corpus; (3) length- and digit-preserving for
  * non-guarded words — gopher's mean-word-length band and the digit
  * ratio must not shift; (4) deterministic across invocations; and
  * (5) cross-replica DISJOINT outside the lexicon — the Heaps'-law df
  * property that keeps prefix filtering measurable. Checked on the real
  * sf0.1 fixture vocabulary plus adversarial words (lexicon members,
  * single letters, digit-bearing and non-alpha tokens).
  */
class GenScaleCipherSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureVocab: Seq[String] =
    graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSeq.sorted

  private def mapped(words: Seq[String], i: Int): Seq[String] =
    words.toDF("w").select(GenScale.mapWord(col("w"), i).as("m"))
      .as[String].collect().toSeq

  test("injective, lexicon/length/digit-preserving on fixture + adversarial vocab") {
    val adversarial = GenScale.Lex ++ Seq("q", "x9z", "a1a", "zz", "sgd")
    val vocab = (fixtureVocab ++ adversarial).distinct
    for (i <- Seq(1, 7, 42, 99)) {
      val m = mapped(vocab, i)
      // (1) injective: distinct inputs -> distinct outputs
      assert(m.distinct.size === vocab.size, s"replica $i: cipher collision")
      // (2) lexicon fixed pointwise; non-lexicon words leave the lexicon
      vocab.zip(m).foreach { case (w, mw) =>
        if (GenScale.Lex.contains(w)) assert(mw === w, s"replica $i: lexicon word moved")
        else {
          assert(!GenScale.Lex.contains(mw), s"replica $i: $w mapped INTO lexicon")
          // (3) length preserved (±1 only for the lexicon-image guard),
          // digits untouched
          assert(mw.length == w.length || mw.length == w.length + 1,
            s"replica $i: $w -> $mw length shift")
          assert(mw.count(_.isDigit) === w.count(_.isDigit),
            s"replica $i: $w -> $mw digit shift")
        }
      }
      // (4) deterministic
      assert(mapped(vocab, i) === m, s"replica $i: nondeterministic")
    }
    // (5) cross-replica disjoint outside the lexicon
    val nonLex = vocab.filterNot(GenScale.Lex.contains)
    val m1 = mapped(nonLex, 1).toSet
    val m2 = mapped(nonLex, 2).toSet
    assert((m1 intersect m2).isEmpty,
      s"replicas 1/2 share non-lexicon vocabulary: ${(m1 intersect m2).take(5)}")
  }

  test("permutations are true bijections of a-z and differ across replicas") {
    val perms = (1 to 100).map(GenScale.perm)
    perms.foreach(p => assert(p.sorted === GenScale.Alpha, s"not a permutation: $p"))
    assert(perms.distinct.size === 100, "two replicas drew the same cipher alphabet")
  }

  /** The second-order collision the chain guard closes (ADVICE r13):
    * a word whose cipher image equals a lexicon word PLUS its doubled
    * first letter ("thet") must not collide with the guarded image of
    * the preimage of the lexicon word itself. Construct the exact
    * adversarial preimages by INVERTING each replica's cipher on chain
    * positions 0..3 of every lexicon word, then assert the full map
    * stays injective over fixture vocab + all chain preimages. Also
    * prove the guard's precondition: no Lex word lies on another Lex
    * word's chain (which would make the guard target ambiguous).
    */
  test("chain preimages stay injective; no lexicon word on another's chain") {
    for {
      l1 <- GenScale.Lex; l2 <- GenScale.Lex if l1 != l2
    } assert(!l2.matches(s"^$l1${l1.head}*$$"),
      s"lexicon word $l2 lies on $l1's chain")
    for (i <- Seq(1, 42, 64, 99)) {
      val p = GenScale.perm(i)
      val inv = GenScale.Alpha.zip(p).map { case (a, c) => c -> a }.toMap
      // preimages of chain positions 0..3: cipher^-1("the"), ^-1("thet"), ...
      val preimages = for {
        l <- GenScale.Lex; k <- 0 to 3
        chainWord = l + (l.head.toString * k)
      } yield chainWord.map(c => inv.getOrElse(c, c))
      val vocab = (fixtureVocab ++ GenScale.Lex ++ preimages).distinct
      val m = mapped(vocab, i)
      assert(m.distinct.size === vocab.size,
        s"replica $i: collision among chain preimages")
    }
  }

  test("sign patterns are ±1, deterministic, and distinct across same-rotation replicas") {
    val dim = 64
    val pats = (1 to 200).map(i => GenScale.signs(i, dim))
    pats.foreach { p =>
      assert(p.size === dim)
      assert(p.forall(s => s == 1.0f || s == -1.0f))
    }
    assert(pats === (1 to 200).map(i => GenScale.signs(i, dim)), "nondeterministic")
    // replicas sharing a rotation (i, i+dim, i+2*dim) must differ in signs
    for (i <- 1 until dim)
      assert(Seq(pats(i - 1), pats(i + dim - 1)).distinct.size === 2,
        s"replicas $i and ${i + dim} share rotation AND signs")
  }
}
