package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The CABAC engine's confidence instruments (see [[Cabac]]'s table-policy
  * scaladoc): hand-derived known-answer anchors for the TABLE-FREE paths
  * (bypass + terminate — those are conformant as written), structural
  * tripwires on injected tables, §9.3.1.1 init known answers, and
  * encode∘decode round-trip properties over random context/bin mixes.
  */
class CabacSpec extends AnyFunSuite {

  test("derived tables pass every structural tripwire; corrupted ones throw") {
    val t = Cabac.Derived
    assert(t.rangeLps(0).sameElements(Array(128, 176, 208, 240)))
    assert(t.rangeLps(63).forall(_ == 2))
    // corrupt monotonicity across quartiles
    val bad = t.rangeLps.map(_.clone())
    bad(10)(2) = bad(10)(1) - 1
    intercept[IllegalArgumentException] {
      new Cabac.Tables(bad, t.transLps, t.transMps)
    }
    // corrupt the MPS walk
    val badMps = t.transMps.clone(); badMps(30) = 30
    intercept[IllegalArgumentException] {
      new Cabac.Tables(t.rangeLps, t.transLps, badMps)
    }
  }

  test("context init (§9.3.1.1): preCtxState split at 63/64, clamps at " +
      "1/126, QP clipped to [0,51]") {
    val a = Cabac.initCtx(0, 64, 26)
    assert(a.state == 0 && a.mps == 1)
    val b = Cabac.initCtx(0, 63, 26)
    assert(b.state == 0 && b.mps == 0)
    val hi = Cabac.initCtx(0, 200, 26) // clamp 126 → state 62, mps 1
    assert(hi.state == 62 && hi.mps == 1)
    val lo = Cabac.initCtx(0, -50, 26) // clamp 1 → state 62, mps 0
    assert(lo.state == 62 && lo.mps == 0)
    val qp = Cabac.initCtx(16, 0, 100) // QP clips to 51 → pre 51 → (12, 0)
    assert(qp.state == 12 && qp.mps == 0)
  }

  test("HAND-DERIVED anchor: bypass bits 1,0,1 + terminate(1) encode to " +
      "exactly 0xBF 0x30 and decode back (table-free path, conformant)") {
    val e = new Cabac.Encoder()
    e.encodeBypass(1); e.encodeBypass(0); e.encodeBypass(1)
    e.encodeTerminate(1)
    val bytes = e.finish()
    // hand-run of §9.3.4: low walks 510→508(outst)→502 emitting "10",
    // flush renorm emits "1111110", then (low>>9)&1=0, (low>>8)&1=1,
    // stop bit 1 → "101111110011" → 0xBF 0x30
    assert(bytes.map(b => f"${b & 0xff}%02X").mkString(" ") == "BF 30")
    val d = new Cabac.Decoder(bytes)
    assert(d.decodeBypass() == 1 && d.decodeBypass() == 0 &&
      d.decodeBypass() == 1)
    assert(d.decodeTerminate() == 1)
  }

  test("terminate(0) keeps decoding: bins after a non-terminating " +
      "end-of-slice check survive the round trip") {
    val e = new Cabac.Encoder()
    val ec = Cabac.initCtx(0, 64, 26)
    e.encodeDecision(ec, 1)
    e.encodeTerminate(0)
    e.encodeDecision(ec, 0)
    e.encodeTerminate(1)
    val d = new Cabac.Decoder(e.finish())
    val dc = Cabac.initCtx(0, 64, 26)
    assert(d.decodeDecision(dc) == 1)
    assert(d.decodeTerminate() == 0)
    assert(d.decodeDecision(dc) == 0)
    assert(d.decodeTerminate() == 1)
  }

  test("round-trip property: 200 seeded random context/decision/bypass " +
      "mixes decode to their inputs with engine invariants held") {
    (0 until 200).foreach { seed =>
      val rnd = new scala.util.Random(991100 + seed)
      val nCtx = 1 + rnd.nextInt(8)
      val initSeed = rnd.nextLong()
      def ctxsFrom(s: Long) = {
        val r2 = new scala.util.Random(s)
        Array.tabulate(nCtx)(_ =>
          Cabac.initCtx(r2.nextInt(41) - 20, 40 + r2.nextInt(60),
            r2.nextInt(52)))
      }
      val ops = Seq.fill(30 + rnd.nextInt(200))(
        (rnd.nextInt(3), rnd.nextInt(nCtx), rnd.nextInt(2)))
      val e = new Cabac.Encoder()
      val ectx = ctxsFrom(initSeed)
      ops.foreach {
        case (0, c, b) => e.encodeDecision(ectx(c), b)
        case (1, _, b) => e.encodeBypass(b)
        case (_, _, _) => e.encodeTerminate(0)
      }
      e.encodeTerminate(1)
      val d = new Cabac.Decoder(e.finish())
      val dctx = ctxsFrom(initSeed)
      ops.foreach {
        case (0, c, b) =>
          assert(d.decodeDecision(dctx(c)) == b, s"seed $seed decision")
          assert(d.rangeOk, s"seed $seed range invariant")
        case (1, _, b) =>
          assert(d.decodeBypass() == b, s"seed $seed bypass")
        case (_, _, _) =>
          assert(d.decodeTerminate() == 0, s"seed $seed term0")
      }
      assert(d.decodeTerminate() == 1, s"seed $seed final terminate")
    }
  }

  test("TU + UEGk binarizations round-trip across the coeff-level and " +
      "mvd shapes (uCoff 14/k 0 and uCoff 9/k 3), values 0..60") {
    (0 to 60).foreach { v =>
      Seq((14, 0), (9, 3)).foreach { case (uCoff, k) =>
        val e = new Cabac.Encoder()
        val ec = Array.tabulate(5)(i => Cabac.initCtx(i * 3 - 6, 60 + i, 26))
        Cabac.encodeTU(e, i => ec(math.min(i, 4)), math.min(v, uCoff), uCoff)
        if (v >= uCoff) Cabac.encodeUEGkSuffix(e, v, uCoff, k)
        Cabac.encodeFLBypass(e, v & 7, 3)
        e.encodeTerminate(1)
        val d = new Cabac.Decoder(e.finish())
        val dc = Array.tabulate(5)(i => Cabac.initCtx(i * 3 - 6, 60 + i, 26))
        val pre = Cabac.decodeTU(d, i => dc(math.min(i, 4)), uCoff)
        val got = if (pre == uCoff) Cabac.decodeUEGkSuffix(d, uCoff, k) else pre
        assert(got == v, s"v=$v uCoff=$uCoff k=$k")
        assert(Cabac.decodeFLBypass(d, 3) == (v & 7))
        assert(d.decodeTerminate() == 1)
      }
    }
  }
}
