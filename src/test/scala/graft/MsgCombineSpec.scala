package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.MsgCombine

/** The primitive pre-combiners under the iterative kernels' fan stages
  * must combine EXACTLY like the boxed reduceByKey they replaced —
  * including across drain() flushes (partial emission + downstream
  * re-combine). Checked against plain HashMap references on adversarial
  * key streams (dense collisions, negative ids, growth past several
  * resize generations). */
class MsgCombineSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(421)

  test("LongDoubleSum combines like a reference map, across drains") {
    val m = new MsgCombine.LongDoubleSum(16)
    val ref = scala.collection.mutable.HashMap.empty[Long, Double]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    (1 to 200000).foreach { i =>
      val k = rnd.nextLong() % 5000 // dense: forces combining + probes
      val v = rnd.nextInt(100) / 7.0
      m.add(k, v)
      ref(k) = ref.getOrElse(k, 0.0) + v
      if (i % 60000 == 0) emitted ++= m.drain() // mid-stream flush
    }
    emitted ++= m.drain()
    assert(m.size === 0) // drained
    // downstream re-combine of partial drains
    val combined = emitted.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    assert(combined.size === ref.size)
    ref.foreach { case (k, v) =>
      assert(math.abs(combined(k) - v) < 1e-9, s"key $k")
    }
  }

  test("LongLongMin keeps the minimum per key, across drains") {
    val m = new MsgCombine.LongLongMin(16)
    val ref = scala.collection.mutable.HashMap.empty[Long, Long]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    (1 to 150000).foreach { i =>
      val k = rnd.nextLong() % 3000
      val v = rnd.nextLong() % 1000000
      m.add(k, v)
      ref(k) = math.min(ref.getOrElse(k, Long.MaxValue), v)
      if (i % 40000 == 0) emitted ++= m.drain()
    }
    emitted ++= m.drain()
    val combined = emitted.groupBy(_._1).view.mapValues(_.map(_._2).min)
    assert(combined.size === ref.size)
    ref.foreach { case (k, v) => assert(combined(k) === v, s"key $k") }
  }

  test("Long2Count tallies composite keys exactly, across drains") {
    val m = new MsgCombine.Long2Count(16)
    val ref = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    val emitted =
      scala.collection.mutable.ArrayBuffer.empty[((Long, Long), Long)]
    (1 to 150000).foreach { i =>
      // adversarial: many (a, b) vs (b, a) pairs — the mix must not
      // alias them
      val a = rnd.nextLong() % 300
      val b = rnd.nextLong() % 300
      m.add(a, b, 1L)
      ref((a, b)) = ref.getOrElse((a, b), 0L) + 1L
      if (i % 50000 == 0) emitted ++= m.drain()
    }
    emitted ++= m.drain()
    val combined = emitted.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    assert(combined.size === ref.size)
    ref.foreach { case (k, v) => assert(combined(k) === v, s"key $k") }
  }

  test("growth preserves entries (no lost keys through several resizes)") {
    val m = new MsgCombine.LongDoubleSum(16)
    val n = 100000
    (0 until n).foreach(i => m.add(i.toLong * 2654435761L, 1.0))
    assert(m.size === n)
    val all = m.drain().toSeq
    assert(all.size === n)
    assert(all.forall(_._2 === 1.0))
  }
}
