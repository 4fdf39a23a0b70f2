package graft.tools

import graft.core.Rng

/** Pure-JVM allocation-scaling probe: N threads allocating small arrays. */
object JvmAllocBurn {
  def main(args: Array[String]): Unit = {
    val totalAllocs = 800000000L // 800M × ~48B ≈ 38 GB allocated (real, escaping)
    for (threads <- Seq(1, 8, 32)) {
      val per = totalAllocs / threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          val ring = new Array[Array[Long]](1024) // escape: survives long enough
          var sink = 0L; var i = 0L
          while (i < per) {
            val a = new Array[Long](4)
            a(0) = Rng.mix64(i)
            ring((i & 1023).toInt) = a
            sink ^= a(0)
            i += 1
          }
          if (sink == 42L && ring(0) == null) println("")
        })
        th.start(); th
      }
      ts.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[allocburn] threads=$threads%2d  $secs%7.2f s  (${totalAllocs / secs / 1e6}%.0f Mallocs/s)")
    }
  }
}
