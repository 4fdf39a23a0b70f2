package graft.tools

import graft.core.Rng

/** Pure-JVM thread-scaling probe (no Spark): N threads × fixed mix64 work. */
object JvmBurn {
  def main(args: Array[String]): Unit = {
    val totalOps = 12800000000L // 12.8e9 mix64, same as the Spark raw_cpu_map probe
    for (threads <- Seq(1, 8, 32)) {
      val opsPerThread = totalOps / threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          var h = t.toLong; var i = 0L
          while (i < opsPerThread) { h = Rng.mix64(h); i += 1 }
          if (h == 42L) println("")
        })
        th.start(); th
      }
      ts.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[burn] threads=$threads%2d  $secs%7.2f s  (${totalOps / secs / 1e9}%.2f Gops/s)")
    }
  }
}
