package graft.tools
import graft.testkit.PagesGen
object LcsBench {
  def main(args: Array[String]): Unit = {
    val scale = if (args.length > 0) args(0).toInt else 10
    val a = PagesGen.textFor(0L, 0L, scale)
    val b = PagesGen.textFor(0L, 1L, scale)
    println(s"[lcs] text lens: ${a.length} ${b.length}")
    // warm
    (1 to 3).foreach(_ => graft.core.SuffixArray.lcsLength(a, b))
    val t0 = System.nanoTime()
    val n = 20
    (1 to n).foreach(_ => graft.core.SuffixArray.lcsLength(a, b))
    println(f"[lcs] ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/pair at scale $scale")
  }
}
