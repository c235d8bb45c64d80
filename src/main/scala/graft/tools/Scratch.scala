package graft.tools

/** Dev scratchpad: driver-side micro-timings of pure decode/hash
  * functions, to separate real per-row CPU from Spark overhead. */
object Scratch {
  def main(args: Array[String]): Unit = {
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      var acc = 0L
      var id = 0L
      while (id < 5000) {
        val dim = if (id % 2 == 0) 16 else 24
        val bytes = graft.operators.Multimodal.grayBmpBytes(id, dim, dim)
        graft.operators.Multimodal.bmpAHash(bytes, 8).foreach { case (_, _, h) => acc ^= h }
        id += 1
      }
      println(f"[scratch] round $round: synth+ahash 5000 blobs in ${(System.nanoTime() - t0) / 1e9}%.3f s (acc=$acc)")
    }
  }
}
